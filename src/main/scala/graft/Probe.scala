package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.LongDot.long_dot

/** Dev tool: ad-hoc micro-timings for plan investigation (not part of the
  * library surface; keeps experiments out of the operators).
  *
  * Current experiment (round 10): cost structure of the banded hyperplane
  * bucketing — how does a sign-bit projection scale with plane count, and
  * does packing the sign bits into one signature column change it?
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 10000).cast("long")).as("q"))
      .cache()
    q.count()

    def time(name: String)(f: => Any): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    def planes(n: Int): Seq[Seq[Long]] = (0 until n).map(j => (0 until 64).map(d =>
      ((j * 131 + d * 37) % 19 - 9 + ((j * 67 + d * 29) % 17 - 8) * 19).toLong))

    for (np <- Seq(8, 16, 32, 64)) {
      val sig = planes(np).zipWithIndex.map { case (p, j) =>
        when(long_dot(col("q"), typedLit(p)) >= 0, lit(1L)).otherwise(lit(0L))
      }.reduce(_ + _)
      time(s"signbits-$np")(q.select(sum(sig)).collect()(0))
    }
    spark.stop()
  }
}
