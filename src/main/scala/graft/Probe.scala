package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: ad-hoc micro-timings for plan investigation (not part of the
  * library surface; keeps experiments out of the operators).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def time(name: String)(f: => Any): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    val toks = split(lower(col("text")), " ")
    time("tokenize-only")(docs.select(size(toks).as("n")).agg(sum("n")).collect()(0))
    val grams3 = transform(sequence(lit(1), size(toks) - 2), i =>
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))
    time("ngram-hof")(docs.select(size(array_distinct(grams3)).as("n")).agg(sum("n")).collect()(0))
    val toksC = col("toks")
    val grams3c = transform(sequence(lit(1), size(toksC) - 2), i =>
      concat_ws(" ", element_at(toksC, i), element_at(toksC, i + 1), element_at(toksC, i + 2)))
    time("ngram-hof-pretok")(docs.select(toks.as("toks"))
      .select(size(array_distinct(grams3c)).as("n")).agg(sum("n")).collect()(0))
    // zip_with variant (Dedup.shinglesCol shape)
    val n = size(toksC) - 2
    val zipped = zip_with(
      zip_with(slice(toksC, lit(1), n), slice(toksC, lit(2), n), (x, y) => concat(x, lit(" "), y)),
      slice(toksC, lit(3), n), (xy, z) => concat(xy, lit(" "), z))
    time("ngram-zipwith")(docs.select(toks.as("toks"))
      .select(size(array_distinct(zipped)).as("n")).agg(sum("n")).collect()(0))
    time("explode-count")(docs.select(toks.as("toks"))
      .select(explode_outer(zipped).as("s")).where(col("s").isNotNull)
      .agg(count(lit(1))).collect()(0))
    spark.stop()
  }
}
