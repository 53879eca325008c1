package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold","-1")
    def probe(tag: String, base: org.apache.spark.sql.DataFrame): Unit = {
      val a = base.select(col("k"), col("id").as("id1"))
      val b = base.select(col("k"), col("id").as("id2"))
      val j = a.join(b, Seq("k")).where(col("id1") < col("id2"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      j.collect()
      val s = j.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val reused = "ReusedExchange".r.findAllIn(s).length
      val stages = "ShuffleQueryStage".r.findAllIn(s.split("== Initial")(0)).length
      println(s"[scratch] $tag: finalPlan shuffleStages=$stages reusedExchange=$reused")
    }
    val raw = spark.range(10000L).select((col("id") % 100).as("k"), col("id"))
    probe("uncached", raw)
    probe("plain .cache()", raw.cache())
    probe("repartition(k).cache()", raw.repartition(col("k")).cache())
    // the containment shape: cache BELOW a derivation, legs above it
    val enrich = raw.cache().join(
      spark.range(100L).select(col("id").as("k")), Seq("k"))
    probe("cache below join-derived legs", enrich)
    probe("cache below + repartition.cache above",
      enrich.repartition(col("k")).cache())
    spark.stop()
  }
}
