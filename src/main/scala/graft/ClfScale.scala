package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: measure the quality classifier at PRODUCTION feature
  * dimensionality. DEPLOY.md §4 prescribes raising the hashed-feature
  * table from the registered D = 1024 to D = 2^18 and claims the weight
  * table stays a plan-sized constant; this main makes that claim a
  * measurement instead of an assertion — for each D it times scorer
  * construction (train + collect + literal build) and three warm scoring
  * passes over SPARK_GRAFT_SF_DIR's documents.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ClfScale [d1,d2,...]
  * (default Ds: 1024, 65536, 262144)
  */
object ClfScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ds = args.headOption.map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(1024, 1 << 16, 1 << 18))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        Tuning.adaptiveShufflePartitions(sfDir, 32))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val docs = graft.sources.Tables.documents(spark, sfDir)

    ds.foreach { d =>
      val t0 = System.nanoTime()
      val scorer = graft.operators.TextAnalysis.qualityClassifierScorerAt(docs, d)
      val build = (System.nanoTime() - t0) / 1e9
      (1 to 3).foreach { i =>
        val c0 = osBean.getProcessCpuTime
        val t1 = System.nanoTime()
        val kept = scorer(docs).where(org.apache.spark.sql.functions.col("kept")).count()
        val wall = (System.nanoTime() - t1) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        println(f"[clfscale] d=$d run$i: build=$build%.2f s score wall=$wall%.2f s " +
          f"cpu=$cpu%.1f s (kept=$kept)")
      }
    }
    spark.stop()
  }
}
