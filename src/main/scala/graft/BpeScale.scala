package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: measure the BPE merge-loop round-count bound that
  * SCALE.md's round-15 section documents. Strict BPE's per-round cost is
  * vocabulary-sized and flat, but its ROUND COUNT is k by definition;
  * the batched relaxation learns up to M compatible rules per round. This
  * main times both forms to the SAME learned-rule count (batched runs
  * first; strict then targets exactly the rule count batched reached), so
  * the wall ratio isolates the round-count effect — driver-coordination
  * barriers, localCheckpoint round trips — rather than asserting it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BpeScale [rounds,m]
  * (default rounds=4, m=8)
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (rounds, m) = args.headOption.map { a =>
      val p = a.split(",").map(_.trim.toInt); (p(0), p(1))
    }.getOrElse((4, 8))
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

    def timed[A](f: => A): (A, Double, Double) = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val a = f
      ((a, (System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9))
    }

    (1 to 3).foreach { i =>
      val (nBatched, bw, bc) = timed {
        graft.operators.TextAnalysis.bpeTrainBatched(docs, rounds, m).count()
      }
      val k = nBatched.toInt
      val (nStrict, sw, sc) = timed {
        graft.operators.TextAnalysis.bpeTrainMerges(docs, k).count()
      }
      println(f"[bpescale] run$i: batched($rounds rounds x m=$m) -> $nBatched rules " +
        f"wall=$bw%.2f s cpu=$bc%.1f s | strict(k=$k) -> $nStrict rules " +
        f"wall=$sw%.2f s cpu=$sc%.1f s | wall ratio strict/batched=${sw / bw}%.2f")
    }
    spark.stop()
  }
}
