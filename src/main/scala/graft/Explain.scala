package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: plan audit. Prints formatted physical plans (or a summary) for
  * selected queries so pushdown/broadcast/shuffle decisions can be reviewed.
  * Usage: runMain graft.Explain [summary|full] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("summary")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TopK.installAll(spark) // audit the plans users actually get
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      if (mode == "full") {
        println(s"===== $n =====")
        println(plan)
      } else {
        val exchanges = "Exchange ".r.findAllIn(plan).length
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
        val smj = "SortMergeJoin".r.findAllIn(plan).length
        val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
        // formatted mode marks codegen'd operators with "[codegen id : N]"
        val codegen = "codegen id".r.findAllIn(plan).length
        val pushed = plan.linesIterator
          .filter(l => l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
          .size
        println(f"$n%-28s exch=$exchanges bhj=$bhj smj=$smj bnl=$bnl wsc=$codegen pushedFilters=$pushed")
      }
    }
    spark.stop()
  }
}
