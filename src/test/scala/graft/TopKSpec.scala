package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.plans.{TopK, TopKPerKeyExec}
import graft.sources.Tables

/** The custom whole-operator extension (TopKPerKey logical node + strategy +
  * partial/final physical operator): result-identical to the window
  * row_number form, structurally sort-free, and skew-bounded by the partial
  * pass.
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // finalize any adaptive plan
    df.queryExecution.executedPlan
  }

  test("win_topk_custom equals the window row_number form exactly") {
    val expected = Windows.winTopkGroup(Tables.lineitem(spark, sf)).collect().toSet
    val actual = Windows.winTopkCustom(Tables.lineitem(spark, sf)).collect().toSet
    assert(actual == expected)
  }

  test("plan: partial+final TopKPerKeyExec, no sort, no window, one exchange between them") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Windows.winTopkCustom(Tables.lineitem(spark, sf))
      val plan = df.queryExecution.executedPlan
      val topks = plan.collect { case t: TopKPerKeyExec => t }
      assert(topks.size == 2, s"expected partial+final TopKPerKeyExec:\n$plan")
      assert(topks.count(_.partial) == 1 && topks.count(!_.partial) == 1)
      assert(plan.collect { case s: SortExec => s }.isEmpty,
        s"top-k must not sort the data:\n$plan")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      // the final consumes the partial through exactly one hash exchange:
      // final -> Exchange -> partial, directly stacked
      val finalNode = topks.find(!_.partial).get
      finalNode.child match {
        case e: ShuffleExchangeExec =>
          assert(e.child.isInstanceOf[TopKPerKeyExec] &&
            e.child.asInstanceOf[TopKPerKeyExec].partial,
            s"partial must feed the exchange directly:\n$plan")
        case other => fail(s"expected Exchange directly under final, got $other:\n$plan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("ties break deterministically and ranks are dense from 1") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 10L, 2L), ("a", 10L, 3L), ("a", 5L, 4L),
      ("b", 7L, 9L)
    ).toDF("k", "score", "id")
    val out = TopK.topKPerKey(df, Seq("k"), Seq(("score", true), ("id", false)), 2, "r")
      .as[(String, Long, Long, Long)].collect().toSet
    // a: score 10 ties broken by ascending id -> ids 1,2; b: single row
    assert(out == Set(("a", 10L, 1L, 1L), ("a", 10L, 2L, 2L), ("b", 7L, 9L, 1L)))
  }

  test("partial pass bounds rows per key per partition (skew robustness)") {
    // one hot key spread over many partitions: the exchange input after the
    // partial pass must carry at most k rows per key per input partition
    val hot = spark.range(0, 10000, 1, 8)
      .select(lit("hot").as("k"), col("id").as("score"), col("id").as("id"))
    val out = TopK.topKPerKey(hot, Seq("k"), Seq(("score", true), ("id", false)), 3, "r")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("hot", 9999L, 9999L, 1L), ("hot", 9998L, 9998L, 2L),
      ("hot", 9997L, 9997L, 3L)))
  }
}
