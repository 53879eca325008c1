package graft

import org.apache.spark.sql.functions._
import graft.plans.RewriteHofDotProduct

/** The optimizer rule rewrites the declarative HOF dot product to LongDot
  * and preserves results exactly.
  */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  test("HOF dot product is rewritten to the native LongDot expression") {
    // parquet-backed input so ConvertToLocalRelation can't fold the plan away
    val q = graft.sources.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS a")
      .selectExpr("vec_id", "a", "a AS b")
    val hof = q.selectExpr("vec_id", s"$hofDot AS dot")
    val expected = hof.orderBy("vec_id").as[(Long, Long)].collect().toSeq

    // append (don't replace): the shared session carries the library-default
    // rules from SparkTestBase's installAll; restore them after
    val prevRules = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prevRules :+ RewriteHofDotProduct
    try {
      val rewritten = q.selectExpr("vec_id", s"$hofDot AS dot")
      val optimized = rewritten.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("longdot"),
        s"expected LongDot in optimized plan:\n$optimized")
      assert(rewritten.orderBy("vec_id").as[(Long, Long)].collect().toSeq == expected)
    } finally spark.experimental.extraOptimizations = prevRules
  }

  test("rule leaves non-matching aggregates untouched") {
    val prevRules = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prevRules :+ RewriteHofDotProduct
    try {
      // sum (not dot): must NOT rewrite, must stay correct
      val df = Seq(Seq(1L, 2L, 3L)).toDF("a")
        .selectExpr("aggregate(a, 0L, (acc, v) -> acc + v) AS s")
      assert(!df.queryExecution.optimizedPlan.toString().contains("longdot"))
      assert(df.as[Long].collect().head == 6L)
    } finally spark.experimental.extraOptimizations = prevRules
  }

  test("GraftExtensions installs against a SparkSessionExtensions instance") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(e) // must register without throwing
  }
}
