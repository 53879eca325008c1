package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGries.freq_topk
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Guarantees of the Misra-Gries heavy-hitters aggregate: exactness when
  * capacity covers the vocabulary, retention + error bounds under eviction,
  * and order-independence of the guarantees under distributed merges.
  */
class FreqSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("capacity > vocabulary: sketch equals the exact top-k on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val sketch = TextAnalysis.textTopTermsSketch(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val exact = TextAnalysis.textTopTerms(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(sketch == exact, "no-eviction regime must be exactly the exact query")
  }

  test("eviction regime: heavy hitter retained with bounded undercount, any partitioning") {
    // 400 of "hot", 40 each of 12 background terms: n = 880, capacity 4 →
    // guarantee: any term with freq > n/4 = 220 is retained (only "hot"),
    // and counts undercount by at most 220
    val rows = Seq.fill(400)("hot") ++
      (0 until 12).flatMap(i => Seq.fill(40)(s"bg$i"))
    for (parts <- Seq(1, 8)) {
      val df = rows.toDF("term").repartition(parts)
      val top = df.agg(freq_topk(col("term"), 4, 4).as("top"))
        .select(explode(col("top")).as("s"))
        .select(col("s.term"), col("s.est_count"))
        .as[(String, Long)].collect().toMap
      assert(top.contains("hot"), s"guaranteed heavy hitter evicted (parts=$parts): $top")
      val est = top("hot")
      assert(est <= 400 && est >= 400 - 220,
        s"count outside MG bounds (parts=$parts): $est")
    }
  }

  test("null terms are ignored; empty input yields an empty summary") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("term")
    val top = df.agg(freq_topk(col("term"), 2, 4).as("top"))
      .select(explode(col("top")).as("s")).select(col("s.term"), col("s.est_count"))
      .as[(String, Long)].collect().toMap
    assert(top == Map("a" -> 2L))
    val empty = spark.emptyDataset[String].toDF("term")
      .agg(freq_topk(col("term"), 2, 4).as("top"))
      .select(size(col("top"))).as[Int].collect().head
    assert(empty == 0)
  }
}
