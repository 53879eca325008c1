package graft

import graft.operators.Drift
import org.apache.spark.sql.DataFrame

/** Known-answer + boundary tests for the drift monitors. The statistics have
  * closed forms at the extremes (identical distributions → 0; completely
  * separated supports → KS = TV = 10⁶ ppm, χ² = N·1000), so the spec pins
  * both ends plus one hand-computed interior case.
  */
class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "source", "text")

  /** text with exactly n single-char tokens (token count metric = n). */
  private def toks(n: Int): String = Seq.fill(n)("x").mkString(" ")

  private def row(df: DataFrame, source: String): Map[String, Long] = {
    val r = df.where($"source" === source).collect()
    assert(r.length === 1)
    val schema = df.schema.fieldNames
    schema.zip(r.head.toSeq).collect { case (n, v: Long) => n -> v }.toMap
  }

  test("identical per-source distributions read zero on all three monitors") {
    val d = docs(
      (1L, "a", toks(3)), (2L, "a", toks(7)), (3L, "a", toks(20)),
      (4L, "b", toks(3)), (5L, "b", toks(7)), (6L, "b", toks(20)))
    assert(row(Drift.driftKs(d), "a")("ks_d_ppm") === 0L)
    assert(row(Drift.driftChi2(d), "a")("chi2_milli") === 0L)
    assert(row(Drift.driftTv(d), "a")("tv_ppm") === 0L)
  }

  test("completely separated supports read the closed-form maxima") {
    // source a: token counts {1,2}; source b: {100,200,300,400} — different
    // KS values AND different width-16 buckets, so all three separate fully.
    // Slice sizes 2 and 4 divide 10⁶, so the floored-ppm shares are exact
    // and TV reads its closed-form maximum exactly (a 3-doc slice would
    // floor 1/3 to 333333 ppm and read 999999 — the documented floor bias).
    val d = docs(
      (1L, "a", toks(1)), (2L, "a", toks(2)),
      (4L, "b", toks(100)), (5L, "b", toks(200)),
      (6L, "b", toks(300)), (7L, "b", toks(400)))
    val ks = row(Drift.driftKs(d), "a")
    assert(ks("n_in") === 2L && ks("n_out") === 4L)
    assert(ks("ks_d_ppm") === 1000000L)
    // two-sample χ² at complete separation = N (= 6), emitted ×1000
    assert(row(Drift.driftChi2(d), "a")("chi2_milli") === 6000L)
    assert(row(Drift.driftTv(d), "a")("tv_ppm") === 1000000L)
  }

  test("interior KS case matches the hand computation") {
    // a: {1, 2}; b: {2, 3}. Distinct values v ∈ {1,2,3}, n_in=n_out=2.
    // v=1: cum_in=1, cum_out=0 → |2·1−2·0| = 2
    // v=2: cum_in=2, cum_out=1 → |2·2−2·1| = 2
    // v=3: cum_in=2, cum_out=2 → 0
    // D = 2/(2·2) = 0.5 → 500000 ppm
    val d = docs(
      (1L, "a", toks(1)), (2L, "a", toks(2)),
      (3L, "b", toks(2)), (4L, "b", toks(3)))
    assert(row(Drift.driftKs(d), "a")("ks_d_ppm") === 500000L)
    // TV on width-16 buckets: all four docs land in bucket 0 → shares equal
    assert(row(Drift.driftTv(d), "a")("tv_ppm") === 0L)
  }

  test("chi2 interior case matches the rational identity") {
    // buckets (width 16): a: {0,0,1} (toks 1,2,20), b: {0,1,1} (toks 3,20,30)
    // bucket 0: O_in=2, O_out=1, Δ = 2·3−1·3 = 3, T=3 → 9·1000 // (3·9) = 333
    // bucket 1: O_in=1, O_out=2, Δ = 1·3−2·3 = −3, T=3 → 333
    val d = docs(
      (1L, "a", toks(1)), (2L, "a", toks(2)), (3L, "a", toks(20)),
      (4L, "b", toks(3)), (5L, "b", toks(20)), (6L, "b", toks(30)))
    val r = row(Drift.driftChi2(d), "a")
    assert(r("n_buckets") === 2L)
    assert(r("chi2_milli") === 666L)
  }

  test("ks is symmetric between the two slices of a two-source corpus") {
    val d = docs(
      (1L, "a", toks(1)), (2L, "a", toks(5)), (3L, "a", toks(9)),
      (4L, "b", toks(2)), (5L, "b", toks(5)))
    val ks = Drift.driftKs(d)
    assert(row(ks, "a")("ks_d_ppm") === row(ks, "b")("ks_d_ppm"))
  }

  test("fixture run: every source present, statistics in range") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val nSources = d.select("source").distinct().count()
    for (df <- Seq(Drift.driftKs(d), Drift.driftChi2(d), Drift.driftTv(d)))
      assert(df.count() === nSources)
    val ks = Drift.driftKs(d).agg(
      org.apache.spark.sql.functions.min("ks_d_ppm"),
      org.apache.spark.sql.functions.max("ks_d_ppm")).head()
    assert(ks.getLong(0) >= 0L && ks.getLong(1) <= 1000000L)
  }
}
