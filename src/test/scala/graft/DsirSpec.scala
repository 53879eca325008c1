package graft

import graft.operators.Curation
import org.apache.spark.sql.execution.exchange.Exchange

/** DSIR importance resampling: the hashed-bigram ratio model must learn a
  * planted vocabulary separation, the fixed-point ratio formula must be
  * exact, scoring must be a zero-exchange frozen-model map (the 100-TB
  * contract), and the resampler must implement exactly the deterministic
  * priority top-k rule it documents.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.map { case (id, t, l) => (id, t, l, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // en (target) docs speak alpha/beta/gamma bigram chains; raw docs 3/4/8
  // speak delta/epsilon/zeta chains; raw doc 6 speaks the TARGET
  // vocabulary (the doc DSIR exists to find); doc 7 has no bigrams.
  private val planted = docs(
    (1L, "alpha beta gamma alpha beta", "en"),
    (2L, "beta gamma alpha beta gamma", "en"),
    (3L, "delta epsilon zeta delta epsilon", "de"),
    (4L, "epsilon zeta delta epsilon zeta", "fr"),
    (6L, "alpha beta gamma alpha beta", "de"),
    (7L, "zeta", "de"),
    (8L, "delta epsilon zeta delta", "fr"))

  private def hash32(s: String): Long = testHash32(s)

  test("train: ratio formula is exact; planted vocabularies separate") {
    val model = Curation.dsirTrain(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tTot = model.map(_._2).sum
    val rTot = model.map(_._3).sum
    model.foreach { case (_, t, r, ratio) =>
      val expect = (BigInt(t + 1) * (rTot + 1024) * 1000000L /
        (BigInt(r + 1) * (tTot + 1024))).toLong
      assert(ratio == expect, s"bucket ratio mismatch: got $ratio want $expect")
    }
    def ratioOf(gram: String): Long = {
      val b = hash32(gram) % 1024
      model.find(_._1 == b).map(_._4).getOrElse(sys.error(s"bucket $b missing"))
    }
    // "alpha beta" appears in target docs AND the target-like raw doc 6, so
    // its ratio reflects 2 target vs 1 raw occurrence; "delta epsilon" is
    // raw-only, so its ratio is far below neutral
    assert(ratioOf("alpha beta") > 1000000L, "target-heavy bigram must score > 1.0")
    assert(ratioOf("delta epsilon") < 300000L, "raw-only bigram must score << 1.0")
  }

  test("score: target-like raw doc outscores noise; gram-less doc is neutral") {
    val out = Curation.dsirScore(planted).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(3), r.getLong(4), r.getLong(5))).toMap
    // doc 6 (raw, target vocabulary) must dominate every noise raw doc
    assert(out(6L)._3 > 1000000L, s"target-like raw doc: ${out(6L)}")
    for (id <- Seq(3L, 4L, 8L))
      assert(out(id)._3 < out(6L)._3 && out(id)._3 < 1000000L,
        s"noise doc $id must score below neutral: ${out(id)}")
    // doc 7: one token -> zero bigrams -> exactly the neutral ratio
    assert(out(7L) == ((false, 0L, 1000000L)), s"gram-less doc: ${out(7L)}")
    // target flag is the lang label, nothing else
    assert(out(1L)._1 && out(2L)._1 && !out(6L)._1)
  }

  test("frozen scorer: model trained once applies to an unseen batch") {
    val score = Curation.dsirScorer(planted)
    val batch = docs(
      (100L, "alpha beta gamma alpha", "de"),
      (101L, "delta epsilon zeta delta", "de"))
    val out = score(batch).collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(out(100L) > 1000000L && out(101L) < 1000000L,
      s"frozen model must rank the target-like doc above noise: $out")
    // and re-scoring the training corpus itself matches dsirScore exactly
    val a = Curation.dsirScore(planted).collect().map(_.toSeq).toSet
    val b = score(planted).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("resample: implements priority top-k over the raw pool exactly") {
    val imp = Curation.dsirScore(planted).collect()
      .filter(!_.getBoolean(3)).map(r => r.getLong(0) -> r.getLong(5)).toMap
    // expected winners, computed test-side from the documented rule:
    // priority = importance / (hash32("dsir:" + doc_id) + 1), top-k
    val expect2 = imp.toSeq
      .map { case (id, w) => id -> w.toDouble / (hash32(s"dsir:$id") + 1).toDouble }
      .sortBy { case (id, p) => (-p, id) }.take(2).map(_._1).toSet
    val got2 = Curation.dsirResample(planted, k = 2).collect()
      .map(_.getLong(0)).toSet
    assert(got2 == expect2, s"got $got2 want $expect2")
    // k >= pool: every raw doc and ONLY raw docs, deterministically
    val all = Curation.dsirResample(planted).collect().map(_.getLong(0)).toSet
    assert(all == imp.keySet)
  }

  test("resample concentrates on high-importance docs, not just rule-conformance") {
    // 20 target-like raw docs (importance >> 1) among 20 noise raw docs
    // (importance << 1), plus 4 target docs to define the distributions.
    // Priority sampling admits low-weight docs when their uniform hash is
    // tiny, so exact composition is hash-dependent — but with a large
    // importance gap the k=10 sample must be dominated by target-like docs.
    val target = (1L to 4L).map(i =>
      (i * 5L + 1L, "alpha beta gamma alpha beta gamma", "en"))
    val goodRaw = (1L to 20L).map(i =>
      (1000L + i, "alpha beta gamma alpha beta gamma", "de"))
    val noiseRaw = (1L to 20L).map(i =>
      (2000L + i, "delta epsilon zeta delta epsilon zeta", "de"))
    val corpus = docs((target ++ goodRaw ++ noiseRaw): _*)
    val picked = Curation.dsirResample(corpus, k = 10).collect()
      .map(_.getLong(0)).toSet
    val goodPicked = picked.count(id => id >= 1000L && id < 2000L)
    assert(picked.size == 10)
    assert(goodPicked >= 7,
      s"sample should concentrate on target-like docs: $goodPicked/10 ($picked)")
  }

  test("score plans with zero exchanges (frozen-model map-only pass)") {
    val plan = Curation.dsirScore(planted).queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"scoring must be a pure map over the scan, found:\n$plan")
  }
}
