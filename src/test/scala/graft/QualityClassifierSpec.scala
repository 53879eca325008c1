package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.exchange.Exchange

/** Hashed-feature quality classifier: the model must learn a planted
  * vocabulary separation (target-domain tokens vs off-domain tokens), the
  * fixed-point weight formula must be exact, the holdout split must never
  * leak into the counts, and the scoring pass must plan with ZERO exchanges
  * (the broadcast-model map-only contract that makes it a 100-TB shape).
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // Planted corpus: 'en' docs speak {alpha,beta,gamma}, others {delta,
  // epsilon,zeta}; both share 'the'. doc_id % 5 == 0 rows are holdout.
  private def docs(rows: (Long, String, String)*) =
    rows.map { case (id, t, l) => (id, t, l, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val planted = docs(
    (1L, "alpha beta gamma the alpha", "en"),
    (2L, "beta gamma alpha alpha the", "en"),
    (3L, "delta epsilon zeta the delta", "de"),
    (4L, "epsilon zeta delta zeta the", "fr"),
    (5L, "alpha beta gamma alpha beta", "en"),   // holdout (5 % 5 == 0)
    (6L, "alpha gamma beta the beta", "en"),
    (7L, "zeta delta epsilon the zeta", "de"),
    (10L, "delta zeta epsilon delta zeta", "fr")) // holdout

  test("train: weights separate planted vocabularies; formula is exact") {
    val model = TextAnalysis.qualityClassifierTrain(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every weight is the exact Laplace-smoothed fixed-point rate
    model.foreach { case (_, pos, neg, w) =>
      assert(w == (pos + 1) * 1000000L / (pos + neg + 2))
      assert(w > 0 && w < 1000000L)
    }
    // 'alpha' occurs only in en train docs -> weight near 1e6; 'delta' only
    // in non-en train docs -> weight near 0 (holdout rows 5/10 excluded)
    def weightOf(tok: String): Long = {
      val b = testHash32(tok) % 1024
      model.find(_._1 == b).map(_._4).getOrElse(sys.error(s"bucket $b missing"))
    }
    assert(weightOf("alpha") > 800000L, "pure-positive token must score high")
    assert(weightOf("delta") < 200000L, "pure-negative token must score low")
  }

  test("train: holdout docs never enter the counts") {
    val withHoldout = TextAnalysis.qualityClassifierTrain(planted)
      .agg(org.apache.spark.sql.functions.sum(
        $"pos_count" + $"neg_count")).as[Long].collect().head
    val trainOnly = TextAnalysis.qualityClassifierTrain(
      planted.where($"doc_id" % 5 =!= 0))
      .agg(org.apache.spark.sql.functions.sum(
        $"pos_count" + $"neg_count")).as[Long].collect().head
    assert(withHoldout == trainOnly)
    // 6 train docs x 5 tokens each
    assert(withHoldout == 30L)
  }

  test("score: separates classes, including on the unseen holdout") {
    val rows = TextAnalysis.qualityClassifierScore(planted).collect()
    // balanced planted corpus: 15 pos / 15 neg train tokens -> the base-rate
    // threshold is exactly (15+1)*1e6/(30+2) = 500000
    rows.foreach(r => assert(r.getLong(4) == 500000L))
    val out = rows
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3), r.getBoolean(5)))
      .toMap
    for ((id, (lang, score, kept)) <- out) {
      if (lang == "en") assert(score > 500000L && kept, s"doc $id: $score")
      else assert(score < 500000L && !kept, s"doc $id: $score")
    }
    // the holdout rows specifically (never seen in training) classify right
    assert(out(5L)._3 && !out(10L)._3)
  }

  test("eval: holdout confusion matrix and exact ppm metrics") {
    val r = TextAnalysis.qualityClassifierEval(planted).collect().head
    // holdout = docs 5 (en, pure-positive vocab) and 10 (fr, pure-negative
    // vocab); both classify correctly -> perfect confusion matrix
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((1L, 0L, 0L, 1L)))
    assert(r.getLong(4) == 1000000L && r.getLong(5) == 1000000L
      && r.getLong(6) == 1000000L)
  }

  test("eval: empty-class divisions yield NULL, not an error") {
    // all-negative holdout: doc 5 removed, only doc 10 (fr) is held out ->
    // tp = fn = 0, so precision/recall/f1 must be NULL (guarded division)
    val r = TextAnalysis.qualityClassifierEval(
      planted.where($"doc_id" =!= 5L)).collect().head
    assert((r.getLong(0), r.getLong(2), r.getLong(3)) == ((0L, 0L, 1L)))
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("calibration: positive rate separates across the decision boundary") {
    val rows = TextAnalysis.qualityClassifierCalibration(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // holdout = doc 5 (en, far above threshold -> bin clamps to +5) and
    // doc 10 (fr, far below -> bin -5): one-doc bins, 100% positive rate
    // above the boundary, 0% below
    assert(rows.toSet == Set((5L, 1L, 1L, 1000000L), (-5L, 1L, 0L, 0L)),
      rows.toSeq.toString)
  }

  test("drift: identical corpus halves measure zero L1 drift") {
    val mirrored = docs(
      (2L, "alpha beta the", "en"), (3L, "alpha beta the", "en"),
      (4L, "delta zeta", "de"), (7L, "delta zeta", "de"))
    val r = TextAnalysis.qualityModelDrift(mirrored).collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L,
      s"identical halves must show zero drift: $r")
    // and a genuinely shifted half shows positive drift
    val shifted = docs(
      (2L, "alpha beta the", "en"), (4L, "alpha beta the", "en"),
      (3L, "delta zeta epsilon", "de"), (7L, "delta zeta epsilon", "de"))
    val s = TextAnalysis.qualityModelDrift(shifted).collect().head
    assert(s.getLong(1) > 0L, s"disjoint halves must show drift: $s")
  }

  test("domain assign: learned multi-class argmax classifies holdout docs") {
    val rows = TextAnalysis.domainClassifierAssign(planted).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    // holdout doc 5 speaks the pure-en vocabulary -> must assign 'en';
    // doc 10 speaks the de/fr-shared vocabulary -> must NOT assign 'en'
    assert(rows(5L) == ("en", true), rows.toString)
    assert(rows(10L)._1 != "en" && rows(10L)._2, rows.toString)
    // every doc gets exactly one non-null label
    assert(rows.size == 8 && rows.values.forall(_._1 != null))
    // confusion counts cover exactly the 2 holdout docs
    val conf = TextAnalysis.domainClassifierConfusion(planted).collect()
    assert(conf.map(_.getLong(2)).sum == 2L, conf.toSeq.toString)
  }

  test("domain prf: metrics reconcile with the confusion matrix exactly") {
    val conf = TextAnalysis.domainClassifierConfusion(planted).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val prf = TextAnalysis.domainClassifierPrf(planted).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Long]("precision_ppm"), r.getAs[Long]("recall_ppm"),
          r.getAs[Long]("f1_ppm")))).toMap
    assert(prf.keySet == Set("de", "en", "es", "fr", "zh"), "full class grid")
    prf.foreach { case (c, (tp, fp, fn, p, r, f1)) =>
      assert(tp == conf.getOrElse((c, c), 0L))
      assert(fp == conf.collect { case ((l, pr), n) if pr == c && l != c => n }.sum)
      assert(fn == conf.collect { case ((l, pr), n) if l == c && pr != c => n }.sum)
      if (tp + fp > 0) assert(p == tp * 1000000L / (tp + fp))
      if (tp + fn > 0) assert(r == tp * 1000000L / (tp + fn))
      if (2 * tp + fp + fn > 0) assert(f1 == 2 * tp * 1000000L / (2 * tp + fp + fn))
    }
    // planted corpus: holdout doc 5 is en and correctly assigned -> en
    // recall 1e6; doc 10's true label fr predicted de/fr-shared
    assert(prf("en")._5 == 1000000L, prf.toString)
  }

  test("quality_kappa: cell identities and the shifted-ppm encoding") {
    val r = TextAnalysis.qualityKappa(
      graft.sources.Tables.documents(spark, sf)).collect().head
    val (n, bk, bd, co, ro) = (r.getAs[Long]("n"), r.getAs[Long]("n_both_keep"),
      r.getAs[Long]("n_both_drop"), r.getAs[Long]("n_clf_only"),
      r.getAs[Long]("n_rules_only"))
    assert(n == bk + bd + co + ro, "cells must partition the corpus")
    assert(r.getAs[Long]("agree_ppm") == (bk + bd) * 1000000L / n)
    // recompute the kappa rational from the cells
    val num = BigInt(n) * (bk + bd) -
      (BigInt(bk + co) * (bk + ro) + BigInt(bd + ro) * (bd + co))
    val den = BigInt(n) * n -
      (BigInt(bk + co) * (bk + ro) + BigInt(bd + ro) * (bd + co))
    assert(BigInt(r.getAs[Long]("kappa_num")) == num)
    assert(BigInt(r.getAs[Long]("kappa_den")) == den)
    val plus1 = r.getAs[Long]("kappa_plus1_ppm")
    assert(plus1 == ((num + den) * 1000000 / den).toLong)
    assert(plus1 >= 0L && plus1 <= 2000000L, s"kappa+1 out of range: $plus1")
  }

  test("mix_plan_by_domain: classified token counts, exact share/epoch ppm") {
    val assigned = TextAnalysis.domainClassifierAssign(planted).collect()
      .map(r => r.getString(2)).groupBy(identity).view.mapValues(_.size).toMap
    val rows = TextAnalysis.mixPlanByDomain(planted).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // one plan row per predicted domain, doc counts matching the assigner
    assert(rows.map(r => r._1 -> r._2.toInt).toMap == assigned)
    // the planted corpus is 8 docs x 5 tokens
    val total = rows.map(_._3).sum
    assert(total == 40L && rows.map(_._2).sum == 8L)
    val nDomains = rows.length
    rows.foreach { case (_, _, toks, share, target, epochs) =>
      assert(share == toks * 1000000L / total)
      assert(target == total / nDomains)
      assert(epochs == (total / nDomains) * 1000000L / toks)
    }
    // the n_tokens column the assigner now carries is the real token count
    val nt = TextAnalysis.domainClassifierAssign(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(nt.values.forall(_ == 5L), nt.toString)
  }

  test("pipeline_domain_mix: realized mix matches the documented copy rule") {
    // apply the documented rule test-side to the assigner's own output
    val assigned = TextAnalysis.domainClassifierAssign(planted).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(4)))
    val perDomain = assigned.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = perDomain.values.sum
    val target = total / perDomain.size
    val expect = assigned.groupBy(_._2).map { case (dom, docs0) =>
      val ep = target * 1000000L / perDomain(dom)
      val copies = docs0.map { case (id, _, toks) =>
        val n = ep / 1000000L +
          (if (testHash32(s"dmix:$id") % 1000000L < ep % 1000000L) 1L else 0L)
        (n, toks)
      }.filter(_._1 > 0)
      dom -> ((copies.map(_._1).sum, copies.size.toLong,
        copies.map { case (n, toks) => n * toks }.sum))
    }
    val got = graft.operators.Pipeline.domainMix(planted).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect, s"got $got want $expect")
    // a domain over its share downsamples (epochs < 1), one under repeats
    assert(expect.nonEmpty && got.values.map(_._1).sum > 0)
  }

  test("model curation: manifest dedups, drops holdout and unkept docs") {
    // doc 11 is a byte-identical copy of doc 1: exact dedup must keep only
    // the min-id copy. Kept manifest = en train docs {1, 2, 6}; holdout
    // doc 5 (en, would classify kept) is excluded from the deliverable.
    val withDup = planted.union(docs((11L, "alpha beta gamma the alpha", "en")))
    val rows = graft.operators.Pipeline.modelCuration(withDup).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "src0")
    assert(rows.head.getLong(1) == 3L, s"doc_count: ${rows.toSeq}")
    assert(rows.head.getLong(2) == 15L, s"total_tokens: ${rows.toSeq}")
  }

  test("score plans with zero exchanges (broadcast-model map-only pass)") {
    val plan = TextAnalysis.qualityClassifierScore(planted)
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"scoring must be a pure map over the scan, found:\n$plan")
  }
}
