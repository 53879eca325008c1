package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Windows
import graft.sources.Tables

/** Property-based checks over the engine's algebra (SURVEY §5.2: generators
  * for fixture-shaped data + algebraic invariants).
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def checkProp(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("win_dedup emits exactly one row per key, and it is the max-ordered one") {
    val gen = Gen.listOfN(40, Gen.zip(
      Gen.choose(0L, 4L), Gen.choose(0L, 2L), Gen.choose(0L, 86400L * 5)))
    checkProp(Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex.map { case ((u, t, off), i) =>
        (i.toLong, new Timestamp(1700000000000L + off * 1000), u, s"t$t", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val out = Windows.winDedup(df).collect()
      val keys = out.map(r => (r.getLong(1), r.getString(2)))
      val expectKeys = rows.map { case (u, t, _) => (u, s"t$t") }.distinct
      keys.length == keys.distinct.length && keys.toSet == expectKeys.toSet
    })
  }

  test("TopKPerKey equals the window row_number form on arbitrary data") {
    // random keys/scores (ties likely: scores drawn from a small range) and
    // random k — the custom operator and WindowExec must agree row-for-row
    // because the (score desc, id) order is total
    val gen = Gen.zip(
      Gen.listOfN(60, Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 9L))),
      Gen.choose(1, 4))
    checkProp(Prop.forAll(gen) { case (rows, k) =>
      val df = rows.zipWithIndex.map { case ((key, score), i) =>
        (key, score, i.toLong)
      }.toDF("k", "score", "id")
      val custom = graft.plans.TopK.topKPerKey(
        df, Seq("k"), Seq(("score", true), ("id", false)), k, "r")
        .as[(Long, Long, Long, Long)].collect().toSet
      // rewriteMaxK=0 disables the rank-limit rewrite for the reference
      // side, so this genuinely compares against WindowExec (otherwise the
      // rule would rewrite the window form into TopKPerKey too and the
      // property would compare the operator against itself)
      spark.conf.set("spark.graft.topk.rewriteMaxK", "0")
      val window =
        try df.withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("k").orderBy(col("score").desc, col("id"))))
          .where(col("r") <= k)
          .as[(Long, Long, Long, Long)].collect().toSet
        finally spark.conf.unset("spark.graft.topk.rewriteMaxK")
      custom == window
    }, n = 6)
  }

  test("rolling means stay within the frame's min/max closes") {
    val fct = Windows.winRollingAvg(Tables.prices(spark, sf))
      .join(Windows.winRollingExtrema(Tables.prices(spark, sf))
        .select(col("ticker"), col("trade_date"), col("high_52w"), col("low_52w")),
        Seq("ticker", "trade_date"))
    val violations = fct.where(
      col("ma_7d") > col("high_52w") || col("ma_7d") < col("low_52w") ||
        col("ma_30d") > col("high_52w") || col("ma_30d") < col("low_52w")).count()
    assert(violations == 0L)
  }

  test("sentiment score is bounded, symmetric under polarity swap of counts") {
    val gen = Gen.listOfN(12, Gen.oneOf("fast", "good", "slow", "error", "word", "x"))
    checkProp(Prop.forAll(gen) { words =>
      val text = words.mkString(" ")
      val (score, label, _) = graft.operators.Enrich.scoreSentiment(text)
      val bounded = score >= -1.0 && score <= 1.0
      val labelConsistent =
        (score > 0 && label == "POSITIVE") || (score < 0 && label == "NEGATIVE") ||
          (score == 0 && label == "NEUTRAL")
      bounded && labelConsistent
    }, n = 20)
  }

  test("bottom-k sketch merge identity holds on arbitrary sets") {
    // justifies agg_kmv_overlap's "mergeable warehouse artifact" claim and
    // Spark's per-partition-heap plan: the bottom-k of a union is exactly
    // computable from per-part bottom-ks, for ANY k and any partitioning
    val gen = Gen.zip(
      Gen.listOf(Gen.choose(0L, 200L)), Gen.listOf(Gen.choose(0L, 200L)),
      Gen.choose(1, 16))
    checkProp(Prop.forAll(gen) { case (a, b, k) =>
      def bottomK(s: Set[Long]): Set[Long] = s.toSeq.sorted.take(k).toSet
      bottomK(bottomK(a.toSet) ++ bottomK(b.toSet)) == bottomK(a.toSet ++ b.toSet)
    }, 30)
  }

  test("merge upsert output size = |target keys ∪ source keys|") {
    val gen = Gen.listOfN(25, Gen.choose(0L, 12L))
    checkProp(Prop.forAll(gen, gen) { (t, s) =>
      val td = t.distinct.map(k => (k, s"t$k")).toDF("id", "v")
      val sd = s.distinct.map(k => (k, s"s$k")).toDF("id", "v")
      val n = graft.operators.Merge.mergeUpsert(td, sd, Seq("id")).count()
      n == (t.toSet ++ s.toSet).size.toLong
    })
  }

  test("winnowing guarantee: a shared span >= width+w-1 is ALWAYS detected, at any offsets") {
    // random distinct prefixes/suffixes around a random shared span placed
    // at arbitrary (and different) offsets in two docs — the content
    // alignment property naive strided sampling lacks. width=40, w=10 →
    // guarantee at 49+ chars; spans are drawn at exactly the guarantee
    // boundary and above.
    val letter = Gen.choose('a', 'z')
    def str(n: Int): Gen[String] = Gen.listOfN(n, letter).map(_.mkString)
    val gen = for {
      spanLen <- Gen.choose(49, 70)
      span <- str(spanLen)
      p1 <- Gen.choose(0, 23)
      p2 <- Gen.choose(0, 23)
      pre1 <- str(p1); pre2 <- str(p2)
      suf1 <- str(10); suf2 <- str(10)
    } yield (s"$pre1 $span $suf1", s"$pre2 $span $suf2")
    checkProp(Prop.forAll(gen) { case (t1, t2) =>
      val df = Seq((1L, t1), (2L, t2)).map { case (id, t) =>
        (id, t, "en", "s", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = graft.operators.Dedup.dedupSubstring(df).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("n_dup_fingerprints")).toMap
      out(1L) > 0 && out(2L) > 0
    })
  }

  test("chunking: every token covered, overlap exactly size−stride, reconstruction exact") {
    val word = Gen.choose('a', 'z').map(_.toString)
    val gen = Gen.choose(1, 200).flatMap(n => Gen.listOfN(n, word))
    checkProp(Prop.forAll(gen) { toks =>
      val text = toks.mkString(" ")
      val df = Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
      val out = graft.operators.Curation.chunkFixedTokens(df, size = 16, stride = 12)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_tokens"),
          r.getAs[String]("chunk_text")))
      val rebuilt = out.map { case (idx, _, txt) =>
        val words = txt.split(" ", -1)
        if (idx == 0) words else words.drop(16 - 12) // drop the overlap
      }.flatten
      val counted = out.forall { case (idx, n, txt) =>
        txt.split(" ", -1).length == n &&
          n == math.min(16L, toks.length - idx * 12) }
      rebuilt.sameElements(toks) && counted
    })
  }

  test("CentroidArgmin equals a driver-side brute-force argmin on random codebooks") {
    import graft.functions.CentroidArgmin.centroid_argmin
    val vec = Gen.listOfN(8, Gen.choose(-1000L, 1000L))
    val gen = Gen.zip(Gen.listOfN(20, vec), Gen.choose(2, 6).flatMap(k => Gen.listOfN(k, vec)))
    checkProp(Prop.forAll(gen) { case (vecs, cents) =>
      val model = cents.map(_.toArray)
      val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "q")
        .select(col("id"), centroid_argmin(col("q"), model).as("cid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = vecs.zipWithIndex.map { case (v, i) =>
        val scores = model.map(c =>
          c.map(x => x * x).sum - 2 * v.zip(c).map { case (a, b) => a * b }.sum)
        i.toLong -> scores.zipWithIndex.minBy { case (s, cid) => (s, cid) }._2.toLong
      }.toMap
      got == want
    })
  }

  test("classifier: holdout rows never move the model; scores bounded in [0, 1e6]") {
    import graft.operators.TextAnalysis
    val tokGen = Gen.choose(0, 25).map(i => s"w$i")
    val docGen = Gen.zip(Gen.choose(1L, 400L), Gen.listOfN(5, tokGen),
      Gen.oneOf("en", "de", "fr"))
    checkProp(Prop.forAll(Gen.listOfN(20, docGen)) { rows =>
      val base = rows.map { case (id, toks, l) =>
        (id, toks.mkString(" "), l, "s", 1L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      // injecting MORE holdout rows (doc_id % 5 == 0) must leave the
      // trained weight table bit-identical — the split discipline
      val extra = Seq((1000000L, "zzz qqq ppp", "en", "s", 1L),
        (2000005L, "rrr sss", "de", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      def model(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.qualityClassifierTrain(df).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val stable = model(base) == model(base.union(extra))
      // every score is a mean of weights in (0, 1e6) -> bounded
      val bounded = TextAnalysis.qualityClassifierScore(base).collect()
        .forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
      stable && bounded
    }, n = 4)
  }

  test("dsir: importance positive, neutral iff gram-less; resample stays in the raw pool") {
    import graft.operators.Curation
    val tokGen = Gen.choose(0, 25).map(i => s"w$i")
    val docGen = Gen.zip(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, tokGen)),
      Gen.oneOf("en", "de", "fr"))
    checkProp(Prop.forAll(Gen.listOfN(18, docGen)) { rows =>
      val df = rows.zipWithIndex.map { case ((toks, l), i) =>
        (i * 7L + 1L, toks.mkString(" "), l, "s", 1L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val scored = Curation.dsirScore(df).collect()
      // every ratio is a positive integer, so every mean of them is too
      val pos = scored.forall(_.getLong(5) > 0L)
      // gram-less docs (and ONLY those) score the neutral 1e6 exactly —
      // a corpus where every bucket is target-pure could also hit 1e6 by
      // arithmetic, but not under these generators (mixed langs, 26 tokens)
      val neutral = scored.filter(_.getLong(4) == 0L).forall(_.getLong(5) == 1000000L)
      val raw = scored.filter(!_.getBoolean(3)).map(_.getLong(0)).toSet
      val sample = Curation.dsirResample(df, k = 5).collect().map(_.getLong(0)).toSet
      pos && neutral && sample.subsetOf(raw) && sample.size == math.min(5, raw.size)
    }, n = 4)
  }

  test("manifest store: any commit/crash/vacuum interleaving resolves to the last commit") {
    import graft.streaming.ManifestStore
    // ops: 0 = commit to a random bucket subset, 1 = crashed write (orphan
    // data, no manifest), 2 = vacuum. Model: cumulative bucket -> payload.
    val op = Gen.zip(Gen.choose(0, 2), Gen.choose(0, 3), Gen.choose(0, 1000))
    val gen = Gen.nonEmptyListOf(op)
    checkProp(Prop.forAll(gen) { ops =>
      val root = java.nio.file.Files.createTempDirectory("graft_mprop")
        .toFile.getAbsolutePath
      val conf = spark.sparkContext.hadoopConfiguration
      var model = Map.empty[Int, Int] // bucket -> payload written there
      ops.foreach { case (kind, bucket, payload) =>
        kind match {
          case 0 =>
            val dir = ManifestStore.newCommitDir()
            Seq((payload.toLong, bucket)).toDF("v", "__part")
              .coalesce(1).write.parquet(s"$root/$dir/__bucket=$bucket")
            ManifestStore.commit(root, Map(bucket -> s"$dir/__bucket=$bucket"),
              ManifestStore.readLatest(root, conf), conf)
            model += bucket -> payload
          case 1 => // crash: full data written, manifest never published
            val dir = ManifestStore.newCommitDir()
            Seq((payload.toLong, bucket)).toDF("v", "__part")
              .coalesce(1).write.parquet(s"$root/$dir/__bucket=$bucket")
          case 2 => ManifestStore.vacuum(root, conf)
        }
      }
      val tip = ManifestStore.readLatest(root, conf)
      val resolved = tip match {
        case None => Map.empty[Int, Int]
        case Some(m) =>
          spark.read.parquet(m.allPaths(root): _*).collect()
            .map(r => r.getAs[Int]("__part") -> r.getAs[Long]("v").toInt).toMap
      }
      resolved == model
    }, n = 6)
  }

  test("weighted mix: copy count is floor(w) or floor(w)+1, fraction matches the hash rule") {
    val gen = Gen.listOfN(30, Gen.choose(0L, 500L))
    checkProp(Prop.forAll(gen) { ids =>
      val df = ids.distinct.map(i => (i, s"d$i", "en", s"src${i % 20}", 2L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = graft.operators.Curation.sampleWeightedMix(df)
        .groupBy("doc_id", "weight_pm").count().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.forall { case (_, wpm, copies) =>
        copies == wpm / 1000 || copies == wpm / 1000 + 1
      }
    })
  }

  test("ts_gapfill: dense spine, count and cent-sum preservation on random events") {
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0, 3), Gen.choose(0L, 9L), Gen.choose(0L, 500L)))
    checkProp(Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex.map { case ((t, day, cents), i) =>
        (i.toLong, new Timestamp(1704067200000L + day * 86400000L + i * 1000L),
          1L, s"t$t", cents / 100.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val out = graft.operators.Reshape.tsGapfill(df).collect()
        .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
      val nTypes = rows.map(_._1).distinct.size
      val nDays = (rows.map(_._2).max - rows.map(_._2).min + 1).toInt
      out.length == nTypes * nDays &&
        out.map(_._2).sum == rows.length &&
        math.abs(out.map(_._3).sum - rows.map(_._3).sum / 100.0) < 1e-6
    }, n = 6)
  }

  test("temperature mix: probabilities sum to ~1e6 and strictly flatten the share ratio") {
    // arbitrary per-source token masses: sum(p_ppm) in (1e6 - n, 1e6]
    // (floor-div loss < 1 ppm per source), and for any two sources the
    // p-ratio sits between 1 and the share-ratio (sqrt flattens, never
    // inverts): share_a >= share_b  =>  1 <= p_a/p_b <= share_a/share_b
    val gen = Gen.choose(2, 5).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 40)))
    checkProp(Prop.forAll(gen) { masses =>
      val docs = masses.zipWithIndex.map { case (m, i) =>
        (i.toLong, (1 to m).map(_ => "w").mkString(" "), s"src_$i")
      }.toDF("doc_id", "text", "source")
      val rows = graft.operators.Curation.mixPlanTemperature(docs).collect()
        .map(r => (r.getAs[Long]("share_ppm"), r.getAs[Long]("p_ppm")))
      val pSum = rows.map(_._2).sum
      val sumOk = pSum > 1000000L - rows.length && pSum <= 1000000L
      val flattenOk = rows.forall { case (sa, pa) =>
        rows.forall { case (sb, pb) =>
          sa < sb || pb == 0 || sb == 0 ||
            (pa.toDouble / pb >= 0.999 &&
              pa.toDouble / pb <= sa.toDouble / sb * 1.001)
        }
      }
      sumOk && flattenOk
    })
  }

  test("minhash eval: hits bounded by both sides; ppm fields are the exact ratios") {
    // random small corpora with planted duplicate clusters: every language
    // row satisfies hits <= min(truth, cand) and the ppm arithmetic
    val wordGen = Gen.choose(3, 8)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta",
        "epsilon", "zeta")).map(_.mkString(" ")))
    val gen = Gen.listOfN(8, wordGen)
    checkProp(Prop.forAll(gen) { texts =>
      // ids 0,5,10,... are sampled (doc_id % 5 == 0); duplicate text 0 at a
      // non-sample id so a true pair exists most runs
      val rows = texts.zipWithIndex.map { case (t, i) => (i * 3L, t) } :+
        (101L, texts.head)
      val df = rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      graft.operators.Dedup.dedupMinhashEval(df).collect().forall { r =>
        val (t, c, h, p, rc) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        h <= t && h <= c &&
          p == (if (c > 0) h * 1000000L / c else 1000000L) &&
          rc == (if (t > 0) h * 1000000L / t else 1000000L)
      }
    }, n = 5)
  }

  test("BPE encode: token concatenation reconstructs every word; budgets add up") {
    // tiny alphabet makes merges fire often; k varies so late rules apply on
    // top of earlier ones
    val wordGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.choose('a', 'd')).map(_.mkString))
    val gen = Gen.zip(Gen.listOfN(6, Gen.listOfN(4, wordGen)), Gen.choose(1, 4))
    checkProp(Prop.forAll(gen) { case (docs, k) =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" "), "en") }
        .toDF("doc_id", "text", "lang")
      val enc = graft.operators.TextAnalysis.bpeEncode(df, k).collect()
        .map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      val reconstructs = enc.forall { case (w, n, e) =>
        e.replace(" ", "") == w && e.split(" ").length.toLong == n
      }
      val nTokens = enc.map { case (w, n, _) => w -> n }.toMap
      val budgets = graft.operators.TextAnalysis.bpeTokenCount(df, k).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val budgetsAdd = docs.zipWithIndex.forall { case (ws, i) =>
        budgets(i.toLong) == ws.map(nTokens).sum
      }
      reconstructs && budgetsAdd
    }, n = 4)
  }
}
