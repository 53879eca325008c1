package graft

import graft.operators.Curation
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Behavioral gates for the round-3 curation surface (redaction,
  * contamination, sampling, packing) on crafted inputs — the SQL oracles
  * prove engine-exactness; these prove the SEMANTICS are the intended ones.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.map { case (id, t, lang, src) => (id, t, lang, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("c4/gopher filters: each named rule trips on its planted doc only") {
    import graft.operators.TextAnalysis
    // ten 4-char words -> n=10, mean_word_len 4.0: passes every stat rule
    val good = Seq.fill(10)("word").mkString(" ")
    val df = docs(
      (4L, good, "en", "src0"),            // %4=0 -> '.' appended: all pass
      (3L, good, "en", "src0"),            // %4=3 -> ' {code}': brace + punct fail
      (6L, good, "en", "src0"),            // %4=2 -> no suffix: punct fails only
      (28L, good, "en", "src0"),           // %4=0, %7=0 -> placeholder fails only
      (8L, "tiny doc", "en", "src0"),      // 2 words: min_words + word_count fail
      (12L, Seq.fill(10)("a").mkString(" "), "en", "src0")) // mean len 1 < 3
    // schema: doc_id(0) n_tokens(1) mean_word_len(2) punct(3) no_brace(4)
    // no_placeholder(5) min_words(6) word_count_ok(7) mean_len_ok(8) kept(9)
    val out = TextAnalysis.c4GopherFilters(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert((3 to 9).forall(out(4L).getBoolean), out(4L).toString)
    assert(!out(3L).getBoolean(3) && !out(3L).getBoolean(4)) // punct+brace fail
    assert(!out(6L).getBoolean(3) && out(6L).getBoolean(4))  // punct only
    assert(!out(28L).getBoolean(5) && out(28L).getBoolean(3)) // placeholder only
    assert(!out(8L).getBoolean(6) && !out(8L).getBoolean(7))  // too short
    assert(!out(12L).getBoolean(8) && out(12L).getBoolean(7)) // mean len fails
    assert(out.values.count(_.getBoolean(9)) == 1)            // only doc 4 kept
  }

  test("pii_redact scrubs every injected PII class and counts them") {
    val df = docs((7L, "hello world", "en", "src0"))
    val row = Curation.piiRedact(df).collect().head
    val clean = row.getAs[String]("clean_text")
    assert(row.getAs[Long]("n_emails") == 1 && clean.contains("<EMAIL>"))
    assert(row.getAs[Long]("n_ssns") == 1 && clean.contains("<SSN>"))
    assert(row.getAs[Long]("n_phones") == 1 && clean.contains("<PHONE>"))
    assert(row.getAs[Long]("n_ips") == 1 && clean.contains("<IP>"))
    assert(!clean.contains("@example.com") && !clean.contains("555-"))
    assert(clean.startsWith("hello world"))
  }

  test("contamination_check finds benchmark n-gram overlap and only that") {
    // doc 0 (0 % 97 == 0) is the benchmark; doc 1 contains one of its
    // 3-grams, doc 2 shares no 3-gram
    val df = docs(
      (0L, "alpha beta gamma delta", "en", "src0"),
      (1L, "x y alpha beta gamma z", "en", "src0"),
      (2L, "alpha x beta y gamma z", "en", "src0"))
    val out = Curation.contaminationCheck(df).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    val r = out.head
    assert(r.getAs[Long]("shared_shingles") == 1) // exactly "alpha beta gamma"
    assert(r.getAs[Long]("n_shingles") == 4)
  }

  test("stratified sample keeps en at ~10% and others at ~50%, deterministically") {
    val df = docs((0L until 400L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "en" else "de", "src0")): _*)
    val out = Curation.sampleStratified(df)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.getOrElse("en", 0L) < byLang("de"),
      s"en must be downsampled harder: $byLang")
    // deterministic: same input -> same rows
    assert(out.collect().toSet == Curation.sampleStratified(df).collect().toSet)
  }

  test("train/test split is exhaustive, disjoint and hash-stable under growth") {
    val small = docs((0L until 100L).map(i => (i, s"d$i", "en", "s")): _*)
    val big = docs((0L until 300L).map(i => (i, s"d$i", "en", "s")): _*)
    val s1 = Curation.splitTrainTest(small).as[(Long, Long, String)].collect().toMap2
    val s2 = Curation.splitTrainTest(big).as[(Long, Long, String)].collect().toMap2
    assert(s1.forall { case (id, sp) => s2(id) == sp }, "split must not move when corpus grows")
    assert(s2.values.toSet.subsetOf(Set("train", "validation", "test")))
  }

  test("leakage-safe split sends near-dup clusters to ONE side; singletons match splitTrainTest") {
    // docs 1/2 are near-dups (must co-locate); 3 is a singleton
    val base30 = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = docs(
      (1L, base30, "en", "s"),
      (2L, base30.replace("tok30", "tokX"), "en", "s"),
      (3L, (100 to 140).map(i => s"zzz$i").mkString(" "), "en", "s"))
    val out = Curation.splitLeakageSafe(df)
      .select("doc_id", "split_key", "split").as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "split must cover every doc exactly once")
    assert(out(1L) == out(2L), s"near-dups must share split_key AND split: $out")
    assert(out(1L)._1 == 1L, "cluster split key must be the min doc id")
    val plain = Curation.splitTrainTest(df).where($"doc_id" === 3L)
      .select("split").as[String].collect().head
    assert(out(3L) == ((3L, plain)), "singleton must keep its splitTrainTest assignment")
  }

  test("lang balance brings every language to ~the smallest language's size") {
    val df = docs((0L until 600L).map(i =>
      (i, s"doc $i", if (i < 500) "en" else "fr", "src0")): _*)
    val out = Curation.langBalanceSample(df).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val (en, fr) = (out.getOrElse("en", 0L).toDouble, out.getOrElse("fr", 0L).toDouble)
    assert(math.abs(en - fr) / math.max(en, fr) < 0.5,
      s"balanced counts should be comparable, got en=$en fr=$fr")
  }

  test("embed_quantize: unit-norm output, saturation only at the extremes") {
    val emb = Seq(
      (1L, Array(3.0f, 4.0f) ++ Array.fill(62)(0.0f), 0),
      (2L, Array.fill(64)(0.0f), 0) // zero vector -> NULL quantization
    ).toDF("vec_id", "embedding", "label")
    val rows = Curation.embedQuantize(emb).orderBy("vec_id").collect()
    val r1 = rows(0)
    // normalized (0.6, 0.8, 0...) * 127 -> 76, 102 (floor(x+.5))
    assert(r1.getAs[Long]("q0") == 76L && r1.getAs[Long]("q1") == 102L)
    assert(r1.getAs[Long]("n_saturated") == 0L)
    assert(math.abs(r1.getAs[Double]("l2_norm") - 5.0) < 1e-9)
    assert(rows(1).isNullAt(rows(1).fieldIndex("q0")), "zero vector must yield NULLs")
  }

  test("token_pack: offsets are contiguous per source and chunks consistent") {
    val df = docs(
      (1L, Seq.fill(300)("w").mkString(" "), "en", "a"),
      (2L, Seq.fill(300)("w").mkString(" "), "en", "a"),
      (3L, Seq.fill(10)("w").mkString(" "), "en", "b"))
    val out = Curation.tokenPack(df).orderBy("source", "doc_id").collect()
    val (d1, d2, d3) = (out(0), out(1), out(2))
    assert(d1.getAs[Long]("start_offset") == 0L && d2.getAs[Long]("start_offset") == 300L)
    assert(d1.getAs[Long]("first_chunk") == 0L && d1.getAs[Long]("last_chunk") == 0L)
    assert(!d1.getAs[Boolean]("spans_boundary"))
    // doc2 spans tokens [300, 600) -> chunks 0 and 1
    assert(d2.getAs[Long]("first_chunk") == 0L && d2.getAs[Long]("last_chunk") == 1L)
    assert(d2.getAs[Boolean]("spans_boundary"))
    assert(d3.getAs[Long]("start_offset") == 0L, "source b packs independently")
  }

  test("bigram LM: common continuations outscore rare ones; ppm math is exact") {
    // context "the": cat x3, dog x1; context "cat": sat x2, ran x1
    val df = docs(
      (1L, "the cat sat", "en", "a"),
      (2L, "the cat ran", "en", "a"),
      (3L, "the cat sat", "en", "a"),
      (4L, "the dog sat", "en", "a"))
    val out = graft.operators.TextAnalysis.textBigramLm(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_ppm"), r.getAs[Double]("lm_score")))
      .toMap
    // doc 1: "the cat" 3/4 -> 750000, "cat sat" 2/3 -> 666666
    assert(out(1L) == ((2L, 1416666L, 708333.0)), s"got ${out(1L)}")
    // doc 2: "the cat" 750000, "cat ran" 1/3 -> 333333
    assert(out(2L) == ((2L, 1083333L, 541666.5)), s"got ${out(2L)}")
    // the doc made of the corpus's most common continuations wins
    assert(out(1L)._3 > out(2L)._3 && out(1L)._3 > out(4L)._3,
      s"common continuations must outscore rare ones: $out")
  }

  test("perplexity buckets: quartile tiers per lang, score values never split") {
    // 8 en docs with distinct scores -> exactly 2 head, 2 tail, 4 middle;
    // a second lang gets its own independent thresholds
    val en = (1L to 8L).map { i =>
      // doc i repeats "w(i) next" so its score is driven by how common its
      // continuation is; distinct common-ness per doc gives distinct scores
      val uniq = s"tok$i"
      (i, (s"$uniq follow " * i.toInt).trim, "en", "a")
    }
    val de = Seq((100L, "ein zwei ein zwei", "de", "a"),
      (101L, "ein drei", "de", "a"))
    val out = graft.operators.TextAnalysis
      .textPerplexityBuckets(docs(en ++ de: _*))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("bucket"), r.getAs[Long]("score_ppm"))).toMap
    val enBuckets = (1L to 8L).map(out(_)._1)
    assert(enBuckets.count(_ == "head") == 2 && enBuckets.count(_ == "tail") == 2
      && enBuckets.count(_ == "middle") == 4,
      s"8 distinct-score docs must tier 2/4/2: $out")
    // head holds the HIGHEST scores (most predictable), tail the lowest
    val byScore = (1L to 8L).sortBy(out(_)._2)
    assert(byScore.take(2).forall(out(_)._1 == "tail")
      && byScore.takeRight(2).forall(out(_)._1 == "head"), s"tier order: $out")
    // a value shared across the boundary goes wholly to one side: with only
    // 2 de docs, neither quarter can hold a whole value -> all middle
    assert(out(100L)._1 == "middle" && out(101L)._1 == "middle",
      s"degenerate distribution must not split or over-fill tiers: $out")
  }

  test("text_repetition scores a stuffed doc high and a diverse doc low") {
    val df = docs(
      (1L, "spam spam spam ham", "en", "a"),
      (2L, "alpha beta gamma delta", "en", "a"))
    val out = graft.operators.TextAnalysis.textRepetition(df)
      .orderBy("doc_id").collect()
    val spam = out(0)
    assert(spam.getAs[Long]("n_tokens") == 4L)
    assert(spam.getAs[Double]("top_token_fraction") == 3.0 / 4.0)
    // 2-grams: "spam spam" x2, "spam ham" -> 1 of 3 duplicated, max 2/3
    assert(spam.getAs[Double]("dup_2gram_fraction") == 1.0 / 3.0)
    assert(spam.getAs[Double]("max_2gram_fraction") == 2.0 / 3.0)
    val clean = out(1)
    assert(clean.getAs[Double]("top_token_fraction") == 0.25)
    assert(clean.getAs[Double]("dup_2gram_fraction") == 0.0)
  }

  test("contamination_bloom equals the exact check on a corpus-sized input") {
    // crafted overlap (bench doc 0 shares one 3-gram with doc 1) plus bulk
    // rows to exercise the bloom across many hashes
    val bulk = (3L until 300L).filter(_ % 97 != 0).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d", "en", "src0"))
    val df = docs(Seq(
      (0L, "alpha beta gamma delta", "en", "src0"),
      (1L, "x y alpha beta gamma z", "en", "src0"),
      (2L, "alpha x beta y gamma z", "en", "src0")) ++ bulk: _*)
    val exact = Curation.contaminationCheck(df).collect().toSet
    val bloom = Curation.contaminationBloom(df).collect().toSet
    assert(bloom == exact, "bloom prefilter + exact confirm must equal the exact check")
    assert(exact.map(_.getLong(0)) == Set(1L))
  }

  test("weighted mix emits floor(w) copies always and the fractional copy per-mille") {
    // src0 -> 700 pm (fraction only), src2 -> 2100 pm (2 copies + 10%)
    val df = docs((0L until 1000L).map(i =>
      (i, s"d$i", "en", if (i % 2 == 0) "src0" else "src2")): _*)
    val out = Curation.sampleWeightedMix(df)
      .groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2)
    // src0: every sampled doc has exactly 1 copy; ~70% of docs sampled
    assert(bySrc("src0").forall(_._3 == 1L))
    val kept0 = bySrc("src0").size
    assert(kept0 > 280 && kept0 < 420, s"~70% of 500 expected, got $kept0")
    // src2: every doc present with 2 or 3 copies; ~10% get the third
    assert(bySrc("src2").size == 500, "floor(2.1)=2 copies are unconditional")
    assert(bySrc("src2").forall(c => c._3 == 2L || c._3 == 3L))
    val extra = bySrc("src2").count(_._3 == 3L)
    assert(extra > 20 && extra < 90, s"~10% of 500 expected, got $extra")
    // copy_idx is dense 0..n-1 per doc
    val idx = Curation.sampleWeightedMix(df)
      .where(col("doc_id") === out.head._1).select("copy_idx")
      .collect().map(_.getLong(0)).sorted
    assert(idx.sameElements(0L until idx.length))
  }

  test("bottom-k sample: exactly k rows, stable under corpus growth prefix-wise") {
    val small = docs((0L until 500L).map(i => (i, s"d$i", "en", "s")): _*)
    val out = Curation.sampleBottomK(small, k = 50).collect()
    assert(out.length == 50)
    // the k smallest hash ranks, verified independently
    val keys = out.map(_.getAs[Long]("rank_key")).sorted
    val allKeys = Curation.sampleBottomK(small, k = 500).collect()
      .map(_.getAs[Long]("rank_key")).sorted
    assert(keys.sameElements(allKeys.take(50)))
    // deterministic across runs
    assert(Curation.sampleBottomK(small, k = 50).collect().map(_.getLong(0)).toSet ==
      out.map(_.getLong(0)).toSet)
  }

  test("shard shuffle: shards partition the corpus, positions dense, order decorrelated") {
    val df = docs((0L until 400L).map(i => (i, s"d$i", "en", s"src${i % 3}")): _*)
    val out = Curation.shardShuffle(df).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos_in_shard"), r.getAs[Long]("sort_key")))
    assert(out.length == 400, "every doc gets exactly one (shard, pos)")
    out.groupBy(_._2).foreach { case (_, rows) =>
      // dense 0..n-1 positions within each shard, ordered by sort_key
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).sameElements(0L until rows.length))
      assert(sorted.map(_._4).sorted.sameElements(sorted.map(_._4)))
    }
    // decorrelated from doc_id order: the first docs of shard 0 are not the
    // first doc_ids (astronomically unlikely under a working hash)
    val firstOfShard0 = out.filter(_._2 == 0L).sortBy(_._3).take(10).map(_._1)
    assert(!firstOfShard0.sameElements(firstOfShard0.sorted))
  }

  test("chunk_fixed_tokens: coverage, overlap, and short-doc edge cases") {
    // 3 tokens (< window): one chunk. 64 tokens (== window): one chunk.
    // 65 tokens: two chunks, the second starting at token 48 (17 tokens).
    val docs = Seq(
      (1L, (1 to 3).map(i => s"t$i").mkString(" "), "en"),
      (2L, (1 to 64).map(i => s"t$i").mkString(" "), "en"),
      (3L, (1 to 65).map(i => s"t$i").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.chunkFixedTokens(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[Long]("chunk_tokens"), r.getAs[String]("chunk_text")))
      .toMap
    assert(out.keySet == Set(1L -> 0L, 2L -> 0L, 3L -> 0L, 3L -> 1L))
    assert(out(1L -> 0L)._1 == 3L && out(1L -> 0L)._2 == "t1 t2 t3")
    assert(out(2L -> 0L)._1 == 64L)
    assert(out(3L -> 0L)._1 == 64L)
    assert(out(3L -> 1L)._1 == 17L)
    // stride-48 overlap: chunk 1 re-covers tokens 49..64 then adds 65
    assert(out(3L -> 1L)._2 == (49 to 65).map(i => s"t$i").mkString(" "))
  }

  test("mix_plan: shares sum to ~1e6 and epochs invert the share against equal split") {
    val docs = Seq(
      (1L, (1 to 30).map(_ => "w").mkString(" "), "src_big"),
      (2L, (1 to 30).map(_ => "w").mkString(" "), "src_big"),
      (3L, (1 to 20).map(_ => "w").mkString(" "), "src_small"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.mixPlan(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("source_tokens"), r.getAs[Long]("share_ppm"),
          r.getAs[Long]("target_tokens"), r.getAs[Long]("epochs_ppm"))).toMap
    assert(rows("src_big") == ((60L, 750000L, 40L, 666666L)))
    assert(rows("src_small") == ((20L, 250000L, 40L, 2000000L)))
  }

  test("mix_plan_temperature: sqrt flattening, hand-computed integer path") {
    // same fixture as mix_plan: big 60 tokens (share .75), small 20 (.25).
    // sqrt weights: floor(sqrt(750000e6)) = 866025, sqrt(250000e6) = 500000
    // exactly; p = w*1e6 div 1366025 -> 633974 / 366025 (sum 999999, floor
    // loss); natural 3:1 flattens to sqrt(3):1. targets 50/29 of 80 tokens,
    // epochs 833333 / 1450000 — the small source boosted, not equalized.
    val docs = Seq(
      (1L, (1 to 30).map(_ => "w").mkString(" "), "src_big"),
      (2L, (1 to 30).map(_ => "w").mkString(" "), "src_big"),
      (3L, (1 to 20).map(_ => "w").mkString(" "), "src_small"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.mixPlanTemperature(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("share_ppm"), r.getAs[Long]("sqrt_share_ppm"),
          r.getAs[Long]("p_ppm"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("epochs_ppm")))).toMap
    assert(rows("src_big") == ((750000L, 866025L, 633974L, 50L, 833333L)),
      s"got ${rows("src_big")}")
    assert(rows("src_small") == ((250000L, 500000L, 366025L, 29L, 1450000L)),
      s"got ${rows("src_small")}")
  }

  test("text_novelty: first-introducer semantics and the conservation law") {
    import graft.operators.CorpusStats
    val a = "one two three four five"        // shingles introduced by doc 1
    val b = "six seven eight nine ten"       // disjoint -> doc 3 fully novel
    val df = docs((1L, a, "en", "s"), (2L, a, "en", "s"), (3L, b, "en", "s"))
    val out = CorpusStats.textNovelty(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_ppm")))).toMap
    assert(out(1L) == ((3L, 3L, 1000000L)))  // 5 tokens -> 3 shingles, all new
    assert(out(2L) == ((3L, 0L, 0L)))        // exact repeat -> nothing novel
    assert(out(3L) == ((3L, 3L, 1000000L)))
    // conservation: each distinct shingle is novel in exactly one doc
    val vocab = CorpusStats.corpusVocabGrowth(df).collect()
      .map(_.getAs[Long]("new_shingles")).sum
    assert(out.values.map(_._2).sum === vocab)
  }

  test("corpus_vocab_growth: 10-row grid, monotone cumulative, total = vocabulary") {
    import graft.operators.CorpusStats
    val df = Tables.documents(spark, sf)
    val rows = CorpusStats.corpusVocabGrowth(df).orderBy("decile").collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (0L to 9L))
    val cums = rows.map(_.getAs[Long]("cum_shingles"))
    cums.sliding(2).foreach { case Array(lo, hi) => assert(lo <= hi); case _ => }
    assert(cums.last == rows.map(_.getAs[Long]("new_shingles")).sum)
    // the fixture's total vocabulary, independently
    val vocab = graft.operators.CorpusStats.textNovelty(df)
      .agg(sum("n_novel")).head().getLong(0)
    assert(cums.last == vocab)
  }

  test("pipeline_anneal_shards: anneal picks best-quality-first within budget") {
    import graft.operators.Pipeline
    // one high-quality 10-token doc (5-char words -> q 35000) among nine
    // low-quality 20-token docs (q 10000). total 190 tokens -> anneal
    // budget 19: ONLY the high-q doc fits, and only if the anneal ordering
    // puts quality first (a hash-ordered pick would try a 20-token doc and
    // select nothing)
    val rows = (1L to 9L).map(i =>
      (i, (1 to 20).map(_ => "w").mkString(" "), "en", "s")) :+
      ((10L, (1 to 10).map(_ => "zzzzz").mkString(" "), "en", "s"))
    val df = docs(rows: _*)
    val out = Pipeline.annealShards(df).collect()
      .map(r => r.getAs[String]("phase") ->
        ((r.getAs[Long]("planned_tokens"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("realized_tokens"), r.getAs[Long]("fill_ppm")))).toMap
    assert(out("anneal") == ((19L, 1L, 10L, 10L * 1000000L / 19L)))
    val (bp, bn, br, bf) = out("bulk")
    assert(bp == 171L && br <= bp && bn >= 1L)
    assert(bf == br * 1000000L / bp)
  }

  test("pipeline_anneal_shards: realized never exceeds planned on the fixture") {
    import graft.operators.Pipeline
    val out = Pipeline.annealShards(Tables.documents(spark, sf)).collect()
    assert(out.length >= 2)
    out.foreach { r =>
      assert(r.getAs[Long]("realized_tokens") <= r.getAs[Long]("planned_tokens"))
      assert(r.getAs[Long]("fill_ppm") <= 1000000L)
    }
  }

  test("text_char_gini: closed-form values on crafted letter distributions") {
    val df = docs(
      (1L, "aaaa", "en", "s"),            // one symbol -> gini 0
      (2L, "ab", "en", "s"),              // two equal -> 1 - 2/4 = 500000
      (3L, "abcd", "en", "s"),            // four equal -> 1 - 4/16 = 750000
      (4L, "1234 !! 99", "en", "s"),      // no letters -> 0 (guarded)
      (5L, ('a' to 'z').mkString, "en", "s")) // uniform 26 -> 1e6 - 38461
    val out = graft.operators.TextAnalysis.textCharGini(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_letters"), r.getAs[Long]("gini_ppm")))).toMap
    assert(out(1L) == ((4L, 0L)))
    assert(out(2L) == ((2L, 500000L)))
    assert(out(3L) == ((4L, 750000L)))
    assert(out(4L) == ((0L, 0L)))
    assert(out(5L) == ((26L, 1000000L - 38461L)))
    // ordering property: degenerate < natural-looking
    assert(out(1L)._2 < out(3L)._2 && out(3L)._2 < out(5L)._2)
  }

  test("mix_anneal_schedule: hand-computed two-source schedule") {
    import spark.implicits._
    // A: 2 docs x 10 five-char tokens -> q_milli = 10*500 + 10*30000/10 = 35000
    // B: 1 doc x 20 one-char tokens  -> q_milli = 20*500 = 10000
    val docs = Seq(
      (1L, (1 to 10).map(_ => "zzzzz").mkString(" "), "A"),
      (2L, (1 to 10).map(_ => "zzzzz").mkString(" "), "A"),
      (3L, (1 to 20).map(_ => "w").mkString(" "), "B"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.mixAnnealSchedule(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("phase")) ->
        ((r.getAs[Long]("quality_milli"), r.getAs[Long]("mix_ppm"),
          r.getAs[Long]("phase_tokens"), r.getAs[Long]("epochs_ppm")))).toMap
    assert(rows.size === 4)
    // total 40 tokens: bulk budget 36, anneal budget 4; shares 50/50;
    // anneal weights 20*35000 vs 20*10000 -> 777777 / 222222 ppm
    assert(rows(("A", "bulk")) == ((35000L, 500000L, 18L, 900000L)))
    assert(rows(("B", "bulk")) == ((10000L, 500000L, 18L, 900000L)))
    assert(rows(("A", "anneal")) == ((35000L, 777777L, 3L, 150000L)))
    assert(rows(("B", "anneal")) == ((10000L, 222222L, 0L, 0L)))
  }

  test("mix_anneal_schedule: anneal boosts the higher-quality source") {
    val docs = Tables.documents(spark, sf)
    val byPhase = Curation.mixAnnealSchedule(docs).collect()
      .groupBy(_.getAs[String]("phase"))
    // phases partition the budget: every source appears in both
    assert(byPhase("bulk").length === byPhase("anneal").length)
    // within anneal, mix_ppm ordering follows quality*size weight ordering
    val anneal = byPhase("anneal").map(r =>
      (r.getAs[Long]("source_tokens") * r.getAs[Long]("quality_milli"),
        r.getAs[Long]("mix_ppm")))
    anneal.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Array(lo, hi) => assert(lo <= hi)
      case _ =>
    }
  }

  test("curriculum_order: rank is the (q, doc_id) global order, sharded") {
    import spark.implicits._
    // doc i has i one-char tokens -> q = min(100000, i*500): strictly
    // ascending until the cap at i=200, then tied (broken by doc_id) —
    // either way rank == doc_id by construction
    val docs = (1 to 250).map(i =>
      (i.toLong, (1 to i).map(_ => "w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val out = Curation.curriculumOrder(docs).collect()
    assert(out.length === 250)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("curriculum_rank") === id)
      assert(r.getAs[Long]("shard_idx") === (id - 1) / 100)
      val expQ = math.min(100000L, id * 500L)
      assert(r.getAs[Long]("q_milli") === expQ)
    }
  }

  test("curriculum_order: ranks are a dense permutation on the fixture") {
    val out = Curation.curriculumOrder(Tables.documents(spark, sf))
      .collect().map(_.getAs[Long]("curriculum_rank")).sorted
    assert(out.toSeq == (1L to out.length).toSeq)
  }

  private implicit class ToMap2(self: Array[(Long, Long, String)]) {
    def toMap2: Map[Long, String] = self.map(t => t._1 -> t._3).toMap
  }
}
