package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions.col
import graft.sources.Tables

/** Sketch-dedup correctness against crafted near-duplicates: the LSH
  * candidates must contain every truly-similar pair (these are the operators
  * without a SQL oracle — this spec is their correctness gate).
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val nearDup = base.replace("today", "tonight")
  private val unrelated = "completely different words about spark catalyst optimizer plans and shuffles"

  test("exact dedup groups identical texts") {
    val df = docs((1L, base), (2L, base), (3L, unrelated))
    val out = Dedup.dedupExact(df).orderBy("keeper_doc_id").collect()
    assert(out.length == 2)
    assert(out.head.getLong(1) == 1L && out.head.getLong(2) == 2L)
  }

  test("ngram jaccard finds the near-dup pair and not the unrelated one") {
    val df = docs((1L, base), (2L, nearDup), (3L, unrelated))
    val pairs = Dedup.dedupNgramJaccard(df)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash LSH surfaces high-jaccard pairs") {
    val df = docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base + " extra"))
    val pairs = Dedup.dedupMinhashLsh(df)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)),
      s"expected near-dup candidates, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not collide")
  }

  test("dedup_paragraph finds the shared span across documents, not within one") {
    // two long documents sharing exactly one 20-word span (their 2nd chunk),
    // surrounded by distinct text; a third unrelated document
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("common", 20)
    val d1 = words("alpha", 20) + " " + shared + " " + words("alphatail", 20)
    val d2 = words("beta", 20) + " " + shared + " " + words("betatail", 20)
    val d3 = words("gamma", 60)
    val out = Dedup.dedupParagraph(docs((1L, d1), (2L, d2), (3L, d3)))
      .select("doc_a", "para_a", "doc_b", "para_b")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out.contains((1L, 1L, 2L, 1L)), s"shared span not found: $out")
    assert(!out.exists(r => r._1 == 3L || r._3 == 3L), s"unrelated doc collided: $out")
    assert(out.forall(r => r._1 != r._3), s"intra-document pair leaked: $out")
  }

  test("simhash: identical docs collide at hamming 0") {
    val df = docs((1L, base), (2L, base), (3L, unrelated))
    val out = Dedup.dedupSimhash(df)
      .select("doc_id_1", "doc_id_2", "hamming").as[(Long, Long, Long)].collect()
    assert(out.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 0L))
  }

  test("embedding cosine dedup flags identical vectors") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f), 0),
      (2L, Array(1.0f, 0.0f, 0.5f), 0),
      (3L, Array(-1.0f, 0.2f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.dedupEmbeddingCosine(e)
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("IVF similarity: identical vectors share a cluster; copy ranked first") {
    val e = (0L until 40L).map { i =>
      // four directional families; per-vector jitter keeps them distinct
      val base = Array.tabulate(64)(j => ((i % 4) * 16 + j).toFloat / 64 + i * 0.003f)
      (i, base, (i % 4).toInt)
    }.toSeq
      .:+((50L, Array.tabulate(64)(j => j.toFloat / 64), 0)) // exact copy of vec 0
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.simSearchIvf(e, k = 4, iters = 2)
    val top = out.where($"query_id" === 0L && $"rank" === 1)
      .select("neighbor_id").as[Long].collect()
    assert(top.headOption.contains(50L),
      s"copy must be top neighbor within its IVF cluster, got ${out.collect().toSeq}")
  }

  test("knn_graph: exact copies are mutual rank-1 neighbors; every point gets k rows") {
    // 20 bases only: the (i*31 + d*7) % 23 family repeats with period 23 in
    // i, so 23+ bases would alias base 0 and steal the copy's rank-1 slot
    val e = (0L until 20L).map { i =>
      val v = Array.tabulate(64)(d => ((i * 31 + d * 7) % 23 - 11).toFloat / 11f)
      (i, v, 0)
    }.toSeq
      .:+((100L, Array.tabulate(64)(d => ((0 * 31 + d * 7) % 23 - 11).toFloat / 11f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnGraph(e, k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    assert(out.contains((0L, 100L, 1L)), s"copy must be 0's top neighbor: ${out.toSeq}")
    assert(out.contains((100L, 0L, 1L)), s"neighbor relation must be mutual for copies")
    val perQuery = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    perQuery.foreach { case (q, ranks) =>
      assert(ranks == (1L to ranks.length), s"ranks must be dense from 1 for $q: $ranks")
    }
  }

  test("dedup_clusters: transitive chain collapses to one cluster with min-id label") {
    // a~b and b~c near-dups, a~c not: components must still merge all three
    val base10 = (1 to 30).map(i => s"tok$i").mkString(" ")
    val variantA = base10
    val variantB = base10.replace("tok30", "tokB")  // ~high jaccard with A
    val variantC = base10.replace("tok30", "tokB").replace("tok1", "tokC") // near B
    val other = (100 to 140).map(i => s"zzz$i").mkString(" ")
    val df = docs((10L, variantA), (20L, variantB), (30L, variantC), (40L, other))
    val out = Dedup.dedupClusters(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
      .toMap
    if (out.contains(10L) && out.contains(30L)) {
      assert(out(10L)._1 == 10L, s"cluster id must be min doc id, got $out")
      assert(out(30L)._1 == out(10L)._1, s"transitive closure must merge chain, got $out")
    }
    assert(!out.contains(40L), "unrelated doc must not join any cluster")
    out.values.foreach { case (_, size) => assert(size >= 2) }
  }

  test("bucketed embedding dedup: perfect precision, measured recall vs all-pairs truth") {
    // synthetic corpus with known near-dups: 20 base vectors, each cloned
    // with a small perturbation (cosine ~0.999), plus the testdata corpus as
    // background (which contains no >=0.95 pairs at sf0.001)
    val synthetic = (0 until 20).flatMap { i =>
      val base = Array.tabulate(64)(d => ((i * 31 + d * 7) % 23 - 11).toFloat / 11f)
      val bumped = base.zipWithIndex.map { case (v, d) => if (d == i) v + 0.02f else v }
      Seq((10000L + i, base, 99), (20000L + i, bumped, 99))
    }.toDF("vec_id", "embedding", "label")
    val emb = graft.sources.Tables.embeddings(spark, sf).unionByName(synthetic)
    // unblocked all-pairs truth at the same threshold (small SF only)
    val truth = {
      import org.apache.spark.sql.functions._
      val base = emb.select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 10000).cast("long")).as("qv"))
      val withNorm = base.withColumn("n2",
        aggregate(zip_with(col("qv"), col("qv"), (a, b) => a * b), lit(0L), (acc, x) => acc + x))
      val a = withNorm.select(col("vec_id").as("v1"), col("qv").as("q1"), col("n2").as("m1"))
      val b = withNorm.select(col("vec_id").as("v2"), col("qv").as("q2"), col("n2").as("m2"))
      a.crossJoin(b).where($"v1" < $"v2")
        .withColumn("dot", aggregate(zip_with(col("q1"), col("q2"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x))
        .withColumn("cos", col("dot").cast("double") /
          (sqrt(col("m1").cast("double")) * sqrt(col("m2").cast("double"))))
        .where($"cos" >= 0.95)
        .select($"v1", $"v2").as[(Long, Long)].collect().toSet
    }
    val found = Dedup.dedupEmbeddingLsh(emb)
      .select($"vec_id_1", $"vec_id_2").as[(Long, Long)].collect().toSet
    assert(found.subsetOf(truth), "bucketed pairs must all be true near-dups (precision 1)")
    if (truth.nonEmpty) {
      val recall = (found & truth).size.toDouble / truth.size
      assert(recall > 0.0, s"bucketed blocking found none of ${truth.size} true pairs")
      info(s"bucketed embedding dedup recall: $recall over ${truth.size} true pairs")
    }
    // the wide (banded multi-table) form: same precision guarantee, and its
    // union-of-tables collision must not lose recall against the single
    // 8-bit table on these near-identical pairs
    val foundWide = Dedup.dedupEmbeddingLshWide(emb)
      .select($"vec_id_1", $"vec_id_2").as[(Long, Long)].collect().toSet
    assert(foundWide.subsetOf(truth), "wide-banded pairs must all be true near-dups")
    if (truth.nonEmpty) {
      val recallWide = (foundWide & truth).size.toDouble / truth.size
      val recall = (found & truth).size.toDouble / truth.size
      assert(recallWide >= recall,
        s"4x16-bit banding must not trail the 8-bit table: $recallWide < $recall")
      info(s"wide-banded embedding dedup recall: $recallWide over ${truth.size} true pairs")
    }
  }

  test("dedup_embedding_lsh_auto: corpus-sized geometry; identical vectors always recalled") {
    import org.apache.spark.sql.functions.col
    // geometry formulas: constant expected bucket occupancy (n/2^bits ~ 8)
    // within the one-long signature budget (bands*bits <= 64)
    assert(Dedup.autoBandBits(600, 8) === 8) // clamps low (= oracled baseline width)
    assert(Dedup.autoBandBits(1L << 20, 8) === 17) // 2^20/8 = 2^17
    assert(Dedup.autoBandBits(Long.MaxValue, 8) === 21) // clamps at the packing budget
    assert(Dedup.autoBands(16) === 4)
    assert(Dedup.autoBands(21) === 3)
    // identical vectors have identical signatures at ANY geometry, collide
    // in every band, and verify at cosine 1 — the seeded-recall floor the
    // fast text twins also pin
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val clones = emb.where(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val found = Dedup.dedupEmbeddingLshAuto(emb.unionByName(clones))
      .where(col("vec_id_2") === col("vec_id_1") + 1000000L)
      .select($"vec_id_1", $"vec_id_2", $"cosine").as[(Long, Long, Double)].collect()
    assert(found.length === 5, s"every identical clone pair must be recalled: ${found.toSeq}")
    assert(found.forall(_._3 > 0.9999))
  }

  test("knn_graph recall vs exact all-pairs top-k truth on the testdata corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    // exact top-3 neighbor edges per point (quadratic — small SF only)
    val truth = {
      import org.apache.spark.sql.functions._
      val base = emb.select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 10000).cast("long")).as("qv"))
      val withNorm = base.withColumn("n2",
        aggregate(zip_with(col("qv"), col("qv"), (a, b) => a * b), lit(0L), (acc, x) => acc + x))
      val a = withNorm.select(col("vec_id").as("v1"), col("qv").as("q1"), col("n2").as("m1"))
      val b = withNorm.select(col("vec_id").as("v2"), col("qv").as("q2"), col("n2").as("m2"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("v1").orderBy(col("cos").desc, col("v2"))
      a.crossJoin(b).where($"v1" =!= $"v2")
        .withColumn("dot", aggregate(zip_with(col("q1"), col("q2"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x))
        .withColumn("cos", col("dot").cast("double") /
          (sqrt(col("m1").cast("double")) * sqrt(col("m2").cast("double"))))
        .withColumn("rn", row_number().over(w)).where($"rn" <= 3)
        .select($"v1", $"v2").as[(Long, Long)].collect().toSet
    }
    val found = Similarity.knnGraph(emb, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall > 0.0, s"bucketed knn found none of ${truth.size} true edges")
    info(f"knn_graph recall: $recall%.3f over ${truth.size} true top-3 edges")
  }

  test("multi-probe LSH recall >= single-probe recall vs bruteforce truth") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.simSearchBruteforce(emb))
    val single = pairs(Similarity.simSearchLsh(emb, multiProbe = false))
    val multi = pairs(Similarity.simSearchLsh(emb, multiProbe = true))
    val rSingle = (truth & single).size.toDouble / truth.size
    val rMulti = (truth & multi).size.toDouble / truth.size
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(rMulti > 0.0, "multi-probe found none of the true top-5 neighbors")
  }

  test("recall eval: full method x query grid, hits match independent intersection") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.simSearchBruteforce(emb))
    val nQueries = truth.map(_._1).size
    val rows = Similarity.simSearchRecallEval(emb).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // grid completeness: a method that misses a query entirely still rows
    assert(rows.size == 4 * nQueries, s"expected ${4 * nQueries} rows, got ${rows.size}")
    assert(rows.keys.map(_._1).toSet == Set("lsh", "ivf", "pq", "ivfpq"))
    // recall_ppm is the exact-integer ratio of hits
    rows.foreach { case ((m, q), (hits, ppm)) =>
      assert(hits >= 0 && hits <= 5, s"$m/$q hits=$hits out of range")
      assert(ppm == hits * 1000000L / 5, s"$m/$q ppm=$ppm != hits*1e6/5")
    }
    // cross-check one method against an independently computed intersection
    val lshHits = pairs(Similarity.simSearchLsh(emb)) & truth
    val perQuery = lshHits.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    truth.map(_._1).foreach { q =>
      assert(rows(("lsh", q))._1 == perQuery.getOrElse(q, 0L),
        s"lsh/$q: eval=${rows(("lsh", q))._1} independent=${perQuery.getOrElse(q, 0L)}")
    }
  }

  test("minhash eval: planted true pair is counted, metrics are the exact ratios") {
    // docs 5/10 (% 5 == 0): sampled near-dups; doc 3: unrelated non-sample;
    // doc 21: exact copy of base OUTSIDE the sample — its (5,21) truth pair
    // must still count (sample-vs-corpus probing), and LSH always recovers
    // exact copies (seeded-recall floor)
    val df = docs((5L, base), (10L, base + " extra"), (3L, unrelated), (21L, base))
    val row = Dedup.dedupMinhashEval(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (truthPairs, candPairs, hits, precPpm, recPpm) = row("en")
    assert(truthPairs >= 3, s"expected >=3 true pairs (5-10, 5-21, 10-21), got $truthPairs")
    assert(hits >= 1, "LSH must recover at least the exact-copy pair")
    assert(hits <= truthPairs && hits <= candPairs)
    assert(precPpm == (if (candPairs > 0) hits * 1000000L / candPairs else 1000000L))
    assert(recPpm == hits * 1000000L / truthPairs)
  }

  test("mrr eval: bounded by recall, exact against an independent computation") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val rows = Similarity.simSearchMrrEval(emb).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("lsh", "ivf", "pq", "ivfpq"))
    val truth = Similarity.simSearchBruteforce(emb)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val nQ = truth.map(_._1).size.toLong
    rows.values.foreach { case (n, sumRr, mrr) =>
      assert(n == nQ)
      assert(mrr == sumRr / nQ)
      assert(mrr >= 0 && mrr <= 1000000L)
    }
    // independent recomputation for one method: first matching rank per query
    val lsh = Similarity.simSearchLsh(emb)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    val expSum = truth.map(_._1).toSeq.map { q =>
      val hits = lsh.filter(r => r._1 == q && truth.contains((q, r._2)))
      if (hits.isEmpty) 0L else 1000000L / hits.map(_._3).min
    }.sum
    assert(rows("lsh")._2 == expSum, s"lsh sum_rr ${rows("lsh")._2} != $expSum")
    // a perfectly ordered index would read 1e6; ivf (recall 0.96 on this
    // fixture) must beat the quantization-bound pq arms
    assert(rows("ivf")._3 >= rows("pq")._3)
  }

  test("nprobe curve: recall monotone non-decreasing in nprobe, grid complete") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val rows = Similarity.simSearchNprobeCurve(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val queries = rows.keys.map(_._2).toSet
    assert(rows.size == 3 * queries.size, s"grid incomplete: ${rows.size} rows")
    // shared deterministic models, only probing differs -> per-query
    // recall can only grow with nprobe
    queries.foreach { q =>
      assert(rows((1L, q)) <= rows((2L, q)) && rows((2L, q)) <= rows((4L, q)),
        s"query $q recall not monotone: " +
          s"${rows((1L, q))}, ${rows((2L, q))}, ${rows((4L, q))}")
    }
    // and probing more lists must help SOMEWHERE on the fixture (nprobe=4
    // covers a quarter of the 16 lists)
    assert(queries.map(q => rows((4L, q))).sum >= queries.map(q => rows((1L, q))).sum)
  }

  test("minhash fast-hash path (xxhash64) finds the same near-dup pair") {
    val df = docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base + " extra"))
    val pairs = Dedup.dedupMinhashLsh(df, fastHash = true)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)),
      s"expected near-dup candidates, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not collide")
  }

  test("bruteforce similarity ranks exact copy first") {
    val e = Seq(
      (1L, Array.tabulate(64)(i => i.toFloat / 64), 0),
      (50L, Array.tabulate(64)(i => i.toFloat / 64), 0), // copy of query 1
      (60L, Array.tabulate(64)(i => (63 - i).toFloat / 64), 0),
      (70L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.simSearchBruteforce(e)
      .where($"query_id" === 1L && $"rank" === 1)
      .select("neighbor_id").as[Long].collect().head
    assert(top == 50L)
  }

  test("embed_pq: identical vectors share a code; packing is consistent and in range") {
    val out = Similarity.embedPq(Tables.embeddings(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == 500)
    out.foreach { case (_, c0, c1, c2, c3, code) =>
      Seq(c0, c1, c2, c3).foreach(c => assert(c >= 0 && c < 8))
      assert(code == ((c0 * 8 + c1) * 8 + c2) * 8 + c3)
    }
    // compression actually buckets: far fewer distinct codes than vectors,
    // but more than one (the codebooks learned something)
    val distinct = out.map(_._6).distinct.length
    assert(distinct > 1 && distinct < 500, s"got $distinct distinct codes")
    // determinism across runs
    val again = Similarity.embedPq(Tables.embeddings(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(5))).toMap
    assert(out.forall { case (id, _, _, _, _, c) => again(id) == c })
  }

  test("sim_search_pq: ADC ranks an exact copy first; distances are non-negative") {
    val e = Seq(
      (1L, Array.tabulate(64)(i => (i % 7).toFloat / 7f), 0),
      (50L, Array.tabulate(64)(i => (i % 7).toFloat / 7f), 0), // exact copy of 1
      (60L, Array.tabulate(64)(i => -((i % 5).toFloat / 5f)), 0),
      (70L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f), 0),
      (80L, Array.tabulate(64)(_ => 0.3f), 0),
      (90L, Array.tabulate(64)(i => ((i * 3) % 11).toFloat / 11f), 0),
      (95L, Array.tabulate(64)(i => -((i * 5) % 13).toFloat / 13f), 0),
      (99L, Array.tabulate(64)(i => (i % 2).toFloat), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.simSearchPq(e, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.forall(_._3 >= 0L), "squared distances must be non-negative")
    val first = out.filter(t => t._1 == 1L && t._4 == 1L).map(_._2)
    assert(first.sameElements(Array(50L)),
      s"the exact copy must be the ADC rank-1 neighbor, got ${first.toSeq}")
  }

  test("sim_search_ivfpq: candidates stay in the query's IVF cluster; copy is rank-1") {
    // four block-orthogonal families (family f lives in dims [16f, 16f+16))
    // with 8 distinct member patterns each; vec 50 is an exact copy of vec 0
    val e = (for (f <- 0 until 4; j <- 0 until 8) yield {
      val v = Array.tabulate(64)(d =>
        if (d / 16 == f) ((j * 7 + d * 3) % 13).toFloat / 13f + 0.1f else 0.0f)
      ((f * 10 + j).toLong, v, f)
    }).toSeq
      .:+((50L, Array.tabulate(64)(d =>
        if (d < 16) ((d * 3) % 13).toFloat / 13f + 0.1f else 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.simSearchIvfPq(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    assert(out.forall(_._4 >= 0L), "squared ADC distances must be non-negative")
    // IVF contract: every neighbor is reported under ITS home cluster (the
    // standalone embed_kmeans assignment — same deterministic training),
    // each query probes at most nprobe=2 distinct lists, and the query's
    // own cluster is always among them (probe rank 1)
    val assign = Similarity.embedKmeans(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (q, nb, cl, _, _) =>
      assert(assign(nb) == cl,
        s"neighbor $nb of $q reported cluster $cl but kmeans says ${assign(nb)}")
    }
    out.groupBy(_._1).foreach { case (q, rows) =>
      val probed = rows.map(_._3).distinct
      assert(probed.length <= 2, s"query $q searched ${probed.length} lists: $probed")
      // vec 0 has an in-cluster exact copy, so its own list must contribute
      if (q == 0L) assert(probed.contains(assign(q)),
        s"query 0's own cluster ${assign(q)} missing from probes $probed")
    }
    // ranks are dense from 1 with ADC non-decreasing within each query
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1L to sorted.length).toSeq, s"ranks not dense for $q")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq, s"adc not sorted for $q")
    }
    // the exact copy quantizes to vec 0's codes in every subspace, so its
    // ADC is the per-subspace minimum: it must appear in the list, AT the
    // minimum ADC (other family members may tie by landing on the same
    // codes — the vec_id tiebreak then ranks them first — but none can
    // rank above the copy's distance)
    val q0 = out.filter(_._1 == 0L)
    val copyRow = q0.find(_._2 == 50L)
    assert(copyRow.isDefined, s"copy missing from query 0's list: ${q0.toSeq}")
    val minAdc = q0.map(_._4).min
    assert(copyRow.get._4 == minAdc,
      s"copy adc ${copyRow.get._4} above the list minimum $minAdc")
  }

  test("dedup_incremental probes new docs against the existing index only") {
    // 4 (new) ~ 5 (existing): must be found, oriented (new, existing);
    // 8 ~ 12 (both new) and 5 ~ 9 (both existing): out of scope
    val df = docs(
      (4L, base), (5L, nearDup),
      (8L, base.replace("quick", "speedy")), (12L, base.replace("quick", "speedy")),
      (9L, nearDup),
      (7L, unrelated))
    val out = Dedup.dedupIncremental(df).collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("existing_doc_id"))).toSet
    assert(out.contains((4L, 5L)), s"cross-split near-dup missed: $out")
    out.foreach { case (n, e) =>
      assert(n % 4 == 0, s"non-new doc on the probe side: $n")
      assert(e % 4 != 0, s"new doc on the index side: $e")
    }
  }

  test("dedup_substring flags cross-doc spans at ANY offset, ignores within-doc repeats") {
    // docs 1 and 2 share `base` verbatim (74 chars >= the width+w-1=49
    // guarantee) at offsets 11 and 20 — different phases mod any stride, the
    // case winnowing exists for; doc 3 repeats its own 60-char phrase twice
    // but shares nothing across docs
    val selfRepeat = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll "
    val df = docs(
      (1L, s"PREFIX ONE $base AND A SUFFIX HERE PADDING MORE"),
      (2L, s"other opening words $base closing words instead"),
      (3L, selfRepeat + selfRepeat + "tail words beyond the repeats"))
    val out = Dedup.dedupSubstring(df).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_dup_fingerprints"), r.getAs[Long]("n_fingerprints")))
      .toMap
    assert(out(1L)._1 > 0 && out(2L)._1 > 0,
      s"the shared span must surface in both carriers: $out")
    assert(out(3L)._1 == 0,
      s"within-doc repetition is not a cross-doc dup span: $out")
    assert(out.values.forall { case (d, n) => d <= n && n > 0 })
  }

  test("dedup_containment catches the quote-in-long-doc case Jaccard misses") {
    // doc 1 is embedded verbatim in doc 2 (much longer): containment(1→2)=1.0
    // while Jaccard is far below the 0.3 gate; doc 3 shares nothing
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val df = docs(
      (1L, base),
      (2L, s"$filler $base ${filler.replace("filler", "pad")}"),
      (3L, "completely different words in this unrelated document body"))
    val out = Dedup.dedupContainment(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.get((1L, 2L)).contains(1.0), s"quote not contained: $out")
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // the symmetric Jaccard gate must NOT fire for this pair
    assert(!Dedup.dedupNgramJaccard(df).collect()
      .exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("seeded-recall audits recover every identical pair, beyond the sentinels") {
    // a 4-doc identical group (C(4,2)=6 pairs), a 2-doc group, a short doc
    // (2 tokens — never signs, must be OUTSIDE the truth), plus the 2
    // sentinel pairs the audit plants itself: truth = 6 + 1 + 2 = 9
    val group = "identical group text repeated verbatim across several documents today"
    val df = docs(
      (1L, group), (2L, group), (3L, group), (4L, group),
      (5L, unrelated), (6L, unrelated),
      (7L, "too short"))
    val mh = Dedup.dedupMinhashLshFastAudit(df).collect().head
    assert(mh.getAs[Long]("n_docs") == 11L) // 7 + 4 sentinels
    assert(mh.getAs[Long]("n_true_pairs") == 9L, s"got $mh")
    assert(mh.getAs[Long]("n_true_found") == 9L, s"got $mh")
    val sh = Dedup.dedupSimhashFastAudit(df).collect().head
    assert(sh.getAs[Long]("n_true_pairs") == 9L && sh.getAs[Long]("n_true_found") == 9L,
      s"got $sh")
    // paragraph: every doc here is a single span (≤ 20 tokens, ≥ 3 tokens),
    // so span truth equals pair truth except the sentinels contribute
    // 3 + 2 = 5 span pairs instead of 2
    val pa = Dedup.dedupParagraphFastAudit(df).collect().head
    assert(pa.getAs[Long]("n_true_pairs") == 12L, s"got $pa")
    assert(pa.getAs[Long]("n_true_found") == 12L, s"got $pa")
  }

  test("text_tfidf_terms ranks distinctive terms above ubiquitous ones") {
    // "zebra" appears once in doc 1 only; "common" appears in every doc —
    // tf equal, so the df difference must decide the ranking
    val df = docs(
      (1L, "common zebra words here filler filler2 filler3"),
      (2L, "common other words here filler filler2 filler3"),
      (3L, "common more words here filler filler2 filler3"))
    val out = graft.operators.TextAnalysis.textTfidfTerms(df).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => r.getString(1) -> r.getAs[Long]("term_rank")).toMap
    assert(out("zebra") < out("common"),
      s"df=1 term must outrank df=3 term at equal tf: $out")
  }

  test("decontaminate_semantic: planted identical companions always flagged") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val flagged = Dedup.decontaminateSemantic(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_benchmark_hits"), r.getAs[Double]("max_cosine")))).toMap
    // only originals with a planted companion can be benchmark-similar
    assert(flagged.keySet.forall(_ % 29 == 0), s"non-planted vec flagged: $flagged")
    // identical companions (vec % 58 == 0) are a seeded recall floor:
    // same vector -> same band buckets -> the collision cannot be missed
    val identical = emb.select("vec_id").collect().map(_.getLong(0))
      .filter(v => v % 58 == 0)
    identical.foreach { v =>
      assert(flagged.contains(v), s"identical companion of $v not flagged")
      assert(flagged(v)._2 > 0.9999, s"identical pair cosine: ${flagged(v)}")
      assert(flagged(v)._1 >= 1L)
    }
  }

  test("dedup_band_curve: monotone in bands; (4,4) point equals the shipped LSH") {
    val documents = graft.sources.Tables.documents(spark, sf)
    val curve = Dedup.dedupBandCurve(documents).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[String]("lang")) -> r).toMap
    val langs = curve.keys.map(_._2).toSet
    assert(curve.size == 3 * langs.size, "full bands x lang grid")
    for (lang <- langs) {
      // more bands -> strictly more collision opportunities: raw candidate
      // volume and hit count are monotone non-decreasing in the band count
      val byBands = Seq(2L, 4L, 8L).map(b => curve((b, lang)))
      byBands.map(_.getAs[Long]("raw_pairs")).sliding(2).foreach {
        case Seq(lo, hi) => assert(lo <= hi, s"$lang raw_pairs not monotone")
        case _ =>
      }
      byBands.map(_.getAs[Long]("hits")).sliding(2).foreach {
        case Seq(lo, hi) => assert(lo <= hi, s"$lang hits not monotone")
        case _ =>
      }
      // truth is config-independent (shared ground truth)
      assert(byBands.map(_.getAs[Long]("truth_pairs")).distinct.size == 1)
    }
    // the (4,4) row reuses bandHash's exact coefficients: its kept set must
    // equal the production dedup_minhash_lsh output under the same sample
    // filter — the curve is anchored to the shipped operator, not a replica
    val shipped = Dedup.dedupMinhashLsh(documents)
      .where(col("doc_id_1") % 5 === 0 || col("doc_id_2") % 5 === 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (lang <- langs)
      assert(curve((4L, lang)).getAs[Long]("kept_pairs") ==
        shipped.getOrElse(lang, 0L), s"(4,4) kept != shipped LSH for $lang")
  }
}
