package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins for the corpus-sized (`_auto`) kNN family: `knn_graph_auto`,
  * `mine_hard_negatives_auto`, `graph_centrality_auto` — the √N-k-means
  * Θ(N^1.5) blocking that replaces the registered multiprobe form's
  * Θ(N²/2⁸) candidate volume at corpus scale (docs/SCALE.md "kNN scaling
  * law"). Geometry (k = clamp(⌈√N⌉, 16, 4096)), planted-clone recall, and
  * shape invariants; hash-level correctness is the DuckDB oracle's job
  * (Similarity.oracles mirrors init/training/assignment term for term).
  */
class AutoKnnSpec extends SparkTestBase {
  import spark.implicits._

  test("autoKmeansK: clamp(ceil(sqrt(N)), 16, 4096)") {
    assert(Similarity.autoKmeansK(1L) === 16)            // clamps low
    assert(Similarity.autoKmeansK(500L) === 23)          // ceil(sqrt(500))
    assert(Similarity.autoKmeansK(1L << 20) === 1024)    // exact sqrt
    assert(Similarity.autoKmeansK(100_000_000L) === 4096) // clamps at 4096
    // the oracle's min-trick bound (8192) must dominate the k clamp so
    // encoded cluster ids never collide in MIN(score*8192 + cid) % 8192
    assert(Similarity.autoKmeansK(Long.MaxValue) < 8192)
  }

  test("knn_graph_auto: identical copies are mutual rank-1 under k-means blocking") {
    // identical vectors score identically against every centroid, so the
    // argmin (ties to lowest cid) lands them in the SAME cluster — exact
    // recall of exact duplicates is structural, not probabilistic
    val e = (0L until 40L).map { i =>
      val v = Array.tabulate(64)(d => ((i * 31 + d * 7) % 101 - 50).toFloat / 50f)
      (i, v, (i % 3).toInt)
    }.toSeq
      .:+((900L, Array.tabulate(64)(d => ((0 * 31 + d * 7) % 101 - 50).toFloat / 50f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnGraphAuto(e, k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    assert(out.contains((0L, 900L, 1L)), s"copy must be 0's top neighbor: ${out.toSeq}")
    assert(out.contains((900L, 0L, 1L)), "neighbor relation must be mutual for copies")
    val perQuery = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    perQuery.foreach { case (q, ranks) =>
      assert(ranks == (1L to ranks.length), s"ranks must be dense from 1 for $q: $ranks")
    }
  }

  test("knn_graph_auto recall vs exact all-pairs top-3 truth on the testdata corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val truth = {
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
    val found = Similarity.knnGraphAuto(emb, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall > 0.0, s"k-means-blocked knn found none of ${truth.size} true edges")
    info(f"knn_graph_auto recall: $recall%.3f over ${truth.size} true top-3 edges")
  }

  test("mine_hard_negatives_auto: cross-label only, ranks dense, <= k per query") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val out = Similarity.mineHardNegativesAuto(emb, k = 3)
      .select("query_id", "q_label", "neg_label", "rank")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty, "auto blocking must still surface cross-label candidates")
    out.foreach { case (q, ql, nl, _) =>
      assert(ql != nl, s"negative for $q must carry a different label")
    }
    out.groupBy(_._1).foreach { case (q, rows) =>
      val ranks = rows.map(_._4).sorted.toSeq
      assert(ranks == (1L to ranks.length) && ranks.length <= 3,
        s"ranks must be dense from 1 and capped at k for $q: $ranks")
    }
  }

  test("graph_centrality_auto: every vertex scored; dangling floor = teleport ppm") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val n = emb.count()
    val scores = Similarity.graphCentralityAuto(emb)
      .select("vec_id", "score_ppm").as[(Long, Long)].collect()
    assert(scores.length === n, "PageRank must score the full vertex spine")
    // teleport-only floor: a node with zero inflow scores exactly 150000
    assert(scores.forall(_._2 >= 150000L), "scores can never fall below teleport")
    assert(scores.map(_._2).max > 150000L, "some hub must accumulate inflow")
  }
}
