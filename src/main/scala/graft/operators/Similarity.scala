package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.LongDot.long_dot

/** Approximate-nearest-neighbor search over the embedding column (builder
  * brief extension surface).
  *
  * Baseline: brute-force cosine top-k — Q queries broadcast against N vectors,
  * one scan, no N×N blowup; exact integer dots via the LongDot codegen
  * expression keep results deterministic and oracle-able.
  *
  * Scale path: random-hyperplane LSH — 8 deterministic integer hyperplanes →
  * 8-bit bucket id; queries only compare against their bucket (expected N/256
  * of the corpus per probe). At 100 TB the bucketed corpus is written
  * partitioned by bucket id, so a probe is a partition-pruned scan, not a full
  * pass. (IVF would replace the hash with k-means centroids — same join
  * shape.)
  */
object Similarity {

  private def d(c: Column): Column = c.cast(DoubleType)

  private def cosine(dot: Column, n1: Column, n2: Column): Column =
    d(dot) / (sqrt(d(n1)) * sqrt(d(n2)))

  /** Quantized vectors + squared norm. */
  private def prep(embeddings: DataFrame): DataFrame =
    Dedup.quantized(embeddings).withColumn("norm2", long_dot(col("q"), col("q")))

  /** `sim_search_bruteforce`: exact cosine top-5 neighbors for each query
    * vector (vec_id < 10) over the whole corpus.
    */
  def simSearchBruteforce(embeddings: DataFrame): DataFrame = {
    val corpus = prep(embeddings)
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qv"), col("norm2").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(long_dot(col("q"), col("qv")), col("norm2"), col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** 8-bit hyperplane bucket: sign bits of dots with deterministic integer
    * planes plane_j[d] = ((j*131 + d*37) mod 19) - 9.
    */
  private def bucketCol: Column = {
    val bits = (0 until 8).map { j =>
      val plane = transform(sequence(lit(0), lit(63)),
        dIdx => ((lit(j * 131) + dIdx * 37) % 19 - 9).cast("long"))
      when(long_dot(col("q"), plane) >= 0, 1L << j).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** `sim_search_lsh`: bucketed ANN — queries compare only against corpus
    * vectors in their hyperplane bucket; exact cosine within bucket, top-5.
    */
  def simSearchLsh(embeddings: DataFrame): DataFrame = {
    val corpus = prep(embeddings).withColumn("bucket", bucketCol)
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qv"), col("norm2").as("qn"),
        col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(long_dot(col("q"), col("qv")), col("norm2"), col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** `sim_search_ivf`: inverted-file ANN — the centroid-based alternative to
    * hyperplane LSH (same probe-join shape, learned partitions).
    *
    * Mini k-means on the quantized vectors: centroids are re-quantized to
    * integers each iteration, so cluster assignment is an exact integer
    * argmin (`||c||² − 2·x·c` at a common scale) via LongDot — deterministic
    * across runs and partitionings. Only the k×64 centroid model touches the
    * driver (standard IVF training); all data stays distributed. At scale the
    * corpus is written `partitionBy(cluster)` and a probe prunes to one
    * partition.
    */
  def simSearchIvf(embeddings: DataFrame, k: Int = 16, iters: Int = 2): DataFrame = {
    val corpus = prep(embeddings).cache()
    try {
      val dim = 64
      // deterministic init: the k lowest-id vectors
      var cents: Seq[Array[Long]] = corpus.orderBy("vec_id").limit(k)
        .select("q").collect().map(_.getSeq[Long](0).toArray).toSeq

      def clusterCol(cs: Seq[Array[Long]]): Column = {
        val scored = cs.zipWithIndex.map { case (c, cid) =>
          val cc = c.map(v => v * v).sum
          struct(
            (lit(cc) - long_dot(col("q"), typedLit(c.toSeq)) * 2).as("score"),
            lit(cid.toLong).as("cid"))
        }
        least(scored: _*).getField("cid")
      }

      for (_ <- 1 to iters) {
        val sums = corpus.withColumn("cluster", clusterCol(cents))
          .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
        val byCluster = sums.groupBy(_.getLong(0))
        cents = cents.zipWithIndex.map { case (old, cid) =>
          byCluster.get(cid.toLong) match {
            case Some(rows) =>
              val arr = Array.fill(dim)(0L)
              rows.foreach { r =>
                arr(r.getInt(1)) = Math.round(r.getLong(2).toDouble / r.getLong(3).toDouble)
              }
              arr
            case None => old // empty cluster keeps its centroid
          }
        }
      }

      val bucketed = corpus.withColumn("cluster", clusterCol(cents))
      val queries = bucketed.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qv"), col("norm2").as("qn"),
          col("cluster"))
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
      bucketed.join(broadcast(queries), Seq("cluster"))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cosine", cosine(long_dot(col("q"), col("qv")), col("norm2"), col("qn")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cluster"),
          col("cosine"), col("rank").cast("long").as("rank"))
    } finally corpus.unpersist()
  }

  private val quantCte =
    """q AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, q,
      |         list_sum(list_transform(list_zip(q, q), p -> p[1] * p[2])) AS norm2
      |  FROM q)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_search_bruteforce" ->
      s"""WITH $quantCte,
         |queries AS (
         |  SELECT vec_id AS query_id, q AS qv, norm2 AS qn FROM n WHERE vec_id < 10),
         |scored AS (
         |  SELECT queries.query_id, n.vec_id AS neighbor_id,
         |         CAST(list_sum(list_transform(list_zip(n.q, queries.qv), p -> p[1] * p[2])) AS DOUBLE)
         |           / (SQRT(CAST(n.norm2 AS DOUBLE)) * SQRT(CAST(queries.qn AS DOUBLE))) AS cosine
         |  FROM n CROSS JOIN queries WHERE n.vec_id != queries.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5""".stripMargin,
    "sim_search_lsh" ->
      s"""WITH $quantCte,
         |planes AS (
         |  SELECT j, list_transform(range(0, 64), d -> (j * 131 + d * 37) % 19 - 9) AS plane
         |  FROM range(0, 8) t(j)),
         |bucketed AS (
         |  SELECT n.vec_id, n.q, n.norm2,
         |         CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane), z -> z[1] * z[2])) >= 0
         |                  THEN 1 << CAST(p.j AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM n CROSS JOIN planes p
         |  GROUP BY n.vec_id, n.q, n.norm2),
         |queries AS (
         |  SELECT vec_id AS query_id, q AS qv, norm2 AS qn, bucket
         |  FROM bucketed WHERE vec_id < 10),
         |scored AS (
         |  SELECT queries.query_id, b.vec_id AS neighbor_id, b.bucket,
         |         CAST(list_sum(list_transform(list_zip(b.q, queries.qv), p -> p[1] * p[2])) AS DOUBLE)
         |           / (SQRT(CAST(b.norm2 AS DOUBLE)) * SQRT(CAST(queries.qn AS DOUBLE))) AS cosine
         |  FROM bucketed b JOIN queries ON b.bucket = queries.bucket
         |  WHERE b.vec_id != queries.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, bucket, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, bucket, cosine, rank FROM ranked WHERE rank <= 5""".stripMargin
  )
}
