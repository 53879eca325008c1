package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: ad-hoc micro-timings for plan investigation (not part of the
  * library surface; keeps experiments out of the operators).
  *
  * Current experiment (round 10): cost structure of the banded hyperplane
  * bucketing — how does a sign-bit projection scale with plane count, and
  * does packing the sign bits into one signature column change it?
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT/codegen warmup

    def time(name: String)(f: => Any): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    // simhash_fast pair-volume diagnostic: is the x300 slope candidates or constants?
    if (sys.env.contains("SPARK_GRAFT_PROBE_SIMHASH")) {
      val docsS = graft.sources.Tables.documents(spark, sfDir)
      time("simhash-fast-pairs")(graft.operators.Dedup.dedupSimhash(docsS, fastHash = true)
        .agg(count(lit(1))).collect()(0))
      spark.stop(); return
    }

    // knn_graph blocking scaling law: fixed 8-bit multiprobe (B ~ 28) vs
    // k-means blocking with k ~ sqrt(N) (the IVF scaling-law form)
    val emb2 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVec = emb2.count()
    val rootN = math.max(16, math.sqrt(nVec.toDouble).toInt)
    if (!sys.env.contains("SPARK_GRAFT_PROBE_SKIP_MULTIPROBE"))
      time(s"knn-multiprobe")(graft.operators.Similarity.knnGraph(emb2)
        .agg(count(lit(1))).collect()(0))
    time(s"knn-kmeans-k$rootN")(graft.operators.Similarity.knnGraph(emb2,
      kmeansK = Some(rootN)).agg(count(lit(1))).collect()(0))
    time(s"hardneg-kmeans-k$rootN")(graft.operators.Similarity.mineHardNegatives(emb2,
      kmeansK = Some(rootN)).agg(count(lit(1))).collect()(0))

    // tf-idf stage decomposition at the current SF
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .where(length(col("term")) >= 3)
    time("tfidf-explode-count")(toks.agg(count(lit(1))).collect()(0))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    time("tfidf-tf-agg")(tf.agg(count(lit(1))).collect()(0))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    time("tfidf-df-agg")(dfc.agg(count(lit(1))).collect()(0))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val joined = tf.join(dfc, "term").crossJoin(broadcast(n))
      .withColumn("score_ppm", expr("(cast(tf as decimal(38,0)) * 1000000 * n_docs) div df"))
    time("tfidf-join-score")(joined.agg(count(lit(1))).collect()(0))
    val joinedLong = tf.join(dfc, "term").crossJoin(broadcast(n))
      .withColumn("score_ppm", expr("(tf * 1000000L * n_docs) div df"))
    time("tfidf-join-score-long")(joinedLong.agg(count(lit(1))).collect()(0))
    time("tfidf-full")(graft.operators.TextAnalysis.textTfidfTerms(docs).agg(count(lit(1))).collect()(0))

    spark.stop()
  }
}
