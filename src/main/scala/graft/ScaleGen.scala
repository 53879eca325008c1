package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a K× scale point from an existing testdata dir, for
  * measuring the wall-time-vs-data-ratio slope of the scale-critical
  * families (docs/SCALE.md "measured slope" table). The driver's testdata
  * tops out at sf0.1 (~17 MB), so the 100-TB design claims were only ever
  * plan-audited; this makes the slope observable locally.
  *
  * Replication is NOT naive duplication — that would change the problem:
  *  - documents: every 3rd word of copy c>0 gets a copy-specific suffix, so
  *    every word-3-gram shingle window contains a mutated token and
  *    cross-copy shingle sets are DISJOINT. Near-dup structure (the thing
  *    banded LSH work scales with) is preserved within a copy and never
  *    created across copies — pair counts scale linearly with K, the way a
  *    bigger real corpus behaves, instead of quadratically the way K exact
  *    clones would.
  *  - embeddings: per-(vec,dim,copy) deterministic jitter (±0.1 per dim,
  *    ≈0.91 cosine to the source vector) keeps the metric structure of the
  *    space without manufacturing K-way exact-duplicate clusters.
  *  - keys (doc_id, vec_id, event_id, user_id, l_orderkey, l_suppkey,
  *    o_orderkey) are offset by c·10⁸ per copy: entity cardinalities scale
  *    with the data, join integrity within a copy is untouched.
  *  - file count scales with K at a fixed base so every scale point has the
  *    SAME bytes-per-file discipline: the slope then measures the
  *    algorithm, not the accidental one-row-group serialism of the sf0.1
  *    files (docs/PLANS.md round-9 note 3).
  * Dimension tables (region/nation/customer/supplier/part) copy through
  * verbatim — at real scale dims stay broadcast-sized while facts grow.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <destDir> <copies> [tables]
  * `tables` (optional, comma-separated) restricts generation — a probe
  * that only reads `documents` shouldn't pay for a 12 GB lineitem. When
  * restricting, pin SPARK_GRAFT_SHUFFLE_PARTITIONS to the FULL-dir
  * adaptive value so the measurement protocol stays comparable
  * (Tuning.adaptiveShufflePartitions keys off dir bytes).
  */
object ScaleGen {
  private val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    val (src, dest, copies) = (args(0), args(1), args(2).toInt)
    val tables: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    require(copies >= 1, "copies must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, files: Int): Unit =
      if (tables.forall(_.contains(name))) {
        df.repartition(files).write.mode("overwrite").parquet(s"$dest/$name.parquet")
        println(s"[scalegen] $name -> $dest/$name.parquet ($files files)")
      }
    def replicated(df: DataFrame, perCopy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(c => perCopy(df, c)).reduce(_ union _)
    def off(c: Int)(cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Stride)))

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t, 1))

    write(replicated(read("lineitem"),
      (df, c) => off(c)("l_orderkey", "l_suppkey")(df)), "lineitem", 4 * copies)
    write(replicated(read("orders"),
      (df, c) => off(c)("o_orderkey")(df)), "orders", 2 * copies)
    write(replicated(read("events"),
      (df, c) => off(c)("event_id", "user_id")(df)), "events", 2 * copies)
    write(replicated(read("documents"), (df, c) =>
      if (c == 0) df
      else off(c)("doc_id")(df)
        .withColumn("text", expr(
          s"""array_join(transform(split(text, ' '),
             |  (w, j) -> CASE WHEN j % 3 = 2 THEN concat(w, 'q${c}z') ELSE w END),
             |  ' ')""".stripMargin))
        .withColumn("n_chars", length(col("text")))),
      "documents", 2 * copies)
    write(replicated(read("embeddings"), (df, c) =>
      if (c == 0) df
      else off(c)("vec_id")(df)
        .withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> " +
            s"cast(x + (pmod(xxhash64(vec_id, j, $c), 200) - 100) / 1000.0 as float))"))),
      "embeddings", 2 * copies)

    spark.stop()
  }
}
