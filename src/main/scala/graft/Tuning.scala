package graft

/** Input-proportional shuffle sizing — the deployment knob docs/SCALE.md's
  * guidance ("size `spark.sql.shuffle.partitions` so per-task sorts fit
  * executor memory") turns, computed instead of hand-set.
  *
  * Rationale: a fixed partition count is a latent superlinearity. Reduce-
  * side state per task is `shuffleBytes / partitions`, so holding
  * `partitions` constant while the input grows K× grows per-task sort/agg
  * state K× until it crosses execution memory and spills. The round-11
  * instrumented A/B (graft.Probe, docs/SCALE.md "Marts knee, attributed")
  * measured exactly that at x300: `fct_reviewer_activity` at 32 partitions
  * spills 24.2 GB and burns ~1100 cpu-s; at ~109 it spills 4.3 GB and
  * burns ~800. The same run also measured the two boundaries of the knob:
  *  - it does NOT fix map-side partial-aggregation spill (constant
  *    ~12 GB for the price-grain marts at every partition count — that
  *    side is bounded by `spark.sql.files.maxPartitionBytes`, already the
  *    standard 128 MB);
  *  - overshooting costs cpu again (327 partitions measured worse than
  *    109 at the same scale), so the formula targets the measured sweet
  *    spot rather than "more".
  *
  * The sweet spot was ~50 MB of COMPRESSED shuffle bytes per partition —
  * Spark's own AQE advisory target (64 MB) with margin — and the heavy
  * marts' total shuffle-write ≈ the input dir's parquet bytes (both
  * columnar-derived, both lz4-class compressed), so on-disk input bytes
  * stand in for the per-query shuffle estimate the planner can't know up
  * front. AQE coalescing (on by default) then shrinks the small stages
  * back down per-stage, which is why a data-proportional count is safe to
  * set session-wide.
  *
  * Floored at the core count so small inputs keep the historical
  * 1-partition-per-core layout (byte-identical bench behavior at sf0.1,
  * where the dir is ~17 MB). `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides
  * for A/B measurement.
  */
object Tuning {
  /** Compressed shuffle bytes one reduce task should own (measured sweet
    * spot; Spark's AQE advisory 64 MB, with margin).
    */
  val TargetShuffleBytesPerPartition: Long = 48L << 20

  /** AQE coalescing advisory (`spark.sql.adaptive.
    * advisoryPartitionSizeInBytes`), deliberately BELOW the shuffle
    * sizing target: with Spark's default 64 MB advisory, AQE merges
    * reduce partitions back up past the count the formula above chose,
    * and a sort-heavy reduce stage (window frames, SMJ) then rebuilds
    * the per-task-state spill the formula exists to prevent — compressed
    * shuffle bytes decode ~5× into UnsafeRow sort state, so 64 MB
    * compressed ≈ 340 MB of sort per task, past the ~450 MB/thread
    * execution-memory fair share at 0.75 GB/core. Measured at x1000
    * (17 GB, same-JVM interleaved A/B, docs/SCALE.md § "x1000 advisory"):
    * 16 MB vs the default 64 MB reads fct_stock_prices 1299 vs 1919
    * cpu-s with the 41.8 GB window-sort spill eliminated, and
    * fct_reviewer_activity 3681 vs 4657 (mins) with its 8 GB spill
    * eliminated. Below ~2 GB of shuffle the knob is inert:
    * `parallelismFirst` (default true) already coalesces to the core
    * count, so driver-scale bench behavior is untouched.
    * `SPARK_GRAFT_ADVISORY_BYTES` overrides for A/B measurement.
    */
  def advisoryPartitionBytes: Long =
    sys.env.get("SPARK_GRAFT_ADVISORY_BYTES")
      .flatMap { raw =>
        val parsed = raw.trim.toLongOption.filter(_ > 0)
        if (parsed.isEmpty)
          System.err.println(s"[graft] ignoring SPARK_GRAFT_ADVISORY_BYTES="
            + s"'$raw' (not a positive long); using 16 MB default")
        parsed
      }
      .getOrElse(16L << 20)

  /** Recursive on-disk size of a data directory (plain IO — callable before
    * the SparkSession exists, since `spark.sql.shuffle.partitions` is best
    * set at build time).
    */
  def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
      else f.length()
    walk(new java.io.File(dir))
  }

  /** Shuffle partition count scaled to `dataDir`'s bytes, floored at
    * `floor` (the core count locally; on a cluster, total executor cores).
    */
  def adaptiveShufflePartitions(dataDir: String, floor: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .flatMap { raw =>
        val parsed = raw.trim.toIntOption.filter(_ > 0)
        if (parsed.isEmpty)
          System.err.println(s"[graft] ignoring SPARK_GRAFT_SHUFFLE_PARTITIONS="
            + s"'$raw' (not a positive int); using the adaptive formula")
        parsed
      }
      .getOrElse(math.max(floor,
        (dirBytes(dataDir) / TargetShuffleBytesPerPartition).toInt))
}
