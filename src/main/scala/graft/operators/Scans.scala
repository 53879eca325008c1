package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for heavy map phases (r17, guide §2.2/§2.5).
  *
  * A validation-SF parquet file is a single row group, so a scan stage —
  * and any expensive per-row work pipelined into it (token explodes,
  * portable-hash batteries) — runs as ONE task while the rest of the
  * session idles. Operators whose map phase is measured scan-bound widen
  * the (projected!) input round-robin first; at real scale a corpus scan
  * already has ≥ cores splits and this is a no-op, so the production plan
  * is untouched. `spark.graft.scan.widen=false` restores the historical
  * plan — the same-JVM A/B toggle (Probe conf sweep) used to validate
  * each call site.
  *
  * Widening is MODEST (2× splits, floor 8, cap cores): the Marts.sales
  * width sweep measured 32 concurrent string-keyed aggregate tasks paying
  * more in G1 churn than they recover in parallelism at this data size.
  * Results are partition-invariant everywhere this is used (keyed
  * aggregations); plan audits must not pin a caller's exchange count
  * (the branch reads split counts at construction time).
  */
private[graft] object Scans {
  def widenIfNarrow(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption("spark.graft.scan.widen").contains("false")) return df
    val cores = spark.sparkContext.defaultParallelism
    val splits = df.rdd.getNumPartitions
    if (splits >= cores) df
    else df.repartition(math.min(cores, math.max(splits * 2, 8)))
  }
}
