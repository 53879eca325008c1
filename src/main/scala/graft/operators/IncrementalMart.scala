package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental mart maintenance — the reference's freshness model applied at
  * the transform layer (SURVEY §2.10 "Incremental window": per-source
  * lookbacks of 5-90 days re-read a trailing window and upsert idempotently).
  *
  * For a date-keyed mart whose rows depend only on source rows of the same
  * bucket (true for all the reference's weekly/monthly marts), refreshing =
  * recompute the trailing buckets from the trailing source window and splice
  * them over the existing mart. History older than the cutoff is never
  * re-read — at 100 TB a daily refresh touches days, not years, and with the
  * mart stored partitioned by the bucket column the splice is a
  * partition-overwrite, not a rewrite.
  */
object IncrementalMart {

  /** Refresh `existing` (bucketed by `bucketCol`) from the trailing source
    * window: rows with bucket >= cutoff are replaced by `mart(recentSource)`,
    * older rows are kept as-is. `cutoff` must lie on a bucket boundary so a
    * bucket is never split between old and recomputed halves.
    */
  def refreshWindow(
      existing: DataFrame,
      source: DataFrame,
      mart: DataFrame => DataFrame,
      sourceDateCol: Column,
      bucketCol: String,
      cutoff: Column): DataFrame = {
    val recomputed = mart(source.where(sourceDateCol >= cutoff))
    existing.where(col(bucketCol) < cutoff).unionByName(recomputed)
  }
}
