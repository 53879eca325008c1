package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bounded cache registry for operators that cache an intra-query reused
  * staging frame (minhash signatures, say) but return a LAZY result.
  *
  * Those operators cannot use the `try { ... } finally unpersist()`
  * discipline of the eager Similarity builders: cache substitution happens
  * when the caller finally runs an action, so unpersisting on the way out
  * of the builder would drop the cache before it was ever used. Leaving the
  * cache live forever is the opposite failure — executor storage grows
  * linearly in the number of registered queries a session runs.
  *
  * The registry keeps the last [[Keep]] DISTINCT cached plans per session
  * (LRU) and unpersists evictions. No single operator registers more than
  * two staging caches, so an in-flight query can never lose its own cache;
  * re-invoking the SAME operator (warm benchmark iterations) is a no-op
  * that leaves the materialized cache in place.
  */
object CacheScope {
  private val Keep = 4

  // canonicalized plan → the cached frame, insertion-ordered for LRU
  private val live =
    mutable.Map.empty[SparkSession, mutable.LinkedHashMap[LogicalPlan, DataFrame]]

  /** Caches `df` (if an equivalent plan isn't already registered) and
    * returns it; evicts + unpersists the least-recently registered scoped
    * caches beyond the retention bound.
    */
  def cached(df: DataFrame): DataFrame = synchronized {
    val reg = live.getOrElseUpdate(df.sparkSession, mutable.LinkedHashMap.empty)
    val key = df.queryExecution.analyzed.canonicalized
    reg.remove(key) match {
      case Some(prev) =>
        // an external clearCache() (Verify/Bench per-query isolation) may
        // have dropped the relation while the registry entry survived —
        // re-arm it, or the caller silently runs uncached (storageLevel
        // consults the CacheManager by canonicalized plan, so this is a
        // no-op when the cache is still live)
        if (prev.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
          prev.cache()
        reg.put(key, prev) // LRU bump
        prev
      case None =>
        df.cache()
        reg.put(key, df)
        while (reg.size > Keep) {
          val (k, old) = reg.head
          reg.remove(k)
          // an external clearCache() (Verify/Bench per-query isolation) may
          // have already dropped it; unpersist is idempotent
          old.unpersist()
        }
        df
    }
  }
}
