package graft.operators

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
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
  *
  * Eviction caveat for LAZY results: a frame scoped here is only protected
  * until [[Keep]] LATER registrations occur — a caller that builds a lazy
  * result, then runs ≥ Keep other scoped operators before its first action,
  * silently recomputes (correct, just uncached). Operators whose loop
  * correctness depends on materialization (dedupClusters, bpeTrainMerges)
  * therefore run an eager action / localCheckpoint while their cache is
  * provably fresh, never relying on registry survival. graphCentrality is
  * NOT in that set: at iters ≤ its checkpoint period the whole result is
  * lazy, so its scope-cached edge list only survives if the caller acts on
  * the result within Keep registrations — a deferred first action
  * recomputes knnGraph (correct, just slower).
  *
  * Lifecycle: sessions are weakly referenced, and the whole registry drops
  * on SparkListenerApplicationEnd, so a stopped application (or a
  * dereferenced short-lived session) cannot stay pinned here along with up
  * to Keep cached frames.
  */
object CacheScope {
  private val Keep = 4

  // canonicalized plan → the cached frame, insertion-ordered for LRU.
  // Weak session keys: a dropped session's registry entries become
  // collectable (its cached blocks die with the session's executors state).
  private val live =
    new java.util.WeakHashMap[SparkSession, mutable.LinkedHashMap[LogicalPlan, DataFrame]]

  // contexts that already carry the application-end cleanup hook
  private val hooked = mutable.Set.empty[org.apache.spark.SparkContext]

  /** Caches `df` (if an equivalent plan isn't already registered) and
    * returns it; evicts + unpersists the least-recently registered scoped
    * caches beyond the retention bound.
    */
  def cached(df: DataFrame): DataFrame = synchronized {
    val session = df.sparkSession
    if (hooked.add(session.sparkContext)) {
      session.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
          CacheScope.synchronized {
            live.clear()
            hooked.clear()
          }
      })
    }
    var reg = live.get(session)
    if (reg == null) {
      reg = mutable.LinkedHashMap.empty[LogicalPlan, DataFrame]
      live.put(session, reg)
    }
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
