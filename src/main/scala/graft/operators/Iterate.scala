package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative operators (dedupClusters' min-label
  * propagation, graphCentrality's PageRank rounds, BPE's merge loop): each
  * round must materialize its iterate AND replace the logical plan with a
  * leaf, or the plan tree grows geometrically per round (measured: a 60 MB
  * plan string by round 3 of dedupClusters).
  *
  * Two backends behind one knob, because the truncation mechanism IS the
  * fault-tolerance decision:
  *  - default — `localCheckpoint(eager = true)`: blocks in executor
  *    storage. Cheapest, and correct wherever executors don't die
  *    (local[*]); but lineage is truncated, so on a cluster a lost
  *    executor's blocks are IRRECOVERABLE and the whole job fails.
  *  - `spark.graft.checkpoint.reliable=true` — reliable
  *    `.checkpoint(eager = true)`: the iterate is written to the
  *    checkpoint directory (`sparkContext.setCheckpointDir`, an HDFS/object
  *    store path in production — docs/DEPLOY.md §2) and read back from
  *    files, so executor loss costs a re-read, not the job.
  *
  * CheckpointRecoverySpec pins both contracts by simulating executor
  * storage loss (wiping every persisted block mid-computation): the
  * reliable mode completes bit-identically, the local mode fails with the
  * documented checkpoint-block error.
  */
object Iterate {
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.checkpoint.reliable")
        .contains("true"))
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** [[materialize]] plus ONE observed aggregate evaluated by the SAME
    * materialization action (r17, guide §1.2 — fewer passes): the
    * iterative loops' convergence check (`changes == 0`) otherwise pays a
    * second job per round over the just-checkpointed iterate. `observe`
    * rides a CollectMetrics node through the eager checkpoint's
    * `withAction`, so the metric is complete when this returns — no extra
    * job, no extra pass. Aggregate must be retry-monotone for the caller's
    * use: the loops test `== 0`, and a re-run task contributes 0 to an
    * all-converged round and > 0 otherwise, so the boolean cannot flip.
    */
  def materializeObserved(df: DataFrame, metric: org.apache.spark.sql.Column)
      : (DataFrame, Long) = {
    val obs = org.apache.spark.sql.Observation()
    val out = materialize(df.observe(obs, metric.as("m")))
    val v = obs.get("m")
    (out, v match {
      case l: java.lang.Long => l.longValue()
      case n: java.lang.Number => n.longValue()
      case other => sys.error(s"materializeObserved: non-numeric metric $other")
    })
  }
}
