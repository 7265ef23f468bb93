package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for iterative operators (SURVEY §2.11
  * q_dedup_cluster, §2.11 IVF centroids).
  *
  * `localCheckpoint` materializes blocks on executors — fast, but an
  * executor loss mid-iteration kills the job, which is routine on a
  * 1000-executor cluster. When the application has configured a
  * reliable checkpoint directory (`SparkContext.setCheckpointDir`,
  * i.e. an HDFS/object-store path at cluster scale), iterative
  * operators automatically upgrade to reliable `checkpoint()`: blocks
  * land in fault-tolerant storage and survive executor churn, at the
  * cost of one extra computation of the (small) checkpointed frame
  * per step — the standard Pregel trade. With no directory set
  * (local dev, tests, the bench) the fast local path is used.
  *
  * ReliableCheckpointSpec proves the two modes produce identical
  * cluster assignments and that reliable mode actually writes
  * checkpoint files.
  */
object Checkpoints {
  /** Truncate lineage: reliable `checkpoint()` iff the context has a
    * checkpoint dir, else `localCheckpoint()`. Both are eager.
    */
  def ckpt(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Lazy variant for loops where a driver-side action immediately
    * follows the checkpoint anyway (q_pagerank_conv's convergence
    * aggregate): the action materializes the checkpoint inside its own
    * job, so the loop pays ONE job per iteration instead of two
    * (eager materialization + the action). Same lineage truncation —
    * both forms wrap the plan in a LogicalRDD.
    */
  def ckptLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)
}
