package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of persisted shared intermediates (the
  * tokenized corpus, shingle tables, signature frames — see
  * TextOps.cached). Persisting is how one materialization serves many
  * consumers within a run; this registry is the matching RELEASE path:
  * without it, cache entries accumulate for the session lifetime (one
  * set per data dir), which on a long-lived cluster session is a slow
  * leak. Bench and Verify call [[releaseAll]] when a measured run
  * ends; at 100 TB the same role is played by dropping the staged
  * table that stood in for the cache.
  */
object Caches {
  private val registry =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist and remember for later release. MEMORY_AND_DISK: spill,
    * never silently evict-and-recompute.
    */
  def cached(df: DataFrame): DataFrame = {
    registry.add(df)
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist everything registered since the last call. Non-blocking
    * (the executors drop blocks asynchronously); NOT cascading — by
    * the time a run ends no dependent query is still executing.
    */
  def releaseAll(): Unit = {
    var df = registry.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = registry.poll()
    }
  }
}
