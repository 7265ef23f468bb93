package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Session-scoped once-per-key computation memo — the shared
  * implementation of the pattern the graph substrate established
  * (GraphOps.substrateMemo) and that bpeTrain / kmeansCells /
  * connectedComponents consumers need too: a multi-job derivation
  * whose per-step checkpoints mint fresh LogicalRDDs, so
  * CacheManager plan-dedup can never unify two invocations and each
  * consumer would otherwise pay the whole build again.
  *
  * Discipline (the r8 lessons, verbatim from coEdgesEnc):
  *  - the value is a lazily-RUN FutureTask memoized with putIfAbsent,
  *    so the build executes OUTSIDE any map lock (a build that runs
  *    Spark jobs inside a CHM bin lock blocks unrelated keys and can
  *    deadlock on re-entry); losers block on the future;
  *  - a failed build removes its entry so a later call retries
  *    instead of caching the exception forever;
  *  - entries evict when the owning SparkContext ends (one listener
  *    per context, self-unregistering).
  *
  * Two r10-verdict fixes on top:
  *  - the key includes the context's CHECKPOINT DIR at build time: a
  *    memoized frame bakes in the checkpoint mode its build ran under
  *    (localCheckpoint vs reliable `checkpoint()`), so returning it
  *    after `sc.setCheckpointDir(...)` silently kept executor-pinned
  *    localCheckpoint lineage — exactly the cluster-survivability
  *    property ReliableCheckpointSpec exists to protect. Keying on
  *    the dir makes a mode change a cache miss, never a stale hit;
  *  - every instance registers with [[graft.Caches.addReleaseHook]]
  *    at construction, so `Caches.releaseAll()` (the end-of-measured-
  *    run sweep, and the between-bench-passes cold reset) drops memo
  *    entries together with the Spark caches they shadow. Without it
  *    the bench's min-of-passes protocol recorded warm-memo numbers:
  *    pass 2 never re-paid the shared builds.
  *
  * This memoizes PLANS/frames within one session — never results
  * across runs: every action over the memoized value still computes
  * from the parquet inputs.
  */
final class SessionMemo[K, V] {
  private val map = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, Option[String], K), java.util.concurrent.FutureTask[V]]()
  private val hooks =
    new java.util.concurrent.ConcurrentHashMap[SparkContext, Unit]()

  graft.Caches.addReleaseHook(() => map.clear())

  private def registerEviction(sc: SparkContext): Unit =
    hooks.computeIfAbsent(sc, { _ =>
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          map.keySet.removeIf(_._1.sparkContext eq sc)
          hooks.remove(sc)
          sc.removeSparkListener(this)
        }
      })
      ()
    })

  def get(s: SparkSession, key: K)(build: => V): V = {
    registerEviction(s.sparkContext)
    val k = (s, s.sparkContext.getCheckpointDir, key)
    val fresh = new java.util.concurrent.FutureTask[V](() => build)
    val prior = map.putIfAbsent(k, fresh)
    val task = if (prior == null) { fresh.run(); fresh } else prior
    try task.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        map.remove(k, task)
        throw e.getCause
    }
  }
}
