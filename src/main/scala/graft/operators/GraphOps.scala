package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relational data. Companion to the
  * connected-components clustering in TextOps (q_dedup_cluster): that
  * one converges by pointer-jumping; the operators here are
  * fixed-iteration algorithms whose per-iteration arithmetic is made
  * EXACT so the DuckDB twin can hash-match (§2.12).
  *
  * The arithmetic contract is FIXED-POINT: ranks are integer
  * nano-units (rank × 10⁹ as BIGINT), per-edge contributions are
  * integer division `nr div deg`, and the damping update is
  * `teleportNano div n + (17 · Σc) div 20`. Every operation is exact
  * integer arithmetic — order-independent under Spark's partitioned
  * sums and bit-identical in any engine. A float formulation cannot
  * get there: a 9-dp rank divided by an integer degree lands exactly
  * on decimal midpoints, where HALF_UP (Spark) and HALF_EVEN-family
  * (DuckDB) rounding split systematically (observed: 38/50 rows off
  * by 1-3e-9 at sf0.01). Fixed-point is also the production answer —
  * deterministic re-runs regardless of partitioning or engine.
  *
  * Scale shape (100 TB posture): one cached symmetric edge list; each
  * iteration is edges ⋈ ranks (shuffle on node key) + one partial-
  * combining hash aggregate — the canonical distributed PageRank; no
  * driver-side state, no collect. A real deployment pre-partitions
  * edges and ranks on the node key once so every iteration's join is
  * co-located (the Bucketing substrate), and checkpoints ranks every
  * ~10 iterations to cut lineage.
  */
object GraphOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)
  private def cached(df: DataFrame): DataFrame = graft.Caches.cached(df)

  /** Shared verbatim with the oracle SQL (interpolated there).
    * damping 0.85 = dampNum/dampDen; teleport 0.15 = teleportNano/10⁹.
    */
  private[graft] val prIters = 3
  private[graft] val prScale = 1000000000L // 1 rank = 1e9 nano-units
  private[graft] val prTeleportNano = 150000000L
  private[graft] val prDampNum = 17L
  private[graft] val prDampDen = 20L

  /** PageRank (3 fixed iterations, d=0.85) over the supplier↔part
    * co-purchase graph: nodes are `s<l_suppkey>` / `p<l_partkey>`,
    * with a symmetric edge per distinct (supplier, part) pair in
    * lineitem. Symmetry guarantees deg ≥ 1 and no dangling mass
    * (every node also receives ≥ 1 contribution, so the iterated
    * frame never loses nodes). Output: top-50 nodes by fixed-point
    * rank (nano-units rescaled to a double for readability — a
    * BIGINT/10⁹ division both engines compute identically in IEEE).
    */
  def q_pagerank(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey")).distinct()
    val edges = cached(
      li.select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
        .union(li.select(concat(lit("p"), col("l_partkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")))
        .distinct())
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = broadcast(deg.agg(count(lit(1)).as("__n")))
    var rank = deg.crossJoin(n)
      .select(col("src").as("node"),
        expr(s"${prScale}L div __n").as("nr"))
    for (_ <- 1 to prIters) {
      val contrib = edges
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("nr div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
      rank = contrib.crossJoin(n)
        .select(col("dst").as("node"),
          expr(s"${prTeleportNano}L div __n" +
            s" + (${prDampNum}L * sc) div ${prDampDen}L").as("nr"))
    }
    rank.join(deg.withColumnRenamed("src", "node"), "node")
      .select(col("node"), col("deg"),
        (col("nr").cast("double") / lit(prScale).cast("double"))
          .as("pagerank"))
      .orderBy(col("pagerank").desc, col("node"))
      .limit(50)
  }
}
