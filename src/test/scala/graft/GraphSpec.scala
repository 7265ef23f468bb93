package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

/** q_pagerank vs a driver-side reference implementation of the SAME
  * fixed-point contract (nano-unit BIGINT ranks, truncating integer
  * division) on the sf0.001 co-purchase graph. Collect here is
  * test-only — the operator itself never leaves the cluster.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceRanks(): Map[String, (Long, Long)] = {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.get(0).toString, r.get(1).toString))
    val edges = li.flatMap { case (s, p) =>
      Seq(("s" + s, "p" + p), ("p" + p, "s" + s))
    }.distinct
    val deg = edges.groupBy(_._1).map { case (k, v) => (k, v.length.toLong) }
    val n = deg.size.toLong
    var rank: Map[String, Long] = deg.keys.map(k => (k, GraphOps.prScale / n)).toMap
    for (_ <- 1 to GraphOps.prIters) {
      rank = edges.groupBy(_._2).map { case (dst, in) =>
        val sc = in.map { case (src, _) => rank(src) / deg(src) }.sum
        (dst, GraphOps.prTeleportNano / n
          + (GraphOps.prDampNum * sc) / GraphOps.prDampDen)
      }
    }
    rank.map { case (k, nr) => (k, (deg(k), nr)) }
  }

  test("q_pagerank matches the fixed-point reference exactly, top-50 ordered") {
    val got = GraphOps.q_pagerank(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = referenceRanks().toSeq
      .map { case (node, (deg, nr)) =>
        (node, deg, nr.toDouble / GraphOps.prScale.toDouble)
      }
      .sortBy { case (node, _, pr) => (-pr, node) }
      .take(50)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
  }

  test("q_pagerank_conv matches a driver-side run-to-convergence " +
    "reference exactly: same depth, same ranks, depth < cap") {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.get(0).toString, r.get(1).toString))
    val edges = li.flatMap { case (s, p) =>
      Seq(("s" + s, "p" + p), ("p" + p, "s" + s))
    }.distinct
    val deg = edges.groupBy(_._1).map { case (k, v) => (k, v.length.toLong) }
    val n = deg.size.toLong
    val theta = GraphOps.prScale / GraphOps.prConvThetaDen
    var rank: Map[String, Long] =
      deg.keys.map(k => (k, GraphOps.prScale / n)).toMap
    var iters = 0
    var delta = Long.MaxValue
    while (iters < GraphOps.prConvMaxIters && delta >= theta) {
      val next = edges.groupBy(_._2).map { case (dst, in) =>
        val sc = in.map { case (src, _) => rank(src) / deg(src) }.sum
        (dst, GraphOps.prTeleportNano / n
          + (GraphOps.prDampNum * sc) / GraphOps.prDampDen)
      }
      delta = next.map { case (k, nr) => math.abs(nr - rank(k)) }.sum
      rank = next
      iters += 1
    }
    assert(iters < GraphOps.prConvMaxIters,
      s"fixture did not converge under the cap (depth $iters)")
    val want = rank.toSeq
      .map { case (node, nr) =>
        (node, deg(node), nr.toDouble / GraphOps.prScale.toDouble,
          iters.toLong)
      }
      .sortBy { case (node, _, pr, _) => (-pr, node) }
      .take(50)
    val got = GraphOps.q_pagerank_conv(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
    Caches.releaseAll()
  }

  test("triangleCounts: K4 + pendant + isolated edge, exact counts") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, every node in 3), pendant 5 off
    // node 1, isolated edge {6,7}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (6L, 7L)).toDF("a_id", "b_id")
    val got = GraphOps.triangleCounts(edges)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = Seq(
      (1L, 4L, 3L, 0.5), // deg 4: 2*3/(4*3)
      (2L, 3L, 3L, 1.0), (3L, 3L, 3L, 1.0), (4L, 3L, 3L, 1.0),
      (5L, 1L, 0L, 0.0), (6L, 1L, 0L, 0.0), (7L, 1L, 0L, 0.0))
    assert(got.toSeq == want)
  }

  test("triangleCounts agrees with a naive x<y<z reference on the sf0.001 pair graph") {
    val pairs = operators.TextOps.minhashCandidatePairs(spark, TestSpark.sf0001)
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val eset = es.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val naive = for {
      (x, y) <- es; z <- nodes
      if y < z && eset.contains((y, z)) && eset.contains((x, z))
    } yield Seq(x, y, z)
    val wantTri = naive.flatten.groupBy(identity)
      .map { case (n, v) => (n, v.length.toLong) }
    val got = GraphOps.triangleCounts(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { n =>
      assert(got(n) == wantTri.getOrElse(n, 0L), s"node $n")
    }
  }

  test("q_bfs agrees with a driver-side Dijkstra-on-unit-edges reference") {
    val got = GraphOps.q_bfs(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // independent reference: rebuild the co-purchase edges and BFS
    // from the seed with a plain queue
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (s"s${r.getLong(0)}", s"p${r.getLong(1)}"))
    val adj = (li ++ li.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).distinct) }
    val dist = scala.collection.mutable.Map(GraphOps.bfsSeed -> 0L)
    var frontier = Seq(GraphOps.bfsSeed)
    for (d <- 1 to GraphOps.bfsHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Array.empty[String]))
        .distinct.filterNot(dist.contains)
      frontier.foreach(n => dist(n) = d.toLong)
    }
    assert(got == dist.toMap)
    // the seed itself is distance 0 and hop counts are within bounds
    assert(got(GraphOps.bfsSeed) == 0L)
    assert(got.values.forall(d => d >= 0L && d <= GraphOps.bfsHops))
  }

  test("rank mass is conserved within truncation loss") {
    // every truncating division loses < 1 nano-unit, and there is one
    // per edge contribution plus two per node per iteration (plus the
    // r0 seeding) — a vanishing fraction of the 1e9 total; mass never
    // grows because truncation only rounds down
    val full = referenceRanks().values.map(_._2).sum
    assert(full <= GraphOps.prScale, s"mass grew: $full")
    assert(full > (GraphOps.prScale * 999L) / 1000L, s"mass $full")
  }

  test("label propagation: disjoint triangles settle into exactly " +
    "their own communities; a bridged pair keeps total coverage") {
    import spark.implicits._
    def sym(pairs: Seq[(String, String)]) =
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val twoTri = sym(Seq(("a1","a2"),("a2","a3"),("a1","a3"),
      ("b1","b2"),("b2","b3"),("b1","b3")))
    val out = GraphOps.labelPropagate(twoTri, 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out.size == 6)
    assert(Set("a1","a2","a3").map(out).size == 1,
      "triangle A did not converge to one label")
    assert(Set("b1","b2","b3").map(out).size == 1,
      "triangle B did not converge to one label")
    assert(out("a1") != out("b1"),
      "disjoint triangles merged")
    val bridged = sym(Seq(("a1","a2"),("a2","a3"),("a1","a3"),
      ("b1","b2"),("b2","b3"),("b1","b3"),("a3","b1")))
    val out2 = GraphOps.labelPropagate(bridged, 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out2.size == 6 && out2.values.toSet.subsetOf(out2.keySet))
  }

  test("delta-propagation LPA equals the full per-round recompute " +
    "node-for-node: synthetic fixtures and the real co-purchase " +
    "graph, at every round depth") {
    import spark.implicits._
    def sym(pairs: Seq[(String, String)]) =
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    // bridged triangles + a path + a star: changed sets shrink at
    // different speeds, exercising the frontier restriction
    val g = sym(Seq(("a1","a2"),("a2","a3"),("a1","a3"),
      ("b1","b2"),("b2","b3"),("b1","b3"),("a3","b1"),
      ("c1","c2"),("c2","c3"),("c3","c4"),("c4","c5"),
      ("h","x1"),("h","x2"),("h","x3"),("h","x4")))
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1))).toMap
    for (iters <- 1 to 4)
      assert(labels(GraphOps.labelPropagateDelta(g, iters)) ==
        labels(GraphOps.labelPropagate(g, iters)),
        s"delta != full at iters=$iters")
    // the real bipartite co-purchase edge shape (q_label_prop's input)
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select(col("l_suppkey"), col("l_partkey")).distinct()
    val co = li.select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      .union(li.select(concat(lit("p"), col("l_partkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")))
    assert(labels(GraphOps.labelPropagateDelta(co, GraphOps.lpIters)) ==
      labels(GraphOps.labelPropagate(co, GraphOps.lpIters)))
  }

  test("q_label_prop: community sizes are positive and labels are " +
    "graph nodes") {
    val out = GraphOps.q_label_prop(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getString(0).matches("[sp][0-9]+"))
    }
  }

  test("lpEnc is an order-isomorphism onto node-STRING order (the " +
    "min-label tie-break both engines take) and lpDecode inverts it " +
    "exactly, across digit-length boundaries and both sides") {
    import spark.implicits._
    val keys = Seq(0L, 1L, 2L, 9L, 10L, 11L, 12L, 19L, 20L, 99L, 100L,
      101L, 199L, 200L, 999L, 1000L, 10000L, 123456789L, 999999999L,
      1000000000L, 99999999999L,
      // the 15-digit NIBBLE boundary (len ≤ 15 is the hard bound)
      100000000000000L, 999999999999999L)
    def frame(isS: Boolean) = keys.toDF("k").select(
      GraphOps.lpEnc(col("k"), isS).as("enc"),
      concat(lit(if (isS) "s" else "p"), col("k").cast("string")).as("node"))
    val got = frame(true).union(frame(false))
      .select(col("node"), col("enc"),
        GraphOps.lpDecode(col("enc")).as("dec"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    got.foreach { case (node, _, dec) =>
      assert(dec == node, s"decode($node) -> $dec") }
    assert(got.map(_._2).distinct.length == got.length, "not injective")
    assert(got.sortBy(_._2).map(_._1).toSeq == got.map(_._1).sorted.toSeq,
      "long order != string order")
    // past the nibble: a 16-digit key must FAIL LOUDLY, never
    // silently corrupt the digits/ordering (the +len carry)
    val ex = intercept[Exception] {
      Seq(1000000000000000L).toDF("k")
        .select(GraphOps.lpEnc(col("k"), isS = true)).collect()
    }
    assert(ex.getMessage.contains("15-digit") ||
      Option(ex.getCause).exists(_.getMessage.contains("15-digit")),
      s"wrong failure: $ex")
  }

  test("q_label_prop's encoded rounds equal the string-path recompute " +
    "end-to-end on the real co-purchase graph") {
    import spark.implicits._
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select(col("l_suppkey"), col("l_partkey")).distinct()
    val co = li.select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      .union(li.select(concat(lit("p"), col("l_partkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")))
    val strTop = GraphOps.labelPropagate(co, GraphOps.lpIters)
      .groupBy(col("lbl").as("community"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))
      .limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val encTop = GraphOps.q_label_prop(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(encTop == strTop)
  }

  test("kcore: K4-with-tail fixture peels to exactly the clique; a " +
    "pure chain peels to nothing") {
    import spark.implicits._
    // K4 on 1..4, a tail 4-5-6, and an isolated edge 7-8: the 3-core
    // is exactly the clique (tail and edge peel away, which also
    // drops node 4's degree from 4 to 3)
    val pairs = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (4L,5L),(5L,6L),(7L,8L)).toDF("a_id", "b_id")
    val core = GraphOps.kcore(pairs, 3, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val chain = (1L to 9L).sliding(2)
      .map(w => (w.head, w.last)).toSeq.toDF("a_id", "b_id")
    assert(GraphOps.kcore(chain, 3, 16).isEmpty)
  }

  test("q_kcore: every member has >= k neighbors inside the core " +
    "(brute-force recheck) and core degree matches") {
    val pairs = graft.operators.TextOps
      .minhashCandidatePairs(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = GraphOps.q_kcore(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // driver-side reference peel
    var alive = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    var changed = true
    while (changed) {
      val deg = pairs.filter(p => alive(p._1) && alive(p._2))
        .flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, xs) => (n, xs.length) }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= GraphOps.kcoreK)
      changed = next != alive
      alive = next
    }
    val refDeg = pairs.filter(p => alive(p._1) && alive(p._2))
      .flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (n, xs) => (n, xs.length.toLong) }
    assert(out == refDeg, "engine 3-core differs from reference peel")
    Caches.releaseAll()
  }

  test("q_hits matches a driver-side HITS reference exactly: raw " +
    "BIGINT scores, rescale, per-role top-k and ordering") {
    val got = GraphOps.q_hits(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // independent reference over the directed s→p pairs
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (s"s${r.get(0)}", s"p${r.get(1)}"))
    var auth: Map[String, Long] = li.map(_._2).distinct.map((_, 1L)).toMap
    var hub: Map[String, Long] = Map.empty
    for (_ <- 1 to GraphOps.hitsIters) {
      hub = li.groupBy(_._1).map { case (s, es) =>
        (s, es.map(e => auth(e._2)).sum) }
      auth = li.groupBy(_._2).map { case (p, es) =>
        (p, es.map(e => hub(e._1)).sum) }
    }
    def top(m: Map[String, Long], role: String) = {
      val mx = m.values.max
      m.toSeq.sortBy { case (n, v) => (-v, n) }.take(GraphOps.hitsTopK)
        .map { case (n, v) =>
          val score = (BigInt(v) * GraphOps.hitsScale / BigInt(mx)).toLong
          (role, n, v, score) }
    }
    val want = (top(auth, "auth") ++ top(hub, "hub"))
      .sortBy { case (role, n, v, _) => (role, -v, n) }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
  }

  test("q_sssp matches a driver-side Bellman-Ford reference exactly, " +
    "and a weighted detour can beat the direct hop (synthetic check " +
    "of the non-frontier relaxation)") {
    val got = GraphOps.q_sssp(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(org.apache.spark.sql.functions.min(col("l_quantity")).as("w"))
      .collect()
      .map(r => (s"s${r.get(0)}", s"p${r.get(1)}", r.getDouble(2).toLong))
    val wedges = li.flatMap { case (s, p, w) => Seq((s, p, w), (p, s, w)) }
    var dist = Map(GraphOps.bfsSeed -> 0L)
    for (_ <- 1 to GraphOps.ssspHops) {
      val relaxed = wedges.flatMap { case (a, b, w) =>
        dist.get(a).map(d => (b, d + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => (n, ds.map(_._2).min) }
    }
    assert(got == dist, "engine SSSP differs from Bellman-Ford reference")
    assert(got(GraphOps.bfsSeed) == 0L)
    // weighted dist within a hop ball is <= hops * max weight and the
    // reach equals BFS reach (weights don't change connectivity)
    val bfsReach = GraphOps.q_bfs(spark, TestSpark.sf0001).collect()
      .map(_.getString(0)).toSet
    assert(got.keySet == bfsReach, "SSSP reach != BFS reach")
    Caches.releaseAll()
  }

  test("edge substrate: one bucketed materialization per (session, dir) " +
    "serves every graph op exchange-free on the bucket key, and " +
    "survives a cache release") {
    Caches.releaseAll()
    val e1 = GraphOps.coEdgesEnc(spark, TestSpark.sf0001)
    // the materialized table exists and the scan is bucketed
    val tables = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_edges_"))
    assert(tables.nonEmpty, "substrate table missing from the catalog")
    val scanPlan = e1.queryExecution.executedPlan.toString
    assert(scanPlan.contains("Bucketed: true"),
      s"substrate scan is not bucketed:\n$scanPlan")
    // hash(src) from the bucketed layout satisfies the degree
    // aggregate's distribution: partial+final collapse to ONE
    // exchange-free aggregate over the scan (the Pregel
    // pre-partitioning requirement, from disk)
    val degPlan = e1.groupBy("src")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
      .queryExecution.executedPlan.toString
    assert(!degPlan.contains("Exchange"),
      s"degree aggregate over the substrate plans an Exchange:\n$degPlan")
    // releasing caches must NOT force a lineitem re-derive: the second
    // read still resolves to the same bucketed table scan
    Caches.releaseAll()
    val e2 = GraphOps.coEdgesEnc(spark, TestSpark.sf0001)
    val p2 = e2.queryExecution.executedPlan.toString
    assert(p2.contains("Bucketed: true") && !p2.contains("lineitem"),
      s"post-release substrate read re-derives from lineitem:\n$p2")
    // and the substrate's content equals the direct string derivation
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select(col("l_suppkey"), col("l_partkey")).distinct()
    val want = li.collect().flatMap { r =>
      val (s, p) = ("s" + r.get(0), "p" + r.get(1))
      Seq((s, p), (p, s))
    }.toSet
    val got = e2.select(GraphOps.lpDecode(col("src")),
        GraphOps.lpDecode(col("dst")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want, "substrate edge set differs from direct derivation")
    Caches.releaseAll()
  }
}
