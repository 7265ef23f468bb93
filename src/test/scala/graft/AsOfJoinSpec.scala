package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, SkewUtils}

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asof join picks the latest right row at-or-before each left row") {
    val left = Seq((1L, ts(10), 100L), (1L, ts(20), 101L), (2L, ts(5), 102L))
      .toDF("k", "ts", "id")
    val right = Seq((1L, ts(10), 1L), (1L, ts(15), 2L), (2L, ts(6), 3L))
      .toDF("k", "ts", "id")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "id", "id")
      .orderBy("id").collect()
    // left id=100 at ts10: right ts10 matches (<=); id=101 at ts20 → ts15
    // id=102 at ts5: no right row yet → null
    assert(out.map(r => Option(r.getAs[Any]("asof_id"))).toSeq ==
      Seq(Some(1L), Some(2L), None))
  }

  test("asof join carries a payload column distinct from the tie column") {
    val left = Seq((1L, ts(10), 100L), (1L, ts(20), 101L), (2L, ts(5), 102L))
      .toDF("k", "ts", "id")
    val right = Seq((1L, ts(10), 1L, "a"), (1L, ts(15), 2L, "b"), (2L, ts(6), 3L, "c"))
      .toDF("k", "ts", "id", "tag")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "id", "tag")
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[String]("asof_tag"))).toSeq ==
      Seq(Some("a"), Some("b"), None))
  }

  test("salted join rejects right/full outer (small side is replicated)") {
    val df = Seq((1L, "x")).toDF("k", "v")
    for (jt <- Seq("right_outer", "full_outer", "right", "full"))
      assertThrows[IllegalArgumentException](
        SkewUtils.saltedJoin(df, df.select(col("k"), col("v").as("w")), "k",
          salts = 3, joinType = jt))
  }

  test("q_join_asof: every prev purchase is truly at-or-before, same user") {
    val out = AsOfJoin.q_join_asof(spark, dir)
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val joined = out
      .join(ev.select(col("event_id"), col("user_id").as("eu"), col("ts").as("ets")),
        "event_id")
      .filter(col("prev_purchase_id") =!= -1L)
      .join(ev.select(col("event_id").as("prev_purchase_id"),
        col("user_id").as("pu"), col("ts").as("pts"), col("event_type").as("pt")),
        "prev_purchase_id")
    assert(joined.filter(col("pt") =!= "purchase").count() == 0)
    assert(joined.filter(col("pu") =!= col("eu")).count() == 0)
    assert(joined.filter(col("pts") > col("ets")).count() == 0)
    assert(out.count() ==
      ev.filter(col("event_type") === "error").count())
  }

  test("salted join equals plain join (inner and left)") {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    for (jt <- Seq("inner", "left")) {
      val plain = li.join(o, Seq("k"), jt)
        .orderBy("k", "l_quantity", "o_totalprice").collect().toSeq
      val salted = SkewUtils.saltedJoin(li, o, "k", salts = 7, joinType = jt)
        .select("k", "l_quantity", "o_totalprice")
        .orderBy("k", "l_quantity", "o_totalprice").collect().toSeq
      assert(plain.map(_.toString) == salted.map(_.toString), s"join type $jt")
    }
  }

  test("native AsOfJoinExec reproduces the composition form exactly " +
    "and plans ONE exchange+sort per side feeding the custom operator") {
    val native = AsOfJoin.q_join_asof_native(spark, dir)
    val composed = AsOfJoin.q_join_asof(spark, dir)
    val a = native.collect().map(_.toString).toSeq
    val b = composed.collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b,
      s"native (${a.length} rows) diverges from composition (${b.length})")
    val phys = native.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), s"custom exec not planned:\n$phys")
    // the native plan replaces the composition's union + running-last
    // machinery wholesale: no window operator, no union, no fallback
    // join may survive (the AQE plan string repeats exchange nodes,
    // so the count itself is not a stable pin — absence is)
    assert(!phys.contains("Window"), "window machinery leaked into the native plan")
    assert(!phys.contains("Union"), "union inflation leaked into the native plan")
    assert(!phys.contains("NestedLoop"), "nested-loop fallback planned")
  }

  test("forward/nearest directions: constructed cases — forward takes " +
    "min (ts,tie) at-or-after, nearest picks the closer side with " +
    "ties to backward") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Long, Long)], tpe: String) =
      rows.toDF("user_id", "t", "event_id")
        .select(col("user_id"), col("t").cast("timestamp").as("ts"),
          col("event_id"), org.apache.spark.sql.functions.lit(tpe).as("event_type"),
          org.apache.spark.sql.functions.lit(0.0).as("value"))
    // errors at t=100 (fwd-only), 250 (equidistant 200/300 → backward),
    // 320 (closer to 300), 500 (back-only)
    val errors = mk(Seq((1L, 100L, 10L), (1L, 250L, 11L),
      (1L, 320L, 12L), (1L, 500L, 13L)), "error")
    val purchases = mk(Seq((1L, 200L, 21L), (1L, 300L, 22L),
      (1L, 300L, 23L)), "purchase")
    val ev = errors.unionByName(purchases)
    val errSel = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val purSel = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val fwd = AsOfJoin.asofJoinForward(errSel, purSel,
        "user_id", "ts", "event_id", payload = "event_id")
      .select("event_id", "asof_event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // forward: min (ts, tie) at-or-after — the equal-ts 300-pair
    // resolves to the LOWER tie (22); errors after every purchase
    // (320, 500) have no forward match
    assert(fwd == Map(10L -> 21L, 11L -> 22L, 12L -> -1L, 13L -> -1L),
      fwd.toString)
    // nearest arithmetic pins: 250 is equidistant to 200 and 300 →
    // the rule says backward (21) wins over forward (22); 320 has
    // only a backward side, whose equal-ts rule takes the MAX tie (23)
    val back = AsOfJoin.asofJoin(errSel, purSel,
        "user_id", "ts", "event_id", payload = "event_id")
      .select("event_id", "asof_event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(back(11L) == 21L && fwd(11L) == 22L) // the equidistant pair
    assert(back(12L) == 23L && fwd(12L) == -1L) // back-only, max tie
  }

  test("native forward/tolerance variants reproduce their composed " +
    "forms exactly on the real fixture and plan the custom exec") {
    val pairs = Seq(
      (AsOfJoin.q_join_asof_fwd_native(spark, dir),
        AsOfJoin.q_join_asof_fwd(spark, dir), "fwd"),
      (AsOfJoin.q_join_asof_tol_native(spark, dir),
        AsOfJoin.q_join_asof_tol(spark, dir), "tol"))
    pairs.foreach { case (native, composed, tag) =>
      val a = native.collect().map(_.toString).toSeq
      val b = composed.collect().map(_.toString).toSeq
      assert(a.nonEmpty && a == b,
        s"$tag: native (${a.length}) diverges from composed (${b.length})")
      val phys = native.queryExecution.executedPlan.toString
      assert(phys.contains("AsOfJoin"), s"$tag: custom exec not planned")
      assert(!phys.contains("Window") && !phys.contains("Union"),
        s"$tag: composition machinery leaked into the native plan")
    }
  }

  test("native forward/tolerance: constructed edge cases — forward " +
    "equal-ts takes MIN tie, stale backward match nulls out under " +
    "tolerance while the in-tolerance one survives") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // fwd: match at 200; back+tol: nothing before
      (1L, 250L, 11L), // fwd: equal-ts rights at 250 → min tie
      (1L, 400L, 12L), // fwd: none after; back+tol: 250 within 100s? no (150 > 100) → null
      (1L, 300L, 13L)  // back+tol: 250 within 100s → match (max tie)
    ).toDF("k", "t", "id").select(col("k"),
      col("t").cast("timestamp").as("t"), col("id"))
    val right = Seq(
      (1L, 200L, 21L), (1L, 250L, 22L), (1L, 250L, 23L)
    ).toDF("k", "t", "id").select(col("k"),
      col("t").cast("timestamp").as("t"), col("id"))
    def run(fwd: Boolean, tol: Option[Long]) = graft.plans.AsOfJoinNative
      .asofJoinNative(left, right, "k", "t", "id", payload = "id",
        forward = fwd, tolMicros = tol)
      .select("id", "asof_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val fwd = run(fwd = true, tol = None)
    assert(fwd == Map(10L -> 21L, 11L -> 22L, 12L -> -1L, 13L -> -1L),
      s"forward: $fwd")
    val tol = run(fwd = false, tol = Some(100L * 1000000L))
    assert(tol == Map(10L -> -1L, 11L -> 23L, 12L -> -1L, 13L -> 23L),
      s"tolerance: $tol")
    // forward + tolerance compose: 100's match at 200 is 100s away
    // (within), 11's equal-ts match is 0s away, nothing else matches
    val ft = run(fwd = true, tol = Some(100L * 1000000L))
    assert(ft == Map(10L -> 21L, 11L -> 22L, 12L -> -1L, 13L -> -1L),
      s"fwd+tol: $ft")
  }

  test("native as-of join: constructed edge cases — no match before, " +
    "exact-ts tie, multiple rights at equal ts (max tie wins)") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // before any right → null
      (1L, 200L, 11L), // exact-ts match (right at 200)
      (1L, 300L, 12L), // picks max-tie of the two rights at 250
      (2L, 500L, 13L)  // key with no rights at all → null
    ).toDF("k", "t", "id").select(col("k"),
      col("t").cast("timestamp").as("t"), col("id"))
    val right = Seq(
      (1L, 200L, 21L), (1L, 250L, 22L), (1L, 250L, 23L)
    ).toDF("k", "t", "id").select(col("k"),
      col("t").cast("timestamp").as("t"), col("id"))
    val out = graft.plans.AsOfJoinNative
      .asofJoinNative(left, right, "k", "t", "id", payload = "id")
      .orderBy("id")
      .select("id", "asof_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq((10L, -1L), (11L, 21L), (12L, 23L), (13L, -1L)))
  }
}
