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
}
