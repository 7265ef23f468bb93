package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  test("every declared query runs and is non-degenerate at sf0.001") {
    // pair-dedup queries may legitimately be empty on tiny random data
    val mayBeEmpty = Set("q_join_anti", "q_set_except", "q_dedup_minhash",
      "q_dedup_containment",
      "q_dedup_simhash", "q_dedup_embed", "q_dedup_ngram")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("LWW dedup keeps exactly one row per user_id, the max-ts one " +
    "(PUT-by-ID semantics, __main__.py:11-23)") {
    val out = Relational.q_window_dedup_lww(spark, dir)
    val users = out.select("user_id").as[Long].collect()
    assert(users.distinct.length == users.length)
    // winner's ts == max ts of that user
    val ev = Tables(spark, dir, "events")
    val maxTs = ev.groupBy("user_id").agg(max("ts").as("max_ts"))
    val winners = out.join(ev, Seq("user_id", "event_id"))
    val joined = winners.join(maxTs, "user_id")
      .filter($"ts" =!= $"max_ts").count()
    assert(joined == 0, "a non-latest row won LWW")
  }

  test("idempotent re-run: LWW dedup of already-deduped input is identity") {
    val once = Relational.q_window_dedup_lww(spark, dir).collect().toSeq
    // feeding the result through dedup again must be a no-op (the
    // reference's PUT upsert makes re-runs idempotent)
    assert(once.map(_.getLong(0)).distinct.size == once.size)
  }

  test("rollup has per-group rows, subtotals, and grand total") {
    val out = Relational.q_agg_rollup(spark, dir).collect()
    val grand = out.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getLong(2) == Tables(spark, dir, "lineitem").count())
  }

  test("typify guard: event_type column values behave per the e-rule") {
    val out = Relational.q_typify_cast(spark, dir)
      .select("guard_pass").as[Boolean].collect()
    assert(out.contains(true) || out.contains(false)) // column materializes
    // 'signup' has no e/inf/nan → passes; 'error'/'purchase' contain 'e'
    val byType = Tables(spark, dir, "events").select("event_type").distinct()
      .as[String].collect()
    byType.foreach { t =>
      val expected = !(t.contains("e") || t.contains("inf") || t.contains("nan"))
      val got = Seq(t).toDF("x")
        .select(graft.functions.Scalars.numifiable($"x")).as[Boolean].head()
      assert(got == expected, s"guard mismatch for '$t'")
    }
  }

  test("time bucket truncates to the hour") {
    Relational.q_time_bucket(spark, dir).select("bucket").as[Timestamp]
      .collect().foreach { ts =>
        assert(ts.toInstant.getEpochSecond % 3600 == 0)
      }
  }

  test("topk is the global top by price") {
    val out = Relational.q_topk_desc(spark, dir).collect()
    assert(out.length == 100)
    val globalMax = Tables(spark, dir, "orders")
      .agg(max("o_totalprice")).as[Double].head()
    assert(out.head.getDouble(1) == globalMax)
  }

  test("approx quantiles track the exact ones within sketch tolerance") {
    def byFlag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(Relational.q_agg_quantile(spark, dir))
    val approx = byFlag(Relational.q_agg_quantile_approx(spark, dir))
    assert(approx.keySet == exact.keySet)
    for ((flag, ex) <- exact; (e, a) <- ex.zip(approx(flag)))
      assert(math.abs(e - a) / e < 0.05,
        s"$flag: approx $a vs exact $e drifts > 5%")
  }

  test("q_window_percent: pr/cd in [0,1], cd reaches 1 per segment, " +
    "lag/lead are true neighbors in the window order") {
    val rows = Relational.q_window_percent(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4),
        Option(r.get(5)).map(_.asInstanceOf[Double]),
        Option(r.get(6)).map(_.asInstanceOf[Double])))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, pr, cd, _, _) =>
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
    }
    rows.groupBy(_._2).foreach { case (seg, g) =>
      assert(g.map(_._5).max == 1.0, s"$seg: max cume_dist must be 1")
      // walk the window order: each row's prev_bal is its
      // predecessor's balance, first row has none
      val ordered = g.sortBy(r => (r._3, r._1))
      assert(ordered.head._6.isEmpty && ordered.last._7.isEmpty)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._6.contains(a._3) && a._7.contains(b._3))
        case _ =>
      }
    }
  }

  test("q_sample_weighted: biased toward heavy docs, keys valid, " +
    "planned as distributed top-k") {
    val out = Relational.q_sample_weighted(spark, dir).collect()
    assert(out.length == Relational.weightedSampleK)
    // ES keys are ln(u)/w with u in (0,1] => always <= 0
    out.foreach(r => assert(r.getDouble(3) <= 0.0))
    // weight = n_chars: the weighted sample must overrepresent long
    // docs relative to the corpus mean (deterministic fixture, so
    // this is a fixed fact, not a flaky statistical test)
    val corpusAvg = Tables(spark, dir, "documents")
      .agg(avg($"n_chars")).as[Double].head()
    val sampleAvg = out.map(_.getLong(2)).sum.toDouble / out.length
    assert(sampleAvg > corpusAvg,
      s"weighted sample avg $sampleAvg not above corpus avg $corpusAvg")
    val plan = Relational.q_sample_weighted(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1000))
  }

  test("q_rolling_time: trailing-hour frame equals the brute-force " +
    "self-join definition") {
    val got = Relational.q_rolling_time(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(got.nonEmpty)
    // brute force: for every event, count/sum over same-type events
    // within the trailing 3600 epoch-seconds (inclusive)
    val ev = Tables(spark, dir, "events")
      .select($"event_id", $"event_type", $"ts".cast("long").as("sec"),
        $"value")
      .as[(Long, String, Long, Double)].collect()
    val byType = ev.groupBy(_._2)
    val expect = ev.map { case (id, tpe, sec, _) =>
      val frame = byType(tpe).filter(e => e._3 >= sec - 3600 && e._3 <= sec)
      (id, frame.length.toLong,
        BigDecimal(frame.map(_._4).sum).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    got.zip(expect).foreach { case ((gi, gn, gs), (ei, en, es)) =>
      assert(gi == ei && gn == en, s"event $gi: count $gn vs $en")
      assert(math.abs(gs - es) < 1e-6, s"event $gi: sum $gs vs $es")
    }
  }

  test("q_agg_argminmax: chosen rows attain the group extremes, and " +
    "ties break deterministically by event_id") {
    val ev = Tables(spark, dir, "events")
    val exts = ev.groupBy("event_type")
      .agg(max("value").as("mx"), min("value").as("mn"))
    // the emitted event_ids really attain the group extremes
    val out = Relational.q_agg_argminmax(spark, dir)
    val bad = out.join(ev.select($"event_id".as("max_event"),
        $"value".as("got_max")), "max_event")
      .join(exts, out("event_type") === exts("event_type"))
      .filter(round($"got_max", 4) =!= round($"mx", 4)).count()
    assert(bad == 0, "struct-max picked a row not attaining the max")
    // tie robustness (the round-5 scale compare caught the old max_by
    // diverging between engines on a fully-tied fixture): lexicographic
    // (value, id) extrema pick the LARGEST tied id on the max side and
    // the SMALLEST on the min side
    val tied = Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 1.0), ("a", 4L, 1.0),
      ("b", 9L, 2.0), ("b", 8L, 2.0))
      .toDF("event_type", "event_id", "value")
    val got = tied.groupBy("event_type")
      .agg(max(struct($"value", $"event_id")).getField("event_id").as("mx"),
        min(struct($"value", $"event_id")).getField("event_id").as("mn"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 2L, 3L), ("b", 9L, 8L)),
      s"tie-break not deterministic: ${got.toSeq}")
  }

  test("q_agg_corr: corr in [-1,1]; slope/covar consistent with " +
    "corr via the variance ratio") {
    val out = Relational.q_agg_corr(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val corr = r.getDouble(2)
      assert(corr >= -1.0 && corr <= 1.0, s"corr $corr out of range")
      // slope = corr * sy/sx ⇒ sign(slope) == sign(corr)
      assert(r.getDouble(4).sign == corr.sign || corr == 0.0)
    }
  }

  test("q_linreg: R² in [0,1]; forecast consistent with the fitted " +
    "line's sign of drift") {
    val out = Relational.q_linreg(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2 out of range")
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
    }
  }

  test("q_basket: rules are well-formed — ordered pairs, " +
    "support ≤ confidence ≤ 1, positive lift") {
    val out = Relational.q_basket(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not ordered b1 < b2")
      val (sup, conf, lift) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(sup > 0.0 && sup <= conf + 1e-9,
        s"support $sup vs confidence $conf")
      assert(conf <= 1.0 && lift > 0.0)
    }
  }

  test("q_concentration: Gini in [0,1), HHI in [1/n, 1], top-decile " +
    "share within (0, 1]") {
    val out = Relational.q_concentration(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(1).toDouble
      val (gini, hhi, top) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(gini >= 0.0 && gini < 1.0, s"gini $gini")
      // Σ share² is minimized at equal shares (1/n) and capped at 1
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-9, s"hhi $hhi n=$n")
      assert(top > 0.0 && top <= 1.0 + 1e-9, s"top share $top")
      // the top decile can never hold less than its population share
      assert(top >= math.floor((n + 9) / 10) / n - 1e-6)
    }
  }

  test("q_benford: probabilities are a distribution and the " +
    "expectation column IS Benford's law") {
    val out = Relational.q_benford(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet == (1 to 9).map(_.toString).toSet)
    val obsSum = out.map(_.getDouble(2)).sum
    assert(math.abs(obsSum - 1.0) < 1e-3, s"obs_p sums to $obsSum")
    out.foreach { r =>
      val d = r.getString(0).toInt
      val expect = math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getDouble(3) - expect) < 5e-7)
      assert(r.getDouble(4) >= 0.0) // χ² contribution nonnegative
    }
  }

  test("q_skyline: output is exactly the non-dominated set") {
    val out = Relational.q_skyline(spark, dir)
      .select("p_retailprice", "p_size").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.nonEmpty)
    // no output point dominated by another output point
    for (a <- out; b <- out if a != b)
      assert(!(b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)),
        s"$a dominated by $b inside the frontier")
    // completeness: no INPUT point dominates an output point
    val all = Tables(spark, dir, "part")
      .select("p_retailprice", "p_size").collect()
      .map(r => (r.getDouble(0), r.getInt(1).toLong))
    for (a <- out; b <- all)
      assert(!(b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)),
        s"frontier point $a dominated by input $b")
  }

  test("q_weighted_median equals the brute-force lower weighted median") {
    val weights = Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("w"))
    val rows = Tables(spark, dir, "orders")
      .join(weights, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderpriority", $"o_totalprice", $"w")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (prio, rs) =>
      val sorted = rs.sortBy(_._2)
      val total = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { r => cum += r._3; cum * 2 >= total }.get._2
      prio -> (math.rint(med * 100) / 100)
    }
    val got = Relational.q_weighted_median(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got == expect)
  }

  test("q_streak: island accounting is internally consistent") {
    Relational.q_streak(spark, dir).collect().foreach { r =>
      val (active, streaks, longest) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(streaks >= 1 && longest >= 1)
      assert(longest <= active)
      // every non-longest island holds ≥ 1 hour
      assert(active >= longest + (streaks - 1))
    }
  }

  test("q_cdc_merge: op partition covers every user exactly once") {
    val out = Relational.q_cdc_merge(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val allowed = Set("carry", "delete", "insert", "update")
    assert(out.map(_._1).forall(allowed))
    val users = Tables(spark, dir, "events")
      .select("user_id").distinct().as[Long].collect()
    assert(out.map(_._2).sum == users.length.toLong)
    assert(out.map(_._3).sum == users.sum)
  }

  test("q_forecast_eval: rmse ≥ mae ≥ |bias| and the spine gives " +
    "every series an evaluation window") {
    val out = Relational.q_forecast_eval(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mae, rmse, bias) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n > 0)
      assert(rmse >= mae - 1e-9, s"rmse $rmse < mae $mae")
      assert(mae >= math.abs(bias) - 1e-9, s"mae $mae < |bias| $bias")
    }
  }

  test("q_rfm: quartile cells partition the ordering customers and " +
    "every quartile index is in 1..4") {
    val out = Relational.q_rfm(spark, dir).collect()
    val nOrdering = Tables(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(out.map(_.getLong(4)).sum == nOrdering,
      "RFM cells must partition the customer base")
    out.foreach { r =>
      Seq(1, 2, 3).foreach(i => assert(r.getLong(i) >= 1 && r.getLong(i) <= 4))
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("q_growth: hand-recomputed MoM for one month matches") {
    val out = Relational.q_growth(spark, dir).collect()
    assert(out.length > 12)
    // row 0 has no prior month → null growth
    assert(out.head.isNullAt(3) && out.head.isNullAt(4))
    val r1 = out(1)
    val expect = (r1.getDouble(2) - out.head.getDouble(2)) /
      out.head.getDouble(2) * 100
    assert(math.abs(r1.getDouble(3) - expect) < 1e-3,
      s"mom ${r1.getDouble(3)} vs $expect")
    // 13th month onward has a yoy value
    assert(!out(12).isNullAt(4))
  }

  test("q_paths: trigram counts total Σ max(0, n_events − 2) when all " +
    "paths fit in the top-k") {
    val out = Relational.q_paths(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach(r => assert(r.getString(0).split(">").length == 3))
    // counts are sorted descending
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q_ewma: smooth is a weighted mean of the 8-hour tail — bounded " +
    "by the series max and exact on a constant window") {
    val out = Relational.q_ewma(spark, dir).collect()
    assert(out.nonEmpty)
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      val mx = rows.map(_.getLong(2)).max
      rows.foreach { r =>
        val s = r.getDouble(3)
        assert(s >= 0.0 && s <= mx + 1e-9, s"smooth $s outside [0, $mx]")
      }
    }
  }

  test("q_corr_matrix: six pairs in [-1,1], agreeing with Spark's " +
    "built-in corr on the quantity~extendedprice pair") {
    val out = Relational.q_corr_matrix(spark, dir).collect()
    assert(out.length == 6)
    out.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
    val qp = out.find(_.getString(0) == "quantity~extendedprice").get
      .getDouble(1)
    val builtin = Tables(spark, dir, "lineitem")
      .agg(corr(col("l_quantity"), col("l_extendedprice")))
      .head().getDouble(0)
    assert(math.abs(qp - builtin) < 1e-3, s"$qp vs builtin $builtin")
  }

  test("q_decile_bands: bands partition each priority's orders with " +
    "near-equal population and monotone value ranges") {
    val out = Relational.q_decile_bands(spark, dir).collect()
    val byP = out.groupBy(_.getString(0))
    val orders = Tables(spark, dir, "orders")
    byP.foreach { case (p, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
      val ns = rows.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$p band sizes differ by >1")
      assert(ns.sum == orders.filter(col("o_orderpriority") === p).count())
      val sorted = rows.sortBy(_.getLong(1))
      sorted.foreach(r => assert(r.getDouble(3) <= r.getDouble(4) + 1e-9))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getDouble(4) <= b.getDouble(3) + 1e-9,
          s"$p bands overlap in value space")
      }
    }
  }

  test("q_window_nav: journey cells partition users; 'none' second " +
    "events are exactly the single-event users") {
    val out = Relational.q_window_nav(spark, dir).collect()
    val ev = Tables(spark, dir, "events")
    assert(out.map(_.getLong(3)).sum ==
      ev.select("user_id").distinct().count())
    val noneUsers = out.filter(_.getString(1) == "none")
      .map(_.getLong(3)).sum
    val singleEvent = ev.groupBy("user_id").count()
      .filter(col("count") === 1).count()
    assert(noneUsers == singleEvent)
    out.foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("q_sliding_uniques: each window count equals a brute-force " +
    "recount of the trailing 6 hours") {
    val out = Relational.q_sliding_uniques(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.nonEmpty)
    val act = Tables(spark, dir, "events")
      .select(col("user_id"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("eh"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byHour = act.groupBy(_._2)
    // recount three sample windows
    out.keys.toSeq.sorted.take(3).foreach { w =>
      val expect = act.filter { case (_, eh) =>
        eh <= w && eh > w - Relational.slidingHours
      }.map(_._1).distinct.length
      assert(out(w) == expect.toLong, s"window $w")
    }
    assert(byHour.keySet == out.keySet,
      "every observed activity hour must end a window")
  }

  test("q_funnel_time: conversions bounded by viewers, delays " +
    "non-negative, viewer count matches the view population") {
    val r = Relational.q_funnel_time(spark, dir).collect().head
    val (nv, nc) = (r.getLong(0), r.getLong(1))
    assert(nc <= nv)
    val viewers = Tables(spark, dir, "events")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(nv == viewers)
    if (nc > 0) {
      assert(r.getDouble(2) >= 0.0)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("q_cohort_ltv: cohort sizes match q_retention's offset-0 rows, " +
    "cumulatives are nondecreasing, and total revenue reconciles") {
    val out = Relational.q_cohort_ltv(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    // a user is active in their own first-event week, so retention's
    // offset-0 n_users IS the cohort size
    val cohortSizes = Relational.q_retention(spark, dir).collect()
      .filter(_.getLong(1) == 0L)
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    out.foreach { case (cw, _, n, _, _, _) =>
      assert(cohortSizes(cw) == n, s"cohort $cw size mismatch")
    }
    out.groupBy(_._1).foreach { case (cw, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._5 >= a._5, s"cohort $cw cum_rev decreased")
        case _ =>
      }
      sorted.foreach { r =>
        assert(math.abs(r._6 - BigDecimal(r._5 / r._3)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"cohort $cw ltv != round(cum/n)")
      }
      // the last cumulative is the sum of the weekly revenues
      assert(math.abs(sorted.last._5 - sorted.map(_._4).sum) < 1e-6)
    }
    // grand total equals the corpus purchase revenue (2-decimal exact)
    val total = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)")))
      .collect().head.getDecimal(0).doubleValue()
    assert(math.abs(out.map(_._4).sum - total) < 1e-6)
  }

  test("q_seasonality: cells cover every event exactly once, shares " +
    "sum to 1, dow is Monday-based and agrees with date_format") {
    val out = Relational.q_seasonality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty && out.length <= 168)
    assert(out.forall(c => c._1 >= 0 && c._1 <= 6))
    assert(out.forall(c => c._2 >= 0 && c._2 <= 23))
    assert(out.forall(_._5 >= 0.0), "a chi-square term is negative")
    val nEvents = Tables(spark, dir, "events").count()
    assert(out.map(_._3).sum == nEvents, "cells do not partition events")
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-3, "shares don't sum to 1")
    // Monday-based dow: weekday() must agree with the locale-free
    // E-pattern day name for every event
    val mismatch = Tables(spark, dir, "events")
      .select(weekday(col("ts")).as("w"), date_format(col("ts"), "E").as("d"))
      .filter(!(col("w") === 0 && col("d") === "Mon") &&
        !(col("w") === 1 && col("d") === "Tue") &&
        !(col("w") === 2 && col("d") === "Wed") &&
        !(col("w") === 3 && col("d") === "Thu") &&
        !(col("w") === 4 && col("d") === "Fri") &&
        !(col("w") === 5 && col("d") === "Sat") &&
        !(col("w") === 6 && col("d") === "Sun"))
      .count()
    assert(mismatch == 0, "weekday() disagrees with date_format E")
  }

  test("q_calibration: bins partition the orders, mean prediction " +
    "sits inside each bin's declared score range, rates in [0,1]") {
    val rows = Relational.q_calibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    rows.foreach { case (bin, n, meanP, posRate) =>
      assert(bin >= 0 && bin <= 9)
      assert(n > 0)
      // bin b holds scores in [b/10, (b+1)/10) — except 9, closed at 1
      val hi = if (bin == 9) 1.0 + 1e-9 else (bin + 1) / 10.0 + 1e-9
      assert(meanP >= bin / 10.0 - 1e-9 && meanP <= hi,
        s"bin $bin mean_p $meanP outside its score range")
      assert(posRate >= 0.0 && posRate <= 1.0)
    }
    val total = Tables(spark, dir, "orders").count()
    assert(rows.map(_._2).sum == total, "bins do not partition orders")
  }
}
