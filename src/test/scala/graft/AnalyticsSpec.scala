package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Property / brute-force re-derivation specs for the round-5
  * analytics + ML-feature batch (q_acf, q_psi_drift, q_target_encode,
  * q_join_interval, q_snapshot_diff). Each query also carries a full
  * rows+schema+hash DuckDB oracle; these specs pin the SEMANTICS from
  * an independent (driver-side, brute-force) derivation so an
  * oracle-twin bug can't hide a shared misunderstanding.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  test("q_acf: brute-force recompute of one series matches; " +
    "estimator invariants hold for all") {
    val out = Relational.q_acf(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(out.length > 0)
    // invariants: |r_k| <= 1 (Cauchy-Schwarz on the full-mean
    // estimator can exceed 1 marginally on short series — allow 1+2/n)
    out.foreach { case (_, k, np, r) =>
      assert(k >= 1 && k <= Relational.acfMaxLag)
      assert(math.abs(r) <= 1.5, s"acf $r out of plausible range")
      assert(np >= 1)
    }
    // brute force one series end-to-end
    val typ = out.head._1
    val hourly = Tables(spark, dir, "events")
      .filter($"event_type" === typ)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("h")
      .as[(java.sql.Timestamp, Long)].collect()
    val t0 = hourly.head._1.getTime
    val tn = hourly.last._1.getTime
    val n = ((tn - t0) / 3600000L).toInt + 1
    val xs = Array.fill(n)(0L)
    hourly.foreach { case (h, c) => xs(((h.getTime - t0) / 3600000L).toInt) = c }
    val s = xs.sum.toDouble
    val mean = s / n
    val den = xs.map(x => (x - mean) * (x - mean)).sum
    (1 to Relational.acfMaxLag).foreach { k =>
      val num = (0 until n - k).map(t => (xs(t) - mean) * (xs(t + k) - mean)).sum
      val expected = num / den
      val got = out.find(r => r._1 == typ && r._2 == k).get._4
      assert(math.abs(got - expected) < 1e-5,
        s"lag $k: got $got expected $expected")
      assert(out.find(r => r._1 == typ && r._2 == k).get._3 == n - k)
    }
  }

  test("q_psi_drift: contributions are non-negative by construction, " +
    "counts reconcile with the corpus, flag matches the bound") {
    val out = Relational.q_psi_drift(spark, dir)
      .as[(String, Long, Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    // each PSI term (p-q)·ln(p/q) >= 0 (same sign), so the sum is too
    out.foreach { case (_, nr, nc, nb, psi, drifted) =>
      assert(psi >= -1e-9, s"psi $psi negative")
      assert(nb >= 1)
      assert(drifted == (if (psi > 0.2) 1L else 0L))
      assert(nr + nc > 0)
    }
    // per-type counts reconcile: n_ref + n_cur = corpus rows of type
    val totals = Tables(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    out.foreach { case (typ, nr, nc, _, _, _) =>
      assert(nr + nc == totals(typ), s"$typ: $nr+$nc != ${totals(typ)}")
    }
  }

  test("q_target_encode: per-user mean of LOO encodings recovers the " +
    "user mean; smoothing shrinks toward the global mean") {
    val enc = Relational.q_target_encode(spark, dir)
      .as[(Long, Long, Option[Double], Double)].collect()
    val ev = Tables(spark, dir, "events")
      .select($"event_id", $"user_id", $"value")
      .as[(Long, Long, Double)].collect()
    val byUser = ev.groupBy(_._2)
    val gMean = ev.map(_._3).sum / ev.length
    val encByEvent = enc.map(e => e._1 -> e).toMap
    byUser.foreach { case (u, rows) =>
      val uMean = rows.map(_._3).sum / rows.length
      if (rows.length > 1) {
        // mean of LOO values equals the user mean (algebraic identity:
        // Σ(S−x_i)/(n−1) = (nS−S)/(n−1) = S), up to 4-dp rounding
        val looMean = rows.map(r => encByEvent(r._1)._3.get).sum / rows.length
        assert(math.abs(looMean - uMean) < 1e-3,
          s"user $u: LOO mean $looMean vs $uMean")
      } else {
        assert(encByEvent(rows.head._1)._3.isEmpty, "n=1 must yield NULL LOO")
      }
      // smoothed encoding lies strictly between user and global mean
      val sm = encByEvent(rows.head._1)._4
      val (lo, hi) = (math.min(uMean, gMean), math.max(uMean, gMean))
      assert(sm >= lo - 1e-3 && sm <= hi + 1e-3,
        s"user $u: smooth $sm outside [$lo, $hi]")
    }
  }

  test("q_join_interval: session set matches q_sessionize; hot-hour " +
    "overlap counts match a brute-force interval intersection") {
    val out = Relational.q_join_interval(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])].collect()
    // session frame must agree with the declared sessionizer
    val sess = Relational.q_sessionize(spark, dir)
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect()
    assert(out.length == sess.length, "one output row per session")
    val sessKey = sess.map(s =>
      (s._1, s._2) -> (s._3.getTime / 1000, s._4.getTime / 1000, s._5)).toMap
    out.foreach { case (u, sid, st, en, ne, _, _) =>
      val (es, ee, eN) = sessKey((u, sid))
      assert(st == es && en == ee && ne == eN, s"session ($u,$sid) frame")
    }
    // brute-force hot hours
    val evs = Tables(spark, dir, "events")
      .select($"ts".cast("long")).as[Long].collect()
    val hourCounts = evs.groupBy(e => e - e % 3600).view.mapValues(_.size).toMap
    val totalCnt = hourCounts.values.sum.toLong
    val nHours = hourCounts.size.toLong
    val hot = hourCounts.filter { case (_, c) =>
      c.toLong * nHours > Relational.hotHourFactor * totalCnt
    }.keySet
    out.foreach { case (u, sid, st, en, _, nHot, firstHot) =>
      val hours = (st / 3600 to en / 3600).map(_ * 3600)
      val overlap = hours.filter(hot.contains)
      assert(nHot == overlap.size.toLong, s"($u,$sid) hot count")
      assert(firstHot == overlap.sorted.headOption, s"($u,$sid) first hot")
    }
  }

  test("q_time_rollup: every grain reconciles to the same corpus " +
    "totals; buckets are unique within a grain") {
    val out = Relational.q_time_rollup(spark, dir)
      .as[(String, Option[java.sql.Timestamp], Long, Double)].collect()
    val n = Tables(spark, dir, "events").count()
    val grains = out.groupBy(_._1)
    assert(grains.keySet == Set("hour", "day", "week", "total"))
    Seq("hour", "day", "week").foreach { g =>
      assert(grains(g).map(_._3).sum == n, s"$g counts don't reconcile")
      val buckets = grains(g).map(_._2)
      assert(buckets.forall(_.nonEmpty), s"$g has a null bucket")
      assert(buckets.distinct.length == buckets.length, s"$g dup bucket")
    }
    assert(grains("total").length == 1 && grains("total").head._3 == n)
    assert(grains("total").head._2.isEmpty)
    // value sums reconcile across grains (to display rounding)
    val hourSum = grains("hour").map(_._4).sum
    val totalSum = grains("total").head._4
    assert(math.abs(hourSum - totalSum) < 0.01 * grains("hour").length)
    // hierarchy sizes: hours >= days >= weeks >= 1
    assert(grains("hour").length >= grains("day").length)
    assert(grains("day").length >= grains("week").length)
  }

  test("q_lag_features: brute-force per-user re-derivation matches") {
    val out = Relational.q_lag_features(spark, dir)
      .as[(Long, Long, Option[Double], Long, Option[Double], Option[Long])]
      .collect()
    val ev = Tables(spark, dir, "events")
      .select($"event_id", $"user_id", $"ts".cast("long"), $"value",
        $"ts")
      .as[(Long, Long, Long, Double, java.sql.Timestamp)].collect()
    val byEvent = out.map(o => o._1 -> o).toMap
    assert(out.length == ev.length)
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._5.getTime, r._1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val (prevV, t3n, t3m, gap) = {
          if (i == 0) (None, 0L, None, None)
          else {
            val window = sorted.slice(math.max(0, i - 3), i).map(_._4)
            (Some(sorted(i - 1)._4),
              window.length.toLong,
              Some(window.sum / window.length),
              Some(r._3 - sorted(i - 1)._3))
          }
        }
        val got = byEvent(r._1)
        assert(got._4 == t3n, s"event ${r._1} trail3_n")
        (got._3, prevV) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6)
          case (None, None) =>
          case other => fail(s"event ${r._1} prev_value $other")
        }
        (got._5, t3m) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-3)
          case (None, None) =>
          case other => fail(s"event ${r._1} trail3_mean $other")
        }
        assert(got._6 == gap, s"event ${r._1} gap")
      }
    }
  }

  test("q_cume_users: cumulative curve reconciles with distinct users " +
    "and is strictly increasing") {
    val out = Relational.q_cume_users(spark, dir)
      .as[(java.sql.Timestamp, Long, Long)].collect()
    assert(out.nonEmpty)
    val totalUsers = Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.last._3 == totalUsers)
    assert(out.map(_._2).sum == totalUsers)
    out.zip(out.tail).foreach { case (a, b) =>
      assert(b._3 == a._3 + b._2, "cume must accumulate new_users")
      assert(a._1.before(b._1))
    }
  }

  test("q_gini: matches a brute-force recompute and sits in [0, 1)") {
    val out = Relational.q_gini(spark, dir)
      .as[(Long, Double, Double)].collect()
    assert(out.length == 1)
    val (n, _, gini) = out.head
    assert(gini >= 0.0 && gini < 1.0)
    val spends = Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double").as("s"))
      .as[(Long, Double)].collect()
    assert(n == spends.length)
    val cents = spends.sortBy(p => (p._2, p._1))
      .map(p => math.round(p._2 * 100))
    val nn = cents.length.toLong
    val total = cents.sum
    val num = cents.zipWithIndex
      .map { case (x, i0) => (2L * (i0 + 1) - nn - 1) * x }.sum
    val expected = num.toDouble / (nn * total).toDouble
    assert(math.abs(gini - expected) < 1e-6,
      s"gini $gini vs brute $expected")
  }

  test("q_survival: constructed sparse cohort matches hand-computed " +
    "Kaplan-Meier; fixture curve is monotone with reconciling counts") {
    // 6 users over weeks 0..3 (week epoch = k*604800):
    //   u1 weeks 0..3  -> censored at off 3 (last == end)
    //   u2 weeks 0..1  -> event at off 2
    //   u3 week 0 only -> event at off 1
    //   u4 weeks 1..3  -> censored at off 2
    //   u5 weeks 1..2  -> event at off 2
    //   u6 week 3 only -> censored at off 0
    val wk = 604800L
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 0L), (2L, 1L),
      (3L, 0L),
      (4L, 1L), (4L, 3L),
      (5L, 1L), (5L, 2L),
      (6L, 3L))
      .map { case (u, k) => (u, k * wk) }
      .toDF("user_id", "w")
    val out = Relational.survivalOf(ev)
      .as[(Long, Long, Long, Long, Double)].collect()
    // ends: off0: u6 censored; off1: u3 event; off2: u2,u5 events +
    // u4 censored; off3: u1 censored
    // risk sets (ending >= off): n0=6, n1=5, n2=4, n3=1
    // S(0)=1; S(1)=1*(1-1/5)=0.8; S(2)=0.8*(1-2/4)=0.4; S(3)=0.4
    val expected = Seq(
      (0L, 6L, 0L, 1L, 1.0),
      (1L, 5L, 1L, 0L, 0.8),
      (2L, 4L, 2L, 1L, 0.4),
      (3L, 1L, 0L, 1L, 0.4))
    assert(out.toSeq.map(r => (r._1, r._2, r._3, r._4,
      math.round(r._5 * 10000) / 10000.0)) == expected)
    // fixture invariants
    val fix = Relational.q_survival(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(fix.nonEmpty)
    val users = Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(fix.map(r => r._3 + r._4).sum == users,
      "every user ends exactly once (event or censor)")
    val survs = fix.map(_._5)
    survs.zip(survs.tail).foreach { case (a, b) => assert(b <= a + 1e-9) }
    assert(fix.head._2 == users, "offset-0 risk set is everyone")
  }

  test("q_ks_drift: brute-force KS statistic matches for every type; " +
    "significance flag agrees with the exact critical compare") {
    val out = Relational.q_ks_drift(spark, dir)
      .as[(String, Long, Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    val raws = Tables(spark, dir, "events")
      .select($"event_type", $"ts".cast("long"), $"value")
      .as[(String, Long, Double)].collect()
    val (mn, mx) = (raws.map(_._2).min, raws.map(_._2).max)
    out.foreach { case (typ, n1, n2, dnum, d, sig) =>
      val rows = raws.filter(_._1 == typ)
      val ref = rows.filter(r => r._2 * 2 <= mn + mx).map(_._3).sorted
      val cur = rows.filter(r => r._2 * 2 > mn + mx).map(_._3).sorted
      assert(n1 == ref.length && n2 == cur.length)
      val values = (ref ++ cur).distinct.sorted
      val bruteDnum = values.map { v =>
        math.abs(ref.count(_ <= v).toLong * n2 - cur.count(_ <= v).toLong * n1)
      }.max
      assert(dnum == bruteDnum, s"$typ d_num $dnum vs $bruteDnum")
      // d is the 6-dp display rounding of the exact ratio
      assert(math.abs(d - dnum.toDouble / (n1 * n2)) < 5.01e-7)
      val critHolds = BigInt(dnum) * BigInt(dnum) * 1000000 >
        BigInt(1844164) * (n1 + n2) * n1 * n2
      assert(sig == (if (critHolds) 1L else 0L))
    }
  }

  test("q_jackknife: SE matches a driver-side delete-group recompute " +
    "and the mean matches the plain mean") {
    val out = Relational.q_jackknife(spark, dir)
      .as[(String, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    val raws = Tables(spark, dir, "events")
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jk:$id".getBytes("UTF-8"))
      val hex = h.map("%02x".format(_)).mkString
      (Integer.parseInt(hex.substring(0, 2), 16) % 32).toLong
    }
    out.foreach { case (typ, n, mean, se) =>
      val rows = raws.filter(_._2 == typ)
      assert(n == rows.length)
      val cents = rows.map(r => math.round(r._3 * 100))
      val s = cents.sum
      assert(math.abs(mean - s.toDouble / 100 / n) < 1e-3)
      // delete-group recompute with the same integer 1e-6 rounding
      val byB = rows.groupBy(r => bucket(r._1))
      val rs = byB.toSeq.map { case (_, g) =>
        val sb = g.map(r => math.round(r._3 * 100)).sum
        val nb = g.length
        val num = 2L * (s - sb) * 10000 + (n - nb)
        num / (2L * (n - nb))
      }
      val b = rs.length
      val msum = BigInt(rs.sum)
      val msq = rs.map(r => BigInt(r) * BigInt(r)).sum
      val x = BigInt(b - 1) * (BigInt(b) * msq - msum * msum)
      val brute = math.sqrt(x.toDouble) / (b * 1e6)
      assert(math.abs(se - brute) < 1e-5, s"$typ se $se vs $brute")
      assert(se > 0)
    }
  }

  test("q_rolling_median: trailing-24 window median matches a " +
    "brute-force recompute on one series") {
    val out = Relational.q_rolling_median(spark, dir)
      .as[(String, java.sql.Timestamp, Long, Double)].collect()
    assert(out.nonEmpty)
    val typ = out.head._1
    val series = out.filter(_._1 == typ).sortBy(_._2.getTime)
    series.zipWithIndex.foreach { case ((_, _, _, med), i) =>
      val window = series.slice(math.max(0, i - 23), i + 1).map(_._3)
        .sorted
      val n = window.length
      val brute =
        if (n % 2 == 1) window(n / 2).toDouble
        else (window(n / 2 - 1) + window(n / 2)) / 2.0
      assert(math.abs(med - brute) < 1e-9, s"pos $i: $med vs $brute")
    }
  }

  test("q_lorenz: deciles reconcile with the customer universe, the " +
    "curve is convex-monotone ending at 1.0, and it is consistent " +
    "with q_gini's population") {
    val out = Relational.q_lorenz(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq == (1L to 10L))
    val gini = Relational.q_gini(spark, dir)
      .as[(Long, Double, Double)].collect().head
    assert(out.map(_._2).sum == gini._1, "decile populations = customers")
    assert(math.abs(out.map(_._3).sum - gini._2) < 0.1,
      "decile spends sum to total spend")
    assert(out.last._4 == 1.0)
    val shares = out.map(_._4)
    shares.zip(shares.tail).foreach { case (a, b) => assert(b >= a) }
    // ascending sort ⇒ marginal decile spend nondecreasing ⇒ convex
    val spends = out.map(_._3)
    spends.zip(spends.tail).foreach { case (a, b) =>
      assert(b >= a - 0.01, "ascending deciles must not shrink in spend")
    }
  }

  test("q_snapshot_diff: classifications are sound and totals " +
    "reconcile with the raw order stream") {
    val out = Relational.q_snapshot_diff(spark, dir)
      .as[(Long, String, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    val orders = Tables(spark, dir, "orders")
      .select($"o_custkey", $"o_orderdate".cast("long"), $"o_totalprice")
      .as[(Long, Long, Double)].collect()
    def epoch(s: String) =
      java.sql.Timestamp.valueOf(s + " 00:00:00").getTime / 1000
    val (c1, c2) = (epoch(Relational.snapCut1), epoch(Relational.snapCut2))
    out.foreach { case (ck, status, n1, n2, s1, s2) =>
      assert(n1 <= n2 && s1 <= s2 + 1e-6, s"$ck monotone growth")
      status match {
        case "added" => assert(n1 == 0)
        case "changed" => assert(n1 > 0 && (n1 != n2 || math.abs(s1 - s2) > 1e-9))
        case "unchanged" => assert(n1 == n2 && math.abs(s1 - s2) < 1e-9)
        case other => fail(s"unknown status $other")
      }
    }
    // every customer with an order before cut2 appears exactly once
    val expected = orders.filter(_._2 < c2).map(_._1).distinct.sorted
    assert(out.map(_._1).sorted.toSeq == expected.toSeq)
    // n2 total reconciles
    assert(out.map(_._4).sum == orders.count(_._2 < c2).toLong)
  }

  test("q_hll_overlap: every sketch estimate within the rsd envelope " +
    "of the exact intersection; jaccard within [0,1]; pair universe " +
    "complete") {
    val rows = Relational.q_hll_overlap(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))))
    val users = Tables(spark, dir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = users.keySet.toSeq.sorted
    val expectPairs = (for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield (types(i), types(j))).toSet
    assert(rows.map(_._1).toSet == expectPairs, "pair universe incomplete")
    // approx_count_distinct's rsd is a 1-sigma bound; allow 5 sigma
    val tol = 5 * Relational.hllOverlapRsd
    rows.foreach { case ((ta, tb), (na, nb, nu, ni, jac)) =>
      val (sa, sb) = (users(ta), users(tb))
      val exactU = (sa ++ sb).size.toDouble
      val exactI = (sa & sb).size.toDouble
      assert(math.abs(na - sa.size) <= tol * sa.size + 1)
      assert(math.abs(nb - sb.size) <= tol * sb.size + 1)
      assert(math.abs(nu - exactU) <= tol * exactU + 1)
      // intersection error compounds three sketches
      assert(math.abs(ni - exactI) <= 3 * tol * exactU + 1,
        s"($ta,$tb) inter est $ni vs exact $exactI")
      assert(jac >= 0.0 && jac <= 1.0)
    }
  }

  test("q_user_overlap is the exact truth the HLL form calibrates " +
    "against: same pair universe, sketch within envelope of exact") {
    val exact = Relational.q_user_overlap(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val approx = Relational.q_hll_overlap(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(4), r.getLong(5)))).toMap
    assert(exact.keySet == approx.keySet)
    val tol = 5 * Relational.hllOverlapRsd
    exact.foreach { case (k, (u, i)) =>
      val (au, ai) = approx(k)
      assert(math.abs(au - u) <= tol * u + 1, s"$k union $au vs $u")
      assert(math.abs(ai - i) <= 3 * tol * u + 1, s"$k inter $ai vs $i")
    }
  }

  test("q_join_asof_tol: every row equals the untolerance answer, or " +
    "is -1 exactly when that answer is genuinely older than the bound") {
    val tol = graft.operators.AsOfJoin.asofTolSecs * 1000000L
    val plain = graft.operators.AsOfJoin.q_join_asof(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tolled = graft.operators.AsOfJoin.q_join_asof_tol(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain.keySet == tolled.keySet)
    val ev = Tables(spark, dir, "events")
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) ->
        (r.getTimestamp(1).getTime / 1000 * 1000000L +
          r.getTimestamp(1).getNanos / 1000)).toMap
    var dropped = 0
    plain.foreach { case (e, p) =>
      if (p == -1L) assert(tolled(e) == -1L)
      else {
        val gap = ev(e) - ev(p)
        if (gap <= tol) assert(tolled(e) == p, s"error $e kept-match")
        else { assert(tolled(e) == -1L, s"error $e stale-match"); dropped += 1 }
      }
    }
    assert(dropped > 0, "fixture never exercised the tolerance drop")
  }

  test("q_bootstrap: Poisson replicas have ~N effective rows, the " +
    "bootstrap SE agrees with the analytic sigma/sqrt(n), and the " +
    "draw is deterministic") {
    val out = Relational.q_bootstrap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == Relational.bootstrapB)
    assert(out.map(_._1).toSeq == (0L until Relational.bootstrapB).toSeq)
    val xs = Tables(spark, dir, "orders")
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
    val n = xs.length.toDouble
    // Poisson(1) multiplicities: replica size is N +- ~3 sqrt(N)
    out.foreach { case (b, nEff, _) =>
      assert(math.abs(nEff - n) <= 4 * math.sqrt(n),
        s"replica $b n_eff $nEff vs N $n")
    }
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / n)
    val analytic = sd / math.sqrt(n)
    val bm = out.map(_._3)
    val bMean = bm.sum / bm.length
    val bootSe = math.sqrt(bm.map(m => (m - bMean) * (m - bMean)).sum
      / (bm.length - 1))
    assert(bootSe > analytic / 2 && bootSe < analytic * 2,
      s"bootstrap SE $bootSe vs analytic $analytic")
    // replica means straddle the sample mean
    assert(math.abs(bMean - mean) < 4 * analytic)
    // determinism
    val again = Relational.q_bootstrap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("q_bootstrap's single-pass Aggregator form equals the exploded " +
    "generator formulation bit-for-bit (same md5 draws, same exact " +
    "sums) - the 32x row fan-out was pure overhead") {
    val fast = Relational.q_bootstrap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val slow = Relational.bootstrapExploded(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fast == slow)
  }

  /** Exact-fraction pool-adjacent-violators — the classical
    * sequential PAV sweep, an INDEPENDENT formulation of the fit
    * (q_isotonic runs the minimax closed form as bounded joins).
    * Returns the per-bin fitted rate floored to micro-units.
    */
  private def pavRef(bins: Seq[(Long, Long, Long)]): Seq[BigInt] = {
    val blocks =
      scala.collection.mutable.ArrayBuffer[(BigInt, BigInt, Int)]()
    for ((_, n, pos) <- bins.sortBy(_._1)) {
      blocks += ((BigInt(n), BigInt(pos), 1))
      while (blocks.length > 1 && {
        val a = blocks(blocks.length - 2); val b = blocks.last
        a._2 * b._1 >= b._2 * a._1 // pos_a/n_a >= pos_b/n_b exactly
      }) {
        val b = blocks.remove(blocks.length - 1)
        val a = blocks.remove(blocks.length - 1)
        blocks += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    }
    blocks.toSeq.flatMap { case (n, pos, k) =>
      Seq.fill(k)(pos * 1000000 / n)
    }
  }

  test("q_isotonic: the minimax closed form equals exact-fraction PAV " +
    "floored to micro-units, and the fit is monotone") {
    val out = Relational.q_isotonic(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 <= b._5, s"monotone at ${b._1}")
      case _ =>
    }
    val ref = pavRef(out.map(r => (r._1, r._2, r._3)))
    out.map(_._5).zip(ref).foreach { case (got, want) =>
      assert(BigInt(got) == want, "fixture PAV")
    }
    // mass conservation inside each pooled block: Σ n·iso ≈ Σ pos
    // within one floor unit per bin (the fit is the block mean)
    val blocks = out.groupBy(_._5)
    blocks.foreach { case (iso, rows) =>
      val n = rows.map(_._2).sum; val pos = rows.map(_._3).sum
      val lo = BigInt(iso) * n; val hi = (BigInt(iso) + 1) * n
      assert(lo <= BigInt(pos) * 1000000 && BigInt(pos) * 1000000 < hi,
        s"block mean at iso=$iso")
    }
  }

  test("q_conformal: radius, covered set and coverage match an " +
    "independent driver reference; empirical coverage sits near the " +
    "90% guarantee") {
    // independent driver-side derivation (plain collections)
    val oc = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "lineitem")
          .groupBy($"l_orderkey").agg(count(lit(1)).as("nl")),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"), $"nl")
      .as[(Long, Long, Long)].collect().toSeq
    val train = oc.filter(_._1 % 5 >= 2)
    val pred = train.groupBy(_._3)
      .map { case (nl, rows) =>
        nl -> (rows.map(r => BigInt(r._2)).sum / rows.size).toLong
      }
    val gpred = (train.map(r => BigInt(r._2)).sum / train.size).toLong
    def p(nl: Long) = pred.getOrElse(nl, gpred)
    val cal = oc.filter(_._1 % 5 == 1)
      .map(r => (math.abs(r._2 - p(r._3)), r._1)).sorted
    val k = math.min((9 * (cal.size + 1) + 9) / 10, cal.size)
    val radius = cal(k - 1)._1
    val covered = oc.filter(_._1 % 5 == 0)
      .filter(r => math.abs(r._2 - p(r._3)) <= radius)

    val out = Relational.q_conformal(spark, dir).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getLong(0) == train.size, "n_train")
    assert(row.getLong(1) == cal.size, "n_cal")
    assert(row.getLong(2) == k, "k")
    assert(row.getLong(3) == radius, "radius")
    assert(row.getLong(5) == covered.size, "n_covered")
    assert(row.getLong(6) == covered.map(_._1).sum, "covered_id_sum")
    val cov = row.getDouble(7)
    // the conformal guarantee is E[coverage] >= 1 - alpha; allow
    // ~3.5 sigma of binomial noise on the fixture's test-split size
    val slack = 3.5 * math.sqrt(0.9 * 0.1 / row.getLong(4))
    assert(cov >= 0.9 - slack && cov <= 1.0, s"coverage $cov")
  }

  test("q_isotonic: a synthetic violator pattern pools exactly " +
    "through the same plan (isotonicFit)") {
    val syn = Seq((0L, 10L, 9L), (1L, 10L, 1L), (2L, 10L, 5L),
      (3L, 10L, 8L), (4L, 10L, 2L))
    val sout = Relational.isotonicFit(syn.toDF("bin", "n", "pos"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val sref = pavRef(syn)
    assert(sout.map(r => BigInt(r._5)) == sref)
    // this pattern pools EVERYTHING to the global rate 0.5
    assert(sout.map(_._5).distinct == Seq(500000L))
    // and a monotone input must pass through untouched
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 4L), (2L, 10L, 9L))
    val mout = Relational.isotonicFit(mono.toDF("bin", "n", "pos"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(mout.map(_._5) == mout.map(_._4),
      "monotone input: iso == raw per bin")
  }
}
