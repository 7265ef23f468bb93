package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRule

/** The automatic bucketed range-join rewrite (SURVEY §2.9 rung (c)):
  * plan-shape proof that the naive BETWEEN join stops being a
  * nested-loop, and value-level proof that the rewrite is
  * semantics-preserving — including negative domains (sign-correct
  * floorDiv), interval boundaries, empty and NULL intervals.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Isolated session state (shared SparkContext): the rule +
    * width conf live only here, so the shared session's plans are
    * untouched.
    */
  private lazy val ruled = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(RangeJoinRule)
    s.conf.set(RangeJoinRule.widthKey, "10")
    s
  }

  private def points(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(-25L, -20L, -11L, -10L, -1L, 0L, 1L, 9L, 10L, 15L, 99L, 100L)
      .toDF("v")
  }
  private def intervals(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq((1L, -20L, -10L), (2L, -5L, 5L), (3L, 0L, 0L), (4L, 10L, 99L),
      (5L, 50L, 40L),                    // empty interval
      (6L, 7L, 7L))
      .toDF("id", "lo", "hi")
      .union(Seq((7L, Option.empty[Long], Option(5L)))
        .toDF("id", "lo", "hi"))         // NULL bound
  }

  private def naive(s: org.apache.spark.sql.SparkSession) =
    points(s).join(intervals(s),
      col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "v")

  test("without the rule the naive BETWEEN join is a nested loop; " +
    "with it, a bucketed equi-join") {
    val before = naive(spark).queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") ||
      before.contains("CartesianProduct"), before.take(1500))
    val after = naive(ruled).queryExecution.executedPlan.toString
    assert(!after.contains("BroadcastNestedLoopJoin") &&
      !after.contains("CartesianProduct"), after.take(1500))
    assert(after.contains("Join") && after.contains("__graft_range_bucket"),
      after.take(1500))
  }

  test("the rewrite is value-exact: negative domains, boundaries, " +
    "empty and NULL intervals, multi-bucket intervals") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = rows(naive(spark))
    val bucketed = rows(naive(ruled))
    assert(bucketed == plain)
    // sanity on the fixture itself: boundary hits present, empty and
    // NULL intervals absent
    assert(plain.contains((1L, -20L)) && plain.contains((1L, -10L)))
    assert(plain.contains((3L, 0L)))
    assert(plain.contains((4L, 10L)) && plain.contains((4L, 99L)))
    assert(!plain.exists(_._1 == 5L) && !plain.exists(_._1 == 7L))
  }

  test("bound-first spellings fire too: `lo <= v AND v <= hi` is the " +
    "same rewrite as the BETWEEN desugaring (ADVICE: asBound must " +
    "consider both readings of each comparison)") {
    val boundFirst = points(ruled).join(intervals(ruled),
      col("lo") <= col("v") && col("v") <= col("hi"))
      .select("id", "v")
    val p = boundFirst.queryExecution.executedPlan.toString
    assert(p.contains("__graft_range_bucket"), p.take(1500))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows(boundFirst) == rows(naive(spark)))
  }

  test("the declared q_join_range_auto leaves its caller session " +
    "untouched: no rule registration, no width conf (ADVICE: scope " +
    "the session-global rewrite)") {
    val s = spark.newSession()
    graft.operators.Relational.q_join_range_auto(s, TestSpark.sf0001)
    assert(!s.experimental.extraOptimizations.contains(RangeJoinRule))
    assert(s.conf.getOption(RangeJoinRule.widthKey).isEmpty)
    // an unrelated naive BETWEEN join in the CALLER session still
    // plans as stock Spark (no bucket rewrite leaked in)
    val p = naive(s).queryExecution.executedPlan.toString
    assert(!p.contains("__graft_range_bucket"), p.take(1500))
  }

  test("guards: a cross-side equality conjunct disables the rewrite " +
    "(Spark already hash-joins), and width unset is a strict no-op") {
    import ruled.implicits._
    val a = Seq((1L, 5L), (2L, 15L)).toDF("k", "v")
    val b = Seq((1L, 0L, 10L), (2L, 10L, 20L)).toDF("k", "lo", "hi")
    val equi = a.join(b, a("k") === b("k") &&
      a("v") >= b("lo") && a("v") <= b("hi"))
    val p = equi.queryExecution.executedPlan.toString
    assert(!p.contains("__graft_range_bucket"), p.take(1500))
    assert(equi.count() == 2)
    // width 0 in a fresh ruled session → plan untouched
    val off = spark.newSession()
    off.experimental.extraOptimizations = Seq(RangeJoinRule)
    val pOff = {
      import off.implicits._
      points(off).join(intervals(off),
        col("v") >= col("lo") && col("v") <= col("hi"))
        .queryExecution.executedPlan.toString
    }
    assert(!pOff.contains("__graft_range_bucket"), pOff.take(1500))
  }

  test("GraftExtensions injects the rule through the public " +
    "SparkSessionExtensions API without error") {
    // a session built with `.withExtensions(new GraftExtensions)` (or
    // spark.sql.extensions=graft.GraftExtensions) gets the rule at
    // build time; the JVM-shared TestSpark context can't host a second
    // builder-time session, so this pins the injection call itself —
    // the rule's behavior is proven above via the documented
    // existing-session equivalent (experimental.extraOptimizations)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
  }
}
