package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (point-in-time) join — SURVEY §2.3 J6, the classic operator
  * Spark lacks natively. Implemented by composition (preference tier
  * (a)): tag both sides, union, and take a running `last(right-row,
  * ignoreNulls)` over a per-key event-time window. ONE shuffle on the
  * join key — same cost as a regular equi-join, no range cross
  * product — which is the plan that survives corpus scale. The
  * prediction "a per-key sort-merge zipPartitions SparkPlan would
  * only beat it by a constant factor" is now MEASURED: the native
  * [[graft.plans.AsOfJoinExec]] (q_join_asof_native) is ~1.7× faster
  * at sf1.0 and sf10 — a constant factor, as predicted; both forms
  * share one oracle.
  *
  * Tie rule: a right row at exactly the left row's timestamp matches
  * (`r.ts <= l.ts`); among equal-ts right rows the highest tie-break
  * id wins. Both sides of the oracle implement the same rule.
  */
object AsOfJoin {

  /** For each left row, attach the payload of the latest right row
    * with `right.ts <= left.ts` within the same `key` group.
    *
    * @param left     probe side: (key, ts, tie, leftCols...)
    * @param right    build side: (key, ts, tie, payload)
    * @param key      equi-join column name present on both sides
    * @param ts       event-time column name on both sides
    * @param tie      unique tie-break column name on both sides
    * @param payload  right-side column to carry (as `asof_<payload>`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
    tie: String, payload: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(right.schema(payload).dataType))
    // payload is selected in the SAME projection as key/ts/tie — a
    // withColumn(right(payload)) after the select would reference an
    // attribute already projected away whenever payload is a distinct
    // column, failing analysis
    val r = right.select(col(key), col(ts), col(tie), col(payload).as("__payload"))
      .withColumn("__side", lit(0))
    val unioned = l.select(col(key), col(ts), col(tie), col("__side"), col("__payload"))
      .unionByName(r)
    // right rows sort before left rows at equal ts (so ts-equal rows
    // match); among equal-ts right rows the last seen (max tie) wins
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn(s"asof_$payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__payload")
    left.join(matched.select(col(key), col(ts), col(tie), col(s"asof_$payload")),
      Seq(key, ts, tie), "inner")
  }

  /** Declared query: [[q_join_asof]]'s exact shape executed by the
    * NATIVE physical operator ([[graft.plans.AsOfJoinExec]] via the
    * custom logical node + planner strategy — §2.9 rung (c) complete)
    * instead of the union + running-last composition. Same oracle SQL
    * as q_join_asof: the two plans must be value-identical; PlanSpec
    * additionally pins that the physical plan contains AsOfJoinExec
    * and no window exchange.
    */
  def q_join_asof_native(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    graft.plans.AsOfJoinNative.asofJoinNative(errors, purchases,
        "user_id", "ts", "event_id", payload = "event_id")
      .select(col("event_id"),
        coalesce(col("asof_event_id"), lit(-1L)).as("prev_purchase_id"))
      .orderBy("event_id")
  }

  /** Declared query: for each `error` event, the event_id of that
    * user's latest `purchase` at or before it.
    */
  def q_join_asof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("purchase_id"))
    asofJoin(errors, purchases.drop("purchase_id"), "user_id", "ts", "event_id",
      payload = "event_id") // payload: the purchase's own event_id
      .select(col("event_id"),
        coalesce(col("asof_event_id"), lit(-1L)).as("prev_purchase_id"))
      .orderBy("event_id")
  }
}
