package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending,
  Attribute, AttributeReference, BindReferences, Descending, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** §2.9 rung (c), completed end-to-end: a custom LOGICAL node, a
  * planner STRATEGY, and a PHYSICAL operator for the as-of join — the
  * canonical operator Spark lacks natively (pandas `merge_asof`,
  * QuestDB `ASOF JOIN`, Flink temporal join). The composition form
  * ([[graft.operators.AsOfJoin.asofJoin]], union + running last())
  * stays the declared default; this native operator is the
  * demonstration that when composition can't express an operator,
  * the engine can plan it: ONE co-partitioned exchange per side, a
  * per-partition streaming merge with O(1) state (the last right row
  * seen per key), no union inflation and no window buffering.
  *
  * Scope is deliberately narrow and documented: LongType key and
  * tie, Long-representable event time (TimestampType's internal form
  * IS micros-as-Long), non-null join columns — the fixture's shape.
  * Exactness vs the composition (same tie rule: right row at equal
  * ts matches; max (ts, tie) wins) is pinned by AsOfJoinSpec and the
  * shared DuckDB oracle.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
  leftKey: Expression, leftTs: Expression, leftTie: Expression,
  rightKey: Expression, rightTs: Expression, rightTie: Expression,
  payload: Expression, payloadOut: AttributeReference,
  forward: Boolean = false, tolMicros: Option[Long] = None)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ payloadOut
  // the payload attribute is MINTED here, not inherited — without
  // this the analyzer's missing-attribute check rejects the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut :: Nil)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
    newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: children arrive co-partitioned on the key
  * (EnsureRequirements satisfies the two [[ClusteredDistribution]]s
  * with one exchange per side) and sorted by (key, ts, tie)
  * (requiredChildOrdering inserts the sorts), so execution is a
  * zipPartitions streaming merge: rights are consumed while
  * `(rKey, rTs) ≤ (lKey, lTs)`; the LAST right consumed for the
  * current key is by construction the max-(ts, tie) match — the
  * probe never buffers more than one right row.
  *
  * `forward = true` is the SAME merge walked in reverse event-time
  * order: both sides sort (key ASC, ts DESC, tie DESC), rights are
  * consumed while `rTs ≥ lTs`, and the last right consumed is the
  * MIN-(ts, tie) at-or-after match — pandas merge_asof
  * direction='forward' with the composition form's exact tie rule.
  * `tolMicros` post-checks the match distance inside the merge
  * (pandas `tolerance`): a match further than the bound from the
  * probe row emits NULL instead — the match CHOICE is unchanged
  * (latest-before / earliest-after first, then the staleness check),
  * which is the point-in-time-correctness rule feature stores apply.
  */
case class AsOfJoinExec(
  leftKey: Expression, leftTs: Expression, leftTie: Expression,
  rightKey: Expression, rightTs: Expression, rightTie: Expression,
  payload: Expression, payloadOut: AttributeReference,
  forward: Boolean, tolMicros: Option[Long],
  left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  private def tsDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, tsDir),
      SortOrder(leftTie, tsDir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, tsDir),
      SortOrder(rightTie, tsDir)))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
    newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val payB = BindReferences.bindReference(payload, right.output)
    val outAttrs = output
    val leftAttrs = left.output
    val pOut = payloadOut
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, leftAttrs :+ pOut)
      val joined = new JoinedRow
      val payRow = new GenericInternalRow(1)
      // one-right-row lookahead; values extracted eagerly because the
      // underlying unsafe row is reused by the sorter
      var rValid = false
      var rKeyV = 0L; var rTsV = 0L; var rPayV: Any = null
      def readRight(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          rKeyV = rKeyB.eval(r).asInstanceOf[Long]
          rTsV = rTsB.eval(r).asInstanceOf[Long]
          rPayV = InternalRow.copyValue(payB.eval(r))
          rValid = true
        } else rValid = false
      readRight()
      var matchKey = 0L
      var matchPay: Any = null
      var matchTs = 0L
      var hasMatch = false
      val fwd = forward
      val tol = tolMicros.getOrElse(-1L)
      lIter.map { l =>
        val lk = lKeyB.eval(l).asInstanceOf[Long]
        val lt = lTsB.eval(l).asInstanceOf[Long]
        // consume every right row at or before (lk, lt) in the walk
        // order — event-time ascending (backward) or descending
        // (forward); the last one with rKey == lk is the
        // max-(ts, tie) ≤ lt (backward) / min-(ts, tie) ≥ lt
        // (forward) match by sort order
        while (rValid && (rKeyV < lk ||
          (rKeyV == lk && (if (fwd) rTsV >= lt else rTsV <= lt)))) {
          if (rKeyV == lk) {
            matchKey = lk; matchPay = rPayV; matchTs = rTsV; hasMatch = true
          }
          readRight()
        }
        val withinTol = tol < 0L ||
          (if (fwd) matchTs - lt else lt - matchTs) <= tol
        payRow.update(0,
          if (hasMatch && matchKey == lk && withinTol) matchPay else null)
        proj(joined(l, payRow))
      }
    }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.leftTs, p.leftTie,
        p.rightKey, p.rightTs, p.rightTie, p.payload, p.payloadOut,
        p.forward, p.tolMicros,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  /** DataFrame API over the native operator — same signature and
    * declared semantics as [[graft.operators.AsOfJoin.asofJoin]].
    * The right side is re-aliased through a fresh-exprId Project so a
    * self-join (both sides from one table — the fixture case) carries
    * no conflicting attribute ids into the custom node.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
    ts: String, tie: String, payload: String,
    forward: Boolean = false, tolMicros: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    // idempotent session-global registration (the strategy is a pure
    // pattern-match, inert for every other query); synchronized so
    // concurrent builders can't race the read-modify-write of the
    // whole extraStrategies Seq
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.select(col(key), col(ts), col(tie), col(payload))
      .queryExecution.analyzed
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    val rOut = rPlan.output
    def lAttr(n: String) = lPlan.output.find(_.name == n).get
    def rAttr(i: Int) = rOut(i)
    val payloadOut = AttributeReference(s"asof_$payload",
      rAttr(3).dataType, nullable = true)()
    GraftSqlShim.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      lAttr(key), lAttr(ts), lAttr(tie),
      rAttr(0), rAttr(1), rAttr(2), rAttr(3), payloadOut,
      forward, tolMicros))
  }
}
