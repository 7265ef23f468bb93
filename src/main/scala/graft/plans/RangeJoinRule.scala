package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: bucketed rewrite of the naive point-in-interval
  * range join — the one genuinely new PLANNER capability this library
  * adds over stock Spark (SURVEY §2.9 ladder, rung (c)).
  *
  * Spark plans an inner join whose only cross-side predicate is
  * `v >= lo AND v <= hi` as BroadcastNestedLoopJoin (small build
  * side) or a cartesian — O(|probe|·|build|) either way, the shape
  * that dies first at 100 TB. The declared operators avoid it by
  * hand-bucketing (q_join_range, q_join_interval — the RangeHalo
  * discipline); this rule performs the SAME rewrite automatically on
  * the logical plan, so a user can write the declarative BETWEEN join
  * and still get a shuffled hash join:
  *
  *  - probe side gains `bucket(v) = floorDiv(v, W)`;
  *  - build side explodes `sequence(floorDiv(lo,W), floorDiv(hi,W))`
  *    (a build row claims every bucket its interval touches);
  *  - the join becomes an EQUI-join on the bucket with the original
  *    range predicate as residual.
  *
  * Exactness: a (probe, build) pair satisfying lo ≤ v ≤ hi matches in
  * exactly ONE generated bucket (v's own), so no duplicates and no
  * misses; floorDiv is sign-correct via `(x - pmod(x, W)) div W`
  * (pmod ≥ 0), so negative domains bucket correctly; empty (lo > hi)
  * and NULL intervals generate no buckets, which is the inner-join
  * result the residual would produce anyway.
  *
  * Scope guards (deliberately strict): INNER join only; fires only
  * when the conjuncts contain NO cross-side equality (if one exists
  * Spark already hash-joins, and the guard doubles as the fixpoint
  * brake — the rewrite introduces a bucket equality, so the rule
  * cannot fire twice); `v`, `lo`, `hi` must be LongType expressions
  * each referencing exactly one side. Enabled by setting
  * [[RangeJoinRule.widthKey]] (bucket width in the column's units,
  * e.g. 3600 for epoch-second hours) — unset/0 disables the rule
  * entirely. Registered by [[graft.GraftExtensions]]
  * (`spark.sql.extensions`) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Bucket width conf (long, in the join column's units); 0 = off. */
  val widthKey = "spark.graft.rangeJoin.bucketWidth"

  private def width: Long =
    try conf.getConfString(widthKey, "0").toLong catch {
      case _: NumberFormatException => 0L
    }

  /** One normalized range bound: value expr, bound expr, isLower. */
  private case class Bound(v: Expression, bound: Expression, lower: Boolean)

  /** `a >= b` / `a <= b` in either attribute order, normalized to
    * which side holds the probe value and which the bound. Every
    * comparison of two one-sided Longs admits BOTH readings ("a is
    * the value" / "b is the value"), and which one is right depends
    * on the OTHER conjunct — `lo <= v AND v <= hi` spells both
    * bounds value-second — so this returns both and lets the
    * lower/upper pairing below select the consistent one (it
    * requires the two bounds to share a value expression and to
    * bound it from the opposite side, which kills the three wrong
    * combinations).
    */
  private def asBounds(e: Expression, left: LogicalPlan,
    right: LogicalPlan): Seq[Bound] = {
    def oneSide(x: Expression): Option[Boolean] = {
      val refs = x.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def mk(a: Expression, b: Expression, lowerIfAIsValue: Boolean)
      : Option[Bound] =
      (oneSide(a), oneSide(b)) match {
        case (Some(sa), Some(sb)) if sa != sb &&
          a.dataType == LongType && b.dataType == LongType =>
          Some(Bound(a, b, lowerIfAIsValue))
        case _ => None
      }
    e match {
      // v >= lo  |  hi >= v
      case GreaterThanOrEqual(a, b) =>
        mk(a, b, lowerIfAIsValue = true).toSeq ++
          mk(b, a, lowerIfAIsValue = false)
      // v <= hi  |  lo <= v
      case LessThanOrEqual(a, b) =>
        mk(a, b, lowerIfAIsValue = false).toSeq ++
          mk(b, a, lowerIfAIsValue = true)
      case _ => Nil
    }
  }

  /** Sign-correct floor division by the bucket width. */
  private def floorDiv(e: Expression, w: Long): Expression =
    IntegralDivide(Subtract(e, Pmod(e, Literal(w))), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && {
          val cs = splitConjunctivePredicates(cond)
          // a cross-side equality means Spark already hash-joins —
          // and the rewrite adds one, so this guard is the fixpoint
          // brake too
          !cs.exists {
            case EqualTo(a, b) =>
              (a.references.nonEmpty && b.references.nonEmpty) &&
                !(a.references ++ b.references).subsetOf(left.outputSet) &&
                !(a.references ++ b.references).subsetOf(right.outputSet)
            case _ => false
          }
        } => {
        val conjuncts = splitConjunctivePredicates(cond)
        val bounds = conjuncts.flatMap(asBounds(_, left, right))
        // a usable pair: one lower + one upper bound over the SAME
        // value expression, bounds living on the value's other side
        val pair = (for {
          lo <- bounds if lo.lower
          hi <- bounds if !hi.lower && hi.v.semanticEquals(lo.v) &&
            // both bounds on the same (build) side
            (hi.bound.references ++ lo.bound.references).subsetOf(
              if (lo.v.references.subsetOf(left.outputSet)) right.outputSet
              else left.outputSet)
        } yield (lo, hi)).headOption
        pair match {
          case None => j
          case Some((lo, hi)) =>
            val probeIsLeft = lo.v.references.subsetOf(left.outputSet)
            val (probe, build) = if (probeIsLeft) (left, right) else (right, left)
            // probe: append bucket(v)
            val pAlias = Alias(floorDiv(lo.v, w), "__graft_range_bucket_p")()
            val probeProj = Project(probe.output :+ pAlias, probe)
            // build: explode the claimed-bucket sequence (empty/NULL
            // intervals generate nothing — correct for INNER)
            val flo = floorDiv(lo.bound, w)
            val fhi = floorDiv(hi.bound, w)
            val seq = If(And(IsNotNull(flo), And(IsNotNull(fhi),
              LessThanOrEqual(flo, fhi))),
              Sequence(flo, fhi, Some(Literal(1L)),
                Some(conf.sessionLocalTimeZone)),
              Literal.create(null, ArrayType(LongType)))
            val bAttr = AttributeReference("__graft_range_bucket",
              LongType, nullable = false)()
            val buildGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(bAttr), child = build)
            val newCond = And(EqualTo(pAlias.toAttribute, bAttr), cond)
            val rewritten =
              if (probeIsLeft) Join(probeProj, buildGen, Inner, Some(newCond), hint)
              else Join(buildGen, probeProj, Inner, Some(newCond), hint)
            // restore the original output (drop the bucket columns)
            Project(j.output, rewritten)
        }
      }
    }
  }
}
