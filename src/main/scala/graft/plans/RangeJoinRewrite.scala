package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a band (absolute-difference) inner join into
  * the bucketed equi-join + residual filter, so `abs(a.ts_us - b.ts_us)
  * <= d` written by a SQL/DataFrame user plans as a hash join instead of
  * the O(n·m) BroadcastNestedLoopJoin Spark falls back to when a join
  * has no equi-key.
  *
  * This is the automatic form of ops/TimeSeries.rangeJoin's hand-built
  * shape (reference semantics: the ±1h candidate restriction of the
  * nearest-view/attribution family, hrfco-kafka-streams has nothing
  * comparable — the rule exists for the ANALYTICS surface): the left
  * side expands to its bucket and both neighbors (bucket width = d, so
  * |x−y| ≤ d implies floor(x/d) and floor(y/d) differ by at most 1),
  * the right side projects its bucket id, the join becomes an equi-join
  * on the bucket with the ORIGINAL condition kept as residual, and a
  * final projection drops the helper columns. 3× replication of one
  * side buys an equi-shuffle; each x matches a given y in exactly one
  * of the three offsets, so no duplicates are produced.
  *
  * Scope guards, deliberately narrow: inner joins only, a `<=`/`>=`
  * band over LongType with a positive literal bound, deterministic
  * side-pure operands, and an idempotence marker (the helper-attr name)
  * so the fixed-point optimizer batch converges. Floor division is the
  * sign-correct x − pmod(x, d) form (TimeSeries.floorDiv), so pre-epoch
  * timestamps bucket correctly. Everything else — outer joins,
  * non-literal bounds, doubles — is left exactly as written.
  *
  * Registered by graft.functions.GraftExtensions (config path) and
  * usable per-session via `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val LbName = "__graft_band_lb"
  private val RbName = "__graft_band_rb"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def longBound(e: Expression): Option[Long] = e match {
    case Literal(d: Long, LongType) => Some(d)
    case Literal(d: Int, _) => Some(d.toLong)
    case Cast(Literal(d: Int, _), LongType, _, _) => Some(d.toLong)
    case _ => None
  }

  /** `abs(x − y) <= d` in either spelling → (x, y, d). */
  private def asBandPredicate(e: Expression): Option[(Expression, Expression, Long)] =
    e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), b) =>
        longBound(b).map((x, y, _))
      case GreaterThanOrEqual(b, Abs(Subtract(x, y, _), _)) =>
        longBound(b).map((x, y, _))
      case _ => None
    }

  /** Sign-correct floor division by a positive literal: the truncating
    * IntegralDivide of x − pmod(x, d) (the greatest multiple of d ≤ x). */
  private def floorDiv(x: Expression, d: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(d))), Literal(d))

  /** An equi conjunct with one side per input — the join already hashes
    * on it, so a bucket expansion would only triple one side's rows. */
  private def isEquiPair(e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def split(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    e match {
      case EqualTo(a, b) => split(a, b)
      case EqualNullSafe(a, b) => split(a, b)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(a => a.name == LbName || a.name == RbName) &&
          !splitConjuncts(cond).exists(isEquiPair(_, left, right)) =>
      val band = splitConjuncts(cond).iterator.flatMap { c =>
        asBandPredicate(c).flatMap { case (x, y, d) =>
          if (d > 0L && x.deterministic && y.deterministic &&
              x.dataType == LongType && y.dataType == LongType) {
            if (x.references.subsetOf(left.outputSet) &&
                y.references.subsetOf(right.outputSet)) Some((x, y, d))
            else if (y.references.subsetOf(left.outputSet) &&
                x.references.subsetOf(right.outputSet)) Some((y, x, d))
            else None
          } else None
        }
      }.take(1).toSeq.headOption
      band match {
        case Some((lx, ry, d)) =>
          val lb = floorDiv(lx, d)
          val lbAttr = AttributeReference(LbName, LongType, nullable = true)()
          val expanded = Generate(
            Explode(CreateArray(Seq(
              Subtract(lb, Literal(1L)), lb, Add(lb, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(lbAttr), child = left)
          val rbAlias = Alias(floorDiv(ry, d), RbName)()
          val projected = Project(right.output :+ rbAlias, right)
          val newCond = And(EqualTo(lbAttr, rbAlias.toAttribute), cond)
          Project(j.output, Join(expanded, projected, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
