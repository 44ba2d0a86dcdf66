package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule that rewrites pure range joins into binned equi-joins.
  *
  * An inner join whose only condition is `p >= s AND p <= e` (any
  * arrangement; `p` from one side, `s`/`e` from the other) has no equi
  * key, so Spark plans BroadcastNestedLoopJoin — O(|L|·|R|) at any
  * cluster size. With `spark.graft.rangeJoin.binWidth` set (> 0, in
  * units of the ordering columns), this rule rewrites the logical plan
  * to the binning decomposition of [[graft.operators.RangeJoin]]: the
  * interval side explodes into one row per covered bin, the point side
  * computes its single bin, and the join gains an `EqualTo` on the bin
  * ids — which `ExtractEquiJoinKeys` then plans as a shuffled (or
  * broadcast) hash join. The original range predicates are kept, so the
  * result is identical; every matching pair meets in exactly the point's
  * bin, so no dedup is introduced.
  *
  * The rewrite is deliberately opt-in (default binWidth 0 = off): the
  * right bin width is a data property (≈ typical interval length) that
  * only the user knows. Applies to integer/long ordering columns — cast
  * dates/timestamps to their numeric form first.
  *
  * This is the `Rule[LogicalPlan]` leg of the extension surface
  * (expressions, logical plan + strategy + exec, planner rule),
  * registered per-session by [[graft.GraftSession]] and cluster-wide by
  * [[graft.GraftExtensions]].
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  final val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Long =
    try conf.getConfString(BinWidthKey, "0").toLong catch { case _: NumberFormatException => 0L }

  /** `c` as a lower bound: Some((point, start)) when c ⇔ point >= start. */
  private def asLower(c: Expression): Option[(Expression, Expression)] = c match {
    case GreaterThanOrEqual(a, b) => Some((a, b))
    case LessThanOrEqual(a, b) => Some((b, a))
    case _ => None
  }

  /** `c` as an upper bound: Some((point, end)) when c ⇔ point <= end. */
  private def asUpper(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case _ => None
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType => true
    case _ => false
  }

  /** (point, start, end, pointOnLeft) for a rewritable condition. */
  private def matchRange(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None
    val candidates = Seq(
      (asLower(conjuncts(0)), asUpper(conjuncts(1))),
      (asLower(conjuncts(1)), asUpper(conjuncts(0))))
    candidates.collectFirst {
      case (Some((p1, s)), Some((p2, e)))
          if p1.semanticEquals(p2) && p1.deterministic && s.deterministic &&
            e.deterministic && integral(p1) && integral(s) && integral(e) &&
            sidesSplit(p1, s, e, left, right).isDefined =>
        val pointOnLeft = sidesSplit(p1, s, e, left, right).get
        (p1, s, e, pointOnLeft)
    }
  }

  /** Some(true) when point refs ⊆ left and bounds ⊆ right; Some(false)
    * for the mirror; None when the condition straddles sides.
    */
  private def sidesSplit(p: Expression, s: Expression, e: Expression,
                         left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val boundRefs = s.references ++ e.references
    if (p.references.nonEmpty && boundRefs.nonEmpty &&
      p.references.subsetOf(left.outputSet) && boundRefs.subsetOf(right.outputSet))
      Some(true)
    else if (p.references.nonEmpty && boundRefs.nonEmpty &&
      p.references.subsetOf(right.outputSet) && boundRefs.subsetOf(left.outputSet))
      Some(false)
    else None
  }

  private def binOf(v: Expression, bw: Long): Expression = {
    val vl = Cast(v, LongType)
    IntegralDivide(Subtract(vl, Pmod(vl, Literal(bw))), Literal(bw))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bw = binWidth
    if (bw <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchRange(cond, left, right) match {
          case None => j
          case Some((p, s, e, pointOnLeft)) =>
            val pointSide = if (pointOnLeft) left else right
            val intervalSide = if (pointOnLeft) right else left
            // Point side: one bin per row, projected alongside the output.
            val binAlias = Alias(binOf(p, bw), "__graft_bin_p")()
            val pointProj = Project(pointSide.output :+ binAlias, pointSide)
            // Interval side: reversed intervals match nothing — filter
            // them out rather than letting Sequence(stop < start) throw.
            val valid = Filter(LessThanOrEqual(s, e), intervalSide)
            val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = false)()
            // Sequence is TimeZoneAware: without an explicit zone it stays
            // unresolved and plan validation rejects the rewrite.
            val exploded = Generate(
              Explode(Sequence(binOf(s, bw), binOf(e, bw), Some(Literal(1L)),
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binAttr), child = valid)
            val newCond = And(EqualTo(binAlias.toAttribute, binAttr), cond)
            val (newLeft, newRight) =
              if (pointOnLeft) (pointProj, exploded) else (exploded, pointProj)
            // Restore the original output (the bin columns are internal).
            Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        }
    }
  }
}
