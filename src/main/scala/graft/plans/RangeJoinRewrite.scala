package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: plan keyless range joins as bucketed equi-joins.
  *
  * A join whose condition is only `pt >= lo AND pt < hi` (no equality
  * connecting the sides) has no shuffle key, so Spark's physical planning
  * falls back to CartesianProduct / BroadcastNestedLoopJoin — O(|P|·|W|).
  * This rule rewrites the LOGICAL join into the bucket decomposition that
  * [[graft.operators.RangeJoin]] builds by hand: quantize `pt` to a fixed
  * bin, explode each `[lo, hi]` interval into the bins it covers, equi-join
  * on the bin, and re-apply the original condition as an exact filter.
  * Every containing pair shares the point's bin, so recall is exact; the
  * filter removes same-bin non-containing pairs.
  *
  * The whole (c)-rung mechanism in one place: a `Rule[LogicalPlan]`
  * injected through the public `SparkSessionExtensions.injectOptimizerRule`
  * hook ([[graft.functions.GraftExtensions]]) — users write the natural
  * inequality join and the engine plans the scalable form. The same idea
  * ships commercially as Databricks' RANGE_JOIN bin-size hint; bin width
  * here comes from `spark.graft.rangeJoin.binSize` (in the units of the
  * compared columns; unset ⇒ rule inert), because no static analysis can
  * know the interval scale.
  *
  * Scope kept deliberately tight (anything else is left untouched):
  * inner join, deterministic condition, one lower (`>=`/`>`) and one
  * upper (`<`/`<=`) bound on the same LongType point expression, bounds
  * from the opposite side, and no equality predicate already connecting
  * the sides (if there is one, Spark already has a shuffle key and the
  * hash join on it beats the rewrite). The rewritten join gains an equi
  * predicate, so the rule cannot match its own output — fixpoint-safe in
  * the operator-optimization batch.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val binSizeKey = "spark.graft.rangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = conf.getConfString(binSizeKey, "").trim
    if (bin.isEmpty) plan
    else scala.util.Try(bin.toLong).toOption.filter(_ > 0) match {
      // an optimizer rule runs on EVERY plan in the session — a malformed
      // conf value must degrade to a warning, not poison all planning
      case None =>
        logWarning(s"$binSizeKey must be a positive long, got '$bin' — range-join rewrite disabled")
        plan
      case Some(w) =>
        plan.transformUp {
          case j: Join => rewrite(j, w).getOrElse(j)
        }
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** (point, bound) for a lower-bound conjunct `pt >= bound` / `pt > bound`
    * in either written orientation; analogously for upper bounds. */
  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, b) => Some((p, b))
    case GreaterThan(p, b)        => Some((p, b))
    case LessThanOrEqual(b, p)    => Some((p, b))
    case LessThan(b, p)           => Some((p, b))
    case _ => None
  }
  private def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThan(p, b)           => Some((p, b))
    case LessThanOrEqual(p, b)    => Some((p, b))
    case GreaterThan(b, p)        => Some((p, b))
    case GreaterThanOrEqual(b, p) => Some((p, b))
    case _ => None
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = j match {
    case Join(left, right, Inner, Some(cond), _)
        if cond.deterministic && !SubqueryExpression.hasSubquery(cond) =>
      val cs = conjuncts(cond)
      def fromOnly(e: Expression, side: LogicalPlan): Boolean =
        e.references.nonEmpty && e.references.subsetOf(side.outputSet)
      def connects(e: Expression): Boolean = e match {
        case EqualTo(a, b) =>
          (fromOnly(a, left) && fromOnly(b, right)) ||
            (fromOnly(a, right) && fromOnly(b, left))
        case EqualNullSafe(a, b) =>
          (fromOnly(a, left) && fromOnly(b, right)) ||
            (fromOnly(a, right) && fromOnly(b, left))
        case _ => false
      }
      if (cs.exists(connects)) return None // already has a shuffle key

      // a (pt, lo, hi) triple: pt long, from one side; both bounds long,
      // from the other; one lower + one upper conjunct on the same pt
      val candidates = for {
        lower <- cs.flatMap(asLower)
        upper <- cs.flatMap(asUpper)
        (pt, lo) = lower
        (pt2, hi) = upper
        if pt.semanticEquals(pt2) && pt.dataType == LongType &&
          lo.dataType == LongType && hi.dataType == LongType
        ptSideLeft = fromOnly(pt, left)
        if (ptSideLeft && fromOnly(lo, right) && fromOnly(hi, right)) ||
          (!ptSideLeft && fromOnly(pt, right) && fromOnly(lo, left) && fromOnly(hi, left))
      } yield (pt, lo, hi, ptSideLeft)

      candidates.headOption.map { case (pt, lo, hi, ptSideLeft) =>
        val (ptSide, winSide) = if (ptSideLeft) (left, right) else (right, left)
        val wLit = Literal(w)
        val ptBucket = Alias(IntegralDivide(pt, wLit), "__graft_bucket_p")()
        val ptPlan = Project(ptSide.output :+ ptBucket, ptSide)
        // Sequence is TimeZoneAwareExpression: without an explicit zone it
        // reports unresolved and fails the optimizer's plan validation
        val gen = Explode(
          new Sequence(IntegralDivide(lo, wLit), IntegralDivide(hi, wLit), None)
            .withTimeZone(conf.sessionLocalTimeZone))
        val winBucket = AttributeReference(
          "__graft_bucket_w", LongType, nullable = gen.elementSchema.head.nullable)()
        val winPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(winBucket), child = winSide)
        // newL/newR wrap the ORIGINAL left/right respectively (whichever
        // side holds the point), so the user's join hint carries over
        // side-correct — a broadcast(windows) hint keeps meaning windows
        val (newL, newR) = if (ptSideLeft) (ptPlan, winPlan) else (winPlan, ptPlan)
        val bucketed = Join(newL, newR, Inner,
          Some(EqualTo(ptBucket.toAttribute, winBucket)), j.hint)
        Project(j.output, Filter(cond, bucketed))
      }
    case _ => None
  }
}
