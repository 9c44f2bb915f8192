package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite point-in-interval inequality joins into banded
  * equi-joins.
  *
  * Spark plans an inner join whose condition is ONLY range predicates
  * (`p >= lo AND p < hi`) as BroadcastNestedLoopJoin — O(N·M) comparisons,
  * a scale-killer the moment neither side is tiny. This rule detects the
  * shape: an inner join with no equi-conjunct where one side's numeric
  * expression `p` is bounded below and above by expressions from the other
  * side, and rewrites it to the [[graft.joins.TemporalJoins.rangeJoinBanded]]
  * construction inside the optimizer:
  *
  *   point side    → Project(…, floor(p / W) AS __graft_band)
  *   interval side → Generate(explode(sequence(floor(lo/W), floor(hi/W))))
  *   join          → equi on band + the ORIGINAL condition as residual
  *
  * fp division and floor are monotone, so a point in [lo, hi) always lands
  * in a band the interval generates — the rewrite can only prune pairs,
  * never lose them, and the residual keeps exact semantics (including
  * strict/non-strict bound variants and null bounds, which generate no
  * bands and match nothing, exactly like the original predicate).
  *
  * The band width is `spark.graft.rangeJoin.bandWidth` (default 1000);
  * width only affects candidate fan-out (ceil(span/W)+1 per interval),
  * never correctness. The rewritten join HAS an equi-conjunct, so the rule
  * does not re-fire on its own output.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BandWidthConf = "spark.graft.rangeJoin.bandWidth"
  val EnabledConf = "spark.graft.rangeJoin.enabled"

  /** One normalized range conjunct: `point` bounded by `bound` from the
    * opposite side; `isLower` marks `p >/>= bound` vs `p </<= bound`.
    */
  private final case class Bound(point: Expression, bound: Expression,
      isLower: Boolean, pointIsLeft: Boolean)

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] =
    if (canEvaluate(e, left)) Some(true)
    else if (canEvaluate(e, right)) Some(false)
    else None

  /** Normalize a comparison conjunct into [[Bound]]s when one side is a
    * deterministic numeric expression over the left child and the other
    * over the right child. Each comparison bounds BOTH operands (`a >= b`
    * is a lower bound on `a` and an upper bound on `b`), so both readings
    * are emitted and the pairing step picks the one that completes an
    * interval.
    */
  private def asBound(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[Bound] = {
    def mk(p: Expression, b: Expression, isLower: Boolean): Option[Bound] =
      (sideOf(p, left, right), sideOf(b, left, right)) match {
        case (Some(ps), Some(bs)) if ps != bs &&
            p.dataType.isInstanceOf[NumericType] &&
            b.dataType.isInstanceOf[NumericType] &&
            p.deterministic && b.deterministic =>
          Some(Bound(p, b, isLower, ps))
        case _ => None
      }
    val oriented = c match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case GreaterThan(a, b)        => Some((a, b))
      case LessThanOrEqual(a, b)    => Some((b, a))
      case LessThan(a, b)           => Some((b, a))
      case _                        => None
    }
    oriented.toSeq.flatMap { case (big, small) =>
      mk(big, small, isLower = true) ++ mk(small, big, isLower = false)
    }
  }

  private def hasEquiConjunct(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = conjuncts.exists {
    case EqualTo(a, b) =>
      (canEvaluate(a, left) && canEvaluate(b, right)) ||
        (canEvaluate(a, right) && canEvaluate(b, left))
    case EqualNullSafe(a, b) =>
      (canEvaluate(a, left) && canEvaluate(b, right)) ||
        (canEvaluate(a, right) && canEvaluate(b, left))
    case _ => false
  }

  private def bandOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "true").toBoolean) return plan
    val w = conf.getConfString(BandWidthConf, "1000").toDouble
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if left.resolved && right.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiConjunct(conjuncts, left, right)) j
        else {
          val bounds = conjuncts.flatMap(asBound(_, left, right))
          // a lower and an upper bound on the SAME point expression
          val pair = (for {
            lo <- bounds if lo.isLower
            hi <- bounds if !hi.isLower && hi.pointIsLeft == lo.pointIsLeft &&
              hi.point.semanticEquals(lo.point)
          } yield (lo, hi)).headOption
          pair match {
            case Some((lo, hi)) =>
              val (pointPlan, intervalPlan) =
                if (lo.pointIsLeft) (left, right) else (right, left)
              val bandAlias = Alias(bandOf(lo.point, w), "__graft_band")()
              val pointProj = Project(pointPlan.output :+ bandAlias, pointPlan)
              val loBand = bandOf(lo.bound, w)
              val hiBand = bandOf(hi.bound, w)
              // Sequence is TimeZoneAwareExpression: it only resolves with
              // an explicit zone id (irrelevant for integral sequences)
              val seq = new Sequence(loBand, hiBand, Some(Literal(1L)),
                Some(conf.sessionLocalTimeZone))
              // degenerate (hi < lo) or null-bounded intervals produce no
              // bands — Sequence would throw on inverted boundaries
              val safeSeq = If(LessThanOrEqual(loBand, hiBand), seq,
                Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
              val genOut = AttributeReference("__graft_band_g", LongType,
                nullable = false)()
              val gen = Generate(Explode(safeSeq), unrequiredChildIndex = Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(genOut), child = intervalPlan)
              val bandEq = EqualTo(bandAlias.toAttribute, genOut)
              val (newLeft, newRight) =
                if (lo.pointIsLeft) (pointProj, gen) else (gen, pointProj)
              Project(j.output,
                Join(newLeft, newRight, Inner, Some(And(bandEq, cond)), hint))
            case None => j
          }
        }
    }
  }

  /** Idempotently attach the rule to a session's extra optimizations (the
    * runtime-injectable path; production sessions get it via
    * [[GraftExtensions]] / `spark.sql.extensions`).
    */
  def ensureInjected(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    }
  }
}
