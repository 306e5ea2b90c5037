package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a point-in-range INNER join
  * (`p >= lo AND p < hi`, no equi-conjunct) into the bucketed equi-join
  * [[graft.operators.RangeJoin]] builds by hand — so plain
  * `left.join(right, $"p" >= $"lo" && $"p" < $"hi")` (or its SQL form)
  * gets the scale-safe plan automatically.
  *
  * Why: without an equality conjunct Spark can only plan a nested-loop
  * join (broadcast if one side is small, cartesian otherwise) — quadratic
  * once both sides are large. Quantizing the domain into fixed-width
  * buckets, expanding each [lo, hi] to the buckets it overlaps, and
  * equi-joining on the bucket id turns it into a shuffled hash join; the
  * original predicates stay in the join condition as the exact recheck.
  *
  * Opt-in via `spark.graft.rangeJoin.bucketWidth` (> 0 enables; pick ≈
  * the typical interval width). The rewrite preserves semantics exactly:
  * every matching (point, interval) pair meets in the point's bucket and
  * nowhere else; null points/bounds produce null buckets / empty
  * sequences, matching the original predicate's null → no-match. An
  * inverted interval (lo > hi) explodes to a descending garbage sequence
  * rather than none — rows the recheck then drops (correct, just not
  * worth guarding: such intervals match nothing either way).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private def numeric(e: Expression): Boolean = e.dataType match {
    case _: NumericType => true
    case _ => false
  }

  /** (point, bound, isLower) readings of one comparison conjunct. */
  private def readings(e: Expression): Seq[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThan(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case LessThan(a, b) => Seq((a, b, false), (b, a, true))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toDouble
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if j.resolved && cond.deterministic =>
        val conjuncts = splitConjunctivePredicates(cond)
        def fromLeft(e: Expression) =
          e.references.nonEmpty && e.references.subsetOf(l.outputSet)
        def fromRight(e: Expression) =
          e.references.nonEmpty && e.references.subsetOf(r.outputSet)
        def oneSided(e: Expression) = fromLeft(e) || fromRight(e)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) => oneSided(a) && oneSided(b) &&
            (fromLeft(a) != fromLeft(b))
          case _ => false
        }
        // cross-side (point, bound, isLower) candidates
        val cands = conjuncts.flatMap(readings).filter { case (p, b, _) =>
          numeric(p) && numeric(b) && p.deterministic && b.deterministic &&
            oneSided(p) && oneSided(b) && (fromLeft(p) != fromLeft(b))
        }
        val pointed = cands.groupBy(_._1.canonicalized)
        val hit = pointed.values.find(g =>
          g.exists(_._3) && g.exists(!_._3))
        hit match {
          case Some(group) if !hasEqui =>
            val point = group.head._1
            val lo = group.find(_._3).get._2
            val hi = group.find(!_._3).get._2
            val pointOnLeft = fromLeft(point)
            def bucket(e: Expression): Expression =
              Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))),
                LongType)
            // point side: project the bucket id
            val pAlias = Alias(bucket(point), "_graft_bucket_p")()
            val (pChild, bChild) = if (pointOnLeft) (l, r) else (r, l)
            val pSide = Project(pChild.output :+ pAlias, pChild)
            // bound side: explode the covered bucket range
            val bAttr = AttributeReference("_graft_bucket_b", LongType,
              nullable = false)()
            // Sequence is TimeZoneAwareExpression: without a timeZoneId it
            // reports unresolved and fails optimizer plan validation
            val bSide = Generate(
              Explode(new Sequence(bucket(lo), bucket(hi))
                .withTimeZone(conf.sessionLocalTimeZone)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bAttr), child = bChild)
            val newCond = And(EqualTo(pAlias.toAttribute, bAttr), cond)
            val (nl, nr) = if (pointOnLeft) (pSide, bSide) else (bSide, pSide)
            Project(l.output ++ r.output,
              Join(nl, nr, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }
}
