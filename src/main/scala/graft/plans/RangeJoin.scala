package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Automatic binned-range-join rewrite — the optimizer-rule tier of
 * [[graft.operators.Ranges.pointInInterval]]: any INNER join whose
 * condition is NOTHING BUT a two-sided range predicate on one integral
 * point expression (`p >= s AND p < e`, any comparison orientation,
 * point on either side) would otherwise plan as
 * BroadcastNestedLoopJoin/CartesianProduct — O(|P|·|I|). With
 *
 *   spark.graft.rangeJoin.binSize = <positive long>
 *
 * set (the rule is a no-op otherwise — an explicit knob, not a silent
 * plan change), [[RewriteRangeJoin]] rewrites the join in place: the
 * bound side explodes onto the bins its `[s, e]` hull covers
 * (`s div B .. e div B` — a superset of the exact span for every
 * comparison-operator combination, so the residual original predicate
 * keeps exactness), the point side computes its single bin, and the join
 * becomes a plain equi-join on bin id with the ORIGINAL condition as
 * residual. Each qualifying pair meets in exactly one bin (the point's),
 * so no dedup is needed; output attributes pass through untouched, so
 * downstream plans resolve unchanged.
 *
 * The rewrite self-limits: the produced join carries an equi conjunct,
 * so the matcher (exactly two range conjuncts, no equi key) never fires
 * on its own output, and joins that already have an equi key (the q191
 * interval-join shape) are left to Spark's native handling.
 */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"
  val DefaultMaxBins = 1L << 20

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // malformed knob → rule no-ops with a log line; the blast radius of a
    // typo'd conf must be the knob, not every query in the session
    val bin = conf.getConfString(BinSizeKey, "0").toLongOption.getOrElse {
      logWarning(s"$BinSizeKey is not a long; range-join rewrite disabled")
      0L
    }
    val maxBins = conf.getConfString(MaxBinsKey, DefaultMaxBins.toString)
      .toLongOption.getOrElse(DefaultMaxBins)
    if (bin <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if j.resolved =>
        rewrite(j, cond, bin, maxBins).getOrElse(j)
    }
  }

  /** Readings of one comparison as (point, bound, isLower). */
  private def readings(c: Expression): Seq[(Expression, Expression, Boolean)] =
    c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case _                        => Seq.empty
    }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def toLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def rewrite(j: Join, cond: Expression, bin: Long, maxBins: Long)
  : Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    val combos = for {
      (p1, b1, low1) <- readings(conjuncts.head)
      (p2, b2, low2) <- readings(conjuncts(1))
      if low1 != low2 && p1.semanticEquals(p2)
      if integral(p1) && integral(b1) && integral(b2)
    } yield if (low1) (p1, b1, b2) else (p1, b2, b1) // (point, lower s, upper e)
    combos.iterator.flatMap { case (p, s, e) =>
      val pRefs = p.references
      val bRefs = s.references ++ e.references
      val pOnLeft = pRefs.nonEmpty && pRefs.subsetOf(j.left.outputSet) &&
        bRefs.nonEmpty && bRefs.subsetOf(j.right.outputSet)
      val pOnRight = pRefs.nonEmpty && pRefs.subsetOf(j.right.outputSet) &&
        bRefs.nonEmpty && bRefs.subsetOf(j.left.outputSet)
      if (!pOnLeft && !pOnRight) None
      else {
        def div(x: Expression) =
          IntegralDivide(toLong(x), Literal(bin), EvalMode.LEGACY)
        val (pPlan, bPlan) = if (pOnLeft) (j.left, j.right) else (j.right, j.left)
        val pBin = Alias(div(p), "_g_pbin")()
        val pProj = Project(pPlan.output :+ pBin, pPlan)
        // [s, e] hull guard: intervals with e < s match nothing under any
        // of the four operator combos, so dropping them is semantics-free
        val guarded = Filter(GreaterThanOrEqual(toLong(e), toLong(s)), bPlan)
        val ivBin = AttributeReference("_g_ivbin", LongType, nullable = true)()
        // Span guard: an open-validity sentinel end (e = Long.MaxValue,
        // the SCD2 "current row" encoding) would explode onto billions of
        // bins and kill the job with an opaque Sequence error. Fail FAST
        // per offending row with an actionable message naming the knobs
        // instead — clamping would silently drop matches.
        val stop = If(
          LessThanOrEqual(Subtract(div(e), div(s)), Literal(maxBins)),
          div(e),
          Cast(new RaiseError(Literal(
            s"range-join rewrite: interval spans more than $maxBins bins " +
              s"of $bin ($MaxBinsKey / $BinSizeKey); cap sentinel end " +
              "values (e.g. least(end, horizon)) before joining")),
            org.apache.spark.sql.types.LongType))
        // Sequence is TimeZoneAware — without an explicit zone it would
        // re-enter the optimizer unresolved (no re-resolution runs there)
        val seq = Sequence(div(s), stop, None,
          Some(conf.sessionLocalTimeZone))
        val gen = Generate(Explode(seq),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(ivBin), child = guarded)
        val newCond = And(EqualTo(pBin.toAttribute, ivBin), cond)
        val (nl, nr) = if (pOnLeft) (pProj, gen) else (gen, pProj)
        val joined = Join(nl, nr, Inner, Some(newCond), j.hint)
        Some(Project(j.left.output ++ j.right.output, joined))
      }
    }.nextOption()
  }
}
