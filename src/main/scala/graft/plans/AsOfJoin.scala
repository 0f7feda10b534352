package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Last
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.PlanBridge

/**
 * Native AS-OF JOIN as a custom Catalyst operator — the tier-(c)
 * extension path: a [[AsOfJoin]] logical node + a [[RewriteAsOfJoin]]
 * resolution rule registered through `graft.GraftExtensions`.
 *
 * Semantics (the J2 "event × schema version in force" shape, reference
 * cdc/entry schema binding; also DuckDB's `ASOF JOIN`): every left row
 * picks the single right row with the same key and the GREATEST right
 * timestamp ≤ the left timestamp (inclusive); left rows with no prior
 * right row keep NULL right columns (left-outer as-of). Callers must
 * keep right's (key, ts) unique — duplicate version rows at one ts have
 * no defined winner — and must not as-of-join a plan to ITSELF without
 * re-aliasing one side first (the rewrite keeps attribute ids, so a
 * self-join would carry duplicate ids into the union, like any raw
 * Catalyst binary node built from one analyzed subtree).
 *
 * WHY a plan rewrite instead of a join: the naive formulation is a
 * range join (`l.key = r.key AND r.ts <= l.ts` + argmax), which Spark
 * executes as a broadcast/shuffle join with per-key fan-out |L|·|V_key|
 * followed by a reduction — quadratic in versions-per-key. The rewrite
 * emits the UNION-WINDOW plan instead: tag each side, union, and carry
 * the latest right image forward with `last(_, ignoreNulls) OVER
 * (PARTITION BY key ORDER BY ts, side ROWS UNBOUNDED PRECEDING)` — ONE
 * shuffle by key, linear work, no join operator in the plan at all
 * (PlanShapeSpec pins that). At equal timestamps the right row sorts
 * FIRST (side 0 < 1), which is exactly the inclusive `<=` bound.
 *
 * The rewrite keeps the node's output attribute ids: left attributes
 * pass through the union untouched; each carried right column is
 * re-aliased to its ORIGINAL exprId, so downstream references resolve
 * unchanged.
 */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false) extends BinaryNode {
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of ts types differ: ${leftTs.dataType} vs ${rightTs.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object RewriteAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: AsOfJoin if j.childrenResolved => rewrite(j)
  }

  private def rewrite(j: AsOfJoin): LogicalPlan = {
    val lAtts = j.left.output
    val rAtts = j.right.output
    // positional union schema: [_k, _t, left..., right..., _side]
    val p1 = Project(
      Seq(Alias(j.leftKey, "_k")(), Alias(j.leftTs, "_t")()) ++
        lAtts ++
        rAtts.map(a => Alias(Literal.create(null, a.dataType), a.name)()) :+
        Alias(Literal(1), "_side")(),
      j.left)
    val p2 = Project(
      Seq(Alias(j.rightKey, "_k")(), Alias(j.rightTs, "_t")()) ++
        lAtts.map(a => Alias(Literal.create(null, a.dataType), a.name)()) ++
        rAtts :+
        Alias(Literal(0), "_side")(),
      j.right)
    val un = Union(Seq(p1, p2), byName = false, allowMissingCol = false)
    val uk = un.output.head
    val ut = un.output(1)
    val uRights = un.output.slice(2 + lAtts.size, 2 + lAtts.size + rAtts.size)
    val uSide = un.output.last
    // FORWARD direction = the same single-shuffle scan run in reverse
    // time order: the carried right image becomes the nearest version AT
    // OR AFTER the event. Side still ascends so an equal-ts right row
    // precedes the event in scan order — the inclusive bound either way.
    val tsDir = if (j.forward) Descending else Ascending
    val order = Seq(SortOrder(ut, tsDir), SortOrder(uSide, Ascending))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val spec = WindowSpecDefinition(Seq(uk), order, frame)
    // carried right images keep their ORIGINAL exprIds
    val carried: Seq[NamedExpression] = uRights.zip(rAtts).map { case (ur, orig) =>
      Alias(
        WindowExpression(Last(ur, ignoreNulls = true).toAggregateExpression(),
          spec),
        orig.name)(exprId = orig.exprId)
    }
    val win = Window(carried, Seq(uk), order, un, None)
    val onlyLeft = Filter(EqualTo(uSide, Literal(1)), win)
    // left attrs passed through the union keep their exprIds; project the
    // node's exact output
    Project(un.output.slice(2, 2 + lAtts.size) ++ carried.map(_.toAttribute),
      onlyLeft)
  }
}

/** Column-API front door for the custom operator. */
object AsOf {
  /** `left ASOF JOIN right ON left.key = right.key AND right.ts <= left.ts`
    * (left-outer). Column names resolve against each side's analyzed plan;
    * both sides' columns come back, right's nullable. */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           forward: Boolean = false): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    PlanBridge.ofRows(spark,
      AsOfJoin(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs), forward))
  }
}
