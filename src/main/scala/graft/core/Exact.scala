package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Exact integer floor-division for the cross-engine fixed-point twins.
 * `Column./` on longs returns double (precision loss past 2^53 — real
 * for nanosecond timestamps and ppm products), so every operator that
 * must agree bit-for-bit with the DuckDB `//` oracle builds the SQL
 * `DIV` (IntegralDivide) Catalyst expression through ONE shared recipe —
 * a future EvalMode/bridge change lands here once instead of silently
 * diverging per operator. Truncation toward zero equals floor on the
 * non-negative domains these operators use.
 */
object Exact {

  /** n DIV d, both integral columns. */
  def idiv(n: Column, d: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(n), ColumnBridge.expression(d),
      EvalMode.LEGACY))

  /** c DIV k for a literal divisor. */
  def divLong(c: Column, k: Long): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c), Literal(k), EvalMode.LEGACY))
}
