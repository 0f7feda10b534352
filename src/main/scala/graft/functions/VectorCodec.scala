package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * TiDB `VectorFloat32` string kernels (mounter.go:832-834,
 * canal_entry.go:112 — the `[e1,e2,...]` form every codec renders): a
 * codegen'd in-row render/parse pair replacing the interpreted
 * `transform(...) + regexp_replace` column formulation in the codec hot
 * path. Higher-order array functions are interpreted per element (the
 * TextRuns lesson); these run as ONE static call inside whole-stage
 * codegen — the encode scan stays a single codegen span.
 *
 * Rendering matches Go `strconv.FormatFloat(v,'f',-1,32)` byte-for-byte
 * on the plain-decimal band: `Float.toString` yields the same shortest
 * round-trip digits, and the `.0` strip turns integral `2.0` into `2`.
 */
object VectorCodec {

  /** `[e1,e2,...]` — NULL input stays NULL (handled by nullSafeEval). */
  def render(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(2 + n * 8)
    sb.append('[')
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      val t = java.lang.Float.toString(arr.getFloat(i))
      if (t.endsWith(".0")) sb.append(t, 0, t.length - 2) else sb.append(t)
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }

  /** Parse `[e1,e2,...]` back to float32s; `[]` → empty; malformed → null
    * (the decoder surfaces NULL like a failed ParseVectorFloat32). */
  def parse(s: UTF8String): ArrayData = {
    val str = s.toString.trim
    if (str.length < 2 || str.charAt(0) != '[' ||
        str.charAt(str.length - 1) != ']') return null
    val body = str.substring(1, str.length - 1).trim
    if (body.isEmpty) return new GenericArrayData(Array.empty[Any])
    val parts = body.split(",", -1)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      try out(i) = java.lang.Float.parseFloat(parts(i).trim)
      catch { case _: NumberFormatException => return null }
      i += 1
    }
    new GenericArrayData(out)
  }

  def vecToString(c: Column): Column =
    ExpressionUtils.column(VecToString(ExpressionUtils.expression(c)))

  def vecFromString(c: Column): Column =
    ExpressionUtils.column(VecFromString(ExpressionUtils.expression(c)))
}

/** array<float> → TiDB vector literal string, codegen'd static call. */
case class VecToString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    VectorCodec.render(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorCodec.render($c)")
  override protected def withNewChildInternal(newChild: Expression): VecToString =
    copy(child = newChild)
}

/** TiDB vector literal string → array<float>; malformed input → NULL. */
case class VecFromString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    VectorCodec.parse(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData r =
        graft.functions.VectorCodec.parse($c);
      ${ev.isNull} = r == null;
      ${ev.value} = ${ev.isNull} ? null : r;
    """)
  override protected def withNewChildInternal(newChild: Expression): VecFromString =
    copy(child = newChild)
}
