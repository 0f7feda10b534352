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
 * Rendering matches Go `strconv.FormatFloat(v,'f',-1,32)`:
 * `Float.toString` yields the same shortest round-trip digits, the `.0`
 * strip turns integral `2.0` into `2`, and exponent-notation output
 * (|v| ≥ 1e7 or < 1e-3, where Java switches to `1.0E10` but Go 'f' mode
 * never does) is expanded to plain decimal with the same digit string.
 * Non-finite values raise — TiDB's ParseVectorFloat32 rejects NaN/Inf,
 * so a non-finite element means corrupt input, not a renderable value.
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
      val v = arr.getFloat(i)
      if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v))
        throw new IllegalArgumentException(
          s"non-finite vector element $v: TiDB VectorFloat32 rejects NaN/Inf")
      sb.append(plainDecimal(java.lang.Float.toString(v)))
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }

  /** Expand Java's `d.dddE±x` scientific form to the plain-decimal string
    * Go 'f' mode emits, keeping the digit string; in-band forms just get
    * the `.0` strip. */
  private def plainDecimal(t: String): String = {
    val e = t.indexOf('E')
    if (e < 0)
      return if (t.endsWith(".0")) t.substring(0, t.length - 2) else t
    val neg = t.charAt(0) == '-'
    val m = if (neg) t.substring(1, e) else t.substring(0, e)
    val exp = Integer.parseInt(t.substring(e + 1))
    val dot = m.indexOf('.') // Java always emits one digit before the dot
    val digits = m.substring(0, dot) + m.substring(dot + 1)
    val pointPos = dot + exp // digits before the decimal point
    val sb = new java.lang.StringBuilder(if (neg) "-" else "")
    if (pointPos <= 0) {
      sb.append("0.")
      var k = pointPos
      while (k < 0) { sb.append('0'); k += 1 }
      sb.append(digits)
    } else if (pointPos >= digits.length) {
      sb.append(digits)
      var k = digits.length
      while (k < pointPos) { sb.append('0'); k += 1 }
    } else {
      sb.append(digits, 0, pointPos).append('.')
        .append(digits, pointPos, digits.length)
    }
    // the mandatory mantissa fraction digit ("1.0E-7") leaves a trailing
    // zero after expansion — strip it (Go's shortest form has none)
    var end = sb.length
    if (sb.indexOf(".") >= 0) {
      while (end > 1 && sb.charAt(end - 1) == '0') end -= 1
      if (sb.charAt(end - 1) == '.') end -= 1
    }
    sb.substring(0, end)
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
      val v =
        try java.lang.Float.parseFloat(parts(i).trim)
        catch { case _: NumberFormatException => return null }
      // ParseVectorFloat32 rejects NaN/Inf (Java parseFloat accepts them)
      if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v))
        return null
      out(i) = v
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
