package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Repetition-statistics kernel (Gopher-style top n-gram fraction,
 * reference capability: training-data quality filters; cf. the reference's
 * per-row transform stages, e.g. cdc/sink/dmlsink/mq/transformer).
 *
 * A per-document statistic must never shuffle its grams: at corpus scale
 * the explode + groupBy((doc, gram)) formulation moves every n-gram string
 * through an exchange. This expression computes the most-frequent-gram
 * fraction entirely inside the row: xxhash64 each token zero-copy, combine
 * n consecutive hashes (FNV-1a over the 8-byte words), sort the primitive
 * long array, and take the longest equal run. O(m log m) per doc, zero
 * object allocation beyond two long arrays, codegen-friendly — the scan
 * stays one WholeStageCodegen span with no exchange.
 *
 * Hash note: gram identity is a 64-bit hash, so two distinct grams collide
 * with probability ~m²/2⁶⁵ per doc (~1e-13 at 10k tokens) — negligible
 * against the exact-count alternative's shuffle cost.
 */
object TextRuns {

  /** most-frequent n-gram count / total n-gram count, null when the doc
    * has no n-grams (fewer than n tokens). */
  def topGramFrac(tokens: ArrayData, n: Int): java.lang.Double = {
    val m = tokens.numElements()
    val total = m - n + 1
    if (total <= 0) return null
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = tokens.getUTF8String(i)
      th(i) = if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val g = new Array[Long](total)
    i = 0
    while (i < total) {
      var h = -3750763034362895579L // FNV-1a offset basis
      var k = 0
      while (k < n) {
        var x = th(i + k)
        var b = 0
        while (b < 8) { h = (h ^ (x & 0xff)) * 1099511628211L; x >>>= 8; b += 1 }
        k += 1
      }
      g(i) = h
      i += 1
    }
    java.util.Arrays.sort(g)
    var best = 1
    var run = 1
    i = 1
    while (i < total) {
      if (g(i) == g(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best.toDouble / total.toDouble
  }

  /** Column builder: tokens array<string> → top n-gram fraction. */
  def topNgramFrac(tokens: Column, n: Int): Column =
    ExpressionUtils.column(TopNgramFrac(ExpressionUtils.expression(tokens), n))
}

/** array<string> tokens → double fraction; null when < n tokens. */
case class TopNgramFrac(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-grams need n >= 1")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextRuns.topGramFrac(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double r = graft.functions.TextRuns.topGramFrac($c, $n);
      ${ev.isNull} = r == null;
      ${ev.value} = ${ev.isNull} ? -1.0 : r.doubleValue();
    """)
  override protected def withNewChildInternal(newChild: Expression): TopNgramFrac =
    copy(child = newChild)
}
