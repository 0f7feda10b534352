package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd vector kernels behind [[graft.operators.VectorOps]] — the r20
 * optimization pass (guide §1.2 step 2: per-task work; instruction #4:
 * no interpreted `Expression`s in the hot path).
 *
 * The previous column forms built every distance/dot/quantization from
 * `zip_with` + `aggregate` higher-order functions, which Spark evaluates
 * INTERPRETED (no whole-stage codegen, no common-subexpression
 * elimination) and which allocate an intermediate array per evaluation.
 * In the IVF/kmeans assignment paths that expression runs once per
 * (row × centroid) — the measured 100× cost center (q85_ivf_index 63.7 s
 * at sf10, nearly all executor compute). Each kernel here is one tight
 * primitive-array loop invoked from generated code via the
 * defineCodeGen(static call) recipe (the TextRuns pattern), with eval
 * semantics REPLICATED from the column forms bit-for-bit:
 *
 *  - identical IEEE evaluation order (left-to-right folds, the same
 *    cast-widen-multiply-accumulate sequence) so double results are
 *    bit-identical;
 *  - identical null propagation: zip_with pads length-mismatched sides
 *    with null and `aggregate` poisons the fold, so a mismatch or a null
 *    element yields NULL (dot/sqDist/dotQ), an all-null array
 *    (quantizeInt8 — the null norm poisons every element), or a zero
 *    bit (lshSignature — `when(null > 0, ...)` falls to otherwise);
 *  - identical integer overflow behavior (Java long wrap == Spark
 *    non-ANSI long arithmetic).
 */
object VectorKernels {

  private def anyNull(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Exact integer squared L2 over long arrays; NULL on length mismatch
    * or null element (zip_with padding semantics). */
  def sqDistQ(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var s = 0L
    var i = 0
    while (i < n) {
      val t = a.getLong(i) - b.getLong(i)
      s += t * t
      i += 1
    }
    s
  }

  /** Exact integer dot over long arrays; NULL rules as [[sqDistQ]]. */
  def dotQ(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Sequential-fold dot in doubles (float inputs widen exactly); NULL
    * rules as [[sqDistQ]]. `isFloat` selects the element accessor. */
  def dotF(a: ArrayData, b: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var s = 0d
    var i = 0
    if (isFloat) {
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    s
  }

  /** sqrt of the sequential-fold sum of squares; NULL on null element.
    * Empty array → 0 (fold base), matching the column form. */
  def normF(a: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (anyNull(a)) return null
    var s = 0d
    var i = 0
    if (isFloat) {
      while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    } else {
      while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    }
    math.sqrt(s)
  }

  /** Fixed-point quantization floor(x·2²⁰) per element; null elements stay
    * null (transform semantics), null-free inputs produce a primitive
    * array. */
  def quantize(a: ArrayData, isFloat: Boolean, scale: Long): ArrayData = {
    val n = a.numElements()
    if (anyNull(a)) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (a.isNullAt(i)) null
          else {
            val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
            java.lang.Long.valueOf(Math.floor(x * scale).toLong)
          }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = Math.floor(x * scale).toLong
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** int8 unit-sphere quantization floor(127·x/‖x‖) with the zero-norm →
    * all-zeros guard. A null element makes the norm NULL, which in the
    * column form poisons EVERY output element through the
    * when(n === 0, …) branch — replicated here. */
  def quantizeInt8(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    if (anyNull(a)) return new GenericArrayData(new Array[Any](n))
    var s = 0d
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    val nrm = math.sqrt(s)
    val out = new Array[Long](n)
    if (nrm != 0d) {
      i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = Math.floor(x * 127d / nrm).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Hyperplane sign signature: bit j set iff Σ x_i·w_ji > 0 (sequential
    * double fold per plane, identical order to the column form). A length
    * mismatch or null element nulls every projection → signature 0
    * (`when(null > 0, bit).otherwise(0)`). `flat` is planes×dim
    * row-major. */
  def lshSig(a: ArrayData, flat: Array[Long], planes: Int, dim: Int,
             isFloat: Boolean): Long = {
    val n = a.numElements()
    if (n != dim || anyNull(a)) return 0L
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < planes) {
      var s = 0d
      val off = j * dim
      i = 0
      while (i < dim) { s += x(i) * flat(off + i).toDouble; i += 1 }
      if (s > 0d) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Nearest centroid over a quantized long vector: min integer squared
    * L2, ties to the LOWEST centroid id — `cids` must arrive sorted
    * ascending and the strict `<` keeps the first minimum, exactly the
    * (dist, centroid_id) ordering of the crossJoin+window and
    * min(struct(dist, cid)) forms this replaces. Degenerate input (length
    * mismatch / null element) nulls every distance; the window form then
    * ranks by (NULL, cid) with nulls first → lowest cid, NULL dist —
    * replicated. The inner loop early-exits once the partial sum passes
    * the best distance (monotone non-negative terms — pure pruning). */
  def nearestCell(qv: ArrayData, cids: Array[Long], flat: Array[Long],
                  d: Int): InternalRow = {
    val n = qv.numElements()
    if (n != d || anyNull(qv))
      return new GenericInternalRow(Array[Any](cids(0), null))
    val q = new Array[Long](n)
    var i = 0
    while (i < n) { q(i) = qv.getLong(i); i += 1 }
    var bestC = cids(0)
    var bestD = Long.MaxValue
    var c = 0
    while (c < cids.length) {
      val off = c * d
      var s = 0L
      i = 0
      while (i < d && s < bestD) {
        val t = q(i) - flat(off + i)
        s += t * t
        i += 1
      }
      if (i == d && s < bestD) { bestD = s; bestC = cids(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestC, bestD))
  }

  /** nProbe nearest centroids over a quantized long vector, ordered by
    * (integer squared L2 asc, centroid id asc) — the top-N sibling of
    * [[nearestCell]] (r21: replaces the IVF probe-selection crossJoin +
    * row_number window). `cids` must arrive sorted ascending; scanning
    * them in order with STRICT displacement keeps the lowest id on ties,
    * exactly the window's (cdist, centroid_id) ordering. Degenerate input
    * (length mismatch / null element) nulls every distance; the window
    * form then ranked by (NULL, cid) with nulls first → the first nProbe
    * ids — replicated. Inner loop early-exits past the current worst
    * kept distance. */
  def nearestCells(qv: ArrayData, cids: Array[Long], flat: Array[Long],
                   d: Int, nProbe: Int): ArrayData = {
    val keep = math.min(nProbe, cids.length)
    val n = qv.numElements()
    if (n != d || anyNull(qv))
      return new GenericArrayData(java.util.Arrays.copyOf(cids, keep))
    val q = new Array[Long](n)
    var i = 0
    while (i < n) { q(i) = qv.getLong(i); i += 1 }
    val bestD = new Array[Long](keep)
    val bestC = new Array[Long](keep)
    var filled = 0
    var c = 0
    while (c < cids.length) {
      val off = c * d
      val full = filled == keep
      val worst = if (full) bestD(keep - 1) else Long.MaxValue
      var s = 0L
      i = 0
      while (i < d && !(full && s >= worst)) {
        val t = q(i) - flat(off + i)
        s += t * t
        i += 1
      }
      if (i == d && (!full || s < worst)) {
        // insert (s, cids(c)) keeping (dist, cid) order; scan from the
        // tail — strict < so an equal-distance later (higher) cid lands
        // AFTER the earlier one, the window's tie rule. When full the
        // old worst drops off the end.
        var p = if (full) keep - 1 else filled
        while (p > 0 && s < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = s; bestC(p) = cids(c)
        if (!full) filled += 1
      }
      c += 1
    }
    new GenericArrayData(bestC)
  }

  // ---- Column builders -------------------------------------------------

  def sqDistQ(a: Column, b: Column): Column =
    ExpressionUtils.column(SqDistQKernel(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotQ(a: Column, b: Column): Column =
    ExpressionUtils.column(DotQKernel(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotF(a: Column, b: Column): Column =
    ExpressionUtils.column(DotFKernel(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def normF(a: Column): Column =
    ExpressionUtils.column(NormFKernel(ExpressionUtils.expression(a)))

  def quantize(a: Column, scale: Long): Column =
    ExpressionUtils.column(QuantizeKernel(ExpressionUtils.expression(a), scale))

  def quantizeInt8(a: Column): Column =
    ExpressionUtils.column(QuantizeInt8Kernel(ExpressionUtils.expression(a)))

  def lshSig(a: Column, weights: Seq[Seq[Long]]): Column =
    ExpressionUtils.column(LshSigKernel(ExpressionUtils.expression(a),
      weights.map(_.toVector).toVector))

  def nearestCell(qv: Column, cids: Seq[Long], cents: Seq[Seq[Long]]): Column =
    ExpressionUtils.column(NearestCellKernel(ExpressionUtils.expression(qv),
      cids.toVector, cents.map(_.toVector).toVector))

  def nearestCells(qv: Column, cids: Seq[Long], cents: Seq[Seq[Long]],
                   nProbe: Int): Column =
    ExpressionUtils.column(NearestCellsKernel(ExpressionUtils.expression(qv),
      cids.toVector, cents.map(_.toVector).toVector, nProbe))
}

/** Shared element-type probe: these kernels accept float or double
  * arrays (embeddings are float; some derived paths are double). */
private[functions] trait FloatOrDoubleChild { self: Expression =>
  protected def vecChild: Expression
  protected lazy val elemIsFloat: Boolean = vecChild.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"expected array<float|double>, got $t")
  }
}

/** array<long> × array<long> → long squared L2 (null on mismatch). */
case class SqDistQKernel(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sqDistQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long r = graft.functions.VectorKernels.sqDistQ($a, $b);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
      |""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistQKernel =
    copy(left = newLeft, right = newRight)
}

/** array<long> × array<long> → long dot (null on mismatch). */
case class DotQKernel(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long r = graft.functions.VectorKernels.dotQ($a, $b);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
      |""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQKernel =
    copy(left = newLeft, right = newRight)
}

/** array<float|double> dot in doubles, sequential fold. Both sides must
  * share the element type — the element accessor is probed from the LEFT
  * child, so a float/double mix would read the right side with the wrong
  * accessor (silently wrong values on UnsafeArrayData); fail at analysis
  * instead. */
case class DotFKernel(left: Expression, right: Expression)
    extends BinaryExpression with FloatOrDoubleChild {
  override protected def vecChild: Expression = left
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if a == b && (a == FloatType || a == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dotF requires both sides array<float> or both array<double>, got $l × $r")
    }
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double r = graft.functions.VectorKernels.dotF($a, $b, $elemIsFloat);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
      |""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFKernel =
    copy(left = newLeft, right = newRight)
}

/** array<float|double> → L2 norm, sequential fold + sqrt. */
case class NormFKernel(child: Expression)
    extends UnaryExpression with FloatOrDoubleChild {
  override protected def vecChild: Expression = child
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.normF(a.asInstanceOf[ArrayData], elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |java.lang.Double r = graft.functions.VectorKernels.normF($a, $elemIsFloat);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
      |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): NormFKernel =
    copy(child = newChild)
}

/** array<float|double> → array<long> fixed-point quantization. */
case class QuantizeKernel(child: Expression, scale: Long)
    extends UnaryExpression with FloatOrDoubleChild {
  override protected def vecChild: Expression = child
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.quantize(a.asInstanceOf[ArrayData], elemIsFloat, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.quantize($c, $elemIsFloat, ${scale}L)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeKernel =
    copy(child = newChild)
}

/** array<float|double> → array<long> int8 unit-sphere quantization. */
case class QuantizeInt8Kernel(child: Expression)
    extends UnaryExpression with FloatOrDoubleChild {
  override protected def vecChild: Expression = child
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.quantizeInt8(a.asInstanceOf[ArrayData], elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.quantizeInt8($c, $elemIsFloat)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Kernel =
    copy(child = newChild)
}

/** array<float|double> → long hyperplane sign signature (weights are
  * plan-time constants, shipped with the expression). */
case class LshSigKernel(child: Expression, weights: Vector[Vector[Long]])
    extends UnaryExpression with FloatOrDoubleChild {
  require(weights.nonEmpty && weights.forall(_.length == weights.head.length))
  override protected def vecChild: Expression = child
  override def dataType: DataType = LongType
  private lazy val flat: Array[Long] = weights.flatten.toArray
  private def planes: Int = weights.length
  private def dim: Int = weights.head.length
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.lshSig(a.asInstanceOf[ArrayData], flat, planes, dim,
      elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshWeights", flat, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.lshSig($c, $ref, $planes, $dim, $elemIsFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshSigKernel =
    copy(child = newChild)
}

/** array<long> quantized vector → struct(centroid_id, dist): integer
  * argmin over the constant centroid table, ties to the lowest id. */
case class NearestCellKernel(child: Expression, cids: Vector[Long],
    cents: Vector[Vector[Long]]) extends UnaryExpression {
  require(cids.nonEmpty && cids.length == cents.length &&
    cents.forall(_.length == cents.head.length),
    "centroid table must be non-empty and rectangular")
  require(cids.zip(cids.tail).forall { case (a, b) => a < b },
    "centroid ids must be strictly ascending (tie-break contract)")
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("dist", LongType, nullable = true)))
  private lazy val cidArr: Array[Long] = cids.toArray
  private lazy val flat: Array[Long] = cents.flatten.toArray
  private def d: Int = cents.head.length
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCell(a.asInstanceOf[ArrayData], cidArr, flat, d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cellIds", cidArr, "long[]")
    val flatRef = ctx.addReferenceObj("cellCents", flat, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.nearestCell($c, $cidsRef, $flatRef, $d)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellKernel =
    copy(child = newChild)
}

/** array<long> quantized vector → array<long> of the nProbe nearest
  * centroid ids in (dist asc, id asc) order — the IVF probe list (see
  * [[VectorKernels.nearestCells]]). */
case class NearestCellsKernel(child: Expression, cids: Vector[Long],
    cents: Vector[Vector[Long]], nProbe: Int) extends UnaryExpression {
  require(nProbe >= 1, "nProbe must be >= 1")
  require(cids.nonEmpty && cids.length == cents.length &&
    cents.forall(_.length == cents.head.length),
    "centroid table must be non-empty and rectangular")
  require(cids.zip(cids.tail).forall { case (a, b) => a < b },
    "centroid ids must be strictly ascending (tie-break contract)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val cidArr: Array[Long] = cids.toArray
  private lazy val flat: Array[Long] = cents.flatten.toArray
  private def d: Int = cents.head.length
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCells(a.asInstanceOf[ArrayData], cidArr, flat, d, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cellIds", cidArr, "long[]")
    val flatRef = ctx.addReferenceObj("cellCents", flat, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.nearestCells($c, $cidsRef, $flatRef, $d, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellsKernel =
    copy(child = newChild)
}
