package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/**
 * Bucket-local pair kernels for the LSH dedup tier (r20). The first cut
 * of the bucket-local scoring ([[graft.operators.Dedup.bucketScoredPairs]])
 * went through a typed Dataset flatMap — every bucket deserialized into
 * Seq[case class] with boxed Seq[Long] shingle sets, and at the 100×
 * point the per-pair boxing dominated (q65: shuffle fell 7.2 → 1.7 GB but
 * wall time barely moved). This kernel does the same work on the
 * aggregated ArrayData directly: one call per bucket, primitive long[]
 * merges, rows emitted as InternalRows — no encoder in the loop.
 */
object PairKernels {

  /** All (id_a < id_b, jac) pairs of one bucket. `ms` is
    * array<struct(id: long, sh: array<long> sorted distinct)>; jac is the
    * exact |∩|/|∪| with the division in the same IEEE op as the
    * array_intersect/array_union column form. */
  def bucketPairs(ms: ArrayData): ArrayData = {
    val n = ms.numElements()
    // fail LOUD on a bucket whose pair list cannot materialize as one
    // array value (n·(n−1)/2 in Int arithmetic would overflow negative
    // and throw an opaque NegativeArraySizeException) — an uncapped
    // mega-bucket must be dropped upstream (maxBucket), not half-emitted
    val nPairs = n.toLong * (n - 1L) / 2L
    require(nPairs <= Int.MaxValue.toLong,
      s"bucket of $n members needs $nPairs pairs — above the single-value " +
        "limit; cap degenerate buckets upstream (maxBucket)")
    val ids = new Array[Long](n)
    val shs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val row = ms.getStruct(i, 2)
      ids(i) = row.getLong(0)
      shs(i) = row.getArray(1).toLongArray()
      i += 1
    }
    // sort members by id so emitted pairs satisfy id_a < id_b
    val order = (0 until n).toArray.sortBy(ids(_))
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    i = 0
    while (i < n) {
      val a = shs(order(i))
      val idA = ids(order(i))
      var j = i + 1
      while (j < n) {
        val b = shs(order(j))
        var x = 0; var y = 0; var inter = 0
        while (x < a.length && y < b.length) {
          if (a(x) == b(y)) { inter += 1; x += 1; y += 1 }
          else if (a(x) < b(y)) x += 1
          else y += 1
        }
        val union = a.length + b.length - inter
        out(k) = new GenericInternalRow(Array[Any](
          idA, ids(order(j)), inter.toDouble / union.toDouble))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def bucketPairs(ms: Column): Column =
    ExpressionUtils.column(BucketPairsKernel(ExpressionUtils.expression(ms)))

  /** All (id_a < id_b) pairs of one simhash band bucket whose hamming
    * distance is ≤ maxHam. `ms` is array<struct(id: long, h: long)>;
    * hamming is emitted as int (bit_count's type in the join form). */
  def bucketHamPairs(ms: ArrayData, maxHam: Int): ArrayData = {
    val n = ms.numElements()
    val ids = new Array[Long](n)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = ms.getStruct(i, 2)
      ids(i) = row.getLong(0)
      hs(i) = row.getLong(1)
      i += 1
    }
    val order = (0 until n).toArray.sortBy(ids(_))
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    i = 0
    while (i < n) {
      val ia = order(i)
      var j = i + 1
      while (j < n) {
        val ib = order(j)
        val ham = java.lang.Long.bitCount(hs(ia) ^ hs(ib))
        if (ham <= maxHam)
          out += new GenericInternalRow(Array[Any](ids(ia), ids(ib), ham))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def bucketHamPairs(ms: Column, maxHam: Int): Column =
    ExpressionUtils.column(
      BucketHamPairsKernel(ExpressionUtils.expression(ms), maxHam))
}

/** array<struct(id, sh)> bucket members → array<struct(id_a, id_b, jac)>
  * of all member pairs (see [[PairKernels.bucketPairs]]). */
case class BucketPairsKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("jac", DoubleType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    PairKernels.bucketPairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairKernels.bucketPairs($c)")
  override protected def withNewChildInternal(newChild: Expression): BucketPairsKernel =
    copy(child = newChild)
}

/** array<struct(id, h)> bucket members → array<struct(id_a, id_b,
  * hamming)> of member pairs within maxHam (see
  * [[PairKernels.bucketHamPairs]]). */
case class BucketHamPairsKernel(child: Expression, maxHam: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    PairKernels.bucketHamPairs(input.asInstanceOf[ArrayData], maxHam)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PairKernels.bucketHamPairs($c, $maxHam)")
  override protected def withNewChildInternal(newChild: Expression): BucketHamPairsKernel =
    copy(child = newChild)
}
