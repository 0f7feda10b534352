package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.operators.VectorOps
import graft.functions.VectorKernels

/**
 * r20 optimization pins: every codegen'd vector kernel must equal the
 * interpreted higher-order column form it replaced, BIT-FOR-BIT — doubles
 * compare with ==, not tolerance, because the kernels replicate the exact
 * IEEE fold order. Randomized vectors include negatives, zeros, exact
 * duplicates (distance ties) and a zero vector (the int8 guard), plus the
 * degenerate length-mismatch/null-element rows that exercise the
 * zip_with-padding null semantics.
 */
class VectorKernelSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random float in [-1, 1) from (i, d)
  private def f(i: Long, d: Int): Float =
    ((i * 1103515245L + d * 12345L) % 2048L).toFloat / 1024f - 1f

  private val dim = 16
  private lazy val vecs = (0L until 200L).map { i =>
    // rows 50..53 duplicate row 10 (ties); row 99 is the zero vector
    val src = if (i >= 50 && i < 54) 10L else i
    val arr =
      if (i == 99L) Array.fill(dim)(0f)
      else Array.tabulate(dim)(d => f(src, d))
    (i, arr)
  }.toDF("vec_id", "embedding")

  // ---- legacy column forms (the pre-r20 implementations, verbatim) ----
  private def legacyDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, x) => acc + x)
  private def legacyNorm(a: Column): Column =
    sqrt(aggregate(a, lit(0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
  private def legacyQuantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * VectorOps.QuantScale).cast("long"))
  private def legacyQuantizeInt8(vec: Column): Column =
    element_at(
      transform(array(legacyNorm(vec)), n =>
        transform(vec, x => when(n === 0d, lit(0L))
          .otherwise(floor(x.cast("double") * 127d / n).cast("long")))),
      1)
  private def legacyDotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  private def legacySqDistQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
  private def legacyLshSig(vec: Column, planes: Int, d: Int): Column = {
    val ws = VectorOps.hyperplaneWeights(planes, d)
    (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(vec, typedLit(ws(j)), (x, w) => x.cast("double") * w.cast("double")),
        lit(0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("dot / norm kernels are bit-identical to the fold forms") {
    val paired = vecs.as("a").join(vecs.as("b"),
      col("b.vec_id") === col("a.vec_id") + 100L)
    val bad = paired.select(
      (VectorOps.dot(col("a.embedding"), col("b.embedding")) <=>
        legacyDot(col("a.embedding"), col("b.embedding"))).as("d"),
      (VectorOps.norm(col("a.embedding")) <=>
        legacyNorm(col("a.embedding"))).as("n"))
      .filter(!col("d") || !col("n")).count()
    assert(bad == 0L)
  }

  test("quantize / quantizeInt8 kernels match per element (incl. zero vector)") {
    val bad = vecs.select(
      (VectorOps.quantize(col("embedding")) <=>
        legacyQuantize(col("embedding"))).as("q"),
      (VectorOps.quantizeInt8(col("embedding")) <=>
        legacyQuantizeInt8(col("embedding"))).as("q8"))
      .filter(!col("q") || !col("q8")).count()
    assert(bad == 0L)
  }

  test("dotQ / sqDistQ kernels match, including length-mismatch nulls") {
    val q = vecs.select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val paired = q.as("a").join(q.as("b"),
        col("b.vec_id") === col("a.vec_id") + 50L)
      .select(col("a.qv").as("qa"),
        // b-side truncated on odd pairs → zip_with null-padding must
        // surface as NULL from both forms
        when(col("b.vec_id") % 2 === 1, slice(col("b.qv"), 1, dim - 3))
          .otherwise(col("b.qv")).as("qb"))
    val bad = paired.select(
      (VectorOps.dotQ(col("qa"), col("qb")) <=>
        legacyDotQ(col("qa"), col("qb"))).as("d"),
      (VectorOps.sqDistQ(col("qa"), col("qb")) <=>
        legacySqDistQ(col("qa"), col("qb"))).as("s"))
      .filter(!col("d") || !col("s")).count()
    assert(bad == 0L)
    // the mismatch rows really are NULL (not 0) in both
    val nulls = paired.filter(VectorOps.sqDistQ(col("qa"), col("qb")).isNull).count()
    assert(nulls > 0L)
  }

  test("lshSignature kernel matches the per-plane fold form") {
    val bad = vecs.select(
      (VectorOps.lshSignature(col("embedding"), 6, dim) <=>
        legacyLshSig(col("embedding"), 6, dim)).as("ok"))
      .filter(!col("ok")).count()
    assert(bad == 0L)
  }

  test("nearestCell kernel equals the crossJoin+window argmin, ties to low cid") {
    import org.apache.spark.sql.expressions.Window
    val q = vecs.select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    // centroids = quantized vectors of ids 0,10,20,30 — row 10's exact
    // duplicates (50..53) tie between cid 10 and itself at dist 0
    val centRows = q.filter(col("vec_id") % 10 === 0 && col("vec_id") < 40)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq
    val kernel = q.withColumn("best",
        VectorKernels.nearestCell(col("qv"), centRows.map(_._1), centRows.map(_._2)))
      .select(col("vec_id"), col("best.centroid_id"), col("best.dist"))
      .as[(Long, Long, Long)].collect().toSet
    val cdf = centRows.toDF("centroid_id", "centroid")
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("centroid_id"))
    val legacy = q.crossJoin(broadcast(cdf))
      .withColumn("dist", legacySqDistQ(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("dist"))
      .as[(Long, Long, Long)].collect().toSet
    assert(kernel == legacy)
  }
}
