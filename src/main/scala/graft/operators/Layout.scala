package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout (Z-order clustering) + min/max file
 * skipping — the storage-side lever that decides whether a 100 TB scan
 * reads 100 TB or 1 TB.
 *
 * Parquet/ORC readers prune files (and row groups) whose min/max column
 * stats miss the query predicate. A linear sort clusters ONE column:
 * predicates on it skip nearly everything, predicates on any other column
 * skip nothing (every file spans the full domain). Interleaving the bits
 * of k quantized columns (the Morton / Z-order curve) makes every file a
 * small hyper-rectangle, so min/max pruning works on ALL k dims at once —
 * the public Delta/Iceberg `OPTIMIZE ZORDER BY` design.
 *
 * [[zValue2]] is a static 2·bits-term column expression (codegen'd, no
 * UDF). The production writer is [[writeZOrdered]]: repartitionByRange on
 * the z-value (a sampled range shuffle — Spark's sort-shuffle machinery,
 * no global single-task sort) then sortWithinPartitions, so every output
 * file covers a contiguous z-range. [[skippingReport]] is the
 * deterministic twin the oracle can replay: "files" are exact ntile
 * buckets of the z-order (or linear) total order, and the report counts
 * how many files a box predicate skips under each layout.
 */
object Layout {

  /** Morton z-value of k already-quantized dims in [0, 2^bits) —
    * k·bits ≤ 62 so the interleaved value fits a long. Static
    * k·bits-term codegen'd expression, no UDF. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits >= 1 && dims.size * bits <= 62,
      s"dims=${dims.size} bits=$bits")
    val k = dims.size
    (for { i <- 0 until bits; (d, j) <- dims.zipWithIndex } yield
      shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ + _)
  }

  /** Morton z-value of two already-quantized dims in [0, 2^bits). */
  def zValue2(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

  /** Quantize a non-negative value with known max onto [0, 2^bits):
    * exact integer (v · (2^bits − 1)) div max — replayable in any engine.
    * Fails fast (the Ranges guardedStop pattern) when v · (2^bits − 1)
    * would overflow int64 — e.g. nanosecond timestamps with bits ≥ 16 —
    * instead of silently wrapping into a garbage file layout. */
  def quantize(v: Column, maxV: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62]: $bits")
    val scale = (1L << bits) - 1
    val maxSafe = Long.MaxValue / scale
    val safeV = when(v.cast("long").between(0L, maxSafe), v.cast("long"))
      .otherwise(raise_error(lit(
        s"quantize: value outside [0, $maxSafe] for bits=$bits — the scale " +
          "product would overflow int64; reduce bits or pre-scale the dimension")))
    graft.core.Exact.idiv(safeV * scale, maxV.cast("long"))
  }

  /** Production writer: z-cluster `df` on (x, y) into `nFiles` parquet
    * files under `path`. Range-partitions by z-value (sampled bounds — a
    * normal shuffle, no global sort task), sorts within partitions, one
    * file per partition; readers then prune on per-file min/max of BOTH
    * dims. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      nFiles: Int, path: String): Unit = {
    val stats = df.agg(max(col(xCol)).as("_mx"), max(col(yCol)).as("_my"))
    val z = df.crossJoin(broadcast(stats))
      .withColumn("_zv", zValue2(
        quantize(col(xCol), col("_mx"), bits),
        quantize(col(yCol), col("_my"), bits), bits))
      .drop("_mx", "_my")
    z.repartitionByRange(nFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zv")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Deterministic skipping report: lay `df` out as `nFiles` equal ntile
   * buckets of (a) the z-order and (b) the x-linear order, then count the
   * files whose per-file min/max (xq, yq) rectangle misses the box
   * `[bx0, bx1] × [by0, by1]` (quantized coordinates). Returns one row per
   * layout: n_files, files_skipped, rows_scanned (rows in unskipped
   * files), rows_matched (true box rows — layout-invariant).
   *
   * Tie-safety: ntile needs only a total PREORDER on the stat-relevant
   * dims — both orders end with (xq, yq), so rows tied in the full sort
   * key are interchangeable for every reported stat. The single-partition
   * window is the report twin only; the write path is range-shuffled.
   */
  def skippingReport(df: DataFrame, xCol: String, yCol: String, bits: Int,
      nFiles: Int, bx0: Long, bx1: Long, by0: Long, by1: Long): DataFrame = {
    val stats = df.agg(max(col(xCol)).as("_mx"), max(col(yCol)).as("_my"))
    val q = df.crossJoin(broadcast(stats))
      .select(
        quantize(col(xCol), col("_mx"), bits).as("xq"),
        quantize(col(yCol), col("_my"), bits).as("yq"))
      .withColumn("zv", zValue2(col("xq"), col("yq"), bits))
    val inBox = (col("xq") >= bx0 && col("xq") <= bx1 &&
      col("yq") >= by0 && col("yq") <= by1).cast("long")
    def layout(name: String, order: Seq[Column]): DataFrame =
      q.withColumn("fid", ntile(nFiles).over(Window.orderBy(order: _*)))
        .groupBy("fid")
        .agg(count(lit(1)).as("n_rows"), sum(inBox).as("n_box"),
          min("xq").as("min_x"), max("xq").as("max_x"),
          min("yq").as("min_y"), max("yq").as("max_y"))
        .withColumn("skipped",
          (col("max_x") < bx0 || col("min_x") > bx1 ||
            col("max_y") < by0 || col("min_y") > by1).cast("long"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("skipped")).as("files_skipped"),
          sum(when(col("skipped") === 0L, col("n_rows")).otherwise(0L))
            .as("rows_scanned"),
          sum(col("n_box")).as("rows_matched"))
        .select(lit(name).as("layout"), col("n_files"), col("files_skipped"),
          col("rows_scanned"), col("rows_matched"))
    layout("zorder", Seq(col("zv"), col("xq"), col("yq")))
      .unionAll(layout("linear", Seq(col("xq"), col("yq"))))
  }
}
