package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: resample an irregular event stream onto a
 * fixed grid with forward-fill — the feature-store / monitoring shape
 * downstream of every CDC landing zone ("the last observed value of X,
 * every N minutes, gaps carried forward"). Spark has no native ASOF
 * resample; composing it wrong (a per-bucket range join against all
 * events) is quadratic. This is the linear composition:
 *
 *  1. bucket actuals: one hash-agg shuffle keyed (key, bucket) picking
 *     the LAST observation per bucket (max (ts, id) — deterministic);
 *  2. dense grid: distinct keys × `sequence(start, end, step)` exploded
 *     — generated, never stored;
 *  3. left-join grid to bucket-lasts (broadcast: |keys·buckets| rows ≪
 *     events) and carry forward with `last(_, ignoreNulls) OVER
 *     (PARTITION BY key ORDER BY bucket)` — one window pass.
 *
 * Values pass through untouched (selection, not arithmetic), so doubles
 * stay bit-exact cross-engine; buckets before a key's first observation
 * keep NULL (no value existed to carry).
 */
object Timeseries {

  /**
   * Per key and `stepUs` bucket in `[startUs, endUs)`: `v_fill` = last
   * observed value at or before the bucket's end, `is_gap` = 1 when the
   * bucket itself had no observation. `tsCol` µs, `idCol` breaks
   * same-instant ties (larger id wins, the CDC commit-order rule).
   */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, stepUs: Long, startUs: Long,
      endUs: Long): DataFrame = {
    require(stepUs > 0 && endUs > startUs, s"grid: [$startUs,$endUs) @$stepUs")
    val lastBucket = (endUs - 1 - startUs) / stepUs
    val inRange = df.filter(col(tsCol) >= startUs && col(tsCol) < endUs)
    val w = Window.partitionBy(col(keyCol), col("_bucket"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val actual = inRange
      .withColumn("_bucket", (col(tsCol) - startUs).divLongBy(stepUs))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(keyCol).as("k"), col("_bucket").as("b"),
        col(valueCol).as("v"))
    val grid = df.select(col(keyCol).as("k")).distinct()
      .select(col("k"),
        explode(sequence(lit(0L), lit(lastBucket))).as("b"))
    val ff = Window.partitionBy(col("k")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(actual, Seq("k", "b"), "left")
      .select(col("k"), (col("b") * stepUs + startUs).as("bucket_us"),
        last(col("v"), ignoreNulls = true).over(ff).as("v_fill"),
        when(col("v").isNull, 1L).otherwise(0L).as("is_gap"))
  }

  private implicit final class DivOps(private val c: Column) {
    def divLongBy(d: Long): Column = graft.core.Exact.divLong(c, d)
  }
}
