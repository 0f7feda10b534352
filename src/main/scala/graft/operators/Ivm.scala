package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Incremental VIEW maintenance for aggregations — keep a grouped
 * (count, sum) materialization current under a CDC changelog WITHOUT
 * re-reading the base table: the warehouse consumer of the whole
 * F/C/R envelope pipeline. At 100 TB the full groupBy re-run is the
 * cost of scanning the fact table; the incremental path touches only
 * the delta (|changelog| rows) plus the state (|groups| rows):
 *
 *   state(T1) = fold(state(T0) ⊎ Δ(changelog))
 *
 * where Δ maps insert → (+1, +v), delete → (−1, −v), in-place update →
 * (0, after − before), and the fold is one union + partial-agg shuffle
 * bounded by |groups| + |Δgroups|. Count/sum (and anything mergeable:
 * min of inserts-only feeds, the q186 centroid states, the q164
 * histogram bins) maintain exactly; non-mergeable aggs (median, distinct
 * without a sketch) need their own state — that's the published IVM
 * boundary, documented here rather than papered over.
 *
 * Key-changing updates must arrive pre-split as delete+insert pairs —
 * exactly what the C1 update-split operator (`Transforms.splitUpdates`)
 * emits; in-place updates may stay whole. Values are exact DECIMAL, so
 * maintained state is bit-equal to a from-scratch rebuild (the gate
 * pins that against the oracle's full recompute).
 */
object Ivm {

  private val V = DecimalType(18, 2)

  /** Full state build: (keys..., cnt, sum_v) off the base table. */
  def aggState(df: DataFrame, keyCols: Seq[String], valueCol: String)
  : DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(V)).as("sum_v"))

  /**
   * Signed delta off a changelog with columns `op` ('i'/'d'/'u'),
   * the group keys, `val_before`, `val_after` (null on the absent side).
   */
  def deltaState(changelog: DataFrame, keyCols: Seq[String]): DataFrame =
    changelog.groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(col("op") === "i", 1L).when(col("op") === "d", -1L)
          .otherwise(0L)).as("cnt"),
        sum(coalesce(col("val_after").cast(V), lit(0).cast(V)) -
          coalesce(col("val_before").cast(V), lit(0).cast(V))).as("sum_v"))

  /** Fold a delta into a state: union + one partial-agg shuffle; groups
    * whose count reaches zero vanish (as they would in a rebuild). */
  def applyDelta(state: DataFrame, delta: DataFrame, keyCols: Seq[String])
  : DataFrame =
    state.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_v")).as("sum_v"))
      .filter(col("cnt") > 0)
}
