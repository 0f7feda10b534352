package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Conditional MERGE (the warehouse `MERGE INTO` / Delta-style upsert):
 * apply a source batch to a target snapshot with guarded clauses —
 *
 *   WHEN MATCHED AND deleteCond  THEN DELETE
 *   WHEN MATCHED AND updateCond  THEN UPDATE (take the source row)
 *   WHEN MATCHED                 THEN keep the target row
 *   WHEN NOT MATCHED AND insertCond THEN INSERT
 *
 * — clause order is first-match-wins, exactly the published MERGE
 * semantics. The conditional update guard (`s.version > t.version`,
 * `s.updated_at > t.updated_at`) is what makes out-of-order CDC apply
 * safe: a stale source row falls through to "keep target" instead of
 * regressing the snapshot. This generalizes the unconditional
 * last-write-wins apply of the K1/W4 paths (Sinks/Redo) to guarded
 * clauses.
 *
 * Shape: ONE full-outer shuffle join on the key (AQE-skew-safe,
 * broadcastable when the batch is small) and a per-row CASE over the two
 * row structs; no window, no second pass. Duplicate source keys must be
 * pre-compacted to net effects (C2 `Compaction.compact`) — MERGE
 * semantics require a deterministic single source row per key, and the
 * operator asserts nothing about which duplicate wins otherwise.
 *
 * Conditions reference the two sides as struct columns `t` and `s`
 * (e.g. `col("s.o_totalprice") > col("t.o_totalprice")`); both sides
 * must share the target schema.
 */
object Merge {

  def merge(target: DataFrame, source: DataFrame, keyCols: Seq[String],
      updateCond: Column, deleteCond: Column, insertCond: Column): DataFrame = {
    require(target.columns.sameElements(source.columns),
      s"schema mismatch: ${target.columns.toSeq} vs ${source.columns.toSeq}")
    val dataCols = target.columns.toSeq
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val t = target.select(struct(dataCols.map(col): _*).as("t"),
      struct(keyCols.map(col): _*).as("tk"))
    val s = source.select(struct(dataCols.map(col): _*).as("s"),
      struct(keyCols.map(col): _*).as("sk"))
    val joined = t.join(s, col("tk") === col("sk"), "full_outer")
    val picked = joined.select(
      when(col("s").isNull, col("t"))                        // target-only
        .when(col("t").isNull,
          when(insertCond, col("s")).otherwise(lit(null)))   // source-only
        .when(deleteCond, lit(null))                         // matched+del
        .when(updateCond, col("s"))                          // matched+upd
        .otherwise(col("t"))                                 // matched+keep
        .as("r"))
    picked.filter(col("r").isNotNull).select(col("r.*"))
  }
}
