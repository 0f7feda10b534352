package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension materialization from a change stream — the
 * warehouse-side HISTORY table a CDC consumer builds next to the
 * latest-state sink (reference capability class: K4/K7 materialization;
 * SCD Type 2 per the standard Kimball formulation): every INSERT/UPDATE
 * image opens a version row valid from its commit ts; the version closes
 * when the NEXT event for the same key commits (update supersedes,
 * delete terminates); the last version stays open (valid_to NULL,
 * is_current) unless a delete closed the chain.
 *
 * One window pass over the stream partitioned by key and ordered by
 * (commit ts, seq): `lead` supplies each version's close ts — no join,
 * no state loop; at 100 TB this is a single shuffle by key, and
 * incremental maintenance appends new versions + closes the previously
 * open one (the same lead algebra over (persisted open rows ∪ batch)).
 */
object Scd {

  /**
   * Type-2 history from an envelope: returns one row per surviving
   * version — keyCols, `valid_from`, `valid_to` (NULL while open),
   * `is_current` (open and not terminated), plus `valCols` image
   * columns. `opCol` must be I/U/D.
   */
  def type2(env: DataFrame, keyCols: Seq[String], tsCol: String,
            seqCol: String, opCol: String, valCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    env
      .withColumn("_next_ts", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .select(keyCols.map(col) ++
        Seq(col(tsCol).as("valid_from"), col("_next_ts").as("valid_to"),
          col("_next_ts").isNull.as("is_current")) ++
        valCols.map(col): _*)
  }

  /**
   * INCREMENTAL maintenance — the append path at scale: closed versions
   * are immutable and never re-read; only the OPEN rows (≤ one per live
   * key) replay as pseudo-insert events alongside the new batch, and
   * the same lead algebra re-derives their close ts. Keys untouched by
   * the batch keep their open row unchanged; `type2Increment(hist, b)`
   * equals `type2(full ∪ b)` row-for-row (Round10Spec pins it).
   *
   * At 100 TB: `hist` is the bucketed state table; the open slice is
   * O(live keys) and the batch is small — the union-window runs over
   * open ∪ batch only, one shuffle by key.
   *
   * PRECONDITION: batches arrive in commit order per key (every batch
   * event's ts ≥ its key's open valid_from). An out-of-order event that
   * belongs BETWEEN two already-closed versions would require rewriting
   * closed history — that is a redo/backfill (W4), not an append.
   */
  def type2Increment(hist: DataFrame, batch: DataFrame,
                     keyCols: Seq[String], tsCol: String, seqCol: String,
                     opCol: String, valCols: Seq[String]): DataFrame = {
    val closed = hist.filter(!col("is_current"))
    // open versions as pseudo events: op I at valid_from, seq −1 so a
    // same-ts batch event sorts after (supersedes) it
    val pseudo = hist.filter(col("is_current"))
      .select(keyCols.map(col) ++
        Seq(col("valid_from").as(tsCol), lit(-1L).as(seqCol),
          lit("I").as(opCol)) ++ valCols.map(col): _*)
    closed.unionByName(
      type2(pseudo.unionByName(
          batch.select(keyCols.map(col) ++ Seq(col(tsCol), col(seqCol),
            col(opCol)) ++ valCols.map(col): _*)),
        keyCols, tsCol, seqCol, opCol, valCols))
  }
  /**
   * Time-travel read over a Type-2 history: the table AS OF `atTs` is the
   * version row whose validity interval covers the instant —
   * `valid_from <= atTs < valid_to` (open versions cover everything from
   * valid_from on). Keys deleted before `atTs` simply have no covering
   * version. A map-only filter over the history — at 100 TB the history
   * is the partitioned/bucketed state table and snapshot reads prune to
   * the covering slice.
   */
  def asOf(hist: DataFrame, atTs: Long): DataFrame =
    hist.filter(col("valid_from") <= atTs &&
      (col("valid_to").isNull || col("valid_to") > atTs))
}
