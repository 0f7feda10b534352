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
}
