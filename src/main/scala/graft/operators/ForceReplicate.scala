package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Force-replicate: replication of tables WITHOUT any primary or unique
 * key (reference `force-replicate` config — cdc/sink/dmlsink/txn/mysql/
 * dml.go:158-181 `whereSlice`: "if no explicit row id but force
 * replicate, use all key-values in where condition", plus the ` LIMIT 1`
 * suffix on prepareDelete/prepareUpdate at dml.go:69,153; DM renders the
 * same all-column WHERE for no-PK tables).
 *
 * Without a key, row identity is the ENTIRE row and downstream state is a
 * MULTISET: INSERT adds one instance of a row-value, DELETE ... LIMIT 1
 * removes one instance (a no-op when none exists), and an UPDATE must
 * always split into DELETE(old image) + INSERT(new image) — there is no
 * key to update in place. NULL columns compare with `IS NULL` in the
 * WHERE (dml.go:62-67,146-151).
 *
 * Scale shape: the multiset fold is ONE exchange on the row-value and a
 * per-value ordered prefix scan — no driver loop, no global sort; SQL
 * rendering is map-only column expressions.
 */
object ForceReplicate {

  /**
   * Multiset apply algebra, per distinct row-value: given post-split
   * events (`op` ∈ {I, D}) ordered by `orderCol` within each value,
   *   net     = #inserts − #deletes (the stream's algebraic sum), and
   *   applied = net − min(0, min prefix sum) — the state an engine that
   * executes `DELETE … LIMIT 1` sequentially actually reaches: a delete
   * arriving while no instance exists is a no-op, which lifts the final
   * count by exactly the depth the prefix sum dipped below zero.
   * NULL-valued columns group as one value (SQL window PARTITION BY /
   * GROUP BY null semantics, identical in Spark and the oracle).
   */
  def multisetApply(events: DataFrame, valueCols: Seq[String],
                    orderCol: Column): DataFrame = {
    val grp = valueCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_delta", when(col("op") === "I", 1L).otherwise(-1L))
      .withColumn("_prefix", sum(col("_delta")).over(w))
      .groupBy(grp: _*)
      .agg(
        sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_ins"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_del"),
        sum(col("_delta")).as("net"),
        (sum(col("_delta")) - least(min(col("_prefix")), lit(0L))).as("applied"))
  }

  /** A field to render: (column name, raw value column — drives the
    * IS NULL / NULL forms — and its engine-portable SQL-literal rendering,
    * e.g. quoted strings, plain ints; the caller controls rendering like
    * [[graft.diff.ChunkDiff.fixSql]]). */
  type Field = (String, Column, Column)

  /** All-column WHERE clause: `` `c` = lit `` per column, `` `c` IS NULL ``
    * for null values — whereSlice's force-replicate branch. */
  def whereAllColumns(fields: Seq[Field]): Column =
    concat_ws(" AND ", fields.map { case (n, raw, litc) =>
      when(raw.isNull, lit(s"`$n` IS NULL"))
        .otherwise(concat(lit(s"`$n` = "), litc))
    }: _*)

  /** `DELETE FROM t WHERE <all columns> LIMIT 1;` (prepareDelete). */
  def deleteSql(table: String, fields: Seq[Field]): Column =
    concat(lit(s"DELETE FROM $table WHERE "), whereAllColumns(fields),
      lit(" LIMIT 1;"))

  /** `INSERT INTO t (cols…) VALUES (lits…);` — the insert leg of a split
    * update or a plain insert (prepareReplace without key semantics). */
  def insertSql(table: String, fields: Seq[Field]): Column = {
    val names = fields.map { case (n, _, _) => s"`$n`" }.mkString(", ")
    concat(lit(s"INSERT INTO $table ($names) VALUES ("),
      concat_ws(", ", fields.map { case (_, raw, litc) =>
        when(raw.isNull, lit("NULL")).otherwise(litc)
      }: _*),
      lit(");"))
  }
}
