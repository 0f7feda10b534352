package graft.diff

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * sync_diff report assembly — the user-facing artifact of the diff run
 * (reference sync_diff_inspector/report/report.go): per-table
 * `TableResult` rows (struct-equal, data-equal, chunk add/delete
 * totals, up/down row counts) and the `CommitSummary` roll-up
 * (pass/failed/skipped table counts + the overall pass|fail verdict).
 *
 * Table classification (CommitSummary:175-187):
 *   pass     — struct equal AND data equal;
 *   skipped  — the table is missing on one side
 *              (!AllTableExist(TableLack), table_diff.go:82-93);
 *   fail     — everything else (struct or data differs, both sides
 *              present).
 * The overall result (refreshResultLocked:445-459, no-error path) is
 * `fail` iff ANY both-sides-present table differs in struct or data —
 * lack-tables alone leave it `pass` (they surface through skipped_num,
 * exactly like SetTableDataCheckResult:349-353 which only flips Fail
 * under AllTableExist). The `error` state (MeetError) is a live-SQL
 * failure channel with no counterpart in a deterministic replay.
 *
 * Per-table data columns mirror getDiffRows:128-157: the check column is
 * 'skipped' for lack-tables else 'succeed', struct equality renders as
 * a bool, and the data diff renders as `+rowsAdd/-rowsDelete` summed
 * over the table's failing chunks (ChunkResult accumulation,
 * SetTableDataCheckResult:331-355 — a `different` row counts in BOTH,
 * per compareRows' update branch diff.go:762-768).
 *
 * Scale shape (100 TB): inputs are per-CHUNK facts (control-plane-sized
 * — thousands of chunks, not rows); the assembly is one partial-agg
 * groupBy on the table key plus one broadcast of the one-row summary.
 */
object DiffReport {

  /** table_diff.go:82-93. */
  val AllTableExistFlag = 0
  val DownstreamTableLackFlag = -1
  val UpstreamTableLackFlag = 1

  /**
   * Per-table TableResult rows. `structFacts`: one row per table —
   * (schema_name, table_name, struct_equal: boolean, data_skip: boolean,
   * table_lack: int). `chunkFacts`: one row per compared chunk —
   * (schema_name, table_name, chunk_id, chunk_equal: boolean, rows_add,
   * rows_delete, up_count, down_count); tables whose data check never
   * ran (struct mismatch with skip) simply have no chunk rows and keep
   * DataEqual = true like the initialized TableResult (report.go:307-315).
   */
  def tableResults(structFacts: DataFrame, chunkFacts: DataFrame): DataFrame = {
    val keys = Seq("schema_name", "table_name")
    val agg = chunkFacts.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("chunks_compared"),
      sum(when(col("chunk_equal"), 0L).otherwise(1L)).as("failed_chunks"),
      sum("rows_add").as("rows_add"),
      sum("rows_delete").as("rows_delete"),
      sum("up_count").as("up_count"),
      sum("down_count").as("down_count"))
    structFacts.join(agg, keys, "left")
      .na.fill(0L, Seq("chunks_compared", "failed_chunks", "rows_add",
        "rows_delete", "up_count", "down_count"))
      .withColumn("data_equal", col("failed_chunks") === 0L)
      .withColumn("state",
        when(col("struct_equal") && col("data_equal"), "pass")
          .when(col("table_lack") =!= AllTableExistFlag, "skipped")
          .otherwise("fail"))
      .withColumn("check_status",
        when(col("table_lack") =!= AllTableExistFlag, "skipped")
          .otherwise("succeed"))
      .withColumn("data_diff", concat(lit("+"), col("rows_add"),
        lit("/-"), col("rows_delete")))
  }

  /**
   * Table-matching gate (source.go checkTableMatched:442-476) — where
   * the lack flags COME FROM: WITHOUT `skip-non-existing-table`, a
   * table present on only one side ABORTS the whole diff (the reference
   * returns an error before any comparison runs); WITH the flag,
   * target-only tables mark UpstreamTableLack (unless a lack flag is
   * already set) and source-only tables are APPENDED to the work list
   * with DownstreamTableLack — they then surface as `skipped` in the
   * report. Control-plane-sized (table lists, not rows).
   */
  def checkTableMatched(
      configured: Seq[(String, String, Int)],
      sourceTables: Set[(String, String)],
      targetTables: Set[(String, String)],
      skipNonExistingTable: Boolean): Seq[(String, String, Int)] = {
    val byName = configured.map(t => (t._1, t._2)).zipWithIndex.toMap
    val out = configured.toBuffer
    for (t <- targetTables.toSeq.sorted if !sourceTables(t)) {
      if (!skipNonExistingTable) throw new IllegalStateException(
        s"the source has no table to be compared. target-table is `${t._1}`.`${t._2}`")
      val i = byName(t)
      if (out(i)._3 == AllTableExistFlag)
        out(i) = (t._1, t._2, UpstreamTableLackFlag)
    }
    for (t <- sourceTables.toSeq.sorted if !targetTables(t)) {
      if (!skipNonExistingTable) throw new IllegalStateException(
        s"the target has no table to be compared. source-table is `${t._1}`.`${t._2}`")
      out += ((t._1, t._2, DownstreamTableLackFlag))
    }
    out.toSeq
  }

  /**
   * The check-mode switch (main.go:115-140): `check-struct-only` runs
   * StructEqual but never Equal — no chunk facts exist, so every
   * struct-equal table passes regardless of data; `check-data-only`
   * (experimental) skips StructEqual — the report keeps the INITIALIZED
   * struct state (StructEqual = true, report.go:310) and, notably, the
   * table-lack flag is never reported either (it only reaches the report
   * through SetTableStructCheckResult:322-324), so a lack-table's
   * failing Empty-chunk data check counts as a FAIL, not skipped — a
   * rough edge of the experimental flag modeled faithfully.
   */
  def applyCheckMode(mode: String, structFacts: DataFrame,
      chunkFacts: DataFrame): (DataFrame, DataFrame) = mode match {
    case "both" => (structFacts, chunkFacts)
    case "struct-only" => (structFacts, chunkFacts.limit(0))
    case "data-only" => (structFacts
        .withColumn("struct_equal", lit(true))
        .withColumn("data_skip", lit(false))
        .withColumn("table_lack", lit(AllTableExistFlag)), chunkFacts)
    case other => throw new IllegalArgumentException(s"check mode: $other")
  }

  /** One table's summary facts for [[printSummary]] — the fields
    * Report.Print reads per TableResult. */
  final case class TableSummary(schema: String, table: String,
      structEqual: Boolean, dataEqual: Boolean, dataSkip: Boolean,
      tableLack: Int)

  /** dbutil.TableName: backquoted `schema`.`table`, backticks doubled. */
  def tableName(schema: String, table: String): String = {
    def q(s: String) = "`" + s.replace("`", "``") + "`"
    q(schema) + "." + q(table)
  }

  /**
   * Report.Print (report.go:240-295), byte-for-byte on the no-error
   * paths: the all-equal summary, or the per-table prose — struct
   * mismatch splits by DataSkip and the lack flags, data mismatch only
   * reports for all-exist tables — followed by the totals line and the
   * patch-file/log pointers. The reference iterates Go maps (order
   * varies run to run); the replay iterates tables sorted by
   * (schema, table) so the bytes are deterministic.
   */
  def printSummary(tables: Seq[TableSummary], outputDir: String,
      fixDir: String, logFileName: String = "sync_diff.log"): String = {
    val passNum = tables.count(t => t.structEqual && t.dataEqual)
    val skippedNum = tables.count(t =>
      !(t.structEqual && t.dataEqual) && t.tableLack != AllTableExistFlag)
    val failedNum = tables.size - passNum - skippedNum
    val sb = new StringBuilder
    if (failedNum == 0 && skippedNum == 0) {
      sb ++= s"A total of ${tables.size} table have been compared and all are equal.\n"
      sb ++= s"You can view the comparison details through '$outputDir/$logFileName'\n"
    } else {
      for (t <- tables.sortBy(t => (t.schema, t.table))) {
        val name = tableName(t.schema, t.table)
        if (!t.structEqual) {
          if (t.dataSkip) t.tableLack match {
            case UpstreamTableLackFlag =>
              sb ++= s"The data of $name does not exist in upstream database\n"
            case DownstreamTableLackFlag =>
              sb ++= s"The data of $name does not exist in downstream database\n"
            case _ =>
              sb ++= s"The structure of $name is not equal, and data-check is skipped\n"
          }
          else sb ++= s"The structure of $name is not equal\n"
        }
        if (!t.dataEqual && t.tableLack == AllTableExistFlag)
          sb ++= s"The data of $name is not equal\n"
      }
      sb ++= "\n"
      sb ++= "The rest of tables are all equal.\n"
      sb ++= "\n"
      sb ++= s"A total of ${tables.size} tables have been compared, $passNum tables finished, $failedNum tables failed, $skippedNum tables skipped.\n"
      sb ++= s"The patch file has been generated in \n\t'$fixDir/'\n"
      sb ++= s"You can view the comparison details through '$outputDir/$logFileName'\n"
    }
    sb.toString
  }

  /** CommitSummary + refreshResult: appends result / pass_num /
    * failed_num / skipped_num (identical on every row — the one-row
    * summary broadcasts back onto the table rows). */
  def withSummary(results: DataFrame): DataFrame = {
    val summary = results.agg(
      sum(when(col("state") === "pass", 1L).otherwise(0L)).as("pass_num"),
      sum(when(col("state") === "fail", 1L).otherwise(0L)).as("failed_num"),
      sum(when(col("state") === "skipped", 1L).otherwise(0L))
        .as("skipped_num"),
      max(when(col("table_lack") === AllTableExistFlag &&
          !(col("struct_equal") && col("data_equal")), 1L).otherwise(0L))
        .as("any_fail"))
      .withColumn("result",
        when(col("any_fail") === 1L, "fail").otherwise("pass"))
      .drop("any_fail")
    results.crossJoin(broadcast(summary))
  }
}
