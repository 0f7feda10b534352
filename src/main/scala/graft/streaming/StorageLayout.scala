package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * K4 — the cloud-storage sink's CANONICAL path contract (reference
 * pkg/sink/cloudstorage/path.go:113-460): a data file lives at
 * `<schema>/<table>/<tableVersion>[/<date>]/CDC%0{w}d<ext>` — the date
 * segment formatted per the `date-separator` config (none / year /
 * month / day, path.go:273-291), the file counter zero-padded to
 * `file-index-width` and scoped per (table-version, date) so a date
 * roll RESETS it (path.go:330-354), and each data dir carrying
 * `meta/CDC.index` whose content is the LAST data file name — the
 * consumer's resume cursor (path.go:46,296).
 *
 * The reference assigns indices imperatively per flush; re-expressed as
 * a batch plan the same contract is a rank over the write-partition
 * grain: rows order by (commit_ts, seq) within (schema, table, version,
 * date) and chunk into files of `rowsPerFile`. That window partitions
 * exactly on the physical write unit — per table-version-date, the
 * natural parallel grain of the sink at any scale — so no global sort
 * or single-partition window ever forms.
 */
object StorageLayout {

  /** Date segment per the date-separator config; empty for "none".
    * `epochSeconds` is the flush wall-clock (the reference reads its pd
    * clock; a batch twin derives it from the commit ts). */
  def dateStr(epochSeconds: Column, dateSeparator: String): Column =
    dateSeparator match {
      case "year"  => date_format(timestamp_seconds(epochSeconds), "yyyy")
      case "month" => date_format(timestamp_seconds(epochSeconds), "yyyy-MM")
      case "day"   => date_format(timestamp_seconds(epochSeconds), "yyyy-MM-dd")
      case "none"  => lit("")
      case other => throw new IllegalArgumentException(
        s"unknown date-separator: $other")
    }

  /** `CDC%0{width}d<ext>` (path.go:113-116). */
  def dataFileName(idx: Column, width: Int, ext: String): Column =
    concat(lit("CDC"), lpad(idx.cast("string"), width, "0"), lit(ext))

  /** `<schema>/<table>/<version>[/<date>]` (path.go:313-330; the empty
    * date of separator "none" contributes no segment). */
  def dataDir(schema: Column, table: Column, version: Column,
              date: Column): Column =
    when(date === "", concat_ws("/", schema, table, version))
      .otherwise(concat_ws("/", schema, table, version, date))

  /** Per-row file assignment over the event stream: every row gets its
    * data dir, file name, and full path. `rowsPerFile` models the flush
    * granularity deterministically. */
  def filePlan(events: DataFrame, version: Column, epochSeconds: Column,
               dateSeparator: String,
               fileIndexWidth: Int = 6, extension: String = ".csv",
               rowsPerFile: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("schema_name"), col("table_name"),
        col("_sv"), col("_date"))
      .orderBy(col("commit_ts"), col("seq"))
    events
      .withColumn("_sv", version)
      .withColumn("_date", dateStr(epochSeconds, dateSeparator))
      .withColumn("_rn", row_number().over(w))
      .withColumn("file_idx",
        (floor((col("_rn") - 1) / rowsPerFile) + 1).cast("long"))
      .withColumn("data_dir",
        dataDir(col("schema_name"), col("table_name"),
          col("_sv").cast("string"), col("_date")))
      .withColumn("file_name",
        dataFileName(col("file_idx"), fileIndexWidth, extension))
      .withColumn("data_path",
        concat_ws("/", col("data_dir"), col("file_name")))
      .drop("_rn")
  }

  /** One row per data dir: the `meta/CDC.index` path and its content —
    * the LAST data file name in that dir (the consumer resume cursor). */
  def indexFiles(plan: DataFrame, fileIndexWidth: Int = 6,
                 extension: String = ".csv"): DataFrame =
    plan.groupBy("data_dir")
      .agg(max(col("file_idx")).as("last_idx"))
      .select(col("data_dir"),
        concat_ws("/", col("data_dir"), lit("meta/CDC.index")).as("index_path"),
        dataFileName(col("last_idx"), fileIndexWidth, extension)
          .as("index_content"))

  /** Schema sidecar path `meta/schema_{version}_{checksum:010d}.json`
    * (path.go:49,216) with the reference's crc32-of-definition checksum. */
  def schemaFilePath(schema: Column, table: Column, version: Column,
                     schemaJson: Column): Column =
    concat_ws("/", schema, table, lit("meta"),
      concat(lit("schema_"), version.cast("string"), lit("_"),
        lpad(crc32(schemaJson.cast("binary")).cast("string"), 10, "0"),
        lit(".json")))
}
