package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The CDC envelope (SURVEY.md §1.4) — our Spark-native analog of tiflow's
 * `RowChangedEvent` (reference: cdc/model/sink.go:347-391). An event is one
 * flat row:
 *
 *   seq         long    global capture order (tie-break inside a txn)
 *   op          string  "I" | "U" | "D"
 *   commit_ts   long    txn commit timestamp (watermark column)
 *   start_ts    long    txn start timestamp
 *   source_id   int     upstream cluster id (BDR filtering, W7)
 *   schema_name string  source database
 *   table_name  string  source table
 *   pk          long    primary-key value of the BEFORE image
 *   pk_after    long    primary-key value of the AFTER image (differs from
 *                       `pk` only for key-churn updates — drives C1 split)
 *   val_before  double  old image payload (null for I)
 *   val_after   double  new image payload (null for D)
 *   etype       string  payload attribute used by filters
 *
 * tiflow keeps before/after images as `Columns`/`PreColumns` arrays decoded
 * against a per-commit-ts schema snapshot (cdc/entry/mounter.go:634-770);
 * in Spark the images are plain columns/structs and Catalyst handles
 * projection/pruning natively.
 *
 * `derive` materializes a deterministic change stream from the `events`
 * table so that batch correctness gates can replay the exact same stream in
 * the DuckDB oracle (`sqlCte` below is the dialect-portable twin — keep the
 * two in lockstep).
 */
object CdcStream {

  /** Deterministic CDC stream derived from the events table. */
  def derive(events: DataFrame): DataFrame = {
    val e = events
    val opMod = col("event_id") % 10
    val op = when(opMod < 6, "I").when(opMod < 9, "U").otherwise("D")
    val commitTs = lit(1000000L) + expr("event_id DIV 4")
    val basePk = col("user_id") * 10 + col("event_id") % 10
    val churn = (opMod >= 6) && (opMod <= 8) && (col("event_id") % 20 === 6)
    e.select(
      col("event_id").as("seq"),
      op.as("op"),
      commitTs.as("commit_ts"),
      (commitTs - 1 - col("event_id") % 3).as("start_ts"),
      (col("event_id") % 3).cast("int").as("source_id"),
      concat(lit("db_"), (col("user_id") % 2).cast("string")).as("schema_name"),
      concat(lit("tbl_"), (col("user_id") % 4).cast("string")).as("table_name"),
      basePk.as("pk"),
      (basePk + when(churn, 1L).otherwise(0L)).as("pk_after"),
      when(opMod < 6, lit(null).cast("double")).otherwise(col("value")).as("val_before"),
      when(opMod === 9, lit(null).cast("double")).otherwise(col("value")).as("val_after"),
      col("event_type").as("etype"))
  }

  def derive(spark: SparkSession, dir: String): DataFrame =
    derive(Tables.load(spark, dir, "events"))

  /**
   * DuckDB twin of [[derive]] as a CTE named `cdc`, for oracle SQL.
   * Every arithmetic step must be bit-identical between engines: integer
   * div/mod only, no floats, no engine hash functions.
   */
  val sqlCte: String =
    """WITH cdc AS (
      |  SELECT
      |    event_id AS seq,
      |    CASE WHEN event_id % 10 < 6 THEN 'I'
      |         WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
      |    1000000 + event_id // 4 AS commit_ts,
      |    1000000 + event_id // 4 - 1 - (event_id % 3) AS start_ts,
      |    CAST(event_id % 3 AS INT) AS source_id,
      |    'db_' || CAST(user_id % 2 AS VARCHAR) AS schema_name,
      |    'tbl_' || CAST(user_id % 4 AS VARCHAR) AS table_name,
      |    user_id * 10 + event_id % 10 AS pk,
      |    user_id * 10 + event_id % 10 +
      |      CASE WHEN event_id % 10 BETWEEN 6 AND 8 AND event_id % 20 = 6
      |           THEN 1 ELSE 0 END AS pk_after,
      |    CASE WHEN event_id % 10 < 6 THEN NULL ELSE value END AS val_before,
      |    CASE WHEN event_id % 10 = 9 THEN NULL ELSE value END AS val_after,
      |    event_type AS etype
      |  FROM events
      |)""".stripMargin
}
