package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Compaction / txn shaping (SURVEY.md §2.6 C2, C4, C3).
 *
 * tiflow's compactor buffers jobs per key and folds adjacent ops
 * (dm/syncer/compactor.go:29-230; fold rules pkg/sqlmodel/reduce.go:194-242).
 * Spark-first: within a (micro)batch this is ONE hash aggregation — for each
 * (table, key) take the first op, the last op, and the last after-image
 * (`min_by`/`max_by`, map-side combinable), then derive the net op:
 *
 *   first=I, last=D  → nothing (insert never became visible)
 *   last=D           → D
 *   first=I          → I  (insert, possibly updated since)
 *   first=D          → R  (delete then re-insert → safe REPLACE pair)
 *   otherwise        → U
 *
 * One shuffle on the group key; at 100 TB the partial aggregation collapses
 * most of the volume map-side because hot keys dominate CDC streams.
 */
object Compaction {

  /** Net-op derivation from (first op in batch, last op in batch). */
  def netOp(first: Column, last: Column): Column =
    when(first === "I" && last === "D", lit(null).cast("string"))
      .when(last === "D", "D")
      .when(first === "I", "I")
      .when(first === "D", "R")
      .otherwise("U")

  /**
   * C2 — compact a batch of envelope rows to net effects per key.
   * Expects post-updateSplit input (each row carries exactly one key in
   * `pk`). `min_by`/`max_by` arguments are made non-null (sentinel) so the
   * semantics match DuckDB's arg_min/arg_max in the oracle.
   */
  def compact(df: DataFrame,
              keyCols: Seq[String] = Seq("schema_name", "table_name", "pk"),
              seqCol: String = "seq"): DataFrame = {
    val s = col(seqCol)
    val grouped = df.groupBy(keyCols.map(col): _*).agg(
      min_by(col("op"), s).as("first_op"),
      max_by(col("op"), s).as("last_op"),
      max_by(coalesce(col("val_after"), lit(-1d)), s).as("last_val_raw"),
      max(s).as("last_seq"),
      max(col("commit_ts")).as("last_commit_ts"),
      count(lit(1)).as("n_events"))
    grouped
      .withColumn("net_op", netOp(col("first_op"), col("last_op")))
      .filter(col("net_op").isNotNull)
      .withColumn("final_val",
        when(col("net_op") === "D", lit(null).cast("double"))
          .otherwise(col("last_val_raw")))
      .drop("first_op", "last_op", "last_val_raw")
  }

  /** C4 — txn grouping: rows of one upstream txn share a commit_ts
    * (reference cdc/model/sink.go:1162-1174 SingleTableTxn). */
  def txnSizes(df: DataFrame): DataFrame =
    df.groupBy(col("commit_ts"), col("schema_name"), col("table_name"))
      .agg(count(lit(1)).as("txn_rows"))

  /**
   * C3 — multi-row statement batching: assign rows to bounded batches per
   * (table, op) in stream order; the JDBC sink turns each batch into one
   * multi-VALUES / multi-OR statement (reference
   * pkg/sqlmodel/multirow.go:79-274, caps pkg/sink/mysql/config.go:44-49).
   */
  val DefaultMaxTxnRow = 256
  def batchIds(df: DataFrame, maxRows: Int = DefaultMaxTxnRow): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("schema_name"), col("table_name"), col("op"))
      .orderBy(col("seq"))
    df.withColumn("batch_id", ((row_number().over(w) - 1) / maxRows).cast("long"))
  }

  /** One transaction's row count in commit order (input to
    * [[atomicBatchIds]]). */
  final case class TxnSize(schema_name: String, table_name: String,
      commit_ts: Long, n_rows: Long)

  /**
   * `transaction-atomicity = table` batching (reference pkg/config/
   * sink.go:103-112 `AtomicityLevel.ShouldSplitTxn` and the advancer's
   * no-split emit condition, cdc/processor/sinkmanager/
   * table_sink_advancer.go:332-344): when splitting is OFF, a batch may
   * only close at a TRANSACTION boundary — it accumulates whole txns and
   * closes once the committed size reaches the cap, so a batch can
   * overshoot `maxRows` to keep a txn intact (the `none` level is
   * [[batchIds]]' row-grain split). Greedy sequential fold per table:
   * corpus rows collapse to txn sizes first (one partial agg), then the
   * per-table fold runs distributed via `flatMapSortedGroups` — each
   * group's state is two longs, tables process in parallel, and the txn
   * table is corpus-rows/avg-txn-size smaller than the stream.
   * Returns (schema_name, table_name, commit_ts, n_rows, batch_id).
   */
  def atomicBatchIds(txns: DataFrame, maxRows: Long): DataFrame = {
    val spark = txns.sparkSession
    import spark.implicits._
    txns.select(col("schema_name"), col("table_name"),
        col("commit_ts").cast("long"), col("n_rows").cast("long"))
      .as[TxnSize]
      .groupByKey(t => (t.schema_name, t.table_name))
      .flatMapSortedGroups($"commit_ts") { case (_, it) =>
        var batch = 0L
        var acc = 0L
        it.map { t =>
          val out = (t.schema_name, t.table_name, t.commit_ts, t.n_rows, batch)
          acc += t.n_rows
          if (acc >= maxRows) { batch += 1; acc = 0 }
          out
        }
      }
      .toDF("schema_name", "table_name", "commit_ts", "n_rows", "batch_id")
  }
}
