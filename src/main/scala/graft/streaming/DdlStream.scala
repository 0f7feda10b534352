package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{DdlParser, SchemaRegistry}

/**
 * G1/S4/K6 — textual DDL in the CHANGE STREAM: the reference multiplexes
 * DDL query events into the same stream as row events and applies each to
 * its schema tracker at its commit ts (dm/syncer/ddl.go HandleQueryEvent;
 * cdc DDL puller). Here DDL rows ride the envelope with `op = "G"` and the
 * SQL text in `etype`; each microbatch peels them off, folds them into a
 * PERSISTENT registry (survives restarts, replay-idempotent), and binds
 * the batch's data rows to the schema version in force at their ts.
 */
object DdlStream {

  /** Envelope op marking a DDL control row (SQL text in `etype`). */
  val DdlOp = "G"

  private def logPath(registryDir: String) = Paths.get(s"$registryDir/ddls.log")

  /** Applied (ts, sql) log — tab-separated with URL-encoded SQL so any
    * statement text round-trips on one line. */
  def loadApplied(registryDir: String): Seq[(String, Long)] = {
    val p = logPath(registryDir)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p).toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map { l =>
      val Array(ts, sql) = l.split("\t", 2)
      (java.net.URLDecoder.decode(sql, "UTF-8"), ts.toLong)
    }
  }

  private def append(registryDir: String, ddls: Seq[(String, Long)]): Unit = {
    Files.createDirectories(Paths.get(registryDir))
    val body = ddls.map { case (sql, ts) =>
      s"$ts\t${java.net.URLEncoder.encode(sql, "UTF-8")}"
    }.mkString("", "\n", "\n")
    Files.writeString(logPath(registryDir), body,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Current table versions from the whole applied-DDL history. */
  def versions(registryDir: String,
               defaultSchema: String = ""): Seq[SchemaRegistry.TableVersion] =
    DdlParser.applyToRegistry(Nil, loadApplied(registryDir), defaultSchema)

  /**
   * Wrap a sink so each microbatch first applies its DDL control rows,
   * then delivers data rows bound to their schema version. Batch replays
   * re-apply nothing (the (ts, sql) pair set is the idempotence key, the
   * same way the reference skips already-synced DDL locations).
   */
  /**
   * G5 — DDL barrier algebra (batch twin of the foreachBatch
   * control-before-rows ordering; reference cdc/owner/ddl_manager +
   * barrier ts in cdc/processor): a DDL at ts T applies after every row
   * with commit_ts < T and before every row with commit_ts >= T, so each
   * row belongs to exactly one schema EPOCH — the count of its table's
   * DDLs at or below its commit ts — and `barrier_ts` (the epoch's
   * opening DDL ts, 0 for the initial epoch) is a lower bound on every
   * row ts in the epoch.
   *
   * Scale shape: the DDL set is control-plane data (collected, sorted,
   * folded into a literal per-table array), so epoch assignment is a pure
   * map-only column expression over the row stream — no join, no shuffle;
   * the arrays are a handful of longs so the interpreted higher-order
   * filter is negligible.
   */
  def barrierEpochs(rows: DataFrame, ddls: DataFrame): DataFrame = {
    val byTable: Map[String, Seq[Long]] = ddls.select("table_name", "ddl_ts")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq.sorted).toMap
    val emptyArr = array().cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false))
    // flat map-literal lookup — a per-table when() chain would nest one
    // CaseWhen PER TABLE and blow analysis/codegen on a changefeed with
    // thousands of tables
    val sorted = byTable.toSeq.sortBy(_._1)
    val tsArr =
      if (sorted.isEmpty) emptyArr
      else coalesce(element_at(
        map(sorted.flatMap { case (t, tss) =>
          Seq(lit(t), array(tss.map(lit): _*))
        }: _*), col("table_name")), emptyArr)
    val passed = filter(tsArr, ts => ts <= col("commit_ts"))
    rows
      .withColumn("epoch", size(passed).cast("long"))
      .withColumn("barrier_ts", coalesce(array_max(passed), lit(0L)))
  }

  /** Apply a batch's DDL control rows to the registry, idempotently (the
    * (ts, sql) pair set is the idempotence key — batch replays re-apply
    * nothing). Control-plane sized driver collect. */
  def applyDdlRows(batch: DataFrame, registryDir: String): Unit = {
    if (!batch.columns.contains("op")) return
    val ddlRows = batch.filter(col("op") === DdlOp)
      .select(col("etype"), col("commit_ts"))
      .collect() // control-plane sized: a handful of DDLs per batch
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    applyCollected(ddlRows, registryDir)
  }

  /** The apply step over an already-collected (sql, ts) batch — callers
    * that collected the control rows for another purpose (the owner
    * barrier) reuse them, and pass the applied set when they already
    * read it, instead of re-running the collect and the log read. */
  def applyCollected(pairs: Seq[(String, Long)], registryDir: String,
                     seen0: Option[Set[(String, Long)]] = None): Unit = {
    val seen = seen0.getOrElse(loadApplied(registryDir).toSet)
    val fresh = pairs.filterNot(seen.contains).distinct
    if (fresh.nonEmpty) append(registryDir, fresh.sortBy(_._2))
  }

  def withTextDdl(spark: SparkSession, registryDir: String,
                  defaultSchema: String = "")
                 (sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      // compacted batches carry net_op and no control rows — DDL rows only
      // exist pre-compaction in the raw envelope
      val hasOp = batch.columns.contains("op")
      applyDdlRows(batch, registryDir)
      val vs = versions(registryDir, defaultSchema)
      val data = if (hasOp) batch.filter(col("op") =!= DdlOp) else batch
      val bound =
        if (vs.isEmpty) data.withColumn("schema_version", lit(null).cast("int"))
        else {
          // post-compaction batches carry last_commit_ts; bind on whichever
          // event-time column the batch has
          val withTs =
            if (data.columns.contains("commit_ts")) data
            else data.withColumn("commit_ts", col("last_commit_ts"))
          val b = SchemaRegistry.bindSchemaVersion(withTs,
            SchemaRegistry.versionIntervals(spark, vs))
          if (data.columns.contains("commit_ts")) b else b.drop("commit_ts")
        }
      sink(bound, batchId)
  }
}
