package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators._

/**
 * Changefeed runtime (SURVEY.md §2.14, §3.1): a changefeed = one Structured
 * Streaming query. tiflow's owner/processor/scheduler machinery
 * (cdc/owner/changefeed.go, cdc/processor/processor.go) maps onto Spark's
 * driver/executor scheduling; etcd state maps onto the streaming
 * checkpoint; pause/resume = stop/start from checkpoint.
 *
 * The transform pipeline is declared ONCE on the streaming DataFrame —
 * Catalyst optimizes the whole chain (filter pushdown through the router
 * projection etc.) and every microbatch executes the optimized plan.
 */
final case class ChangefeedSpec(
    id: String,
    tableRules: Seq[Filters.TableRule] = Seq(Filters.TableRule("*", "*", allow = true)),
    eventRules: Seq[Filters.EventRule] = Nil,
    exprRules: Seq[Filters.ExprRule] = Nil,
    ignoredStartTs: Seq[Long] = Nil,
    dropSourceIds: Seq[Int] = Nil,
    routes: Seq[Routing.RouteRule] = Nil,
    splitUpdates: Boolean = true,
    compact: Boolean = true,
    safeModeUntilTs: Option[Long] = None,
    checkpointDir: String,
    maxEventsPerTrigger: Option[Long] = None,
    // first-class runtime options mirroring the reference's ReplicaConfig
    // surface (pkg/config/replica_config.go:45-110): per-table DML metrics
    // and the textual-DDL control path, previously compose-only wrappers.
    metricsDir: Option[String] = None,
    textDdlRegistryDir: Option[String] = None,
    textDdlDefaultSchema: String = "")

object Changefeed {

  /** The filter→route→shape pipeline shared by batch and streaming — the
    * changefeed "plan" (tiflow's fixed topology, here a Catalyst plan). */
  def pipeline(df: DataFrame, spec: ChangefeedSpec): DataFrame = {
    var d = Filters.tableFilter(df, spec.tableRules)
    d = Filters.eventFilter(d, spec.eventRules)
    d = Filters.exprFilter(d, spec.exprRules)
    d = Filters.startTsFilter(d, spec.ignoredStartTs)
    d = Filters.bdrFilter(d, spec.dropSourceIds)
    d = Routing.route(d, spec.routes)
    spec.safeModeUntilTs.foreach(ts => d = Transforms.safeMode(d, ts))
    if (spec.splitUpdates) d = Transforms.updateSplit(d)
    d
  }

  /**
   * Start a changefeed over a streaming envelope source. Each microbatch is
   * watermark-complete by construction (the source emits whole commit-ts
   * ranges), so per-key compaction inside foreachBatch preserves upstream
   * ordering — the microbatch IS the txn barrier (SURVEY.md §2.11 W1/W2).
   */
  def start(spark: SparkSession, source: DataFrame, spec: ChangefeedSpec)
           (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val shaped = pipeline(source, spec)
    // sink wrapping, innermost-out: the user sink receives schema-bound
    // data rows (DDL applied first), and metrics record the batch as
    // produced by the pipeline — the reference's sink-level DML counters.
    var effectiveSink = sink
    spec.textDdlRegistryDir.foreach { d =>
      effectiveSink =
        DdlStream.withTextDdl(spark, d, spec.textDdlDefaultSchema)(effectiveSink)
    }
    spec.metricsDir.foreach { d =>
      effectiveSink = Metrics.withDmlMetrics(spark, d)(effectiveSink)
    }
    shaped.writeStream
      .queryName(spec.id)
      .option("checkpointLocation", spec.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // DDL BARRIER (G5): when the textual-DDL path is on, control rows
        // apply to the registry BEFORE data rows are shaped — compaction
        // must never fold a DDL row, and data rows bind against the
        // already-advanced registry in the same batch.
        val data = spec.textDdlRegistryDir match {
          case Some(d) if batch.columns.contains("op") =>
            DdlStream.applyDdlRows(batch, d)
            batch.filter(col("op") =!= DdlStream.DdlOp)
          case _ => batch
        }
        // Compaction keys on the ROUTED identity: after shard-merge several
        // source tables share one target, and net effects must fold across
        // them (dm shard-merge semantics). Renamed back so sinks see the
        // canonical envelope names.
        val b =
          if (spec.compact)
            Compaction.compact(data,
                keyCols = Seq("target_schema", "target_table", "pk"))
              .withColumnRenamed("target_schema", "schema_name")
              .withColumnRenamed("target_table", "table_name")
          else data
        effectiveSink(b, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Changefeed status snapshot (REST /status analog): query progress from
    * Spark's own instrumentation. */
  def status(q: StreamingQuery): Map[String, Any] = Map(
    "id" -> q.name,
    "isActive" -> q.isActive,
    "lastBatch" -> Option(q.lastProgress).map(_.batchId).getOrElse(-1L),
    "inputRowsPerSecond" -> Option(q.lastProgress).map(_.inputRowsPerSecond).getOrElse(0d))
}
