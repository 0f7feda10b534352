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
    maxEventsPerTrigger: Option[Long] = None)

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
    shaped.writeStream
      .queryName(spec.id)
      .option("checkpointLocation", spec.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Compaction keys on the ROUTED identity: after shard-merge several
        // source tables share one target, and net effects must fold across
        // them (dm shard-merge semantics). Renamed back so sinks see the
        // canonical envelope names.
        val b =
          if (spec.compact)
            Compaction.compact(batch,
                keyCols = Seq("target_schema", "target_table", "pk"))
              .withColumnRenamed("target_schema", "schema_name")
              .withColumnRenamed("target_table", "table_name")
          else batch
        sink(b, batchId)
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
