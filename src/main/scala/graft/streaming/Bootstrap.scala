package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Simple-protocol bootstrap send cadence — the reference's
 * `bootstrapWorker` (pkg/sink/codec/bootstraper.go:36-150): each active
 * (topic, table) periodically RE-SENDS its schema bootstrap message so a
 * consumer joining mid-stream on a low-traffic table still sees a schema.
 * Policy, per table:
 *
 *  - a table's FIRST row event registers it and sends a bootstrap
 *    immediately (bootstraper.go:105-117 addEvent → sendBootstrapMsg with
 *    lastSendTime = epoch);
 *  - a worker tick fires every [[BootstrapConfig.tickSec]] (5 s,
 *    bootstrapWorkerTickerInterval); at each tick every active table
 *    re-sends iff `now - lastSendTime >= send-bootstrap-interval-in-sec`
 *    OR `rows since last send >= send-bootstrap-in-msg-count`
 *    (tableStatistic.shouldSendBootstrapMsg:235-242; defaults 120 s /
 *    10 000, pkg/config/sink.go:85-88); a send resets both (reset:266);
 *  - a GC pass every [[BootstrapConfig.gcSec]] (30 s,
 *    bootstrapWorkerGCInterval) drops tables inactive longer than
 *    `maxInactiveDuration` (30 min default, isInactive:260 strict `>`);
 *    a dropped table's next event re-registers it as new;
 *  - the whole worker is DISABLED unless both interval and msg-count are
 *    > 0 (SinkConfig.ShouldSendBootstrapMsg, sink.go:224-233);
 *  - each send fans out to every partition of the topic when
 *    `send-bootstrap-to-all-partition` (default true), else partition 0
 *    only (generateEvents:162-179).
 *
 * This is the deterministic batch REPLAY twin of the ticker goroutine
 * (the same pattern as the stream-twin gates): event times come in on a
 * millisecond axis, ticks are the absolute grid t = k·tickSec·1000
 * (k ≥ 1 — a ticker's first fire is one period in), and coincident
 * instants process in the fixed order ARRIVALS, then TICK, then GC (the
 * Go select is racy there; the replay pins the order so the oracle can
 * reproduce it). The streaming deployment of the same state machine is
 * flatMapGroupsWithState with processing-time timers.
 *
 * Scale shape (100 TB): ONE shuffle on the table key; per-table state is
 * four scalars, and the tick replay is bounded by wall-clock horizon /
 * tickSec — independent of row count. Output is control-plane-sized
 * (sends, not rows).
 */
object Bootstrap {

  /** Knobs, reference defaults (pkg/config/sink.go:85-91,
    * bootstraper.go:29-33). `intervalSec <= 0` or `inMsgCount <= 0`
    * disables the worker entirely. */
  final case class BootstrapConfig(
      intervalSec: Long = 120,
      inMsgCount: Int = 10000,
      toAllPartition: Boolean = true,
      maxInactiveSec: Long = 1800,
      tickSec: Long = 5,
      gcSec: Long = 30)

  /** sink.go ShouldSendBootstrapMsg: both knobs must be positive. */
  def enabled(cfg: BootstrapConfig): Boolean =
    cfg.intervalSec > 0 && cfg.inMsgCount > 0

  /** Internal input row (NOT private — encoder codegen must reach the
    * accessors from generated classes). */
  final case class EvRow(schema_name: String, table_name: String,
                         ts_ms: Long, total_partition: Int)

  /** One bootstrap send (pre fan-out). */
  final case class Send(schema_name: String, table_name: String,
                        send_ms: Long, trigger: String, total_partition: Int)

  /**
   * Replay the worker over `events` — (schema_name, table_name, ts_ms,
   * total_partition) — up to `horizonMs` inclusive. Returns one row per
   * bootstrap SEND: (schema_name, table_name, send_ms,
   * trigger ∈ 'new'|'interval'|'count', total_partition), where trigger
   * follows the Go check order (time condition first, bootstraper.go:239).
   * Use [[fanOut]] for the per-partition message expansion.
   */
  def sends(events: DataFrame, cfg: BootstrapConfig,
            horizonMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!enabled(cfg))
      return spark.emptyDataset[Send].toDF()
    val intervalMs = cfg.intervalSec * 1000L
    val msgCount = cfg.inMsgCount
    val maxInactMs = cfg.maxInactiveSec * 1000L
    val tickMs = cfg.tickSec * 1000L
    val gcMs = cfg.gcSec * 1000L
    val in = events.select(
        col("schema_name").cast("string"), col("table_name").cast("string"),
        col("ts_ms").cast("long"), col("total_partition").cast("int"))
      .repartition(col("schema_name"), col("table_name"))
      .sortWithinPartitions("schema_name", "table_name", "ts_ms")
      .as[EvRow]
    in.mapPartitions { rows =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Send]
      var curKey: (String, String) = null
      // per-table worker state
      var active = false
      var lastSend = 0L
      var counter = 0L
      var lastRecv = 0L
      var part = 1
      var nextTick = tickMs
      var nextGc = gcMs
      def emit(ts: Long, trigger: String): Unit =
        out += Send(curKey._1, curKey._2, ts, trigger, part)
      def tickAt(t: Long): Unit = if (active) {
        val timeDue = t - lastSend >= intervalMs
        if (timeDue || counter >= msgCount) {
          emit(t, if (timeDue) "interval" else "count")
          lastSend = t; counter = 0L
        }
      }
      def gcAt(t: Long): Unit =
        if (active && t - lastRecv > maxInactMs) active = false
      /** Replay grid instants up to `until`; ties: tick before gc. */
      def advance(until: Long, inclusive: Boolean): Unit = {
        var go = true
        while (go) {
          val t = math.min(nextTick, nextGc)
          if (if (inclusive) t > until else t >= until) go = false
          else if (nextTick <= nextGc) { tickAt(t); nextTick += tickMs }
          else { gcAt(t); nextGc += gcMs }
        }
      }
      def closeTable(): Unit = if (curKey != null) {
        advance(horizonMs, inclusive = true)
      }
      rows.foreach { r =>
        val key = (r.schema_name, r.table_name)
        if (key != curKey) {
          closeTable()
          curKey = key; active = false
          lastSend = 0L; counter = 0L; lastRecv = 0L; part = 1
          nextTick = tickMs; nextGc = gcMs
        }
        val ts = r.ts_ms
        // arrivals process BEFORE any grid instant at the same ms
        advance(ts, inclusive = false)
        part = r.total_partition
        if (!active) {
          // addEvent new-table path: register, send immediately, reset
          active = true; counter = 1L; lastRecv = ts
          emit(ts, "new"); lastSend = ts; counter = 0L
        } else { counter += 1L; lastRecv = ts }
      }
      closeTable()
      out.iterator
    }.toDF()
  }

  /**
   * `send-all-bootstrap-at-start` (SinkConfig.ShouldSendAllBootstrapAtStart,
   * pkg/config/sink.go:235-243; ddl_manager.go trySendBootstrap:204-246):
   * when the worker is enabled AND the flag is set, ONE bootstrap per
   * CURRENT table emits at changefeed start (t = 0), views skipped
   * (ddl_manager.go:220-222). These go through the DDL sink, not the
   * worker — table state is untouched, so each table's first row event
   * still triggers its own 'new' send. `tables`: (schema_name,
   * table_name, is_view, total_partition).
   */
  def atStartSends(tables: DataFrame, cfg: BootstrapConfig,
                   sendAllAtStart: Boolean): DataFrame = {
    val spark = tables.sparkSession
    import spark.implicits._
    if (!(enabled(cfg) && sendAllAtStart)) spark.emptyDataset[Send].toDF()
    else tables.filter(!col("is_view"))
      .select(col("schema_name"), col("table_name"),
        lit(0L).as("send_ms"), lit("start").as("trigger"),
        col("total_partition").cast("int"))
  }

  /** generateEvents fan-out: one message row per partition when
    * `toAllPartition`, else partition 0 only (bootstraper.go:162-179). */
  def fanOut(sends: DataFrame, cfg: BootstrapConfig): DataFrame =
    if (cfg.toAllPartition)
      sends.withColumn("partition",
        explode(sequence(lit(0), col("total_partition") - 1)))
    else sends.withColumn("partition", lit(0))
}
