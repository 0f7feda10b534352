package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{CdcStream, Tables}

/**
 * Baseline analytics queries (SURVEY.md §2.9 A1-A6 shapes) over the TPC-H-ish
 * tables. Aggregates use exact decimal arithmetic (then cast to double) so
 * Spark and the DuckDB oracle agree bit-for-bit regardless of summation
 * order — float sums are NOT associative, decimal sums are.
 */
object CoreQueries {

  private def dec(c: String, p: Int, s: Int) = col(c).cast(DecimalType(p, s))

  val pricing = GateQuery(
    "q01_pricing_summary",
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           |  count(*) AS count_order
           |FROM lineitem
           |GROUP BY l_returnflag, l_linestatus""".stripMargin)) { (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity", 18, 2)).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice", 18, 2)).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice", 18, 2) * (lit(1) - dec("l_discount", 18, 4)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  /** A3 — distinct-ratio column stats (sync_diff split-column selection,
    * reference sync_diff_inspector/utils/utils.go:1055-1090). Exact distinct
    * counts only — approx sketches differ across engines. */
  val distinctStats = GateQuery(
    "q71_distinct_stats",
    Some(CdcStream.sqlCte +
      """SELECT schema_name, table_name,
        |  count(*) AS cnt,
        |  count(DISTINCT pk) AS n_keys,
        |  count(DISTINCT commit_ts) AS n_txns
        |FROM cdc GROUP BY schema_name, table_name""".stripMargin)) { (spark, dir) =>
    CdcStream.derive(spark, dir)
      .groupBy("schema_name", "table_name")
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("pk")).as("n_keys"),
        countDistinct(col("commit_ts")).as("n_txns"))
  }

  /** A5/O1 — frontier aggregation: per-table resolved ts (max commit_ts seen)
    * and the global checkpoint = min over tables (reference
    * cdc/puller/frontier/frontier.go:40-160; owner checkpoint aggregation). */
  val frontier = GateQuery(
    "q70_frontier",
    Some(CdcStream.sqlCte +
      """, per_table AS (
        |  SELECT schema_name, table_name, max(commit_ts) AS resolved_ts,
        |         min(commit_ts) AS first_ts, count(*) AS cnt
        |  FROM cdc GROUP BY schema_name, table_name
        |)
        |SELECT schema_name, table_name, resolved_ts, first_ts, cnt,
        |       (SELECT min(resolved_ts) FROM per_table) AS global_checkpoint
        |FROM per_table""".stripMargin)) { (spark, dir) =>
    val perTable = CdcStream.derive(spark, dir)
      .groupBy("schema_name", "table_name")
      .agg(
        max(col("commit_ts")).as("resolved_ts"),
        min(col("commit_ts")).as("first_ts"),
        count(lit(1)).as("cnt"))
    perTable.crossJoin(
      broadcast(perTable.agg(min(col("resolved_ts")).as("global_checkpoint"))))
  }

  /** W1-analog tumbling window aggregation over event time (Structured
    * Streaming's windowed agg shape, run on the batch table). */
  val tumblingWindow = GateQuery(
    "q95_tumbling_window",
    Some("""SELECT CAST(DATE '1970-01-01'
           |    + CAST(epoch_ns(ts) // 86400000000000 AS INT) AS VARCHAR) AS day,
           |  event_type AS etype, count(*) AS cnt,
           |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
    // ts arrives as nanos-since-epoch long (see Tables.load); the tumbling
    // 1-day window is integer floor-division — the Structured Streaming
    // window() equivalent for the batch gate.
    Tables.load(spark, dir, "events")
      .groupBy(
        date_add(to_date(lit("1970-01-01")),
          expr("ts DIV 86400000000000").cast("int")).cast("string").as("day"),
        col("event_type").as("etype"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
  }

  private val SessGapNs = 28_800_000_000_000L // 8 h — median user gap ~7.3 h

  /**
   * q183 — gap-based session windows ([[graft.operators.Sessions]]): the
   * W-family windowing mode frontiers can't express, grouped by Spark's
   * NATIVE `session_window` in batch mode (a silence STRICTLY exceeding
   * 8 h closes the session; an event at exactly start + gap still
   * joins — Spark's boundary semantics, spec-pinned). The oracle replays the sessions as gaps-and-islands at
   * microsecond grain (the precision session_window actually compares
   * at). Pins per (user, session ordinal): event count, exact start/end
   * nanos and the decimal-exact value sum.
   */
  val sessionWindows = GateQuery(
    "q183_session_window",
    Some(
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) AS ns, epoch_us(ts) AS us, value
         |  FROM events
         |), marked AS (
         |  SELECT *, CASE WHEN prev_us IS NULL
         |      OR us - prev_us > ${SessGapNs / 1000} THEN 1 ELSE 0 END AS news
         |  FROM (SELECT *, lag(us) OVER (
         |          PARTITION BY user_id ORDER BY us) AS prev_us FROM e)
         |), sessed AS (
         |  SELECT *, sum(news) OVER (PARTITION BY user_id ORDER BY us
         |    ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM marked
         |)
         |SELECT user_id, CAST(sess AS INT) AS sess, count(*) AS n_events,
         |  min(ns) AS start_ns, max(ns) AS end_ns,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM sessed GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
    import graft.operators.Sessions
    Sessions.sessionize(Tables.load(spark, dir, "events"),
        col("user_id"), col("ts"), SessGapNs,
        aggs = Seq(sum(col("value").cast(DecimalType(18, 6)))
          .cast("double").as("sum_value")))
      .select(col("k").as("user_id"), col("sess"), col("n_events"),
        col("start_ns"), col("end_ns"), col("sum_value"))
  }

  /**
   * q190 — SLIDING windows (length 2 d, slide 1 d), grouped by Spark's
   * NATIVE `window()` in batch mode — completes the W-family window
   * triple (tumbling q95, session q183, sliding here). Every event
   * lands in exactly two epoch-aligned windows; the oracle expands each
   * event into both window starts by integer arithmetic and must match
   * count-for-count and decimal-sum-for-sum.
   */
  val slidingWindows = GateQuery(
    "q190_sliding_window",
    Some(
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, event_type AS etype, value FROM events
        |), ex AS (
        |  SELECT unnest([(us // 86400000000) * 86400000000 - 86400000000,
        |                 (us // 86400000000) * 86400000000]) AS win_us,
        |    etype, value
        |  FROM e
        |)
        |SELECT win_us, etype, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM ex GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(
        window(timestamp_micros(expr("ts DIV 1000")), "2 days", "1 day").as("w"),
        col("event_type").as("etype"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_us"), col("etype"),
        col("cnt"), col("sum_value"))
  }

  private val IntervalUs = 28_800_000_000L // 8 h attribution window

  /**
   * q191 — event-time INTERVAL JOIN (the Flink interval join /
   * Structured Streaming stream-stream time-bounded join, batch twin):
   * per user, each click attributes the purchases landing in
   * [click, click + 8 h) — equi-key join with a range residual, the
   * shape SS executes with dual watermark-bounded state. LEFT-outer so
   * unattributed clicks stay visible; per cohort the gate pins row
   * counts, unmatched counts and the exact µs lag mass. StreamingSpec
   * runs the same join STREAMING-NATIVE (two MemoryStreams, watermarked,
   * inner time-bounded) and pins equality with this algebra.
   */
  val intervalJoin = GateQuery(
    "q191_interval_join",
    Some(
      s"""WITH c AS (
         |  SELECT user_id, epoch_us(ts) AS cus FROM events
         |  WHERE event_type = 'click'
         |), p AS (
         |  SELECT user_id AS pu, epoch_us(ts) AS pus FROM events
         |  WHERE event_type = 'purchase'
         |), j AS (
         |  SELECT c.user_id, c.cus, p.pus
         |  FROM c LEFT JOIN p ON c.user_id = p.pu
         |    AND p.pus >= c.cus AND p.pus < c.cus + $IntervalUs
         |)
         |SELECT CAST(user_id % 10 AS BIGINT) AS cohort, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN pus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unmatched,
         |  CAST(coalesce(sum(pus - cus), 0) AS BIGINT) AS sum_lag_us
         |FROM j GROUP BY 1""".stripMargin)) { (spark, dir) =>
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("ts DIV 1000").as("us"), col("event_type"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("cus"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("us").as("pus"))
    c.join(p, col("user_id") === col("pu") && col("pus") >= col("cus") &&
        col("pus") < col("cus") + IntervalUs, "left")
      .groupBy((col("user_id") % 10).as("cohort"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("pus").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        coalesce(sum(col("pus") - col("cus")), lit(0L)).as("sum_lag_us"))
  }

  private val RangeBinUs = 3_600_000_000L // 1 h bins ≈ median window length

  /**
   * q193 — KEYLESS range join ([[graft.operators.Ranges.pointInInterval]]):
   * global maintenance windows (no shard key) derived from sampled purchase
   * events attribute every click/view landing inside them. The naive plan
   * is BroadcastNestedLoopJoin — O(|P|·|I|) compares; the binned rewrite
   * meets each qualifying pair in exactly one 1-hour bin and runs as a
   * plain equi-join (PlanShapeSpec pins no-BNLJ/no-cartesian). Per window
   * the gate pins the exact point count, total µs lag mass and the XOR
   * fingerprint of matched event ids; windows that match nothing stay
   * visible with zeros.
   */
  val rangeJoin = GateQuery(
    "q193_range_join",
    Some(
      s"""WITH p AS (
         |  SELECT event_id AS pid, epoch_us(ts) AS pus FROM events
         |  WHERE event_type IN ('click', 'view')
         |), iv AS (
         |  SELECT event_id AS interval_id, epoch_us(ts) AS s_us,
         |    epoch_us(ts) + (user_id % 5 + 1) * 3600000000 AS e_us
         |  FROM events WHERE event_type = 'purchase' AND event_id % 37 = 0
         |), j AS (
         |  SELECT iv.interval_id, p.pid, p.pus - iv.s_us AS lag_us
         |  FROM iv LEFT JOIN p ON p.pus >= iv.s_us AND p.pus < iv.e_us
         |)
         |SELECT interval_id, CAST(count(pid) AS BIGINT) AS n_pts,
         |  CAST(coalesce(sum(lag_us), 0) AS BIGINT) AS sum_lag_us,
         |  CAST(coalesce(bit_xor(pid), 0) AS BIGINT) AS xor_pts
         |FROM j GROUP BY 1""".stripMargin)) { (spark, dir) =>
    val (points, intervals) = rangeJoinInputs(spark, dir)
    val joined = graft.operators.Ranges.pointInInterval(
      points, "pus", intervals, "s_us", "e_us", RangeBinUs)
    val perIv = joined.groupBy("interval_id")
      .agg(count(lit(1)).as("n_pts"), sum(col("pus") - col("s_us")).as("sum_lag_us"),
        expr("bit_xor(pid)").as("xor_pts"))
    intervals.select("interval_id").join(perIv, Seq("interval_id"), "left")
      .select(col("interval_id"), coalesce(col("n_pts"), lit(0L)).as("n_pts"),
        coalesce(col("sum_lag_us"), lit(0L)).as("sum_lag_us"),
        coalesce(col("xor_pts"), lit(0L)).as("xor_pts"))
  }

  /** Shared by the gate and PlanShapeSpec: (points, global intervals)
    * off the events table, times in µs. */
  def rangeJoinInputs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = Tables.load(spark, dir, "events")
      .select(col("event_id"), expr("ts DIV 1000").as("us"),
        col("user_id"), col("event_type"))
    val points = e.filter(col("event_type").isin("click", "view"))
      .select(col("event_id").as("pid"), col("us").as("pus"))
    val intervals = e
      .filter(col("event_type") === "purchase" && col("event_id") % 37 === 0)
      .select(col("event_id").as("interval_id"), col("us").as("s_us"),
        (col("us") + (col("user_id") % 5 + 1) * 3_600_000_000L).as("e_us"))
    (points, intervals)
  }

  /**
   * q211 — keyless interval OVERLAP join
   * ([[graft.operators.Ranges.intervalOverlap]]): two derived global
   * interval sets (purchase windows × error windows, no shard key)
   * joined on `a.s < b.e AND b.s < a.e` via the binned rewrite with the
   * first-shared-bin exactly-once rule — the interval×interval sibling
   * of q193's point×interval cliff. The gate pins pair count, the exact
   * overlap mass Σ(min(ends)−max(starts)) and a pair-key XOR.
   */
  val overlapJoin = GateQuery(
    "q211_overlap_join",
    Some(
      s"""WITH a AS (
         |  SELECT event_id AS aid, epoch_us(ts) AS as_,
         |    epoch_us(ts) + (user_id % 5 + 1) * 3600000000 AS ae
         |  FROM events WHERE event_type = 'purchase' AND event_id % 23 = 0
         |), b AS (
         |  SELECT event_id AS bid, epoch_us(ts) AS bs,
         |    epoch_us(ts) + (user_id % 3 + 1) * 3600000000 AS be
         |  FROM events WHERE event_type = 'error' AND event_id % 17 = 0
         |), j AS (
         |  SELECT aid, bid,
         |    least(ae, be) - greatest(as_, bs) AS ov
         |  FROM a JOIN b ON as_ < be AND bs < ae
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(sum(ov), 0) AS BIGINT) AS sum_overlap_us,
         |  CAST(coalesce(bit_xor(aid * 1000003 + bid), 0) AS BIGINT)
         |    AS xor_pair
         |FROM j""".stripMargin)) { (spark, dir) =>
    val e = Tables.load(spark, dir, "events")
      .select(col("event_id"), expr("ts DIV 1000").as("us"),
        col("user_id"), col("event_type"))
    val a = e.filter(col("event_type") === "purchase" &&
        col("event_id") % 23 === 0)
      .select(col("event_id").as("aid"), col("us").as("as_"),
        (col("us") + (col("user_id") % 5 + 1) * 3_600_000_000L).as("ae"))
    val b = e.filter(col("event_type") === "error" &&
        col("event_id") % 17 === 0)
      .select(col("event_id").as("bid"), col("us").as("bs"),
        (col("us") + (col("user_id") % 3 + 1) * 3_600_000_000L).as("be"))
    graft.operators.Ranges.intervalOverlap(a, "as_", "ae", b, "bs", "be",
        RangeBinUs)
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(least(col("ae"), col("be")) -
          greatest(col("as_"), col("bs"))), lit(0L)).as("sum_overlap_us"),
        coalesce(expr("bit_xor(aid * 1000003 + bid)"), lit(0L))
          .as("xor_pair"))
  }

  def all: Seq[GateQuery] =
    Seq(pricing, distinctStats, frontier, tumblingWindow, sessionWindows,
      slidingWindows, intervalJoin, rangeJoin, overlapJoin)
}
