package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Session-window aggregation (gap-based sessionization): the W-family
 * batch twin of Structured Streaming's `session_window`, the windowing
 * mode TiCDC-style frontiers can't express (reference capability class:
 * W1/W6 event-time semantics; sessions per the public Spark/Flink
 * session-window definition — a session extends while the next
 * event arrives within `gap` of the previous INCLUSIVE — only a silence
 * strictly exceeding the gap closes it; Round10Spec pins the boundary).
 *
 * The grouping key IS Spark's native `session_window` (batch mode), so
 * Catalyst plans the merge; the session ordinal is a per-key window over
 * the already-aggregated session table (≪ events). Scale shape: one
 * shuffle by key for the session agg (partial-aggregable), one bounded
 * window pass for ordinals.
 */
object Sessions {

  /**
   * Sessionize `df` by `key` over a nanosecond event-time column:
   * returns (key, sess 1.., n_events, start_ns, end_ns, plus `aggs`),
   * sessions ordered by start time. `gapNs` must be microsecond-aligned
   * (session_window takes an interval; ts is nanos-since-epoch).
   */
  /**
   * Gap + MAX-DURATION sessionization (the Flink session-with-max shape
   * Spark's native `session_window` lacks): a session closes when the
   * idle gap exceeds `gapUs` OR when the next event would land at or
   * past sessionStart + `capUs` — runaway sessions (bots, replays) are
   * force-split at the cap. Sequential per-key fold via
   * `flatMapSortedGroups` (two longs of state); ties break by id.
   * Returns every event tagged (k, ts, id, sess) with sess numbered
   * from 1 per key in time order.
   */
  def sessionizeCapped(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapUs: Long, capUs: Long): DataFrame = {
    require(gapUs > 0 && capUs > 0, s"gap=$gapUs cap=$capUs")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts", $"id") { case (_, it) =>
        var sess = 0L
        var start = Long.MinValue
        var last = Long.MinValue
        it.map { case (k, ts, id) =>
          if (sess == 0L || ts - last > gapUs || ts - start >= capUs) {
            sess += 1; start = ts
          }
          last = ts
          (k, ts, id, sess)
        }
      }
      .toDF("k", "ts", "id", "sess")
  }

  def sessionize(df: DataFrame, key: Column, tsNs: Column, gapNs: Long,
                 aggs: Seq[Column] = Nil): DataFrame = {
    require(gapNs % 1000L == 0, s"gap must be whole microseconds: $gapNs")
    val sw = session_window(
      timestamp_micros((tsNs / 1000L).cast("long")),
      s"${gapNs / 1000L} microseconds")
    val base = df
      .groupBy(key.as("k"), sw.as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(tsNs).as("start_ns") +: max(tsNs).as("end_ns") +: aggs: _*)
    val w = Window.partitionBy(col("k")).orderBy(col("start_ns"))
    base
      .withColumn("sess", row_number().over(w))
      .drop("sw")
  }
}
