package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * S3 — multiplexing puller, batch algebra (reference
 * cdc/puller/multiplexing_puller.go + cdc/puller/frontier/frontier.go).
 * Many per-region delivery streams multiplex into one table stream; the
 * semantics the reference enforces at runtime, re-expressed as one
 * deterministic batch plan over a delivery log:
 *
 *  - **Re-delivery dedup**: a region error/split re-scans a key range, so
 *    the same entry can arrive more than once; only the FIRST delivery
 *    (by delivery round, then region id) is consumed downstream.
 *  - **Span frontier**: each region forwards a resolved-ts per round
 *    (`tsTracker.Forward`, multiplexing_puller.go:87); a region that
 *    forwards nothing keeps its previous watermark (running max). The
 *    table frontier is the MIN over regions (`tsTracker.Frontier()`),
 *    and it is 0 / uninitialized until EVERY region has forwarded once
 *    (multiplexing_puller.go:92-103).
 *  - **Advance-only emission**: a resolved event is emitted downstream
 *    only when the frontier strictly advances
 *    (multiplexing_puller.go:104-108); non-advancing rounds emit nothing.
 *
 * Scale shape: the dedup is one hash-partition window on the entry id,
 * the per-(region, round) resolved table is a partial agg, and the
 * frontier fold runs on the tiny (regions × rounds) grid — the event
 * volume itself is touched exactly once.
 */
object Multiplex {

  /**
   * Delivery log → per-round progress. `deliveries` needs columns
   * (region, batch, seq, ts, fwd): `seq` the globally-unique entry id,
   * `ts` its commit ts, `fwd` whether the region forwards a resolved-ts
   * at the end of this round (a lagging region forwards nothing and
   * holds the frontier back).
   *
   * Returns one row per delivery round: raw/accepted/duplicate counts,
   * how many regions forwarded, the table frontier after the round, and
   * whether it advanced (the rounds that emit a resolved event
   * downstream).
   */
  def progress(deliveries: DataFrame): DataFrame = {
    val first = deliveries.withColumn("rn",
      row_number().over(Window.partitionBy("seq").orderBy("batch", "region")))
    val perBatch = first.groupBy("batch").agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_accepted"),
      sum(when(col("rn") =!= 1, 1L).otherwise(0L)).as("n_dup"))

    // per-(region, round) forwarded resolved-ts, densified over the full
    // regions × rounds grid so a silent region CARRIES its watermark
    val fwds = deliveries.filter(col("fwd"))
      .groupBy("region", "batch").agg(max(col("ts")).as("rts"))
    val grid = deliveries.select("region").distinct()
      .crossJoin(deliveries.select("batch").distinct())
    val carried = grid.join(fwds, Seq("region", "batch"), "left")
      .withColumn("wm", max(col("rts")).over(
        Window.partitionBy("region").orderBy("batch")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val frontier = carried.groupBy("batch").agg(
      sum(when(col("rts").isNotNull, 1L).otherwise(0L)).as("n_fwd"),
      // frontier stays 0 until every region has forwarded at least once
      when(sum(when(col("wm").isNull, 1L).otherwise(0L)) > 0, 0L)
        .otherwise(min(col("wm"))).as("frontier_ts"))

    perBatch.join(frontier, Seq("batch"))
      .withColumn("advanced",
        (col("frontier_ts") >
          coalesce(lag(col("frontier_ts"), 1).over(
            Window.orderBy("batch")), lit(0L))).cast("int"))
      .select("batch", "n_raw", "n_accepted", "n_dup", "n_fwd",
        "frontier_ts", "advanced")
  }
}
