package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Stats-bucket chunk splitter — the reference's `BucketIterator`
 * (sync_diff_inspector/splitter/bucket.go:252-381): instead of sampling
 * split points, walk the table's index STATISTICS (per-bucket cumulative
 * row count + upper bound) and greedily close a chunk whenever the
 * accumulated count reaches `chunk-size`; a single stats bucket that
 * overshoots splits into `(count + chunkSize/2) / chunkSize` sub-chunks
 * (splitChunkForBucket:234-253,352-358), and whatever trails the last
 * close becomes one final open-ended chunk (:371-381). The first chunk's
 * lower bound is open, every bound is (lower, upper].
 *
 * TiDB's stats tables are out of scope, so the bucket table here is
 * COMPUTED: an equal-width histogram over the index column — one
 * distributed agg (count + max per width cell, [[ChunkDiff.chunkByWidth]]
 * arithmetic) and a ≤B-row driver cumsum. Equal-width cells are the
 * deterministic stand-in for TiDB's equal-depth buckets; the fold is
 * bucket-shape-agnostic (it only reads cumulative counts and upper
 * bounds, exactly like the Go). The in-bucket sub-split likewise
 * substitutes computed equal-width bounds for `splitRangeByRandom`'s
 * `ORDER BY rand()` samples — deterministic, so both diff sides and the
 * oracle derive identical chunk sets.
 *
 * Scale shape (100 TB): the histogram is one partial-agg scan; the fold
 * and chunk list are control-plane-sized (≤ buckets + sub-chunks rows);
 * membership assignment is a codegen'd when-cascade — no shuffle, no
 * window, no sort.
 */
object BucketSplit {

  /** One stats bucket: dense index, CUMULATIVE count, upper bound —
    * dbutil.Bucket's (Count, UpperBound). */
  final case class BucketStat(idx: Int, cum: Long, upper: Long)

  /** One produced chunk: `kind` ∈ merged (≥2 buckets) | single (one
    * bucket, no split) | split (sub-divided bucket) | tail (trailing
    * open-ended range). Bounds are (lower, upper]; None = unbounded. */
  final case class BucketChunk(chunkId: Int, kind: String,
                               lower: Option[Long], upper: Option[Long])

  /** utils.CalculateChunkSize (utils.go:1097-1105): 50k, or rows/10k for
    * tables past 500M rows. */
  def calculateChunkSize(rowCount: Long): Long = {
    val chunkSize = 50000L
    if (rowCount > chunkSize * 10000L) rowCount / 10000L else chunkSize
  }

  /** The computed "index stats": equal-width histogram of `keyCol` —
    * (count, max) per cell, cumsum on the driver. Empty cells vanish and
    * the survivors re-index densely (the Go bucket list is dense too). */
  def bucketStats(df: DataFrame, keyCol: String, nBuckets: Int)
      : Seq[BucketStat] = {
    val (lo, hi) = ChunkDiff.widthBounds(df, keyCol)
    val rows = df
      .groupBy(ChunkDiff.chunkByWidth(col(keyCol), lo, hi, nBuckets).as("b"))
      .agg(count(lit(1)).as("c"), max(col(keyCol)).cast("long").as("ub"))
      .orderBy("b")
      .collect() // ≤ nBuckets rows — control-plane
    var cum = 0L
    rows.toSeq.zipWithIndex.map { case (r, i) =>
      cum += r.getLong(1)
      BucketStat(i, cum, r.getLong(2))
    }
  }

  /**
   * produceChunks' greedy fold (bucket.go:318-381). `splitBase` supplies
   * the numeric stand-in for the first group's open lower bound when it
   * must sub-split (table min − 1 — nothing sits below it, so membership
   * is unchanged).
   */
  def bucketChunks(stats: Seq[BucketStat], chunkSize: Long,
                   splitBase: Long): Seq[BucketChunk] = {
    val half = chunkSize >> 1
    val out = scala.collection.mutable.ArrayBuffer.empty[BucketChunk]
    var latest = 0L
    var lower: Option[Long] = None
    var firstIdx = 0
    def id = out.size
    for (s <- stats) {
      val cnt = s.cum - latest
      if (cnt >= chunkSize) { // close a group at this bucket
        if (s.idx == firstIdx) { // single-bucket group: maybe sub-split
          val pieces = ((cnt + half) / chunkSize).toInt
          if (pieces <= 1)
            out += BucketChunk(id, "single", lower, Some(s.upper))
          else {
            val base = lower.getOrElse(splitBase)
            var subLower = lower
            for (k <- 0 until pieces) {
              val up = base + ((s.upper - base) * (k + 1)) / pieces
              out += BucketChunk(id, "split", subLower, Some(up))
              subLower = Some(up)
            }
          }
        } else out += BucketChunk(id, "merged", lower, Some(s.upper))
        latest = s.cum
        lower = Some(s.upper)
        firstIdx = s.idx + 1
      }
    }
    out += BucketChunk(id, "tail", lower, None)
    out.toSeq
  }

  /** Membership by boundary cascade — identical to
    * [[ChunkDiff.chunkBySplitPoints]] over the chunks' finite uppers
    * (long-exact): chunk = #uppers strictly below the key. Tiling proof:
    * this must agree with the (lower, upper] range predicates. */
  def assignByUppers(key: Column, uppers: Seq[Long]): Column =
    uppers.foldLeft(lit(0)) { (acc, u) =>
      acc + when(key > u, 1).otherwise(0)
    }

  /** Membership by range predicate (the form the reference's chunk WHERE
    * clauses take). */
  def assignByRanges(key: Column, chunks: Seq[BucketChunk]): Column =
    chunks.foldLeft(lit(-1)) { (acc, c) =>
      val cond = c.lower.map(key > _).getOrElse(lit(true)) &&
        c.upper.map(key <= _).getOrElse(lit(true))
      when(cond, c.chunkId).otherwise(acc)
    }
}
