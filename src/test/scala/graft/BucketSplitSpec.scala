package graft

import org.apache.spark.sql.functions._
import graft.diff.BucketSplit
import graft.diff.BucketSplit.{BucketChunk, BucketStat}

/** Pins the stats-bucket splitter fold (bucket.go:318-381) on hand-sized
  * stats: merge/single/split/tail kinds, the (count + half)/chunkSize
  * sub-split count, bound tiling, and the CalculateChunkSize formula. */
class BucketSplitSpec extends SparkSpec {
  import spark.implicits._

  test("CalculateChunkSize: 50k floor, rows/10k past 500M (utils.go:1097)") {
    assert(BucketSplit.calculateChunkSize(1000L) === 50000L)
    assert(BucketSplit.calculateChunkSize(500000000L) === 50000L)
    assert(BucketSplit.calculateChunkSize(500000001L) === 50000L)
    assert(BucketSplit.calculateChunkSize(600000000L) === 60000L)
  }

  test("fold: merge until chunkSize, single bucket closes alone, tail") {
    // buckets of 30 rows each (cum 30,60,90,120), chunkSize 50:
    // close at cum 60 (merged, 2 buckets), close at cum 120 (merged),
    // then the empty tail
    val stats = Seq.tabulate(4)(i => BucketStat(i, 30L * (i + 1), 100L * (i + 1)))
    val got = BucketSplit.bucketChunks(stats, 50L, splitBase = 0L)
    assert(got === Seq(
      BucketChunk(0, "merged", None, Some(200L)),
      BucketChunk(1, "merged", Some(200L), Some(400L)),
      BucketChunk(2, "tail", Some(400L), None)))
  }

  test("fold: fat single bucket sub-splits by (count + half)/chunkSize") {
    // one bucket of 250 rows, chunkSize 100 → pieces = (250+50)/100 = 3,
    // equal-width bounds over (base=0, 300]
    val got = BucketSplit.bucketChunks(
      Seq(BucketStat(0, 250L, 300L)), 100L, splitBase = 0L)
    assert(got === Seq(
      BucketChunk(0, "split", None, Some(100L)),
      BucketChunk(1, "split", Some(100L), Some(200L)),
      BucketChunk(2, "split", Some(200L), Some(300L)),
      BucketChunk(3, "tail", Some(300L), None)))
    // 150 rows → pieces = (150+50)/100 = 2; exactly chunkSize → 1 (single)
    assert(BucketSplit.bucketChunks(
      Seq(BucketStat(0, 150L, 300L)), 100L, 0L).count(_.kind == "split") === 2)
    assert(BucketSplit.bucketChunks(
      Seq(BucketStat(0, 100L, 300L)), 100L, 0L).head.kind === "single")
  }

  test("range and cascade membership agree on boundary-exact keys") {
    val chunks = Seq(
      BucketChunk(0, "merged", None, Some(10L)),
      BucketChunk(1, "merged", Some(10L), Some(20L)),
      BucketChunk(2, "tail", Some(20L), None))
    val df = Seq(1L, 10L, 11L, 20L, 21L, 100L).toDF("k")
    val rows = df.select(col("k"),
        BucketSplit.assignByRanges(col("k"), chunks).as("r"),
        BucketSplit.assignByUppers(col("k"), chunks.flatMap(_.upper)).as("c"))
      .as[(Long, Int, Int)].collect()
    rows.foreach { case (k, r, c) => assert(r === c, s"k=$k") }
    assert(rows.map(t => t._1 -> t._2).toMap === Map(1L -> 0, 10L -> 0,
      11L -> 1, 20L -> 1, 21L -> 2, 100L -> 2))
  }
}
