package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Incremental dedup: new batch vs persisted MinHash index. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "completely different sentence about spark catalyst optimizer rules"),
    (3L, "one two three four five six seven eight nine ten eleven twelve"))
    .toDF("doc_id", "text")

  test("exact and near dups match their source; novel text does not") {
    val newb = Seq(
      // exact copy of doc 1
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      // near dup of doc 3: one appended token
      (30L, "one two three four five six seven eight nine ten eleven twelve extra"),
      // novel
      (99L, "zebra quartz violin umbrella xylophone kumquat jigsaw wombat"))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashAnalyzed(base, "doc_id", "text", 3, 12)
    val na = Dedup.minhashAnalyzed(newb, "doc_id", "text", 3, 12)
    val m = Dedup.incrementalMatches(idx, na, 12, 4, 500)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(m(10L).contains((1L, 100L)), s"exact dup: $m")
    assert(m.get(30L).exists(_.exists { case (o, j) => o == 3L && j >= 50 }),
      s"near dup above threshold: $m")
    assert(!m.contains(99L) ||
      m(99L).forall { case (_, j) => j < 50 }, s"novel doc must not match: $m")
  }

  test("degenerate index buckets are capped; cap=0 disables") {
    val flood = (100L until 120L).map(i => (i, "same same same same same"))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashAnalyzed(flood, "doc_id", "text", 3, 12)
    val na = Dedup.minhashAnalyzed(
      Seq((1L, "same same same same same")).toDF("doc_id", "text"),
      "doc_id", "text", 3, 12)
    val capped = Dedup.incrementalMatches(idx, na, 12, 4, maxBucket = 10).count()
    val open = Dedup.incrementalMatches(idx, na, 12, 4, maxBucket = 0).count()
    assert(capped == 0L, "mega-bucket must be dropped by the cap")
    assert(open == 20L, "cap disabled: every index copy is a candidate")
  }
}
