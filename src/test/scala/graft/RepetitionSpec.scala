package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Gopher-style repetition signals: duplicate-token fraction, top n-gram
  * fraction, duplicate-segment (line) stats. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("dupTokenFrac and topNgramFrac on crafted docs") {
    val docs = Seq(
      (1L, "a b c d"),             // all distinct → 0
      (2L, "a a a a"),             // 1 distinct of 4 → 0.75
      (3L, "spam ham spam ham spam ham")) // top bigram "spam ham" 3/5
      .toDF("doc_id", "text")

    val dup = docs.select(col("doc_id"), TextOps.dupTokenFrac(col("text")).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(dup(1L) == 0.0 && dup(2L) == 0.75)

    val top2 = TextOps.topNgramFrac(docs, "doc_id", 2)
      .as[(Long, Double)].collect().toMap
    assert(top2(3L) == 3.0 / 5.0)
    assert(top2(2L) == 1.0) // "a a" is every bigram

    // docs shorter than n drop out (4 tokens < n=5 → no n-grams)
    val top5 = TextOps.topNgramFrac(docs.filter(col("doc_id") === 1), "doc_id", 5)
    assert(top5.count() == 0)
  }

  test("dupSegmentStats finds repeated lines and their char mass") {
    val doc = Seq((1L, "fresh line\nboilerplate\nboilerplate\nanother\n\n  \nboilerplate"))
      .toDF("doc_id", "text")
    val r = TextOps.dupSegmentStats(doc, "doc_id")
      .select("n_segments", "dup_seg_frac", "dup_char_frac").head()
    assert(r.getLong(0) == 5) // empties/blank lines dropped
    assert(r.getDouble(1) == 3.0 / 5.0)
    // chars: dup "boilerplate"×3=33 of total 10+33+7 = 50
    assert(r.getDouble(2) == 33.0 / 50.0)

    // separator absent → one segment, zero repetition (degenerate-safe)
    val one = TextOps.dupSegmentStats(Seq((1L, "no newlines here")).toDF("doc_id", "text"), "doc_id")
      .select("n_segments", "dup_seg_frac").head()
    assert(one.getLong(0) == 1 && one.getDouble(1) == 0.0)
  }
}
