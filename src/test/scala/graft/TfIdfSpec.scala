package graft

import org.apache.spark.sql.functions._
import graft.functions.TextRuns
import graft.operators.{TfIdf, TextOps}

/** TF-IDF kernel equivalence and scoring semantics. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a cat")).toDF("doc_id", "text")

  test("tokenTf kernel equals explode-then-groupBy on the same tokenizer") {
    val kernel = docs
      .select(col("doc_id"), explode(TextRuns.tokenTf(col("text"))).as("p"))
      .select(col("doc_id"), col("p.w").as("w"), col("p.tf").as("tf"))
    val naive = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    assert(kernel.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(kernel).count() == 0)
  }

  test("docFreq counts documents, not occurrences; scoring is integer-exact") {
    val df = TfIdf.docFreq(docs, "text", minDf = 2L)
    val got = df.as[(String, Long)].collect().toMap
    // "cat" appears twice in doc 3 but df counts docs: cat=2, the=2, sat=2
    assert(got == Map("cat" -> 2L, "the" -> 2L, "sat" -> 2L))

    val scored = TfIdf.scoreDocs(docs, df, "doc_id", "text")
      .select("doc_id", "n_scored", "tfidf_q16").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // idf_q16 for df=2 with N=3: l2q16(3) - l2q16(2) = 25 - 16 = 9
    // doc 1: the(tf=2) + cat + sat scored -> (2+1+1)*9 = 36, 3 distinct
    assert(scored(1L) == (3L, 36L))
    // doc 3: cat(tf=2) -> 18, 1 distinct token scored
    assert(scored(3L) == (1L, 18L))
  }
}
