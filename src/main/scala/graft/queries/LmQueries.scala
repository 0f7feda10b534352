package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{TextLm, TextOps, TfIdf}

/**
 * Gate for the n-gram LM perplexity filter (CCNet-style corpus quality
 * scoring): a bigram LM built from the even-doc_id half of `documents`
 * scores every document; documents histogram by integer bits-per-gram.
 * All arithmetic is fixed-point integer (TextLm.l2q16), so the DuckDB
 * oracle reproduces every score exactly.
 */
object LmQueries {

  private val UniMin = 2L // vocab: drop hapax tokens
  private val BiMin = 3L  // LM grams: bounds the broadcast table

  val lmPerplexity = GateQuery(
    "q93_lm_perplexity",
    Some {
      val toks = TextOps.Sql.tokens.format("text")
      s"""WITH htoks AS (
         |  SELECT $toks AS t FROM documents WHERE doc_id % 2 = 0
         |), uni AS (
         |  SELECT w, count(*) AS cu
         |  FROM (SELECT unnest(t) AS w FROM htoks)
         |  GROUP BY 1 HAVING count(*) >= $UniMin
         |), bi AS (
         |  SELECT g, count(*) AS cb
         |  FROM (SELECT ${TextLm.Sql.gramG} AS g
         |        FROM (SELECT t, unnest(range(len(t) - 1)) AS i FROM htoks))
         |  GROUP BY 1 HAVING count(*) >= $BiMin
         |), vv AS (
         |  SELECT count(*) AS v FROM uni
         |), pos AS (
         |  SELECT doc_id, lang, ${TextLm.Sql.gramW1} AS w1, ${TextLm.Sql.gramG} AS g
         |  FROM (SELECT doc_id, lang, t, unnest(range(len(t) - 1)) AS i
         |        FROM (SELECT doc_id, lang, $toks AS t FROM documents)
         |        WHERE len(t) >= 2)
         |), scored AS (
         |  SELECT doc_id, lang,
         |    ${TextLm.Sql.l2q16("(coalesce(cu, 0) + v)")} -
         |    ${TextLm.Sql.l2q16("(coalesce(cb, 0) + 1)")} AS bits
         |  FROM pos
         |  LEFT JOIN uni ON pos.w1 = uni.w
         |  LEFT JOIN bi USING (g)
         |  CROSS JOIN vv
         |), doc AS (
         |  SELECT doc_id, lang, count(*) AS n_grams, sum(bits) AS bits
         |  FROM scored GROUP BY 1, 2
         |)
         |SELECT lang, CAST((bits // n_grams) // 16 AS BIGINT) AS bpt,
         |  count(*) AS n_docs, CAST(sum(bits) AS BIGINT) AS sum_bits
         |FROM doc GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "lang", "text")
    val held = docs.filter(col("doc_id") % 2 === 0)
    val uni = TextLm.unigramLm(held, "text", UniMin)
    val bi = TextLm.bigramLm(held, "text", BiMin)
    TextLm.scoreDocs(docs, uni, bi, "doc_id", "text", keepCols = Seq("lang"))
      .groupBy(col("lang"),
        TextLm.bptBucket(col("bits"), col("n_grams")).as("bpt"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bits")).as("sum_bits"))
  }

  private val MinDf = 3L // DF table threshold: bounds the broadcast

  /**
   * Corpus-global TF-IDF weighting (q101): document-frequency table over
   * the whole corpus (thresholded → broadcast), integer-exact IDF via the
   * fixed-point log2 (idf_q16 = l2q16(N) − l2q16(df)), per-doc tf·idf
   * sums histogrammed by whole-bit average weight. The "global term
   * statistics" stage of a curation pipeline.
   */
  val tfidf = GateQuery(
    "q101_tfidf",
    Some {
      val toks = TextOps.Sql.tokens.format("text")
      s"""WITH toks AS (
         |  SELECT doc_id, lang, $toks AS t FROM documents
         |), df AS (
         |  SELECT w, count(*) AS df
         |  FROM (SELECT DISTINCT doc_id, w
         |        FROM (SELECT doc_id, unnest(t) AS w FROM toks))
         |  GROUP BY 1 HAVING count(*) >= $MinDf
         |), nd AS (
         |  SELECT count(*) AS nd FROM documents
         |), tf AS (
         |  SELECT doc_id, lang, len(t) AS n_tokens, w, count(*) AS tf
         |  FROM (SELECT doc_id, lang, t, unnest(t) AS w FROM toks)
         |  GROUP BY 1, 2, 3, 4
         |), scored AS (
         |  SELECT doc_id, lang, n_tokens,
         |    sum(CASE WHEN df.df IS NOT NULL THEN 1 ELSE 0 END) AS n_scored,
         |    sum(CASE WHEN df.df IS NOT NULL
         |        THEN tf * (${TextLm.Sql.l2q16("(nd)")} - ${TextLm.Sql.l2q16("(df)")})
         |        ELSE 0 END) AS tfidf
         |  FROM tf LEFT JOIN df USING (w) CROSS JOIN nd
         |  GROUP BY 1, 2, 3
         |)
         |SELECT lang, CAST((tfidf // n_tokens) // 16 AS BIGINT) AS twb,
         |  count(*) AS n_docs,
         |  CAST(sum(tfidf) AS BIGINT) AS sum_tfidf,
         |  CAST(sum(n_scored) AS BIGINT) AS sum_scored
         |FROM scored GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "lang", "text")
    val dft = TfIdf.docFreq(docs, "text", MinDf)
    TfIdf.scoreDocs(docs, dft, "doc_id", "text", keepCols = Seq("lang"))
      .groupBy(col("lang"),
        TfIdf.weightBucket(col("tfidf_q16"), col("n_tokens")).as("twb"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tfidf_q16")).as("sum_tfidf"),
        sum(col("n_scored")).as("sum_scored"))
  }

  def all: Seq[GateQuery] = Seq(lmPerplexity, tfidf)
}
