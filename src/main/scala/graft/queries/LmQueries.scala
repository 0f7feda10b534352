package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{TextLm, TextOps}

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

  def all: Seq[GateQuery] = Seq(lmPerplexity)
}
