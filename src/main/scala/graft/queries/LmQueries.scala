package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Hashing, Tables}
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

  /** Shared oracle chain: bigram-LM per-document scores, ending in
    * `doc(doc_id, lang, n_grams, bits)` — consumed by q93's histogram
    * and q174's perplexity-bucket pipeline (kept in ONE place so the two
    * cannot drift). */
  private val lmDocCteSql: String = {
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
       |)""".stripMargin
  }

  val lmPerplexity = GateQuery(
    "q93_lm_perplexity",
    Some(lmDocCteSql +
      s"""
         |SELECT lang, CAST((bits // n_grams) // 16 AS BIGINT) AS bpt,
         |  count(*) AS n_docs, CAST(sum(bits) AS BIGINT) AS sum_bits
         |FROM doc GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
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

  // ---- q148: count-min sketch term counts ------------------------------

  private val CmsDepth = 4
  private val CmsWidth = 64 // well below vocab: real collisions at every sf
  private val QueryDocs = 211L // query set: tokens of doc_id % 211 = 0 docs

  /**
   * Count-min sketch term statistics ([[graft.operators.Sketches]]): the
   * whole corpus folds into a depth×width counter table (the 100 TB shape —
   * partial agg bounds the shuffle at depth×width rows per partition,
   * the sketch broadcasts to estimators), then a deterministic query set
   * (every token of the doc_id % 211 docs) is point-estimated against
   * it. The gate pins, per query token, the exact corpus count AND the
   * sketch estimate — the oracle replays every counter, so a collision's
   * exact overestimate is reproduced bit-for-bit, and `overcount`
   * being ≥ 0 everywhere witnesses the CMS one-sided guarantee on real
   * collisions (width is chosen below vocab size so they genuinely
   * happen).
   */
  val cmsTermCounts = GateQuery(
    "q148_cms_terms",
    Some {
      val toks = TextOps.Sql.tokens.format("text")
      val p = Hashing.MixP
      def jb(hE: String) =
        s"((($hE) % $p) * (2 * j + 3) + j) % $p % $CmsWidth"
      s"""WITH tok AS (
         |  SELECT unnest($toks) AS t FROM documents
         |), th AS (
         |  SELECT t, ${Hashing.Sql.portableLong("t")} AS h FROM tok
         |), js AS (
         |  SELECT unnest([${(0 until CmsDepth).mkString(", ")}]) AS j
         |), cms AS (
         |  SELECT j, ${jb("h")} AS bucket, count(*) AS cnt
         |  FROM th CROSS JOIN js GROUP BY 1, 2
         |), q AS (
         |  SELECT DISTINCT unnest($toks) AS t
         |  FROM documents WHERE doc_id % $QueryDocs = 0
         |), qh AS (
         |  SELECT t, ${Hashing.Sql.portableLong("t")} AS h FROM q
         |), est AS (
         |  SELECT t, min(coalesce(cnt, 0)) AS est_cnt
         |  FROM (SELECT t, j, ${jb("h")} AS bucket FROM qh CROSS JOIN js) qb
         |  LEFT JOIN cms USING (j, bucket) GROUP BY 1
         |), exact AS (
         |  SELECT tok.t, count(*) AS exact_cnt
         |  FROM tok JOIN q ON tok.t = q.t GROUP BY 1
         |)
         |SELECT est.t AS token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
         |  CAST(est_cnt AS BIGINT) AS est_cnt,
         |  CAST(est_cnt - exact_cnt AS BIGINT) AS overcount
         |FROM est JOIN exact ON est.t = exact.t""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.Sketches
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val cms = Sketches.cmsBuild(docs, "text", CmsDepth, CmsWidth)
    val queries = docs.filter(col("doc_id") % QueryDocs === 0)
      .select(explode(TextOps.tokens(col("text"))).as("token")).distinct()
    val exact = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
      .join(broadcast(queries), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
    Sketches.cmsEstimate(cms, queries, "token", CmsDepth, CmsWidth)
      .join(exact, Seq("token"))
      .select(col("token"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"))
  }

  // ---- q162: BM25 top-k retrieval --------------------------------------

  private val Bm25Terms = Seq("spark", "vector", "customer", "merge", "slow")
  private val Bm25K = 10

  /**
   * BM25 top-k retrieval (q162): Okapi ranking (k1 = 1.2, b = 0.75) of the
   * whole corpus against a fixed query-term set — retrieval-based
   * decontamination / RAG-index scoring as an engine operator
   * ([[TfIdf.bm25TopK]]). Exact-integer score (rationals folded, idf via
   * fixed-point log2) so the oracle replays every score; the gate pins the
   * full top-10 (id, dl, n_hit, score) ranking. Plan: one slim
   * partial-aggregated stats pass (df/N/Σdl — the model, served back as
   * plan literals), one map-only scoring pass, TakeOrdered top-k; token
   * occurrences never shuffle, no global sort.
   */
  val bm25TopK = GateQuery(
    "q162_bm25",
    Some {
      val toks = TextOps.Sql.tokens.format("text")
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, $toks AS t FROM documents
         |), d AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
         |), tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
         |  WHERE w IN ($termList)
         |  GROUP BY 1, 2
         |), consts AS (
         |  SELECT (SELECT count(*) FROM d) AS nd,
         |    CAST((SELECT sum(dl) FROM d) // (SELECT count(*) FROM d) AS BIGINT) AS avgdl
         |), idf AS (
         |  SELECT w, ${TextLm.Sql.l2q16("(nd)")} - ${TextLm.Sql.l2q16("(df)")} AS idf
         |  FROM (SELECT w, count(*) AS df FROM tf GROUP BY 1) CROSS JOIN consts
         |), scored AS (
         |  SELECT d.doc_id, d.dl,
         |    CAST(count(s.w) AS BIGINT) AS n_hit,
         |    CAST(coalesce(sum((s.idf * 22 * c.avgdl * s.tf)
         |      // (10 * c.avgdl * s.tf + 3 * c.avgdl + 9 * d.dl)), 0) AS BIGINT) AS score_q16
         |  FROM d CROSS JOIN consts c
         |  LEFT JOIN (SELECT tf.doc_id, tf.w, tf.tf, idf.idf
         |             FROM tf JOIN idf USING (w)) s ON d.doc_id = s.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_id, dl, n_hit, score_q16 FROM scored
         |ORDER BY score_q16 DESC, doc_id LIMIT $Bm25K""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    TfIdf.bm25TopK(docs, "doc_id", "text", Bm25Terms, Bm25K)
  }

  // ---- q174: CCNet perplexity buckets ---------------------------------

  private val BucketRatePpm = Map("head" -> 1000000L, "middle" -> 500000L,
    "tail" -> 100000L)

  /**
   * q174 — CCNet's headline design, end to end: score every document
   * with the bigram LM (q93's chain), cut the corpus into head/middle/
   * tail perplexity buckets at the 33rd/66th percentiles, and sample
   * each bucket at its own rate (head kept, middle 50 %, tail 10 % —
   * the CCNet quality-stratified keep). The percentile cuts come from
   * the MERGEABLE histogram sketch (q164's operator) — the production
   * path at 100 TB, where an exact rank over the corpus would be a
   * global sort; cut bins are control-plane scalars served back as plan
   * literals. Per (lang, bucket) the gate pins doc counts, exact bit
   * sums, kept counts and kept-id checks — bucket boundary, sampling
   * hash and LM scores all bit-exact.
   */
  val ccnetBuckets = GateQuery(
    "q174_ccnet_buckets",
    Some {
      val keepE = graft.operators.Curation.Sql.sampleKeep("doc_id",
        "CASE bucket WHEN 'head' THEN 1000000 WHEN 'middle' THEN 500000 " +
          "ELSE 100000 END")
      lmDocCteSql +
        s""", bpt AS (
           |  SELECT doc_id, lang, bits, bits // n_grams AS bin
           |  FROM doc
           |), hist AS (
           |  SELECT bin, count(*) AS n FROM bpt GROUP BY 1
           |), cum AS (
           |  SELECT bin, CAST(sum(n) OVER (ORDER BY bin
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM hist
           |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM hist
           |), cuts AS (
           |  SELECT
           |    (SELECT min(bin) FROM cum CROSS JOIN tot
           |     WHERE cum * 100 >= 33 * nt) AS b33,
           |    (SELECT min(bin) FROM cum CROSS JOIN tot
           |     WHERE cum * 100 >= 66 * nt) AS b66
           |), bucketed AS (
           |  SELECT doc_id, lang, bits,
           |    CASE WHEN bin <= b33 THEN 'head'
           |         WHEN bin <= b66 THEN 'middle' ELSE 'tail' END AS bucket
           |  FROM bpt CROSS JOIN cuts
           |)
           |SELECT lang, bucket, count(*) AS n_docs,
           |  CAST(sum(bits) AS BIGINT) AS sum_bits,
           |  CAST(sum(CASE WHEN $keepE THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  CAST(sum(CASE WHEN $keepE THEN doc_id ELSE 0 END) AS BIGINT) AS kept_check
           |FROM bucketed GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.{Curation, Sketches, VectorOps}
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "lang", "text")
    val held = docs.filter(col("doc_id") % 2 === 0)
    val uni = TextLm.unigramLm(held, "text", UniMin)
    val bi = TextLm.bigramLm(held, "text", BiMin)
    val doc = TextLm.scoreDocs(docs, uni, bi, "doc_id", "text",
        keepCols = Seq("lang"))
      .withColumn("bin", VectorOps.floorDiv(col("bits"), col("n_grams")))
      .persist()
    val hist = doc.groupBy("bin").agg(count(lit(1)).as("n"))
    val cuts = Sketches.histQuantiles(hist, 1L, Seq(33, 66))
      .select("p", "bin").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (b33, b66) = (cuts(33), cuts(66))
    val bucket = when(col("bin") <= b33, "head")
      .when(col("bin") <= b66, "middle").otherwise("tail")
    val rate = when(col("bucket") === "head", BucketRatePpm("head"))
      .when(col("bucket") === "middle", BucketRatePpm("middle"))
      .otherwise(BucketRatePpm("tail"))
    val out = doc.withColumn("bucket", bucket)
      .withColumn("keep", Curation.sampleKeep(col("doc_id"), rate))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("bits")).as("sum_bits"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("kept_check"))
      .persist()
    out.count()
    doc.unpersist()
    out
  }

  // ---- q178: Kneser-Ney smoothed LM -----------------------------------

  /**
   * q178 — interpolated Kneser-Ney bigram LM ([[TextLm.knStats]] /
   * [[TextLm.knScoreDocs]]): the production smoother behind KenLM and
   * CCNet's quality LM, trained in-engine from the held-in half and
   * scoring every document with discount d = 3/4 held exactly as a
   * rational — per position ONE integer quotient
   * (max(4·c(vw)−3,0)·(B+U) + 3·N1+(v·)·(N1+(·w)+1)) / (4·c(v)·(B+U)),
   * unseen contexts backing off to the continuation distribution. The
   * gate pins doc-grain (n_grams, bits) for the whole corpus — every
   * continuation count, discount and backoff bit-exact cross-engine.
   * Plan: one held-slice shuffle trains all four model tables (vocab-
   * bounded → broadcast); scoring is map-only + broadcast joins; the
   * only corpus exchange is the final per-doc partial agg.
   */
  val knLm = GateQuery(
    "q178_kneser_ney",
    Some {
      val toks = TextOps.Sql.tokens.format("text")
      s"""WITH htoks AS (
         |  SELECT $toks AS t FROM documents WHERE doc_id % 2 = 0
         |), pairs AS (
         |  SELECT ${TextLm.Sql.gramW1} AS w1, t[i + 2] AS w2,
         |    ${TextLm.Sql.gramG} AS g
         |  FROM (SELECT t, unnest(range(len(t) - 1)) AS i FROM htoks)
         |), bif AS (
         |  SELECT g, count(*) AS cb FROM pairs GROUP BY 1
         |), bi AS (
         |  SELECT g, cb FROM bif WHERE cb >= $BiMin
         |), ctx AS (
         |  SELECT w1, count(*) AS cv, count(DISTINCT w2) AS n1v
         |  FROM pairs GROUP BY 1
         |), cont AS (
         |  SELECT w2, count(DISTINCT w1) AS ncw FROM pairs GROUP BY 1
         |), bu AS (
         |  SELECT (SELECT count(*) FROM bif) +
         |    (SELECT count(DISTINCT w)
         |     FROM (SELECT unnest(t) AS w FROM htoks)) AS bu
         |), pos AS (
         |  SELECT doc_id, lang, ${TextLm.Sql.gramW1} AS w1, t[i + 2] AS w2,
         |    ${TextLm.Sql.gramG} AS g
         |  FROM (SELECT doc_id, lang, t, unnest(range(len(t) - 1)) AS i
         |        FROM (SELECT doc_id, lang, $toks AS t FROM documents)
         |        WHERE len(t) >= 2)
         |), terms AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN cv IS NULL THEN bu ELSE 4 * cv * bu END AS den,
         |    CASE WHEN cv IS NULL THEN coalesce(ncw, 0) + 1
         |         ELSE greatest(4 * coalesce(cb, 0) - 3, 0) * bu
         |              + 3 * n1v * (coalesce(ncw, 0) + 1) END AS num
         |  FROM pos LEFT JOIN bi USING (g) LEFT JOIN ctx USING (w1)
         |  LEFT JOIN cont USING (w2) CROSS JOIN bu
         |), scored AS (
         |  SELECT doc_id, lang,
         |    ${TextLm.Sql.l2q16("(den)")} - ${TextLm.Sql.l2q16("(num)")} AS bits
         |  FROM terms
         |)
         |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(bits) AS BIGINT) AS bits
         |FROM scored GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "lang", "text")
    val held = docs.filter(col("doc_id") % 2 === 0)
    val (bi, ctx, cont, bu) = TextLm.knStats(held, "text", BiMin)
    TextLm.knScoreDocs(docs, bi, ctx, cont, bu, "doc_id", "text",
      keepCols = Seq("lang"))
  }

  def all: Seq[GateQuery] =
    Seq(lmPerplexity, tfidf, cmsTermCounts, bm25TopK, ccnetBuckets, knLm)
}
