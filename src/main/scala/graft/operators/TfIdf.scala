package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-global document-frequency statistics and TF-IDF document
 * weighting — the "global term statistics" stage of a training-data
 * pipeline (keyword extraction, boilerplate downweighting, CCNet-style
 * corpus features; reference capability class: per-row quality transforms
 * over a broadcast model, cf. pkg/filter expression stages).
 *
 * Scale shape (100 TB corpus):
 *   - the DF table is built once (explode distinct tokens → one hash agg,
 *     map-side combinable) and THRESHOLDED, so it broadcasts;
 *   - scoring is one (doc, token) partial-aggregated groupBy (tf counts)
 *     + a broadcast join + one doc-grain sum — token strings never
 *     shuffle against the corpus after the tf pass.
 *
 * Determinism: IDF uses the integer fixed-point log2 ([[TextLm.l2q16]]):
 * idf_q16(w) = l2q16(N) − l2q16(df_w), exact in both engines — no float
 * logs anywhere, so scores hash-match bit-for-bit.
 */
object TfIdf {

  /** Document-frequency table (w, df): #docs containing each token, at
    * least `minDf` (the threshold bounds the broadcast size). */
  def docFreq(corpus: DataFrame, textCol: String, minDf: Long): DataFrame =
    corpus.select(explode(array_distinct(TextOps.tokens(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /**
   * Per-document TF-IDF: for each doc, over its distinct tokens present
   * in the DF table, sum tf · idf_q16 (tf = in-doc occurrence count).
   * Returns doc grain: (id…, n_tokens, n_scored, tfidf_q16).
   */
  def scoreDocs(corpus: DataFrame, df: DataFrame,
                idCol: String, textCol: String,
                keepCols: Seq[String] = Nil): DataFrame = {
    val keyCols = (idCol +: keepCols).map(col)
    // r21 (guide §1.2 step 2): idf_q16 is a function of the DF-TABLE row
    // alone — computed once per vocab row before the broadcast instead of
    // once per (doc, token) at corpus scale (the former per-row form
    // evaluated two l2q16 trees per scored token). N is a control-plane
    // scalar, collected once (the same single evaluation the old 1-row
    // crossJoin frame paid) and folded as a literal. Same integers per
    // token; idf presence ⇔ the old df presence.
    val nd = corpus.agg(count(lit(1)).as("nd")).head().getLong(0)
    val ndL2 = graft.functions.LmKernels.l2q16(math.max(nd, 0L))
    val dfIdf = df.select(col("w"),
      (lit(ndL2) - TextLm.l2q16(col("df"))).as("idf_q16"))
    // tf per distinct token computed IN the row (one tokenization pass,
    // graft.functions.TextRuns.tokenTf) — the explode-then-groupBy form
    // would shuffle every token occurrence at corpus scale. n_tokens is
    // Σ tf over the doc's distinct tokens, folded in the SAME partial
    // aggregation as the score (r21 — the former per-doc interpreted
    // `aggregate` fold fell out of whole-stage codegen).
    val tf = corpus
      .withColumn("_tfp", graft.functions.TextRuns.tokenTf(col(textCol)))
      .select(keyCols :+ explode(col("_tfp")).as("p"): _*)
      .select(keyCols :+ col("p.w").as("w") :+ col("p.tf").as("tf"): _*)
    tf.join(broadcast(dfIdf), Seq("w"), "left")
      .withColumn("wscore",
        when(col("idf_q16").isNotNull, col("tf") * col("idf_q16"))
          .otherwise(lit(0L)))
      .groupBy(idCol, keepCols: _*)
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("idf_q16").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(col("wscore")).as("tfidf_q16"))
  }

  /** Whole-bit average weight bucket: (tfidf // n_tokens) // 16. */
  def weightBucket(tfidf: Column, nTokens: Column): Column =
    VectorOps.floorDiv(VectorOps.floorDiv(tfidf, nTokens), lit(16L))

  /**
   * BM25 top-k retrieval (Okapi, k1 = 1.2, b = 0.75) for a fixed query
   * term set — the ranking stage of retrieval-based decontamination and
   * RAG-corpus indexing. Exact integer arithmetic throughout: with
   * k1 = 12/10 and b = 3/4 the per-term contribution folds to
   *
   *   idf_q16(t) · 22 · tf · avgdl  DIV  (10·avgdl·tf + 3·avgdl + 9·dl)
   *
   * (k1+1 = 22/10; k1·(1−b+b·dl/avgdl) = (3·avgdl+9·dl)/(10·avgdl); the
   * 10·avgdl numerator/denominator pair cancels the rationals), with
   * idf_q16 = l2q16(N) − l2q16(df) — no float anywhere, so DuckDB replays
   * every score bit-for-bit.
   *
   * Scale shape (100 TB corpus): the query-term statistics (df per term,
   * N, Σdl) fold into ONE slim partial-aggregated pass — per-term tf is
   * computed in the row from the single-tokenization [[graft.functions.TextRuns.tokenTf]]
   * pair array, so token occurrences never shuffle; the resulting
   * (term, idf) model is a handful of scalars served as plan literals
   * (the q140 NB pattern), scoring is map-only, and the top-k is
   * TakeOrdered (no global sort exchange). Reference capability class:
   * per-row transforms over a broadcast model (pkg/filter expression
   * stages); ranking semantics per the public Okapi BM25 formulation.
   */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    val withTf = corpus
      .withColumn("_tfp", graft.functions.TextRuns.tokenTf(col(textCol)))
      .select(col(idCol) +:
        aggregate(col("_tfp"), lit(0L),
          (acc, p) => acc + p.getField("tf")).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          coalesce(
            try_element_at(filter(col("_tfp"),
              p => p.getField("w") === lit(t)), lit(1)).getField("tf"),
            lit(0L)).as(s"_tf$i")
        }: _*)
    // control-plane scalars: one slim agg row → (df per term, N, Σdl);
    // the corpus never shuffles (partial-agg all the way down)
    val statsRow = withTf.agg(
      count(lit(1)).as("nd"),
      sum(col("dl")).as("sumdl") +:
        terms.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i")): _*)
      .collect()(0)
    val nd = statsRow.getAs[Long]("nd")
    val avgdl = statsRow.getAs[Long]("sumdl") / nd // floor: deterministic
    val idf = terms.indices.map { i =>
      val df = statsRow.getAs[Long](s"_df$i")
      if (df == 0L) 0L else TextLm.l2q16Long(nd) - TextLm.l2q16Long(df)
    }
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i")
      when(tf > 0,
        VectorOps.floorDiv(lit(idf(i) * 22L * avgdl) * tf,
          lit(10L * avgdl) * tf + lit(3L * avgdl) + lit(9L) * col("dl")))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val nHit = terms.indices.map(i =>
      when(col(s"_tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    withTf
      .select(col(idCol), col("dl"), nHit.as("n_hit"), score.as("score_q16"))
      .orderBy(col("score_q16").desc, col(idCol))
      .limit(k)
  }

  /**
   * Class-based TF-IDF (the BERTopic c-TF-IDF formulation): treat each
   * cluster as one pseudo-document and surface its most characteristic
   * terms, W(t,c) = tf(t,c) · log(1 + A/f(t)) with A = average tokens per
   * class and f(t) = corpus frequency — in exact fixed point,
   * score_q16 = tf_c · (l2q16(f + A) − l2q16(f)). The "name the clusters"
   * stage after k-means/dedup grouping.
   *
   * Scale shape: ONE corpus shuffle (the partial-aggregated
   * (class, term) count); f(t) and A derive from that bounded gram table
   * (Σ over classes — the corpus is never re-read), and the per-class
   * top-k window runs over vocab×classes rows, ≪ corpus at any scale.
   * Returns (classCol, rank, term, tf_c, score_q16), rank 1..topK by
   * (score desc, term asc).
   */
  def cTfIdf(docs: DataFrame, classCol: String, textCol: String,
             topK: Int): DataFrame =
    cTfIdfFromCounts(classTermCounts(docs, classCol, textCol), classCol, topK)

  /** The ONE corpus-scale pass of c-TF-IDF: partial-aggregated
    * (class, term) occurrence counts. Callers persist this (it is
    * vocab × classes — bounded at any corpus size) so the scoring stage
    * derives f(t), A and the ranking from it without re-reading the
    * corpus. */
  def classTermCounts(docs: DataFrame, classCol: String,
                      textCol: String): DataFrame =
    docs
      .select(col(classCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(classCol, "term").agg(count(lit(1)).as("tf_c"))

  /** Scoring/ranking half of [[cTfIdf]] over an (optionally persisted)
    * [[classTermCounts]] table: f(t) = Σ_c tf_c and A = Σtf // classes
    * come from the counts table itself, the f-table joins back by
    * BROADCAST (vocab-bounded), and the per-class top-k window ranks
    * vocab × classes rows — the corpus is never touched here. */
  def cTfIdfFromCounts(ctf: DataFrame, classCol: String,
                       topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ft = ctf.groupBy("term").agg(sum(col("tf_c")).as("f"))
    val consts = ctf.agg(
      VectorOps.floorDiv(sum(col("tf_c")),
        countDistinct(col(classCol))).as("a"))
    val w = Window.partitionBy(col(classCol))
      .orderBy(col("score_q16").desc, col("term"))
    ctf.join(broadcast(ft), Seq("term"))
      .crossJoin(broadcast(consts))
      .withColumn("score_q16",
        col("tf_c") * (TextLm.l2q16(col("f") + col("a")) - TextLm.l2q16(col("f"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(classCol), col("rank"), col("term"), col("tf_c"),
        col("score_q16"))
  }
}
