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
    val nd = corpus.agg(count(lit(1)).as("nd")) // one row, broadcast
    // tf per distinct token computed IN the row (one tokenization pass,
    // graft.functions.TextRuns.tokenTf) — the explode-then-groupBy form
    // would shuffle every token occurrence at corpus scale; n_tokens folds
    // from the pair array rather than re-splitting the text
    val tf = corpus
      .withColumn("_tfp", graft.functions.TextRuns.tokenTf(col(textCol)))
      .select(keyCols
        :+ aggregate(col("_tfp"), lit(0L),
          (acc, p) => acc + p.getField("tf")).as("n_tokens")
        :+ explode(col("_tfp")).as("p"): _*)
      .select(keyCols :+ col("n_tokens") :+ col("p.w").as("w")
        :+ col("p.tf").as("tf"): _*)
    tf.join(broadcast(df), Seq("w"), "left")
      .crossJoin(broadcast(nd))
      .withColumn("wscore",
        when(col("df").isNotNull,
          col("tf") * (TextLm.l2q16(col("nd")) - TextLm.l2q16(col("df"))))
          .otherwise(lit(0L)))
      .groupBy((idCol +: keepCols :+ "n_tokens").map(col): _*)
      .agg(sum(when(col("df").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(col("wscore")).as("tfidf_q16"))
  }

  /** Whole-bit average weight bucket: (tfidf // n_tokens) // 16. */
  def weightBucket(tfidf: Column, nTokens: Column): Column =
    VectorOps.floorDiv(VectorOps.floorDiv(tfidf, nTokens), lit(16L))
}
