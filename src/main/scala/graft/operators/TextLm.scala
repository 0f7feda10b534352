package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CCNet-style n-gram language-model scoring: build a bigram LM from a
 * held-in corpus slice, score every document's per-position surprisal
 * (add-one / add-V smoothed), and bucket documents by bits-per-gram —
 * the standard "perplexity filter" stage of a training-data pipeline
 * (reference capability class: per-row quality transforms, cf. the
 * reference's expression/event filter stages, pkg/filter).
 *
 * Scale shape (100 TB corpus):
 *   - the LM is built ONCE from a bounded slice and thresholded, so both
 *     LM tables broadcast; the corpus side is one map-only gram-kernel
 *     pass (each row tokenized exactly once, inside whole-stage codegen) +
 *     two broadcast hash joins — the corpus never shuffles gram strings.
 *   - the only exchange is the final (doc_id → bits) partial-aggregated
 *     groupBy, integer payload.
 *
 * Determinism: all arithmetic is INTEGER. Logarithms use a fixed-point
 * floor(16·log2 x) computed from the binary string length (exact floor
 * log2) plus a 16-entry mantissa correction table — no transcendental
 * function is evaluated at runtime in either engine, so Spark and the
 * DuckDB oracle agree bit-for-bit on every score.
 */
object TextLm {

  /** floor(16·log2(m/16)) for mantissa m = 16..31 (precomputed constants —
    * shared by both engines, never re-derived from floats at runtime). */
  private val MantissaQ16: Seq[Int] =
    Seq(0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 12, 13, 14, 15)

  /** Fixed-point log2 for integer x >= 1: 16·floor(log2 x) + T[m-16],
    * where e = floor(log2 x) comes from the binary-string length and the
    * mantissa cell m = floor(16x / 2^e) ∈ [16,31] indexes the precomputed
    * correction table. Within 1/16 bit of 16·log2 x (cell-boundary floor
    * error only) — and, the property that matters here, every step is
    * INTEGER (the one division is by a power of two with an exact double
    * representation and a quotient < 32), so both engines produce the
    * identical value for every x without evaluating any transcendental. */
  /** Driver-side integer twin of [[l2q16]] — same formula, same table,
    * bit-identical; used when a trained model's weights are finalized on
    * collected control-plane counts. */
  def l2q16Long(x: Long): Long = {
    require(x >= 1, s"l2q16 domain: $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val m = ((x * 16) >> e).toInt
    e.toLong * 16 + MantissaQ16(m - 16)
  }

  def l2q16(x: Column): Column = {
    val e = (length(bin(x.cast("long"))) - 1).cast("long")
    val p2 = pow(lit(2.0), e.cast("double")).cast("long")
    val a = x.cast("long") * 16L
    val m = ((a - pmod(a, p2)) / p2).cast("long") // floor(16x / 2^e)
    val table = array(MantissaQ16.map(v => lit(v.toLong)): _*)
    e * 16L + element_at(table, (m - 15L).cast("int"))
  }

  /** Per-position word bigrams: struct(w1, "w1 w2"); empty array below two
    * tokens. Occurrence grain (NOT distinct) — LM counts are true
    * frequencies. Delegates to the codegen'd one-pass kernel
    * [[graft.functions.TextRuns.gramPairs]]: the earlier
    * `transform(sequence(...), element_at(tokens, i))` form re-evaluated
    * `split` at every position (O(L²) per doc). */
  private def gramPairs(text: Column): Column =
    graft.functions.TextRuns.gramPairs(text)

  /** Unigram occurrence counts over the held-in slice: (w, cu). */
  def unigramLm(held: DataFrame, textCol: String, minCount: Long): DataFrame =
    held.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
      .filter(col("cu") >= minCount)

  /** Bigram occurrence counts over the held-in slice: (g, cb). The
    * threshold bounds the broadcast size (prod would add a top-K cap). */
  def bigramLm(held: DataFrame, textCol: String, minCount: Long): DataFrame =
    held.select(explode(gramPairs(col(textCol))).as("p"))
      .select(col("p.g").as("g"))
      .groupBy("g").agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)

  /**
   * Score documents against the LM: per bigram position,
   * bits_q = l2q16(cu(w1) + V) − l2q16(cb(w1 w2) + 1)  (×16 fixed point),
   * i.e. −log2 of the add-smoothed conditional probability. Returns doc
   * grain (id, n_grams, bits) for docs with at least one bigram. Both LM
   * joins are broadcast; unseen grams coalesce to count 0.
   *
   * INVARIANT: callers must build `uni`/`bi` with uniMinCount <= biMinCount
   * (as [[unigramLm]]/[[bigramLm]] from the same held-in slice then
   * guarantee cu + V >= cb + 1, so `bits` is non-negative). Violating it
   * can push l2q16's argument to 0/negative, where the fixed-point log2
   * (and DuckDB's `//` on negatives) silently diverge between engines.
   */
  def scoreDocs(corpus: DataFrame, uni: DataFrame, bi: DataFrame,
                idCol: String, textCol: String,
                keepCols: Seq[String] = Nil): DataFrame = {
    val vocab = uni.agg(count(lit(1)).as("v"))
    val keyCols = (idCol +: keepCols).map(col)
    corpus
      .select(keyCols :+ explode(gramPairs(col(textCol))).as("p"): _*)
      .select(keyCols :+ col("p.w1").as("w1") :+ col("p.g").as("g"): _*)
      .join(broadcast(uni.withColumnRenamed("w", "w1")), Seq("w1"), "left")
      .join(broadcast(bi), Seq("g"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("bits",
        l2q16(coalesce(col("cu"), lit(0L)) + col("v")) -
          l2q16(coalesce(col("cb"), lit(0L)) + 1L))
      .groupBy(idCol, keepCols: _*)
      .agg(count(lit(1)).as("n_grams"), sum(col("bits")).as("bits"))
  }

  /** Integer bits-per-gram bucket: (bits // n_grams) // 16 — the whole-doc
    * average surprisal floored to whole bits. */
  def bptBucket(bits: Column, nGrams: Column): Column =
    VectorOps.floorDiv(VectorOps.floorDiv(bits, nGrams), lit(16L))

  /** DuckDB SQL twins — keep in lockstep with the Column builders. */
  object Sql {
    private val Table = "[0,1,2,3,5,6,7,8,9,10,11,12,12,13,14,15]"

    /** `e` must be a PARENTHESIZED expression (it is expanded 3 times). */
    def l2q16(e: String): String = {
      val lg = s"(length(bin(CAST($e AS BIGINT))) - 1)"
      s"($lg * 16 + ($Table)[CAST((($e * 16) >> $lg) AS INT) - 15])"
    }

    /** Per-position bigram columns over a tokens array `t` (pair with
      * `unnest(range(len(t) - 1)) AS i` in the enclosing SELECT, the q68
      * pattern). */
    val gramW1 = "t[i + 1]"
    val gramG = "t[i + 1] || ' ' || t[i + 2]"
  }
}
