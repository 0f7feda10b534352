package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Exact, Hashing}

/**
 * Weighted sampling WITHOUT replacement in one distributed pass — the
 * Efraimidis–Spirakis exponential-key scheme (priority = −ln(u)/w, keep
 * the k smallest), the standard way to draw a weighted subset of a 100 TB
 * corpus without ever centralizing it: every row computes its own
 * priority, and the k smallest survive a `TakeOrderedAndProject` —
 * per-partition top-k then a single k-row reduction to the driver, ZERO
 * shuffle of the data itself (PlanShapeSpec pins the plan).
 *
 * Determinism: u is the portable seeded hash ([[Hashing.seeded]], so the
 * "randomness" replays in any engine), and −ln(u/M) is monotone-replaced
 * by its exact fixed-point twin (l2q8(M) − l2q8(u)) — log2 with an 8-bit
 * mantissa whose 256-entry table is derived by EXACT integer arithmetic
 * (bitLength of m^256 — no float log anywhere, so no platform rounding).
 * Quantization makes priorities coarser than real Gumbel keys (ties break
 * by id, deterministically); production pipelines that don't need an
 * oracle can swap u for `rand(seed)` and a float log with the identical
 * selection algebra.
 *
 * Reference context: the reference samples tables for chunking via
 * random split points (capability A4); this is the corpus-curation
 * counterpart (mixture subsampling by quality weight, the q92/q159
 * consumers).
 */
object Sampling {

  val M = 1L << 20 // hash-uniform domain: u ∈ [1, M]

  /** floor(256·log2(m)) for m ≥ 1, exact: bitLength(m^256) − 1. */
  def l2q8Long(m: Long): Long = {
    require(m >= 1, s"l2q8 domain: $m")
    BigInt(m).pow(256).bitLength - 1
  }

  /** 256-entry mantissa table: table(i) = floor(256·log2((i+256)/256)). */
  val MantissaQ8: Array[Long] =
    Array.tabulate(256)(i => l2q8Long(i + 256L) - 2048L)

  /** Column twin of [[l2q8Long]] for x in [1, 2^40): e·256 + table lookup.
    * All intermediates stay exact (x·256 < 2^48; the one division is by a
    * power of two ≤ 2^40, both exactly representable as doubles). */
  def l2q8(x: Column): Column = {
    val e = (length(bin(x.cast("long"))) - 1).cast("long")
    val p2 = pow(lit(2.0), e.cast("double")).cast("long")
    val a = x.cast("long") * 256L
    val m = ((a - pmod(a, p2)) / p2).cast("long") // floor(256x / 2^e)
    val table = array(MantissaQ8.map(v => lit(v)): _*)
    e * 256L + element_at(table, (m - 255L).cast("int"))
  }

  /** The A-ES priority: ((l2q8(M) − l2q8(u)) · 2^16) div max(w, 1) with
    * u = seeded hash of the id — shared by the global and per-group
    * samplers. */
  def priorityQ(id: Column, weight: Column, seed: Int): Column = {
    val u = pmod(Hashing.seeded(id, lit(seed)), lit(M)) + 1L
    val w = greatest(weight.cast("long"), lit(1L))
    Exact.idiv((lit(256L * 20L) - l2q8(u)) * 65536L, w)
  }

  /** Draw `k` rows of `df` without replacement, inclusion pressure ∝
    * weight (clamped ≥ 1): the k smallest (priority, id) via one map
    * pass + TakeOrdered top-k; no shuffle. */
  def weightedSampleK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Int): DataFrame =
    df.withColumn("priority_q", priorityQ(col(idCol), col(weightCol), seed))
      .orderBy(col("priority_q"), col(idCol))
      .limit(k)

  /**
   * Stratified variant: k rows PER GROUP, same priority algebra. The
   * per-group rank runs as a window over (priority, id) — Spark's
   * `WindowGroupLimit` pushes the `rank <= k` limit MAP-SIDE below the
   * exchange (PlanShapeSpec pins it), so at 100 TB each partition ships
   * at most k rows per group it holds, not its whole slice.
   */
  def weightedSampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("priority_q", priorityQ(col(idCol), col(weightCol), seed))
      .withColumn("_g_rn", row_number().over(Window.partitionBy(col(groupCol))
        .orderBy(col("priority_q"), col(idCol))))
      .filter(col("_g_rn") <= k)
      .drop("_g_rn")
  }

  /** DuckDB twins — keep in lockstep with the builders above. */
  object Sql {
    /** `e` must be a parenthesized expression (expanded 3 times). */
    def l2q8(e: String): String = {
      val lg = s"(length(bin(CAST($e AS BIGINT))) - 1)"
      val table = MantissaQ8.mkString("[", ",", "]")
      s"($lg * 256 + ($table)[CAST((($e * 256) >> $lg) AS INT) - 255])"
    }

    def u(idExpr: String, seed: Int): String =
      s"(${Hashing.Sql.portableLong(s"($idExpr || '#$seed')")} % ${M}) + 1"
  }
}
