package graft.operators

import graft.core.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Probabilistic sketches for corpus-scale term statistics. At 100 TB an
 * exact term→count table is itself a big-data problem (hundreds of
 * billions of distinct tokens); a count-min sketch caps the state at
 * depth × width counters with a one-sided error guarantee
 * (estimate ≥ true count, overestimate bounded by ε·N with
 * ε = e/width at probability 1 − (1/e)^depth — Cormode & Muthukrishnan,
 * "An Improved Data Stream Summary: The Count-Min Sketch and its
 * Applications", J. Algorithms 2005).
 *
 * Scale shape: the build explodes tokens IN-PARTITION and partial-
 * aggregates before the exchange, so the shuffle carries at most
 * depth × width rows per map partition no matter the corpus size — the
 * sketch table itself (≤ depth·width rows) then broadcasts to whoever
 * estimates. Hashes are the portable md5-based family
 * ([[Hashing.portableLong]] + the (a·x+b) mod p seeded mixes), so any
 * engine replays the exact counters.
 */
object Sketches {

  /**
   * Build the sketch table over a text column: one row per non-empty
   * (row j, bucket) counter, `cnt` = number of token OCCURRENCES hashing
   * there. Absent (j, bucket) pairs are zero counters.
   */
  def cmsBuild(df: DataFrame, textCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    val toks = df.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .select(Hashing.portableLong(col("t")).as("h"))
    toks.select(explode(array((0 until depth).map { j =>
        struct(lit(j).as("j"),
          pmod(Hashing.seededMix(col("h"), j), lit(width.toLong)).as("bucket"))
      }: _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Point-query the sketch: per query token, estimate = min over the
   * depth rows of that token's counters (a missing counter is 0). The
   * sketch side broadcasts — estimation is map-only against the queries.
   */
  def cmsEstimate(cms: DataFrame, queries: DataFrame, tokenCol: String,
      depth: Int, width: Int): DataFrame = {
    val qb = queries
      .withColumn("h", Hashing.portableLong(col(tokenCol)))
      .select(col(tokenCol), explode(array((0 until depth).map { j =>
        struct(lit(j).as("j"),
          pmod(Hashing.seededMix(col("h"), j), lit(width.toLong)).as("bucket"))
      }: _*)).as("jb"))
      .select(col(tokenCol), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
    qb.join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy(tokenCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
