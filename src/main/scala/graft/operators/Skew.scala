package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot keys (SURVEY.md §4 "hot-span splitting" analog).
 * AQE's skew-join handles most cases at runtime
 * (spark.sql.adaptive.skewJoin.enabled, on by default); these helpers
 * cover the two places AQE can't: aggregations whose partial combine is
 * defeated by a single mega-key, and broadcast-ineligible joins against a
 * skewed fact side.
 */
object Skew {

  /**
   * Salted two-phase aggregation: phase 1 aggregates (key, salt) — the hot
   * key's rows spread over `salts` reducers — phase 2 folds the partials.
   * Caller supplies associative partial/final agg pairs.
   */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int,
                partial: Seq[Column], fin: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(fin.head, fin.tail: _*)

  /**
   * Salted join of a skewed big side against a small-but-not-broadcastable
   * dim side: big rows get a random salt in [0, salts); the dim side is
   * exploded `salts`× so every (key, salt) bucket finds its match. Shuffle
   * keys become (key, salt) — the hot key's rows land on `salts` reducers.
   */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val dimExploded = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigSalted.join(dimExploded, Seq(key, "_salt")).drop("_salt")
  }
}
