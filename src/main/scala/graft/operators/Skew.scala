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

  /**
   * Skew DIAGNOSIS — the report that feeds [[saltedAgg]]/[[saltedJoin]]
   * their `salts` knob instead of a guess: per key, exact row count,
   * parts-per-million share, and the recommended salt factor
   * ⌈n_rows · P / total⌉ (the number of average-sized reducer shares the
   * key's rows occupy). A key is flagged hot when its rows exceed
   * `factor` × the average partition share (n · P > factor · total —
   * pure integer comparison). One partial-agg shuffle bounded by key
   * cardinality; for open-domain keys at 100 TB the same report runs off
   * the count-min path (q148) — low-cardinality group-bys, the classic
   * skew cliff, are exact here.
   */
  def skewPlan(df: DataFrame, keyCol: String, nPartitions: Int,
               factor: Int = 2): DataFrame = {
    import graft.core.Exact.idiv
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum("n_rows").as("_total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n_rows") * nPartitions > lit(factor.toLong) * col("_total"))
      .select(col("key"), col("n_rows"),
        idiv(col("n_rows") * 1000000L, col("_total")).as("share_ppm"),
        idiv(col("n_rows") * nPartitions + col("_total") - 1L, col("_total"))
          .as("salts"))
  }
}
