package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parameterized synthetic change-stream generator (FIXTURES.md §2.1): an
 * ordered I/U/D envelope sequence derived deterministically from seeded
 * hashes, with configurable update/delete mix, key-churn probability, and
 * txn grouping. Used by property tests; the ratios steer which operators
 * get exercised (churn → update-split C1; grouping → txn batching C4).
 * Every derivation is a pure column expression of (seed, i) — the same
 * stream regenerates identically anywhere, with no driver-side RNG state.
 */
object ChangeGen {

  final case class Config(seed: Long = 42L, n: Int = 1000, keySpace: Int = 100,
                          updatePct: Int = 30, deletePct: Int = 10,
                          churnPct: Int = 10, txnSize: Int = 4)

  def generate(spark: SparkSession, cfg: Config): DataFrame = {
    val i = col("id")
    def h(salt: Int) = pmod(Hashing.portableLong(
      concat_ws("_", lit(cfg.seed), i.cast("string"), lit(salt))), lit(100L))
    val opRoll = h(1)
    val op = when(opRoll < cfg.deletePct, "D")
      .when(opRoll < cfg.deletePct + cfg.updatePct, "U")
      .otherwise("I")
    val pk = pmod(Hashing.portableLong(
      concat_ws("_", lit(cfg.seed), i.cast("string"), lit("k"))), lit(cfg.keySpace.toLong))
    val churn = op === "U" && h(2) < cfg.churnPct
    val commitTs = lit(1000L) + (i / cfg.txnSize).cast("long")
    val value = (h(3) * 100 + h(4)).cast("double") / 100d
    spark.range(cfg.n).select(
      i.as("seq"),
      op.as("op"),
      commitTs.as("commit_ts"),
      (commitTs - 1).as("start_ts"),
      pmod(i, lit(3L)).cast("int").as("source_id"),
      lit("gen").as("schema_name"),
      concat(lit("t"), pmod(pk, lit(4L)).cast("string")).as("table_name"),
      pk.as("pk"),
      (pk + when(churn, lit(cfg.keySpace.toLong)).otherwise(0L)).as("pk_after"),
      when(op === "I", lit(null).cast("double")).otherwise(value - 1).as("val_before"),
      when(op === "D", lit(null).cast("double")).otherwise(value).as("val_after"),
      lit("gen").as("etype"))
  }
}
