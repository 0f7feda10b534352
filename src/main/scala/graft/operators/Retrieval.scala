package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Multi-signal retrieval composition: reciprocal-rank fusion of
 * heterogeneous rankings (Cormack et al. 2009 — the standard way to merge
 * a lexical BM25 list with a dense-vector list) and maximal-marginal-
 * relevance re-ranking (Carbonell & Goldstein 1998 — the standard
 * redundancy-penalized selection for retrieval-augmented data prep).
 *
 * Scale shape (100 TB): both operators consume PER-QUERY BOUNDED
 * candidate lists (top-D from an upstream index — the q85 IVF probe or
 * the q162 BM25 scorer), so every join is on (query_id, candidate) rows,
 * queries × D of them, never corpus-sized; the corpus itself is touched
 * only by the upstream candidate generators. All scoring is exact
 * integer arithmetic, so results are bit-reproducible cross-engine.
 */
object Retrieval {

  /** 1e6-scaled reciprocal-rank summand: 1000000 // (k + rank) — integer
    * floor division keeps both engines bit-identical. */
  private def rrfTerm(rank: Column, k: Int): Column =
    when(rank.isNull, 0L)
      .otherwise(VectorOps.floorDiv(lit(1000000L), rank + k.toLong))

  /**
   * Reciprocal-rank fusion over the UNION of two ranked candidate lists
   * (each: query_id, neighbor_id, rank with rank 1-based and dense —
   * a candidate missing from one list contributes nothing for it):
   * rrf_ppm = Σ_list 1000000 // (rrfK + rank). Returns the per-query
   * top-`k` fused rows (query_id, rank, neighbor_id, rrf_ppm, r_a, r_b)
   * with absent per-list ranks reported as 0, fusion ties broken by
   * neighbor id.
   */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    val fused = a.withColumnRenamed("rank", "r_a")
      .join(b.withColumnRenamed("rank", "r_b"),
        Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf_ppm", rrfTerm(col("r_a"), rrfK) + rrfTerm(col("r_b"), rrfK))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("neighbor_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("rrf_ppm"),
        coalesce(col("r_a"), lit(0L)).as("r_a"),
        coalesce(col("r_b"), lit(0L)).as("r_b"))
  }

  /**
   * Greedy maximal-marginal-relevance selection with rational
   * λ = lamNum/lamDen held exactly: pick argmax of
   * lamNum·rel − (lamDen−lamNum)·max_{s∈selected} sim(cand, s)
   * (common denominator lamDen cancels in the argmax), ties by candidate
   * id; the first pick maximizes lamNum·rel alone. `pool` is
   * (query_id, doc_id, rel); `sims` is (query_id, a, b, sim) over ORDERED
   * pool pairs a ≠ b. Returns (query_id, pick 1..k, doc_id, mmr_q) where
   * mmr_q is the λ-scaled score at selection time.
   *
   * k driver-side rounds of bounded DataFrame algebra — each round is one
   * join + one window over queries × poolSize rows; nothing corpus-sized
   * moves, so the loop costs k small stages regardless of data scale.
   */
  def mmrSelect(pool: DataFrame, sims: DataFrame, k: Int,
                lamNum: Long, lamDen: Long): DataFrame = {
    val mu = lamDen - lamNum
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr_q").desc, col("doc_id"))
    var selected = pool
      .withColumn("mmr_q", lit(lamNum) * col("rel"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .withColumn("pick", lit(1)).drop("rn")
    for (i <- 2 to k) {
      val sel = selected.select(col("query_id"), col("doc_id").as("b"))
      val maxSim = sims.join(sel, Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a").as("doc_id"))
        .agg(max(col("sim")).as("max_sim"))
      val next = pool
        .join(sel.withColumnRenamed("b", "doc_id"),
          Seq("query_id", "doc_id"), "left_anti")
        .join(maxSim, Seq("query_id", "doc_id"), "left")
        .withColumn("mmr_q",
          lit(lamNum) * col("rel") - lit(mu) * coalesce(col("max_sim"), lit(0L)))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .withColumn("pick", lit(i)).drop("rn", "max_sim")
      selected = selected.unionByName(next)
    }
    selected.select(col("query_id"), col("pick"), col("doc_id"), col("mmr_q"))
  }
}
