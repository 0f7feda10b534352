package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Iterative graph centrality — PageRank in EXACT fixed point, the
 * domain/source-ranking stage of web curation (Common-Crawl-style corpus
 * weighting ranks registered domains by link centrality before mixing).
 * The q67/q150 connected-components tier answers "which nodes are the
 * same"; this answers "which nodes matter".
 *
 * All mass is parts-per-million integers: contribution = p(src) div
 * outdeg(src) (integral division — the deterministic mass loss is the
 * price of cross-engine exactness and is identical in both engines),
 * p'(v) = (1−d) · 10^6 + d · Σ contrib, with d = 0.85 applied as
 * (850000 · Σ) div 10^6. Dangling-node mass is dropped, not
 * redistributed (documented; add self-loops upstream if the uniform
 * redistribution variant is wanted).
 *
 * Scale shape: per iteration ONE shuffle — contributions aggregate by
 * destination (partial-agg combinable); the rank vector is |V| rows
 * (≪ |E|), joined to the edge list by source. No driver state, no
 * collect; iterations chain as plan stages (checkpoint every ~10 rounds
 * for long runs — the q186/NOTES localCheckpoint rule).
 */
object Graphs {

  val Ppm = 1_000_000L

  private def idiv(n: Column, d: Column): Column = graft.core.Exact.idiv(n, d)

  /**
   * `iters` rounds of exact-ppm PageRank over `edges` (src, dst) with
   * damping `dPpm`/10^6. Returns (node, pr_ppm). Nodes = every id
   * appearing as src or dst; initial rank = 10^6 each.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dPpm: Long = 850_000L): DataFrame = {
    require(iters >= 0 && dPpm >= 0 && dPpm <= Ppm, s"iters=$iters d=$dPpm")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct().persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // r20: per-iteration work hoisted out of the loop — the old loop
    // re-joined the RAW edge list against outdeg every round. Multi-edges
    // collapse to (src, dst, m) with the contribution scaled by m
    // (m · ⌊pr/deg⌋ ≡ the per-edge sum, bit-exact), and the degree join
    // happens once; each round is then ONE join + ONE dst aggregation
    // over the strictly smaller distinct-edge table.
    val ed = e.groupBy("src", "dst").agg(count(lit(1)).as("m"))
      .join(outdeg, "src")
      .persist()
    try {
      var pr = nodes.select(col("node"), lit(Ppm).as("pr_ppm"))
      for (i <- 1 to iters) {
        val contrib = ed.join(pr, ed("src") === pr("node"))
          .select(col("dst"),
            (col("m") * idiv(col("pr_ppm"), col("deg"))).as("c"))
          .groupBy("dst").agg(sum("c").as("in_mass"))
        pr = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
          .select(col("node"),
            (lit(Ppm - dPpm) +
              idiv(lit(dPpm) * coalesce(col("in_mass"), lit(0L)), lit(Ppm)))
              .as("pr_ppm"))
        // cut the lineage every ~10 rounds — without this, long runs grow a
        // quadratic plan (analyzer/codegen blowup + re-evaluation per action)
        if (i % 10 == 0 && i < iters) pr = pr.localCheckpoint(true)
      }
      // materialize before releasing the cached inputs
      pr.localCheckpoint(true)
    } finally { e.unpersist(); nodes.unpersist(); ed.unpersist(); () }
  }
}
