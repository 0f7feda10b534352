package graft.operators

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- HyperLogLog distinct-count sketch -----------------------------

  /**
   * HyperLogLog register table over a pre-hashed key column (Flajolet et
   * al., "HyperLogLog: the analysis of a near-optimal cardinality
   * estimation algorithm", AofA 2007): bucket = low p bits of the hash,
   * rho = position of the first 1-bit in the next `wBits` bits
   * (1..wBits+1), register = max rho per bucket. One row per NON-EMPTY
   * bucket; absent buckets are register 0. Callers hash whatever key
   * domain they count (tokens, n-grams, URLs) with [[Hashing.portableLong]].
   *
   * Scale shape: the explode partial-aggregates map-side, so the shuffle
   * carries at most 2^p rows per map partition however large the corpus —
   * distinct counting over 100 TB becomes a 2^p-row exchange (Spark's own
   * approx_count_distinct is the same sketch; this one is hash-portable so
   * the oracle replays every register, and registers from disjoint corpus
   * shards merge by max — the streaming/union form).
   *
   * rho is computed through `bin()` (minimal-length binary string, both
   * engines): for s > 0 in a wBits-bit field, rho = wBits − bitlen(s) + 1,
   * and s = 0 means all wBits bits are zero → rho = wBits + 1. Pure
   * integers — no log2 floats anywhere.
   */
  def hllRegisters(hashed: DataFrame, hCol: String, p: Int, wBits: Int): DataFrame = {
    require(p >= 4 && p <= 16 && wBits >= 8 && wBits <= 32)
    val m = 1L << p
    hashed
      .select(col(hCol).as("h"))
      .select(pmod(col("h"), lit(m)).as("b"),
        pmod(expr(s"h DIV $m"), lit(1L << wBits)).as("s"))
      .select(col("b"),
        when(col("s") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("s")))).as("rho"))
      .groupBy("b")
      .agg(max(col("rho")).cast("long").as("reg"))
  }

  /**
   * All-integer HLL estimate from a register table: the raw HLL estimator
   * E = α_m · m² / Σ 2^(−reg) computed in exact integer arithmetic —
   * Σ 2^(−reg) is held as S = Σ 2^(R − reg) over all m registers
   * (R = wBits+1 ≥ any register, missing registers contribute 2^R), so
   * E = α_ppm · m² · 2^R / S / 10⁶ with integer divisions. Deterministic
   * in any engine; the small-range linear-counting correction is a
   * production concern (it needs ln) and deliberately outside the gate.
   * Returns one row: (n_buckets_hit, max_reg, reg_check, est_distinct).
   */
  def hllEstimate(regs: DataFrame, p: Int, wBits: Int, alphaPpm: Long): DataFrame = {
    val m = 1L << p
    val r = wBits + 1
    val pow2R = 1L << r
    // α_ppm·m²·2^R precomputed exactly (throws on int64 overflow rather
    // than silently wrapping — keeps the integer estimator honest)
    val numer = Math.multiplyExact(Math.multiplyExact(alphaPpm, m * m), pow2R)
    regs
      .agg(count(lit(1)).as("n_buckets_hit"),
        max(col("reg")).as("max_reg"),
        sum((col("b") + 1L) * col("reg")).as("reg_check"),
        sum(expr(s"CAST(power(2, $r - reg) AS BIGINT)")).as("s_hit"))
      .withColumn("s_total",
        col("s_hit") + (lit(m) - col("n_buckets_hit")) * lit(pow2R))
      .withColumn("est_distinct",
        expr(s"${numer}L DIV s_total DIV 1000000"))
      .select("n_buckets_hit", "max_reg", "reg_check", "est_distinct")
  }

  // ---- Bloom filter --------------------------------------------------

  /**
   * Bloom-filter bit set over a long key column (Bloom, CACM 1970; the
   * membership structure CCNet-style pipelines use for cross-batch URL /
   * document-key dedup): k seeded integer mixes of the already-hashed key,
   * each mod m, bit set = the distinct position list. The "bit array" is a
   * table of SET positions (≤ m rows) — it broadcasts to probes, merges
   * across shards by union, and the oracle replays every bit.
   */
  def bloomBits(keys: DataFrame, keyCol: String, m: Long, k: Int): DataFrame = {
    require(m >= 2 && k >= 1 && k <= 16)
    keys.select(explode(array((0 until k).map { j =>
        pmod(Hashing.seededMix(col(keyCol), j), lit(m))
      }: _*)).as("pos"))
      .distinct()
  }

  /**
   * Probe the filter: per probe row, nset = how many of its k positions
   * are set; `maybe_seen` (the Bloom answer) ⇔ nset = k. No false
   * negatives by construction; false positives are exactly the
   * maybe_seen ∧ ¬truly-seen rows, which the gate counts.
   *
   * r21 reshape (guide §2.4 — remove shuffles outright): the former
   * explode(k positions) → broadcast join → groupBy(id, key) shape paid
   * one EXCHANGE over the whole probe set (k× row inflation into the
   * partial agg, then a corpus-grain shuffle) just to re-assemble rows it
   * had itself split. Now each of the k positions probes the SAME
   * broadcast bit relation through its own map-only left join (the k
   * joins reuse one broadcast exchange) and nset is an in-row sum — the
   * probe side is map-only end to end, nothing shuffles. nset is
   * identical: Σ_j 1[pos_j ∈ bits] either way (bits positions are
   * distinct, so a left join never duplicates a probe row). Output is
   * PROBE-ROW grain — callers must give rows distinct (id, key)s (the
   * old groupBy form collapsed duplicate ids into one row with a
   * meaningless summed nset; don't rely on that).
   */
  def bloomProbe(bits: DataFrame, probe: DataFrame, idCol: String,
      keyCol: String, m: Long, k: Int): DataFrame = {
    // one build subplan reused verbatim by all k joins (renames happen
    // AFTER each join) so ReuseExchange collapses them to a single
    // broadcast of the bit relation
    val bitsB = broadcast(
      bits.select(col("pos").as("_pos"), lit(1L).as("_set")))
    val withFlags = (0 until k).foldLeft(
      probe.select(col(idCol), col(keyCol))) { (df, j) =>
      df.withColumn("_pos", pmod(Hashing.seededMix(col(keyCol), j), lit(m)))
        .join(bitsB, Seq("_pos"), "left")
        .withColumnRenamed("_set", s"_s$j")
        .drop("_pos")
    }
    withFlags
      .withColumn("nset",
        (0 until k).map(j => coalesce(col(s"_s$j"), lit(0L))).reduce(_ + _))
      .drop((0 until k).map(j => s"_s$j"): _*)
      .withColumn("maybe_seen", (col("nset") === k.toLong).cast("int"))
      .select(col(idCol), col(keyCol), col("nset"), col("maybe_seen"))
  }

  /**
   * Mergeable equi-width histogram — the portable quantile sketch. The
   * corpus folds to (bin = value DIV binW, n) in one partial-aggregated
   * pass (per-partition state is bounded by the bin count, and two shards'
   * histograms merge by adding counts — the same mergeability contract as
   * the CMS/HLL sketches above); every downstream quantile read runs over
   * the tiny bin table. This is `approxQuantile`'s deterministic twin:
   * identical answers on every engine and run, with error bounded by the
   * bin width instead of a sampling guarantee.
   */
  def histogram(df: DataFrame, value: Column, binW: Long): DataFrame = {
    require(binW >= 1)
    df.select(VectorOps.floorDiv(value.cast("long"), lit(binW)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /**
   * Quantile read-out: for each requested percentile p (integer percent),
   * the smallest bin whose cumulative count reaches ceil(p·N/100), its
   * cumulative count, and the bin's inclusive upper bound b·w + w − 1 (the
   * conservative estimate: the true p-quantile is ≤ est, and ≥ est − w + 1).
   * The cumulative window runs over the BIN table, not the corpus —
   * single-partition by design, like the q160 vocab rank.
   */
  def histQuantiles(hist: DataFrame, binW: Long, percents: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = hist.sparkSession
    import spark.implicits._
    val cum = hist.withColumn("cum",
      sum(col("n")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.agg(sum(col("n")).as("n_total"))
    cum.crossJoin(broadcast(tot))
      .crossJoin(broadcast(percents.toDF("p")))
      .filter(col("cum") * 100L >= col("p") * col("n_total")) // cum ≥ ceil(pN/100)
      .groupBy("p")
      .agg(min(col("bin")).as("bin"),
        min_by(col("cum"), col("bin")).as("cum_le"),
        first(col("n_total")).as("n_total"))
      .withColumn("est_upper", col("bin") * binW + (binW - 1L))
      .select("p", "bin", "cum_le", "est_upper", "n_total")
  }
}
