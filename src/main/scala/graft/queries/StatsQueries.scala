package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Hashing, Tables}
import graft.operators.{Curation, Dedup, Sketches, TextOps}

/**
 * Corpus-statistics gates: the sketch/report layer a 100 TB curation
 * pipeline runs beside the filters — cardinality sketches (HyperLogLog),
 * membership filters (Bloom), classifier threshold calibration (PR sweep),
 * temperature-flattened mixture planning, and vocabulary-coverage curves
 * for tokenizer sizing. Every gate is exact-integer end to end so the
 * DuckDB oracle replays registers/bits/curves bit-for-bit.
 */
object StatsQueries {

  private val SqlToks = TextOps.Sql.tokens

  // ---- q156: HyperLogLog distinct-token sketch -----------------------

  private val HllP = 8 // 2^8 = 256 registers
  private val HllW = 24 // rho domain: 24 suffix bits
  private val HllAlphaPpm = 718272L // α_256 = 0.7213/(1+1.079/256), in ppm
  private val HllNumer = // α_ppm · m² · 2^(w+1), exact
    Math.multiplyExact(Math.multiplyExact(HllAlphaPpm, 256L * 256L), 1L << 25)

  /**
   * q156 — HyperLogLog distinct n-gram estimate next to the exact count —
   * the LM-sizing statistic ("how many distinct trigrams does this corpus
   * contain") that is itself a big-data problem at 100 TB. The register
   * table is 2^p rows however large the corpus (partial agg bounds the
   * shuffle like q148's CMS); the estimate is the raw HLL harmonic mean
   * computed in EXACT integer arithmetic (see [[Sketches.hllEstimate]]),
   * so the oracle replays every register AND the estimate itself. The
   * exact distinct count rides along as the sketch's accuracy witness
   * (expected |est−exact|/exact ≈ 1.04/√256 ≈ 6.5 %); `reg_check` pins
   * all 256 registers, not just the summary. The trigram domain is
   * deliberate: the synthetic corpus has a ~31-word vocabulary, so
   * unigrams sit in HLL's small-range regime where the raw estimator is
   * biased (that regime belongs to linear counting) — trigrams put the
   * gate where the sketch actually operates.
   */
  val hllDistinct = GateQuery(
    "q156_hll_distinct",
    Some(s"""WITH toks AS (
            |  SELECT ${Hashing.Sql.portableLong("g")} AS h
            |  FROM (SELECT unnest(${Dedup.Sql.shingles("text", 3)}) AS g FROM documents)
            |), mapped AS (
            |  SELECT h % 256 AS b, (h // 256) % 16777216 AS s FROM toks
            |), regs AS (
            |  SELECT b, max(CASE WHEN s = 0 THEN 25
            |                     ELSE 25 - length(bin(s)) END) AS reg
            |  FROM mapped GROUP BY b
            |), agg AS (
            |  SELECT count(*) AS n_buckets_hit,
            |    CAST(max(reg) AS BIGINT) AS max_reg,
            |    CAST(sum((b + 1) * reg) AS BIGINT) AS reg_check,
            |    CAST(sum(CAST(power(2, 25 - reg) AS BIGINT)) AS BIGINT) AS s_hit
            |  FROM regs
            |)
            |SELECT (SELECT count(*) FROM toks) AS n_grams,
            |  (SELECT count(DISTINCT h) FROM toks) AS n_exact,
            |  n_buckets_hit, max_reg, reg_check,
            |  CAST($HllNumer // (s_hit + (256 - n_buckets_hit) * 33554432)
            |    // 1000000 AS BIGINT) AS est_distinct
            |FROM agg""".stripMargin)) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    // ONE corpus explode and ONE shuffle: the (h, multiplicity) table
    // carries everything — n_grams = Σc, n_exact = |rows|, and the HLL
    // registers are dedup-invariant (max rank per bucket). The pre-fix
    // shape re-ran the explode per branch (the q216 disease, 2× here).
    // r20: the gram hashes come from the in-row shingleHashSeq kernel
    // (identical md5 per gram, duplicates kept, same short-text fallback)
    // instead of explode(string grams)→md5 — the interpreted transform/
    // concat_ws chain and the gram-string materialization were the scan
    // bottleneck at 100× (guide §1.2 step 2 / §4.1: codegen kernels over
    // interpreted higher-order expressions).
    val byH = docs
      .select(explode(
        graft.functions.TextRuns.shingleHashSeq(col("text"), 3)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .persist()
    val regs = Sketches.hllRegisters(byH, "h", HllP, HllW)
    val est = Sketches.hllEstimate(regs, HllP, HllW, HllAlphaPpm)
    val exact = byH
      .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_exact"))
    val out = exact.crossJoin(est).persist()
    out.count()
    byH.unpersist()
    out
  }

  // ---- q157: Bloom-filter cross-batch membership ---------------------

  private val BloomK = 3

  /**
   * q157 — Bloom-filter membership for cross-batch exact dedup (the CCNet
   * URL-filter shape): the base corpus's normalized-text keys populate a
   * bit set sized FROM the measured base cardinality (m = 4·n_distinct,
   * the production sizing step — deliberately tight so the gate shows
   * real false positives), and the incoming batch (planted exact dups +
   * near-dups) probes it. Pins: every true dup flagged (n_false_neg = 0 —
   * the no-false-negative guarantee, in data), the EXACT false-positive
   * set (deterministic hashes ⇒ the oracle reproduces each collision),
   * and the bit count. Bits broadcast; probes never shuffle.
   */
  val bloomMembership = GateQuery(
    "q157_bloom_membership",
    Some {
      val keyE = Dedup.Sql.exactKey("text")
      val posE = // ((key % P) * (2j+3) + j) % P % m — seededMix with j a column
        s"((((key % ${Hashing.MixP}) * (2 * j + 3) + j) % ${Hashing.MixP})" +
          s" % (SELECT m FROM mb))"
      DocQueries.corpusCte +
        s""", basek AS (
           |  SELECT DISTINCT $keyE AS key FROM corpus WHERE doc_id < 100000
           |), mb AS (SELECT 4 * count(*) AS m FROM basek
           |), bits AS (
           |  SELECT DISTINCT $posE AS pos
           |  FROM basek, range(0, $BloomK) r(j)
           |), probe AS (
           |  SELECT doc_id AS id, $keyE AS key FROM corpus WHERE doc_id >= 100000
           |), probed AS (
           |  SELECT id, key,
           |    CAST(sum(CASE WHEN pos IN (SELECT pos FROM bits) THEN 1 ELSE 0 END)
           |      AS BIGINT) AS nset
           |  FROM (SELECT id, key, $posE AS pos
           |        FROM probe, range(0, $BloomK) r(j))
           |  GROUP BY id, key
           |), judged AS (
           |  SELECT id, CASE WHEN nset = $BloomK THEN 1 ELSE 0 END AS maybe_seen,
           |    CASE WHEN key IN (SELECT key FROM basek) THEN 1 ELSE 0 END AS truly
           |  FROM probed
           |)
           |SELECT count(*) AS n_probe,
           |  CAST(sum(maybe_seen) AS BIGINT) AS n_flagged,
           |  CAST(sum(CASE WHEN maybe_seen = 1 AND truly = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dup,
           |  CAST(sum(CASE WHEN maybe_seen = 1 AND truly = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           |  CAST(sum(CASE WHEN maybe_seen = 0 AND truly = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
           |  CAST(sum(CASE WHEN maybe_seen = 1 THEN id ELSE 0 END) AS BIGINT) AS flagged_id_check,
           |  (SELECT count(*) FROM bits) AS n_bits_set,
           |  (SELECT m FROM mb) AS m_bits
           |FROM judged""".stripMargin
    }) { (spark, dir) =>
    val c = DocQueries.corpus(spark, dir)
    val baseKeys = c.filter(col("doc_id") < 100000L)
      .select(Dedup.exactKey(col("text")).as("key")).distinct()
      .persist()
    val nBase = baseKeys.count() // the bloom sizing step (control-plane scalar)
    val m = 4L * nBase
    val bits = Sketches.bloomBits(baseKeys, "key", m, BloomK).persist()
    val probe = c.filter(col("doc_id") >= 100000L)
      .select(col("doc_id").as("id"), Dedup.exactKey(col("text")).as("key"))
    val judged = Sketches.bloomProbe(bits, probe, "id", "key", m, BloomK)
      .join(broadcast(baseKeys.withColumn("_in", lit(1))), Seq("key"), "left")
      .withColumn("truly", coalesce(col("_in"), lit(0)))
    val out = judged.agg(
        count(lit(1)).as("n_probe"),
        sum(col("maybe_seen").cast("long")).as("n_flagged"),
        sum(when(col("maybe_seen") === 1 && col("truly") === 1, 1L)
          .otherwise(0L)).as("n_true_dup"),
        sum(when(col("maybe_seen") === 1 && col("truly") === 0, 1L)
          .otherwise(0L)).as("n_false_pos"),
        sum(when(col("maybe_seen") === 0 && col("truly") === 1, 1L)
          .otherwise(0L)).as("n_false_neg"),
        sum(when(col("maybe_seen") === 1, col("id")).otherwise(0L))
          .as("flagged_id_check"))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
      .withColumn("m_bits", lit(m))
    val r = out.collect() // materialize before unpersisting the shared inputs
    baseKeys.unpersist()
    bits.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(r.toIndexedSeq, 1), out.schema)
  }

  // ---- q158: classifier threshold sweep (PR curve) -------------------

  private val ClsSeed = 3 // same hashed-feature family as q105

  /**
   * q158 — precision/recall threshold sweep for the hashed-feature
   * classifier (q105's serving path): per-token-normalized score vs the
   * heuristic quality label, swept over 11 thresholds. The corpus
   * collapses to a (score, label) histogram FIRST (one partial-agg
   * shuffle, ≤ ~200 distinct normalized scores), so the 11-way sweep
   * never rescans the data — the calibration shape at 100 TB. Counts and
   * ppm ratios are exact integers; -1 marks undefined precision.
   */
  val prCurve = GateQuery(
    "q158_pr_curve",
    Some {
      val ls = TextOps.Sql.linearScore("text", ClsSeed)
      val nt = TextOps.Sql.tokenCount("text")
      s"""WITH scored AS (
         |  SELECT (100 * ($ls)) // ($nt) AS snorm,
         |    CASE WHEN (${TextOps.Sql.qualityScore("text")}) >= 50 THEN 1 ELSE 0 END AS label
         |  FROM documents
         |), hist AS (
         |  SELECT snorm, label, count(*) AS n FROM scored GROUP BY 1, 2
         |), sweep AS (
         |  SELECT t,
         |    CAST(sum(CASE WHEN snorm >= t AND label = 1 THEN n ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN snorm >= t AND label = 0 THEN n ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN snorm < t AND label = 1 THEN n ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN snorm < t AND label = 0 THEN n ELSE 0 END) AS BIGINT) AS tn
         |  FROM hist, range(-100, 101, 20) r(t)
         |  GROUP BY t
         |)
         |SELECT t, tp, fp, fn, tn,
         |  CASE WHEN tp + fp = 0 THEN -1 ELSE (tp * 1000000) // (tp + fp) END AS precision_ppm,
         |  CASE WHEN tp + fn = 0 THEN -1 ELSE (tp * 1000000) // (tp + fn) END AS recall_ppm
         |FROM sweep""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val scored = Tables.load(spark, dir, "documents")
      .withColumn("score", TextOps.linearScore(col("text"), ClsSeed))
      .withColumn("ntok", TextOps.tokenCount(col("text")).cast("long"))
      .select(expr("(100 * score) DIV ntok").as("snorm"),
        when(TextOps.qualityScore(col("text")) >= 50, 1).otherwise(0).as("label"))
      .groupBy("snorm", "label")
      .agg(count(lit(1)).as("n"))
    val thresholds = (-100 to 100 by 20).toDF("t")
    scored.crossJoin(broadcast(thresholds))
      .groupBy("t")
      .agg(
        sum(when(col("snorm") >= col("t") && col("label") === 1, col("n"))
          .otherwise(0L)).as("tp"),
        sum(when(col("snorm") >= col("t") && col("label") === 0, col("n"))
          .otherwise(0L)).as("fp"),
        sum(when(col("snorm") < col("t") && col("label") === 1, col("n"))
          .otherwise(0L)).as("fn"),
        sum(when(col("snorm") < col("t") && col("label") === 0, col("n"))
          .otherwise(0L)).as("tn"))
      .withColumn("precision_ppm", when(col("tp") + col("fp") === 0, -1L)
        .otherwise(expr("(tp * 1000000) DIV (tp + fp)")))
      .withColumn("recall_ppm", when(col("tp") + col("fn") === 0, -1L)
        .otherwise(expr("(tp * 1000000) DIV (tp + fn)")))
  }

  // ---- q159: temperature-flattened mixture ---------------------------

  /**
   * q159 — temperature-scaled (τ = 1/2) domain mixture over `source`:
   * [[Curation.temperatureMixture]]'s exact-integer share^½ reweighting.
   * The gate pins raw shares, the isqrt weights, and the renormalized
   * ppm rates — a drifting isqrt correction or normalization order fails
   * it. Complements q92's explicit-weight plan (the two mixture modes a
   * training-data pipeline actually uses).
   */
  val temperatureMix = GateQuery(
    "q159_temperature_mix",
    Some {
      val nt = TextOps.Sql.tokenCount("text")
      s"""WITH d AS (
         |  SELECT source, CAST($nt AS BIGINT) AS toks FROM documents
         |), per AS (
         |  SELECT source, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS tokens
         |  FROM d GROUP BY source
         |), sh AS (
         |  SELECT source, n_docs, tokens,
         |    (tokens * 1000000) // (SELECT CAST(sum(tokens) AS BIGINT) FROM per) AS share_ppm
         |  FROM per
         |), w AS (
         |  SELECT source, n_docs, tokens, share_ppm,
         |    ${Curation.Sql.isqrt("share_ppm * 1000000")} AS w_sqrt
         |  FROM sh
         |)
         |SELECT source, n_docs, tokens, share_ppm, w_sqrt,
         |  (w_sqrt * 1000000) // (SELECT CAST(sum(w_sqrt) AS BIGINT) FROM w) AS temp_ppm
         |FROM w""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), TextOps.tokenCount(col("text")).cast("long").as("toks"))
    Curation.temperatureMixture(docs, "source", col("toks"))
      .select("source", "n_docs", "tokens", "share_ppm", "w_sqrt", "temp_ppm")
  }

  // ---- q160: vocabulary coverage curve -------------------------------

  /**
   * q160 — gram-coverage curve for tokenizer / phrase-table sizing: what
   * fraction of trigram OCCURRENCES do the top-V trigrams cover, for
   * V ∈ {100, 1000, 10000}? One corpus-scale shuffle (the gram-count
   * partial agg); the rank/coverage arithmetic runs over the GRAM table
   * (≪ corpus — this is the plan even at 100 TB, where the gram
   * vocabulary is millions against trillions of occurrences). Rank ties
   * break (count desc, gram asc) so the curve is deterministic; coverage
   * is exact ppm. Trigrams, not unigrams, for the same small-vocabulary
   * reason as q156.
   */
  val vocabCoverage = GateQuery(
    "q160_vocab_coverage",
    Some(s"""WITH toks AS (
            |  SELECT unnest(${Dedup.Sql.shingles("text", 3)}) AS t FROM documents
            |), vocab AS (
            |  SELECT t, count(*) AS cnt FROM toks GROUP BY t
            |), ranked AS (
            |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, t) AS rk FROM vocab
            |)
            |SELECT v, (SELECT count(*) FROM vocab) AS n_vocab,
            |  CAST(sum(CASE WHEN rk <= v THEN cnt ELSE 0 END) AS BIGINT) AS covered,
            |  (CAST(sum(CASE WHEN rk <= v THEN cnt ELSE 0 END) AS BIGINT) * 1000000)
            |    // (SELECT CAST(sum(cnt) AS BIGINT) FROM vocab) AS coverage_ppm
            |FROM ranked, (SELECT unnest([100, 1000, 10000]) AS v) u
            |GROUP BY v""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // r20: gram STRINGS from the in-row shingleStrings kernel (identical
    // strings — the rank ties break on the gram text, so the hash-kernel
    // swap q156 got would change results here); fuses tokenize+join into
    // one pass instead of the interpreted transform/concat_ws chain
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(
        graft.functions.TextRuns.shingleStrings(col("text"), 3)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
    // the rank runs over the vocab table, not the corpus — single-partition
    // window is deliberate (vocab ≪ corpus at any scale we target here;
    // at larger vocabs this becomes an orderBy + zipWithIndex shape)
    val ranked = vocab
      .withColumn("rk", row_number().over(Window.orderBy(col("cnt").desc, col("t"))))
    // vocab size and total mass fold into the SAME aggregation (count/sum
    // per v-group are both over the whole gram table) — a separate totals
    // subtree would recompute the corpus gram-agg a second time
    ranked.crossJoin(broadcast(Seq(100, 1000, 10000).toDF("v")))
      .groupBy("v")
      .agg(sum(when(col("rk") <= col("v"), col("cnt")).otherwise(0L)).as("covered"),
        count(lit(1)).as("n_vocab"),
        sum(col("cnt")).as("_tot"))
      .withColumn("coverage_ppm", expr("(covered * 1000000) DIV _tot"))
      .select("v", "n_vocab", "covered", "coverage_ppm")
  }

  // ---- q164: mergeable histogram quantiles ---------------------------

  private val HistBinW = 8L
  private val HistPercents = Seq(25, 50, 75, 90, 99)

  /**
   * q164 — mergeable equi-width histogram quantiles over per-document
   * token counts ([[Sketches.histogram]]/[[Sketches.histQuantiles]]):
   * `approxQuantile`'s deterministic twin, the corpus-length distribution
   * read every curation run needs (sequence-length planning, truncation
   * budgets). One bounded partial-agg pass builds the bin table (shards
   * merge by adding counts — the sketch mergeability contract); the
   * percentile read-out runs entirely over the bins. The gate pins, per
   * percentile, the chosen bin, its cumulative count, the conservative
   * upper-bound estimate, and N — exact integers, every bin replayed.
   */
  val histQuantiles = GateQuery(
    "q164_quantile_hist",
    Some {
      val nt = TextOps.Sql.tokenCount("text")
      s"""WITH hist AS (
         |  SELECT CAST($nt AS BIGINT) // $HistBinW AS bin, count(*) AS n
         |  FROM documents GROUP BY 1
         |), cum AS (
         |  SELECT bin, CAST(sum(n) OVER (ORDER BY bin
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM hist
         |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM hist)
         |SELECT p, min(bin) AS bin,
         |  CAST(arg_min(cum, bin) AS BIGINT) AS cum_le,
         |  CAST(min(bin) * $HistBinW + ${HistBinW - 1} AS BIGINT) AS est_upper,
         |  n_total
         |FROM cum CROSS JOIN tot
         |CROSS JOIN (SELECT unnest([${HistPercents.mkString(", ")}]) AS p) u
         |WHERE cum * 100 >= p * n_total
         |GROUP BY p, n_total""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    val hist = Sketches.histogram(
      docs, TextOps.tokenCount(col("text")).cast("long"), HistBinW)
    Sketches.histQuantiles(hist, HistBinW, HistPercents)
  }

  // ---- q181: CMS heavy hitters ----------------------------------------

  private val HhDepth = 4
  private val HhWidth = 16 // << vocab: forces real collisions → real FPs

  /**
   * q181 — heavy hitters through the count-min sketch (the CMS+threshold
   * selection of Cormode & Muthukrishnan 2005, §4): report every token
   * whose SKETCH estimate reaches T = total // 100. Because est ≥ exact
   * always (q148's one-sided guarantee), every true ≥ T token is
   * reported — NO false negative is possible by construction — while
   * collisions (width 16 ≪ vocab) can and here DO promote sub-threshold
   * tokens into the report; `is_true_hh` pins exactly which rows are
   * that one-sided error. Scale shape: the sketch build bounds its
   * shuffle at depth × width rows/partition; the candidate set is the
   * DISTINCT-token table (vocab-bounded, one partial-agg pass — at
   * 100 TB the only corpus-scale work); estimation joins the
   * BROADCAST sketch.
   */
  val cmsHeavyHitters = GateQuery(
    "q181_cms_heavy_hitters",
    Some {
      val toks = SqlToks.format("text")
      val jb = (h: String) =>
        s"(((($h) % ${Hashing.MixP}) * (2 * j + 3) + j) % ${Hashing.MixP}) % $HhWidth"
      s"""WITH tok AS (
         |  SELECT unnest($toks) AS t FROM documents
         |), exact AS (
         |  SELECT t, count(*) AS exact_cnt FROM tok GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(exact_cnt) // 100 AS BIGINT) AS thr FROM exact
         |), th AS (
         |  SELECT t, ${Hashing.Sql.portableLong("t")} AS h FROM tok
         |), js AS (
         |  SELECT unnest([${(0 until HhDepth).mkString(", ")}]) AS j
         |), cms AS (
         |  SELECT j, ${jb("h")} AS bucket, count(*) AS cnt
         |  FROM th CROSS JOIN js GROUP BY 1, 2
         |), est AS (
         |  SELECT t, min(coalesce(cnt, 0)) AS est_cnt
         |  FROM (SELECT t, j, ${jb(Hashing.Sql.portableLong("t"))} AS bucket
         |        FROM exact CROSS JOIN js) qb
         |  LEFT JOIN cms USING (j, bucket) GROUP BY 1
         |)
         |SELECT est.t AS token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
         |  CAST(est_cnt AS BIGINT) AS est_cnt,
         |  CASE WHEN exact_cnt >= thr THEN 1 ELSE 0 END AS is_true_hh
         |FROM est JOIN exact USING (t) CROSS JOIN tot
         |WHERE est_cnt >= thr""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val cms = Sketches.cmsBuild(docs, "text", HhDepth, HhWidth)
    val exact = docs
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .persist()
    val thr = exact.agg(sum(col("exact_cnt")).as("n")).collect()(0)
      .getLong(0) / 100L // control-plane scalar, like q162's model stats
    val out = Sketches.cmsEstimate(cms, exact.select("token"), "token",
        HhDepth, HhWidth)
      .join(exact, Seq("token"))
      .filter(col("est_cnt") >= thr)
      .select(col("token"), col("exact_cnt"), col("est_cnt"),
        when(col("exact_cnt") >= thr, 1).otherwise(0).as("is_true_hh"))
      .persist()
    out.count()
    exact.unpersist()
    out
  }

  // ---- q192: population-stability drift report ------------------------

  private val PsiBinW = 8L // token-count bucket width

  /**
   * q192 — population-stability index between two corpus slices (the
   * standard PSI drift monitor every production data pipeline runs
   * between yesterday's and today's feed), in exact fixed point: per
   * token-count bucket, slice shares in ppm (floor division) and the
   * PSI term (p−q)·(log2(p+1)−log2(q+1)) in q16 — log2 instead of ln
   * scales the index by a constant without touching its ordering or
   * zero point, and every step is integer so the oracle replays each
   * bucket's term bit-for-bit (the +1 dodges empty-bucket log(0) on
   * BOTH sides symmetrically). Scale shape: docs collapse to a
   * (slice, bucket) histogram FIRST — one partial-agg shuffle — and the
   * PSI arithmetic runs over the bounded bucket table.
   */
  val psiDrift = GateQuery(
    "q192_psi_drift",
    Some {
      val tc = TextOps.Sql.tokenCount("text")
      import graft.operators.TextLm
      s"""WITH d AS (
         |  SELECT doc_id % 2 AS slice, ($tc) // $PsiBinW AS bucket
         |  FROM documents
         |), h AS (
         |  SELECT bucket,
         |    CAST(sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         |    CAST(sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
         |  FROM d GROUP BY 1
         |), n AS (
         |  SELECT CAST(sum(cnt_a) AS BIGINT) AS na,
         |    CAST(sum(cnt_b) AS BIGINT) AS nb FROM h
         |), ppm AS (
         |  SELECT bucket, cnt_a, cnt_b,
         |    1000000 * cnt_a // na AS p_ppm,
         |    1000000 * cnt_b // nb AS q_ppm
         |  FROM h CROSS JOIN n
         |)
         |SELECT bucket, cnt_a, cnt_b, p_ppm, q_ppm,
         |  (p_ppm - q_ppm) *
         |    (${TextLm.Sql.l2q16("(p_ppm + 1)")} -
         |     ${TextLm.Sql.l2q16("(q_ppm + 1)")}) AS psi_q16
         |FROM ppm""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.{TextLm, VectorOps}
    val h = Tables.load(spark, dir, "documents")
      .select((col("doc_id") % 2).as("slice"),
        VectorOps.floorDiv(TextOps.tokenCount(col("text")).cast("long"),
          lit(PsiBinW)).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("slice") === 0, 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("slice") === 1, 1L).otherwise(0L)).as("cnt_b"))
    val n = h.agg(sum(col("cnt_a")).as("na"), sum(col("cnt_b")).as("nb"))
    h.crossJoin(broadcast(n))
      .withColumn("p_ppm",
        VectorOps.floorDiv(lit(1000000L) * col("cnt_a"), col("na")))
      .withColumn("q_ppm",
        VectorOps.floorDiv(lit(1000000L) * col("cnt_b"), col("nb")))
      .select(col("bucket"), col("cnt_a"), col("cnt_b"), col("p_ppm"),
        col("q_ppm"),
        ((col("p_ppm") - col("q_ppm")) *
          (TextLm.l2q16(col("p_ppm") + 1L) - TextLm.l2q16(col("q_ppm") + 1L)))
          .as("psi_q16"))
  }

  /**
   * q216 — HLL SET ALGEBRA: distinct-trigram overlap between two corpus
   * slices estimated from sketches alone — union registers merge by max
   * (the mergeability that makes the sketch shippable), intersection by
   * inclusion–exclusion est_a + est_b − est_union. At 100 TB this is
   * "how much vocabulary do two feeds share" from three 256-row
   * register tables instead of a distinct-join; the exact counts ride
   * along as the accuracy witness, and every register of all THREE
   * sketches replays in the oracle.
   */
  val hllSetOps = GateQuery(
    "q216_hll_setops",
    Some {
      def toks(where: String) =
        s"""SELECT ${Hashing.Sql.portableLong("g")} AS h FROM
           |  (SELECT unnest(${Dedup.Sql.shingles("text", 3)}) AS g
           |   FROM documents WHERE $where)""".stripMargin
      def regs(t: String) =
        s"""SELECT h % 256 AS b,
           |  max(CASE WHEN (h // 256) % 16777216 = 0 THEN 25
           |      ELSE 25 - length(bin((h // 256) % 16777216)) END) AS reg
           |FROM $t GROUP BY 1""".stripMargin
      def est(r: String) =
        s"""SELECT CAST($HllNumer //
           |  (sum(CAST(power(2, 25 - reg) AS BIGINT))
           |    + (256 - count(*)) * 33554432) // 1000000 AS BIGINT) AS v
           |FROM $r""".stripMargin
      s"""WITH ta AS (${toks("lang = 'en'")}),
         |tb AS (${toks("n_chars >= 200")}),
         |ra AS (${regs("ta")}), rb AS (${regs("tb")}),
         |ru AS (SELECT b, max(reg) AS reg FROM
         |  (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1),
         |ea AS (${est("ra")}), eb AS (${est("rb")}), eu AS (${est("ru")})
         |SELECT (SELECT v FROM ea) AS est_a, (SELECT v FROM eb) AS est_b,
         |  (SELECT v FROM eu) AS est_union,
         |  (SELECT v FROM ea) + (SELECT v FROM eb) - (SELECT v FROM eu)
         |    AS est_inter,
         |  (SELECT count(DISTINCT h) FROM ta) AS exact_a,
         |  (SELECT count(DISTINCT h) FROM tb) AS exact_b,
         |  (SELECT count(*) FROM (SELECT DISTINCT h FROM ta) x
         |    JOIN (SELECT DISTINCT h FROM tb) y USING (h)) AS exact_inter
         |""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    // r20: same kernel fusion as q156 — identical hashes, one in-row pass
    def hashes(cond: org.apache.spark.sql.Column) = docs.filter(cond)
      .select(explode(
        graft.functions.TextRuns.shingleHashSeq(col("text"), 3)).as("h"))
    // The explode feeds FIVE branches (two register builds, the union
    // lineage, both exact-count witnesses and their join) — Spark has no
    // cross-branch CSE, so without a persist each branch re-runs the
    // full trigram explode. Persist the distinct-ed hash sets (smaller
    // than the raw explode, and distinct() is what four of the five
    // branches need anyway); the registers group the same rows.
    val (ha, hb) = (hashes(col("lang") === "en").distinct().persist(),
      hashes(col("n_chars") >= 200).distinct().persist())
    val (ra, rb) = (Sketches.hllRegisters(ha, "h", HllP, HllW),
      Sketches.hllRegisters(hb, "h", HllP, HllW))
    val ru = ra.unionAll(rb).groupBy("b").agg(max("reg").as("reg"))
    def est(r: org.apache.spark.sql.DataFrame, as: String) =
      Sketches.hllEstimate(r, HllP, HllW, HllAlphaPpm)
        .select(col("est_distinct").as(as))
    val out = est(ra, "est_a").crossJoin(est(rb, "est_b"))
      .crossJoin(est(ru, "est_union"))
      .withColumn("est_inter",
        col("est_a") + col("est_b") - col("est_union"))
      .crossJoin(ha.agg(count(lit(1)).as("exact_a")))
      .crossJoin(hb.agg(count(lit(1)).as("exact_b")))
      .crossJoin(ha.join(hb, "h").agg(count(lit(1)).as("exact_inter")))
      .persist()
    out.count() // materialize the 1-row result before dropping the inputs
    ha.unpersist(); hb.unpersist()
    out
  }

  def all: Seq[GateQuery] =
    Seq(hllDistinct, bloomMembership, prCurve, temperatureMix, vocabCoverage,
      histQuantiles, cmsHeavyHitters, psiDrift, hllSetOps)
}
