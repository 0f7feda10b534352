package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Hashing

/**
 * Training-data curation operators: the pipeline steps between "deduped
 * corpus" and "training shards" — eval-set contamination checks,
 * deterministic (reproducible) sampling, token-budget packing, PII
 * scanning/redaction, and domain-mixture planning.
 *
 * Scale shapes (100 TB corpus):
 *   - contamination: the eval set is small by construction (thousands of
 *     docs) → its n-gram set broadcasts; the corpus side is ONE map-only
 *     explode + broadcast hash join — no corpus shuffle.
 *   - sampling: pure column predicate on a portable hash — map-only, no
 *     shuffle, reproducible across runs/engines (no RNG state).
 *   - packing: one window per hash-shard; shards bound the window state so
 *     no global ordering exists anywhere.
 *   - PII: per-row regexp extraction, map-only.
 *   - mixture plan: one tiny per-domain aggregate joined back broadcast.
 */
object Curation {

  // ---- eval-set contamination ---------------------------------------

  /** Distinct word-n-gram hashes per document, exploded: (id, gh).
    * Hash-first (integer join keys, not strings — at corpus scale the join
    * key bytes dominate the shuffle/broadcast size) via the codegen'd
    * [[graft.functions.TextRuns.shingleHashes]] kernel: gram strings are
    * hashed inside the row and never materialize as columns. Safe because
    * both join sides are ours — only the overlap COUNTS are
    * oracle-compared (the oracle joins raw grams). */
  def gramHashes(df: DataFrame, idCol: String, textCol: String, n: Int,
      idAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
      explode(graft.functions.TextRuns.shingleHashes(col(textCol), n)).as("gh"))

  /**
   * Contamination check: which corpus documents share >= minShared distinct
   * word n-grams with an eval-set document (train/test overlap, the
   * GPT-3/PaLM decontamination shape). Returns one row per contaminated
   * (eval_id, corp_id) pair with the shared-gram count.
   *
   * The eval side is broadcast — Spark's planner sees a small dimension and
   * picks a broadcast hash join, so the 100 TB corpus side never shuffles.
   */
  def contamination(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Int): DataFrame = {
    val ev = gramHashes(evalSet, idCol, textCol, n, "eval_id")
    val co = gramHashes(corpus, idCol, textCol, n, "corp_id")
    co.join(broadcast(ev), "gh")
      .filter(col("corp_id") =!= col("eval_id"))
      .groupBy("eval_id", "corp_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  // ---- deterministic sampling ---------------------------------------

  /** Parts-per-million scale for sampling rates — integer arithmetic end
    * to end so rates are exact cross-engine (no float rounding). */
  val Ppm = 1000000L

  /** Deterministic Bernoulli keep-predicate: hash(id) mod 1e6 < ratePpm.
    * Reproducible (same rows survive every run, any engine), map-only. */
  def sampleKeep(id: Column, ratePpm: Column): Column =
    pmod(Hashing.portableLong(id), lit(Ppm)) < ratePpm

  /**
   * Stratified + quality-weighted sampling: per-stratum base rate (ppm),
   * scaled down for rows that fail a quality predicate. The rate table is
   * a literal CASE chain (folds into codegen), not a join.
   */
  def stratifiedSample(df: DataFrame, idCol: String, stratum: Column,
      ratesPpm: Map[String, Long], defaultPpm: Long,
      qualityOk: Column, lowQualityScalePct: Int): DataFrame = {
    def chain(rates: Map[String, Long], dflt: Long) =
      rates.foldLeft(lit(dflt)) { case (acc, (s, r)) =>
        when(stratum === s, lit(r)).otherwise(acc)
      }
    // scale the low-quality rates at plan-build time — exact longs, no
    // runtime division to keep portable
    val scaled = ratesPpm.map { case (k, v) => k -> v * lowQualityScalePct / 100 }
    val rate = when(qualityOk, chain(ratesPpm, defaultPpm))
      .otherwise(chain(scaled, defaultPpm * lowQualityScalePct / 100))
    df.withColumn("rate_ppm", rate)
      .filter(sampleKeep(col(idCol), col("rate_ppm")))
  }

  // ---- token-budget packing -----------------------------------------

  /**
   * Pack documents into fixed token-budget bins ("sequence packing" for
   * training shards): shard by id hash, order within a shard by id, and cut
   * a new pack every `budget` cumulative tokens. The window partitions by
   * shard — state per partition is bounded by shard size, so the operator
   * scales by raising `shards`; there is no global ordering anywhere.
   * Greedy contiguous fill: a doc goes to the pack where its prefix-sum
   * lands (docs may straddle pack boundaries, as sequence packing does).
   */
  def packByTokenBudget(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Long, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(Hashing.portableLong(col(idCol)), lit(shards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("toks", tokensCol)
      .withColumn("pack_id", {
        val c = coalesce(sum(col("toks")).over(w), lit(0L))
        // exact int64 floor-division (see mixturePlan)
        ((c - pmod(c, lit(budget))) / budget).cast("long")
      })
  }

  // ---- corpus-wide boilerplate grams --------------------------------

  /**
   * Boilerplate detection (the RefinedWeb/CCNet "remove lines shared by
   * many pages" stage, at gram grain since the corpus has no line
   * structure): an n-gram appearing in at least `minDocs` DISTINCT
   * documents is boilerplate; each document reports what fraction of its
   * distinct grams are boilerplate. Two passes: the doc-frequency table
   * (hash-keyed, map-side combinable, thresholded → broadcast) and one
   * map-only join back — gram strings never shuffle (in-row hash kernel).
   * Returns (idAs, n_grams, n_boiler).
   */
  def boilerplateGrams(df: DataFrame, idCol: String, textCol: String,
                       n: Int, minDocs: Long, idAs: String): DataFrame = {
    val grams = gramHashes(df, idCol, textCol, n, idAs)
    val frequent = grams.groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
    grams.join(broadcast(frequent), Seq("gh"), "left")
      .groupBy(idAs)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df").isNotNull, 1L).otherwise(0L)).as("n_boiler"))
  }

  // ---- context-window chunking --------------------------------------

  /**
   * Split documents into fixed token windows with overlap — the
   * context-window chunking stage between "clean corpus" and "training
   * sequences" (and the retrieval-index prep shape). Chunk i covers
   * tokens [i·stride, i·stride + window); the last window truncates at
   * the document end; docs at or under one window stay whole. Map-only:
   * tokenize once per row, explode over computed chunk indices — no
   * shuffle, parallel in documents.
   *
   * Returns one row per chunk: original columns + (chunk_idx,
   * chunk_tokens, chunk_text). Caller columns with those three names (or
   * the internal n_tok) are replaced.
   */
  def chunkDocs(df: DataFrame, textCol: String,
                window: Int, overlap: Int): DataFrame = {
    require(window > overlap && overlap >= 0)
    val stride = window - overlap
    val extra = col("n_tok") - window
    df.withColumn("_t", TextOps.tokens(col(textCol)))
      .withColumn("n_tok", size(col("_t")))
      .withColumn("n_chunks",
        when(col("n_tok") <= window, 1L)
          .otherwise(lit(1L) + VectorOps.floorDiv(
            extra + stride - 1, lit(stride.toLong))))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("_ct",
        slice(col("_t"), col("chunk_idx").cast("int") * stride + 1, lit(window)))
      .withColumn("chunk_tokens", size(col("_ct")).cast("long"))
      .withColumn("chunk_text", array_join(col("_ct"), " "))
      .drop("_t", "_ct", "n_chunks", "n_tok")
  }

  // ---- PII scan / redaction -----------------------------------------

  /** Engine-portable PII patterns (RE2-safe: no lookaround, no backrefs —
    * the subset Java regex and DuckDB/RE2 evaluate identically). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))))

  /** Redact all three PII classes with typed placeholders. IP first: an
    * IP is never inside an email/phone match, and placeholders contain no
    * digits/@ so later passes cannot re-match earlier rewrites. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, Ipv4Re, "<IP>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  // ---- domain-mixture planning --------------------------------------

  /**
   * Mixture plan: given per-domain token counts and target weights (ppm),
   * the deterministic sampling rate (ppm) that hits `budgetTokens * w` per
   * domain, capped at 1e6 (can't up-sample without repetition). Integer
   * arithmetic end to end. One tiny aggregate — broadcast the result back
   * onto the corpus and feed [[sampleKeep]] to execute the plan.
   */
  def mixturePlan(df: DataFrame, domainCol: String, tokensCol: Column,
      weightsPpm: Map[String, Long], budgetTokens: Column): DataFrame = {
    val w = weightsPpm.foldLeft(lit(0L)) { case (acc, (d, p)) =>
      when(col(domainCol) === d, lit(p)).otherwise(acc)
    }
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("tokens"))
      .withColumn("w_ppm", w)
      // rate = targetTokens / domainTokens where targetTokens =
      // budget * w / 1e6, so rate_ppm = budget * w_ppm / tokens exactly.
      // (budget * w_ppm stays in int64 up to ~9e12 budget tokens; past
      // that, express the budget in kilotokens with w unchanged.)
      // exact int64 floor-division: (a - a mod b) / b — the division is of
      // an exact multiple, so the double result is the integer quotient
      .withColumn("rate_ppm", least(lit(Ppm), {
        val a = budgetTokens * col("w_ppm")
        ((a - pmod(a, col("tokens"))) / col("tokens")).cast("long")
      }))
  }

  /** Exact integer square root of a nonnegative int64 column:
    * floor(sqrt(x)) from the IEEE double sqrt with a ±1 correction — the
    * correctly-rounded double sqrt of an exactly-representable x (< 2^52
    * here) is within one of the true floor, so one up- then one
    * down-adjustment makes the result exact and engine-independent. */
  def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val s1 = when((s0 + 1) * (s0 + 1) <= x, s0 + 1).otherwise(s0)
    when(s1 * s1 > x, s1 - 1).otherwise(s1)
  }

  /**
   * Temperature-flattened mixture (τ = 1/2): per-domain sampling weight ∝
   * share^τ — the multilingual-corpus rebalancing rule (XLM-R's α-sampling
   * shape): rare domains are up-weighted relative to their raw share,
   * dominant ones flattened. share^(1/2) is computed EXACTLY in ppm via
   * [[isqrt]] (sqrt(share_ppm/10⁶) in ppm = isqrt(share_ppm·10⁶)), then
   * renormalized to ppm by integer division — no float pow anywhere, so
   * the plan is bit-identical cross-engine. Two tiny aggregates
   * (per-domain, then totals) broadcast back; the corpus never shuffles.
   */
  def temperatureMixture(df: DataFrame, domainCol: String,
      tokensCol: Column): DataFrame = {
    val per = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("_tot"))
    val shared = per.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("tokens * 1000000 DIV _tot"))
      .withColumn("w_sqrt", isqrt(col("share_ppm") * lit(Ppm)))
    val wtot = shared.agg(sum(col("w_sqrt")).as("_wtot"))
    shared.crossJoin(broadcast(wtot))
      .withColumn("temp_ppm", expr("w_sqrt * 1000000 DIV _wtot"))
      .drop("_tot", "_wtot")
  }

  // ---- tokenizer-merge induction (BPE-style) ------------------------

  /**
   * Distributed tokenizer-merge induction (BPE-style at word grain): each
   * round counts adjacent token pairs across the whole corpus, takes the
   * most frequent pair (ties broken lexicographically so training is
   * deterministic), and fuses its occurrences with '_'. Returns the
   * training log: (round, learned pair, its count, corpus tokens after
   * the merge) — the vocabulary-build trace a tokenizer job emits.
   *
   * Scale shape (the part that matters at 100 TB): each round is ONE
   * partial-aggregated pair-count shuffle (map-side combine means only
   * distinct pairs per partition reach the exchange), a driver argmax of
   * exactly one row, and a map-only merge application — the corpus text
   * itself never shuffles, and rounds iterate on a persisted, bounded
   * lineage. At full scale the pair strings would hash through the
   * `TextRuns.gramPairArray` kernel (count hashed, resolve the winning
   * string with one filtered pass); string keys are kept here for oracle
   * parity.
   *
   * Merge application is non-overlapping left-to-right over the rendered
   * text (boundary-space grain): in a chain `p q p q` one pass fuses only
   * the first occurrence, because the shared boundary space is consumed —
   * the next round's re-count picks the rest up. This per-pass policy is
   * deterministic, identical across engines, and converges to the same
   * vocabulary; token-exact greedy differs only on these boundary chains.
   */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): Seq[(Int, String, Long, Long)] = {
    var cur = docs.select(col(textCol).as("text")).persist()
    val out = Seq.newBuilder[(Int, String, Long, Long)]
    for (r <- 1 to rounds) {
      val t = split(col("text"), " ")
      val pairCol = zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))
      val top = cur.select(explode(pairCol).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1).head()
      val (pair, cnt) = (top.getString(0), top.getLong(1))
      // guard before splicing into SQL text: merged tokens stay word-like
      require(pair.matches("[A-Za-z0-9_]+ [A-Za-z0-9_]+"),
        s"round $r learned a non-word pair: '$pair'")
      val merged = pair.replace(' ', '_')
      val next = cur.withColumn("text",
        expr(s"trim(replace(concat(' ', text, ' '), ' $pair ', ' $merged '))"))
        .persist()
      val tokensAfter = next.agg(
        sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
      cur.unpersist()
      cur = next
      out += ((r, pair, cnt, tokensAfter))
    }
    cur.unpersist()
    out.result()
  }

  // ---- cross-doc passage dedup --------------------------------------

  /**
   * Boilerplate-line removal by CORPUS document frequency (the
   * RefinedWeb/FineWeb line-correction idea, public): a line appearing
   * verbatim in ≥ `minDocs` DISTINCT documents (nav bars, cookie
   * banners, "sign in") is boilerplate; rebuild every document without
   * its boilerplate lines, preserving the original line order. A line
   * repeated WITHIN one document does not count toward the threshold.
   *
   * Scale shape (100 TB): lines key by a 120-bit in-row hash pair (two
   * independently-seeded 60-bit portable hashes — the line strings never
   * shuffle for the frequency count; a single 60-bit key would pass the
   * ~2^30 birthday bound at 100 TB and silently delete an innocent
   * colliding line corpus-wide) — one partial-aggregated exchange of
   * distinct (hash-pair, doc) tuples builds the frequency table, the
   * `≥ minDocs` filter shrinks it to the small boilerplate set (AQE
   * broadcasts it back), and the rebuild is one shuffle on doc id with
   * per-doc bounded state. Returns (idCol, clean_text, n_removed,
   * n_lines).
   */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lh", Hashing.portableLong(col("line")))
      .withColumn("lh2", Hashing.seeded(col("line"), lit(1)))
    val bp = lines.select(col(idCol), col("lh"), col("lh2")).distinct()
      .groupBy("lh", "lh2").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("lh", "lh2")
    lines.join(broadcast(bp.withColumn("is_bp", lit(true))),
        Seq("lh", "lh2"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
            array_sort(collect_list(when(col("is_bp").isNull,
              struct(col("pos"), col("line"))))),
            x => x.getField("line")), "\n").as("clean_text"),
        sum(when(col("is_bp").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        count(lit(1)).as("n_lines"))
  }

  /**
   * Passage-level (substring) duplication stats: for every document, how
   * many of its distinct `w`-token windows also appear in OTHER documents,
   * and how many of those it does not "own" (owner = the smallest doc id
   * containing the window — the canonical copy a remove-duplicated-spans
   * pass would keep). This is the n-gram-window approximation of
   * suffix-array substring dedup (Lee et al. 2022, "Deduplicating
   * Training Data Makes Language Models Better"): any cross-doc repeat of
   * >= w consecutive tokens is caught by construction, because it
   * contains a full w-token window.
   *
   * Scale shape (100 TB): windows hash in-row (codegen'd
   * [[graft.functions.TextRuns.shingleHashes]] — 8-byte keys, the gram
   * strings never leave the row), so the only wide data is (gh, doc_id)
   * pairs. One partial-aggregated shuffle builds the ownership table, and
   * the `>= 2 docs` filter shrinks it to just the duplicated windows —
   * on real corpora a small fraction, so AQE broadcasts it and the
   * corpus probe side NEVER shuffles (the observed plan: one exchange
   * total). On a dup-dense corpus the broadcast falls back to a
   * sort-merge join on the same `gh` key, where the ownership exchange
   * is reused for the probe. Docs shorter than `w` tokens
   * degrade to whole-text exact-dup detection (the shingle kernel's
   * documented fallback). Returns per-doc (n_passages, n_dup, n_foreign);
   * feed `n_foreign = 0` as the keep-predicate to drop non-canonical
   * copies, or join spans back for surgical passage removal.
   */
  def passageStats(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val g = gramHashes(df, idCol, textCol, w, idCol)
    val owners = g.groupBy("gh")
      .agg(count(lit(1)).as("df_docs"), min(col(idCol)).as("owner"))
      .filter(col("df_docs") >= 2)
    g.join(owners, Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("df_docs").isNotNull, 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("df_docs").isNotNull && col("owner") =!= col(idCol), 1L)
          .otherwise(0L)).as("n_foreign"))
  }

  /**
   * Content-defined-chunk duplication stats — [[passageStats]]'s
   * shift-resistant sibling. Fixed `w`-token windows detect any repeat,
   * but a chunk-STORE (dedup at rest, delta sync) wants stable chunk
   * identities under edits; token-grain CDC boundaries
   * ([[graft.functions.TextRuns.cdcChunkArray]]: cut after tokens whose
   * hash ≡ 0 mod b) move with the content, so inserting a prefix leaves
   * every chunk after the first boundary identical. Per doc: total chunk
   * count, distinct >=minTok-token chunks duplicated cross-doc, and how
   * many of those the doc doesn't own (owner = min id). `minTok` stands
   * in for FastCDC's min-size normalization — it keeps one-token chunks
   * (boundary runs) from reading as duplication; the stateless cut rule
   * itself is what stays oracle-replayable.
   *
   * Scale shape: identical to [[passageStats]] — chunks hash in-row, the
   * duplicated-chunk table is the small side (broadcast, or SMJ with a
   * reused exchange when dup-dense), the corpus never shuffles raw text.
   */
  def cdcChunkStats(df: DataFrame, idCol: String, textCol: String,
      b: Int, minTok: Int): DataFrame = {
    val chunks = df.select(col(idCol),
        explode(graft.functions.TextRuns.cdcChunks(col(textCol), b)).as("c"))
      .select(col(idCol), col("c.ch").as("ch"), col("c.n_tok").as("n_tok"))
    val eligible = chunks.filter(col("n_tok") >= minTok)
      .select(col(idCol), col("ch")).distinct()
    val owners = eligible.groupBy("ch")
      .agg(count(lit(1)).as("df_docs"), min(col(idCol)).as("owner"))
      .filter(col("df_docs") >= 2)
    val dupPerDoc = eligible.join(owners, Seq("ch"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup"),
        sum(when(col("owner") =!= col(idCol), 1L).otherwise(0L)).as("n_foreign"))
    chunks.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
      .join(dupPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_foreign"), lit(0L)).as("n_foreign"))
  }

  // ---- deterministic epoch shuffle / sharding -----------------------

  /**
   * Deterministic training-order shuffle: every row gets a seeded portable
   * hash as its order key, a shard from that key, and a position within
   * its shard. Same epoch -> identical order on any engine, any run; a
   * new epoch re-permutes globally with zero coordination (no RNG state,
   * no global sort). This is the "global shuffle" step a training-data
   * writer runs before emitting shards.
   *
   * Scale shape: `Window.partitionBy(shard).orderBy(okey)` IS the scale
   * plan — hash-partition by shard then sort within partition. Production
   * sets nShards to the output file count (10^3-10^4 at 100 TB), so
   * parallelism equals shard count and no global ordering structure ever
   * exists; each task streams its sorted shard straight to one file.
   */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int,
      epoch: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .withColumn("okey", Hashing.seeded(col(idCol).cast("string"), lit(epoch)))
      .withColumn("shard", pmod(col("okey"), lit(nShards.toLong)))
    keyed.withColumn("pos", row_number()
      .over(Window.partitionBy(col("shard")).orderBy(col("okey"), col(idCol)))
      .cast("long"))
  }

  // ---- per-source repetition caps -----------------------------------

  /**
   * Per-source document cap (Gopher/RefinedWeb-style repetition control):
   * keep at most `cap` documents per source, preferring higher integer
   * quality (floor of the quality score — floor, not cast: DuckDB CAST
   * rounds doubles where Spark truncates) and breaking ties by id so the
   * cut is total-ordered and reproducible. One hash-partitioned window
   * per source — the 100 TB shape, since sources are numerous and the
   * per-source state is just a counter.
   */
  def sourceCap(df: DataFrame, idCol: String, sourceCol: String,
      quality: Column, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("qual_i", floor(quality).cast("long"))
      .withColumn("src_rank", row_number()
        .over(Window.partitionBy(col(sourceCol))
          .orderBy(col("qual_i").desc, col(idCol)))
        .cast("long"))
      .filter(col("src_rank") <= cap)
  }

  /** DuckDB SQL twins — keep in lockstep with the Column builders. */
  /**
   * Tokenizer-merge APPLICATION (BPE encode): fold a rank-ordered merge
   * list over the text, each pass fusing non-overlapping left-to-right
   * occurrences of `"w1 w2"` into `w1_w2` with the same boundary-space
   * policy as [[bpeMerges]] (the shared space is consumed, so chains fuse
   * alternately — deterministic and identical cross-engine because both
   * engines' `replace` is left-to-right non-overlapping). A rank-i rule
   * may reference tokens fused by ranks < i (standard BPE chaining: rule
   * order is the order the vocabulary was learned). Map-only: encoding
   * happens where the text lives, nothing shuffles.
   */
  def applyMerges(text: Column, merges: Seq[String]): Column =
    merges.foldLeft(text) { (t, pair) =>
      require(pair.matches("[A-Za-z0-9_]+ [A-Za-z0-9_]+"),
        s"merge rule must be two word-like tokens: '$pair'")
      trim(replace(concat(lit(" "), t, lit(" ")),
        lit(s" $pair "), lit(s" ${pair.replace(' ', '_')} ")))
    }

  /** Gaps-and-islands + interval merge over duplicated window START
    * positions → maximal spans (shared by both excision policies). */
  private def spansFromDupPositions(dupw: DataFrame, idCol: String,
      w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = dupw
      .withColumn("_grp", col("pos") - row_number().over(byPos))
      .groupBy(col(idCol), col("_grp"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"),
        count(lit(1)).as("n_windows"))
    val byS = Window.partitionBy(col(idCol)).orderBy(col("s"))
    islands
      .withColumn("_pmax",
        max(col("e")).over(byS.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_pmax").isNull || col("s") > col("_pmax") + (w - 1), 1L)
          .otherwise(0L))
      .withColumn("_span", sum(col("_new"))
        .over(byS.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("_span"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"),
        sum(col("n_windows")).as("n_windows"))
      .withColumn("span_tokens", col("e") - col("s") + w)
      .drop("_span")
  }

  /**
   * Duplicated-substring SPANS — the transform half of exact substring
   * dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
   * Models Better", public): every w-token window occurring ≥ 2 times in
   * the corpus marks its token range as duplicated; overlapping ranges
   * merge into maximal spans. Returns one row per span:
   * (id, s, e, n_windows, span_tokens) with s/e the first/last dup-window
   * START position and span_tokens = e − s + w the excisable token count.
   * Adjacent-but-disjoint coverage (next start = prev end + w) stays two
   * spans — coverage is identical either way, the count convention is
   * pinned by spec + oracle.
   *
   * Scale shape: windows hash in-row with positions
   * ([[graft.functions.TextRuns.shingleHashSeq]] + posexplode — 8-byte
   * keys, gram text never leaves the row); the ≥2-occurrence table is the
   * small join side; islands/merging are per-doc windows over ONLY the
   * duplicated positions (a small fraction of the corpus), partitioned by
   * doc — no global window anywhere.
   */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val g = df.select(col(idCol),
      posexplode(graft.functions.TextRuns.shingleHashSeq(col(textCol), w)))
      .toDF(idCol, "pos", "gh")
    val owners = g.groupBy("gh").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2).select("gh")
    spansFromDupPositions(
      g.join(owners, Seq("gh")).select(col(idCol), col("pos")), idCol, w)
  }

  /**
   * [[dupSpans]] with the KEEP-FIRST policy — the transform Lee et al.
   * actually apply: each duplicated window's canonical occurrence (min
   * (doc, pos) corpus-wide) keeps its text; only FOREIGN occurrences mark
   * spans for excision. A second in-doc repeat is foreign to the first,
   * so self-repeats still dedupe. Same island/merge machinery; the
   * ownership argmin is one partial-aggregated pass over the window
   * table (8-byte keys, text never shuffles).
   */
  def dupSpansKeepFirst(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val g = df.select(col(idCol),
      posexplode(graft.functions.TextRuns.shingleHashSeq(col(textCol), w)))
      .toDF(idCol, "pos", "gh")
    val owners = g.groupBy("gh")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col(idCol), col("pos"))).as("own"))
      .filter(col("n_occ") >= 2)
      .select(col("gh"), col("own").getField(idCol).as("_oid"),
        col("own").getField("pos").as("_opos"))
    val dupw = g.join(owners, Seq("gh"))
      .filter(!(col(idCol) === col("_oid") && col("pos") === col("_opos")))
      .select(col(idCol), col("pos"))
    spansFromDupPositions(dupw, idCol, w)
  }

  /**
   * Span EXCISION: drop every token covered by a [[dupSpans]] row
   * (positions [s, e+w−1]) and re-assemble the survivors in order. A doc
   * whose text is fully covered survives with empty text. The range
   * anti-join runs on the doc id (co-partitioned; spans per doc are few),
   * re-assembly sorts only each doc's own surviving tokens in the row.
   */
  def exciseSpans(df: DataFrame, spans: DataFrame, idCol: String,
      textCol: String, w: Int): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(split(col(textCol), "\\s+"))).toDF(idCol, "tpos", "tok")
    val surv = toks.join(spans.select(col(idCol).as("_sid"), col("s"), col("e")),
        toks(idCol) === col("_sid") && col("tpos") >= col("s")
          && col("tpos") <= col("e") + (w - 1), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("tpos"), col("tok")))),
        p => p.getField("tok"))).as("surviving"))
    df.select(col(idCol)).join(surv, Seq(idCol), "left")
      .withColumn("surviving", coalesce(col("surviving"), lit("")))
  }

  object Sql {
    /** Oracle twin joins raw gram strings — equality semantics, no hash. */
    def grams(e: String, n: Int): String =
      s"list_distinct(${Dedup.Sql.shingles(e, n)})"
    /** Twin of [[Curation.applyMerges]], same fold in DuckDB text — and
      * the same word-like guard: the pair splices into SQL text here, so
      * the validation is load-bearing, not cosmetic. */
    def applyMerges(e: String, merges: Seq[String]): String =
      merges.foldLeft(e) { (t, pair) =>
        require(pair.matches("[A-Za-z0-9_]+ [A-Za-z0-9_]+"),
          s"merge rule must be two word-like tokens: '$pair'")
        s"trim(replace(' ' || $t || ' ', ' $pair ', ' ${pair.replace(' ', '_')} '))"
      }
    def sampleKeep(idE: String, ratePpmE: String): String =
      s"(${Hashing.Sql.portableLong(idE)} % $Ppm) < ($ratePpmE)"
    /** Twin of [[Curation.isqrt]] — repeats the operand textually (fine
      * for the tiny per-domain aggregates it serves). */
    def isqrt(e: String): String = {
      val s0 = s"CAST(floor(sqrt(CAST(($e) AS DOUBLE))) AS BIGINT)"
      val s1 = s"(CASE WHEN ($s0 + 1) * ($s0 + 1) <= ($e) THEN $s0 + 1 ELSE $s0 END)"
      s"(CASE WHEN $s1 * $s1 > ($e) THEN $s1 - 1 ELSE $s1 END)"
    }
    // NOTE: DuckDB regexp_* take the pattern with single backslashes and
    // need the 'g' flag on replace (Spark replaces all matches by default).
    def emailCount(e: String) = s"len(regexp_extract_all($e, '$EmailReSql'))"
    def phoneCount(e: String) = s"len(regexp_extract_all($e, '$PhoneReSql'))"
    def ipCount(e: String) = s"len(regexp_extract_all($e, '$Ipv4ReSql'))"
    def redact(e: String): String =
      s"regexp_replace(regexp_replace(regexp_replace($e, " +
        s"'$Ipv4ReSql', '<IP>', 'g'), '$EmailReSql', '<EMAIL>', 'g'), " +
        s"'$PhoneReSql', '<PHONE>', 'g')"
    // Scala "\\d" is the two chars \d — already what DuckDB wants inside
    // its single-quoted strings (no backslash escaping there).
    private def EmailReSql = EmailRe
    private def PhoneReSql = PhoneRe
    private def Ipv4ReSql = Ipv4Re
  }
}
