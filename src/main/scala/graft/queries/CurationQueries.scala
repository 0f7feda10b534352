package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{Hashing, Tables}
import graft.operators.{Curation, Dedup, TextOps}

/**
 * Gate queries for the training-data curation operators
 * ([[graft.operators.Curation]]): eval-set contamination, deterministic
 * stratified sampling, token-budget packing, PII scan/redaction, and
 * domain-mixture planning. All derived inputs (eval set, planted PII) are
 * deterministic functions of doc_id so the DuckDB oracle reproduces them.
 */
object CurationQueries {

  // ---- q87: eval-set contamination ----------------------------------

  private val ContamN = 8 // word n-gram size
  private val MinShared = 2 // pairs sharing >= this many distinct grams

  /** Train/test overlap: corpus docs (incl. the planted dups of the dedup
    * corpus) sharing >= MinShared distinct 8-grams with an eval doc
    * (doc_id % 23 = 0). Eval side broadcasts; corpus side never shuffles
    * before the per-pair count. */
  val contamination = GateQuery(
    "q87_contamination",
    Some(DocQueries.corpusCte +
      s""", evg AS (
         |  SELECT doc_id AS eval_id, unnest(${Curation.Sql.grams("text", ContamN)}) AS g
         |  FROM documents WHERE doc_id % 23 = 0
         |), cog AS (
         |  SELECT doc_id AS corp_id, unnest(${Curation.Sql.grams("text", ContamN)}) AS g
         |  FROM corpus
         |), pairs AS (
         |  SELECT eval_id, corp_id, count(*) AS shared
         |  FROM cog JOIN evg USING (g)
         |  WHERE corp_id <> eval_id
         |  GROUP BY 1, 2
         |)
         |SELECT eval_id, count(*) AS n_contaminating,
         |  CAST(max(shared) AS BIGINT) AS max_shared,
         |  CAST(sum(corp_id) AS BIGINT) AS corp_check
         |FROM pairs WHERE shared >= $MinShared GROUP BY eval_id""".stripMargin)) {
    (spark, dir) =>
    val evalSet = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 23 === 0)
    Curation.contamination(DocQueries.corpus(spark, dir), evalSet,
        "doc_id", "text", ContamN, MinShared)
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_contaminating"),
        max(col("shared")).as("max_shared"),
        sum(col("corp_id")).as("corp_check"))
  }

  // ---- q88: deterministic stratified sampling -----------------------

  private val Rates = Map("en" -> 600000L, "de" -> 400000L)
  private val DefaultRate = 250000L
  private val LowQualityPct = 50
  private val MinTokens = 30

  val stratifiedSample = GateQuery(
    "q88_stratified_sample",
    Some {
      val toks = TextOps.Sql.tokenCount("text")
      def chain(en: Long, de: Long, dflt: Long) =
        s"CASE lang WHEN 'en' THEN $en WHEN 'de' THEN $de ELSE $dflt END"
      s"""WITH rated AS (
         |  SELECT doc_id, lang, CAST($toks AS BIGINT) AS toks,
         |    CASE WHEN ($toks) >= $MinTokens
         |         THEN ${chain(600000, 400000, 250000)}
         |         ELSE ${chain(300000, 200000, 125000)} END AS rate_ppm
         |  FROM documents
         |)
         |SELECT lang, rate_ppm, count(*) AS n_kept,
         |  CAST(sum(doc_id) AS BIGINT) AS id_check,
         |  CAST(sum(toks) AS BIGINT) AS kept_tokens
         |FROM rated
         |WHERE ${Curation.Sql.sampleKeep("doc_id", "rate_ppm")}
         |GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("toks", TextOps.tokenCount(col("text")).cast("long"))
    Curation.stratifiedSample(docs, "doc_id", col("lang"),
        Rates, DefaultRate, col("toks") >= MinTokens, LowQualityPct)
      .groupBy("lang", "rate_ppm")
      .agg(count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("id_check"),
        sum(col("toks")).as("kept_tokens"))
  }

  // ---- q89: token-budget packing ------------------------------------

  private val PackBudget = 2000L
  private val PackShards = 8

  val tokenPacking = GateQuery(
    "q89_token_packing",
    Some {
      val toks = TextOps.Sql.tokenCount("text")
      s"""WITH d AS (
         |  SELECT doc_id, CAST($toks AS BIGINT) AS toks,
         |    ${Hashing.Sql.portableLong("doc_id")} % $PackShards AS shard
         |  FROM documents
         |), p AS (
         |  SELECT shard, toks,
         |    coalesce(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // $PackBudget AS pack_id
         |  FROM d
         |)
         |SELECT shard, count(*) AS n_docs,
         |  count(DISTINCT pack_id) AS n_packs,
         |  CAST(sum(toks) AS BIGINT) AS total_toks,
         |  CAST(max(pack_id) AS BIGINT) AS last_pack
         |FROM p GROUP BY shard""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    Curation.packByTokenBudget(docs, "doc_id",
        TextOps.tokenCount(col("text")).cast("long"), PackBudget, PackShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(col("toks")).as("total_toks"),
        max(col("pack_id")).as("last_pack"))
  }

  // ---- q91: PII scan + redaction ------------------------------------

  /** Deterministic planted PII (base text is letters-only so every match
    * is a plant): email on %7, phone on %11, IPv4 on %13. */
  private val piiCorpusCte =
    """WITH pii AS (
      |  SELECT doc_id, lang, text
      |    || CASE WHEN doc_id % 7 = 0
      |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |            ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0
      |            THEN ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
      |            ELSE '' END
      |    || CASE WHEN doc_id % 13 = 0
      |            THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.'
      |                 || CAST(doc_id % 250 AS VARCHAR)
      |            ELSE '' END AS text
      |  FROM documents
      |)""".stripMargin

  val piiScan = GateQuery(
    "q91_pii_scan",
    Some(piiCorpusCte +
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(${Curation.Sql.emailCount("text")}) AS BIGINT) AS n_emails,
         |  CAST(sum(${Curation.Sql.phoneCount("text")}) AS BIGINT) AS n_phones,
         |  CAST(sum(${Curation.Sql.ipCount("text")}) AS BIGINT) AS n_ips,
         |  CAST(sum(CASE WHEN ${Curation.Sql.emailCount("text")} = 0
         |    AND ${Curation.Sql.phoneCount("text")} = 0
         |    AND ${Curation.Sql.ipCount("text")} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
         |  CAST(sum(length(${Curation.Sql.redact("text")})) AS BIGINT) AS red_len,
         |  CAST(sum(length(text)) AS BIGINT) AS orig_len
         |FROM pii GROUP BY lang""".stripMargin)) { (spark, dir) =>
    val withPii = Tables.load(spark, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(""),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-01"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0"))).otherwise(""),
        when(col("doc_id") % 13 === 0,
          concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
            lit(".0."), (col("doc_id") % 250).cast("string"))).otherwise("")))
    val (em, ph, ip) = Curation.piiCounts(col("text"))
    withPii
      .withColumn("em", em).withColumn("ph", ph).withColumn("ip", ip)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("em").cast("long")).as("n_emails"),
        sum(col("ph").cast("long")).as("n_phones"),
        sum(col("ip").cast("long")).as("n_ips"),
        sum(when(col("em") === 0 && col("ph") === 0 && col("ip") === 0, 1L)
          .otherwise(0L)).as("n_clean"),
        sum(length(Curation.redactPii(col("text"))).cast("long")).as("red_len"),
        sum(length(col("text")).cast("long")).as("orig_len"))
  }

  // ---- q92: domain-mixture plan + execution -------------------------

  private val MixWeights = Map(
    "src0" -> 300000L, "src1" -> 200000L, "src2" -> 200000L,
    "src3" -> 150000L, "src4" -> 150000L) // unlisted domains: weight 0
  private val MixBudget = 20000L

  val mixturePlan = GateQuery(
    "q92_mixture_plan",
    Some {
      val toks = TextOps.Sql.tokenCount("text")
      val wCase = "CASE source WHEN 'src0' THEN 300000 WHEN 'src1' THEN 200000" +
        " WHEN 'src2' THEN 200000 WHEN 'src3' THEN 150000" +
        " WHEN 'src4' THEN 150000 ELSE 0 END"
      s"""WITH d AS (
         |  SELECT doc_id, source, CAST($toks AS BIGINT) AS toks FROM documents
         |), plan AS (
         |  SELECT source, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS tokens,
         |    CAST($wCase AS BIGINT) AS w_ppm,
         |    least(${Curation.Ppm}, (CAST($MixBudget AS BIGINT) * ($wCase)) // CAST(sum(toks) AS BIGINT)) AS rate_ppm
         |  FROM d GROUP BY source
         |), applied AS (
         |  SELECT d.source, count(*) AS n_kept, CAST(sum(d.toks) AS BIGINT) AS kept_tokens
         |  FROM d JOIN plan ON d.source = plan.source
         |  WHERE ${Curation.Sql.sampleKeep("d.doc_id", "plan.rate_ppm")}
         |  GROUP BY d.source
         |)
         |SELECT plan.source, n_docs, tokens, w_ppm, rate_ppm,
         |  coalesce(n_kept, 0) AS n_kept,
         |  coalesce(kept_tokens, 0) AS kept_tokens
         |FROM plan LEFT JOIN applied ON plan.source = applied.source""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("toks"))
    val plan = Curation.mixturePlan(docs, "source", col("toks"),
      MixWeights, lit(MixBudget))
    val applied = docs
      .join(broadcast(plan.select(col("source"), col("rate_ppm"))), "source")
      .filter(Curation.sampleKeep(col("doc_id"), col("rate_ppm")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("toks")).as("kept_tokens"))
    plan.join(applied, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tokens"), col("w_ppm"),
        col("rate_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }

  // ---- q105: model-based quality classifier -------------------------

  private val ClsSeed = 3

  /** Hashed-feature linear classifier serving ([[TextOps.linearScore]]):
    * per-doc integer score folded in-row from token weights, keep/drop at
    * score >= 0 — the fastText-style model filter stage with the weight
    * lookup swapped for a portable hash so the oracle reproduces every
    * score exactly. */
  val qualityClassifier = GateQuery(
    "q105_quality_classifier",
    Some {
      val score = TextOps.Sql.linearScore("text", ClsSeed)
      s"""SELECT lang, keep, count(*) AS n_docs,
         |  CAST(sum(score) AS BIGINT) AS sum_score
         |FROM (SELECT lang, $score AS score, ($score) >= 0 AS keep
         |      FROM documents)
         |GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .select(col("lang"), TextOps.linearScore(col("text"), ClsSeed).as("score"))
      .groupBy(col("lang"), (col("score") >= 0).as("keep"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_score"))
  }

  // ---- q113: context-window chunking --------------------------------

  private val ChunkW = 40
  private val ChunkO = 10

  /** Fixed-window token chunking with overlap ([[Curation.chunkDocs]]):
    * per-lang chunk counts, covered token totals (overlap counts twice by
    * design), and a portable fingerprint over every chunk's exact text —
    * any off-by-one in window/stride/tail handling breaks the hash. */
  val docChunking = GateQuery(
    "q113_doc_chunking",
    Some {
      val toks = TextOps.Sql.tokens.format("text")
      val stride = ChunkW - ChunkO
      s"""WITH t AS (
         |  SELECT doc_id, lang, $toks AS t, len($toks) AS n_tok FROM documents
         |), c AS (
         |  SELECT doc_id, lang, t, n_tok,
         |    CASE WHEN n_tok <= $ChunkW THEN 1
         |         ELSE 1 + (n_tok - $ChunkW + $stride - 1) // $stride END AS n_chunks
         |  FROM t
         |), ch AS (
         |  SELECT doc_id, lang,
         |    len(t[ci * $stride + 1 : least(ci * $stride + $ChunkW, n_tok)]) AS chunk_tokens,
         |    array_to_string(t[ci * $stride + 1 : least(ci * $stride + $ChunkW, n_tok)], ' ') AS chunk_text
         |  FROM (SELECT *, unnest(range(n_chunks)) AS ci FROM c)
         |)
         |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
         |  CAST(sum(chunk_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(${Hashing.Sql.portableLong("chunk_text")} % 1000000007) AS BIGINT) AS fp_check
         |FROM ch GROUP BY 1""".stripMargin
    }) { (spark, dir) =>
    Curation.chunkDocs(
        Tables.load(spark, dir, "documents").select("doc_id", "lang", "text"),
        "text", ChunkW, ChunkO)
      .groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).as("sum_tokens"),
        sum(pmod(Hashing.portableLong(col("chunk_text")), lit(1000000007L)))
          .as("fp_check"))
  }

  /**
   * q114 — corpus composition report: the per-(lang, source) dashboard a
   * data team watches — document and token counts, quality-band and
   * repetition-flag tallies, and language-ID disagreement with the stored
   * lang label. ONE map-only pass composing the per-row signals
   * (tokenCount, qualityScore, dupTokenFrac, langId) + one partial
   * aggregated groupBy; at 100 TB this is the cheapest full-corpus job
   * in the suite.
   */
  val corpusReport = GateQuery(
    "q114_corpus_report",
    Some {
      val toks = TextOps.Sql.tokenCount("text")
      val q = TextOps.Sql.qualityScore("text")
      val dup = TextOps.Sql.dupTokenFrac("text")
      val lid = TextOps.Sql.langId("text")
      s"""SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum($toks) AS BIGINT) AS sum_tokens,
         |  CAST(sum(CASE WHEN ($q) >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_high,
         |  CAST(sum(CASE WHEN ($dup) > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
         |  CAST(sum(CASE WHEN ($lid) <> lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_mismatch
         |FROM documents GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    val d = Tables.load(spark, dir, "documents")
    d.groupBy("lang", "source").agg(
      count(lit(1)).as("n_docs"),
      sum(TextOps.tokenCount(col("text")).cast("long")).as("sum_tokens"),
      sum(when(TextOps.qualityScore(col("text")) >= 50, 1L).otherwise(0L))
        .as("n_quality_high"),
      sum(when(TextOps.dupTokenFrac(col("text")) > 0.5, 1L).otherwise(0L))
        .as("n_repetitive"),
      sum(when(TextOps.langId(col("text")) =!= col("lang"), 1L).otherwise(0L))
        .as("n_lang_mismatch"))
  }

  // ---- q115: corpus-wide boilerplate grams --------------------------

  private val BoilerN = 3
  private val BoilerMinDocs = 3L

  /** Boilerplate-gram detection ([[Curation.boilerplateGrams]]): per-doc
    * boilerplate-fraction histogram by lang — grams shared by >= minDocs
    * DISTINCT documents flag as boilerplate. */
  val boilerplate = GateQuery(
    "q115_boilerplate",
    Some {
      val grams = Curation.Sql.grams("text", BoilerN)
      s"""WITH g AS (
         |  SELECT doc_id, lang, unnest(list_distinct($grams)) AS gr FROM documents
         |), freq AS (
         |  SELECT gr, count(*) AS df FROM g GROUP BY 1 HAVING count(*) >= $BoilerMinDocs
         |), per_doc AS (
         |  SELECT doc_id, lang, count(*) AS n_grams,
         |    sum(CASE WHEN freq.gr IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
         |  FROM g LEFT JOIN freq USING (gr)
         |  GROUP BY 1, 2
         |)
         |SELECT lang, CAST((100 * n_boiler) // n_grams AS BIGINT) AS boiler_pct,
         |  count(*) AS n_docs, CAST(sum(n_grams) AS BIGINT) AS sum_grams
         |FROM per_doc GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    val d = Tables.load(spark, dir, "documents")
    Curation.boilerplateGrams(d, "doc_id", "text", BoilerN, BoilerMinDocs, "doc_id")
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang"),
        graft.operators.VectorOps.floorDiv(lit(100L) * col("n_boiler"),
          col("n_grams")).as("boiler_pct"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_grams")).as("sum_grams"))
  }

  // ---- q140: naive-Bayes classifier trained IN the engine -------------

  /**
   * Model-based filtering, TRAINED end to end in the engine (q140): a
   * hashed-feature multinomial naive-Bayes language detector learns from
   * the corpus's own labels (y = lang == 'en') via one partial-aggregated
   * bucket-count pass, weights finalize as Laplace-smoothed log-odds in
   * exact fixed-point log2, and serving folds them back as a plan-literal
   * array ([[TextOps.nbTrain]]/[[TextOps.nbScore]]). The oracle REPLAYS
   * THE ENTIRE TRAINING in SQL — counts, smoothing, fixed-point weights,
   * prior — and the confusion matrix plus the exact integer score sums
   * must match bit-for-bit: training determinism, not just serving
   * parity, is what's gated (the synthetic corpus carries little real
   * class signal — ~61% accuracy vs a 56% majority prior at gate scale;
   * a spec plants an unambiguous token signal and demands perfect
   * held-out classification to prove the learner LEARNS).
   */
  private val NbBuckets = 256

  val nbClassifier = GateQuery(
    "q140_nb_classifier", {
      val h = Hashing.Sql.portableLong("tk")
      def l2(e: String) = graft.operators.TextLm.Sql.l2q16(e)
      Some(
        s"""WITH tok AS (
           |  SELECT doc_id, (lang = 'en') AS y,
           |    unnest(string_split(text, ' ')) AS tk
           |  FROM documents
           |), tb AS (SELECT doc_id, y, ($h) % $NbBuckets AS b FROM tok),
           |counts AS (
           |  SELECT b, sum(CASE WHEN y THEN 1 ELSE 0 END) AS n1,
           |    sum(CASE WHEN y THEN 0 ELSE 1 END) AS n0
           |  FROM tb GROUP BY b
           |), tot AS (
           |  SELECT sum(n1) + $NbBuckets AS t1, sum(n0) + $NbBuckets AS t0
           |  FROM counts
           |), w AS (
           |  SELECT b,
           |    (${l2("(n1 + 1)")} - ${l2("((SELECT t1 FROM tot))")})
           |      - (${l2("(n0 + 1)")} - ${l2("((SELECT t0 FROM tot))")}) AS w
           |  FROM counts
           |), prior AS (
           |  SELECT ${l2("((SELECT count(*) FROM documents WHERE lang = 'en'))")}
           |    - ${l2("((SELECT count(*) FROM documents WHERE lang <> 'en'))")}
           |    AS bias
           |), scored AS (
           |  SELECT tb.doc_id, tb.y AS actual,
           |    (SELECT bias FROM prior) + sum(w.w) AS score
           |  FROM tb JOIN w USING (b) GROUP BY 1, 2
           |)
           |SELECT actual, score > 0 AS predicted, count(*) AS n_docs,
           |  CAST(sum(score) AS BIGINT) AS sum_score
           |FROM scored GROUP BY 1, 2""".stripMargin)
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    val y = col("lang") === "en"
    val (w, bias) = TextOps.nbTrain(docs, "text", y, NbBuckets)
    docs.select(y.as("actual"),
        TextOps.nbScore(col("text"), w, bias, NbBuckets).as("score"))
      .groupBy(col("actual"), (col("score") > 0).as("predicted"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_score"))
  }

  // ---- q130: tokenizer-merge induction (BPE-style) -------------------

  /**
   * Distributed BPE-style merge training over the corpus
   * ([[Curation.bpeMerges]]): three rounds of count-pairs → argmax →
   * fuse. The gate pins the full training log — learned pair, its count,
   * and the corpus token total after each merge — so a wrong tie-break, a
   * miscount, or a merge touching the wrong occurrences all fail. The
   * oracle replays the identical three rounds in SQL (same lexicographic
   * tie-break, same left-to-right boundary-space merge application).
   */
  val bpeMerges = GateQuery(
    "q130_bpe_merges", {
      // one round of the oracle chain: d<r-1> -> p<r>/t<r>/d<r>
      def round(r: Int): String = {
        val (prev, p, t, d) = (s"d${r - 1}", s"p$r", s"t$r", s"d$r")
        s"""$p AS (SELECT toks[i] || ' ' || toks[i+1] AS pair, count(*) AS c
           |  FROM (SELECT string_split(text, ' ') AS toks FROM $prev),
           |       range(1, 256) r(i)
           |  WHERE i < len(toks) GROUP BY 1),
           |$t AS (SELECT pair, c FROM $p ORDER BY c DESC, pair LIMIT 1),
           |$d AS (SELECT trim(replace(' ' || text || ' ',
           |    ' ' || (SELECT pair FROM $t) || ' ',
           |    ' ' || replace((SELECT pair FROM $t), ' ', '_') || ' '))
           |  AS text FROM $prev),""".stripMargin
      }
      def row(r: Int): String =
        s"""SELECT CAST($r AS INT) AS round, (SELECT pair FROM t$r) AS pair,
           |  (SELECT CAST(c AS BIGINT) FROM t$r) AS pair_count,
           |  (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT)
           |   FROM d$r) AS tokens_after""".stripMargin
      Some(
        s"""WITH d0 AS (SELECT text FROM documents),
           |${round(1)}
           |${round(2)}
           |${round(3)}
           |dummy AS (SELECT 1)
           |${row(1)}
           |UNION ALL ${row(2)}
           |UNION ALL ${row(3)}""".stripMargin)
    }) { (spark, dir) =>
    import spark.implicits._
    Curation.bpeMerges(Tables.load(spark, dir, "documents"), "text", rounds = 3)
      .toDF("round", "pair", "pair_count", "tokens_after")
  }

  // ---- q141: cross-doc passage dedup ---------------------------------

  private val PassageW = 12 // tokens per passage window

  /**
   * Passage-level substring dedup ([[Curation.passageStats]]): per-doc
   * counts of 12-token windows duplicated across documents, and of
   * windows the doc does not own (owner = min doc_id). Runs on the
   * planted-dup corpus so exact copies (every window duplicated) and
   * near-dups (all but the trailing windows) both appear; only docs
   * touched by duplication are emitted. The oracle joins raw gram
   * strings where the engine joins in-row hashes — counts must agree.
   */
  val passageDedup = GateQuery(
    "q141_passage_dedup",
    Some(DocQueries.corpusCte +
      s""", g AS (
         |  SELECT doc_id, unnest(${Curation.Sql.grams("text", PassageW)}) AS gr
         |  FROM corpus
         |), own AS (
         |  SELECT gr, count(*) AS df_docs, min(doc_id) AS owner
         |  FROM g GROUP BY 1 HAVING count(*) >= 2
         |), per AS (
         |  SELECT g.doc_id, count(*) AS n_passages,
         |    sum(CASE WHEN own.gr IS NOT NULL THEN 1 ELSE 0 END) AS n_dup,
         |    sum(CASE WHEN own.gr IS NOT NULL AND own.owner <> g.doc_id
         |             THEN 1 ELSE 0 END) AS n_foreign
         |  FROM g LEFT JOIN own USING (gr) GROUP BY 1
         |)
         |SELECT doc_id, CAST(n_passages AS BIGINT) AS n_passages,
         |  CAST(n_dup AS BIGINT) AS n_dup,
         |  CAST(n_foreign AS BIGINT) AS n_foreign
         |FROM per WHERE n_dup > 0""".stripMargin)) { (spark, dir) =>
    Curation.passageStats(DocQueries.corpus(spark, dir),
        "doc_id", "text", PassageW)
      .filter(col("n_dup") > 0)
  }

  // ---- q142: deterministic epoch shuffle ------------------------------

  private val ShuffleShards = 8

  /**
   * Deterministic training-order shuffle ([[Curation.epochShuffle]]) over
   * two epochs: per (epoch, shard) the doc count, the first/last doc in
   * shuffle order, and a position-weighted checksum that pins the ENTIRE
   * within-shard order (any transposition changes sum(pos * doc_id)).
   * Epoch 2 must re-permute: same membership universe, different order —
   * both pinned by the oracle replaying the seeded hash.
   */
  val epochShuffle = GateQuery(
    "q142_epoch_shuffle",
    Some {
      def epochCte(e: Int) =
        s"""SELECT $e AS epoch, doc_id,
           |  ${Hashing.Sql.seeded("CAST(doc_id AS VARCHAR)", e.toString)} AS okey
           |FROM documents""".stripMargin
      s"""WITH keyed AS (
         |  ${epochCte(1)}
         |  UNION ALL
         |  ${epochCte(2)}
         |), pos AS (
         |  SELECT epoch, doc_id, okey % $ShuffleShards AS shard,
         |    row_number() OVER (PARTITION BY epoch, okey % $ShuffleShards
         |                       ORDER BY okey, doc_id) AS pos
         |  FROM keyed
         |)
         |SELECT epoch, CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
         |  arg_min(doc_id, pos) AS first_doc, arg_max(doc_id, pos) AS last_doc,
         |  CAST(sum(pos * doc_id) AS BIGINT) AS order_check
         |FROM pos GROUP BY 1, 2""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    def ep(e: Int) =
      Curation.epochShuffle(docs, "doc_id", ShuffleShards, e)
        .withColumn("epoch", lit(e))
    ep(1).unionByName(ep(2))
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min_by(col("doc_id"), col("pos")).as("first_doc"),
        max_by(col("doc_id"), col("pos")).as("last_doc"),
        sum(col("pos") * col("doc_id")).as("order_check"))
  }

  // ---- q143: per-source repetition caps --------------------------------

  private val SourceCapN = 15

  /**
   * Per-source document caps ([[Curation.sourceCap]]): keep the 15
   * highest-integer-quality docs per source (ties by doc_id). Per source:
   * total vs kept counts, kept-id checksum, and the kept quality mass —
   * a wrong comparator, an off-by-one at the cap, or a float-rounding
   * divergence (floor vs CAST) each break a different column.
   */
  val sourceCaps = GateQuery(
    "q143_source_caps",
    Some {
      val q = TextOps.Sql.qualityScore("text")
      s"""WITH ranked AS (
         |  SELECT source, doc_id, CAST(floor($q) AS BIGINT) AS qual_i,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY CAST(floor($q) AS BIGINT) DESC, doc_id)
         |      AS src_rank,
         |    count(*) OVER (PARTITION BY source) AS n_total
         |  FROM documents
         |)
         |SELECT source, CAST(max(n_total) AS BIGINT) AS n_total,
         |  count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_check,
         |  CAST(sum(qual_i) AS BIGINT) AS kept_quality
         |FROM ranked WHERE src_rank <= $SourceCapN GROUP BY 1""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    val totals = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
    Curation.sourceCap(docs, "doc_id", "source",
        TextOps.qualityScore(col("text")), SourceCapN)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_check"),
        sum(col("qual_i")).as("kept_quality"))
      .join(totals, "source")
      .select(col("source"), col("n_total"), col("n_kept"),
        col("id_check"), col("kept_quality"))
  }

  // ---- q144: content-defined chunk dedup -------------------------------

  private val CdcB = 8 // expected chunk length (tokens)
  private val CdcMinTok = 3 // chunks shorter than this don't count as dups

  /**
   * Content-defined chunking ([[Curation.cdcChunkStats]]) on a corpus
   * with planted exact copies AND prefix-shifted copies ('graftprefix '
   * prepended). The prefix family is the point: fixed windows all shift,
   * but CDC boundaries re-synchronize at the first cut, so shifted docs
   * still show duplicated chunks — the oracle replays tokenization,
   * boundary rule, chunk assembly, and ownership in SQL.
   */
  val cdcChunks = GateQuery(
    "q144_cdc_chunks",
    Some {
      val toks = TextOps.Sql.tokens.format("text")
      val bnd = s"CASE WHEN (${Hashing.Sql.portableLong("tk")}) % $CdcB = 0" +
        " THEN 1 ELSE 0 END"
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 13 = 0
         |  UNION ALL
         |  SELECT doc_id + 300000, 'graftprefix ' || text FROM documents
         |  WHERE doc_id % 7 = 0
         |), tok AS (
         |  SELECT doc_id, i, toks[i] AS tk
         |  FROM (SELECT doc_id, $toks AS toks FROM corpus), range(1, 512) r(i)
         |  WHERE i <= len(toks)
         |), pos AS (
         |  SELECT doc_id, i, tk,
         |    coalesce(sum($bnd) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
         |  FROM tok
         |), chunks AS (
         |  SELECT doc_id, chunk_id, string_agg(tk, ' ' ORDER BY i) AS ctext,
         |    count(*) AS n_tok
         |  FROM pos GROUP BY 1, 2
         |), elig AS (
         |  SELECT DISTINCT doc_id, ctext FROM chunks WHERE n_tok >= $CdcMinTok
         |), own AS (
         |  SELECT ctext, min(doc_id) AS owner
         |  FROM elig GROUP BY 1 HAVING count(*) >= 2
         |), dup AS (
         |  SELECT elig.doc_id, count(*) AS n_dup,
         |    sum(CASE WHEN own.owner <> elig.doc_id THEN 1 ELSE 0 END) AS n_foreign
         |  FROM elig JOIN own USING (ctext) GROUP BY 1
         |), base AS (
         |  SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY 1
         |)
         |SELECT base.doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
         |  CAST(n_dup AS BIGINT) AS n_dup,
         |  CAST(n_foreign AS BIGINT) AS n_foreign
         |FROM base JOIN dup ON base.doc_id = dup.doc_id""".stripMargin
    }) { (spark, dir) =>
    val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val corpus = d
      .unionByName(d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat(lit("graftprefix "), col("text")).as("text")))
    Curation.cdcChunkStats(corpus, "doc_id", "text", CdcB, CdcMinTok)
      .filter(col("n_dup") > 0)
  }

  // ---- q146: the full curation pipeline, one gate ----------------------

  private val PipeQualityMin = 40.0
  private val PipeDupFracMax = 0.2
  private val PipeSamplePpm = 700000L

  /**
   * The whole curation DAG composed end to end — the C4/Gopher-style
   * production shape a corpus actually runs, chaining six already-gated
   * operators: language-ID gate → quality floor → repetition cap → exact
   * dedup (canonical = min id per normalized-text key) → eval-set
   * decontamination → deterministic sample. One row per stage pins
   * (docs_in, docs_out, id_check): the id_check makes every intermediate
   * survivor SET exact, not just its size, so a bug anywhere in the chain
   * (filter semantics, dedup tie-break, contamination threshold, sample
   * hash) moves some stage's row.
   *
   * Scale shape: stages 1-3 and 6 are flags in ONE map pass (each doc
   * tokenizes a bounded number of times, never shuffles); stage 4 is the
   * one hash-partition window on the dedup key; stage 5 broadcasts the
   * eval side like q87. The attrition report itself is a single partial
   * agg of the flag columns — adding the report costs nothing beyond the
   * operators it audits.
   */
  val pipeline = GateQuery(
    "q146_pipeline",
    Some {
      val toks = TextOps.Sql
      s"""WITH s0 AS (
         |  SELECT doc_id, text FROM documents
         |), s1 AS (
         |  SELECT * FROM s0 WHERE (${toks.langId("text")}) <> 'und'
         |), s2 AS (
         |  SELECT * FROM s1 WHERE (${toks.qualityScore("text")}) >= $PipeQualityMin
         |), s3 AS (
         |  SELECT doc_id, text, ${Dedup.Sql.exactKey("text")} AS k
         |  FROM s2 WHERE (${toks.dupTokenFrac("text")}) <= $PipeDupFracMax
         |), m AS (
         |  SELECT k, min(doc_id) AS mid FROM s3 GROUP BY 1
         |), s4 AS (
         |  SELECT s3.doc_id, s3.text FROM s3
         |  JOIN m ON s3.k = m.k AND s3.doc_id = m.mid
         |), evg AS (
         |  SELECT doc_id AS eval_id, unnest(${Curation.Sql.grams("text", ContamN)}) AS g
         |  FROM s0 WHERE doc_id % 23 = 0
         |), cog AS (
         |  SELECT doc_id AS corp_id, unnest(${Curation.Sql.grams("text", ContamN)}) AS g
         |  FROM s4
         |), bad AS (
         |  SELECT DISTINCT corp_id FROM (
         |    SELECT eval_id, corp_id, count(*) AS shared
         |    FROM cog JOIN evg USING (g)
         |    WHERE corp_id <> eval_id GROUP BY 1, 2)
         |  WHERE shared >= $MinShared
         |), s5 AS (
         |  SELECT * FROM s4 WHERE doc_id NOT IN (SELECT corp_id FROM bad)
         |), s6 AS (
         |  SELECT * FROM s5 WHERE ${Curation.Sql.sampleKeep("doc_id", PipeSamplePpm.toString)}
         |), c AS (
         |  SELECT (SELECT count(*) FROM s0) AS c0,
         |    (SELECT count(*) FROM s1) AS c1,
         |    (SELECT coalesce(sum(doc_id), 0) FROM s1) AS i1,
         |    (SELECT count(*) FROM s2) AS c2,
         |    (SELECT coalesce(sum(doc_id), 0) FROM s2) AS i2,
         |    (SELECT count(*) FROM s3) AS c3,
         |    (SELECT coalesce(sum(doc_id), 0) FROM s3) AS i3,
         |    (SELECT count(*) FROM s4) AS c4,
         |    (SELECT coalesce(sum(doc_id), 0) FROM s4) AS i4,
         |    (SELECT count(*) FROM s5) AS c5,
         |    (SELECT coalesce(sum(doc_id), 0) FROM s5) AS i5,
         |    (SELECT count(*) FROM s6) AS c6,
         |    (SELECT coalesce(sum(doc_id), 0) FROM s6) AS i6
         |)
         |SELECT ord, stage, CAST(n_in AS BIGINT) AS n_in,
         |  CAST(n_out AS BIGINT) AS n_out, CAST(id_check AS BIGINT) AS id_check
         |FROM (
         |  SELECT 1 AS ord, 'langid' AS stage, c0 AS n_in, c1 AS n_out, i1 AS id_check FROM c
         |  UNION ALL SELECT 2, 'quality', c1, c2, i2 FROM c
         |  UNION ALL SELECT 3, 'repetition', c2, c3, i3 FROM c
         |  UNION ALL SELECT 4, 'exact_dedup', c3, c4, i4 FROM c
         |  UNION ALL SELECT 5, 'decontam', c4, c5, i5 FROM c
         |  UNION ALL SELECT 6, 'sample', c5, c6, i6 FROM c)""".stripMargin
    }) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val flagged = docs
      .withColumn("s1", TextOps.langId(col("text")) =!= "und")
      .withColumn("s2", col("s1") &&
        TextOps.qualityScore(col("text")) >= PipeQualityMin)
      .withColumn("s3", col("s2") &&
        TextOps.dupTokenFrac(col("text")) <= PipeDupFracMax)
      .withColumn("k", Dedup.exactKey(col("text")))
    val deduped = flagged.withColumn("s4", col("s3") &&
      col("doc_id") === min(when(col("s3"), col("doc_id")))
        .over(Window.partitionBy("k")))
    val evalSet = docs.filter(col("doc_id") % 23 === 0)
    val bad = Curation.contamination(deduped.filter(col("s4")), evalSet,
        "doc_id", "text", ContamN, MinShared)
      .select(col("corp_id").as("doc_id")).distinct()
      .withColumn("contam", lit(true))
    val full = deduped.join(broadcast(bad), Seq("doc_id"), "left")
      .withColumn("s5", col("s4") && col("contam").isNull)
      .withColumn("s6", col("s5") &&
        Curation.sampleKeep(col("doc_id"), lit(PipeSamplePpm)))
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    def ids(c: Column) = coalesce(sum(when(c, col("doc_id"))), lit(0L))
    full.agg(
        count(lit(1)).as("c0"),
        cnt(col("s1")).as("c1"), ids(col("s1")).as("i1"),
        cnt(col("s2")).as("c2"), ids(col("s2")).as("i2"),
        cnt(col("s3")).as("c3"), ids(col("s3")).as("i3"),
        cnt(col("s4")).as("c4"), ids(col("s4")).as("i4"),
        cnt(col("s5")).as("c5"), ids(col("s5")).as("i5"),
        cnt(col("s6")).as("c6"), ids(col("s6")).as("i6"))
      .selectExpr("""stack(6,
        1, 'langid',      c0, c1, i1,
        2, 'quality',     c1, c2, i2,
        3, 'repetition',  c2, c3, i3,
        4, 'exact_dedup', c3, c4, i4,
        5, 'decontam',    c4, c5, i5,
        6, 'sample',      c5, c6, i6) AS (ord, stage, n_in, n_out, id_check)""")
  }

  // ---- q166: BPE merge application (tokenizer encode) -----------------

  /** Rank-ordered merge vocabulary: rank 2 chains on rank 1's fused token
    * — the standard BPE property that rule i may reference the output of
    * rules < i. */
  private val EncMerges = Seq("a a", "a_a the", "table hash")

  /**
   * q166 — tokenizer ENCODE ([[Curation.applyMerges]]): the applying half
   * of the q130 induction story. The learned (here: literal, rank-ordered,
   * chained) merge list folds over every document map-only; the gate pins,
   * per rank, the fused token's occurrence count in the FINAL encoded
   * corpus (so rank-2 consuming rank-1 outputs is visible), plus the
   * corpus token counts before/after and a bit_xor fingerprint of every
   * encoded text — byte-exact encode or nothing. Both engines run the
   * identical replace fold ([[Curation.Sql.applyMerges]]).
   */
  val bpeEncode = GateQuery(
    "q166_bpe_encode",
    Some {
      val enc = Curation.Sql.applyMerges("text", EncMerges)
      val fusedVals = EncMerges.zipWithIndex.map { case (p, i) =>
        s"(${i + 1}, '${p.replace(' ', '_')}')"
      }.mkString(", ")
      val fusedList = EncMerges.map(p => s"'${p.replace(' ', '_')}'").mkString(", ")
      s"""WITH enc AS (
         |  SELECT doc_id, text, $enc AS enc FROM documents
         |), tot AS (
         |  SELECT
         |    CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS toks_before,
         |    CAST(sum(len(string_split(enc, ' '))) AS BIGINT) AS toks_after,
         |    CAST(bit_xor(${Hashing.Sql.portableLong("enc")}) AS BIGINT) AS enc_check
         |  FROM enc
         |), occ AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n_occ
         |  FROM (SELECT unnest(string_split(enc, ' ')) AS w FROM enc)
         |  WHERE w IN ($fusedList) GROUP BY w
         |)
         |SELECT rank, fused, coalesce(n_occ, 0) AS n_occ,
         |  toks_before, toks_after, enc_check
         |FROM (VALUES $fusedVals) m(rank, fused)
         |LEFT JOIN occ ON fused = w CROSS JOIN tot""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val fused = EncMerges.map(_.replace(' ', '_'))
    val enc = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        Curation.applyMerges(col("text"), EncMerges).as("enc"))
      .persist()
    val tot = enc
      .withColumn("_ec", Hashing.portableLong(col("enc")))
      .agg(
        sum(size(split(col("text"), "\\s+")).cast("long")).as("toks_before"),
        sum(size(split(col("enc"), " ")).cast("long")).as("toks_after"),
        expr("bit_xor(_ec)").as("enc_check"))
    val occ = enc.select(explode(split(col("enc"), " ")).as("w"))
      .filter(col("w").isin(fused: _*))
      .groupBy("w").agg(count(lit(1)).as("n_occ"))
    val ranks = fused.zipWithIndex.map { case (f, i) => (i + 1, f) }
      .toDF("rank", "fused")
    val out = ranks
      .join(occ, ranks("fused") === occ("w"), "left")
      .select(col("rank"), col("fused"), coalesce(col("n_occ"), lit(0L)).as("n_occ"))
      .crossJoin(broadcast(tot))
    val r = out.collect() // materialize before unpersist
    enc.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(r.toIndexedSeq, 1), out.schema)
  }

  // ---- q167: DSIR importance-weighted selection -----------------------

  private val DsirB = 64 // hashed feature buckets (fixed-width model)
  private val DsirOff = 1024L // positivity offset for the floor-div bucket

  /**
   * q167 — importance-weighted data selection over hashed unigram buckets
   * ([[graft.operators.Dsir]], the DSIR shape): the `src0` slice is the
   * target-distribution sample, the whole corpus is raw; λ per bucket is
   * the exact fixed-point smoothed log ratio, each document scores
   * Σ tf·λ in one broadcast-join pass, and the gate pins the raw-score
   * weight-bucket histogram (wb = ⌊score/16⌋ + 1024 — the offset keeps
   * the floor division in positive territory where Spark's DIV and
   * DuckDB's // agree), doc counts, exact score sums and id checks.
   * wb ≥ 1024 ⇔ more target-like than raw — the selection predicate is a
   * map-only filter on this histogram's axis.
   */
  val dsirSelect = GateQuery(
    "q167_dsir_select",
    Some {
      import graft.operators.{Dsir, TextLm}
      val l2 = (e: String) => TextLm.Sql.l2q16(e)
      s"""WITH tc AS (${Dsir.Sql.bucketCounts("documents WHERE source = 'src0'", DsirB)}),
         |rc AS (${Dsir.Sql.bucketCounts("documents", DsirB)}),
         |fullb AS (
         |  SELECT r.range AS bucket, coalesce(tc.n, 0) AS nt, coalesce(rc.n, 0) AS nr
         |  FROM range(0, $DsirB) r
         |  LEFT JOIN tc ON tc.bucket = r.range
         |  LEFT JOIN rc ON rc.bucket = r.range
         |), tot AS (
         |  SELECT CAST(sum(nt) AS BIGINT) AS snt, CAST(sum(nr) AS BIGINT) AS snr
         |  FROM fullb
         |), lam AS (
         |  SELECT bucket,
         |    (${l2("(nt + 1)")} - ${l2(s"(snt + $DsirB)")})
         |      - (${l2("(nr + 1)")} - ${l2(s"(snr + $DsirB)")}) AS lam_q16
         |  FROM fullb CROSS JOIN tot
         |), toks AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents
         |), tf AS (
         |  SELECT doc_id, any_value(n_tokens) AS n_tokens,
         |    ${graft.core.Hashing.Sql.portableLong("w")} % $DsirB AS bucket,
         |    CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, len(t) AS n_tokens, unnest(t) AS w FROM toks)
         |  GROUP BY doc_id, 3
         |), scored AS (
         |  SELECT doc_id, any_value(n_tokens) AS n_tokens,
         |    CAST(sum(tf * lam_q16) AS BIGINT) AS score
         |  FROM tf JOIN lam USING (bucket) GROUP BY doc_id
         |)
         |SELECT (score + ${DsirOff * 16}) // 16 AS wb,
         |  count(*) AS n_docs,
         |  CAST(sum(score) AS BIGINT) AS sum_score,
         |  CAST(sum(doc_id) AS BIGINT) AS id_check
         |FROM scored GROUP BY 1""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.Dsir
    val docs = Tables.load(spark, dir, "documents")
    val lam = Dsir.bucketLogRatio(
      docs.filter(col("source") === "src0"), docs, "text", DsirB)
    // DIV (truncating), NOT floorDiv: DuckDB's `//` truncates toward zero,
    // so the truncating pair agrees for ALL values — flooring would
    // diverge for any score below the −offset line
    Dsir.scoreDocs(docs, lam, "doc_id", "text", DsirB)
      .withColumn("wb", expr(s"(score_q16 + ${DsirOff * 16L}) DIV 16"))
      .groupBy("wb")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score_q16")).as("sum_score"),
        sum(col("doc_id")).as("id_check"))
  }

  // ---- q168: duplicated-substring span excision -----------------------

  private val SpanW = 8 // window width = minimum excisable substring length

  /**
   * q168 — exact substring dedup as a TRANSFORM ([[Curation.dupSpans]] +
   * [[Curation.exciseSpans]], the Lee et al. 2021 shape): w-token windows
   * occurring ≥ 2 times anywhere in the corpus mark token ranges,
   * overlapping ranges merge into maximal spans, and the covered tokens
   * are excised. Per affected document the gate pins span count, dup
   * window count, covered-token count, the doc's token count, and a
   * portable hash of the SURVIVING text — the excision is byte-exact or
   * nothing (fully-covered exact copies survive as the empty string).
   * The oracle replays windows→ownership→islands→interval-merge→excision
   * entirely in SQL.
   */
  val spanExcision = GateQuery(
    "q168_span_excision",
    Some(DocQueries.corpusCte +
      s""", t AS (
         |  SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS tk FROM corpus
         |), g AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |    array_to_string(tk[i + 1 : i + $SpanW], ' ') AS gr
         |  FROM t, unnest(range(len(tk) - $SpanW + 1)) r(i)
         |  WHERE len(tk) >= $SpanW
         |  UNION ALL
         |  -- short-doc fallback identity is the RAW text (the kernel hashes
         |  -- text bytes, not the token join — Dedup.shingles convention)
         |  SELECT doc_id, 0, text FROM t WHERE len(tk) < $SpanW
         |), dw AS (
         |  SELECT g.doc_id, g.pos FROM g
         |  JOIN (SELECT gr FROM g GROUP BY gr HAVING count(*) >= 2) o USING (gr)
         |), isl AS (
         |  SELECT doc_id, grp, min(pos) AS s, max(pos) AS e, count(*) AS nw
         |  FROM (SELECT doc_id, pos,
         |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |        FROM dw)
         |  GROUP BY 1, 2
         |), mrk AS (
         |  SELECT doc_id, s, e, nw,
         |    CASE WHEN pmax IS NULL OR s > pmax + ${SpanW - 1} THEN 1 ELSE 0 END AS news
         |  FROM (SELECT doc_id, s, e, nw,
         |          max(e) OVER (PARTITION BY doc_id ORDER BY s
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |        FROM isl)
         |), spans AS (
         |  SELECT doc_id, spanid, min(s) AS s, max(e) AS e,
         |    CAST(sum(nw) AS BIGINT) AS nw, max(e) - min(s) + $SpanW AS span_tokens
         |  FROM (SELECT *, sum(news) OVER (PARTITION BY doc_id ORDER BY s
         |          ROWS UNBOUNDED PRECEDING) AS spanid FROM mrk)
         |  GROUP BY 1, 2
         |), per AS (
         |  SELECT doc_id, count(*) AS n_spans, CAST(sum(nw) AS BIGINT) AS dup_windows,
         |    CAST(sum(span_tokens) AS BIGINT) AS covered
         |  FROM spans GROUP BY 1
         |), toks AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS tpos, tk[i + 1] AS tok
         |  FROM t, unnest(range(len(tk))) r(i)
         |), surv AS (
         |  SELECT p.doc_id, string_agg(p.tok, ' ' ORDER BY p.tpos) AS surviving
         |  FROM toks p
         |  WHERE NOT EXISTS (SELECT 1 FROM spans sp WHERE sp.doc_id = p.doc_id
         |    AND p.tpos BETWEEN sp.s AND sp.e + ${SpanW - 1})
         |  GROUP BY 1
         |)
         |SELECT per.doc_id, CAST(n_spans AS BIGINT) AS n_spans, dup_windows,
         |  covered, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  ${Hashing.Sql.portableLong("coalesce(surviving, '')")} AS surv_fp
         |FROM per JOIN t USING (doc_id) LEFT JOIN surv USING (doc_id)""".stripMargin)) {
    (spark, dir) =>
    val c = DocQueries.corpus(spark, dir).persist()
    val spans = Curation.dupSpans(c, "doc_id", "text", SpanW).persist()
    val per = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("n_windows")).as("dup_windows"),
        sum(col("span_tokens")).as("covered"))
    val surv = Curation.exciseSpans(c, spans, "doc_id", "text", SpanW)
    val out = per
      .join(c.select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens")), Seq("doc_id"))
      .join(surv, Seq("doc_id"))
      .withColumn("surv_fp", Hashing.portableLong(col("surviving")))
      .select("doc_id", "n_spans", "dup_windows", "covered", "n_tokens", "surv_fp")
      .persist()
    // materialize executor-side before unpersisting the inputs (a collect
    // here would ship every affected doc through the driver — 700 k rows
    // at the 100× point); the persisted result is 6 longs/row, negligible
    out.count()
    spans.unpersist(); c.unpersist()
    out
  }

  /**
   * q175 — keep-first substring excision ([[Curation.dupSpansKeepFirst]]):
   * the policy Lee et al. actually apply — each duplicated window's
   * canonical occurrence (min (doc, pos) corpus-wide) KEEPS its text and
   * only foreign occurrences excise, so exactly one copy of every
   * duplicated substring survives the corpus (q168's symmetric variant
   * removes all copies). A second in-doc repeat is foreign to the first,
   * so self-repeats still dedupe. The gate pins the same per-doc span
   * stats and surviving-text fingerprints as q168 over the SAME corpus —
   * exact-copy plants now keep the original byte-identical and excise
   * the clone; the oracle adds the ownership argmin to the q168 chain.
   */
  val spanKeepFirst = GateQuery(
    "q175_span_keep_first",
    Some(DocQueries.corpusCte +
      s""", t AS (
         |  SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS tk FROM corpus
         |), g AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |    array_to_string(tk[i + 1 : i + $SpanW], ' ') AS gr
         |  FROM t, unnest(range(len(tk) - $SpanW + 1)) r(i)
         |  WHERE len(tk) >= $SpanW
         |  UNION ALL
         |  SELECT doc_id, 0, text FROM t WHERE len(tk) < $SpanW
         |), own AS (
         |  SELECT gr, count(*) AS n_occ,
         |    min(doc_id * 10000000 + pos) AS okey
         |  FROM g GROUP BY gr HAVING count(*) >= 2
         |), dw AS (
         |  SELECT g.doc_id, g.pos FROM g JOIN own USING (gr)
         |  WHERE g.doc_id * 10000000 + g.pos <> own.okey
         |), isl AS (
         |  SELECT doc_id, grp, min(pos) AS s, max(pos) AS e, count(*) AS nw
         |  FROM (SELECT doc_id, pos,
         |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |        FROM dw)
         |  GROUP BY 1, 2
         |), mrk AS (
         |  SELECT doc_id, s, e, nw,
         |    CASE WHEN pmax IS NULL OR s > pmax + ${SpanW - 1} THEN 1 ELSE 0 END AS news
         |  FROM (SELECT doc_id, s, e, nw,
         |          max(e) OVER (PARTITION BY doc_id ORDER BY s
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |        FROM isl)
         |), spans AS (
         |  SELECT doc_id, spanid, min(s) AS s, max(e) AS e,
         |    CAST(sum(nw) AS BIGINT) AS nw, max(e) - min(s) + $SpanW AS span_tokens
         |  FROM (SELECT *, sum(news) OVER (PARTITION BY doc_id ORDER BY s
         |          ROWS UNBOUNDED PRECEDING) AS spanid FROM mrk)
         |  GROUP BY 1, 2
         |), per AS (
         |  SELECT doc_id, count(*) AS n_spans, CAST(sum(nw) AS BIGINT) AS dup_windows,
         |    CAST(sum(span_tokens) AS BIGINT) AS covered
         |  FROM spans GROUP BY 1
         |), toks AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS tpos, tk[i + 1] AS tok
         |  FROM t, unnest(range(len(tk))) r(i)
         |), surv AS (
         |  SELECT p.doc_id, string_agg(p.tok, ' ' ORDER BY p.tpos) AS surviving
         |  FROM toks p
         |  WHERE NOT EXISTS (SELECT 1 FROM spans sp WHERE sp.doc_id = p.doc_id
         |    AND p.tpos BETWEEN sp.s AND sp.e + ${SpanW - 1})
         |  GROUP BY 1
         |)
         |SELECT per.doc_id, CAST(n_spans AS BIGINT) AS n_spans, dup_windows,
         |  covered, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  ${Hashing.Sql.portableLong("coalesce(surviving, '')")} AS surv_fp
         |FROM per JOIN t USING (doc_id) LEFT JOIN surv USING (doc_id)""".stripMargin)) {
    (spark, dir) =>
    val c = DocQueries.corpus(spark, dir).persist()
    val spans = Curation.dupSpansKeepFirst(c, "doc_id", "text", SpanW).persist()
    val per = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("n_windows")).as("dup_windows"),
        sum(col("span_tokens")).as("covered"))
    val surv = Curation.exciseSpans(c, spans, "doc_id", "text", SpanW)
    val out = per
      .join(c.select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens")), Seq("doc_id"))
      .join(surv, Seq("doc_id"))
      .withColumn("surv_fp", Hashing.portableLong(col("surviving")))
      .select("doc_id", "n_spans", "dup_windows", "covered", "n_tokens", "surv_fp")
      .persist()
    out.count()
    spans.unpersist(); c.unpersist()
    out
  }

  // ---- q185: length-bucketed batching (padding efficiency) -----------

  private val PadMaxLen = 128L // truncation cap
  private val PadBatch = 32L   // docs per batch
  private val PadShards = 8L   // per-worker batch formation

  /**
   * q185 — length-bucketed batching (HF `group_by_length` / the
   * length-sorted batching every trainer's data loader does): documents
   * form fixed-size batches and pad to the batch max; sorting by length
   * inside each shard packs like-sized docs together and the gate pins
   * exactly how much padding that saves vs arrival order. Batches form
   * PER SHARD (doc_id mod 8 — per-worker batch formation, the 100 TB
   * shape: each worker sorts and batches ITS partition, no global sort;
   * q142's shard-partitioned-sort writer plan). Lengths truncate at 128.
   * Output per mode: batch count, real tokens, padded slots, and the
   * waste ratio in ppm — all exact integers.
   */
  val paddingEfficiency = GateQuery(
    "q185_padding_efficiency",
    Some {
      val tc = TextOps.Sql.tokenCount("text")
      def modeCte(mode: String, orderKey: String) =
        s"""${mode}_b AS (
           |  SELECT shard, least($tc, $PadMaxLen) AS len,
           |    (row_number() OVER (PARTITION BY shard ORDER BY $orderKey)
           |      - 1) // $PadBatch AS b
           |  FROM (SELECT doc_id % $PadShards AS shard, doc_id, text
           |        FROM documents)
           |), ${mode}_g AS (
           |  SELECT shard, b, count(*) AS n, CAST(sum(len) AS BIGINT) AS toks,
           |    count(*) * max(len) AS padded
           |  FROM ${mode}_b GROUP BY 1, 2
           |)""".stripMargin
      s"""WITH ${modeCte("arr", "doc_id")},
         |${modeCte("srt", "least($TC, $ML), doc_id"
          .replace("$TC", tc).replace("$ML", PadMaxLen.toString))}
         |SELECT mode, count(*) AS n_batches,
         |  CAST(sum(toks) AS BIGINT) AS sum_tokens,
         |  CAST(sum(padded) AS BIGINT) AS sum_padded,
         |  CAST(1000000 * (sum(padded) - sum(toks)) // sum(padded) AS BIGINT)
         |    AS waste_ppm
         |FROM (SELECT 'arrival' AS mode, * FROM arr_g
         |      UNION ALL SELECT 'sorted', * FROM srt_g)
         |GROUP BY 1""".stripMargin
    }) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.operators.VectorOps
    val base = Tables.load(spark, dir, "documents")
      .select((col("doc_id") % PadShards).as("shard"), col("doc_id"),
        least(TextOps.tokenCount(col("text")).cast("long"),
          lit(PadMaxLen)).as("len"))
    def agg(mode: String, w: org.apache.spark.sql.expressions.WindowSpec) =
      base
        .withColumn("b", VectorOps.floorDiv(
          row_number().over(w).cast("long") - 1L, lit(PadBatch)))
        .groupBy("shard", "b")
        .agg(count(lit(1)).as("n"), sum(col("len")).as("toks"),
          (count(lit(1)) * max(col("len"))).as("padded"))
        .agg(count(lit(1)).as("n_batches"), sum(col("toks")).as("sum_tokens"),
          sum(col("padded")).as("sum_padded"))
        .select(lit(mode).as("mode"), col("n_batches"), col("sum_tokens"),
          col("sum_padded"),
          VectorOps.floorDiv(
            lit(1000000L) * (col("sum_padded") - col("sum_tokens")),
            col("sum_padded")).as("waste_ppm"))
    val arrival = agg("arrival",
      Window.partitionBy(col("shard")).orderBy(col("doc_id")))
    val sorted = agg("sorted",
      Window.partitionBy(col("shard")).orderBy(col("len"), col("doc_id")))
    arrival.unionByName(sorted)
  }

  def all: Seq[GateQuery] = Seq(contamination, stratifiedSample, tokenPacking,
    piiScan, mixturePlan, qualityClassifier, docChunking, corpusReport,
    boilerplate, bpeMerges, nbClassifier, passageDedup, epochShuffle,
    sourceCaps, cdcChunks, pipeline, bpeEncode, dsirSelect, spanExcision,
    spanKeepFirst, paddingEfficiency)
}
