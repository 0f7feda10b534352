package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import graft.operators.Layout

/**
 * Gates for the storage-layout / sampling / skew tier — operators whose
 * entire reason to exist is the 100 TB story: what gets pruned before the
 * scan, what gets sampled instead of read, and where the shuffle keys
 * concentrate.
 */
object ScaleQueries {

  private val ZBits = 10
  private val ZFiles = 64
  // box predicate in quantized coords: a 1/8 × 1/4 rectangle
  private val Bx0 = 256L; private val Bx1 = 383L
  private val By0 = 512L; private val By1 = 767L

  /** DuckDB twin of [[Layout.zValue2]] over quantized cols `xq`/`yq`. */
  private def zSql(xq: String, yq: String): String =
    s"list_sum([ (($xq >> i) & 1) * (1::BIGINT << (2*i)) + " +
      s"(($yq >> i) & 1) * (1::BIGINT << (2*i + 1)) for i in range($ZBits) ])"

  /**
   * q194 — Z-ORDER layout vs linear sort, measured as min/max file
   * skipping ([[Layout.skippingReport]]): lineitem laid out as 64
   * equal files by (a) the Morton curve over quantized (l_partkey,
   * l_suppkey) and (b) the l_partkey-linear sort; a 2-dim box predicate
   * then prunes files on per-file min/max stats. The gate pins, per
   * layout, exactly how many files the box query skips and how many rows
   * survive to be scanned — the storage-side answer to "does this still
   * work at 100 TB". The production writer ([[Layout.writeZOrdered]])
   * range-shuffles on the z-value; Round11Spec checks real written files
   * prune the same way.
   */
  val zorderLayout = GateQuery(
    "q194_zorder_layout",
    Some(
      s"""WITH src AS (
         |  SELECT l_partkey AS x, l_suppkey AS y FROM lineitem
         |), mx AS (
         |  SELECT max(x) AS mxx, max(y) AS mxy FROM src
         |), q AS (
         |  SELECT (x * ${(1L << ZBits) - 1}) // mxx AS xq,
         |         (y * ${(1L << ZBits) - 1}) // mxy AS yq
         |  FROM src, mx
         |), z AS (
         |  SELECT xq, yq, ${zSql("xq", "yq")} AS zv FROM q
         |), lay AS (
         |  SELECT xq, yq,
         |    ntile($ZFiles) OVER (ORDER BY zv, xq, yq) AS fz,
         |    ntile($ZFiles) OVER (ORDER BY xq, yq) AS fl
         |  FROM z
         |), stats AS (
         |  SELECT 'zorder' AS layout, fz AS fid, count(*) AS n_rows,
         |    sum(CASE WHEN xq BETWEEN $Bx0 AND $Bx1
         |             AND yq BETWEEN $By0 AND $By1 THEN 1 ELSE 0 END) AS n_box,
         |    min(xq) AS min_x, max(xq) AS max_x,
         |    min(yq) AS min_y, max(yq) AS max_y
         |  FROM lay GROUP BY fz
         |  UNION ALL
         |  SELECT 'linear', fl, count(*),
         |    sum(CASE WHEN xq BETWEEN $Bx0 AND $Bx1
         |             AND yq BETWEEN $By0 AND $By1 THEN 1 ELSE 0 END),
         |    min(xq), max(xq), min(yq), max(yq)
         |  FROM lay GROUP BY fl
         |), flagged AS (
         |  SELECT layout, n_rows, n_box,
         |    CASE WHEN max_x < $Bx0 OR min_x > $Bx1
         |         OR max_y < $By0 OR min_y > $By1 THEN 1 ELSE 0 END AS skipped
         |  FROM stats
         |)
         |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(skipped) AS BIGINT) AS files_skipped,
         |  CAST(sum(CASE WHEN skipped = 0 THEN n_rows ELSE 0 END) AS BIGINT)
         |    AS rows_scanned,
         |  CAST(sum(n_box) AS BIGINT) AS rows_matched
         |FROM flagged GROUP BY layout""".stripMargin)) { (spark, dir) =>
    Layout.skippingReport(
      Tables.load(spark, dir, "lineitem"), "l_partkey", "l_suppkey",
      ZBits, ZFiles, Bx0, Bx1, By0, By1)
  }

  /**
   * q195 — weighted sampling WITHOUT replacement
   * ([[graft.operators.Sampling.weightedSampleK]], Efraimidis–Spirakis):
   * 100 documents drawn with inclusion pressure ∝ n_chars, priorities in
   * exact fixed point (portable seeded hash → quantized −log2), selection
   * = the k smallest (priority, id) via TakeOrderedAndProject — the
   * no-shuffle way to subsample a 100 TB corpus. Oracle replays hash,
   * log table and division bit-for-bit.
   */
  val weightedSample = GateQuery(
    "q195_weighted_sample",
    Some {
      val u = graft.operators.Sampling.Sql.u("doc_id", 195)
      val l2 = graft.operators.Sampling.Sql.l2q8("(u)")
      s"""WITH base AS (
         |  SELECT doc_id, greatest(n_chars, 1) AS w, ($u) AS u
         |  FROM documents
         |), pri AS (
         |  SELECT doc_id, w,
         |    CAST(((5120 - $l2) * 65536) // w AS BIGINT) AS priority_q
         |  FROM base
         |)
         |SELECT doc_id, CAST(w AS BIGINT) AS w, priority_q
         |FROM pri ORDER BY priority_q, doc_id LIMIT 100""".stripMargin
    }) { (spark, dir) =>
    graft.operators.Sampling.weightedSampleK(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", 100, 195)
      .select(col("doc_id"),
        greatest(col("n_chars"), lit(1L)).as("w"), col("priority_q"))
  }

  /**
   * q196 — URL canonicalization + registered-domain rollup
   * ([[graft.operators.UrlOps]]): deterministic raw crawl URLs (case
   * noise, www, default/explicit ports, tracking params, unsorted query,
   * trailing slash, fragments — all driven off doc_id) collapse to
   * canonical keys; per registered domain the gate pins doc count,
   * UNIQUE canonical urls (the url-level dedup story: different raw
   * strings, same page) and the XOR hash of every canonical string —
   * byte-for-byte agreement with DuckDB's independent replay of the
   * whole rule set.
   */
  val urlCanon = GateQuery(
    "q196_url_canon",
    Some {
      val re = "'^([A-Za-z]+)://([^/?#]+)([^?#]*)\\??([^#]*)'"
      val pl = graft.core.Hashing.Sql.portableLong("cu")
      s"""WITH raw AS (
         |  SELECT (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https'
         |            ELSE 'Http' END) || '://' ||
         |    (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END) ||
         |    (CASE WHEN doc_id % 8 < 4 THEN 'cdn.' ELSE '' END) ||
         |    source || '.CoM' ||
         |    (CASE WHEN doc_id % 5 = 0 THEN
         |       (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END)
         |     WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END) ||
         |    '/p/' || (doc_id % 50) ||
         |    (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
         |    (CASE doc_id % 3
         |     WHEN 0 THEN '?utm_source=x&id=' || (doc_id % 25)
         |     WHEN 1 THEN '?id=' || (doc_id % 25) || '&utm_campaign=z&b=2'
         |     ELSE '' END) ||
         |    (CASE WHEN doc_id % 6 = 0 THEN '#top' ELSE '' END) AS url
         |  FROM documents
         |), parts AS (
         |  SELECT lower(regexp_extract(url, $re, 1)) AS sch,
         |    regexp_replace(lower(regexp_extract(url, $re, 2)),
         |      '^www\\.', '') AS h1,
         |    regexp_replace(regexp_extract(url, $re, 3), '/+$$', '') AS p1,
         |    regexp_extract(url, $re, 4) AS q0
         |  FROM raw
         |), canon AS (
         |  SELECT
         |    CASE WHEN sch = 'https' THEN regexp_replace(h1, ':443$$', '')
         |         WHEN sch = 'http' THEN regexp_replace(h1, ':80$$', '')
         |         ELSE h1 END AS hc,
         |    sch, CASE WHEN p1 = '' THEN '/' ELSE p1 END AS pc,
         |    array_to_string(list_sort([x FOR x IN str_split(q0, '&')
         |      IF NOT starts_with(x, 'utm_')
         |         AND NOT starts_with(x, 'gclid=')]), '&') AS qc
         |  FROM parts
         |), cu AS (
         |  SELECT hc, sch || '://' || hc || pc ||
         |    (CASE WHEN qc = '' THEN '' ELSE '?' || qc END) AS cu
         |  FROM canon
         |)
         |SELECT regexp_extract(regexp_replace(hc, ':[0-9]+$$', ''),
         |    '([^.]+\\.[^.]+)$$', 1) AS registered_domain,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT cu) AS BIGINT) AS n_unique_urls,
         |  CAST(coalesce(bit_xor($pl), 0) AS BIGINT) AS xor_url
         |FROM cu GROUP BY 1""".stripMargin
    }) { (spark, dir) =>
    import graft.operators.UrlOps
    val d = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val url = concat(
      when(id % 3 === 0, "HTTPS").when(id % 3 === 1, "https").otherwise("Http"),
      lit("://"),
      when(id % 4 === 0, "WWW.").otherwise(""),
      when(id % 8 < 4, "cdn.").otherwise(""),
      col("source"), lit(".CoM"),
      when(id % 5 === 0, when(id % 3 === 0, ":443").otherwise(":80"))
        .when(id % 7 === 0, ":8080").otherwise(""),
      lit("/p/"), (id % 50).cast("string"),
      when(id % 2 === 0, "/").otherwise(""),
      when(id % 3 === 0, concat(lit("?utm_source=x&id="), (id % 25).cast("string")))
        .when(id % 3 === 1,
          concat(lit("?id="), (id % 25).cast("string"), lit("&utm_campaign=z&b=2")))
        .otherwise(""),
      when(id % 6 === 0, "#top").otherwise(""))
    d.select(url.as("url"))
      .select(UrlOps.canonicalUrl(col("url")).as("cu"),
        UrlOps.registeredDomain(col("url")).as("registered_domain"))
      // hash through the SHARED portable builder, pre-projected so the
      // bit_xor aggregate can reference it by name
      .withColumn("_h", graft.core.Hashing.portableLong(col("cu")))
      .groupBy("registered_domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cu")).as("n_unique_urls"),
        coalesce(expr("bit_xor(_h)"), lit(0L)).as("xor_url"))
  }

  /**
   * q197 — skew diagnosis ([[graft.operators.Skew.skewPlan]]): the
   * low-cardinality group-by key (event_type, 5 values vs 32 reducers —
   * the classic skew cliff) diagnosed into an exact salting plan: every
   * hot key's row count, ppm share, and the ⌈n·P/total⌉ salt factor that
   * [[graft.operators.Skew.saltedAgg]] consumes. SkewSpec pins that
   * aggregating WITH the recommended salts reproduces the exact counts.
   */
  val skewPlanGate = GateQuery(
    "q197_skew_plan",
    Some(
      """WITH c AS (
        |  SELECT event_type AS key, count(*) AS n_rows FROM events GROUP BY 1
        |), t AS (SELECT sum(n_rows) AS total FROM c)
        |SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST((n_rows * 1000000) // total AS BIGINT) AS share_ppm,
        |  CAST((n_rows * 32 + total - 1) // total AS BIGINT) AS salts
        |FROM c, t WHERE n_rows * 32 > 2 * total""".stripMargin)) {
    (spark, dir) =>
    graft.operators.Skew.skewPlan(
      Tables.load(spark, dir, "events"), "event_type", 32, 2)
  }

  private val KCenters = 8

  /**
   * q198 — k-center coreset selection
   * ([[graft.operators.VectorOps.kCenterGreedy]]): 8 farthest-first
   * centers over the embeddings table, exact int8 squared-L2, ties to the
   * smaller id. The oracle replays every greedy round independently
   * (generated stage-per-round SQL — select s_i, then argmax of
   * min-distance against it), so engine and oracle agree on the entire
   * selection PATH, not just the final set.
   */
  val kCenter = GateQuery(
    "q198_kcenter_coreset",
    heavy = true, // k driver-side argmax rounds over a persisted corpus
    oracle = Some {
      val qv = graft.operators.VectorOps.Sql.quantizeInt8("embedding")
      def dist(a: String, b: String) =
        s"CAST(list_sum([ (z[1]-z[2])*(z[1]-z[2]) FOR z IN list_zip($a, $b)]) AS BIGINT)"
      val stages = (2 to KCenters).map { i =>
        s"""p$i AS (
           |  SELECT p.vec_id, min(${dist("p.qv", "c.qv")}) AS md
           |  FROM q p JOIN q c ON c.vec_id IN (SELECT vec_id FROM s${i - 1})
           |  GROUP BY p.vec_id ORDER BY md DESC, p.vec_id LIMIT 1
           |), s$i AS (
           |  SELECT vec_id FROM s${i - 1} UNION ALL SELECT vec_id FROM p$i
           |)""".stripMargin
      }.mkString(", ")
      val out = (2 to KCenters).map(i =>
        s"SELECT CAST($i AS BIGINT) AS sel_rank, vec_id, md AS d2_sel FROM p$i")
        .mkString(" UNION ALL ")
      s"""WITH q AS (
         |  SELECT vec_id, $qv AS qv FROM embeddings
         |), s1 AS (SELECT vec_id FROM q ORDER BY vec_id LIMIT 1),
         |$stages
         |SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id,
         |  CAST(0 AS BIGINT) AS d2_sel FROM s1
         |UNION ALL $out""".stripMargin
    }) { (spark, dir) =>
    graft.operators.VectorOps.kCenterGreedy(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", KCenters)
  }

  /**
   * q200 — conditional MERGE INTO ([[graft.operators.Merge.merge]]):
   * a derived source batch (rewritten keys → inserts, price bumps →
   * guarded updates, stale −50 rows → update guard HOLDS THE TARGET,
   * every-9th key → delete) applies onto the orders snapshot through
   * first-match-wins clauses in ONE full-outer join pass. The gate pins
   * the merged table's row count, exact price mass, per-status counts
   * and key XOR against DuckDB's replay of the clause cascade.
   */
  val mergeInto = GateQuery(
    "q200_merge_into",
    Some(
      """WITH t AS (
        |  SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS st
        |  FROM orders
        |), s AS (
        |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN o_orderkey + 10000000
        |              ELSE o_orderkey END AS k,
        |    CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 100
        |         ELSE o_totalprice - 50 END AS p,
        |    'M' AS st
        |  FROM orders WHERE o_orderkey % 3 = 0
        |), j AS (
        |  SELECT t.k AS tk, t.p AS tp, t.st AS tst,
        |         s.k AS sk, s.p AS sp, s.st AS sst
        |  FROM t FULL OUTER JOIN s ON t.k = s.k
        |), r AS (
        |  SELECT
        |    CASE WHEN sk IS NULL THEN tk
        |         WHEN tk IS NULL THEN (CASE WHEN sk % 2 = 1 THEN sk END)
        |         WHEN sk % 9 = 0 THEN NULL
        |         WHEN sp > tp THEN sk ELSE tk END AS k,
        |    CASE WHEN sk IS NULL THEN tp
        |         WHEN tk IS NULL THEN (CASE WHEN sk % 2 = 1 THEN sp END)
        |         WHEN sk % 9 = 0 THEN NULL
        |         WHEN sp > tp THEN sp ELSE tp END AS p,
        |    CASE WHEN sk IS NULL THEN tst
        |         WHEN tk IS NULL THEN (CASE WHEN sk % 2 = 1 THEN sst END)
        |         WHEN sk % 9 = 0 THEN NULL
        |         WHEN sp > tp THEN sst ELSE tst END AS st
        |  FROM j
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CASE WHEN st = 'M' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_merged,
        |  CAST(bit_xor(k) AS BIGINT) AS xor_keys
        |FROM r WHERE k IS NOT NULL""".stripMargin)) { (spark, dir) =>
    import graft.operators.Merge
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val src = o.filter(col("o_orderkey") % 3 === 0)
      .select(
        when(col("o_orderkey") % 5 === 0, col("o_orderkey") + 10000000L)
          .otherwise(col("o_orderkey")).as("o_orderkey"),
        when(col("o_orderkey") % 2 === 0, col("o_totalprice") + 100d)
          .otherwise(col("o_totalprice") - 50d).as("o_totalprice"),
        lit("M").as("o_orderstatus"))
    Merge.merge(o, src, Seq("o_orderkey"),
        updateCond = col("s.o_totalprice") > col("t.o_totalprice"),
        deleteCond = pmod(col("s.o_orderkey"), lit(9)) === 0,
        insertCond = pmod(col("s.o_orderkey"), lit(2)) === 1)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("sum_price"),
        sum(when(col("o_orderstatus") === "M", 1L).otherwise(0L))
          .as("n_merged"),
        expr("bit_xor(o_orderkey)").as("xor_keys"))
  }

  /**
   * q201 — incremental aggregate-view maintenance
   * ([[graft.operators.Ivm]]): a (count, sum) view grouped by
   * (returnflag, linestatus) is built on a base slice, then maintained
   * under a derived changelog (inserts, deletes, in-place quantity
   * updates) WITHOUT re-reading the base — state ⊎ signed delta, one
   * bounded shuffle. The oracle rebuilds the final table from scratch
   * and aggregates it: maintained state must be bit-equal to the full
   * recompute, exact-decimal sums included.
   */
  val ivmMaintain = GateQuery(
    "q201_ivm_maintain",
    Some(
      """WITH fin AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CASE WHEN l_orderkey % 7 = 3 THEN l_quantity + 5
        |         ELSE l_quantity END AS q
        |  FROM lineitem WHERE l_linenumber <= 4 AND l_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT l_returnflag, l_linestatus, l_quantity
        |  FROM lineitem WHERE l_linenumber >= 5
        |)
        |SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(q AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM fin GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
    import graft.operators.Ivm
    val keys = Seq("l_returnflag", "l_linestatus")
    val kc = keys.map(col)
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"))
    val base = li.filter(col("l_linenumber") <= 4)
    val state0 = Ivm.aggState(base, keys, "l_quantity")
    val nul = lit(null).cast("double")
    val ins = li.filter(col("l_linenumber") >= 5)
      .select(lit("i").as("op") +: kc :+ nul.as("val_before")
        :+ col("l_quantity").as("val_after"): _*)
    val del = base.filter(col("l_orderkey") % 7 === 0)
      .select(lit("d").as("op") +: kc :+ col("l_quantity").as("val_before")
        :+ nul.as("val_after"): _*)
    val upd = base.filter(col("l_orderkey") % 7 === 3)
      .select(lit("u").as("op") +: kc :+ col("l_quantity").as("val_before")
        :+ (col("l_quantity") + 5d).as("val_after"): _*)
    val log = ins.unionByName(del).unionByName(upd)
    Ivm.applyDelta(state0, Ivm.deltaState(log, keys), keys)
      .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
        col("sum_v").cast("double").as("sum_qty"))
  }

  private val TsStepUs = 7_200_000_000L // 2 h resample grid

  /**
   * q202 — time-series resample + forward-fill
   * ([[graft.operators.Timeseries.resampleFfill]]): each event type's
   * irregular value stream lands on a dense 2-hour grid, last
   * observation per bucket (ts then id — the CDC commit-order tie rule),
   * gaps carried forward, leading gaps NULL. Values are selected, never
   * summed, so doubles stay bit-exact; the gate pins every grid cell —
   * fill value and gap flag — against DuckDB's replay.
   */
  val resample = GateQuery(
    "q202_resample_ffill",
    Some(
      s"""WITH bounds AS (
         |  SELECT (min(epoch_us(ts)) // $TsStepUs) * $TsStepUs AS s,
         |         max(epoch_us(ts)) + 1 AS e
         |  FROM events
         |), a AS (
         |  SELECT event_type AS k,
         |    (epoch_us(ts) - (SELECT s FROM bounds)) // $TsStepUs AS b,
         |    value AS v,
         |    row_number() OVER (
         |      PARTITION BY event_type,
         |        (epoch_us(ts) - (SELECT s FROM bounds)) // $TsStepUs
         |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
         |  FROM events
         |), al AS (SELECT k, b, v FROM a WHERE rn = 1),
         |grid AS (
         |  SELECT k, unnest(range(0,
         |    (SELECT (e - 1 - s) // $TsStepUs + 1 FROM bounds))) AS b
         |  FROM (SELECT DISTINCT event_type AS k FROM events)
         |), j AS (
         |  SELECT g.k, g.b, al.v FROM grid g
         |  LEFT JOIN al ON al.k = g.k AND al.b = g.b
         |)
         |SELECT k, b * $TsStepUs + (SELECT s FROM bounds) AS bucket_us,
         |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
         |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
         |FROM j""".stripMargin)) { (spark, dir) =>
    import graft.operators.Timeseries
    val e = Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("ts DIV 1000").as("us"),
        col("event_id"), col("value"))
    val b = e.agg(min("us"), max("us")).head()
    val start = b.getLong(0) / TsStepUs * TsStepUs
    Timeseries.resampleFfill(e, "event_type", "us", "event_id", "value",
      TsStepUs, start, b.getLong(1) + 1)
  }

  /**
   * q203 — ROLLUP with grouping ids: the corpus report in one pass at
   * every aggregation level (source×lang, per-source subtotal, grand
   * total) — Spark's `rollup` plans a single expand+agg, the oracle is
   * the ANSI GROUP BY ROLLUP twin; grouping_id bitmasks match across
   * engines (lang is the LSB).
   */
  val rollupReport = GateQuery(
    "q203_rollup_report",
    Some(
      """SELECT coalesce(source, 'ALL') AS source,
        |  coalesce(lang, 'ALL') AS lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(grouping(source, lang) AS BIGINT) AS gid
        |FROM documents GROUP BY ROLLUP(source, lang)""".stripMargin)) {
    (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        grouping_id().as("gid"))
      .select(coalesce(col("source"), lit("ALL")).as("source"),
        coalesce(col("lang"), lit("ALL")).as("lang"),
        col("n_docs"), col("sum_chars"), col("gid"))
  }

  /**
   * q204 — PIVOT to a wide per-source language matrix: Spark's `pivot`
   * with an explicit value list (the 5 fixed langs) plans one expand-free
   * pivot agg; the oracle is the conditional-aggregation twin with
   * byte-identical column names.
   */
  val pivotMatrix = GateQuery(
    "q204_pivot_langs",
    Some {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val cols = langs.map(l =>
        s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS $l")
        .mkString(", ")
      s"SELECT source, $cols FROM documents GROUP BY source"
    }) { (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .groupBy(col("source"))
      .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  /**
   * q212 — stratified weighted sampling
   * ([[graft.operators.Sampling.weightedSampleKPerGroup]]): 10 docs per
   * language, inclusion ∝ n_chars, the same exact A-ES priority algebra
   * as q195 ranked per group — `WindowGroupLimit` pushes the limit
   * map-side (PlanShapeSpec), so each partition ships ≤ k rows per
   * group at any corpus size.
   */
  val stratifiedSample = GateQuery(
    "q212_stratified_sample",
    Some {
      val u = graft.operators.Sampling.Sql.u("doc_id", 212)
      val l2 = graft.operators.Sampling.Sql.l2q8("(u)")
      s"""WITH base AS (
         |  SELECT doc_id, lang, greatest(n_chars, 1) AS w, ($u) AS u
         |  FROM documents
         |), pri AS (
         |  SELECT doc_id, lang, w,
         |    CAST(((5120 - $l2) * 65536) // w AS BIGINT) AS priority_q,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ((5120 - $l2) * 65536) // w, doc_id) AS rn
         |  FROM base
         |)
         |SELECT lang, doc_id, CAST(w AS BIGINT) AS w, priority_q
         |FROM pri WHERE rn <= 10""".stripMargin
    }) { (spark, dir) =>
    graft.operators.Sampling.weightedSampleKPerGroup(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars")),
      "lang", "doc_id", "n_chars", 10, 212)
      .select(col("lang"), col("doc_id"),
        greatest(col("n_chars"), lit(1L)).as("w"), col("priority_q"))
  }

  /**
   * q218 — stable vocabulary ids ([[graft.operators.TextOps.vocabIds]] /
   * `vocabAdmit`): dense 1-based ids in lexicographic order over the
   * even-doc half's tokens, then the odd half admits — existing ids
   * IMMUTABLE (embedding row i keeps meaning row i), unseen tokens take
   * dense ids after the max. The gate pins the full mapping and the
   * is_new partition; the oracle derives both halves independently.
   */
  val vocabStable = GateQuery(
    "q218_vocab_ids",
    Some(
      """WITH t0 AS (
        |  SELECT DISTINCT unnest(str_split_regex(text, '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 0
        |), v0 AS (
        |  SELECT token, CAST(row_number() OVER (ORDER BY token) AS BIGINT)
        |    AS id FROM t0 WHERE token <> ''
        |), t1 AS (
        |  SELECT DISTINCT unnest(str_split_regex(text, '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 1
        |), fresh AS (
        |  SELECT token FROM t1 WHERE token <> ''
        |    AND token NOT IN (SELECT token FROM v0)
        |)
        |SELECT token, id, FALSE AS is_new FROM v0
        |UNION ALL
        |SELECT token,
        |  (SELECT coalesce(max(id), 0) FROM v0)
        |    + CAST(row_number() OVER (ORDER BY token) AS BIGINT),
        |  TRUE
        |FROM fresh""".stripMargin)) { (spark, dir) =>
    import graft.operators.TextOps
    val docs = Tables.load(spark, dir, "documents")
    val v0 = TextOps.vocabIds(docs.filter(col("doc_id") % 2 === 0), "text")
    TextOps.vocabAdmit(v0, docs.filter(col("doc_id") % 2 === 1), "text")
  }

  /**
   * q296 — the bank invariant as an ORACLE-DIFFED gate (reference:
   * tests/integration_tests/bank/case.go — its strongest end-to-end
   * consistency check; promoted from the Bench100x-only entry per r17
   * VERDICT #3). Balanced transfers derived from the events table fan
   * out to a debit+credit pair per transfer (both legs share the
   * transfer's batch — txn atomicity); ten ts-aligned batches apply to
   * an account state through incremental full-outer merges, exactly the
   * sink's microbatch-apply shape. After EVERY batch the gate records
   * the snapshot facts: total net (the Σ-balances invariant — must be
   * 0), accounts touched, and Σ|balance| (pins per-account values, not
   * just the sum). The oracle recomputes each snapshot DIRECTLY from
   * the cumulative ledger — so a mis-merged batch, a dropped leg, or a
   * double-applied delta diverges on the row for that batch. The
   * invariant itself is asserted Spark-side too: a non-zero net throws,
   * making bench/verify runs fail loudly, not just hash-diverge.
   */
  val bankInvariant = GateQuery(
    "q296_bank_invariant",
    Some("""WITH base AS (
      |  SELECT (user_id * 131 + 7) % 4096 AS f,
      |    (user_id * 7 + event_id) % 4096 AS t,
      |    (event_id % 100 + 1) AS a,
      |    event_id % 10 AS batch
      |  FROM events
      |  WHERE (user_id * 131 + 7) % 4096 <> (user_id * 7 + event_id) % 4096
      |), ledger AS (
      |  SELECT f AS pk, -a AS delta, batch FROM base
      |  UNION ALL
      |  SELECT t AS pk, a AS delta, batch FROM base
      |), acct AS (
      |  SELECT r.range AS batch, l.pk, CAST(sum(l.delta) AS BIGINT) AS net
      |  FROM range(10) r JOIN ledger l ON l.batch <= r.range
      |  GROUP BY 1, 2
      |)
      |SELECT CAST(batch AS BIGINT) AS batch,
      |  CAST(sum(net) AS BIGINT) AS net,
      |  CAST(count(*) AS BIGINT) AS accounts,
      |  CAST(sum(abs(net)) AS BIGINT) AS sum_abs
      |FROM acct GROUP BY batch ORDER BY batch""".stripMargin),
    heavy = true // 10 driver-loop merge rounds + localCheckpoint lineage
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val nAcc = 4096L
    val base = ev.select(
        ((col("user_id") * 131 + 7) % nAcc).as("f"),
        ((col("user_id") * 7 + col("event_id")) % nAcc).as("t"),
        (col("event_id") % 100 + 1).cast("long").as("a"),
        (col("event_id") % 10).cast("long").as("batch"))
      .filter(col("f") =!= col("t"))
    val ledger = base.select(col("f").as("pk"), (-col("a")).as("delta"),
        col("batch"))
      .unionByName(base.select(col("t").as("pk"), col("a").as("delta"),
        col("batch")))
    var state = spark.range(0).select(col("id").as("pk"), lit(0L).as("bal"))
    val snaps = (0L until 10L).map { b =>
      val batchDelta = ledger.filter(col("batch") === b)
        .groupBy("pk").agg(sum("delta").as("d"))
      state = state.join(batchDelta, Seq("pk"), "full")
        .select(col("pk"),
          (coalesce(col("bal"), lit(0L)) + coalesce(col("d"), lit(0L)))
            .as("bal"))
        .localCheckpoint()
      val row = state.agg(
        sum("bal").as("net"),
        count(lit(1)).as("accounts"),
        sum(abs(col("bal"))).as("sum_abs")).head()
      // the invariant IS the gate: balanced transfers must net to zero
      // after every microbatch, not only at the end
      if (row.getLong(0) != 0L)
        sys.error(s"bank invariant broken at batch $b: net ${row.getLong(0)}")
      (b, row.getLong(0), row.getLong(1), row.getLong(2))
    }
    snaps.toDF("batch", "net", "accounts", "sum_abs")
  }

  def all: Seq[GateQuery] = Seq(zorderLayout, weightedSample, urlCanon,
    skewPlanGate, kCenter, mergeInto, ivmMaintain, resample, rollupReport,
    pivotMatrix, stratifiedSample, vocabStable, bankInvariant)
}
