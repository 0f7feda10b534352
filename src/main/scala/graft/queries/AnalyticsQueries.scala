package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/**
 * Warehouse analytics over the landed tables — the query patterns a
 * consumer of the CDC/curation pipelines actually runs day-to-day:
 * optimizer statistics, referential-integrity audits, funnel and
 * retention analyses. All exact-arithmetic, all one-or-two bounded
 * shuffles; each gate's oracle replays the full computation.
 */
object AnalyticsQueries {

  /**
   * q205 — table statistics collection (the ANALYZE TABLE shape that
   * feeds broadcast/join-order decisions): per column, null count, exact
   * NDV, min/max — all four columns in ONE aggregation pass, unpivoted
   * to long form. Production swaps exact NDV for approx_count_distinct
   * (HLL, the q156 path) — exact here so the oracle can pin it.
   */
  val tableStats = GateQuery(
    "q205_table_stats",
    Some {
      val cols = Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
           |  CAST(min($c) AS DOUBLE) AS min_d, CAST(max($c) AS DOUBLE) AS max_d
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    }) { (spark, dir) =>
    val cols = Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val li = Tables.load(spark, dir, "lineitem")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col("n_rows"),
          col(s"${c}_nn").as("n_nulls"), col(s"${c}_ndv").as("ndv"),
          col(s"${c}_min").as("min_d"), col(s"${c}_max").as("max_d"))
      }: _*)).as("s"))
      .select("s.*")
  }

  /**
   * q206 — referential-integrity audit (the sync-diff-adjacent data-
   * quality check): per FK edge, child rows, orphan children (anti-join
   * against the parent) and childless parents — two broadcast-friendly
   * anti-join counts per edge, no row ever leaves its partition twice.
   */
  val fkAudit = GateQuery(
    "q206_fk_audit",
    Some(
      """SELECT 'lineitem.l_orderkey->orders' AS fk,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o
        |      WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |      WHERE l.l_orderkey = o.o_orderkey)) AS n_childless
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c
        |      WHERE c.c_custkey = o.o_custkey)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer c
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o
        |      WHERE o.o_custkey = c.c_custkey))""".stripMargin)) {
    (spark, dir) =>
    def edge(fk: String, child: org.apache.spark.sql.DataFrame, ck: String,
        parent: org.apache.spark.sql.DataFrame, pk: String) = {
      val nChild = child.count()
      val nOrphan = child.join(parent, child(ck) === parent(pk), "left_anti")
        .count()
      val nChildless = parent.join(child, child(ck) === parent(pk),
        "left_anti").count()
      (fk, nChild, nOrphan, nChildless)
    }
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    import spark.implicits._
    Seq(
      edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
      edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"))
      .toDF("fk", "n_child", "n_orphan", "n_childless")
  }

  /**
   * q207 — funnel analysis (signup → view → click → purchase): per user
   * a sequential automaton over the time-ordered event stream advances a
   * stage exactly when the NEXT stage's event type arrives — one
   * `flatMapSortedGroups` pass, two ints of state per user. The oracle
   * replays every automaton step through an indexed recursive CTE. The
   * conversion histogram (users per max stage reached) is the gate.
   */
  val funnel = GateQuery(
    "q207_funnel",
    Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS i
        |  FROM events
        |  WHERE epoch_us(ts) < (SELECT min(epoch_us(ts)) FROM events)
        |    + 360000000000
        |), n AS (SELECT user_id, max(i) AS mx FROM e GROUP BY 1),
        |rec AS (
        |  SELECT e.user_id, e.i,
        |    CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END AS stage
        |  FROM e WHERE e.i = 1
        |  UNION ALL
        |  SELECT x.user_id, x.i,
        |    CASE WHEN r.stage = 0 AND x.event_type = 'signup' THEN 1
        |         WHEN r.stage = 1 AND x.event_type = 'view' THEN 2
        |         WHEN r.stage = 2 AND x.event_type = 'click' THEN 3
        |         WHEN r.stage = 3 AND x.event_type = 'purchase' THEN 4
        |         ELSE r.stage END
        |  FROM rec r JOIN e x ON x.user_id = r.user_id AND x.i = r.i + 1
        |), fin AS (
        |  SELECT r.user_id, r.stage FROM rec r JOIN n ON n.user_id = r.user_id
        |  WHERE r.i = n.mx
        |)
        |SELECT CAST(stage AS BIGINT) AS stage,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM fin GROUP BY 1""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    val stages = Map("signup" -> 1, "view" -> 2, "click" -> 3, "purchase" -> 4)
    val all = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("ts DIV 1000").as("us"), col("event_id"),
        col("event_type"))
    // first-100h slice: early enough that the stage histogram spreads
    val cut = all.agg(min("us")).head().getLong(0) + 360_000_000_000L
    all.filter(col("us") < cut)
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"us", $"event_id") { case (user, it) =>
        var stage = 0
        it.foreach { case (_, _, _, et) =>
          if (stages.get(et).contains(stage + 1)) stage += 1
        }
        Iterator.single((user, stage.toLong))
      }
      .toDF("user_id", "stage")
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  /**
   * q208 — retention cohorts: users grouped by first-seen week, the
   * classic (cohort, week-offset) → active-users triangle. Two bounded
   * aggregations: first-seen per user (broadcast back — |users| rows),
   * then distinct (user, week) activity. Exact epoch-week arithmetic.
   */
  val retention = GateQuery(
    "q208_retention",
    Some(
      """WITH f AS (
        |  SELECT user_id, min(epoch_us(ts)) // 604800000000 AS w0
        |  FROM events GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT e.user_id, f.w0,
        |    epoch_us(e.ts) // 604800000000 - f.w0 AS off
        |  FROM events e JOIN f ON f.user_id = e.user_id
        |)
        |SELECT w0 AS cohort_week, CAST(off AS BIGINT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM a GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
    val WeekUs = 604_800_000_000L
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("ts DIV 1000").as("us"))
    val div = (c: org.apache.spark.sql.Column) =>
      ((c - pmod(c, lit(WeekUs))) / WeekUs).cast("long")
    val first = e.groupBy("user_id").agg(div(min(col("us"))).as("w0"))
    e.join(broadcast(first), "user_id")
      .select(col("user_id"), col("w0"), (div(col("us")) - col("w0")).as("off"))
      .distinct()
      .groupBy(col("w0").as("cohort_week"), col("off").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /**
   * q209 — edit-distance-verified near-dup pairs: the exact-verify tier
   * between SimHash/MinHash (bit/set similarity) and PPJoin (token-set
   * exact): candidate pairs from cheap blocking (language × 64-char
   * length bucket — the standard blocking recall tradeoff; MinHash is
   * the recall path), then Levenshtein over the 120-char prefix as the
   * verifier. The Spark side runs the THRESHOLDED (banded) DP — the
   * standard bounded-verifier practice, O(len·τ) with early exit instead
   * of O(len²); exact within τ=20 by contract, so the within-τ distances
   * are still oracle-pinned against DuckDB's full DP, not just the
   * counts. Per language: candidates checked, pairs within τ, and the
   * minimum WITHIN-τ distance (−1 when no pair qualifies).
   */
  val editDistDedup = GateQuery(
    "q209_editdist_pairs",
    Some(
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars // 64 AS blk,
        |    substr(text, 1, 120) AS t
        |  FROM documents
        |), p AS (
        |  SELECT a.lang, levenshtein(a.t, b.t) AS lev
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.blk = b.blk
        |    AND a.doc_id < b.doc_id
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_checked,
        |  CAST(sum(CASE WHEN lev <= 20 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_neardup,
        |  CAST(coalesce(min(CASE WHEN lev <= 20 THEN lev END), -1) AS BIGINT)
        |    AS min_lev
        |FROM p GROUP BY 1""".stripMargin)) { (spark, dir) =>
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        ((col("n_chars") - pmod(col("n_chars"), lit(64L))) / 64L)
          .cast("long").as("blk"),
        substring(col("text"), 1, 120).as("t"))
    val a = d.select(col("doc_id").as("aid"), col("lang"), col("blk"),
      col("t").as("ta"))
    val b = d.select(col("doc_id").as("bid"), col("lang").as("lb"),
      col("blk").as("bb"), col("t").as("tb"))
    // levenshtein(_, _, 20): exact distance when <= 20, -1 past the band
    a.join(b, col("lang") === col("lb") && col("blk") === col("bb") &&
        col("aid") < col("bid"))
      .select(col("lang"),
        levenshtein(col("ta"), col("tb"), 20).as("lev"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("lev") >= 0, 1L).otherwise(0L)).as("n_neardup"),
        coalesce(min(when(col("lev") >= 0, col("lev"))), lit(-1L))
          .as("min_lev"))
  }

  private val PrIters = 3

  /**
   * q210 — exact fixed-point PageRank ([[graft.operators.Graphs]]): the
   * supplier co-occurrence graph (consecutive line numbers within an
   * order → directed edge, multi-edges kept) ranked through 3 damped
   * iterations in pure ppm integers — per-edge integral-division
   * contributions, so the oracle's generated stage-per-iteration CTE
   * replays every rank bit-for-bit. The domain-centrality shape of
   * web-corpus weighting, one destination-keyed shuffle per round.
   */
  val pageRank = GateQuery(
    "q210_pagerank",
    Some {
      def stage(i: Int): String =
        s"""p$i AS (
           |  SELECT n.node,
           |    150000 + (850000 * coalesce(m.s, 0)) // 1000000 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst, sum(p.pr // d.deg) AS s
           |    FROM e JOIN p${i - 1} p ON p.node = e.src
           |    JOIN deg d ON d.src = e.src GROUP BY 1
           |  ) m ON m.dst = n.node
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey
         |   AND b.l_linenumber = a.l_linenumber + 1
         |), nodes AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
         |), deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
         |${(1 to PrIters).map(stage).mkString(", ")}
         |SELECT node, CAST(pr AS BIGINT) AS pr_ppm FROM p$PrIters""".stripMargin
    }) { (spark, dir) =>
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_suppkey")
    val a = li.select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_suppkey").as("src"))
    val b = li.select(col("l_orderkey").as("ok2"),
      col("l_linenumber").as("ln2"), col("l_suppkey").as("dst"))
    val edges = a.join(b, col("ok") === col("ok2") &&
      col("ln2") === col("ln") + 1)
    graft.operators.Graphs.pageRank(edges, "src", "dst", PrIters)
  }

  private val SessGapUs = 86_400_000_000L // 24 h idle gap
  private val SessCapUs = 259_200_000_000L // 72 h max duration

  /**
   * q213 — gap + MAX-DURATION sessionization
   * ([[graft.operators.Sessions.sessionizeCapped]]), the Flink
   * session-with-max shape Spark's native session_window lacks: a
   * session closes on idle > 24 h OR at the 72 h cap (runaway sessions
   * force-split). Sequential per-user fold, two longs of state; the
   * oracle replays every split decision through an indexed recursive
   * CTE carrying (sess, start, prev).
   */
  val cappedSessions = GateQuery(
    "q213_capped_sessions",
    Some(
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS i
         |  FROM events
         |), rec AS (
         |  SELECT user_id, i, us, CAST(1 AS BIGINT) AS sess, us AS start
         |  FROM e WHERE i = 1
         |  UNION ALL
         |  SELECT n.user_id, n.i, n.us,
         |    CASE WHEN n.us - r.us > $SessGapUs
         |           OR n.us - r.start >= $SessCapUs
         |         THEN r.sess + 1 ELSE r.sess END,
         |    CASE WHEN n.us - r.us > $SessGapUs
         |           OR n.us - r.start >= $SessCapUs
         |         THEN n.us ELSE r.start END
         |  FROM rec r JOIN e n ON n.user_id = r.user_id AND n.i = r.i + 1
         |), s AS (
         |  SELECT user_id, sess, count(*) AS ne FROM rec GROUP BY 1, 2
         |)
         |SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
         |  CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(sum(ne) AS BIGINT) AS n_events,
         |  CAST(max(ne) AS BIGINT) AS max_sess_events
         |FROM s GROUP BY 1""".stripMargin)) { (spark, dir) =>
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("ts DIV 1000").as("us"), col("event_id"))
    graft.operators.Sessions.sessionizeCapped(
        e, "user_id", "us", "event_id", SessGapUs, SessCapUs)
      .groupBy("k", "sess").agg(count(lit(1)).as("ne"))
      .groupBy((col("k") % 10).as("cohort"))
      .agg(count(lit(1)).as("n_sessions"), sum("ne").as("n_events"),
        max("ne").as("max_sess_events"))
  }

  /**
   * q214 — exact correlation components: Pearson r per return flag from
   * five EXACT decimal sums (n, Σx, Σy, Σxy, Σx², Σy²) — float
   * summation order never touches the aggregates; the one float
   * division happens once per GROUP over the exact inputs. r itself is
   * pinned at 1e-9 (not bit-exact): the decimal→double CAST of a
   * ≥16-digit component (Σy² here) may legitimately round to a
   * different ulp per engine — observed at sf0.001, where Spark and
   * DuckDB disagreed in the 15th digit of r from a one-ulp Σy² cast.
   * The mergeable-components form is how corr/cov run at 100 TB
   * (partial-agg combinable; `corr()` builtins float-drift under
   * reordering).
   */
  val corrComponents = GateQuery(
    "q214_corr_exact",
    Some(
      """WITH a AS (
        |  SELECT l_returnflag,
        |    count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) *
        |        CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) *
        |        CAST(l_quantity AS DECIMAL(18,2))) AS sx2,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(l_extendedprice AS DECIMAL(18,2))) AS sy2
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(sx AS DOUBLE) AS sum_x, CAST(sy AS DOUBLE) AS sum_y,
        |  CAST(sxy AS DOUBLE) AS sum_xy,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |   sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS corr_r
        |FROM a""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(18, 2)
    val x = col("l_quantity").cast(d)
    val y = col("l_extendedprice").cast(d)
    val a = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sx2"), sum(y * y).as("sy2"))
    val (nD, sxD, syD, sxyD, sx2D, sy2D) = (col("n").cast("double"),
      col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sx2").cast("double"),
      col("sy2").cast("double"))
    a.select(col("l_returnflag"), col("n"), sxD.as("sum_x"), syD.as("sum_y"),
      sxyD.as("sum_xy"),
      round((nD * sxyD - sxD * syD) /
        (sqrt(nD * sx2D - sxD * sxD) * sqrt(nD * sy2D - syD * syD)), 9)
        .as("corr_r"))
  }

  def all: Seq[GateQuery] = Seq(tableStats, fkAudit, funnel, retention,
    editDistDedup, pageRank, cappedSessions, corrComponents)
}
