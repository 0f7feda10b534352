package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{CdcStream, Hashing, Tables}
import graft.streaming.{CaptureRegistry, Captures, KafkaOptions}
import graft.streaming.Captures.CaptureInfo
import graft.streaming.KafkaOptions.{Adjusted, Options, TopicMeta}

/**
 * Sink/config-surface gates: option validation + auto-adjust rule sets the
 * reference applies before a sink ever starts. Pure functions of (options,
 * cluster metadata) — the [[graft.diff.DiffConfig]] pattern — exercised
 * over a data-anchored matrix so the oracle replays the same rules in SQL.
 */
object ConfigQueries {

  /**
   * q245 — the Kafka sink option adjust/validate surface
   * ([[graft.streaming.KafkaOptions]], pkg/sink/kafka/options.go:199-226,
   * 580-756). The matrix anchors every byte limit in `count(orders)` and
   * sweeps the three rule families:
   *
   *  - `cap`: declared `max-message-bytes` ∈ {base, base/4} × topic state
   *    {topic cap below declared, cap in the 128-byte overhead band, cap
   *    ample, topic with no override falling back to the broker, absent
   *    topic with a small broker cap, absent topic with an invisible
   *    broker cap (hard error)} — net `min(declared, cap − 128)`, warning
   *    only on the cap ≤ declared leg, absent-topic partition default.
   *  - `part`: declared `partition-num` {0,4,8,16} against a real 8 (adopt
   *    / warn-keep / exact / hard error) and {0,5} against an absent topic
   *    (default 3 / keep), with the auto-create warning on existing topics.
   *  - `isr`: `required-acks` {-1,1} × `replication-factor` {1,2} ×
   *    `min.insync.replicas` visibility {topic=2, broker-fallback=2,
   *    absent-broker=2, hidden} — the rf < minIsr error only fires for
   *    acks=-1 with a visible config; hidden only warns.
   */
  val kafkaAdjust = GateQuery(
    "q245_kafka_adjust",
    Some("""WITH b AS (SELECT CAST(count(*) AS BIGINT) AS base FROM orders),
      |cap_rows AS (
      |  SELECT 'cap' AS part, m.kase, b.base // d.dv AS declared,
      |    CAST(1 AS BIGINT) AS acks,
      |    CASE m.kase
      |      WHEN 'topic_small' THEN b.base // 2
      |      WHEN 'topic_band' THEN b.base + 64
      |      WHEN 'topic_big' THEN b.base * 4
      |      WHEN 'fallback_small' THEN b.base // 2
      |      WHEN 'absent_small' THEN b.base // 2
      |      ELSE NULL END AS cap,
      |    m.kase NOT LIKE 'absent%' AS ex
      |  FROM b,
      |    (VALUES ('topic_small'), ('topic_band'), ('topic_big'),
      |            ('fallback_small'), ('absent_small'), ('absent_hidden')) m(kase),
      |    (VALUES (1), (4)) d(dv)
      |), cap_out AS (
      |  SELECT part, kase, declared, acks,
      |    CAST(CASE WHEN cap IS NULL THEN 0 ELSE 1 END AS INT) AS ok,
      |    CASE WHEN cap IS NULL THEN 'ErrKafkaBrokerConfigNotFound'
      |         ELSE '' END AS err,
      |    CAST(CASE WHEN cap IS NULL THEN NULL
      |         WHEN cap <= declared THEN cap - 128
      |         WHEN cap - 128 < declared THEN cap - 128
      |         ELSE declared END AS BIGINT) AS mmb,
      |    CAST(CASE WHEN cap IS NULL THEN NULL WHEN ex THEN 8
      |         ELSE 3 END AS BIGINT) AS partitions,
      |    CASE WHEN cap IS NULL THEN ''
      |         ELSE concat_ws(',',
      |           CASE WHEN cap <= declared THEN
      |             CASE WHEN ex THEN 'topic-cap-below-declared'
      |                  ELSE 'broker-cap-below-declared' END
      |           ELSE NULL END,
      |           CASE WHEN NOT ex THEN 'partition-num-defaulted'
      |                ELSE NULL END) END AS warnings
      |  FROM cap_rows
      |), part_rows AS (
      |  SELECT 'part' AS part,
      |    CASE WHEN p.ex = 1 THEN 'exists' ELSE 'absent' END AS kase,
      |    CAST(p.pn AS BIGINT) AS declared, CAST(1 AS BIGINT) AS acks
      |  FROM (VALUES (1,0),(1,4),(1,8),(1,16),(0,0),(0,5)) p(ex, pn)
      |), part_out AS (
      |  SELECT part, kase, declared, acks,
      |    CAST(CASE WHEN kase = 'exists' AND declared > 8 THEN 0
      |         ELSE 1 END AS INT) AS ok,
      |    CASE WHEN kase = 'exists' AND declared > 8
      |         THEN 'ErrKafkaInvalidPartitionNum' ELSE '' END AS err,
      |    CAST(CASE WHEN kase = 'exists' AND declared > 8 THEN NULL
      |         ELSE b.base END AS BIGINT) AS mmb,
      |    CAST(CASE WHEN kase = 'exists' AND declared > 8 THEN NULL
      |         WHEN declared = 0 THEN
      |           CASE WHEN kase = 'exists' THEN 8 ELSE 3 END
      |         ELSE declared END AS BIGINT) AS partitions,
      |    CASE WHEN kase = 'exists' AND declared > 8 THEN ''
      |         ELSE concat_ws(',',
      |           CASE WHEN kase = 'exists' THEN 'topic-already-exists'
      |                ELSE NULL END,
      |           CASE WHEN kase = 'exists' AND declared > 0 AND declared < 8
      |                  THEN 'partition-num-less-than-topic'
      |                WHEN kase = 'absent' AND declared = 0
      |                  THEN 'partition-num-defaulted'
      |                ELSE NULL END) END AS warnings
      |  FROM part_rows, b
      |), isr_rows AS (
      |  SELECT 'isr' AS part, s.kase, CAST(r.rf AS BIGINT) AS declared,
      |    CAST(a.ra AS BIGINT) AS acks
      |  FROM (VALUES ('topic'), ('brokerfb'), ('absent'), ('hidden')) s(kase),
      |       (VALUES (1), (2)) r(rf), (VALUES (-1), (1)) a(ra)
      |), isr_out AS (
      |  SELECT part, kase, declared, acks,
      |    CAST(CASE WHEN acks = -1 AND kase <> 'hidden' AND declared < 2
      |         THEN 0 ELSE 1 END AS INT) AS ok,
      |    CASE WHEN acks = -1 AND kase <> 'hidden' AND declared < 2
      |         THEN 'ErrKafkaInvalidConfig' ELSE '' END AS err,
      |    CAST(CASE WHEN acks = -1 AND kase <> 'hidden' AND declared < 2
      |         THEN NULL ELSE b.base END AS BIGINT) AS mmb,
      |    CAST(CASE WHEN acks = -1 AND kase <> 'hidden' AND declared < 2
      |         THEN NULL WHEN kase = 'absent' THEN 3
      |         ELSE 8 END AS BIGINT) AS partitions,
      |    CASE WHEN acks = -1 AND kase <> 'hidden' AND declared < 2 THEN ''
      |         ELSE concat_ws(',',
      |           CASE WHEN acks = -1 AND kase = 'hidden'
      |                THEN 'min-insync-replicas-not-found' ELSE NULL END,
      |           CASE WHEN kase = 'absent' THEN 'partition-num-defaulted'
      |                ELSE NULL END) END AS warnings
      |  FROM isr_rows, b
      |)
      |SELECT * FROM cap_out
      |UNION ALL SELECT * FROM part_out
      |UNION ALL SELECT * FROM isr_out""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    val base = Tables.load(spark, dir, "orders").count()
    def run(part: String, kase: String, declared: Long, acks: Long,
            o: Options, meta: TopicMeta)
        : (String, String, Long, Long, Int, String, Option[Long],
           Option[Long], String) =
      KafkaOptions.adjust(o, meta) match {
        case Left((err, _)) =>
          (part, kase, declared, acks, 0, err, None, None, "")
        case Right(Adjusted(o2, warns)) =>
          (part, kase, declared, acks, 1, "",
            Some(o2.maxMessageBytes.toLong), Some(o2.partitionNum.toLong),
            warns.mkString(","))
      }

    val capMetas = Seq(
      "topic_small" -> TopicMeta(exists = true, numPartitions = 8,
        topicMaxMessageBytes = Some((base / 2).toInt)),
      "topic_band" -> TopicMeta(exists = true, numPartitions = 8,
        topicMaxMessageBytes = Some((base + 64).toInt)),
      "topic_big" -> TopicMeta(exists = true, numPartitions = 8,
        topicMaxMessageBytes = Some((base * 4).toInt)),
      "fallback_small" -> TopicMeta(exists = true, numPartitions = 8,
        brokerMessageMaxBytes = Some((base / 2).toInt)),
      "absent_small" -> TopicMeta(exists = false,
        brokerMessageMaxBytes = Some((base / 2).toInt)),
      "absent_hidden" -> TopicMeta(exists = false))
    val capRows = for {
      (kase, meta) <- capMetas
      dv <- Seq(1L, 4L)
    } yield run("cap", kase, base / dv, 1L,
      Options(maxMessageBytes = (base / dv).toInt, requiredAcks = 1,
        autoCreate = false), meta)

    val partRows =
      (for (pn <- Seq(0L, 4L, 8L, 16L)) yield
        run("part", "exists", pn, 1L,
          Options(maxMessageBytes = base.toInt, partitionNum = pn.toInt,
            requiredAcks = 1, autoCreate = true),
          TopicMeta(exists = true, numPartitions = 8,
            topicMaxMessageBytes = Some((base * 4).toInt)))) ++
      (for (pn <- Seq(0L, 5L)) yield
        run("part", "absent", pn, 1L,
          Options(maxMessageBytes = base.toInt, partitionNum = pn.toInt,
            requiredAcks = 1, autoCreate = true),
          TopicMeta(exists = false,
            brokerMessageMaxBytes = Some((base * 4).toInt))))

    val isrMetas = Seq(
      "topic" -> TopicMeta(exists = true, numPartitions = 8,
        topicMaxMessageBytes = Some((base * 4).toInt),
        topicMinInsyncReplicas = Some(2)),
      "brokerfb" -> TopicMeta(exists = true, numPartitions = 8,
        topicMaxMessageBytes = Some((base * 4).toInt),
        brokerMinInsyncReplicas = Some(2)),
      "absent" -> TopicMeta(exists = false,
        brokerMessageMaxBytes = Some((base * 4).toInt),
        brokerMinInsyncReplicas = Some(2)),
      "hidden" -> TopicMeta(exists = true, numPartitions = 8,
        topicMaxMessageBytes = Some((base * 4).toInt)))
    val isrRows = for {
      (kase, meta) <- isrMetas
      rf <- Seq(1L, 2L)
      acks <- Seq(-1L, 1L)
    } yield run("isr", kase, rf, acks,
      Options(maxMessageBytes = base.toInt,
        replicationFactor = rf.toInt, requiredAcks = acks.toInt,
        autoCreate = false), meta)

    (capRows ++ partRows ++ isrRows)
      .toDF("part", "kase", "declared", "acks", "ok", "err", "mmb",
        "partitions", "warnings")
  }

  /**
   * q246 — the capture/processor inspection surface
   * ([[graft.streaming.Captures]], cdc/api/v2/capture.go:27-124,
   * processor.go:37-155) over a three-capture, three-changefeed cluster
   * whose table scopes derive from the cdc envelope (feed-a = all tables,
   * feed-b = db_0, feed-c = db_1 but stopped). Phases: the 3-capture
   * processor view (stopped feeds excluded, zero-table processors listed
   * empty — processor.go:113-115), the getProcessor validation chain
   * (invalid ids, abnormal state, unknown capture), the drain transition
   * matrix (unknown / owner / two successful drains with their
   * at-request-time table counts / re-drain of a gone capture / last
   * capture standing), and the post-drain single-capture view. The oracle
   * replays the hash-ring placement with the portable md5 twin.
   */
  val captureProcessors = GateQuery(
    "q246_capture_processors",
    Some {
      val h3 = Hashing.Sql.portableLong("t") + " % 3"
      val h2 = Hashing.Sql.portableLong("t") + " % 2"
      CdcStream.sqlCte +
        s""", tabs AS (
        |  SELECT DISTINCT schema_name || '.' || table_name AS t, schema_name
        |  FROM cdc
        |), scoped AS (
        |  SELECT 'feed-a' AS cf, t FROM tabs
        |  UNION ALL SELECT 'feed-b', t FROM tabs WHERE schema_name = 'db_0'
        |  UNION ALL SELECT 'feed-c', t FROM tabs WHERE schema_name = 'db_1'
        |), p3 AS (
        |  SELECT cf, t,
        |    (['capture-0','capture-1','capture-2'])[CAST($h3 AS INT) + 1] AS cap
        |  FROM scoped
        |), p2 AS (
        |  SELECT cf, t,
        |    (['capture-0','capture-1'])[CAST($h2 AS INT) + 1] AS cap
        |  FROM scoped
        |), proc3 AS (
        |  SELECT 'proc3' AS phase, 'proc' AS kase, f.cf AS changefeed,
        |    c.cap AS capture, 1 AS ok, '' AS err,
        |    CAST(coalesce(n.n, 0) AS BIGINT) AS n_tables,
        |    coalesce(n.ts, '') AS tables
        |  FROM (VALUES ('feed-a'), ('feed-b')) f(cf)
        |  CROSS JOIN
        |       (VALUES ('capture-0'), ('capture-1'), ('capture-2')) c(cap)
        |  LEFT JOIN (SELECT cf, cap, count(*) AS n,
        |               string_agg(t, ',' ORDER BY t) AS ts
        |             FROM p3 GROUP BY cf, cap) n
        |    ON n.cf = f.cf AND n.cap = c.cap
        |), detail AS (
        |  SELECT 'detail' AS phase, 'ok' AS kase, 'feed-a' AS changefeed,
        |    'capture-1' AS capture, 1 AS ok, '' AS err,
        |    CAST(count(*) AS BIGINT) AS n_tables,
        |    coalesce(string_agg(t, ',' ORDER BY t), '') AS tables
        |  FROM p3 WHERE cf = 'feed-a' AND cap = 'capture-1'
        |  UNION ALL SELECT 'detail', 'bad-cf', 'bad!id', 'capture-0', 0,
        |    'ErrAPIInvalidParam', NULL, ''
        |  UNION ALL SELECT 'detail', 'bad-cap', 'feed-a', 'cap!', 0,
        |    'ErrAPIInvalidParam', NULL, ''
        |  UNION ALL SELECT 'detail', 'stopped', 'feed-c', 'capture-1', 0,
        |    'ErrAPIInvalidParam', NULL, ''
        |  UNION ALL SELECT 'detail', 'no-cap', 'feed-a', 'capture-9', 0,
        |    'ErrCaptureNotExist', NULL, ''
        |), drains AS (
        |  SELECT 'drain' AS phase, 'unknown' AS kase, '' AS changefeed,
        |    'capture-9' AS capture, 0 AS ok, 'ErrCaptureNotExist' AS err,
        |    CAST(NULL AS BIGINT) AS n_tables, '' AS tables
        |  UNION ALL SELECT 'drain', 'owner', '', 'capture-0', 0,
        |    'ErrSchedulerRequestFailed', NULL, ''
        |  UNION ALL SELECT 'drain', 'ok2', '', 'capture-2', 1, '',
        |    (SELECT count(*) FROM p3 WHERE cap = 'capture-2'), ''
        |  UNION ALL SELECT 'drain', 'gone', '', 'capture-2', 0,
        |    'ErrCaptureNotExist', NULL, ''
        |  UNION ALL SELECT 'drain', 'ok1', '', 'capture-1', 1, '',
        |    (SELECT count(*) FROM p2 WHERE cap = 'capture-1'), ''
        |  UNION ALL SELECT 'drain', 'last', '', 'capture-0', 0,
        |    'ErrSchedulerRequestFailed', NULL, ''
        |), proc1 AS (
        |  SELECT 'proc1' AS phase, 'proc' AS kase, cf AS changefeed,
        |    'capture-0' AS capture, 1 AS ok, '' AS err,
        |    CAST(count(*) AS BIGINT) AS n_tables,
        |    string_agg(t, ',' ORDER BY t) AS tables
        |  FROM scoped WHERE cf <> 'feed-c' GROUP BY cf
        |)
        |SELECT * FROM proc3 UNION ALL SELECT * FROM detail
        |UNION ALL SELECT * FROM drains UNION ALL SELECT * FROM proc1""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val tabs = CdcStream.derive(spark, dir)
      .select(concat_ws(".", col("schema_name"), col("table_name")).as("t"),
        col("schema_name"))
      .distinct().collect() // ≤8 rows — control-plane
      .map(r => (r.getString(0), r.getString(1)))
    val registry = new CaptureRegistry("cluster-1", Seq(
      CaptureInfo("capture-0", "10.0.0.1:8300"),
      CaptureInfo("capture-1", "10.0.0.2:8300"),
      CaptureInfo("capture-2", "10.0.0.3:8300")))
    registry.setScope("feed-a", "default", tabs.map(_._1).toSeq)
    registry.setScope("feed-b", "default",
      tabs.filter(_._2 == "db_0").map(_._1).toSeq)
    registry.setScope("feed-c", "default",
      tabs.filter(_._2 == "db_1").map(_._1).toSeq)
    val state = Map("feed-a" -> "normal", "feed-b" -> "normal",
      "feed-c" -> "stopped").withDefaultValue("not-found")

    type R8 = (String, String, String, String, Int, String, Option[Long],
      String)
    def procRows(phase: String): Seq[R8] =
      registry.listProcessors(state(_) == "normal").map { p =>
        val cf = p("changefeed_id").toString
        val cap = p("capture_id").toString
        val ts = registry.tablesOn(cf, cap)
        (phase, "proc", cf, cap, 1, "", Some(ts.size.toLong),
          ts.mkString(","))
      }
    def detailRow(kase: String, cf: String, cap: String): R8 =
      registry.getProcessor(cf, cap, state) match {
        case Left((err, _)) => ("detail", kase, cf, cap, 0, err, None, "")
        case Right(ts) => ("detail", kase, cf, cap, 1, "",
          Some(ts.size.toLong), ts.mkString(","))
      }
    def drainRow(kase: String, cap: String): R8 =
      registry.drain(cap) match {
        case Left((err, _)) => ("drain", kase, "", cap, 0, err, None, "")
        case Right(n) => ("drain", kase, "", cap, 1, "", Some(n.toLong), "")
      }

    val rows: Seq[(String, String, String, String, Int, String,
      Option[Long], String)] =
      procRows("proc3") ++
      Seq(detailRow("ok", "feed-a", "capture-1"),
        detailRow("bad-cf", "bad!id", "capture-0"),
        detailRow("bad-cap", "feed-a", "cap!"),
        detailRow("stopped", "feed-c", "capture-1"),
        detailRow("no-cap", "feed-a", "capture-9")) ++
      Seq(drainRow("unknown", "capture-9"),
        drainRow("owner", "capture-0"),
        drainRow("ok2", "capture-2"),
        // re-drain of a gone capture while two remain alive: the alive
        // list no longer contains it → ErrCaptureNotExist (the ≤1-alive
        // guard fires FIRST in the reference, so this only reproduces
        // with ≥2 still alive — capture.go:38-58)
        drainRow("gone", "capture-2"),
        drainRow("ok1", "capture-1"),
        drainRow("last", "capture-0")) ++
      procRows("proc1")
    rows.toDF("phase", "kase", "changefeed", "capture", "ok", "err",
      "n_tables", "tables")
  }

  /**
   * q248 — the MySQL sink option surface ([[graft.streaming.MySqlOptions]],
   * pkg/sink/mysql/config.go:152-498). One row per rule case, the clamp
   * families anchored in `count(orders)` so both sides derive the same
   * overshoot value:
   *
   *  - `num`: the four numeric rules × {error leg, in-range keep, clamp}
   *    including the asymmetry — `max-multi-update-row-size=0` is LEGAL
   *    ("never multi-update") where the other three reject 0.
   *  - `mode`: tidb-txn-mode case-fold / bogus-warns-keeps-default (never
   *    an error).
   *  - `tz`: unset adopts the server zone quoted (warn), empty defers to
   *    the downstream (warn), match passes, `local` aliases the server
   *    zone, mismatch and unparseable are hard errors.
   *  - `dur`: Go-duration validated, stored as the original string.
   *  - `merge`: file block fills, URI overrides per-field.
   *  - `scheme`: only mysql/mysql+ssl/tidb/tidb+ssl create the sink.
   */
  val mysqlAdjust = GateQuery(
    "q248_mysql_adjust",
    Some("""WITH b AS (SELECT CAST(count(*) AS BIGINT) AS base FROM orders),
      |rows_ AS (SELECT * FROM (VALUES
      |  ('num','wc_zero'),('num','wc_keep'),('num','wc_clamp'),
      |  ('num','txn_zero'),('num','txn_keep'),('num','txn_clamp'),
      |  ('num','muc_zero'),('num','muc_keep'),('num','muc_clamp'),
      |  ('num','mus_neg'),('num','mus_zero'),('num','mus_clamp'),
      |  ('mode','mode_pess'),('mode','mode_fold'),('mode','mode_bogus'),
      |  ('tz','tz_unset'),('tz','tz_empty'),('tz','tz_match'),
      |  ('tz','tz_local'),('tz','tz_mismatch'),('tz','tz_bogus'),
      |  ('dur','dur_ok'),('dur','dur_bogus'),
      |  ('merge','merge_override'),('merge','merge_fill'),
      |  ('scheme','scheme_tidb'),('scheme','scheme_bad')) v(family, kase))
      |SELECT family, kase,
      |  CAST(CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |    'tz_mismatch','tz_bogus','dur_bogus','scheme_bad')
      |    THEN 0 ELSE 1 END AS INT) AS ok,
      |  CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |    'tz_mismatch','tz_bogus','dur_bogus','scheme_bad')
      |    THEN 'ErrMySQLInvalidConfig' ELSE '' END AS err,
      |  CAST(CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |      'tz_mismatch','tz_bogus','dur_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'wc_keep' THEN 8
      |    WHEN kase = 'wc_clamp' THEN LEAST(b.base, 1024)
      |    WHEN kase = 'merge_fill' THEN 99
      |    ELSE 16 END AS BIGINT) AS worker_count,
      |  CAST(CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |      'tz_mismatch','tz_bogus','dur_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'txn_keep' THEN 100
      |    WHEN kase = 'txn_clamp' THEN LEAST(b.base, 2048)
      |    WHEN kase = 'merge_override' THEN 9
      |    ELSE 256 END AS BIGINT) AS max_txn_row,
      |  CAST(CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |      'tz_mismatch','tz_bogus','dur_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'muc_keep' THEN 100
      |    WHEN kase = 'muc_clamp' THEN LEAST(b.base, 256)
      |    ELSE 40 END AS BIGINT) AS mu_count,
      |  CAST(CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |      'tz_mismatch','tz_bogus','dur_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'mus_zero' THEN 0
      |    WHEN kase = 'mus_clamp' THEN LEAST(b.base, 8192)
      |    ELSE 1024 END AS BIGINT) AS mu_size,
      |  CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |      'tz_mismatch','tz_bogus','dur_bogus','scheme_bad') THEN ''
      |    WHEN kase IN ('mode_pess','mode_fold') THEN 'pessimistic'
      |    ELSE 'optimistic' END AS txn_mode,
      |  CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |      'tz_mismatch','tz_bogus','dur_bogus','scheme_bad') THEN ''
      |    WHEN kase = 'tz_empty' THEN ''
      |    ELSE '"UTC"' END AS timezone,
      |  CASE WHEN kase IN ('wc_zero','txn_zero','muc_zero','mus_neg',
      |      'tz_mismatch','tz_bogus','dur_bogus','scheme_bad') THEN ''
      |    WHEN kase = 'dur_ok' THEN '1m30s'
      |    ELSE '2m' END AS read_timeout,
      |  CAST(CASE WHEN kase = 'merge_override' THEN 1 ELSE 0 END AS INT)
      |    AS safe_mode,
      |  -- cap warnings fire only when the data-derived input EXCEEDS the
      |  -- cap (at small scale count(orders) can sit under a cap)
      |  CASE WHEN kase = 'wc_clamp' AND b.base > 1024
      |      THEN 'worker-count-capped'
      |    WHEN kase = 'txn_clamp' AND b.base > 2048
      |      THEN 'max-txn-row-capped'
      |    WHEN kase = 'muc_clamp' AND b.base > 256
      |      THEN 'max-multi-update-row-capped'
      |    WHEN kase = 'mus_clamp' AND b.base > 8192
      |      THEN 'max-multi-update-row-size-capped'
      |    WHEN kase = 'mode_bogus' THEN 'invalid-tidb-txn-mode'
      |    WHEN kase = 'tz_unset' THEN 'time-zone-not-specified'
      |    WHEN kase = 'tz_empty' THEN 'time-zone-empty-use-downstream'
      |    ELSE '' END AS warnings
      |FROM rows_, b""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.{MySqlOptions => MO}
    val base = Tables.load(spark, dir, "orders").count()
    val utc = Map("time-zone" -> "UTC")

    def run(family: String, kase: String,
            res: Either[(String, String), MO.Adjusted])
        : (String, String, Int, String, Option[Long], Option[Long],
           Option[Long], Option[Long], String, String, String, Int, String) =
      res match {
        case Left((err, _)) =>
          (family, kase, 0, err, None, None, None, None, "", "", "", 0, "")
        case Right(MO.Adjusted(o, warns)) =>
          (family, kase, 1, "", Some(o.workerCount.toLong),
            Some(o.maxTxnRow.toLong), Some(o.maxMultiUpdateRowCount.toLong),
            Some(o.maxMultiUpdateRowSize.toLong), o.tidbTxnMode, o.timezone,
            o.readTimeout, if (o.safeMode) 1 else 0, warns.mkString(","))
      }
    def one(family: String, kase: String, params: (String, String)*) =
      run(family, kase, MO("UTC", Map.empty, utc ++ params))

    val rows = Seq(
      one("num", "wc_zero", "worker-count" -> "0"),
      one("num", "wc_keep", "worker-count" -> "8"),
      one("num", "wc_clamp", "worker-count" -> base.toString),
      one("num", "txn_zero", "max-txn-row" -> "0"),
      one("num", "txn_keep", "max-txn-row" -> "100"),
      one("num", "txn_clamp", "max-txn-row" -> base.toString),
      one("num", "muc_zero", "max-multi-update-row" -> "0"),
      one("num", "muc_keep", "max-multi-update-row" -> "100"),
      one("num", "muc_clamp", "max-multi-update-row" -> base.toString),
      one("num", "mus_neg", "max-multi-update-row-size" -> "-1"),
      one("num", "mus_zero", "max-multi-update-row-size" -> "0"),
      one("num", "mus_clamp", "max-multi-update-row-size" -> base.toString),
      one("mode", "mode_pess", "tidb-txn-mode" -> "pessimistic"),
      one("mode", "mode_fold", "tidb-txn-mode" -> "PESSIMISTIC"),
      one("mode", "mode_bogus", "tidb-txn-mode" -> "serializable"),
      run("tz", "tz_unset", MO("UTC", Map.empty, Map.empty)),
      run("tz", "tz_empty", MO("UTC", Map.empty, Map("time-zone" -> ""))),
      one("tz", "tz_match"),
      run("tz", "tz_local", MO("UTC", Map.empty, Map("time-zone" -> "local"))),
      run("tz", "tz_mismatch",
        MO("UTC", Map.empty, Map("time-zone" -> "America/New_York"))),
      run("tz", "tz_bogus", MO("UTC", Map.empty, Map("time-zone" -> "Not/AZone"))),
      one("dur", "dur_ok", "read-timeout" -> "1m30s"),
      one("dur", "dur_bogus", "read-timeout" -> "1m30x"),
      run("merge", "merge_override", MO("UTC",
        Map("max-txn-row" -> "1000", "safe-mode" -> "true"),
        utc + ("max-txn-row" -> "9"))),
      run("merge", "merge_fill",
        MO("UTC", Map("worker-count" -> "99"), utc)),
      run("scheme", "scheme_tidb",
        MO.fromUri("tidb+ssl://h:4000/?time-zone=UTC", "UTC")),
      run("scheme", "scheme_bad", MO.fromUri("kafka://h:9092/t", "UTC")))

    rows.toDF("family", "kase", "ok", "err", "worker_count", "max_txn_row",
      "mu_count", "mu_size", "txn_mode", "timezone", "read_timeout",
      "safe_mode", "warnings")
  }

  /**
   * q249 — the storage sink option surface
   * ([[graft.streaming.StorageOptions]], pkg/sink/cloudstorage/
   * config.go:34-235). The matrix pins the three repair semantics living
   * side by side: `worker-count` errors at ≤0 and clamps above 512;
   * `flush-interval` hard-errors only on an unparseable duration and
   * clamps into [2s,10m]; `file-size` has NO error leg — 0 clamps UP to
   * 1 MiB; `file-index-width`/`flush-concurrency` out of range silently
   * reset to their defaults (20/1) with no warning at all.
   */
  val storageAdjust = GateQuery(
    "q249_storage_adjust",
    Some("""WITH b AS (SELECT CAST(count(*) AS BIGINT) AS base FROM orders),
      |rows_ AS (SELECT * FROM (VALUES
      |  ('wc','wc_zero'),('wc','wc_keep'),('wc','wc_clamp'),
      |  ('fi','fi_empty'),('fi','fi_raise'),('fi','fi_keep'),
      |  ('fi','fi_cap'),('fi','fi_bogus'),
      |  ('fs','fs_zero'),('fs','fs_keep'),('fs','fs_cap'),
      |  ('wd','wd_unset'),('wd','wd_keep'),('wd','wd_high'),('wd','wd_low'),
      |  ('merge','merge_override'),('merge','merge_fill'),
      |  ('scheme','scheme_s3'),('scheme','scheme_bad')) v(family, kase))
      |SELECT family, kase,
      |  CAST(CASE WHEN kase IN ('wc_zero','fi_bogus','scheme_bad')
      |    THEN 0 ELSE 1 END AS INT) AS ok,
      |  CASE WHEN kase IN ('wc_zero','fi_bogus','scheme_bad')
      |    THEN 'ErrStorageSinkInvalidConfig' ELSE '' END AS err,
      |  CAST(CASE WHEN kase IN ('wc_zero','fi_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'wc_keep' THEN 8
      |    WHEN kase = 'wc_clamp' THEN LEAST(b.base, 512)
      |    WHEN kase = 'merge_override' THEN 7
      |    ELSE 16 END AS BIGINT) AS worker_count,
      |  CAST(CASE WHEN kase IN ('wc_zero','fi_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'fi_raise' THEN 2000
      |    WHEN kase = 'fi_keep' THEN 30000
      |    WHEN kase = 'fi_cap' THEN 600000
      |    ELSE 5000 END AS BIGINT) AS flush_ms,
      |  CAST(CASE WHEN kase IN ('wc_zero','fi_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'fs_zero' THEN 1048576
      |    WHEN kase = 'fs_keep' THEN 33554432
      |    WHEN kase = 'fs_cap' THEN 536870912
      |    WHEN kase = 'merge_fill' THEN 2097152
      |    ELSE 67108864 END AS BIGINT) AS file_size,
      |  CAST(CASE WHEN kase IN ('wc_zero','fi_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'wd_keep' THEN 8
      |    ELSE 20 END AS BIGINT) AS index_width,
      |  CAST(CASE WHEN kase IN ('wc_zero','fi_bogus','scheme_bad') THEN NULL
      |    WHEN kase = 'wd_keep' THEN 4
      |    ELSE 1 END AS BIGINT) AS flush_conc,
      |  CASE WHEN kase = 'wc_clamp' THEN 'worker-count-capped'
      |    WHEN kase = 'fi_raise' THEN 'flush-interval-raised'
      |    WHEN kase = 'fi_cap' THEN 'flush-interval-capped'
      |    WHEN kase = 'fs_zero' THEN 'file-size-raised'
      |    WHEN kase = 'fs_cap' THEN 'file-size-capped'
      |    ELSE '' END AS warnings
      |FROM rows_, b""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.{StorageOptions => SO}
    val base = Tables.load(spark, dir, "orders").count()

    def run(family: String, kase: String,
            res: Either[(String, String), SO.Adjusted])
        : (String, String, Int, String, Option[Long], Option[Long],
           Option[Long], Option[Long], Option[Long], String) =
      res match {
        case Left((err, _)) =>
          (family, kase, 0, err, None, None, None, None, None, "")
        case Right(SO.Adjusted(o, warns)) =>
          (family, kase, 1, "", Some(o.workerCount.toLong),
            Some(o.flushIntervalMs), Some(o.fileSize.toLong),
            Some(o.fileIndexWidth.toLong), Some(o.flushConcurrency.toLong),
            warns.mkString(","))
      }
    def one(family: String, kase: String, params: (String, String)*) =
      run(family, kase, SO(Map.empty, params.toMap))

    val rows = Seq(
      one("wc", "wc_zero", "worker-count" -> "0"),
      one("wc", "wc_keep", "worker-count" -> "8"),
      one("wc", "wc_clamp", "worker-count" -> base.toString),
      one("fi", "fi_empty", "flush-interval" -> ""),
      one("fi", "fi_raise", "flush-interval" -> "1s"),
      one("fi", "fi_keep", "flush-interval" -> "30s"),
      one("fi", "fi_cap", "flush-interval" -> "20m"),
      one("fi", "fi_bogus", "flush-interval" -> "fast"),
      one("fs", "fs_zero", "file-size" -> "0"),
      one("fs", "fs_keep", "file-size" -> "33554432"),
      one("fs", "fs_cap", "file-size" -> "629145600"),
      run("wd", "wd_unset", SO(Map.empty, Map.empty)),
      run("wd", "wd_keep", SO(Map.empty, Map.empty,
        fileIndexWidth = Some(8), flushConcurrency = Some(4))),
      run("wd", "wd_high", SO(Map.empty, Map.empty,
        fileIndexWidth = Some(25), flushConcurrency = Some(513))),
      run("wd", "wd_low", SO(Map.empty, Map.empty,
        fileIndexWidth = Some(3), flushConcurrency = Some(0))),
      run("merge", "merge_override",
        SO(Map("worker-count" -> "100"), Map("worker-count" -> "7"))),
      run("merge", "merge_fill",
        SO(Map("file-size" -> "2097152"), Map.empty)),
      run("scheme", "scheme_s3",
        SO.fromUri("s3://bucket/prefix?worker-count=16")),
      run("scheme", "scheme_bad", SO.fromUri("mysql://h:3306/")))

    rows.toDF("family", "kase", "ok", "err", "worker_count", "flush_ms",
      "file_size", "index_width", "flush_conc", "warnings")
  }

  /**
   * q250 — the Pulsar sink option surface
   * ([[graft.streaming.PulsarOptions]], pkg/sink/pulsar/config.go:41-129):
   * URI sanity order (empty host fires before the scheme gate), the
   * four-scheme gate, broker-URL derivation with the `pulsar+http(s)` →
   * `http(s)` downgrade, and nil-coalescing default fill of the five
   * producer knobs from the config block.
   */
  val pulsarAdjust = GateQuery(
    "q250_pulsar_adjust",
    Some("""SELECT * FROM (VALUES
      |  ('plain',    1, '', 'pulsar://b1:6650',  'tpc', 5, 30, 1000, 10, 30),
      |  ('ssl',      1, '', 'pulsar+ssl://b1:6651', 'tpc', 5, 30, 1000, 10, 30),
      |  ('http',     1, '', 'http://b1:8080',    'tpc', 5, 30, 1000, 10, 30),
      |  ('https',    1, '', 'https://b1:8443',   'tpc', 5, 30, 1000, 10, 30),
      |  ('cfgfill',  1, '', 'pulsar://b1:6650',  'tpc', 9, 30, 500, 10, 30),
      |  ('deeppath', 1, '', 'pulsar://b1:6650',  'tenant/ns/tpc', 5, 30, 1000, 10, 30),
      |  ('nohost',   0, 'host is empty', '', '', NULL, NULL, NULL, NULL, NULL),
      |  ('nopath',   0, 'path is empty', '', '', NULL, NULL, NULL, NULL, NULL),
      |  ('badscheme',0, 'invalid pulsar scheme kafka', '', '', NULL, NULL, NULL, NULL, NULL)
      |) v(kase, ok, err, broker_url, topic, conn_s, op_s, batch_max,
      |    delay_ms, send_s)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.{PulsarOptions => PO}
    def run(kase: String, uri: String, cfg: Map[String, Int] = Map.empty)
        : (String, Int, String, String, String, Option[Int], Option[Int],
           Option[Int], Option[Int], Option[Int]) =
      PO.fromUri(uri, cfg) match {
        case Left(e) => (kase, 0, e, "", "", None, None, None, None, None)
        case Right(o) => (kase, 1, "", o.brokerUrl, o.topic,
          Some(o.connectionTimeoutSec), Some(o.operationTimeoutSec),
          Some(o.batchingMaxMessages), Some(o.batchingMaxPublishDelayMs),
          Some(o.sendTimeoutSec))
      }
    Seq(
      run("plain", "pulsar://b1:6650/tpc"),
      run("ssl", "pulsar+ssl://b1:6651/tpc"),
      run("http", "pulsar+http://b1:8080/tpc"),
      run("https", "pulsar+https://b1:8443/tpc"),
      run("cfgfill", "pulsar://b1:6650/tpc",
        Map("connection-timeout" -> 9, "batching-max-messages" -> 500)),
      run("deeppath", "pulsar://b1:6650/tenant/ns/tpc"),
      run("nohost", "pulsar:///tpc"),
      run("nopath", "pulsar://b1:6650"),
      run("badscheme", "kafka://b1:9092/tpc"))
      .toDF("kase", "ok", "err", "broker_url", "topic", "conn_s", "op_s",
        "batch_max", "delay_ms", "send_s")
  }

  /**
   * q251 — the changefeed config validation ROOT
   * ([[graft.streaming.ReplicaValidate]],
   * pkg/config/replica_config.go:245-328 + sink.go:706-905 +
   * consistent.go:75-121): the composition every `changefeed create`
   * runs. The matrix drives one rule per row: URI-wins protocol
   * reconciliation (conflict warns, never errors at create), atomicity ×
   * scheme, protocol required on MQ/forbidden on MySQL, CSV quote/
   * delimiter legs, redo default-fill and floors, sync-point bounds
   * gated on the enable flag, memory-quota fill, the integrity non-Kafka
   * downgrade vs the Kafka column-selector error, error-stuck floor, and
   * dispatcher→partition migration.
   */
  val replicaValidate = GateQuery(
    "q251_replica_validate",
    Some("""SELECT * FROM (VALUES
      |  ('uri','uri_wins',     1,'','open-protocol','',1,'incompatible-sink-config'),
      |  ('uri','uri_fill',     1,'','canal-json','',1,''),
      |  ('uri','atom_table_mq',0,'ErrSinkURIInvalid','','',0,''),
      |  ('uri','atom_table_my',1,'','','table',0,''),
      |  ('uri','atom_bogus',   0,'ErrSinkURIInvalid','','',0,''),
      |  ('uri','mysql_proto',  0,'ErrSinkURIInvalid','','',0,''),
      |  ('uri','unknown_proto',0,'ErrSinkUnknownProtocol','','',0,''),
      |  ('uri','raw_no_old',   1,'','open-protocol','',1,'raw-change-event-without-old-value'),
      |  ('sink','enc_neg',     0,'ErrSinkInvalidConfig','','',0,''),
      |  ('sink','csv_del_hk',  0,'ErrSinkInvalidConfig','','',0,''),
      |  ('sink','date_bad',    0,'ErrSinkInvalidConfig','','',0,''),
      |  ('csv','quote_two',    0,'ErrSinkInvalidConfig','','',0,''),
      |  ('csv','quote_lf',     0,'ErrSinkInvalidConfig','','',0,''),
      |  ('csv','delim_empty',  0,'ErrSinkInvalidConfig','','',0,''),
      |  ('csv','delim_four',   0,'ErrSinkInvalidConfig','','',0,''),
      |  ('csv','common_char',  0,'ErrSinkInvalidConfig','','',0,''),
      |  ('csv','bin_bogus',    0,'ErrSinkInvalidConfig','','',0,''),
      |  ('redo','flush_low',   0,'ErrInvalidReplicaConfig','','',0,''),
      |  ('redo','meta_low',    0,'ErrInvalidReplicaConfig','','',0,''),
      |  ('redo','comp_bad',    0,'ErrInvalidReplicaConfig','','',0,''),
      |  ('redo','storage_bad', 0,'ErrConsistentStorage','','',0,''),
      |  ('cf','sync_int_low',  0,'ErrInvalidReplicaConfig','','',0,''),
      |  ('cf','sync_ret_low',  0,'ErrInvalidReplicaConfig','','',0,''),
      |  ('cf','sync_off_low',  1,'','open-protocol','',1,''),
      |  ('cf','integrity_cols',0,'ErrInvalidReplicaConfig','','',0,''),
      |  ('cf','stuck_low',     0,'ErrInvalidReplicaConfig','','',0,''),
      |  ('cf','disp_both',     0,'ErrSinkInvalidConfig','','',0,'')
      |) v(family, kase, ok, err, protocol, atomicity, term_crlf, warnings)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.{StorageOptions, ReplicaValidate => RV}
    import RV.{ReplicaConfig => RC}

    def run(family: String, kase: String, scheme: String,
            uriParams: Map[String, String], cfg: RC)
        : (String, String, Int, String, String, String, Int, String) =
      RV.validateAndAdjust(scheme, uriParams, cfg) match {
        case Left((err, _)) => (family, kase, 0, err, "", "", 0, "")
        case Right(RV.Validated(c, warns)) =>
          val proto =
            if (RV.isMqScheme(scheme) || StorageOptions.isStorageScheme(scheme))
              RV.parseProtocol(c.protocol).toOption.getOrElse("")
            else c.protocol
          (family, kase, 1, "", proto, c.txnAtomicity,
            if (c.terminator.contains(RV.CRLF)) 1 else 0,
            warns.mkString(","))
      }

    // advance-timeout pre-set so its default-fill warn doesn't ride every
    // non-mysql row — the fill itself is covered by ReplicaValidateSpec
    val B = RC(advanceTimeoutSec = 150)
    val rows = Seq(
      run("uri", "uri_wins", "kafka", Map("protocol" -> "open-protocol"),
        B.copy(protocol = "canal")),
      run("uri", "uri_fill", "kafka", Map("protocol" -> "canal-json"), B),
      run("uri", "atom_table_mq", "kafka",
        Map("protocol" -> "open-protocol", "transaction-atomicity" -> "table"),
        B),
      run("uri", "atom_table_my", "mysql",
        Map("transaction-atomicity" -> "table"), B),
      run("uri", "atom_bogus", "mysql",
        Map("transaction-atomicity" -> "global"), B),
      run("uri", "mysql_proto", "mysql", Map("protocol" -> "canal-json"), B),
      run("uri", "unknown_proto", "kafka", Map("protocol" -> "protobuf"), B),
      run("uri", "raw_no_old", "kafka", Map("protocol" -> "default"),
        B.copy(outputRawChangeEvent = true)),
      run("sink", "enc_neg", "kafka", Map("protocol" -> "simple"),
        B.copy(encoderConcurrency = -1)),
      run("sink", "csv_del_hk", "s3", Map("protocol" -> "csv"),
        B.copy(deleteOnlyOutputHandleKeyColumns = true)),
      run("sink", "date_bad", "s3", Map("protocol" -> "csv"),
        B.copy(dateSeparator = "week")),
      run("csv", "quote_two", "s3", Map("protocol" -> "csv"),
        B.copy(csv = RV.CsvConfig(quote = "''"))),
      run("csv", "quote_lf", "s3", Map("protocol" -> "csv"),
        B.copy(csv = RV.CsvConfig(quote = "\n"))),
      run("csv", "delim_empty", "s3", Map("protocol" -> "csv"),
        B.copy(csv = RV.CsvConfig(delimiter = ""))),
      run("csv", "delim_four", "s3", Map("protocol" -> "csv"),
        B.copy(csv = RV.CsvConfig(delimiter = "||||"))),
      run("csv", "common_char", "s3", Map("protocol" -> "csv"),
        B.copy(csv = RV.CsvConfig(quote = "|", delimiter = "|,"))),
      run("csv", "bin_bogus", "s3", Map("protocol" -> "csv"),
        B.copy(csv = RV.CsvConfig(binaryEncodingMethod = "utf8"))),
      run("redo", "flush_low", "mysql", Map.empty,
        B.copy(consistent = RV.ConsistentConfig(level = "eventual",
          flushIntervalMs = 10))),
      run("redo", "meta_low", "mysql", Map.empty,
        B.copy(consistent = RV.ConsistentConfig(level = "eventual",
          metaFlushIntervalMs = 10))),
      run("redo", "comp_bad", "mysql", Map.empty,
        B.copy(consistent = RV.ConsistentConfig(level = "eventual",
          compression = "zstd"))),
      run("redo", "storage_bad", "mysql", Map.empty,
        B.copy(consistent = RV.ConsistentConfig(level = "eventual",
          storage = "hdfs://nn/redo"))),
      run("cf", "sync_int_low", "kafka", Map("protocol" -> "simple"),
        B.copy(enableSyncPoint = true, syncPointIntervalSec = Some(10))),
      run("cf", "sync_ret_low", "kafka", Map("protocol" -> "simple"),
        B.copy(enableSyncPoint = true, syncPointRetentionSec = Some(600))),
      run("cf", "sync_off_low", "kafka", Map("protocol" -> "default"),
        B.copy(enableSyncPoint = false, syncPointIntervalSec = Some(10))),
      run("cf", "integrity_cols", "kafka", Map("protocol" -> "simple"),
        B.copy(integrityCheckLevel = "correctness",
          columnSelectors = Seq("t1.*"))),
      run("cf", "stuck_low", "mysql", Map.empty,
        B.copy(errorStuckDurationSec = Some(60))),
      run("cf", "disp_both", "kafka", Map("protocol" -> "simple"),
        B.copy(dispatchRules = Seq(RV.DispatchRule("t.*", "index-value", "ts")))))

    rows.toDF("family", "kase", "ok", "err", "protocol", "atomicity",
      "term_crlf", "warnings")
  }

  def all: Seq[GateQuery] =
    Seq(kafkaAdjust, captureProcessors, mysqlAdjust, storageAdjust,
      pulsarAdjust, replicaValidate)
}
