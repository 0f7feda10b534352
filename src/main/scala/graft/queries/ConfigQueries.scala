package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.KafkaOptions
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

  def all: Seq[GateQuery] = Seq(kafkaAdjust)
}
