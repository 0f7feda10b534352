package graft.queries

import org.apache.spark.sql.functions._
import graft.core.CdcStream
import graft.operators.Codecs

/** Typed envelope row for the Craft batch round-trip (top-level so Spark
  * can derive its Encoder). */
final case class CraftEnvRow(op: String, commit_ts: Long, schema_name: String,
                             table_name: String, pk: Long,
                             val_before: Option[Double],
                             val_after: Option[Double], etype: String)

/**
 * Gate queries for the wire-format codecs (SURVEY.md §2.7). Each emits the
 * encoded message string for a deterministic sample of the CDC stream; the
 * oracle constructs the byte-identical string in DuckDB (`to_json` of
 * `struct_pack` mirrors Spark's `to_json(struct(...))`: insertion-ordered
 * keys, no whitespace, explicit nulls, shortest-round-trip doubles).
 */
object CodecQueries {

  private val cte = CdcStream.sqlCte
  // Sample to keep gate outputs small; encoders themselves are full-stream.
  private val SampleE = "seq % 37 = 0"
  private val imgNullSql = "CAST(NULL AS STRUCT(pk BIGINT, val DOUBLE, etype VARCHAR)[])"
  private def imgSql(valE: String) =
    s"[struct_pack(pk := pk, val := CAST($valE AS DOUBLE), etype := etype)]"

  val canal = GateQuery(
    "q40_canal_json",
    Some(cte +
      s"""SELECT seq, to_json(struct_pack(
         |  id := CAST(0 AS BIGINT),
         |  "database" := schema_name,
         |  "table" := table_name,
         |  pkNames := ['pk'],
         |  isDdl := false,
         |  type := CASE op WHEN 'I' THEN 'INSERT' WHEN 'U' THEN 'UPDATE' ELSE 'DELETE' END,
         |  es := commit_ts,
         |  ts := commit_ts,
         |  sql := '',
         |  sqlType := struct_pack(pk := -5, val := 8, etype := 12),
         |  mysqlType := struct_pack(pk := 'bigint', val := 'double', etype := 'varchar'),
         |  data := CASE WHEN op = 'D' THEN ${imgSql("val_before")}
         |               ELSE ${imgSql("val_after")} END,
         |  old := CASE WHEN op = 'U' THEN ${imgSql("val_before")}
         |              ELSE $imgNullSql END
         |)) AS msg
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"), Codecs.canalJson(df).as("msg"))
  }

  private val imgNullStructSql = "CAST(NULL AS STRUCT(pk BIGINT, val DOUBLE, etype VARCHAR))"
  private def imgStructSql(valE: String) =
    s"struct_pack(pk := pk, val := CAST($valE AS DOUBLE), etype := etype)"

  val debezium = GateQuery(
    "q41_debezium",
    Some(cte +
      s"""SELECT seq, to_json(struct_pack(
         |  before := CASE WHEN op <> 'I' THEN ${imgStructSql("val_before")}
         |                 ELSE $imgNullStructSql END,
         |  after := CASE WHEN op <> 'D' THEN ${imgStructSql("val_after")}
         |                ELSE $imgNullStructSql END,
         |  source := struct_pack(name := 'graft', ts_ms := commit_ts,
         |                        db := schema_name, "table" := table_name),
         |  op := CASE op WHEN 'I' THEN 'c' WHEN 'U' THEN 'u' ELSE 'd' END,
         |  ts_ms := commit_ts
         |)) AS msg
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"), Codecs.debezium(df).as("msg"))
  }

  val maxwell = GateQuery(
    "q42_maxwell",
    Some(cte +
      s"""SELECT seq, to_json(struct_pack(
         |  "database" := schema_name,
         |  "table" := table_name,
         |  type := CASE op WHEN 'I' THEN 'insert' WHEN 'U' THEN 'update' ELSE 'delete' END,
         |  ts := commit_ts,
         |  xid := start_ts,
         |  data := CASE WHEN op = 'D' THEN ${imgStructSql("val_before")}
         |               ELSE ${imgStructSql("val_after")} END,
         |  old := CASE WHEN op = 'U' THEN ${imgStructSql("val_before")}
         |              ELSE $imgNullStructSql END
         |)) AS msg
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"), Codecs.maxwell(df).as("msg"))
  }

  private val opImgNullSql =
    "CAST(NULL AS STRUCT(pk STRUCT(t INT, v BIGINT), val STRUCT(t INT, v DOUBLE), etype STRUCT(t INT, v VARCHAR)))"
  private def opImgSql(valE: String) =
    s"""struct_pack(
       |  pk := struct_pack(t := 8, v := pk),
       |  val := struct_pack(t := 5, v := CAST($valE AS DOUBLE)),
       |  etype := struct_pack(t := 15, v := etype))""".stripMargin

  val openProtocol = GateQuery(
    "q43_open_protocol",
    Some(cte +
      s"""SELECT seq,
         |  to_json(struct_pack(ts := commit_ts, scm := schema_name,
         |                      tbl := table_name, t := 1)) AS msg_key,
         |  to_json(struct_pack(
         |    u := CASE WHEN op <> 'D' THEN ${opImgSql("val_after")} ELSE $opImgNullSql END,
         |    d := CASE WHEN op = 'D' THEN ${opImgSql("val_before")} ELSE $opImgNullSql END
         |  )) AS msg_value
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"),
      Codecs.openProtocolKey(df).as("msg_key"),
      Codecs.openProtocolValue(df).as("msg_value"))
  }

  val csv = GateQuery(
    "q44_csv",
    Some(cte +
      s"""SELECT seq,
         |  concat_ws(',',
         |    '"' || op || '"',
         |    '"' || schema_name || '"',
         |    '"' || table_name || '"',
         |    CAST(commit_ts AS VARCHAR),
         |    CAST(pk AS VARCHAR),
         |    coalesce(CAST(CASE WHEN op = 'D' THEN val_before ELSE val_after END AS VARCHAR), '\\N'),
         |    '"' || etype || '"') AS line
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"), Codecs.csvLine(df).as("line"))
  }

  /** Decoder round-trip: envelope → Canal-JSON → from_json → fields. The
    * oracle is the PLAIN cdc stream — passing proves encode∘decode = id. */
  val canalRoundtrip = GateQuery(
    "q45_canal_roundtrip",
    Some(cte +
      s"""SELECT seq,
         |  schema_name AS database_name, table_name AS tbl, commit_ts AS es,
         |  CASE op WHEN 'I' THEN 'INSERT' WHEN 'U' THEN 'UPDATE' ELSE 'DELETE' END AS typ,
         |  pk AS data_pk,
         |  CASE WHEN op = 'D' THEN val_before ELSE val_after END AS data_val
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"), Codecs.canalDecode(Codecs.canalJson(df)).as("m"))
      .select(col("seq"),
        col("m.database").as("database_name"),
        col("m.table").as("tbl"),
        col("m.es").as("es"),
        col("m.type").as("typ"),
        element_at(col("m.data"), 1).getField("pk").as("data_pk"),
        element_at(col("m.data"), 1).getField("val").as("data_val"))
  }

  /** E3 schema half — Avro schema generation per routed target table. */
  val avroSchemas = GateQuery(
    "q46_avro_schema",
    Some(cte +
      """SELECT DISTINCT schema_name, table_name,
        |  '{"type":"record","name":"' || table_name || '","namespace":"' || schema_name ||
        |  '","fields":[{"name":"pk","type":"long"},{"name":"val","type":["null","double"]},' ||
        |  '{"name":"etype","type":["null","string"]}]}' AS avro_schema
        |FROM cdc""".stripMargin)) { (spark, dir) =>
    val fields = Seq(("pk", "long", false), ("val", "double", true), ("etype", "string", true))
    CdcStream.derive(spark, dir)
      .select("schema_name", "table_name").distinct()
      .withColumn("avro_schema",
        concat(lit("""{"type":"record","name":""""), col("table_name"),
          lit("""","namespace":""""), col("schema_name"),
          lit("\"," + """"fields":[{"name":"pk","type":"long"},{"name":"val","type":["null","double"]},{"name":"etype","type":["null","string"]}]}""")))
  }

  /**
   * E3 (binary half) — Avro BINARY round-trip in the Confluent wire format.
   * The oracle cannot decode Avro, so the gate pins the codec two ways:
   * (1) exact message BYTE LENGTHS, which the oracle derives from the Avro
   * spec arithmetically (zigzag-varint widths + union branch bytes + IEEE
   * doubles), and (2) a decode round-trip whose aggregates must equal the
   * plain stream. DELETE emits a nil value (Kafka tombstone) and the key
   * always carries the handle, per the reference's Avro sink semantics
   * (pkg/sink/codec/avro/avro.go:210-1050).
   */
  private def varintLenSql(z: String): String =
    // byte width of an unsigned LEB128 varint: k bytes iff z < 2^(7k)
    (1 to 9).map(k => s"WHEN ($z) < ${1L << (7 * k)} THEN $k")
      .mkString("CASE ", " ", " ELSE 10 END")

  val avroBinary = GateQuery(
    "q46b_avro_binary",
    Some(cte +
      s"""SELECT op, count(*) AS cnt,
         |  CAST(sum(5 + ${varintLenSql("2*pk")}) AS BIGINT) AS sum_key_len,
         |  CAST(coalesce(sum(CASE WHEN op <> 'D'
         |    THEN 5 + ${varintLenSql("2*pk")}
         |         + (CASE WHEN val_after IS NULL THEN 1 ELSE 9 END)
         |         + 2 + strlen(etype) END), 0) AS BIGINT) AS sum_val_len,
         |  CAST(count(*) AS BIGINT) AS n_key_ok,
         |  CAST(count(*) AS BIGINT) AS n_roundtrip,
         |  CAST(coalesce(sum(CASE WHEN op <> 'D'
         |    THEN CAST(val_after AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS sum_val
         |FROM cdc GROUP BY op""".stripMargin)) { (spark, dir) =>
    import graft.functions.AvroBinary
    val df = CdcStream.derive(spark, dir)
    val enc = df.select(col("op"), col("pk"), col("val_after"), col("etype"),
      AvroBinary.encodeHandleKey(col("pk"), 2).as("key_msg"),
      when(col("op") =!= "D",
        AvroBinary.encodeEnvelope(col("pk"), col("val_after"), col("etype"), 1))
        .otherwise(lit(null).cast("binary")).as("value_msg"))
    val dec = enc
      .withColumn("dec_key", AvroBinary.decodeHandleKey(col("key_msg"), 2))
      .withColumn("dec", AvroBinary.decodeEnvelope(col("value_msg"), 1))
    dec.groupBy("op").agg(
      count(lit(1)).as("cnt"),
      sum(length(col("key_msg"))).as("sum_key_len"),
      coalesce(sum(length(col("value_msg"))), lit(0L)).as("sum_val_len"),
      sum(when(col("dec_key") === col("pk"), 1L).otherwise(0L)).as("n_key_ok"),
      sum(when(
        (col("op") === "D" && col("dec").isNull) ||
          (col("dec.pk") === col("pk") &&
            col("dec.val").eqNullSafe(col("val_after")) &&
            col("dec.etype") === col("etype")), 1L).otherwise(0L)).as("n_roundtrip"),
      coalesce(sum(col("dec.val").cast("decimal(18,6)")), lit(0).cast("decimal(18,6)"))
        .cast("double").as("sum_val"))
  }

  /**
   * E8 — Craft batch round-trip: each partition's rows are encoded into ONE
   * Craft message (columnar headers, shared term dictionary, column
   * groups), decoded back, and the decoded stream must aggregate exactly
   * like the plain stream. Exercises the full frame: delta chunks,
   * dictionary sharing across events, null values, trailing size tables.
   * (Real sinks cap events per message; one-per-partition maximizes
   * dictionary/delta reuse for the test.)
   */
  val craftRoundtrip = GateQuery(
    "q57_craft_roundtrip",
    Some(cte +
      """SELECT op, count(*) AS cnt, CAST(sum(pk) AS BIGINT) AS sum_pk,
        |  CAST(coalesce(sum(CAST(CASE WHEN op = 'D' THEN val_before
        |                             ELSE val_after END AS DECIMAL(18,6))), 0)
        |       AS DOUBLE) AS sum_val,
        |  count(DISTINCT etype) AS n_etypes,
        |  min(commit_ts) AS min_ts, max(commit_ts) AS max_ts
        |FROM cdc GROUP BY op""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.functions.CraftCodec
    import CraftCodec.{Col, Event, Group}
    val rows = CdcStream.derive(spark, dir)
      .select(col("op"), col("commit_ts"), col("schema_name"), col("table_name"),
        col("pk"), col("val_before"), col("val_after"), col("etype"))
      .as[CraftEnvRow]
    val decoded = rows
      .repartition(8, col("schema_name"), col("table_name"))
      .mapPartitions { it =>
        val evs = it.map { r =>
          def image(v: Option[Double], ty: Int) = Group(ty, Seq(
            Col("pk", CraftCodec.TypeLonglong, CraftCodec.FlagHandleKey,
              Some(CraftCodec.longValue(r.pk))),
            Col("val", CraftCodec.TypeDouble, 0L,
              v.map(CraftCodec.doubleValue)),
            Col("etype", CraftCodec.TypeVarchar, 0L,
              Some(CraftCodec.stringValue(r.etype)))))
          val groups = r.op match {
            case "I" => Seq(image(r.val_after, CraftCodec.GroupNew))
            case "D" => Seq(image(r.val_before, CraftCodec.GroupOld))
            case _ => Seq(image(r.val_before, CraftCodec.GroupOld),
              image(r.val_after, CraftCodec.GroupNew))
          }
          Event(r.commit_ts, CraftCodec.MsgRow, -1L,
            Some(r.schema_name), Some(r.table_name), groups)
        }.toSeq
        if (evs.isEmpty) Iterator.empty
        else CraftCodec.decodeMessage(CraftCodec.encodeMessage(evs)).iterator.map { e =>
          val byTy = e.groups.map(g => g.ty -> g.cols).toMap
          val op =
            if (byTy.contains(CraftCodec.GroupNew) && byTy.contains(CraftCodec.GroupOld)) "U"
            else if (byTy.contains(CraftCodec.GroupNew)) "I" else "D"
          def colVal(g: Seq[Col], name: String): Option[Array[Byte]] =
            g.find(_.name == name).flatMap(_.value)
          val newG = byTy.getOrElse(CraftCodec.GroupNew, Nil)
          val oldG = byTy.getOrElse(CraftCodec.GroupOld, Nil)
          val img = if (op == "D") oldG else newG
          CraftEnvRow(op, e.ts, e.schema.get, e.table.get,
            colVal(img, "pk").map(CraftCodec.decodeLong).get,
            colVal(oldG, "val").map(CraftCodec.decodeDouble),
            colVal(newG, "val").map(CraftCodec.decodeDouble),
            colVal(img, "etype").map(CraftCodec.decodeString).get)
        }
      }
    decoded.toDF().groupBy("op").agg(
      count(lit(1)).as("cnt"),
      sum(col("pk")).as("sum_pk"),
      coalesce(sum(when(col("op") === "D", col("val_before"))
        .otherwise(col("val_after")).cast("decimal(18,6)")),
        lit(0).cast("decimal(18,6)")).cast("double").as("sum_val"),
      countDistinct(col("etype")).as("n_etypes"),
      min(col("commit_ts")).as("min_ts"), max(col("commit_ts")).as("max_ts"))
  }

  /** E7 — Simple protocol: schema-lifecycle bootstrap + row messages. */
  val simple = GateQuery(
    "q48_simple",
    Some(cte +
      s"""SELECT seq, msg FROM (
         |  SELECT DISTINCT -1 - dense_rank() OVER (ORDER BY schema_name, table_name) AS seq,
         |    to_json(struct_pack(
         |      type := 'BOOTSTRAP', "database" := schema_name, "table" := table_name,
         |      schemaVersion := 1,
         |      columns := [
         |        struct_pack(name := 'pk', dataType := 'BIGINT', nullable := false),
         |        struct_pack(name := 'val', dataType := 'DOUBLE', nullable := true),
         |        struct_pack(name := 'etype', dataType := 'VARCHAR', nullable := true)]
         |    )) AS msg
         |  FROM cdc
         |  UNION ALL
         |  SELECT seq, to_json(struct_pack(
         |    type := CASE op WHEN 'I' THEN 'INSERT' WHEN 'U' THEN 'UPDATE' ELSE 'DELETE' END,
         |    commitTs := commit_ts, "database" := schema_name, "table" := table_name,
         |    schemaVersion := 1,
         |    data := CASE WHEN op <> 'D' THEN ${imgStructSql("val_after")}
         |                 ELSE $imgNullStructSql END,
         |    old := CASE WHEN op <> 'I' THEN ${imgStructSql("val_before")}
         |                ELSE $imgNullStructSql END
         |  )) AS msg FROM cdc WHERE $SampleE
         |)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    val df = CdcStream.derive(spark, dir)
    // bootstrap messages are a control-plane set (one per table): rank the
    // distinct pairs on the driver rather than through a global window,
    // which would single-partition the stage
    val pairs = df.select("schema_name", "table_name").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    val boot = pairs.zipWithIndex
      .map { case ((s, t), i) => (-1L - (i + 1), s, t) }.toSeq
      .toDF("seq", "schema_name", "table_name")
    val bootMsgs = boot.select(col("seq"),
      Codecs.simpleBootstrap(boot, 1).as("msg"))
    val sampled = df.filter(expr(SampleE))
    bootMsgs.unionByName(
      sampled.select(col("seq"), Codecs.simpleRow(sampled, 1).as("msg")))
  }

  /** K2 — complete Kafka record: topic (R2), partition (R3 index-value
    * dispatch), key and value (E1) as the four sink columns Spark's Kafka
    * writer consumes. The whole record is ONE projection — no per-row
    * dispatch code. */
  val kafkaRecord = GateQuery(
    "q49_kafka_record",
    Some(cte +
      s"""SELECT seq,
         |  'cdc.' || schema_name || '.' || table_name AS topic,
         |  ${graft.core.Hashing.Sql.mix32("pk_after")} % 6 AS partition,
         |  to_json(struct_pack(ts := commit_ts, scm := schema_name,
         |                      tbl := table_name, t := 1)) AS key,
         |  to_json(struct_pack(
         |    u := CASE WHEN op <> 'D' THEN ${opImgSql("val_after")} ELSE $opImgNullSql END,
         |    d := CASE WHEN op = 'D' THEN ${opImgSql("val_before")} ELSE $opImgNullSql END
         |  )) AS value
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    import graft.operators.Routing
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
      .withColumn("target_schema", col("schema_name"))
      .withColumn("target_table", col("table_name"))
    df.select(col("seq"),
      Routing.topic("cdc.", ".").as("topic"),
      Routing.dispatchByIndexValue(6).as("partition"),
      Codecs.openProtocolKey(df).as("key"),
      Codecs.openProtocolValue(df).as("value"))
  }

  /** K3 — complete Pulsar record: fully-qualified topic
    * (persistent://tenant/ns/..., dispatcher/topic/expression.go
    * PulsarValidate), message KEY instead of a partition number (Pulsar
    * key-routes; cdc/sink/dmlsink/mq/dmlproducer/pulsar_dml_producer
    * .go:151-154 sends {Payload, Key}), and the encoded payload. The key
    * here is the table dispatcher's "schema.table" (partition/table.go);
    * the index-value key form is covered byte-exactly by the crc32 parity
    * spec (DuckDB has no crc32, so it cannot be oracle-gated). */
  val pulsarRecord = GateQuery(
    "q49b_pulsar_record",
    Some(cte +
      s"""SELECT seq,
         |  'persistent://public/default/cdc_' || schema_name || '_' || table_name AS topic,
         |  schema_name || '.' || table_name AS key,
         |  to_json(struct_pack(
         |    u := CASE WHEN op <> 'D' THEN ${opImgSql("val_after")} ELSE $opImgNullSql END,
         |    d := CASE WHEN op = 'D' THEN ${opImgSql("val_before")} ELSE $opImgNullSql END
         |  )) AS value
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    import graft.operators.Routing
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
      .withColumn("target_schema", col("schema_name"))
      .withColumn("target_table", col("table_name"))
    df.select(col("seq"),
      Routing.pulsarTopic("cdc_{schema}_{table}").as("topic"),
      Routing.partitionKeyByTable().as("key"),
      Codecs.openProtocolValue(df).as("value"))
  }

  /**
   * D1 — TiKV row-format v2 binary decode (graft.functions.RowCodec): rows
   * encode to v2 bytes and decode back through the Catalyst expressions.
   * The oracle cannot parse the binary format, so (like q46b) it pins
   * (1) EXACT message byte lengths derived arithmetically from the public
   * design doc's layout (header 6B + ids + 2B end-offsets + minimal-width
   * ints + 8B floats + raw strings) and (2) decode round-trip aggregates
   * equal to the plain stream.
   */
  private def intLenSql(e: String): String =
    s"CASE WHEN $e < 128 THEN 1 WHEN $e < 32768 THEN 2 " +
      s"WHEN $e < 2147483648 THEN 4 ELSE 8 END"

  val rowcodecV2 = GateQuery(
    "q58_rowcodec_v2",
    Some(cte +
      s"""SELECT op, count(*) AS cnt,
         |  CAST(sum(6 + 3
         |    + 2 * (CASE WHEN v IS NULL THEN 2 ELSE 3 END)
         |    + ${intLenSql("pk")}
         |    + CASE WHEN v IS NULL THEN 0 ELSE 8 END
         |    + strlen(etype)) AS BIGINT) AS sum_len,
         |  CAST(count(*) AS BIGINT) AS n_roundtrip,
         |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_val,
         |  CAST(coalesce(sum(CAST(v AS DECIMAL(18,6))), 0) AS DOUBLE) AS sum_val
         |FROM (
         |  SELECT op, pk, etype,
         |    CASE WHEN op = 'D' THEN val_before ELSE val_after END AS v
         |  FROM cdc
         |) GROUP BY op""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.types._
    import graft.functions.RowCodec
    val key = RowCodec.register(Seq(
      ("pk", 1L, LongType), ("val", 2L, DoubleType), ("etype", 3L, StringType)))
    val df = CdcStream.derive(spark, dir)
      .withColumn("v", when(col("op") === "D", col("val_before"))
        .otherwise(col("val_after")))
    val enc = df.select(col("op"), col("pk"), col("v"), col("etype"),
      RowCodec.encode(struct(col("pk"), col("v"), col("etype")), key).as("bytes"))
    val dec = enc.withColumn("dec", RowCodec.decode(col("bytes"), key))
    dec.groupBy("op").agg(
      count(lit(1)).as("cnt"),
      sum(length(col("bytes"))).as("sum_len"),
      sum(when(col("dec.pk") === col("pk") &&
        col("dec.val").eqNullSafe(col("v")) &&
        col("dec.etype") === col("etype"), 1L).otherwise(0L)).as("n_roundtrip"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null_val"),
      coalesce(sum(col("dec.val").cast("decimal(18,6)")),
        lit(0).cast("decimal(18,6)")).cast("double").as("sum_val"))
  }

  /**
   * E3 registry — schema evolution across versions: two schemas register
   * under one subject (v2 adds a nullable column), each row is framed
   * with the id in force at its commit ts (the q72 as-of boundary), and
   * the consumer dispatches per message by frame id — decode with the
   * wrong id returns null (the registry-mismatch contract), so
   * n_roundtrip pins that every message carries exactly the right id.
   */
  val avroEvolution = GateQuery(
    "q46c_avro_evolution",
    Some(cte +
      """SELECT CASE WHEN commit_ts < 1002000 THEN 1 ELSE 2 END AS schema_id,
        |  count(*) AS cnt, CAST(count(*) AS BIGINT) AS n_roundtrip,
        |  CAST(sum(pk) AS BIGINT) AS sum_pk,
        |  min(commit_ts) AS min_ts, max(commit_ts) AS max_ts
        |FROM cdc WHERE op <> 'D' GROUP BY 1""".stripMargin)) { (spark, dir) =>
    import graft.core.AvroSchemaRegistry
    import graft.functions.AvroBinary
    val reg = new AvroSchemaRegistry()
    val base = Seq(("pk", "long", false), ("val", "double", true),
      ("etype", "string", true))
    val v1 = reg.register("events-value",
      Codecs.avroSchema("db", "events", base))
    val v2 = reg.register("events-value",
      Codecs.avroSchema("db", "events", base :+ ("c2", "string", true)))
    // idempotent re-registration must return the original id
    require(reg.register("events-value",
      Codecs.avroSchema("db", "events", base)).id == v1.id)
    val df = CdcStream.derive(spark, dir).filter(col("op") =!= "D")
    val enc = df.select(col("pk"), col("val_after"), col("commit_ts"),
      when(col("commit_ts") < 1002000L,
        AvroBinary.encodeEnvelope(col("pk"), col("val_after"), col("etype"), v1.id))
        .otherwise(
          AvroBinary.encodeEnvelope(col("pk"), col("val_after"), col("etype"), v2.id))
        .as("msg"))
    val dec = enc
      .withColumn("dec1", AvroBinary.decodeEnvelope(col("msg"), v1.id))
      .withColumn("dec2", AvroBinary.decodeEnvelope(col("msg"), v2.id))
      .withColumn("schema_id",
        when(col("dec1").isNotNull, v1.id).otherwise(v2.id))
      .withColumn("dec", coalesce(col("dec1"), col("dec2")))
    dec.groupBy("schema_id").agg(
      count(lit(1)).as("cnt"),
      sum(when(col("dec.pk") === col("pk") &&
        col("dec.val").eqNullSafe(col("val_after")), 1L).otherwise(0L))
        .as("n_roundtrip"),
      sum(col("pk")).as("sum_pk"),
      min(col("commit_ts")).as("min_ts"), max(col("commit_ts")).as("max_ts"))
  }

  /**
   * E3 registry, Glue variant — the reference's second registry contract
   * (pkg/sink/codec/avro/glue_schema_registry.go:96-124,257-345): schema
   * VERSIONS are identified by UUIDs, the wire header is 18 bytes
   * [3, 0, 16-byte version UUID] instead of Confluent's 5, and consumers
   * dispatch by the UUID in the header. Two versions register under one
   * schema name ((Create|RegisterSchemaVersion) semantics, idempotent on
   * re-register), each row frames with the version in force at its commit
   * ts, and the gate pins (1) EXACT message byte lengths — 18-byte header +
   * Avro body widths the oracle derives arithmetically, the proof the Glue
   * layout (not Confluent's) is on the wire — and (2) per-version decode
   * dispatch: decode with the wrong UUID returns null.
   */
  val avroGlue = GateQuery(
    "q46d_avro_glue",
    Some(cte +
      s"""SELECT CASE WHEN commit_ts < 1002000 THEN 1 ELSE 2 END AS schema_version,
         |  count(*) AS cnt,
         |  CAST(sum(18 + ${varintLenSql("2*pk")}
         |    + (CASE WHEN val_after IS NULL THEN 1 ELSE 9 END)
         |    + 2 + strlen(etype)) AS BIGINT) AS sum_len,
         |  CAST(count(*) AS BIGINT) AS n_roundtrip,
         |  CAST(sum(pk) AS BIGINT) AS sum_pk,
         |  min(commit_ts) AS min_ts, max(commit_ts) AS max_ts
         |FROM cdc WHERE op <> 'D' GROUP BY 1""".stripMargin)) { (spark, dir) =>
    import graft.core.GlueSchemaRegistry
    import graft.functions.AvroBinary
    val reg = new GlueSchemaRegistry("graft-registry")
    val base = Seq(("pk", "long", false), ("val", "double", true),
      ("etype", "string", true))
    val v1 = reg.register("db.events",
      Codecs.avroSchema("db", "events", base))
    val v2 = reg.register("db.events",
      Codecs.avroSchema("db", "events", base :+ ("c2", "string", true)))
    require(v1.versionNumber == 1 && v2.versionNumber == 2 &&
      v1.versionId != v2.versionId)
    // re-registering an existing definition is idempotent (Glue
    // RegisterSchemaVersion returns the version already holding it)
    require(reg.register("db.events",
      Codecs.avroSchema("db", "events", base)).versionId == v1.versionId)
    // the header UUID must resolve back through the registry
    require(reg.byId(v2.versionId).contains(v2) &&
      reg.latest("db.events").contains(v2))
    val df = CdcStream.derive(spark, dir).filter(col("op") =!= "D")
    val enc = df.select(col("pk"), col("val_after"), col("commit_ts"),
      when(col("commit_ts") < 1002000L,
        AvroBinary.encodeEnvelopeGlue(col("pk"), col("val_after"), col("etype"),
          v1.versionId))
        .otherwise(
          AvroBinary.encodeEnvelopeGlue(col("pk"), col("val_after"), col("etype"),
            v2.versionId))
        .as("msg"))
    val dec = enc
      .withColumn("dec1", AvroBinary.decodeEnvelopeGlue(col("msg"), v1.versionId))
      .withColumn("dec2", AvroBinary.decodeEnvelopeGlue(col("msg"), v2.versionId))
      .withColumn("schema_version",
        when(col("dec1").isNotNull, 1).otherwise(2))
      .withColumn("dec", coalesce(col("dec1"), col("dec2")))
    dec.groupBy("schema_version").agg(
      count(lit(1)).as("cnt"),
      sum(length(col("msg"))).as("sum_len"),
      sum(when(col("dec.pk") === col("pk") &&
        col("dec.val").eqNullSafe(col("val_after")), 1L).otherwise(0L))
        .as("n_roundtrip"),
      sum(col("pk")).as("sum_pk"),
      min(col("commit_ts")).as("min_ts"), max(col("commit_ts")).as("max_ts"))
  }

  // ---- decoder round trips (the consumer-migration matrix; reference
  // RowEventDecoder mirrors + tests/mq_protocol_tests replay shape). Each
  // oracle is the PLAIN cdc stream — green proves encode∘decode = id on
  // every field the wire format carries.

  val debeziumRoundtrip = GateQuery(
    "q41c_debezium_roundtrip",
    Some(cte +
      s"""SELECT seq, op, commit_ts, schema_name, table_name, pk,
         |  val_before, val_after, etype
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"),
      Codecs.debeziumToEnvelope(
        Codecs.debeziumDecode(Codecs.debezium(df))).as("e"))
      .select(col("seq"), col("e.op").as("op"), col("e.commit_ts").as("commit_ts"),
        col("e.schema_name").as("schema_name"), col("e.table_name").as("table_name"),
        col("e.pk").as("pk"), col("e.val_before").as("val_before"),
        col("e.val_after").as("val_after"), col("e.etype").as("etype"))
  }

  val maxwellRoundtrip = GateQuery(
    "q42c_maxwell_roundtrip",
    Some(cte +
      s"""SELECT seq, op, commit_ts, start_ts, schema_name, table_name, pk,
         |  val_before, val_after, etype
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"),
      Codecs.maxwellToEnvelope(
        Codecs.maxwellDecode(Codecs.maxwell(df))).as("e"))
      .select(col("seq"), col("e.op").as("op"), col("e.commit_ts").as("commit_ts"),
        col("e.start_ts").as("start_ts"),
        col("e.schema_name").as("schema_name"), col("e.table_name").as("table_name"),
        col("e.pk").as("pk"), col("e.val_before").as("val_before"),
        col("e.val_after").as("val_after"), col("e.etype").as("etype"))
  }

  /** The encoder runs old-value-disabled (no "p" block), so the decoded op
    * is upsert-or-delete — exactly what the reference decoder yields in
    * that mode; the oracle collapses I/U accordingly. */
  val openRoundtrip = GateQuery(
    "q43c_open_roundtrip",
    Some(cte +
      s"""SELECT seq, CASE WHEN op = 'D' THEN 'D' ELSE 'I' END AS op,
         |  commit_ts, schema_name, table_name AS tbl_name, pk,
         |  CASE WHEN op = 'D' THEN val_before ELSE val_after END AS val, etype
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"),
      Codecs.openToEnvelope(
        Codecs.openDecodeKey(Codecs.openProtocolKey(df)),
        Codecs.openDecodeValue(Codecs.openProtocolValue(df))).as("e"))
      .select(col("seq"), col("e.op").as("op"), col("e.commit_ts").as("commit_ts"),
        col("e.schema_name").as("schema_name"), col("e.tbl_name").as("tbl_name"),
        col("e.pk").as("pk"), col("e.val").as("val"), col("e.etype").as("etype"))
  }

  val csvRoundtrip = GateQuery(
    "q44c_csv_roundtrip",
    Some(cte +
      s"""SELECT seq, op, schema_name, table_name, commit_ts, pk,
         |  CASE WHEN op = 'D' THEN val_before ELSE val_after END AS val, etype
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"), Codecs.csvDecode(Codecs.csvLine(df)).as("e"))
      .select(col("seq"), col("e.op").as("op"),
        col("e.schema_name").as("schema_name"), col("e.table_name").as("table_name"),
        col("e.commit_ts").as("commit_ts"), col("e.pk").as("pk"),
        col("e.val").as("val"), col("e.etype").as("etype"))
  }

  val simpleRoundtrip = GateQuery(
    "q48c_simple_roundtrip",
    Some(cte +
      s"""SELECT seq, op, commit_ts, schema_name, table_name, pk,
         |  val_before, val_after, etype
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"),
      Codecs.simpleToEnvelope(
        Codecs.simpleDecode(Codecs.simpleRow(df, 1))).as("e"))
      .select(col("seq"), col("e.op").as("op"), col("e.commit_ts").as("commit_ts"),
        col("e.schema_name").as("schema_name"), col("e.table_name").as("table_name"),
        col("e.pk").as("pk"), col("e.val_before").as("val_before"),
        col("e.val_after").as("val_after"), col("e.etype").as("etype"))
  }

  /** E7 avro wire form (reference pkg/sink/codec/simple/avro.go +
    * marshaller.go): the q48 stream marshalled as Avro binary against a
    * registry-held union schema, framed with the registry's id, decoded
    * back — encode∘decode = id on every envelope field, completing the
    * simple protocol's encoder-variant matrix (JSON q48/q48c, Avro here).
    * Decoding against a WRONG registry id must yield NULL, pinned by
    * n_foreign = 0. */
  val simpleAvroRoundtrip = GateQuery(
    "q121_simple_avro",
    Some(cte +
      s"""SELECT seq, op, commit_ts, schema_name, table_name, pk,
         |  val_before, val_after, etype, 0 AS n_foreign
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    import graft.core.AvroSchemaRegistry
    import graft.functions.SimpleAvro
    val reg = new AvroSchemaRegistry()
    val rid = reg.register("events-simple-value", SimpleAvro.MessageSchemaJson)
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    val wire = df.select(col("seq"),
      SimpleAvro.encodeDmlColumn(df, schemaVersion = 1, schemaId = rid.id).as("msg"))
    wire.select(col("seq"),
        SimpleAvro.decodeColumn(col("msg"), rid.id).as("m"),
        SimpleAvro.decodeColumn(col("msg"), rid.id + 999).as("foreign"))
      .select(col("seq"),
        when(col("m.mtype") === "INSERT", "I")
          .when(col("m.mtype") === "UPDATE", "U").otherwise("D").as("op"),
        col("m.commit_ts").as("commit_ts"),
        col("m.database").as("schema_name"),
        col("m.tbl").as("table_name"),
        coalesce(col("m.data.pk"), col("m.old.pk")).as("pk"),
        col("m.old.val").as("val_before"),
        col("m.data.val").as("val_after"),
        coalesce(col("m.data.etype"), col("m.old.etype")).as("etype"),
        when(col("foreign").isNull, 0).otherwise(1).as("n_foreign"))
  }

  /**
   * E1 batch framing end to end (q108): key/value pairs pack into
   * BatchVersion1 wire frames (16 pairs per message) per deterministic
   * slot, the frames decode back to pairs, and the pairs decode back to
   * envelope rows — the full consumer path for a batched Kafka topic.
   * n_frames = ceil(n/16) per slot witnesses the framing actually split;
   * the aggregates witness nothing was lost or reordered across the
   * byte round trip.
   */
  val openBatchRoundtrip = GateQuery(
    "q108_open_batch",
    Some(cte +
      s"""SELECT pk % 4 AS slot, count(*) AS n_msgs,
         |  CAST((count(*) + 15) // 16 AS BIGINT) AS n_frames,
         |  CAST(sum(pk) AS BIGINT) AS sum_pk,
         |  CAST(coalesce(sum(CAST(CASE WHEN op = 'D' THEN val_before
         |                          ELSE val_after END AS DECIMAL(18,6))), 0)
         |       AS DOUBLE) AS sum_val
         |FROM cdc WHERE $SampleE GROUP BY 1""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.functions.OpenBatch
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    val pairs = df.select((col("pk") % 4).as("slot"), col("seq"),
        Codecs.openProtocolKey(df).as("k"), Codecs.openProtocolValue(df).as("v"))
      .as[(Long, Long, String, String)]
    val rebuilt = pairs.groupByKey(_._1).flatMapGroups { (slot, it) =>
      val sorted = it.toSeq.sortBy(_._2)
      OpenBatch.encode(sorted.iterator.map(r =>
          (r._3.getBytes("UTF-8"), r._4.getBytes("UTF-8"))), maxBatchSize = 16)
        .zipWithIndex.flatMap { case ((mk, mv), fi) =>
          OpenBatch.decode(mk, mv).iterator.map { case (k, v) =>
            (slot, fi.toLong, new String(k, "UTF-8"), new String(v, "UTF-8"))
          }
        }
    }.toDF("slot", "frame", "k", "v")
    rebuilt
      .withColumn("e", Codecs.openToEnvelope(
        Codecs.openDecodeKey(col("k")), Codecs.openDecodeValue(col("v"))))
      .groupBy("slot")
      .agg(count(lit(1)).as("n_msgs"),
        (countDistinct(col("frame"))).as("n_frames"),
        sum(col("e.pk")).as("sum_pk"),
        coalesce(sum(col("e.val").cast("decimal(18,6)")),
          lit(0).cast("decimal(18,6)")).cast("double").as("sum_val"))
  }

  /**
   * Per-message payload compression (q145; reference pkg/compression +
   * pkg/sink/codec/common/compress.go, applied by every MQ encoder when
   * large-message-handle compression is set, e.g.
   * open_protocol_encoder.go:58 / open_protocol_decoder.go:147): the
   * open-protocol value bytes run encode→compress→decompress→decode
   * through all three reference codecs (none, snappy block format, lz4
   * frame format) and the decoded envelopes must agree with the plain
   * stream for every codec. n_rewritten witnesses that snappy/lz4
   * actually transformed every payload (headers guarantee wire ≠ plain)
   * while `none` passed bytes through untouched — three genuinely
   * different byte paths, one oracle-pinned result.
   */
  val compressedMessages = GateQuery(
    "q145_compressed_msgs",
    Some(cte +
      s"""SELECT codec, count(*) AS n_msgs,
         |  CAST(CASE codec WHEN 'none' THEN 0 ELSE count(*) END AS BIGINT)
         |    AS n_rewritten,
         |  CAST(sum(pk) AS BIGINT) AS sum_pk,
         |  CAST(coalesce(sum(CAST(CASE WHEN op = 'D' THEN val_before
         |                          ELSE val_after END AS DECIMAL(18,6))), 0)
         |       AS DOUBLE) AS sum_val
         |FROM cdc CROSS JOIN (SELECT unnest(['lz4','none','snappy']) AS codec) c
         |WHERE $SampleE GROUP BY 1""".stripMargin)) { (spark, dir) =>
    import graft.functions.MessageCompress
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    val plain = df.select(
      Codecs.openProtocolKey(df).as("k"),
      Codecs.openProtocolValue(df).cast("binary").as("v"))
    // ONE scan + ONE protocol encode per row, exploded across the three
    // codecs — the union-of-branches form re-derived the CDC stream and
    // re-encoded the open-protocol JSON once PER codec (3× the scan and
    // encode work for identical rows; r20 bench: 7.8 s → see
    // OPTIMIZATION_r20.md). Each wire value is computed in its own
    // projection first so the two consumers below (rewritten compare,
    // decompress) share a single compression pass per codec.
    val codecs = Seq(MessageCompress.None, MessageCompress.Snappy,
      MessageCompress.Lz4)
    val wired = plain.select(col("k") +: col("v") +: codecs.map(cc =>
      MessageCompress.compressBytes(col("v"), cc).as(s"w_$cc")): _*)
    val cases = codecs.map { cc =>
      struct(lit(cc).as("codec"),
        (col(s"w_$cc") =!= col("v")).as("rewritten"),
        MessageCompress.decompressBytes(col(s"w_$cc"), cc)
          .cast("string").as("vj"))
    }
    wired
      .select(col("k"), explode(array(cases: _*)).as("c"))
      .select(col("c.codec").as("codec"), col("k"),
        col("c.rewritten").as("rewritten"), col("c.vj").as("vj"))
      .withColumn("e", Codecs.openToEnvelope(
        Codecs.openDecodeKey(col("k")), Codecs.openDecodeValue(col("vj"))))
      .groupBy("codec")
      .agg(count(lit(1)).as("n_msgs"),
        sum(when(col("rewritten"), 1L).otherwise(0L)).as("n_rewritten"),
        sum(col("e.pk")).as("sum_pk"),
        coalesce(sum(col("e.val").cast("decimal(18,6)")),
          lit(0).cast("decimal(18,6)")).cast("double").as("sum_val"))
  }

  /**
   * Row integrity end to end (q112; reference pkg/integrity
   * check-level=correctness): every message carries a row checksum in the
   * canal `_tidb` extension block; the consumer recomputes it over the
   * DECODED columns. A deterministic subset of messages (pk % 97 = 0 with
   * a non-null image) is corrupted in flight (a digit prepended to the
   * carried value), and the verifier must flag exactly those — the
   * oracle derives the expected clean/corrupt counts independently from
   * the plain stream.
   */
  val integrity = GateQuery(
    "q112_integrity",
    Some(cte +
      s"""SELECT op, count(*) AS n_msgs,
         |  CAST(sum(CASE WHEN pk % 97 = 0 AND
         |      (CASE WHEN op = 'D' THEN val_before ELSE val_after END) IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
         |  CAST(sum(CASE WHEN pk % 97 = 0 AND
         |      (CASE WHEN op = 'D' THEN val_before ELSE val_after END) IS NOT NULL
         |    THEN 0 ELSE 1 END) AS BIGINT) AS n_verified
         |FROM cdc WHERE $SampleE GROUP BY 1""".stripMargin)) { (spark, dir) =>
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    val img = when(col("op") === "D", col("val_before")).otherwise(col("val_after"))
    val corruptible = col("pk") % 97 === 0 && img.isNotNull
    val wire = df.select(col("op"),
      when(corruptible,
        // in-flight corruption: prepend a digit to the carried value
        regexp_replace(Codecs.canalJsonIntegrity(df), "\"val\":", "\"val\":9"))
        .otherwise(Codecs.canalJsonIntegrity(df)).as("msg"))
    val dec = wire.withColumn("m", from_json(col("msg"), Codecs.canalIntegritySchema))
      .withColumn("ok", Codecs.verifyIntegrity(col("m")))
    dec.groupBy("op").agg(count(lit(1)).as("n_msgs"),
      sum(when(!col("ok"), 1L).otherwise(0L)).as("n_corrupt"),
      sum(when(col("ok"), 1L).otherwise(0L)).as("n_verified"))
  }

  /**
   * E2 (protobuf wire form) — the ORIGINAL `protocol=canal` binary
   * protocol: every sampled envelope row encodes to a protobuf Entry
   * ([[graft.functions.CanalProto]], hand-rolled varint/length-delimited
   * framing against the reference's EntryProtocol.proto field numbers)
   * and decodes back; the decoded header fields, event type, image
   * values, and per-image column counts must equal the oracle's direct
   * envelope derivation (insert = after-only, delete = before-only,
   * update = both with the NEW key in the after image). A golden spec
   * pins hand-assembled wire bytes so the encoding is protobuf, not
   * merely self-inverse.
   */
  val canalProtoRoundtrip = GateQuery(
    "q133_canal_proto",
    Some(cte +
      s"""SELECT seq, schema_name, table_name AS tbl, commit_ts AS execute_time,
         |  CAST(CASE op WHEN 'I' THEN 1 WHEN 'U' THEN 2 ELSE 3 END AS INT)
         |    AS event_type,
         |  false AS is_ddl,
         |  CASE WHEN op = 'D' THEN pk ELSE pk_after END AS pk,
         |  CASE WHEN op = 'I' THEN NULL ELSE val_before END AS val_before,
         |  CASE WHEN op = 'D' THEN NULL ELSE val_after END AS val_after,
         |  etype,
         |  CAST(CASE WHEN op = 'I' THEN 0 ELSE 3 END AS INT) AS n_before,
         |  CAST(CASE WHEN op = 'D' THEN 0 ELSE 3 END AS INT) AS n_after
         |FROM cdc WHERE $SampleE""".stripMargin)) { (spark, dir) =>
    import graft.functions.CanalProto
    val df = CdcStream.derive(spark, dir).filter(expr(SampleE))
    df.select(col("seq"),
        CanalProto.decodeColumn(CanalProto.encodeDmlColumn(df)).as("e"))
      .select(col("seq"), col("e.schema_name").as("schema_name"),
        col("e.tbl").as("tbl"), col("e.execute_time").as("execute_time"),
        col("e.event_type").as("event_type"), col("e.is_ddl").as("is_ddl"),
        col("e.pk").as("pk"), col("e.val_before").as("val_before"),
        col("e.val_after").as("val_after"), col("e.etype").as("etype"),
        col("e.n_before").as("n_before"), col("e.n_after").as("n_after"))
  }

  /**
   * The MQ CONSUMER loop, end to end (q137; reference cmd/kafka-consumer:
   * consume partition-ordered batched frames, decode, and apply to a live
   * MySQL downstream): a post-split key-complete sample dispatches to
   * slots (a key's events stay in ONE slot — Kafka's per-partition
   * ordering contract), frames per slot in stream order (the q108 wire
   * path), then the consumer unframes IN ORDER, decodes to upsert/delete
   * events (old-value-disabled open protocol), folds the per-key net
   * state by wire order, renders safe-mode SQL, and EXECUTES it on a live
   * embedded engine. The applied table state must equal the oracle's
   * direct per-key fold of the same stream — the check_sync_diff property
   * for the MQ path, closing the same loop q98 (SQL files), q97
   * (storage), and q118 (diff) close for theirs.
   */
  val mqConsumer = GateQuery(
    "q137_mq_consumer",
    Some(cte +
      """, pre AS (SELECT * FROM cdc WHERE pk % 23 = 0 OR pk_after % 23 = 0),
        |split AS (
        |  SELECT seq * 2 + leg AS seq,
        |    CASE WHEN leg = 1 THEN 'I'
        |         WHEN op = 'U' AND pk <> pk_after THEN 'D'
        |         ELSE op END AS op,
        |    commit_ts, schema_name, table_name,
        |    CASE WHEN leg = 1 THEN pk_after ELSE pk END AS pk,
        |    CASE WHEN leg = 1 THEN val_after
        |         WHEN op = 'U' AND pk <> pk_after THEN NULL
        |         WHEN op = 'D' THEN NULL
        |         ELSE val_after END AS val_after
        |  FROM (SELECT *,
        |          unnest(CASE WHEN op = 'U' AND pk <> pk_after
        |                      THEN [0, 1] ELSE [0] END) AS leg
        |        FROM pre)
        |), sampled AS (SELECT * FROM split WHERE pk % 23 = 0),
        |agg AS (
        |  SELECT schema_name, table_name, pk,
        |    arg_max(op, seq) AS last_op,
        |    arg_max(coalesce(val_after, -1), seq) AS last_val
        |  FROM sampled GROUP BY 1, 2, 3
        |)
        |SELECT schema_name, table_name, count(*) AS n_rows,
        |  CAST(sum(pk) AS BIGINT) AS sum_pk,
        |  CAST(sum(CAST(last_val AS DECIMAL(18,6))) AS DOUBLE) AS sum_val
        |FROM agg WHERE last_op <> 'D' GROUP BY 1, 2""".stripMargin), heavy = true) {
    (spark, dir) =>
    import spark.implicits._
    import graft.functions.OpenBatch
    import graft.operators.Transforms
    import graft.streaming.{Sinks, SqlApply}
    val ev = Transforms.updateSplit(
        CdcStream.derive(spark, dir)
          .filter(col("pk") % 23 === 0 || col("pk_after") % 23 === 0))
      .filter(col("pk") % 23 === 0)
    // producer: pairs → per-slot frames in stream order (a key's events
    // never cross slots, so per-slot order IS per-key order)
    val pairs = ev.select((col("pk") % 4).as("slot"), col("seq"),
        Codecs.openProtocolKey(ev).as("k"), Codecs.openProtocolValue(ev).as("v"))
      .as[(Long, Long, String, String)]
    val rebuilt = pairs.groupByKey(_._1).flatMapGroups { (slot, it) =>
      val sorted = it.toSeq.sortBy(_._2)
      OpenBatch.encode(sorted.iterator.map(r =>
          (r._3.getBytes("UTF-8"), r._4.getBytes("UTF-8"))), maxBatchSize = 16)
        .iterator.flatMap { case (mk, mv) => OpenBatch.decode(mk, mv) }
        .zipWithIndex.map { case ((k, v), ord) =>
          (slot, ord.toLong, new String(k, "UTF-8"), new String(v, "UTF-8")) }
    }.toDF("slot", "ord", "k", "v")
    // consumer: decode, fold net state per key by WIRE order, render+apply
    val dec = rebuilt.withColumn("e", Codecs.openToEnvelope(
        Codecs.openDecodeKey(col("k")), Codecs.openDecodeValue(col("v"))))
      .select(col("ord"), col("e.*"))
    val net = dec.groupBy(col("schema_name"), col("tbl_name").as("table_name"),
        col("pk"))
      .agg(max_by(col("op"), col("ord")).as("last_op"),
        max_by(coalesce(col("val"), lit(-1d)), col("ord")).as("last_val"),
        max(col("commit_ts")).as("last_commit_ts"))
      .withColumn("net_op",
        when(col("last_op") === "D", "D").otherwise("R")) // upsert ⇒ REPLACE
      .withColumn("final_val",
        when(col("net_op") === "D", lit(null).cast("double"))
          .otherwise(col("last_val")))
      .persist()
    val (sqlDir, tag) = Gate.freshScratch("graft_mq_consume_", dir)
    Sinks.sqlFileSink(sqlDir)(net, 0L)
    val tables = net.select("schema_name", "table_name").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    net.unpersist()
    SqlApply.applyAndReadState(spark, sqlDir, tables,
        dbName = s"graft_mq_$tag")
      .groupBy("schema_name", "table_name")
      .agg(count(lit(1)).as("n_rows"), sum(col("pk")).as("sum_pk"),
        sum(col("final_val").cast("decimal(18,6)")).cast("double").as("sum_val"))
  }

  def all: Seq[GateQuery] = Seq(
    canal, debezium, maxwell, openProtocol, csv, canalRoundtrip, avroSchemas,
    avroBinary, craftRoundtrip, simple, kafkaRecord, pulsarRecord, rowcodecV2,
    debeziumRoundtrip, maxwellRoundtrip, openRoundtrip, csvRoundtrip,
    simpleRoundtrip, simpleAvroRoundtrip, avroEvolution, avroGlue,
    openBatchRoundtrip,
    integrity, canalProtoRoundtrip, mqConsumer, compressedMessages)
}
