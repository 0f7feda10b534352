package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Wire-format encoders/decoders (SURVEY.md §2.7 E1-E8). tiflow implements
 * each codec as a Go struct walking rows field-by-field
 * (pkg/sink/codec/{open,canal,debezium,maxwell,csv}/...); Spark-first the
 * envelope→message transform is ONE `to_json(struct(...))` column
 * expression — codegen'd, vectorized, zero per-row interpretation — and
 * decoding is `from_json`. Key order is the struct field order; null fields
 * are emitted explicitly (`ignoreNullFields=false`) for cross-engine parity.
 *
 * Craft (E8) lives in [[graft.functions.CraftCodec]] (binary frame needs a
 * byte-level kernel, not JSON columns); Avro binary (E3) in
 * [[graft.functions.AvroBinary]]. [[avroSchema]] covers E3's
 * schema-generation half.
 */
object Codecs {

  private val jsonOpts = Map("ignoreNullFields" -> "false")

  private def payloadStruct(pk: Column, value: Column, etype: Column): Column =
    struct(pk.as("pk"), value.as("val"), etype.as("etype"))

  /** E2 — Canal-JSON envelope (reference
    * pkg/sink/codec/canal/canal_json_row_event_encoder.go:83-380). `es` is
    * the commit ts; `ts` is emission time in tiflow — pinned to commit ts
    * here for determinism. */
  def canalJson(df: DataFrame): Column = {
    val canalType = when(col("op") === "I", "INSERT")
      .when(col("op") === "U", "UPDATE").otherwise("DELETE")
    // DELETE carries the before image in `data` (canal semantics);
    // `old` is populated only for UPDATE.
    val dataImg = when(col("op") === "D",
      array(payloadStruct(col("pk"), col("val_before"), col("etype"))))
      .otherwise(array(payloadStruct(col("pk"), col("val_after"), col("etype"))))
    val oldImg = when(col("op") === "U",
      array(payloadStruct(col("pk"), col("val_before"), col("etype"))))
      .otherwise(lit(null).cast(ArrayType(new StructType()
        .add("pk", LongType).add("val", DoubleType).add("etype", StringType))))
    to_json(struct(
      lit(0L).as("id"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      array(lit("pk")).as("pkNames"),
      lit(false).as("isDdl"),
      canalType.as("type"),
      col("commit_ts").as("es"),
      col("commit_ts").as("ts"),
      lit("").as("sql"),
      struct(lit(-5).as("pk"), lit(8).as("val"), lit(12).as("etype")).as("sqlType"),
      struct(lit("bigint").as("pk"), lit("double").as("val"),
        lit("varchar").as("etype")).as("mysqlType"),
      dataImg.as("data"),
      oldImg.as("old")), jsonOpts)
  }

  /** Canal event-type string for a parsed DDL statement (reference
    * canal_entry.go:255-286 convertDdlEventType, mirroring canal's
    * DruidDdlParser): only CREATE TABLE is CREATE and only DROP TABLE is
    * ERASE — schema-level DDLs (CREATE/DROP DATABASE → ActionCreateSchema/
    * ActionDropSchema) classify QUERY, canal_entry.go:257-262. */
  def canalDdlType(stmt: graft.core.DdlParser.Stmt): String = {
    import graft.core.DdlParser._
    stmt match {
      case _: CreateTable => "CREATE"
      case _: CreateDatabase | _: DropDatabase => "QUERY"
      case _: DropTable => "ERASE"
      case _: RenameTable => "RENAME"
      case _: TruncateTable => "TRUNCATE"
      case AlterIndex(_, _, true, _, _) => "CINDEX"
      case AlterIndex(_, _, false, _, _) => "DINDEX"
      case _: AlterTable => "ALTER"
    }
  }

  /** E2 (DDL half) — Canal-JSON DDL message: `isDdl=true`, the classified
    * type, and the (re-rendered) statement in `sql`; `data`/`old` are null
    * (reference canal_json_row_event_encoder.go DDL branch). Expects
    * columns (schema_name, table_name, commit_ts, ddl_type, ddl_sql). */
  def canalJsonDdl(df: DataFrame): Column = {
    val imgType = ArrayType(new StructType()
      .add("pk", LongType).add("val", DoubleType).add("etype", StringType))
    to_json(struct(
      lit(0L).as("id"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      lit(null).cast(ArrayType(StringType)).as("pkNames"),
      lit(true).as("isDdl"),
      col("ddl_type").as("type"),
      col("commit_ts").as("es"),
      col("commit_ts").as("ts"),
      col("ddl_sql").as("sql"),
      lit(null).cast(new StructType()
        .add("pk", IntegerType).add("val", IntegerType).add("etype", IntegerType))
        .as("sqlType"),
      lit(null).cast(new StructType()
        .add("pk", StringType).add("val", StringType).add("etype", StringType))
        .as("mysqlType"),
      lit(null).cast(imgType).as("data"),
      lit(null).cast(imgType).as("old")), jsonOpts)
  }

  /** Debezium schema-change type for a parsed DDL statement (reference
    * pkg/sink/codec/debezium/codec.go EncodeDDLEvent's changeType switch:
    * creates → CREATE, alters/renames/index changes → ALTER,
    * drops/truncates → DROP). */
  def debeziumDdlType(stmt: graft.core.DdlParser.Stmt): String = {
    import graft.core.DdlParser._
    stmt match {
      case _: CreateTable | _: CreateDatabase => "CREATE"
      case _: AlterTable | _: RenameTable => "ALTER"
      case AlterIndex(_, _, true, _, _) => "ALTER" // add index / add pk
      // the reference's switch is asymmetric: ActionDropIndex → DROP but
      // ActionDropPrimaryKey → ALTER
      case AlterIndex(_, _, false, name, _) =>
        if (name == "PRIMARY") "ALTER" else "DROP"
      case _: DropTable | _: DropDatabase | _: TruncateTable => "DROP"
    }
  }

  /** E5 (DDL half) — Debezium schema-change message pair (reference
    * EncodeDDLEvent, pkg/sink/codec/debezium/codec.go:1154+): the key
    * carries the database name; the value carries source metadata, the DDL
    * text, and a `tableChanges` entry classified CREATE/ALTER/DROP —
    * empty for TRUNCATE and database-level statements, and for a RENAME
    * the change id concatenates old and new identifiers. Deterministic:
    * ts_ms fields carry the commit ts (no wall clock in a gate-checked
    * render). Expects (schema_name, table_name, commit_ts, change_type,
    * ddl_sql, to_schema, to_table, no_changes); table_name null for
    * database-level statements, to_schema/to_table null except RENAME.
    * Returns (key_json, value_json). */
  def debeziumDdl(df: DataFrame, clusterId: String = "graft"): (Column, Column) = {
    val key = to_json(struct(
      struct(col("schema_name").as("databaseName")).as("payload"),
      struct(lit("struct").as("type"),
        lit("io.debezium.connector.mysql.SchemaChangeKey").as("name"),
        lit(false).as("optional"), lit(1).as("version")).as("schema")), jsonOpts)
    val changeId = when(col("to_table").isNotNull,
        concat(lit("\""), col("schema_name"), lit("\".\""), col("table_name"),
          lit("\",\""), col("to_schema"), lit("\".\""), col("to_table"), lit("\"")))
      .otherwise(concat(lit("\""), col("schema_name"), lit("\".\""),
        col("table_name"), lit("\"")))
    val changes = when(col("table_name").isNull || col("no_changes"),
        array().cast(ArrayType(new StructType()
          .add("type", StringType).add("id", StringType))))
      .otherwise(array(struct(col("change_type").as("type"), changeId.as("id"))))
    val value = to_json(struct(struct(
      struct(
        lit("2.4.0.Final").as("version"), lit("graft").as("connector"),
        lit(clusterId).as("name"), col("commit_ts").as("ts_ms"),
        lit("false").as("snapshot"),
        coalesce(col("schema_name"), lit("")).as("db"),
        coalesce(col("table_name"), lit("")).as("table"),
        lit(0L).as("server_id"), lit(null).cast(StringType).as("gtid"),
        lit("").as("file"), lit(0L).as("pos"), lit(0L).as("row"),
        lit(0L).as("thread"), lit(null).cast(StringType).as("query"),
        col("commit_ts").as("commit_ts"), lit(clusterId).as("cluster_id"))
        .as("source"),
      col("commit_ts").as("ts_ms"),
      col("schema_name").as("databaseName"),
      lit(null).cast(StringType).as("schemaName"),
      col("ddl_sql").as("ddl"),
      changes.as("tableChanges")).as("payload")), jsonOpts)
    (key, value)
  }

  /** Maxwell DDL type for a parsed statement (reference
    * pkg/sink/codec/maxwell/maxwell_message.go ddlToMaxwellType: create /
    * drop table, the alter action range — including rename and truncate —
    * and database-level create/drop). */
  def maxwellDdlType(stmt: graft.core.DdlParser.Stmt): String = {
    import graft.core.DdlParser._
    stmt match {
      case _: CreateTable => "table-create"
      case _: DropTable => "table-drop"
      case _: AlterTable | _: AlterIndex | _: RenameTable |
           _: TruncateTable => "table-alter"
      case _: CreateDatabase => "database-create"
      case _: DropDatabase => "database-drop"
    }
  }

  /** Simple-protocol DDL type taxonomy (reference
    * pkg/sink/codec/simple/message.go getDDLType:78-99 — index DDL splits
    * into CINDEX/DINDEX, drop table is ERASE, database-level and anything
    * unclassified is QUERY). */
  def simpleDdlType(stmt: graft.core.DdlParser.Stmt): String = {
    import graft.core.DdlParser._
    stmt match {
      case _: CreateTable => "CREATE"
      case _: RenameTable => "RENAME"
      case ai: AlterIndex => if (ai.addIndex) "CINDEX" else "DINDEX"
      case _: DropTable => "ERASE"
      case _: TruncateTable => "TRUNCATE"
      case _: AlterTable => "ALTER"
      case _ => "QUERY"
    }
  }

  /** Simple-protocol column dataType name for a Spark type (the MySQL
    * type names the simple TableSchema carries). */
  def simpleColType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampType => "DATETIME"
    case DateType => "DATE"
    case _ => "VARCHAR"
  }

  /** E7 (DDL half) — simple-protocol DDL message (reference
    * simple/message.go newDDLMessage:524-547 + encoder.go): version, the
    * classified type, commitTs, the SQL text, and tableSchema /
    * preTableSchema built from the registry columns in force after/before
    * the DDL. A dropped table has no post-schema (ERASE renders
    * `tableSchema` absent); a created table has no pre-schema — the
    * reference's nil TableInfo/PreTableInfo cases. Expects (schema_name,
    * table_name, commit_ts, ddl_kind, ddl_sql, def_cols, old_cols) where
    * the col arrays are struct(name, dataType, nullable). */
  def simpleDdl(df: DataFrame): Column = {
    def ts(colsCol: Column) = struct(
      col("schema_name").as("database"),
      col("table_name").as("table"),
      colsCol.as("columns"))
    to_json(struct(
      lit(1).as("version"),
      col("ddl_kind").as("type"),
      col("commit_ts").as("commitTs"),
      col("ddl_sql").as("sql"),
      when(size(col("def_cols")) > 0, ts(col("def_cols"))).as("tableSchema"),
      when(size(col("old_cols")) > 0, ts(col("old_cols")))
        .as("preTableSchema")), jsonOpts)
  }

  /** TiDB DDL action code for a parsed statement (the public
    * parser/model ActionType enumeration the open protocol's DDL value
    * carries verbatim: CreateSchema=1, DropSchema=2, CreateTable=3,
    * DropTable=4, AddColumn=5, DropColumn=6, AddIndex=7, DropIndex=8,
    * TruncateTable=11, ModifyColumn=12, RenameTable=14). Column rename
    * rides the modify-column code — the row-schema effect is the same. */
  def tidbActionType(stmt: graft.core.DdlParser.Stmt): Int = {
    import graft.core.DdlParser._
    import graft.core.SchemaRegistry
    stmt match {
      case _: CreateDatabase => 1
      case _: DropDatabase => 2
      case _: CreateTable => 3
      case _: DropTable => 4
      case AlterTable(_, _, _: SchemaRegistry.AddColumn) => 5
      case AlterTable(_, _, _: SchemaRegistry.DropColumn) => 6
      case ai: AlterIndex => if (ai.addIndex) 7 else 8
      case _: TruncateTable => 11
      case _: AlterTable => 12 // modify / rename column
      case _: RenameTable => 14
    }
  }

  /** Canal-JSON watermark message (reference canal_json_row_event_encoder
    * .go:335-357 newJSONMessageForDML watermark path: a data-less
    * JSONMessage with type=TIDB_WATERMARK and the ts in the `_tidb`
    * extension block — only emitted with the TiDB extension enabled).
    * Expects a `wm_ts` column. */
  def canalJsonWatermark(df: DataFrame): Column =
    to_json(struct(
      lit(0L).as("id"),
      lit(false).as("isDdl"),
      lit("TIDB_WATERMARK").as("type"),
      col("wm_ts").as("es"),
      struct(col("wm_ts").as("watermarkTs")).as("_tidb")), jsonOpts)

  /** Open-protocol resolved (checkpoint) message key: `{ts, t: 3}` —
    * MessageTypeResolved (reference open_protocol_message.go
    * newResolvedMessage:115-120, cdc/model/sink.go:41-52). Value is
    * empty for resolved messages. Expects a `wm_ts` column. */
  def openResolvedKey(df: DataFrame): Column =
    to_json(struct(
      col("wm_ts").as("ts"),
      lit(3).as("t")), jsonOpts)

  /** E1 (DDL half) — open-protocol DDL message key (reference
    * open_protocol_message.go ddlEventToMsg:235-247: ts/schema/table with
    * type=2 = MessageTypeDDL from cdc/model/sink.go:41-52). Expects
    * (schema_name, table_name, commit_ts). */
  def openDdlKey(df: DataFrame): Column =
    to_json(struct(
      col("commit_ts").as("ts"),
      col("schema_name").as("scm"),
      col("table_name").as("tbl"),
      lit(2).as("t")), jsonOpts)

  /** Open-protocol DDL message value: `{"q": sql, "t": actionType}`
    * (messageDDL, open_protocol_message.go:101-113). Expects (ddl_sql,
    * action_type). */
  def openDdlValue(df: DataFrame): Column =
    to_json(struct(
      col("ddl_sql").as("q"),
      col("action_type").as("t")), jsonOpts)

  /** Maxwell column-type name for a Spark type (reference
    * columnToMaxwellType, maxwell_message.go). */
  def maxwellColType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case BooleanType | IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case _: DecimalType => "decimal"
    case TimestampType => "datetime"
    case DateType => "date"
    case _ => "string"
  }

  /** E6 (DDL half) — Maxwell DDL message (reference ddlMaxwellMessage,
    * maxwell_message.go:174+): classified type, the statement text, and
    * `old`/`def` table structures whose column lists come from the schema
    * registry versions in force before/after the DDL (the reference builds
    * them from PreTableInfo/TableInfo). Expects (schema_name, table_name,
    * commit_ts, ddl_kind, ddl_sql, def_cols, old_cols) where the col lists
    * are array<struct<name,type>>. */
  def maxwellDdl(df: DataFrame): Column = {
    val tblStruct = (cols: Column) => struct(
      col("schema_name").as("database"), col("table_name").as("table"),
      cols.as("columns"),
      lit(null).cast(ArrayType(StringType)).as("primary-key"))
    to_json(struct(
      col("ddl_kind").as("type"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      tblStruct(col("old_cols")).as("old"),
      tblStruct(col("def_cols")).as("def"),
      col("commit_ts").as("ts"),
      col("ddl_sql").as("sql")), jsonOpts)
  }

  /** E5 — Debezium-style envelope (reference
    * pkg/sink/codec/debezium/codec.go). */
  def debezium(df: DataFrame, connectorName: String = "graft"): Column = {
    val op = when(col("op") === "I", "c").when(col("op") === "U", "u").otherwise("d")
    val nullImg = lit(null).cast(new StructType()
      .add("pk", LongType).add("val", DoubleType).add("etype", StringType))
    to_json(struct(
      when(col("op") =!= "I",
        payloadStruct(col("pk"), col("val_before"), col("etype")))
        .otherwise(nullImg).as("before"),
      when(col("op") =!= "D",
        payloadStruct(col("pk"), col("val_after"), col("etype")))
        .otherwise(nullImg).as("after"),
      struct(
        lit(connectorName).as("name"),
        col("commit_ts").as("ts_ms"),
        col("schema_name").as("db"),
        col("table_name").as("table")).as("source"),
      op.as("op"),
      col("commit_ts").as("ts_ms")), jsonOpts)
  }

  /** E6 — Maxwell envelope (reference
    * pkg/sink/codec/maxwell/maxwell_message.go). */
  def maxwell(df: DataFrame): Column = {
    val mType = when(col("op") === "I", "insert")
      .when(col("op") === "U", "update").otherwise("delete")
    val nullImg = lit(null).cast(new StructType()
      .add("pk", LongType).add("val", DoubleType).add("etype", StringType))
    to_json(struct(
      col("schema_name").as("database"),
      col("table_name").as("table"),
      mType.as("type"),
      col("commit_ts").as("ts"),
      col("start_ts").as("xid"),
      when(col("op") === "D",
        payloadStruct(col("pk"), col("val_before"), col("etype")))
        .otherwise(payloadStruct(col("pk"), col("val_after"), col("etype"))).as("data"),
      when(col("op") === "U",
        payloadStruct(col("pk"), col("val_before"), col("etype")))
        .otherwise(nullImg).as("old")), jsonOpts)
  }

  /** E1 — Open Protocol key/value pair (reference
    * pkg/sink/codec/open/open_protocol_encoder.go:81-280). Emits two
    * columns; `t`=1 is the row-message type. */
  def openProtocolKey(df: DataFrame): Column =
    to_json(struct(
      col("commit_ts").as("ts"),
      col("schema_name").as("scm"),
      col("table_name").as("tbl"),
      lit(1).as("t")), jsonOpts)

  def openProtocolValue(df: DataFrame): Column = {
    def img(value: Column) = struct(
      struct(lit(8).as("t"), col("pk").as("v")).as("pk"),
      struct(lit(5).as("t"), value.as("v")).as("val"),
      struct(lit(15).as("t"), col("etype").as("v")).as("etype"))
    val u = when(col("op") =!= "D", img(col("val_after")))
      .otherwise(lit(null).cast(new StructType()
        .add("pk", new StructType().add("t", IntegerType).add("v", LongType))
        .add("val", new StructType().add("t", IntegerType).add("v", DoubleType))
        .add("etype", new StructType().add("t", IntegerType).add("v", StringType))))
    val d = when(col("op") === "D", img(col("val_before")))
      .otherwise(lit(null).cast(new StructType()
        .add("pk", new StructType().add("t", IntegerType).add("v", LongType))
        .add("val", new StructType().add("t", IntegerType).add("v", DoubleType))
        .add("etype", new StructType().add("t", IntegerType).add("v", StringType))))
    to_json(struct(u.as("u"), d.as("d")), jsonOpts)
  }

  /** C5 (downgrade half) — handle-key-only value: the open-protocol image
    * reduced to the handle columns (pk). */
  def openProtocolHandleOnlyValue(df: DataFrame): Column = {
    def img = struct(struct(lit(8).as("t"), col("pk").as("v")).as("pk"))
    val nullImg = lit(null).cast(new StructType()
      .add("pk", new StructType().add("t", IntegerType).add("v", LongType)))
    to_json(struct(
      when(col("op") =!= "D", img).otherwise(nullImg).as("u"),
      when(col("op") === "D", img).otherwise(nullImg).as("d")), jsonOpts)
  }

  /**
   * C5 — large-message handle-key-only downgrade (reference
   * pkg/sink/codec/open/open_protocol_encoder.go:43-80,
   * internal/message_key.go:32 `ohk`): when the full value message exceeds
   * `maxBytes`, re-encode carrying ONLY the handle key columns and flag the
   * message key with `"ohk":true` so consumers know to fetch the full row
   * out of band. Returns (key, value) columns.
   */
  def openProtocolWithDowngrade(df: DataFrame, maxBytes: Int): (Column, Column) = {
    val full = openProtocolValue(df)
    val downgraded = length(full) > maxBytes
    val key = when(downgraded,
      to_json(struct(
        col("commit_ts").as("ts"),
        col("schema_name").as("scm"),
        col("table_name").as("tbl"),
        lit(1).as("t"),
        lit(true).as("ohk")), jsonOpts))
      .otherwise(openProtocolKey(df))
    val value = when(downgraded, openProtocolHandleOnlyValue(df)).otherwise(full)
    (key, value)
  }

  /**
   * Upstream snapshot service for consumer-side handle-key-only
   * reassembly (reference canal_json_decoder.go:244-300 queries TiDB at
   * commitTs / commitTs−1; here the envelope's own version chain IS the
   * snapshot source): committed state per (pk, commit_ts) is the LAST
   * event in that ts (later seq shadows earlier — the multi-version
   * collapse a real snapshot read performs), `v` is its after image
   * (NULL once deleted), and `v_prev` is the prior chain state — the
   * commitTs−1 snapshot. Two window passes over the envelope; the as-of
   * lookup then degenerates to key-equality join on (pk, ts).
   */
  def snapshotChain(env: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wTs = Window.partitionBy(col("pk"), col("commit_ts"))
      .orderBy(col("seq").desc)
    val wChain = Window.partitionBy(col("pk")).orderBy(col("commit_ts"))
    env
      .withColumn("rn", row_number().over(wTs)).filter(col("rn") === 1)
      .withColumn("v", when(col("op") === "D", lit(null).cast("double"))
        .otherwise(col("val_after")))
      .withColumn("v_prev", lag(col("v"), 1).over(wChain))
      .select(col("pk"), col("commit_ts").as("ts"), col("v"), col("v_prev"))
  }

  /**
   * C5 (claim-check half) — the OTHER large-message path (reference
   * pkg/sink/kafka/claimcheck/claim_check.go + open_protocol_encoder.go:
   * 291-330): the oversized message's FULL (key, value) pair is wrapped as
   * `{"key":…,"value":…}` with base64-encoded bytes (common/message.go
   * ClaimCheckMessage — Go json.Marshal renders []byte as base64) and
   * side-written to `<prefix>/<name>.json`; the Kafka record instead
   * carries the handle-key-only value plus a key gaining
   * `"ccl":"<location>"` (internal/message_key.go:35) so consumers fetch
   * the full row out of band.
   *
   * DEVIATION: file names are content-addressed (md5 of key+value) instead
   * of the reference's UUIDv4 — replayed at-least-once batches then
   * overwrite their own objects idempotently, which UUIDs cannot.
   *
   * Returns (key, value, location, payload): location/payload are NULL for
   * inline messages; [[graft.streaming.ClaimCheckSink]] performs the
   * side-write.
   */
  def openProtocolWithClaimCheck(df: DataFrame, maxBytes: Int,
                                 storagePrefix: String)
      : (Column, Column, Column, Column) = {
    val full = openProtocolValue(df)
    val plainKey = openProtocolKey(df)
    val big = length(full) > maxBytes
    val fileName = concat(md5(concat(plainKey, full)), lit(".json"))
    val location = concat(lit(storagePrefix.stripSuffix("/") + "/"), fileName)
    val key = when(big,
      to_json(struct(
        col("commit_ts").as("ts"),
        col("schema_name").as("scm"),
        col("table_name").as("tbl"),
        lit(1).as("t"),
        location.as("ccl")), jsonOpts))
      .otherwise(plainKey)
    val value = when(big, openProtocolHandleOnlyValue(df)).otherwise(full)
    // Spark's base64() wraps long output in MIME CRLFs; strip to the plain
    // RFC 4648 form Go's json.Marshal (and DuckDB's to_base64) produce.
    def b64(c: Column) = regexp_replace(base64(c), "[\\r\\n]", "")
    val payload = when(big, concat(
      lit("{\"key\":\""), b64(encode(plainKey, "UTF-8")),
      lit("\",\"value\":\""), b64(encode(full, "UTF-8")), lit("\"}")))
    (key, value, when(big, location), payload)
  }

  /**
   * E4 — CSV line with the storage-sink meta columns (reference
   * pkg/sink/codec/csv/csv_message.go:105-518): op flag, schema, table,
   * commit ts, then payload. Strings are double-quoted with embedded quotes
   * doubled; NULL renders as \N (MySQL convention).
   */
  def csvQuote(c: Column): Column =
    when(c.isNull, "\\N")
      .otherwise(concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")))

  /** NULL numerics render as \N too — and must be pre-coalesced because
    * concat_ws silently DROPS null slots, which would shift every later
    * CSV column left. */
  def csvNum(c: Column): Column =
    when(c.isNull, "\\N").otherwise(c.cast("string"))

  def csvLine(df: DataFrame): Column =
    concat_ws(",",
      csvQuote(col("op")),
      csvQuote(col("schema_name")),
      csvQuote(col("table_name")),
      csvNum(col("commit_ts")),
      csvNum(col("pk")),
      csvNum(when(col("op") === "D", col("val_before")).otherwise(col("val_after"))),
      csvQuote(col("etype")))

  /**
   * E4 (config surface) — the reference's CSV options
   * (pkg/config/sink.go:249-276: delimiter, quote — possibly empty for
   * unquoted mode with backslash escaping — null literal, binary
   * encoding). Mirrors csv_message.go:197-210: quotes double embedded
   * quote chars; unquoted mode backslash-escapes delimiter/backslash/CR/LF.
   */
  final case class CsvConfig(delimiter: String = ",", quote: String = "\"",
                             nullLiteral: String = "\\N",
                             binaryBase64: Boolean = true)

  def csvQuoteWith(cfg: CsvConfig)(c: Column): Column =
    if (cfg.quote.nonEmpty)
      when(c.isNull, cfg.nullLiteral)
        .otherwise(concat(lit(cfg.quote),
          regexp_replace(c, java.util.regex.Pattern.quote(cfg.quote),
            cfg.quote + cfg.quote),
          lit(cfg.quote)))
    else {
      // unquoted mode: escape backslash first, then delimiter and newlines
      val esc = Seq("\\" -> "\\\\", cfg.delimiter -> ("\\" + cfg.delimiter),
        "\r" -> "\\r", "\n" -> "\\n")
        .foldLeft(c) { case (e, (from, to)) =>
          regexp_replace(e, java.util.regex.Pattern.quote(from),
            java.util.regex.Matcher.quoteReplacement(to))
        }
      when(c.isNull, cfg.nullLiteral).otherwise(esc)
    }

  def csvNumWith(cfg: CsvConfig)(c: Column): Column =
    when(c.isNull, cfg.nullLiteral).otherwise(c.cast("string"))

  def csvBinaryWith(cfg: CsvConfig)(c: Column): Column =
    when(c.isNull, cfg.nullLiteral)
      .otherwise(if (cfg.binaryBase64) graft.core.MySqlTypes.b64(c)
      else lower(hex(c)))

  def csvLineWith(df: DataFrame, cfg: CsvConfig): Column =
    concat_ws(cfg.delimiter,
      csvQuoteWith(cfg)(col("op")),
      csvQuoteWith(cfg)(col("schema_name")),
      csvQuoteWith(cfg)(col("table_name")),
      csvNumWith(cfg)(col("commit_ts")),
      csvNumWith(cfg)(col("pk")),
      csvNumWith(cfg)(when(col("op") === "D", col("val_before"))
        .otherwise(col("val_after"))),
      csvQuoteWith(cfg)(col("etype")))

  /** Canal-JSON decoder: the schema mirrors [[canalJson]]; round-trips
    * every emitted field (reference decoder:
    * pkg/sink/codec/canal/canal_json_decoder.go). */
  val canalSchema: StructType = {
    val img = ArrayType(new StructType()
      .add("pk", LongType).add("val", DoubleType).add("etype", StringType))
    new StructType()
      .add("id", LongType).add("database", StringType).add("table", StringType)
      .add("pkNames", ArrayType(StringType)).add("isDdl", BooleanType)
      .add("type", StringType).add("es", LongType).add("ts", LongType)
      .add("sql", StringType)
      .add("sqlType", new StructType()
        .add("pk", IntegerType).add("val", IntegerType).add("etype", IntegerType))
      .add("mysqlType", new StructType()
        .add("pk", StringType).add("val", StringType).add("etype", StringType))
      .add("data", img).add("old", img)
  }

  def canalDecode(json: Column): Column = from_json(json, canalSchema)

  /**
   * E7 — Simple protocol (pkg/sink/codec/simple/encoder.go): JSON envelope
   * with an explicit schema lifecycle — a BOOTSTRAP message carrying the
   * table schema precedes row messages, which then reference it by
   * (database, table, schemaVersion) instead of embedding types.
   */
  def simpleBootstrap(df: DataFrame, schemaVersion: Int): Column =
    to_json(struct(
      lit("BOOTSTRAP").as("type"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      lit(schemaVersion).as("schemaVersion"),
      array(
        struct(lit("pk").as("name"), lit("BIGINT").as("dataType"),
          lit(false).as("nullable")),
        struct(lit("val").as("name"), lit("DOUBLE").as("dataType"),
          lit(true).as("nullable")),
        struct(lit("etype").as("name"), lit("VARCHAR").as("dataType"),
          lit(true).as("nullable"))).as("columns")), jsonOpts)

  def simpleRow(df: DataFrame, schemaVersion: Int): Column = {
    val sType = when(col("op") === "I", "INSERT")
      .when(col("op") === "U", "UPDATE").otherwise("DELETE")
    val nullImg = lit(null).cast(new StructType()
      .add("pk", LongType).add("val", DoubleType).add("etype", StringType))
    to_json(struct(
      sType.as("type"),
      col("commit_ts").as("commitTs"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      lit(schemaVersion).as("schemaVersion"),
      when(col("op") =!= "D",
        payloadStruct(col("pk"), col("val_after"), col("etype")))
        .otherwise(nullImg).as("data"),
      when(col("op") =!= "I",
        payloadStruct(col("pk"), col("val_before"), col("etype")))
        .otherwise(nullImg).as("old")), jsonOpts)
  }

  // ------------------------------------------------------------------
  // Decoders (consumer side). The reference ships a RowEventDecoder per
  // encoder (pkg/sink/codec/debezium/decoder.go, maxwell has none upstream
  // but the mq_protocol_tests replay framework covers it,
  // open/open_protocol_decoder.go, csv/csv_decoder.go, simple/decoder.go);
  // Spark-first each is a from_json with the encoder's mirror schema (or a
  // codegen'd regexp parse for CSV) — a consumer migrating between
  // protocols round-trips through the same envelope.
  // ------------------------------------------------------------------

  private val imgStructType = new StructType()
    .add("pk", LongType).add("val", DoubleType).add("etype", StringType)

  /** E5 decoder — mirror of [[debezium]] (reference
    * pkg/sink/codec/debezium/decoder.go). op is fully recoverable
    * (c/u/d); before/after images map back to val_before/val_after. */
  val debeziumSchema: StructType = new StructType()
    .add("before", imgStructType).add("after", imgStructType)
    .add("source", new StructType()
      .add("name", StringType).add("ts_ms", LongType)
      .add("db", StringType).add("table", StringType))
    .add("op", StringType).add("ts_ms", LongType)

  def debeziumDecode(json: Column): Column = from_json(json, debeziumSchema)

  /** Decoded Debezium message → canonical envelope struct
    * (op, commit_ts, schema_name, table_name, pk, val_before, val_after,
    * etype) — the RowChangedEvent reconstruction the reference decoder
    * performs field-by-field. */
  def debeziumToEnvelope(m: Column): Column = struct(
    when(m.getField("op") === "c", "I")
      .when(m.getField("op") === "u", "U").otherwise("D").as("op"),
    m.getField("source").getField("ts_ms").as("commit_ts"),
    m.getField("source").getField("db").as("schema_name"),
    m.getField("source").getField("table").as("table_name"),
    coalesce(m.getField("after").getField("pk"),
      m.getField("before").getField("pk")).as("pk"),
    m.getField("before").getField("val").as("val_before"),
    m.getField("after").getField("val").as("val_after"),
    coalesce(m.getField("after").getField("etype"),
      m.getField("before").getField("etype")).as("etype"))

  /** E6 decoder — mirror of [[maxwell]]. insert/update/delete recover
    * I/U/D; `data` is the delete image for deletes (maxwell semantics). */
  val maxwellSchema: StructType = new StructType()
    .add("database", StringType).add("table", StringType)
    .add("type", StringType).add("ts", LongType).add("xid", LongType)
    .add("data", imgStructType).add("old", imgStructType)

  def maxwellDecode(json: Column): Column = from_json(json, maxwellSchema)

  def maxwellToEnvelope(m: Column): Column = struct(
    when(m.getField("type") === "insert", "I")
      .when(m.getField("type") === "update", "U").otherwise("D").as("op"),
    m.getField("ts").as("commit_ts"),
    m.getField("xid").as("start_ts"),
    m.getField("database").as("schema_name"),
    m.getField("table").as("table_name"),
    m.getField("data").getField("pk").as("pk"),
    when(m.getField("type") === "delete", m.getField("data").getField("val"))
      .otherwise(m.getField("old").getField("val")).as("val_before"),
    when(m.getField("type") === "delete",
      lit(null).cast(DoubleType))
      .otherwise(m.getField("data").getField("val")).as("val_after"),
    m.getField("data").getField("etype").as("etype"))

  /** E1 decoder — mirror of [[openProtocolKey]]/[[openProtocolValue]]
    * (reference pkg/sink/codec/open/open_protocol_decoder.go). The
    * encoder runs in old-value-disabled mode (no "p" pre-image block), so
    * like the reference decoder in that mode, a u-only message decodes as
    * an upsert ("I") and a d message as a delete — U is not
    * distinguishable on the wire by design. */
  val openKeySchema: StructType = new StructType()
    .add("ts", LongType).add("scm", StringType).add("tbl", StringType)
    .add("t", IntegerType).add("ohk", BooleanType).add("ccl", StringType)

  private val openImgType = new StructType()
    .add("pk", new StructType().add("t", IntegerType).add("v", LongType))
    .add("val", new StructType().add("t", IntegerType).add("v", DoubleType))
    .add("etype", new StructType().add("t", IntegerType).add("v", StringType))

  val openValueSchema: StructType =
    new StructType().add("u", openImgType).add("d", openImgType)

  def openDecodeKey(json: Column): Column = from_json(json, openKeySchema)
  def openDecodeValue(json: Column): Column = from_json(json, openValueSchema)

  def openToEnvelope(key: Column, value: Column): Column = {
    val img = coalesce(value.getField("d"), value.getField("u"))
    struct(
      when(value.getField("d").isNotNull, "D").otherwise("I").as("op"),
      key.getField("ts").as("commit_ts"),
      key.getField("scm").as("schema_name"),
      key.getField("tbl").as("tbl_name"),
      img.getField("pk").getField("v").as("pk"),
      img.getField("val").getField("v").as("val"),
      img.getField("etype").getField("v").as("etype"))
  }

  /** E7 decoder — mirror of [[simpleRow]] (reference
    * pkg/sink/codec/simple/decoder.go). data+old ⇒ U, data-only ⇒ I,
    * old-only ⇒ D — op is fully recoverable. BOOTSTRAP messages decode
    * with row fields null (consumers dispatch on `type`). */
  val simpleSchema: StructType = new StructType()
    .add("type", StringType).add("commitTs", LongType)
    .add("database", StringType).add("table", StringType)
    .add("schemaVersion", IntegerType)
    .add("data", imgStructType).add("old", imgStructType)

  def simpleDecode(json: Column): Column = from_json(json, simpleSchema)

  def simpleToEnvelope(m: Column): Column = struct(
    when(m.getField("data").isNotNull && m.getField("old").isNotNull, "U")
      .when(m.getField("data").isNotNull, "I").otherwise("D").as("op"),
    m.getField("commitTs").as("commit_ts"),
    m.getField("database").as("schema_name"),
    m.getField("table").as("table_name"),
    coalesce(m.getField("data").getField("pk"),
      m.getField("old").getField("pk")).as("pk"),
    m.getField("old").getField("val").as("val_before"),
    m.getField("data").getField("val").as("val_after"),
    coalesce(m.getField("data").getField("etype"),
      m.getField("old").getField("etype")).as("etype"))

  /** E4 decoder — parse a [[csvLine]] back to envelope fields (reference
    * pkg/sink/codec/csv/csv_decoder.go): ONE `from_csv` parse per line
    * (quote-doubling via escape='"', `\N` as the null literal), matching
    * the encoder's quoting exactly. Map-only and linear. */
  val csvDecodeSchema: StructType = new StructType()
    .add("op", StringType).add("schema_name", StringType)
    .add("table_name", StringType).add("commit_ts", LongType)
    .add("pk", LongType).add("val", DoubleType).add("etype", StringType)

  def csvDecode(line: Column): Column =
    from_csv(line, csvDecodeSchema, Map(
      "sep" -> ",", "quote" -> "\"", "escape" -> "\"", "nullValue" -> "\\N"))

  // ------------------------------------------------------------------
  // Row integrity (reference pkg/integrity: integrity.check-level =
  // "correctness" appends a row checksum to encoded events — canal-json
  // carries it in the `_tidb` extension block, avro/open in a checksum
  // field — and consumers recompute it over the decoded columns to catch
  // wire/middleware corruption). Checksum here is the engine's portable
  // 60-bit digest folded to 32 bits (the reference uses CRC32 over
  // little-endian column encodings; DuckDB lacks crc32, so the oracle
  // twin keeps cross-engine verifiability — a documented deviation).
  // ------------------------------------------------------------------

  /** Row checksum over the carried image, [0, 2^32). Each field renders
    * with a presence prefix — "0" for NULL, "1"+value otherwise — so a
    * NULL can never collide with any literal string (including "\N") and
    * a nulled-out field always changes the digest input. */
  private def checksumField(c: Column): Column =
    when(c.isNull, "0").otherwise(concat(lit("1"), c.cast("string")))

  def rowChecksum(pk: Column, value: Column, etype: Column): Column =
    checksumOverValues(Seq(pk, value, etype))

  /** Digest over any field list with presence prefixes (the generic form —
    * [[GenericCodecs]] drives it from a ColumnSpec schema). */
  private[operators] def checksumOverValues(vals: Seq[Column]): Column =
    pmod(graft.core.Hashing.portableLong(
      concat_ws("|", vals.map(checksumField): _*)), lit(4294967296L))

  /** Canal-JSON with the `_tidb` integrity extension block. */
  def canalJsonIntegrity(df: DataFrame): Column = {
    val img = when(col("op") === "D", col("val_before")).otherwise(col("val_after"))
    to_json(struct(
      col("schema_name").as("database"),
      col("table_name").as("table"),
      when(col("op") === "I", "INSERT").when(col("op") === "U", "UPDATE")
        .otherwise("DELETE").as("type"),
      col("commit_ts").as("es"),
      payloadStruct(col("pk"), img, col("etype")).as("data"),
      struct(col("commit_ts").as("commitTs"),
        rowChecksum(col("pk"), img, col("etype")).as("checksum"))
        .as("_tidb")), jsonOpts)
  }

  val canalIntegritySchema: StructType = new StructType()
    .add("database", StringType).add("table", StringType)
    .add("type", StringType).add("es", LongType)
    .add("data", imgStructType)
    .add("_tidb", new StructType()
      .add("commitTs", LongType).add("checksum", LongType))

  /** Consumer-side verification: recompute the checksum over the DECODED
    * columns and compare with the carried one — false flags corruption.
    * Messages so garbled they fail to parse (null decode / missing
    * checksum) verify FALSE, never null — a quarantine filter must catch
    * them, not pass them through. */
  def verifyIntegrity(decoded: Column): Column =
    coalesce(
      rowChecksum(decoded.getField("data").getField("pk"),
        decoded.getField("data").getField("val"),
        decoded.getField("data").getField("etype")) ===
        decoded.getField("_tidb").getField("checksum"),
      lit(false))

  /**
   * E3 (schema half) — Avro record schema generated per (schema, table)
   * version, mirroring columnToAvroSchema
   * (pkg/sink/codec/avro/avro.go:645+): name/namespace from the table,
   * one field per column with avro primitive mapping, nullable via union.
   */
  def avroSchema(database: String, table: String,
                 fields: Seq[(String, String, Boolean)]): String = {
    val fieldJson = fields.map { case (name, avroType, nullable) =>
      val t = if (nullable) s"""["null","$avroType"]""" else s""""$avroType""""
      s"""{"name":"$name","type":$t}"""
    }.mkString(",")
    s"""{"type":"record","name":"$table","namespace":"$database","fields":[$fieldJson]}"""
  }
}
