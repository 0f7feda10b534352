package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{ColumnSpec, MySqlTypes}

/**
 * Schema-GENERIC wire-format encoders (SURVEY.md §2.7 E1-E7, full-depth
 * form): every encoder is driven by a `Seq[ColumnSpec]` — any table the
 * schema registry (or a parsed CREATE TABLE) describes flows through
 * without touching codec code. The fixed-envelope encoders in [[Codecs]]
 * remain as the minimal demo path; these generate the struct, the Canal
 * sqlType/mysqlType maps, the Open-Protocol column wrappers, the Debezium
 * Connect schema block, and per-type value rendering from the spec.
 *
 * Expected input columns: op ("I"/"U"/"D"), commit_ts, start_ts,
 * schema_name, table_name, plus `a_<col>` / `b_<col>` image columns (whole
 * image NULL on the missing side of I/D).
 *
 * Everything is a pure column expression (one `to_json`/`concat` per
 * message) — codegen'd and vectorized; no per-row interpretation, no UDFs.
 */
object GenericCodecs {

  private val jsonOpts = Map("ignoreNullFields" -> "false")

  private def a(s: ColumnSpec): Column = col("a_" + s.name)
  private def b(s: ColumnSpec): Column = col("b_" + s.name)
  /** Effective image for per-event metadata: before for D, after otherwise
    * (the reference keys sqlType per event the same way). */
  private def eff(s: ColumnSpec): Column =
    when(col("op") === "D", b(s)).otherwise(a(s))

  // ---- wire integrity (schema-generic) --------------------------------

  /** Generic row checksum: digest over the presence-prefixed CANAL-
    * rendered values (all strings), so a consumer can recompute it from
    * the decoded message alone — no type metadata needed at verify time. */
  def rowChecksum(specs: Seq[ColumnSpec], v: ColumnSpec => Column): Column =
    Codecs.checksumOverValues(specs.map(s => MySqlTypes.canalValue(s, v(s))))

  /** Consumer-side verification over the decoded all-string data struct;
    * unparseable messages verify FALSE, never null. */
  def verifyIntegrity(decodedData: Column, checksum: Column,
                      specs: Seq[ColumnSpec]): Column =
    coalesce(
      Codecs.checksumOverValues(specs.map(s => decodedData.getField(s.name)))
        === checksum,
      lit(false))

  // ---- E2: Canal-JSON -------------------------------------------------

  /** Generic Canal-JSON row message (canal_json_row_event_encoder.go:83-380
    * driven by the table schema instead of a fixed envelope): all-string
    * data/old images, per-row promoted sqlType ints, declared mysqlType
    * names, pkNames from the handle columns. */
  def canalJson(specs: Seq[ColumnSpec]): Column = {
    def img(v: ColumnSpec => Column): Column =
      array(struct(specs.map(s => MySqlTypes.canalValue(s, v(s)).as(s.name)): _*))
    val canalType = when(col("op") === "I", "INSERT")
      .when(col("op") === "U", "UPDATE").otherwise("DELETE")
    to_json(struct(
      lit(0L).as("id"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      array(specs.filter(_.isHandle).map(s => lit(s.name)): _*).as("pkNames"),
      lit(false).as("isDdl"),
      canalType.as("type"),
      col("commit_ts").as("es"),
      col("commit_ts").as("ts"),
      lit("").as("sql"),
      struct(specs.map(s => MySqlTypes.javaSqlTypeCol(s, eff(s)).as(s.name)): _*)
        .as("sqlType"),
      struct(specs.map(s => lit(s.mysqlType).as(s.name)): _*).as("mysqlType"),
      when(col("op") === "D", img(b)).otherwise(img(a)).as("data"),
      when(col("op") === "U", img(b)).as("old")), jsonOpts)
  }

  // ---- E1: Open Protocol ----------------------------------------------

  /** Generic Open-Protocol value: per-column `{t, h?, f, v}` wrappers
    * (internal/column.go:28-68 — `h` present only on handle columns,
    * mirroring its omitempty), native-typed values. */
  def openProtocolValue(specs: Seq[ColumnSpec]): Column = {
    def colStruct(s: ColumnSpec, v: Column): Column = {
      val fields = Seq(lit(MySqlTypes.mysqlTypeCode(s)).as("t")) ++
        (if (s.isHandle) Seq(lit(true).as("h")) else Nil) ++
        Seq(lit(MySqlTypes.columnFlags(s)).as("f"),
          MySqlTypes.nativeValue(s, v).as("v"))
      struct(fields: _*)
    }
    def img(v: ColumnSpec => Column): Column =
      struct(specs.map(s => colStruct(s, v(s)).as(s.name)): _*)
    to_json(struct(
      when(col("op") =!= "D", img(a)).as("u"),
      when(col("op") === "D", img(b)).as("d")), jsonOpts)
  }

  // ---- E6: Maxwell ----------------------------------------------------

  /** Generic Maxwell message: native-typed data/old images. */
  def maxwell(specs: Seq[ColumnSpec]): Column = {
    def img(v: ColumnSpec => Column): Column =
      struct(specs.map(s => MySqlTypes.nativeValue(s, v(s)).as(s.name)): _*)
    val mType = when(col("op") === "I", "insert")
      .when(col("op") === "U", "update").otherwise("delete")
    to_json(struct(
      col("schema_name").as("database"),
      col("table_name").as("table"),
      mType.as("type"),
      col("commit_ts").as("ts"),
      col("start_ts").as("xid"),
      when(col("op") === "D", img(b)).otherwise(img(a)).as("data"),
      when(col("op") === "U", img(b)).as("old")), jsonOpts)
  }

  // ---- E4: CSV --------------------------------------------------------

  /** Per-type CSV cell rendering: strings/temporal/json quoted, numerics
    * and ordinal types bare, bool 1/0, binary per config, NULL as the
    * configured literal (csv_message.go:105-518). */
  def csvValue(cfg: Codecs.CsvConfig, s: ColumnSpec, c: Column): Column = {
    val blobBases = Set("binary", "varbinary", "tinyblob", "blob",
      "mediumblob", "longblob")
    s.base match {
      case _ if s.isBool => when(c.isNull, cfg.nullLiteral)
        .otherwise(when(c, "1").otherwise("0"))
      case bb if blobBases(bb) => Codecs.csvBinaryWith(cfg)(c)
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" |
           "longtext" | "json" | "date" | "datetime" | "timestamp" | "time" =>
        Codecs.csvQuoteWith(cfg)(c.cast("string"))
      case "decimal" | "numeric" =>
        Codecs.csvNumWith(cfg)(MySqlTypes.canalValue(s, c)) // declared (p,s)
      case _ => Codecs.csvNumWith(cfg)(c) // ints, float/double, ordinals
    }
  }

  /** Generic CSV line: op flag, schema, table, commit ts, then every
    * column of the effective image. */
  def csvLine(specs: Seq[ColumnSpec],
              cfg: Codecs.CsvConfig = Codecs.CsvConfig()): Column =
    concat_ws(cfg.delimiter,
      Seq(Codecs.csvQuoteWith(cfg)(col("op")),
        Codecs.csvQuoteWith(cfg)(col("schema_name")),
        Codecs.csvQuoteWith(cfg)(col("table_name")),
        Codecs.csvNumWith(cfg)(col("commit_ts"))) ++
        specs.map(s => csvValue(cfg, s, eff(s))): _*)

  // ---- E5: Debezium with the Connect schema block ---------------------

  /** The static Connect field list for one image struct. */
  private def connectFields(specs: Seq[ColumnSpec]): String =
    specs.map(MySqlTypes.connectField).mkString("[", ",", "]")

  /** Debezium source-block fields (debezium/codec.go:985-1007). */
  private def sourceStruct(clusterId: String): Column = struct(
    lit("2.4.0.Final").as("version"),
    lit("graft").as("connector"),
    lit(clusterId).as("name"),
    col("commit_ts").as("ts_ms"),
    lit("false").as("snapshot"),
    col("schema_name").as("db"),
    col("table_name").as("table"),
    lit(0L).as("server_id"),
    lit(null).cast("string").as("gtid"),
    lit("").as("file"),
    lit(0L).as("pos"),
    lit(0L).as("row"),
    lit(0L).as("thread"),
    lit(null).cast("string").as("query"),
    col("commit_ts").as("commit_ts"),
    lit(clusterId).as("cluster_id"))

  /**
   * Full Debezium envelope `{"payload":…,"schema":…}` — the payload half
   * with Connect-typed values and the per-field `schema` descriptor block
   * every Kafka-Connect consumer requires (debezium/codec.go:949-1140).
   * The schema block is static per table schema except the
   * `<cluster>.<db>.<table>` name prefixes, which concat in per row.
   */
  def debezium(specs: Seq[ColumnSpec], clusterId: String = "graft"): Column = {
    def img(v: ColumnSpec => Column): Column =
      struct(specs.map(s => MySqlTypes.debeziumValue(s, v(s)).as(s.name)): _*)
    val payload = to_json(struct(
      sourceStruct(clusterId).as("source"),
      col("commit_ts").as("ts_ms"),
      lit(null).cast("string").as("transaction"),
      when(col("op") === "I", "c").when(col("op") === "U", "u").otherwise("d")
        .as("op"),
      when(col("op") =!= "I", img(b)).as("before"),
      when(col("op") =!= "D", img(a)).as("after")), jsonOpts)
    val topicName = concat(lit(clusterId + "."), col("schema_name"), lit("."),
      col("table_name"))
    val fieldsJson = connectFields(specs)
    def imageSchema(field: String): Column = concat(
      lit(s"""{"type":"struct","optional":true,"fields":$fieldsJson,"name":""""),
      topicName, lit(s""".Value","field":"$field"}"""))
    val sourceSchema =
      """{"type":"struct","optional":false,"name":"io.debezium.connector.mysql.Source","field":"source"}"""
    val schemaJson = concat(
      lit("""{"type":"struct","optional":false,"name":""""),
      topicName,
      lit(s""".Envelope","fields":[$sourceSchema,{"type":"int64","optional":true,"field":"ts_ms"},{"type":"string","optional":true,"field":"transaction"},{"type":"string","optional":false,"field":"op"},"""),
      imageSchema("before"), lit(","), imageSchema("after"), lit("]}"))
    concat(lit("{\"payload\":"), payload, lit(",\"schema\":"), schemaJson,
      lit("}"))
  }

  // ---- E7: Simple protocol -------------------------------------------

  /** Generic BOOTSTRAP message: the column list derives from the specs. */
  def simpleBootstrap(specs: Seq[ColumnSpec], schemaVersion: Int): Column =
    to_json(struct(
      lit("BOOTSTRAP").as("type"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      lit(schemaVersion).as("schemaVersion"),
      array(specs.map(s => struct(
        lit(s.name).as("name"),
        lit(MySqlTypes.simpleDataType(s)).as("dataType"),
        lit(s.nullable).as("nullable"))): _*).as("columns")), jsonOpts)

  /** Generic Simple-protocol row message (native-typed images). */
  def simpleRow(specs: Seq[ColumnSpec], schemaVersion: Int): Column = {
    def img(v: ColumnSpec => Column): Column =
      struct(specs.map(s => MySqlTypes.nativeValue(s, v(s)).as(s.name)): _*)
    val sType = when(col("op") === "I", "INSERT")
      .when(col("op") === "U", "UPDATE").otherwise("DELETE")
    to_json(struct(
      sType.as("type"),
      col("commit_ts").as("commitTs"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      lit(schemaVersion).as("schemaVersion"),
      when(col("op") =!= "D", img(a)).as("data"),
      when(col("op") =!= "I", img(b)).as("old")), jsonOpts)
  }
}
