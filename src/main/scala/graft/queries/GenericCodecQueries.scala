package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{ColumnSpec, MySqlTypes, WideCdc}
import graft.operators.{Codecs, GenericCodecs}

/**
 * Gate queries for the schema-GENERIC codec layer: a 19-column mixed-type
 * table ([[WideCdc]]) flows through Canal-JSON, Open Protocol, CSV,
 * Maxwell, Debezium (payload + Connect schema block) and the Simple
 * protocol with NO codec code knowing the schema — encoders and the DuckDB
 * oracles are BOTH generated from the same `Seq[ColumnSpec]`, so the two
 * engines stay in lockstep by construction.
 */
object GenericCodecQueries {

  private val cte = WideCdc.sqlCte
  private val specs = WideCdc.specs
  private val Sample = "seq % 29 = 0"

  /** SQL string literal with single quotes escaped. */
  private def lit1(s: String): String = "'" + s.replace("'", "''") + "'"

  private def aE(s: ColumnSpec) = "a_" + s.name
  private def bE(s: ColumnSpec) = "b_" + s.name
  private def effE(s: ColumnSpec) =
    s"CASE WHEN op = 'D' THEN ${bE(s)} ELSE ${aE(s)} END"

  // ---- q40b: Canal-JSON -----------------------------------------------

  private def canalImgSql(v: ColumnSpec => String): String =
    "[struct_pack(" + specs.map(s =>
      s"${s.name} := ${MySqlTypes.Sql.canalValue(s, v(s))}").mkString(", ") + ")]"

  val canalGeneric = GateQuery(
    "q40b_canal_generic",
    Some(cte +
      s"""SELECT seq, to_json(struct_pack(
         |  id := CAST(0 AS BIGINT),
         |  "database" := schema_name,
         |  "table" := table_name,
         |  pkNames := [${specs.filter(_.isHandle).map(s => lit1(s.name)).mkString(", ")}],
         |  isDdl := false,
         |  type := CASE op WHEN 'I' THEN 'INSERT' WHEN 'U' THEN 'UPDATE' ELSE 'DELETE' END,
         |  es := commit_ts,
         |  ts := commit_ts,
         |  sql := '',
         |  sqlType := struct_pack(${specs.map(s =>
              s"${s.name} := ${MySqlTypes.Sql.javaSqlType(s, effE(s))}").mkString(", ")}),
         |  mysqlType := struct_pack(${specs.map(s =>
              s"${s.name} := ${lit1(s.mysqlType)}").mkString(", ")}),
         |  data := CASE WHEN op = 'D' THEN ${canalImgSql(bE)} ELSE ${canalImgSql(aE)} END,
         |  old := CASE WHEN op = 'U' THEN ${canalImgSql(bE)} END
         |)) AS msg
         |FROM wide WHERE $Sample""".stripMargin)) { (spark, dir) =>
    WideCdc.derive(spark, dir).filter(expr(Sample))
      .select(col("seq"), GenericCodecs.canalJson(specs).as("msg"))
  }

  // ---- q43b: Open Protocol --------------------------------------------

  private def openImgSql(v: ColumnSpec => String): String =
    "struct_pack(" + specs.map { s =>
      val h = if (s.isHandle) "h := true, " else ""
      s"${s.name} := struct_pack(t := ${MySqlTypes.mysqlTypeCode(s)}, ${h}f := " +
        s"CAST(${MySqlTypes.columnFlags(s)} AS BIGINT), v := ${MySqlTypes.Sql.nativeValue(s, v(s))})"
    }.mkString(", ") + ")"

  val openGeneric = GateQuery(
    "q43b_open_generic",
    Some(cte +
      s"""SELECT seq,
         |  to_json(struct_pack(ts := commit_ts, scm := schema_name,
         |                      tbl := table_name, t := 1)) AS msg_key,
         |  to_json(struct_pack(
         |    u := CASE WHEN op <> 'D' THEN ${openImgSql(aE)} END,
         |    d := CASE WHEN op = 'D' THEN ${openImgSql(bE)} END
         |  )) AS msg_value
         |FROM wide WHERE $Sample""".stripMargin)) { (spark, dir) =>
    val df = WideCdc.derive(spark, dir).filter(expr(Sample))
    df.select(col("seq"),
      Codecs.openProtocolKey(df).as("msg_key"),
      GenericCodecs.openProtocolValue(specs).as("msg_value"))
  }

  // ---- q42b: Maxwell --------------------------------------------------

  private def nativeImgSql(v: ColumnSpec => String): String =
    "struct_pack(" + specs.map(s =>
      s"${s.name} := ${MySqlTypes.Sql.nativeValue(s, v(s))}").mkString(", ") + ")"

  val maxwellGeneric = GateQuery(
    "q42b_maxwell_generic",
    Some(cte +
      s"""SELECT seq, to_json(struct_pack(
         |  "database" := schema_name,
         |  "table" := table_name,
         |  type := CASE op WHEN 'I' THEN 'insert' WHEN 'U' THEN 'update' ELSE 'delete' END,
         |  ts := commit_ts,
         |  xid := start_ts,
         |  data := CASE WHEN op = 'D' THEN ${nativeImgSql(bE)} ELSE ${nativeImgSql(aE)} END,
         |  old := CASE WHEN op = 'U' THEN ${nativeImgSql(bE)} END
         |)) AS msg
         |FROM wide WHERE $Sample""".stripMargin)) { (spark, dir) =>
    WideCdc.derive(spark, dir).filter(expr(Sample))
      .select(col("seq"), GenericCodecs.maxwell(specs).as("msg"))
  }

  // ---- q44b: CSV ------------------------------------------------------

  private val blobBases = Set("binary", "varbinary", "tinyblob", "blob",
    "mediumblob", "longblob")
  private val quotedBases = Set("char", "varchar", "tinytext", "text",
    "mediumtext", "longtext", "json", "date", "datetime", "timestamp", "time")

  private def csvCellSql(s: ColumnSpec, e: String): String =
    if (s.isBool)
      s"CASE WHEN $e IS NULL THEN '\\N' WHEN $e THEN '1' ELSE '0' END"
    else if (blobBases(s.base))
      s"CASE WHEN $e IS NULL THEN '\\N' ELSE to_base64($e) END"
    else if (quotedBases(s.base))
      s"""CASE WHEN $e IS NULL THEN '\\N' ELSE '"' || replace(CAST($e AS VARCHAR), '"', '""') || '"' END"""
    else if (s.base == "decimal" || s.base == "numeric")
      s"coalesce(${MySqlTypes.Sql.canalValue(s, e)}, '\\N')"
    else s"coalesce(CAST($e AS VARCHAR), '\\N')"

  val csvGeneric = GateQuery(
    "q44b_csv_generic",
    Some(cte +
      s"""SELECT seq, concat_ws(',',
         |  '"' || op || '"',
         |  '"' || schema_name || '"',
         |  '"' || table_name || '"',
         |  CAST(commit_ts AS VARCHAR),
         |  ${specs.map(s => csvCellSql(s, effE(s))).mkString(",\n  ")}) AS line
         |FROM wide WHERE $Sample""".stripMargin)) { (spark, dir) =>
    WideCdc.derive(spark, dir).filter(expr(Sample))
      .select(col("seq"), GenericCodecs.csvLine(specs).as("line"))
  }

  // ---- q41b: Debezium with Connect schema block -----------------------

  private def dbzImgSql(v: ColumnSpec => String): String =
    "struct_pack(" + specs.map(s =>
      s"${s.name} := ${MySqlTypes.Sql.debeziumValue(s, v(s))}").mkString(", ") + ")"

  val debeziumSchemaGate = GateQuery(
    "q41b_debezium_schema", {
      val fieldsJson = specs.map(MySqlTypes.connectField).mkString("[", ",", "]")
      val sourceSchema =
        """{"type":"struct","optional":false,"name":"io.debezium.connector.mysql.Source","field":"source"}"""
      def imageSchema(field: String): String =
        lit1(s"""{"type":"struct","optional":true,"fields":$fieldsJson,"name":"""") +
          s""" || topic || ${lit1(s""".Value","field":"$field"}""")}"""
      Some(cte +
        s"""SELECT seq, '{"payload":' || to_json(struct_pack(
           |  source := struct_pack(version := '2.4.0.Final', connector := 'graft',
           |    name := 'graft', ts_ms := commit_ts, snapshot := 'false',
           |    db := schema_name, "table" := table_name,
           |    server_id := CAST(0 AS BIGINT), gtid := CAST(NULL AS VARCHAR),
           |    file := '', pos := CAST(0 AS BIGINT), "row" := CAST(0 AS BIGINT),
           |    thread := CAST(0 AS BIGINT), query := CAST(NULL AS VARCHAR),
           |    commit_ts := commit_ts, cluster_id := 'graft'),
           |  ts_ms := commit_ts,
           |  transaction := CAST(NULL AS VARCHAR),
           |  op := CASE op WHEN 'I' THEN 'c' WHEN 'U' THEN 'u' ELSE 'd' END,
           |  before := CASE WHEN op <> 'I' THEN ${dbzImgSql(bE)} END,
           |  after := CASE WHEN op <> 'D' THEN ${dbzImgSql(aE)} END
           |)) || ',"schema":'
           |  || ${lit1("""{"type":"struct","optional":false,"name":"""")} || topic
           |  || ${lit1(s""".Envelope","fields":[$sourceSchema,{"type":"int64","optional":true,"field":"ts_ms"},{"type":"string","optional":true,"field":"transaction"},{"type":"string","optional":false,"field":"op"},""")}
           |  || ${imageSchema("before")} || ',' || ${imageSchema("after")}
           |  || ']}' || '}' AS msg
           |FROM (SELECT *, 'graft.' || schema_name || '.' || table_name AS topic
           |      FROM wide) WHERE $Sample""".stripMargin)
    }) { (spark, dir) =>
    WideCdc.derive(spark, dir).filter(expr(Sample))
      .select(col("seq"), GenericCodecs.debezium(specs).as("msg"))
  }

  // ---- q48b: Simple protocol ------------------------------------------

  val simpleGeneric = GateQuery(
    "q48b_simple_generic",
    Some(cte +
      s"""SELECT seq, msg FROM (
         |  SELECT DISTINCT -1 - dense_rank() OVER (ORDER BY schema_name, table_name) AS seq,
         |    to_json(struct_pack(
         |      type := 'BOOTSTRAP', "database" := schema_name, "table" := table_name,
         |      schemaVersion := 1,
         |      columns := [${specs.map(s =>
              s"struct_pack(name := ${lit1(s.name)}, dataType := ${lit1(MySqlTypes.simpleDataType(s))}, nullable := ${s.nullable})")
              .mkString(", ")}]
         |    )) AS msg
         |  FROM wide
         |  UNION ALL
         |  SELECT seq, to_json(struct_pack(
         |    type := CASE op WHEN 'I' THEN 'INSERT' WHEN 'U' THEN 'UPDATE' ELSE 'DELETE' END,
         |    commitTs := commit_ts, "database" := schema_name, "table" := table_name,
         |    schemaVersion := 1,
         |    data := CASE WHEN op <> 'D' THEN ${nativeImgSql(aE)} END,
         |    old := CASE WHEN op <> 'I' THEN ${nativeImgSql(bE)} END
         |  )) AS msg FROM wide WHERE $Sample
         |)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    val df = WideCdc.derive(spark, dir)
    val pairs = df.select("schema_name", "table_name").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    val boot = pairs.zipWithIndex
      .map { case ((s, t), i) => (-1L - (i + 1), s, t) }.toSeq
      .toDF("seq", "schema_name", "table_name")
    val bootMsgs = boot.select(col("seq"),
      GenericCodecs.simpleBootstrap(specs, 1).as("msg"))
    bootMsgs.unionByName(
      df.filter(expr(Sample))
        .select(col("seq"), GenericCodecs.simpleRow(specs, 1).as("msg")))
  }

  /**
   * q112b — wire integrity over the FULL 19-column mixed-type schema:
   * the checksum digests the canal-rendered (all-string) values, so the
   * consumer recomputes it from the decoded message with no type
   * metadata; a deterministic subset corrupts in flight (digit injected
   * into the id value) and must be flagged exactly. Generic twin of the
   * fixed-envelope q112.
   */
  val integrityGeneric = GateQuery(
    "q112b_generic_integrity",
    Some(cte +
      s"""SELECT op, count(*) AS n_msgs,
         |  CAST(sum(CASE WHEN (${effE(specs.head)}) % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
         |  CAST(sum(CASE WHEN (${effE(specs.head)}) % 97 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_verified
         |FROM wide WHERE $Sample GROUP BY 1""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val df = WideCdc.derive(spark, dir).filter(expr(Sample))
    def eff(s: ColumnSpec) =
      when(col("op") === "D", col("b_" + s.name)).otherwise(col("a_" + s.name))
    val msg = to_json(struct(
      struct(specs.map(s => MySqlTypes.canalValue(s, eff(s)).as(s.name)): _*)
        .as("data"),
      GenericCodecs.rowChecksum(specs, eff).as("checksum")))
    val corruptible = eff(specs.head) % 97 === 0 // id: handle, never null
    val wire = df.select(col("op"),
      when(corruptible, regexp_replace(msg, "\"id\":\"", "\"id\":\"9"))
        .otherwise(msg).as("msg"))
    val schema = new StructType()
      .add("data", specs.foldLeft(new StructType())((t, s) =>
        t.add(s.name, StringType)))
      .add("checksum", LongType)
    wire.withColumn("m", from_json(col("msg"), schema))
      .withColumn("ok", GenericCodecs.verifyIntegrity(
        col("m.data"), col("m.checksum"), specs))
      .groupBy("op")
      .agg(count(lit(1)).as("n_msgs"),
        sum(when(!col("ok"), 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_verified"))
  }

  def all: Seq[GateQuery] = Seq(canalGeneric, openGeneric, maxwellGeneric,
    csvGeneric, debeziumSchemaGate, simpleGeneric, integrityGeneric)
}
