package graft

import org.apache.spark.sql.functions._

import graft.core.{ColumnSpec, DdlParser, MySqlTypes, WideCdc}
import graft.operators.GenericCodecs

/** The schema-generic codec layer: type matrices against the reference's
  * java.go table, and the DDL → ColumnSpec → encoder bridge (a table
  * declared in SQL flows through the codecs with no codec-side edits). */
class GenericCodecSpec extends SparkSpec {
  import spark.implicits._

  test("java.sql.Types matrix matches the reference mapping") {
    def t(m: String) = MySqlTypes.javaSqlType(ColumnSpec("c", m))
    assert(t("tinyint") === -6)
    assert(t("tinyint(1)") === -6) // bool rides TINYINT
    assert(t("smallint") === 5)
    assert(t("mediumint") === 4 && t("int") === 4)
    assert(t("bigint") === -5)
    assert(t("float") === 7) // REAL
    assert(t("double") === 8)
    assert(t("decimal(10,2)") === 3)
    assert(t("char(4)") === 1 && t("varchar(32)") === 12)
    assert(t("text") === 2005 && t("blob") === 2004 && t("varbinary(16)") === 2004)
    assert(t("date") === 91 && t("time") === 92)
    assert(t("datetime") === 93 && t("timestamp") === 93)
    assert(t("year") === 12) // canal renders YEAR as VARCHAR
    assert(t("enum('a')") === 4 && t("set('a')") === -7 && t("bit(8)") === -7)
    assert(t("json") === 12)
  }

  test("unsigned promotion is value-dependent like canal's getJavaSQLType") {
    val s = ColumnSpec("c", "int unsigned", unsigned = true)
    val df = Seq(2147483647L, 2147483648L).toDF("v")
      .select(MySqlTypes.javaSqlTypeCol(s, col("v")).as("t"))
    assert(df.as[Int].collect().toSeq === Seq(4, -5))
  }

  test("a DDL-declared table drives the codecs with no codec-side schema") {
    val stmts = DdlParser.parse(
      """CREATE TABLE shop.items (
        |  item_id BIGINT NOT NULL PRIMARY KEY,
        |  title VARCHAR(64),
        |  price DECIMAL(10,2),
        |  stock INT,
        |  added DATE)""".stripMargin)
    val ct = stmts.collectFirst { case c: DdlParser.CreateTable => c }.get
    val specs = ct.columns.map(d =>
      MySqlTypes.fromColumnDef(d, isHandle = ct.primaryKey.contains(d.name)))
    assert(specs.map(_.name) === Seq("item_id", "title", "price", "stock", "added"))
    assert(specs.head.isHandle && !specs.head.nullable)

    val df = Seq(
      ("I", 1000L, "shop", "items",
        Some(7L), Some("widget"), Some(BigDecimal("19.99")), Some(3), Some("2024-03-01")),
      ("D", 1001L, "shop", "items",
        Some(8L), None, None, None, None))
      .toDF("op", "commit_ts", "schema_name", "table_name",
        "x_id", "x_title", "x_price", "x_stock", "x_added")
      .withColumn("start_ts", col("commit_ts") - 1)
    // lay out a_/b_ images: insert has after only, delete has before only
    val withImgs = specs.foldLeft(df) { (d, s) =>
      val src = col("x_" + (if (s.name == "item_id") "id" else
        Map("title" -> "title", "price" -> "price", "stock" -> "stock",
          "added" -> "added")(s.name)))
      val v = if (s.name == "added") src.cast("date") else src
      d.withColumn("a_" + s.name, when(col("op") =!= "D", v))
        .withColumn("b_" + s.name, when(col("op") =!= "I", v))
    }
    val msgs = withImgs.select(col("op"),
      GenericCodecs.canalJson(specs).as("canal"),
      GenericCodecs.debezium(specs).as("dbz"),
      GenericCodecs.csvLine(specs).as("csv")).collect()

    val ins = msgs.find(_.getString(0) == "I").get
    val canal = ins.getString(1)
    assert(canal.contains(""""pkNames":["item_id"]"""))
    assert(canal.contains(""""sqlType":{"item_id":-5,"title":12,"price":3,"stock":4,"added":91}"""))
    assert(canal.contains(""""mysqlType":{"item_id":"bigint","title":"varchar(64)","price":"decimal(10,2)","stock":"int","added":"date"}"""))
    assert(canal.contains(""""data":[{"item_id":"7","title":"widget","price":"19.99","stock":"3","added":"2024-03-01"}]"""))
    val dbz = ins.getString(2)
    assert(dbz.contains(""""after":{"item_id":7,"title":"widget","price":19.99,"stock":3,"added":19783}"""))
    assert(dbz.contains(""""name":"io.debezium.time.Date","field":"added""""))
    assert(ins.getString(3) ===
      """"I","shop","items",1000,7,"widget",19.99,3,"2024-03-01"""")

    val del = msgs.find(_.getString(0) == "D").get
    assert(del.getString(1).contains(""""type":"DELETE""""))
    assert(del.getString(1).contains(""""old":null"""))
    assert(del.getString(3) === """"D","shop","items",1001,8,\N,\N,\N,\N""")
  }

  test("wide envelope spec list covers every MySQL type family") {
    val bases = WideCdc.specs.map(_.base).toSet
    val families = Set("bigint", "int", "smallint", "tinyint", "decimal",
      "double", "float", "varchar", "char", "date", "datetime", "blob",
      "enum", "set", "bit", "year", "json", "vector")
    assert(families.subsetOf(bases))
    assert(WideCdc.specs.length >= 20)
  }

  test("avro schema generation follows columnToAvroSchema per mode") {
    import GenericCodecs.{AvroOpts, avroColumnSchema, avroTidbType}
    def s(m: String, unsigned: Boolean = false, members: Seq[String] = Nil) =
      ColumnSpec("c", m, unsigned = unsigned, members = members)
    // tidb_type names (avro.go type2TiDBType:364-390)
    assert(avroTidbType(s("int", unsigned = true)) === "INT UNSIGNED")
    assert(avroTidbType(s("mediumint")) === "INT")
    assert(avroTidbType(s("blob")) === "BLOB")
    assert(avroTidbType(s("text")) === "TEXT")
    assert(avroTidbType(s("vector(4)")) === "TiDBVECTORFloat32")
    // unsigned INT widens to long; unsigned BIGINT depends on the mode
    assert(avroColumnSchema(s("int", unsigned = true)).contains("\"type\":\"long\""))
    assert(avroColumnSchema(s("bigint", unsigned = true)).contains("\"type\":\"long\""))
    assert(avroColumnSchema(s("bigint", unsigned = true),
      AvroOpts(bigintUnsignedHandlingMode = "string"))
      .contains("\"type\":\"string\""))
    // decimal precise → bytes + logical decimal(p,s); string mode → string
    val precise = avroColumnSchema(s("decimal(12,2)"))
    assert(precise.contains("\"logicalType\":\"decimal\"") &&
      precise.contains("\"precision\":12") && precise.contains("\"scale\":2"))
    assert(avroColumnSchema(s("decimal(12,2)"),
      AvroOpts(decimalHandlingMode = "string")).contains("\"type\":\"string\""))
    // enum members escape commas (helper.go:323-328), then JSON-escape
    assert(avroColumnSchema(s("enum('a,b','c')", members = Seq("a,b", "c")))
      .contains(""""allowed":"a\\,b,c""""))
    // bit with no declared length defaults to bit(1), not decimal's 10
    assert(avroColumnSchema(s("bit")).contains("\"length\":\"1\""))
    // record/field names sanitize to the Avro alphabet (helper.go:342-371)
    assert(GenericCodecs.avroSanitizeName("2col-a.b") === "_2col_a_b")
    // Go ranges over RUNES: one supplementary-plane char (two UTF-16
    // units) maps to exactly ONE underscore, leading or not
    assert(GenericCodecs.avroSanitizeName("a𝒳b") === "a_b")
    assert(GenericCodecs.avroSanitizeName("𝒳x") === "_x")
    assert(GenericCodecs.avroRecordSchema("d-b", "1t", Seq(s("int")))
      .contains("\"name\":\"_1t\",\"namespace\":\"d_b\""))
    // invalid modes reject like the url-parameter validation
    intercept[IllegalArgumentException] { AvroOpts(decimalHandlingMode = "x") }
    intercept[IllegalArgumentException] {
      AvroOpts(bigintUnsignedHandlingMode = "x")
    }
  }

  test("unsigned-bigint value rendering: long wraps, string is FormatUint") {
    import spark.implicits._
    val vals = Seq(5L, -1L, Long.MinValue).toDF("v")
    val got = vals.select(
      GenericCodecs.avroBigintUnsignedValue(col("v"), "long").cast("string").as("l"),
      GenericCodecs.avroBigintUnsignedValue(col("v"), "string").as("s"))
      .as[(String, String)].collect().toSeq
    assert(got === Seq(
      ("5", "5"),
      ("-1", "18446744073709551615"), // uint64 max
      ("-9223372036854775808", "9223372036854775808"))) // 2^63
  }
}
