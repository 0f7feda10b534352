package graft

import graft.core.ColumnSpec
import graft.streaming.TableDef

/**
 * Pins [[TableDef]] against the reference's OWN test vectors
 * (pkg/sink/cloudstorage/table_definition_test.go) — the TestTableCol
 * per-type matrix and the TestTableDefinition golden document — plus the
 * path/checksum contract and the parse fixpoint.
 */
class TableDefSpec extends org.scalatest.funsuite.AnyFunSuite {

  // the generateTableDef() fixture (table_definition_test.go:30-81)
  private val refSpecs = Seq(
    ColumnSpec("Id", "int", nullable = false, isHandle = true),
    ColumnSpec("LastName", "varchar(128)", nullable = false),
    ColumnSpec("FirstName", "varchar(64)"),
    ColumnSpec("Birthday", "datetime"))
  private val refDefaults = Map[String, Any](
    "Id" -> 10, "LastName" -> "Default LastName",
    "FirstName" -> "Default FirstName", "Birthday" -> 12345678)

  test("TestTableDefinition golden document, byte for byte") {
    val expected =
      """{
        |    "Table": "table1",
        |    "Schema": "schema1",
        |    "Version": 1,
        |    "TableVersion": 100,
        |    "Query": "",
        |    "Type": 0,
        |    "TableColumns": [
        |        {
        |            "ColumnName": "Id",
        |            "ColumnType": "INT",
        |            "ColumnDefault": 10,
        |            "ColumnPrecision": "11",
        |            "ColumnNullable": "false",
        |            "ColumnIsPk": "true"
        |        },
        |        {
        |            "ColumnName": "LastName",
        |            "ColumnType": "VARCHAR",
        |            "ColumnDefault": "Default LastName",
        |            "ColumnPrecision": "128",
        |            "ColumnNullable": "false"
        |        },
        |        {
        |            "ColumnName": "FirstName",
        |            "ColumnType": "VARCHAR",
        |            "ColumnDefault": "Default FirstName",
        |            "ColumnPrecision": "64"
        |        },
        |        {
        |            "ColumnName": "Birthday",
        |            "ColumnType": "DATETIME",
        |            "ColumnDefault": 12345678
        |        }
        |    ],
        |    "TableColumnsTotal": 4
        |}""".stripMargin
    assert(TableDef.marshalWithQuery("schema1", "table1", 100L, "", 0,
      refSpecs, defaults = refDefaults) === expected)
  }

  test("FromDDLEvent variant carries Query and Type (test.go:426-441)") {
    val j = TableDef.marshalWithQuery("schema1", "table1", 100L,
      "alter table schema1.table1 add Birthday date",
      TableDef.ActionAddColumn, refSpecs, defaults = refDefaults)
    assert(j.contains("\"Query\": \"alter table schema1.table1 add Birthday date\""))
    assert(j.contains("\"Type\": 5"))
  }

  test("TestTableCol per-type matrix (test.go:84-354)") {
    def ps(tp: String, unsigned: Boolean = false, pk: Boolean = false) = {
      val s = ColumnSpec("", tp, unsigned = unsigned, isHandle = pk)
      (TableDef.typeName(s), TableDef.precisionScale(s))
    }
    assert(ps("time(5)") === (("TIME", (None, Some("5")))))
    assert(ps("int(5)", unsigned = true) === (("INT UNSIGNED", (Some("5"), None))))
    assert(ps("float(12,3)") === (("FLOAT", (Some("12"), Some("3")))))
    assert(ps("float(12)") === (("FLOAT", (Some("12"), None))))
    assert(ps("float(5)") === (("FLOAT", (Some("5"), None))))
    assert(ps("float(7,3)") === (("FLOAT", (Some("7"), Some("3")))))
    assert(ps("double(12,3)") === (("DOUBLE", (Some("12"), Some("3")))))
    assert(ps("double(12)") === (("DOUBLE", (Some("12"), None))))
    assert(ps("double") === (("DOUBLE", (Some("22"), None))))
    assert(ps("tinyint(5)") === (("TINYINT", (Some("5"), None))))
    assert(ps("smallint(5)") === (("SMALLINT", (Some("5"), None))))
    assert(ps("mediumint(10)") === (("MEDIUMINT", (Some("10"), None))))
    assert(ps("int", pk = true) === (("INT", (Some("11"), None))))
    assert(ps("bigint(20)") === (("BIGINT", (Some("20"), None))))
    assert(ps("bit(5)") === (("BIT", (Some("5"), None))))
    assert(ps("varchar(128)") === (("VARCHAR", (Some("128"), None))))
    assert(ps("char(32)") === (("CHAR", (Some("32"), None))))
    assert(ps("blob(100)") === (("BLOB", (Some("100"), None))))
    assert(ps("text(100)") === (("TEXT", (Some("100"), None))))
    assert(ps("tinyblob(120)") === (("TINYBLOB", (Some("120"), None))))
    assert(ps("mediumblob(100)") === (("MEDIUMBLOB", (Some("100"), None))))
    assert(ps("longblob(5)") === (("LONGBLOB", (Some("5"), None))))
    assert(ps("enum('a','b')") === (("ENUM", (None, None))))
    assert(ps("set('a','b')") === (("SET", (None, None))))
    assert(ps("timestamp(2)") === (("TIMESTAMP", (None, Some("2")))))
    assert(ps("timestamp") === (("TIMESTAMP", (None, None))))
    assert(ps("datetime(2)") === (("DATETIME", (None, Some("2")))))
    assert(ps("datetime") === (("DATETIME", (None, None))))
    assert(ps("date") === (("DATE", (None, None))))
    assert(ps("year(4)") === (("YEAR", (Some("4"), None))))
    assert(ps("year(2)") === (("YEAR", (Some("2"), None))))
    // repo extensions beyond the Go matrix
    assert(ps("json") === (("JSON", (None, None))))
    assert(ps("vector(4)") === (("VECTOR", (None, None))))
    assert(ps("tinyint(1)") === (("TINYINT", (Some("1"), None))))
  }

  test("checksum input: name-sorted columns, no Query/Type/TableVersion") {
    val j = TableDef.marshalWithoutQuery("schema1", "table1", refSpecs,
      defaults = refDefaults)
    assert(!j.contains("Query") && !j.contains("TableVersion"))
    val order = Seq("Birthday", "FirstName", "Id", "LastName")
    val idx = order.map(n => j.indexOf(s""""ColumnName": "$n""""))
    assert(idx.forall(_ >= 0) && idx === idx.sorted, s"column order: $idx")
    // PositionInertia over one write = crc32 of the bytes
    val crc = new java.util.zip.CRC32
    crc.update(j.getBytes("UTF-8"))
    assert(TableDef.checksum("schema1", "table1", refSpecs,
      defaults = refDefaults) === crc.getValue)
  }

  test("schema path: table and db-schema forms (path.go:49-55,93-110)") {
    val c = TableDef.checksum("schema1", "table1", refSpecs)
    val p = TableDef.schemaPath("schema1", "table1", 100L, c)
    assert(p === f"schema1/table1/meta/schema_100_$c%010d.json")
    // db-schema definition: no table, no columns → TableColumns null
    val dbJson = TableDef.marshalWithQuery("schema1", "", 100L, "", 1, Nil)
    assert(dbJson.contains("\"TableColumns\": null"))
    assert(dbJson.contains("\"TableColumnsTotal\": 0"))
    assert(TableDef.schemaPath("schema1", "", 100L, 7L)
      === "schema1/meta/schema_100_0000000007.json")
    intercept[IllegalArgumentException] {
      TableDef.schemaPath("", "t", 100L, 0L)
    }
    intercept[IllegalArgumentException] {
      TableDef.schemaPath("s", "t", 0L, 0L)
    }
  }

  test("output-column-id adds ColumnId as a decimal string (sink.go:689)") {
    val j = TableDef.marshalWithQuery("s", "t", 5L, "", 0,
      refSpecs, outputColumnId = true, columnIds = Seq(11L, 12L, 13L, 14L))
    assert(j.contains("\"ColumnId\": \"11\""))
    assert(j.indexOf("\"ColumnId\": \"11\"") < j.indexOf("\"ColumnName\": \"Id\""))
    // without the flag the field is absent entirely
    assert(!TableDef.marshalWithQuery("s", "t", 5L, "", 0, refSpecs)
      .contains("ColumnId"))
    // the without-query form keeps ids paired with their columns through
    // the name sort
    val wq = TableDef.marshalWithoutQuery("s", "t", refSpecs,
      outputColumnId = true, columnIds = Seq(11L, 12L, 13L, 14L))
    val birthday = wq.indexOf("\"ColumnName\": \"Birthday\"")
    assert(wq.lastIndexOf("\"ColumnId\": \"14\"", birthday) >= 0)
  }

  test("Go JSON escaping: HTML chars, control chars, quotes") {
    import TableDef.goJsonEscape
    assert(goJsonEscape("a<b>c&d") === "a\\u003cb\\u003ec\\u0026d")
    assert(goJsonEscape("q\"\\x\n\t") === "q\\\"\\\\x\\n\\t")
    assert(goJsonEscape("\u0001ok\u2028") === "\\u0001ok\\u2028")
    val j = TableDef.marshalWithQuery("s", "t", 5L,
      "ALTER TABLE t ADD CHECK (a > 0 AND b < 9)", 5, refSpecs)
    assert(j.contains("(a \\u003e 0 AND b \\u003c 9)"))
  }

  test("parse fixpoint: render → parse → render is identity") {
    val wide = graft.core.WideCdc.specs
    val j = TableDef.marshalWithQuery("test", "wide", 1100L,
      "CREATE TABLE test.wide (...)", TableDef.ActionCreateTable, wide)
    val (sch, tbl, ver, parsed) = TableDef.parse(j)
    assert((sch, tbl, ver) === (("test", "wide", 1100L)))
    assert(parsed.size === wide.size)
    // re-render from the parsed specs reproduces the SAME bytes: the
    // declared-type reconstruction (precision/scale folded back into the
    // suffix) is faithful for every column of the wide matrix
    val j2 = TableDef.marshalWithQuery("test", "wide", 1100L,
      "CREATE TABLE test.wide (...)", TableDef.ActionCreateTable, parsed)
    assert(j2 === j)
    // and the parsed nullability/handle flags survive
    assert(parsed.find(_.name == "id").exists(s => s.isHandle && !s.nullable))
    assert(parsed.find(_.name == "ucnt").exists(_.unsigned))
    // db-schema parse
    val (s2, t2, _, cols2) = TableDef.parse(
      TableDef.marshalWithQuery("db1", "", 9L, "", 1, Nil))
    assert((s2, t2, cols2) === (("db1", "", Nil)))
  }
}
