package graft

import org.apache.spark.sql.functions._

import graft.core.DdlParser
import graft.operators.Codecs

/** Canal-JSON DDL messages: classification + message shape, fed from the
  * text parser the way a DDL sink consumes the control stream. */
class CanalDdlSpec extends SparkSpec {
  import spark.implicits._

  test("ddl statements classify to canal event types") {
    def ty(sql: String) = Codecs.canalDdlType(DdlParser.parse(sql, "d").head)
    assert(ty("CREATE TABLE t (pk BIGINT)") === "CREATE")
    assert(ty("DROP TABLE t") === "ERASE")
    // schema-level DDLs are QUERY, not CREATE/ERASE (canal_entry.go:257-262)
    assert(ty("CREATE DATABASE d2") === "QUERY")
    assert(ty("DROP DATABASE d2") === "QUERY")
    assert(ty("RENAME TABLE a TO b") === "RENAME")
    assert(ty("TRUNCATE t") === "TRUNCATE")
    assert(ty("ALTER TABLE t ADD COLUMN c INT") === "ALTER")
    assert(ty("ALTER TABLE t ADD INDEX i (c)") === "CINDEX")
    assert(ty("ALTER TABLE t DROP INDEX i") === "DINDEX")
  }

  test("canal DDL message carries isDdl, type, and the re-rendered sql") {
    val stmt = DdlParser.parse("ALTER TABLE db.t ADD COLUMN c2 VARCHAR(64)").head
    val df = Seq(("db", "t", 1000L, Codecs.canalDdlType(stmt), DdlParser.toSql(stmt)))
      .toDF("schema_name", "table_name", "commit_ts", "ddl_type", "ddl_sql")
    val msg = df.select(Codecs.canalJsonDdl(df).as("m")).head().getString(0)
    assert(msg.contains(""""isDdl":true"""))
    assert(msg.contains(""""type":"ALTER""""))
    assert(msg.contains("ADD COLUMN"))
    assert(msg.contains(""""data":null"""))
    // decodes with the same canal schema as row messages
    val dec = df.select(Codecs.canalDecode(Codecs.canalJsonDdl(df)).as("d"))
      .select("d.isDdl", "d.type", "d.sql").head()
    assert(dec.getBoolean(0) && dec.getString(1) === "ALTER")
  }
}
