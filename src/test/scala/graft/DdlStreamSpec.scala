package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.DdlStream

/** Textual DDL flowing IN the change stream: fold-at-commit-ts, version
  * binding of data rows, persistence across "restarts", replay idempotence. */
class DdlStreamSpec extends SparkSpec {
  import spark.implicits._

  private def env(rows: (String, Long, Long, String)*): DataFrame =
    rows.map { case (op, ts, pk, payload) => (op, ts, "db", "t", pk, payload) }
      .toDF("op", "commit_ts", "schema_name", "table_name", "pk", "etype")

  test("DDL control rows bump versions; data rows bind as-of their ts") {
    val dir = Files.createTempDirectory("ddl_stream").toString
    var captured = Seq.empty[DataFrame]
    val sink = DdlStream.withTextDdl(spark, dir) { (b, _) => captured :+= b.cache() }

    // batch 0: CREATE at ts 0, then data at ts 5
    sink(env(
      ("G", 0L, 0L, "CREATE TABLE db.t (pk BIGINT NOT NULL PRIMARY KEY, val DOUBLE)"),
      ("I", 5L, 1L, "click"), ("I", 6L, 2L, "view")), 0L)
    // batch 1: ALTER at ts 10, data straddling it
    sink(env(
      ("G", 10L, 0L, "ALTER TABLE db.t ADD COLUMN c2 VARCHAR(64)"),
      ("I", 8L, 3L, "click"), ("I", 12L, 4L, "view")), 1L)

    val b0 = captured(0).select("pk", "schema_version").as[(Long, Int)].collect().toMap
    assert(b0 === Map(1L -> 1, 2L -> 1))
    val b1 = captured(1).select("pk", "schema_version").as[(Long, Int)].collect().toMap
    assert(b1 === Map(3L -> 1, 4L -> 2), "row before the DDL ts stays v1")

    // "restart": a new wrapper over the same registry dir sees the history
    val vs = DdlStream.versions(dir)
    assert(vs.map(_.version).max === 2)
    assert(vs.last.schema.fieldNames.contains("c2"))

    // replay of batch 1 (same DDL text+ts) must not create version 3
    sink(env(("G", 10L, 0L, "ALTER TABLE db.t ADD COLUMN c2 VARCHAR(64)"),
      ("I", 12L, 4L, "view")), 1L)
    assert(DdlStream.versions(dir).map(_.version).max === 2)
  }

  test("compacted batches bind on last_commit_ts") {
    val dir = Files.createTempDirectory("ddl_stream2").toString
    var bound: DataFrame = null
    val sink = DdlStream.withTextDdl(spark, dir) { (b, _) => bound = b.cache() }
    sink(env(("G", 0L, 0L, "CREATE TABLE db.t (pk BIGINT PRIMARY KEY)")), 0L)
    val compacted = Seq(("db", "t", 7L, "I", 3L))
      .toDF("schema_name", "table_name", "pk", "net_op", "last_commit_ts")
    sink(compacted, 1L)
    assert(bound.select("schema_version").head().getInt(0) === 1)
    assert(!bound.columns.contains("commit_ts"))
  }
}
