package graft

import graft.streaming.SqlGen

/** Golden tests for multi-row SQL generation (reference semantics:
  * pkg/sqlmodel/multirow.go, dm/syncer/dml.go genDMLsWithSameOp). */
class SqlGenSpec extends SparkSpec {
  import spark.implicits._

  private def rows(tuples: (String, Long, String, Option[Double])*) =
    tuples.map { case (t, pk, op, v) => ("db", t, pk, op, v) }
      .toDF("schema_name", "table_name", "pk", "net_op", "final_val")
      .collect().iterator

  test("adjacent same-op rows coalesce into one multi-VALUES statement") {
    val sqls = SqlGen.generate(rows(
      ("t", 1, "I", Some(1.0)), ("t", 2, "I", Some(2.0)), ("t", 3, "I", Some(3.0))))
    assert(sqls == Seq(
      "INSERT INTO `db`.`t` (`pk`, `final_val`) VALUES (1, 1.0), (2, 2.0), (3, 3.0);"))
  }

  test("op changes break batches, preserving order") {
    val sqls = SqlGen.generate(rows(
      ("t", 1, "I", Some(1.0)), ("t", 2, "D", None), ("t", 3, "I", Some(3.0))))
    assert(sqls == Seq(
      "INSERT INTO `db`.`t` (`pk`, `final_val`) VALUES (1, 1.0);",
      "DELETE FROM `db`.`t` WHERE `pk` IN (2);",
      "INSERT INTO `db`.`t` (`pk`, `final_val`) VALUES (3, 3.0);"))
  }

  test("U and R both emit REPLACE; NULL renders literally") {
    val sqls = SqlGen.generate(rows(
      ("t", 1, "U", Some(5.0)), ("t", 2, "R", None)))
    assert(sqls == Seq(
      "REPLACE INTO `db`.`t` (`pk`, `final_val`) VALUES (1, 5.0), (2, NULL);"))
  }

  test("maxTxnRow caps one statement's rows") {
    val many = (1 to 5).map(i => ("t", i.toLong, "I", Some(i.toDouble)))
    val sqls = SqlGen.generate(rows(many: _*), maxTxnRow = 2)
    assert(sqls.length == 3)
    assert(sqls.head.endsWith("VALUES (1, 1.0), (2, 2.0);"))
  }

  test("different tables never share a statement") {
    val sqls = SqlGen.generate(rows(
      ("t1", 1, "I", Some(1.0)), ("t2", 2, "I", Some(2.0))))
    assert(sqls.length == 2)
    assert(sqls(0).contains("`db`.`t1`") && sqls(1).contains("`db`.`t2`"))
  }

  test("multi-OR UPDATE renders the reference CASE-WHEN form") {
    val sqls = SqlGen.genMultiUpdate("`db`.`t`", "pk", "v",
      Seq((1L, 10.0), (2L, 20.0), (3L, null)))
    assert(sqls == Seq(
      "UPDATE `db`.`t` SET `v` = CASE `pk` WHEN 1 THEN 10.0 WHEN 2 THEN 20.0 WHEN 3 THEN NULL END WHERE `pk` IN (1, 2, 3);"))
    assert(SqlGen.genMultiUpdate("t", "k", "v",
      (1 to 90).map(i => (i, i)), maxRows = 40).length == 3)
  }

  test("DDL sql filter drops matching statements") {
    import org.apache.spark.sql.functions.col
    val ddls = Seq("DROP TABLE t1", "ALTER TABLE t1 ADD c INT",
      "TRUNCATE TABLE t2", "CREATE INDEX i ON t1(c)")
      .toDF("ddl")
    val kept = graft.operators.Filters
      .ddlSqlFilter(ddls, Seq("^DROP", "^TRUNCATE"))
      .as[String].collect().toSet
    assert(kept == Set("ALTER TABLE t1 ADD c INT", "CREATE INDEX i ON t1(c)"))
  }
}
