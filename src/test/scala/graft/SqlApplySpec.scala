package graft

import java.nio.file.Files

import graft.streaming.SqlApply

/** K1 executable apply: MySQL-dialect → Derby translation, and a full
  * render→execute→read-back round trip on a live embedded database (the
  * check_sync_diff property at unit scale). */
class SqlApplySpec extends SparkSpec {

  test("backticks become standard quotes; INSERT/DELETE pass through") {
    assert(SqlApply.toDerby("INSERT INTO `db`.`t` (`pk`, `final_val`) VALUES (1, 1.5), (2, NULL)") ==
      Seq("INSERT INTO \"db\".\"t\" (\"pk\", \"final_val\") VALUES (1, 1.5), (2, NULL)"))
    assert(SqlApply.toDerby("DELETE FROM `db`.`t` WHERE `pk` IN (1, 2)") ==
      Seq("DELETE FROM \"db\".\"t\" WHERE \"pk\" IN (1, 2)"))
  }

  test("backticks inside string literals survive untouched") {
    assert(SqlApply.toDerby("INSERT INTO `db`.`t` (`pk`, `v`) VALUES (1, 'a`b')") ==
      Seq("INSERT INTO \"db\".\"t\" (\"pk\", \"v\") VALUES (1, 'a`b')"))
  }

  test("REPLACE translates to DELETE-existing-keys + INSERT") {
    val got = SqlApply.toDerby(
      "REPLACE INTO `db`.`t` (`pk`, `final_val`) VALUES (7, 0.25), (9, NULL)")
    assert(got == Seq(
      "DELETE FROM \"db\".\"t\" WHERE \"pk\" IN (7, 9)",
      "INSERT INTO \"db\".\"t\" (\"pk\", \"final_val\") VALUES (7, 0.25), (9, NULL)"))
  }

  test("applied SQL reproduces net state on a live engine") {
    val dir = Files.createTempDirectory("graft_sqlapply_spec")
    Files.writeString(dir.resolve("batch0_p0.sql"),
      """INSERT INTO `db`.`t` (`pk`, `final_val`) VALUES (1, 1.0), (2, 2.0), (3, 3.0);
        |REPLACE INTO `db`.`t` (`pk`, `final_val`) VALUES (2, 20.0), (4, 40.0);
        |DELETE FROM `db`.`t` WHERE `pk` IN (3);
        |""".stripMargin)
    val state = SqlApply.applyAndReadState(spark, dir.toString,
        Seq(("db", "t")), dbName = s"spec_${ProcessHandle.current.pid}")
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // REPLACE updates pk=2, inserts missing pk=4; DELETE removes pk=3
    assert(state == Map(1L -> 1.0, 2L -> 20.0, 4L -> 40.0))
  }
}
