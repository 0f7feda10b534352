package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DdlRepair
import graft.streaming.DdlRepair._

/** DM's special DDL-error repair: randomized decision replay plus the
  * parser's quoting/spec-splitting edges. */
class DdlRepairSpec extends AnyFunSuite {

  test("decision kernel equals a direct replay on 300 random scenarios") {
    val rnd = new scala.util.Random(1409L)
    def pick[T](xs: T*): T = xs(rnd.nextInt(xs.size))
    for (_ <- 0 until 300) {
      val err: DdlError = pick(
        InvalidConn,
        MySqlErr(8200, "cannot drop column c with index now"),
        MySqlErr(1105, "drop column c with composite index"),
        MySqlErr(8200, "something else"),
        MySqlErr(1050, "cannot drop column c with index"))
      val ddl = pick(
        "ALTER TABLE `db`.`t` DROP COLUMN `c`",
        "ALTER TABLE `db`.`t` ADD INDEX `i` (`c`)",
        "ALTER TABLE `db`.`t` ADD UNIQUE KEY `u` (`c`)",
        "CREATE INDEX `i` ON `t` (`c`)",
        "CREATE UNIQUE INDEX `u` ON `t` (`c`)",
        "ALTER TABLE `db`.`t` DROP COLUMN `c`, ADD COLUMN `d` INT",
        "INSERT INTO t VALUES (1)")
      val n = 1 + rnd.nextInt(3)
      val idx = rnd.nextInt(n)
      val ddls = Seq.tabulate(n)(i =>
        if (i == idx) ddl else "ALTER TABLE `db`.`t` ADD COLUMN `z` INT")
      val nIdx = rnd.nextInt(3)
      val catalog = Map(("db", "t") -> Seq.tabulate(nIdx) { i =>
        IndexInfo(s"ix$i",
          if (rnd.nextBoolean()) Seq(pick("c", "z"))
          else Seq(pick("c", "z"), "w"))
      })

      val got = DdlRepair.handle(err, ddls, idx, catalog)

      // independent replay
      val stmt = DdlRepair.parse(ddl)
      val ignore = err == InvalidConn && idx == n - 1 && (stmt match {
        case AlterAddConstraint("index") | CreateIndex => true
        case _ => false
      })
      val dropErr = err match {
        case MySqlErr(no, m) => (no == 8200 || no == 1105) &&
          m.contains("drop column") && (m.contains("with index") ||
            m.contains("with composite index") ||
            m.contains("with tidb_enable_change_multi_schema is disable"))
        case _ => false
      }
      val want: Outcome =
        if (ignore) Ignore
        else stmt match {
          case AlterDropColumn(s, t, col) if dropErr =>
            val containing = catalog.getOrElse((s, t), Nil)
              .filter(_.columns.contains(col))
            if (containing.forall(_.columns.size == 1))
              PreDropIndexes(containing.map(i =>
                s"ALTER TABLE `$s`.`$t` DROP INDEX `${i.name}`"), idx)
            else Propagate
          case _ => Propagate
        }
      assert(got == want, s"err=$err ddl=$ddl idx=$idx/$n cat=$catalog")
    }
  }

  test("parse handles quoting, default schema, and spec splitting") {
    assert(DdlRepair.parse("ALTER TABLE t DROP COLUMN c", "dd") ==
      AlterDropColumn("dd", "t", "c"))
    assert(DdlRepair.parse("alter table `a b`.`t``x` drop column `c,1`") ==
      AlterDropColumn("a b", "t`x", "c,1"))
    // the comma inside backquotes must not split specs
    assert(DdlRepair.parse(
      "ALTER TABLE t ADD INDEX `i,dx` (`c`)") == AlterAddConstraint("index"))
    // a parenthesized column list's comma is not a spec separator
    assert(DdlRepair.parse(
      "ALTER TABLE t ADD INDEX i (a, b)") == AlterAddConstraint("index"))
    assert(DdlRepair.parse(
      "ALTER TABLE t DROP COLUMN a, DROP COLUMN b") == AlterMultiSpec(2))
    assert(DdlRepair.parse("CREATE UNIQUE INDEX u ON t (c)") == CreateIndex)
    assert(DdlRepair.parse("TRUNCATE TABLE t") == OtherStmt)
  }

  test("multi-column index aborts even when a single-column one exists") {
    val cat = Map(("db", "t") -> Seq(IndexInfo("a", Seq("c")),
      IndexInfo("b", Seq("c", "d"))))
    val out = DdlRepair.handle(
      MySqlErr(8200, "cannot drop column c with composite index"),
      Seq("ALTER TABLE `db`.`t` DROP COLUMN `c`"), 0, cat)
    assert(out == Propagate)
  }
}
