package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.DdlParser._
import graft.core.{DdlParser, SchemaRegistry}
import graft.core.SchemaRegistry.{AddColumn, DropColumn, ModifyColumn, RenameColumn}

class DdlParserSpec extends AnyFunSuite {

  test("CREATE TABLE: columns, backquotes, inline and constraint PK, types") {
    val Seq(ct: CreateTable) = parse(
      """CREATE TABLE `shop`.`orders` (
        |  id BIGINT NOT NULL,
        |  `desc` VARCHAR(255),
        |  price DECIMAL(10, 2) NOT NULL,
        |  flag TINYINT(1),
        |  created DATETIME,
        |  tags SET('a','b,c'),
        |  PRIMARY KEY (id, `desc`)
        |)""".stripMargin)
    assert(ct.schema === "shop" && ct.table === "orders")
    assert(ct.columns.map(_.name) === Seq("id", "desc", "price", "flag", "created", "tags"))
    assert(ct.columns.map(_.dataType) === Seq(LongType, StringType,
      DecimalType(10, 2), BooleanType, TimestampType, StringType))
    assert(ct.columns.head.nullable === false)
    assert(ct.columns(1).nullable === true)
    assert(ct.primaryKey === Seq("id", "desc"))
  }

  test("CREATE TABLE IF NOT EXISTS with inline PRIMARY KEY column") {
    val Seq(ct: CreateTable) = parse(
      "CREATE TABLE IF NOT EXISTS t (pk BIGINT PRIMARY KEY, v DOUBLE)", "d")
    assert(ct.schema === "d" && ct.primaryKey === Seq("pk"))
    assert(!ct.columns.head.nullable)
  }

  test("multi-change ALTER splits into single-change statements") {
    val stmts = parse(
      "ALTER TABLE d.t ADD COLUMN a INT, DROP COLUMN b, MODIFY COLUMN c TEXT, RENAME COLUMN x TO y")
    assert(stmts === Seq(
      AlterTable("d", "t", AddColumn("a", IntegerType)),
      AlterTable("d", "t", DropColumn("b")),
      AlterTable("d", "t", ModifyColumn("c", StringType)),
      AlterTable("d", "t", RenameColumn("x", "y"))))
  }

  test("CHANGE COLUMN with new name splits into rename + modify") {
    assert(parse("ALTER TABLE t CHANGE COLUMN old_c new_c BIGINT", "d") === Seq(
      AlterTable("d", "t", RenameColumn("old_c", "new_c")),
      AlterTable("d", "t", ModifyColumn("new_c", LongType))))
    // same name → modify only
    assert(parse("ALTER TABLE t CHANGE c c DOUBLE", "d") === Seq(
      AlterTable("d", "t", ModifyColumn("c", DoubleType))))
  }

  test("ALTER shorthand without COLUMN keyword") {
    assert(parse("ALTER TABLE t ADD a INT, DROP b", "d") === Seq(
      AlterTable("d", "t", AddColumn("a", IntegerType)),
      AlterTable("d", "t", DropColumn("b"))))
  }

  test("ALTER TABLE RENAME TO and index specs") {
    assert(parse("ALTER TABLE d.t RENAME TO d2.t2") ===
      Seq(RenameTable("d", "t", "d2", "t2")))
    assert(parse("ALTER TABLE t ADD INDEX idx_a (a), DROP INDEX idx_b", "d") === Seq(
      AlterIndex("d", "t", addIndex = true, "idx_a", Seq("a")),
      AlterIndex("d", "t", addIndex = false, "idx_b")))
    // PRIMARY KEY carries no name: MySQL's canonical index name applies,
    // the render is valid MySQL, and both forms are toSql∘parse fixpoints
    assert(parse("ALTER TABLE t ADD PRIMARY KEY (a, b)", "d") === Seq(
      AlterIndex("d", "t", addIndex = true, "PRIMARY", Seq("a", "b"))))
    assert(parse("ALTER TABLE t DROP PRIMARY KEY", "d") === Seq(
      AlterIndex("d", "t", addIndex = false, "PRIMARY")))
    assert(toSql(parse("ALTER TABLE t ADD PRIMARY KEY (a)", "d").head) ===
      "ALTER TABLE `d`.`t` ADD PRIMARY KEY (`a`)")
    assert(toSql(parse("ALTER TABLE t ADD INDEX idx_a (a)", "d").head) ===
      "ALTER TABLE `d`.`t` ADD INDEX `idx_a` (`a`)")
  }

  test("RENAME TABLE with multiple pairs; DROP TABLE with multiple targets") {
    assert(parse("RENAME TABLE a TO b, d2.c TO d2.d", "d1") === Seq(
      RenameTable("d1", "a", "d1", "b"),
      RenameTable("d2", "c", "d2", "d")))
    assert(parse("DROP TABLE IF EXISTS a, `d2`.`b`", "d1") === Seq(
      DropTable("d1", "a"), DropTable("d2", "b")))
  }

  test("TRUNCATE and databases") {
    assert(parse("TRUNCATE TABLE d.t") === Seq(TruncateTable("d", "t")))
    assert(parse("TRUNCATE t", "d") === Seq(TruncateTable("d", "t")))
    assert(parse("CREATE DATABASE IF NOT EXISTS shop") === Seq(CreateDatabase("shop")))
    assert(parse("DROP DATABASE shop;") === Seq(DropDatabase("shop")))
    // SCHEMA spelling must strip the matched keyword, not DATABASE's length
    assert(parse("CREATE SCHEMA shop") === Seq(CreateDatabase("shop")))
    assert(parse("CREATE SCHEMA IF NOT EXISTS shop") === Seq(CreateDatabase("shop")))
    assert(parse("DROP SCHEMA shop") === Seq(DropDatabase("shop")))
    assert(parse("DROP SCHEMA IF EXISTS `shop`") === Seq(DropDatabase("shop")))
  }

  test("comments and control chars are stripped (reference TrimCtrlChars)") {
    assert(parse("/* gh-ost */ ALTER TABLE t ADD COLUMN a INT -- trailing\n", "d") ===
      Seq(AlterTable("d", "t", AddColumn("a", IntegerType))))
  }

  test("unsupported statements raise ParseError") {
    intercept[ParseError](parse("SELECT 1", "d"))
    intercept[ParseError](parse("ALTER TABLE t FROBNICATE x", "d"))
  }

  test("routing rewrites every table reference including rename targets") {
    val router = (s: String, t: String) => (s"tgt_$s", s"tgt_$t")
    assert(route(AlterTable("d", "t", DropColumn("c")), router) ===
      AlterTable("tgt_d", "tgt_t", DropColumn("c")))
    assert(route(RenameTable("d", "a", "d", "b"), router) ===
      RenameTable("tgt_d", "tgt_a", "tgt_d", "tgt_b"))
  }

  test("toSql renders parseable normalized SQL") {
    val stmts = Seq(
      AlterTable("d", "t", AddColumn("a", DecimalType(12, 3))),
      AlterTable("d", "t", RenameColumn("a", "b")),
      RenameTable("d", "t", "d", "t2"),
      TruncateTable("d", "t"),
      DropTable("d", "t"))
    stmts.foreach { s => assert(parse(toSql(s)) === Seq(s)) }
  }

  test("applyToRegistry folds text DDLs into versions (same-ts split ALTERs)") {
    val ddls = Seq(
      ("CREATE TABLE d.t (pk BIGINT NOT NULL PRIMARY KEY, val DOUBLE)", 0L),
      ("ALTER TABLE d.t ADD COLUMN c2 VARCHAR(64)", 100L),
      ("ALTER TABLE d.t ADD COLUMN c3 DECIMAL(10,2), MODIFY COLUMN c2 TEXT", 200L))
    val vs = DdlParser.applyToRegistry(Nil, ddls)
    assert(vs.map(_.version) === Seq(1, 2, 3, 4))
    assert(vs.map(_.effectiveFrom) === Seq(0L, 100L, 200L, 200L))
    assert(vs.last.schema.fieldNames.toSeq === Seq("pk", "val", "c2", "c3"))
    assert(vs.last.schema("c3").dataType === DecimalType(10, 2))
    // rename moves state under the new key
    val vs2 = DdlParser.applyToRegistry(vs.takeRight(1),
      Seq(("RENAME TABLE d.t TO d.t_new", 300L)))
    assert(vs2.last.tableName === "t_new" && vs2.last.version === 5)
  }

  test("FOREIGN KEY / CONSTRAINT specs: key parts stop at the first balanced group") {
    // ADVICE r6 (medium): first-'('..last-')' captured `a) REFERENCES p (id`
    // and re-rendered malformed SQL for FK constraints.
    val Seq(fk: AlterIndex) = parse(
      "ALTER TABLE d.t ADD CONSTRAINT `fk_x` FOREIGN KEY (a) REFERENCES p (id)")
    assert(fk.indexName === "fk_x" && fk.keyParts === Seq("a"))
    val rendered = toSql(fk)
    assert(rendered.contains("(`a`)") && !rendered.contains("REFERENCES"))
    assert(parse(rendered).head.isInstanceOf[AlterIndex]) // round-trips clean
    val Seq(uq: AlterIndex) = parse(
      "ALTER TABLE d.t ADD CONSTRAINT uq_ab UNIQUE (a, b)")
    assert(uq.indexName === "uq_ab" && uq.keyParts === Seq("a", "b"))
    val Seq(anon: AlterIndex) = parse(
      "ALTER TABLE d.t ADD FOREIGN KEY (a) REFERENCES p (id)")
    assert(anon.keyParts === Seq("a"))
  }

  test("event-type classification matches the reference allow-list names") {
    assert(parse("ALTER TABLE t ADD c INT", "d").head.eventType === "add column")
    assert(parse("DROP TABLE t", "d").head.eventType === "drop table")
    assert(parse("TRUNCATE t", "d").head.eventType === "truncate table")
  }

  test("MySQL-sink formatting rewrites vector columns to LONGBLOB") {
    // format_ddl.go:27-45: plain MySQL lacks VECTOR; the forwarded DDL
    // carries LONGBLOB instead, other columns untouched
    val ct = parse(
      "CREATE TABLE shop.items (id BIGINT NOT NULL PRIMARY KEY, emb VECTOR(5), nm VARCHAR(8))",
      "shop").head
    assert(DdlParser.toSql(ct).contains("`emb` VECTOR(5)"))
    val out = DdlParser.toSql(DdlParser.formatForMysql(ct))
    assert(out.contains("`emb` longblob") && out.contains("`nm` VARCHAR(8)"), out)
    // vector parses to array<float>; the rewrite lands on binary
    val add = parse("ALTER TABLE shop.items ADD COLUMN v2 VECTOR(3)", "shop").head
    val addOut = DdlParser.toSql(DdlParser.formatForMysql(add))
    assert(addOut.endsWith("ADD COLUMN `v2` BLOB"), addOut)
    // idempotent + pass-through
    assert(DdlParser.formatForMysql(DdlParser.formatForMysql(ct)) ===
      DdlParser.formatForMysql(ct))
    val plain = parse("DROP TABLE shop.items", "shop").head
    assert(DdlParser.formatForMysql(plain) === plain)
  }
}
