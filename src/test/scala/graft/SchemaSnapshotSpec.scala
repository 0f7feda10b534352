package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.SchemaSnapshot
import graft.core.SchemaSnapshot._

/**
 * The schema-snapshot table universe (cdc/entry/schema/snapshot.go):
 * directed legs for every structural op plus a random-ops invariant —
 * name↔id bindings stay bijective, partition owners stay live, and the
 * ineligible/truncated sets never reference living reborn ids.
 */
class SchemaSnapshotSpec extends AnyFunSuite {

  private def base(): Snapshot = {
    val s = new Snapshot()
    assert(s.createSchema(DbInfo(1L, "sdb"), 10L).isRight)
    s
  }

  test("schema ops: duplicate id/name, replace drops the old name binding") {
    val s = base()
    assert(s.createSchema(DbInfo(1L, "other"), 11L) ==
      Left(ErrSchemaExists))
    assert(s.createSchema(DbInfo(2L, "sdb"), 11L) == Left(ErrSchemaExists))
    assert(s.replaceSchema(DbInfo(1L, "renamed"), 12L).isRight)
    assert(s.schemaIdByName("sdb").isEmpty)
    assert(s.schemaIdByName("renamed").contains(1L))
    assert(s.replaceSchema(DbInfo(9L, "x"), 13L) == Left(ErrSchemaNotFound))
  }

  test("table ops: eligibility tracked per latest version, partitions inherit") {
    val s = base()
    assert(s.createTable(TableDefn(10L, 1L, "t", eligible = false,
      partitions = Seq(100L, 101L)), 20L).isRight)
    assert(s.isIneligibleTableId(10L) && s.isIneligibleTableId(100L))
    assert(s.physicalTableById(101L).map(_.id).contains(10L))
    // replace with an eligible version: the flags clear (latest tag wins)
    assert(s.replaceTable(TableDefn(10L, 1L, "t", eligible = true,
      partitions = Seq(100L, 101L)), 21L).isRight)
    assert(!s.isIneligibleTableId(10L) && !s.isIneligibleTableId(100L))
    assert(s.createTable(TableDefn(10L, 1L, "dup"), 22L) ==
      Left(ErrTableExists))
    assert(s.createTable(TableDefn(11L, 9L, "x"), 22L) ==
      Left(ErrSchemaNotFound))
  }

  test("truncate brands only vanished physical ids; rebirth clears the brand") {
    val s = base()
    s.createTable(TableDefn(10L, 1L, "t"), 20L)
    assert(s.truncateTable(10L, TableDefn(13L, 1L, "t"), 21L).isRight)
    assert(s.isTruncateTableId(10L))
    assert(s.physicalTableById(10L).isEmpty)
    assert(s.tableIdByName("sdb", "t").contains(13L))
    // partitioned: only the partition ids that vanished are branded
    s.createTable(TableDefn(12L, 1L, "p", partitions = Seq(100L, 101L)), 22L)
    assert(s.truncateTable(12L,
      TableDefn(14L, 1L, "p", partitions = Seq(101L, 102L)), 23L).isRight)
    assert(s.isTruncateTableId(100L) && !s.isTruncateTableId(101L))
    assert(!s.isTruncateTableId(12L)) // table id itself not branded here
    // rebirth of a branded id clears the brand
    assert(s.createTable(TableDefn(10L, 1L, "reborn"), 24L).isRight)
    assert(!s.isTruncateTableId(10L))
  }

  test("exchange partition swaps exactly one id pair") {
    val s = base()
    s.createSchema(DbInfo(2L, "sdb2"), 20L)
    s.createTable(TableDefn(14L, 1L, "p", partitions = Seq(101L, 102L)), 21L)
    s.createTable(TableDefn(20L, 2L, "src"), 22L)
    // new partition set: 102 out, 20 (the source table) in
    assert(s.exchangePartition(
      TableDefn(14L, 1L, "p", partitions = Seq(101L, 20L)), 23L).isRight)
    assert(s.tableIdByName("sdb2", "src").contains(102L))
    assert(s.physicalTableById(20L).map(_.id).contains(14L))
    assert(!s.isTruncateTableId(102L)) // exchange never brands
    // two-id diff: refused
    s.createTable(TableDefn(21L, 2L, "src2"), 24L)
    assert(s.exchangePartition(
      TableDefn(14L, 1L, "p", partitions = Seq(21L, 30L)), 25L) ==
      Left(ErrExchangePartition))
  }

  test("rename into a dropped schema silently leaves the universe") {
    val s = base()
    s.createSchema(DbInfo(2L, "gone"), 20L)
    s.createTable(TableDefn(10L, 1L, "t"), 21L)
    s.dropSchema(2L, 22L)
    assert(s.renameTable(10L, TableDefn(30L, 2L, "t2"), 23L) == Right(()))
    assert(s.tableIdByName("sdb", "t").isEmpty)
    assert(s.physicalTableById(30L).isEmpty) // not recreated
    // batch renames: drop-all-then-create-all allows in-batch name swaps
    s.createTable(TableDefn(40L, 1L, "a"), 24L)
    s.createTable(TableDefn(41L, 1L, "b"), 25L)
    assert(s.renameTables(Seq(
      40L -> TableDefn(42L, 1L, "b"),
      41L -> TableDefn(43L, 1L, "a")), 26L).isRight)
    assert(s.tableIdByName("sdb", "b").contains(42L))
    assert(s.tableIdByName("sdb", "a").contains(43L))
  }

  test("drop schema cascades; alter partitioning moves the table id") {
    val s = base()
    s.createTable(TableDefn(10L, 1L, "t", partitions = Seq(100L)), 20L)
    assert(s.alterPartitioning(10L, TableDefn(15L, 1L, "t"), 21L).isRight)
    assert(s.physicalTableById(10L).isEmpty)
    assert(s.physicalTableById(100L).isEmpty)
    assert(s.tableIdByName("sdb", "t").contains(15L))
    s.createTable(TableDefn(16L, 1L, "u"), 22L)
    assert(s.dropSchema(1L, 23L).isRight)
    assert(s.tables.isEmpty)
    assert(s.tableIdByName("sdb", "t").isEmpty)
  }

  test("random ops keep the universe bijective and owners live") {
    val rnd = new scala.util.Random(2101L)
    for (trial <- 0 until 200) {
      val s = new Snapshot()
      s.createSchema(DbInfo(1L, "s1"), 1L)
      s.createSchema(DbInfo(2L, "s2"), 2L)
      var nextId = 10L
      var ts = 10L
      def fresh(): Long = { nextId += 1; nextId }
      for (_ <- 0 until 40) {
        ts += 1
        val live = s.tables
        rnd.nextInt(6) match {
          case 0 =>
            val pids = if (rnd.nextBoolean()) Seq(fresh(), fresh())
                       else Seq.empty
            s.createTable(TableDefn(fresh(), 1L + rnd.nextInt(2),
              s"t$nextId", eligible = rnd.nextBoolean(), pids), ts)
          case 1 if live.nonEmpty =>
            s.dropTable(live(rnd.nextInt(live.size)).id, ts)
          case 2 if live.nonEmpty =>
            val t = live(rnd.nextInt(live.size))
            s.truncateTable(t.id, t.copy(id = fresh(),
              partitions = t.partitions.map(_ => fresh())), ts)
          case 3 if live.nonEmpty =>
            val t = live(rnd.nextInt(live.size))
            s.renameTable(t.id, t.copy(id = fresh(),
              name = s"r$nextId"), ts)
          case 4 if live.nonEmpty =>
            val t = live(rnd.nextInt(live.size))
            s.replaceTable(t.copy(eligible = !t.eligible), ts)
          case _ =>
        }
      }
      // invariants
      val byName = s.tables.map(t => s.tableIdByName(
        if (t.schemaId == 1L) "s1" else "s2", t.name))
      assert(byName.forall(_.nonEmpty), s"trial $trial: dangling name")
      assert(byName.flatten.distinct.size == byName.size,
        s"trial $trial: name collision")
      s.tables.foreach { t =>
        t.partitions.foreach { pid =>
          assert(s.physicalTableById(pid).map(_.id).contains(t.id),
            s"trial $trial: orphan partition")
          assert(!s.isTruncateTableId(pid),
            s"trial $trial: live pid branded")
        }
        assert(!s.isTruncateTableId(t.id),
          s"trial $trial: live table branded")
        assert(s.isIneligibleTableId(t.id) == !t.eligible,
          s"trial $trial: eligibility drift")
      }
    }
  }
}
