package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.core.ColumnSpec
import graft.operators.GenericCodecs
import graft.operators.GenericCodecs.CodecOpts
import graft.streaming.TableDef

/** Round-12 randomized reference-fold properties: the TableDefinition
  * marshal/parse pair against a seeded column-spec generator, and the
  * open-protocol pruning encoder (q223) against an independent
  * Scala fold of dropNotUpdatedColumns. */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  // ---- TableDef marshal vs seeded generator ---------------------------

  private def genSpec(rnd: scala.util.Random, i: Int): ColumnSpec = {
    def p(max: Int) = 1 + rnd.nextInt(max)
    val tp = rnd.nextInt(16) match {
      case 0 =>
        val b = Seq("tinyint", "smallint", "mediumint", "int", "bigint")(
          rnd.nextInt(5))
        if (rnd.nextBoolean()) s"$b(${p(20)})" else b
      case 1 => if (rnd.nextBoolean()) s"float(${p(24)})"
                else s"float(${p(24)},${rnd.nextInt(10)})"
      case 2 => if (rnd.nextBoolean()) "double"
                else s"double(${p(30)},${rnd.nextInt(10)})"
      case 3 =>
        val pr = p(38); s"decimal($pr,${rnd.nextInt(math.min(pr, 30) + 1)})"
      case 4 => s"bit(${p(64)})"
      case 5 => s"varchar(${p(255)})"
      case 6 => s"char(${p(64)})"
      case 7 => Seq("blob", "tinyblob", "mediumblob", "longblob")(
        rnd.nextInt(4)) + (if (rnd.nextBoolean()) s"(${p(999)})" else "")
      case 8 => Seq("text", "tinytext", "mediumtext", "longtext")(
        rnd.nextInt(4))
      case 9 => Seq("time", "datetime", "timestamp")(rnd.nextInt(3)) +
        (if (rnd.nextBoolean()) s"(${rnd.nextInt(7)})" else "")
      case 10 => "date"
      case 11 => s"year(4)"
      case 12 => s"enum('a','b,c','d''e')"
      case 13 => "json"
      case 14 => s"vector(${p(8)})"
      case _ => "tinyint(1)" // the MySQL bool idiom
    }
    val numeric = Seq("tinyint", "smallint", "mediumint", "int", "bigint")
      .exists(tp.startsWith)
    // names exercise the Go JSON escaping path: HTML chars, quotes,
    // control chars, backslash
    val name = s"c${i}" + (rnd.nextInt(5) match {
      case 0 => "<&>"
      case 1 => "\"q\""
      case 2 => "\t\n"
      case 3 => "\\x"
      case _ => ""
    })
    ColumnSpec(name, tp,
      nullable = i != 0 && rnd.nextBoolean(),
      isHandle = i == 0,
      unsigned = numeric && rnd.nextBoolean())
  }

  test("TableDef marshal→parse→marshal is byte-identical on 150 random tables") {
    val rnd = new scala.util.Random(1207L)
    for (trial <- 0 until 150) {
      val specs = Seq.tabulate(1 + rnd.nextInt(8))(i => genSpec(rnd, i))
      val ver = rnd.nextLong().abs
      val j = TableDef.marshalWithQuery("d b", s"t$trial", ver,
        s"CREATE TABLE `t$trial` (...)", TableDef.ActionCreateTable, specs)
      val (sch, tbl, v2, parsed) = TableDef.parse(j)
      assert((sch, tbl, v2) === (("d b", s"t$trial", ver)), s"trial $trial")
      assert(parsed.size === specs.size, s"trial $trial")
      // byte fixpoint: the declared-type reconstruction is faithful for
      // every generated (type, precision, scale, flags) combination
      val j2 = TableDef.marshalWithQuery("d b", s"t$trial", ver,
        s"CREATE TABLE `t$trial` (...)", TableDef.ActionCreateTable, parsed)
      assert(j2 === j, s"trial $trial: remarshal drifted")
      // flags and names survive the round trip exactly
      parsed.zip(specs).foreach { case (g, w) =>
        assert(g.name === w.name, s"trial $trial name")
        assert(g.nullable === w.nullable && g.isHandle === w.isHandle &&
          g.unsigned === w.unsigned, s"trial $trial flags ${w.name}")
      }
      // and the storage-sink checksum (crc32 of the query-free form) is
      // identical from original and parsed specs
      assert(TableDef.checksum("d b", s"t$trial", parsed) ===
        TableDef.checksum("d b", s"t$trial", specs), s"trial $trial crc")
    }
  }

  // ---- /synced decision kernel boundaries -----------------------------

  test("synced kernel honors the reference's strict comparisons") {
    import graft.streaming.SyncedStatus
    import graft.streaming.SyncedStatus._
    val cfg = SyncedConfig(syncedCheckIntervalSec = 300,
      checkpointIntervalSec = 15)
    def d(now: Long, last: Long, ck: Long, pr: Long, pd: Boolean = true) =
      SyncedStatus.decide(now, last, ck, pr, cfg, pd)
    // case 2 boundaries: now-last must EXCEED sci (strict >), now-ck must
    // stay UNDER ci (strict <)
    assert(d(300000, 0, 290000, 300000) === ((false, InfoWait))) // == sci
    assert(d(300001, 0, 290000, 300000) === ((true, InfoSynced)))
    // now-ck exactly == ci (15000 ms) is NOT under it → stale checkpoint
    assert(!d(300001, 0, 285001, 300000)._1)
    assert(d(300001, 0, 285002, 300000) === ((true, InfoSynced))) // 14999
    // case 3 split: resolved-ckpt gap strictly under ci → suspect PD/TiKV
    assert(d(400000, 0, 100000, 114999) === ((false, InfoCheckPdTikv)))
    assert(d(400000, 0, 100000, 115000) === ((false, InfoWait)))
    // case 1: pd down → never synced; gap strictly over ci → behind
    assert(d(400000, 0, 100000, 115001, pd = false) ===
      ((false, InfoPdUnavailableBehind)))
    assert(d(400000, 0, 100000, 115000, pd = false) ===
      ((false, InfoPdUnavailableCheck)))
  }

  // ---- open-protocol pruning (q223) vs independent fold ---------------

  test("open p/d blocks equal the reference fold on 200 random rows") {
    val rnd = new scala.util.Random(1208L)
    val specs = Seq(
      ColumnSpec("id", "bigint", nullable = false, isHandle = true),
      ColumnSpec("emb", "vector(2)"),
      ColumnSpec("qty", "int"))
    def optVec(): Option[Seq[Float]] =
      if (rnd.nextInt(4) == 0) None
      else Some(Seq.fill(2)(rnd.nextInt(8) / 4.0f))
    def optQty(): Option[Int] =
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(3))
    val rows = Seq.tabulate(200) { i =>
      val op = Seq("I", "U", "D")(rnd.nextInt(3))
      (i.toLong, op, optVec(), optVec(), optQty(), optQty())
    }
    // independent fold of open_protocol_message.go:130-167: p exists only
    // on U, carrying exactly the columns whose old value differs null-safe
    // from the new (dropNotUpdatedColumns); d exists only on D, restricted
    // to handle keys when delete-only-output-handle-key-columns
    def expected(handleOnlyDelete: Boolean) = rows.map {
      case (id, op, aV, bV, aQ, bQ) =>
        val p =
          if (op != "U") None
          else Some((Seq(
            if (aV != bV) Some("emb") else None,
            if (aQ != bQ) Some("qty") else None).flatten).sorted)
        val d =
          if (op != "D") None
          else if (handleOnlyDelete) Some(Seq("id"))
          else Some(Seq("emb", "id", "qty"))
        val u = if (op != "D") Some(Seq("emb", "id", "qty")) else None
        id -> ((u, p, d))
    }.toMap
    val df = rows.map { case (id, op, aV, bV, aQ, bQ) =>
      (op, 100L, 99L, "db", "t", id, id, aV, bV, aQ, bQ)
    }.toDF("op", "commit_ts", "start_ts", "schema_name", "table_name",
      "a_id", "b_id", "a_emb", "b_emb", "a_qty", "b_qty")
    val mapper = new ObjectMapper()
    for (handleOnly <- Seq(false, true)) {
      val msgs = df.select(col("a_id"),
          GenericCodecs.openProtocolValueWith(specs,
            CodecOpts(onlyOutputUpdatedColumns = true,
              openOutputOldValue = true,
              deleteOnlyHandleKeyColumns = handleOnly)).as("m"))
        .as[(Long, String)].collect()
      val got = msgs.map { case (id, m) =>
        val n = mapper.readTree(m)
        def keys(f: String): Option[Seq[String]] =
          if (n.get(f).isNull) None
          else Some {
            val it = n.get(f).fieldNames()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next()
            b.result().sorted
          }
        id -> ((keys("u"), keys("p"), keys("d")))
      }.toMap
      assert(got === expected(handleOnly), s"handleOnly=$handleOnly")
    }
  }
}
