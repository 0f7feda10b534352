package graft

import org.apache.spark.sql.functions._
import graft.diff.{DiffCheckpoint, DiffReport}

/** Pins the sync_diff report assembly (report.go TableResult /
  * CommitSummary semantics) and the chunk-checkpoint fold
  * (checkpoints.go GetChunkSnapshot + atomic save/load). */
class DiffReportSpec extends SparkSpec {
  import spark.implicits._

  private def structF(rows: (String, Boolean, Boolean, Int)*) =
    rows.map { case (t, se, sk, lack) => ("s", t, se, sk, lack) }
      .toDF("schema_name", "table_name", "struct_equal", "data_skip",
        "table_lack")

  private def chunkF(rows: (String, Int, Boolean, Long, Long, Long, Long)*) =
    rows.map { case (t, c, eq, ra, rd, up, down) =>
      ("s", t, c, eq, ra, rd, up, down) }
      .toDF("schema_name", "table_name", "chunk_id", "chunk_equal",
        "rows_add", "rows_delete", "up_count", "down_count")

  test("table states and the overall verdict follow CommitSummary") {
    val res = DiffReport.withSummary(DiffReport.tableResults(
      structF(("ok", true, false, 0), ("bad", true, false, 0),
        ("badschema", false, true, 0),
        ("gone", false, true, DiffReport.DownstreamTableLackFlag)),
      chunkF(("ok", 0, true, 0, 0, 10, 10), ("ok", 1, true, 0, 0, 5, 5),
        ("bad", 0, true, 0, 0, 7, 7), ("bad", 1, false, 2, 3, 8, 9),
        ("gone", 0, false, 25, 0, 25, 0))))
    val byT = res.collect().map(r =>
      r.getAs[String]("table_name") -> r).toMap
    assert(byT("ok").getAs[String]("state") === "pass")
    assert(byT("bad").getAs[String]("state") === "fail")
    assert(byT("bad").getAs[String]("data_diff") === "+2/-3")
    assert(byT("bad").getAs[Long]("up_count") === 15L)
    assert(byT("bad").getAs[Long]("down_count") === 16L)
    // struct mismatch with data skipped: no chunks, DataEqual stays true,
    // still fails the run (SetTableStructCheckResult:324-327)
    assert(byT("badschema").getAs[String]("state") === "fail")
    assert(byT("badschema").getAs[Boolean]("data_equal"))
    // lack table: skipped, check column renders 'skipped'
    assert(byT("gone").getAs[String]("state") === "skipped")
    assert(byT("gone").getAs[String]("check_status") === "skipped")
    assert(byT("ok").getAs[String]("result") === "fail")
    assert(byT("ok").getAs[Long]("pass_num") === 1L)
    assert(byT("ok").getAs[Long]("failed_num") === 2L)
    assert(byT("ok").getAs[Long]("skipped_num") === 1L)
  }

  test("lack-only differences leave the overall result pass") {
    // refreshResult only flips Fail for all-exist tables
    val res = DiffReport.withSummary(DiffReport.tableResults(
      structF(("ok", true, false, 0),
        ("gone", false, true, DiffReport.UpstreamTableLackFlag)),
      chunkF(("ok", 0, true, 0, 0, 3, 3), ("gone", 0, false, 0, 9, 0, 9))))
    assert(res.select("result").distinct().as[String].head() === "pass")
    assert(res.filter(col("table_name") === "gone")
      .select("data_diff").as[String].head() === "+0/-9")
  }

  test("check modes: struct-only passes bad data; data-only fails lack tables") {
    val sf = structF(("bad", true, false, 0),
      ("gone", false, true, DiffReport.DownstreamTableLackFlag))
    val cf = chunkF(("bad", 0, false, 1, 1, 5, 5), ("gone", 0, false, 9, 0, 9, 0))
    def states(mode: String): Map[String, (String, String)] = {
      val (s2, c2) = DiffReport.applyCheckMode(mode, sf, cf)
      DiffReport.withSummary(DiffReport.tableResults(s2, c2)).collect()
        .map(r => r.getAs[String]("table_name") ->
          ((r.getAs[String]("state"), r.getAs[String]("result")))).toMap
    }
    assert(states("both") === Map("bad" -> (("fail", "fail")),
      "gone" -> (("skipped", "fail"))))
    // struct-only: no data check ran — the perturbed table PASSES and the
    // run verdict flips to pass; lack still reports skipped
    assert(states("struct-only") === Map("bad" -> (("pass", "pass")),
      "gone" -> (("skipped", "pass"))))
    // data-only: StructEqual never runs, so the lack flag never reaches
    // the report — the lack-table's failing data check counts as FAIL
    assert(states("data-only") === Map("bad" -> (("fail", "fail")),
      "gone" -> (("fail", "fail"))))
    intercept[IllegalArgumentException] {
      DiffReport.applyCheckMode("bogus", sf, cf)
    }
  }

  test("savedNodeId is the maximal contiguous prefix, any completion order") {
    def saved(ids: Long*): Long =
      DiffCheckpoint.savedNodeId(ids.toDF("cid"), "cid", 8)
    assert(saved(0, 3, 1, 6) === 1L)   // 0,1 contiguous; 2 missing
    assert(saved(3, 6, 5) === -1L)     // chunk 0 outstanding
    assert(saved(0, 1, 2, 3, 4, 5, 6, 7) === 7L) // everything done
    assert(saved(7, 0) === 0L)
    // resume filter picks exactly the chunks past the node
    val rest = DiffCheckpoint.resumeFrom(
      spark.range(8).toDF("cid"), "cid", 1L).as[Long].collect().sorted
    assert(rest.toSeq === Seq(2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("checkTableMatched: abort without the skip flag, lack flags with it") {
    val conf = Seq(("s", "a", 0), ("s", "b", 0))
    val src = Set(("s", "a"), ("s", "c"))           // b missing, c extra
    val tgt = Set(("s", "a"), ("s", "b"))
    // without skip-non-existing-table: one-sided tables abort the diff
    intercept[IllegalStateException] {
      DiffReport.checkTableMatched(conf, src, tgt,
        skipNonExistingTable = false)
    }
    // with it: target-only b marks upstream-lack; source-only c appends
    // with downstream-lack
    val got = DiffReport.checkTableMatched(conf, src, tgt,
      skipNonExistingTable = true)
    assert(got === Seq(("s", "a", 0),
      ("s", "b", DiffReport.UpstreamTableLackFlag),
      ("s", "c", DiffReport.DownstreamTableLackFlag)))
    // an already-set lack flag is preserved (checkTableMatched:452)
    val kept = DiffReport.checkTableMatched(
      Seq(("s", "b", DiffReport.DownstreamTableLackFlag)),
      Set.empty, Set(("s", "b")), skipNonExistingTable = true)
    assert(kept === Seq(("s", "b", DiffReport.DownstreamTableLackFlag)))
  }

  test("randomized: report assembly equals an independent fold (30 trials)") {
    val rnd = new scala.util.Random(1211L)
    for (trial <- 0 until 30) {
      val tables = Seq.tabulate(1 + rnd.nextInt(6)) { i =>
        val lack = rnd.nextInt(4) match {
          case 0 => DiffReport.UpstreamTableLackFlag
          case 1 => DiffReport.DownstreamTableLackFlag
          case _ => DiffReport.AllTableExistFlag
        }
        (s"t$i", rnd.nextBoolean() && lack == 0, rnd.nextBoolean(), lack)
      }
      val chunks = tables.flatMap { case (t, _, _, _) =>
        Seq.fill(rnd.nextInt(4))((t, rnd.nextInt(8),
          rnd.nextBoolean(), rnd.nextInt(5).toLong, rnd.nextInt(5).toLong,
          rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      }
      val res = DiffReport.withSummary(DiffReport.tableResults(
        structF(tables.map(t => (t._1, t._2, t._3, t._4)): _*),
        chunkF(chunks: _*))).collect()
        .map(r => r.getAs[String]("table_name") -> r).toMap
      // independent fold
      val byT = chunks.groupBy(_._1)
      var anyFail = false
      val states = tables.map { case (t, se, _, lack) =>
        val cs = byT.getOrElse(t, Nil)
        val de = cs.forall(_._3)
        val state = if (se && de) "pass"
          else if (lack != 0) "skipped" else "fail"
        if (lack == 0 && !(se && de)) anyFail = true
        t -> ((state, cs.map(_._4).sum, cs.map(_._5).sum,
          cs.map(_._6).sum, cs.map(_._7).sum))
      }.toMap
      for ((t, (state, ra, rd, up, down)) <- states) {
        val r = res(t)
        assert(r.getAs[String]("state") === state, s"trial $trial $t")
        assert(r.getAs[Long]("rows_add") === ra &&
          r.getAs[Long]("rows_delete") === rd &&
          r.getAs[Long]("up_count") === up &&
          r.getAs[Long]("down_count") === down, s"trial $trial $t")
        assert(r.getAs[String]("result") ===
          (if (anyFail) "fail" else "pass"), s"trial $trial")
        assert(r.getAs[Long]("pass_num") ===
          states.values.count(_._1 == "pass").toLong, s"trial $trial")
      }
    }
  }

  test("printSummary reproduces Report.Print's prose byte-for-byte") {
    import DiffReport.TableSummary
    // all equal
    assert(DiffReport.printSummary(Seq(
      TableSummary("s", "a", true, true, false, 0),
      TableSummary("s", "b", true, true, false, 0)), "/out", "/fix") ===
      "A total of 2 table have been compared and all are equal.\n" +
      "You can view the comparison details through '/out/sync_diff.log'\n")
    // the mixed case: data diff, struct-skip, both lack directions
    val got = DiffReport.printSummary(Seq(
      TableSummary("s", "ok", true, true, false, 0),
      TableSummary("s", "bad", true, false, false, 0),
      TableSummary("s", "schema", false, true, true, 0),
      TableSummary("s", "up`x", false, false, true,
        DiffReport.UpstreamTableLackFlag),
      TableSummary("s", "down", false, false, true,
        DiffReport.DownstreamTableLackFlag)), "/out", "/fix")
    assert(got ===
      "The data of `s`.`bad` is not equal\n" +
      "The data of `s`.`down` does not exist in downstream database\n" +
      "The structure of `s`.`schema` is not equal, and data-check is skipped\n" +
      "The data of `s`.`up``x` does not exist in upstream database\n" +
      "\nThe rest of tables are all equal.\n\n" +
      "A total of 5 tables have been compared, 1 tables finished, " +
      "2 tables failed, 2 tables skipped.\n" +
      "The patch file has been generated in \n\t'/fix/'\n" +
      "You can view the comparison details through '/out/sync_diff.log'\n",
      got)
  }

  test("flat savedNodeId equals the reference's hierarchical heap fold") {
    // The reference orders chunks hierarchically — (tableIndex,
    // bucketIndexLeft/Right, chunkIndex) with first/last markers — and
    // advances the checkpoint by heap-popping while the head IsAdjacent
    // to the saved node (checkpoints.go:98-141,259-269). The repo
    // flattens that to "global position" + min-missing-id. This twin
    // implements the REFERENCE fold over randomly generated hierarchies
    // and random completion orders, and the two must agree at every step.
    case class Node(tbl: Int, bL: Int, bR: Int, ck: Int,
        firstForTable: Boolean, lastForTable: Boolean,
        firstForBucket: Boolean, lastForBucket: Boolean)
    def isAdjacent(n: Node, next: Node): Boolean =
      if (n.tbl == next.tbl - 1) n.lastForTable && next.firstForTable
      else if (n.tbl == next.tbl) {
        if (n.bR == next.bL - 1) n.lastForBucket && next.firstForBucket
        else if (n.bL == next.bL) n.ck == next.ck - 1
        else false
      } else false
    val rnd = new scala.util.Random(1210L)
    for (trial <- 0 until 40) {
      // random hierarchy: 1-3 tables × 1-4 buckets × 1-5 chunks
      val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
      val nTables = 1 + rnd.nextInt(3)
      for (t <- 0 until nTables) {
        val nBuckets = 1 + rnd.nextInt(4)
        val perBucket = Seq.fill(nBuckets)(1 + rnd.nextInt(5))
        for (b <- 0 until nBuckets; c <- 0 until perBucket(b))
          nodes += Node(t, b, b, c,
            firstForTable = b == 0 && c == 0,
            lastForTable = b == nBuckets - 1 && c == perBucket(b) - 1,
            firstForBucket = c == 0, lastForBucket = c == perBucket(b) - 1)
      }
      val order = rnd.shuffle(nodes.indices.toList)
      // reference fold: ordered-set stand-in for the min-heap (IsLess
      // follows global order by construction), popped while adjacent
      var saved = -1 // "init node" sits before the first chunk
      val heap = scala.collection.mutable.TreeSet.empty[Int]
      val sparkCheckAt = rnd.nextInt(order.size)
      for ((flatIdx, k) <- order.zipWithIndex) {
        heap += flatIdx
        var advancing = true
        while (advancing && heap.nonEmpty) {
          val head = heap.head
          val adjacent =
            if (saved == -1) head == 0 && nodes(0).firstForBucket
            else isAdjacent(nodes(saved), nodes(head))
          if (adjacent) { saved = head; heap -= head }
          else advancing = false
        }
        // flat min-missing over the SAME completed set must agree at
        // EVERY step (pure fold); the Spark implementation is tied in
        // once per trial at a random step
        val completed = order.take(k + 1).toSet
        var flat = -1
        while (completed(flat + 1)) flat += 1
        assert(flat === saved,
          s"trial $trial after ${k + 1} completions: flat $flat vs ref $saved")
        if (k == sparkCheckAt)
          assert(graft.diff.DiffCheckpoint.savedNodeId(
            completed.toSeq.map(_.toLong).toDF("cid"), "cid",
            nodes.size) === saved.toLong, s"trial $trial spark check")
      }
    }
  }

  test("checkpoint sidecar round-trips atomically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val p = s"$dir/sync_diff_checkpoints"
    assert(DiffCheckpoint.load(p).isEmpty)
    DiffCheckpoint.save(p, 17L, DiffCheckpoint.SuccessState)
    assert(DiffCheckpoint.load(p) === Some((17L, "success")))
    DiffCheckpoint.save(p, 23L, DiffCheckpoint.FailedState) // overwrite
    assert(DiffCheckpoint.load(p) === Some((23L, "failed")))
    // no torn temp files left behind
    assert(new java.io.File(dir).listFiles().map(_.getName).toSeq ===
      Seq("sync_diff_checkpoints"))
  }
}
