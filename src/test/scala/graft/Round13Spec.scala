package graft

import org.apache.spark.sql.functions._
import graft.streaming.Bootstrap
import graft.streaming.Bootstrap.BootstrapConfig
import graft.diff.DiffReport

/** Round-13 randomized reference-fold properties over the round-12
  * kernels, with RANDOM CONFIGS (the fixed-config simulator in
  * BootstrapSpec leaves the tick/gc phase interplay untested):
  *
  *  - the bootstrap-worker replay against an independent global-clock
  *    simulator under randomized knobs — interval < tick, count = 1,
  *    maxInactive < gc, tick/gc non-multiples, plus occasional disabled
  *    configs;
  *  - the diff report assembly WITH the check-mode switch against a
  *    direct Go-semantics CASE replay of (mode, struct, data, lack)
  *    tuples (main.go:115-140 × CommitSummary:175-187).
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  // ---- bootstrap cadence under random configs --------------------------

  test("bootstrap replay equals a global-clock simulator under 100 random configs") {
    val rnd = new scala.util.Random(1301L)
    val Grid = 500L // all instants live on a 500 ms grid
    for (trial <- 0 until 100) {
      val cfg = BootstrapConfig(
        // intervalSec may undercut tickSec; inMsgCount down to 1
        intervalSec = 1 + rnd.nextInt(30),
        inMsgCount = 1 + rnd.nextInt(6),
        maxInactiveSec = 1 + rnd.nextInt(50), // may undercut gcSec
        tickSec = 1 + rnd.nextInt(7),
        gcSec = 1 + rnd.nextInt(40)) // need not be a tick multiple
      val tables = Seq.tabulate(1 + rnd.nextInt(3))(i => s"t$i")
      val events = tables.flatMap { t =>
        var ts = rnd.nextInt(10) * Grid
        Seq.fill(rnd.nextInt(20)) {
          val e = (t, ts)
          ts += (1 + rnd.nextInt(120)) * Grid // gaps up to 60 s
          e
        }
      }.sortBy(_._2)
      if (events.nonEmpty) {
        val horizon = events.map(_._2).max + rnd.nextInt(40) * Grid
        val tickMs = cfg.tickSec * 1000L
        val gcMs = cfg.gcSec * 1000L
        // independent simulator: ONE global clock over the shared grid
        val expected = scala.collection.mutable.Set.empty[(String, Long, String)]
        val st = scala.collection.mutable.Map.empty[String,
          (Long, Long, Long)] // lastSend, counter, lastRecv
        var evIdx = 0
        var t = 0L
        while (t <= horizon) {
          while (evIdx < events.length && events(evIdx)._2 == t) {
            val (tbl, _) = events(evIdx)
            st.get(tbl) match {
              case None =>
                expected += ((tbl, t, "new")); st(tbl) = (t, 0L, t)
              case Some((ls, c, _)) => st(tbl) = (ls, c + 1, t)
            }
            evIdx += 1
          }
          if (t > 0 && t % tickMs == 0)
            for ((tbl, (ls, c, lr)) <- st) {
              val timeDue = t - ls >= cfg.intervalSec * 1000L
              if (timeDue || c >= cfg.inMsgCount) {
                expected += ((tbl, t, if (timeDue) "interval" else "count"))
                st(tbl) = (t, 0L, lr)
              }
            }
          if (t > 0 && t % gcMs == 0) // gc strictly after the tick
            st.filterInPlace { case (_, (_, _, lr)) =>
              t - lr <= cfg.maxInactiveSec * 1000L }
          t += Grid
        }
        val df = events.map { case (tb, ts) => ("db", tb, ts, 2) }
          .toDF("schema_name", "table_name", "ts_ms", "total_partition")
        val got = Bootstrap.sends(df, cfg, horizon)
          .select("table_name", "send_ms", "trigger")
          .as[(String, Long, String)].collect().toSet
        assert(got === expected.toSet, s"trial $trial cfg=$cfg")
      }
      // sprinkle disabled configs: either knob non-positive → no sends
      if (trial % 25 == 0) {
        val dis = if (rnd.nextBoolean()) cfg.copy(intervalSec = 0)
                  else cfg.copy(inMsgCount = 0)
        val df = Seq(("db", "t", 1000L, 2))
          .toDF("schema_name", "table_name", "ts_ms", "total_partition")
        assert(Bootstrap.sends(df, dis, 60000L).count() === 0L)
      }
    }
  }

  // ---- check-mode × classification against a direct Go replay ----------

  private def structF(rows: (String, Boolean, Boolean, Int)*) =
    rows.map { case (t, se, sk, lack) => ("s", t, se, sk, lack) }
      .toDF("schema_name", "table_name", "struct_equal", "data_skip",
        "table_lack")

  private def chunkF(rows: (String, Int, Boolean, Long, Long)*) =
    rows.map { case (t, c, eq, ra, rd) => ("s", t, c, eq, ra, rd, 10L, 10L) }
      .toDF("schema_name", "table_name", "chunk_id", "chunk_equal",
        "rows_add", "rows_delete", "up_count", "down_count")

  test("check-mode × report classification equals a direct Go replay (600 tuples)") {
    val rnd = new scala.util.Random(1302L)
    for (batch <- 0 until 2; mode <- Seq("both", "struct-only", "data-only")) {
      val tables = Seq.tabulate(100) { i =>
        val lack = rnd.nextInt(4) match {
          case 0 => DiffReport.UpstreamTableLackFlag
          case 1 => DiffReport.DownstreamTableLackFlag
          case _ => DiffReport.AllTableExistFlag
        }
        // reference invariant: struct_equal false whenever the table
        // lacks (SetTableStructCheckResult receives isEqual=false there)
        (s"t$i", rnd.nextBoolean() && lack == 0, rnd.nextBoolean(), lack)
      }
      val chunks = tables.flatMap { case (t, _, _, _) =>
        Seq.fill(rnd.nextInt(3))((t, rnd.nextInt(8), rnd.nextBoolean(),
          rnd.nextInt(5).toLong, rnd.nextInt(5).toLong))
      }
      val (sf, cf) = DiffReport.applyCheckMode(mode, structF(tables: _*),
        chunkF(chunks: _*))
      val res = DiffReport.withSummary(DiffReport.tableResults(sf, cf))
        .collect().map(r => r.getAs[String]("table_name") -> r).toMap

      // direct replay of main.go's mode switch composed with
      // CommitSummary's CASE — written from the Go, not from the
      // DataFrame code
      val byT = chunks.groupBy(_._1)
      val states = tables.map { case (t, se0, _, lack0) =>
        val (se, lack, de) = mode match {
          case "struct-only" => (se0, lack0, true) // Equal never runs
          case "data-only" => // StructEqual never runs; lack unreported
            (true, DiffReport.AllTableExistFlag,
              byT.getOrElse(t, Nil).forall(_._3))
          case _ => (se0, lack0, byT.getOrElse(t, Nil).forall(_._3))
        }
        val state =
          if (se && de) "pass"
          else if (lack != DiffReport.AllTableExistFlag) "skipped"
          else "fail"
        (t, state, lack == DiffReport.AllTableExistFlag && !(se && de))
      }
      val anyFail = states.exists(_._3)
      val byState = states.groupBy(_._2).view.mapValues(_.size.toLong)
        .toMap.withDefaultValue(0L)
      for ((t, state, _) <- states) {
        val r = res(t)
        assert(r.getAs[String]("state") === state, s"$mode $batch $t")
        assert(r.getAs[String]("result") ===
          (if (anyFail) "fail" else "pass"), s"$mode $batch")
        assert(r.getAs[Long]("pass_num") === byState("pass") &&
          r.getAs[Long]("failed_num") === byState("fail") &&
          r.getAs[Long]("skipped_num") === byState("skipped"),
          s"$mode $batch")
      }
    }
  }
}
