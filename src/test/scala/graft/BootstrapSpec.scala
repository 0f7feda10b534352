package graft

import org.apache.spark.sql.functions._
import graft.streaming.Bootstrap
import graft.streaming.Bootstrap.BootstrapConfig

/** Pins the bootstrap-worker replay ([[Bootstrap]], reference
  * bootstraper.go) on hand-computed micro-scenarios: immediate new-table
  * send, tick-granular count trigger, interval re-send on idle tables,
  * GC removal strictly past max-inactive with re-add-as-new, the
  * arrivals-then-tick-then-gc tie order, the fan-out modes, and the
  * both-knobs-positive disable rule. */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = BootstrapConfig(intervalSec = 20, inMsgCount = 3,
    maxInactiveSec = 60, tickSec = 5, gcSec = 30)

  private def ev(rows: (String, Long)*) =
    rows.map { case (t, ts) => ("db", t, ts, 2) }
      .toDF("schema_name", "table_name", "ts_ms", "total_partition")

  private def run(df: org.apache.spark.sql.DataFrame, horizon: Long,
                  c: BootstrapConfig = cfg): Seq[(Long, String)] =
    Bootstrap.sends(df, c, horizon)
      .orderBy("send_ms")
      .select(col("send_ms"), col("trigger"))
      .as[(Long, String)].collect().toSeq

  test("new table sends immediately; first event does not count") {
    // events at 1s,2s,3s: first registers+sends; counter reaches 2 (<3)
    // by the 5s tick, and 20s interval not due until t=21s → tick at 25s
    val got = run(ev(("t", 1000L), ("t", 2000L), ("t", 3000L)), 26000L)
    assert(got === Seq(1000L -> "new", 25000L -> "interval"))
  }

  test("count trigger fires at the NEXT tick, not mid-window") {
    // 3 events right after the 5s tick → count=3 reached at 6.2s but the
    // worker only checks on ticks → send at 10s, trigger 'count'
    val got = run(ev(("t", 1000L), ("t", 5500L), ("t", 6000L), ("t", 6200L)),
      12000L)
    assert(got === Seq(1000L -> "new", 10000L -> "count"))
  }

  test("time condition wins the trigger label (Go check order)") {
    // count ALSO satisfied at 25s tick (3 arrivals), but 25s-1s >= 20s →
    // labeled 'interval' per shouldSendBootstrapMsg's || order
    val got = run(ev(("t", 1000L), ("t", 21000L), ("t", 22000L),
      ("t", 23000L)), 26000L)
    assert(got === Seq(1000L -> "new", 25000L -> "interval"))
  }

  test("idle active table re-sends every interval until GC removes it") {
    // single event at 1s; interval sends at 25s, 45s, 65s, 85s (first
    // tick with t - lastSend >= 20s; the 85s tick still precedes the 90s
    // GC pass); GC at 60s keeps it (60-1=59 NOT > 60 — strict >), GC at
    // 90s removes it (89 > 60); nothing after removal
    val got = run(ev(("t", 1000L)), 120000L)
    assert(got === Seq(1000L -> "new", 25000L -> "interval",
      45000L -> "interval", 65000L -> "interval", 85000L -> "interval"))
  }

  test("re-add after GC removal sends as new") {
    val got = run(ev(("t", 1000L), ("t", 100000L)), 101000L)
    assert(got.head === 1000L -> "new")
    assert(got.last === 100000L -> "new") // re-registered, immediate send
  }

  test("arrival at a GC instant refreshes activity before the GC check") {
    // event at exactly 90s (would-be removal instant): arrivals process
    // first → lastRecv=90s → NOT removed; the idle cadence continues from
    // the last send (85s) → next interval send at 105s
    val got = run(ev(("t", 1000L), ("t", 90000L)), 120000L)
    assert(got.contains(105000L -> "interval")) // still active past 90s
  }

  test("fan-out: all partitions vs partition 0 only") {
    val sends = Bootstrap.sends(ev(("t", 1000L)), cfg, 2000L)
    assert(Bootstrap.fanOut(sends, cfg).select("partition")
      .as[Int].collect().sorted.toSeq === Seq(0, 1))
    assert(Bootstrap.fanOut(sends, cfg.copy(toAllPartition = false))
      .select("partition").as[Int].collect().toSeq === Seq(0))
  }

  test("disabled unless both knobs positive (ShouldSendBootstrapMsg)") {
    assert(!Bootstrap.enabled(cfg.copy(intervalSec = 0)))
    assert(!Bootstrap.enabled(cfg.copy(inMsgCount = -1)))
    assert(Bootstrap.enabled(cfg))
    assert(run(ev(("t", 1000L)), 60000L, cfg.copy(inMsgCount = 0)).isEmpty)
  }

  test("tables replay independently under one shuffle") {
    val got = Bootstrap.sends(
      ev(("a", 1000L), ("b", 2000L), ("a", 3000L)), cfg, 4000L)
      .select("table_name", "send_ms", "trigger")
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(("a", 1000L, "new"), ("b", 2000L, "new")))
  }

  test("send-all-bootstrap-at-start: per current table at t=0, views skip") {
    val tables = Seq(("db", "a", false, 2), ("db", "b", false, 3),
      ("db", "v", true, 2))
      .toDF("schema_name", "table_name", "is_view", "total_partition")
    val got = Bootstrap.atStartSends(tables, cfg, sendAllAtStart = true)
      .select("table_name", "send_ms", "trigger")
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(("a", 0L, "start"), ("b", 0L, "start")))
    // flag off, or worker disabled → nothing (ShouldSendAllBootstrapAtStart
    // requires ShouldSendBootstrapMsg too, sink.go:240)
    assert(Bootstrap.atStartSends(tables, cfg, sendAllAtStart = false)
      .count() === 0L)
    assert(Bootstrap.atStartSends(tables, cfg.copy(intervalSec = 0),
      sendAllAtStart = true).count() === 0L)
  }

  test("randomized: replay equals an independent global-clock simulator") {
    // The operator folds per-table with a per-table tick cursor; this twin
    // simulates ONE global clock over all tables interleaved — a different
    // code shape with the same spec. 30 seeded trials, dense tie cases
    // (timestamps snap to multiples of 2500 so arrivals hit tick AND gc
    // instants), gaps long enough to GC.
    val rnd = new scala.util.Random(1209L)
    for (trial <- 0 until 30) {
      val tables = Seq("t0", "t1", "t2")
      val events = tables.flatMap { t =>
        var ts = rnd.nextInt(8) * 2500L
        Seq.fill(rnd.nextInt(25)) {
          val e = (t, ts)
          ts += (1 + rnd.nextInt(40)) * 2500L // gaps up to 100 s > inact
          e
        }
      }.sortBy(_._2)
      if (events.nonEmpty) {
        val horizon = events.map(_._2).max + rnd.nextInt(20) * 2500L
        // independent simulator: advance one global ms grid of instants
        val expected = scala.collection.mutable.Set.empty[(String, Long, String)]
        val st = scala.collection.mutable.Map.empty[String,
          (Long, Long, Long)] // lastSend, counter, lastRecv
        var evIdx = 0
        for (t <- 0L to horizon) {
          // arrivals first
          while (evIdx < events.length && events(evIdx)._2 == t) {
            val (tbl, _) = events(evIdx)
            st.get(tbl) match {
              case None =>
                expected += ((tbl, t, "new")); st(tbl) = (t, 0L, t)
              case Some((ls, c, _)) => st(tbl) = (ls, c + 1, t)
            }
            evIdx += 1
          }
          if (t > 0 && t % 5000 == 0) // tick
            for ((tbl, (ls, c, lr)) <- st) {
              val timeDue = t - ls >= cfg.intervalSec * 1000
              if (timeDue || c >= cfg.inMsgCount) {
                expected += ((tbl, t, if (timeDue) "interval" else "count"))
                st(tbl) = (t, 0L, lr)
              }
            }
          if (t > 0 && t % 30000 == 0) // gc after tick
            st.filterInPlace { case (_, (_, _, lr)) =>
              t - lr <= cfg.maxInactiveSec * 1000 }
        }
        val got = Bootstrap.sends(ev(events: _*), cfg, horizon)
          .select("table_name", "send_ms", "trigger")
          .as[(String, Long, String)].collect().toSet
        assert(got === expected.toSet, s"trial $trial")
      }
    }
  }
}
