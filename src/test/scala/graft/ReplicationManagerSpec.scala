package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ReplicationManager
import graft.streaming.ReplicationManager._
import graft.streaming.ReplicationSet
import graft.streaming.ReplicationSet.{Checkpoint, RepState, TableState, TableStatus}
import graft.streaming.TableSchedulers.{AddTable, BurstBalance, MoveTable, RemoveTable}

/**
 * The replication manager (replication_manager.go): AdvanceCheckpoint's
 * watermark algebra with span coverage and the redo clamps, plus the
 * running-task lifecycle — and an end-to-end mini-cluster round: burst
 * add over three captures, honest heartbeats to Replicating, a move and
 * a crash, with the watermark recomputed (and monotone) at every step.
 */
class ReplicationManagerSpec extends AnyFunSuite {

  private def sv(t: Long, s: String, e: String, ck: Long, rts: Long,
                 ls: Long = 0L, pr: Option[Long] = None): SpanView =
    SpanView(t, s, e, Checkpoint(ck, rts, ls), pr)

  private val tbl1 = Seq((1L, "a", "z"))
  private val bar = BarrierTs(10000L, 9000L, 8000L)

  test("advance: min ck / min rts / max lastSynced / min puller, slowest tracked") {
    val spans = Seq(
      sv(1L, "a", "m", 100L, 200L, ls = 50L, pr = Some(500L)),
      sv(1L, "m", "z", 120L, 150L, ls = 80L, pr = Some(400L)),
      sv(2L, "a", "z", 110L, 300L, ls = 10L, pr = Some(600L)))
    val adv = ReplicationManager.advanceCheckpoint(
      tbl1 :+ ((2L, "a", "z")), spans, bar, redoEnabled = false)
    assert(adv.watermark == Watermark(100L, 150L, 80L, 400L))
    assert(adv.slowestSink.contains((1L, "a")))
    assert(adv.slowestPuller.contains((1L, "m")))
    assert(adv.barrier == bar)
    assert(adv.redoMetaUpdate.isEmpty)
  }

  test("advance: equal-checkpoint tie goes to the smaller resolved ts (:633-639)") {
    val spans = Seq(
      sv(1L, "a", "m", 100L, 900L),
      sv(1L, "m", "z", 100L, 200L))
    val adv = ReplicationManager.advanceCheckpoint(tbl1, spans, bar,
      redoEnabled = false)
    assert(adv.slowestSink.contains((1L, "m")))
  }

  test("advance: hole / missing start / missing end -> cannot proceed") {
    val hole = Seq(sv(1L, "a", "m", 100L, 200L),
      sv(1L, "n", "z", 100L, 200L))
    val noStart = Seq(sv(1L, "b", "z", 100L, 200L))
    val noEnd = Seq(sv(1L, "a", "y", 100L, 200L))
    for (spans <- Seq(hole, noStart, noEnd, Seq.empty[SpanView])) {
      val adv = ReplicationManager.advanceCheckpoint(tbl1, spans, bar,
        redoEnabled = false)
      assert(adv.watermark == Watermark(0L, 0L, 0L, 0L))
      assert(adv.barrier == bar) // no redo: barrier untouched
    }
  }

  test("advance: cannot-proceed with redo still clamps the global barrier (:680-695)") {
    val adv = ReplicationManager.advanceCheckpoint(tbl1, Seq.empty, bar,
      redoEnabled = true, redoFlushedResolvedTs = 7500L)
    assert(adv.watermark == Watermark(0L, 0L, 0L, 0L))
    // global barrier capped at min(redoBarrierTs 8000, flushed 7500)
    assert(adv.barrier == bar.copy(globalBarrierTs = 7500L))
  }

  test("advance: empty tables advance to the barrier; checkpoint clamped to min-table") {
    val adv = ReplicationManager.advanceCheckpoint(Seq.empty, Seq.empty,
      bar, redoEnabled = false)
    assert(adv.watermark.checkpointTs == 9000L)
    assert(adv.watermark.resolvedTs == 10000L)
    // a table past the min-table barrier is clamped down (:718-720)
    val adv2 = ReplicationManager.advanceCheckpoint(tbl1,
      Seq(sv(1L, "a", "z", 9500L, 9600L)), bar, redoEnabled = false)
    assert(adv2.watermark.checkpointTs == 9000L)
    assert(adv2.watermark.resolvedTs == 9600L)
  }

  test("advance: redo clamps resolved to the redo barrier then the flushed meta") {
    val spans = Seq(sv(1L, "a", "z", 100L, 8500L))
    val adv = ReplicationManager.advanceCheckpoint(tbl1, spans, bar,
      redoEnabled = true, redoFlushedResolvedTs = 7000L)
    // resolved: 8500 -> redoBarrier 8000 -> flushed 7000
    assert(adv.watermark.resolvedTs == 7000L)
    assert(adv.watermark.checkpointTs == 100L)
    // the meta update is taken BEFORE the flushed clamp (:731-737)
    assert(adv.redoMetaUpdate.contains((100L, 8000L)))
    assert(adv.barrier.globalBarrierTs == 7000L)
  }

  test("manager: init once, task lifecycle, cap, duplicate skip, burst placeholders") {
    val m = new Manager(maxTaskConcurrency = 1)
    assert(m.handleCaptureChanges(Some(Map("cap-a" -> Seq(
      TableStatus(1L, TableState.Replicating, Checkpoint(10, 20))))),
      Seq.empty, 5L).isRight)
    assert(m.handleCaptureChanges(Some(Map.empty), Seq.empty, 5L) ==
      Left("schedulerv3: init again"))
    assert(m.replicationSets(1L).currentState == RepState.Replicating)

    // move occupies the single slot; a second task is skipped by the cap
    assert(m.handleTasks(Seq(MoveTable(1L, "cap-b"))).isRight)
    assert(m.runningTaskTables == Seq(1L))
    assert(m.handleTasks(Seq(AddTable(2L, "cap-a", 5L))) == Right(Seq.empty))
    assert(m.replicationSets.get(2L).isEmpty)

    // duplicate on the same span skipped even when a slot frees up:
    // drive table 1 back to Replicating first, sweeping the task
    val rep = m.replicationSets(1L)
    rep.poll(TableStatus(1L, TableState.Prepared), "cap-b")
    rep.poll(TableStatus(1L, TableState.Stopped, Checkpoint(11, 21)), "cap-a")
    rep.poll(TableStatus(1L, TableState.Replicating, Checkpoint(12, 22)),
      "cap-b")
    assert(rep.currentState == RepState.Replicating)
    assert(m.handleTasks(Seq.empty).isRight)
    assert(m.runningTaskTables.isEmpty)

    // burst bypasses the cap and leaves placeholders on every span
    assert(m.handleTasks(Seq(BurstBalance(
      adds = Seq(AddTable(2L, "cap-a", 5L), AddTable(3L, "cap-b", 5L)),
      removes = Seq(RemoveTable(1L, "cap-b"))))).isRight)
    assert(m.runningTaskTables == Seq(1L, 2L, 3L))
    assert(m.replicationSets(2L).currentState == RepState.Prepare)
    assert(m.replicationSets(1L).currentState == RepState.Removing)

    // a non-add task on an unknown table is skipped (:404-410)
    assert(m.handleTasks(Seq(MoveTable(99L, "cap-a"))) == Right(Seq.empty))
  }

  test("manager: capture shutdown clears the affected running task") {
    val m = new Manager(maxTaskConcurrency = 4)
    m.handleCaptureChanges(Some(Map("cap-a" -> Seq(
      TableStatus(1L, TableState.Replicating, Checkpoint(10, 20))))),
      Seq.empty, 5L)
    m.handleTasks(Seq(MoveTable(1L, "cap-b")))
    assert(m.runningTaskTables == Seq(1L))
    val out = m.handleCaptureChanges(None, Seq("cap-b"), 5L)
    assert(out.isRight)
    assert(m.runningTaskTables.isEmpty) // affected task cleaned (:227-230)
    assert(m.replicationSets(1L).currentState == RepState.Replicating)
  }

  test("end-to-end: burst add, settle, move, crash — watermark monotone") {
    val rnd = new scala.util.Random(2001L)
    for (trial <- 0 until 50) {
      val m = new Manager(maxTaskConcurrency = 8)
      m.handleCaptureChanges(Some(Map.empty), Seq.empty, 100L)
      val caps = Seq("cap-0", "cap-1", "cap-2")
      val tables = (1L to 5L)
      m.handleTasks(Seq(BurstBalance(adds = tables.zipWithIndex.map {
        case (t, i) => AddTable(t, caps(i % 3), 100L)
      })))
      val local = scala.collection.mutable.Map.empty[(Long, String), Int]
        .withDefaultValue(TableState.Absent)
      val alive = scala.collection.mutable.Set(caps: _*)
      var ck = 100L
      var lastCk = 0L

      def settle(rounds: Int): Unit = for (_ <- 0 until rounds) {
        m.replicationSets.toSeq.sortBy(_._1).foreach { case (t, rep) =>
          rep.currentCaptures.keys.toSeq.sorted
            .filter(alive).foreach { cap =>
              // honest processor: advance one local step, then heartbeat
              local((t, cap)) = local((t, cap)) match {
                case TableState.Preparing => TableState.Prepared
                case TableState.Stopping => TableState.Stopped
                case s => s
              }
              if (local((t, cap)) == TableState.Replicating) ck += 1
              val cp = if (local((t, cap)) == TableState.Replicating)
                Checkpoint(ck, ck + 5) else Checkpoint(0, 0)
              rep.poll(TableStatus(t, local((t, cap)), cp), cap) match {
                case Left(e) => fail(s"trial $trial: $e")
                case Right(ms) => ms.foreach {
                  case ReplicationSet.AddTableReq(_, to, sec, _) if alive(to) =>
                    local((t, to)) =
                      if (sec) {
                        if (local((t, to)) == TableState.Absent)
                          TableState.Preparing
                        else local((t, to))
                      } else TableState.Replicating
                  case ReplicationSet.RemoveTableReq(_, to) if alive(to) =>
                    if (local((t, to)) != TableState.Absent)
                      local((t, to)) = TableState.Stopping
                  case _ =>
                }
              }
              if (local((t, cap)) == TableState.Stopped)
                local((t, cap)) = TableState.Absent
            }
        }
        m.handleTasks(Seq.empty) // sweep finished tasks
      }

      settle(12)
      assert(m.replicationSets.values
        .forall(_.currentState == RepState.Replicating), s"trial $trial")
      assert(m.runningTaskTables.isEmpty, s"trial $trial")

      def watermark(): Watermark = {
        val views = m.replicationSets.toSeq.map { case (t, rep) =>
          SpanView(t, "a", "z", rep.currentCheckpoint)
        }
        val tablesNow = m.replicationSets.keys.toSeq.map(t => (t, "a", "z"))
        ReplicationManager.advanceCheckpoint(tablesNow, views,
          BarrierTs(Long.MaxValue / 2, Long.MaxValue / 2,
            Long.MaxValue / 2), redoEnabled = false).watermark
      }
      val w0 = watermark()
      assert(w0.checkpointTs > 0 && w0.checkpointTs <= w0.resolvedTs)
      lastCk = w0.checkpointTs

      // a random move, then a crash of a random non-primary capture
      m.handleTasks(Seq(MoveTable(1L + rnd.nextInt(5),
        caps(rnd.nextInt(3)))))
      settle(12)
      val crash = caps(rnd.nextInt(3))
      alive -= crash
      tables.foreach(t => local.remove((t, crash)))
      m.handleCaptureChanges(None, Seq(crash), 100L) match {
        case Left(e) => fail(s"trial $trial: $e")
        case Right(_) =>
      }
      // re-add any table that fell Absent, then settle again
      m.replicationSets.toSeq.foreach { case (t, rep) =>
        if (rep.currentState == RepState.Absent)
          m.handleTasks(Seq(AddTable(t, alive.toSeq.sorted.head, ck)))
      }
      settle(15)
      alive += crash // capture rejoins empty
      assert(m.replicationSets.values
        .forall(_.currentState == RepState.Replicating), s"trial $trial")
      val w1 = watermark()
      assert(w1.checkpointTs >= lastCk, s"trial $trial: regressed")
    }
  }
}
