package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Coordinator
import graft.streaming.Coordinator.{Coord, Incoming}
import graft.streaming.CaptureManager.{LivenessAlive, LivenessStopping}
import graft.streaming.ReplicationManager.{BarrierTs, Watermark}
import graft.streaming.ReplicationSet
import graft.streaming.ReplicationSet.{AddTableReq, Checkpoint, RemoveTableReq, RepState, TableState, TableStatus}

/**
 * The coordinator poll round (coordinator.go:268-385) driven end-to-end:
 * a mini-cluster of honest processors behind the real five-kernel
 * composition — cold start through the init barrier, burst add,
 * convergence to Replicating with a real watermark, a manual move, a
 * drain that empties the stopping capture, and a crash that basic
 * re-schedules — with the watermark monotone across every proceeding
 * round.
 */
class CoordinatorSpec extends AnyFunSuite {

  private val barrier =
    BarrierTs(1L << 40, (1L << 40) - 10, (1L << 40) - 20)

  /** Honest processor cluster: advances Preparing→Prepared and
    * Stopping→Stopped one round at a time, reports per-capture statuses,
    * applies dispatches, bumps checkpoints while replicating. */
  private final class Cluster(caps: Seq[String]) {
    val coord = new Coord("cap-0", 7L, heartbeatTick = 1,
      collectStatsTick = 4, maxTaskConcurrency = 8, addTableBatchSize = 10)
    val alive = scala.collection.mutable.LinkedHashMap(
      caps.map(c => c -> s"addr-$c"): _*)
    val proc = scala.collection.mutable.Map.empty[(String, Long), Int]
    val liveness = scala.collection.mutable.Map(
      caps.map(_ -> LivenessAlive): _*)
    var ck = 1000L
    var lastGood: Option[Watermark] = None

    def round(currentTables: Seq[Long]): Watermark = {
      // build responses from current processor state, advancing timers
      val incoming = alive.keys.toSeq.map { cap =>
        val sts = proc.keys.toSeq.filter(_._1 == cap).sorted.map { k =>
          proc(k) = proc(k) match {
            case TableState.Preparing => TableState.Prepared
            case TableState.Stopping => TableState.Stopped
            case s => s
          }
          val st = proc(k)
          if (st == TableState.Replicating) ck += 3
          TableStatus(k._2, st,
            if (st == TableState.Replicating) Checkpoint(ck, ck + 2)
            else Checkpoint(0, 0))
        }
        Incoming(cap, s"epoch-$cap", liveness(cap), sts)
      }
      // a table reported Stopped is gone from the processor
      proc.keys.toSeq.foreach(k =>
        if (proc(k) == TableState.Stopped) proc.remove(k))
      val res = coord.poll(
        lastGood.map(_.checkpointTs).getOrElse(100L), currentTables,
        alive.toMap, barrier, incoming) match {
        case Left(e) => fail(s"poll error: $e")
        case Right(r) => r
      }
      res.dispatches.foreach {
        case AddTableReq(t, to, sec, _) if alive.contains(to) =>
          if (sec) {
            if (proc.getOrElse((to, t), TableState.Absent) ==
                TableState.Absent)
              proc((to, t)) = TableState.Preparing
          } else proc((to, t)) = TableState.Replicating
        case RemoveTableReq(t, to) if alive.contains(to) =>
          if (proc.getOrElse((to, t), TableState.Absent) !=
              TableState.Absent)
            proc((to, t)) = TableState.Stopping
        case _ =>
      }
      // owner-side drain signal: an isStopping heartbeat flips liveness
      res.heartbeats.foreach(h =>
        if (h.isStopping) liveness(h.to) = LivenessStopping)
      val w = res.watermark
      if (w.checkpointTs > 0) {
        lastGood.foreach(prev =>
          assert(w.checkpointTs >= prev.checkpointTs &&
            w.resolvedTs >= prev.resolvedTs, "watermark regressed"))
        lastGood = Some(w)
      }
      w
    }

    private def rep(t: Long) = coord.replicationM.replicationSets(t)

    def allReplicating(tables: Seq[Long]): Boolean =
      tables.forall(t => coord.replicationM.replicationSets.get(t)
        .exists(_.currentState == RepState.Replicating))

    def primaries(tables: Seq[Long]): Map[Long, String] =
      tables.map(t => t -> rep(t).currentPrimary).toMap
  }

  test("cold start: init barrier, burst add, convergence, real watermark") {
    val c = new Cluster(Seq("cap-0", "cap-1", "cap-2"))
    val tables = Seq(1L, 2L, 3L, 4L, 5L)
    // round 1: captures uninitialized, short-circuit path, zero watermark
    assert(c.round(tables) == Watermark(0, 0, 0, 0))
    var rounds = 1
    while (!c.allReplicating(tables) && rounds < 20) {
      c.round(tables); rounds += 1
    }
    assert(c.allReplicating(tables), s"not converged after $rounds rounds")
    // round-robin burst add balances within the ceiling
    val byCap = c.primaries(tables).groupBy(_._2).view.mapValues(_.size)
    assert(byCap.values.forall(_ <= 2), byCap.toMap.toString)
    // one more round: a real, fully-populated watermark
    val w = c.round(tables)
    assert(w.checkpointTs > 100L && w.resolvedTs >= w.checkpointTs)
    assert(w.lastSyncedTs == 0L) // sim never reports lastSyncedTs
    assert(w.pullerResolvedTs > 0L) // seeded puller-egress stage
    assert(c.coord.replicationM.runningTaskTables.isEmpty)
  }

  test("manual move relocates the table through the handoff") {
    val c = new Cluster(Seq("cap-0", "cap-1"))
    val tables = Seq(1L, 2L)
    var rounds = 0
    while (!c.allReplicating(tables) && rounds < 20) {
      c.round(tables); rounds += 1
    }
    val before = c.primaries(tables)
    val dest = if (before(1L) == "cap-0") "cap-1" else "cap-0"
    // the move makes a 2/0 skew that the per-tick periodic balance would
    // immediately undo; its production interval gate spaces that out
    c.coord.schedState.balanceAllowed = false
    assert(c.coord.moveTable(1L, dest))
    assert(!c.coord.moveTable(1L, dest)) // pending move declines repeats
    rounds = 0
    while ((c.primaries(tables)(1L) != dest ||
        !c.allReplicating(tables)) && rounds < 25) {
      c.round(tables); rounds += 1
    }
    assert(c.primaries(tables)(1L) == dest, s"move not done in $rounds")
    assert(c.allReplicating(tables))
  }

  test("drain empties the target capture and resets the state") {
    val c = new Cluster(Seq("cap-0", "cap-1", "cap-2"))
    val tables = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    var rounds = 0
    while (!c.allReplicating(tables) && rounds < 25) {
      c.round(tables); rounds += 1
    }
    assert(c.coord.drainCapture("cap-1"))
    assert(!c.coord.drainCapture("cap-2")) // one drain at a time
    rounds = 0
    while ((c.primaries(tables).values.exists(_ == "cap-1") ||
        !c.allReplicating(tables)) && rounds < 60) {
      c.round(tables); rounds += 1
    }
    assert(!c.primaries(tables).values.exists(_ == "cap-1"),
      s"cap-1 still owns tables after $rounds rounds")
    // the drain state resets once the capture is empty
    var guard = 0
    while (c.coord.schedState.drainTarget.nonEmpty && guard < 10) {
      c.round(tables); guard += 1
    }
    assert(c.coord.schedState.drainTarget.isEmpty)
  }

  test("capture crash: removal feeds the sets, basic re-adds, recovers") {
    val c = new Cluster(Seq("cap-0", "cap-1"))
    val tables = Seq(1L, 2L, 3L)
    var rounds = 0
    while (!c.allReplicating(tables) && rounds < 20) {
      c.round(tables); rounds += 1
    }
    // cap-1 dies: leaves the alive map, its processor state vanishes
    c.alive.remove("cap-1")
    tables.foreach(t => c.proc.remove(("cap-1", t)))
    rounds = 0
    while ((!c.allReplicating(tables) ||
        c.primaries(tables).values.exists(_ == "cap-1")) && rounds < 30) {
      c.round(tables); rounds += 1
    }
    assert(c.allReplicating(tables), s"not recovered after $rounds")
    assert(c.primaries(tables).values.forall(_ == "cap-0"))
  }

  test("dropped table is removed; rebalance evens a skewed placement") {
    val c = new Cluster(Seq("cap-0", "cap-1"))
    val tables = Seq(1L, 2L, 3L, 4L)
    var rounds = 0
    while (!c.allReplicating(tables) && rounds < 20) {
      c.round(tables); rounds += 1
    }
    // drop table 4 from the current set: basic emits the remove
    val kept = tables.take(3)
    rounds = 0
    while (c.coord.replicationM.replicationSets.contains(4L) &&
        rounds < 20) {
      c.round(kept); rounds += 1
    }
    assert(!c.coord.replicationM.replicationSets.contains(4L))
    // skew: move everything to cap-0, then trigger a manual rebalance.
    // The periodic balance would undo the skew every tick (its interval
    // gate is what spaces it out in production) — close the gate.
    c.coord.schedState.balanceAllowed = false
    kept.foreach { t =>
      if (c.primaries(kept)(t) != "cap-0") c.coord.moveTable(t, "cap-0")
    }
    rounds = 0
    while ((!c.allReplicating(kept) ||
        c.primaries(kept).values.exists(_ != "cap-0")) && rounds < 40) {
      c.round(kept); rounds += 1
    }
    assert(c.primaries(kept).values.forall(_ == "cap-0"))
    c.coord.rebalance()
    rounds = 0
    while ((!c.allReplicating(kept) ||
        c.primaries(kept).groupBy(_._2).values.map(_.size).max > 2) &&
        rounds < 40) {
      c.round(kept); rounds += 1
    }
    val sizes = c.primaries(kept).groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.max <= 2, sizes.toMap.toString)
  }
}
