package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Agent
import graft.streaming.Agent.{CaptureAgent, TableExecutor}
import graft.streaming.CaptureManager.{LivenessAlive, LivenessStopping}
import graft.streaming.Coordinator.{Coord, Incoming}
import graft.streaming.ReplicationManager.BarrierTs
import graft.streaming.ReplicationSet.{AddTableReq, Checkpoint, RemoveTableReq, RepState, TableState, TableStatus}

/**
 * The processor-side agent (scheduler/internal/v3/agent/): the tableSpan
 * task machine against a simulated executor, the owner-revision/epoch
 * guards — then the CLOSED LOOP: a real Coordinator and real
 * CaptureAgents exchanging heartbeats and dispatches with no hand-written
 * processor logic, converging through add, move, auto-adopted drain and
 * crash.
 */
class AgentSpec extends AnyFunSuite {

  test("owner handshake: equal rev same id, higher rev resets epoch, staled dropped") {
    val a = new CaptureAgent("cap-1", new Agent.StepExecutor)
    val e0 = a.epoch
    assert(a.handleOwnerInfo("owner-a", 5L) == Right(true))
    assert(a.epoch != e0) // adopting an owner resets the processor epoch
    val e1 = a.epoch
    assert(a.handleOwnerInfo("owner-a", 5L) == Right(true))
    assert(a.epoch == e1) // same owner, same revision: no reset
    assert(a.handleOwnerInfo("owner-b", 5L) ==
      Left("schedulerv3: owner IDs do not match"))
    assert(a.handleOwnerInfo("owner-old", 4L) == Right(false)) // staled
    assert(a.handleOwnerInfo("owner-b", 6L) == Right(true)) // new owner
    assert(a.epoch != e1)
  }

  test("add task: Preparing stays silent, Prepared responds, stale epoch dropped") {
    val ex = new Agent.StepExecutor
    val a = new CaptureAgent("cap-1", ex)
    a.handleOwnerInfo("owner", 1L)
    a.dispatchAdd(7L, Checkpoint(100, 100), isSecondary = true,
      "wrong-epoch")
    assert(a.trackedTables.isEmpty) // stale epoch: dropped wholesale
    a.dispatchAdd(7L, Checkpoint(100, 100), isSecondary = true, a.epoch)
    assert(a.trackedTables == Seq(7L))
    // first poll starts the executor; Preparing reports NOTHING (:227)
    assert(a.pollTables().isEmpty)
    assert(ex.state(7L) == TableState.Preparing)
    ex.tick() // Preparing -> Prepared
    val resp = a.pollTables()
    assert(resp.map(s => (s.tableId, s.state)) ==
      Seq((7L, TableState.Prepared)))
    // prepared is stable for a prepare task: the task is done
    assert(a.pollTables().isEmpty)
    // second-phase add: received -> processed -> replicating
    a.dispatchAdd(7L, Checkpoint(100, 100), isSecondary = false, a.epoch)
    assert(a.pollTables().map(_.state) == Seq(TableState.Prepared))
    ex.tick() // Prepared -> Replicating
    assert(a.pollTables().map(_.state) == Seq(TableState.Replicating))
  }

  test("remove task: Stopping then Stopped with final checkpoint, table dropped") {
    val ex = new Agent.StepExecutor
    val a = new CaptureAgent("cap-1", ex)
    a.handleOwnerInfo("owner", 1L)
    a.dispatchAdd(7L, Checkpoint(100, 100), isSecondary = false, a.epoch)
    a.pollTables(); ex.tick(); a.pollTables(); ex.tick()
    assert(a.pollTables().map(_.state) == Seq(TableState.Replicating))
    // a remove for an untracked table is ignored (:370-381)
    a.dispatchRemove(99L, a.epoch)
    assert(a.trackedTables == Seq(7L))
    a.dispatchRemove(7L, a.epoch)
    // heartbeat shows Stopping for a pending remove (:281-283)
    val (hb, _, _) = a.handleHeartbeat(Seq.empty, isStopping = false,
      collectStats = false)
    assert(hb.map(_.state) == Seq(TableState.Stopping))
    assert(a.pollTables().map(_.state) == Seq(TableState.Stopping))
    ex.tick() // Stopping -> Stopped
    val fin = a.pollTables()
    assert(fin.map(_.state) == Seq(TableState.Stopped))
    assert(fin.head.checkpoint.checkpointTs > 0)
    assert(fin.head.checkpoint.resolvedTs >=
      fin.head.checkpoint.checkpointTs) // zero-resolved backfill (:98-101)
    assert(a.trackedTables.isEmpty) // dropped once Absent (:324-327)
  }

  test("heartbeat: unknown requested spans report Absent; IsStopping latches") {
    val a = new CaptureAgent("cap-1", new Agent.StepExecutor)
    a.handleOwnerInfo("owner", 1L)
    val (sts, live, _) = a.handleHeartbeat(Seq(3L, 4L),
      isStopping = false, collectStats = false)
    assert(sts.map(s => (s.tableId, s.state)) ==
      Seq((3L, TableState.Absent), (4L, TableState.Absent)))
    assert(live == LivenessAlive)
    val (_, live2, _) = a.handleHeartbeat(Seq.empty, isStopping = true,
      collectStats = false)
    assert(live2 == LivenessStopping)
    // liveness is a one-way latch
    val (_, live3, _) = a.handleHeartbeat(Seq.empty, isStopping = false,
      collectStats = false)
    assert(live3 == LivenessStopping)
  }

  // ---- the closed loop: real coordinator + real agents -------------------

  private final class Loop(caps: Seq[String]) {
    val coord = new Coord(caps.head, 7L, heartbeatTick = 1,
      collectStatsTick = 4, maxTaskConcurrency = 8, addTableBatchSize = 10)
    val executors = caps.map(c => c -> new Agent.StepExecutor).toMap
    val agents = caps.map(c => c -> new CaptureAgent(c,
      executors(c))).toMap
    val alive = scala.collection.mutable.LinkedHashMap(
      caps.map(c => c -> s"addr-$c"): _*)
    private var pendingHb =
      Seq.empty[graft.streaming.CaptureManager.Heartbeat]
    private var pendingDispatch = Seq.empty[graft.streaming.ReplicationSet.Msg]

    def round(currentTables: Seq[Long]):
        graft.streaming.ReplicationManager.Watermark = {
      alive.keys.foreach(c => executors(c).tick())
      // deliver owner->capture messages; collect capture->owner replies
      val incoming = scala.collection.mutable.Map
        .empty[String, (Seq[TableStatus], Int, String)]
      pendingHb.foreach { hb =>
        if (alive.contains(hb.to)) {
          val a = agents(hb.to)
          if (a.handleOwnerInfo("owner", 7L).getOrElse(false)) {
            val (sts, live, ep) = a.handleHeartbeat(hb.spans,
              hb.isStopping, hb.collectStats)
            incoming(hb.to) = (sts, live, ep)
          }
        }
      }
      pendingDispatch.foreach {
        case AddTableReq(t, to, sec, ck) if alive.contains(to) =>
          val a = agents(to)
          a.handleOwnerInfo("owner", 7L)
          val ep = coord.captureM.capture(to)
            .map(_.currentEpoch).filter(_.nonEmpty).getOrElse(a.epoch)
          a.dispatchAdd(t, ck, sec, ep)
        case RemoveTableReq(t, to) if alive.contains(to) =>
          val a = agents(to)
          a.handleOwnerInfo("owner", 7L)
          val ep = coord.captureM.capture(to)
            .map(_.currentEpoch).filter(_.nonEmpty).getOrElse(a.epoch)
          a.dispatchRemove(t, ep)
        case _ => // message to a dead capture: lost on the wire
      }
      // agents run their task machines; responses fold into the incoming
      alive.keys.foreach { c =>
        val task = agents(c).pollTables()
        if (task.nonEmpty || incoming.contains(c)) {
          val (hb, live, ep) = incoming.getOrElse(c,
            (Seq.empty[TableStatus], agents(c).currentLiveness,
              agents(c).epoch))
          // dispatch responses override same-table heartbeat statuses
          val merged = (hb.filterNot(s =>
            task.exists(_.tableId == s.tableId)) ++ task)
          incoming(c) = (merged, live, ep)
        }
      }
      val ins = incoming.toSeq.sortBy(_._1).map { case (c, (sts, l, e)) =>
        Incoming(c, e, l, sts)
      }
      val res = coord.poll(100L, currentTables, alive.toMap,
        BarrierTs(1L << 40, (1L << 40) - 10, (1L << 40) - 20), ins)
        .fold(e => fail(s"poll: $e"), identity)
      pendingHb = res.heartbeats
      pendingDispatch = res.dispatches
      res.watermark
    }

    def allReplicating(tables: Seq[Long]): Boolean =
      tables.forall(t => coord.replicationM.replicationSets.get(t)
        .exists(_.currentState == RepState.Replicating))

    def primaries(tables: Seq[Long]): Map[Long, String] =
      tables.map(t =>
        t -> coord.replicationM.replicationSets(t).currentPrimary).toMap
  }

  test("closed loop: real agents converge, move, auto-drain, crash-recover") {
    val caps = Seq("cap-0", "cap-1", "cap-2")
    val loop = new Loop(caps)
    val tables = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    var rounds = 0
    while (!loop.allReplicating(tables) && rounds < 40) {
      loop.round(tables); rounds += 1
    }
    assert(loop.allReplicating(tables), s"no convergence in $rounds")
    val byCap = loop.primaries(tables).groupBy(_._2).view.mapValues(_.size)
    assert(byCap.values.forall(_ <= 2), byCap.toMap.toString)
    // watermark becomes real and monotone
    val w1 = loop.round(tables)
    val w2 = loop.round(tables)
    assert(w1.checkpointTs > 0 && w2.checkpointTs >= w1.checkpointTs)

    // manual move through the real agents (balance gated as in prod)
    loop.coord.schedState.balanceAllowed = false
    val dest =
      if (loop.primaries(tables)(1L) == "cap-0") "cap-1" else "cap-0"
    loop.coord.moveTable(1L, dest)
    rounds = 0
    while ((loop.primaries(tables)(1L) != dest ||
        !loop.allReplicating(tables)) && rounds < 40) {
      loop.round(tables); rounds += 1
    }
    assert(loop.primaries(tables)(1L) == dest, s"move stuck after $rounds")

    // drain auto-adopts: the agent reports stopping, the owner moves all
    // its tables off without any manual drain call
    loop.agents("cap-2").handleLivenessUpdate(LivenessStopping)
    rounds = 0
    while ((loop.primaries(tables).values.exists(_ == "cap-2") ||
        !loop.allReplicating(tables)) && rounds < 80) {
      loop.round(tables); rounds += 1
    }
    assert(!loop.primaries(tables).values.exists(_ == "cap-2"),
      s"drain incomplete after $rounds")

    // crash cap-2 entirely: membership removal, recovery on the rest
    loop.alive.remove("cap-2")
    rounds = 0
    while (!loop.allReplicating(tables) && rounds < 60) {
      loop.round(tables); rounds += 1
    }
    assert(loop.allReplicating(tables), s"no recovery in $rounds")
    assert(!loop.primaries(tables).values.exists(_ == "cap-2"))
  }
}
