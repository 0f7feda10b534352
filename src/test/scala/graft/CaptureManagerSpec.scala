package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CaptureManager
import graft.streaming.CaptureManager._
import graft.streaming.ReplicationSet.{Checkpoint, TableState, TableStatus}
import graft.streaming.TableSchedulers.CaptureState

/**
 * The capture-membership manager (member/capture_manager.go): the
 * epoch-guarded heartbeat handshake, the tick fan-out, and the
 * init/removed change feed — including the consume-once TakeChanges and
 * the stopping-counts-as-initialized barrier rule.
 */
class CaptureManagerSpec extends AnyFunSuite {

  private def ts(t: Long) =
    TableStatus(t, TableState.Replicating, Checkpoint(10, 20))

  test("handshake: first response adopts the epoch; stale epochs dropped") {
    val s = new Status("cap-a", "addr-a", isOwner = false, ownerRev = 7L)
    assert(s.currentState == CaptureState.Uninitialized)
    assert(s.handleHeartbeatResponse(Seq(ts(1L)), LivenessAlive, "e1"))
    assert(s.currentState == CaptureState.Initialized)
    assert(s.currentEpoch == "e1")
    assert(s.currentTables.map(_.tableId) == Seq(1L))
    // a response from a restarted processor (new epoch) is DROPPED
    assert(!s.handleHeartbeatResponse(Seq(ts(2L)), LivenessAlive, "e2"))
    assert(s.currentTables.map(_.tableId) == Seq(1L))
    // same-epoch stopping liveness downgrades and replaces tables
    assert(s.handleHeartbeatResponse(Seq(ts(3L)), LivenessStopping, "e1"))
    assert(s.currentState == CaptureState.Stopping)
    assert(s.currentTables.map(_.tableId) == Seq(3L))
  }

  test("alive update: new captures greeted, removals feed changes only after init") {
    val m = new Manager("cap-owner", 7L, heartbeatTick = 2,
      collectStatsTick = 4)
    assert(m.handleAliveCaptureUpdate(Map(
      "cap-owner" -> "a0", "cap-b" -> "a1")) ==
      Seq("cap-b", "cap-owner"))
    assert(!m.initialized)
    assert(m.takeChanges().isEmpty) // nothing before init (:305-307)
    // cap-b vanishes BEFORE init: no removed entry recorded
    assert(m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0")).isEmpty)
    m.handleHeartbeatResponse("cap-owner", Seq(ts(1L)), LivenessAlive, "e0")
    // first full initialization snapshots every capture's tables
    m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0"))
    assert(m.initialized && m.checkAllCaptureInitialized)
    assert(m.takeChanges().contains(
      Changes(Map("cap-owner" -> Seq(ts(1L))), Map.empty)))
    assert(m.takeChanges().isEmpty) // consume-once (:308-311)
    // a post-init removal carries the capture's last-known tables
    m.handleAliveCaptureUpdate(Map(
      "cap-owner" -> "a0", "cap-c" -> "a2"))
    m.handleHeartbeatResponse("cap-c", Seq(ts(9L)), LivenessAlive, "e9")
    m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0"))
    assert(m.takeChanges().contains(
      Changes(Map.empty, Map("cap-c" -> Seq(ts(9L))))))
  }

  test("stopping counts as initialized; unknown-capture responses dropped") {
    val m = new Manager("cap-owner", 7L, 2, 4)
    m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0", "cap-b" -> "a1"))
    m.handleHeartbeatResponse("cap-owner", Seq.empty, LivenessAlive, "e0")
    m.handleHeartbeatResponse("cap-b", Seq.empty, LivenessStopping, "e1")
    m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0", "cap-b" -> "a1"))
    assert(m.initialized) // stopping does not block the barrier (:166-171)
    m.handleHeartbeatResponse("ghost", Seq(ts(1L)), LivenessAlive, "ex")
    assert(m.capture("ghost").isEmpty)
  }

  test("tick: heartbeat every heartbeatTick, stats armed every collectStatsTick") {
    val m = new Manager("cap-owner", 7L, heartbeatTick = 2,
      collectStatsTick = 3)
    m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0", "cap-b" -> "a1"))
    val spans = Map("cap-b" -> Seq(5L, 6L))
    assert(m.tick(spans, None).isEmpty) // tick 1
    val hb2 = m.tick(spans, Some("cap-b")) // tick 2: heartbeat
    assert(hb2 == Seq(
      Heartbeat("cap-b", Seq(5L, 6L), isStopping = true,
        collectStats = false),
      Heartbeat("cap-owner", Seq.empty, isStopping = false,
        collectStats = false)))
    assert(m.tick(spans, None).isEmpty) // tick 3 arms the stats flag
    val hb4 = m.tick(spans, None) // tick 4 carries and clears it
    assert(hb4.forall(_.collectStats))
    assert(m.tick(spans, None).isEmpty) // tick 5
    val hb6 = m.tick(spans, None) // tick 6: armed again at 6 % 3 == 0
    assert(hb6.forall(_.collectStats))
  }
}
