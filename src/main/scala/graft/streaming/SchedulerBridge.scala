package graft.streaming

import scala.collection.mutable

import graft.streaming.Agent.{CaptureAgent, TableExecutor}
import graft.streaming.Coordinator.{Coord, Incoming}
import graft.streaming.ReplicationManager.{BarrierTs, Watermark}
import graft.streaming.ReplicationSet.{AddTableReq, RemoveTableReq, TableStatus}

/**
 * The scheduler kernels WIRED INTO the running changefeed: a real
 * [[Coordinator.Coord]] (owner side) and real [[Agent.CaptureAgent]]s
 * (processor side) exchanging heartbeats and dispatch requests over an
 * in-process bus, exactly the coordinator⇄agent p2p loop of the reference
 * (cdc/scheduler/internal/v3/coordinator.go:268-385 poll round,
 * agent/agent.go heartbeat + dispatch handling). q277-q282 prove each
 * kernel in isolation; this bridge is the RUNTIME composition the
 * changefeed consults per microbatch:
 *
 *  - `round(currentTables)` runs one owner poll over the live capture
 *    set — membership handshake, heartbeat fan-out, dispatch delivery,
 *    agent task machines, checkpoint advance — and returns the global
 *    watermark;
 *  - `assignments` is the placement the data plane executes: Spark
 *    routes each table's rows to the capture its replication set names
 *    primary (the reference moves the table pipeline between processor
 *    nodes; the Spark twin tags and co-partitions by owner so placement
 *    is a plan property, not an executor affinity — see StreamingSpec's
 *    scheduled-changefeed scenario);
 *  - `moveTable`/`rebalance`/`drain`/`addCapture`/`crashCapture` are the
 *    owner API verbs (coordinator.go:148-249) plus membership events.
 *
 * 100 TB shape: everything here is control plane — O(captures + tables)
 * driver-side state per round, matching the reference's owner. The data
 * path only ever sees the broadcastable (tableId → capture) map.
 */
final class SchedulerBridge(captureIds: Seq[String],
                            ownerRev: Long = 7L,
                            mkExecutor: String => TableExecutor =
                              _ => new Agent.StepExecutor) {
  require(captureIds.nonEmpty)

  private val ownerId = captureIds.head
  val coord = new Coord(ownerId, ownerRev, heartbeatTick = 1,
    collectStatsTick = 4, maxTaskConcurrency = 8, addTableBatchSize = 10)
  private val executors = mutable.LinkedHashMap(
    captureIds.map(c => c -> mkExecutor(c)): _*)
  private val agents = mutable.LinkedHashMap(
    captureIds.map(c => c -> new CaptureAgent(c, executors(c))): _*)
  private val alive = mutable.LinkedHashMap(
    captureIds.map(c => c -> s"addr-$c"): _*)

  private var pendingHb = Seq.empty[CaptureManager.Heartbeat]
  private var pendingDispatch = Seq.empty[ReplicationSet.Msg]
  private var lastError: Option[String] = None

  def aliveCaptures: Seq[String] = alive.keys.toSeq
  def error: Option[String] = lastError

  /** A capture joining the cluster mid-run (a new processor node). */
  def addCapture(id: String): Unit = {
    val ex = mkExecutor(id)
    executors(id) = ex
    agents(id) = new CaptureAgent(id, ex)
    alive(id) = s"addr-$id"
  }

  /** Hard crash: the capture vanishes from the alive set and its agent
    * never answers again — in-flight messages to it are lost. */
  def crashCapture(id: String): Unit = { alive.remove(id); () }

  def moveTable(tableId: Long, dest: String): Boolean =
    coord.moveTable(tableId, dest)
  def rebalance(): Unit = coord.rebalance()
  def drainCapture(id: String): Boolean = coord.drainCapture(id)

  /** The placement the data plane executes: table → primary capture
    * (replication sets whose primary is assigned). */
  def assignments: Map[Long, String] =
    coord.replicationM.replicationSets.toSeq.collect {
      case (t, rep) if rep.currentPrimary.nonEmpty => t -> rep.currentPrimary
    }.toMap

  def allReplicating(tables: Seq[Long]): Boolean =
    tables.forall(t => coord.replicationM.replicationSets.get(t)
      .exists(_.currentState == ReplicationSet.RepState.Replicating))

  /**
   * One coordinator⇄agents round: deliver last round's owner messages,
   * collect capture replies and task-machine responses, then
   * `Coord.poll`. Mirrors the reference's transport tick — messages to a
   * crashed capture drop on the wire.
   */
  def round(currentTables: Seq[Long],
            barrier: BarrierTs = BarrierTs(1L << 40, (1L << 40) - 10,
              (1L << 40) - 20),
            checkpointTs: Long = 100L): Option[Watermark] = {
    alive.keys.foreach(c => executors(c) match {
      case s: Agent.StepExecutor => s.tick()
      case _ =>
    })
    val incoming = mutable.Map.empty[String, (Seq[TableStatus], Int, String)]
    pendingHb.foreach { hb =>
      if (alive.contains(hb.to)) {
        val a = agents(hb.to)
        if (a.handleOwnerInfo(ownerId, ownerRev)
            .getOrElse(false)) {
          incoming(hb.to) =
            a.handleHeartbeat(hb.spans, hb.isStopping, hb.collectStats)
        }
      }
    }
    pendingDispatch.foreach {
      case AddTableReq(t, to, sec, ck) if alive.contains(to) =>
        val a = agents(to)
        a.handleOwnerInfo(ownerId, ownerRev)
        a.dispatchAdd(t, ck, sec, epochFor(to, a))
      case RemoveTableReq(t, to) if alive.contains(to) =>
        val a = agents(to)
        a.handleOwnerInfo(ownerId, ownerRev)
        a.dispatchRemove(t, epochFor(to, a))
      case _ => // crashed capture: lost on the wire
    }
    alive.keys.foreach { c =>
      val task = agents(c).pollTables()
      if (task.nonEmpty || incoming.contains(c)) {
        val (hb, live, ep) = incoming.getOrElse(c,
          (Seq.empty[TableStatus], agents(c).currentLiveness,
            agents(c).epoch))
        incoming(c) = (hb.filterNot(s =>
          task.exists(_.tableId == s.tableId)) ++ task, live, ep)
      }
    }
    val ins = incoming.toSeq.sortBy(_._1).map { case (c, (sts, l, e)) =>
      Incoming(c, e, l, sts)
    }
    coord.poll(checkpointTs, currentTables, alive.toMap, barrier, ins) match {
      case Left(e) =>
        // a poll error is TERMINAL for this coordinator, as in the
        // reference (coordinator.go — the changefeed tears down and owner
        // state rebuilds from scratch): latch the error, drop the
        // in-flight messages so a caller that keeps polling anyway cannot
        // re-deliver stale dispatches, and expect the owner to construct
        // a NEW bridge
        lastError = Some(e)
        pendingHb = Seq.empty
        pendingDispatch = Seq.empty
        None
      case Right(res) =>
        pendingHb = res.heartbeats
        pendingDispatch = res.dispatches
        Some(res.watermark)
    }
  }

  private def epochFor(id: String, a: CaptureAgent): String =
    coord.captureM.capture(id).map(_.currentEpoch)
      .filter(_.nonEmpty).getOrElse(a.epoch)

  /** Run rounds until every table replicates or the budget runs out;
    * returns the converged placement. */
  def converge(currentTables: Seq[Long], maxRounds: Int = 30)
      : Map[Long, String] = {
    var n = 0
    while (n < maxRounds && !allReplicating(currentTables) &&
      lastError.isEmpty) {
      round(currentTables); n += 1
    }
    assignments
  }
}
