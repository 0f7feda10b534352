package graft.streaming

/**
 * The scheduler coordinator's poll round (SURVEY §2 R5, the composition):
 * one owner tick wiring the five kernels together in the reference's
 * exact order. Reference: cdc/scheduler/internal/v3/coordinator.go:268-385
 * — handle incoming responses (capture handshake first, :297), alive
 * update (:300-301), route reported table statuses into the replication
 * sets (:304-312), the not-all-initialized short-circuit that still
 * advances the checkpoint and heartbeats (:321-330), capture-change
 * consumption (:333-345), the scheduler-manager priority walk
 * (scheduler_manager.go:66-96), task handling (:355-365), checkpoint
 * advance (:368) and the capture-manager tick AFTER the advance so the
 * heartbeat barrier carries the redo-clamped resolved ts (:370-373).
 *
 * Spark-first framing: Spark's driver plays the owner, so this round is
 * the batch twin of the scheduling tick — q281 drives whole lifecycles
 * through it; CoordinatorSpec runs a full mini-cluster (processors,
 * crashes, drains, rebalances) against it.
 */
object Coordinator {
  import CaptureManager.{Changes, Heartbeat}
  import ReplicationManager.{Advance, BarrierTs, Watermark}
  import ReplicationSet.{Msg, TableStatus}
  import TableSchedulers.{CaptureStatus, SchedulerState}

  /** One capture's heartbeat response: its processor epoch, liveness and
    * reported table statuses. */
  final case class Incoming(from: String, epoch: String, liveness: Int,
                            tables: Seq[TableStatus])

  /** One poll's outputs: the watermark (all-zero = cannot proceed), the
    * possibly redo-clamped barrier, the dispatch messages, and the
    * owner→capture heartbeats (fresh-capture greetings included). */
  final case class PollResult(watermark: Watermark, barrier: BarrierTs,
                              dispatches: Seq[Msg],
                              heartbeats: Seq[Heartbeat])

  final class Coord(ownerId: String, ownerRev: Long, heartbeatTick: Int,
                    collectStatsTick: Int, maxTaskConcurrency: Int,
                    addTableBatchSize: Int) {
    val captureM = new CaptureManager.Manager(ownerId, ownerRev,
      heartbeatTick, collectStatsTick)
    val replicationM = new ReplicationManager.Manager(maxTaskConcurrency)
    val schedState = new SchedulerState

    /** coordinator.MoveTable (:148-165) — queued for the next poll. */
    def moveTable(tableId: Long, dest: String): Boolean =
      schedState.addMove(tableId, dest)
    /** coordinator.Rebalance (:167-182). */
    def rebalance(): Unit = schedState.rebalanceTriggered = true
    /** coordinator.DrainCapture's target injection (:184-249). */
    def drainCapture(target: String): Boolean = {
      if (schedState.drainTarget.nonEmpty) return false
      schedState.drainTarget = Some(target)
      true
    }

    private def captureView: Seq[CaptureStatus] =
      captureM.captures.values.toSeq.map(c =>
        CaptureStatus(c.id, c.currentState, c.isOwner))

    private def spansPerCapture: Map[String, Seq[Long]] =
      replicationM.replicationSetsIter.toSeq
        .flatMap { case (t, rep) => rep.currentCaptures.keys.map(_ -> t) }
        .groupBy(_._1).map { case (c, ts) => c -> ts.map(_._2).sorted }

    private def advance(currentTables: Seq[Long], barrier: BarrierTs,
                        redoEnabled: Boolean,
                        redoFlushed: Long): Advance = {
      val views = replicationM.replicationSetsIter.toSeq.map {
        case (t, rep) =>
          ReplicationManager.SpanView(t, "a", "z", rep.currentCheckpoint,
            rep.currentStats.get("puller-egress"))
      }
      ReplicationManager.advanceCheckpoint(
        currentTables.map(t => (t, "a", "z")), views, barrier,
        redoEnabled, redoFlushed)
    }

    /** One poll round (coordinator.go:268-385). A Left is TERMINAL for
      * this Coord, as in the reference — the poll errors tear the
      * changefeed down and owner state is rebuilt from scratch; in
      * particular the membership changes consumed by a failed
      * handleCaptureChanges are not re-stashed. */
    def poll(checkpointTs: Long, currentTables: Seq[Long],
             aliveCaptures: Map[String, String], barrier: BarrierTs,
             incoming: Seq[Incoming], redoEnabled: Boolean = false,
             redoFlushedResolvedTs: Long = 0L)
        : Either[String, PollResult] = {
      // 1. capture handshake for every incoming response (:297)
      incoming.foreach(in => captureM.handleHeartbeatResponse(in.from,
        in.tables, in.liveness, in.epoch))
      // 2. membership update; fresh captures get an empty greeting (:300)
      val greets = captureM.handleAliveCaptureUpdate(aliveCaptures)
        .map(id => Heartbeat(id, Seq.empty, isStopping = false,
          collectStats = false))
      // 3. route reported statuses into the replication sets (:304-312)
      val dispatches = scala.collection.mutable.ArrayBuffer.empty[Msg]
      incoming.foreach { in =>
        replicationM.handleHeartbeatTables(in.from, in.tables) match {
          case Left(e) => return Left(e)
          case Right(ms) => dispatches ++= ms
        }
      }
      // 4. not all initialized: advance + tick only (:321-330)
      if (!captureM.checkAllCaptureInitialized) {
        val adv = advance(currentTables, barrier, redoEnabled,
          redoFlushedResolvedTs)
        val hbs = captureM.tick(spansPerCapture, schedState.drainTarget)
        return Right(PollResult(adv.watermark, adv.barrier,
          dispatches.toSeq, greets ++ hbs))
      }
      // 5. consume membership changes (:333-345); an empty init map is
      // the Go's nil (first init always carries one entry per capture)
      captureM.takeChanges().foreach { case Changes(init, removed) =>
        replicationM.handleCaptureChanges(
          if (init.nonEmpty) Some(init) else None,
          removed.keys.toSeq.sorted, checkpointTs) match {
          case Left(e) => return Left(e)
          case Right(ms) => dispatches ++= ms
        }
      }
      // 6. the scheduler-manager priority walk (:348-353)
      val tasks = TableSchedulers.schedule(checkpointTs, currentTables,
        captureView, replicationM.replicationSets,
        replicationM.runningTaskTables.size, maxTaskConcurrency,
        addTableBatchSize, schedState)
      // 7. task handling (:355-365); a manual move clears from the
      // pending queue only on ACCEPTANCE (the Go's Accept callback) —
      // one skipped at the concurrency cap retries next tick
      replicationM.handleTasks(tasks) match {
        case Left(e) => return Left(e)
        case Right(ms) => dispatches ++= ms
      }
      schedState.pendingMoves --= schedState.pendingMoves.filter(m =>
        replicationM.runningTask(m.tableId).contains(m))
      // 8. checkpoint advance, then 9. heartbeat tick (:368-373)
      val adv = advance(currentTables, barrier, redoEnabled,
        redoFlushedResolvedTs)
      val hbs = captureM.tick(spansPerCapture, schedState.drainTarget)
      Right(PollResult(adv.watermark, adv.barrier, dispatches.toSeq,
        greets ++ hbs))
    }
  }
}
