package graft.streaming

/**
 * The owner's replication MANAGER (SURVEY §2 R5's top layer): running-task
 * bookkeeping over the per-table state machines and the global
 * checkpoint-advance algebra. Reference:
 * cdc/scheduler/internal/v3/replication/replication_manager.go —
 * HandleCaptureChanges (:179-239), HandleTasks' finished-task sweep,
 * burst expansion, concurrency cap and skip rules (:342-434), the three
 * task handlers (:436-474), handleBurstBalanceTasks' placeholder
 * running-tasks (:476-544), and AdvanceCheckpoint (:557-745) — span
 * coverage (hole / missing start / missing end), the min-checkpoint /
 * min-resolved / max-lastSynced / min-puller watermark, the
 * cannot-proceed sentinel (internal/scheduler.go:26,
 * CheckpointCannotProceed = 0), the empty-table barrier advance, the
 * MinTableBarrierTs clamp, and the redo interplay (resolved clamped to
 * the redo barrier, then to the flushed redo meta; the global barrier
 * never passes the flushed redo resolved ts).
 *
 * Spark-first framing: in the Spark build the microbatch boundary plays
 * the role of the owner tick (Changefeed wires OwnerBarrier the same
 * way); this kernel is the TS ALGEBRA of that tick, pinned by q279
 * against a SQL replay over the same derived inputs.
 */
object ReplicationManager {
  import ReplicationSet.{Checkpoint, Msg, Rep, RepState, TableStatus}
  import TableSchedulers.{AddTable, BurstBalance, MoveTable, RemoveTable, Task}

  /** CheckpointCannotProceed (internal/scheduler.go:24-26). */
  val CannotProceed = 0L

  /** schedulepb.Watermark. */
  final case class Watermark(checkpointTs: Long, resolvedTs: Long,
                             lastSyncedTs: Long, pullerResolvedTs: Long)

  /** schedulepb.BarrierWithMinTs — the three owner barrier components. */
  final case class BarrierTs(globalBarrierTs: Long, minTableBarrierTs: Long,
                             redoBarrierTs: Long)

  /** One replication-set view for the advance pass: a key-span piece of
    * `tableId` with the set's aggregated checkpoint and (optionally) the
    * puller-egress stage resolved ts. */
  final case class SpanView(tableId: Long, startKey: String, endKey: String,
                            checkpoint: Checkpoint,
                            pullerResolvedTs: Option[Long] = None)

  /** The advance result: the watermark, the (possibly clamped) barrier,
    * the slowest sink/puller spans, and the redo meta update the owner
    * would flush ((ck, rts), only when redo is enabled and the advance
    * proceeded). */
  final case class Advance(watermark: Watermark, barrier: BarrierTs,
                           slowestSink: Option[(Long, String)],
                           slowestPuller: Option[(Long, String)],
                           redoMetaUpdate: Option[(Long, Long)])

  private val MaxTs = Long.MaxValue

  /**
   * AdvanceCheckpoint (replication_manager.go:557-745). `tables` are the
   * current table ranges (id, startKey, endKey); `spans` the replication
   * sets' views. Coverage per table: ascending pieces with no hole, the
   * first starting at the range start and some piece ending at the range
   * end — otherwise the whole advance yields the all-zero
   * cannot-proceed watermark (with the redo-enabled barrier clamp still
   * applied, :680-695).
   */
  def advanceCheckpoint(tables: Seq[(Long, String, String)],
                        spans: Seq[SpanView], barrier0: BarrierTs,
                        redoEnabled: Boolean,
                        redoFlushedResolvedTs: Long = 0L): Advance = {
    var barrier = barrier0
    var ckTs = MaxTs
    var rts = MaxTs
    var lastSynced = 0L
    var puller = MaxTs
    var slowestSink: Option[(Long, String)] = None
    var slowestPuller: Option[(Long, String)] = None
    var resolvedOfSlowestSink = MaxTs
    var cannotProceed = false

    def limitWithRedo(w: Watermark): Watermark = {
      // limitBarrierWithRedo (:564-583): resolved capped by the flushed
      // redo meta; checkpoint by resolved; the global barrier by resolved.
      var rw = w
      if (redoFlushedResolvedTs < rw.resolvedTs)
        rw = rw.copy(resolvedTs = redoFlushedResolvedTs)
      if (rw.checkpointTs > rw.resolvedTs)
        rw = rw.copy(checkpointTs = rw.resolvedTs)
      if (barrier.globalBarrierTs > rw.resolvedTs)
        barrier = barrier.copy(globalBarrierTs = rw.resolvedTs)
      rw
    }

    val byTable = spans.groupBy(_.tableId)
    tables.foreach { case (tid, tStart, tEnd) =>
      if (!cannotProceed) {
        val pieces = byTable.getOrElse(tid, Seq.empty).sortBy(_.startKey)
        var found = false
        var startFound = false
        var endFound = false
        var hole = false
        var lastEnd: Option[String] = None
        pieces.foreach { p =>
          if (!hole) {
            if (lastEnd.exists(_ != p.startKey)) hole = true
            else {
              lastEnd = Some(p.endKey)
              found = true
              if (p.startKey == tStart) startFound = true
              if (p.endKey == tEnd) endFound = true
              val c = p.checkpoint
              if (ckTs > c.checkpointTs ||
                  (ckTs == c.checkpointTs &&
                   resolvedOfSlowestSink > c.resolvedTs)) {
                ckTs = c.checkpointTs
                slowestSink = Some((tid, p.startKey))
                resolvedOfSlowestSink = c.resolvedTs
              }
              if (rts > c.resolvedTs) rts = c.resolvedTs
              if (lastSynced < c.lastSyncedTs) lastSynced = c.lastSyncedTs
              p.pullerResolvedTs.foreach { pr =>
                if (puller > pr) {
                  puller = pr
                  slowestPuller = Some((tid, p.startKey))
                }
              }
            }
          }
        }
        if (!found || !startFound || !endFound || hole) cannotProceed = true
      }
    }

    if (cannotProceed) {
      if (redoEnabled) {
        // barrier clamp still applies on the no-proceed path (:683-689)
        limitWithRedo(Watermark(ckTs, barrier.redoBarrierTs,
          CannotProceed, CannotProceed))
      }
      return Advance(
        Watermark(CannotProceed, CannotProceed, CannotProceed,
          CannotProceed), barrier, slowestSink, slowestPuller, None)
    }

    // Empty current tables: resolved advances to the global barrier,
    // checkpoint to the min table barrier (:698-716).
    if (rts == MaxTs || ckTs == MaxTs) {
      rts = barrier.globalBarrierTs
      ckTs = barrier.minTableBarrierTs
    }
    if (ckTs > barrier.minTableBarrierTs) ckTs = barrier.minTableBarrierTs

    var w = Watermark(ckTs, rts, lastSynced,
      if (puller == MaxTs) CannotProceed else puller)
    var metaUpdate: Option[(Long, Long)] = None
    if (redoEnabled) {
      if (w.resolvedTs > barrier.redoBarrierTs)
        w = w.copy(resolvedTs = barrier.redoBarrierTs)
      metaUpdate = Some((w.checkpointTs, w.resolvedTs)) // UpdateMeta (:737)
      w = limitWithRedo(w)
    }
    Advance(w, barrier, slowestSink, slowestPuller, metaUpdate)
  }

  /**
   * The live manager: the replication sets keyed by table plus the
   * running-task map, capped at `maxTaskConcurrency`
   * (replication_manager.go:342-434). Control-plane sized throughout.
   */
  final class Manager(maxTaskConcurrency: Int) {
    private[streaming] val spans =
      scala.collection.mutable.SortedMap.empty[Long, Rep]
    private[streaming] val runningTasks =
      scala.collection.mutable.SortedMap.empty[Long, Task]

    def replicationSets: Map[Long, Rep] = spans.toMap
    /** Read-only iteration without the per-call map copy — the
      * coordinator's per-tick walks (spans per capture, the advance
      * views) use this; `replicationSets` stays for callers that want a
      * stable snapshot. */
    def replicationSetsIter: Iterable[(Long, Rep)] = spans.view
    def runningTaskTables: Seq[Long] = runningTasks.keys.toSeq
    /** The task currently running on a table, if any — the acceptance
      * signal the scheduler manager's Accept callback carries in the
      * reference. */
    def runningTask(tableId: Long): Option[Task] =
      runningTasks.get(tableId)

    /** HandleCaptureChanges (:179-239): `init` builds every set from the
      * statuses captures reported (only once, at owner startup);
      * `removed` runs the shutdown poll on every set and clears the
      * affected running tasks. */
    def handleCaptureChanges(
        init: Option[Map[String, Seq[TableStatus]]],
        removed: Seq[String],
        checkpointTs: Long): Either[String, Seq[Msg]] = {
      init.foreach { m =>
        if (spans.nonEmpty) return Left("schedulerv3: init again")
        val byTable = m.toSeq
          .flatMap { case (cap, sts) => sts.map(st => (st.tableId, cap, st)) }
          .groupBy(_._1)
        byTable.toSeq.sortBy(_._1).foreach { case (tid, entries) =>
          ReplicationSet.init(tid, checkpointTs,
            entries.map(e => e._2 -> e._3)) match {
            case Left(e) => return Left(e)
            case Right(rep) => spans(tid) = rep
          }
        }
      }
      val sent = scala.collection.mutable.ArrayBuffer.empty[Msg]
      spans.values.foreach { rep =>
        removed.foreach { cap =>
          rep.handleCaptureShutdown(cap) match {
            case Left(e) => return Left(e)
            case Right((ms, affected)) =>
              sent ++= ms
              if (affected) runningTasks.remove(rep.tableId)
          }
        }
      }
      Right(sent.toSeq)
    }

    /** handleMessageHeartbeatResponse / DispatchTableResponse routing
      * (:271-340): each reported table status drives its replication
      * set's poll; unknown tables are ignored; a set that finished
      * removing is garbage-collected. */
    def handleHeartbeatTables(from: String, statuses: Seq[TableStatus])
        : Either[String, Seq[Msg]] = {
      val sent = scala.collection.mutable.ArrayBuffer.empty[Msg]
      statuses.foreach { st =>
        spans.get(st.tableId).foreach { rep =>
          rep.handleTableStatus(from, st) match {
            case Left(e) => return Left(e)
            case Right(ms) =>
              sent ++= ms
              if (rep.hasRemoved) spans.remove(st.tableId)
          }
        }
      }
      Right(sent.toSeq)
    }

    /** HandleTasks (:342-434): sweep finished tasks (table Replicating
      * again or removed, or gone), then accept tasks — burst balance
      * bypasses the concurrency cap and marks placeholders; a task on a
      * span already running one, or on a missing table (unless AddTable),
      * is skipped. */
    def handleTasks(tasks: Seq[Task]): Either[String, Seq[Msg]] = {
      val done = runningTasks.keys.filter { t =>
        spans.get(t) match {
          case Some(rep) =>
            rep.currentState == RepState.Replicating || rep.hasRemoved
          case None => true
        }
      }.toSeq
      done.foreach(runningTasks.remove)

      val sent = scala.collection.mutable.ArrayBuffer.empty[Msg]
      tasks.foreach {
        case b: BurstBalance =>
          burst(b) match {
            case Left(e) => return Left(e)
            case Right(ms) => sent ++= ms
          }
        case task =>
          if (runningTasks.size != maxTaskConcurrency) {
            val span = task match {
              case AddTable(t, _, _) => t
              case RemoveTable(t, _) => t
              case MoveTable(t, _) => t
              case _ => -1L
            }
            if (!runningTasks.contains(span) &&
                (spans.contains(span) || task.isInstanceOf[AddTable])) {
              dispatch(task) match {
                case Left(e) => return Left(e)
                case Right(ms) =>
                  sent ++= ms
                  runningTasks(span) = task
              }
            }
          }
      }
      Right(sent.toSeq)
    }

    private def dispatch(task: Task): Either[String, Seq[Msg]] =
      task match {
        case AddTable(t, cap, ck) =>
          // handleAddTableTask (:436-450): create the set on demand
          val rep = spans.getOrElseUpdate(t,
            ReplicationSet.init(t, ck, Seq.empty)
              .getOrElse(return Left("schedulerv3: init failed")))
          rep.handleAddTable(cap)
        case RemoveTable(t, _) =>
          // handleRemoveTableTask (:452-466): an already-removed set is
          // garbage-collected instead
          val rep = spans(t)
          if (rep.hasRemoved) { spans.remove(t); Right(Seq.empty) }
          else rep.handleRemoveTable()
        case MoveTable(t, dest) => spans(t).handleMoveTable(dest)
        case _ => Right(Seq.empty)
      }

    private def burst(b: BurstBalance): Either[String, Seq[Msg]] = {
      // handleBurstBalanceTasks (:476-544): adds, removes, then moves;
      // each skips spans already running a task and leaves a placeholder.
      val sent = scala.collection.mutable.ArrayBuffer.empty[Msg]
      def one(span: Long, task: Task): Either[String, Unit] =
        if (runningTasks.contains(span)) Right(())
        else dispatch(task) match {
          case Left(e) => Left(e)
          case Right(ms) =>
            sent ++= ms
            runningTasks(span) = BurstBalance() // placeholder (:516)
            Right(())
        }
      b.adds.foreach(t => one(t.tableId, t).left.foreach(e => return Left(e)))
      b.removes.foreach(t =>
        one(t.tableId, t).left.foreach(e => return Left(e)))
      b.moves.foreach(t => one(t.tableId, t).left.foreach(e => return Left(e)))
      Right(sent.toSeq)
    }
  }
}
