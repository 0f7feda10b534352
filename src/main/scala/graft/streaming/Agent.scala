package graft.streaming

/**
 * The processor-side scheduling AGENT (SURVEY §2 R5's capture half): the
 * peer of [[ReplicationSet]] — how a capture executes the owner's
 * add/remove dispatches against its table executor and reports status.
 * Reference: cdc/scheduler/internal/v3/agent/table.go — the tableSpan
 * task machine (handleRemoveTableTask :124-170, handleAddTableTask
 * :172-256 with the prepared-is-stable rule and the
 * received→processed second-phase add), task injection ignoring a new
 * task while one is pending (:258-282), the manager poll that drops
 * Absent tables (:311-338), and the Absent default status (:386-397);
 * agent.go — owner-revision handshake (handleOwnerInfo :408-460: equal
 * revision must match the owner id, larger revision adopts + RESETS the
 * processor epoch, smaller is a staled owner and the whole message is
 * dropped), the heartbeat response carrying every tracked table (a
 * pending remove reports Stopping, :268-313), the requested-but-unknown
 * spans reported Absent (:331-337 loop), the IsStopping liveness latch
 * (:295-297, one-way Alive→Stopping per model.Liveness), and the
 * epoch-guarded dispatch handling (:331-394: a mismatched epoch drops
 * the request; a remove for an untracked table is ignored; an add
 * creates the tracking entry).
 *
 * The TableExecutor is the processor pipeline (sorter + sink start/stop)
 * — in this build that's Spark's own streaming machinery, so the trait
 * is the contract and tests drive a simulated executor.
 */
object Agent {
  import ReplicationSet.{Checkpoint, TableState, TableStatus}

  /** internal.TableExecutor (cdc/scheduler/internal/table_executor.go):
    * the processor pipeline the agent drives. */
  trait TableExecutor {
    /** Start adding (isPrepare = secondary). False = try again later. */
    def addTableSpan(tableId: Long, checkpoint: Checkpoint,
                     isPrepare: Boolean): Boolean
    /** Has the add (to prepared, or to replicating) finished? */
    def isAddTableSpanFinished(tableId: Long, isPrepare: Boolean): Boolean
    /** Start removing. False = cannot stop yet. */
    def removeTableSpan(tableId: Long): Boolean
    /** (final checkpointTs, done) once the table is fully stopped. */
    def isRemoveTableSpanFinished(tableId: Long): (Long, Boolean)
    /** Current status (state + checkpoint) of the table. */
    def getTableSpanStatus(tableId: Long, collectStat: Boolean): TableStatus
  }

  /** The contract's simplest implementation — a deterministic in-memory
    * pipeline that moves each table one state per [[tick]] and advances
    * the checkpoint by 3 per replicating table: the executor the gates
    * and specs drive the agent against (the real pipeline in this build
    * is Spark's streaming machinery). */
  final class StepExecutor(ck0: Long = 1000L) extends TableExecutor {
    val state = scala.collection.mutable.Map.empty[Long, Int]
      .withDefaultValue(TableState.Absent)
    private val target = scala.collection.mutable.Map.empty[Long, Int]
    var ck: Long = ck0

    def tick(): Unit =
      state.keys.toSeq.sorted.foreach { t =>
        (state(t), target.getOrElse(t, state(t))) match {
          case (TableState.Preparing, _) => state(t) = TableState.Prepared
          case (TableState.Prepared, TableState.Replicating) =>
            state(t) = TableState.Replicating
          case (TableState.Stopping, _) => state(t) = TableState.Stopped
          case _ =>
        }
        if (state(t) == TableState.Replicating) ck += 3
      }

    override def addTableSpan(t: Long, checkpoint: Checkpoint,
                              isPrepare: Boolean): Boolean = {
      state(t) match {
        case TableState.Absent =>
          state(t) = TableState.Preparing
          target(t) =
            if (isPrepare) TableState.Prepared else TableState.Replicating
        case TableState.Prepared if !isPrepare =>
          target(t) = TableState.Replicating
        case _ =>
      }
      true
    }
    override def isAddTableSpanFinished(t: Long,
                                        isPrepare: Boolean): Boolean =
      if (isPrepare) state(t) == TableState.Prepared
      else state(t) == TableState.Replicating
    override def removeTableSpan(t: Long): Boolean = {
      if (state(t) != TableState.Stopped) state(t) = TableState.Stopping
      target(t) = TableState.Stopped
      true
    }
    override def isRemoveTableSpanFinished(t: Long): (Long, Boolean) =
      if (state(t) == TableState.Stopped) {
        state.remove(t); target.remove(t) // released -> absent
        (ck, true)
      } else (0L, false)
    override def getTableSpanStatus(t: Long,
                                    collectStat: Boolean): TableStatus =
      TableStatus(t, state(t),
        if (state(t) == TableState.Replicating) Checkpoint(ck, ck + 2)
        else Checkpoint(0, 0))
  }

  private final case class DispatchTask(tableId: Long,
      checkpoint: Checkpoint, isRemove: Boolean, isPrepare: Boolean,
      epoch: String, var processed: Boolean = false)

  /** One tracked table (table.go:30-298). */
  final class TableSpan(val tableId: Long, executor: TableExecutor) {
    private[Agent] var state: Int = TableState.Absent
    private[Agent] var task: Option[DispatchTask] = None

    private def refresh(): (Int, Boolean) = {
      val old = state
      state = executor.getTableSpanStatus(tableId, collectStat = false).state
      (state, state != old)
    }

    def status(collectStat: Boolean): TableStatus =
      executor.getTableSpanStatus(tableId, collectStat)

    /** injectDispatchTableTask (:258-282): a pending task wins. */
    private[Agent] def inject(t: DispatchTask): Unit =
      if (task.isEmpty) task = Some(t)

    /** handleRemoveTableTask (:124-170). */
    private def handleRemove(): Option[TableStatus] = {
      var (st, _) = refresh()
      while (true) {
        st match {
          case TableState.Absent =>
            task = None
            return Some(removeResponse(status(false)))
          case TableState.Stopping | TableState.Stopped =>
            val (ckpt, done) = executor.isRemoveTableSpanFinished(tableId)
            if (!done)
              return Some(removeResponse(
                status(false).copy(state = TableState.Stopping)))
            task = None
            val s = status(false)
            return Some(removeResponse(s.copy(state = TableState.Stopped,
              checkpoint = s.checkpoint.copy(checkpointTs = ckpt))))
          case _ => // Preparing / Prepared / Replicating
            if (!executor.removeTableSpan(tableId))
              return Some(removeResponse(
                status(false).copy(state = TableState.Stopping)))
            val r = refresh(); st = r._1
            if (!r._2) return None
        }
      }
      None
    }

    /** newRemoveTableResponseMessage's zero-resolved backfill (:96-105). */
    private def removeResponse(s: TableStatus): TableStatus =
      if (s.checkpoint.resolvedTs < s.checkpoint.checkpointTs &&
          s.checkpoint.resolvedTs == 0L)
        s.copy(checkpoint =
          s.checkpoint.copy(resolvedTs = s.checkpoint.checkpointTs))
      else s

    /** handleAddTableTask (:172-256). */
    private def handleAdd(): Option[TableStatus] = {
      val t = task.get
      var (st, _) = refresh()
      while (true) {
        st match {
          case TableState.Absent =>
            if (!executor.addTableSpan(tableId, t.checkpoint, t.isPrepare))
              return Some(status(false))
            val r = refresh(); st = r._1
            if (!r._2) return None
          case TableState.Replicating =>
            task = None
            return Some(status(false))
          case TableState.Prepared =>
            if (t.isPrepare) { // prepared is stable for a prepare task
              task = None
              return Some(status(false))
            }
            if (!t.processed) {
              if (!executor.addTableSpan(tableId, t.checkpoint,
                  isPrepare = false))
                return Some(status(false))
              t.processed = true
            }
            if (!executor.isAddTableSpanFinished(tableId,
                isPrepare = false))
              return Some(status(false))
            val r = refresh(); st = r._1
            if (!r._2) return None
          case TableState.Preparing =>
            // unstable + long: report nothing to spare the owner (:227)
            if (!executor.isAddTableSpanFinished(tableId, t.isPrepare))
              return None
            val r = refresh(); st = r._1
            if (!r._2) return None
          case _ => // Stopping / Stopped: add is ignored (:243-250)
            task = None
            return Some(status(false))
        }
      }
      None
    }

    /** poll (:284-298): no task, no message. */
    private[Agent] def pollTask(): Option[TableStatus] =
      task match {
        case None => None
        case Some(t) if t.isRemove => handleRemove()
        case Some(_) => handleAdd()
      }
  }

  /** The per-capture agent (agent.go). */
  final class CaptureAgent(val captureId: String,
                           executor: TableExecutor) {
    private val tables =
      scala.collection.mutable.SortedMap.empty[Long, TableSpan]
    private var ownerOpt: Option[(String, Long)] = None // (id, revision)
    private var epochCounter = 0
    private var epochVar: String = nextEpoch()
    def epoch: String = epochVar
    private var liveness: Int = CaptureManager.LivenessAlive

    private def nextEpoch(): String = {
      epochCounter += 1
      s"$captureId-epoch-$epochCounter"
    }

    def currentLiveness: Int = liveness
    def trackedTables: Seq[Long] = tables.keys.toSeq

    /** handleLivenessUpdate (:224-236) + model.Liveness.Store: stopping
      * is terminal — alive never overwrites it. */
    def handleLivenessUpdate(l: Int): Unit =
      if (liveness == CaptureManager.LivenessAlive) liveness = l

    /** handleOwnerInfo (:408-460): equal revision must carry the same
      * owner id (Left = the reference's panic); a larger revision adopts
      * the new owner and RESETS the processor epoch; smaller = staled
      * owner, message dropped (false). */
    def handleOwnerInfo(id: String, revision: Long)
        : Either[String, Boolean] = ownerOpt match {
      case Some((oid, orev)) if orev == revision =>
        if (oid != id) Left("schedulerv3: owner IDs do not match")
        else Right(true)
      case Some((_, orev)) if orev > revision => Right(false) // staled
      case _ =>
        ownerOpt = Some((id, revision))
        epochVar = nextEpoch()
        Right(true)
    }

    /** handleMessageHeartbeat (:268-313): every tracked table reports
      * (a pending remove shows Stopping); spans the owner asks about
      * that are untracked report Absent; IsStopping latches liveness. */
    def handleHeartbeat(requestedSpans: Seq[Long], isStopping: Boolean,
                        collectStats: Boolean)
        : (Seq[TableStatus], Int, String) = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TableStatus]
      tables.values.foreach { t =>
        var s = t.status(collectStats)
        if (t.task.exists(_.isRemove)) s = s.copy(state = TableState.Stopping)
        out += s
      }
      requestedSpans.foreach { sp =>
        if (!tables.contains(sp))
          out += TableStatus(sp, TableState.Absent)
      }
      if (isStopping) handleLivenessUpdate(CaptureManager.LivenessStopping)
      (out.toSeq, liveness, epochVar)
    }

    /** handleMessageDispatchTableRequest (:331-394), epoch-guarded: the
      * add/remove legs with the table made explicit (the schedulepb
      * request carries the span; [[ReplicationSet.Msg]] does not, so
      * the caller passes it). An add starts tracking; a remove of an
      * untracked table is ignored; a mismatched epoch drops the
      * request wholesale (:334-343). */
    def dispatchAdd(tableId: Long, checkpoint: Checkpoint,
                    isSecondary: Boolean, msgEpoch: String): Unit = {
      if (msgEpoch != epochVar) return
      val t = tables.getOrElseUpdate(tableId,
        new TableSpan(tableId, executor))
      t.inject(DispatchTask(tableId, checkpoint, isRemove = false,
        isPrepare = isSecondary, epoch = msgEpoch))
    }

    def dispatchRemove(tableId: Long, msgEpoch: String): Unit = {
      if (msgEpoch != epochVar) return
      tables.get(tableId).foreach(_.inject(DispatchTask(tableId,
        Checkpoint(0, 0), isRemove = true, isPrepare = false,
        epoch = msgEpoch)))
    }

    /** tableSpanManager.poll (:311-338): run every pending task, then
      * drop tables whose state settled back to Absent. */
    def pollTables(): Seq[TableStatus] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TableStatus]
      val drop = scala.collection.mutable.ArrayBuffer.empty[Long]
      tables.values.toSeq.foreach { t =>
        t.pollTask().foreach(out += _)
        val st = t.status(false).state
        t.state = st
        if (st == TableState.Absent) drop += t.tableId
      }
      drop.foreach(tables.remove)
      out.toSeq
    }
  }
}
