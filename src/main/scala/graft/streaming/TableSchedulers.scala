package graft.streaming

/**
 * The owner's five table schedulers (SURVEY §2 R5): the DECISION functions
 * that turn (current tables, capture states, replication sets) into
 * add/remove/move tasks. Reference:
 * cdc/scheduler/internal/v3/scheduler/scheduler_basic.go:50-212 (initial
 * dispatch + drop removal), scheduler_balance.go:60-106 (periodic
 * balance), scheduler_rebalance.go:52-209 (manual rebalance + the shared
 * `newBalanceMoveTables` victim/target algebra and
 * `randomizeWorkload`'s input<<8|random layout at :199-229),
 * scheduler_drain_capture.go:72-204 (drain a stopping capture), and
 * scheduler_move_table.go:69-163 (manual move validation).
 *
 * Spark-first framing: Spark's scheduler does the actual task placement;
 * these kernels are the reference's PLACEMENT POLICY, kept because a user
 * of the product drives them through the API (`/api/v1/rebalance_table`,
 * `/move_table`, capture drain) and their decisions are observable
 * contract. Deterministic delta, stated once for all five: the Go breaks
 * ties by random map-iteration order and salts workloads with 8 random
 * bits (randomizeWorkload, rebalance.go:211-229); this kernel sorts
 * capture ids and spans and uses a zero salt — the reference's own
 * deterministic test mode (`random=nil` sorts spans,
 * rebalance.go:146-152) — so every decision is reproducible for the
 * oracle while the victim/target counts match the Go exactly.
 */
object TableSchedulers {
  import ReplicationSet.{Rep, RepState}

  /** member.CaptureState (capture_manager.go:39-46). */
  object CaptureState {
    val Uninitialized = 1; val Initialized = 2; val Stopping = 3
  }

  final case class CaptureStatus(id: String, state: Int,
                                 isOwner: Boolean = false)

  sealed trait Task
  final case class MoveTable(tableId: Long, destCapture: String) extends Task
  final case class AddTable(tableId: Long, captureId: String,
                            checkpointTs: Long) extends Task
  final case class RemoveTable(tableId: Long, captureId: String) extends Task
  /** BurstBalance (replication_manager.go:49-67). */
  final case class BurstBalance(adds: Seq[AddTable] = Seq.empty,
                                removes: Seq[RemoveTable] = Seq.empty,
                                moves: Seq[MoveTable] = Seq.empty) extends Task

  /**
   * The basic scheduler (scheduler_basic.go:50-137): add every current
   * table that has no replication set (or an Absent one) — capped at
   * `batchSize`, round-robin over non-stopping captures — and remove
   * every replication set whose table is no longer current.
   */
  def basicSchedule(checkpointTs: Long, currentTables: Seq[Long],
                    captures: Seq[CaptureStatus],
                    replications: Map[Long, Rep],
                    batchSize: Int): Seq[Task] = {
    val tasks = scala.collection.mutable.ArrayBuffer.empty[Task]
    val tablesLenEqual = currentTables.size == replications.size
    var tablesAllFind = true
    val newTables = scala.collection.mutable.ArrayBuffer.empty[Long]
    currentTables.iterator.takeWhile(_ => newTables.size < batchSize)
      .foreach { t =>
        replications.get(t) match {
          case None =>
            newTables += t; tablesAllFind = false
          case Some(rep) if rep.currentState == RepState.Absent =>
            newTables += t
          case _ =>
        }
      }
    if (newTables.nonEmpty) {
      val ids = captures.filter(_.state != CaptureState.Stopping)
        .map(_.id).sorted
      if (ids.isEmpty) return tasks.toSeq // no progress possible (:91-102)
      val adds = newTables.zipWithIndex.map { case (t, i) =>
        AddTable(t, ids(i % ids.size), checkpointTs) // round-robin (:140-162)
      }
      tasks += BurstBalance(adds = adds.toSeq)
    }
    if (!tablesLenEqual || !tablesAllFind) { // fast-path check (:106-112)
      val current = currentTables.toSet
      val rmTables = replications.keys.filter(!current.contains(_)).toSeq.sorted
      val removes = rmTables.flatMap { t =>
        val rep = replications(t)
        // Go takes an arbitrary capture from rep.Captures (:172-177);
        // sorted-first here. A capture-less set is skipped with a warn.
        rep.currentCaptures.keys.toSeq.sorted.headOption
          .map(RemoveTable(t, _))
      }
      if (removes.nonEmpty) tasks += BurstBalance(removes = removes)
    }
    tasks.toSeq
  }

  /** randomizeWorkload with the zero salt (rebalance.go:211-229). */
  private def workloadKey(size: Int): Int = size << 8

  /**
   * The shared balance core (newBalanceMoveTables,
   * rebalance.go:108-197): per-capture replicating-table sets, victims =
   * tables beyond ceil(len(replications)/len(captures)) per capture,
   * each victim re-homed to the min-workload capture, capped at
   * `maxTaskLimit`.
   */
  def balanceMoveTables(captures: Seq[CaptureStatus],
                        replications: Map[Long, Rep],
                        maxTaskLimit: Int): Seq[MoveTable] = {
    val perCapture = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]
    captures.foreach(c => perCapture(c.id) =
      scala.collection.mutable.ArrayBuffer.empty[Long])
    replications.toSeq.sortBy(_._1).foreach { case (t, rep) =>
      if (rep.currentState == RepState.Replicating)
        perCapture.getOrElseUpdate(rep.currentPrimary,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += t
    }
    val upperLimit =
      math.ceil(replications.size.toDouble / captures.size).toInt
    val victims = scala.collection.mutable.ArrayBuffer.empty[Long]
    perCapture.toSeq.sortBy(_._1).foreach { case (_, spans) =>
      val sorted = spans.sorted // the Go's deterministic mode (:146-152)
      val toRemove = sorted.size - upperLimit
      if (toRemove > 0) {
        val out = sorted.take(toRemove)
        victims ++= out
        spans --= out
      }
    }
    if (victims.isEmpty) return Seq.empty
    val workload = scala.collection.mutable.Map.empty[String, Int]
    perCapture.foreach { case (id, ts) => workload(id) = workloadKey(ts.size) }
    val sizes = scala.collection.mutable.Map.empty[String, Int]
    perCapture.foreach { case (id, ts) => sizes(id) = ts.size }
    val moves = scala.collection.mutable.ArrayBuffer.empty[MoveTable]
    victims.zipWithIndex.foreach { case (t, idx) =>
      if (idx < maxTaskLimit) { // task limit (:183-186)
        // min workload, smallest id on tie (Go: random map order).
        val target = workload.toSeq.sortBy { case (id, w) => (w, id) }.head._1
        moves += MoveTable(t, target)
        sizes(target) += 1
        workload(target) = workloadKey(sizes(target))
      }
    }
    moves.toSeq
  }

  /**
   * The periodic balance scheduler's per-tick decision
   * (scheduler_balance.go:60-106) with the interval/forceBalance timing
   * left to the caller: no tasks while any capture is stopping.
   */
  def balanceSchedule(captures: Seq[CaptureStatus],
                      replications: Map[Long, Rep],
                      maxTaskConcurrency: Int): Seq[Task] = {
    if (captures.exists(_.state == CaptureState.Stopping)) return Seq.empty
    balanceMoveTables(captures, replications, maxTaskConcurrency)
      .map(m => m: Task)
  }

  /**
   * Manual rebalance (scheduler_rebalance.go:52-106): fires only when
   * triggered, no capture is stopping (a stopping capture CLEARS the
   * trigger), and EVERY current table exists and is Replicating; emits
   * one unlimited BurstBalance of moves. Returns (tasks, trigger-after):
   * the trigger survives a premature tick and clears on a stopping
   * capture or acceptance (task emission).
   */
  def rebalanceSchedule(triggered: Boolean, currentTables: Seq[Long],
                        captures: Seq[CaptureStatus],
                        replications: Map[Long, Rep])
      : (Seq[Task], Boolean) = {
    if (!triggered) return (Seq.empty, false)
    if (captures.isEmpty) return (Seq.empty, true)
    if (captures.exists(_.state == CaptureState.Stopping))
      return (Seq.empty, false) // ignore + clear (:69-77)
    val allReplicating = currentTables.forall(t =>
      replications.get(t).exists(_.currentState == RepState.Replicating))
    if (!allReplicating) return (Seq.empty, true) // premature (:79-91)
    val moves = balanceMoveTables(captures, replications, Int.MaxValue)
    if (moves.isEmpty) (Seq.empty, true)
    else (Seq(BurstBalance(moves = moves)), false) // accept clears (:98-105)
  }

  /**
   * Drain-capture (scheduler_drain_capture.go:72-204). Returns
   * (tasks, target-after): with no target set, a stopping non-owner
   * capture is adopted; the target resets when no destination captures
   * exist or the drain has finished (no tables left on it); any
   * non-Replicating table skips the tick wholesale.
   */
  def drainSchedule(target0: Option[String],
                    captures: Seq[CaptureStatus],
                    replications: Map[Long, Rep],
                    maxTaskConcurrency: Int)
      : (Seq[Task], Option[String]) = {
    val target = target0.orElse {
      captures.filter(c => !c.isOwner && c.state == CaptureState.Stopping)
        .map(_.id).sorted.headOption // Go: map order (:84-93)
    }
    target match {
      case None => (Seq.empty, None)
      case Some(t) =>
        val workload = scala.collection.mutable.Map.empty[String, Int]
        captures.filter(_.id != t).foreach(c => workload(c.id) = 0)
        if (workload.isEmpty) return (Seq.empty, None) // no dest (:114-124)
        val victims = scala.collection.mutable.ArrayBuffer.empty[Long]
        var skip = false
        replications.toSeq.sortBy(_._1).foreach { case (tid, rep) =>
          if (!skip) {
            if (rep.currentState != RepState.Replicating) skip = true
            else {
              if (rep.currentPrimary == t) {
                if (victims.size < maxTaskConcurrency) victims += tid
              } else workload(rep.currentPrimary) =
                workload.getOrElse(rep.currentPrimary, 0) + 1
            }
          }
        }
        if (skip) return (Seq.empty, Some(t)) // not all replicating (:131-144)
        if (victims.isEmpty) return (Seq.empty, None) // finished (:149-159)
        val tasks = victims.map { tid =>
          val dest = workload.toSeq.sortBy { case (id, w) => (w, id) }.head._1
          workload(dest) += 1 // plain ++ here, not <<8 (:196-198)
          MoveTable(tid, dest): Task
        }
        (tasks.toSeq, Some(t))
    }
  }

  /** Mutable manual-scheduler state the scheduler manager threads
    * between ticks: the drain target, the pending manual moves, the
    * rebalance trigger, and whether the periodic balance interval has
    * elapsed (the Go's checkBalanceInterval/forceBalance timing, left
    * to the caller). */
  final class SchedulerState {
    var drainTarget: Option[String] = None
    val pendingMoves = scala.collection.mutable.ArrayBuffer.empty[MoveTable]
    var rebalanceTriggered: Boolean = false
    var balanceAllowed: Boolean = true

    /** moveTableScheduler.addTask (scheduler_move_table.go:48-67):
      * a pending move on the same span declines the new request. */
    def addMove(tableId: Long, dest: String): Boolean =
      if (pendingMoves.exists(_.tableId == tableId)) false
      else { pendingMoves += MoveTable(tableId, dest); true }
  }

  /**
   * The scheduler manager's priority walk (scheduler_manager.go:66-96 +
   * scheduler.go:39-46): basic > drain > move-table > rebalance >
   * balance; the FIRST scheduler producing tasks wins the tick; every
   * scheduler but basic is suppressed while the running-task count is
   * at the concurrency cap.
   */
  def schedule(checkpointTs: Long, currentTables: Seq[Long],
               captures: Seq[CaptureStatus],
               replications: Map[Long, Rep],
               runningTaskCount: Int, maxTaskConcurrency: Int,
               addTableBatchSize: Int,
               st: SchedulerState): Seq[Task] = {
    val basic = basicSchedule(checkpointTs, currentTables, captures,
      replications, addTableBatchSize)
    if (basic.nonEmpty) return basic
    if (runningTaskCount >= maxTaskConcurrency) return Seq.empty
    val (drain, target) = drainSchedule(st.drainTarget, captures,
      replications, maxTaskConcurrency)
    st.drainTarget = target
    if (drain.nonEmpty) return drain
    val (moves, dropped) = moveTableSchedule(st.pendingMoves.toSeq,
      currentTables, captures, replications)
    st.pendingMoves --= st.pendingMoves.filter(m =>
      dropped.contains(m.tableId))
    // NOT cleared on emission: the reference clears a move only via its
    // Accept callback when the replication manager actually takes it
    // (replication_manager.go:380-433) — an emitted move skipped at the
    // concurrency cap must retry next tick. The coordinator clears
    // accepted moves after handleTasks.
    if (moves.nonEmpty) return moves
    val (reb, trig) = rebalanceSchedule(st.rebalanceTriggered,
      currentTables, captures, replications)
    st.rebalanceTriggered = trig
    if (reb.nonEmpty) return reb
    if (st.balanceAllowed)
      balanceSchedule(captures, replications, maxTaskConcurrency)
    else Seq.empty
  }

  /**
   * Manual move-table validation (scheduler_move_table.go:69-163): each
   * pending (table, dest) is DROPPED when the table is no longer
   * current, the dest capture is gone or not Initialized, the
   * replication set is missing, or the set is not Replicating; survivors
   * are emitted in span order. Returns (emitted, droppedTables).
   */
  def moveTableSchedule(pending: Seq[MoveTable], currentTables: Seq[Long],
                        captures: Seq[CaptureStatus],
                        replications: Map[Long, Rep])
      : (Seq[Task], Seq[Long]) = {
    if (pending.isEmpty || captures.isEmpty) return (Seq.empty, Seq.empty)
    val current = currentTables.toSet
    val capById = captures.map(c => c.id -> c).toMap
    val (kept, dropped) = pending.sortBy(_.tableId).partition { mv =>
      current.contains(mv.tableId) &&
        capById.get(mv.destCapture)
          .exists(_.state == CaptureState.Initialized) &&
        replications.get(mv.tableId)
          .exists(_.currentState == RepState.Replicating)
    }
    (kept.map(m => m: Task), dropped.map(_.tableId))
  }
}
