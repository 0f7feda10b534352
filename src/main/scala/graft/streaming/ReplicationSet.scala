package graft.streaming

/**
 * The owner's per-table replication-set state machine (SURVEY §2 R5's
 * pure-semantics core): how TiCDC moves ONE table between capture nodes
 * without ever running two writing primaries. Reference:
 * cdc/scheduler/internal/v3/replication/replication_set.go —
 * states (:44-69), roles (:97-105), init from reported table statuses
 * (:141-283), the poll loop + invariant (:385-468), the five per-state
 * handlers (:471-861), the four owner-side triggers (:866-1020) and the
 * monotonic checkpoint merge (:1023-1063).
 *
 *   Absent ─AddTable→ Prepare → Commit → Replicating ─RemoveTable→ Removing
 *                        ↑ MoveTable ───────┘
 *
 * Spark-first framing: Spark's own scheduler replaces the TRANSPORT
 * (capture heartbeats, gRPC dispatch) — SURVEY maps R5's cluster plumbing
 * to it — but the HANDOFF PROTOCOL itself (secondary prepares while the
 * primary keeps replicating; the primary is stopped only once the
 * secondary is prepared; promotion waits for Undetermined captures to
 * report stopped, else two primaries could write) is the reference's
 * exactly-once table-ownership contract, reproduced here as a pure kernel
 * and exercised by q276 plus a randomized mini-cluster convergence
 * property (ReplicationSetSpec).
 *
 * One documented delta: the Go returns dispatch messages in map-iteration
 * order and breaks min-workload ties nondeterministically; this kernel is
 * fully deterministic (sorted capture ids) — same decisions up to
 * tie-break, reproducible for the oracle.
 */
object ReplicationSet {

  /** tablepb.TableState (cdc/processor/tablepb/table.pb.go:40-47). */
  object TableState {
    val Unknown = 0; val Absent = 1; val Preparing = 2; val Prepared = 3
    val Replicating = 4; val Stopping = 5; val Stopped = 6
    val names: Map[Int, String] = Map(0 -> "Unknown", 1 -> "Absent",
      2 -> "Preparing", 3 -> "Prepared", 4 -> "Replicating",
      5 -> "Stopping", 6 -> "Stopped")
  }

  /** ReplicationSetState (replication_set.go:44-69). */
  object RepState {
    val Unknown = 0; val Absent = 1; val Prepare = 2; val Commit = 3
    val Replicating = 4; val Removing = 5
    val names: Map[Int, String] = Map(0 -> "Unknown", 1 -> "Absent",
      2 -> "Prepare", 3 -> "Commit", 4 -> "Replicating", 5 -> "Removing")
  }

  /** Role (replication_set.go:97-105). */
  object Role {
    val Primary = 1; val Secondary = 2; val Undetermined = 3
    val names: Map[Int, String] =
      Map(1 -> "Primary", 2 -> "Secondary", 3 -> "Undetermined")
  }

  /** tablepb.Checkpoint: the (checkpointTs, resolvedTs, lastSyncedTs)
    * triple the owner aggregates per table. */
  final case class Checkpoint(checkpointTs: Long, resolvedTs: Long,
                              lastSyncedTs: Long = 0L)

  /** One capture's report for this table — tablepb.TableStatus. `stats`
    * stands in for tablepb.Stats: merged only when non-empty
    * (replication_set.go:1058-1061). */
  final case class TableStatus(tableId: Long, state: Int,
                               checkpoint: Checkpoint = Checkpoint(0, 0),
                               stats: Map[String, Long] = Map.empty)

  /** The owner→processor dispatch messages poll emits
    * (schedulepb.DispatchTableRequest: AddTable at replication_set.go:
    * 500-514 / 628-641 / 672-684, RemoveTable at :585-597 / 716-727 /
    * 821-833). */
  sealed trait Msg { def tableId: Long; def to: String }
  final case class AddTableReq(tableId: Long, to: String,
                               isSecondary: Boolean,
                               checkpoint: Checkpoint) extends Msg
  final case class RemoveTableReq(tableId: Long, to: String) extends Msg

  /** Build a set from the statuses captures report at owner startup
    * (NewReplicationSet, replication_set.go:141-283). Left = the
    * inconsistency errors the Go raises (span mismatch, two captures
    * replicating). */
  def init(tableId: Long, checkpointTs: Long,
           statuses: Seq[(String, TableStatus)]): Either[String, Rep] = {
    val r = new Rep(tableId,
      Checkpoint(checkpointTs, checkpointTs))
    var stoppingCount = 0
    var committed = false
    // Deterministic delta: the Go iterates the status map in random
    // order; sorted capture ids give identical end state (set
    // construction is order-insensitive modulo the multiple-primary
    // error, which fires for ANY second Replicating report).
    statuses.sortBy(_._1).foreach { case (captureId, st) =>
      if (st.tableId != tableId)
        return Left("schedulerv3: table id inconsistent")
      r.updateCheckpointAndStats(st.checkpoint, st.stats)
      st.state match {
        case TableState.Replicating =>
          if (r.primary.nonEmpty)
            return Left("schedulerv3: multiple primary")
          for (e <- r.setCapture(captureId, Role.Secondary).left) return Left(e)
          for (e <- r.promoteSecondary(captureId).left) return Left(e)
        case TableState.Preparing =>
          for (e <- r.setCapture(captureId, Role.Secondary).left) return Left(e)
        case TableState.Prepared =>
          committed = true
          for (e <- r.setCapture(captureId, Role.Secondary).left) return Left(e)
        case TableState.Stopping =>
          for (e <- r.setCapture(captureId, Role.Undetermined).left)
            return Left(e)
          stoppingCount += 1
        case _ => // Absent / Stopped / unknown: ignore (:243-255).
      }
    }
    // State derivation, in the reference's exact order (:257-274).
    if (r.primary.nonEmpty) r.state = RepState.Replicating
    if (r.hasRole(Role.Secondary)) r.state = RepState.Prepare
    if (committed) r.state = RepState.Commit
    if (r.captures.isEmpty) r.state = RepState.Absent
    if (r.state == RepState.Unknown && r.captures.size == stoppingCount)
      r.state = RepState.Removing
    Right(r)
  }

  /**
   * The live set. All methods are driver-side control plane (one entry
   * per table span); errors surface as Left mirroring the Go's
   * ErrReplicationSetInconsistent / ErrReplicationSetMultiplePrimaryError.
   */
  final class Rep private[ReplicationSet] (val tableId: Long,
                                           c0: Checkpoint) {
    private[streaming] var state: Int = RepState.Unknown
    private[streaming] var primary: String = ""
    private[streaming] val captures =
      scala.collection.mutable.Map.empty[String, Int]
    private[streaming] var checkpoint: Checkpoint = c0
    // Stats seeded with the init checkpoint (NewReplicationSet:157-186):
    // a new table stuck in incremental scan must not let the owner's
    // min-puller resolved ts rise past its creation point. Only the
    // puller-egress stage is consumed downstream (AdvanceCheckpoint).
    private[streaming] var stats: Map[String, Long] =
      Map("puller-egress" -> c0.checkpointTs)

    def currentState: Int = state
    def currentPrimary: String = primary
    def currentCaptures: Map[String, Int] = captures.toMap
    def currentCheckpoint: Checkpoint = checkpoint
    def currentStats: Map[String, Long] = stats

    private[streaming] def hasRole(role: Int): Boolean =
      captures.exists(_._2 == role)
    private def isInRole(id: String, role: Int): Boolean =
      captures.get(id).contains(role)
    /** Deterministic delta: smallest capture id in the role (Go:
      * arbitrary map order — only reached when exactly one exists). */
    private def getRole(role: Int): Option[String] =
      captures.collect { case (id, r) if r == role => id }
        .toSeq.sorted.headOption

    private[ReplicationSet] def setCapture(id: String, role: Int)
        : Either[String, Unit] =
      captures.get(id) match {
        case Some(r) if r != role =>
          Left(s"can not set $id as ${Role.names(role)}, it's ${Role.names(r)}")
        case _ => captures(id) = role; Right(())
      }

    private def clearCapture(id: String, role: Int): Either[String, Unit] =
      captures.get(id) match {
        case Some(r) if r != role =>
          Left(s"can not clear $id as ${Role.names(role)}, it's ${Role.names(r)}")
        case _ => captures.remove(id); Right(())
      }

    private[ReplicationSet] def promoteSecondary(id: String)
        : Either[String, Unit] = {
      if (primary == id) return Right(()) // already promoted (:334-341)
      captures.get(id) match {
        case Some(r) if r != Role.Secondary =>
          return Left(s"can not promote $id to primary, it's ${Role.names(r)}")
        case _ =>
      }
      if (primary.nonEmpty) captures.remove(primary)
      primary = id
      captures(primary) = Role.Primary
      Right(())
    }

    private def clearPrimary(): Unit = {
      captures.remove(primary); primary = ""
    }

    /** checkInvariant (replication_set.go:385-415). */
    private def checkInvariant: Either[String, Unit] = {
      if (captures.isEmpty &&
          (state == RepState.Prepare || state == RepState.Commit ||
           state == RepState.Replicating))
        return Left(
          "schedulerv3: empty primary/secondary in state prepare/commit/replicating")
      val rp = captures.get(primary)
      if ((rp.isEmpty && primary.nonEmpty) ||
          rp.exists(_ != Role.Primary))
        return Left("schedulerv3: capture inconsistent")
      captures.find { case (id, r) => r == Role.Primary && id != primary }
        .foreach(_ => return Left("schedulerv3: multiple primary"))
      Right(())
    }

    /** The poll loop (replication_set.go:419-468): dispatch per state,
      * repeat while the state keeps changing, invariant checked each
      * iteration. A status from an untracked capture is a no-op. */
    def poll(input: TableStatus, captureId: String)
        : Either[String, Seq[Msg]] = {
      if (!captures.contains(captureId)) return Right(Seq.empty)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Msg]
      var changed = true
      while (changed) {
        for (e <- checkInvariant.left) return Left(e)
        val step: Either[String, (Option[Msg], Boolean)] = state match {
          case RepState.Absent      => pollOnAbsent(input, captureId)
          case RepState.Prepare     => pollOnPrepare(input, captureId)
          case RepState.Commit      => pollOnCommit(input, captureId)
          case RepState.Replicating => pollOnReplicating(input, captureId)
          case RepState.Removing    => pollOnRemoving(input, captureId)
          case _ => Left("schedulerv3: table state unknown")
        }
        step match {
          case Left(e) => return Left(e)
          case Right((msg, ch)) => msg.foreach(buf += _); changed = ch
        }
      }
      Right(buf.toSeq)
    }

    /** replication_set.go:471-494. */
    private def pollOnAbsent(input: TableStatus, captureId: String)
        : Either[String, (Option[Msg], Boolean)] = input.state match {
      case TableState.Absent =>
        state = RepState.Prepare
        setCapture(captureId, Role.Secondary).map(_ => (None, true))
      case TableState.Stopped => Right((None, false)) // unexpected shutdown
      case _ => Right((None, false)) // warn-ignore
    }

    /** replication_set.go:496-576. */
    private def pollOnPrepare(input: TableStatus, captureId: String)
        : Either[String, (Option[Msg], Boolean)] = input.state match {
      case TableState.Absent if isInRole(captureId, Role.Secondary) =>
        Right((Some(AddTableReq(tableId, captureId, isSecondary = true,
          checkpoint)),
          false))
      case TableState.Preparing if isInRole(captureId, Role.Secondary) =>
        Right((None, false)) // may take a long time — keep waiting
      case TableState.Prepared if isInRole(captureId, Role.Secondary) =>
        state = RepState.Commit; Right((None, true))
      case TableState.Replicating if primary == captureId =>
        updateCheckpointAndStats(input.checkpoint, input.stats)
        Right((None, false))
      case TableState.Stopping | TableState.Stopped =>
        if (primary == captureId) {
          // Primary stopped mid-move: clear it, wait for the secondary.
          clearPrimary(); Right((None, false))
        } else if (isInRole(captureId, Role.Secondary)) {
          clearCapture(captureId, Role.Secondary) match {
            case Left(e) => Left(e)
            case Right(_) =>
              state = if (primary.nonEmpty) RepState.Replicating
                      else RepState.Absent
              Right((None, true))
          }
        } else Right((None, false))
      case _ => Right((None, false)) // warn-ignore
    }

    /** replication_set.go:578-771. */
    private def pollOnCommit(input: TableStatus, captureId: String)
        : Either[String, (Option[Msg], Boolean)] = input.state match {
      case TableState.Prepared =>
        if (isInRole(captureId, Role.Secondary)) {
          if (primary.nonEmpty)
            // Ask the old primary to stop before promoting (:584-598).
            return Right((Some(RemoveTableReq(tableId, primary)), false))
          if (hasRole(Role.Undetermined))
            // Unknown captures may still be writing — wait (:599-612).
            return Right((None, false))
          for (e <- promoteSecondary(captureId).left) return Left(e)
        }
        // Promoted secondary: retry the primary AddTable (:626-641).
        if (primary == captureId && !hasRole(Role.Secondary))
          Right((Some(AddTableReq(tableId, captureId,
            isSecondary = false, checkpoint)), false))
        else Right((None, false))

      case TableState.Stopped | TableState.Absent =>
        if (primary == captureId) {
          updateCheckpointAndStats(input.checkpoint, input.stats)
          clearPrimary()
          if (!hasRole(Role.Secondary)) {
            state = RepState.Absent; Right((None, true)) // :649-658
          } else {
            // Primary stopped: promote the prepared secondary (:659-684).
            val sec = getRole(Role.Secondary).get
            promoteSecondary(sec) match {
              case Left(e) => Left(e)
              case Right(_) =>
                Right((Some(AddTableReq(tableId, primary,
                  isSecondary = false, checkpoint)), false))
            }
          }
        } else if (isInRole(captureId, Role.Secondary)) {
          // Wait for the original primary's report (:685-703).
          clearCapture(captureId, Role.Secondary) match {
            case Left(e) => Left(e)
            case Right(_) =>
              if (primary.isEmpty) state = RepState.Absent
              Right((None, true))
          }
        } else if (isInRole(captureId, Role.Undetermined)) {
          clearCapture(captureId, Role.Undetermined).map(_ => (None, false))
        } else Right((None, false))

      case TableState.Replicating =>
        if (primary == captureId) {
          updateCheckpointAndStats(input.checkpoint, input.stats)
          if (hasRole(Role.Secondary))
            // Old primary not stopped yet — re-ask (:716-728).
            Right((Some(RemoveTableReq(tableId, captureId)), false))
          else {
            // Promotion done / secondary lost: Replicating (:730-744).
            state = RepState.Replicating
            Right((None, true))
          }
        } else Left("schedulerv3: multiple primary")

      case TableState.Stopping =>
        if (primary == captureId && hasRole(Role.Secondary)) {
          updateCheckpointAndStats(input.checkpoint, input.stats)
          Right((None, false))
        } else if (isInRole(captureId, Role.Undetermined))
          Right((None, false))
        else Right((None, false)) // warn-ignore

      case _ => Right((None, false)) // Preparing + others: warn-ignore
    }

    /** replication_set.go:774-816. */
    private def pollOnReplicating(input: TableStatus, captureId: String)
        : Either[String, (Option[Msg], Boolean)] = input.state match {
      case TableState.Replicating =>
        if (primary == captureId) {
          updateCheckpointAndStats(input.checkpoint, input.stats)
          Right((None, false))
        } else Left("schedulerv3: multiple primary")
      case TableState.Stopped if primary == captureId =>
        updateCheckpointAndStats(input.checkpoint, input.stats)
        // Primary gone with no move in flight: back to Absent (:794-809).
        clearPrimary()
        state = RepState.Absent
        Right((None, true))
      case _ => Right((None, false)) // warn-ignore
    }

    /** replication_set.go:819-861 — note clear errors here are logged
      * and SWALLOWED by the reference (:846-855), kept as-is. */
    private def pollOnRemoving(input: TableStatus, captureId: String)
        : Either[String, (Option[Msg], Boolean)] = input.state match {
      case TableState.Preparing | TableState.Prepared |
           TableState.Replicating =>
        Right((Some(RemoveTableReq(tableId, captureId)), false))
      case TableState.Absent | TableState.Stopped =>
        if (primary == captureId) clearPrimary()
        else if (isInRole(captureId, Role.Secondary)) {
          clearCapture(captureId, Role.Secondary); ()
        } else { clearCapture(captureId, Role.Undetermined); () }
        Right((None, false))
      case TableState.Stopping => Right((None, false))
      case _ => Right((None, false))
    }

    /** handleTableStatus (replication_set.go:863-867). */
    def handleTableStatus(from: String, status: TableStatus)
        : Either[String, Seq[Msg]] = poll(status, from)

    /** handleAddTable (:869-901): only from Absent; the new capture
      * starts as secondary and is polled with a synthetic Absent. */
    def handleAddTable(captureId: String): Either[String, Seq[Msg]] = {
      if (state != RepState.Absent) return Right(Seq.empty) // ignored
      for (e <- setCapture(captureId, Role.Secondary).left) return Left(e)
      poll(TableStatus(tableId, TableState.Absent), captureId)
    }

    /** handleMoveTable (:903-949): only from Replicating, dest must not
      * be the primary; dest becomes secondary, polled with Absent. */
    def handleMoveTable(dest: String): Either[String, Seq[Msg]] = {
      if (hasRemoved) return Right(Seq.empty)
      if (state != RepState.Replicating || primary == dest)
        return Right(Seq.empty)
      state = RepState.Prepare
      for (e <- setCapture(dest, Role.Secondary).left) return Left(e)
      poll(TableStatus(tableId, TableState.Absent), dest)
    }

    /** handleRemoveTable (:951-988): only from Replicating; polls the
      * primary with a synthetic Replicating at the current checkpoint. */
    def handleRemoveTable(): Either[String, Seq[Msg]] = {
      if (hasRemoved) return Right(Seq.empty)
      if (state != RepState.Replicating) return Right(Seq.empty)
      state = RepState.Removing
      poll(TableStatus(tableId, TableState.Replicating,
        Checkpoint(checkpoint.checkpointTs, checkpoint.resolvedTs)), primary)
    }

    /** hasRemoved (:990-994): Removing with no capture left. */
    def hasRemoved: Boolean =
      state == RepState.Removing && captures.isEmpty

    /** handleCaptureShutdown (:996-1020): synthesize a Stopped report;
      * the Boolean says whether this set was affected. */
    def handleCaptureShutdown(captureId: String)
        : Either[String, (Seq[Msg], Boolean)] = {
      if (!captures.contains(captureId)) return Right((Seq.empty, false))
      poll(TableStatus(tableId, TableState.Stopped), captureId)
        .map(ms => (ms, true))
    }

    /** updateCheckpointAndStats (:1023-1063): zero resolvedTs backfills
      * from checkpointTs; all three fields merge monotonically; stats
      * replace only when non-empty. */
    private[ReplicationSet] def updateCheckpointAndStats(
        c: Checkpoint, s: Map[String, Long]): Unit = {
      val rts = if (c.resolvedTs < c.checkpointTs && c.resolvedTs == 0L)
        c.checkpointTs else c.resolvedTs
      checkpoint = Checkpoint(
        math.max(checkpoint.checkpointTs, c.checkpointTs),
        math.max(checkpoint.resolvedTs, rts),
        math.max(checkpoint.lastSyncedTs, c.lastSyncedTs))
      if (s.nonEmpty) stats = s
    }
  }
}
