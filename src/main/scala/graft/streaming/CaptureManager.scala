package graft.streaming

/**
 * The owner's capture-membership manager (SURVEY §2 R5's member leg):
 * the heartbeat/epoch handshake that decides when a capture's table
 * reports are trustworthy, and the init/removed change feed the
 * replication manager consumes. Reference:
 * cdc/scheduler/internal/v3/member/capture_manager.go —
 * CaptureStatus.handleHeartbeatResponse (:83-118: epoch-mismatch responses
 * from initialized captures are DROPPED, the first response adopts the
 * processor epoch, a stopping liveness downgrades the state, tables
 * replaced wholesale), Tick's heartbeat fan-out with the collect-stats
 * pending flag (:175-215), HandleAliveCaptureUpdate (:237-300: new
 * captures start Uninitialized and get an empty heartbeat, removals feed
 * `changes.Removed` only after the first full initialization, and the
 * first time every capture is initialized the full table snapshot becomes
 * `changes.Init`), and TakeChanges' consume-once semantics (:303-312).
 *
 * Stopping counts as initialized (:166-173) — a shutting-down capture's
 * tables still need moving, so it must not block the init barrier.
 */
object CaptureManager {
  import ReplicationSet.TableStatus
  import TableSchedulers.CaptureState

  /** model.Liveness (model/capture.go): 0 = alive, 1 = stopping. */
  val LivenessAlive = 0
  val LivenessStopping = 1

  /** member.CaptureStatus (:59-68). */
  final class Status(val id: String, val addr: String, val isOwner: Boolean,
                     val ownerRev: Long) {
    private[streaming] var epoch: String = ""
    private[streaming] var state: Int = CaptureState.Uninitialized
    private[streaming] var tables: Seq[TableStatus] = Seq.empty
    def currentState: Int = state
    def currentEpoch: String = epoch
    def currentTables: Seq[TableStatus] = tables

    /** handleHeartbeatResponse (:83-118). Returns false when the
      * response was dropped on an epoch mismatch. */
    def handleHeartbeatResponse(respTables: Seq[TableStatus],
                                liveness: Int, respEpoch: String): Boolean = {
      if (state != CaptureState.Uninitialized && epoch != respEpoch)
        return false // stale processor epoch: ignore
      if (state == CaptureState.Uninitialized) {
        epoch = respEpoch
        state = CaptureState.Initialized
      }
      if (liveness == LivenessStopping) state = CaptureState.Stopping
      tables = respTables
      true
    }
  }

  /** CaptureChanges (:121-125). */
  final case class Changes(init: Map[String, Seq[TableStatus]],
                           removed: Map[String, Seq[TableStatus]])

  /** One owner→capture heartbeat (Tick, :196-211). */
  final case class Heartbeat(to: String, spans: Seq[Long],
                             isStopping: Boolean, collectStats: Boolean)

  final class Manager(ownerId: String, ownerRev: Long,
                      heartbeatTick: Int, collectStatsTick: Int) {
    private[streaming] val captures =
      scala.collection.mutable.SortedMap.empty[String, Status]
    private var initializedFlag = false
    private var changes: Option[Changes] = None
    private var tickCounter = 0
    private var pendingCollect = false

    def capture(id: String): Option[Status] = captures.get(id)
    def initialized: Boolean = initializedFlag

    /** CheckAllCaptureInitialized (:160-173): stopping counts as
      * initialized; an empty membership does not. */
    def checkAllCaptureInitialized: Boolean =
      initializedFlag && allInitialized
    private def allInitialized: Boolean =
      captures.nonEmpty &&
        captures.values.forall(_.state != CaptureState.Uninitialized)

    /** Tick (:175-215): advance the logical clock; every
      * collectStatsTick ticks arms the stats flag, every heartbeatTick
      * ticks fans a heartbeat to every capture carrying the spans that
      * capture holds and the drain signal. */
    def tick(tablesPerCapture: Map[String, Seq[Long]],
             drainingCapture: Option[String]): Seq[Heartbeat] = {
      tickCounter += 1
      if (tickCounter % collectStatsTick == 0) pendingCollect = true
      if (tickCounter % heartbeatTick != 0) return Seq.empty
      val out = captures.keys.toSeq.map { to =>
        Heartbeat(to, tablesPerCapture.getOrElse(to, Seq.empty),
          isStopping = drainingCapture.contains(to),
          collectStats = pendingCollect)
      }
      pendingCollect = false
      out
    }

    /** HandleMessage's heartbeat-response leg (:218-235): responses from
      * unknown captures are dropped. */
    def handleHeartbeatResponse(from: String, tables: Seq[TableStatus],
                                liveness: Int, epoch: String): Unit =
      captures.get(from)
        .foreach(_.handleHeartbeatResponse(tables, liveness, epoch))

    /** HandleAliveCaptureUpdate (:237-300). Returns the ids of the new
      * captures (each gets an empty heartbeat in the reference). */
    def handleAliveCaptureUpdate(alive: Map[String, String]): Seq[String] = {
      val fresh = scala.collection.mutable.ArrayBuffer.empty[String]
      alive.toSeq.sortBy(_._1).foreach { case (id, addr) =>
        if (!captures.contains(id)) {
          captures(id) = new Status(id, addr, isOwner = id == ownerId,
            ownerRev)
          fresh += id
        }
      }
      captures.keys.toSeq.foreach { id =>
        if (!alive.contains(id)) {
          val gone = captures.remove(id).get
          if (initializedFlag) { // changes only after init (:269-279)
            val cur = changes.getOrElse(Changes(Map.empty, Map.empty))
            changes = Some(cur.copy(
              removed = cur.removed + (id -> gone.tables)))
          }
        }
      }
      if (!initializedFlag && allInitialized) {
        // first full initialization: snapshot every capture's tables —
        // a fresh Changes, like the Go's overwrite (:286-292); pre-init
        // removals never reached `changes` anyway (:270-272)
        changes = Some(Changes(
          captures.map { case (id, c) => id -> c.tables }.toMap,
          Map.empty))
        initializedFlag = true
      }
      fresh.toSeq
    }

    /** TakeChanges (:303-312): consume-once, and nothing before init. */
    def takeChanges(): Option[Changes] = {
      if (!initializedFlag) return None
      val out = changes
      changes = None
      out
    }
  }
}
