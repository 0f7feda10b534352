package graft.streaming

/**
 * Relay ENABLE/OPERATE orchestration — the worker-side control plane
 * around the relay unit ([[Relay]] is the storage, [[RelayMeta]] the
 * uuid-dir meta; this is the lifecycle):
 *
 *  - the holder stage machine (dm/worker/relay.go:60-255): New at
 *    construction with closed=true, Init opens it, Start/run flips any
 *    non-Running stage to Running and clears the previous result; a
 *    process EXIT degrades to Paused unless the stage was already
 *    Stopped (run's `setStageIfNot(Stopped, Paused)`, :147) — crash and
 *    pause are the same observable; pause requires Running, resume
 *    requires Paused, stop refuses only when already Stopped and CLOSES
 *    the holder; a closed holder reports Stopped regardless of stage
 *    (Status, :151-163);
 *  - the worker's expectant-stage mapping (source_worker.go:1038-1069):
 *    etcd expect=Running starts a New holder outright (op label
 *    "BeforeAnyOp", dm/worker/metrics.go:38) and RESUMES otherwise;
 *    expect=Paused pauses; a deleted stage key stops; all ops refuse on
 *    a closed worker and silently no-op when relay isn't enabled;
 *  - EnableRelay/DisableRelay are CAS edges (source_worker.go:385-533):
 *    enabling seeds the relay start position from the EARLIEST subtask
 *    checkpoint — the binlog name with the relay-subdir suffix STRIPPED,
 *    the gtid kept, and the uuid suffix extracted from the RAW name so
 *    the relay keeps writing into the same numbered subdir
 *    (:409-434 with binlog.RemoveRelaySubDirSuffix / ExtractSuffix);
 *    no checkpoint at all still seeds the MINIMUM suffix;
 *  - ForbidPurge (source_worker.go:1109-1124): purging is refused while
 *    ANY subtask sits in New or Paused (debuggability), with the first
 *    offender named.
 */
object RelayControl {

  // pb.RelayOp (dm/pb/dmworker.pb.go:192-195)
  val InvalidRelayOp = 0
  val StopRelay = 1
  val PauseRelay = 2
  val ResumeRelay = 3
  val RelayOpNames: Map[Int, String] = Map(
    InvalidRelayOp -> "InvalidRelayOp", StopRelay -> "StopRelay",
    PauseRelay -> "PauseRelay", ResumeRelay -> "ResumeRelay")

  /** The start-before-any-op metric label (dm/worker/metrics.go:38). */
  val OpErrTypeBeforeOp = "BeforeAnyOp"

  /** EnableRelay's seeded relay config slice (source_worker.go:420-434). */
  final case class SeededCfg(binlogName: String, gtid: String, uuidSuffix: Int)

  /** Parse a MySQL-flavor GTID set string ("uuid:1-5:8,uuid2:3") into
    * merged per-uuid intervals; empty string = the empty set. */
  def parseGtidSet(s: String): Map[String, Seq[(Long, Long)]] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
      val ps = part.split(":")
      val ivs = ps.tail.toSeq.map { r =>
        val b = r.split("-")
        if (b.length == 2) (b(0).toLong, b(1).toLong)
        else (b(0).toLong, b(0).toLong)
      }.sortBy(_._1)
      // merge adjacent/overlapping
      val merged = ivs.foldLeft(Vector.empty[(Long, Long)]) { (acc, iv) =>
        acc.lastOption match {
          case Some((lo, hi)) if iv._1 <= hi + 1 =>
            acc.init :+ (lo, math.max(hi, iv._2))
          case _ => acc :+ iv
        }
      }
      ps.head -> merged.toSeq
    }.toMap

  /** go-mysql GTIDSet.Contain: every interval of `b` covered by `a`. */
  def gtidContain(a: Map[String, Seq[(Long, Long)]],
                  b: Map[String, Seq[(Long, Long)]]): Boolean =
    b.forall { case (uuid, ivs) =>
      a.get(uuid).exists(as =>
        ivs.forall { case (lo, hi) =>
          as.exists { case (alo, ahi) => alo <= lo && hi <= ahi }
        })
    }

  /** binlog.CompareGTID (dm/pkg/binlog/position.go:368-397): (cmp,
    * comparable) with empty-set short-circuits and mutual containment. */
  def compareGtid(s1: String, s2: String): (Int, Boolean) = {
    val (e1, e2) = (s1.trim.isEmpty, s2.trim.isEmpty)
    if (e1 && e2) (0, true)
    else if (e1) (-1, true)
    else if (e2) (1, true)
    else {
      val (a, b) = (parseGtidSet(s1), parseGtidSet(s2))
      val (c1, c2) = (gtidContain(a, b), gtidContain(b, a))
      if (c1 && c2) (0, true)
      else if (c1) (1, true)
      else if (c2) (-1, true)
      else (0, false)
    }
  }

  /** binlog.CompareLocation (position.go:312-331), inject-suffix-free
    * (the model carries no injected-event suffix, so the final tiebreak
    * is always 0): the GTID sets compare first when enabled; a
    * non-comparable pair falls back to the position compare. */
  def compareLocation(p1: BinlogPos.Position, g1: String,
                      p2: BinlogPos.Position, g2: String,
                      cmpGtid: Boolean): Int = {
    if (cmpGtid) {
      val (cmp, can) = compareGtid(g1, g2)
      if (can) return cmp
    }
    BinlogPos.compare(p1, p2)
  }

  /**
   * getMinLocInAllSubTasks + the seeding (server.go:928-947,
   * source_worker.go:420-434): earliest checkpoint wins (`>= 1` compare —
   * ties keep the FIRST subtask's location) under CompareLocation with
   * the INCOMING subtask's enable-gtid flag (the reference passes the
   * loop iteration's cfg), the relay binlog name strips the `|NNNNNN`
   * subdir suffix, the uuid suffix parses from the RAW name (a bad
   * suffix is the caller's error); no checkpoints → minimum suffix with
   * empty name/gtid.
   */
  def seedFromCheckpoints(locs: Seq[(BinlogPos.Position, String, Boolean)])
      : Either[String, SeededCfg] = {
    var min: Option[(BinlogPos.Position, String)] = None
    locs.foreach { case (p, g, enableGtid) =>
      if (min.isEmpty ||
        compareLocation(min.get._1, min.get._2, p, g, enableGtid) >= 1)
        min = Some((p, g))
    }
    min match {
      case None =>
        Right(SeededCfg("", "", BinlogPos.MinRelaySubDirSuffix))
      case Some((pos, gtid)) =>
        val (real, _) = BinlogPos.realMySQLPos(pos)
        BinlogPos.extractSuffix(pos.name).map(sfx =>
          SeededCfg(real.name, gtid, sfx))
    }
  }

  /** ForbidPurge: first New/Paused subtask blocks, named. */
  def forbidPurge(workerClosed: Boolean,
                  subtasks: Seq[(String, Int)]): (Boolean, String) = {
    if (workerClosed) return (false, "")
    subtasks.find { case (_, st) =>
      st == ValidatorLifecycle.StageNew || st == ValidatorLifecycle.Paused
    } match {
      case Some((name, st)) =>
        (true, s"sub task $name current stage is ${
          ValidatorLifecycle.StageNames(st)}")
      case None => (false, "")
    }
  }
}

/**
 * One worker's relay holder + enable flag. Process execution is
 * abstracted to explicit `processExit` events (the reference's relay
 * goroutine returning) so every transition is deterministic.
 */
final class RelayControl {
  import ValidatorLifecycle.{StageNew, Running, Paused, Stopped}
  import RelayControl._

  private var workerClosed = false
  private var enabled = false
  // holder fields exist while enabled (NewRelayHolder + Init)
  private var holderStage: Int = StageNew
  private var holderClosed: Boolean = true
  private var resultErrors: Int = 0
  private var hasResult: Boolean = false
  private var purgerStarted: Boolean = false

  def isEnabled: Boolean = enabled
  def isWorkerClosed: Boolean = workerClosed
  /** Status (relay.go:151-163): a closed holder reads Stopped. */
  def stage: Int =
    if (!enabled || holderClosed) Stopped else holderStage
  def rawStage: Int = holderStage
  def purgerRunning: Boolean = purgerStarted
  def resultErrorCount: Int = resultErrors

  def closeWorker(): Unit = workerClosed = true

  /** EnableRelay (source_worker.go:385-481): CAS, fresh holder (New,
    * opened by Init), relay NOT started until a Running stage arrives. */
  def enableRelay(): Boolean = {
    if (enabled) return false // "already enabled relay"
    enabled = true
    holderStage = StageNew
    holderClosed = false // Init (relay.go:94)
    resultErrors = 0; hasResult = false
    purgerStarted = false
    true
  }

  /** DisableRelay (source_worker.go:494-533): CAS; holder closes. */
  def disableRelay(): Boolean = {
    if (!enabled) return false // "already disabled relay"
    enabled = false
    holderClosed = true
    purgerStarted = false
    true
  }

  /** holder.Start → run (relay.go:110-148): any non-Running stage flips
    * to Running and the previous result clears. */
  private def startHolder(): Unit =
    if (holderStage != Running) {
      holderStage = Running
      hasResult = false; resultErrors = 0
    }

  /** The relay process goroutine RETURNING (end of run, :138-148): the
    * result lands and any non-Stopped stage degrades to Paused. */
  def processExit(errors: Int = 0): Unit = {
    if (!enabled || holderClosed || holderStage != Running) return
    hasResult = true; resultErrors = errors
    if (holderStage != Stopped) holderStage = Paused
  }

  /** holder.Operate (relay.go:178-237). Returns the error identifier. */
  private def operateHolder(op: Int): Option[String] = op match {
    case PauseRelay =>
      if (holderStage != Running) Some("ErrWorkerRelayStageNotValid")
      else {
        holderStage = Paused // then run() returns; Stopped-CAS keeps Paused
        hasResult = true
        None
      }
    case ResumeRelay =>
      if (holderStage != Paused) Some("ErrWorkerRelayStageNotValid")
      else { startHolder(); None }
    case StopRelay =>
      if (holderStage == Stopped) Some("ErrWorkerRelayStageNotValid")
      else {
        holderStage = Stopped
        holderClosed = true // stopRelay → Close (relay.go:224-237)
        None
      }
    case _ => Some("ErrWorkerRelayOperNotSupport")
  }

  /** operateRelay (source_worker.go:1056-1069): closed worker refuses,
    * disabled relay silently ignores. */
  def operateRelay(op: Int): Option[String] = {
    if (workerClosed) return Some("ErrWorkerAlreadyClosed")
    if (!enabled) return None // warn + ignore
    operateHolder(op)
  }

  /**
   * operateRelayStage (source_worker.go:1038-1053): maps the etcd
   * expectant stage to an op — a New holder under expect=Running START
   * (holder + purger) with the BeforeAnyOp label; otherwise resume;
   * Paused → pause; deleted key → stop. Returns (opLabel, error).
   */
  def operateRelayStage(expect: Int, isDeleted: Boolean = false)
      : (String, Option[String]) = {
    // NOTE: the reference's Start branch has NO closed-worker guard
    // (source_worker.go:1041-1046 — only operateRelay checks w.closed);
    // a closed worker can still cold-start a New holder here
    if (expect == Running && enabled && holderStage == StageNew) {
      startHolder()
      purgerStarted = true
      return (OpErrTypeBeforeOp, None)
    }
    val op =
      if (isDeleted) StopRelay
      else if (expect == Running) ResumeRelay
      else if (expect == Paused) PauseRelay
      else InvalidRelayOp
    (RelayOpNames(op), operateRelay(op))
  }
}
