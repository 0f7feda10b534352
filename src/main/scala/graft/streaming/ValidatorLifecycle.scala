package graft.streaming

import scala.collection.mutable

/**
 * DM continuous-validator STAGE ORCHESTRATION — the lifecycle machine that
 * wraps the row-compare worker ([[Validator]], q53) exactly as the
 * reference wraps its validate workers:
 *
 *  - the validator's stage is Running or Stopped ONLY, and is INDEPENDENT
 *    of the subtask's stage: pausing/resuming the subtask never touches it
 *    (dm/syncer/data_validator.go:162-166 doc comment; the running
 *    validator merely blocks in waitSyncerRunning while the syncer is
 *    paused, data_validator.go:543-559);
 *  - one DataValidator object per subtask lifetime: `dmctl validation
 *    stop/start` call Stop/Start on the SAME object
 *    (data_validator.go:167-169), and only subtask close/kill discard it
 *    (dm/worker/subtask.go:578-580, 609-610 — "we can start/stop validator
 *    independent of task" so StopValidator does NOT nil it);
 *  - Start(expect) is a guarded edge: no-op when already Running, no-op
 *    when expect != Running, Stopped-with-error-result when initialization
 *    fails (data_validator.go:346-385); StartValidator additionally
 *    refuses mode != fast/full and expect == InvalidStage BEFORE creating
 *    the object (dm/worker/subtask.go:247-273);
 *  - stopInner is the single stop path — both dmctl stop and any
 *    validation error funnel through it (errorProcessRoutine,
 *    data_validator.go:461-482) — and warns/no-ops when not Running
 *    (data_validator.go:743-765);
 *  - per-table validate status: Running or Stopped(message), entered on
 *    the table's first row event, sticky once Stopped, cleared only by
 *    reset() on the next Start (data_validator.go:885-931, 250-266);
 *  - markErrorStarted turns on when the validator's progress first
 *    reaches the syncer's flushed point, or after the row-error delay
 *    (data_validator.go:387-398, 484-491);
 *  - checkpoint/data flush on txn boundaries gated by meta-flush-interval
 *    OR a reached cut-over location (data_validator.go:999-1017).
 *
 * Spark mapping: this kernel carries only the DECISIONS (stage edges,
 * per-table classification, counters, flush cadence); the row compare
 * itself is the [[Validator]] micro-batch loop and the persisted state is
 * its versioned parquet pointer — the reference's meta tables.
 */
object ValidatorLifecycle {

  // pb.Stage values (dm/pb/dmworker.pb.go:107-115)
  val InvalidStage = 0
  val StageNew = 1
  val Running = 2
  val Paused = 3
  val Stopped = 4
  val Finished = 5
  val Pausing = 6
  val Resuming = 7
  val Stopping = 8
  val StageNames: Map[Int, String] = Map(
    InvalidStage -> "InvalidStage", StageNew -> "New", Running -> "Running",
    Paused -> "Paused", Stopped -> "Stopped", Finished -> "Finished",
    Pausing -> "Pausing", Resuming -> "Resuming", Stopping -> "Stopping")

  // table-stop reasons (dm/syncer/data_validator.go:57-60)
  val MoreColumnInBinlogMsg = "binlog has more columns than current table"
  val TableWithoutPrimaryKeyMsg = "no primary key"
  val TableNotSyncedOrDropped = "table is not synced or dropped"
  val DownstreamPKColumnOutOfBoundsMsg =
    "primary key column of downstream table out of range of binlog event row"

  // validation modes (dm/config/task.go:68-70)
  val ModeNone = "none"
  val ModeFast = "fast"
  val ModeFull = "full"

  // defaults (dm/config/task.go:72-83), in ms / counts
  val DefaultWorkerCount = 4
  val DefaultValidateIntervalMs = 10000L
  val DefaultCheckIntervalMs = 5000L
  val DefaultRowErrorDelayMs = 30L * 60 * 1000
  val DefaultMetaFlushIntervalMs = 5L * 60 * 1000
  val DefaultBatchQuerySize = 100

  // row-change job types (dm/syncer/data_validator.go:90-96)
  val RowInsert = 0
  val RowUpdated = 1
  val RowDeleted = 2

  /**
   * The facts genValidateTableInfo extracts from tracker + downstream
   * schema for one row event (data_validator.go:795-857):
   * is the source table tracked; how many VISIBLE columns the tracked
   * schema has vs the binlog row's column count; does the event-shaped
   * (column-stripped) schema yield a usable not-null unique key; does the
   * CURRENT (unstripped) schema yield one.
   */
  final case class TableFacts(
      tracked: Boolean,
      visibleColumns: Int,
      binlogColumns: Int,
      eventSchemaHasKey: Boolean,
      currentSchemaHasKey: Boolean)

  /**
   * Stop-message classification, decision order exactly as the reference
   * walks it: untracked first (schema.IsTableNotExists →
   * tableNotSyncedOrDropped, :810-813), then the visible-column stripping
   * (tableInfoForVisibleColumnCount ok=false → moreColumnInBinlogMsg,
   * :827-830 with :860-884), then the key probe on the STRIPPED schema —
   * whose nil answer asks the CURRENT schema to distinguish "the key
   * exists but its columns sit beyond the binlog row image" from "there is
   * no key at all" (:840-850). None = validate this table.
   */
  def classify(f: TableFacts): Option[String] =
    if (!f.tracked) Some(TableNotSyncedOrDropped)
    else if (f.visibleColumns < f.binlogColumns) Some(MoreColumnInBinlogMsg)
    else if (!f.eventSchemaHasKey) {
      if (f.currentSchemaHasKey) Some(DownstreamPKColumnOutOfBoundsMsg)
      else Some(TableWithoutPrimaryKeyMsg)
    } else None

  final case class TableStatus(source: String, target: String,
                               var stage: Int, var message: String)
}

/**
 * One subtask's validator orchestration: the SubTask-held handle
 * (create-once, stop-keeps, close-nils) plus the DataValidator stage
 * machine, table statuses, row counters and flush cadence. Time is an
 * explicit millisecond argument so every edge is deterministic and
 * replayable against the SQL oracle.
 *
 * @param mode validator config mode (none/fast/full)
 * @param hasSyncer whether the subtask's unit list contains a syncer
 *                  (dm/worker/subtask.go:258-267 — no syncer, no validator)
 */
final class ValidatorLifecycle(
    mode: String,
    hasSyncer: Boolean = true,
    rowErrorDelayMs: Long = ValidatorLifecycle.DefaultRowErrorDelayMs,
    metaFlushIntervalMs: Long = ValidatorLifecycle.DefaultMetaFlushIntervalMs) {
  import ValidatorLifecycle._

  // ---- subtask side ----
  private var subtaskStage: Int = StageNew
  /** subtask closed/killed: removed from the worker's holder, so a later
    * `validation start` finds no subtask and no-ops
    * (dm/worker/source_worker.go:1341-1348). */
  private var closed: Boolean = false
  /** st.validator != nil (dm/worker/subtask.go:111,269-271,580). */
  private var created: Boolean = false

  // ---- validator side (valid while created) ----
  private var vStage: Int = Stopped // NewContinuousDataValidator: setStage(Stopped)
  private var markErrorStarted: Boolean = false
  private var resultErrors: Int = 0
  private var startTimeMs: Long = 0L
  private var lastFlushMs: Long = 0L
  private var cutOverLoc: Option[Long] = None
  private var flushedLoc: Option[Long] = None
  private var flushCount: Int = 0
  private var newErrorRows: Long = 0L
  private val processed = Array(0L, 0L, 0L) // insert, update, delete
  private val tableStatus = mutable.LinkedHashMap.empty[String, TableStatus]

  /** SubTask.validatorStage(): InvalidStage while no validator object
    * exists (dm/worker/subtask.go:525-532). */
  def stage: Int = if (created) vStage else InvalidStage

  def subtaskView: Int = subtaskStage
  def isMarkErrorStarted: Boolean = created && markErrorStarted
  def errorCount: Int = resultErrors
  def flushes: Int = flushCount
  def lastFlushedLoc: Option[Long] = flushedLoc
  def processedRowCounts: (Long, Long, Long) =
    (processed(RowInsert), processed(RowUpdated), processed(RowDeleted))

  /** GetValidatorTableStatus(filter): InvalidStage returns all
    * (data_validator.go:1290-1307). */
  def tableStatuses(filter: Int = InvalidStage): Seq[TableStatus] =
    tableStatus.values.toSeq
      .filter(t => filter == InvalidStage || t.stage == filter)

  // ---- edges ----

  /**
   * SubTask.Run (dm/worker/subtask.go:201-223): refuse when Finished or
   * already Running; otherwise StartValidator(expectValidatorStage,
   * startWithSubtask=true) BEFORE the unit starts, then the subtask takes
   * its expected stage.
   */
  def subtaskRun(expectStage: Int, expectValidatorStage: Int,
                 nowMs: Long): Unit = {
    if (closed || subtaskStage == Finished || subtaskStage == Running) return
    startValidator(expectValidatorStage, nowMs)
    subtaskStage = expectStage
  }

  /**
   * SubTask.StartValidator (dm/worker/subtask.go:247-273) followed by
   * DataValidator.Start (data_validator.go:346-385). The object-creation
   * guards (InvalidStage expectation, mode, missing syncer) run BEFORE the
   * validator object exists; the Running/expect guards run inside Start on
   * the (possibly fresh) object — so expect=Stopped still CREATES the
   * handle and leaves it Stopped, observably different from InvalidStage.
   *
   * @param initFails inject an initialization failure: Start fills the
   *                  process result and stays Stopped (:364-367)
   */
  def startValidator(expect: Int, nowMs: Long,
                     initFails: Boolean = false): Unit = {
    if (closed) return // subtask gone from the holder → operate no-ops
    if (expect == InvalidStage) return // validation mode=none upstream key
    if (mode != ModeFast && mode != ModeFull) return
    if (!hasSyncer) return
    if (!created) {
      created = true
      vStage = Stopped
    }
    // DataValidator.Start
    if (vStage == Running) return // "already started"
    if (expect != Running) return // "expect stage is not running"
    reset()
    if (initFails) { resultErrors += 1; return }
    startTimeMs = nowMs
    lastFlushMs = nowMs // doValidate: v.lastFlushTime = time.Now() (:650)
    vStage = Running
  }

  /** reset() on (re)start (data_validator.go:250-266): counters, result,
    * markErrorStarted and the table-status map all clear. */
  private def reset(): Unit = {
    markErrorStarted = false
    resultErrors = 0
    java.util.Arrays.fill(processed, 0L)
    newErrorRows = 0L
    tableStatus.clear()
  }

  /** SubTask.StopValidator → stopInner: warn-and-keep when not Running;
    * the handle itself survives for the next `validation start`
    * (dm/worker/subtask.go:275-281, data_validator.go:743-765). */
  def stopValidator(): Unit = if (created && vStage == Running) vStage = Stopped

  /** Any error reaching errorProcessRoutine: the result collects it and —
    * unless it is a cancellation — the validator stops itself
    * (data_validator.go:439-482). */
  def validatorError(contextCancelled: Boolean = false): Unit = {
    if (!created || vStage != Running) return
    if (!contextCancelled) { resultErrors += 1; stopValidator() }
  }

  /** Pause/resume of the SUBTASK: validator stage untouched — the
    * documented independence (data_validator.go:165). */
  def subtaskPause(): Unit =
    if (subtaskStage == Running) subtaskStage = Paused
  def subtaskResume(): Unit =
    if (subtaskStage == Paused) subtaskStage = Running

  /** SubTask.Close/Kill: units close, validator stops AND the handle is
    * discarded — stage reads InvalidStage afterwards
    * (dm/worker/subtask.go:569-611). */
  def subtaskClose(): Unit = {
    if (subtaskStage == Stopped || subtaskStage == Finished) return
    subtaskStage = Stopped
    stopValidator()
    created = false
    closed = true
  }

  /**
   * waitSyncerSynced's progress probe (data_validator.go:484-491): the
   * first time the validator's location is at-or-past the syncer's flushed
   * point, failed rows start escalating to error rows. The delay fallback
   * (markErrorStartedRoutine, :387-398) fires on any later edge once
   * rowErrorDelayMs has elapsed since Start.
   */
  def observeProgress(validatorLoc: Long, syncerFlushedLoc: Long,
                      nowMs: Long): Unit = {
    if (!created || vStage != Running) return
    maybeDelayMark(nowMs)
    if (validatorLoc >= syncerFlushedLoc) markErrorStarted = true
  }

  private def maybeDelayMark(nowMs: Long): Unit =
    if (!markErrorStarted && nowMs - startTimeMs >= rowErrorDelayMs)
      markErrorStarted = true

  /**
   * One binlog rows event (data_validator.go:885-996). Returns the number
   * of row-validation jobs dispatched (0 when filtered, table-stopped, or
   * the table classifies to a stop message).
   *
   * @param filtered   syncer.skipRowsEvent said skip (:898-904)
   * @param changeType RowInsert/RowUpdated/RowDeleted
   * @param rows       row (pairs) in the event
   * @param identityUpdated update touches the key → split to delete+insert
   *                        (:975-984)
   */
  def rowsEvent(table: String, target: String, facts: TableFacts,
                changeType: Int, rows: Int, nowMs: Long,
                filtered: Boolean = false,
                identityUpdated: Boolean = false): Int = {
    if (!created || vStage != Running) return 0
    maybeDelayMark(nowMs)
    if (filtered) return 0
    val existing = tableStatus.get(table)
    if (existing.exists(_.stage == Stopped)) return 0
    val st = existing.getOrElse {
      val s = TableStatus(table, target, Running, "")
      tableStatus(table) = s
      s
    }
    classify(facts) match {
      case Some(msg) =>
        st.stage = Stopped; st.message = msg
        0
      case None =>
        if (changeType == RowUpdated && identityUpdated) {
          processed(RowDeleted) += rows
          processed(RowInsert) += rows
          2 * rows
        } else {
          processed(changeType) += rows
          rows
        }
    }
  }

  /** UpdateValidator's cut-over request (the reference stores the location
    * for the next flush check, data_validator.go:1364-1386). */
  def setCutOver(loc: Long): Unit = if (created) cutOverLoc = Some(loc)

  /**
   * Txn-boundary flush check (XID/QueryEvent/heartbeat →
   * checkAndPersistCheckpointAndData, data_validator.go:999-1017): flush
   * when the meta interval elapsed OR a pending cut-over location has been
   * reached; a flush clears the cut-over, re-arms the clock, zeroes the
   * new-error counter and advances the flushed location.
   */
  def txnBoundary(loc: Long, nowMs: Long): Boolean = {
    if (!created || vStage != Running) return false
    maybeDelayMark(nowMs)
    val needCutOver = cutOverLoc.exists(_ <= loc)
    if (nowMs - lastFlushMs > metaFlushIntervalMs || needCutOver) {
      if (needCutOver) cutOverLoc = None
      lastFlushMs = nowMs
      flushCount += 1
      newErrorRows = 0L
      flushedLoc = Some(loc)
      true
    } else false
  }

  def addNewErrorRows(n: Long): Unit = if (created) newErrorRows += n
  def newErrorRowCount: Long = newErrorRows
}
