package graft.streaming

import scala.collection.mutable

/**
 * `dmctl query-status` TASK-STAGE AGGREGATION
 * (dm/ctl/master/query_status.go:100-172 `wrapTaskResult`): the no-args
 * overview collapses every task's per-source subtask stages into ONE
 * task status by an ORDER-DEPENDENT fold over the response's sources:
 *
 *  - an Error verdict latches (the `strings.HasPrefix(taskStage,
 *    stageError)` first case swallows everything after it);
 *  - a Paused subtask WITH errors → "Error - Some error occurred in
 *    subtask";
 *  - a RUNNING Sync-unit subtask whose source relay is Paused/Stopped →
 *    "Error - Relay status is <stage>" where the relay stage itself
 *    reads Error when the relay carries a process error
 *    (`getRelayStage`, :106-112);
 *  - a Paused verdict (no error) latches below Error;
 *  - the first subtask seeds the verdict with its own stage; a later
 *    DIFFERING stage degrades the verdict to Running (the "Others →
 *    Running" row of the reference's own decision table);
 *  - every Error verdict gains the "Please run `query-status <task>`
 *    ..." suffix at render time (:155-158);
 *  - the wrapper only applies to a fully-true response — any
 *    source-level failure falls back to the raw dump (hasFalseResult,
 *    :115-120).
 *
 * Pure driver-side fold over the status rows every `query-status` user
 * reads first; the row compare behind the statuses is q53/q285 land.
 */
object QueryStatus {

  /** query_status.go:27. */
  val StageError = "Error"

  // pb.UnitType (dm/pb/dmworker.pb.go:154-159)
  val UnitInvalid = 0
  val UnitCheck = 1
  val UnitDump = 2
  val UnitLoad = 3
  val UnitSync = 4
  val UnitRelay = 100

  /** One subtask row of the response: (source, task, stage, unit,
    * subtask-has-errors) with its source's relay (stage, has-errors) —
    * relayStage None = no relay on that source. */
  final case class SubTaskRow(source: String, task: String, stage: Int,
      unit: Int, hasErrors: Boolean,
      relay: Option[(Int, Boolean)])

  /** getRelayStage (:106-112). */
  def relayStage(stage: Int, hasErrors: Boolean): String =
    if (hasErrors) StageError else ValidatorLifecycle.StageNames(stage)

  /**
   * wrapTaskResult's fold (:115-153) + the render suffix (:155-158).
   * Rows must arrive in the response's (source, subtask) order — the
   * fold is order-dependent by design. Returns task → (status, sources).
   */
  def wrapTaskResult(rows: Seq[SubTaskRow])
      : Seq[(String, String, Seq[String])] = {
    val status = mutable.LinkedHashMap.empty[String, String]
    val sources = mutable.LinkedHashMap.empty[String, Vector[String]]
    rows.foreach { r =>
      sources(r.task) = sources.getOrElse(r.task, Vector.empty) :+ r.source
      val cur = status.getOrElse(r.task, "")
      val stName = ValidatorLifecycle.StageNames(r.stage)
      if (cur.startsWith(StageError)) {
        // latched
      } else if (r.stage == ValidatorLifecycle.Paused && r.hasErrors) {
        status(r.task) = StageError + " - Some error occurred in subtask"
      } else if (r.unit == UnitSync && r.stage == ValidatorLifecycle.Running
        && r.relay.exists(rs => rs._1 == ValidatorLifecycle.Paused ||
          rs._1 == ValidatorLifecycle.Stopped)) {
        val (rst, rerr) = r.relay.get
        status(r.task) = StageError + " - Relay status is " +
          relayStage(rst, rerr)
      } else if (cur == ValidatorLifecycle.StageNames(
        ValidatorLifecycle.Paused)) {
        // Paused latches below Error
      } else if (cur.isEmpty || r.stage == ValidatorLifecycle.Paused) {
        status(r.task) = stName
      } else if (cur != stName) {
        status(r.task) = ValidatorLifecycle.StageNames(
          ValidatorLifecycle.Running)
      }
    }
    status.toSeq.map { case (task, st) =>
      val rendered =
        if (st.startsWith(StageError))
          st + ". Please run `query-status " + task + "` to get more details."
        else st
      (task, rendered, sources(task))
    }
  }

  /** The wrapper-applies gate (:88-95): only a fully-true no-filter
    * `--more`-less query collapses; any false result falls back to the
    * raw dump. */
  def shouldWrap(respResult: Boolean, sourceResults: Seq[Boolean],
                 taskNameFilter: String, sourcesFilter: Seq[String],
                 more: Boolean): Boolean =
    respResult && taskNameFilter.isEmpty && sourcesFilter.isEmpty && !more &&
      sourceResults.forall(identity)
}
