package graft.core

/**
 * TiCDC's GC-safepoint manager as pure decision kernels (reference
 * pkg/txnutil/gc/gc_manager.go). The manager holds back TiKV's garbage
 * collector at the fleet-min checkpoint; its two decisions are pure
 * functions of (clock, state, PD answer):
 *
 *  - `tryUpdate` (:72-107): rate-limits safepoint pushes to one per
 *    minute unless forced; a failed PD update is only an ERROR once the
 *    last SUCCESS is older than the GC TTL (before that it degrades to a
 *    warning and the stale safepoint keeps protecting); on success the
 *    manager records whether TiCDC is the cluster's blocking service
 *    (actual == our checkpoint) and warns when the actual safepoint is
 *    already AHEAD of the requested checkpoint;
 *  - `checkStaleCheckpointTs` (:109-137): classifies a changefeed
 *    checkpoint against GC reality — when TiCDC is the blocker the only
 *    risk is budget (checkpoint older than the TTL ⇒ ErrGCTTLExceeded);
 *    when some OTHER service owns the min safepoint, any checkpoint at or
 *    below it has lost its snapshot (ErrSnapshotLostByGC).
 *
 * The two error codes emitted here are exactly the GC fast-fail codes the
 * [[graft.streaming.FeedStateMachine]] kills a changefeed on — this kernel
 * is where those errors are born. TSO timestamps carry their physical
 * milliseconds in the high 46 bits (oracle.GetTimeFromTS == ts >> 18).
 */
object GcSafepoint {

  /** gcSafepointUpdateInterval (gc_manager.go:33). */
  val UpdateIntervalMs = 60000L

  def physicalMs(ts: Long): Long = ts >>> 18
  def composeTs(physMs: Long, logical: Long): Long = (physMs << 18) | logical

  final case class GcState(
      lastUpdatedMs: Long = 0L,
      lastSucceededMs: Long,
      lastSafePointTs: Long = 0L,
      isTiCDCBlockGC: Boolean = false)

  /** tryUpdate outcome: status ∈ skipped | failed-warn | failed-error |
    * updated, plus the non-fatal warnings the Go logs. */
  final case class UpdateResult(status: String, err: String,
      warnings: Seq[String])

  /**
   * TryUpdateGCSafePoint (:72-107) with the PD call abstracted to its
   * answer: Left(pd error) or Right(actual min service safepoint).
   */
  def tryUpdate(st: GcState, nowMs: Long, gcTTLSec: Long, checkpointTs: Long,
      forceUpdate: Boolean, pdResult: Either[String, Long])
      : (GcState, UpdateResult) = {
    if (nowMs - st.lastUpdatedMs < UpdateIntervalMs && !forceUpdate)
      return (st, UpdateResult("skipped", "", Nil))
    val st1 = st.copy(lastUpdatedMs = nowMs)
    pdResult match {
      case Left(_) =>
        if (nowMs - st1.lastSucceededMs >= gcTTLSec * 1000L)
          (st1, UpdateResult("failed-error",
            "CDC:ErrUpdateServiceSafepointFailed", Nil))
        else
          (st1, UpdateResult("failed-warn", "",
            Seq("update-gc-safepoint-failed")))
      case Right(actual) =>
        val warns =
          if (actual > checkpointTs) Seq("gc-safepoint-larger-than-checkpoint")
          else Nil
        (st1.copy(
          isTiCDCBlockGC = actual == checkpointTs,
          lastSafePointTs = actual,
          lastSucceededMs = nowMs),
          UpdateResult("updated", "", warns))
    }
  }

  /**
   * CheckStaleCheckpointTs (:109-137): "" when safe, else the fast-fail
   * code. `pdNowMs` is the PD clock's current time.
   */
  def checkStale(isTiCDCBlockGC: Boolean, gcTTLSec: Long, pdNowMs: Long,
      lastSafePointTs: Long, checkpointTs: Long): String = {
    val upperBound = checkpointTs - 1
    if (isTiCDCBlockGC) {
      if (pdNowMs - physicalMs(upperBound) > gcTTLSec * 1000L)
        "CDC:ErrGCTTLExceeded"
      else ""
    } else {
      // another service holds a safepoint below our min checkpoint
      if (upperBound < lastSafePointTs) "CDC:ErrSnapshotLostByGC"
      else ""
    }
  }
}
