package graft.streaming

/**
 * The `/api/v2/changefeeds/{id}/synced` decision kernel
 * (cdc/api/v2/changefeed.go synced:972-1102) — a pure function of the
 * changefeed's three progress marks, the clock, and PD availability:
 *
 *  - PD unavailable (case 1): never synced; the info distinguishes
 *    "puller resolved ts is more than checkpoint-interval ahead of the
 *    checkpoint → definitely still syncing" from "gap small → check PD
 *    yourself; if PD is down and last-synced is old, syncing is done".
 *  - now − lastSyncedTs > synced-check-interval AND now − checkpointTs <
 *    checkpoint-interval (case 2): strictly synced.
 *  - now − lastSyncedTs > synced-check-interval but the checkpoint is
 *    stale (case 3): not synced; info distinguishes "resolved-checkpoint
 *    gap small → suspect PD/TiKV health is blocking resolved-ts" from a
 *    plain "not finished, please wait".
 *  - recent writes (case 4): not synced, wait.
 *
 * Defaults per GetDefaultReplicaConfig (replica_config.go:109):
 * synced-check-interval 5 min, checkpoint-interval 15 s.
 */
object SyncedStatus {

  final case class SyncedConfig(
      syncedCheckIntervalSec: Long = 300,
      checkpointIntervalSec: Long = 15)

  val InfoSynced = "synced"
  val InfoWait = "wait"
  val InfoCheckPdTikv = "check-pd-tikv"
  val InfoPdUnavailableBehind = "pd-unavailable-behind"
  val InfoPdUnavailableCheck = "pd-unavailable-check"

  /** (synced, info-class); strict >/< exactly as the reference compares
    * (changefeed.go:1024-1025,1050-1051,1066-1072). */
  def decide(nowMs: Long, lastSyncedMs: Long, checkpointMs: Long,
             pullerResolvedMs: Long, cfg: SyncedConfig,
             pdAvailable: Boolean): (Boolean, String) = {
    val sci = cfg.syncedCheckIntervalSec * 1000L
    val ci = cfg.checkpointIntervalSec * 1000L
    if (!pdAvailable) {
      if (pullerResolvedMs - checkpointMs > ci) (false, InfoPdUnavailableBehind)
      else (false, InfoPdUnavailableCheck)
    } else if (nowMs - lastSyncedMs > sci && nowMs - checkpointMs < ci)
      (true, InfoSynced)
    else if (nowMs - lastSyncedMs > sci) {
      if (pullerResolvedMs - checkpointMs < ci) (false, InfoCheckPdTikv)
      else (false, InfoWait)
    } else (false, InfoWait)
  }
}
