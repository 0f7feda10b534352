package graft.streaming

/**
 * DM syncer checkpoint SNAPSHOT/FLUSH decision
 * (dm/syncer/checkpoint.go:404-445 Snapshot, :956-967 LastFlushOutdated),
 * on top of the q261 binlog position algebra:
 *
 *  - a point is out of date when its SAVED location orders strictly after
 *    its FLUSHED one under [[BinlogPos.compare]] (suffix-aware — a
 *    relay-subdir switch with a lower raw position still counts);
 *  - a snapshot carries only the out-of-date table points;
 *  - the GLOBAL point flushes when it is out of date, OR the binlog
 *    FILENAME changed even without a position advance (upstream switch /
 *    relay toggle under GTID — checkpoint.go:427-429), OR this is the
 *    first flush (zero save time), OR a safe-mode exit point is pending
 *    AND this is a SYNC flush (an async flush does not carry it);
 *  - nothing to flush on either side → no snapshot at all;
 *  - LastFlushOutdated needs BOTH the global save AND the last snapshot
 *    creation to be at least the flush interval old.
 */
object SyncerCheckpoint {

  import BinlogPos.Position

  final case class Point(saved: Position, flushed: Position)

  /** binlogPoint.outOfDate — saved strictly after flushed. */
  def outOfDate(p: Point): Boolean = BinlogPos.compare(p.saved, p.flushed) > 0

  final case class Snapshot(id: Long, flushGlobal: Boolean,
      tablePoints: Map[(String, String), Position])

  def snapshot(seq: Long, global: Point, globalSaveTimeZero: Boolean,
      isSyncFlush: Boolean, needFlushSafeModeExit: Boolean,
      tables: Map[(String, String), Point]): Option[Snapshot] = {
    val tablePoints = tables.collect {
      case (k, p) if outOfDate(p) => k -> p.saved
    }
    val flushGlobal = outOfDate(global) ||
      global.saved.name != global.flushed.name ||
      globalSaveTimeZero ||
      (isSyncFlush && needFlushSafeModeExit)
    if (tablePoints.isEmpty && !flushGlobal) None
    else Some(Snapshot(seq, flushGlobal, tablePoints))
  }

  /** checkpoint.go:956-967 — outdated only when BOTH clocks are stale. */
  def lastFlushOutdated(nowMs: Long, globalSaveMs: Long,
      lastSnapshotMs: Long, flushIntervalSec: Long): Boolean =
    nowMs - globalSaveMs >= flushIntervalSec * 1000L &&
      nowMs - lastSnapshotMs >= flushIntervalSec * 1000L
}
