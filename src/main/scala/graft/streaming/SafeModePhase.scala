package graft.streaming

/**
 * DM's safe-mode PHASE kernel (SURVEY §2.5 F7's other half): q34 pins the
 * row REWRITE (INSERT→REPLACE, UPDATE→DELETE+REPLACE); this pins WHEN safe
 * mode is on — the refcount nesting and the four enable sources with their
 * distinct exit conditions. Reference:
 *
 *  - the refcount itself: dm/syncer/safe-mode/mode.go — Add(n) with a
 *    negative-count error, IncrForTable/DescForTable idempotent per table
 *    id, Reset, Enable = count != 0;
 *  - the initialization phase: dm/syncer/safe_mode.go:34-120 —
 *    reset first; task-cli-args duration has HIGHER priority than config
 *    (returns early, so `safe-mode = true` in config is not even added);
 *    config safe-mode adds 1 with no matching -1 (permanently on);
 *    duration defaults to 2 × CheckpointFlushInterval when unset;
 *    a checkpointed exit point equal to the begin location clears itself
 *    immediately (and must flush — the restart-duplication comment at
 *    safe_mode.go:80-86); exit-point-with-zero-duration is the
 *    ErrSyncerReprocessWithSafeModeFail conflict; otherwise the exit point
 *    arms one +1 reverted when the replication passes it; no exit point
 *    arms the initialization window (+1 reverted after the duration);
 *  - the runtime exits: passing the exit point
 *    (dm/syncer/syncer.go:2337-2356, strictly-greater location compare,
 *    checked BEFORE the event's safeMode snapshot at :2378 — the first
 *    event past the point renders normal); the cli-args binlog-ts exit
 *    (syncer.go:2508-2540, exitTS = first met binlog ts + duration,
 *    exit when ts > exitTS); the init-window timer (safe_mode.go:100-118).
 */
object SafeModePhase {

  /** mode.go's reference-counter. */
  final class Counter {
    private var count = 0
    private val tables = scala.collection.mutable.Set.empty[String]

    /** Left = the set-negative-count error (mode.go:93-103). */
    def add(n: Int): Either[String, Unit] =
      if (count + n < 0)
        Left(s"set negative count (${count + n}) for safe-mode not valid")
      else { count += n; Right(()) }

    /** +1 only if this table wasn't counted yet (mode.go:50-61). */
    def incrForTable(tableId: String): Unit =
      if (tables.add(tableId)) { count += 1; () }

    /** -1 only if this table was counted (mode.go:63-74). */
    def descForTable(tableId: String): Unit =
      if (tables.remove(tableId)) count -= 1

    def reset(): Unit = { count = 0; tables.clear() }
    def enable: Boolean = count != 0
    def current: Int = count
  }

  /** Initialization inputs: durations in seconds; locations/ts as longs
    * (the gate uses the stream's commit ts for all three clocks). */
  final case class InitCfg(
      cliDurationSec: Option[Long] = None,
      cfgSafeMode: Boolean = false,
      cfgDurationSec: Option[Long] = None,
      checkpointFlushIntervalSec: Long = 30L,
      exitPoint: Option[Long] = None,
      beginLocation: Long = 0L)

  /** Armed phase state after init. Each armed mechanism fires its -1 at
    * most once. `clearedExitPointAtInit` is the flush-now flag of the
    * exitPoint == beginLocation branch. */
  final case class Phase(
      counter: Counter,
      exitLoc: Option[Long],
      timer: Option[(Long, Long)], // (armTs, durationSec)
      cliDurationSec: Option[Long],
      cliExitTs: Option[Long],
      clearedExitPointAtInit: Boolean)

  /** enableSafeModeInitializationPhase (safe_mode.go:34-120). `nowTs` is
    * the phase start (arms the init-window timer). */
  def init(cfg: InitCfg, nowTs: Long): Either[String, Phase] = {
    val c = new Counter
    c.reset()
    cfg.cliDurationSec match {
      case Some(_) =>
        // cli args beat config: return BEFORE the config enable
        c.add(1)
        Right(Phase(c, None, None, cfg.cliDurationSec, None,
          clearedExitPointAtInit = false))
      case None =>
        if (cfg.cfgSafeMode) { c.add(1); () } // no matching -1: stays on
        val dur = cfg.cfgDurationSec
          .getOrElse(2L * cfg.checkpointFlushIntervalSec)
        cfg.exitPoint match {
          case Some(p) if p == cfg.beginLocation =>
            // quit safe mode at the restart point; must flush the cleared
            // point before replicating anything past it
            Right(Phase(c, None, None, None, None,
              clearedExitPointAtInit = true))
          case Some(_) if dur == 0 =>
            Left("ErrSyncerReprocessWithSafeModeFail: " +
              "safe-mode-duration=0 conflicts with an exit point " +
              "not equal to the begin location")
          case Some(p) =>
            c.add(1)
            Right(Phase(c, Some(p), None, None, None,
              clearedExitPointAtInit = false))
          case None =>
            if (dur > 0) {
              c.add(1)
              Right(Phase(c, None, Some((nowTs, dur)), None, None,
                clearedExitPointAtInit = false))
            } else Right(Phase(c, None, None, None, None,
              clearedExitPointAtInit = false))
        }
    }
  }

  /**
   * One replication event: run the three exit checks (each fires once),
   * then snapshot the flag the DML render sees (syncer.go:2378 — checks
   * run BEFORE the snapshot, so the first event past a boundary renders
   * normal). Returns (next phase, safeMode for this event).
   */
  def step(p0: Phase, endLocation: Long, nowTs: Long, binlogTs: Long)
      : (Phase, Boolean) = {
    var p = p0
    // cli exit ts arms at the FIRST met binlog ts (syncer.go:2358, 2508-2519)
    if (p.cliDurationSec.isDefined && p.cliExitTs.isEmpty)
      p = p.copy(cliExitTs = Some(binlogTs + p.cliDurationSec.get))
    // pass the safe-mode exit point: strictly greater (syncer.go:2337-2356)
    if (p.exitLoc.exists(endLocation > _)) {
      p.counter.add(-1)
      p = p.copy(exitLoc = None)
    }
    // cli-args binlog-ts exit (syncer.go:2521-2540)
    if (p.cliExitTs.exists(binlogTs > _) && p.cliDurationSec.isDefined) {
      p.counter.add(-1)
      p = p.copy(cliDurationSec = None, cliExitTs = None)
    }
    // init-window timer (safe_mode.go:100-118)
    if (p.timer.exists { case (arm, d) => nowTs - arm >= d }) {
      p.counter.add(-1)
      p = p.copy(timer = None)
    }
    (p, p.counter.enable)
  }
}
