package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.FeedStateMachine
import graft.streaming.FeedStateMachine.RunningError

/**
 * Changefeed-lifecycle gates: the owner-side state machinery that decides
 * whether a feed runs, retries, or dies (feed_state_manager.go), the GC
 * safepoint kernel that produces the fast-fail errors it consumes
 * (pkg/txnutil/gc/gc_manager.go), and the cluster version gate
 * (pkg/version/check.go). All pure control plane: scripted scenario
 * matrices anchored in count(orders), oracle = an independent SQL replay.
 */
object LifecycleQueries {

  /** One scripted step: at time `t` optionally push an admin job / report
    * an error / report a warning, then tick with status checkpoint
    * base + k and resolved ts base + r. `ovw` is resume's overwrite mark
    * (a base offset). */
  final case class FsStep(step: Int, t: Long, adm: String = null,
      ovw: Option[Long] = None, code: String = null, msg: String = "",
      warn: Boolean = false, k: Long = 0, r: Long = 0)

  private val G = "CDC:ErrProcessorUnknown" // a generic, retryable code
  private val WarnCode = "CDC:ErrSinkManagerRunError"

  /** (scenario, changefeed-error-stuck-duration ms, steps). Times are a
    * 5 s grid with deliberate gaps that straddle the 10/20/40 s backoff
    * windows; checkpoints are base offsets so every engine sees the same
    * data-anchored values. */
  val scripts: Seq[(String, Long, Seq[FsStep])] = Seq(
    // generic error → pending → backoff retries (10 s reset-consumed, then
    // 20 s, 40 s windows) → checkpoint advance past both marks → normal;
    // a fresh error after recovery must RESET the backoff (isRetrying was
    // cleared by checkAndChangeState)
    ("recover", 300000L, Seq(
      FsStep(1, 1000000L, k = 0, r = 100),
      FsStep(2, 1005000L, code = G, k = 1, r = 100),
      FsStep(3, 1010000L, k = 2, r = 100),
      FsStep(4, 1015000L, code = G, k = 2, r = 100),
      FsStep(5, 1020000L, k = 3, r = 100),
      FsStep(6, 1030000L, k = 4, r = 100),
      FsStep(7, 1035000L, k = 4, r = 100),
      FsStep(8, 1040000L, k = 10, r = 100),
      FsStep(9, 1045000L, code = G, k = 10, r = 100),
      FsStep(10, 1050000L, k = 10, r = 100))),
    // errors outlasting the stuck duration: NextBackOff's elapsed budget
    // runs out mid-retry → failed; manual resume resets everything
    ("stuckfail", 50000L, Seq(
      FsStep(1, 2000000L, k = 0, r = 100),
      FsStep(2, 2005000L, code = G, k = 1, r = 100),
      FsStep(3, 2015000L, k = 1, r = 100),
      FsStep(4, 2020000L, code = G, k = 1, r = 100),
      FsStep(5, 2035000L, k = 1, r = 100),
      FsStep(6, 2040000L, k = 1, r = 100),
      FsStep(7, 2045000L, adm = "resume", k = 1, r = 100),
      FsStep(8, 2050000L, k = 5, r = 100))),
    // GC fast-fail codes skip the retry loop entirely
    ("fastfail", 300000L, Seq(
      FsStep(1, 3000000L, k = 0, r = 100),
      FsStep(2, 3005000L, code = "CDC:ErrStartTsBeforeGC", k = 0, r = 100),
      FsStep(3, 3010000L, k = 0, r = 100),
      FsStep(4, 3015000L, adm = "resume", ovw = Some(7L), k = 0, r = 100),
      FsStep(5, 3020000L, code = "CDC:ErrSnapshotLostByGC", k = 0, r = 100))),
    // unretryable via the strings.Contains leg over message + code
    ("unretry", 300000L, Seq(
      FsStep(1, 4000000L, k = 0, r = 100),
      FsStep(2, 4005000L, code = G,
        msg = "connection refused: CDC:ErrSinkURIInvalid wrapped", k = 0,
        r = 100))),
    // the admin-job matrix: finish → resume-from-finished → stop →
    // ILLEGAL stop-while-stopped (popped, tick continues) → resume →
    // remove (no state patch; shouldBeRemoved only)
    ("admin", 300000L, Seq(
      FsStep(1, 5000000L, k = 0, r = 100),
      FsStep(2, 5005000L, adm = "finish", k = 0, r = 100),
      FsStep(3, 5010000L, k = 0, r = 100),
      FsStep(4, 5015000L, adm = "resume", k = 0, r = 100),
      FsStep(5, 5020000L, adm = "stop", k = 0, r = 100),
      FsStep(6, 5025000L, adm = "stop", k = 0, r = 100),
      FsStep(7, 5030000L, adm = "resume", k = 0, r = 100),
      FsStep(8, 5035000L, adm = "remove", k = 0, r = 100))),
    // warnings with a checkpoint that stops advancing (resolved stays
    // ahead): past the stuck duration the manager synthesizes
    // ErrChangefeedUnretryable → failed
    ("warnstuck", 30000L, Seq(
      FsStep(1, 6000000L, k = 0, r = 1000),
      FsStep(2, 6005000L, warn = true, k = 0, r = 1000),
      FsStep(3, 6010000L, warn = true, k = 1, r = 1000),
      FsStep(4, 6015000L, warn = true, k = 1, r = 1000),
      FsStep(5, 6045000L, warn = true, k = 1, r = 1000))),
    // a CAUGHT-UP feed (checkpoint == resolved) touches the advance mark
    // every tick — warnings can never trip the stuck rule
    ("warnok", 30000L, Seq(
      FsStep(1, 7000000L, k = 0, r = 0),
      FsStep(2, 7005000L, warn = true, k = 0, r = 0),
      FsStep(3, 7050000L, warn = true, k = 0, r = 0))),
    // an ILLEGAL finish-while-pending falls through INTO the pending
    // retry leg; stop is legal from the resulting warning state
    ("pendadmin", 300000L, Seq(
      FsStep(1, 8000000L, k = 0, r = 100),
      FsStep(2, 8005000L, code = G, k = 1, r = 100),
      FsStep(3, 8010000L, adm = "finish", k = 2, r = 100),
      FsStep(4, 8015000L, adm = "stop", k = 2, r = 100),
      FsStep(5, 8020000L, k = 2, r = 100))),
    ("remove", 300000L, Seq(
      FsStep(1, 9000000L, k = 0, r = 100),
      FsStep(2, 9005000L, adm = "remove", k = 0, r = 100))),
    // admin jobs are handled BEFORE the uninitialized→normal patch, so a
    // stop pushed at a feed that never ticked is illegal and skipped
    ("uninit", 300000L, Seq(
      FsStep(1, 9500000L, adm = "stop", k = 0, r = 100),
      FsStep(2, 9505000L, adm = "stop", k = 0, r = 100))),
    // recovery and a fresh error in the SAME tick: checkAndChangeState
    // clears isRetrying first, so the error re-arms a FRESH 10 s backoff
    ("recerr", 300000L, Seq(
      FsStep(1, 9600000L, k = 0, r = 100),
      FsStep(2, 9605000L, code = G, k = 0, r = 100),
      FsStep(3, 9615000L, k = 1, r = 100),
      FsStep(4, 9640000L, code = G, k = 5, r = 100))))

  private def sqlStr(s: String): String =
    if (s == null) "NULL" else "'" + s.replace("'", "''") + "'"

  /** The script VALUES rows, generated from [[scripts]] so the two engines
    * replay the identical input (the SEMANTICS are re-derived independently
    * on each side). */
  private def scriptValues: String =
    scripts.flatMap { case (sc, _, steps) =>
      steps.map { e =>
        s"(${sqlStr(sc)}, ${e.step}, ${e.t}, ${sqlStr(e.adm)}, " +
          s"${e.ovw.map(_.toString).getOrElse("NULL")}, ${sqlStr(e.code)}, " +
          s"${sqlStr(if (e.code == null) null else e.msg)}, " +
          s"${if (e.warn) 1 else 0}, ${e.k}, ${e.r})"
      }
    }.mkString(",\n")

  private def cfgValues: String =
    scripts.map { case (sc, stuck, _) => s"(${sqlStr(sc)}, $stuck)" }
      .mkString(", ")

  /**
   * q252 — the feed lifecycle state machine
   * ([[graft.streaming.FeedStateMachine]], cdc/owner/feed_state_manager.go).
   * Eleven scripted scenarios × every observable per tick: state,
   * shouldRunning/shouldRemoved, adminJobPending, isRetrying, the live
   * backoff window, epoch bumps, and the patched error/warning codes. The
   * oracle re-steps the identical machine as a recursive CTE: cenkalti-v4
   * backoff algebra (consume-then-grow, Stop when elapsed + next exceeds
   * the stuck budget), the Go tick order (init marks → checkpoint tracking
   * → admin pop → state switch → deferred cleanup), and the
   * classification tables from pkg/errors/helper.go.
   */
  val feedState = GateQuery(
    "q252_feed_state",
    Some(s"""WITH RECURSIVE b AS (
      |  SELECT CAST(count(*) AS BIGINT) AS base FROM orders
      |), cfg(sc, stuck) AS (VALUES $cfgValues),
      |unret(c) AS (VALUES
      |  ('CDC:ErrExpressionColumnNotFound'), ('CDC:ErrExpressionParseFailed'),
      |  ('CDC:ErrSchemaSnapshotNotFound'), ('CDC:ErrSyncRenameTableFailed'),
      |  ('CDC:ErrChangefeedUnretryable'), ('CDC:ErrCorruptedDataMutation'),
      |  ('CDC:ErrDispatcherFailed'), ('CDC:ErrColumnSelectorFailed'),
      |  ('CDC:ErrSinkURIInvalid'), ('CDC:ErrKafkaInvalidConfig'),
      |  ('CDC:ErrMySQLInvalidConfig'), ('CDC:ErrStorageSinkInvalidConfig')),
      |vals(sc, step, t, adm, ovw, code, msg, warn, k, r) AS (VALUES
      |$scriptValues
      |), script AS (
      |  SELECT v.sc, v.step, v.t, v.adm,
      |    CASE WHEN v.ovw IS NULL THEN NULL
      |         ELSE b.base + v.ovw END AS ovw,
      |    v.code, v.code IS NOT NULL AS has_err,
      |    coalesce(v.code IN ('CDC:ErrGCTTLExceeded',
      |      'CDC:ErrSnapshotLostByGC', 'CDC:ErrStartTsBeforeGC'), FALSE)
      |      AS is_ff,
      |    coalesce((SELECT count(*) FROM unret u
      |              WHERE contains(coalesce(v.msg, '') || v.code, u.c)) > 0,
      |             FALSE) AS is_uf,
      |    v.warn, b.base + v.k AS sck, b.base + v.r AS rts
      |  FROM vals v, b
      |), stepper AS (
      |  SELECT sc, 0 AS step, CAST(0 AS BIGINT) AS t, '' AS st,
      |    1 AS run, 0 AS rm, 0 AS pend, 0 AS retr,
      |    CAST(10000 AS BIGINT) AS bo, CAST(20000 AS BIGINT) AS cur,
      |    CAST(0 AS BIGINT) AS bo_start, CAST(0 AS BIGINT) AS lret_t,
      |    CAST(0 AS BIGINT) AS lret_c, CAST(0 AS BIGINT) AS lwarn_c,
      |    CAST(0 AS BIGINT) AS ck, CAST(0 AS BIGINT) AS adv,
      |    CAST(0 AS BIGINT) AS rts_m, 0 AS bump, '' AS err, '' AS wrn,
      |    CAST(NULL AS BIGINT) AS ovw_o
      |  FROM cfg
      |  UNION ALL
      |  SELECT sc, step, t,
      |    st_out AS st, run_out AS run,
      |    CASE WHEN p_rm = 1 OR br IN ('adm_remove', 'removed')
      |         THEN 1 ELSE 0 END AS rm,
      |    CASE WHEN br LIKE 'adm%' THEN 1 ELSE 0 END AS pend,
      |    retr_out AS retr, bo_out AS bo, cur_out AS cur,
      |    start_out AS bo_start, lrett_out AS lret_t,
      |    CASE WHEN br = 'retry' THEN sck ELSE i_lret END AS lret_c,
      |    CASE WHEN br IN ('warn', 'wdead') THEN sck
      |         ELSE i_lwarn END AS lwarn_c,
      |    CASE WHEN run_out = 0 THEN 0 ELSE ck1 END AS ck,
      |    CASE WHEN run_out = 0 THEN 0 ELSE adv1 END AS adv,
      |    CASE WHEN run_out = 0 THEN 0 ELSE rts1 END AS rts_m,
      |    CASE WHEN br IN ('adm_stop', 'adm_finish', 'dead', 'efatal',
      |                     'epend', 'wdead') THEN 1 ELSE 0 END AS bump,
      |    CASE WHEN br IN ('efatal', 'epend') THEN err_code
      |         WHEN br = 'wdead' THEN 'CDC:ErrChangefeedUnretryable'
      |         ELSE '' END AS err,
      |    CASE WHEN br = 'warn' THEN '$WarnCode' ELSE '' END AS wrn,
      |    CASE WHEN br = 'adm_resume' THEN ovw ELSE NULL END AS ovw_o
      |  FROM (
      |    SELECT *,
      |      CASE br WHEN 'adm_stop' THEN 'stopped'
      |        WHEN 'adm_resume' THEN 'normal'
      |        WHEN 'adm_finish' THEN 'finished'
      |        WHEN 'init' THEN 'normal'
      |        WHEN 'dead' THEN 'failed' WHEN 'retry' THEN 'warning'
      |        WHEN 'efatal' THEN 'failed' WHEN 'epend' THEN 'pending'
      |        WHEN 'wdead' THEN 'failed' WHEN 'warn' THEN 'warning'
      |        WHEN 'idle' THEN CASE WHEN rec THEN 'normal' ELSE p_st END
      |        ELSE p_st END AS st_out,
      |      CASE br WHEN 'adm_resume' THEN 1 WHEN 'init' THEN 1
      |        WHEN 'retry' THEN 1 WHEN 'warn' THEN 1 WHEN 'idle' THEN 1
      |        ELSE 0 END AS run_out,
      |      CASE WHEN br = 'adm_resume' THEN 0
      |        WHEN br = 'epend' THEN 1
      |        WHEN br IN ('efatal', 'wdead', 'warn', 'idle')
      |          THEN CASE WHEN rec THEN 0 ELSE p_retr END
      |        ELSE p_retr END AS retr_out,
      |      CASE WHEN br = 'adm_resume' OR (br = 'epend' AND will_reset)
      |             THEN rbo
      |           WHEN br = 'dead' THEN -1
      |           WHEN br = 'retry' THEN nxt
      |           ELSE p_bo END AS bo_out,
      |      CASE WHEN br = 'adm_resume' OR (br = 'epend' AND will_reset)
      |             THEN CAST(20000 AS BIGINT)
      |           WHEN br IN ('dead', 'retry') THEN cur2
      |           ELSE p_cur END AS cur_out,
      |      CASE WHEN br = 'adm_resume' OR (br = 'epend' AND will_reset)
      |             THEN t ELSE p_start END AS start_out,
      |      CASE WHEN br = 'adm_resume' OR (br = 'epend' AND will_reset)
      |             THEN 0
      |           WHEN br = 'retry' THEN t
      |           ELSE p_lret_t END AS lrett_out
      |    FROM (
      |      SELECT *,
      |        CASE
      |          WHEN adm IS NOT NULL AND (
      |            (adm = 'stop' AND p_st IN ('normal', 'warning', 'pending'))
      |            OR (adm = 'resume'
      |                AND p_st IN ('failed', 'stopped', 'finished'))
      |            OR (adm = 'finish' AND p_st IN ('normal', 'warning'))
      |            OR adm = 'remove') THEN 'adm_' || adm
      |          WHEN p_st = '' THEN 'init'
      |          WHEN p_st = 'removed' THEN 'removed'
      |          WHEN p_st IN ('stopped', 'failed', 'finished') THEN 'halt'
      |          WHEN p_st = 'pending' AND t - p_lret_t < p_bo THEN 'wait'
      |          WHEN p_st = 'pending' AND t - p_start + nxt > stuck
      |            THEN 'dead'
      |          WHEN p_st = 'pending' THEN 'retry'
      |          WHEN has_err AND (is_ff OR is_uf) THEN 'efatal'
      |          WHEN has_err THEN 'epend'
      |          WHEN warn = 1 AND t - adv1 > stuck THEN 'wdead'
      |          WHEN warn = 1 THEN 'warn'
      |          ELSE 'idle' END AS br,
      |        (rec OR p_retr = 0) AS will_reset
      |      FROM (
      |        SELECT s.sc, e.step, e.t, e.adm, e.ovw, e.code AS err_code,
      |          e.has_err, e.is_ff, e.is_uf, e.warn, e.sck, c.stuck,
      |          s.st AS p_st, s.rm AS p_rm, s.retr AS p_retr, s.bo AS p_bo,
      |          s.cur AS p_cur, s.bo_start AS p_start,
      |          s.lret_t AS p_lret_t,
      |          CASE WHEN s.lret_c = 0 THEN e.sck ELSE s.lret_c END
      |            AS i_lret,
      |          CASE WHEN s.lret_c = 0 THEN e.sck ELSE s.lwarn_c END
      |            AS i_lwarn,
      |          greatest(s.ck, e.sck) AS ck1,
      |          greatest(s.rts_m, e.rts) AS rts1,
      |          CASE WHEN s.ck < e.sck
      |                 OR greatest(s.ck, e.sck) >= greatest(s.rts_m, e.rts)
      |               THEN e.t ELSE s.adv END AS adv1,
      |          s.cur AS nxt,
      |          CASE WHEN s.cur >= 300000 THEN CAST(600000 AS BIGINT)
      |               ELSE s.cur * 2 END AS cur2,
      |          CASE WHEN 10000 > c.stuck THEN CAST(-1 AS BIGINT)
      |               ELSE CAST(10000 AS BIGINT) END AS rbo,
      |          (s.st = 'warning'
      |            AND e.sck > CASE WHEN s.lret_c = 0 THEN e.sck
      |                             ELSE s.lret_c END
      |            AND e.sck > CASE WHEN s.lret_c = 0 THEN e.sck
      |                             ELSE s.lwarn_c END) AS rec
      |        FROM stepper s
      |        JOIN script e ON e.sc = s.sc AND e.step = s.step + 1
      |        JOIN cfg c ON c.sc = s.sc
      |      ) l1
      |    ) l2
      |  ) l3
      |)
      |SELECT sc, step, t, st AS state, run, rm AS removed,
      |  pend AS admin_pending, retr AS retrying, bo AS backoff_ms,
      |  bump AS epoch_bump, err AS error_code, wrn AS warning_code,
      |  ovw_o AS overwrite_ts
      |FROM stepper WHERE step > 0""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    val base = Tables.load(spark, dir, "orders").count()
    val rows = scripts.flatMap { case (sc, stuck, steps) =>
      var now = steps.head.t
      val m = new FeedStateMachine(stuck, () => now)
      steps.map { e =>
        now = e.t
        if (e.adm != null) {
          if (e.adm == "finish") m.markFinished()
          else m.pushAdminJob(e.adm, e.ovw.map(base + _))
        }
        if (e.code != null) m.reportErrors(RunningError(e.code, e.msg))
        if (e.warn) m.reportWarnings(RunningError(WarnCode))
        val r = m.tick(base + e.r, Some(base + e.k))
        (sc, e.step, e.t, r.state, if (r.shouldRunning) 1 else 0,
          if (r.shouldRemoved) 1 else 0, if (r.adminJobPending) 1 else 0,
          if (r.isRetrying) 1 else 0, r.backoffMs,
          if (r.epochBumped) 1 else 0, r.errorSet, r.warningSet,
          r.resumedOverwriteTs)
      }
    }
    rows.toDF("sc", "step", "t", "state", "run", "removed", "admin_pending",
      "retrying", "backoff_ms", "epoch_bump", "error_code", "warning_code",
      "overwrite_ts")
  }

  val all: Seq[GateQuery] = Seq(feedState)
}
