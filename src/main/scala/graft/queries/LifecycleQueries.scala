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
    // the identifier≠code entry: an expression-filter parse failure
    // carries RFC code CDC:ErrInvalidFilterExpression
    // (cdc_errors.go:938-941) — this set member used to be re-typed as
    // the Go identifier and could never have matched a real error
    ("unretry2", 300000L, Seq(
      FsStep(1, 4100000L, k = 0, r = 100),
      FsStep(2, 4105000L, code = G,
        msg = "filter: CDC:ErrInvalidFilterExpression syntax error", k = 0,
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

  private def sqlStr(s: String): String = Gate.sqlStr(s)

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
      |  ('CDC:ErrExpressionColumnNotFound'), ('CDC:ErrInvalidFilterExpression'),
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

  /**
   * q253 — the GC safepoint kernel ([[graft.core.GcSafepoint]],
   * pkg/txnutil/gc/gc_manager.go): the update-decision matrix (one-minute
   * rate limit vs forceUpdate, failed-PD-update degrading to a warning
   * until the last SUCCESS is older than the GC TTL, block-GC detection,
   * ahead-safepoint warning) and the stale-checkpoint classifier (TTL
   * budget when TiCDC blocks GC; snapshot-lost when another service owns
   * the min safepoint). Timestamps are real TSOs (physical ms << 18) so
   * the oracle exercises the physical-extraction arithmetic. The emitted
   * codes are exactly q252's GC fast-fail inputs.
   */
  val gcSafepoint = GateQuery(
    "q253_gc_safepoint",
    Some("""WITH b AS (
      |  SELECT CAST(count(*) AS BIGINT) * 1000 AS t0,
      |    CAST(count(*) AS BIGINT) + 100 AS ck
      |  FROM orders
      |), upd AS (
      |  SELECT 'upd' AS part, u.kase,
      |    b.t0 - u.lu AS last_upd, b.t0 - u.ls AS last_succ, u.force,
      |    u.pderr, CASE WHEN u.act IS NULL THEN NULL
      |                  ELSE b.ck + u.act END AS actual,
      |    b.ck AS ckpt, u.ttl
      |  FROM (VALUES
      |    ('skip',     30000,  10000, 0, 0, -10,  86400),
      |    ('boundary', 60000,  10000, 0, 0, -10,  86400),
      |    ('forced',    1000,  10000, 1, 0, -10,  86400),
      |    ('failwarn', 70000,  50000, 0, 1, NULL, 100),
      |    ('failerr',  70000, 100000, 0, 1, NULL, 100),
      |    ('block',    70000,  10000, 0, 0, 0,    86400),
      |    ('larger',   70000,  10000, 0, 0, 50,   86400)
      |  ) u(kase, lu, ls, force, pderr, act, ttl), b
      |), upd_out AS (
      |  SELECT part, kase,
      |    CASE WHEN t0 - last_upd < 60000 AND force = 0 THEN 'skipped'
      |         WHEN pderr = 1 AND t0 - last_succ >= ttl * 1000
      |           THEN 'failed-error'
      |         WHEN pderr = 1 THEN 'failed-warn'
      |         ELSE 'updated' END AS status,
      |    CASE WHEN t0 - last_upd < 60000 AND force = 0 THEN ''
      |         WHEN pderr = 1 AND t0 - last_succ >= ttl * 1000
      |           THEN 'CDC:ErrUpdateServiceSafepointFailed'
      |         ELSE '' END AS err,
      |    CASE WHEN t0 - last_upd < 60000 AND force = 0 THEN ''
      |         WHEN pderr = 1 AND t0 - last_succ < ttl * 1000
      |           THEN 'update-gc-safepoint-failed'
      |         WHEN pderr = 0 AND actual > ckpt
      |           THEN 'gc-safepoint-larger-than-checkpoint'
      |         ELSE '' END AS warnings,
      |    CAST(CASE WHEN t0 - last_upd < 60000 AND force = 0 THEN NULL
      |         WHEN pderr = 1 THEN NULL
      |         WHEN actual = ckpt THEN 1 ELSE 0 END AS INT) AS is_block,
      |    CAST(CASE WHEN t0 - last_upd < 60000 AND force = 0 THEN NULL
      |         WHEN pderr = 1 THEN NULL
      |         ELSE actual END AS BIGINT) AS safepoint
      |  FROM upd, b
      |), chk AS (
      |  SELECT 'chk' AS part, c.kase, c.block, c.ttl,
      |    (b.t0 - c.age) * 262144 + 3 AS ck_tso,
      |    CASE WHEN c.sp IS NULL THEN CAST(0 AS BIGINT)
      |         ELSE (b.t0 - c.age) * 262144 + 3 + c.sp END AS sp_tso
      |  FROM (VALUES
      |    ('blockfresh', 1, 100, 50000,  NULL),
      |    ('blockexact', 1, 100, 100000, NULL),
      |    ('blockstale', 1, 100, 100001, NULL),
      |    ('nbok',       0, 100, 50000,  -10),
      |    ('nbeq',       0, 100, 50000,  -1),
      |    ('nblost',     0, 100, 50000,  5)
      |  ) c(kase, block, ttl, age, sp), b
      |), chk_out AS (
      |  SELECT part, kase, 'checked' AS status,
      |    CASE WHEN block = 1 AND
      |           b.t0 - ((ck_tso - 1) // 262144) > ttl * 1000
      |           THEN 'CDC:ErrGCTTLExceeded'
      |         WHEN block = 0 AND ck_tso - 1 < sp_tso
      |           THEN 'CDC:ErrSnapshotLostByGC'
      |         ELSE '' END AS err,
      |    '' AS warnings, CAST(block AS INT) AS is_block,
      |    sp_tso AS safepoint
      |  FROM chk, b
      |)
      |SELECT * FROM upd_out UNION ALL SELECT * FROM chk_out""".stripMargin)) {
    (spark, dir) =>
    import spark.implicits._
    import graft.core.GcSafepoint
    import graft.core.GcSafepoint.GcState
    val base = Tables.load(spark, dir, "orders").count()
    val t0 = base * 1000L
    val ck = base + 100L

    val updCases = Seq(
      // (kase, lastUpd offset, lastSucc offset, force, pdErr, actualRel, ttl)
      ("skip", 30000L, 10000L, false, false, Some(-10L), 86400L),
      ("boundary", 60000L, 10000L, false, false, Some(-10L), 86400L),
      ("forced", 1000L, 10000L, true, false, Some(-10L), 86400L),
      ("failwarn", 70000L, 50000L, false, true, None, 100L),
      ("failerr", 70000L, 100000L, false, true, None, 100L),
      ("block", 70000L, 10000L, false, false, Some(0L), 86400L),
      ("larger", 70000L, 10000L, false, false, Some(50L), 86400L))
    val updRows = updCases.map { case (kase, lu, ls, force, pderr, act, ttl) =>
      val st = GcState(lastUpdatedMs = t0 - lu, lastSucceededMs = t0 - ls)
      val pd: Either[String, Long] =
        if (pderr) Left("pd unreachable") else Right(ck + act.getOrElse(0L))
      val (st2, r) = GcSafepoint.tryUpdate(st, t0, ttl, ck, force, pd)
      val touched = r.status == "updated"
      ("upd", kase, r.status, r.err, r.warnings.mkString(","),
        if (touched) Some(if (st2.isTiCDCBlockGC) 1 else 0) else None,
        if (touched) Some(st2.lastSafePointTs) else None)
    }

    val chkCases = Seq(
      // (kase, blockGC, ttlSec, checkpoint age ms, safepoint rel or None)
      ("blockfresh", true, 100L, 50000L, None),
      ("blockexact", true, 100L, 100000L, None),
      ("blockstale", true, 100L, 100001L, None),
      ("nbok", false, 100L, 50000L, Some(-10L)),
      ("nbeq", false, 100L, 50000L, Some(-1L)),
      ("nblost", false, 100L, 50000L, Some(5L)))
    val chkRows = chkCases.map { case (kase, block, ttl, age, spRel) =>
      val ckTso = GcSafepoint.composeTs(t0 - age, 3L)
      val spTso = spRel.map(ckTso + _).getOrElse(0L)
      val err = GcSafepoint.checkStale(block, ttl, t0, spTso, ckTso)
      ("chk", kase, "checked", err, "", Some(if (block) 1 else 0),
        Some(spTso))
    }

    (updRows ++ chkRows).toDF("part", "kase", "status", "err", "warnings",
      "is_block", "safepoint")
  }

  private def errLabel(e: String): String =
    if (e.isEmpty) ""
    else if (e.contains("ErrNewSemVersion")) "invalid"
    else if (e.contains("different versions")) "too-many"
    else if (e.contains("minimal compatible")) "too-old"
    else if (e.contains("less than")) "too-new"
    else "err"

  /**
   * q254 — the cluster version gate ([[graft.core.VersionGate]],
   * pkg/version/check.go): SanitizeVersion's git-describe/fips/dirty
   * stripping, the PD/TiKV [7.1.0-alpha, 10.0.0) ranges with the
   * TiFlash-store skip and first-offender order, CheckTiCDCVersion's
   * ≤1-skips / ≥3-errors / [6.3.0-alpha, 10.0.0-alpha) rules, and
   * GetTiCDCClusterVersion's min-capture fold with the empty-version
   * 4.0.1 default, the unknown fleet, and the derived unified-sorter /
   * open-API gates (including the 4.0.13-prerelease and 5.0.0-rc
   * quirks). The oracle replays go-semver's ordering as a sortable key —
   * the matrix constrains pre-releases to {'', alpha, rc} where that key
   * is exact — and the sanitizer as regexp arithmetic.
   */
  val versionGate = GateQuery(
    "q254_version_gate",
    Some("""WITH b AS (
      |  SELECT CAST(count(*) AS BIGINT) AS base FROM orders
      |), raws AS (
      |  SELECT part, kase, raw FROM (VALUES
      |    ('sanitize', 'plain',    'v7.5.1'),
      |    ('sanitize', 'hash',     'v8.1.0-5-gabc1234'),
      |    ('sanitize', 'hashdev',  'v8.1.0-5-g0123abc-dev'),
      |    ('sanitize', 'fips',     'v7.1.0-fips'),
      |    ('sanitize', 'dirty',    'v7.1.0-dirty'),
      |    ('sanitize', 'predirty', 'v7.1.0-alpha-dirty'),
      |    ('sanitize', 'longhash', 'v6.5.2-20-g12345678'),
      |    ('sanitize', 'bare',     '6.1.0'),
      |    ('pd', 'old',      'v6.5.0'),
      |    ('pd', 'minedge',  'v7.1.0-alpha'),
      |    ('pd', 'rel',      '7.1.0'),
      |    ('pd', 'maxedge',  '10.0.0'),
      |    ('pd', 'maxpre',   '10.0.0-alpha'),
      |    ('pd', 'high',     '9.9.9'),
      |    ('pd', 'garbage',  'not-a-version'),
      |    ('pd', 'rcedge',   '7.1.0-rc'),
      |    ('store', 'flashskip#1', 'v5.0.0'),
      |    ('store', 'flashskip#2', 'v7.5.0'),
      |    ('store', 'kvold#1', 'v6.0.0'),
      |    ('store', 'kvminedge#1', 'v7.1.0-alpha'),
      |    ('store', 'kvtoonew#1', 'v10.0.0'),
      |    ('store', 'firstwins#1', 'v6.0.0'),
      |    ('store', 'firstwins#2', 'v10.0.0'),
      |    ('store', 'kvbad#1', 'garbage'),
      |    ('store', 'allflash#1', 'v1.0.0'),
      |    ('cdcv', 'single#1', '1.0.0'),
      |    ('cdcv', 'three#1', '6.5.0'), ('cdcv', 'three#2', '6.5.1'),
      |    ('cdcv', 'three#3', '6.5.2'),
      |    ('cdcv', 'twook#1', '6.3.0-alpha'), ('cdcv', 'twook#2', '7.0.0'),
      |    ('cdcv', 'twoold#1', '6.2.9'), ('cdcv', 'twoold#2', '7.0.0'),
      |    ('cdcv', 'maxpre#1', '6.5.0'), ('cdcv', 'maxpre#2', '10.0.0-alpha'),
      |    ('cdcv', 'belowmax#1', '6.5.0'), ('cdcv', 'belowmax#2', '9.9.9'),
      |    ('cdcv', 'twobad#1', '6.5.0'), ('cdcv', 'twobad#2', 'x.y'),
      |    ('cap', 'fleetmin#1', '6.2.0'), ('cap', 'fleetmin#2', '6.3.1'),
      |    ('cap', 'defmin#1', ''), ('cap', 'defmin#2', '6.3.1'),
      |    ('cap', 'rcquirk#1', '5.0.0-rc'), ('cap', 'rcquirk#2', '5.0.1'),
      |    ('cap', 's413#1', '4.0.13'),
      |    ('cap', 's41213#1', '4.0.12'), ('cap', 's41213#2', '4.0.13'),
      |    ('cap', 'pre413#1', '4.0.13-alpha'),
      |    ('cap', 'badcap#1', 'junk'),
      |    ('cap', 'pre620#1', '6.2.0-alpha')
      |  ) v(part, kase, raw)
      |  UNION ALL
      |  SELECT 'pd', 'anchored',
      |    '7.' || CAST(base % 7 AS VARCHAR) || '.' ||
      |    CAST(base % 100 AS VARCHAR)
      |  FROM b
      |), san AS (
      |  SELECT part, kase, raw,
      |    CASE WHEN s2 LIKE 'v%' THEN substr(s2, 2) ELSE s2 END AS clean
      |  FROM (
      |    SELECT part, kase, raw,
      |      CASE WHEN ends_with(s1, '-dirty')
      |           THEN left(s1, length(s1) - 6) ELSE s1 END AS s2
      |    FROM (
      |      SELECT part, kase, raw,
      |        CASE WHEN ends_with(s0, '-fips')
      |             THEN left(s0, length(s0) - 5) ELSE s0 END AS s1
      |      FROM (
      |        SELECT part, kase, raw,
      |          regexp_replace(raw, '-[0-9]+-g[0-9a-f]{7,}(-dev)?', '', 'g')
      |            AS s0
      |        FROM raws)))
      |), parsed AS (
      |  SELECT part, kase, raw, clean,
      |    regexp_full_match(clean,
      |      '[0-9]+\.[0-9]+\.[0-9]+(-[0-9A-Za-z.-]+)?') AS valid,
      |    CASE WHEN contains(clean, '-')
      |         THEN split_part(clean, '-', 2) ELSE '' END AS pre,
      |    split_part(clean, '-', 1) AS core
      |  FROM san
      |), keyed AS (
      |  SELECT part, kase, raw, clean, valid,
      |    CASE WHEN NOT valid THEN NULL ELSE
      |      ((CAST(split_part(core, '.', 1) AS BIGINT) * 1000 +
      |        CAST(split_part(core, '.', 2) AS BIGINT)) * 1000 +
      |        CAST(split_part(core, '.', 3) AS BIGINT)) * 4 +
      |      CASE pre WHEN '' THEN 3 WHEN 'rc' THEN 2 ELSE 1 END
      |    END AS k
      |  FROM parsed
      |), sanitize_out AS (
      |  SELECT part, kase, 1 AS ok, '' AS err, clean AS out,
      |    CAST(NULL AS INT) AS sorter, CAST(NULL AS INT) AS openapi
      |  FROM keyed WHERE part = 'sanitize'
      |), pd_out AS (
      |  SELECT part, kase,
      |    CAST(CASE WHEN NOT valid THEN 0
      |         WHEN k < 28004001 OR k >= 40000003 THEN 0
      |         ELSE 1 END AS INT) AS ok,
      |    CASE WHEN NOT valid THEN 'invalid'
      |         WHEN k < 28004001 THEN 'too-old'
      |         WHEN k >= 40000003 THEN 'too-new'
      |         ELSE '' END AS err,
      |    CASE WHEN valid THEN clean ELSE '' END AS out,
      |    CAST(NULL AS INT) AS sorter, CAST(NULL AS INT) AS openapi
      |  FROM keyed WHERE part = 'pd'
      |), tikv AS (
      |  SELECT t.kase, t.v1, t.f1, t.v2, t.f2 FROM (VALUES
      |    ('flashskip', 'v5.0.0', 1, 'v7.5.0', 0),
      |    ('kvold',     'v6.0.0', 0, NULL, NULL),
      |    ('kvminedge', 'v7.1.0-alpha', 0, NULL, NULL),
      |    ('kvtoonew',  'v10.0.0', 0, NULL, NULL),
      |    ('firstwins', 'v6.0.0', 0, 'v10.0.0', 0),
      |    ('kvbad',     'garbage', 0, NULL, NULL),
      |    ('allflash',  'v1.0.0', 1, NULL, NULL)
      |  ) t(kase, v1, f1, v2, f2)
      |), tikv_j AS (
      |  SELECT t.kase,
      |    k1.valid AS valid1, k1.k AS k1k, k2.valid AS valid2, k2.k AS k2k,
      |    t.f1, t.f2, t.v2
      |  FROM tikv t
      |  LEFT JOIN keyed k1 ON k1.part = 'store' AND k1.kase = t.kase || '#1'
      |  LEFT JOIN keyed k2 ON k2.part = 'store' AND k2.kase = t.kase || '#2'
      |), tikv_out AS (
      |  SELECT 'tikv' AS part, kase,
      |    CAST(CASE WHEN e <> '' THEN 0 ELSE 1 END AS INT) AS ok, e AS err,
      |    '' AS out, CAST(NULL AS INT) AS sorter, CAST(NULL AS INT) AS openapi
      |  FROM (
      |    SELECT kase,
      |      CASE WHEN f1 = 0 AND NOT valid1 THEN 'invalid'
      |           WHEN f1 = 0 AND k1k < 28004001 THEN 'too-old'
      |           WHEN f1 = 0 AND k1k >= 40000003 THEN 'too-new'
      |           WHEN v2 IS NOT NULL AND f2 = 0 AND NOT valid2
      |             THEN 'invalid'
      |           WHEN v2 IS NOT NULL AND f2 = 0 AND k2k < 28004001
      |             THEN 'too-old'
      |           WHEN v2 IS NOT NULL AND f2 = 0 AND k2k >= 40000003
      |             THEN 'too-new'
      |           ELSE '' END AS e
      |    FROM tikv_j)
      |), cdc_sets AS (
      |  SELECT split_part(kase, '#', 1) AS kase, count(*) AS n,
      |    sum(CASE WHEN NOT valid THEN 1 ELSE 0 END) AS n_bad,
      |    sum(CASE WHEN valid AND k < 24012001 THEN 1 ELSE 0 END) AS n_old,
      |    sum(CASE WHEN valid AND k >= 40000001 THEN 1 ELSE 0 END) AS n_new
      |  FROM keyed WHERE part = 'cdcv' GROUP BY 1
      |), cdc_out AS (
      |  SELECT 'cdc' AS part, kase,
      |    CAST(CASE WHEN e <> '' THEN 0 ELSE 1 END AS INT) AS ok, e AS err,
      |    '' AS out, CAST(NULL AS INT) AS sorter, CAST(NULL AS INT) AS openapi
      |  FROM (
      |    SELECT kase,
      |      CASE WHEN n <= 1 THEN ''
      |           WHEN n >= 3 THEN 'too-many'
      |           WHEN n_bad > 0 THEN 'invalid'
      |           WHEN n_old > 0 THEN 'too-old'
      |           WHEN n_new > 0 THEN 'too-new'
      |           ELSE '' END AS e
      |    FROM cdc_sets)
      |), cl_kases(kase) AS (VALUES ('fleetmin'), ('defmin'), ('rcquirk'),
      |  ('s413'), ('s41213'), ('pre413'), ('empty'), ('badcap'), ('pre620')
      |), caps AS (
      |  SELECT split_part(kase, '#', 1) AS kase,
      |    CASE WHEN raw = '' THEN '4.0.1' ELSE clean END AS ver,
      |    raw <> '' AND NOT valid AS bad,
      |    CASE WHEN raw = '' THEN 16000007 ELSE k END AS k
      |  FROM keyed WHERE part = 'cap'
      |), cl_sets AS (
      |  SELECT c.kase, count(p.ver) AS n,
      |    coalesce(sum(CASE WHEN p.bad THEN 1 ELSE 0 END), 0) AS n_bad,
      |    arg_min(p.ver, p.k) AS minver, min(p.k) AS kmin
      |  FROM cl_kases c LEFT JOIN caps p ON p.kase = c.kase
      |  GROUP BY 1
      |), cluster_out AS (
      |  SELECT 'cluster' AS part, kase,
      |    CAST(CASE WHEN n_bad > 0 THEN 0 ELSE 1 END AS INT) AS ok,
      |    CASE WHEN n_bad > 0 THEN 'invalid' ELSE '' END AS err,
      |    CASE WHEN n_bad > 0 THEN ''
      |         WHEN n = 0 THEN 'unknown' ELSE minver END AS out,
      |    CAST(CASE WHEN n_bad > 0 THEN NULL
      |         WHEN n = 0 THEN 1
      |         WHEN minver = '5.0.0-rc' THEN 0
      |         WHEN kmin >= 16000055 OR kmin // 4 = 4000013 THEN 1
      |         ELSE 0 END AS INT) AS sorter,
      |    CAST(CASE WHEN n_bad > 0 THEN NULL
      |         WHEN n = 0 THEN 1
      |         WHEN kmin >= 24008003 OR kmin // 4 = 6002000 THEN 1
      |         ELSE 0 END AS INT) AS openapi
      |  FROM cl_sets
      |)
      |SELECT * FROM sanitize_out
      |UNION ALL SELECT * FROM pd_out
      |UNION ALL SELECT * FROM tikv_out
      |UNION ALL SELECT * FROM cdc_out
      |UNION ALL SELECT * FROM cluster_out""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.core.VersionGate
    val base = Tables.load(spark, dir, "orders").count()

    val sanitizeCases = Seq(
      ("plain", "v7.5.1"), ("hash", "v8.1.0-5-gabc1234"),
      ("hashdev", "v8.1.0-5-g0123abc-dev"), ("fips", "v7.1.0-fips"),
      ("dirty", "v7.1.0-dirty"), ("predirty", "v7.1.0-alpha-dirty"),
      ("longhash", "v6.5.2-20-g12345678"), ("bare", "6.1.0"))
    val sanRows = sanitizeCases.map { case (kase, raw) =>
      ("sanitize", kase, 1, "", VersionGate.sanitize(raw),
        None: Option[Int], None: Option[Int])
    }

    val pdCases = Seq(
      ("old", "v6.5.0"), ("minedge", "v7.1.0-alpha"), ("rel", "7.1.0"),
      ("maxedge", "10.0.0"), ("maxpre", "10.0.0-alpha"), ("high", "9.9.9"),
      ("garbage", "not-a-version"), ("rcedge", "7.1.0-rc"),
      ("anchored", s"7.${base % 7}.${base % 100}"))
    val pdRows = pdCases.map { case (kase, raw) =>
      VersionGate.checkPd(raw) match {
        case Right(v) => ("pd", kase, 1, "", v.render,
          None: Option[Int], None: Option[Int])
        case Left(e) => ("pd", kase, 0, errLabel(e),
          if (errLabel(e) == "invalid") "" else VersionGate.sanitize(raw),
          None: Option[Int], None: Option[Int])
      }
    }

    val tikvCases = Seq(
      ("flashskip", Seq(("v5.0.0", true), ("v7.5.0", false))),
      ("kvold", Seq(("v6.0.0", false))),
      ("kvminedge", Seq(("v7.1.0-alpha", false))),
      ("kvtoonew", Seq(("v10.0.0", false))),
      ("firstwins", Seq(("v6.0.0", false), ("v10.0.0", false))),
      ("kvbad", Seq(("garbage", false))),
      ("allflash", Seq(("v1.0.0", true))))
    val tikvRows = tikvCases.map { case (kase, stores) =>
      VersionGate.checkStores(stores) match {
        case Right(_) => ("tikv", kase, 1, "", "",
          None: Option[Int], None: Option[Int])
        case Left(e) => ("tikv", kase, 0, errLabel(e), "",
          None: Option[Int], None: Option[Int])
      }
    }

    val cdcCases = Seq(
      ("single", Set("1.0.0")),
      ("three", Set("6.5.0", "6.5.1", "6.5.2")),
      ("twook", Set("6.3.0-alpha", "7.0.0")),
      ("twoold", Set("6.2.9", "7.0.0")),
      ("maxpre", Set("6.5.0", "10.0.0-alpha")),
      ("belowmax", Set("6.5.0", "9.9.9")),
      ("twobad", Set("6.5.0", "x.y")))
    val cdcRows = cdcCases.map { case (kase, vs) =>
      VersionGate.checkTiCdc(vs) match {
        case Right(_) => ("cdc", kase, 1, "", "",
          None: Option[Int], None: Option[Int])
        case Left(e) => ("cdc", kase, 0, errLabel(e), "",
          None: Option[Int], None: Option[Int])
      }
    }

    val clusterCases = Seq(
      ("fleetmin", Seq("6.2.0", "6.3.1")),
      ("defmin", Seq("", "6.3.1")),
      ("rcquirk", Seq("5.0.0-rc", "5.0.1")),
      ("s413", Seq("4.0.13")),
      ("s41213", Seq("4.0.12", "4.0.13")),
      ("pre413", Seq("4.0.13-alpha")),
      ("empty", Seq.empty[String]),
      ("badcap", Seq("junk")),
      ("pre620", Seq("6.2.0-alpha")))
    val clusterRows = clusterCases.map { case (kase, caps) =>
      VersionGate.clusterVersion(caps) match {
        case Left(e) => ("cluster", kase, 0, errLabel(e), "",
          None: Option[Int], None: Option[Int])
        case Right(minV) =>
          ("cluster", kase, 1, "",
            minV.map(_.render).getOrElse("unknown"),
            Some(if (VersionGate.unifiedSorterDefault(minV)) 1 else 0),
            Some(if (VersionGate.cliOpenApi(minV)) 1 else 0))
      }
    }

    (sanRows ++ pdRows ++ tikvRows ++ cdcRows ++ clusterRows).toDF(
      "part", "kase", "ok", "err", "out", "sorter", "openapi")
  }

  /** One server-config case: the knobs that deviate from defaults.
    * Sentinel -999 in `bs`/`wp` means "derive from base" (-base and
    * base % 16 respectively) so the matrix stays data-anchored. */
  final case class SrvCase(kase: String, cid: String = "default",
      addr: String = "127.0.0.1:8300", adv: String = "",
      gcttl: Long = 86400, ttl: Long = 10,
      usrreq: Int = 0, nusers: Int = 0, tls: Int = 0,
      sorter: Long = 128, scan: Long = 40, retry: Long = 60000,
      bi: Long = 0, bs: Long = 0, ack: Long = 0, wp: Long = 0,
      recv: Long = 0, comp: String = "none",
      bal: Long = 60000, abatch: Long = 50,
      v2: Int = 0, uri: String = "")

  val srvCases: Seq[SrvCase] = Seq(
    SrvCase("ok_defaults"),
    SrvCase("bad_cluster_regex", cid = "has_underscore"),
    SrvCase("bad_cluster_reserved", cid = "owner"),
    SrvCase("bad_cluster_long", cid = "a" * 129),
    SrvCase("ok_cluster_edge", cid = "a" * 128),
    SrvCase("empty_addr", addr = ""),
    SrvCase("advertise_inherit", addr = "myhost:1234"),
    SrvCase("advertise_unspec", adv = "0.0.0.0:8300"),
    SrvCase("advertise_v6unspec", adv = ":::8300"),
    SrvCase("advertise_noport", adv = "myhost"),
    SrvCase("advertise_domain", adv = "pd.internal:90"),
    SrvCase("gc_zero", gcttl = 0),
    SrvCase("ttl_small", ttl = 3),
    SrvCase("user_required_empty", usrreq = 1),
    SrvCase("user_required_notls", usrreq = 1, nusers = 1),
    SrvCase("sorter_small", sorter = 7),
    SrvCase("kv_scan_zero", scan = 0),
    SrvCase("kv_retry_zero", retry = 0),
    SrvCase("msg_interval_big", bi = 10001),
    SrvCase("msg_fill_anchor", bs = -999, wp = -999),
    SrvCase("msg_ack_big", ack = 20000),
    SrvCase("msg_pool_big", wp = 33),
    SrvCase("msg_recv_neg", recv = -1),
    SrvCase("db_comp_bad", comp = "zstd"),
    SrvCase("db_comp_snappy", comp = "snappy"),
    SrvCase("sched_balance_1s", bal = 1000),
    SrvCase("sched_batch_zero", abatch = 0),
    SrvCase("cdcv2_nouri", v2 = 1),
    SrvCase("cdcv2_badscheme", v2 = 1, uri = "etcd://meta:2379"),
    SrvCase("cdcv2_ok", v2 = 1, uri = "mysql://u@host:3306/db"))

  private def srvValues: String = srvCases.map { c =>
    s"(${sqlStr(c.kase)}, ${sqlStr(c.cid)}, ${sqlStr(c.addr)}, " +
      s"${sqlStr(c.adv)}, ${c.gcttl}, ${c.ttl}, ${c.usrreq}, ${c.nusers}, " +
      s"${c.tls}, ${c.sorter}, ${c.scan}, ${c.retry}, ${c.bi}, ${c.bs}, " +
      s"${c.ack}, ${c.wp}, ${c.recv}, ${sqlStr(c.comp)}, ${c.bal}, " +
      s"${c.abatch}, ${c.v2}, ${sqlStr(c.uri)})"
  }.mkString(",\n")

  private def srvReason(code: String, msg: String): String =
    if (msg.contains("cluster-id")) "cluster-id"
    else if (msg == "empty address") "empty-addr"
    else if (msg.contains("valid IP")) "advertise-ip"
    else if (msg.contains("contain a port")) "no-port"
    else if (msg.contains("GC TTL")) "gc-ttl"
    else if (msg.contains("client-allowed-user")) "allowed-user"
    else if (msg.contains("cache-size-in-mb")) "sorter-cache"
    else if (msg.contains("at least 1")) "region-scan"
    else if (msg.contains("should be positive")) "region-retry"
    else if (msg.contains("client-max-batch-interval")) "batch-interval"
    else if (msg.contains("server-ack-interval")) "ack-interval"
    else if (msg.contains("server-worker-pool-size")) "worker-pool"
    else if (msg.contains("max-recv-msg-size")) "recv-size"
    else if (msg.contains("compression")) "db-compression"
    else if (msg.contains("check-balance-interval")) "balance"
    else if (msg.contains("add-table-batch-size")) "add-batch"
    else if (msg.contains("missing meta store")) "meta-uri"
    else if (msg.contains("not supported by meta store")) "meta-scheme"
    else "other"

  /**
   * q255 — the SERVER config root ([[graft.streaming.ServerOptions]],
   * pkg/config/server_config.go ValidateAndAdjust + the sorter /
   * kv-client / messages / db / scheduler / cdc-v2 sub-validators it
   * chains). Thirty cases sweep every rule family: cluster-id shape and
   * reserved words, the advertise-addr inherit / unspecified-IP / no-port
   * legs, the capture-session-ttl reset-to-default-10 (not floor-5)
   * repair, security asymmetry (empty allow-list errors, missing TLS
   * warns), message-knob zero-fills vs hard caps (including the
   * negative-recv-size quirk where only exact 0 fills), and first-error
   * ordering. Oracle = the same chain as one SQL decision cascade.
   */
  val serverOptions = GateQuery(
    "q255_server_options",
    Some(s"""WITH b AS (
      |  SELECT CAST(count(*) AS BIGINT) AS base FROM orders
      |), vals(kase, cid, addr, adv, gcttl, ttl, usrreq, nusers, tls,
      |        sorter, scan, retry, bi, bs, ack, wp, recv, comp, bal,
      |        abatch, v2, uri) AS (VALUES
      |$srvValues
      |), prep AS (
      |  SELECT kase, cid, addr, adv, gcttl, ttl, usrreq, nusers, tls,
      |    sorter, scan, retry, bi,
      |    CASE WHEN bs = -999 THEN -b.base ELSE bs END AS bs,
      |    ack,
      |    CASE WHEN wp = -999 THEN b.base % 16 ELSE wp END AS wp,
      |    recv, comp, bal, abatch, v2, uri,
      |    CASE WHEN adv = '' THEN addr ELSE adv END AS adv2
      |  FROM vals, b
      |), ruled AS (
      |  SELECT *,
      |    CASE
      |      WHEN NOT (cid <> '' AND length(cid) <= 128
      |                AND regexp_full_match(cid, '[a-zA-Z0-9]+(-[a-zA-Z0-9]+)*')
      |                AND cid NOT IN ('owner', 'capture', 'task',
      |                                'changefeed', 'job', 'meta'))
      |        THEN 'cluster-id'
      |      WHEN addr = '' THEN 'empty-addr'
      |      WHEN NOT contains(adv2, ':') THEN 'no-port'
      |      WHEN regexp_extract(adv2, '^(.*):[^:]*$$', 1)
      |           IN ('0.0.0.0', '::', '0:0:0:0:0:0:0:0') THEN 'advertise-ip'
      |      WHEN gcttl = 0 THEN 'gc-ttl'
      |      WHEN usrreq = 1 AND nusers = 0 THEN 'allowed-user'
      |      WHEN sorter < 8 THEN 'sorter-cache'
      |      WHEN scan <= 0 THEN 'region-scan'
      |      WHEN retry <= 0 THEN 'region-retry'
      |      WHEN (CASE WHEN bi = 0 THEN 10 ELSE bi END) > 10000
      |        THEN 'batch-interval'
      |      WHEN (CASE WHEN ack = 0 THEN 100 ELSE ack END) > 10000
      |        THEN 'ack-interval'
      |      WHEN (CASE WHEN wp <= 0 THEN 8 ELSE wp END) > 32
      |        THEN 'worker-pool'
      |      WHEN recv < 0 THEN 'recv-size'
      |      WHEN comp NOT IN ('none', 'snappy') THEN 'db-compression'
      |      WHEN bal <= 1000 THEN 'balance'
      |      WHEN abatch <= 0 THEN 'add-batch'
      |      WHEN v2 = 1 AND uri = '' THEN 'meta-uri'
      |      WHEN v2 = 1 AND split_part(uri, '://', 1) <> 'mysql'
      |        THEN 'meta-scheme'
      |      ELSE '' END AS reason
      |  FROM prep
      |)
      |SELECT kase,
      |  CAST(CASE WHEN reason = '' THEN 1 ELSE 0 END AS INT) AS ok,
      |  CASE WHEN reason = '' THEN ''
      |       WHEN reason IN ('sorter-cache', 'db-compression')
      |         THEN 'CDC:ErrIllegalSorterParameter'
      |       WHEN reason IN ('meta-uri', 'meta-scheme') THEN 'error'
      |       ELSE 'CDC:ErrInvalidServerOption' END AS code,
      |  reason,
      |  CASE WHEN reason = '' THEN adv2 ELSE '' END AS advertise,
      |  CAST(CASE WHEN reason <> '' THEN NULL
      |       WHEN ttl < 5 THEN 10 ELSE ttl END AS BIGINT) AS session_ttl,
      |  CAST(CASE WHEN reason <> '' THEN NULL
      |       WHEN bi = 0 THEN 10 ELSE bi END AS BIGINT) AS batch_interval,
      |  CAST(CASE WHEN reason <> '' THEN NULL
      |       WHEN bs <= 0 THEN 67108864 ELSE bs END AS BIGINT) AS batch_size,
      |  CAST(CASE WHEN reason <> '' THEN NULL
      |       WHEN wp <= 0 THEN 8 ELSE wp END AS BIGINT) AS worker_pool,
      |  CAST(CASE WHEN reason <> '' THEN NULL
      |       WHEN recv = 0 THEN 268435456 ELSE recv END AS BIGINT) AS recv_msg,
      |  CASE WHEN reason <> '' THEN '' ELSE concat_ws(',',
      |    CASE WHEN ttl < 5 THEN 'capture-session-ttl-too-small'
      |         ELSE NULL END,
      |    CASE WHEN usrreq = 1 AND nusers > 0 AND tls = 0
      |         THEN 'client-user-required-without-tls' ELSE NULL END)
      |    END AS warnings
      |FROM ruled""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.ServerOptions
    import graft.streaming.ServerOptions.{Messages, ServerConfig}
    val base = Tables.load(spark, dir, "orders").count()
    val rows = srvCases.map { c =>
      val cfg = ServerConfig(clusterId = c.cid, addr = c.addr,
        advertiseAddr = c.adv, gcTTLSec = c.gcttl, captureSessionTTL = c.ttl,
        clientUserRequired = c.usrreq == 1,
        clientAllowedUser = Seq.fill(c.nusers)("u"), tlsEnabled = c.tls == 1,
        sorterCacheSizeMB = c.sorter, kvRegionScanLimit = c.scan,
        kvRegionRetryDurationMs = c.retry,
        messages = Messages(clientMaxBatchIntervalMs = c.bi,
          clientMaxBatchSize = if (c.bs == -999) -base else c.bs,
          serverAckIntervalMs = c.ack,
          serverWorkerPoolSize = if (c.wp == -999) base % 16 else c.wp,
          maxRecvMsgSize = c.recv),
        dbCompression = c.comp, schedCheckBalanceIntervalMs = c.bal,
        schedAddTableBatchSize = c.abatch, cdcV2Enable = c.v2 == 1,
        cdcV2MetaUri = c.uri)
      ServerOptions.validateAndAdjust(cfg) match {
        case Left((code, msg)) =>
          (c.kase, 0, code, srvReason(code, msg), "", None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long],
            None: Option[Long], "")
        case Right(a) =>
          (c.kase, 1, "", "", a.config.advertiseAddr,
            Some(a.config.captureSessionTTL),
            Some(a.config.messages.clientMaxBatchIntervalMs),
            Some(a.config.messages.clientMaxBatchSize),
            Some(a.config.messages.serverWorkerPoolSize),
            Some(a.config.messages.maxRecvMsgSize),
            a.warnings.mkString(","))
      }
    }
    rows.toDF("kase", "ok", "code", "reason", "advertise", "session_ttl",
      "batch_interval", "batch_size", "worker_pool", "recv_msg", "warnings")
  }

  /** One upgrade-fixup case; quota -999 derives `base`. */
  final case class FixCase(kase: String, creator: String,
      state: String = "normal", admin: Int = 0, err: String = null,
      uri: String = "mysql://h:3306/d", cfgproto: String = null,
      quota: Long = 5, stuck: Option[Long] = Some(60000L),
      schedp: Int = 1, rps: Long = 0)

  val fixCases: Seq[FixCase] = Seq(
    FixCase("st_none_ok", "4.0.15"),
    FixCase("st_err_warn", "4.0.15", err = "CDC:ErrProcessorUnknown"),
    FixCase("st_err_fail", "4.0.15", err = "CDC:ErrStartTsBeforeGC"),
    FixCase("st_resume_warn", "4.0.15", admin = 2,
      err = "CDC:ErrProcessorUnknown"),
    FixCase("st_stop", "4.0.15", admin = 1),
    FixCase("st_finish", "4.0.15", admin = 4),
    FixCase("st_remove", "4.0.15", admin = 3),
    FixCase("st_not_normal", "4.0.15", state = "stopped", admin = 0,
      err = "CDC:ErrProcessorUnknown"),
    FixCase("st_gate_4016", "4.0.16", admin = 1),
    FixCase("st_gate_505", "5.0.5", admin = 1),
    FixCase("st_gate_empty", "", admin = 1),
    FixCase("st_gate_65", "6.5.0", admin = 1),
    FixCase("mq_unknown", "5.3.0",
      uri = "kafka://h:9092/t?protocol=whatever&zz=1&aa=2"),
    FixCase("mq_default", "5.3.0", uri = "kafka://h:9092/t?protocol=default"),
    FixCase("mq_known", "5.3.0", uri = "kafka://h:9092/t?protocol=canal-json",
      cfgproto = "maxwell"),
    FixCase("mq_cfg_weird", "5.3.0", uri = "kafka://h:9092/t",
      cfgproto = "weird"),
    FixCase("mq_gate_off", "5.4.0",
      uri = "kafka://h:9092/t?protocol=whatever"),
    FixCase("mq_cfg_nil", "5.3.0", uri = "kafka://h:9092/t"),
    FixCase("my_strip", "6.1.0", uri = "mysql://h:3306/d?protocol=canal&a=1"),
    FixCase("my_gate_off", "6.1.1", uri = "mysql://h:3306/d?protocol=canal"),
    FixCase("my_cfg_only", "6.1.0", cfgproto = "canal"),
    FixCase("my_clean", "6.1.0"),
    FixCase("quota_fill", "7.0.0", quota = 0),
    FixCase("quota_keep", "7.0.0", quota = -999),
    FixCase("stuck_fill", "7.0.0", stuck = None),
    FixCase("sched_nil", "7.0.0", schedp = 0),
    FixCase("v66_inherit", "6.6.1", rps = 512),
    FixCase("v67_keep", "6.7.0", rps = 512))

  private def fixValues: String = fixCases.map { c =>
    s"(${sqlStr(c.kase)}, ${sqlStr(c.creator)}, ${sqlStr(c.state)}, " +
      s"${c.admin}, ${sqlStr(c.err)}, ${sqlStr(c.uri)}, " +
      s"${sqlStr(c.cfgproto)}, ${c.quota}, " +
      s"${c.stuck.map(_.toString).getOrElse("NULL")}, ${c.schedp}, ${c.rps})"
  }.mkString(",\n")

  /**
   * q256 — changefeed meta upgrade fixups ([[graft.streaming.CreatorFix]],
   * cdc/model/changefeed.go:411-577 + creator_version_gate.go): the
   * state-from-admin-job repair (same-major < 4.0.16 / < 5.0.6, the empty
   * creator counts as oldest), unknown/default MQ protocols rewritten to
   * open-protocol with URI-over-config priority, the protocol parameter
   * stripped from non-MQ sinks (< 6.1.1), v6.6's region-per-span
   * migration, and the unconditional quota/stuck/scheduler fills. URI
   * rewrites re-encode queries with sorted keys (url.Values.Encode); the
   * oracle replays the same surgery with list comprehensions.
   */
  val creatorFix = GateQuery(
    "q256_creator_fix",
    Some(s"""WITH b AS (
      |  SELECT CAST(count(*) AS BIGINT) AS base FROM orders
      |), vals(kase, creator, state, admin, err, uri, cfgproto, quota,
      |        stuck, schedp, rps) AS (VALUES
      |$fixValues
      |), gated AS (
      |  SELECT *,
      |    CASE WHEN creator = '' THEN NULL ELSE
      |      (CAST(split_part(creator, '.', 1) AS BIGINT) * 1000 +
      |       CAST(split_part(creator, '.', 2) AS BIGINT)) * 1000 +
      |       CAST(split_part(creator, '.', 3) AS BIGINT)
      |    END AS ck,
      |    split_part(uri, '://', 1) AS scheme,
      |    split_part(uri, '?', 1) AS ubase,
      |    [p FOR p IN string_split(
      |       CASE WHEN contains(uri, '?') THEN split_part(uri, '?', 2)
      |            ELSE '' END, '&') IF p <> ''] AS params
      |  FROM vals
      |), gates AS (
      |  SELECT *,
      |    (creator = '' OR (ck // 1000000 = 4 AND ck < 4000016)
      |       OR (ck // 1000000 = 5 AND ck < 5000006)) AS g_state,
      |    (creator = '' OR ck < 5004000) AS g_mq,
      |    (creator = '' OR ck < 6001001) AS g_my,
      |    (creator <> '' AND ck // 1000000 = 6
      |       AND (ck // 1000) % 1000 = 6) AS g_v66,
      |    scheme IN ('kafka', 'kafka+ssl', 'pulsar', 'pulsar+ssl',
      |               'pulsar+http', 'pulsar+https') AS is_mq,
      |    [substr(p, 10) FOR p IN params
      |       IF starts_with(p, 'protocol=')] AS uriproto_l
      |  FROM gated
      |), fixed1 AS (
      |  SELECT *,
      |    CASE WHEN NOT g_state OR state <> 'normal' THEN state
      |         WHEN admin IN (0, 2) THEN
      |           CASE WHEN err IS NULL THEN state
      |                WHEN err IN ('CDC:ErrGCTTLExceeded',
      |                  'CDC:ErrSnapshotLostByGC', 'CDC:ErrStartTsBeforeGC')
      |                  THEN 'failed'
      |                ELSE 'warning' END
      |         WHEN admin = 1 THEN 'stopped'
      |         WHEN admin = 4 THEN 'finished'
      |         WHEN admin = 3 THEN 'removed'
      |         ELSE state END AS state2,
      |    CASE WHEN len(uriproto_l) > 0 THEN uriproto_l[1]
      |         ELSE NULL END AS uriproto,
      |    (len(uriproto_l) > 0 AND (uriproto_l[1] = 'default'
      |       OR uriproto_l[1] NOT IN ('default', 'canal', 'avro',
      |         'flat-avro', 'maxwell', 'canal-json', 'craft',
      |         'open-protocol', 'csv', 'debezium', 'simple'))) AS uri_bad,
      |    (coalesce(cfgproto, '') = 'default'
      |       OR coalesce(cfgproto, '') NOT IN ('default', 'canal', 'avro',
      |         'flat-avro', 'maxwell', 'canal-json', 'craft',
      |         'open-protocol', 'csv', 'debezium', 'simple')) AS cfg_bad
      |  FROM gates
      |), fixed2 AS (
      |  SELECT *,
      |    CASE
      |      WHEN g_mq AND is_mq AND uri_bad THEN
      |        ubase || '?' || array_to_string(list_sort(
      |          [CASE WHEN starts_with(p, 'protocol=')
      |                THEN 'protocol=open-protocol' ELSE p END
      |           FOR p IN params]), '&')
      |      WHEN g_my AND NOT is_mq
      |           AND (uriproto IS NOT NULL OR cfgproto IS NOT NULL) THEN
      |        CASE WHEN len([p FOR p IN params
      |                       IF NOT starts_with(p, 'protocol=')]) = 0
      |             THEN ubase
      |             ELSE ubase || '?' || array_to_string(list_sort(
      |               [p FOR p IN params
      |                IF NOT starts_with(p, 'protocol=')]), '&') END
      |      ELSE uri END AS uri2,
      |    CASE
      |      WHEN g_mq AND is_mq AND uri_bad THEN 'open-protocol'
      |      WHEN g_mq AND is_mq AND uriproto IS NULL AND cfg_bad
      |        THEN 'open-protocol'
      |      WHEN g_my AND NOT is_mq
      |           AND (uriproto IS NOT NULL OR cfgproto IS NOT NULL) THEN ''
      |      ELSE cfgproto END AS proto2
      |  FROM fixed1
      |)
      |SELECT kase, state2 AS state, uri2 AS sink_uri, proto2 AS protocol,
      |  CAST(CASE WHEN quota = -999 THEN b.base
      |       WHEN quota = 0 THEN 1073741824 ELSE quota END AS BIGINT)
      |    AS quota,
      |  CAST(coalesce(stuck, 1800000) AS BIGINT) AS stuck_ms,
      |  CAST(CASE WHEN schedp = 0 THEN 0
      |       WHEN g_v66 AND rps <> 0 THEN 1 ELSE 0 END AS INT) AS across,
      |  CAST(CASE WHEN schedp = 0 THEN 100000
      |       WHEN g_v66 AND rps <> 0 THEN rps ELSE 0 END AS BIGINT)
      |    AS threshold,
      |  CAST(CASE WHEN schedp = 0 THEN 0
      |       WHEN g_v66 AND rps <> 0 THEN 0 ELSE rps END AS BIGINT) AS rps
      |FROM fixed2, b""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.CreatorFix
    import graft.streaming.CreatorFix.FeedInfo
    val base = Tables.load(spark, dir, "orders").count()
    val rows = fixCases.map { c =>
      val info = FeedInfo(state = c.state, adminJobType = c.admin,
        errorCode = Option(c.err), creatorVersion = c.creator,
        sinkUri = c.uri, configProtocol = Option(c.cfgproto),
        memoryQuota = if (c.quota == -999) base else c.quota,
        errorStuckMs = c.stuck, schedulerPresent = c.schedp == 1,
        regionPerSpan = c.rps)
      val f = CreatorFix.fixIncompatible(info)
      (c.kase, f.state, f.sinkUri, f.configProtocol,
        if (c.quota == -999) base else f.memoryQuota,
        f.errorStuckMs.get, if (f.enableTableAcrossNodes) 1 else 0,
        f.regionThreshold, f.regionPerSpan)
    }
    rows.toDF("kase", "state", "sink_uri", "protocol", "quota", "stuck_ms",
      "across", "threshold", "rps")
  }

  /** One DDL-repair case: error (errno NULL = invalid connection), the
    * failing statement and its position, and a ≤2-entry downstream index
    * catalog as (name, column count, contains-the-column). */
  final case class RepCase(kase: String, errno: Option[Int], msg: String,
      ddl: String, idx: Int, n: Int, defschema: String = "",
      i1: Option[(String, Int, Int)] = None,
      i2: Option[(String, Int, Int)] = None)

  private val DropColMsg = "cannot drop column c with index covered now"

  val repCases: Seq[RepCase] = Seq(
    RepCase("one_single", Some(8200), DropColMsg,
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2,
      i1 = Some(("idx_c", 1, 1))),
    RepCase("two_single", Some(8200), DropColMsg,
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2,
      i1 = Some(("i1", 1, 1)), i2 = Some(("i2", 1, 1))),
    RepCase("composite_abort", Some(8200), DropColMsg,
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2,
      i1 = Some(("i1", 1, 1)), i2 = Some(("comp", 2, 1))),
    RepCase("none_containing", Some(8200), DropColMsg,
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2,
      i1 = Some(("other", 1, 0))),
    RepCase("msg_no_dropcol", Some(8200),
      "unsupported add column operation",
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2,
      i1 = Some(("idx_c", 1, 1))),
    RepCase("errno_1105", Some(1105),
      "can't drop column c with composite index now",
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2,
      i1 = Some(("idx_c", 1, 1))),
    RepCase("multischema_leg", Some(8200),
      "drop column c with tidb_enable_change_multi_schema is disable",
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2,
      i1 = Some(("idx_c", 1, 1))),
    RepCase("wrong_errno", Some(1050), DropColMsg,
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2,
      i1 = Some(("idx_c", 1, 1))),
    RepCase("not_alter", Some(8200), DropColMsg,
      "CREATE TABLE `t` (x INT)", 1, 2, i1 = Some(("idx_c", 1, 1))),
    RepCase("multi_spec", Some(8200), DropColMsg,
      "ALTER TABLE `db`.`t` DROP COLUMN `c`, ADD COLUMN `d` INT", 1, 2,
      i1 = Some(("idx_c", 1, 1))),
    RepCase("conn_addindex_last", None, "",
      "ALTER TABLE `db`.`t` ADD INDEX `i` (`c`)", 1, 2),
    RepCase("conn_addkey", None, "",
      "ALTER TABLE `db`.`t` ADD KEY `i` (`c`)", 1, 2),
    RepCase("conn_addunique", None, "",
      "ALTER TABLE `db`.`t` ADD UNIQUE KEY `u` (`c`)", 1, 2),
    RepCase("conn_create_index", None, "",
      "CREATE INDEX `i` ON `t` (`c`)", 1, 2),
    RepCase("conn_create_unique", None, "",
      "CREATE UNIQUE INDEX `u` ON `t` (`c`)", 1, 2),
    RepCase("conn_not_last", None, "",
      "ALTER TABLE `db`.`t` ADD INDEX `i` (`c`)", 0, 2),
    RepCase("conn_foreign", None, "",
      "ALTER TABLE `db`.`t` ADD FOREIGN KEY (`c`) REFERENCES `p` (`id`)",
      1, 2),
    RepCase("conn_primary", None, "",
      "ALTER TABLE `db`.`t` ADD PRIMARY KEY (`c`)", 1, 2),
    RepCase("default_schema", Some(8200), DropColMsg,
      "ALTER TABLE t2 DROP COLUMN c", 1, 2, defschema = "dd",
      i1 = Some(("ix", 1, 1))),
    RepCase("conn_dropcol", None, "",
      "ALTER TABLE `db`.`t` DROP COLUMN `c`", 1, 2))

  private def repValues: String = repCases.map { c =>
    def ix(o: Option[(String, Int, Int)]) = o match {
      case Some((n, k, h)) => s"${sqlStr(n)}, $k, $h"
      case None => "NULL, NULL, NULL"
    }
    s"(${sqlStr(c.kase)}, ${c.errno.map(_.toString).getOrElse("NULL")}, " +
      s"${sqlStr(c.msg)}, ${sqlStr(c.ddl)}, ${c.idx}, ${c.n}, " +
      s"${sqlStr(c.defschema)}, ${ix(c.i1)}, ${ix(c.i2)})"
  }.mkString(",\n")

  /**
   * q257 — DM's special DDL-error repair ([[graft.streaming.DdlRepair]],
   * dm/syncer/error.go:43-216): the add-index timeout swallow (last
   * statement only; plain INDEX/KEY and ANY CREATE INDEX — unique/
   * foreign/primary ADDs propagate, but CREATE UNIQUE INDEX is swallowed,
   * the Go's CreateIndexStmt arm skips the uniqueness check) and the
   * drop-column-with-index repair (errno 8200/1105 with the three message
   * legs; all containing indexes single-column → emit the DROP INDEX
   * prequel and retry from the failing statement, an empty containing
   * set still retries; any composite index aborts). Oracle replays the
   * statement classification with regexes and assembles the same
   * backquoted DROP INDEX strings.
   */
  val ddlRepair = GateQuery(
    "q257_ddl_repair",
    Some(s"""WITH vals(kase, errno, msg, ddl, idx, n, defschema,
      |  i1name, i1n, i1has, i2name, i2n, i2has) AS (VALUES
      |$repValues
      |), parsed AS (
      |  SELECT *,
      |    regexp_matches(ddl,
      |      '(?is)^\\s*ALTER\\s+TABLE\\s+(`[^`]+`|\\w+)(\\.(`[^`]+`|\\w+))?\\s+')
      |      AS is_alter,
      |    regexp_matches(ddl, '(?is)^\\s*CREATE\\s+(UNIQUE\\s+)?INDEX\\b')
      |      AS is_createindex,
      |    trim(regexp_extract(ddl,
      |      '(?is)^\\s*ALTER\\s+TABLE\\s+(?:`([^`]+)`|(\\w+))(?:\\.(?:`([^`]+)`|(\\w+)))?\\s+(.*)$$',
      |      5)) AS body,
      |    regexp_extract(ddl,
      |      '(?is)^\\s*ALTER\\s+TABLE\\s+(?:`([^`]+)`|(\\w+))(?:\\.(?:`([^`]+)`|(\\w+)))?\\s+',
      |      1) AS q1a,
      |    regexp_extract(ddl,
      |      '(?is)^\\s*ALTER\\s+TABLE\\s+(?:`([^`]+)`|(\\w+))(?:\\.(?:`([^`]+)`|(\\w+)))?\\s+',
      |      2) AS q1b,
      |    regexp_extract(ddl,
      |      '(?is)^\\s*ALTER\\s+TABLE\\s+(?:`([^`]+)`|(\\w+))(?:\\.(?:`([^`]+)`|(\\w+)))?\\s+',
      |      3) AS q2a,
      |    regexp_extract(ddl,
      |      '(?is)^\\s*ALTER\\s+TABLE\\s+(?:`([^`]+)`|(\\w+))(?:\\.(?:`([^`]+)`|(\\w+)))?\\s+',
      |      4) AS q2b
      |  FROM vals
      |), shaped AS (
      |  SELECT *,
      |    CASE WHEN NOT is_alter THEN NULL
      |         WHEN q2a <> '' OR q2b <> '' THEN
      |           CASE WHEN q1a <> '' THEN q1a ELSE q1b END
      |         ELSE defschema END AS sch,
      |    CASE WHEN NOT is_alter THEN NULL
      |         WHEN q2a <> '' OR q2b <> '' THEN
      |           CASE WHEN q2a <> '' THEN q2a ELSE q2b END
      |         ELSE CASE WHEN q1a <> '' THEN q1a ELSE q1b END END AS tbl,
      |    is_alter AND contains(body, ',') AS multi_spec,
      |    is_alter AND NOT contains(body, ',')
      |      AND regexp_matches(body, '(?is)^DROP\\s+COLUMN\\s+')
      |      AS is_dropcol,
      |    lower(regexp_extract(body,
      |      '(?is)^ADD\\s+(UNIQUE|FOREIGN\\s+KEY|PRIMARY\\s+KEY|INDEX|KEY)\\b',
      |      1)) AS addkind,
      |    errno IS NULL AS is_conn,
      |    coalesce(errno IN (8200, 1105), FALSE)
      |      AND contains(msg, 'drop column')
      |      AND (contains(msg, 'with index')
      |        OR contains(msg, 'with composite index')
      |        OR contains(msg, 'with tidb_enable_change_multi_schema is disable'))
      |      AS is_dropcol_err
      |  FROM parsed
      |), decided AS (
      |  SELECT *,
      |    CASE
      |      WHEN is_conn AND idx = n - 1 AND (is_createindex
      |        OR (is_alter AND NOT multi_spec
      |            AND addkind IN ('index', 'key'))) THEN 'ignore'
      |      WHEN is_dropcol_err AND is_dropcol AND NOT multi_spec AND (
      |        (i1has IS NULL OR i1has = 0 OR i1n = 1) AND
      |        (i2has IS NULL OR i2has = 0 OR i2n = 1)) THEN 'predrop'
      |      ELSE 'propagate' END AS action
      |  FROM shaped
      |)
      |SELECT kase, action,
      |  CASE WHEN action = 'predrop' THEN concat_ws(';',
      |    CASE WHEN i1has = 1 THEN 'ALTER TABLE `' || sch || '`.`' || tbl
      |      || '` DROP INDEX `' || i1name || '`' ELSE NULL END,
      |    CASE WHEN i2has = 1 THEN 'ALTER TABLE `' || sch || '`.`' || tbl
      |      || '` DROP INDEX `' || i2name || '`' ELSE NULL END)
      |    ELSE '' END AS drops,
      |  CAST(CASE WHEN action = 'predrop' THEN idx ELSE NULL END AS INT)
      |    AS retry_from
      |FROM decided""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.DdlRepair
    import graft.streaming.DdlRepair._
    val rows = repCases.map { c =>
      val err: DdlError = c.errno match {
        case Some(n) => MySqlErr(n, c.msg)
        case None => InvalidConn
      }
      val ddls = Seq.tabulate(c.n)(i =>
        if (i == c.idx) c.ddl else "ALTER TABLE `db`.`t` ADD COLUMN `z` INT")
      val cat: Map[(String, String), Seq[IndexInfo]] = {
        val entries = Seq(c.i1, c.i2).flatten.map { case (nm, k, h) =>
          IndexInfo(nm, if (h == 1) "c" +: Seq.fill(k - 1)("z")
            else Seq.fill(k)("z"))
        }
        if (entries.isEmpty) Map.empty
        else {
          // key under the statement's qualified table
          DdlRepair.parse(c.ddl, c.defschema) match {
            case AlterDropColumn(s, t, _) => Map((s, t) -> entries)
            case _ => Map(("db", "t") -> entries)
          }
        }
      }
      DdlRepair.handle(err, ddls, c.idx, cat, c.defschema) match {
        case Propagate => (c.kase, "propagate", "", None: Option[Int])
        case Ignore => (c.kase, "ignore", "", None: Option[Int])
        case PreDropIndexes(sqls, from) =>
          (c.kase, "predrop", sqls.mkString(";"), Some(from))
      }
    }
    rows.toDF("kase", "action", "drops", "retry_from")
  }

  /** One where-handle case: a column universe with schema facts, an
    * ordered index list, and rows described by their null columns. */
  final case class WhCase(kase: String,
      cols: Seq[(String, Int, Int, Int)], // (name, insrc, hidden, tgtnn)
      idxs: Seq[(String, String, Int, Int)], // (name, cols, primary, public)
      pkHandle: Option[String],
      rows: Seq[(Int, String)]) // (rowid, comma-joined null cols)

  val whCases: Seq[WhCase] = Seq(
    // a PRIMARY found AFTER a unique-not-null index still wins (the Go
    // overwrites unconditionally: "PK is prior to UNIQUE NOT NULL")
    WhCase("pk_wins", Seq(("a", 1, 0, 1), ("b", 1, 0, 1)),
      Seq(("uk_b", "b", 0, 1), ("pk", "a", 1, 1)), None, Seq((1, ""))),
    WhCase("uk_notnull", Seq(("a", 1, 0, 0), ("b", 1, 0, 1)),
      Seq(("uk_b", "b", 0, 1)), None, Seq((1, "a"))),
    // nullable uniques: row1's hit is swapped to the FRONT, so row2
    // (where both are usable) picks uk_c, not uk_b
    WhCase("swap", Seq(("a", 1, 0, 0), ("b", 1, 0, 0), ("c", 1, 0, 0)),
      Seq(("uk_b", "b", 0, 1), ("uk_c", "c", 0, 1)), None,
      Seq((1, "b"), (2, ""))),
    // no index usable for this row: full visible image, NULL-safe IS ?
    WhCase("fallback", Seq(("a", 1, 0, 0), ("b", 1, 0, 0)),
      Seq(("uk_b", "b", 0, 1)), None, Seq((1, "b"))),
    // an index referencing a column the SOURCE lacks is dropped entirely
    WhCase("missing", Seq(("a", 1, 0, 0), ("b", 1, 0, 1), ("d", 0, 0, 0)),
      Seq(("uk_d", "d", 0, 1), ("uk_b", "b", 0, 1)), None, Seq((1, ""))),
    // hidden source column: causality-only, never WHERE; the fallback
    // image also excludes it
    WhCase("hidden", Seq(("a", 1, 0, 0), ("b", 1, 0, 0), ("c", 1, 1, 0)),
      Seq(("uk_c", "c", 0, 1), ("uk_b", "b", 0, 1)), None, Seq((1, ""))),
    WhCase("nonpublic", Seq(("a", 1, 0, 0), ("b", 1, 0, 0)),
      Seq(("uk_b", "b", 0, 0)), None, Seq((1, ""))),
    // PK-is-handle synthesizes the PRIMARY index
    WhCase("pkhandle", Seq(("a", 1, 0, 1), ("b", 1, 0, 0)),
      Seq(), Some("a"), Seq((1, ""))),
    WhCase("composite", Seq(("a", 1, 0, 0), ("b", 1, 0, 1), ("c", 1, 0, 1)),
      Seq(("uk_bc", "b,c", 0, 1)), None, Seq((1, "a"))))

  private def whValues: String = {
    val colRows = whCases.flatMap(c => c.cols.zipWithIndex.map {
      case ((n, i, h, t), cpos) =>
        s"(${sqlStr(c.kase)}, $cpos, ${sqlStr(n)}, $i, $h, $t)"
    }).mkString(",\n")
    val idxRows = whCases.flatMap { c =>
      val synth = c.pkHandle.map(pk => ("PRIMARY", pk, 1, 1))
      (c.idxs ++ synth).zipWithIndex.map { case ((n, cols, p, pub), pos) =>
        s"(${sqlStr(c.kase)}, $pos, ${sqlStr(n)}, ${sqlStr(cols)}, $p, $pub)"
      }
    }.mkString(",\n")
    val rowRows = whCases.flatMap(c => c.rows.map { case (rid, nulls) =>
      s"(${sqlStr(c.kase)}, $rid, ${sqlStr(nulls)})"
    }).mkString(",\n")
    s"""wcols(kase, cpos, col, insrc, hidden, tgtnn) AS (VALUES
       |$colRows
       |), widx(kase, pos, name, cols, prim, pub) AS (VALUES
       |$idxRows
       |), wrows(kase, rowid, nullcols) AS (VALUES
       |$rowRows
       |)""".stripMargin
  }

  /**
   * q258 — DM's WHERE-key selection ([[graft.operators.WhereHandle]],
   * pkg/sqlmodel/where_handle.go + row_change.go:291-340): unique PUBLIC
   * target indexes rewritten into the source (missing column drops the
   * index; hidden column demotes it to causality-only), the PRIMARY
   * unconditionally overwriting an earlier unique-not-null preference,
   * the per-row first-all-non-null fallback with its swap-to-front
   * last-used cache (pinned by a two-row scenario), the synthesized
   * PK-is-handle index, and the full visible-image fallback rendered
   * with the NULL-safe `IS ?` form. The oracle re-derives index
   * usability from the column facts and replays the selection order,
   * cache swap, and clause rendering in SQL.
   */
  val whereHandle = GateQuery(
    "q258_where_handle",
    Some(s"""WITH $whValues, iexp AS (
      |  SELECT kase, pos, name, cols, prim, pub,
      |    unnest(string_split(cols, ',')) AS col
      |  FROM widx
      |), iflags AS (
      |  SELECT e.kase, e.pos, e.name, e.cols, e.prim, e.pub,
      |    bool_and(c.insrc = 1) AS insrc,
      |    bool_or(c.insrc = 1 AND c.hidden = 1) AS hashid,
      |    bool_and(c.tgtnn = 1) AS allnn
      |  FROM iexp e
      |  JOIN wcols c ON c.kase = e.kase AND c.col = e.col
      |  GROUP BY e.kase, e.pos, e.name, e.cols, e.prim, e.pub
      |), usable AS (
      |  SELECT *, pub = 1 AND insrc AND NOT hashid AS use_where,
      |    pub = 1 AND insrc AS use_caus
      |  FROM iflags
      |), counts AS (
      |  SELECT kase,
      |    coalesce(sum(CASE WHEN use_where THEN 1 ELSE 0 END), 0) AS n_unique,
      |    coalesce(sum(CASE WHEN use_caus THEN 1 ELSE 0 END), 0)
      |      AS n_causality
      |  FROM usable GROUP BY kase
      |), pref AS (
      |  SELECT kase,
      |    coalesce(
      |      arg_min(name, pos) FILTER (WHERE use_where AND prim = 1),
      |      arg_min(name, pos) FILTER (WHERE use_where AND prim = 0
      |                                 AND allnn)) AS pname
      |  FROM usable GROUP BY kase
      |), rowidx AS (
      |  SELECT r.kase, r.rowid, u.pos, u.name, u.cols,
      |    NOT list_has_any(string_split(u.cols, ','),
      |                     string_split(r.nullcols, ',')) AS nonnull
      |  FROM wrows r JOIN usable u ON u.kase = r.kase AND u.use_where
      |), row1pick AS (
      |  SELECT kase, arg_min(name, pos)
      |      FILTER (WHERE nonnull AND rowid = 1) AS d1
      |  FROM rowidx GROUP BY kase
      |), datapick AS (
      |  SELECT x.kase, x.rowid,
      |    arg_min(x.name, CASE WHEN x.rowid > 1 AND x.name = rp.d1
      |                         THEN -1 ELSE x.pos END)
      |      FILTER (WHERE x.nonnull) AS dname
      |  FROM rowidx x LEFT JOIN row1pick rp ON rp.kase = x.kase
      |  GROUP BY x.kase, x.rowid
      |), chosen AS (
      |  SELECT r.kase, r.rowid,
      |    coalesce(p.pname, d.dname) AS idx_name
      |  FROM wrows r JOIN pref p ON p.kase = r.kase
      |  LEFT JOIN datapick d ON d.kase = r.kase AND d.rowid = r.rowid
      |), idxcols AS (
      |  SELECT kase, name, col,
      |    list_position(string_split(cols, ','), col) AS ord
      |  FROM iexp
      |), pickcols AS (
      |  SELECT c.kase, c.rowid, c.idx_name AS chosen, x.col, x.ord
      |  FROM chosen c JOIN idxcols x
      |    ON x.kase = c.kase AND x.name = c.idx_name
      |  UNION ALL
      |  SELECT c.kase, c.rowid, 'full', w.col, w.cpos
      |  FROM chosen c JOIN wcols w
      |    ON w.kase = c.kase AND w.insrc = 1 AND w.hidden = 0
      |  WHERE c.idx_name IS NULL
      |), rendered AS (
      |  SELECT p.kase, p.rowid, p.chosen,
      |    string_agg(
      |      CASE WHEN list_contains(string_split(r.nullcols, ','), p.col)
      |           THEN '`' || p.col || '` IS ?'
      |           ELSE '`' || p.col || '` = ?' END,
      |      ' AND ' ORDER BY p.ord) AS clause
      |  FROM pickcols p JOIN wrows r
      |    ON r.kase = p.kase AND r.rowid = p.rowid
      |  GROUP BY p.kase, p.rowid, p.chosen
      |)
      |SELECT x.kase, x.rowid, x.chosen, x.clause,
      |  CAST(n.n_unique AS INT) AS n_unique,
      |  CAST(n.n_causality AS INT) AS n_causality
      |FROM rendered x JOIN counts n ON n.kase = x.kase""".stripMargin)) {
    (spark, dir) =>
    import spark.implicits._
    import graft.operators.WhereHandle
    import graft.operators.WhereHandle.{Col, Idx, Table}
    val rows = whCases.flatMap { c =>
      val srcCols = c.cols.collect { case (n, 1, h, _) =>
        Col(n, hidden = h == 1) }
      val tgtCols = c.cols.map { case (n, _, _, t) => Col(n, notNull = t == 1) }
      val idxs = c.idxs.map { case (n, cols, p, pub) =>
        Idx(n, cols.split(',').toSeq, primary = p == 1, public = pub == 1) }
      val src = Table(srcCols)
      val tgt = Table(tgtCols, idxs, c.pkHandle)
      val h = WhereHandle.build(src, tgt)
      c.rows.map { case (rid, nulls) =>
        val nullSet = nulls.split(',').filter(_.nonEmpty).toSet
        val row: Map[String, Any] = srcCols.map(col =>
          col.name -> (if (nullSet.contains(col.name)) null
            else col.name: Any)).toMap
        val idx = WhereHandle.whereIdx(h, row)
        val (clause, _) = WhereHandle.genWhere(h, row)
        (c.kase, rid, idx.map(_.name).getOrElse("full"), clause,
          h.uniqueIdxs.size + h.uniqueNotNullIdx.count(u =>
            !h.uniqueIdxs.contains(u)), h.causalityIdxs.size)
      }
    }
    rows.toDF("kase", "rowid", "chosen", "clause", "n_unique", "n_causality")
  }

  val rmCases: Seq[(String, String, String)] = Seq(
    // (kase, sink uri, protocol or "")
    ("kafka_avro", "kafka://h:9092/t", "avro"),
    ("kafka_canal", "kafka://h:9092/t", "canal-json"),
    ("kafka_noproto", "kafka://h:9092/t", ""),
    ("pulsar_ssl", "pulsar+ssl://h:6650/t", "canal-json"),
    ("mysql", "mysql://u@h:3306/d", ""),
    ("tidb_ssl", "tidb+ssl://u@h:4000/d", ""),
    ("s3", "s3://bucket/prefix", "csv"),
    ("file", "file:///data/cdc", "canal-json"),
    ("azure", "azure://container/p", "csv"),
    ("noop", "noop://", "csv"),
    ("blackhole", "blackhole://", "avro"),
    ("unparsable", "not a uri", "avro"))

  /**
   * q259 — scheme-scoped config scrubbing
   * ([[graft.streaming.CreatorFix.rmUnusedFields]],
   * cdc/model/changefeed.go:343-409 RmUnusedFields): the stored config
   * keeps only the fields its sink scheme can use — MQ-only /
   * storage-only / DB-only groups, the MQ schema-registry kept only under
   * avro, protocol+terminator shed on MySQL-compatible sinks, and the
   * blackhole / unparsable-URI keep-everything legs. The oracle replays
   * the retention predicate over the same (field, group) table.
   */
  val rmUnused = GateQuery(
    "q259_rm_unused_fields",
    Some(s"""WITH fields(field, grp) AS (VALUES
      |  ('dispatch_rules', 'mq'), ('schema_registry', 'mq'),
      |  ('encoder_concurrency', 'mq'), ('enable_kafka_sink_v2', 'mq'),
      |  ('only_output_updated_columns', 'mq'),
      |  ('delete_only_output_handle_key_columns', 'mq'),
      |  ('content_compatible', 'mq'), ('kafka_config', 'mq'),
      |  ('csv_config', 'st'), ('date_separator', 'st'),
      |  ('enable_partition_separator', 'st'), ('file_index_width', 'st'),
      |  ('cloud_storage_config', 'st'),
      |  ('enable_sync_point', 'db'), ('bdr_mode', 'db'),
      |  ('sync_point_interval', 'db'), ('sync_point_retention', 'db'),
      |  ('consistent', 'db'), ('safe_mode', 'db'), ('mysql_config', 'db'),
      |  ('protocol', 'gen'), ('terminator', 'gen')
      |), cases(kase, uri, proto) AS (VALUES
      |${rmCases.map { case (k, u, p) =>
          s"  (${sqlStr(k)}, ${sqlStr(u)}, ${sqlStr(p)})" }.mkString(",\n")}
      |), shaped AS (
      |  SELECT kase, proto,
      |    NOT contains(uri, '://') AS unparsable,
      |    split_part(uri, '://', 1) AS sch
      |  FROM cases
      |), flags AS (
      |  SELECT *,
      |    sch IN ('kafka', 'kafka+ssl', 'pulsar', 'pulsar+ssl',
      |            'pulsar+http', 'pulsar+https') AS is_mq,
      |    sch IN ('file', 's3', 'gcs', 'gs', 'azblob', 'azure', 'noop')
      |      AS is_st,
      |    sch IN ('mysql', 'mysql+ssl', 'tidb', 'tidb+ssl') AS is_db,
      |    sch = 'blackhole' AS is_bh
      |  FROM shaped
      |)
      |SELECT c.kase,
      |  string_agg(f.field, ',' ORDER BY f.field)
      |    FILTER (WHERE c.unparsable OR c.is_bh OR CASE f.grp
      |      WHEN 'mq' THEN c.is_mq AND
      |        (f.field <> 'schema_registry' OR c.proto = 'avro')
      |      WHEN 'st' THEN c.is_st
      |      WHEN 'db' THEN c.is_db
      |      ELSE NOT c.is_db END) AS retained
      |FROM flags c, fields f
      |GROUP BY c.kase""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.CreatorFix
    val universe = CreatorFix.MqOnlyFields ++ CreatorFix.StorageOnlyFields ++
      CreatorFix.DbOnlyFields ++ Set("protocol", "terminator")
    val rows = rmCases.map { case (kase, uri, proto) =>
      val kept = CreatorFix.rmUnusedFields(uri,
        Some(proto).filter(_.nonEmpty), universe)
      (kase, kept.toSeq.sorted.mkString(","))
    }
    rows.toDF("kase", "retained")
  }

  /**
   * q260 — DDL / checkpoint dispatch to MQ partitions
   * ([[graft.streaming.DdlDispatch]], cdc/sink/ddlsink/mq/mq_ddl_sink.go
   * + event_router.go:97-185): canal-family DDLs land on PARTITION 0 of
   * their routed topic while every other protocol broadcasts to all
   * partitions; schema-level DDLs go to the default topic; checkpoint
   * events broadcast to every partition of every ACTIVE topic (dedup over
   * the live table set). Tables come from the real CDC stream; topics
   * route through the REAL `{schema}`/`{table}` substitution; per-topic
   * partition counts derive from the topic name so the fan-out is
   * data-anchored end to end.
   */
  val ddlDispatch = GateQuery(
    "q260_ddl_dispatch",
    Some(graft.core.CdcStream.sqlCte + """, tabs AS (
      |  SELECT DISTINCT schema_name, table_name FROM cdc
      |), topics AS (
      |  SELECT schema_name, table_name,
      |    CASE WHEN schema_name = 'db_0'
      |         THEN 'pre_' || schema_name || '_' || table_name
      |         ELSE 'shared' END AS topic
      |  FROM tabs
      |), pns AS (
      |  SELECT *, coalesce(TRY_CAST(right(topic, 1) AS INT) % 3 + 1,
      |    CAST(length(topic) % 4 + 1 AS INT)) AS pn
      |  FROM topics
      |), protos(proto) AS (VALUES ('canal-json'), ('open-protocol')),
      |tddl AS (
      |  SELECT p.proto, 'table' AS kind, t.schema_name, t.table_name,
      |    t.topic,
      |    CAST(unnest(CASE WHEN p.proto = 'canal-json' THEN [0]
      |         ELSE range(0, t.pn) END) AS INT) AS partition
      |  FROM pns t, protos p
      |), sddl AS (
      |  SELECT p.proto, 'schema' AS kind, s.schema_name, '' AS table_name,
      |    'shared' AS topic,
      |    CAST(unnest(CASE WHEN p.proto = 'canal-json' THEN [0]
      |         ELSE range(0, CAST(length('shared') % 4 + 1 AS INT)) END)
      |      AS INT) AS partition
      |  FROM (SELECT DISTINCT schema_name FROM cdc) s, protos p
      |), ckpt AS (
      |  SELECT '-' AS proto, 'ckpt' AS kind, '' AS schema_name,
      |    '' AS table_name, topic,
      |    CAST(unnest(range(0, pn)) AS INT) AS partition
      |  FROM (SELECT DISTINCT topic, pn FROM pns)
      |)
      |SELECT * FROM tddl UNION ALL SELECT * FROM sddl
      |UNION ALL SELECT * FROM ckpt""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.functions._
    import graft.core.CdcStream
    import graft.operators.Routing
    val tabs = CdcStream.derive(spark, dir)
      .select("schema_name", "table_name").distinct()
    val withTopic = tabs.withColumn("topic",
      when(col("schema_name") === "db_0",
        Routing.topicFromExpression("pre_{schema}_{table}",
          col("schema_name"), col("table_name")))
        .otherwise(lit("shared")))
      .withColumn("pn", coalesce(
        expr("try_cast(substring(topic, -1, 1) AS INT)") % 3 + 1,
        length(col("topic")) % 4 + 1).cast("int"))
    def fanOut(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("partition", explode(when(col("proto") === "canal-json",
        array(lit(0)))
        .otherwise(sequence(lit(0), col("pn") - 1))))
      .withColumn("partition", col("partition").cast("int"))
    import spark.implicits._
    val protos = Seq("canal-json", "open-protocol").toDF("proto")
    val tddl = fanOut(withTopic.crossJoin(protos)
      .withColumn("kind", lit("table")))
      .select("proto", "kind", "schema_name", "table_name", "topic",
        "partition")
    val sddl = fanOut(CdcStream.derive(spark, dir).select("schema_name")
      .distinct()
      .withColumn("table_name", lit(""))
      .withColumn("topic", lit("shared"))
      .withColumn("pn", (length(col("topic")) % 4 + 1).cast("int"))
      .crossJoin(protos).withColumn("kind", lit("schema")))
      .select("proto", "kind", "schema_name", "table_name", "topic",
        "partition")
    val ckpt = withTopic.select("topic", "pn").distinct()
      .withColumn("proto", lit("-")).withColumn("kind", lit("ckpt"))
      .withColumn("schema_name", lit("")).withColumn("table_name", lit(""))
      .withColumn("partition", explode(sequence(lit(0), col("pn") - 1)))
      .withColumn("partition", col("partition").cast("int"))
      .select("proto", "kind", "schema_name", "table_name", "topic",
        "partition")
    tddl.union(sddl).union(ckpt)
  }

  /** One binlog-position case. */
  final case class BpCase(part: String, kase: String, s1: String = "",
      s2: String = "", p1: Long = 0, p2: Long = 0,
      uuids: Seq[String] = Nil)

  val bpCases: Seq[BpCase] = Seq(
    BpCase("parse", "ok", s1 = "mysql-bin.000001:2345"),
    BpCase("parse", "nocolon", s1 = "mysql-bin.000001"),
    BpCase("parse", "badpos", s1 = "mysql-bin.000001:x"),
    BpCase("parse", "overflow", s1 = "mysql-bin.000001:4294967296"),
    BpCase("parse", "twocolons", s1 = "a:1:2"),
    BpCase("real", "plain", s1 = "mysql-bin.000003"),
    BpCase("real", "suffixed", s1 = "mysql-bin|000002.000003"),
    BpCase("real", "badsuffix", s1 = "mysql-bin|00x.000003"),
    BpCase("real", "sep_at_zero", s1 = "|000002.000003"),
    BpCase("real", "empty_suffix", s1 = "mysql-bin|.000003"),
    BpCase("real", "noparse", s1 = "bad"),
    BpCase("real", "zero_suffix", s1 = "mysql-bin|0.000003"),
    BpCase("sfx", "empty", s1 = ""),
    BpCase("sfx", "suffixed", s1 = "mysql-bin|000005.000001"),
    BpCase("sfx", "plain", s1 = "mysql-bin.000001"),
    BpCase("sfx", "badname", s1 = "bad"),
    BpCase("sfx", "negative", s1 = "mysql-bin|-0005.000001"),
    BpCase("cmp", "seq_order", s1 = "mysql-bin.000009", p1 = 10,
      s2 = "mysql-bin.000010", p2 = 5),
    BpCase("cmp", "lexical_quirk", s1 = "mysql-bin.999999", p1 = 0,
      s2 = "mysql-bin.1000000", p2 = 0),
    BpCase("cmp", "suffix_equals_plain", s1 = "mysql-bin|000002.000003",
      p1 = 100, s2 = "mysql-bin.000003", p2 = 100),
    BpCase("cmp", "both_suffixed_raw", s1 = "mysql-bin|000002.000003",
      p1 = 0, s2 = "mysql-bin|000010.000002", p2 = 0),
    BpCase("cmp", "pos_tiebreak", s1 = "mysql-bin.000003", p1 = 5,
      s2 = "mysql-bin.000003", p2 = 9),
    BpCase("xpos", "match", s1 = "mysql-bin|000002.000007", p1 = 42,
      uuids = Seq("u1.000001", "u2.000002")),
    BpCase("xpos", "nomatch", s1 = "mysql-bin|000009.000007",
      uuids = Seq("u1.000001", "u2.000002")),
    BpCase("xpos", "plain_latest", s1 = "mysql-bin.000007", p1 = 7,
      uuids = Seq("u1.000001", "u2.000002")),
    BpCase("xpos", "empty_uuids", s1 = "mysql-bin.000007"),
    BpCase("xpos", "bad_latest", s1 = "mysql-bin.000007",
      uuids = Seq("u3")))

  private def bpValues: String = bpCases.map { c =>
    val us = (c.uuids ++ Seq("", "", "")).take(3)
    s"(${sqlStr(c.part)}, ${sqlStr(c.kase)}, ${sqlStr(c.s1)}, " +
      s"${sqlStr(c.s2)}, ${c.p1}, ${c.p2}, ${sqlStr(us(0))}, " +
      s"${sqlStr(us(1))}, ${sqlStr(us(2))}, ${c.uuids.size})"
  }.mkString(",\n")

  /**
   * q261 — DM's binlog position algebra ([[graft.streaming.BinlogPos]],
   * dm/pkg/binlog/position.go + utils/filename.go, relay.go): the
   * `base.seq` filename grammar, the relay-subdir `|suffix` encoding and
   * its strip rules (separator not at index 0, non-empty POSITIVE
   * suffix), ExtractSuffix's minimum-1 and sign-tolerant legs, ExtractPos
   * against the relay-dir list (match / not-found / latest-adopts /
   * empty / bad-latest), PositionFromStr's uint32 bound, and
   * ComparePosition — including the both-suffixed RAW comparison and the
   * go-mysql lexical name ordering the zero-padding normally hides.
   * Oracle = the same string rules in SQL.
   */
  val binlogPos = GateQuery(
    "q261_binlog_pos",
    Some(s"""WITH vals(part, kase, s1, s2, p1, p2, u1, u2, u3, nu)
      |  AS (VALUES
      |$bpValues
      |), fn AS (
      |  SELECT *,
      |    len(string_split(s1, '.')) = 2
      |      AND coalesce(TRY_CAST(split_part(s1, '.', 2) AS BIGINT), 0) > 0
      |      AND NOT contains(split_part(s1, '.', 2), '+')
      |      AND NOT contains(split_part(s1, '.', 2), '-') AS v1,
      |    split_part(s1, '.', 1) AS b1, split_part(s1, '.', 2) AS q1,
      |    len(string_split(s2, '.')) = 2
      |      AND coalesce(TRY_CAST(split_part(s2, '.', 2) AS BIGINT), 0) > 0
      |      AND NOT contains(split_part(s2, '.', 2), '+')
      |      AND NOT contains(split_part(s2, '.', 2), '-') AS v2,
      |    split_part(s2, '.', 1) AS b2, split_part(s2, '.', 2) AS q2
      |  FROM vals
      |), sfxed AS (
      |  SELECT *,
      |    regexp_extract(b1, '^(.+)\\|([^|]*)$$', 1) AS rb1,
      |    regexp_extract(b1, '^(.+)\\|([^|]*)$$', 2) AS sx1,
      |    regexp_extract(b2, '^(.+)\\|([^|]*)$$', 1) AS rb2,
      |    regexp_extract(b2, '^(.+)\\|([^|]*)$$', 2) AS sx2
      |  FROM fn
      |), adj AS (
      |  SELECT *,
      |    v1 AND sx1 <> ''
      |      AND NOT contains(sx1, '+') AND NOT contains(sx1, '-')
      |      AND coalesce(TRY_CAST(sx1 AS BIGINT), 0) > 0 AS strip1,
      |    v2 AND sx2 <> ''
      |      AND NOT contains(sx2, '+') AND NOT contains(sx2, '-')
      |      AND coalesce(TRY_CAST(sx2 AS BIGINT), 0) > 0 AS strip2
      |  FROM sfxed
      |), adj2 AS (
      |  SELECT *,
      |    CASE WHEN strip1 THEN rb1 || '.' || q1 ELSE s1 END AS a1,
      |    CASE WHEN strip2 THEN rb2 || '.' || q2 ELSE s2 END AS a2
      |  FROM adj
      |), outp AS (
      |  SELECT part, kase,
      |    CASE part
      |      WHEN 'parse' THEN
      |        CASE WHEN len(string_split(s1, ':')) = 2
      |          AND regexp_full_match(split_part(s1, ':', 2), '[0-9]+')
      |          AND TRY_CAST(split_part(s1, ':', 2) AS BIGINT) <= 4294967295
      |          THEN 1 ELSE 0 END
      |      WHEN 'real' THEN CASE WHEN v1 THEN 1 ELSE 0 END
      |      WHEN 'sfx' THEN
      |        CASE WHEN s1 = '' THEN 1
      |          WHEN NOT v1 THEN 0
      |          WHEN sx1 <> '' AND TRY_CAST(sx1 AS BIGINT) IS NULL THEN 0
      |          ELSE 1 END
      |      WHEN 'cmp' THEN 1
      |      WHEN 'xpos' THEN
      |        CASE WHEN nu = 0 THEN 0
      |          WHEN strip1 AND ((sx1 = split_part(u1, '.', 2) AND u1 <> '')
      |            OR (sx1 = split_part(u2, '.', 2) AND u2 <> '')) THEN 1
      |          WHEN strip1 THEN 0
      |          WHEN sx1 <> '' AND NOT strip1 AND v1 THEN 0
      |          WHEN NOT v1 THEN 0
      |          ELSE CASE WHEN len(string_split(
      |              CASE WHEN nu = 3 THEN u3 WHEN nu = 2 THEN u2
      |                   ELSE u1 END, '.')) = 2
      |            AND len(split_part(CASE WHEN nu = 3 THEN u3
      |              WHEN nu = 2 THEN u2 ELSE u1 END, '.', 2)) = 6
      |            THEN 1 ELSE 0 END END
      |      ELSE 0 END AS ok,
      |    CASE part
      |      WHEN 'parse' THEN split_part(s1, ':', 1)
      |      WHEN 'real' THEN a1
      |      WHEN 'xpos' THEN
      |        CASE WHEN strip1 THEN rb1 || '.' || q1 ELSE s1 END
      |      ELSE '' END AS out,
      |    CAST(CASE part
      |      WHEN 'parse' THEN TRY_CAST(split_part(s1, ':', 2) AS BIGINT)
      |      WHEN 'sfx' THEN
      |        CASE WHEN s1 = '' THEN 1
      |          WHEN sx1 <> '' THEN TRY_CAST(sx1 AS BIGINT) ELSE 1 END
      |      WHEN 'cmp' THEN
      |        CASE WHEN strip1 AND strip2 THEN
      |          CASE WHEN s1 > s2 THEN 1 WHEN s1 < s2 THEN -1
      |            WHEN p1 > p2 THEN 1 WHEN p1 < p2 THEN -1 ELSE 0 END
      |        ELSE
      |          CASE WHEN a1 > a2 THEN 1 WHEN a1 < a2 THEN -1
      |            WHEN p1 > p2 THEN 1 WHEN p1 < p2 THEN -1 ELSE 0 END
      |        END
      |      WHEN 'xpos' THEN p1
      |      ELSE NULL END AS BIGINT) AS num,
      |    CASE part WHEN 'xpos' THEN
      |      CASE WHEN strip1 AND sx1 = split_part(u1, '.', 2) AND u1 <> ''
      |             THEN u1 || '#' || sx1
      |           WHEN strip1 AND sx1 = split_part(u2, '.', 2) AND u2 <> ''
      |             THEN u2 || '#' || sx1
      |           WHEN NOT strip1 AND sx1 = '' AND v1 AND nu > 0 THEN
      |             CASE WHEN nu = 3 THEN u3 WHEN nu = 2 THEN u2
      |                  ELSE u1 END || '#' ||
      |             split_part(CASE WHEN nu = 3 THEN u3 WHEN nu = 2 THEN u2
      |                  ELSE u1 END, '.', 2)
      |           ELSE '' END
      |      ELSE '' END AS extra
      |  FROM adj2
      |)
      |SELECT part, kase, ok,
      |  CASE WHEN ok = 1 THEN out ELSE '' END AS out,
      |  CASE WHEN ok = 1 THEN num ELSE NULL END AS num,
      |  CASE WHEN ok = 1 THEN extra ELSE '' END AS extra
      |FROM outp""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.BinlogPos
    import graft.streaming.BinlogPos.Position
    val rows = bpCases.map { c =>
      c.part match {
        case "parse" => BinlogPos.positionFromStr(c.s1) match {
          case Right(p) => (c.part, c.kase, 1, p.name, Some(p.pos), "")
          case Left(_) => (c.part, c.kase, 0, "", None: Option[Long], "")
        }
        case "real" =>
          val (p, err) = BinlogPos.realMySQLPos(Position(c.s1, c.p1))
          if (err.isEmpty) (c.part, c.kase, 1, p.name,
            None: Option[Long], "")
          else (c.part, c.kase, 0, "", None: Option[Long], "")
        case "sfx" => BinlogPos.extractSuffix(c.s1) match {
          case Right(v) => (c.part, c.kase, 1, "", Some(v.toLong), "")
          case Left(_) => (c.part, c.kase, 0, "", None: Option[Long], "")
        }
        case "cmp" =>
          val v = BinlogPos.compare(Position(c.s1, c.p1),
            Position(c.s2, c.p2))
          (c.part, c.kase, 1, "", Some(v.toLong), "")
        case "xpos" =>
          BinlogPos.extractPos(Position(c.s1, c.p1), c.uuids) match {
            case Right((uuid, sfx, real)) =>
              (c.part, c.kase, 1, real.name, Some(real.pos), s"$uuid#$sfx")
            case Left(_) => (c.part, c.kase, 0, "", None: Option[Long], "")
          }
      }
    }
    rows.toDF("part", "kase", "ok", "out", "num", "extra")
  }

  /**
   * q276 — the owner's replication-set handoff protocol
   * ([[graft.streaming.ReplicationSet]];
   * cdc/scheduler/internal/v3/replication/replication_set.go): four
   * scenario traces replayed step-by-step through the kernel, pinning the
   * state/primary/dispatch/checkpoint after every event. `add` = the
   * Absent→Prepare→Commit→Replicating lifecycle with both AddTable
   * dispatches (:471-576, :626-641); `move` = the full handoff — the old
   * primary keeps replicating through Prepare, is asked to stop only once
   * the secondary is Prepared, re-asked while it still replicates, and
   * its FINAL reported checkpoint seeds the promoted primary (:584-684,
   * :716-728); `remove` = Removing re-dispatches until the capture stops
   * (:819-861); `crash` = init-from-statuses (:141-283), the
   * undetermined-capture promotion BLOCK (:599-612), the zero-resolvedTs
   * backfill (:1035-1040) and primary shutdown → Absent (:794-809).
   * All timestamps anchor to count(orders); oracle = the expected
   * transition table with the same anchored arithmetic.
   */
  val replicationSet = GateQuery(
    "q276_replication_set",
    Some("""WITH b AS (
      |  SELECT CAST(count(*) AS BIGINT) * 10 AS t0 FROM orders
      |)
      |SELECT v.sc, CAST(v.step AS INT) AS step, v.state, v.prim, v.msgs,
      |  b.t0 + v.ck AS ck, b.t0 + v.rts AS rts,
      |  CAST(v.removed AS INT) AS removed
      |FROM (VALUES
      |  ('add', 1, 'Prepare', '', 'add-sec:cap-a', 0, 0, 0),
      |  ('add', 2, 'Prepare', '', '', 0, 0, 0),
      |  ('add', 3, 'Commit', 'cap-a', 'add-pri:cap-a', 0, 0, 0),
      |  ('add', 4, 'Replicating', 'cap-a', '', 10, 15, 0),
      |  ('move', 1, 'Prepare', 'cap-a', 'add-sec:cap-b', 10, 15, 0),
      |  ('move', 2, 'Prepare', 'cap-a', '', 20, 25, 0),
      |  ('move', 3, 'Commit', 'cap-a', 'rm:cap-a', 20, 25, 0),
      |  ('move', 4, 'Commit', 'cap-a', 'rm:cap-a', 30, 30, 0),
      |  ('move', 5, 'Commit', 'cap-b', 'add-pri:cap-b', 40, 45, 0),
      |  ('move', 6, 'Replicating', 'cap-b', '', 50, 55, 0),
      |  ('remove', 1, 'Removing', 'cap-a', 'rm:cap-a', 10, 15, 0),
      |  ('remove', 2, 'Removing', 'cap-a', '', 10, 15, 0),
      |  ('remove', 3, 'Removing', '', '', 10, 15, 1),
      |  ('crash', 0, 'Commit', '', '', 0, 0, 0),
      |  ('crash', 1, 'Commit', '', '', 0, 0, 0),
      |  ('crash', 2, 'Commit', '', '', 0, 0, 0),
      |  ('crash', 3, 'Commit', 'cap-b', 'add-pri:cap-b', 0, 0, 0),
      |  ('crash', 4, 'Replicating', 'cap-b', '', 60, 60, 0),
      |  ('crash', 5, 'Absent', '', '', 60, 60, 0)
      |) v(sc, step, state, prim, msgs, ck, rts, removed), b""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.streaming.ReplicationSet
      import ReplicationSet._
      val t0 = Tables.load(spark, dir, "orders").count() * 10
      val rows =
        scala.collection.mutable.ArrayBuffer
          .empty[(String, Int, String, String, String, Long, Long, Int)]
      def fmt(ms: Seq[Msg]): String = ms.map {
        case AddTableReq(_, to, true, _) => s"add-sec:$to"
        case AddTableReq(_, to, false, _) => s"add-pri:$to"
        case RemoveTableReq(_, to) => s"rm:$to"
      }.mkString(";")
      def rec(sc: String, step: Int, r: Rep,
              out: Either[String, Seq[Msg]]): Unit = {
        val msgs = out.fold(e => s"err:$e", fmt)
        rows += ((sc, step, RepState.names(r.currentState),
          r.currentPrimary, msgs, r.currentCheckpoint.checkpointTs,
          r.currentCheckpoint.resolvedTs,
          if (r.hasRemoved) 1 else 0))
      }
      def sts(s: Int, ck: Long = 0L, rts: Long = 0L) =
        TableStatus(1L, s, Checkpoint(ck, rts))
      def freshReplicating(): Rep = {
        val r = ReplicationSet.init(1L, t0, Seq.empty).toOption.get
        r.handleAddTable("cap-a")
        r.poll(sts(TableState.Prepared), "cap-a")
        r.poll(sts(TableState.Replicating, t0 + 10, t0 + 15), "cap-a")
        r
      }
      // add lifecycle
      locally {
        val r = ReplicationSet.init(1L, t0, Seq.empty).toOption.get
        rec("add", 1, r, r.handleAddTable("cap-a"))
        rec("add", 2, r, r.poll(sts(TableState.Preparing), "cap-a"))
        rec("add", 3, r, r.poll(sts(TableState.Prepared), "cap-a"))
        rec("add", 4, r,
          r.poll(sts(TableState.Replicating, t0 + 10, t0 + 15), "cap-a"))
      }
      // move handoff
      locally {
        val r = freshReplicating()
        rec("move", 1, r, r.handleMoveTable("cap-b"))
        rec("move", 2, r,
          r.poll(sts(TableState.Replicating, t0 + 20, t0 + 25), "cap-a"))
        rec("move", 3, r, r.poll(sts(TableState.Prepared), "cap-b"))
        rec("move", 4, r,
          r.poll(sts(TableState.Replicating, t0 + 30, t0 + 30), "cap-a"))
        rec("move", 5, r,
          r.poll(sts(TableState.Stopped, t0 + 40, t0 + 45), "cap-a"))
        rec("move", 6, r,
          r.poll(sts(TableState.Replicating, t0 + 50, t0 + 55), "cap-b"))
      }
      // remove lifecycle
      locally {
        val r = freshReplicating()
        rec("remove", 1, r, r.handleRemoveTable())
        rec("remove", 2, r, r.poll(sts(TableState.Stopping), "cap-a"))
        rec("remove", 3, r, r.poll(sts(TableState.Stopped), "cap-a"))
      }
      // init-from-statuses + undetermined block + backfill + shutdown
      locally {
        val r = ReplicationSet.init(1L, t0, Seq(
          "cap-b" -> sts(TableState.Prepared),
          "cap-c" -> sts(TableState.Stopping))).toOption.get
        rec("crash", 0, r, Right(Seq.empty))
        rec("crash", 1, r, r.poll(sts(TableState.Prepared), "cap-b"))
        rec("crash", 2, r, r.poll(sts(TableState.Stopped), "cap-c"))
        rec("crash", 3, r, r.poll(sts(TableState.Prepared), "cap-b"))
        rec("crash", 4, r,
          r.poll(sts(TableState.Replicating, t0 + 60, 0L), "cap-b"))
        rec("crash", 5, r,
          r.handleCaptureShutdown("cap-b").map(_._1))
      }
      rows.toSeq
        .toDF("sc", "step", "state", "prim", "msgs", "ck", "rts", "removed")
  }

  /**
   * q277 — the owner's table-scheduler decisions
   * ([[graft.streaming.TableSchedulers]];
   * cdc/scheduler/internal/v3/scheduler/scheduler_{basic,rebalance,
   * drain_capture}.go): a 13-table placement derived from the data
   * (table = o_orderkey % 13, primary = cap-(rowcount % 2)) driven
   * through three decision kernels. `add`/`rm` = basicSchedule's
   * round-robin burst adds (capped at batchSize 4) and the
   * dropped-table removal (scheduler_basic.go:60-137); `bal` =
   * newBalanceMoveTables' victims-beyond-ceil(n/captures) with the
   * greedy min-workload target walk (rebalance.go:108-197); `drain` =
   * drainSchedule's capped victim list off the stopping capture with
   * plain-incremented destination workloads (drain_capture.go:126-198).
   * The oracle REPLAYS the full algebra in SQL — victim selection,
   * ceiling, round-robin and both greedy walks (recursive CTEs) — from
   * the same parquet, so a divergence in any branch shows up as a value
   * mismatch, not a shared constant.
   */
  val tableSchedulers = GateQuery(
    "q277_table_schedulers",
    Some("""WITH RECURSIVE tbl AS (
      |  SELECT o_orderkey % 13 AS t, count(*) AS cnt FROM orders GROUP BY 1
      |), n_all AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cnt) AS BIGINT) AS total FROM tbl
      |), rep AS (
      |  SELECT t, cnt, 'cap-' || CAST(cnt % 2 AS VARCHAR) AS prim FROM tbl
      |), maxt AS (SELECT max(t) AS mt FROM tbl),
      |adds AS (
      |  SELECT row_number() OVER (ORDER BY t) AS k, t,
      |    'cap-' || CAST((row_number() OVER (ORDER BY t) - 1) % 3
      |      AS VARCHAR) AS dest
      |  FROM rep, maxt WHERE (cnt + t) % 3 = 0 AND t <> mt
      |  QUALIFY row_number() OVER (ORDER BY t) <= 4
      |), rm AS (
      |  SELECT 1 AS k, r.t, r.prim AS dest FROM rep r, maxt WHERE r.t = mt
      |), sz AS (
      |  SELECT count(*) FILTER (WHERE prim = 'cap-0') AS n0,
      |    count(*) FILTER (WHERE prim = 'cap-1') AS n1 FROM rep
      |), up AS (
      |  SELECT CAST(ceil(n / 3.0) AS BIGINT) AS ul FROM n_all
      |), victims AS (
      |  SELECT v.t, v.prim, row_number() OVER (ORDER BY v.prim, v.t) AS i
      |  FROM (SELECT t, prim, row_number()
      |          OVER (PARTITION BY prim ORDER BY t) AS rn FROM rep) v,
      |    up, sz
      |  WHERE (v.prim = 'cap-0' AND v.rn <= sz.n0 - up.ul)
      |     OR (v.prim = 'cap-1' AND v.rn <= sz.n1 - up.ul)
      |), post AS (
      |  SELECT sz.n0 - greatest(sz.n0 - up.ul, 0) AS s0,
      |    sz.n1 - greatest(sz.n1 - up.ul, 0) AS s1,
      |    CAST(0 AS BIGINT) AS s2 FROM sz, up
      |), bal AS (
      |  SELECT CAST(0 AS BIGINT) AS i, s0, s1, s2,
      |    CAST(NULL AS BIGINT) AS t, '' AS dest FROM post
      |  UNION ALL
      |  SELECT v.i,
      |    g.s0 + CASE WHEN g.s0 <= g.s1 AND g.s0 <= g.s2 THEN 1 ELSE 0 END,
      |    g.s1 + CASE WHEN NOT (g.s0 <= g.s1 AND g.s0 <= g.s2)
      |                 AND g.s1 <= g.s2 THEN 1 ELSE 0 END,
      |    g.s2 + CASE WHEN NOT (g.s0 <= g.s1 AND g.s0 <= g.s2)
      |                 AND NOT g.s1 <= g.s2 THEN 1 ELSE 0 END,
      |    v.t,
      |    CASE WHEN g.s0 <= g.s1 AND g.s0 <= g.s2 THEN 'cap-0'
      |         WHEN g.s1 <= g.s2 THEN 'cap-1' ELSE 'cap-2' END
      |  FROM bal g JOIN victims v ON v.i = g.i + 1
      |), dvic AS (
      |  SELECT t, row_number() OVER (ORDER BY t) AS i FROM rep
      |  WHERE prim = 'cap-0' QUALIFY row_number() OVER (ORDER BY t) <= 3
      |), drain AS (
      |  SELECT CAST(0 AS BIGINT) AS i, CAST(sz.n1 AS BIGINT) AS w1,
      |    CAST(0 AS BIGINT) AS w2, CAST(NULL AS BIGINT) AS t, '' AS dest
      |  FROM sz
      |  UNION ALL
      |  SELECT v.i,
      |    g.w1 + CASE WHEN g.w1 <= g.w2 THEN 1 ELSE 0 END,
      |    g.w2 + CASE WHEN NOT g.w1 <= g.w2 THEN 1 ELSE 0 END,
      |    v.t, CASE WHEN g.w1 <= g.w2 THEN 'cap-1' ELSE 'cap-2' END
      |  FROM drain g JOIN dvic v ON v.i = g.i + 1
      |)
      |SELECT 'add' AS part, CAST(k AS BIGINT) AS k, t AS tbl, dest,
      |  (SELECT total FROM n_all) AS ck
      |FROM adds
      |UNION ALL
      |SELECT 'rm', CAST(k AS BIGINT), t, dest, CAST(0 AS BIGINT) FROM rm
      |UNION ALL
      |SELECT 'bal', i, t, dest, CAST(0 AS BIGINT) FROM bal WHERE i > 0
      |UNION ALL
      |SELECT 'drain', i, t, dest, CAST(0 AS BIGINT) FROM drain
      |WHERE i > 0""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.ReplicationSet
    import graft.streaming.ReplicationSet.{TableState, TableStatus}
    import graft.streaming.TableSchedulers
    import graft.streaming.TableSchedulers._
    val tblCnt = Tables.load(spark, dir, "orders")
      .groupBy((col("o_orderkey") % 13).as("t")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val nOrders = tblCnt.map(_._2).sum
    def repOn(t: Long, cap: String) = ReplicationSet.init(t, 100L,
      Seq(cap -> TableStatus(t, TableState.Replicating))).toOption.get
    val reps = tblCnt.map { case (t, c) => t -> repOn(t, s"cap-${c % 2}") }
      .toMap
    val capsInit = Seq(
      CaptureStatus("cap-0", CaptureState.Initialized),
      CaptureStatus("cap-1", CaptureState.Initialized),
      CaptureStatus("cap-2", CaptureState.Initialized))
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, String, Long)]
    // basic: tables with (cnt+t)%3==0 have no replication set yet; the
    // max table id is no longer current -> removed.
    val maxT = tblCnt.map(_._1).max
    val current = tblCnt.map(_._1).filter(_ != maxT)
    // maxT keeps its replication set unconditionally: the oracle's 'rm'
    // row is unconditional, and at an unlucky scale factor
    // (cnt(maxT)+maxT) % 3 == 0 would otherwise drop it from the map
    // and erase the RemoveTable
    val repsBasic = reps.filter { case (t, _) =>
      val c = tblCnt.find(_._1 == t).get._2
      t == maxT || (c + t) % 3 != 0
    }
    TableSchedulers.basicSchedule(nOrders, current, capsInit, repsBasic,
      batchSize = 4).foreach {
      case BurstBalance(adds, removes, _) =>
        adds.zipWithIndex.foreach { case (a, i) =>
          rows += (("add", i + 1L, a.tableId, a.captureId, a.checkpointTs))
        }
        removes.zipWithIndex.foreach { case (r, i) =>
          rows += (("rm", i + 1L, r.tableId, r.captureId, 0L))
        }
      case _ =>
    }
    // balance: unlimited burst over the full placement
    TableSchedulers.balanceMoveTables(capsInit, reps, Int.MaxValue)
      .zipWithIndex.foreach { case (m, i) =>
        rows += (("bal", i + 1L, m.tableId, m.destCapture, 0L))
      }
    // drain cap-0 (stopping, non-owner), task cap 3
    val capsDrain = Seq(
      CaptureStatus("cap-0", CaptureState.Stopping),
      CaptureStatus("cap-1", CaptureState.Initialized, isOwner = true),
      CaptureStatus("cap-2", CaptureState.Initialized))
    TableSchedulers.drainSchedule(None, capsDrain, reps, 3)._1.foreach {
      case MoveTable(t, dest) =>
        rows += (("drain", rows.count(_._1 == "drain") + 1L, t, dest, 0L))
      case _ =>
    }
    rows.toSeq.toDF("part", "k", "tbl", "dest", "ck")
  }

  /**
   * q278 — hot-table keyspan splitting ([[graft.streaming.KeySpanSplit]];
   * cdc/scheduler/internal/v3/keyspan/): 40 "regions" derived from
   * lineitem (region r = l_orderkey % 40, writtenKeys = its row count)
   * driven through the three split decisions. `num` = getSpansNumber's
   * max(captures × max(captures−1, 3), regions/50000) capped at 100
   * (reconciler.go:219-234); `wsplit` = the written-keys walk — +1
   * normalization, limit = totalNorm/baseSpans, emission on
   * strictly-greater weight / rest-region exhaustion / rest-span
   * re-estimation (splitter_write.go:117-271); `wskip` = the
   * below-threshold single span; `rcount` = the evenly-split stepper
   * with the front-loaded remainder and outer-bound re-imposition
   * (splitter_region_count.go:46-160). The oracle REPLAYS both walks in
   * SQL — the written-keys walk as a recursive CTE over the cumulative
   * normalized weights, the stepper via its closed form
   * cum_j = j·base + extra·min(j, bigSteps).
   */
  val keySpanSplit = GateQuery(
    "q278_keyspan_split",
    Some("""WITH RECURSIVE reg AS (
      |  SELECT l_orderkey % 40 AS r, CAST(count(*) AS BIGINT) AS wk
      |  FROM lineitem GROUP BY 1
      |), norm AS (
      |  SELECT r + 1 AS idx, wk + 1 AS nwk,
      |    'k' || CAST(r AS VARCHAR) AS skey,
      |    'k' || CAST(r + 1 AS VARCHAR) AS ekey
      |  FROM reg
      |), tot AS (
      |  SELECT CAST(sum(nwk) AS BIGINT) AS totn,
      |    CAST(sum(nwk - 1) AS BIGINT) AS totw,
      |    CAST(count(*) AS BIGINT) AS n FROM norm
      |), cum AS (
      |  SELECT idx, skey, ekey, nwk,
      |    CAST(sum(nwk) OVER (ORDER BY idx) AS BIGINT) AS cw
      |  FROM norm
      |), nums AS (
      |  SELECT k, rn, cn,
      |    least(100, CASE WHEN rn > 1
      |      THEN greatest(cn * greatest(cn - 1, 3), rn // 50000)
      |      ELSE 1 END) AS spans
      |  FROM (SELECT 1 AS k, n AS rn, CAST(1 AS BIGINT) AS cn FROM tot
      |        UNION ALL SELECT 2, n, 2 FROM tot
      |        UNION ALL SELECT 3, n, 5 FROM tot
      |        UNION ALL SELECT 4, totw, 2 FROM tot
      |        UNION ALL SELECT 5, totw, 200 FROM tot) v
      |), base AS (SELECT spans AS bs FROM nums WHERE k = 2
      |), lim AS (SELECT t.totn // b.bs AS lim FROM tot t, base b
      |), walk AS (
      |  SELECT CAST(0 AS BIGINT) AS i, CAST(1 AS BIGINT) AS s,
      |    CAST(b.bs AS BIGINT) AS rs, FALSE AS done,
      |    CAST(NULL AS BIGINT) AS es, CAST(NULL AS BIGINT) AS ee
      |  FROM base b
      |  UNION ALL
      |  SELECT w.i + 1,
      |    CASE WHEN mid.isa THEN t.n + 1
      |         WHEN st.isbc THEN w.i + 2 ELSE w.s END,
      |    CASE WHEN st.isbc THEN mid.rs1 - 1 ELSE mid.rs1 END,
      |    mid.isa,
      |    CASE WHEN mid.isa OR st.isbc THEN w.s END,
      |    CASE WHEN mid.isa THEN t.n WHEN st.isbc THEN w.i + 1 END
      |  FROM walk w
      |  CROSS JOIN tot t CROSS JOIN lim l
      |  JOIN cum ci ON ci.idx = w.i + 1
      |  LEFT JOIN cum cs ON cs.idx = w.s - 1,
      |  LATERAL (
      |    SELECT
      |      ci.cw - coalesce(cs.cw, 0) AS w1,
      |      t.n - w.i AS rr,
      |      t.totn - coalesce(cs.cw, 0) AS rw
      |  ) pre,
      |  LATERAL (
      |    SELECT
      |      (w.rs = 1 AND pre.rw <= l.lim) AS isa,
      |      CASE WHEN w.rs = 1 AND pre.rw > l.lim
      |           THEN pre.rw // l.lim + 1 ELSE w.rs END AS rs1
      |  ) mid,
      |  LATERAL (
      |    SELECT (NOT mid.isa) AND (pre.rr <= mid.rs1 OR pre.w1 > l.lim
      |      OR (w.i + 1 - w.s + 1) >= 50000) AS isbc
      |  ) st
      |  WHERE NOT w.done AND w.i < t.n
      |), emitted AS (
      |  SELECT es, ee FROM walk WHERE es IS NOT NULL
      |  UNION ALL
      |  -- the catch-all leftover span (splitter_write.go:222-246)
      |  SELECT w.s, t.n FROM walk w, tot t
      |  WHERE w.i = t.n AND NOT w.done AND w.s <= t.n
      |), wsplit AS (
      |  SELECT row_number() OVER (ORDER BY es) AS k,
      |    (SELECT skey FROM cum WHERE idx = es) AS skey,
      |    (SELECT ekey FROM cum WHERE idx = ee) AS ekey,
      |    ee - es + 1 AS cnt,
      |    (SELECT cw FROM cum WHERE idx = ee)
      |      - coalesce((SELECT cw FROM cum WHERE idx = es - 1), 0) AS w
      |  FROM emitted
      |), stepper AS (
      |  SELECT t.n, b.bs, t.n // b.bs AS rps, t.n % b.bs AS rem,
      |    CASE WHEN t.n // b.bs = 0 THEN 0
      |         WHEN t.n % b.bs <> 0
      |           THEN CAST(ceil((t.n % b.bs) / (1.0 * b.bs)) AS BIGINT)
      |         ELSE 0 END AS extra
      |  FROM tot t, base b
      |), stepper2 AS (
      |  SELECT *, CASE WHEN extra = 0 THEN 0
      |    ELSE CAST(ceil(rem / (1.0 * extra)) AS BIGINT) END AS bsteps,
      |    CASE WHEN rps = 0 THEN n ELSE bs END AS pages,
      |    greatest(rps, 1) AS rps1
      |  FROM stepper
      |), pagej AS (
      |  SELECT unnest(generate_series(1, CAST(pages AS BIGINT))) AS j,
      |    rps1, extra, bsteps, n
      |  FROM stepper2
      |), bounds AS (
      |  SELECT j, least(n,
      |      j * rps1 + extra * least(j, bsteps)) AS e,
      |    least(n, (j - 1) * rps1 + extra * least(j - 1, bsteps)) AS p,
      |    n
      |  FROM pagej
      |), rcount AS (
      |  SELECT row_number() OVER (ORDER BY j) AS k,
      |    CASE WHEN j = 1 THEN 'TSTART'
      |         ELSE (SELECT skey FROM cum WHERE idx = p + 1) END AS skey,
      |    CASE WHEN e = n THEN 'TEND'
      |         ELSE (SELECT ekey FROM cum WHERE idx = e) END AS ekey,
      |    e - p AS cnt
      |  FROM bounds WHERE p < n
      |)
      |SELECT 'num' AS part, CAST(k AS BIGINT) AS k, '' AS skey,
      |  '' AS ekey, CAST(spans AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS w
      |FROM nums
      |UNION ALL
      |SELECT 'wsplit', k, skey, ekey, CAST(cnt AS BIGINT), CAST(w AS BIGINT)
      |FROM wsplit
      |UNION ALL
      |SELECT 'wskip', 1, (SELECT skey FROM cum WHERE idx = 1),
      |  (SELECT ekey FROM cum ORDER BY idx DESC LIMIT 1),
      |  (SELECT n FROM tot), (SELECT totn FROM tot)
      |UNION ALL
      |SELECT 'rcount', k, skey, ekey, CAST(cnt AS BIGINT),
      |  CAST(0 AS BIGINT)
      |FROM rcount""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.KeySpanSplit
    import KeySpanSplit.{Region, Span}
    val buckets = Tables.load(spark, dir, "lineitem")
      .groupBy((col("l_orderkey") % 40).as("r")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val regions = buckets.map { case (r, c) =>
      Region(s"k$r", s"k${r + 1}", c)
    }.toSeq
    val n = regions.size
    val totW = buckets.map(_._2).sum
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, String, String, Long, Long)]
    // num: the span-count formula over data-derived inputs
    Seq((1L, n.toLong, 1), (2L, n.toLong, 2), (3L, n.toLong, 5),
      (4L, totW, 2), (5L, totW, 200)).foreach { case (k, rn, cn) =>
      rows += (("num", k, "", "",
        KeySpanSplit.spansNumber(rn.toInt, cn).toLong, 0L))
    }
    // wsplit: the written-keys walk at baseSpans = spansNumber(n, 2)
    val info = KeySpanSplit.splitByWrittenKeys(1L, regions,
      KeySpanSplit.spansNumber(n, 2), writeKeyThreshold = 1L)
    info.spans.zipWithIndex.foreach { case (s, i) =>
      rows += (("wsplit", i + 1L, s.startKey, s.endKey,
        info.regionCounts(i).toLong, info.weights(i)))
    }
    // wskip: threshold above the total write keeps one span
    val skip = KeySpanSplit.splitByWrittenKeys(1L, regions, 6,
      writeKeyThreshold = totW * 10)
    rows += (("wskip", 1L, skip.spans.head.startKey,
      skip.spans.head.endKey, skip.regionCounts.head.toLong,
      skip.weights.head))
    // rcount: the evenly-split stepper, outer bounds re-imposed; the
    // per-span region count replays the loop's end-capped boundaries
    // (splitter_region_count.go:76-109)
    val rSpans = KeySpanSplit.splitByRegionCount(Span(1L, "TSTART", "TEND"),
      regions, captureNum = 2, regionThreshold = 10)
    locally {
      val st = new KeySpanSplit.Stepper(KeySpanSplit.spansNumber(n, 2), n)
      var end = math.min(st.step(), n)
      var prev = 0
      rSpans.zipWithIndex.foreach { case (s, i) =>
        rows += (("rcount", i + 1L, s.startKey, s.endKey,
          (end - prev).toLong, 0L))
        prev = end
        val sp = st.step()
        end = if (end + sp < n) end + sp else n
      }
    }
    rows.toSeq.toDF("part", "k", "skey", "ekey", "cnt", "w")
  }

  /**
   * q279 — the owner's checkpoint-advance algebra
   * ([[graft.streaming.ReplicationManager.advanceCheckpoint]];
   * replication_manager.go:557-745): seven tables × two key-span pieces
   * with data-derived checkpoints (base = count(orders), per-table
   * offsets from the bucket row counts) driven through five scenarios.
   * `full` = min-checkpoint/min-resolved/max-lastSynced/min-puller with
   * the slowest sink picked by (ck, rts) lexicographic min (:633-639);
   * `hole` = a missing piece yields the all-zero cannot-proceed
   * watermark while the redo-enabled barrier still clamps to
   * min(redoBarrier, flushedMeta) (:680-695); `empty` = no tables
   * advances to (minTableBarrier, globalBarrier) (:698-716); `clamp` =
   * checkpoint capped at the min-table barrier (:718-720); `redo` =
   * resolved capped by the redo barrier, the meta update taken BEFORE
   * the flushed clamp, the global barrier never passing the flushed
   * resolved ts (:728-743). Oracle = the same aggregations and clamps
   * in SQL over the same derived pieces.
   */
  val advanceCheckpoint = GateQuery(
    "q279_advance_checkpoint",
    Some("""WITH cnt AS (
      |  SELECT o_orderkey % 7 AS t, CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1
      |), b AS (SELECT CAST(count(*) AS BIGINT) AS base FROM orders
      |), p AS (
      |  SELECT t, i, base + c + t * 3 + i * 7 AS ck, base
      |  FROM cnt, b, (VALUES (0), (1)) v(i)
      |), p2 AS (
      |  SELECT t, i, ck, ck + t + i + 1 AS rts, ck - 5 + i AS ls,
      |    ck + 50 + t - i AS pu, base
      |  FROM p
      |)
      |SELECT 'full' AS part, min(ck) AS ck, min(rts) AS rts,
      |  max(ls) AS ls, min(pu) AS puller,
      |  (SELECT base * 2 + 500 FROM b) AS g_bar,
      |  (SELECT t FROM p2 ORDER BY ck, rts LIMIT 1) AS slow_sink,
      |  (SELECT t FROM p2 ORDER BY pu LIMIT 1) AS slow_puller,
      |  CAST(-1 AS BIGINT) AS meta_ck, CAST(-1 AS BIGINT) AS meta_rts
      |FROM p2
      |UNION ALL
      |-- the slowest sink/puller side fields keep their pre-hole values
      |-- (instance fields in the Go, assigned before the hole aborts)
      |SELECT 'hole', 0, 0, 0, 0, base * 2 - 100,
      |  (SELECT t FROM p2 WHERE t <= 3 ORDER BY ck, rts LIMIT 1),
      |  (SELECT t FROM p2 WHERE t <= 3 ORDER BY pu LIMIT 1), -1, -1
      |FROM b
      |UNION ALL
      |SELECT 'empty', base * 2 + 400, base * 2 + 500, 0, 0,
      |  base * 2 + 500, -1, -1, -1, -1 FROM b
      |UNION ALL
      |SELECT 'clamp', base * 2 + 400,
      |  (SELECT min(rts) FROM p2 WHERE t = 0 AND i = 0) + base * 2,
      |  0, 0, base * 2 + 500, 0, -1, -1, -1
      |FROM b
      |UNION ALL
      |SELECT 'redo', base, base + 150, 0, 0, base + 150, 0, -1,
      |  base, base + 200 FROM b""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.ReplicationManager
    import ReplicationManager._
    import graft.streaming.ReplicationSet.Checkpoint
    val buckets = Tables.load(spark, dir, "orders")
      .groupBy((col("o_orderkey") % 7).as("t")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val base = buckets.map(_._2).sum
    def piece(t: Long, c: Long, i: Int): SpanView = {
      val ck = base + c + t * 3 + i * 7
      SpanView(t, if (i == 0) "a" else "m", if (i == 0) "m" else "z",
        Checkpoint(ck, ck + t + i + 1, ck - 5 + i),
        Some(ck + 50 + t - i))
    }
    val tables = buckets.map { case (t, _) => (t, "a", "z") }.toSeq
    val allPieces = buckets.toSeq.flatMap { case (t, c) =>
      Seq(piece(t, c, 0), piece(t, c, 1))
    }
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
    def emit(part: String, a: Advance): Unit =
      rows += ((part, a.watermark.checkpointTs, a.watermark.resolvedTs,
        a.watermark.lastSyncedTs, a.watermark.pullerResolvedTs,
        a.barrier.globalBarrierTs,
        a.slowestSink.map(_._1).getOrElse(-1L),
        a.slowestPuller.map(_._1).getOrElse(-1L),
        a.redoMetaUpdate.map(_._1).getOrElse(-1L),
        a.redoMetaUpdate.map(_._2).getOrElse(-1L)))
    val bar = BarrierTs(base * 2 + 500, base * 2 + 400, base * 2 - 100)
    emit("full", ReplicationManager.advanceCheckpoint(tables, allPieces,
      bar, redoEnabled = false))
    // hole: drop table 3's second piece; redo enabled with a flushed
    // meta ABOVE the redo barrier (the barrier wins the min)
    emit("hole", ReplicationManager.advanceCheckpoint(tables,
      allPieces.filterNot(p => p.tableId == 3L && p.startKey == "m"),
      bar, redoEnabled = true, redoFlushedResolvedTs = base * 2 - 50))
    emit("empty", ReplicationManager.advanceCheckpoint(Seq.empty,
      Seq.empty, bar, redoEnabled = false))
    // clamp: one whole-table span far past the min-table barrier
    val hot = buckets.head._2
    emit("clamp", ReplicationManager.advanceCheckpoint(
      Seq((0L, "a", "z")),
      Seq(SpanView(0L, "a", "z",
        Checkpoint(base * 3, base + hot + 1 + base * 2))),
      bar, redoEnabled = false))
    // redo: resolved above the redo barrier, flushed meta below it
    emit("redo", ReplicationManager.advanceCheckpoint(
      Seq((0L, "a", "z")),
      Seq(SpanView(0L, "a", "z", Checkpoint(base, base * 2 + 300))),
      BarrierTs(base * 2 + 500, base * 2 + 400, base + 200),
      redoEnabled = true, redoFlushedResolvedTs = base + 150))
    rows.toSeq.toDF("part", "ck", "rts", "ls", "puller", "g_bar",
      "slow_sink", "slow_puller", "meta_ck", "meta_rts")
  }

  /**
   * q280 — the capture-membership handshake
   * ([[graft.streaming.CaptureManager]];
   * cdc/scheduler/internal/v3/member/capture_manager.go): one timeline
   * driven through the manager — fresh captures greeted
   * (:241-256), the first full initialization snapshotting every
   * capture's tables into `changes.Init` (:286-292), a STALE-epoch
   * heartbeat dropped while a same-epoch stopping response downgrades
   * the capture (:83-118), a post-init removal carrying the last-known
   * tables into `changes.Removed` (:259-279), TakeChanges'
   * consume-once, and six ticks of the heartbeat/collect-stats clocks
   * (heartbeatTick 2, collectStatsTick 3, :175-215). Table ids anchor
   * to count(orders) % 7; oracle = the expected timeline with the same
   * anchored arithmetic.
   */
  val captureManager = GateQuery(
    "q280_capture_manager",
    Some("""WITH b AS (
      |  SELECT CAST(count(*) % 7 AS BIGINT) AS t1,
      |    CAST(count(*) % 7 + 1 AS BIGINT) AS t2 FROM orders
      |)
      |SELECT v.step, v.kind, v.cap,
      |  CASE v.num WHEN -7 THEN b.t1 WHEN -8 THEN b.t2
      |    ELSE CAST(v.num AS BIGINT) END AS num, v.txt
      |FROM (VALUES
      |  (1, 'fresh', 'cap-b', 0, ''),
      |  (1, 'fresh', 'cap-owner', 0, ''),
      |  (1, 'take', '', 0, 'none'),
      |  (2, 'state', 'cap-owner', 2, 'e0'),
      |  (2, 'state', 'cap-b', 2, 'e1'),
      |  (3, 'init', 'cap-b', -8, ''),
      |  (3, 'init', 'cap-owner', -7, ''),
      |  (3, 'flag', '', 1, ''),
      |  (4, 'state', 'cap-b', 2, 'e1'),
      |  (4, 'tables', 'cap-b', -8, ''),
      |  (5, 'state', 'cap-b', 3, 'e1'),
      |  (5, 'allinit', '', 1, ''),
      |  (6, 'removed', 'cap-b', -8, ''),
      |  (7, 'tick', '', 0, 'f'),
      |  (8, 'tick', '', 1, 'f'),
      |  (9, 'tick', '', 0, 'f'),
      |  (10, 'tick', '', 1, 't'),
      |  (11, 'tick', '', 0, 'f'),
      |  (12, 'tick', '', 1, 't')
      |) v(step, kind, cap, num, txt), b""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.CaptureManager
    import CaptureManager._
    import graft.streaming.ReplicationSet.{Checkpoint, TableState, TableStatus}
    val t1 = Tables.load(spark, dir, "orders").count() % 7
    val t2 = t1 + 1
    def ts(t: Long) =
      TableStatus(t, TableState.Replicating, Checkpoint(10, 20))
    val m = new Manager("cap-owner", 7L, heartbeatTick = 2,
      collectStatsTick = 3)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, String)]
    // step 1: two fresh captures greeted; nothing to take before init
    m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0", "cap-b" -> "a1"))
      .foreach(id => rows += ((1, "fresh", id, 0L, "")))
    rows += ((1, "take", "",
      0L, m.takeChanges().map(_ => "some").getOrElse("none")))
    // step 2: both respond; epochs adopted
    m.handleHeartbeatResponse("cap-owner", Seq(ts(t1)), LivenessAlive, "e0")
    m.handleHeartbeatResponse("cap-b", Seq(ts(t2)), LivenessAlive, "e1")
    Seq("cap-owner", "cap-b").foreach { id =>
      val c = m.capture(id).get
      rows += ((2, "state", id, c.currentState.toLong, c.currentEpoch))
    }
    // step 3: the init snapshot fires on the next alive update
    m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0", "cap-b" -> "a1"))
    m.takeChanges().foreach { ch =>
      ch.init.toSeq.sortBy(_._1).foreach { case (id, sts) =>
        rows += ((3, "init", id, sts.head.tableId, ""))
      }
    }
    rows += ((3, "flag", "", if (m.initialized) 1L else 0L, ""))
    // step 4: a stale-epoch response is dropped wholesale
    m.handleHeartbeatResponse("cap-b", Seq(ts(99L)), LivenessAlive, "e9")
    val cb = m.capture("cap-b").get
    rows += ((4, "state", "cap-b", cb.currentState.toLong, cb.currentEpoch))
    rows += ((4, "tables", "cap-b", cb.currentTables.head.tableId, ""))
    // step 5: same-epoch stopping downgrades; barrier still satisfied
    m.handleHeartbeatResponse("cap-b", Seq(ts(t2)), LivenessStopping, "e1")
    rows += ((5, "state", "cap-b",
      m.capture("cap-b").get.currentState.toLong, "e1"))
    rows += ((5, "allinit", "",
      if (m.checkAllCaptureInitialized) 1L else 0L, ""))
    // step 6: post-init removal carries the last-known tables
    m.handleAliveCaptureUpdate(Map("cap-owner" -> "a0"))
    m.takeChanges().foreach { ch =>
      ch.removed.toSeq.sortBy(_._1).foreach { case (id, sts) =>
        rows += ((6, "removed", id, sts.head.tableId, ""))
      }
    }
    // steps 7-12: the heartbeat/collect-stats clocks over six ticks
    (7 to 12).foreach { step =>
      val hb = m.tick(Map("cap-owner" -> Seq(t1)), None)
      rows += ((step, "tick", "", hb.size.toLong,
        if (hb.nonEmpty && hb.forall(_.collectStats)) "t" else "f"))
    }
    rows.toSeq.toDF("step", "kind", "cap", "num", "txt")
  }

  /**
   * q281 — the coordinator poll round end-to-end
   * ([[graft.streaming.Coordinator]]; coordinator.go:268-385 +
   * scheduler_manager.go:66-96): six deterministic rounds of one owner
   * tick over two captures and three tables — the uninitialized
   * short-circuit (zero watermark, greetings + heartbeats only), the
   * init barrier crossing with the basic scheduler's round-robin burst
   * add, the Preparing wait, the Prepared→promotion dispatches, the
   * Replicating convergence (running tasks swept, the watermark turning
   * real with the SEEDED puller-egress stage =
   * the init checkpoint, NewReplicationSet:157-186), and the steady
   * state. Checkpoints anchor to count(orders); oracle = the expected
   * per-round table with the same arithmetic.
   */
  val coordinatorRound = GateQuery(
    "q281_coordinator_round",
    Some("""WITH b AS (
      |  SELECT CAST(count(*) AS BIGINT) * 20 AS t0 FROM orders
      |)
      |SELECT v.r, CASE WHEN v.ck < 0 THEN 0 ELSE b.t0 + v.ck END AS ck,
      |  CASE WHEN v.rts < 0 THEN 0 ELSE b.t0 + v.rts END AS rts,
      |  CAST(v.ls AS BIGINT) AS ls,
      |  CASE WHEN v.pu < 0 THEN 0 ELSE b.t0 + v.pu END AS pu,
      |  CAST(v.nd AS BIGINT) AS nd, CAST(v.nh AS BIGINT) AS nh,
      |  CAST(v.nr AS BIGINT) AS nr
      |FROM (VALUES
      |  (1, -1, -1, 0, -1, 0, 4, 0),
      |  (2, 0, 0, 0, 0, 3, 2, 3),
      |  (3, 0, 0, 0, 0, 0, 2, 3),
      |  (4, 0, 0, 0, 0, 3, 2, 3),
      |  (5, 101, 106, 0, 0, 0, 2, 0),
      |  (6, 101, 106, 0, 0, 0, 2, 0)
      |) v(r, ck, rts, ls, pu, nd, nh, nr), b""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.streaming.Coordinator.{Coord, Incoming}
      import graft.streaming.CaptureManager.LivenessAlive
      import graft.streaming.ReplicationSet.{Checkpoint, TableState, TableStatus}
      val t0 = Tables.load(spark, dir, "orders").count() * 20
      val coord = new Coord("cap-0", 7L, heartbeatTick = 1,
        collectStatsTick = 4, maxTaskConcurrency = 8,
        addTableBatchSize = 10)
      val tables = Seq(1L, 2L, 3L)
      val alive = Map("cap-0" -> "a0", "cap-1" -> "a1")
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Long, Long, Long, Long, Long, Long)]
      def owned(cap: String): Seq[Long] =
        coord.replicationM.replicationSets.collect {
          case (t, rep) if rep.currentCaptures.contains(cap) => t
        }.toSeq.sorted
      def round(r: Int, state: Option[Int], ckOf: Long => Checkpoint)
          : Unit = {
        val incoming = Seq("cap-0", "cap-1").map { cap =>
          val sts = state.toSeq.flatMap(s => owned(cap).map(t =>
            TableStatus(t, s, if (s == TableState.Replicating) ckOf(t)
            else Checkpoint(0, 0))))
          Incoming(cap, s"e-$cap", LivenessAlive, sts)
        }
        val res = coord.poll(t0, tables, alive,
          graft.streaming.ReplicationManager.BarrierTs(
            1L << 40, (1L << 40) - 10, (1L << 40) - 20),
          incoming).toOption.get
        rows += ((r, res.watermark.checkpointTs, res.watermark.resolvedTs,
          res.watermark.lastSyncedTs, res.watermark.pullerResolvedTs,
          res.dispatches.size.toLong, res.heartbeats.size.toLong,
          coord.replicationM.runningTaskTables.size.toLong))
      }
      round(1, None, _ => Checkpoint(0, 0))
      round(2, None, _ => Checkpoint(0, 0))
      round(3, Some(TableState.Preparing), _ => Checkpoint(0, 0))
      round(4, Some(TableState.Prepared), _ => Checkpoint(0, 0))
      round(5, Some(TableState.Replicating),
        t => Checkpoint(t0 + 100 + t, t0 + 105 + t))
      round(6, Some(TableState.Replicating),
        t => Checkpoint(t0 + 100 + t, t0 + 105 + t))
      rows.toSeq.toDF("r", "ck", "rts", "ls", "pu", "nd", "nh", "nr")
  }

  /**
   * q282 — the processor-side scheduling agent
   * ([[graft.streaming.Agent]]; cdc/scheduler/internal/v3/agent/): one
   * deterministic timeline against the step executor — the
   * owner-revision handshake (adopt resets the processor epoch, staled
   * owners dropped, same-revision id mismatch errors,
   * agent.go:408-460), the epoch-guarded dispatch (:331-394), the add
   * task machine (Preparing reports NOTHING to spare the owner,
   * table.go:227; Prepared is stable for a prepare task; the
   * received→processed second phase reaches Replicating), heartbeat
   * semantics (unknown requested spans report Absent, a pending remove
   * overrides to Stopping, IsStopping latches liveness one-way), and
   * the remove machine's Stopped response with the final checkpoint and
   * the zero-resolved backfill (:96-105, :124-170). Checkpoints anchor
   * to count(orders).
   */
  val captureAgent = GateQuery(
    "q282_capture_agent",
    Some("""WITH b AS (
      |  SELECT CAST(count(*) AS BIGINT) * 40 AS t0 FROM orders
      |)
      |SELECT v.step, v.kind,
      |  CASE WHEN v.num <= -5 THEN b.t0 + (v.num + 10)
      |       ELSE CAST(v.num AS BIGINT) END AS num, v.txt
      |FROM (VALUES
      |  (1, 'own', 1, 'cap-1-epoch-2'),
      |  (2, 'own', 0, 'cap-1-epoch-2'),
      |  (3, 'own', -1, 'schedulerv3: owner IDs do not match'),
      |  (4, 'tracked', 0, ''),
      |  (5, 'tracked', 1, ''),
      |  (6, 'resp', 0, ''),
      |  (7, 'resp', 1, 'Prepared'),
      |  (8, 'resp', 1, 'Prepared'),
      |  (9, 'ck', -7, 'Replicating'),
      |  (10, 'rts', -5, ''),
      |  (11, 'hb', 2, 'Replicating,Absent'),
      |  (12, 'hb', 1, 'Stopping'),
      |  (13, 'resp', 1, 'Stopping'),
      |  (14, 'ck', -7, 'Stopped'),
      |  (15, 'rts', -7, ''),
      |  (16, 'tracked', 0, ''),
      |  (17, 'live', 1, ''),
      |  (18, 'live', 1, '')
      |) v(step, kind, num, txt), b""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.Agent
    import Agent.CaptureAgent
    import graft.streaming.ReplicationSet.{Checkpoint, TableState}
    val t0 = Tables.load(spark, dir, "orders").count() * 40
    val ex = new Agent.StepExecutor(t0)
    val a = new CaptureAgent("cap-1", ex)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, String)]
    def own(step: Int, id: String, rev: Long): Unit =
      a.handleOwnerInfo(id, rev) match {
        case Right(ok) => rows += ((step, "own", if (ok) 1L else 0L,
          a.epoch))
        case Left(e) => rows += ((step, "own", -1L, e))
      }
    own(1, "owner-a", 5L)
    own(2, "owner-old", 4L)
    own(3, "owner-b", 5L)
    a.dispatchAdd(1L, Checkpoint(t0, t0), isSecondary = true, "stale")
    rows += ((4, "tracked", a.trackedTables.size.toLong, ""))
    a.dispatchAdd(1L, Checkpoint(t0, t0), isSecondary = true, a.epoch)
    rows += ((5, "tracked", a.trackedTables.size.toLong, ""))
    def resp(step: Int): Unit = {
      val r = a.pollTables()
      rows += ((step, "resp", r.size.toLong,
        r.map(s => TableState.names(s.state)).mkString(",")))
    }
    resp(6) // Preparing: silent
    ex.tick(); resp(7) // Prepared: stable for the prepare task
    a.dispatchAdd(1L, Checkpoint(t0, t0), isSecondary = false, a.epoch)
    resp(8) // second phase started, still Prepared
    ex.tick() // Prepared -> Replicating, ck += 3
    val rep = a.pollTables()
    rows += ((9, "ck", rep.head.checkpoint.checkpointTs,
      TableState.names(rep.head.state)))
    rows += ((10, "rts", rep.head.checkpoint.resolvedTs, ""))
    val (hb1, _, _) = a.handleHeartbeat(Seq(1L, 2L), isStopping = false,
      collectStats = false)
    rows += ((11, "hb", hb1.size.toLong,
      hb1.map(s => TableState.names(s.state)).mkString(",")))
    a.dispatchRemove(1L, a.epoch)
    val (hb2, _, _) = a.handleHeartbeat(Seq.empty, isStopping = false,
      collectStats = false)
    rows += ((12, "hb", hb2.size.toLong,
      hb2.map(s => TableState.names(s.state)).mkString(",")))
    resp(13) // Stopping
    ex.tick() // Stopping -> Stopped
    val fin = a.pollTables()
    rows += ((14, "ck", fin.head.checkpoint.checkpointTs,
      TableState.names(fin.head.state)))
    rows += ((15, "rts", fin.head.checkpoint.resolvedTs, ""))
    rows += ((16, "tracked", a.trackedTables.size.toLong, ""))
    a.handleHeartbeat(Seq.empty, isStopping = true, collectStats = false)
    rows += ((17, "live", a.currentLiveness.toLong, ""))
    a.handleHeartbeat(Seq.empty, isStopping = false, collectStats = false)
    rows += ((18, "live", a.currentLiveness.toLong, ""))
    rows.toSeq.toDF("step", "kind", "num", "txt")
  }

  // ---------------------------------------------------------------------
  // q285 — DM validator stage orchestration
  // ---------------------------------------------------------------------

  /** One validator-lifecycle scripted step. `ev` ∈ run/vstart/vstop/
    * verror/pause/resume/close/sync/row/cut/xid; i1/i2 carry the event's
    * scalar args; the table-fact columns describe a row event's table.
    * `rb` adds count(orders) to `rows` so counts stay data-anchored. */
  final case class VEv(step: Int, t: Long, ev: String, i1: Long = 0,
      i2: Long = 0, tbl: String = "", trk: Int = 1, vis: Int = 3,
      bcols: Int = 3, evpk: Int = 1, curpk: Int = 1, rows: Int = 0,
      rb: Int = 0, filt: Int = 0, ident: Int = 0, fails: Int = 0)

  /** (scenario, mode∈{fast,full}?, has-syncer?, row-error-delay ms,
    * meta-flush-interval ms, steps). */
  val vScripts: Seq[(String, Int, Int, Long, Long, Seq[VEv])] = Seq(
    // the headline independence property: pause/resume of the SUBTASK
    // leaves the validator Running (rows keep counting), `validation
    // stop/start` flips only the validator (start = full reset), and
    // subtask close discards the handle → stage reads InvalidStage and a
    // later `validation start` finds no subtask
    ("indep", 1, 1, 1000000L, 1000000L, Seq(
      VEv(1, 0, "run", i1 = 2, i2 = 2),
      VEv(2, 10, "row", tbl = "t1", i1 = 0, rows = 2),
      VEv(3, 20, "pause"),
      VEv(4, 30, "row", tbl = "t1", i1 = 1, rows = 1, rb = 1),
      VEv(5, 40, "resume"),
      VEv(6, 50, "vstop"),
      VEv(7, 60, "row", tbl = "t1", i1 = 0, rows = 5),
      VEv(8, 70, "vstart", i1 = 2),
      VEv(9, 80, "row", tbl = "t1", i1 = 2, rows = 3),
      VEv(10, 90, "row", tbl = "t1", i1 = 1, rows = 2, ident = 1),
      VEv(11, 100, "close"),
      VEv(12, 110, "vstart", i1 = 2))),
    // Start's guard chain: expect=Stopped creates the handle but leaves
    // it Stopped (observably ≠ InvalidStage); init failure → error result
    // + Stopped; double-start no-ops; a cancellation error is filtered
    // while a real error stops the validator and is collected
    ("guards", 1, 1, 1000000L, 1000000L, Seq(
      VEv(1, 0, "vstart", i1 = 4),
      VEv(2, 10, "vstart", i1 = 2, fails = 1),
      VEv(3, 20, "vstart", i1 = 2),
      VEv(4, 30, "vstart", i1 = 2),
      VEv(5, 40, "verror", i1 = 1),
      VEv(6, 50, "verror", i1 = 0),
      VEv(7, 60, "vstop"),
      VEv(8, 70, "vstart", i1 = 2),
      VEv(9, 80, "verror", i1 = 0))),
    // mode=none: no validator object is ever created — neither with the
    // subtask (expect=InvalidStage from getExpectValidatorStage) nor by a
    // later explicit start (StartValidator's mode guard)
    ("mode_none", 0, 1, 1000000L, 1000000L, Seq(
      VEv(1, 0, "vstart", i1 = 2),
      VEv(2, 10, "run", i1 = 2, i2 = 0),
      VEv(3, 20, "vstart", i1 = 2))),
    // a subtask without a syncer unit cannot host a validator
    ("no_syncer", 1, 0, 1000000L, 1000000L, Seq(
      VEv(1, 0, "run", i1 = 2, i2 = 2),
      VEv(2, 10, "vstart", i1 = 2))),
    // per-table stage machine: first row event registers Running; each
    // stop reason is sticky until the next validator start resets the
    // map; a filtered event registers NOTHING (filter check precedes the
    // status lookup)
    ("tables", 1, 1, 1000000L, 1000000L, Seq(
      VEv(1, 0, "run", i1 = 2, i2 = 2),
      VEv(2, 10, "row", tbl = "t2", filt = 1, rows = 9),
      VEv(3, 20, "row", tbl = "t1", i1 = 0, rows = 4),
      VEv(4, 30, "row", tbl = "t2", trk = 0, i1 = 0, rows = 7),
      VEv(5, 40, "row", tbl = "t2", i1 = 0, rows = 7),
      VEv(6, 50, "row", tbl = "t1", vis = 2, bcols = 3, i1 = 0, rows = 1),
      VEv(7, 60, "row", tbl = "t1", i1 = 0, rows = 8),
      VEv(8, 70, "vstop"),
      VEv(9, 80, "vstart", i1 = 2),
      VEv(10, 90, "row", tbl = "t1", evpk = 0, curpk = 1, i1 = 0, rows = 1),
      VEv(11, 100, "row", tbl = "t2", evpk = 0, curpk = 0, i1 = 2, rows = 1))),
    // markErrorStarted: progress-reaches-syncer OR the row-error delay;
    // reset on restart
    ("marker", 1, 1, 1000L, 1000000L, Seq(
      VEv(1, 0, "run", i1 = 2, i2 = 2),
      VEv(2, 100, "sync", i1 = 5, i2 = 10),
      VEv(3, 200, "sync", i1 = 7, i2 = 7),
      VEv(4, 300, "vstop"),
      VEv(5, 400, "vstart", i1 = 2),
      VEv(6, 500, "row", tbl = "t1", i1 = 0, rows = 1),
      VEv(7, 1400, "row", tbl = "t1", i1 = 0, rows = 1),
      VEv(8, 1450, "sync", i1 = 1, i2 = 100))),
    // flush cadence on txn boundaries: interval-elapsed OR cut-over
    // reached (which clears the cut-over); keeps flushing while the
    // subtask is paused
    ("flush", 1, 1, 1000000L, 500L, Seq(
      VEv(1, 0, "run", i1 = 2, i2 = 2),
      VEv(2, 100, "xid", i1 = 10),
      VEv(3, 150, "nerr", rows = 3, rb = 1),
      VEv(4, 700, "xid", i1 = 20),
      VEv(5, 900, "xid", i1 = 30),
      VEv(6, 905, "nerr", rows = 4),
      VEv(7, 910, "cut", i1 = 25),
      VEv(8, 950, "xid", i1 = 24),
      VEv(9, 980, "xid", i1 = 26),
      VEv(10, 1000, "xid", i1 = 40),
      VEv(11, 1010, "pause"),
      VEv(12, 1600, "xid", i1 = 50))))

  private def vCfgValues: String =
    vScripts.map { case (sc, mok, syn, delay, flushiv, _) =>
      s"(${sqlStr(sc)}, $mok, $syn, $delay, $flushiv)"
    }.mkString(", ")

  private def vScriptValues: String =
    vScripts.flatMap { case (sc, _, _, _, _, steps) =>
      steps.map { e =>
        s"(${sqlStr(sc)}, ${e.step}, ${e.t}, ${sqlStr(e.ev)}, ${e.i1}, " +
          s"${e.i2}, ${sqlStr(e.tbl)}, ${e.trk}, ${e.vis}, ${e.bcols}, " +
          s"${e.evpk}, ${e.curpk}, ${e.rows}, ${e.rb}, ${e.filt}, " +
          s"${e.ident}, ${e.fails})"
      }
    }.mkString(",\n")

  /**
   * q285 — DM validator STAGE ORCHESTRATION
   * ([[graft.streaming.ValidatorLifecycle]],
   * dm/syncer/data_validator.go:148-385 + dm/worker/subtask.go:247-281):
   * seven scripted scenarios × every observable per step — validator
   * stage as the subtask reads it (InvalidStage while no handle exists),
   * subtask stage, markErrorStarted, collected errors, the three
   * processed-row counters, flush count/location, both tables' validate
   * status, and the dispatched-job count. The oracle re-steps the
   * identical machine as a recursive CTE: the Start guard chain, the
   * reset-on-start clears, pause-independence, the sticky per-table stop
   * classification (decision order of genValidateTableInfo), the
   * identity-update split, and the interval-or-cut-over flush rule.
   */
  val validatorStage = GateQuery(
    "q285_validator_stage",
    Some(s"""WITH RECURSIVE b AS (
      |  SELECT CAST(count(*) AS BIGINT) AS base FROM orders
      |), cfg(sc, mok, syn, delay, flushiv) AS (VALUES $vCfgValues),
      |vals(sc, step, t, ev, i1, i2, tbl, trk, vis, bcols, evpk, curpk,
      |     rows, rb, filt, ident, fails) AS (VALUES
      |$vScriptValues
      |), script AS (
      |  SELECT v.*, CASE WHEN v.rb = 1 THEN b.base + v.rows
      |              ELSE CAST(v.rows AS BIGINT) END AS nrows
      |  FROM vals v, b
      |), st AS (
      |  SELECT sc, 0 AS step, 0 AS cl, 0 AS created, 4 AS vst, 1 AS sub,
      |    0 AS mark, 0 AS errs, CAST(0 AS BIGINT) AS start_t,
      |    CAST(0 AS BIGINT) AS lastf, CAST(NULL AS BIGINT) AS cut,
      |    CAST(NULL AS BIGINT) AS floc, 0 AS flushes,
      |    CAST(0 AS BIGINT) AS ins, CAST(0 AS BIGINT) AS upd,
      |    CAST(0 AS BIGINT) AS del, '' AS t1st, '' AS t1msg,
      |    '' AS t2st, '' AS t2msg, CAST(0 AS BIGINT) AS disp,
      |    CAST(0 AS BIGINT) AS nerr
      |  FROM cfg
      |  UNION ALL
      |  SELECT sc, estep,
      |    CASE WHEN closing THEN 1 ELSE cl END,
      |    CASE WHEN closing THEN 0
      |         WHEN startable THEN 1 ELSE created END,
      |    CASE WHEN closing THEN 4
      |         WHEN begins AND fails = 0 THEN 2
      |         WHEN begins THEN 4
      |         WHEN ev = 'vstop' AND active THEN 4
      |         WHEN ev = 'verror' AND active AND i1 = 0 THEN 4
      |         ELSE vst END,
      |    CASE WHEN ev = 'run' AND cl = 0 AND sub NOT IN (2, 5)
      |           THEN CAST(i1 AS INT)
      |         WHEN ev = 'pause' AND sub = 2 THEN 3
      |         WHEN ev = 'resume' AND sub = 3 THEN 2
      |         WHEN closing THEN 4 ELSE sub END,
      |    CASE WHEN begins THEN 0
      |         WHEN active AND ev IN ('sync', 'row', 'xid')
      |           AND (mark = 1 OR t - start_t >= delay
      |                OR (ev = 'sync' AND i1 >= i2)) THEN 1
      |         ELSE mark END,
      |    CASE WHEN begins THEN fails
      |         WHEN ev = 'verror' AND active AND i1 = 0 THEN errs + 1
      |         ELSE errs END,
      |    CASE WHEN begins AND fails = 0 THEN t ELSE start_t END,
      |    CASE WHEN begins AND fails = 0 THEN t
      |         WHEN flush_now THEN t ELSE lastf END,
      |    CASE WHEN ev = 'cut' AND created = 1 THEN CAST(i1 AS BIGINT)
      |         WHEN need_cut THEN NULL ELSE cut END,
      |    CASE WHEN flush_now THEN CAST(i1 AS BIGINT) ELSE floc END,
      |    flushes + (CASE WHEN flush_now THEN 1 ELSE 0 END),
      |    (CASE WHEN begins THEN 0 ELSE ins END) +
      |      (CASE WHEN counted AND (i1 = 0 OR splits) THEN nrows
      |            ELSE 0 END),
      |    (CASE WHEN begins THEN 0 ELSE upd END) +
      |      (CASE WHEN counted AND i1 = 1 AND NOT splits THEN nrows
      |            ELSE 0 END),
      |    (CASE WHEN begins THEN 0 ELSE del END) +
      |      (CASE WHEN counted AND (i1 = 2 OR splits) THEN nrows
      |            ELSE 0 END),
      |    CASE WHEN begins THEN ''
      |         WHEN row_live AND tbl = 't1' AND t1st <> 'S'
      |           THEN (CASE WHEN msg IS NULL THEN 'R' ELSE 'S' END)
      |         ELSE t1st END,
      |    CASE WHEN begins THEN ''
      |         WHEN row_live AND tbl = 't1' AND t1st <> 'S'
      |           THEN coalesce(msg, '') ELSE t1msg END,
      |    CASE WHEN begins THEN ''
      |         WHEN row_live AND tbl = 't2' AND t2st <> 'S'
      |           THEN (CASE WHEN msg IS NULL THEN 'R' ELSE 'S' END)
      |         ELSE t2st END,
      |    CASE WHEN begins THEN ''
      |         WHEN row_live AND tbl = 't2' AND t2st <> 'S'
      |           THEN coalesce(msg, '') ELSE t2msg END,
      |    CASE WHEN counted
      |           THEN nrows * (CASE WHEN splits THEN 2 ELSE 1 END)
      |         ELSE CAST(0 AS BIGINT) END,
      |    CASE WHEN begins THEN 0
      |         WHEN flush_now THEN 0
      |         WHEN ev = 'nerr' AND created = 1 THEN nerr + nrows
      |         ELSE nerr END
      |  FROM (
      |    SELECT *,
      |      (ev = 'row' AND active AND filt = 0
      |        AND (CASE WHEN tbl = 't1' THEN t1st ELSE t2st END) <> 'S')
      |        AS row_live,
      |      (ev = 'row' AND active AND filt = 0
      |        AND (CASE WHEN tbl = 't1' THEN t1st ELSE t2st END) <> 'S'
      |        AND msg IS NULL) AS counted,
      |      (ev = 'row' AND active AND filt = 0
      |        AND (CASE WHEN tbl = 't1' THEN t1st ELSE t2st END) <> 'S'
      |        AND msg IS NULL AND i1 = 1 AND ident = 1) AS splits,
      |      (active AND ev = 'xid'
      |        AND (t - lastf > flushiv
      |             OR (cut IS NOT NULL AND cut <= i1))) AS flush_now,
      |      (active AND ev = 'xid' AND cut IS NOT NULL AND cut <= i1)
      |        AS need_cut
      |    FROM (
      |      SELECT s.sc, e.step AS estep, e.t, e.ev, e.i1, e.i2, e.tbl,
      |        e.filt, e.ident, e.fails, e.nrows,
      |        c.delay, c.flushiv,
      |        s.cl, s.created, s.vst, s.sub, s.mark, s.errs, s.start_t,
      |        s.lastf, s.cut, s.floc, s.flushes, s.ins, s.upd, s.del,
      |        s.t1st, s.t1msg, s.t2st, s.t2msg, s.nerr,
      |        CASE WHEN e.trk = 0 THEN 'table is not synced or dropped'
      |             WHEN e.vis < e.bcols
      |               THEN 'binlog has more columns than current table'
      |             WHEN e.evpk = 0 AND e.curpk = 1 THEN
      |        'primary key column of downstream table out of range of binlog event row'
      |             WHEN e.evpk = 0 THEN 'no primary key'
      |             ELSE NULL END AS msg,
      |        (s.created = 1 AND s.vst = 2) AS active,
      |        (e.ev = 'close' AND s.sub NOT IN (4, 5)) AS closing,
      |        ((e.ev = 'vstart' OR (e.ev = 'run' AND s.sub NOT IN (2, 5)))
      |          AND s.cl = 0 AND c.mok = 1 AND c.syn = 1
      |          AND (CASE WHEN e.ev = 'run' THEN e.i2 ELSE e.i1 END) <> 0)
      |          AS startable,
      |        ((e.ev = 'vstart' OR (e.ev = 'run' AND s.sub NOT IN (2, 5)))
      |          AND s.cl = 0 AND c.mok = 1 AND c.syn = 1
      |          AND (CASE WHEN e.ev = 'run' THEN e.i2 ELSE e.i1 END) = 2
      |          AND NOT (s.created = 1 AND s.vst = 2)) AS begins
      |      FROM st s
      |      JOIN script e ON e.sc = s.sc AND e.step = s.step + 1
      |      JOIN cfg c ON c.sc = s.sc
      |    ) l1
      |  ) l2
      |)
      |SELECT sc, step,
      |  CASE WHEN created = 1 THEN vst ELSE 0 END AS stage,
      |  sub, mark, errs, ins, upd, del, flushes, floc,
      |  t1st AS t1_stage, t1msg AS t1_msg, t2st AS t2_stage,
      |  t2msg AS t2_msg, disp, nerr
      |FROM st WHERE step > 0""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.ValidatorLifecycle
    import graft.streaming.ValidatorLifecycle._
    val base = Tables.load(spark, dir, "orders").count()
    val rows = vScripts.flatMap { case (sc, mok, syn, delay, flushiv, steps) =>
      val m = new ValidatorLifecycle(
        mode = if (mok == 1) ModeFast else ModeNone,
        hasSyncer = syn == 1,
        rowErrorDelayMs = delay, metaFlushIntervalMs = flushiv)
      steps.map { e =>
        val nrows = if (e.rb == 1) (base + e.rows).toInt else e.rows
        val disp: Long = e.ev match {
          case "run" =>
            m.subtaskRun(e.i1.toInt, e.i2.toInt, e.t); 0L
          case "vstart" =>
            m.startValidator(e.i1.toInt, e.t, initFails = e.fails == 1); 0L
          case "vstop" => m.stopValidator(); 0L
          case "verror" => m.validatorError(contextCancelled = e.i1 == 1); 0L
          case "pause" => m.subtaskPause(); 0L
          case "resume" => m.subtaskResume(); 0L
          case "close" => m.subtaskClose(); 0L
          case "sync" => m.observeProgress(e.i1, e.i2, e.t); 0L
          case "cut" => m.setCutOver(e.i1); 0L
          case "xid" => m.txnBoundary(e.i1, e.t); 0L
          case "nerr" => m.addNewErrorRows(nrows); 0L
          case "row" =>
            m.rowsEvent(e.tbl, s"target_${e.tbl}",
              TableFacts(e.trk == 1, e.vis, e.bcols, e.evpk == 1,
                e.curpk == 1),
              e.i1.toInt, nrows, e.t, filtered = e.filt == 1,
              identityUpdated = e.ident == 1).toLong
        }
        def tst(n: String): (String, String) =
          m.tableStatuses().find(_.source == n)
            .map(s => (if (s.stage == Running) "R" else "S", s.message))
            .getOrElse(("", ""))
        val (t1s, t1m) = tst("t1"); val (t2s, t2m) = tst("t2")
        val (ins, upd, del) = m.processedRowCounts
        (sc, e.step, m.stage, m.subtaskView,
          if (m.isMarkErrorStarted) 1 else 0, m.errorCount, ins, upd, del,
          m.flushes, m.lastFlushedLoc, t1s, t1m, t2s, t2m, disp,
          m.newErrorRowCount)
      }
    }
    rows.toDF("sc", "step", "stage", "sub", "mark", "errs", "ins", "upd",
      "del", "flushes", "floc", "t1_stage", "t1_msg", "t2_stage", "t2_msg",
      "disp", "nerr")
  }

  // ---------------------------------------------------------------------
  // q290 — task-checker auto-resume
  // ---------------------------------------------------------------------

  /** One (task, round) status cell: present=0 means the task vanished
    * from the worker's status map that round (tracking drops). */
  final case class TEv(task: String, round: Int, now: Long,
      present: Int = 1, stage: Int = 3, hasres: Int = 1, canc: Int = 0,
      code: Long = 0, msg: String = "", raw: String = "", dispOk: Int = 1)

  // gate-sized backoff: min 1 s, max 8 s, rollback 5 s, factor 2
  private val TcMin = 1000L
  private val TcMax = 8000L
  private val TcRb = 5000L

  private val tcRounds: Seq[(Int, Long)] = Seq(
    1 -> 0L, 2 -> 6000L, 3 -> 7000L, 4 -> 13000L, 5 -> 26000L,
    6 -> 40000L, 7 -> 46000L, 8 -> 52000L)

  /** The task×round grid. Times are shared per round (tcRounds). */
  val tcGrid: Seq[TEv] = {
    def at(r: Int) = tcRounds.find(_._1 == r).get._2
    val running = (1 to 8).map(r => TEv("run", r, at(r), stage = 2))
    val manual = (1 to 8).map(r => TEv("manual", r, at(r), canc = 1))
    // skip → dispatch ladder up to the max window, then Running rounds
    // long enough apart to roll the backoff back twice
    val flaky = Seq(
      TEv("flaky", 1, at(1)), TEv("flaky", 2, at(2)), TEv("flaky", 3, at(3)),
      TEv("flaky", 4, at(4)), TEv("flaky", 5, at(5)), TEv("flaky", 6, at(6)),
      TEv("flaky", 7, at(7), stage = 2), TEv("flaky", 8, at(8), stage = 2))
    val noddl = (1 to 3).map(r => TEv("noddl", r, at(r),
      raw = "ERROR 1059: identifier too long"))
    val relayparse = (1 to 2).map(r => TEv("relayparse", r, at(r),
      code = 11038L, msg = "x: get event err EOF"))
    val relayok = (1 to 2).map(r => TEv("relayok", r, at(r),
      code = 11038L, msg = "transient read timeout"))
    val light = (1 to 2).map(r => TEv("light", r, at(r),
      code = 34019L, raw = "Table t1 is in mode Import"))
    val lightbad = (1 to 2).map(r => TEv("lightbad", r, at(r),
      code = 34019L, raw = "disk full"))
    val wrongseq = (1 to 2).map(r => TEv("wrongseq", r, at(r), code = 36008L))
    // vanish + return = fresh tracking (the first sighting Skips again)
    val ghost = Seq(TEv("ghost", 1, at(1)), TEv("ghost", 2, at(2)),
      TEv("ghost", 3, at(3), present = 0), TEv("ghost", 4, at(4)),
      TEv("ghost", 5, at(5)))
    // a failed dispatch neither stamps the resume time nor forwards
    val dfail = Seq(TEv("dfail", 1, at(1)), TEv("dfail", 2, at(2), dispOk = 0),
      TEv("dfail", 3, at(3)))
    running ++ manual ++ flaky ++ noddl ++ relayparse ++ relayok ++
      light ++ lightbad ++ wrongseq ++ ghost ++ dfail
  }

  /** Relay check cells: (round, now, enabled, stage, hasres, canc, code,
    * dispOk). Round 1 has relay disabled — no check at all. */
  val tcRelay: Seq[(Int, Long, Int, Int, Int, Int, Long, Int)] = Seq(
    (1, 0L, 0, 3, 1, 0, 0L, 1),
    (2, 6000L, 1, 3, 1, 0, 30001L, 1),
    (3, 7000L, 1, 3, 1, 0, 0L, 1),
    (4, 7500L, 1, 3, 1, 0, 0L, 1),
    (5, 26000L, 1, 3, 1, 0, 0L, 1))

  private def tcGridValues: String =
    tcGrid.map(e => s"(${sqlStr(e.task)}, ${e.round}, ${e.now}, " +
      s"${e.present}, ${e.stage}, ${e.hasres}, ${e.canc}, ${e.code}, " +
      s"${sqlStr(e.msg)}, ${sqlStr(e.raw)}, ${e.dispOk})").mkString(",\n")

  private def tcMsgValues: String = {
    import graft.streaming.TaskChecker._
    (UnsupportedDdlMsgs.map(("raw", _)) ++ UnsupportedDmlMsgs.map(("raw", _)) ++
      ReplicationErrMsgs.map(("raw", _)) ++
      ParseRelayLogErrMsgs.map(("parse", _)))
      .map { case (k, m) => s"(${sqlStr(k)}, ${sqlStr(m.toLowerCase)})" }
      .mkString(", ")
  }

  /**
   * q290 — TASK-CHECKER AUTO-RESUME ([[graft.streaming.TaskChecker]],
   * dm/worker/task_checker.go + dm/unit/unit.go IsResumableError +
   * dm/pkg/backoff): a task×round grid through the checker — the four
   * strategies, the un-resumable classifier (message tables, code set,
   * the relay-log-parse gate on ErrParserParseRelayLog, the
   * lightning-runtime carve-outs), the congestion-window backoff
   * (first-sighting Skip, skip→dispatch ladder, boundary stop at max,
   * rollback after quiet Ignore rounds), vanished-task re-tracking, the
   * failed-dispatch no-op, and the relay slot with ITS code set. The
   * oracle re-steps each task's state machine as a per-task recursive
   * CTE over the same grid.
   */
  val taskChecker = GateQuery(
    "q290_task_checker",
    Some(s"""WITH RECURSIVE grid(task, round, now, present, stage, hasres,
      |  canc, code, msg, raw, disp_ok) AS (VALUES
      |$tcGridValues
      |), msgs(kind, m) AS (VALUES $tcMsgValues),
      |cls AS (
      |  SELECT g.*,
      |    (g.present = 1 AND g.stage = 3 AND g.hasres = 1 AND g.canc = 0)
      |      AS pausederr,
      |    (EXISTS (SELECT 1 FROM msgs WHERE kind = 'raw'
      |              AND contains(lower(g.raw), m))
      |     OR (g.code = 11038 AND EXISTS (SELECT 1 FROM msgs
      |          WHERE kind = 'parse' AND contains(lower(g.msg), m)))
      |     OR g.code IN (36008, 32004, 32001, 36027, 11129, 34020, 34021)
      |     OR (g.code = 34019 AND NOT (contains(lower(g.raw), 'doesn''t exist')
      |          OR contains(lower(g.raw), 'is in mode import'))))
      |      AS unres
      |  FROM grid g
      |), st AS (
      |  SELECT DISTINCT task, 0 AS round, 0 AS alive, 0 AS cwnd,
      |    CAST(0 AS BIGINT) AS lpt, CAST(0 AS BIGINT) AS lrt,
      |    0 AS strat, 0 AS disp
      |  FROM grid
      |  UNION ALL
      |  SELECT task, cround,
      |    CASE WHEN present = 0 THEN 0 ELSE 1 END,
      |    CASE WHEN present = 0 THEN 0
      |         WHEN strat1 = 4 AND disp_ok = 1
      |              AND least($TcMax, $TcMin * (1 << cwnd1)) < $TcMax
      |           THEN cwnd1 + 1
      |         WHEN strat1 = 1 AND now - lpt1 > $TcRb
      |           THEN greatest(0, cwnd1 - 1)
      |         ELSE cwnd1 END,
      |    CASE WHEN present = 0 THEN 0
      |         WHEN strat1 = 1 AND now - lpt1 > $TcRb THEN now
      |         WHEN strat1 = 1 THEN lpt1
      |         ELSE now END,
      |    CASE WHEN present = 0 THEN 0
      |         WHEN strat1 = 4 AND disp_ok = 1 THEN now
      |         ELSE lrt1 END,
      |    strat1,
      |    CASE WHEN strat1 = 4 AND disp_ok = 1 THEN 1 ELSE 0 END
      |  FROM (
      |    SELECT s.task, c.round AS cround, c.now, c.present, c.disp_ok,
      |      -- a fresh (or re-tracked) task initializes its clocks to now
      |      CASE WHEN s.alive = 0 THEN 0 ELSE s.cwnd END AS cwnd1,
      |      CASE WHEN s.alive = 0 THEN c.now ELSE s.lpt END AS lpt1,
      |      CASE WHEN s.alive = 0 THEN c.now ELSE s.lrt END AS lrt1,
      |      CASE WHEN NOT c.pausederr THEN 1
      |           WHEN c.unres THEN 3
      |           WHEN c.now - (CASE WHEN s.alive = 0 THEN c.now ELSE s.lrt END)
      |                < least($TcMax, $TcMin *
      |                    (1 << (CASE WHEN s.alive = 0 THEN 0 ELSE s.cwnd END)))
      |             THEN 2
      |           ELSE 4 END AS strat1
      |    FROM st s JOIN cls c ON c.task = s.task AND c.round = s.round + 1
      |  ) l1
      |)
      |SELECT task, CAST(round AS BIGINT) AS round, 'task' AS kind,
      |  strat, disp, cwnd,
      |  least($TcMax, $TcMin * (1 << cwnd)) AS cur
      |FROM st s WHERE round > 0
      |  AND EXISTS (SELECT 1 FROM grid g WHERE g.task = s.task
      |              AND g.round = s.round AND g.present = 1)
      |UNION ALL
      |SELECT 'tracked', CAST(round AS BIGINT), 'sum',
      |  0, 0, CAST(count(*) AS INT), CAST(count(*) AS BIGINT)
      |FROM grid WHERE present = 1 GROUP BY round
      |UNION ALL
      |SELECT 'relay', CAST(r.round AS BIGINT), 'relay', r.strat, r.disp,
      |  r.cwnd, least($TcMax, $TcMin * (1 << r.cwnd))
      |FROM (
      |  WITH RECURSIVE rg(round, now, enabled, stage, hasres, canc, code,
      |    disp_ok) AS (VALUES ${tcRelay.map(t =>
           s"(${t._1}, ${t._2}, ${t._3}, ${t._4}, ${t._5}, ${t._6}, ${t._7}, ${t._8})")
           .mkString(", ")}),
      |  rst AS (
      |    SELECT 0 AS round, 0 AS init, 0 AS cwnd, CAST(0 AS BIGINT) AS lpt,
      |      CAST(0 AS BIGINT) AS lrt, 0 AS strat, 0 AS disp, 0 AS checked
      |    UNION ALL
      |    SELECT cround,
      |      CASE WHEN enabled = 0 THEN init ELSE 1 END,
      |      CASE WHEN enabled = 0 THEN cwnd
      |           WHEN strat1 = 4 AND disp_ok = 1
      |                AND least($TcMax, $TcMin * (1 << cwnd1)) < $TcMax
      |             THEN cwnd1 + 1
      |           WHEN strat1 = 1 AND now - lpt1 > $TcRb
      |             THEN greatest(0, cwnd1 - 1)
      |           ELSE cwnd1 END,
      |      CASE WHEN enabled = 0 THEN lpt
      |           WHEN strat1 = 1 AND now - lpt1 > $TcRb THEN now
      |           WHEN strat1 = 1 THEN lpt1 ELSE now END,
      |      CASE WHEN enabled = 0 THEN lrt
      |           WHEN strat1 = 4 AND disp_ok = 1 THEN now ELSE lrt1 END,
      |      CASE WHEN enabled = 0 THEN 0 ELSE strat1 END,
      |      CASE WHEN enabled = 1 AND strat1 = 4 AND disp_ok = 1
      |        THEN 1 ELSE 0 END,
      |      enabled
      |    FROM (
      |      SELECT s.*, g.round AS cround, g.now, g.enabled, g.disp_ok,
      |        CASE WHEN s.init = 0 THEN 0 ELSE s.cwnd END AS cwnd1,
      |        CASE WHEN s.init = 0 THEN g.now ELSE s.lpt END AS lpt1,
      |        CASE WHEN s.init = 0 THEN g.now ELSE s.lrt END AS lrt1,
      |        CASE WHEN NOT (g.stage = 3 AND g.hasres = 1 AND g.canc = 0)
      |               THEN 1
      |             WHEN g.code IN (30001, 30002, 30004, 30005, 30008)
      |               THEN 3
      |             WHEN g.now - (CASE WHEN s.init = 0 THEN g.now ELSE s.lrt END)
      |                  < least($TcMax, $TcMin *
      |                      (1 << (CASE WHEN s.init = 0 THEN 0 ELSE s.cwnd END)))
      |               THEN 2
      |             ELSE 4 END AS strat1
      |      FROM rst s JOIN rg g ON g.round = s.round + 1
      |    ) rl1
      |  )
      |  SELECT * FROM rst WHERE round > 0 AND checked = 1
      |) r""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.TaskChecker
    import graft.streaming.TaskChecker.{UnitStatus, ProcessError}
    val m = new TaskChecker(2.0, TcMin, TcMax, TcRb)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, String, Int, Int, Int, Long)]
    for ((round, now) <- tcRounds) {
      val cells = tcGrid.filter(e => e.round == round && e.present == 1)
      val statuses = cells.map { e =>
        val errs = if (e.code == 0 && e.msg.isEmpty && e.raw.isEmpty) Seq.empty
          else Seq(ProcessError(e.code, e.msg, e.raw))
        e.task -> UnitStatus(e.stage, e.hasres == 1, e.canc == 1, errs)
      }
      val dispOkByTask = cells.map(e => e.task -> (e.dispOk == 1)).toMap
      val res = m.checkTaskStatus(statuses, now, dispOkByTask)
      res.foreach { case (task, strat, disp) =>
        val (cwnd, cur) = m.backoffOf(task).get
        rows += ((task, round.toLong, "task", strat, if (disp) 1 else 0,
          cwnd, cur))
      }
      rows += (("tracked", round.toLong, "sum", 0, 0, m.trackedTasks.size,
        m.trackedTasks.size.toLong))
      tcRelay.find(_._1 == round).foreach {
        case (_, rnow, enabled, stage, hasres, canc, code, dispOk) =>
          if (enabled == 1) {
            val errs = if (code == 0) Seq.empty
              else Seq(ProcessError(code, "", ""))
            val (strat, disp) = m.checkRelayStatus(
              UnitStatus(stage, hasres == 1, canc == 1, errs), rnow,
              () => dispOk == 1)
            val (cwnd, cur) = m.relayBackoff.get
            rows += (("relay", round.toLong, "relay", strat,
              if (disp) 1 else 0, cwnd, cur))
          }
      }
    }
    rows.toSeq.toDF("task", "round", "kind", "strat", "disp", "cwnd", "cur")
  }

  // ---------------------------------------------------------------------
  // q291 — query-status task-stage aggregation
  // ---------------------------------------------------------------------

  /** One response subtask row in arrival order; relay = -1 means the
    * source has no relay, relayErr flags a relay process error. */
  final case class QRow(ord: Int, source: String, task: String, stage: Int,
      unit: Int, hasErr: Int = 0, relay: Int = -1, relayErr: Int = 0)

  val qRows: Seq[QRow] = Seq(
    // ta: uniform Running → Running
    QRow(1, "s1", "ta", 2, 4), QRow(2, "s2", "ta", 2, 4, relay = 2),
    // tb: all Finished → Finished; tc: Finished + Running differ → Running
    QRow(3, "s1", "tb", 5, 4), QRow(4, "s2", "tb", 5, 4),
    QRow(5, "s1", "tc", 5, 4), QRow(6, "s2", "tc", 2, 4),
    // td: Paused (no error) latches below Error across later Running
    QRow(7, "s1", "td", 2, 4), QRow(8, "s2", "td", 3, 4),
    QRow(9, "s3", "td", 2, 4),
    // te: Paused WITH error → Error latch over everything after
    QRow(10, "s1", "te", 3, 4, hasErr = 1), QRow(11, "s2", "te", 2, 4),
    // tf: Running Sync on a Paused relay → relay error verdict
    QRow(12, "s1", "tf", 2, 4, relay = 3), QRow(13, "s2", "tf", 2, 4),
    // tg: relay Stopped AND erroring → "Relay status is Error"
    QRow(14, "s1", "tg", 2, 4, relay = 4, relayErr = 1),
    // th: a LOAD unit ignores the paused relay → Running
    QRow(15, "s1", "th", 2, 3, relay = 3),
    // ti/tj: uniform New / Stopped verdicts
    QRow(16, "s1", "ti", 1, 4), QRow(17, "s2", "ti", 1, 4),
    QRow(18, "s1", "tj", 4, 4), QRow(19, "s2", "tj", 4, 4),
    // tk: New then Paused-no-error → Paused (the OR leg of case 5)
    QRow(20, "s1", "tk", 1, 4), QRow(21, "s2", "tk", 3, 4))

  /** shouldWrap cases: (id, respResult, allSourcesTrue, nameFilter,
    * srcFilter, more) → expected collapse. */
  val qWrapCases: Seq[(Long, Boolean, Boolean, String, Int, Boolean)] = Seq(
    (1L, true, true, "", 0, false),
    (2L, false, true, "", 0, false),
    (3L, true, true, "t1", 0, false),
    (4L, true, true, "", 1, false),
    (5L, true, true, "", 0, true),
    (6L, true, false, "", 0, false))

  private def qRowValues: String =
    qRows.map { r =>
      val rn = qRows.filter(x => x.task == r.task && x.ord <= r.ord).size
      s"(${r.ord}, $rn, ${sqlStr(r.source)}, ${sqlStr(r.task)}, " +
        s"${r.stage}, ${r.unit}, ${r.hasErr}, ${r.relay}, ${r.relayErr})"
    }.mkString(",\n")

  /**
   * q291 — `dmctl query-status` TASK-STAGE AGGREGATION
   * ([[graft.streaming.QueryStatus]], dm/ctl/master/query_status.go:
   * 100-172): the order-dependent fold that collapses per-source subtask
   * stages into one task verdict — Error latches (subtask-error and
   * running-Sync-on-paused/stopped-relay legs, with the relay's own
   * stage reading Error when it carries a process error), Paused latches
   * below Error, the first row seeds, a differing later stage degrades
   * to Running — plus the rendered "Please run `query-status ...`"
   * suffix and the wrapper-applies gate. The oracle re-folds each task
   * as a per-task recursive CTE over the same rows.
   */
  val queryStatus = GateQuery(
    "q291_query_status",
    Some(s"""WITH RECURSIVE rows0(ord, rn, source, task, stage, unit,
      |  haserr, relay, relayerr) AS (VALUES
      |$qRowValues
      |), stn(id, nm) AS (VALUES (1, 'New'), (2, 'Running'), (3, 'Paused'),
      |  (4, 'Stopped'), (5, 'Finished')),
      |st AS (
      |  SELECT DISTINCT task, 0 AS rn, '' AS cur FROM rows0
      |  UNION ALL
      |  SELECT task, crn,
      |    CASE WHEN cur LIKE 'Error%' THEN cur
      |         WHEN stage = 3 AND haserr = 1
      |           THEN 'Error - Some error occurred in subtask'
      |         WHEN unit = 4 AND stage = 2 AND relay IN (3, 4)
      |           THEN 'Error - Relay status is ' ||
      |             (CASE WHEN relayerr = 1 THEN 'Error'
      |                   ELSE (SELECT nm FROM stn WHERE id = relay) END)
      |         WHEN cur = 'Paused' THEN cur
      |         WHEN cur = '' OR stage = 3
      |           THEN (SELECT nm FROM stn WHERE id = stage)
      |         WHEN cur <> (SELECT nm FROM stn WHERE id = stage)
      |           THEN 'Running'
      |         ELSE cur END
      |  FROM (
      |    SELECT s.task, r.rn AS crn, r.stage, r.unit, r.haserr, r.relay,
      |      r.relayerr, s.cur
      |    FROM st s JOIN rows0 r ON r.task = s.task AND r.rn = s.rn + 1
      |  ) l1
      |), fin AS (
      |  SELECT s.task, s.cur,
      |    (SELECT string_agg(source, ',' ORDER BY ord) FROM rows0 r
      |     WHERE r.task = s.task) AS sources
      |  FROM st s
      |  WHERE s.rn = (SELECT max(rn) FROM rows0 r WHERE r.task = s.task)
      |)
      |SELECT 'task' AS kind, task AS name,
      |  CASE WHEN cur LIKE 'Error%'
      |       THEN cur || '. Please run `query-status ' || task ||
      |            '` to get more details.'
      |       ELSE cur END AS status,
      |  sources, CAST(0 AS INT) AS wrap
      |FROM fin
      |UNION ALL
      |SELECT 'wrap', CAST(id AS VARCHAR), '', '',
      |  CAST(CASE WHEN rr AND alltrue AND nf = '' AND sf = 0 AND NOT more
      |       THEN 1 ELSE 0 END AS INT)
      |FROM (VALUES ${qWrapCases.map(c =>
         s"(${c._1}, ${c._2}, ${c._3}, ${sqlStr(c._4)}, ${c._5}, ${c._6})")
         .mkString(", ")}) w(id, rr, alltrue, nf, sf, more)""".stripMargin)) {
    (spark, dir) =>
    import spark.implicits._
    import graft.streaming.QueryStatus
    val rows = qRows.map(r => QueryStatus.SubTaskRow(r.source, r.task,
      r.stage, r.unit, r.hasErr == 1,
      if (r.relay < 0) None else Some((r.relay, r.relayErr == 1))))
    val taskRows = QueryStatus.wrapTaskResult(rows).map {
      case (task, status, srcs) =>
        ("task", task, status, srcs.mkString(","), 0)
    }
    val wrapRows = qWrapCases.map { case (id, rr, alltrue, nf, sf, more) =>
      val w = QueryStatus.shouldWrap(rr,
        if (alltrue) Seq(true, true) else Seq(true, false),
        nf, if (sf == 0) Seq.empty else Seq("s1"), more)
      ("wrap", id.toString, "", "", if (w) 1 else 0)
    }
    (taskRows ++ wrapRows).toDF("kind", "name", "status", "sources", "wrap")
  }

  val all: Seq[GateQuery] =
    Seq(feedState, gcSafepoint, versionGate, serverOptions, creatorFix,
      ddlRepair, whereHandle, rmUnused, ddlDispatch, binlogPos,
      replicationSet, tableSchedulers, keySpanSplit, advanceCheckpoint,
      captureManager, coordinatorRound, captureAgent, validatorStage,
      taskChecker, queryStatus)
}
