package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.FeedStateMachine
import graft.streaming.FeedStateMachine.RunningError

/**
 * FeedStateMachine vs an INDEPENDENT functional simulator (a third
 * implementation besides the machine and q252's recursive-CTE oracle):
 * random traces with random configs, including the reference's 0.1
 * randomization factor driven by a shared seeded draw sequence, nil-status
 * ticks, and the buffered error/warning semantics (errors reported while
 * stopped are drained by the next normal tick, exactly like the Go
 * orchestrator state). Plus the direct HandleError legs the tick never
 * reaches.
 */
class FeedStateSpec extends AnyFunSuite {

  // ---- the independent simulator: a pure fold ---------------------------

  private case class Ev(t: Long, adm: Option[(String, Option[Long])],
      errs: Seq[(String, String)], warns: Seq[String],
      sck: Option[Long], rts: Long)

  private case class SimState(
      st: String = "", rm: Boolean = false, retrying: Boolean = false,
      bo: Long, cur: Long, boStart: Long, lretT: Long = 0L,
      lretC: Long = 0L, lwarnC: Long = 0L,
      ck: Long = 0L, adv: Long = 0L, rts: Long = 0L,
      errBuf: Vector[(String, String)] = Vector.empty,
      warnBuf: Vector[String] = Vector.empty)

  private case class SimOut(st: String, run: Boolean, rm: Boolean,
      pend: Boolean, retrying: Boolean, bo: Long, bump: Boolean,
      err: String, warn: String, ovw: Option[Long])

  private val FastFail = Set("CDC:ErrGCTTLExceeded",
    "CDC:ErrSnapshotLostByGC", "CDC:ErrStartTsBeforeGC")
  private val Unretry = FeedStateMachine.UnretryableCodes

  private def fatal(code: String, msg: String): Boolean =
    FastFail.contains(code) || Unretry.exists((msg + code).contains)

  private def draw(factor: Double, rnd: () => Double, cur: Long): Long =
    if (factor == 0) cur
    else {
      val d = factor * cur.toDouble
      val lo = cur.toDouble - d
      val hi = cur.toDouble + d
      (lo + rnd() * (hi - lo + 1)).toLong
    }

  private def incr(cur: Long): Long =
    if (cur.toDouble >= 600000.0 / 2.0) 600000L else (cur.toDouble * 2).toLong

  /** reset + the immediately-consumed NextBackOff (resetErrRetry). */
  private def resetConsume(t: Long, stuck: Long, factor: Double,
      rnd: () => Double): (Long, Long, Long, Long) = {
    val nxt = draw(factor, rnd, 10000L)
    val bo = if (stuck != 0 && nxt > stuck) -1L else nxt
    (bo, incr(10000L), t, 0L)
  }

  private def simTick(stuck: Long, factor: Double, rnd: () => Double,
      s0: SimState, e: Ev): (SimState, SimOut) = {
    var s = s0.copy(errBuf = s0.errBuf ++ e.errs,
      warnBuf = s0.warnBuf ++ e.warns)
    // init marks + checkpoint tracking (status non-nil only)
    e.sck.foreach { sck =>
      if (s.lretC == 0L) s = s.copy(lretC = sck, lwarnC = sck)
      var (ck, adv, rts) = (s.ck, s.adv, s.rts)
      if (ck < sck) { ck = sck; adv = e.t }
      if (rts < e.rts) rts = e.rts
      if (ck >= rts) adv = e.t
      s = s.copy(ck = ck, adv = adv, rts = rts)
    }

    def out(run: Boolean, pend: Boolean, bump: Boolean, err: String = "",
        warn: String = "", ovw: Option[Long] = None): (SimState, SimOut) = {
      val cleaned = if (!run) s.copy(ck = 0, adv = 0, rts = 0) else s
      (cleaned, SimOut(cleaned.st, run, cleaned.rm, pend, cleaned.retrying,
        cleaned.bo, bump, err, warn, ovw))
    }

    // admin pop (one job per trace step by construction)
    val admHandled: Option[(SimState, SimOut)] = e.adm.flatMap {
      case ("stop", _) if Set("normal", "warning", "pending").contains(s.st) =>
        s = s.copy(st = "stopped"); Some(out(run = false, pend = true,
          bump = true))
      case ("remove", _) =>
        s = s.copy(rm = true); Some(out(run = false, pend = true,
          bump = false))
      case ("resume", ovw)
          if Set("failed", "stopped", "finished").contains(s.st) =>
        val (bo, cur, st0, lt) = resetConsume(e.t, stuck, factor, rnd)
        s = s.copy(st = "normal", retrying = false, bo = bo, cur = cur,
          boStart = st0, lretT = lt)
        Some(out(run = true, pend = true, bump = false, ovw = ovw))
      case ("finish", _) if Set("normal", "warning").contains(s.st) =>
        s = s.copy(st = "finished"); Some(out(run = false, pend = true,
          bump = true))
      case _ => None // illegal job: consumed, tick continues
    }
    admHandled.getOrElse {
      s.st match {
        case "" =>
          s = s.copy(st = "normal"); out(run = true, pend = false,
            bump = false)
        case "removed" =>
          s = s.copy(rm = true); out(run = false, pend = false, bump = false)
        case "stopped" | "failed" | "finished" =>
          out(run = false, pend = false, bump = false)
        case "pending" =>
          if (e.t - s.lretT < s.bo) out(run = false, pend = false,
            bump = false)
          else {
            val nxt = draw(factor, rnd, s.cur)
            val cur2 = incr(s.cur)
            if (stuck != 0 && (e.t - s.boStart) + nxt > stuck) {
              s = s.copy(st = "failed", bo = -1L, cur = cur2)
              out(run = false, pend = false, bump = true)
            } else {
              s = s.copy(st = "warning", bo = nxt, cur = cur2, lretT = e.t,
                lretC = e.sck.getOrElse(s.lretC))
              out(run = true, pend = false, bump = false)
            }
          }
        case "normal" | "warning" =>
          // checkAndChangeState
          e.sck.foreach { sck =>
            if (s.st == "warning" && sck > s.lretC && sck > s.lwarnC)
              s = s.copy(st = "normal", retrying = false)
          }
          val errs = s.errBuf; s = s.copy(errBuf = Vector.empty)
          if (errs.nonEmpty) {
            errs.find { case (c, m) => fatal(c, m) } match {
              case Some((c, _)) =>
                s = s.copy(st = "failed")
                out(run = false, pend = false, bump = true, err = c)
              case None =>
                val (c, _) = errs.last
                val reset = !s.retrying
                if (reset) {
                  val (bo, cur, st0, lt) =
                    resetConsume(e.t, stuck, factor, rnd)
                  s = s.copy(bo = bo, cur = cur, boStart = st0, lretT = lt)
                }
                s = s.copy(st = "pending", retrying = true)
                out(run = false, pend = false, bump = true, err = c)
            }
          } else if (s.warnBuf.nonEmpty) {
            val wlast = s.warnBuf.last; s = s.copy(warnBuf = Vector.empty)
            val stuckNow = e.sck.isDefined && {
              s = s.copy(lwarnC = e.sck.get)
              e.t - s.adv > stuck
            }
            if (stuckNow) {
              s = s.copy(st = "failed")
              out(run = false, pend = false, bump = true,
                err = "CDC:ErrChangefeedUnretryable")
            } else {
              s = s.copy(st = "warning")
              out(run = true, pend = false, bump = false, warn = wlast)
            }
          } else out(run = true, pend = false, bump = false)
      }
    }
  }

  // ---- randomized trace property ----------------------------------------

  test("machine equals the independent simulator on 200 random traces") {
    val rnd = new scala.util.Random(1401L)
    for (trial <- 0 until 200) {
      val stuck = 5000L + rnd.nextInt(200000)
      val factor = if (trial % 2 == 0) 0.0 else 0.1
      val seed = rnd.nextLong()
      val mRand = new scala.util.Random(seed)
      val sRand = new scala.util.Random(seed)
      val nSteps = 15 + rnd.nextInt(25)
      var t = 1000000L
      var ck = 100000L
      val evs = Seq.fill(nSteps) {
        t += 5000L * (1 + rnd.nextInt(12))
        val adm =
          if (rnd.nextInt(100) < 15)
            Some((rnd.nextInt(100) match {
              case x if x < 30 => "stop"
              case x if x < 65 => "resume"
              case x if x < 95 => "finish"
              case _ => "remove"
            }, if (rnd.nextBoolean()) Some(ck + 7) else None))
          else None
        val errs =
          if (rnd.nextInt(100) < 25) Seq(rnd.nextInt(10) match {
            case 0 => ("CDC:ErrSnapshotLostByGC", "")
            case 1 => ("CDC:ErrProcessorUnknown",
              "wrapped CDC:ErrKafkaInvalidConfig text")
            case _ => ("CDC:ErrProcessorUnknown", "dial fail")
          })
          else Seq.empty
        val warns =
          if (rnd.nextInt(100) < 25) Seq("CDC:ErrSinkManagerRunError")
          else Seq.empty
        if (rnd.nextInt(100) < 40)
          ck += (if (rnd.nextInt(100) < 15) 20L else 1L + rnd.nextInt(3))
        val sck = if (rnd.nextInt(100) < 5) None else Some(ck)
        val rts = ck + (if (rnd.nextBoolean()) 0L else rnd.nextInt(100).toLong)
        Ev(t, adm, errs, warns, sck, rts)
      }

      var now = evs.head.t
      val m = new FeedStateMachine(stuck, () => now,
        () => mRand.nextDouble(), factor)
      // simulator's construction-time consumed backoff
      val (bo0, cur0, st0, lt0) =
        resetConsume(evs.head.t, stuck, factor, () => sRand.nextDouble())
      var sim = SimState(bo = bo0, cur = cur0, boStart = st0, lretT = lt0)

      evs.zipWithIndex.foreach { case (e, i) =>
        now = e.t
        e.adm.foreach { case (j, ovw) =>
          if (j == "finish") m.markFinished() else m.pushAdminJob(j, ovw)
        }
        e.errs.foreach { case (c, msg) =>
          m.reportErrors(RunningError(c, msg))
        }
        e.warns.foreach(w => m.reportWarnings(RunningError(w)))
        val r = m.tick(e.rts, e.sck)
        val (sim2, o) = simTick(stuck, factor,
          () => sRand.nextDouble(), sim, e)
        sim = sim2
        val got = (r.state, r.shouldRunning, r.shouldRemoved,
          r.adminJobPending, r.isRetrying, r.backoffMs, r.epochBumped,
          r.errorSet, r.warningSet, r.resumedOverwriteTs)
        val want = (o.st, o.run, o.rm, o.pend, o.retrying, o.bo, o.bump,
          o.err, o.warn, o.ovw)
        assert(got == want,
          s"trial=$trial step=$i stuck=$stuck factor=$factor ev=$e")
      }
    }
  }

  // ---- three-way agreement: the q252 gate scripts through the sim --------

  test("the q252 scripted scenarios agree with the independent simulator") {
    import graft.queries.LifecycleQueries
    val base = 1000L // any anchor: the machine only compares checkpoints
    LifecycleQueries.scripts.foreach { case (sc, stuck, steps) =>
      var now = steps.head.t
      val m = new FeedStateMachine(stuck, () => now)
      val (bo0, cur0, st0, lt0) = resetConsume(steps.head.t, stuck, 0.0,
        () => 0.0)
      var sim = SimState(bo = bo0, cur = cur0, boStart = st0, lretT = lt0)
      steps.foreach { e =>
        now = e.t
        if (e.adm != null) {
          if (e.adm == "finish") m.markFinished()
          else m.pushAdminJob(e.adm, e.ovw.map(base + _))
        }
        if (e.code != null) m.reportErrors(RunningError(e.code, e.msg))
        if (e.warn) m.reportWarnings(RunningError("W"))
        val r = m.tick(base + e.r, Some(base + e.k))
        val ev = Ev(e.t,
          Option(e.adm).map(a => (a, e.ovw.map(base + _))),
          if (e.code != null) Seq((e.code, e.msg)) else Nil,
          if (e.warn) Seq("W") else Nil,
          Some(base + e.k), base + e.r)
        val (sim2, o) = simTick(stuck, 0.0, () => 0.0, sim, ev)
        sim = sim2
        assert((r.state, r.shouldRunning, r.shouldRemoved,
          r.adminJobPending, r.backoffMs, r.epochBumped) ==
          (o.st, o.run, o.rm, o.pend, o.bo, o.bump),
          s"scenario=$sc step=${e.step}")
      }
    }
  }

  // ---- direct HandleError legs the tick never reaches --------------------

  test("direct HandleError: a stopped feed ignores generic errors but still fast-fails") {
    var now = 1000000L
    val m = new FeedStateMachine(300000L, () => now)
    m.tick(10L, Some(5L)) // '' -> normal
    m.pushAdminJob("stop")
    now += 5000; m.tick(10L, Some(5L))
    assert(m.state == "stopped")
    m.handleError(RunningError("CDC:ErrProcessorUnknown", "x"))
    assert(m.state == "stopped") // generic error ignored while stopped
    m.handleError(RunningError("CDC:ErrGCTTLExceeded"))
    assert(m.state == "failed") // stopped -> failed IS allowed
  }

  test("direct HandleError: fatal scan sees every error; last non-nil wins otherwise") {
    var now = 2000000L
    val m = new FeedStateMachine(300000L, () => now)
    m.tick(10L, Some(5L))
    // a fatal error anywhere in the batch wins over a later generic one
    m.handleError(RunningError("CDC:ErrStartTsBeforeGC"),
      RunningError("CDC:ErrProcessorUnknown", "later"))
    assert(m.state == "failed")
    assert(m.lastError.map(_.code).contains("CDC:ErrStartTsBeforeGC"))

    var now2 = 3000000L
    val m2 = new FeedStateMachine(300000L, () => now2)
    m2.tick(10L, Some(5L))
    m2.handleError(RunningError("CDC:ErrA", "a"), RunningError("CDC:ErrB", "b"))
    assert(m2.state == "pending")
    assert(m2.lastError.map(_.code).contains("CDC:ErrB"))
  }

  test("dynamic stuck-duration update lands on admin-pending ticks") {
    var now = 4000000L
    val m = new FeedStateMachine(50000L, () => now)
    m.tick(10L, Some(5L))
    m.updateStuckDuration(400000L)
    // picked up only on an admin-pending tick (the Go re-reads the config
    // there) — a plain tick leaves MaxElapsedTime alone
    m.reportErrors(RunningError("CDC:ErrProcessorUnknown", "x"))
    now += 5000; m.tick(10L, Some(5L))
    assert(m.state == "pending")
    m.pushAdminJob("stop")
    now += 5000; m.tick(10L, Some(5L)) // admin tick applies the new budget
    m.pushAdminJob("resume")
    now += 5000; m.tick(10L, Some(5L))
    assert(m.state == "normal")
    m.reportErrors(RunningError("CDC:ErrProcessorUnknown", "x"))
    now += 5000; m.tick(10L, Some(5L))
    // with the 400 s budget a retry 100 s out survives (the old 50 s
    // budget would have failed it)
    now += 100000; val r = m.tick(10L, Some(5L))
    assert(r.state == "warning" && r.shouldRunning)
  }
}
