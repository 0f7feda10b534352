package graft

import graft.streaming.FeedStateMachine

/**
 * The INDEPENDENT feed-state simulator (a third implementation besides
 * FeedStateMachine and q252's recursive-CTE oracle) — a pure fold shared by
 * FeedStateSpec's 200-trace property and Round15Spec's 300-trial
 * admin-interleaving property.
 */
object FeedSim {

  // ---- the independent simulator: a pure fold ---------------------------

  final case class Ev(t: Long, adm: Option[(String, Option[Long])],
      errs: Seq[(String, String)], warns: Seq[String],
      sck: Option[Long], rts: Long)

  final case class SimState(
      st: String = "", rm: Boolean = false, retrying: Boolean = false,
      bo: Long, cur: Long, boStart: Long, lretT: Long = 0L,
      lretC: Long = 0L, lwarnC: Long = 0L,
      ck: Long = 0L, adv: Long = 0L, rts: Long = 0L,
      errBuf: Vector[(String, String)] = Vector.empty,
      warnBuf: Vector[String] = Vector.empty)

  final case class SimOut(st: String, run: Boolean, rm: Boolean,
      pend: Boolean, retrying: Boolean, bo: Long, bump: Boolean,
      err: String, warn: String, ovw: Option[Long])

  val FastFail = Set("CDC:ErrGCTTLExceeded",
    "CDC:ErrSnapshotLostByGC", "CDC:ErrStartTsBeforeGC")
  val Unretry = FeedStateMachine.UnretryableCodes

  def fatal(code: String, msg: String): Boolean =
    FastFail.contains(code) || Unretry.exists((msg + code).contains)

  def draw(factor: Double, rnd: () => Double, cur: Long): Long =
    if (factor == 0) cur
    else {
      val d = factor * cur.toDouble
      val lo = cur.toDouble - d
      val hi = cur.toDouble + d
      (lo + rnd() * (hi - lo + 1)).toLong
    }

  def incr(cur: Long): Long =
    if (cur.toDouble >= 600000.0 / 2.0) 600000L else (cur.toDouble * 2).toLong

  /** reset + the immediately-consumed NextBackOff (resetErrRetry). */
  def resetConsume(t: Long, stuck: Long, factor: Double,
      rnd: () => Double): (Long, Long, Long, Long) = {
    val nxt = draw(factor, rnd, 10000L)
    val bo = if (stuck != 0 && nxt > stuck) -1L else nxt
    (bo, incr(10000L), t, 0L)
  }

  def simTick(stuck: Long, factor: Double, rnd: () => Double,
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

}
