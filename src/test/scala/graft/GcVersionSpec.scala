package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GcSafepoint, VersionGate}
import graft.core.GcSafepoint.GcState
import graft.core.VersionGate.SemVer

/** Randomized replays of the GC-safepoint kernel and ordering laws of the
  * version gate's semver comparator. */
class GcVersionSpec extends AnyFunSuite {

  test("tryUpdate equals a direct rule replay on 300 random states") {
    val rnd = new scala.util.Random(1402L)
    for (_ <- 0 until 300) {
      val now = 10000000L + rnd.nextInt(1000000)
      val st = GcState(
        lastUpdatedMs = now - rnd.nextInt(200000),
        lastSucceededMs = now - rnd.nextInt(400000),
        lastSafePointTs = rnd.nextInt(1000).toLong,
        isTiCDCBlockGC = rnd.nextBoolean())
      val ttl = 1L + rnd.nextInt(300)
      val ck = 100000L + rnd.nextInt(1000)
      val force = rnd.nextBoolean()
      val pd: Either[String, Long] =
        if (rnd.nextBoolean()) Left("pd down")
        else Right(ck + rnd.nextInt(100) - 50)
      val (st2, r) = GcSafepoint.tryUpdate(st, now, ttl, ck, force, pd)

      // independent replay
      if (now - st.lastUpdatedMs < 60000 && !force) {
        assert(r.status == "skipped" && st2 == st)
      } else pd match {
        case Left(_) =>
          assert(st2.lastUpdatedMs == now)
          assert(st2.lastSucceededMs == st.lastSucceededMs)
          if (now - st.lastSucceededMs >= ttl * 1000)
            assert(r.status == "failed-error" &&
              r.err == "CDC:ErrUpdateServiceSafepointFailed")
          else assert(r.status == "failed-warn" &&
            r.warnings == Seq("update-gc-safepoint-failed"))
        case Right(actual) =>
          assert(r.status == "updated")
          assert(st2.isTiCDCBlockGC == (actual == ck))
          assert(st2.lastSafePointTs == actual)
          assert(st2.lastSucceededMs == now)
          assert(r.warnings.nonEmpty == (actual > ck))
      }
    }
  }

  test("checkStale classification and TSO physical extraction") {
    val rnd = new scala.util.Random(1403L)
    for (_ <- 0 until 300) {
      val physMs = 1000000L + rnd.nextInt(10000000)
      val logical = rnd.nextInt(1 << 18).toLong
      val ts = GcSafepoint.composeTs(physMs, logical)
      assert(GcSafepoint.physicalMs(ts) == physMs)

      val pdNow = physMs + rnd.nextInt(400000) - 100000
      val ttl = 1L + rnd.nextInt(200)
      val sp = ts + rnd.nextInt(200) - 100
      val block = rnd.nextBoolean()
      val got = GcSafepoint.checkStale(block, ttl, pdNow, sp, ts)
      val want =
        if (block) {
          if (pdNow - GcSafepoint.physicalMs(ts - 1) > ttl * 1000)
            "CDC:ErrGCTTLExceeded"
          else ""
        } else if (ts - 1 < sp) "CDC:ErrSnapshotLostByGC"
        else ""
      assert(got == want, s"phys=$physMs log=$logical block=$block")
    }
  }

  test("semver: the spec's canonical precedence chain holds") {
    val chain = Seq("1.0.0-alpha", "1.0.0-alpha.1", "1.0.0-alpha.beta",
      "1.0.0-beta", "1.0.0-beta.2", "1.0.0-beta.11", "1.0.0-rc.1", "1.0.0")
      .map(v => VersionGate.parse(v).toOption.get)
    chain.sliding(2).foreach { case Seq(a, b) =>
      assert(a.compare(b) < 0, s"${a.render} !< ${b.render}")
      assert(b.compare(a) > 0)
    }
  }

  test("semver: comparator is a total order on 400 random triples") {
    val rnd = new scala.util.Random(1404L)
    val pres = Seq("", "alpha", "beta", "rc", "1", "12", "alpha.1",
      "alpha.beta", "1.2", "rc.1.x")
    def gen(): SemVer = SemVer(rnd.nextInt(4).toLong, rnd.nextInt(4).toLong,
      rnd.nextInt(4).toLong, pres(rnd.nextInt(pres.size)), "")
    for (_ <- 0 until 400) {
      val (a, b, c) = (gen(), gen(), gen())
      assert(a.compare(b) == -b.compare(a))
      assert(a.compare(a) == 0)
      if (a.compare(b) <= 0 && b.compare(c) <= 0)
        assert(a.compare(c) <= 0, s"${a.render} ${b.render} ${c.render}")
    }
  }

  test("sanitize strips hash/fips/dirty and survives round trips") {
    val rnd = new scala.util.Random(1405L)
    val pres = Seq("", "alpha", "rc.1")
    for (_ <- 0 until 200) {
      val v = SemVer(rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
        rnd.nextInt(12).toLong, pres(rnd.nextInt(pres.size)), "")
      val decorated = Seq(
        "v" + v.render,
        "v" + v.render + s"-${1 + rnd.nextInt(40)}-gabcdef0",
        "v" + v.render + s"-${1 + rnd.nextInt(40)}-g0123456789abcdef-dev",
        "v" + v.render + "-fips",
        "v" + v.render + "-dirty")
      decorated.foreach { d =>
        assert(VersionGate.sanitize(d) == v.render, d)
      }
    }
  }

  test("cluster version fold is order-independent and min-seeking") {
    val rnd = new scala.util.Random(1406L)
    for (_ <- 0 until 200) {
      val vs = Seq.fill(1 + rnd.nextInt(5))(
        s"${rnd.nextInt(9)}.${rnd.nextInt(9)}.${rnd.nextInt(9)}" +
          (if (rnd.nextBoolean()) "-alpha" else ""))
      val a = VersionGate.clusterVersion(vs)
      val b = VersionGate.clusterVersion(rnd.shuffle(vs))
      assert(a == b)
      val minV = a.toOption.flatten.get
      assert(vs.forall(v =>
        VersionGate.parse(v).toOption.get.compare(minV) >= 0))
    }
    // the empty capture version defaults to 4.0.1 in the fold
    assert(VersionGate.clusterVersion(Seq("6.1.0", ""))
      .toOption.flatten.map(_.render).contains("4.0.1"))
    // LessThan500RC keeps the reference's inverted quirk (check.go:246-250)
    assert(VersionGate.lessThan500RC(None))
    assert(VersionGate.lessThan500RC(
      VersionGate.parse("5.0.0").toOption))
    assert(!VersionGate.lessThan500RC(
      VersionGate.parse("4.0.9").toOption))
  }
}
