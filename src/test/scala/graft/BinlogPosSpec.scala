package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.BinlogPos
import graft.streaming.BinlogPos.{Filename, Position}

/** Binlog position algebra: randomized round trips and ordering laws. */
class BinlogPosSpec extends AnyFunSuite {

  test("construct/parse and suffix add/strip round-trip on 300 random names") {
    val rnd = new scala.util.Random(1414L)
    for (_ <- 0 until 300) {
      val base = Seq.fill(1 + rnd.nextInt(8))(
        "abmy-sqlbin_".charAt(rnd.nextInt(12))).mkString
      val seq = f"${1 + rnd.nextInt(999999)}%06d"
      val name = BinlogPos.constructFilename(base, seq)
      val parsed = BinlogPos.parseFilename(name)
      assert(parsed == Right(Filename(base, seq, seq.toLong)))

      // add a relay suffix, then RealMySQLPos must strip it back exactly
      val sfx = BinlogPos.suffixIntToStr(1 + rnd.nextInt(999))
      val suffixed = BinlogPos.withUuidSuffix(parsed.toOption.get, sfx)
      val pos = rnd.nextInt(1 << 30).toLong
      val (real, err) = BinlogPos.realMySQLPos(Position(suffixed, pos))
      assert(err.isEmpty && real == Position(name, pos), suffixed)
      // and ExtractSuffix recovers the suffix
      assert(BinlogPos.extractSuffix(suffixed) == Right(sfx.toInt))
      assert(BinlogPos.extractSuffix(name) == Right(1))

      // ExtractPos against a relay-dir list containing the suffix
      val uuids = Seq("uuid-a." + BinlogPos.suffixIntToStr(1),
        "uuid-b." + sfx)
      BinlogPos.extractPos(Position(suffixed, pos), uuids) match {
        case Right((uuid, s, real2)) =>
          assert(s == sfx && real2 == Position(name, pos))
          assert(uuid == (if (sfx == "000001") "uuid-a." + sfx
            else "uuid-b." + sfx))
        case Left(e) => fail(e)
      }
    }
  }

  test("compare is a total order on random positions (with the raw quirk)") {
    val rnd = new scala.util.Random(1415L)
    def gen(): Position = {
      val base = "mysql-bin"
      val seq = f"${1 + rnd.nextInt(6)}%06d"
      val name =
        if (rnd.nextBoolean()) s"$base.$seq"
        else s"$base|${BinlogPos.suffixIntToStr(1 + rnd.nextInt(3))}.$seq"
      Position(name, rnd.nextInt(4).toLong)
    }
    for (_ <- 0 until 500) {
      val (a, b, c) = (gen(), gen(), gen())
      assert(BinlogPos.compare(a, a) == 0)
      assert(BinlogPos.compare(a, b) == -BinlogPos.compare(b, a))
      // transitivity within each comparison regime: both-suffixed pairs
      // compare raw, so restrict the law to triples in ONE regime
      def suffixed(p: Position) = p.name.contains('|')
      if (suffixed(a) == suffixed(b) && suffixed(b) == suffixed(c)) {
        if (BinlogPos.compare(a, b) <= 0 && BinlogPos.compare(b, c) <= 0)
          assert(BinlogPos.compare(a, c) <= 0, s"$a $b $c")
      }
    }
  }

  test("a suffixed position equals its plain form under compare") {
    val p = Position("mysql-bin|000007.000042", 99)
    val plain = Position("mysql-bin.000042", 99)
    assert(BinlogPos.compare(p, plain) == 0)
    // but TWO suffixed positions order by the raw (suffix-bearing) name,
    // so a later relay dir sorts after an earlier one at the same seq
    val earlier = Position("mysql-bin|000001.000042", 99)
    assert(BinlogPos.compare(p, earlier) > 0)
  }
}
