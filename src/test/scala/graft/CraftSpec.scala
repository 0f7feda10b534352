package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CraftCodec
import graft.functions.CraftCodec._

/**
 * Craft frame fidelity. The resolved-ts golden bytes are HAND-DERIVED from
 * the format rules (version uvarint · columnar headers with zigzag deltas ·
 * absent empty dictionary · size tables · trailing reversed uvarint), so
 * the codec can't self-certify its own layout.
 */
class CraftSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // Array[Byte] compares by reference inside case classes — canonicalize
  // values to Seq for structural comparison
  private def canon(evs: Seq[Event]) = evs.map(e =>
    (e.ts, e.ty, e.partition, e.schema, e.table, e.ddl,
      e.groups.map(g => (g.ty,
        g.cols.map(c => (c.name, c.tpe, c.flags, c.value.map(_.toSeq)))))))

  test("resolved-ts message golden bytes") {
    // version 01 | headers: ts=5→05, ty=3→03, partition=-1→zigzag 01,
    // schema dictId=-1→01, table dictId=-1→01 | no body | no dict |
    // size tables: meta [5,0]→02 0a 09, body [0]→01 00 | reversed len 05
    val msg = encodeMessage(Seq(Event(5L, MsgResolved, -1L, None, None)))
    assert(hex(msg) === "010503010101" + "020a090100" + "05")
    val Seq(ev) = decodeMessage(msg)
    assert(ev.ts === 5L && ev.ty === MsgResolved && ev.partition === -1L)
    assert(ev.schema.isEmpty && ev.table.isEmpty)
  }

  test("varint value codec edges") {
    for (v <- Seq(0L, 1L, -1L, 127L, -128L, 300L, Long.MaxValue, Long.MinValue))
      assert(decodeLong(longValue(v)) === v)
    for (d <- Seq(0.0, -2.25, 1.5e300, java.lang.Double.MIN_VALUE))
      assert(decodeDouble(doubleValue(d)) === d)
  }

  test("row batch round-trips with dictionary sharing and null values") {
    def img(ty: Int, pk: Long, v: Option[Double]) = Group(ty, Seq(
      Col("pk", TypeLonglong, FlagHandleKey, Some(longValue(pk))),
      Col("val", TypeDouble, 0L, v.map(doubleValue)),
      Col("etype", TypeVarchar, 0L, Some(stringValue("click")))))
    val events = Seq(
      Event(100L, MsgRow, -1L, Some("db"), Some("t"),
        Seq(img(GroupNew, 1L, Some(1.5)))),
      Event(101L, MsgRow, -1L, Some("db"), Some("t"),
        Seq(img(GroupOld, 2L, Some(2.5)), img(GroupNew, 2L, None))),
      Event(99L, MsgRow, -1L, Some("db"), Some("t"),
        Seq(img(GroupOld, 3L, None))))
    val decoded = decodeMessage(encodeMessage(events))
    assert(canon(decoded) === canon(events))
    // the five distinct terms (db, t, pk, val, etype) are stored once: a
    // second identical event adds only its body + header deltas, strictly
    // less than the first message which also carries the dictionary
    val one = encodeMessage(events.take(1)).length
    val two = encodeMessage(Seq(events(0), events(0))).length
    assert(two - one < one, s"dictionary not shared: $one -> $two")
  }

  test("ddl message round-trips") {
    val ev = Event(777L, MsgDdl, -1L, Some("db"), None,
      ddl = Some((5L, "ALTER TABLE t ADD COLUMN c INT")))
    assert(decodeMessage(encodeMessage(Seq(ev))) === Seq(ev))
  }

  test("MsgRow with empty groups does not desync later row events") {
    val empty = Event(10L, MsgRow, -1L, Some("db"), Some("t"), Seq.empty)
    val real = Event(11L, MsgRow, -1L, Some("db"), Some("t"),
      Seq(Group(GroupNew, Seq(Col("pk", TypeLonglong, FlagHandleKey,
        Some(longValue(7L)))))))
    // the empty-group event must still contribute a group-size table, or
    // decode reads `real`'s groups against the wrong table
    val decoded = decodeMessage(encodeMessage(Seq(empty, real)))
    assert(canon(decoded) === canon(Seq(empty, real)))
  }

  test("mixed batch keeps per-event body boundaries") {
    val row = Event(10L, MsgRow, 0L, Some("s"), Some("t"),
      Seq(Group(GroupNew, Seq(Col("pk", TypeLonglong, FlagHandleKey,
        Some(longValue(42L)))))))
    val resolved = Event(11L, MsgResolved, -1L, None, None)
    val decoded = decodeMessage(encodeMessage(Seq(row, resolved)))
    assert(canon(decoded) === canon(Seq(row, resolved)))
  }
}
