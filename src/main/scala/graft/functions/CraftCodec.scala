package graft.functions

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/**
 * E8 — Craft binary codec, tiflow's columnar batch wire format
 * (pkg/sink/codec/craft: message_encoder.go:120-326 layout,
 * message_decoder.go:53-160 frame walk, model.go:150-420 headers / column
 * groups / term dictionary). WRITING Craft remains a non-goal for the
 * engine (Tungsten/parquet fill that role on Spark); this implementation
 * exists so Craft STREAMS CAN BE READ — the gap a user migrating off the
 * reference actually hits — with the encoder present to round-trip-test
 * the decoder.
 *
 * Frame layout (version 1), re-derived from the reference's behavior:
 *
 *   uvarint version
 *   headers, columnar with delta compression:
 *     delta-uvarint ts[] · uvarint type[] · delta-varint partition[]
 *     delta-varint dictId(schema)[] · delta-varint dictId(table)[]
 *   body: per event, its column groups:
 *     byte groupType · uvarint nCols · delta-varint dictId(name)[]
 *     uvarint colType[] · uvarint colFlag[] ·
 *     nullable-bytes chunk (varint lens, -1=null, then concatenated bytes)
 *   term dictionary: uvarint nTerms + string chunk (ABSENT when empty)
 *   size tables (uvarint len + delta-varint values each):
 *     [0] meta = [headerSize, termDictSize]
 *     [1] bodySize per event
 *     [2..] per-event column-group sizes
 *   REVERSED uvarint: total byte length of the size tables
 *
 * Varints are protobuf zigzag/LEB128; doubles are IEEE-754 little-endian
 * (message_encoder.go:27-30); value bytes use the TiDB type codes the open
 * protocol also uses (Longlong=8 varint, Double=5, Varchar=15 raw bytes).
 */
object CraftCodec {

  val Version1 = 1L
  // cdc/model/sink.go:43-52
  val MsgRow = 1; val MsgDdl = 2; val MsgResolved = 3
  // craft/model.go:30-31
  val GroupNew = 1; val GroupOld = 2
  // MySQL protocol type codes
  val TypeDouble = 5; val TypeLonglong = 8; val TypeVarchar = 15
  // cdc/model/sink.go:64-72
  val FlagBinary = 1L; val FlagHandleKey = 2L

  final case class Col(name: String, tpe: Int, flags: Long,
                       value: Option[Array[Byte]])
  final case class Group(ty: Int, cols: Seq[Col])
  /** One event in a batch message. Row events carry `groups`; a DDL event
    * carries (ddlType, query) in `ddl`; resolved events carry neither. */
  final case class Event(ts: Long, ty: Int, partition: Long,
                         schema: Option[String], table: Option[String],
                         groups: Seq[Group] = Nil,
                         ddl: Option[(Long, String)] = None)

  // ---- TiDB-type value helpers ----------------------------------------

  def longValue(v: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream(10); putVarint(o, v); o.toByteArray
  }
  def doubleValue(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }
  def stringValue(s: String): Array[Byte] = s.getBytes("UTF-8")

  def decodeLong(b: Array[Byte]): Long = readVarint(new Reader(b))
  def decodeDouble(b: Array[Byte]): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) { bits |= (b(i) & 0xffL) << (8 * i); i += 1 }
    java.lang.Double.longBitsToDouble(bits)
  }
  def decodeString(b: Array[Byte]): String = new String(b, "UTF-8")

  // ---- primitives ------------------------------------------------------

  private def putUvarint(o: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }
  private def putVarint(o: ByteArrayOutputStream, v: Long): Unit =
    putUvarint(o, (v << 1) ^ (v >> 63))

  /** MSB-group-first varint appended at the END of the frame — read
    * backwards from the last byte (message_encoder.go:50-66). */
  private def putUvarintReversed(o: ByteArrayOutputStream, v0: Long): Unit = {
    val groups = mutable.ArrayBuffer.empty[Int]
    var v = v0
    while ((v & ~0x7fL) != 0L) { groups += ((v & 0x7f) | 0x80).toInt; v >>>= 7 }
    groups += v.toInt
    groups.reverse.foreach(o.write)
  }

  private final class Reader(val bytes: Array[Byte], var pos: Int = 0) {
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def slice(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; r
    }
  }

  private def readUvarint(r: Reader): Long = {
    var x = 0L; var s = 0
    while (true) {
      val b = r.u8()
      if (b < 0x80) return x | (b.toLong << s)
      x |= (b & 0x7fL) << s
      s += 7
    }
    x
  }
  private def readVarint(r: Reader): Long = {
    val u = readUvarint(r)
    (u >>> 1) ^ -(u & 1L)
  }

  /** Read the reversed uvarint ending at `end` (exclusive); returns
    * (value, nBytes) — mirror of message_decoder.go:53-75. */
  private def readUvarintReversed(bytes: Array[Byte], end: Int): (Long, Int) = {
    var l = end - 1
    var x = 0L; var s = 0; var i = 0
    while (l >= 0) {
      val b = bytes(l) & 0xff
      if (b < 0x80) return (x | (b.toLong << s), i + 1)
      x |= (b & 0x7fL) << s
      s += 7; i += 1; l -= 1
    }
    (x, i)
  }

  private def putDeltaVarint(o: ByteArrayOutputStream, vs: Seq[Long]): Unit = {
    if (vs.isEmpty) return // zero-length table: count precedes, no payload
    putVarint(o, vs.head)
    vs.sliding(2).foreach {
      case Seq(a, b) => putVarint(o, b - a)
      case _ => ()
    }
  }
  private def putDeltaUvarint(o: ByteArrayOutputStream, vs: Seq[Long]): Unit = {
    putUvarint(o, vs.head)
    vs.sliding(2).foreach {
      case Seq(a, b) => putUvarint(o, b - a)
      case _ => ()
    }
  }
  private def readDeltaVarint(r: Reader, n: Int): Seq[Long] = {
    val out = new Array[Long](n)
    var last = 0L
    var i = 0
    while (i < n) {
      last = if (i == 0) readVarint(r) else last + readVarint(r)
      out(i) = last; i += 1
    }
    out.toSeq
  }
  private def readDeltaUvarint(r: Reader, n: Int): Seq[Long] = {
    val out = new Array[Long](n)
    var last = 0L
    var i = 0
    while (i < n) {
      last = if (i == 0) readUvarint(r) else last + readUvarint(r)
      out(i) = last; i += 1
    }
    out.toSeq
  }

  // ---- term dictionary -------------------------------------------------

  private final class Dict {
    private val ids = mutable.LinkedHashMap.empty[String, Int]
    def id(s: String): Long = ids.getOrElseUpdate(s, ids.size).toLong
    def idNullable(s: Option[String]): Long = s.map(id).getOrElse(-1L)
    def terms: Seq[String] = ids.keys.toSeq
  }

  // ---- encode ----------------------------------------------------------

  def encodeMessage(events: Seq[Event]): Array[Byte] = {
    require(events.nonEmpty, "craft message needs at least one event")
    val dict = new Dict
    val o = new ByteArrayOutputStream(1024)
    putUvarint(o, Version1)
    val headerStart = o.size()
    // headers, columnar
    putDeltaUvarint(o, events.map(_.ts))
    events.foreach(e => putUvarint(o, e.ty.toLong))
    putDeltaVarint(o, events.map(_.partition))
    putDeltaVarint(o, events.map(e => dict.idNullable(e.schema)))
    putDeltaVarint(o, events.map(e => dict.idNullable(e.table)))
    val headerSize = o.size() - headerStart
    // body
    val bodySizes = mutable.ArrayBuffer.empty[Long]
    val groupTables = mutable.ArrayBuffer.empty[Seq[Long]]
    events.foreach { e =>
      val bodyStart = o.size()
      e.ddl match {
        case Some((ddlType, query)) =>
          putUvarint(o, ddlType)
          val qb = query.getBytes("UTF-8")
          putUvarint(o, qb.length.toLong)
          o.write(qb, 0, qb.length)
        case None =>
          // decode consumes exactly one group-size table per MsgRow event,
          // so a row event must always contribute one — even when empty —
          // or groupTableIdx desyncs and corrupts every later row event.
          if (e.ty == MsgRow || e.groups.nonEmpty) {
            val sizes = e.groups.map { g =>
              val gStart = o.size()
              o.write(g.ty)
              putUvarint(o, g.cols.length.toLong)
              putDeltaVarint(o, g.cols.map(c => dict.id(c.name)))
              g.cols.foreach(c => putUvarint(o, c.tpe.toLong))
              g.cols.foreach(c => putUvarint(o, c.flags))
              g.cols.foreach(c => putVarint(o, c.value.map(_.length.toLong).getOrElse(-1L)))
              g.cols.foreach(_.value.foreach(v => o.write(v, 0, v.length)))
              (o.size() - gStart).toLong
            }
            groupTables += sizes
          }
      }
      bodySizes += (o.size() - bodyStart).toLong
    }
    // term dictionary (absent when empty — model.go:150-157)
    val dictStart = o.size()
    val terms = dict.terms
    if (terms.nonEmpty) {
      putUvarint(o, terms.length.toLong)
      terms.foreach(t => putUvarint(o, t.getBytes("UTF-8").length.toLong))
      terms.foreach { t => val b = t.getBytes("UTF-8"); o.write(b, 0, b.length) }
    }
    val dictSize = o.size() - dictStart
    // size tables + trailing reversed length
    val tablesStart = o.size()
    val tables = Seq(Seq(headerSize.toLong, dictSize.toLong), bodySizes.toSeq) ++
      groupTables
    tables.foreach { t =>
      putUvarint(o, t.length.toLong)
      putDeltaVarint(o, t)
    }
    putUvarintReversed(o, (o.size() - tablesStart).toLong)
    o.toByteArray
  }

  // ---- decode ----------------------------------------------------------

  def decodeMessage(bytes: Array[Byte]): Seq[Event] = {
    val head = new Reader(bytes)
    val version = readUvarint(head)
    require(version >= Version1, s"unexpected craft version $version")
    val afterVersion = head.pos
    // trailing size tables
    val (tablesSize, nRev) = readUvarintReversed(bytes, bytes.length)
    val tablesStart = bytes.length - nRev - tablesSize.toInt
    val tr = new Reader(bytes, tablesStart)
    val tables = mutable.ArrayBuffer.empty[Seq[Long]]
    while (tr.pos < bytes.length - nRev) {
      val n = readUvarint(tr).toInt
      tables += readDeltaVarint(tr, n)
    }
    val meta = tables(0)
    val bodySizes = tables(1)
    val n = bodySizes.length
    val headerSize = meta(0).toInt
    val dictSize = meta(1).toInt
    val bodyStart = afterVersion + headerSize
    // term dictionary sits after the body
    val dictStart = bodyStart + bodySizes.map(_.toInt).sum
    val dict: IndexedSeq[String] =
      if (dictSize == 0) IndexedSeq.empty
      else {
        val dr = new Reader(bytes, dictStart)
        val nTerms = readUvarint(dr).toInt
        val lens = (0 until nTerms).map(_ => readUvarint(dr).toInt)
        lens.map(l => new String(dr.slice(l), "UTF-8")).toIndexedSeq
      }
    def term(id: Long): Option[String] =
      if (id < 0) None else Some(dict(id.toInt))
    // headers
    val hr = new Reader(bytes, afterVersion)
    val ts = readDeltaUvarint(hr, n)
    val ty = (0 until n).map(_ => readUvarint(hr))
    val partition = readDeltaVarint(hr, n)
    val schema = readDeltaVarint(hr, n).map(term)
    val table = readDeltaVarint(hr, n).map(term)
    // bodies
    var offset = bodyStart
    var groupTableIdx = 2
    (0 until n).map { i =>
      val size = bodySizes(i).toInt
      val r = new Reader(bytes, offset)
      val ev = ty(i).toInt match {
        case MsgDdl =>
          val ddlType = readUvarint(r)
          val qLen = readUvarint(r).toInt
          val query = new String(r.slice(qLen), "UTF-8")
          Event(ts(i), MsgDdl, partition(i), schema(i), table(i),
            ddl = Some((ddlType, query)))
        case MsgRow =>
          val groupSizes = tables(groupTableIdx)
          groupTableIdx += 1
          val groups = groupSizes.map { _ =>
            val gty = r.u8()
            val nCols = readUvarint(r).toInt
            val names = readDeltaVarint(r, nCols).map(id => dict(id.toInt))
            val types = (0 until nCols).map(_ => readUvarint(r).toInt)
            val flags = (0 until nCols).map(_ => readUvarint(r))
            val lens = (0 until nCols).map(_ => readVarint(r))
            val values = lens.map(l => if (l < 0) None else Some(r.slice(l.toInt)))
            Group(gty, names.indices.map(c =>
              Col(names(c), types(c), flags(c), values(c))))
          }
          Event(ts(i), MsgRow, partition(i), schema(i), table(i), groups)
        case t =>
          Event(ts(i), t, partition(i), schema(i), table(i))
      }
      offset += size
      ev
    }
  }
}
