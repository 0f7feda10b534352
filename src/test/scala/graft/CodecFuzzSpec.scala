package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{AvroBinary, CraftCodec, OpenBatch}
import graft.functions.CraftCodec.{Col, Event, Group}

/** Randomized round trips over the hand-rolled binary codecs —
  * craft's columnar batch format (dictionary sharing, delta varints,
  * trailing size tables), open-protocol's length-framed batching, the
  * Confluent-framed Avro value/key, and the redo layout's msgpack-style
  * envelope/ddl/meta payloads plus its etcd-WAL framing — beyond their
  * fixed golden-byte specs. */
class CodecFuzzSpec extends AnyFunSuite {

  private val nasty = Seq("", "t", "say \"hi\"", "uné中文🎉", "a,b",
    "line\nbreak", "x" * 200)

  test("redo envelope/ddl/meta codecs round-trip 300 random values; garbage rejects") {
    import graft.streaming.RedoLayout
    import graft.streaming.RedoLayout.{RedoDdl, RedoDdlCodec, RedoEnvelope, RedoRowCodec}
    val rnd = new scala.util.Random(1502L)
    def s(): String = nasty(rnd.nextInt(nasty.size))
    def nn(): Long = rnd.nextLong() & Long.MaxValue // codec carries uints
    for (_ <- 0 until 300) {
      val e = RedoEnvelope(nn(), s(), nn(), nn(), rnd.nextInt(1 << 16),
        s(), s(), nn(), nn(),
        if (rnd.nextBoolean()) None else Some(rnd.nextGaussian() * 1e6),
        if (rnd.nextBoolean()) None else Some(
          java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
            case d if d.isNaN => 0.5 // NaN != NaN breaks equality, not codec
            case d => d
          }), s())
      assert(RedoRowCodec.decode(RedoRowCodec.encode(e)) == e)
      val d = RedoDdl(nn(), nn(), s(), s(), s(), rnd.nextInt(256))
      assert(RedoDdlCodec.decode(RedoDdlCodec.encode(d)) == d)
      val (c, r) = (nn(), nn())
      assert(RedoLayout.decodeMeta(RedoLayout.encodeMeta(c, r)) == (c, r))
      // garbage fails in BOUNDED ways: a typed reject or a range overrun —
      // never a hang, a silent null, or some unrelated crash
      val junk = new Array[Byte](1 + rnd.nextInt(40))
      rnd.nextBytes(junk)
      try { assert(RedoRowCodec.decode(junk) != null) } catch {
        case _: IllegalArgumentException => ()
        case _: ArrayIndexOutOfBoundsException => ()
        case _: StringIndexOutOfBoundsException => ()
      }
    }
    // frame fuzz: random frame sequences survive arbitrary truncation —
    // every prefix decodes to a prefix of the original payload list
    for (_ <- 0 until 60) {
      val payloads = Seq.fill(1 + rnd.nextInt(6)) {
        val b = new Array[Byte](rnd.nextInt(50)); rnd.nextBytes(b); b
      }
      val bos = new java.io.ByteArrayOutputStream()
      payloads.foreach(RedoLayout.writeFrame(bos, _))
      val whole = bos.toByteArray
      val cut = rnd.nextInt(whole.length + 1)
      val got = RedoLayout.readFrames(whole.take(cut)).map(_.toSeq)
      val want = payloads.map(_.toSeq)
      assert(got == want.take(got.size))
      // and the truncated tail never yields MORE frames than survive fully
      assert(got.size <= want.size)
    }
  }

  test("craft batches round-trip 150 random event mixes") {
    val rnd = new scala.util.Random(1418L)
    def randBytes(max: Int): Array[Byte] = {
      val b = new Array[Byte](rnd.nextInt(max)); rnd.nextBytes(b); b
    }
    def canon(es: Seq[Event]) = es.map { e =>
      (e.ts, e.ty, e.partition, e.schema, e.table,
        e.groups.map(g => (g.ty, g.cols.map(c =>
          (c.name, c.tpe, c.flags, c.value.map(_.toSeq))))),
        e.ddl)
    }
    for (trial <- 0 until 150) {
      val nEvents = 1 + rnd.nextInt(8)
      var ts = 1000000L + rnd.nextInt(1000)
      val events = Seq.fill(nEvents) {
        ts += rnd.nextInt(50) // delta-encoded: nondecreasing
        val schema = if (rnd.nextInt(10) == 0) None
          else Some(nasty(rnd.nextInt(nasty.size)))
        val table = if (rnd.nextInt(10) == 0) None
          else Some(nasty(rnd.nextInt(nasty.size)))
        rnd.nextInt(3) match {
          case 0 => // row event, 0-3 groups with random columns
            val groups = Seq.fill(rnd.nextInt(4)) {
              Group(1 + rnd.nextInt(3), Seq.fill(1 + rnd.nextInt(5)) {
                Col(nasty(rnd.nextInt(nasty.size)), rnd.nextInt(256),
                  rnd.nextInt(1 << 16).toLong,
                  if (rnd.nextInt(5) == 0) None else Some(randBytes(30)))
              })
            }
            Event(ts, CraftCodec.MsgRow, rnd.nextLong(1 << 20) - (1 << 19),
              schema, table, groups)
          case 1 =>
            Event(ts, CraftCodec.MsgDdl, 0, schema, table,
              ddl = Some((rnd.nextInt(60).toLong,
                nasty(rnd.nextInt(nasty.size)))))
          case _ =>
            Event(ts, CraftCodec.MsgResolved, 0, None, None)
        }
      }
      val back = CraftCodec.decodeMessage(CraftCodec.encodeMessage(events))
      assert(canon(back) == canon(events), s"trial=$trial")
    }
  }

  test("open-protocol framing round-trips 150 random pair streams") {
    val rnd = new scala.util.Random(1419L)
    def randBytes(max: Int): Array[Byte] = {
      val b = new Array[Byte](1 + rnd.nextInt(max)); rnd.nextBytes(b); b
    }
    for (trial <- 0 until 150) {
      val pairs = Seq.fill(1 + rnd.nextInt(40))(
        (randBytes(120), randBytes(200)))
      val maxBatch = 1 + rnd.nextInt(8)
      val maxBytes = 600 + rnd.nextInt(2000)
      val msgs = OpenBatch.encode(pairs.iterator, maxBatch, maxBytes).toSeq
      // every framed message respects the batch-count cap, and the
      // decoded concatenation reproduces the input stream in order
      val decoded = msgs.flatMap { case (k, v) => OpenBatch.decode(k, v) }
      assert(decoded.size == pairs.size, s"trial=$trial")
      decoded.zip(pairs).foreach { case ((gk, gv), (k, v)) =>
        assert(java.util.Arrays.equals(gk, k) &&
          java.util.Arrays.equals(gv, v), s"trial=$trial")
      }
      val counts = msgs.map { case (k, v) => OpenBatch.decode(k, v).size }
      assert(counts.forall(_ <= maxBatch), s"trial=$trial counts=$counts")
    }
  }

  test("avro value/key framing round-trips 200 random rows; foreign ids null") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(1420L)
    for (trial <- 0 until 200) {
      val pk = rnd.nextLong()
      val v: java.lang.Double =
        if (rnd.nextInt(5) == 0) null
        else java.lang.Double.valueOf(rnd.nextDouble() * 1e12 - 5e11)
      val e: UTF8String =
        if (rnd.nextInt(5) == 0) null
        else UTF8String.fromString(nasty(rnd.nextInt(nasty.size)))
      val row = InternalRow(pk,
        if (v == null) null else v.doubleValue(), e)
      val schemaId = 1 + rnd.nextInt(1000)
      val bytes = AvroBinary.encodeValue(row, schemaId)
      val back = AvroBinary.decodeValue(bytes, schemaId)
      assert(back != null)
      assert(back.getLong(0) == pk)
      if (v == null) assert(back.isNullAt(1))
      else assert(back.getDouble(1) == v.doubleValue())
      if (e == null) assert(back.isNullAt(2))
      else assert(back.getUTF8String(2) == e)
      // schema-registry mismatch surfaces as null, not garbage
      assert(AvroBinary.decodeValue(bytes, schemaId + 1) == null)

      val kb = AvroBinary.encodeKey(pk, schemaId)
      assert(AvroBinary.decodeKey(kb, schemaId) == pk)
    }
  }
}
