package graft

import graft.functions.MessageCompress
import org.apache.spark.sql.functions._

class MessageCompressSpec extends SparkSpec {
  import spark.implicits._

  private val codecs = Seq(
    MessageCompress.None, MessageCompress.Snappy, MessageCompress.Lz4)

  private val samples: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    "x".getBytes("UTF-8"),
    ("""{"ts":12345,"scm":"db","tbl":"t","u":{"pk":{"t":8,"v":7}}}""" * 40)
      .getBytes("UTF-8"),
    Array.tabulate[Byte](4096)(i => ((i * 31 + i / 7) % 251).toByte))

  test("every codec round-trips every payload byte-for-byte") {
    for (cc <- codecs; s <- samples) {
      val rt = MessageCompress.decompress(cc, MessageCompress.compress(cc, s))
      assert(java.util.Arrays.equals(rt, s), s"codec=$cc len=${s.length}")
    }
  }

  test("repetitive payloads shrink under snappy and lz4; none is identity") {
    val repetitive = ("abcdefgh" * 1280).getBytes("UTF-8") // 10 KiB
    assert(MessageCompress.compress(MessageCompress.None, repetitive) eq repetitive)
    for (cc <- Seq(MessageCompress.Snappy, MessageCompress.Lz4)) {
      val z = MessageCompress.compress(cc, repetitive)
      assert(z.length < repetitive.length / 8, s"$cc: ${z.length}")
    }
  }

  test("lz4 output is the standard FRAME format (magic 0x184D2204)") {
    val z = MessageCompress.compress(MessageCompress.Lz4, "payload".getBytes)
    assert((z(0) & 0xff) == 0x04 && (z(1) & 0xff) == 0x22 &&
      (z(2) & 0xff) == 0x4d && (z(3) & 0xff) == 0x18)
  }

  test("snappy output is the raw BLOCK format (leading varint = plain length)") {
    val plain = ("tok " * 50).getBytes("UTF-8") // 200 bytes -> 1-byte varint? no: 200 > 127, 2-byte
    val z = MessageCompress.compress(MessageCompress.Snappy, plain)
    // varint-decode the uncompressed-length header
    var (v, shift, i) = (0L, 0, 0)
    var more = true
    while (more) {
      val b = z(i) & 0xff
      v |= (b & 0x7fL) << shift; shift += 7; i += 1; more = (b & 0x80) != 0
    }
    assert(v == plain.length)
  }

  test("column expressions round-trip under codegen and flag rewrites") {
    val df = samples.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "v")
    for (cc <- codecs) {
      val out = df.select(col("i"), col("v"),
          MessageCompress.compressBytes(col("v"), cc).as("z"))
        .select(col("i"),
          (col("z") =!= col("v")).as("rewritten"),
          (MessageCompress.decompressBytes(col("z"), cc) === col("v")).as("ok"))
        .collect()
      assert(out.forall(_.getBoolean(2)), cc)
      // headers guarantee wire != plain for real codecs (even empty input
      // gets a frame/varint); `none` must be a pass-through
      if (cc == MessageCompress.None) assert(!out.exists(_.getBoolean(1)))
      else assert(out.forall(_.getBoolean(1)), cc)
    }
  }
}
