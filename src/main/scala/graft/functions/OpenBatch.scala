package graft.functions

import java.io.ByteArrayOutputStream

import scala.collection.mutable

/**
 * E1 (framing half) — Open Protocol BATCH wire format
 * (pkg/sink/codec/open/open_protocol_encoder.go:140-200, BatchVersion1
 * pkg/sink/codec/encoder.go:26-27): one Kafka message carries many
 * key/value pairs; the message key is
 * `[8B BE version=1][8B BE len][key json]...` and the message value is
 * `[8B BE len][value json]...`. A new message starts when the pair count
 * reaches maxBatchSize or appending (key+value+16) would exceed
 * maxMessageBytes.
 */
object OpenBatch {

  val BatchVersion1 = 1L

  private def putU64BE(o: ByteArrayOutputStream, v: Long): Unit = {
    var i = 7
    while (i >= 0) { o.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }
  private def u64BE(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Pack (key, value) pairs into framed Kafka messages. */
  def encode(pairs: Iterator[(Array[Byte], Array[Byte])],
             maxBatchSize: Int = 16,
             maxMessageBytes: Int = 1 << 20): Iterator[(Array[Byte], Array[Byte])] = {
    val out = mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    var k: ByteArrayOutputStream = null
    var v: ByteArrayOutputStream = null
    var count = 0
    def flush(): Unit =
      if (k != null && count > 0) out += ((k.toByteArray, v.toByteArray))
    def fresh(): Unit = {
      flush()
      k = new ByteArrayOutputStream(256)
      putU64BE(k, BatchVersion1)
      v = new ByteArrayOutputStream(1024)
      count = 0
    }
    fresh()
    pairs.foreach { case (key, value) =>
      if (count >= maxBatchSize ||
          (count > 0 && k.size() + v.size() + key.length + value.length + 16 > maxMessageBytes))
        fresh()
      putU64BE(k, key.length.toLong)
      k.write(key, 0, key.length)
      putU64BE(v, value.length.toLong)
      v.write(value, 0, value.length)
      count += 1
    }
    flush()
    out.iterator
  }

  /** Unpack one framed message back into its (key, value) pairs. */
  def decode(msgKey: Array[Byte], msgValue: Array[Byte]): Seq[(Array[Byte], Array[Byte])] = {
    require(msgKey.length >= 8 && u64BE(msgKey, 0) == BatchVersion1,
      "unexpected open-protocol batch version")
    val out = mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    var ko = 8
    var vo = 0
    while (ko < msgKey.length) {
      val kl = u64BE(msgKey, ko).toInt
      val key = java.util.Arrays.copyOfRange(msgKey, ko + 8, ko + 8 + kl)
      ko += 8 + kl
      val vl = u64BE(msgValue, vo).toInt
      val value = java.util.Arrays.copyOfRange(msgValue, vo + 8, vo + 8 + vl)
      vo += 8 + vl
      out += ((key, value))
    }
    require(vo == msgValue.length, "trailing bytes in open-protocol batch value")
    out.toSeq
  }
}
