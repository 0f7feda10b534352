package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.OpenBatch

/** Open-protocol batch framing: version header, length-prefixed segments,
  * count and byte-size batch splits, exact round-trip. */
class OpenBatchSpec extends AnyFunSuite {

  private def pair(i: Int): (Array[Byte], Array[Byte]) =
    (s"""{"ts":$i}""".getBytes("UTF-8"), s"""{"u":{"pk":$i}}""".getBytes("UTF-8"))

  private def strs(ps: Seq[(Array[Byte], Array[Byte])]): Seq[(String, String)] =
    ps.map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) }

  test("round-trip preserves every pair in order across batch splits") {
    val pairs = (0 until 50).map(pair)
    val msgs = OpenBatch.encode(pairs.iterator, maxBatchSize = 7).toSeq
    assert(msgs.length === 8) // ceil(50/7)
    val decoded = msgs.flatMap { case (k, v) => OpenBatch.decode(k, v) }
    assert(strs(decoded) === strs(pairs))
  }

  test("message key starts with the 8-byte big-endian batch version") {
    val Seq((k, _)) = OpenBatch.encode(Iterator(pair(1))).toSeq
    assert(k.take(8).toSeq === Seq[Byte](0, 0, 0, 0, 0, 0, 0, 1))
  }

  test("byte-size cap splits before exceeding maxMessageBytes") {
    val pairs = (0 until 10).map(pair)
    val one = pairs.head._1.length + pairs.head._2.length + 16
    val msgs = OpenBatch.encode(pairs.iterator, maxBatchSize = 100,
      maxMessageBytes = one * 3 + 8).toSeq
    assert(msgs.length > 1)
    msgs.foreach { case (k, v) =>
      assert(k.length + v.length <= one * 3 + 8)
      assert(OpenBatch.decode(k, v).nonEmpty)
    }
    assert(strs(msgs.flatMap { case (k, v) => OpenBatch.decode(k, v) }) === strs(pairs))
  }

  test("foreign version is rejected") {
    val Seq((k, v)) = OpenBatch.encode(Iterator(pair(1))).toSeq
    k(7) = 9
    intercept[IllegalArgumentException](OpenBatch.decode(k, v))
  }
}
