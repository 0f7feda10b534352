package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{BinaryType, DataType}

/**
 * Per-message payload compression for the MQ codec path (reference
 * pkg/compression/compress.go: none | snappy | lz4, applied to every
 * encoded message value when large-message-handle compression is
 * configured — pkg/sink/codec/common/compress.go, used by e.g.
 * pkg/sink/codec/open/open_protocol_encoder.go:58 on the encode side and
 * open_protocol_decoder.go:147 on the consumer side).
 *
 * Wire formats match the reference's Go libraries byte-family-for-byte-
 * family, so a Go consumer reads what we write and vice versa:
 *  - snappy: the raw BLOCK format (varint uncompressed length + literal/
 *    copy elements) — klauspost/compress/snappy `Encode/Decode` and
 *    snappy-java's `Snappy.compress/uncompress` both speak exactly this
 *    format (not the framing variant).
 *  - lz4: the standard LZ4 FRAME format (magic 0x184D2204, frame
 *    descriptor, blocks) — pierrec/lz4 `Writer/Reader` and lz4-java's
 *    `LZ4FrameOutputStream/LZ4FrameInputStream` interoperate; any valid
 *    frame decodes regardless of the writer's block-size/checksum flags.
 *
 * Exposed as Catalyst expressions (codec chosen at plan time, never a
 * per-row branch) whose codegen is one static call — compress/decompress
 * stay inside whole-stage codegen, map-only at any scale. This is the
 * scale lever for wide-row changefeeds: value bytes shrink BEFORE the
 * exchange to the sink partition, so the shuffle and the broker both see
 * compressed payloads.
 */
object MessageCompress {

  val None = "none"
  val Snappy = "snappy"
  val Lz4 = "lz4"

  /** Supported = the reference's pkg/compression Supported() set. */
  def supported(cc: String): Boolean =
    cc == None || cc == Snappy || cc == Lz4

  def compress(cc: String, data: Array[Byte]): Array[Byte] = cc match {
    case None => data
    case Snappy => org.xerial.snappy.Snappy.compress(data)
    case Lz4 =>
      val bos = new ByteArrayOutputStream(data.length / 2 + 64)
      val w = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      w.write(data); w.close()
      bos.toByteArray
    case other => throw new IllegalArgumentException(
      s"Unsupported compression $other")
  }

  def decompress(cc: String, data: Array[Byte]): Array[Byte] = cc match {
    case None => data
    case Snappy => org.xerial.snappy.Snappy.uncompress(data)
    case Lz4 =>
      val r = new net.jpountz.lz4.LZ4FrameInputStream(
        new ByteArrayInputStream(data))
      val bos = new ByteArrayOutputStream(data.length * 2 + 64)
      val buf = new Array[Byte](8192)
      var n = r.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = r.read(buf) }
      r.close()
      bos.toByteArray
    case other => throw new IllegalArgumentException(
      s"Unsupported compression $other")
  }

  def compressBytes(data: Column, cc: String): Column =
    ExpressionUtils.column(CompressBytes(ExpressionUtils.expression(data), cc))

  def decompressBytes(data: Column, cc: String): Column =
    ExpressionUtils.column(DecompressBytes(ExpressionUtils.expression(data), cc))
}

/** binary → binary, compressed with the (plan-literal) codec. */
case class CompressBytes(child: Expression, cc: String)
    extends UnaryExpression {
  require(MessageCompress.supported(cc), s"Unsupported compression $cc")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    MessageCompress.compress(cc, input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.MessageCompress.compress("$cc", $c)""")
  override protected def withNewChildInternal(newChild: Expression): CompressBytes =
    copy(child = newChild)
}

/** binary → binary, decompressed with the (plan-literal) codec. */
case class DecompressBytes(child: Expression, cc: String)
    extends UnaryExpression {
  require(MessageCompress.supported(cc), s"Unsupported compression $cc")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    MessageCompress.decompress(cc, input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.MessageCompress.decompress("$cc", $c)""")
  override protected def withNewChildInternal(newChild: Expression): DecompressBytes =
    copy(child = newChild)
}
