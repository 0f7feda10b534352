package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * D1 — TiKV/TiDB row-format v2 binary row codec, upgrading the last
 * "partial" with a defined public byte format. The reference decodes these
 * bytes through tidb/util/rowcodec (cdc/entry/codec.go:76-158,
 * cdc/entry/mounter.go:225-290); the LAYOUT here follows the public TiDB
 * design doc `docs/design/2018-07-19-row-format.md`:
 *
 *   version(1B)=0x80 | flags(1B) | numNotNull(2B LE) | numNull(2B LE)
 *   | notNullColIDs | nullColIDs | valueEndOffsets | valueData
 *
 * flags bit0 = "big" row (a column id > 255 or value data > 0xFFFF):
 * col ids widen 1B→4B LE and offsets 2B→4B LE. Column ids sort ascending
 * within each group; offsets are END offsets into the value data. Values:
 * signed integers little-endian in the minimal 1/2/4/8 bytes, strings and
 * binary as raw bytes, float64 as big-endian IEEE bits with the sign-flip
 * transform of the v1 comparable float encoding.
 *
 * FIDELITY NOTE: the reference does not vendor rowcodec, so byte-level
 * conformance rests on the design doc alone; the spec pins golden bytes
 * and the gate proves encode∘decode = id plus doc-derived byte lengths.
 *
 * Exposed as Catalyst expressions (static-call codegen, same pattern as
 * [[AvroBinary]]); per-expression column schemas live in a process-wide
 * registry keyed by a stable id so generated code stays a static call.
 */
object RowCodec {

  final case class ColDef(name: String, id: Long, dt: DataType)

  private val registry = new ConcurrentHashMap[Int, Array[ColDef]]()

  /** Register a table schema (name, colId, type); returns the schema key.
    * Supported types: Long/Integer (signed int), Double, String, Binary. */
  def register(cols: Seq[(String, Long, DataType)]): Int = {
    val arr = cols.map { case (n, i, t) => ColDef(n, i, t) }.toArray
    val key = java.util.Arrays.hashCode(
      arr.map(c => s"${c.name}:${c.id}:${c.dt.sql}").asInstanceOf[Array[AnyRef]])
    registry.putIfAbsent(key, arr)
    key
  }

  def structTypeFor(schemaKey: Int): StructType =
    StructType(registry.get(schemaKey).map(c => StructField(c.name, c.dt)))

  // ---- scalar encoders -------------------------------------------------

  private def intBytes(v: Long): Array[Byte] = {
    if (v >= Byte.MinValue && v <= Byte.MaxValue) Array(v.toByte)
    else if (v >= Short.MinValue && v <= Short.MaxValue)
      Array(v.toByte, (v >> 8).toByte)
    else if (v >= Int.MinValue && v <= Int.MaxValue)
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    else (0 until 8).map(i => (v >> (8 * i)).toByte).toArray
  }

  private def decodeInt(b: Array[Byte], from: Int, until: Int): Long =
    (until - from) match {
      case 1 => b(from).toLong
      case 2 => ((b(from) & 0xffL) | (b(from + 1).toLong << 8)).toShort.toLong
      case 4 => (b(from) & 0xffL) | ((b(from + 1) & 0xffL) << 8) |
        ((b(from + 2) & 0xffL) << 16) | (b(from + 3).toLong << 24)
      case _ => (0 until 8).map(i => (b(from + i) & 0xffL) << (8 * i)).reduce(_ | _)
    }

  private def floatBytes(v: Double): Array[Byte] = {
    var u = java.lang.Double.doubleToLongBits(v)
    if (v >= 0) u |= Long.MinValue else u = ~u
    (0 until 8).map(i => (u >> (8 * (7 - i))).toByte).toArray
  }

  private def decodeFloat(b: Array[Byte], from: Int): Double = {
    var u = (0 until 8).map(i => (b(from + i) & 0xffL) << (8 * (7 - i))).reduce(_ | _)
    if ((u & Long.MinValue) != 0) u &= ~Long.MinValue else u = ~u
    java.lang.Double.longBitsToDouble(u)
  }

  // ---- row encode ------------------------------------------------------

  /** Encode one row (fields in registered order) as a v2 row. Called from
    * generated code. */
  def encodeRow(row: InternalRow, schemaKey: Int): Array[Byte] = {
    val cols = registry.get(schemaKey)
    val notNull = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    val nulls = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < cols.length) {
      val c = cols(i)
      if (row.isNullAt(i)) nulls += c.id
      else notNull += (c.id -> (c.dt match {
        case LongType => intBytes(row.getLong(i))
        case IntegerType => intBytes(row.getInt(i).toLong)
        case DoubleType => floatBytes(row.getDouble(i))
        case StringType => row.getUTF8String(i).getBytes
        case BinaryType => row.getBinary(i)
        case other => throw new IllegalArgumentException(s"rowcodec: $other")
      }))
      i += 1
    }
    val nn = notNull.sortBy(_._1).toArray
    val nu = nulls.sorted.toArray
    val dataLen = nn.map(_._2.length).sum
    val big = cols.exists(_.id > 255) || dataLen > 0xffff
    val idW = if (big) 4 else 1
    val offW = if (big) 4 else 2
    val out = new java.io.ByteArrayOutputStream(
      6 + idW * (nn.length + nu.length) + offW * nn.length + dataLen)
    out.write(0x80)
    out.write(if (big) 1 else 0)
    out.write(nn.length & 0xff); out.write((nn.length >> 8) & 0xff)
    out.write(nu.length & 0xff); out.write((nu.length >> 8) & 0xff)
    def writeId(id: Long): Unit =
      if (big) { var k = 0; while (k < 4) { out.write(((id >> (8 * k)) & 0xff).toInt); k += 1 } }
      else out.write((id & 0xff).toInt)
    nn.foreach(c => writeId(c._1))
    nu.foreach(writeId)
    var end = 0
    nn.foreach { c =>
      end += c._2.length
      if (big) { var k = 0; while (k < 4) { out.write((end >> (8 * k)) & 0xff); k += 1 } }
      else { out.write(end & 0xff); out.write((end >> 8) & 0xff) }
    }
    nn.foreach(c => out.write(c._2))
    out.toByteArray
  }

  // ---- row decode ------------------------------------------------------

  /** Decode a v2 row against the registered schema: one struct field per
    * registered column (NULL when in the null group or absent — absent
    * columns are schema drift, which the mounter fills with NULL/default).
    * Returns null for a non-v2 version byte. */
  def decodeRow(bytes: Array[Byte], schemaKey: Int): InternalRow = {
    if (bytes.length < 6 || (bytes(0) & 0xff) != 0x80) return null
    val cols = registry.get(schemaKey)
    val big = (bytes(1) & 1) != 0
    val nn = (bytes(2) & 0xff) | ((bytes(3) & 0xff) << 8)
    val nu = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8)
    val idW = if (big) 4 else 1
    val offW = if (big) 4 else 2
    val idsAt = 6
    val nullsAt = idsAt + nn * idW
    val offsAt = nullsAt + nu * idW
    val dataAt = offsAt + nn * offW
    def idAt(base: Int, k: Int): Long =
      if (big) (0 until 4).map(j => (bytes(base + k * 4 + j) & 0xffL) << (8 * j)).reduce(_ | _)
      else bytes(base + k) & 0xffL
    def offAt(k: Int): Int =
      if (big) (0 until 4).map(j => (bytes(offsAt + k * 4 + j) & 0xff) << (8 * j)).reduce(_ | _)
      else (bytes(offsAt + k * 2) & 0xff) | ((bytes(offsAt + k * 2 + 1) & 0xff) << 8)
    val vals = new Array[Any](cols.length)
    var i = 0
    while (i < cols.length) {
      val c = cols(i)
      var k = 0
      var found = -1
      while (found < 0 && k < nn) { // ids sorted; linear is fine for CDC widths
        if (idAt(idsAt, k) == c.id) found = k
        k += 1
      }
      vals(i) = if (found < 0) null
      else {
        val from = dataAt + (if (found == 0) 0 else offAt(found - 1))
        val until = dataAt + offAt(found)
        c.dt match {
          case LongType => decodeInt(bytes, from, until)
          case IntegerType => decodeInt(bytes, from, until).toInt
          case DoubleType => decodeFloat(bytes, from)
          case StringType => UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, from, until))
          case BinaryType => java.util.Arrays.copyOfRange(bytes, from, until)
          case other => throw new IllegalArgumentException(s"rowcodec: $other")
        }
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  // ---- Column API ------------------------------------------------------

  def encode(row: Column, schemaKey: Int): Column =
    ExpressionUtils.column(RowCodecEncode(ExpressionUtils.expression(row), schemaKey))

  def decode(bytes: Column, schemaKey: Int): Column =
    ExpressionUtils.column(RowCodecDecode(ExpressionUtils.expression(bytes), schemaKey))
}

/** struct(registered cols) → row-format v2 bytes. */
case class RowCodecEncode(child: Expression, schemaKey: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    RowCodec.encodeRow(input.asInstanceOf[InternalRow], schemaKey)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RowCodec.encodeRow($c, $schemaKey)")
  override protected def withNewChildInternal(newChild: Expression): RowCodecEncode =
    copy(child = newChild)
}

/** row-format v2 bytes → struct(registered cols); NULL on a foreign
  * version byte (null propagated into isNull under codegen, same fix as
  * AvroDecodeEnvelope). */
case class RowCodecDecode(child: Expression, schemaKey: Int)
    extends UnaryExpression {
  override def dataType: DataType = RowCodec.structTypeFor(schemaKey)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    RowCodec.decodeRow(input.asInstanceOf[Array[Byte]], schemaKey)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RowCodec.decodeRow($c, $schemaKey);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): RowCodecDecode =
    copy(child = newChild)
}
