package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * E3 — Avro BINARY codec for the CDC envelope in the Confluent wire format
 * (magic byte 0x00 + 4-byte big-endian schema id + Avro binary body),
 * matching the semantics of the reference's Avro encoder
 * (pkg/sink/codec/avro/avro.go:210-1050): the value message is the after
 * image for INSERT/UPDATE and a nil tombstone for DELETE; the key message
 * always carries the handle columns.
 *
 * The byte-level encoding comes from the Apache Avro library (on the Spark
 * classpath) — authoritative, not hand-rolled — and is exposed as custom
 * Catalyst expressions whose codegen is a single static call, so the encode
 * stays inside whole-stage codegen. Per-thread encoder/decoder state is
 * reused across rows (the same amortization the reference gets from its
 * per-sink encoder instances).
 */
object AvroBinary {

  /** Envelope value record — mirrors [[graft.operators.Codecs.avroSchema]]
    * output for the canonical (pk, val, etype) payload. */
  val ValueSchemaJson: String =
    """{"type":"record","name":"Envelope","namespace":"graft",
      |"fields":[{"name":"pk","type":"long"},
      |{"name":"val","type":["null","double"]},
      |{"name":"etype","type":["null","string"]}]}""".stripMargin.replace("\n", "")

  /** Key record: handle column(s) only. */
  val KeySchemaJson: String =
    """{"type":"record","name":"EnvelopeKey","namespace":"graft",
      |"fields":[{"name":"pk","type":"long"}]}""".stripMargin.replace("\n", "")

  val envelopeType: StructType = new StructType()
    .add("pk", LongType, nullable = false)
    .add("val", DoubleType, nullable = true)
    .add("etype", StringType, nullable = true)

  private val valueSchema = new Schema.Parser().parse(ValueSchemaJson)
  private val keySchema = new Schema.Parser().parse(KeySchemaJson)

  /** Per-thread reusable codec state: output buffer, Avro encoder/decoder
    * (both support in-place re-init), and datum reader/writers. */
  private final class Ctx {
    val out = new ByteArrayOutputStream(64)
    var enc: BinaryEncoder = _
    var dec: BinaryDecoder = _
    val valueWriter = new GenericDatumWriter[GenericRecord](valueSchema)
    val keyWriter = new GenericDatumWriter[GenericRecord](keySchema)
    val valueReader = new GenericDatumReader[GenericRecord](valueSchema)
    val keyReader = new GenericDatumReader[GenericRecord](keySchema)
  }
  private val tls = ThreadLocal.withInitial[Ctx](() => new Ctx)

  private def frame(c: Ctx, schemaId: Int): Unit = {
    c.out.reset()
    c.out.write(0) // Confluent magic byte
    c.out.write((schemaId >>> 24) & 0xff)
    c.out.write((schemaId >>> 16) & 0xff)
    c.out.write((schemaId >>> 8) & 0xff)
    c.out.write(schemaId & 0xff)
  }

  /** Encode (pk, val, etype) as a framed Avro value message. Called from
    * generated code — must stay a static-shaped, allocation-light method. */
  def encodeValue(row: InternalRow, schemaId: Int): Array[Byte] = {
    val c = tls.get()
    frame(c, schemaId)
    c.enc = EncoderFactory.get().binaryEncoder(c.out, c.enc)
    val rec = new GenericData.Record(valueSchema)
    rec.put(0, row.getLong(0))
    rec.put(1, if (row.isNullAt(1)) null else java.lang.Double.valueOf(row.getDouble(1)))
    rec.put(2, if (row.isNullAt(2)) null else row.getUTF8String(2).toString)
    c.valueWriter.write(rec, c.enc)
    c.enc.flush()
    c.out.toByteArray
  }

  /** Decode a framed Avro value message back to (pk, val, etype); returns
    * null on a foreign magic byte or schema id (schema-registry mismatch —
    * the reference surfaces this as a decode error). */
  def decodeValue(bytes: Array[Byte], schemaId: Int): InternalRow = {
    if (!checkFrame(bytes, schemaId)) return null
    val c = tls.get()
    c.dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, c.dec)
    val rec = c.valueReader.read(null, c.dec)
    val v = rec.get(1)
    val e = rec.get(2)
    new GenericInternalRow(Array[Any](
      rec.get(0).asInstanceOf[Long],
      if (v == null) null else v.asInstanceOf[java.lang.Double].doubleValue(),
      if (e == null) null else UTF8String.fromString(e.toString)))
  }

  def encodeKey(pk: Long, schemaId: Int): Array[Byte] = {
    val c = tls.get()
    frame(c, schemaId)
    c.enc = EncoderFactory.get().binaryEncoder(c.out, c.enc)
    val rec = new GenericData.Record(keySchema)
    rec.put(0, pk)
    c.keyWriter.write(rec, c.enc)
    c.enc.flush()
    c.out.toByteArray
  }

  /** Decode a framed key message to the handle value; MIN_VALUE on frame
    * mismatch (kept primitive so codegen needs no boxing). NOTE: unlike
    * decodeValue, a mismatched frame here yields the Long.MinValue sentinel
    * in BOTH interpreted and codegen paths — callers that need SQL NULL
    * semantics must map the sentinel explicitly. */
  def decodeKey(bytes: Array[Byte], schemaId: Int): Long = {
    if (!checkFrame(bytes, schemaId)) return Long.MinValue
    val c = tls.get()
    c.dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, c.dec)
    c.keyReader.read(null, c.dec).get(0).asInstanceOf[Long]
  }

  private def checkFrame(bytes: Array[Byte], schemaId: Int): Boolean =
    bytes.length >= 5 && bytes(0) == 0 &&
      (((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)) == schemaId

  // ---- Glue wire format --------------------------------------------------
  // 18-byte header (glue_schema_registry.go:326-345, mirroring AWS's
  // AWSSchemaRegistryConstants): [0]=3 header version, [1]=0 no compression,
  // [2..17]=the schema VERSION's UUID big-endian; Avro binary body follows.

  private val GlueHeaderVersion: Byte = 3
  private val GlueNoCompression: Byte = 0
  private val GlueHeaderLen = 18

  private def glueFrame(c: Ctx, idHi: Long, idLo: Long): Unit = {
    c.out.reset()
    c.out.write(GlueHeaderVersion)
    c.out.write(GlueNoCompression)
    var i = 7
    while (i >= 0) { c.out.write(((idHi >>> (8 * i)) & 0xff).toInt); i -= 1 }
    i = 7
    while (i >= 0) { c.out.write(((idLo >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  private def checkGlueFrame(bytes: Array[Byte], idHi: Long, idLo: Long): Boolean = {
    if (bytes.length < GlueHeaderLen || bytes(0) != GlueHeaderVersion ||
      bytes(1) != GlueNoCompression) return false
    var hi = 0L; var lo = 0L; var i = 0
    while (i < 8) { hi = (hi << 8) | (bytes(2 + i) & 0xffL); i += 1 }
    i = 0
    while (i < 8) { lo = (lo << 8) | (bytes(10 + i) & 0xffL); i += 1 }
    hi == idHi && lo == idLo
  }

  /** Encode (pk, val, etype) as a Glue-framed Avro value message. */
  def encodeValueGlue(row: InternalRow, idHi: Long, idLo: Long): Array[Byte] = {
    val c = tls.get()
    glueFrame(c, idHi, idLo)
    c.enc = EncoderFactory.get().binaryEncoder(c.out, c.enc)
    val rec = new GenericData.Record(valueSchema)
    rec.put(0, row.getLong(0))
    rec.put(1, if (row.isNullAt(1)) null else java.lang.Double.valueOf(row.getDouble(1)))
    rec.put(2, if (row.isNullAt(2)) null else row.getUTF8String(2).toString)
    c.valueWriter.write(rec, c.enc)
    c.enc.flush()
    c.out.toByteArray
  }

  /** Decode a Glue-framed value message; null unless the header carries
    * EXACTLY the given schema-version UUID (the registry-dispatch contract —
    * consumers look the UUID up before choosing a reader schema). */
  def decodeValueGlue(bytes: Array[Byte], idHi: Long, idLo: Long): InternalRow = {
    if (!checkGlueFrame(bytes, idHi, idLo)) return null
    val c = tls.get()
    c.dec = DecoderFactory.get().binaryDecoder(
      bytes, GlueHeaderLen, bytes.length - GlueHeaderLen, c.dec)
    val rec = c.valueReader.read(null, c.dec)
    val v = rec.get(1)
    val e = rec.get(2)
    new GenericInternalRow(Array[Any](
      rec.get(0).asInstanceOf[Long],
      if (v == null) null else v.asInstanceOf[java.lang.Double].doubleValue(),
      if (e == null) null else UTF8String.fromString(e.toString)))
  }

  // ---- Column API ------------------------------------------------------

  def encodeEnvelope(pk: Column, value: Column, etype: Column, schemaId: Int): Column =
    ExpressionUtils.column(AvroEncodeEnvelope(
      ExpressionUtils.expression(struct(pk.as("pk"), value.as("val"), etype.as("etype"))),
      schemaId))

  def decodeEnvelope(message: Column, schemaId: Int): Column =
    ExpressionUtils.column(AvroDecodeEnvelope(
      ExpressionUtils.expression(message), schemaId))

  def encodeHandleKey(pk: Column, schemaId: Int): Column =
    ExpressionUtils.column(AvroEncodeKey(ExpressionUtils.expression(pk), schemaId))

  def decodeHandleKey(message: Column, schemaId: Int): Column =
    ExpressionUtils.column(AvroDecodeKey(ExpressionUtils.expression(message), schemaId))

  def encodeEnvelopeGlue(pk: Column, value: Column, etype: Column,
                         versionId: java.util.UUID): Column =
    ExpressionUtils.column(GlueEncodeEnvelope(
      ExpressionUtils.expression(struct(pk.as("pk"), value.as("val"), etype.as("etype"))),
      versionId.getMostSignificantBits, versionId.getLeastSignificantBits))

  def decodeEnvelopeGlue(message: Column, versionId: java.util.UUID): Column =
    ExpressionUtils.column(GlueDecodeEnvelope(
      ExpressionUtils.expression(message),
      versionId.getMostSignificantBits, versionId.getLeastSignificantBits))
}

/** to Avro binary: struct(pk, val, etype) → framed bytes. */
case class AvroEncodeEnvelope(child: Expression, schemaId: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    AvroBinary.encodeValue(input.asInstanceOf[InternalRow], schemaId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AvroBinary.encodeValue($c, $schemaId)")
  override protected def withNewChildInternal(newChild: Expression): AvroEncodeEnvelope =
    copy(child = newChild)
}

/** from Avro binary: framed bytes → struct(pk, val, etype); null on a
  * foreign frame. Codegen must propagate the null result into isNull —
  * defineCodeGen would leave isNull=false with a null row and NPE
  * downstream under whole-stage codegen. */
case class AvroDecodeEnvelope(child: Expression, schemaId: Int)
    extends UnaryExpression {
  override def dataType: DataType = AvroBinary.envelopeType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    AvroBinary.decodeValue(input.asInstanceOf[Array[Byte]], schemaId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AvroBinary.decodeValue($c, $schemaId);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): AvroDecodeEnvelope =
    copy(child = newChild)
}

case class AvroEncodeKey(child: Expression, schemaId: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    AvroBinary.encodeKey(input.asInstanceOf[Long], schemaId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AvroBinary.encodeKey($c, $schemaId)")
  override protected def withNewChildInternal(newChild: Expression): AvroEncodeKey =
    copy(child = newChild)
}

/** to Glue-framed Avro binary: struct(pk, val, etype) → 18B header + body.
  * The UUID rides as two long literals so codegen folds it into the call. */
case class GlueEncodeEnvelope(child: Expression, idHi: Long, idLo: Long)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    AvroBinary.encodeValueGlue(input.asInstanceOf[InternalRow], idHi, idLo)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AvroBinary.encodeValueGlue($c, ${idHi}L, ${idLo}L)")
  override protected def withNewChildInternal(newChild: Expression): GlueEncodeEnvelope =
    copy(child = newChild)
}

/** from Glue-framed Avro binary; null on a foreign header/version UUID
  * (same isNull-propagation requirement as AvroDecodeEnvelope). */
case class GlueDecodeEnvelope(child: Expression, idHi: Long, idLo: Long)
    extends UnaryExpression {
  override def dataType: DataType = AvroBinary.envelopeType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    AvroBinary.decodeValueGlue(input.asInstanceOf[Array[Byte]], idHi, idLo)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AvroBinary.decodeValueGlue($c, ${idHi}L, ${idLo}L);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): GlueDecodeEnvelope =
    copy(child = newChild)
}

case class AvroDecodeKey(child: Expression, schemaId: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    AvroBinary.decodeKey(input.asInstanceOf[Array[Byte]], schemaId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AvroBinary.decodeKey($c, $schemaId)")
  override protected def withNewChildInternal(newChild: Expression): AvroDecodeKey =
    copy(child = newChild)
}
