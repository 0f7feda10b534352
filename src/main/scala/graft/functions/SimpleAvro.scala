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
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * E7 — Simple protocol, AVRO wire form (the schema-registry-native variant;
 * reference pkg/sink/codec/simple/avro.go + marshaller.go: the same message
 * model as the JSON marshaller, marshalled as Avro binary against a single
 * registry-held schema whose payload is a union of the message kinds).
 *
 * The message model mirrors [[graft.operators.Codecs.simpleRow]] /
 * `simpleBootstrap`: a top-level record `(version, type, payload)` whose
 * payload union covers WATERMARK (checkpoint ts), BOOTSTRAP (table schema
 * announcement) and DML (row image(s) referencing the announced schema by
 * (database, table, schemaVersion)). Byte-level encoding comes from the
 * Apache Avro library on the Spark classpath — authoritative, not
 * hand-rolled — framed in the Confluent wire format (magic 0x00 + 4-byte
 * big-endian schema id from [[graft.core.AvroSchemaRegistry]]), the same
 * framing as [[AvroBinary]].
 *
 * Exposed as Catalyst expressions whose codegen is one static call, so
 * encode/decode stay inside whole-stage codegen; per-thread encoder state
 * is reused across rows. Map-only at any scale — no shuffle.
 */
object SimpleAvro {

  val ProtocolVersion = 1

  val MessageSchemaJson: String =
    """{"type":"record","name":"Message","namespace":"graft.simple","fields":[
      |{"name":"version","type":"int"},
      |{"name":"type","type":"string"},
      |{"name":"payload","type":[
      |{"type":"record","name":"Watermark","fields":[
      |{"name":"commitTs","type":"long"}]},
      |{"type":"record","name":"Bootstrap","fields":[
      |{"name":"database","type":"string"},
      |{"name":"table","type":"string"},
      |{"name":"schemaVersion","type":"int"},
      |{"name":"columns","type":{"type":"array","items":
      |{"type":"record","name":"ColumnSchema","fields":[
      |{"name":"name","type":"string"},
      |{"name":"dataType","type":"string"},
      |{"name":"nullable","type":"boolean"}]}}}]},
      |{"type":"record","name":"DML","fields":[
      |{"name":"database","type":"string"},
      |{"name":"table","type":"string"},
      |{"name":"schemaVersion","type":"int"},
      |{"name":"commitTs","type":"long"},
      |{"name":"data","type":["null",{"type":"record","name":"Image","fields":[
      |{"name":"pk","type":"long"},
      |{"name":"val","type":["null","double"]},
      |{"name":"etype","type":["null","string"]}]}],"default":null},
      |{"name":"old","type":["null","Image"],"default":null}]}]}]}"""
      .stripMargin.replace("\n", "")

  private val schema = new Schema.Parser().parse(MessageSchemaJson)
  private val payloadUnion = schema.getField("payload").schema()
  private def branch(name: String): Schema =
    payloadUnion.getTypes.stream().filter(_.getName == name).findFirst().get()
  private val watermarkSchema = branch("Watermark")
  private val bootstrapSchema = branch("Bootstrap")
  private val dmlSchema = branch("DML")
  private val imageSchema = dmlSchema.getField("data").schema().getTypes.get(1)
  private val columnSchema =
    bootstrapSchema.getField("columns").schema().getElementType

  private val imageType = new StructType()
    .add("pk", LongType).add("val", DoubleType).add("etype", StringType)

  /** Decoded message shape: one struct covering all three payload kinds
    * (absent fields null), the flattening a consumer query wants. */
  val messageType: StructType = new StructType()
    .add("mtype", StringType)
    .add("commit_ts", LongType)
    .add("database", StringType)
    .add("tbl", StringType)
    .add("schema_version", IntegerType)
    .add("n_columns", IntegerType)
    .add("data", imageType)
    .add("old", imageType)

  private final class Ctx {
    val out = new ByteArrayOutputStream(64)
    var enc: BinaryEncoder = _
    var dec: BinaryDecoder = _
    val writer = new GenericDatumWriter[GenericRecord](schema)
    val reader = new GenericDatumReader[GenericRecord](schema)
  }
  private val tls = ThreadLocal.withInitial[Ctx](() => new Ctx)

  private def frame(c: Ctx, schemaId: Int): Unit = {
    c.out.reset()
    c.out.write(0)
    c.out.write((schemaId >>> 24) & 0xff)
    c.out.write((schemaId >>> 16) & 0xff)
    c.out.write((schemaId >>> 8) & 0xff)
    c.out.write(schemaId & 0xff)
  }

  private def checkFrame(bytes: Array[Byte], schemaId: Int): Boolean =
    bytes.length >= 5 && bytes(0) == 0 &&
      (((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)) == schemaId

  private def writeMessage(c: Ctx, mtype: String, payload: GenericRecord,
                           schemaId: Int): Array[Byte] = {
    frame(c, schemaId)
    c.enc = EncoderFactory.get().binaryEncoder(c.out, c.enc)
    val msg = new GenericData.Record(schema)
    msg.put(0, ProtocolVersion)
    msg.put(1, mtype)
    msg.put(2, payload)
    c.writer.write(msg, c.enc)
    c.enc.flush()
    c.out.toByteArray
  }

  /** Encode a DML message from the envelope struct
    * (op, commit_ts, schema_name, table_name, pk, val_before, val_after,
    * etype). Called from generated code. */
  def encodeDml(row: InternalRow, schemaVersion: Int, schemaId: Int): Array[Byte] = {
    val c = tls.get()
    val op = row.getUTF8String(0).toString
    val mtype = op match {
      case "I" => "INSERT"
      case "U" => "UPDATE"
      case _   => "DELETE"
    }
    def image(valOrdinal: Int): GenericRecord = {
      val img = new GenericData.Record(imageSchema)
      img.put(0, row.getLong(4))
      img.put(1, if (row.isNullAt(valOrdinal)) null
                 else java.lang.Double.valueOf(row.getDouble(valOrdinal)))
      img.put(2, if (row.isNullAt(7)) null else row.getUTF8String(7).toString)
      img
    }
    val dml = new GenericData.Record(dmlSchema)
    dml.put(0, row.getUTF8String(2).toString)
    dml.put(1, row.getUTF8String(3).toString)
    dml.put(2, schemaVersion)
    dml.put(3, row.getLong(1))
    dml.put(4, if (op == "D") null else image(6))
    dml.put(5, if (op == "I") null else image(5))
    writeMessage(c, mtype, dml, schemaId)
  }

  /** Encode a WATERMARK (checkpoint) message — control-plane, driver-side. */
  def encodeWatermark(ts: Long, schemaId: Int): Array[Byte] = {
    val wm = new GenericData.Record(watermarkSchema)
    wm.put(0, ts)
    writeMessage(tls.get(), "WATERMARK", wm, schemaId)
  }

  /** Encode a BOOTSTRAP (schema announcement) message — control-plane. */
  def encodeBootstrap(database: String, table: String, schemaVersion: Int,
                      columns: Seq[(String, String, Boolean)],
                      schemaId: Int): Array[Byte] = {
    val bs = new GenericData.Record(bootstrapSchema)
    bs.put(0, database)
    bs.put(1, table)
    bs.put(2, schemaVersion)
    val arr = new GenericData.Array[GenericRecord](columns.size,
      bootstrapSchema.getField("columns").schema())
    columns.foreach { case (n, dt, nullable) =>
      val cr = new GenericData.Record(columnSchema)
      cr.put(0, n); cr.put(1, dt); cr.put(2, nullable)
      arr.add(cr)
    }
    bs.put(3, arr)
    writeMessage(tls.get(), "BOOTSTRAP", bs, schemaId)
  }

  /** Decode any simple-avro message to [[messageType]]; null on a foreign
    * frame (registry id mismatch — surfaced as a decode error upstream). */
  def decode(bytes: Array[Byte], schemaId: Int): InternalRow = {
    if (!checkFrame(bytes, schemaId)) return null
    val c = tls.get()
    c.dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, c.dec)
    val msg = c.reader.read(null, c.dec)
    val mtype = UTF8String.fromString(msg.get(1).toString)
    val payload = msg.get(2).asInstanceOf[GenericRecord]
    def image(v: AnyRef): Any = v match {
      case null => null
      case img: GenericRecord =>
        val value = img.get(1)
        val etype = img.get(2)
        new GenericInternalRow(Array[Any](
          img.get(0).asInstanceOf[Long],
          if (value == null) null
          else value.asInstanceOf[java.lang.Double].doubleValue(),
          if (etype == null) null else UTF8String.fromString(etype.toString)))
    }
    payload.getSchema.getName match {
      case "Watermark" =>
        new GenericInternalRow(Array[Any](mtype,
          payload.get(0).asInstanceOf[Long], null, null, null, null, null, null))
      case "Bootstrap" =>
        new GenericInternalRow(Array[Any](mtype, null,
          UTF8String.fromString(payload.get(0).toString),
          UTF8String.fromString(payload.get(1).toString),
          payload.get(2).asInstanceOf[Int],
          payload.get(3).asInstanceOf[java.util.Collection[_]].size(),
          null, null))
      case _ =>
        new GenericInternalRow(Array[Any](mtype,
          payload.get(3).asInstanceOf[Long],
          UTF8String.fromString(payload.get(0).toString),
          UTF8String.fromString(payload.get(1).toString),
          payload.get(2).asInstanceOf[Int], null,
          image(payload.get(4)), image(payload.get(5))))
    }
  }

  // ---- Column API ------------------------------------------------------

  /** df must expose the canonical envelope columns. */
  def encodeDmlColumn(df: org.apache.spark.sql.DataFrame, schemaVersion: Int,
                      schemaId: Int): Column = {
    import org.apache.spark.sql.functions.{col, struct}
    ExpressionUtils.column(SimpleAvroEncodeDml(
      ExpressionUtils.expression(struct(
        col("op"), col("commit_ts"), col("schema_name"), col("table_name"),
        col("pk"), col("val_before"), col("val_after"), col("etype"))),
      schemaVersion, schemaId))
  }

  def decodeColumn(message: Column, schemaId: Int): Column =
    ExpressionUtils.column(SimpleAvroDecode(
      ExpressionUtils.expression(message), schemaId))
}

/** struct(envelope) → framed simple-avro DML bytes. */
case class SimpleAvroEncodeDml(child: Expression, schemaVersion: Int,
                               schemaId: Int) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    SimpleAvro.encodeDml(input.asInstanceOf[InternalRow], schemaVersion, schemaId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimpleAvro.encodeDml($c, $schemaVersion, $schemaId)")
  override protected def withNewChildInternal(newChild: Expression): SimpleAvroEncodeDml =
    copy(child = newChild)
}

/** framed simple-avro bytes → flattened message struct; null isNull must
  * propagate under codegen (frame mismatch → SQL NULL). */
case class SimpleAvroDecode(child: Expression, schemaId: Int)
    extends UnaryExpression {
  override def dataType: DataType = SimpleAvro.messageType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    SimpleAvro.decode(input.asInstanceOf[Array[Byte]], schemaId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SimpleAvro.decode($c, $schemaId);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): SimpleAvroDecode =
    copy(child = newChild)
}
