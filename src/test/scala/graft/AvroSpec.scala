package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.AvroBinary

/**
 * Golden-byte tests for the Avro binary codec (E3): the expected byte
 * sequences are hand-derived from the Avro 1.x specification (zigzag
 * varints, union branch indices, little-endian IEEE doubles, length-
 * prefixed UTF-8) and the Confluent wire framing — independent of the
 * library doing the encoding, so a codec regression cannot self-certify.
 */
class AvroSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("key message golden bytes: magic + BE schema id + zigzag varint") {
    // pk=1, schemaId=2 → 00 | 00 00 00 02 | zigzag(1)=2 → 02
    assert(hex(AvroBinary.encodeKey(1L, 2)) === "000000000202")
    // pk=300 → zigzag 600 = 0b100_1011000 → varint d8 04
    assert(hex(AvroBinary.encodeKey(300L, 2)) === "0000000002d804")
  }

  test("value message golden bytes: record fields in schema order") {
    // pk=3 → 06; val=1.5 → union idx 1 (02) + LE 3FF8000000000000;
    // etype="ab" → union idx 1 (02) + len 2 (04) + 61 62
    val row = org.apache.spark.sql.catalyst.InternalRow(
      3L, 1.5d, org.apache.spark.unsafe.types.UTF8String.fromString("ab"))
    assert(hex(AvroBinary.encodeValue(row, 1)) ===
      "0000000001" + "06" + "02" + "000000000000f83f" + "02" + "04" + "6162")
  }

  test("null val and etype use union branch 0") {
    val row = org.apache.spark.sql.catalyst.InternalRow(3L, null, null)
    assert(hex(AvroBinary.encodeValue(row, 1)) === "0000000001" + "06" + "00" + "00")
  }

  test("decode is the inverse of encode, including nulls") {
    val row = org.apache.spark.sql.catalyst.InternalRow(
      12345L, -2.25d, org.apache.spark.unsafe.types.UTF8String.fromString("purchase"))
    val dec = AvroBinary.decodeValue(AvroBinary.encodeValue(row, 7), 7)
    assert(dec.getLong(0) === 12345L)
    assert(dec.getDouble(1) === -2.25d)
    assert(dec.getUTF8String(2).toString === "purchase")
    val nulls = AvroBinary.decodeValue(
      AvroBinary.encodeValue(org.apache.spark.sql.catalyst.InternalRow(5L, null, null), 1), 1)
    assert(nulls.getLong(0) === 5L && nulls.isNullAt(1) && nulls.isNullAt(2))
    assert(AvroBinary.decodeKey(AvroBinary.encodeKey(-17L, 2), 2) === -17L)
  }

  test("foreign frame (wrong magic or schema id) is rejected") {
    val msg = AvroBinary.encodeValue(
      org.apache.spark.sql.catalyst.InternalRow(1L, null, null), 1)
    assert(AvroBinary.decodeValue(msg, 99) == null)
    val broken = msg.clone(); broken(0) = 1
    assert(AvroBinary.decodeValue(broken, 1) == null)
    assert(AvroBinary.decodeKey(AvroBinary.encodeKey(1L, 2), 3) === Long.MinValue)
  }

  test("foreign frame yields SQL NULL under whole-stage codegen") {
    import spark.implicits._
    // decode with a mismatched schema id inside a DataFrame plan (codegen
    // path): result must be NULL, not a non-null row that NPEs on access
    val df = Seq((1L, 2.5d, "click")).toDF("pk", "v", "etype")
    val out = df.select(
      AvroBinary.decodeEnvelope(
        AvroBinary.encodeEnvelope(col("pk"), col("v"), col("etype"), 1), 99).as("dec"))
      .select(col("dec").isNull.as("is_null"), col("dec.pk").as("dec_pk"))
      .collect()
    assert(out.head.getBoolean(0))
    assert(out.head.isNullAt(1))
  }

  test("Column API round-trips through a DataFrame plan") {
    import spark.implicits._
    val df = Seq((1L, 2.5d, "click"), (2L, -1.0d, "view"))
      .toDF("pk", "v", "etype")
    val out = df.select(
      col("pk"), col("v"), col("etype"),
      AvroBinary.decodeEnvelope(
        AvroBinary.encodeEnvelope(col("pk"), col("v"), col("etype"), 1), 1).as("dec"),
      AvroBinary.decodeHandleKey(
        AvroBinary.encodeHandleKey(col("pk"), 2), 2).as("dec_key"))
    out.collect().foreach { r =>
      val dec = r.getAs[Row]("dec")
      assert(dec.getLong(0) === r.getLong(0))
      assert(dec.getDouble(1) === r.getDouble(1))
      assert(dec.getString(2) === r.getString(2))
      assert(r.getAs[Long]("dec_key") === r.getLong(0))
    }
  }

  test("SQL functions registered via SparkSessionExtensions") {
    import spark.implicits._
    Seq((9L, 1.25d, "x")).toDF("pk", "v", "etype").createOrReplaceTempView("avro_in")
    val r = spark.sql(
      """SELECT avro_decode_envelope(
        |  avro_encode_envelope(struct(pk, v, etype))).pk AS pk2,
        |  avro_decode_key(avro_encode_key(pk)) AS pk3
        |FROM avro_in""".stripMargin).head()
    assert(r.getLong(0) === 9L && r.getLong(1) === 9L)
  }

  test("simple-avro: watermark and bootstrap messages round-trip") {
    import graft.functions.SimpleAvro
    val wm = SimpleAvro.decode(SimpleAvro.encodeWatermark(1002500L, 7), 7)
    assert(wm.getUTF8String(0).toString === "WATERMARK")
    assert(wm.getLong(1) === 1002500L)
    assert(wm.isNullAt(2) && wm.isNullAt(6)) // no table, no images
    val bs = SimpleAvro.decode(SimpleAvro.encodeBootstrap(
      "db", "events", 3,
      Seq(("pk", "BIGINT", false), ("val", "DOUBLE", true),
        ("etype", "VARCHAR", true)), 7), 7)
    assert(bs.getUTF8String(0).toString === "BOOTSTRAP")
    assert(bs.getUTF8String(2).toString === "db")
    assert(bs.getUTF8String(3).toString === "events")
    assert(bs.getInt(4) === 3 && bs.getInt(5) === 3)
  }

  test("simple-avro: foreign registry id decodes to null, not garbage") {
    import graft.functions.SimpleAvro
    val bytes = SimpleAvro.encodeWatermark(5L, 12)
    assert(SimpleAvro.decode(bytes, 13) == null)
    assert(SimpleAvro.decode(Array[Byte](1, 2), 12) == null)
  }

  test("glue framing golden bytes: [3, 0, 16-byte version UUID] + same body") {
    // glue_schema_registry.go:330-345 — header version 3, compression 0,
    // then the schema-version UUID big-endian; body identical to Confluent's
    val id = java.util.UUID.fromString("00112233-4455-6677-8899-aabbccddeeff")
    val row = org.apache.spark.sql.catalyst.InternalRow(
      3L, 1.5d, org.apache.spark.unsafe.types.UTF8String.fromString("ab"))
    val msg = AvroBinary.encodeValueGlue(row,
      id.getMostSignificantBits, id.getLeastSignificantBits)
    assert(hex(msg) ===
      "0300" + "00112233445566778899aabbccddeeff" +
        "06" + "02" + "000000000000f83f" + "02" + "04" + "6162")
    val dec = AvroBinary.decodeValueGlue(msg,
      id.getMostSignificantBits, id.getLeastSignificantBits)
    assert(dec.getLong(0) === 3L && dec.getDouble(1) === 1.5d)
    // wrong UUID, wrong header version, short message: all rejected
    assert(AvroBinary.decodeValueGlue(msg, 1L, 2L) == null)
    val broken = msg.clone(); broken(0) = 0
    assert(AvroBinary.decodeValueGlue(broken,
      id.getMostSignificantBits, id.getLeastSignificantBits) == null)
    assert(AvroBinary.decodeValueGlue(Array[Byte](3, 0),
      id.getMostSignificantBits, id.getLeastSignificantBits) == null)
  }
}
