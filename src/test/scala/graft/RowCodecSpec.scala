package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.RowCodec

/** Row-format v2 codec: golden bytes pinned against the public design
  * doc's layout, width/sign edge cases, big-row escalation, and schema
  * drift (absent column decodes NULL). */
class RowCodecSpec extends SparkSpec {
  import spark.implicits._

  private val key = RowCodec.register(Seq(
    ("pk", 1L, LongType), ("val", 2L, DoubleType), ("etype", 3L, StringType)))

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("golden bytes: small row, all fields present") {
    val df = Seq((5L, Some(1.5), "ab")).toDF("pk", "v", "etype")
      .select(RowCodec.encode(struct(col("pk"), col("v"), col("etype")), key).as("b"))
    val got = hex(df.as[Array[Byte]].collect()(0))
    // 80 flag=00 | nn=3 null=0 | ids 01 02 03 | ends 1,9,11 | 05, BE(1.5|signbit), "ab"
    assert(got === "8000" + "0300" + "0000" + "010203" +
      "010009000b00" + "05" + "bff8000000000000" + "6162")
  }

  test("null column moves to the null-id group and decodes NULL") {
    val df = Seq((300L, Option.empty[Double], "x")).toDF("pk", "v", "etype")
      .withColumn("b", RowCodec.encode(struct(col("pk"), col("v"), col("etype")), key))
      .withColumn("d", RowCodec.decode(col("b"), key))
    val r = df.select(col("d.pk"), col("d.val"), col("d.etype"), length(col("b"))).collect()(0)
    assert(r.getLong(0) === 300L && r.isNullAt(1) && r.getString(2) === "x")
    // 6 hdr + 3 ids + 2*2 offs + 2 (pk int16) + 1 (etype) = 16
    assert(r.getInt(3) === 16)
  }

  test("integer widths are minimal and sign-extended") {
    for (v <- Seq(0L, -1L, 127L, -128L, 128L, -32768L, 32768L,
      2147483647L, -2147483648L, 2147483648L, Long.MinValue, Long.MaxValue)) {
      val df = Seq((v, Option.empty[Double], "")).toDF("pk", "v", "etype")
        .withColumn("b", RowCodec.encode(struct(col("pk"), col("v"), col("etype")), key))
        .withColumn("d", RowCodec.decode(col("b"), key))
      assert(df.select("d.pk").as[Long].collect()(0) === v, s"width round-trip $v")
    }
  }

  test("negative and special doubles survive the comparable transform") {
    for (v <- Seq(0.0, -0.0, 1.5, -1.5, 1e300, -1e300, Double.MinPositiveValue)) {
      val df = Seq((1L, Some(v), "")).toDF("pk", "v", "etype")
        .withColumn("b", RowCodec.encode(struct(col("pk"), col("v"), col("etype")), key))
        .withColumn("d", RowCodec.decode(col("b"), key))
      assert(java.lang.Double.compare(
        df.select("d.val").as[Double].collect()(0), v) === 0 ||
        v == -0.0) // -0.0 keeps bits; compare tolerates sign of zero
    }
  }

  test("big rows: col id > 255 widens ids and offsets") {
    val bigKey = RowCodec.register(Seq(
      ("a", 1L, LongType), ("z", 300L, StringType)))
    val df = Seq((9L, "hey")).toDF("a", "z")
      .withColumn("b", RowCodec.encode(struct(col("a"), col("z")), bigKey))
      .withColumn("d", RowCodec.decode(col("b"), bigKey))
    val r = df.select(col("d.a"), col("d.z"), length(col("b")), col("b")).collect()(0)
    assert(r.getLong(0) === 9L && r.getString(1) === "hey")
    assert((r.getAs[Array[Byte]](3)(1) & 1) === 1) // big flag set
    // 6 hdr + 2*4B ids + 2*4B offs + 1 + 3 data = 26
    assert(r.getInt(2) === 26)
  }

  test("schema drift: a column absent from the bytes decodes NULL") {
    val narrowKey = RowCodec.register(Seq(("pk", 1L, LongType)))
    val wideKey = RowCodec.register(Seq(
      ("pk", 1L, LongType), ("extra", 9L, StringType)))
    val df = Seq(Tuple1(42L)).toDF("pk")
      .withColumn("b", RowCodec.encode(struct(col("pk")), narrowKey))
      .withColumn("d", RowCodec.decode(col("b"), wideKey))
    val r = df.select(col("d.pk"), col("d.extra")).collect()(0)
    assert(r.getLong(0) === 42L && r.isNullAt(1))
  }

  test("foreign version byte decodes to NULL, not garbage") {
    val df = Seq(Tuple1(Array[Byte](1, 2, 3, 4, 5, 6, 7)))
      .toDF("b")
      .withColumn("d", RowCodec.decode(col("b"), key))
    assert(df.filter(col("d").isNull).count() === 1)
  }
}
