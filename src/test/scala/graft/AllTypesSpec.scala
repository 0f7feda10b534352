package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._

/**
 * All-types rendering matrix (FIXTURES.md §3.1, mirroring the reference's
 * mounter/codec type coverage): every supported column type must survive a
 * to_json → from_json round trip and render deterministically in CSV.
 */
class AllTypesSpec extends SparkSpec {
  import spark.implicits._

  private def allTypes = Seq((
    1L, 127.toByte, 32000.toShort, 42, 9999999999L,
    1.5f, 2.25, BigDecimal("1234.5678"),
    Date.valueOf("2024-03-15"), Timestamp.valueOf("2024-03-15 10:30:00"),
    "text", Array[Byte](1, 2, 3), true))
    .toDF("id", "t_tiny", "t_small", "t_int", "t_big",
      "t_float", "t_double", "t_dec", "t_date", "t_ts",
      "t_vchar", "t_blob", "t_bool")

  test("all types round-trip through to_json/from_json") {
    val df = allTypes
    val json = df.select(to_json(struct(df.columns.map(col): _*)).as("j"))
    val back = json.select(from_json(col("j"), df.schema).as("s")).select("s.*")
    val orig = df.collect()(0)
    val rt = back.collect()(0)
    df.columns.zipWithIndex.foreach { case (c, i) =>
      (orig.get(i), rt.get(i)) match {
        case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b), c)
        case (a, b) => assert(a == b, s"column $c: $a != $b")
      }
    }
  }

  test("CSV rendering is deterministic and matches MySQL-style conventions") {
    import graft.operators.Codecs
    val line = allTypes.select(concat_ws(",",
      col("id"), col("t_dec").cast("decimal(20,4)").cast("string"),
      date_format(col("t_date"), "yyyy-MM-dd"),
      date_format(col("t_ts"), "yyyy-MM-dd HH:mm:ss"),
      Codecs.csvQuote(col("t_vchar")),
      base64(col("t_blob")),
      col("t_bool").cast("int")).as("line"))
      .as[String].collect()(0)
    assert(line == """1,1234.5678,2024-03-15,2024-03-15 10:30:00,"text",AQID,1""")
  }

  test("NaN/Inf floats squash to 0 like the reference formatter") {
    // reference formatColVal squashes Float NaN/Inf to 0 with a warning
    // (cdc/entry/mounter.go:816-823)
    val df = Seq(Float.NaN, Float.PositiveInfinity, 1.5f).toDF("f")
    val out = df.select(
      when(isnan(col("f")) || col("f") === Float.PositiveInfinity ||
        col("f") === Float.NegativeInfinity, 0f)
        .otherwise(col("f")).as("v"))
      .as[Float].collect().toSeq
    assert(out == Seq(0f, 0f, 1.5f))
  }
}
