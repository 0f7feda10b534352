package graft

import org.apache.spark.sql.functions._

import graft.operators.Codecs
import graft.operators.Codecs.CsvConfig

/** CSV config surface: delimiter/quote/null options, unquoted escaping,
  * binary encodings. */
class CsvConfigSpec extends SparkSpec {
  import spark.implicits._

  private def render(cfg: CsvConfig, v: String): String =
    Seq(Tuple1(v)).toDF("c")
      .select(Codecs.csvQuoteWith(cfg)(col("c")).as("r")).head().getString(0)

  test("quoted mode doubles embedded quote chars, any quote char") {
    assert(render(CsvConfig(), """say "hi"""") === "\"say \"\"hi\"\"\"")
    assert(render(CsvConfig(quote = "'"), "it's") === "'it''s'")
  }

  test("unquoted mode backslash-escapes delimiter, backslash, newlines") {
    val cfg = CsvConfig(quote = "", delimiter = "|")
    assert(render(cfg, "a|b") === "a\\|b")
    assert(render(cfg, "a\\b") === "a\\\\b")
    assert(render(cfg, "a\nb") === "a\\nb")
  }

  test("null literal and custom delimiter flow through the full line") {
    val cfg = CsvConfig(delimiter = ";", nullLiteral = "NULL")
    val df = Seq(("D", "db", "t", 5L, 1L, Option.empty[Double], Option.empty[Double], "x"))
      .toDF("op", "schema_name", "table_name", "commit_ts", "pk",
        "val_before", "val_after", "etype")
    val line = df.select(Codecs.csvLineWith(df, cfg).as("l")).head().getString(0)
    assert(line === "\"D\";\"db\";\"t\";5;1;NULL;\"x\"")
  }

  test("binary columns render base64 or hex") {
    val df = Seq(Tuple1("AB".getBytes("UTF-8"))).toDF("b")
    assert(df.select(Codecs.csvBinaryWith(CsvConfig())(col("b"))).head().getString(0) === "QUI=")
    assert(df.select(Codecs.csvBinaryWith(CsvConfig(binaryBase64 = false))(col("b")))
      .head().getString(0) === "4142")
  }

  test("pulsar topic validation accepts URLs and expressions") {
    import graft.operators.Routing
    assert(Routing.validateTopicExpressionForPulsar(
      "persistent://tenant/ns/{schema}_{table}"))
    assert(Routing.validateTopicExpressionForPulsar("cdc_{schema}_{table}"))
    assert(!Routing.validateTopicExpressionForPulsar("cdc_{table}_only"))
  }
}
