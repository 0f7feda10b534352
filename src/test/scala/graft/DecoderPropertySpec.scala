package graft

import org.apache.spark.sql.functions._
import graft.operators.Codecs

/** Decoder round trips on seeded-random envelopes with adversarial
  * strings — quotes, commas, backslashes, unicode, embedded newlines —
  * beyond what the deterministic gate stream exercises. encode∘decode
  * must be the identity on every wire-carried field. */
class DecoderPropertySpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    "plain", "with space", "say \"hi\"", "a,b,c", "back\\slash",
    "unié中文", "quote'single", "tab\there", "line\nbreak",
    "{\"json\":1}", "")

  private def randomRows(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val op = Seq("I", "U", "D")(rnd.nextInt(3))
      (i.toLong, op, 1000L + rnd.nextInt(500), 900L + rnd.nextInt(100),
        s"db_${rnd.nextInt(3)}", s"tbl_${rnd.nextInt(4)}",
        rnd.nextInt(1000).toLong,
        if (op == "I") None else Some(rnd.nextDouble() * 100),
        if (op == "D") None else Some(rnd.nextDouble() * 100),
        nasty(rnd.nextInt(nasty.length)))
    }.toDF("seq", "op", "commit_ts", "start_ts", "schema_name", "table_name",
      "pk", "val_before", "val_after", "etype")
  }

  test("debezium / maxwell / simple round-trip random envelopes exactly") {
    val df = randomRows(7, 60)
    val dec = df.select(col("seq").as("s"), col("op"), col("commit_ts"),
        col("start_ts"), col("schema_name"), col("table_name"), col("pk"),
        col("val_before"), col("val_after"), col("etype"),
        Codecs.debeziumToEnvelope(Codecs.debeziumDecode(Codecs.debezium(df))).as("dz"),
        Codecs.maxwellToEnvelope(Codecs.maxwellDecode(Codecs.maxwell(df))).as("mx"),
        Codecs.simpleToEnvelope(Codecs.simpleDecode(Codecs.simpleRow(df, 1))).as("sp"))
    for (e <- Seq("dz", "mx", "sp")) {
      val bad = dec.filter(
        !col(s"$e.op").eqNullSafe(col("op")) ||
          !col(s"$e.commit_ts").eqNullSafe(col("commit_ts")) ||
          !col(s"$e.schema_name").eqNullSafe(col("schema_name")) ||
          !col(s"$e.table_name").eqNullSafe(col("table_name")) ||
          !col(s"$e.pk").eqNullSafe(col("pk")) ||
          !col(s"$e.val_before").eqNullSafe(col("val_before")) ||
          !col(s"$e.val_after").eqNullSafe(col("val_after")) ||
          !col(s"$e.etype").eqNullSafe(col("etype"))).count()
      assert(bad == 0, s"decoder $e diverged on ${bad} rows")
    }
    // maxwell additionally carries the txn id
    assert(dec.filter(!col("mx.start_ts").eqNullSafe(col("start_ts"))).count() == 0)
  }

  test("csv round-trips random envelopes exactly (incl. embedded newlines)") {
    val df = randomRows(11, 60)
    val dec = df.select(col("op"), col("schema_name"), col("table_name"),
      col("commit_ts"), col("pk"),
      when(col("op") === "D", col("val_before")).otherwise(col("val_after")).as("val"),
      col("etype"),
      Codecs.csvDecode(Codecs.csvLine(df)).as("e"))
    val bad = dec.filter(
      !col("e.op").eqNullSafe(col("op")) ||
        !col("e.schema_name").eqNullSafe(col("schema_name")) ||
        !col("e.table_name").eqNullSafe(col("table_name")) ||
        !col("e.commit_ts").eqNullSafe(col("commit_ts")) ||
        !col("e.pk").eqNullSafe(col("pk")) ||
        !col("e.val").eqNullSafe(col("val")) ||
        !col("e.etype").eqNullSafe(col("etype"))).count()
    assert(bad == 0, s"csv decoder diverged on $bad rows")
  }

  test("open protocol round-trips the carried image exactly") {
    val df = randomRows(13, 60)
    val dec = df.select(col("op"), col("commit_ts"), col("schema_name"),
      col("table_name"), col("pk"),
      when(col("op") === "D", col("val_before")).otherwise(col("val_after")).as("val"),
      col("etype"),
      Codecs.openToEnvelope(
        Codecs.openDecodeKey(Codecs.openProtocolKey(df)),
        Codecs.openDecodeValue(Codecs.openProtocolValue(df))).as("e"))
    val bad = dec.filter(
      !col("e.op").eqNullSafe(when(col("op") === "D", "D").otherwise("I")) ||
        !col("e.commit_ts").eqNullSafe(col("commit_ts")) ||
        !col("e.schema_name").eqNullSafe(col("schema_name")) ||
        !col("e.tbl_name").eqNullSafe(col("table_name")) ||
        !col("e.pk").eqNullSafe(col("pk")) ||
        !col("e.val").eqNullSafe(col("val")) ||
        !col("e.etype").eqNullSafe(col("etype"))).count()
    assert(bad == 0, s"open decoder diverged on $bad rows")
  }
}
