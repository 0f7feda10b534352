package graft

import org.apache.spark.sql.functions._
import graft.core.CdcStream
import graft.operators.{Compaction, Transforms, VectorOps}
import graft.streaming.{Sinks, StorageConsumer}

/** Storage sink → consumer round trip, and int8 quantized ranking. */
class StorageConsumerSpec extends SparkSpec {
  import spark.implicits._

  test("consumer reads back exactly what the sink wrote") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sc_spec").toString
    val events = Transforms.updateSplit(CdcStream.derive(spark, sf))
    Sinks.storageSink(base)(events, 0L)

    val sidecars = StorageConsumer.sidecars(base)
    assert(sidecars.nonEmpty, "sink must write _schema.json sidecars")
    assert(sidecars.values.forall(s =>
      !s.fieldNames.contains("schema_name") && s.fieldNames.contains("pk")),
      "sidecar is the payload schema, partition identities excluded")

    val back = StorageConsumer.read(spark, base)
    assert(back.count() == events.count())
    // state replayed from the files equals state compacted from the stream
    val viaFiles = Compaction.compact(back)
      .select("schema_name", "table_name", "pk", "net_op")
      .as[(String, String, Long, String)].collect().toSet
    val direct = Compaction.compact(events)
      .select("schema_name", "table_name", "pk", "net_op")
      .as[(String, String, Long, String)].collect().toSet
    assert(viaFiles == direct)
  }

  test("versioned consumer reads per-(table,version) sidecars: tables may diverge at one version") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sc_diverge").toString
    // two tables, SAME version number, structurally different payloads —
    // the reference model is a schema.json per {table, version}, so this
    // layout must read cleanly (t1 rows surface NULL for t2-only columns)
    val t1 = Seq((1L, 1700000000000L, "a")).toDF("pk", "commit_ts", "val_after")
      .withColumn("schema_name", lit("s")).withColumn("table_name", lit("t1"))
    val t2 = Seq((2L, 1700000000000L, "b", 7L))
      .toDF("pk", "commit_ts", "val_after", "extra")
      .withColumn("schema_name", lit("s")).withColumn("table_name", lit("t2"))
    Sinks.storageSink(base, schemaVersion = Some(1))(t1, 0L)
    Sinks.storageSink(base, schemaVersion = Some(1))(t2, 1L)

    val back = StorageConsumer.readVersioned(spark, base)
    assert(back.count() == 2)
    assert(back.columns.contains("extra"))
    assert(back.filter(col("table_name") === "t1").select("extra").head().isNullAt(0))
    assert(back.filter(col("table_name") === "t2")
      .select("pk", "extra").as[(Long, Long)].head() == ((2L, 7L)))
  }

  test("int8 quantization stays in byte range and preserves self-rank") {
    val e = graft.core.Tables.load(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"), VectorOps.quantizeInt8(col("embedding")).as("q"))
    val bounds = e.select(array_min(col("q")).as("lo"), array_max(col("q")).as("hi"))
      .agg(min("lo"), max("hi")).as[(Long, Long)].head()
    assert(bounds._1 >= -127L && bounds._2 <= 127L, s"int8 range: $bounds")
    // a vector's quantized dot with itself beats its dot with any other
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        VectorOps.dotQ(col("a.q"), col("b.q")).as("d"))
      .as[(Long, Long, Long)].collect()
    val self = pairs.filter(p => p._1 == p._2).map(p => p._1 -> p._3).toMap
    pairs.filter(p => p._1 != p._2).foreach { case (ia, ib, d) =>
      assert(d <= self(ia), s"self-dot must dominate: $ia vs $ib")
    }
  }

  test("storage layout: separator variants, counter reset, index cursor") {
    import graft.streaming.StorageLayout
    // two days of events for one table: 3 rows day 1, 2 rows day 2
    val day = 86400L
    val ev = Seq(
      (1L, "db", "t", day + 10), (2L, "db", "t", day + 20),
      (3L, "db", "t", day + 30),
      (4L, "db", "t", 2 * day + 10), (5L, "db", "t", 2 * day + 20))
      .toDF("seq", "schema_name", "table_name", "commit_ts")
    val plan = StorageLayout.filePlan(ev, lit(5L), col("commit_ts"), "day",
      fileIndexWidth = 6, extension = ".csv", rowsPerFile = 2L)
    val got = plan.select("seq", "data_path").as[(Long, String)]
      .collect().toMap
    // day 1: rows 1-2 → CDC000001, row 3 → CDC000002; day 2 RESETS to 1
    assert(got(1L) == "db/t/5/1970-01-02/CDC000001.csv")
    assert(got(3L) == "db/t/5/1970-01-02/CDC000002.csv")
    assert(got(4L) == "db/t/5/1970-01-03/CDC000001.csv")
    // index cursor names the LAST file per dir
    val idx = StorageLayout.indexFiles(plan, 6, ".csv")
      .select("index_path", "index_content").as[(String, String)]
      .collect().toMap
    assert(idx("db/t/5/1970-01-02/meta/CDC.index") == "CDC000002.csv")
    assert(idx("db/t/5/1970-01-03/meta/CDC.index") == "CDC000001.csv")
    // separator variants change only the date segment; "none" drops it
    def pathOf(sep: String): String =
      StorageLayout.filePlan(ev.filter(col("seq") === 1), lit(5L),
        col("commit_ts"), sep, 6, ".parquet", 2L)
        .select("data_path").as[String].head()
    assert(pathOf("year") == "db/t/5/1970/CDC000001.parquet")
    assert(pathOf("month") == "db/t/5/1970-01/CDC000001.parquet")
    assert(pathOf("none") == "db/t/5/CDC000001.parquet")
    // schema sidecar: crc32 checksum zero-padded to 10 digits
    val sp = ev.limit(1).select(StorageLayout.schemaFilePath(
      col("schema_name"), col("table_name"), lit(5L),
      lit("""{"cols":[1]}""")).as("p")).as[String].head()
    assert(sp.matches("db/t/meta/schema_5_\\d{10}\\.json"), sp)
  }
}
