package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.CdcStream
import graft.streaming.{Changefeed, ChangefeedSpec, Sinks}

/**
 * End-to-end with a REAL file source (S1's capture path for file-landed
 * change data): envelope rows stream in from a parquet directory, flow
 * through the changefeed pipeline, land in the state table — and the result
 * must equal the same pipeline run in batch mode.
 */
class FileSourceSpec extends SparkSpec {

  test("file-source changefeed equals batch pipeline result") {
    val base = Files.createTempDirectory("graft_fs").toString

    // land the derived change stream as sequentially-appended parquet
    // "captured files": the file source orders by modification time, so
    // chunks must be WRITTEN in capture order for per-key arrival order to
    // hold across microbatches (the real capture path guarantees this via
    // resolved-ts)
    val events = CdcStream.derive(spark, sf).cache()
    val maxSeq = events.agg(max(col("seq"))).collect()(0).getLong(0)
    val chunk = maxSeq / 6 + 1
    for (i <- 0L until 6L) {
      events.filter(col("seq") >= i * chunk && col("seq") < (i + 1) * chunk)
        .coalesce(1)
        .write.mode("append").parquet(s"$base/incoming")
      Thread.sleep(50) // strictly increasing modTime per chunk
    }

    val spec = ChangefeedSpec(id = "fs-test", checkpointDir = s"$base/ckpt")
    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", 2) // several microbatches, not one
      .parquet(s"$base/incoming")
    val q = Changefeed.start(spark, stream, spec)(
      Sinks.parquetStateSink(spark, s"$base/state"))
    q.awaitTermination()

    val streamed = Sinks.readState(spark, s"$base/state")
      .select("schema_name", "table_name", "pk", "final_val")

    val batch = graft.operators.Compaction.compact(
      Changefeed.pipeline(events, spec),
      keyCols = Seq("target_schema", "target_table", "pk"))
      .filter(col("net_op") =!= "D")
      .select(col("target_schema").as("schema_name"),
        col("target_table").as("table_name"), col("pk"), col("final_val"))

    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)
  }

  test("storage sink lays out schema/table/date partitions") {
    val base = Files.createTempDirectory("graft_store").toString
    val batch = CdcStream.derive(spark, sf).limit(100)
    Sinks.storageSink(s"$base/out")(batch, 0L)
    val dirs = new java.io.File(s"$base/out").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("schema_name=")))
    val reread = spark.read.parquet(s"$base/out")
    assert(reread.count() == 100)
    assert(reread.columns.contains("_date"))
    // schema sidecar written next to each table's partitions
    val sidecars = new java.io.File(s"$base/out").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.isDirectory)
      .map(d => new java.io.File(d, "_schema.json"))
    assert(sidecars.nonEmpty && sidecars.forall(_.exists()))
    val parsed = org.apache.spark.sql.types.DataType.fromJson(
      java.nio.file.Files.readString(sidecars.head.toPath))
    assert(parsed.isInstanceOf[org.apache.spark.sql.types.StructType])
  }
}
