package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{Redo, Sinks}

/** Syncpoint bookkeeping and WAL replay (W3/W4). */
class RedoSpec extends SparkSpec {
  import spark.implicits._

  test("syncpoints record and read back in batch order") {
    val dir = Files.createTempDirectory("graft_sp").toString
    Redo.writeSyncpoint(dir, 0, 105)
    Redo.writeSyncpoint(dir, 1, 210)
    assert(Redo.syncpoints(dir) == Seq((0L, 105L), (1L, 210L)))
  }

  test("redo replay applies only the (checkpoint, resolved] window, idempotently") {
    val base = Files.createTempDirectory("graft_redo").toString
    val wal = Seq(
      // (seq, op, commit_ts, pk, val_after); pk_after = pk (no churn)
      (1L, "I", 100L, 1L, Some(10.0)),
      (2L, "I", 150L, 2L, Some(20.0)),
      (3L, "U", 250L, 1L, Some(11.0)),
      (4L, "D", 300L, 2L, None),
      (5L, "I", 400L, 3L, Some(30.0))) // beyond resolvedTs — must not apply
      .toDF("seq", "op", "commit_ts", "pk", "val_after")
      .withColumn("start_ts", col("commit_ts") - 1)
      .withColumn("schema_name", lit("db")).withColumn("table_name", lit("t"))
      .withColumn("pk_after", col("pk"))
      .withColumn("val_before", lit(null).cast("double"))
      .withColumn("etype", lit("e"))
    wal.write.parquet(s"$base/wal")

    Redo.replay(spark, s"$base/wal", s"$base/state", checkpointTs = 0L, resolvedTs = 300L)
    val s1 = Sinks.readState(spark, s"$base/state")
      .select("pk", "final_val").as[(Long, Double)].collect().toMap
    assert(s1 == Map(1L -> 11.0)) // pk2 deleted at 300, pk3 beyond window

    // replaying the same window again converges to the same state
    Redo.replay(spark, s"$base/wal", s"$base/state", checkpointTs = 0L, resolvedTs = 300L)
    val s2 = Sinks.readState(spark, s"$base/state")
      .select("pk", "final_val").as[(Long, Double)].collect().toMap
    assert(s2 == s1)
  }

  test("event-time watermark drops late rows in windowed aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)] // (event epoch seconds, value)
    val windowed = mem.toDF().toDF("ts", "v")
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", "10 seconds")
      .groupBy(window(col("event_time"), "1 minute"))
      .agg(count(lit(1)).as("cnt"))
    val ckpt = Files.createTempDirectory("graft_wm").toString
    var rows = Map.empty[Long, Long]
    def drain(): Unit = {
      val q = windowed.writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          rows ++= df.select(unix_timestamp(col("window.start")), col("cnt"))
            .as[(Long, Long)].collect().toMap
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData((60L, 1.0), (70L, 1.0), (200L, 1.0)) // watermark → 190s
    drain()
    mem.addData((65L, 1.0)) // 125s late vs watermark: dropped
    drain()
    assert(rows(60L) == 2L) // late row did not bump the 1-minute window
  }
}
