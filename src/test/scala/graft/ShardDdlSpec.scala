package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.ShardDdl
import graft.streaming.ShardDdl.{DdlEvent, ResolvedDdl}

/** Streaming shard-DDL coordinator: barrier resolves exactly when the last
  * shard announces (G2 pessimistic semantics). */
class ShardDdlSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[DdlEvent]]): Seq[Seq[ResolvedDdl]] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DdlEvent]
    val out = collection.mutable.ArrayBuffer.empty[Seq[ResolvedDdl]]
    val resolved = ShardDdl.coordinate(spark, mem.toDS(), totalShards = 3)
    batches.foreach { b =>
      mem.addData(b: _*)
      val q = resolved.writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sddl").toString)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[ResolvedDdl], _: Long) =>
          out += df.collect().toSeq; ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    out.toSeq
  }

  test("barrier holds until all shards announce, then resolves once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DdlEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("sddl").toString
    val buf = collection.mutable.ArrayBuffer.empty[ResolvedDdl]
    def drain(): Unit = {
      val q = ShardDdl.coordinate(spark, mem.toDS(), totalShards = 3)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[ResolvedDdl], _: Long) =>
          buf ++= df.collect(); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    mem.addData(DdlEvent("t", 0, "add c", 100), DdlEvent("t", 1, "add c", 105))
    drain()
    assert(buf.isEmpty) // 2 of 3 shards: still locked

    mem.addData(DdlEvent("t", 2, "add c", 110))
    drain()
    assert(buf.toSeq == Seq(ResolvedDdl("t", "add c", 100, 3))) // resolves at first ts

    // distinct DDL on same table is an independent barrier
    mem.addData(DdlEvent("t", 0, "drop c", 200))
    drain()
    assert(buf.size == 1)
  }

  test("optimistic mode: schemas join as shards drift; type clash conflicts") {
    import graft.streaming.ShardDdl.{OptimisticUpdate, ShardSchema}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ShardSchema]
    val ckpt = java.nio.file.Files.createTempDirectory("optddl").toString
    val buf = collection.mutable.ArrayBuffer.empty[OptimisticUpdate]
    def drain(): Unit = {
      val q = ShardDdl.coordinateOptimistic(spark, mem.toDS())
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[OptimisticUpdate], _: Long) =>
          buf ++= df.collect(); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val base = Seq("pk" -> "BIGINT", "v" -> "DOUBLE")
    mem.addData(ShardSchema("t", 0, base, 100))
    mem.addData(ShardSchema("t", 1, base :+ ("c" -> "STRING"), 110))
    drain()
    // after shard 1 drifts, the joined schema carries the extra column
    assert(buf.last.conflict.isEmpty)
    assert(buf.last.joined.map(_._1) == Seq("pk", "v", "c"))

    // shard 0 later declares c with a DIFFERENT type -> conflict
    mem.addData(ShardSchema("t", 0, base :+ ("c" -> "BIGINT"), 120))
    drain()
    assert(buf.last.conflict.exists(_.contains("column c")))
  }
}
