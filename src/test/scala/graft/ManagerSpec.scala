package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{ChangefeedManager, ChangefeedSpec, Sinks}

/** Changefeed CRUD lifecycle: create → pause → resume (continues from
  * checkpoint, no reprocessing) → delete. */
class ManagerSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(seq: Long, op: String, commit_ts: Long, start_ts: Long,
                        source_id: Int, schema_name: String, table_name: String,
                        pk: Long, pk_after: Long, val_before: Option[Double],
                        val_after: Option[Double], etype: String)

  private def ev(seq: Long, pk: Long, v: Double): Ev =
    Ev(seq, "I", 100 + seq, 99 + seq, 0, "db", "t", pk, pk, None, Some(v), "e")

  test("create/pause/resume/delete with checkpointed continuation") {
    val dir = Files.createTempDirectory("graft_mgr").toString
    val mgr = new ChangefeedManager(spark)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]

    mem.addData(ev(1, 1, 10), ev(2, 2, 20))
    mgr.create(ChangefeedSpec(id = "cf1", checkpointDir = s"$dir/ckpt"),
      () => mem.toDF())(Sinks.parquetStateSink(spark, s"$dir/state"))
    assert(mgr.list() == Seq("cf1"))
    assert(Sinks.readState(spark, s"$dir/state").count() == 2)

    mgr.pause("cf1")
    assert(mgr.status("cf1")("state") == "paused")

    // rows arriving while paused are picked up on resume, exactly once
    mem.addData(ev(3, 3, 30))
    mgr.resume("cf1")
    val state = Sinks.readState(spark, s"$dir/state")
      .select("pk", "final_val").as[(Long, Double)].collect().toMap
    assert(state == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))

    mgr.delete("cf1")
    assert(mgr.list().isEmpty)
    assert(mgr.status("cf1")("state") == "not-found")
  }
}
