package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Relay

/** S6 relay log: rotation, idempotent replay, position-pruned reads,
  * purge of sealed segments. */
class RelaySpec extends SparkSpec {
  import spark.implicits._

  private def batch(from: Long, n: Int) =
    (from until from + n).map(i => (i, i, "db", "t")).toDF("seq", "commit_ts", "schema_name", "table_name")

  test("writer rotates, reader prunes by position, purge drops sealed segments") {
    val dir = Files.createTempDirectory("graft_relay").toString

    // 3 batches × 10 rows, rotate at 15 → segments: seg0 (sealed at 20 rows), seg1
    Relay.relaySink(spark, dir, rotateRows = 15)(batch(1, 10), 0L)
    Relay.relaySink(spark, dir, rotateRows = 15)(batch(11, 10), 1L)
    Relay.relaySink(spark, dir, rotateRows = 15)(batch(21, 10), 2L)

    assert(Relay.position(dir) == Map("binlog-name" -> 1L, "binlog-pos" -> 30L))
    assert(Relay.readRelay(spark, dir).count() == 30)

    // replayed batchId is a no-op (at-least-once → exactly-once)
    Relay.relaySink(spark, dir, rotateRows = 15)(batch(21, 10), 2L)
    assert(Relay.readRelay(spark, dir).count() == 30)

    // resume from ts 20: sealed seg0 (max_ts 20) pruned entirely
    val resumed = Relay.readRelay(spark, dir, fromTs = 20L)
    assert(resumed.count() == 10)
    assert(resumed.agg(org.apache.spark.sql.functions.min("commit_ts"))
      .head().getLong(0) == 21L)

    // purge everything consumed up to ts 20 → seg0 gone, data intact after it
    assert(Relay.purgeRelay(dir, beforeTs = 20L) == Seq(0L))
    assert(Relay.readRelay(spark, dir, fromTs = 20L).count() == 10)
    // active segment never purged even if fully consumed
    assert(Relay.purgeRelay(dir, beforeTs = 100L).isEmpty)
  }

  test("relay writes gate through RelayControl; a crash auto-resumes via TaskChecker") {
    // the r17 kernel↔runtime wiring on the relay side: the REAL segment
    // writer only runs while the holder stage is Running (the
    // reference's relay goroutine), a process crash degrades to Paused,
    // and the task checker's relay slot dispatches the auto-resume that
    // reopens the loop — three kernels and the real storage composed.
    import graft.streaming.{RelayControl, TaskChecker}
    import graft.streaming.TaskChecker.{ProcessError, UnitStatus}
    import graft.streaming.ValidatorLifecycle.{Paused, Running}
    val dir = Files.createTempDirectory("graft_relay_lc").toString
    val rc = new RelayControl
    val tc = new TaskChecker(2.0, 1000L, 8000L, 5000L)
    var written = 0
    def pump(batchId: Long, from: Long): Unit =
      if (rc.stage == Running) {
        Relay.relaySink(spark, dir, rotateRows = 15)(batch(from, 10), batchId)
        written += 10
      }

    // enabled but no Running expectation yet → nothing writes
    rc.enableRelay()
    pump(0L, 1); assert(written == 0)

    // the expectant stage starts the New holder → writes flow
    val (label, err) = rc.operateRelayStage(Running)
    assert(label == RelayControl.OpErrTypeBeforeOp && err.isEmpty)
    pump(0L, 1); pump(1L, 11)
    assert(written == 20 && Relay.readRelay(spark, dir).count() == 20)

    // the relay process crashes with a RESUMABLE error → Paused
    rc.processExit(errors = 1)
    pump(2L, 21); assert(written == 20 && rc.stage == Paused)

    // the checker's relay slot sees the paused unit; its FIRST sighting
    // skips (fresh backoff clock), the next round dispatches the resume
    val st = UnitStatus(Paused, hasResult = true, isCanceled = false,
      Seq(ProcessError(0L, "", "transient read timeout")))
    val (s1, d1) = tc.checkRelayStatus(st, nowMs = 0L, () => {
      rc.operateRelay(RelayControl.ResumeRelay).isEmpty
    })
    assert(s1 == TaskChecker.ResumeSkip && !d1 && rc.stage == Paused)
    val (s2, d2) = tc.checkRelayStatus(st, nowMs = 6000L, () => {
      rc.operateRelay(RelayControl.ResumeRelay).isEmpty
    })
    assert(s2 == TaskChecker.ResumeDispatch && d2 && rc.stage == Running)

    // the reopened loop continues the SAME relay dir from its position
    pump(2L, 21)
    assert(written == 30 && Relay.readRelay(spark, dir).count() == 30)
    assert(Relay.position(dir)("binlog-pos") == 30L)

    // an UN-resumable relay error (bad uuid suffix) blocks auto-resume
    rc.processExit(errors = 1)
    val bad = UnitStatus(Paused, hasResult = true, isCanceled = false,
      Seq(ProcessError(30001L, "", "")))
    val (s3, d3) = tc.checkRelayStatus(bad, nowMs = 20000L, () => true)
    assert(s3 == TaskChecker.ResumeNoSense && !d3 && rc.stage == Paused)
  }

  test("relay decouples one source pull from N consumers") {
    val dir = Files.createTempDirectory("graft_relay2").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, String)]
    mem.addData((1L, 101L, "db", "t"), (2L, 102L, "db", "t"))

    // one streaming pull writes the relay...
    val q = mem.toDF().toDF("seq", "commit_ts", "schema_name", "table_name")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        Relay.relaySink(spark, s"$dir/relay")(b, id))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // ...two consumers read it at different positions, no upstream access
    assert(Relay.readRelay(spark, s"$dir/relay").count() == 2)
    assert(Relay.readRelay(spark, s"$dir/relay", fromTs = 101L)
      .select("seq").as[Long].collect().toSeq == Seq(2L))
  }
}
