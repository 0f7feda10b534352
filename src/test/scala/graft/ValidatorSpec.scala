package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.Validator

/** V5 — pending/error row lifecycle across validation rounds against a
  * lagging target (the reference's validate_worker + checkpoint flow). */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private def expected(rows: (Long, Double)*): DataFrame =
    rows.map { case (pk, v) => ("db", "t", pk, v) }
      .toDF("schema_name", "table_name", "pk", "exp_val")

  private def target(rows: (Long, Double)*): DataFrame =
    rows.map { case (pk, v) => ("db", "t", pk, v) }
      .toDF("schema_name", "table_name", "pk", "tgt_val")

  test("a lagging row moves pending -> ok once the target catches up") {
    val dir = Files.createTempDirectory("validator").toString
    // round 1: target has pk=1 applied, pk=2 not yet
    val r1 = Validator.validateRound(spark, dir,
      expected(1L -> 10.0, 2L -> 20.0), target(1L -> 10.0), batchTs = 1L)
    assert(r1.ok === 1 && r1.pending === 1 && r1.newErrors === 0)
    val p1 = Validator.pendingState(spark, dir).as[(String, String, Long, Double, Long, Int)].collect()
    assert(p1.map(_._3).toSeq === Seq(2L) && p1.head._6 === 1)

    // round 2: target caught up -> pending drains, nothing new
    val r2 = Validator.validateRound(spark, dir,
      expected(), target(1L -> 10.0, 2L -> 20.0), batchTs = 2L)
    assert(r2.ok === 1 && r2.pending === 0 && r2.newErrors === 0)
  }

  test("persistently failing rows escalate to the error table after the delay") {
    val dir = Files.createTempDirectory("validator2").toString
    // pk=3 never arrives downstream
    Validator.validateRound(spark, dir, expected(3L -> 30.0), target(), 1L, errorDelay = 3)
    Validator.validateRound(spark, dir, expected(), target(), 2L, errorDelay = 3)
    Validator.validateRound(spark, dir, expected(), target(), 3L, errorDelay = 3)
    val r4 = Validator.validateRound(spark, dir, expected(), target(), 4L, errorDelay = 3)
    assert(r4.newErrors === 1 && r4.pending === 0)
    val errs = Validator.errorRows(spark, dir)
    assert(errs.count() === 1)
    val e = errs.select("pk", "failed_cnt", "first_fail_ts").head()
    assert(e.getLong(0) === 3L && e.getInt(1) === 4 && e.getLong(2) === 1L)
  }

  test("a new change for a pending key replaces it and resets the clock") {
    val dir = Files.createTempDirectory("validator3").toString
    Validator.validateRound(spark, dir, expected(5L -> 1.0), target(), 1L, errorDelay = 3)
    Validator.validateRound(spark, dir, expected(5L -> 2.0), target(), 3L, errorDelay = 3)
    val p = Validator.pendingState(spark, dir)
      .select("exp_val", "first_fail_ts", "failed_cnt").head()
    // replaced image, clock restarted at ts=3, count restarted at 1
    assert(p.getDouble(0) === 2.0 && p.getLong(1) === 3L && p.getInt(2) === 1)
    // and the value mismatch case: target has the OLD value -> still pending
    val r = Validator.validateRound(spark, dir, expected(), target(5L -> 1.0), 4L, errorDelay = 3)
    assert(r.pending === 1 && r.ok === 0)
  }

  test("live rounds gate through the lifecycle: stop halts, restart resets") {
    // the r17 kernel↔runtime wiring (the q285 machine driving the REAL
    // validateRound loop, mirroring how the reference's doValidate only
    // consumes events while the DataValidator stage is Running, and how
    // dmctl validation stop/start wraps the same object)
    import graft.streaming.ValidatorLifecycle
    import graft.streaming.ValidatorLifecycle._
    val dir = Files.createTempDirectory("validator_lc").toString
    val lc = new ValidatorLifecycle(ModeFast)
    var rounds = 0
    def round(ts: Long, exp: DataFrame, tgt: DataFrame): Unit =
      // the worker loop consults the stage exactly like doValidate's
      // context: no round runs unless the validator is Running
      if (lc.stage == Running) {
        Validator.validateRound(spark, dir, exp, tgt, batchTs = ts)
        rounds += 1
      }

    // subtask starts WITHOUT the validator expectation → nothing runs
    lc.subtaskRun(Running, InvalidStage, nowMs = 0L)
    round(1L, expected(1L -> 10.0), target())
    assert(rounds == 0 && lc.stage == InvalidStage)

    // dmctl validation start → rounds flow; pk=1 goes pending
    lc.startValidator(Running, nowMs = 10L)
    round(1L, expected(1L -> 10.0), target())
    assert(rounds == 1)
    assert(Validator.pendingState(spark, dir).count() == 1)

    // subtask pause does NOT stop the validator (the independence)
    lc.subtaskPause()
    round(2L, expected(), target(1L -> 10.0))
    assert(rounds == 2 && lc.stage == Running)
    assert(Validator.pendingState(spark, dir).count() == 0)

    // dmctl validation stop → the loop halts mid-stream
    lc.stopValidator()
    round(3L, expected(2L -> 20.0), target())
    assert(rounds == 2 && lc.stage == Stopped)

    // restart on the SAME handle resumes the loop
    lc.startValidator(Running, nowMs = 40L)
    round(4L, expected(2L -> 20.0), target(2L -> 20.0))
    assert(rounds == 3)

    // subtask close discards the handle → InvalidStage, loop dead
    lc.subtaskClose()
    round(5L, expected(3L -> 30.0), target())
    assert(rounds == 3 && lc.stage == InvalidStage)
  }

  test("stall flag trips when pending exceeds the cap") {
    val dir = Files.createTempDirectory("validator4").toString
    val r = Validator.validateRound(spark, dir,
      expected((1L to 50L).map(i => i -> i.toDouble): _*), target(), 1L,
      errorDelay = 10, maxPending = 10L)
    assert(r.pending === 50 && r.stalled)
  }
}
