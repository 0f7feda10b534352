package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ReplicaValidate
import graft.streaming.ReplicaValidate._

/** replica_config.go ValidateAndAdjust — the ADJUST legs the q251 error
  * matrix doesn't surface: default fills, the integrity downgrade, the
  * dispatcher→partition migration, and a randomized bounds property. */
class ReplicaValidateSpec extends AnyFunSuite {

  private def ok(scheme: String, uri: Map[String, String], c: ReplicaConfig)
      : Validated =
    validateAndAdjust(scheme, uri, c).toOption
      .getOrElse(fail(s"expected Right for $c"))

  test("fills: memory quota, terminator, advance timeout, redo defaults") {
    val v = ok("kafka", Map("protocol" -> "simple"),
      ReplicaConfig(consistent = ConsistentConfig(level = "eventual")))
    assert(v.config.memoryQuota == 1024L * 1024 * 1024)
    assert(v.config.terminator.contains("\r\n"))
    assert(v.config.advanceTimeoutSec == 150 &&
      v.warnings.contains("advance-timeout-defaulted"))
    val cc = v.config.consistent
    assert(cc.maxLogSize == 64 && cc.flushIntervalMs == 2000 &&
      cc.metaFlushIntervalMs == 200 && cc.encodingWorkerNum == 16 &&
      cc.flushWorkerNum == 8)
    // level none: NOTHING runs — zeros stay zeros (consistent.go:76-78)
    val off = ok("mysql", Map.empty, ReplicaConfig())
    assert(off.config.consistent.maxLogSize == 0)
    // mysql skips the sink-block adjusts entirely
    assert(off.config.terminator.isEmpty && off.config.advanceTimeoutSec == 0)
  }

  test("integrity downgrades on non-kafka with a warn; kafka keeps it") {
    val v = ok("s3", Map("protocol" -> "csv"),
      ReplicaConfig(advanceTimeoutSec = 150,
        integrityCheckLevel = "correctness"))
    assert(v.config.integrityCheckLevel == "none" &&
      v.warnings.contains("integrity-disabled-non-kafka"))
    val k = ok("kafka", Map("protocol" -> "simple"),
      ReplicaConfig(advanceTimeoutSec = 150,
        integrityCheckLevel = "correctness"))
    assert(k.config.integrityCheckLevel == "correctness")
    // the downgrade neutralizes the column-selector conflict off-kafka
    assert(validateAndAdjust("s3", Map("protocol" -> "csv"),
      ReplicaConfig(advanceTimeoutSec = 150,
        integrityCheckLevel = "correctness",
        columnSelectors = Seq("t.*"))).isRight)
  }

  test("dispatcher rule migrates into partition and clears itself") {
    val v = ok("kafka", Map("protocol" -> "simple"),
      ReplicaConfig(advanceTimeoutSec = 150, dispatchRules = Seq(
        DispatchRule("a.*", dispatcherRule = "index-value"),
        DispatchRule("b.*", partitionRule = "ts"))))
    assert(v.config.dispatchRules == Seq(
      DispatchRule("a.*", "", "index-value"),
      DispatchRule("b.*", "", "ts")))
  }

  test("protocol folding: default→open-protocol, flat-avro→avro, case-insensitive") {
    assert(parseProtocol("DEFAULT") == Right("open-protocol"))
    assert(parseProtocol("flat-avro") == Right("avro"))
    assert(parseProtocol("Canal-JSON") == Right("canal-json"))
    assert(parseProtocol("protobuf").swap.toOption.get._1 ==
      "ErrSinkUnknownProtocol")
  }

  test("bounds property: sync-point/stuck/redo floors over 300 random configs") {
    val rnd = new scala.util.Random(1307L)
    for (trial <- 0 until 300) {
      val enable = rnd.nextBoolean()
      val interval = rnd.nextInt(120).toLong
      val retention = rnd.nextInt(7200).toLong
      val stuck = rnd.nextInt(3600).toLong
      val flush = rnd.nextInt(200).toLong
      val redoOn = rnd.nextBoolean()
      val c = ReplicaConfig(advanceTimeoutSec = 150,
        enableSyncPoint = enable,
        syncPointIntervalSec = Some(interval),
        syncPointRetentionSec = Some(retention),
        errorStuckDurationSec = Some(stuck),
        consistent = ConsistentConfig(
          level = if (redoOn) "eventual" else "none",
          flushIntervalMs = flush))
      val res = validateAndAdjust("mysql", Map.empty, c)
      // independent replay: FIRST failing rule in the reference's order
      val expect: Option[String] =
        if (redoOn && flush != 0 && flush < 50) Some(ErrInvalidReplicaConfig)
        else if (enable && interval < 30) Some(ErrInvalidReplicaConfig)
        else if (enable && retention < 3600) Some(ErrInvalidReplicaConfig)
        else if (stuck < 1800) Some(ErrInvalidReplicaConfig)
        else None
      (res, expect) match {
        case (Left((e, _)), Some(x)) => assert(e == x, s"trial $trial $c")
        case (Right(v), None) =>
          if (redoOn)
            assert(v.config.consistent.flushIntervalMs ==
              (if (flush == 0) 2000 else flush), s"trial $trial")
        case (got, exp) => fail(s"trial $trial: got $got, expected $exp ($c)")
      }
    }
  }
}
