package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ServerOptions
import graft.streaming.ServerOptions.{Messages, ServerConfig}

/** ServerOptions.validateAndAdjust vs a direct rule replay over random
  * configs (the DiffConfig/KafkaOptions property pattern), plus the
  * ordered-first-error and fill-vs-cap edges. */
class ServerOptionsSpec extends AnyFunSuite {

  private def replay(c: ServerConfig): (Int, String, Seq[String]) = {
    // an independent straight-line transcription of the Go chain
    val adv = if (c.advertiseAddr.isEmpty) c.addr else c.advertiseAddr
    val host = adv.lastIndexOf(':') match {
      case i if i >= 0 => Some(adv.substring(0, i))
      case _ => None
    }
    val reason =
      if (!(c.clusterId.nonEmpty && c.clusterId.length <= 128 &&
        c.clusterId.matches("^[a-zA-Z0-9]+(-[a-zA-Z0-9]+)*$") &&
        !ServerOptions.ReservedClusterIDs.contains(c.clusterId)))
        "cluster-id"
      else if (c.addr.isEmpty) "empty-addr"
      else if (host.isEmpty) "no-port"
      else if (Set("0.0.0.0", "::", "0:0:0:0:0:0:0:0").contains(host.get))
        "advertise-ip"
      else if (c.gcTTLSec == 0) "gc-ttl"
      else if (c.clientUserRequired && c.clientAllowedUser.isEmpty)
        "allowed-user"
      else if (c.sorterCacheSizeMB < 8) "sorter-cache"
      else if (c.kvRegionScanLimit <= 0) "region-scan"
      else if (c.kvRegionRetryDurationMs <= 0) "region-retry"
      else if ((if (c.messages.clientMaxBatchIntervalMs == 0) 10
        else c.messages.clientMaxBatchIntervalMs) > 10000) "batch-interval"
      else if ((if (c.messages.serverAckIntervalMs == 0) 100
        else c.messages.serverAckIntervalMs) > 10000) "ack-interval"
      else if ((if (c.messages.serverWorkerPoolSize <= 0) 8
        else c.messages.serverWorkerPoolSize) > 32) "worker-pool"
      else if (c.messages.maxRecvMsgSize < 0) "recv-size"
      else if (!Set("none", "snappy").contains(c.dbCompression))
        "db-compression"
      else if (c.schedHeartbeatTick <= 0) "heartbeat"
      else if (c.schedCollectStatsTick <= 0) "collect"
      else if (c.schedMaxTaskConcurrency <= 0) "concurrency"
      else if (c.schedCheckBalanceIntervalMs <= 1000) "balance"
      else if (c.schedAddTableBatchSize <= 0) "add-batch"
      else if (c.cdcV2Enable && c.cdcV2MetaUri.isEmpty) "meta-uri"
      else if (c.cdcV2Enable &&
        c.cdcV2MetaUri.takeWhile(_ != ':') != "mysql") "meta-scheme"
      else ""
    val warns =
      if (reason.nonEmpty) Nil
      else Seq(
        if (c.captureSessionTTL < 5) Some("capture-session-ttl-too-small")
        else None,
        if (c.clientUserRequired && c.clientAllowedUser.nonEmpty &&
          !c.tlsEnabled) Some("client-user-required-without-tls")
        else None).flatten
    (if (reason.isEmpty) 1 else 0, reason, warns)
  }

  test("validateAndAdjust equals the rule replay on 400 random configs") {
    val rnd = new scala.util.Random(1407L)
    def pick[T](xs: T*): T = xs(rnd.nextInt(xs.size))
    for (_ <- 0 until 400) {
      val cfg = ServerConfig(
        clusterId = pick("default", "owner", "bad_id", "ok-id-2", "",
          "a" * 129, "a" * 128),
        addr = pick("127.0.0.1:8300", "", "host:1"),
        advertiseAddr = pick("", "0.0.0.0:1", ":::9", "x.y:1", "noport",
          "10.0.0.1:8300"),
        gcTTLSec = pick(0L, 1L, 86400L),
        captureSessionTTL = pick(0L, 3L, 5L, 10L),
        clientUserRequired = rnd.nextBoolean(),
        clientAllowedUser = if (rnd.nextBoolean()) Seq("u") else Nil,
        tlsEnabled = rnd.nextBoolean(),
        sorterCacheSizeMB = pick(7L, 8L, 128L),
        kvRegionScanLimit = pick(-1L, 0L, 40L),
        kvRegionRetryDurationMs = pick(0L, 60000L),
        messages = Messages(
          clientMaxBatchIntervalMs = pick(0L, 10L, 10000L, 10001L),
          clientMaxBatchSize = pick(-5L, 0L, 1024L),
          serverAckIntervalMs = pick(0L, 100L, 10001L),
          serverWorkerPoolSize = pick(-1L, 0L, 8L, 32L, 33L),
          maxRecvMsgSize = pick(-1L, 0L, 1024L)),
        dbCompression = pick("none", "snappy", "zstd"),
        schedHeartbeatTick = pick(0L, 2L),
        schedCollectStatsTick = pick(0L, 200L),
        schedMaxTaskConcurrency = pick(0L, 10L),
        schedCheckBalanceIntervalMs = pick(999L, 1000L, 1001L, 60000L),
        schedAddTableBatchSize = pick(0L, 50L),
        cdcV2Enable = rnd.nextBoolean(),
        cdcV2MetaUri = pick("", "mysql://u@h:3306/d", "etcd://h"))
      val (ok, reason, warns) = replay(cfg)
      ServerOptions.validateAndAdjust(cfg) match {
        case Left((_, msg)) =>
          assert(ok == 0, s"cfg=$cfg expected ok but got $msg")
          // the replay's reason must appear as the first failing rule
          assert(reasonOf(msg) == reason, s"cfg=$cfg msg=$msg")
        case Right(a) =>
          assert(ok == 1, s"cfg=$cfg expected $reason")
          assert(a.warnings == warns, s"cfg=$cfg")
          // fills landed
          assert(a.config.messages.clientMaxBatchIntervalMs > 0)
          assert(a.config.messages.clientMaxBatchSize > 0)
          assert(a.config.messages.serverWorkerPoolSize > 0)
          assert(a.config.messages.maxRecvMsgSize > 0)
          assert(a.config.captureSessionTTL >= 5)
          assert(a.config.advertiseAddr.nonEmpty)
      }
    }
  }

  private def reasonOf(msg: String): String =
    if (msg.contains("cluster-id")) "cluster-id"
    else if (msg == "empty address") "empty-addr"
    else if (msg.contains("valid IP")) "advertise-ip"
    else if (msg.contains("contain a port")) "no-port"
    else if (msg.contains("GC TTL")) "gc-ttl"
    else if (msg.contains("client-allowed-user")) "allowed-user"
    else if (msg.contains("cache-size-in-mb")) "sorter-cache"
    else if (msg.contains("at least 1")) "region-scan"
    else if (msg.contains("should be positive")) "region-retry"
    else if (msg.contains("client-max-batch-interval")) "batch-interval"
    else if (msg.contains("server-ack-interval")) "ack-interval"
    else if (msg.contains("server-worker-pool-size")) "worker-pool"
    else if (msg.contains("max-recv-msg-size")) "recv-size"
    else if (msg.contains("compression")) "db-compression"
    else if (msg.contains("heartbeat-tick")) "heartbeat"
    else if (msg.contains("collect-stats-tick")) "collect"
    else if (msg.contains("max-task-concurrency")) "concurrency"
    else if (msg.contains("check-balance-interval")) "balance"
    else if (msg.contains("add-table-batch-size")) "add-batch"
    else if (msg.contains("missing meta store")) "meta-uri"
    else if (msg.contains("not supported by meta store")) "meta-scheme"
    else "other"

  test("session ttl repairs to the DEFAULT 10, not the floor 5") {
    val r = ServerOptions.validateAndAdjust(ServerConfig(captureSessionTTL = 4))
    assert(r.toOption.get.config.captureSessionTTL == 10)
  }

  test("recv-msg-size: exact zero fills, negative errors") {
    val z = ServerOptions.validateAndAdjust(
      ServerConfig(messages = Messages(maxRecvMsgSize = 0)))
    assert(z.toOption.get.config.messages.maxRecvMsgSize == 256L * 1024 * 1024)
    val n = ServerOptions.validateAndAdjust(
      ServerConfig(messages = Messages(maxRecvMsgSize = -1)))
    assert(n.isLeft)
  }
}
