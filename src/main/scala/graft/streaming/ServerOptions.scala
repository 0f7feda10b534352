package graft.streaming

/**
 * The SERVER config root (reference pkg/config/server_config.go:203-285
 * ValidateAndAdjust) — the last validation root after the changefeed root
 * (ReplicaValidate) and the four sink-URI surfaces. Composed of the
 * sub-config validators exactly as the Go chains them:
 *
 *  - cluster-id (:60-70, :326-342): non-empty, ≤128 chars, matching
 *    `^[a-zA-Z0-9]+(-[a-zA-Z0-9]+)*$`, and not one of the reserved words
 *    that collide with the old etcd key prefix;
 *  - address rules: `addr` must be non-empty; an empty `advertise-addr`
 *    inherits it; the advertise host:port must contain a port, and a
 *    literal unspecified IP (0.0.0.0 / ::) is rejected while domain names
 *    pass (Go skips a nil ParseIP);
 *  - gc-ttl 0 is an error; capture-session-ttl < 5 s warns and RESETS TO
 *    THE DEFAULT 10 (not to the floor 5 — etcd's minimum lease);
 *  - security: client-user-required with an empty allow-list is an error;
 *    without TLS it only warns;
 *  - sorter (sorter.go): cache-size-in-mb < 8 is an error;
 *  - kv-client (kvclient.go:58-70): region-scan-limit and
 *    region-retry-duration must be positive;
 *  - debug.messages (messages.go:99-155): zero/negative knobs FILL from
 *    defaults (batch interval 10 ms, batch size 64 MiB, batch count 1024,
 *    retry rate 1.0, pending 102400, ack 100 ms, keep-alive 30 s/10 s,
 *    worker pool 8, recv size 256 MiB), then the hard caps error —
 *    batch/ack intervals over 10 s, worker pool over 32, negative recv
 *    size (note: fill happens only at exactly 0; negatives error);
 *  - debug.db (db.go:74-81): compression ∈ {none, snappy};
 *  - debug.scheduler (scheduler_config.go:88-110): four positive knobs
 *    and check-balance-interval strictly over 1 s;
 *  - debug.cdcv2 (cdc_v2.go:47-62): when enabled, the meta store URI must
 *    be present and mysql-schemed.
 *
 * First error wins, in Go's evaluation order. Pure function of the config.
 */
object ServerOptions {

  val ReservedClusterIDs: Set[String] =
    Set("owner", "capture", "task", "changefeed", "job", "meta")

  private val ClusterIdRe = "^[a-zA-Z0-9]+(-[a-zA-Z0-9]+)*$".r

  def isValidClusterID(id: String): Boolean =
    id.nonEmpty && id.length <= 128 &&
      ClusterIdRe.matches(id) && !ReservedClusterIDs.contains(id)

  final case class Messages(
      clientMaxBatchIntervalMs: Long = 0L,
      clientMaxBatchSize: Long = 0L,
      clientMaxBatchCount: Long = 0L,
      clientRetryRateLimit: Double = 0.0,
      serverMaxPendingMessageCount: Long = 0L,
      serverAckIntervalMs: Long = 0L,
      serverWorkerPoolSize: Long = 0L,
      maxRecvMsgSize: Long = 0L,
      keepAliveTimeMs: Long = 0L,
      keepAliveTimeoutMs: Long = 0L)

  final case class ServerConfig(
      clusterId: String = "default",
      addr: String = "127.0.0.1:8300",
      advertiseAddr: String = "",
      gcTTLSec: Long = 24 * 60 * 60,
      captureSessionTTL: Long = 10,
      clientUserRequired: Boolean = false,
      clientAllowedUser: Seq[String] = Nil,
      tlsEnabled: Boolean = false,
      sorterCacheSizeMB: Long = 128,
      kvRegionScanLimit: Long = 40,
      kvRegionRetryDurationMs: Long = 60000,
      messages: Messages = Messages(),
      dbCompression: String = "none",
      schedHeartbeatTick: Long = 2,
      schedCollectStatsTick: Long = 200,
      schedMaxTaskConcurrency: Long = 10,
      schedCheckBalanceIntervalMs: Long = 60000,
      schedAddTableBatchSize: Long = 50,
      cdcV2Enable: Boolean = false,
      cdcV2MetaUri: String = "")

  final case class Adjusted(config: ServerConfig, warnings: Seq[String])

  /** Unspecified-IP detection mirroring Go's net.ParseIP + IsUnspecified:
    * only a LITERAL unspecified address trips it; non-IP strings (domain
    * names, bracketed hosts) parse to nil in Go and are skipped. */
  private def isUnspecifiedIp(host: String): Boolean =
    // the canonical literals only: Go's ParseIP rejects leading-zero
    // octets (nil -> skipped), so 0.0.0.0/:: are the unspecified spellings
    host == "0.0.0.0" || host == "::" || host == "0:0:0:0:0:0:0:0"

  def validateAndAdjust(c: ServerConfig): Either[(String, String), Adjusted] = {
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    def err(msg: String): Either[(String, String), Adjusted] =
      Left(("CDC:ErrInvalidServerOption", msg))

    if (!isValidClusterID(c.clusterId)) return err("bad cluster-id")
    if (c.addr.isEmpty) return err("empty address")
    var cfg = c
    if (cfg.advertiseAddr.isEmpty) cfg = cfg.copy(advertiseAddr = cfg.addr)
    val idx = cfg.advertiseAddr.lastIndexOf(':')
    if (idx >= 0) {
      if (isUnspecifiedIp(cfg.advertiseAddr.substring(0, idx)))
        return err("advertise address must be specified as a valid IP")
    } else
      return err("advertise address or address does not contain a port")
    if (cfg.gcTTLSec == 0) return err("empty GC TTL is not allowed")
    if (cfg.captureSessionTTL < 5) {
      warnings += "capture-session-ttl-too-small"
      cfg = cfg.copy(captureSessionTTL = 10)
    }
    if (cfg.clientUserRequired) {
      if (cfg.clientAllowedUser.isEmpty)
        return err(
          "client-allowed-user should not be empty when client-user-required is true")
      if (!cfg.tlsEnabled) warnings += "client-user-required-without-tls"
    }
    if (cfg.sorterCacheSizeMB < 8)
      return Left(("CDC:ErrIllegalSorterParameter",
        "cache-size-in-mb should be greater than 8(MB)"))
    if (cfg.kvRegionScanLimit <= 0)
      return err("region-scan-limit should be at least 1")
    if (cfg.kvRegionRetryDurationMs <= 0)
      return err("region-scan-limit should be positive")

    // debug.messages: zero-fill then hard caps (messages.go:99-155)
    var m = cfg.messages
    if (m.clientMaxBatchIntervalMs == 0)
      m = m.copy(clientMaxBatchIntervalMs = 10L)
    if (m.clientMaxBatchIntervalMs > 10000)
      return err("client-max-batch-interval is larger than 10s")
    if (m.clientMaxBatchSize <= 0)
      m = m.copy(clientMaxBatchSize = 64L * 1024 * 1024)
    if (m.clientMaxBatchCount <= 0) m = m.copy(clientMaxBatchCount = 1024L)
    if (m.clientRetryRateLimit <= 0.0) m = m.copy(clientRetryRateLimit = 1.0)
    if (m.serverMaxPendingMessageCount <= 0)
      m = m.copy(serverMaxPendingMessageCount = 102400L)
    if (m.serverAckIntervalMs == 0) m = m.copy(serverAckIntervalMs = 100L)
    if (m.keepAliveTimeMs == 0) m = m.copy(keepAliveTimeMs = 30000L)
    if (m.keepAliveTimeoutMs == 0) m = m.copy(keepAliveTimeoutMs = 10000L)
    if (m.serverAckIntervalMs > 10000)
      return err("server-ack-interval is larger than 10s")
    if (m.serverWorkerPoolSize <= 0) m = m.copy(serverWorkerPoolSize = 8L)
    if (m.serverWorkerPoolSize > 32)
      return err("server-worker-pool-size is larger than 32")
    if (m.maxRecvMsgSize == 0) m = m.copy(maxRecvMsgSize = 256L * 1024 * 1024)
    if (m.maxRecvMsgSize < 0)
      return err("max-recv-msg-size must be larger than 0")
    cfg = cfg.copy(messages = m)

    if (cfg.dbCompression != "none" && cfg.dbCompression != "snappy")
      return Left(("CDC:ErrIllegalSorterParameter",
        "sorter.leveldb.compression must be \"none\" or \"snappy\""))

    if (cfg.schedHeartbeatTick <= 0)
      return err("heartbeat-tick must be larger than 0")
    if (cfg.schedCollectStatsTick <= 0)
      return err("collect-stats-tick must be larger than 0")
    if (cfg.schedMaxTaskConcurrency <= 0)
      return err("max-task-concurrency must be larger than 0")
    if (cfg.schedCheckBalanceIntervalMs <= 1000)
      return err("check-balance-interval must be larger than 1s")
    if (cfg.schedAddTableBatchSize <= 0)
      return err("add-table-batch-size must be large than 0")

    if (cfg.cdcV2Enable) {
      if (cfg.cdcV2MetaUri.isEmpty)
        return Left(("error", "missing meta store uri configuration"))
      val scheme = cfg.cdcV2MetaUri.takeWhile(_ != ':')
      if (!cfg.cdcV2MetaUri.contains("://") || scheme != "mysql")
        return Left(("error",
          s"the $scheme scheme is not supported by meta store"))
    }

    Right(Adjusted(cfg, warnings.toSeq))
  }
}
