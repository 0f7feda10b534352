package graft.streaming

/**
 * Changefeed-level config validation root (SURVEY.md §2.12 L1):
 * `ReplicaConfig.ValidateAndAdjust` (pkg/config/replica_config.go:245-328)
 * — the composition every `cdc changefeed create` runs, modeled pure like
 * the sink option surfaces it composes with:
 *
 *  - Sink block (pkg/config/sink.go:706-905): the URI's
 *    `protocol`/`transaction-atomicity` params override the file block
 *    (a conflict only WARNS at create — ErrIncompatibleSinkConfig is
 *    deliberately swallowed, :824-838); `table` atomicity is rejected on
 *    MQ schemes (:114-130); a `protocol` on a MySQL-compatible scheme is
 *    an error (:848-852); MQ/storage schemes REQUIRE a parseable protocol
 *    (ErrSinkUnknownProtocol via :860-866 — `default` folds to
 *    open-protocol, `flat-avro` to avro, sink_protocol.go:51-79);
 *    `output-raw-change-event` without old values only warns (:885-905).
 *    Then encoder-concurrency ≥ 0, terminator default CRLF, the
 *    CSV×delete-only-handle-keys conflict, storage-scheme extras
 *    (date-separator enum, silent file-index-width reset, CSV quote/
 *    delimiter/binary-encoding rules :266-318), and advance-timeout
 *    default-fill 150 s.
 *  - Consistent (redo) block (pkg/config/consistent.go:75-121): level
 *    `none` skips everything; `eventual` fills defaults (max-log-size 64,
 *    flush 2000 ms, meta-flush 200 ms, encoding/flush workers 16/8),
 *    enforces the 50 ms flush floor on both intervals, compression
 *    none/lz4 only, and the storage scheme must be one of
 *    blackhole/local/nfs/file/s3/gcs/gs/azblob/azure/noop
 *    (pkg/redo/config.go:151-189).
 *  - Sync-point bounds (:261-278): interval ≥ 30 s, retention ≥ 1 h —
 *    only when sync-point is enabled.
 *  - memory-quota 0 → 1 GiB default (server_config.go:48).
 *  - Integrity (:295-315): non-Kafka scheme downgrades an enabled check
 *    to `none` with a warn; integrity + column selectors is an error.
 *  - changefeed-error-stuck-duration ≥ 30 min (:317-325).
 *  - Dispatch rules (:761-777): `dispatcher` and `partition` both set is
 *    an error; a lone `dispatcher` value moves into `partition`.
 */
object ReplicaValidate {

  val DefaultMemoryQuota: Long = 1024L * 1024 * 1024
  val MinSyncPointIntervalSec = 30L
  val MinSyncPointRetentionSec = 3600L
  val MinErrorStuckDurationSec = 1800L
  val DefaultAdvanceTimeoutSec = 150L
  val CRLF = "\r\n"

  val ErrInvalidReplicaConfig = "ErrInvalidReplicaConfig"
  val ErrSinkInvalidConfig = "ErrSinkInvalidConfig"
  val ErrSinkURIInvalid = "ErrSinkURIInvalid"
  val ErrSinkUnknownProtocol = "ErrSinkUnknownProtocol"
  val ErrConsistentStorage = "ErrConsistentStorage"

  /** sink_protocol.go:51-79 — canonical protocol names. */
  def parseProtocol(p: String): Either[(String, String), String] =
    p.toLowerCase match {
      case "default" | "open-protocol" => Right("open-protocol")
      case "avro" | "flat-avro" => Right("avro")
      case s @ ("canal" | "maxwell" | "canal-json" | "craft" | "csv" |
                "debezium" | "simple") => Right(s)
      case other => Left(ErrSinkUnknownProtocol -> other)
    }

  def isMqScheme(s: String): Boolean =
    Set("kafka", "kafka+ssl")(s) || PulsarOptions.isPulsarScheme(s)

  final case class CsvConfig(
      quote: String = "\"", delimiter: String = ",",
      binaryEncodingMethod: String = "hex", outputOldValue: Boolean = false)

  /** CSVConfig.validateAndAdjust (sink.go:266-318). */
  def validateCsv(c: CsvConfig): Either[(String, String), Unit] = {
    if (c.quote.length > 1)
      return Left(ErrSinkInvalidConfig ->
        "csv config quote contains more than one character")
    if (c.quote.length == 1 && (c.quote(0) == '\r' || c.quote(0) == '\n'))
      return Left(ErrSinkInvalidConfig ->
        "csv config quote cannot be line break character")
    c.delimiter.length match {
      case 0 => return Left(ErrSinkInvalidConfig ->
        "csv config delimiter cannot be empty")
      case n if n <= 3 =>
        if (c.delimiter.exists(ch => ch == '\r' || ch == '\n'))
          return Left(ErrSinkInvalidConfig ->
            "csv config delimiter contains line break characters")
      case _ => return Left(ErrSinkInvalidConfig ->
        "csv config delimiter contains more than three characters")
    }
    if (c.quote.nonEmpty && c.delimiter.exists(c.quote.contains(_)))
      return Left(ErrSinkInvalidConfig ->
        "csv config quote and delimiter has common characters")
    if (c.binaryEncodingMethod != "hex" && c.binaryEncodingMethod != "base64")
      return Left(ErrSinkInvalidConfig ->
        "csv config binary-encoding-method can only be hex or base64")
    Right(())
  }

  final case class ConsistentConfig(
      level: String = "none", maxLogSize: Long = 0,
      flushIntervalMs: Long = 0, metaFlushIntervalMs: Long = 0,
      compression: String = "", encodingWorkerNum: Int = 0,
      flushWorkerNum: Int = 0, storage: String = "blackhole://")

  private val consistentStorages = Set("blackhole", "local", "nfs", "file",
    "s3", "gcs", "gs", "azblob", "azure", "noop")

  /** ConsistentConfig.ValidateAndAdjust (consistent.go:75-121). */
  def validateConsistent(c: ConsistentConfig)
      : Either[(String, String), ConsistentConfig] = {
    if (c.level != "eventual") return Right(c) // none/"" — nothing runs
    var o = c
    if (o.maxLogSize == 0) o = o.copy(maxLogSize = 64)
    if (o.flushIntervalMs == 0) o = o.copy(flushIntervalMs = 2000)
    if (o.flushIntervalMs < 50)
      return Left(ErrInvalidReplicaConfig ->
        s"The consistent.flush-interval:${o.flushIntervalMs} must be equal or greater than 50")
    if (o.metaFlushIntervalMs == 0) o = o.copy(metaFlushIntervalMs = 200)
    if (o.metaFlushIntervalMs < 50)
      return Left(ErrInvalidReplicaConfig ->
        s"The consistent.meta-flush-interval:${o.metaFlushIntervalMs} must be equal or greater than 50")
    if (o.compression.nonEmpty && o.compression != "none" &&
        o.compression != "lz4")
      return Left(ErrInvalidReplicaConfig ->
        s"The consistent.compression:${o.compression} must be 'none' or 'lz4'")
    if (o.encodingWorkerNum == 0) o = o.copy(encodingWorkerNum = 16)
    if (o.flushWorkerNum == 0) o = o.copy(flushWorkerNum = 8)
    val scheme = o.storage.split("://")(0)
    if (!consistentStorages(scheme) &&
        !scheme.startsWith("blackhole"))
      return Left(ErrConsistentStorage -> scheme)
    Right(o)
  }

  final case class DispatchRule(matcher: String, dispatcherRule: String = "",
                                partitionRule: String = "")

  final case class ReplicaConfig(
      memoryQuota: Long = 0,
      protocol: String = "", // file block value; "" = unset
      txnAtomicity: String = "", // "" = unset
      terminator: Option[String] = None,
      encoderConcurrency: Int = 16,
      deleteOnlyOutputHandleKeyColumns: Boolean = false,
      dateSeparator: String = "",
      csv: CsvConfig = CsvConfig(),
      outputOldValue: Boolean = false,
      outputRawChangeEvent: Boolean = false,
      advanceTimeoutSec: Long = 0,
      consistent: ConsistentConfig = ConsistentConfig(),
      enableSyncPoint: Boolean = false,
      syncPointIntervalSec: Option[Long] = None,
      syncPointRetentionSec: Option[Long] = None,
      integrityCheckLevel: String = "none",
      columnSelectors: Seq[String] = Nil,
      errorStuckDurationSec: Option[Long] = None,
      dispatchRules: Seq[DispatchRule] = Nil)

  final case class Validated(config: ReplicaConfig, warnings: Seq[String])

  val ErrAPIInvalidParam = "ErrAPIInvalidParam"
  val ErrStartTsBeforeGC = "ErrStartTsBeforeGC"
  val ErrTargetTsBeforeStartTs = "ErrTargetTsBeforeStartTs"
  val ErrIncompatibleSinkConfig = "ErrIncompatibleSinkConfig"
  val ErrChangefeedUpdateRefused = "ErrChangefeedUpdateRefused"

  /**
   * `SinkConfig.CheckCompatibilityWithSinkURI` (sink.go:941-971), the
   * update-path asymmetry to create: at CREATE a config/URI conflict only
   * warns (the URI wins); at UPDATE, changing the config BLOCK into
   * conflict with an unchanged URI is refused — but if the URI itself is
   * what changed, the URI wins again and the conflict is ignored.
   */
  def checkCompatibilityWithSinkUri(
      newProtocol: String, newAtomicity: String,
      oldProtocol: String, oldAtomicity: String,
      uriParams: Map[String, String]): Either[(String, String), Unit] = {
    def conflicts(cfgP: String, cfgA: String): Boolean = {
      val uriP = uriParams.getOrElse("protocol", "")
      val uriA = uriParams.getOrElse("transaction-atomicity", "")
      (uriP.nonEmpty && cfgP.nonEmpty && uriP != cfgP) ||
        (uriA.nonEmpty && cfgA.nonEmpty && uriA != cfgA)
    }
    val cfgParamsChanged =
      newProtocol != oldProtocol || newAtomicity != oldAtomicity
    val uriParamsChanged = conflicts(oldProtocol, oldAtomicity)
    if (!uriParamsChanged && !cfgParamsChanged) Right(())
    else {
      val newConflict = conflicts(newProtocol, newAtomicity)
      if (uriParamsChanged && newConflict) Right(()) // URI made the change
      else if (newConflict)
        Left(ErrIncompatibleSinkConfig ->
          "new sink config conflicts with the sink uri parameters")
      else Right(())
    }
  }

  /**
   * Create-time ts verification (api_helpers.go:185-210 composed with
   * gc_service.go:39-60): start-ts 0 adopts the current TSO, a start-ts
   * ahead of the TSO is an API error, a start-ts at or below the GC
   * safepoint loses the snapshot (the +1 is issue #6350 — a changefeed
   * created exactly AT the safepoint appears to succeed, then dies with
   * ErrSnapshotLostByGC on first read), and target-ts, when set, must
   * sit strictly after the effective start. Returns the effective
   * start-ts.
   */
  def verifyTs(startTs: Long, targetTs: Long, currentTso: Long,
               gcSafepoint: Long): Either[(String, String), Long] = {
    if (startTs > currentTso)
      return Left(ErrAPIInvalidParam ->
        s"invalid start-ts $startTs, larger than current tso $currentTso")
    val st = if (startTs == 0) currentTso else startTs
    if (st > 0 && st < gcSafepoint + 1)
      return Left(ErrStartTsBeforeGC ->
        ("fail to create or maintain changefeed because start-ts " +
          s"$st is earlier than or equal to GC safepoint at $gcSafepoint"))
    if (targetTs > 0 && targetTs <= st)
      return Left(ErrTargetTsBeforeStartTs ->
        s"target-ts $targetTs must be larger than start-ts $st")
    Right(st)
  }

  /** The full composition, replica_config.go:245-328 order. `uriParams`
    * carries the sink URI's query (protocol / transaction-atomicity). */
  def validateAndAdjust(scheme: String, uriParams: Map[String, String],
                        cfg: ReplicaConfig)
      : Either[(String, String), Validated] = {
    var c = cfg
    var warnings = Vector.empty[String]

    // --- applyParameterBySinkURI: URI wins, conflict only warns ---------
    uriParams.get("transaction-atomicity").filter(_.nonEmpty).foreach { v =>
      if (c.txnAtomicity.nonEmpty && c.txnAtomicity != v)
        warnings :+= "incompatible-sink-config"
      c = c.copy(txnAtomicity = v)
    }
    uriParams.get("protocol").filter(_.nonEmpty).foreach { v =>
      if (c.protocol.nonEmpty && c.protocol != v)
        warnings :+= "incompatible-sink-config"
      c = c.copy(protocol = v)
    }
    // --- TxnAtomicity.validate(scheme) ----------------------------------
    c.txnAtomicity match {
      case "" | "none" => ()
      case "table" =>
        if (isMqScheme(scheme))
          return Left(ErrSinkURIInvalid ->
            s"table level atomicity is not supported by $scheme scheme")
      case other =>
        return Left(ErrSinkURIInvalid ->
          s"$other level atomicity is not supported by $scheme scheme")
    }
    val mysqlCompatible = MySqlOptions.isMySqlCompatibleScheme(scheme)
    if (mysqlCompatible && c.protocol.nonEmpty)
      return Left(ErrSinkURIInvalid ->
        s"protocol ${c.protocol} is incompatible with $scheme scheme")
    var protocol = ""
    if (isMqScheme(scheme) || StorageOptions.isStorageScheme(scheme)) {
      parseProtocol(c.protocol) match {
        case Left(e) => return Left(e)
        case Right(p) => protocol = p
      }
      if (c.outputRawChangeEvent && !c.outputOldValue)
        warnings :+= "raw-change-event-without-old-value"
    }

    if (!mysqlCompatible) {
      // --- dispatch rules (validateAndAdjust:761-777) -------------------
      c = c.copy(dispatchRules = c.dispatchRules.map { r =>
        if (r.dispatcherRule.nonEmpty && r.partitionRule.nonEmpty)
          return Left(ErrSinkInvalidConfig ->
            s"dispatcher and partition cannot be configured both for rule:${r.matcher}")
        if (r.dispatcherRule.nonEmpty)
          r.copy(partitionRule = r.dispatcherRule, dispatcherRule = "")
        else r
      })
      if (c.encoderConcurrency < 0)
        return Left(ErrSinkInvalidConfig ->
          s"encoder-concurrency should greater than 0, but got ${c.encoderConcurrency}")
      if (c.terminator.isEmpty) c = c.copy(terminator = Some(CRLF))
      if (c.deleteOnlyOutputHandleKeyColumns && protocol == "csv")
        return Left(ErrSinkInvalidConfig ->
          "CSV protocol always output all columns for the delete event")
      if (StorageOptions.isStorageScheme(scheme)) {
        if (c.dateSeparator.nonEmpty &&
            !Set("none", "year", "month", "day")(c.dateSeparator))
          return Left(ErrSinkInvalidConfig ->
            s"invalid date separator: ${c.dateSeparator}")
        validateCsv(c.csv) match {
          case Left(e) => return Left(e)
          case Right(()) => ()
        }
      }
      if (c.advanceTimeoutSec == 0) {
        warnings :+= "advance-timeout-defaulted"
        c = c.copy(advanceTimeoutSec = DefaultAdvanceTimeoutSec)
      }
    }

    // --- consistent (redo) ----------------------------------------------
    validateConsistent(c.consistent) match {
      case Left(e) => return Left(e)
      case Right(cc) => c = c.copy(consistent = cc)
    }
    // --- sync point bounds ------------------------------------------------
    if (c.enableSyncPoint) {
      if (c.syncPointIntervalSec.exists(_ < MinSyncPointIntervalSec))
        return Left(ErrInvalidReplicaConfig ->
          "The SyncPointInterval must be larger than 30s")
      if (c.syncPointRetentionSec.exists(_ < MinSyncPointRetentionSec))
        return Left(ErrInvalidReplicaConfig ->
          "The SyncPointRetention must be larger than 1h0m0s")
    }
    // --- memory quota -----------------------------------------------------
    if (c.memoryQuota == 0) c = c.copy(memoryQuota = DefaultMemoryQuota)
    // --- integrity --------------------------------------------------------
    if (c.integrityCheckLevel == "correctness" &&
        !Set("kafka", "kafka+ssl")(scheme)) {
      warnings :+= "integrity-disabled-non-kafka"
      c = c.copy(integrityCheckLevel = "none")
    }
    if (c.integrityCheckLevel == "correctness" && c.columnSelectors.nonEmpty)
      return Left(ErrInvalidReplicaConfig ->
        "integrity check enabled and column selector set, not allowed")
    // --- error stuck duration ---------------------------------------------
    if (c.errorStuckDurationSec.exists(_ < MinErrorStuckDurationSec))
      return Left(ErrInvalidReplicaConfig ->
        "The ChangefeedErrorStuckDuration must be larger than 1800 Seconds")

    Right(Validated(c, warnings))
  }
}
