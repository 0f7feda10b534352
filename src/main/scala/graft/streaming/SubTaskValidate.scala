package graft.streaming

import graft.streaming.{DmTaskConfig => TC}

/**
 * DM subtask + source config validation (SURVEY.md §2.14 L2):
 *
 * `SubTaskConfig.Adjust` (dm/config/subtask.go:296-465) — the per-source
 * admission every generated subtask runs AFTER TaskConfig.adjust split a
 * task ([[DmTaskConfig]]), and the rule set OpenAPI-created tasks hit
 * directly. Modeled as a pure fold over the config's decision surface:
 *
 *  - name and source-id required; source-id ≤ 32 chars
 *    (checking_item.go:101 MaxSourceIDLength).
 *  - the same shard-mode / strict-optimistic gates as the task level.
 *  - import-into legs (:317-330): conflicts with ANY sharding flag;
 *    requires shared storage — a blank dir or a local-disk dir
 *    (scheme "" or `file`) is rejected.
 *  - column-mappings hard-deprecated; online-ddl-scheme pt/gh-ost flips
 *    online-ddl with a warn (same as task level).
 *  - shadow/trash online-DDL table rules (:272-293): empty lists take
 *    the defaults; user rules are anchored (`^`…`$`), must compile, and
 *    must contain EXACTLY one capture group
 *    (ErrConfigOnlineDDLInvalidRegex either way).
 *  - dump-dir adjust (:366-388): only when the mode has a load unit and
 *    is NOT standalone load / load&sync — an S3 dir with the legacy
 *    `loader` import mode is rejected; then the dir gains a unique
 *    suffix, `/<name>.<source>` for S3, `.<name>` for local, via
 *    AdjustPath semantics (dm/pkg/storage/utils.go:41-67: trailing
 *    separators trimmed, suffix appended only once).
 *  - sorting-dir fill (:391-401): local disk → `<dir>.sorting`, remote →
 *    `./sorting.<urlescape(name)>`.
 *  - syncer fills + safe-mode duration parse/conflict (same rules as the
 *    task level), THEN the foreign-key-checks session gate
 *    ([[DmTaskConfig.checkForeignKeyChecks]], :417-419).
 *  - BW→BA fallback; chunk-filesize must parse as a file size (bare
 *    int = MiB, else RAMInBytes; utils/file.go:77-89);
 *    [[DmTaskConfig.adjustLoader]] and [[DmTaskConfig.adjustValidator]]
 *    run last (:453-458).
 *  - rule-compilation legs (:436-451 filter.New / regexpr-router /
 *    column.NewMapping / bf.NewBinlogEvent) are delegation: the repo
 *    compiles those rule sets natively in operators/{Filters,Routing}
 *    and they are gated there (q10/q11/q20/q227).
 *
 * `SourceConfig` (dm/config/source_config.go) — the per-upstream config:
 *  - adjust() (:220-228): checker defaults fill
 *    (checker_config.go:72-78) and the deprecated auto-fix-gtid is
 *    forced off with a warn.
 *  - Verify() (:231-262): source-id required and ≤ 32; a set
 *    relay-binlog-name must be a valid binlog filename (`base.seq`,
 *    [[BinlogPos.parseFilename]]); a set relay-binlog-gtid must parse
 *    under the config's flavor ([[graft.operators.Gtid.parserDecision]]);
 *    checker backoff-max < backoff-min is rejected.
 *  - Adjust's offline legs (:285-322): flavor ∈ {mysql, mariadb}
 *    (ErrNotSupportedFlavor); relay-dir defaults to `relay-dir`; an
 *    absolute relay-dir only warns. (Flavor/server-id/GTID-mode
 *    discovery from a live upstream is wire delegation.)
 */
object SubTaskValidate {

  val MaxSourceIDLength = 32
  val DefaultShadowTableRules = "^_(.+)_(?:new|gho)$"
  val DefaultTrashTableRules = "^_(.+)_(?:ghc|del|old)$"
  val DefaultRelayDir = "relay-dir"

  // terror tokens, named after the reference's.
  val ErrTaskNameEmpty = "ErrConfigTaskNameEmpty"
  val ErrEmptySourceID = "ErrConfigEmptySourceID"
  val ErrTooLongSourceID = "ErrConfigTooLongSourceID"
  val ErrImportIntoSharedStorage = "ErrConfigImportIntoRequiresSharedStorage"
  val ErrOnlineDDLInvalidRegex = "ErrConfigOnlineDDLInvalidRegex"
  val ErrLoaderS3NotSupport = "ErrConfigLoaderS3NotSupport"
  val ErrLoaderDirInvalid = "ErrConfigLoaderDirInvalid"
  val ErrInvalidChunkFileSize = "ErrConfigInvalidChunkFileSize"
  val ErrWorkerNeedSourceID = "ErrWorkerNeedSourceID"
  val ErrWorkerTooLongSourceID = "ErrWorkerTooLongSourceID"
  val ErrWorkerRelayBinlogName = "ErrWorkerRelayBinlogName"
  val ErrRelayBinlogGtid = "ErrRelayBinlogGtidInvalid"
  val ErrCheckerMaxTooSmall = "ErrConfigCheckerMaxTooSmall"
  val ErrNotSupportedFlavor = "ErrNotSupportedFlavor"

  // ---- dm/pkg/storage/utils.go path algebra ------------------------------

  private val SchemeRe = """^([A-Za-z][A-Za-z0-9+.\-]*)://""".r

  /** The URL scheme, or "" for a plain filesystem path. */
  def pathScheme(raw: String): String =
    SchemeRe.findFirstMatchIn(raw).map(_.group(1)).getOrElse("")

  def isS3Path(raw: String): Boolean =
    raw.nonEmpty && pathScheme(raw) == "s3"

  def isLocalDiskPath(raw: String): Boolean =
    raw.nonEmpty && (pathScheme(raw) match {
      case "" | "file" => true
      case _ => false
    })

  /** Split a URL-form path into (prefix-through-authority, path, query):
    * `s3://bucket/a/b?x=1` → ("s3://bucket", "/a/b", "?x=1"). */
  private def splitUrl(raw: String): (String, String, String) = {
    val schemeEnd = raw.indexOf("://") + 3
    val afterAuth = raw.indexOf('/', schemeEnd)
    val qStart = raw.indexOf('?', schemeEnd)
    val pathStart = if (afterAuth < 0 || (qStart >= 0 && qStart < afterAuth))
      (if (qStart >= 0) qStart else raw.length) else afterAuth
    val queryStart = if (qStart >= 0) qStart else raw.length
    (raw.substring(0, pathStart), raw.substring(pathStart, queryStart),
      raw.substring(queryStart))
  }

  /** AdjustPath (storage/utils.go:41-67): trim trailing separators, then
    * append uniqueId once; URL forms operate on the path component. */
  def adjustPath(raw: String, uniqueId: String): String = {
    if (raw.isEmpty || uniqueId.isEmpty) return raw
    if (pathScheme(raw).isEmpty) {
      val trimmed = raw.replaceAll("/+$", "")
      if (!trimmed.endsWith(uniqueId)) trimmed + uniqueId else raw
    } else {
      val (head, path, query) = splitUrl(raw)
      val trimmed = path.replaceAll("/+$", "")
      if (!trimmed.endsWith(uniqueId)) head + trimmed + uniqueId + query
      else raw
    }
  }

  /** Go url.PathEscape: RFC 3986 path-segment escaping — unreserved
    * chars, sub-delims (`!$&'()*+,;=`) and `:@` pass through, space
    * becomes %20 (NOT java URLEncoder's `+`, and `+` itself is KEPT). */
  def pathEscape(s: String): String = {
    val keep = Set('!', '$', '&', '\'', '(', ')', '*', '+', ',', ';', '=',
      ':', '@', '-', '.', '_', '~')
    s.flatMap { c =>
      if (c.isLetterOrDigit && c < 128 || keep(c)) c.toString
      else c.toString.getBytes("UTF-8").map(b => f"%%${b & 0xff}%02X").mkString
    }
  }

  /** TrimPath (storage/utils.go:70-86): strip the uniqueId suffix. */
  def trimPath(raw: String, uniqueId: String): String = {
    if (raw.isEmpty || uniqueId.isEmpty) return raw
    if (pathScheme(raw).isEmpty) raw.stripSuffix(uniqueId)
    else {
      val (head, path, query) = splitUrl(raw)
      head + path.stripSuffix(uniqueId) + query
    }
  }

  /** adjustOnlineTableRules (subtask.go:272-293): anchor, compile,
    * require exactly one capture group. */
  def adjustOnlineTableRules(ruleType: String, rules: Seq[String])
      : Either[(String, String), Seq[String]] = {
    val out = Vector.newBuilder[String]
    for (r0 <- rules) {
      var r = r0
      if (!r.startsWith("^")) r = "^" + r
      if (!r.endsWith("$")) r = r + "$"
      val compiled =
        try Right(java.util.regex.Pattern.compile(r))
        catch {
          case e: java.util.regex.PatternSyntaxException =>
            Left(ErrOnlineDDLInvalidRegex ->
              s"$ruleType $r: fail to compile: ${e.getDescription}")
        }
      compiled match {
        case Left(e) => return Left(e)
        case Right(p) =>
          if (p.matcher("").groupCount != 1)
            return Left(ErrOnlineDDLInvalidRegex ->
              s"$ruleType $r: rule isn't contains exactly one submatch")
          out += r
      }
    }
    Right(out.result())
  }

  /** The pure decision surface of SubTaskConfig (subtask.go:83-196). */
  final case class SubTaskCfg(
      name: String = "", sourceId: String = "", mode: String = "",
      isSharding: Boolean = false, shardMode: String = "",
      strictOptimistic: Boolean = false,
      onlineDdl: Boolean = false, onlineDdlScheme: String = "",
      shadowTableRules: Seq[String] = Nil,
      trashTableRules: Seq[String] = Nil,
      hasColumnMappings: Boolean = false,
      metaSchema: String = "",
      loader: TC.LoaderCfg = TC.LoaderCfg(),
      chunkFilesize: String = "",
      syncerQueueSize: Int = 0, syncerCheckpointFlushInterval: Int = 0,
      syncerSafeMode: Boolean = false, syncerSafeModeDuration: String = "",
      syncerCompact: Boolean = false, syncerMultipleRows: Boolean = false,
      toSession: Map[String, String] = Map.empty,
      validator: TC.ValidatorCfg = TC.ValidatorCfg(),
      baListSet: Boolean = false, bwListSet: Boolean = false)

  final case class SubTaskAdjusted(cfg: SubTaskCfg, warnings: Seq[String],
      baFromBw: Boolean)

  /** SubTaskConfig.Adjust (subtask.go:296-465) as a pure fold. */
  def adjustSubTask(c0: SubTaskCfg): Either[(String, String), SubTaskAdjusted] = {
    var c = c0
    var warnings = Vector.empty[String]

    if (c.name.isEmpty) return Left(ErrTaskNameEmpty -> "task name required")
    if (c.sourceId.isEmpty)
      return Left(ErrEmptySourceID -> "source-id required")
    if (c.sourceId.length > MaxSourceIDLength)
      return Left(ErrTooLongSourceID -> c.sourceId)

    c.shardMode match {
      case "" => if (c.isSharding) c = c.copy(shardMode = "pessimistic")
      case "pessimistic" | "optimistic" => ()
      case other => return Left(TC.ErrShardModeNotSupport -> other)
    }
    if (c.strictOptimistic && c.shardMode != "optimistic")
      return Left(TC.ErrStrictOptimistic ->
        "strict-optimistic-shard-mode only works with optimistic shard mode")

    val isImportInto = c.loader.importMode.equalsIgnoreCase("import-into")
    if ((c.shardMode.nonEmpty || c.isSharding) && isImportInto)
      return Left(TC.ErrImportIntoSharding ->
        "import-into mode does not support sharding")
    if (isImportInto && c.loader.dir.trim.isEmpty)
      return Left(ErrImportIntoSharedStorage -> c.loader.dir)
    if (isImportInto && isLocalDiskPath(c.loader.dir))
      return Left(ErrImportIntoSharedStorage -> c.loader.dir)

    if (c.hasColumnMappings)
      return Left(TC.ErrColumnMappingDeprecated -> "column-mapping is deprecated")

    c.onlineDdlScheme match {
      case "" => ()
      case "pt" | "gh-ost" =>
        c = c.copy(onlineDdl = true)
        warnings :+= "online-ddl-scheme-deprecated"
      case other => return Left(TC.ErrOnlineSchemeNotSupport -> other)
    }
    if (c.shadowTableRules.isEmpty)
      c = c.copy(shadowTableRules = Seq(DefaultShadowTableRules))
    else adjustOnlineTableRules("shadow-table-rules", c.shadowTableRules) match {
      case Left(e) => return Left(e)
      case Right(rs) => c = c.copy(shadowTableRules = rs)
    }
    if (c.trashTableRules.isEmpty)
      c = c.copy(trashTableRules = Seq(DefaultTrashTableRules))
    else adjustOnlineTableRules("trash-table-rules", c.trashTableRules) match {
      case Left(e) => return Left(e)
      case Right(rs) => c = c.copy(trashTableRules = rs)
    }

    if (c.metaSchema.isEmpty) c = c.copy(metaSchema = TC.DefaultMetaSchema)

    // dump-dir suffix — NOT for standalone load / load&sync (:366-388)
    if (TC.hasLoad(c.mode) && c.mode != "load&sync" && c.mode != "load") {
      val isS3 = isS3Path(c.loader.dir)
      if (isS3 && c.loader.importMode == "loader")
        return Left(ErrLoaderS3NotSupport -> c.loader.dir)
      val dirSuffix =
        if (isS3) "/" + c.name + "." + c.sourceId
        else "." + c.name
      c = c.copy(loader =
        c.loader.copy(dir = adjustPath(c.loader.dir, dirSuffix)))
    }
    if (TC.hasLoad(c.mode) && c.loader.sortingDirPhysical.isEmpty) {
      val sorting =
        if (isLocalDiskPath(c.loader.dir)) c.loader.dir + ".sorting"
        else "./sorting." + pathEscape(c.name)
      c = c.copy(loader = c.loader.copy(sortingDirPhysical = sorting))
    }

    if (c.syncerQueueSize == 0)
      c = c.copy(syncerQueueSize = TC.DefaultQueueSize)
    if (c.syncerCheckpointFlushInterval == 0)
      c = c.copy(syncerCheckpointFlushInterval = TC.DefaultCheckpointFlushInterval)
    if (c.syncerSafeModeDuration.isEmpty)
      c = c.copy(syncerSafeModeDuration =
        s"${2 * c.syncerCheckpointFlushInterval}s")
    KafkaOptions.parseGoDurationMs(c.syncerSafeModeDuration) match {
      case Left(e) => return Left(TC.ErrInvalidSafeModeDuration -> e)
      case Right(ms) =>
        if (c.syncerSafeMode && ms == 0)
          return Left(TC.ErrConflictSafeModeDuration ->
            "safe-mode is true but safe-mode-duration is 0")
    }
    TC.checkForeignKeyChecks(c.toSession, c.syncerCompact,
        c.syncerMultipleRows) match {
      case Left(e) => return Left(e)
      case Right(()) => ()
    }

    // only when block-allow-list is nil use black-white-list (:432-434)
    val baFromBw = !c.baListSet && c.bwListSet
    if (baFromBw) c = c.copy(baListSet = true)

    TC.parseFileSize(c.chunkFilesize, 0) match {
      case Left(_) => return Left(ErrInvalidChunkFileSize -> c.chunkFilesize)
      case Right(_) => ()
    }

    TC.adjustLoader(c.loader) match {
      case Left(e) => return Left(e)
      case Right(l) => c = c.copy(loader = l)
    }
    TC.adjustValidator(c.validator) match {
      case Left(e) => return Left(e)
      case Right(v) => c = c.copy(validator = v)
    }

    Right(SubTaskAdjusted(c, warnings, baFromBw))
  }

  // ---- SourceConfig ------------------------------------------------------

  /** CheckerConfig (checker_config.go:59-78) — durations in seconds. */
  final case class CheckerCfg(
      checkEnable: Boolean = true,
      backoffRollbackSec: Long = 300, backoffMaxSec: Long = 300,
      checkIntervalSec: Long = 0, backoffMinSec: Long = 0,
      backoffJitter: Boolean = false, backoffFactor: Double = 0)

  /** CheckerConfig.Adjust: the unexposed knobs are FORCED to defaults. */
  def adjustChecker(c: CheckerCfg): CheckerCfg =
    c.copy(checkIntervalSec = 5, backoffMinSec = 1,
      backoffJitter = true, backoffFactor = 2.0)

  final case class SourceCfgModel(
      sourceId: String = "", flavor: String = "",
      enableGtid: Boolean = false, autoFixGtid: Boolean = false,
      relayDir: String = "", relayBinlogName: String = "",
      relayBinlogGtid: String = "",
      caseSensitive: Boolean = false,
      checker: CheckerCfg = CheckerCfg())

  final case class SourceAdjusted(cfg: SourceCfgModel, warnings: Seq[String])

  /** SourceConfig.adjust (source_config.go:220-228). */
  def adjustSource(c0: SourceCfgModel): SourceAdjusted = {
    var c = c0.copy(checker = adjustChecker(c0.checker))
    var warnings = Vector.empty[String]
    if (c.autoFixGtid) {
      c = c.copy(autoFixGtid = false)
      warnings :+= "auto-fix-gtid-deprecated"
    }
    SourceAdjusted(c, warnings)
  }

  /** SourceConfig.Verify (source_config.go:231-262). */
  def verifySource(c: SourceCfgModel): Either[(String, String), Unit] = {
    if (c.sourceId.isEmpty)
      return Left(ErrWorkerNeedSourceID -> "source-id required")
    if (c.sourceId.length > MaxSourceIDLength)
      return Left(ErrWorkerTooLongSourceID ->
        s"${c.sourceId} (max $MaxSourceIDLength)")
    if (c.relayBinlogName.nonEmpty &&
        BinlogPos.parseFilename(c.relayBinlogName).isLeft)
      return Left(ErrWorkerRelayBinlogName -> c.relayBinlogName)
    if (c.relayBinlogGtid.nonEmpty)
      graft.operators.Gtid.parserDecision(c.flavor, c.relayBinlogGtid) match {
        case Left(e) => return Left(ErrRelayBinlogGtid -> e)
        case Right(_) => ()
      }
    if (c.checker.backoffMaxSec < c.checker.backoffMinSec)
      return Left(ErrCheckerMaxTooSmall ->
        s"${c.checker.backoffMaxSec} < ${c.checker.backoffMinSec}")
    Right(())
  }

  /** The offline legs of SourceConfig.Adjust (source_config.go:285-322 +
    * AdjustFlavor:336-351): flavor enum and relay-dir default; the
    * DB-backed discovery legs are wire delegation. */
  def adjustSourceOffline(c0: SourceCfgModel)
      : Either[(String, String), SourceAdjusted] = {
    val SourceAdjusted(c1, warnings0) = adjustSource(c0)
    var c = c1
    var warnings = warnings0
    c.flavor match {
      case "" | "mysql" | "mariadb" => ()
      case other => return Left(ErrNotSupportedFlavor -> other)
    }
    if (c.relayDir.isEmpty) c = c.copy(relayDir = DefaultRelayDir)
    if (c.relayDir.startsWith("/"))
      warnings :+= "absolute-relay-dir"
    Right(SourceAdjusted(c, warnings))
  }
}
