package graft.streaming

/**
 * DM task-config check (SURVEY.md §2.14 L2): `TaskConfig.adjust`
 * (dm/config/task.go:699-1046) — the rule set `dmctl check-task` /
 * `start-task` runs before a task is admitted, modeled pure like the
 * sink option surfaces:
 *
 *  - Task level: unique name required; task-mode ∈ {all, full,
 *    incremental, dump, load, load&sync}; meta-schema defaults
 *    `dm_meta`; shard-mode ∈ {"", pessimistic, optimistic} with
 *    `is-sharding` defaulting to pessimistic (back-compat, :712-716);
 *    strict-optimistic-shard-mode requires optimistic (:718-720);
 *    column-mappings are a hard deprecation error (:722-724);
 *    collation_compatible ∈ {"", loose, strict} defaults loose;
 *    online-ddl-scheme pt/gh-ost flips online-ddl on with a deprecation
 *    warn (:737-742); target-db and ≥1 mysql instance required.
 *  - Expression filters (:752-790): schema and table names required;
 *    at most ONE of {insert, update(old/new together), delete}
 *    configured per filter — DM cannot tell which event kind a filter
 *    is meant for otherwise.
 *  - Per instance (:799-975 + MySQLInstance.VerifyAndAdjust:174-210):
 *    source-id required and unique across instances; `*-config-name`
 *    and an inline block together conflict (mydumper/loader/syncer);
 *    every referenced name (route/filter/expr-filter/block-allow-list/
 *    mydumper/loader/syncer/validator) must exist in the global maps;
 *    incremental mode verifies a present meta carries a binlog position
 *    OR a GTID set, a missing meta only warns (start_time path);
 *    full/all/dump/load modes warn that meta is ignored; syncer
 *    defaults fill (queue-size 1024, checkpoint-flush-interval 30 s,
 *    safe-mode-duration `2×interval s`), the duration must parse and a
 *    zero duration conflicts with safe-mode=true (:930-941);
 *    import-into load mode rejects multi-source tasks (:897-903); dump
 *    modes (all/full/dump) need a non-empty mydumper path (:869-873 —
 *    the default config carries `./bin/mydumper`, so only an inline
 *    block that BLANKS it trips this); duplicate names within an
 *    instance's rule lists are an error (:977-982).
 *  - Globals declared but referenced by no instance are an error
 *    (ErrConfigGlobalConfigsUnused, :984-1030, sorted, rendered
 *    `[a b c]` like Go's %v of a slice); every global LOADER block is
 *    adjusted in that same sweep (:1001-1010), so a bad load-mode enum
 *    in an unused loader errors before the unused error fires.
 *  - BW→BA fallback: `black-white-list` only applies when
 *    `block-allow-list` is absent, at both task and instance level.
 *  - timezone, when set, must load (:1036-1040).
 *
 * Round 19 adds the remaining pure members of the same file:
 *  - `LoaderConfig.adjust` (task.go:336-396): import-mode folds
 *    sql/loader→logical case-insensitively then lowercases and gates on
 *    the five-mode enum; pool-size default 16; the three
 *    duplicate-resolution / post-op enums each lowercase + gate with
 *    their own terror (on-duplicate-logical → replace, on-duplicate-
 *    physical → none, checksum-physical → required, analyze → optional).
 *  - `ValidatorConfig.Adjust` (task.go:486-523): mode ∈ {none, fast,
 *    full} (empty → none), zero-value fills (worker-count 4, validate/
 *    check intervals 10 s/5 s, row-error-delay 30 m, meta-flush 5 m,
 *    batch-query-size 100, max-pending-row-size "500m", max-pending-row
 *    count MaxInt32), and max-pending-row-size must parse as a
 *    go-units RAMInBytes quantity.
 *  - FK-checks session gates (task.go:425-447): `foreign_key_checks`
 *    looked up case-insensitively, value trimmed of space/quote chars
 *    and tested with TiDB's TiDBOptOn (EqualFold "ON" or literal "1");
 *    when on, syncer `compact` and `multiple-rows` are each rejected
 *    (they change DML statement boundaries). Consumed by the SUBTASK
 *    adjust ([[SubTaskValidate]]), defined here like the reference.
 *  - `ValidateCheckingItem` (checking_item.go:103-115): the
 *    ignore-checking-items tokens — AllCheckingItems ∪
 *    AdditionalCheckingItems.
 */
object DmTaskConfig {

  val DefaultMetaSchema = "dm_meta"
  val DefaultQueueSize = 1024
  val DefaultCheckpointFlushInterval = 30
  val TaskModes = Set("all", "full", "incremental", "dump", "load", "load&sync")
  def hasDump(mode: String): Boolean = Set("all", "full", "dump")(mode)
  /** helper.go:27-34. */
  def hasLoad(mode: String): Boolean = Set("all", "full", "load", "load&sync")(mode)

  // LoaderConfig enums (task.go:242-289).
  val LoadModes = Set("sql", "loader", "logical", "physical", "import-into")
  val LogicalDupResolves = Set("replace", "error", "ignore")
  val PhysicalDupResolves = Set("none", "manual")
  val PostOpLevels = Set("required", "optional", "off")
  val DefaultPoolSize = 16

  // ValidatorConfig defaults (task.go:67-84) — durations in seconds.
  val DefaultValidatorWorkerCount = 4
  val DefaultValidatorValidateIntervalSec = 10L
  val DefaultValidatorCheckIntervalSec = 5L
  val DefaultValidatorRowErrorDelaySec = 30L * 60
  val DefaultValidatorMetaFlushIntervalSec = 5L * 60
  val DefaultValidatorBatchQuerySize = 100
  val DefaultValidatorMaxPendingRowSize = "500m"
  val DefaultValidatorMaxPendingRow = Int.MaxValue

  // checking_item.go:23-98 — AllCheckingItems ∪ AdditionalCheckingItems.
  val AllCheckingItems: Set[String] = Set(
    "all", "dump_privilege", "replication_privilege", "version",
    "server_id", "binlog_enable", "binlog_format", "binlog_row_image",
    "table_schema", "schema_of_shard_tables", "auto_increment_ID",
    "online_ddl", "binlog_db", "meta_position", "conn_number",
    "target_privilege", "empty_region", "region_distribution",
    "downstream_version", "free_space", "downstream_mutex_features",
    "downstream_table_empty")
  val AdditionalCheckingItems: Set[String] = Set("primary_key")

  /** checking_item.go:103-115. */
  def validateCheckingItem(item: String): Either[(String, String), Unit] =
    if (AllCheckingItems(item) || AdditionalCheckingItems(item)) Right(())
    else Left(ErrCheckItemNotSupport -> item)

  /**
   * go-units RAMInBytes (vendored by task.go:515 for
   * max-pending-row-size): optional decimal number, optional space,
   * optional size suffix k/m/g/t/p (any case, optionally followed by
   * `i` and/or `b`), all BINARY (1024-base) multipliers.
   */
  def ramInBytes(s: String): Either[String, Long] = {
    val m = """^(\d+(?:\.\d+)?) ?([kKmMgGtTpP])?[iI]?[bB]?$""".r
    s match {
      case m(num, suffix) =>
        val mult = Option(suffix).map(_.toLowerCase) match {
          case None => 1L
          case Some("k") => 1L << 10
          case Some("m") => 1L << 20
          case Some("g") => 1L << 30
          case Some("t") => 1L << 40
          case Some("p") => 1L << 50
          case _ => return Left(s"invalid suffix: '$suffix'")
        }
        Right((num.toDouble * mult).toLong)
      case _ => Left(s"invalid size: '$s'")
    }
  }

  /** dm/pkg/utils/file.go:77-89 ParseFileSize: a bare integer is MiB,
    * anything else must parse as RAMInBytes. Returns bytes. */
  def parseFileSize(s: String, default: Long): Either[String, Long] =
    if (s.isEmpty) Right(default)
    else s.toLongOption match {
      case Some(mib) => Right(mib * (1L << 20))
      case None => ramInBytes(s)
    }

  /** TiDB variable.TiDBOptOn: EqualFold "ON" or the literal "1". */
  def tidbOptOn(v: String): Boolean = v.equalsIgnoreCase("on") || v == "1"

  /**
   * utils.ParseTimeZone (dm/pkg/utils/time.go:37-74): SYSTEM/Local are
   * rejected; a named zone loads from tzdata; an explicit offset parses
   * as `[+-]HH:MM` with MySQL's bounds — [-12:59, +14:00] — and
   * normalizes to the `(+|-)HH:MM` render (dbutil.FormatTimeZoneOffset).
   * Note Go's time.LoadLocation does NOT accept offset strings, so the
   * offset branch is the ONLY path for `+`/`-` forms — java's ZoneId
   * would accept offsets up to ±18:00, hence the explicit split here.
   */
  def parseTimeZone(s: String): Either[(String, String), String] = {
    if (s == "SYSTEM" || s == "Local")
      return Left(ErrInvalidTimezone ->
        "'SYSTEM' or 'Local' time_zone is not supported")
    if (s.startsWith("+") || s.startsWith("-")) {
      // the reference parses the offset with types.ParseDuration (the
      // MySQL TIME grammar) before bound-checking: `+10` is ten SECONDS,
      // `+10:00` ten hours, `+10:00:30` carries seconds; the rendered
      // name keeps only hours:minutes (dbutil.FormatTimeZoneOffset)
      val body = s.substring(1)
      val totalSec: Option[Long] = body match {
        case b if b.matches("""\d{1,3}:\d{1,2}:\d{1,2}""") =>
          val Array(h, m, sec) = b.split(":").map(_.toLong)
          if (m < 60 && sec < 60) Some(h * 3600 + m * 60 + sec) else None
        case b if b.matches("""\d{1,3}:\d{1,2}""") =>
          val Array(h, m) = b.split(":").map(_.toLong)
          if (m < 60) Some(h * 3600 + m * 60) else None
        case b if b.matches("""\d{1,6}""") => Some(b.toLong) // seconds
        case _ => None
      }
      totalSec match {
        case Some(tot) =>
          val ok =
            if (s.startsWith("-")) tot <= (12 * 60 + 59) * 60
            else tot <= 14 * 3600
          if (ok) Right(f"${s.charAt(0)}${tot / 3600}%02d:${tot / 60 % 60}%02d")
          else Left(ErrInvalidTimezone -> s)
        case None => Left(ErrInvalidTimezone -> s)
      }
    } else {
      // named zones only on this branch (like Go's LoadLocation)
      try {
        if (!s.forall(c => c.isLetterOrDigit || c == '/' || c == '_' ||
            c == '-' || c == '+'))
          return Left(ErrInvalidTimezone -> s)
        java.time.ZoneId.of(s); Right(s)
      } catch {
        case _: java.time.DateTimeException =>
          Left(ErrInvalidTimezone -> s)
      }
    }
  }

  /**
   * utils.ParseStartTime (dm/pkg/utils/time.go:32,77-99): the anchored
   * pattern `\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(Z|[+-]\d{2}:?\d{2})?`
   * gates the format, then the value must be a real datetime. An
   * offset-carrying string is absolute; a naked one is interpreted in
   * the given zone (the reference uses time.Local — pinned to UTC here
   * for engine determinism, callers pass the task timezone when set).
   * Returns epoch seconds.
   */
  private val StartTimeRe =
    """^(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2}):(\d{2})(Z|[+-]\d{2}:?\d{2})?$""".r

  def parseStartTime(s: String, zone: String = "UTC"): Either[String, Long] =
    StartTimeRe.findFirstMatchIn(s) match {
      case None => Left(s"unsupported start-time format $s")
      case Some(m) =>
        try {
          val ldt = java.time.LocalDateTime.of(
            m.group(1).toInt, m.group(2).toInt, m.group(3).toInt,
            m.group(4).toInt, m.group(5).toInt, m.group(6).toInt)
          val z = Option(m.group(7)) match {
            case None => java.time.ZoneId.of(zone)
            case Some("Z") => java.time.ZoneOffset.UTC
            case Some(off) =>
              val norm = if (off.contains(":")) off
                else off.take(3) + ":" + off.drop(3)
              java.time.ZoneOffset.of(norm)
          }
          Right(ldt.atZone(z).toEpochSecond)
        } catch {
          case _: RuntimeException =>
            Left(s"unsupported start-time format $s")
        }
    }

  /** TaskCliArgs.Verify (dm/config/task_cli_args.go:47-68): start-time
    * must parse, and both duration knobs must be Go durations. The
    * reference annotates PLAIN errors (no terror class), so the Left
    * carries the offending field name only. */
  def verifyTaskCliArgs(startTime: String, safeModeDuration: String,
      waitTimeOnStop: String): Either[String, Unit] = {
    if (startTime.nonEmpty && parseStartTime(startTime).isLeft)
      return Left("start-time")
    for ((v, what) <- Seq(safeModeDuration -> "safe-mode-duration",
        waitTimeOnStop -> "wait-time-on-stop")
         if v.nonEmpty && KafkaOptions.parseGoDurationMs(v).isLeft)
      return Left(what)
    Right(())
  }

  /**
   * IsForeignKeyChecksEnabled (task.go:425-433): first session key
   * equal-folding `foreign_key_checks` decides (keys scanned in sorted
   * order — the reference iterates a Go map and returns on the first
   * hit, so with a single matching key, the only shape real configs
   * have, the two agree); the value is trimmed of space/quote chars.
   */
  def isForeignKeyChecksEnabled(session: Map[String, String]): Boolean =
    session.toSeq.sortBy(_._1)
      .find(_._1.equalsIgnoreCase("foreign_key_checks"))
      .exists { case (_, v) => tidbOptOn(v.replaceAll("""^[ '"]+|[ '"]+$""", "")) }

  /** CheckForeignKeyChecksSyncerOptions (task.go:436-447). */
  def checkForeignKeyChecks(session: Map[String, String],
      compact: Boolean, multipleRows: Boolean)
      : Either[(String, String), Unit] = {
    if (!isForeignKeyChecksEnabled(session)) Right(())
    else if (compact) Left(ErrUnsupportedFkOption -> "compact")
    else if (multipleRows) Left(ErrUnsupportedFkOption -> "multiple-rows")
    else Right(())
  }

  /** LoaderConfig's pure adjust surface (task.go:292-311 fields). */
  final case class LoaderCfg(
      poolSize: Int = 0, dir: String = "", sortingDirPhysical: String = "",
      importMode: String = "", onDuplicateLogical: String = "",
      onDuplicatePhysical: String = "", checksumPhysical: String = "",
      analyze: String = "")

  /** LoaderConfig.adjust (task.go:336-396). */
  def adjustLoader(l0: LoaderCfg): Either[(String, String), LoaderCfg] = {
    var l = l0
    if (l.importMode.isEmpty) l = l.copy(importMode = "logical")
    if (l.importMode.equalsIgnoreCase("sql") ||
        l.importMode.equalsIgnoreCase("loader"))
      l = l.copy(importMode = "logical")
    l = l.copy(importMode = l.importMode.toLowerCase)
    if (!LoadModes(l.importMode))
      return Left(ErrInvalidLoadMode -> l.importMode)
    if (l.poolSize == 0) l = l.copy(poolSize = DefaultPoolSize)
    if (l.onDuplicateLogical.isEmpty) l = l.copy(onDuplicateLogical = "replace")
    l = l.copy(onDuplicateLogical = l.onDuplicateLogical.toLowerCase)
    if (!LogicalDupResolves(l.onDuplicateLogical))
      return Left(ErrInvalidDupResolution -> l.onDuplicateLogical)
    if (l.onDuplicatePhysical.isEmpty) l = l.copy(onDuplicatePhysical = "none")
    l = l.copy(onDuplicatePhysical = l.onDuplicatePhysical.toLowerCase)
    if (!PhysicalDupResolves(l.onDuplicatePhysical))
      return Left(ErrInvalidPhysicalDupResolution -> l.onDuplicatePhysical)
    if (l.checksumPhysical.isEmpty) l = l.copy(checksumPhysical = "required")
    l = l.copy(checksumPhysical = l.checksumPhysical.toLowerCase)
    if (!PostOpLevels(l.checksumPhysical))
      return Left(ErrInvalidPhysicalChecksum -> l.checksumPhysical)
    if (l.analyze.isEmpty) l = l.copy(analyze = "optional")
    l = l.copy(analyze = l.analyze.toLowerCase)
    if (!PostOpLevels(l.analyze))
      return Left(ErrInvalidLoadAnalyze -> l.analyze)
    Right(l)
  }

  /** ValidatorConfig's pure adjust surface (task.go:473-484) —
    * durations carried in seconds. */
  final case class ValidatorCfg(
      mode: String = "", workerCount: Int = 0,
      validateIntervalSec: Long = 0, checkIntervalSec: Long = 0,
      rowErrorDelaySec: Long = 0, metaFlushIntervalSec: Long = 0,
      batchQuerySize: Int = 0, maxPendingRowSize: String = "",
      maxPendingRowCount: Int = 0)

  /** ValidatorConfig.Adjust (task.go:486-523). */
  def adjustValidator(v0: ValidatorCfg): Either[(String, String), ValidatorCfg] = {
    var v = v0
    if (v.mode.isEmpty) v = v.copy(mode = ValidatorLifecycle.ModeNone)
    if (v.mode != ValidatorLifecycle.ModeNone &&
        v.mode != ValidatorLifecycle.ModeFast &&
        v.mode != ValidatorLifecycle.ModeFull)
      return Left(ErrValidationMode -> v.mode)
    if (v.workerCount <= 0) v = v.copy(workerCount = DefaultValidatorWorkerCount)
    if (v.validateIntervalSec == 0)
      v = v.copy(validateIntervalSec = DefaultValidatorValidateIntervalSec)
    if (v.checkIntervalSec == 0)
      v = v.copy(checkIntervalSec = DefaultValidatorCheckIntervalSec)
    if (v.rowErrorDelaySec == 0)
      v = v.copy(rowErrorDelaySec = DefaultValidatorRowErrorDelaySec)
    if (v.metaFlushIntervalSec == 0)
      v = v.copy(metaFlushIntervalSec = DefaultValidatorMetaFlushIntervalSec)
    if (v.batchQuerySize == 0)
      v = v.copy(batchQuerySize = DefaultValidatorBatchQuerySize)
    if (v.maxPendingRowSize.isEmpty)
      v = v.copy(maxPendingRowSize = DefaultValidatorMaxPendingRowSize)
    ramInBytes(v.maxPendingRowSize) match {
      case Left(e) => return Left(ErrRamBytesInvalid -> e)
      case Right(_) => ()
    }
    if (v.maxPendingRowCount == 0)
      v = v.copy(maxPendingRowCount = DefaultValidatorMaxPendingRow)
    Right(v)
  }

  final case class Meta(binlogName: String = "", binlogGtid: String = "")

  final case class ExprFilterCfg(schema: String, table: String,
      insertExpr: String = "", updateOldExpr: String = "",
      updateNewExpr: String = "", deleteExpr: String = "")

  final case class Instance(
      sourceId: String,
      meta: Option[Meta] = None,
      routeRules: Seq[String] = Nil,
      filterRules: Seq[String] = Nil,
      exprFilters: Seq[String] = Nil,
      baListName: String = "", bwListName: String = "",
      mydumperConfigName: String = "", inlineMydumper: Boolean = false,
      inlineMydumperPathBlank: Boolean = false,
      loaderConfigName: String = "", inlineLoader: Boolean = false,
      syncerConfigName: String = "", inlineSyncer: Boolean = false,
      validatorConfigName: String = "",
      importMode: String = "",
      syncerQueueSize: Int = 0,
      syncerCheckpointFlushInterval: Int = 0,
      syncerSafeMode: Boolean = false,
      syncerSafeModeDuration: String = "")

  final case class TaskConfig(
      name: String,
      taskMode: String,
      metaSchema: String = "",
      shardMode: String = "", isSharding: Boolean = false,
      strictOptimistic: Boolean = false,
      hasColumnMappings: Boolean = false,
      collationCompatible: String = "",
      onlineDdlScheme: String = "", onlineDdl: Boolean = false,
      hasTargetDb: Boolean = true,
      timezone: String = "",
      routes: Set[String] = Set.empty,
      filters: Set[String] = Set.empty,
      baLists: Set[String] = Set.empty, bwLists: Set[String] = Set.empty,
      mydumpers: Set[String] = Set.empty,
      loaders: Map[String, LoaderCfg] = Map.empty,
      syncers: Set[String] = Set.empty,
      validators: Map[String, ValidatorCfg] = Map.empty,
      exprFilter: Map[String, ExprFilterCfg] = Map.empty,
      ignoreCheckingItems: Seq[String] = Nil,
      instances: Seq[Instance] = Nil)

  final case class Adjusted(config: TaskConfig, warnings: Seq[String])

  // terror codes, named after the reference's.
  val ErrNeedUniqueTaskName = "ErrConfigNeedUniqueTaskName"
  val ErrInvalidTaskMode = "ErrConfigInvalidTaskMode"
  val ErrShardModeNotSupport = "ErrConfigShardModeNotSupport"
  val ErrStrictOptimistic = "ErrConfigStrictOptimisticShardMode"
  val ErrColumnMappingDeprecated = "ErrConfigColumnMappingDeprecated"
  val ErrCollationNotSupport = "ErrConfigCollationCompatibleNotSupport"
  val ErrOnlineSchemeNotSupport = "ErrConfigOnlineSchemeNotSupport"
  val ErrNeedTargetDB = "ErrConfigNeedTargetDB"
  val ErrInstsAtLeastOne = "ErrConfigMySQLInstsAtLeastOne"
  val ErrExprFilterEmptyName = "ErrConfigExprFilterEmptyName"
  val ErrExprFilterManyExpr = "ErrConfigExprFilterManyExpr"
  val ErrEmptySourceID = "ErrConfigEmptySourceID"
  val ErrSameSourceID = "ErrConfigMySQLInstSameSourceID"
  val ErrMetaInvalid = "ErrConfigMetaInvalid"
  val ErrMydumperCfgConflict = "ErrConfigMydumperCfgConflict"
  val ErrLoaderCfgConflict = "ErrConfigLoaderCfgConflict"
  val ErrSyncerCfgConflict = "ErrConfigSyncerCfgConflict"
  val ErrRouteRuleNotFound = "ErrConfigRouteRuleNotFound"
  val ErrFilterRuleNotFound = "ErrConfigFilterRuleNotFound"
  val ErrBAListNotFound = "ErrConfigBAListNotFound"
  val ErrMydumperCfgNotFound = "ErrConfigMydumperCfgNotFound"
  val ErrLoaderCfgNotFound = "ErrConfigLoaderCfgNotFound"
  val ErrSyncerCfgNotFound = "ErrConfigSyncerCfgNotFound"
  val ErrValidatorCfgNotFound = "ErrContinuousValidatorCfgNotFound"
  val ErrExprFilterNotFound = "ErrConfigExprFilterNotFound"
  val ErrMydumperPathNotValid = "ErrConfigMydumperPathNotValid"
  val ErrImportIntoSharding = "ErrConfigImportIntoShardingNotSupport"
  val ErrInvalidSafeModeDuration = "ErrConfigInvalidSafeModeDuration"
  val ErrConflictSafeModeDuration = "ErrConfigConfictSafeModeDurationAndSafeMode"
  val ErrDuplicateCfgItem = "ErrConfigDuplicateCfgItem"
  val ErrGlobalConfigsUnused = "ErrConfigGlobalConfigsUnused"
  val ErrInvalidTimezone = "ErrConfigInvalidTimezone"
  val ErrInvalidLoadMode = "ErrConfigInvalidLoadMode"
  val ErrInvalidDupResolution = "ErrConfigInvalidDuplicateResolution"
  val ErrInvalidPhysicalDupResolution = "ErrConfigInvalidPhysicalDuplicateResolution"
  val ErrInvalidPhysicalChecksum = "ErrConfigInvalidPhysicalChecksum"
  val ErrInvalidLoadAnalyze = "ErrConfigInvalidLoadAnalyze"
  val ErrValidationMode = "ErrConfigValidationMode"
  val ErrCheckItemNotSupport = "ErrConfigCheckItemNotSupport"
  val ErrUnsupportedFkOption = "ErrConfigUnsupportedForeignKeyChecksOption"
  // ValidatorConfig.Adjust returns units.RAMInBytes' raw error, not a
  // terror (task.go:515-518) — modeled as its own class here.
  val ErrRamBytesInvalid = "ErrRamBytesInvalid"

  /** `TaskConfig.adjust` as a pure fold; Left = (errClass, message). */
  def adjust(c0: TaskConfig): Either[(String, String), Adjusted] = {
    var c = c0
    var warnings = Vector.empty[String]

    if (c.name.isEmpty) return Left(ErrNeedUniqueTaskName -> "task name required")
    if (!TaskModes(c.taskMode))
      return Left(ErrInvalidTaskMode -> s"invalid task mode: ${c.taskMode}")
    if (c.metaSchema.isEmpty) c = c.copy(metaSchema = DefaultMetaSchema)

    c.shardMode match {
      case "" => if (c.isSharding) c = c.copy(shardMode = "pessimistic")
      case "pessimistic" | "optimistic" => ()
      case other => return Left(ErrShardModeNotSupport -> other)
    }
    if (c.strictOptimistic && c.shardMode != "optimistic")
      return Left(ErrStrictOptimistic ->
        "strict-optimistic-shard-mode only works with optimistic shard mode")
    if (c.hasColumnMappings)
      return Left(ErrColumnMappingDeprecated -> "column-mapping is deprecated")
    c.collationCompatible match {
      case "" => c = c.copy(collationCompatible = "loose")
      case "loose" | "strict" => ()
      case other => return Left(ErrCollationNotSupport -> other)
    }
    for (item <- c.ignoreCheckingItems)
      validateCheckingItem(item) match {
        case Left(e) => return Left(e)
        case Right(()) => ()
      }
    c.onlineDdlScheme match {
      case "" => ()
      case "pt" | "gh-ost" =>
        c = c.copy(onlineDdl = true)
        warnings :+= "online-ddl-scheme-deprecated"
      case other => return Left(ErrOnlineSchemeNotSupport -> other)
    }
    if (!c.hasTargetDb) return Left(ErrNeedTargetDB -> "target database required")
    if (c.instances.isEmpty)
      return Left(ErrInstsAtLeastOne -> "mysql-instances at least one")

    for ((name, f) <- c.exprFilter.toSeq.sortBy(_._1)) {
      if (f.schema.isEmpty)
        return Left(ErrExprFilterEmptyName -> s"$name: schema")
      if (f.table.isEmpty)
        return Left(ErrExprFilterEmptyName -> s"$name: table")
      val set = Seq(
        f.insertExpr.nonEmpty,
        f.updateOldExpr.nonEmpty || f.updateNewExpr.nonEmpty,
        f.deleteExpr.nonEmpty).count(identity)
      if (set > 1)
        return Left(ErrExprFilterManyExpr -> s"$name sets $set event kinds")
    }

    // every validator block adjusts before the instance loop (:790-794);
    // name-sorted where Go iterates the map in random order
    var validators = Map.empty[String, ValidatorCfg]
    for ((name, v) <- c.validators.toSeq.sortBy(_._1))
      adjustValidator(v) match {
        case Left(e) => return Left(e)
        case Right(adj) => validators += name -> adj
      }
    c = c.copy(validators = validators)

    // task-level BW→BA fallback
    val baLists = if (c.baLists.isEmpty && c.bwLists.nonEmpty) c.bwLists
                  else c.baLists

    val seenSource = collection.mutable.Map.empty[String, Int]
    val referred = collection.mutable.Set.empty[(String, String)]
    val duplicates = collection.mutable.ArrayBuffer.empty[String]
    var insts = Vector.empty[Instance]

    for ((i0, idx) <- c.instances.zipWithIndex) {
      var inst = i0
      if (inst.sourceId.isEmpty)
        return Left(ErrEmptySourceID -> s"mysql-instance $idx")
      // VerifyAndAdjust: Meta.Verify runs for EVERY instance with a meta
      inst.meta.foreach { m =>
        if (m.binlogName.isEmpty && m.binlogGtid.isEmpty)
          return Left(ErrMetaInvalid ->
            s"source ${inst.sourceId}: binlog-name or binlog-gtid required")
      }
      if (inst.mydumperConfigName.nonEmpty && inst.inlineMydumper)
        return Left(ErrMydumperCfgConflict ->
          "mydumper-config-name and mydumper configured together")
      if (inst.loaderConfigName.nonEmpty && inst.inlineLoader)
        return Left(ErrLoaderCfgConflict ->
          "loader-config-name and loader configured together")
      if (inst.syncerConfigName.nonEmpty && inst.inlineSyncer)
        return Left(ErrSyncerCfgConflict ->
          "syncer-config-name and syncer configured together")
      // instance-level BW→BA fallback
      if (inst.baListName.isEmpty && inst.bwListName.nonEmpty)
        inst = inst.copy(baListName = inst.bwListName)

      seenSource.get(inst.sourceId).foreach { prev =>
        return Left(ErrSameSourceID ->
          s"instance $prev and $idx share source-id ${inst.sourceId}")
      }
      seenSource(inst.sourceId) = idx

      c.taskMode match {
        case "incremental" =>
          if (inst.meta.isEmpty) warnings :+= s"no-meta-incremental-$idx"
        case "full" | "all" | "dump" | "load" =>
          if (inst.meta.nonEmpty) warnings :+= s"meta-unused-$idx"
        case _ => ()
      }

      for (n <- inst.routeRules) {
        if (!c.routes(n)) return Left(ErrRouteRuleNotFound -> s"$idx: $n")
        referred += (("route", n))
      }
      for (n <- inst.filterRules) {
        if (!c.filters(n)) return Left(ErrFilterRuleNotFound -> s"$idx: $n")
        referred += (("filter", n))
      }
      if (inst.baListName.nonEmpty && !baLists(inst.baListName))
        return Left(ErrBAListNotFound -> s"$idx: ${inst.baListName}")
      if (inst.mydumperConfigName.nonEmpty) {
        if (!c.mydumpers(inst.mydumperConfigName))
          return Left(ErrMydumperCfgNotFound -> s"$idx: ${inst.mydumperConfigName}")
        referred += (("mydumper", inst.mydumperConfigName))
      }
      // dump modes need a non-empty mydumper path; only an inline block
      // that blanks it trips this (name-ref and default both carry one)
      if (hasDump(c.taskMode) && inst.inlineMydumper &&
          inst.inlineMydumperPathBlank)
        return Left(ErrMydumperPathNotValid -> s"mysql-instance $idx")
      if (inst.loaderConfigName.nonEmpty) {
        if (!c.loaders.contains(inst.loaderConfigName))
          return Left(ErrLoaderCfgNotFound -> s"$idx: ${inst.loaderConfigName}")
        referred += (("loader", inst.loaderConfigName))
      }
      // the instance's loader is the name-ref COPY (made before the
      // global blocks adjust, task.go:875-895), an inline block, or the
      // default — so the import-into gate reads the RAW mode, EqualFold
      val effectiveImportMode =
        if (inst.loaderConfigName.nonEmpty)
          c.loaders(inst.loaderConfigName).importMode
        else inst.importMode
      if (c.instances.length > 1 &&
          effectiveImportMode.equalsIgnoreCase("import-into"))
        return Left(ErrImportIntoSharding ->
          "import-into does not support multi-source tasks")
      if (inst.syncerConfigName.nonEmpty) {
        if (!c.syncers(inst.syncerConfigName))
          return Left(ErrSyncerCfgNotFound -> s"$idx: ${inst.syncerConfigName}")
        referred += (("syncer", inst.syncerConfigName))
      }
      // syncer default fills + the safe-mode duration rules
      if (inst.syncerQueueSize == 0)
        inst = inst.copy(syncerQueueSize = DefaultQueueSize)
      if (inst.syncerCheckpointFlushInterval == 0)
        inst = inst.copy(
          syncerCheckpointFlushInterval = DefaultCheckpointFlushInterval)
      if (inst.syncerSafeModeDuration.isEmpty)
        inst = inst.copy(syncerSafeModeDuration =
          s"${2 * inst.syncerCheckpointFlushInterval}s")
      KafkaOptions.parseGoDurationMs(inst.syncerSafeModeDuration) match {
        case Left(e) => return Left(ErrInvalidSafeModeDuration -> e)
        case Right(ms) =>
          if (inst.syncerSafeMode && ms == 0)
            return Left(ErrConflictSafeModeDuration ->
              "safe-mode is true but safe-mode-duration is 0")
      }
      if (inst.validatorConfigName.nonEmpty) {
        if (!c.validators.contains(inst.validatorConfigName))
          return Left(ErrValidatorCfgNotFound -> s"$idx: ${inst.validatorConfigName}")
        referred += (("validator", inst.validatorConfigName))
      }
      for (n <- inst.exprFilters) {
        if (!c.exprFilter.contains(n))
          return Left(ErrExprFilterNotFound -> s"$idx: $n")
        referred += (("expr", n))
      }
      for ((kind, list) <- Seq("route-rules" -> inst.routeRules,
          "filter-rules" -> inst.filterRules,
          "expression-filters" -> inst.exprFilters)) {
        val dupes = list.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
        if (dupes.nonEmpty)
          duplicates += s"mysql-instance($idx)'s $kind: ${dupes.mkString(", ")}"
      }
      insts :+= inst
    }

    if (duplicates.nonEmpty)
      return Left(ErrDuplicateCfgItem -> duplicates.mkString("\n"))

    // every global loader block adjusts inside the unused sweep
    // (task.go:1001-1010), so a bad enum errors before the unused error
    var loaders = Map.empty[String, LoaderCfg]
    for ((name, l) <- c.loaders.toSeq.sortBy(_._1))
      adjustLoader(l) match {
        case Left(e) => return Left(e)
        case Right(adj) => loaders += name -> adj
      }
    c = c.copy(loaders = loaders)

    val unused =
      (c.routes.filterNot(n => referred(("route", n))) ++
        c.filters.filterNot(n => referred(("filter", n))) ++
        c.mydumpers.filterNot(n => referred(("mydumper", n))) ++
        c.loaders.keySet.filterNot(n => referred(("loader", n))) ++
        c.syncers.filterNot(n => referred(("syncer", n))) ++
        c.exprFilter.keySet.filterNot(n => referred(("expr", n))) ++
        c.validators.keySet.filterNot(n => referred(("validator", n)))).toSeq.sorted
    if (unused.nonEmpty) // rendered like Go's %v of the sorted slice
      return Left(ErrGlobalConfigsUnused -> unused.mkString("[", " ", "]"))

    if (c.timezone.nonEmpty)
      parseTimeZone(c.timezone) match {
        case Left(e) => return Left(e)
        case Right(_) => ()
      }

    Right(Adjusted(c.copy(baLists = baLists, instances = insts), warnings))
  }

  /** An instance's effective continuous-validator config
    * (task.go:940-950): defaultValidatorConfig() — mode `none`, NO
    * fills — unless validator-config-name refers to a global block
    * (which adjust() has already filled). */
  def effectiveValidator(c: TaskConfig, inst: Instance): ValidatorCfg =
    if (inst.validatorConfigName.nonEmpty) c.validators(inst.validatorConfigName)
    else ValidatorCfg(mode = ValidatorLifecycle.ModeNone)
}
