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
 *    (ErrConfigGlobalConfigsUnused, :984-1030, sorted).
 *  - BW→BA fallback: `black-white-list` only applies when
 *    `block-allow-list` is absent, at both task and instance level.
 *  - timezone, when set, must load (:1036-1040).
 */
object DmTaskConfig {

  val DefaultMetaSchema = "dm_meta"
  val DefaultQueueSize = 1024
  val DefaultCheckpointFlushInterval = 30
  val TaskModes = Set("all", "full", "incremental", "dump", "load", "load&sync")
  def hasDump(mode: String): Boolean = Set("all", "full", "dump")(mode)

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
      loaders: Set[String] = Set.empty,
      syncers: Set[String] = Set.empty,
      validators: Set[String] = Set.empty,
      exprFilter: Map[String, ExprFilterCfg] = Map.empty,
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
        if (!c.loaders(inst.loaderConfigName))
          return Left(ErrLoaderCfgNotFound -> s"$idx: ${inst.loaderConfigName}")
        referred += (("loader", inst.loaderConfigName))
      }
      if (c.instances.length > 1 &&
          inst.importMode.equalsIgnoreCase("import-into"))
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
        if (!c.validators(inst.validatorConfigName))
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

    val unused =
      (c.routes.filterNot(n => referred(("route", n))) ++
        c.filters.filterNot(n => referred(("filter", n))) ++
        c.mydumpers.filterNot(n => referred(("mydumper", n))) ++
        c.loaders.filterNot(n => referred(("loader", n))) ++
        c.syncers.filterNot(n => referred(("syncer", n))) ++
        c.exprFilter.keySet.filterNot(n => referred(("expr", n))) ++
        c.validators.filterNot(n => referred(("validator", n)))).toSeq.sorted
    if (unused.nonEmpty)
      return Left(ErrGlobalConfigsUnused -> unused.mkString(", "))

    if (c.timezone.nonEmpty) {
      try { java.time.ZoneId.of(c.timezone); () }
      catch {
        case _: java.time.DateTimeException =>
          return Left(ErrInvalidTimezone -> c.timezone)
      }
    }

    Right(Adjusted(c.copy(baLists = baLists, instances = insts), warnings))
  }
}
