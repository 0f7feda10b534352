package graft.streaming

import graft.streaming.{DmTaskConfig => TC}
import graft.streaming.{SubTaskValidate => STV}

/**
 * OpenAPI task converters (SURVEY.md §2.14 L2):
 * `dm/config/task_converters.go:1-814` — the mapping semantics between
 * the three task representations (openapi.Task, TaskConfig,
 * SubTaskConfig) that every OpenAPI `create-task`/`get-task` runs:
 *
 *  - OpenAPITaskToSubTaskConfigs (:118-345): the import-into
 *    multi-source precheck fires BEFORE per-source work; each source
 *    must exist (ErrConfigSourceIDNotFound); a meta is created iff any
 *    of binlog-name/pos/gtid is present; `shard-mode` presence implies
 *    is-sharding; full-migrate conf fields overlay the DEFAULT
 *    mydumper/loader configs (consistency becomes mydumper
 *    `--consistency <v>` extra-args); a security block with any empty
 *    content is rejected (ErrOpenAPICommonError); incr-migrate conf
 *    overlays the default syncer; per-source table-migrate rules fan
 *    out into route rules (only when a target is set), stamped filter
 *    rules from the named templates (a missing name is
 *    ErrOpenAPICommonError), and a block-allow list (table set →
 *    do-tables else do-dbs, do-dbs deduplicated keeping first
 *    occurrence); every generated subtask must pass
 *    [[SubTaskValidate.adjustSubTask]].
 *  - SubTaskConfigsToTaskConfig (:371-498): rebuilds a TaskConfig by
 *    generating names for every distinct rule payload —
 *    `getGenerateName` (:1053-1065): equal payloads share a name,
 *    a new payload takes `<prefix>-%02d` with the next index. The
 *    loader dir is TRIMMED of its subtask suffix (`/<name>.<source>`
 *    for S3, `.<name>` otherwise) to recover the user's input; a nil
 *    block-allow list still generates (and shares) a name.
 *  - SubTaskConfigsToOpenAPITask (:515-712): sources with their metas;
 *    full/incr conf from the FIRST subtask (pd-addr only surfaces for
 *    physical import mode, consistency recovered by stripping the
 *    `--consistency ` prefix); filter rules named
 *    `<source>-filter-rule-<idx>` (:780-783); table-migrate rules from
 *    route rules then BA-list entries, deduplicated on
 *    (source, schema, table) with first-wins.
 *  - OpenAPITaskToTaskConfig (:752-763) = openapi → subtasks →
 *    TaskConfig, then the rebuilt task must pass
 *    [[DmTaskConfig.adjust]] — composed here the same way, which
 *    proves the generated names/references form a VALID task (no
 *    unused globals, all references resolvable).
 *
 * DBConfig/TLS material is carried opaquely (host/port/user/password
 * and the PEM contents are copied, never interpreted) — wire-level
 * concerns out of the query surface.
 */
object TaskConverters {

  val ErrOpenAPICommonError = "ErrOpenAPICommonError"
  val ErrSourceIDNotFound = "ErrConfigSourceIDNotFound"

  // ---- shared rule payloads ----------------------------------------------

  final case class RouteRule(schemaPattern: String, tablePattern: String,
      targetSchema: String, targetTable: String)
  final case class FilterRule(schemaPattern: String, tablePattern: String,
      events: Seq[String], sqlPatterns: Seq[String])
  final case class BaList(doDBs: Seq[String], doTables: Seq[(String, String)])
  final case class MetaCfg(binlogName: String = "", binlogPos: Long = 0,
      binlogGtid: String = "")
  /** DefaultMydumperConfig (task.go:220-227). */
  final case class MydumperCfg(path: String = "./bin/mydumper",
      threads: Int = 4, chunkFilesize: String = "64",
      skipTzUtc: Boolean = true, extraArgs: String = "")
  /** DefaultSyncerConfig (task.go:450-458). */
  final case class SyncerCfg(workerCount: Int = 16, batch: Int = 100,
      queueSize: Int = 1024, checkpointFlushInterval: Int = 30,
      safeMode: Boolean = false, safeModeDuration: String = "60s",
      compact: Boolean = false, multipleRows: Boolean = false)

  /** One generated subtask — [[SubTaskValidate.SubTaskCfg]] plus the
    * rule payloads the converters shuttle (subtask.go:138-151). */
  final case class SubTask(
      core: STV.SubTaskCfg,
      meta: Option[MetaCfg] = None,
      caseSensitive: Boolean = false,
      routeRules: Seq[RouteRule] = Nil,
      filterRules: Seq[FilterRule] = Nil,
      baList: Option[BaList] = None,
      mydumper: MydumperCfg = MydumperCfg(),
      syncer: SyncerCfg = SyncerCfg(),
      ignoreCheckingItems: Seq[String] = Nil,
      pdAddr: String = "",
      security: Option[(String, String, String, Seq[String])] = None)

  // ---- openapi.Task model (dm/openapi, the fields the converters read) ---

  final case class OpenApiSecurity(sslCaContent: String,
      sslCertContent: String, sslKeyContent: String,
      certAllowedCn: Seq[String] = Nil)
  final case class FullMigrateConf(
      exportThreads: Option[Int] = None, importThreads: Option[Int] = None,
      dataDir: Option[String] = None, consistency: Option[String] = None,
      importMode: Option[String] = None,
      onDuplicateLogical: Option[String] = None,
      onDuplicatePhysical: Option[String] = None,
      analyze: Option[String] = None, checksum: Option[String] = None,
      pdAddr: Option[String] = None,
      security: Option[OpenApiSecurity] = None,
      sortingDir: Option[String] = None)
  final case class IncrMigrateConf(replThreads: Option[Int] = None,
      replBatch: Option[Int] = None)
  final case class SourceConf(sourceName: String,
      binlogName: Option[String] = None, binlogPos: Option[Long] = None,
      binlogGtid: Option[String] = None)
  final case class MigrateRuleTarget(schema: Option[String],
      table: Option[String])
  final case class MigrateRule(sourceName: String, schema: String,
      table: String, target: Option[MigrateRuleTarget] = None,
      binlogFilterRules: Seq[String] = Nil)
  final case class BinlogFilterRule(ignoreEvents: Seq[String] = Nil,
      ignoreSqls: Seq[String] = Nil)
  final case class OpenApiTask(
      name: String, taskMode: String,
      shardMode: Option[String] = None,
      strictOptimisticShardMode: Option[Boolean] = None,
      metaSchema: String = "",
      enhanceOnlineSchemaChange: Boolean = false,
      onDuplicate: String = "",
      sourceConf: Seq[SourceConf] = Nil,
      fullConf: Option[FullMigrateConf] = None,
      incrConf: Option[IncrMigrateConf] = None,
      migrateRules: Seq[MigrateRule] = Nil,
      binlogFilterRules: Map[String, BinlogFilterRule] = Map.empty,
      ignoreCheckingItems: Seq[String] = Nil)

  /** removeDuplication (task_converters.go:765-778) — first wins. */
  def removeDuplication(in: Seq[String]): Seq[String] = in.distinct

  /** genFilterRuleName (task_converters.go:780-783). */
  def genFilterRuleName(sourceName: String, idx: Int): String =
    s"$sourceName-filter-rule-$idx"

  /** OpenAPITaskToSubTaskConfigs (task_converters.go:118-345). */
  def openApiTaskToSubTasks(task: OpenApiTask,
      sourceCfgMap: Map[String, STV.SourceCfgModel],
      toSession: Map[String, String] = Map.empty)
      : Either[(String, String), Seq[SubTask]] = {
    // import-into precheck fires before any per-source work (:121-127)
    for (full <- task.fullConf; mode <- full.importMode)
      if (mode.equalsIgnoreCase("import-into") && task.sourceConf.length > 1)
        return Left(TC.ErrImportIntoSharding ->
          "import-into mode does not support sharding")

    val rulesBySource = task.migrateRules.groupBy(_.sourceName)
    val out = Vector.newBuilder[SubTask]

    for (src <- task.sourceConf) {
      if (!sourceCfgMap.contains(src.sourceName))
        return Left(ErrSourceIDNotFound -> src.sourceName)
      val meta =
        if (src.binlogName.isEmpty && src.binlogPos.isEmpty &&
            src.binlogGtid.isEmpty) None
        else Some(MetaCfg(src.binlogName.getOrElse(""),
          src.binlogPos.getOrElse(0L), src.binlogGtid.getOrElse("")))

      var loader = TC.LoaderCfg(poolSize = TC.DefaultPoolSize,
        dir = "./dumped_data", importMode = "logical",
        onDuplicateLogical = "replace")
      var mydumper = MydumperCfg()
      var pdAddr = ""
      var security: Option[(String, String, String, Seq[String])] = None
      for (full <- task.fullConf) {
        full.analyze.foreach(v => loader = loader.copy(analyze = v))
        full.checksum.foreach(v => loader = loader.copy(checksumPhysical = v))
        full.consistency.foreach(v =>
          mydumper = mydumper.copy(extraArgs = s"--consistency $v"))
        full.exportThreads.foreach(v => mydumper = mydumper.copy(threads = v))
        full.importThreads.foreach(v => loader = loader.copy(poolSize = v))
        full.dataDir.foreach(v => loader = loader.copy(dir = v))
        full.importMode.foreach(v => loader = loader.copy(importMode = v))
        full.onDuplicateLogical.foreach(v =>
          loader = loader.copy(onDuplicateLogical = v))
        full.onDuplicatePhysical.foreach(v =>
          loader = loader.copy(onDuplicatePhysical = v))
        full.pdAddr.foreach(v => pdAddr = v)
        full.sortingDir.foreach(v =>
          loader = loader.copy(sortingDirPhysical = v))
        for (sec <- full.security) {
          if (sec.sslCaContent.isEmpty || sec.sslCertContent.isEmpty ||
              sec.sslKeyContent.isEmpty)
            return Left(ErrOpenAPICommonError ->
              "Invalid security config, full migrate conf's security fields should not be \"\"")
          security = Some((sec.sslCaContent, sec.sslCertContent,
            sec.sslKeyContent, sec.certAllowedCn))
        }
      }
      var syncer = SyncerCfg()
      for (incr <- task.incrConf) {
        incr.replThreads.foreach(v => syncer = syncer.copy(workerCount = v))
        incr.replBatch.foreach(v => syncer = syncer.copy(batch = v))
      }

      var doDBs = Vector.empty[String]
      var doTables = Vector.empty[(String, String)]
      var routeRules = Vector.empty[RouteRule]
      var filterRules = Vector.empty[FilterRule]
      for (rule <- rulesBySource.getOrElse(src.sourceName, Nil)) {
        for (t <- rule.target if t.schema.nonEmpty || t.table.nonEmpty)
          routeRules :+= RouteRule(rule.schema, rule.table,
            t.schema.getOrElse(""), t.table.getOrElse(""))
        for (name <- rule.binlogFilterRules)
          task.binlogFilterRules.get(name) match {
            case None => return Left(ErrOpenAPICommonError ->
              s"filter rule name $name not found.")
            case Some(tpl) => filterRules :+= FilterRule(rule.schema,
              rule.table, tpl.ignoreEvents, tpl.ignoreSqls)
          }
        if (rule.table.nonEmpty) doTables :+= ((rule.schema, rule.table))
        else doDBs :+= rule.schema
      }
      val baList =
        if (doDBs.isEmpty && doTables.isEmpty) None
        else Some(BaList(removeDuplication(doDBs), doTables))

      val core = STV.SubTaskCfg(
        name = task.name, sourceId = src.sourceName, mode = task.taskMode,
        isSharding = task.shardMode.isDefined,
        shardMode = task.shardMode.getOrElse(""),
        strictOptimistic = task.strictOptimisticShardMode.getOrElse(false),
        onlineDdl = task.enhanceOnlineSchemaChange,
        metaSchema = task.metaSchema,
        loader = loader, chunkFilesize = mydumper.chunkFilesize,
        syncerQueueSize = syncer.queueSize,
        syncerCheckpointFlushInterval = syncer.checkpointFlushInterval,
        syncerSafeMode = syncer.safeMode,
        syncerSafeModeDuration = syncer.safeModeDuration,
        syncerCompact = syncer.compact,
        syncerMultipleRows = syncer.multipleRows,
        toSession = toSession,
        baListSet = baList.isDefined)
      STV.adjustSubTask(core) match {
        case Left((err, msg)) =>
          return Left(err -> s"source name ${src.sourceName}: $msg")
        case Right(adj) =>
          out += SubTask(adj.cfg, meta,
            caseSensitive = sourceCfgMap(src.sourceName).caseSensitive,
            routeRules = routeRules, filterRules = filterRules,
            baList = baList, mydumper = mydumper, syncer = syncer,
            ignoreCheckingItems = task.ignoreCheckingItems,
            pdAddr = pdAddr, security = security)
      }
    }
    Right(out.result())
  }

  // ---- SubTaskConfigsToTaskConfig ----------------------------------------

  /** getGenerateName (task_converters.go:1053-1065): equal payloads
    * share a name; a new payload takes `<prefix>-%02d` at idx+1. */
  final class NameGen(prefix: String) {
    private var idx = 0
    private val seen = collection.mutable.Map.empty[Any, String]
    def name(payload: Any): String =
      seen.getOrElseUpdate(payload, { idx += 1; f"$prefix-$idx%02d" })
  }

  final case class ConvertedInstance(sourceId: String,
      meta: Option[MetaCfg], routeRules: Seq[String],
      filterRules: Seq[String], baListName: String,
      mydumperConfigName: String, loaderConfigName: String,
      syncerConfigName: String, validatorConfigName: String)

  final case class ConvertedTask(
      name: String, taskMode: String, isSharding: Boolean,
      shardMode: String, strictOptimistic: Boolean, onlineDdl: Boolean,
      metaSchema: String, collationCompatible: String,
      caseSensitive: Boolean,
      routes: Map[String, RouteRule], filters: Map[String, FilterRule],
      baLists: Map[String, Option[BaList]],
      mydumpers: Map[String, MydumperCfg],
      loaders: Map[String, TC.LoaderCfg],
      syncers: Map[String, SyncerCfg],
      validators: Map[String, TC.ValidatorCfg],
      instances: Seq[ConvertedInstance])

  /** SubTaskConfigsToTaskConfig (task_converters.go:371-498). */
  def subTasksToTaskConfig(stCfgs: Seq[SubTask]): ConvertedTask = {
    val st0 = stCfgs.head
    val baGen = new NameGen("balist"); val routeGen = new NameGen("route")
    val filterGen = new NameGen("filter"); val dumpGen = new NameGen("dump")
    val loadGen = new NameGen("load"); val syncGen = new NameGen("sync")
    val validatorGen = new NameGen("validator")
    val efGen = new NameGen("expr-filter"); val _ = efGen // parity slot

    var routes = Map.empty[String, RouteRule]
    var filters = Map.empty[String, FilterRule]
    var baLists = Map.empty[String, Option[BaList]]
    var mydumpers = Map.empty[String, MydumperCfg]
    var loaders = Map.empty[String, TC.LoaderCfg]
    var syncers = Map.empty[String, SyncerCfg]
    var validators = Map.empty[String, TC.ValidatorCfg]
    var instances = Vector.empty[ConvertedInstance]

    for (st <- stCfgs) {
      val baName = baGen.name(st.baList)
      baLists += baName -> st.baList

      val routeNames = st.routeRules.map { r =>
        val n = routeGen.name(r); routes += n -> r; n
      }
      val filterNames = st.filterRules.map { f =>
        val n = filterGen.name(f); filters += n -> f; n
      }
      val dumpName = dumpGen.name(st.mydumper)
      mydumpers += dumpName -> st.mydumper

      val loadName = loadGen.name(st.core.loader)
      // recover the user's input dir: trim the subtask suffix (:442-456)
      val dirSuffix =
        if (STV.isS3Path(st.core.loader.dir))
          "/" + st.core.name + "." + st.core.sourceId
        else "." + st.core.name
      loaders += loadName -> st.core.loader.copy(
        dir = STV.trimPath(st.core.loader.dir, dirSuffix))

      val syncName = syncGen.name(st.syncer)
      syncers += syncName -> st.syncer
      val validatorName = validatorGen.name(st.core.validator)
      validators += validatorName -> st.core.validator

      instances :+= ConvertedInstance(st.core.sourceId, st.meta,
        routeNames, filterNames, baName, dumpName, loadName, syncName,
        validatorName)
    }

    ConvertedTask(st0.core.name, st0.core.mode, st0.core.isSharding,
      st0.core.shardMode, st0.core.strictOptimistic, st0.core.onlineDdl,
      st0.core.metaSchema,
      collationCompatible = "loose", // :494-496 empty folds to loose
      caseSensitive = st0.caseSensitive,
      routes, filters, baLists, mydumpers, loaders, syncers, validators,
      instances)
  }

  /** View a ConvertedTask as a [[DmTaskConfig.TaskConfig]] so the
    * composition ends in TaskConfig.adjust like the reference
    * (task_converters.go:758-761). */
  def toTaskConfig(ct: ConvertedTask): TC.TaskConfig =
    TC.TaskConfig(
      name = ct.name, taskMode = ct.taskMode,
      metaSchema = ct.metaSchema, shardMode = ct.shardMode,
      isSharding = ct.isSharding, strictOptimistic = ct.strictOptimistic,
      collationCompatible = ct.collationCompatible,
      onlineDdl = ct.onlineDdl,
      routes = ct.routes.keySet, filters = ct.filters.keySet,
      baLists = ct.baLists.keySet,
      mydumpers = ct.mydumpers.keySet, loaders = ct.loaders,
      syncers = ct.syncers.keySet, validators = ct.validators,
      instances = ct.instances.map { i =>
        TC.Instance(sourceId = i.sourceId,
          meta = i.meta.map(m => TC.Meta(m.binlogName, m.binlogGtid)),
          routeRules = i.routeRules, filterRules = i.filterRules,
          baListName = i.baListName,
          mydumperConfigName = i.mydumperConfigName,
          loaderConfigName = i.loaderConfigName,
          syncerConfigName = i.syncerConfigName,
          validatorConfigName = i.validatorConfigName)
      })

  /** OpenAPITaskToTaskConfig (task_converters.go:752-763): openapi →
    * subtasks → TaskConfig, then TaskConfig.adjust must pass. */
  def openApiTaskToTaskConfig(task: OpenApiTask,
      sourceCfgMap: Map[String, STV.SourceCfgModel],
      toSession: Map[String, String] = Map.empty)
      : Either[(String, String), (ConvertedTask, TC.Adjusted)] =
    for {
      subTasks <- openApiTaskToSubTasks(task, sourceCfgMap, toSession)
      // a source-less task would reach TaskConfig.adjust's
      // at-least-one-instance error anyway; surface it here instead of
      // letting subTasksToTaskConfig's head throw
      _ <- if (subTasks.isEmpty)
        Left(TC.ErrInstsAtLeastOne -> "mysql-instances at least one")
      else Right(())
      ct = subTasksToTaskConfig(subTasks)
      adjusted <- TC.adjust(toTaskConfig(ct))
    } yield (ct, adjusted)

  // ---- SubTaskConfigsToOpenAPITask ---------------------------------------

  /** SubTaskConfigsToOpenAPITask (task_converters.go:515-712). */
  def subTasksToOpenApiTask(stCfgs: Seq[SubTask]): OpenApiTask = {
    val st0 = stCfgs.head
    val sourceConf = stCfgs.map { st =>
      st.meta match {
        case Some(m) => SourceConf(st.core.sourceId, Some(m.binlogName),
          Some(m.binlogPos), Some(m.binlogGtid))
        case None => SourceConf(st.core.sourceId)
      }
    }
    val dirSuffix =
      if (STV.isS3Path(st0.core.loader.dir))
        "/" + st0.core.name + "." + st0.core.sourceId
      else "." + st0.core.name
    val userDir = STV.trimPath(st0.core.loader.dir, dirSuffix)
    val consistency =
      st0.mydumper.extraArgs.replaceFirst("--consistency ", "")
    val fullConf = FullMigrateConf(
      exportThreads = Some(st0.mydumper.threads),
      importThreads = Some(st0.core.loader.poolSize),
      dataDir = Some(userDir),
      consistency = if (consistency.nonEmpty) Some(consistency) else None,
      importMode =
        if (st0.core.loader.importMode.nonEmpty)
          Some(st0.core.loader.importMode) else None,
      pdAddr = // only physical import mode surfaces the PD address
        if (st0.core.loader.importMode == "physical") Some(st0.pdAddr)
        else None,
      security = st0.security.map { case (ca, cert, key, cn) =>
        OpenApiSecurity(ca, cert, key, cn)
      })
    val incrConf = IncrMigrateConf(
      replThreads = Some(st0.syncer.workerCount),
      replBatch = Some(st0.syncer.batch))

    // filter rule map: <source>-filter-rule-<idx> (:596-614)
    var filterRuleMap = Map.empty[String, BinlogFilterRule]
    val filterNamesBySource = stCfgs.collect {
      case st if st.filterRules.nonEmpty =>
        val names = st.filterRules.zipWithIndex.map { case (f, idx) =>
          val n = genFilterRuleName(st.core.sourceId, idx)
          filterRuleMap += n -> BinlogFilterRule(f.events, f.sqlPatterns)
          n
        }
        st.core.sourceId -> names
    }.toMap

    // table migrate rules — route rules first, then BA list, deduped on
    // (source, schema, table) with first-wins (:616-669)
    var seen = Set.empty[String]
    var migrateRules = Vector.empty[MigrateRule]
    def appendRule(source: String, schema: String, table: String,
        targetSchema: String, targetTable: String): Unit = {
      val key = Seq(source, schema, table).mkString("-")
      if (!seen(key)) {
        seen += key
        val target =
          if (targetSchema.nonEmpty)
            Some(MigrateRuleTarget(Some(targetSchema),
              if (targetTable.nonEmpty) Some(targetTable) else None))
          else None
        migrateRules :+= MigrateRule(source, schema, table, target,
          filterNamesBySource.getOrElse(source, Nil))
      }
    }
    for (st <- stCfgs; r <- st.routeRules)
      appendRule(st.core.sourceId, r.schemaPattern, r.tablePattern,
        r.targetSchema, r.targetTable)
    for (st <- stCfgs; ba <- st.baList) {
      for (db <- ba.doDBs) appendRule(st.core.sourceId, db, "", "", "")
      for ((schema, table) <- ba.doTables)
        appendRule(st.core.sourceId, schema, table, "", "")
    }

    buildOpenApiTask(st0, sourceConf, fullConf, incrConf, migrateRules,
      filterRuleMap)
  }

  private def buildOpenApiTask(st0: SubTask, sourceConf: Seq[SourceConf],
      fullConf: FullMigrateConf, incrConf: IncrMigrateConf,
      migrateRules: Seq[MigrateRule],
      filterRuleMap: Map[String, BinlogFilterRule]): OpenApiTask =
    OpenApiTask(
      name = st0.core.name, taskMode = st0.core.mode,
      shardMode =
        if (st0.core.shardMode.nonEmpty) Some(st0.core.shardMode) else None,
      strictOptimisticShardMode = Some(st0.core.strictOptimistic),
      metaSchema = st0.core.metaSchema,
      enhanceOnlineSchemaChange = st0.core.onlineDdl,
      onDuplicate = st0.core.loader.onDuplicateLogical,
      sourceConf = sourceConf,
      fullConf = Some(fullConf), incrConf = Some(incrConf),
      migrateRules = migrateRules,
      binlogFilterRules = filterRuleMap,
      ignoreCheckingItems = st0.ignoreCheckingItems)

  // ---- OpenAPI source converters (source_converter.go:23-110) ------------

  /** source_config.go:59 — PM requirement: the API always returns an
    * obfuscated password. */
  val ObfuscatedPasswordForFeedback = "******"

  /** The openapi.Source fields the converters shuttle. */
  final case class OpenApiSource(
      sourceName: String, enable: Boolean, enableGtid: Boolean,
      host: String, port: Int, user: String, password: Option[String],
      flavor: Option[String] = None,
      purgeInterval: Option[Long] = None, purgeExpires: Option[Long] = None,
      purgeRemainSpace: Option[Long] = None,
      enableRelay: Option[Boolean] = None,
      relayBinlogName: Option[String] = None,
      relayBinlogGtid: Option[String] = None,
      relayDir: Option[String] = None,
      securityCertAllowedCn: Option[Seq[String]] = None)

  /** The SourceConfig view the converters read/write:
    * [[SubTaskValidate.SourceCfgModel]] plus the connection block and
    * purge knobs (source_config.go:62-105). */
  final case class SourceWithConn(
      cfg: STV.SourceCfgModel,
      enable: Boolean = true,
      host: String = "", port: Int = 0, user: String = "",
      password: String = "",
      purgeIntervalSec: Long = 3600, purgeExpiresHr: Long = 0,
      purgeRemainGb: Long = 15,
      enableRelay: Boolean = false,
      securityCertAllowedCn: Seq[String] = Nil,
      hasSecurity: Boolean = false)

  /** SourceCfgToOpenAPISource (source_converter.go:23-55): the password
    * is ALWAYS obfuscated, the flavor only ships when set, and a
    * security block exposes ONLY cert-allowed-cn — never PEM content. */
  def sourceCfgToOpenApi(s: SourceWithConn): OpenApiSource =
    OpenApiSource(
      sourceName = s.cfg.sourceId, enable = s.enable,
      enableGtid = s.cfg.enableGtid,
      host = s.host, port = s.port, user = s.user,
      password = Some(ObfuscatedPasswordForFeedback),
      flavor = if (s.cfg.flavor.nonEmpty) Some(s.cfg.flavor) else None,
      purgeInterval = Some(s.purgeIntervalSec),
      purgeExpires = Some(s.purgeExpiresHr),
      purgeRemainSpace = Some(s.purgeRemainGb),
      enableRelay = Some(s.enableRelay),
      relayBinlogName = Some(s.cfg.relayBinlogName),
      relayBinlogGtid = Some(s.cfg.relayBinlogGtid),
      relayDir = Some(s.cfg.relayDir),
      securityCertAllowedCn =
        if (s.hasSecurity) Some(s.securityCertAllowedCn) else None)

  /** OpenAPISourceToSourceCfg (source_converter.go:57-110): starts from
    * NewSourceConfig's defaults (enable + purge {3600,0,15} + checker
    * fills, source_config.go:108-130) and nil-coalesces every block. */
  def openApiToSourceCfg(o: OpenApiSource): SourceWithConn = {
    val base = SourceWithConn(
      cfg = STV.adjustSource(STV.SourceCfgModel()).cfg)
    base.copy(
      cfg = base.cfg.copy(
        sourceId = o.sourceName,
        enableGtid = o.enableGtid,
        flavor = o.flavor.getOrElse(""),
        relayBinlogName = o.relayBinlogName.getOrElse(""),
        relayBinlogGtid = o.relayBinlogGtid.getOrElse(""),
        relayDir = o.relayDir.getOrElse("")),
      enable = o.enable,
      host = o.host, port = o.port, user = o.user,
      password = o.password.getOrElse(""),
      purgeIntervalSec = o.purgeInterval.getOrElse(3600L),
      purgeExpiresHr = o.purgeExpires.getOrElse(0L),
      purgeRemainGb = o.purgeRemainSpace.getOrElse(15L),
      enableRelay = o.enableRelay.getOrElse(false),
      securityCertAllowedCn = o.securityCertAllowedCn.getOrElse(Nil),
      hasSecurity = o.securityCertAllowedCn.isDefined)
  }
}
