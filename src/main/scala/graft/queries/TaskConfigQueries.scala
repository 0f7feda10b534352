package graft.queries

import org.apache.spark.sql.SparkSession

/**
 * Gates for the DM task-admission surface: the TaskConfig adjust chain
 * (q299), the SubTaskConfig adjust chain (q300), the SourceConfig
 * verify/adjust chain (q301) and the OpenAPI task converters (q302) —
 * dm/config/{task,subtask,source_config,task_converters}.go, the rule
 * sets every `start-task` / `check-task` / OpenAPI create runs.
 */
object TaskConfigQueries {

  import graft.streaming.{DmTaskConfig => TC}
  import graft.streaming.{SubTaskValidate => STV}

  /**
   * q299 — the DM task-config validation ROOT
   * ([[graft.streaming.DmTaskConfig]], dm/config/task.go:699-1048 +
   * 336-396 loader adjust + 486-523 validator adjust +
   * checking_item.go): one rule per row — task-level gates in their
   * decision order (name → mode → shard → strict-optimistic →
   * column-mappings → collation → checking-items → online-scheme →
   * target-db → instances), expression-filter legs, global validator
   * adjust before the instance loop, the per-instance reference/
   * conflict/duplicate legs, safe-mode duration algebra, global loader
   * adjust inside the unused sweep, unused-global detection, timezone.
   */
  val taskValidate = GateQuery(
    "q299_task_validate",
    Some("""SELECT * FROM (VALUES
      |  ('task','ok_minimal',   1,'','dm_meta','','loose',0,'','','','','',NULL,'','60s',''),
      |  ('task','name_empty',   0,'ErrConfigNeedUniqueTaskName','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','mode_bad',     0,'ErrConfigInvalidTaskMode','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','mode_loadsync',1,'','dm_meta','','loose',0,'','','','','',NULL,'','60s',''),
      |  ('task','shard_bad',    0,'ErrConfigShardModeNotSupport','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','shard_legacy', 1,'','dm_meta','pessimistic','loose',0,'','','','','',NULL,'','60s',''),
      |  ('task','strict_bad',   0,'ErrConfigStrictOptimisticShardMode','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','strict_ok',    1,'','dm_meta','optimistic','loose',0,'','','','','',NULL,'','60s',''),
      |  ('task','colmap',       0,'ErrConfigColumnMappingDeprecated','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','collation_bad',0,'ErrConfigCollationCompatibleNotSupport','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','collation_ok', 1,'','dm_meta','','strict',0,'','','','','',NULL,'','60s',''),
      |  ('task','checkitem_bad',0,'ErrConfigCheckItemNotSupport','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','checkitem_ok', 1,'','dm_meta','','loose',0,'','','','','',NULL,'','60s',''),
      |  ('task','scheme_bad',   0,'ErrConfigOnlineSchemeNotSupport','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','scheme_ghost', 1,'','dm_meta','','loose',1,'','','','','',NULL,'','60s','online-ddl-scheme-deprecated'),
      |  ('task','no_target',    0,'ErrConfigNeedTargetDB','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','no_inst',      0,'ErrConfigMySQLInstsAtLeastOne','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','colmap_first', 0,'ErrConfigColumnMappingDeprecated','','','',NULL,'','','','','',NULL,'','',''),
      |  ('task','mode_first',   0,'ErrConfigInvalidTaskMode','','','',NULL,'','','','','',NULL,'','',''),
      |  ('expr','schema_empty', 0,'ErrConfigExprFilterEmptyName','','','',NULL,'','','','','',NULL,'','',''),
      |  ('expr','table_empty',  0,'ErrConfigExprFilterEmptyName','','','',NULL,'','','','','',NULL,'','',''),
      |  ('expr','many_kinds',   0,'ErrConfigExprFilterManyExpr','','','',NULL,'','','','','',NULL,'','',''),
      |  ('vald','mode_bad',     0,'ErrConfigValidationMode','','','',NULL,'','','','','',NULL,'','',''),
      |  ('vald','fills',        1,'','dm_meta','','loose',0,'','','','','full',4,'500m','60s',''),
      |  ('vald','ram_bad',      0,'ErrRamBytesInvalid','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','src_empty',    0,'ErrConfigEmptySourceID','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','meta_bad',     0,'ErrConfigMetaInvalid','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','dump_conflict',0,'ErrConfigMydumperCfgConflict','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','load_conflict',0,'ErrConfigLoaderCfgConflict','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','sync_conflict',0,'ErrConfigSyncerCfgConflict','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','dup_source',   0,'ErrConfigMySQLInstSameSourceID','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','route_nf',     0,'ErrConfigRouteRuleNotFound','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','filter_nf',    0,'ErrConfigFilterRuleNotFound','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','balist_nf',    0,'ErrConfigBAListNotFound','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','bw_fallback',  1,'','dm_meta','','loose',0,'','','','','',NULL,'','60s',''),
      |  ('inst','dump_nf',      0,'ErrConfigMydumperCfgNotFound','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','dump_path',    0,'ErrConfigMydumperPathNotValid','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','load_nf',      0,'ErrConfigLoaderCfgNotFound','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','ii_multi',     0,'ErrConfigImportIntoShardingNotSupport','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','sync_nf',      0,'ErrConfigSyncerCfgNotFound','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','safedur_bad',  0,'ErrConfigInvalidSafeModeDuration','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','safedur_zero', 0,'ErrConfigConfictSafeModeDurationAndSafeMode','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','safedur_fill', 1,'','dm_meta','','loose',0,'','','','','',NULL,'','90s',''),
      |  ('inst','validator_nf', 0,'ErrContinuousValidatorCfgNotFound','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','expr_nf',      0,'ErrConfigExprFilterNotFound','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','dup_rules',    0,'ErrConfigDuplicateCfgItem','','','',NULL,'','','','','',NULL,'','',''),
      |  ('inst','meta_warn',    1,'','dm_meta','','loose',0,'','','','','',NULL,'','60s','meta-unused-0'),
      |  ('inst','incr_nometa',  1,'','dm_meta','','loose',0,'','','','','',NULL,'','60s','no-meta-incremental-0'),
      |  ('load','mode_bad',     0,'ErrConfigInvalidLoadMode','','','',NULL,'','','','','',NULL,'','',''),
      |  ('load','mode_fold',    1,'','dm_meta','','loose',0,'logical','replace','required','optional','',NULL,'','60s',''),
      |  ('load','dup_log_bad',  0,'ErrConfigInvalidDuplicateResolution','','','',NULL,'','','','','',NULL,'','',''),
      |  ('load','dup_phys_bad', 0,'ErrConfigInvalidPhysicalDuplicateResolution','','','',NULL,'','','','','',NULL,'','',''),
      |  ('load','checksum_bad', 0,'ErrConfigInvalidPhysicalChecksum','','','',NULL,'','','','','',NULL,'','',''),
      |  ('load','analyze_bad',  0,'ErrConfigInvalidLoadAnalyze','','','',NULL,'','','','','',NULL,'','',''),
      |  ('glob','unused',       0,'ErrConfigGlobalConfigsUnused','','','',NULL,'','','','','',NULL,'','',''),
      |  ('glob','tz_bad',       0,'ErrConfigInvalidTimezone','','','',NULL,'','','','','',NULL,'','',''),
      |  ('glob','tz_ok',        1,'','dm_meta','','loose',0,'','','','','',NULL,'','60s','')
      |) v(family, kase, ok, err, meta_schema, shard, collation_mode,
      |    online_ddl, import_mode, dup_logical, checksum, analyze_lvl,
      |    v_mode, v_worker, v_max, safe_dur, warns)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import TC.{Instance => I, TaskConfig => T, Meta => M}

    def run(family: String, kase: String, cfg: T)
        : (String, String, Int, String, String, String, String,
           Option[Int], String, String, String, String, String,
           Option[Int], String, String, String) =
      TC.adjust(cfg) match {
        case Left((err, _)) =>
          (family, kase, 0, err, "", "", "", None, "", "", "", "", "",
            None, "", "", "")
        case Right(TC.Adjusted(c, warns)) =>
          val l = c.loaders.get("l1")
          // the instance's EFFECTIVE validator (task.go:940-950): the
          // name-ref resolves to the adjusted global block
          val v = c.instances.headOption
            .filter(_.validatorConfigName.nonEmpty)
            .map(i => TC.effectiveValidator(c, i))
          (family, kase, 1, "", c.metaSchema, c.shardMode,
            c.collationCompatible, Some(if (c.onlineDdl) 1 else 0),
            l.map(_.importMode).getOrElse(""),
            l.map(_.onDuplicateLogical).getOrElse(""),
            l.map(_.checksumPhysical).getOrElse(""),
            l.map(_.analyze).getOrElse(""),
            v.map(_.mode).getOrElse(""), v.map(_.workerCount),
            v.map(_.maxPendingRowSize).getOrElse(""),
            c.instances.headOption.map(_.syncerSafeModeDuration).getOrElse(""),
            warns.mkString(","))
      }

    val i1 = I("s1")
    val B = T(name = "t", taskMode = "all", instances = Seq(i1))
    def withLoader(l: TC.LoaderCfg): T =
      B.copy(loaders = Map("l1" -> l),
        instances = Seq(i1.copy(loaderConfigName = "l1")))
    def withValidator(v: TC.ValidatorCfg): T =
      B.copy(validators = Map("v1" -> v),
        instances = Seq(i1.copy(validatorConfigName = "v1")))
    val ef = TC.ExprFilterCfg("db", "tbl", insertExpr = "a > 1")

    val rows = Seq(
      run("task", "ok_minimal", B),
      run("task", "name_empty", B.copy(name = "")),
      run("task", "mode_bad", B.copy(taskMode = "sync")),
      run("task", "mode_loadsync", B.copy(taskMode = "load&sync")),
      run("task", "shard_bad", B.copy(shardMode = "strict")),
      run("task", "shard_legacy", B.copy(isSharding = true)),
      run("task", "strict_bad",
        B.copy(strictOptimistic = true, shardMode = "pessimistic")),
      run("task", "strict_ok",
        B.copy(strictOptimistic = true, shardMode = "optimistic")),
      run("task", "colmap", B.copy(hasColumnMappings = true)),
      run("task", "collation_bad", B.copy(collationCompatible = "compatible")),
      run("task", "collation_ok", B.copy(collationCompatible = "strict")),
      run("task", "checkitem_bad",
        B.copy(ignoreCheckingItems = Seq("binlog_cache"))),
      run("task", "checkitem_ok",
        B.copy(ignoreCheckingItems = Seq("binlog_enable", "primary_key"))),
      run("task", "scheme_bad", B.copy(onlineDdlScheme = "osc")),
      run("task", "scheme_ghost", B.copy(onlineDdlScheme = "gh-ost")),
      run("task", "no_target", B.copy(hasTargetDb = false)),
      run("task", "no_inst", B.copy(instances = Nil)),
      // decision-order pins: column-mappings beats collation; task-mode
      // beats target-db (task.go:703 vs :744, :721 vs :725)
      run("task", "colmap_first", B.copy(hasColumnMappings = true,
        collationCompatible = "compatible")),
      run("task", "mode_first", B.copy(taskMode = "sync", hasTargetDb = false)),
      run("expr", "schema_empty",
        B.copy(exprFilter = Map("e1" -> ef.copy(schema = "")))),
      run("expr", "table_empty",
        B.copy(exprFilter = Map("e1" -> ef.copy(table = "")))),
      run("expr", "many_kinds",
        B.copy(exprFilter = Map("e1" -> ef.copy(deleteExpr = "b = 2")))),
      run("vald", "mode_bad",
        withValidator(TC.ValidatorCfg(mode = "quick"))),
      run("vald", "fills", withValidator(TC.ValidatorCfg(mode = "full"))),
      run("vald", "ram_bad", withValidator(
        TC.ValidatorCfg(mode = "full", maxPendingRowSize = "12q"))),
      run("inst", "src_empty", B.copy(instances = Seq(I("")))),
      run("inst", "meta_bad",
        B.copy(instances = Seq(i1.copy(meta = Some(M("", "")))))),
      run("inst", "dump_conflict", B.copy(
        mydumpers = Set("m1"),
        instances = Seq(i1.copy(mydumperConfigName = "m1",
          inlineMydumper = true)))),
      run("inst", "load_conflict", B.copy(
        loaders = Map("l1" -> TC.LoaderCfg()),
        instances = Seq(i1.copy(loaderConfigName = "l1",
          inlineLoader = true)))),
      run("inst", "sync_conflict", B.copy(
        syncers = Set("y1"),
        instances = Seq(i1.copy(syncerConfigName = "y1",
          inlineSyncer = true)))),
      run("inst", "dup_source", B.copy(instances = Seq(i1, I("s1")))),
      run("inst", "route_nf",
        B.copy(instances = Seq(i1.copy(routeRules = Seq("r9"))))),
      run("inst", "filter_nf",
        B.copy(instances = Seq(i1.copy(filterRules = Seq("f9"))))),
      run("inst", "balist_nf",
        B.copy(instances = Seq(i1.copy(baListName = "b9")))),
      run("inst", "bw_fallback", B.copy(bwLists = Set("b1"),
        instances = Seq(i1.copy(bwListName = "b1")))),
      run("inst", "dump_nf",
        B.copy(instances = Seq(i1.copy(mydumperConfigName = "m9")))),
      run("inst", "dump_path",
        B.copy(instances = Seq(i1.copy(inlineMydumper = true,
          inlineMydumperPathBlank = true)))),
      run("inst", "load_nf",
        B.copy(instances = Seq(i1.copy(loaderConfigName = "l9")))),
      run("inst", "ii_multi", B.copy(
        loaders = Map("l1" -> TC.LoaderCfg(importMode = "IMPORT-INTO")),
        instances = Seq(i1.copy(loaderConfigName = "l1"),
          I("s2", loaderConfigName = "l1")))),
      run("inst", "sync_nf",
        B.copy(instances = Seq(i1.copy(syncerConfigName = "y9")))),
      run("inst", "safedur_bad",
        B.copy(instances = Seq(i1.copy(syncerSafeModeDuration = "12x")))),
      run("inst", "safedur_zero",
        B.copy(instances = Seq(i1.copy(syncerSafeMode = true,
          syncerSafeModeDuration = "0s")))),
      run("inst", "safedur_fill", B.copy(instances =
        Seq(i1.copy(syncerCheckpointFlushInterval = 45)))),
      run("inst", "validator_nf",
        B.copy(instances = Seq(i1.copy(validatorConfigName = "v9")))),
      run("inst", "expr_nf",
        B.copy(instances = Seq(i1.copy(exprFilters = Seq("e9"))))),
      run("inst", "dup_rules", B.copy(routes = Set("r1"),
        instances = Seq(i1.copy(routeRules = Seq("r1", "r1"))))),
      run("inst", "meta_warn", B.copy(taskMode = "full", instances =
        Seq(i1.copy(meta = Some(M("mysql-bin.000001", "")))))),
      run("inst", "incr_nometa", B.copy(taskMode = "incremental")),
      run("load", "mode_bad",
        withLoader(TC.LoaderCfg(importMode = "csv"))),
      run("load", "mode_fold", withLoader(TC.LoaderCfg(importMode = "SQL"))),
      run("load", "dup_log_bad",
        withLoader(TC.LoaderCfg(onDuplicateLogical = "merge"))),
      run("load", "dup_phys_bad",
        withLoader(TC.LoaderCfg(onDuplicatePhysical = "wrong"))),
      run("load", "checksum_bad",
        withLoader(TC.LoaderCfg(checksumPhysical = "maybe"))),
      run("load", "analyze_bad",
        withLoader(TC.LoaderCfg(analyze = "always"))),
      run("glob", "unused", B.copy(routes = Set("r1"))),
      run("glob", "tz_bad", B.copy(timezone = "Mars/Olympus")),
      run("glob", "tz_ok", B.copy(timezone = "UTC")))

    rows.toDF("family", "kase", "ok", "err", "meta_schema", "shard",
      "collation_mode", "online_ddl", "import_mode", "dup_logical", "checksum",
      "analyze_lvl", "v_mode", "v_worker", "v_max", "safe_dur", "warns")
  }

  /**
   * q300 — the SubTaskConfig admission chain
   * ([[graft.streaming.SubTaskValidate]], dm/config/subtask.go:296-465):
   * name/source-id gates with the 32-char cap, shard gates, the
   * import-into shared-storage legs, online-DDL shadow/trash rule
   * anchoring + single-submatch regex gate, the dump-dir suffix algebra
   * (S3 vs local, standalone load modes exempt), sorting-dir fill,
   * syncer fills + safe-mode duration, the foreign-key-checks session
   * gate, BW→BA fallback, chunk-filesize parse, and the composed
   * loader/validator adjusts.
   */
  val subtaskAdjust = GateQuery(
    "q300_subtask_adjust",
    Some("""SELECT * FROM (VALUES
      |  ('base','ok_min',      1,'','', './dumped_data.t','./dumped_data.t.sorting','60s','logical','^_(.+)_(?:new|gho)$',0,''),
      |  ('base','name_empty',  0,'ErrConfigTaskNameEmpty','','','','','','',NULL,''),
      |  ('base','src_empty',   0,'ErrConfigEmptySourceID','','','','','','',NULL,''),
      |  ('base','src_long',    0,'ErrConfigTooLongSourceID','','','','','','',NULL,''),
      |  ('base','shard_bad',   0,'ErrConfigShardModeNotSupport','','','','','','',NULL,''),
      |  ('base','shard_legacy',1,'','pessimistic','./dumped_data.t','./dumped_data.t.sorting','60s','logical','^_(.+)_(?:new|gho)$',0,''),
      |  ('base','strict_bad',  0,'ErrConfigStrictOptimisticShardMode','','','','','','',NULL,''),
      |  ('ii','ii_shard',      0,'ErrConfigImportIntoShardingNotSupport','','','','','','',NULL,''),
      |  ('ii','ii_nodir',      0,'ErrConfigImportIntoRequiresSharedStorage','','','','','','',NULL,''),
      |  ('ii','ii_local',      0,'ErrConfigImportIntoRequiresSharedStorage','','','','','','',NULL,''),
      |  ('ii','ii_s3_ok',      1,'','', 's3://b/pre/t.s1','./sorting.t','60s','import-into','^_(.+)_(?:new|gho)$',0,''),
      |  ('ddl','colmap',       0,'ErrConfigColumnMappingDeprecated','','','','','','',NULL,''),
      |  ('ddl','scheme_bad',   0,'ErrConfigOnlineSchemeNotSupport','','','','','','',NULL,''),
      |  ('ddl','scheme_pt',    1,'','', './dumped_data.t','./dumped_data.t.sorting','60s','logical','^_(.+)_(?:new|gho)$',0,'online-ddl-scheme-deprecated'),
      |  ('ddl','shadow_syntax',0,'ErrConfigOnlineDDLInvalidRegex','','','','','','',NULL,''),
      |  ('ddl','shadow_groups',0,'ErrConfigOnlineDDLInvalidRegex','','','','','','',NULL,''),
      |  ('ddl','shadow_anchor',1,'','', './dumped_data.t','./dumped_data.t.sorting','60s','logical','^_(.+)_new$',0,''),
      |  ('dir','s3_loader',    0,'ErrConfigLoaderS3NotSupport','','','','','','',NULL,''),
      |  ('dir','s3_suffix',    1,'','', 's3://b/d/t.s1','./sorting.t','60s','logical','^_(.+)_(?:new|gho)$',0,''),
      |  ('dir','load_alone',   1,'','', './d','./d.sorting','60s','logical','^_(.+)_(?:new|gho)$',0,''),
      |  ('dir','incr_nodir',   1,'','', './d','','60s','logical','^_(.+)_(?:new|gho)$',0,''),
      |  ('sync','safe_fill',   1,'','', './dumped_data.t','./dumped_data.t.sorting','40s','logical','^_(.+)_(?:new|gho)$',0,''),
      |  ('sync','safe_bad',    0,'ErrConfigInvalidSafeModeDuration','','','','','','',NULL,''),
      |  ('sync','safe_zero',   0,'ErrConfigConfictSafeModeDurationAndSafeMode','','','','','','',NULL,''),
      |  ('fk','fk_compact',    0,'ErrConfigUnsupportedForeignKeyChecksOption','','','','','','',NULL,''),
      |  ('fk','fk_multirow',   0,'ErrConfigUnsupportedForeignKeyChecksOption','','','','','','',NULL,''),
      |  ('fk','fk_off',        1,'','', './dumped_data.t','./dumped_data.t.sorting','60s','logical','^_(.+)_(?:new|gho)$',0,''),
      |  ('ba','bw_fallback',   1,'','', './dumped_data.t','./dumped_data.t.sorting','60s','logical','^_(.+)_(?:new|gho)$',1,''),
      |  ('load','chunk_bad',   0,'ErrConfigInvalidChunkFileSize','','','','','','',NULL,''),
      |  ('load','chunk_ram',   1,'','', './dumped_data.t','./dumped_data.t.sorting','60s','logical','^_(.+)_(?:new|gho)$',0,''),
      |  ('load','dup_phys_bad',0,'ErrConfigInvalidPhysicalDuplicateResolution','','','','','','',NULL,''),
      |  ('load','vmode_bad',   0,'ErrConfigValidationMode','','','','','','',NULL,'')
      |) v(family, kase, ok, err, shard, dir, sorting_dir, safe_dur,
      |    import_mode, shadow0, ba_from_bw, warns)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import STV.{SubTaskCfg => S}

    def run(family: String, kase: String, cfg: S)
        : (String, String, Int, String, String, String, String, String,
           String, String, Option[Int], String) =
      STV.adjustSubTask(cfg) match {
        case Left((err, _)) =>
          (family, kase, 0, err, "", "", "", "", "", "", None, "")
        case Right(STV.SubTaskAdjusted(c, warns, baFromBw)) =>
          (family, kase, 1, "", c.shardMode, c.loader.dir,
            c.loader.sortingDirPhysical, c.syncerSafeModeDuration,
            c.loader.importMode, c.shadowTableRules.head,
            Some(if (baFromBw) 1 else 0), warns.mkString(","))
      }

    val B = S(name = "t", sourceId = "s1", mode = "all",
      loader = graft.streaming.DmTaskConfig.LoaderCfg(dir = "./dumped_data"))
    def loader(l: graft.streaming.DmTaskConfig.LoaderCfg): S = B.copy(loader = l)
    val fkOn = Map("foreign_key_checks" -> "ON")

    val rows = Seq(
      run("base", "ok_min", B),
      run("base", "name_empty", B.copy(name = "")),
      run("base", "src_empty", B.copy(sourceId = "")),
      run("base", "src_long", B.copy(sourceId = "s" * 33)),
      run("base", "shard_bad", B.copy(shardMode = "strict")),
      run("base", "shard_legacy", B.copy(isSharding = true)),
      run("base", "strict_bad", B.copy(strictOptimistic = true)),
      run("ii", "ii_shard", B.copy(isSharding = true,
        loader = B.loader.copy(importMode = "import-into"))),
      run("ii", "ii_nodir", loader(B.loader.copy(
        importMode = "import-into", dir = " "))),
      run("ii", "ii_local", loader(B.loader.copy(
        importMode = "import-into", dir = "./data"))),
      run("ii", "ii_s3_ok", loader(B.loader.copy(
        importMode = "import-into", dir = "s3://b/pre"))),
      run("ddl", "colmap", B.copy(hasColumnMappings = true)),
      run("ddl", "scheme_bad", B.copy(onlineDdlScheme = "osc")),
      run("ddl", "scheme_pt", B.copy(onlineDdlScheme = "pt")),
      run("ddl", "shadow_syntax", B.copy(shadowTableRules = Seq("_("))),
      run("ddl", "shadow_groups",
        B.copy(shadowTableRules = Seq("_(.+)_(.+)_gho"))),
      run("ddl", "shadow_anchor", B.copy(shadowTableRules = Seq("_(.+)_new"))),
      run("dir", "s3_loader", loader(B.loader.copy(
        importMode = "loader", dir = "s3://b/d"))),
      run("dir", "s3_suffix", loader(B.loader.copy(dir = "s3://b/d/"))),
      run("dir", "load_alone", B.copy(mode = "load",
        loader = B.loader.copy(dir = "./d"))),
      run("dir", "incr_nodir", B.copy(mode = "incremental",
        loader = B.loader.copy(dir = "./d"))),
      run("sync", "safe_fill", B.copy(syncerCheckpointFlushInterval = 20)),
      run("sync", "safe_bad", B.copy(syncerSafeModeDuration = "abc")),
      run("sync", "safe_zero", B.copy(syncerSafeMode = true,
        syncerSafeModeDuration = "0s")),
      run("fk", "fk_compact", B.copy(toSession = fkOn, syncerCompact = true)),
      run("fk", "fk_multirow", B.copy(
        toSession = Map("FOREIGN_KEY_CHECKS" -> "'1'"),
        syncerMultipleRows = true)),
      run("fk", "fk_off", B.copy(toSession = Map("foreign_key_checks" -> "0"),
        syncerCompact = true)),
      run("ba", "bw_fallback", B.copy(bwListSet = true)),
      run("load", "chunk_bad", B.copy(chunkFilesize = "12q")),
      run("load", "chunk_ram", B.copy(chunkFilesize = "1g")),
      run("load", "dup_phys_bad",
        loader(B.loader.copy(onDuplicatePhysical = "wrong"))),
      run("load", "vmode_bad", B.copy(
        validator = graft.streaming.DmTaskConfig.ValidatorCfg(mode = "quick"))))

    rows.toDF("family", "kase", "ok", "err", "shard", "dir", "sorting_dir",
      "safe_dur", "import_mode", "shadow0", "ba_from_bw", "warns")
  }

  /**
   * q301 — the SourceConfig verify/adjust chain
   * ([[graft.streaming.SubTaskValidate]],
   * dm/config/source_config.go:220-262 + 285-322 + checker_config.go):
   * checker default fills, the deprecated auto-fix-gtid reset,
   * source-id gates, relay binlog filename/GTID verification by flavor,
   * the backoff-max-below-min gate, the flavor enum, and the relay-dir
   * default with the absolute-path warn.
   */
  val sourceVerify = GateQuery(
    "q301_source_verify",
    Some("""SELECT * FROM (VALUES
      |  ('ok_min',      1,'','relay-dir',5,1,1,20,''),
      |  ('no_src',      0,'ErrWorkerNeedSourceID','',NULL,NULL,NULL,NULL,''),
      |  ('long_src',    0,'ErrWorkerTooLongSourceID','',NULL,NULL,NULL,NULL,''),
      |  ('relay_bad',   0,'ErrWorkerRelayBinlogName','',NULL,NULL,NULL,NULL,''),
      |  ('relay_ok',    1,'','relay-dir',5,1,1,20,''),
      |  ('gtid_bad',    0,'ErrRelayBinlogGtidInvalid','',NULL,NULL,NULL,NULL,''),
      |  ('gtid_ok',     1,'','relay-dir',5,1,1,20,''),
      |  ('gtid_mariadb',1,'','relay-dir',5,1,1,20,''),
      |  ('backoff_bad', 0,'ErrConfigCheckerMaxTooSmall','',NULL,NULL,NULL,NULL,''),
      |  ('flavor_bad',  0,'ErrNotSupportedFlavor','',NULL,NULL,NULL,NULL,''),
      |  ('autofix',     1,'','relay-dir',5,1,1,20,'auto-fix-gtid-deprecated'),
      |  ('abs_relay',   1,'','/var/relay',5,1,1,20,'absolute-relay-dir')
      |) v(kase, ok, err, relay_dir, check_interval, backoff_min, jitter,
      |    factor_x10, warns)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import STV.{SourceCfgModel => SC}

    def run(kase: String, cfg: SC)
        : (String, Int, String, String, Option[Int], Option[Int],
           Option[Int], Option[Int], String) =
      STV.adjustSourceOffline(cfg) match {
        case Left((err, _)) => (kase, 0, err, "", None, None, None, None, "")
        case Right(STV.SourceAdjusted(c, warns)) =>
          STV.verifySource(c) match {
            case Left((err, _)) =>
              (kase, 0, err, "", None, None, None, None, "")
            case Right(()) =>
              (kase, 1, "", c.relayDir, Some(c.checker.checkIntervalSec.toInt),
                Some(c.checker.backoffMinSec.toInt),
                Some(if (c.checker.backoffJitter) 1 else 0),
                Some((c.checker.backoffFactor * 10).round.toInt),
                warns.mkString(","))
          }
      }

    val B = SC(sourceId = "s1", flavor = "mysql")
    val rows = Seq(
      run("ok_min", B),
      run("no_src", B.copy(sourceId = "")),
      run("long_src", B.copy(sourceId = "s" * 33)),
      run("relay_bad", B.copy(relayBinlogName = "binlog")),
      run("relay_ok", B.copy(relayBinlogName = "mysql-bin.000001")),
      run("gtid_bad", B.copy(relayBinlogGtid = "xyz")),
      run("gtid_ok", B.copy(relayBinlogGtid =
        "03fc0263-28c7-11e7-a653-6c0b84d59f30:1-10")),
      run("gtid_mariadb", B.copy(flavor = "mariadb",
        relayBinlogGtid = "0-1-100")),
      run("backoff_bad",
        B.copy(checker = STV.CheckerCfg(backoffMaxSec = 0))),
      run("flavor_bad", B.copy(flavor = "percona")),
      run("autofix", B.copy(autoFixGtid = true)),
      run("abs_relay", B.copy(relayDir = "/var/relay")))

    rows.toDF("kase", "ok", "err", "relay_dir", "check_interval",
      "backoff_min", "jitter", "factor_x10", "warns")
  }

  /**
   * q302 — the OpenAPI task converters
   * ([[graft.streaming.TaskConverters]],
   * dm/config/task_converters.go:118-763): one two-source scenario runs
   * the FULL composition openapi.Task → SubTaskConfigs (migrate-rule
   * fan-out into routes/filters/BA-lists, full/incr conf overlays on
   * the defaults, per-subtask admission) → TaskConfig (getGenerateName
   * dedup naming — equal payloads share `<prefix>-%02d` names, the
   * loader dir trimmed back to the user's input) → TaskConfig.adjust
   * (proving the generated references form a valid task) → back to an
   * openapi.Task (sources + metas, `<source>-filter-rule-<idx>` names,
   * migrate rules from routes then BA lists deduped first-wins on
   * (source, schema, table)). Plus the converter error legs.
   */
  val taskConverters = GateQuery(
    "q302_task_converters",
    Some("""SELECT * FROM (VALUES
      |  ('global','balist-01','dbs=db1;tables=db2.t1'),
      |  ('global','balist-02','dbs=db1;tables='),
      |  ('global','dump-01','threads=8;args=--consistency none'),
      |  ('global','filter-01','db2,t1;ev=delete;sql=^DROP'),
      |  ('global','load-01','dir=./exported_data;mode=logical;pool=32;dup=replace;sorting=./exported_data.mig.sorting'),
      |  ('global','route-01','db1,,dst,'),
      |  ('global','route-02','db2,t1,dst,t1'),
      |  ('global','sync-01','workers=32;batch=200'),
      |  ('global','validator-01','mode=none;workers=4;max=500m'),
      |  ('inst','s1','routes=route-01 route-02;filters=filter-01;ba=balist-01;dump=dump-01;load=load-01;sync=sync-01;val=validator-01'),
      |  ('inst','s2','routes=route-01;filters=;ba=balist-02;dump=dump-01;load=load-01;sync=sync-01;val=validator-01'),
      |  ('adjust','ok','meta=dm_meta2;shard=optimistic;warns=meta-unused-0'),
      |  ('rt','task','name=mig;mode=all;shard=optimistic;strict=1;meta=dm_meta2;ddl=1;ondup=replace'),
      |  ('rt','src.s1','mysql-bin.000001@4;gtid='),
      |  ('rt','src.s2','nometa'),
      |  ('rt','full','export=8;import=32;dir=./exported_data;cons=none;mode=logical;pd='),
      |  ('rt','incr','threads=32;batch=200'),
      |  ('rt','filterrule.s1-filter-rule-0','ev=delete;sql=^DROP'),
      |  ('rt','mig.0','s1,db1,,dst,;f=s1-filter-rule-0'),
      |  ('rt','mig.1','s1,db2,t1,dst,t1;f=s1-filter-rule-0'),
      |  ('rt','mig.2','s2,db1,,dst,;f='),
      |  ('err','missing_source','ErrConfigSourceIDNotFound'),
      |  ('err','filter_nf','ErrOpenAPICommonError'),
      |  ('err','ii_multi','ErrConfigImportIntoShardingNotSupport'),
      |  ('err','sec_empty','ErrOpenAPICommonError'),
      |  ('err','ii_storage','ErrConfigImportIntoRequiresSharedStorage')
      |) v(section, key, val)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.{TaskConverters => CV}

    val sources = Map(
      "s1" -> STV.SourceCfgModel(sourceId = "s1", caseSensitive = true),
      "s2" -> STV.SourceCfgModel(sourceId = "s2"))
    val task = CV.OpenApiTask(
      name = "mig", taskMode = "all",
      shardMode = Some("optimistic"),
      strictOptimisticShardMode = Some(true),
      metaSchema = "dm_meta2", enhanceOnlineSchemaChange = true,
      sourceConf = Seq(
        CV.SourceConf("s1", binlogName = Some("mysql-bin.000001"),
          binlogPos = Some(4L), binlogGtid = Some("")),
        CV.SourceConf("s2")),
      fullConf = Some(CV.FullMigrateConf(
        exportThreads = Some(8), importThreads = Some(32),
        dataDir = Some("./exported_data"), consistency = Some("none"),
        importMode = Some("logical"))),
      incrConf = Some(CV.IncrMigrateConf(
        replThreads = Some(32), replBatch = Some(200))),
      migrateRules = Seq(
        CV.MigrateRule("s1", "db1", "",
          Some(CV.MigrateRuleTarget(Some("dst"), None))),
        CV.MigrateRule("s1", "db2", "t1",
          Some(CV.MigrateRuleTarget(Some("dst"), Some("t1"))),
          binlogFilterRules = Seq("rule-1")),
        CV.MigrateRule("s1", "db1", ""), // doDBs dup — dedup keeps one
        CV.MigrateRule("s2", "db1", "",
          Some(CV.MigrateRuleTarget(Some("dst"), None)))),
      binlogFilterRules = Map("rule-1" ->
        CV.BinlogFilterRule(Seq("delete"), Seq("^DROP"))))

    val rows = Vector.newBuilder[(String, String, String)]

    CV.openApiTaskToTaskConfig(task, sources) match {
      case Left((err, msg)) =>
        rows += (("adjust", "failed", s"$err: $msg"))
      case Right((ct, adjusted)) =>
        def renderRoute(r: CV.RouteRule) = Seq(r.schemaPattern,
          r.tablePattern, r.targetSchema, r.targetTable).mkString(",")
        for ((n, b) <- ct.baLists.toSeq.sortBy(_._1))
          rows += (("global", n, b match {
            case Some(ba) => s"dbs=${ba.doDBs.mkString(" ")};tables=" +
              ba.doTables.map { case (s, t) => s"$s.$t" }.mkString(" ")
            case None => "nil"
          }))
        for ((n, m) <- ct.mydumpers.toSeq.sortBy(_._1))
          rows += (("global", n, s"threads=${m.threads};args=${m.extraArgs}"))
        for ((n, f) <- ct.filters.toSeq.sortBy(_._1))
          rows += (("global", n, s"${f.schemaPattern},${f.tablePattern};" +
            s"ev=${f.events.mkString(" ")};sql=${f.sqlPatterns.mkString(" ")}"))
        for ((n, l) <- ct.loaders.toSeq.sortBy(_._1))
          rows += (("global", n, s"dir=${l.dir};mode=${l.importMode};" +
            s"pool=${l.poolSize};dup=${l.onDuplicateLogical};" +
            s"sorting=${l.sortingDirPhysical}"))
        for ((n, r) <- ct.routes.toSeq.sortBy(_._1))
          rows += (("global", n, renderRoute(r)))
        for ((n, s) <- ct.syncers.toSeq.sortBy(_._1))
          rows += (("global", n, s"workers=${s.workerCount};batch=${s.batch}"))
        for ((n, v) <- ct.validators.toSeq.sortBy(_._1))
          rows += (("global", n, s"mode=${v.mode};workers=${v.workerCount};" +
            s"max=${v.maxPendingRowSize}"))
        for (i <- ct.instances)
          rows += (("inst", i.sourceId,
            s"routes=${i.routeRules.mkString(" ")};" +
              s"filters=${i.filterRules.mkString(" ")};ba=${i.baListName};" +
              s"dump=${i.mydumperConfigName};load=${i.loaderConfigName};" +
              s"sync=${i.syncerConfigName};val=${i.validatorConfigName}"))
        rows += (("adjust", "ok",
          s"meta=${adjusted.config.metaSchema};" +
            s"shard=${adjusted.config.shardMode};" +
            s"warns=${adjusted.warnings.mkString(",")}"))

        // round trip: subtasks → openapi
        val subTasks = CV.openApiTaskToSubTasks(task, sources)
          .getOrElse(Seq.empty)
        val back = CV.subTasksToOpenApiTask(subTasks)
        rows += (("rt", "task",
          s"name=${back.name};mode=${back.taskMode};" +
            s"shard=${back.shardMode.getOrElse("")};" +
            s"strict=${if (back.strictOptimisticShardMode.contains(true)) 1 else 0};" +
            s"meta=${back.metaSchema};" +
            s"ddl=${if (back.enhanceOnlineSchemaChange) 1 else 0};" +
            s"ondup=${back.onDuplicate}"))
        for (src <- back.sourceConf)
          rows += (("rt", s"src.${src.sourceName}",
            if (src.binlogName.isEmpty && src.binlogPos.isEmpty) "nometa"
            else s"${src.binlogName.getOrElse("")}@${src.binlogPos.getOrElse(0L)};" +
              s"gtid=${src.binlogGtid.getOrElse("")}"))
        for (full <- back.fullConf)
          rows += (("rt", "full",
            s"export=${full.exportThreads.getOrElse(0)};" +
              s"import=${full.importThreads.getOrElse(0)};" +
              s"dir=${full.dataDir.getOrElse("")};" +
              s"cons=${full.consistency.getOrElse("")};" +
              s"mode=${full.importMode.getOrElse("")};" +
              s"pd=${full.pdAddr.getOrElse("")}"))
        for (incr <- back.incrConf)
          rows += (("rt", "incr",
            s"threads=${incr.replThreads.getOrElse(0)};" +
              s"batch=${incr.replBatch.getOrElse(0)}"))
        for ((n, f) <- back.binlogFilterRules.toSeq.sortBy(_._1))
          rows += (("rt", s"filterrule.$n",
            s"ev=${f.ignoreEvents.mkString(" ")};" +
              s"sql=${f.ignoreSqls.mkString(" ")}"))
        for ((r, idx) <- back.migrateRules.zipWithIndex)
          rows += (("rt", s"mig.$idx",
            Seq(r.sourceName, r.schema, r.table,
              r.target.flatMap(_.schema).getOrElse(""),
              r.target.flatMap(_.table).getOrElse("")).mkString(",") +
              s";f=${r.binlogFilterRules.mkString(" ")}"))
    }

    // converter error legs
    def errOf(t: CV.OpenApiTask, srcs: Map[String, STV.SourceCfgModel] = sources)
        : String =
      CV.openApiTaskToSubTasks(t, srcs).left.map(_._1)
        .swap.getOrElse("no-error")
    val minimal = CV.OpenApiTask(name = "mig", taskMode = "all",
      sourceConf = Seq(CV.SourceConf("s1")))
    rows += (("err", "missing_source",
      errOf(minimal.copy(sourceConf = Seq(CV.SourceConf("s9"))))))
    rows += (("err", "filter_nf", errOf(minimal.copy(migrateRules =
      Seq(CV.MigrateRule("s1", "db1", "", binlogFilterRules = Seq("nope")))))))
    rows += (("err", "ii_multi", errOf(minimal.copy(
      sourceConf = Seq(CV.SourceConf("s1"), CV.SourceConf("s2")),
      fullConf = Some(CV.FullMigrateConf(importMode = Some("import-into")))))))
    rows += (("err", "sec_empty", errOf(minimal.copy(fullConf =
      Some(CV.FullMigrateConf(security =
        Some(CV.OpenApiSecurity("", "cert", "key"))))))))
    rows += (("err", "ii_storage", errOf(minimal.copy(fullConf =
      Some(CV.FullMigrateConf(importMode = Some("import-into"),
        dataDir = Some("./local")))))))

    rows.result().toDF("section", "key", "val")
  }

  /**
   * q304 — the time/CLI-args utilities and OpenAPI SOURCE converters:
   * utils.ParseTimeZone (dm/pkg/utils/time.go:37-74 — SYSTEM/Local
   * rejected, named zones, explicit offsets bounded to MySQL's
   * [-12:59, +14:00] and normalized), utils.ParseStartTime (:32,77-99 —
   * the anchored six-form pattern, offset-absolute vs zone-local),
   * TaskCliArgs.Verify (task_cli_args.go:47-68), and
   * SourceCfgToOpenAPISource / OpenAPISourceToSourceCfg
   * (source_converter.go:23-110 — password ALWAYS obfuscated, security
   * exposes only cert-allowed-cn, NewSourceConfig defaults
   * nil-coalesced on the way back).
   */
  val timeCliSource = GateQuery(
    "q304_time_cli_source",
    Some("""SELECT * FROM (VALUES
      |  ('tz','utc',        1,'UTC'),
      |  ('tz','named',      1,'Asia/Shanghai'),
      |  ('tz','system',     0,''),
      |  ('tz','local_word', 0,''),
      |  ('tz','plus14',     1,'+14:00'),
      |  ('tz','plus1401',   0,''),
      |  ('tz','minus1259',  1,'-12:59'),
      |  ('tz','minus1300',  0,''),
      |  ('tz','pad',        1,'+05:30'),
      |  ('tz','bogus',      0,''),
      |  ('st','space',      1,'1640995200'),
      |  ('st','t_form',     1,'1640995200'),
      |  ('st','offset',     1,'1640966400'),
      |  ('st','no_colon',   1,'1640966400'),
      |  ('st','zulu',       1,'1640995200'),
      |  ('st','no_seconds', 0,''),
      |  ('st','bad_month',  0,''),
      |  ('st','slash',      0,''),
      |  ('cli','ok',        1,''),
      |  ('cli','empty_ok',  1,''),
      |  ('cli','bad_start', 0,'start-time'),
      |  ('cli','bad_safe',  0,'safe-mode-duration'),
      |  ('cli','bad_wait',  0,'wait-time-on-stop'),
      |  ('src','password',  1,'******'),
      |  ('src','flavor_none',1,''),
      |  ('src','roundtrip', 1,'s1|mysql|relay-dir|3600|0|15|relay=1|gtid=1'),
      |  ('src','security_cn',1,'cn1 cn2'),
      |  ('src','defaults',  1,'3600|0|15|check=5|min=1')
      |) v(family, kase, ok, out)""".stripMargin)) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.{TaskConverters => CV}

    def tz(kase: String, s: String) = TC.parseTimeZone(s) match {
      case Left(_) => ("tz", kase, 0, "")
      case Right(name) => ("tz", kase, 1, name)
    }
    def st(kase: String, s: String) = TC.parseStartTime(s) match {
      case Left(_) => ("st", kase, 0, "")
      case Right(epoch) => ("st", kase, 1, epoch.toString)
    }
    def cli(kase: String, start: String, safe: String, wait: String) =
      TC.verifyTaskCliArgs(start, safe, wait) match {
        case Left(field) => ("cli", kase, 0, field)
        case Right(()) => ("cli", kase, 1, "")
      }

    val src = CV.SourceWithConn(
      cfg = graft.streaming.SubTaskValidate.SourceCfgModel(
        sourceId = "s1", flavor = "mysql", enableGtid = true,
        relayDir = "relay-dir"),
      host = "h1", port = 3306, user = "root", password = "secret",
      enableRelay = true,
      securityCertAllowedCn = Seq("cn1", "cn2"), hasSecurity = true)
    val api = CV.sourceCfgToOpenApi(src)
    val back = CV.openApiToSourceCfg(api)
    val noFlavor = CV.sourceCfgToOpenApi(
      src.copy(cfg = src.cfg.copy(flavor = "")))
    val defaults = CV.openApiToSourceCfg(CV.OpenApiSource(
      sourceName = "s2", enable = true, enableGtid = false,
      host = "h2", port = 3307, user = "u", password = None))

    val rows = Seq(
      tz("utc", "UTC"), tz("named", "Asia/Shanghai"), tz("system", "SYSTEM"),
      tz("local_word", "Local"), tz("plus14", "+14:00"),
      tz("plus1401", "+14:01"), tz("minus1259", "-12:59"),
      tz("minus1300", "-13:00"), tz("pad", "+5:30"), tz("bogus", "Mars/Olympus"),
      st("space", "2022-01-01 00:00:00"), st("t_form", "2022-01-01T00:00:00"),
      st("offset", "2022-01-01 00:00:00+08:00"),
      st("no_colon", "2022-01-01T00:00:00+0800"),
      st("zulu", "2022-01-01T00:00:00Z"),
      st("no_seconds", "2022-01-01 00:00"),
      st("bad_month", "2022-13-01 00:00:00"),
      st("slash", "2022/01/01 00:00:00"),
      cli("ok", "2022-01-01 00:00:00", "30s", "10s"),
      cli("empty_ok", "", "", ""),
      cli("bad_start", "yesterday", "30s", ""),
      cli("bad_safe", "", "30x", ""),
      cli("bad_wait", "", "", "later"),
      ("src", "password", 1, api.password.getOrElse("")),
      ("src", "flavor_none", 1, noFlavor.flavor.getOrElse("")),
      ("src", "roundtrip", 1, Seq(back.cfg.sourceId, back.cfg.flavor,
        back.cfg.relayDir, back.purgeIntervalSec, back.purgeExpiresHr,
        back.purgeRemainGb, s"relay=${if (back.enableRelay) 1 else 0}",
        s"gtid=${if (back.cfg.enableGtid) 1 else 0}").mkString("|")),
      ("src", "security_cn",
        if (back.hasSecurity) 1 else 0,
        back.securityCertAllowedCn.mkString(" ")),
      ("src", "defaults", 1, Seq(defaults.purgeIntervalSec,
        defaults.purgeExpiresHr, defaults.purgeRemainGb,
        s"check=${defaults.cfg.checker.checkIntervalSec}",
        s"min=${defaults.cfg.checker.backoffMinSec}").mkString("|")))

    rows.toDF("family", "kase", "ok", "out")
  }

  def all: Seq[GateQuery] =
    Seq(taskValidate, subtaskAdjust, sourceVerify, taskConverters,
      timeCliSource)
}
