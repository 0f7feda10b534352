package graft.diff

/**
 * The DM precheck DISPATCH matrix (dm/checker/checker.go:262-558
 * Checker.Init + dm/config/helper.go:17-44 + checking_item.go:131-148):
 * which checkers run, in which order, for a given task — the decision a
 * real DM user exercises on every `check-task`/`start-task`. The checker
 * IMPLEMENTATIONS are gated elsewhere (q54 server/table checks, q306
 * structure pairs, q308 privileges, q309 conn/space/binlog-db); this
 * kernel replays the SELECTION:
 *
 *  - FilterCheckingItems: all items minus ignored; ignoring "all"
 *    empties the list (checking_item.go:131-148).
 *  - conn_number: dumper per instance when the task mode dumps, one
 *    loader when it loads (stCfgs[0]'s mode — shared across subtasks).
 *  - target_privilege: one target checker.
 *  - per instance: version; dump_privilege when the mode dumps; OTHERWISE
 *    meta_position when relay is off, a meta exists and it carries a
 *    binlog name (or a GTID set under GTID mode); when the mode syncs:
 *    server_id, binlog_enable, binlog_format, binlog_row_image,
 *    replication_privilege, online_ddl (only once the online-DDL plugin
 *    exists — it is created lazily by the FIRST instance with OnlineDDL
 *    set, so earlier instances skip it, checker.go:311-318), binlog_db.
 *  - table_schema / primary_key: one checker each over all upstreams.
 *  - schema_of_shard_tables: only for sharded FRESH tasks whose mode
 *    dumps — per multi-shard target table, pessimistic names
 *    `sharding table <t> consistency checking` (carrying the
 *    auto_increment_ID sub-flag) vs optimistic; Go iterates the target
 *    map randomly — name-sorted here (the documented refinement).
 *  - lightning prechecks: only when the mode loads AND import-mode is
 *    physical AND any lightning item is enabled: free_space,
 *    empty_region, region_distribution, downstream_version,
 *    downstream_mutex_features, downstream_table_empty, in code order.
 *
 * Mode predicates (helper.go): dump ∈ {all, full, dump}; load ∈ {all,
 * full, load, load&sync}; sync ∈ {all, incremental, load&sync}.
 */
object CheckerDispatch {

  val AllChecking = "all"

  /** AllCheckingItems' keys (checking_item.go:57-77) — primary_key is
    * additional-only and never enters via the filter. */
  val DefaultItems: Set[String] = Set(
    "dump_privilege", "replication_privilege", "version", "server_id",
    "binlog_enable", "binlog_format", "binlog_row_image", "table_schema",
    "schema_of_shard_tables", "auto_increment_ID", "online_ddl",
    "binlog_db", "meta_position", "conn_number", "target_privilege",
    "empty_region", "region_distribution", "downstream_version",
    "free_space", "downstream_mutex_features", "downstream_table_empty")

  val LightningPrechecks: Seq[String] = Seq("empty_region",
    "region_distribution", "downstream_version", "free_space",
    "downstream_mutex_features", "downstream_table_empty")

  /** FilterCheckingItems (checking_item.go:131-148). */
  def filterCheckingItems(ignored: Seq[String]): Set[String] =
    if (ignored.contains(AllChecking)) Set.empty
    else DefaultItems -- ignored

  def hasDump(mode: String): Boolean =
    mode == "all" || mode == "full" || mode == "dump"
  def hasLoad(mode: String): Boolean =
    mode == "all" || mode == "full" || mode == "load" ||
      mode == "load&sync"
  def hasSync(mode: String): Boolean =
    mode == "all" || mode == "incremental" || mode == "load&sync"

  final case class InstanceSpec(
      sourceId: String, mode: String, useRelay: Boolean = false,
      metaBinlogName: String = "", metaBinlogGtid: String = "",
      hasMeta: Boolean = false, enableGtid: Boolean = false,
      onlineDDL: Boolean = false)

  final case class DispatchSpec(
      checkingItems: Set[String], instances: Seq[InstanceSpec],
      importMode: String = "logical", shardMode: String = "",
      isFresh: Boolean = true,
      /** (targetTable, shardNum), from the fetched table routing. */
      shardTargets: Seq[(String, Int)] = Nil)

  /** The ordered check list as (checkerName, scope) pairs — scope is
    * the source id for per-instance checkers, the target table for
    * shard checkers, "" for singletons. Names are the reference
    * checkers' own Name() strings. */
  def checkList(spec: DispatchSpec): Seq[(String, String)] = {
    val items = spec.checkingItems
    val out = Seq.newBuilder[(String, String)]
    val mode0 = spec.instances.headOption.map(_.mode).getOrElse("")

    if (items("conn_number") && spec.instances.nonEmpty) {
      if (hasDump(mode0))
        spec.instances.foreach(i =>
          out += ("dumper_conn_number_checker" -> i.sourceId))
      if (hasLoad(mode0))
        out += ("loader_conn_number_checker" -> "")
    }
    if (items("target_privilege"))
      out += ("target db privilege checker" -> "")

    // the online-DDL plugin is created lazily by the first OnlineDDL
    // instance; the online_ddl checker only fires from there on
    var onlineDdlPlugin = false
    spec.instances.foreach { inst =>
      if (inst.onlineDDL && !onlineDdlPlugin) onlineDdlPlugin = true
      if (items("version"))
        out += ("mysql_version" -> inst.sourceId)
      if (hasDump(inst.mode)) {
        if (items("dump_privilege"))
          out += ("source db dump privilege checker" -> inst.sourceId)
      } else if (!inst.useRelay && inst.hasMeta) {
        val checkMetaPos = inst.metaBinlogName.nonEmpty ||
          (inst.enableGtid && inst.metaBinlogGtid.nonEmpty)
        if (checkMetaPos && items("meta_position"))
          out += ("meta position check" -> inst.sourceId)
      }
      if (hasSync(inst.mode)) {
        if (items("server_id"))
          out += ("mysql_server_id" -> inst.sourceId)
        if (items("binlog_enable"))
          out += ("mysql_binlog_enable" -> inst.sourceId)
        if (items("binlog_format"))
          out += ("mysql_binlog_format" -> inst.sourceId)
        if (items("binlog_row_image"))
          out += ("mysql_binlog_row_image" -> inst.sourceId)
        if (items("replication_privilege"))
          out += ("source db replication privilege checker" -> inst.sourceId)
        if (onlineDdlPlugin && items("online_ddl"))
          out += ("online ddl checker" -> inst.sourceId)
        if (items("binlog_db"))
          out += ("binlog_do_db/binlog_ignore_db check" -> inst.sourceId)
      }
    }

    if (items("table_schema"))
      out += ("table structure compatibility check" -> "")
    if (items("primary_key"))
      out += ("primary key existence check" -> "")

    if (items("schema_of_shard_tables") && spec.shardMode.nonEmpty &&
        hasDump(mode0) && spec.isFresh) {
      spec.shardTargets.sortBy(_._1).foreach { case (target, n) =>
        if (n > 1) {
          val name =
            if (spec.shardMode == "pessimistic")
              s"sharding table $target consistency checking"
            else s"optimistic sharding table $target consistency checking"
          out += (name -> target)
        }
      }
    }

    if (hasLoad(mode0) && spec.importMode == "physical" &&
        LightningPrechecks.exists(items)) {
      if (items("free_space"))
        out += ("lightning_free_space" -> "")
      if (items("empty_region"))
        out += ("lightning_empty_region" -> "")
      if (items("region_distribution"))
        out += ("lightning_region_distribution" -> "")
      if (items("downstream_version"))
        out += ("lightning_cluster_version" -> "")
      if (items("downstream_mutex_features"))
        out += ("lightning_downstream_mutex_features" -> "")
      if (items("downstream_table_empty"))
        out += ("lightning_downstream_empty_table" -> "")
    }
    out.result()
  }
}
