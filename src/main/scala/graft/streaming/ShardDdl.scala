package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Pessimistic shard-DDL coordination (SURVEY.md §2.12 G2; reference
 * dm/syncer/sharding_group.go:96-370 TrySync, shardddl/pessimist.go).
 *
 * Shard-merge: N upstream shard tables route into one target table. When a
 * DDL arrives from one shard, that shard's DMLs past the DDL ts must HOLD
 * until every shard has announced the same DDL; then the DDL applies once
 * and the group resumes. tiflow coordinates via etcd locks; Spark-first the
 * coordinator is a `mapGroupsWithState` keyed by (target, ddl) and the DML
 * gate is a deterministic filter against the barrier table.
 */
object ShardDdl {

  final case class DdlEvent(target_table: String, shard_id: Int,
                            ddl: String, commit_ts: Long)

  final case class BarrierState(shardsSeen: Set[Int], firstTs: Long)

  final case class ResolvedDdl(target_table: String, ddl: String,
                               barrier_ts: Long, n_shards: Int)

  /**
   * Streaming coordinator: one state entry per in-flight (target, ddl);
   * emits the resolved barrier exactly when the last shard reports
   * (the "owner executes DDL once" moment) and clears the state.
   */
  def coordinate(spark: SparkSession, ddls: Dataset[DdlEvent],
                 totalShards: Int): Dataset[ResolvedDdl] = {
    import spark.implicits._
    ddls.groupByKey(e => (e.target_table, e.ddl))
      .mapGroupsWithState[BarrierState, Option[ResolvedDdl]](
        GroupStateTimeout.NoTimeout) {
        case ((target, ddl), events, state: GroupState[BarrierState]) =>
          val prev = state.getOption.getOrElse(BarrierState(Set.empty, Long.MaxValue))
          val evs = events.toSeq
          val next = BarrierState(
            prev.shardsSeen ++ evs.map(_.shard_id),
            math.min(prev.firstTs, evs.map(_.commit_ts).min))
          if (next.shardsSeen.size >= totalShards) {
            state.remove()
            Some(ResolvedDdl(target, ddl, next.firstTs, next.shardsSeen.size))
          } else {
            state.update(next)
            None
          }
      }
      .flatMap(_.toSeq)
  }

  // ---- optimistic mode (SURVEY.md §2.12 G3; reference dm/syncer/optimist.go,
  // dm/pkg/shardddl/optimism) -------------------------------------------

  /** A shard announces its CURRENT full schema (name→type pairs) after
    * applying a DDL locally. */
  final case class ShardSchema(target_table: String, shard_id: Int,
                               fields: Seq[(String, String)], commit_ts: Long)

  /** Joined-group outcome after each announcement: the schema lattice join
    * of every shard's current schema, or a conflict. */
  final case class OptimisticUpdate(target_table: String, commit_ts: Long,
                                    joined: Seq[(String, String)],
                                    conflict: Option[String])

  private def toStruct(fields: Seq[(String, String)]) =
    org.apache.spark.sql.types.StructType(fields.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.DataType.fromDDL(t))
    })

  /**
   * Optimistic coordinator: no barrier — each announcement immediately
   * recomputes the group's joined schema from every shard's latest. DMLs
   * keep flowing under each shard's own schema; a type conflict surfaces
   * as an error outcome (the reference pauses the conflicting shard).
   */
  def coordinateOptimistic(spark: SparkSession, announcements: Dataset[ShardSchema])
      : Dataset[OptimisticUpdate] = {
    import spark.implicits._
    import graft.core.SchemaRegistry
    announcements.groupByKey(_.target_table)
      .flatMapGroupsWithState[Map[Int, Seq[(String, String)]], OptimisticUpdate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (target, evs, state) =>
          var shards = state.getOption.getOrElse(Map.empty)
          val out = evs.toSeq.sortBy(_.commit_ts).map { e =>
            shards = shards + (e.shard_id -> e.fields)
            SchemaRegistry.joinSchemas(shards.values.toSeq.map(toStruct)) match {
              case Right(joined) =>
                OptimisticUpdate(target, e.commit_ts,
                  joined.fields.toSeq.map(f => (f.name, f.dataType.sql)), None)
              case Left(c) =>
                OptimisticUpdate(target, e.commit_ts, Seq.empty,
                  Some(s"column ${c.field}: ${c.types.map(_.sql).mkString(" vs ")}"))
            }
          }
          state.update(shards)
          out.iterator
      }
  }

  /**
   * Batch barrier computation (same semantics, one aggregation): a barrier
   * is resolved iff all shards announced; barrier_ts = first announcement
   * ts (DMLs beyond it were held on the announcing shards).
   */
  def barriers(ddls: DataFrame, totalShards: Int): DataFrame =
    ddls.groupBy("target_table", "ddl")
      .agg(
        countDistinct(col("shard_id")).as("n_shards"),
        min(col("commit_ts")).as("barrier_ts"))
      .withColumn("resolved", col("n_shards") >= totalShards)

  /**
   * DML gate: rows pass while below the earliest UNRESOLVED barrier of
   * their target table; rows at/after it hold for the next microbatch
   * (reference: sharding_group gates each shard's stream the same way).
   * Returns the input with a boolean `pass`.
   */
  def dmlGate(dml: DataFrame, barrierTable: DataFrame): DataFrame = {
    val unresolved = barrierTable.filter(!col("resolved"))
      .groupBy("target_table")
      .agg(min(col("barrier_ts")).as("gate_ts"))
    dml.join(broadcast(unresolved), Seq("target_table"), "left")
      .withColumn("pass", col("gate_ts").isNull || col("commit_ts") < col("gate_ts"))
      .drop("gate_ts")
  }

  // ---- lock inspection (dmctl `shard-ddl-lock` list / unlock; reference
  // dm/master/server.go:901-980 ShowDDLLocks/UnlockDDLLock,
  // dm/master/shardddl/pessimist.go:233-385, dm/pkg/utils/common.go:83-108)

  /** dm/pkg/utils/common.go:84-86 — `task-\`schema\`.\`table\``. */
  def genDDLLockID(task: String, schema: String, table: String): String =
    s"$task-`$schema`.`$table`"

  private val lockIdPattern = "(.*)-`(.*)`\\.`(.*)`".r

  /** common.go:90-98 — empty string when the id doesn't match. */
  def extractTaskFromLockID(id: String): String = id match {
    case lockIdPattern(t, _, _) => t
    case _ => ""
  }

  /** common.go:100-108. */
  def extractDbTableFromLockID(id: String): (String, String) = id match {
    case lockIdPattern(_, db, tbl) => (db, tbl)
    case _ => ("", "")
  }

  /** A live pessimistic lock: `ready` holds EVERY source of the group with
    * its synced flag (pessimism Lock.Ready()). */
  final case class PessLock(id: String, task: String, owner: String,
      ddls: Seq[String], ready: Map[String, Boolean])

  /** The dmctl-visible row (pb.DDLLock): synced/unsynced sorted. */
  final case class LockView(id: String, task: String, mode: String,
      owner: String, ddls: Seq[String], synced: Seq[String],
      unsynced: Seq[String])

  /**
   * Build the live pessimistic lock table from announcements: one lock per
   * (table, ddl) while at least one source has NOT announced; the owner is
   * the first announcer (the lock is created by the first info —
   * pessimism/lock.go NewLock caller order); a fully-announced lock is
   * resolved and leaves the table (the owner executes, ops are cleared).
   */
  def pessimisticLocks(task: String, schema: String,
      announcements: Seq[(String, String, String, Long)],
      allSources: Seq[String]): Seq[PessLock] =
    announcements.groupBy(a => (a._1, a._3)).toSeq.sortBy(_._1).flatMap {
      case ((table, ddl), as) =>
        val seen = as.map(_._2).toSet
        if (seen.size >= allSources.size) None
        else {
          val owner = as.minBy(a => (a._4, a._2))._2
          Some(PessLock(genDDLLockID(task, schema, table), task, owner,
            Seq(ddl), allSources.map(s => s -> seen.contains(s)).toMap))
        }
    }

  /**
   * ShowLocks' filter semantics (pessimist.go:233-271): a task filter is
   * exact; a sources filter shows a lock when ANY requested source appears
   * in its ready map (synced or not). Synced/unsynced lists sort.
   */
  def showLocks(locks: Seq[PessLock], task: String = "",
      sources: Seq[String] = Seq.empty): Seq[LockView] =
    locks.filter { l =>
      (task.isEmpty || task == l.task) &&
        (sources.isEmpty || sources.exists(l.ready.contains))
    }.map { l =>
      LockView(l.id, l.task, "pessimistic", l.owner, l.ddls,
        l.ready.collect { case (s, true) => s }.toSeq.sorted,
        l.ready.collect { case (s, false) => s }.toSeq.sorted)
    }

  /** One upstream table inside an optimistic lock: its synced flag and,
    * when its pending operation is conflict-DETECTED, the DDLs it carries
    * (optimism's per-(source, schema, table) Info/Operation pair). */
  final case class OptTableState(source: String, schema: String,
      table: String, synced: Boolean,
      conflictDdls: Option[Seq[String]] = None)

  /**
   * Optimist.ShowLocks (dm/master/shardddl/optimist.go:125-220). Per
   * (task, downstream-table) lock: synced/unsynced entries are the
   * UPSTREAM-table triples rendered `source-\`schema\`.\`table\``, sorted;
   * each conflict-DETECTED table contributes its OWN pb.DDLLock row —
   * owner = that triple's lock-id string, DDLs = its pending list — and a
   * `sources` filter restricts which conflicts contribute owner rows but
   * NOT the synced/unsynced lists (appendOwnerDDLs loops only the
   * requested sources, optimist.go:174-186); no conflicts → one row with
   * an empty owner. Owner rows sort by owner here — the Go iterates a map
   * (nondeterministic order); a deterministic view needs SOME order and
   * the sorted one matches the synced/unsynced convention.
   */
  def showOptimisticLocks(
      locks: Seq[(String, String, Seq[OptTableState])],
      task: String = "", sources: Seq[String] = Seq.empty): Seq[LockView] =
    locks.filter { case (_, t, tables) =>
      (task.isEmpty || task == t) &&
        (sources.isEmpty || sources.exists(s => tables.exists(_.source == s)))
    }.flatMap { case (id, t, tables) =>
      def ent(x: OptTableState) = s"${x.source}-`${x.schema}`.`${x.table}`"
      val synced = tables.filter(_.synced).map(ent).sorted
      val unsynced = tables.filterNot(_.synced).map(ent).sorted
      val visible =
        if (sources.isEmpty) tables
        else tables.filter(x => sources.contains(x.source))
      val owners = visible.collect {
        case x if x.conflictDdls.isDefined =>
          (genDDLLockID(x.source, x.schema, x.table), x.conflictDdls.get)
      }.sortBy(_._1)
      val rows = if (owners.isEmpty) Seq(("", Seq.empty[String])) else owners
      rows.map { case (owner, ddls) =>
        LockView(id, t, "optimistic", owner, ddls, synced, unsynced)
      }
    }

  final case class UnlockResult(ok: Boolean, msg: String,
      execOwner: Option[String], skipped: Seq[String])

  /**
   * UnlockDDLLock as a pure kernel (server.go:931-980 +
   * pessimist.go:285-385): a malformed id can't name a task; an unknown id
   * errors; the (possibly replaced) owner must be SYNCED — otherwise the
   * operator should break, not unlock; on success the owner gets `exec`,
   * every OTHER SYNCED source gets `skip` (un-synced sources are not
   * waiting for an operation), and the lock leaves the table.
   * `ownerOpDone` models step 6's wait outcome (pessimist.go:345-354): an
   * owner whose exec operation did NOT complete fails the unlock and the
   * lock stays — unless `forceRemove`, which removes the lock anyway (the
   * dmctl `--force-remove` escape hatch, pessimist.go:279-283).
   */
  def unlockLock(locks: Seq[PessLock], id: String,
      replaceOwner: Option[String] = None,
      forceRemove: Boolean = false,
      ownerOpDone: Boolean = true): (Seq[PessLock], UnlockResult) = {
    if (extractTaskFromLockID(id).isEmpty)
      return (locks, UnlockResult(ok = false,
        "can't find task name from lock-ID", None, Seq.empty))
    locks.find(_.id == id) match {
      case None =>
        (locks, UnlockResult(ok = false, s"lock with ID $id not found", None,
          Seq.empty))
      case Some(lock) =>
        val owner = replaceOwner.getOrElse(lock.owner)
        val synced = lock.ready.collect { case (s, true) => s }.toSeq.sorted
        if (!lock.ready.getOrElse(owner, false))
          (locks, UnlockResult(ok = false,
            s"owner $owner is not waiting for a lock, but sources " +
              s"${synced.mkString(",")} are waiting for the lock",
            None, Seq.empty))
        else if (!ownerOpDone && !forceRemove)
          (locks, UnlockResult(ok = false,
            s"the owner $owner of the lock $id has not done the operation",
            None, Seq.empty))
        else
          (locks.filterNot(_.id == id),
            UnlockResult(ok = true, "", Some(owner),
              synced.filterNot(_ == owner)))
    }
  }
}
