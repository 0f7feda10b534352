package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multi-versioned schema store (SURVEY.md §1.2, §2.10 J2, §2.12 G1).
 * tiflow keeps a snapshot list keyed by DDL commit ts and decodes every
 * event against the snapshot at ITS OWN commit ts
 * (cdc/entry/schema_storage.go:40-242). Spark analog: a small versioned
 * registry broadcast into an as-of range join — events bind to the latest
 * version with effective_from <= commit_ts.
 */
object SchemaRegistry {

  /** One schema version of one table. */
  final case class TableVersion(schemaName: String, tableName: String,
                                version: Int, effectiveFrom: Long,
                                schema: StructType)

  /** DDL actions we apply to StructTypes (G1 subset; the reference routes
    * parsed TiDB DDL jobs, dm/syncer/ddl.go:223-414). */
  sealed trait DdlAction
  final case class AddColumn(name: String, dataType: DataType) extends DdlAction
  final case class DropColumn(name: String) extends DdlAction
  final case class RenameColumn(from: String, to: String) extends DdlAction
  final case class ModifyColumn(name: String, dataType: DataType) extends DdlAction

  def applyDdl(schema: StructType, action: DdlAction): StructType = action match {
    case AddColumn(n, t) => schema.add(n, t)
    case DropColumn(n) => StructType(schema.fields.filterNot(_.name == n))
    case RenameColumn(from, to) => StructType(schema.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    case ModifyColumn(n, t) => StructType(schema.fields.map(f =>
      if (f.name == n) f.copy(dataType = t) else f))
  }

  /**
   * G3 — optimistic shard-DDL schema join: shards may drift; the group's
   * effective schema is the field-union, nullable where any shard lacks the
   * column, CONFLICT when the same name carries different types (reference
   * dm/pkg/shardddl/optimism — the "schema lattice" join). Field order:
   * first-seen across shards, matching the reference's merge order.
   */
  final case class SchemaConflict(field: String, types: Seq[DataType])

  def joinSchemas(shards: Seq[StructType]): Either[SchemaConflict, StructType] = {
    val order = shards.flatMap(_.fieldNames).distinct
    val byName = order.map { n =>
      n -> shards.flatMap(_.fields.filter(_.name == n))
    }
    byName.collectFirst {
      case (n, fs) if fs.map(_.dataType).distinct.size > 1 =>
        SchemaConflict(n, fs.map(_.dataType).distinct)
    } match {
      case Some(c) => Left(c)
      case None =>
        Right(StructType(byName.map { case (n, fs) =>
          val f = fs.head
          // nullable if any shard misses the column or declares it nullable
          f.copy(nullable = f.nullable || fs.size < shards.size)
        }))
    }
  }

  /** Registry → DataFrame of version intervals [from, to) for the range
    * join; to = next version's from (open-ended tail). */
  def versionIntervals(spark: SparkSession, versions: Seq[TableVersion]): DataFrame = {
    import spark.implicits._
    versions.groupBy(v => (v.schemaName, v.tableName)).toSeq
      .flatMap { case ((s, t), vs) =>
        val sorted = vs.sortBy(_.effectiveFrom)
        sorted.zip(sorted.drop(1).map(_.effectiveFrom) :+ Long.MaxValue).map {
          case (v, to) => (s, t, v.version, v.effectiveFrom, to)
        }
      }
      .toDF("schema_name", "table_name", "schema_version", "v_from", "v_to")
  }

  /**
   * J2 — as-of bind: every event joins the schema version in force at its
   * commit ts. The version table is tiny → broadcast; the range predicate
   * makes this a broadcast nested-loop that Catalyst executes as a single
   * map-side pass (no shuffle of the event stream — essential at scale).
   */
  def bindSchemaVersion(events: DataFrame, intervals: DataFrame): DataFrame =
    events.join(broadcast(intervals),
      events("schema_name") === intervals("schema_name") &&
        events("table_name") === intervals("table_name") &&
        events("commit_ts") >= intervals("v_from") &&
        events("commit_ts") < intervals("v_to"),
      "left")
      .drop(intervals("schema_name")).drop(intervals("table_name"))
      .drop("v_from", "v_to")
}
