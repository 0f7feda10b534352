package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/**
 * Storage-sink CONSUMER: the read side of [[Sinks.storageSink]]'s
 * {base}/{schema}/{table}/{date}/ layout (reference component
 * cmd/storage-consumer — replays cloud-storage sink output into a
 * downstream; layout pkg/sink/cloudstorage/path.go:136-430).
 *
 * Schema discovery uses the `_schema.json` sidecars the sink writes next
 * to each table's files — a consumer never opens data files to learn the
 * column layout (the reference consumer reads schema.json the same way).
 * Table/schema/date come back as partition columns from the directory
 * names; a user-supplied schema keeps Spark's own partition inference
 * out of the picture so types are stable across engines and runs.
 *
 * Scale shape: the layout IS a partitioned parquet table, so a consumer
 * on a 1000-executor cluster gets partition pruning (one table / one day
 * = one directory subtree) and parallel file splits for free; replay to
 * state is the same one-shuffle compaction the engine uses everywhere.
 */
object StorageConsumer {

  /** Find one `_schema.json` sidecar per (schema, table) under `base`. */
  def sidecars(base: String): Map[(String, String), StructType] = {
    val root = Paths.get(base)
    if (!Files.exists(root)) return Map.empty
    val out = scala.collection.mutable.Map.empty[(String, String), StructType]
    val walk = Files.walk(root) // walk holds directory handles — must close
    try {
      walk.iterator().asScala
        .filter(p => p.getFileName.toString == "_schema.json")
        .foreach { p: Path =>
          val table = p.getParent
          val schema = table.getParent
          val key = (schema.getFileName.toString.stripPrefix("schema_name="),
            table.getFileName.toString.stripPrefix("table_name="))
          out(key) = DataType.fromJson(Files.readString(p)).asInstanceOf[StructType]
        }
    } finally walk.close()
    out.toMap
  }

  /**
   * Read the full layout back into envelope rows. Payload columns come
   * from the sidecar schemas (they agree across tables for one
   * changefeed); `schema_name`, `table_name`, `_date` are recovered from
   * the partition directories as strings.
   */
  def read(spark: SparkSession, base: String): DataFrame = {
    val payloads = sidecars(base)
    require(payloads.nonEmpty, s"no _schema.json sidecars under $base")
    // One changefeed ⇒ one payload schema. Reading heterogeneous tables
    // with a single schema would silently null/misread columns, so fail
    // loudly instead (a mixed layout needs per-table reads + union).
    require(payloads.values.toSet.size == 1,
      s"sidecar schemas disagree under $base: " +
        payloads.map { case (k, v) => s"$k=${v.simpleString}" }.mkString("; "))
    val payload = payloads.values.head
    val full = StructType(payload.fields ++ Seq(
      StructField("schema_name", StringType), StructField("table_name", StringType),
      StructField("_date", StringType)))
    spark.read.schema(full).parquet(base)
  }

  // ---- registry-driven schema drift ------------------------------------

  private val VersionedSidecarRe = "_schema_v(\\d+)\\.json".r

  /** All versioned sidecars under `base`: (schema, table, version) →
    * payload schema. Written by [[Sinks.storageSink]] with a
    * `schemaVersion`, one per version bump. */
  def versionedSidecars(base: String): Map[(String, String, Int), StructType] = {
    val root = Paths.get(base)
    if (!Files.exists(root)) return Map.empty
    val out = scala.collection.mutable.Map.empty[(String, String, Int), StructType]
    val walk = Files.walk(root)
    try {
      walk.iterator().asScala.foreach { p: Path =>
        p.getFileName.toString match {
          case VersionedSidecarRe(v) =>
            val table = p.getParent
            val schema = table.getParent
            out((schema.getFileName.toString.stripPrefix("schema_name="),
              table.getFileName.toString.stripPrefix("table_name="),
              v.toInt)) =
              DataType.fromJson(Files.readString(p)).asInstanceOf[StructType]
          case _ =>
        }
      }
    } finally walk.close()
    out.toMap
  }

  /**
   * Read a layout whose schema CHANGED mid-stream: each (table, version)
   * subtree is read with ITS OWN sidecar schema — the reference's model is
   * a schema.json per table version (the consumer re-reads it per version,
   * pkg/sink/cloudstorage/path.go:136-430), so two tables may diverge
   * structurally at the same version number and still read cleanly.
   * Versions align by column NAME in the union — rows written before a
   * column-add surface NULL for the added column. Each per-(table,
   * version) read prunes to its own directory subtree (`basePath` keeps
   * the partition columns); the union is a plan-level concat, not a
   * shuffle, so the scan count grows with table-versions while bytes read
   * stay exactly the layout's.
   */
  def readVersioned(spark: SparkSession, base: String): DataFrame = {
    val scs = versionedSidecars(base)
    require(scs.nonEmpty, s"no versioned _schema_v*.json sidecars under $base")
    scs.toSeq.sortBy { case ((s, t, v), _) => (s, t, v) }
      .map { case ((s, t, v), payload) =>
        val full = StructType(payload.fields ++ Seq(
          StructField("schema_name", StringType),
          StructField("table_name", StringType),
          StructField("_sv", StringType), StructField("_date", StringType)))
        spark.read.schema(full).option("basePath", base)
          .parquet(s"$base/schema_name=$s/table_name=$t")
          .filter(col("_sv") === v.toString)
      }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
