package graft.diff

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Precheck suite (SURVEY.md §2.13 V6; reference dm/checker/checker.go:84-400
 * and dm/pkg/checker/): one-shot replication-readiness diagnostics over the
 * actual tables, covering the offline-applicable checkers — table structure
 * (TablesChecker: PK, types, name collisions, column bounds), primary-key
 * sanity (primary_key.go), charset cleanliness, MySQL-range timestamps, and
 * the shard-group checkers (ShardingTablesChecker schema consistency +
 * auto-increment PK conflict). Only the live CONNECTION legs
 * (dial/handshake of conn_checker.go, SHOW GRANTS / SHOW VARIABLES
 * round-trips) need a server; their decision logic replays offline from
 * snapshots carried in the task spec — server-config checks via
 * [[Precheck.SourceMeta]] below, and the privilege checkers' full
 * GRANT/REVOKE lattice via [[graft.diff.PrivilegeCheck]] fed the
 * account's grant statements (q308).
 *
 * Schema checks run on the driver against the catalog StructType (no data
 * pass); data checks are ONE aggregation per table; shard checks are one
 * aggregation per group. Emits (table_name, check_name, verdict, detail).
 *
 * The server-CONFIG checkers (version / server_id / binlog enable / format /
 * row_image — dm/pkg/checker/mysql_server.go, binlog.go) need only the
 * source's variable snapshot, not a live connection: the task spec carries
 * it as [[Precheck.SourceMeta]] and [[serverChecks]] replays the reference's
 * acceptance logic offline (same severities: version/server_id warn,
 * binlog misconfig fails).
 */
object Precheck {

  final case class CheckResult(table_name: String, check_name: String,
                               verdict: String, detail: String)

  /** Source server variable snapshot carried by the task spec — the five
    * variables the reference's server checkers SHOW from a live conn. */
  final case class SourceMeta(version: String = "8.0.36-log",
                              serverId: Long = 1L,
                              logBin: String = "ON",
                              binlogFormat: String = "ROW",
                              binlogRowImage: String = "FULL")

  private val supported: Set[DataType] = Set(ByteType, ShortType, IntegerType,
    LongType, FloatType, DoubleType, StringType, BinaryType, BooleanType,
    DateType, TimestampType, TimestampNTZType)

  /** InnoDB practical column ceiling (the reference flags wide tables). */
  val MaxColumns = 1017

  def schemaChecks(table: String, schema: StructType,
                   pkCols: Seq[String]): Seq[CheckResult] = {
    val hasPk = pkCols.nonEmpty && pkCols.forall(schema.fieldNames.contains)
    val unsupported = schema.fields.filterNot(f =>
      supported.contains(f.dataType) ||
        f.dataType.isInstanceOf[DecimalType] ||
        f.dataType.isInstanceOf[ArrayType])
    val pkFields = schema.fields.filter(f => pkCols.contains(f.name))
    // declared-nullable PK is a warning, not a failure: parquet written
    // without required-ness still replicates, but merge keys SHOULD be
    // declared non-null (the reference warns on missing PK/UK similarly)
    val nullablePk = pkFields.filter(_.nullable)
    val floatPk = pkFields.filter(f =>
      f.dataType == FloatType || f.dataType == DoubleType)
    val lowered = schema.fieldNames.groupBy(_.toLowerCase).filter(_._2.length > 1)
    val badDecimals = schema.fields.collect {
      case StructField(n, d: DecimalType, _, _) if d.precision > 38 => n
    }
    Seq(
      CheckResult(table, "pk_present",
        if (hasPk) "pass" else "fail",
        if (hasPk) pkCols.mkString(",") else s"missing: ${pkCols.mkString(",")}"),
      CheckResult(table, "types_supported",
        if (unsupported.isEmpty) "pass" else "fail",
        unsupported.map(_.name).mkString(",")),
      CheckResult(table, "pk_schema_not_nullable",
        if (nullablePk.isEmpty) "pass" else "warn",
        nullablePk.map(_.name).mkString(",")),
      CheckResult(table, "pk_type_sane",
        if (floatPk.isEmpty) "pass" else "fail",
        floatPk.map(_.name).mkString(",")),
      CheckResult(table, "column_name_collision",
        if (lowered.isEmpty) "pass" else "fail",
        lowered.keys.mkString(",")),
      CheckResult(table, "column_count_bound",
        if (schema.fields.length <= MaxColumns) "pass" else "fail",
        s"cols=${schema.fields.length}"),
      CheckResult(table, "decimal_precision_bound",
        if (badDecimals.isEmpty) "pass" else "fail",
        badDecimals.mkString(",")))
  }

  /** MySQL TIMESTAMP range in epoch seconds: [1970-01-01, 2038-01-19). */
  private val TsMaxEpoch = 2147483647L

  /** One (check_name, verdict, detail) struct from boolean + detail exprs. */
  private def checkStruct(name: String, pass: Column, detail: Column,
                          failVerdict: String = "fail"): Column =
    struct(lit(name).as("check_name"),
      when(pass, "pass").otherwise(failVerdict).as("verdict"),
      detail.as("detail"))

  /**
   * Data checks in ONE aggregation: non-empty, PK non-null, PK unique,
   * charset cleanliness (no U+FFFD mojibake in any string column), and
   * MySQL-range timestamps. LAZY — returns the check-row plan without
   * running a job, so [[run]] can union every table's aggregation into a
   * single Spark action (the reference runs checkers concurrently,
   * dm/checker/checker.go:84-400; a driver-sequential job per table would
   * serialize at fleet scale).
   */
  def dataChecks(spark: SparkSession, table: String, df: DataFrame,
                 pkCols: Seq[String]): DataFrame = {
    val pk = pkCols.map(col)
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    val tsCols = df.schema.fields
      .filter(f => f.dataType == TimestampType || f.dataType == TimestampNTZType)
      .map(_.name)
    val anyBadUtf8: Column =
      if (strCols.isEmpty) lit(0L)
      else sum(when(strCols.map(c => col(c).contains("�")).reduce(_ || _), 1L)
        .otherwise(0L))
    val tsOutOfRange: Column =
      if (tsCols.isEmpty) lit(0L)
      else sum(when(tsCols.map(c =>
          unix_timestamp(col(c)) < 0 || unix_timestamp(col(c)) > TsMaxEpoch)
        .reduce(_ || _), 1L).otherwise(0L))
    val agg = df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(pk.map(_.isNull).reduce(_ || _), 1L).otherwise(0L)).as("n_null_pk"),
      countDistinct(pk.head, pk.tail: _*).as("n_distinct_pk"),
      anyBadUtf8.as("n_bad_utf8"),
      tsOutOfRange.as("n_ts_oob"))
    agg.select(explode(array(
        checkStruct("non_empty", col("n_rows") > 0,
          concat(lit("rows="), col("n_rows").cast("string"))),
        checkStruct("pk_not_null", col("n_null_pk") === 0,
          concat(lit("null_pk="), col("n_null_pk").cast("string"))),
        checkStruct("pk_unique",
          col("n_distinct_pk") === col("n_rows") - col("n_null_pk"),
          concat(lit("distinct="), col("n_distinct_pk").cast("string"))),
        checkStruct("charset_clean", col("n_bad_utf8") === 0,
          concat(lit("mojibake_rows="), col("n_bad_utf8").cast("string"))),
        checkStruct("timestamp_range", col("n_ts_oob") === 0,
          if (tsCols.isEmpty) lit("no timestamp columns")
          else concat(lit("oob_rows="), col("n_ts_oob").cast("string")))
      )).as("c"))
      .select(lit(table).as("table_name"), col("c.check_name").as("check_name"),
        col("c.verdict").as("verdict"), col("c.detail").as("detail"))
  }

  /**
   * Shard-group checks (reference ShardingTablesChecker /
   * OptimisticShardingTablesChecker, table_structure.go:542-806 and the
   * auto-increment PK conflict check): the shards merging into one target
   * must agree on schema (field-union join without type conflicts) and
   * must not collide on primary-key values.
   */
  def shardChecks(spark: SparkSession, table: String,
                  shards: Seq[DataFrame], pkCols: Seq[String]): DataFrame = {
    import spark.implicits._
    import graft.core.SchemaRegistry
    val joined = SchemaRegistry.joinSchemas(shards.map(_.schema))
    val schemaRes = joined match {
      case Right(_) => CheckResult(table, "shard_schema_consistent", "pass",
        s"shards=${shards.length}")
      case Left(c) => CheckResult(table, "shard_schema_consistent", "fail",
        s"field ${c.field}: ${c.types.mkString(" vs ")}")
    }
    // one distributed agg: a pk value appearing in >1 shard = merge
    // conflict. Lazy like dataChecks — the count folds into run()'s one job.
    val tagged = shards.zipWithIndex.map { case (s, i) =>
      s.select(pkCols.map(col) :+ lit(i).as("_shard"): _*).distinct()
    }.reduce(_ unionByName _)
    val pkRes = tagged.groupBy(pkCols.map(col): _*)
      .agg(countDistinct(col("_shard")).as("n_shards"))
      .agg(sum(when(col("n_shards") > 1, 1L).otherwise(0L)).as("n_conflicts"))
      .select(lit(table).as("table_name"),
        lit("auto_increment_conflict").as("check_name"),
        when(coalesce(col("n_conflicts"), lit(0L)) === 0, "pass")
          .otherwise("fail").as("verdict"),
        concat(lit("colliding_keys="),
          coalesce(col("n_conflicts"), lit(0L)).cast("string")).as("detail"))
    Seq(schemaRes).toDF().unionByName(pkRes)
  }

  /** Leading numeric triple of a MySQL-ish version string
    * ("8.0.36-log" → (8,0,36)); unparseable segments read as 0. */
  private[diff] def parseVersion(v: String): (Int, Int, Int) = {
    val nums = v.takeWhile(c => c.isDigit || c == '.').split('.')
      .map(s => s.toIntOption.getOrElse(0)).padTo(3, 0)
    (nums(0), nums(1), nums(2))
  }

  private def geq(a: (Int, Int, Int), b: (Int, Int, Int)): Boolean =
    Ordering[(Int, Int, Int)].gteq(a, b)

  /**
   * Server-config checkers over the task spec's variable snapshot —
   * reference semantics checker by checker:
   *  - mysql_version (mysql_server.go:51-113): MariaDB → warn
   *    (experimental), TiDB → warn (unsupported upstream), else the
   *    supported window is [5.6.0, 8.5.0) with out-of-window a warn.
   *  - mysql_server_id (mysql_server.go:116-158): 0/unset warns
   *    (master/slave switchover hazard).
   *  - mysql_binlog_enable (binlog.go:41-77): log_bin must be ON → fail.
   *  - mysql_binlog_format (binlog.go:82-119): must be ROW → fail.
   *  - mysql_binlog_row_image (binlog.go:129-190): must be FULL, but the
   *    variable only exists from MySQL 5.6.2 / MariaDB 10.1.6 — older
   *    servers always use full images, so the check passes vacuously.
   */
  def serverChecks(source: String, meta: SourceMeta): Seq[CheckResult] = {
    val ver = parseVersion(meta.version)
    val isMaria = meta.version.toLowerCase.contains("mariadb")
    val isTidb = meta.version.toLowerCase.contains("tidb")
    val versionCheck =
      if (isMaria)
        CheckResult(source, "mysql_version", "warn", "mariadb_experimental")
      else if (isTidb)
        CheckResult(source, "mysql_version", "warn", "tidb_unsupported_upstream")
      else if (!geq(ver, (5, 6, 0)))
        CheckResult(source, "mysql_version", "warn",
          s"version=${meta.version} below 5.6.0")
      else if (geq(ver, (8, 5, 0)))
        CheckResult(source, "mysql_version", "warn",
          s"version=${meta.version} at/above 8.5.0")
      else CheckResult(source, "mysql_version", "pass", s"version=${meta.version}")
    val rowImageRequired =
      if (isMaria) geq(ver, (10, 1, 6)) else geq(ver, (5, 6, 2))
    Seq(
      versionCheck,
      CheckResult(source, "mysql_server_id",
        if (meta.serverId > 0) "pass" else "warn",
        s"server_id=${meta.serverId}"),
      CheckResult(source, "mysql_binlog_enable",
        if (meta.logBin.equalsIgnoreCase("ON")) "pass" else "fail",
        s"log_bin=${meta.logBin}"),
      CheckResult(source, "mysql_binlog_format",
        if (meta.binlogFormat.equalsIgnoreCase("ROW")) "pass" else "fail",
        s"binlog_format=${meta.binlogFormat}"),
      CheckResult(source, "mysql_binlog_row_image",
        if (!rowImageRequired || meta.binlogRowImage.equalsIgnoreCase("FULL"))
          "pass"
        else "fail",
        s"binlog_row_image=${meta.binlogRowImage}"))
  }

  /** Full precheck over a set of tables with their PK definitions, plus
    * optional shard groups merging into one target table. Schema checks are
    * driver-side (catalog StructTypes, no data pass); every data/shard
    * aggregation is a lazy one-row plan, so the whole suite materializes as
    * ONE Spark action with the per-table aggs running as parallel stages —
    * job count is O(1) in the number of tables. */
  def run(spark: SparkSession, tables: Seq[(String, DataFrame, Seq[String])],
          shardGroups: Seq[(String, Seq[DataFrame], Seq[String])] = Nil,
          sources: Seq[(String, SourceMeta)] = Nil): DataFrame = {
    import spark.implicits._
    val schema = (tables.flatMap { case (name, df, pk) =>
      schemaChecks(name, df.schema, pk)
    } ++ sources.flatMap { case (name, meta) => serverChecks(name, meta) }).toDF()
    val withData = tables.map { case (name, df, pk) => dataChecks(spark, name, df, pk) }
      .foldLeft(schema)(_ unionByName _)
    shardGroups.map { case (name, shards, pk) => shardChecks(spark, name, shards, pk) }
      .foldLeft(withData)(_ unionByName _)
  }
}
