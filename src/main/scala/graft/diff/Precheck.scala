package graft.diff

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Precheck suite (SURVEY.md §2.13 V6; reference dm/checker/checker.go and
 * the dm/pkg/checker package): one-shot replication-readiness diagnostics over the
 * actual tables. Schema checks run on the driver against the catalog
 * StructType (no data pass); data checks are one aggregation per table.
 * Emits (table_name, check_name, verdict, detail).
 */
object Precheck {

  final case class CheckResult(table_name: String, check_name: String,
                               verdict: String, detail: String)

  private val supported: Set[DataType] = Set(ByteType, ShortType, IntegerType,
    LongType, FloatType, DoubleType, StringType, BinaryType, BooleanType,
    DateType, TimestampType, TimestampNTZType)

  def schemaChecks(table: String, schema: StructType,
                   pkCols: Seq[String]): Seq[CheckResult] = {
    val hasPk = pkCols.nonEmpty && pkCols.forall(schema.fieldNames.contains)
    val unsupported = schema.fields.filterNot(f =>
      supported.contains(f.dataType) ||
        f.dataType.isInstanceOf[DecimalType] ||
        f.dataType.isInstanceOf[ArrayType])
    Seq(
      CheckResult(table, "pk_present",
        if (hasPk) "pass" else "fail",
        if (hasPk) pkCols.mkString(",") else s"missing: ${pkCols.mkString(",")}"),
      CheckResult(table, "types_supported",
        if (unsupported.isEmpty) "pass" else "fail",
        if (unsupported.isEmpty) "" else unsupported.map(_.name).mkString(",")))
  }

  /** Data checks: non-empty, PK non-null, PK unique — one aggregation. */
  def dataChecks(spark: SparkSession, table: String, df: DataFrame,
                 pkCols: Seq[String]): DataFrame = {
    import spark.implicits._
    val pk = pkCols.map(col)
    val agg = df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(pk.map(_.isNull).reduce(_ || _), 1L).otherwise(0L)).as("n_null_pk"),
      countDistinct(pk.head, pk.tail: _*).as("n_distinct_pk")).collect()(0)
    val (rows, nullPk, distinctPk) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    Seq(
      CheckResult(table, "non_empty",
        if (rows > 0) "pass" else "fail", s"rows=$rows"),
      CheckResult(table, "pk_not_null",
        if (nullPk == 0) "pass" else "fail", s"null_pk=$nullPk"),
      CheckResult(table, "pk_unique",
        if (distinctPk == rows - nullPk) "pass" else "fail",
        s"distinct=$distinctPk")).toDF()
  }

  /** Full precheck over a set of tables with their PK definitions. */
  def run(spark: SparkSession, tables: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    import spark.implicits._
    val schema = tables.flatMap { case (name, df, pk) =>
      schemaChecks(name, df.schema, pk)
    }.toDF()
    tables.map { case (name, df, pk) => dataChecks(spark, name, df, pk) }
      .foldLeft(schema)(_ unionByName _)
  }
}
