package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.CdcStream
import graft.operators.{Compaction, Transforms}
import graft.queries.Gate

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the minimum end-to-end CDC slice (SURVEY.md §7.2 step 1) —
    * derive a change stream, split key-churn updates, compact to net
    * effects. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Compaction.compact(Transforms.updateSplit(
      CdcStream.derive(spark, "/root/testdata/sf0.001")))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Gate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Gate.oracleSql
}
