package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.CdcStream
import graft.operators.{Compaction, Transforms}
import graft.queries.Gate

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full changefeed slice (SURVEY.md §7.2 step 1) — derive
    * a change stream, run the filter→route→split pipeline, compact to net
    * effects per routed key. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.streaming.{Changefeed, ChangefeedSpec}
    import graft.operators.{Filters, Routing}
    val spec = ChangefeedSpec(
      id = "flagship",
      eventRules = Seq(Filters.EventRule("*", "*", ignoreEtypes = Set("error"))),
      routes = Seq(Routing.RouteRule("db_0", "*", "dw", "merged_0")),
      checkpointDir = "")
    val shaped = Changefeed.pipeline(
      CdcStream.derive(spark, "/root/testdata/sf0.001"), spec)
    Compaction.compact(shaped, keyCols = Seq("target_schema", "target_table", "pk"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Gate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Gate.oracleSql
}
