package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One driver-gradeable query: a Spark implementation plus (usually) an
 * equivalent DuckDB oracle SQL over the same parquet tables. Column names
 * MUST match between the two — the driver sorts columns by name and hashes
 * values. Results must be deterministic across engines: integer/decimal
 * arithmetic only in derived values; raw doubles may pass through untouched.
 */
final case class GateQuery(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object Gate {
  def all: Seq[GateQuery] =
    CoreQueries.all ++ CdcQueries.all ++ DiffQueries.all ++
      CodecQueries.all ++ GenericCodecQueries.all ++ DocQueries.all ++
      CurationQueries.all ++ LmQueries.all ++ EmbeddingQueries.all ++
      ExtraQueries.all ++
      DdlQueries.all ++ StreamTwinQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
