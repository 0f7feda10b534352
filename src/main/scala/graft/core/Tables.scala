package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has been generated as parquet TIMESTAMP(NANOS) in some
      // rounds (Spark 4 rejects it unless nanosAsLong is set) and
      // TIMESTAMP(MICROS) in others. Downstream code is written against a
      // single contract: ts = nanos-since-epoch BIGINT. Set the legacy conf
      // first (harmless when the file is micros), then normalize whatever
      // type arrives to the nanos long. Sessions here run in UTC, so the
      // NTZ→LTZ cast is identity.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      return df.schema("ts").dataType match {
        case LongType => df
        case TimestampNTZType =>
          df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
        case TimestampType =>
          df.withColumn("ts", unix_micros(col("ts")) * 1000L)
        case other =>
          sys.error(s"events.ts: unsupported parquet type $other")
      }
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
