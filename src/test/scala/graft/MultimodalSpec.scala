package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/**
 * The typed mapPartitions decode path must compute exactly what the pure
 * column-expression twin computes — proving the Spark-side plumbing
 * (schema, partitioning, batch shape) is faithful regardless of which
 * engine path runs. The decoder itself stays a declared stub (no codec
 * libraries in this environment).
 */
class MultimodalSpec extends SparkSpec {

  test("mapPartitions features == column-expression features, row for row") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf, "documents"))
    val typed = Multimodal.decodeFeatures(spark, media, partitions = 8).toDF()
      .withColumn("frame_offsets", col("frame_offsets").cast("array<string>"))
    val sql = Multimodal.featuresSql(media)
      .withColumn("frame_offsets", col("frame_offsets").cast("array<string>"))
      .withColumn("head_byte", col("head_byte").cast("int"))
    assert(typed.count() > 0)
    assert(typed.exceptAll(sql).isEmpty && sql.exceptAll(typed).isEmpty)
  }

  test("media envelope: binary payload with typed metadata, stable buckets") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf, "documents"))
    val f = media.schema("payload")
    assert(f.dataType === org.apache.spark.sql.types.BinaryType)
    assert(media.select("kind").distinct().count() === 3)
    // deterministic partitioning: same id bucket on every run
    val a = Multimodal.decodeFeatures(spark, media, partitions = 4)
      .select("media_id", "phash")
    val b = Multimodal.decodeFeatures(spark, media, partitions = 16)
      .select("media_id", "phash")
    assert(a.exceptAll(b).isEmpty, "partition count must not change results")
  }
}
