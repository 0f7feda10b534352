package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Hashing

/**
 * Multimodal column plumbing for training-data pipelines: image/audio/video
 * as opaque `binary` columns with typed metadata, processed by partition-
 * batched decoders.
 *
 * The DECODE step is a clearly-marked STUB — no image/audio libraries exist
 * in this environment — but everything Spark-side is real and tested: the
 * envelope schema, the binary column, deterministic partitioning, the
 * mapPartitions batch shape (the Scala analog of `mapInPandas`: one
 * iterator per partition so a real decoder would amortize model/codec init
 * across the batch), and the feature schema.
 */
object Multimodal {

  /** Typed media envelope: binary payload + metadata struct. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                                 head_byte: Int, phash: Long,
                                 frame_offsets: Seq[Long])

  /** Derive a deterministic media table from documents (payload = UTF-8
    * text bytes; metadata from doc stats) — same derivation is expressible
    * in the oracle. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      (col("n_chars") * 10).as("duration_ms"))

  /**
   * STUB decoder ??? — stands in for image decode / audio feature
   * extraction / video frame sampling. Deterministic fake: length, first
   * byte, a portable perceptual-hash surrogate, and 4 evenly-spaced "frame"
   * offsets. A real implementation would decode `payload` here with the
   * codec library, reusing it across the partition's iterator.
   */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      // co-locate by id bucket: real decoders benefit from stable,
      // size-balanced partitions (model state reuse, GPU batching)
      .repartition(partitions, pmod(col("media_id"), lit(partitions.toLong)))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init happens HERE (codec handles, model weights)
        rows.map { r =>
          val len = r.payload.length.toLong
          MediaFeatures(
            media_id = r.media_id,
            kind = r.kind,
            byte_len = len,
            head_byte = if (len > 0) r.payload(0) & 0xff else -1,
            phash = stubPhash(r.payload),
            frame_offsets = (0 until 4).map(i => i * (len / 4)))
        }
      }
  }

  /** Portable stand-in for a perceptual hash: 60-bit md5 prefix of the
    * payload bytes (as UTF-8 string — the derivation keeps it
    * oracle-checkable). */
  private def stubPhash(payload: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Column-expression variant of the feature extraction (no mapPartitions)
    * — the pure-SQL fallback used by the correctness gate to prove the
    * typed path computes the same thing. */
  def featuresSql(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("byte_len"),
      when(length(col("payload")) > 0,
        ascii(col("payload").cast("string"))).otherwise(-1).as("head_byte"),
      Hashing.portableLong(col("payload").cast("string")).as("phash"),
      transform(sequence(lit(0), lit(3)),
        i => i * (length(col("payload")).cast("long") / 4).cast("long")).as("frame_offsets"))
}
