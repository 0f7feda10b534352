package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Compaction

/**
 * Syncpoint + redo (SURVEY.md §2.11 W3/W4).
 *
 * W3 syncpoint: per-microbatch record of (batch_id, max commit ts applied)
 * — the consistent-snapshot map tiflow writes to tidb_cdc.syncpoint_v1
 * (cdc/syncpointstore/mysql_syncpoint_store.go:110-180). Downstream readers
 * pick a syncpoint ts to query state as-of a consistent upstream point.
 *
 * W4 redo: the durable envelope WAL is the storage sink's output itself;
 * disaster recovery = batch-replay rows in (checkpointTs, resolvedTs] into
 * the state table (reference applier pkg/applier/redo.go:162-420) — the
 * applier IS the normal batch pipeline, no separate machinery.
 */
object Redo {

  def writeSyncpoint(dir: String, batchId: Long, maxCommitTs: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/syncpoint_$batchId"), maxCommitTs.toString)
  }

  def syncpoints(dir: String): Seq[(Long, Long)] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.startsWith("syncpoint_"))
        .map { p =>
          (p.getFileName.toString.stripPrefix("syncpoint_").toLong,
            Files.readString(p).trim.toLong)
        }.toSeq.sortBy(_._1)
    }
  }

  /**
   * Replay WAL rows with checkpointTs < commit_ts <= resolvedTs into the
   * keyed state (idempotent — replaying an applied range converges).
   * `walDir` is a storageSink output (partitioned envelope rows), so the
   * commit-ts filter prunes at the scan.
   */
  def replay(spark: SparkSession, walDir: String, stateDir: String,
             checkpointTs: Long, resolvedTs: Long): Unit = {
    val wal = spark.read.parquet(walDir)
      .filter(col("commit_ts") > checkpointTs && col("commit_ts") <= resolvedTs)
    val compacted = Compaction.compact(
      graft.operators.Transforms.updateSplit(wal))
    Sinks.parquetStateSink(spark, stateDir)(compacted, resolvedTs)
  }
}
