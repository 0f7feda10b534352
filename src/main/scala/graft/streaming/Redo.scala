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

  /**
   * Write envelope rows as a REAL redo dir in the reference's on-disk
   * contract ([[RedoLayout]]): framed binary logs with rotate-and-rename
   * naming plus a flushed meta. Partitions map to captures — each task
   * writes its own `<captureId>-p<pid>_…` log files, exactly how multiple
   * captures share one changefeed's redo storage; the meta (a per-owner
   * singleton in the reference) flushes once from the driver. `dir` must
   * be shared storage on a real cluster.
   */
  def writeRedoDir(events: DataFrame, dir: String, captureId: String,
      namespace: String, changefeedId: String,
      checkpointTs: Long, resolvedTs: Long,
      maxLogSizeBytes: Long = RedoLayout.DefaultMaxLogSizeBytes): Unit = {
    import RedoLayout._
    val cols = Seq("seq", "op", "commit_ts", "start_ts", "source_id",
      "schema_name", "table_name", "pk", "pk_after", "val_before",
      "val_after", "etype")
    Files.createDirectories(Paths.get(dir))
    events.select(cols.map(col): _*)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var n = 0
          val w = new LogWriter(dir, s"$captureId-p$pid", namespace,
            changefeedId, RowFileType, maxLogSizeBytes,
            () => { n += 1; f"u$pid%03d-$n%06d" })
          it.foreach { r =>
            val e = RedoEnvelope(r.getLong(0), r.getString(1), r.getLong(2),
              r.getLong(3), r.getInt(4), r.getString(5), r.getString(6),
              r.getLong(7), r.getLong(8),
              if (r.isNullAt(9)) None else Some(r.getDouble(9)),
              if (r.isNullAt(10)) None else Some(r.getDouble(10)),
              r.getString(11))
            w.writeAt(e.commit_ts, RedoRowCodec.encode(e))
          }
          w.close()
        }
      }
    var m = 0
    val meta = new MetaManager(dir, captureId, namespace, changefeedId,
      () => { m += 1; f"m$m%06d" })
    meta.initMeta(checkpointTs)
    meta.update(checkpointTs, resolvedTs)
    meta.maybeFlush()
    ()
  }

  /**
   * The DDL side of the redo dir: `ddl`-typed log files next to the row
   * logs (same naming/rotation contract, cdc/redo/manager.go's DDLManager
   * writes through the same file writer). DDL volume is control-plane
   * sized — one sequential writer from the driver.
   */
  def writeRedoDdls(dir: String, ddls: Seq[RedoLayout.RedoDdl],
      captureId: String, namespace: String, changefeedId: String,
      maxLogSizeBytes: Long = RedoLayout.DefaultMaxLogSizeBytes): Unit = {
    import RedoLayout._
    var n = 0
    val w = new LogWriter(dir, captureId, namespace, changefeedId,
      DdlFileType, maxLogSizeBytes, () => { n += 1; f"d$n%06d" })
    ddls.sortBy(d => (d.commit_ts, d.start_ts))
      .foreach(d => w.writeAt(d.commit_ts, RedoDdlCodec.encode(d)))
    w.close()
  }

  /**
   * `cdc redo apply` from a REAL redo dir: resume window from the flushed
   * meta, select-and-decode the framed logs ([[RedoLayout.Reader]]), then
   * the same split→compact→state apply as [[replay]].
   */
  def replayFromRedoDir(spark: SparkSession, redoDir: String,
      stateDir: String): Unit = {
    val (_, resolvedTs) = RedoLayout.Reader.readMeta(redoDir)
    val rows = RedoLayout.Reader.readRows(spark, redoDir)
    val compacted = Compaction.compact(
      graft.operators.Transforms.updateSplit(rows))
    Sinks.parquetStateSink(spark, stateDir)(compacted, resolvedTs)
  }
}
