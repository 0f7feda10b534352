package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * foreachBatch sinks (SURVEY.md §2.8). Each receives a compacted net-effect
 * microbatch (net_op ∈ I/U/D/R per key) and applies it idempotently —
 * replaying a batch after a restart converges to the same state, which is
 * how Structured Streaming's at-least-once foreachBatch becomes effectively
 * exactly-once (tiflow reaches the same place via checkpointTs + safe-mode
 * REPLACE, dm/syncer/checkpoint.go:538-800).
 */
object Sinks {

  /**
   * K1-analog keyed state table on parquet: MERGE the batch into the state
   * by key (delete on D, upsert otherwise). Production target is a format
   * with native MERGE (Delta/Iceberg — transactional, partition-pruned);
   * on plain parquet we read-merge-write versioned snapshots with an
   * atomic pointer swap, which is the same algorithm minus file-level
   * transactionality.
   */
  def parquetStateSink(spark: SparkSession, stateDir: String,
                       keyCols: Seq[String] = Seq("schema_name", "table_name", "pk"))
                      (batch: DataFrame, batchId: Long): Unit = {
    val ptr = Paths.get(s"$stateDir/CURRENT")
    // pointer format: "v<version> <lastAppliedBatchId>". Replays of an
    // already-applied batch are skipped — that, not the write itself, is
    // what turns at-least-once foreachBatch delivery into exactly-once.
    val (curVersion, lastBatch): (Long, Long) =
      if (Files.exists(ptr)) {
        val parts = Files.readString(ptr).trim.split(' ')
        (parts(0).stripPrefix("v").toLong, parts(1).toLong)
      } else (-1L, Long.MinValue)
    if (batchId == lastBatch) return

    val upserts = batch.filter(col("net_op") =!= "D")
      .select(keyCols.map(col) :+ col("final_val") :+ col("last_commit_ts"): _*)
    val merged =
      if (curVersion < 0) upserts
      else {
        // anti-join removes keys touched this batch (covers U and D), then
        // the new images are appended — one shuffle on the key.
        spark.read.parquet(s"$stateDir/v$curVersion")
          .join(batch.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(upserts)
      }
    // always a FRESH version dir: the merge reads the current one lazily,
    // so writing in place would destroy its own input mid-job
    val next = curVersion + 1
    merged.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/v$next")
    val tmp = Paths.get(s"$stateDir/CURRENT.tmp")
    Files.writeString(tmp, s"v$next $batchId")
    Files.move(tmp, ptr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the current materialized state. */
  def readState(spark: SparkSession, stateDir: String): DataFrame = {
    val ptr = Paths.get(s"$stateDir/CURRENT")
    val version = Files.readString(ptr).trim.split(' ')(0)
    spark.read.parquet(s"$stateDir/$version")
  }

  /** Drop state versions older than the current minus `keep` (time-travel
    * window); the pointer's version is never removed. */
  def vacuumState(stateDir: String, keep: Int = 2): Unit = {
    val ptr = Paths.get(s"$stateDir/CURRENT")
    if (!Files.exists(ptr)) return
    val cur = Files.readString(ptr).trim.split(' ')(0).stripPrefix("v").toLong
    val dir = new java.io.File(stateDir)
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.startsWith("v")) {
        val v = f.getName.stripPrefix("v").toLongOption
        if (v.exists(_ < cur - keep)) {
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
            x.delete(); ()
          }
          rm(f)
        }
      }
    }
  }

  /**
   * K4 — cloud-storage sink: per-table files under
   * {base}/{schema}/{table}/{date}/ in the chosen format (reference layout
   * pkg/sink/cloudstorage/path.go:136-430). partitionBy gives the layout
   * for free and keeps writes parallel per partition.
   */
  def storageSink(base: String, format: String = "parquet")
                 (batch: DataFrame, batchId: Long): Unit = {
    val tsCol = if (batch.columns.contains("last_commit_ts")) "last_commit_ts"
                else "commit_ts"
    batch
      .withColumn("_date",
        date_format(timestamp_seconds(col(tsCol) / 1000), "yyyy-MM-dd"))
      .write.mode(SaveMode.Append)
      .partitionBy("schema_name", "table_name", "_date")
      .format(format)
      .save(base)
    // schema sidecar per routed table (reference writes schema.json next to
    // the data files, pkg/sink/cloudstorage/path.go schema path) — consumers
    // discover column layout without opening data files
    val payloadSchema = org.apache.spark.sql.types.StructType(
      batch.schema.filterNot(f =>
        Set("schema_name", "table_name", "_date").contains(f.name)))
    batch.select("schema_name", "table_name").distinct().collect().foreach { r =>
      val dir = Paths.get(s"$base/schema_name=${r.getString(0)}/table_name=${r.getString(1)}")
      if (Files.exists(dir)) {
        Files.writeString(dir.resolve("_schema.json"), payloadSchema.json)
      }
    }
  }

  /**
   * K1 — JDBC-shaped sink: partition by causality slot so same-key rows
   * serialize while distinct keys parallelize (reference
   * pkg/causality/conflict_detector.go via SURVEY R4), then generate
   * multi-row SQL per bounded batch. Without a live MySQL the statements
   * are written to per-partition .sql files — the full pipeline short of
   * the socket.
   */
  def sqlFileSink(outDir: String, maxTxnRow: Int = SqlGen.DefaultMaxTxnRow,
                  numPartitions: Int = 16)
                 (batch: DataFrame, batchId: Long): Unit = {
    import graft.operators.Routing
    Files.createDirectories(Paths.get(outDir))
    val parted = batch
      .withColumn("slot", Routing.causalitySlot(col("pk")))
      .repartition(numPartitions, col("slot"))
      .sortWithinPartitions(col("last_commit_ts"), col("pk"))
    parted.select("schema_name", "table_name", "pk", "net_op", "final_val")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val sqls = SqlGen.generate(rows, maxTxnRow)
        if (sqls.nonEmpty) {
          Files.writeString(
            Paths.get(s"$outDir/batch${batchId}_p$pid.sql"),
            sqls.mkString("\n") + "\n")
        }
        ()
      }
  }
}
