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
}
