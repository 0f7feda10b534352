package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.operators.Matcher
import graft.operators.Matcher.{MatchedRow, TwoPcEvent}

/** Streaming 2PC matcher: prewrite buffered until commit; rollback cancels;
  * out-of-order commit-before-prewrite tolerated (reference matcher.go). */
class MatcherSpec extends SparkSpec {
  import spark.implicits._

  test("prewrite+commit emit once; rollback cancels; order-tolerant") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TwoPcEvent]
    val ckpt = Files.createTempDirectory("graft_2pc").toString
    val buf = collection.mutable.ArrayBuffer.empty[MatchedRow]
    def drain(): Unit = {
      val q = Matcher.matchStream(spark, mem.toDS())
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[MatchedRow], _: Long) =>
          buf ++= df.collect(); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // prewrite arrives, no commit yet → nothing emitted
    mem.addData(TwoPcEvent("P", 10, 1, Some(5.0), None))
    drain()
    assert(buf.isEmpty)

    // commit arrives later (different microbatch) → emits the matched row
    mem.addData(TwoPcEvent("C", 10, 1, None, Some(15L)))
    drain()
    assert(buf.toSeq == Seq(MatchedRow(10, 1, 5.0, 15)))

    // rollback cancels a pending prewrite
    mem.addData(TwoPcEvent("P", 20, 2, Some(7.0), None))
    mem.addData(TwoPcEvent("R", 20, 2, None, None))
    drain()
    assert(buf.size == 1)

    // commit-before-prewrite (reference tolerates reordering)
    mem.addData(TwoPcEvent("C", 30, 3, None, Some(35L)))
    drain()
    mem.addData(TwoPcEvent("P", 30, 3, Some(9.0), None))
    drain()
    assert(buf.toSet.contains(MatchedRow(30, 3, 9.0, 35)))
  }
}
