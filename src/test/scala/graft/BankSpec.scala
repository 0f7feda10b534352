package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Changefeed, ChangefeedSpec, Sinks}

/**
 * Bank invariant (reference tests/integration_tests/bank/case.go): balanced
 * transfer transactions flow through the changefeed; after EVERY microbatch
 * the total balance must be unchanged — commit-ts-aligned batches plus
 * idempotent merge guarantee transactional visibility at the sink.
 */
class BankSpec extends SparkSpec {
  import spark.implicits._

  private val Accounts = 8
  private val Initial = 100.0

  private def insert(seq: Long, pk: Long): StreamEv =
    StreamEv(seq, "I", 1000, 999, 0, "bank", "accounts", pk, pk, None, Some(Initial), "txn")

  /** One balanced transfer: two updates sharing a commit ts. */
  private def transfer(seq: Long, ts: Long, from: Long, to: Long, amt: Double,
                       bal: Map[Long, Double]): Seq[StreamEv] = Seq(
    StreamEv(seq, "U", ts, ts - 1, 0, "bank", "accounts", from, from,
      Some(bal(from)), Some(bal(from) - amt), "txn"),
    StreamEv(seq + 1, "U", ts, ts - 1, 0, "bank", "accounts", to, to,
      Some(bal(to)), Some(bal(to) + amt), "txn"))

  test("total balance invariant holds after every microbatch") {
    val dir = Files.createTempDirectory("graft_bank").toString
    val spec = ChangefeedSpec(id = "bank", checkpointDir = s"$dir/ckpt")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEv]

    def drainAndCheck(): Unit = {
      val q = Changefeed.start(spark, mem.toDF(), spec)(
        Sinks.parquetStateSink(spark, s"$dir/state"))
      q.awaitTermination()
      val total = Sinks.readState(spark, s"$dir/state")
        .agg(sum(col("final_val"))).as[Double].head()
      assert(math.abs(total - Accounts * Initial) < 1e-9,
        s"invariant broken: total=$total")
    }

    // batch 1: open accounts
    mem.addData((1 to Accounts).map(i => insert(i.toLong, i.toLong)): _*)
    drainAndCheck()

    // batches 2..4: rounds of balanced transfers (deterministic schedule)
    var bal = (1 to Accounts).map(i => i.toLong -> Initial).toMap
    var seq = 100L
    var ts = 2000L
    for (round <- 1 to 3) {
      val evs = (1 to 4).flatMap { i =>
        val from = ((round * 3 + i) % Accounts + 1).toLong
        val to = ((round * 5 + i * 2) % Accounts + 1).toLong
        if (from != to) {
          val e = transfer(seq, ts, from, to, 10.0 * i, bal)
          bal = bal + (from -> (bal(from) - 10.0 * i)) + (to -> (bal(to) + 10.0 * i))
          seq += 2; ts += 1
          e
        } else Seq.empty
      }
      mem.addData(evs: _*)
      drainAndCheck()
    }

    // final per-account balances match the driver-side ledger
    val state = Sinks.readState(spark, s"$dir/state")
      .select("pk", "final_val").as[(Long, Double)].collect().toMap
    assert(state == bal)
  }
}
