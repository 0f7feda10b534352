package graft

import graft.operators.Multiplex
import org.apache.spark.sql.functions._

class MultiplexSpec extends SparkSpec {
  import spark.implicits._

  // (region, batch, seq, ts, fwd)
  private def prog(rows: Seq[(Long, Long, Long, Long, Boolean)]) =
    Multiplex.progress(rows.toDF("region", "batch", "seq", "ts", "fwd"))
      .orderBy("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))

  test("frontier is 0 until every region has forwarded once") {
    // region 1 stays silent in batch 0, forwards in batch 1
    val out = prog(Seq(
      (0L, 0L, 1L, 10L, true),
      (1L, 0L, 2L, 11L, false),
      (0L, 1L, 3L, 20L, true),
      (1L, 1L, 4L, 21L, true)))
    assert(out(0)._6 == 0L && out(0)._7 == 0) // uninitialized, no emit
    assert(out(1)._6 == 20L && out(1)._7 == 1) // min(20, 21) once both in
  }

  test("a silent region carries its watermark and holds the frontier") {
    val out = prog(Seq(
      (0L, 0L, 1L, 10L, true), (1L, 0L, 2L, 12L, true),
      (0L, 1L, 3L, 20L, true), (1L, 1L, 4L, 22L, false), // region 1 silent
      (0L, 2L, 5L, 30L, true), (1L, 2L, 6L, 32L, true)))
    assert(out(0)._6 == 10L && out(0)._7 == 1)
    assert(out(1)._6 == 12L && out(1)._7 == 1) // held at region 1's carry
    assert(out(2)._6 == 30L && out(2)._7 == 1) // min(30, 32)
    assert(out(1)._5 == 1L) // only one region forwarded in batch 1
  }

  test("re-delivered entries count as dups; first delivery wins") {
    val out = prog(Seq(
      (0L, 0L, 1L, 10L, true), (1L, 0L, 2L, 11L, true),
      (0L, 1L, 1L, 10L, true), // seq 1 re-delivered in batch 1
      (1L, 1L, 3L, 21L, true)))
    assert(out(0)._2 == 2L && out(0)._3 == 2L && out(0)._4 == 0L)
    assert(out(1)._2 == 2L && out(1)._3 == 1L && out(1)._4 == 1L)
  }

  test("a non-advancing round emits nothing even when regions forward") {
    // batch 1 re-forwards the SAME watermarks -> frontier unchanged
    val out = prog(Seq(
      (0L, 0L, 1L, 10L, true), (1L, 0L, 2L, 12L, true),
      (0L, 1L, 3L, 10L, true), (1L, 1L, 4L, 12L, true)))
    assert(out(0)._6 == 10L && out(0)._7 == 1)
    assert(out(1)._6 == 10L && out(1)._7 == 0) // forwarded but no advance
  }
}
