package graft

import org.apache.spark.sql.functions._
import graft.operators.Gtid

/** GTID-set algebra: parse/render round trip, merge of overlapping and
  * adjacent intervals, subtraction, membership. Semantics follow the public
  * MySQL GTID set format (reference consumer: dm/pkg/gtid/gtid.go). */
class GtidSpec extends SparkSpec {
  import spark.implicits._

  test("parse handles ranges, singles, multi-interval blocks, whitespace") {
    val parsed = Seq("aaa:1-5:8, bbb:3 ,ccc:10-12:14:20-21")
      .toDF("s")
      .select(explode(Gtid.parseSet(col("s"))).as("iv"))
      .select($"iv.uuid", $"iv.start", $"iv.end")
      .as[(String, Long, Long)].collect().toSet
    assert(parsed === Set(
      ("aaa", 1L, 5L), ("aaa", 8L, 8L), ("bbb", 3L, 3L),
      ("ccc", 10L, 12L), ("ccc", 14L, 14L), ("ccc", 20L, 21L)))
  }

  test("mergeIntervals fuses touching points and leaves gaps") {
    val pts = Seq(("u", 1L), ("u", 2L), ("u", 3L), ("u", 5L), ("u", 6L),
      ("u", 9L), ("v", 4L)).toDF("uuid", "txn")
    val merged = Gtid.mergeIntervals(pts)
      .as[(String, Long, Long)].collect().toSet
    assert(merged === Set(("u", 1L, 3L), ("u", 5L, 6L), ("u", 9L, 9L),
      ("v", 4L, 4L)))
  }

  test("render → parse → merge round-trips to the same canonical set") {
    val pts = Seq.tabulate(40)(i => ("s1", (i * 3 % 17).toLong)) ++
      Seq.tabulate(10)(i => ("s2", (i + 100).toLong))
    val merged = Gtid.mergeIntervals(pts.toDF("uuid", "txn"))
    val rendered = Gtid.renderSet(merged).as[String].head()
    // s1 covers 0..16 fully (3 is a generator mod 17), s2 covers 100..109
    assert(rendered === "s1:0-16,s2:100-109")
    val reparsed = Seq(rendered).toDF("s")
      .select(explode(Gtid.parseSet(col("s"))).as("iv"))
      .select($"iv.uuid".as("uuid"), $"iv.start", $"iv.end")
      .as[(String, Long, Long)].collect().toSet
    assert(reparsed === merged.as[(String, Long, Long)].collect().toSet)
  }

  test("subtractIntervals removes covered txns and re-merges") {
    val a = Seq(("u", 1L, 10L), ("v", 5L, 6L)).toDF("uuid", "start", "end")
    val b = Seq(("u", 4L, 6L), ("u", 9L, 20L), ("w", 1L, 9L))
      .toDF("uuid", "start", "end")
    val out = Gtid.subtractIntervals(a, b)
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("u", 1L, 3L), ("u", 7L, 8L), ("v", 5L, 6L)))
  }

  test("containsTxn answers membership from the string form") {
    val df = Seq(("aaa:1-5:9,bbb:7", 3L, true), ("aaa:1-5:9,bbb:7", 6L, false),
      ("aaa:1-5:9,bbb:7", 9L, true)).toDF("s", "txn", "expect")
    val bad = df.filter(
      Gtid.containsTxn(col("s"), lit("aaa"), col("txn")) =!= col("expect"))
    assert(bad.count() === 0)
  }
}
