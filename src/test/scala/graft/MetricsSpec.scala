package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.Metrics

/** Per-table DML counters recorded by the metrics sink wrapper. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("wrapper records (table, op) counts per batch and totals accumulate") {
    val dir = Files.createTempDirectory("metrics").toString
    var delivered = 0L
    val sink = Metrics.withDmlMetrics(spark, s"$dir/m") { (b, _) =>
      delivered += b.count()
    }
    def batch(rows: (String, String)*) =
      rows.map { case (t, op) => ("db", t, op, 1L) }
        .toDF("schema_name", "table_name", "op", "pk")
    sink(batch(("t1", "I"), ("t1", "I"), ("t1", "U"), ("t2", "D")), 0L)
    sink(batch(("t1", "I")), 1L)
    assert(delivered === 5L)

    val totals = Metrics.totals(spark, s"$dir/m")
      .as[(String, String, String, Long, Long)].collect()
      .map { case (_, t, op, n, last) => (t, op) -> ((n, last)) }.toMap
    assert(totals(("t1", "I")) === ((3L, 1L)))
    assert(totals(("t1", "U")) === ((1L, 0L)))
    assert(totals(("t2", "D")) === ((1L, 0L)))
  }

  test("compacted batches count by net_op") {
    val dir = Files.createTempDirectory("metrics2").toString
    val sink = Metrics.withDmlMetrics(spark, s"$dir/m") { (_, _) => () }
    val compacted = Seq(("db", "t", "R", 1L), ("db", "t", "D", 2L))
      .toDF("schema_name", "table_name", "net_op", "pk")
    sink(compacted, 0L)
    val ops = Metrics.read(spark, s"$dir/m").select("op")
      .as[String].collect().sorted.toSeq
    assert(ops === Seq("D", "R"))
  }
}
