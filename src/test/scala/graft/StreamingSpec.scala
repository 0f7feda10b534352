package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Filters
import graft.streaming._

/** End-to-end changefeed runtime specs: stream → pipeline → state sink. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(seq: Long, op: String, commit_ts: Long, start_ts: Long,
                        source_id: Int, schema_name: String, table_name: String,
                        pk: Long, pk_after: Long, val_before: Option[Double],
                        val_after: Option[Double], etype: String)

  private def ev(seq: Long, op: String, pk: Long, v: Double,
                 pkAfter: Option[Long] = None): Ev =
    Ev(seq, op, 100 + seq, 99 + seq, 0, "db", "t", pk,
      pkAfter.getOrElse(pk), Some(v - 1), if (op == "D") None else Some(v), "e")

  test("changefeed end-to-end: stream compacts and merges into state table") {
    val dir = Files.createTempDirectory("graft_cf").toString
    val spec = ChangefeedSpec(id = "cf-test", checkpointDir = s"$dir/ckpt")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // batch 1: inserts + one update
    mem.addData(ev(1, "I", 1, 10), ev(2, "I", 2, 20), ev(3, "U", 1, 11))
    val q1 = Changefeed.start(spark, mem.toDF(), spec)(
      Sinks.parquetStateSink(spark, s"$dir/state"))
    q1.awaitTermination()

    val s1 = Sinks.readState(spark, s"$dir/state")
      .select("pk", "final_val").as[(Long, Double)].collect().toMap
    assert(s1 == Map(1L -> 11.0, 2L -> 20.0))

    // batch 2 (resume from checkpoint): delete pk 2, key-churn update 1→5
    mem.addData(ev(4, "D", 2, 20), ev(5, "U", 1, 12, pkAfter = Some(5)))
    val q2 = Changefeed.start(spark, mem.toDF(), spec)(
      Sinks.parquetStateSink(spark, s"$dir/state"))
    q2.awaitTermination()

    val s2 = Sinks.readState(spark, s"$dir/state")
      .select("pk", "final_val").as[(Long, Double)].collect().toMap
    assert(s2 == Map(5L -> 12.0))
  }

  test("changefeed filters and routes apply in-stream") {
    val dir = Files.createTempDirectory("graft_cf2").toString
    val spec = ChangefeedSpec(
      id = "cf-filter",
      eventRules = Seq(Filters.EventRule("*", "*", ignoreOps = Set("D"))),
      routes = Seq(graft.operators.Routing.RouteRule("db", "*", "dw", "merged")),
      checkpointDir = s"$dir/ckpt")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(ev(1, "I", 1, 10), ev(2, "D", 1, 10), ev(3, "I", 2, 20))
    var seen: org.apache.spark.sql.DataFrame = null
    val q = Changefeed.start(spark, mem.toDF(), spec) { (b, _) => seen = b.cache() }
    q.awaitTermination()

    assert(seen.filter(col("net_op") === "D").count() == 0)
    assert(seen.select("table_name").distinct().as[String].collect().toSeq == Seq("merged"))
    assert(seen.count() == 2)
  }

  test("idempotent replay: re-applying a batch converges to same state") {
    val dir = Files.createTempDirectory("graft_cf3").toString
    val batch = Seq(
      ("db", "t", 1L, "I", Some(10.0), 101L),
      ("db", "t", 2L, "U", Some(20.0), 102L),
      ("db", "t", 3L, "D", None, 103L))
      .toDF("schema_name", "table_name", "pk", "net_op", "final_val", "last_commit_ts")
    Sinks.parquetStateSink(spark, s"$dir/state")(batch, 0L)
    val once = Sinks.readState(spark, s"$dir/state").collect().toSet
    Sinks.parquetStateSink(spark, s"$dir/state")(batch, 1L)
    val twice = Sinks.readState(spark, s"$dir/state").collect().toSet
    assert(once == twice)
  }
}
