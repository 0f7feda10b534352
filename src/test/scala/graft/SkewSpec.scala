package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.streaming.Sinks

/** Skew helpers and state vacuum. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    // one mega-key (90% of rows) + a tail
    val df = ((1 to 900).map(_ => ("hot", 1L)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 8,
      partial = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
      fin = Seq(sum(col("s")).as("total"), sum(col("c")).as("cnt")))
      .as[(String, Long, Long)].collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
    val plain = df.groupBy("k")
      .agg(sum(col("v")).as("total"), count(lit(1)).as("cnt"))
      .as[(String, Long, Long)].collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val big = ((1 to 500).map(_ => (1L, "x")) ++
      (1 to 50).map(i => (i.toLong + 1, s"y$i"))).toDF("k", "payload")
    val dim = (1 to 60).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val a = Skew.saltedJoin(big, dim, "k", salts = 4)
      .groupBy("k").agg(count(lit(1)).as("c"), countDistinct("attr").as("d"))
      .as[(Long, Long, Long)].collect().toSet
    val b = big.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("c"), countDistinct("attr").as("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("skewPlan flags exactly the over-threshold keys; its salts keep aggs exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 1 mega-key (600 rows), 1 warm key (90), 310 singletons; P=8, f=2
    val rows = Seq.fill(600)("hot") ++ Seq.fill(90)("warm") ++
      (1 to 310).map(i => s"k$i")
    val df = rows.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val plan = Skew.skewPlan(df, "k", 8, 2).collect()
    // total=1000, avg share=125, threshold 2x=250: only "hot" qualifies
    assert(plan.map(_.getAs[String]("key")).toSeq == Seq("hot"))
    val hot = plan.head
    assert(hot.getAs[Long]("n_rows") == 600L)
    assert(hot.getAs[Long]("share_ppm") == 600000L)
    assert(hot.getAs[Long]("salts") == 5L) // ceil(600*8/1000)
    // mitigation with the recommended factor stays exact
    val salted = Skew.saltedAgg(df, Seq("k"), 5,
      Seq(count(lit(1)).as("c"), sum("v").as("s")),
      Seq(sum("c").as("n"), sum("s").as("sv")))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("vacuum keeps the recent version window") {
    val dir = Files.createTempDirectory("graft_vac").toString
    val mk = (pk: Long, v: Double) => Seq(("db", "t", pk, "I", Some(v), 100L))
      .toDF("schema_name", "table_name", "pk", "net_op", "final_val", "last_commit_ts")
    for (b <- 0L to 4L) Sinks.parquetStateSink(spark, s"$dir/state")(mk(b, b * 1.0), b)
    Sinks.vacuumState(s"$dir/state", keep = 1)
    // bucketed layout: each bucket retains at most its live version + keep
    val perBucket = new java.io.File(s"$dir/state").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
      .map(b => Option(b.listFiles()).getOrElse(Array.empty)
        .count(v => v.isDirectory && v.getName.startsWith("v")))
    assert(perBucket.nonEmpty && perBucket.forall(_ <= 2))
    // state still readable and complete
    assert(Sinks.readState(spark, s"$dir/state").count() == 5)
  }

  test("shared split points chunk both diff sides identically") {
    import graft.diff.ChunkDiff
    val li = graft.core.Tables.load(spark, sf, "lineitem")
    val points = ChunkDiff.splitPoints(li, "l_orderkey", 8)
    assert(points.length == 7 && points.sorted.sameElements(points))
    val chunked = li.withColumn("chunk_id",
      ChunkDiff.chunkBySplitPoints(col("l_orderkey"), points))
    val sizes = chunked.groupBy("chunk_id").count()
      .as[(Int, Long)].collect().toMap
    assert(sizes.keys.max <= 7 && sizes.values.sum == li.count())
    // roughly balanced: no chunk more than 3x the ideal share
    val ideal = li.count() / 8.0
    assert(sizes.values.forall(_ < ideal * 3))
    // the same points chunk a second (perturbed) side consistently:
    // every l_orderkey maps to the same chunk on both sides by construction
    val other = li.limit(1000).withColumn("chunk_id",
      ChunkDiff.chunkBySplitPoints(col("l_orderkey"), points))
    val joined = chunked.select("l_orderkey", "chunk_id").distinct()
      .join(other.select(col("l_orderkey"), col("chunk_id").as("c2")).distinct(), "l_orderkey")
    assert(joined.filter(col("chunk_id") =!= col("c2")).count() == 0)
  }
}
