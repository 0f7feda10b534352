package graft

import org.apache.spark.sql.functions._
import graft.core.CdcStream
import graft.operators._

/** Semantics specs for the CDC operator suite (SURVEY.md §2.4-2.6). */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private def cdc = CdcStream.derive(spark, sf).cache()

  test("table filter: last matching rule wins") {
    val rules = Seq(
      Filters.TableRule("*", "*", allow = true),
      Filters.TableRule("*", "tbl_2", allow = false),
      Filters.TableRule("db_1", "tbl_2", allow = true))
    val in = Seq(
      ("db_0", "tbl_0"), ("db_0", "tbl_2"), ("db_1", "tbl_2"), ("db_1", "tbl_3"))
      .toDF("schema_name", "table_name")
    val kept = Filters.tableFilter(in, rules)
      .as[(String, String)].collect().toSet
    assert(kept == Set(("db_0", "tbl_0"), ("db_1", "tbl_2"), ("db_1", "tbl_3")))
  }

  test("table filter: wildcard compilation") {
    assert(Filters.wildcardToRegex("tbl_*") == "^tbl_.*$")
    assert(Filters.wildcardToRegex("t?l") == "^t.l$")
    assert(Filters.wildcardToRegex("a.b") == "^a\\.b$")
  }

  test("image expr filter: update old/new expressions bind to distinct images") {
    val in = Seq(
      // op, val_before, val_after — rules: ignoreUpdateOld "val < 20",
      // ignoreUpdateNew "val > 180"
      (1L, "U", Some(10.0), Some(50.0)),  // old image trips the OLD rule
      (2L, "U", Some(50.0), Some(200.0)), // new image trips the NEW rule
      (3L, "U", Some(50.0), Some(50.0)),  // neither → kept
      (4L, "U", Some(200.0), Some(10.0)), // values swapped: NEITHER rule
                                          // fires iff binding is per-image
      (5L, "I", None, Some(200.0)),       // insert rule absent → kept
      (6L, "D", Some(1.0), None))         // delete: old image < 5 → dropped
      .toDF("seq", "op", "val_before", "val_after")
    val rules = Seq(Filters.ImageExprRule(
      ignoreDelete = "val < 5",
      ignoreUpdateOld = "val < 20", ignoreUpdateNew = "val > 180"))
    val kept = Filters.exprFilterImages(in, rules)
      .select("seq").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
    // null images never skip (tiflow null = no-skip contract)
    val withNull = Seq((7L, "U", None: Option[Double], Some(300.0)))
      .toDF("seq", "op", "val_before", "val_after")
    assert(Filters.exprFilterImages(withNull,
      Seq(Filters.ImageExprRule(ignoreUpdateOld = "val < 20")))
      .count() == 1)
  }

  test("update split: key-churn updates become D+I, others pass through") {
    val in = Seq(
      (1L, "U", 10L, 9L, 0, "s", "t", 5L, 5L, Some(1.0), Some(2.0), "e"),
      (2L, "U", 11L, 10L, 0, "s", "t", 5L, 6L, Some(2.0), Some(3.0), "e"))
      .toDF("seq", "op", "commit_ts", "start_ts", "source_id", "schema_name",
        "table_name", "pk", "pk_after", "val_before", "val_after", "etype")
    val out = Transforms.updateSplit(in)
      .select("seq", "op", "pk", "val_before", "val_after")
      .as[(Long, String, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == (2L, "U", 5L, Some(1.0), Some(2.0)))   // in-place update
    assert(out(1) == (4L, "D", 5L, Some(2.0), None))        // delete leg (before key)
    assert(out(2) == (5L, "I", 6L, None, Some(3.0)))        // insert leg (after key)
  }

  test("sink split+sort: class-sorts ONLY txns that split; bypass modes identity") {
    // one txn (commit_ts 10): I, U(key churn → splits), D, U(in place)
    // one txn (commit_ts 11): D then I, NO split → arrival order kept
    val in = Seq(
      (1L, "I", 10L, 9L, 0, "s", "t", 1L, 1L, None: Option[Double], Some(1.0), "e"),
      (2L, "U", 10L, 9L, 0, "s", "t", 2L, 3L, Some(1.0), Some(2.0), "e"),
      (3L, "D", 10L, 9L, 0, "s", "t", 4L, 4L, Some(2.0), None: Option[Double], "e"),
      (4L, "U", 10L, 9L, 0, "s", "t", 5L, 5L, Some(1.0), Some(2.0), "e"),
      (5L, "D", 11L, 10L, 0, "s", "t", 6L, 6L, Some(2.0), None: Option[Double], "e"),
      (6L, "I", 11L, 10L, 0, "s", "t", 7L, 7L, None: Option[Double], Some(1.0), "e"))
      .toDF("seq", "op", "commit_ts", "start_ts", "source_id", "schema_name",
        "table_name", "pk", "pk_after", "val_before", "val_after", "etype")
    def ops(df: org.apache.spark.sql.DataFrame, ts: Long): Seq[(Long, String, Long)] =
      df.filter(col("commit_ts") === ts)
        .select("sink_seq", "op", "pk").as[(Long, String, Long)]
        .collect().sortBy(_._1).toSeq
    val sorted = Transforms.sinkSplitAndSort(in)
    // split txn: D legs first (split-D of seq2 key 2, then plain D of seq3),
    // the in-place U in the middle class, inserts last (plain I, then the
    // insert leg key 3) — stable within each class by encounter order
    assert(ops(sorted, 10L).map(t => (t._2, t._3)) ===
      Seq(("D", 2L), ("D", 4L), ("U", 5L), ("I", 1L), ("I", 3L)))
    assert(ops(sorted, 10L).map(_._1) === Seq(1L, 2L, 3L, 4L, 5L))
    // unsplit txn keeps ARRIVAL order even though D < I would reorder it
    assert(ops(sorted, 11L).map(t => (t._2, t._3)) ===
      Seq(("D", 6L), ("I", 7L)))
    // bypass modes: untouched rows, sink_seq = seq
    for (bypass <- Seq(
        Transforms.sinkSplitAndSort(in, scheme = "mysql"),
        Transforms.sinkSplitAndSort(in, outputRawChangeEvent = true))) {
      assert(bypass.count() === 6)
      assert(bypass.filter(col("sink_seq") =!= col("seq")).count() === 0)
      assert(bypass.filter(col("op") === "U").count() === 2)
    }
  }

  test("compaction equals naive last-state replay") {
    import org.apache.spark.sql.expressions.Window
    val split = Transforms.updateSplit(cdc)
    val compacted = Compaction.compact(split)
      .select("schema_name", "table_name", "pk", "net_op", "final_val")

    // Naive replay oracle: order by seq per key; survivors are keys whose
    // last op is not D; final value = last val_after.
    val w = Window.partitionBy("schema_name", "table_name", "pk").orderBy(col("seq"))
    val replay = split
      .withColumn("rn", row_number().over(
        Window.partitionBy("schema_name", "table_name", "pk").orderBy(col("seq").desc)))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("schema_name"), col("table_name"), col("pk"), col("val_after"))

    val c = compacted.filter(col("net_op") =!= "D")
      .select("schema_name", "table_name", "pk", "final_val")
    assert(c.exceptAll(replay).count() == 0)
    assert(replay.exceptAll(c).count() == 0)
  }

  test("compaction net-op matrix") {
    val in = Seq(
      // key 1: I then D  -> vanishes
      (1L, "I", 1L, 1L, Some(1.0)), (2L, "D", 2L, 1L, None),
      // key 2: D then I  -> safe REPLACE pair
      (3L, "D", 1L, 2L, None), (4L, "I", 2L, 2L, Some(2.0)),
      // key 3: I then U  -> I
      (5L, "I", 1L, 3L, Some(1.0)), (6L, "U", 2L, 3L, Some(3.0)),
      // key 4: U then U  -> U
      (7L, "U", 1L, 4L, Some(1.0)), (8L, "U", 2L, 4L, Some(4.0)))
      .toDF("seq", "op", "commit_ts", "pk", "val_after")
      .withColumn("schema_name", lit("s")).withColumn("table_name", lit("t"))
    val out = Compaction.compact(in)
      .select("pk", "net_op", "final_val")
      .as[(Long, String, Option[Double])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (2L, "R", Some(2.0)), (3L, "I", Some(3.0)), (4L, "U", Some(4.0))))
  }

  test("chunk checksum is order-insensitive") {
    val li = graft.core.Tables.load(spark, sf, "lineitem")
    def canonical(df: org.apache.spark.sql.DataFrame) =
      Seq(col("l_orderkey"), col("l_linenumber"))
    val a = graft.diff.ChunkDiff.chunkChecksums(
      li, Seq(col("l_orderkey"), col("l_linenumber")), 8, canonical(li))
    val b = graft.diff.ChunkDiff.chunkChecksums(
      li.orderBy(rand(42)), Seq(col("l_orderkey"), col("l_linenumber")), 8, canonical(li))
    assert(a.orderBy("chunk_id").collect().toSeq ==
      b.orderBy("chunk_id").collect().toSeq)
  }

  test("row diff classifies missing/extra/different") {
    val s = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val t = Seq((2L, "b"), (3L, "x"), (4L, "d")).toDF("k", "v")
    val d = graft.diff.ChunkDiff.rowDiff(s, t, Seq("k"), df => Seq(col("v")))
      .select("k", "diff_type").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "missing", 3L -> "different", 4L -> "extra"))
  }

  test("quantize/floorDiv match JVM integer semantics on negatives") {
    val vals = Seq((-7L, 2L), (7L, 2L), (-9L, 3L), (5L, 4L)).toDF("s", "c")
    val out = vals.select(VectorOps.floorDiv(col("s"), col("c"))).as[Long].collect()
    assert(out.toSeq == Seq(Math.floorDiv(-7, 2), 3L, -3L, 1L))
  }

  test("jaccard bounds and exact-dup detection") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("id", "text")
    val sh = docs.select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(pairs.find(p => p._1 == 1 && p._2 == 2).get._3 == 1.0)
    assert(pairs.find(p => p._1 == 1 && p._2 == 3).get._3 == 0.0)
  }

  test("simhash: identical docs identical, near docs near") {
    val docs = Seq(
      (1L, "spark streaming cdc engine with operators and sinks here"),
      (2L, "spark streaming cdc engine with operators and sinks here"),
      (3L, "spark streaming cdc engine with operators and sinks there"),
      (4L, "entirely different words about unrelated topics altogether now"))
      .toDF("id", "text")
      .select(col("id"), Dedup.simhash(col("text"), 32).as("h"))
    val h = docs.as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) < 8)
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 4)
  }

  test("column selector refuses to drop handle/index columns") {
    val indexes = Seq(Seq("pk"), Seq("etype", "val_after"))
    // dropping val_after breaks the (etype, val_after) unique index
    val bad = Transforms.verifyColumnSelector(Seq("etype"),
      Seq("tbl_0" -> indexes))
    assert(bad.map(v => (v.table, v.dropped)) === Seq(("tbl_0", Seq("val_after"))))
    intercept[IllegalArgumentException] {
      Transforms.columnSelectorChecked(cdc, Seq("etype"), "tbl_0", indexes)
    }
    // keeping both index columns passes (pk is an always-kept envelope col)
    val ok = Transforms.columnSelectorChecked(cdc, Seq("etype", "val_after"),
      "tbl_0", indexes)
    assert(ok.columns.contains("etype") && ok.columns.contains("val_after"))
    assert(!ok.columns.contains("val_before"))
  }
}
