package graft

import org.apache.spark.sql.functions._
import graft.operators.{Compaction, Transforms}
import graft.streaming.SqlGen

/** Property-flavored semantics checks over seeded random inputs (the
  * reference's approach for the compactor: net effect must equal naive
  * replay — SURVEY.md §5). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("compaction ≡ naive replay for random op sequences") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 10) {
      val rows = (0 until 40).map { i =>
        val op = rnd.nextInt(10) match {
          case n if n < 5 => "I"
          case n if n < 8 => "U"
          case _ => "D"
        }
        val pk = 1L + rnd.nextInt(6)
        val v = (1 + rnd.nextInt(999)).toDouble
        (i.toLong, op, 100L + i, pk, pk,
          if (op == "I") None else Some(v - 1),
          if (op == "D") None else Some(v))
      }
      val df = rows
        .toDF("seq", "op", "commit_ts", "pk", "pk_after", "val_before", "val_after")
        .withColumn("schema_name", lit("s")).withColumn("table_name", lit("t"))
        .withColumn("etype", lit("e"))
      val compacted = Compaction.compact(Transforms.updateSplit(df))
        .filter(col("net_op") =!= "D")
        .select("pk", "final_val").as[(Long, Option[Double])].collect().toMap

      // naive replay in plain Scala
      val state = collection.mutable.Map.empty[Long, Double]
      rows.sortBy(_._1).foreach {
        case (_, "D", _, pk, _, _, _) => state.remove(pk)
        case (_, _, _, pk, _, _, Some(v)) => state(pk) = v
        case _ =>
      }
      assert(compacted.view.mapValues(_.get).toMap == state.toMap,
        s"trial $trial diverged")
    }
  }

  test("sql literal escaping is injection-safe") {
    val rows = Seq(("db", "t'; DROP TABLE x; --", 1L, "I", Some(1.0)))
      .toDF("schema_name", "table_name", "pk", "net_op", "final_val")
      .collect().iterator
    val sql = SqlGen.generate(rows).head
    // table names are backtick-quoted; the quote inside stays inert
    assert(sql.startsWith("INSERT INTO `db`.`t'; DROP TABLE x; --`"))
  }

  test("csv quoting doubles embedded quotes and renders nulls as \\N") {
    import graft.operators.Codecs
    val df = Seq((Some("""say "hi""""), None: Option[String]))
      .toDF("a", "b")
      .select(Codecs.csvQuote(col("a")).as("qa"), Codecs.csvQuote(col("b")).as("qb"))
    val r = df.as[(String, String)].collect()(0)
    assert(r._1 == "\"say \"\"hi\"\"\"")
    assert(r._2 == "\\N")
  }

  test("range chunking partitions cover the table exactly once") {
    val li = graft.core.Tables.load(spark, sf, "lineitem")
    val chunked = graft.diff.ChunkDiff.withRangeChunk(
      li, Seq(col("l_orderkey"), col("l_linenumber")), 8)
    assert(chunked.count() == li.count())
    val n = chunked.select("chunk_id").distinct().count()
    assert(n > 1 && n <= 8)
  }
}
