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

  test("sinkSplitAndSort ≡ reference fold for random txn streams") {
    // Independent formulation: per-txn driver-side list fold executing
    // TrySplitAndSortUpdateEvent literally (split in place, then ONE
    // stable sortBy dml-class iff any split) vs the operator's
    // window/row_number plan.
    val rnd = new scala.util.Random(1123)
    for (trial <- 1 to 8) {
      val rows = (0 until 60).map { i =>
        val op = rnd.nextInt(10) match {
          case n if n < 4 => "I"
          case n if n < 8 => "U"
          case _ => "D"
        }
        val pk = 1L + rnd.nextInt(8)
        val churn = op == "U" && rnd.nextInt(3) == 0
        (i.toLong, op, 100L + i / 5, pk, if (churn) pk + 100 else pk)
      }
      val df = rows.toDF("seq", "op", "commit_ts", "pk", "pk_after")
        .withColumn("start_ts", col("commit_ts") - 1)
        .withColumn("schema_name", lit("s")).withColumn("table_name", lit("t"))
        .withColumn("val_before", lit(1.0)).withColumn("val_after", lit(2.0))
        .withColumn("etype", lit("e"))
      val got = Transforms.sinkSplitAndSort(df)
        .select("commit_ts", "sink_seq", "op", "pk")
        .as[(Long, Long, String, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap

      val expected = rows.groupBy(_._3).view.mapValues { txn =>
        val split = txn.sortBy(_._1).flatMap {
          case (_, "U", _, pk, pkAfter) if pk != pkAfter =>
            Seq(("D", pk), ("I", pkAfter))
          case (_, op, _, pk, pkAfter) =>
            Seq((op, if (op == "I") pkAfter else pk))
        }
        if (split.size > txn.size) { // a split happened → stable class sort
          val cls = Map("D" -> 0, "U" -> 1, "I" -> 2)
          split.sortBy(e => cls(e._1)) // Seq.sortBy is stable
        } else split
      }.toMap
      assert(got == expected, s"trial $trial diverged")
    }
  }

  test("TableDef render∘parse∘render fixpoint over random schemas") {
    val rnd = new scala.util.Random(77)
    val pool = Seq("int", "int(7)", "bigint", "tinyint(1)", "smallint",
      "mediumint(8)", "decimal(10,4)", "decimal", "float", "float(7,3)",
      "double", "varchar(64)", "char(3)", "date", "datetime", "datetime(3)",
      "timestamp(6)", "time(2)", "blob(100)", "text(400)", "year",
      "enum('a','b')", "set('x','y')", "json", "vector(8)", "bit(5)")
    for (trial <- 1 to 20) {
      val numeric = Set("int", "bigint", "tinyint", "smallint", "mediumint",
        "decimal", "float", "double", "bit")
      val n = 1 + rnd.nextInt(10)
      val specs = (0 until n).map { i =>
        val tp = pool(rnd.nextInt(pool.size))
        graft.core.ColumnSpec(s"c${i}_${rnd.nextInt(100)}", tp,
          nullable = rnd.nextBoolean(),
          isHandle = i == 0,
          unsigned = rnd.nextInt(4) == 0 &&
            numeric(tp.takeWhile(_.isLetter)))
      }
      val j = graft.streaming.TableDef.marshalWithQuery(
        s"db$trial", s"t$trial", trial.toLong, s"CREATE TABLE t$trial (<&>)",
        graft.streaming.TableDef.ActionCreateTable, specs)
      val (sch, tbl, ver, parsed) = graft.streaming.TableDef.parse(j)
      assert((sch, tbl, ver) === ((s"db$trial", s"t$trial", trial.toLong)))
      val j2 = graft.streaming.TableDef.marshalWithQuery(
        s"db$trial", s"t$trial", trial.toLong, s"CREATE TABLE t$trial (<&>)",
        graft.streaming.TableDef.ActionCreateTable, parsed)
      assert(j2 === j, s"trial $trial not a fixpoint")
      // checksum is a pure function of the sorted marshal: permuting the
      // declared column order must not change it
      val perm = rnd.shuffle(specs.toList)
      assert(graft.streaming.TableDef.checksum(s"db$trial", s"t$trial", perm)
        === graft.streaming.TableDef.checksum(s"db$trial", s"t$trial", specs))
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
