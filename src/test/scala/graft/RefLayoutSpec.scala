package graft

import org.apache.spark.sql.functions._

import graft.core.ColumnSpec
import graft.operators.{GenericCodecs, Routing}
import graft.operators.GenericCodecs.CsvRowOpts

/** Round-11 reference-layout surfaces: the exact CSV row layout
  * (csv_message.go:105-148) parsed back with an INDEPENDENT RFC-4180
  * parser, and the partition-rule resolution aliases. */
class RefLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val specs = Seq(
    ColumnSpec("id", "bigint", nullable = false, isHandle = true),
    ColumnSpec("note", "varchar(64)"),
    ColumnSpec("qty", "int"))

  /** Minimal independent RFC-4180 parser (quote-doubling, delimiter in
    * quotes, terminator-split done by the caller): one row → cells. */
  private def parseCsvRow(row: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false; var i = 0
    while (i < row.length) {
      val c = row.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < row.length && row.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  test("randomized: ref-layout CSV parses back cell-for-cell (150 rows)") {
    val rnd = new scala.util.Random(2209L)
    val nasty = Seq("plain", "with,comma", "with\"quote", "a\"\"b", "",
      "trail,", ",lead", "q\"mid,mix\"")
    def note() = if (rnd.nextInt(5) == 0) None
      else Some(nasty(rnd.nextInt(nasty.length)) + rnd.nextInt(100))
    val rows = Seq.tabulate(150) { i =>
      val op = Seq("I", "U", "D")(rnd.nextInt(3))
      (op, 1000L + i, 999L, "db", s"t${i % 3}", i.toLong, i.toLong,
        note(), note(), Some(rnd.nextInt(50)), Some(rnd.nextInt(50)))
    }
    val df = rows.toDF("op", "commit_ts", "start_ts", "schema_name",
      "table_name", "a_id", "b_id", "a_note", "b_note", "a_qty", "b_qty")
    val opts = CsvRowOpts(includeCommitTs = true, outputOldValue = true,
      terminator = "\r\n")
    val msgs = df.select(col("op"), col("commit_ts"), col("table_name"),
        col("a_id"), col("b_id"), col("a_note"), col("b_note"),
        col("a_qty"), col("b_qty"),
        GenericCodecs.csvLinesRef(specs, opts = opts).as("msg"))
      .collect()
    msgs.foreach { r =>
      val op = r.getString(0)
      val lines = r.getString(9).split("\r\n", -1).toSeq.init // terminated rows
      assert(lines.nonEmpty && (op != "U" || lines.size == 2))
      def cellStr(v: Any): String = Option(v).map(String.valueOf).getOrElse("\\N")
      def check(line: String, expOp: String, idIdx: Int, noteIdx: Int,
                qtyIdx: Int): Unit = {
        val cells = parseCsvRow(line)
        assert(cells.size === 5 + specs.size, line)
        assert(cells(0) === expOp && cells(1) === r.getString(2))
        assert(cells(3) === r.getLong(1).toString)
        assert(cells(4) === (if (op == "U") "true" else "false"))
        assert(cells(5) === cellStr(r.get(idIdx)))
        // NULL renders unquoted \N — distinguishable from the quoted "\N"?
        // the gate layout uses quoted strings, so a parsed bare \N is null
        assert(cells(6) === cellStr(r.get(noteIdx)), line)
        assert(cells(7) === cellStr(r.get(qtyIdx)))
      }
      op match {
        case "I" => check(lines(0), "I", 3, 5, 7)
        case "D" => check(lines(0), "D", 4, 6, 8)
        case "U" =>
          check(lines(0), "D", 4, 6, 8) // old image leg
          check(lines(1), "I", 3, 5, 7) // new image leg
      }
    }
  }

  test("output-field-header row matches encodeHeader") {
    val h = GenericCodecs.csvHeaderRef(specs,
      opts = CsvRowOpts(includeCommitTs = true, outputOldValue = true))
    assert(h === "ticdc-meta$operation,ticdc-meta$table,ticdc-meta$schema," +
      "ticdc-meta$commit-ts,ticdc-meta$is-update,id,note,qty\r\n")
    // optional meta columns drop with their options; no handle-key entry
    // ever (the reference's own asymmetry, encodeHeader:492-518)
    val bare = GenericCodecs.csvHeaderRef(specs,
      opts = CsvRowOpts(outputHandleKey = true, terminator = "\n"))
    assert(bare === "ticdc-meta$operation,ticdc-meta$table,ticdc-meta$schema," +
      "id,note,qty\n")
  }

  test("debezium time zone interprets DATETIME wall time in the config zone") {
    val s2 = Seq(ColumnSpec("id", "bigint", nullable = false, isHandle = true),
      ColumnSpec("at", "datetime"))
    val df = Seq(("I", 100L, 99L, "db", "t", 1L, 1L,
        Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
        Option.empty[java.sql.Timestamp]))
      .toDF("op", "commit_ts", "start_ts", "schema_name", "table_name",
        "a_id", "b_id", "a_at", "b_at")
    def epoch(zone: String): Long = {
      val msg = df.select(GenericCodecs.debeziumWith(s2, disableSchema = true,
        timeZone = zone).as("m")).as[String].head()
      "\"at\":(\\d+)".r.findFirstMatchIn(msg).get.group(1).toLong
    }
    val utc = epoch("UTC")
    // the same wall time read as Shanghai local is 8 h EARLIER in epoch
    assert(epoch("Asia/Shanghai") === utc - 8 * 3600 * 1000L)
  }

  test("partition-rule aliases resolve like getPartitionDispatcher") {
    val df = Seq((1L, 100L, "s", "t", 7L))
      .toDF("seq", "commit_ts", "target_schema", "target_table", "pk_after")
    def run(rule: String, scheme: String) = {
      val (part, key) = Routing.resolvePartitionRule(rule, scheme, 6)
      df.select(part.cast("long"), key.getOrElse(lit(null).cast("string")))
        .as[(Long, Option[String])].head()
    }
    // rowid is the deprecated alias of index-value; default = table
    assert(run("rowid", "kafka://b") === run("index-value", "kafka://b"))
    assert(run("default", "kafka://b") === run("table", "kafka://b"))
    // unknown rule: constant key under pulsar, default fallback elsewhere
    assert(run("billing-key", "pulsar+ssl://b") === ((0L, Some("billing-key"))))
    assert(run("billing-key", "kafka://b") === run("table", "kafka://b"))
    // the key dispatcher carries the RAW configured string — the rule is
    // folded only for matching named dispatchers (NewKeyDispatcher gets
    // the original, event_router.go:234)
    assert(run("UserID", "pulsar://b") === ((0L, Some("UserID"))))
  }

  test("output-handle-key names each UPDATE leg's own image key") {
    // pk-moving update 7→8: the "D" (old) leg must carry 7, the "I" leg 8
    val df = Seq(("U", 100L, 99L, "db", "t", 8L, 7L, Option("n"),
        Option("o"), Some(1), Some(2)))
      .toDF("op", "commit_ts", "start_ts", "schema_name", "table_name",
        "a_id", "b_id", "a_note", "b_note", "a_qty", "b_qty")
    val msg = df.select(GenericCodecs.csvLinesRef(specs,
        opts = CsvRowOpts(outputOldValue = true, outputHandleKey = true,
          terminator = "\n")).as("m")).as[String].head()
    val Seq(dLeg, iLeg) = msg.split("\n", -1).toSeq.init
    assert(parseCsvRow(dLeg).take(5) === Seq("D", "t", "db", "true", "7"), dLeg)
    assert(parseCsvRow(iLeg).take(5) === Seq("I", "t", "db", "true", "8"), iLeg)
  }

  test("range join accepts shared passthrough names, rejects predicate clashes") {
    import graft.operators.Ranges
    val pts = Seq((1L, 5L, 10L)).toDF("pid", "p", "user_id")
    val ivs = Seq((9L, 0L, 10L, 10L)).toDF("iid", "s", "e", "user_id")
    // user_id shared but unreferenced by the residual → fine
    assert(Ranges.pointInInterval(pts, "p", ivs, "s", "e", 4L).count() === 1L)
    // a predicate column on both sides → fail fast
    val bad = ivs.withColumnRenamed("s", "p0").withColumnRenamed("e", "p")
    intercept[IllegalArgumentException] {
      Ranges.pointInInterval(pts, "p", bad, "p0", "p", 4L)
    }
  }

  test("windowed-dedup keys are injective under separator-dense values") {
    import graft.operators.Dedup
    // values embedding the separator+marker bytes: without per-slot
    // escaping both tuples encode to one identical joined string
    val rows = Seq(
      ("x\u0001\u0002y", "z", 0L, 1L),
      ("x", "y\u0001\u0002z", 0L, 2L))
    val kept = Dedup.dedupWithinDelta(
      rows.toDF("a", "b", "ts", "id"), Seq("a", "b"), "ts", "id", 10L)
    // distinct key tuples → two separate chains → both anchors kept
    assert(kept.count() === 2L)
  }
}
