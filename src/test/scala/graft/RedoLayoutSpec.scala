package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.{Redo, RedoLayout, Sinks}
import graft.streaming.RedoLayout._

/** The redo on-disk contract: naming, frames, meta lifecycle, GC, reader. */
class RedoLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("log file naming: V1 for the default namespace, V2 otherwise; parse inverts") {
    val v1 = logFileName("cap1", "default", "feed", "row", 12345L, "abc")
    assert(v1 == "cap1_feed_row_12345_abc.log")
    val v2 = logFileName("cap1", "ns1", "feed", "ddl", 99L, "xyz")
    assert(v2 == "cap1_ns1_feed_ddl_99_xyz.log")
    assert(parseLogFileName(v1).contains(ParsedLogName(12345L, "row")))
    assert(parseLogFileName(v2).contains(ParsedLogName(99L, "ddl")))
    // .tmp keeps the same segment structure (the ext rides in the last one)
    assert(parseLogFileName(v1 + ".tmp").contains(ParsedLogName(12345L, "row")))
    // .sort strips first, then parses the .log name beneath
    assert(parseLogFileName(v2 + ".sort").contains(ParsedLogName(99L, "ddl")))
    // .meta short-circuits without parsing segments
    assert(parseLogFileName("anything.meta").contains(ParsedLogName(0L, "meta")))
    // other extensions parse to (0, "") without error
    assert(parseLogFileName("whatever.txt").contains(ParsedLogName(0L, "")))
    // malformed: wrong segment count is an error
    assert(parseLogFileName("a_b_c.log").isEmpty)
    // malformed: non-numeric ts
    assert(parseLogFileName("cap_feed_row_xx_u.log").isEmpty)
  }

  test("meta file naming always carries the namespace, even default") {
    assert(metaFileName("cap1", "default", "feed", "u1") ==
      "cap1_default_feed_meta_u1.meta")
    assert(changefeedMatcher("default", "feed") == "_feed_")
    assert(changefeedMatcher("ns1", "feed") == "_ns1_feed_")
    assert(deletedMarker("default", "feed") == "delete_feed")
    assert(deletedMarker("ns1", "feed") == "delete_ns1_feed")
  }

  test("frame size arithmetic: pad to 8, width in the MSB, charge excludes the length field") {
    for (len <- 0 to 64) {
      val (lenField, pad) = encodeFrameSize(len)
      assert((len + pad) % 8 == 0)
      if (len % 8 == 0) { assert(pad == 0); assert(lenField == len.toLong) }
      else assert(lenField < 0) // MSB set
      val (rec, padBack) = decodeFrameSize(lenField)
      assert(rec == len.toLong && padBack == pad.toLong)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val charge = writeFrame(bos, Array.fill[Byte](13)(7))
    assert(charge == 16L)                  // 13 + 3 pad, no length field
    assert(bos.toByteArray.length == 24)   // 8 + 13 + 3 on disk
  }

  test("readFrames round-trips and stops at a torn tail") {
    val payloads = Seq(Array[Byte](1), Array[Byte](2, 3, 4, 5, 6, 7, 8, 9),
      Array.fill[Byte](23)(42), Array.empty[Byte])
    val bos = new java.io.ByteArrayOutputStream()
    payloads.foreach(writeFrame(bos, _))
    val whole = bos.toByteArray
    assert(readFrames(whole).map(_.toSeq) == payloads.map(_.toSeq))
    // torn write: any truncation strictly inside the last frame loses only
    // the last record
    val lastFrame = 8 + 23 + 1 + 8 // header + padded(23->24)... last frame is the empty one
    for (cut <- 1 to 7)
      assert(readFrames(whole.dropRight(cut)).size == payloads.size - 1)
    // garbage length field ends the scan instead of throwing
    val garbage = whole ++ Array.fill[Byte](8)(0x7f)
    assert(readFrames(garbage).size == payloads.size)
    assert(lastFrame > 0)
  }

  test("LogMeta msgpack codec: minimal uint widths, exact bytes for a known pair") {
    for ((c, r) <- Seq((1L, 1L), (127L, 128L), (255L, 256L), (65535L, 65536L),
      (0xffffffffL, 0x100000000L), (Long.MaxValue, Long.MaxValue))) {
      assert(decodeMeta(encodeMeta(c, r)) == (c, r))
    }
    // fixmap(2) + fixstr "checkpointTs" + fixint 5 + fixstr "resolvedTs" + uint8 200
    val bytes = encodeMeta(5L, 200L)
    val expect = Array(0x82.toByte, 0xac.toByte) ++
      "checkpointTs".getBytes("UTF-8") ++ Array(5.toByte, 0xaa.toByte) ++
      "resolvedTs".getBytes("UTF-8") ++ Array(0xcc.toByte, 200.toByte)
    assert(bytes.toSeq == expect.toSeq)
  }

  test("RedoRowCodec round-trips envelopes, nulls and negative doubles included") {
    val cases = Seq(
      RedoEnvelope(1L, "I", 1000000L, 999999L, 0, "db_0", "tbl_1", 10L, 10L,
        None, Some(1.5), "view"),
      RedoEnvelope(Long.MaxValue, "U", 2L, 1L, 2, "δβ", "t", 0L, 1L,
        Some(-3.25), None, ""),
      RedoEnvelope(7L, "D", 300L, 299L, 1, "a" * 40, "b" * 33, 5L, 5L,
        Some(0.0), Some(Double.MinPositiveValue), "e"))
    cases.foreach(e => assert(RedoRowCodec.decode(RedoRowCodec.encode(e)) == e))
  }

  test("writer rotates on unpadded size, names carry max commit ts, tmp renames on close") {
    val dir = Files.createTempDirectory("graft_redo_w").toString
    var n = 0
    val w = new LogWriter(dir, "cap", "default", "feed", "row",
      maxLogSizeBytes = 40L, uidGen = () => { n += 1; f"u$n%02d" })
    // payloads of 16 B: two fit (32 <= 40), the third rotates (32+16 > 40)
    val p = Array.fill[Byte](16)(1)
    w.writeAt(100L, p); w.writeAt(105L, p) // file 1: ts 100..105
    w.writeAt(103L, p)                     // rotates; file 2 opens at ts 103
    w.writeAt(110L, p)
    w.close()
    val names = Files.list(Paths.get(dir)).iterator()
    import scala.jdk.CollectionConverters._
    val onDisk = names.asScala.map(_.getFileName.toString).toSeq.sorted
    // uid draws: u01 tmp1, u02 final1, u03 tmp2, u04 final2
    assert(onDisk == Seq("cap_feed_row_105_u02.log", "cap_feed_row_110_u04.log"))
    assert(w.closedFiles.toSeq == Seq("cap_feed_row_105_u02.log",
      "cap_feed_row_110_u04.log"))
    // contents decode back in write order
    val f1 = readFrames(Files.readAllBytes(Paths.get(dir, onDisk.head)))
    assert(f1.size == 2 && f1.forall(_.sameElements(p)))
    // a record larger than maxLogSize is rejected outright
    val w2 = new LogWriter(dir, "cap", "default", "f2", "row", 8L, () => "x")
    intercept[IllegalArgumentException](w2.writeAt(1L, Array.fill[Byte](9)(0)))
  }

  test("meta manager: init seeds and flushes, regressions ignored, one meta file survives") {
    val dir = Files.createTempDirectory("graft_redo_m").toString
    var n = 0
    val m = new MetaManager(dir, "cap", "ns1", "feed", () => { n += 1; f"m$n%02d" })
    m.initMeta(1000L)
    assert(m.flushedMeta == (1000L, 1000L) && m.flushCount == 1)
    m.update(1100L, 1200L)
    assert(m.maybeFlush())
    m.update(1050L, 1150L) // regressed, both fields ignored
    assert(m.ignoredUpdates == 2)
    assert(!m.maybeFlush()) // nothing moved
    m.update(1100L, 1300L) // equal ckpt accepted silently, resolved moves
    assert(m.ignoredUpdates == 2)
    assert(m.maybeFlush())
    assert(m.flushedMeta == (1100L, 1300L) && m.flushCount == 3)
    import scala.jdk.CollectionConverters._
    val metas = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(MetaExt)).toSeq
    assert(metas == Seq("cap_ns1_feed_meta_m03.meta"))
    assert(decodeMeta(Files.readAllBytes(Paths.get(dir, metas.head))) ==
      (1100L, 1300L))
    // a restart merges whatever metas exist by the max rule
    Files.write(Paths.get(dir, "old_ns1_feed_meta_z.meta"), encodeMeta(900L, 1400L))
    val m2 = new MetaManager(dir, "cap", "ns1", "feed", () => "r1")
    m2.initMeta(1L)
    assert(m2.flushedMeta == (1100L, 1400L))
  }

  test("GC removes closed row/ddl logs strictly below the checkpoint, of this feed only") {
    val dir = Files.createTempDirectory("graft_redo_gc").toString
    def touch(name: String): Unit = Files.write(Paths.get(dir, name), Array[Byte](1))
    touch("cap_feed_row_99_a.log")    // < ckpt: removed
    touch("cap_feed_row_100_b.log")   // == ckpt: kept (DDL-may-execute rule)
    touch("cap_feed_ddl_10_c.log")    // ddl type also collected
    touch("cap_feed_row_98_d.log.tmp")// open file: never GCed
    touch("cap_other_row_1_e.log")    // different changefeed: kept
    Files.write(Paths.get(dir, "cap_default_feed_meta_f.meta"),
      encodeMeta(50L, 60L)) // meta: kept (and merged at init)
    var n = 0
    val m = new MetaManager(dir, "cap", "default", "feed", () => { n += 1; s"g$n" })
    m.initMeta(100L)
    val removed = m.gc()
    assert(removed.sorted == Seq("cap_feed_ddl_10_c.log", "cap_feed_row_99_a.log"))
    assert(Files.exists(Paths.get(dir, "cap_feed_row_100_b.log")))
    assert(Files.exists(Paths.get(dir, "cap_feed_row_98_d.log.tmp")))
    assert(Files.exists(Paths.get(dir, "cap_other_row_1_e.log")))
  }

  test("delete marker: deleteAllLogs sweeps matching files; preCleanup purges on restart") {
    val dir = Files.createTempDirectory("graft_redo_del").toString
    def touch(name: String): Unit = Files.write(Paths.get(dir, name), Array[Byte](1))
    touch("cap_feed_row_5_a.log"); touch("cap_other_row_5_b.log")
    val m = new MetaManager(dir, "cap", "default", "feed", () => "u")
    m.deleteAllLogs()
    assert(!Files.exists(Paths.get(dir, "cap_feed_row_5_a.log")))
    assert(Files.exists(Paths.get(dir, "cap_other_row_5_b.log")))
    assert(Files.exists(Paths.get(dir, "delete_feed")))
    // a fresh manager's startup sweep consumes the marker
    touch("cap_feed_row_9_c.log") // straggler flushed after deletion
    val m2 = new MetaManager(dir, "cap2", "default", "feed", () => "u2")
    assert(m2.preCleanup())
    assert(!Files.exists(Paths.get(dir, "cap_feed_row_9_c.log")))
    assert(!Files.exists(Paths.get(dir, "delete_feed")))
    assert(!m2.preCleanup()) // marker consumed
  }

  test("reader selection: type match, .tmp always opens, closed logs need ts > start") {
    assert(Reader.shouldOpen(100L, "cap_feed_row_101_u.log", "row"))
    assert(!Reader.shouldOpen(100L, "cap_feed_row_100_u.log", "row"))
    assert(Reader.shouldOpen(100L, "cap_feed_row_1_u.log.tmp", "row"))
    assert(!Reader.shouldOpen(0L, "cap_feed_ddl_50_u.log", "row"))
    assert(!Reader.shouldOpen(0L, "cap_default_feed_meta_u.meta", "row"))
    assert(!Reader.shouldOpen(0L, "garbage_name.log", "row"))
  }

  test("distributed write → readRows round-trip honors the (ckpt, resolved] window") {
    val dir = Files.createTempDirectory("graft_redo_rt").toString + "/redo"
    val rows = (1L to 500L).map { i =>
      (i, if (i % 3 == 0) "U" else "I", 1000L + i, 999L + i, (i % 3).toInt,
        s"db_${i % 2}", s"tbl_${i % 4}", i * 10, i * 10,
        Option.empty[Double], Some(i * 1.5), "e")
    }
    val df = rows.toDF("seq", "op", "commit_ts", "start_ts", "source_id",
      "schema_name", "table_name", "pk", "pk_after", "val_before",
      "val_after", "etype").repartition(4)
    // window (1100, 1400]: rows 101..400
    Redo.writeRedoDir(df, dir, "cap", "default", "feed",
      checkpointTs = 1100L, resolvedTs = 1400L, maxLogSizeBytes = 4096L)
    assert(RedoLayout.Reader.readMeta(dir) == (1100L, 1400L))
    val back = RedoLayout.Reader.readRows(spark, dir)
    assert(back.count() == 300L)
    val expect = rows.filter(r => r._3 > 1100L && r._3 <= 1400L)
      .map(r => (r._1, r._11.get)).toMap
    val got = back.select("seq", "val_after").as[(Long, Double)]
      .collect().toMap
    assert(got == expect)
    // several capture-suffixed writers shared the dir
    import scala.jdk.CollectionConverters._
    val logs = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(LogExt)).toSeq
    assert(logs.map(_.split("_").head).distinct.size > 1)
  }

  test("ddl logs share the dir: row reader ignores them; ddl resume widens left by one") {
    val dir = Files.createTempDirectory("graft_redo_ddl").toString + "/redo"
    val rows = (1L to 50L).map { i =>
      (i, "I", 1000L + i, 999L + i, 0, "db", "t", i, i,
        Option.empty[Double], Some(i * 1.0), "e")
    }
    val df = rows.toDF("seq", "op", "commit_ts", "start_ts", "source_id",
      "schema_name", "table_name", "pk", "pk_after", "val_before",
      "val_after", "etype")
    Redo.writeRedoDir(df, dir, "cap", "default", "feed",
      checkpointTs = 1020L, resolvedTs = 1050L)
    val ddls = Seq(
      RedoDdl(1010L, 1009L, "db", "t", "ALTER TABLE t ADD c1 INT", 5),
      RedoDdl(1020L, 1019L, "db", "t", "ALTER TABLE t ADD c2 INT", 5),
      RedoDdl(1021L, 1020L, "db", "t", "ALTER TABLE t ADD c3 INT", 5),
      RedoDdl(1050L, 1049L, "db", "t", "ALTER TABLE t ADD c4 INT", 5))
    Redo.writeRedoDdls(dir, ddls, "cap", "default", "feed")
    // the row reader's type filter skips the ddl files entirely
    assert(RedoLayout.Reader.readRows(spark, dir).count() == 30L)
    // DDL resume: startTs = checkpoint - 1, so the DDL AT the checkpoint
    // replays (it may not have executed in the owner — reader.go:160-172),
    // while the one strictly below does not
    val got = RedoLayout.Reader.readDdls(dir)
    assert(got.map(_.commit_ts) == Seq(1020L, 1021L, 1050L))
    assert(got.head.query == "ALTER TABLE t ADD c2 INT")
    // codec round-trip incl. type byte
    ddls.foreach(d =>
      assert(RedoDdlCodec.decode(RedoDdlCodec.encode(d)) == d))
    // GC at the checkpoint keeps ddl files at/above it, removes below:
    // craft a meta manager at ckpt 1020 and sweep — the ddl file carries
    // max commit 1050 (single file), so it survives; a synthetic old one
    // dies
    Files.write(Paths.get(dir, "cap_feed_ddl_1019_z.log"), Array[Byte](1))
    var n = 0
    val m = new MetaManager(dir, "cap", "default", "feed", () => { n += 1; s"g$n" })
    m.initMeta(1020L)
    assert(m.gc().contains("cap_feed_ddl_1019_z.log"))
  }

  test("replayFromRedoDir applies the real layout into keyed state") {
    val base = Files.createTempDirectory("graft_redo_apply").toString
    val wal = Seq(
      (1L, "I", 100L, 1L, Option(10.0)),
      (2L, "I", 150L, 2L, Option(20.0)),
      (3L, "U", 250L, 1L, Option(11.0)),
      (4L, "D", 300L, 2L, Option.empty[Double]),
      (5L, "I", 400L, 3L, Option(30.0))) // beyond resolved: filtered by window
      .toDF("seq", "op", "commit_ts", "pk", "val_after")
      .withColumn("start_ts", col("commit_ts") - 1)
      .withColumn("source_id", lit(0))
      .withColumn("schema_name", lit("db")).withColumn("table_name", lit("t"))
      .withColumn("pk_after", col("pk"))
      .withColumn("val_before", lit(null).cast("double"))
      .withColumn("etype", lit("e"))
    Redo.writeRedoDir(wal, s"$base/redo", "cap", "default", "feed",
      checkpointTs = 1L, resolvedTs = 300L)
    Redo.replayFromRedoDir(spark, s"$base/redo", s"$base/state")
    val s1 = Sinks.readState(spark, s"$base/state")
      .select("pk", "final_val").as[(Long, Double)].collect().toMap
    assert(s1 == Map(1L -> 11.0))
  }
}
