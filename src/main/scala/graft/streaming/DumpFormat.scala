package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The mydumper/dumpling dump-directory format DM's load unit consumes
 * (reference dm/pkg/dumpling/utils.go `ParseMetaData`; data/schema file
 * layout per the public mydumper/dumpling output: `metadata`,
 * `db.table-schema.sql`, `db.table.{seq}.sql` files each holding one
 * multi-row INSERT).
 *
 * Scale shape: the dump WRITER here is a test fixture (rendering a dump
 * is the upstream tool's job); the READER is the production side — data
 * files list cheaply, and statement parsing runs distributed, one task
 * per file batch (`mapPartitions`; a dump file is bounded by dumpling's
 * rows-per-file setting, so a partition never holds more than a few MB).
 */
object DumpFormat {

  /** Binlog locations recovered from `metadata`: the main SHOW MASTER
    * STATUS block and, when dumpling emitted it, the
    * "AFTER CONNECTION POOL ESTABLISHED" second location (DM resumes
    * from the second when present — utils.go:145-147). */
  final case class DumpMeta(logFile: String, pos: Long, gtid: String,
      logFile2: String = "", pos2: Long = 0L, gtid2: String = "") {
    def hasLocation2: Boolean = logFile2.nonEmpty || pos2 != 0L
  }

  /** A MySQL GTID set: comma-separated `uuid:interval[-interval]…`
    * entries (the shape q56's set algebra parses). */
  private def isGtidSet(s: String): Boolean =
    s.nonEmpty && s.split(",").forall(_.trim.matches(
      "[0-9a-fA-F][0-9a-fA-F-]*(:[0-9]+(-[0-9]+)?)+"))

  /** Mirror of ParseMetaDataByReader (utils.go:63-162): scan for the
    * status headers, read Log/Pos within the block, GTID may span
    * multiple lines (read until blank), SHOW SLAVE STATUS skipped. */
  def parseMetaData(text: String): DumpMeta = {
    val lines = text.split("\n", -1).iterator.buffered
    var meta = DumpMeta("", 0L, "")

    def parseBlock(): (String, Long, String) = {
      var (log, pos, gtid) = ("", 0L, "")
      var done = false
      while (!done && lines.hasNext) {
        val line = lines.next().trim
        if (line.isEmpty) done = true
        else line.split(":", 2) match {
          case Array(k, v) => (k.trim, v.trim) match {
            case ("Log", value) => log = value
            case ("Pos", value) => pos = value.toLong
            case ("GTID", value) =>
              // following non-blank lines continue the GTID set while they
              // still PARSE as one (readFollowingGTIDs, utils.go:181-210:
              // stop at blank or the first non-GTID line, drop a trailing
              // comma before validating)
              val more = new StringBuilder(value)
              var goOn = true
              while (goOn && lines.hasNext) {
                val follow = lines.head.trim
                val body = if (follow.endsWith(",")) follow.dropRight(1) else follow
                if (follow.isEmpty || !isGtidSet(body)) goOn = false
                else { more ++= lines.next().trim; () }
              }
              gtid = more.result()
              done = true
            case _ => ()
          }
          case _ => ()
        }
      }
      (log, pos, gtid)
    }

    while (lines.hasNext) {
      lines.next().trim match {
        case "SHOW MASTER STATUS:" | "SHOW BINARY LOG STATUS:" =>
          val (l, p, g) = parseBlock()
          meta = meta.copy(logFile = l, pos = p, gtid = g)
        case "SHOW MASTER STATUS: /* AFTER CONNECTION POOL ESTABLISHED */" =>
          val (l, p, g) = parseBlock()
          meta = meta.copy(logFile2 = l, pos2 = p, gtid2 = g)
        case "SHOW SLAVE STATUS:" =>
          while (lines.hasNext && lines.next().trim.nonEmpty) ()
        case _ => () // Started/Finished dump …
      }
    }
    require(meta.logFile.nonEmpty && meta.pos != 0L,
      "metadata has no binlog location") // ErrMetadataNoBinlogLoc
    meta
  }

  /**
   * Parse one data file's `INSERT INTO … VALUES (…),(…);` statement into
   * rows of raw literal strings: quoted strings unescape ('' → '),
   * unquoted tokens pass through verbatim, bare NULL becomes null.
   */
  def parseInsertValues(stmt: String): Seq[Seq[String]] = {
    val start = stmt.indexOf("VALUES")
    require(start >= 0, "no VALUES clause")
    val body = stmt.substring(start + "VALUES".length)
    val rows = Seq.newBuilder[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    val cur = new StringBuilder
    var inQuote = false
    var inRow = false
    var curIsQuoted = false
    var i = 0
    def endField(): Unit = {
      val raw = cur.result(); cur.clear()
      val v = if (!curIsQuoted && raw.trim == "NULL") null else raw
      row += v
      curIsQuoted = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (inQuote) {
        if (c == '\'') {
          if (i + 1 < body.length && body.charAt(i + 1) == '\'') {
            cur += '\''; i += 1
          } else inQuote = false
        } else cur += c
      } else c match {
        case '\'' if inRow => inQuote = true; curIsQuoted = true
        case '(' if !inRow =>
          inRow = true; row = scala.collection.mutable.ArrayBuffer.empty
        case ',' if inRow => endField()
        case ')' if inRow =>
          endField(); rows += row.toSeq; inRow = false
        case _ => if (inRow && !c.isWhitespace) cur += c else ()
      }
      i += 1
    }
    rows.result()
  }

  /** Data-file name: `db.table.{9-digit seq}.sql` (dumpling layout). */
  def dataFileName(db: String, table: String, seq: Int): String =
    f"$db.$table.$seq%09d.sql"

  /** Fixture-side dump writer: one metadata file, a schema file, and one
    * INSERT statement per data file. Values must arrive pre-rendered as
    * SQL literals (quoted/escaped by the caller). */
  def writeDump(dir: String, db: String, table: String, schemaSql: String,
      meta: String, files: Seq[(Int, Seq[String])]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "metadata"), meta.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(dir, s"$db.$table-schema.sql"),
      schemaSql.getBytes(StandardCharsets.UTF_8))
    files.foreach { case (seq, rowLits) =>
      val stmt = s"/*!40101 SET NAMES binary*/;\n" +
        s"INSERT INTO `$table` VALUES\n" + rowLits.mkString(",\n") + ";\n"
      Files.write(Paths.get(dir, dataFileName(db, table, seq)),
        stmt.getBytes(StandardCharsets.UTF_8))
      ()
    }
  }

  /**
   * Production-side reader: every data file of (db, table) parses
   * distributed into (file_seq, c0…cN) string columns; the caller casts
   * per the schema file. One task per file batch.
   */
  def readDumpTable(spark: SparkSession, dir: String, db: String,
      table: String, nCols: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val prefix = s"$db.$table."
    val dataFiles = Files.list(Paths.get(dir)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith(prefix) && n.endsWith(".sql") && !n.contains("-schema")
      }
      .map(_.toString).toSeq.sorted
    val schema = StructType(StructField("file_seq", LongType, nullable = false) +:
      (0 until nCols).map(i => StructField(s"c$i", StringType, nullable = true)))
    val rows = spark.sparkContext
      .parallelize(dataFiles, math.max(1, math.min(dataFiles.size, 32)))
      .flatMap { path =>
        val name = Paths.get(path).getFileName.toString
        val seq = name.substring(prefix.length, name.length - 4).toLong
        val stmt = new String(Files.readAllBytes(Paths.get(path)),
          StandardCharsets.UTF_8)
        parseInsertValues(stmt).map(vals => Row.fromSeq(seq +: vals))
      }
    spark.createDataFrame(rows, schema)
  }
}
