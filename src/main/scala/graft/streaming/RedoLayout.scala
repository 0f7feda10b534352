package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The redo log's durable ON-DISK contract (SURVEY §2.11 W4 — the artifact a
 * DR user's `cdc redo apply` resumes from). [[graft.streaming.Redo]] carries
 * the replay ALGEBRA (q76/q111); this file pins the layout itself:
 *
 *  - log file naming, V1 (no namespace, pre-v6.1.0) and V2
 *    (`captureID_namespace_changefeedID_fileType_maxCommitTs_uuid.log`) —
 *    reference pkg/redo/config.go:252-262 and the writer's name generation
 *    at cdc/redo/writer/file/file.go:293-314;
 *  - the write→rotate lifecycle: an open file is named
 *    `…_<commitTsAtOpen>_<uuid>.log.tmp`, rotation closes it and RENAMES it
 *    to carry the max event commit ts among its contents
 *    (file.go:142-184, 258-264, 320-354, 366-373);
 *  - the etcd-WAL frame arithmetic: an 8-byte little-endian length field
 *    whose top byte carries the 8-alignment pad width
 *    (writer/writer.go:94-104, reader/file.go:370-382), with the writer's
 *    size accounting charging payload+pad but NOT the length field
 *    (file.go:167-183);
 *  - the meta lifecycle: flushed vs unflushed (checkpointTs, resolvedTs)
 *    with monotonic (CompareAndIncrease) updates, each flush writing a
 *    fresh uuid-named `…_meta_<uuid>.meta` then deleting its predecessor
 *    (cdc/redo/meta_manager.go:190-213, 385-471), init merging every meta
 *    on disk by the ParseMeta max rule (meta_manager.go:217-289,
 *    common/redo_meta.go:28-40);
 *  - GC: a closed `.log` of type row/ddl whose name ts is STRICTLY below
 *    the flushed checkpoint is deleted — `==` survives because the DDL may
 *    still execute in the owner (meta_manager.go:320-349, 516-549);
 *  - the reader's resume: merge all metas, select files whose name ts
 *    exceeds the checkpoint (`.tmp` always opens), decode frames, keep
 *    rows in (checkpointTs, resolvedTs] (reader/reader.go:146-237,
 *    reader/file.go:305-321).
 *
 * Spark-first deltas, stated: the reference sorts each downloaded file and
 * heap-merges k sorted streams on one node (reader/file.go:120-176,
 * reader/reader.go:326-400); here the decoded rows land in a DataFrame and
 * Spark's distributed sort/aggregation replaces the heap — the per-file
 * `.sort` artifact is a single-node implementation detail, not part of the
 * durable contract. The record payload is this engine's own envelope codec
 * (msgpack-style minimal encodings) rather than the reference's generated
 * msgp of model.RedoLog — the framing, naming and lifecycle around it are
 * the pinned contract.
 */
object RedoLayout {

  val LogExt = ".log"
  val TmpExt = ".tmp"
  val MetaExt = ".meta"
  val SortExt = ".sort"
  val MetaFileType = "meta"
  val RowFileType = "row"
  val DdlFileType = "ddl"
  val DefaultNamespace = "default"
  /** pkg/redo/config.go:33-35 — DefaultMaxLogSize = 64 MB. */
  val DefaultMaxLogSizeBytes: Long = 64L * 1024 * 1024

  /** V1 when the namespace is default (pre-v6.1.0 layout), V2 otherwise
    * (file.go:293-306; formats pkg/redo/config.go:252-258). */
  def logFileName(captureId: String, namespace: String, changefeedId: String,
      fileType: String, maxCommitTs: Long, uid: String): String =
    if (namespace == DefaultNamespace)
      s"${captureId}_${changefeedId}_${fileType}_${maxCommitTs}_$uid$LogExt"
    else
      s"${captureId}_${namespace}_${changefeedId}_${fileType}_${maxCommitTs}_$uid$LogExt"

  /** Meta names ALWAYS carry the namespace — even `default`
    * (meta_manager.go:551-559, RedoMetaFileFormat config.go:259-261). */
  def metaFileName(captureId: String, namespace: String, changefeedId: String,
      uid: String): String =
    s"${captureId}_${namespace}_${changefeedId}_${MetaFileType}_$uid$MetaExt"

  /** meta_manager.go:561-566. */
  def changefeedMatcher(namespace: String, changefeedId: String): String =
    if (namespace == DefaultNamespace) s"_${changefeedId}_"
    else s"_${namespace}_${changefeedId}_"

  /** meta_manager.go:568-573. */
  def deletedMarker(namespace: String, changefeedId: String): String =
    if (namespace == DefaultNamespace) s"delete_$changefeedId"
    else s"delete_${namespace}_$changefeedId"

  final case class ParsedLogName(commitTs: Long, fileType: String)

  /** pkg/redo/config.go:271-317: `.meta` short-circuits to (0, meta); a
    * `.sort` suffix is stripped first; non-log extensions parse to
    * (0, "") without error; V2 is recognized by its 6 underscore-separated
    * segments, V1 by 5. None = a malformed name (the reference errors). */
  def parseLogFileName(name: String): Option[ParsedLogName] = {
    def ext(n: String): String = {
      val i = n.lastIndexOf('.'); if (i < 0) "" else n.substring(i)
    }
    val n0 = if (ext(name) == SortExt) name.stripSuffix(SortExt) else name
    if (ext(n0) == MetaExt) return Some(ParsedLogName(0L, MetaFileType))
    if (ext(n0) != LogExt && ext(n0) != TmpExt) return Some(ParsedLogName(0L, ""))
    val parts = n0.split("_")
    val (ft, tsStr) =
      if (parts.length == 6) (parts(3), parts(4))
      else if (parts.length == 5) (parts(2), parts(3))
      else return None
    tsStr.toLongOption.map(ts => ParsedLogName(ts, ft))
  }

  /** ParseMeta's max rule over every meta file seen
    * (common/redo_meta.go:28-40). */
  def mergeMetas(metas: Seq[(Long, Long)]): (Long, Long) =
    metas.foldLeft((0L, 0L)) { case ((c, r), (mc, mr)) =>
      (math.max(c, mc), math.max(r, mr))
    }

  // ---------------------------------------------------------------- frames

  /** (lenField, padBytes): pad to 8-byte alignment, pad width in the low 3
    * bits of the MSB with 0x80 set (writer/writer.go:94-104). */
  def encodeFrameSize(dataBytes: Int): (Long, Int) = {
    var lenField = dataBytes.toLong
    val padBytes = (8 - (dataBytes % 8)) % 8
    if (padBytes != 0) lenField |= (0x80L | padBytes.toLong) << 56
    (lenField, padBytes)
  }

  /** (recBytes, padBytes) — reader/file.go:370-382. */
  def decodeFrameSize(lenField: Long): (Long, Long) = {
    val recBytes = lenField & ~(0xffL << 56)
    val padBytes = if (lenField < 0) (lenField >>> 56) & 0x7L else 0L
    (recBytes, padBytes)
  }

  /** Append one frame; returns the writer's size charge — payload + pad,
    * excluding the 8-byte length field (file.go:167-183: only the
    * rawData+pad write lands in w.size). */
  def writeFrame(out: java.io.OutputStream, payload: Array[Byte]): Long = {
    val (lenField, pad) = encodeFrameSize(payload.length)
    val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(lenField)
    out.write(buf.array())
    out.write(payload)
    if (pad > 0) out.write(new Array[Byte](pad))
    payload.length.toLong + pad
  }

  /** Decode frames until the bytes run out; a torn tail (truncated length
    * field, short payload, or an impossible record size) ends the iteration
    * silently — the reference treats the torn last entry as EOF
    * (reader/file.go:323-362, 384-409). */
  def readFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    var off = 0
    var torn = false
    while (!torn && off + 8 <= bytes.length) {
      val lenField = ByteBuffer.wrap(bytes, off, 8)
        .order(ByteOrder.LITTLE_ENDIAN).getLong
      val (rec, pad) = decodeFrameSize(lenField)
      if (rec < 0 || off + 8 + rec + pad > bytes.length) torn = true
      else {
        out += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + rec.toInt)
        off += 8 + rec.toInt + pad.toInt
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------- LogMeta codec

  /** Minimal-width msgpack uint, as msgp's AppendUint64 emits. */
  private def putUint(b: ArrayBuffer[Byte], v: Long): Unit = {
    require(v >= 0, s"redo meta ts must be non-negative: $v")
    if (v < 128L) b += v.toByte
    else if (v <= 0xffL) { b += 0xcc.toByte; b += v.toByte }
    else if (v <= 0xffffL) {
      b += 0xcd.toByte; b += (v >> 8).toByte; b += v.toByte
    } else if (v <= 0xffffffffL) {
      b += 0xce.toByte
      var i = 24; while (i >= 0) { b += (v >> i).toByte; i -= 8 }
    } else {
      b += 0xcf.toByte
      var i = 56; while (i >= 0) { b += (v >> i).toByte; i -= 8 }
    }
  }

  private def putStr(b: ArrayBuffer[Byte], s: String): Unit = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < 32) b += (0xa0 | bytes.length).toByte
    else if (bytes.length < 256) { b += 0xd9.toByte; b += bytes.length.toByte }
    else if (bytes.length < 65536) {
      // str16 — long ALTER statements routinely exceed 255 bytes; msgp's
      // full str family keeps the durable record intact (a str8-only
      // writer would wrap the length mod 256 and corrupt the DR artifact)
      b += 0xda.toByte
      b += (bytes.length >> 8).toByte; b += bytes.length.toByte
    } else {
      b += 0xdb.toByte
      var i = 24; while (i >= 0) { b += (bytes.length >> i).toByte; i -= 8 }
    }
    b ++= bytes
  }

  /** LogMeta as a 2-field msgpack map {checkpointTs, resolvedTs}, the
    * shape msgp generates for common/redo_meta.go's LogMeta. */
  def encodeMeta(checkpointTs: Long, resolvedTs: Long): Array[Byte] = {
    val b = ArrayBuffer.empty[Byte]
    b += 0x82.toByte
    putStr(b, "checkpointTs"); putUint(b, checkpointTs)
    putStr(b, "resolvedTs"); putUint(b, resolvedTs)
    b.toArray
  }

  private final class Cursor(bytes: Array[Byte]) {
    var off = 0
    def u8(): Int = { val v = bytes(off) & 0xff; off += 1; v }
    def uint(): Long = {
      val t = u8()
      if (t < 0x80) t.toLong
      else t match {
        case 0xcc => u8().toLong
        case 0xcd => (u8().toLong << 8) | u8()
        case 0xce => (0 until 4).foldLeft(0L)((a, _) => (a << 8) | u8())
        case 0xcf => (0 until 8).foldLeft(0L)((a, _) => (a << 8) | u8())
        case _ => throw new IllegalArgumentException(f"not a msgpack uint: 0x$t%02x")
      }
    }
    def str(): String = {
      val t = u8()
      val len =
        if (t >= 0xa0 && t <= 0xbf) t - 0xa0
        else if (t == 0xd9) u8()
        else if (t == 0xda) (u8() << 8) | u8()
        else if (t == 0xdb) (0 until 4).foldLeft(0)((a, _) => (a << 8) | u8())
        else throw new IllegalArgumentException(f"not a msgpack str: 0x$t%02x")
      val s = new String(bytes, off, len, "UTF-8"); off += len; s
    }
  }

  def decodeMeta(bytes: Array[Byte]): (Long, Long) = {
    val c = new Cursor(bytes)
    val head = c.u8()
    require((head & 0xf0) == 0x80, f"not a msgpack fixmap: 0x$head%02x")
    val fields = (0 until (head & 0x0f)).map(_ => c.str() -> c.uint()).toMap
    (fields.getOrElse("checkpointTs", 0L), fields.getOrElse("resolvedTs", 0L))
  }

  // ------------------------------------------------------------- writer

  /**
   * The rotating file writer (file.go:142-184, 320-373). An open file is
   * `…_<tsAtOpen>_<uid>.log.tmp`; close renames it to carry the max commit
   * ts among its events, drawing a FRESH uid (filePath() regenerates the
   * name — file.go:258-264, 308-314). Rotation fires when the UNPADDED
   * record length would overflow maxLogSize (file.go:157-161); a single
   * record larger than maxLogSize is rejected outright (ErrFileSizeExceed,
   * file.go:146-149).
   */
  final class LogWriter(dir: String, captureId: String, namespace: String,
      changefeedId: String, fileType: String,
      maxLogSizeBytes: Long = DefaultMaxLogSizeBytes,
      uidGen: () => String) {

    private var out: java.io.OutputStream = _
    private var tmpPath: Path = _
    private var size = 0L
    private var maxCommitTs = 0L
    private var eventCommitTs = 0L
    val closedFiles: ArrayBuffer[String] = ArrayBuffer.empty

    def advanceTs(commitTs: Long): Unit = eventCommitTs = commitTs

    def write(payload: Array[Byte]): Unit = {
      require(payload.length <= maxLogSizeBytes,
        s"record of ${payload.length} B exceeds max log size $maxLogSizeBytes")
      if (out == null) openNew()
      if (size + payload.length > maxLogSizeBytes) rotate()
      if (maxCommitTs < eventCommitTs) maxCommitTs = eventCommitTs
      size += writeFrame(out, payload)
    }

    def writeAt(commitTs: Long, payload: Array[Byte]): Unit = {
      advanceTs(commitTs); write(payload)
    }

    private def openNew(): Unit = {
      Files.createDirectories(Paths.get(dir))
      maxCommitTs = eventCommitTs
      tmpPath = Paths.get(dir, logFileName(captureId, namespace, changefeedId,
        fileType, eventCommitTs, uidGen()) + TmpExt)
      out = Files.newOutputStream(tmpPath)
      size = 0L
    }

    private def closeCurrent(): Unit = if (out != null) {
      out.flush(); out.close(); out = null
      val finalName = logFileName(captureId, namespace, changefeedId,
        fileType, maxCommitTs, uidGen())
      Files.move(tmpPath, Paths.get(dir, finalName),
        StandardCopyOption.REPLACE_EXISTING)
      closedFiles += finalName
    }

    private def rotate(): Unit = { closeCurrent(); openNew() }

    /** Close the current file (rename to its final name), if any. */
    def close(): Unit = closeCurrent()
  }

  // ------------------------------------------------------- meta manager

  /**
   * The owner-side meta lifecycle (meta_manager.go). Updates are monotonic
   * per field (CompareAndIncrease: a regressed ts is ignored, with the
   * resolved field checked first — meta_manager.go:190-206); a flush
   * happens only when an unflushed field moved past its flushed value
   * (maybeFlushMeta/prepareForFlushMeta, :385-426), writing a fresh
   * uuid-named meta and deleting the previous one (:433-471). GC removes
   * closed row/ddl logs with name ts strictly below the flushed
   * checkpoint (:320-349).
   */
  final class MetaManager(dir: String, captureId: String, namespace: String,
      changefeedId: String, uidGen: () => String) {

    private var unflushedCkpt = 0L
    private var unflushedRes = 0L
    private var flushedCkpt = 0L
    private var flushedRes = 0L
    private var preMetaFile: Option[Path] = None
    var flushCount = 0
    var ignoredUpdates = 0
    val removedLogs: ArrayBuffer[String] = ArrayBuffer.empty

    private def listNames(): Seq[String] = {
      val d = Paths.get(dir)
      if (!Files.exists(d)) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        val s = Files.list(d)
        try s.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
        finally s.close()
      }
    }

    /** Read every meta on disk, merge by the max rule seeded with
      * (startTs, startTs), flush the result, delete the walked metas
      * (meta_manager.go:217-289). */
    def initMeta(startTs: Long): Unit = {
      Files.createDirectories(Paths.get(dir))
      val old = listNames().filter(_.endsWith(MetaExt))
      val metas = (startTs, startTs) +: old.map(n =>
        decodeMeta(Files.readAllBytes(Paths.get(dir, n))))
      val (c, r) = mergeMetas(metas)
      require(c != 0 && r != 0,
        "checkpointTs or resolvedTs is 0 when initializing redo meta")
      unflushedCkpt = c; unflushedRes = r
      maybeFlush()
      old.foreach(n => Files.deleteIfExists(Paths.get(dir, n)))
    }

    /** UpdateMeta: resolved checked first, then checkpoint; a regressed
      * value is ignored and counted (meta_manager.go:190-206). */
    def update(checkpointTs: Long, resolvedTs: Long): Unit = {
      if (resolvedTs >= unflushedRes) unflushedRes = resolvedTs
      else ignoredUpdates += 1
      if (checkpointTs >= unflushedCkpt) unflushedCkpt = checkpointTs
      else ignoredUpdates += 1
    }

    def maybeFlush(): Boolean = {
      val hasChange =
        flushedCkpt < unflushedCkpt || flushedRes < unflushedRes
      if (!hasChange) false
      else {
        val p = Paths.get(dir,
          metaFileName(captureId, namespace, changefeedId, uidGen()))
        Files.write(p, encodeMeta(unflushedCkpt, unflushedRes))
        preMetaFile.filter(_ != p).foreach(Files.deleteIfExists)
        preMetaFile = Some(p)
        if (unflushedRes >= flushedRes) flushedRes = unflushedRes
        if (unflushedCkpt >= flushedCkpt) flushedCkpt = unflushedCkpt
        flushCount += 1
        true
      }
    }

    def flushedMeta: (Long, Long) = (flushedCkpt, flushedRes)

    /** meta_manager.go:320-349 — closed row/ddl logs of this changefeed
      * with name ts < checkpoint; `==` survives (the DDL may still execute
      * in the owner). */
    def shouldRemove(name: String, checkpointTs: Long): Boolean =
      name.contains(changefeedMatcher(namespace, changefeedId)) &&
        name.endsWith(LogExt) &&
        (parseLogFileName(name) match {
          case Some(ParsedLogName(ts, ft))
            if ft == RowFileType || ft == DdlFileType => ts < checkpointTs
          case _ => false
        })

    /** One bgGC pass at the current flushed checkpoint; returns removals. */
    def gc(): Seq[String] = {
      val removed = listNames().filter(shouldRemove(_, flushedCkpt))
      removed.foreach(n => Files.deleteIfExists(Paths.get(dir, n)))
      removedLogs ++= removed
      removed
    }

    /** Changefeed deletion: write the marker FIRST, then remove every
      * matching file (meta_manager.go:352-383). */
    def deleteAllLogs(): Unit = {
      Files.createDirectories(Paths.get(dir))
      val marker = deletedMarker(namespace, changefeedId)
      Files.write(Paths.get(dir, marker), "D".getBytes("UTF-8"))
      val matcher = changefeedMatcher(namespace, changefeedId)
      listNames().filter(n => n != marker && n.contains(matcher))
        .foreach(n => Files.deleteIfExists(Paths.get(dir, n)))
    }

    /** Startup sweep: if a delete marker exists, purge the matching files
      * and the marker (meta_manager.go:291-318). Returns whether it fired. */
    def preCleanup(): Boolean = {
      val marker = deletedMarker(namespace, changefeedId)
      if (!Files.exists(Paths.get(dir, marker))) false
      else {
        val matcher = changefeedMatcher(namespace, changefeedId)
        listNames().filter(n => n != marker && n.contains(matcher))
          .foreach(n => Files.deleteIfExists(Paths.get(dir, n)))
        Files.deleteIfExists(Paths.get(dir, marker))
        true
      }
    }
  }

  // ------------------------------------------------------- row payloads

  /** The engine's redo record: the CDC envelope row. */
  final case class RedoEnvelope(seq: Long, op: String, commit_ts: Long,
      start_ts: Long, source_id: Int, schema_name: String, table_name: String,
      pk: Long, pk_after: Long, val_before: Option[Double],
      val_after: Option[Double], etype: String)

  /** Envelope payload codec: a 12-slot msgpack array (minimal uints,
    * fixstr/str8, float64, nil) — this engine's counterpart of the
    * reference's msgp-generated model.RedoLog payload. */
  object RedoRowCodec {
    private def putDoubleOpt(b: ArrayBuffer[Byte], v: Option[Double]): Unit =
      v match {
        case None => b += 0xc0.toByte
        case Some(d) =>
          b += 0xcb.toByte
          val bits = java.lang.Double.doubleToLongBits(d)
          var i = 56; while (i >= 0) { b += (bits >> i).toByte; i -= 8 }
      }

    def encode(e: RedoEnvelope): Array[Byte] = {
      val b = ArrayBuffer.empty[Byte]
      b += 0x9c.toByte // fixarray(12)
      putUint(b, e.seq); putStr(b, e.op)
      putUint(b, e.commit_ts); putUint(b, e.start_ts)
      putUint(b, e.source_id.toLong)
      putStr(b, e.schema_name); putStr(b, e.table_name)
      putUint(b, e.pk); putUint(b, e.pk_after)
      putDoubleOpt(b, e.val_before); putDoubleOpt(b, e.val_after)
      putStr(b, e.etype)
      b.toArray
    }

    def decode(bytes: Array[Byte]): RedoEnvelope = {
      val c = new Cursor(bytes)
      val head = c.u8()
      require(head == 0x9c, f"not a 12-slot redo envelope: 0x$head%02x")
      def dOpt(): Option[Double] = {
        val t = c.u8()
        if (t == 0xc0) None
        else {
          require(t == 0xcb, f"not a msgpack float64: 0x$t%02x")
          val bits = (0 until 8).foldLeft(0L)((a, _) => (a << 8) | c.u8())
          Some(java.lang.Double.longBitsToDouble(bits))
        }
      }
      RedoEnvelope(c.uint(), c.str(), c.uint(), c.uint(), c.uint().toInt,
        c.str(), c.str(), c.uint(), c.uint(), dOpt(), dOpt(), c.str())
    }
  }

  /** The DDL redo record (model/sink.go:288-293 RedoDDLEvent: the DDL
    * event + its type byte + the affected table). */
  final case class RedoDdl(commit_ts: Long, start_ts: Long,
      schema_name: String, table_name: String, query: String, ddl_type: Int)

  /** DDL payload codec: a 6-slot msgpack array, same primitive vocabulary
    * as [[RedoRowCodec]]. */
  object RedoDdlCodec {
    def encode(d: RedoDdl): Array[Byte] = {
      val b = ArrayBuffer.empty[Byte]
      b += 0x96.toByte // fixarray(6)
      putUint(b, d.commit_ts); putUint(b, d.start_ts)
      putStr(b, d.schema_name); putStr(b, d.table_name)
      putStr(b, d.query); putUint(b, d.ddl_type.toLong)
      b.toArray
    }

    def decode(bytes: Array[Byte]): RedoDdl = {
      val c = new Cursor(bytes)
      val head = c.u8()
      require(head == 0x96, f"not a 6-slot redo ddl: 0x$head%02x")
      RedoDdl(c.uint(), c.uint(), c.str(), c.str(), c.str(), c.uint().toInt)
    }
  }

  // ------------------------------------------------------------- reader

  object Reader {

    /** Merge every meta in the dir (reader/reader.go:262-309); resolved
      * below checkpoint is the reference's panic. */
    def readMeta(dir: String): (Long, Long) = {
      val d = Paths.get(dir)
      require(Files.exists(d), s"no redo dir: $dir")
      import scala.jdk.CollectionConverters._
      val s = Files.list(d)
      val metas =
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(MetaExt)).toSeq.sorted
          .map(n => decodeMeta(Files.readAllBytes(Paths.get(dir, n))))
        finally s.close()
      require(metas.nonEmpty, s"no redo meta file found in $dir")
      val (c, r) = mergeMetas(metas)
      require(r >= c,
        s"in all meta files, resolvedTs $r is less than checkpointTs $c")
      (c, r)
    }

    /** reader/file.go:305-321 — type must match; `.tmp` always opens; a
      * closed log opens when its name ts (the max event ts inside) exceeds
      * startTs. */
    def shouldOpen(startTs: Long, name: String, fixedType: String): Boolean =
      parseLogFileName(name) match {
        case None => false
        case Some(p) =>
          if (p.fileType != fixedType) false
          else if (name.endsWith(TmpExt)) true
          else p.commitTs > startTs
      }

    def selectFiles(dir: String, fileType: String, startTs: Long): Seq[String] = {
      val d = Paths.get(dir)
      if (!Files.exists(d)) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        val s = Files.list(d)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(shouldOpen(startTs, _, fileType)).toSeq.sorted
        finally s.close()
      }
    }

    /**
     * Resume read: meta window + file selection + distributed frame decode.
     * Each selected file decodes in a task (files are ≤ maxLogSize, i.e.
     * bounded memory per task); rows beyond (checkpointTs, resolvedTs] are
     * dropped exactly as the reference's boundary filter
     * (reader/reader.go:199-219). The reference's per-file sort + k-way
     * heap merge collapses into Spark's shuffle sort downstream when a
     * consumer orders by (commit_ts, start_ts) — ordering is the
     * CONSUMER's plan here, not a reader-side single-node pass.
     */
    def readRows(spark: SparkSession, dir: String): DataFrame = {
      val (ckpt, resolved) = readMeta(dir)
      val files = selectFiles(dir, RowFileType, ckpt)
        .map(n => Paths.get(dir, n).toAbsolutePath.toString)
      import spark.implicits._
      val decoded = spark.createDataset(files)
        .repartition(math.max(1, math.min(files.size, 32)))
        .flatMap { path =>
          val bytes = Files.readAllBytes(Paths.get(path))
          readFrames(bytes).map(RedoRowCodec.decode)
        }
      decoded.toDF()
        .filter(col("commit_ts") > ckpt && col("commit_ts") <= resolved)
    }

    /**
     * Resume the DDL stream. The reference's DDL reader widens the window
     * by ONE TICK on the left — startTs = checkpointTs - 1
     * (reader/reader.go:160-172) — so a DDL committed EXACTLY at the
     * checkpoint replays: it may not have executed in the owner yet, the
     * same reasoning that makes GC keep `==` files. DDL volume is
     * control-plane-sized; decode on the driver, sorted by commit ts.
     */
    def readDdls(dir: String): Seq[RedoDdl] = {
      val (ckpt, resolved) = readMeta(dir)
      val startTs = ckpt - 1
      selectFiles(dir, DdlFileType, startTs)
        .flatMap(n => readFrames(Files.readAllBytes(Paths.get(dir, n))))
        .map(RedoDdlCodec.decode)
        .filter(d => d.commit_ts > startTs && d.commit_ts <= resolved)
        .sortBy(d => (d.commit_ts, d.start_ts))
    }
  }
}
