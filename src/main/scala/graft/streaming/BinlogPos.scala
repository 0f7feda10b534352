package graft.streaming

/**
 * DM's binlog position algebra (reference dm/pkg/binlog/position.go +
 * dm/pkg/utils/filename.go, relay.go): every resume/compare decision in
 * DM routes through these rules, including the relay-subdir suffix
 * encoding that disambiguates positions across master switches —
 * `mysql-bin.000003` under relay dir `<uuid>.000002` is stored as
 * `mysql-bin|000002.000003`:
 *
 *  - filenames are `base.seq` with EXACTLY one dot and a positive numeric
 *    sequence (ParseFilename, filename.go:63-80);
 *  - RealMySQLPos strips a VALID `|suffix` (positive integer, separator
 *    not at index 0, non-empty tail) back to the upstream name — an
 *    invalid suffix leaves the name untouched (position.go:93-113);
 *  - ExtractSuffix: 1 (the minimum) for empty or unsuffixed names
 *    (:115-131);
 *  - ExtractPos resolves (uuidWithSuffix, suffix, realPos) against the
 *    known relay subdirectories: a suffixed name must match one of them;
 *    a plain name adopts the LATEST (:135-180);
 *  - ComparePosition (:218-229) adjusts both sides, but when BOTH carry a
 *    suffix it compares the RAW names — and the underlying go-mysql
 *    Position.Compare is a plain STRING comparison (zero-padded sequences
 *    order correctly; an overflow past the padding width does not — that
 *    lexical behavior is faithful);
 *  - PositionFromStr parses `filename:pos` with a uint32 offset (:48-62).
 */
object BinlogPos {

  final case class Position(name: String, pos: Long)
  final case class Filename(baseName: String, seq: String, seqInt: Long)

  val MinRelaySubDirSuffix = 1

  /** ParseFilename: exactly one '.', positive numeric sequence. */
  def parseFilename(filename: String): Either[String, Filename] = {
    val parts = filename.split("\\.", -1)
    if (parts.length != 2) Left("ErrBinlogInvalidFilename")
    else parts(1).toLongOption match {
      case Some(seq) if seq > 0 => Right(Filename(parts(0), parts(1), seq))
      case _ => Left("ErrBinlogInvalidFilename")
    }
  }

  def constructFilename(base: String, seq: String): String = s"$base.$seq"

  /** ConstructFilenameWithUUIDSuffix: base|suffix.seq. */
  def withUuidSuffix(fn: Filename, suffix: String): String =
    s"${fn.baseName}|$suffix.${fn.seq}"

  def suffixIntToStr(id: Int): String = f"$id%06d"

  /** ParseRelaySubDir: `uuid.SSSSSS` (exactly 6 digits). */
  def parseRelaySubDir(uuid: String): Either[String, (String, Int)] = {
    val parts = uuid.split("\\.", -1)
    if (parts.length != 2 || parts(1).length != 6)
      Left("ErrRelayParseUUIDSuffix")
    else parts(1).toIntOption match {
      case Some(v) => Right((parts(0), v))
      case None => Left("ErrRelayParseUUIDSuffix")
    }
  }

  def getUuidBySuffix(uuids: Seq[String], suffix: String): String =
    uuids.find(_.endsWith("." + suffix)).getOrElse("")

  private def verifySuffix(s: String): Boolean =
    s.toLongOption.exists(_ > 0)

  /** RealMySQLPos: parse failure returns the input with the error. */
  def realMySQLPos(p: Position): (Position, Option[String]) =
    parseFilename(p.name) match {
      case Left(e) => (p, Some(e))
      case Right(fn) =>
        val sepIdx = fn.baseName.lastIndexOf('|')
        if (sepIdx > 0 && sepIdx + 1 < fn.baseName.length &&
          verifySuffix(fn.baseName.substring(sepIdx + 1)))
          (Position(constructFilename(fn.baseName.substring(0, sepIdx),
            fn.seq), p.pos), None)
        else (p, None)
    }

  /** ExtractSuffix: empty name = the minimum suffix. */
  def extractSuffix(name: String): Either[String, Int] =
    if (name.isEmpty) Right(MinRelaySubDirSuffix)
    else parseFilename(name).flatMap { fn =>
      val sepIdx = fn.baseName.lastIndexOf('|')
      if (sepIdx > 0 && sepIdx + 1 < fn.baseName.length)
        fn.baseName.substring(sepIdx + 1).toIntOption
          .toRight("ErrBinlogInvalidSuffix")
      else Right(MinRelaySubDirSuffix)
    }

  /** ExtractPos (position.go:135-180). */
  def extractPos(p: Position, uuids: Seq[String])
      : Either[String, (String, String, Position)] = {
    if (uuids.isEmpty) return Left("ErrBinlogExtractPosition: empty UUIDs")
    parseFilename(p.name) match {
      case Left(e) => Left(e)
      case Right(fn) =>
        val sepIdx = fn.baseName.lastIndexOf('|')
        if (sepIdx > 0 && sepIdx + 1 < fn.baseName.length) {
          val realBase = fn.baseName.substring(0, sepIdx)
          val suffix = fn.baseName.substring(sepIdx + 1)
          if (!verifySuffix(suffix))
            Left(s"ErrBinlogExtractPosition: invalid UUID suffix $suffix")
          else {
            val uuid = getUuidBySuffix(uuids, suffix)
            if (uuid.nonEmpty)
              Right((uuid, suffix,
                Position(constructFilename(realBase, fn.seq), p.pos)))
            else Left(s"ErrBinlogExtractPosition: UUID suffix $suffix not found")
          }
        } else {
          val latest = uuids.last
          parseRelaySubDir(latest).map { case (_, suffixInt) =>
            (latest, suffixIntToStr(suffixInt), p)
          }
        }
    }
  }

  /** go-mysql Position.Compare: plain string name compare, then pos. */
  def compareRaw(a: Position, b: Position): Int =
    if (a.name > b.name) 1
    else if (a.name < b.name) -1
    else java.lang.Long.compare(a.pos, b.pos)

  /** ComparePosition (:218-229): adjusted compare, except BOTH-suffixed
    * positions compare raw. */
  def compare(a: Position, b: Position): Int = {
    val (adjA, _) = realMySQLPos(a)
    val (adjB, _) = realMySQLPos(b)
    if (adjA.name != a.name && adjB.name != b.name) compareRaw(a, b)
    else compareRaw(adjA, adjB)
  }

  /** PositionFromStr: `filename:pos` with a uint32 offset. */
  def positionFromStr(s: String): Either[String, Position] = {
    val parts = s.split(":", -1)
    if (parts.length != 2) Left("ErrBinlogParsePosFromStr")
    else parts(1).toLongOption match {
      case Some(v) if v >= 0 && v <= 0xffffffffL =>
        Right(Position(parts(0), v))
      case _ => Left("ErrBinlogParsePosFromStr")
    }
  }
}
