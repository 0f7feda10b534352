package graft.functions

/**
 * Debezium per-column field SCHEMA + VALUE rendering (SURVEY §2.6 E5 —
 * the type matrix behind the envelope q41/q122/q226 already pin):
 * reference pkg/sink/codec/debezium/codec.go
 * `writeDebeziumFieldSchema` (:88-472) and `writeDebeziumFieldValue`
 * (:477-837) — ~750 LoC of per-MySQL-type switches implementing
 * Debezium's documented MySQL connector mapping:
 *
 *  - BIT(1) → boolean; BIT(n>1) → bytes + io.debezium.data.Bits with a
 *    `length` parameter, value = little-endian ceil(n/8) bytes, base64.
 *  - char/varchar/blob family → schema `string`; binary-flagged values
 *    render base64 (BINARY(n) values arrive NUL-padded from storage).
 *  - ENUM → io.debezium.data.Enum with `allowed` (options escaped:
 *    `,`→`\,`, quotes unwrapped — common/helper.go:323-328); an invalid
 *    member renders "" (non-strict-mode insert). SET → EnumSet,
 *    `allowed` unescaped; invalid member → "".
 *  - DATE → int32 io.debezium.time.Date, value = epoch DAYS (negative
 *    before 1970); zero-dates render null (or 0 under NOT NULL).
 *  - DATETIME → int64 Timestamp (fsp ≤ 3, epoch millis) /
 *    MicroTimestamp (fsp ≥ 4, epoch micros), fractional seconds
 *    ROUNDED to fsp; the two-digit-year windows <70→+2000, <100→+1900.
 *  - TIMESTAMP → string io.debezium.time.ZonedTimestamp:
 *    `yyyy-MM-ddTHH:mm:ss[.f{fsp}]Z` in UTC, fraction = the %06d micros
 *    prefix of length fsp.
 *  - TIME → int64 io.debezium.time.MicroTime (signed micros).
 *  - YEAR → int32 io.debezium.time.Year with the same year windows.
 *  - TINYINT → int16; SMALLINT → int16/int32 (unsigned); MEDIUMINT →
 *    int32; INT → int32/int64 (unsigned); BIGINT → int64 — values
 *    OUTSIDE the column type's range clamp to -1, and uint64 max
 *    itself clamps to -1 (codec.go:749-807).
 *  - FLOAT → `float` (a declared (M,D) upgrades it to double);
 *    DOUBLE / DECIMAL / NUMERIC → `double`, values as parsed floats
 *    (FLOAT through float32 precision).
 *  - JSON → string io.debezium.data.Json; TiDB VECTOR → string
 *    io.debezium.data.TiDBVectorFloat32 (the one logical type WITHOUT
 *    a version field).
 *  - `optional` = NOT NULL absent, everywhere.
 *
 * Gate q305 replays the reference's OWN golden contract — testdata/
 * datatype.{ddl.sql,dml.sql,dbz.json} — field by field; nothing from
 * the expected document is re-typed.
 */
object DebeziumFields {

  final case class FieldSpec(name: String, tpe: String, flen: Int = -1,
      fsp: Int = -1, elems: Seq[String] = Nil, notNull: Boolean = false,
      unsigned: Boolean = false, binary: Boolean = false,
      zerofill: Boolean = false, charset: String = "")

  /** The schema-entry facts (everything but the `field` name itself):
    * version 0 / name "" stand for absent. */
  final case class FieldSchema(schType: String, optional: Boolean,
      logicalName: String, version: Int, params: String)

  /** common/helper.go:323-328. */
  def escapeEnumOption(option: String): String =
    option.replace(",", "\\,").replace("\\'", "'").replace("''", "'")

  /** writeDebeziumFieldSchema (codec.go:88-472). */
  def fieldSchema(f: FieldSpec): FieldSchema = {
    val opt = !f.notNull
    f.tpe match {
      case "bit" =>
        if (f.flen == 1) FieldSchema("boolean", opt, "", 0, "")
        else FieldSchema("bytes", opt, "io.debezium.data.Bits", 1,
          f.flen.toString)
      case "varchar" | "string" | "blob" =>
        FieldSchema("string", opt, "", 0, "")
      case "enum" =>
        FieldSchema("string", opt, "io.debezium.data.Enum", 1,
          f.elems.map(escapeEnumOption).mkString(","))
      case "set" =>
        FieldSchema("string", opt, "io.debezium.data.EnumSet", 1,
          f.elems.mkString(","))
      case "date" =>
        FieldSchema("int32", opt, "io.debezium.time.Date", 1, "")
      case "datetime" =>
        FieldSchema("int64", opt,
          if (f.fsp <= 3) "io.debezium.time.Timestamp"
          else "io.debezium.time.MicroTimestamp", 1, "")
      case "timestamp" =>
        FieldSchema("string", opt, "io.debezium.time.ZonedTimestamp", 1, "")
      case "time" =>
        FieldSchema("int64", opt, "io.debezium.time.MicroTime", 1, "")
      case "year" =>
        FieldSchema("int32", opt, "io.debezium.time.Year", 1, "")
      case "tiny" => FieldSchema("int16", opt, "", 0, "")
      case "short" =>
        FieldSchema(if (f.unsigned) "int32" else "int16", opt, "", 0, "")
      case "int24" => FieldSchema("int32", opt, "", 0, "")
      case "long" =>
        FieldSchema(if (f.unsigned) "int64" else "int32", opt, "", 0, "")
      case "longlong" => FieldSchema("int64", opt, "", 0, "")
      case "float" =>
        FieldSchema(if (f.fsp != -1) "double" else "float", opt, "", 0, "")
      case "double" | "newdecimal" => FieldSchema("double", opt, "", 0, "")
      case "json" =>
        FieldSchema("string", opt, "io.debezium.data.Json", 1, "")
      case "vector" =>
        FieldSchema("string", opt, "io.debezium.data.TiDBVectorFloat32", 0, "")
      case other =>
        throw new IllegalArgumentException(s"unsupported field type $other")
    }
  }

  // ---- value rendering (JSON scalar TEXT) --------------------------------

  private[functions] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def base64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)

  /** getBitFromUint64: n bits little-endian, ceil(n/8) bytes. */
  def bitBytes(n: Int, v: Long): Array[Byte] = {
    val numBytes = (n + 7) / 8
    Array.tabulate(numBytes)(i => ((v >>> (8 * i)) & 0xff).toByte)
  }

  /** The two-digit-year window (codec.go date/datetime/year legs). */
  private def windowYear(y: Int): Int =
    if (y < 70) y + 2000 else if (y < 100) y + 1900 else y

  private val DtRe =
    """^(\d{1,4})-(\d{1,2})-(\d{1,2})[ T](\d{1,2}):(\d{1,2}):(\d{1,2})(?:\.(\d{1,6}))?$""".r
  private val TimeRe = """^(-?)(\d{1,3}):(\d{1,2}):(\d{1,2})(?:\.(\d{1,6}))?$""".r

  private def microsOf(frac: String): Long =
    if (frac == null) 0L else (frac + "0" * (6 - frac.length)).toLong

  /** Round total micros to fsp digits (MySQL half-up). */
  private def roundToFsp(totalMicros: Long, fsp: Int): Long = {
    val unit = math.pow(10, 6 - math.max(fsp, 0)).toLong
    val q = Math.floorDiv(totalMicros, unit)
    val r = totalMicros - q * unit
    (if (2 * r >= unit) q + 1 else q) * unit
  }

  /** Right(Some(micros)) for a real datetime, Right(None) for a MySQL
    * zero-date (parses but has no Go time — the reference's GoTime
    * error leg), Left for garbage StrToDateTime would REJECT
    * (the reference raises ErrDebeziumEncodeFailed there, codec.go:644-648
    * — masking bad input as epoch/null would hide corruption). */
  private def parseDatetimeUtc(v: String, fsp: Int)
      : Either[String, Option[Long]] =
    v match {
      case DtRe(y, mo, d, h, mi, s, frac) =>
        if (mo.toInt == 0 || d.toInt == 0) Right(None) // zero-date
        else try {
          val ldt = java.time.LocalDateTime.of(windowYear(y.toInt), mo.toInt,
            d.toInt, h.toInt, mi.toInt, s.toInt)
          val total = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            microsOf(frac)
          Right(Some(roundToFsp(total, fsp)))
        } catch {
          case _: java.time.DateTimeException =>
            Left(s"unparseable datetime: $v")
        }
      case _ => Left(s"unparseable datetime: $v")
    }

  /**
   * writeDebeziumFieldValue (codec.go:477-837) over the column's
   * rendered source value — returns the JSON scalar TEXT of the field
   * value (`null` for NULL). `fsp` carries the column's declared
   * fractional precision where relevant.
   */
  def fieldValue(f: FieldSpec, raw: Option[String]): String = {
    val value = raw.getOrElse(return "null")
    f.tpe match {
      case "bit" =>
        val v = java.lang.Long.parseLong(value)
        if (f.flen == 1) (v != 0).toString
        else jsonStr(base64(bitBytes(f.flen, v)))
      case "varchar" | "string" | "blob" =>
        if (!f.binary) jsonStr(value)
        else {
          // BINARY(n) values arrive NUL-padded from storage
          val b = value.getBytes("UTF-8")
          val padded =
            if (f.tpe == "string" && f.flen > b.length)
              b ++ Array.fill[Byte](f.flen - b.length)(0)
            else b
          jsonStr(base64(padded))
        }
      case "enum" =>
        jsonStr(if (f.elems.contains(value)) value else "")
      case "set" =>
        val members = value.split(",", -1).toSeq
        jsonStr(
          if (value.nonEmpty && members.forall(f.elems.contains)) value
          else "")
      case "newdecimal" => value.toDouble.toString
      case "date" =>
        try {
          val d = java.time.LocalDate.parse(value)
          val windowed = d.withYear(windowYear(d.getYear))
          windowed.toEpochDay.toString
        } catch {
          case _: java.time.format.DateTimeParseException =>
            if (f.notNull) "0" else "null"
        }
      case "datetime" =>
        if (value == "CURRENT_TIMESTAMP") return "0" // codec.go:640-643
        parseDatetimeUtc(value, math.max(f.fsp, 0)) match {
          case Left(e) => throw new IllegalArgumentException(e)
          case Right(None) => if (f.notNull) "0" else "null"
          case Right(Some(micros)) =>
            if (math.max(f.fsp, 0) <= 3) (micros / 1000L).toString
            else micros.toString
        }
      case "timestamp" if value == "CURRENT_TIMESTAMP" => // codec.go:691-698
        if (f.notNull) jsonStr("1970-01-01T00:00:00Z") else "null"
      case "timestamp" =>
        // config tz pinned UTC (the golden's session) — render ...Z.
        // A zero-date or below-MinTimestamp value WITH a row value
        // renders the epoch string; only a nil-sourced value (raw=None,
        // handled at the top) renders null (codec.go:705-712 keys on
        // col.Value == nil, NOT on the NOT NULL flag).
        parseDatetimeUtc(value, math.max(f.fsp, 0)) match {
          case Left(e) => throw new IllegalArgumentException(e)
          case Right(maybeMicros) =>
            // MinTimestamp is 1970-01-01 00:00:01 (types.MinTimestamp)
            val belowMin = maybeMicros.forall(_ < 1000000L)
            if (belowMin) jsonStr("1970-01-01T00:00:00Z")
            else {
              val micros = maybeMicros.get
              val sec = Math.floorDiv(micros, 1000000L)
              val us = micros - sec * 1000000L
              val base = java.time.LocalDateTime
                .ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)
                .format(java.time.format.DateTimeFormatter
                  .ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
              val fsp = math.max(f.fsp, 0)
              val fracPart =
                if (fsp > 0) "." + f"$us%06d".take(fsp) else ""
              jsonStr(base + fracPart + "Z")
            }
        }
      case "time" =>
        value match {
          case TimeRe(sign, h, m, s, frac) =>
            val total = (h.toLong * 3600 + m.toLong * 60 + s.toLong) *
              1000000L + microsOf(frac)
            val rounded = roundToFsp(total, math.max(f.fsp, 0))
            ((if (sign == "-") -1 else 1) * rounded).toString
          case _ => "null"
        }
      case "year" =>
        val y = value.toDouble.toInt
        windowYear(y).toString
      case "tiny" | "short" | "int24" | "long" | "longlong" =>
        val v = BigInt(value)
        val (lo, hi): (BigInt, BigInt) =
          if (f.unsigned) (BigInt(0), (BigInt(1) << bits(f.tpe)) - 1)
          else (-(BigInt(1) << (bits(f.tpe) - 1)),
            (BigInt(1) << (bits(f.tpe) - 1)) - 1)
        // uint64 MAX itself clamps (codec.go:763); everything else only
        // clamps when actually outside the column type's range
        val clamp =
          if (f.unsigned && f.tpe == "longlong" && v == hi) true
          else v < lo || v > hi
        if (clamp) "-1" else v.toString
      case "float" => value.toFloat.toString
      case "double" => value.toDouble.toString
      case "json" => jsonStr(value)
      case "vector" => jsonStr(value)
      case other =>
        throw new IllegalArgumentException(s"unsupported field type $other")
    }
  }

  private def bits(tpe: String): Int = tpe match {
    case "tiny" => 8
    case "short" => 16
    case "int24" => 24
    case "long" => 32
    case "longlong" => 64
    case _ => throw new IllegalArgumentException(tpe)
  }

  // ---- DDL tableChanges column extractors (codec.go:1301-1392 +
  // helper.go:119-240 + internal/java.go:155-230) --------------------------

  /** MySQLType2JdbcType (internal/java.go:155-230) — NOT the Canal map
    * ([[graft.core.MySqlTypes.javaSqlType]] / MySQLType2JavaType):
    * Debezium sends TINYINT as SMALLINT, YEAR as INTEGER, TIMESTAMP as
    * TIMESTAMP_WITH_TIMEZONE, ENUM/SET as CHAR, FLOAT as FLOAT (6, not
    * REAL 7). java.sql.Types ids. */
  def jdbcType(tpe: String, binary: Boolean): Int = tpe match {
    case "tiny" | "short" => 5 // SMALLINT
    case "long" | "int24" | "year" => 4 // INTEGER
    case "float" => 6 // FLOAT
    case "double" => 8
    case "newdecimal" => 3 // DECIMAL
    case "timestamp" => 2014 // TIMESTAMP_WITH_TIMEZONE
    case "datetime" => 93 // TIMESTAMP
    case "longlong" => -5 // BIGINT
    case "date" => 91
    case "time" => 92
    case "enum" | "set" => 1 // CHAR
    case "blob" => if (binary) 2004 else 12 // BLOB / VARCHAR
    case "varchar" => if (binary) -3 else 12 // VARBINARY / VARCHAR
    case "string" => if (binary) -2 else 1 // BINARY / CHAR
    case "bit" => -7
    case "json" => 1111 // OTHER
    case "vector" => 12
    case other => throw new IllegalArgumentException(other)
  }

  /** types.TypeToStr with the binary-charset renames. */
  def typeToStr(tpe: String, binary: Boolean): String = tpe match {
    case "tiny" => "tinyint"
    case "short" => "smallint"
    case "int24" => "mediumint"
    case "long" => "int"
    case "longlong" => "bigint"
    case "newdecimal" => "decimal"
    case "varchar" => if (binary) "varbinary" else "varchar"
    case "string" => if (binary) "binary" else "char"
    case "blob" => if (binary) "blob" else "text"
    case "time" => "time"
    case other => other
  }

  /** mysql.GetDefaultFieldLengthAndDecimal's flen, for the types the
    * length rule compares against (MySQL display widths). */
  def defaultFlen(tpe: String): Int = tpe match {
    case "tiny" => 4
    case "short" => 6
    case "int24" => 9
    case "long" => 11
    case "longlong" => 20
    case "float" => 12
    case "double" => 22
    case "bit" => 1
    case "string" => 1
    case "varchar" => 5
    case _ => -1
  }

  /** getLen (helper.go:131-161). */
  def lenOf(f: FieldSpec): Option[Int] = f.tpe match {
    case "timestamp" | "time" | "datetime" => Some(f.fsp)
    case "bit" | "varchar" | "string" | "vector" | "longlong" | "float" |
         "double" =>
      if (f.flen != defaultFlen(f.tpe)) Some(f.flen) else None
    case "tiny" | "short" | "int24" | "long" =>
      var d = defaultFlen(f.tpe)
      if (f.unsigned) d -= 1
      if (f.tpe == "tiny" && f.zerofill) d += 1
      if (f.flen != d) Some(f.flen) else None
    case "year" | "newdecimal" => Some(f.flen)
    case "set" => Some(2 * f.elems.length - 1)
    case "enum" => Some(1)
    case _ => None
  }

  /** getScale (helper.go:163-169) — a -1 scale renders null upstream
    * (codec.go:1376-1381). */
  def scaleOf(f: FieldSpec): Option[Int] = f.tpe match {
    case "newdecimal" | "float" | "double" if f.fsp != -1 => Some(f.fsp)
    case _ => None
  }

  /** getCharset (helper.go:119-129): the binary charset reads empty. */
  def charsetOf(f: FieldSpec): String =
    if (f.charset == "binary") ""
    else f.tpe match {
      case "timestamp" | "time" | "newdecimal" | "string" | "varchar" |
           "blob" | "enum" | "set" => f.charset
      case _ => ""
    }

  /** getSuffix (helper.go:171-212) for the types the gate exercises. */
  private def suffixOf(f: FieldSpec): String = f.tpe match {
    case "double" =>
      // a non-default, non-zero declared decimal makes (M,D) visible
      if (f.fsp != -1 && f.fsp != 0)
        s"(${if (f.flen == -1) defaultFlen("double") else f.flen},${f.fsp})"
      else ""
    case "vector" if f.flen != -1 => s"(${f.flen})"
    case _ => ""
  }

  /** getExpressionAndName (helper.go:214-229) → (expression, name). */
  def expressionAndName(f: FieldSpec): (String, String) = {
    val prefix = typeToStr(f.tpe, f.binary).toUpperCase
    f.tpe match {
      case "year" | "bit" | "varchar" | "string" | "newdecimal" =>
        (prefix, prefix)
      case _ =>
        val cs = prefix + suffixOf(f)
        val suf =
          if (f.zerofill) " UNSIGNED ZEROFILL"
          else if (f.unsigned) " UNSIGNED"
          else ""
        (cs + suf, prefix + suf)
    }
  }

  /** getTiDBType (helper.go:231-241). */
  def tidbType(f: FieldSpec): String = {
    val base = typeToStr(f.tpe, f.binary)
    f.tpe match {
      case "year" | "bit" | "varchar" | "string" | "newdecimal" => base
      case _ => if (f.unsigned) base + " unsigned" else base
    }
  }

  /** The tableChanges id render (codec.go:1280-1295): a rename
    * concatenates `"old-db"."old-table","new-db"."new-table"` —
    * PreTableInfo FIRST. */
  def tableChangeId(db: String, table: String,
      pre: Option[(String, String)]): String = pre match {
    case Some((pdb, ptable)) =>
      s""""$pdb"."$ptable","$db"."$table""""
    case None => s""""$db"."$table""""
  }

  /** defaultValueExpression (codec.go:1326-1344): CURRENT_TIMESTAMP
    * renders the epoch string, `<nil>` renders null (None here), a bit
    * default renders its parseBit form (the raw bit-literal digits). */
  def defaultValueExpression(tpe: String, default: Option[String],
      bitFlen: Int = -1): Option[String] = default.map { v =>
    if (v.toUpperCase == "CURRENT_TIMESTAMP") "1970-01-01 00:00:00"
    else if (tpe == "bit" && bitFlen > 0) v // parseBit form passes through
    else v
  }

  /** The generated/autoIncremented flag pair (codec.go:1383-1388): an
    * ON UPDATE CURRENT_TIMESTAMP column whose jdbc type is
    * TIMESTAMP_WITH_TIMEZONE reads as auto-incremented AND generated. */
  def autoIncrementedFlag(tpe: String, binary: Boolean,
      autoIncrement: Boolean, onUpdateNow: Boolean): Boolean =
    autoIncrement || (onUpdateNow && jdbcType(tpe, binary) == 2014)
}
