package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The MySQL column-type model that drives the schema-GENERIC codec layer
 * (SURVEY.md §2.7): one [[ColumnSpec]] per column, from which every encoder
 * derives its per-column type metadata and value rendering — nothing in the
 * codec path is hard-wired to a fixed envelope anymore.
 *
 * Mirrors the reference's three type surfaces:
 *  - java.sql.Types ints for Canal's `sqlType` map, including the
 *    value-dependent unsigned promotion (pkg/sink/codec/internal/java.go
 *    MySQLType2JavaType + canal_entry.go getJavaSQLType:304-360);
 *  - MySQL protocol type bytes for Open Protocol's `t` field
 *    (cdc/model/sink.go column Type; public MySQL protocol constants);
 *  - Kafka-Connect field descriptors for the Debezium `schema` block
 *    (pkg/sink/codec/debezium/codec.go:100-470).
 *
 * Value conventions follow the reference mounter: by the time codecs see a
 * row, ENUM/SET are uint64 ordinals/bitmasks and BIT is a uint64
 * (cdc/entry/mounter.go:772-841) — so specs for those carry LongType
 * columns plus the member dictionary for name rendering.
 *
 * Every Spark rendering has a DuckDB twin in [[MySqlTypes.Sql]] — gate
 * oracles are GENERATED from the same spec list, keeping both engines in
 * lockstep by construction.
 */
final case class ColumnSpec(
    name: String,
    mysqlType: String, // declared type, lowercase, e.g. "varchar(32)"
    nullable: Boolean = true,
    isHandle: Boolean = false,
    unsigned: Boolean = false,
    members: Seq[String] = Nil) { // enum/set member names, 1-based order
  val base: String = mysqlType.trim.toLowerCase.takeWhile(_.isLetter)
  /** tinyint(1) is the MySQL bool idiom. */
  val isBool: Boolean = base == "bool" || base == "boolean" ||
    (base == "tinyint" && mysqlType.replaceAll("\\s", "").startsWith("tinyint(1)"))
  def sparkType: DataType =
    if (isBool) BooleanType else DdlParser.mysqlToSpark(mysqlType) match {
      case t if Seq("enum", "set", "bit").contains(base) => LongType // ordinals
      case t => t
    }
}

object MySqlTypes {

  private val blobBases = Set("binary", "varbinary", "tinyblob", "blob",
    "mediumblob", "longblob")
  private val textBases = Set("tinytext", "text", "mediumtext", "longtext")

  /** Declared DECIMAL(p,s) — value rendering coerces to the DECLARED
    * precision/scale (the registry schema is authoritative, whatever the
    * in-flight Spark decimal type is). */
  private def declDecimal(s: ColumnSpec): DecimalType = {
    val m = "\\((\\d+)(?:\\s*,\\s*(\\d+))?\\)".r.findFirstMatchIn(s.mysqlType)
    DecimalType(m.map(_.group(1).toInt).getOrElse(10),
      m.flatMap(x => Option(x.group(2))).map(_.toInt).getOrElse(0))
  }

  // ---- java.sql.Types (Canal sqlType) ---------------------------------

  /** Static java.sql.Types id (internal/java.go MySQLType2JavaType). */
  def javaSqlType(s: ColumnSpec): Int = s.base match {
    case _ if s.isBool => -6 // TINYINT carries MySQL bool
    case "tinyint" => -6
    case "smallint" => 5
    case "mediumint" | "int" | "integer" => 4
    case "bigint" => -5
    case "float" => 7 // REAL
    case "double" | "real" => 8
    case "decimal" | "numeric" => 3
    case "char" => 1
    case "varchar" => 12
    case b if textBases(b) => 2005 // CLOB
    case b if blobBases(b) => 2004 // BLOB
    case "date" => 91
    case "time" => 92
    case "datetime" | "timestamp" => 93
    case "year" => 12 // canal renders YEAR as VARCHAR
    case "enum" => 4 // ordinal → INTEGER
    case "set" => -7 // bitmask → BIT
    case "bit" => -7
    case "json" => 12
    case "vector" => 12 // TiDBVectorFloat32 renders as VARCHAR (java.go:146)
    case _ => 12
  }

  /**
   * Per-row sqlType with the canal unsigned promotion (getJavaSQLType):
   * an unsigned integer whose VALUE exceeds the signed max is promoted one
   * width up (tiny→SMALLINT, small→INTEGER, int→BIGINT, bigint→DECIMAL).
   */
  def javaSqlTypeCol(s: ColumnSpec, v: Column): Column = {
    val base = lit(javaSqlType(s))
    if (!s.unsigned) base
    else s.base match {
      case "tinyint" if !s.isBool => when(v > 127, 5).otherwise(base)
      case "smallint" => when(v > 32767, 4).otherwise(base)
      case "mediumint" | "int" | "integer" => when(v > 2147483647L, -5).otherwise(base)
      case "bigint" => when(v < 0, 3).otherwise(base) // uint64 overflow wraps negative
      case _ => base
    }
  }

  // ---- MySQL protocol type byte (Open Protocol `t`) -------------------

  /** Public MySQL protocol column type codes (mysql.Type* in the TiDB
    * parser; identical to the MySQL wire protocol's type bytes). */
  def mysqlTypeCode(s: ColumnSpec): Int = s.base match {
    case _ if s.isBool => 1 // TypeTiny
    case "tinyint" => 1
    case "smallint" => 2 // TypeShort
    case "mediumint" => 9 // TypeInt24
    case "int" | "integer" => 3 // TypeLong
    case "bigint" => 8 // TypeLonglong
    case "float" => 4
    case "double" | "real" => 5
    case "decimal" | "numeric" => 246 // TypeNewDecimal
    case "char" => 254 // TypeString
    case "varchar" => 15 // TypeVarchar
    case b if textBases(b) => 252 // TypeBlob (text = blob + charset)
    case b if blobBases(b) => 252
    case "date" => 10 // TypeDate
    case "time" => 11 // TypeDuration
    case "datetime" => 12
    case "timestamp" => 7
    case "year" => 13
    case "enum" => 247
    case "set" => 248
    case "bit" => 16
    case "json" => 245
    case "vector" => 225 // mysql.TypeTiDBVectorFloat32 (0xE1)
    case _ => 15
  }

  /** Open-protocol/dispatcher column flag bits (cdc/model/sink.go:61-85). */
  def columnFlags(s: ColumnSpec): Long = {
    var f = 0L
    if (blobBases(s.base) || s.base == "bit") f |= 1L // BinaryFlag
    if (s.isHandle) f |= 2L | 8L // HandleKeyFlag | PrimaryKeyFlag
    if (s.nullable) f |= 64L // NullableFlag
    if (s.unsigned) f |= 128L // UnsignedFlag
    f
  }

  // ---- value renderings ----------------------------------------------

  /** Names of set members present in bitmask `v`, comma-joined (MySQL SET
    * literal form). concat_ws skips null slots in BOTH engines, which is
    * exactly the membership behavior we need; a NULL bitmask stays NULL
    * (concat_ws would otherwise collapse it to ""). */
  private def setNames(s: ColumnSpec, v: Column): Column =
    when(v.isNotNull, concat_ws(",", s.members.zipWithIndex.map { case (m, i) =>
      when(v.bitwiseAND(1L << i) =!= 0, m)
    }: _*))

  // element_at with a NULL index is unreliable in Spark 4.1 (NPEs under
  // constant folding, wrong element under codegen) — guard explicitly.
  private def enumName(s: ColumnSpec, v: Column): Column =
    when(v.isNotNull, element_at(array(s.members.map(lit): _*), v.cast("int")))

  /** RFC-4648 base64: Spark's base64() wraps long output in MIME CRLFs —
    * strip to the single-line form every JSON codec (and DuckDB) uses. */
  private[graft] def b64(c: Column): Column =
    regexp_replace(base64(c), "[\\r\\n]", "")

  /**
   * TiDB `VectorFloat32.String()` form for an `array<float>` column:
   * `[e1,e2,...]`, each element the shortest decimal that round-trips
   * float32, rendered WITHOUT exponent (Go `strconv.FormatFloat('f',-1,32)`)
   * — `[1,2,3,4,5]`, `[1.1,-2,3.33]` (canal_entry_test.go:106). Every codec
   * renders vectors through this one string form (canal_entry.go:112,
   * debezium/codec.go:831, csv_message.go:366, internal/column.go:65).
   *
   * Both the JVM and DuckDB render float→string as shortest-round-trip
   * decimal, identical digits; the `.0` strip turns the whole-number `7.0`
   * into Go's `7`. Domain: plain-decimal range (|v| in [1e-3, 1e7) or 0) —
   * Java/DuckDB switch to exponent notation outside it, Go never does.
   * NULL vector stays NULL; elements of a TiDB vector are never NULL.
   *
   * Computed by the codegen'd [[graft.functions.VectorCodec]] kernel —
   * the interpreted `transform + regexp_replace` formulation would break
   * the encode scan's whole-stage-codegen span per element.
   */
  private[graft] def vecString(c: Column): Column =
    graft.functions.VectorCodec.vecToString(c)

  /**
   * Canal-JSON rendering (canal_entry.go formatValue:84-118): EVERY value
   * becomes a string — integers/ordinals via decimal formatting, floats by
   * shortest-round-trip, binary via ISO-8859-1 byte-to-char decode, bool
   * as 1/0 (MySQL tinyint semantics). NULL stays NULL (explicit JSON null).
   */
  def canalValue(s: ColumnSpec, c: Column): Column = s.base match {
    case _ if s.isBool => when(c, "1").when(!c, "0") // NULL stays NULL
    case b if blobBases(b) => decode(c, "ISO-8859-1")
    case "decimal" | "numeric" => c.cast(declDecimal(s)).cast("string")
    case "vector" => vecString(c) // canal_entry.go:112 v.String()
    case _ => c.cast("string") // numbers, dates, ordinals, text
  }

  /**
   * Native-typed JSON rendering for Open Protocol / Maxwell (internal/
   * column.go FromRowChangeColumn + FormatColumn): numbers stay numbers
   * (float widened to double — same JSON bytes), blob family → base64
   * string, enum/set/bit → their uint64, dates/times → formatted strings,
   * bool → 0/1 (mounter yields int64 for tinyint).
   */
  def nativeValue(s: ColumnSpec, c: Column): Column = s.base match {
    case _ if s.isBool => when(c, 1L).when(!c, 0L) // NULL stays NULL
    case b if blobBases(b) => b64(c)
    case "float" => c.cast("double")
    case "date" | "datetime" | "timestamp" | "time" => c.cast("string")
    case "decimal" | "numeric" => c.cast(declDecimal(s)).cast("string") // exact
    case "vector" => vecString(c) // internal/column.go:64-65 String()
    case _ => c
  }

  /**
   * Kafka-Connect typed rendering for the Debezium payload half
   * (debezium/codec.go:470-706): bool → boolean, date → epoch DAYS int32
   * (io.debezium.time.Date), datetime → epoch MILLIS int64
   * (io.debezium.time.Timestamp), decimal → double, enum → member NAME,
   * set → joined member names, bit → base64 bytes (io.debezium.data.Bits),
   * blob → base64, year → int.
   */
  def debeziumValue(s: ColumnSpec, c: Column): Column = s.base match {
    case _ if s.isBool => c
    case "date" => datediff(c, to_date(lit("1970-01-01")))
    case "datetime" | "timestamp" => (unix_timestamp(c) * 1000).cast("long")
    case "decimal" | "numeric" => c.cast("double")
    case "float" => c.cast("double")
    case "enum" => enumName(s, c)
    case "set" => setNames(s, c)
    case "bit" => b64(unhex(lpad(hex(c), 2, "0")))
    case b if blobBases(b) => b64(c)
    case "vector" => vecString(c) // debezium/codec.go:823-831 String()
    case _ => c
  }

  /** Kafka-Connect schema field descriptor for one column — the static
    * half of the Debezium envelope (debezium/codec.go:100-470). */
  def connectField(s: ColumnSpec): String = {
    val (tpe, logicalName, params) = s.base match {
      case _ if s.isBool => ("boolean", None, None)
      case "tinyint" => ("int16", None, None)
      case "smallint" => (if (s.unsigned) "int32" else "int16", None, None)
      case "mediumint" => ("int32", None, None)
      case "int" | "integer" => (if (s.unsigned) "int64" else "int32", None, None)
      case "bigint" => ("int64", None, None)
      case "float" => ("float", None, None)
      case "double" | "real" | "decimal" | "numeric" => ("double", None, None)
      case "date" => ("int32", Some("io.debezium.time.Date"), None)
      case "datetime" | "timestamp" => ("int64", Some("io.debezium.time.Timestamp"), None)
      case "time" => ("int64", Some("io.debezium.time.MicroTime"), None)
      case "year" => ("int32", Some("io.debezium.time.Year"), None)
      case "enum" => ("string", Some("io.debezium.data.Enum"),
        Some(s"""{"allowed":"${s.members.mkString(",")}"}"""))
      case "set" => ("string", Some("io.debezium.data.EnumSet"),
        Some(s"""{"allowed":"${s.members.mkString(",")}"}"""))
      case "bit" =>
        val len = "\\((\\d+)\\)".r.findFirstMatchIn(s.mysqlType)
          .map(_.group(1)).getOrElse("1")
        ("bytes", Some("io.debezium.data.Bits"), Some(s"""{"length":"$len"}"""))
      case "json" => ("string", Some("io.debezium.data.Json"), None)
      case "vector" => // debezium/codec.go:456-459
        ("string", Some("io.debezium.data.TiDBVectorFloat32"), None)
      case b if blobBases(b) => ("bytes", None, None)
      case _ => ("string", None, None)
    }
    val nm = logicalName.map(n => s""","name":"$n"""").getOrElse("")
    val pm = params.map(p => s""","parameters":$p""").getOrElse("")
    s"""{"type":"$tpe","optional":${s.nullable}$nm$pm,"field":"${s.name}"}"""
  }

  /** `columns` entry for the Simple protocol's BOOTSTRAP message
    * (pkg/sink/codec/simple/encoder.go schema lifecycle). */
  def simpleDataType(s: ColumnSpec): String = s.mysqlType.toUpperCase

  /**
   * Canal `mysqlType` map entry (utils/mysql_types.go GetMySQLType:25-33):
   * with `content-compatible` (fullType) the FULL declared type
   * ("varchar(32)", "decimal(12,2)" — GetTypeDesc); the reference DEFAULT
   * is the bare base name + unsigned suffix (TypeToStr +
   * withUnsigned4MySQLType — "varchar", "int unsigned", "enum").
   * Zerofill is not modeled ([[ColumnSpec]] carries no zerofill flag).
   */
  def mysqlTypeName(s: ColumnSpec, fullType: Boolean): String =
    if (fullType) s.mysqlType
    else s.base + (if (s.unsigned) " unsigned" else "")

  // ---- DuckDB twins ---------------------------------------------------

  /** DuckDB SQL renderings — keep branch-for-branch with the Column
    * builders above; oracles are generated from the same specs. */
  object Sql {
    def javaSqlType(s: ColumnSpec, vE: String): String = {
      val base = MySqlTypes.javaSqlType(s)
      if (!s.unsigned) base.toString
      else s.base match {
        case "tinyint" if !s.isBool => s"CASE WHEN $vE > 127 THEN 5 ELSE $base END"
        case "smallint" => s"CASE WHEN $vE > 32767 THEN 4 ELSE $base END"
        case "mediumint" | "int" | "integer" =>
          s"CASE WHEN $vE > 2147483647 THEN -5 ELSE $base END"
        case "bigint" => s"CASE WHEN $vE < 0 THEN 3 ELSE $base END"
        case _ => base.toString
      }
    }

    private def setNames(s: ColumnSpec, vE: String): String =
      s"CASE WHEN $vE IS NOT NULL THEN concat_ws(','" +
        s.members.zipWithIndex.map { case (m, i) =>
          s", CASE WHEN ($vE & ${1L << i}) <> 0 THEN '$m' END"
        }.mkString + ") END"

    private def enumName(s: ColumnSpec, vE: String): String =
      s.members.zipWithIndex.map { case (m, i) => s"WHEN ${i + 1} THEN '$m'" }
        .mkString(s"CASE CAST($vE AS INT) ", " ", " END")

    private def declDecimalSql(s: ColumnSpec): String = {
      val d = declDecimal(s)
      s"DECIMAL(${d.precision},${d.scale})"
    }

    /** DuckDB twin of [[MySqlTypes.vecString]] — same shortest-round-trip
      * digits, same `\.0$` strip; `||` propagates a NULL list to NULL. */
    private[graft] def vecString(e: String): String =
      s"('[' || array_to_string(list_transform($e, x -> " +
        """regexp_replace(CAST(x AS VARCHAR), '\.0$', '')), ',') || ']')"""

    def canalValue(s: ColumnSpec, e: String): String = s.base match {
      case _ if s.isBool => s"CASE WHEN $e THEN '1' WHEN NOT $e THEN '0' END"
      case b if blobBases(b) => s"decode($e)"
      case "decimal" | "numeric" =>
        s"CAST(CAST($e AS ${declDecimalSql(s)}) AS VARCHAR)"
      case "vector" => vecString(e)
      case _ => s"CAST($e AS VARCHAR)"
    }

    def nativeValue(s: ColumnSpec, e: String): String = s.base match {
      case _ if s.isBool => s"CASE WHEN $e THEN 1 WHEN NOT $e THEN 0 END"
      case b if blobBases(b) => s"to_base64($e)"
      case "float" => s"CAST($e AS DOUBLE)"
      case "date" | "datetime" | "timestamp" | "time" => s"CAST($e AS VARCHAR)"
      case "decimal" | "numeric" =>
        s"CAST(CAST($e AS ${declDecimalSql(s)}) AS VARCHAR)"
      case "vector" => vecString(e)
      case _ => e
    }

    def debeziumValue(s: ColumnSpec, e: String): String = s.base match {
      case _ if s.isBool => e
      case "date" => s"CAST($e - DATE '1970-01-01' AS INT)"
      case "datetime" | "timestamp" => s"CAST(epoch($e) * 1000 AS BIGINT)"
      case "decimal" | "numeric" | "float" => s"CAST($e AS DOUBLE)"
      case "enum" => enumName(s, e)
      case "set" => setNames(s, e)
      case "bit" => s"to_base64(from_hex(lpad(to_hex($e), 2, '0')))"
      case b if blobBases(b) => s"to_base64($e)"
      case "vector" => vecString(e)
      case _ => e
    }
  }

  // ---- registry / DDL bridge -----------------------------------------

  /** Build specs from a parsed DDL column list (DdlParser → registry →
    * codec config, the same flow the reference drives from TableInfo). */
  def fromColumnDef(d: DdlParser.ColumnDef, isHandle: Boolean = false,
                    members: Seq[String] = Nil): ColumnSpec =
    ColumnSpec(d.name, d.mysqlType.toLowerCase,
      nullable = d.nullable && !isHandle, isHandle = isHandle,
      unsigned = d.mysqlType.toLowerCase.contains("unsigned"),
      members = members)
}
