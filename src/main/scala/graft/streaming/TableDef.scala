package graft.streaming

import graft.core.ColumnSpec

/**
 * Storage-sink schema sidecar — the reference's `TableDefinition`
 * (pkg/sink/cloudstorage/table_definition.go:39-49,183-192,283-327):
 * the `schema_{tableVersion}_{checksum:010d}.json` file a consumer reads
 * to interpret the data files under `<schema>/<table>/<version>/`.
 *
 * Byte-layout contract reproduced here:
 *  - `marshalWithQuery` = Go `json.MarshalIndent(def, "", "    ")` over
 *    the struct field order `Table, Schema, Version, TableVersion, Query,
 *    Type, TableColumns, TableColumnsTotal`; per-column field order
 *    `ColumnId?, ColumnName, ColumnType, ColumnDefault?, ColumnPrecision?,
 *    ColumnScale?, ColumnNullable?, ColumnIsPk?` (omitempty on all but
 *    name/type). Go's encoder HTML-escapes `<>&` — reproduced.
 *  - `marshalWithoutQuery` (:293-312) drops Query/Type/TableVersion and
 *    sorts columns BY NAME; its crc32-IEEE is the path checksum
 *    (`Sum32` :315-327 — PositionInertia over ONE write degenerates to
 *    plain crc32).
 *  - Column rendering follows `TableCol.FromTiColumnInfo` (:52-103):
 *    precision for the int/bit/string/blob/year families, precision+scale
 *    for DECIMAL always, scale-only for TIME/DATETIME/TIMESTAMP when the
 *    declared fsp is non-zero non-default, precision(+scale when declared
 *    non-zero) for FLOAT/DOUBLE, nothing for DATE/ENUM/SET/JSON/VECTOR.
 *    Missing declared lengths fall back to the DDL-time display widths
 *    (TiDB `mysql.GetDefaultFieldLengthAndDecimal` + the unsigned
 *    display-width rule: `int unsigned` → 10 where `int` → 11).
 *  - `output-column-id` (pkg/config/sink.go:689) adds `ColumnId` —
 *    decimal string of the column's table-scoped id.
 *
 * All of this is control-plane: one JSON per (table, tableVersion),
 * emitted by the DDL sink — built driver-side as literals, never per-row.
 */
object TableDef {

  /** TiDB ActionType ordinals used by the `Type` field (public enum in
    * tidb/pkg/meta/model; the reference writes them verbatim). */
  val ActionCreateTable = 3
  val ActionAddColumn = 5
  val ActionDropColumn = 6
  val ActionTruncateTable = 11

  private val Indent = "    "

  /** Go encoding/json string escaping with the default HTML escaper:
    * `"` `\` as backslash escapes, \n \r \t named, `<` `>` `&` and other
    * control chars as \u00xx, U+2028/9 as their \\u20xx escapes. */
  private[graft] def goJsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '<' => sb.append("\\u003c")
      case '>' => sb.append("\\u003e")
      case '&' => sb.append("\\u0026")
      case c if c == '\u2028' => sb.append("\\u2028")
      case c if c == '\u2029' => sb.append("\\u2029")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Declared (flen, decimal) from the parenthesized suffix of the
    * lowercase mysql type, e.g. "decimal(12,2)" → (Some(12), Some(2)).
    * Long, not Int: longblob's default flen is 4294967295, so parsing our
    * OWN sidecar back (which renders the default) must not overflow. */
  private def declared(mysqlType: String): (Option[Long], Option[Long]) = {
    val m = "\\(\\s*(\\d+)\\s*(?:,\\s*(\\d+)\\s*)?\\)".r.findFirstMatchIn(mysqlType)
    m match {
      case Some(g) => (Some(g.group(1).toLong), Option(g.group(2)).map(_.toLong))
      case None => (None, None)
    }
  }

  /** DDL-time default display widths (TiDB GetDefaultFieldLengthAndDecimal
    * + MySQL's narrower unsigned widths — the sign position drops). */
  private def defaultFlen(base: String, unsigned: Boolean): Option[Long] =
    base match {
      case "tinyint" | "bool" | "boolean" => Some(if (unsigned) 3L else 4L)
      case "smallint" => Some(if (unsigned) 5L else 6L)
      case "mediumint" => Some(if (unsigned) 8L else 9L)
      case "int" | "integer" => Some(if (unsigned) 10L else 11L)
      case "bigint" => Some(20L)
      case "bit" => Some(1L)
      case "year" => Some(4L)
      case "float" => Some(12L)
      case "double" => Some(22L)
      case "decimal" | "numeric" => Some(10L)
      case "char" | "binary" => Some(1L)
      case "tinyblob" | "tinytext" => Some(255L)
      case "blob" | "text" => Some(65535L)
      case "mediumblob" | "mediumtext" => Some(16777215L)
      case "longblob" | "longtext" => Some(4294967295L)
      case _ => None
    }

  /** ColumnType name: uppercase MySQL name + " UNSIGNED"
    * (types.TypeToStr + the HasUnsignedFlag suffix, :70-73). */
  private[graft] def typeName(spec: ColumnSpec): String = {
    val n = spec.base match {
      case "bool" | "boolean" => "TINYINT"
      case "integer" => "INT"
      case "numeric" => "DECIMAL"
      case b => b.toUpperCase(java.util.Locale.ROOT)
    }
    if (spec.unsigned) n + " UNSIGNED" else n
  }

  /** (precision, scale) rendered per FromTiColumnInfo's type switch. */
  private[graft] def precisionScale(spec: ColumnSpec): (Option[String], Option[String]) = {
    val (dFlen, dDec) = declared(spec.mysqlType)
    def flen: Option[String] =
      dFlen.map(_.toLong).orElse(defaultFlen(spec.base, spec.unsigned))
        .map(_.toString)
    spec.base match {
      case "time" | "datetime" | "timestamp" =>
        (None, dDec.orElse(dFlen).filter(_ != 0).map(_.toString))
      case "float" | "double" =>
        (flen, dDec.filter(_ != 0).map(_.toString))
      case "decimal" | "numeric" =>
        (Some(dFlen.getOrElse(10).toString), Some(dDec.getOrElse(0).toString))
      case "tinyint" | "bool" | "boolean" | "smallint" | "mediumint" | "int" |
           "integer" | "bigint" | "bit" | "varchar" | "char" | "binary" |
           "varbinary" | "blob" | "tinyblob" | "mediumblob" | "longblob" |
           "text" | "tinytext" | "mediumtext" | "longtext" | "year" =>
        (flen, None)
      case _ => (None, None) // date / enum / set / json / vector
    }
  }

  /** One TableCol as ordered (key, rendered-json-value) pairs.
    * `default` renders like Go's interface{} marshal: numbers bare,
    * strings quoted-escaped, None omitted. */
  private def colFields(spec: ColumnSpec, id: Option[Long],
                        default: Option[Any]): Seq[(String, String)] = {
    val (prec, scale) = precisionScale(spec)
    Seq.empty[(String, String)] ++
      id.map(i => "ColumnId" -> s""""$i"""") ++
      Seq("ColumnName" -> s""""${goJsonEscape(spec.name)}"""",
        "ColumnType" -> s""""${goJsonEscape(typeName(spec))}"""") ++
      default.map {
        case s: String => "ColumnDefault" -> s""""${goJsonEscape(s)}""""
        case n => "ColumnDefault" -> n.toString
      } ++
      prec.map(p => "ColumnPrecision" -> s""""$p"""") ++
      scale.map(sc => "ColumnScale" -> s""""$sc"""") ++
      (if (!spec.nullable) Seq("ColumnNullable" -> "\"false\"") else Nil) ++
      (if (spec.isHandle) Seq("ColumnIsPk" -> "\"true\"") else Nil)
  }

  private def renderObj(fields: Seq[(String, String)], level: Int): String = {
    val pad = Indent * level
    val inner = Indent * (level + 1)
    fields.map { case (k, v) => s"""$inner"$k": $v""" }
      .mkString("{\n", ",\n", s"\n$pad}")
  }

  private def renderCols(specs: Seq[ColumnSpec], ids: Option[Seq[Long]],
                         defaults: Map[String, Any], level: Int): String =
    if (specs.isEmpty) "null"
    else {
      val inner = Indent * (level + 1)
      specs.zipWithIndex.map { case (s, i) =>
        inner + renderObj(
          colFields(s, ids.map(_(i)), defaults.get(s.name)), level + 1)
      }.mkString("[\n", ",\n", s"\n${Indent * level}]")
    }

  /** The full schema-file content (MarshalWithQuery, :283-290). */
  def marshalWithQuery(schemaName: String, tableName: String,
      tableVersion: Long, query: String, actionType: Int,
      specs: Seq[ColumnSpec], outputColumnId: Boolean = false,
      columnIds: Seq[Long] = Nil,
      defaults: Map[String, Any] = Map.empty): String = {
    val ids = if (outputColumnId)
      Some(if (columnIds.nonEmpty) columnIds
           else specs.indices.map(_ + 1L)) else None
    renderObj(Seq(
      "Table" -> s""""${goJsonEscape(tableName)}"""",
      "Schema" -> s""""${goJsonEscape(schemaName)}"""",
      "Version" -> "1",
      "TableVersion" -> tableVersion.toString,
      "Query" -> s""""${goJsonEscape(query)}"""",
      "Type" -> actionType.toString,
      "TableColumns" -> renderCols(specs, ids, defaults, 1),
      "TableColumnsTotal" -> specs.size.toString), 0)
  }

  /** Checksum input (marshalWithoutQuery, :293-312): columns NAME-sorTED,
    * no Query/Type/TableVersion. */
  def marshalWithoutQuery(schemaName: String, tableName: String,
      specs: Seq[ColumnSpec], outputColumnId: Boolean = false,
      columnIds: Seq[Long] = Nil,
      defaults: Map[String, Any] = Map.empty): String = {
    val ids0 = if (columnIds.nonEmpty) columnIds else specs.indices.map(_ + 1L)
    val pairs = specs.zip(ids0).sortBy(_._1.name)
    val ids = if (outputColumnId) Some(pairs.map(_._2)) else None
    renderObj(Seq(
      "Table" -> s""""${goJsonEscape(tableName)}"""",
      "Schema" -> s""""${goJsonEscape(schemaName)}"""",
      "Version" -> "1",
      "TableColumns" -> renderCols(pairs.map(_._1), ids, defaults, 1),
      "TableColumnsTotal" -> specs.size.toString), 0)
  }

  /** Sum32 (:315-327) — PositionInertia over one write = crc32-IEEE. */
  def checksum(schemaName: String, tableName: String, specs: Seq[ColumnSpec],
               outputColumnId: Boolean = false, columnIds: Seq[Long] = Nil,
               defaults: Map[String, Any] = Map.empty): Long = {
    val crc = new java.util.zip.CRC32
    crc.update(marshalWithoutQuery(schemaName, tableName, specs,
      outputColumnId, columnIds, defaults)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    crc.getValue
  }

  /** `<schema>[/<table>]/meta/schema_{v}_{checksum:010d}.json`
    * (path.go:49-55,93-110 — the table form and the db-schema form when
    * the definition carries no table). */
  def schemaPath(schemaName: String, tableName: String, tableVersion: Long,
                 checksum: Long): String = {
    require(schemaName.nonEmpty && tableVersion != 0,
      s"invalid schema/tableVersion: $schemaName/$tableVersion")
    val dir = if (tableName.isEmpty) s"$schemaName/meta/"
              else s"$schemaName/$tableName/meta/"
    dir + f"schema_${tableVersion}%d_${checksum}%010d.json"
  }

  // ---- consumer side --------------------------------------------------

  /** Parse a schema file back to its specs (ToTableInfo, :253-274):
    * type string → declared mysql type with precision/scale folded back
    * in, UNSIGNED suffix → flag, nullable/pk strings → booleans. The
    * render∘parse∘render fixpoint is the spec-level contract. */
  def parse(json: String): (String, String, Long, Seq[ColumnSpec]) = {
    def str(key: String, obj: String): Option[String] =
      s""""$key":\\s*"((?:[^"\\\\]|\\\\.)*)"""".r
        .findFirstMatchIn(obj).map(m => unescape(m.group(1)))
    def num(key: String, obj: String): Option[Long] =
      s""""$key":\\s*(\\d+)""".r.findFirstMatchIn(obj).map(_.group(1).toLong)
    val cols = "(?s)\"TableColumns\": (\\[.*\\n    \\]|null)".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("null")
    val specs =
      if (cols == "null") Nil
      else "(?s)\\{.*?\\}".r.findAllIn(cols).map { obj =>
        val tp = str("ColumnType", obj).get
        val unsigned = tp.endsWith(" UNSIGNED")
        val base = tp.stripSuffix(" UNSIGNED").toLowerCase(java.util.Locale.ROOT)
        val prec = str("ColumnPrecision", obj)
        val scale = str("ColumnScale", obj)
        val declared = (base, prec, scale) match {
          case (b@("time" | "datetime" | "timestamp"), _, Some(s)) => s"$b($s)"
          case (b, Some(p), Some(s)) => s"$b($p,$s)"
          case (b, Some(p), None) => s"$b($p)"
          case (b, _, _) => b
        }
        ColumnSpec(str("ColumnName", obj).get, declared,
          nullable = !str("ColumnNullable", obj).contains("false"),
          isHandle = str("ColumnIsPk", obj).contains("true"),
          unsigned = unsigned)
      }.toSeq
    (str("Schema", json).getOrElse(""), str("Table", json).getOrElse(""),
      num("TableVersion", json).getOrElse(0L), specs)
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
