package graft.core

import org.apache.spark.sql.types._

/**
 * G1 — DDL parsing from raw SQL text. The reference parses binlog QUERY
 * events with the TiDB parser, splits multi-schema-change statements into
 * single-change DDLs, routes/renames the target tables, and applies each to
 * its schema tracker (dm/syncer/ddl.go:223-414, `AstToDDLEvent:1127`;
 * allow-list pkg/filter/filter.go:36-98). This is the Spark-side analog: a
 * hand-rolled recursive-descent/regex parser for the MySQL DDL subset that
 * the reference's allow-list admits, producing structured statements that
 * [[SchemaRegistry.applyDdl]] can fold into versioned StructTypes.
 *
 * A full SQL grammar is out of scope (the reference links a whole TiDB
 * parser); the subset here covers every statement class the reference's
 * integration tests feed through a changefeed: CREATE/DROP DATABASE,
 * CREATE/DROP/RENAME/TRUNCATE TABLE, and ALTER TABLE
 * ADD/DROP/MODIFY/CHANGE/RENAME COLUMN plus index clauses — including the
 * comma-separated multi-change ALTER, which SPLITS into one statement per
 * change exactly like the reference's `splitDDLs`.
 */
object DdlParser {

  /** One parsed, single-change DDL statement (post-split). */
  sealed trait Stmt { def eventType: String }
  final case class CreateDatabase(schema: String) extends Stmt {
    val eventType = "create database"
  }
  final case class DropDatabase(schema: String) extends Stmt {
    val eventType = "drop database"
  }
  final case class ColumnDef(name: String, mysqlType: String,
                             dataType: DataType, nullable: Boolean)
  final case class CreateTable(schema: String, table: String,
                               columns: Seq[ColumnDef], primaryKey: Seq[String])
      extends Stmt { val eventType = "create table" }
  final case class DropTable(schema: String, table: String) extends Stmt {
    val eventType = "drop table"
  }
  final case class RenameTable(schema: String, table: String,
                               toSchema: String, toTable: String) extends Stmt {
    val eventType = "rename table"
  }
  final case class TruncateTable(schema: String, table: String) extends Stmt {
    val eventType = "truncate table"
  }
  /** Single column/index change on one table (multi-change ALTERs are
    * split before this level). */
  final case class AlterTable(schema: String, table: String,
                              action: SchemaRegistry.DdlAction) extends Stmt {
    val eventType = action match {
      case _: SchemaRegistry.AddColumn    => "add column"
      case _: SchemaRegistry.DropColumn   => "drop column"
      case _: SchemaRegistry.RenameColumn => "rename column"
      case _: SchemaRegistry.ModifyColumn => "modify column"
    }
  }
  /** Index changes don't alter the row schema; parsed + classified so
    * filters and sinks can route them. */
  final case class AlterIndex(schema: String, table: String, addIndex: Boolean,
                              indexName: String,
                              keyParts: Seq[String] = Nil) extends Stmt {
    val eventType = if (addIndex) "create index" else "drop index"
  }

  final case class ParseError(sql: String, reason: String)
      extends RuntimeException(s"cannot parse DDL [$reason]: $sql")

  // ---- lexical helpers -------------------------------------------------

  /** Strip one level of MySQL identifier quoting. */
  private def unquote(id: String): String = {
    val t = id.trim
    if (t.length >= 2 && t.head == '`' && t.last == '`')
      t.substring(1, t.length - 1).replace("``", "`")
    else t
  }

  private val IndexKeywords =
    Set("KEY", "INDEX", "PRIMARY", "UNIQUE", "CONSTRAINT", "FOREIGN")

  /** Index name from a raw token, guarding against capturing a bare
    * keyword (`ADD PRIMARY KEY (...)` carries no name — MySQL calls the
    * primary index PRIMARY). */
  private def idxName(raw: String, dflt: String): String = {
    val u = unquote(raw)
    if (IndexKeywords.contains(u.toUpperCase)) dflt else u
  }

  /** Contents of the first balanced `(...)` group, quote-aware. */
  private def firstParenGroup(s: String): Option[String] = {
    val start = s.indexOf('(')
    if (start < 0) None
    else {
      var depth = 0
      var quote: Char = 0
      var i = start
      while (i < s.length) {
        val c = s.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else c match {
          case '`' | '\'' | '"' => quote = c
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return Some(s.substring(start + 1, i))
          case _ =>
        }
        i += 1
      }
      None
    }
  }

  /** Split `db.tbl` / `` `db`.`tbl` `` / `tbl` against a default schema. */
  private def qualified(name: String, defaultSchema: String): (String, String) = {
    val parts = splitTopLevel(name.trim, '.')
    parts match {
      case Seq(t) => (defaultSchema, unquote(t))
      case Seq(s, t) => (unquote(s), unquote(t))
      case _ => throw ParseError(name, "bad qualified name")
    }
  }

  /** Split on a separator at paren/quote nesting depth 0 (commas inside
    * DECIMAL(10,2), ENUM('a','b'), or quoted strings must not split). */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case x if x == sep && depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val ws = "\\s+"

  // ---- type mapping ----------------------------------------------------

  /** MySQL column type → Spark type, mirroring the reference mounter's
    * mapping (cdc/entry/mounter.go:772-841): integer family by width,
    * NewDecimal kept exact, Enum/Set/JSON as strings. */
  def mysqlToSpark(mysqlType: String): DataType = {
    val t = mysqlType.trim.toLowerCase
    val base = t.takeWhile(c => c.isLetter)
    val args = "\\((\\d+)(?:\\s*,\\s*(\\d+))?\\)".r.findFirstMatchIn(t)
    base match {
      case "tinyint" if args.exists(_.group(1) == "1") => BooleanType
      case "bool" | "boolean" => BooleanType
      case "tinyint" | "smallint" => IntegerType
      case "mediumint" | "int" | "integer" | "year" => IntegerType
      case "bigint" => LongType
      case "decimal" | "numeric" =>
        val p = args.map(_.group(1).toInt).getOrElse(10)
        val s = args.flatMap(m => Option(m.group(2))).map(_.toInt).getOrElse(0)
        DecimalType(p, s)
      case "float" => FloatType
      case "double" | "real" => DoubleType
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" | "longtext" |
           "enum" | "set" | "json" | "time" => StringType
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" |
           "longblob" | "bit" => BinaryType
      case "date" => DateType
      case "datetime" | "timestamp" => TimestampType
      // TiDB v8 VECTOR column (mysql.TypeTiDBVectorFloat32) — the mounter
      // yields a dense float32 array (cdc/entry/mounter.go:832-834).
      case "vector" => ArrayType(FloatType)
      case other => throw ParseError(mysqlType, s"unknown type '$other'")
    }
  }

  /** Parse "name TYPE [NOT NULL|NULL] [...]" → ColumnDef. The type token
    * may carry parenthesized args and multi-word suffixes (UNSIGNED etc.). */
  private def columnDef(clause: String): ColumnDef = {
    val m = "^(`[^`]+`|\\w+)\\s+(.+)$".r.findFirstMatchIn(clause.trim)
      .getOrElse(throw ParseError(clause, "bad column def"))
    val name = unquote(m.group(1))
    val rest = m.group(2).trim
    // the type = first token plus an immediately-following (...) group
    val tm = "^([a-zA-Z]+(?:\\s*\\([^)]*\\))?)".r.findFirstMatchIn(rest)
      .getOrElse(throw ParseError(clause, "bad column type"))
    val mysqlType = tm.group(1)
    val tail = rest.substring(tm.end).toUpperCase
    val nullable = !tail.contains("NOT NULL") && !tail.contains("PRIMARY KEY")
    ColumnDef(name, mysqlType.replaceAll("\\s+", ""), mysqlToSpark(mysqlType), nullable)
  }

  // ---- statement parsing ----------------------------------------------

  /**
   * Parse one SQL string into single-change statements. Multi-change
   * ALTERs, multi-target RENAME TABLE / DROP TABLE, and CHANGE COLUMN with
   * a type change all SPLIT into several statements, matching the
   * reference's splitDDLs + one-schema-change-per-DDL normal form.
   */
  def parse(sql: String, defaultSchema: String = ""): Seq[Stmt] = {
    // strip comments, control chars (reference TrimCtrlChars), trailing ';'
    val clean = sql.replaceAll("/\\*.*?\\*/", " ")
      .replaceAll("--[^\\n]*", " ")
      .filter(c => c >= ' ' || c == '\n' || c == '\t')
      .trim.stripSuffix(";").trim
    val up = clean.toUpperCase

    def after(prefix: String): String = clean.substring(prefix.length).trim

    if (up.startsWith("CREATE DATABASE") || up.startsWith("CREATE SCHEMA")) {
      // strip the keyword actually matched — DATABASE and SCHEMA differ in length
      val rest = clean.replaceFirst("(?i)^CREATE\\s+(DATABASE|SCHEMA)", "")
        .replaceAll("(?i)^\\s*IF NOT EXISTS", "").trim
      Seq(CreateDatabase(unquote(rest.split(ws).head)))
    } else if (up.startsWith("DROP DATABASE") || up.startsWith("DROP SCHEMA")) {
      val rest = clean.replaceFirst("(?i)^DROP\\s+(DATABASE|SCHEMA)", "")
        .replaceAll("(?i)^\\s*IF EXISTS", "").trim
      Seq(DropDatabase(unquote(rest.split(ws).head)))
    } else if (up.startsWith("CREATE TABLE")) {
      val rest = after("CREATE TABLE").replaceAll("(?i)^IF NOT EXISTS", "").trim
      val open = rest.indexOf('(')
      if (open < 0) throw ParseError(sql, "CREATE TABLE without column list")
      val (schema, table) = qualified(rest.substring(0, open), defaultSchema)
      val close = rest.lastIndexOf(')')
      val body = splitTopLevel(rest.substring(open + 1, close), ',')
      val pk = Seq.newBuilder[String]
      val cols = Seq.newBuilder[ColumnDef]
      body.foreach { clause =>
        val cu = clause.toUpperCase
        if (cu.startsWith("PRIMARY KEY")) {
          val inner = clause.substring(clause.indexOf('(') + 1, clause.lastIndexOf(')'))
          pk ++= splitTopLevel(inner, ',').map(unquote)
        } else if (cu.startsWith("KEY") || cu.startsWith("INDEX") ||
                   cu.startsWith("UNIQUE") || cu.startsWith("CONSTRAINT") ||
                   cu.startsWith("FOREIGN KEY")) {
          () // indexes/constraints don't shape the row schema
        } else {
          val cd = columnDef(clause)
          cols += cd
          if (clause.toUpperCase.contains("PRIMARY KEY")) pk += cd.name
        }
      }
      Seq(CreateTable(schema, table, cols.result(), pk.result()))
    } else if (up.startsWith("DROP TABLE")) {
      val rest = after("DROP TABLE").replaceAll("(?i)^IF EXISTS", "").trim
      splitTopLevel(rest, ',').map { n =>
        val (s, t) = qualified(n, defaultSchema); DropTable(s, t)
      }
    } else if (up.startsWith("RENAME TABLE")) {
      splitTopLevel(after("RENAME TABLE"), ',').map { pair =>
        pair.split("(?i)\\s+TO\\s+") match {
          case Array(from, to) =>
            val (fs, ft) = qualified(from, defaultSchema)
            val (ts, tt) = qualified(to, defaultSchema)
            RenameTable(fs, ft, ts, tt)
          case _ => throw ParseError(sql, "RENAME TABLE without TO")
        }
      }
    } else if (up.startsWith("TRUNCATE")) {
      val rest = after("TRUNCATE").replaceAll("(?i)^TABLE", "").trim
      val (s, t) = qualified(rest, defaultSchema)
      Seq(TruncateTable(s, t))
    } else if (up.startsWith("ALTER TABLE")) {
      val rest = after("ALTER TABLE")
      // table name = everything before the first alter-specification keyword
      val specStart = "(?i)\\s+(ADD|DROP|MODIFY|CHANGE|RENAME|ALTER)\\s".r
        .findFirstMatchIn(" " + rest)
        .getOrElse(throw ParseError(sql, "ALTER TABLE without action")).start
      val (schema, table) = qualified(rest.substring(0, specStart), defaultSchema)
      val specs = splitTopLevel(rest.substring(specStart).trim, ',')
      specs.flatMap(spec => alterSpec(schema, table, spec, sql))
    } else throw ParseError(sql, "unsupported statement")
  }

  import SchemaRegistry.{AddColumn, DropColumn, ModifyColumn, RenameColumn}

  private def alterSpec(schema: String, table: String, spec: String,
                        sql: String): Seq[Stmt] = {
    val up = spec.toUpperCase
    def afterKw(n: Int): String = spec.split(ws, n + 1).last.trim
    if (up.startsWith("ADD COLUMN") || (up.startsWith("ADD") &&
        !up.startsWith("ADD PRIMARY") && !up.startsWith("ADD INDEX") &&
        !up.startsWith("ADD KEY") && !up.startsWith("ADD UNIQUE") &&
        !up.startsWith("ADD CONSTRAINT") && !up.startsWith("ADD FOREIGN"))) {
      val body = if (up.startsWith("ADD COLUMN")) afterKw(2) else afterKw(1)
      val cd = columnDef(body)
      Seq(AlterTable(schema, table, AddColumn(cd.name, cd.dataType)))
    } else if (up.startsWith("ADD PRIMARY") || up.startsWith("ADD INDEX") ||
               up.startsWith("ADD KEY") || up.startsWith("ADD UNIQUE") ||
               up.startsWith("ADD CONSTRAINT") || up.startsWith("ADD FOREIGN")) {
      // MySQL names the primary index PRIMARY; bare keywords never name
      val dflt = if (up.startsWith("ADD PRIMARY")) "PRIMARY" else "idx"
      // `ADD CONSTRAINT <name> ...` names the constraint right after the
      // keyword; otherwise the name (if any) is the last token before '('.
      val constraintName =
        if (up.startsWith("ADD CONSTRAINT")) {
          val toks = spec.split(ws)
          if (toks.length >= 3) Some(idxName(toks(2), dflt)) else None
        } else None
      val name = constraintName.getOrElse("\\(".r.findFirstMatchIn(spec).map(_ => {
        val pre = spec.substring(0, spec.indexOf('(')).trim
        idxName(pre.split(ws).lastOption.getOrElse(dflt), dflt)
      }).getOrElse {
        // no column list (e.g. a re-rendered `ADD INDEX \`name\``)
        val toks = spec.split(ws)
        if (toks.length >= 3) idxName(toks.last, dflt) else dflt
      })
      // Only the FIRST balanced paren group holds key parts: for
      // `ADD CONSTRAINT ... FOREIGN KEY (a) REFERENCES p (id)` the naive
      // first-'('..last-')' span would capture `a) REFERENCES p (id` and
      // re-render malformed SQL.
      val keyParts = firstParenGroup(spec)
        .map(g => splitTopLevel(g, ',').map(unquote).toSeq)
        .getOrElse(Nil)
      Seq(AlterIndex(schema, table, addIndex = true, name, keyParts))
    } else if (up.startsWith("DROP COLUMN")) {
      Seq(AlterTable(schema, table, DropColumn(unquote(afterKw(2)))))
    } else if (up.startsWith("DROP PRIMARY") || up.startsWith("DROP INDEX") ||
               up.startsWith("DROP KEY") || up.startsWith("DROP FOREIGN")) {
      val dflt = if (up.startsWith("DROP PRIMARY")) "PRIMARY" else "idx"
      Seq(AlterIndex(schema, table, addIndex = false,
        idxName(spec.split(ws).last, dflt)))
    } else if (up.startsWith("DROP")) {
      Seq(AlterTable(schema, table, DropColumn(unquote(afterKw(1)))))
    } else if (up.startsWith("RENAME COLUMN")) {
      afterKw(2).split("(?i)\\s+TO\\s+") match {
        case Array(from, to) =>
          Seq(AlterTable(schema, table,
            RenameColumn(unquote(from), unquote(to))))
        case _ => throw ParseError(sql, "RENAME COLUMN without TO")
      }
    } else if (up.startsWith("RENAME TO") || up.startsWith("RENAME AS")) {
      val (ts, tt) = qualified(afterKw(2), schema)
      Seq(RenameTable(schema, table, ts, tt))
    } else if (up.startsWith("RENAME")) {
      val (ts, tt) = qualified(afterKw(1), schema)
      Seq(RenameTable(schema, table, ts, tt))
    } else if (up.startsWith("MODIFY COLUMN") || up.startsWith("MODIFY")) {
      val body = if (up.startsWith("MODIFY COLUMN")) afterKw(2) else afterKw(1)
      val cd = columnDef(body)
      Seq(AlterTable(schema, table, ModifyColumn(cd.name, cd.dataType)))
    } else if (up.startsWith("CHANGE COLUMN") || up.startsWith("CHANGE")) {
      // CHANGE old new TYPE → rename + modify (two single-change DDLs,
      // the same normal form the reference reaches via ActionModifyColumn)
      val body = if (up.startsWith("CHANGE COLUMN")) afterKw(2) else afterKw(1)
      val parts = body.split(ws, 3)
      if (parts.length < 3) throw ParseError(sql, "CHANGE COLUMN needs old new type")
      val (from, to) = (unquote(parts(0)), unquote(parts(1)))
      val cd = columnDef(s"${parts(1)} ${parts(2)}")
      val rename = if (from != to)
        Seq(AlterTable(schema, table, RenameColumn(from, to))) else Nil
      rename :+ AlterTable(schema, table, ModifyColumn(to, cd.dataType))
    } else throw ParseError(sql, s"unsupported ALTER spec: $spec")
  }

  // ---- routing / rewrite ----------------------------------------------

  /** Route a parsed statement to its target table, mirroring the
    * reference's DDL rename step (dm/syncer/ddl.go genDDLInfo): every
    * table reference — including RENAME targets — maps through the router. */
  def route(stmt: Stmt, router: (String, String) => (String, String)): Stmt =
    stmt match {
      case s: CreateTable =>
        val (ns, nt) = router(s.schema, s.table); s.copy(schema = ns, table = nt)
      case s: DropTable =>
        val (ns, nt) = router(s.schema, s.table); s.copy(schema = ns, table = nt)
      case s: TruncateTable =>
        val (ns, nt) = router(s.schema, s.table); s.copy(schema = ns, table = nt)
      case s: AlterTable =>
        val (ns, nt) = router(s.schema, s.table); s.copy(schema = ns, table = nt)
      case s: AlterIndex =>
        val (ns, nt) = router(s.schema, s.table); s.copy(schema = ns, table = nt)
      case s: RenameTable =>
        val (fs, ft) = router(s.schema, s.table)
        val (ts, tt) = router(s.toSchema, s.toTable)
        RenameTable(fs, ft, ts, tt)
      case s => s
    }

  /**
   * MySQL-sink DDL formatting (cdc/sink/ddlsink/mysql/format_ddl.go:27-45):
   * plain MySQL has no VECTOR type, so DDL forwarded to a MySQL sink
   * rewrites vector columns to LONGBLOB at the AST level (the reference
   * visiter sets TypeLongBlob, clears flen/charset) before rendering.
   * Idempotent; non-vector statements pass through untouched.
   */
  def formatForMysql(stmt: Stmt): Stmt = {
    def isVec(t: String) = t.toLowerCase.startsWith("vector")
    stmt match {
      case ct: CreateTable if ct.columns.exists(c => isVec(c.mysqlType)) =>
        ct.copy(columns = ct.columns.map(c =>
          if (isVec(c.mysqlType))
            c.copy(mysqlType = "longblob", dataType = BinaryType)
          else c))
      case AlterTable(s, t, SchemaRegistry.AddColumn(n, ArrayType(FloatType, _))) =>
        AlterTable(s, t, SchemaRegistry.AddColumn(n, BinaryType))
      case AlterTable(s, t, SchemaRegistry.ModifyColumn(n, ArrayType(FloatType, _))) =>
        AlterTable(s, t, SchemaRegistry.ModifyColumn(n, BinaryType))
      case other => other
    }
  }

  /** Render back to normalized SQL (what a DDL sink would emit downstream;
    * reference emits the rewritten DDL text). */
  def toSql(stmt: Stmt): String = {
    def q(s: String, t: String) = s"`$s`.`$t`"
    def keyPartsSql(ks: Seq[String]): String =
      if (ks.isEmpty) "" else ks.map(k => s"`$k`").mkString(" (", ", ", ")")
    def typ(d: DataType): String = d match {
      case BooleanType => "BOOLEAN"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case t: DecimalType => s"DECIMAL(${t.precision},${t.scale})"
      case StringType => "TEXT"
      case BinaryType => "BLOB"
      case DateType => "DATE"
      case TimestampType => "DATETIME"
      case other => other.sql
    }
    stmt match {
      case CreateDatabase(s) => s"CREATE DATABASE `$s`"
      case DropDatabase(s) => s"DROP DATABASE `$s`"
      case CreateTable(s, t, cols, pk) =>
        val colSql = cols.map(c =>
          s"`${c.name}` ${c.mysqlType}${if (c.nullable) "" else " NOT NULL"}")
        val pkSql = if (pk.isEmpty) Nil
          else Seq(s"PRIMARY KEY (${pk.map(c => s"`$c`").mkString(", ")})")
        s"CREATE TABLE ${q(s, t)} (${(colSql ++ pkSql).mkString(", ")})"
      case DropTable(s, t) => s"DROP TABLE ${q(s, t)}"
      case RenameTable(s, t, ts, tt) => s"RENAME TABLE ${q(s, t)} TO ${q(ts, tt)}"
      case TruncateTable(s, t) => s"TRUNCATE TABLE ${q(s, t)}"
      case AlterTable(s, t, AddColumn(n, d)) =>
        s"ALTER TABLE ${q(s, t)} ADD COLUMN `$n` ${typ(d)}"
      case AlterTable(s, t, DropColumn(n)) =>
        s"ALTER TABLE ${q(s, t)} DROP COLUMN `$n`"
      case AlterTable(s, t, RenameColumn(f, to)) =>
        s"ALTER TABLE ${q(s, t)} RENAME COLUMN `$f` TO `$to`"
      case AlterTable(s, t, ModifyColumn(n, d)) =>
        s"ALTER TABLE ${q(s, t)} MODIFY COLUMN `$n` ${typ(d)}"
      case AlterIndex(s, t, true, "PRIMARY", ks) =>
        s"ALTER TABLE ${q(s, t)} ADD PRIMARY KEY${keyPartsSql(ks)}"
      case AlterIndex(s, t, true, n, ks) =>
        s"ALTER TABLE ${q(s, t)} ADD INDEX `$n`${keyPartsSql(ks)}"
      case AlterIndex(s, t, false, "PRIMARY", _) =>
        s"ALTER TABLE ${q(s, t)} DROP PRIMARY KEY"
      case AlterIndex(s, t, false, n, _) =>
        s"ALTER TABLE ${q(s, t)} DROP INDEX `$n`"
    }
  }

  /** Fold textual DDLs into [[SchemaRegistry.TableVersion]]s: each parsed
    * schema-shaping statement bumps the table's version at its ts. Index
    * statements pass through without a version bump (as in the reference's
    * schema tracker, which only snapshots on row-schema changes). */
  def applyToRegistry(base: Seq[SchemaRegistry.TableVersion],
                      ddls: Seq[(String, Long)], defaultSchema: String = "")
  : Seq[SchemaRegistry.TableVersion] = {
    val state = scala.collection.mutable.Map[(String, String), SchemaRegistry.TableVersion](
      base.map(v => (v.schemaName, v.tableName) -> v): _*)
    val out = Seq.newBuilder[SchemaRegistry.TableVersion]
    out ++= base
    ddls.sortBy(_._2).foreach { case (sql, ts) =>
      parse(sql, defaultSchema).foreach {
        case AlterTable(s, t, action) =>
          val prev = state.getOrElse((s, t),
            throw ParseError(sql, s"ALTER on unknown table $s.$t"))
          val next = prev.copy(version = prev.version + 1, effectiveFrom = ts,
            schema = SchemaRegistry.applyDdl(prev.schema, action))
          state((s, t)) = next
          out += next
        case CreateTable(s, t, cols, _) =>
          val st = StructType(cols.map(c =>
            StructField(c.name, c.dataType, c.nullable)))
          val v = SchemaRegistry.TableVersion(s, t, 1, ts, st)
          state((s, t)) = v
          out += v
        case RenameTable(s, t, ts2, tt) =>
          state.remove((s, t)).foreach { prev =>
            val next = prev.copy(schemaName = ts2, tableName = tt,
              version = prev.version + 1, effectiveFrom = ts)
            state((ts2, tt)) = next
            out += next
          }
        case DropTable(s, t) => state.remove((s, t))
        case _ => () // databases, truncate, index: no row-schema change
      }
    }
    out.result()
  }
}
