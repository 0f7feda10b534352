package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event filters (SURVEY.md §2.4, F1-F7 + W7).
 *
 * tiflow evaluates filter rules row-at-a-time in Go (table filter:
 * pkg/filter/filter.go:100-165; event filter:
 * pkg/filter/sql_event_filter.go:193-222; expression filter:
 * pkg/filter/expr_filter.go:41-260 embeds a TiDB expression evaluator).
 * Spark-first design: each rule set compiles ONCE into a Catalyst `Column`
 * predicate, so filters participate in whole-stage codegen and can be pushed
 * into scans by the optimizer — no per-row interpretation.
 */
object Filters {

  /** One allow/block rule over (schema, table), table-filter wildcard
    * syntax: `*` = any run, `?` = one char, `[a-z]` / `[!a-z]` character
    * classes (reference tidb-tools table-filter, used by
    * pkg/filter/filter.go:100-165). */
  final case class TableRule(schemaPat: String, tablePat: String, allow: Boolean)

  /** Compile a table-filter wildcard pattern to an anchored Java regex,
    * including `[...]`/`[!...]` classes. */
  def wildcardToRegex(pat: String): String = {
    val out = new StringBuilder("^")
    var i = 0
    while (i < pat.length) {
      pat.charAt(i) match {
        case '*' => out ++= ".*"
        case '?' => out += '.'
        case '[' =>
          // character class: passes through to regex, with `!` negation
          val close = pat.indexOf(']', i + 1)
          if (close < 0) { out ++= "\\["; }
          else {
            val body0 = pat.substring(i + 1, close)
            val body = if (body0.startsWith("!")) "^" + body0.substring(1) else body0
            out ++= s"[$body]"
            i = close
          }
        case c if "\\.{}()+-^$|]".contains(c) => out ++= "\\" + c
        case c => out += c
      }
      i += 1
    }
    out.append('$').result()
  }

  /**
   * Parse textual table-filter rules (the reference's config surface:
   * `["*.*", "!scm.tbl", "shard[0-9]+.t?"]` — a leading `!` makes the rule
   * an exclusion, later rules override earlier). Rules without a dot apply
   * to the schema with `*` tables.
   */
  def parseRules(rules: Seq[String]): Seq[TableRule] =
    rules.map { raw =>
      val (allow, body) =
        if (raw.startsWith("!")) (false, raw.substring(1)) else (true, raw)
      body.split("\\.", 2) match {
        case Array(s, t) => TableRule(s.trim, t.trim, allow)
        case Array(s) => TableRule(s.trim, "*", allow)
      }
    }

  /**
   * F1 — table filter. Last matching rule wins (tiflow's table-filter
   * semantics: rules are evaluated in order, later rules override earlier).
   * Rows matching no rule are dropped (allow-list behavior when the first
   * rule is an allow; callers can prepend `TableRule("*","*",true)`).
   */
  def tableFilterPredicate(rules: Seq[TableRule],
                           schemaCol: Column, tableCol: Column): Column = {
    val matchNone = lit(false)
    rules.foldLeft(matchNone) { (acc, r) =>
      val m = schemaCol.rlike(wildcardToRegex(r.schemaPat)) &&
        tableCol.rlike(wildcardToRegex(r.tablePat))
      when(m, lit(r.allow)).otherwise(acc)
    }
  }

  def tableFilter(df: DataFrame, rules: Seq[TableRule]): DataFrame =
    df.filter(tableFilterPredicate(rules, col("schema_name"), col("table_name")))

  /** F2 — event-type filter: drop listed DML op types for matching tables. */
  final case class EventRule(schemaPat: String, tablePat: String,
                             ignoreOps: Set[String] = Set.empty,
                             ignoreEtypes: Set[String] = Set.empty)

  def eventFilter(df: DataFrame, rules: Seq[EventRule]): DataFrame = {
    val drop = rules.foldLeft(lit(false)) { (acc, r) =>
      val tableMatch = col("schema_name").rlike(wildcardToRegex(r.schemaPat)) &&
        col("table_name").rlike(wildcardToRegex(r.tablePat))
      val opMatch =
        (if (r.ignoreOps.nonEmpty) col("op").isin(r.ignoreOps.toSeq.sorted: _*)
         else lit(false)) ||
        (if (r.ignoreEtypes.nonEmpty) col("etype").isin(r.ignoreEtypes.toSeq.sorted: _*)
         else lit(false))
      acc || (tableMatch && opMatch)
    }
    df.filter(!drop)
  }

  /**
   * F3 — expression filter. tiflow parses the user SQL expression with the
   * TiDB parser and interprets it per row; in Spark `expr()` hands the same
   * string to Catalyst, which parses, optimizes (constant folding), and
   * code-generates it. Each rule skips rows of a given op kind for which the
   * expression is TRUE (null-safe: null = no skip, matching tiflow).
   */
  final case class ExprRule(op: String, skipWhen: String)

  def exprFilter(df: DataFrame, rules: Seq[ExprRule]): DataFrame = {
    val skip = rules.foldLeft(lit(false)) { (acc, r) =>
      acc || (col("op") === r.op && coalesce(expr(r.skipWhen), lit(false)))
    }
    df.filter(!skip)
  }

  /**
   * F3, update-image split — the reference evaluates FOUR expressions per
   * rule, each written against the TABLE's columns and bound to a row
   * image: ignore-insert (new image), ignore-delete (old image), and for
   * UPDATE two separate expressions against the before and after images
   * (pkg/filter/expr_filter.go:93-124 parses IgnoreUpdateOldValueExpr /
   * IgnoreUpdateNewValueExpr independently; dm/syncer/expr_filter_group.go
   * applies old-OR-new). tiflow binds the parsed expression to a column
   * layout per image; here the same rebinding is a Catalyst transform —
   * the user writes `val > 100` against the table schema, and the valued
   * column is re-pointed at `val_before` or `val_after` in the envelope.
   * An expression left empty never skips; null evaluates to no-skip.
   */
  final case class ImageExprRule(ignoreInsert: String = "",
                                 ignoreDelete: String = "",
                                 ignoreUpdateOld: String = "",
                                 ignoreUpdateNew: String = "")

  /** Rebind table-schema attribute names in a user expression to envelope
    * columns of one image (old: val→val_before, new: val→val_after). */
  private def bindImage(sql: String, mapping: Map[String, String]): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // parse eagerly (expr() defers to a lazy SqlExpression node the
    // transform below could not see into), then re-point attributes
    val rebound = CatalystSqlParser.parseExpression(sql).transform {
      case a: UnresolvedAttribute if mapping.contains(a.name) =>
        UnresolvedAttribute.quoted(mapping(a.name))
    }
    ColumnBridge.column(rebound)
  }

  private val OldImage = Map("val" -> "val_before")
  private val NewImage = Map("val" -> "val_after")

  def exprFilterImages(df: DataFrame, rules: Seq[ImageExprRule]): DataFrame = {
    def pred(sql: String, img: Map[String, String]): Column =
      if (sql.isEmpty) lit(false) else coalesce(bindImage(sql, img), lit(false))
    val skip = rules.foldLeft(lit(false)) { (acc, r) =>
      acc ||
        (col("op") === "I" && pred(r.ignoreInsert, NewImage)) ||
        (col("op") === "D" && pred(r.ignoreDelete, OldImage)) ||
        (col("op") === "U" &&
          (pred(r.ignoreUpdateOld, OldImage) || pred(r.ignoreUpdateNew, NewImage)))
    }
    df.filter(!skip)
  }

  /** F4 — drop txns whose start_ts is in an ignore list (error recovery;
    * reference pkg/filter/filter.go:246-254). */
  def startTsFilter(df: DataFrame, ignored: Seq[Long]): DataFrame =
    if (ignored.isEmpty) df else df.filter(!col("start_ts").isin(ignored: _*))

  /** F6 — drop events at-or-before a per-table replication checkpoint
    * (reference dm/syncer/syncer.go:2641-2649). Checkpoints come in as a
    * small map broadcast into the predicate. */
  def checkpointFilter(df: DataFrame, checkpoints: Map[(String, String), Long],
                       defaultTs: Long = Long.MinValue): DataFrame = {
    val pred = checkpoints.foldLeft(col("commit_ts") > lit(defaultTs)) {
      case (acc, ((s, t), ts)) =>
        when(col("schema_name") === s && col("table_name") === t,
          col("commit_ts") > lit(ts)).otherwise(acc)
    }
    df.filter(pred)
  }

  /** W7 — BDR/bidirectional filter: drop events originated by self. */
  def bdrFilter(df: DataFrame, dropSourceIds: Seq[Int]): DataFrame =
    if (dropSourceIds.isEmpty) df
    else df.filter(!col("source_id").isin(dropSourceIds: _*))

  /** F2 (ignore-sql branch) / F5 — DDL statement filter: drop control-
    * stream DDL whose SQL matches any ignore regex (reference
    * pkg/binlog-filter/filter.go ignore-sql rules, e.g. ["^DROP"]). */
  def ddlSqlFilter(ddl: DataFrame, ignoreRegexes: Seq[String],
                   sqlCol: String = "ddl"): DataFrame =
    if (ignoreRegexes.isEmpty) ddl
    else ddl.filter(!ignoreRegexes
      .map(r => col(sqlCol).rlike(r))
      .reduce(_ || _))
}
