package graft.streaming

/**
 * DM's special DDL-error repair strategies (reference
 * dm/syncer/error.go:43-216 handleSpecialDDLError), as a pure decision
 * kernel over (error, ddl list, failing index, downstream index catalog):
 *
 *  - `ignoreAddIndexTimeout` (:80-120): an `invalid connection` error on
 *    the LAST statement is swallowed when that statement is a
 *    single-spec `ALTER TABLE … ADD {INDEX|KEY}` (NOT unique / foreign /
 *    primary — those affect correctness) or ANY `CREATE INDEX` (the Go
 *    ignores uniqueness on the CreateIndexStmt arm — a real asymmetry);
 *    the statement was already shipped, the index build continues
 *    server-side;
 *  - `dropColumnF` (:125-216): TiDB refuses `DROP COLUMN` on a column
 *    carrying an index (errno 8200 ErrUnsupportedDDLOperation, or 1105
 *    ErrUnknown on older versions, with the message legs "drop column" ×
 *    {"with index", "with composite index", "with tidb_enable_change_
 *    multi_schema is disable"}). The repair looks up every downstream
 *    index CONTAINING the column; if ALL of them are single-column
 *    indexes it emits `ALTER TABLE `s`.`t` DROP INDEX `i`` for each and
 *    retries from the failing statement with ignorable DDL errors
 *    ignored; ANY multi-column index aborts the repair (the original
 *    error propagates).
 *
 * The third Go strategy (waitAsyncDDL, polling the downstream's ddl-job
 * queue over a live connection) is I/O orchestration and out of scope.
 * The parse uses the same shapes the Go gets from the TiDB parser,
 * restricted to the statements this kernel can ever see.
 */
object DdlRepair {

  /** TiDB errno 8200 (public docs: "Unsupported DDL operation"). */
  val ErrUnsupportedDDLOperation = 8200
  /** Classic MySQL ER_UNKNOWN_ERROR — older TiDB raised it here. */
  val ErrUnknown = 1105

  sealed trait DdlError
  /** Driver-level `invalid connection` (go-sql-driver mysql.ErrInvalidConn). */
  case object InvalidConn extends DdlError
  final case class MySqlErr(number: Int, message: String) extends DdlError

  /** One downstream index: its name and FULL column list (the Go derives
    * both from information_schema.statistics). */
  final case class IndexInfo(name: String, columns: Seq[String])

  sealed trait Outcome
  /** Return the original error to the caller. */
  case object Propagate extends Outcome
  /** Swallow the error (ADD INDEX timeout); connection is reset. */
  case object Ignore extends Outcome
  /** Execute `dropSqls`, then retry `ddls[retryFrom:]` ignoring
    * ignorable DDL errors. */
  final case class PreDropIndexes(dropSqls: Seq[String], retryFrom: Int)
    extends Outcome

  /** isDropColumnWithIndexError (error.go:55-67). */
  def isDropColumnWithIndexError(e: DdlError): Boolean = e match {
    case MySqlErr(n, msg) =>
      (n == ErrUnsupportedDDLOperation || n == ErrUnknown) &&
        msg.contains("drop column") &&
        (msg.contains("with index") || msg.contains("with composite index") ||
          msg.contains("with tidb_enable_change_multi_schema is disable"))
    case _ => false
  }

  private def bq(s: String): String = "`" + s.replace("`", "``") + "`"

  // ---- the minimal statement shapes this kernel inspects -----------------

  sealed trait Stmt
  final case class AlterDropColumn(schema: String, table: String,
      column: String) extends Stmt
  /** constraintTp ∈ index | unique | foreign | primary. */
  final case class AlterAddConstraint(constraintTp: String) extends Stmt
  case object CreateIndex extends Stmt
  final case class AlterMultiSpec(nSpecs: Int) extends Stmt
  case object OtherStmt extends Stmt

  private val AlterRe =
    "(?is)^\\s*ALTER\\s+TABLE\\s+(`(?:[^`]|``)+`|\\w+)(?:\\.(`(?:[^`]|``)+`|\\w+))?\\s+(.*?)\\s*$".r
  private val DropColRe =
    "(?is)^DROP\\s+COLUMN\\s+(`(?:[^`]|``)+`|\\w+)$".r
  private val AddConstraintRe =
    "(?is)^ADD\\s+(UNIQUE|FOREIGN\\s+KEY|PRIMARY\\s+KEY|INDEX|KEY)\\b.*$".r
  private val CreateIndexRe =
    "(?is)^\\s*CREATE\\s+(?:UNIQUE\\s+)?INDEX\\b.*$".r

  private def unq(s: String): String =
    if (s.startsWith("`")) s.substring(1, s.length - 1).replace("``", "`")
    else s

  /** Top-level comma split (outside parens/backquotes) — the Go asks the
    * TiDB parser for len(Specs). */
  private def splitSpecs(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inBq = false
    body.foreach {
      case '`' => inBq = !inBq; cur += '`'
      case '(' if !inBq => depth += 1; cur += '('
      case ')' if !inBq => depth -= 1; cur += ')'
      case ',' if !inBq && depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  def parse(ddl: String, defaultSchema: String = ""): Stmt = ddl match {
    case AlterRe(p1, p2, body) =>
      val (schema, table) =
        if (p2 == null) (defaultSchema, unq(p1)) else (unq(p1), unq(p2))
      val specs = splitSpecs(body)
      if (specs.size != 1) AlterMultiSpec(specs.size)
      else specs.head match {
        case DropColRe(col) => AlterDropColumn(schema, table, unq(col))
        case AddConstraintRe(kind) =>
          AlterAddConstraint(kind.toLowerCase.split("\\s+")(0) match {
            case "key" => "index"
            case k => k
          })
        case _ => OtherStmt
      }
    case _ if CreateIndexRe.matches(ddl) => CreateIndex
    case _ => OtherStmt
  }

  /**
   * handleSpecialDDLError's first two strategies in order. `catalog` maps
   * (schema, table) to the downstream's index list.
   */
  def handle(err: DdlError, ddls: Seq[String], index: Int,
      catalog: Map[(String, String), Seq[IndexInfo]],
      defaultSchema: String = ""): Outcome = {
    // strategy 1: ignoreAddIndexTimeout
    if (err == InvalidConn && ddls.nonEmpty && index == ddls.length - 1) {
      parse(ddls(index), defaultSchema) match {
        case AlterAddConstraint("index") => return Ignore
        case CreateIndex => return Ignore // uniqueness NOT checked here
        case _ => // fall through
      }
    }
    // strategy 2: dropColumnF
    if (isDropColumnWithIndexError(err) && index < ddls.length) {
      parse(ddls(index), defaultSchema) match {
        case AlterDropColumn(schema, table, col) =>
          val indexes = catalog.getOrElse((schema, table), Nil)
          val containing = indexes.filter(_.columns.contains(col))
          // an empty containing set still RETRIES (the Go's empty drop
          // list is a no-op ExecuteSQL followed by the ignore-retry);
          // any multi-column index aborts the whole repair
          if (containing.forall(_.columns.size == 1)) {
            val sqls = containing.map(i =>
              s"ALTER TABLE ${bq(schema)}.${bq(table)} DROP INDEX ${bq(i.name)}")
            return PreDropIndexes(sqls, index)
          }
        case _ =>
      }
    }
    Propagate
  }
}
