package graft.diff

/**
 * DM precheck: upstream↔downstream TABLE-STRUCTURE compatibility
 * (SURVEY §2.13 V6, the `table_schema` checking item behind
 * `check-task`): reference dm/pkg/checker/table_structure.go
 * `TablesChecker.checkAST` (:293-343) + `checkTableStructurePair`
 * (:369-505) + the Result fold (:255-292), over the AST facts the
 * checker reads (dm/pkg/checker/utils.go:182-274):
 *
 *  - a FOREIGN KEY constraint warns (TiDB parses but ignores it).
 *  - no primary/unique constraint at all warns (replication efficiency
 *    / exactly-once caveat).
 *  - a missing downstream table is fine UNLESS the task configures
 *    extended columns for it — then it is a FAILURE, and no pair
 *    checks run.
 *  - pair checks: charset mismatch warns unless the downstream is
 *    utf8mb4 (EqualFold); collation mismatch warns; PK/NOT-NULL-UK
 *    sets match by exact column-set equality (PRIMARY keyed as
 *    "PRIMARY", others by constraint name) and every unmatched index
 *    warns on its own side; extended columns must NOT exist upstream
 *    (failure) and MUST exist downstream (failure) — either failure
 *    short-circuits the column-count checks; leftover upstream
 *    columns warn; leftover downstream columns warn only when NOT
 *    ignorable (a column is ignorable when nullable or carrying a
 *    default/auto-increment/generated value, utils.go:251-274).
 *  - the Result fold: any failure → failure; else any warning →
 *    warning; else success (:262-280).
 *
 * Where Go iterates the PK/UK maps in random order, both engines match
 * candidates in INDEX-NAME order — the documented deterministic
 * refinement (ambiguous only when two indexes share an identical
 * column set).
 */
object TableStructCheck {

  val Warning = "warning"
  val Failure = "failure"
  val Success = "success"

  sealed trait ConstraintTp
  case object PrimaryKey extends ConstraintTp
  case object Unique extends ConstraintTp
  case object ForeignKey extends ConstraintTp
  case object OtherIndex extends ConstraintTp

  final case class ColDef(name: String, notNull: Boolean = false,
      hasDefault: Boolean = false)
  final case class Constraint(tp: ConstraintTp, name: String,
      cols: Seq[String])
  final case class TableDef(name: String, cols: Seq[ColDef],
      constraints: Seq[Constraint] = Nil,
      charset: String = "", collation: String = "")

  /** One incompatibilityOption, classified: (state, code, payload). */
  final case class Opt(state: String, code: String, payload: String)

  /** getPKAndUK (utils.go:205-235): INDEX_NAME → column set. */
  def pkAndUk(t: TableDef): Map[String, Set[String]] =
    t.constraints.collect {
      case Constraint(PrimaryKey, _, cols) => "PRIMARY" -> cols.toSet
      case Constraint(Unique, name, cols) => name -> cols.toSet
    }.toMap

  /** getColumnsAndIgnorable (utils.go:251-274). */
  def columnsAndIgnorable(t: TableDef): Map[String, Boolean] =
    t.cols.map(c => c.name -> (!c.notNull || c.hasDefault)).toMap

  /** TablesChecker.checkAST (:293-343). */
  def checkAst(up: TableDef, down: Option[TableDef],
      extendedCols: Seq[String]): Seq[Opt] = {
    val out = Vector.newBuilder[Opt]
    // checkColumnDef is a structural no-op in the reference (:345-347)
    for (cst <- up.constraints if cst.tp == ForeignKey)
      out += Opt(Warning, "fk-ignored", cst.name)
    val hasUnique = up.constraints.exists(c =>
      c.tp == PrimaryKey || c.tp == Unique)
    if (!hasUnique) out += Opt(Warning, "no-pk-uk", "")
    down match {
      case None =>
        if (extendedCols.nonEmpty)
          out += Opt(Failure, "ext-no-downstream",
            extendedCols.mkString(","))
      case Some(d) =>
        out ++= checkPair(up, d, extendedCols)
    }
    out.result()
  }

  /** checkTableStructurePair (:369-505). */
  def checkPair(up: TableDef, down: TableDef,
      extendedCols: Seq[String]): Seq[Opt] = {
    val out = Vector.newBuilder[Opt]
    if (up.charset.nonEmpty && down.charset.nonEmpty &&
        !up.charset.equalsIgnoreCase(down.charset) &&
        !down.charset.equalsIgnoreCase("utf8mb4"))
      out += Opt(Warning, "charset", s"${up.charset}:${down.charset}")
    if (up.collation.nonEmpty && down.collation.nonEmpty &&
        !up.collation.equalsIgnoreCase(down.collation))
      out += Opt(Warning, "collation", s"${up.collation}:${down.collation}")

    // PK/UK set matching, index-name order (see object doc)
    var upIdx = pkAndUk(up)
    var downIdx = pkAndUk(down)
    for (un <- upIdx.keys.toSeq.sorted) {
      downIdx.keys.toSeq.sorted.find(dn => downIdx(dn) == upIdx(un)) match {
        case Some(dn) => upIdx -= un; downIdx -= dn
        case None => ()
      }
    }
    for (n <- upIdx.keys.toSeq.sorted)
      out += Opt(Warning, "pkuk-up-extra",
        s"$n:${upIdx(n).toSeq.sorted.mkString(",")}")
    for (n <- downIdx.keys.toSeq.sorted)
      out += Opt(Warning, "pkuk-down-extra",
        s"$n:${downIdx(n).toSeq.sorted.mkString(",")}")

    // column reconciliation
    var upCols = columnsAndIgnorable(up)
    var downCols = columnsAndIgnorable(down)
    for (c <- upCols.keys.toSeq if downCols.contains(c)) {
      upCols -= c; downCols -= c
    }
    // both extended-column probes read the POST-common-removal maps
    // (:446-457): an extended column present on BOTH sides was deleted
    // as common, so it reads as downstream-MISSING and NOT as an
    // upstream duplicate — the reference's exact (surprising) behavior
    val upDup = extendedCols.filter(upCols.contains)
    val downMissing = extendedCols.filterNot(downCols.contains)
    upCols --= extendedCols
    if (upDup.nonEmpty)
      out += Opt(Failure, "ext-dup-up", upDup.mkString(","))
    if (downMissing.nonEmpty)
      out += Opt(Failure, "ext-missing-down", downMissing.mkString(","))
    if (upDup.nonEmpty || downMissing.nonEmpty) return out.result()

    if (upCols.nonEmpty)
      out += Opt(Warning, "cols-up-extra",
        upCols.keys.toSeq.sorted.mkString(","))
    val required = downCols.filterNot(_._2)
    if (required.nonEmpty)
      out += Opt(Warning, "cols-down-extra",
        required.keys.toSeq.sorted.mkString(","))
    out.result()
  }

  /** handleOpts' Result-state fold (:262-280). */
  def foldResult(opts: Seq[Opt]): String =
    if (opts.exists(_.state == Failure)) Failure
    else if (opts.exists(_.state == Warning)) Warning
    else Success
}
