package graft.diff

/**
 * sync_diff's table-structure comparison — utils.CompareStruct
 * (sync_diff_inspector/utils/utils.go:408-598) plus its helpers
 * isCompatible (:324-354), sameProperties (:356-377) and equalFK
 * (:379-406). The verdict feeds the report's "structure not equal
 * [, and data-check is skipped]" prose and decides whether the data
 * phase runs at all:
 *
 *  - COLUMN differences are fatal for data checking (isSkip = true):
 *    count mismatch, a POSITIONAL name mismatch, a type outside the
 *    compatibility classes ({ints}, {blobs}, {strings} — equal class
 *    passes even when the exact type differs), or, for string types, a
 *    display-length mismatch (charset/collation differences only warn);
 *  - FOREIGN KEYS compare positionally and name-blind (case-insensitive
 *    ref schema/table, on-delete/on-update, column lists) — a mismatch
 *    makes the structs unequal but data checking proceeds;
 *  - INDEX RECONCILIATION: an upstream index whose downstream namesake
 *    differs in columns (count, offset or name) is DELETED from both
 *    sides; an index present on only some sides is unilateral. If any
 *    bilateral index survives, unilateral indices are deleted too (the
 *    splitter must not chunk on an index one side lacks); with no
 *    bilateral index the unilateral set stays (warned) and nothing is
 *    removed. Any deletion, unilateral leftover, or FK mismatch makes
 *    isEqual false — without skipping the data phase.
 */
object StructCompare {

  final case class ColDef(name: String, tpe: String, flen: Int = -1)
  final case class FkDef(refSchema: String, refTable: String,
      onDelete: Int, onUpdate: Int, cols: Seq[String], refCols: Seq[String])
  final case class IndexDef(name: String, cols: Seq[(String, Int)])
  final case class TableStruct(name: String, columns: Seq[ColDef],
      fks: Seq[FkDef] = Nil, indices: Seq[IndexDef] = Nil)

  private val IntTypes = Set("tiny", "short", "long", "longlong", "int24")
  private val BlobTypes = Set("tinyblob", "mediumblob", "longblob", "blob")
  private val StringTypes = Set("varstring", "string", "varchar")

  private def typeClass(t: String): Int =
    if (IntTypes(t)) 1 else if (BlobTypes(t)) 2
    else if (StringTypes(t)) 3 else 0

  /** utils.go:324-354 — exact match, or the same non-zero class. */
  def isCompatible(t1: String, t2: String): Boolean =
    t1 == t2 || (typeClass(t1) != 0 && typeClass(t1) == typeClass(t2))

  /** utils.go:356-377 — string types must agree on display length;
    * charset/collation diffs only warn; other types always pass. */
  def sameProperties(c1: ColDef, c2: ColDef): Boolean =
    !StringTypes(c1.tpe) || c1.flen == c2.flen

  /** utils.go:379-406 — positional, name-blind, case-insensitive. */
  def equalFK(a: FkDef, b: FkDef): Boolean =
    a.refSchema.toLowerCase == b.refSchema.toLowerCase &&
      a.refTable.toLowerCase == b.refTable.toLowerCase &&
      a.onDelete == b.onDelete && a.onUpdate == b.onUpdate &&
      a.cols.length == b.cols.length && a.refCols.length == b.refCols.length &&
      a.cols.map(_.toLowerCase) == b.cols.map(_.toLowerCase) &&
      a.refCols.map(_.toLowerCase) == b.refCols.map(_.toLowerCase)

  final case class StructResult(isEqual: Boolean, isSkip: Boolean,
      deletedIndices: Set[String], unilateralKept: Set[String],
      upstreams: Seq[TableStruct], downstream: TableStruct)

  def compareStruct(ups: Seq[TableStruct], down: TableStruct): StructResult = {
    def fatal = StructResult(isEqual = false, isSkip = true,
      Set.empty, Set.empty, ups, down)
    // columns (utils.go:414-466)
    for (up <- ups) {
      if (up.columns.length != down.columns.length) return fatal
      for ((c, i) <- up.columns.zipWithIndex) {
        val d = down.columns(i)
        if (c.name != d.name) return fatal
        if (!isCompatible(c.tpe, d.tpe)) return fatal
        if (!sameProperties(c, d)) return fatal
      }
    }
    // foreign keys (utils.go:469-502)
    val fkEqual = ups.forall { up =>
      up.fks.length == down.fks.length &&
        up.fks.zip(down.fks).forall { case (a, b) => equalFK(a, b) }
    }
    // index reconciliation (utils.go:504-595)
    val deleted = scala.collection.mutable.Set.empty[String]
    val unilateral = scala.collection.mutable.Set.empty[String]
    val downCnt = scala.collection.mutable.Map.empty[String, Int]
    down.indices.foreach(ix => downCnt(ix.name) = 0)
    for (up <- ups; ix <- up.indices if !deleted(ix.name)) {
      down.indices.find(_.name == ix.name) match {
        case Some(dx) =>
          if (dx.cols.length != ix.cols.length || dx.cols != ix.cols)
            deleted += ix.name
          else downCnt(ix.name) += 1
        case None => unilateral += ix.name
      }
    }
    var existBilateral = false
    for (dx <- down.indices if !deleted(dx.name)) {
      if (downCnt(dx.name) < ups.length) unilateral += dx.name
      else existBilateral = true
    }
    val (toDelete, kept) =
      if (existBilateral) ((deleted ++ unilateral).toSet, Set.empty[String])
      else (deleted.toSet, unilateral.toSet)
    def strip(t: TableStruct) =
      t.copy(indices = t.indices.filterNot(ix => toDelete(ix.name)))
    StructResult(
      isEqual = deleted.isEmpty && unilateral.isEmpty && fkEqual,
      isSkip = false,
      deletedIndices = toDelete, unilateralKept = kept,
      upstreams = ups.map(strip), downstream = strip(down))
  }
}
