package graft.operators

/**
 * DM's WHERE-key selection for UPDATE/DELETE (reference
 * pkg/sqlmodel/where_handle.go + row_change.go:291-340): which key
 * identifies a row at the downstream decides both correctness (nullable
 * unique keys can't be trusted blindly) and speed (PK point lookups).
 * The rules, built once per (source, target) table pair:
 *
 *  - candidate indexes are the TARGET's unique PUBLIC indexes plus a
 *    synthesized single-column primary when the PK is the row handle
 *    (:200-247, :283-300); an index referencing a column the SOURCE
 *    lacks is dropped entirely (rewriteColsOffset → nil);
 *  - indexes touching a hidden/generated source column stay usable for
 *    causality but never for WHERE (:228-233);
 *  - the preferred index: a PRIMARY wins UNCONDITIONALLY — even over a
 *    unique-not-null index found earlier in the list (:237-241, "PK is
 *    prior to UNIQUE NOT NULL for better performance"); otherwise the
 *    FIRST unique index whose columns are all NOT NULL at the target;
 *  - per row (:312-340): the preferred index if any, else the first
 *    unique index whose values in THIS row are all non-null — and that
 *    hit is swapped to the FRONT of the list (a last-used cache), else
 *    the full visible-column image;
 *  - the rendered WHERE uses `col = ?` per value and `col IS ?` for a
 *    NULL (row_change.go:291-307) — prepared-statement NULL-safe form.
 */
object WhereHandle {

  final case class Col(name: String, notNull: Boolean = false,
      hidden: Boolean = false)
  final case class Idx(name: String, columns: Seq[String],
      unique: Boolean = true, primary: Boolean = false,
      public: Boolean = true)
  final case class Table(columns: Seq[Col], indices: Seq[Idx] = Nil,
      pkIsHandleCol: Option[String] = None)

  final class Handle(
      /** unique indexes usable for WHERE, mutable for swap-to-front */
      val uniqueIdxs: scala.collection.mutable.ArrayBuffer[Idx],
      /** PK, or the first all-NOT-NULL unique index */
      val uniqueNotNullIdx: Option[Idx],
      /** every rewritten unique index incl. hidden-column ones */
      val causalityIdxs: Seq[Idx],
      val visibleColumns: Seq[String])

  /** GetWhereHandle (:200-247). */
  def build(source: Table, target: Table): Handle = {
    val sourceCols = source.columns.map(c => c.name.toLowerCase -> c).toMap
    val targetNotNull =
      target.columns.filter(_.notNull).map(_.name.toLowerCase).toSet
    val synthesized = target.pkIsHandleCol.map(pk =>
      Idx(name = "PRIMARY", columns = Seq(pk), unique = true,
        primary = true, public = true))
    val candidates = target.indices ++ synthesized

    val unique = scala.collection.mutable.ArrayBuffer.empty[Idx]
    val causality = scala.collection.mutable.ArrayBuffer.empty[Idx]
    var notNullIdx: Option[Idx] = None
    candidates.foreach { idx =>
      if (idx.unique && idx.public &&
        idx.columns.forall(c => sourceCols.contains(c.toLowerCase))) {
        causality += idx
        val hasHidden =
          idx.columns.exists(c => sourceCols(c.toLowerCase).hidden)
        if (!hasHidden) {
          unique += idx
          if (idx.primary) notNullIdx = Some(idx) // PK overwrites
          else if (notNullIdx.isEmpty &&
            idx.columns.forall(c => targetNotNull.contains(c.toLowerCase)))
            notNullIdx = Some(idx)
        }
      }
    }
    new Handle(unique, notNullIdx, causality.toSeq,
      source.columns.filterNot(_.hidden).map(_.name))
  }

  /** getWhereIdxByData (:312-340): the per-row index choice, with the
    * swap-to-front last-used cache on the data-dependent leg. */
  def whereIdx(h: Handle, row: Map[String, Any]): Option[Idx] =
    h.uniqueNotNullIdx.orElse {
      h.uniqueIdxs.zipWithIndex.collectFirst {
        case (idx, i) if idx.columns.forall(c => rowGet(row, c) != null) =>
          val tmp = h.uniqueIdxs(0)
          h.uniqueIdxs(0) = h.uniqueIdxs(i)
          h.uniqueIdxs(i) = tmp
          idx
      }
    }

  private def rowGet(row: Map[String, Any], col: String): Any =
    row.collectFirst { case (k, v) if k.equalsIgnoreCase(col) => v }.orNull

  /** whereColumnsAndValues + genWhere: the rendered clause and its bound
    * values (NULL renders the NULL-safe `IS ?`). */
  def genWhere(h: Handle, row: Map[String, Any]): (String, Seq[Any]) = {
    val cols = whereIdx(h, row).map(_.columns).getOrElse(h.visibleColumns)
    val values = cols.map(c => rowGet(row, c))
    val clause = cols.zip(values).map { case (c, v) =>
      val q = "`" + c.replace("`", "``") + "`"
      if (v == null) s"$q IS ?" else s"$q = ?"
    }.mkString(" AND ")
    (clause, values)
  }
}
