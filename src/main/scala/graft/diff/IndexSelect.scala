package graft.diff

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Index-field split-column selection — the piece that makes the diff
 * engine self-configuring: which indexed columns to chunk a table on.
 * Composes three reference kernels:
 *
 *  - `utils.GetBetterIndex` (sync_diff_inspector/utils/utils.go:
 *    1051-1078): the first primary/unique index short-circuits ALONE;
 *    otherwise every index is ranked by its FIRST column's selectivity
 *    `COUNT(DISTINCT col)/COUNT(1)` (GetSelectivity, utils.go:1081-1095),
 *    descending;
 *  - `indexFields.MatchesIndex` (splitter/index_fields.go:64-97): a user
 *    "index-fields" config matches an index only on EXACT column-set
 *    equality (the Go compares id-sorted column lists); empty matches all;
 *  - the splitters' shared selection loop (splitter/bucket.go:169-211,
 *    splitter/limit.go:75-120): first index that matches the resume
 *    checkpoint's index id, loses no column to ignore-columns
 *    (GetColumnsFromIndex returns fewer than the index declares), matches
 *    index-fields, and has no hidden (expression) column;
 *  - `GetSplitFields` (splitter/random.go:231-272): user fields verbatim
 *    (missing column = error); else the first FindAllIndex entry with no
 *    hidden column; else the first non-hidden table column.
 *
 * Spark shape: all candidate selectivities come out of ONE distributed
 * aggregate ([[selectivityPpm]] — the reference issues a COUNT(DISTINCT)
 * round-trip per index); ratios are carried in parts-per-million so the
 * ranking is integer-exact across engines. Everything after the agg is
 * control-plane (an index list fold).
 */
object IndexSelect {

  /** One index candidate: declaration id, name, ordered column names. */
  final case class IndexInfo(id: Long, name: String, columns: Seq[String],
                             primary: Boolean = false, unique: Boolean = false)

  /** Table shape for selection: ordered (column, hidden) pairs, the
    * indices, and the ignore-columns config (columns the diff drops from
    * the table info — an index referencing one is unusable). */
  final case class TableShape(columns: Seq[(String, Boolean)],
                              indices: Seq[IndexInfo],
                              ignored: Set[String] = Set.empty) {
    def hidden: Set[String] = columns.collect { case (n, true) => n }.toSet
  }

  /** tidb dbutil.FindAllIndex's contract as GetBetterIndex consumes it:
    * primary first, then unique, declaration order within a class. */
  def findAllIndex(t: TableShape): Seq[IndexInfo] =
    t.indices.sortBy(ix => if (ix.primary) 0 else if (ix.unique) 1 else 2)

  /** utils.GetBetterIndex (utils.go:1054-1078). `selPpm` maps a column to
    * its selectivity in ppm; unseen columns rank 0. Ties keep
    * FindAllIndex order (the Go's sort.Slice is tie-unstable; stable here
    * so both diff sides derive the same list). */
  def betterIndex(t: TableShape, selPpm: Map[String, Long]): Seq[IndexInfo] = {
    val all = findAllIndex(t)
    all.find(ix => ix.primary || ix.unique) match {
      case Some(ix) => Seq(ix)
      case None => all.sortBy(ix => -selPpm.getOrElse(ix.columns.head, 0L))
    }
  }

  /** indexFields.MatchesIndex (index_fields.go:64-97). */
  def matchesFields(fields: Seq[String], ix: IndexInfo): Boolean =
    fields.isEmpty ||
      (ix.columns.size == fields.size && ix.columns.toSet == fields.toSet)

  /** The splitters' shared selection loop (bucket.go:169-211,
    * limit.go:75-120): first candidate passing every filter. */
  def chooseIndex(t: TableShape, indices: Seq[IndexInfo],
                  fields: Seq[String] = Seq.empty,
                  checkpointIndexId: Option[Long] = None): Option[IndexInfo] = {
    val hid = t.hidden
    indices.find { ix =>
      checkpointIndexId.forall(_ == ix.id) &&
        !ix.columns.exists(t.ignored) &&
        matchesFields(fields, ix) &&
        !ix.columns.exists(hid)
    }
  }

  /** GetSplitFields (random.go:231-272). */
  def splitFields(t: TableShape, userFields: Seq[String])
      : Either[String, Seq[String]] =
    if (userFields.nonEmpty) {
      userFields.find(f => !t.columns.exists(_._1 == f)) match {
        case Some(m) => Left(s"column $m not found")
        case None => Right(userFields)
      }
    } else {
      val hid = t.hidden
      findAllIndex(t).find(ix => !ix.columns.exists(hid))
        .map(ix => Right(ix.columns)).getOrElse(
          t.columns.collectFirst { case (n, false) => Seq(n) }
            .toRight("not found column"))
    }

  /** Every candidate first-column selectivity in ONE distributed agg,
    * in parts-per-million (integer-exact cross-engine). */
  def selectivityPpm(df: DataFrame, cols: Seq[String]): Map[String, Long] = {
    val aggs = cols.map(c => countDistinct(col(c)).as(s"d_$c")) :+
      count(lit(1)).as("n")
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("n")
    cols.map(c => c -> r.getAs[Long](s"d_$c") * 1000000L / n).toMap
  }

  /** End-to-end self-configuration: rank by measured selectivity, then run
    * the selection loop — the chunk key ChunkDiff should split on. */
  def chooseSplitColumn(df: DataFrame, t: TableShape,
                        fields: Seq[String] = Seq.empty,
                        checkpointIndexId: Option[Long] = None)
      : Option[IndexInfo] = {
    val firstCols = t.indices.map(_.columns.head).distinct
      .filter(c => t.columns.exists(x => x._1 == c && !x._2))
    val ranked = betterIndex(t, selectivityPpm(df, firstCols))
    chooseIndex(t, ranked, fields, checkpointIndexId)
  }
}
