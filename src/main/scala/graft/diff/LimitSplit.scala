package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sorted-walk chunk splitter — the reference's `LimitIterator`
 * (sync_diff_inspector/splitter/limit.go:53-287): the fallback when a
 * table has no usable bucket stats and random sampling is not wanted
 * (a plain MySQL upstream without index statistics hits this path
 * first). The Go walks the table by repeated
 * `SELECT key.. WHERE <after tag> ORDER BY key.. LIMIT chunkSize,1`
 * probes (generateLimitQueryTemplate, limit.go:306-317): each probe row
 * becomes the current chunk's INCLUSIVE upper and the next chunk's
 * EXCLUSIVE lower, so every bounded chunk covers exactly
 * `chunkSize + 1` rows of the key order — (lower, upper] membership,
 * chunk.go:278-318 — and the final chunk is open-ended. Chunk ids are
 * the sequential `bucketID` (Limit chunks carry it as both bucket-index
 * sides, limit.go:230-268). Checkpoint resume
 * (NewLimitIteratorWithCheckpoint, limit.go:58-120): the saved chunk's
 * upper bounds seed the walk's lower tag and ids restart at
 * `BucketIndexRight + 1`; a saved chunk with NO upper means the table
 * was finished (`undone` stays false) and the iterator is empty.
 *
 * Spark shape: the probe loop collapses into ONE range-partitioned sort
 * of the keys-only projection — per-partition counts give each
 * partition's global offset (a 32-row collect), then a second pass over
 * the SAME shuffle output (Spark reuses the map stage across jobs)
 * emits the rows at global 1-indexed positions `k·(chunkSize+1)` as the
 * chunk boundaries. No driver-side probe round-trips: the reference
 * issues rows/chunkSize full index-order scans against MySQL; this is
 * one shuffle + two reduce passes regardless of chunk count.
 *
 * The key tuple must be UNIQUE (a PK / unique index — the columns the
 * reference's handle-column walk targets): with duplicate boundary
 * values the Go's value-exclusive `> lower` re-probe and fixed
 * position arithmetic diverge, so this splitter, like the reference's
 * chunk algebra, is only exact on unique keys.
 *
 * Scale shape (100 TB): the shuffle carries only the index-key columns;
 * the boundary collect is rows/chunkSize entries (≤10k with the
 * auto chunk size, utils.go:1097-1105) — control-plane. Membership
 * assignment is a codegen'd lexicographic when-cascade, no join.
 */
object LimitSplit {

  /** One produced chunk: bounds are key tuples, (lower, upper];
    * None = unbounded on that side. `bucketId` is the reference's
    * sequential Limit bucket id. */
  final case class LimitChunk(bucketId: Int, lower: Option[Seq[Any]],
                              upper: Option[Seq[Any]])

  /** (keys) > bound, lexicographic — the chunk WHERE clause's lower leg
    * (chunk.go:281: `b > B1 OR (b = B1 AND c > C1)`). */
  def lexGt(keys: Seq[Column], bound: Seq[Any]): Column =
    keys.zip(bound).foldRight(lit(false)) { case ((k, b), rest) =>
      (k > lit(b)) || (k === lit(b) && rest)
    }

  /** (keys) <= bound, lexicographic — the upper leg. */
  def lexLe(keys: Seq[Column], bound: Seq[Any]): Column =
    keys.zip(bound).foldRight(lit(true)) { case ((k, b), rest) =>
      (k < lit(b)) || (k === lit(b) && rest)
    }

  /**
   * The probe rows of the whole walk in one pass: the key tuples at
   * global 1-indexed sort positions `k·(chunkSize+1)`, k = 1, 2, …,
   * after `startAfter` (exclusive). One keys-only range-partition sort;
   * the per-partition counts and the boundary filter are two reduce
   * passes over the same shuffle files.
   */
  def boundaries(df: DataFrame, keys: Seq[String], chunkSize: Long,
                 startAfter: Option[Seq[Any]] = None): Seq[Seq[Any]] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val step = chunkSize + 1
    val kc = keys.map(col)
    val base0 = df.select(kc: _*)
    val base = startAfter.fold(base0)(b => base0.where(lexGt(kc, b)))
    val sorted = base.repartitionByRange(kc: _*).sortWithinPartitions(kc: _*)
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)))
      .collect().sortBy(_._1) // one entry per partition — control-plane
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid + 1, acc + n)
    }.init.map { case (pid, off) => pid -> off }.toMap
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val start = offsets(pid)
      it.zipWithIndex.collect {
        case (row, i) if (start + i + 1) % step == 0 =>
          (start + i + 1, row.toSeq)
      }
    }.collect().sortBy(_._1).map(_._2).toSeq // rows/step entries
  }

  /** Assemble the walk's chunks from its boundary rows: chunk k =
    * (boundary k−1, boundary k], the trailing chunk open-ended, ids
    * sequential from `beginId` (limit.go:230-268). */
  def assemble(bounds: Seq[Seq[Any]], startLower: Option[Seq[Any]],
               beginId: Int): Seq[LimitChunk] =
    (0 to bounds.size).map { i =>
      LimitChunk(beginId + i,
        if (i == 0) startLower else Some(bounds(i - 1)),
        if (i < bounds.size) Some(bounds(i)) else None)
    }

  /** Full walk from the table start. */
  def chunks(df: DataFrame, keys: Seq[String], chunkSize: Long)
      : Seq[LimitChunk] =
    assemble(boundaries(df, keys, chunkSize), None, 0)

  /** limit.go:141-152: an explicit configured chunk size wins; else the
    * auto size (utils.CalculateChunkSize — 50k, or rows/10k past 500M)
    * when the table has a usable index, else ONE chunk — the no-index
    * table diffs as a single full scan. */
  def autoChunkSize(configured: Long, remainingRows: Long,
                    hasIndex: Boolean): Long =
    if (configured > 0) configured
    else if (hasIndex) BucketSplit.calculateChunkSize(remainingRows)
    else math.max(remainingRows, 1L)

  /**
   * Resume from a checkpointed chunk (NewLimitIteratorWithCheckpoint,
   * limit.go:58-120): its upper seeds the lower tag, ids restart at
   * `bucketId + 1`; a saved chunk without an upper (the walk's final
   * open chunk) means the table is DONE — empty result. A checkpoint
   * whose bound arity mismatches the selected index columns also yields
   * EMPTY: the Go logs "skip checkpoint" and breaks before any bound
   * sets HasUpper (limit.go:100-108), so `undone` stays false and the
   * iterator closes as finished — quirk kept as-is.
   */
  def resumeChunks(df: DataFrame, keys: Seq[String], chunkSize: Long,
                   checkpoint: LimitChunk): Seq[LimitChunk] =
    checkpoint.upper match {
      case None => Seq.empty
      case Some(u) if u.size != keys.size => Seq.empty
      case Some(u) =>
        assemble(boundaries(df, keys, chunkSize, Some(u)), Some(u),
          checkpoint.bucketId + 1)
    }

  /** Membership by range predicate — the form the reference's chunk
    * WHERE clauses take. −1 = no chunk (unreachable when the chunk set
    * tiles the table). */
  def assignByRanges(keys: Seq[Column], cs: Seq[LimitChunk]): Column =
    cs.foldLeft(lit(-1)) { (acc, c) =>
      val cond = c.lower.map(lexGt(keys, _)).getOrElse(lit(true)) &&
        c.upper.map(lexLe(keys, _)).getOrElse(lit(true))
      when(cond, c.bucketId).otherwise(acc)
    }

  /** Membership by boundary count: beginId + #boundaries strictly below
    * the key. Must agree with [[assignByRanges]] — the tiling proof. */
  def assignByBoundaries(keys: Seq[Column], bounds: Seq[Seq[Any]],
                         beginId: Int): Column =
    bounds.foldLeft(lit(beginId)) { (acc, b) =>
      acc + when(lexGt(keys, b), 1).otherwise(0)
    }
}
