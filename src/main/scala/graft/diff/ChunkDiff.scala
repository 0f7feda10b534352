package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch table-equivalence engine (SURVEY.md §2.13) — the Spark-native
 * sync_diff_inspector.
 *
 * Reference pipeline (sync_diff_inspector/diff/diff.go:284-660): split both
 * tables into key-range chunks, compute per-chunk
 * `COUNT + BIT_XOR(hash(row))` digests on each side, and for mismatched
 * chunks drill down to row level, emitting fix-SQL.
 *
 * Spark-first: chunking is a window `ntile` (or any deterministic bucketing)
 * instead of stats-guided range scans; the checksum is one hash aggregation
 * per side; and the row-level drill-down is a single full-outer join on the
 * key — no binary search needed because the join IS the row-level diff at
 * scale (one shuffle, AQE handles skew). At 100 TB both sides stay fully
 * distributed; nothing is collected to the driver.
 */
object ChunkDiff {

  /**
   * A1 — order-insensitive row-set digest: BIT_XOR over a 60-bit integer
   * carved from md5 of the canonicalized row. Canonical form must use
   * engine-portable renderings only: ints, decimal-cast floats, ISO dates.
   * (reference sync_diff_inspector/utils/utils.go:860-918 uses
   * CONV(SUBSTRING(MD5(CONCAT_WS(...)),...),16,10) — same construction.)
   */
  def rowDigest(canonicalCols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", canonicalCols: _*)), 1, 15), 16, 10)
      .cast("long")

  /** V1 — deterministic chunking by ntile over the key order. Exact-size
    * chunks and oracle-reproducible, but the global window serializes one
    * partition — use [[withRangeChunk]] at scale. */
  def withChunk(df: DataFrame, orderKeys: Seq[Column], nChunks: Int): DataFrame =
    df.withColumn("chunk_id", ntile(nChunks).over(Window.orderBy(orderKeys: _*)))

  /**
   * V1 scale path: range-partition on the key (distributed sampling picks
   * boundaries — the analog of the reference's stats-bucket splitter) and
   * use the partition id as the chunk id. No global sort, no single-task
   * stage; chunk sizes are approximate, which is fine for checksum compare
   * (V2) — only chunk MEMBERSHIP must agree between the two sides, and the
   * same boundaries can be reused by both via a join on chunk_id ranges.
   */
  def withRangeChunk(df: DataFrame, orderKeys: Seq[Column], nChunks: Int): DataFrame =
    df.repartitionByRange(nChunks, orderKeys: _*)
      .withColumn("chunk_id", spark_partition_id())

  /**
   * A4 — stats-guided split points (the reference samples `ORDER BY rand()
   * LIMIT n` keys, sync_diff_inspector/utils/utils.go:929-960; bucket
   * splitter uses index stats). Spark's approxQuantile IS that sampler:
   * returns nChunks-1 key boundaries usable as both-sides-identical range
   * predicates — unlike [[withRangeChunk]]'s internal sampling, these
   * boundaries can be SHARED across two tables being compared.
   */
  def splitPoints(df: DataFrame, keyCol: String, nChunks: Int,
                  relErr: Double = 0.01): Array[Double] = {
    val probs = (1 until nChunks).map(_.toDouble / nChunks).toArray
    df.stat.approxQuantile(keyCol, probs, relErr)
  }

  /** Chunk id from shared split points: chunk = #boundaries below the key
    * (one when/otherwise cascade — codegen'd, no shuffle). */
  def chunkBySplitPoints(key: Column, points: Array[Double]): Column =
    points.foldLeft(lit(0)) { (acc, p) => acc + when(key > p, 1).otherwise(0) }

  /** Key bounds for [[chunkByWidth]] — one distributed min/max agg; the two
    * longs to the driver are the same metadata fetch the reference's split
    * planner does before chunking. */
  def widthBounds(df: DataFrame, keyCol: String): (Long, Long) = {
    val r = df.agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long")).head()
    (r.getLong(0), r.getLong(1))
  }

  /**
   * V1 scale path with ORACLE-REPRODUCIBLE boundaries: equal-width key
   * ranges from the table's min/max. Pure per-row arithmetic — no window,
   * no sort, no shuffle; both diff sides (and the oracle) assign identical
   * chunk membership from the same two numbers. Exact integer division via
   * (a - a%b)/b keeps it bit-stable across engines (exact while
   * (hi-lo)*nChunks < 2^53 — holds far past 100 TB key spans).
   */
  def chunkByWidth(key: Column, lo: Long, hi: Long, nChunks: Int): Column = {
    val span = lit(hi - lo + 1L)
    val scaled = (key - lit(lo)) * nChunks
    least(lit(nChunks - 1), ((scaled - scaled % span) / span).cast("int"))
  }

  /**
   * V1 composite/string-key path (reference bucket splitter
   * sync_diff_inspector/splitter/bucket.go:38-300 walks index stats over
   * ARBITRARY index columns): when the chunk key is composite or
   * non-numeric, width arithmetic doesn't apply — chunk membership comes
   * from the portable row-key hash instead. Deterministic across engines,
   * uniformly balanced regardless of key type or skew, and both diff sides
   * agree with no shared state at all.
   */
  def chunkByKeyHash(keys: Seq[Column], nChunks: Int): Column =
    pmod(graft.core.Hashing.portableLong(
      concat_ws("|", keys.map(_.cast("string")): _*)), lit(nChunks.toLong))
      .cast("int")

  /** V2 — per-chunk (count, checksum) digest over equal-width key chunks.
    * One hash aggregation per side; fully parallel (the former ntile form
    * moved every row through a single-task global window). */
  def chunkChecksums(df: DataFrame, orderKeys: Seq[Column], nChunks: Int,
                     canonicalCols: Seq[Column]): DataFrame = {
    val keyCol = orderKeys.head
    val (lo, hi) = widthBounds(df, keyCol.toString())
    df.withColumn("row_digest", rowDigest(canonicalCols))
      .withColumn("chunk_id", chunkByWidth(keyCol, lo, hi, nChunks))
      .groupBy("chunk_id")
      .agg(
        count(lit(1)).as("cnt"),
        expr("bit_xor(row_digest)").as("checksum"),
        min(keyCol).as("chunk_lo"),
        max(keyCol).as("chunk_hi"))
  }

  /**
   * J4/V3 — row-level diff via full-outer join on the key columns.
   * Emits one row per difference with a class:
   *   missing   — key present in source, absent in target (needs INSERT)
   *   extra     — key absent in source, present in target (needs DELETE)
   *   different — key on both sides but the digest differs (needs REPLACE)
   */
  def rowDiff(source: DataFrame, target: DataFrame, keyCols: Seq[String],
              canonicalCols: DataFrame => Seq[Column]): DataFrame =
    rowDiffDigested(
      source.withColumn("digest", rowDigest(canonicalCols(source))),
      target.withColumn("digest", rowDigest(canonicalCols(target))),
      keyCols)

  /** [[rowDiff]] over PRE-DIGESTED sides (each carries a `digest`
    * column). NOTE: sharing a digested-and-PERSISTED base frame across
    * consumers was measured 50% SLOWER at sf10 than recomputing the
    * digest per consumer (the columnar cache write of wide rows
    * dominates — round-19 NOTES); this split exists for callers that
    * already hold a digested frame in-plan, not as license to cache
    * one. */
  def rowDiffDigested(source: DataFrame, target: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val s = source.select(keyCols.map(col) :+ col("digest").as("s_digest"): _*)
    val t = target.select(keyCols.map(col) :+ col("digest").as("t_digest"): _*)
    s.join(t, keyCols, "full_outer")
      .withColumn("diff_type",
        when(col("t_digest").isNull, "missing")
          .when(col("s_digest").isNull, "extra")
          .when(col("s_digest") =!= col("t_digest"), "different"))
      .filter(col("diff_type").isNotNull)
  }

  /**
   * Ignore-columns support (reference sync_diff_inspector config
   * `ignore-columns`, sync_diff_inspector/source/common/table_diff.go —
   * columns excluded from both the checksum and the row compare, used when
   * a column is expected to diverge: timestamps, generated columns,
   * replica-local counters). Rows differing ONLY in ignored columns
   * compare equal. Canonical columns are passed NAMED so the exclusion is
   * by config string, exactly like the reference's per-table column list.
   */
  def canonicalIgnoring(named: Seq[(String, Column)],
      ignore: Set[String]): Seq[Column] =
    named.collect { case (n, c) if !ignore.contains(n) => c }

  /** [[rowDiff]] with the reference's ignore-columns semantics applied to
    * both sides' digests. */
  def rowDiffIgnoring(source: DataFrame, target: DataFrame,
      keyCols: Seq[String], namedCanonical: DataFrame => Seq[(String, Column)],
      ignore: Set[String]): DataFrame =
    rowDiff(source, target, keyCols,
      df => canonicalIgnoring(namedCanonical(df), ignore))

  /**
   * Per-table `range` config (reference sync_diff_inspector config
   * `[[table-config]] range = "..."` — an arbitrary SQL predicate applied
   * to BOTH sides before chunking / checksums / row compare, used to diff
   * a slice of a huge table or to align sides with different retention).
   * The predicate string goes through Catalyst `expr`, so bound predicates
   * reach the parquet scan as pushed filters (at 100 TB the range is the
   * difference between scanning a partition and scanning the table).
   * Side-asymmetric membership is intentional and matches the reference:
   * a row whose perturbed value crosses the range boundary appears on one
   * side only and classifies as missing/extra.
   */
  def withRange(df: DataFrame, rangeSql: String): DataFrame =
    df.filter(expr(rangeSql))

  /**
   * V4 — fix-SQL generation: REPLACE for missing/different, DELETE for
   * extra (reference sync_diff_inspector/diff/diff.go:792-890). Pure string
   * building from typed columns; values must be rendered engine-portably by
   * the caller (ints / decimal casts / quoted strings).
   */
  def fixSql(diff: DataFrame, table: String, keyCols: Seq[String],
             valueExprs: Seq[Column]): DataFrame =
    diff.withColumn("fix_sql",
      when(col("diff_type") === "extra",
        concat(lit(s"DELETE FROM $table WHERE "),
          concat_ws(" AND ", keyCols.map(k => concat(lit(s"$k = "), col(k))): _*),
          lit(";")))
        .otherwise(
          concat(lit(s"REPLACE INTO $table VALUES ("),
            concat_ws(", ", valueExprs: _*), lit(");"))))
}
