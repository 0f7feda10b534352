package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Keyless point-in-interval (range) join at scale.
 *
 * Spark plans `points JOIN intervals ON p >= s AND p < e` — no equi
 * condition — as BroadcastNestedLoopJoin (or CartesianProduct when neither
 * side fits a broadcast): O(|P|·|I|) comparisons no matter how selective
 * the ranges are. That shape shows up constantly downstream of a CDC feed
 * (event-to-maintenance-window attribution, IP-to-geo lookup, validity
 * windows without a shard key) and is the canonical 100 TB cliff: a 1e9 ×
 * 1e6 nested loop never finishes, while the same join touches only a few
 * candidate pairs per time bin.
 *
 * [[pointInInterval]] rewrites it to the binned form (the public
 * "range join optimization"): each interval explodes onto the fixed-width
 * bins it covers, each point maps to exactly ONE bin, and the join becomes
 * an equi-join on bin id with the original range predicate as residual.
 * Because a point's bin is unique, a qualifying (point, interval) pair
 * meets in exactly one bin — no post-join dedup. Catalyst then plans a
 * plain shuffled equi-join: partial pruning, AQE, and broadcast of a small
 * exploded side all apply. PlanShapeSpec pins the absence of
 * BroadcastNestedLoopJoin/CartesianProduct from the rewritten plan.
 *
 * Cost model: shuffled rows = |P| + Σ_i (⌈len_i/binSize⌉ + 1); candidate
 * pairs per bin = points_in_bin × intervals_overlapping_bin. `binSize`
 * near the median interval length keeps the expansion factor ≤ ~2-3 while
 * bins stay selective; [[recommendedBinSize]] reads that knob off the
 * data (the q85 `recommendedCells` pattern: a measured rule, not a
 * constant).
 *
 * Reference context: tiflow's joins are all keyed (capability classes
 * J1-J5); this operator is the warehouse-side shape those feeds get
 * queried with once landed.
 */
object Ranges {

  /**
   * Join `points` to every interval of `intervals` with
   * `start <= point < end`, via bin-equi-join + residual. Both inputs are
   * returned with all their columns; each qualifying pair appears exactly
   * once. Domain: values must be non-negative longs (event-time µs/ns);
   * empty intervals (end <= start) match nothing by construction.
   */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSize: Long, maxBinsPerInterval: Long = MaxBinsDefault): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")
    requireDisjoint(points, intervals, Seq(pointCol, startCol, endCol))
    val p = points.withColumn("_g_bin", col(pointCol).divLong(binSize))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_g_ivbin", explode(sequence(
        col(startCol).divLong(binSize),
        guardedStop(col(startCol), col(endCol), binSize,
          maxBinsPerInterval))))
    p.join(iv,
        p("_g_bin") === iv("_g_ivbin") &&
          col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_g_bin", "_g_ivbin")
  }

  private implicit final class DivOps(private val c: Column) {
    def divLong(d: Long): Column = graft.core.Exact.divLong(c, d)
  }

  /** The residual predicates resolve the NAMED join columns by bare name
    * across the join, so any of those names existing on BOTH sides would
    * bind ambiguously or to the wrong side — require each referenced
    * column to live on exactly one input (the Merge input-validation
    * pattern). Unreferenced passthrough columns may freely share names. */
  private def requireDisjoint(l: DataFrame, r: DataFrame,
                              referenced: Seq[String]): Unit = {
    def names(df: DataFrame) =
      df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val shared = names(l).intersect(names(r))
    val clash = referenced
      .map(_.toLowerCase(java.util.Locale.ROOT)).filter(shared)
    require(clash.isEmpty,
      s"range join predicate columns exist on both inputs: " +
        s"${clash.distinct.sorted.mkString(", ")} — rename one side first")
  }

  /** Explosion cap: an open-validity sentinel end (Long.MaxValue — the
    * SCD2 "current row" encoding) would explode onto billions of bins and
    * kill the job with an opaque Sequence error; fail FAST per offending
    * row with an actionable message instead (clamping would silently drop
    * matches). */
  val MaxBinsDefault = 1L << 20
  private def guardedStop(s: Column, e: Column, binSize: Long,
      maxBins: Long): Column = {
    val stop = (e - 1L).divLong(binSize)
    when(stop - s.divLong(binSize) <= maxBins, stop)
      .otherwise(raise_error(lit(
        s"range join: interval spans more than $maxBins bins of $binSize" +
          " — cap sentinel end values (e.g. least(end, horizon)) before" +
          " joining, or raise maxBinsPerInterval")))
  }

  /**
   * Keyless interval × interval OVERLAP join (`a.s < b.e AND b.s < a.e`,
   * half-open), the genomics/session-alignment sibling of
   * [[pointInInterval]] and the same BNLJ cliff. Both sides explode onto
   * their bins; a qualifying pair shares at least one bin, and the
   * exactly-once rule is the standard first-shared-bin predicate: emit
   * only where the join bin equals max(first bin of a, first bin of b).
   * Cost: shuffled rows = Σ(len/bin + 2) over BOTH sides; the residual
   * overlap predicate keeps exactness for every bin size.
   */
  def intervalOverlap(left: DataFrame, ls: String, le: String,
      right: DataFrame, rs: String, re: String, binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")
    requireDisjoint(left, right, Seq(ls, le, rs, re))
    val a = left.filter(col(le) > col(ls))
      .withColumn("_g_abin", explode(sequence(
        col(ls).divLong(binSize),
        guardedStop(col(ls), col(le), binSize, MaxBinsDefault))))
    val b = right.filter(col(re) > col(rs))
      .withColumn("_g_bbin", explode(sequence(
        col(rs).divLong(binSize),
        guardedStop(col(rs), col(re), binSize, MaxBinsDefault))))
    a.join(b,
        a("_g_abin") === b("_g_bbin") &&
          col(ls) < col(re) && col(rs) < col(le) &&
          a("_g_abin") === greatest(
            col(ls).divLong(binSize), col(rs).divLong(binSize)))
      .drop("_g_abin", "_g_bbin")
  }

  /**
   * Bin-size knob: the median interval length, snapped DOWN to a
   * power-of-two multiple of `quantum` (so bins align across runs and the
   * expansion factor stays ≤ 3 for half the intervals, ≤ ⌈len/median⌉+1
   * for the rest). Uses approxQuantile — a recommendation input, not a
   * gated result.
   */
  def recommendedBinSize(intervals: DataFrame, startCol: String,
      endCol: String, quantum: Long = 1000L): Long = {
    val lens = intervals.select((col(endCol) - col(startCol)).cast("double").as("len"))
    val med = lens.stat.approxQuantile("len", Array(0.5), 0.01).head.max(quantum.toDouble)
    var b = quantum
    while (b * 2 <= med) b *= 2
    b
  }
}
