package graft.diff

/**
 * The legacy pkg/diff per-chunk check pipeline (SURVEY §2.13 —
 * reference pkg/diff/diff.go, the library behind the DM precheck's data
 * comparator, kept alongside sync_diff_inspector):
 *
 *  - config adjust (diff.go:186-211): chunk-size ≤ 0 → 1000 (with the
 *    recommend-range warn outside [1000, 10000]), empty range → "TRUE",
 *    sample ≤ 0 → 100, check-thread-count ≤ 0 → 4.
 *  - per-chunk decision (diff.go:425-470 checkChunkDataEqual): when
 *    sampling is active (sample < 100 and NOT resuming from a
 *    checkpoint), a roll r ∈ [0,100) with r > sample marks the chunk
 *    `ignore` and skips all IO; otherwise checksum-first when
 *    use-checksum (equal checksum short-circuits to `success`); an
 *    unequal checksum under only-use-checksum is `failed` with NO row
 *    fall-through; any other path decides by comparing rows.
 *
 * The reference rolls rand.Intn(100) per chunk; the gate derives the
 * roll from a multiplicative hash of the chunk id so Spark and the
 * oracle compute the identical sample — the documented deterministic
 * refinement (same treatment as the scheduler kernels' map-iteration
 * order).
 */
object DiffSample {

  final case class TableDiffCfg(chunkSize: Int = 0, range: String = "",
      sample: Int = 0, checkThreadCount: Int = 0)

  final case class AdjustedDiffCfg(cfg: TableDiffCfg, warnings: Seq[String])

  /** TableDiff.adjustConfig (diff.go:186-211). */
  def adjustConfig(c0: TableDiffCfg): AdjustedDiffCfg = {
    var c = c0
    var warnings = Vector.empty[String]
    if (c.chunkSize <= 0) {
      warnings :+= "chunk-size-default"
      c = c.copy(chunkSize = 1000)
    }
    if (c.chunkSize < 1000 || c.chunkSize > 10000)
      warnings :+= "chunk-size-out-of-range"
    if (c.range.isEmpty) c = c.copy(range = "TRUE")
    if (c.sample <= 0) c = c.copy(sample = 100)
    if (c.checkThreadCount <= 0) c = c.copy(checkThreadCount = 4)
    AdjustedDiffCfg(c, warnings)
  }

  /** The chunk states the pipeline can leave behind
    * (diff.go ignoreState/successState/failedState). */
  val Ignore = "ignore"
  val Success = "success"
  val Failed = "failed"

  /**
   * checkChunkDataEqual (diff.go:425-470): `roll` stands in for
   * rand.Intn(100); `checksumEqual`/`rowsEqual` are by-name so the
   * skipped legs pay no IO — exactly the reference's short-circuits.
   */
  def chunkCheckDecision(filterByRand: Boolean, roll: Int, sample: Int,
      useChecksum: Boolean, onlyUseChecksum: Boolean,
      checksumEqual: => Boolean, rowsEqual: => Boolean): String = {
    if (filterByRand && roll > sample) return Ignore
    if (useChecksum && checksumEqual) return Success
    if (useChecksum && onlyUseChecksum) return Failed
    if (rowsEqual) Success else Failed
  }
}
