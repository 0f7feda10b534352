package graft.core

/**
 * Cluster version gate (reference pkg/version/check.go): the semver rules
 * TiCDC enforces against PD, TiKV stores, and its own capture fleet before
 * it agrees to run. Pure string/semver functions:
 *
 *  - SanitizeVersion (:68-77): strip the git-describe hash suffix
 *    (`-N-g<sha>[-dev]`), then the `-fips` / `-dirty` suffixes, then the
 *    leading `v`;
 *  - PD ∈ [7.1.0-alpha, 10.0.0), TiKV ∈ [7.1.0-alpha, 10.0.0) with
 *    TiFlash-engine stores skipped (:40-52, :143-237);
 *  - CheckTiCDCVersion (:113-141): a fleet of ≤1 distinct version passes
 *    unchecked; ≥3 distinct versions is an error; each version must sit in
 *    [6.3.0-alpha, 10.0.0-alpha);
 *  - GetTiCDCClusterVersion (:276-297): the fleet version is the MINIMUM
 *    capture version, an empty capture version defaults to 4.0.1, an empty
 *    fleet is "unknown" (assumed latest);
 *  - the derived feature gates (:246-270): unified sorter on ≥4.0.13
 *    except the literal 5.0.0-rc, open-API CLI on ≥6.2.0, both true for
 *    the unknown version.
 *
 * Comparison follows coreos/go-semver: numeric triple first, then
 * pre-release (absent > present; fields compared pairwise, numeric fields
 * sort below alphanumeric ones, a longer equal-prefix field list wins).
 */
object VersionGate {

  final case class SemVer(major: Long, minor: Long, patch: Long,
      preRelease: String, metadata: String) {
    def render: String = {
      val pre = if (preRelease.isEmpty) "" else s"-$preRelease"
      val meta = if (metadata.isEmpty) "" else s"+$metadata"
      s"$major.$minor.$patch$pre$meta"
    }

    def compare(o: SemVer): Int = {
      val num = Seq(major.compare(o.major), minor.compare(o.minor),
        patch.compare(o.patch)).find(_ != 0).getOrElse(0)
      if (num != 0) num
      else (preRelease.isEmpty, o.preRelease.isEmpty) match {
        case (true, false) => 1
        case (false, true) => -1
        case (true, true) => 0
        case (false, false) =>
          preCompare(preRelease.split('.').toList,
            o.preRelease.split('.').toList)
      }
    }

    @annotation.tailrec
    private def preCompare(a: List[String], b: List[String]): Int =
      (a, b) match {
        case (Nil, Nil) => 0
        case (Nil, _) => -1
        case (_, Nil) => 1
        case (x :: xs, y :: ys) =>
          val xi = x.toLongOption
          val yi = y.toLongOption
          val c = (xi, yi) match {
            case (Some(_), None) => -1 // numeric < alphanumeric
            case (None, Some(_)) => 1
            case (Some(i), Some(j)) => i.compare(j)
            case (None, None) => x.compare(y).sign
          }
          if (c != 0) c else preCompare(xs, ys)
      }
  }

  private val GitHash = "-[0-9]+-g[0-9a-f]{7,}(-dev)?".r

  /** SanitizeVersion (check.go:68-77). */
  def sanitize(v: String): String =
    if (v.isEmpty) v
    else {
      var s = GitHash.replaceAllIn(v, "")
      s = s.stripSuffix("-fips")
      s = s.stripSuffix("-dirty")
      s.stripPrefix("v")
    }

  private val SemVerRe =
    "^([0-9]+)\\.([0-9]+)\\.([0-9]+)(?:-([0-9A-Za-z.-]+))?(?:\\+([0-9A-Za-z.-]+))?$".r

  /** go-semver NewVersion: all three numeric parts are required. */
  def parse(v: String): Either[String, SemVer] = v match {
    case SemVerRe(ma, mi, pa, pre, meta) =>
      Right(SemVer(ma.toLong, mi.toLong, pa.toLong,
        Option(pre).getOrElse(""), Option(meta).getOrElse("")))
    case _ => Left("CDC:ErrNewSemVersion")
  }

  val MinPD: SemVer = SemVer(7, 1, 0, "alpha", "")
  val MaxPD: SemVer = SemVer(10, 0, 0, "", "")
  val MinTiKV: SemVer = SemVer(7, 1, 0, "alpha", "")
  val MaxTiKV: SemVer = SemVer(10, 0, 0, "", "")
  val MinTiCDC: SemVer = SemVer(6, 3, 0, "alpha", "")
  val MaxTiCDC: SemVer = SemVer(10, 0, 0, "alpha", "")
  val DefaultTiCDC: SemVer = SemVer(4, 0, 1, "", "")

  private def rangeCheck(raw: String, min: SemVer, max: SemVer,
      what: String): Either[String, SemVer] =
    parse(sanitize(raw)).flatMap { ver =>
      if (ver.compare(min) < 0)
        Left(s"CDC:ErrVersionIncompatible: $what ${sanitize(raw)} is not " +
          s"supported, the minimal compatible version is ${min.render}")
      else if (ver.compare(max) >= 0)
        Left(s"CDC:ErrVersionIncompatible: $what ${sanitize(raw)} is not " +
          s"supported, only support version less than ${max.render}")
      else Right(ver)
    }

  /** checkPDVersion's range rule (:186-200). */
  def checkPd(raw: String): Either[String, SemVer] =
    rangeCheck(raw, MinPD, MaxPD, "PD")

  /** CheckStoreVersion (:203-237): first offending non-TiFlash store
    * fails; TiFlash-engine stores are skipped. */
  def checkStores(stores: Seq[(String, Boolean)]): Either[String, Unit] =
    stores.foldLeft[Either[String, Unit]](Right(())) {
      case (acc @ Left(_), _) => acc
      case (acc, (_, true)) => acc // TiFlash: skip
      case (_, (ver, false)) =>
        rangeCheck(ver, MinTiKV, MaxTiKV, "TiKV").map(_ => ())
    }

  /** CheckTiCDCVersion (:113-141) over the DISTINCT version set. */
  def checkTiCdc(versions: Set[String]): Either[String, Unit] =
    if (versions.size <= 1) Right(())
    else if (versions.size >= 3)
      Left("CDC:ErrVersionIncompatible: all running cdc instance belong " +
        s"to ${versions.size} different versions, it's not allowed")
    else versions.foldLeft[Either[String, Unit]](Right(())) {
      case (acc @ Left(_), _) => acc
      case (_, raw) => parse(sanitize(raw)).left.map(e => e).flatMap { v =>
        if (v.compare(MinTiCDC) < 0)
          Left(s"CDC:ErrVersionIncompatible: TiCDC ${sanitize(raw)} is not " +
            s"supported, the minimal compatible version is ${MinTiCDC.render}")
        else if (v.compare(MaxTiCDC) >= 0)
          Left(s"CDC:ErrVersionIncompatible: TiCDC ${sanitize(raw)} is not " +
            "supported, only support version less than " + MaxTiCDC.render)
        else Right(())
      }
    }

  /** GetTiCDCClusterVersion (:276-297): None = the unknown version
    * (empty fleet, assumed latest). */
  def clusterVersion(captureVersions: Seq[String])
      : Either[String, Option[SemVer]] =
    if (captureVersions.isEmpty) Right(None)
    else captureVersions.foldLeft[Either[String, Option[SemVer]]](
      Right(None)) {
      case (acc @ Left(_), _) => acc
      case (Right(minV), raw) =>
        val parsed =
          if (raw.nonEmpty) parse(sanitize(raw)) else Right(DefaultTiCDC)
        parsed.map { v =>
          Some(minV.filter(_.compare(v) <= 0).getOrElse(v))
        }
    }

  /** ShouldEnableUnifiedSorterByDefault (:253-263): ≥4.0.13 except the
    * literal 5.0.0-rc; unknown = latest = true. */
  def unifiedSorterDefault(v: Option[SemVer]): Boolean = v match {
    case None => true
    case Some(ver) =>
      if (ver.render == "5.0.0-rc") false
      else ver.compare(SemVer(4, 0, 13, "", "")) >= 0 ||
        (ver.major == 4 && ver.minor == 0 && ver.patch == 13)
  }

  /** ShouldRunCliWithOpenAPI (:266-273). */
  def cliOpenApi(v: Option[SemVer]): Boolean = v match {
    case None => true
    case Some(ver) =>
      ver.compare(SemVer(6, 2, 0, "", "")) >= 0 ||
        (ver.major == 6 && ver.minor == 2 && ver.patch == 0)
  }

  /** LessThan500RC (:246-250): the unknown version is assumed latest. */
  def lessThan500RC(v: Option[SemVer]): Boolean =
    v match {
      case None => true
      case Some(ver) => !(ver.compare(SemVer(5, 0, 0, "rc", "")) < 0)
    }
}
