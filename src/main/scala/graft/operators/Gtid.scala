package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * MySQL GTID-set algebra, the coordinate system DM uses to track binlog
 * replication progress (reference: dm/pkg/gtid/gtid.go, which delegates to
 * the public go-mysql GTIDSet — the format and semantics here follow the
 * public MySQL GTID documentation). A GTID set is
 * `uuid:i1-j1:i2-j2,uuid2:...` — per source UUID, a sorted list of disjoint
 * closed transaction-id intervals.
 *
 * Two layers:
 *   - Column expressions over the STRING form: [[parseSet]] /
 *     [[renderIntervals]] / [[containsTxn]] — per-row, map-only, for sets
 *     embedded in event streams (a row's `gtid_set` checkpoint column).
 *   - DataFrame algebra over the EXPLODED form (uuid, start, end):
 *     [[mergeIntervals]] / [[subtractIntervals]] — gaps-and-islands with
 *     one shuffle on the uuid key; this is the shape that scales when
 *     merging progress sets across thousands of shards, and the per-key
 *     data (interval lists) stays tiny so the window never skews.
 */
object Gtid {

  /** Parse a GTID-set string into array<struct<uuid,start,end>>. Accepts
    * single-txn intervals (`:5`) and ranges (`:5-9`); whitespace around
    * commas tolerated. Map-only expression — no shuffle. */
  def parseSet(set: Column): Column = {
    val blocks = filter(transform(split(set, ","), b => trim(b)), b => length(b) > 0)
    flatten(transform(blocks, { b =>
      val parts = split(b, ":")
      val uuid = element_at(parts, 1)
      val ivs = slice(parts, 2, 64)
      transform(ivs, { iv =>
        // get() (not getItem) — single-txn intervals have no '-' half, and
        // ANSI mode makes an out-of-bounds getItem throw instead of null
        val lo = get(split(iv, "-"), lit(0)).cast("long")
        val hi = coalesce(get(split(iv, "-"), lit(1)).cast("long"), lo)
        struct(uuid.as("uuid"), lo.as("start"), hi.as("end"))
      })
    }))
  }

  /** Does the set (string form) contain `uuid:txn`? Map-only. */
  def containsTxn(set: Column, uuid: Column, txn: Column): Column =
    exists(parseSet(set), iv =>
      iv.getField("uuid") === uuid &&
        iv.getField("start") <= txn && txn <= iv.getField("end"))

  /**
   * Merge (uuid, txn) points — or overlapping/adjacent (uuid, start, end)
   * intervals after exploding them — into canonical disjoint intervals.
   * Classic gaps-and-islands: within each uuid, sort txns and group rows
   * whose txn minus row-number is constant. One shuffle on uuid; interval
   * lists per source are tiny, so the window partition never skews even
   * when the txn columns derive from billions of events (dedupe to
   * distinct txns first — done here).
   */
  def mergeIntervals(points: DataFrame, uuidCol: String = "uuid",
      txnCol: String = "txn"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(uuidCol)).orderBy(col(txnCol))
    points.select(col(uuidCol).as("uuid"), col(txnCol).cast("long").as("txn"))
      .distinct()
      .withColumn("_grp", col("txn") - row_number().over(w))
      .groupBy(col("uuid"), col("_grp"))
      .agg(min("txn").as("start"), max("txn").as("end"))
      .drop("_grp")
  }

  /** A minus B over exploded interval rows (uuid, start, end): transactions
    * in A not covered by B, re-merged to canonical intervals. Expands to
    * txn points per uuid — correct for control-plane-sized sets (progress
    * tracking), where intervals per source are few and bounded. */
  def subtractIntervals(a: DataFrame, b: DataFrame): DataFrame = {
    val pts = a.select(col("uuid"), explode(sequence(col("start"), col("end"))).as("txn"))
    val bpts = b.select(col("uuid"), explode(sequence(col("start"), col("end"))).as("txn"))
    mergeIntervals(pts.except(bpts))
  }

  /** Canonical string render of one uuid's interval list (array of
    * struct<start,end>, any order): `a` for single-txn intervals, `a-b`
    * otherwise, ascending, ':'-joined — matching MySQL's canonical form. */
  def renderIntervals(ivs: Column): Column =
    array_join(transform(array_sort(ivs), iv =>
      when(iv.getField("start") === iv.getField("end"),
        iv.getField("start").cast("string"))
        .otherwise(concat(iv.getField("start").cast("string"), lit("-"),
          iv.getField("end").cast("string")))), ":")

  /** Full canonical set string from merged interval rows (uuid, start,
    * end): per-uuid interval render prefixed by uuid, uuids sorted,
    * ','-joined. Aggregates to ONE row — use on control-plane sets. */
  def renderSet(merged: DataFrame): DataFrame =
    merged.groupBy("uuid")
      .agg(collect_list(struct(col("start"), col("end"))).as("ivs"))
      .select(concat(col("uuid"), lit(":"), renderIntervals(col("ivs"))).as("block"))
      .agg(array_join(array_sort(collect_list(col("block"))), ",").as("gtid_set"))

  // ---- flavor kernels (dm/pkg/gtid/gtid.go:29-122) -----------------------

  /** IsZeroMySQLGTIDSet (gtid.go:91-104): exactly one comma block whose
    * ':'-split has exactly two parts and the trimmed interval is "0" —
    * the "start replication from scratch" placeholder ("uuid:0"),
    * distinguished from a forgotten value. */
  def isZeroMySqlSet(s: String): Boolean = {
    val sp = s.split(",", -1)
    sp.length == 1 && {
      val sep = sp(0).split(":", -1)
      sep.length == 2 && sep(1).trim == "0"
    }
  }

  /** IsZeroMariaDBGTIDSet (gtid.go:111-122): one block, '-'-split into
    * exactly three parts, trimmed seq "0" ("0-0-0"). */
  def isZeroMariaDbSet(s: String): Boolean = {
    val sp = s.split(",", -1)
    sp.length == 1 && {
      val sep = sp(0).split("-", -1)
      sep.length == 3 && sep(2).trim == "0"
    }
  }

  private val MySqlUuidRe =
    "^[0-9a-fA-F]{8}(-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}$".r
  private def validMySqlSet(s: String): Boolean =
    s.isEmpty || s.split(",", -1).forall { b0 =>
      val parts = b0.trim.split(":", -1)
      parts.length >= 2 && MySqlUuidRe.matches(parts(0)) &&
        parts.tail.forall(_.matches("\\d+(-\\d+)?"))
    }
  private def validMariaDbSet(s: String): Boolean =
    s.isEmpty || s.split(",", -1).forall(_.trim.matches("\\d+-\\d+-\\d+"))

  /**
   * ParserGTID's flavor decision (gtid.go:35-72): an explicit flavor
   * parses that flavor — with a zero placeholder set parsing as the EMPTY
   * set (gtid.go:48-58, TestParseZeroAsEmptyGTIDSet); an empty flavor
   * tries MySQL first, then MariaDB (no zero-replacement on that leg);
   * anything else is the unsupported-flavor error. Returns
   * Right((resolvedFlavor, parsesToEmptySet)).
   */
  def parserDecision(flavor: String, s: String)
      : Either[String, (String, Boolean)] =
    flavor match {
      case "" if s.isEmpty => Right(("mysql", true)) // gtid.go:41-44
      case "mysql" =>
        if (isZeroMySqlSet(s)) Right(("mysql", true))
        else if (validMySqlSet(s)) Right(("mysql", s.isEmpty))
        else Left(s"invalid mysql GTID set: $s")
      case "mariadb" =>
        if (isZeroMariaDbSet(s)) Right(("mariadb", true))
        else if (validMariaDbSet(s)) Right(("mariadb", s.isEmpty))
        else Left(s"invalid mariadb GTID set: $s")
      case "" =>
        if (validMySqlSet(s)) Right(("mysql", false))
        else if (validMariaDbSet(s)) Right(("mariadb", false))
        else Left(s"invalid GTID set: $s")
      case other => Left(s"flavor $other not supported")
    }
}
