package graft.diff

/**
 * DM connection-capacity and lightning free-space prechecks as offline
 * decision kernels (dm/pkg/checker/conn_checker.go:28-218,
 * lightning.go:144-216): the live legs are one `SHOW GLOBAL VARIABLES
 * LIKE 'max_connections'`, one `SHOW GRANTS`, one `SHOW PROCESSLIST`
 * row count, and PD's store/replica info — all snapshots the task spec
 * can carry, exactly like [[Precheck.SourceMeta]]. The decision ladders
 * replay verbatim:
 *
 *  - connNumberChecker.check (conn_checker.go:46-152): max_connections
 *    0 means unlimited (TiDB semantics) → success before any further
 *    probe; a SUPER/PROCESS privilege lack (verified through
 *    [[PrivilegeCheck]]) degrades to warning with usedConn pinned 0 —
 *    and the reference then OVERWRITES the instruction with the Error
 *    value's empty one (`result.Instruction = err2.Instruction`), a
 *    quirk kept; needed > max is a failure, needed > max-used a
 *    warning, both with the reference's renders.
 *  - LoaderConnNumberChecker (conn_checker.go:156-190): needed =
 *    Σ(poolSize+1) per subtask (worker + checkpoint connection); a
 *    capacity FAILURE is downgraded to warning with the lightning
 *    cannot-estimate warn appended (physical import keeps no
 *    connections).
 *  - DumperConnNumberChecker (conn_checker.go:194-218): needed =
 *    threads+2 (SQL generation + consistency control), PROCESS priv.
 *  - LightningFreeSpaceChecker (lightning.go:144-216): Σ store
 *    available (go-units RAMInBytes) < sourceSize → failure;
 *    < sourceSize × maxReplica × 2 → warning; renders use go-units
 *    BytesSize (binary units, %.4g).
 *
 * The remaining lightning.go checkers (empty-region / region
 * distribution / cluster version / CDC-PiTR / table-empty) wrap tidb
 * lightning's own precheck.Checker verdicts 1:1 (convertLightningPrecheck,
 * lightning.go:26-46) — delegation recorded in COVERAGE.md.
 */
object ConnCheck {

  import PrivilegeCheck.Lack

  final case class ConnOutcome(name: String, state: String,
                               errs: Seq[(String, String)],
                               instruction: String)

  /** go-units BytesSize: binary-unit render with Go's %.4g (≤4
    * significant digits, trailing zeros trimmed). */
  def goBytesSize(size: Double): String = {
    val abbrs =
      Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB", "ZiB", "YiB")
    var s = size
    var i = 0
    while (s >= 1024.0 && i < abbrs.length - 1) { s /= 1024.0; i += 1 }
    goG4(s) + abbrs(i)
  }

  /** Go fmt %.4g on a double: round to 4 significant digits (ties to
    * even, Go's strconv rounding), trim trailing zeros, exponent form
    * outside [1e-4, 1e4). */
  private[diff] def goG4(v: Double): String = {
    if (v == 0.0) return "0"
    val bd = new java.math.BigDecimal(v)
      .round(new java.math.MathContext(4, java.math.RoundingMode.HALF_EVEN))
      .stripTrailingZeros
    val exp = bd.precision - bd.scale - 1
    if (exp < -4 || exp >= 4) {
      val mant = bd.movePointLeft(exp)
      val sign = if (exp >= 0) "+" else "-"
      f"${mant.toPlainString}e$sign${math.abs(exp)}%02d"
    } else bd.toPlainString
  }

  /** conn_checker.go:46-152 over the spec-carried snapshot. */
  def connNumberCheck(checkerName: String, maxConn: Int,
                      grants: Seq[String], processlistRows: Int,
                      neededConn: Int, workerName: String,
                      neededPriv: Lack,
                      version: String = "8.0.11"): ConnOutcome = {
    if (maxConn == 0)
      return ConnOutcome(checkerName, PrivilegeCheck.StateSuccess, Nil, "")
    var state = PrivilegeCheck.StateSuccess
    var errs = Seq.empty[(String, String)]
    var instruction = ""
    var usedConn = 0
    PrivilegeCheck.verifyWithResult(grants, neededPriv, version) match {
      case Some(err) =>
        // not enough privilege to count connections: warn, usedConn
        // stays 0 — and the Error's empty Instruction field overwrites
        // the "You need grant related privileges." the verify set
        // (conn_checker.go:96-101)
        state = PrivilegeCheck.StateWarning
        errs :+= (PrivilegeCheck.StateWarning -> err)
        instruction = ""
      case None =>
        // exclude the connection running SHOW PROCESSLIST itself
        usedConn = processlistRows - 1
    }
    val adjustInstr = "You need to set a larger max_connection, or " +
      "adjust the configuration of DM such as reducing the worker count " +
      "of sycner and reducing the pool size of the dumper and loader."
    if (neededConn > maxConn) {
      errs :+= (PrivilegeCheck.StateFailure ->
        (s"checked database's max_connections: $maxConn is less than " +
          s"the number $workerName needs: $neededConn"))
      instruction = adjustInstr
      state = PrivilegeCheck.StateFailure
    } else if (maxConn - usedConn < neededConn) {
      state = PrivilegeCheck.StateWarning
      instruction = adjustInstr
      errs :+= (PrivilegeCheck.StateFailure ->
        (s"database's max_connections: $maxConn, used_connections: " +
          s"$usedConn, available_connections: ${maxConn - usedConn} is " +
          s"less than $workerName needs: $neededConn"))
    }
    ConnOutcome(checkerName, state, errs, instruction)
  }

  /** LoaderConnNumberChecker (conn_checker.go:156-190): SUPER priv,
    * needed = Σ(poolSize+1), capacity failures downgraded for the
    * lightning path. */
  def loaderConnCheck(maxConn: Int, grants: Seq[String],
                      processlistRows: Int, poolSizes: Seq[Int],
                      version: String = "8.0.11"): ConnOutcome = {
    val needed = poolSizes.map(_ + 1).sum
    val base = connNumberCheck("loader_conn_number_checker", maxConn,
      grants, processlistRows, needed, "loader",
      Map(PrivilegeCheck.Super ->
        PrivilegeCheck.Priv(needGlobal = true)), version)
    if (maxConn != 0 && base.state == PrivilegeCheck.StateFailure)
      base.copy(
        state = PrivilegeCheck.StateWarning,
        errs = base.errs :+ (PrivilegeCheck.StateWarning ->
          ("task precheck cannot accurately check the number of " +
            "connection needed for Lightning.")),
        instruction = "You need to set a larger connection for TiDB.")
    else base
  }

  /** DumperConnNumberChecker (conn_checker.go:194-218): PROCESS priv,
    * needed = threads + 2. */
  def dumperConnCheck(maxConn: Int, grants: Seq[String],
                      processlistRows: Int, dumperThreads: Int,
                      version: String = "8.0.11"): ConnOutcome =
    connNumberCheck("dumper_conn_number_checker", maxConn, grants,
      processlistRows, dumperThreads + 2, "dumper",
      Map(PrivilegeCheck.Process ->
        PrivilegeCheck.Priv(needGlobal = true)), version)

  /** BinlogDBChecker (dm/pkg/checker/binlog.go:216-273) over the
    * (binlog_do_db, binlog_ignore_db) snapshot SHOW MASTER STATUS
    * returns: MySQL applies --binlog-do-db FIRST and ignores
    * --binlog-ignore-db when any do-db is set; both empty logs all DBs.
    * Case-insensitive servers fold only the VARIABLE values (the caller
    * passes task schemas already filter-folded, the reference's
    * contract). Both warn legs leave the Result's INITIAL StateFailure
    * in place while attaching warning-severity errors — the reference's
    * real, quirky behavior (the framework only filters for display,
    * checker.go:670-720, never rewrites states). Go renders the
    * missing-dbs set in map order; name-sorted here. */
  def binlogDbCheck(schemas: Seq[String], binlogDoDB: String,
                    binlogIgnoreDB: String,
                    caseSensitive: Boolean): ConnOutcome = {
    val name = "binlog_do_db/binlog_ignore_db check"
    val doDB =
      if (caseSensitive) binlogDoDB else binlogDoDB.toLowerCase
    val ignoreDB =
      if (caseSensitive) binlogIgnoreDB else binlogIgnoreDB.toLowerCase
    if (doDB.nonEmpty) {
      val remaining = schemas.toSet -- doDB.split(",", -1)
      if (remaining.nonEmpty)
        ConnOutcome(name, PrivilegeCheck.StateFailure,
          Seq(PrivilegeCheck.StateWarning ->
            (s"these dbs [${remaining.toSeq.sorted.mkString(",")}] are " +
              s"not in binlog_do_db[$doDB]")),
          "Ensure that the do_dbs contains the dbs you want to migrate")
      else ConnOutcome(name, PrivilegeCheck.StateSuccess, Nil, "")
    } else {
      val schemaSet = schemas.toSet
      val ignored = ignoreDB.split(",", -1).filter(schemaSet)
      if (ignored.nonEmpty)
        ConnOutcome(name, PrivilegeCheck.StateFailure,
          Seq(PrivilegeCheck.StateWarning ->
            (s"these dbs [${ignored.mkString(",")}] are in " +
              s"binlog_ignore_db[$ignoreDB]")),
          "Ensure that the ignore_dbs does not contain the dbs you " +
            "want to migrate")
      else ConnOutcome(name, PrivilegeCheck.StateSuccess, Nil, "")
    }
  }

  /** OnlineDDLChecker (dm/pkg/checker/onlineddl.go:41-75) over the
    * per-schema table-list snapshot: a table matching a shadow rule
    * (q300's anchored single-submatch regexes — the online-DDL plugin's
    * TableType/RealName) is a ghost mid-migration; its REAL table (the
    * rule's submatch) passes the task's block-allow filter and any
    * survivor fails the precheck ("please wait the online-ddl over").
    * The live leg is one GetTables per schema; schemas iterate
    * name-sorted where Go's map order picks which one trips first (the
    * verdict is order-independent — the reference early-returns on the
    * first hit). The failure carries the reference's Extra in the
    * instruction slot. */
  def onlineDdlCheck(tablesBySchema: Seq[(String, Seq[String])],
                     shadowRules: Seq[String],
                     baAllows: (String, String) => Boolean): ConnOutcome = {
    val name = "online ddl checker"
    val regexes = shadowRules.map(_.r)
    tablesBySchema.sortBy(_._1).foreach { case (schema, tables) =>
      val realTables = tables.flatMap { t =>
        regexes.view.flatMap(r =>
          r.findFirstMatchIn(t).map(_.group(1))).headOption
          .map(real => (schema, real))
      }
      if (realTables.exists { case (s, t) => baAllows(s, t) })
        return ConnOutcome(name, PrivilegeCheck.StateFailure,
          Seq(PrivilegeCheck.StateFailure ->
            "your ddl is in pt/ghost online-ddl"),
          "please wait the online-ddl over")
    }
    ConnOutcome(name, PrivilegeCheck.StateSuccess, Nil, "")
  }

  /** PrimaryKeyChecker (dm/pkg/checker/primary_key.go:27-181) over the
    * catalog snapshot: every source table must declare a PRIMARY KEY;
    * a table deleted between listing and SHOW CREATE TABLE (the
    * ErrNoSuchTable race) is skipped silently. Input is (db, table,
    * Some(hasPrimaryKey)) with None marking the vanished table; the
    * failure render and checker name are the reference's own. The live
    * legs (GetConcurrency + SHOW CREATE TABLE round-trips) stay
    * delegated; the AST PK detection is the q306 constraint extractor's
    * territory. */
  def primaryKeyCheck(tables: Seq[(String, String, Option[Boolean])])
      : ConnOutcome = {
    val name = "primary key existence check"
    val errs = tables.collect {
      case (db, t, Some(false)) =>
        PrivilegeCheck.StateFailure ->
          (s"table `$db`.`$t` primary key does not exist")
    }
    if (errs.isEmpty) ConnOutcome(name, PrivilegeCheck.StateSuccess, Nil, "")
    else ConnOutcome(name, PrivilegeCheck.StateFailure, errs,
      "You need to set primary key for the upstream table. Otherwise " +
        "replication efficiency may be low, and correctness (e.g., " +
        "deduplication and idempotency) may be affected if no primary " +
        "key exists.")
  }

  /** LightningFreeSpaceChecker (lightning.go:163-216) over the
    * spec-carried store snapshot: per-store available sizes in go-units
    * grammar ("100GiB"), the task's source data size, PD's max-replica
    * count. */
  def freeSpaceCheck(storeAvailable: Seq[String], sourceDataSize: Long,
                     maxReplica: Long): ConnOutcome = {
    val name = "lightning_free_space"
    var clusterAvail = 0L
    storeAvailable.foreach { s =>
      graft.streaming.DmTaskConfig.ramInBytes(s) match {
        case Left(err) =>
          return ConnOutcome(name, PrivilegeCheck.StateFailure,
            Seq(PrivilegeCheck.StateFailure -> err), "")
        case Right(v) => clusterAvail += v
      }
    }
    val scaleInstr = "you can try to scale-out TiKV storage or TiKV " +
      "instance to gain more storage space"
    if (clusterAvail < sourceDataSize)
      ConnOutcome(name, PrivilegeCheck.StateFailure,
        Seq(PrivilegeCheck.StateFailure ->
          (s"Downstream doesn't have enough space, available is " +
            s"${goBytesSize(clusterAvail.toDouble)}, but we need " +
            s"${goBytesSize(sourceDataSize.toDouble)}")), scaleInstr)
    else {
      val safeSize = sourceDataSize * maxReplica * 2
      if (clusterAvail < safeSize)
        ConnOutcome(name, PrivilegeCheck.StateWarning,
          Seq(PrivilegeCheck.StateWarning ->
            (s"Cluster may not have enough space, available is " +
              s"${goBytesSize(clusterAvail.toDouble)}, but we need " +
              s"${goBytesSize(safeSize.toDouble)}")), scaleInstr)
      else ConnOutcome(name, PrivilegeCheck.StateSuccess, Nil, "")
    }
  }
}
