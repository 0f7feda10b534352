package graft

import java.nio.file.{Files, Paths}

import scala.util.Random

import graft.streaming.ValidatorLifecycle
import graft.streaming.ValidatorLifecycle._

/** Round-17 de-share properties for the DM validator stage orchestration:
  * every constant the q285 gate's oracle shares with the kernel (stop
  * messages, mode strings, stage enum values, default intervals) is parsed
  * OUT OF THE REFERENCE SOURCE and asserted against the repo's constants —
  * so a re-typed-wrong constant diverges in CI instead of agreeing with
  * the oracle that re-typed it the same way. Plus a 300-trace randomized
  * property stepping [[ValidatorLifecycle]] against an independently
  * written simulator whose classification comes from the PARSED messages.
  */
class Round17Spec extends SparkSpec {

  private val valFile = Paths.get("/root/reference/dm/syncer/data_validator.go")
  private val taskFile = Paths.get("/root/reference/dm/config/task.go")
  private val pbFile = Paths.get("/root/reference/dm/pb/dmworker.pb.go")

  private lazy val valSrc = new String(Files.readAllBytes(valFile), "UTF-8")
  private lazy val taskSrc = new String(Files.readAllBytes(taskFile), "UTF-8")
  private lazy val pbSrc = new String(Files.readAllBytes(pbFile), "UTF-8")

  private def goStringConst(src: String, name: String): String = {
    val m = (java.util.regex.Pattern.quote(name) + """\s*=\s*"([^"]*)"""").r
      .findFirstMatchIn(src)
    assert(m.isDefined, s"$name not found")
    m.get.group(1)
  }

  /** `N * time.Second` / `N * time.Minute` / bare int → milliseconds or
    * the raw count. */
  private def goDurationMs(src: String, name: String): Long = {
    val m = (java.util.regex.Pattern.quote(name) +
      """\s*=\s*(\d+)(?:\s*\*\s*time\.(\w+))?""").r.findFirstMatchIn(src)
    assert(m.isDefined, s"$name not found")
    val n = m.get.group(1).toLong
    Option(m.get.group(2)) match {
      case Some("Second") => n * 1000L
      case Some("Minute") => n * 60000L
      case Some(u) => fail(s"unhandled unit $u")
      case None => n
    }
  }

  test("table-stop messages match data_validator.go:57-60, parsed") {
    assume(Files.exists(valFile), "reference checkout not present")
    assert(MoreColumnInBinlogMsg ==
      goStringConst(valSrc, "moreColumnInBinlogMsg"))
    assert(TableWithoutPrimaryKeyMsg ==
      goStringConst(valSrc, "tableWithoutPrimaryKeyMsg"))
    assert(TableNotSyncedOrDropped ==
      goStringConst(valSrc, "tableNotSyncedOrDropped"))
    assert(DownstreamPKColumnOutOfBoundsMsg ==
      goStringConst(valSrc, "downstreamPKColumnOutOfBoundsMsg"))
  }

  test("validation modes and defaults match dm/config/task.go:68-83, parsed") {
    assume(Files.exists(taskFile), "reference checkout not present")
    assert(ModeNone == goStringConst(taskSrc, "ValidationNone"))
    assert(ModeFast == goStringConst(taskSrc, "ValidationFast"))
    assert(ModeFull == goStringConst(taskSrc, "ValidationFull"))
    assert(DefaultWorkerCount ==
      goDurationMs(taskSrc, "DefaultValidatorWorkerCount"))
    assert(DefaultValidateIntervalMs ==
      goDurationMs(taskSrc, "DefaultValidatorValidateInterval"))
    assert(DefaultCheckIntervalMs ==
      goDurationMs(taskSrc, "DefaultValidatorCheckInterval"))
    assert(DefaultRowErrorDelayMs ==
      goDurationMs(taskSrc, "DefaultValidatorRowErrorDelay"))
    assert(DefaultMetaFlushIntervalMs ==
      goDurationMs(taskSrc, "DefaultValidatorMetaFlushInterval"))
    assert(DefaultBatchQuerySize ==
      goDurationMs(taskSrc, "DefaultValidatorBatchQuerySize"))
  }

  test("validator error-op/state enums match dmworker.pb.go, parsed") {
    assume(Files.exists(pbFile), "reference checkout not present")
    import graft.streaming.Validator
    def enumVal(tpe: String, n: String): Int = {
      val m = (tpe + "_" + n + """\s+""" + tpe + """ = (\d+)""").r
        .findFirstMatchIn(pbSrc)
      assert(m.isDefined, s"${tpe}_$n not found"); m.get.group(1).toInt
    }
    assert(Validator.InvalidErr == enumVal("ValidateErrorState", "InvalidErr"))
    assert(Validator.NewErr == enumVal("ValidateErrorState", "NewErr"))
    assert(Validator.IgnoredErr == enumVal("ValidateErrorState", "IgnoredErr"))
    assert(Validator.ResolvedErr ==
      enumVal("ValidateErrorState", "ResolvedErr"))
    assert(Validator.IgnoreErrOp == enumVal("ValidationErrOp", "IgnoreErrOp"))
    assert(Validator.ResolveErrOp ==
      enumVal("ValidationErrOp", "ResolveErrOp"))
    assert(Validator.ClearErrOp == enumVal("ValidationErrOp", "ClearErrOp"))
  }

  test("relay op enum and the BeforeAnyOp label match the reference, parsed") {
    assume(Files.exists(pbFile), "reference checkout not present")
    import graft.streaming.RelayControl
    def opVal(n: String): Int = {
      val m = ("""RelayOp_""" + n + """\s+RelayOp = (\d+)""").r
        .findFirstMatchIn(pbSrc)
      assert(m.isDefined, s"RelayOp_$n not found"); m.get.group(1).toInt
    }
    assert(RelayControl.InvalidRelayOp == opVal("InvalidRelayOp"))
    assert(RelayControl.StopRelay == opVal("StopRelay"))
    assert(RelayControl.PauseRelay == opVal("PauseRelay"))
    assert(RelayControl.ResumeRelay == opVal("ResumeRelay"))
    val metricsSrc = new String(Files.readAllBytes(
      Paths.get("/root/reference/dm/worker/metrics.go")), "UTF-8")
    assert(RelayControl.OpErrTypeBeforeOp ==
      goStringConst(metricsSrc, "opErrTypeBeforeOp"))
  }

  test("pb.Stage enum values match dmworker.pb.go, parsed") {
    assume(Files.exists(pbFile), "reference checkout not present")
    def stageVal(n: String): Int = {
      val m = ("""Stage_""" + n + """\s+Stage = (\d+)""").r
        .findFirstMatchIn(pbSrc)
      assert(m.isDefined, s"Stage_$n not found"); m.get.group(1).toInt
    }
    assert(InvalidStage == stageVal("InvalidStage"))
    assert(StageNew == stageVal("New"))
    assert(Running == stageVal("Running"))
    assert(Paused == stageVal("Paused"))
    assert(Stopped == stageVal("Stopped"))
    assert(Finished == stageVal("Finished"))
    assert(Pausing == stageVal("Pausing"))
    assert(Resuming == stageVal("Resuming"))
    assert(Stopping == stageVal("Stopping"))
  }

  // ---- task-checker tables parsed from the reference ----

  private val retryFile = Paths.get("/root/reference/dm/pkg/retry/errors.go")
  private val terrorFile =
    Paths.get("/root/reference/dm/pkg/terror/error_list.go")
  private val checkerCfgFile =
    Paths.get("/root/reference/dm/config/checker_config.go")
  private lazy val retrySrc = new String(Files.readAllBytes(retryFile), "UTF-8")
  private lazy val terrorSrc =
    new String(Files.readAllBytes(terrorFile), "UTF-8")

  /** Parse one `Name = []string{ "...", ... }` literal. */
  private def goStringSlice(src: String, name: String): Seq[String] = {
    val start = src.indexOf(s"$name = []string{")
    assert(start >= 0, s"$name not found")
    val body = src.substring(start, src.indexOf("}", start))
    """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  /** Replay terror's iota arithmetic: within each const block, the first
    * `ErrCode = iota + BASE` anchors, names count up from it. */
  private lazy val terrorCodes: Map[String, Long] = {
    val out = scala.collection.mutable.Map.empty[String, Long]
    for (block <- """(?s)const \((.*?)\n\)""".r
        .findAllMatchIn(terrorSrc).map(_.group(1))) {
      var base = -1L; var idx = 0L
      for (line <- block.split("\n")) {
        val m = """^\tcode(\w+)(?:\s+ErrCode = iota \+ (\d+))?\s*$""".r
          .findFirstMatchIn(line)
        m.foreach { mm =>
          if (mm.group(2) != null) { base = mm.group(2).toLong; idx = 0 }
          if (base >= 0) { out(mm.group(1)) = base + idx; idx += 1 }
        }
      }
    }
    out.toMap
  }

  test("task-checker message tables match dm/pkg/retry/errors.go, parsed") {
    assume(Files.exists(retryFile), "reference checkout not present")
    import graft.streaming.TaskChecker._
    assert(UnsupportedDdlMsgs == goStringSlice(retrySrc, "UnsupportedDDLMsgs"))
    assert(UnsupportedDmlMsgs == goStringSlice(retrySrc, "UnsupportedDMLMsgs"))
    assert(ReplicationErrMsgs == goStringSlice(retrySrc, "ReplicationErrMsgs"))
    assert(ParseRelayLogErrMsgs ==
      goStringSlice(retrySrc, "ParseRelayLogErrMsgs"))
  }

  test("un-resumable terror codes match error_list.go's iota arithmetic") {
    assume(Files.exists(terrorFile), "reference checkout not present")
    import graft.streaming.TaskChecker._
    def codesOf(setName: String): Set[Long] = {
      val start = retrySrc.indexOf(s"$setName = map[int32]struct{}{")
      assert(start >= 0, s"$setName not found")
      val body = retrySrc.substring(start, retrySrc.indexOf("}\n", start))
      """terror\.Err(\w+)\.Code""".r.findAllMatchIn(body)
        .map(m => terrorCodes(m.group(1))).toSet
    }
    assert(UnresumableErrCodes == codesOf("UnresumableErrCodes"),
      s"got ${codesOf("UnresumableErrCodes")}")
    assert(UnresumableRelayErrCodes == codesOf("UnresumableRelayErrCodes"),
      s"got ${codesOf("UnresumableRelayErrCodes")}")
    assert(ErrParserParseRelayLogCode == terrorCodes("ParserParseRelayLog"))
    assert(ErrLoadLightningRuntimeCode == terrorCodes("LoadLightningRuntime"))
  }

  test("checker strategy names and defaults match the reference, parsed") {
    assume(Files.exists(checkerCfgFile), "reference checkout not present")
    import graft.streaming.TaskChecker._
    val tcSrc = new String(Files.readAllBytes(
      Paths.get("/root/reference/dm/worker/task_checker.go")), "UTF-8")
    // resumeStrategy2Str (task_checker.go:80-86)
    val nameRe = """Resume(\w+):\s+"([^"]+)"""".r
    val names = nameRe.findAllMatchIn(tcSrc)
      .map(m => m.group(1) -> m.group(2)).toMap
    assert(StrategyNames(ResumeIgnore) == names("Ignore"))
    assert(StrategyNames(ResumeSkip) == names("Skip"))
    assert(StrategyNames(ResumeNoSense) == names("NoSense"))
    assert(StrategyNames(ResumeDispatch) == names("Dispatch"))
    // iota+1 ordering (task_checker.go:64-79)
    val order = """Resume(\w+)(?:\s+ResumeStrategy = iota \+ 1)?\n""".r
      .findAllMatchIn(tcSrc.substring(tcSrc.indexOf("const ("),
        tcSrc.indexOf("resumeStrategy2Str"))).map(_.group(1)).toSeq
    assert(order == Seq("Ignore", "Skip", "NoSense", "Dispatch"),
      s"got $order")
    val cfgSrc = new String(Files.readAllBytes(checkerCfgFile), "UTF-8")
    assert(DefaultCheckIntervalMs ==
      goDurationMs(cfgSrc, "DefaultCheckInterval"))
    assert(DefaultBackoffRollbackMs ==
      goDurationMs(cfgSrc, "DefaultBackoffRollback"))
    assert(DefaultBackoffMinMs == goDurationMs(cfgSrc, "DefaultBackoffMin"))
    assert(DefaultBackoffMaxMs == goDurationMs(cfgSrc, "DefaultBackoffMax"))
  }

  test("query-status constants match the reference, parsed") {
    val qsFile = Paths.get("/root/reference/dm/ctl/master/query_status.go")
    assume(Files.exists(qsFile), "reference checkout not present")
    import graft.streaming.QueryStatus
    val qsSrc = new String(Files.readAllBytes(qsFile), "UTF-8")
    assert(QueryStatus.StageError == goStringConst(qsSrc, "const stageError"))
    // the two error verdict strings and the render suffix, verbatim
    assert(qsSrc.contains(
      "stageError + \" - Some error occurred in subtask\""))
    assert(qsSrc.contains("stageError + \" - Relay status is \""))
    assert(qsSrc.contains(
      "\". Please run `query-status \" + curTaskName + \"` to get more details.\""))
    // pb.UnitType values
    def unitVal(n: String): Int = {
      val m = ("""UnitType_""" + n + """\s+UnitType = (\d+)""").r
        .findFirstMatchIn(pbSrc)
      assert(m.isDefined, s"UnitType_$n not found"); m.get.group(1).toInt
    }
    assert(QueryStatus.UnitSync == unitVal("Sync"))
    assert(QueryStatus.UnitLoad == unitVal("Load"))
    assert(QueryStatus.UnitDump == unitVal("Dump"))
    assert(QueryStatus.UnitRelay == unitVal("Relay"))
  }

  test("schema-op enum and the one-row render match the reference, parsed") {
    assume(Files.exists(pbFile), "reference checkout not present")
    import graft.streaming.SchemaOps
    def opVal(n: String): Int = {
      val m = ("""SchemaOp_""" + n + """\s+SchemaOp = (\d+)""").r
        .findFirstMatchIn(pbSrc)
      assert(m.isDefined, s"SchemaOp_$n not found"); m.get.group(1).toInt
    }
    assert(SchemaOps.GetSchema == opVal("GetSchema"))
    assert(SchemaOps.SetSchema == opVal("SetSchema"))
    assert(SchemaOps.RemoveSchema == opVal("RemoveSchema"))
    assert(SchemaOps.ListSchema == opVal("ListSchema"))
    assert(SchemaOps.ListTable == opVal("ListTable"))
    assert(SchemaOps.ListMigrateTargets == opVal("ListMigrateTargets"))
    // CreateTableSQLToOneRow's exact two-replace recipe (db.go:447-452):
    // note the double-space pass is SINGLE and non-overlapping
    val dbSrc = new String(Files.readAllBytes(
      Paths.get("/root/reference/dm/pkg/conn/db.go")), "UTF-8")
    assert(dbSrc.contains("""sql = strings.ReplaceAll(sql, "\n", "")"""))
    assert(dbSrc.contains("""sql = strings.ReplaceAll(sql, "  ", " ")"""))
    assert(SchemaOps.createTableSqlToOneRow("a\n    b") == "a  b")
  }

  // ---- relay meta constants parsed from the reference ----

  private val relayUtilFile = Paths.get("/root/reference/dm/pkg/utils/relay.go")
  private val relayMetaFile = Paths.get("/root/reference/dm/relay/meta.go")
  private lazy val relayUtilSrc =
    new String(Files.readAllBytes(relayUtilFile), "UTF-8")
  private lazy val relayMetaSrc =
    new String(Files.readAllBytes(relayMetaFile), "UTF-8")

  test("relay meta filenames/suffix format match the reference, parsed") {
    assume(Files.exists(relayUtilFile), "reference checkout not present")
    import graft.streaming.RelayMeta
    assert(RelayMeta.UuidIndexFilename ==
      goStringConst(relayUtilSrc, "UUIDIndexFilename"))
    assert(RelayMeta.MetaFilename ==
      goStringConst(relayUtilSrc, "MetaFilename"))
    // AddSuffixForUUID's format string (relay.go:70-72): sep + %06d
    val fm = """fmt\.Sprintf\("%s%s%06d", uuid, uuidIndexSeparator, id\)""".r
      .findFirstIn(relayUtilSrc)
    assert(fm.isDefined, "AddSuffixForUUID format changed")
    val sep = goStringConst(relayUtilSrc, "uuidIndexSeparator")
    assert(RelayMeta.addSuffixForUuid("u", 7) == s"u${sep}000007")
    // minUUIDSuffix / minCheckpoint (meta.go:31-33)
    val minSfx = """minUUIDSuffix\s*=\s*(\d+)""".r
      .findFirstMatchIn(relayMetaSrc)
    assert(minSfx.isDefined && minSfx.get.group(1).toInt ==
      RelayMeta.MinUuidSuffix)
    val minCk = """minCheckpoint\s*=\s*mysql\.Position\{Pos:\s*(\d+)\}""".r
      .findFirstMatchIn(relayMetaSrc)
    assert(minCk.isDefined && minCk.get.group(1).toLong ==
      RelayMeta.MinCheckpointPos)
  }

  // ---- DDL special comments: the reference's own test table is the spec --

  private val sinkTestFile =
    Paths.get("/root/reference/cdc/owner/ddl_sink_test.go")

  test("addSpecialComment: every reference test-table case reproduces") {
    assume(Files.exists(sinkTestFile), "reference checkout not present")
    import graft.core.SpecialComment
    // the q287 gate's Scala-side extraction (its DuckDB oracle re-parses
    // the same file independently)
    val cases = graft.queries.DdlQueries.specialCommentCases()
    assert(cases.size == 54, s"expected 54 parsed cases, got ${cases.size}")
    for (((q, cs, want), i) <- cases.zipWithIndex) {
      val got = SpecialComment.render(q, cs)
      assert(got == want, s"case ${i + 1}:\n  Q: $q\n  want: $want\n  got:  $got")
    }
    // the trailing multi-statement case errors (ddl_sink_test.go:570-575)
    intercept[SpecialComment.RenderError] {
      SpecialComment.render(
        "alter table t force, auto_increment = 12;" +
          "alter table t force, auto_increment = 12;")
    }
  }

  test("addSpecialComment: rendering is a fixpoint (q119's render contract)") {
    assume(Files.exists(sinkTestFile), "reference checkout not present")
    import graft.core.SpecialComment
    // the emitted T![...] comments are live syntax to the parser — the
    // reference's own round-trip property (an already-commented DDL
    // re-renders identically, ddl_sink_test cases 17/23/33/43). Modulo
    // whitespace runs: every REMOVED placement leaves a pure-whitespace
    // artifact (trailing / before-comma / doubled space) that a second
    // render — with the placement gone — cannot reproduce.
    def norm(s: String) =
      s.replaceAll("\\s+", " ").replaceAll(" ,", ",").trim
    for ((q, cs, _) <- graft.queries.DdlQueries.specialCommentCases()) {
      val once = SpecialComment.render(q, cs)
      if (once.nonEmpty)
        assert(norm(SpecialComment.render(once, cs)) == norm(once),
          s"not a fixpoint: $q")
    }
  }

  test("GTID-set compare: interval algebra == element-wise containment") {
    // CompareGTID's mutual-containment semantics
    // (dm/pkg/binlog/position.go:368-397), the kernel's merged-interval
    // containment checked against a brute-force element expansion
    import graft.streaming.RelayControl
    val rnd = new Random(289)
    def randSet(): String = {
      val uuids = Seq("ua", "ub", "uc").take(1 + rnd.nextInt(3))
      uuids.take(1 + rnd.nextInt(uuids.size)).map { u =>
        val ivs = (1 to 1 + rnd.nextInt(3)).map { _ =>
          val lo = 1 + rnd.nextInt(20); val hi = lo + rnd.nextInt(6)
          if (lo == hi) s"$lo" else s"$lo-$hi"
        }
        s"$u:${ivs.mkString(":")}"
      }.mkString(",")
    }
    def elems(s: String): Set[(String, Long)] =
      if (s.isEmpty) Set.empty
      else s.split(",").flatMap { part =>
        val ps = part.split(":")
        ps.tail.flatMap { r =>
          val b = r.split("-").map(_.toLong)
          val (lo, hi) = (b(0), if (b.length == 2) b(1) else b(0))
          (lo to hi).map(ps.head -> _)
        }
      }.toSet
    for (_ <- 1 to 500) {
      val (s1, s2) = (randSet(), if (rnd.nextBoolean()) randSet() else "")
      val (e1, e2) = (elems(s1), elems(s2))
      val want =
        if (e1.isEmpty && e2.isEmpty) (0, true)
        else if (e1.isEmpty) (-1, true)
        else if (e2.isEmpty) (1, true)
        else {
          val (c1, c2) = (e2.subsetOf(e1), e1.subsetOf(e2))
          if (c1 && c2) (0, true)
          else if (c1) (1, true) else if (c2) (-1, true) else (0, false)
        }
      assert(RelayControl.compareGtid(s1, s2) == want, s"s1=$s1 s2=$s2")
    }
  }

  test("300 random relay-meta traces: kernel == flat-state simulator") {
    // the q286 oracle replays four scripts; this drives RANDOM event
    // sequences through RelayMeta against a from-the-Go flat replay
    // (meta.go AddDir/Save/Flush/Trim/Load) holding its OWN copy of the
    // filesystem image, so edges the scripts don't compose diverge loudly
    import graft.streaming.{BinlogPos, RelayMeta}
    val rnd = new Random(86)
    for (trace <- 1 to 300) {
      val fs = new RelayMeta.Fs
      var m = new RelayMeta(fs)
      // fully independent sim state (its own fs image)
      var cur = ""; var name = ""; var pos = 4L; var btid = ""; var gs = ""
      var dirty = false
      var mem = Vector.empty[String]   // the kernel's MEMORY subDirs
      var sFile = Vector.empty[String] // the server-uuid.index FILE lines
      var sDirs = Set.empty[String]
      val sMetas = scala.collection.mutable.Map.empty[String, (String, Long, String)]
      def sFlush(): Unit =
        if (cur.nonEmpty) { sMetas(cur) = (name, pos, btid); dirty = false }
      for (step <- 1 to 30) {
        rnd.nextInt(7) match {
          case 0 => // adddir
            val uuid = Seq("ua", "ub")(rnd.nextInt(2))
            val sfx = if (rnd.nextInt(4) == 0) 1 + rnd.nextInt(3) else 0
            val np = if (rnd.nextBoolean())
              Some((s"f.${"%06d".format(1 + rnd.nextInt(9))}",
                rnd.nextInt(100).toLong)) else None
            val ng = if (rnd.nextInt(3) == 0) Some(s"g:$step") else None
            val newSub =
              if (cur.isEmpty)
                RelayMeta.addSuffixForUuid(uuid, if (sfx == 0) 1 else sfx)
              else RelayMeta.addSuffixForUuid(uuid,
                BinlogPos.parseRelaySubDir(cur).toOption.get._2 + 1)
            val existed = sDirs.contains(newSub)
            m.addDir(uuid, np, ng, sfx)
            if (dirty) sFlush() // the pre-rotation flush happens either way
            if (!existed) {
              sDirs += newSub
              mem = mem :+ newSub
              sFile = mem // updateIndexFile writes memory+new, overwriting
              cur = newSub
              np match {
                case Some((n, p)) => name = n; pos = p
                case None => name = ""; pos = 4L
              }
              ng.foreach { g => gs = g; btid = g }
              sFlush()
            }
          case 1 => // save
            val g = if (rnd.nextBoolean()) Some(s"g:$step") else None
            m.save(s"bin.${"%06d".format(step)}", step.toLong, g)
            if (cur.nonEmpty) {
              name = s"bin.${"%06d".format(step)}"; pos = step.toLong
              g match {
                case None => btid = ""
                case Some(x) => btid = x; gs = x
              }
              dirty = true
            }
          case 2 =>
            m.flush(); sFlush()
          case 3 => // an external rm -rf: the subdir AND its relay.meta go
            if (sDirs.nonEmpty) {
              val d = sDirs.toSeq.sorted.apply(rnd.nextInt(sDirs.size))
              fs.dirs -= d
              fs.metas.remove(d)
              sDirs -= d
              sMetas.remove(d)
            }
          case 4 => // trim
            m.trimUuidIndexFile()
            val kept = mem.filter(sDirs.contains)
            if (kept.size != mem.size) {
              mem = kept
              sFile = kept
            }
          case 5 => // reload (fresh instance over the same image)
            m = new RelayMeta(fs)
            m.load()
            val lines = sFile
            val sfxs = lines.map(l =>
              BinlogPos.parseRelaySubDir(l).toOption.map(_._2))
            val consec = sfxs.forall(_.isDefined) &&
              sfxs.flatten.sliding(2).forall(w =>
                w.size < 2 || w(1) == w(0) + 1)
            name = ""; pos = 4L; btid = ""; gs = ""; dirty = false
            if (consec) {
              cur = lines.lastOption.getOrElse("")
              mem = lines
              sMetas.get(cur).foreach { case (n, p, g) =>
                name = n; pos = p; btid = g; if (g.nonEmpty) gs = g
              }
            } else { cur = ""; mem = Vector.empty }
          case _ => // adjust (non-gtid, valid configured name)
            val nm = s"adj.${"%06d".format(1 + rnd.nextInt(5))}"
            m.adjustWithStartPos(nm, "", enableGtid = false, "", "")
            val meaningless = cur.isEmpty ||
              (BinlogPos.parseRelaySubDir(cur).toOption.exists(_._2 == 1) &&
                !(name > "" || (name == "" && pos > 4L)) && btid.isEmpty)
            if (meaningless) {
              name = nm; pos = 4L; btid = ""; gs = ""
              sFlush()
            }
        }
        val ctx = s"trace $trace step $step"
        val (kc, kn, kp) = m.pos
        assert(kc == cur && kn == name && kp == pos, ctx)
        assert(m.fileGtid == btid && m.gtidView._2 == gs, ctx)
        assert(m.dirty == dirty, ctx)
        assert(fs.indexLines == sFile, ctx)
        assert(fs.dirs.toSet == sDirs, ctx)
        assert(fs.metas.toMap == sMetas.toMap, ctx)
      }
    }
  }

  // ---- randomized stage-machine property vs an independent simulator ----

  /** Flat-state replay written directly from the Go control flow (NOT via
    * the kernel's methods): classification strings come from the PARSED
    * reference constants, transitions from first principles. */
  private final class Sim(modeOk: Boolean, syncer: Boolean, delay: Long,
                          flushIv: Long) {
    var closed = false; var created = false; var running = false
    var mark = false; var errs = 0
    var startT = 0L; var lastF = 0L
    var cut: Option[Long] = None; var floc: Option[Long] = None
    var flushes = 0
    var ins = 0L; var upd = 0L; var del = 0L
    var sub = 1
    val tables = scala.collection.mutable.Map.empty[String, (Boolean, String)]

    private def msgOf(trk: Boolean, vis: Int, bc: Int, epk: Boolean,
                      cpk: Boolean): Option[String] =
      if (!trk) Some(goStringConst(valSrc, "tableNotSyncedOrDropped"))
      else if (vis < bc) Some(goStringConst(valSrc, "moreColumnInBinlogMsg"))
      else if (!epk && cpk)
        Some(goStringConst(valSrc, "downstreamPKColumnOutOfBoundsMsg"))
      else if (!epk) Some(goStringConst(valSrc, "tableWithoutPrimaryKeyMsg"))
      else None

    def start(expect: Int, t: Long, fails: Boolean): Unit = {
      if (closed || expect == 0 || !modeOk || !syncer) return
      if (!created) { created = true; running = false }
      if (running || expect != 2) return
      mark = false; errs = 0; ins = 0; upd = 0; del = 0; tables.clear()
      if (fails) { errs = 1; return }
      startT = t; lastF = t; running = true
    }
    def delayMark(t: Long): Unit =
      if (running && t - startT >= delay) mark = true
    def row(t: Long, tbl: String, trk: Boolean, vis: Int, bc: Int,
            epk: Boolean, cpk: Boolean, ct: Int, n: Long, filt: Boolean,
            id: Boolean): Unit = {
      if (!created || !running) return
      delayMark(t)
      if (filt) return
      if (tables.get(tbl).exists(!_._1)) return
      msgOf(trk, vis, bc, epk, cpk) match {
        case Some(m) => tables(tbl) = (false, m)
        case None =>
          tables(tbl) = (true, "")
          if (ct == 1 && id) { del += n; ins += n }
          else if (ct == 0) ins += n
          else if (ct == 1) upd += n
          else del += n
      }
    }
    def xid(t: Long, loc: Long): Unit = {
      if (!created || !running) return
      delayMark(t)
      val nc = cut.exists(_ <= loc)
      if (t - lastF > flushIv || nc) {
        if (nc) cut = None
        lastF = t; flushes += 1; floc = Some(loc)
      }
    }
  }

  test("300 random traces: kernel == independent simulator") {
    assume(Files.exists(valFile), "reference checkout not present")
    val rnd = new Random(17)
    for (trace <- 1 to 300) {
      val modeOk = rnd.nextInt(8) > 0
      val syncer = rnd.nextInt(8) > 0
      val delay = 200L + rnd.nextInt(800)
      val flushIv = 100L + rnd.nextInt(400)
      val m = new ValidatorLifecycle(
        mode = if (modeOk) (if (rnd.nextBoolean()) ModeFast else ModeFull)
               else ModeNone,
        hasSyncer = syncer, rowErrorDelayMs = delay,
        metaFlushIntervalMs = flushIv)
      val s = new Sim(modeOk, syncer, delay, flushIv)
      var t = 0L
      for (step <- 1 to 40) {
        t += rnd.nextInt(120)
        rnd.nextInt(11) match {
          case 0 =>
            val (es, ev) = (Seq(2, 4)(rnd.nextInt(2)), Seq(0, 2, 4)(rnd.nextInt(3)))
            m.subtaskRun(es, ev, t)
            if (!s.closed && s.sub != 2 && s.sub != 5) {
              s.start(ev, t, fails = false); s.sub = es
            }
          case 1 =>
            val (e, f) = (Seq(0, 2, 4)(rnd.nextInt(3)), rnd.nextInt(4) == 0)
            m.startValidator(e, t, initFails = f); s.start(e, t, f)
          case 2 => m.stopValidator(); if (s.created && s.running) s.running = false
          case 3 =>
            val c = rnd.nextBoolean()
            m.validatorError(contextCancelled = c)
            if (s.created && s.running && !c) { s.errs += 1; s.running = false }
          case 4 => m.subtaskPause(); if (s.sub == 2) s.sub = 3
          case 5 => m.subtaskResume(); if (s.sub == 3) s.sub = 2
          case 6 =>
            m.subtaskClose()
            if (s.sub != 4 && s.sub != 5) {
              s.sub = 4; s.running = false; s.created = false; s.closed = true
            }
          case 7 =>
            val (v, y) = (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)
            m.observeProgress(v, y, t)
            if (s.created && s.running) { s.delayMark(t); if (v >= y) s.mark = true }
          case 8 =>
            val loc = rnd.nextInt(1000).toLong
            m.setCutOver(loc); if (s.created) s.cut = Some(loc)
          case 9 =>
            val loc = rnd.nextInt(1000).toLong
            m.txnBoundary(loc, t); s.xid(t, loc)
          case _ =>
            val tbl = if (rnd.nextBoolean()) "t1" else "t2"
            val (trk, vis, bc) = (rnd.nextInt(6) > 0, 2 + rnd.nextInt(2), 3)
            val (epk, cpk) = (rnd.nextInt(4) > 0, rnd.nextBoolean())
            val (ct, n) = (rnd.nextInt(3), 1L + rnd.nextInt(5))
            val (filt, id) = (rnd.nextInt(5) == 0, rnd.nextBoolean())
            m.rowsEvent(tbl, s"tgt_$tbl",
              TableFacts(trk, vis, bc, epk, cpk), ct, n.toInt, t,
              filtered = filt, identityUpdated = id)
            s.row(t, tbl, trk, vis, bc, epk, cpk, ct, n, filt, id)
        }
        val ctx = s"trace $trace step $step"
        assert(m.stage == (if (s.created) (if (s.running) 2 else 4) else 0), ctx)
        assert(m.subtaskView == s.sub, ctx)
        assert(m.isMarkErrorStarted == (s.created && s.mark), ctx)
        assert(m.errorCount == s.errs, ctx)
        assert(m.processedRowCounts == ((s.ins, s.upd, s.del)), ctx)
        assert(m.flushes == s.flushes, ctx)
        assert(m.lastFlushedLoc == s.floc, ctx)
        val kt = m.tableStatuses().map(x =>
          x.source -> (x.stage == Running, x.message)).toMap
        assert(kt == s.tables.toMap, ctx)
      }
    }
  }
}
