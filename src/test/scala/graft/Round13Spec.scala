package graft

import org.apache.spark.sql.functions._
import graft.streaming.Bootstrap
import graft.streaming.Bootstrap.BootstrapConfig
import graft.streaming.KafkaOptions
import graft.streaming.KafkaOptions.{Options, TopicMeta}
import graft.diff.{BucketSplit, DiffReport}
import graft.diff.BucketSplit.BucketStat

/** Round-13 randomized reference-fold properties over the round-12
  * kernels, with RANDOM CONFIGS (the fixed-config simulator in
  * BootstrapSpec leaves the tick/gc phase interplay untested):
  *
  *  - the bootstrap-worker replay against an independent global-clock
  *    simulator under randomized knobs — interval < tick, count = 1,
  *    maxInactive < gc, tick/gc non-multiples, plus occasional disabled
  *    configs;
  *  - the diff report assembly WITH the check-mode switch against a
  *    direct Go-semantics CASE replay of (mode, struct, data, lack)
  *    tuples (main.go:115-140 × CommitSummary:175-187).
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  // ---- bootstrap cadence under random configs --------------------------

  test("bootstrap replay equals a global-clock simulator under 100 random configs") {
    val rnd = new scala.util.Random(1301L)
    val Grid = 500L // all instants live on a 500 ms grid
    for (trial <- 0 until 100) {
      val cfg = BootstrapConfig(
        // intervalSec may undercut tickSec; inMsgCount down to 1
        intervalSec = 1 + rnd.nextInt(30),
        inMsgCount = 1 + rnd.nextInt(6),
        maxInactiveSec = 1 + rnd.nextInt(50), // may undercut gcSec
        tickSec = 1 + rnd.nextInt(7),
        gcSec = 1 + rnd.nextInt(40)) // need not be a tick multiple
      val tables = Seq.tabulate(1 + rnd.nextInt(3))(i => s"t$i")
      val events = tables.flatMap { t =>
        var ts = rnd.nextInt(10) * Grid
        Seq.fill(rnd.nextInt(20)) {
          val e = (t, ts)
          ts += (1 + rnd.nextInt(120)) * Grid // gaps up to 60 s
          e
        }
      }.sortBy(_._2)
      if (events.nonEmpty) {
        val horizon = events.map(_._2).max + rnd.nextInt(40) * Grid
        val tickMs = cfg.tickSec * 1000L
        val gcMs = cfg.gcSec * 1000L
        // independent simulator: ONE global clock over the shared grid
        val expected = scala.collection.mutable.Set.empty[(String, Long, String)]
        val st = scala.collection.mutable.Map.empty[String,
          (Long, Long, Long)] // lastSend, counter, lastRecv
        var evIdx = 0
        var t = 0L
        while (t <= horizon) {
          while (evIdx < events.length && events(evIdx)._2 == t) {
            val (tbl, _) = events(evIdx)
            st.get(tbl) match {
              case None =>
                expected += ((tbl, t, "new")); st(tbl) = (t, 0L, t)
              case Some((ls, c, _)) => st(tbl) = (ls, c + 1, t)
            }
            evIdx += 1
          }
          if (t > 0 && t % tickMs == 0)
            for ((tbl, (ls, c, lr)) <- st) {
              val timeDue = t - ls >= cfg.intervalSec * 1000L
              if (timeDue || c >= cfg.inMsgCount) {
                expected += ((tbl, t, if (timeDue) "interval" else "count"))
                st(tbl) = (t, 0L, lr)
              }
            }
          if (t > 0 && t % gcMs == 0) // gc strictly after the tick
            st.filterInPlace { case (_, (_, _, lr)) =>
              t - lr <= cfg.maxInactiveSec * 1000L }
          t += Grid
        }
        val df = events.map { case (tb, ts) => ("db", tb, ts, 2) }
          .toDF("schema_name", "table_name", "ts_ms", "total_partition")
        val got = Bootstrap.sends(df, cfg, horizon)
          .select("table_name", "send_ms", "trigger")
          .as[(String, Long, String)].collect().toSet
        assert(got === expected.toSet, s"trial $trial cfg=$cfg")
      }
      // sprinkle disabled configs: either knob non-positive → no sends
      if (trial % 25 == 0) {
        val dis = if (rnd.nextBoolean()) cfg.copy(intervalSec = 0)
                  else cfg.copy(inMsgCount = 0)
        val df = Seq(("db", "t", 1000L, 2))
          .toDF("schema_name", "table_name", "ts_ms", "total_partition")
        assert(Bootstrap.sends(df, dis, 60000L).count() === 0L)
      }
    }
  }

  // ---- check-mode × classification against a direct Go replay ----------

  private def structF(rows: (String, Boolean, Boolean, Int)*) =
    rows.map { case (t, se, sk, lack) => ("s", t, se, sk, lack) }
      .toDF("schema_name", "table_name", "struct_equal", "data_skip",
        "table_lack")

  private def chunkF(rows: (String, Int, Boolean, Long, Long)*) =
    rows.map { case (t, c, eq, ra, rd) => ("s", t, c, eq, ra, rd, 10L, 10L) }
      .toDF("schema_name", "table_name", "chunk_id", "chunk_equal",
        "rows_add", "rows_delete", "up_count", "down_count")

  test("check-mode × report classification equals a direct Go replay (600 tuples)") {
    val rnd = new scala.util.Random(1302L)
    for (batch <- 0 until 2; mode <- Seq("both", "struct-only", "data-only")) {
      val tables = Seq.tabulate(100) { i =>
        val lack = rnd.nextInt(4) match {
          case 0 => DiffReport.UpstreamTableLackFlag
          case 1 => DiffReport.DownstreamTableLackFlag
          case _ => DiffReport.AllTableExistFlag
        }
        // reference invariant: struct_equal false whenever the table
        // lacks (SetTableStructCheckResult receives isEqual=false there)
        (s"t$i", rnd.nextBoolean() && lack == 0, rnd.nextBoolean(), lack)
      }
      val chunks = tables.flatMap { case (t, _, _, _) =>
        Seq.fill(rnd.nextInt(3))((t, rnd.nextInt(8), rnd.nextBoolean(),
          rnd.nextInt(5).toLong, rnd.nextInt(5).toLong))
      }
      val (sf, cf) = DiffReport.applyCheckMode(mode, structF(tables: _*),
        chunkF(chunks: _*))
      val res = DiffReport.withSummary(DiffReport.tableResults(sf, cf))
        .collect().map(r => r.getAs[String]("table_name") -> r).toMap

      // direct replay of main.go's mode switch composed with
      // CommitSummary's CASE — written from the Go, not from the
      // DataFrame code
      val byT = chunks.groupBy(_._1)
      val states = tables.map { case (t, se0, _, lack0) =>
        val (se, lack, de) = mode match {
          case "struct-only" => (se0, lack0, true) // Equal never runs
          case "data-only" => // StructEqual never runs; lack unreported
            (true, DiffReport.AllTableExistFlag,
              byT.getOrElse(t, Nil).forall(_._3))
          case _ => (se0, lack0, byT.getOrElse(t, Nil).forall(_._3))
        }
        val state =
          if (se && de) "pass"
          else if (lack != DiffReport.AllTableExistFlag) "skipped"
          else "fail"
        (t, state, lack == DiffReport.AllTableExistFlag && !(se && de))
      }
      val anyFail = states.exists(_._3)
      val byState = states.groupBy(_._2).view.mapValues(_.size.toLong)
        .toMap.withDefaultValue(0L)
      for ((t, state, _) <- states) {
        val r = res(t)
        assert(r.getAs[String]("state") === state, s"$mode $batch $t")
        assert(r.getAs[String]("result") ===
          (if (anyFail) "fail" else "pass"), s"$mode $batch")
        assert(r.getAs[Long]("pass_num") === byState("pass") &&
          r.getAs[Long]("failed_num") === byState("fail") &&
          r.getAs[Long]("skipped_num") === byState("skipped"),
          s"$mode $batch")
      }
    }
  }

  // ---- Kafka AdjustOptions against an independent decision table -------

  test("kafka adjust equals a flat decision-table replay (500 random tuples)") {
    val rnd = new scala.util.Random(1303L)
    def maybe(v: => Int): Option[Int] =
      if (rnd.nextBoolean()) Some(v) else None
    for (trial <- 0 until 500) {
      val o = Options(
        partitionNum = rnd.nextInt(7), // 0 = unset
        replicationFactor = 1 + rnd.nextInt(4),
        maxMessageBytes = 200 + rnd.nextInt(2000),
        requiredAcks = Seq(-1, 0, 1)(rnd.nextInt(3)),
        autoCreate = rnd.nextBoolean())
      val meta = TopicMeta(
        exists = rnd.nextBoolean(),
        numPartitions = 1 + rnd.nextInt(5),
        // caps straddle the declared mmb and its 128-byte overhead band
        topicMaxMessageBytes = maybe(o.maxMessageBytes - 150 + rnd.nextInt(300)),
        brokerMessageMaxBytes = maybe(o.maxMessageBytes - 150 + rnd.nextInt(300)),
        topicMinInsyncReplicas = maybe(1 + rnd.nextInt(5)),
        brokerMinInsyncReplicas = maybe(1 + rnd.nextInt(5)))

      // Flat replay written from the Go (options.go:580-686,688-756), as a
      // straight-line decision table — no shared code with adjust().
      val minIsr =
        if (meta.exists)
          meta.topicMinInsyncReplicas.orElse(meta.brokerMinInsyncReplicas)
        else meta.brokerMinInsyncReplicas
      val isrErr = o.requiredAcks == -1 && minIsr.exists(o.replicationFactor < _)
      val isrWarn = o.requiredAcks == -1 && minIsr.isEmpty
      val cap =
        if (meta.exists)
          meta.topicMaxMessageBytes.orElse(meta.brokerMessageMaxBytes)
        else meta.brokerMessageMaxBytes
      val expected: Either[String, (Int, Int, Set[String])] =
        if (isrErr) Left(KafkaOptions.ErrInvalidConfig)
        else if (cap.isEmpty) Left(KafkaOptions.ErrBrokerConfigNotFound)
        else {
          val c = cap.get
          val mmb = math.min(o.maxMessageBytes, c - 128)
          val capWarn =
            if (c <= o.maxMessageBytes)
              Set(if (meta.exists) "topic-cap-below-declared"
                  else "broker-cap-below-declared")
            else Set.empty[String]
          if (meta.exists) {
            if (o.partitionNum > meta.numPartitions)
              Left(KafkaOptions.ErrInvalidPartitionNum)
            else {
              val pn = if (o.partitionNum == 0) meta.numPartitions
                       else o.partitionNum
              val w = capWarn ++
                (if (o.autoCreate) Set("topic-already-exists") else Set.empty) ++
                (if (o.partitionNum != 0 && o.partitionNum < meta.numPartitions)
                   Set("partition-num-less-than-topic") else Set.empty) ++
                (if (isrWarn) Set("min-insync-replicas-not-found") else Set.empty)
              Right((pn, mmb, w))
            }
          } else {
            val pn = if (o.partitionNum == 0) 3 else o.partitionNum
            val w = capWarn ++
              (if (o.partitionNum == 0) Set("partition-num-defaulted")
               else Set.empty) ++
              (if (isrWarn) Set("min-insync-replicas-not-found") else Set.empty)
            Right((pn, mmb, w))
          }
        }

      (KafkaOptions.adjust(o, meta), expected) match {
        case (Left((err, _)), Left(e)) => assert(err === e, s"trial $trial")
        case (Right(a), Right((pn, mmb, w))) =>
          assert(a.options.partitionNum === pn, s"trial $trial $o $meta")
          assert(a.options.maxMessageBytes === mmb, s"trial $trial $o $meta")
          assert(a.warnings.toSet === w, s"trial $trial $o $meta")
        case (got, exp) => fail(s"trial $trial: got $got, expected $exp")
      }
    }
  }

  // ---- Go duration grammar vs a compositional replay --------------------

  test("parseGoDurationMs equals unit-sum replay over 400 random compositions") {
    val rnd = new scala.util.Random(1308L)
    // ms and up, halves only: every part is exactly representable, so the
    // replay's ms-sum and the parser's ns-sum/1e6 truncate identically
    val units = Seq("ms" -> 1.0, "s" -> 1000.0, "m" -> 60000.0,
      "h" -> 3600000.0)
    for (trial <- 0 until 400) {
      val n = 1 + rnd.nextInt(3)
      val parts = Seq.fill(n) {
        val (u, f) = units(rnd.nextInt(units.size))
        val v = if (rnd.nextBoolean()) (1 + rnd.nextInt(500)).toString
                else s"${rnd.nextInt(100)}.5"
        (v, u, v.toDouble * f)
      }
      val neg = rnd.nextInt(4) == 0
      val s = (if (neg) "-" else "") + parts.map(p => p._1 + p._2).mkString
      val expected = ((if (neg) -1 else 1) * parts.map(_._3).sum).toLong
      assert(KafkaOptions.parseGoDurationMs(s) == Right(expected),
        s"trial $trial: $s")
      // malformed variants reject: trailing junk, unit-less number
      assert(KafkaOptions.parseGoDurationMs(s + "x").isLeft, s"trial $trial")
      assert(KafkaOptions.parseGoDurationMs(parts.head._1).isLeft)
    }
    // Go's documented special case: bare "0" is a valid duration
    assert(KafkaOptions.parseGoDurationMs("0") == Right(0L))
    assert(KafkaOptions.parseGoDurationMs("1").isLeft)
  }

  // ---- client-id minting: sanitize exactly [?:,"] then gate -------------

  test("kafka client id sanitizes [?:,\"] and gates the rest (300 random addrs)") {
    val rnd = new scala.util.Random(1309L)
    val alphabet = "abcZ09._-?:,\"!@ /é"
    for (trial <- 0 until 300) {
      val addr = Seq.fill(1 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = KafkaOptions.clientId(addr, "default", "cf-1")
      val minted = s"TiCDC_producer_${addr}_default_cf-1"
        .replaceAll("[?:,\"]", "_")
      val legal = minted.matches("[A-Za-z0-9._-]+")
      assert(got == (if (legal) Right(minted)
                     else Left(KafkaOptions.ErrInvalidClientID -> minted)),
        s"trial $trial: $addr")
    }
    // a configured id is taken verbatim — sanitizing does NOT apply
    assert(KafkaOptions.clientId("a", "b", "c", configured = "x:y").isLeft)
  }

  // ---- update-path compat rule vs a truth-table replay ------------------

  test("CheckCompatibilityWithSinkURI truth table (256 random tuples)") {
    import graft.streaming.ReplicaValidate
    val rnd = new scala.util.Random(1310L)
    val vals = Seq("", "canal-json", "simple")
    for (trial <- 0 until 256) {
      val (op, oa) = (vals(rnd.nextInt(3)), vals(rnd.nextInt(3)))
      val (np, na) = (vals(rnd.nextInt(3)), vals(rnd.nextInt(3)))
      val uri = Map("protocol" -> vals(rnd.nextInt(3)),
        "transaction-atomicity" -> vals(rnd.nextInt(3)))
        .filter(_._2.nonEmpty)
      def confl(p: String, a: String) =
        uri.get("protocol").exists(u => p.nonEmpty && u != p) ||
        uri.get("transaction-atomicity").exists(u => a.nonEmpty && u != a)
      // Go truth table (sink.go:941-971): no change → ok; URI-driven
      // change → ok even if it conflicts with the new config; a pure
      // config-block change that conflicts with the URI → refuse
      val expected =
        if (!confl(op, oa) && (np, na) == ((op, oa))) Right(())
        else if (confl(op, oa) && confl(np, na)) Right(())
        else if (confl(np, na))
          Left(ReplicaValidate.ErrIncompatibleSinkConfig)
        else Right(())
      val got = ReplicaValidate.checkCompatibilityWithSinkUri(
        np, na, op, oa, uri)
      assert(got.left.map(_._1) == expected, s"trial $trial: $op/$oa -> $np/$na uri=$uri")
    }
  }

  // ---- bucket fold invariants under random stats tables ----------------

  test("bucket chunks tile the key space under 200 random stats tables") {
    val rnd = new scala.util.Random(1304L)
    for (trial <- 0 until 200) {
      val nB = 1 + rnd.nextInt(12)
      var cum = 0L
      var upper = rnd.nextInt(5).toLong
      val stats = (0 until nB).map { i =>
        cum += 1 + rnd.nextInt(3000)
        upper += 1 + rnd.nextInt(50)
        BucketStat(i, cum, upper)
      }
      val chunkSize = 500L + rnd.nextInt(2000)
      val chunks = BucketSplit.bucketChunks(stats, chunkSize, -1L)
      // tiling: first lower open, last upper open, bounds chain exactly
      assert(chunks.head.lower.isEmpty && chunks.last.upper.isEmpty, s"$trial")
      for (Seq(a, b) <- chunks.sliding(2))
        assert(a.upper === b.lower, s"trial $trial: ${a.upper} ${b.lower}")
      // every closed group ends on a bucket upper bound; fat single
      // buckets carry piece count (count + half) / chunkSize
      val closers = chunks.filter(c => c.kind == "merged" || c.kind == "single")
      for (c <- closers)
        assert(stats.exists(s => Some(s.upper) == c.upper), s"trial $trial")
      // split runs: ≥2 pieces (one piece would have been "single"),
      // each run ending on a real bucket bound; ids dense over ALL chunks
      assert(chunks.map(_.chunkId) === chunks.indices.toSeq, s"trial $trial")
      val splitRuns = chunks.foldLeft(List.empty[List[BucketSplit.BucketChunk]]) {
        case (acc, c) if c.kind == "split" => acc match {
          case h :: t if h.head.kind == "split" => (c :: h) :: t
          case _ => List(c) :: acc
        }
        case (acc, c) => List(c) :: acc
      }.map(_.reverse).reverse.filter(_.head.kind == "split")
      for (g <- splitRuns) {
        assert(g.size >= 2, s"trial $trial")
        assert(stats.exists(s => Some(s.upper) == g.last.upper), s"trial $trial")
      }
      // membership parity on a key sweep across every boundary ±1
      val uppers = chunks.flatMap(_.upper)
      if (uppers.nonEmpty) {
        val keys = uppers.flatMap(u => Seq(u - 1, u, u + 1)).distinct
          .map(k => Tuple1(k)).toDF("k")
        val both = keys.select(
          BucketSplit.assignByUppers(col("k"), uppers).as("byUpper"),
          BucketSplit.assignByRanges(col("k"), chunks).as("byRange"))
        // byRange reports chunkId; split pieces share an id, so compare
        // through the chunk-id the cascade index maps to
        val idOf = chunks.map(_.chunkId).toArray
        val rows = both.collect()
        for (r <- rows)
          assert(idOf(r.getInt(0)) === r.getInt(1), s"trial $trial $r")
      }
    }
  }
}
