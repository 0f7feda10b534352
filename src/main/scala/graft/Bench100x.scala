package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, VectorOps}

/**
 * The 100× scale-regression bench (VERDICT r7 item 7): measures the heavy
 * gate family on a `ScaleGen`-amplified corpus and emits ONE JSON line, so
 * the scale signal is a tracked per-round artifact (BENCH_100x.json) like
 * the sf0.1 one, instead of a hand-run table in NOTES.md.
 *
 * Two groups:
 *  - gate-config entries run the REAL gate plans unchanged (q01, q93,
 *    q74, q101, q51, q65, q67, q150) — their ratios vs BENCH_100x of the
 *    previous round are the regression signal;
 *  - `_knob` entries run the scale-knob configs the gates pin only at
 *    gate scale (q85 with √n IVF cells via [[VectorOps.recommendedCells]],
 *    q103 with √n clusters + widened LSH planes, q116 with the
 *    [[Dedup.simhashBandPlan]] width) — these are the numbers that must
 *    stay near-linear as K grows.
 *
 * q150 vs (q65 + q67) is the labels-not-pairs check: the pair-based path
 * pays for the materialized candidate list (1.22e9 pairs at 100× on the
 * dup-dense corpus — NOTES), the labels path must not.
 *
 * Usage: tools/run.sh graft.Bench100x <scaledDir> [gate,...]
 * (generate the dir once with `tools/run.sh graft.ScaleGen
 * /root/testdata/sf0.1 /tmp/graft_sf10 100`).
 */
object Bench100x {

  /** The √n-cell index, built ONCE the production way — centroids train on
    * a bounded SAMPLE (the FAISS practice: ~40-50 vectors per cell, never
    * the full corpus), then one full-corpus assignment pass — and shared
    * by the IVF-search and SemDeDup entries (one index serves both).
    * `q85_ivf_index` times this build as its own line item so the search
    * numbers measure the recurring per-query cost, not the amortized
    * one-off. */
  private var ivfIndex: Option[(DataFrame, DataFrame)] = None
  private def buildIvfIndex(dir: String, spark: SparkSession): (DataFrame, DataFrame) =
    ivfIndex.getOrElse {
      val e = Tables.load(spark, dir, "embeddings")
      val n = e.count()
      val k = VectorOps.recommendedCells(n)
      val sampleEvery = math.max(1L, n / (50L * k))
      val trained = VectorOps.kmeans(
        e.filter(col("vec_id") % sampleEvery === 0), k, iters = 2)
      val cents = VectorOps.centroids(
        trained.select(col("centroid_id"), col("embedding")),
        "centroid_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val assigned = VectorOps.assignCentroids(e, cents)
        .select(col("centroid_id"), col("vec_id"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assigned.count()
      val built = (assigned, cents)
      ivfIndex = Some(built)
      built
    }

  private def knobGates(dir: String, spark: SparkSession)
      : Seq[(String, () => DataFrame)] = Seq(
    "q85_ivf_index" -> { () =>
      val (assigned, _) = buildIvfIndex(dir, spark)
      assigned.groupBy("centroid_id").agg(count(lit(1)).as("n"))
    },
    "q85_ivf_knob" -> { () =>
      val (assigned, cents) = buildIvfIndex(dir, spark)
      val e = Tables.load(spark, dir, "embeddings")
      VectorOps.ivfSearch(assigned, e.filter(expr("vec_id % 50 = 0")), cents,
        nProbe = 3, k = 3)
    },
    "q103_semdedup_knob" -> { () =>
      val e = Tables.load(spark, dir, "embeddings")
      val n = e.count()
      // planes ∝ log2: per-bucket pairs grow as (n/(k·2^planes))²
      val planes = math.min(16,
        math.max(6, 64 - java.lang.Long.numberOfLeadingZeros(n / 1000 + 1)))
      val (assigned, _) = buildIvfIndex(dir, spark)
      val members = assigned
        .select(col("centroid_id"), col("vec_id"), col("embedding"),
          VectorOps.lshSignature(col("embedding"), planes, 64).as("sig"))
      members.as("a").join(members.as("b"),
          col("a.centroid_id") === col("b.centroid_id") &&
            col("a.sig") === col("b.sig") &&
            col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos",
          VectorOps.cosine(col("a.embedding"), col("b.embedding")))
        .filter(col("cos") >= 0.3)
        .groupBy(col("a.centroid_id"))
        .agg(count(lit(1)).as("n_pairs"))
    },
    "q116_simhash_knob" -> { () =>
      val docs = Tables.load(spark, dir, "documents")
      val n = docs.count()
      val (bits, bands) = Dedup.simhashBandPlan(n, maxHam = 3)
      val sh = Dedup.simhashTable(docs, "doc_id", "text", bits)
      Dedup.simhashCandidates(sh, bits, bands, maxHam = 3)
        .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
    },
    // round-13: the reference's consistency capstone
    // (tests/integration_tests/bank/case.go) promoted to a scale entry:
    // balanced transfers derived from the events table fan out to a
    // debit+credit pair per transfer (both legs share the transfer's
    // batch — txn atomicity), apply to a million-account state in 10
    // ts-aligned batches through a full-outer merge with a per-batch
    // invariant check (Σ deltas must stay 0 after EVERY batch, the
    // microbatch-barrier claim as a number). localCheckpoint per round
    // keeps the 10-join lineage flat; a violation throws, so a green
    // entry IS the invariant.
    "bank_invariant" -> { () =>
      val ev = Tables.load(spark, dir, "events")
      val nAcc = 1 << 20
      val base = ev.select(
          pmod(col("user_id"), lit(nAcc.toLong)).as("f"),
          pmod(col("user_id") * 7 + col("event_id"), lit(nAcc.toLong)).as("t"),
          (col("event_id") % 100 + 1).cast("long").as("a"),
          pmod(col("event_id"), lit(10L)).cast("int").as("batch"))
        .filter(col("f") =!= col("t"))
      val ledger = base.select(col("f").as("pk"), (-col("a")).as("delta"),
          col("batch"))
        .unionByName(base.select(col("t").as("pk"), col("a").as("delta"),
          col("batch")))
      var state = spark.range(0).select(col("id").as("pk"),
        lit(0L).as("bal"))
      var breaks = 0L
      for (b <- 0 until 10) {
        val batchDelta = ledger.filter(col("batch") === b)
          .groupBy("pk").agg(sum("delta").as("d"))
        state = state.join(batchDelta, Seq("pk"), "full")
          .select(col("pk"),
            (coalesce(col("bal"), lit(0L)) +
              coalesce(col("d"), lit(0L))).as("bal"))
          .localCheckpoint()
        val total = state.agg(sum("bal")).head().getLong(0)
        if (total != 0L) breaks += 1
      }
      if (breaks > 0) sys.error(s"bank invariant broken in $breaks batches")
      state.agg(count(lit(1)).as("accounts"), sum("bal").as("net"))
    },
    // round-10: the PRODUCTION z-order writer (range shuffle — the gate's
    // ntile twin is deliberately not run here: a single-task global window
    // is the anti-plan the writer exists to avoid). Writes the 100×
    // lineitem z-clustered, then audits per-file pruning off the footers.
    "q194_zorder_writer" -> { () =>
      import graft.operators.Layout
      // freshScratch sweeps dead runs' GB-scale copies and keys by PID
      val (out0, _) = graft.queries.Gate.freshScratch("graft_zw_", dir)
      val out = s"$out0/z"
      Layout.writeZOrdered(Tables.load(spark, dir, "lineitem"),
        "l_partkey", "l_suppkey", 10, 256, out)
      val stats = spark.read.parquet(out)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("nx"), max("l_partkey").as("xx"),
          min("l_suppkey").as("ny"), max("l_suppkey").as("xy"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("xx") < 500L || col("nx") > 900L ||
            col("xy") < 25L || col("ny") > 50L, 1L).otherwise(0L))
            .as("files_skipped"))
      stats
    })

  private val GateSet = Seq("q01_pricing_summary", "q93_lm_perplexity",
    "q74_checkpoint_resume", "q101_tfidf", "q51_row_diff", "q65_minhash_lsh",
    "q67_dup_clusters", "q150_labels_nopairs",
    // r9 additions: the recall harness (inverted-index truth side — the
    // all-pairs form this replaced would not survive this corpus), and the
    // two bounded-state sketches whose whole point is scale (HLL's shuffle
    // is 256 rows here regardless of corpus size; Bloom bits stay ≤ m).
    "q155_dedup_recall", "q156_hll_distinct", "q157_bloom_membership",
    // r9 additions: BM25 (map-only + TakeOrdered — must stay ~linear),
    // DSIR (two bounded bucket aggs + broadcast scoring), and substring
    // span excision (the ownership/anti-join regime on a dup-dense corpus
    // is exactly what this gate stresses at 100×)
    "q162_bm25", "q167_dsir_select", "q168_span_excision",
    // round-9 continuation: Kneser-Ney (four broadcast model tables off
    // the held slice, map-only scoring — the q93 regime with richer
    // stats), winnowing overlap (in-row fingerprints + a df-capped
    // bucket join on a dup-dense corpus — the bucket cap is what's being
    // stressed), c-TF-IDF (ONE corpus shuffle then vocab-bounded work),
    // and session windows (native session_window over the events table)
    "q178_kneser_ney", "q182_winnow_overlap", "q179_ctfidf_keywords",
    "q183_session_window",
    // round-10: the binned range join (10M points × ~54k global windows —
    // the naive BNLJ form would do ~5e11 comparisons and is deliberately
    // absent), no-shuffle weighted sampling, the anchor-chain dedup fold,
    // IVM state maintenance, grid resample, the funnel automaton, the
    // retention triangle, and k-center selection over 500k vectors
    "q193_range_join", "q195_weighted_sample", "q199_watermark_dedup",
    "q201_ivm_maintain", "q202_resample_ffill", "q207_funnel",
    "q208_retention", "q198_kcenter_coreset",
    // round-11: the warehouse tier at 100× — the native as-of join's
    // single-shuffle union-window claim (backward + forward), the SCD2
    // history build and its time-travel read, conditional MERGE, and the
    // q220 capstone where the merge-apply and history-read paths must
    // agree; measured here WITH per-entry shuffle_mb so "one shuffle" is
    // a number, not scaladoc
    "q187_asof_native", "q215_asof_forward", "q189_scd2_history",
    "q219_time_travel", "q200_merge_into", "q220_warehouse_pipeline",
    // round-11: iterative PageRank with the per-10-rounds localCheckpoint
    // rule now in code (the lineage-blowup fix must hold at 60M edges),
    // keep-first span excision (q168's harder ownership-argmin sibling),
    // the interval×interval binned overlap join, and the sink-side
    // split+class-sort (ONE txn-key window shuffle over the full stream —
    // the per-txn-bounded-state claim as a number)
    "q210_pagerank", "q175_span_keep_first", "q211_overlap_join",
    "q233_sink_split_sort",
    // round-11: the Gopher rule kernels — per-doc in-row passes whose
    // only exchange is the ≤256-row fail-mask histogram (plan-pinned);
    // measured here as corpus-scan THROUGHPUT numbers
    "q234_gopher_quality", "q235_gopher_repetition", "q236_c4_clean",
    // round-11: corpus-frequency boilerplate removal — the one
    // distributed member of the filter family (hash-keyed line DF count,
    // broadcast-back, doc-key rebuild)
    "q237_boilerplate_lines",
    // round-12: bootstrap cadence (per-table fold over ~10M events and a
    // ~200k-instant tick grid — the wall-clock-bounded-state claim as a
    // number), the sync_diff report + checkpoint-resume paths (both ride
    // the TWO-SIDED 32-chunk digest over 60M+60M rows — the checksum
    // phase that precedes q51's row-level join), and the avro watermark
    // framing (control-plane-sized, included for completeness)
    "q239_bootstrap_cadence", "q240_diff_report",
    "q241_diff_checkpoint_resume", "q242_avro_watermark",
    // round-13: the stats-bucket splitter (one histogram partial-agg scan
    // + a codegen'd membership cascade — the V1 chunking path that needs
    // no sampling jobs at all)
    "q247_bucket_chunks",
    // round-15: the shard-merge diff — three routed shard scans through
    // the union-path digest, the per-shard XOR combine, and the keyed
    // full-outer row compare over 60M rows; the one new r15 gate with a
    // corpus-scale plan (the rest are control-plane lifecycle kernels)
    "q263_shard_merge",
    // round-17/18 (r17 VERDICT #7): the lifecycle/scheduler kernels are
    // control-plane O(script) by design — included so the artifact
    // PROVES their cost does not grow with the corpus (each derives at
    // most an 80-value anchor from the data) — plus the bank-invariant
    // gate, whose ten-merge ledger IS corpus-scale (20M ledger rows at
    // sf10)
    "q285_validator_stage", "q286_relay_meta", "q287_ddl_special_comments",
    "q288_validator_error_ops", "q289_relay_control", "q290_task_checker",
    "q291_query_status", "q292_schema_ops", "q293_source_scheduler",
    "q294_scheduler_relay_ops", "q295_load_task_transfer",
    "q296_bank_invariant", "q297_member_ops",
    // round-19: the config-admission kernels are O(matrix) control plane
    // (included to prove flat cost); q303 rides the two-sided 16-chunk
    // digest — a real corpus-scale scan pair with a sampled check plan
    "q298_bootstrap_recovery", "q299_task_validate", "q300_subtask_adjust",
    "q301_source_verify", "q302_task_converters", "q303_diff_sample",
    // round-19/20 completeness (r19 VERDICT #5): every remaining gate
    // family — time/CLI/source converters, the Debezium golden replays,
    // table-structure pairs, the privilege/conn-capacity checkers and
    // the Debezium envelope+decoder — all O(spec)/O(golden) control
    // plane; included so the 100x artifact proves the flat cost
    "q304_time_cli_source", "q305_debezium_types",
    "q306_table_struct_check", "q307_debezium_ddl_columns",
    "q308_privilege_check", "q309_conn_capacity",
    "q310_debezium_envelope", "q311_debezium_decoder",
    "q312_checker_dispatch")

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse(
      System.getProperty("java.io.tmpdir") + "/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Fixed-shuffle calibration gate (r15 VERDICT item 6): ~1 GB of
    // incompressible shuffle, SF-independent — the in-file yardstick that,
    // together with disk_mbps, lets a judge normalize cross-round 100×
    // ratios mechanically when the host's disk band moves. groupBy over
    // 100M unique random hashes: map-side partial agg removes NOTHING, so
    // the exchange carries every row. Two earlier forms collapsed to
    // no-ops — repartition+groupBy(k) lost the user exchange to the
    // aggregate's own (22 MB partial-agg shuffle), and distinct().agg(...)
    // ended GLOBAL, so the bench's trailing .count() constant-folded to 1
    // via OptimizeOneRowPlan and eliminated the subtree entirely. The
    // grouped tail keeps the row count unknown → the plan must execute.
    val calibration: Seq[(String, () => DataFrame)] = Seq(
      "q00_shuffle_cal" -> { () =>
        spark.range(100000000L)
          .select(xxhash64(col("id")).as("v"))
          .groupBy("v").agg(count(lit(1)).as("c"))
      })

    val entries: Seq[(String, () => DataFrame)] =
      calibration ++
        GateSet.map(n => n -> (() => SparkEntry.queries(n)(spark, dir))) ++
        knobGates(dir, spark)
    val only = args.lift(1).map(_.split(',').toSet)
    val sel = entries.filter(e => only.forall(_.contains(e._1)))

    // Warm-up (same rationale as Bench's): compile the scan + shuffle/agg
    // whole-stage-codegen paths and fault in parquet footers BEFORE any
    // timed gate, so the first gate doesn't absorb ~2-4 s of one-off JIT —
    // the reason isolated single-gate runs read high vs in-suite (NOTES r9)
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 97 === 0)
      .groupBy("l_returnflag").agg(count(lit(1))).count()
    Tables.load(spark, dir, "documents")
      .select(sum(length(col("text")))).count()
    spark.range(1000000).select((col("id") % 7).as("k"))
      .dropDuplicates("k").groupBy("k").agg(count(lit(1))).count()

    // per-entry shuffle WRITE volume (the ONE listener + drain discipline
    // shared with Bench): scale claims ("one shuffle", "map-only") become
    // numbers measured identically in both artifacts
    val shuffleWrite = BenchMetrics.install(spark.sparkContext).bytes
    def drain(): Unit = BenchMetrics.drain(spark.sparkContext)

    // Clean-room discipline (r11: q85_ivf_index 199 s in-suite vs 73 s
    // isolated, zero source diff): gates persist/localCheckpoint inside
    // their plans and never unpersist — 40 entries of leftovers evict the
    // storage pool and bill spill to whoever runs next. Sweep cached
    // datasets AND leaked RDDs before each timed entry, and CLEAR the
    // dir-keyed shared-build maps too (a surviving reference to a swept
    // DataFrame would silently recompute unpersisted on every action —
    // q67 re-derived q65's swept LSH table at 4× cost before this): each
    // entry then pays exactly what an isolated run pays. Exception: the
    // two probes that share q85_ivf_index's build, which is timed as its
    // own line item immediately before them.
    val sharesIvfIndex = Set("q85_ivf_knob", "q103_semdedup_knob")
    def cleanRoom(): Unit = {
      graft.queries.Gate.clearSharedCaches()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc()
      // Flush dirty pages between entries (r12 adjudication: the two
      // big-shuffle entries read 1.5-1.7× their isolated numbers with
      // bit-identical plans — the previous entry's unflushed shuffle spill
      // bills its writeback to whoever runs next). `sync` pins the storage
      // state every entry starts from; isolated and in-suite then measure
      // the same thing.
      try new ProcessBuilder("sync").start().waitFor()
      catch { case _: Exception => () }
    }

    val times = sel.map { case (name, mk) =>
      if (sharesIvfIndex(name)) { System.gc(); Thread.sleep(300); System.gc() }
      else cleanRoom()
      drain(); val sh0 = shuffleWrite.get()
      val t0 = System.nanoTime()
      val rows = BenchMetrics.materialize(mk())
      val secs = (System.nanoTime() - t0) / 1e9
      drain(); val shMb = (shuffleWrite.get() - sh0) / 1048576.0
      System.err.println(
        f"[bench100x] $name%-22s $secs%8.2f s  $shMb%9.1f MB shuffle  ($rows rows)")
      (name, secs, shMb)
    }
    val diskMbps = BenchMetrics.diskMbps()
    System.err.println(f"[bench100x] disk probe: $diskMbps%.0f MB/s direct write")
    val qjson = times.map { case (n, s, _) => s""""$n":${f"$s%.2f"}""" }
      .mkString(",")
    val shjson = times.map { case (n, _, m) => s""""$n":${f"$m%.3f"}""" }
      .mkString(",")
    println(s"""{"metric":"bench100x","unit":"sec","dir":"$dir",""" +
      s""""value":${f"${times.map(_._2).sum}%.2f"},"disk_mbps":${f"$diskMbps%.0f"},""" +
      s""""queries":{$qjson},"shuffle_mb":{$shjson}}""")
    spark.stop()
  }
}
