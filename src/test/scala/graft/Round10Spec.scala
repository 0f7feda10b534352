package graft

import graft.operators.{Codecs, Retrieval, TextLm, TfIdf}
import org.apache.spark.sql.functions._

/** Specs for the round-9 second-batch operators: Kneser-Ney smoothing,
  * c-TF-IDF cluster keywords, RRF fusion, MMR selection, and the
  * handle-key-only snapshot chain. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // ---- Kneser-Ney ----------------------------------------------------

  /** Held corpus "a b a b a c": cb = {ab:2, ba:2, ac:1};
    * ctx a=(cv 3, n1v 2), b=(cv 2, n1v 1); cont a=1, b=1, c=1;
    * B = 3 bigram types, U = 3 tokens → B+U = 6. */
  private def knTiny(biMin: Long) = {
    val held = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    TextLm.knStats(held, "text", biMin)
  }

  test("kneser-ney seen-context position matches the hand-derived rational") {
    val (bi, ctx, cont, bu) = knTiny(1L)
    val doc = Seq((1L, "a b")).toDF("doc_id", "text")
    val r = TextLm.knScoreDocs(doc, bi, ctx, cont, bu, "doc_id", "text")
      .collect().head
    // position (a,b): num = max(4·2−3,0)·6 + 3·2·(1+1) = 30+12 = 42;
    // den = 4·3·6 = 72
    assert(r.getAs[Long]("n_grams") == 1L)
    assert(r.getAs[Long]("bits") ==
      TextLm.l2q16Long(72) - TextLm.l2q16Long(42))
  }

  test("kneser-ney unseen context backs off to the continuation distribution") {
    val (bi, ctx, cont, bu) = knTiny(1L)
    val doc = Seq((1L, "z b")).toDF("doc_id", "text")
    val r = TextLm.knScoreDocs(doc, bi, ctx, cont, bu, "doc_id", "text")
      .collect().head
    // context z unseen: bits = l2q16(B+U) − l2q16(ncw(b)+1) = l2q16(6)−l2q16(2)
    assert(r.getAs[Long]("bits") ==
      TextLm.l2q16Long(6) - TextLm.l2q16Long(2))
  }

  test("kneser-ney thresholded bigram falls to the continuation term only") {
    val (bi, ctx, cont, bu) = knTiny(2L) // drops "a c" (cb = 1)
    val doc = Seq((1L, "a c")).toDF("doc_id", "text")
    val r = TextLm.knScoreDocs(doc, bi, ctx, cont, bu, "doc_id", "text")
      .collect().head
    // cb dropped → num = 0·6 + 3·n1v(a)·(ncw(c)+1) = 3·2·2 = 12; den = 72
    assert(r.getAs[Long]("bits") ==
      TextLm.l2q16Long(72) - TextLm.l2q16Long(12))
  }

  test("kneser-ney frequent bigram costs fewer bits than an unseen one") {
    val (bi, ctx, cont, bu) = knTiny(1L)
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val m = TextLm.knScoreDocs(docs, bi, ctx, cont, bu, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bits")).toMap
    assert(m(1L) < m(2L)) // seen "a b" beats unseen "b c"
  }

  // ---- c-TF-IDF ------------------------------------------------------

  test("c-tf-idf surfaces the class-distinctive term over the shared one") {
    // class 0: "x x y"; class 1: "y z" → f: x=2, y=2, z=1; A = 5 // 2 = 2
    val docs = Seq((0, "x x y"), (1, "y z")).toDF("label", "text")
    val out = TfIdf.cTfIdf(docs, "label", "text", 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getAs[Long]("score_q16")))
    def s(tf: Long, f: Long) =
      tf * (TextLm.l2q16Long(f + 2) - TextLm.l2q16Long(f))
    val c0 = out.filter(_._1 == 0).sortBy(_._2)
    val c1 = out.filter(_._1 == 1).sortBy(_._2)
    assert(c0.head._3 == "x" && c0.head._4 == s(2, 2))
    // z (rare corpus-wide) outranks y (shared) in class 1
    assert(c1.head._3 == "z" && c1.head._4 == s(1, 1))
    assert(c1(1)._3 == "y" && c1(1)._4 == s(1, 2))
  }

  // ---- RRF fusion ----------------------------------------------------

  test("rrf: a both-list candidate outranks a single-list rank-1") {
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rrfFuse(a, b, 3).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getAs[Long]("rrf_ppm"),
        r.getAs[Long]("r_a"), r.getAs[Long]("r_b"))).sortBy(_._1)
    // 20 appears in both (ranks 2+1) → 1e6//62 + 1e6//61 = 16129+16393
    assert(out.head == ((1, 20L, 16129L + 16393L, 2L, 1L)))
    // 10 and 30 each single-list rank 1 / rank 2; absent rank reports 0
    assert(out(1) == ((2, 10L, 16393L, 1L, 0L)))
    assert(out(2) == ((3, 30L, 16129L, 0L, 2L)))
  }

  // ---- MMR selection -------------------------------------------------

  test("mmr: redundancy penalty overturns the pure-relevance order") {
    // A(100) ~ B(99) near-dups (sim 95); C(80) diverse (sim 10)
    val pool = Seq((1L, 100L, 100L), (1L, 101L, 99L), (1L, 102L, 80L))
      .toDF("query_id", "doc_id", "rel")
    val sims = (for {
      (x, y, s) <- Seq((100L, 101L, 95L), (100L, 102L, 10L), (101L, 102L, 10L))
      p <- Seq((x, y, s), (y, x, s))
    } yield (1L, p._1, p._2, p._3)).toDF("query_id", "a", "b", "sim")
    val out = Retrieval.mmrSelect(pool, sims, 3, 7L, 10L)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out(0) == ((1, 100L, 700L)))           // argmax 7·rel
    assert(out(1) == ((2, 102L, 7 * 80 - 3 * 10))) // C beats shadowed B
    assert(out(2) == ((3, 101L, 7 * 99 - 3 * 95))) // B last, max-sim to A
  }

  test("mmr first pick ties break by doc id") {
    val pool = Seq((1L, 7L, 50L), (1L, 3L, 50L)).toDF("query_id", "doc_id", "rel")
    val sims = Seq((1L, 7L, 3L, 0L), (1L, 3L, 7L, 0L))
      .toDF("query_id", "a", "b", "sim")
    val out = Retrieval.mmrSelect(pool, sims, 2, 7L, 10L)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(out(0) == ((1, 3L)) && out(1) == ((2, 7L)))
  }

  // ---- winnowing -----------------------------------------------------

  test("winnowing selects per-window minima, sorted distinct") {
    import graft.core.Hashing
    import graft.functions.TextRuns
    val text = "a b c d e f"
    // reference hashes via the oracle-portable column hash
    val h = Seq("a b", "b c", "c d", "d e", "e f")
      .toDF("g").select(Hashing.portableLong(col("g")))
      .collect().map(_.getLong(0))
    val expect = (0 to 3).map(i => math.min(h(i), h(i + 1))).distinct.sorted
    val got = Seq(text).toDF("text")
      .select(TextRuns.winnowHashes(col("text"), 2, 2).as("fp"))
      .collect().head.getSeq[Long](0)
    assert(got == expect)
  }

  test("winnowing guarantee: a shared n+w-1 token run shares a fingerprint") {
    import graft.functions.TextRuns
    val rnd = new scala.util.Random(7)
    def words(k: Int) = Seq.fill(k)("w" + rnd.nextInt(1000)).mkString(" ")
    val shared = words(6) // n=3, w=4 → any shared run of >= 6 tokens
    val docs = (1 to 5).map(i => (i.toLong, s"${words(10)} $shared ${words(10)}"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextRuns.winnowHashes(col("text"), 3, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    for (a <- 1 to 5; b <- (a + 1) to 5)
      assert(docs(a.toLong).intersect(docs(b.toLong)).nonEmpty,
        s"docs $a/$b share a 6-token run but no fingerprint")
  }

  test("winnowing short-doc fallback: fewer windows than w still fingerprints") {
    import graft.functions.TextRuns
    val got = Seq("a b c", "x").toDF("text")
      .select(TextRuns.winnowHashes(col("text"), 3, 4).as("fp"))
      .collect().map(_.getSeq[Long](0))
    assert(got(0).size == 1) // one 3-gram → one whole-sequence window
    assert(got(1).size == 1) // sub-n-gram → whole-text fallback hash
  }

  // ---- session windows -----------------------------------------------

  test("sessionize boundary: exactly-gap joins, gap+1us opens a new session") {
    import graft.operators.Sessions
    val us = 1000L // ns per us
    val gap = 10_000_000L * us // 10 s in ns
    val events = Seq(
      (1L, 0L * us), (1L, 10_000_000L * us),  // exactly gap → SAME session
      (1L, 20_000_001L * us),                 // gap + 1 us → new session
      (2L, 0L * us)
    ).toDF("user_id", "ts")
    val out = Sessions.sessionize(events, col("user_id"), col("ts"), gap)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("sess"),
        r.getAs[Long]("n_events"))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq((1L, 1, 2L), (1L, 2, 1L), (2L, 1, 1L)))
  }

  // ---- CMS heavy hitters ---------------------------------------------

  test("cms heavy hitters: estimate >= exact makes the report complete") {
    import graft.operators.Sketches
    val docs = Seq((1L, ("hot " * 50) + "a b c d e f g h")).toDF("doc_id", "text")
    val cms = Sketches.cmsBuild(docs, "text", 2, 4) // tiny: forced collisions
    val cand = Seq("hot", "a", "zz").toDF("token")
    val est = Sketches.cmsEstimate(cms, cand, "token", 2, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 50L) // one-sided: never under
    assert(est("a") >= 1L)
    assert(est("zz") >= 0L)   // unseen may only collide upward
  }

  // ---- prefix-filter exact similarity join ---------------------------

  test("prefix-filter join equals brute-force all-pairs on random corpora") {
    import graft.operators.Dedup
    import graft.functions.TextRuns
    val rnd = new scala.util.Random(11)
    // word-soup docs with planted high-overlap pairs at several ratios
    def words(k: Int) = Seq.fill(k)("t" + rnd.nextInt(40)).mkString(" ")
    val bases = (0 until 12).map(i => (i.toLong, words(25)))
    val variants = bases.collect { case (id, t) if id % 3 == 0 =>
      (id + 100L, t + " " + words(rnd.nextInt(4)))    // near-identical
    }
    val docs = (bases ++ variants).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 4L, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over in-row shingle sets
    val sets = docs
      .select(col("doc_id"), TextRuns.shingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).intersect(sets(b)).size
      uni = sets(a).union(sets(b)).size
      if 5L * inter >= 4L * uni
    } yield (a, b)).toSet
    assert(want.nonEmpty, "fixture must plant at least one qualifying pair")
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  // ---- padding efficiency --------------------------------------------

  test("length-bucketed batching never pads more than arrival order") {
    val out = SparkEntry.queries("q185_padding_efficiency")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("waste_ppm")).toMap
    assert(out("sorted") <= out("arrival"))
    assert(out("arrival") > 0L) // the gate corpus has real length variance
  }

  // ---- incremental k-means state -------------------------------------

  test("centroid states merge as a monoid: shards fold to the full-batch state") {
    import graft.operators.VectorOps
    val mk = (id: Long, v: Seq[Double], c: Long) => (id, v.toArray, c)
    val a = Seq(mk(1, Seq(1.0, 2.0), 0L), mk(2, Seq(3.0, 4.0), 1L))
      .toDF("vec_id", "embedding", "centroid_id")
    val b = Seq(mk(3, Seq(5.0, 6.0), 0L)).toDF("vec_id", "embedding", "centroid_id")
    def stateOf(df: org.apache.spark.sql.DataFrame) =
      VectorOps.centroidSums(df, "centroid_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getAs[Long]("cnt"))).toSet
    val merged = rows(VectorOps.mergeStates(stateOf(a), stateOf(b)))
    val full = rows(stateOf(a.unionByName(b)))
    assert(merged == full)
    // serving centroids: exact floor(sums/cnt)
    val cents = VectorOps.stateCentroids(
        VectorOps.mergeStates(stateOf(a), stateOf(b)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val q = VectorOps.QuantScale
    assert(cents(0L) == Seq((1 * q + 5 * q) / 2, (2 * q + 6 * q) / 2))
    assert(cents(1L) == Seq(3 * q, 4 * q))
  }

  // ---- native AS-OF JOIN (custom logical plan) -----------------------

  test("asof join: inclusive boundary, latest-wins, no-prior-version null") {
    import graft.plans.AsOf
    val events = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 9L, "c"),
        (2L, 50L, "d"), (3L, 7L, "e"))
      .toDF("k", "ts", "tag")
    val versions = Seq((1L, 6L, "v1"), (1L, 10L, "v2"), (2L, 60L, "v9"))
      .toDF("vk", "vts", "ver")
    val out = AsOf.join(spark, events, versions, "k", "vk", "ts", "vts")
      .collect().map(r => r.getString(2) -> Option(r.get(5))).toMap
    assert(out("a") == None)        // ts 5 < first version (6)
    assert(out("c") == Some("v1"))  // 9: v1 in force
    assert(out("b") == Some("v2"))  // ts == version ts binds INCLUSIVE
    assert(out("d") == None)        // key 2's only version is later (60)
    assert(out("e") == None)        // key 3 has no versions at all
    // the plan is the union-window rewrite: no join operator anywhere
    val p = AsOf.join(spark, events, versions, "k", "vk", "ts", "vts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"plan:\n$p")
    assert(p.contains("Window"), s"plan:\n$p")
  }

  // ---- containment join ----------------------------------------------

  test("containment join is directed: quoted-in ≠ quotes; equals brute force") {
    import graft.operators.Dedup
    import graft.functions.TextRuns
    val rnd = new scala.util.Random(13)
    def words(k: Int) = Seq.fill(k)("c" + rnd.nextInt(50)).mkString(" ")
    val base = words(20)
    val docs = Seq(
      (1L, base),                       // fully quoted inside 2
      (2L, base + " " + words(10)),     // superset of 1
      (3L, words(20))).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(docs, "doc_id", "text", 3, 9L, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = docs
      .select(col("doc_id"), TextRuns.shingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a != b
      if 10L * sets(a).intersect(sets(b)).size >= 9L * sets(a).size
    } yield (a, b)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.contains((1L, 2L)))  // the quoted doc IS contained
    assert(!got.contains((2L, 1L))) // the superset is NOT (direction!)
  }

  // ---- SCD Type-2 history --------------------------------------------

  test("scd2: update supersedes, delete terminates, re-insert reopens") {
    import graft.operators.Scd
    val env = Seq(
      (1L, "I", 10L, 1L, Option(1.0)),
      (2L, "U", 20L, 1L, Option(2.0)),  // closes v1 at 20, opens v2
      (3L, "D", 30L, 1L, None),         // terminates v2 at 30
      (4L, "I", 40L, 1L, Option(4.0)),  // REOPENS after the delete
      (5L, "I", 15L, 2L, Option(9.0))   // never touched again: open
    ).toDF("seq", "op", "commit_ts", "pk", "val_after")
    val hist = Scd.type2(env, Seq("pk"), "commit_ts", "seq", "op",
        Seq("val_after"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    assert(hist.toSeq == Seq(
      (1L, 10L, Some(20L), false),  // v1 closed by the update
      (1L, 20L, Some(30L), false),  // v2 terminated by the delete
      (1L, 40L, None, true),        // the re-insert is current
      (2L, 15L, None, true)))
    // the delete-to-reinsert gap (30..40) is covered by NO version
  }

  test("scd2 incremental: open rows + batch replay equals full recompute") {
    import graft.operators.Scd
    val keys = Seq("pk"); val vals = Seq("val_after")
    def t2(df: org.apache.spark.sql.DataFrame) =
      Scd.type2(df, keys, "commit_ts", "seq", "op", vals)
    val b1 = Seq(
      (1L, "I", 10L, 1L, Option(1.0)), (2L, "U", 20L, 1L, Option(2.0)),
      (3L, "I", 15L, 2L, Option(9.0)), (4L, "I", 11L, 3L, Option(5.0)),
      (5L, "D", 12L, 3L, None)
    ).toDF("seq", "op", "commit_ts", "pk", "val_after")
    val b2 = Seq(
      (6L, "U", 30L, 1L, Option(3.0)),  // closes pk 1's open version
      (7L, "I", 40L, 4L, Option(7.0))   // brand-new key
    ).toDF("seq", "op", "commit_ts", "pk", "val_after")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
        r.getBoolean(3), r.getDouble(4))).toSet
    val inc = rows(Scd.type2Increment(t2(b1), b2, keys,
      "commit_ts", "seq", "op", vals))
    val full = rows(t2(b1.unionByName(b2)))
    assert(inc == full)
    // pk 2 untouched by the batch: still open; pk 3's termination stayed
    assert(inc.exists(r => r._1 == 2L && r._4))
  }

  // ---- PSI drift -----------------------------------------------------

  test("psi: identical slices score zero, drift terms carry the right sign") {
    import graft.operators.TextLm
    // replicate the gate's per-bucket term on hand values
    def term(pPpm: Long, qPpm: Long): Long =
      (pPpm - qPpm) * (TextLm.l2q16Long(pPpm + 1) - TextLm.l2q16Long(qPpm + 1))
    assert(term(500000, 500000) == 0L)       // no drift, no signal
    assert(term(600000, 400000) > 0L)        // mass moved IN: positive
    assert(term(400000, 600000) > 0L)        // mass moved OUT: also positive
    assert(term(0, 0) == 0L)                 // empty bucket both sides
    // the q192 gate itself on the smoke corpus: every bucket's term is
    // the product of same-signed factors — PSI is non-negative per bucket
    val out = SparkEntry.queries("q192_psi_drift")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("psi_q16") >= 0L,
        s"negative PSI term in bucket ${r.get(0)}")
    }
  }

  // ---- handle-key snapshot chain -------------------------------------

  test("snapshot chain: same-ts shadowing, delete tombstone, lag state") {
    val env = Seq(
      (1L, "I", 10L, 100L, Option(1.0)),
      (2L, "U", 11L, 100L, Option(2.0)),
      (3L, "U", 11L, 100L, Option(3.0)), // same ts, higher seq shadows
      (4L, "D", 12L, 100L, Option(9.9))
    ).toDF("seq", "op", "commit_ts", "pk", "val_after")
    val chain = Codecs.snapshotChain(env).collect()
      .map(r => (r.getLong(1), Option(r.get(2)), Option(r.get(3))))
      .sortBy(_._1)
    assert(chain(0) == ((10L, Some(1.0), None)))       // first state, no prior
    assert(chain(1) == ((11L, Some(3.0), Some(1.0))))  // seq 3 shadows seq 2
    assert(chain(2) == ((12L, None, Some(3.0))))       // delete → NULL state
  }
}
