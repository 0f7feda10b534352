package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextOps}

/** Training-data curation operators: contamination, deterministic
  * sampling, token-budget packing, PII redaction, mixture planning. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("contamination finds planted overlap and nothing else") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      // doc 3 contains doc 1's first 9 tokens — shares 8-grams with it
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota other tail"),
      (4L, "totally unrelated words that never repeat anything else here"))
      .toDF("doc_id", "text")
    val eval = corpus.filter(col("doc_id") === 1L)
    val hits = Curation.contamination(corpus, eval, "doc_id", "text",
        n = 8, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(hits == Set((1L, 3L, 2L))) // grams at offsets 0 and 1 both match
  }

  test("deterministic sampling is reproducible and rate-monotone") {
    val df = (0L until 2000L).toDF("doc_id")
    def kept(ppm: Long) = df
      .filter(Curation.sampleKeep(col("doc_id"), lit(ppm)))
      .as[Long].collect().toSet
    val half = kept(500000L)
    assert(kept(500000L) == half) // same rows every run
    assert(kept(250000L).subsetOf(half)) // lower rate nests inside higher
    assert(math.abs(half.size - 1000) < 120) // ~Bernoulli(0.5)
  }

  test("stratified sample applies per-stratum and quality-scaled rates") {
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "zz", i % 4 == 0))
      .toDF("doc_id", "lang", "good")
    val out = Curation.stratifiedSample(df, "doc_id", col("lang"),
      Map("en" -> 800000L), defaultPpm = 200000L,
      qualityOk = col("good"), lowQualityScalePct = 50)
    val rates = out.select("lang", "good", "rate_ppm").distinct()
      .as[(String, Boolean, Long)].collect()
      .map { case (l, g, r) => (l, g) -> r }.toMap
    assert(rates((("en"), true)) == 800000L)
    assert(rates((("en"), false)) == 400000L)
    assert(rates((("zz"), false)) == 100000L)
  }

  test("token packing fills packs to budget within each shard") {
    val df = (0L until 400L).map(i => (i, 10L + (i % 7))).toDF("doc_id", "n")
    val packed = Curation.packByTokenBudget(df, "doc_id", col("n"),
      budget = 100L, shards = 4)
    // within a shard, pack_id is nondecreasing in doc_id and the tokens
    // BEFORE each doc determine its pack
    val rows = packed.select("shard", "doc_id", "toks", "pack_id")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).values
    rows.foreach { shard =>
      var cum = 0L
      shard.sortBy(_._2).foreach { case (_, _, t, pack) =>
        assert(pack == cum / 100L)
        cum += t
      }
    }
  }

  test("PII redaction replaces all three classes, leaves clean text alone") {
    val df = Seq(
      "reach me at jo.doe+x@mail-site.org or 555-0134 from 10.2.0.77",
      "no pii here just words").toDF("text")
    val out = df.select(Curation.redactPii(col("text"))).as[String].collect()
    assert(out(0) == "reach me at <EMAIL> or <PHONE> from <IP>")
    assert(out(1) == "no pii here just words")
    val (em, ph, ip) = Curation.piiCounts(col("text"))
    val counts = df.select(em, ph, ip).as[(Int, Int, Int)].collect()
    assert(counts(0) == ((1, 1, 1)) && counts(1) == ((0, 0, 0)))
  }

  test("mixture plan hits target token shares, capped at 1e6 ppm") {
    val df = Seq.tabulate(300)(i =>
      (i.toLong, if (i < 200) "big" else "small", 100L)).toDF("doc_id", "src", "toks")
    // big: 20000 tokens, small: 10000 tokens; budget 10000 split 50/50
    val plan = Curation.mixturePlan(df, "src", col("toks"),
        Map("big" -> 500000L, "small" -> 500000L), lit(10000L))
      .select("src", "rate_ppm").as[(String, Long)].collect().toMap
    assert(plan("big") == 250000L) // 5000/20000
    assert(plan("small") == 500000L) // 5000/10000
    val capped = Curation.mixturePlan(df, "src", col("toks"),
        Map("big" -> 500000L, "small" -> 500000L), lit(100000L))
      .select("src", "rate_ppm").as[(String, Long)].collect().toMap
    assert(capped("small") == 1000000L) // can't exceed 1: capped
  }

  test("nb classifier learns a planted signal and classifies held-out docs") {
    import graft.operators.TextOps
    // class-1 docs always contain "zebra", class-0 never do; train on 40,
    // serve 10 HELD-OUT docs — the learned weights must classify all 10
    val train = (0 until 40).map { i =>
      val y = i % 2 == 0
      (i.toLong, if (y) s"common w$i zebra filler" else s"common w$i plain filler", y)
    }.toDF("doc_id", "text", "y")
    val (w, bias) = TextOps.nbTrain(train, "text", $"y", buckets = 64)
    val heldOut = (100 until 110).map { i =>
      val y = i % 2 == 0
      (if (y) s"new w$i zebra thing" else s"new w$i plain thing", y)
    }.toDF("text", "y")
    val scored = heldOut.select($"y",
      (TextOps.nbScore($"text", w, bias, 64) > 0).as("pred")).collect()
    assert(scored.forall(r => r.getBoolean(0) == r.getBoolean(1)),
      scored.mkString(","))
    // determinism: retraining yields the identical model
    assert(TextOps.nbTrain(train, "text", $"y", buckets = 64) == ((w, bias)))
  }

  test("bpe merges: deterministic argmax, tie-break, boundary-chain policy") {
    // "b c" occurs 3x (most frequent), and doc 1 is the documented
    // boundary-chain case: one pass fuses only the FIRST "b c" in
    // "b c b c a" (the shared boundary space is consumed), so
    // tokens_after = 4 + 3 = 7, and round 2's re-count sees the leftover
    // "b c" — which then ties with "a a" on count 1... the lexicographic
    // tie-break makes "a a" win round 2 deterministically.
    val docs = Seq("b c b c a", "b c a a").toDF("text")
    val log = Curation.bpeMerges(docs, "text", rounds = 2)
    assert(log(0) == ((1, "b c", 3L, 7L)))
    // round 2 candidates on ["b_c b c a", "b_c a a"]: pairs
    // (b_c,b) 1, (b,c) 1, (c,a) 1, (b_c,a) 1, (a,a) 1 — all tied at 1,
    // "a a" is lexicographically least
    assert(log(1)._2 == "a a" && log(1)._3 == 1L)
    assert(log(1)._4 == 6L) // one fuse in doc 2
  }

  test("passage stats: shared windows counted, canonical copy owns them") {
    // doc 1 and doc 3 share one exact 3-token run ("x y z"); doc 2 is an
    // exact copy of doc 1 (every window duplicated, none owned).
    val docs = Seq(
      (1L, "x y z p q r"),
      (2L, "x y z p q r"),
      (3L, "a b x y z c"))
      .toDF("doc_id", "text")
    val rows = Curation.passageStats(docs, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: 4 windows, one ("x y z") also in docs 2+3 — plus ALL 4 are
    // in doc 2; owner of every duplicated window is doc 1 itself
    assert(rows(1L) == ((4L, 4L, 0L)))
    // doc 2: identical 4 windows, owns none
    assert(rows(2L) == ((4L, 4L, 4L)))
    // doc 3: 4 windows, only "x y z" duplicated, owned by doc 1
    assert(rows(3L) == ((4L, 1L, 1L)))
    assert(rows.keySet == Set(1L, 2L, 3L))
  }

  test("epoch shuffle: reproducible within epoch, re-permuted across") {
    val docs = (1L to 200L).toDF("doc_id")
    def order(e: Int) =
      Curation.epochShuffle(docs, "doc_id", nShards = 4, epoch = e)
        .select("shard", "pos", "doc_id")
        .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val e1a = order(1)
    assert(e1a == order(1)) // bit-identical re-run
    val e2 = order(2)
    assert(e1a != e2) // epoch re-permutes
    assert(e1a.map(_._3).sorted == e2.map(_._3).sorted) // same membership
    // positions are 1..n contiguous per shard
    e1a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2) == (1L to rows.size).toSeq)
    }
  }

  test("cdc chunking re-synchronizes after a prefix edit; fixed windows don't") {
    import graft.functions.TextRuns
    val base = (1 to 60).map(j => s"tok$j").mkString(" ")
    def chunks(s: String): Seq[(Long, Long)] =
      Seq(s).toDF("text")
        .select(explode(TextRuns.cdcChunks(col("text"), 8)).as("c"))
        .select("c.ch", "c.n_tok").as[(Long, Long)].collect().toSeq
    val orig = chunks(base)
    val shifted = chunks("inserted prefix words " + base)
    // token counts conserved
    assert(orig.map(_._2).sum == 60L && shifted.map(_._2).sum == 63L)
    // every original chunk except the FIRST survives the prefix edit
    // byte-identical (boundaries depend on content, not position)
    assert(orig.tail.toSet.subsetOf(shifted.toSet))
    assert(!shifted.toSet.contains(orig.head))
    // determinism: same text, same chunk stream
    assert(chunks(base) == orig)
    // stats operator: the shifted doc shares all post-boundary chunks
    val df = Seq((1L, base), (2L, "inserted prefix words " + base))
      .toDF("doc_id", "text")
    val st = Curation.cdcChunkStats(df, "doc_id", "text", b = 8, minTok = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val sharedElig = orig.tail.count(_._2 >= 3)
    assert(st(1L)._2 >= sharedElig && st(2L)._3 == st(2L)._2) // doc 2 owns nothing
  }

  test("source cap keeps exactly cap docs, highest quality first") {
    val good = (0 to 25).map(j => s"token$j").mkString(" ")
    val junk = Seq.fill(12)("spam").mkString(" ") // low distinct ratio, <20 toks
    val docs = Seq.tabulate(10) { i =>
      (i.toLong, if (i < 6) "a" else "b", if (i == 6) junk else good)
    }.toDF("doc_id", "source", "text")
    val kept = Curation.sourceCap(docs, "doc_id", "source",
        TextOps.qualityScore(col("text")), cap = 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // a: 6 tied docs -> id tie-break keeps the first three
    assert(kept.filter(_._1 == "a").map(_._2) == Set(0L, 1L, 2L))
    // b: 4 docs, the junk doc ranks last and is the one cut
    assert(kept.filter(_._1 == "b").map(_._2) == Set(7L, 8L, 9L))
  }

  test("isqrt is exact at perfect squares and their neighbors") {
    // every boundary where floor(sqrt) changes, plus the ppm-scale domain
    val squares = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 24L, 25L,
      999999L, 1000000L, 1000001L) ++
      Seq(1000L, 31623L, 999999L, 1000000L).flatMap { k =>
        Seq(k * k - 1, k * k, k * k + 1)
      }
    val got = squares.toDF("x")
      .select(col("x"), Curation.isqrt(col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    squares.foreach { x =>
      val expect = math.sqrt(x.toDouble).toLong match {
        case s if (s + 1) * (s + 1) <= x => s + 1
        case s if s * s > x => s - 1
        case s => s
      }
      assert(got(x) == expect && got(x) * got(x) <= x &&
        (got(x) + 1) * (got(x) + 1) > x, s"isqrt($x) = ${got(x)}")
    }
  }

  test("temperature mixture flattens: rare domains gain share, dominant lose") {
    val docs = (1 to 900).map(i => (s"big", 100L)) ++
      (1 to 100).map(_ => (s"small", 100L))
    val plan = Curation.temperatureMixture(
        docs.toDF("source", "toks"), "source", col("toks"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("share_ppm"), r.getAs[Long]("temp_ppm"))).toMap
    val (bigShare, bigTemp) = plan("big")
    val (smallShare, smallTemp) = plan("small")
    assert(bigShare == 900000L && smallShare == 100000L)
    assert(bigTemp < bigShare && smallTemp > smallShare) // flattening
    // sqrt ratio: temp weights should be ~3:1 (sqrt(9):1), not 9:1
    assert(bigTemp.toDouble / smallTemp > 2.8 && bigTemp.toDouble / smallTemp < 3.2)
  }
}
