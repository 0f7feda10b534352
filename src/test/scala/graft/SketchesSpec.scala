package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("cms estimate is never below the true count, and exact sans collisions") {
    // 40 distinct tokens with known counts 1..40, width ample -> exact
    val text = (1 to 40).flatMap(i => Seq.fill(i)(s"tok$i")).mkString(" ")
    val docs = Seq(text).toDF("text")
    val cms = Sketches.cmsBuild(docs, "text", depth = 4, width = 1024)
    val queries = (1 to 40).map(i => s"tok$i").toDF("token")
    val est = Sketches.cmsEstimate(cms, queries, "token", 4, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (i <- 1 to 40) assert(est(s"tok$i") == i.toLong)
  }

  test("tight width forces collisions but keeps the one-sided guarantee") {
    val text = (1 to 200).flatMap(i => Seq.fill(1 + i % 7)(s"w$i")).mkString(" ")
    val docs = Seq(text).toDF("text")
    val cms = Sketches.cmsBuild(docs, "text", depth = 2, width = 8)
    val queries = (1 to 200).map(i => s"w$i").toDF("token")
    val exact = (1 to 200).map(i => s"w$i" -> (1L + i % 7)).toMap
    val est = Sketches.cmsEstimate(cms, queries, "token", 2, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.forall { case (t, e) => e >= exact(t) }) // never undercounts
    assert(est.exists { case (t, e) => e > exact(t) })  // collisions real
  }

  test("an unseen token estimates 0 (absent counters are zero)") {
    val docs = Seq("a b c").toDF("text")
    val cms = Sketches.cmsBuild(docs, "text", depth = 4, width = 4)
    // width 4 and only 3 tokens: some bucket in some row stays empty for
    // a foreign token with overwhelming probability for this fixed input;
    // assert the <= bound instead of exact 0 to stay deterministic-safe
    val est = Sketches.cmsEstimate(cms, Seq("zebra").toDF("token"), "token", 4, 4)
      .collect().head.getLong(1)
    assert(est <= 3L) // cannot exceed total occurrence mass
    val estWide = Sketches.cmsEstimate(
      Sketches.cmsBuild(docs, "text", 4, 1024),
      Seq("zebra").toDF("token"), "token", 4, 1024).collect().head.getLong(1)
    assert(estWide == 0L)
  }

  test("counter mass is conserved: every row sums to total occurrences") {
    val text = "a a b c c c d"
    val cms = Sketches.cmsBuild(Seq(text).toDF("text"), "text", 3, 16)
    val rows = cms.groupBy("j").agg(sum("cnt").as("mass"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.size == 3 && rows.values.forall(_ == 7L))
  }

  // ---- HyperLogLog ---------------------------------------------------

  test("hll registers match a per-bucket brute-force over the same hashes") {
    import graft.core.Hashing
    val keys = (1 to 3000).map(i => s"key$i").toDF("k")
      .select(Hashing.portableLong(col("k")).as("h"))
    val p = 6; val w = 16; val m = 1L << p
    val regs = Sketches.hllRegisters(keys, "h", p, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force with plain Scala over the SAME portable hashes
    val hs = keys.collect().map(_.getLong(0))
    val expect = hs.groupBy(h => h % m).map { case (b, v) =>
      b -> v.map { h =>
        val s = (h / m) % (1L << w)
        if (s == 0L) (w + 1).toLong
        else (w + 1 - java.lang.Long.toBinaryString(s).length).toLong
      }.max
    }
    assert(regs == expect)
  }

  test("hll integer estimate lands within 3 sigma of the truth") {
    import graft.core.Hashing
    val n = 20000
    val keys = (1 to n).map(i => s"item$i").toDF("k")
      .select(Hashing.portableLong(col("k")).as("h"))
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(keys, "h", 8, 24), 8, 24, 718272L)
      .collect().head.getAs[Long]("est_distinct")
    // sigma ~ 1.04/sqrt(256) = 6.5 %; 3 sigma = 19.5 %
    assert(math.abs(est - n) < n * 0.195, s"est=$est n=$n")
  }

  test("hll registers merge across shards by max (the union rule)") {
    import graft.core.Hashing
    val a = (1 to 500).map(i => s"x$i").toDF("k")
      .select(Hashing.portableLong(col("k")).as("h"))
    val b = (300 to 900).map(i => s"x$i").toDF("k")
      .select(Hashing.portableLong(col("k")).as("h"))
    val merged = Sketches.hllRegisters(a, "h", 6, 16)
      .unionByName(Sketches.hllRegisters(b, "h", 6, 16))
      .groupBy("b").agg(max("reg").as("reg"))
    val whole = Sketches.hllRegisters(a.unionByName(b), "h", 6, 16)
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .sameElements(whole.collect().map(r => (r.getLong(0), r.getLong(1))).sorted))
  }

  // ---- Bloom filter --------------------------------------------------

  test("bloom has no false negatives; false positives only off-base") {
    import graft.core.Hashing
    val base = (1 to 400).map(i => s"doc$i").toDF("k")
      .select(Hashing.portableLong(col("k")).as("key"))
    val m = 1600L; val k = 3
    val bits = Sketches.bloomBits(base, "key", m, k)
    // probe = every base key (must ALL flag) + 400 foreign keys
    val probe = ((1 to 400).map(i => (i.toLong, s"doc$i")) ++
        (1 to 400).map(i => (10000L + i, s"other$i")))
      .toDF("id", "raw")
      .select(col("id"), Hashing.portableLong(col("raw")).as("key"))
    val res = Sketches.bloomProbe(bits, probe, "id", "key", m, k)
    val flagged = res.filter(col("maybe_seen") === 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert((1 to 400).forall(i => flagged(i.toLong)), "false negative!")
    val fp = flagged.count(_ > 10000L)
    // fill = 1-exp(-3*400/1600) ~ 0.53 -> fp rate ~ 0.147: some but not all
    assert(fp > 0 && fp < 400, s"fp=$fp")
  }

  test("bloom bit count never exceeds k distinct positions per key") {
    import graft.core.Hashing
    val base = (1 to 10).map(i => s"v$i").toDF("k")
      .select(Hashing.portableLong(col("k")).as("key"))
    val bits = Sketches.bloomBits(base, "key", 4096L, 4)
    assert(bits.count() <= 40L)
  }
}
