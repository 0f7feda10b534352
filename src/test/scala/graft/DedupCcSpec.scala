package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Star-contraction CC: correctness on adversarial shapes AND the round
  * bound that motivates it — a diameter-63 chain must converge in ≤ 8
  * alternating-star rounds, where plain label propagation needs 63. */
class DedupCcSpec extends SparkSpec {
  import spark.implicits._

  test("64-node chain converges within 8 rounds to one component") {
    val nodes = (0L until 64L).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.dupClusters(nodes, edges, maxIter = 8, localEdgeThreshold = 0)
    assert(labels.filter(col("comp") === 0L).count() === 64)
  }

  test("disjoint components and isolated nodes label independently") {
    val nodes = (0L until 10L).toDF("id")
    // {0..3} via a zigzag, {5,6} a pair, {4,7,8,9} isolated
    val edges = Seq((3L, 1L), (1L, 2L), (2L, 0L), (6L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.dupClusters(nodes, edges).as[(Long, Long)].collect().toMap
    assert((0L to 3L).forall(got(_) == 0L))
    assert(got(5L) == 5L && got(6L) == 5L)
    assert(Seq(4L, 7L, 8L, 9L).forall(i => got(i) == i))
  }

  test("star form matches a union-find oracle on a pseudo-random graph") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val pairs = Seq.fill(180)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    val got = Dedup.dupClusters(
      (0L until n.toLong).toDF("id"),
      pairs.toDF("id_a", "id_b"), localEdgeThreshold = 0).as[(Long, Long)].collect().toMap
    // canonicalize both labelings to min-of-component
    val canon = expected.groupBy(_._2).flatMap { case (_, m) =>
      val mn = m.keys.min; m.keys.map(_ -> mn)
    }
    assert(got === canon)
  }

  test("driver union-find short-circuit agrees with the distributed loop") {
    val rnd = new scala.util.Random(11)
    val n = 300
    val pairs = Seq.fill(250)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val nodes = (0L until n.toLong).toDF("id")
    val edges = pairs.toDF("id_a", "id_b")
    val local = Dedup.dupClusters(nodes, edges) // default threshold → driver path
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.dupClusters(nodes, edges, localEdgeThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local === dist)
  }

  test("labels-not-pairs path matches the pair-based labels exactly") {
    // a corpus with planted near-dup families of different shapes: exact
    // copies, a one-token-edit chain (connectivity through the middle
    // member — the case a naive bucket-star WITHOUT per-bucket verified
    // union-find would over-merge), and unrelated docs
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base),                      // exact dups
      (3L, base + " lambda"), (4L, base + " mu"),  // near base
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "one two three four five six seven eight nine eleven"),
      (20L, "totally different text about distributed query engines rock"),
      (30L, "unique singleton document mentioning nothing shared at all"))
      .toDF("id", "text")
    val pairPath = {
      val an = Dedup.minhashAnalyzed(docs, "id", "text", 3, 12)
      val cands = Dedup.lshCandidates(docs, "id", "text", 3, 12, 4, 500)
      val sh = an.select(col("id"), col("sh"))
      val verified = cands
        .join(sh.toDF("id_a", "sh_a"), "id_a")
        .join(sh.toDF("id_b", "sh_b"), "id_b")
        .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double") >= 0.5)
        .select("id_a", "id_b")
      Dedup.dupClusters(docs.select(col("id")), verified)
        .as[(Long, Long)].collect().toMap
    }
    val labelPath = Dedup.lshClusterLabels(docs, "id", "text", 3, 12, 4, 500, 0.5)
      .as[(Long, Long)].collect().toMap
    assert(labelPath === pairPath)
    // and the edge volume is linear: a bucket of m dups emits m-1 star
    // edges, not m(m-1)/2 pairs
    val many = (0L until 200L).map(i => (i, base)) :+ (999L -> "lone wolf text")
    val manyDf = many.toDF("id", "text")
    val labels = Dedup.lshClusterLabels(manyDf, "id", "text", 3, 12, 4, 500, 0.5)
      .as[(Long, Long)].collect().toMap
    assert((0L until 200L).forall(labels(_) == 0L) && labels(999L) == 999L)
  }

  test("degenerate LSH bucket is capped: candidates stay linear") {
    // 1200 identical boilerplate docs (every band hashes them into ONE
    // bucket → an uncapped self-join would emit ~720k pairs) + 2 genuine
    // near-dups that share selective buckets.
    val boiler = (0L until 1200L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val near = Seq(
      (5000L, "completely distinct prose about spark dedup pipelines at scale"),
      (5001L, "completely distinct prose about spark dedup pipelines at scale plus"))
    val docs = (boiler ++ near).toDF("id", "text")
    val cands = Dedup.lshCandidates(docs, "id", "text", shingleN = 3, k = 12,
      bands = 4, maxBucket = 500)
    val got = cands.as[(Long, Long)].collect().toSet
    // the mega-bucket is dropped entirely; only the near-dup pair survives
    assert(got === Set((5000L, 5001L)))
    // and with the cap off the same input explodes quadratically
    val uncapped = Dedup.lshCandidates(docs, "id", "text", shingleN = 3,
      k = 12, bands = 4, maxBucket = 0)
    assert(uncapped.count() > 500000L)
  }
}
