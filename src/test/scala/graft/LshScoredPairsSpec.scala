package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/**
 * r20 pin: [[Dedup.bucketScoredPairs]] (bucket-local Jaccard scoring, one
 * banded exchange) must produce EXACTLY the rows of the join form it
 * replaced (banded self-join → distinct pairs → two shingle-set joins →
 * array_intersect/array_union jaccard) — same pairs, bit-equal doubles —
 * including under the degenerate-bucket cap and with multi-band
 * collisions that the distinct must collapse.
 */
class LshScoredPairsSpec extends SparkSpec {
  import spark.implicits._

  private val K = 12
  private val Bands = 4

  private def corpus = {
    // 60 docs: small near-dup families (4 members each, disjoint
    // vocabularies so families never share buckets), a boilerplate flood
    // (ids 40-55 share one text → a 16-member bucket for the cap to drop
    // at maxBucket=8), and singletons
    (0L until 60L).map { i =>
      val text =
        if (i < 4) s"alpha beta gamma delta epsilon zeta eta theta iota word${i % 2}"
        else if (i < 8) "red orange yellow green blue indigo violet crimson teal"
        else if (i < 12) s"one two three four five six seven eight nine ten ${i % 2}"
        else if (i >= 40 && i < 56) "copy pasta boiler plate text exactly the same"
        else s"unique document number $i with words ${i * 7} ${i * 13} ${i * 29}"
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def legacyScored(maxBucket: Int) = {
    import org.apache.spark.sql.expressions.Window
    val an = Dedup.minhashAnalyzed(corpus, "doc_id", "text", 3, K)
    val banded0 = an.select(col("id"),
        explode(Dedup.lshBands(col("sig"), K, Bands)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.sig").as("band_sig"))
    val banded = banded0.withColumn("_bsz",
        count(lit(1)).over(Window.partitionBy(col("band"), col("band_sig"))))
      .filter(col("_bsz") <= maxBucket).drop("_bsz")
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sh = an.select(col("id"), col("sh"))
    pairs
      .join(sh.toDF("id_a", "sh_a"), "id_a")
      .join(sh.toDF("id_b", "sh_b"), "id_b")
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select("id_a", "id_b", "jac")
  }

  private def kernelScored(maxBucket: Int) = {
    val an = Dedup.minhashAnalyzed(corpus, "doc_id", "text", 3, K)
    val banded = an.select(col("id"), col("sh"),
        explode(Dedup.lshBands(col("sig"), K, Bands)).as("b"))
      .select(col("id"), col("sh"),
        col("b.band").as("band"), col("b.sig").as("band_sig"))
    Dedup.bucketScoredPairs(banded, maxBucket)
  }

  test("bucket-local scoring equals the join form, capped and uncapped") {
    for (cap <- Seq(8, 0)) {
      val legacy = legacyScored(if (cap == 0) Int.MaxValue else cap)
        .as[(Long, Long, Double)].collect().toSet
      val kernel = kernelScored(cap)
        .as[(Long, Long, Double)].collect().toSet
      assert(kernel == legacy, s"cap=$cap")
      assert(legacy.nonEmpty)
    }
  }

  test("the cap drops the flood bucket's pairs in both forms") {
    val capped = kernelScored(8).as[(Long, Long, Double)].collect().toSet
    val uncapped = kernelScored(0).as[(Long, Long, Double)].collect().toSet
    // the 16-member boilerplate bucket only pairs above the cap
    assert(!capped.exists { case (a, b, _) => a >= 40 && a < 56 && b >= 40 && b < 56 })
    assert(uncapped.exists { case (a, b, _) => a >= 40 && a < 56 && b >= 40 && b < 56 })
  }
}
