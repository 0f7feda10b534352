package graft

import org.apache.spark.sql.functions._
import graft.operators.TextLm

/** Fixed-point LM scoring: l2q16 integer log2 and bigram surprisal. */
class TextLmSpec extends SparkSpec {
  import spark.implicits._

  test("l2q16 tracks 16*log2(x) within the table's error bound") {
    val xs = (Seq(1L, 2L, 3L, 7L, 16L, 17L, 31L, 32L, 67L, 1000L, 65535L,
      1000000L, (1L << 40) + 12345L)).toDF("x")
    val got = xs.select(col("x"), TextLm.l2q16(col("x")).as("q"))
      .as[(Long, Long)].collect()
    got.foreach { case (x, q) =>
      val exact = 16.0 * math.log(x.toDouble) / math.log(2.0)
      // never above the true value; below by at most the mantissa-cell
      // span 16*log2(17/16) + 1 floor quantum ≈ 2.4
      assert(q <= exact + 1e-9 && q > exact - 2.5,
        s"l2q16($x) = $q vs 16*log2 = $exact")
    }
    // exact on powers of two
    assert(got.toMap.apply(16L) == 64L)
    assert(got.toMap.apply(32L) == 80L)
  }

  test("scoreDocs: in-LM text scores fewer bits than novel text") {
    val held = Seq((0L, "the cat sat on the mat " * 20)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "zq xv qk jw zz vv pp qq rr ss tt uu")).toDF("doc_id", "text")
    val uni = TextLm.unigramLm(held, "text", 1L)
    val bi = TextLm.bigramLm(held, "text", 1L)
    val scored = TextLm.scoreDocs(corpus, uni, bi, "doc_id", "text")
      .withColumn("bpt", TextLm.bptBucket(col("bits"), col("n_grams")))
      .select("doc_id", "bpt").as[(Long, Long)].collect().toMap
    assert(scored(1L) < scored(2L),
      s"familiar text should be lower-surprisal: $scored")
  }

  test("bptBucket is exact integer floor division") {
    val df = Seq((330L, 10L), (329L, 10L), (480L, 30L)).toDF("bits", "n")
    val got = df.select(TextLm.bptBucket(col("bits"), col("n")))
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 2L, 1L)) // 33//16=2, 32//16=2, 16//16=1
  }
}
