package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}

/** Edge semantics for the round-6 curation/dedup additions: window
  * chunking boundaries, boilerplate-gram flagging, simhash banding. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs: boundary docs chunk exactly") {
    val docs = Seq(
      (1L, (1 to 4).map(i => s"t$i").mkString(" ")),  // == window → 1 chunk
      (2L, (1 to 5).map(i => s"t$i").mkString(" ")),  // window+1 → 2 chunks
      (3L, "short")).toDF("doc_id", "text")           // under → 1 whole chunk
    val got = Curation.chunkDocs(docs, "text", window = 4, overlap = 2)
      .select("doc_id", "chunk_idx", "chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (2L, 0L, 4L, "t1 t2 t3 t4"),
      (2L, 1L, 3L, "t3 t4 t5"), // stride 2, tail truncates
      (3L, 0L, 1L, "short")))
  }

  test("boilerplateGrams flags only grams shared by enough documents") {
    val docs = Seq(
      (1L, "the same intro here plus alpha"),
      (2L, "the same intro here plus beta"),
      (3L, "totally different words entirely now")).toDF("doc_id", "text")
    val got = Curation.boilerplateGrams(docs, "doc_id", "text",
        n = 3, minDocs = 2, "doc_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // docs 1/2 share the 3-grams of "the same intro here plus" (3 grams);
    // their distinct suffix grams and all of doc 3 stay clean
    assert(got(1L)._2 == 3L && got(2L)._2 == 3L && got(3L)._2 == 0L)
    assert(got(3L)._1 == 3L) // 5 tokens → 3 distinct trigrams
  }

  test("simhashCandidates finds identical docs at hamming 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact dup
      (3L, "unrelated content stream")).toDF("doc_id", "text")
    val sh = Dedup.simhashTable(docs, "doc_id", "text", 32)
    val got = Dedup.simhashCandidates(sh, 32, bands = 4, maxHam = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 0L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhashBandPlan scales band width with corpus size, capped at 60 bits") {
    // pigeonhole: bands = maxHam + 1 always; total never exceeds the
    // kernel's 60 meaningful signature bits (md5Long planes)
    assert(Dedup.simhashBandPlan(50000, 3) == ((48, 4)))   // w=12: log2(50k/16)
    assert(Dedup.simhashBandPlan(5000000, 3) == ((60, 4))) // w capped at 15
    assert(Dedup.simhashBandPlan(1000, 3) == ((32, 4)))    // floor w=8
    assert(Dedup.simhashBandPlan(5000000, 7) == ((56, 8))) // 8 bands cap w=7
    val (bits, bands) = Dedup.simhashBandPlan(100000, 1)
    assert(bands == 2 && bits <= 60 && bits % bands == 0)
    // every plan the planner can emit is accepted by the signature kernel
    for (mh <- 0 to 7; n <- Seq(100L, 100000L, 100000000L, 5000000000L)) {
      val (b, nb) = Dedup.simhashBandPlan(n, mh)
      assert(b <= 60 && b % nb == 0, s"plan ($b, $nb) for n=$n maxHam=$mh")
    }
  }
}
