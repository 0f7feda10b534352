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
}
