package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Pins the Gopher kernel counters on hand-built edge-case documents and
  * against an independent Scala-collections fold on random text. */
class GopherStatsSpec extends SparkSpec {
  import spark.implicits._

  private def quality(text: String): Map[String, Long] = {
    val row = Seq(text).toDF("t")
      .select(TextOps.gopherQuality(col("t")).as("s"))
      .select("s.*").collect().head
    row.schema.fieldNames.zip(row.toSeq.map(_.asInstanceOf[Long])).toMap
  }

  private def repetition(text: String): Map[String, Long] = {
    val row = Seq(text).toDF("t")
      .select(TextOps.gopherRepetition(col("t")).as("s"))
      .select("s.*").collect().head
    row.schema.fieldNames.zip(row.toSeq.map(_.asInstanceOf[Long])).toMap
  }

  test("quality counters on edge cases") {
    val q = quality("The cat sat.\n- bullet one\n\t* bullet two\nwait…\nmore...")
    assert(q("n_lines") === 5)
    assert(q("n_bullet_lines") === 2)        // '-' and tab-indented '*'
    assert(q("n_ellipsis_lines") === 2)      // '…' and '...' endings
    assert(q("n_ellipsis") === 2)
    assert(q("n_stop") === 1)                // 'the' (lowercased) only
    val q2 = quality("# ## x…... y .... …")
    assert(q2("n_hash") === 3)
    // '…' + '...' + '...' (leftmost in '....') + lone '…' = 4
    assert(q2("n_ellipsis") === 4)
    val q3 = quality("of THE and to be exactly")
    assert(q3("n_stop") === 5)               // distinct: of, the, and, to, be
    assert(q3("n_alpha_words") === 6)
    assert(q3("n_words") === 6)
    assert(q3("sum_word_len") === 19)
    // bullet '•' and all-numeric words
    val q4 = quality("• dot bullet\n12 34 x9")
    assert(q4("n_bullet_lines") === 1)
    assert(q4("n_alpha_words") === 3)        // dot, bullet, x9 — not •/12/34
  }

  test("repetition counters on edge cases") {
    val r = repetition("a b\nc\na b\n\na b\nc\na b")
    // lines: [a b, c, a b, , a b, c, a b] -> 'a b'×4 (+3 dups), 'c'×2 (+1)
    assert(r("n_lines") === 7)
    assert(r("dup_lines") === 4)
    assert(r("chars_dup_lines") === 3 * 3 + 1)
    // paras: ["a b\nc\na b", "a b\nc\na b"] -> 1 dup of 9 chars
    assert(r("n_paras") === 2)
    assert(r("dup_paras") === 1)
    assert(r("chars_dup_paras") === 9)
    // words: a b c a b a b c a b -> top bigram "a b" ×4 (of 9), len 3
    assert(r("top2_cnt") === 4 && r("top2_len") === 3)
    // 5-grams: "a b c a b"×2(+1 dup, 9 chars), "b c a b a", "c a b a b",
    // "b a b c a", "a b a b c" singles
    assert(r("dup5_chars") === 9)
    // tie-break: "x y x z" bigrams x y / y x / x z all cnt 1 -> smallest
    val t = repetition("x y x z")
    assert(t("top2_cnt") === 1 && t("top2_len") === 3)
    // no grams at all
    val e = repetition("one")
    assert(e("top2_cnt") === 0 && e("top2_len") === 0 && e("dup5_chars") === 0)
    // non-ASCII tie: "𝒳 a" (U+1D4B3, surrogate pair) vs " bb"
    // both ×2. Code-point/UTF-8 order (the DuckDB twin's `ORDER BY g`):
    // U+E000 < U+1D4B3 → " bb" wins, 4 code points. UTF-16
    // code-unit order would pick "𝒳 a" (lead surrogate 0xD835 < 0xE000).
    val nt = repetition("𝒳 a 𝒳 a  bb  bb")
    assert(nt("top2_cnt") === 2 && nt("top2_len") === 4)
  }

  test("fail masks implement the Table A1 thresholds exactly") {
    // 49 words -> fails ONLY the word-count rule (others pass by
    // construction: mean len in band, no symbols, no bullets, alpha, stops)
    val ok49 = (Seq("the", "be", "to", "of") ++
      (1 to 45).map(i => s"word$i")).mkString(" ")
    val m = Seq(ok49).toDF("t")
      .select(TextOps.gopherQualityFailMask(
        TextOps.gopherQuality(col("t"))).as("m"))
      .as[Long].head()
    assert(m === 1L)
    // one more word -> passes everything
    val m2 = Seq(ok49 + " extra").toDF("t")
      .select(TextOps.gopherQualityFailMask(
        TextOps.gopherQuality(col("t"))).as("m"))
      .as[Long].head()
    assert(m2 === 0L)
  }

  test("c4Clean line rules and page flags") {
    def clean(text: String, bad: Seq[String] = Seq("badword")) = {
      val row = Seq(text).toDF("t")
        .select(TextOps.c4Clean(col("t"), bad).as("s")).select("s.*")
        .collect().head
      (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6))
    }
    val (c, kept, dropped, sent, lorem, brace, bad) = clean(
      "This line has five good words.\n" +
      "short line.\n" +                          // 2 words -> dropped
      "no terminal punctuation on this line\n" + // no punct -> dropped
      "  enable JavaScript to view this page.\n" + // js token -> dropped
      "Is this a real question with words?")
    assert(c === "This line has five good words.\nIs this a real question with words?")
    assert((kept, dropped) === ((2L, 3L)))
    assert(sent === 2L)
    assert((lorem, brace, bad) === ((0L, 0L, 0L)))
    // page flags fire on the ORIGINAL text even when lines are dropped
    val f = clean("Lorem Ipsum dolor { badword\nKept line with five words here.")
    assert((f._5, f._6, f._7) === ((1L, 1L, 1L)))
    assert(f._1 === "Kept line with five words here.")
    // quote-terminal keeps; trimmed line is what's kept
    val q = clean("   a quote line with five words\"   ")
    assert(q._1 === "a quote line with five words\"")
    // keep rule: >=3 sentences and no flags
    val keeps = Seq(
      "One good sentence here now.\nAnother good sentence right here.\nAnd a third full sentence too.",
      "One good sentence here now.\nAnother good sentence right here.")
      .toDF("t")
      .select(TextOps.c4Keep(TextOps.c4Clean(col("t"), Nil)).as("k"))
      .as[Boolean].collect().toSeq
    assert(keeps === Seq(true, false))
  }

  test("boilerplate removal: corpus threshold, within-doc repeats don't count") {
    val docs = ((1 to 12).map(i => (i.toLong, s"unique head $i\nshared footer line\nbody $i")) :+
      (99L, "dup\ndup\ndup\nbody 99")) // 'dup' ×3 in ONE doc: df=1, kept
      .toDF("doc_id", "text")
    val out = graft.operators.Curation
      .removeBoilerplateLines(docs, "doc_id", "text", minDocs = 10)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Long)].collect().toMap2
    assert(out(1L) === (("unique head 1\nbody 1", 1L)))
    assert(out(99L) === (("dup\ndup\ndup\nbody 99", 0L)))
    // threshold boundary: exactly minDocs docs → removed; minDocs-1 → kept
    val nine = (1 to 9).map(i => (i.toLong, s"h$i\nnine docs share me"))
      .toDF("doc_id", "text")
    val kept = graft.operators.Curation
      .removeBoilerplateLines(nine, "doc_id", "text", minDocs = 10)
      .filter(col("n_removed") > 0).count()
    assert(kept === 0)
  }

  private implicit class ToMap2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("kernel ≡ independent Scala fold on random multi-line docs") {
    val rnd = new scala.util.Random(2024)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "##", "...", "-",
      "x", "be", "with", "lorem", "ipsum")
    for (trial <- 1 to 30) {
      val lines = (0 until 1 + rnd.nextInt(8)).map { _ =>
        (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val doc = lines.mkString(if (rnd.nextBoolean()) "\n" else "\n\n")
      val got = repetition(doc)
      // independent fold with Scala collections
      val ls = doc.split("\n", -1).toSeq
      val ps = splitAll(doc, "\n\n")
      val ws = doc.split("\\s+", -1).toSeq
      def dups(xs: Seq[String]) = {
        val g = xs.groupBy(identity).filter(_._2.size > 1)
        (g.values.map(_.size - 1L).sum,
          g.map { case (k, v) => (v.size - 1L) * k.codePointCount(0, k.length) }.sum)
      }
      val (dl, dlc) = dups(ls)
      val (dp, dpc) = dups(ps)
      def grams(n: Int) = ws.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq
      val g2 = grams(2).groupBy(identity).view.mapValues(_.size).toMap
      val top2 = if (g2.isEmpty) ("", 0) else
        g2.toSeq.minBy { case (g, c) => (-c, g) }
      val d5 = grams(5).groupBy(identity).filter(_._2.size > 1)
        .map { case (k, v) => (v.size - 1L) * k.length }.sum
      assert(got("n_lines") === ls.size, s"trial $trial lines")
      assert(got("dup_lines") === dl && got("chars_dup_lines") === dlc,
        s"trial $trial dup lines")
      assert(got("n_paras") === ps.size && got("dup_paras") === dp &&
        got("chars_dup_paras") === dpc, s"trial $trial paras")
      assert(got("top2_cnt") === top2._2.toLong, s"trial $trial top2 cnt")
      if (top2._2 > 0)
        assert(got("top2_len") === top2._1.length.toLong, s"trial $trial top2 len")
      assert(got("dup5_chars") === d5, s"trial $trial dup5")
    }
  }

  private def splitAll(s: String, sep: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    var i = s.indexOf(sep)
    while (i >= 0) {
      out += s.substring(from, i); from = i + sep.length
      i = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.toSeq
  }
}
