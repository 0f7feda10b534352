package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Gopher-rule document statistics (Rae et al. 2021, "Scaling Language
 * Models: ... Gopher", Table A1 — the MassiveText quality + repetition
 * filters; also the C4 heuristics family). Two codegen'd in-row kernels:
 * every signal is an INTEGER (counts and char sums), so the downstream
 * keep/reject rules are exact cross-multiplied comparisons — no floats,
 * bit-identical against any oracle.
 *
 * Scale shape: per-doc single pass, per-doc bounded hash maps, zero
 * shuffle, zero gram explode — the corpus scan stays one
 * WholeStageCodegen span (the [[TextRuns]] lesson: higher-order column
 * functions interpret per element; a 9-signal fan-out would interpret the
 * tokenization nine times).
 *
 * Definitional contract (shared verbatim by the DuckDB oracle twins):
 * words = regex split `\s+` keeping empties; lines = split `\n`;
 * paragraphs = split on the exact string `\n\n`; "chars" = Unicode code
 * points; duplicate occurrences = all beyond the first of an identical
 * (untrimmed) value; top n-gram = max count with ties to the
 * lexicographically SMALLEST gram string (grams joined with one space).
 */
object GopherStats {

  /** The Gopher required-stop-word list (Table A1: "must contain at least
    * two of ..."). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val TrimChars = " \t\r"
  private def trim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && TrimChars.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && TrimChars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  private def codePoints(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** Non-overlapping leftmost "..." occurrences plus lone '…' chars. */
  private def ellipsisCount(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '…') { n += 1; i += 1 }
      else if (s.charAt(i) == '.' && i + 2 < s.length &&
               s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') {
        n += 1; i += 3
      } else i += 1
    }
    n
  }

  private def splitKeepAll(s: String, sep: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    var i = s.indexOf(sep)
    while (i >= 0) {
      out += s.substring(from, i)
      from = i + sep.length
      i = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.toArray
  }

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Quality signals: (n_words, sum_word_len, n_hash, n_ellipsis, n_lines,
    * n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop). */
  def quality(text: UTF8String): InternalRow = {
    val str = text.toString
    val words = Ws.split(str, -1)
    var sumLen = 0L
    var alpha = 0L
    val stopsSeen = new java.util.HashSet[String](16)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      sumLen += codePoints(w)
      var hasAlpha = false
      var ci = 0
      while (!hasAlpha && ci < w.length) {
        val c = w.charAt(ci)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
        ci += 1
      }
      if (hasAlpha) alpha += 1
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      if (StopWords.contains(lw)) stopsSeen.add(lw)
      wi += 1
    }
    var nHash = 0L
    var i = 0
    while (i < str.length) { if (str.charAt(i) == '#') nHash += 1; i += 1 }
    val lines = splitKeepAll(str, "\n")
    var bullet = 0L
    var ellLines = 0L
    var li = 0
    while (li < lines.length) {
      val t = trim(lines(li))
      if (t.nonEmpty && (t.charAt(0) == '-' || t.charAt(0) == '*' ||
          t.charAt(0) == '•')) bullet += 1
      if (t.endsWith("...") || t.endsWith("…")) ellLines += 1
      li += 1
    }
    new GenericInternalRow(Array[Any](
      words.length.toLong, sumLen, nHash, ellipsisCount(str),
      lines.length.toLong, bullet, ellLines, alpha,
      stopsSeen.size.toLong))
  }

  private def dupStats(parts: Array[String]): (Long, Long) = {
    val counts = new java.util.HashMap[String, Long](parts.length * 2)
    var i = 0
    while (i < parts.length) {
      counts.merge(parts(i), 1L, (a, b) => a + b)
      i += 1
    }
    var dup = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1L) {
        dup += e.getValue - 1L
        dupChars += (e.getValue - 1L) * codePoints(e.getKey)
      }
    }
    (dup, dupChars)
  }

  /** (top gram count, top gram char length) for word n-grams, ties to the
    * lexicographically smallest gram; (0, 0) when no grams. Also used for
    * the duplicate-gram char sum when `dupMode`. */
  private def gramStats(words: Array[String], n: Int, dupMode: Boolean)
      : (Long, Long) = {
    val total = words.length - n + 1
    if (total <= 0) return (0L, 0L)
    val counts = new java.util.HashMap[String, Long](total * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      counts.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    if (dupMode) {
      var dupChars = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > 1L)
          dupChars += (e.getValue - 1L) * codePoints(e.getKey)
      }
      (dupChars, 0L)
    } else {
      var bestGram: String = null
      var bestCnt = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestCnt ||
            (e.getValue == bestCnt && cpCompare(e.getKey, bestGram) < 0)) {
          bestCnt = e.getValue
          bestGram = e.getKey
        }
      }
      (bestCnt, codePoints(bestGram))
    }
  }

  /** Code-point (== UTF-8 byte) string order, matching the DuckDB twin's
    * `ORDER BY g ASC`. `String.compareTo` is UTF-16 code-UNIT order, which
    * ranks supplementary-plane chars (surrogate pairs, 0xD800-lead) BELOW
    * chars in [U+E000,U+FFFF] — a tie between e.g. "𝒳" and "" would
    * resolve differently per engine. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(a.length - i, b.length - i)
  }

  /** Repetition signals: (n_lines, dup_lines, chars_dup_lines, n_paras,
    * dup_paras, chars_dup_paras, top2_cnt, top2_len, top3_cnt, top3_len,
    * top4_cnt, top4_len, dup5_chars). */
  def repetition(text: UTF8String): InternalRow = {
    val str = text.toString
    val lines = splitKeepAll(str, "\n")
    val paras = splitKeepAll(str, "\n\n")
    val (dl, dlc) = dupStats(lines)
    val (dp, dpc) = dupStats(paras)
    val words = Ws.split(str, -1)
    val (t2c, t2l) = gramStats(words, 2, dupMode = false)
    val (t3c, t3l) = gramStats(words, 3, dupMode = false)
    val (t4c, t4l) = gramStats(words, 4, dupMode = false)
    val (d5, _) = gramStats(words, 5, dupMode = true)
    new GenericInternalRow(Array[Any](
      lines.length.toLong, dl, dlc, paras.length.toLong, dp, dpc,
      t2c, t2l, t3c, t3l, t4c, t4l, d5))
  }

  /** C4 line-cleaning (Raffel et al. 2020 §2.2, public): keep a (trimmed)
    * line iff it ends in terminal punctuation (`.` `!` `?` `"`), has ≥5
    * whitespace words, and contains no `javascript` token; page flags for
    * `lorem ipsum`, `{`, and the parameterized bad-word list are computed
    * on the ORIGINAL text. Sentence count = `.`/`!`/`?` chars in the
    * cleaned text (the documented segmentation proxy). Returns
    * (clean, n_kept, n_dropped, n_sentences, flag_lorem, flag_brace,
    * flag_bad). */
  def c4Clean(text: UTF8String, badWords: Array[String]): InternalRow = {
    val str = text.toString
    val lines = splitKeepAll(str, "\n")
    val kept = new scala.collection.mutable.ArrayBuffer[String](lines.length)
    var dropped = 0L
    var li = 0
    while (li < lines.length) {
      val t = trim(lines(li))
      val terminal = t.nonEmpty && {
        val c = t.charAt(t.length - 1)
        c == '.' || c == '!' || c == '?' || c == '"'
      }
      val words = Ws.split(t, -1)
      var js = false
      var wi = 0
      while (!js && wi < words.length) {
        if (words(wi).toLowerCase(java.util.Locale.ROOT) == "javascript")
          js = true
        wi += 1
      }
      if (terminal && words.length >= 5 && !js) kept += t else dropped += 1
      li += 1
    }
    val clean = kept.mkString("\n")
    var sentences = 0L
    var i = 0
    while (i < clean.length) {
      val c = clean.charAt(i)
      if (c == '.' || c == '!' || c == '?') sentences += 1
      i += 1
    }
    val lower = str.toLowerCase(java.util.Locale.ROOT)
    val lorem = if (lower.contains("lorem ipsum")) 1L else 0L
    val brace = if (str.indexOf('{') >= 0) 1L else 0L
    var bad = 0L
    if (badWords.nonEmpty) {
      val toks = Ws.split(lower, -1)
      var ti = 0
      while (bad == 0L && ti < toks.length) {
        if (badWords.contains(toks(ti))) bad = 1L
        ti += 1
      }
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(clean),
      kept.length.toLong, dropped, sentences, lorem, brace, bad))
  }

  def gopherQuality(text: Column): Column =
    ExpressionUtils.column(GopherQuality(ExpressionUtils.expression(text)))

  def gopherRepetition(text: Column): Column =
    ExpressionUtils.column(GopherRepetition(ExpressionUtils.expression(text)))

  def c4Clean(text: Column, badWords: Seq[String]): Column =
    ExpressionUtils.column(
      C4Clean(ExpressionUtils.expression(text), badWords))
}

/** text → struct of the 9 Gopher quality counters. */
case class GopherQuality(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    Seq("n_words", "sum_word_len", "n_hash", "n_ellipsis", "n_lines",
      "n_bullet_lines", "n_ellipsis_lines", "n_alpha_words", "n_stop")
      .map(StructField(_, LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    GopherStats.quality(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherStats.quality($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherQuality =
    copy(child = newChild)
}

/** text → struct(clean text + C4 counters/flags). The bad-word list is a
  * plan-time constant, shipped into codegen as a class-level array. */
case class C4Clean(child: Expression, badWords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(
    StructField("clean", org.apache.spark.sql.types.StringType,
      nullable = false) +:
      Seq("n_kept", "n_dropped", "n_sentences", "flag_lorem", "flag_brace",
        "flag_bad").map(StructField(_, LongType, nullable = false)))
  private lazy val badArr = badWords.toArray
  override protected def nullSafeEval(input: Any): Any =
    GopherStats.c4Clean(input.asInstanceOf[UTF8String], badArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("badWords", badArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherStats.c4Clean($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): C4Clean =
    copy(child = newChild)
}

/** text → struct of the 13 Gopher repetition counters. */
case class GopherRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    Seq("n_lines", "dup_lines", "chars_dup_lines", "n_paras", "dup_paras",
      "chars_dup_paras", "top2_cnt", "top2_len", "top3_cnt", "top3_len",
      "top4_cnt", "top4_len", "dup5_chars")
      .map(StructField(_, LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    GopherStats.repetition(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherStats.repetition($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
}
