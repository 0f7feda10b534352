package graft

import org.apache.spark.sql.functions._
import graft.operators.{Filters, Routing}
import graft.operators.Filters.TableRule

/**
 * Round-14 randomized differential properties over two OLD kernels that
 * until now only had fixed-case gates (the pattern that has found a real
 * bug four rounds running): the table-filter wildcard matcher vs an
 * independent character-walking glob interpreter, and the topic
 * `{schema}`/`{table}` substitution vs a direct string replay of the
 * reference's Substitute rules.
 */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  // ---- an independent glob interpreter (star/question/class with !) -----

  private def globMatch(pat: String, s: String): Boolean = {
    def go(pi: Int, si: Int): Boolean = {
      if (pi == pat.length) return si == s.length
      pat.charAt(pi) match {
        case '*' =>
          // greedy or empty — try every split
          (si to s.length).exists(k => go(pi + 1, k))
        case '?' =>
          si < s.length && go(pi + 1, si + 1)
        case '[' =>
          val close = pat.indexOf(']', pi + 1)
          if (close < 0) // unterminated: literal '['
            si < s.length && s.charAt(si) == '[' && go(pi + 1, si + 1)
          else {
            if (si >= s.length) return false
            val body0 = pat.substring(pi + 1, close)
            val (neg, body) =
              if (body0.startsWith("!")) (true, body0.substring(1))
              else (false, body0)
            // expand a-z ranges
            var inSet = false
            var j = 0
            while (j < body.length) {
              if (j + 2 < body.length && body.charAt(j + 1) == '-') {
                if (s.charAt(si) >= body.charAt(j) &&
                  s.charAt(si) <= body.charAt(j + 2)) inSet = true
                j += 3
              } else {
                if (s.charAt(si) == body.charAt(j)) inSet = true
                j += 1
              }
            }
            (inSet != neg) && go(close + 1, si + 1)
          }
        case c =>
          si < s.length && s.charAt(si) == c && go(pi + 1, si + 1)
      }
    }
    go(0, 0)
  }

  test("table-filter matcher equals an independent glob interpreter (400 random rule sets)") {
    val rnd = new scala.util.Random(1412L)
    val alpha = "abcAB01_"
    def name(): String =
      Seq.fill(1 + rnd.nextInt(6))(alpha(rnd.nextInt(alpha.length))).mkString
    def pattern(): String = {
      val pieces = Seq.fill(1 + rnd.nextInt(4)) {
        rnd.nextInt(6) match {
          case 0 => "*"
          case 1 => "?"
          case 2 => "[ab]"
          case 3 => "[!ab]"
          case 4 => "[a-c]"
          case _ => name().take(2)
        }
      }
      pieces.mkString
    }
    for (trial <- 0 until 400) {
      val caseSensitive = trial % 2 == 0
      val rules = Seq.fill(1 + rnd.nextInt(4))(
        TableRule(pattern(), pattern(), allow = rnd.nextBoolean()))
      val rows = Seq.fill(12)((name(), name()))
      val df = rows.toDF("schema_name", "table_name")
      val got = df.filter(Filters.tableFilterPredicate(rules,
        col("schema_name"), col("table_name"), caseSensitive))
        .as[(String, String)].collect().toSet

      def fold(s: String, t: String): Boolean = {
        def norm(x: String) =
          if (caseSensitive) x else x.toLowerCase(java.util.Locale.ROOT)
        rules.foldLeft(false) { (acc, r) =>
          if (globMatch(norm(r.schemaPat), norm(s)) &&
            globMatch(norm(r.tablePat), norm(t))) r.allow
          else acc
        }
      }
      val want = rows.filter { case (s, t) => fold(s, t) }.toSet
      assert(got == want,
        s"trial=$trial cs=$caseSensitive rules=$rules rows=$rows")
    }
  }

  // ---- topic substitution vs a direct string replay ----------------------

  private def substituteReplay(expr: String, schema: String,
      table: String): String = {
    def sanitize(s: String): String =
      s.map(c => if (c.isLetterOrDigit && c < 128 || "._-".contains(c)) c
        else '_').mkString
        .replaceAll("[^a-zA-Z0-9._\\-]", "_")
    val filled = expr
      .replace("{schema}", sanitize(schema))
      .replace("{table}", sanitize(table))
    val trunc = filled.take(Routing.KafkaTopicMaxLength)
    if (trunc == ".") "_" else if (trunc == "..") "__" else trunc
  }

  test("topic substitution equals the string replay (300 random names)") {
    val rnd = new scala.util.Random(1413L)
    val weird = "aZ0._-/ é|{}?*\tñ"
    def name(maxLen: Int): String =
      Seq.fill(1 + rnd.nextInt(maxLen))(weird(rnd.nextInt(weird.length)))
        .mkString
    val exprs = Seq("pre_{schema}_{table}", "{schema}", "t_{table}",
      "{schema}{table}", "fixed-topic", "{schema}.{table}.suffix")
    for (_ <- 0 until 300) {
      val expr = exprs(rnd.nextInt(exprs.size))
      // long names exercise the 249 truncation; short ones the specials
      val (s, t) =
        if (rnd.nextInt(10) == 0) (name(200), name(200))
        else if (rnd.nextInt(10) == 0) (".", ".")
        else (name(8), name(8))
      val got = Seq((s, t)).toDF("s", "t")
        .select(Routing.topicFromExpression(expr, col("s"), col("t")))
        .as[String].head()
      assert(got == substituteReplay(expr, s, t),
        s"expr=$expr s=$s t=$t")
    }
  }

  // ---- session windows vs an independent islands fold --------------------

  test("sessionize equals an islands-with-gap fold on 40 random streams") {
    import graft.operators.Sessions
    val rnd = new scala.util.Random(1421L)
    for (trial <- 0 until 40) {
      val gapUs = (1L + rnd.nextInt(20)) * 1000L
      val gapNs = gapUs * 1000L
      val events = (1 to 3).flatMap { k =>
        Seq.fill(3 + rnd.nextInt(25))(
          (k.toLong, (1000L + rnd.nextInt(300)) * 1000000L)) // ns, collisions
      }
      val df = events.toDF("k", "ts_ns")
      val got = Sessions.sessionize(df, col("k"), col("ts_ns"), gapNs)
        .select("k", "sess", "n_events", "start_ns", "end_ns")
        .as[(Long, Int, Long, Long, Long)].collect().toSeq
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(t => (t._3, t._4, t._5))).toMap

      // independent fold: Spark merges session windows that OVERLAP OR
      // TOUCH — an event at exactly last + gap still EXTENDS the session
      // (the per-event window is [t, t+gap] for merging purposes), so the
      // boundary is INCLUSIVE
      val want = events.groupBy(_._1).view.mapValues { es =>
        val ts = es.map(_._2).sorted
        ts.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
          acc.lastOption match {
            case Some(sess) if (t - sess.last) / 1000L <= gapUs =>
              acc.init :+ (sess :+ t)
            case _ => acc :+ Vector(t)
          }
        }.map(s => (s.size.toLong, s.min, s.max))
      }.toMap
      assert(got == want, s"trial=$trial gap=$gapUs")
    }
  }

  test("capped sessionization equals its fold (gap strict, cap inclusive)") {
    import graft.operators.Sessions
    val rnd = new scala.util.Random(1422L)
    for (trial <- 0 until 40) {
      val gap = 1L + rnd.nextInt(15)
      val cap = gap + 1 + rnd.nextInt(30)
      val events = (1 to 2).flatMap { k =>
        (1 to (5 + rnd.nextInt(25))).map(i =>
          (k.toLong, (100L + rnd.nextInt(120)), i.toLong + k * 1000))
      }.distinct
      val df = events.toDF("k", "ts", "id")
      val got = Sessions.sessionizeCapped(df, "k", "ts", "id", gap, cap)
        .as[(Long, Long, Long, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.sortBy(r => (r._2, r._3))
          .map(r => r._4)).toMap

      val want = events.groupBy(_._1).view.mapValues { es =>
        val sorted = es.sortBy(e => (e._2, e._3))
        var sess = 0L; var start = Long.MinValue; var last = Long.MinValue
        sorted.map { case (_, ts, _) =>
          if (sess == 0L || ts - last > gap || ts - start >= cap) {
            sess += 1; start = ts
          }
          last = ts
          sess
        }
      }.toMap
      assert(got == want, s"trial=$trial gap=$gap cap=$cap")
    }
  }

  // ---- GTID set algebra vs an independent point-set model ----------------

  test("GTID merge/subtract/contains/render equal a point-set model (60 random sets)") {
    import graft.operators.Gtid
    val rnd = new scala.util.Random(1416L)
    def islands(pts: Set[Long]): Seq[(Long, Long)] = {
      val sorted = pts.toSeq.sorted
      sorted.foldLeft(Vector.empty[(Long, Long)]) { (acc, p) =>
        acc.lastOption match {
          case Some((s, e)) if p == e + 1 => acc.init :+ (s, p)
          case _ => acc :+ (p, p)
        }
      }
    }
    def render(byUuid: Map[String, Set[Long]]): String =
      byUuid.toSeq.filter(_._2.nonEmpty).sortBy(_._1).map { case (u, pts) =>
        u + ":" + islands(pts).map { case (s, e) =>
          if (s == e) s.toString else s"$s-$e" }.mkString(":")
      }.mkString(",")

    for (_ <- 0 until 60) {
      val uuids = Seq("aaaa-1", "bbbb-2", "cccc-3").take(1 + rnd.nextInt(3))
      def genPts() = uuids.map(u =>
        u -> Set.fill(1 + rnd.nextInt(25))(1L + rnd.nextInt(50))).toMap
      val aPts = genPts()
      val bPts = genPts()
      val aDf = aPts.toSeq.flatMap { case (u, ps) => ps.map(u -> _) }
        .toDF("uuid", "txn")

      // merge == canonical islands of the point set
      val merged = Gtid.mergeIntervals(aDf)
      val gotIvs = merged.as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq)
        .toMap
      val wantIvs = aPts.view.filter(_._2.nonEmpty)
        .mapValues(islands).toMap
      assert(gotIvs == wantIvs)

      // render ∘ merge == the model's canonical string; parse round-trips
      val rendered = Gtid.renderSet(merged).as[String].head()
      assert(rendered == render(aPts), aPts)
      val reparsed = Seq(rendered).toDF("s")
        .select(explode(Gtid.parseSet(col("s"))).as("iv"))
        .select("iv.uuid", "iv.start", "iv.end")
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq)
        .toMap
      assert(reparsed == wantIvs)

      // contains == membership (probe hits and misses)
      for (_ <- 0 until 5) {
        val u = uuids(rnd.nextInt(uuids.size))
        val t = 1L + rnd.nextInt(55)
        val got = Seq(rendered).toDF("s")
          .select(Gtid.containsTxn(col("s"), lit(u), lit(t))).as[Boolean]
          .head()
        assert(got == aPts(u).contains(t), s"$u:$t in $rendered")
      }

      // subtract == set difference
      val bDf = Gtid.mergeIntervals(bPts.toSeq.flatMap { case (u, ps) =>
        ps.map(u -> _) }.toDF("uuid", "txn"))
      val diff = Gtid.subtractIntervals(merged, bDf)
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq)
        .toMap
      val wantDiff = aPts.map { case (u, ps) =>
        u -> (ps -- bPts.getOrElse(u, Set.empty)) }
        .filter(_._2.nonEmpty).view.mapValues(islands).toMap
      assert(diff == wantDiff)
    }
  }

  test("the dot specials survive substitution: '.' and '..'") {
    // a schema of "." with expression "{schema}" renders "_"
    val df = Seq((".", "x"), ("..", "x")).toDF("s", "t")
    val out = df.select(Routing.topicFromExpression("{schema}",
      col("s"), col("t")).as("topic")).as[String].collect().toSeq
    assert(out == Seq("_", "__"))
  }
}
