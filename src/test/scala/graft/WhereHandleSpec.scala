package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WhereHandle
import graft.operators.WhereHandle.{Col, Idx, Table}

/** WHERE-key selection properties: randomized build/selection replay,
  * the PK-overwrite quirk, and the swap-to-front last-used cache. */
class WhereHandleSpec extends AnyFunSuite {

  test("build + per-row selection equal a direct replay on 300 random tables") {
    val rnd = new scala.util.Random(1410L)
    val universe = Vector("a", "b", "c", "d")
    for (_ <- 0 until 300) {
      val srcCols = universe.filter(_ => rnd.nextInt(10) > 0).map(n =>
        Col(n, hidden = rnd.nextInt(10) == 0))
      val tgtCols = universe.map(n => Col(n, notNull = rnd.nextBoolean()))
      val idxs = Seq.fill(rnd.nextInt(4)) {
        val cols = rnd.shuffle(universe).take(1 + rnd.nextInt(2))
        Idx(s"i${rnd.nextInt(1000)}", cols, unique = rnd.nextInt(8) > 0,
          primary = rnd.nextInt(6) == 0, public = rnd.nextInt(8) > 0)
      }
      val pkHandle = if (rnd.nextInt(4) == 0)
        Some(universe(rnd.nextInt(universe.size))) else None
      val src = Table(srcCols)
      val tgt = Table(tgtCols, idxs, pkHandle)
      val h = WhereHandle.build(src, tgt)

      // direct replay of the build rules
      val srcMap = srcCols.map(c => c.name -> c).toMap
      val tgtNN = tgtCols.filter(_.notNull).map(_.name).toSet
      val cands = idxs ++ pkHandle.map(pk =>
        Idx("PRIMARY", Seq(pk), unique = true, primary = true))
      val usable = cands.filter(i => i.unique && i.public &&
        i.columns.forall(srcMap.contains))
      val forWhere = usable.filterNot(_.columns.exists(srcMap(_).hidden))
      val expectNN = forWhere.filter(_.primary).lastOption
        .orElse(forWhere.find(i => !i.primary &&
          i.columns.forall(tgtNN.contains) &&
          // a primary ANYWHERE earlier or later overwrites; the first
          // non-primary all-NN only stands when no primary is usable
          !forWhere.exists(_.primary)))
      assert(h.uniqueNotNullIdx == expectNN, s"idxs=$idxs pk=$pkHandle")
      assert(h.causalityIdxs == usable)
      assert(h.uniqueIdxs.toSeq == forWhere)

      // per-row choice (fresh handle so the cache starts in build order)
      val h2 = WhereHandle.build(src, tgt)
      val row: Map[String, Any] = srcCols.map(c =>
        c.name -> (if (rnd.nextBoolean()) null else c.name: Any)).toMap
      val got = WhereHandle.whereIdx(h2, row)
      val want = expectNN.orElse(forWhere.find(
        _.columns.forall(c => row.getOrElse(c, null) != null)))
      assert(got == want, s"row=$row idxs=$forWhere")
    }
  }

  test("a later PRIMARY overwrites an earlier unique-not-null preference") {
    val src = Table(Seq(Col("a"), Col("b")))
    val tgt = Table(Seq(Col("a", notNull = true), Col("b", notNull = true)),
      Seq(Idx("uk_b", Seq("b")), Idx("pk", Seq("a"), primary = true)))
    assert(WhereHandle.build(src, tgt).uniqueNotNullIdx.map(_.name)
      .contains("pk"))
  }

  test("the data-dependent hit moves to the front of the cache") {
    val src = Table(Seq(Col("a"), Col("b"), Col("c")))
    val tgt = Table(Seq(Col("a"), Col("b"), Col("c")),
      Seq(Idx("uk_b", Seq("b")), Idx("uk_c", Seq("c"))))
    val h = WhereHandle.build(src, tgt)
    val r1 = WhereHandle.whereIdx(h, Map("a" -> 1, "b" -> null, "c" -> 3))
    assert(r1.map(_.name).contains("uk_c"))
    // both usable now — the cached uk_c wins over build-order uk_b
    val r2 = WhereHandle.whereIdx(h, Map("a" -> 1, "b" -> 2, "c" -> 3))
    assert(r2.map(_.name).contains("uk_c"))
  }
}
