package graft

/** Driver-contract regression guard: the flagship entry must return rows
  * on the smoke fixture, every oracle key must name a registered query,
  * and gate names must be unique (a duplicate would silently shadow one
  * gate in the Map and weaken the correctness gate). */
class EntryContractSpec extends SparkSpec {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("oracle keys ⊆ query keys; gate names unique") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
    val all = graft.queries.Gate.all.map(_.name)
    val dupes = all.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate gate names: $dupes")
    // every gate with an oracle is in the driver maps
    assert(all.toSet === qs)
  }
}
