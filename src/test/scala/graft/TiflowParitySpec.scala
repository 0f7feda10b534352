package graft

import org.apache.spark.sql.functions._
import graft.operators.Routing

/**
 * Byte-exact partition parity with the reference's PositionInertia
 * dispatcher (pkg/hash/position_inertia.go): XOR of CRC32-IEEE write
 * groups, modulo partition count. The expected values are computed with
 * java.util.zip.CRC32 — the same IEEE polynomial Go's hash/crc32 uses —
 * replaying the reference's Write call pattern.
 */
class TiflowParitySpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics replayed on the JVM. */
  private def positionInertia(groups: Seq[Array[Byte]]): Long = {
    var acc = 0L // hashMagicNumber = 0
    groups.foreach { g =>
      val c = new java.util.zip.CRC32()
      c.update(g)
      acc = acc ^ c.getValue
    }
    acc & 0xffffffffL
  }

  test("dispatchTiflowCompat lands rows on the reference's partitions") {
    val rows = Seq(
      ("db_0", "tbl_1", 42L), ("db_0", "tbl_2", 7L),
      ("db_1", "users", 123456789L), ("mydb", "t", 0L))
    val df = rows.toDF("s", "t", "pk")
      .select(col("s"), col("t"), col("pk"),
        Routing.dispatchTiflowCompat(16, col("s"), col("t"),
          Seq("pk" -> col("pk"))).as("part"))
    val got = df.as[(String, String, Long, Long)].collect()
      .map { case (s, t, pk, p) => ((s, t, pk), p) }.toMap

    rows.foreach { case (s, t, pk) =>
      val expected = positionInertia(Seq(
        (s + t).getBytes("UTF-8"),
        ("pk" + pk.toString).getBytes("UTF-8"))) % 16
      assert(got((s, t, pk)) == expected,
        s"($s,$t,$pk): got ${got((s, t, pk))}, reference $expected")
    }
  }

  test("partitionKeyByIndexValue renders the reference's decimal key string") {
    // partition/index_value.go:86 — key = strconv.FormatInt(int64(sum32), 10)
    val df = Seq(("db_0", "tbl_1", 42L)).toDF("s", "t", "pk")
    val key = df.select(Routing.partitionKeyByIndexValue(
      col("s"), col("t"), Seq("pk" -> col("pk"))).as("k")).head().getString(0)
    val expected = positionInertia(Seq(
      "db_0tbl_1".getBytes("UTF-8"), "pk42".getBytes("UTF-8"))).toString
    assert(key == expected)
  }

  test("multiple key columns XOR independently (order-insensitive)") {
    val df = Seq(("db", "t", 1L, "x")).toDF("s", "t", "pk", "name")
    val a = df.select(Routing.dispatchTiflowCompat(1000, col("s"), col("t"),
      Seq("pk" -> col("pk"), "name" -> col("name"))).as("p")).as[Long].head()
    val b = df.select(Routing.dispatchTiflowCompat(1000, col("s"), col("t"),
      Seq("name" -> col("name"), "pk" -> col("pk"))).as("p")).as[Long].head()
    assert(a == b) // XOR accumulation is commutative, like the reference
  }

  test("named-index dispatcher hashes the resolved index's columns " +
      "(index_value.go:68-81)") {
    val df = Seq(("db_0", "tbl_1", 42L, "x")).toDF("s", "t", "pk", "name")
    val idx = Map("primary" -> Seq("pk"), "uk_name" -> Seq("name", "pk"))
    val byIndex = df.select(Routing.dispatchTiflowCompatIndex(16, col("s"),
      col("t"), idx, "uk_name", c => col(c)).as("p")).as[Long].head()
    // the reference hashes the SAME (name, value) write groups whether the
    // columns come from the index registry or the handle-key scan
    val explicit = df.select(Routing.dispatchTiflowCompat(16, col("s"),
      col("t"), Seq("name" -> col("name"), "pk" -> col("pk"))).as("p"))
      .as[Long].head()
    assert(byIndex == explicit)
    val expected = positionInertia(Seq(
      "db_0tbl_1".getBytes("UTF-8"), "namex".getBytes("UTF-8"),
      "pk42".getBytes("UTF-8"))) % 16
    assert(byIndex == expected)
  }

  test("missing index fails the dispatch like ErrDispatcherFailed " +
      "(index_value.go:68-75) — no silent fallback") {
    val ex = intercept[IllegalArgumentException] {
      Routing.dispatchByNamedIndex(6, Map("primary" -> Seq("pk")),
        "no_such_index", c => col(c))
    }
    assert(ex.getMessage.contains("index not found"))
    assert(ex.getMessage.contains("no_such_index"))
  }
}
