package graft

import org.apache.spark.sql.types._
import graft.core.SchemaRegistry
import graft.core.SchemaRegistry._

/** DDL application and optimistic schema-lattice join (G1/G3). */
class SchemaSpec extends SparkSpec {

  private val base = new StructType().add("pk", LongType).add("v", DoubleType)

  test("applyDdl add/drop/rename") {
    val s1 = applyDdl(base, AddColumn("c", StringType))
    assert(s1.fieldNames.toSeq == Seq("pk", "v", "c"))
    val s2 = applyDdl(s1, RenameColumn("c", "d"))
    assert(s2.fieldNames.toSeq == Seq("pk", "v", "d"))
    val s3 = applyDdl(s2, DropColumn("d"))
    assert(s3 == base)
  }

  test("optimistic join: union with nullable-where-missing") {
    val shard1 = base.add("extra", StringType, nullable = false)
    val shard2 = base
    val Right(joined) = joinSchemas(Seq(shard1, shard2)): @unchecked
    assert(joined.fieldNames.toSeq == Seq("pk", "v", "extra"))
    // shard2 lacks `extra` → nullable in the joined schema
    assert(joined("extra").nullable)
    assert(!joined("pk").nullable == !base("pk").nullable)
  }

  test("optimistic join: type divergence is a conflict") {
    val shard1 = base.add("c", StringType)
    val shard2 = base.add("c", LongType)
    val Left(conflict) = joinSchemas(Seq(shard1, shard2)): @unchecked
    assert(conflict.field == "c")
    assert(conflict.types.toSet == Set(StringType, LongType))
  }

  test("version intervals are contiguous and open-ended") {
    val vs = Seq(
      TableVersion("db", "t", 1, 0L, base),
      TableVersion("db", "t", 2, 100L, base),
      TableVersion("db", "t", 3, 200L, base))
    val rows = SchemaRegistry.versionIntervals(spark, vs)
      .orderBy("v_from").collect()
    assert(rows.map(_.getLong(3)).toSeq == Seq(0L, 100L, 200L))
    assert(rows.map(_.getLong(4)).toSeq == Seq(100L, 200L, Long.MaxValue))
  }
}
