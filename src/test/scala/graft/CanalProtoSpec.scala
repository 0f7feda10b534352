package graft

import graft.functions.CanalProto

/**
 * Canal protobuf wire form: golden bytes (hand-assembled from
 * EntryProtocol.proto field numbers — proves the encoding IS protobuf,
 * not merely self-inverse), packet framing, and image-key semantics.
 */
class CanalProtoSpec extends SparkSpec {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("DDL entry matches hand-assembled protobuf bytes") {
    // Header: version=1(f1) serverenCode=UTF-8(f5) executeTime=5(f6)
    // sourceType=MYSQL(f7) schemaName=db(f8) tableName=t(f9) eventType=
    // CREATE=4(f11); RowChange: eventType(f2) isDdl(f10) sql(f11)
    // ddlSchemaName(f14); Entry: header(f1) ROWDATA(f2) storeValue(f3)
    val header = "0801" + "2a05" + "5554462d38" + "3005" + "3802" +
      "4202" + "6462" + "4a01" + "74" + "5804"
    val sqlHex = "435245415445205441424c4520742028706b20424947494e5429"
    val rc = "1004" + "5001" + "5a1a" + sqlHex + "7202" + "6462"
    val expected = "0a16" + header + "1002" + "1a24" + rc
    val got = CanalProto.encodeDdl("db", "t", ts = 5, eventType = 4,
      sql = "CREATE TABLE t (pk BIGINT)")
    assert(got.toSeq == hex(expected).toSeq,
      s"\ngot:      ${got.map("%02x".format(_)).mkString}" +
      s"\nexpected: $expected")
  }

  test("packet framing round-trips entry order") {
    val e1 = CanalProto.encodeDdl("a", "t1", 1, 4, "CREATE TABLE t1 (x INT)")
    val e2 = CanalProto.encodeDdl("b", "t2", 2, 6, "DROP TABLE t2")
    val back = CanalProto.packetEntries(CanalProto.packetOf(Seq(e1, e2)))
    assert(back.size == 2)
    assert(back(0).toSeq == e1.toSeq && back(1).toSeq == e2.toSeq)
  }

  test("update images: before keeps old key, after carries the new key") {
    val df = Seq(
      ("U", 100L, "db", "t", 7L, 9L, Option(1.5), Option(2.5), Option("e")))
      .toDF("op", "commit_ts", "schema_name", "table_name", "pk", "pk_after",
        "val_before", "val_after", "etype")
    val e = df.select(
      CanalProto.decodeColumn(CanalProto.encodeDmlColumn(df)).as("e"))
      .select("e.*").head()
    assert(e.getAs[Long]("pk") == 9L) // after image preferred
    assert(e.getAs[Double]("val_before") == 1.5)
    assert(e.getAs[Double]("val_after") == 2.5)
    assert(e.getAs[Int]("n_before") == 3 && e.getAs[Int]("n_after") == 3)
    assert(!e.getAs[Boolean]("is_ddl") && e.getAs[Int]("event_type") == 2)
  }

  test("delete carries a before image only; null value survives isNull") {
    val df = Seq(
      ("D", 100L, "db", "t", 7L, 7L, Option.empty[Double],
        Option.empty[Double], Option("e")))
      .toDF("op", "commit_ts", "schema_name", "table_name", "pk", "pk_after",
        "val_before", "val_after", "etype")
    val e = df.select(
      CanalProto.decodeColumn(CanalProto.encodeDmlColumn(df)).as("e"))
      .select("e.*").head()
    assert(e.getAs[Long]("pk") == 7L)
    assert(e.isNullAt(e.fieldIndex("val_before"))) // isNull column decoded
    assert(e.getAs[Int]("n_before") == 3 && e.getAs[Int]("n_after") == 0)
    assert(e.getAs[Int]("event_type") == 3)
  }
}
