package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{ColumnSpec, DdlParser, MySqlTypes}
import graft.operators.GenericCodecs
import graft.operators.GenericCodecs.{CodecOpts, LargeMessageHandle}

/**
 * The TiDB VECTOR column type (mysql.TypeTiDBVectorFloat32) through the
 * generic codec matrix, and the round-11 pruning / claim-check options:
 * `only-output-updated-columns`, `delete-only-output-handle-key-columns`,
 * `claim-check-raw-value` — reference fixtures from canal_entry_test.go,
 * dml_test.go, large_message.go and common/config.go.
 */
class VectorCodecSpec extends SparkSpec {
  import spark.implicits._

  // a 3-column table: handle key, a vector, a plain int
  private val specs = Seq(
    ColumnSpec("id", "bigint", nullable = false, isHandle = true),
    ColumnSpec("emb", "vector(5)"),
    ColumnSpec("qty", "int"))

  /** One-row envelope frame: op U with before/after images. */
  private def envelope(aEmb: Option[Seq[Float]], bEmb: Option[Seq[Float]],
                       aQty: Option[Int] = Some(2), bQty: Option[Int] = Some(1),
                       op: String = "U") =
    Seq((op, 100L, 99L, "db", "t", 7L, 7L, aEmb, bEmb, aQty, bQty))
      .toDF("op", "commit_ts", "start_ts", "schema_name", "table_name",
        "a_id", "b_id", "a_emb", "b_emb", "a_qty", "b_qty")

  test("vector type surfaces match the reference") {
    val s = ColumnSpec("v", "vector(5)")
    assert(s.base === "vector")
    assert(s.sparkType === ArrayType(FloatType))
    assert(MySqlTypes.javaSqlType(s) === 12) // VARCHAR, java.go:146
    assert(MySqlTypes.mysqlTypeCode(s) === 225) // TypeTiDBVectorFloat32
    assert(MySqlTypes.connectField(s).contains(
      "\"name\":\"io.debezium.data.TiDBVectorFloat32\"")) // codec.go:456-459
    assert(DdlParser.mysqlToSpark("vector(4)") === ArrayType(FloatType))
  }

  test("vector String() form matches the reference fixtures") {
    // canal_entry_test.go:106 expects "[1,2,3,4,5]"; dml_test.go:265 parses
    // "[1.0,-2,0.33,-4.4,55]" (1.0 renders back as 1); mysql_test.go:214
    // "[1.1,-2,3.33,-4.12,-5]" — shortest round-trip float32, no exponent.
    val df = Seq(
      (1L, Seq(1f, 2f, 3f, 4f, 5f)),
      (2L, Seq(1.0f, -2f, 0.33f, -4.4f, 55f)),
      (3L, Seq(1.1f, -2f, 3.33f, -4.12f, -5f))).toDF("k", "v")
    val got = df.orderBy("k")
      .select(MySqlTypes.canalValue(ColumnSpec("v", "vector(5)"), col("v")))
      .as[String].collect().toSeq
    assert(got === Seq(
      "[1,2,3,4,5]",
      "[1,-2,0.33,-4.4,55]",
      "[1.1,-2,3.33,-4.12,-5]"))
  }

  test("vector encode∘decode = id through canal-JSON") {
    val vec = Seq(12.25f, -0.5f, 7f, 99.75f, 0.25f)
    val df = envelope(Some(vec), Some(vec.map(_ + 1f)))
    val msg = df.select(GenericCodecs.canalJson(specs).as("m"))
    val sch = new StructType().add("data",
      ArrayType(new StructType().add("emb", StringType)))
    val back = msg.select(from_json(col("m"), sch).getField("data")
        .getItem(0).getField("emb").as("s"))
      .select(transform(split(regexp_replace(col("s"), "^\\[|\\]$", ""), ","),
        x => x.cast("float")).as("v"))
    assert(back.as[Seq[Float]].head() === vec)
  }

  test("vector kernel: SQL surface + parse round-trip + malformed → NULL") {
    // the codegen'd kernel is registered for SQL text too
    val sql = spark.sql(
      "SELECT graft_vec_string(array(CAST(1.5 AS FLOAT), CAST(-2 AS FLOAT)))")
      .as[String].head()
    assert(sql === "[1.5,-2]")
    val back = spark.sql("SELECT graft_vec_parse('[1.5,-2]')")
      .as[Seq[Float]].head()
    assert(back === Seq(1.5f, -2f))
    // malformed inputs surface NULL like a failed ParseVectorFloat32
    val bad = spark.sql(
      "SELECT graft_vec_parse('nope'), graft_vec_parse('[1,x]'), graft_vec_parse('[]')")
      .as[(Option[Seq[Float]], Option[Seq[Float]], Option[Seq[Float]])].head()
    assert(bad === ((None, None, Some(Seq.empty[Float]))))
    // randomized render∘parse = id over the full float32 plain band
    val rnd = new scala.util.Random(31L)
    val vecs = Seq.fill(200)(Seq.fill(4)(
      (rnd.nextInt(2000001) - 1000000) / 1000f))
    val df = vecs.zipWithIndex.map(_.swap).toDF("i", "v")
    val rt = df.select(graft.functions.VectorCodec.vecFromString(
        graft.functions.VectorCodec.vecToString(col("v"))).as("r"),
      col("v"))
    assert(rt.filter(!(col("r") <=> col("v"))).count() === 0L)
  }

  test("render never uses exponent notation; non-finite raises / parses NULL") {
    // Go FormatFloat(v,'f',-1,32) is exponent-free at every magnitude;
    // Java switches to sci notation at |v| >= 1e7 or < 1e-3 — expanded
    def render(v: Float): String = Seq(Seq(v)).toDF("v")
      .select(graft.functions.VectorCodec.vecToString(col("v")))
      .as[String].head()
    assert(render(1e10f) === "[10000000000]")
    assert(render(-2.5e8f) === "[-250000000]")
    assert(render(1.2345678e-5f) === "[0.000012345678]")
    assert(render(1e-7f) === "[0.0000001]")
    assert(render(9.999999e6f) === "[9999999]")
    // TiDB ParseVectorFloat32 rejects NaN/Inf: render raises (wrapped or
    // not, depending on whether the plan constant-folds), parse → NULL
    for (v <- Seq(Float.NaN, Float.PositiveInfinity)) {
      val e = intercept[Exception] { render(v) }
      def chain(t: Throwable): Seq[Throwable] =
        t +: Option(t.getCause).toSeq.flatMap(chain)
      assert(chain(e).exists(_.getMessage != null) &&
        chain(e).exists(t => Option(t.getMessage).exists(
          _.contains("non-finite vector element"))), e.toString)
    }
    val bad = spark.sql(
      "SELECT graft_vec_parse('[NaN]'), graft_vec_parse('[Infinity]')")
      .as[(Option[Seq[Float]], Option[Seq[Float]])].head()
    assert(bad === ((None, None)))
  }

  // ---- only-output-updated-columns ------------------------------------

  test("only-output-updated-columns emits exactly the changed old columns") {
    // qty changed, emb unchanged, id unchanged → old carries only qty
    val df = envelope(Some(Seq(1f, 2f)), Some(Seq(1f, 2f)),
      aQty = Some(2), bQty = Some(1))
    val msg = df.select(GenericCodecs.canalJsonWith(specs,
      CodecOpts(onlyOutputUpdatedColumns = true)).as("m")).as[String].head()
    assert(msg.contains("\"old\":[{\"qty\":\"1\"}]"), msg)
    // data stays full
    assert(msg.contains("\"data\":[{\"id\":\"7\",\"emb\":\"[1,2]\",\"qty\":\"2\"}]"), msg)
  }

  test("null-safe equality: NULL→NULL vectors prune, NULL→value emits") {
    // emb: null → null is EQUAL (IsColumnValueEqual, encoder.go:77-78);
    // qty: null → 2 differs, old carries explicit null
    val df = envelope(None, None, aQty = Some(2), bQty = None)
    val msg = df.select(GenericCodecs.canalJsonWith(specs,
      CodecOpts(onlyOutputUpdatedColumns = true)).as("m")).as[String].head()
    assert(msg.contains("\"old\":[{\"qty\":null}]"), msg)
  }

  test("delete-only-output-handle-key-columns restricts data AND type maps") {
    val df = envelope(None, Some(Seq(1f)), aQty = None, bQty = Some(3), op = "D")
    val msg = df.select(GenericCodecs.canalJsonWith(specs,
      CodecOpts(deleteOnlyHandleKeyColumns = true)).as("m")).as[String].head()
    assert(msg.contains("\"data\":[{\"id\":\"7\"}]"), msg)
    // sqlType/mysqlType maps restrict too (encoder :172)
    assert(msg.contains("\"mysqlType\":{\"id\":\"bigint\"}"), msg)
    assert(!msg.contains("emb"), msg)
  }

  test("open protocol p block prunes unchanged columns, u stays full") {
    val df = envelope(Some(Seq(1f, 2f)), Some(Seq(1f, 2f)),
      aQty = Some(2), bQty = Some(1))
    val msg = df.select(GenericCodecs.openProtocolValueWith(specs,
      CodecOpts(onlyOutputUpdatedColumns = true, openOutputOldValue = true))
      .as("m")).as[String].head()
    // p carries only qty; u carries all three columns
    assert(msg.contains("\"p\":{\"qty\":{\"t\":3,\"f\":64,\"v\":1}}"), msg)
    assert(msg.contains("\"u\":{\"id\":") && msg.contains("\"emb\":"), msg)
  }

  test("randomized: emitted old set equals the reference fold (200 rows)") {
    // seeded random images with NULL-dense columns; expected emitted set
    // computed by an independent Scala fold of IsColumnValueEqual
    val rnd = new scala.util.Random(1107L)
    def optVec(): Option[Seq[Float]] =
      if (rnd.nextInt(4) == 0) None
      else Some(Seq.fill(2)(rnd.nextInt(8) / 4.0f))
    def optQty(): Option[Int] =
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(3))
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, optVec(), optVec(), optQty(), optQty())
    }
    val expected = rows.map { case (id, aV, bV, aQ, bQ) =>
      val changed = Seq(
        // id equal on both sides by construction — never emitted
        if (aV != bV) Some("emb") else None,
        if (aQ != bQ) Some("qty") else None).flatten
      id -> changed.sorted.mkString(",")
    }.toMap
    val df = rows.map { case (id, aV, bV, aQ, bQ) =>
      ("U", 100L, 99L, "db", "t", id, id, aV, bV, aQ, bQ)
    }.toDF("op", "commit_ts", "start_ts", "schema_name", "table_name",
      "a_id", "b_id", "a_emb", "b_emb", "a_qty", "b_qty")
    val msg = GenericCodecs.canalJsonWith(specs,
      CodecOpts(onlyOutputUpdatedColumns = true))
    val sch = new StructType().add("old",
      ArrayType(MapType(StringType, StringType)))
    val got = df.select(col("a_id"),
        array_join(array_sort(map_keys(
          element_at(from_json(msg, sch).getField("old"), 1))), ",").as("ks"))
      .as[(Long, String)].collect().toMap
    assert(got === expected)
  }

  test("config combination rules reject like the reference") {
    // config.go:265-268
    intercept[IllegalArgumentException] {
      CodecOpts.validate(CodecOpts(deleteOnlyHandleKeyColumns = true),
        "canal-json", forceReplicate = true)
    }
    // sink.go:787-790
    intercept[IllegalArgumentException] {
      CodecOpts.validate(CodecOpts(deleteOnlyHandleKeyColumns = true), "csv")
    }
    // config.go:270-274: content-compatible implies only-output-updated
    assert(CodecOpts.contentCompatible(CodecOpts()).onlyOutputUpdatedColumns)
  }

  // ---- claim-check-raw-value ------------------------------------------

  test("LargeMessageHandle validation matches large_message.go:47-92") {
    val cc = LargeMessageHandle("claim-check", claimCheckStorageUri = "file:///cc")
    cc.validate("canal-json") // fine
    cc.validate("open") // fine without raw value
    intercept[IllegalArgumentException] { // :84-87 raw value + open
      cc.copy(claimCheckRawValue = true).validate("open")
    }
    cc.copy(claimCheckRawValue = true).validate("simple") // decoder.go:174
    intercept[IllegalArgumentException] { // URI required
      LargeMessageHandle("claim-check").validate("open")
    }
    intercept[IllegalArgumentException] { // canal-json needs tidb extension
      cc.validate("canal-json", enableTiDBExtension = false)
    }
    intercept[IllegalArgumentException] { // unsupported protocol
      LargeMessageHandle("handle-key-only").validate("avro")
    }
    intercept[IllegalArgumentException] { // unknown option
      LargeMessageHandle("bogus").validate("open")
    }
    intercept[IllegalArgumentException] { // unsupported compression
      LargeMessageHandle("none", compression = "zstd9").validate("open")
    }
  }

  test("claim-check raw mode stores the full message verbatim; wrapped wraps") {
    val df = envelope(Some(Seq(1.5f, 2f)), Some(Seq(0.25f, 1f)))
    val full = df.select(GenericCodecs.canalJsonClaimCheck(specs, Int.MaxValue,
      LargeMessageHandle("claim-check", claimCheckStorageUri = "cc"))._1.as("m"))
      .as[String].head()

    val raw = GenericCodecs.canalJsonClaimCheck(specs, maxBytes = 10,
      LargeMessageHandle("claim-check", claimCheckStorageUri = "cc",
        claimCheckRawValue = true))
    val (rMsg, rLoc, rPay) = raw
    val r = df.select(rMsg.as("msg"), rLoc.as("loc"), rPay.as("pay"))
      .as[(String, String, String)].head()
    // raw side-file = the full message bytes, byte-identical
    assert(r._3 === full)
    // in-stream replacement: handle-only data + claimCheckLocation
    assert(r._1.contains("\"data\":[{\"id\":\"7\"}]"), r._1)
    assert(r._1.contains("\"claimCheckLocation\":\"" + r._2 + "\""), r._1)
    assert(r._2.startsWith("cc/") && r._2.endsWith(".json"))

    val (_, _, wPay) = GenericCodecs.canalJsonClaimCheck(specs, maxBytes = 10,
      LargeMessageHandle("claim-check", claimCheckStorageUri = "cc"))
    val w = df.select(wPay.as("pay")).as[String].head()
    // wrapped ClaimCheckMessage: nil key, base64 value → unwraps to full
    assert(w.startsWith("{\"key\":null,\"value\":\""))
    val b64 = w.stripPrefix("{\"key\":null,\"value\":\"").stripSuffix("\"}")
    assert(new String(java.util.Base64.getDecoder.decode(b64), "UTF-8") === full)

    // below threshold: message = full, no side payload
    val (iMsg, iLoc, iPay) = GenericCodecs.canalJsonClaimCheck(specs,
      Int.MaxValue, LargeMessageHandle("claim-check", claimCheckStorageUri = "cc"))
    val i = df.select(iMsg.as("m"), iLoc.as("l"), iPay.as("p"))
      .as[(String, Option[String], Option[String])].head()
    assert(i._1 === full && i._2.isEmpty && i._3.isEmpty)
  }
}
