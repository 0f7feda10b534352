package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{ApiServer, ChangefeedManager, Sinks}

/** L1 REST surface: the full lifecycle (create → status → pause → resume →
  * synced → delete) driven purely over HTTP against the route table of the
  * reference's OpenAPI v2 (cdc/api/v2/api.go). */
class ApiServerSpec extends SparkSpec {
  import spark.implicits._

  private val http = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  private def ev(seq: Long, pk: Long, v: Double): StreamEv =
    StreamEv(seq, "I", 100 + seq, 99 + seq, 0, "db", "t", pk, pk, None, Some(v), "e")

  private def get(base: String, path: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(base: String, path: String, body: String = ""): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def delete(base: String, path: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(base + path)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("full changefeed lifecycle over HTTP") {
    val dir = Files.createTempDirectory("graft_api").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEv]
    mem.addData(ev(1, 1, 10), ev(2, 2, 20))

    val srv = new ApiServer(spark, new ChangefeedManager(spark),
      Map("mem" -> (() => mem.toDF()))).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      assert(get(base, "/api/v2/health")._1 == 200)
      val (sc, sb) = get(base, "/api/v2/status")
      assert(sc == 200 && mapper.readTree(sb).get("is_owner").asBoolean())

      // empty list, then create
      assert(mapper.readTree(get(base, "/api/v2/changefeeds")._2)
        .get("total").asInt() == 0)
      val createBody =
        s"""{"changefeed_id":"cf-api","source":"mem",
           |"sink_uri":"state://$dir/state",
           |"checkpoint_dir":"$dir/ckpt"}""".stripMargin
      val (cc, cb) = post(base, "/api/v2/changefeeds", createBody)
      assert(cc == 200, cb)
      assert(Sinks.readState(spark, s"$dir/state").count() == 2)

      // validation errors
      assert(post(base, "/api/v2/changefeeds", createBody)._1 == 400) // dup id
      assert(post(base, "/api/v2/changefeeds",
        """{"changefeed_id":"x","source":"nope","sink_uri":"blackhole://",
          |"checkpoint_dir":"/tmp/x"}""".stripMargin)._1 == 400) // bad source
      assert(post(base, "/api/v2/changefeeds",
        """{"changefeed_id":"y","source":"mem","sink_uri":"ftp://z",
          |"checkpoint_dir":"/tmp/y"}""".stripMargin)._1 == 400) // bad scheme

      // list + get + status + synced
      val listed = mapper.readTree(get(base, "/api/v2/changefeeds")._2)
      assert(listed.get("total").asInt() == 1)
      assert(listed.get("items").get(0).get("state").asText() == "normal")
      assert(get(base, "/api/v2/changefeeds/cf-api")._1 == 200)
      assert(get(base, "/api/v2/changefeeds/nope")._1 == 404)
      assert(mapper.readTree(get(base, "/api/v2/changefeeds/cf-api/synced")._2)
        .get("synced").asBoolean())

      // pause → stopped; rows added while paused arrive after resume
      assert(post(base, "/api/v2/changefeeds/cf-api/pause")._1 == 200)
      assert(mapper.readTree(get(base, "/api/v2/changefeeds/cf-api")._2)
        .get("state").asText() == "stopped")
      mem.addData(ev(3, 3, 30))
      assert(post(base, "/api/v2/changefeeds/cf-api/resume")._1 == 200)
      val state = Sinks.readState(spark, s"$dir/state")
        .select("pk", "final_val").as[(Long, Double)].collect().toMap
      assert(state == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))

      // delete is idempotent
      assert(delete(base, "/api/v2/changefeeds/cf-api")._1 == 200)
      assert(mapper.readTree(get(base, "/api/v2/changefeeds")._2)
        .get("total").asInt() == 0)
      assert(delete(base, "/api/v2/changefeeds/cf-api")._1 == 200)
    } finally srv.stop()
  }

  test("verify_table: filter-selected tables split by handle-key eligibility") {
    // db.bad has a null-pk event (no handle key) → ineligible; db.skip is
    // filtered out entirely; db.t is eligible
    val df = Seq(
      ("db", "t", Option(1L)),
      ("db", "skip", Option(2L)),
      ("db", "bad", Option.empty[Long]))
      .toDF("schema_name", "table_name", "pk")
    val srv = new ApiServer(spark, new ChangefeedManager(spark),
      Map("mem" -> (() => df))).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      val (code, body) = post(base, "/api/v2/verify_table",
        """{"source":"mem","table_filter":["db.t","db.bad"]}""")
      assert(code == 200, body)
      val node = mapper.readTree(body)
      assert(node.get("eligible_tables").get(0).asText() == "db.t")
      assert(node.get("eligible_tables").size() == 1)
      assert(node.get("ineligible_tables").get(0).asText() == "db.bad")
      assert(post(base, "/api/v2/verify_table", """{"source":"nope"}""")._1 == 400)
    } finally srv.stop()
  }

  test("create rejects ineligible tables unless force/ignore (validator.go:170)") {
    val dir = Files.createTempDirectory("graft_api_inel").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEv]
    // the STREAM carries rows for both tables (pk values present on the
    // wire); the INTROSPECTION snapshot declares db.bad handle-key-less
    mem.addData(ev(1, 1, 10),
      StreamEv(2, "I", 102, 101, 0, "db", "bad", 7, 7, None, Some(5.0), "e"))
    val snapshot = Seq(
      ("db", "t", Option(1L)), ("db", "bad", Option.empty[Long]))
      .toDF("schema_name", "table_name", "pk")
    val srv = new ApiServer(spark, new ChangefeedManager(spark),
      Map("mem" -> (() => mem.toDF()),
        "schema" -> (() => snapshot))).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    def body(extra: String) =
      s"""{"changefeed_id":"cf-inel","source":"mem","introspect":"schema",
         |"sink_uri":"state://$dir/state",
         |"checkpoint_dir":"$dir/ckpt"$extra}""".stripMargin
    try {
      // neither flag → ErrTableIneligible-style rejection naming the table
      val (c1, b1) = post(base, "/api/v2/changefeeds", body(""))
      assert(c1 == 400 && b1.contains("ErrTableIneligible") &&
        b1.contains("db.bad"), b1)
      // ignore_ineligible_table → creation proceeds; db.bad's stream rows
      // are excluded from scope by the appended block rule
      val (c2, b2) = post(base, "/api/v2/changefeeds",
        body(""","ignore_ineligible_table":true"""))
      assert(c2 == 200, b2)
      val state = Sinks.readState(spark, s"$dir/state")
      assert(state.filter(org.apache.spark.sql.functions.col("table_name") === "bad").count() === 0L)
      assert(state.count() === 1L) // db.t flowed
    } finally srv.stop()
  }
}
