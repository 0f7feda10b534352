package graft

import java.nio.file.{Files, Paths}
import java.util.Base64

import org.apache.spark.sql.functions._

import graft.core.CdcStream
import graft.operators.Codecs
import graft.streaming.ClaimCheckSink

/** Claim-check side-write: the payload object lands at its claim-check
  * location, wraps the ORIGINAL (key, full value) as base64, and the Kafka
  * record's key carries the same location — so a consumer can fetch and
  * reconstruct the exact bytes the inline path would have delivered. */
class ClaimCheckSpec extends SparkSpec {

  test("oversized messages side-write payloads that round-trip exactly") {
    val tmp = Files.createTempDirectory("graft_cc").toString
    val df = CdcStream.derive(spark, sf)
    val (key, value, loc, payload) =
      Codecs.openProtocolWithClaimCheck(df, maxBytes = 90, storagePrefix = tmp)
    val out = df.select(
      Codecs.openProtocolKey(df).as("plain_key"),
      Codecs.openProtocolValue(df).as("full_val"),
      key.as("key_msg"), value.as("val_msg"),
      loc.as("claim_loc"), payload.as("claim_payload"))

    val written = ClaimCheckSink.write(out)
    assert(written > 0)

    val claims = out.filter(col("claim_loc").isNotNull)
      .select("claim_loc", "plain_key", "full_val", "key_msg", "val_msg")
      .collect()
    assert(claims.length >= written) // dup content → same object, 1 file
    claims.take(50).foreach { r =>
      val (locP, plainKey, fullVal) = (r.getString(0), r.getString(1), r.getString(2))
      // the Kafka key carries the claim-check location
      assert(r.getString(3).contains(s""""ccl":"$locP""""))
      // the downgraded value dropped the payload columns
      assert(!r.getString(4).contains("\"val\""))
      // the stored object wraps the ORIGINAL key + full value, base64
      val body = new String(Files.readAllBytes(Paths.get(locP)), "UTF-8")
      val m = """\{"key":"([^"]+)","value":"([^"]+)"\}""".r
        .findFirstMatchIn(body).get
      assert(new String(Base64.getDecoder.decode(m.group(1)), "UTF-8") === plainKey)
      assert(new String(Base64.getDecoder.decode(m.group(2)), "UTF-8") === fullVal)
    }
    // idempotent replay: a second write overwrites the same objects
    val n1 = Files.walk(Paths.get(tmp)).filter(Files.isRegularFile(_)).count()
    ClaimCheckSink.write(out)
    val n2 = Files.walk(Paths.get(tmp)).filter(Files.isRegularFile(_)).count()
    assert(n1 === n2)
  }
}
