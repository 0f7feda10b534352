package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Claim-check external-storage writer (reference
 * pkg/sink/kafka/claimcheck/claim_check.go WriteMessage): each oversized
 * message's wrapped payload lands as its own object at its claim-check
 * location. The write runs on the EXECUTORS (foreachPartition), one small
 * object per oversized row — no driver collect, so the path scales with
 * cluster size; object stores take the same shape via their Hadoop
 * connectors.
 *
 * Content-addressed names (see Codecs.openProtocolWithClaimCheck) make the
 * write idempotent: a replayed batch overwrites identical objects.
 */
object ClaimCheckSink {

  /** Write every non-null (location, payload) row; returns rows written. */
  def write(df: DataFrame, locCol: String = "claim_loc",
            payloadCol: String = "claim_payload"): Long = {
    import df.sparkSession.implicits._
    val claims = df.select(col(locCol), col(payloadCol))
      .filter(col(locCol).isNotNull)
      .as[(String, String)]
    claims.foreachPartition { it: Iterator[(String, String)] =>
      it.foreach { case (path, body) =>
        val p = Paths.get(path)
        val parent = p.getParent
        if (parent != null) Files.createDirectories(parent)
        Files.write(p, body.getBytes(StandardCharsets.UTF_8))
      }
    }
    claims.count()
  }
}
