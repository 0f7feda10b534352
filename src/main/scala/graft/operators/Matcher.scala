package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * 2PC prewrite×commit matcher (SURVEY.md §2.1 S2 / §2.10 J1; reference
 * cdc/kv/matcher.go:27-135). TiKV emits the row VALUE at prewrite time and
 * the COMMIT TS separately at commit time; a rollback cancels the prewrite.
 * The matcher pairs them per (start_ts, key) and emits a complete row event
 * only on commit.
 *
 * Batch form: equi-join prewrites to commits + anti-join rollbacks — two
 * shuffles on (start_ts, key), fully distributed. Streaming form: keyed
 * state that buffers an unmatched prewrite (or an early-arriving commit,
 * which the reference also tolerates — matcher.go matchRow).
 */
object Matcher {

  final case class TwoPcEvent(kind: String, // "P" | "C" | "R"
                              start_ts: Long, key: Long,
                              value: Option[Double], commit_ts: Option[Long])

  final case class MatchedRow(start_ts: Long, key: Long, value: Double,
                              commit_ts: Long)

  /** Batch matcher: committed prewrites minus rollbacks. */
  def matchBatch(events: DataFrame): DataFrame = {
    val pre = events.filter(col("kind") === "P")
      .select(col("start_ts"), col("key"), col("value"))
    val com = events.filter(col("kind") === "C")
      .select(col("start_ts"), col("key"), col("commit_ts"))
    val rb = events.filter(col("kind") === "R")
      .select(col("start_ts"), col("key"))
    pre.join(com, Seq("start_ts", "key"))
      .join(rb, Seq("start_ts", "key"), "left_anti")
  }

  /** Streaming matcher: state holds the half that arrived first; emits on
    * completion; rollback clears state (reference rollbackRow). */
  def matchStream(spark: SparkSession,
                  events: Dataset[TwoPcEvent]): Dataset[MatchedRow] = {
    import spark.implicits._
    events.groupByKey(e => (e.start_ts, e.key))
      .flatMapGroupsWithState[TwoPcEvent, MatchedRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case ((startTs, key), evs, state) =>
          var pre = state.getOption.filter(_.kind == "P")
          var com = state.getOption.filter(_.kind == "C")
          var rolledBack = false
          val out = collection.mutable.ArrayBuffer.empty[MatchedRow]
          evs.foreach { e =>
            e.kind match {
              case "P" => pre = Some(e)
              case "C" => com = Some(e)
              case "R" => rolledBack = true; pre = None; com = None
            }
            (pre, com) match {
              case (Some(p), Some(c)) if !rolledBack =>
                out += MatchedRow(startTs, key, p.value.get, c.commit_ts.get)
                pre = None; com = None
                state.remove()
              case _ =>
            }
          }
          if (rolledBack) state.remove()
          else pre.orElse(com) match {
            case Some(half) => state.update(half)
            case None => if (out.isEmpty) state.remove()
          }
          out.iterator
      }
  }

  /** Online-DDL ghost-table handling (SURVEY.md §2.12 G4; reference
    * dm/syncer/online-ddl-tools/online_ddl.go): gh-ost/pt-osc create
    * `_t_gho`-style shadow tables whose DML must be ignored, and whose
    * final RENAME maps the ghost back to the real table. */
  val GhostPatterns = Seq("_(.+)_gho", "_(.+)_ghc", "_(.+)_del", // gh-ost
    "_(.+)_new", "_(.+)_old") // pt-osc

  def ghostKind(table: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GhostPatterns.foldLeft(lit("real")) { (acc, p) =>
      when(table.rlike("^" + p + "$"),
        p.split('_').last.replaceAll("[^a-z]", "")).otherwise(acc)
    }

  /** Real table behind a ghost name ("_users_gho" → "users"). */
  def ghostToReal(table: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GhostPatterns.foldLeft(table) { (acc, p) =>
      when(table.rlike("^" + p + "$"),
        regexp_extract(table, "^" + p + "$", 1)).otherwise(acc)
    }
}
