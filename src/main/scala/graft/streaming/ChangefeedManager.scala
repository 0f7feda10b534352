package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Changefeed lifecycle manager (SURVEY.md §2.14): the REST/CLI surface of
 * tiflow's owner (`cdc/api/v2/api.go` create/pause/resume/delete/list,
 * /status) mapped onto StreamingQuery management. Pause = stop the query
 * (checkpoint retains progress); resume = start again from the same
 * checkpoint; delete = stop + forget. HA/etcd state is Spark's checkpoint
 * store — a restarted driver re-`resume`s every spec it knows.
 */
final class ChangefeedManager(spark: SparkSession) {

  private final case class Entry(spec: ChangefeedSpec,
                                 source: () => DataFrame,
                                 sink: (DataFrame, Long) => Unit,
                                 var query: Option[StreamingQuery])

  private val feeds = collection.concurrent.TrieMap.empty[String, Entry]

  /** Create + start a changefeed. Fails if the id already exists. */
  def create(spec: ChangefeedSpec, source: () => DataFrame)
            (sink: (DataFrame, Long) => Unit): Unit = {
    require(!feeds.contains(spec.id), s"changefeed ${spec.id} already exists")
    val e = Entry(spec, source, sink, None)
    feeds.put(spec.id, e)
    resume(spec.id)
  }

  /** Pause: stop the running query; the checkpoint keeps the offset. */
  def pause(id: String): Unit =
    feeds.get(id).foreach { e =>
      e.query.foreach { q => q.stop(); q.awaitTermination() }
      e.query = None
    }

  /** Resume from checkpoint (no-op if already running). */
  def resume(id: String): Unit =
    feeds.get(id).foreach { e =>
      if (!e.query.exists(_.isActive)) {
        val q = Changefeed.start(spark, e.source(), e.spec)(e.sink)
        q.awaitTermination() // AvailableNow triggers drain-and-stop
        e.query = Some(q)
      }
    }

  /** Replace a paused changefeed's source thunk (error-handling surfaces:
    * DM's handle-error swaps in a skip/replace-wrapped source, then resume
    * rebuilds the query from it; the checkpoint is untouched, so already-
    * committed batches never replay). */
  def swapSource(id: String, source: () => DataFrame): Unit =
    feeds.get(id).foreach { e =>
      require(!e.query.exists(_.isActive), s"changefeed $id must be paused")
      feeds.put(id, e.copy(source = source))
      ()
    }

  /** Delete: stop and forget (checkpoint dir is the caller's to clean). */
  def delete(id: String): Unit = {
    pause(id)
    feeds.remove(id)
    ()
  }

  def list(): Seq[String] = feeds.keys.toSeq.sorted

  /** /status analog. */
  def status(id: String): Map[String, Any] =
    feeds.get(id) match {
      case None => Map("id" -> id, "state" -> "not-found")
      case Some(e) => e.query match {
        case Some(q) => Changefeed.status(q) + ("state" -> "created")
        case None => Map("id" -> id, "state" -> "paused")
      }
    }
}
