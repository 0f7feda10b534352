package graft.streaming

/**
 * DDL / checkpoint event dispatch to MQ sinks (reference
 * cdc/sink/ddlsink/mq/mq_ddl_sink.go + dispatcher/event_router.go:97-185):
 * where control events LAND in Kafka/Pulsar is wire-visible consumer
 * contract:
 *
 *  - dispatch rule (:44-51): canal / canal-json DDLs go to PARTITION 0 of
 *    their topic (the canal consumer contract); every other protocol
 *    BROADCASTS the DDL to all partitions of the topic;
 *  - topic (:97-115): a schema-level DDL (empty table name, judged on the
 *    PRE table info when present) goes to the DEFAULT topic; a table DDL
 *    routes through the topic dispatcher exactly like its rows;
 *  - checkpoint ts (:140-184): broadcast to every partition of every
 *    ACTIVE topic (first-appearance dedup over the current table set,
 *    event_router.go:165-185); with NO tables it broadcasts to the
 *    default topic (the old-behavior compatibility leg).
 */
object DdlDispatch {

  /** getDDLDispatchRule: "zero" (canal family) | "all". */
  def dispatchRule(protocol: String): String = protocol match {
    case "canal" | "canal-json" => "zero"
    case _ => "all"
  }

  /** GetTopicForDDL: the pre-table info wins when present; an empty table
    * name means a schema-level DDL → default topic. */
  def topicForDdl(preTable: Option[(String, String)],
      table: Option[(String, String)], defaultTopic: String,
      topicFor: (String, String) => String): String = {
    val chosen = preTable.orElse(table)
    chosen match {
      case Some((s, t)) if t.nonEmpty => topicFor(s, t)
      case _ => defaultTopic
    }
  }

  /** The emitted (topic, partition) messages for one DDL. */
  def ddlMessages(protocol: String, topic: String, partitionNum: Int)
      : Seq[(String, Int)] =
    if (dispatchRule(protocol) == "zero") Seq(topic -> 0)
    else (0 until partitionNum).map(topic -> _)

  /** GetActiveTopics: substituted topics in first-appearance order,
    * deduplicated. */
  def activeTopics(tables: Seq[(String, String)],
      topicFor: (String, String) => String): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    tables.foreach { case (s, t) => seen += topicFor(s, t) }
    seen.toSeq
  }

  /** WriteCheckpointTs's fan-out: every partition of every active topic;
    * the default topic when the table set is empty. */
  def checkpointMessages(tables: Seq[(String, String)], defaultTopic: String,
      topicFor: (String, String) => String, partitionNum: String => Int)
      : Seq[(String, Int)] = {
    val topics =
      if (tables.isEmpty) Seq(defaultTopic)
      else activeTopics(tables, topicFor)
    topics.flatMap(t => (0 until partitionNum(t)).map(t -> _))
  }
}
