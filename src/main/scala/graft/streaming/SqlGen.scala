package graft.streaming

import org.apache.spark.sql.Row

/**
 * Multi-row SQL generation (SURVEY.md §2.6 C3; reference
 * pkg/sqlmodel/multirow.go:79-274 GenInsertSQL/GenUpdateSQL/GenDeleteSQL,
 * caps pkg/sink/mysql/config.go:44-49). Runs inside foreachPartition on the
 * executor — pure string building over an iterator, no driver involvement.
 *
 * Net-op mapping: I → multi-VALUES INSERT, U → multi-VALUES REPLACE
 * (idempotent update), R → REPLACE (safe-mode pair), D → DELETE pk IN (...).
 */
object SqlGen {

  val DefaultMaxTxnRow = 256

  private def sqlLit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: java.lang.Double => d.toString
    case x => x.toString
  }

  private def table(r: Row): String =
    s"`${r.getString(r.fieldIndex("schema_name"))}`.`${r.getString(r.fieldIndex("table_name"))}`"

  /** Generate bounded multi-row statements for one partition's ordered
    * net-effect rows. Rows must arrive sorted (commit_ts, pk); grouping
    * only coalesces ADJACENT same-(table, verb) runs so apply order is
    * preserved exactly (same contract as the reference's
    * genDMLsWithSameOp, dm/syncer/dml.go:514). */
  def generate(rows: Iterator[Row], maxTxnRow: Int = DefaultMaxTxnRow): Seq[String] = {
    val out = Vector.newBuilder[String]
    var curKey: (String, String) = null
    val buf = collection.mutable.ArrayBuffer.empty[Row]

    def verb(r: Row): String = r.getString(r.fieldIndex("net_op")) match {
      case "I" => "INSERT"
      case "D" => "DELETE"
      case _ => "REPLACE" // U and R both apply as idempotent REPLACE
    }

    def flush(): Unit = if (buf.nonEmpty) {
      val t = table(buf.head)
      curKey._2 match {
        case "DELETE" =>
          val keys = buf.map(r => sqlLit(r.get(r.fieldIndex("pk")))).mkString(", ")
          out += s"DELETE FROM $t WHERE `pk` IN ($keys);"
        case v =>
          val values = buf.map { r =>
            val pk = sqlLit(r.get(r.fieldIndex("pk")))
            val fv = sqlLit(r.get(r.fieldIndex("final_val")))
            s"($pk, $fv)"
          }.mkString(", ")
          out += s"$v INTO $t (`pk`, `final_val`) VALUES $values;"
      }
      buf.clear()
    }

    rows.foreach { r =>
      val key = (table(r), verb(r))
      if (key != curKey || buf.size >= maxTxnRow) { flush(); curKey = key }
      buf += r
    }
    flush()
    out.result()
  }

  /**
   * Multi-row UPDATE in the reference's CASE-WHEN form (GenUpdateSQL,
   * pkg/sqlmodel/multirow.go:109; cap defaultMaxMultiUpdateRowCount=40):
   * one statement updates many keys via per-column CASE chains. Used when
   * the target lacks REPLACE or when preserving untouched columns matters.
   */
  def genMultiUpdate(table: String, keyCol: String, valueCol: String,
                     rows: Seq[(Any, Any)], maxRows: Int = 40): Seq[String] =
    rows.grouped(maxRows).map { group =>
      val cases = group.map { case (k, v) =>
        s"WHEN ${sqlLit(k)} THEN ${sqlLit(v)}"
      }.mkString(" ")
      val keys = group.map(r => sqlLit(r._1)).mkString(", ")
      s"UPDATE $table SET `$valueCol` = CASE `$keyCol` $cases END " +
        s"WHERE `$keyCol` IN ($keys);"
    }.toSeq
}
