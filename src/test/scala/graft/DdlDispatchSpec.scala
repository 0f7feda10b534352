package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DdlDispatch

/** DDL/checkpoint MQ dispatch corners the data-anchored gate can't reach:
  * the empty-table checkpoint leg, dedup order, and pre-table priority. */
class DdlDispatchSpec extends AnyFunSuite {

  private val topicFor = (s: String, t: String) => s"$s.$t"

  test("canal family pins partition 0; everything else broadcasts") {
    assert(DdlDispatch.ddlMessages("canal-json", "t", 5) == Seq("t" -> 0))
    assert(DdlDispatch.ddlMessages("canal", "t", 5) == Seq("t" -> 0))
    assert(DdlDispatch.ddlMessages("open-protocol", "t", 3) ==
      Seq("t" -> 0, "t" -> 1, "t" -> 2))
    assert(DdlDispatch.ddlMessages("avro", "t", 2) == Seq("t" -> 0, "t" -> 1))
  }

  test("schema-level DDL goes to the default topic; PRE table info wins") {
    assert(DdlDispatch.topicForDdl(None, Some(("db", "")), "dft", topicFor)
      == "dft")
    assert(DdlDispatch.topicForDdl(None, Some(("db", "t")), "dft", topicFor)
      == "db.t")
    // RENAME-style events judge on the PRE table info when present
    assert(DdlDispatch.topicForDdl(Some(("db", "old")), Some(("db", "new")),
      "dft", topicFor) == "db.old")
    assert(DdlDispatch.topicForDdl(Some(("db", "")), Some(("db", "new")),
      "dft", topicFor) == "dft")
  }

  test("active topics dedup in first-appearance order") {
    val tables = Seq(("a", "x"), ("b", "y"), ("a", "x"), ("c", "z"),
      ("b", "y"))
    assert(DdlDispatch.activeTopics(tables, topicFor) ==
      Seq("a.x", "b.y", "c.z"))
  }

  test("checkpoint fan-out: per-topic partitions; default topic when idle") {
    val msgs = DdlDispatch.checkpointMessages(Seq(("a", "x"), ("b", "y")),
      "dft", topicFor, t => if (t == "a.x") 2 else 1)
    assert(msgs == Seq("a.x" -> 0, "a.x" -> 1, "b.y" -> 0))
    // the no-tables compatibility leg broadcasts to the default topic
    assert(DdlDispatch.checkpointMessages(Nil, "dft", topicFor, _ => 2) ==
      Seq("dft" -> 0, "dft" -> 1))
  }
}
