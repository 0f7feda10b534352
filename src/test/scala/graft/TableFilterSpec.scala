package graft

import org.apache.spark.sql.functions._

import graft.operators.Filters
import graft.operators.Filters.TableRule

/** Full table-filter matcher syntax (reference tidb-tools table-filter):
  * wildcards, character classes, negated classes, textual `!` rules,
  * last-match-wins ordering. */
class TableFilterSpec extends SparkSpec {
  import spark.implicits._

  private def keep(rules: Seq[TableRule],
                   tables: Seq[(String, String)]): Set[(String, String)] = {
    val df = tables.toDF("schema_name", "table_name")
    Filters.tableFilter(df, rules).as[(String, String)].collect().toSet
  }

  private val tables = Seq(
    ("shop", "orders"), ("shop", "orders_2024"), ("shop", "t1"),
    ("shard01", "t1"), ("shard02", "t2"), ("logs", "audit"))

  test("character classes and negated classes") {
    assert(keep(Filters.parseRules(Seq("shard[0-9][0-9].t[12]")), tables) ===
      Set(("shard01", "t1"), ("shard02", "t2")))
    assert(keep(Filters.parseRules(Seq("[!s]*.*")), tables) ===
      Set(("logs", "audit")))
  }

  test("textual rules: last match wins, ! excludes, schema-only form") {
    val rules = Filters.parseRules(Seq("*.*", "!shop.orders*", "shop.orders_2024"))
    assert(keep(rules, tables) ===
      tables.toSet - (("shop", "orders")))
    // schema-only rule means all its tables
    assert(keep(Filters.parseRules(Seq("logs")), tables) === Set(("logs", "audit")))
  }

  test("wildcards ? and * and literal specials") {
    assert(keep(Filters.parseRules(Seq("shard0?.*")), tables) ===
      Set(("shard01", "t1"), ("shard02", "t2")))
    // a dot in the table pattern is literal, not regex-any
    assert(keep(Seq(TableRule("a.b", "c", allow = true)),
      Seq(("a.b", "c"), ("axb", "c"))) === Set(("a.b", "c")))
  }

  test("unclosed bracket is treated literally") {
    assert(Filters.wildcardToRegex("a[b") === "^a\\[b$")
  }
}
