package graft

import org.apache.spark.sql.functions._

import graft.operators.Routing

/** Topic-expression semantics: placeholder substitution, forbidden-char
  * sanitization, length truncation, '.'/'..' replacement, validation. */
class TopicExprSpec extends SparkSpec {
  import spark.implicits._

  private def subst(expr: String, schema: String, table: String): String =
    Seq((schema, table)).toDF("target_schema", "target_table")
      .select(Routing.topicFromExpression(expr).as("t"))
      .head().getString(0)

  test("placeholder substitution with sanitization") {
    assert(subst("cdc_{schema}_{table}", "shop", "orders") === "cdc_shop_orders")
    assert(subst("{schema}", "we ird$db", "x") === "we_ird_db")
    assert(subst("pre-{table}.log", "s", "a/b") === "pre-a_b.log")
    // expression with no placeholders is a hard-coded topic
    assert(subst("fixed-topic", "s", "t") === "fixed-topic")
  }

  test("length cap and dot-name replacement") {
    val long = subst("{schema}_{table}", "a" * 200, "b" * 200)
    assert(long.length === Routing.KafkaTopicMaxLength)
    assert(subst("{schema}", ".", "t") === "_")
    assert(subst("{schema}{table}", ".", ".") === "__")
  }

  test("expression validation") {
    assert(Routing.validateTopicExpression("p_{schema}_{table}_s"))
    assert(Routing.validateTopicExpression("hardcoded.topic-1"))
    assert(!Routing.validateTopicExpression("bad space_{schema}"))
    assert(!Routing.validateTopicExpression("{table}_{schema}")) // wrong order
    assert(Routing.validateTopicExpressionForAvro("{schema}_{table}"))
    assert(!Routing.validateTopicExpressionForAvro("only_{table}"))
  }

  test("invalid expression is rejected at build time") {
    intercept[IllegalArgumentException] {
      Routing.topicFromExpression("sp ace{schema}")
    }
  }

  private def pulsar(expr: String, schema: String, table: String): String =
    Seq((schema, table)).toDF("target_schema", "target_table")
      .select(Routing.pulsarTopic(expr).as("t"))
      .head().getString(0)

  test("pulsar topics: short names expand, full URLs substitute, no 249 cap") {
    assert(pulsar("cdc_{schema}_{table}", "shop", "orders")
      === "persistent://public/default/cdc_shop_orders")
    assert(pulsar("persistent://t1/ns/{schema}.{table}", "s", "a/b")
      === "persistent://t1/ns/s.a_b")
    // pulsar has no Kafka-style length truncation
    assert(pulsar("{schema}_{table}", "a" * 200, "b" * 200).length
      === "persistent://public/default/_".length + 400)
    intercept[IllegalArgumentException] {
      Routing.pulsarTopic("tenant/only-two/{schema}/parts{table}")
    }
  }
}
