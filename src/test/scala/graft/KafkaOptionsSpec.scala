package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.KafkaOptions
import graft.streaming.KafkaOptions._

/** The sink-URI half of the Kafka option surface (options.go:229-325,
  * 563-578; sarama.go:78-92): param parsing/validation, Go-duration
  * grammar, client-id minting, compression normalization. The
  * adjust/validate half is oracle-gated as q245. */
class KafkaOptionsSpec extends AnyFunSuite {

  test("fromUri parses hosts and the full param surface") {
    val uri = "kafka://h1:9092,h2:9092/topic?partition-num=6" +
      "&replication-factor=3&kafka-version=3.2.0&max-message-bytes=4194304" +
      "&max-retry=7&compression=LZ4&auto-create-topic=false" +
      "&dial-timeout=30s&write-timeout=1m30s&read-timeout=1.5s" +
      "&required-acks=1"
    val o = KafkaOptions.fromUri(uri).toOption.get
    assert(o.brokerEndpoints == Seq("h1:9092", "h2:9092"))
    assert(o.partitionNum == 6 && o.replicationFactor == 3)
    assert(o.version == "3.2.0" && o.isAssignedVersion)
    assert(o.maxMessageBytes == 4194304 && o.maxRetry == 7)
    assert(o.compression == "LZ4" && !o.autoCreate)
    assert(o.dialTimeoutMs == 30000L && o.writeTimeoutMs == 90000L &&
      o.readTimeoutMs == 1500L)
    assert(o.requiredAcks == WaitForLocal)
  }

  test("defaults match NewOptions when no params are given") {
    val o = KafkaOptions.fromUri("kafka://h1:9092/t").toOption.get
    assert(o.version == "2.4.0" && !o.isAssignedVersion)
    assert(o.maxMessageBytes == DefaultMaxMessageBytes)
    assert(o.replicationFactor == 1 && o.compression == "none")
    assert(o.requiredAcks == WaitForAll && o.maxRetry == 5)
    assert(o.autoCreate && o.partitionNum == 0)
    assert(o.dialTimeoutMs == 10000L)
  }

  test("partition-num must be positive; required-acks only -1/0/1") {
    assert(KafkaOptions.fromUri("kafka://h/t?partition-num=0") ==
      Left(ErrInvalidPartitionNum -> "invalid partition num 0"))
    assert(KafkaOptions.fromUri("kafka://h/t?partition-num=-3").isLeft)
    assert(KafkaOptions.fromUri("kafka://h/t?required-acks=2").swap
      .toOption.get._1 == ErrInvalidRequiredAcks)
    assert(KafkaOptions.fromUri("kafka://h/t?required-acks=-1").toOption
      .get.requiredAcks == WaitForAll)
    assert(KafkaOptions.fromUri("kafka://h/t?required-acks=0").toOption
      .get.requiredAcks == NoResponse)
  }

  test("negative max-retry is silently ignored (options.go:263-267)") {
    val o = KafkaOptions.fromUri("kafka://h/t?max-retry=-1").toOption.get
    assert(o.maxRetry == 5)
  }

  test("Go duration grammar: compound, fractional, sub-ms, invalid") {
    assert(parseGoDurationMs("2h45m") == Right((2 * 3600 + 45 * 60) * 1000L))
    assert(parseGoDurationMs("300ms") == Right(300L))
    assert(parseGoDurationMs("1.5h") == Right(5400000L))
    assert(parseGoDurationMs("500us") == Right(0L)) // floors below 1 ms
    assert(parseGoDurationMs("10").isLeft)  // bare number: invalid
    assert(parseGoDurationMs("s").isLeft)
    assert(parseGoDurationMs("10x").isLeft)
    val bad = KafkaOptions.fromUri("kafka://h/t?dial-timeout=10")
    assert(bad.swap.toOption.get._1 == ErrInvalidConfig)
  }

  test("client id: configured verbatim, minted sanitized, both validated") {
    // minted: address colon and any [?:,"] squash to _
    assert(KafkaOptions.clientId("10.0.0.1:8300", "default", "feed-1") ==
      Right("TiCDC_producer_10.0.0.1_8300_default_feed-1"))
    // configured id is NOT sanitized — invalid chars are an error
    assert(KafkaOptions.clientId("a", "ns", "x", "my:id") ==
      Left(ErrInvalidClientID -> "my:id"))
    assert(KafkaOptions.clientId("a", "ns", "x", "my.id_OK-2") ==
      Right("my.id_OK-2"))
    // minted id with a residual invalid char still fails validation
    assert(KafkaOptions.clientId("addr", "ns", "feed/slash").isLeft)
  }

  test("compression normalizes and degrades unknown to none with a warning") {
    assert(producerCompression(" GZIP ") == ("gzip", Nil))
    assert(producerCompression("zstd") == ("zstd", Nil))
    assert(producerCompression("brotli") ==
      ("none", Seq("unsupported-compression")))
  }

  test("setPartitionNum: adopt / warn-keep / exact / error") {
    val o = Options(partitionNum = 0)
    assert(KafkaOptions.setPartitionNum(o, 8).toOption.get.options
      .partitionNum == 8)
    val less = KafkaOptions.setPartitionNum(Options(partitionNum = 4), 8)
    assert(less.toOption.get.options.partitionNum == 4 &&
      less.toOption.get.warnings == Seq("partition-num-less-than-topic"))
    assert(KafkaOptions.setPartitionNum(Options(partitionNum = 8), 8)
      .toOption.get.warnings.isEmpty)
    assert(KafkaOptions.setPartitionNum(Options(partitionNum = 9), 8).swap
      .toOption.get._1 == ErrInvalidPartitionNum)
  }

  test("file config fills first, URI params override (mergeConfig order)") {
    // mergo.Merge(fileCfg, urlParams, WithOverride): apply the file block,
    // then the URI block on top — URI wins per-field, file fills the rest
    val file = Map("compression" -> "gzip", "max-message-bytes" -> "1000")
    val uri = Map("compression" -> "zstd", "partition-num" -> "4")
    val o = KafkaOptions.applyParams(Options(), file)
      .flatMap(KafkaOptions.applyParams(_, uri)).toOption.get
    assert(o.compression == "zstd")      // URI overrode
    assert(o.maxMessageBytes == 1000)    // file survived
    assert(o.partitionNum == 4)          // URI only
  }

  test("adjust caps mmb through the 128-byte overhead band") {
    val o = Options(maxMessageBytes = 1000, requiredAcks = 1,
      autoCreate = false)
    // topic cap below declared: warn + cap-128
    val a = KafkaOptions.adjust(o, TopicMeta(exists = true, numPartitions = 1,
      topicMaxMessageBytes = Some(900))).toOption.get
    assert(a.options.maxMessageBytes == 772 &&
      a.warnings.contains("topic-cap-below-declared"))
    // cap above declared but inside the overhead band: silent cap-128
    val b = KafkaOptions.adjust(o, TopicMeta(exists = true, numPartitions = 1,
      topicMaxMessageBytes = Some(1064))).toOption.get
    assert(b.options.maxMessageBytes == 936 && b.warnings.isEmpty)
    // ample cap: untouched
    val c = KafkaOptions.adjust(o, TopicMeta(exists = true, numPartitions = 1,
      topicMaxMessageBytes = Some(4000))).toOption.get
    assert(c.options.maxMessageBytes == 1000)
  }
}
