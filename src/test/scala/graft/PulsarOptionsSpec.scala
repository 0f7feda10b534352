package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.PulsarOptions

/** pkg/sink/pulsar/config.go: sanity order, scheme gate, broker-URL
  * derivation, default fill. */
class PulsarOptionsSpec extends AnyFunSuite {

  test("checkSinkURI fires in order: scheme, host, path — before the scheme gate") {
    assert(PulsarOptions.fromUri("pulsar:///t") == Left("host is empty"))
    assert(PulsarOptions.fromUri("pulsar://h:6650") == Left("path is empty"))
    // a bad scheme with no host still reports the host first (Go order)
    assert(PulsarOptions.fromUri("kafka:///t") == Left("host is empty"))
    assert(PulsarOptions.fromUri("kafka://h/t") ==
      Left("invalid pulsar scheme kafka"))
  }

  test("broker url downgrades +http/+https, keeps pulsar schemes") {
    assert(PulsarOptions.fromUri("pulsar+http://h:8080/t")
      .toOption.get.brokerUrl == "http://h:8080")
    assert(PulsarOptions.fromUri("pulsar+https://h:8443/t")
      .toOption.get.brokerUrl == "https://h:8443")
    assert(PulsarOptions.fromUri("pulsar+ssl://h:6651/t")
      .toOption.get.brokerUrl == "pulsar+ssl://h:6651")
  }

  test("config block knobs survive, unset knobs fill from defaults") {
    val o = PulsarOptions.fromUri("pulsar://h:6650/t",
      Map("send-timeout" -> 60)).toOption.get
    assert(o.sendTimeoutSec == 60 && o.connectionTimeoutSec == 5 &&
      o.batchingMaxMessages == 1000 && o.batchingMaxPublishDelayMs == 10 &&
      o.operationTimeoutSec == 30)
    assert(o.topic == "t")
    // multi-segment topic path (tenant/namespace/topic) kept whole
    assert(PulsarOptions.fromUri("pulsar://h:6650/a/b/c")
      .toOption.get.topic == "a/b/c")
  }
}
