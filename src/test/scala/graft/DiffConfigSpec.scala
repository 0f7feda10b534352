package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.diff.DiffConfig
import graft.diff.DiffConfig.Security

/** sync_diff data-source config: the TLS `security` block and driver
  * param derivation (sync_diff_inspector/config/config.go:106-218). */
class DiffConfigSpec extends AnyFunSuite {

  test("empty security block registers no TLS") {
    assert(Security().register().isEmpty)
  }

  test("populated security mints a stable sync-diff-inspector name") {
    val s = Security(caPath = "/certs/ca.pem",
      certPath = "/certs/c.pem", keyPath = "/certs/k.pem")
    val n = s.register().get
    assert(n.startsWith("sync-diff-inspector-"))
    assert(s.register().get === n) // deterministic, replay-idempotent
    assert(Security(caBytes = "PEM").register().get !== n)
  }

  test("path/bytes conflicts and unpaired cert/key reject") {
    intercept[IllegalArgumentException] {
      Security(caPath = "/ca.pem", caBytes = "PEM").register()
    }
    intercept[IllegalArgumentException] {
      Security(certPath = "/c.pem", certBytes = "PEM",
        keyPath = "/k.pem").register()
    }
    intercept[IllegalArgumentException] { // cert without key
      Security(certPath = "/c.pem").register()
    }
    intercept[IllegalArgumentException] { // key without cert
      Security(keyBytes = "PEM").register()
    }
  }

  test("driver params mirror ToDriverConfig") {
    // fixed charset + unified UTC tz; concrete snapshot becomes
    // tidb_snapshot; "auto"/"AUTO" does not (IsAutoSnapshot :142-145)
    val p = DiffConfig.driverParams(snapshot = "2024-01-01 00:00:00")
    assert(p("charset") === "utf8mb4")
    assert(p("time_zone") === "'+00:00'")
    assert(p("tidb_snapshot") === "2024-01-01 00:00:00")
    assert(!DiffConfig.driverParams(snapshot = "AUTO").contains("tidb_snapshot"))
    assert(DiffConfig.isAutoSnapshot("Auto"))

    // session overrides: strings SQL-quoted with '' doubling, others raw
    val s = DiffConfig.driverParams(sessionConfig =
      Seq("sql_mode" -> "ANSI'QUOTES", "max_execution_time" -> 300))
    assert(s("sql_mode") === "'ANSI''QUOTES'")
    assert(s("max_execution_time") === "300")

    // populated security adds the registered tls name
    val t = DiffConfig.driverParams(security = Security(caBytes = "PEM"))
    assert(t("tls").startsWith("sync-diff-inspector-"))
  }
}
