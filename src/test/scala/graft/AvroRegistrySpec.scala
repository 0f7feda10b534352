package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{AvroSchemaRegistry, GlueSchemaRegistry}

/** Registry semantics (reference schema_manager.go contract): monotone
  * global ids, per-subject versions, idempotent registration, lookup by
  * (subject, version) / latest / wire id, and file-backed persistence. */
class AvroRegistrySpec extends AnyFunSuite {

  private val s1 = """{"type":"record","name":"t","fields":[{"name":"pk","type":"long"}]}"""
  private val s2 = """{"type":"record","name":"t","fields":[{"name":"pk","type":"long"},{"name":"c2","type":["null","string"]}]}"""

  test("ids are global and versions per-subject; registration is idempotent") {
    val reg = new AvroSchemaRegistry()
    val a1 = reg.register("a-value", s1)
    val a2 = reg.register("a-value", s2)
    val b1 = reg.register("b-value", s1)
    assert((a1.id, a1.version) == (1, 1))
    assert((a2.id, a2.version) == (2, 2))
    assert((b1.id, b1.version) == (3, 1))
    // re-registering an existing (subject, schema) returns the original
    assert(reg.register("a-value", s1) == a1)
    assert(reg.latest("a-value").contains(a2))
    assert(reg.lookup("a-value", 1).contains(a1))
    assert(reg.byId(3).contains(b1))
  }

  test("registrations survive a restart via the file backing") {
    val dir = Files.createTempDirectory("graft_avro_reg").toString
    val reg = new AvroSchemaRegistry(Some(dir))
    val r1 = reg.register("t-value", s1)
    val r2 = reg.register("t-value", s2)
    val reopened = new AvroSchemaRegistry(Some(dir))
    assert(reopened.lookup("t-value", 1).contains(r1))
    assert(reopened.latest("t-value").contains(r2))
    // new registrations continue the id sequence, never reuse
    assert(reopened.register("u-value", s1).id == r2.id + 1)
  }

  test("glue: per-schema version chain with UUID version ids, idempotent") {
    val reg = new GlueSchemaRegistry("test-registry")
    val v1 = reg.register("db.t", s1)
    val v2 = reg.register("db.t", s2)
    val o1 = reg.register("db.other", s1)
    assert(v1.versionNumber == 1 && v2.versionNumber == 2)
    assert(o1.versionNumber == 1) // versions are per-schema, not global
    // every version gets a distinct UUID; same definition in another
    // schema gets its own UUID too (ids are version identities, not
    // content hashes shared across schemas)
    assert(Set(v1.versionId, v2.versionId, o1.versionId).size == 3)
    // idempotent: re-registering an existing definition returns it
    assert(reg.register("db.t", s1) == v1)
    assert(reg.byId(v2.versionId).contains(v2))
    assert(reg.latest("db.t").contains(v2))
    assert(reg.lookup("db.t", 1).contains(v1))
  }

  test("glue: registrations survive a restart and UUIDs are stable") {
    val dir = Files.createTempDirectory("graft_glue_reg").toString
    val reg = new GlueSchemaRegistry("r1", Some(dir))
    val v1 = reg.register("db.t", s1)
    val reopened = new GlueSchemaRegistry("r1", Some(dir))
    assert(reopened.byId(v1.versionId).contains(v1))
    assert(reopened.register("db.t", s1) == v1)
    // a different registry name yields different version ids for the
    // same schema (Glue ids are scoped to the registry)
    val other = new GlueSchemaRegistry("r2")
    assert(other.register("db.t", s1).versionId != v1.versionId)
  }
}
