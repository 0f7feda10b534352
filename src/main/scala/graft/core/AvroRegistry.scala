package graft.core

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable

/**
 * E3 — Avro schema-registry abstraction (reference
 * pkg/sink/codec/avro/schema_manager.go: Register/Lookup against a
 * Confluent-compatible registry, caching (subject, version) → schema id).
 * No registry service exists in this environment, so the store is
 * in-memory with optional file backing — the SEMANTICS are the
 * registry's: globally unique monotone ids, per-subject monotone
 * versions, idempotent registration (re-registering a subject's existing
 * schema returns its original id/version, the Confluent contract), and
 * lookup by (subject, version), latest, or global id (the id embedded in
 * the wire frame by [[graft.functions.AvroBinary]]).
 *
 * Control-plane component: schemas are a handful of strings; every
 * executor-side use goes through the literal schema id folded into the
 * encode/decode expressions at plan time.
 */
final class AvroSchemaRegistry(persistDir: Option[String] = None) {

  final case class Registered(id: Int, subject: String, version: Int,
                              schema: String)

  private val entries = mutable.ArrayBuffer.empty[Registered]
  private var nextId = 1

  persistDir.foreach { d =>
    val p = Paths.get(d, "avro_registry.log")
    if (Files.exists(p)) {
      Files.readAllLines(p).forEach { line =>
        if (line.nonEmpty) {
          val Array(id, subject, version, schema) = line.split("\t", 4)
          entries += Registered(id.toInt, subject, version.toInt,
            java.net.URLDecoder.decode(schema, "UTF-8"))
          nextId = math.max(nextId, id.toInt + 1)
        }
      }
    }
  }

  private def append(r: Registered): Unit = persistDir.foreach { d =>
    Files.createDirectories(Paths.get(d))
    Files.writeString(Paths.get(d, "avro_registry.log"),
      s"${r.id}\t${r.subject}\t${r.version}\t" +
        java.net.URLEncoder.encode(r.schema, "UTF-8") + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Register a schema under a subject; idempotent on identical schema
    * text (returns the existing registration). */
  def register(subject: String, schema: String): Registered = synchronized {
    entries.find(e => e.subject == subject && e.schema == schema).getOrElse {
      val version = entries.filter(_.subject == subject)
        .map(_.version).maxOption.getOrElse(0) + 1
      val r = Registered(nextId, subject, version, schema)
      nextId += 1
      entries += r
      append(r)
      r
    }
  }

  def lookup(subject: String, version: Int): Option[Registered] =
    synchronized(entries.find(e => e.subject == subject && e.version == version))

  def latest(subject: String): Option[Registered] =
    synchronized(entries.filter(_.subject == subject)
      .sortBy(_.version).lastOption)

  def byId(id: Int): Option[Registered] =
    synchronized(entries.find(_.id == id))

  def subjects: Seq[String] = synchronized(entries.map(_.subject).distinct.toSeq)
}
