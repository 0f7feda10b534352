package graft

/** Shared CDC event row for MemoryStream-driven streaming specs.
  * TOP-LEVEL on purpose: a case class declared inside a spec class body
  * defeats Spark's encoder codegen (the generated code can't call
  * `Outer$Ev.field()`), silently falling back to interpreted
  * UnsafeProjection and spamming `ERROR CodeGenerator` in the test log. */
case class StreamEv(seq: Long, op: String, commit_ts: Long, start_ts: Long,
                    source_id: Int, schema_name: String, table_name: String,
                    pk: Long, pk_after: Long, val_before: Option[Double],
                    val_after: Option[Double], etype: String)
