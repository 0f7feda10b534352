package graft.queries

/** Document pipeline gate queries (dedup/text analysis) — populated in the
  * training-data wave. */
object DocQueries {
  def all: Seq[GateQuery] = Seq.empty
}
