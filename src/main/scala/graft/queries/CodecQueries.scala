package graft.queries

/** Codec gate queries (SURVEY.md §2.7) — populated in the codec wave. */
object CodecQueries {
  def all: Seq[GateQuery] = Seq.empty
}
