package graft.queries

/** Embedding similarity gate queries — populated in the training-data wave. */
object EmbeddingQueries {
  def all: Seq[GateQuery] = Seq.empty
}
