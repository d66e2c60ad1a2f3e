package graft
/** Embedding/similarity inventory (placeholder — filled in next milestone). */
object VectorQueries { def defs: Seq[QueryDef] = Seq() }
