package graft
/** Text-analysis inventory (placeholder — filled in next milestone). */
object TextQueries { def defs: Seq[QueryDef] = Seq() }
