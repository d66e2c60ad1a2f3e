package graft
/** Multimodal-column inventory (placeholder — filled in next milestone). */
object MultimodalQueries { def defs: Seq[QueryDef] = Seq() }
