package graft.queries

import graft.{QueryDef, QueryPack}

/** Placeholder — filled by the LLM-pipeline operator task. */
object PipelineQueries extends QueryPack {
  override def queries: Seq[QueryDef] = Seq.empty
}
