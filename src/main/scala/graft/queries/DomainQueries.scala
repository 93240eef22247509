package graft.queries

import graft.{QueryDef, QueryPack}

/** Placeholder — filled by the domain (routing/geo/io) task. */
object DomainQueries extends QueryPack {
  override def queries: Seq[QueryDef] = Seq.empty
}
