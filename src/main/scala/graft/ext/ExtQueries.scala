package graft.ext

import graft.QuerySpec

/** [EXT] LLM-data-pipeline operators (dedup, similarity search, text
  * analysis, multimodal) — registry. Populated module by module. */
object ExtQueries {
  def all: Seq[QuerySpec] = Seq.empty
}
