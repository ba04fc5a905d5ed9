package graft

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal) over `documents` / `embeddings` — filled in
  * by graft.ops. See SURVEY.md §7.2 item 9.
  */
private[graft] object QueriesPipeline {
  import SparkEntryRegistry.Q

  def registry: Seq[Q] = Seq.empty
}
