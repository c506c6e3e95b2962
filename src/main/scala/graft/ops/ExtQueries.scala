package graft.ops

/** Training-data-pipeline operator catalog (SURVEY §2.9 E1-E5 + builder
  * mandate): dedup, near-dup, similarity search, text analysis, multimodal.
  * Oracle SQL is generated from the same Scala constants where DuckDB can
  * express the math; LSH/simhash variants are engine-verified (hash
  * functions differ across engines) and get rows-only driver checks.
  */
object ExtQueries {
  val queries: Map[String, Q] =
    ExtQueriesPart1.queries ++ ExtQueriesPart2.queries ++ ExtQueriesPart3.queries ++
      ExtQueriesPart4.queries ++ ExtQueriesPart5.queries ++ ExtQueriesPart6.queries ++
      ExtQueriesPart7.queries ++ ExtQueriesPart8.queries

  lazy val oracle: Map[String, String] =
    ExtQueriesPart1.oracle ++ ExtQueriesPart2.oracle ++ ExtQueriesPart3.oracle ++
      ExtQueriesPart4.oracle ++ ExtQueriesPart5.oracle ++ ExtQueriesPart6.oracle ++
      ExtQueriesPart7.oracle ++ ExtQueriesPart8.oracle

  /** query → family for the bench artifact's per-family rollup; the Part
    * objects are ops-private, so the composition lives here. */
  lazy val families: Map[String, String] = {
    def tag(m: Map[String, Q], f: String): Iterable[(String, String)] =
      m.keys.map(_ -> f)
    (tag(ExtQueriesPart1.queries, "ext_dedup_ann_mm") ++
      tag(ExtQueriesPart2.queries, "ext_stats_privacy") ++
      tag(ExtQueriesPart3.queries, "ext_distribution") ++
      tag(ExtQueriesPart4.queries, "ext_sampling_product") ++
      tag(ExtQueriesPart5.queries, "ext_corpus_qa") ++
      tag(ExtQueriesPart6.queries, "ext_placement_sketch") ++
      tag(ExtQueriesPart7.queries, "ext_geometry_sprt") ++
      tag(ExtQueriesPart8.queries, "ext_training_ops")).toMap
  }
}
