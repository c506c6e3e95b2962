package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog is assembled from per-module maps; every query has a matching
  * DuckDB oracle unless the operator is non-SQL-expressible (sampling, LSH,
  * hash functions that DuckDB lacks), in which case the driver records a
  * rows-only check.
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the SURVEY §7.3 end-to-end slice — sanitize → tokenize → full-text
    * match → aggregate, exercising schema/io/text/ops in one DAG. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    io.Tables.documents(spark, d)
      .select($"doc_id", $"lang", text.TextOps.tokenize(text.TextOps.sanitizeText($"text")).as("tokens"))
      .filter(text.TextOps.tsMatchAll($"tokens", Seq("spark", "join")))
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.TextQueries.queries ++
      ops.ExtQueries.queries ++ ops.IoQueries.queries ++
      ops.StreamQueries.queries

  /** query → family, for the per-family rollup Bench embeds in its JSON
    * artifact (`families` key). The single s/q scalar under-represents the
    * engine as the catalog mix shifts toward streaming/index-write work;
    * grouping by defining module keeps the 2× baseline gate meaningful at
    * any mix. Source of truth is the registry composition itself, so a new
    * query is classified the moment it is registered. */
  def families: Map[String, String] = {
    def tag(m: Map[String, _], f: String): Iterable[(String, String)] =
      m.keys.map(_ -> f)
    (tag(ops.Relational.queries, "relational") ++
      tag(ops.IoQueries.queries, "io_jdbc") ++
      tag(ops.TextQueries.queries, "text_index") ++
      tag(ops.StreamQueries.queries, "streaming")).toMap ++
      ops.ExtQueries.families
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.TextQueries.oracle ++
      ops.ExtQueries.oracle ++ ops.IoQueries.oracle ++
      ops.StreamQueries.oracle
}
