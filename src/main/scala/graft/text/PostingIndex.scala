package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F2 at scale: the GIN-inverted-index equivalent as an exploded posting
  * table (SURVEY §2.7 F2 scale path; reference `init_tables.py:56-57`).
  *
  * The array-predicate form of full-text match (`TextOps.tsMatchAll`) scans
  * every document per query — fine for one-off scans, wrong for repeated
  * search at 100 TB. The posting table inverts once: `(lexeme, doc_id)`
  * rows, stored partitioned/bucketed BY LEXEME so a term lookup touches
  * only that term's partitions (the moral equivalent of walking one GIN
  * posting list), and search becomes a tiny filter + groupBy instead of a
  * corpus scan. AND-of-terms = "docs hit by all k distinct terms", one
  * shuffle on doc_id bounded by the posting lists' size, not the corpus.
  */
object PostingIndex {

  /** Build the posting table from a tokenized corpus. Tokens are already
    * distinct per doc (tokenize dedupes), so (lexeme, doc_id) is unique. */
  def build(docs: DataFrame, idCol: String, tokens: Column): DataFrame =
    docs.select(explode(tokens).as("lexeme"), col(idCol))

  /** Persist the index partitioned by a lexeme hash bucket — term lookups
    * prune to one partition; doc lists inside stay clustered per lexeme. */
  def write(postings: DataFrame, path: String, buckets: Int = 64): Unit =
    postings
      .withColumn("lexeme_bucket", pmod(hash(col("lexeme")), lit(buckets)))
      .write.mode("overwrite")
      .partitionBy("lexeme_bucket")
      .parquet(path)

  /** F3 AND-of-terms over the posting table (`token @@ to_tsquery('a & b')`).
    * Terms are stemmed with the same stemmer the index side used. */
  def searchAll(postings: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    val stemmed = terms.map(t => Porter.stem(t.toLowerCase)).distinct
    postings
      .filter(col("lexeme").isin(stemmed: _*))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit")) // postings unique per (lexeme, doc)
      .filter(col("n_hit") === stemmed.length)
      .select(col(idCol))
  }

  /** F3 OR-of-terms (`to_tsquery('a | b')`). */
  def searchAny(postings: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    val stemmed = terms.map(t => Porter.stem(t.toLowerCase)).distinct
    postings.filter(col("lexeme").isin(stemmed: _*))
      .select(col(idCol)).distinct()
  }

  /** AND-search against an index written by [[write]]: the query terms'
    * bucket ids are computed with the SAME hash the writer used (via a
    * one-row Spark job, so the two can't drift), and the scan filters on
    * `lexeme_bucket` FIRST — partition pruning reads only the matching
    * bucket directories, the on-disk analog of walking one GIN posting
    * list instead of the whole index. */
  def searchAllIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                       idCol: String, terms: Seq[String], buckets: Int = 64): DataFrame = {
    import spark.implicits._
    val stemmed = terms.map(t => Porter.stem(t.toLowerCase)).distinct
    val bucketIds = stemmed.toDF("lexeme")
      .select(pmod(hash(col("lexeme")), lit(buckets)).cast("int").as("b"))
      .as[Int].collect().toSeq.distinct
    // bucket-prune the scan, then delegate — ONE implementation of the
    // AND semantics, so indexed and in-memory search can't drift
    searchAll(
      spark.read.parquet(indexPath)
        .filter(col("lexeme_bucket").isin(bucketIds: _*)), // partition-pruned
      idCol, terms)
  }
}
