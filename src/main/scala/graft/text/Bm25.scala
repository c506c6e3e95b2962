package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 relevance ranking — the standard full-text scorer the
  * reference's Postgres side approximates with `ts_rank` (SURVEY §2.7 / F3;
  * `ts_rank` is TF·IDF-shaped, BM25 adds TF saturation and document-length
  * normalization — the default scorer in Lucene/Elasticsearch, and the
  * ranking a retrieval-quality training-data pipeline actually wants).
  *
  * Computed in ONE corpus pass with no explode and no per-document shuffle:
  *
  *   1. a map-only projection derives each document's lexeme multiset
  *      (words → stopword filter → Porter stem, all codegen'd — the
  *      NON-distinct twin of [[TextOps.tokenize]], since BM25 needs term
  *      FREQUENCY) and from it `dl` (doc length) plus one `tf` per query
  *      term via `size(filter(...))` — never materializing posting rows;
  *   2. one single-row global aggregate collects N, Σdl and per-term
  *      document frequencies (map-side partial, a few bytes per task);
  *   3. the stats row broadcasts back and scoring is again map-side.
  *
  * At 100 TB that is: one scan, one tiny all-reduce, one scan-free scoring
  * projection — the same partial+broadcast architecture as the HLL/CMS
  * sketch contracts. IDF uses the Lucene formulation
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` (never negative); per-term scores
  * are summed in fixed query order as a plain expression chain, not an
  * aggregation, so the float result is bit-deterministic and the DuckDB
  * oracle can replay it exactly.
  */
object Bm25 {
  /** Monotonic suffix source for per-call observe() metric names. */
  private val scanSeq = new java.util.concurrent.atomic.AtomicLong(0L)


  /** Non-distinct lexeme sequence: lowercase words, stopwords dropped,
    * Porter-stemmed — [[TextOps.tokenize]] without the dedupe/sort (term
    * frequency needs the multiset). Stopword removal uses the same list
    * the tokenizer and [[PostingIndex.buildPositional]] use; `isin` over
    * the literal list optimizes to a hash-set probe (OptimizeIn). */
  def lexemeSeq(textCol: Column): Column =
    graft.functions.PorterStemArrayExpr(
      filter(TextOps.words(textCol),
        w => !w.isin(TextOps.englishStopWords: _*)))

  /** Score every document containing at least one query term; returns
    * `(idCol, score)` with `score` rounded to 6 decimals (the q92 oracle
    * convention). `k1` (TF saturation) and `b` (length normalization)
    * default to the standard Robertson parameters. */
  def score(docs: DataFrame, idCol: String, textCol: Column,
            terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val stemmed = terms.map(t => Porter.stem(t.toLowerCase))
    // pass 1 (map-only): materialize the stemmed lexeme array ONCE in its
    // own projection, then derive dl and every per-term tf from the column.
    // Codegen subexpression elimination does NOT apply here — Spark's CSE
    // (EquivalentExpressions) skips lambda-bearing higher-order functions —
    // so without the explicit materialization every size(filter(...)) would
    // re-stem the document. The observe() barrier below is load-bearing for
    // the same reason: predicate pushdown would otherwise substitute the
    // match filter through this projection and re-evaluate the stem
    // expression per term inside the scan's data filter. CollectMetrics is
    // not predicate-transparent, so the filter runs against the materialized
    // array — and the metric itself is the corpus-scan progress counter the
    // pipeline monitor (X2) reads for free.
    // stable prefix (the monitor matches on it) + per-call suffix: Spark
    // rejects duplicate CollectMetrics names at analysis time, so two
    // Bm25.score calls in one plan (union / self-join of scored sets)
    // would otherwise fail to analyze
    val metricName = s"bm25_corpus_scan_${Bm25.scanSeq.incrementAndGet()}"
    val withLex = docs.select(col(idCol), lexemeSeq(textCol).as("lexemes"))
      .observe(metricName, count(lit(1)).as("docs_scanned"))
    val lx = col("lexemes")
    val tfCols = stemmed.zipWithIndex.map { case (t, i) =>
      size(filter(lx, x => x === lit(t))).cast("long").as(s"tf$i")
    }
    val base = withLex.select(col(idCol) +: size(lx).cast("long").as("dl") +: tfCols: _*)
    // pass 2: single-row corpus stats (partial-agg map-side, bytes moved)
    val dfCols = stemmed.indices.map(i =>
      count_if(col(s"tf$i") > 0).as(s"df$i"))
    val stats = base.agg(count(lit(1)).as("n"),
      sum(col("dl")).as("sumdl") +: dfCols: _*)
    // pass 3: broadcast the stats row, score map-side in fixed term order
    val n = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / n
    val perTerm = stemmed.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val dfT = col(s"df$i").cast("double")
      val idf = log(lit(1.0) + (n - dfT + lit(0.5)) / (dfT + lit(0.5)))
      val sat = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
      when(col(s"tf$i") > 0, idf * sat).otherwise(lit(0.0))
    }
    base.crossJoin(broadcast(stats))
      .filter(stemmed.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col(idCol), round(perTerm.reduce(_ + _), 6).as("score"))
  }
}
