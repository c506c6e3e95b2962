package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY §2.9 E5 +
  * builder mandate): language-ID heuristic, quality scoring, token-count
  * estimation, document fingerprinting. All pure expressions (codegen'd),
  * all integer/exact arithmetic so DuckDB oracles hash-match.
  */
object TextAnalysis {

  /** Stopword-overlap language scorer: full stopword list per language from
    * Spark MLlib — same constants are interpolated into the oracle SQL by
    * ExtQueries so engine and oracle cannot drift. */
  lazy val langMarkers: Seq[(String, Seq[String])] = {
    import org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords
    Seq("english" -> "en", "german" -> "de", "french" -> "fr", "spanish" -> "es")
      .map { case (l, code) => code -> loadDefaultStopWords(l).toSeq }
  }

  def words(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9']+"), w => length(w) > 0)

  /** Count of distinct words that appear in a marker list. */
  def markerHits(ws: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(ws), lit(markers.toArray))).cast("long")

  /** Predicted language: argmax of marker hits with fixed precedence
    * en > de > fr > es; 'und' when nothing matches. Deterministic. */
  def languageId(text: Column): Column = {
    val ws = words(text)
    val scores = langMarkers.map { case (code, m) => code -> markerHits(ws, m) }
    val Seq(en, de, fr, es) = scores.map(_._2)
    when(en > 0 && en >= de && en >= fr && en >= es, "en")
      .when(de > 0 && de >= fr && de >= es, "de")
      .when(fr > 0 && fr >= es, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Quality metrics: word/unique counts, stopword count, unique ratio, and
    * a boolean gate — the length/punct/stopword-ratio family of filters used
    * to score web-scraped training text. */
  def qualityColumns(text: Column): Seq[Column] = {
    val ws = words(text)
    val nWords = size(ws).cast("long")
    val nUniq = size(array_distinct(ws)).cast("long")
    val nStop = markerHits(ws, langMarkers.collectFirst { case ("en", m) => m }.get)
    val uniqRatio = when(nWords > 0, nUniq.cast("double") / nWords.cast("double"))
      .otherwise(lit(0.0))
    Seq(
      nWords.as("n_words"),
      nUniq.as("n_uniq"),
      nStop.as("n_stop"),
      uniqRatio.as("uniq_ratio"),
      (nWords >= 5 && nWords <= 10000 && uniqRatio > 0.1).as("quality_ok"))
  }

  /** Whitespace + BPE-ish token-count estimate: one token per word-piece of
    * ≤4 chars (ceil(len/4) pieces per word) — the standard chars/4 LLM
    * heuristic, computed exactly in integers. */
  def estTokens(text: Column): Column =
    coalesce(
      aggregate(words(text), lit(0L), (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long")),
      lit(0L)).as("est_tokens")

  /** Rolling polynomial fingerprint (mod 1e9+7) over the first 64 chars —
    * identical integer arithmetic is expressible in DuckDB, so this hash is
    * oracle-checkable cross-engine (unlike xxhash64/sha variants). */
  def fingerprint(text: Column, prefixLen: Int = 64): Column = {
    val prefix = substring(text, 1, prefixLen)
    val codes = transform(split(prefix, ""), ch => ascii(ch).cast("long"))
    when(length(prefix) > 0,
      aggregate(codes, lit(0L), (acc, c) => (acc * 31L + c) % 1000000007L))
      .otherwise(lit(0L))
  }
}
