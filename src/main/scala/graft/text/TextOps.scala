package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.NfkdNormalize

/** The sec_dl text-sanitization + tokenization pipeline as composable
  * `Column => Column` transforms (SURVEY.md §2.6/§2.7; reference
  * `sec_dl/utils/scrape_all_filings.py:42-114` and the tsvector trigger at
  * `sec_dl/utils/init_tables.py:59-67`).
  *
  * Everything except Porter stemming is built from Spark SQL built-in
  * functions (regexp/translate/higher-order array ops) so the whole chain
  * stays inside whole-stage codegen — no UDF boundary in the hot path. NFKD
  * is a native Catalyst expression with codegen ([[NfkdNormalize]]).
  */
object TextOps {

  /** T1: lowercase (reference `response.content.lower()`, :157). */
  def lowerText(c: Column): Column = lower(c)

  /** Binary-attachment filename extensions dropped by the reference
    * (`scrape_all_filings.py:89-103`). */
  val binaryExtensions: Seq[String] =
    Seq("pdf", "gif", "jpg", "zip", "rar", "jpeg", "bmp", "xlsx", "xls", "css", "js")

  private val binarySectionPattern =
    s"<filename>[^<]*\\.(${binaryExtensions.mkString("|")})"

  /** T2+T3: SGML document segmentation + embedded-binary removal. Splits a
    * filing on `<document>` boundaries, drops sections whose `<filename>`
    * matches a binary extension (those are base64 payloads), rejoins.
    * Regex segmentation replaces BeautifulSoup — EDGAR SGML is predictable. */
  def dropBinarySections(c: Column): Column =
    array_join(
      filter(split(c, "<document>"), s => !s.rlike(binarySectionPattern)),
      " ")

  /** T4: Unicode NFKD normalization (native codegen expression). */
  def nfkd(c: Column): Column = NfkdNormalize(c)

  /** T5: HTML tag strip — `re.sub(r'<.+?>', ' ', s)` (:42-48). Same
    * non-greedy, non-DOTALL semantics as the reference. */
  def stripTags(c: Column): Column = regexp_replace(c, "<.+?>", " ")

  /** T6: control-char + Windows-1252 smart-quote + entity replacement
    * (:105-110): \n,\t → space; , → '"'; &#160;,&nbsp; → space. */
  def replaceEntities(c: Column): Column =
    regexp_replace(translate(c, "\n\t\u0093\u0094", "  \"\""), "&#160;|&nbsp;", " ")

  /** T7: drop words of length >= n (kills leftover base64/garbage tokens,
    * :57-65). Pure higher-order functions — codegen'd. */
  def dropLongWords(c: Column, n: Int = 20): Column =
    array_join(filter(split(c, " "), w => length(w) < n), " ")

  /** T8: whitespace collapse (`re.sub(r'\s+', ' ', s)`, :51-54) + trim. */
  def collapseWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The full filing sanitization chain in reference order
    * T1 → T2/T3 → T4 → T5 → T6 → T7 → T8 (`scrape_all_filings.py:157-160`,
    * body :83-114). One codegen'd expression tree per row. */
  def sanitizeFiling(c: Column): Column =
    collapseWhitespace(
      dropLongWords(
        replaceEntities(
          stripTags(
            nfkd(
              dropBinarySections(
                lowerText(c)))))))

  /** Sanitization without SGML segmentation — for plain-text corpora like
    * the `documents` table (and the DuckDB-expressible oracle twin). */
  def sanitizeText(c: Column): Column =
    collapseWhitespace(
      dropLongWords(
        replaceEntities(
          stripTags(
            lowerText(c)))))

  // ---------------------------------------------------------------- tokenize

  /** Default english stopword list (Spark MLlib's list, same role as the
    * Postgres english dictionary's stopwords). */
  lazy val englishStopWords: Seq[String] =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords("english").toSeq

  /** Word extraction: lowercase, split on non-alphanumeric runs, drop empties. */
  def words(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), w => length(w) > 0)

  /** Basic lexemes: sorted, deduped words — no stopwords/stemming. The
    * DuckDB-oracle-checkable half of tsvector. */
  def tokenizeBasic(c: Column): Column =
    array_sort(array_distinct(words(c)))

  /** Full tsvector analog (F1): words → stopword removal → Porter stem →
    * dedupe → sort. Matches `to_tsvector('english', text)` lexeme semantics
    * (positions dropped — SURVEY §2.7 allows this simplification). Every
    * stage is codegen'd — stopword removal via `array_except`, stemming via
    * the native [[graft.functions.PorterStemArrayExpr]] — so the whole
    * chain is one WholeStageCodegen span, no UDF boundary. */
  def tokenize(c: Column): Column =
    array_sort(
      array_distinct(
        graft.functions.PorterStemArrayExpr(
          array_except(words(c), lit(englishStopWords.toArray)))))

  /** Scalar Porter stem of a single word column — the element form of
    * [[graft.functions.PorterStemArrayExpr]] (wrap in a 1-element array,
    * stem, unwrap; every step codegen'd). */
  def stemWord(c: Column): Column =
    element_at(graft.functions.PorterStemArrayExpr(array(c)), 1)

  // ---------------------------------------------------------------- search

  /** F3: full-text match, AND-of-terms (`token @@ to_tsquery('a & b')`).
    * Terms are stemmed with the same stemmer the index side used. */
  def tsMatchAll(tokens: Column, terms: Seq[String]): Column =
    terms.map(t => array_contains(tokens, Porter.stem(t.toLowerCase)))
      .reduce(_ && _)

  /** F3: OR-of-terms (`to_tsquery('a | b')`) via arrays_overlap. */
  def tsMatchAny(tokens: Column, terms: Seq[String]): Column =
    arrays_overlap(tokens, lit(terms.map(t => Porter.stem(t.toLowerCase)).toArray))

  /** Unstemmed variants for the basic tokenizer. */
  def tsMatchAllBasic(tokens: Column, terms: Seq[String]): Column =
    terms.map(t => array_contains(tokens, t.toLowerCase)).reduce(_ && _)

  /** F3 full surface: `token @@ to_tsquery('a & !(b | c) | d:*')` as a
    * boolean Column over a [[tokenize]]d array — AND/OR/NOT/grouping/prefix
    * compile to built-in expressions (codegen'd, no UDF boundary):
    * exact terms via `array_contains`, prefix terms via a word-boundary
    * LIKE over `array_join` (tokens are [a-z0-9]+, so the space-delimited
    * join round-trips exactly and LIKE needs no escaping — and unlike
    * `exists(tokens, …)`, LIKE stays inside whole-stage codegen).
    *
    * Phrase (`<->`) is rejected here: a token ARRAY has no positions —
    * route phrase queries through `PostingIndex.searchQuery` over
    * [[PostingIndex.buildPositional]] postings instead. */
  def tsMatchQuery(tokens: Column, query: String): Column =
    compileMatch(tokens, TsQuery.parseStemmed(query))

  /** [[tsMatchQuery]] with `websearch_to_tsquery` input — same compiled
    * expression tree, friendlier syntax. Phrases (quoted, multi-word after
    * stopword removal) are rejected like `<->` is: arrays carry no
    * positions. */
  def tsMatchWebsearch(tokens: Column, input: String): Column =
    compileMatch(tokens, TsQuery.parseWebsearch(input))

  /** [[tsMatchQuery]] with `plainto_tsquery` input — every word ANDed,
    * stopwords and punctuation vanish; no operators and no phrases, so it
    * always compiles on a token ARRAY. */
  def tsMatchPlainto(tokens: Column, input: String): Column =
    compileMatch(tokens, TsQuery.parsePlainto(input))

  /** Simplified `ts_headline` — the snippet next to each search hit: find
    * the FIRST word whose stem is one of the query's positive lexemes and
    * emit the raw words from `before` ahead of it to `after` past it, every
    * stem-matched word in the window wrapped in `<b></b>`. One fused pass
    * per row (split, stem, scan — the per-word Porter stem is the cost the
    * tokenize side already pays); docs with no match yield null. Postgres
    * ts_headline's cover-selection heuristics are richer; this pins the
    * deterministic core (first cover, fixed window) so it can be
    * oracle-checked cross-engine. */
  def tsHeadline(text: Column, query: String, before: Int = 2, after: Int = 5): Column = {
    val lex = TsQuery.positiveLexemes(TsQuery.parseStemmed(query)).toSet
    require(lex.nonEmpty, "ts_headline: query has no positive lexemes to highlight")
    require(before >= 0 && after >= 0, s"window must be non-negative: $before/$after")
    val f = udf { (t: String) =>
      if (t == null) null
      else {
        val ws = t.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        val stems = ws.map(Porter.stem)
        val p = stems.indexWhere(lex.contains)
        if (p < 0) null
        else {
          val lo = math.max(0, p - before)
          val hi = math.min(ws.length - 1, p + after)
          (lo to hi).map(i =>
            if (lex.contains(stems(i))) "<b>" + ws(i) + "</b>" else ws(i))
            .mkString(" ")
        }
      }
    }
    f(text)
  }

  private def compileMatch(tokens: Column, q: TsQuery): Column = q match {
    case TsQuery.Term(l, false) => array_contains(tokens, l)
    case TsQuery.Term(l, true) =>
      // escape LIKE metacharacters the lexer admits in lexemes: a literal
      // `_` must not act as a single-char wildcard (startsWith semantics,
      // matching the posting path)
      val esc = l.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      concat(lit(" "), array_join(tokens, " "), lit(" ")).like(s"% $esc%")
    case TsQuery.Not(x)  => !compileMatch(tokens, x)
    case TsQuery.And(qs) => qs.map(compileMatch(tokens, _)).reduce(_ && _)
    case TsQuery.Or(qs)  => qs.map(compileMatch(tokens, _)).reduce(_ || _)
    case TsQuery.Phrase(_, _) => throw new IllegalArgumentException(
      "tsquery: <-> needs positional postings — use PostingIndex.searchQuery over buildPositional")
  }
}
