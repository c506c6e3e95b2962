package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY §2.9 E5 +
  * builder mandate): language-ID heuristic, quality scoring, token-count
  * estimation, document fingerprinting. All integer/exact arithmetic so
  * DuckDB oracles hash-match.
  *
  * Each scorer has a Column form (composable) and a fused single-pass UDF
  * (`*Fast`) used by the catalog operators: the Column forms rebuild a
  * multi-hundred-word marker hash set per language PER ROW inside
  * interpreted `array_intersect`/`aggregate` calls, while the fused pass
  * probes precomputed sets — same outputs, ~50× cheaper per row.
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

  /** The 8 required stopwords of Gopher rule 7 (Rae et al. 2021 §A1.1.2):
    * a document must contain at least 2 of these to pass. Interpolated into
    * the q147 oracle so engine and SQL cannot drift. */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-filter signals (Rae et al. 2021, appendix A1.1 — the
    * rule set MassiveWeb used before dedup, reused by RefinedWeb/Dolma):
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio
    * (# and "..."), bullet-started and ellipsis-ended line fractions,
    * alphabetic-word fraction, and the required-stopword count.
    *
    * All signals are emitted as exact INTEGER numerators/denominators and
    * every threshold is applied as cross-multiplied integer comparisons
    * (`mean len in [3,10]` ⟺ `3·n ≤ Σlen ≤ 10·n`), so the keep decision
    * involves zero floating point and the oracle replays it bit-exactly.
    * One codegen'd map-only projection — the 100 TB shape is a scan. */
  def gopherSignals(text: Column): Seq[Column] = {
    val ws = filter(split(text, "\\s+"), w => length(w) > 0)
    val nWords = size(ws).cast("long")
    val sumLen = coalesce(aggregate(ws, lit(0L), (a, w) => a + length(w)), lit(0L))
    val nSymbols = (length(text) - length(regexp_replace(text, "#", "")) +
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)).cast("long")
    val lines = filter(split(text, "\n"), l => length(l) > 0)
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val nEllLines = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("long")
    val nAlpha = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = markerHits(words(text), GopherStopWords)
    val rules = Seq(
      nWords >= 50 && nWords <= 100000,
      lit(3) * nWords <= sumLen && sumLen <= lit(10) * nWords,
      lit(10) * nSymbols <= nWords,
      lit(10) * nBullet <= lit(9) * nLines,
      lit(10) * nEllLines <= lit(3) * nLines,
      lit(5) * nAlpha >= lit(4) * nWords,
      nStop >= 2)
    // n_rules_passed keeps the output discriminative on corpora where one
    // rule is degenerate (the synthetic testdata never passes the required-
    // stopword rule, so bare `keep` would be constant false there)
    val nPassed = rules.map(_.cast("long")).reduce(_ + _)
    Seq(nWords.as("n_words"), sumLen.as("sum_word_len"), nSymbols.as("n_symbols"),
      nLines.as("n_lines"), nBullet.as("n_bullet"), nEllLines.as("n_ellipsis_lines"),
      nAlpha.as("n_alpha_words"), nStop.as("n_req_stop"),
      nPassed.as("n_rules_passed"), rules.reduce(_ && _).as("keep"))
  }

  /** Whitespace + BPE-ish token-count estimate: one token per word-piece of
    * ≤4 chars (ceil(len/4) pieces per word) — the standard chars/4 LLM
    * heuristic, computed exactly in integers. */
  def estTokens(text: Column): Column =
    coalesce(
      aggregate(words(text), lit(0L), (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long")),
      lit(0L)).as("est_tokens")

  /** STUPID-BACKOFF bigram LM scores (Brants et al., EMNLP 2007): train
    * bigram/unigram counts on the rows where `isTrainCol` is true, score
    * every other row's bigram occurrences — ln(C2(w1,w2)/U(w1)) when the
    * bigram was seen in training, else the backoff
    * ln(0.4·(U(w2)+1)/(N+V)) (add-1 unigram absorbs OOV w2) — floored to
    * integer MICRO-NATS per occurrence so the per-doc sums are order-free
    * longs. Rows with < 2 words produce no bigrams and are absent from
    * the output (the caller decides their fate).
    *
    * Movement: the bigram frame is cached — it is a NARROW (id, w1, w2)
    * projection consumed twice (train counts + scoring) — one count
    * shuffle each for C2 and U (both map-side combinable; N and V fold
    * from U, never a second token pass), one (w1, w2) join from scored
    * bigrams to C2 (vocabulary-sized, not corpus-sized), one per-id sum.
    *
    * Input `tok`: (idCol, wsCol array<string>, isTrainCol boolean).
    * Output: (idCol, n_bigrams, score_micronats) for non-train rows. */
  def backoffBigramScores(tok: DataFrame, idCol: String, wsCol: String,
                          isTrainCol: String): DataFrame = {
    val bigrams = tok
      .filter(size(col(wsCol)) >= 2)
      .select(col(idCol), col(isTrainCol), explode(expr(
        s"transform(sequence(0, size($wsCol) - 2), " +
          s"i -> struct($wsCol[i] AS w1, $wsCol[i+1] AS w2))")).as("b"))
      .select(col(idCol), col(isTrainCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .cache()
    val u = tok.filter(col(isTrainCol))
      .select(explode(col(wsCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .cache()
    val stats = u.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val c2 = bigrams.filter(col(isTrainCol))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    bigrams.filter(!col(isTrainCol))
      .join(c2, Seq("w1", "w2"), "left")
      .join(u.select(col("w").as("w1"), col("c").as("u1")), Seq("w1"), "left")
      .join(u.select(col("w").as("w2"), col("c").as("u2")), Seq("w2"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("sm",
        when(col("c2").isNotNull,
          floor(log(col("c2").cast("double") / col("u1").cast("double"))
            * lit(1000000.0)))
          .otherwise(floor(log(lit(0.4)
            * (coalesce(col("u2"), lit(0L)) + lit(1L)).cast("double")
            / (col("n") + col("v")).cast("double")) * lit(1000000.0)))
          .cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("sm")).as("score_micronats"))
  }

  // ---------------------------------------------------------- fused fast path

  private def wordsImpl(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9']+").filter(_.nonEmpty)

  private lazy val markerSets: Seq[(String, java.util.HashSet[String])] =
    langMarkers.map { case (code, ms) =>
      val set = new java.util.HashSet[String]()
      ms.foreach(set.add)
      code -> set
    }

  /** Fused [[languageId]]: identical argmax/precedence semantics, one pass
    * over the document's distinct words against precomputed marker sets. */
  val languageIdFast: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      val distinct = new java.util.HashSet[String]()
      wordsImpl(text).foreach(distinct.add)
      val hits = markerSets.map { case (code, set) =>
        var n = 0L
        val it = distinct.iterator()
        while (it.hasNext) if (set.contains(it.next())) n += 1
        code -> n
      }.toMap
      val (en, de, fr, es) = (hits("en"), hits("de"), hits("fr"), hits("es"))
      if (en > 0 && en >= de && en >= fr && en >= es) "en"
      else if (de > 0 && de >= fr && de >= es) "de"
      else if (fr > 0 && fr >= es) "fr"
      else if (es > 0) "es"
      else "und"
    }

  case class Quality(n_words: Long, n_uniq: Long, n_stop: Long,
                     uniq_ratio: Double, quality_ok: Boolean)

  /** Fused [[qualityColumns]] (select `.as("q")` then `q.*`). */
  val qualityFast: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      val ws = wordsImpl(text)
      val distinct = new java.util.HashSet[String]()
      ws.foreach(distinct.add)
      val en = markerSets.collectFirst { case ("en", s) => s }.get
      var nStop = 0L
      val it = distinct.iterator()
      while (it.hasNext) if (en.contains(it.next())) nStop += 1
      val nWords = ws.length.toLong
      val nUniq = distinct.size().toLong
      val ratio = if (nWords > 0) nUniq.toDouble / nWords.toDouble else 0.0
      Quality(nWords, nUniq, nStop, ratio,
        nWords >= 5 && nWords <= 10000 && ratio > 0.1)
    }

  /** Fused [[estTokens]]. */
  val estTokensFast: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      var n = 0L
      wordsImpl(text).foreach(w => n += (w.length + 3) / 4)
      n
    }

  /** Token-window chunking — the training-prep step that splits documents
    * into model-context-sized pieces. Chunks start every `stride` words and
    * span `size` words (overlap = size − stride; the final chunk may be
    * shorter, and a trailing chunk fully inside the previous one is kept —
    * both engines implement the same rule). Takes the raw TEXT column and
    * splits inside the UDF (the `[^a-z0-9]+` rule, `TextOps.words`' twin)
    * so the whole row is ONE JVM pass — feeding a higher-order `filter`
    * expression in would run interpreted per row, the repo's documented
    * hot-path trap. Empty word lists yield no chunks (the doc drops out of
    * a posexplode). */
  def chunkText(text: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0, s"size/stride must be positive: $size/$stride")
    val f = udf { (t: String) =>
      if (t == null) Seq.empty[String]
      else {
        val ws = t.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        if (ws.isEmpty) Seq.empty[String]
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var s = 0
          while (s < ws.length) {
            out += ws.slice(s, s + size).mkString(" ")
            s += stride
          }
          out.toSeq
        }
      }
    }
    f(text)
  }

  /** Sequence packing on top of [[chunkText]] — the training-prep consumer
    * of chunking: greedy bin-packing of each document's chunks (in chunk
    * order) into packs of at most `budgetWords` words. A new pack opens
    * when the next chunk would overflow the budget; a single chunk longer
    * than the budget sits alone in its own pack (never split, never
    * dropped — no chunk loss by construction). Returns one struct per
    * chunk `(chunk_id, pack_id, n_words)`, both ids 1-based.
    *
    * Map-only like the chunker itself: packing is per document, so it
    * needs NO groupBy — the greedy scan runs inside the same single JVM
    * pass that splits the words. Cross-document packing at scale is this
    * operator applied per partition after a cheap repartition — the same
    * greedy rule, deterministic under a content-stable sort key (e.g.
    * q96's md5 ordering). The greedy rule (`acc + w > budget` opens a
    * pack) is replicated exactly by the q101 oracle's recursive CTE. */
  def packChunks(text: Column, size: Int, stride: Int, budgetWords: Int): Column = {
    require(size > 0 && stride > 0 && budgetWords > 0,
      s"size/stride/budget must be positive: $size/$stride/$budgetWords")
    val f = udf { (t: String) =>
      if (t == null) Seq.empty[(Long, Long, Long)]
      else {
        val ws = t.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        if (ws.isEmpty) Seq.empty[(Long, Long, Long)]
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var s = 0; var chunkId = 1L; var packId = 1L; var acc = 0L
          while (s < ws.length) {
            val w = math.min(ws.length - s, size).toLong
            if (acc > 0 && acc + w > budgetWords) { packId += 1; acc = 0L }
            acc += w
            out += ((chunkId, packId, w))
            chunkId += 1; s += stride
          }
          out.toSeq
        }
      }
    }
    f(text).cast("array<struct<chunk_id:bigint,pack_id:bigint,n_words:bigint>>")
  }

  // ------------------------------------------------------------- PII scrub

  /** PII redaction patterns. Kept inside the common Java-regex / RE2 subset
    * (no lookaround, no backrefs) so the engine (Java `regexp_replace`) and
    * the DuckDB oracle (RE2) match the exact same spans. `\b` boundaries
    * keep a phone/IP from matching inside longer digit runs. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{2,3}-\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails, IPv4 addresses, and phone numbers (in that order: the
    * email pattern is scrubbed first because `\b` matches at `@`, so a
    * phone-shaped local part would otherwise leak a partial match; IP
    * before phone keeps dotted quads from being half-eaten). Map-only,
    * pure built-ins — stays inside WholeStageCodegen. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Occurrences of `pattern` in `c` (counted on the ORIGINAL text — the
    * audit column a redaction pipeline logs next to the scrubbed output). */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  // ----------------------------------------------------- repetition metrics

  /** Repetition-gate thresholds (the Gopher-rules family): chosen against
    * the testdata distribution so the gate actually splits the corpus
    * (dup-word p75 ≈ 0.64, p90 ≈ 0.68; top-bigram p95 ≈ 0.087, max 0.17)
    * rather than passing or failing everything. Shared with the q104
    * oracle SQL, so engine and oracle cannot drift. */
  val DupWordFracMax = 0.65
  val TopBigramFracMax = 0.10

  /** The top-bigram statistic is floored at 1/n_bigrams even for perfectly
    * clean text, so the gate only applies it once a document has enough
    * bigrams for the fraction to be meaningful (20 ⇒ the floor is 0.05,
    * well under the 0.10 threshold). Shorter docs pass the bigram leg
    * vacuously — short-doc quality is q51's length gate's job. */
  val MinBigramsForGate = 20L

  case class Repetition(n_words: Long, n_bigrams: Long, top_bigram_n: Long,
                        top_bigram_frac: Double, dup_word_frac: Double,
                        repetition_ok: Boolean)

  /** Gopher-style repetition metrics, one fused JVM pass per document:
    * duplicate-word fraction (1 − unique/total) and the fraction of word
    * bigrams taken by the single most frequent bigram. High values on
    * either axis are the classic boilerplate/spam signature in web-scraped
    * training text. All ratios are integer-over-integer double divisions —
    * bit-identical in DuckDB, so q104 is a full-hash oracle check. */
  val repetitionFast: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      val ws = wordsImpl(text)
      val nWords = ws.length.toLong
      val distinct = new java.util.HashSet[String]()
      ws.foreach(distinct.add)
      val dupFrac =
        if (nWords > 0) 1.0 - distinct.size.toDouble / nWords.toDouble else 0.0
      val nBigrams = math.max(0L, nWords - 1)
      var topN = 0L
      if (nBigrams > 0) {
        val counts = new java.util.HashMap[String, Long]()
        var i = 0
        while (i < ws.length - 1) {
          val bg = ws(i) + " " + ws(i + 1)
          val n = counts.merge(bg, 1L, (a, b) => a + b)
          if (n > topN) topN = n
          i += 1
        }
      }
      val topFrac = if (nBigrams > 0) topN.toDouble / nBigrams.toDouble else 0.0
      Repetition(nWords, nBigrams, topN, topFrac, dupFrac,
        dupFrac <= DupWordFracMax &&
          (nBigrams < MinBigramsForGate || topFrac <= TopBigramFracMax))
    }

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

  /** One content-defined chunk: 1-based start, length, and the same
    * mod-1e9+7 polynomial hash over the chunk's chars as [[fingerprint]]. */
  case class CdcChunk(chunk_idx: Int, start: Int, len: Int, chunk_hash: Long)

  private val CdcMod = 1000000007L
  /** 31^15 mod p — the outgoing-char weight for the O(1) window update. */
  private val CdcPow15 = {
    var p = 1L; for (_ <- 0 until 15) p = p * 31L % CdcMod; p
  }

  /** Content-defined chunking (the Rabin/LBFS breakpoint family, SOSP
    * 2001; the dedup-friendly sharding step of a 100 TB ingest): a chunk
    * boundary falls AFTER position i iff the polynomial hash of the
    * 16-char window ending at i satisfies `h % 128 == 7` — boundaries
    * depend only on LOCAL content, so an insertion early in a document
    * re-chunks O(1) chunks instead of shifting every fixed-size block
    * (the property CdcChunkSpec pins). Unlike FastCDC's clamped variant,
    * breakpoints are UNCLAMPED, which keeps the operator a pure function
    * of a stateless per-position window hash — the same fold DuckDB's
    * list_reduce can replay, so chunk starts, lengths, AND hashes are
    * fully oracle-checked cross-engine (a min/max-clamped greedy scan is
    * sequential state the oracle could not express; clamping is a
    * downstream `len`-filter policy choice, not movement).
    *
    * Movement: one O(L) rolling pass per document (incremental window
    * update via the precomputed 31^15 weight), map-only, explode-ready —
    * embarrassingly parallel at any corpus size. */
  def cdcChunks(text: Column): Column = {
    val f = udf { (t: String) =>
      if (t == null || t.isEmpty) Seq.empty[CdcChunk]
      else {
        val cs = t.toCharArray
        val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
        var h = 0L
        var i = 0
        while (i < cs.length) {
          h = (h * 31L + cs(i)) % CdcMod
          if (i >= 15) {
            if (h % 128L == 7L) bounds += (i + 1) // 1-based boundary-after
            // retire the outgoing char before the next shift
            h = ((h - cs(i - 15) * CdcPow15) % CdcMod + CdcMod) % CdcMod
          }
          i += 1
        }
        if (bounds.isEmpty || bounds.last != cs.length) bounds += cs.length
        var start = 1
        bounds.zipWithIndex.map { case (end, idx) =>
          var ch = 0L
          var j = start - 1
          while (j < end) { ch = (ch * 31L + cs(j)) % CdcMod; j += 1 }
          val c = CdcChunk(idx + 1, start, end - start + 1, ch)
          start = end + 1
          c
        }.toSeq
      }
    }
    f(text)
  }

  /** One selected winnowing fingerprint: 1-based gram position + its hash. */
  case class Winnow(pos: Int, gram_hash: Long)

  /** MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003) — the
    * guarantee-density fingerprint selection used for plagiarism/overlap
    * detection at corpus scale: hash every word k-gram, slide a w-gram
    * window, keep each window's MINIMUM hash (ties to the leftmost
    * position), emit the distinct selected (pos, hash) pairs. Any shared
    * run of ≥ w+k-1 words between two documents is guaranteed to share a
    * fingerprint — the property plain "every i-th gram" sampling lacks.
    *
    * Gram hash = first 8 hex chars of md5(gram) as an unsigned long — the
    * engine's content-stable-hash idiom (q96/q117/q118), chosen so DuckDB
    * can rebuild it bit-for-bit. Fewer than w grams winnow as one window;
    * texts shorter than k words have no fingerprints. Fused single pass,
    * map-only — at 100 TB this is an embarrassingly parallel scan whose
    * output is ~2/(w+1) of the gram count per doc (the paper's density
    * bound), ready for a fingerprint-equality self-join. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 0, s"k/w must be positive: $k/$w")
    val f = udf { (t: String) =>
      if (t == null) Seq.empty[Winnow]
      else {
        val ws = t.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        val n = ws.length - k + 1
        if (n <= 0) Seq.empty[Winnow]
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val hs = new Array[Long](n)
          var i = 0
          while (i < n) {
            val gram = ws.slice(i, i + k).mkString(" ")
            val dig = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            hs(i) = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
              ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
            md.reset()
            i += 1
          }
          val out = scala.collection.mutable.LinkedHashSet.empty[Winnow]
          val lastStart = math.max(n - w + 1, 1)
          var j = 0
          while (j < lastStart) {
            var best = j
            var m = j + 1
            val end = math.min(j + w, n)
            while (m < end) { if (hs(m) < hs(best)) best = m; m += 1 }
            out += Winnow(best + 1, hs(best))
            j += 1
          }
          out.toSeq
        }
      }
    }
    f(text)
  }

  /** Adjacent word pairs ("w1 w2") in document order WITH multiplicity —
    * the event stream a bigram LM trains and scores on. Plain [a-z0-9]
    * splitter (the oracle's wordsSql twin), fused single pass. */
  val wordBigramsFast: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else {
        val ws = text.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        if (ws.length < 2) Seq.empty[String]
        else {
          val out = new Array[String](ws.length - 1)
          var i = 0
          while (i < ws.length - 1) { out(i) = ws(i) + " " + ws(i + 1); i += 1 }
          scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
        }
      }
    }

  /** round(ln(n)·10⁶) as a BIGINT — a LOG-PROB IN INTEGER MICRO-NATS.
    * This is the whole reason the perplexity filter is oracle-able: JVM
    * `Math.log` and libm `log` differ by 1 ulp on some integers (measured:
    * 4 of the first 200k), and float SUMS depend on accumulation order,
    * so a raw double NLL can never hash-match across engines. Quantizing
    * each TERM to an integer first (a) absorbs the ulp — a 2e-9 wiggle
    * cannot move a round() at the 10⁻⁶ grid unless ln(n)·10⁶ sits within
    * 2e-9 of a half-boundary, which no realistic count does — and (b)
    * makes the per-document sum exact integer arithmetic, independent of
    * partitioning and add order. (KenLM itself ships quantized log-probs;
    * fixed-point scoring is the production norm, not a compromise.) */
  private def lnMicro(c: Column): Column =
    round(log(c.cast("double")) * 1e6).cast("long")

  /** CCNet-style LM perplexity filter (Wenzek et al. 2020,
    * arXiv:1911.00359): score every document under a bigram language
    * model with add-one smoothing — here trained on the corpus itself,
    * the monolingual-quality-proxy setup — and gate on negative
    * log-likelihood per token. p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V), so each
    * scored bigram contributes lnMicro(c(w1)+V) − lnMicro(c(w1 w2)+1)
    * micro-nats (≥ 0 since c(bigram) ≤ c(unigram)). Returns (id, n_terms,
    * nll_micronats, ppl_ok) for every row; documents with fewer than two
    * words score 0 and pass.
    *
    * 100 TB shape: two count aggregations with map-side partial agg build
    * the MODEL (unigram + bigram tables — the KenLM-file analog; at web
    * scale you train them on a sample, the same documented norm as the
    * k-means/PQ codebooks); scoring is the occurrence stream joined to
    * those tables on fixed-width keys — deliberately UNHINTED joins, so
    * AQE broadcasts a small model and shuffles a big one instead of
    * OOMing on a forced broadcast (the decontaminate lesson) — then one
    * integer-sum groupBy per document. The vocabulary size V is a 1-row
    * driver scalar. No windows, no driver loops, no float accumulation. */
  def lmPerplexityFilter(docs: DataFrame, idCol: String, textCol: String,
                         maxNllPerTokenMicro: Long): DataFrame = {
    val uni = docs.select(explode(Dedup.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .cache()
    val vocabSize = uni.count()
    val bi = docs.select(explode(wordBigramsFast(col(textCol))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val occ = docs
      .select(col(idCol), explode(wordBigramsFast(col(textCol))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val scored = occ
      .join(bi, Seq("bg"))
      .join(uni, occ("w1") === uni("w"))
      .select(col(idCol),
        (lnMicro(col("cu") + vocabSize) - lnMicro(col("cb") + 1L)).as("t"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("t")).as("nll"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("nll"), lit(0L)).as("nll_micronats"),
        (coalesce(col("nll"), lit(0L)) <=
          coalesce(col("n_terms"), lit(0L)) * maxNllPerTokenMicro).as("ppl_ok"))
  }

  /** One BPE merge-training step (Sennrich et al. 2016, arXiv:1508.07909 —
    * the vocabulary-learning loop of the GPT-2/RoBERTa tokenizers), from
    * the character-level start state: count adjacent symbol pairs over the
    * corpus vocabulary weighted by word frequency, pick the most frequent
    * pair ((count desc, pair asc) — deterministic), apply the merge
    * greedily left-to-right to every word, and recount. Returns the
    * top-`topK` pair statistics before ("pre") and after ("post") the
    * merge as (phase, rk, sym_l, sym_r, cnt). Full BPE training iterates
    * this; ONE step is the oracle-able unit (the q108 single-Lloyd-step
    * precedent), and q129's shared regex pre-tokenizer + this loop is the
    * whole GPT-2 trainer shape.
    *
    * 100 TB shape — the classic BPE trick: the corpus token stream is
    * touched exactly once (the word-frequency groupBy, map-side partial
    * agg); pair counting, merging, and recounting all run on the word-TYPE
    * table (~10⁶-10⁷ rows at web scale) weighted by `freq`, never on the
    * 10¹¹-token stream. The chosen pair is a 1-row collect (a model
    * constant, like centroids). The rank window is single-partition but
    * over distinct symbol PAIRS — bounded by vocabulary, not data. The
    * per-word higher-order expressions are interpreted, which costs
    * microseconds at vocabulary size. */
  def bpeMergeStep(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = bpeVocab(docs, textCol).cache()
    def top(pc: DataFrame, phase: String): DataFrame = {
      val w = Window.orderBy($"cnt".desc, $"sym_l", $"sym_r")
      pc.withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= topK)
        .select(lit(phase).as("phase"), $"rk", $"sym_l", $"sym_r", $"cnt")
    }
    val pre = bpePairCounts(vocab)
    bpeBestPair(pre) match {
      case None =>
        Seq.empty[(String, Long, String, String, Long)]
          .toDF("phase", "rk", "sym_l", "sym_r", "cnt")
      case Some((bl, br)) =>
        val merged = bpeApplyMerge(vocab, bl, br)
        top(pre, "pre").unionByName(top(bpePairCounts(merged), "post"))
          .orderBy($"phase", $"rk")
    }
  }

  /** The BPE work state: one row per word TYPE with corpus frequency and
    * the "a b c"-spaced symbol string (a merge is replace("l r" -> "lr"),
    * greedy-leftmost in both engines). Keeps the original word for joins
    * back to the token stream. */
  private def bpeVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Dedup.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sp"))

  /** Adjacent-pair counts over the spaced vocabulary, weighted by word
    * frequency — vocabulary-sized work at any corpus size. */
  private def bpePairCounts(v: DataFrame): DataFrame = {
    val syms = split(col("sp"), " ")
    v.select(col("freq"),
        explode(when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            i => struct(element_at(syms, i).as("sym_l"),
                        element_at(syms, i + 1).as("sym_r"))))
          .otherwise(array().cast("array<struct<sym_l:string,sym_r:string>>")))
        .as("p"))
      .select(col("freq"), col("p.sym_l").as("sym_l"), col("p.sym_r").as("sym_r"))
      .groupBy(col("sym_l"), col("sym_r")).agg(sum(col("freq")).as("cnt"))
  }

  /** The deterministic merge choice: (cnt desc, pair asc); None on an
    * empty vocabulary. A 1-row collect — a model constant. */
  private def bpeBestPair(pc: DataFrame): Option[(String, String)] =
    pc.orderBy(col("cnt").desc, col("sym_l"), col("sym_r")).limit(1)
      .collect().headOption.map(b => (b.getString(0), b.getString(1)))

  private def bpeApplyMerge(v: DataFrame, bl: String, br: String): DataFrame =
    v.withColumn("sp", replace(col("sp"), lit(s"$bl $br"), lit(s"$bl$br")))

  /** BPE tokenization — the APPLY side of [[bpeMergeStep]]'s trainer:
    * learn `nMerges` merges by iterating the step (each round's best pair
    * is a 1-row collect; the vocabulary stays cached between rounds),
    * apply them in order to every word, and count each document's
    * resulting BPE tokens. Returns (id, n_words, n_bpe_tokens, merges) —
    * `merges` is the learned "l r"-formatted merge list, identical on
    * every row (the model card riding along for the oracle gate).
    *
    * Same 100 TB split as the trainer: the corpus stream is touched once
    * for the frequency table and once for the final per-document count;
    * ALL merge learning/applying happens on the word-type table. The
    * per-document count joins the token stream to the (word -> token
    * count) table — unhinted, so AQE broadcasts a small vocabulary and
    * shuffles a big one. */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1: $nMerges")
    var vocab = bpeVocab(docs, textCol).cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < nMerges) {
      bpeBestPair(bpePairCounts(vocab)).foreach { case (bl, br) =>
        merges += ((bl, br))
        val next = bpeApplyMerge(vocab, bl, br).cache()
        next.count() // materialize before dropping the parent from cache
        vocab.unpersist()
        vocab = next
      }
      i += 1
    }
    val mergesLit = merges.map { case (l, r) => s"$l $r" }.mkString(", ")
    val wtok = vocab.select(col("w"), size(split(col("sp"), " ")).cast("long").as("ntok"))
    docs.select(col(idCol), explode(Dedup.words(col(textCol))).as("w"))
      .join(wtok, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_bpe_tokens"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        lit(mergesLit).as("merges"))
  }
}
