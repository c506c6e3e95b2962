package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.text.{Porter, PostingIndex, TextOps, Trigram}

/** Text-pipeline operator catalog — SURVEY.md §2.6 (T-chain), §2.7 (F1/F3)
  * over the `documents` table, each with a DuckDB oracle built from the SAME
  * Scala constants (stopword list, Porter stems of the corpus vocabulary) so
  * engine and oracle can't drift.
  *
  * Scale: every transform is a per-row expression over a parquet scan — no
  * shuffle at all until an aggregate/sort; at 100 TB these queries are
  * embarrassingly parallel map stages.
  */
object TextQueries {

  /** Distinct lowercase vocabulary of the synthetic documents corpus
    * (verified against sf0.01; oracle CASE mapping covers exactly these). */
  private val corpusVocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  private lazy val stopListSql: String =
    TextOps.englishStopWords.map(sqlQuote).mkString(", ")

  /** CASE expression replicating Porter.stem over the corpus vocabulary —
    * lets DuckDB (which has no offline stemmer) oracle-check the full
    * tokenize pipeline. */
  private lazy val stemCaseSql: String =
    "CASE w " +
      corpusVocab.map(w => s"WHEN ${sqlQuote(w)} THEN ${sqlQuote(Porter.stem(w))}").mkString(" ") +
      " ELSE w END"

  /** DuckDB twin of TextOps.sanitizeText. */
  private[ops] val sanitizeSql: String =
    """trim(regexp_replace(
       array_to_string(list_filter(string_split(
         regexp_replace(translate(regexp_replace(lower(text), '<.+?>', ' ', 'g'),
                        chr(10)||chr(9)||chr(147)||chr(148), '  ""'),
                        '&#160;|&nbsp;', ' ', 'g'),
         ' '), w -> length(w) < 20), ' '),
       '\s+', ' ', 'g'))"""

  /** DuckDB twin of TextOps.tokenizeBasic. */
  private val tokenizeBasicSql: String =
    """list_sort(list_distinct(list_filter(
         string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0)))"""

  /** DuckDB twin of TextOps.tokenize (stopwords + vocab-stem CASE). */
  private[ops] lazy val tokenizeSql: String =
    s"""list_sort(list_distinct(list_transform(
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      w -> length(w) > 0 AND w NOT IN ($stopListSql)),
          w -> $stemCaseSql)))"""

  /** SGML wrapper used by q35 — a filing-shaped envelope with one keepable
    * .htm section around the document text and one binary .pdf section that
    * the T2/T3 segmentation must drop (fixture shape from FIXTURES.md §B). */
  private val sgmlPrefix = "<document><type>10-k<filename>main.htm<text> "
  private val sgmlSuffix =
    " wwwwwwwwwwwwwwwwwwwwwwwwwwwww </text></document>" +
      "<document><type>graphic<filename>img.pdf<text>begin 644 img.pdf " +
      "m1234567890qqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqq end</text></document>"

  // ------------------------------------------------------------------ queries

  private val q30Sanitize: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", TextOps.sanitizeText($"text").as("clean"))
      .orderBy($"doc_id")
  }

  // q31/q34 project the token array through array_join: the driver's
  // comparator (pandas sort_values) cannot hash array cells, so these
  // queries emit a scalar space-joined rendering — lossless for a
  // sorted+distinct token list — keeping them verifiable at the gate.
  private val q31TokenizeBasic: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        array_join(TextOps.tokenizeBasic($"text"), " ").as("tokens"))
      .orderBy($"doc_id")
  }

  private val q32TsMatch: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", TextOps.tokenizeBasic($"text").as("tokens"))
      .filter(TextOps.tsMatchAllBasic($"tokens", Seq("spark", "join")))
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  private val q33TextStats: Q = (s, d) => {
    import s.implicits._
    val ws = TextOps.words($"text")
    Tables.documents(s, d)
      .select($"doc_id",
        length($"text").cast("long").as("n_chars"),
        size(ws).cast("long").as("n_words"),
        size(array_distinct(ws)).cast("long").as("n_uniq"),
        coalesce(array_max(transform(ws, w => length(w))), lit(0))
          .cast("long").as("max_word_len"))
      .orderBy($"doc_id")
  }

  private val q34Tokenize: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        array_join(TextOps.tokenize($"text"), " ").as("tokens"))
      .orderBy($"doc_id")
  }

  private val q35SanitizeFiling: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        TextOps.sanitizeFiling(
          concat(lit(sgmlPrefix), $"text", lit(sgmlSuffix))).as("clean"))
      .orderBy($"doc_id")
  }

  private val q36TsSearchStemmed: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"lang", TextOps.tokenize($"text").as("tokens"))
      .filter(TextOps.tsMatchAll($"tokens", Seq("merges", "joining")))
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** F2/F3 scale path: the same stemmed AND-search as q36 but through the
    * posting-table inverted index (GIN equivalent) instead of a corpus
    * scan — must return exactly q36's doc set. */
  private val q37PostingSearch: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val postings = PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text"))
    PostingIndex.searchAll(postings, "doc_id", Seq("merges", "joining"))
      .orderBy($"doc_id")
  }

  /** F2 on-disk: the same search as q37 but through a WRITTEN index —
    * build postings, persist partitioned by lexeme bucket, search with
    * partition pruning (PlanSpec asserts the pruning; this query pins the
    * result equivalence into the oracle gate). */
  private val q89IndexedSearch: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_q89_idx_") + "/idx"
    val docs = Tables.documents(s, d).repartition($"doc_id")
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")), dir, buckets = 16)
    PostingIndex.searchAllIndexed(s, dir, "doc_id", Seq("merges", "joining"), buckets = 16)
      .orderBy($"doc_id")
  }

  /** E5: tf-idf term statistics over the corpus vocabulary: document
    * frequency, total term frequency, idf = ln(N/df) (rounded to 6dp so the
    * single float op can't hash-flip across engines). */
  private val q38TermStats: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs.select($"doc_id", explode(TextOps.words($"text")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    tf.groupBy($"w")
      .agg(count(lit(1)).as("df"), sum($"tf").as("sum_tf"))
      .crossJoin(broadcast(nDocs))
      .select($"w", $"df", $"sum_tf",
        round(log($"n_docs".cast("double") / $"df".cast("double")), 6).as("idf"))
      .orderBy($"w")
  }

  /** Per-doc top term by raw term frequency (integer ordering — tf desc,
    * then lexicographic — so the rank is exact in any engine). */
  private val q39TopTerm: Q = (s, d) => {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tf".desc, $"w".asc)
    Tables.documents(s, d).repartition($"doc_id")
      .select($"doc_id", explode(TextOps.words($"text")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"doc_id", $"w".as("top_term"), $"tf")
      .orderBy($"doc_id")
  }

  /** F1/F3 positional: phrase search (`hash <-> join`) through the
    * positional posting table — the reference's headline "near real time
    * full text search" semantics that the plain token array cannot express
    * (positions dropped). Oracle rebuilds positions with parallel unnest. */
  private val q91PhraseSearch: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val postings = PostingIndex.buildPositional(docs, "doc_id", $"text")
    PostingIndex.phraseSearchQuery(postings, "doc_id", "hash <-> join")
      .orderBy($"doc_id")
  }

  /** F1 ranking: ts_rank analog — tf-idf score per matching doc for an OR
    * term set, rounded to 6dp (q38's float contract). */
  private val q92TsRank: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val postings = PostingIndex.buildPositional(docs, "doc_id", $"text")
    PostingIndex.tsRank(postings, "doc_id", Seq("spark", "join"), docs)
      .orderBy($"doc_id")
  }

  /** F1 ranking: ts_rank_cd analog — cover-density proximity scoring over
    * the positional postings (Σ 1/width over minimal covers of {spark,
    * join}). Engine = linear per-doc sweep; oracle = independent set-based
    * recomputation of the same covers from the tight-window dual
    * characterization, so the two derivations cross-check each other. */
  private val q114TsRankCd: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val postings = PostingIndex.buildPositional(docs, "doc_id", $"text")
    PostingIndex.tsRankCd(postings, "doc_id", Seq("spark", "join"))
      .orderBy($"doc_id")
  }

  /** F3 full to_tsquery surface: AND + grouped-OR-under-NOT + prefix in one
    * query, evaluated through the posting-table path (semi/anti joins on
    * posting lists — `graft.text.TsQuery` compiled by
    * `PostingIndex.searchQuery`). The `!` lands as a LEFT-ANTI join against
    * its positive conjunct, never against the corpus universe. Oracle is
    * plain boolean algebra over `list_contains` on the same tokenization. */
  private val q99TsQuerySearch: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val postings = PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text"))
    PostingIndex.searchQuery(postings, "doc_id",
      "(merge & !(window | join)) | vec:*", docs.select($"doc_id"))
      .orderBy($"doc_id")
  }

  /** F2+F4 end to end — the reference's "near real time full text search":
    * an index born from a third of the corpus, kept current by incremental
    * batch appends ([[PostingIndex.appendToIndex]] — only touched lexeme
    * buckets rewritten), then searched exactly like q89. The oracle pins
    * the merged index against a fresh full build; double-apply idempotence
    * is spec-covered (PostingIndexSpec) and exactly-once under a
    * checkpoint is q107's gate, so this entry runs each batch once. */
  private val q106IncrIndex: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_q106_idx_") + "/idx"
    val docs = Tables.documents(s, d).repartition($"doc_id")
    def toks = TextOps.tokenize($"text")
    PostingIndex.write(
      PostingIndex.build(docs.filter($"doc_id" % 3 === 0), "doc_id", toks), dir, buckets = 16)
    PostingIndex.appendToIndex(s, dir, docs.filter($"doc_id" % 3 === 1), "doc_id", toks, buckets = 16)
    PostingIndex.appendToIndex(s, dir, docs.filter($"doc_id" % 3 === 2), "doc_id", toks, buckets = 16)
    PostingIndex.searchAllIndexed(s, dir, "doc_id", Seq("merges", "joining"), buckets = 16)
      .orderBy($"doc_id")
  }

  /** F3+F2 on-disk: the full tsquery surface INCLUDING phrase against a
    * WRITTEN positional index — `write(buildPositional(...))` carries the
    * pos column through the bucketed layout, so `a <-> b` runs its
    * (id, pos) adjacency joins over the bucket-pruned scan (Postgres:
    * phrase search against the GIN index + tsvector). */
  private val q109IndexedPhrase: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_q109_idx_") + "/idx"
    val docs = Tables.documents(s, d).repartition($"doc_id")
    PostingIndex.write(
      PostingIndex.buildPositional(docs, "doc_id", $"text"), dir, buckets = 16)
    PostingIndex.searchQueryIndexed(s, dir, "doc_id", "(hash <-> join) | vec:*",
        docs.select($"doc_id"), buckets = 16)
      .orderBy($"doc_id")
  }

  /** `websearch_to_tsquery` surface — the forgiving syntax a search box
    * feeds the engine: `merge -window or "hash join"` ≡
    * `(merge & !window) | (hash <-> join)`. Same posting evaluator as
    * q99, so only the parser is new surface under this gate. */
  private val q110Websearch: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val pos = PostingIndex.buildPositional(docs, "doc_id", $"text")
    PostingIndex.searchWebsearch(pos, "doc_id", """merge -window or "hash join"""",
        docs.select($"doc_id"))
      .orderBy($"doc_id")
  }

  /** `ts_headline` — the snippet column of the reference's search UX:
    * highlight the first cover of `merge | slow` in every matching doc.
    * Map-only fused pass; non-matching docs drop out. */
  private val q111Headline: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).repartition($"doc_id")
      .select($"doc_id", TextOps.tsHeadline($"text", "merge | slow").as("headline"))
      .filter($"headline".isNotNull)
      .orderBy($"doc_id")
  }

  /** F2+F4 under document UPDATE — the reference's actual write pattern
    * (the scrape loop UPDATEs each filing's text,
    * `sec_dl/utils/scrape_all_filings.py:169-171`, and the tsvector
    * trigger fires BEFORE UPDATE OR INSERT, `init_tables.py:59-67`): the
    * v1 index is built with the `%5==0` slice CORRUPTED by a
    * " merges joining" suffix — every such doc is a ghost hit for the
    * search unless the upsert's delete sweep removes its old postings.
    * The re-scrape then replaces the slice's text with a SHORT placeholder
    * whose three lexemes touch almost none of the 16 buckets, so the
    * ghosts sit in buckets the new batch alone would never rewrite — the
    * doc→bucket sidecar sweep is what the gate exercises. Applied twice:
    * idempotence. Must answer exactly like a fresh build over the final
    * (placeholder-patched) corpus. */
  /** Per-sfDir memoized "corrupted-v1" bootstrap index — the IDENTICAL
    * starting state four catalog queries build (q120/q124/q363/q365: the
    * full corpus with the `%5==0` slice suffixed " merges joining",
    * plain-built at 16 buckets): built ONCE per session, then each query
    * takes a byte-identical FILESYSTEM COPY as its private working index.
    * The copy (a few MB of parquet) replaces a per-query re-tokenize +
    * shuffle + partitioned write — the four queries sat in the bench's
    * top-10 almost entirely on this shared fixture cost (round-13 VERDICT
    * item 1), and what each query GATES is the maintenance applied AFTER
    * this state, not the bootstrap itself (q107/q119 keep gating the
    * bootstrap-through-stream path). */
  private val corruptedIdxTemplate =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[ops] def corruptedIndexCopy(s: SparkSession, d: String,
                                      tag: String): String = {
    import s.implicits._
    val tpl = corruptedIdxTemplate.computeIfAbsent(d, _ => {
      val t = graft.util.Scratch.dir("graft_corrupt_tpl_") + "/idx"
      val docs = Tables.documents(s, d).repartition($"doc_id")
      val corrupted = docs.filter($"doc_id" % 5 === 0)
        .withColumn("text", concat($"text", lit(" merges joining")))
      PostingIndex.write(
        PostingIndex.build(
          corrupted.unionByName(docs.filter($"doc_id" % 5 =!= 0)), "doc_id",
          TextOps.tokenize($"text")),
        t, buckets = 16)
      t
    })
    val dst = graft.util.Scratch.dir(tag) + "/idx"
    val conf = s.sessionState.newHadoopConf()
    val srcP = new org.apache.hadoop.fs.Path(tpl)
    val dstP = new org.apache.hadoop.fs.Path(dst)
    val fs = srcP.getFileSystem(conf)
    require(org.apache.hadoop.fs.FileUtil.copy(fs, srcP, fs, dstP, false, conf),
      s"could not copy index template $tpl -> $dst")
    dst
  }

  /** q123's POSITIONAL twin of [[corruptedIndexCopy]] — the corrupted-v1
    * POSITIONAL bootstrap (the `%5==0` slice suffixed " hash join",
    * `buildPositional` at 16 buckets) built ONCE per sfDir and FS-copied
    * per use, same rationale: what q123 gates is the positional upsert's
    * ghost sweep applied AFTER this state, and the bootstrap-write path
    * itself stays gated through q109/q119. */
  private val corruptedPosIdxTemplate =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[ops] def corruptedPositionalIndexCopy(s: SparkSession, d: String,
                                                tag: String): String = {
    import s.implicits._
    val tpl = corruptedPosIdxTemplate.computeIfAbsent(d, _ => {
      val t = graft.util.Scratch.dir("graft_corrupt_pos_tpl_") + "/idx"
      val docs = Tables.documents(s, d).repartition($"doc_id")
      val corrupted = docs.filter($"doc_id" % 5 === 0)
        .withColumn("text", concat($"text", lit(" hash join")))
      PostingIndex.write(
        PostingIndex.buildPositional(
          corrupted.unionByName(docs.filter($"doc_id" % 5 =!= 0)), "doc_id",
          $"text"),
        t, buckets = 16)
      t
    })
    val dst = graft.util.Scratch.dir(tag) + "/idx"
    val conf = s.sessionState.newHadoopConf()
    val srcP = new org.apache.hadoop.fs.Path(tpl)
    val dstP = new org.apache.hadoop.fs.Path(dst)
    val fs = srcP.getFileSystem(conf)
    require(org.apache.hadoop.fs.FileUtil.copy(fs, srcP, fs, dstP, false, conf),
      s"could not copy index template $tpl -> $dst")
    dst
  }

  private val q120UpsertIndex: Q = (s, d) => {
    import s.implicits._
    val dir = corruptedIndexCopy(s, d, "graft_q120_idx_")
    val docs = Tables.documents(s, d).repartition($"doc_id")
    def toks = TextOps.tokenize($"text")
    val rescraped = docs.filter($"doc_id" % 5 === 0)
      .withColumn("text", lit(UpsertPlaceholder))
    PostingIndex.upsertIndex(s, dir, rescraped, "doc_id", toks, buckets = 16)
    PostingIndex.upsertIndex(s, dir, rescraped, "doc_id", toks, buckets = 16) // idempotent re-run
    PostingIndex.searchAllIndexed(s, dir, "doc_id", Seq("merges", "joining"), buckets = 16)
      .orderBy($"doc_id")
  }

  /** q120's POSITIONAL twin: the corrupted v1 slice carries a trailing
    * " hash join" ADJACENCY, so phrase search `hash <-> join` ghost-hits
    * every edited doc until `upsertIndexPositional` sweeps its old
    * (lexeme, pos) rows; the placeholder replacement contains neither
    * term. Double-applied; must answer like a fresh positional build over
    * the final corpus. */
  private val q123UpsertPhrase: Q = (s, d) => {
    import s.implicits._
    val dir = corruptedPositionalIndexCopy(s, d, "graft_q123_idx_")
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val rescraped = docs.filter($"doc_id" % 5 === 0)
      .withColumn("text", lit(UpsertPlaceholder))
    PostingIndex.upsertIndexPositional(s, dir, rescraped, "doc_id", $"text", buckets = 16)
    PostingIndex.upsertIndexPositional(s, dir, rescraped, "doc_id", $"text", buckets = 16)
    PostingIndex.searchQueryIndexed(s, dir, "doc_id", "hash <-> join",
        docs.select($"doc_id"), buckets = 16)
      .orderBy($"doc_id")
  }

  /** q120's WRITE-AMPLIFICATION-BOUNDED twin — document UPDATE through
    * the pending list ([[PostingIndex.upsertIndexBuffered]], the GIN
    * `fastupdate` design; reference trigger `init_tables.py:59-67`): the
    * same corrupted-v1 index, but the re-scrape lands as BUFFERED batches
    * (~delta-sized appends, zero base-bucket rewrites — PendingIndexSpec
    * pins the bytes) instead of per-batch COW sweeps. Batch 0 is a ghost
    * edit that still matches the search and batch 1 the real placeholder
    * replacement, so latest-batch-wins is load-bearing; batch 1 also
    * pure-deletes a disjoint slice (empty tokenization = DELETE). The
    * result is the search evaluated through the pending OVERLAY read,
    * INTERSECTED with the same search after [[PostingIndex
    * .compactPending]] folds the area into the base — any divergence
    * between the two read paths (a leaked ghost, a lost edit, a
    * mis-folded compaction) breaks the intersection against the
    * fresh-build oracle. */
  private val q363BufferedUpsert: Q = (s, d) => {
    import s.implicits._
    val dir = corruptedIndexCopy(s, d, "graft_q363_idx_")
    val docs = Tables.documents(s, d).repartition($"doc_id")
    def toks = TextOps.tokenize($"text")
    PostingIndex.upsertIndexBuffered(s, dir,
      docs.filter($"doc_id" % 5 === 0)
        .withColumn("text", lit("still merges joining ghost")),
      "doc_id", toks, buckets = 16)
    val rescraped = docs.filter($"doc_id" % 5 === 0)
      .withColumn("text", lit(UpsertPlaceholder))
    val purged = docs.filter($"doc_id" % 5 === 1 && $"doc_id" % 3 === 0)
      .withColumn("text", lit(""))
    PostingIndex.upsertIndexBuffered(s, dir,
      rescraped.unionByName(purged), "doc_id", toks, buckets = 16)
    // materialize the overlay read BEFORE compaction deletes the pending
    // files it lazily references (the hazard compactPending's doc calls out)
    val pre = PostingIndex.searchAllIndexed(s, dir, "doc_id",
      Seq("merges", "joining"), buckets = 16).localCheckpoint(true)
    PostingIndex.compactPending(s, dir, "doc_id", buckets = 16)
    val post = PostingIndex.searchAllIndexed(s, dir, "doc_id",
      Seq("merges", "joining"), buckets = 16)
    ExtQueriesShared.gatedIntersect(pre, post, "q363").orderBy($"doc_id")
  }

  /** F2 lifecycle closure — a GROWN index re-sized under a new bucket
    * modulus ([[PostingIndex.rebucket]], round-11 VERDICT item 3): the
    * index is born at 4 buckets on a third of the corpus, grows by
    * incremental append, is rebucketed 4 → 16 (one O(index) rewrite +
    * marker flip + atomic swap), then keeps growing THROUGH the new
    * layout — the post-rebucket append and the search both run at
    * buckets=16, so a mis-hashed rewrite (postings left under the old
    * modulus, a stale marker, a lost partition in the swap) surfaces as
    * missing/ghost rows against the same fresh-build oracle as q89/q106.
    * RebucketSpec pins the equals-fresh-index invariant; this gates the
    * values at corpus scale. */
  private val q364IndexRebucket: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_q364_idx_") + "/idx"
    val docs = Tables.documents(s, d).repartition($"doc_id")
    def toks = TextOps.tokenize($"text")
    PostingIndex.write(
      PostingIndex.build(docs.filter($"doc_id" % 3 === 0), "doc_id", toks),
      dir, buckets = 4)
    PostingIndex.appendToIndex(s, dir, docs.filter($"doc_id" % 3 === 1),
      "doc_id", toks, buckets = 4)
    PostingIndex.rebucket(s, dir, "doc_id", oldBuckets = 4, newBuckets = 16)
    PostingIndex.appendToIndex(s, dir, docs.filter($"doc_id" % 3 === 2),
      "doc_id", toks, buckets = 16)
    PostingIndex.searchAllIndexed(s, dir, "doc_id", Seq("merges", "joining"),
        buckets = 16)
      .orderBy($"doc_id")
  }

  /** F3 weighted relevance — `setweight` + `ts_rank(weights, …,
    * normalization)` (the Postgres title-vs-body tuning knob, VERDICT r5
    * missing #3): the corpus's first four words act as the TITLE (class A,
    * weight 1.0), the rest as BODY (class D, 0.125 — dyadic weights so the
    * unordered float sums are exact in both engines), ranked for
    * merge|join with normalization 1|32 (÷(1+ln(doc length)), then
    * s/(s+1)). The oracle rebuilds the whole pipeline — positions, weight
    * CASE, weighted tf, df, idf, both normalization steps — from scratch
    * in SQL. A doc with one title hit must outrank one with several body
    * hits, which the unweighted q92 ordering cannot produce; the flip is
    * spec-asserted, the values gate here. */
  private val q121WeightedRank: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val ws = TextOps.words($"text")
    val title = concat_ws(" ", slice(ws, 1, 4))
    val body = concat_ws(" ", slice(ws, lit(5), size(ws)))
    val postings = PostingIndex.buildPositionalWeighted(docs, "doc_id",
      Seq((title, "A"), (body, "D")))
    PostingIndex.tsRankWeighted(postings, "doc_id", Seq("merge", "join"), docs,
        weights = Seq(0.125, 0.25, 0.5, 1.0), normalization = 1 | 32)
      .orderBy($"doc_id")
  }

  /** `ts_stat` — corpus lexeme statistics over the WRITTEN positional
    * index (the reference's Adminer "hot lexemes" ad-hoc query): one row
    * per lexeme with (ndoc, nentry). Aggregates run bucket-parallel over
    * the on-disk layout; the lexeme-filtered form's partition pruning is
    * PlanSpec-asserted. */
  private val q122TsStat: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_q122_idx_") + "/idx"
    val docs = Tables.documents(s, d).repartition($"doc_id")
    PostingIndex.write(
      PostingIndex.buildPositional(docs, "doc_id", $"text"), dir, buckets = 16)
    PostingIndex.tsStatIndexed(s, dir, "doc_id", buckets = 16)
      .orderBy($"lexeme")
  }

  /** pg_trgm fuzzy identifier matching — the INDEXABLE companion of q58's
    * levenshtein QA (Postgres answers `README.md:79-87`-style identifier
    * drift with `similarity(a,b) >= 0.3` over a trigram GIN index): a
    * dirty-probe worklist (part names with their 3rd character deleted)
    * resolved against the part dimension via [[Trigram.similarJoin]] —
    * broadcast probe grams, map-only corpus side, one hits-only shuffle
    * (the GIN posting-probe movement shape; never corpus×corpus). The
    * oracle rebuilds pad/extract/jaccard from scratch in SQL. */
  private val q125TrigramFuzzy: Q = (s, d) => {
    import s.implicits._
    // distribute BEFORE the gram explode: the corpus side's trigram
    // expansion is ~95 grams/name of CPU-dense work that otherwise runs
    // inside the single-task file scan (profiled 3.4 s in one task); the
    // pre-explode rows are narrow, so this shuffle is ~the name bytes
    val parts = Tables.part(s, d).select($"p_partkey", $"p_name")
      .repartition($"p_partkey")
    val probes = Tables.part(s, d).filter($"p_partkey" % 53 === 1)
      .select($"p_partkey".as("probe_id"),
        concat(substring($"p_name", 1, 2), substring($"p_name", 4, 1000000))
          .as("probe_name"))
    Trigram.similarJoin(parts, "p_partkey", "p_name",
        probes, "probe_id", "probe_name", threshold = 0.3)
      .withColumn("sim", round($"sim", 6))
      .orderBy($"p_partkey", $"probe_id")
  }

  /** The remaining to_tsquery parser family members — `plainto_tsquery`
    * (words ANDed, stopwords/punctuation vanish) and `phraseto_tsquery`
    * (the whole input as one gap-preserving phrase) — each gated against
    * the catalog's SHARED truth string for its semantics: plainto('The
    * merges, joining!') must equal the q37/q89/q106/q107 "merges AND
    * joining" oracle, phraseto('hash join') the q91/q119 `hash <-> join`
    * oracle. One output, dialect-tagged. */
  private val q127PlaintoPhraseto: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val plain = docs
      .filter(TextOps.tsMatchPlainto(TextOps.tokenize($"text"), "The merges, joining!"))
      .select(lit("plainto").as("dialect"), $"doc_id")
    val positional = PostingIndex.buildPositional(docs, "doc_id", $"text")
    val phrase = PostingIndex
      .searchPhraseto(positional, "doc_id", "hash join", docs.select($"doc_id"))
      .select(lit("phraseto").as("dialect"), $"doc_id")
    plain.unionByName(phrase).orderBy($"dialect", $"doc_id")
  }

  /** End-to-end ENTITY RESOLUTION (record linkage: Fellegi–Sunter blocking
    * + transitive merge — the dirty-identifier cleanup q58/q125 do
    * per-probe, promoted to whole-corpus clustering): a record set of
    * part names plus deterministically-corrupted variants (3rd char
    * deleted — ticker/CIK drift in miniature) is clustered by trigram
    * similarity ≥ 0.55 and transitive closure.
    *
    * Movement — NO corpus×corpus stage at any step: (1) all-pairs
    * candidates come from Bayardo prefix filtering over the
    * lexicographically-sorted trigram sets (the q150 lemma on q125's
    * pg_trgm grams) — prefix length uses INTEGER arithmetic
    * (sz − (11·sz+19) div 20 + 1), because a float ⌈0.55·sz⌉ rounds UP on
    * ulp dust and silently shortens the prefix below the lossless bound;
    * (2) the Jaccard gate is integer cross-multiplication (20·o ≥
    * 11·(a+b−o)); (3) clusters come from [[Dedup.connectedComponents]]
    * min-label propagation, with singleton records kept as their own
    * entity via the left join. The oracle recomputes candidates by BRUTE
    * FORCE over all shared grams — a dropped prefix candidate fails the
    * gate — and the closure as a recursive CTE. */
  /** q181/q184's shared record set: part names plus the 3rd-char-deleted
    * corrupted variants, parity-encoded ids. */
  private def entityRecords(s: org.apache.spark.sql.SparkSession,
                            d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val base = Tables.part(s, d).filter($"p_partkey" <= 300)
    base.select(($"p_partkey" * 2).as("rid"), $"p_name".as("name"))
      .unionByName(base.filter($"p_partkey" % 7 === 1)
        .select(($"p_partkey" * 2 + 1).as("rid"),
          concat(substring($"p_name", 1, 2), substring($"p_name", 4, 1000000))
            .as("name")))
  }

  /** q181/q184's shared similarity graph: every record pair with trigram
    * Jaccard ≥ 11/20, via [[Trigram.similarSelfJoin]] (df-ordered prefix
    * filtering — see its Scaladoc for why frequency order is load-bearing
    * on pg_trgm grams). */
  private def partNameSimPairs(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame =
    Trigram.similarSelfJoin(entityRecords(s, d), "rid", "name", 11, 20)

  /** The stop-gram df cap q366 measures and the ER stress family runs
    * with. At the catalog record set (≤ ~343 records) a gram shared by
    * more than a third of all records separates boilerplate structure
    * from entity-identifying content; the recall gate below is what makes
    * the number honest rather than tuned. */
  private[ops] val ErStopGramDf = 128L

  /** ER df-cap recall contract (round-12 VERDICT item 2, q47's measured-
    * contract pattern): [[Trigram.similarSelfJoin]]'s `stopGramDf` mode
    * removes grams with document frequency > [[ErStopGramDf]] from every
    * record's set — the hub-gram blocks whose C(df, 2) candidate fanout
    * is what turned the ×100 ER stress run superlinear (STRESS.md: >70 GB
    * spill) — making the metric "Jaccard over non-hub grams". This query
    * pins BOTH pair sets against DuckDB (the capped semantics are exactly
    * SQL-expressible) and gates measured recall vs the full-metric truth
    * ≥ 0.9, so the scale path's cheaper candidate generation never
    * silently costs matches. */
  private val q366ErStopgram: Q = (s, d) => {
    import s.implicits._
    val recs = entityRecords(s, d)
    val truth = partNameSimPairs(s, d).cache()
    val capped = Trigram.similarSelfJoin(recs, "rid", "name", 11, 20,
      stopGramDf = Some(ErStopGramDf)).cache()
    val hit = truth.join(capped, Seq("r1", "r2"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(capped.agg(count(lit(1)).as("n_capped")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(
        when($"n_truth" === 0, lit(true))
          .otherwise($"n_hit".cast("double") / $"n_truth" >= 0.9).as("recall_ok"),
        $"n_truth", $"n_capped", $"n_hit")
  }

  private val q181EntityClusters: Q = (s, d) => {
    import s.implicits._
    val recs = entityRecords(s, d)
    val labels = graft.ext.Dedup.connectedComponents(
      partNameSimPairs(s, d), "r1", "r2")
    recs.join(labels, recs("rid") === labels("node"), "left")
      .select($"rid", expr("rid div 2").as("partkey"),
        ($"rid" % 2).as("is_variant"),
        coalesce($"component", $"rid").as("component"))
      .orderBy($"rid")
  }

  /** TRIANGLE COUNTING over the q181 similarity graph — the clique-ness
    * audit of entity-resolution output (a transitively-closed cluster
    * whose members share few triangles is chained by weak links; one rich
    * in triangles is a genuine near-clique). Standard distributed
    * node-iterator: edges oriented (r1 < r2), one two-path equi-join +
    * one closing-edge join — never an all-triples stage; at corpus scale
    * the orientation flips to degree-ordering so hub fanout is bounded
    * by O(m^1.5) (Suri & Vassilvitskii, WWW 2011). Per-record triangle
    * participation is the output; the oracle replays the brute-force
    * pair graph and the same two joins. */
  private val q184Triangles: Q = (s, d) => {
    import s.implicits._
    val pairs = partNameSimPairs(s, d).cache()
    val tri = pairs.as("ab").join(pairs.as("bc"), $"ab.r2" === $"bc.r1")
      .join(pairs.as("ac"),
        $"ac.r1" === $"ab.r1" && $"ac.r2" === $"bc.r2")
      .select($"ab.r1".as("a"), $"ab.r2".as("b"), $"bc.r2".as("c"))
    tri.select(explode(array($"a", $"b", $"c")).as("rid"))
      .groupBy($"rid").agg(count(lit(1)).as("n_tri"))
      .orderBy($"rid")
  }

  /** k-CORE decomposition ([[graft.ext.Graph.kCore]]) over the q181/q184
    * similarity graph — the third leg of the graph family: PageRank
    * ranks, triangles count local closure, the 2-core separates genuine
    * near-clique entity clusters from transitively-chained ones (a chain
    * peels away; a clique survives with its degrees intact). 4 peeling
    * rounds — the q181 cluster diameter bounds the peeling depth well
    * under that — and the oracle unrolls the SAME 4 rounds as CTE stages
    * over the brute-force pair graph, so both a dropped candidate pair
    * and a mis-peeled round hash-mismatch. */
  private val q196KCore: Q = (s, d) => {
    import s.implicits._
    graft.ext.Graph.kCore(partNameSimPairs(s, d), k = 2, iters = 4,
        srcCol = "r1", dstCol = "r2")
      .select($"node".as("rid"), $"degree")
      .orderBy($"rid")
  }

  /** LABEL-PROPAGATION COMMUNITY DETECTION (Raghavan et al., Phys. Rev. E
    * 2007) over the q181 similarity graph — the fourth leg of the graph
    * family. Unlike q181's min-label closure (which converges to whole
    * connected components), LPA adopts each node's MOST FREQUENT neighbor
    * label, so weakly-chained components split at their thin cuts — the
    * distinction that matters for entity-resolution audit (a chain of
    * borderline matches is not one entity). SYNCHRONOUS rounds with a
    * deterministic tie-break (highest count, then smallest label) make it
    * oracle-exact; 3 unrolled rounds — the bounded-rounds shape IS the
    * 100 TB story: each round is one edge equi-join + one (node, label)
    * count + one per-node top-1 fold (WindowGroupLimit prunes map-side),
    * versus closure-to-convergence whose depth is unbounded. Singletons
    * keep their own label through the left join. */
  private val q207LabelProp: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = partNameSimPairs(s, d)
    val edges = pairs.select($"r1".as("src"), $"r2".as("dst"))
      .unionByName(pairs.select($"r2".as("src"), $"r1".as("dst")))
      .cache()
    var labels = entityRecords(s, d)
      .select($"rid".as("node"), $"rid".as("label"))
    for (_ <- 1 to 3) {
      val top = edges.join(labels, edges("dst") === labels("node"))
        .groupBy($"src", $"label").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"src").orderBy($"c".desc, $"label")))
        .filter($"rk" === 1)
        .select($"src".as("vnode"), $"label".as("newlab"))
      labels = labels.join(top, labels("node") === top("vnode"), "left")
        .select($"node", coalesce($"newlab", $"label").as("label"))
        // labels feeds BOTH the next round's neighbor join and its
        // fallback coalesce: without cutting lineage each round would
        // re-execute every prior round down both branches (≈2^rounds
        // plan blowup — measured 4.2 s at sf0.1). localCheckpoint
        // materializes each round exactly once, which is also the
        // iterate-then-checkpoint shape Pregel-style loops need at
        // corpus scale.
        .localCheckpoint()
    }
    labels.select($"node".as("rid"), $"label".as("community"))
      .orderBy($"rid")
  }

  /** SORTED-NEIGHBORHOOD BLOCKING (Hernández & Stolfo, SIGMOD 1995) —
    * the third candidate-generation strategy of the ER family (q181
    * uses df-ordered trigram prefix filtering, q43/q47 use LSH): records
    * sort once by a blocking key (lowercased name), and candidates are
    * the pairs within a w=3 window of the sorted order. The window join
    * is LINEAR — each row emits its (rank + 1..3) probes and pairs form
    * by rank equality, never |rank_a − rank_b| as a join predicate —
    * and the global sort is the method's one honest cost (its selling
    * point is trading the sort for zero candidate blowup). Candidates
    * are then verified with the q181 trigram-Jaccard gate; output is
    * the verified matches, fully replayed by the oracle (same sort,
    * same window, same gate). */
  private val q251SortedNeighborhood: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val recs = entityRecords(s, d)
      .withColumn("key", lower($"name"))
      .withColumn("rn", row_number().over(Window.orderBy($"key", $"rid")))
      .select($"rid", $"name", $"rn")
      .cache()
    val probes = recs.select($"rid".as("r1"), $"name".as("name1"),
      explode(expr("sequence(rn + 1, rn + 3)")).as("rn"))
    val cands = probes.join(
      recs.select($"rid".as("r2"), $"name".as("name2"), $"rn"), Seq("rn"))
    cands
      .withColumn("ga", graft.text.Trigram.trigrams($"name1"))
      .withColumn("gb", graft.text.Trigram.trigrams($"name2"))
      .withColumn("o", size(array_intersect($"ga", $"gb")).cast("long"))
      .withColumn("s1", size($"ga").cast("long"))
      .withColumn("s2", size($"gb").cast("long"))
      .filter($"o" * 20 >= lit(11L) * ($"s1" + $"s2" - $"o"))
      .select(least($"r1", $"r2").as("ra"), greatest($"r1", $"r2").as("rb"))
      .distinct()
      .orderBy($"ra", $"rb")
  }

  /** BLOCKING-QUALITY AUDIT (Christen, TKDE 2012 §7: reduction ratio +
    * pairs completeness) — the evaluation harness that says whether a
    * blocking scheme is safe to deploy: q251's sorted-neighborhood w=3
    * window candidates are scored against the q181 trigram-Jaccard truth
    * pairs. Reduction ratio (candidates avoided vs all C(n,2) pairs) is
    * the cost axis; pairs completeness (truth pairs surviving blocking)
    * is the recall axis — a scheme is production-ready only when BOTH
    * are high, and this query measures them in exact ppm.
    *
    * 100 TB shape: the window candidate set is linear in n (each record
    * emits 3 probes off one global sort); truth comes from the bounded
    * prefix-filtered self-join; the audit itself folds three counts and
    * one candidate∩truth equi-join — nothing quadratic anywhere. */
  private val q327BlockingQuality: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val recs = entityRecords(s, d).cache()
    val truth = partNameSimPairs(s, d)
      .select(least($"r1", $"r2").as("ra"), greatest($"r1", $"r2").as("rb"))
      .distinct().cache()
    val sorted = recs.withColumn("key", lower($"name"))
      .withColumn("rn", row_number().over(Window.orderBy($"key", $"rid")))
      .select($"rid", $"rn")
    val cand = sorted.select($"rid".as("r1"),
        explode(expr("sequence(rn + 1, rn + 3)")).as("rn"))
      .join(sorted.select($"rid".as("r2"), $"rn"), Seq("rn"))
      .select(least($"r1", $"r2").as("ra"), greatest($"r1", $"r2").as("rb"))
      .distinct().cache()
    recs.agg(count(lit(1)).as("n_records"))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
      .crossJoin(broadcast(cand.join(truth, Seq("ra", "rb"))
        .agg(count(lit(1)).as("n_found"))))
      .select($"n_records",
        expr("(n_records * (n_records - 1)) div 2").as("n_possible_pairs"),
        $"n_candidates", $"n_true", $"n_found",
        expr("(((n_records * (n_records - 1)) div 2 - n_candidates) * 1000000)" +
          " div ((n_records * (n_records - 1)) div 2)").as("reduction_ppm"),
        expr("(n_found * 1000000) div n_true").as("completeness_ppm"))
  }

  /** q207's oracle: the shared pair graph, then each synchronous LPA
    * round unrolled as (neighbor-label count → top-1 → relabel) CTEs. */
  private def labelPropOracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""n$i AS (SELECT e.src AS node, l.label, CAST(count(*) AS BIGINT) AS c
                  FROM e JOIN l${i - 1} l ON l.node = e.dst GROUP BY 1, 2),
          t$i AS (SELECT node, label FROM n$i
                  QUALIFY row_number() OVER (PARTITION BY node
                    ORDER BY c DESC, label) = 1),
          l$i AS (SELECT l.node, COALESCE(t.label, l.label) AS label
                  FROM l${i - 1} l LEFT JOIN t$i t USING (node))"""
    }.mkString(",\n          ")
    s"""WITH $entityGraphCte,
          e AS (SELECT r1 AS src, r2 AS dst FROM p
                UNION SELECT r2, r1 FROM p),
          l0 AS (SELECT rid AS node, rid AS label FROM recs),
          $rounds
          SELECT node AS rid, label AS community
          FROM l$iters ORDER BY rid"""
  }

  /** q196's oracle: the shared brute-force pair graph, then each peeling
    * round unrolled as (degree filter → edge restriction) CTE pairs. */
  private def kCoreOracleSql(k: Int, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""k$i AS (SELECT src FROM (
              SELECT src, count(*) AS c FROM e${i - 1} GROUP BY src)
            WHERE c >= $k),
          e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
                  JOIN k$i a ON a.src = e.src
                  JOIN k$i b ON b.src = e.dst)"""
    }.mkString(",\n          ")
    s"""WITH $entityGraphCte,
          e0 AS (SELECT r1 AS src, r2 AS dst FROM p
                 UNION SELECT r2, r1 FROM p),
          $rounds
          SELECT src AS rid, CAST(count(*) AS BIGINT) AS degree
          FROM e$iters GROUP BY src ORDER BY rid"""
  }

  /** End-to-end RAG CONTEXT ASSEMBLY (retrieve → budget-pack — the
    * retrieval-augmented-generation serving step downstream of q144/q145):
    * BM25 top-20 for the fixed query, then the context window is the
    * LONGEST RANK-PREFIX whose cumulative estimated tokens fit the
    * 2000-token budget (cumulative sum is monotone, so `cum ≤ B` is
    * exactly the prefix rule — deterministic, no greedy re-entry).
    * Movement: the corpus-wide work is q144's three BM25 passes; the two
    * windows after it run over 20 rows. Oracle: the SHARED bm25ScoredCtes
    * string (same digits as q144/q145) + the same token estimate and
    * running sum. */
  private val q188RagContext: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val scored = graft.text.Bm25.score(docs, "doc_id", $"text", Seq("spark", "join"))
    val ranked = scored
      .withColumn("rank",
        row_number().over(Window.orderBy($"score".desc, $"doc_id")))
      .filter($"rank" <= 20)
    val toks = docs.select($"doc_id",
      graft.ext.TextAnalysis.estTokens($"text").as("n_tokens"))
    ranked.join(toks, "doc_id")
      .withColumn("cum_tokens",
        sum($"n_tokens").over(Window.orderBy($"rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"rank", $"doc_id", $"score", $"n_tokens", $"cum_tokens",
        ($"cum_tokens" <= 2000L).as("in_context"))
      .orderBy($"rank")
  }

  /** `ts_rewrite` query expansion (the Postgres query-side synonym /
    * thesaurus mechanism, the natural next EP4 ask after weighted rank):
    * the aliases-table rule `window → window | join` expands
    * `merge & window` before it hits the posting lists — the oracle
    * encodes the EXPANDED semantics (merge AND (window OR join)) from the
    * tokenize truth, so a rewrite that fails to apply (or over-applies)
    * breaks the gate. AST matching is commutativity-aware incl. subset
    * match inside wider conjunctions (spec-pinned). */
  private val q133TsRewrite: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
    val postings = PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text"))
    PostingIndex.searchRewritten(postings, "doc_id", "merge & window",
        rules = Seq("window" -> "window | join"), docs.select($"doc_id"))
      .orderBy($"doc_id")
  }

  /** Okapi BM25 over the corpus for `spark join` — the retrieval scorer
    * next to q92's ts_rank (same two terms, so the two rankings are
    * directly comparable): one map-only (dl, tf) pass, a single-row stats
    * agg broadcast back, map-side scoring. See [[graft.text.Bm25]]. */
  private val q144Bm25: Q = (s, d) => {
    import s.implicits._
    graft.text.Bm25.score(Tables.documents(s, d), "doc_id", $"text",
        terms = Seq("spark", "join"))
      .orderBy($"doc_id")
  }

  /** Hybrid retrieval — q144's BM25 top-20 and q46's exact-cosine kNN
    * top-20 (query = vec 0's embedding) fused by reciprocal-rank fusion
    * ([[graft.ext.Hybrid.rrfFuse]], k0=60): the lexical+vector combination
    * every modern retrieval stack runs, here gated end-to-end because both
    * rankings AND the fused doubles replay exactly in DuckDB. The corpus
    * work is the two rankers (map-side BM25, broadcast-query kNN scan);
    * ranking windows run on the bounded top-20 lists, so the only global
    * sorts a 100 TB corpus would see are the two distributed TakeOrdereds. */
  private val q145HybridRrf: Q = (s, d) => {
    import s.implicits._
    val bm = graft.text.Bm25.score(Tables.documents(s, d), "doc_id", $"text",
      terms = Seq("spark", "join"))
    val wBm = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"doc_id")
    val bmTop = bm.orderBy($"score".desc, $"doc_id").limit(20)
      .withColumn("rank", row_number().over(wBm))
      .select($"doc_id", $"rank")
    val emb = Tables.embeddings(s, d).repartition($"vec_id")
    val vecTop = graft.ext.Similarity
      .bruteForceKnn(emb.filter($"vec_id" === 0), emb, k = 20)
      .select($"neighbor_id".as("doc_id"), $"rank")
    graft.ext.Hybrid.rrfFuse(Seq("bm25" -> bmTop, "vec" -> vecTop), "doc_id")
      .orderBy($"rrf".desc, $"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q30_sanitize"          -> q30Sanitize,
    "q31_tokenize_basic"    -> q31TokenizeBasic,
    "q32_ts_match"          -> q32TsMatch,
    "q33_text_stats"        -> q33TextStats,
    "q34_tokenize"          -> q34Tokenize,
    "q35_sanitize_filing"   -> q35SanitizeFiling,
    "q36_ts_search_stemmed" -> q36TsSearchStemmed,
    "q37_posting_search"    -> q37PostingSearch,
    "q38_term_stats"        -> q38TermStats,
    "q39_top_term"          -> q39TopTerm,
    "q89_indexed_search"    -> q89IndexedSearch,
    "q91_phrase_search"     -> q91PhraseSearch,
    "q92_ts_rank"           -> q92TsRank,
    "q99_tsquery_search"    -> q99TsQuerySearch,
    "q106_incr_index"       -> q106IncrIndex,
    "q109_indexed_phrase"   -> q109IndexedPhrase,
    "q110_websearch"        -> q110Websearch,
    "q111_headline"         -> q111Headline,
    "q114_ts_rank_cd"       -> q114TsRankCd,
    "q120_upsert_index"     -> q120UpsertIndex,
    "q363_upsert_buffered"  -> q363BufferedUpsert,
    "q364_index_rebucket"   -> q364IndexRebucket,
    "q121_weighted_rank"    -> q121WeightedRank,
    "q122_ts_stat"          -> q122TsStat,
    "q123_upsert_phrase"    -> q123UpsertPhrase,
    "q125_trigram_fuzzy"    -> q125TrigramFuzzy,
    "q181_entity_clusters"  -> q181EntityClusters,
    "q366_er_stopgram"      -> q366ErStopgram,
    "q184_triangles"        -> q184Triangles,
    "q196_kcore"            -> q196KCore,
    "q207_label_prop"       -> q207LabelProp,
    "q251_sorted_neighborhood" -> q251SortedNeighborhood,
    "q327_blocking_quality" -> q327BlockingQuality,
    "q127_plainto_phraseto" -> q127PlaintoPhraseto,
    "q133_ts_rewrite"       -> q133TsRewrite,
    "q144_bm25"             -> q144Bm25,
    "q145_hybrid_rrf"       -> q145HybridRrf,
    "q188_rag_context"      -> q188RagContext)

  /** The replacement text q120/q123/q124's re-scrape writes: three lexemes
    * (redact/placehold/document after stemming), none a search term, so an
    * upsert batch touches ~3 of 16 buckets and the ghost sweep must come
    * from the doc→bucket sidecar, not from incidental bucket overlap. */
  private[ops] val UpsertPlaceholder = "redacted placeholder document"

  /** The full-corpus "merges AND joining" search oracle, shared verbatim by
    * q37 (in-memory postings), q89 (written index), q106 (incrementally
    * appended index) and q107 (stream-maintained index): all four paths are
    * DEFINED to answer identically, so they must gate against one string —
    * separate copies could drift. */
  private[ops] lazy val mergesJoiningOracle: String =
    s"""SELECT doc_id FROM (
          SELECT doc_id, $tokenizeSql AS toks FROM documents) t
        WHERE list_contains(toks, '${Porter.stem("merges")}')
          AND list_contains(toks, '${Porter.stem("joining")}')
        ORDER BY doc_id"""

  /** Positional-lexeme CTE chain shared by the q91/q92 oracles — the DuckDB
    * twin of PostingIndex.buildPositional: positions over ALL words
    * (parallel unnest zips word with 1-based index), stopwords filtered
    * after numbering, vocab-CASE stemming. */
  private lazy val positionalLexSql: String = positionalLexSqlFrom("documents")

  /** [[positionalLexSql]] over an arbitrary `(doc_id, text)` relation —
    * q123 feeds it the upsert-patched corpus CTE. */
  private def positionalLexSqlFrom(table: String): String =
    s"""raw AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                     x -> length(x) > 0) AS ws
          FROM $table),
        wp AS (
          SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS pos
          FROM raw),
        lex AS (
          SELECT doc_id, $stemCaseSql AS lexeme, pos FROM wp
          WHERE w NOT IN ($stopListSql))"""

  /** The full-corpus `hash <-> join` phrase oracle, shared by q91
    * (in-memory positional postings) and q119 (streaming-maintained
    * positional index): one truth for the phrase semantics regardless of
    * which path produced the postings. */
  private[ops] lazy val hashJoinPhraseOracle: String =
    s"""WITH $positionalLexSql
          SELECT DISTINCT a.doc_id AS doc_id
          FROM lex a JOIN lex b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          WHERE a.lexeme = ${sqlQuote(Porter.stem("hash"))}
            AND b.lexeme = ${sqlQuote(Porter.stem("join"))}
          ORDER BY doc_id"""

  /** BM25 oracle CTE chain shared by q144 and q145 — the DuckDB twin of
    * [[graft.text.Bm25.score]]'s three passes (lexeme multiset → per-doc
    * (dl, tf) → single-row corpus stats → scored docs), ending in a `bm`
    * relation of `(doc_id, score)` rounded to 6 decimals. One truth string:
    * the standalone scorer and the fused hybrid ranking must agree on every
    * digit or they'd drift apart silently. */
  private[ops] lazy val bm25ScoredCtes: String =
    s"""lx AS (
          SELECT doc_id, list_transform(
            list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                        w -> length(w) > 0 AND w NOT IN ($stopListSql)),
            w -> $stemCaseSql) AS ls
          FROM documents),
        base AS (
          SELECT doc_id, CAST(len(ls) AS BIGINT) AS dl,
                 CAST(len(list_filter(ls, x -> x = ${sqlQuote(Porter.stem("spark"))})) AS BIGINT) AS tf0,
                 CAST(len(list_filter(ls, x -> x = ${sqlQuote(Porter.stem("join"))})) AS BIGINT) AS tf1
          FROM lx),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(dl) AS DOUBLE) AS sumdl,
                 CAST(count_if(tf0 > 0) AS DOUBLE) AS df0,
                 CAST(count_if(tf1 > 0) AS DOUBLE) AS df1
          FROM base),
        bm AS (
          SELECT doc_id,
                 round(
                   (CASE WHEN tf0 > 0
                         THEN ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) *
                              (CAST(tf0 AS DOUBLE) * 2.2 /
                               (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sumdl / n))))
                         ELSE 0.0 END)
                 + (CASE WHEN tf1 > 0
                         THEN ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) *
                              (CAST(tf1 AS DOUBLE) * 2.2 /
                               (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sumdl / n))))
                         ELSE 0.0 END), 6) AS score
          FROM base, stats
          WHERE tf0 > 0 OR tf1 > 0)"""

  /** q181/q184's shared oracle CTE chain — record construction, pg_trgm
    * grams, brute-force shared-gram counts, and the integer Jaccard gate
    * ending in `p(r1, r2)`. One string so the two gates cannot drift. */
  private lazy val entityGraphCte: String =
    """recs AS (
           SELECT p_partkey * 2 AS rid, p_name AS name
           FROM part WHERE p_partkey <= 300
           UNION ALL
           SELECT p_partkey * 2 + 1, substr(p_name, 1, 2) || substr(p_name, 4)
           FROM part WHERE p_partkey <= 300 AND p_partkey % 7 = 1),
         w AS (SELECT rid, unnest(list_filter(
                 string_split_regex(lower(name), '[^a-z0-9]+'),
                 x -> length(x) > 0)) AS w FROM recs),
         g AS (SELECT DISTINCT rid, substr('  ' || w || ' ', CAST(i AS INT), 3) AS g
               FROM w, unnest(range(1, length(w) + 2)) AS t(i)),
         n AS (SELECT rid, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY 1),
         shr AS (SELECT a.rid AS r1, b.rid AS r2, CAST(count(*) AS BIGINT) AS o
                 FROM g a JOIN g b ON a.g = b.g AND a.rid < b.rid GROUP BY 1, 2),
         p AS (SELECT r1, r2 FROM shr
               JOIN n n1 ON n1.rid = r1 JOIN n n2 ON n2.rid = r2
               WHERE 20 * o >= 11 * (n1.sz + n2.sz - o))"""

  lazy val oracle: Map[String, String] = Map(
    "q30_sanitize" ->
      s"SELECT doc_id, $sanitizeSql AS clean FROM documents ORDER BY doc_id",
    "q31_tokenize_basic" ->
      s"SELECT doc_id, array_to_string($tokenizeBasicSql, ' ') AS tokens FROM documents ORDER BY doc_id",
    "q32_ts_match" ->
      s"""SELECT doc_id FROM (
            SELECT doc_id, $tokenizeBasicSql AS toks FROM documents) t
          WHERE list_contains(toks, 'spark') AND list_contains(toks, 'join')
          ORDER BY doc_id""",
    "q33_text_stats" ->
      """SELECT doc_id,
         n_chars,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
         CAST(coalesce(list_max(list_transform(ws, w -> length(w))), 0) AS BIGINT) AS max_word_len
         FROM (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  w -> length(w) > 0) AS ws
               FROM documents) t
         ORDER BY doc_id""",
    "q34_tokenize" ->
      s"SELECT doc_id, array_to_string($tokenizeSql, ' ') AS tokens FROM documents ORDER BY doc_id",
    "q35_sanitize_filing" ->
      """SELECT doc_id,
         trim(regexp_replace('10-k main.htm ' || lower(text), '\s+', ' ', 'g')) AS clean
         FROM documents ORDER BY doc_id""",
    "q36_ts_search_stemmed" ->
      s"""SELECT doc_id, lang FROM (
            SELECT doc_id, lang, $tokenizeSql AS toks FROM documents) t
          WHERE list_contains(toks, '${Porter.stem("merges")}')
            AND list_contains(toks, '${Porter.stem("joining")}')
          ORDER BY doc_id""",
    "q37_posting_search" -> mergesJoiningOracle,
    "q89_indexed_search" -> mergesJoiningOracle,
    // the incrementally-maintained index must answer EXACTLY like a fresh
    // full-corpus build — by construction the SAME oracle string as q89
    // (q107, the streaming twin, shares it too)
    "q106_incr_index" -> mergesJoiningOracle,
    // the rebucketed-and-further-grown index is DEFINED to answer like a
    // fresh full-corpus build — the same one truth string as q89/q106
    "q364_index_rebucket" -> mergesJoiningOracle,
    // the upserted index must answer exactly like a fresh build over the
    // FINAL corpus (the %5==0 slice carrying its re-scraped placeholder
    // text); the corrupted v1 suffix never appears here — a surviving
    // ghost posting is an extra row, a over-deleted doc a missing one
    "q120_upsert_index" ->
      s"""WITH corpus AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN ${sqlQuote(UpsertPlaceholder)}
                        ELSE text END AS text
            FROM documents)
          SELECT doc_id FROM (
            SELECT doc_id, $tokenizeSql AS toks FROM corpus) t
          WHERE list_contains(toks, '${Porter.stem("merges")}')
            AND list_contains(toks, '${Porter.stem("joining")}')
          ORDER BY doc_id""",
    // q120's buffered twin answers over the same FINAL corpus, minus the
    // pure-deleted slice; the intermediate ghost batch must leave no trace
    "q363_upsert_buffered" ->
      s"""WITH corpus AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN ${sqlQuote(UpsertPlaceholder)}
                        ELSE text END AS text
            FROM documents
            WHERE NOT (doc_id % 5 = 1 AND doc_id % 3 = 0))
          SELECT doc_id FROM (
            SELECT doc_id, $tokenizeSql AS toks FROM corpus) t
          WHERE list_contains(toks, '${Porter.stem("merges")}')
            AND list_contains(toks, '${Porter.stem("joining")}')
          ORDER BY doc_id""",
    // independent rebuild of the weighted-rank pipeline: positions over
    // all words, title = pos <= 4 at weight 1.0 / body 0.125 (dyadic —
    // exact sums), weighted tf, df over matching docs, idf, then
    // normalization 1 (÷(1+ln(doc_len))) and 32 (s/(s+1))
    "q121_weighted_rank" ->
      s"""WITH raw AS (
            SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                       x -> length(x) > 0) AS ws
            FROM documents),
          wp AS (
            SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS pos
            FROM raw),
          lex AS (
            SELECT doc_id, $stemCaseSql AS lexeme,
                   CASE WHEN pos <= 4 THEN 1.0 ELSE 0.125 END AS wgt
            FROM wp WHERE w NOT IN ($stopListSql)),
          wtf AS (
            SELECT doc_id, lexeme, sum(wgt) AS wtf FROM lex
            WHERE lexeme IN (${sqlQuote(Porter.stem("merge"))},
                             ${sqlQuote(Porter.stem("join"))})
            GROUP BY doc_id, lexeme),
          df AS (SELECT lexeme, count(*) AS df FROM wtf GROUP BY lexeme),
          stats AS (
            SELECT doc_id, count(*) AS doc_len FROM lex
            WHERE doc_id IN (SELECT doc_id FROM wtf) GROUP BY doc_id),
          rawscore AS (
            SELECT w.doc_id,
                   sum(w.wtf * ln((SELECT count(*) FROM documents) * 1.0 / df.df)) AS raw
            FROM wtf w JOIN df USING (lexeme) GROUP BY w.doc_id),
          n1 AS (
            SELECT r.doc_id, r.raw / (1 + ln(s.doc_len)) AS s1
            FROM rawscore r JOIN stats s USING (doc_id))
          SELECT doc_id, round(s1 / (s1 + 1), 6) AS score
          FROM n1 ORDER BY doc_id""",
    // ts_stat from first principles: the positional-lexeme CTE, then ndoc
    // = docs containing the lexeme, nentry = total occurrences
    "q122_ts_stat" ->
      s"""WITH $positionalLexSql
          SELECT lexeme, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndoc,
                 CAST(count(*) AS BIGINT) AS nentry
          FROM lex GROUP BY lexeme ORDER BY lexeme""",
    "q123_upsert_phrase" ->
      s"""WITH corpus AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN ${sqlQuote(UpsertPlaceholder)}
                        ELSE text END AS text
            FROM documents),
          ${positionalLexSqlFrom("corpus")}
          SELECT DISTINCT a.doc_id AS doc_id
          FROM lex a JOIN lex b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          WHERE a.lexeme = ${sqlQuote(Porter.stem("hash"))}
            AND b.lexeme = ${sqlQuote(Porter.stem("join"))}
          ORDER BY doc_id""",
    // both dialects gate against the SAME truth strings their operator
    // siblings use (q37's merges-AND-joining, q91's hash <-> join) — the
    // parsers are new, the semantics must not be
    "q127_plainto_phraseto" ->
      s"""SELECT 'phraseto' AS dialect, doc_id FROM ($hashJoinPhraseOracle) p
          UNION ALL
          SELECT 'plainto' AS dialect, doc_id FROM ($mergesJoiningOracle) m
          ORDER BY dialect, doc_id""",
    // the EXPANDED query's semantics from the tokenize truth: a rewrite
    // that fails to apply would miss the join-only docs, one that
    // over-applies would add window-less merge docs
    "q133_ts_rewrite" ->
      s"""SELECT doc_id FROM (
            SELECT doc_id, $tokenizeSql AS toks FROM documents) t
          WHERE list_contains(toks, '${Porter.stem("merge")}')
            AND (list_contains(toks, '${Porter.stem("window")}')
                 OR list_contains(toks, '${Porter.stem("join")}'))
          ORDER BY doc_id""",
    // independent rebuild of the BM25 math in the engine's exact operation
    // order (same left-assoc arithmetic, Lucene idf, k1=1.2 b=0.75 with
    // 1-b=0.25 exact in binary) so the IEEE doubles replay bit-for-bit;
    // the SHARED scored CTE (q144's digits), the q52 token estimate, and
    // the same running sum — the budget rule is one integer compare
    "q188_rag_context" ->
      s"""WITH $bm25ScoredCtes,
          ranked AS (
            SELECT doc_id, score,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
            FROM bm QUALIFY rank <= 20),
          tk AS (
            SELECT doc_id,
                   CAST(coalesce(list_sum(list_transform(${ExtQueriesShared.wordsAposSql},
                     w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT)
                     AS n_tokens
            FROM documents),
          cum AS (
            SELECT r.rank, r.doc_id, r.score, tk.n_tokens,
                   CAST(sum(tk.n_tokens) OVER (ORDER BY r.rank
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_tokens
            FROM ranked r JOIN tk ON tk.doc_id = r.doc_id)
          SELECT rank, doc_id, score, n_tokens, cum_tokens,
                 cum_tokens <= 2000 AS in_context
          FROM cum ORDER BY rank""",
    // lexemes are the NON-distinct tokenize (tf needs the multiset)
    "q144_bm25" ->
      s"""WITH $bm25ScoredCtes
          SELECT doc_id, score FROM bm ORDER BY doc_id""",
    // both top-20 lists replayed rank-for-rank (rounded BM25 score / q46's
    // cosine, ties by id), fused with the engine's exact term order;
    // CAST(1.0 AS DOUBLE) — DuckDB decimal division would round differently
    "q145_hybrid_rrf" ->
      s"""WITH $bm25ScoredCtes,
          bmr AS (
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS bm25_rank
            FROM bm QUALIFY bm25_rank <= 20),
          vr AS (
            SELECT c.vec_id AS doc_id,
                   CAST(row_number() OVER (
                     ORDER BY list_cosine_similarity(
                                list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
                                list_transform(q.embedding, x -> CAST(x AS DOUBLE))) DESC,
                              c.vec_id) AS INTEGER) AS vec_rank
            FROM embeddings c
            CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            QUALIFY vec_rank <= 20)
          SELECT COALESCE(bmr.doc_id, vr.doc_id) AS doc_id, bm25_rank, vec_rank,
                 round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + bm25_rank), 0.0)
                     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + vec_rank), 0.0), 6) AS rrf
          FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.doc_id
          ORDER BY rrf DESC, doc_id""",
    // independent rebuild of the pg_trgm pipeline: lowercase word split,
    // "  w " padding, 3-char substrings, DISTINCT per string, jaccard;
    // CAST AS DOUBLE (not * 1.0 — DuckDB decimal division would round
    // differently from the engine's IEEE division)
    // brute-force candidates over ALL shared grams (a dropped prefix-filter
    // candidate in the engine fails this gate) + recursive-CTE closure;
    // singletons kept via the nodes base case
    "q181_entity_clusters" ->
      s"""WITH RECURSIVE $entityGraphCte,
         e AS (SELECT r1 AS src, r2 AS dst FROM p UNION SELECT r2, r1 FROM p),
         reach(node, label) AS (
           SELECT rid, rid FROM recs
           UNION
           SELECT e.dst, r.label FROM reach r JOIN e ON e.src = r.node)
         SELECT node AS rid, node // 2 AS partkey, node % 2 AS is_variant,
                min(label) AS component
         FROM reach GROUP BY node ORDER BY rid""",
    // the stop-gram variant's pair set recomputed from scratch under the
    // SAME df cap (grams with df > cap dropped before sizing, candidates
    // and the Jaccard gate), plus the full-metric truth and the overlap —
    // recall_ok is the engine's measured ≥ 0.9 gate, asserted literally
    "q366_er_stopgram" ->
      s"""WITH $entityGraphCte,
          df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1),
          gk AS (SELECT g.rid, g.g FROM g JOIN df USING (g)
                 WHERE df.df <= ${TextQueries.ErStopGramDf}),
          nk AS (SELECT rid, CAST(count(*) AS BIGINT) AS sz FROM gk GROUP BY 1),
          shrk AS (SELECT a.rid AS r1, b.rid AS r2, CAST(count(*) AS BIGINT) AS o
                   FROM gk a JOIN gk b ON a.g = b.g AND a.rid < b.rid GROUP BY 1, 2),
          pk AS (SELECT r1, r2 FROM shrk
                 JOIN nk n1 ON n1.rid = r1 JOIN nk n2 ON n2.rid = r2
                 WHERE 20 * o >= 11 * (n1.sz + n2.sz - o))
          SELECT true AS recall_ok,
                 (SELECT count(*) FROM p) AS n_truth,
                 (SELECT count(*) FROM pk) AS n_capped,
                 (SELECT count(*) FROM p JOIN pk USING (r1, r2)) AS n_hit""",
    "q196_kcore" -> kCoreOracleSql(2, 4),
    "q207_label_prop" -> labelPropOracleSql(3),
    // same sort key, same w=3 rank window, same trigram-jaccard gate
    "q251_sorted_neighborhood" ->
      s"""WITH $entityGraphCte,
          gs AS (SELECT rid, list(g) AS gl FROM g GROUP BY rid),
          r AS (SELECT rid, name,
                  CAST(row_number() OVER (ORDER BY lower(name), rid)
                    AS BIGINT) AS rn
                FROM recs),
          pr AS (SELECT a.rid AS r1, b.rid AS r2
                 FROM r a JOIN r b
                   ON b.rn BETWEEN a.rn + 1 AND a.rn + 3),
          v AS (SELECT least(p.r1, p.r2) AS ra,
                  greatest(p.r1, p.r2) AS rb
                FROM pr p JOIN gs a ON a.rid = p.r1
                JOIN gs b ON b.rid = p.r2
                WHERE CAST(len(list_intersect(a.gl, b.gl)) AS BIGINT) * 20
                  >= 11 * (CAST(len(a.gl) AS BIGINT)
                           + CAST(len(b.gl) AS BIGINT)
                           - CAST(len(list_intersect(a.gl, b.gl)) AS BIGINT)))
          SELECT DISTINCT ra, rb FROM v ORDER BY ra, rb""",
    // the same window candidates and brute-force truth pairs, folded to
    // the same ppm reduction/completeness pair
    "q327_blocking_quality" ->
      s"""WITH $entityGraphCte,
          r AS (SELECT rid, CAST(row_number() OVER (ORDER BY lower(name), rid)
                  AS BIGINT) AS rn
                FROM recs),
          pr AS (SELECT DISTINCT least(a.rid, b.rid) AS ra,
                   greatest(a.rid, b.rid) AS rb
                 FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3),
          tp AS (SELECT DISTINCT least(r1, r2) AS ra, greatest(r1, r2) AS rb
                 FROM p),
          st AS (SELECT
                  (SELECT CAST(count(*) AS BIGINT) FROM recs) AS n_records,
                  (SELECT CAST(count(*) AS BIGINT) FROM pr) AS n_candidates,
                  (SELECT CAST(count(*) AS BIGINT) FROM tp) AS n_true,
                  (SELECT CAST(count(*) AS BIGINT)
                   FROM pr JOIN tp USING (ra, rb)) AS n_found)
          SELECT n_records,
                 (n_records * (n_records - 1)) // 2 AS n_possible_pairs,
                 n_candidates, n_true, n_found,
                 (((n_records * (n_records - 1)) // 2 - n_candidates) * 1000000)
                   // ((n_records * (n_records - 1)) // 2) AS reduction_ppm,
                 (n_found * 1000000) // n_true AS completeness_ppm
          FROM st""",
    // the same brute-force pair graph, then the same two triangle joins
    "q184_triangles" ->
      s"""WITH $entityGraphCte,
         tri AS (SELECT a.r1 AS x, a.r2 AS y, b.r2 AS z
                 FROM p a JOIN p b ON b.r1 = a.r2
                 JOIN p c ON c.r1 = a.r1 AND c.r2 = b.r2),
         nodes AS (SELECT unnest([x, y, z]) AS rid FROM tri)
         SELECT rid, CAST(count(*) AS BIGINT) AS n_tri
         FROM nodes GROUP BY rid ORDER BY rid""",
    "q125_trigram_fuzzy" ->
      """WITH probes AS (
           SELECT p_partkey AS probe_id,
                  substr(p_name, 1, 2) || substr(p_name, 4) AS probe_name
           FROM part WHERE p_partkey % 53 = 1),
         cw AS (SELECT p_partkey, unnest(list_filter(
                  string_split_regex(lower(p_name), '[^a-z0-9]+'),
                  x -> length(x) > 0)) AS w FROM part),
         cg AS (SELECT DISTINCT p_partkey, substr('  ' || w || ' ', CAST(i AS INT), 3) AS g
                FROM cw, unnest(range(1, length(w) + 2)) AS t(i)),
         cn AS (SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_c FROM cg GROUP BY 1),
         pw AS (SELECT probe_id, unnest(list_filter(
                  string_split_regex(lower(probe_name), '[^a-z0-9]+'),
                  x -> length(x) > 0)) AS w FROM probes),
         pgr AS (SELECT DISTINCT probe_id, substr('  ' || w || ' ', CAST(i AS INT), 3) AS g
                 FROM pw, unnest(range(1, length(w) + 2)) AS t(i)),
         pn AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_p FROM pgr GROUP BY 1),
         shr AS (
           SELECT c.p_partkey, p.probe_id, CAST(count(*) AS BIGINT) AS shared
           FROM cg c JOIN pgr p ON c.g = p.g
           GROUP BY 1, 2)
         SELECT s.p_partkey, s.probe_id, s.shared,
                round(CAST(s.shared AS DOUBLE) / (cn.n_c + pn.n_p - s.shared), 6) AS sim
         FROM shr s JOIN cn ON s.p_partkey = cn.p_partkey
                    JOIN pn ON s.probe_id = pn.probe_id
         WHERE CAST(s.shared AS DOUBLE) / (cn.n_c + pn.n_p - s.shared) >= 0.3
         ORDER BY s.p_partkey, s.probe_id""",
    "q38_term_stats" ->
      """WITH tf AS (
           SELECT doc_id, w, count(*) AS tf
           FROM (SELECT doc_id, unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> length(x) > 0)) AS w
                 FROM documents) t
           GROUP BY doc_id, w)
         SELECT w, count(*) AS df, CAST(sum(tf) AS BIGINT) AS sum_tf,
                round(ln((SELECT count(*) FROM documents) * 1.0 / count(*)), 6) AS idf
         FROM tf GROUP BY w ORDER BY w""",
    "q39_top_term" ->
      """WITH tf AS (
           SELECT doc_id, w, count(*) AS tf
           FROM (SELECT doc_id, unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> length(x) > 0)) AS w
                 FROM documents) t
           GROUP BY doc_id, w)
         SELECT doc_id, w AS top_term, tf FROM (
           SELECT doc_id, w, tf,
                  row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, w) AS rk
           FROM tf) r
         WHERE rk = 1 ORDER BY doc_id""",
    "q109_indexed_phrase" ->
      s"""WITH $positionalLexSql,
          ph AS (SELECT DISTINCT a.doc_id AS doc_id
                 FROM lex a JOIN lex b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                 WHERE a.lexeme = ${sqlQuote(Porter.stem("hash"))}
                   AND b.lexeme = ${sqlQuote(Porter.stem("join"))}),
          pref AS (SELECT DISTINCT doc_id FROM lex WHERE lexeme LIKE 'vec%')
          SELECT doc_id FROM (SELECT doc_id FROM ph UNION SELECT doc_id FROM pref) t
          ORDER BY doc_id""",
    "q110_websearch" ->
      s"""WITH $positionalLexSql,
          m AS (SELECT DISTINCT doc_id FROM lex
                WHERE lexeme = ${sqlQuote(Porter.stem("merge"))}),
          w AS (SELECT DISTINCT doc_id FROM lex
                WHERE lexeme = ${sqlQuote(Porter.stem("window"))}),
          ph AS (SELECT DISTINCT a.doc_id AS doc_id
                 FROM lex a JOIN lex b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                 WHERE a.lexeme = ${sqlQuote(Porter.stem("hash"))}
                   AND b.lexeme = ${sqlQuote(Porter.stem("join"))})
          SELECT doc_id FROM (
            SELECT doc_id FROM m WHERE doc_id NOT IN (SELECT doc_id FROM w)
            UNION SELECT doc_id FROM ph) t
          ORDER BY doc_id""",
    "q111_headline" ->
      s"""WITH t AS (SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> length(x) > 0) AS ws
                     FROM documents),
          st AS (SELECT doc_id, ws, list_transform(ws, w -> $stemCaseSql) AS stems
                 FROM t),
          f AS (SELECT doc_id, ws, stems,
                  least(nullif(list_position(stems, ${sqlQuote(Porter.stem("merge"))}), 0),
                        nullif(list_position(stems, ${sqlQuote(Porter.stem("slow"))}), 0)) AS p
                FROM st)
          SELECT doc_id,
            array_to_string(
              list_transform(range(greatest(1, p - 2), least(len(ws), p + 5) + 1),
                i -> CASE WHEN stems[i] IN (${sqlQuote(Porter.stem("merge"))},
                                            ${sqlQuote(Porter.stem("slow"))})
                          THEN '<b>' || ws[i] || '</b>' ELSE ws[i] END),
              ' ') AS headline
          FROM f WHERE p IS NOT NULL ORDER BY doc_id""",
    "q91_phrase_search" -> hashJoinPhraseOracle,
    "q92_ts_rank" ->
      s"""WITH $positionalLexSql,
          tf AS (SELECT doc_id, lexeme, count(*) AS tf FROM lex
                 WHERE lexeme IN (${sqlQuote(Porter.stem("spark"))},
                                  ${sqlQuote(Porter.stem("join"))})
                 GROUP BY doc_id, lexeme),
          df AS (SELECT lexeme, count(*) AS df FROM tf GROUP BY lexeme)
          SELECT t.doc_id AS doc_id,
                 round(sum(t.tf * ln((SELECT count(*) FROM documents) * 1.0 / d.df)), 6) AS score
          FROM tf t JOIN df d USING (lexeme)
          GROUP BY t.doc_id ORDER BY doc_id""",
    "q114_ts_rank_cd" ->
      s"""WITH $positionalLexSql,
          p AS (SELECT doc_id, lexeme, pos FROM lex
                WHERE lexeme IN (${sqlQuote(Porter.stem("spark"))},
                                 ${sqlQuote(Porter.stem("join"))})),
          re AS (SELECT DISTINCT doc_id, pos AS r FROM p),
          lmax AS (SELECT e.doc_id, e.r, q.lexeme, max(q.pos) AS m
                   FROM re e JOIN p q ON q.doc_id = e.doc_id AND q.pos <= e.r
                   GROUP BY e.doc_id, e.r, q.lexeme),
          lb AS (SELECT doc_id, r, min(m) AS l FROM lmax
                 GROUP BY doc_id, r HAVING count(*) = 2),
          rmin AS (SELECT w.doc_id, w.l, q.lexeme, min(q.pos) AS m
                   FROM (SELECT DISTINCT doc_id, l FROM lb) w
                   JOIN p q ON q.doc_id = w.doc_id AND q.pos >= w.l
                   GROUP BY w.doc_id, w.l, q.lexeme),
          rt AS (SELECT doc_id, l, max(m) AS r2 FROM rmin GROUP BY doc_id, l),
          covers AS (SELECT lb.doc_id, lb.l, lb.r FROM lb
                     JOIN rt ON rt.doc_id = lb.doc_id AND rt.l = lb.l
                            AND rt.r2 = lb.r)
          SELECT doc_id, round(sum(1.0 / (r - l + 1)), 6) AS score
          FROM covers GROUP BY doc_id ORDER BY doc_id""",
    "q99_tsquery_search" ->
      s"""SELECT doc_id FROM (
            SELECT doc_id, $tokenizeSql AS toks FROM documents) t
          WHERE (list_contains(toks, '${Porter.stem("merge")}')
                 AND NOT (list_contains(toks, '${Porter.stem("window")}')
                          OR list_contains(toks, '${Porter.stem("join")}')))
             OR len(list_filter(toks, x -> x LIKE '${Porter.stem("vec")}%')) > 0
          ORDER BY doc_id""")
}
