package graft.ops
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.{CountMin, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.io.Tables

/** Helpers, tuning constants, and oracle-SQL fragments shared by the
  * [[ExtQueries]] catalog parts (split from the original single file). */
private[graft] object ExtQueriesShared {

  private[ops] def sqlList(ws: Seq[String]): String =
    ws.map(w => "'" + w.replace("'", "''") + "'").mkString("[", ", ", "]")

  /** Pre/post read-path agreement gate for the index-lifecycle queries
    * (q363/q365/q367): `intersect` alone is a SET op, so an overlay read
    * that leaks a stale row ALONGSIDE a key's live one still intersects
    * to the correct set — only LOST rows break a bare intersection. The
    * equal-count check first makes leaked/duplicated overlay rows fail
    * loudly too; both counts are bounded by the query's own result. */
  private[ops] def gatedIntersect(pre: org.apache.spark.sql.DataFrame,
                                  post: org.apache.spark.sql.DataFrame,
                                  what: String): org.apache.spark.sql.DataFrame = {
    val preN = pre.count()
    val postN = post.count()
    require(preN == postN,
      s"$what: overlay (pre-fold) read returned $preN rows but the folded " +
        s"read $postN — a leaked stale / duplicated / lost overlay row " +
        "that a bare intersect would hide")
    pre.intersect(post)
  }


  /** Shingled corpus with the compute spread across all cores: any doc_id
    * slice is pushed into the parquet scan FIRST, then rows are
    * hash-repartitioned BEFORE the shingle projection. The repartition
    * matters at both ends of the scale: locally a tiny corpus arrives as a
    * single scan split (one small file = one task) and would serialize the
    * compute-dense higher-order shingle/minhash expressions onto one core;
    * on a 1000-executor cluster the same repartition bounds per-task work
    * independent of row-group layout. Shuffling (doc_id, text) here is
    * cheap — text is the column the next stage consumes anyway. */
  private[ops] def shingled(s: org.apache.spark.sql.SparkSession, d: String,
                       maxDocId: Option[Int] = None) = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    maxDocId.fold(docs)(m => docs.filter($"doc_id" < m))
      .repartition($"doc_id")
      .select($"doc_id", Dedup.shingleSet($"text", 3).as("sh"))
      .filter(size($"sh") > 0)
  }


  /** Brute-force slice bound shared by the q42 engine query AND its oracle
    * SQL (generated below from this same constant), so the query stays
    * scale-independent: at any sf, both sides compare pairs over exactly
    * doc_id < BruteForceSlice. */
  private[ops] val BruteForceSlice = 500


  /** Jaccard threshold for q43's LSH path — chosen so that LSH recall with
    * (bands=32, rowsPerBand=4) is effectively 1: a pair at exactly j=0.8 is
    * missed with probability (1 - 0.8^4)^32 ≈ 5e-8, and planted near-dup
    * pairs in the testdata all have j ≥ 0.9 (miss prob < 1e-15). At the
    * borderline j=0.5 recall would only be 1-(1-0.5^4)^32 ≈ 0.873, which is
    * why the output threshold is raised instead. */
  private[ops] val LshJaccardThreshold = 0.8


  /** Slice bound for q48 shared by engine and oracle (scale-independent
    * brute force, same pattern as q42). */
  private[graft] val CosineSlice = 500


  /** The shared recall-contract harness behind q100/q112/q115 (q47's
    * pattern, generalized): exact brute-force top-10 for the 5 query
    * vectors is the ground truth, `ann`'s hits are counted by left-semi
    * join, and ONLY the gate boolean (recall ≥ 0.9, vacuously true on
    * empty truth — the NULL-division guard) plus the truth count publish.
    * One harness, one gate rule: a tiebreak or k change cannot drift
    * between the three contracts. */
  private[ops] def recallGate(s: org.apache.spark.sql.SparkSession, d: String)(
      ann: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).repartition($"vec_id").cache()
    val q = emb.filter($"vec_id" < 5)
    val truth = Similarity.bruteForceKnn(q, emb, k = 10)
      .select("query_id", "neighbor_id")
    val hit = truth.join(ann(q, emb).select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(when($"n_truth" === 0, lit(true))
        .otherwise($"n_hit".cast("double") / $"n_truth" >= 0.9).as("recall_ok"),
        $"n_truth")
  }


  /** The GPT-2-SHAPED pre-tokenizer regex, lookahead-free so it means the
    * same thing in Java regex and RE2/DuckDB (the original's `\s+(?!\S)`
    * branch needs lookahead; dropping it only changes how a trailing
    * whitespace run groups). Apostrophe contractions, space-glued
    * letter/digit/punctuation runs, residual whitespace runs. */
  private[ops] val PreTokenRegex =
    """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""


  /** Paragraph width for q103 — 8-word segments actually repeat across this
    * corpus (sf0.01: 3609 segments, 3434 distinct), so the dedup genuinely
    * drops text. Shared with the oracle SQL. */
  private[ops] val ParaWords = 8


  /** q135's span width: the smallest span ExactSubstr treats as duplicated
    * text (the paper uses 50 BPE tokens; 10 words is the same idea at this
    * corpus's ~55-word documents). */
  private[ops] val ExactSubstrK = 10


  /** How many top pairs q136 reports per phase. */
  private[ops] val BpeTopK = 10


  /** q139: how many BPE merges the tokenizer learns before counting. */
  private[ops] val BpeMerges = 3


  /** q137's gate: max NLL per scored token in integer micro-nats.
    * 3.4 nats/token ≈ perplexity 30 — the corpus median at sf0.01, so the
    * flag actually splits the data instead of being vacuously true. */
  private[ops] val LmNllPerTokenMicro = 3400000L


  /** Bloom false-positive gate for q105: incoming has 100 genuinely-new
    * docs; at fpp=0.01 the expected FP count is ~1, so ≤5 is a stable
    * deterministic bound (the filter is fixed-seed Murmur3 — the same
    * bits on every run at any cluster size). */
  private[ops] val BloomFpBound = 5L


  /** SPRT hypotheses and boundaries (q347 batch + q348 streaming), in
    * exact integer micro-nats. The per-trial log-likelihood-ratio
    * increments are COMPILE-TIME Scala constants injected into both the
    * engine plans and the oracle SQL, so all sides fold identical longs
    * by construction (the lnM rule, taken to its limit: quantize ONCE,
    * at authoring time). H0: p = 0.15, H1: p = 0.20 (bracketing the
    * corpus's ~0.198 purchase share from below, so the test genuinely
    * terminates); α = β = 0.05 → boundaries ±ln(19). */
  private[ops] val SprtIncSuccess = math.round(math.log(0.20 / 0.15) * 1e6) // +287682
  private[ops] val SprtIncFailure = math.round(math.log(0.80 / 0.85) * 1e6) // −60625
  private[ops] val SprtBoundary = math.round(math.log(19.0) * 1e6) // 2944439

  /** The SPRT oracle (shared verbatim by q347 and its streaming twin
    * q348 — the stream is gated against the SAME batch truth). */
  private[ops] val sprtOracleSql: String =
    s"""WITH daily AS (
          SELECT (user_id % 2 = 0) AS arm_a, CAST(ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        cum AS (
          SELECT arm_a, day,
                 CAST(sum(n) OVER wd AS BIGINT) AS cn,
                 CAST(sum(c) OVER wd AS BIGINT) AS cc,
                 CAST($SprtIncSuccess * sum(c) OVER wd
                   + ($SprtIncFailure) * (sum(n) OVER wd - sum(c) OVER wd)
                   AS BIGINT) AS llr
          FROM daily
          WINDOW wd AS (PARTITION BY arm_a ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        crossed AS (
          SELECT arm_a, day AS cross_day, llr AS cross_llr FROM (
            SELECT arm_a, day, llr, row_number() OVER (
              PARTITION BY arm_a ORDER BY day) AS rn
            FROM cum WHERE abs(llr) >= $SprtBoundary) WHERE rn = 1),
        fin AS (
          SELECT arm_a, cn AS n_trials, cc AS n_success,
                 llr AS llr_micro_final FROM (
            SELECT arm_a, cn, cc, llr, row_number() OVER (
              PARTITION BY arm_a ORDER BY day DESC) AS rn
            FROM cum) WHERE rn = 1)
        SELECT fin.arm_a, n_trials, n_success, llr_micro_final, cross_day,
               CASE WHEN cross_llr IS NULL THEN 'continue'
                    WHEN cross_llr > 0 THEN 'accept_h1'
                    ELSE 'accept_h0' END AS decision
        FROM fin LEFT JOIN crossed ON fin.arm_a = crossed.arm_a
        ORDER BY fin.arm_a"""


  /** Weighted reservoir sampling per group (Efraimidis–Spirakis A-ES,
    * IPL 2006): each row draws key = u^(1/w) and the k largest keys per
    * group are the sample — the one-pass, mergeable weighted sampler a
    * 100 TB mixture builder uses to draw per-source subsets biased toward
    * long documents without ever materializing a global sort. Movement:
    * key derivation is map-only over the scan; the only shuffle is the
    * per-source top-k window (at scale: partial top-k per partition via
    * the q13 bounded-heap pattern before the final per-group merge).
    *
    * Oracle-exactness trick (the q121 dyadic-weights idea applied to
    * POWERS): weights are restricted to {1,2,4,8}, so u^(1/w) is an
    * IEEE-sqrt CHAIN (sqrt, sqrt∘sqrt, sqrt∘sqrt∘sqrt) — sqrt is
    * correctly rounded by IEEE-754 in every engine, and u itself is a
    * dyadic rational ((md5-derived 52-bit int + 1) / 2^52, exactly
    * representable) — so the keys, the ranking, AND the emitted key
    * doubles are bit-identical in Spark and DuckDB. A transcendental
    * formulation (-ln u / w) would be last-ulp hostage to libm. */
  /** q176/q182's shared map stage: every document with its A-ES reservoir
    * key (see q176's Scaladoc for the sqrt-chain exactness argument). */
  private[ops] def weightedKeyedDocs(s: org.apache.spark.sql.SparkSession,
                                     d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("weight",
        when($"n_chars" >= 2000, 8L).when($"n_chars" >= 1000, 4L)
          .when($"n_chars" >= 500, 2L).otherwise(1L))
      .withColumn("u",
        (conv(substring(md5(concat($"doc_id".cast("string"), lit(":wrs1"))), 1, 13), 16, 10)
          .cast("long").cast("double") + lit(1d)) / lit(4503599627370496d)) // 2^52
      .withColumn("wkey",
        when($"weight" === 8L, sqrt(sqrt(sqrt($"u"))))
          .when($"weight" === 4L, sqrt(sqrt($"u")))
          .when($"weight" === 2L, sqrt($"u"))
          .otherwise($"u"))
      .select($"source", $"doc_id", $"weight", $"wkey")
  }


  /** q187/q195's shared fold assignment — ONE expression so the CV split
    * and its contamination audit can never disagree about which fold a
    * document landed in. Content-stable md5 bucket, no RNG state. */
  private[ops] def cvFold(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(id.cast("string"), lit(":cv"))), 1, 8), 16, 10)
      .cast("long") % 5


  /** q202's rows-per-task target shared with its oracle: the salt factor
    * is ceil(cnt / target) — how many subtasks a hot key needs so no
    * single task exceeds the target. */
  private[ops] val SkewTargetRows = 1000L


  /** q204's dictionary, shared with its oracle. Deliberately includes
    * nested patterns ("scan"⊃"can"⊃"an", "table"⊃"able", "a" inside
    * nearly everything) and multi-word phrases — the shapes that force K
    * separate scans without an automaton. Every pattern is BORDERLESS
    * (no proper prefix = suffix; asserted in AhoCorasickSpec), which
    * makes all-occurrence counting identical to greedy non-overlapping
    * counting, so DuckDB's length-delta//replace trick is an EXACT
    * oracle for the automaton's counts. */
  private[graft] val AcKeywords: Seq[String] = Seq(
    "a", "able", "an", "can", "eam", "hash join", "join",
    "merge batch", "scan", "stream", "table", "value")


  /** q205's compaction target (chars stand in for bytes on the synthetic
    * corpus), shared with the oracle. */
  private[ops] val CompactTargetBytes = 4096L


  /** q218's token budget, shared with the oracle. */
  private[ops] val SelectBudgetTokens = 20000L


  /** q261's support thresholds, shared with the oracle. */
  private[ops] val AprioriItemSupport = 20L

  private[ops] val AprioriPairSupport = 2L


  /** q264's holdout size, shared with the oracle. */
  private[ops] val HoldoutQuota = 50L


  /** q283's shared bin edges and smoothing — also baked into the oracle. */
  private[ops] val PsiBinEdges = Seq(500L, 1000L, 2000L, 4000L)


  /** q322's segment width and within-source document-frequency floor —
    * 4-word segments repeat across this corpus's docs (sf0.01: 21
    * per-source segments hit df ≥ 2), so the strip genuinely removes
    * text. Shared with the oracle SQL. */
  private[ops] val BoilerplateSegWords = 4

  private[ops] val BoilerplateDfMin = 2


  private[ops] val wordsSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0)"

  private[ops] val wordsAposSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), w -> length(w) > 0)"


  /** Shared q98/q126 oracle CTE: the deterministic IVF quantizer (first-8
    * centroids, argmax cosine with the (ccos desc, cid asc) tiebreak) and
    * per-vector cell assignment — ONE string so the two oracles can't
    * drift from each other (they already share the engine path). */
  private[ops] val ivfCellsCteSql =
    """cent AS (
           SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
           FROM embeddings WHERE vec_id < 8),
         cells AS (
           SELECT vec_id, embedding, cid FROM (
             SELECT v.vec_id, v.embedding, cid,
                    row_number() OVER (
                      PARTITION BY v.vec_id
                      ORDER BY list_cosine_similarity(
                                 list_transform(v.embedding, x -> CAST(x AS DOUBLE)),
                                 cv) DESC, cid) AS rk
             FROM embeddings v CROSS JOIN cent) t
           WHERE rk = 1)"""


  /** Oracle twin of `shingled` — `where` mirrors the engine-side slice so
    * engine and oracle always scan the same document subset at any sf. */
  private[ops] def shingleCte(where: String) =
    s"""WITH t AS (
          SELECT doc_id, $wordsSql AS ws FROM documents $where),
        s AS (
          SELECT doc_id,
                 list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
          FROM t WHERE len(ws) >= 3)"""


  private[ops] def jaccardPairsSql(where: String, threshold: Double) =
    s"""${shingleCte(where)}
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.sh, b.sh)) * 1.0
                   / len(list_distinct(a.sh || b.sh)) AS jaccard
          FROM s a JOIN s b ON a.doc_id < b.doc_id) p
        WHERE jaccard > $threshold
        ORDER BY doc_a, doc_b"""


  private[ops] lazy val langCaseSql: String = {
    val hits = TextAnalysis.langMarkers.map { case (code, m) =>
      code -> s"len(list_intersect(list_distinct(ws), ${sqlList(m)}))"
    }.toMap
    val (en, de, fr, es) = (hits("en"), hits("de"), hits("fr"), hits("es"))
    s"""CASE
        WHEN $en > 0 AND $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
        WHEN $de > 0 AND $de >= $fr AND $de >= $es THEN 'de'
        WHEN $fr > 0 AND $fr >= $es THEN 'fr'
        WHEN $es > 0 THEN 'es'
        ELSE 'und' END"""
  }


  private[ops] lazy val enStopSql: String =
    sqlList(TextAnalysis.langMarkers.collectFirst { case ("en", m) => m }.get)


  /** The greedy-packer CTE chain (chunk word-counts -> recursive pack
    * assignment) over a CTE named `src` holding (doc_id, ws) — shared by
    * the q101 and q116 oracles so the packer definition exists once. The
    * enclosing WITH must be RECURSIVE. */
  private[ops] def packerSql(src: String): String =
    s"""c AS (SELECT doc_id,
                  [len(ws[s+1 : s+50]) for s in range(0, len(ws), 40)] AS wcs
                FROM $src WHERE len(ws) > 0),
          ch AS (SELECT doc_id,
                   unnest(range(1, len(wcs)+1)) AS chunk_id,
                   unnest(wcs) AS w
                 FROM c),
          packed AS (
            SELECT doc_id, chunk_id, CAST(1 AS BIGINT) AS pack_id,
                   CAST(w AS BIGINT) AS acc, CAST(w AS BIGINT) AS n_words
            FROM ch WHERE chunk_id = 1
            UNION ALL
            SELECT c.doc_id, c.chunk_id,
                   CASE WHEN p.acc + c.w > 120 THEN p.pack_id + 1 ELSE p.pack_id END,
                   CASE WHEN p.acc + c.w > 120 THEN CAST(c.w AS BIGINT)
                        ELSE p.acc + c.w END,
                   CAST(c.w AS BIGINT)
            FROM packed p JOIN ch c
              ON c.doc_id = p.doc_id AND c.chunk_id = p.chunk_id + 1)"""


  /** One truth, one oracle: the q100/q112/q115 recall contracts all gate
    * against THE SAME exact brute-force top-10 — the oracle SQL exists
    * once so the ground-truth definition cannot drift between them. */
  private[ops] val recallOracleSql: String =
    """SELECT true AS recall_ok,
           (SELECT CAST(count(*) AS BIGINT) FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                                  list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(q.embedding, x -> CAST(x AS DOUBLE))) DESC,
                                c.vec_id) AS rank
              FROM embeddings c
              CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q) t
            WHERE rank <= 10) AS n_truth"""


  /** q179/q190's CDC chunk rows over any source relation — the full
    * breakpoint + per-chunk-hash replay as one parameterized SELECT (own
    * WITH, usable as a derived table), so the chunking and the
    * delete-propagation gates share one definition. */
  private[ops] def cdcChunkRowsSql(from: String): String =
    s"""WITH t AS (
           SELECT doc_id, text, length(text) AS L,
                  list_transform(string_split(text, ''),
                                 c -> CAST(ascii(c) AS BIGINT)) AS cs
           FROM $from WHERE length(text) > 0),
         b AS (
           SELECT doc_id, text, L, cs,
                  list_filter(range(16, L + 1), i ->
                    list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i-15:i]),
                                (a, c) -> (a * 31 + c) % 1000000007) % 128 = 7)
                    AS bps
           FROM t),
         e AS (
           SELECT doc_id, cs,
                  CASE WHEN len(bps) > 0 AND bps[-1] = L THEN bps
                       ELSE list_append(bps, L) END AS ends
           FROM b)
         SELECT doc_id, CAST(j AS BIGINT) AS chunk_idx,
                CAST(CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END AS BIGINT) AS start,
                CAST(ends[j] - CASE WHEN j = 1 THEN 0 ELSE ends[j-1] END AS BIGINT) AS len,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  cs[(CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END):ends[j]]),
                  (a, c) -> (a * 31 + c) % 1000000007) AS chunk_hash
         FROM e, unnest(generate_series(1, len(ends))) AS u(j)"""


  /** The q49 IVF replay, shared VERBATIM by q191: the disk-backed index
    * is DEFINED to answer exactly like the in-memory path over the same
    * corpus and quantizer, so both gate against one string. */
  private[ops] lazy val ivfKnnOracleSql: String =
    """WITH cent AS (
           SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
           FROM embeddings WHERE vec_id < 8),
         assign AS (
           SELECT v.vec_id, v.embedding, cid,
                  row_number() OVER (
                    PARTITION BY v.vec_id
                    ORDER BY list_cosine_similarity(
                               list_transform(v.embedding, x -> CAST(x AS DOUBLE)), cv) DESC,
                             cid) AS crk
           FROM embeddings v CROSS JOIN cent),
         cells AS (SELECT vec_id AS neighbor_id, embedding AS cvec, cid FROM assign WHERE crk = 1),
         probes AS (SELECT vec_id AS query_id, embedding AS qv, cid FROM assign
                    WHERE vec_id < 5 AND crk <= 2),
         ranked AS (
           SELECT query_id, neighbor_id,
                  row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY list_cosine_similarity(
                               list_transform(qv, x -> CAST(x AS DOUBLE)),
                               list_transform(cvec, x -> CAST(x AS DOUBLE))) DESC,
                             neighbor_id) AS rank
           FROM probes JOIN cells USING (cid))
         SELECT query_id, rank, neighbor_id FROM ranked
         WHERE rank <= 10 ORDER BY query_id, rank"""


  /** q176's reservoir oracle, shared VERBATIM by q182: the streaming
    * sampler is defined to equal the batch sample exactly, so both must
    * gate against one string — separate copies could drift (the
    * mergesJoiningOracle principle). */
  private[ops] lazy val wrsOracleSql: String =
    """SELECT source, rank, doc_id, weight, wkey FROM (
         SELECT source, doc_id, weight, wkey,
                CAST(row_number() OVER (
                  PARTITION BY source ORDER BY wkey DESC, doc_id) AS INT) AS rank
         FROM (
           SELECT source, doc_id, weight,
                  CASE WHEN weight = 8 THEN sqrt(sqrt(sqrt(u)))
                       WHEN weight = 4 THEN sqrt(sqrt(u))
                       WHEN weight = 2 THEN sqrt(u) ELSE u END AS wkey
           FROM (
             SELECT source, doc_id,
                    CASE WHEN n_chars >= 2000 THEN CAST(8 AS BIGINT)
                         WHEN n_chars >= 1000 THEN 4
                         WHEN n_chars >= 500 THEN 2 ELSE 1 END AS weight,
                    (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':wrs1'), 1, 13)
                          AS BIGINT) AS DOUBLE) + 1) / 4503599627370496.0 AS u
             FROM documents) t0) t1) t2
       WHERE rank <= 5 ORDER BY source, rank"""

}
