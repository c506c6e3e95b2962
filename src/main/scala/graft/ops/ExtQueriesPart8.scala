package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.Tables
import graft.ops.ExtQueriesShared.wordsSql

/** Catalog part 8 — TRAINING-RUN OPERATIONS: the decisions a pipeline
  * makes between "corpus is clean" (parts 1–7) and "tokens hit the
  * trainer" — mixture weighting across sources, context-window packing
  * efficiency, agreement between competing quality gates, and
  * train/validation split leakage. Reference scope: sec_dl ends at the
  * indexed corpus (`sec_dl/utils/scrape_all_filings.py:1` stops at
  * ingest); these are the scale-side consumers of that corpus.
  *
  * House numerics: token counts and contingency counts are exact longs;
  * the only float op is IEEE `sqrt` (correctly rounded in both engines,
  * q317 precedent), floored to an integer immediately — every query
  * hash-matches its DuckDB oracle bit-for-bit at any partitioning. */
private[ops] object ExtQueriesPart8 {

  /** q353's token budget: fixed at authoring time so the allocation math
    * is a pure function of the corpus (shared with the oracle SQL). */
  private val MixBudgetTokens = 1000000L

  /** q354's context window, in whitespace-ish tokens. */
  private val PackWindow = 512L

  /** MIXTURE TEMPERATURE SWEEP — the sampling-weight table a multi-source
    * training run derives from per-source token mass: w_i ∝ t_i^α for
    * α ∈ {0, ½, 1} (uniform / sqrt-damped / proportional — the three
    * closed-form points of the temperature family; fractional α needs
    * pow(), whose cross-engine rounding the house rules ban). Per α the
    * table reports each source's weight (ppm) and how many epochs of that
    * source a [[MixBudgetTokens]] budget implies (milli-epochs > 1000 ⇒
    * the source repeats — the oversampling alarm from the data-mixing
    * literature, e.g. the Pile/Gopher weighting tables).
    *
    * 100 TB shape: ONE map-side-combinable aggregate over documents →
    * |sources| rows; the α sweep explodes 3× on that value-domain frame
    * and the per-α total rides a |sources|-row window. sqrt(t) is exact:
    * IEEE sqrt is correctly rounded and t < 2^52, so floor() agrees
    * across engines bit-for-bit. */
  private val q353MixtureTemperature: Q = (s, d) => {
    import s.implicits._
    val per = Tables.documents(s, d)
      .select($"source", graft.text.TextOps.words($"text").as("ws"))
      .select($"source", size($"ws").cast("long").as("tk"))
      .groupBy($"source").agg(sum($"tk").as("t"))
    val grid = per.select($"source", $"t", explode(array(
        struct(lit(0L).as("alpha_pm"), lit(1L).as("r")),
        struct(lit(500L).as("alpha_pm"),
          expr("cast(floor(sqrt(cast(t as double))) as bigint)").as("r")),
        struct(lit(1000L).as("alpha_pm"), $"t".as("r")))).as("g"))
      .select($"source", $"t", $"g.alpha_pm".as("alpha_pm"), $"g.r".as("r"))
    grid
      .withColumn("rtot", sum($"r").over(Window.partitionBy($"alpha_pm")))
      .select($"alpha_pm", $"source",
        expr("(r * 1000000) div rtot").as("weight_ppm"),
        // nullif: a zero-token source must degrade to NULL on BOTH
        // engines (DuckDB // raises on /0, Spark div yields NULL)
        expr(s"(($MixBudgetTokens * ((r * 1000000) div rtot)) div 1000000)" +
          " * 1000 div nullif(t, 0)").as("epochs_milli"))
      .orderBy($"alpha_pm", $"source")
  }

  /** SEQUENCE-PACKING EFFICIENCY — what fraction of the context window a
    * run wastes, for the two standard packing policies: (a) one document
    * per sequence, padded to [[PackWindow]] (waste = padding); (b) concat
    * 'n' split in doc_id order (waste → 0 but documents straddle sequence
    * boundaries — the attention-contamination trade). Per source: doc and
    * token mass, padded-policy sequence count and waste ppm, concat-policy
    * sequence count and the ppm of documents split across a boundary.
    *
    * 100 TB shape: one map pass computes per-doc token counts; the
    * padded-policy columns are pure map-side-combinable sums, and the
    * concat-policy boundary test needs exactly one cumulative window
    * PARTITIONED BY SOURCE in deterministic doc_id order — the
    * partitioned-window shape that scales with executors (never a global
    * sort). */
  private val q354PackingEfficiency: Q = (s, d) => {
    import s.implicits._
    val L = PackWindow
    val docs = Tables.documents(s, d)
      .select($"source", $"doc_id",
        size(graft.text.TextOps.words($"text")).cast("long").as("t"))
      .filter($"t" > 0)
      .withColumn("nseq", expr(s"(t + ${L - 1}) div $L"))
      .withColumn("start",
        sum($"t").over(Window.partitionBy($"source").orderBy($"doc_id")) - $"t")
      .withColumn("crosses",
        (pmod($"start", lit(L)) + $"t" > L).cast("long"))
    docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"t").as("total_tokens"),
        sum($"nseq").as("pad_sequences"),
        sum($"nseq" * L - $"t").as("pad_waste"),
        sum($"crosses").as("n_split"))
      .select($"source", $"n_docs", $"total_tokens", $"pad_sequences",
        expr(s"(pad_waste * 1000000) div (pad_sequences * $L)")
          .as("pad_waste_ppm"),
        expr(s"(total_tokens + ${L - 1}) div $L").as("concat_sequences"),
        expr("(n_split * 1000000) div n_docs").as("docs_split_ppm"))
      .orderBy($"source")
  }

  /** QUALITY-GATE AGREEMENT (Cohen's κ) — when two cheap heuristics
    * disagree on what "good" text is, the mixture they keep diverges;
    * κ over the 2×2 contingency of gate A (length above the corpus
    * median, computed by the q307 value-domain fold — never a row sort)
    * and gate B (lexical diversity: distinct-word ratio > 50%) is the
    * standard chance-corrected agreement number. κ in exact ppm via
    * cross-multiplication: ((po−pe)/(1−pe))·10⁶ =
    * ((a+d)·n − pe_n)·10⁶ div (n² − pe_n) with pe_n at n² scale.
    *
    * 100 TB shape: one map pass per doc → one global 2×2 fold (4 longs,
    * map-side partials); the median comes from a value-domain histogram
    * (|n_chars domain| rows), broadcast as a scalar. */
  private val q355ClassifierKappa: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"n_chars", graft.text.TextOps.words($"text").as("ws"))
      .filter(size($"ws") > 0)
      .select($"n_chars",
        expr("(size(array_distinct(ws)) * 1000L) div size(ws)").as("dr"))
      .cache()
    val hist = docs.groupBy($"n_chars".as("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(Window.orderBy($"v")))
      .withColumn("n", sum($"c").over(Window.partitionBy()))
    val med = hist.filter($"cum" * 2 >= $"n").agg(min($"v").as("med"))
    val ct = docs.crossJoin(broadcast(med))
      .select(($"n_chars" > $"med").as("ga"), ($"dr" > 500L).as("gb"))
      .agg(
        sum(when($"ga" && $"gb", 1L).otherwise(0L)).as("a"),
        sum(when($"ga" && !$"gb", 1L).otherwise(0L)).as("b"),
        sum(when(!$"ga" && $"gb", 1L).otherwise(0L)).as("c"),
        sum(when(!$"ga" && !$"gb", 1L).otherwise(0L)).as("dd"))
    ct.select(
      ($"a" + $"b" + $"c" + $"dd").as("n_docs"),
      $"a".as("n_both"), $"b".as("n_a_only"), $"c".as("n_b_only"),
      $"dd".as("n_neither"),
      expr("""((a + dd) * (a + b + c + dd)
               - ((a + b) * (a + c) + (c + dd) * (b + dd))) * 1000000
              div nullif((a + b + c + dd) * (a + b + c + dd)
               - ((a + b) * (a + c) + (c + dd) * (b + dd)), 0L)""")
        .as("kappa_ppm"))
  }

  /** TRAIN/VAL SPLIT LEAKAGE — the evaluation-integrity audit: assign
    * every document to train (80%) or val by a deterministic id hash
    * (md5 prefix mod 10, the q308 ring pattern), cluster exact
    * duplicates by content hash, and count val documents whose content
    * also appears in train — those rows inflate eval scores and must be
    * dropped or re-split. Published as corpus totals plus the leaked-val
    * ppm.
    *
    * 100 TB shape: ONE shuffle on the content hash (the q40 dedup key),
    * map-side partial (train, val) counts per cluster, then a 4-long
    * global fold — identical cost to the exact-dedup pass the pipeline
    * already runs, so the audit is free when piggybacked. */
  private val q356SplitLeakage: Q = (s, d) => {
    import s.implicits._
    val cl = Tables.documents(s, d).repartition($"doc_id")
      .select(sha2($"text", 256).as("h"),
        (conv(substring(md5(concat($"doc_id".cast("string"), lit(":split"))),
          1, 13), 16, 10).cast("long") % 10 < 8).as("is_train"))
      .groupBy($"h")
      .agg(sum(when($"is_train", 1L).otherwise(0L)).as("n_train"),
        sum(when(!$"is_train", 1L).otherwise(0L)).as("n_val"))
    cl.agg(
        count(lit(1)).as("n_clusters"),
        sum(when($"n_train" > 0 && $"n_val" > 0, 1L).otherwise(0L))
          .as("n_leaked_clusters"),
        sum($"n_val").as("n_val_docs"),
        sum(when($"n_train" > 0, $"n_val").otherwise(0L)).as("n_leaked_val"))
      .select($"n_clusters", $"n_leaked_clusters", $"n_val_docs",
        $"n_leaked_val",
        expr("(n_leaked_val * 1000000) div nullif(n_val_docs, 0L)").as("leak_ppm"))
  }

  private[ops] val queries: Map[String, Q] = Map(
    "q353_mixture_temperature" -> q353MixtureTemperature,
    "q354_packing_efficiency" -> q354PackingEfficiency,
    "q355_classifier_kappa" -> q355ClassifierKappa,
    "q356_split_leakage" -> q356SplitLeakage
  )

  private[ops] val oracle: Map[String, String] = Map(
    // same per-source token fold, same closed-form α points, same
    // floored IEEE sqrt, same ppm/milli integer division order
    "q353_mixture_temperature" ->
      s"""WITH per AS (SELECT source,
                  CAST(sum(len($wordsSql)) AS BIGINT) AS t
                FROM documents GROUP BY 1),
          grid AS (SELECT source, t, g.alpha_pm,
                     CASE g.alpha_pm
                       WHEN 0 THEN 1
                       WHEN 500 THEN CAST(floor(sqrt(CAST(t AS DOUBLE)))
                         AS BIGINT)
                       ELSE t END AS r
                   FROM per,
                     (SELECT unnest([0, 500, 1000]) AS alpha_pm) g),
          w AS (SELECT source, t, alpha_pm, r,
                  CAST(sum(r) OVER (PARTITION BY alpha_pm) AS BIGINT) AS rtot
                FROM grid)
          SELECT CAST(alpha_pm AS BIGINT) AS alpha_pm, source,
                 CAST((r * 1000000) // rtot AS BIGINT) AS weight_ppm,
                 CAST((($MixBudgetTokens * ((r * 1000000) // rtot))
                   // 1000000) * 1000 // nullif(t, 0) AS BIGINT)
                   AS epochs_milli
          FROM w ORDER BY alpha_pm, source""",
    // same per-doc token counts, same ceil-div sequence math, same
    // source-partitioned doc_id-ordered cumulative boundary test
    "q354_packing_efficiency" -> {
      val L = PackWindow
      s"""WITH docs AS (SELECT source, doc_id,
                  CAST(len($wordsSql) AS BIGINT) AS t
                FROM documents),
          dd AS (SELECT source, doc_id, t,
                   (t + ${L - 1}) // $L AS nseq,
                   CAST(sum(t) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - t AS BIGINT) AS st
                 FROM docs WHERE t > 0),
          agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(t) AS BIGINT) AS total_tokens,
                    CAST(sum(nseq) AS BIGINT) AS pad_sequences,
                    CAST(sum(nseq * $L - t) AS BIGINT) AS pad_waste,
                    CAST(sum(CASE WHEN (st % $L) + t > $L THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_split
                  FROM dd GROUP BY 1)
          SELECT source, n_docs, total_tokens, pad_sequences,
                 CAST((pad_waste * 1000000) // (pad_sequences * $L)
                   AS BIGINT) AS pad_waste_ppm,
                 CAST((total_tokens + ${L - 1}) // $L AS BIGINT)
                   AS concat_sequences,
                 CAST((n_split * 1000000) // n_docs AS BIGINT)
                   AS docs_split_ppm
          FROM agg ORDER BY source"""
    },
    // same value-domain median fold, same diversity gate, same
    // cross-multiplied κ at n² scale
    "q355_classifier_kappa" ->
      s"""WITH docs AS (SELECT n_chars,
                  CAST(len(list_distinct(ws)) AS BIGINT) * 1000
                    // CAST(len(ws) AS BIGINT) AS dr
                FROM (SELECT n_chars, $wordsSql AS ws FROM documents)
                WHERE len(ws) > 0),
          hist AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
                   FROM docs GROUP BY 1),
          cum AS (SELECT v, c,
                    CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
                    (SELECT CAST(sum(c) AS BIGINT) FROM hist) AS n
                  FROM hist),
          med AS (SELECT min(v) AS med FROM cum WHERE cum * 2 >= n),
          ct AS (SELECT
                   CAST(sum(CASE WHEN n_chars > med AND dr > 500
                     THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(sum(CASE WHEN n_chars > med AND dr <= 500
                     THEN 1 ELSE 0 END) AS BIGINT) AS b,
                   CAST(sum(CASE WHEN n_chars <= med AND dr > 500
                     THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(sum(CASE WHEN n_chars <= med AND dr <= 500
                     THEN 1 ELSE 0 END) AS BIGINT) AS dd
                 FROM docs, med)
          SELECT a + b + c + dd AS n_docs,
                 a AS n_both, b AS n_a_only, c AS n_b_only, dd AS n_neither,
                 CAST(((a + dd) * (a + b + c + dd)
                    - ((a + b) * (a + c) + (c + dd) * (b + dd))) * 1000000
                   // nullif((a + b + c + dd) * (a + b + c + dd)
                    - ((a + b) * (a + c) + (c + dd) * (b + dd)), 0) AS BIGINT)
                   AS kappa_ppm
          FROM ct""",
    // same id-hash split, same content-hash clusters, same leak fold
    "q356_split_leakage" ->
      """WITH docs AS (SELECT sha256(text) AS h,
                  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                    || ':split'), 1, 13) AS BIGINT) % 10 < 8 AS is_train
                FROM documents),
          cl AS (SELECT h,
                   CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_train,
                   CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_val
                 FROM docs GROUP BY h)
          SELECT CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(sum(CASE WHEN n_train > 0 AND n_val > 0 THEN 1 ELSE 0
                   END) AS BIGINT) AS n_leaked_clusters,
                 CAST(sum(n_val) AS BIGINT) AS n_val_docs,
                 CAST(sum(CASE WHEN n_train > 0 THEN n_val ELSE 0 END)
                   AS BIGINT) AS n_leaked_val,
                 CAST((sum(CASE WHEN n_train > 0 THEN n_val ELSE 0 END)
                   * 1000000) // nullif(sum(n_val), 0) AS BIGINT) AS leak_ppm
          FROM cl"""
  )
}
