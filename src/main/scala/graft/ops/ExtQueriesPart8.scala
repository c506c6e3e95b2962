package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.Tables
import graft.ops.ExtQueriesShared.{wordsAposSql, wordsSql}

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

  /** q359's (z_{α/2} + z_β)² for 95% confidence / 80% power, in micro
    * units — quantized ONCE at authoring time (the SPRT rule): (1.959964
    * + 0.841621)² = 7.848886... */
  private val PowerZ2Micro = 7848886L

  /** q360's decay half-life in days. */
  private val DecayHalfLifeDays = 30L

  /** TOKENIZER FERTILITY — tokens-per-word and chars-per-token by
    * language: the compression audit that decides whether a tokenizer is
    * fit for a corpus slice (fertility ≫ 1 on a language means its text
    * costs disproportionate context window — the multilingual-tokenizer
    * budget problem). Uses the engine's 4-chars-per-token estimator
    * (q52's `ceil(len/4)` per word) against the apostrophe-aware word
    * split, all as native codegen'd array folds — no UDF boundary.
    *
    * 100 TB shape: map-only per-row folds → one |langs|-key hash
    * aggregate with map-side partials. */
  private val q357TokenizerFertility: Q = (s, d) => {
    import s.implicits._
    val per = Tables.documents(s, d)
      .select($"lang",
        expr("filter(split(lower(text), \"[^a-z0-9']+\"), w -> length(w) > 0)")
          .as("ws"))
      .select($"lang", size($"ws").cast("long").as("nw"),
        expr("aggregate(ws, 0L, (a, w) -> a + (length(w) + 3) div 4)")
          .as("est"),
        expr("aggregate(ws, 0L, (a, w) -> a + length(w))").as("nch"))
    per.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"nw").as("n_words"),
        sum($"est").as("est_tokens"), sum($"nch").as("word_chars"))
      .select($"lang", $"n_docs", $"n_words", $"est_tokens",
        expr("(est_tokens * 1000) div nullif(n_words, 0L)")
          .as("fertility_milli"),
        expr("(word_chars * 1000) div nullif(est_tokens, 0L)")
          .as("chars_per_token_milli"))
      .orderBy($"lang")
  }

  /** CLASS-BALANCE DRIFT (Pearson χ² on the lang × source contingency) —
    * is language mix independent of source, or does one source skew the
    * label distribution the mixture weights assume? χ² folds exactly:
    * Σ (o·n − r·c)²·10⁶ div (r·c·n) over the FULL grid (absent cells
    * count — the grid is the |langs|×|sources| value-domain cross, tiny
    * at any corpus size). Intermediates ride decimal(38,0): the summed
    * term (o·n − r·c)²·10⁶ is bounded by n⁴·10⁶ < 10³⁸ only while
    * n ≲ 10⁸ rows — past that, run per corpus slice (the q337 panel
    * rule), and the bound is ENFORCED below with the q337-style
    * assert_true so a non-ANSI overflow NULLs loudly instead of sum()
    * silently dropping terms into a plausible wrong chi2_micro.
    *
    * 100 TB shape: ONE hash aggregate over documents (map-side partials,
    * |langs|·|sources| keys); margins re-aggregate the value-domain
    * frame; the grid join is broadcast. */
  private val q358ClassBalanceChi2: Q = (s, d) => {
    import s.implicits._
    val ct = Tables.documents(s, d)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o")).cache()
    val r = ct.groupBy($"lang").agg(sum($"o").as("r"))
    val c = ct.groupBy($"source").agg(sum($"o").as("c"))
    val grid = r.crossJoin(c)
      .join(ct, Seq("lang", "source"), "left_outer")
      .select($"lang", $"source", $"r", $"c",
        coalesce($"o", lit(0L)).as("o"))
    grid
      .withColumn("n", sum($"o").over(Window.partitionBy()))
      .agg(
        countDistinct($"lang").cast("long").as("n_langs"),
        countDistinct($"source").cast("long").as("n_sources"),
        max($"n").as("n_docs"),
        sum(expr("""((cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
                     * (cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
                     * 1000000)
                    div (cast(r as decimal(38,0)) * c * n)"""))
          .cast("long").as("chi2_micro"))
      // q337-style loud bound: evaluates once on the single final row
      // (zero per-row cost), NULL (⇒ filter true) while the bound holds
      .filter(expr(
        "assert_true(n_docs <= 100000000, 'q358: corpus exceeds the " +
          "~1e8-row decimal(38,0) overflow bound for (o*n - r*c)^2*1e6 " +
          "— run chi-square per corpus slice (q337 panel rule)') IS NULL"))
      .select($"n_docs", $"n_langs", $"n_sources",
        (($"n_langs" - 1) * ($"n_sources" - 1)).as("dof"), $"chi2_micro")
  }

  /** A/B POWER ANALYSIS — before q317/q347 read an experiment out, this
    * says whether the experiment could ever read out: per source, the
    * purchase base rate, the minimum detectable effect at 95%/80%
    * (mde_ppm = √(Z²·2pq/n) with [[PowerZ2Micro]] quantized at authoring
    * time and p, q in exact ppm), and the per-arm sample size a 10%
    * relative lift would need. The sqrt is the one float op, floored
    * immediately (IEEE-exact, the q317/q353 rule).
    *
    * 100 TB shape: one per-(source, user) dedup aggregate (the only
    * row-scale shuffle, map-side combinable) → |sources| rows of closed
    * -form integer math. */
  private val q359PowerAnalysis: Q = (s, d) => {
    import s.implicits._
    val users = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"))
      // synthetic source assignment: the md5 ring (q308/q356 pattern)
      .withColumn("grp",
        conv(substring(md5(concat($"user_id".cast("string"), lit(":pw"))),
          1, 13), 16, 10).cast("long") % 4)
    users.groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"conv").as("k"))
      .select($"grp", $"n", $"k",
        expr("(k * 1000000) div n").as("p_ppm"))
      .withColumn("mde_ppm", expr(
        s"""cast(floor(sqrt(cast(($PowerZ2Micro * 2 * p_ppm
             * (1000000 - p_ppm)) div (n * 1000000) as double))) as bigint)"""))
      .withColumn("n_for_10pct_lift", expr(
        s"""($PowerZ2Micro * 2 * p_ppm * (1000000 - p_ppm))
            div nullif(1000000 * ((p_ppm div 10) * (p_ppm div 10)), 0L)"""))
      .orderBy($"grp")
  }

  /** RECENCY-WEIGHTED CORPUS MASS — freshness decay with integer
    * half-life halving: weight_ppm = 10⁶ >> (age_days div
    * [[DecayHalfLifeDays]]), the shift-right decay that needs no pow()
    * and is bit-identical on both engines. Per event type: raw count,
    * decay-weighted mass, and mean retention ppm — the "how stale is
    * this slice" number a freshness-weighted sampler feeds on.
    *
    * 100 TB shape: one (type, day) hash aggregate (bounded value
    * domain) → per-day weights and the final |types| fold; the corpus
    * max day rides a value-domain window, never a row scan. */
  private val q360RecencyDecay: Q = (s, d) => {
    import s.implicits._
    val daily = Tables.events(s, d)
      .select($"event_type", $"ts".cast("date").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
    daily
      .withColumn("maxd", max($"day").over(Window.partitionBy()))
      // cap the shift at 20 (10⁶ < 2²⁰ so the weight is already 0 there):
      // Java's >> masks the shift amount mod 64, so an uncapped
      // multi-year age would WRAP to a huge weight instead of decaying
      .withColumn("w_ppm", expr(
        s"shiftright(1000000L, least(cast(datediff(maxd, day)" +
          s" div $DecayHalfLifeDays as int), 20))"))
      .groupBy($"event_type")
      .agg(sum($"cnt").as("n_events"),
        sum($"cnt" * $"w_ppm").as("decayed_mass_ppm"),
        max($"w_ppm").as("newest_weight_ppm"))
      .select($"event_type", $"n_events", $"decayed_mass_ppm",
        $"newest_weight_ppm",
        expr("decayed_mass_ppm div n_events").as("mean_retention_ppm"))
      .orderBy($"event_type")
  }

  /** CROSS-SOURCE CONTENT OVERLAP (exact shingle Jaccard matrix) — which
    * sources mirror each other: per source-pair, |distinct shared word
    * 3-grams| over the union, ranked. The syndication/mirror detector
    * that decides source-level dedup BEFORE doc-level MinHash spends
    * anything (q255 tells you dup provenance after the fact; this is the
    * source-granularity map). Published as the top-10 most-overlapping
    * pairs with exact ppm Jaccard.
    *
    * 100 TB shape: one shuffle on the shingle key (distinct (source,
    * shingle) — map-side combinable); per-shingle fanout is bounded by
    * C(|sources|, 2) pairs regardless of how often a shingle repeats —
    * the hub-safety that a doc-pair self-join lacks; the pair matrix is
    * |sources|² rows. */
  private val q361SourceOverlap: Q = (s, d) => {
    import s.implicits._
    val sh = Tables.documents(s, d)
      .select($"source", graft.text.TextOps.words($"text").as("ws"))
      .filter(size($"ws") >= 3)
      .select($"source", explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> array_join(slice(ws, i, 3), ' '))"))
        .as("g"))
      .distinct()
      .cache()
    val per = sh.groupBy($"source").agg(count(lit(1)).as("nsh"))
    val inter = sh.toDF("s1", "g")
      .join(sh.toDF("s2", "g2"), $"g" === $"g2" && $"s1" < $"s2")
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(per.toDF("s1", "n1")), "s1")
      .join(broadcast(per.toDF("s2", "n2")), "s2")
      .select($"s1", $"s2", $"inter", $"n1", $"n2",
        expr("(inter * 1000000) div (n1 + n2 - inter)").as("jaccard_ppm"))
      .withColumn("rk", row_number().over(
        Window.orderBy($"jaccard_ppm".desc, $"s1", $"s2")))
      .filter($"rk" <= 10)
      .select($"rk", $"s1", $"s2", $"inter", $"n1", $"n2", $"jaccard_ppm")
  }

  /** MERGEABLE-CHECKSUM DELTA AUDIT — the q169/Fingerprint property AS a
    * query: the order-independent mod-2^60 checksum of (corpus minus
    * slice) plus the checksum of (slice) must equal the checksum of the
    * whole corpus — the identity that lets an incremental pipeline stamp
    * a 100 TB table by folding ONLY the new batch into yesterday's
    * stamp, never rescanning. All three checksums (and both counts) fold
    * in ONE conditional aggregate over ONE scan; `merge_matches` is the
    * audited identity.
    *
    * 100 TB shape: one map-side md5 pass, one 1-row aggregate — the
    * incremental-reconciliation primitive. */
  private val q362DeltaChecksum: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val Mod = 1152921504606846976L // 2^60
    val h = conv(substring(md5(concat($"doc_id".cast("string"), lit("|"),
      $"text")), 1, 15), 16, 10).cast(DecimalType(38, 0))
    Tables.documents(s, d)
      .select(($"doc_id" % 10 === 0).as("in_slice"), h.as("h"))
      .agg(
        sum(when(!$"in_slice", 1L).otherwise(0L)).as("n_base"),
        sum(when($"in_slice", 1L).otherwise(0L)).as("n_slice"),
        (sum(when(!$"in_slice", $"h")) % Mod).cast("long").as("ck_base"),
        (sum(when($"in_slice", $"h")) % Mod).cast("long").as("ck_slice"),
        (sum($"h") % Mod).cast("long").as("ck_all"))
      .select($"n_base", $"n_slice", $"ck_base", $"ck_slice", $"ck_all",
        expr(s"(ck_base + ck_slice) % ${Mod}L").as("ck_merged"),
        expr(s"((ck_base + ck_slice) % ${Mod}L) = ck_all")
          .as("merge_matches"))
  }

  private[ops] val queries: Map[String, Q] = Map(
    "q361_source_overlap" -> q361SourceOverlap,
    "q362_delta_checksum" -> q362DeltaChecksum,
    "q353_mixture_temperature" -> q353MixtureTemperature,
    "q354_packing_efficiency" -> q354PackingEfficiency,
    "q355_classifier_kappa" -> q355ClassifierKappa,
    "q356_split_leakage" -> q356SplitLeakage,
    "q357_tokenizer_fertility" -> q357TokenizerFertility,
    "q358_class_balance_chi2" -> q358ClassBalanceChi2,
    "q359_power_analysis" -> q359PowerAnalysis,
    "q360_recency_decay" -> q360RecencyDecay
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
          FROM cl""",
    // same apostrophe-aware split, same integer ceil-div token estimate
    "q357_tokenizer_fertility" ->
      s"""WITH per AS (SELECT lang,
                  CAST(len(ws) AS BIGINT) AS nw,
                  CAST(coalesce(list_sum(list_transform(ws,
                    w -> (length(w) + 3) // 4)), 0) AS BIGINT) AS est,
                  CAST(coalesce(list_sum(list_transform(ws,
                    w -> length(w))), 0) AS BIGINT) AS nch
                FROM (SELECT lang, $wordsAposSql AS ws FROM documents)),
          agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(nw) AS BIGINT) AS n_words,
                    CAST(sum(est) AS BIGINT) AS est_tokens,
                    CAST(sum(nch) AS BIGINT) AS word_chars
                  FROM per GROUP BY 1)
          SELECT lang, n_docs, n_words, est_tokens,
                 CAST((est_tokens * 1000) // nullif(n_words, 0) AS BIGINT)
                   AS fertility_milli,
                 CAST((word_chars * 1000) // nullif(est_tokens, 0) AS BIGINT)
                   AS chars_per_token_milli
          FROM agg ORDER BY lang""",
    // same full-grid χ² fold over decimal(38,0) intermediates
    "q358_class_balance_chi2" ->
      """WITH ct AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                FROM documents GROUP BY 1, 2),
          r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM ct GROUP BY 1),
          c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM ct GROUP BY 1),
          grid AS (SELECT r.lang, c.source, r.r, c.c,
                     CAST(coalesce(ct.o, 0) AS BIGINT) AS o
                   FROM r CROSS JOIN c
                   LEFT JOIN ct ON ct.lang = r.lang AND ct.source = c.source),
          t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM grid)
          SELECT t.n AS n_docs,
                 CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                 CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                 CAST((count(DISTINCT lang) - 1)
                   * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
                 -- HUGEINT, not DECIMAL: DuckDB's DECIMAL // ROUNDS the
                 -- quotient (measured +35 micro vs exact on this corpus)
                 -- while HUGEINT // is true floor division, matching
                 -- Spark's decimal div exactly
                 CAST(sum(((CAST(o AS HUGEINT) * n
                             - CAST(r AS HUGEINT) * c)
                           * (CAST(o AS HUGEINT) * n
                             - CAST(r AS HUGEINT) * c)
                           * 1000000)
                          // (CAST(r AS HUGEINT) * c * n)) AS BIGINT)
                   AS chi2_micro
          FROM grid, t GROUP BY t.n""",
    // same md5 ring groups, same quantized Z², same floored IEEE sqrt
    "q359_power_analysis" ->
      s"""WITH users AS (SELECT user_id,
                  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                    END) AS BIGINT) AS conv
                FROM events GROUP BY 1),
          g AS (SELECT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)
                    || ':pw'), 1, 13) AS BIGINT) % 4 AS grp, conv
                FROM users),
          agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(conv) AS BIGINT) AS k
                  FROM g GROUP BY 1),
          pp AS (SELECT grp, n, k, (k * 1000000) // n AS p_ppm FROM agg)
          SELECT grp, n, k, p_ppm,
                 CAST(floor(sqrt(CAST(($PowerZ2Micro * 2 * p_ppm
                   * (1000000 - p_ppm)) // (n * 1000000) AS DOUBLE)))
                   AS BIGINT) AS mde_ppm,
                 CAST(($PowerZ2Micro * 2 * p_ppm * (1000000 - p_ppm))
                   // nullif(1000000 * ((p_ppm // 10) * (p_ppm // 10)), 0)
                   AS BIGINT) AS n_for_10pct_lift
          FROM pp ORDER BY grp""",
    // same (type, day) fold, same capped shift-right half-life decay
    "q360_recency_decay" ->
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY 1, 2),
          mx AS (SELECT max(day) AS maxd FROM daily),
          w AS (SELECT event_type, cnt,
                  1000000 >> least(CAST(maxd - day AS BIGINT)
                    // $DecayHalfLifeDays, 20) AS w_ppm
                FROM daily, mx)
          SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events,
                 CAST(sum(cnt * w_ppm) AS BIGINT) AS decayed_mass_ppm,
                 CAST(max(w_ppm) AS BIGINT) AS newest_weight_ppm,
                 CAST(sum(cnt * w_ppm) // sum(cnt) AS BIGINT)
                   AS mean_retention_ppm
          FROM w GROUP BY 1 ORDER BY event_type""",
    // same distinct (source, 3-gram) set, same exact pair fold, same
    // (jaccard desc, s1, s2) top-10 tiebreak
    "q361_source_overlap" ->
      s"""WITH t AS (SELECT source, ws
                FROM (SELECT source, $wordsSql AS ws FROM documents)
                WHERE len(ws) >= 3),
          sh AS (SELECT DISTINCT source,
                   array_to_string(ws[i:i+2], ' ') AS g
                 FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
          per AS (SELECT source, CAST(count(*) AS BIGINT) AS nsh
                  FROM sh GROUP BY 1),
          inter AS (SELECT a.source AS s1, b.source AS s2,
                      CAST(count(*) AS BIGINT) AS inter
                    FROM sh a JOIN sh b
                      ON a.g = b.g AND a.source < b.source
                    GROUP BY 1, 2),
          j AS (SELECT s1, s2, inter, pa.nsh AS n1, pb.nsh AS n2,
                  CAST((inter * 1000000) // (pa.nsh + pb.nsh - inter)
                    AS BIGINT) AS jaccard_ppm
                FROM inter
                JOIN per pa ON pa.source = s1
                JOIN per pb ON pb.source = s2),
          r AS (SELECT *, CAST(row_number() OVER
                  (ORDER BY jaccard_ppm DESC, s1, s2) AS INT) AS rk
                FROM j)
          SELECT rk, s1, s2, inter, n1, n2, jaccard_ppm
          FROM r WHERE rk <= 10 ORDER BY rk""",
    // same md5 60-bit row values, same one-scan conditional fold, same
    // mod-2^60 merge identity
    "q362_delta_checksum" ->
      """WITH h AS (SELECT doc_id % 10 = 0 AS in_slice,
                  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                    || '|' || text), 1, 15) AS BIGINT) AS h
                FROM documents),
          agg AS (SELECT
                    CAST(sum(CASE WHEN in_slice THEN 0 ELSE 1 END) AS BIGINT)
                      AS n_base,
                    CAST(sum(CASE WHEN in_slice THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_slice,
                    CAST(sum(CASE WHEN in_slice THEN 0 ELSE h END)
                      % 1152921504606846976 AS BIGINT) AS ck_base,
                    CAST(sum(CASE WHEN in_slice THEN h ELSE 0 END)
                      % 1152921504606846976 AS BIGINT) AS ck_slice,
                    CAST(sum(h) % 1152921504606846976 AS BIGINT) AS ck_all
                  FROM h)
          SELECT n_base, n_slice, ck_base, ck_slice, ck_all,
                 CAST((ck_base + ck_slice) % 1152921504606846976 AS BIGINT)
                   AS ck_merged,
                 (ck_base + ck_slice) % 1152921504606846976 = ck_all
                   AS merge_matches
          FROM agg"""
  )
}
