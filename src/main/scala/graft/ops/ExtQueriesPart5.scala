package graft.ops
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.{Dedup, TextAnalysis}
import graft.io.Tables

import graft.ops.ExtQueriesShared._

/** Catalog part 5 — the round-9 corpus-QA family: distributional
  * diagnostics (Zipf slope, Heaps exponent, character entropy), corpus
  * composition audits (symbol profile, readability), and pipeline
  * evaluation harnesses (language-ID confusion, duplicate-span position
  * profile). All arithmetic is exact-integer (micro-nat logs via the
  * q137 quantize-before-subtract rule, ppm ratios via integer division)
  * so every query hash-matches its DuckDB oracle bit-for-bit. */
private[ops] object ExtQueriesPart5 {

  /** Micro-nat log: ln quantized to integer micro-nats BEFORE any
    * subtraction/summation, so Spark and DuckDB fold identical longs. */
  private def lnM(c: Column): Column =
    round(log(c.cast("double")) * 1e6).cast("long")

  private val lnMSql = (e: String) =>
    s"CAST(round(ln(CAST($e AS DOUBLE)) * 1000000) AS BIGINT)"

  /** Top-rank cutoff for the Zipf fit — the head of the rank-frequency
    * curve is where the power law lives (the tail is df=1 noise). */
  private[ops] val ZipfTopRanks = 500

  /** ZIPF RANK-FREQUENCY SLOPE per source — the vocabulary-distribution
    * diagnostic behind mixture design: natural corpora fit c_r ∝ r^(−s)
    * with s ≈ 1; template/synthetic sources flatten (s → 0) or collapse
    * to a step. OLS of ln c on ln r over the top-`ZipfTopRanks` ranks,
    * reported as the NEGATED slope in exact integer micro-units: the
    * closed-form numerator Σx·Σy − n·Σxy is ≥ 0 because counts are
    * rank-descending, so the integer division is truncation-stable on
    * both engines.
    *
    * 100 TB shape: one (source, word) count shuffle with map-side
    * partial aggregation; the per-source top-R rank window sorts only
    * each source's vocabulary (WindowGroupLimit prunes map-side); the
    * OLS fold is 20 rows of long sums promoted to decimal(38,0) only
    * for the final cross products. */
  private val q324ZipfSlope: Q = (s, d) => {
    import s.implicits._
    val wc = Tables.documents(s, d)
      .select($"source", explode(graft.text.TextOps.words($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
    val ranked = wc
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"c".desc, $"w")))
      .filter($"rk" <= ZipfTopRanks)
      .select($"source", lnM($"rk").as("x"), lnM($"c").as("y"))
    ranked.groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .select($"source", $"n".as("n_ranks"),
        expr("""((cast(sx as decimal(38,0)) * sy - cast(n as decimal(38,0)) * sxy)
                 * 1000000)
                div (cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx)""")
          .as("neg_slope_micro"))
      .orderBy($"source")
  }

  /** CHARACTER-LEVEL SHANNON ENTROPY per document, rolled up per source —
    * the compression-ratio proxy quality signal (low-entropy text is
    * boilerplate/template/binary spill; the gzip-filter stand-in that
    * needs no codec). H_micro = lnM(n) − (Σ c·lnM(c)) div n over the
    * per-doc character histogram, exact integers end-to-end.
    *
    * 100 TB shape: the char explode is linear in corpus bytes and
    * map-side partial-aggregates into per-(doc, char) counts (alphabet
    * ≤ a few hundred symbols per doc, so the per-doc fold is tiny); the
    * source rollup moves 20 rows. */
  private val q325CharEntropy: Q = (s, d) => {
    import s.implicits._
    val cc = Tables.documents(s, d)
      .select($"doc_id", $"source", explode(split($"text", "")).as("ch"))
      .filter(length($"ch") === 1)
      .groupBy($"doc_id", $"source", $"ch").agg(count(lit(1)).as("c"))
    val h = cc.groupBy($"doc_id", $"source")
      .agg(sum($"c").as("n"), sum($"c" * lnM($"c")).as("clc"))
      .select($"doc_id", $"source",
        (lnM($"n") - expr("clc div n")).as("h_micro"))
    h.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(h_micro) div count(1)").as("mean_entropy_micro"),
        min($"h_micro").as("min_entropy_micro"),
        max($"h_micro").as("max_entropy_micro"))
      .orderBy($"source")
  }

  /** LANGUAGE-ID CONFUSION MATRIX — the evaluation harness for the q50
    * heuristic against the corpus's labeled `lang`: one row per (label,
    * prediction) cell with the within-label share in exact ppm. The
    * production use is drift monitoring: a cell that grows round-over-
    * round means the classifier or the corpus moved.
    *
    * 100 TB shape: prediction is map-only (marker-word probe), the
    * matrix is one (lang, pred) count shuffle, and the within-label
    * share folds over a ≤|langs|² value-domain grid. */
  private val q326LangidConfusion: Q = (s, d) => {
    import s.implicits._
    val m = Tables.documents(s, d)
      .select($"lang", TextAnalysis.languageIdFast($"text").as("pred_lang"))
      .groupBy($"lang", $"pred_lang").agg(count(lit(1)).as("n"))
    m.withColumn("n_label",
        sum($"n").over(Window.partitionBy($"lang")))
      .select($"lang", $"pred_lang", $"n",
        expr("(n * 1000000) div n_label").as("share_ppm"))
      .orderBy($"lang", $"pred_lang")
  }

  /** DUPLICATE-SPAN POSITION PROFILE — WHERE in documents the q135
    * duplicated k-gram mass sits, by relative-position decile: dup mass
    * concentrated in bin 0 is header/license boilerplate (strip
    * prefixes), in bin 9 is footer/nav chrome, uniform is true content
    * duplication (dedup, don't trim). Same word-gram keys as q135, so
    * the two queries audit the same spans.
    *
    * 100 TB shape: one gram-key shuffle (count > 1 filter), instances
    * join back by key only (positions ride the gram rows; documents are
    * never rebuilt), 10-row fold. */
  private val q328DupSpanPositions: Q = (s, d) => {
    import s.implicits._
    val k = ExactSubstrK
    val g = Tables.documents(s, d).repartition($"doc_id")
      .select($"doc_id", Dedup.words($"text").as("ws"))
      .filter(size($"ws") >= k)
      .select($"doc_id", (size($"ws") - k + 1).cast("long").as("ng"),
        posexplode(expr(
          s"transform(sequence(1, size(ws) - ${k - 1}), " +
            s"i -> md5(array_join(slice(ws, i, $k), ' ')))")))
      .select($"doc_id", $"ng", ($"pos" + 1).cast("long").as("p"),
        $"col".as("gkey"))
    val dup = g.groupBy($"gkey").agg(count(lit(1)).as("occ"))
      .filter($"occ" > 1).select($"gkey")
    val inst = g.join(dup, "gkey")
      .select($"doc_id", expr("((p - 1) * 10) div ng").as("bin"))
    inst.groupBy($"bin")
      .agg(count(lit(1)).as("n_instances"),
        countDistinct($"doc_id").as("n_docs"))
      .withColumn("share_ppm",
        expr("(n_instances * 1000000) div sum(n_instances) over ()"))
      .orderBy($"bin")
  }

  /** HEAPS-LAW EXPONENT — the vocabulary-growth power fit V ≈ C·T^β over
    * the q250 decile checkpoints (β ≈ 0.5 for natural text; β → 1 means
    * unbounded novel-token production, the synthetic/adversarial corpus
    * smell). OLS of lnM(V_cum) on lnM(T_cum) over 10 exact checkpoints;
    * the numerator n·Σxy − Σx·Σy is ≥ 0 (V grows with T), so integer
    * division truncates identically on both engines.
    *
    * 100 TB shape: both curves come from ONE (shingle → min-doc,
    * instance-count) aggregation pass (T from per-doc set sizes, V from
    * first-seen deciles); the fit folds 10 rows. */
  private val q329HeapsExponent: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).repartition($"doc_id")
      .select($"doc_id", Dedup.shingleSet($"text", 3).as("sh"))
    val nDocs = Tables.documents(s, d).agg(max($"doc_id").as("max_id"))
    val decile = (c: Column) =>
      least(lit(10L), expr(s"(${c} * 10) div (max_id + 1) + 1"))
    // tokens axis: per-doc distinct-shingle instances, cumulative by decile
    val t = docs.crossJoin(broadcast(nDocs))
      .select(decile($"doc_id").as("dc"), size($"sh").cast("long").as("k"))
      .groupBy($"dc").agg(sum($"k").as("t_new"))
    // vocab axis: first-seen shingles per decile (the q250 curve)
    val v = docs.select($"doc_id", explode($"sh").as("w"))
      .groupBy($"w").agg(min($"doc_id").as("first_doc"))
      .crossJoin(broadcast(nDocs))
      .select(decile($"first_doc").as("dc"))
      .groupBy($"dc").agg(count(lit(1)).as("v_new"))
    val w = Window.orderBy($"dc").rowsBetween(Window.unboundedPreceding, 0)
    val pts = t.join(v, "dc")
      .select($"dc", sum($"t_new").over(w).as("t_cum"),
        sum($"v_new").over(w).as("v_cum"))
      .select(lnM($"t_cum").as("x"), lnM($"v_cum").as("y"))
    pts.agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .select($"n".as("n_points"),
        expr("""((cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)
                 * 1000000)
                div (cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx)""")
          .as("beta_micro"))
  }

  /** FLESCH-KINCAID GRADE (integer-scaled) per source — the readability
    * leg of the quality-gate family (Gopher rules gate structure, the
    * quality model gates topicality; FK grades sentence/word complexity,
    * the classic proxy for "textbook vs listicle" mixture skew).
    * Syllables ≈ [aeiouy]+ vowel-group runs (min 1/word); grade_micro =
    * 390000·W div S + 11800000·Syl div W − 15590000, exact per doc.
    *
    * 100 TB shape: one explode for syllable sums with map-side partial
    * agg, sentence/word counts ride the same scan, per-source fold
    * moves 20 rows. */
  private val q330Readability: Q = (s, d) => {
    import s.implicits._
    val base = Tables.documents(s, d).repartition($"doc_id")
      .select($"doc_id", $"source", graft.text.TextOps.words($"text").as("ws"),
        greatest(size(filter(split($"text", "[.!?]+\\s*"),
          x => length(x) > 0)), lit(1)).cast("long").as("ns"))
      .filter(size($"ws") > 0)
    val syl = base
      .select($"doc_id", explode($"ws").as("w"))
      .select($"doc_id", greatest(
        size(filter(split($"w", "[^aeiouy]+"), t => length(t) > 0)),
        lit(1)).cast("long").as("sy"))
      .groupBy($"doc_id").agg(sum($"sy").as("syl"))
    val fk = base.join(syl, "doc_id")
      .select($"source",
        (expr("(390000 * cast(size(ws) as bigint)) div ns") +
          expr("(11800000 * syl) div cast(size(ws) as bigint)") -
          lit(15590000L)).as("fk_micro"))
    fk.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(fk_micro) div count(1)").as("mean_fk_micro"),
        min($"fk_micro").as("min_fk_micro"),
        max($"fk_micro").as("max_fk_micro"))
      .orderBy($"source")
  }

  /** Code-detector threshold: docs whose punctuation+digit mass exceeds
    * this ppm of their characters classify `codeish`. */
  private[ops] val CodeishPpm = 150000L

  /** SYMBOL-CLASS PROFILE — per-document character-class composition
    * (alpha / digit / whitespace / other) in exact ppm, classified into
    * `codeish` vs `prose` at [[CodeishPpm]] and rolled up per (source,
    * class): the corpus-composition audit that catches code spill into a
    * prose corpus (and vice versa) without any tokenizer dependency.
    * Counts come from length-after-strip differences — three
    * regexp_replace passes, no explode.
    *
    * 100 TB shape: map-only per-doc signals; one 40-row (source, class)
    * fold. */
  private val q331SymbolProfile: Q = (s, d) => {
    import s.implicits._
    val prof = Tables.documents(s, d)
      .select($"source", length($"text").cast("long").as("n"),
        (length($"text") - length(regexp_replace($"text", "[A-Za-z]", "")))
          .cast("long").as("n_alpha"),
        (length($"text") - length(regexp_replace($"text", "[0-9]", "")))
          .cast("long").as("n_digit"),
        (length($"text") - length(regexp_replace($"text", "\\s", "")))
          .cast("long").as("n_space"))
      .filter($"n" > 0)
      .withColumn("n_other", $"n" - $"n_alpha" - $"n_digit" - $"n_space")
      .withColumn("cls",
        when(expr(s"((n_other + n_digit) * 1000000) div n > $CodeishPpm"),
          lit("codeish")).otherwise(lit("prose")))
    prof.groupBy($"source", $"cls")
      .agg(count(lit(1)).as("n_docs"),
        expr("(sum(n_alpha) * 1000000) div sum(n)").as("alpha_ppm"),
        expr("(sum(n_digit) * 1000000) div sum(n)").as("digit_ppm"),
        expr("(sum(n_space) * 1000000) div sum(n)").as("space_ppm"),
        expr("(sum(n_other) * 1000000) div sum(n)").as("other_ppm"))
      .orderBy($"source", $"cls")
  }

  val queries: Map[String, Q] = Map(
    "q324_zipf_slope" -> q324ZipfSlope,
    "q325_char_entropy" -> q325CharEntropy,
    "q326_langid_confusion" -> q326LangidConfusion,
    "q328_dup_span_positions" -> q328DupSpanPositions,
    "q329_heaps_exponent" -> q329HeapsExponent,
    "q330_readability" -> q330Readability,
    "q331_symbol_profile" -> q331SymbolProfile)

  lazy val oracle: Map[String, String] = Map(
    // same (c desc, w) rank tiebreak, same micro-nat quantization, same
    // decimal-exact closed-form OLS with the sign arranged positive
    "q324_zipf_slope" ->
      s"""WITH wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT source, unnest($wordsSql) AS w FROM documents)
                 GROUP BY source, w),
          r AS (SELECT source, c,
                  CAST(row_number() OVER (PARTITION BY source
                    ORDER BY c DESC, w) AS BIGINT) AS rk
                FROM wc QUALIFY rk <= $ZipfTopRanks),
          p AS (SELECT source, ${lnMSql("rk")} AS x, ${lnMSql("c")} AS y FROM r),
          a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x*x) AS BIGINT) AS sxx,
                  CAST(sum(x*y) AS BIGINT) AS sxy
                FROM p GROUP BY source)
          SELECT source, n AS n_ranks,
                 CAST(((CAST(sx AS HUGEINT) * sy - CAST(n AS HUGEINT) * sxy)
                        * 1000000)
                      // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                   AS BIGINT) AS neg_slope_micro
          FROM a ORDER BY source""",
    // same per-doc char histogram, same lnM quantize-before-divide
    "q325_char_entropy" ->
      s"""WITH cc AS (SELECT doc_id, source, substring(text, i, 1) AS ch,
                   CAST(count(*) AS BIGINT) AS c
                 FROM documents, unnest(range(1, len(text)+1)) AS u(i)
                 GROUP BY doc_id, source, ch),
          h AS (SELECT doc_id, source,
                  ${lnMSql("sum(c)")} - CAST(sum(c * ${lnMSql("c")}) AS BIGINT)
                    // CAST(sum(c) AS BIGINT) AS h_micro
                FROM cc GROUP BY doc_id, source)
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(CAST(sum(h_micro) AS HUGEINT) // count(*) AS BIGINT)
                   AS mean_entropy_micro,
                 CAST(min(h_micro) AS BIGINT) AS min_entropy_micro,
                 CAST(max(h_micro) AS BIGINT) AS max_entropy_micro
          FROM h GROUP BY source ORDER BY source""",
    // same marker-word argmax prediction, same within-label ppm share
    "q326_langid_confusion" ->
      s"""WITH p AS (SELECT lang, $langCaseSql AS pred_lang
                 FROM (SELECT lang, $wordsSql AS ws FROM documents)),
          m AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
                FROM p GROUP BY lang, pred_lang)
          SELECT lang, pred_lang, n,
                 CAST((n * 1000000) // sum(n) OVER (PARTITION BY lang)
                   AS BIGINT) AS share_ppm
          FROM m ORDER BY lang, pred_lang""",
    // q135's k-gram keys, occurrences of repeated keys, relative deciles
    "q328_dup_span_positions" ->
      s"""WITH t AS (SELECT doc_id, $wordsSql AS ws FROM documents),
          g AS (SELECT doc_id,
                       CAST(len(ws) - ${ExactSubstrK - 1} AS BIGINT) AS ng,
                       CAST(i AS BIGINT) AS p,
                       md5(array_to_string(ws[i:i+${ExactSubstrK - 1}], ' ')) AS gkey
                FROM t, unnest(range(1, len(ws) - ${ExactSubstrK - 2})) AS u(i)
                WHERE len(ws) >= $ExactSubstrK),
          dup AS (SELECT gkey FROM g GROUP BY gkey HAVING count(*) > 1),
          i AS (SELECT doc_id, ((p - 1) * 10) // ng AS bin
                FROM g JOIN dup USING (gkey)),
          b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_instances,
                  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
                FROM i GROUP BY bin)
          SELECT bin, n_instances, n_docs,
                 CAST((n_instances * 1000000) // sum(n_instances) OVER ()
                   AS BIGINT) AS share_ppm
          FROM b ORDER BY bin""",
    // same single (shingle -> first-doc, set-size) pass, same 10-point fit
    "q329_heaps_exponent" ->
      s"""WITH docs AS (
            SELECT doc_id,
                   list_distinct([array_to_string(ws[i:i+2], ' ')
                                  for i in range(1, len(ws) - 1)]) AS sh
            FROM (SELECT doc_id, $wordsSql AS ws FROM documents)
            WHERE len(ws) >= 3),
          mx AS (SELECT max(doc_id) AS max_id FROM documents),
          t AS (SELECT least(10, (doc_id * 10) // (max_id + 1) + 1) AS dc,
                  CAST(sum(len(sh)) AS BIGINT) AS t_new
                FROM docs, mx GROUP BY dc),
          f AS (SELECT w, min(doc_id) AS first_doc
                FROM (SELECT doc_id, unnest(sh) AS w FROM docs) GROUP BY w),
          v AS (SELECT least(10, (first_doc * 10) // (max_id + 1) + 1) AS dc,
                  CAST(count(*) AS BIGINT) AS v_new
                FROM f, mx GROUP BY dc),
          c AS (SELECT t.dc,
                  sum(t_new) OVER (ORDER BY t.dc) AS t_cum,
                  sum(v_new) OVER (ORDER BY t.dc) AS v_cum
                FROM t JOIN v ON t.dc = v.dc),
          p AS (SELECT ${lnMSql("t_cum")} AS x, ${lnMSql("v_cum")} AS y FROM c),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x*x) AS BIGINT) AS sxx,
                  CAST(sum(x*y) AS BIGINT) AS sxy
                FROM p)
          SELECT n AS n_points,
                 CAST(((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                        * 1000000)
                      // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                   AS BIGINT) AS beta_micro
          FROM a""",
    // same [.!?]+\s* sentence split, same vowel-group syllables (min 1),
    // same per-doc integer grade
    "q330_readability" ->
      s"""WITH b AS (
            SELECT doc_id, source, $wordsSql AS ws,
                   greatest(CAST(len(list_filter(
                       string_split_regex(text, '[.!?]+\\s*'),
                       x -> length(x) > 0)) AS BIGINT), 1) AS ns
            FROM documents),
          sy AS (SELECT doc_id,
                   CAST(sum(greatest(len(list_filter(
                       string_split_regex(w, '[^aeiouy]+'),
                       t -> length(t) > 0)), 1)) AS BIGINT) AS syl
                 FROM (SELECT doc_id, unnest(ws) AS w FROM b) GROUP BY doc_id),
          fk AS (SELECT source,
                   (390000 * CAST(len(ws) AS BIGINT)) // ns
                     + (11800000 * syl) // CAST(len(ws) AS BIGINT)
                     - 15590000 AS fk_micro
                 FROM b JOIN sy USING (doc_id) WHERE len(ws) > 0)
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(CAST(sum(fk_micro) AS HUGEINT) // count(*) AS BIGINT)
                   AS mean_fk_micro,
                 CAST(min(fk_micro) AS BIGINT) AS min_fk_micro,
                 CAST(max(fk_micro) AS BIGINT) AS max_fk_micro
          FROM fk GROUP BY source ORDER BY source""",
    // same strip-diff char classes, same ppm threshold classification
    "q331_symbol_profile" ->
      s"""WITH p AS (
            SELECT source, CAST(len(text) AS BIGINT) AS n,
                   CAST(len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g'))
                     AS BIGINT) AS n_alpha,
                   CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
                     AS BIGINT) AS n_digit,
                   CAST(len(text) - len(regexp_replace(text, '\\s', '', 'g'))
                     AS BIGINT) AS n_space
            FROM documents WHERE len(text) > 0),
          c AS (SELECT source, n, n_alpha, n_digit, n_space,
                  n - n_alpha - n_digit - n_space AS n_other,
                  CASE WHEN ((n - n_alpha - n_space) * 1000000) // n > $CodeishPpm
                       THEN 'codeish' ELSE 'prose' END AS cls
                FROM p)
          SELECT source, cls, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST((sum(n_alpha) * 1000000) // sum(n) AS BIGINT)
                   AS alpha_ppm,
                 CAST((sum(n_digit) * 1000000) // sum(n) AS BIGINT)
                   AS digit_ppm,
                 CAST((sum(n_space) * 1000000) // sum(n) AS BIGINT)
                   AS space_ppm,
                 CAST((sum(n_other) * 1000000) // sum(n) AS BIGINT)
                   AS other_ppm
          FROM c GROUP BY source, cls ORDER BY source, cls""")
}
