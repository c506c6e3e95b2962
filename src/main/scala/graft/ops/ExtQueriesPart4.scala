package graft.ops
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.{CountMin, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.io.Tables

import graft.ops.ExtQueriesShared._

/** Catalog part 4 of [[ExtQueries]] — split for compile-unit size;
  * every member is verbatim from the original single file. */
private[ops] object ExtQueriesPart4 {

  /** POPULATION STABILITY INDEX — the standard production drift metric
    * between two corpus slices (here even vs odd doc_id, the
    * deterministic A/B split): PSI = Σ (p−q)·ln(p/q) over fixed length
    * bins. Proportions in exact ppm; the log-ratio is ln((ca+1)·nb) −
    * ln((cb+1)·na) (add-one absorbs empty bins), each term micro-nat
    * quantized BEFORE the product — the q137 lnMicro argument — so both
    * engines sum identical pico-unit integers. One map-side-combinable
    * (bin, split) count at any scale. */
  private val q283PsiDrift: Q = (s, d) => {
    import s.implicits._
    val binExpr = PsiBinEdges.zipWithIndex.foldRight(
      lit(PsiBinEdges.size.toLong)) { case ((edge, i), acc) =>
      when($"n_chars" < edge, i.toLong).otherwise(acc)
    }
    val per = Tables.documents(s, d)
      .select(binExpr.as("bin"), ($"doc_id" % 2 === 0).as("in_a"))
      .groupBy($"bin")
      .agg(sum(when($"in_a", 1L).otherwise(0L)).as("ca"),
        sum(when(!$"in_a", 1L).otherwise(0L)).as("cb"))
    val tot = per.agg(sum($"ca").as("na"), sum($"cb").as("nb"))
    val terms = per.crossJoin(broadcast(tot))
      .select($"bin", $"ca", $"cb",
        expr("(ca * 1000000) div na").as("pa_ppm"),
        expr("(cb * 1000000) div nb").as("pb_ppm"),
        (round(log(($"ca" + 1L).cast("double") * $"nb".cast("double")) * 1e6)
          - round(log(($"cb" + 1L).cast("double") * $"na".cast("double")) * 1e6))
          .cast("long").as("lr_micro"))
      .withColumn("term_pico", ($"pa_ppm" - $"pb_ppm") * $"lr_micro")
      .cache()
    terms.crossJoin(broadcast(
        terms.agg(sum($"term_pico").as("psi_pico"))))
      .select($"bin", $"ca", $"cb", $"pa_ppm", $"pb_ppm", $"term_pico",
        $"psi_pico")
      .orderBy($"bin")
  }


  /** RANK-SUM AUC — does document length separate English from
    * non-English? AUC computed as the Mann-Whitney statistic over
    * doubled midranks (q276's machinery, U/(n₁n₂) identity), so the
    * classifier-evaluation metric every quality model ships with is
    * exact-integer and windowed over DISTINCT lengths, never per-row.
    * auc_ppm = U_2x·10⁶ div 2n₁n₂. */
  private val q284RankAuc: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val per = Tables.documents(s, d)
      .select($"n_chars", ($"lang" === "en").as("pos"))
      .groupBy($"n_chars")
      .agg(sum(when($"pos", 1L).otherwise(0L)).as("ca"),
        sum(when(!$"pos", 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.select($"ca", $"cb",
        sum($"ca" + $"cb").over(w).as("cum"), ($"ca" + $"cb").as("cnt"))
      .agg(sum($"ca").as("n_pos"), sum($"cb").as("n_neg"),
        sum($"ca" * (lit(2L) * $"cum" - $"cnt" + 1L)).as("r1_2x"))
      .select($"n_pos", $"n_neg",
        ($"r1_2x" - $"n_pos" * ($"n_pos" + 1L)).as("u_2x"),
        expr("""((r1_2x - n_pos * (n_pos + 1)) * 1000000)
               div (2 * n_pos * n_neg)""").as("auc_ppm"))
  }


  /** HITS (Kleinberg, JSODA 1998) over the directed customer→supplier
    * purchase graph: hubs = buyers, authorities = suppliers. Integer
    * fixed-point like [[graft.ext.Graph.pageRankExact]]: every round
    * renormalizes scores to sum ≈ 10⁹ via one truncating div against
    * the broadcast total, so all arithmetic stays in longs and the
    * oracle unrolls the identical two rounds as CTEs. Two
    * map-side-combinable shuffles per half-step; scores frames are
    * node-sized. Top-20 authorities. */
  private val q285Hits: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val norm = 1000000000L
    val e = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("src"), $"l_suppkey".as("dst"))
      .distinct().cache()
    val h0 = e.select($"src").distinct()
      .crossJoin(broadcast(e.select($"src").distinct()
        .agg(count(lit(1)).as("ns"))))
      .select($"src", expr(s"$norm div ns").as("h"))
    var h = h0
    var a: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to 2) {
      val aRaw = e.join(h, "src").groupBy($"dst").agg(sum($"h").as("ar"))
      a = aRaw.crossJoin(broadcast(aRaw.agg(sum($"ar").as("at"))))
        .select($"dst", expr(s"(ar * $norm) div at").as("a"))
        .localCheckpoint()
      if (i < 2) {
        val hRaw = e.join(a, "dst").groupBy($"src").agg(sum($"a").as("hr"))
        h = hRaw.crossJoin(broadcast(hRaw.agg(sum($"hr").as("ht"))))
          .select($"src", expr(s"(hr * $norm) div ht").as("h"))
          .localCheckpoint()
      }
    }
    a.withColumn("rk", row_number().over(
        Window.orderBy($"a".desc, $"dst")))
      .filter($"rk" <= 20)
      .select($"rk", $"dst".as("suppkey"), $"a".as("authority_fp"))
      .orderBy($"rk")
  }


  /** KWIC CONCORDANCE (keyword-in-context) — every occurrence of a term
    * with ±3 words of context, the corpus-linguistics primitive behind
    * annotation UIs and context-window audits. Two-phase to stay linear:
    * the occurrence scan explodes WITHOUT retaining the word array (a
    * retained array copies O(words²) cells per document), then only the
    * matching (doc, pos) rows join back to the array for slicing — the
    * join moves occurrences, not the corpus. */
  private val q286Kwic: Q = (s, d) => {
    import s.implicits._
    val wa = Tables.documents(s, d)
      .select($"doc_id", split(lower($"text"), " ").as("ws"))
    val occ = wa.select($"doc_id", posexplode($"ws"))
      .filter($"col" === "spark")
      .select($"doc_id", $"pos".cast("long").as("pos"))
    occ.join(wa, "doc_id")
      .select($"doc_id", $"pos",
        array_join(slice($"ws",
          greatest($"pos" - 3, lit(0L)).cast("int") + 1,
          ($"pos" - greatest($"pos" - 3, lit(0L))).cast("int")), " ")
          .as("left_ctx"),
        array_join(slice($"ws", ($"pos" + 2).cast("int"), lit(3)), " ")
          .as("right_ctx"))
      .orderBy($"doc_id", $"pos")
  }


  /** NTILE QUARTILES × VALUE BUCKETS — the two bucketing semantics a
    * reporting migration must pin down: ntile's rank-based equal-count
    * buckets (first n mod k buckets one larger — order fixed by the
    * (price, orderkey) tiebreak so both engines tile identically) vs
    * fixed-width value buckets (explicit floor arithmetic shared with
    * the oracle rather than any engine's width_bucket). Collapsed to a
    * (status, quartile, bucket) count grid. */
  private val q287NtileBuckets: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, d)
      .select($"o_orderstatus", ntile(4).over(w).as("quartile"),
        least(lit(10L), expr("1 + cast(floor(o_totalprice / 50000.0) as bigint)"))
          .as("bucket"))
      .groupBy($"o_orderstatus", $"quartile", $"bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy($"o_orderstatus", $"quartile", $"bucket")
  }


  /** THEIL-T BETWEEN-GROUP INEQUALITY — how unequally is corpus text
    * mass concentrated across sources? The decomposable complement to
    * q239's Gini (Theil splits into between+within; the between term is
    * the source-level audit). T_b = Σ share·ln(share/pop-share): shares
    * in exact ppm, the log-ratio ln(xs·N) − ln(X·ns) per-term micro-nat
    * quantized (q283's convention) — integer pico-unit sums, one tiny
    * group-by. */
  private val q288TheilBetween: Q = (s, d) => {
    import s.implicits._
    val per = Tables.documents(s, d)
      .groupBy($"source")
      .agg(sum($"n_chars").as("xs"), count(lit(1)).as("ns"))
    val tot = per.agg(sum($"xs").as("xx"), sum($"ns").as("nn"))
    val terms = per.crossJoin(broadcast(tot))
      .select($"source", $"xs", $"ns",
        expr("(xs * 1000000) div xx").as("share_ppm"),
        (round(log($"xs".cast("double") * $"nn".cast("double")) * 1e6)
          - round(log($"xx".cast("double") * $"ns".cast("double")) * 1e6))
          .cast("long").as("lr_micro"))
      .withColumn("term_pico", $"share_ppm" * $"lr_micro")
      .cache()
    terms.crossJoin(broadcast(terms.agg(sum($"term_pico").as("theil_pico"))))
      .select($"source", $"xs", $"ns", $"share_ppm", $"term_pico",
        $"theil_pico")
      .orderBy($"source")
  }


  /** CAPTURE-RECAPTURE SIZE ESTIMATE (Chapman 1951) — estimate corpus
    * cardinality from two independent seeded hash-samples and their
    * overlap: N̂ = (n₁+1)(n₂+1)/(m+1) − 1. The coverage-estimation
    * primitive for "how much of the web did this crawl see" — here
    * audited against the known corpus size so the estimator's bias is
    * measured in-query. Map-only flags, one fold. */
  private val q289CaptureRecapture: Q = (s, d) => {
    import s.implicits._
    def u(seed: String) =
      (conv(substring(md5(concat($"doc_id".cast("string"), lit(seed))), 1, 13),
        16, 10).cast("long").cast("double") + lit(1d)) / lit(4503599627370496d)
    Tables.documents(s, d)
      .select((u(":cr1") < 0.3).cast("long").as("s1"),
        (u(":cr2") < 0.3).cast("long").as("s2"))
      .agg(count(lit(1)).as("true_n"), sum($"s1").as("n1"),
        sum($"s2").as("n2"), sum($"s1" * $"s2").as("m"))
      .select($"true_n", $"n1", $"n2", $"m",
        expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1").as("n_hat"))
      .withColumn("err", $"n_hat" - $"true_n")
  }


  /** TIME-WEIGHTED AVERAGE over an irregular series — the
    * metering/billing semantics (a value holds until the next sample)
    * applied to the gappy hourly purchase-count series: trapezoid
    * integration Σ(vᵢ+vᵢ₊₁)·Δtᵢ / 2T, all integer (counts × hour
    * gaps), one lead() window over the aggregated series. The
    * comparison column is the naive unweighted mean — the bias the TWA
    * exists to correct. */
  private val q290TimeWeightedAvg: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, d).filter($"event_type" === "purchase")
      .groupBy(date_trunc("hour", $"ts").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy($"hr")
    hourly
      .select($"hr", $"cnt",
        lead($"cnt", 1).over(w).as("nv"),
        lead($"hr", 1).over(w).as("nhr"))
      .withColumn("dt",
        expr("(cast(nhr as long) - cast(hr as long)) div 3600"))
      .agg(count(lit(1)).as("n_samples"),
        sum($"cnt").as("sum_v"),
        sum(when($"nv".isNotNull, ($"cnt" + $"nv") * $"dt")).as("trap2"),
        sum(when($"nv".isNotNull, $"dt")).as("t_hours"))
      .select($"n_samples", $"t_hours",
        expr("(trap2 * 1000) div (2 * t_hours)").as("twa_milli"),
        expr("(sum_v * 1000) div n_samples").as("naive_mean_milli"))
  }


  /** LEAKAGE-FREE TRAIN/TEST SPLIT — the dedup-aware split every
    * benchmark-clean corpus needs: near-dup CLUSTERS (q86's connected
    * components, singletons = their own component) are assigned to
    * splits ATOMICALLY by a seeded hash of the component id, so no
    * near-duplicate pair can straddle the boundary. The gate MEASURES
    * the guarantee: cross-split near-dup pairs, structurally zero, is
    * an output column — a per-doc random split would fail it
    * immediately. Movement = q86's bounded pair slice + one component
    * hash; at corpus scale the same construction rides q43's LSH
    * components. */
  private val q291LeakageFreeSplit: Q = (s, d) => {
    import s.implicits._
    val slice = shingled(s, d, maxDocId = Some(BruteForceSlice)).cache()
    val a = slice.toDF("doc_a", "sh_a")
    val b = slice.toDF("doc_b", "sh_b")
    val pairs = a.crossJoin(broadcast(b))
      .filter($"doc_a" < $"doc_b")
      .filter(Dedup.jaccard($"sh_a", $"sh_b") > 0.5)
      .select($"doc_a", $"doc_b").cache()
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val comp = Tables.documents(s, d)
      .filter($"doc_id" < BruteForceSlice).select($"doc_id")
      .join(cc, $"doc_id" === cc("node"), "left")
      .select($"doc_id",
        coalesce($"component", $"doc_id").as("component"))
      .withColumn("split",
        when((conv(substring(md5(concat($"component".cast("string"),
          lit(":split"))), 1, 13), 16, 10)
          .cast("long").cast("double") + lit(1d)) / lit(4503599627370496d)
          < 0.2, "test").otherwise("train"))
      .cache()
    val leak = pairs
      .join(comp.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(comp.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .agg(coalesce(sum(when($"sa" =!= $"sb", 1L).otherwise(0L)), lit(0L))
        .as("cross_split_pairs"))
    comp.groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"component").as("n_components"))
      .crossJoin(broadcast(leak))
      .orderBy($"split")
  }


  /** DEDUP OPERATING CURVE — how many near-dup pairs does each Jaccard
    * threshold catch? The tuning table behind every "why 0.8?"
    * decision. One bounded pair scan produces integer (∩, ∪) sizes;
    * the five thresholds fold via cross-multiplication (100·∩ ≥ t·∪ —
    * no float Jaccard anywhere), so the curve costs one broadcast of
    * five literals, not five scans. */
  private val q292DedupThresholdCurve: Q = (s, d) => {
    import s.implicits._
    val slice = shingled(s, d, maxDocId = Some(BruteForceSlice)).cache()
    val a = slice.toDF("doc_a", "sh_a")
    val b = slice.toDF("doc_b", "sh_b")
    val pairs = a.crossJoin(broadcast(b))
      .filter($"doc_a" < $"doc_b")
      .select(size(array_intersect($"sh_a", $"sh_b")).cast("long").as("inter"),
        (size($"sh_a") + size($"sh_b")).cast("long").as("ss"))
      .filter($"inter" > 0)
      .withColumn("uni", $"ss" - $"inter")
    pairs.crossJoin(broadcast(Seq(50L, 60L, 70L, 80L, 90L).toDF("t_pct")))
      .groupBy($"t_pct")
      .agg(sum(when($"inter" * 100L >= $"t_pct" * $"uni", 1L).otherwise(0L))
        .as("n_pairs"))
      .orderBy($"t_pct")
  }


  /** SCD2 POINT-IN-TIME LOOKUP — the read half of q155's slowly-changing
    * dimension: reconstruct every customer's segment AS OF two dates
    * (one inside the original validity window, one after the
    * re-segmentation batch) with the canonical interval predicate
    * valid_from ≤ D < coalesce(valid_to, ∞). Collapsed to per-(as_of,
    * segment) counts; totals prove exactly one version matched per
    * customer per date. */
  private val q293Scd2Timetravel: Q = (s, d) => {
    import s.implicits._
    val v1 = lit("2024-01-01").cast("date")
    val v2 = lit("2024-07-01").cast("date")
    val base = Tables.customer(s, d).select($"c_custkey", $"c_mktsegment")
    val batch = base
      .filter($"c_custkey" % 7 === 0 && $"c_mktsegment" =!= "MACHINERY")
      .select($"c_custkey", lit("MACHINERY").as("new_segment"))
    val flagged = base.join(broadcast(batch), Seq("c_custkey"), "left")
    val history = flagged.select($"c_custkey", $"c_mktsegment".as("segment"),
        v1.as("valid_from"),
        when($"new_segment".isNotNull, v2).otherwise(lit(null).cast("date"))
          .as("valid_to"))
      .unionByName(flagged.filter($"new_segment".isNotNull)
        .select($"c_custkey", $"new_segment".as("segment"),
          v2.as("valid_from"), lit(null).cast("date").as("valid_to")))
    val asofs = Seq("2024-03-15", "2024-09-01").toDF("as_of")
      .select($"as_of".cast("date").as("as_of"))
    history.crossJoin(broadcast(asofs))
      .filter($"valid_from" <= $"as_of" &&
        ($"valid_to".isNull || $"as_of" < $"valid_to"))
      .groupBy($"as_of".cast("string").as("as_of"), $"segment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"as_of", $"segment")
  }


  /** SEMI-ADDITIVE PERIOD-END BALANCES — event values as cents-exact
    * deltas, rolled to each user's MONTHLY CLOSING balance (the
    * balance-sheet semantics where month columns must NOT be summed
    * across time). Values quantize to integer cents once
    * (round-half-away, both engines), then one (user, month) aggregate
    * and one per-user running window over months — never a window over
    * raw events. Bounded to user_id < 50 for the gate. */
  private val q294PeriodEndBalance: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables.events(s, d).filter($"user_id" < 50)
      .groupBy($"user_id", date_trunc("month", $"ts").as("month"))
      .agg(sum(round($"value" * 100d).cast("long")).as("delta_cents"))
    monthly
      .select($"user_id", $"month".cast("date").cast("string").as("month"),
        $"delta_cents",
        sum($"delta_cents").over(Window.partitionBy($"user_id")
          .orderBy($"month").rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("closing_cents"))
      .orderBy($"user_id", $"month")
  }


  /** HIERARCHY SHARES — percent-of-parent at every level of the
    * region ▸ nation ▸ customer rollup (the drill-down table every BI
    * layer renders): nation rows carry share-of-region and
    * share-of-total in exact ppm. One customer-grain aggregate, then
    * broadcast-joined parent totals — shares never re-scan the fact. */
  private val q295HierarchyShares: Q = (s, d) => {
    import s.implicits._
    val perNation = Tables.customer(s, d)
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      .join(broadcast(Tables.nation(s, d)),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"n_regionkey", $"n_cust")
    val perRegion = perNation.groupBy($"n_regionkey")
      .agg(sum($"n_cust").as("region_cust"))
    val tot = perNation.agg(sum($"n_cust").as("total_cust"))
    perNation
      .join(broadcast(perRegion), "n_regionkey")
      .crossJoin(broadcast(tot))
      .join(broadcast(Tables.region(s, d)),
        $"n_regionkey" === $"r_regionkey")
      .select($"r_name", $"n_name", $"n_cust", $"region_cust",
        expr("(n_cust * 1000000) div region_cust").as("share_of_region_ppm"),
        expr("(n_cust * 1000000) div total_cust").as("share_of_total_ppm"))
      .orderBy($"r_name", $"n_name")
  }


  /** BELLMAN-FORD (3 unrolled min-plus rounds) over the weighted trade
    * graph — cheapest 3-hop route from the smallest customer to every
    * supplier, edge weight = the cheapest line item (integer cents) ever
    * traded on that (customer, supplier) pair. The q178 fixed-point
    * pattern applied to min-plus instead of sum-times: per round one
    * map-side-combinable min groupBy + one node-universe left join,
    * localCheckpoint pinning lineage; the oracle unrolls the identical
    * three relaxations as CTEs. INF = 10¹⁵ keeps unreached nodes exact
    * under long arithmetic. */
  private val q296BellmanFord: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val inf = 1000000000000000L
    val pairCost = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_suppkey", $"l_extendedprice"),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey", $"l_suppkey")
      .agg(min(round($"l_extendedprice" * 100d).cast("long")).as("w"))
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"),
        $"w")
    val edges = pairCost.unionByName(
      pairCost.select($"dst".as("src"), $"src".as("dst"), $"w")).cache()
    val nodes = edges.select($"src".as("node")).distinct().localCheckpoint()
    val source = edges.agg((min(when($"src" % 2 === 0, $"src")))
      .as("s0"))
    var dist = nodes.crossJoin(broadcast(source))
      .select($"node", when($"node" === $"s0", 0L).otherwise(inf).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val relax = edges.join(dist, edges("src") === dist("node"))
        .filter($"dist" < inf)
        .select($"dst", ($"dist" + $"w").as("cand"))
        .groupBy($"dst").agg(min($"cand").as("best"))
      dist = dist.join(relax, dist("node") === relax("dst"), "left")
        .select(dist("node"),
          least($"dist", coalesce($"best", lit(inf))).as("dist"))
        .localCheckpoint()
    }
    dist.filter($"node" % 2 === 1 && $"dist" < inf)
      .select(expr("(node - 1) div 2").as("suppkey"), $"dist".as("cents"))
      .withColumn("rk", row_number().over(Window.orderBy($"cents", $"suppkey")))
      .filter($"rk" <= 30)
      .select($"rk", $"suppkey", $"cents")
      .orderBy($"rk")
  }


  /** GAPS-AND-ISLANDS — longest consecutive-day activity streaks (the
    * retention/engagement metric): the island key is day − row_number
    * (constant within a run of consecutive days, the classic trick that
    * needs no self-join and no recursion). One (user, day) distinct,
    * one per-user window, top-20 streaks with full tiebreak. */
  private val q297Streaks: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ud = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    ud.withColumn("island", expr("date_sub(day, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY day))"))
      .groupBy($"user_id", $"island")
      .agg(min($"day").cast("string").as("start_day"),
        count(lit(1)).as("streak_len"))
      .withColumn("rk", row_number().over(Window.orderBy(
        $"streak_len".desc, $"user_id", $"start_day")))
      .filter($"rk" <= 20)
      .select($"rk", $"user_id", $"start_day", $"streak_len")
      .orderBy($"rk")
  }


  /** SENTENCE SEGMENTATION STATS — per-source sentence counts and exact
    * integer length moments from a shared `[.!?]+\s*` splitter (the
    * same character-class regex means Java and RE2 agree). Map-only
    * split + one combinable aggregate; the corpus-linguistics sibling
    * of q33's token stats one level up the segmentation stack. */
  private val q298Sentences: Q = (s, d) => {
    import s.implicits._
    val sents = Tables.documents(s, d)
      .select($"source",
        filter(split($"text", "[.!?]+\\s*"), x => length(x) > 0)
          .as("sents"))
      .select($"source", size($"sents").cast("long").as("ns"),
        aggregate($"sents", lit(0L), (acc, x) => acc + length(x))
          .as("chars"),
        aggregate($"sents", lit(0L),
          (acc, x) => greatest(acc, length(x).cast("long"))).as("mx"))
    sents.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"ns").as("n_sentences"),
        expr("(sum(chars) * 1000) div sum(ns)").as("mean_sent_len_milli"),
        max($"mx").as("max_sent_len"))
      .orderBy($"source")
  }


  /** INTER-ARRIVAL DISTRIBUTION — per event type: exact microsecond
    * gaps between consecutive events (unix_micros, so no float epoch
    * rounding can diverge), with mean and an interpolation-free
    * value-domain median (smallest gap whose doubled cumulative count
    * reaches n — the q233 convention). One per-type lag window + one
    * per-(type, gap) aggregate; the burstiness companion to q240's
    * Fano factor. */
  private val q299Interarrival: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"us", $"event_id")
    val gaps = Tables.events(s, d)
      .select($"event_type", unix_micros($"ts").as("us"), $"event_id")
      .withColumn("gap", $"us" - lag($"us", 1).over(w))
      .filter($"gap".isNotNull)
      .select($"event_type", $"gap")
    val per = gaps.groupBy($"event_type", $"gap")
      .agg(count(lit(1)).as("c"))
    val wq = Window.partitionBy($"event_type").orderBy($"gap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy($"event_type")
    val med = per
      .select($"event_type", $"gap", sum($"c").over(wq).as("cum"),
        sum($"c").over(wt).as("n"))
      .filter($"cum" * 2 >= $"n")
      .groupBy($"event_type").agg(min($"gap").as("median_gap_us"))
    gaps.groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("sum(gap) div count(1)").as("mean_gap_us"),
        min($"gap").as("min_gap_us"), max($"gap").as("max_gap_us"))
      .join(med, "event_type")
      .orderBy($"event_type")
  }


  /** DUPLICATE-CLUSTER SIZE DISTRIBUTION — the shape report on q86's
    * components (singletons restored from the universe): how much of
    * the corpus sits in pairs vs larger dup families decides whether
    * keep-one dedup or cluster-canonicalization is the right policy.
    * Sizes bucketed 1..4 and 5+ so the histogram is constant-width at
    * any corpus size. */
  private val q300ClusterSizeDist: Q = (s, d) => {
    import s.implicits._
    val slice = shingled(s, d, maxDocId = Some(BruteForceSlice)).cache()
    val a = slice.toDF("doc_a", "sh_a")
    val b = slice.toDF("doc_b", "sh_b")
    val pairs = a.crossJoin(broadcast(b))
      .filter($"doc_a" < $"doc_b")
      .filter(Dedup.jaccard($"sh_a", $"sh_b") > 0.5)
      .select($"doc_a", $"doc_b")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    Tables.documents(s, d)
      .filter($"doc_id" < BruteForceSlice).select($"doc_id")
      .join(cc, $"doc_id" === cc("node"), "left")
      .select($"doc_id", coalesce($"component", $"doc_id").as("component"))
      .groupBy($"component").agg(count(lit(1)).as("sz"))
      .select(least($"sz", lit(5L)).as("cluster_size"), $"sz")
      .groupBy($"cluster_size")
      .agg(count(lit(1)).as("n_clusters"), sum($"sz").as("n_docs"))
      .orderBy($"cluster_size")
  }


  /** PAIRWISE CORRELATION PROFILE — exact integer sufficient statistics
    * for every numeric column pair of lineitem in ONE scan (quantity,
    * cents-quantized price, centi-quantized discount/tax): the
    * profiling matrix feature stores compute before feature selection.
    * r_ppm folds the q271 way (truncating div against the identically-
    * rounded floor(sqrt(double·double))); the six pairs ride a single
    * combinable aggregate — never one scan per pair. */
  private val q301CorrMatrix: Q = (s, d) => {
    import s.implicits._
    val base = Tables.lineitem(s, d).select(
      $"l_quantity".cast("long").as("q"),
      round($"l_discount" * 100d).cast("long").as("dd"),
      round($"l_tax" * 100d).cast("long").as("t"))
    // one-row sufficient-statistics frame, cached so the three pair
    // branches below don't re-scan lineitem once each
    val ag = base.agg(
      count(lit(1)).as("n"),
      sum($"q").as("sq"), sum($"dd").as("sd"), sum($"t").as("st"),
      sum($"q" * $"q").as("sqq"), sum($"q" * $"dd").as("sqd"),
      sum($"q" * $"t").as("sqt"), sum($"dd" * $"t").as("sdt"),
      sum($"dd" * $"dd").as("sdd"), sum($"t" * $"t").as("stt")).cache()
    def r(tag: String, sx: String, sy: String, sxy: String,
          sxx: String, syy: String) =
      ag.select(lit(tag).as("pair"), $"n",
        expr(s"(n*$sxy - $sx*$sy)").as("cov_n"),
        // ×1000 against den÷1000 (not ×10⁶ against den): keeps the
        // numerator < 2⁶³ even when the covariance is at its n·Σxy bound
        expr(s"""((n*$sxy - $sx*$sy) * 1000) div
               nullif(cast(floor(sqrt(cast(n*$sxx - $sx*$sx as double)
                 * cast(n*$syy - $sy*$sy as double))) as bigint) div 1000, 0)""")
          .as("r_ppm"))
    r("quantity~discount", "sq", "sd", "sqd", "sqq", "sdd")
      .unionByName(r("quantity~tax", "sq", "st", "sqt", "sqq", "stt"))
      .unionByName(r("discount~tax", "sd", "st", "sdt", "sdd", "stt"))
      .orderBy($"pair")
  }


  /** SIMPSON'S-PARADOX DETECTOR — does the overall price↔date trend
    * contradict the per-status trends? The aggregation-bias audit every
    * metrics team needs before trusting a topline trend. Only SIGNS are
    * compared, and the sign of a Pearson slope is the sign of the
    * integer covariance numerator n·Σxy − Σx·Σy (cents × day-index, all
    * exact), so the detector needs no division at all. One scan for the
    * groups + one broadcast overall row. */
  private val q302SimpsonDetector: Q = (s, d) => {
    import s.implicits._
    // day-index × KILODOLLAR scale keeps n·Σxy < 2⁶³ to ~3·10⁶ orders
    // (documented bound, the pageRankExact convention — dollars already
    // overflow at 1.5·10⁵ orders; beyond the bound, center and sample)
    val base = Tables.orders(s, d).select($"o_orderstatus",
      datediff($"o_orderdate", lit("2020-01-01").cast("date")).cast("long")
        .as("x"),
      round($"o_totalprice" / 1000d).cast("long").as("y"))
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"))
    val overall = stats(base)
      .select(expr("sign(n*sxy - sx*sy)").cast("long").as("overall_sign"))
    base.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"))
      .select($"o_orderstatus", $"n",
        expr("sign(n*sxy - sx*sy)").cast("long").as("group_sign"))
      .crossJoin(broadcast(overall))
      .withColumn("contradicts", $"group_sign" =!= lit(0L) &&
        $"overall_sign" =!= lit(0L) && $"group_sign" =!= $"overall_sign")
      .orderBy($"o_orderstatus")
  }


  /** TIME-TO-CONVERT DISTRIBUTION — seconds from each user's first
    * signup to their first subsequent purchase (q142's funnel, but the
    * LATENCY distribution instead of the count): exact integer deltas,
    * mean via truncating div, and the interpolation-free value-domain
    * median (q233/q299 convention). Two first-event aggregates and one
    * tiny join — never a per-user sort of raw events. */
  private val q303TimeToConvert: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"us").as("s_us"))
    val deltas = signup.join(
        ev.filter($"event_type" === "purchase")
          .select($"user_id", $"us".as("p_us")), "user_id")
      .filter($"p_us" >= $"s_us")
      .groupBy($"user_id", $"s_us").agg(min($"p_us").as("first_p"))
      .select(expr("(first_p - s_us) div 1000000").as("delta_s"))
      .cache()
    val per = deltas.groupBy($"delta_s").agg(count(lit(1)).as("c"))
    val wq = Window.orderBy($"delta_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = per
      .select($"delta_s", sum($"c").over(wq).as("cum"))
      .crossJoin(broadcast(deltas.agg(count(lit(1)).as("nn"))))
      .filter($"cum" * 2 >= $"nn")
      .agg(min($"delta_s").as("median_s"))
    deltas.agg(count(lit(1)).as("n_converted"),
        expr("sum(delta_s) div count(1)").as("mean_s"),
        min($"delta_s").as("min_s"), max($"delta_s").as("max_s"))
      .crossJoin(broadcast(med))
  }


  /** COHORT LTV CURVE — q143's retention triangle with MONEY: per
    * signup-month cohort, cumulative purchase value (exact cents)
    * through months-since-signup 0..3. One windowed running sum over
    * the (cohort, month_idx) aggregate; the curve every growth model
    * fits. */
  private val q304CohortLtv: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val cohort = ev.filter($"event_type" === "signup")
      .groupBy($"user_id")
      .agg(date_trunc("month", min($"ts")).as("cohort_month"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", date_trunc("month", $"ts").as("p_month"),
        round($"value" * 100d).cast("long").as("cents"))
    val cells = purch.join(cohort, "user_id")
      .withColumn("m_idx",
        (months_between($"p_month", $"cohort_month")).cast("long"))
      .filter($"m_idx" >= 0 && $"m_idx" <= 3)
      .groupBy($"cohort_month", $"m_idx")
      .agg(sum($"cents").as("cents"), countDistinct($"user_id")
        .as("buyers"))
    val sz = cohort.groupBy($"cohort_month")
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sz, "cohort_month")
      .select($"cohort_month".cast("date").cast("string").as("cohort_month"),
        $"m_idx", $"buyers", $"cohort_size",
        sum($"cents").over(Window.partitionBy($"cohort_month")
          .orderBy($"m_idx").rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("cum_cents"))
      .withColumn("ltv_cents_per_user",
        expr("cum_cents div cohort_size"))
      .orderBy($"cohort_month", $"m_idx")
  }


  /** QUOTA-EXACT STRATIFIED SAMPLE — q264's largest-remainder quotas
    * EXECUTED: each source contributes exactly its apportioned share of
    * the 50-doc holdout, members picked by seeded-hash rank within the
    * stratum (deterministic, order-free). The gate proves the two
    * halves compose: Σ picked == H exactly, picked == quota per
    * stratum. One count aggregate + one per-source rank window. */
  private val q305QuotaSample: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val H = HoldoutQuota
    val counts = Tables.documents(s, d)
      .groupBy($"source").agg(count(lit(1)).as("cnt")).cache()
    val quotas = counts
      .crossJoin(broadcast(counts.agg(sum($"cnt").as("total"))))
      .withColumn("floor_q", expr(s"(cnt * $H) div total"))
      .withColumn("rem", expr(s"(cnt * $H) % total"))
      .withColumn("rrank", row_number().over(
        Window.orderBy($"rem".desc, $"source")))
      .crossJoin(broadcast(
        counts.crossJoin(counts.agg(sum($"cnt").as("t2")))
          .agg((lit(H) - sum(expr(s"(cnt * $H) div t2"))).as("leftover"))))
      .select($"source", $"cnt",
        ($"floor_q" + when($"rrank" <= $"leftover", 1L).otherwise(0L))
          .as("quota"))
    val ranked = Tables.documents(s, d)
      .select($"source", $"doc_id",
        md5(concat($"doc_id".cast("string"), lit(":qs"))).as("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
    ranked.join(broadcast(quotas), "source")
      .filter($"rk" <= $"quota")
      .groupBy($"source")
      .agg(max($"cnt").as("cnt"), max($"quota").as("quota"),
        count(lit(1)).as("picked"))
      .crossJoin(broadcast(
        ranked.join(broadcast(quotas), "source").filter($"rk" <= $"quota")
          .agg(count(lit(1)).as("total_picked"))))
      .orderBy($"source")
  }


  /** DEDUP TOKEN-SAVINGS REPORT — the business case for q86's
    * clustering: tokens in the bounded slice vs tokens surviving
    * keep-canonical-per-cluster dedup, savings in ppm. Clusters come
    * from the same bounded pair machinery; token counts ride the shared
    * words()/wordsSql tokenizer pair so both engines count identically.
    * The number that decides whether a dedup pass pays for itself at
    * 100 TB. */
  private val q306DedupSavings: Q = (s, d) => {
    import s.implicits._
    val slice = shingled(s, d, maxDocId = Some(BruteForceSlice)).cache()
    val a = slice.toDF("doc_a", "sh_a")
    val b = slice.toDF("doc_b", "sh_b")
    val pairs = a.crossJoin(broadcast(b))
      .filter($"doc_a" < $"doc_b")
      .filter(Dedup.jaccard($"sh_a", $"sh_b") > 0.5)
      .select($"doc_a", $"doc_b")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    Tables.documents(s, d)
      .filter($"doc_id" < BruteForceSlice)
      .select($"doc_id", size(TextAnalysis.words($"text")).cast("long")
        .as("toks"))
      .join(cc, $"doc_id" === cc("node"), "left")
      .select($"doc_id", $"toks",
        coalesce($"component", $"doc_id").as("component"))
      .withColumn("keep", $"doc_id" === $"component")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_keep"),
        sum($"toks").as("total_tokens"),
        sum(when($"keep", $"toks").otherwise(0L)).as("kept_tokens"))
      .withColumn("savings_ppm",
        expr("((total_tokens - kept_tokens) * 1000000) div total_tokens"))
  }


  /** QUANTILE TRANSFORM — map each document's length to its exact
    * corpus percentile rank in ppm ((rank_min − 1)·10⁶ div (n−1), the
    * percent_rank identity) WITHOUT a per-row rank window: ranks fold
    * from cumulative counts over the value domain and join back by
    * value. The monotone feature normalization that makes downstream
    * thresholds corpus-relative. Output bounded to doc_id < 1000;
    * ranks computed from the full corpus. */
  private val q307QuantileTransform: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val per = Tables.documents(s, d)
      .groupBy($"n_chars").agg(count(lit(1)).as("c"))
    val w = Window.orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = per
      .select($"n_chars", (sum($"c").over(w) - $"c" + 1L).as("rank_min"))
      .crossJoin(broadcast(
        per.agg(sum($"c").as("n"))))
      .select($"n_chars",
        expr("((rank_min - 1) * 1000000) div (n - 1)").as("pct_ppm"))
    Tables.documents(s, d).filter($"doc_id" < 1000)
      .select($"doc_id", $"n_chars")
      .join(ranks, "n_chars")
      .select($"doc_id", $"n_chars", $"pct_ppm")
      .orderBy($"doc_id")
  }


  /** HASH-RING NEGATIVE SAMPLING — deterministic contrastive negatives:
    * each anchor (doc_id < 200) requests 3 candidates at seeded-hash
    * ring positions (mod the broadcast corpus size), joined back BY KEY
    * — never an anchor×corpus similarity pass. Same-source collisions
    * are dropped and MEASURED (the contrastive-training contract:
    * negatives must cross sources). Output: per-anchor found counts +
    * the global drop rate. */
  private val q308NegativeSampling: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"source").cache()
    val n = docs.agg(max($"doc_id").as("maxid"))
    val anchors = docs.filter($"doc_id" < 200)
    val req = anchors.crossJoin(broadcast(Seq(1L, 2L, 3L).toDF("j")))
      .crossJoin(broadcast(n))
      .select($"doc_id".as("anchor"), $"source".as("a_src"), $"j",
        (conv(substring(md5(concat($"doc_id".cast("string"), lit(":"),
          $"j".cast("string"), lit(":ns"))), 1, 13), 16, 10).cast("long")
          % ($"maxid" + 1L)).as("cand_id"))
    val joined = req.join(docs.select($"doc_id".as("cand_id"),
        $"source".as("c_src")), "cand_id")
      .withColumn("ok", $"a_src" =!= $"c_src").cache()
    val drops = joined.agg(
      expr("(sum(case when ok then 0 else 1 end) * 1000000) div count(1)")
        .as("drop_ppm"))
    joined.groupBy($"anchor")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when($"ok", 1L).otherwise(0L)).as("n_negatives"))
      .crossJoin(broadcast(drops))
      .orderBy($"anchor")
  }


  /** LSH DESIGN CURVE — the (bands × rows) tuning table computed from
    * the MEASURED pair-similarity distribution (not the textbook j
    * grid): for each candidate config with b·r = 128, the expected
    * candidate mass Σ p(j) and expected recall over true near-dups,
    * where p = 1−(1−jʳ)ᵇ is evaluated by an EXPLICIT
    * multiply-and-square chain written identically in both engines
    * (exactly-rounded IEEE ops in the same order ⇒ bit-equal), then
    * micro-rounded per pair before the integer sum. One bounded pair
    * scan serves all three configs. */
  private val q309LshDesignCurve: Q = (s, d) => {
    import s.implicits._
    val slice = shingled(s, d, maxDocId = Some(BruteForceSlice)).cache()
    val a = slice.toDF("doc_a", "sh_a")
    val b = slice.toDF("doc_b", "sh_b")
    val pairs = a.crossJoin(broadcast(b))
      .filter($"doc_a" < $"doc_b")
      .select(size(array_intersect($"sh_a", $"sh_b")).cast("long")
        .as("inter"),
        (size($"sh_a") + size($"sh_b")).cast("long").as("ss"))
      .filter($"inter" > 0)
      .selectExpr("cast(inter as double) / cast(ss - inter as double) as j",
        "inter", "ss - inter as uni")
      .cache()
    // p(b,r): jʳ by repeated squaring, then (1−jʳ)ᵇ by repeated
    // squaring — each step is ONE multiplication materialized as a
    // column, and the oracle replays the identical step sequence, so
    // the doubles are bit-equal (IEEE ops, same order)
    def cfg(bands: Int, rows: Int) = {
      val rSquarings = Map(2 -> 1, 4 -> 2, 8 -> 3)(rows)
      val bSquarings = Map(16 -> 4, 32 -> 5, 64 -> 6)(bands)
      var df = pairs.selectExpr("inter", "uni", "j as p0")
      for (i <- 1 to rSquarings)
        df = df.selectExpr("inter", "uni", s"p${i-1} * p${i-1} as p$i")
      df = df.selectExpr("inter", "uni", s"1.0 - p$rSquarings as t0")
      for (i <- 1 to bSquarings)
        df = df.selectExpr("inter", "uni", s"t${i-1} * t${i-1} as t$i")
      df.selectExpr("inter", "uni",
          s"cast(round((1.0 - t$bSquarings) * 1000000.0) as bigint) as p_micro")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"p_micro").as("expected_cand_micro"),
          sum(when($"inter" * 10L > ($"uni") * 8L, $"p_micro"))
            .as("recall_mass_micro"),
          sum(when($"inter" * 10L > ($"uni") * 8L, 1L).otherwise(0L))
            .as("n_true"))
        .select(lit(s"b=$bands,r=$rows").as("config"), $"n_pairs",
          $"n_true", $"expected_cand_micro",
          expr("recall_mass_micro div nullif(n_true, 0)")
            .as("expected_recall_micro"))
    }
    cfg(32, 4).unionByName(cfg(16, 8)).unionByName(cfg(64, 2))
      .orderBy($"config")
  }


  /** SIMHASH OPERATING CHARACTERISTIC — precision/recall of
    * Hamming-radius candidate generation against exact-Jaccard truth
    * (> 0.8) on the bounded slice, per radius ∈ {0,1,2,3,8,16}: the
    * measured justification for q161's radius-3 pigeonhole bound. The
    * md5 simhash is the q44 construction both engines replay
    * bit-for-bit; Hamming = bit_count(xor). One pair scan, six
    * threshold folds. */
  private val q310SimhashPr: Q = (s, d) => {
    import s.implicits._
    val sh = shingled(s, d, maxDocId = Some(BruteForceSlice)).cache()
    val fp = Tables.documents(s, d).filter($"doc_id" < BruteForceSlice)
      .repartition($"doc_id")
      .select($"doc_id",
        Dedup.simhashMd5(graft.text.TextOps.tokenizeBasic($"text"))
          .as("f"))
    val base = sh.toDF("doc_a", "sh_a")
      .join(fp.toDF("doc_a", "f_a"), "doc_a")
    val other = sh.toDF("doc_b", "sh_b")
      .join(fp.toDF("doc_b", "f_b"), "doc_b")
    val pairs = base.crossJoin(broadcast(other))
      .filter($"doc_a" < $"doc_b")
      .select(size(array_intersect($"sh_a", $"sh_b")).cast("long")
          .as("inter"),
        (size($"sh_a") + size($"sh_b")).cast("long").as("ss"),
        expr("bit_count(f_a ^ f_b)").cast("long").as("ham"))
      .withColumn("uni", $"ss" - $"inter")
      .withColumn("truth", $"inter" * 10L > $"uni" * 8L)
      .cache()
    pairs.crossJoin(broadcast(
        Seq(0L, 1L, 2L, 3L, 8L, 16L).toDF("radius")))
      .groupBy($"radius")
      .agg(sum(when($"ham" <= $"radius", 1L).otherwise(0L)).as("n_cand"),
        sum(when($"ham" <= $"radius" && $"truth", 1L).otherwise(0L))
          .as("n_tp"),
        sum(when($"truth", 1L).otherwise(0L)).as("n_true"))
      .select($"radius", $"n_cand", $"n_tp", $"n_true",
        expr("(n_tp * 1000000) div nullif(n_cand, 0)").as("precision_ppm"),
        expr("(n_tp * 1000000) div nullif(n_true, 0)").as("recall_ppm"))
      .orderBy($"radius")
  }


  /** FULFILLMENT LEAD-TIME SLA — ship-date minus order-date in days per
    * order priority: exact integer day deltas, value-domain median and
    * p90 (the q233 convention), and the share meeting a 30-day SLA in
    * ppm. The classic warehouse service-level table; one join + one
    * per-(priority, delta) aggregate, windows over the bounded delta
    * domain. */
  private val q311LeadTimeSla: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val deltas = Tables.orders(s, d)
      .select($"o_orderkey", $"o_orderpriority", $"o_orderdate")
      .join(Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_orderpriority",
        datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
          .cast("long").as("dd"))
    val per = deltas.groupBy($"o_orderpriority", $"dd")
      .agg(count(lit(1)).as("c"))
    val wq = Window.partitionBy($"o_orderpriority").orderBy($"dd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy($"o_orderpriority")
    val cum = per.select($"o_orderpriority", $"dd",
      sum($"c").over(wq).as("cum"), sum($"c").over(wt).as("n"))
    val med = cum.filter($"cum" * 2 >= $"n")
      .groupBy($"o_orderpriority").agg(min($"dd").as("median_days"))
    val p90 = cum.filter($"cum" * 10 >= $"n" * 9)
      .groupBy($"o_orderpriority").agg(min($"dd").as("p90_days"))
    deltas.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        expr("(sum(case when dd <= 30 then 1 else 0 end) * 1000000) div count(1)")
          .as("sla30_ppm"))
      .join(med, "o_orderpriority").join(p90, "o_orderpriority")
      .orderBy($"o_orderpriority")
  }


  /** LAST-TOUCH ATTRIBUTION — for every purchase, the user's most
    * recent PRIOR non-purchase event takes the credit; share per
    * channel in ppm. The canonical marketing-attribution fold: one
    * per-user event-time window (bounded per-user history), a
    * last_value over the running non-purchase carry, then a tiny
    * channel aggregate. First-event purchases attribute to 'none'. */
  private val q312Attribution: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        $"event_id")
      .withColumn("touch",
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select(coalesce($"touch", lit("none")).as("touch"))
    val tot = touched.agg(count(lit(1)).as("nn"))
    touched.groupBy($"touch").agg(count(lit(1)).as("n_purchases"))
      .crossJoin(broadcast(tot))
      .select($"touch", $"n_purchases",
        expr("(n_purchases * 1000000) div nn").as("share_ppm"))
      .orderBy($"touch")
  }


  /** WEEK-OVER-WEEK GROWTH — weekly event volume with growth rate in
    * signed ppm ((cur−prev)·10⁶ div prev, truncation toward zero
    * matching both engines on negatives): the topline every dashboard
    * leads with. One calendar-bounded aggregate + one lag. */
  private val q313GrowthRates: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val weekly = Tables.events(s, d)
      .groupBy(date_trunc("week", $"ts").as("week"))
      .agg(count(lit(1)).as("cnt"))
    weekly
      .select($"week".cast("date").cast("string").as("week"), $"cnt",
        lag($"cnt", 1).over(Window.orderBy($"week")).as("prev"))
      .select($"week", $"cnt", $"prev",
        expr("((cnt - prev) * 1000000) div prev").as("wow_ppm"))
      .orderBy($"week")
  }


  /** BOUNDED-DAY RETENTION (D1/D7/D30) — of users first seen on each
    * day, the share active again within k days (exclusive of day 0):
    * the canonical growth-accounting metric, folded WITHOUT a per-user
    * timeline: first-day table ⋈ activity days once, then three
    * day-difference threshold folds share the join. Rates in ppm per
    * cohort day, overall summary row per k. */
  private val q314RetentionDk: Q = (s, d) => {
    import s.implicits._
    val ud = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day")).distinct().cache()
    val first = ud.groupBy($"user_id").agg(min($"day").as("d0"))
    val joined = first.join(ud, "user_id")
      .select($"user_id", datediff($"day", $"d0").cast("long").as("dd"))
      .filter($"dd" > 0)
      .groupBy($"user_id")
      .agg(min($"dd").as("first_return"))
    val tot = first.agg(count(lit(1)).as("n_users"))
    first.join(joined, Seq("user_id"), "left")
      .agg(
        sum(when($"first_return" === 1L, 1L).otherwise(0L)).as("d1"),
        sum(when($"first_return" <= 7L, 1L).otherwise(0L)).as("d7"),
        sum(when($"first_return" <= 30L, 1L).otherwise(0L)).as("d30"))
      .crossJoin(broadcast(tot))
      .select($"n_users", $"d1", $"d7", $"d30",
        expr("(d1 * 1000000) div n_users").as("d1_ppm"),
        expr("(d7 * 1000000) div n_users").as("d7_ppm"),
        expr("(d30 * 1000000) div n_users").as("d30_ppm"))
  }


  /** STICKINESS (DAU/MAU) — per month: mean daily actives over monthly
    * actives in ppm, the engagement-density ratio. avg DAU folds as
    * Σ daily-distinct div days (integer), MAU is one month-distinct —
    * two aggregates over the same (day, user) distinct frame. */
  private val q315Stickiness: Q = (s, d) => {
    import s.implicits._
    val ud = Tables.events(s, d)
      .select(to_date($"ts").as("day"), $"user_id").distinct().cache()
    val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
      .groupBy(date_trunc("month", $"day").as("month"))
      .agg(sum($"dau").as("sum_dau"), count(lit(1)).as("n_days"))
    val mau = ud.groupBy(date_trunc("month", $"day").as("month"))
      .agg(countDistinct($"user_id").as("mau"))
    dau.join(mau, "month")
      .select($"month".cast("date").cast("string").as("month"),
        $"n_days", $"mau",
        expr("sum_dau div n_days").as("avg_dau"),
        expr("((sum_dau div n_days) * 1000000) div mau")
          .as("stickiness_ppm"))
      .orderBy($"month")
  }


  /** POWER-USER CURVE — activity deciles over per-user event counts
    * (value-domain rank folds, no per-row window): each decile's share
    * of total events in ppm. The engagement-concentration Lorenz table
    * (q239's Gini is its scalar summary — over sources; this is the
    * user-grain curve BI actually plots). */
  private val q316PowerUsers: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val per = Tables.events(s, d)
      .groupBy($"user_id").agg(count(lit(1)).as("c"))
    val vals = per.groupBy($"c").agg(count(lit(1)).as("users"))
    val w = Window.orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = vals
      .select($"c", $"users", (sum($"users").over(w) - $"users").as("below"))
      .crossJoin(broadcast(per.agg(count(lit(1)).as("n"),
        sum($"c").as("total_events"))))
      // decile of a user with count c (min-rank convention): all users
      // share their value's decile — deterministic under ties
      .select($"c", $"users",
        least(lit(9L), expr("(below * 10) div n")).as("decile"),
        $"total_events")
    ranked.groupBy($"decile")
      .agg(sum($"users").as("n_users"),
        sum($"c" * $"users").as("events"),
        expr("(sum(c * users) * 1000000) div max(total_events)")
          .as("share_ppm"))
      .orderBy($"decile")
  }


  /** A/B READOUT — two-proportion test sufficient statistics for a
    * deterministic user-parity split on purchase conversion: per arm
    * n, converters, rate ppm; plus the |z|-statistic in milli via the
    * q271 floor(sqrt(double)) convention. The experiment-analysis fold
    * every growth team runs; all counts exact, one (user, converted)
    * aggregate. */
  private val q317AbReadout: Q = (s, d) => {
    import s.implicits._
    val per = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(($"user_id" % 2 === 0).as("arm_a"), $"conv")
    val arms = per.groupBy($"arm_a")
      .agg(count(lit(1)).as("n"), sum($"conv").as("conv"))
      .cache()
    val stats = arms.agg(
        sum(when($"arm_a", $"n")).as("na"),
        sum(when($"arm_a", $"conv")).as("ca"),
        sum(when(!$"arm_a", $"n")).as("nb"),
        sum(when(!$"arm_a", $"conv")).as("cb"))
      .select($"na", $"ca", $"nb", $"cb",
        expr("(ca * 1000000) div na").as("rate_a_ppm"),
        expr("(cb * 1000000) div nb").as("rate_b_ppm"),
        // |z|·1000: |ca·nb − cb·na| / sqrt(p̂(1−p̂)·na·nb·(na+nb)) with
        // p̂ = (ca+cb)/(na+nb), cross-multiplied into one integer
        // numerator and a floor(sqrt(double)) denominator
        expr("""(abs(ca*nb - cb*na) * 1000) div
               nullif(cast(floor(sqrt(
                 cast((ca+cb) as double) * cast((na+nb)-(ca+cb) as double)
                 * cast(na as double) * cast(nb as double)
                 / cast(na+nb as double))) as bigint), 0)""")
          .as("abs_z_milli"))
    stats
  }


  /** DAY-OF-WEEK SEASONALITY PROFILE + residual anomalies — the weekly
    * seasonal decomposition (q217 does hour-of-day): per-DOW mean in
    * integer milli, then the 5 days with the largest |observed −
    * dow-mean| residuals. Two calendar-bounded aggregates and a tiny
    * top-k; no per-row windows. */
  private val q318DowProfile: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek($"day").cast("long")).cache()
    val prof = daily.groupBy($"dow")
      .agg(expr("(sum(cnt) * 1000) div count(1)").as("dow_mean_milli"))
    daily.join(broadcast(prof), "dow")
      .select($"day".cast("string").as("day"), $"dow", $"cnt",
        $"dow_mean_milli",
        abs($"cnt" * 1000L - $"dow_mean_milli").as("abs_resid_milli"))
      .withColumn("rk", row_number().over(
        Window.orderBy($"abs_resid_milli".desc, $"day")))
      .filter($"rk" <= 5)
      .select($"rk", $"day", $"dow", $"cnt", $"dow_mean_milli",
        $"abs_resid_milli")
      .orderBy($"rk")
  }


  /** FRESHNESS AUDIT — per source: newest document id, row count, and
    * staleness vs the global high-water mark measured in id-space ppm
    * (documents carry no timestamps, so recency = id recency — the
    * monotone-ingest convention). The ops table a pipeline's on-call
    * reads first. */
  private val q319Freshness: Q = (s, d) => {
    import s.implicits._
    val per = Tables.documents(s, d)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), max($"doc_id").as("max_id"))
    per.crossJoin(broadcast(per.agg(max($"max_id").as("hwm"))))
      .select($"source", $"n_docs", $"max_id", $"hwm",
        expr("((hwm - max_id) * 1000000) div hwm").as("staleness_ppm"))
      .orderBy($"source")
  }


  /** GROWTH-ACCOUNTING STATE FLOW — per day, every active user is
    * exactly one of new / retained / resurrected, and churned counts
    * users active the PREVIOUS day who vanished: the four-way
    * decomposition (Social Capital's canonical growth accounting)
    * whose identity DAU_t = new + retained + resurrected and
    * churn_t = DAU_{t-1} − retained is checkable line by line. Day
    * grain (the testdata spans one calendar month) so every state
    * actually occurs. One (user, day) distinct, one per-user lag
    * window, one day aggregate; the final lag runs over calendar-
    * bounded day rows, the q154 pattern. */
  private val q320GrowthAccounting: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val um = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    val staged = um
      .withColumn("prev", lag($"day", 1).over(w))
      .withColumn("state",
        when($"prev".isNull, "new")
          .when(datediff($"day", $"prev") === 1, "retained")
          .otherwise("resurrected"))
    val active = staged.groupBy($"day")
      .agg(count(lit(1)).as("dau"),
        sum(when($"state" === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when($"state" === "retained", 1L).otherwise(0L))
          .as("retained"),
        sum(when($"state" === "resurrected", 1L).otherwise(0L))
          .as("resurrected"))
    val wm = Window.orderBy($"day")
    active
      .withColumn("prev_dau", lag($"dau", 1).over(wm))
      .select($"day".cast("string").as("day"),
        $"dau", $"new_users", $"retained", $"resurrected",
        (coalesce($"prev_dau", lit(0L)) - $"retained").as("churned"))
      .orderBy($"day")
  }


  /** QUALITY-GATE WATERFALL — survivor counts through four successive
    * release gates (length ≥ 500 chars, known language, ≥ 100 words,
    * distinct-word ratio ≥ 30%): the attrition table that tells a
    * corpus owner WHICH gate eats their data. One scan computes all
    * stage flags; the waterfall is a single fold with per-stage drop
    * shares in ppm of the original corpus. */
  private val q321GateWaterfall: Q = (s, d) => {
    import s.implicits._
    val flags = Tables.documents(s, d)
      .select($"n_chars", $"lang", TextAnalysis.words($"text").as("ws"))
      .select(($"n_chars" >= 500L).as("g1"),
        $"lang".isin("en", "de", "fr", "es").as("g2"),
        (size($"ws") >= 100).as("g3"),
        (size(array_distinct($"ws")) * 10 >= size($"ws") * 3).as("g4"))
    flags.agg(count(lit(1)).as("n0"),
        sum(when($"g1", 1L).otherwise(0L)).as("n1"),
        sum(when($"g1" && $"g2", 1L).otherwise(0L)).as("n2"),
        sum(when($"g1" && $"g2" && $"g3", 1L).otherwise(0L)).as("n3"),
        sum(when($"g1" && $"g2" && $"g3" && $"g4", 1L).otherwise(0L))
          .as("n4"))
      .select($"n0", $"n1", $"n2", $"n3", $"n4",
        expr("((n0 - n1) * 1000000) div n0").as("drop1_ppm"),
        expr("((n1 - n2) * 1000000) div n0").as("drop2_ppm"),
        expr("((n2 - n3) * 1000000) div n0").as("drop3_ppm"),
        expr("((n3 - n4) * 1000000) div n0").as("drop4_ppm"),
        expr("(n4 * 1000000) div n0").as("survive_ppm"))
  }


  /** BOILERPLATE DETECTION (CCNet/RefinedWeb line-dedup leg): a segment
    * that recurs in ≥ `BoilerplateDfMin` DISTINCT documents of the SAME
    * source is boilerplate (nav bars, footers, license headers), and the
    * cleaner strips every instance — unlike q103's keep-first paragraph
    * dedup, boilerplate keeps NO copy. Output is the per-source audit:
    * how much of the corpus is boilerplate, in exact ppm.
    *
    * 100 TB shape: one explode → one (source, segment-md5) count with
    * map-side partial agg (countDistinct doc_id is exact because the
    * group key already contains the source; the df counter shuffles
    * (source, md5, doc_id) once) → one 20-row fold. No joins back to the
    * corpus: the audit never rebuilds documents, so nothing document-
    * sized crosses the wire twice. */
  private val q322BoilerplateStrip: Q = (s, d) => {
    import s.implicits._
    val k = BoilerplateSegWords
    val segs = Tables.documents(s, d)
      .select($"doc_id", $"source", Dedup.words($"text").as("ws"))
      .filter(size($"ws") > 0)
      .select($"doc_id", $"source", explode(expr(
        s"transform(sequence(0, (size(ws)-1) div $k), " +
          s"i -> array_join(slice(ws, i*$k+1, $k), ' '))")).as("seg"))
    val df = segs.groupBy($"source", md5($"seg").as("h"))
      .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("inst"))
    df.groupBy($"source")
      .agg(sum($"inst").as("n_instances"),
        count(lit(1)).as("n_distinct_segs"),
        sum(when($"df" >= BoilerplateDfMin, 1L).otherwise(0L))
          .as("n_boilerplate_segs"),
        sum(when($"df" >= BoilerplateDfMin, $"inst").otherwise(0L))
          .as("removed_instances"))
      .select($"source", $"n_instances", $"n_distinct_segs",
        $"n_boilerplate_segs", $"removed_instances",
        expr("(removed_instances * 1000000) div n_instances")
          .as("removed_ppm"))
      .orderBy($"source")
  }


  /** SOURCE-DIVERGENCE MATRIX — KL(a ‖ b) between every ordered pair of
    * source unigram distributions, add-one smoothing on the REFERENCE
    * side (p_b(w) = (c_bw+1)/(T_b+V)): the corpus-mixing diagnostic that
    * says which sources are interchangeable and which would shift the
    * token distribution if upweighted. Integer micro-nats via the q137
    * lnMicro quantize-before-subtract rule, so both engines sum the same
    * longs: each in-a term is c_aw·(lnM(c_aw·(T_b+V)) − lnM(T_a·(c_bw+1))).
    *
    * 100 TB shape — NO pair×vocabulary grid: (1) one (source, word)
    * count shuffle; (2) the Σ_{w∈a} c·lnM(c·(T_b+V)) side only depends on
    * b through T_b, so it's the count table × a BROADCAST 20-row totals
    * frame, map-side aggregated; (3) the cross term needs c_bw only where
    * BOTH sources contain w — a word-keyed equi self-join (≤ |sources|²
    * rows per word); (4) the words a has but b lacks collapse in closed
    * form to (T_a − overlap)·lnM(T_a) because c_bw+1 = 1. The grid lives
    * only in the DuckDB oracle, which doesn't have to scale. The total is
    * clamped at 0 (sub-normalized smoothing makes true KL strictly
    * positive; the clamp only guards micro-rounding at near-identical
    * sources, where div-vs-floor would otherwise diverge on −ε). */
  private val q323SourceDivergence: Q = (s, d) => {
    import s.implicits._
    def lnM(c: Column): Column = round(log(c.cast("double")) * 1e6).cast("long")
    val counts = Tables.documents(s, d)
      .select($"source", explode(Dedup.words($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      .cache()
    val totals = counts.groupBy($"source").agg(sum($"c").as("t"))
    val vrow = counts.select($"w").distinct().agg(count(lit(1)).as("v"))
    val tb20 = totals.select($"source".as("sb"), $"t".as("tb"))
      .crossJoin(broadcast(vrow))
    val s1 = counts.join(broadcast(tb20), $"source" =!= $"sb")
      .groupBy($"source".as("sa"), $"sb")
      .agg(sum($"c" * lnM($"c" * ($"tb" + $"v"))).as("s1"))
    val s2 = counts.as("a")
      .join(counts.select($"source".as("sb"), $"w", $"c".as("cb")), Seq("w"))
      .filter($"source" =!= $"sb")
      .join(broadcast(totals.select($"source", $"t".as("ta"))), Seq("source"))
      .groupBy($"source".as("sa"), $"sb")
      .agg(sum($"c" * lnM($"ta" * ($"cb" + 1L))).as("s2"),
        sum($"c").as("overlap_c"))
    s1.join(s2, Seq("sa", "sb"), "left")
      .join(broadcast(totals.select($"source".as("sa"), $"t".as("ta"))), Seq("sa"))
      .join(broadcast(totals.select($"source".as("sb"), $"t".as("tb"))), Seq("sb"))
      .select($"sa", $"sb", $"ta", $"tb",
        coalesce($"overlap_c", lit(0L)).as("overlap_c"),
        ($"s1" - coalesce($"s2", lit(0L))
          - ($"ta" - coalesce($"overlap_c", lit(0L))) * lnM($"ta"))
          .as("num"))
      .select($"sa", $"sb", $"ta", $"tb", $"overlap_c",
        expr("greatest(num, 0L) div ta").as("kl_micro"))
      .orderBy($"sa", $"sb")
  }

  val queries: Map[String, Q] = Map(
    "q322_boilerplate_strip" -> q322BoilerplateStrip,
    "q323_source_divergence" -> q323SourceDivergence,
    "q320_growth_accounting" -> q320GrowthAccounting,
    "q321_gate_waterfall" -> q321GateWaterfall,
    "q313_growth_rates" -> q313GrowthRates,
    "q314_retention_dk" -> q314RetentionDk,
    "q315_stickiness" -> q315Stickiness,
    "q316_power_users" -> q316PowerUsers,
    "q317_ab_readout" -> q317AbReadout,
    "q318_dow_profile" -> q318DowProfile,
    "q319_freshness" -> q319Freshness,
    "q309_lsh_design_curve" -> q309LshDesignCurve,
    "q310_simhash_pr" -> q310SimhashPr,
    "q311_lead_time_sla" -> q311LeadTimeSla,
    "q312_attribution" -> q312Attribution,
    "q305_quota_sample" -> q305QuotaSample,
    "q306_dedup_savings" -> q306DedupSavings,
    "q307_quantile_transform" -> q307QuantileTransform,
    "q308_negative_sampling" -> q308NegativeSampling,
    "q301_corr_matrix" -> q301CorrMatrix,
    "q302_simpson_detector" -> q302SimpsonDetector,
    "q303_time_to_convert" -> q303TimeToConvert,
    "q304_cohort_ltv" -> q304CohortLtv,
    "q297_streaks" -> q297Streaks,
    "q298_sentences" -> q298Sentences,
    "q299_interarrival" -> q299Interarrival,
    "q300_cluster_size_dist" -> q300ClusterSizeDist,
    "q291_leakage_free_split" -> q291LeakageFreeSplit,
    "q292_dedup_threshold_curve" -> q292DedupThresholdCurve,
    "q293_scd2_timetravel" -> q293Scd2Timetravel,
    "q294_period_end_balance" -> q294PeriodEndBalance,
    "q295_hierarchy_shares" -> q295HierarchyShares,
    "q296_bellman_ford" -> q296BellmanFord,
    "q286_kwic" -> q286Kwic,
    "q287_ntile_buckets" -> q287NtileBuckets,
    "q288_theil_between" -> q288TheilBetween,
    "q289_capture_recapture" -> q289CaptureRecapture,
    "q290_time_weighted_avg" -> q290TimeWeightedAvg,
    "q283_psi_drift" -> q283PsiDrift,
    "q284_rank_auc" -> q284RankAuc,
    "q285_hits" -> q285Hits
  )

  lazy val oracle: Map[String, String] = Map(
    // same 4-word segmentation (trailing short segment kept), same
    // within-source md5 df counter, same ppm integer division
    "q322_boilerplate_strip" ->
      s"""WITH t AS (SELECT doc_id, source, $wordsSql AS ws FROM documents),
          g AS (SELECT doc_id, source,
                       md5(array_to_string(
                         ws[i*$BoilerplateSegWords+1 : i*$BoilerplateSegWords+$BoilerplateSegWords],
                         ' ')) AS h
                FROM t, unnest(range(0, (len(ws)-1)//$BoilerplateSegWords + 1)) AS u(i)
                WHERE len(ws) > 0),
          df AS (SELECT source, h,
                        count(DISTINCT doc_id) AS df,
                        count(*) AS inst
                 FROM g GROUP BY source, h)
          SELECT source,
                 CAST(sum(inst) AS BIGINT) AS n_instances,
                 CAST(count(*) AS BIGINT) AS n_distinct_segs,
                 CAST(sum(CASE WHEN df >= $BoilerplateDfMin THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boilerplate_segs,
                 CAST(sum(CASE WHEN df >= $BoilerplateDfMin THEN inst ELSE 0 END) AS BIGINT)
                   AS removed_instances,
                 CAST((sum(CASE WHEN df >= $BoilerplateDfMin THEN inst ELSE 0 END) * 1000000)
                      // sum(inst) AS BIGINT) AS removed_ppm
          FROM df GROUP BY source ORDER BY source""",
    // the pair x vocabulary grid the engine avoids is fine here: same
    // micro-nat lnM quantize-before-subtract rule as q137, same add-one
    // smoothing on the reference side, same closed-form no-overlap term
    "q323_source_divergence" ->
      s"""WITH c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT source, unnest($wordsSql) AS w FROM documents)
                 GROUP BY source, w),
          t AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY source),
          vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM c),
          grid AS (SELECT a.source AS sa, b.source AS sb, a.t AS ta, b.t AS tb
                   FROM t a JOIN t b ON a.source <> b.source),
          terms AS (SELECT g.sa, g.sb, g.ta, g.tb, ca.c AS ca, cb.c AS cb
                    FROM grid g
                    JOIN c ca ON ca.source = g.sa
                    LEFT JOIN c cb ON cb.source = g.sb AND cb.w = ca.w),
          agg AS (SELECT sa, sb, ta, tb,
                    CAST(sum(ca * CAST(round(ln(CAST(ca * (tb + v) AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS s1,
                    CAST(coalesce(sum(CASE WHEN cb IS NOT NULL
                      THEN ca * CAST(round(ln(CAST(ta * (cb + 1) AS DOUBLE)) * 1000000) AS BIGINT) END), 0) AS BIGINT) AS s2,
                    CAST(coalesce(sum(CASE WHEN cb IS NOT NULL THEN ca END), 0) AS BIGINT) AS overlap_c
                  FROM terms CROSS JOIN vv
                  GROUP BY sa, sb, ta, tb)
          SELECT sa, sb, ta, tb, overlap_c,
                 CAST(greatest(s1 - s2
                        - (ta - overlap_c) * CAST(round(ln(CAST(ta AS DOUBLE)) * 1000000) AS BIGINT),
                        0) // ta AS BIGINT) AS kl_micro
          FROM agg ORDER BY sa, sb""",
    // same per-user day lag, same four-way state partition
    "q320_growth_accounting" ->
      """WITH um AS (SELECT DISTINCT user_id,
                  CAST(ts AS DATE) AS day FROM events),
          st AS (SELECT user_id, day,
                   lag(day, 1) OVER (PARTITION BY user_id
                     ORDER BY day) AS prev
                 FROM um),
          cl AS (SELECT day,
                   CASE WHEN prev IS NULL THEN 'new'
                        WHEN datediff('day', prev, day) = 1
                          THEN 'retained'
                        ELSE 'resurrected' END AS state
                 FROM st),
          ac AS (SELECT day, CAST(count(*) AS BIGINT) AS dau,
                   CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END)
                     AS BIGINT) AS new_users,
                   CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0
                     END) AS BIGINT) AS retained,
                   CAST(sum(CASE WHEN state = 'resurrected' THEN 1
                     ELSE 0 END) AS BIGINT) AS resurrected
                 FROM cl GROUP BY 1),
          fin AS (SELECT CAST(day AS VARCHAR) AS day,
                   dau, new_users, retained, resurrected,
                   CAST(coalesce(lag(dau, 1) OVER (ORDER BY day), 0)
                     AS BIGINT) - retained AS churned
                 FROM ac)
          SELECT * FROM fin ORDER BY day""",
    // same four gate flags over the shared words tokenizer
    "q321_gate_waterfall" ->
      s"""WITH f AS (SELECT n_chars >= 500 AS g1,
                  lang IN ('en', 'de', 'fr', 'es') AS g2,
                  len($wordsSql) >= 100 AS g3,
                  len(list_distinct($wordsSql)) * 10
                    >= len($wordsSql) * 3 AS g4
                FROM documents),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
                  CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n1,
                  CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
                  CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n3,
                  CAST(sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1
                    ELSE 0 END) AS BIGINT) AS n4
                FROM f)
          SELECT n0, n1, n2, n3, n4,
                 ((n0 - n1) * 1000000) // n0 AS drop1_ppm,
                 ((n1 - n2) * 1000000) // n0 AS drop2_ppm,
                 ((n2 - n3) * 1000000) // n0 AS drop3_ppm,
                 ((n3 - n4) * 1000000) // n0 AS drop4_ppm,
                 (n4 * 1000000) // n0 AS survive_ppm
          FROM a""",
    // same Monday-start weeks, same signed truncating growth div
    "q313_growth_rates" ->
      """WITH w AS (SELECT date_trunc('week', ts) AS wk,
                  CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
          l AS (SELECT CAST(CAST(wk AS DATE) AS VARCHAR) AS week, cnt,
                  lag(cnt, 1) OVER (ORDER BY wk) AS prev FROM w)
          SELECT week, cnt, prev,
                 ((cnt - prev) * 1000000) // prev AS wow_ppm
          FROM l ORDER BY week""",
    // same first-return fold, same within-k thresholds
    "q314_retention_dk" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events),
          f AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY 1),
          j AS (SELECT f.user_id,
                  CAST(min(datediff('day', d0, day)) AS BIGINT)
                    AS first_return
                FROM f JOIN ud USING (user_id)
                WHERE datediff('day', d0, day) > 0 GROUP BY f.user_id),
          t AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM f),
          a AS (SELECT
                  CAST(sum(CASE WHEN first_return = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d1,
                  CAST(sum(CASE WHEN first_return <= 7 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d7,
                  CAST(sum(CASE WHEN first_return <= 30 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d30
                FROM f LEFT JOIN j USING (user_id))
          SELECT n_users, d1, d7, d30,
                 (d1 * 1000000) // n_users AS d1_ppm,
                 (d7 * 1000000) // n_users AS d7_ppm,
                 (d30 * 1000000) // n_users AS d30_ppm
          FROM a, t""",
    // same two aggregates over the same (day, user) distinct frame
    "q315_stickiness" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                FROM events),
          d AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                FROM ud GROUP BY 1),
          dm AS (SELECT date_trunc('month', day) AS month,
                   CAST(sum(dau) AS BIGINT) AS sum_dau,
                   CAST(count(*) AS BIGINT) AS n_days
                 FROM d GROUP BY 1),
          m AS (SELECT date_trunc('month', day) AS month,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS mau
                FROM ud GROUP BY 1)
          SELECT CAST(CAST(dm.month AS DATE) AS VARCHAR) AS month,
                 n_days, mau, sum_dau // n_days AS avg_dau,
                 ((sum_dau // n_days) * 1000000) // mau AS stickiness_ppm
          FROM dm JOIN m USING (month) ORDER BY month""",
    // same value-domain below-counts, same min-rank decile convention
    "q316_power_users" ->
      """WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1),
          v AS (SELECT c, CAST(count(*) AS BIGINT) AS users
                FROM per GROUP BY 1),
          t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(c) AS BIGINT) AS total_events FROM per),
          r AS (SELECT c, users,
                  CAST(sum(users) OVER (ORDER BY c
                    ROWS UNBOUNDED PRECEDING) - users AS BIGINT) AS below
                FROM v),
          dd AS (SELECT c, users,
                   least(9, (below * 10) // n) AS decile, total_events
                 FROM r, t)
          SELECT decile, CAST(sum(users) AS BIGINT) AS n_users,
                 CAST(sum(c * users) AS BIGINT) AS events,
                 CAST((sum(c * users) * 1000000) // max(total_events)
                   AS BIGINT) AS share_ppm
          FROM dd GROUP BY decile ORDER BY decile""",
    // same per-arm folds, same cross-multiplied z numerator and
    // identically-rounded floor(sqrt(double)) denominator
    "q317_ab_readout" ->
      """WITH per AS (SELECT user_id,
                  CAST(max(CASE WHEN event_type = 'purchase' THEN 1
                    ELSE 0 END) AS BIGINT) AS conv
                FROM events GROUP BY 1),
          arms AS (SELECT user_id % 2 = 0 AS arm_a,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(conv) AS BIGINT) AS conv
                   FROM per GROUP BY 1),
          st AS (SELECT
                   CAST(sum(CASE WHEN arm_a THEN n END) AS BIGINT) AS na,
                   CAST(sum(CASE WHEN arm_a THEN conv END) AS BIGINT)
                     AS ca,
                   CAST(sum(CASE WHEN NOT arm_a THEN n END) AS BIGINT)
                     AS nb,
                   CAST(sum(CASE WHEN NOT arm_a THEN conv END) AS BIGINT)
                     AS cb
                 FROM arms)
          SELECT na, ca, nb, cb,
                 (ca * 1000000) // na AS rate_a_ppm,
                 (cb * 1000000) // nb AS rate_b_ppm,
                 (abs(ca*nb - cb*na) * 1000) //
                   nullif(CAST(floor(sqrt(
                     CAST((ca+cb) AS DOUBLE)
                     * CAST((na+nb)-(ca+cb) AS DOUBLE)
                     * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                     / CAST(na+nb AS DOUBLE))) AS BIGINT), 0)
                   AS abs_z_milli
          FROM st""",
    // dayofweek(+1) aligns DuckDB's 0=Sunday to Spark's 1=Sunday
    "q318_dow_profile" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
          dd AS (SELECT day, cnt,
                   CAST(dayofweek(day) + 1 AS BIGINT) AS dow FROM daily),
          prof AS (SELECT dow, CAST((sum(cnt) * 1000) // count(*)
                     AS BIGINT) AS dow_mean_milli FROM dd GROUP BY 1),
          j AS (SELECT CAST(day AS VARCHAR) AS day, dd.dow, cnt,
                  dow_mean_milli,
                  abs(cnt * 1000 - dow_mean_milli) AS abs_resid_milli
                FROM dd JOIN prof USING (dow)),
          r AS (SELECT *, CAST(row_number() OVER
                  (ORDER BY abs_resid_milli DESC, day) AS INT) AS rk
                FROM j)
          SELECT rk, day, dow, cnt, dow_mean_milli, abs_resid_milli
          FROM r WHERE rk <= 5 ORDER BY rk""",
    // same id-space high-water-mark staleness
    "q319_freshness" ->
      """WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(max(doc_id) AS BIGINT) AS max_id
                FROM documents GROUP BY 1),
          h AS (SELECT CAST(max(max_id) AS BIGINT) AS hwm FROM per)
          SELECT source, n_docs, max_id, hwm,
                 ((hwm - max_id) * 1000000) // hwm AS staleness_ppm
          FROM per, h ORDER BY source""",
    // the identical squaring chains (one multiplication per step, same
    // order) make the doubles bit-equal before micro rounding
    "q309_lsh_design_curve" -> {
      def cfgSql(bands: Int, rows: Int): String = {
        val rs = Map(2 -> 1, 4 -> 2, 8 -> 3)(rows)
        val bs = Map(16 -> 4, 32 -> 5, 64 -> 6)(bands)
        var sql = "SELECT inter, uni, p0 FROM q"
        for (i <- 1 to rs)
          sql = s"SELECT inter, uni, p${i - 1} * p${i - 1} AS p$i FROM ($sql)"
        sql = s"SELECT inter, uni, 1.0 - p$rs AS t0 FROM ($sql)"
        for (i <- 1 to bs)
          sql = s"SELECT inter, uni, t${i - 1} * t${i - 1} AS t$i FROM ($sql)"
        sql = s"""SELECT inter, uni, CAST(round((1.0 - t$bs) * 1000000.0)
                  AS BIGINT) AS p_micro FROM ($sql)"""
        s"""SELECT 'b=$bands,r=$rows' AS config,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN inter*10 > uni*8 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_true,
               CAST(sum(p_micro) AS BIGINT) AS expected_cand_micro,
               CAST(sum(CASE WHEN inter*10 > uni*8 THEN p_micro END)
                 AS BIGINT) //
                 nullif(CAST(sum(CASE WHEN inter*10 > uni*8 THEN 1
                   ELSE 0 END) AS BIGINT), 0) AS expected_recall_micro
            FROM ($sql)"""
      }
      s"""${shingleCte(s"WHERE doc_id < $BruteForceSlice")},
          pr AS (SELECT CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)
                   AS inter,
                   CAST(len(a.sh) + len(b.sh) AS BIGINT) AS ss
                 FROM s a JOIN s b ON a.doc_id < b.doc_id),
          pu AS (SELECT inter, ss - inter AS uni FROM pr WHERE inter > 0),
          q AS (SELECT inter, uni,
                  CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS p0
                FROM pu)
          SELECT * FROM (
          ${cfgSql(32, 4)}
          UNION ALL
          ${cfgSql(16, 8)}
          UNION ALL
          ${cfgSql(64, 2)})
          ORDER BY config"""
    },
    // q44's bit-replayed simhash + exact-Jaccard truth, six radius folds
    "q310_simhash_pr" ->
      s"""${shingleCte(s"WHERE doc_id < $BruteForceSlice")},
          tk AS (SELECT doc_id,
                   list_sort(list_distinct(list_filter(
                     string_split_regex(lower(text), '[^a-z0-9]+'),
                     w -> length(w) > 0))) AS toks
                 FROM documents WHERE doc_id < $BruteForceSlice),
          hh AS (SELECT doc_id,
                   list_transform(toks, w -> CAST('0x' ||
                     substring(md5(w), 1, 15) AS BIGINT)) AS hs
                 FROM tk),
          ff AS (SELECT doc_id,
                   CAST(coalesce(list_sum(
                     [CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1
                        THEN 1 ELSE -1 END FOR h IN hs]) > 0
                        THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
                      FOR j IN range(0, 60)]), 0) AS BIGINT) AS f
                 FROM hh),
          pr AS (SELECT CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)
                   AS inter,
                   CAST(len(a.sh) + len(b.sh) AS BIGINT) AS ss,
                   CAST(bit_count(xor(fa.f, fb.f)) AS BIGINT) AS ham
                 FROM s a JOIN s b ON a.doc_id < b.doc_id
                 JOIN ff fa ON fa.doc_id = a.doc_id
                 JOIN ff fb ON fb.doc_id = b.doc_id),
          pu AS (SELECT inter, ss - inter AS uni, ham FROM pr),
          r AS (SELECT CAST(unnest([0, 1, 2, 3, 8, 16]) AS BIGINT)
                  AS radius)
          SELECT radius,
                 CAST(sum(CASE WHEN ham <= radius THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_cand,
                 CAST(sum(CASE WHEN ham <= radius
                   AND inter*10 > uni*8 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tp,
                 CAST(sum(CASE WHEN inter*10 > uni*8 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_true,
                 (CAST(sum(CASE WHEN ham <= radius AND inter*10 > uni*8
                   THEN 1 ELSE 0 END) AS BIGINT) * 1000000) //
                   nullif(CAST(sum(CASE WHEN ham <= radius THEN 1
                     ELSE 0 END) AS BIGINT), 0) AS precision_ppm,
                 (CAST(sum(CASE WHEN ham <= radius AND inter*10 > uni*8
                   THEN 1 ELSE 0 END) AS BIGINT) * 1000000) //
                   nullif(CAST(sum(CASE WHEN inter*10 > uni*8 THEN 1
                     ELSE 0 END) AS BIGINT), 0) AS recall_ppm
          FROM pu CROSS JOIN r GROUP BY radius ORDER BY radius""",
    // same integer day deltas, same value-domain median/p90 folds
    "q311_lead_time_sla" ->
      """WITH dl AS (SELECT o_orderpriority,
                  CAST(datediff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE)) AS BIGINT) AS dd
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          per AS (SELECT o_orderpriority, dd, CAST(count(*) AS BIGINT)
                    AS c FROM dl GROUP BY 1, 2),
          cum AS (SELECT o_orderpriority, dd,
                    CAST(sum(c) OVER (PARTITION BY o_orderpriority
                      ORDER BY dd ROWS UNBOUNDED PRECEDING) AS BIGINT)
                      AS cum,
                    CAST(sum(c) OVER (PARTITION BY o_orderpriority)
                      AS BIGINT) AS n
                  FROM per),
          med AS (SELECT o_orderpriority, min(dd) AS median_days
                  FROM cum WHERE cum * 2 >= n GROUP BY 1),
          p90 AS (SELECT o_orderpriority, min(dd) AS p90_days
                  FROM cum WHERE cum * 10 >= n * 9 GROUP BY 1),
          ag AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT)
                   AS n_lines,
                   CAST((sum(CASE WHEN dd <= 30 THEN 1 ELSE 0 END)
                     * 1000000) // count(*) AS BIGINT) AS sla30_ppm
                 FROM dl GROUP BY 1)
          SELECT ag.o_orderpriority, n_lines, sla30_ppm, median_days,
                 p90_days
          FROM ag JOIN med USING (o_orderpriority)
          JOIN p90 USING (o_orderpriority)
          ORDER BY o_orderpriority""",
    // same prior-event carry (IGNORE NULLS, 1 PRECEDING), same shares
    "q312_attribution" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                  event_id FROM events),
          tc AS (SELECT user_id, event_type,
                  last_value(CASE WHEN event_type <> 'purchase'
                    THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS touch
                FROM ev),
          p AS (SELECT coalesce(touch, 'none') AS touch FROM tc
                WHERE event_type = 'purchase'),
          t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM p)
          SELECT touch, CAST(count(*) AS BIGINT) AS n_purchases,
                 (CAST(count(*) AS BIGINT) * 1000000) // nn AS share_ppm
          FROM p, t GROUP BY touch, nn ORDER BY touch""",
    // q264's quota CTEs + the same seeded within-stratum rank pick
    "q305_quota_sample" ->
      s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt
                FROM documents GROUP BY source),
          t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
          q AS (SELECT source, cnt,
                  (cnt * $HoldoutQuota) // total AS floor_q,
                  (cnt * $HoldoutQuota) % total AS rem
                FROM c, t),
          lo AS (SELECT $HoldoutQuota - CAST(sum(floor_q) AS BIGINT)
                   AS leftover FROM q),
          r AS (SELECT *, CAST(row_number() OVER
                  (ORDER BY rem DESC, source) AS BIGINT) AS rrank FROM q),
          quo AS (SELECT source, cnt,
                    floor_q + CASE WHEN rrank <= (SELECT leftover FROM lo)
                      THEN 1 ELSE 0 END AS quota
                  FROM r),
          rk AS (SELECT source, doc_id,
                   CAST(row_number() OVER (PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR) || ':qs'),
                       doc_id) AS BIGINT) AS rk
                 FROM documents),
          sel AS (SELECT rk.source FROM rk JOIN quo USING (source)
                  WHERE rk.rk <= quo.quota),
          tp AS (SELECT CAST(count(*) AS BIGINT) AS total_picked FROM sel),
          g AS (SELECT source, CAST(count(*) AS BIGINT) AS picked
                FROM sel GROUP BY source)
          SELECT quo.source, quo.cnt, CAST(quo.quota AS BIGINT) AS quota,
                 g.picked, (SELECT total_picked FROM tp) AS total_picked
          FROM g JOIN quo USING (source) ORDER BY quo.source""",
    // q86's closure + the shared words tokenizer on both sides
    "q306_dedup_savings" ->
      s"""${shingleCte(s"WHERE doc_id < $BruteForceSlice")
             .replaceFirst("WITH", "WITH RECURSIVE")},
          p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                    / len(list_distinct(a.sh || b.sh)) > 0.5),
          eg AS (SELECT doc_a AS src, doc_b AS dst FROM p
                UNION SELECT doc_b, doc_a FROM p),
          nn AS (SELECT DISTINCT src AS node FROM eg),
          reach(node, label) AS (
            SELECT node, node FROM nn
            UNION
            SELECT eg.dst, r.label FROM reach r JOIN eg ON eg.src = r.node),
          cc AS (SELECT node, min(label) AS component
                 FROM reach GROUP BY node),
          u AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS toks
                FROM documents WHERE doc_id < $BruteForceSlice),
          comp AS (SELECT u.doc_id, u.toks,
                     coalesce(cc.component, u.doc_id) AS component
                   FROM u LEFT JOIN cc ON u.doc_id = cc.node),
          k AS (SELECT *, doc_id = component AS keep FROM comp)
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keep,
                 CAST(sum(toks) AS BIGINT) AS total_tokens,
                 CAST(sum(CASE WHEN keep THEN toks ELSE 0 END) AS BIGINT)
                   AS kept_tokens,
                 CAST(((sum(toks) - sum(CASE WHEN keep THEN toks ELSE 0 END))
                   * 1000000) // sum(toks) AS BIGINT) AS savings_ppm
          FROM k""",
    // same value-domain rank folds, same percent_rank identity
    "q307_quantile_transform" ->
      """WITH per AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS c
                FROM documents GROUP BY 1),
          r AS (SELECT n_chars,
                  CAST(sum(c) OVER (ORDER BY n_chars
                    ROWS UNBOUNDED PRECEDING) - c + 1 AS BIGINT)
                    AS rank_min
                FROM per),
          t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM per)
          SELECT d.doc_id, d.n_chars,
                 ((rank_min - 1) * 1000000) // (n - 1) AS pct_ppm
          FROM documents d JOIN r USING (n_chars), t
          WHERE d.doc_id < 1000 ORDER BY d.doc_id""",
    // same seeded ring positions, same measured cross-source contract
    "q308_negative_sampling" ->
      """WITH docs AS (SELECT doc_id, source FROM documents),
          mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS maxid FROM docs),
          req AS (SELECT d.doc_id AS anchor, d.source AS a_src, j.j,
                    CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)
                      || ':' || CAST(j.j AS VARCHAR) || ':ns'), 1, 13)
                      AS BIGINT) % (maxid + 1) AS BIGINT) AS cand_id
                  FROM docs d
                  CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
                  CROSS JOIN mx
                  WHERE d.doc_id < 200),
          jo AS (SELECT req.anchor, req.a_src, c.source AS c_src
                 FROM req JOIN docs c ON req.cand_id = c.doc_id),
          dr AS (SELECT CAST((sum(CASE WHEN a_src <> c_src THEN 0 ELSE 1 END)
                   * 1000000) // count(*) AS BIGINT) AS drop_ppm FROM jo)
          SELECT anchor, CAST(count(*) AS BIGINT) AS n_candidates,
                 CAST(sum(CASE WHEN a_src <> c_src THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_negatives,
                 (SELECT drop_ppm FROM dr) AS drop_ppm
          FROM jo GROUP BY anchor ORDER BY anchor""",
    // same cents/centi quantization, same one-scan sufficient stats,
    // same ×1000-vs-den÷1000 overflow-safe ratio
    "q301_corr_matrix" -> {
      def branch(tag: String, sx: String, sy: String, sxy: String,
                 sxx: String, syy: String) =
        s"""SELECT '$tag' AS pair, n,
               n*$sxy - $sx*$sy AS cov_n,
               ((n*$sxy - $sx*$sy) * 1000) //
                 nullif(CAST(floor(sqrt(CAST(n*$sxx - $sx*$sx AS DOUBLE)
                   * CAST(n*$syy - $sy*$sy AS DOUBLE))) AS BIGINT) // 1000,
                   0) AS r_ppm
            FROM ag"""
      s"""WITH base AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                  CAST(round(l_discount * 100) AS BIGINT) AS dd,
                  CAST(round(l_tax * 100) AS BIGINT) AS t
                FROM lineitem),
          ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(q) AS BIGINT) AS sq,
                   CAST(sum(dd) AS BIGINT) AS sd,
                   CAST(sum(t) AS BIGINT) AS st,
                   CAST(sum(q*q) AS BIGINT) AS sqq,
                   CAST(sum(q*dd) AS BIGINT) AS sqd,
                   CAST(sum(q*t) AS BIGINT) AS sqt,
                   CAST(sum(dd*t) AS BIGINT) AS sdt,
                   CAST(sum(dd*dd) AS BIGINT) AS sdd,
                   CAST(sum(t*t) AS BIGINT) AS stt
                 FROM base)
          SELECT * FROM (
          ${branch("quantity~discount", "sq", "sd", "sqd", "sqq", "sdd")}
          UNION ALL
          ${branch("quantity~tax", "sq", "st", "sqt", "sqq", "stt")}
          UNION ALL
          ${branch("discount~tax", "sd", "st", "sdt", "sdd", "stt")})
          ORDER BY pair"""
    },
    // sign-only comparison: no division anywhere
    "q302_simpson_detector" ->
      """WITH base AS (SELECT o_orderstatus,
                  CAST(datediff('day', DATE '2020-01-01', o_orderdate)
                    AS BIGINT) AS x,
                  CAST(round(o_totalprice / 1000) AS BIGINT) AS y
                FROM orders),
          ov AS (SELECT CAST(sign(CAST(count(*) AS BIGINT)*sum(x*y)
                   - sum(x)*sum(y)) AS BIGINT) AS overall_sign FROM base),
          g AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                  CAST(sign(CAST(count(*) AS BIGINT)*sum(x*y)
                    - sum(x)*sum(y)) AS BIGINT) AS group_sign
                FROM base GROUP BY 1)
          SELECT o_orderstatus, n, group_sign, overall_sign,
                 group_sign <> 0 AND overall_sign <> 0
                   AND group_sign <> overall_sign AS contradicts
          FROM g CROSS JOIN ov ORDER BY o_orderstatus""",
    // same first-signup→first-purchase deltas, same value-domain median
    "q303_time_to_convert" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
                FROM events),
          su AS (SELECT user_id, CAST(min(us) AS BIGINT) AS s_us
                 FROM ev WHERE event_type = 'signup' GROUP BY 1),
          dl AS (SELECT su.user_id,
                   (CAST(min(ev.us) AS BIGINT) - s_us) // 1000000
                     AS delta_s
                 FROM su JOIN ev ON ev.user_id = su.user_id
                   AND ev.event_type = 'purchase' AND ev.us >= su.s_us
                 GROUP BY su.user_id, su.s_us),
          per AS (SELECT delta_s, CAST(count(*) AS BIGINT) AS c
                  FROM dl GROUP BY 1),
          t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM dl),
          med AS (SELECT min(delta_s) AS median_s
                  FROM (SELECT delta_s,
                          CAST(sum(c) OVER (ORDER BY delta_s
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                        FROM per), t
                  WHERE cum * 2 >= nn)
          SELECT CAST(count(*) AS BIGINT) AS n_converted,
                 CAST(sum(delta_s) AS BIGINT) // CAST(count(*) AS BIGINT)
                   AS mean_s,
                 CAST(min(delta_s) AS BIGINT) AS min_s,
                 CAST(max(delta_s) AS BIGINT) AS max_s,
                 (SELECT median_s FROM med) AS median_s
          FROM dl""",
    // same cents, same bounded month indices, same running window
    "q304_cohort_ltv" ->
      """WITH co AS (SELECT user_id,
                  date_trunc('month', min(ts)) AS cohort_month
                FROM events WHERE event_type = 'signup' GROUP BY 1),
          pu AS (SELECT user_id, date_trunc('month', ts) AS p_month,
                  CAST(round(value * 100) AS BIGINT) AS cents
                FROM events WHERE event_type = 'purchase'),
          cells AS (SELECT co.cohort_month,
                      CAST(datediff('month', co.cohort_month, pu.p_month)
                        AS BIGINT) AS m_idx,
                      CAST(sum(pu.cents) AS BIGINT) AS cents,
                      CAST(count(DISTINCT pu.user_id) AS BIGINT) AS buyers
                    FROM pu JOIN co USING (user_id)
                    WHERE datediff('month', co.cohort_month, pu.p_month)
                      BETWEEN 0 AND 3
                    GROUP BY 1, 2),
          sz AS (SELECT cohort_month, CAST(count(*) AS BIGINT)
                   AS cohort_size FROM co GROUP BY 1),
          w AS (SELECT CAST(CAST(cells.cohort_month AS DATE) AS VARCHAR)
                    AS cohort_month,
                  m_idx, buyers, cohort_size,
                  CAST(sum(cents) OVER (PARTITION BY cells.cohort_month
                    ORDER BY m_idx ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    AS cum_cents
                FROM cells JOIN sz USING (cohort_month))
          SELECT *, cum_cents // cohort_size AS ltv_cents_per_user
          FROM w ORDER BY cohort_month, m_idx""",
    // same day − row_number island key, same streak tiebreaks
    "q297_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events),
          isl AS (SELECT user_id, day,
                    day - CAST(row_number() OVER (PARTITION BY user_id
                      ORDER BY day) AS INT) AS island
                  FROM ud),
          st AS (SELECT user_id,
                   CAST(min(day) AS VARCHAR) AS start_day,
                   CAST(count(*) AS BIGINT) AS streak_len
                 FROM isl GROUP BY user_id, island),
          r AS (SELECT *, CAST(row_number() OVER (ORDER BY streak_len DESC,
                  user_id, start_day) AS INT) AS rk FROM st)
          SELECT rk, user_id, start_day, streak_len
          FROM r WHERE rk <= 20 ORDER BY rk""",
    // same character-class splitter (Java and RE2 agree), same folds
    "q298_sentences" ->
      """WITH sp AS (SELECT source,
                  list_filter(regexp_split_to_array(text, '[.!?]+\s*'),
                    x -> length(x) > 0) AS sents
                FROM documents),
          per AS (SELECT source,
                  CAST(len(sents) AS BIGINT) AS ns,
                  CAST(list_sum(list_transform(sents, x -> length(x)))
                    AS BIGINT) AS chars,
                  CAST(list_max(list_transform(sents, x -> length(x)))
                    AS BIGINT) AS mx
                FROM sp)
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(ns) AS BIGINT) AS n_sentences,
                 CAST((sum(chars) * 1000) // sum(ns) AS BIGINT)
                   AS mean_sent_len_milli,
                 CAST(max(mx) AS BIGINT) AS max_sent_len
          FROM per GROUP BY source ORDER BY source""",
    // same microsecond gaps, same value-domain median fold
    "q299_interarrival" ->
      """WITH g AS (SELECT event_type,
                  epoch_us(ts) - lag(epoch_us(ts), 1) OVER
                    (PARTITION BY event_type ORDER BY ts, event_id) AS gap
                FROM events),
          gaps AS (SELECT event_type, CAST(gap AS BIGINT) AS gap FROM g
                   WHERE gap IS NOT NULL),
          per AS (SELECT event_type, gap, CAST(count(*) AS BIGINT) AS c
                  FROM gaps GROUP BY 1, 2),
          cum AS (SELECT event_type, gap,
                    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY gap
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
                      AS n
                  FROM per),
          med AS (SELECT event_type, min(gap) AS median_gap_us
                  FROM cum WHERE cum * 2 >= n GROUP BY 1),
          ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(gap) AS BIGINT) // CAST(count(*) AS BIGINT)
                     AS mean_gap_us,
                   CAST(min(gap) AS BIGINT) AS min_gap_us,
                   CAST(max(gap) AS BIGINT) AS max_gap_us
                 FROM gaps GROUP BY 1)
          SELECT ag.event_type, n_gaps, mean_gap_us, min_gap_us,
                 max_gap_us, median_gap_us
          FROM ag JOIN med USING (event_type) ORDER BY event_type""",
    // q86's closure + singleton coalesce, bucketed 1..4 and 5+
    "q300_cluster_size_dist" ->
      s"""${shingleCte(s"WHERE doc_id < $BruteForceSlice")
             .replaceFirst("WITH", "WITH RECURSIVE")},
          p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                    / len(list_distinct(a.sh || b.sh)) > 0.5),
          eg AS (SELECT doc_a AS src, doc_b AS dst FROM p
                UNION SELECT doc_b, doc_a FROM p),
          nn AS (SELECT DISTINCT src AS node FROM eg),
          reach(node, label) AS (
            SELECT node, node FROM nn
            UNION
            SELECT eg.dst, r.label FROM reach r JOIN eg ON eg.src = r.node),
          cc AS (SELECT node, min(label) AS component
                 FROM reach GROUP BY node),
          u AS (SELECT doc_id FROM documents
                WHERE doc_id < $BruteForceSlice),
          comp AS (SELECT u.doc_id,
                     coalesce(cc.component, u.doc_id) AS component
                   FROM u LEFT JOIN cc ON u.doc_id = cc.node),
          sz AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
                 FROM comp GROUP BY 1)
          SELECT least(sz, 5) AS cluster_size,
                 CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(sum(sz) AS BIGINT) AS n_docs
          FROM sz GROUP BY 1 ORDER BY 1""",
    // q86's recursive closure + singleton coalesce + same seeded
    // component hash; the leak column is the measured guarantee
    "q291_leakage_free_split" ->
      s"""${shingleCte(s"WHERE doc_id < $BruteForceSlice")
             .replaceFirst("WITH", "WITH RECURSIVE")},
          p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                    / len(list_distinct(a.sh || b.sh)) > 0.5),
          eg AS (SELECT doc_a AS src, doc_b AS dst FROM p
                UNION SELECT doc_b, doc_a FROM p),
          nn AS (SELECT DISTINCT src AS node FROM eg),
          reach(node, label) AS (
            SELECT node, node FROM nn
            UNION
            SELECT eg.dst, r.label FROM reach r JOIN eg ON eg.src = r.node),
          cc AS (SELECT node, min(label) AS component
                 FROM reach GROUP BY node),
          u AS (SELECT doc_id FROM documents
                WHERE doc_id < $BruteForceSlice),
          comp AS (SELECT u.doc_id,
                     coalesce(cc.component, u.doc_id) AS component
                   FROM u LEFT JOIN cc ON u.doc_id = cc.node),
          sp AS (SELECT doc_id, component,
                   CASE WHEN (CAST(CAST('0x' || substring(md5(
                     CAST(component AS VARCHAR) || ':split'), 1, 13)
                     AS BIGINT) AS DOUBLE) + 1) / 4503599627370496.0 < 0.2
                     THEN 'test' ELSE 'train' END AS split
                 FROM comp),
          leak AS (SELECT CAST(coalesce(sum(CASE WHEN sa.split <> sb.split
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS cross_split_pairs
                   FROM p JOIN sp sa ON p.doc_a = sa.doc_id
                   JOIN sp sb ON p.doc_b = sb.doc_id)
          SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(DISTINCT component) AS BIGINT) AS n_components,
                 (SELECT cross_split_pairs FROM leak) AS cross_split_pairs
          FROM sp GROUP BY split ORDER BY split""",
    // same bounded pair slice, same cross-multiplied thresholds
    "q292_dedup_threshold_curve" ->
      s"""${shingleCte(s"WHERE doc_id < $BruteForceSlice")},
          pr AS (SELECT CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)
                   AS inter,
                   CAST(len(a.sh) + len(b.sh) AS BIGINT) AS ss
                 FROM s a JOIN s b ON a.doc_id < b.doc_id),
          pu AS (SELECT inter, ss - inter AS uni FROM pr WHERE inter > 0),
          th AS (SELECT CAST(unnest([50, 60, 70, 80, 90]) AS BIGINT)
                   AS t_pct)
          SELECT t_pct,
                 CAST(sum(CASE WHEN inter * 100 >= t_pct * uni
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
          FROM pu CROSS JOIN th GROUP BY t_pct ORDER BY t_pct""",
    // same SCD2 history, same canonical PIT predicate
    "q293_scd2_timetravel" ->
      """WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
          batch AS (SELECT c_custkey, 'MACHINERY' AS new_segment
                    FROM base WHERE c_custkey % 7 = 0
                      AND c_mktsegment <> 'MACHINERY'),
          fl AS (SELECT base.c_custkey, base.c_mktsegment,
                   batch.new_segment
                 FROM base LEFT JOIN batch USING (c_custkey)),
          hist AS (SELECT c_custkey, c_mktsegment AS segment,
                     DATE '2024-01-01' AS valid_from,
                     CASE WHEN new_segment IS NOT NULL
                       THEN DATE '2024-07-01' END AS valid_to
                   FROM fl
                   UNION ALL
                   SELECT c_custkey, new_segment, DATE '2024-07-01', NULL
                   FROM fl WHERE new_segment IS NOT NULL),
          asofs AS (SELECT unnest([DATE '2024-03-15', DATE '2024-09-01'])
                      AS as_of)
          SELECT CAST(as_of AS VARCHAR) AS as_of, segment,
                 CAST(count(*) AS BIGINT) AS n_customers
          FROM hist CROSS JOIN asofs
          WHERE valid_from <= as_of
            AND (valid_to IS NULL OR as_of < valid_to)
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // same cents quantization, same per-user month window
    "q294_period_end_balance" ->
      """WITH m AS (SELECT user_id,
                  CAST(CAST(date_trunc('month', ts) AS DATE) AS VARCHAR)
                    AS month,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS delta_cents
                FROM events WHERE user_id < 50 GROUP BY 1, 2)
          SELECT user_id, month, delta_cents,
                 CAST(sum(delta_cents) OVER (PARTITION BY user_id
                   ORDER BY month ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS closing_cents
          FROM m ORDER BY user_id, month""",
    // same parent totals, same ppm shares
    "q295_hierarchy_shares" ->
      """WITH pn AS (SELECT n_name, n_regionkey,
                  CAST(count(*) AS BIGINT) AS n_cust
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                GROUP BY 1, 2),
          pr AS (SELECT n_regionkey, CAST(sum(n_cust) AS BIGINT)
                   AS region_cust FROM pn GROUP BY 1),
          t AS (SELECT CAST(sum(n_cust) AS BIGINT) AS total_cust FROM pn)
          SELECT r_name, n_name, n_cust, region_cust,
                 (n_cust * 1000000) // region_cust AS share_of_region_ppm,
                 (n_cust * 1000000) // total_cust AS share_of_total_ppm
          FROM pn JOIN pr USING (n_regionkey)
          JOIN region ON pn.n_regionkey = r_regionkey
          CROSS JOIN t
          ORDER BY r_name, n_name""",
    // identical three unrolled min-plus relaxations
    "q296_bellman_ford" ->
      """WITH pc AS (SELECT o_custkey AS c, l_suppkey AS sp,
                  CAST(min(round(l_extendedprice * 100)) AS BIGINT) AS w
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                GROUP BY 1, 2),
          e AS (SELECT c*2 AS src, sp*2+1 AS dst, w FROM pc
                UNION ALL SELECT sp*2+1, c*2, w FROM pc),
          n AS (SELECT DISTINCT src AS node FROM e),
          s0 AS (SELECT CAST(min(src) AS BIGINT) AS s0 FROM e
                 WHERE src % 2 = 0),
          d0 AS (SELECT node, CASE WHEN node = (SELECT s0 FROM s0)
                   THEN CAST(0 AS BIGINT)
                   ELSE CAST(1000000000000000 AS BIGINT) END AS dist
                 FROM n),
          r1 AS (SELECT e.dst, CAST(min(d.dist + e.w) AS BIGINT) AS best
                 FROM e JOIN d0 d ON e.src = d.node
                 WHERE d.dist < 1000000000000000 GROUP BY 1),
          d1 AS (SELECT d0.node,
                   least(d0.dist, coalesce(r1.best, 1000000000000000))
                     AS dist
                 FROM d0 LEFT JOIN r1 ON d0.node = r1.dst),
          r2 AS (SELECT e.dst, CAST(min(d.dist + e.w) AS BIGINT) AS best
                 FROM e JOIN d1 d ON e.src = d.node
                 WHERE d.dist < 1000000000000000 GROUP BY 1),
          d2 AS (SELECT d1.node,
                   least(d1.dist, coalesce(r2.best, 1000000000000000))
                     AS dist
                 FROM d1 LEFT JOIN r2 ON d1.node = r2.dst),
          r3 AS (SELECT e.dst, CAST(min(d.dist + e.w) AS BIGINT) AS best
                 FROM e JOIN d2 d ON e.src = d.node
                 WHERE d.dist < 1000000000000000 GROUP BY 1),
          d3 AS (SELECT d2.node,
                   least(d2.dist, coalesce(r3.best, 1000000000000000))
                     AS dist
                 FROM d2 LEFT JOIN r3 ON d2.node = r3.dst),
          f AS (SELECT (node - 1) // 2 AS suppkey, dist AS cents,
                  CAST(row_number() OVER (ORDER BY dist, node) AS INT)
                    AS rk
                FROM d3
                WHERE node % 2 = 1 AND dist < 1000000000000000)
          SELECT rk, suppkey, cents FROM f WHERE rk <= 30 ORDER BY rk""",
    // same ±3 window, 1-based list slicing mirrors 0-based posexplode
    "q286_kwic" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                FROM documents),
          o AS (SELECT doc_id, ws,
                  CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos,
                  unnest(ws) AS w
                FROM t)
          SELECT doc_id, pos,
                 coalesce(array_to_string(ws[CAST(greatest(pos-3, 0)+1 AS INT) :
                   CAST(pos AS INT)], ' '), '') AS left_ctx,
                 coalesce(array_to_string(ws[CAST(pos+2 AS INT) :
                   CAST(pos+4 AS INT)], ' '), '') AS right_ctx
          FROM o WHERE w = 'spark' ORDER BY doc_id, pos""",
    // same (price, orderkey) tile order, same explicit bucket floor
    "q287_ntile_buckets" ->
      """WITH b AS (SELECT o_orderstatus,
                  ntile(4) OVER (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice, o_orderkey) AS quartile,
                  least(10, 1 + CAST(floor(o_totalprice / 50000.0)
                    AS BIGINT)) AS bucket
                FROM orders)
          SELECT o_orderstatus, CAST(quartile AS INT) AS quartile, bucket,
                 CAST(count(*) AS BIGINT) AS n
          FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // same ppm shares, same per-term micro-nat quantization
    "q288_theil_between" ->
      """WITH per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS xs,
                  CAST(count(*) AS BIGINT) AS ns
                FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(xs) AS BIGINT) AS xx,
                  CAST(sum(ns) AS BIGINT) AS nn FROM per),
          terms AS (SELECT source, xs, ns,
                  (xs * 1000000) // xx AS share_ppm,
                  CAST(round(ln(CAST(xs AS DOUBLE) * CAST(nn AS DOUBLE))
                    * 1000000.0) AS BIGINT)
                  - CAST(round(ln(CAST(xx AS DOUBLE) * CAST(ns AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS lr_micro
                FROM per, t),
          t2 AS (SELECT *, share_ppm * lr_micro AS term_pico FROM terms)
          SELECT source, xs, ns, share_ppm, term_pico,
                 (SELECT CAST(sum(term_pico) AS BIGINT) FROM t2)
                   AS theil_pico
          FROM t2 ORDER BY source""",
    // same seeded dyadic samples, same Chapman fold
    "q289_capture_recapture" ->
      """WITH f AS (SELECT
                  CASE WHEN (CAST(CAST('0x' || substring(md5(
                    CAST(doc_id AS VARCHAR) || ':cr1'), 1, 13) AS BIGINT)
                    AS DOUBLE) + 1) / 4503599627370496.0 < 0.3
                    THEN 1 ELSE 0 END AS s1,
                  CASE WHEN (CAST(CAST('0x' || substring(md5(
                    CAST(doc_id AS VARCHAR) || ':cr2'), 1, 13) AS BIGINT)
                    AS DOUBLE) + 1) / 4503599627370496.0 < 0.3
                    THEN 1 ELSE 0 END AS s2
                FROM documents),
          ag AS (SELECT CAST(count(*) AS BIGINT) AS true_n,
                   CAST(sum(s1) AS BIGINT) AS n1,
                   CAST(sum(s2) AS BIGINT) AS n2,
                   CAST(sum(s1 * s2) AS BIGINT) AS m FROM f)
          SELECT true_n, n1, n2, m,
                 ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS n_hat,
                 ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 - true_n AS err
          FROM ag""",
    // same trapezoid fold over the gappy hourly series
    "q290_time_weighted_avg" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS hr,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM events WHERE event_type = 'purchase' GROUP BY 1),
          l AS (SELECT hr, cnt,
                  lead(cnt, 1) OVER (ORDER BY hr) AS nv,
                  (epoch(lead(hr, 1) OVER (ORDER BY hr))::BIGINT
                    - epoch(hr)::BIGINT) // 3600 AS dt
                FROM hourly),
          ag AS (SELECT CAST(count(*) AS BIGINT) AS n_samples,
                   CAST(sum(cnt) AS BIGINT) AS sum_v,
                   CAST(sum(CASE WHEN nv IS NOT NULL
                     THEN (cnt + nv) * dt END) AS BIGINT) AS trap2,
                   CAST(sum(CASE WHEN nv IS NOT NULL THEN dt END)
                     AS BIGINT) AS t_hours
                 FROM l)
          SELECT n_samples, t_hours,
                 (trap2 * 1000) // (2 * t_hours) AS twa_milli,
                 (sum_v * 1000) // n_samples AS naive_mean_milli
          FROM ag""",
    // same fixed bins, same ppm proportions, same per-term micro-nat
    // quantization before the product
    "q283_psi_drift" -> {
      val edges = PsiBinEdges
      val binSql = edges.zipWithIndex.foldRight(s"${edges.size}") {
        case ((e, i), acc) => s"CASE WHEN n_chars < $e THEN $i ELSE $acc END"
      }
      s"""WITH b AS (SELECT CAST($binSql AS BIGINT) AS bin,
                  doc_id % 2 = 0 AS in_a FROM documents),
          per AS (SELECT bin,
                  CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
                    AS ca,
                  CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT)
                    AS cb
                FROM b GROUP BY 1),
          t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                  CAST(sum(cb) AS BIGINT) AS nb FROM per),
          terms AS (SELECT bin, ca, cb,
                  (ca * 1000000) // na AS pa_ppm,
                  (cb * 1000000) // nb AS pb_ppm,
                  CAST(round(ln(CAST((ca + 1) AS DOUBLE)
                      * CAST(nb AS DOUBLE)) * 1000000.0) AS BIGINT)
                    - CAST(round(ln(CAST((cb + 1) AS DOUBLE)
                      * CAST(na AS DOUBLE)) * 1000000.0) AS BIGINT)
                    AS lr_micro
                FROM per, t),
          t2 AS (SELECT *, (pa_ppm - pb_ppm) * lr_micro AS term_pico
                 FROM terms)
          SELECT bin, ca, cb, pa_ppm, pb_ppm, term_pico,
                 (SELECT CAST(sum(term_pico) AS BIGINT) FROM t2) AS psi_pico
          FROM t2 ORDER BY bin"""
    },
    // q276's doubled-midrank machinery folded to the U/(n1 n2) identity
    "q284_rank_auc" ->
      """WITH per AS (SELECT n_chars,
                  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                    AS BIGINT) AS cb
                FROM documents GROUP BY 1),
          c AS (SELECT ca, cb, ca + cb AS cnt,
                  CAST(sum(ca + cb) OVER (ORDER BY n_chars
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM per),
          ag AS (SELECT CAST(sum(ca) AS BIGINT) AS n_pos,
                   CAST(sum(cb) AS BIGINT) AS n_neg,
                   CAST(sum(ca * (2*cum - cnt + 1)) AS BIGINT) AS r1_2x
                 FROM c)
          SELECT n_pos, n_neg,
                 r1_2x - n_pos*(n_pos+1) AS u_2x,
                 ((r1_2x - n_pos*(n_pos+1)) * 1000000)
                   // (2 * n_pos * n_neg) AS auc_ppm
          FROM ag""",
    // identical two unrolled normalize-rounds in integer fixed-point
    "q285_hits" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          ns AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS ns FROM e),
          h0 AS (SELECT DISTINCT src,
                   1000000000 // (SELECT ns FROM ns) AS h FROM e),
          a1r AS (SELECT dst, CAST(sum(h) AS BIGINT) AS ar
                  FROM e JOIN h0 USING (src) GROUP BY dst),
          a1t AS (SELECT CAST(sum(ar) AS BIGINT) AS at FROM a1r),
          a1 AS (SELECT dst, (ar * 1000000000) // (SELECT at FROM a1t)
                   AS a FROM a1r),
          h1r AS (SELECT src, CAST(sum(a) AS BIGINT) AS hr
                  FROM e JOIN a1 USING (dst) GROUP BY src),
          h1t AS (SELECT CAST(sum(hr) AS BIGINT) AS ht FROM h1r),
          h1 AS (SELECT src, (hr * 1000000000) // (SELECT ht FROM h1t)
                   AS h FROM h1r),
          a2r AS (SELECT dst, CAST(sum(h) AS BIGINT) AS ar
                  FROM e JOIN h1 USING (src) GROUP BY dst),
          a2t AS (SELECT CAST(sum(ar) AS BIGINT) AS at FROM a2r),
          a2 AS (SELECT dst, (ar * 1000000000) // (SELECT at FROM a2t)
                   AS a FROM a2r),
          r AS (SELECT dst, a, CAST(row_number() OVER
                  (ORDER BY a DESC, dst) AS INT) AS rk FROM a2)
          SELECT rk, dst AS suppkey, a AS authority_fp
          FROM r WHERE rk <= 20 ORDER BY rk"""
  )
}
