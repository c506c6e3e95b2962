package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Relational operator catalog — SURVEY.md §2 rows P1-P8, J1-J3, A1-A3,
  * O1-O4 re-expressed over the testdata star schema, each with a DuckDB
  * oracle in [[Relational.oracle]].
  *
  * Scale notes (100 TB thinking):
  *  - dims (region/nation/customer-subsets) are always `broadcast()` — no
  *    shuffle of the fact side for semi/inner joins against small universes,
  *    mirroring the reference's 4,116-company universe semi-join
  *    (`load_filings_idx.py:45,48`).
  *  - aggregations are plain `groupBy` → map-side partial agg + single
  *    shuffle on the group keys; no repartition calls that would add one.
  *  - every query's filter/projection sits directly over the parquet scan so
  *    Catalyst pushes predicates + prunes columns into the reader.
  *  - ORDER BY on small (grouped/limited) outputs only; the one full-output
  *    sort (q05) is the determinism price for oracle hashing, not a pattern
  *    to copy at scale.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (SURVEY §2.4; exercises A1-class agg +
    * predicate pushdown + exact decimal arithmetic). */
  private val q01PricingSummary: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-01 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        money(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        money(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))).as("sum_disc_price"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** P1/P2: column projection (pruned down to 2 columns at the scan). */
  private val q02Projection: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d).select($"c_custkey", $"c_mktsegment").orderBy($"c_custkey")
  }

  /** P3: bulk column rename (pandas `df.columns = [...]` analog). */
  private val q03Rename: Q = (s, d) =>
    Tables.nation(s, d).toDF("nation_key", "nation_name", "region_key")
      .orderBy("nation_key")

  /** P5: equality filter (filing_types[keep == 1] analog). */
  private val q04FilterEq: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
      .orderBy($"o_orderkey")
  }

  /** P6/J2: universe filtering as broadcast left-semi join
    * (idx rows whose cik ∈ companies.cik — `load_filings_idx.py:45`). */
  private val q05SemiJoin: Q = (s, d) => {
    import s.implicits._
    val universe = Tables.customer(s, d)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    Tables.orders(s, d)
      .join(broadcast(universe), $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey", $"o_custkey")
      .orderBy($"o_orderkey")
  }

  /** P7/J2: second semi-join universe (filing-type keep-list analog). */
  private val q06SemiJoinType: Q = (s, d) => {
    import s.implicits._
    val keepTypes = Tables.supplier(s, d)
      .filter($"s_nationkey" < 10).select($"s_suppkey")
    Tables.lineitem(s, d)
      .join(broadcast(keepTypes), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n_lines"))
      .orderBy($"l_suppkey")
  }

  /** P8 + F4/O4: null-state work queue — rows with text IS NULL are the
    * remaining work (`monitor_scraper_progress.py:6`); queue recompute is a
    * filter, not a trigger. */
  private val q07NullQueue: Q = (s, d) => {
    import s.implicits._
    val filings = Tables.documents(s, d)
      .withColumn("text", when($"doc_id" % 3 === 0, lit(null)).otherwise($"text"))
    filings.filter($"text".isNull).select($"doc_id").orderBy($"doc_id")
  }

  /** O4: set difference as anti-join (queue = filings ∖ scraped,
    * `load_filings_idx.py:75-93` trigger semantics at batch granularity). */
  private val q08AntiJoin: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** J1: inner equi-join, small side broadcast
    * (`scrape_all_filings.py:128-133`). */
  private val q09InnerJoin: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d).select($"c_custkey", $"c_name")),
        $"o_custkey" === $"c_custkey", "inner")
      .select($"o_orderkey", $"o_custkey", $"c_name")
      .orderBy($"o_orderkey")
  }

  /** J3: analytical star join (README.md:70-87 research-join analog) —
    * revenue per nation through lineitem→orders→customer→nation→region.
    * Fact side shuffles once per join key; dims broadcast. */
  private val q10StarJoin: Q = (s, d) => {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
    val c  = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(money(sum(dec($"l_extendedprice") * (dec(lit(1)) - dec($"l_discount")))).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy($"r_name", $"n_name")
  }

  /** A1: COUNT(*) with predicate (rows left to scrape analog). */
  private val q11CountFiltered: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" > to_timestamp(lit("1997-01-01 00:00:00")))
      .agg(count(lit(1)).as("n"))
  }

  /** A: exact + grouped distinct aggregation. */
  private val q12GroupDistinct: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n_custs"),
           count(lit(1)).as("n_orders"),
           money(sum(dec($"o_totalprice"))).as("sum_price"))
      .orderBy($"o_orderpriority")
  }

  /** O2-adjacent: global top-k (sort + limit with deterministic tiebreak). */
  private val q13TopK: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  /** Window top-k per group (the scale-path for "top matches per query"). */
  private val q14WindowTopK: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
      .orderBy($"o_custkey", $"rk")
  }

  /** O3: cross product (years × quarters grid analog on real tables). */
  private val q15CrossJoin: Q = (s, d) => {
    import s.implicits._
    val statuses = Tables.orders(s, d).select($"o_orderstatus").distinct()
    Tables.region(s, d).select($"r_name").crossJoin(statuses)
      .orderBy($"r_name", $"o_orderstatus")
  }

  /** Set op: UNION (distinct). */
  private val q16Union: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
      .union(Tables.supplier(s, d).select($"s_nationkey".as("nationkey")))
      .distinct()
      .orderBy($"nationkey")
  }

  /** Set op: EXCEPT. */
  private val q17Except: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
      .except(Tables.supplier(s, d).select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")
  }

  /** S11: seeded table sampling (TABLESAMPLE parity). The drawn rows are
    * engine-RNG-specific, so the gate is the q47/q100 MEASURED-CONTRACT
    * pattern: every invariant a correct seeded Bernoulli sample must hold
    * is computed in-query and emitted as an oracle-able column —
    * n_total (deterministic), |n − pN| within 6σ of the binomial,
    * sample ⊆ source (anti-join count 0), same-seed redraw identical
    * (set-equality both ways), no duplicate draws. A wrong sampler — out
    * of range rows, unstable seed, with-replacement duplicates, wildly
    * off size — flips a boolean and fails the hash gate. */
  private val q18Sample: Q = (s, d) => {
    import s.implicits._
    val src = Tables.lineitem(s, d).select($"l_orderkey", $"l_linenumber")
    val p = 0.01
    val s1 = src.sample(withReplacement = false, p, seed = 42L).cache()
    val s2 = src.sample(withReplacement = false, p, seed = 42L)
    val nTotal = src.count()
    val n1 = s1.count()
    val sigma = math.sqrt(nTotal * p * (1 - p))
    val sizeOk = math.abs(n1 - nTotal * p) <= 6.0 * sigma
    val subsetOk =
      s1.join(src, Seq("l_orderkey", "l_linenumber"), "left_anti").count() == 0
    val stableOk = s1.except(s2).count() == 0 && s2.except(s1).count() == 0
    // without-replacement ⇒ each source ROW drawn at most once; the
    // projected pair isn't unique in the synthetic lineitem, so the
    // invariant is per-pair multiplicity: sampled count ≤ source count
    val multOk = s1.groupBy($"l_orderkey", $"l_linenumber")
      .agg(count(lit(1)).as("ns"))
      .join(src.groupBy($"l_orderkey", $"l_linenumber")
        .agg(count(lit(1)).as("n0")), Seq("l_orderkey", "l_linenumber"), "left")
      .filter($"n0".isNull || $"ns" > $"n0").count() == 0
    s.range(1).select(
      lit(nTotal).as("n_total"),
      lit(sizeOk).as("size_within_6sigma"),
      lit(subsetOk).as("subset_of_source"),
      lit(stableOk).as("seed_stable"),
      lit(multOk).as("within_source_multiplicity"))
  }

  /** O1+O3+T9+T11: the (year × quarter) URL grid from
    * `load_filings_idx.py:17-29`, fully declarative. */
  private val q19UrlGrid: Q = (s, d) => {
    import s.implicits._
    val years = s.range(2018, 2021).select($"id".as("year"))
    val qtrs  = s.range(1, 5).select($"id".as("qtr"))
    years.crossJoin(qtrs)
      .select($"year", $"qtr",
        concat(lit("https://www.sec.gov/Archives/edgar/full-index/"),
          $"year", lit("/QTR"), $"qtr", lit("/master.idx")).as("url"))
      .orderBy($"year", $"qtr")
  }

  /** A3-adjacent + streaming-shaped: hourly event rollup (batch form of the
    * monitor's throughput window; streaming twin lives in graft.streaming). */
  private val q20EventsWindow: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), money(sum(dec($"value"))).as("sum_value"))
      .orderBy($"hour", $"event_type")
  }

  /** Event-sequence analytics #1: ORDERED conversion funnel
    * view → click → purchase. A user counts for a stage only if the
    * stage's FIRST qualifying event follows the previous stage's anchor
    * WITHIN 24 hours (each stage anchored at its earliest valid
    * timestamp — the standard product-analytics definition with a
    * conversion window, not a bag-of-types count; on this data the
    * window is what separates the stages, so a bag-of-types or
    * unwindowed implementation fails the gate). Three
    * stage-filtered per-user min-aggs chained by user-keyed joins: every
    * agg is map-side partial on a type-pruned scan, every join is
    * user-keyed on a shrinking stage set — no windows, no per-user event
    * sorting, so one hyperactive user never serializes a task. The tiny
    * per-user stage frames (v, c) are persisted (the q116 persisted-probe
    * pattern): each event type is scanned exactly ONCE — without the
    * cache the chained lineage would re-scan the event table once per
    * downstream reference (6 scans, not 3). Because every stage frame
    * leaves its agg hash-partitioned on user_id, the wide funnel join
    * adds ZERO exchanges (plan-guarded): the only shuffle in the whole
    * query is the final single-row count agg. */
  private val q142Funnel: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    def stage(t: String) = ev.filter($"event_type" === t).select($"user_id", $"ts")
    val v = stage("view").groupBy($"user_id").agg(min($"ts").as("v_ts")).persist()
    val c = stage("click").join(v, Seq("user_id"))
      .filter($"ts" >= $"v_ts" && $"ts" <= $"v_ts" + expr("interval 24 hours"))
      .groupBy($"user_id").agg(min($"ts").as("c_ts")).persist()
    val p = stage("purchase").join(c, Seq("user_id"))
      .filter($"ts" >= $"c_ts" && $"ts" <= $"c_ts" + expr("interval 24 hours"))
      .groupBy($"user_id").agg(min($"ts").as("p_ts"))
    // wide left-join funnel per user, ONE single-row agg, unpivot: later
    // stages are subsets of earlier ones, so count(<stage>_ts) = stage size
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count($"v_ts").as("n_view"), count($"c_ts").as("n_click"),
        count($"p_ts").as("n_purchase"))
      .select(expr(
        """stack(3, '1_view', n_view, '2_click', n_click,
                    '3_purchase', n_purchase) AS (stage, n_users)"""))
      .orderBy($"stage")
  }

  /** Event-sequence analytics #2: weekly cohort retention — users
    * bucketed by their FIRST-ACTIVITY week, then (cohort, week-offset)
    * distinct-user counts: the classic retention triangle. Week math is
    * exact integers (Monday-truncated dates, day-diff / 7) so the matrix
    * hash-matches. One per-user min-agg, a user-keyed fan-back join, one
    * (cohort, offset) distinct-agg — Spark plans countDistinct as two
    * partial-agg shuffles; nothing sorts the event stream. */
  private val q143CohortRetention: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
    val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    ev.join(cohort, Seq("user_id"))
      .select($"user_id", $"cohort_wk",
        (datediff($"wk", $"cohort_wk") / 7).cast("long").as("week_offset"))
      .groupBy($"cohort_wk", $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_wk", $"week_offset")
  }

  /** Event-sequence analytics #3: BATCH gap-based sessionization — the
    * batch twin of q72's streaming sessionize (same 30-minute gap rule,
    * computed over history instead of state). Boundary flags come from a
    * per-user `lag`, session ids from a running sum of flags, sessions
    * from one groupBy — all three window/agg steps share the SAME
    * (user_id) hash partitioning, so the whole query is ONE shuffle plus
    * in-partition sorts; there is no global sort and no per-user collect.
    * Tie-safety: equal timestamps have gap 0 < 30 min, so session
    * boundaries and aggregates are identical under any tie order — the
    * oracle's window order can differ from Spark's without hash drift. */
  private val q151Sessionize: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts")
    val gap = unix_timestamp($"ts") - unix_timestamp(lag($"ts", 1).over(w))
    Tables.events(s, d).select($"user_id", $"ts")
      .withColumn("new_s", when(gap.isNull || gap > 1800, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_idx")
      .agg(min($"ts").as("session_start"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts"))).as("duration_sec"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"session_idx")
  }

  /** Time-RANGE window frames — the 7-day moving revenue average (the one
    * window family q82's ROWS-frame suite doesn't cover): daily totals
    * first (one groupBy shuffle bounded by calendar days, so the window
    * input is tiny at ANY corpus scale), then
    * `RANGE BETWEEN 6 DAYS PRECEDING AND CURRENT ROW` over epoch-day
    * ordering. The unpartitioned window is safe exactly because it runs on
    * the day-grain aggregate, never the fact table. Decimal sums
    * throughout; the moving average is exact integer micro-units divided
    * once as a double (two exactly-representable integers → IEEE-identical
    * on both engines; decimal division rounded differently at sf0.1). */
  private val q154MovingWindow: Q = (s, d) => {
    import s.implicits._
    val daily = Tables.orders(s, d)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(dec(sum(dec($"o_totalprice"))).as("day_rev"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(datediff($"day", lit("1970-01-01").cast("date")))
      .rangeBetween(-6, 0)
    daily
      .withColumn("rev_7d", dec(sum($"day_rev").over(w)))
      .withColumn("n_7d", sum($"n_orders").over(w))
      .select($"day", money($"day_rev").as("day_rev"),
        money($"rev_7d").as("rev_7d"), $"n_7d",
        // exact integer micro-units then ONE double division of two
        // exactly-representable integers — bit-identical on both engines.
        // (The old decimal-division-then-cast path diverged by 1 ulp at
        // the 8th decimal at sf0.1: Spark and DuckDB round the quotient
        // at different intermediate scales.)
        expr("""cast((cast(rev_7d * 100 as bigint) * 1000000) div n_7d
                 as double) / 1000000.0""").as("avg_order_7d"))
      .orderBy($"day")
  }

  /** S10 companion — SCD TYPE-2 dimension maintenance (the warehouse
    * history-keeping merge next to q62's point upsert and q90's COW merge):
    * an update batch (every 7th customer moves to MACHINERY, skipping the
    * ones already there) closes the prior version (valid_to set,
    * is_current=false) and opens a new current version, while untouched
    * customers keep their open row. One broadcast join against the derived
    * batch + a union — the dimension never shuffles; at scale the batch is
    * the small side by construction. */
  private val q155Scd2: Q = (s, d) => {
    import s.implicits._
    val v1 = lit("2024-01-01").cast("date")
    val v2 = lit("2024-07-01").cast("date")
    val base = Tables.customer(s, d)
      .select($"c_custkey", $"c_mktsegment")
    val batch = base
      .filter($"c_custkey" % 7 === 0 && $"c_mktsegment" =!= "MACHINERY")
      .select($"c_custkey", lit("MACHINERY").as("new_segment"))
    val flagged = base.join(broadcast(batch), Seq("c_custkey"), "left")
    val history = flagged.select($"c_custkey", $"c_mktsegment".as("segment"),
      v1.as("valid_from"),
      when($"new_segment".isNotNull, v2).otherwise(lit(null).cast("date")).as("valid_to"),
      $"new_segment".isNull.as("is_current"))
    val opened = flagged.filter($"new_segment".isNotNull)
      .select($"c_custkey", $"new_segment".as("segment"),
        v2.as("valid_from"), lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
    history.unionByName(opened)
      .orderBy($"c_custkey", $"valid_from")
  }

  /** Relational surface — UNPIVOT/melt (q26's inverse): the wide per-status
    * aggregate melts back to (priority, status, n) long form via Spark's
    * native unpivot (no UNION-of-projections blowup; one Generate). The
    * oracle replays with DuckDB UNPIVOT, so both engines' null-dropping
    * semantics must agree. */
  private val q167Unpivot: Q = (s, d) => {
    import s.implicits._
    val wide = Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
    // pivot-count yields NULL for empty (priority, status) combos where
    // the oracle's count FILTER yields 0 — normalize to 0 so the two
    // agree even on data with missing combos
    wide.unpivot(
        Array($"o_orderpriority"),
        Array($"F", $"O", $"P"),
        "status", "n")
      .select($"o_orderpriority", $"status",
        coalesce($"n", lit(0L)).cast("long").as("n"))
      .orderBy($"o_orderpriority", $"status")
  }

  /** Analytics surface — exact equi-width HISTOGRAM: 20 buckets over the
    * price range, boundaries computed in integer CENTS (prices are
    * DECIMAL(18,2)) so bucket assignment is exact on both engines —
    * bucket = (cents − min)·20 / (max − min + 1), integer floor division.
    * One min/max all-reduce broadcasts back; assignment + count is one
    * map-side pass + a 20-group agg. */
  private val q168Histogram: Q = (s, d) => {
    import s.implicits._
    val cents = (dec($"o_totalprice") * lit(100)).cast("long")
    val o = Tables.orders(s, d).select(cents.as("c"))
    val bounds = o.agg(min($"c").as("lo"), max($"c").as("hi"))
    o.crossJoin(broadcast(bounds))
      .select((($"c" - $"lo") * lit(20L) / ($"hi" - $"lo" + lit(1L)))
        .cast("long").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"))
      .orderBy($"bucket")
  }

  /** T10: date parse from string (idx `date` column → DATE,
    * `load_filings_idx.py:57`). */
  private val q21DateParse: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("date_str"))
      .select($"o_orderkey", to_date($"date_str", "yyyy-MM-dd").as("date"))
      .orderBy($"o_orderkey")
  }

  /** Grouping sets: ROLLUP with GROUPING() disambiguators (so NULL group
    * keys and subtotal rows can't be confused). Same single-shuffle plan as
    * a plain groupBy — Spark expands grouping sets map-side. */
  private val q22Rollup: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(
        grouping($"o_orderpriority").cast("long").as("g_prio"),
        grouping($"o_orderstatus").cast("long").as("g_status"),
        count(lit(1)).as("n"),
        money(sum(dec($"o_totalprice"))).as("sum_price"))
      .orderBy($"o_orderpriority", $"o_orderstatus")
  }

  /** Grouping sets: CUBE over the q01 grouping keys. */
  private val q23Cube: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        grouping($"l_returnflag").cast("long").as("g_flag"),
        grouping($"l_linestatus").cast("long").as("g_status"),
        count(lit(1)).as("n"),
        sum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Set op: INTERSECT (distinct semantics, same as SQL). */
  private val q24Intersect: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
      .intersect(Tables.supplier(s, d).select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")
  }

  /** Scalar subquery: rows above the global average, via a broadcast
    * 1-row aggregate instead of a second scan per row. The predicate is
    * price·n > Σprice in EXACT decimal (equivalent to price > avg) so the
    * threshold can't flip on float summation order in either engine. */
  private val q25ScalarSubquery: Q = (s, d) => {
    import s.implicits._
    val totals = Tables.orders(s, d)
      .agg(sum(dec($"o_totalprice")).as("total"), count(lit(1)).as("n_rows"))
    Tables.orders(s, d).crossJoin(broadcast(totals))
      .filter(dec($"o_totalprice") * $"n_rows" > $"total")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** PIVOT: status columns per priority (explicit value list keeps the
    * plan static — no extra distinct-values job at scale). */
  private val q26Pivot: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("F"),
        coalesce($"O", lit(0L)).as("O"),
        coalesce($"P", lit(0L)).as("P"))
      .orderBy($"o_orderpriority")
  }

  /** Range (theta) join: fact rows into literal value bands. The band table
    * is broadcast, so the non-equi condition never triggers a cartesian
    * shuffle — the scalable shape for banding/bucketing joins. */
  private val q27RangeJoin: Q = (s, d) => {
    import s.implicits._
    val bands = Seq(
      ("p900", 900.0, 925.0), ("p925", 925.0, 950.0),
      ("p950", 950.0, 975.0), ("p975", 975.0, 1000.0))
      .toDF("band", "lo", "hi")
    Tables.part(s, d)
      .join(broadcast(bands), $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
      .groupBy($"band")
      .agg(count(lit(1)).as("n_parts"), money(sum(dec($"p_retailprice"))).as("sum_price"))
      .orderBy($"band")
  }

  /** As-of join via [[AsofJoin]] (Spark has no native one): for each error
    * event, the most recent click at-or-before it by the same user. */
  private val q28AsofJoin: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val errors = ev.filter($"event_type" === "error").select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"ts")
    AsofJoin(errors, clicks, keyCol = "user_id", tsCol = "ts")
      .select($"event_id", $"user_id", $"ts".as("error_ts"), $"ts_r".as("click_ts"))
      .orderBy($"event_id")
  }

  /** q28's directional/tolerance twins — FORWARD as-of with a 1-hour
    * tolerance (pandas merge_asof direction='forward', tolerance='1h';
    * the "next event after, if soon enough" staple): for each error, the
    * EARLIEST click at-or-after it within 3600 s, same one-shuffle
    * running-last composition scanning time in reverse. Inner join, so
    * out-of-tolerance matches drop — the oracle's min-over-range replay
    * enforces both the direction flip and the tolerance cut. */
  private val q165AsofForward: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val errors = ev.filter($"event_type" === "error").select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"ts")
    AsofJoin(errors, clicks, keyCol = "user_id", tsCol = "ts",
        direction = "forward", toleranceSec = Some(3600L))
      .select($"event_id", $"user_id", $"ts".as("error_ts"), $"ts_r".as("next_click_ts"))
      .orderBy($"event_id")
  }

  /** Semi-structured payloads: JSON path extraction + typed aggregation
    * over the events `props` column (per-row codegen'd get_json_object). */
  private val q29JsonExtract: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** Entity resolution (the reference README's identifier-QA concern,
    * README.md:79-87): fuzzy identifier matching via edit distance over a
    * bounded slice — the brute-force baseline; at corpus scale the same
    * predicate runs on LSH/blocking candidates instead of all pairs. */
  private val q58FuzzyNames: Q = (s, d) => {
    import s.implicits._
    val slice = Tables.customer(s, d).filter($"c_custkey" < 100)
      .select($"c_custkey", $"c_name").cache()
    val a = slice.toDF("key_a", "name_a")
    val b = slice.toDF("key_b", "name_b")
    a.crossJoin(broadcast(b))
      .filter($"key_a" < $"key_b")
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= 1)
      .select($"key_a", $"key_b", $"dist".cast("long").as("dist"))
      .orderBy($"key_a", $"key_b")
  }

  /** Full outer join (the one outer variant not implied elsewhere in the
    * catalog), null-tolerant aggregation on both sides. */
  private val q59FullOuter: Q = (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d).groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, d).groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
    c.join(p, $"c_nationkey" === $"s_nationkey", "full_outer")
      .select(
        coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
      .orderBy($"nationkey")
  }

  /** Sketch: HLL distinct-count with a VERIFIED accuracy bound — the
    * approx value itself is engine-specific, so the oracle-checked output
    * is the exact count plus the contract "approx within 5% of exact". */
  private val q77ApproxDistinct: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .agg(
        approx_count_distinct($"o_custkey", rsd = 0.01).as("n_approx"),
        countDistinct($"o_custkey").as("n_exact"))
      .select(
        (abs($"n_approx" - $"n_exact").cast("double") / $"n_exact" <= 0.05).as("approx_ok"),
        $"n_exact")
  }

  /** Sketch contract #3 — the MERGEABLE leg q77/q132 imply but don't
    * exercise: Apache DataSketches HLL built once per group
    * (`hll_sketch_agg`), then combined with `hll_union_agg` WITHOUT
    * touching the rows again. That split is the whole 100 TB
    * distinct-count architecture: per-partition/per-day sketches persist
    * as bytes, and any ad-hoc rollup is a union over kilobytes. The
    * sketch bytes and the estimate are engine-specific (like q77's
    * estimate), so the oracle pins the exact distinct count plus the
    * measured union-estimate error contract. */
  private val q140HllUnion: Q = (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val per = o.groupBy($"o_orderpriority").agg(hll_sketch_agg($"o_custkey").as("sk"))
    val merged = per.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
      count(lit(1)).as("n_groups"))
    val exact = o.agg(countDistinct($"o_custkey").as("n_exact"))
    merged.crossJoin(exact)
      .select($"n_groups", $"n_exact",
        (abs($"est" - $"n_exact").cast("double") / $"n_exact" <= 0.05).as("union_ok"))
  }

  /** Z-order bit interleave of two non-negative keys (`bits` each) — the
    * multi-dimensional clustering value behind Delta/Iceberg `OPTIMIZE
    * ZORDER`: range-partitioning files by z keeps rows close in EITHER
    * dimension close in file order, so per-file min/max stats prune scans
    * on either predicate column. Pure integer bit ops: codegen'd, exact,
    * oracle-able. */
  def zOrderValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Data-layout operator: Z-order clustering of orders on
    * (o_custkey, o_orderdate) with the per-bucket min/max pruning stats a
    * file-skipping scan would consult. Buckets are fixed z-ranges
    * (z >> 16 over a 32-bit z-space — ~66 "files" at sf0.01, ~650 at sf0.1); the emitted stats
    * ARE the demonstration — each bucket spans a narrow slice of BOTH
    * dimensions, which single-column sorting cannot do. Map-only z
    * computation + one bucket agg; at scale this is the repartitionByRange
    * write key and the stats land in the format's footer metadata. */
  /** Sketch contract #6 — DURABILITY: q140 proves HLL sketches merge
    * without re-reading rows; this proves they survive the trip through
    * STORAGE, which is the actual incremental architecture (per-shard/day
    * sketch tables persist as parquet BINARY columns; any later rollup
    * unions kilobytes). Per-group sketches write to parquet, a fresh read
    * unions them, and the estimate must satisfy the same 5% contract —
    * a serialization/encoding bug surfaces as a wrong estimate, not a
    * crash. The exact distinct count pins the oracle. */
  private val q156HllPersist: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_q156_hll_") + "/sk"
    val o = Tables.orders(s, d)
    o.groupBy($"o_orderpriority").agg(hll_sketch_agg($"o_custkey").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = s.read.parquet(dir).agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
      count(lit(1)).as("n_groups"))
    val exact = o.agg(countDistinct($"o_custkey").as("n_exact"))
    merged.crossJoin(exact)
      .select($"n_groups", $"n_exact",
        (abs($"est" - $"n_exact").cast("double") / $"n_exact" <= 0.05).as("persisted_union_ok"))
  }

  private val q141ZOrderStats: Q = (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val z = zOrderValue($"o_custkey" % 65536L,
      unix_date($"o_orderdate".cast("date")).cast("long") % 65536L, bits = 16)
    o.select(shiftright(z, 16).as("bucket"), $"o_custkey", $"o_orderdate")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"o_custkey").as("min_cust"), max($"o_custkey").as("max_cust"),
        min($"o_orderdate").as("min_date"), max($"o_orderdate").as("max_date"))
      .orderBy($"bucket")
  }

  /** Exact percentiles per group (continuous interpolation — DuckDB
    * quantile_cont twin); 6dp rounding absorbs the engines' differing but
    * ulp-equivalent interpolation expressions. */
  private val q78Quantiles: Q = (s, d) => {
    import s.implicits._
    def pct(p: Double, name: String) =
      round(expr(s"percentile(o_totalprice, $p)"), 6).as(name)
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(pct(0.25, "p25"), pct(0.5, "p50"), pct(0.75, "p75"))
      .orderBy($"o_orderpriority")
  }

  /** Sketch contract, the quantile sibling of q77's HLL: percentile_approx
    * (the Greenwald-Khanna-style mergeable sketch — the only way to do
    * quantiles in one pass at 100 TB) with a MEASURED rank-error gate.
    * Approx values are engine-specific, so the oracle-checked output is
    * the exact quantile plus "the approx answer's true rank is within the
    * accuracy bound", measured in-query against the full column — the
    * q47/q77/q100 contract pattern. accuracy=1000 ⇒ rank error ≤ n/1000. */
  private val q132ApproxQuantiles: Q = (s, d) => {
    import s.implicits._
    val acc = 1000
    val o = Tables.orders(s, d).select($"o_totalprice".as("x"))
    val st = o.agg(
      expr(s"percentile_approx(x, array(0.25D, 0.5D, 0.75D), $acc)").as("apx"),
      expr("percentile(x, array(0.25D, 0.5D, 0.75D))").as("ext"),
      count(lit(1)).as("n"))
    o.crossJoin(broadcast(st))
      .select($"x", $"n", $"ext", posexplode($"apx").as(Seq("qi", "av")))
      .groupBy($"qi")
      .agg(first($"n").as("n"), first($"ext").as("ext"), first($"av").as("av"),
        sum(when($"x" <= $"av", 1L).otherwise(0L)).as("rank_le"))
      .select($"qi".cast("long").as("qi"),
        round(element_at($"ext", ($"qi" + 1).cast("int")), 6).as("exact"),
        (abs($"rank_le".cast("double") - ($"qi" + 1).cast("double") * 0.25 * $"n") <=
          $"n".cast("double") / acc + 1.0).as("rank_ok"))
      .orderBy($"qi")
  }

  /** SQL surface: correlated LATERAL subquery (top-2 orders per customer) —
    * the SQL twin of the q14 window pattern. */
  private val q81Lateral: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_q81_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_q81_orders")
    s.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         FROM graft_q81_customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM graft_q81_orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
         WHERE c.c_custkey < 100
         ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""")
  }

  /** Window-function suite: lag/lead/rank/dense_rank/ntile/running sum over
    * one pass (per-customer order history). */
  private val q82WindowSuite: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, d)
      .filter($"o_custkey" < 200)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        lag($"o_orderkey", 1).over(w).as("prev_order"),
        lead($"o_orderkey", 1).over(w).as("next_order"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        money(sum(dec($"o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("run_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Datetime-function suite incl. the reference's quarter arithmetic T11
    * (`load_filings_idx.py:18-19`), on a deterministic date column. */
  private val q83DatetimeSuite: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .withColumn("od", $"o_orderdate".cast("date"))
      .select($"o_orderkey",
        year($"od").cast("long").as("y"),
        quarter($"od").cast("long").as("q"),
        month($"od").cast("long").as("m"),
        dayofmonth($"od").cast("long").as("dom"),
        last_day($"od").as("month_end"),
        date_add($"od", 30).as("plus30"),
        datediff($"od", lit("1995-01-01").cast("date")).cast("long").as("days_since"))
      .orderBy($"o_orderkey")
  }

  /** String-function suite (T9 formatting family). */
  private val q84StringSuite: Q = (s, d) => {
    import s.implicits._
    Tables.nation(s, d)
      .select($"n_nationkey",
        concat_ws("-", $"n_name", $"n_regionkey").as("tagged"),
        lpad($"n_name", 12, ".").as("padded"),
        substring($"n_name", 1, 3).as("prefix"),
        reverse($"n_name").as("rev"),
        length($"n_name").cast("long").as("len"),
        upper($"n_name").as("up"),
        replace($"n_name", lit("A"), lit("@")).as("replaced"))
      .orderBy($"n_nationkey")
  }

  /** Conditional/null-handling suite: nullif/coalesce/greatest/least/CASE. */
  private val q85NullSuite: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey",
        nullif($"o_orderstatus", lit("P")).as("status_or_null"),
        coalesce(nullif($"o_orderstatus", lit("P")), lit("PENDING")).as("status_filled"),
        greatest($"o_totalprice", lit(100000.0)).as("floor_price"),
        least($"o_custkey" % 7, lit(3L)).as("cap_prio"),
        when($"o_totalprice" > 250000, "high")
          .when($"o_totalprice" > 100000, "mid")
          .otherwise("low").as("band"))
      .orderBy($"o_orderkey")
  }

  /** Per-group OLS regression (the `regr_slope`/`regr_intercept` SQL
    * surface — price-vs-quantity fit per (returnflag, ship-year) cell):
    * computed from the five MOMENT SUMS (n, Σx, Σy, Σx², Σxy), which is
    * the one-pass, mergeable, map-side-combinable form — a single
    * groupBy shuffle of five longs per cell at any corpus size, where
    * the textbook two-pass (mean-centered) form would need a second
    * full scan.
    *
    * Oracle exactness: the inputs are cast to INTEGERS (quantity is
    * integral; price is rounded to whole dollars — both engines'
    * round-half-up agree on positive .5 cases), so every sum is exact
    * 64-bit integer arithmetic, order-independent under any shuffle
    * schedule; `slope` and `intercept` then involve only a handful of
    * IEEE-correctly-rounded double ops in a FIXED expression order —
    * bit-identical across engines, no rounding fuzz in the gate.
    * Overflow headroom: |n·Σxy| ≤ n²·max(x)·max(y) with x ≤ 50,
    * y ≤ ~111k needs n ≲ 4e7 per cell — the (flag, year) grain keeps
    * n ≈ rows/21, safe past sf100; beyond that promote the two products
    * to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB). */
  private val q177GroupOls: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_returnflag",
        year($"l_shipdate").cast("long").as("ship_year"),
        $"l_quantity".cast("long").as("x"),
        round($"l_extendedprice", 0).cast("long").as("y"))
      .groupBy($"l_returnflag", $"ship_year")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .withColumn("slope",
        ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double"))
      .withColumn("intercept",
        ($"sy".cast("double") - $"slope" * $"sx".cast("double")) /
          $"n".cast("double"))
      .select($"l_returnflag", $"ship_year", $"n", $"slope", $"intercept")
      .orderBy($"l_returnflag", $"ship_year")
  }

  /** PageRank over the customer↔supplier trade graph (who-buys-from-whom,
    * symmetrized for undirected authority — the corpus-pipeline use is
    * identical link-authority over domains/citations for source quality
    * weighting). Nodes are parity-encoded (customer 2k, supplier 2k+1) so
    * one long key carries both sides; 3 synchronous iterations of
    * [[graft.ext.Graph.pageRankExact]] in integer fixed-point, which the
    * oracle replays bit-for-bit as unrolled CTEs (generated from the same
    * Scala loop so the SQL cannot drift from the engine's constants).
    * Edge build is one orders⋈lineitem join + distinct; per iteration,
    * two map-side-combinable shuffles — no collect, no cartesian. */
  private val q178PageRank: Q = (s, d) => {
    import s.implicits._
    val pairs = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val edges = pairs.unionByName(
      pairs.select($"dst".as("src"), $"src".as("dst")))
    graft.ext.Graph.pageRankExact(edges, iters = 3)
      .filter($"node" % 2 === 1)
      .select(expr("(node - 1) div 2").as("suppkey"), $"rank".as("rank_fp"))
      .orderBy($"suppkey")
  }

  /** Markov-chain behavior analysis of the event stream (the clickstream
    * transition-matrix model): per-user `lag` ordering yields observed
    * (prev → next) transition counts, row-normalized to ppm integer
    * probabilities, then the 4-step distribution from uniform is computed
    * by exact fixed-point propagation (the q178 machinery with WEIGHTED
    * edges). The heavy operator is the transition extraction — one
    * per-user window shuffle over the full event log plus one count
    * shuffle; the chain itself is |event_type|² rows, so each step is a
    * broadcast-sized join iterated with pure integer arithmetic that the
    * oracle unrolls verbatim (ppm floor loss documented, identical in
    * both engines). */
  private val q183MarkovSteps: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = ev.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("src", lag($"event_type", 1).over(w))
      .filter($"src".isNotNull)
      .select($"src", $"event_type".as("dst"))
      .groupBy($"src", $"dst").agg(count(lit(1)).as("c"))
    val outTot = trans.groupBy($"src").agg(sum($"c").as("tot"))
    val p = trans.join(outTot, "src")
      .select($"src", $"dst", expr("(c * 1000000) div tot").as("p_ppm"))
      .cache()
    val states = ev.select($"event_type".as("state")).distinct()
      .localCheckpoint()
    var r = states.withColumn("r", lit(1000000000L))
    for (_ <- 1 to 4) {
      val inflow = p.join(r, p("src") === r("state"))
        .select($"dst", expr("(r * p_ppm) div 1000000").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("inflow"))
      r = states.join(inflow, states("state") === inflow("dst"), "left")
        .select(states("state"), coalesce($"inflow", lit(0L)).as("r"))
        .localCheckpoint()
    }
    p.unpersist()
    r.select($"state".as("event_type"), $"r".as("prob_fp"))
      .orderBy($"event_type")
  }

  /** Co-occurrence RECOMMENDATION ("customers like you also buy from…" —
    * item-item collaborative filtering by 2-hop co-purchase counts): for
    * each anchor customer, suppliers it does NOT yet use, ranked by how
    * many of its co-purchasers (customers sharing ≥1 supplier) use them.
    * Movement — aggregate-early, the property that keeps 2-hop feasible:
    * co-purchasers DEDUPE to distinct (anchor, peer) before the second
    * hop (the raw two-path multiset would be quadratic in supplier
    * popularity), the second hop is an equi-join on the peer key, the
    * anchor's own suppliers leave via broadcast anti-join, and the top-3
    * window runs per-anchor after a count shuffle. The anchor slice is
    * the catalog's oracle-cost bound; at corpus scale anchors are
    * whatever cohort is being served. */
  private val q189Copurchase: Q = (s, d) => {
    import s.implicits._
    val e = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("sup")).distinct()
    val anchors = e.filter($"c" < 30)
    val peers = anchors.select($"c".as("anchor"), $"sup")
      .join(e.select($"c".as("peer"), $"sup"), "sup")
      .filter($"anchor" =!= $"peer")
      .select($"anchor", $"peer").distinct()
    val recs = peers
      .join(e.select($"c".as("peer"), $"sup"), "peer")
      .groupBy($"anchor", $"sup").agg(count(lit(1)).as("n_peers"))
      .join(broadcast(anchors.select($"c".as("anchor"), $"sup")),
        Seq("anchor", "sup"), "left_anti")
    val w = Window.partitionBy($"anchor").orderBy($"n_peers".desc, $"sup")
    recs.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"anchor", $"rank", $"sup".as("suppkey"), $"n_peers")
      .orderBy($"anchor", $"rank")
  }

  val queries: Map[String, Q] = Map(
    "q189_copurchase"     -> q189Copurchase,
    "q183_markov_steps"   -> q183MarkovSteps,
    "q178_pagerank"       -> q178PageRank,
    "q177_group_ols"      -> q177GroupOls,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_projection"      -> q02Projection,
    "q03_rename"          -> q03Rename,
    "q04_filter_eq"       -> q04FilterEq,
    "q05_semijoin"        -> q05SemiJoin,
    "q06_semijoin_type"   -> q06SemiJoinType,
    "q07_null_queue"      -> q07NullQueue,
    "q08_antijoin"        -> q08AntiJoin,
    "q09_inner_join"      -> q09InnerJoin,
    "q10_star_join"       -> q10StarJoin,
    "q11_count_filtered"  -> q11CountFiltered,
    "q12_group_distinct"  -> q12GroupDistinct,
    "q13_topk"            -> q13TopK,
    "q14_window_topk"     -> q14WindowTopK,
    "q15_crossjoin"       -> q15CrossJoin,
    "q16_union"           -> q16Union,
    "q17_except"          -> q17Except,
    "q18_sample"          -> q18Sample,
    "q19_url_grid"        -> q19UrlGrid,
    "q20_events_window"   -> q20EventsWindow,
    "q21_date_parse"      -> q21DateParse,
    "q22_rollup"          -> q22Rollup,
    "q23_cube"            -> q23Cube,
    "q24_intersect"       -> q24Intersect,
    "q25_scalar_subquery" -> q25ScalarSubquery,
    "q26_pivot"           -> q26Pivot,
    "q27_range_join"      -> q27RangeJoin,
    "q28_asof_join"       -> q28AsofJoin,
    "q165_asof_forward"   -> q165AsofForward,
    "q167_unpivot"        -> q167Unpivot,
    "q168_histogram"      -> q168Histogram,
    "q29_json_extract"    -> q29JsonExtract,
    "q58_fuzzy_names"     -> q58FuzzyNames,
    "q59_full_outer"      -> q59FullOuter,
    "q77_approx_distinct" -> q77ApproxDistinct,
    "q78_quantiles"       -> q78Quantiles,
    "q132_approx_quantiles" -> q132ApproxQuantiles,
    "q140_hll_union"      -> q140HllUnion,
    "q156_hll_persist"    -> q156HllPersist,
    "q141_zorder_stats"   -> q141ZOrderStats,
    "q142_funnel"         -> q142Funnel,
    "q143_cohort_retention" -> q143CohortRetention,
    "q151_sessionize"     -> q151Sessionize,
    "q154_moving_window"  -> q154MovingWindow,
    "q155_scd2"           -> q155Scd2,
    "q81_lateral"         -> q81Lateral,
    "q82_window_suite"    -> q82WindowSuite,
    "q83_datetime_suite"  -> q83DatetimeSuite,
    "q84_string_suite"    -> q84StringSuite,
    "q85_null_suite"      -> q85NullSuite)

  /** q141's bit interleave, generated once for the oracle so the SQL
    * cannot drift from [[zOrderValue]]'s loop. */
  private val zOracleBits: String =
    (0 until 16).map(i =>
      s"(((zx >> $i) & 1) << ${2 * i}) + (((zy >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** q178's oracle, iterations unrolled from the same loop shape as
    * [[graft.ext.Graph.pageRankExact]] (teleport 150e6 = (100-85)·1e9/100;
    * all-integer `//` arithmetic — bit-identical replay). */
  private def pageRankOracleSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""i$k AS (SELECT e.dst AS node, sum(r.r // d.deg) AS inflow
            FROM edges e JOIN r${k - 1} r ON r.node = e.src
            JOIN deg d ON d.src = e.src GROUP BY e.dst),
          r$k AS (SELECT b.node,
                  CAST(150000000 + (85 * coalesce(i.inflow, 0)) // 100 AS BIGINT) AS r
            FROM r0 b LEFT JOIN i$k i ON i.node = b.node)"""
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
                  UNION ALL SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS r FROM deg),
        $iterCtes
        SELECT (node - 1) // 2 AS suppkey, r AS rank_fp FROM r$iters
        WHERE node % 2 = 1 ORDER BY suppkey"""
  }

  /** q183's oracle — transition extraction, ppm normalization, and the
    * same unrolled integer steps. */
  private def markovOracleSql(steps: Int): String = {
    val iters = (1 to steps).map { k =>
      s"""i$k AS (SELECT p.dst AS state,
                 sum((r.r * p.p_ppm) // 1000000) AS inflow
            FROM p JOIN r${k - 1} r ON r.state = p.src GROUP BY p.dst),
          r$k AS (SELECT s.state, CAST(coalesce(i.inflow, 0) AS BIGINT) AS r
            FROM states s LEFT JOIN i$k i ON i.state = s.state)"""
    }.mkString(",\n")
    s"""WITH t AS (SELECT lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS src,
             event_type AS dst
           FROM events),
        c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM t
              WHERE src IS NOT NULL GROUP BY 1, 2),
        ot AS (SELECT src, CAST(sum(c) AS BIGINT) AS tot FROM c GROUP BY src),
        p AS (SELECT c.src, c.dst, (c.c * 1000000) // ot.tot AS p_ppm
              FROM c JOIN ot ON ot.src = c.src),
        states AS (SELECT DISTINCT event_type AS state FROM events),
        r0 AS (SELECT state, CAST(1000000000 AS BIGINT) AS r FROM states),
        $iters
        SELECT state AS event_type, r AS prob_fp FROM r$steps
        ORDER BY event_type"""
  }

  val oracle: Map[String, String] = Map(
    // the same 2-hop: distinct peers, peer-supplier counts, anti-join on
    // the anchor's own suppliers, deterministic top-3
    "q189_copurchase" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sup
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          a AS (SELECT c, sup FROM e WHERE c < 30),
          peers AS (SELECT DISTINCT a.c AS anchor, e.c AS peer
                    FROM a JOIN e ON e.sup = a.sup AND e.c <> a.c),
          cnt AS (SELECT p.anchor, e.sup, CAST(count(*) AS BIGINT) AS n_peers
                  FROM peers p JOIN e ON e.c = p.peer
                  GROUP BY 1, 2),
          flt AS (SELECT cnt.* FROM cnt
                  WHERE NOT EXISTS (SELECT 1 FROM a
                    WHERE a.c = cnt.anchor AND a.sup = cnt.sup))
          SELECT anchor, rank, sup AS suppkey, n_peers FROM (
            SELECT anchor, sup, n_peers,
                   CAST(row_number() OVER (
                     PARTITION BY anchor ORDER BY n_peers DESC, sup) AS INT) AS rank
            FROM flt) t
          WHERE rank <= 3 ORDER BY anchor, rank""",
    "q183_markov_steps" -> markovOracleSql(4),
    "q178_pagerank" -> pageRankOracleSql(3),
    // identical moment sums (exact integers) and the identical fixed
    // double-expression order — see q177's Scaladoc
    "q177_group_ols" ->
      """WITH m AS (
           SELECT l_returnflag,
                  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
                  count(*) AS n,
                  sum(x) AS sx, sum(y) AS sy,
                  sum(x * x) AS sxx, sum(x * y) AS sxy
           FROM (SELECT l_returnflag, l_shipdate,
                        CAST(l_quantity AS BIGINT) AS x,
                        CAST(round(l_extendedprice, 0) AS BIGINT) AS y
                 FROM lineitem) t
           GROUP BY 1, 2),
         f AS (
           SELECT *, CAST(n * sxy - sx * sy AS DOUBLE) /
                     CAST(n * sxx - sx * sx AS DOUBLE) AS slope
           FROM m)
         SELECT l_returnflag, ship_year, n, slope,
                (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
                  CAST(n AS DOUBLE) AS intercept
         FROM f ORDER BY l_returnflag, ship_year""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         sum(l_quantity) / count(*) AS avg_qty,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_projection" ->
      "SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey",
    "q03_rename" ->
      """SELECT n_nationkey AS nation_key, n_name AS nation_name,
         n_regionkey AS region_key FROM nation ORDER BY nation_key""",
    "q04_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         WHERE o_orderstatus = 'F' ORDER BY o_orderkey""",
    "q05_semijoin" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         ORDER BY o_orderkey""",
    "q06_semijoin_type" ->
      """SELECT l_suppkey, count(*) AS n_lines FROM lineitem
         WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 10)
         GROUP BY l_suppkey ORDER BY l_suppkey""",
    "q07_null_queue" ->
      """SELECT doc_id FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""",
    "q08_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q09_inner_join" ->
      """SELECT o_orderkey, o_custkey, c_name FROM orders
         JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""",
    "q10_star_join" ->
      """SELECT r_name, n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_lines
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey  = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q11_count_filtered" ->
      """SELECT count(*) AS n FROM lineitem
         WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'""",
    "q12_group_distinct" ->
      """SELECT o_orderpriority,
         count(DISTINCT o_custkey) AS n_custs,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q13_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q14_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q15_crossjoin" ->
      """SELECT r_name, o_orderstatus FROM region
         CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
         ORDER BY r_name, o_orderstatus""",
    "q16_union" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey FROM supplier) t
         ORDER BY nationkey""",
    "q17_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT s_nationkey AS nationkey FROM supplier
         ORDER BY nationkey""",
    // the drawn rows are engine RNG; the oracle pins the deterministic
    // corpus size and replays the measured sampling contracts (q47/q100
    // pattern) — a failed invariant flips a boolean and breaks the hash
    "q18_sample" ->
      """SELECT (SELECT count(*) FROM lineitem) AS n_total,
                true AS size_within_6sigma, true AS subset_of_source,
                true AS seed_stable, true AS within_source_multiplicity""",
    "q19_url_grid" ->
      """SELECT y.year, q.qtr,
         'https://www.sec.gov/Archives/edgar/full-index/' || y.year ||
         '/QTR' || q.qtr || '/master.idx' AS url
         FROM (SELECT unnest(range(2018, 2021)) AS year) y
         CROSS JOIN (SELECT unnest(range(1, 5)) AS qtr) q
         ORDER BY y.year, q.qtr""",
    "q20_events_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q21_date_parse" ->
      """SELECT o_orderkey,
         CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS date
         FROM orders ORDER BY o_orderkey""",
    "q22_rollup" ->
      """SELECT o_orderpriority, o_orderstatus,
         CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
         CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
         count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         ORDER BY o_orderpriority, o_orderstatus""",
    "q23_cube" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
         count(*) AS n,
         sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",
    "q24_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT s_nationkey AS nationkey FROM supplier
         ORDER BY nationkey""",
    "q25_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM orders)
               > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
         ORDER BY o_orderkey""",
    "q26_pivot" ->
      """SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
         count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
         count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q27_range_join" ->
      """SELECT b.band, count(*) AS n_parts,
         CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM part p
         JOIN (VALUES ('p900', 900.0, 925.0), ('p925', 925.0, 950.0),
                      ('p950', 950.0, 975.0), ('p975', 975.0, 1000.0)) b(band, lo, hi)
           ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
         GROUP BY b.band ORDER BY b.band""",
    "q28_asof_join" ->
      """SELECT e.event_id, e.user_id,
         CAST(e.ts AS TIMESTAMP) AS error_ts,
         CAST(c.ts AS TIMESTAMP) AS click_ts
         FROM (SELECT * FROM events WHERE event_type = 'error') e
         ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON e.user_id = c.user_id AND e.ts >= c.ts
         ORDER BY e.event_id""",
    "q29_json_extract" ->
      """SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
         max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q58_fuzzy_names" ->
      """SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
         CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE a.c_custkey < 100 AND b.c_custkey < 100
           AND levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY key_a, key_b""",
    "q59_full_outer" ->
      """SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
         coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
         FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) p
           ON c_nationkey = s_nationkey
         ORDER BY nationkey""",
    "q77_approx_distinct" ->
      """SELECT true AS approx_ok, count(DISTINCT o_custkey) AS n_exact FROM orders""",
    "q78_quantiles" ->
      """SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
         round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
         round(quantile_cont(o_totalprice, 0.75), 6) AS p75
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // like q77: the sketch value is engine-specific, so the oracle pins the
    // exact quantiles and expects the measured rank contract to hold
    "q132_approx_quantiles" ->
      """SELECT CAST(0 AS BIGINT) AS qi,
                round(quantile_cont(o_totalprice, 0.25), 6) AS exact, true AS rank_ok
         FROM orders
         UNION ALL
         SELECT CAST(1 AS BIGINT), round(quantile_cont(o_totalprice, 0.5), 6), true
         FROM orders
         UNION ALL
         SELECT CAST(2 AS BIGINT), round(quantile_cont(o_totalprice, 0.75), 6), true
         FROM orders
         ORDER BY qi""",
    // the sketch/estimate are engine-specific; the oracle pins the exact
    // counts and the measured union contract (q77's pattern, merge leg)
    "q140_hll_union" ->
      """SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_groups,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
                true AS union_ok
         FROM orders""",
    // sketch bytes are engine-specific; the oracle pins groups + exact
    // distinct and the measured post-roundtrip union contract
    "q156_hll_persist" ->
      """SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_groups,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
                true AS persisted_union_ok
         FROM orders""",
    // the IDENTICAL generated bit-interleave (zOracleBits below): + is |
    // here because the interleaved terms occupy disjoint bit positions
    "q141_zorder_stats" ->
      s"""WITH z AS (
            SELECT o_custkey, o_orderdate, ($zOracleBits) AS z
            FROM (SELECT o_custkey, o_orderdate,
                         o_custkey % 65536 AS zx,
                         date_diff('day', DATE '1970-01-01',
                                   CAST(o_orderdate AS DATE)) % 65536 AS zy
                  FROM orders))
          SELECT z >> 16 AS bucket, CAST(count(*) AS BIGINT) AS n,
                 min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
                 min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
          FROM z GROUP BY bucket ORDER BY bucket""",
    // the same three chained stage CTEs: each stage's first qualifying
    // event must follow the previous stage's anchor
    "q142_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         v AS (SELECT user_id, min(ts) AS v_ts FROM e
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM e JOIN v USING (user_id)
               WHERE event_type = 'click' AND e.ts >= v.v_ts
                 AND e.ts <= v.v_ts + INTERVAL 24 HOUR GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM e JOIN c USING (user_id)
               WHERE event_type = 'purchase' AND e.ts >= c.c_ts
                 AND e.ts <= c.c_ts + INTERVAL 24 HOUR GROUP BY e.user_id)
         SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
         UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
         UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
         ORDER BY stage""",
    // Monday-truncated weeks and day-diff/7 are exact integers in both
    // engines (the offsets are exact multiples of 7 by construction)
    "q143_cohort_retention" ->
      """WITH e AS (SELECT user_id,
                  CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
           FROM events),
         ch AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id)
         SELECT cohort_wk,
                CAST(date_diff('day', cohort_wk, wk) // 7 AS BIGINT) AS week_offset,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM e JOIN ch USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""",
    // gap>1800s on floor-epoch seconds both sides; equal-ts ties cannot
    // move a session boundary, so any window tie order hashes identically
    "q151_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         l AS (SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                     THEN 1 ELSE 0 END AS new_s
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         c AS (SELECT user_id, ts,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
               FROM l)
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                min(ts) AS session_start,
                CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec,
                CAST(count(*) AS BIGINT) AS n_events
         FROM c GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx""",
    // forward as-of with tolerance replayed as a min-over-range: earliest
    // click in [error_ts, error_ts + 1h]; unmatched errors drop (inner)
    "q165_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click')
         SELECT e.event_id, e.user_id, e.ts AS error_ts,
                min(c.ts) AS next_click_ts
         FROM e JOIN c ON e.user_id = c.user_id
                      AND c.ts >= e.ts
                      AND date_diff('second', e.ts, c.ts) <= 3600
         GROUP BY 1, 2, 3 ORDER BY event_id""",
    "q167_unpivot" ->
      """WITH wide AS (
           SELECT o_orderpriority,
                  count(*) FILTER (o_orderstatus = 'F') AS F,
                  count(*) FILTER (o_orderstatus = 'O') AS O,
                  count(*) FILTER (o_orderstatus = 'P') AS P
           FROM orders GROUP BY 1)
         SELECT o_orderpriority, status, CAST(n AS BIGINT) AS n
         FROM wide UNPIVOT (n FOR status IN (F, O, P))
         ORDER BY o_orderpriority, status""",
    // integer-cent bucket boundaries: exact floor-division assignment
    "q168_histogram" ->
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                           AS c FROM orders),
         b AS (SELECT min(c) AS lo, max(c) AS hi FROM c)
         SELECT CAST((c - lo) * 20 // (hi - lo + 1) AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n
         FROM c, b GROUP BY 1 ORDER BY bucket""",
    // day-grain pre-agg then a 7-day RANGE frame over epoch days; the
    // moving average divides two exact decimals cast per the money rule
    "q154_moving_window" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
                  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev,
                  count(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT day,
                CAST(day_rev AS DOUBLE) AS day_rev,
                CAST(sum(day_rev) OVER w AS DOUBLE) AS rev_7d,
                CAST(sum(n_orders) OVER w AS BIGINT) AS n_7d,
                CAST((CAST(sum(day_rev) OVER w * 100 AS BIGINT) * 1000000)
                     // sum(n_orders) OVER w AS DOUBLE) / 1000000.0
                  AS avg_order_7d
         FROM daily
         WINDOW w AS (ORDER BY date_diff('day', DATE '1970-01-01', day)
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY day""",
    "q155_scd2" ->
      """WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
         batch AS (SELECT c_custkey, 'MACHINERY' AS new_segment FROM base
                   WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'MACHINERY'),
         f AS (SELECT b.c_custkey, b.c_mktsegment, t.new_segment
               FROM base b LEFT JOIN batch t USING (c_custkey))
         SELECT c_custkey, c_mktsegment AS segment,
                DATE '2024-01-01' AS valid_from,
                CASE WHEN new_segment IS NOT NULL THEN DATE '2024-07-01' END AS valid_to,
                new_segment IS NULL AS is_current
         FROM f
         UNION ALL
         SELECT c_custkey, new_segment, DATE '2024-07-01', NULL, true
         FROM f WHERE new_segment IS NOT NULL
         ORDER BY c_custkey, valid_from""",
    "q81_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
         WHERE c.c_custkey < 100
         ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""",
    "q82_window_suite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         lag(o_orderkey, 1) OVER w AS prev_order,
         lead(o_orderkey, 1) OVER w AS next_order,
         CAST(rank() OVER w AS INT) AS rnk,
         CAST(dense_rank() OVER w AS INT) AS drnk,
         CAST(ntile(4) OVER w AS INT) AS quartile,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_total
         FROM orders WHERE o_custkey < 200
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q83_datetime_suite" ->
      """SELECT o_orderkey,
         year(od) AS y, quarter(od) AS q, month(od) AS m, day(od) AS dom,
         last_day(od) AS month_end,
         od + 30 AS plus30,
         CAST(od - DATE '1995-01-01' AS BIGINT) AS days_since
         FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders) t
         ORDER BY o_orderkey""",
    "q84_string_suite" ->
      """SELECT n_nationkey,
         concat_ws('-', n_name, n_regionkey) AS tagged,
         lpad(n_name, 12, '.') AS padded,
         substring(n_name, 1, 3) AS prefix,
         reverse(n_name) AS rev,
         length(n_name) AS len,
         upper(n_name) AS up,
         replace(n_name, 'A', '@') AS replaced
         FROM nation ORDER BY n_nationkey""",
    "q85_null_suite" ->
      """SELECT o_orderkey,
         nullif(o_orderstatus, 'P') AS status_or_null,
         coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
         greatest(o_totalprice, 100000.0) AS floor_price,
         least(o_custkey % 7, 3) AS cap_prio,
         CASE WHEN o_totalprice > 250000 THEN 'high'
              WHEN o_totalprice > 100000 THEN 'mid'
              ELSE 'low' END AS band
         FROM orders ORDER BY o_orderkey""")
}
