package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.io.Tables

/** Plan-quality assertions: the properties that make these operators hold
  * at 100 TB (scan pushdown, column pruning, broadcast dims, shuffle-free
  * bucketed joins, partition pruning) are locked in here so a refactor
  * can't silently regress them. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan string. */
  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("parquet scan: predicate pushed down, columns pruned") {
    val df = Tables.documents(spark, sf).filter($"doc_id" < 100).select($"doc_id", $"lang")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:") && plan.contains("LessThan(doc_id,100)"),
      s"predicate not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"columns not pruned to (doc_id, lang):\n$plan")
  }

  test("semi-join against a small universe broadcasts the dim") {
    val universe = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val df = Tables.orders(spark, sf)
      .join(broadcast(universe), $"o_custkey" === $"c_custkey", "left_semi")
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi join:\n$plan")
  }

  test("bucketed co-located join runs with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.io.Catalog.dropManaged(spark, "plan_bkt_a")
      graft.io.Catalog.dropManaged(spark, "plan_bkt_b")
      Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("plan_bkt_a")
      Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("plan_bkt_b")
      val joined = spark.table("plan_bkt_a")
        .join(spark.table("plan_bkt_b"), $"o_custkey" === $"c_custkey")
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout prunes to the filtered partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_planspec_").toString
    Tables.events(spark, sf).write.mode("overwrite")
      .partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).filter($"event_type" === "click")
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters:") && plan.contains("event_type"),
      s"expected partition filters on event_type:\n$plan")
  }

  test("posting-index search prunes to the terms' lexeme-bucket partitions") {
    import graft.text.{PostingIndex, TextOps}
    val dir = java.nio.file.Files.createTempDirectory("graft_postidx_").toString + "/idx"
    val docs = Tables.documents(spark, sf)
    val postings = PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text"))
    PostingIndex.write(postings, dir, buckets = 16)
    val viaIndex = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merges", "joining"), buckets = 16)
    val viaScan = PostingIndex.searchAll(postings, "doc_id", Seq("merges", "joining"))
    assert(viaIndex.collect().map(_.getLong(0)).sorted.toSeq ==
      viaScan.collect().map(_.getLong(0)).sorted.toSeq)
    val plan = planOf(viaIndex)
    assert(plan.contains("PartitionFilters:") && plan.contains("lexeme_bucket"),
      s"bucket partition pruning missing:\n$plan")
  }

  test("IVF assignment is map-side: only the top-k rank window remains") {
    // the argmax cell assignment must add NO window (and so no per-vector
    // shuffle): the sole Window in an ivfKnn plan is the query-side top-k
    // rank — the first exchange any IVF operator does is its cell-id join
    val emb = Tables.embeddings(spark, sf)
    val knn = graft.ext.Similarity.ivfKnn(emb.filter($"vec_id" < 3), emb, k = 5)
    val plan = knn.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // \b: don't count WindowGroupLimit (map-side rank pruning — desirable)
    val windows = "\\(\\d+\\) Window\\b".r.findAllIn(plan).size
    assert(windows == 1, s"expected exactly 1 Window (rank), got $windows:\n$plan")
  }

  test("q98 plan is window-free (hash salt, no row_number sort)") {
    val df = graft.SparkEntry.queries("q98_ivf_near_dup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in q98 plan:\n$plan")
  }

  test("PII scrub (q102) is pure built-ins inside whole-stage codegen") {
    val df = graft.SparkEntry.queries("q102_pii_scrub")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("UDF"), s"q102 must not cross a UDF boundary:\n$plan")
    // executedPlan.toString marks whole-stage-codegen stages with a *(n) prefix
    assert(plan.contains("*("), s"expected whole-stage-codegen spans:\n$plan")
  }

  test("paragraph dedup (q103) is window-free with a map-side keeper agg") {
    // the keeper choice must be groupBy-min (partial agg before the
    // paragraph shuffle) — a row_number window partitioned by paragraph
    // would serialize every copy of a hot boilerplate paragraph onto one
    // task, which is exactly the skew this operator is designed to avoid
    val df = graft.SparkEntry.queries("q103_para_dedup")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"unexpected Window in q103 plan:\n$plan")
    assert(plan.contains("partial_min"),
      s"expected map-side partial_min keeper aggregation:\n$plan")
  }

  test("ExactSubstr dedup (q135) is window-free with a map-side keeper agg") {
    // same hot-gram skew argument as q103: the duplicate/keeper choice
    // must be partial-agg min over the gram md5, never a per-gram window;
    // a boilerplate 10-gram repeated 10^9 times must reduce map-side
    val df = graft.SparkEntry.queries("q135_exact_substr")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"unexpected Window in q135 plan:\n$plan")
    assert(plan.contains("partial_min"),
      s"expected map-side partial_min keeper aggregation:\n$plan")
  }

  test("LM perplexity filter (q137): integer partial sums, no float aggregation") {
    // the whole oracle-ability argument is that the per-document NLL sum
    // is INTEGER arithmetic — a sum(...double...) in the aggregate would
    // silently reintroduce order-dependent float accumulation
    val df = graft.SparkEntry.queries("q137_ppl_filter")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_sum"),
      s"expected map-side partial NLL sums:\n$plan")
    assert(!plan.toLowerCase.contains("sum(cast") ||
      !plan.toLowerCase.contains("as double)"),
      s"NLL aggregation must stay integer-typed:\n$plan")
  }

  test("exact dedup aggregates map-side (partial_ before the exchange)") {
    val df = Tables.documents(spark, sf)
      .groupBy(sha2($"text".cast("binary"), 256).as("h"))
      .agg(count(lit(1)).as("n"))
    val plan = planOf(df)
    assert(plan.contains("partial_count"),
      s"expected map-side partial aggregation:\n$plan")
  }

  test("corpus pipeline (q95): filters sit below the dedup shuffle, 3 exchanges") {
    val df = graft.SparkEntry.queries("q95_corpus_pipeline")(spark, sf)
    // formatted (pre-execution) explain: the AQE executedPlan string prints
    // initial AND final plans, double-counting exchanges
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // one hash-dedup shuffle + one per-lang agg shuffle + final orderBy —
    // a fourth exchange would mean the gate stopped pruning before moving
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges == 3, s"expected 3 exchanges, got $exchanges:\n$plan")
    // Spark 4 prunes each content-hash group to its top row map-side
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side window group limit for the dedup row_number:\n$plan")
  }

  test("decontamination (q113): both joins broadcast — the corpus never shuffles on grams or id") {
    val df = graft.SparkEntry.queries("q113_decontaminate")(spark, sf)
    val plan = planOf(df)
    // gram probe = broadcast inner join; fan-back = broadcast left-outer.
    // A SortMergeJoin would mean a full corpus shuffle on the join key.
    assert(!plan.contains("SortMergeJoin"),
      s"q113 must not sort-merge (corpus-wide shuffle):\n$plan")
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"expected 2 broadcast joins (probe + fan-back), got $bhj:\n$plan")
  }

  test("trigram fuzzy join (q125): probe side broadcasts, corpus aggregates map-side") {
    val df = graft.SparkEntry.queries("q125_trigram_fuzzy")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the gram join must be broadcast (the GIN posting-probe shape) — a
    // SortMergeJoin would shuffle the whole exploded corpus on gram text
    assert(!plan.contains("SortMergeJoin"),
      s"q125 must not sort-merge on grams:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast gram join:\n$plan")
    // one pair-count shuffle + the output sort; partial agg runs map-side
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (agg + sort), got $exchanges:\n$plan")
  }

  test("corpus export (q116): bounded shuffle count — filters and probes never move the corpus") {
    val df = graft.SparkEntry.queries("q116_corpus_export")(spark, sf)
    // typed node counts (not string matching): broadcast exchanges are a
    // different class and never miscount, and the persisted decontamination
    // probe's cached plan is audited separately from the main plan
    // shuffle count that sees through AQE wrappers and (executed) query
    // stages — exchanges are inserted by EnsureRequirements, so
    // queryExecution.sparkPlan has none, and a plan that already ran (the
    // persisted probe's cache fill) hides its exchanges inside stage nodes
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      p +: kids.flatMap(nodes)
    }
    def shuffles(p: SparkPlan): Int = nodes(p).count(_.isInstanceOf[ShuffleExchangeExec])
    val main = df.queryExecution.executedPlan
    // main plan: dedup content-hash window (1) + final orderBy range (1);
    // everything else — gram probe, drop-list anti-join, scoring,
    // chunk+pack — rides broadcasts or stays map-side
    val cached = nodes(main).collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s.relation.cachedPlan
    }
    assert(cached.nonEmpty, s"expected the hits to read from the persisted probe:\n$main")
    val mainExchanges = shuffles(main) // InMemoryTableScan is a leaf: cache-fill not counted
    assert(mainExchanges == 2, s"expected 2 main-plan exchanges, got $mainExchanges:\n$main")
    // the persisted probe's one-time cache-fill job carries the remaining
    // two shuffles: bench-gram distinct + hit-count keyed by doc
    val cacheExchanges = cached.map(shuffles).sum
    assert(cacheExchanges == 2,
      s"expected 2 cache-fill exchanges (gram distinct + hit count), got $cacheExchanges")
  }

  test("stratified quota (q117): rank filter pushed map-side (WindowGroupLimit)") {
    // each task must keep only its partial per-source top-30 BEFORE the
    // exchange — without the pushdown a billion-doc source moves whole
    val df = graft.SparkEntry.queries("q117_stratified")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side window group limit:\n$plan")
  }

  test("ts_stat with a lexeme filter prunes the index scan to the lexemes' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan_tsstat_").toString + "/idx"
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    graft.text.PostingIndex.write(
      graft.text.PostingIndex.buildPositional(docs, "doc_id", $"text"), dir, buckets = 16)
    val df = graft.text.PostingIndex.tsStatIndexed(spark, dir, "doc_id",
      lexemes = Seq("merge"), buckets = 16)
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters") && plan.contains("lexeme_bucket"),
      s"lexeme_bucket partition filter not pushed to the index scan:\n$plan")
    // one lexeme hashes to one bucket: the scan must touch 1/16 partitions.
    // Partition pruning is static, so read it off the pre-AQE plan — the
    // executed plan's AdaptiveSparkPlanExec hides its leaves.
    val scanned = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ <= 1),
      s"expected at most one scanned bucket partition, got $scanned")
  }

  test("PQ ADC shortlist (q115 shape): rank filter pushed map-side (WindowGroupLimit)") {
    // both the ADC shortlist's row_number <= shortlist and the re-rank's
    // top-k must prune per-task BEFORE the window exchange — without
    // WindowGroupLimit every (query, candidate) ADC row shuffles whole
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 3)
    val cb = graft.ext.Similarity.pqTrain(emb, m = 4, ksub = 8, maxIters = 2)
    val df = graft.ext.Similarity.pqKnn(queries, emb, k = 5, cb, shortlist = 20)
    val plan = planOf(df)
    val limits = "WindowGroupLimit".r.findAllIn(plan).size
    assert(limits >= 2,
      s"expected WindowGroupLimit on both the ADC shortlist and the re-rank top-k:\n$plan")
  }

  test("sessionize (q151): one data shuffle — windows and groupBy reuse the user_id partitioning") {
    val df = graft.SparkEntry.queries("q151_sessionize")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // lag-window, running-sum window, and the session groupBy must all sit
    // on the SAME (user_id) hashpartitioning: one data exchange + the
    // deterministic output sort, nothing else
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (user_id + output sort), got $exchanges:\n$plan")
  }

  test("funnel (q142): stage frames cached — final assembly scans parquet once, no windows") {
    val df = graft.SparkEntry.queries("q142_funnel")(spark, sf)
    val plan = planOf(df)
    // per-user sequencing must come from min-aggs + keyed joins, never a
    // per-user sort: a hyperactive user must not serialize a task
    assert(!plan.contains("Window"), s"unexpected Window in q142 plan:\n$plan")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val main = nodes(df.queryExecution.executedPlan)
    // v and c ride the cache (their one-time fills scanned view/click);
    // the main assembly may touch the event parquet only for purchases
    val cacheReads = main.count(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
    assert(cacheReads >= 2, s"expected v and c read from cache, got $cacheReads reads")
    val parquetScans = main.count(_.isInstanceOf[FileSourceScanExec])
    assert(parquetScans == 1,
      s"expected exactly 1 parquet scan (purchase) in the assembly, got $parquetScans")
    // the stage frames leave their aggs co-partitioned on user_id, so the
    // wide funnel join is exchange-free (a sort-merge of co-partitioned
    // caches, or a broadcast); the ONLY shuffle left is the single-row
    // global count agg. A second exchange means a stage frame moved.
    val shuffles = main.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles == 1,
      s"expected 1 exchange (global count agg), got $shuffles:\n$plan")
  }

  test("cohort retention (q143) is window-free with map-side partial aggs") {
    val df = graft.SparkEntry.queries("q143_cohort_retention")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"unexpected Window in q143 plan:\n$plan")
    assert(plan.contains("partial_min"),
      s"cohort min-agg must combine map-side:\n$plan")
  }

  test("ts_rank_cd (q114) is window-free: one groupBy-doc aggregation, no per-doc sort") {
    val df = graft.SparkEntry.queries("q114_ts_rank_cd")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"unexpected Window in q114 plan:\n$plan")
    assert(plan.contains("partial_collect_list") || plan.contains("ObjectHashAggregate"),
      s"expected map-side partial collect for the sweep input:\n$plan")
  }

  test("CDC chunking (q179) is map-only: the output sort is the ONLY exchange") {
    val df = graft.SparkEntry.queries("q179_cdc_chunks")(spark, sf)
    // formatted explain: the AQE executedPlan string double-counts (q95 note)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the repartition($"doc_id") in the query is the standard testdata
    // single-split spreader; beyond it and the deterministic output sort
    // there must be no data movement — chunking is a pure scan transform
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected ≤2 exchanges (spreader + sort), got $exchanges:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      s"q179 must not shuffle-join or window:\n$plan")
  }

  test("group OLS (q177) aggregates map-side with no window or join") {
    val df = graft.SparkEntry.queries("q177_group_ols")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_sum") && plan.contains("partial_count"),
      s"moment sums must combine map-side:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"q177 is one groupBy — no windows or joins expected:\n$plan")
  }

  test("PMI collocations (q180): vocab joins broadcast, no cartesian data product") {
    val df = graft.SparkEntry.queries("q180_pmi_collocations")(spark, sf)
    val plan = planOf(df)
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"expected both vocab marginal joins broadcast, got $bhj:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the scalar-total crossJoins must broadcast, never CartesianProduct:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge expected at this scale (AQE owns the web-scale flip):\n$plan")
    // the broadcasts above must be AQE-CHOSEN, not hint-forced: a forced
    // broadcast of a vocabulary-sized frame (10^8-10^9 word types at web
    // scale) OOMs; the only legitimate hints in q180 are the two 1-row
    // corpus-total frames on the crossJoins
    val hints = "ResolvedHint".r
      .findAllIn(df.queryExecution.analyzed.toString).size
    assert(hints == 2,
      s"q180 must hint ONLY the two 1-row totals (nu, nb); found $hints hints")
  }

  test("Zipf slope (q324): top-R rank filter pushed map-side (WindowGroupLimit), no joins") {
    val df = graft.SparkEntry.queries("q324_zipf_slope")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"),
      s"the rk <= R filter must prune map-side before the per-source window:\n$plan")
    assert(!plan.contains("Join"),
      s"q324 is two aggregations and one window — no joins:\n$plan")
  }

  test("char entropy (q325) and symbol profile (q331): partial aggregation map-side, no window/join on the corpus") {
    for (name <- Seq("q325_char_entropy", "q331_symbol_profile")) {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = planOf(df)
      assert(plan.contains("partial_"),
        s"$name must combine map-side before its shuffle:\n$plan")
      assert(!plan.contains("Join"), s"$name has no joins:\n$plan")
    }
  }

  test("OOV rate (q242) and tf-idf keywords (q245): vocab join side is AQE-chosen, never hint-forced") {
    // same scale rule as q137/q180: the df>=3 vocabulary and the document-
    // frequency table are vocabulary-sized — at this sf AQE broadcasts
    // them, at web scale it must be free to shuffle instead, so the query
    // may not carry any broadcast hint at all
    for (name <- Seq("q242_oov_rate", "q245_keywords")) {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = planOf(df)
      assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
        s"$name must not hint-force any join side")
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: AQE should still pick broadcast at sf0.001:\n$plan")
    }
  }

  test("weighted reservoir (q176): key derivation below the single top-k window") {
    val df = graft.SparkEntry.queries("q176_weighted_reservoir")(spark, sf)
    val plan = planOf(df)
    assert("Window".r.findAllIn(plan).size >= 1 && !plan.contains("Join"),
      s"q176 is map + one per-group window — no joins:\n$plan")
    // rank<=5 must prune map-side before the window shuffle
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown for the top-k filter:\n$plan")
  }

  test("disk IVF probe (q191) prunes the partitioned scan to the probed cells") {
    val df = graft.SparkEntry.queries("q191_ivf_disk_index")(spark, sf)
    val plan = planOf(df)
    // the cell-id join against the cid-partitioned index must plan dynamic
    // partition pruning — without it a probe reads the WHOLE index
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the cid-partitioned scan:\n$plan")
  }

  test("triangle count (q184) joins hash-partitioned, never all-triples") {
    val df = graft.SparkEntry.queries("q184_triangles")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle joins must be equi-joins:\n$plan")
  }

  test("pareto frontier (q193): tokenization computed once — the join-back reads the cache") {
    val df = graft.SparkEntry.queries("q193_pareto_frontier")(spark, sf)
    df.collect()
    // formatted explain numbers REAL plan nodes — FileScan strings inside
    // the InMemoryRelation's cached-plan printout don't count as scans
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // exactly one scan node id may exist: the cache's own build plan,
    // which formatted explain prints inside the InMemoryRelation
    val scanIds = "Scan parquet\\s+\\((\\d+)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(scanIds.size <= 1,
      s"tokenization must run once (cache build), got scan nodes $scanIds:\n$plan")
    val imtsIds = "InMemoryTableScan \\((\\d+)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(imtsIds.size >= 2,
      s"frontier + join-back must both read the cached projection:\n$plan")
  }

  test("quality threshold (q197): percentile found on the histogram, never a row sort") {
    val df = graft.SparkEntry.queries("q197_quality_threshold")(spark, sf)
    val plan = planOf(df)
    // the histogram groupBy must partial-aggregate map-side; the windows
    // then run over (source, score) cells, so no corpus-sized sort exists
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"histogram must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the totals join must broadcast:\n$plan")
  }

  test("url canonicalize (q198) is map-only up to the key groupBy: no joins, no windows") {
    val df = graft.SparkEntry.queries("q198_url_canonicalize")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"canonicalization is a projection + one groupBy:\n$plan")
    assert(plan.contains("partial_count"),
      s"the canonical-key dedup must partial-aggregate map-side:\n$plan")
  }

  test("backoff LM (q194): count tables aggregate map-side, no cartesian product") {
    val df = graft.SparkEntry.queries("q194_backoff_lm")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_count"),
      s"C2/U counts must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row stats frame must broadcast, never CartesianProduct:\n$plan")
  }

  test("keyword tags (q204): automaton scan is map-only — no joins, one K-row fold") {
    val df = graft.SparkEntry.queries("q204_keyword_tags")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Join"),
      s"the broadcast automaton replaces any keyword join:\n$plan")
    assert(plan.contains("partial_sum"),
      s"the per-keyword fold must combine map-side:\n$plan")
  }

  test("rollup moments (q208) reads the corpus exactly once") {
    val df = graft.SparkEntry.queries("q208_rollup_moments")(spark, sf)
    // AQE prints Final + Initial plans; count scans in the final section only
    val plan = planOf(df).split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"rollup must fold the total from one scan, saw $scans:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"moments must partial-aggregate map-side:\n$plan")
  }

  test("equi-depth histogram (q209): window runs on the value histogram, totals broadcast") {
    val df = graft.SparkEntry.queries("q209_equidepth_hist")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_count"),
      s"the cents histogram must combine map-side before the window:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row total must broadcast, never CartesianProduct:\n$plan")
  }

  test("join hints select the requested physical join (merge / shuffle_hash / broadcast)") {
    // the cluster-tuning surface: when stats mislead the optimizer, the
    // engine's operators pin strategies by hint — verify Spark honors them
    val a = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val b = Tables.customer(spark, sf).select($"c_custkey")
    val merge = planOf(a.hint("merge").join(b, $"o_custkey" === $"c_custkey"))
    assert(merge.contains("SortMergeJoin"), s"merge hint ignored:\n$merge")
    val sh = planOf(a.hint("shuffle_hash").join(b, $"o_custkey" === $"c_custkey"))
    assert(sh.contains("ShuffledHashJoin"), s"shuffle_hash hint ignored:\n$sh")
    val bc = planOf(a.join(broadcast(b), $"o_custkey" === $"c_custkey"))
    assert(bc.contains("BroadcastHashJoin"), s"broadcast hint ignored:\n$bc")
  }

  test("Kneser-Ney (q212): one bigram shuffle feeds every stat table, joins broadcast") {
    val df = graft.SparkEntry.queries("q212_kneser_ney")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_count"),
      s"bigram counts must combine map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"ctx/cont stat joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("budget select (q218): cutoff from the histogram; score joins broadcast") {
    val df = graft.SparkEntry.queries("q218_budget_select")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_sum"),
      s"score histogram must combine map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"full-scores and cutoff joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("source contamination (q222): pairs only within shingle groups, no cartesian") {
    val df = graft.SparkEntry.queries("q222_source_contamination")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"pair generation must stay inside shingle source-lists:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"shingle/pair counts must combine map-side:\n$plan")
  }

  test("keyword tags & tf-cosine (q204/q224): no doc-by-doc cartesian anywhere") {
    Seq("q204_keyword_tags", "q224_tf_cosine").foreach { q =>
      val plan = planOf(graft.SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
    }
  }

  test("MAD outliers (q206): medians fold from histograms; median joins broadcast") {
    val df = graft.SparkEntry.queries("q206_mad_outliers")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_count"),
      s"value histograms must combine map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the per-source median rows must broadcast back:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }

  test("packing efficiency (q354): the row-level cumulative window is PARTITIONED") {
    val df = graft.SparkEntry.queries("q354_packing_efficiency")(spark, sf)
    val plan = planOf(df)
    // the concat-policy boundary test must never funnel document rows
    // through a single-partition window — the window spec partitions by
    // source, so the row-level exchange is a hash partitioning
    assert(plan.contains("Window") &&
      plan.contains("partitionBy=[source") ||
      plan.contains("hashpartitioning(source"),
      s"expected a source-partitioned window over the row-level frame:\n$plan")
  }

  test("mixture sweep (q353): one map-side-combinable aggregate over documents") {
    val df = graft.SparkEntry.queries("q353_mixture_temperature")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_sum"),
      s"per-source token mass must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }

  test("split leakage (q356): exactly one row-level shuffle, on the content hash") {
    val df = graft.SparkEntry.queries("q356_split_leakage")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"cluster counts must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"no joins at all — dedup clustering is a single hash aggregate:\n$plan")
  }
}
