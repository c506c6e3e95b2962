package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the quadratic-risk pair-finder family
  * (VERDICT r7 next-round #3): the salt guards and candidate bounds in the
  * LSH / all-pairs / IVF / Hamming queries are plan-asserted but the bench
  * only ever RUNS them at sf0.1 — this main runs them at an sf1.0-equivalent
  * workload and measures (a) wall-time growth vs sf0.1 and (b) task-level
  * skew (max task ms / median task ms), writing `STRESS.md`.
  *
  * sf1.0 construction (the driver only ships sf ≤ 0.1): `FACTOR`
  * replica-salted copies of the sf0.1 corpus, built so the similarity
  * structure scales the way a real 10× corpus would —
  *  - documents: every token of replica k gets a `⁞rk` suffix. Suffixing all
  *    tokens uniformly is a bijection on shingles, so WITHIN a replica every
  *    Jaccard/simhash relationship of the base corpus is preserved exactly,
  *    while ACROSS replicas shingle sets are disjoint (Jaccard 0) — true
  *    near-dup pairs grow linearly (×k), never quadratically.
  *  - embeddings: replica k's vectors are circularly rotated by `7k` dims —
  *    an isometry, so within-replica cosines are bit-preserved while
  *    cross-replica pairs decorrelate.
  * A pair-finder whose candidate generation is genuinely bounded (bands,
  * prefix tokens, IVF cells, Hamming bands) should grow ~linearly in wall
  * time on this input; an accidental all-pairs stage grows ~FACTOR².
  *
  * Not part of the correctness or bench gates — a one-shot scale proof,
  * rerunnable via `sbt "runMain graft.Stress"`.
  */
object Stress {

  private final class TaskClock extends SparkListener {
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null) durations.add(te.taskInfo.duration)
    def drain(): Array[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var v = durations.poll()
      while (v != null) { out += v.longValue(); v = durations.poll() }
      out.toArray
    }
  }

  case class RunStats(sec: Double, rows: Long, maxTaskMs: Long, medTaskMs: Long)
  case class Family(name: String, base: RunStats, scaled: RunStats) {
    def ratio: Double = scaled.sec / math.max(base.sec, 1e-9)
    def skew: Double = scaled.medTaskMs match {
      case 0 => 0.0
      case m => scaled.maxTaskMs.toDouble / m
    }
  }

  /** The ER stress family's record slice and df cap, shared VERBATIM with
    * [[StressErRecall]] (the recall gate at this slice): one definition,
    * so tuning the slice or the cap can never leave the gate certifying a
    * configuration the stress row no longer runs. 20% md5-thinned part
    * records; cap = q366's "df > ~37% of records is boilerplate" ratio
    * applied to this slice's ~4k records → 1500. */
  private[graft] def erStressSlice(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    io.Tables.part(s, d).repartition($"p_partkey")
      .filter(conv(substring(md5($"p_partkey".cast("string")), 1, 4), 16, 10)
        .cast("long") % 5 === 0)
      .select($"p_partkey", $"p_name")
  }

  private[graft] def erStressStopDf: Long =
    sys.env.getOrElse("SPARK_GRAFT_TRIGRAM_STOPDF", "1500").toLong

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STRESS_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    import spark.implicits._

    val clock = new TaskClock
    spark.sparkContext.addSparkListener(clock)

    // ---- build the sf1.0-equivalent input ------------------------------
    val scaledDir = util.Scratch.dir("graft_stress_sf1_")
    val reps = spark.range(factor).toDF("rep")
    io.Tables.documents(spark, baseDir)
      .crossJoin(reps)
      .select(
        ($"doc_id" * factor + $"rep").as("doc_id"),
        // token-wise replica salt (see scaladoc): shingle-bijective within
        // a replica, shingle-disjoint across replicas. Pure-alphanumeric and
        // glued to the word so EVERY tokenizer in the family (whitespace
        // split, non-alnum split, basic lowercase) keeps word+salt one token
        array_join(
          transform(split($"text", " "), w => concat(w, lit("qz"), $"rep")),
          " ").as("text"),
        $"lang", $"source", $"n_chars")
      .write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")
    io.Tables.embeddings(spark, baseDir)
      .crossJoin(reps)
      .select(
        ($"vec_id" * factor + $"rep").as("vec_id"),
        // per-replica deterministic SIGN FLIPS: an isometry (within-replica
        // cosines bit-preserved) that decorrelates across replicas even
        // when vectors share a strong mean component — a circular dim
        // rotation does not (cos(v, rot(v)) stays high for structured v)
        transform($"embedding", (x, j) =>
          x * (pmod(hash(j, $"rep"), lit(2)) * 2 - 1).cast("float"))
          .as("embedding"),
        $"label")
      .write.mode("overwrite").parquet(s"$scaledDir/embeddings.parquet")
    // part names for the trigram all-pairs family: rep-char INTERLEAVING
    // (every 3-char window contains the replica mark, so pg_trgm sets are
    // disjoint across replicas — a suffix/prefix salt would leave most
    // internal trigrams shared and the cross-replica pair count quadratic)
    io.Tables.part(spark, baseDir)
      .crossJoin(reps)
      .select(($"p_partkey" * factor + $"rep").as("p_partkey"),
        concat_ws("", transform(split($"p_name", ""),
          c => concat(c, lit("x"), $"rep"))).as("p_name"))
      .write.mode("overwrite").parquet(s"$scaledDir/part.parquet")
    // the trade graph for PageRank: replica-offset keys keep the join
    // consistent and make the scaled graph `factor` disjoint copies —
    // linear edge growth, the honest scale-up shape for iterative ranking
    io.Tables.orders(spark, baseDir)
      .crossJoin(reps)
      .select(($"o_orderkey" * factor + $"rep").as("o_orderkey"),
        ($"o_custkey" * factor + $"rep").as("o_custkey"))
      .write.mode("overwrite").parquet(s"$scaledDir/orders.parquet")
    io.Tables.lineitem(spark, baseDir)
      .crossJoin(reps)
      .select(($"l_orderkey" * factor + $"rep").as("l_orderkey"),
        ($"l_suppkey" * factor + $"rep").as("l_suppkey"),
        $"l_extendedprice")
      .write.mode("overwrite").parquet(s"$scaledDir/lineitem.parquet")

    // ---- the pair-finder family ----------------------------------------
    // Catalog entries run verbatim; q161's catalog form gates on a bounded
    // slice, so its FULL-CORPUS path (same band join, as documented there)
    // is spelled out here.
    def hammingFull(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val all = io.Tables.documents(s, d)
        .repartition($"doc_id")
        .select($"doc_id",
          ext.Dedup.simhashMd5(text.TextOps.tokenizeBasic($"text")).as("sh"))
      val pt = all.select($"doc_id", $"sh",
          posexplode(array((0 until 4).map(b =>
            shiftright($"sh", b * 15).bitwiseAND(lit(0x7fffL))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
      pt.as("x").join(pt.as("y"),
          $"x.band" === $"y.band" && $"x.bv" === $"y.bv" && $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
          bit_count($"x.sh".bitwiseXOR($"y.sh")).cast("int").as("hamming"))
        .filter($"hamming" <= 3)
        .distinct()
    }
    // The IVF pair pipelines size their quantizer ∝ corpus (the
    // collectCentroids scaladoc's sizing rule); the catalog pins
    // numCentroids=8 for oracle determinism at sf ≤ 0.1, which at ×10 data
    // makes each cell ~2500 wide — within-cell pair work is quadratic in
    // cell width, so the FIXED-centroid run is expected to go superlinear
    // with one giant task per cell. Both runs are included: the fixed one
    // demonstrates the failure mode the sizing rule exists for, the scaled
    // one (numCentroids × factor, constant expected cell width) proves the
    // documented knob restores ~linear growth.
    def ivfScaled(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val emb = io.Tables.embeddings(s, d).repartition($"vec_id")
      val n = ext.Similarity.autoCentroids(emb.count())
      ext.Similarity.ivfNearDupPairs(emb, threshold = 0.45, numCentroids = n)
    }
    def semDedupScaled(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val emb = io.Tables.embeddings(s, d).repartition($"vec_id")
      val n = ext.Similarity.autoCentroids(emb.count())
      ext.Similarity.semDedup(emb, tau = 0.45, numCentroids = n).select($"vec_id")
    }
    // q181/q184's pair stage WITHOUT the catalog's oracle-cost slice: the
    // full part dimension through the same df-ordered prefix-filtered
    // trigram join — the quadratic-risk step of entity resolution at
    // corpus width. (The first stress run of this family, with
    // LEXICOGRAPHIC prefix order, hung on the word-initial "␣␣x" hub
    // grams — the failure mode that made frequency order load-bearing in
    // Trigram.similarSelfJoin.)
    // md5-thinned to a 20% record slice: TPC-H part names draw from a
    // ~92-word vocabulary, so the similarity graph is DENSE — candidates
    // grow linearly in replicas (cross-replica grams are disjoint) but
    // with a large constant; the thinning keeps the harness's wall-clock
    // sane while preserving the 10× base→scaled growth being measured
    def trigramAllPairs(s: SparkSession, d: String, mod: Int): DataFrame = {
      import s.implicits._
      // skew-knob sweep hooks (round-9 advice: tune or bound the ×10
      // max/med task skew): defaults are similarSelfJoin's own
      val hubCap = sys.env.getOrElse("SPARK_GRAFT_TRIGRAM_HUBCAP", "2048").toInt
      val saltB = sys.env.getOrElse("SPARK_GRAFT_TRIGRAM_SALTB", "8").toInt
      text.Trigram.similarSelfJoin(
        io.Tables.part(s, d).repartition($"p_partkey")
          .filter(conv(substring(md5($"p_partkey".cast("string")), 1, 4), 16, 10)
            .cast("long") % mod === 0)
          .select($"p_partkey", $"p_name"),
        "p_partkey", "p_name", 11, 20, hubCap = hubCap, saltB = saltB)
    }
    def trigramAllPairsFull(s: SparkSession, d: String): DataFrame =
      trigramAllPairs(s, d, 5)
    // the ER pair stage under the measured df-cap (round-12 VERDICT item
    // 2): grams with document frequency above the cap are dropped from
    // sizing, candidates AND the Jaccard gate (`Trigram.similarSelfJoin
    // stopGramDf` — the metric becomes "Jaccard over non-hub grams", whose
    // recall vs the full metric is gated ≥ 0.9 by q366 at catalog scale).
    // The cap is q366's ratio (df > ~37% of records is boilerplate, not
    // identity) applied to this run's 20% record slice: sf0.1 part = 20k
    // rows → ~4k records/replica → cap 1500. Hub grams are EXACTLY what
    // made the uncapped ×100 run spill >70 GB: the rep-mark interleaving
    // that keeps single-digit replicas gram-disjoint collides at two-digit
    // replica ids ("ax1" occurs in rep 1 and rep 10+), and those collision
    // grams' df grows ∝ replicas — C(df,2) candidate blocks went
    // superlinear. A df cap removes them by construction at ANY density,
    // so the capped operator's candidate volume is bounded per replica.
    def trigramStopgram(s: SparkSession, d: String): DataFrame =
      text.Trigram.similarSelfJoin(erStressSlice(s, d),
        "p_partkey", "p_name", 11, 20, stopGramDf = Some(erStressStopDf))
    // the round-8 iterative-graph legs at scale: each round is a bounded
    // (join + groupBy) pair over replica-disjoint graph copies, so edges —
    // and wall time — must grow linearly; localCheckpoint keeps lineage
    // O(1) so round 3 doesn't re-run rounds 1-2
    // q184/q196's catalog forms gate on a p_partkey slice (constant at any
    // sf), so their FULL-graph stress runs triangle counting and k-core
    // peeling over the full-corpus trigram pair graph.
    // Triangles use the DEGREE-ORDERED node iterator (each edge oriented
    // toward its higher-(deg, id) endpoint; wedges pair the out-edges of
    // the lowest-rank vertex, and the closing edge is probed in oriented
    // form) — the plain two-path join is Σ deg² and the interleaved-name
    // stress corpus is artifact-DENSE (measured deg ≈ 490 at ×10: 9.4e9
    // two-paths, an OOM), while orientation bounds out-degree by
    // O(√edges). The triangle slice also thins to 5% for the same
    // reason: a real near-dup graph is sparse; this one's density is a
    // harness artifact, and the point is growth shape, not density.
    def trianglesFull(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val pairs = trigramAllPairs(s, d, 20).select($"r1", $"r2").cache()
      val deg = pairs.select(explode(array($"r1", $"r2")).as("v"))
        .groupBy($"v").agg(count(lit(1)).as("deg"))
      // rank packs (deg, id) into one long: ids are ≤ 2·partkey·factor
      // < 2^24 and degrees < 2^24, so deg·2^25 + id is collision-free
      val e = pairs
        .join(deg.select($"v".as("r1"), $"deg".as("d1")), "r1")
        .join(deg.select($"v".as("r2"), $"deg".as("d2")), "r2")
        .select(($"d1" * 33554432L + $"r1").as("k1"),
          ($"d2" * 33554432L + $"r2").as("k2"))
        .select(least($"k1", $"k2").as("s"), greatest($"k1", $"k2").as("t"))
        .cache()
      val wedges = e.as("e1").join(e.as("e2"),
          col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
        .select(col("e1.s").as("w"), col("e1.t").as("s"), col("e2.t").as("t"))
      wedges.join(e, Seq("s", "t"))
        .select(explode(array($"w", $"s", $"t")).as("k"))
        .select(pmod($"k", lit(33554432L)).as("rid"))
        .groupBy($"rid").agg(count(lit(1)).as("n_tri"))
    }
    // k-core peeling is linear in edges per round — it takes the full
    // 20%-slice graph even at its artifact density
    def kCoreFull(s: SparkSession, d: String): DataFrame =
      ext.Graph.kCore(trigramAllPairsFull(s, d), k = 2, iters = 4,
        srcCol = "r1", dstCol = "r2")
    // the GRAPH operator alone at ×factor EDGE volume: the real base pair
    // graph replicated as node-id-offset disjoint copies (work exactly
    // ×factor). Exists because `q196_kcore_full`'s upstream verify join
    // rides the artifact-dense part corpus whose candidate volume grows
    // ~64× per decade — at ×100 its shuffle spill exceeds a single host's
    // disk (measured: >70 GB on this 252 GB harness), which says nothing
    // about k-core itself. Ids stay < 2^25 (trianglesFull's packing
    // bound), so rep·2^25 offsets cannot collide.
    def kCoreGraph(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val pairs = trigramAllPairsFull(s, baseDir).select($"r1", $"r2")
      val g =
        if (d == baseDir) pairs
        else pairs.crossJoin(s.range(factor).toDF("rep"))
          .select(($"r1" + $"rep" * 33554432L).as("r1"),
            ($"r2" + $"rep" * 33554432L).as("r2"))
      ext.Graph.kCore(g, k = 2, iters = 4, srcCol = "r1", dstCol = "r2")
    }
    // the ER pipeline's CLUSTERING stage (q181/q86/q207's transitive
    // closure) at ×factor edge volume, same disjoint-copy construction as
    // kCoreGraph: connectedComponents is one-hop min-label propagation —
    // O(diameter) rounds of (edges ⋈ labels) + groupBy-min — so with
    // diameter fixed by the base graph's cluster shapes, wall time must
    // grow ~linearly in edges; replica offsets leave the per-copy
    // diameter (and thus round count) EXACTLY the base's
    def ccGraph(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val pairs = trigramAllPairsFull(s, baseDir).select($"r1", $"r2")
      val g =
        if (d == baseDir) pairs
        else pairs.crossJoin(s.range(factor).toDF("rep"))
          .select(($"r1" + $"rep" * 33554432L).as("r1"),
            ($"r2" + $"rep" * 33554432L).as("r2"))
      ext.Dedup.connectedComponents(g, "r1", "r2")
    }
    // the DIAMETER-scaling companion (round-13 VERDICT item 6): disjoint
    // copies keep per-copy diameter == base, so q181_cc_graph proves
    // throughput, not depth. Here consecutive copies are CHAINED with one
    // bridge edge (copy k's max node ↔ copy k+1's min node), so the giant
    // component's diameter grows ~×factor — the actual scale law of an ER
    // corpus whose clusters merge as it grows. One-hop min-label
    // propagation needs Θ(diameter) rounds on this graph; the pointer-
    // jumping step makes rounds ~log(diameter) (printed per run, recorded
    // in the STRESS notes).
    def ccChain(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val pairs = trigramAllPairsFull(s, baseDir).select($"r1", $"r2").cache()
      val g =
        if (d == baseDir) pairs
        else {
          val mm = pairs.agg(
            org.apache.spark.sql.functions.least(
              org.apache.spark.sql.functions.min($"r1"),
              org.apache.spark.sql.functions.min($"r2")).as("lo"),
            org.apache.spark.sql.functions.greatest(
              org.apache.spark.sql.functions.max($"r1"),
              org.apache.spark.sql.functions.max($"r2")).as("hi")).head()
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val copies = pairs.crossJoin(s.range(factor).toDF("rep"))
            .select(($"r1" + $"rep" * 33554432L).as("r1"),
              ($"r2" + $"rep" * 33554432L).as("r2"))
          val bridges = s.range(factor - 1).toDF("rep")
            .select(($"rep" * 33554432L + hi).as("r1"),
              (($"rep" + 1) * 33554432L + lo).as("r2"))
          copies.unionByName(bridges)
        }
      val cc = ext.Dedup.connectedComponents(g, "r1", "r2")
      println(s"[cc-rounds] q181_cc_chain at $d: " +
        s"${ext.Dedup.lastCcRounds} rounds to converge")
      pairs.unpersist()
      cc
    }
    val families: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q178_pagerank" -> ops.Relational.queries("q178_pagerank"),
      "q285_hits" -> ops.ExtQueries.queries("q285_hits"),
      "q296_bellman_ford" -> ops.ExtQueries.queries("q296_bellman_ford"),
      "q181_trigram_allpairs_full" -> trigramAllPairsFull,
      "q181_trigram_stopgram" -> trigramStopgram,
      "q184_triangles_full" -> trianglesFull,
      "q196_kcore_full" -> kCoreFull,
      "q196_kcore_graph" -> kCoreGraph,
      "q181_cc_graph" -> ccGraph,
      "q181_cc_chain" -> ccChain,
      "q43_minhash_lsh" -> ops.ExtQueries.queries("q43_minhash_lsh"),
      "q150_allpairs_sim" -> ops.ExtQueries.queries("q150_allpairs_sim"),
      "q98_ivf_fixed8" -> ops.ExtQueries.queries("q98_ivf_near_dup"),
      "q98_ivf_scaled" -> ivfScaled,
      "q126_semdedup_fixed8" -> ops.ExtQueries.queries("q126_sem_dedup"),
      "q126_semdedup_scaled" -> semDedupScaled,
      "q161_hamming_full" -> hammingFull,
      // the boilerplate cap (shingles in >10 sources dropped) bounds
      // per-shingle pair fanout at C(10,2); source count is constant, so
      // the (source, shingle) volume grows linearly and the pair stage
      // must too — this run proves the cap holds off-slice
      "q222_source_contamination" -> ops.ExtQueries.queries("q222_source_contamination"))

    // dev subset filter (comma-separated family names); absent = all
    val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => families.filter { case (n, _) => names(n) }
      case None        => families
    }

    def run(fn: (SparkSession, String) => DataFrame, dir: String): RunStats = {
      clock.drain()
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val tasks = clock.drain().sorted
      val (mx, med) =
        if (tasks.isEmpty) (0L, 0L) else (tasks.last, tasks(tasks.length / 2))
      RunStats(sec, rows, mx, med)
    }

    // JVM/codegen warm-up outside every timed region (Bench rationale)
    spark.range(1000000).selectExpr("sum(id)").collect()
    selected.foreach { case (_, fn) => run(fn, baseDir) }

    val results = selected.map { case (name, fn) =>
      val base = run(fn, baseDir)
      val scaled = run(fn, scaledDir)
      val f = Family(name, base, scaled)
      println(f"""{"family":"$name","base_sec":${base.sec}%.2f,"scaled_sec":${scaled.sec}%.2f,"growth_ratio":${f.ratio}%.2f,"rows_base":${base.rows},"rows_scaled":${scaled.rows},"scaled_max_task_ms":${scaled.maxTaskMs},"scaled_med_task_ms":${scaled.medTaskMs}}""")
      f
    }

    val md = new StringBuilder
    md ++= "# STRESS — pair-finder family at sf1.0-equivalent scale\n\n"
    md ++= s"Input: `$baseDir` (sf0.1) replicated ×$factor with replica-salted\n"
    md ++= "tokens (shingle-bijective within a replica, disjoint across) and\n"
    md ++= "sign-flipped embeddings (isometric within, decorrelated across) —\n"
    md ++= "see `Stress.scala` for why this reproduces sf1.0's similarity\n"
    md ++= s"structure. local[$cpus], one timed run per cell after warm-up.\n\n"
    md ++= "A bounded candidate generator grows ~linearly (ratio ≈ ×" + factor + ", usually\n"
    md ++= "below — per-task constant costs amortize); an accidental all-pairs\n"
    md ++= s"stage would grow ~×${factor * factor}. Skew = max/median task ms at scale.\n\n"
    md ++= "| family | sf0.1 s | ×" + factor + " s | growth | rows ×" + factor + "/×1 | max/med task |\n"
    md ++= "|---|---|---|---|---|---|\n"
    results.foreach { f =>
      val rowsR =
        if (f.base.rows == 0) "—"
        else f"${f.scaled.rows.toDouble / f.base.rows}%.1f×"
      md ++= f"| ${f.name} | ${f.base.sec}%.2f | ${f.scaled.sec}%.2f | ${f.ratio}%.1f× | $rowsR | ${f.skew}%.1f |\n"
    }
    // the fixed-centroid IVF rows are the deliberate counter-example (see
    // the sizing-rule comment above); the envelope verdict covers the
    // production-shaped runs.
    // The envelope compares time growth against WORK growth, not the raw
    // replica factor: the interleaved-name part corpus is artifact-DENSE
    // (2/3 of each gram is scaffold, so trigram Jaccard inflates and the
    // ×10 pair graph carries ~64× the true pairs) — a pair-finder whose
    // wall time grows 17× while its output grows 64× is SUB-linear per
    // unit of work, and flagging it "superlinear vs ×10" would be wrong.
    val (demo, prod) = results.partition(_.name.endsWith("_fixed8"))
    def workGrowth(f: Family): Double =
      math.max(factor.toDouble,
        if (f.base.rows == 0) factor.toDouble
        else f.scaled.rows.toDouble / f.base.rows)
    val worst = prod.maxBy(f => f.ratio / workGrowth(f))
    md ++= f"\nWorst production-path time-vs-work growth: `${worst.name}` at ${worst.ratio}%.1f× time"
    md ++= f" for ${workGrowth(worst)}%.1f× work (×$factor data)"
    md ++= (if (worst.ratio <= 2.0 * workGrowth(worst))
      " — within the ~linear envelope (time ≤ 2× work).\n"
    else " — SUPERLINEAR in its own workload; investigate before scaling further.\n")
    demo.foreach { f =>
      md ++= f"\n`${f.name}` (catalog-constant quantizer, ${f.ratio}%.1f×, max task "
      md ++= s"${f.scaled.maxTaskMs} ms) is the deliberate counter-example: "
      md ++= "within-cell pair work is quadratic in cell width, so a quantizer "
      md ++= "NOT sized ∝ corpus goes superlinear — the `_scaled` row above is "
      md ++= "the same operator with the documented `numCentroids ∝ N` sizing.\n"
    }
    md ++= "\nGenerated by `sbt \"runMain graft.Stress\"` on " +
      java.time.LocalDate.now() + ".\n"
    if (only.isEmpty) {
      // preserve everything this main does NOT own: the hand-written
      // `### ×100 spot-stress` / closing-notes subsections between the
      // pair-finder table and the index-maintenance section (measured
      // STRESS_ONLY evidence written up by hand — a full re-run must not
      // silently drop second-decade rows), and the index-maintenance
      // section StressIndex owns. Cut point = the first of either.
      val p = java.nio.file.Paths.get("STRESS.md")
      val tail =
        if (java.nio.file.Files.exists(p)) {
          val existing = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          val cuts = Seq(existing.indexOf("### ×100 spot-stress"),
            existing.indexOf(StressIndex.SectionMarker)).filter(_ >= 0)
          if (cuts.isEmpty) "" else "\n" + existing.substring(cuts.min)
        } else ""
      java.nio.file.Files.writeString(p, md.toString + tail)
    } else println("STRESS_ONLY set: STRESS.md NOT overwritten (partial run)")
    println(s"wrote STRESS.md; scaled input in $scaledDir (Scratch-managed, deleted at exit)")
    spark.stop()
  }
}
