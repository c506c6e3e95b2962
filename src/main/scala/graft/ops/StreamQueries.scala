package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.io.Tables
import graft.streaming.Streams

/** Structured Streaming operator catalog. Each query lands the events table
  * in a temp directory, streams it back with Trigger.AvailableNow, runs the
  * streaming operator to completion, and returns the materialized result —
  * so the SAME DuckDB oracles that check batch queries check the streaming
  * path. The temp-dir round-trip is test scaffolding; the operators under
  * test (file source, watermarked agg, stateful dedup, sessionization,
  * checkpointed file sink) are the production shapes.
  */
object StreamQueries {

  /** Land events (micros ts, post nanos conversion) for the file source —
    * memoized per sf dir so the four streaming queries share one landing
    * instead of rewriting the same input each. */
  private val landed = scala.collection.concurrent.TrieMap.empty[String, String]
  private def landEvents(s: org.apache.spark.sql.SparkSession, d: String): (String, DataFrame) = {
    val ev = Tables.events(s, d)
    val dir = landed.getOrElseUpdate(d, {
      val out = graft.util.Scratch.dir("graft_stream_src_")
      ev.write.mode("overwrite").parquet(out)
      out
    })
    (dir, ev)
  }

  /** Watermarked hourly windowed aggregation (streaming twin of q20).
    * Complete output mode so the final (not-yet-watermark-closed) windows
    * are still emitted — which is what makes the result comparable to the
    * batch oracle; append-mode finalization semantics are spec-tested. */
  private val q70StreamHourly: Q = (s, d) => {
    import s.implicits._
    val (dir, ev) = landEvents(s, d)
    val stream = Streams.parquetStream(s, dir, ev.schema)
    Streams.runToMemory(s, Streams.hourlyCounts(stream), OutputMode.Complete(),
        statePartitions = 8)
      .orderBy($"hour", $"event_type")
  }

  /** Streaming exact dedup: per-key state drops repeats across the stream.
    * Gated on the ROCKSDB state store — the 100 TB keyed-state provider
    * (native memory + disk instead of on-heap), so the scale configuration
    * itself is oracle-checked, not just spec-exercised. */
  private val q71StreamDedup: Q = (s, d) => {
    import s.implicits._
    val (dir, ev) = landEvents(s, d)
    val stream = Streams.parquetStream(s, dir, ev.schema)
    Streams.runToMemory(s, Streams.dedupKeys(stream, Seq("user_id", "event_type")),
        statePartitions = 8, rocksDb = true)
      .orderBy($"user_id", $"event_type")
  }

  /** Gap-based sessionization via flatMapGroupsWithState (30-minute gap). */
  private val q72StreamSessionize: Q = (s, d) => {
    import s.implicits._
    val (dir, ev) = landEvents(s, d)
    val stream = Streams.parquetStream(s, dir, ev.schema)
      .select($"user_id", $"ts").as[Streams.Ev]
    Streams.runToMemory(s, Streams.sessionize(stream, gapMinutes = 30).toDF(),
        statePartitions = 8)
      .orderBy($"user_id", $"session_start")
  }

  /** Checkpointed parquet file sink — the production output path (append
    * mode, exactly-once via the checkpoint manifest), read back as batch. */
  private val q73StreamSink: Q = (s, d) => {
    import s.implicits._
    val (dir, ev) = landEvents(s, d)
    val outDir = graft.util.Scratch.dir("graft_stream_out_")
    val ckDir = graft.util.Scratch.dir("graft_stream_ck_")
    val stream = Streams.parquetStream(s, dir, ev.schema)
      .select($"event_id", $"user_id", $"event_type", $"value")
    Streams.runToParquet(stream, outDir, ckDir)
    s.read.parquet(outDir).orderBy($"event_id")
  }

  /** F4 at scale: copy-on-write bucketed MERGE. Three availableNow runs
    * against one checkpoint: (1) full orders as the initial base, (2) an
    * update batch (every 10th key gets o_custkey+1000000) that must rewrite
    * only the buckets it touches, (3) a re-run with no new files — the
    * checkpoint makes it a no-op, so the oracle equality also proves
    * idempotence. Bucket layout + touched-bucket physical assertion are
    * spec-tested (`StreamingSpec`); this gates the merged RESULT. */
  private val q90MergeBucketed: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
    val src = graft.util.Scratch.dir("graft_imb90_src_")
    val tgt = graft.util.Scratch.dir("graft_imb90_tgt_") + "/base"
    val ck = graft.util.Scratch.dir("graft_imb90_ck_")
    def merge(): Unit = Streams.incrementalMergeBucketed(
      Streams.parquetStream(s, s"$src/*", orders.schema), tgt, "o_orderkey", ck,
      numBuckets = 16)
    orders.write.parquet(s"$src/f1")
    merge()
    orders.filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", ($"o_custkey" + 1000000L).as("o_custkey"))
      .write.parquet(s"$src/f2")
    merge()
    merge() // no new files: exactly-once no-op
    Streams.readMergedBase(s, tgt).orderBy($"o_orderkey")
  }

  /** F2+F4 streaming e2e — near-real-time full-text search: documents
    * stream in (availableNow file source), `Streams.maintainPostingIndex`
    * keeps the on-disk bucketed index current (touched-bucket COW appends),
    * and the final search must answer exactly like an index built fresh
    * over the whole corpus (q89's oracle). The third run consumes no new
    * files — checkpoint exactly-once makes it a no-op, so oracle equality
    * also proves the no-duplicate-posting property (a dup would break the
    * AND count). */
  private val q107StreamIndex: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val src = graft.util.Scratch.dir("graft_sidx_src_")
    val idx = graft.util.Scratch.dir("graft_sidx_idx_") + "/idx"
    val ck = graft.util.Scratch.dir("graft_sidx_ck_")
    def run(): Unit = graft.streaming.Streams.maintainPostingIndex(
      graft.streaming.Streams.parquetStream(s, s"$src/*", docs.schema),
      idx, "doc_id", "text", ck, buckets = 16)
    docs.filter($"doc_id" % 3 === 0).write.parquet(s"$src/f1")
    run()
    docs.filter($"doc_id" % 3 === 1).write.parquet(s"$src/f2")
    docs.filter($"doc_id" % 3 === 2).write.parquet(s"$src/f3")
    run()
    run() // no new files: exactly-once no-op
    graft.text.PostingIndex.searchAllIndexed(s, idx, "doc_id",
      Seq("merges", "joining"), buckets = 16)
      .orderBy($"doc_id")
  }

  /** q107's POSITIONAL twin — near-real-time search with PHRASE power: the
    * streamed index carries per-posting positions
    * (`Streams.maintainPostingIndex(positional = true)` →
    * `PostingIndex.appendToIndexPositional`), so `hash <-> join` runs its
    * adjacency joins over the bucket-pruned maintained index and must
    * answer exactly like a fresh full-corpus positional build (q91's
    * oracle — one truth for the phrase semantics on either path). */
  private val q119StreamPhrase: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val src = graft.util.Scratch.dir("graft_spidx_src_")
    val idx = graft.util.Scratch.dir("graft_spidx_idx_") + "/idx"
    val ck = graft.util.Scratch.dir("graft_spidx_ck_")
    def run(): Unit = graft.streaming.Streams.maintainPostingIndex(
      graft.streaming.Streams.parquetStream(s, s"$src/*", docs.schema),
      idx, "doc_id", "text", ck, buckets = 16, positional = true)
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$src/f1")
    run()
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$src/f2")
    run()
    graft.text.PostingIndex.searchQueryIndexed(s, idx, "doc_id",
      "hash <-> join", docs.select($"doc_id"), buckets = 16)
      .orderBy($"doc_id")
  }

  /** q107's UPDATE leg — the reference's actual steady state: the scrape
    * loop lands a filing's text by UPDATE (`scrape_all_filings.py:169-171`)
    * and the tsvector trigger must REPLACE its postings, not append
    * (`init_tables.py:59-67` fires BEFORE UPDATE OR INSERT). The index
    * starts at the shared corrupted-v1 fixture (the `%5==0` slice carries
    * a " merges joining" suffix — every such doc a ghost search hit);
    * batch 1 re-scrapes the slice with its TRUE text through
    * `maintainPostingIndex(mode = "upsert")`, whose delete sweep must
    * evict the ghosts; run 2 consumes nothing (checkpoint no-op). The
    * final corpus is exactly `documents`, so the gate is the same shared
    * fresh-build oracle as q37/q89/q106/q107 — ghosts are extra rows. */
  private val q124StreamUpsert: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val src = graft.util.Scratch.dir("graft_suidx_src_")
    // the corrupted-v1 state is the SHARED memoized bootstrap fixture
    // (see TextQueries.corruptedIndexCopy — what this query gates is the
    // streamed UPSERT's ghost eviction, not the bootstrap write, which
    // q107/q119 gate through the stream); the maintenance loop sees an
    // EXISTING index and every micro-batch rides the upsert leg
    val idx = TextQueries.corruptedIndexCopy(s, d, "graft_suidx_idx_")
    val ck = graft.util.Scratch.dir("graft_suidx_ck_")
    def run(): Unit = graft.streaming.Streams.maintainPostingIndex(
      graft.streaming.Streams.parquetStream(s, s"$src/*", docs.schema),
      idx, "doc_id", "text", ck, buckets = 16, mode = "upsert")
    docs.filter($"doc_id" % 5 === 0).write.parquet(s"$src/f1") // the re-scrape
    run()
    run() // no new files: exactly-once no-op
    graft.text.PostingIndex.searchAllIndexed(s, idx, "doc_id",
      Seq("merges", "joining"), buckets = 16)
      .orderBy($"doc_id")
  }

  /** q124's PENDING-LIST twin (round-12 VERDICT item 1) — the reference's
    * steady-state re-scrape (`scrape_all_filings.py:169-171` UPDATEs fire
    * the tsvector trigger, `init_tables.py:59-67`) through
    * `maintainPostingIndex(mode = "buffered")`: each micro-batch appends
    * ~delta-sized postings to the GIN-fastupdate pending list instead of
    * COW-rewriting every touched bucket (84× less per batch at the ×100
    * stress scale, STRESS.md). The corrupted corpus is the shared
    * memoized bootstrap fixture; batch 1 is a buffered GHOST edit that
    * still matches the search; batch 2 the true re-scrape — so streamed
    * latest-batch-wins is load-bearing; run 3 consumes nothing
    * (checkpoint no-op). The result
    * is the search through the pending OVERLAY read INTERSECTED with the
    * same search after [[graft.text.PostingIndex.compactPending]] folds
    * the streamed batches into the base — divergence between the two
    * read paths, a leaked ghost, or a lost edit breaks the intersection
    * against the same fresh-build oracle as q37/q89/q106/q124. */
  private val q365StreamBuffered: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val src = graft.util.Scratch.dir("graft_sbidx_src_")
    // shared memoized corrupted-v1 bootstrap (see q124StreamUpsert /
    // TextQueries.corruptedIndexCopy): every micro-batch below rides the
    // BUFFERED pending-list leg against the existing index
    val idx = TextQueries.corruptedIndexCopy(s, d, "graft_sbidx_idx_")
    val ck = graft.util.Scratch.dir("graft_sbidx_ck_")
    def run(): Unit = graft.streaming.Streams.maintainPostingIndex(
      graft.streaming.Streams.parquetStream(s, s"$src/*", docs.schema),
      idx, "doc_id", "text", ck, buckets = 16, mode = "buffered")
    docs.filter($"doc_id" % 5 === 0) // buffered ghost edit — still a hit
      .withColumn("text", lit("still merges joining ghost"))
      .write.parquet(s"$src/f1")
    run()
    docs.filter($"doc_id" % 5 === 0).write.parquet(s"$src/f2") // re-scrape
    run()
    run() // no new files: exactly-once no-op
    val pre = graft.text.PostingIndex.searchAllIndexed(s, idx, "doc_id",
      Seq("merges", "joining"), buckets = 16).localCheckpoint(true)
    graft.text.PostingIndex.compactPending(s, idx, "doc_id", buckets = 16)
    val post = graft.text.PostingIndex.searchAllIndexed(s, idx, "doc_id",
      Seq("merges", "joining"), buckets = 16)
    ExtQueriesShared.gatedIntersect(pre, post, "q365").orderBy($"doc_id")
  }

  /** q90's BATCHED-DELTA twin (round-13 VERDICT item 7 — the wide-delta
    * remedy as machinery, not advice): the q90 delta10pct boundary is a
    * property of the delta (keys ≫ buckets ⇒ the COW merge IS a near-full
    * rewrite), and k sequential wide batches pay it k times. With
    * `batchDeltas = true`, `incrementalMergeBucketed` PARKS each
    * micro-batch in a `_pending` area (~delta-sized append, zero bucket
    * rewrites — the q363 pending-list design on the KV base) and
    * [[graft.streaming.Streams.foldMergePending]] folds them through ONE
    * COW merge. Batch 2 updates every 10th key; batch 3 updates every
    * 20th AGAIN (overlapping keys), so cross-batch latest-wins in both
    * the overlay read and the fold is load-bearing. The result is the
    * overlay read INTERSECTED with the post-fold read under the
    * equal-count gate ([[ExtQueriesShared.gatedIntersect]]) — a lost
    * parked update or mis-folded key breaks the intersection against the
    * plain-SQL merge oracle, and a LEAKED stale row (which a bare set
    * intersect would silently drop) breaks the count gate. */
  private val q367MergeBatched: Q = (s, d) => {
    import s.implicits._
    val orders = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
    val src = graft.util.Scratch.dir("graft_imb367_src_")
    val tgt = graft.util.Scratch.dir("graft_imb367_tgt_") + "/base"
    val ck = graft.util.Scratch.dir("graft_imb367_ck_")
    def merge(): Unit = Streams.incrementalMergeBucketed(
      Streams.parquetStream(s, s"$src/*", orders.schema), tgt, "o_orderkey", ck,
      numBuckets = 16, batchDeltas = true, foldAboveBytes = Long.MaxValue)
    orders.write.parquet(s"$src/f1")
    merge() // bootstrap (the base write itself; nothing to park yet)
    orders.filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", ($"o_custkey" + 1000000L).as("o_custkey"))
      .write.parquet(s"$src/f2")
    merge() // parked, no bucket rewrite
    orders.filter($"o_orderkey" % 20 === 0)
      .select($"o_orderkey", ($"o_custkey" + 2000000L).as("o_custkey"))
      .write.parquet(s"$src/f3")
    merge() // parked over batch 2's keys: latest-wins must supersede
    merge() // no new files: exactly-once no-op
    // materialize the overlay read BEFORE the fold deletes the pending
    // files it lazily references (the epoch guard turns staleness into a
    // named error; materializing is the documented remedy)
    val pre = Streams.readMergedBase(s, tgt).localCheckpoint(true)
    Streams.foldMergePending(s, tgt, "o_orderkey", numBuckets = 16)
    val post = Streams.readMergedBase(s, tgt)
    ExtQueriesShared.gatedIntersect(pre, post, "q367").orderBy($"o_orderkey")
  }

  /** F4/streaming at its hardest: CROSS-BATCH stateful sessionization gated
    * against the same gaps-and-islands oracle as q72. Events land as three
    * time-sliced files consumed one per micro-batch (maxFilesPerTrigger=1),
    * so sessions spanning a slice boundary MUST merge in GroupState; two
    * far-future sentinel batches then push the watermark past every
    * session's end+gap so the event-time timeout flushes the final open
    * sessions. Oracle equality therefore proves cross-batch merge AND
    * timeout flush — not just single-batch math (which q72 already gates). */
  private val q94StatefulSessions: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select($"user_id", $"ts")
    val src = graft.util.Scratch.dir("graft_sess94_")
    // scaffolding: one file per time slice (repartition(1)) so mod-time
    // order == event-time order and each slice is exactly one micro-batch
    val w = org.apache.spark.sql.expressions.Window.orderBy($"ts")
    val sliced = ev.withColumn("slice", ntile(3).over(w)).cache()
    try {
      (1 to 3).foreach { i =>
        sliced.filter($"slice" === i).drop("slice")
          .repartition(1).write.parquet(s"$src/f$i")
      }
      val maxTs = sliced.agg(max($"ts")).head().getTimestamp(0)
      // watermark moves at batch END and timeouts fire on the NEXT batch —
      // hence TWO sentinel files, both far past max+gap (gap=30m)
      Seq(1, 2).foreach { i =>
        Seq((-1L, new java.sql.Timestamp(maxTs.getTime + (60 + i) * 60000L)))
          .toDF("user_id", "ts").repartition(1).write.parquet(s"$src/s$i")
      }
    } finally sliced.unpersist()
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      .as[Streams.Ev]
    // 1-minute delay covers equal-ts rows split across a slice boundary;
    // sentinels sit 61 minutes past max so timeouts still fire under it.
    // statePartitions: state-store commits dominate this query's cost
    // (5 micro-batches × one commit per shuffle partition).
    Streams.runToMemory(s,
        Streams.sessionizeStateful(stream, gapMinutes = 30,
          watermarkDelay = "1 minute").toDF(),
        statePartitions = 8)
      .filter($"user_id" >= 0)
      .orderBy($"user_id", $"session_start")
  }

  /** Stream-stream INNER interval join (clicks ⋈ purchases within 30
    * minutes per user) — the one Structured Streaming join shape the
    * catalog lacked: two INDEPENDENT readStream sources (a genuine
    * two-stream join, not a self-join rewrite), watermarks on both sides,
    * range-bounded state eviction. The batch interval-join oracle pins
    * completeness: a dropped buffered row would lose pairs, an eviction
    * bug would duplicate them. See [[Streams.conversionPairs]]. */
  private val q138StreamJoin: Q = (s, d) => {
    import s.implicits._
    val (dir, ev) = landEvents(s, d)
    val clicks = Streams.parquetStream(s, dir, ev.schema)
      .filter($"event_type" === "click")
    val buys = Streams.parquetStream(s, dir, ev.schema)
      .filter($"event_type" === "purchase")
    Streams.runToMemory(s, Streams.conversionPairs(clicks, buys, withinMinutes = 30),
        statePartitions = 8)
      .orderBy($"click_id", $"buy_id")
  }

  /** Sketch contract #5 — INCREMENTAL frequency: q148's count-min sketch
    * maintained as STREAMING STATE. Documents stream in over multiple
    * micro-batches (two file-source batches under one AvailableNow run);
    * the [[graft.ext.CountMin.SketchAgg]] UDAF buffer lives in the state
    * store and absorbs each batch. The gate measures, per exact-top-10
    * token, (a) both CMS error contracts AND (b) that the streamed sketch's
    * estimate EQUALS the batch sketch's — CMS merge is associative, so any
    * micro-batching must produce the identical grid; a state-store
    * serialization bug or a dropped batch breaks the equality, not just
    * the bound. This is the 100 TB incremental path: the sketch ingests
    * forever, rollups never re-read rows. */
  private val q152StreamCms: Q = (s, d) => {
    import s.implicits._
    import graft.ext.{CountMin, TextAnalysis}
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val src = graft.util.Scratch.dir("graft_scms_src_")
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$src/f1")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$src/f2")
    val cms = udaf(new CountMin.SketchAgg(), org.apache.spark.sql.Encoders.STRING)
    val stoks = Streams.parquetStream(s, s"$src/*", docs.schema)
      .select(explode(TextAnalysis.words($"text")).as("tok"))
    val streamed = Streams.runToMemory(s,
        stoks.groupBy().agg(cms($"tok").as("ssk")),
        OutputMode.Complete(), statePartitions = 8)
    val btoks = docs.select(explode(TextAnalysis.words($"text")).as("tok"))
    val batch = btoks.agg(count(lit(1)).as("n_total"), cms($"tok").as("bsk"))
    val top10 = btoks.groupBy($"tok").agg(count(lit(1)).as("n_exact"))
      .orderBy($"n_exact".desc, $"tok".asc).limit(10)
    val est = udf((sk: Seq[Long], tok: String) => CountMin.estimate(sk.toIndexedSeq, tok))
    top10.crossJoin(broadcast(batch)).crossJoin(broadcast(streamed))
      .select($"tok", $"n_exact",
        est($"ssk", $"tok").as("e_s"), est($"bsk", $"tok").as("e_b"), $"n_total")
      .select($"tok", $"n_exact",
        ($"e_s" >= $"n_exact").as("overestimate_ok"),
        // deterministic gates carry the contract (never-undercount +
        // incremental==batch); the probabilistic error bound is widened 4×
        // (q148's convention) so a skewed regenerated corpus can't flake it
        ($"e_s" <= $"n_exact" + lit(4.0 * CountMin.Eps) * $"n_total").as("bound_ok"),
        ($"e_s" === $"e_b").as("incremental_matches_batch"))
      .orderBy($"n_exact".desc, $"tok".asc)
  }

  /** STREAMING weighted reservoir sampling — q176's A-ES sampler run as a
    * Structured Streaming aggregate: the corpus arrives as two
    * micro-batch files and each source's sample is maintained by the
    * mergeable bounded [[Aggregators.TopKByKeyAgg]] buffer (state = at
    * most k rows per group, shuffled as partial buffers, never raw docs —
    * the property that lets a 100 TB stream keep a living sample in O(k)
    * state per source). Because the A-ES keys are deterministic
    * (sqrt-chain over dyadic md5 u), the streaming state after the final
    * micro-batch must equal the batch sample EXACTLY — so this gates
    * against the very same oracle SQL as q176, the strongest
    * stream/batch-equivalence form in the catalog (q152's CMS analog,
    * but value-exact rather than sketch-exact). */
  private val q182StreamReservoir: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val keyed = ExtQueriesShared.weightedKeyedDocs(s, d)
    val src = graft.util.Scratch.dir("graft_swrs_src_")
    keyed.filter($"doc_id" % 2 === 0).write.parquet(s"$src/f1")
    keyed.filter($"doc_id" % 2 === 1).write.parquet(s"$src/f2")
    val topk = udaf(new Aggregators.TopKByKeyAgg(5),
      ExpressionEncoder[Aggregators.KeyedDoc]())
    val res = Streams.runToMemory(s,
      Streams.parquetStream(s, s"$src/*", keyed.schema)
        .groupBy($"source")
        .agg(topk($"wkey", $"doc_id", $"weight").as("picks")),
      OutputMode.Complete(), statePartitions = 8)
    res.select($"source", posexplode($"picks").as(Seq("pos", "p")))
      .select($"source", ($"pos" + 1).cast("int").as("rank"),
        $"p.doc_id".as("doc_id"), $"p.weight".as("weight"), $"p.wkey".as("wkey"))
      .orderBy($"source", $"rank")
  }

  /** STREAM-STATIC enrichment join — the remaining core streaming join
    * shape (q138 covers stream-stream): the events stream joins a static
    * broadcast dimension (customer) row-by-row as micro-batches arrive,
    * then aggregates per segment. On a cluster the dimension broadcasts
    * once and every micro-batch probes it map-side — no stream-side
    * shuffle for the join itself. Complete-mode windowless agg so the
    * final table compares against the batch oracle exactly. */
  private val q164StreamEnrich: Q = (s, d) => {
    import s.implicits._
    val (dir, ev) = landEvents(s, d)
    val dim = Tables.customer(s, d).select($"c_custkey", $"c_mktsegment")
    val stream = Streams.parquetStream(s, dir, ev.schema)
    val agg = stream.join(broadcast(dim), $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"), money(sum(dec($"value"))).as("sum_value"))
    Streams.runToMemory(s, agg, OutputMode.Complete(), statePartitions = 8)
      .orderBy($"c_mktsegment")
  }

  /** q138's LEFT-OUTER twin — null-emission + state-eviction semantics:
    * clicks with no purchase in-window emit with null buy columns, but
    * only after the watermark passes their window; the AvailableNow
    * no-data final micro-batch advances the watermark past the last
    * event, flushing trailing unmatched clicks. Gate = exact equality
    * with the batch left-outer join, which fails if eviction never
    * fires (missing rows) OR fires early (phantom null rows). */
  private val q166StreamOuterJoin: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    // Outer-join state for a click can only flush once the watermark
    // passes its join window; the last real clicks' windows end AFTER the
    // final watermark (max event time − delay), so with real data alone
    // they'd sit in state forever and the batch equality would miss rows.
    // The standard fix: one far-future sentinel per SIDE (the global
    // watermark is the min across streams) pushes the watermark past
    // every real window. The +10h click sentinel DOES flush (as an
    // unmatched left row once the +20h purchase pushes the watermark past
    // it) — the user_id filter below is what excludes sentinel rows from
    // the output, and is therefore load-bearing.
    val maxTs = ev.agg(max($"ts")).head.getTimestamp(0)
    def plusH(h: Int) = new java.sql.Timestamp(maxTs.getTime + h * 3600 * 1000L)
    val sentinels = Seq(
      (-1L, plusH(10), -1L, "click", 0.0, "{}"),
      (-2L, plusH(20), -1L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = graft.util.Scratch.dir("graft_q166_src_")
    ev.unionByName(sentinels).write.parquet(s"$dir/events")
    val src = s"$dir/events"
    val clicks = Streams.parquetStream(s, src, ev.schema)
      .filter($"event_type" === "click")
    val buys = Streams.parquetStream(s, src, ev.schema)
      .filter($"event_type" === "purchase")
    Streams.runToMemory(s,
        Streams.conversionPairsOuter(clicks, buys, withinMinutes = 30),
        statePartitions = 8)
      .filter($"user_id" =!= -1L)
      .orderBy($"click_id", $"buy_id")
  }

  /** DECLARATIVE SESSIONIZATION via Spark's native `session_window` —
    * the Catalyst-planned twin of q72's hand-rolled
    * flatMapGroupsWithState: the merging-session-window operator handles
    * state, merge-on-overlap, and watermark eviction inside the engine
    * (append mode emits a session only once the watermark passes its
    * close), so there is no user state code to get wrong and the state
    * size is O(open sessions), not O(events). Spark's merge rule is
    * OVERLAP (an event at exactly start+gap opens a NEW session — window
    * end is exclusive), so the oracle's island rule is `gap >= 30min`,
    * one boundary STRICTER than q72's `>`-rule — the two queries pin
    * both semantics. The +10h sentinel pushes the final watermark past
    * every real session close (its own open session is never emitted and
    * the user filter excludes it regardless); session_close = last event
    * + gap, per the operator's definition. */
  private val q210SessionWindow: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val maxTs = ev.agg(max($"ts")).head.getTimestamp(0)
    val sentinel = Seq(
      (-1L, new java.sql.Timestamp(maxTs.getTime + 10L * 3600 * 1000), -1L,
        "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = graft.util.Scratch.dir("graft_q210_src_")
    ev.unionByName(sentinel).write.parquet(s"$dir/events")
    val stream = Streams.parquetStream(s, s"$dir/events", ev.schema)
    Streams.runToMemory(s,
        stream.withWatermark("ts", "2 hours")
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id", $"w.start".as("session_start"),
            $"w.end".as("session_close"), $"n_events"),
        statePartitions = 8)
      .filter($"user_id" =!= -1L)
      .orderBy($"user_id", $"session_start")
  }

  /** BOUNDED-STATE STREAMING DEDUP via `dropDuplicatesWithinWatermark` —
    * the 100 TB/day fix for q71's unbounded `dropDuplicates` (whose state
    * holds every key ever seen, forever): entries expire once the
    * watermark passes their event time + delay, so state is O(keys per
    * horizon), not O(stream). The API guarantees exact dedup for
    * duplicates arriving within the horizon — which covers the finite
    * replay entirely, so the result equals global DISTINCT; only the key
    * columns are published (which surviving representative row is
    * arrival-order-dependent, the keys are not). RocksDB state store, as
    * the at-scale configuration. */
  private val q211DedupWatermark: Q = (s, d) => {
    import s.implicits._
    val (dir, ev) = landEvents(s, d)
    val stream = Streams.parquetStream(s, dir, ev.schema)
    Streams.runToMemory(s,
        stream.withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark("user_id", "event_type"),
        statePartitions = 8, rocksDb = true)
      .select($"user_id", $"event_type")
      .orderBy($"user_id", $"event_type")
  }

  /** DYNAMIC-GAP SESSION WINDOWS — q210's merging operator with a
    * PER-EVENT gap expression (clicks cool off in 10 min, views 20,
    * everything else 30): each event contributes window [ts, ts+gap),
    * sessions merge on overlap, close = max end among merged events.
    * The oracle derives the same semantics relationally: new-session
    * iff ts ≥ running max of all PRIOR ends (per user) — pinning
    * Spark's merge rule for expression gaps, not just constant ones.
    * Same sentinel-finalization and watermark shape as q210. */
  private val q247DynamicSession: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val maxTs = ev.agg(max($"ts")).head.getTimestamp(0)
    val sentinel = Seq(
      (-1L, new java.sql.Timestamp(maxTs.getTime + 10L * 3600 * 1000), -1L,
        "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = graft.util.Scratch.dir("graft_q247_src_")
    ev.unionByName(sentinel).write.parquet(s"$dir/events")
    val gap = when($"event_type" === "click", "10 minutes")
      .when($"event_type" === "view", "20 minutes")
      .otherwise(lit("30 minutes"))
    val stream = Streams.parquetStream(s, s"$dir/events", ev.schema)
    Streams.runToMemory(s,
        stream.withWatermark("ts", "2 hours")
          .groupBy($"user_id", session_window($"ts", gap).as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id", $"w.start".as("session_start"),
            $"w.end".as("session_close"), $"n_events"),
        statePartitions = 8)
      .filter($"user_id" =!= -1L)
      .orderBy($"user_id", $"session_start")
  }

  /** ARBITRARY STATEFUL PROCESSING via `transformWithState` — the Spark 4
    * state API ([[Streams.UserAggProcessor]]): per-user aggregates in a
    * named, individually-TTL-able ValueState on the ROCKSDB provider (the
    * API requires it — state in native memory + disk, the only provider
    * shape that survives 100 TB keyed state). The finite replay lands as
    * one availableNow batch (≤ maxFilesPerTrigger files), so the emitted
    * per-key row IS the global aggregate and the DuckDB group-by is an
    * exact oracle; cross-batch accumulation semantics are the processor's
    * state-merge path, exercised by the multi-batch spec. */
  /** STREAMING GROWTH ACCOUNTING — q320's four-way user-state flow as a
    * live pipeline: events stream in as three day-contiguous micro-batches
    * (maxFilesPerTrigger=1, the q94 scaffold), and a
    * [[Streams.GrowthProcessor]] classifies each user-day as
    * new/retained/resurrected against a per-user last-active-day
    * ValueState on RocksDB. The batch oracle (the q320 lag construction)
    * gates CROSS-BATCH state correctness: a user active in slice 1 and
    * again in slice 3 classifies `resurrected` only if the store carried
    * their last day across two micro-batch commits. */
  private val q332StreamGrowth: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val ud = Tables.events(s, d)
      .select($"user_id",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("epoch_day"))
      .distinct()
    val src = graft.util.Scratch.dir("graft_growth332_")
    // 3 slices cut on DAY boundaries (a split day would hide the
    // cross-batch transition this query exists to prove)
    val days = ud.select($"epoch_day").distinct()
      .withColumn("di",
        row_number().over(Window.orderBy($"epoch_day")) - 1)
    val nd = days.count()
    val sliced = ud.join(broadcast(days), "epoch_day")
      .withColumn("slice", expr(s"(di * 3) div $nd")).cache()
    try {
      (0 to 2).foreach { i =>
        sliced.filter($"slice" === i).select($"user_id", $"epoch_day")
          .repartition(1).write.parquet(s"$src/f$i")
      }
    } finally sliced.unpersist()
    pinSliceMtimes(src, 3)
    val stream = s.readStream
      .schema(sliced.select($"user_id", $"epoch_day").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      .as[Streams.UserDay]
    val res = Streams.runToMemory(s,
      stream.groupByKey(_.user_id)
        .transformWithState(new Streams.GrowthProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF(),
      mode = OutputMode.Update(), statePartitions = 8, rocksDb = true)
    res.groupBy($"epoch_day", $"state")
      .agg(count(lit(1)).as("n_users"))
      .select(
        expr("cast(date_add(DATE'1970-01-01', cast(epoch_day as int)) as string)")
          .as("day"),
        $"state", $"n_users")
      .orderBy($"day", $"state")
  }

  /** Pin strictly increasing modification times on slice dirs' files:
    * FileStreamSource orders new files by mtime, and on a coarse-
    * granularity filesystem (1 s ext3, 2 s FAT-backed mounts) three
    * just-written tiny slices can TIE, which would reorder the
    * micro-batches of order-DEFINED streams (q332's growth transitions,
    * q348's SPRT cumulation) and hash-mismatch their batch oracles.
    * Explicit mtimes make write order the processing order by
    * construction; the absolute epoch is irrelevant, only the order. */
  private def pinSliceMtimes(src: String, slices: Int): Unit =
    (0 until slices).foreach { i =>
      val t = java.nio.file.attribute.FileTime.fromMillis(
        1700000000000L + i * 60000L)
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(src, s"f$i"))
      try walk.forEach(p => java.nio.file.Files.setLastModifiedTime(p, t))
      finally walk.close()
    }

  /** STREAMING SPRT MONITOR — q347's always-valid A/B test running on
    * arrival: daily (arm, day, n, c) counts stream in as 3 day-boundary
    * micro-batches, `transformWithState` holds the per-arm cumulative
    * (trials, successes) pair on RocksDB across batches, and the emitted
    * daily grid folds into the SAME crossing/decision algebra as q347 —
    * so the batch oracle ([[ExtQueriesShared.sprtOracleSql]]) gates the
    * streaming state machine bit-for-bit: a lost batch, a double-applied
    * batch, or a within-batch ordering bug each shift some day's
    * cumulative LLR and hash-mismatch. Slices cut on DAY boundaries
    * (q332's rule) because SPRT cumulation is order-defined.
    *
    * 100 TB shape: the streamed rows are the (arm, day) VALUE-DOMAIN
    * grid (pre-aggregated per batch, map-side combinable), keyed state is
    * two 16-byte pairs, and the decision fold runs over ≤ 2×|days|
    * rows. */
  private val q348StreamSprt: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.streaming.TimeMode
    import ExtQueriesShared.{SprtIncSuccess, SprtIncFailure, SprtBoundary}
    val daily = Tables.events(s, d)
      .select(($"user_id" % 2 === 0).as("arm_a"),
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("epoch_day"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("succ"))
      .groupBy($"arm_a", $"epoch_day")
      .agg(count(lit(1)).as("n"), sum($"succ").as("c"))
    val src = graft.util.Scratch.dir("graft_sprt348_")
    val days = daily.select($"epoch_day").distinct()
      .withColumn("di", row_number().over(Window.orderBy($"epoch_day")) - 1)
    val nd = days.count()
    val sliced = daily.join(broadcast(days), "epoch_day")
      .withColumn("slice", expr(s"(di * 3) div $nd")).cache()
    try {
      (0 to 2).foreach { i =>
        sliced.filter($"slice" === i)
          .select($"arm_a", $"epoch_day", $"n", $"c")
          .repartition(1).write.parquet(s"$src/f$i")
      }
    } finally sliced.unpersist()
    pinSliceMtimes(src, 3)
    val stream = s.readStream
      .schema(sliced.select($"arm_a", $"epoch_day", $"n", $"c").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      .as[Streams.ArmDayCount]
    val cum = Streams.runToMemory(s,
      stream.groupByKey(_.arm_a)
        .transformWithState(new Streams.SprtProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF(),
      mode = OutputMode.Update(), statePartitions = 8, rocksDb = true)
    // decision fold over the emitted grid — identical algebra to q347
    val grid = cum.select($"arm_a",
        expr("date_add(DATE'1970-01-01', cast(epoch_day as int))").as("day"),
        $"cn", $"cc",
        (lit(SprtIncSuccess) * $"cc"
          + lit(SprtIncFailure) * ($"cn" - $"cc")).as("llr"))
    // ONE aggregate for both the final row and the first crossing
    // (min-over-when skips non-crossing days): two branches over the
    // memory-sink view would self-join it, which its attribute dedup
    // cannot resolve
    grid.groupBy($"arm_a")
      .agg(max(struct($"day", $"cn", $"cc", $"llr")).as("f"),
        min(when(abs($"llr") >= SprtBoundary, struct($"day", $"llr"))).as("x"))
      .select($"arm_a", $"f.cn".as("n_trials"), $"f.cc".as("n_success"),
        $"f.llr".as("llr_micro_final"),
        $"x.day".as("cross_day"),
        when($"x".isNull, lit("continue"))
          .when($"x.llr" > 0, lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"))
      .orderBy($"arm_a")
  }

  private val q214TransformState: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val (dir, ev) = landEvents(s, d)
    val stream = Streams.parquetStream(s, dir, ev.schema)
      .select($"user_id", $"event_id").as[Streams.IdEv]
    Streams.runToMemory(s,
        stream.groupByKey(_.user_id)
          .transformWithState(new Streams.UserAggProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF(),
        mode = OutputMode.Update(), statePartitions = 8, rocksDb = true)
      .orderBy($"user_id")
  }

  /** The reference's actual load pattern end-to-end in streaming form
    * (scrape batches → RDBMS upsert): updates and brand-new keys stream in
    * as file batches, `foreachBatch` upserts each into a live JDBC table
    * (embedded Derby — same dialect-checked path PgLiveSpec proves on
    * PG 15), a third empty run proves checkpoint idempotence, and the
    * gate reads the final table back through JDBC. Existing keys must
    * show the updated status, new keys must have been inserted — a
    * driver that lies about update counts (SUCCESS_NO_INFO) or a
    * re-applied batch would both break the equality. */
  private val q170StreamJdbcUpsert: Q = (s, d) => {
    import s.implicits._
    val url = s"jdbc:derby:${graft.util.Scratch.dir("graft_q170_db_")}/db;create=true"
    // bounded key slice (constant rows at any sf, q42's pattern): the gate
    // proves sink SEMANTICS — upsert, insert, checkpoint idempotence —
    // not volume; single-connection RDBMS load is not the 100 TB path
    val base = Tables.orders(s, d).select($"o_orderkey", $"o_orderstatus")
      .filter($"o_orderkey" < 5000)
    base.write.jdbc(url, "orders_state", new java.util.Properties())
    val updates = base.filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", lit("X").as("o_orderstatus"))
    val inserts = base.filter($"o_orderkey" % 1000 === 1)
      .select(($"o_orderkey" + 10000000L).as("o_orderkey"), lit("N").as("o_orderstatus"))
    val src = graft.util.Scratch.dir("graft_q170_src_")
    updates.write.parquet(s"$src/b1")
    inserts.write.parquet(s"$src/b2")
    val ck = graft.util.Scratch.dir("graft_q170_ck_")
    def run(): Unit = Streams.runForeachBatch(
        Streams.parquetStream(s, s"$src/*", updates.schema), ck) { (batch, _) =>
      graft.io.Jdbc.upsertByKey(batch, url, "orders_state",
        "o_orderkey", Seq("o_orderstatus"))
    }
    run()
    run() // no new files: checkpoint makes the re-run a no-op
    graft.io.Jdbc.readTable(s, url, "orders_state")
      .toDF("o_orderkey", "o_orderstatus")
      .select($"o_orderkey".cast("long"), $"o_orderstatus")
      .orderBy($"o_orderkey")
  }

  /** STREAMING MinHash-LSH dedup — the incremental near-dup path a 100 TB
    * crawl pipeline actually runs (SlimPajama/CCNet shape: a doc is DROPPED
    * when any of its LSH band buckets is already occupied by an earlier
    * doc; candidate-level dedup, no pair verification). The streaming state
    * is the LSH BUCKET INDEX itself — per-(band, bkey) min doc_id, one tiny
    * row per non-empty bucket, maintained by a Complete-mode agg as
    * micro-batches arrive; at scale this is the living dedup index that
    * ingests forever (O(corpus×bands) keys, never a pair list). "Earlier"
    * is min doc_id, an ORDER-FREE function of the corpus — so the streamed
    * bucket table must equal a from-scratch batch build exactly, and the
    * oracle replays the whole construction (md5 base hash, the embedded
    * [[graft.ext.Dedup.MdCoefs]] affine family, comma-joined signature
    * slices as band keys — no second-level hash, so buckets collide exactly
    * when signature slices agree) in SQL. A dropped micro-batch, a state
    * merge bug, or any hash-family drift flips dup flags and
    * hash-mismatches. Movement: band rows shuffle once into the state agg;
    * the flag pass is one (band, bkey) equi-join + one doc_id groupBy. */
  private val q203StreamLshDedup: Q = (s, d) => {
    import s.implicits._
    import graft.ext.Dedup
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val src = graft.util.Scratch.dir("graft_slsh_src_")
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$src/f1")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$src/f2")
    def banded(df: DataFrame) =
      df.select($"doc_id", Dedup.shingleSet($"text", 3).as("sh"))
        .filter(size($"sh") > 0)
        .select($"doc_id",
          posexplode(Dedup.mdBandKeys(32, 8)($"sh")).as(Seq("band", "bkey")))
    val buckets = Streams.runToMemory(s,
        banded(Streams.parquetStream(s, s"$src/*", docs.schema))
          .groupBy($"band", $"bkey").agg(min($"doc_id").as("keeper")),
        OutputMode.Complete(), statePartitions = 8)
    // flag pass probes the STREAMED bucket table (not a batch rebuild) so
    // the gate exercises the state, and repartitions before the
    // shingle+minhash projection (the q42 single-split lesson)
    val flags = banded(docs.repartition($"doc_id"))
      .join(buckets, Seq("band", "bkey"))
      .groupBy($"doc_id").agg(max($"keeper" < $"doc_id").as("f"))
    docs.select($"doc_id").join(flags, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"f", lit(false)).as("is_dup"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q203_stream_lsh_dedup" -> q203StreamLshDedup,
    "q152_stream_cms"       -> q152StreamCms,
    "q182_stream_reservoir" -> q182StreamReservoir,
    "q164_stream_enrich"    -> q164StreamEnrich,
    "q166_stream_outer_join" -> q166StreamOuterJoin,
    "q170_stream_jdbc_upsert" -> q170StreamJdbcUpsert,
    "q70_stream_hourly"     -> q70StreamHourly,
    "q71_stream_dedup"      -> q71StreamDedup,
    "q72_stream_sessionize" -> q72StreamSessionize,
    "q73_stream_sink"       -> q73StreamSink,
    "q90_merge_bucketed"    -> q90MergeBucketed,
    "q94_stateful_sessions" -> q94StatefulSessions,
    "q107_stream_index"     -> q107StreamIndex,
    "q119_stream_phrase"    -> q119StreamPhrase,
    "q124_stream_upsert"    -> q124StreamUpsert,
    "q365_stream_buffered"  -> q365StreamBuffered,
    "q367_merge_batched"    -> q367MergeBatched,
    "q138_stream_join"      -> q138StreamJoin,
    "q210_session_window"   -> q210SessionWindow,
    "q211_dedup_watermark"  -> q211DedupWatermark,
    "q214_transform_state"  -> q214TransformState,
    "q332_stream_growth"    -> q332StreamGrowth,
    "q348_stream_sprt"      -> q348StreamSprt,
    "q247_dynamic_session"  -> q247DynamicSession)

  /** q203's affine coefficients as a literal VALUES table — the same
    * (a, b) pairs [[graft.ext.Dedup.mdBandKeys]] compiled into the engine
    * UDF, so the oracle evaluates the identical hash family. */
  private val mdCoefValues: String =
    graft.ext.Dedup.MdCoefs.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }
      .mkString(", ")

  val oracle: Map[String, String] = Map(
    // full from-scratch replay of the streamed LSH construction: md5 base
    // hash mod P, the embedded affine family, comma-joined signature
    // slices as band keys, bucket-min keepers, bool_or dup flags
    // the q320 lag construction restricted to the three arrival states —
    // batch replay of exactly what the streaming state must reproduce
    // the streaming state machine is gated against the IDENTICAL batch
    // truth as q347 — same daily grid, same compile-time LLR constants
    "q348_stream_sprt" -> ExtQueriesShared.sprtOracleSql,
    "q332_stream_growth" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                 FROM events),
          st AS (SELECT user_id, day,
                   lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
                 FROM ud)
          SELECT CAST(day AS VARCHAR) AS day,
                 CASE WHEN prev IS NULL THEN 'new'
                      WHEN datediff('day', prev, day) = 1 THEN 'retained'
                      ELSE 'resurrected' END AS state,
                 CAST(count(*) AS BIGINT) AS n_users
          FROM st GROUP BY 1, 2 ORDER BY day, state""",
    "q203_stream_lsh_dedup" ->
      s"""${ExtQueriesShared.shingleCte("")},
          e AS (SELECT doc_id, unnest(sh) AS g FROM s),
          vh AS (SELECT g,
                   CAST('0x' || substring(md5(g), 1, 15) AS BIGINT)
                     % 2147483647 AS h
                 FROM (SELECT DISTINCT g FROM e)),
          coef(i, a, b) AS (VALUES $mdCoefValues),
          sig AS (SELECT e.doc_id, c.i,
                    min((c.a * vh.h + c.b) % 2147483647) AS m
                  FROM e JOIN vh USING (g) CROSS JOIN coef c
                  GROUP BY e.doc_id, c.i),
          bnd AS (SELECT doc_id, i // 4 AS band,
                    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
                  FROM sig GROUP BY doc_id, i // 4),
          keep AS (SELECT band, bkey, min(doc_id) AS keeper
                   FROM bnd GROUP BY band, bkey),
          fl AS (SELECT b.doc_id, bool_or(k.keeper < b.doc_id) AS f
                 FROM bnd b JOIN keep k USING (band, bkey)
                 GROUP BY b.doc_id)
          SELECT d.doc_id, coalesce(fl.f, false) AS is_dup
          FROM documents d LEFT JOIN fl USING (doc_id)
          ORDER BY d.doc_id""",
    // the streaming reservoir is DEFINED to equal q176's batch sample —
    // both gate against the one shared SQL string
    "q182_stream_reservoir" -> ExtQueriesShared.wrsOracleSql,
    // final table = base with streamed updates applied plus streamed
    // inserts — any dropped upsert, phantom re-apply, or missed insert
    // breaks the equality
    "q170_stream_jdbc_upsert" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END
                  AS o_orderstatus
         FROM orders WHERE o_orderkey < 5000
         UNION ALL
         SELECT o_orderkey + 10000000, 'N' FROM orders
         WHERE o_orderkey % 1000 = 1 AND o_orderkey < 5000
         ORDER BY o_orderkey""",
    // the streamed enrichment must equal the batch join exactly
    "q164_stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY 1""",
    // q148's oracle shape plus the streamed-equals-batch equality column
    "q152_stream_cms" ->
      """WITH t AS (
           SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                    w -> length(w) > 0)) AS tok
           FROM documents)
         SELECT tok, CAST(count(*) AS BIGINT) AS n_exact,
                true AS overestimate_ok, true AS bound_ok,
                true AS incremental_matches_batch
         FROM t GROUP BY tok
         ORDER BY n_exact DESC, tok ASC LIMIT 10""",
    // the streamed-in, incrementally-maintained index must answer exactly
    // like a fresh full-corpus build — q89's shared oracle string
    "q107_stream_index" -> TextQueries.mergesJoiningOracle,
    // the streamed-in POSITIONAL index must answer phrase search exactly
    // like a fresh full-corpus positional build — q91's shared oracle
    "q119_stream_phrase" -> TextQueries.hashJoinPhraseOracle,
    // upsert mode restores the corrupted slice's true text, so the final
    // corpus IS `documents` — the same shared fresh-build oracle; a ghost
    // posting the sweep missed shows up as an extra matching doc_id
    "q124_stream_upsert" -> TextQueries.mergesJoiningOracle,
    // the buffered twin's final corpus is also exactly `documents`, and
    // the overlay-read ∩ compacted-read construction means BOTH paths
    // must independently equal the fresh-build truth
    "q365_stream_buffered" -> TextQueries.mergesJoiningOracle,
    "q70_stream_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
         count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q71_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "q72_stream_sessionize" ->
      """WITH x AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                            > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (
           SELECT user_id, ts,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events
         FROM y GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q73_stream_sink" ->
      """SELECT event_id, user_id, event_type, value FROM events
         ORDER BY event_id""",
    // islands with the session_window merge rule: gap >= 30min opens a
    // new session (window end exclusive), close = last event + gap
    "q210_session_window" ->
      """WITH x AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                            >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (
           SELECT user_id, ts,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id, min(ts) AS session_start,
                max(ts) + INTERVAL 30 MINUTE AS session_close,
                count(*) AS n_events
         FROM y GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    // horizon covers the finite replay, so bounded-state dedup equals
    // global DISTINCT on the keys
    "q211_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    // merge rule derived relationally: new session iff ts >= running max
    // of all prior ends per user; close = max end in the island
    "q247_dynamic_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                  CAST(ts AS TIMESTAMP) + to_minutes(CAST(
                    CASE WHEN event_type = 'click' THEN 10
                         WHEN event_type = 'view' THEN 20
                         ELSE 30 END AS BIGINT)) AS e_end
                FROM events),
          x AS (SELECT *, max(e_end) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS pmax
                FROM e),
          y AS (SELECT *, CASE WHEN pmax IS NULL OR ts >= pmax
                           THEN 1 ELSE 0 END AS new_s FROM x),
          z AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
                FROM y)
          SELECT user_id, min(ts) AS session_start,
                 max(e_end) AS session_close, count(*) AS n_events
          FROM z GROUP BY user_id, sid
          ORDER BY user_id, session_start""",
    // the single-batch availableNow emission is the global aggregate
    "q214_transform_state" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                min(event_id) AS min_id, max(event_id) AS max_id
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q94_stateful_sessions" ->
      """WITH x AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                            > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (
           SELECT user_id, ts,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events
         FROM y GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q90_merge_bucketed" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                     ELSE o_custkey END AS o_custkey
         FROM orders ORDER BY o_orderkey""",
    // batched deltas change WHEN rewrites happen, never the merged result:
    // the plain CASE merge is the whole truth (batch 3's %20 update lands
    // ON TOP of batch 2's %10 update — latest-wins)
    "q367_merge_batched" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 20 = 0 THEN o_custkey + 2000000
                     WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                     ELSE o_custkey END AS o_custkey
         FROM orders ORDER BY o_orderkey""",
    // the plain batch interval join over the same events IS the complete
    // answer the streaming inner join must reproduce
    "q138_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           CAST(ts AS TIMESTAMP) AS ts FROM events)
         SELECT c.user_id, c.event_id AS click_id, p.event_id AS buy_id,
                epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
         FROM e c, e p
         WHERE c.event_type = 'click' AND p.event_type = 'purchase'
           AND c.user_id = p.user_id
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
         ORDER BY click_id, buy_id""",
    // the same interval join as a batch LEFT OUTER: unmatched clicks keep
    // null buy columns — a streaming eviction bug shows as missing or
    // phantom rows against this truth
    "q166_stream_outer_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           CAST(ts AS TIMESTAMP) AS ts FROM events),
         c AS (SELECT * FROM e WHERE event_type = 'click'),
         p AS (SELECT * FROM e WHERE event_type = 'purchase')
         SELECT c.user_id, c.event_id AS click_id, p.event_id AS buy_id,
                epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
         FROM c LEFT JOIN p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
         ORDER BY click_id, buy_id""")
}
