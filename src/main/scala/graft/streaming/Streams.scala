package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY §1.1/§7: the reference pipeline is
  * logically incremental — new quarters arrive, triggers maintain derived
  * state — which maps to availableNow micro-batches here).
  *
  * Scale design: file-source streams list only NEW files per batch (the
  * 100 TB ingest pattern: land parquet, stream processes increments);
  * windowed aggregation state is bounded by the watermark; sessionization
  * state is per-key and times out. Everything below runs identically on a
  * real cluster — only trigger cadence changes.
  */
object Streams {

  private val nameCounter = new AtomicInteger(0)

  /** availableNow parquet file stream (schema must be known up front —
    * streaming sources don't infer). */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Run a stream to completion (availableNow) into an in-memory table and
    * return it as a batch DataFrame. Memory sink holds the full result on
    * the driver — a verification harness, not a production sink; use
    * [[runToParquet]] for real output.
    *
    * `statePartitions` > 0 sizes the state shuffle to the keyed-state
    * volume instead of the session default — stateful operators commit one
    * state-store file per shuffle partition per micro-batch, which
    * dominates small-state queries at the session's 32. `rocksDb` runs the
    * query on the RocksDB state-store provider — the 100 TB keyed-state
    * path (the default HDFS-backed store holds state on-heap; RocksDB
    * spills to native memory + disk). Both are captured at query START and
    * restored right after, so no other query observes them. */
  def runToMemory(spark: SparkSession, stream: DataFrame,
                  mode: OutputMode = OutputMode.Append(),
                  statePartitions: Int = 0,
                  rocksDb: Boolean = false): DataFrame = {
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val spKey = "spark.sql.shuffle.partitions"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevSp = spark.conf.getOption(spKey)
    val prevProv = spark.conf.getOption(provKey)
    try {
      if (statePartitions > 0) spark.conf.set(spKey, statePartitions.toString)
      if (rocksDb) spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val q = stream.writeStream
        .format("memory").queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      // restore only after termination: micro-batches plan asynchronously
      // and read the session conf while running
      q.awaitTermination()
    } finally {
      prevSp.fold(spark.conf.unset(spKey))(v => spark.conf.set(spKey, v))
      prevProv.fold(spark.conf.unset(provKey))(v => spark.conf.set(provKey, v))
    }
    spark.table(name)
  }

  /** Run a stream to completion into a parquet sink with a checkpoint —
    * the production shape: exactly-once via checkpointed file manifests. */
  def runToParquet(stream: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Run a stream to completion through a foreachBatch sink — the escape
    * hatch for sinks Structured Streaming has no native writer for (RDBMS
    * upserts, multi-table writes). Exactly-once comes from the checkpoint
    * PLUS the sink function being idempotent per batch (an upsert is; a
    * blind append is not) — the same contract Delta/JDBC foreachBatch
    * users sign up for. */
  def runForeachBatch(stream: DataFrame, checkpointDir: String)
                     (fn: (DataFrame, Long) => Unit): Unit = {
    val q = stream.writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Watermarked hourly rollup — the streaming twin of the batch q20.
    * The watermark bounds state: windows older than max(ts)-delay are
    * finalized and dropped from the store. */
  def hourlyCounts(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"))

  /** Streaming exact dedup on a key projection: dropDuplicates keeps state
    * per distinct tuple (bound it with a watermark column in production). */
  def dedupKeys(stream: DataFrame, cols: Seq[String]): DataFrame =
    stream.select(cols.map(col): _*).dropDuplicates(cols)

  /** Stream-stream INNER interval join — the conversion-attribution shape:
    * each click pairs with the same user's purchases whose timestamp falls
    * in [click_ts, click_ts + withinMinutes]. Both sides carry watermarks
    * and the join condition carries the time-range bound, which together
    * let Spark EVICT buffered state: a click is dropped once the purchase
    * watermark passes click_ts + withinMinutes, a purchase once the click
    * watermark passes its ts — state stays O(window × arrival rate), not
    * O(stream), which is what makes a stream-stream join runnable forever
    * at 100 TB/day (an unbounded-state join would be refused or OOM).
    * Inner mode emits exactly the batch join's rows under availableNow:
    * watermarks gate state eviction and late data, never match
    * completeness within retained state (spec-pinned; outer stream-stream
    * joins DO depend on watermark passage to emit nulls, which is why the
    * oracle-checked catalog entry is the inner form).
    *
    * Emits (user_id, click_id, buy_id, delay_us) with the delay as exact
    * integer microseconds. */
  def conversionPairs(clicks: DataFrame, purchases: DataFrame,
                      withinMinutes: Int,
                      watermarkDelay: String = "2 hours"): DataFrame = {
    val l = clicks
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val r = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("buy_id"), col("ts").as("buy_ts"))
      .withWatermark("buy_ts", watermarkDelay)
    l.join(r, expr(
        s"""user_id = p_user AND buy_ts >= click_ts
            AND buy_ts <= click_ts + interval $withinMinutes minutes"""))
      .select(col("user_id"), col("click_id"), col("buy_id"),
        (unix_micros(col("buy_ts")) - unix_micros(col("click_ts"))).as("delay_us"))
  }

  /** [[conversionPairs]]'s LEFT-OUTER twin — the hard stream-stream join
    * semantics: clicks with no purchase in the window must still emit,
    * with null buy columns, and they can only emit once the watermark
    * passes their join window (before that a match could still arrive).
    * State eviction and the null-emission path are exactly what this
    * exercises; the final no-data micro-batch (AvailableNow +
    * noDataMicroBatches) advances the watermark past the last event so
    * trailing unmatched clicks flush before the query ends. */
  def conversionPairsOuter(clicks: DataFrame, purchases: DataFrame,
                           withinMinutes: Int,
                           watermarkDelay: String = "2 hours"): DataFrame = {
    val l = clicks
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val r = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("buy_id"), col("ts").as("buy_ts"))
      .withWatermark("buy_ts", watermarkDelay)
    l.join(r, expr(
        s"""user_id = p_user AND buy_ts >= click_ts
            AND buy_ts <= click_ts + interval $withinMinutes minutes"""),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("buy_id"),
        (unix_micros(col("buy_ts")) - unix_micros(col("click_ts"))).as("delay_us"))
  }

  /** One row per key even WITHIN a batch (a micro-batch can carry the same
    * key from several source files, and rows have no intra-batch order) —
    * the greatest row struct over the ORDERABLE columns wins: arbitrary but
    * DETERMINISTIC (rows differing only in non-orderable columns like maps
    * tie arbitrarily); pass a version column upstream for true
    * last-writer-wins. */
  private def latestPerKey(rawBatch: DataFrame, keyCol: String): DataFrame = {
    val orderable = rawBatch.schema.fields
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
      .map(f => col(f.name))
    val ordKey = if (orderable.nonEmpty) struct(orderable.toIndexedSeq: _*).desc
                 else col(keyCol).desc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(ordKey)
    rawBatch
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1).drop("graft_rn")
  }

  /** F4 trigger-maintenance port in streaming mode, SMALL-BASE variant:
    * each micro-batch of results MERGEs into a flat parquet base table by
    * key (last-writer-wins within this batch), crash-atomically via a
    * write-tmp + rename-swap protocol. Rewrites the WHOLE base per batch —
    * fine for the reference's dimension-sized tables, wrong for a large
    * base; use [[incrementalMergeBucketed]] (copy-on-write on touched
    * buckets) when the base outgrows a single batch's write budget. The
    * derived work queue is whatever anti-joins against the base afterwards,
    * exactly like the batch path (SURVEY §2.7 F4).
    *
    * Durability protocol (every transition is one filesystem rename —
    * atomic on HDFS and local FS, so any crash leaves a recoverable state):
    *   write merged → `<target>_tmp` (committer marks it with _SUCCESS)
    *   rename target → `<target>_old`;  rename tmp → target;  delete old.
    * [[recoverSwap]] runs before each batch: a missing target is restored
    * from a COMPLETE tmp (it holds base ⊎ the crashed batch — the
    * checkpoint re-delivers that batch and re-merging is a no-op) or, if
    * the tmp never completed, from old. The base is therefore never the
    * only copy while it is being replaced — closing the data-loss window a
    * plain delete-then-rewrite swap has.
    *
    * Restartable: the checkpoint makes each source file process exactly
    * once, and re-merging an already-applied batch is a no-op (same keys,
    * same values), so the swap is idempotent across failures. */
  def incrementalMerge(stream: DataFrame, targetDir: String, keyCol: String,
                       checkpointDir: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (rawBatch: DataFrame, _: Long) =>
        val spark = rawBatch.sparkSession
        // single-writer lease (shared WriterLease): the swap below is two
        // renames — a second query driving the same base could interleave
        // them (or re-bootstrap over a mid-swap window) with no detection
        graft.util.WriterLease.withLease(spark, targetDir, "merge base") {
        val fs = new org.apache.hadoop.fs.Path(targetDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        // siblings built off the normalized Path, not string concat: with a
        // trailing slash in targetDir, "…/base/" + "_tmp" would be a CHILD
        // of the base — the demote rename would carry it along and the final
        // cleanup would delete the only copy
        val target = new org.apache.hadoop.fs.Path(targetDir)
        val tmp = new org.apache.hadoop.fs.Path(target.getParent, target.getName + "_tmp")
        val old = new org.apache.hadoop.fs.Path(target.getParent, target.getName + "_old")
        recoverSwap(fs, target, tmp, old)
        val batch = latestPerKey(rawBatch, keyCol)
        val hasBase = fs.exists(target) &&
          fs.listStatus(target).exists(!_.getPath.getName.startsWith("_"))
        val merged =
          if (!hasBase) batch
          else {
            val base = spark.read.parquet(targetDir)
            // null-safe (<=>) for the same reason as the bucketed variant:
            // a null key must replace a null key, not duplicate per batch
            base
              .join(batch.select(col(keyCol).as("graft_mk")),
                base(keyCol) <=> col("graft_mk"), "left_anti")
              .unionByName(batch)
          }
        // reads base, writes tmp — distinct paths, so one write, no cache
        merged.write.mode("overwrite").parquet(tmp.toString)
        // recoverSwap keys completeness on _SUCCESS; committers configured
        // with marksuccessfuljobs=false skip it, so stamp it ourselves —
        // the write above just finished synchronously, so tmp IS complete
        val marker = new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
        if (!fs.exists(marker)) fs.create(marker).close()
        // each rename must be verified: if the demote fails silently and we
        // proceed, rename(tmp, target) moves tmp INTO the still-existing
        // target (Hadoop rename-into-existing-dir semantics), corrupting
        // the base. Failing loudly lets the checkpoint retry the batch.
        if (fs.exists(target)) {
          require(fs.rename(target, old), s"demote rename failed: $target -> $old")
        }
        require(fs.rename(tmp, target), s"promote rename failed: $tmp -> $target")
        if (fs.exists(old)) fs.delete(old, true)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Crash recovery for [[incrementalMerge]]'s rename-swap: restore a
    * missing base from the newest complete copy, and clear a stale backup.
    * Public only transitively through incrementalMerge's contract — also
    * lets operators repair a base by hand after a torn run. */
  private[streaming] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                                     target: org.apache.hadoop.fs.Path,
                                     tmp: org.apache.hadoop.fs.Path,
                                     old: org.apache.hadoop.fs.Path): Unit = {
    def complete(p: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    if (!fs.exists(target)) {
      // crashed between demoting the base and promoting tmp: prefer the
      // merged tmp (base ⊎ crashed batch) if its commit completed.
      // (incrementalMerge stamps _SUCCESS itself after the tmp write, so
      // this holds even under marksuccessfuljobs=false; a hand-repair of a
      // torn run from an EXTERNAL tmp must carry its own marker.)
      if (complete(tmp)) require(fs.rename(tmp, target), s"recover rename failed: $tmp -> $target")
      else if (fs.exists(old)) require(fs.rename(old, target), s"recover rename failed: $old -> $target")
    }
    // crashed after promoting but before cleanup — old is stale; it must
    // go now or the next demote-rename would collide with it
    if (fs.exists(target) && fs.exists(old)) { fs.delete(old, true); () }
  }

  /** F2+F4 streaming — the reference's "near real time full text search"
    * (reference `README.md:6`: filings land, the tsvector trigger keeps the
    * GIN index current) as a Structured Streaming sink: each micro-batch of
    * (id, text) documents appends its postings to the on-disk index via
    * `PostingIndex.appendToIndex`, rewriting only the touched lexeme-bucket
    * partitions. The first batch bootstraps the index layout. Exactly-once
    * composition: the checkpoint replays only uncommitted epochs, and
    * appendToIndex's per-bucket (id, bucket) anti-join makes a replayed
    * epoch rewrite identical contents — so searches see each document
    * exactly once at any crash point. Per-batch cost is O(touched buckets ×
    * bucket size), independent of index size — the same bound as
    * [[incrementalMergeBucketed]]. */
  def maintainPostingIndex(stream: DataFrame, indexPath: String, idCol: String,
                           textCol: String, checkpointDir: String,
                           buckets: Int = 64, positional: Boolean = false,
                           mode: String = "append",
                           compactAboveBytes: Long = 64L * 1024 * 1024,
                           autoRebucket: Boolean = false,
                           compactAbovePendingBatches: Int =
                             graft.text.PostingIndex.CompactAbovePendingBatchesDefault): Unit = {
    import graft.text.{PostingIndex, TextOps}
    // append = new documents only (the reference's INSERT leg); upsert =
    // each batch's docs REPLACE their prior postings (the UPDATE leg —
    // the scrape loop re-writing a filing's text must not leave ghost
    // postings behind, PostingIndex.upsertIndex's delete sweep);
    // buffered = the same REPLACE semantics through the GIN-fastupdate
    // pending list (PostingIndex.upsertIndexBuffered) — each micro-batch
    // appends ~delta-sized postings instead of COW-rewriting every
    // touched bucket (measured 3.3× vs 274.7× write amplification per
    // batch at the ×100 stress scale), with the fold deferred to the
    // compactAboveBytes trigger riding inside the same foreachBatch.
    // All three compose exactly-once with the checkpoint: append dedupes
    // on (id, bucket); upsert converges by construction; buffered
    // converges because a replayed epoch re-appends the same docs under
    // a HIGHER pending-batch stamp and reads resolve latest-batch-wins —
    // identical live rows, and compaction folds replace-by-id (so a
    // crash at any point, including mid-compaction, heals on re-run).
    // autoRebucket=true closes the trigger loop (round-12 VERDICT item 3,
    // from "warn" to "act"): when an apply arms PostingIndex.
    // rebucketAdvice(indexPath) — mean touched-bucket width ≥ 4× the birth
    // sizing — the loop folds any pending area and rebuckets to the
    // suggested ∝N modulus between micro-batches, the maintenance-window
    // slot the rebucket contract prescribes. Off by default: the swap is
    // an O(index) rewrite and not reader-concurrent, so batch callers opt
    // in where a human would otherwise schedule it.
    require(mode == "append" || mode == "upsert" || mode == "buffered",
      s"maintainPostingIndex mode must be append|upsert|buffered, got '$mode'")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Hadoop FS, not java.io.File: on a cluster store (hdfs://, s3a://,
        // or even a file: URI) a local-File existence probe is ALWAYS false
        // — every batch would re-bootstrap with mode(overwrite) and silently
        // truncate the index to the last batch
        val path = new org.apache.hadoop.fs.Path(indexPath)
        val fs = path.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        // BEFORE the bootstrap probe: heal a rebucket swap that crashed
        // between its two renames — in that window indexPath does not
        // exist, and treating the replayed batch as a bootstrap would
        // silently re-create the index with only that batch's docs while
        // the corpus sits stranded at <path>.rebucket_old. Unconditional
        // (round-13 ADVICE): the stranded-corpus hazard applies equally
        // to default loops running against an index someone rebuckets
        // out-of-band, and the healthy-path cost is one fs.exists.
        PostingIndex.recoverRebucketSwap(batch.sparkSession, indexPath)
        val bootstrapped = fs.exists(path) &&
          fs.listStatus(path).exists(_.getPath.getName.startsWith("lexeme_bucket="))
        // positional = phrase-searchable maintained index (positions carried
        // per posting — q109's layout kept near-real-time); plain = the
        // smaller boolean-search layout. One flag, same bootstrap/append
        // lifecycle, and appendBatch's layout guard catches a flag flip
        // against an existing index of the other kind.
        // the CURRENT modulus: under autoRebucket a previous batch may
        // have swapped the layout, so the constructor argument is only
        // the bootstrap sizing — the layout marker is the truth from then
        // on (one tiny root read per batch; requireLayout would reject a
        // stale value loudly, this just removes the restart footgun).
        val curBuckets =
          if (bootstrapped && autoRebucket)
            PostingIndex.layoutBuckets(batch.sparkSession, indexPath)
              .getOrElse(buckets)
          else buckets
        if (!bootstrapped) {
          val built =
            if (positional) PostingIndex.buildPositional(batch, idCol, col(textCol))
            else PostingIndex.build(batch, idCol, TextOps.tokenize(col(textCol)))
          PostingIndex.write(built, indexPath, buckets)
        } else (positional, mode) match {
          case (true, "upsert") =>
            PostingIndex.upsertIndexPositional(batch.sparkSession, indexPath, batch,
              idCol, col(textCol), curBuckets)
          case (true, "buffered") =>
            PostingIndex.upsertIndexBufferedPositional(batch.sparkSession, indexPath,
              batch, idCol, col(textCol), curBuckets, compactAboveBytes,
              compactAbovePendingBatches)
          case (true, _) =>
            PostingIndex.appendToIndexPositional(batch.sparkSession, indexPath, batch,
              idCol, col(textCol), curBuckets)
          case (false, "upsert") =>
            PostingIndex.upsertIndex(batch.sparkSession, indexPath, batch,
              idCol, TextOps.tokenize(col(textCol)), curBuckets)
          case (false, "buffered") =>
            PostingIndex.upsertIndexBuffered(batch.sparkSession, indexPath, batch,
              idCol, TextOps.tokenize(col(textCol)), curBuckets, compactAboveBytes,
              compactAbovePendingBatches)
          case (false, _) =>
            PostingIndex.appendToIndex(batch.sparkSession, indexPath, batch,
              idCol, TextOps.tokenize(col(textCol)), curBuckets)
        }
        // ACT on the rebucket trigger (opt-in): the apply above armed the
        // advice if its mean touched-bucket width outgrew the birth sizing
        // rule 4×. PostingIndex.actOnRebucketAdvice folds pending first
        // (buffered batches hash by the old modulus), re-reads the advice
        // after the fold (the fold's own apply may arm a fresher, larger
        // suggestion), and runs the documented two-rename swap. Replay
        // safety at any crash point: the rebucketed base holds exactly
        // the rows the old layout held, so a replayed epoch converges the
        // same way it would have without the swap (append anti-joins per
        // (id, bucket) under the CURRENT marker's modulus; upsert
        // replaces by id; buffered re-appends under a higher stamp) — and
        // a crash BETWEEN the two renames leaves the index at
        // <path>.rebucket_old per rebucket's contract, healed above.
        if (autoRebucket) {
          PostingIndex.actOnRebucketAdvice(batch.sparkSession, indexPath, idCol)
          ()
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .queryName(s"graft_idx_maintain_${nameCounter.incrementAndGet()}")
      .start()
    q.awaitTermination()
  }

  /** Partition column of a bucketed merge base (hash bucket of the merge
    * key). Part of the on-disk layout contract, hence public. */
  val BucketCol = "graft_bucket"

  /** Touched-bucket fraction at which a merge batch stops being
    * incremental: with distinct delta keys ≫ buckets, every bucket is
    * touched and the COW merge degrades to a full base rewrite (the
    * measured q90 delta10pct boundary, STRESS.md — 17.7× amplification at
    * ×10 scale). The boundary is a property of the DELTA, not a bug the
    * merge can route around (the rewrite really is the cost of applying
    * that delta), so the guard MEASURES and warns rather than failing. */
  val WideDeltaWarnFraction = 0.5

  /** Most recent wide-delta warning, `None` after a healthy batch —
    * the observability hook monitors (and the spec) read; the same text
    * goes to stderr loudly at batch time. */
  @volatile var lastWideDeltaWarning: Option[String] = None

  /** The measured guard for the q90 delta10pct boundary: when one batch's
    * distinct buckets cover ≥ [[WideDeltaWarnFraction]] of the layout,
    * return the warning (with the measured ratio) that the merge is
    * effectively a full rewrite — the caller should BATCH deltas
    * (accumulate landing files / raise `maxFilesPerTrigger` so one merge
    * absorbs many batches: k near-full rewrites collapse to one, the
    * advice StressIndex's batched-path row measures) or raise
    * `numBuckets` so steady-state keys ≪ buckets. */
  private[streaming] def wideDeltaWarning(touched: Int, numBuckets: Int): Option[String] =
    if (numBuckets > 1 && touched.toDouble / numBuckets >= WideDeltaWarnFraction)
      Some(s"incrementalMergeBucketed: batch touches $touched/$numBuckets buckets " +
        f"(${100.0 * touched / numBuckets}%.0f%%) — the copy-on-write merge has " +
        "degraded to a near-full base rewrite. Batch deltas (batchDeltas=true " +
        "parks batches in a pending area and folds them through ONE merge; or " +
        "let one merge absorb many landing files) or raise numBuckets so " +
        "batch keys ≪ buckets.")
    else None

  private def bucketOf(keyCol: String, numBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int")

  // ---- batched-delta pending area for the bucketed merge base ----------
  // (round-13 VERDICT item 7 — the wide-delta remedy, made an option: the
  // q90 delta10pct boundary is a property of the DELTA — keys ≫ buckets
  // means the COW merge IS a near-full rewrite, and TEN sequential such
  // merges rewrite the base ten times. `batchDeltas = true` parks each
  // micro-batch in `targetDir/_pending` (~delta-sized append, no bucket
  // rewrite) and folds the accumulated batches through ONE COW merge at
  // the `foldAboveBytes` threshold — the identical pending-list design as
  // PostingIndex.upsertIndexBuffered, sharing its epoch-guard machinery.)

  private val MergePendingDir = "_pending"
  private val MergeBatchCol = "graft_pending_batch"
  private val MergeEpochMarker = "_graft_pending_epoch"
  private val MergeSeqMarker = "_graft_pending_seq"

  private def mergePendingPath(targetDir: String) = s"$targetDir/$MergePendingDir"

  private def hasMergePending(spark: SparkSession, targetDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(mergePendingPath(targetDir))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** On-disk size of the merge base's pending area (the fold trigger's
    * measure). */
  def mergePendingBytes(spark: SparkSession, targetDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(mergePendingPath(targetDir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Live pending rows: each key's row from its LATEST batch (batches are
    * already one-row-per-key via latestPerKey). Null keys group like any
    * other key under the window. The ONE copy of the latest-wins window
    * and the key-first layout contract — the fold uses it bare, the
    * overlay read threads its epoch guard through `guard` so the two
    * paths can never diverge on the pending layout. */
  private def liveMergePending(spark: SparkSession, targetDir: String,
                               guard: Option[DataFrame] = None): DataFrame = {
    val pendRaw = spark.read.parquet(mergePendingPath(targetDir))
    // the guard rides INSIDE the pending scan's own stage (crossJoin
    // BEFORE the latest-wins window) — see readMergedBase for why
    val pend = guard.map(g => pendRaw.crossJoin(g).drop("graft_epoch_live"))
      .getOrElse(pendRaw)
    val keyCols = pendRaw.columns.filterNot(_ == MergeBatchCol)
    // the key column is unknown here; latest-wins must resolve per KEY,
    // which the writer guarantees is the FIRST column of every appended
    // batch (appendMergePending reorders) — a layout contract like BucketCol
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pendRaw.columns.head))
      .orderBy(col(MergeBatchCol).desc)
    pend.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .select(keyCols.map(col).toIndexedSeq: _*)
  }

  /** Fold the pending area into the bucketed base — ONE touched-bucket COW
    * merge for every batch parked since the last fold — then clear it.
    * Idempotent on retry (replace-by-key converges); the epoch bump lands
    * BEFORE the delete, so a crash between the two leaves correct overlay
    * reads and a re-foldable area (PostingIndex.compactPending's exact
    * contract, via the shared PendingEpoch implementation). */
  def foldMergePending(spark: SparkSession, targetDir: String, keyCol: String,
                       numBuckets: Int): Unit =
    // leased in its own right (reentrant under the per-batch lease): the
    // fold is also a PUBLIC entry an operator can call beside a running
    // maintenance loop, and an unfenced fold racing a park would delete
    // pending files the park just stamped
    graft.util.WriterLease.withLease(spark, targetDir, "merge base") {
    if (hasMergePending(spark, targetDir)) {
      val live = liveMergePending(spark, targetDir)
        .withColumn(BucketCol, bucketOf(keyCol, numBuckets))
        .localCheckpoint(true)
      applyMergeDelta(spark, live, targetDir, keyCol, numBuckets)
      live.unpersist()
      graft.util.PendingEpoch.bump(spark, targetDir, MergeEpochMarker)
      // counter BEFORE the pending dir (see PendingEpoch.clearStamp): a
      // crash in between falls back to the migration scan, never a stale
      // counter over a cleared area
      graft.util.PendingEpoch.clearStamp(spark, targetDir, MergeSeqMarker)
      val p = new org.apache.hadoop.fs.Path(mergePendingPath(targetDir))
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
  }

  private def mergeEpochGuard(spark: SparkSession, targetDir: String): DataFrame =
    graft.util.PendingEpoch.guardFrame(spark, targetDir, MergeEpochMarker) {
      (builtAt, now) =>
        s"merge base at $targetDir was folded (pending epoch $now; this read " +
          s"was planned at epoch $builtAt) after this DataFrame was built — " +
          "the pending files it lazily references are gone. Rebuild the " +
          "read, or materialize it (localCheckpoint(true) / write) before " +
          "calling foldMergePending."
    }

  /** Read a bucketed merge base back as a plain table (bucket column
    * dropped — it's layout, not data). With a batched-delta pending area
    * present, the read OVERLAYS it: base rows of pending keys are
    * superseded by each key's latest parked row, and both union sides
    * carry the execution-time epoch guard — a plan built before a fold
    * fails loudly when executed after it, never silently-stale. */
  def readMergedBase(spark: SparkSession, targetDir: String): DataFrame = {
    val base = spark.read.parquet(targetDir).drop(BucketCol)
    if (!hasMergePending(spark, targetDir)) return base
    val guard = broadcast(mergeEpochGuard(spark, targetDir))
    // the guard rides INSIDE the pending scan's own stage (crossJoin
    // BEFORE the latest-wins window), not just on the union outputs:
    // under AQE the window's shuffle stage is a leaf materialized in
    // parallel with everything else, and an unguarded pending scan would
    // surface FAILED_READ_FILE before the guard stage ever ran — the
    // bare-FileNotFound failure mode the guard exists to replace. A
    // stage that needs the guard's broadcast cannot start until the
    // guard has executed (and thrown).
    val live = liveMergePending(spark, targetDir, Some(guard))
    val keyName = live.columns.head // layout contract: key first
    val liveKeys = live.select(col(keyName).as("graft_mk"))
    base.join(broadcast(liveKeys), base(keyName) <=> col("graft_mk"), "left_anti")
      .crossJoin(guard).drop("graft_epoch_live")
      .unionByName(live.select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** F4 trigger-maintenance at scale: copy-on-write MERGE into a
    * hash-bucketed parquet base. The base is laid out as
    * `targetDir/graft_bucket=N/…` (N = xxhash64(key) mod numBuckets); each
    * micro-batch rewrites ONLY the buckets its keys hash into, via dynamic
    * partition overwrite — per-batch write cost is O(touched buckets ×
    * bucket size), not O(base). This is the Delta-`MERGE INTO`-shaped
    * replacement for [[incrementalMerge]]'s full rewrite: at a 100 TB base
    * with numBuckets sized so a bucket ≈ a few GB, a batch touching k keys
    * rewrites ≤ k buckets regardless of base size.
    *
    * Mechanics per batch: (1) collapse the batch to one row per key;
    * (2) compute its touched-bucket set (≤ numBuckets ints — driver-side by
    * construction, not data-sized); (3) read ONLY those buckets from the
    * base (partition pruning on the bucket column); (4) anti-join + union;
    * (5) `localCheckpoint` the merged slice (materializes just the touched
    * buckets, and detaches the plan from the files about to be replaced);
    * (6) overwrite with `partitionOverwriteMode=dynamic`, which replaces
    * exactly the partitions present in the written frame.
    *
    * Restartable like the flat variant: the checkpoint makes each source
    * file process exactly once, and re-merging an applied batch rewrites
    * the same buckets to the same contents. */
  def incrementalMergeBucketed(stream: DataFrame, targetDir: String, keyCol: String,
                               checkpointDir: String, numBuckets: Int = 64,
                               batchDeltas: Boolean = false,
                               foldAboveBytes: Long = 64L * 1024 * 1024): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val q = stream.writeStream
      .foreachBatch { (rawBatch: DataFrame, _: Long) =>
        val spark = rawBatch.sparkSession
        // same single-writer contract as the posting index, same shared
        // lease: two streaming queries with DIFFERENT checkpoints driving
        // one merge base would interleave bootstrap overwrites, parks and
        // folds with no detection — the second query must fail loudly
        graft.util.WriterLease.withLease(spark, targetDir, "merge base") {
        // localCheckpoint: the deduped batch feeds THREE consumers (the
        // touched-bucket collect, the anti-join key side, the union side) —
        // without it each re-reads the source files and re-runs the
        // latestPerKey window shuffle
        val batch = latestPerKey(rawBatch, keyCol)
          .withColumn(BucketCol, bucketOf(keyCol, numBuckets))
          .localCheckpoint()
        // Hadoop FS, not java.io.File (the maintainPostingIndex lesson):
        // on hdfs://, s3a:// or a file: URI the local-File probe is ALWAYS
        // false — every batch would "bootstrap" with mode(overwrite) and
        // silently truncate the base to the latest batch
        val targetPath = new org.apache.hadoop.fs.Path(targetDir)
        val fs = targetPath.getFileSystem(spark.sessionState.newHadoopConf())
        val baseExists = fs.exists(targetPath) &&
          fs.listStatus(targetPath)
            .exists(_.getPath.getName.startsWith(s"$BucketCol="))
        if (!baseExists) {
          // cluster by bucket before the partitioned write: the window
          // shuffle above leaves rows keyed by hash(key), so an
          // unclustered bootstrap writes tasks × buckets files (measured
          // 173 s / ~50k creates for a 190 MB base at the ×100 stress
          // scale — file count, not bytes, was the cost)
          batch.repartition(col(BucketCol))
            .write.partitionBy(BucketCol).mode("overwrite").parquet(targetDir)
        } else if (batchDeltas) {
          // wide-delta remedy: park the batch (~delta-sized append, no
          // bucket rewrite), fold through ONE COW merge at the threshold.
          // Replay-safe: a replayed epoch re-parks the same keys under a
          // HIGHER batch stamp and reads resolve latest-wins — identical
          // live rows; the fold replaces by key, so converging either way.
          appendMergePending(spark, batch.drop(BucketCol), targetDir, keyCol)
          if (mergePendingBytes(spark, targetDir) > foldAboveBytes)
            foldMergePending(spark, targetDir, keyCol, numBuckets)
        } else {
          // a DIRECT merge cannot see (or supersede) parked batches — the
          // same refusal shape as PostingIndex's hasPending guard
          require(!hasMergePending(spark, targetDir),
            s"merge base at $targetDir has a batched-delta pending area — " +
              "foldMergePending first, or keep maintaining with batchDeltas=true")
          applyMergeDelta(spark, batch, targetDir, keyCol, numBuckets)
        }
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Park one latestPerKey'd batch in the pending area, stamped with the
    * next monotone batch number. Layout contract: `keyCol` is written
    * FIRST so overlay reads (which know only the layout, not the key
    * name) can resolve latest-wins per key. */
  private def appendMergePending(spark: SparkSession, batch: DataFrame,
                                 targetDir: String, keyCol: String): Unit = {
    // O(1) counter claim (PendingEpoch.claimNextStamp — single writer:
    // one streaming query drives one merge base), not a Spark agg(max)
    // over every previously parked file: that scan grows with pending
    // size, making a parking run's total stamp cost quadratic. The
    // fallback scan migrates pre-counter pending areas once.
    val next: Long = graft.util.PendingEpoch.claimNextStamp(
      spark, targetDir, MergeSeqMarker,
      fallbackMax =
        if (!hasMergePending(spark, targetDir)) -1L
        else spark.read.parquet(mergePendingPath(targetDir))
          .agg(max(col(MergeBatchCol))).head() match {
            case r if r.isNullAt(0) => -1L
            case r                  => r.getLong(0)
          })
    batch
      .select((keyCol +: batch.columns.filterNot(_ == keyCol).toSeq).map(col): _*)
      .withColumn(MergeBatchCol, lit(next))
      .write.mode("append").parquet(mergePendingPath(targetDir))
  }

  /** The COW merge apply — one batch (already one-row-per-key, bucket
    * column attached) rewritten into exactly its touched buckets. Shared
    * by the per-batch direct path and [[foldMergePending]]. */
  private def applyMergeDelta(spark: SparkSession, batch: DataFrame,
                              targetDir: String, keyCol: String,
                              numBuckets: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(targetDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val touched = batch.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq
    // the q90 delta10pct boundary, measured per batch instead of
    // documented in prose: a wide delta IS a full rewrite — say so (and
    // point at the batchDeltas remedy, now that it exists)
    lastWideDeltaWarning = wideDeltaWarning(touched.size, numBuckets)
    lastWideDeltaWarning.foreach(System.err.println)
    // read the touched buckets by EXPLICIT path (basePath keeps the
    // partition column), not read-all + filter: a whole-table read
    // lists every partition dir before pruning — O(total buckets)
    // driver work per delta, measured as the dominant cost of
    // small-delta merges at the ×100 stress scale (6.2 s for a
    // 4-key batch against a 1600-bucket base, bytes already flat).
    // Existence-probing only the ≤ k touched dirs is O(delta).
    val touchedPaths = touched.map(b => s"$targetDir/$BucketCol=$b")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val base =
      if (touchedPaths.isEmpty)
        batch.limit(0) // no existing bucket overlaps: nothing to carry
      else spark.read.option("basePath", targetDir)
        .parquet(touchedPaths: _*)
        .select(batch.columns.map(col).toIndexedSeq: _*)
    val batchKeys = batch.select(col(keyCol).as("graft_mk"))
    val merged = base
      // null-safe (<=>): a plain equi-anti-join never matches NULL
      // keys, so a null-key base row would survive every batch AND
      // the batch's null-key row would union in — one duplicate per
      // batch. <=> makes null replace null like any other key.
      .join(batchKeys, base(keyCol) <=> batchKeys("graft_mk"), "left_anti")
      .unionByName(batch.select(base.columns.map(col).toIndexedSeq: _*))
    // materialize the touched slice off the files we're about to
    // replace (also lifts Spark's overwrite-what-you-read guard);
    // clustered by bucket so each rewritten dir stays ≈ one file
    // instead of accreting one per batch-side task per merge
    val snap = merged.repartition(col(BucketCol)).localCheckpoint(true)
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(conf)
    try {
      spark.conf.set(conf, "dynamic")
      snap.write.partitionBy(BucketCol).mode("overwrite").parquet(targetDir)
    } finally prev.fold(spark.conf.unset(conf))(v => spark.conf.set(conf, v))
    snap.unpersist()
  }

  case class Ev(user_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  case class IdEv(user_id: Long, event_id: Long)
  case class UserAgg(n_events: Long, min_id: Long, max_id: Long)
  case class UserAggOut(user_id: Long, n_events: Long,
                        min_id: Long, max_id: Long)

  case class UserDay(user_id: Long, epoch_day: Long)
  case class DayState(epoch_day: Long, state: String)

  case class ArmDayCount(arm_a: Boolean, epoch_day: Long, n: Long, c: Long)
  case class ArmDayCum(arm_a: Boolean, epoch_day: Long, cn: Long, cc: Long)
  case class CumState(cn: Long, cc: Long)

  /** Cross-batch SPRT cumulation state (q348): one (trials, successes)
    * pair per experiment arm — the minimal always-valid-monitoring state;
    * each batch's (day, n, c) rows fold in DAY ORDER (sorted locally —
    * per-arm per-batch day lists are tiny) and every day emits its
    * cumulative totals, so the downstream boundary-crossing fold sees the
    * same daily grid the batch query computes. Two keys total: keyed
    * state is degenerate here by design — the query proves the
    * cross-batch arithmetic, not state volume (q332 covers per-user
    * scale). */
  final class SprtProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Boolean, ArmDayCount, ArmDayCum] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    @transient private var st: ValueState[CumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CumState]("cum",
        org.apache.spark.sql.Encoders.product[CumState], TTLConfig.NONE)

    override def handleInputRows(key: Boolean, rows: Iterator[ArmDayCount],
        timer: org.apache.spark.sql.streaming.TimerValues): Iterator[ArmDayCum] = {
      var cur = if (st.exists()) st.get() else CumState(0L, 0L)
      val out = rows.toArray.sortBy(_.epoch_day).map { r =>
        cur = CumState(cur.cn + r.n, cur.cc + r.c)
        ArmDayCum(key, r.epoch_day, cur.cn, cur.cc)
      }
      st.update(cur)
      out.iterator
    }
  }

  /** Cross-batch growth-accounting state (q332): one ValueState[Long] per
    * user holding the last-active epoch day. Each batch's days (sorted,
    * de-duplicated locally — per-user per-batch day lists are tiny)
    * classify against it: no prior state → `new`, gap of exactly one day →
    * `retained`, anything longer → `resurrected` (the q320 states minus
    * `churned`, which needs absence observation — a timer concern, not an
    * arrival one). The state is ONE long per user: at 100 TB-scale user
    * counts this is the minimal-footprint keyed state, and RocksDB holds
    * it off-heap. Correctness across micro-batch boundaries is the whole
    * point: a user's first day in batch 2 must classify against their
    * last day from batch 1, which only works if the store persists. */
  final class GrowthProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserDay, DayState] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    @transient private var last: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long]("last_day",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserDay],
        timer: org.apache.spark.sql.streaming.TimerValues): Iterator[DayState] = {
      val days = rows.map(_.epoch_day).toArray.distinct.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[DayState]
      var prev = if (last.exists()) Some(last.get()) else None
      days.foreach { d =>
        prev match {
          case None                  => out += DayState(d, "new")
          case Some(p) if d == p     => () // same day re-observed: no event
          // out-of-order arrival EARLIER than the stored last-active day:
          // without this branch it would fall through to `resurrected`,
          // silently misclassifying late data if the processor is reused
          // outside day-ordered streams (q332's slices are mtime-pinned in
          // day order, so this never fires there — it's a library guard)
          case Some(p) if d < p      => out += DayState(d, "late")
          case Some(p) if d - p == 1 => out += DayState(d, "retained")
          case Some(_)               => out += DayState(d, "resurrected")
        }
        if (!prev.exists(_ >= d)) prev = Some(d)
      }
      prev.foreach(last.update)
      out.iterator
    }
  }

  /** `transformWithState` processor (the Spark 4 arbitrary-state API that
    * supersedes mapGroupsWithState): per-user running aggregate held in a
    * typed ValueState, merged with each batch's rows and re-emitted. The
    * API's at-scale contract is what this exercises — named state
    * variables with per-variable TTL on the RocksDB provider (state lives
    * in native memory + disk, not the executor heap), versus
    * mapGroupsWithState's single opaque per-key blob. */
  final class UserAggProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, IdEv, UserAggOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    @transient private var st: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserAgg]("agg",
        org.apache.spark.sql.Encoders.product[UserAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[IdEv],
        timer: org.apache.spark.sql.streaming.TimerValues): Iterator[UserAggOut] = {
      val prev = if (st.exists()) st.get() else UserAgg(0L, Long.MaxValue, Long.MinValue)
      var n = prev.n_events; var mn = prev.min_id; var mx = prev.max_id
      rows.foreach { r =>
        n += 1L
        if (r.event_id < mn) mn = r.event_id
        if (r.event_id > mx) mx = r.event_id
      }
      st.update(UserAgg(n, mn, mx))
      Iterator.single(UserAggOut(key, n, mn, mx))
    }
  }

  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** Pure per-key sessionization of a sorted timestamp array: closed
    * sessions plus the still-open tail. Micro-second gap math matches the
    * SQL gaps-and-islands twin exactly. */
  private def splitSessions(uid: Long, ts: Array[Timestamp], gapMicros: Long)
      : (Seq[Session], Session) = {
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var start = ts(0); var end = ts(0); var n = 1L
    var i = 1
    while (i < ts.length) {
      if (micros(ts(i)) - micros(end) > gapMicros) {
        closed += Session(uid, start, end, n)
        start = ts(i); n = 0L
      }
      end = ts(i); n += 1L
      i += 1
    }
    (closed.toSeq, Session(uid, start, end, n))
  }

  /** Gap-based sessionization of a BOUNDED stream: complete and correct
    * when each key's full history arrives within one micro-batch (the
    * availableNow single-batch shape q72 uses, or any batch Dataset).
    * Events are sorted inside each group (micro-batch iterators carry no
    * time order). For a continuous stream whose keys span batches, use
    * [[sessionizeStateful]] — this variant deliberately carries no state,
    * so cross-batch sessions would NOT merge. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], _: GroupState[Session]) => {
          val ts = evs.map(_.ts).toArray.sortBy(micros)
          if (ts.isEmpty) Iterator.empty
          else {
            val (closed, open) = splitSessions(uid, ts, gapMicros)
            (closed :+ open).iterator
          }
        })
  }

  /** Cross-batch sessionization with real per-key state: the open session
    * is carried in GroupState and merged with each batch's events; sessions
    * close either because a later event exceeds the gap, or via EVENT-TIME
    * TIMEOUT when the watermark passes (session end + gap) — so the final
    * session of an idle key is still emitted, exactly once. State per key
    * is one (start, end, n) triple — bounded regardless of history length. */
  def sessionizeStateful(events: Dataset[Ev], gapMinutes: Int,
                         watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[Session]) => {
          if (!evs.hasNext && state.hasTimedOut) {
            // watermark passed end+gap: nothing can extend this session
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else if (!evs.hasNext) Iterator.empty
          else {
            val batchTs = evs.map(_.ts).toArray.sortBy(micros)
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open: Option[Session] = state.getOption
            // very-late stragglers (older than open start − gap, so they
            // can't merge into the open session) are sessionized AMONG
            // THEMSELVES and emitted closed — not as per-event singletons.
            // Sorted ascending, they form a prefix of the batch.
            val (stragglers, current) = open match {
              case Some(s) =>
                batchTs.span(t => micros(s.session_start) - micros(t) > gapMicros)
              case None => (Array.empty[Timestamp], batchTs)
            }
            if (stragglers.nonEmpty) {
              val (done, tail) = splitSessions(uid, stragglers, gapMicros)
              closed ++= done += tail // nothing later can extend these
            }
            current.foreach { t =>
              open match {
                case None =>
                  open = Some(Session(uid, t, t, 1L))
                case Some(s) =>
                  val tm = micros(t)
                  if (tm > micros(s.session_end) + gapMicros) {
                    closed += s // a later event proves the gap — session closed
                    open = Some(Session(uid, t, t, 1L))
                  } else if (tm >= micros(s.session_end)) {
                    open = Some(s.copy(session_end = t, n_events = s.n_events + 1))
                  } else if (tm >= micros(s.session_start)) {
                    open = Some(s.copy(n_events = s.n_events + 1)) // interior late event
                  } else {
                    open = Some(s.copy(session_start = t, n_events = s.n_events + 1))
                  }
              }
            }
            val o = open.get
            state.update(o)
            // ceil to millis: firing 1 ms late keeps "timeout ⇒ gap fully
            // elapsed" true; flooring could close a session up to 999 µs
            // before the µs-precision gap math would have
            state.setTimeoutTimestamp((micros(o.session_end) + gapMicros + 999L) / 1000L)
            closed.iterator
          }
        })
  }
}
