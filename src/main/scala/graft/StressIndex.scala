package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the INDEX-MAINTENANCE / streaming-write family
  * (round-10 VERDICT item 1): q90's copy-on-write bucketed MERGE, the
  * q106/q107 posting-index append, the q120/q124 posting-index UPSERT, and
  * q213 compaction sit at the top of the bench table, and their designs
  * claim O(delta)-shaped maintenance — "a batch rewrites only the buckets
  * it touches, cost independent of base size". PlanSpec asserts the plan
  * shape; NOTHING measured the claim. This main does, at ×FACTOR data:
  *
  *  - **wall-time growth** of the bootstrap (inherently O(N) — the honest
  *    baseline) vs the DELTA apply (the claim: ~flat when buckets are
  *    sized ∝ N, the same sizing rule as the IVF quantizer);
  *  - **bytes-rewritten-per-delta**: a filesystem snapshot before/after
  *    each apply counts exactly which partition files were rewritten —
  *    `amp = bytes_rewritten / delta_bytes` is the write amplification a
  *    100 TB operator pays per maintenance batch;
  *  - **touched/total partitions**: the pruning the O(delta) claim rests
  *    on, measured, not asserted.
  *
  * Two delta regimes per operator, because the claim has a boundary:
  * a SMALL delta (keys ≪ buckets — the scrape-loop steady state) must
  * rewrite a bounded bucket set regardless of base size; a BROAD delta
  * (keys ≫ buckets, e.g. 10% of the corpus) necessarily touches every
  * bucket and degrades to a full rewrite — that row documents the
  * boundary rather than hiding it (batch your deltas, or raise buckets).
  *
  * Scaled corpus: same replica construction as [[Stress]] — documents get
  * token-suffix salting (vocabulary grows ×FACTOR, like a real corpus, so
  * `buckets ∝ N` keeps expected lexemes-per-bucket constant), orders get
  * replica-offset keys. Buckets scale 16 → 16×FACTOR across the two runs.
  *
  * Not part of the correctness or bench gates — rerunnable via
  * `sbt "runMain graft.StressIndex"`; rewrites the index-family section
  * of `STRESS.md` (the pair-finder section is preserved).
  */
object StressIndex {

  /** One measured apply: wall seconds, the base's on-disk size when the
    * apply started, the delta's input size, what got rewritten. */
  case class Meas(op: String, scale: String, sec: Double, baseBytes: Long,
                  deltaRows: Long, deltaBytes: Long, rewrittenBytes: Long,
                  touchedParts: Int, totalParts: Int,
                  touchedFiles: Int = 0) {
    def amp: Double =
      if (deltaBytes <= 0) 0.0 else rewrittenBytes.toDouble / deltaBytes
  }

  /** One streaming-state measurement: what the state store held on disk
    * after the run, against the input corpus size and document count —
    * bytes PER DOC is the scale-invariant the bucket-row claim predicts
    * (the toy corpus averages ~120 B/doc, so a fraction-of-input framing
    * would mislead; real multi-KB documents make the same state
    * percent-level). */
  case class StateMeas(op: String, scale: String, sec: Double,
                       inputBytes: Long, inputDocs: Long, stateBytes: Long) {
    def perDoc: Double =
      if (inputDocs <= 0) 0.0 else stateBytes.toDouble / inputDocs
  }

  // ---- filesystem accounting (local-FS walk; the harness runs local) ----

  /** path → (size, mtime) for every data file under dir. */
  private def snapshot(dir: String): Map[String, (Long, Long)] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return Map.empty
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val st = java.nio.file.Files.walk(root)
    try st.forEach { p =>
      val f = p.toFile
      if (f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        out(p.toString) = (f.length, f.lastModified)
    } finally st.close()
    out.toMap
  }

  private def totalBytes(snap: Map[String, (Long, Long)]): Long =
    snap.valuesIterator.map(_._1).sum

  /** Distinct partition directories (every `col=value` path segment,
    * sidecar layouts included) holding the given files. */
  private def partsOf(dir: String, paths: Iterable[String]): Set[String] =
    paths.flatMap { p =>
      val segs = p.stripPrefix(dir).split('/')
      val i = segs.lastIndexWhere(_.contains("="))
      if (i < 0) None else Some(segs.take(i + 1).mkString("/"))
    }.toSet

  /** Files created or rewritten between the two snapshots, the distinct
    * partition directories they live in, and their count — files ≈ dirs is
    * the clustered-write contract (one data file per partition dir), made
    * visible per maintenance apply rather than only spec-pinned. */
  private def rewritten(dir: String, before: Map[String, (Long, Long)],
                        after: Map[String, (Long, Long)])
      : (Long, Set[String], Int) = {
    val changed = after.filter { case (p, sm) => !before.get(p).contains(sm) }
    (changed.valuesIterator.map(_._1).sum, partsOf(dir, changed.keySet),
      changed.size)
  }

  /** Count of partition directories (sidecars included) currently in dir. */
  private def partDirs(dir: String): Int =
    partsOf(dir, snapshot(dir).keySet).size

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STRESS_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    import spark.implicits._

    // ---- ×k corpora (Stress.scala's replica construction). TWO decades
    // (×FACTOR and ×FACTOR²), because one decade cannot distinguish
    // O(delta) from a regime transition: at ×1 a 100-row delta SATURATES
    // a 16-bucket layout (touches everything), so ×1→×10 growth mixes
    // saturation relief with real scaling — the ×10→×100 leg, where both
    // points are unsaturated, is the one the claim stands or falls on.
    def scaleCorpus(k: Int): String = {
      if (k == 1) return baseDir
      val dir = util.Scratch.dir(s"graft_stressidx_x${k}_")
      val reps = spark.range(k).toDF("rep")
      io.Tables.documents(spark, baseDir)
        .crossJoin(reps)
        .select(($"doc_id" * k + $"rep").as("doc_id"),
          array_join(
            transform(split($"text", " "), w => concat(w, lit("qz"), $"rep")),
            " ").as("text"),
          $"lang", $"source", $"n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      io.Tables.orders(spark, baseDir)
        .crossJoin(reps)
        .select(($"o_orderkey" * k + $"rep").as("o_orderkey"),
          ($"o_custkey" * k + $"rep").as("o_custkey"),
          $"o_totalprice", $"o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    val scales: Seq[(String, String, Int, Int)] = // (label, dir, buckets, k)
      Seq((s"x1", baseDir, 16, 1),
        (s"x$factor", scaleCorpus(factor), 16 * factor, factor),
        (s"x${factor * factor}", scaleCorpus(factor * factor),
          16 * factor * factor, factor * factor))

    val results = scala.collection.mutable.ArrayBuffer.empty[Meas]
    val stateResults = scala.collection.mutable.ArrayBuffer.empty[StateMeas]
    // rebucket-trigger observations (round-12 VERDICT item 3's done-bar:
    // the warning FIRING in the undersized rows, visible in STRESS.md
    // itself, not just the run log)
    val triggerLines = scala.collection.mutable.ArrayBuffer.empty[String]
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    /** Write the delta as parquet (its on-disk size IS the delta size a
      * 100 TB operator sees land), snapshot the target, apply, diff. */
    def applyDelta(op: String, scale: String, targetDir: String,
                   delta: DataFrame, deltaLanding: String)
                  (apply: String => Unit): Unit = {
      delta.write.mode("overwrite").parquet(deltaLanding)
      val dSnap = snapshot(deltaLanding)
      val before = snapshot(targetDir)
      val (_, sec) = timed(apply(deltaLanding))
      val after = snapshot(targetDir)
      val (rw, parts, files) = rewritten(targetDir, before, after)
      results += Meas(op, scale, sec, totalBytes(before),
        deltaRowsOf(deltaLanding, spark), totalBytes(dSnap), rw,
        parts.size, partDirs(targetDir), files)
      println(results.last)
    }

    // JVM/codegen warm-up outside every timed region (Bench rationale)
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1).select(
      text.TextOps.tokenize(lit("warming the stemmer udf path"))).collect()

    // ================= q90: copy-on-write bucketed MERGE =================
    for ((scale, dir, buckets, k) <- scales) {
      val orders = io.Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
      val src = util.Scratch.dir(s"graft_sidx_m90src_$scale")
      val tgt = util.Scratch.dir(s"graft_sidx_m90tgt_$scale") + "/base"
      val ck = util.Scratch.dir(s"graft_sidx_m90ck_$scale")
      def merge(): Unit = streaming.Streams.incrementalMergeBucketed(
        streaming.Streams.parquetStream(spark, s"$src/*", orders.schema),
        tgt, "o_orderkey", ck, numBuckets = buckets)
      orders.write.parquet(s"$src/f1")
      val (_, bootSec) = timed(merge())
      val bootSnap = snapshot(tgt)
      results += Meas("q90_merge_bootstrap", scale, bootSec, 0L,
        orders.count(), totalBytes(bootSnap), totalBytes(bootSnap),
        partDirs(tgt), partDirs(tgt), bootSnap.size)
      println(results.last)
      // SMALL delta: 4 keys — the scrape-loop steady state (keys ≪ buckets)
      val keys4 = (0 until 4).map(i => (i * 1000 + 7).toLong * k) // existing keys at either scale
      applyDelta("q90_merge_delta4", scale, tgt,
        orders.filter($"o_orderkey".isin(keys4: _*))
          .select($"o_orderkey", ($"o_custkey" + 1000000L).as("o_custkey")),
        s"$src/f2")(_ => merge())
      // BROAD delta: every 10th key — keys ≫ buckets, the claim's boundary
      // (by construction a full rewrite). Runs at EVERY scale since the
      // clustered-write change made the O(N) rewrite affordable at ×100 —
      // the row's point is that the boundary scales exactly like the
      // bootstrap (O(N)), measured across two decades rather than asserted
      // from one.
      applyDelta("q90_merge_delta10pct", scale, tgt,
        orders.filter($"o_orderkey" % 10 === 0)
          .select($"o_orderkey", ($"o_custkey" + 2000000L).as("o_custkey")),
        s"$src/f3")(_ => merge())
      // the SAME 10% of keys applied as 10 SEQUENTIAL 1% merges — the
      // un-batched path the wide-delta guard warns about: each sub-merge
      // still touches ~every bucket, so total rewrite ≈ 10× the one
      // batched apply above. Per-step snapshot diffs SUMMED (an end-to-end
      // diff would collapse repeated rewrites of one bucket into one).
      if (k <= factor) {
        var totRw = 0L
        var totSec = 0.0
        var totDelta = 0L
        var totRows = 0L
        var totFiles = 0
        val partsSeen = scala.collection.mutable.Set.empty[String]
        var before = snapshot(tgt)
        for (i <- 0 until 10) {
          val landing = s"$src/f4_$i"
          orders.filter($"o_orderkey" % 10 === 0 && ($"o_orderkey" / 10) % 10 === i)
            .select($"o_orderkey", ($"o_custkey" + 3000000L).as("o_custkey"))
            .write.mode("overwrite").parquet(landing)
          val dSnap = snapshot(landing)
          totDelta += totalBytes(dSnap)
          totRows += deltaRowsOf(landing, spark)
          val (_, sec) = timed(merge())
          val after = snapshot(tgt)
          val (rw, parts, files) = rewritten(tgt, before, after)
          totRw += rw; totSec += sec; partsSeen ++= parts; totFiles += files
          before = after
        }
        results += Meas("q90_merge_delta10pct_split10", scale, totSec,
          totalBytes(before), totRows, totDelta, totRw,
          partsSeen.size, partDirs(tgt), totFiles)
        println(results.last)
      }
      // the SAME 10 sequential 1% wide deltas through batchDeltas=true
      // (round-13 VERDICT item 7): each sub-batch PARKS (~delta-sized
      // append, no bucket rewrite) and ONE explicit fold applies them all
      // — total rewrite ≈ the one batched merge, not 10 near-full
      // rewrites. Per-step diffs summed, fold included (the honest
      // amortized cost, same accounting as split10).
      if (k <= factor) {
        val ck2 = util.Scratch.dir(s"graft_sidx_m90ck2_$scale")
        def mergeB(landGlob: String): Unit = streaming.Streams.incrementalMergeBucketed(
          streaming.Streams.parquetStream(spark, landGlob, orders.schema),
          tgt, "o_orderkey", ck2, numBuckets = buckets,
          batchDeltas = true, foldAboveBytes = Long.MaxValue)
        var totRw = 0L; var totSec = 0.0; var totDelta = 0L
        var totRows = 0L; var totFiles = 0
        val partsSeen = scala.collection.mutable.Set.empty[String]
        var before = snapshot(tgt)
        for (i <- 0 until 10) {
          val landing = s"$src/f5_$i"
          orders.filter($"o_orderkey" % 10 === 0 && ($"o_orderkey" / 10) % 10 === i)
            .select($"o_orderkey", ($"o_custkey" + 4000000L).as("o_custkey"))
            .write.mode("overwrite").parquet(landing)
          val dSnap = snapshot(landing)
          totDelta += totalBytes(dSnap)
          totRows += deltaRowsOf(landing, spark)
          val (_, sec) = timed(mergeB(s"$src/f5_*"))
          val after = snapshot(tgt)
          val (rw, parts, files) = rewritten(tgt, before, after)
          totRw += rw; totSec += sec; partsSeen ++= parts; totFiles += files
          before = after
        }
        val (_, fsec) = timed(streaming.Streams.foldMergePending(
          spark, tgt, "o_orderkey", buckets))
        val after = snapshot(tgt)
        val (frw, fparts, ffiles) = rewritten(tgt, before, after)
        totRw += frw; totSec += fsec; partsSeen ++= fparts; totFiles += ffiles
        results += Meas("q90_merge_delta10pct_batched10", scale, totSec,
          totalBytes(before), totRows, totDelta, totRw,
          partsSeen.size, partDirs(tgt), totFiles)
        println(results.last)
      }
    }

    // ============ q106/q124: posting-index append and upsert =============
    for ((scale, dir, buckets, k) <- scales) {
      val docs = io.Tables.documents(spark, dir).select($"doc_id", $"text")
      val idx = util.Scratch.dir(s"graft_sidx_pidx_$scale") + "/idx"
      val (_, bootSec) = timed {
        text.PostingIndex.write(
          text.PostingIndex.build(docs, "doc_id", text.TextOps.tokenize($"text")),
          idx, buckets)
      }
      val bootSnap = snapshot(idx)
      results += Meas("q106_index_bootstrap", scale, bootSec, 0L,
        docs.count(), totalBytes(bootSnap), totalBytes(bootSnap),
        partDirs(idx), partDirs(idx), bootSnap.size)
      println(results.last)
      // append delta: 100 NEW docs drawn from ONE replica's vocabulary
      // (a real landing batch shares the corpus vocab, not all of it)
      val newDocs = docs.filter($"doc_id" % k === 0 && $"doc_id" < 100 * k)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
      applyDelta("q106_index_append100", scale, idx, newDocs,
        util.Scratch.dir(s"graft_sidx_pd1_$scale") + "/d") { landing =>
        text.PostingIndex.appendToIndex(spark, idx,
          spark.read.parquet(landing), "doc_id",
          text.TextOps.tokenize($"text"), buckets)
      }
      // upsert path. First upsert bootstraps the doc→bucket sidecar — an
      // O(index) scan paid ONCE per index lifetime; measured separately so
      // the steady-state delta row isn't polluted by it.
      val oneDoc = docs.filter($"doc_id" === 0).limit(1)
      applyDelta("q120_docmap_bootstrap", scale, idx, oneDoc,
        util.Scratch.dir(s"graft_sidx_pd2_$scale") + "/d") { landing =>
        text.PostingIndex.upsertIndex(spark, idx,
          spark.read.parquet(landing), "doc_id",
          text.TextOps.tokenize($"text"), buckets)
      }
      // steady-state UPDATE delta: 100 existing docs re-scraped with
      // changed text (old buckets swept via the sidecar, new appended)
      val rescraped = docs.filter($"doc_id" % k === 0 && $"doc_id" < 100 * k)
        .select($"doc_id", concat($"text", lit(" merges joining")).as("text"))
      applyDelta("q124_index_upsert100", scale, idx, rescraped,
        util.Scratch.dir(s"graft_sidx_pd3_$scale") + "/d") { landing =>
        text.PostingIndex.upsertIndex(spark, idx,
          spark.read.parquet(landing), "doc_id",
          text.TextOps.tokenize($"text"), buckets)
      }
      // the SAME shape of 100-doc UPDATE through the PENDING LIST
      // (round-11 VERDICT item 1): rewritten bytes should be ≈ the delta
      // itself — no base bucket COW — and ~flat across decades where the
      // COW row above grew 520 KB → 6.4 MB
      val rescraped2 = docs.filter($"doc_id" % k === 0 && $"doc_id" < 100 * k)
        .select($"doc_id", concat($"text", lit(" vectors probing")).as("text"))
      applyDelta("q124_upsert100_buffered", scale, idx, rescraped2,
        util.Scratch.dir(s"graft_sidx_pd4_$scale") + "/d") { landing =>
        text.PostingIndex.upsertIndexBuffered(spark, idx,
          spark.read.parquet(landing), "doc_id",
          text.TextOps.tokenize($"text"), buckets)
      }
      // compaction folds the buffered batch back into the base — the ONE
      // COW rewrite that amortizes every batch since the last fold
      // (`delta bytes` here = the pending area being folded)
      locally {
        val pendBytes = text.PostingIndex.pendingBytes(spark, idx)
        val before = snapshot(idx)
        val (_, sec) = timed(
          text.PostingIndex.compactPending(spark, idx, "doc_id", buckets))
        val after = snapshot(idx)
        val (rw, parts, files) = rewritten(idx, before, after)
        results += Meas("q124_pending_compact", scale, sec, totalBytes(before),
          0L, pendBytes, rw, parts.size, partDirs(idx), files)
        println(results.last)
      }
      // the SAME 100-doc re-scrape through the STREAMING maintenance path
      // (round-12 VERDICT item 1: maintainPostingIndex mode=buffered) —
      // the reference's actual write pattern must run at pending-list
      // amplification (~3×), not the COW path's ~275×
      val rescraped3 = docs.filter($"doc_id" % k === 0 && $"doc_id" < 100 * k)
        .select($"doc_id", concat($"text", lit(" streams buffering")).as("text"))
      applyDelta("q365_stream_buffered100", scale, idx, rescraped3,
        util.Scratch.dir(s"graft_sidx_pd5_$scale") + "/d") { landing =>
        val ck = util.Scratch.dir(s"graft_sidx_sbck_$scale")
        streaming.Streams.maintainPostingIndex(
          streaming.Streams.parquetStream(spark, landing,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("text",
                org.apache.spark.sql.types.StringType)))),
          idx, "doc_id", "text", ck, buckets = buckets, mode = "buffered")
      }
      text.PostingIndex.compactPending(spark, idx, "doc_id", buckets) // reset
      // STEADY STATE across the pending-list lifecycle (round-12 VERDICT
      // item 7): N sequential buffered batches, then the ONE compaction
      // that folds them — per-step diffs summed, so the row's `amp` is
      // the honest AMORTIZED bytes-per-batch including the fold (GIN's
      // gin_pending_list_limit steady state). N defaults to 100: the fold
      // rewrites ~the touched base buckets regardless of how many batches
      // it folds (latest-batch-wins collapses repeats), so its per-batch
      // share is foldBytes/N — at N=100 the share drops below the batch's
      // own pending write and the amortized amp lands ≤ ~2× the
      // single-batch number at every scale (the item's done-bar).
      val steadyN = sys.env.getOrElse("SPARK_GRAFT_STEADY_BATCHES", "100").toInt
      locally {
        var totRw = 0L; var totSec = 0.0; var totDelta = 0L
        var totRows = 0L; var totFiles = 0
        val partsSeen = scala.collection.mutable.Set.empty[String]
        var before = snapshot(idx)
        // READ amplification along the pending lifecycle (round-13 VERDICT
        // item 3 — GIN's `gin_pending_list_limit` lesson: overlay search
        // degrades with BATCH COUNT before bytes look big, because every
        // indexed read opens every pending file and resolves
        // latest-batch-wins across all buffered batches). At checkpoints
        // along the steady loop, time the same 2-term indexed search the
        // write rows maintain; `files` records the pending files the
        // overlay opens. Search is min-of-2 (the first run at each
        // checkpoint pays plan compilation jitter).
        def timedSearch(): Double = {
          def once(): Double = timed(
            text.PostingIndex.searchAllIndexed(spark, idx, "doc_id",
              Seq("merges", "joining"), buckets).count())._2
          math.min(once(), once())
        }
        val readChecks = Set(1, 8, 16, 32, 64, steadyN)
        for (i <- 0 until steadyN) {
          val landing = util.Scratch.dir(s"graft_sidx_sd${i}_$scale") + "/d"
          docs.filter($"doc_id" % k === 0 && $"doc_id" < 100 * k)
            .select($"doc_id", concat($"text", lit(s" steady$i word$i")).as("text"))
            .write.mode("overwrite").parquet(landing)
          val dSnap = snapshot(landing)
          totDelta += totalBytes(dSnap)
          totRows += deltaRowsOf(landing, spark)
          val (_, sec) = timed(text.PostingIndex.upsertIndexBuffered(spark, idx,
            spark.read.parquet(landing), "doc_id",
            text.TextOps.tokenize($"text"), buckets,
            compactAboveBytes = Long.MaxValue,
            compactAbovePendingBatches = Int.MaxValue))
          val after = snapshot(idx)
          val (rw, parts, files) = rewritten(idx, before, after)
          totRw += rw; totSec += sec; partsSeen ++= parts; totFiles += files
          before = after
          if (readChecks(i + 1)) {
            val pendFiles = snapshot(idx)
              .count(_._1.contains("/_pending"))
            results += Meas(f"overlay_search@${i + 1}%03dbatches", scale,
              timedSearch(), totalBytes(before), i + 1,
              text.PostingIndex.pendingBytes(spark, idx), 0L, 0, 0, pendFiles)
            println(results.last)
          }
        }
        val (_, csec) = timed(
          text.PostingIndex.compactPending(spark, idx, "doc_id", buckets))
        val after = snapshot(idx)
        val (crw, cparts, cfiles) = rewritten(idx, before, after)
        totRw += crw; totSec += csec; partsSeen ++= cparts; totFiles += cfiles
        results += Meas(s"q124_buffered_steady$steadyN", scale, totSec,
          totalBytes(before), totRows, totDelta, totRw,
          partsSeen.size, partDirs(idx), totFiles)
        println(results.last)
        // the compacted baseline the overlay rows compare against (the
        // calibration target: overlay search ≤ 2× this at the default
        // compactAbovePendingBatches trigger)
        results += Meas("overlay_search@compacted", scale, timedSearch(),
          totalBytes(snapshot(idx)), 0L, 0L, 0L, 0, 0, 0)
        println(results.last)
      }
    }

    // ============ rebucket: a grown index re-sized ∝ N (round-11 item 3) =
    // An index BORN at the ×1 sizing (16 buckets) but holding the ×k
    // corpus — the "grew 10×/100× under maintenance, kept its birth bucket
    // count" shape. Maintenance cost on it is degraded ∝ k (each bucket is
    // k× too wide); after `rebucket` to the ∝N count the same append must
    // return to the fresh-index line (the q106_index_append100 row above).
    for ((scale, dir, buckets, k) <- scales if k > 1) {
      val docs = io.Tables.documents(spark, dir).select($"doc_id", $"text")
      val idx = util.Scratch.dir(s"graft_sidx_rb_$scale") + "/idx"
      // REAL growth under maintenance (not a birth-sized full write): born
      // on the 1/k slice — the birth width the layout marker stamps — then
      // grown k× by append. This is the shape the round-12 rebucket
      // TRIGGER watches for: the growth append and every later apply see
      // mean touched-bucket width ≫ birth and must arm the warning.
      text.PostingIndex.write(
        text.PostingIndex.build(docs.filter($"doc_id" % k === 0), "doc_id",
          text.TextOps.tokenize($"text")),
        idx, 16) // ∝ N sizing for the slice; k× undersized once grown
      text.PostingIndex.appendToIndex(spark, idx,
        docs.filter($"doc_id" % k =!= 0), "doc_id",
        text.TextOps.tokenize($"text"), 16)
      triggerLines += s"rebucket trigger ($scale, after ${k}× growth under append): " +
        text.PostingIndex.lastRebucketWarning.getOrElse("NOT ARMED")
      println(s"[rebucket-trigger] ${triggerLines.last}")
      val newDocs = docs.filter($"doc_id" % k === 0 && $"doc_id" < 100 * k)
        .select(($"doc_id" + 20000000L).as("doc_id"), $"text")
      applyDelta("q106_append100_undersized", scale, idx, newDocs,
        util.Scratch.dir(s"graft_sidx_rb1_$scale") + "/d") { landing =>
        text.PostingIndex.appendToIndex(spark, idx,
          spark.read.parquet(landing), "doc_id",
          text.TextOps.tokenize($"text"), 16)
      }
      triggerLines += s"rebucket trigger ($scale, undersized append100): " +
        text.PostingIndex.lastRebucketWarning.getOrElse("NOT ARMED")
      println(s"[rebucket-trigger] ${triggerLines.last}")
      locally { // the O(index) rewrite itself — the honest amortized cost
        val before = snapshot(idx)
        val (_, sec) = timed(
          text.PostingIndex.rebucket(spark, idx, "doc_id", 16, buckets))
        val after = snapshot(idx)
        val (rw, parts, files) = rewritten(idx, before, after)
        results += Meas("rebucket_execute", scale, sec, totalBytes(before),
          0L, 0L, rw, parts.size, partDirs(idx), files)
        println(results.last)
      }
      val newDocs2 = docs.filter($"doc_id" % k === 0 && $"doc_id" < 100 * k)
        .select(($"doc_id" + 30000000L).as("doc_id"), $"text")
      applyDelta("q106_append100_rebucketed", scale, idx, newDocs2,
        util.Scratch.dir(s"graft_sidx_rb2_$scale") + "/d") { landing =>
        text.PostingIndex.appendToIndex(spark, idx,
          spark.read.parquet(landing), "doc_id",
          text.TextOps.tokenize($"text"), buckets)
      }
      triggerLines += s"rebucket trigger ($scale, post-rebucket append100): " +
        text.PostingIndex.lastRebucketWarning.getOrElse("CLEARED")
      println(s"[rebucket-trigger] ${triggerLines.last}")
      // BATCH-path warn→act (round-13 VERDICT item 5): the same undersized
      // shape, but the armed advice is ACTED on by appendToIndex(
      // autoRebucket = true) itself — no streaming loop involved, so a
      // batch pipeline that ignores stderr still gets the repair. The
      // row's sec/rewritten INCLUDE the in-call fold+rebucket (the honest
      // cost of the act). ×factor only: the behavior is scale-free and the
      // ×factor² undersized construction costs a second 2352×-amp append.
      if (k == factor) {
        val idx2 = util.Scratch.dir(s"graft_sidx_rba_$scale") + "/idx"
        text.PostingIndex.write(
          text.PostingIndex.build(docs.filter($"doc_id" % k === 0), "doc_id",
            text.TextOps.tokenize($"text")),
          idx2, 16)
        text.PostingIndex.appendToIndex(spark, idx2,
          docs.filter($"doc_id" % k =!= 0), "doc_id",
          text.TextOps.tokenize($"text"), 16)
        val newDocs3 = docs.filter($"doc_id" % k === 0 && $"doc_id" < 100 * k)
          .select(($"doc_id" + 40000000L).as("doc_id"), $"text")
        applyDelta("q106_append100_batchauto", scale, idx2, newDocs3,
          util.Scratch.dir(s"graft_sidx_rb3_$scale") + "/d") { landing =>
          text.PostingIndex.appendToIndex(spark, idx2,
            spark.read.parquet(landing), "doc_id",
            text.TextOps.tokenize($"text"), 16, autoRebucket = true)
        }
        val after = text.PostingIndex.layoutBuckets(spark, idx2)
        triggerLines += s"rebucket trigger ($scale, BATCH autoRebucket append100): " +
          (if (after.exists(_ > 16))
            s"ACTED in-call — layout now ${after.get} buckets (was 16)"
          else s"DID NOT ACT — layout still ${after.getOrElse(-1)} buckets")
        println(s"[rebucket-trigger] ${triggerLines.last}")
      }
    }

    // ========== streaming state: sketch/bucket rows, never raw docs ======
    // q152 (CMS aggregate) claims CONSTANT state (a fixed-width sketch per
    // shuffle partition); q203 (LSH dedup buckets) claims state linear in
    // corpus but a small fraction of input bytes (band/bucket rows, never
    // text). Both run through their CATALOG functions with the session
    // checkpoint root redirected so the state store's on-disk footprint is
    // measurable per scale.
    val ckRootKey = "spark.sql.streaming.checkpointLocation"
    for ((scale, dir, _, _) <- scales) {
      for (q <- Seq("q152_stream_cms", "q203_stream_lsh_dedup")) {
        val ckRoot = util.Scratch.dir(s"graft_sidx_ck_${q}_$scale")
        spark.conf.set(ckRootKey, ckRoot)
        val (_, sec) =
          try timed(SparkEntry.queries(q)(spark, dir).count())
          finally spark.conf.unset(ckRootKey)
        val stateBytes = snapshot(ckRoot)
          .filter(_._1.contains("/state/")).values.map(_._1).sum
        val inputBytes = totalBytes(snapshot(s"$dir/documents.parquet"))
        val inputDocs = spark.read.parquet(s"$dir/documents.parquet").count()
        stateResults += StateMeas(q, scale, sec, inputBytes, inputDocs, stateBytes)
        println(stateResults.last)
      }
    }

    // ===================== q213: compaction execute ======================
    // inherently O(N) — one (source, bin) shuffle + full rewrite + audit
    // re-read; the stress question is only whether growth stays ~linear
    val q213 = ops.ExtQueries.queries("q213_compact_execute")
    for ((scale, dir, _, k) <- scales if k <= factor) {
      val (_, sec) = timed(q213(spark, dir).count())
      results += Meas("q213_compact_execute", scale, sec, 0L, 0L, 0L, 0L, 0, 0)
      println(results.last)
    }

    writeSection(results.toSeq, stateResults.toSeq, triggerLines.toSeq,
      factor, cpus, baseDir)
    spark.stop()
  }

  private def deltaRowsOf(landing: String, spark: SparkSession): Long =
    spark.read.parquet(landing).count()

  /** Marker heading: Stress.scala preserves everything from this line on
    * when it regenerates the pair-finder section above it. */
  val SectionMarker = "## Index-maintenance / streaming write family"

  private def writeSection(results: Seq[Meas], stateResults: Seq[StateMeas],
                           triggerLines: Seq[String], factor: Int, cpus: Int,
                           baseDir: String): Unit = {
    def fmtB(b: Long): String =
      if (b >= 1048576L) f"${b / 1048576.0}%.1f MB"
      else f"${b / 1024.0}%.0f KB"
    val md = new StringBuilder
    md ++= s"$SectionMarker\n\n"
    md ++= s"`sbt \"runMain graft.StressIndex\"` — ×$factor replica-scaled corpus\n"
    md ++= s"(`$baseDir`), buckets sized ∝ N (16 at ×1 → ${16 * factor} at ×$factor,\n"
    md ++= "the same sizing rule as the IVF quantizer). Each `delta` row lands a\n"
    md ++= "parquet batch and applies it through the operator's own maintenance\n"
    md ++= "path; `rewritten` is a before/after filesystem diff of the target,\n"
    md ++= "`amp` = bytes rewritten per delta byte, `parts` = touched/total\n"
    md ++= "partition dirs. The O(delta) claim = the delta rows' sec and\n"
    md ++= "rewritten bytes stay ~flat from ×1 to ×" + factor + " while the bootstrap\n"
    md ++= "rows (inherently O(N)) grow ~linearly.\n\n"
    md ++= "| op | scale | sec | base bytes | delta rows | delta bytes | rewritten | amp | parts | files |\n"
    md ++= "|---|---|---|---|---|---|---|---|---|---|\n"
    results.foreach { m =>
      val isBoot = m.op.contains("bootstrap") || m.op.contains("q213") ||
        m.op.contains("rebucket_execute") || m.op.contains("overlay_search")
      val ampS = if (isBoot) "—" else f"${m.amp}%.1f×"
      val baseS = if (m.baseBytes == 0) "—" else fmtB(m.baseBytes)
      val deltaS = if (m.deltaBytes == 0) "—" else fmtB(m.deltaBytes)
      val rwS = if (m.rewrittenBytes == 0) "—" else fmtB(m.rewrittenBytes)
      val partsS = if (m.totalParts == 0) "—" else s"${m.touchedParts}/${m.totalParts}"
      val filesS = if (m.touchedFiles == 0) "—" else m.touchedFiles.toString
      md ++= f"| ${m.op} | ${m.scale} | ${m.sec}%.2f | $baseS | ${m.deltaRows} | $deltaS | $rwS | $ampS | $partsS | $filesS |\n"
    }
    // verdict lines: the claim is judged on the LAST two scale points —
    // the ×1 point is usually SATURATED (a 100-row delta touches all 16
    // buckets), so the first leg mixes saturation relief with scaling;
    // once both points are unsaturated, flat sec/bytes IS the claim.
    md ++= "\n"
    def scaleNum(s: String): Int = s.stripPrefix("x").toInt
    val byOp = results.groupBy(_.op)
    byOp.toSeq.sortBy(_._1).foreach { case (op, ms) =>
      if (!op.contains("bootstrap") && !op.contains("q213") &&
          !op.contains("rebucket_execute") && !op.contains("overlay_search") &&
          ms.size >= 2) {
        val pts = ms.sortBy(m => scaleNum(m.scale))
        val (lo, hi) = (pts(pts.size - 2), pts.last)
        val dataR = scaleNum(hi.scale) / scaleNum(lo.scale)
        val secR = hi.sec / math.max(lo.sec, 1e-9)
        val rwR = hi.rewrittenBytes.toDouble / math.max(lo.rewrittenBytes, 1).toDouble
        md ++= f"- `$op` (×${scaleNum(lo.scale)}→×${scaleNum(hi.scale)}, ×$dataR data): time ${secR}%.1f×, rewritten-bytes ${rwR}%.1f×"
        md ++= (if (op.contains("batched10"))
          " — the pending-parked wide-delta path; see the auto-batching bullet below.\n"
        else if (op.contains("delta10pct"))
          " — the documented boundary: keys ≫ buckets touches every bucket, a full rewrite (batch deltas — batchDeltas=true — or raise buckets).\n"
        else if (op.contains("undersized"))
          " — the DELIBERATE degraded case: birth-sized buckets on a ×k corpus, rewrite ∝ bucket width ∝ k; the rebucket bullet below is the measured fix.\n"
        else if (secR <= 2.5 && rwR <= 2.5)
          " — O(delta) holds: maintenance cost ~independent of base size.\n"
        else
          " — SUPERLINEAR in base size on the unsaturated leg; the touched-bucket pruning is not holding, investigate.\n")
      }
    }
    // cross-op verdicts the per-op loop cannot see
    def at(op: String, scale: String): Option[Meas] =
      results.find(m => m.op == op && m.scale == scale)
    for {
      m <- results if m.op == "q90_merge_delta10pct_split10"
      b <- at("q90_merge_delta10pct", m.scale)
    } md ++= f"- batching measured (${m.scale}): the same 10%% delta as 10 sequential merges rewrote ${m.rewrittenBytes / math.max(b.rewrittenBytes, 1).toDouble}%.1f× the bytes (${m.sec / math.max(b.sec, 1e-9)}%.1f× the time) of the ONE batched merge — the wide-delta guard's 'batch deltas' advice, quantified.\n"
    // the round-14 closure of that advice: batchDeltas=true retires the
    // boundary as machinery — 10 wide sub-deltas park at ~delta cost and
    // ONE fold pays the rewrite once (amp ≈ the single batched merge)
    for {
      m <- results if m.op == "q90_merge_delta10pct_batched10"
      s10 <- at("q90_merge_delta10pct_split10", m.scale)
      b <- at("q90_merge_delta10pct", m.scale)
    } md ++= f"- auto-batching (${m.scale}): the SAME 10 sequential wide sub-deltas through `batchDeltas=true` + one fold rewrote ${fmtB(m.rewrittenBytes)} (amp ${m.amp}%.1f×) vs the un-batched split's ${fmtB(s10.rewrittenBytes)} (amp ${s10.amp}%.1f×) — ${s10.rewrittenBytes / math.max(m.rewrittenBytes, 1).toDouble}%.1f× less, ≈ the ONE batched merge's ${b.amp}%.1f× line: the q90 wide-delta boundary is retired by machinery, not advice (oracle-gated by q367).\n"
    for {
      m <- results if m.op == "q124_upsert100_buffered"
      c <- at("q124_index_upsert100", m.scale)
    } md ++= f"- pending list (${m.scale}): the buffered 100-doc upsert rewrote ${fmtB(m.rewrittenBytes)} (amp ${m.amp}%.1f×) vs the COW path's ${fmtB(c.rewrittenBytes)} (amp ${c.amp}%.1f×) — ${c.rewrittenBytes / math.max(m.rewrittenBytes, 1).toDouble}%.0f× less per batch, amortized into one compaction.\n"
    // the streamed maintenance path (mode=buffered) must pay pending-list
    // amplification, not the COW stream path's — round-12 item 1's done-bar
    for {
      m <- results if m.op == "q365_stream_buffered100"
      b <- at("q124_upsert100_buffered", m.scale)
      c <- at("q124_index_upsert100", m.scale)
    } md ++= f"- streamed-buffered (${m.scale}): the SAME 100-doc re-scrape through `maintainPostingIndex(mode=buffered)` rewrote ${fmtB(m.rewrittenBytes)} (amp ${m.amp}%.1f×) — the batch pending-list line's ${fmtB(b.rewrittenBytes)} (amp ${b.amp}%.1f×), not the COW stream path's ${fmtB(c.rewrittenBytes)} (amp ${c.amp}%.1f×): the reference's actual write pattern now rides the cheap path end-to-end.\n"
    // amortized steady state (round-12 item 7's done-bar: amortized amp
    // ≤ ~2× the single-batch number, fold included)
    for {
      m <- results if m.op.startsWith("q124_buffered_steady")
      s <- at("q124_upsert100_buffered", m.scale)
      c <- at("q124_index_upsert100", m.scale)
    } {
      val n = m.op.stripPrefix("q124_buffered_steady")
      val ok = if (m.amp <= 2.0 * s.amp) "within" else "ABOVE"
      md ++= f"- buffered steady state (${m.scale}): $n sequential buffered batches + the ONE fold rewrote ${fmtB(m.rewrittenBytes)} for ${fmtB(m.deltaBytes)} of deltas — amortized amp ${m.amp}%.1f×/batch, $ok 2× the single-batch ${s.amp}%.1f× (done-bar) and ${c.amp / math.max(m.amp, 1e-9)}%.0f× below the per-batch COW ${c.amp}%.1f×.\n"
    }
    // pending-overlay READ amplification (round-13 item 3): search latency
    // vs pending-batch count against the post-compaction read, per scale —
    // the measurement the compactAbovePendingBatches default calibrates on
    locally {
      val scalesSeen = results.filter(_.op == "overlay_search@compacted")
        .map(_.scale).distinct
      scalesSeen.foreach { sc =>
        val base = results.find(m =>
          m.op == "overlay_search@compacted" && m.scale == sc).get
        val pts = results
          .filter(m => m.op.startsWith("overlay_search@") &&
            m.op.endsWith("batches") && m.scale == sc)
          .sortBy(_.deltaRows)
        if (pts.nonEmpty && base.sec > 0) {
          val line = pts.map(m =>
            f"@${m.deltaRows} ${m.sec}%.2f s (${m.sec / base.sec}%.1f×, ${m.touchedFiles} pending files)")
            .mkString("; ")
          val atTrigger = pts
            .filter(_.deltaRows <= text.PostingIndex.CompactAbovePendingBatchesDefault)
            .lastOption
          md ++= f"- overlay READ amp ($sc): compacted search ${base.sec}%.2f s; with pending batches: $line."
          atTrigger.foreach { t =>
            val ok = if (t.sec <= 2.0 * base.sec) "within" else "ABOVE"
            md ++= f" At the default `compactAbovePendingBatches = ${text.PostingIndex.CompactAbovePendingBatchesDefault}` trigger the overlay read is ${t.sec / base.sec}%.1f× the compacted read — $ok the 2× calibration bar."
          }
          // separate the CONSTANT overlay-machinery term (latest-wins
          // joins + epoch guard + pending-scan stages — paid at ANY batch
          // count, removed only by compaction) from the ACCUMULATION term
          // the batch-count trigger actually controls: at toy decades the
          // constant dominates (compacted scan ≈ 0.2 s), which is a
          // fixed-stage-count artifact, not a scale law
          pts.headOption.foreach { one =>
            md ++= f" (@1-batch ratio ${one.sec / base.sec}%.1f× is the overlay machinery CONSTANT; the trigger bounds the growth beyond it — read the decade where scan work dominates the constants.)"
          }
          md ++= "\n"
        }
      }
    }
    for {
      u <- results if u.op == "q106_append100_undersized"
      r <- at("q106_append100_rebucketed", u.scale)
      f <- at("q106_index_append100", u.scale)
    } md ++= f"- rebucket (${u.scale}): append to the birth-sized (16-bucket) grown index rewrote ${fmtB(u.rewrittenBytes)}; after `rebucket` to the ∝N count the same append rewrote ${fmtB(r.rewrittenBytes)} vs the fresh-index line's ${fmtB(f.rewrittenBytes)} — post-rebucket maintenance returns to the fresh line.\n"
    // the batch-auto act's cost is IN its row by design: sec/rewritten
    // include the in-call fold+rebucket, so the number reads as the one
    // apply that paid the repair, not a steady-state regression
    for { m <- results if m.op == "q106_append100_batchauto" }
      md ++= f"- batch-auto rebucket (${m.scale}): the same undersized append through `appendToIndex(autoRebucket=true)` measured ${m.sec}%.2f s / ${fmtB(m.rewrittenBytes)} rewritten — the row INCLUDES the in-call ∝N repair rewrite (the act's one-time cost; the trigger line shows it ACTED, and the post-rebucket row shows later maintenance back at the fresh line).\n"
    // the trigger policy's observed state at each undersized/recovered step
    triggerLines.foreach(l => md ++= s"- $l\n")
    // clustered-write contract (`files` column): every partitioned write
    // holds each partition dir at ≈ one data file — the worst files-per-
    // touched-dir ratio across all applies is the measured invariant
    // (unclustered, each write task adds a file to every dir it touches:
    // tasks × buckets files, the pre-round-12 failure mode).
    locally {
      // split10 and steadyN are SUMS over sequential applies of the same
      // dirs (N applies × k dirs = N files/dir by construction) — rate
      // only the single-apply rows the per-apply contract is about
      val rated = results.filter(m => m.touchedFiles > 0 && m.touchedParts > 0 &&
        !m.op.contains("split10") && !m.op.contains("batched10") &&
        !m.op.contains("_steady"))
      if (rated.nonEmpty) {
        val worst = rated.maxBy(m => m.touchedFiles.toDouble / m.touchedParts)
        md ++= f"- clustered-write contract: files-per-touched-dir ≤ ${worst.touchedFiles.toDouble / worst.touchedParts}%.2f across every single apply (worst: ${worst.op} ${worst.scale}, ${worst.touchedFiles} files / ${worst.touchedParts} dirs) — one same-bytes shuffle per write holds partition dirs at ≈ one splittable file for the index lifetime; unclustered this was tasks × buckets files per write.\n"
      }
    }
    if (stateResults.nonEmpty) {
      md ++= "\n### Streaming state footprint (state = sketch/bucket rows, never raw docs)\n\n"
      md ++= "Catalog functions run with the session checkpoint root redirected;\n"
      md ++= "`state` is the state store's on-disk bytes after the run. Claims:\n"
      md ++= "q152's CMS state is a FIXED-WIDTH sketch (absolute KBs at any\n"
      md ++= "corpus size — its residual byte drift is delta-file count ×\n"
      md ++= "compression of the near-empty arrays, not data); q203's LSH bucket\n"
      md ++= "state is a CONSTANT ~8 fixed-width band rows per doc — bytes/doc is\n"
      md ++= "the scale-invariant to read. (This corpus averages ~120 B/doc, so\n"
      md ++= "state/input can exceed 1 here; on real multi-KB documents the same\n"
      md ++= "per-doc state is percent-level.)\n\n"
      md ++= "| op | scale | sec | input bytes | docs | state bytes | state B/doc |\n"
      md ++= "|---|---|---|---|---|---|---|\n"
      stateResults.foreach { m =>
        md ++= f"| ${m.op} | ${m.scale} | ${m.sec}%.2f | ${fmtB(m.inputBytes)} | ${m.inputDocs} | ${fmtB(m.stateBytes)} | ${m.perDoc}%.0f |\n"
      }
      val byOp = stateResults.groupBy(_.op)
      md ++= "\n"
      byOp.toSeq.sortBy(_._1).foreach { case (op, ms) =>
        val pts = ms.sortBy(m => m.scale.stripPrefix("x").toInt)
        if (pts.size >= 2) {
          val (lo, hi) = (pts.head, pts.last)
          val dataR = hi.inputDocs.toDouble / math.max(lo.inputDocs, 1).toDouble
          val pdR = hi.perDoc / math.max(lo.perDoc, 1e-9)
          if (hi.stateBytes <= 262144)
            md ++= f"- `$op`: state stays ${fmtB(hi.stateBytes)} at ×$dataR%.0f docs — fixed-width sketch, the constant-state claim holds.\n"
          else if (pdR <= 1.3 && pdR >= 0.7)
            md ++= f"- `$op`: ${lo.perDoc}%.0f → ${hi.perDoc}%.0f state bytes/doc across ×$dataR%.0f docs — constant per-doc bucket rows, never raw text.\n"
          else
            md ++= f"- `$op`: state bytes/doc moved ${pdR}%.1f× across ×$dataR%.0f docs — NOT the fixed per-doc shape claimed; investigate.\n"
        }
      }
    }
    md ++= "\nGenerated by `sbt \"runMain graft.StressIndex\"` on " +
      java.time.LocalDate.now() + ".\n"

    // splice into STRESS.md below the pair-finder section
    val p = java.nio.file.Paths.get("STRESS.md")
    val existing =
      if (java.nio.file.Files.exists(p))
        new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
      else ""
    val head = existing.indexOf(SectionMarker) match {
      case -1 => if (existing.isEmpty) "" else existing.stripSuffix("\n") + "\n\n"
      case i  => existing.substring(0, i)
    }
    java.nio.file.Files.writeString(p, head + md.toString)
    println(s"wrote ${p.toAbsolutePath} (index-maintenance section)")
  }
}
