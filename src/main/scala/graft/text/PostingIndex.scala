package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F2 at scale: the GIN-inverted-index equivalent as an exploded posting
  * table (SURVEY §2.7 F2 scale path; reference `init_tables.py:56-57`).
  *
  * The array-predicate form of full-text match (`TextOps.tsMatchAll`) scans
  * every document per query — fine for one-off scans, wrong for repeated
  * search at 100 TB. The posting table inverts once: `(lexeme, doc_id)`
  * rows, stored partitioned/bucketed BY LEXEME so a term lookup touches
  * only that term's partitions (the moral equivalent of walking one GIN
  * posting list), and search becomes a tiny filter + groupBy instead of a
  * corpus scan. AND-of-terms = "docs hit by all k distinct terms", one
  * shuffle on doc_id bounded by the posting lists' size, not the corpus.
  */
object PostingIndex {

  /** Build the posting table from a tokenized corpus. Tokens are already
    * distinct per doc (tokenize dedupes), so (lexeme, doc_id) is unique. */
  def build(docs: DataFrame, idCol: String, tokens: Column): DataFrame =
    docs.select(explode(tokens).as("lexeme"), col(idCol))

  /** Persist the index partitioned by a lexeme hash bucket — term lookups
    * prune to one partition; doc lists inside stay clustered per lexeme.
    * The bucket count is stamped into a root-level layout marker so
    * [[appendToIndex]] / the indexed searches can reject a mismatched
    * `buckets` argument instead of silently hashing into the wrong
    * partitions (dynamic partition overwrite leaves root-level files
    * untouched, so the marker survives appends). */
  def write(postings: DataFrame, path: String, buckets: Int = 64): Unit =
    withWriterLease(postings.sparkSession, path) {
    // ZERO postings (every doc tokenized to stopwords — a plausible first
    // micro-batch): partitionBy writes no files at all, leaving a layout
    // whose every later read dies with UNABLE_TO_INFER_SCHEMA. Anchor the
    // schema with one zero-row file in bucket 0 (partition value comes
    // from the dir name, so reads and appends see the normal layout).
    // The WHOLE path is cleared first so this branch has the same
    // mode(overwrite) semantics as the non-empty one — anchoring only
    // bucket 0 over an existing populated layout would leave buckets
    // 1..N-1 alive (stale postings still searchable) under a fresh marker.
    if (postings.isEmpty) {
      val root = new org.apache.hadoop.fs.Path(path)
      val rfs = root.getFileSystem(
        postings.sparkSession.sessionState.newHadoopConf())
      if (rfs.exists(root)) rfs.delete(root, true)
      postings.limit(0).write.mode("overwrite")
        .parquet(s"$path/lexeme_bucket=0")
    } else postings
      .withColumn("lexeme_bucket", pmod(hash(col("lexeme")), lit(buckets)))
      // cluster by the partition dir BEFORE the partitioned write: without
      // it every write task emits one file into every bucket dir its rows
      // hash across — file count ∝ tasks × buckets (measured 173 s for a
      // 190 MB ×100-stress bootstrap, dominated by ~50k file creates; at
      // 100 TB that is millions of small files and a namenode problem).
      // One shuffle of the same bytes makes each dir ≈ one file, and the
      // secondary lexeme sort clusters a term's postings into contiguous
      // row groups so term lookups skip by parquet min/max stats.
      .repartition(col("lexeme_bucket"))
      .sortWithinPartitions(col("lexeme_bucket"), col("lexeme"))
      .write.mode("overwrite")
      .partitionBy("lexeme_bucket")
      .parquet(path)
    // the doc→bucket sidecar the UPSERT path sweeps by is NOT built here:
    // eagerly bootstrapping it taxed every index build (and, by existing,
    // made every streamed append pay a sidecar maintenance write) with a
    // full extra read+shuffle+write that search/append-only users never
    // need — measured at +50-95% on the q89/q109/q119 family in round 6.
    // upsertBatch bootstraps it lazily (one O(index) scan, paid once) the
    // first time a document UPDATE actually needs the old-bucket sweep,
    // and maintains it incrementally from then on.
    val p = new org.apache.hadoop.fs.Path(path, LayoutMarker)
    val fs = p.getFileSystem(postings.sparkSession.sessionState.newHadoopConf())
    // line 2: birth size in bytes — the ∝N sizing rule's reference point
    // for the maintenance-time rebucket trigger (one metadata call at
    // write time; the sidecar/pending areas don't exist yet, so this is
    // exactly the bucketed payload)
    val birthBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val out = fs.create(p, true)
    try out.write(s"$buckets\n$birthBytes"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    }

  // ------------------------------------------------ single-writer lease
  //
  // Every maintenance path below (write/append/upsert/buffered/compact/
  // rebucket and the streaming loop that drives them) ASSUMES one writer
  // per index path: two loops interleaving COW rewrites, pending appends,
  // epoch bumps and a rebucket swap would corrupt the index with no
  // detection. Postgres gets this for free from heavyweight locks; the
  // reference's 20-worker UPDATE pattern (`scrape_all_filings.py:177-183`)
  // is exactly the workload that would double-drive one index here.
  // The mechanics (atomic create-no-overwrite claim, per-thread
  // reentrancy, mtime heartbeat, atomic-rename stale takeover) live in
  // the shared [[graft.util.WriterLease]] — the KV-merge bases in
  // `Streams` carry the same contract through the same implementation.

  /** Age (ms of lock-file mtime) after which a writer lease is presumed
    * crashed and taken over — forwards to
    * [[graft.util.WriterLease.staleAfterMs]] (one knob for every
    * maintained layout). The holder heartbeats at a third of this, so a
    * live lease never goes stale regardless of apply length. */
  def WriterLeaseStaleAfterMs: Long = graft.util.WriterLease.staleAfterMs
  def WriterLeaseStaleAfterMs_=(v: Long): Unit = {
    graft.util.WriterLease.staleAfterMs = v
  }

  /** Take the single-writer lease on `indexPath`. Public so an
    * orchestrator can fence a window spanning several maintenance
    * calls; see [[graft.util.WriterLease.acquire]]. */
  def acquireWriterLease(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String): Unit =
    graft.util.WriterLease.acquire(spark, indexPath, "index")

  /** Release the current thread's lease on `indexPath`. */
  def releaseWriterLease(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String): Unit =
    graft.util.WriterLease.release(spark, indexPath)

  /** Manual repair: forcibly delete `indexPath`'s lock marker. Only for an
    * operator who has verified the named holder is dead. */
  def breakWriterLease(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String): Unit =
    graft.util.WriterLease.breakLease(spark, indexPath)

  private def withWriterLease[A](spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String)(body: => A): A =
    graft.util.WriterLease.withLease(spark, indexPath, "index")(body)

  /** Root-level file recording the bucket modulus the index was written
    * with (underscore prefix: ignored by parquet directory listings).
    * Since round 13 the marker carries a SECOND line: the index's birth
    * size in bytes, from which the rebucket trigger derives the birth
    * bytes-per-bucket the ∝N sizing rule established — markers written
    * before that line existed simply disable the trigger (parse below
    * reads line 1 for the modulus either way). */
  private val LayoutMarker = "_graft_index_buckets"

  private def readMarkerLines(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String): Option[Array[String]] = {
    val p = new org.apache.hadoop.fs.Path(indexPath, LayoutMarker)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      Some(txt.split('\n').map(_.trim).filter(_.nonEmpty))
    }
  }

  /** The bucket modulus the index on disk was actually written with
    * (layout-marker line 1) — None for pre-marker indexes. Public because
    * a maintenance loop that may [[rebucket]] between batches must
    * re-read the CURRENT modulus rather than trust its constructor
    * argument across the swap. */
  def layoutBuckets(spark: org.apache.spark.sql.SparkSession,
                    indexPath: String): Option[Int] =
    readMarkerLines(spark, indexPath).flatMap(_.headOption)
      .flatMap(s => scala.util.Try(s.toInt).toOption)

  /** Birth bytes-per-bucket stamped at [[write]]/[[rebucket]] time —
    * the reference width the maintenance-time rebucket trigger compares
    * against. None for indexes written before the marker's second line. */
  private def birthBucketWidth(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, buckets: Int): Option[Double] =
    readMarkerLines(spark, indexPath).flatMap(_.lift(1))
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .map(_.toDouble / buckets)

  /** Reject a `buckets` argument that disagrees with the written layout:
    * postings hashed with a different modulus would land in (or prune to)
    * the wrong partitions — appended docs silently unfindable, and the
    * (id, bucket) idempotence anti-join defeated. Indexes written before
    * the marker existed are trusted as-called. */
  private def requireLayout(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, buckets: Int): Unit =
    readMarkerLines(spark, indexPath).foreach { lines =>
      // a marker that EXISTS but parses to nothing (zero-byte file from a
      // crash between create-truncate and write) must fail loudly, not
      // silently trust the caller's modulus — the silent path is exactly
      // the wrong-partition hashing this guard exists to prevent
      val line = lines.headOption.getOrElse(throw new IllegalArgumentException(
        s"layout marker at $indexPath exists but is empty/corrupt — " +
          s"refusing to trust buckets=$buckets; restore the marker " +
          "(first line: bucket modulus) before maintaining this index"))
      val written = line.toInt
      require(written == buckets,
        s"index at $indexPath was written with $written lexeme buckets; " +
          s"caller passed buckets=$buckets — postings would hash into the " +
          "wrong partitions")
    }

  // ------------------------------------------------ rebucket trigger

  /** Mean-touched-bucket-width growth over birth width at which the
    * maintenance paths flag the layout as undersized. Bucket count is
    * sized ∝ N at bootstrap; an index grown k× under maintenance keeps
    * its birth modulus, so per-batch rewrite cost (O(touched buckets ×
    * bucket size)) and search pruning both degrade k× — the measured
    * undersized case costs 3006× write amplification at the ×100 stress
    * scale where the ∝N layout costs ~30× (STRESS.md). 4× is loud enough
    * to never fire on healthy jitter and early enough that one rebucket
    * restores the fresh-index line. */
  val RebucketWarnFactor = 4.0

  /** Max touched-bucket dirs probed per apply by the rebucket trigger —
    * the width sample is unbiased at any size (uniform hashing), so the
    * cap trades nothing but sampling noise for a bounded metadata cost. */
  val RebucketProbeBuckets = 16

  /** Floor on the birth bucket width used for SIZING the rebucket
    * suggestion (the ARMING ratio keeps the real birth width — an index
    * genuinely outgrown 4× should warn regardless of how small it was
    * born). An index bootstrapped from a degenerate corpus — the
    * empty-postings anchor, or one all-stopword micro-batch — stamps a
    * birthBytes of little more than a parquet footer, and an UNFLOORED
    * `ceil(buckets × meanWidth / birthWidth)` then extrapolates a
    * pathological modulus (10⁵–10⁶ buckets: a partition-dir explosion,
    * not a repair) the moment real data lands. 64 KB ≈ the smallest
    * bucket worth its per-file overhead, so suggestions target at least
    * that width. */
  val MinSizingBucketWidth: Long = 64L * 1024

  /** Most recent undersized-layout warning, None after a healthy apply —
    * same observability contract as `Streams.lastWideDeltaWarning`: the
    * maintenance loop (or a monitor) reads it, and the text also goes to
    * stderr loudly at apply time. */
  @volatile var lastRebucketWarning: Option[String] = None

  /** The machine-readable twin of [[lastRebucketWarning]] — armed and
    * cleared in exact tandem with it, but keyed PER INDEX: unlike the
    * read-only warning string, this slot drives an ACTION
    * (`Streams.maintainPostingIndex(autoRebucket=true)` rebuckets on it),
    * so two maintenance loops over different indexes in one JVM must not
    * clobber each other's arm/clear. */
  case class RebucketAdvice(indexPath: String, buckets: Int, suggested: Int,
                            ratio: Double)
  private val rebucketAdviceByPath =
    new java.util.concurrent.ConcurrentHashMap[String, RebucketAdvice]()

  /** The advice armed by the most recent apply against `indexPath`, if
    * its mean touched-bucket width outgrew the birth sizing — None after
    * a healthy apply on that same index. */
  def rebucketAdvice(indexPath: String): Option[RebucketAdvice] =
    Option(rebucketAdviceByPath.get(indexPath))

  /** Clear `indexPath`'s armed advice — the act step calls this after the
    * swap so the next healthy batch starts clean. */
  def clearRebucketAdvice(indexPath: String): Unit = {
    rebucketAdviceByPath.remove(indexPath)
    ()
  }

  /** Measure the buckets this apply just rewrote against the birth
    * sizing rule and arm/clear [[lastRebucketWarning]]. O(touched)
    * filesystem metadata calls — never a full-index walk; the touched
    * buckets are an unbiased width sample because lexeme hashing is
    * uniform. Indexes without a birth-width stamp skip the check. */
  private def rebucketCheck(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, buckets: Int,
                            touched: Seq[Int]): Unit = {
    if (touched.isEmpty) return
    birthBucketWidth(spark, indexPath, buckets).foreach { birth =>
      if (birth > 0) {
        val fs = new org.apache.hadoop.fs.Path(indexPath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        // bound the metadata probe: a broad apply can touch every bucket,
        // and getContentSummary is a recursive listing (a real per-batch
        // tail on object stores). Lexeme hashing is uniform, so ANY
        // bucket subset is an unbiased width sample — an evenly-strided
        // 16 of the touched set measures the same mean the full walk
        // would, at O(1) metadata calls per apply.
        val sampled =
          if (touched.size <= RebucketProbeBuckets) touched
          else {
            val s = touched.sorted
            (0 until RebucketProbeBuckets)
              .map(i => s(i * s.size / RebucketProbeBuckets))
          }
        val widths = sampled.flatMap { b =>
          val d = new org.apache.hadoop.fs.Path(indexPath, s"lexeme_bucket=$b")
          if (fs.exists(d)) Some(fs.getContentSummary(d).getLength) else None
        }
        val armed =
          if (widths.isEmpty) None
          else {
            val meanWidth = widths.sum.toDouble / widths.size
            val ratio = meanWidth / birth
            if (ratio >= RebucketWarnFactor) {
              // SIZING is decoupled from ARMING (round-13 ADVICE): the
              // suggestion targets a post-rebucket bucket width of
              // max(birth, MinSizingBucketWidth) — never the raw birth
              // stamp, which a degenerate bootstrap (empty/all-stopword
              // first batch) leaves at footer scale and which would
              // extrapolate a small-file explosion instead of a repair.
              // Clamped to ≥ buckets+1 so the suggestion is always an
              // actable layout change.
              val suggest = math.max(buckets + 1,
                math.ceil(buckets * meanWidth /
                  math.max(birth, MinSizingBucketWidth.toDouble)).toInt)
              Some((ratio, suggest))
            } else None
          }
        armed match {
          case Some((ratio, suggest)) => rebucketAdviceByPath.put(indexPath,
            RebucketAdvice(indexPath, buckets, suggest, ratio))
          case None => rebucketAdviceByPath.remove(indexPath)
        }
        lastRebucketWarning = armed.map { case (ratio, suggest) =>
          f"PostingIndex at $indexPath has grown ${ratio}%.1f× past its " +
            f"birth bucket width (mean touched bucket ${widths.sum / widths.size}%d B " +
            f"vs birth ${birth}%.0f B): per-batch rewrite cost and search pruning " +
            f"degrade with bucket width — rebucket($buckets -> ~$suggest) to " +
            "restore the fresh-index maintenance line"
        }
        lastRebucketWarning.foreach(System.err.println)
      }
    }
  }

  // ------------------------------------------------- doc→bucket sidecar

  /** Root-level sidecar directory (underscore prefix: invisible to parquet
    * reads of the index itself) holding the DISTINCT `(id, lexeme_bucket)`
    * pairs of every indexed posting, partitioned by `id_bucket =
    * pmod(hash(id), buckets)`. This is what makes document UPDATE scale:
    * an edited doc's OLD postings live in the buckets of its OLD lexeme
    * set — buckets the new text may never hash into — and without a
    * doc-keyed map, finding them is an O(index) sweep (the main layout
    * prunes by lexeme, not by doc). With it, [[upsertBatch]] prunes the
    * sidecar to the batch ids' `id_bucket` partitions and reads back
    * exactly the bucket set to sweep. The map is an OVER-approximation by
    * contract: a stale pair (doc re-upserted away from a bucket) only adds
    * a no-op bucket to a later sweep, never hides one — so sidecar
    * maintenance can stay append-cheap. */
  private val DocMapDir = "_docmap"
  private val DocMapPartCol = "id_bucket"

  private def docMapPath(indexPath: String) = s"$indexPath/$DocMapDir"

  private def hasDocMap(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(docMapPath(indexPath))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Write doc-map rows `(id, lexeme_bucket, id_bucket)`: the whole map on
    * bootstrap, or (dynamic partition overwrite) just the touched
    * `id_bucket` partitions on maintenance. */
  /** Run `body` with `partitionOverwriteMode=dynamic`, restoring the
    * previous session value after — the one place this conf juggling
    * lives (it was copy-pasted at three write sites before). */
  private def withDynamicPartitionOverwrite[A](
      spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(conf)
    try { spark.conf.set(conf, "dynamic"); body }
    finally prev.fold(spark.conf.unset(conf))(v => spark.conf.set(conf, v))
  }

  private def writeDocMapSlice(pairs: DataFrame, indexPath: String,
                               overwriteAll: Boolean): Unit = {
    val spark = pairs.sparkSession
    // cluster by the partition dir first (same rationale as [[write]]):
    // the bootstrap's upstream distinct() leaves rows shuffled by
    // (id, bucket) hash, so an unclustered write sprays tasks × id-bucket
    // files (the ×100 stress docmap bootstrap spent 167 s on a 133 MB map
    // that way); the slice path likewise accretes ~touched-dirs files per
    // maintenance batch for the life of the index.
    val clustered = pairs.repartition(col(DocMapPartCol))
    if (overwriteAll) {
      // bootstrap over an EMPTY index: partitionBy of zero rows writes no
      // files, and a schemaless sidecar dir breaks every later pruned
      // read — anchor the schema like write() does for the main layout
      if (pairs.isEmpty)
        pairs.limit(0).drop(DocMapPartCol).write.mode("overwrite")
          .parquet(s"${docMapPath(indexPath)}/$DocMapPartCol=0")
      else
        clustered.write.mode("overwrite").partitionBy(DocMapPartCol)
          .parquet(docMapPath(indexPath))
    } else withDynamicPartitionOverwrite(spark) {
      clustered.write.mode("overwrite").partitionBy(DocMapPartCol)
        .parquet(docMapPath(indexPath))
    }
  }

  /** Merge a batch's distinct `(id, lexeme_bucket)` pairs into the sidecar
    * (append semantics — the upsert path fuses its merge+prune passes
    * inline in [[upsertBatch]]), rewriting only the batch ids' `id_bucket`
    * partitions. Existing pairs for OTHER docs in those partitions are
    * carried over; since (A ∖ B) ∪ B ≡ A ∪ B the merge is a plain
    * union+distinct, no anti-join. `idParts` is the batch ids' id_bucket
    * set, collected by the caller (fused into the touched-bucket probe —
    * it used to be a second job). */
  private def maintainDocMap(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String,
                             newPairs: DataFrame, idCol: String, buckets: Int,
                             idParts: Seq[Int]): Unit = {
    val withPart = newPairs
      .withColumn(DocMapPartCol, pmod(hash(col(idCol)), lit(buckets)))
    val base = readPartDirs(spark, docMapPath(indexPath), DocMapPartCol,
      idParts, withPart.columns)
    val snap = base.unionByName(withPart).distinct().localCheckpoint(true)
    writeDocMapSlice(snap, indexPath, overwriteAll = false)
    snap.unpersist()
  }

  /** Read ONLY the named partition dirs of a partitioned layout, by
    * explicit path with `basePath` (so the partition column survives) —
    * never read-all + `isin` filter: a whole-table read LISTS every
    * partition directory before pruning, O(total buckets) driver work per
    * maintenance batch, measured as the dominant small-delta cost at the
    * ×100 stress scale (the bytes were already flat; the listing wasn't).
    * Probing existence of the ≤ |values| requested dirs is O(delta).
    * Missing dirs (a bucket never yet written) are skipped; if none exist
    * the result is an empty frame with `wantCols`' shape. */
  private def readPartDirs(spark: org.apache.spark.sql.SparkSession,
                           tablePath: String, partCol: String,
                           values: Seq[Int], wantCols: Seq[String]): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val paths = values.map(v => s"$tablePath/$partCol=$v")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val df =
      if (paths.isEmpty) {
        // none of the requested dirs exist: the empty result frame still
        // needs the layout's schema — derive it from ONE existing
        // partition dir (a single root listStatus), never a full-table
        // read, whose limit(0) would re-list every partition dir — the
        // exact O(total buckets) cost this method exists to avoid
        val one = fs.listStatus(new org.apache.hadoop.fs.Path(tablePath))
          .collectFirst {
            case st if st.isDirectory &&
              st.getPath.getName.startsWith(s"$partCol=") => st.getPath.toString
          }
        one match {
          case Some(p) =>
            spark.read.option("basePath", tablePath).parquet(p).limit(0)
          case None => // unpartitioned/empty layout: full read is trivial
            spark.read.parquet(tablePath).limit(0)
        }
      }
      else spark.read.option("basePath", tablePath).parquet(paths: _*)
    // wantCols empty = the layout's NATIVE columns (callers that gate on
    // schema, e.g. the positional/plain mixing guard, need them unshaped)
    if (wantCols.isEmpty) df else df.select(wantCols.map(col): _*)
  }

  /** [[readPartDirs]] for the main lexeme-bucket layout, native columns —
    * append/upsert compare them against the batch to reject plain-into-
    * positional mixing before any rewrite happens. */
  private def readBuckets(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, touched: Seq[Int]): DataFrame =
    readPartDirs(spark, indexPath, "lexeme_bucket", touched, Nil)

  /** One-time migration for an index written before the sidecar existed:
    * derive the complete doc→bucket map from the index itself (the one
    * unavoidable O(index) scan, paid once — every later upsert prunes). */
  private def bootstrapDocMap(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String, idCol: String,
                              buckets: Int): Unit =
    writeDocMapSlice(
      spark.read.parquet(indexPath)
        .select(col(idCol), col("lexeme_bucket")).distinct()
        .withColumn(DocMapPartCol, pmod(hash(col(idCol)), lit(buckets))),
      indexPath, overwriteAll = true)

  /** F2+F4 composed — near-real-time index maintenance, the Spark-native
    * replacement for the reference's tsvector trigger keeping its GIN index
    * current as new filings land (`sec_dl/utils/init_tables.py:59-67`):
    * append a batch of NEW documents to an on-disk [[write]]-layout index
    * by rewriting ONLY the lexeme-bucket partitions the batch's postings
    * hash into (the `Streams.incrementalMergeBucketed` pattern at posting
    * granularity). Per-batch cost is O(touched buckets × bucket size),
    * never O(index) — at a 100 TB corpus with buckets sized to a few GB, a
    * small batch rewrites a bounded set of partitions while searches keep
    * pruning to their terms' buckets.
    *
    * Idempotent per bucket: a doc id already present in a touched bucket
    * keeps its existing rows and the batch's recomputed rows for THAT
    * bucket are dropped (anti-join on (id, bucket)), so re-running an
    * applied batch rewrites identical contents, and a batch interrupted
    * between partition commits heals on retry. Append-only by contract:
    * EDITING a document requires removing its old postings from buckets
    * this batch may not touch — that delete sweep is [[upsertIndex]]. */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                    newDocs: DataFrame, idCol: String, tokens: Column,
                    buckets: Int = 64, autoRebucket: Boolean = false): Unit =
    appendBatch(spark, indexPath, build(newDocs, idCol, tokens), idCol, buckets,
      autoRebucket)

  /** [[appendToIndex]] for a POSITIONAL index (one written from
    * [[buildPositional]], q109's layout): the batch carries (lexeme, pos)
    * rows so phrase search stays correct over the maintained index. Same
    * touched-bucket rewrite and (id, bucket) idempotence — a doc's posting
    * rows for a bucket ride together, positions included. */
  def appendToIndexPositional(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                              newDocs: DataFrame, idCol: String, textCol: Column,
                              buckets: Int = 64, autoRebucket: Boolean = false): Unit =
    appendBatch(spark, indexPath, buildPositional(newDocs, idCol, textCol), idCol,
      buckets, autoRebucket)

  private def appendBatch(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                          built: DataFrame, idCol: String, buckets: Int,
                          autoRebucket: Boolean = false): Unit =
    withWriterLease(spark, indexPath) {
    // heal a crashed rebucket swap BEFORE the layout probe (one fs.exists
    // when healthy): in the crash window indexPath does not exist and the
    // corpus sits stranded at <path>.rebucket_old
    recoverRebucketSwap(spark, indexPath)
    requireLayout(spark, indexPath, buckets)
    require(!hasPending(spark, indexPath),
      s"index at $indexPath has a buffered pending area — a direct append's " +
        "(id, bucket) idempotence check cannot see buffered postings: " +
        "compactPending first, or maintain through upsertIndexBuffered")
    // localCheckpoint: the batch feeds three consumers (touched-bucket
    // collect, anti-join probe, union side) — uncheckpointed, each would
    // re-run the tokenize+explode
    val batch = built
      .withColumn("lexeme_bucket", pmod(hash(col("lexeme")), lit(buckets)))
      .localCheckpoint()
    // ONE collect for both driver-side sets (was two sequential jobs):
    // the touched lexeme buckets and — for the sidecar merge below — the
    // batch ids' id_bucket partitions
    val probe = batch.select(col("lexeme_bucket").as("v"), lit(0).as("k"))
      .unionByName(batch.select(
        pmod(hash(col(idCol)), lit(buckets)).cast("int").as("v"), lit(1).as("k")))
      .distinct().collect()
    val touched = probe.collect { case r if r.getInt(1) == 0 => r.getInt(0) }.toSeq
    val idParts = probe.collect { case r if r.getInt(1) == 1 => r.getInt(0) }.toSeq
    if (touched.nonEmpty) {
      val base = readBuckets(spark, indexPath, touched)
      require(base.columns.toSet == batch.columns.toSet,
        s"index at $indexPath has columns ${base.columns.sorted.mkString(",")} but the " +
          s"batch built ${batch.columns.sorted.mkString(",")} — positional indexes " +
          "(pos column) must be appended with appendToIndexPositional, plain ones " +
          "with appendToIndex")
      val fresh = batch.join(base.select(col(idCol), col("lexeme_bucket")),
        Seq(idCol, "lexeme_bucket"), "left_anti")
      // materialize the merged slice off the files about to be replaced
      // (also lifts Spark's overwrite-what-you-read guard); clustered by
      // bucket so each rewritten dir stays ≈ one file — unclustered, the
      // batch-side tasks add a file to every touched dir per append and
      // the bucket's file count grows with its maintenance history
      // keep write()'s secondary lexeme sort through every rewrite: the
      // layout's term lookups skip row groups by parquet min/max stats,
      // and a hash-shuffled unsorted rewrite would permanently widen each
      // maintained bucket's min/max to the whole bucket
      val snap = base.unionByName(fresh.select(base.columns.map(col).toIndexedSeq: _*))
        .repartition(col("lexeme_bucket"))
        .sortWithinPartitions(col("lexeme_bucket"), col("lexeme"))
        .localCheckpoint(true)
      // sidecar FIRST (merge semantics — an extra pair is a no-op sweep
      // member by the over-approximation contract): written after the
      // index, a crash in between would leave fresh rows in buckets a
      // later upsert's sweep never visits — resurrected ghosts
      if (hasDocMap(spark, indexPath))
        maintainDocMap(spark, indexPath,
          newPairs = batch.select(col(idCol), col("lexeme_bucket")).distinct(),
          idCol, buckets, idParts)
      withDynamicPartitionOverwrite(spark) {
        snap.write.partitionBy("lexeme_bucket").mode("overwrite").parquet(indexPath)
      }
      snap.unpersist()
      rebucketCheck(spark, indexPath, buckets, touched)
    }
    batch.unpersist()
    if (autoRebucket) { actOnRebucketAdvice(spark, indexPath, idCol); () }
    }

  /** Document UPDATE against a written index — the Spark-native analog of
    * the reference's `BEFORE UPDATE OR INSERT` tsvector trigger
    * (`sec_dl/utils/init_tables.py:59-67`; the scrape loop's whole job is
    * UPDATEs, `sec_dl/utils/scrape_all_filings.py:169-171`): each incoming
    * doc's postings REPLACE whatever the index held for that id. The sweep
    * visits the union of the docs' OLD buckets (recovered from the
    * [[DocMapDir]] sidecar with an id-pruned scan, never an O(index) walk)
    * and the new postings' buckets: old rows of the incoming ids are
    * anti-joined away, new rows appended, and only that bucket set is
    * rewritten. A doc that tokenizes to nothing is a pure DELETE.
    * Idempotent: re-applying the batch deletes-then-reinserts identical
    * rows, so contents converge (q120 double-applies to pin this). Cost is
    * O(touched buckets × bucket size) + an id-bucket-pruned sidecar
    * read — same bound as [[appendToIndex]], plus the old-bucket sweep the
    * reference's UPDATE semantics require. */
  def upsertIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                  docs: DataFrame, idCol: String, tokens: Column,
                  buckets: Int = 64, autoRebucket: Boolean = false): Unit =
    upsertBatch(spark, indexPath, build(docs, idCol, tokens),
      docs.select(col(idCol)).distinct(), idCol, buckets,
      autoRebucket = autoRebucket)

  /** [[upsertIndex]] for a POSITIONAL index ([[buildPositional]]'s layout):
    * the replacement postings carry (lexeme, pos) so phrase search stays
    * correct after the edit. */
  def upsertIndexPositional(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                            docs: DataFrame, idCol: String, textCol: Column,
                            buckets: Int = 64, autoRebucket: Boolean = false): Unit =
    upsertBatch(spark, indexPath, buildPositional(docs, idCol, textCol),
      docs.select(col(idCol)).distinct(), idCol, buckets,
      autoRebucket = autoRebucket)

  private def upsertBatch(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                          built: DataFrame, docIds: DataFrame, idCol: String,
                          buckets: Int, fromCompaction: Boolean = false,
                          autoRebucket: Boolean = false): Unit =
    withWriterLease(spark, indexPath) {
    recoverRebucketSwap(spark, indexPath) // see appendBatch
    requireLayout(spark, indexPath, buckets)
    require(fromCompaction || !hasPending(spark, indexPath),
      s"index at $indexPath has a buffered pending area — a direct COW upsert " +
        "would not see (or supersede) its batches: compactPending first, or " +
        "keep maintaining through upsertIndexBuffered")
    if (!hasDocMap(spark, indexPath)) bootstrapDocMap(spark, indexPath, idCol, buckets)
    val batch = built
      .withColumn("lexeme_bucket", pmod(hash(col("lexeme")), lit(buckets)))
      .localCheckpoint()
    val ids = docIds.localCheckpoint()
    // ONE collect serves both driver-side sets (they were two sequential
    // jobs over the same checkpointed frames): the batch postings' lexeme
    // buckets and the ids' id_bucket partitions (the sidecar dirs to
    // prune the old-bucket sweep to).
    val probe = batch.select(col("lexeme_bucket").as("v"), lit(0).as("k"))
      .unionByName(ids.select(
        pmod(hash(col(idCol)), lit(buckets)).cast("int").as("v"), lit(1).as("k")))
      .distinct().collect()
    val batchBuckets = probe.collect { case r if r.getInt(1) == 0 => r.getInt(0) }
    val idParts = probe.collect { case r if r.getInt(1) == 1 => r.getInt(0) }.toSeq
    // the sweep set: buckets the ids' OLD postings live in (sidecar,
    // pruned to the ids' id_bucket partitions) ∪ the NEW postings'
    // buckets. This pruned sidecar read ALSO feeds both doc-map slices
    // below — it used to be re-read once per slice.
    val dmBase = readPartDirs(spark, docMapPath(indexPath), DocMapPartCol,
      idParts, Seq(idCol, "lexeme_bucket", DocMapPartCol))
    val oldBuckets = dmBase
      .join(ids, Seq(idCol), "left_semi")
      .select(col("lexeme_bucket")).distinct().collect().map(_.getInt(0))
    val touched = (batchBuckets ++ oldBuckets).distinct.toSeq
    if (touched.nonEmpty) {
      val base = readBuckets(spark, indexPath, touched)
      require(base.columns.toSet == batch.columns.toSet,
        s"index at $indexPath has columns ${base.columns.sorted.mkString(",")} but the " +
          s"batch built ${batch.columns.sorted.mkString(",")} — positional indexes " +
          "(pos column) must be upserted with upsertIndexPositional, plain ones " +
          "with upsertIndex")
      // REPLACE semantics: drop every existing row of the incoming ids,
      // then add the recomputed postings
      val kept = base.join(ids, Seq(idCol), "left_anti")
      // clustered by bucket + lexeme-sorted before the checkpoint+write
      // (see appendBatch: the sort preserves row-group min/max skipping)
      val snap = kept.unionByName(batch.select(base.columns.map(col).toIndexedSeq: _*))
        .repartition(col("lexeme_bucket"))
        .sortWithinPartitions(col("lexeme_bucket"), col("lexeme"))
        .localCheckpoint(true)
      // dynamic overwrite skips partitions ABSENT from the output — a
      // bucket whose last postings were just deleted must be removed by
      // hand or its files survive as ghosts
      val remaining = snap.select(col("lexeme_bucket")).distinct()
        .collect().map(_.getInt(0)).toSet
      // Both doc-map slices derive from ONE checkpoint of the pruned
      // sidecar read (dmBase) — the merge/prune passes used to re-collect
      // the id partitions and re-read the sidecar dirs each (the prune
      // even re-read the files the merge had just written). The flag
      // column marks the ids' old pairs so the prune slice can drop them
      // without a second read; (A ∖ B) ∪ B ≡ A ∪ B, so the merge slice
      // needs no anti-join at all.
      val newPairs = batch.select(col(idCol), col("lexeme_bucket")).distinct()
        .withColumn(DocMapPartCol, pmod(hash(col(idCol)), lit(buckets)))
      val dmSnap = dmBase
        .join(ids.withColumn("graft_of_ids", lit(true)), Seq(idCol), "left")
        .localCheckpoint(true)
      // WAL-style sidecar ordering: MERGE the new pairs in BEFORE the
      // index write (an extra pair is a no-op sweep member by the
      // over-approximation contract), so a crash between the two writes
      // can never leave fresh rows in a bucket the sidecar doesn't know —
      // the under-approximate map that resurrects ghosts on the next
      // sweep. The prune pass below drops the ids' old pairs once the
      // rewrite is durable.
      writeDocMapSlice(
        dmSnap.drop("graft_of_ids").unionByName(newPairs).distinct(),
        indexPath, overwriteAll = false)
      withDynamicPartitionOverwrite(spark) {
        snap.write.partitionBy("lexeme_bucket").mode("overwrite").parquet(indexPath)
      }
      snap.unpersist()
      val fs = new org.apache.hadoop.fs.Path(indexPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      touched.filterNot(remaining).foreach { b =>
        val dir = new org.apache.hadoop.fs.Path(indexPath, s"lexeme_bucket=$b")
        if (fs.exists(dir)) { fs.delete(dir, true); () }
      }
      // prune pass: (pairs of OTHER ids) ∪ (the ids' new pairs) — exactly
      // what re-reading the merged slice and anti-joining `ids` produced,
      // but from the same pre-write snapshot, no second sidecar read
      writeDocMapSlice(
        dmSnap.filter(col("graft_of_ids").isNull).drop("graft_of_ids")
          .unionByName(newPairs).distinct(),
        indexPath, overwriteAll = false)
      dmSnap.unpersist()
      rebucketCheck(spark, indexPath, buckets, touched)
    }
    batch.unpersist()
    ids.unpersist()
    if (autoRebucket) { actOnRebucketAdvice(spark, indexPath, idCol); () }
    }

  // --------------------------------------- buffered upsert (pending list)
  //
  // The COW upsert above pays O(touched buckets × bucket size) per batch:
  // a ~100 B posting change COW-rewrites every touched ~60 KB bucket, and
  // because a doc's lexemes spray across buckets, measured amplification
  // reached 452× at the ×100 stress scale (STRESS.md, q124). This is the
  // exact problem Postgres GIN solves with `fastupdate`: inserts go to an
  // unorganized PENDING LIST that every search also scans, and the list
  // is merged into the main index structure only when it exceeds
  // `gin_pending_list_limit` (or at VACUUM) — amortizing the expensive
  // per-key structure maintenance over many batches. Same design here:
  //
  //  - [[upsertIndexBuffered]] appends the batch's postings — stamped
  //    with a monotone batch number — to a root-level `_pending` area
  //    partitioned by the SAME lexeme buckets (so term searches prune the
  //    pending scan exactly like the main layout), and logs pure deletes
  //    (docs that tokenize to nothing) to `_pending_deletes`. Bytes
  //    written per batch ≈ the delta itself; NO base bucket is rewritten.
  //  - every indexed read goes through [[indexRelation]], which overlays
  //    the pending area: base rows of any pending-touched id are dropped,
  //    and only each id's LATEST batch of pending postings is live — so
  //    repeated edits of one doc resolve exactly like sequential COW
  //    upserts would.
  //  - [[compactPending]] folds the live pending rows through the normal
  //    [[upsertIndex]] machinery (ONE touched-bucket COW rewrite for many
  //    buffered batches) and clears the pending area; triggered
  //    explicitly or when the area exceeds `compactAboveBytes`.
  //
  // Crash contract (documented, matching the retry-heals idempotence of
  // the COW paths): postings land before the delete log, so a batch
  // interrupted between the two writes leaves its upserts fully visible
  // and only a PURE delete unapplied — re-running the batch heals it.
  // Compaction is idempotent: re-applying a compacted pending area
  // replaces ids with identical rows.

  private val PendingDir = "_pending"
  private val PendingDeletesDir = "_pending_deletes"
  private val BatchCol = "pending_batch"

  /** Root-level monotone compaction counter. [[compactPending]] bumps it
    * (BEFORE deleting the pending files, so there is no window where the
    * files are gone but the epoch still matches); [[indexRelation]]
    * captures it at build time and re-checks it at EXECUTION time, so a
    * lazy DataFrame planned over the pending overlay and executed after a
    * compaction fails with a message naming the hazard instead of a bare
    * FileNotFoundException — or, under `spark.sql.files
    * .ignoreMissingFiles=true`, instead of SILENTLY missing every
    * buffered edit (the round-12 VERDICT item 4 enforcement). */
  private val EpochMarker = "_graft_pending_epoch"

  // epoch read/write/bump/stamp and the execution-time guard are the
  // SHARED pending-epoch implementation (graft.util.PendingEpoch) — the
  // KV-merge base's batched-delta mode runs the identical protocol, so
  // the subtle parts (atomic tmp+rename writes, executor-shipped Hadoop
  // conf, nondeterministic guard) are audited once
  private def readEpochRaw(indexPath: String,
                           conf: org.apache.hadoop.conf.Configuration): Long =
    graft.util.PendingEpoch.read(indexPath, EpochMarker, conf)

  private def bumpEpoch(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String): Unit =
    graft.util.PendingEpoch.bump(spark, indexPath, EpochMarker)

  /** Re-stamp a given epoch (rebucket carries the compaction epoch across
    * the directory swap — a freshly-swapped layout that silently reset to
    * epoch 0 would let a stale pre-compaction overlay plan pass the
    * guard and then hit the deleted pending files). */
  private def stampEpoch(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, epoch: Long): Unit =
    graft.util.PendingEpoch.stamp(spark, indexPath, EpochMarker, epoch)

  /** See [[graft.util.PendingEpoch.guardFrame]] — cross-joined onto BOTH
    * overlay union sides so a read planned before a compaction fails
    * loudly when executed after it. */
  private def epochGuardFrame(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String): DataFrame =
    graft.util.PendingEpoch.guardFrame(spark, indexPath, EpochMarker) {
      (builtAt, now) =>
        s"posting index at $indexPath was compacted (pending epoch $now; this " +
          s"read was planned at epoch $builtAt) after this DataFrame was built " +
          "— the pending files it lazily references are gone. Rebuild the " +
          "read, or materialize it (localCheckpoint(true) / write) before " +
          "calling compactPending."
    }

  private def pendingPath(indexPath: String) = s"$indexPath/$PendingDir"
  private def pendingDeletesPath(indexPath: String) = s"$indexPath/$PendingDeletesDir"

  private def fsOf(spark: org.apache.spark.sql.SparkSession,
                   path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def hasPending(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String): Boolean = {
    val fs = fsOf(spark, indexPath)
    fs.exists(new org.apache.hadoop.fs.Path(pendingPath(indexPath))) ||
      fs.exists(new org.apache.hadoop.fs.Path(pendingDeletesPath(indexPath)))
  }

  /** Default pending-batch-count compaction trigger. Bytes alone calibrate
    * compaction to the WRITE side; the READ side degrades with BATCH COUNT
    * — each overlay search opens every pending file and resolves
    * latest-batch-wins across all buffered batches — and does so long
    * before the byte threshold looks big (the GIN `gin_pending_list_limit`
    * lesson: search latency is why the knob exists). Measured in
    * STRESS.md's overlay-read rows: at the ×100 decade the overlay search
    * crosses ~2× the compacted read's latency in the tens of batches, so
    * 32 keeps steady-state reads inside the 2× envelope while still
    * amortizing the fold across a useful batch count. */
  val CompactAbovePendingBatchesDefault: Int = 32

  /** Number of buffered batches currently in the pending area (0 after a
    * compaction — batch stamps restart). The read-side compaction
    * trigger's measure; O(pending) to compute. */
  def pendingBatches(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String): Long =
    graft.util.PendingEpoch.readStamp(spark, indexPath, PendingSeqMarker)
      .getOrElse(scanMaxBatch(spark, indexPath) + 1L)

  /** On-disk size of the pending area (the compaction trigger's measure —
    * GIN's `gin_pending_list_limit` analog). */
  def pendingBytes(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): Long = {
    val fs = fsOf(spark, indexPath)
    Seq(pendingPath(indexPath), pendingDeletesPath(indexPath)).map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum
  }

  /** The index relation every indexed read path scans: the base layout
    * alone when no pending area exists (one existence probe, plan
    * unchanged), else base ⊳ pending overlay. The overlay joins are all
    * pending-sized — broadcast by construction, bounded by the compaction
    * threshold — and the `lexeme_bucket` partition filter the callers
    * apply pushes through the union into BOTH scans, so term searches
    * keep pruning to their buckets on the pending side too. */
  private def indexRelation(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, idCol: String): DataFrame = {
    val base = spark.read.parquet(indexPath)
    if (!hasPending(spark, indexPath)) return base
    // execution-time compaction guard on BOTH union sides AND woven into
    // the pending scans themselves (livePending's guard parameter). The
    // live side alone is not enough: in the deletes-only pending case
    // live is a limit(0) frame, which OptimizeLimitZero +
    // PropagateEmptyRelation fold to an empty relation — taking the
    // cross-joined guard with it — while the anti-join side still lazily
    // scans the (deleted) _pending_deletes files. And output-side guards
    // alone are not enough either: AQE materializes the pending scans'
    // shuffle/broadcast stages in PARALLEL with the guard's, so an
    // unguarded pending scan can surface a bare FAILED_READ_FILE before
    // the guard stage runs — guarding the scans makes their stages
    // DEPEND on the guard broadcast, which must throw first.
    val guard = broadcast(epochGuardFrame(spark, indexPath))
    val (live, superseded) = livePending(spark, indexPath, idCol, Some(guard))
    val guarded = live.crossJoin(guard).drop("graft_epoch_live")
    base.join(broadcast(superseded), Seq(idCol), "left_anti")
      .crossJoin(guard).drop("graft_epoch_live")
      .unionByName(guarded.select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** (live pending postings, superseded doc ids): an id's live rows are
    * its LATEST batch's postings; every id any pending batch touched —
    * including pure deletes — is superseded in the base. With `guard`
    * given, every pending scan is cross-joined against it INSIDE its own
    * stage (see [[indexRelation]]'s AQE rationale); the compaction fold
    * passes None — it reads the area it is about to delete under the
    * writer lease, no staleness possible. */
  private def livePending(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, idCol: String,
                          guard: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    def guarded(df: DataFrame): DataFrame =
      guard.fold(df)(g => df.crossJoin(g).drop("graft_epoch_live"))
    val fs = fsOf(spark, indexPath)
    val pendP = new org.apache.hadoop.fs.Path(pendingPath(indexPath))
    val delP = new org.apache.hadoop.fs.Path(pendingDeletesPath(indexPath))
    val pend =
      if (fs.exists(pendP)) guarded(spark.read.parquet(pendingPath(indexPath)))
      else return { // deletes-only pending area (every batch was a purge)
        val dels = guarded(spark.read.parquet(pendingDeletesPath(indexPath)))
          .select(col(idCol)).distinct()
        (spark.read.parquet(indexPath).limit(0), dels)
      }
    val touched = pend.select(col(idCol), col(BatchCol))
    val all =
      if (fs.exists(delP))
        touched.unionByName(
          guarded(spark.read.parquet(pendingDeletesPath(indexPath)))
            .select(col(idCol), col(BatchCol)))
      else touched
    val latest = all.groupBy(col(idCol)).agg(max(col(BatchCol)).as(BatchCol))
    val live = pend.join(broadcast(latest), Seq(idCol, BatchCol), "left_semi")
      .drop(BatchCol)
    (live, latest.select(col(idCol)))
  }

  /** The base layout's column names (partition col included) from ONE
    * existing bucket directory — one root listStatus, never a full
    * partition discovery (O(total buckets) listing per call). */
  private def baseLayoutCols(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String): Seq[String] = {
    val fs = fsOf(spark, indexPath)
    fs.listStatus(new org.apache.hadoop.fs.Path(indexPath))
      .collectFirst {
        case st if st.isDirectory &&
          st.getPath.getName.startsWith("lexeme_bucket=") => st.getPath.toString
      } match {
      case Some(p) =>
        spark.read.option("basePath", indexPath).parquet(p).columns.toSeq
      case None => spark.read.parquet(indexPath).columns.toSeq // empty layout
    }
  }

  /** Root counter marker holding the next pending batch stamp —
    * underscore-prefixed (parquet listings ignore it), cleared by
    * [[compactPending]] so stamps (and the batch-count trigger) restart
    * at 0 with each fresh pending generation. */
  private val PendingSeqMarker = "_graft_pending_seq"

  /** Max batch stamp present across both pending areas, -1 when empty —
    * the one-time migration fallback for pre-counter layouts (the area is
    * compaction-bounded, so this scan is O(pending), not O(index)). */
  private def scanMaxBatch(spark: org.apache.spark.sql.SparkSession,
                           indexPath: String): Long = {
    if (!hasPending(spark, indexPath)) return -1L
    val fs = fsOf(spark, indexPath)
    val maxes = Seq(pendingPath(indexPath), pendingDeletesPath(indexPath))
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
      .map { d =>
        spark.read.parquet(d).agg(max(col(BatchCol))).head() match {
          case r if r.isNullAt(0) => -1L
          case r                  => r.getLong(0)
        }
      }
    (maxes :+ -1L).max
  }

  /** Claim the next monotone batch stamp — O(1) counter-marker reads via
    * the shared [[graft.util.PendingEpoch.claimNextStamp]] (safe under
    * the writer lease), not a per-park Spark scan of the whole pending
    * area: that scan's cost grows with batch count, which is exactly the
    * dimension a parking run grows along. */
  private def nextBatch(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String): Long =
    graft.util.PendingEpoch.claimNextStamp(spark, indexPath, PendingSeqMarker,
      scanMaxBatch(spark, indexPath))

  /** Document UPDATE through the pending list — [[upsertIndex]] semantics
    * (REPLACE each incoming doc's postings; empty tokenization = DELETE)
    * at ~delta-sized write cost: the batch appends to `_pending` instead
    * of COW-rewriting every touched bucket, and the expensive rewrite is
    * deferred to [[compactPending]] — automatically once the area
    * exceeds `compactAboveBytes` (GIN `fastupdate` / pending-list design;
    * reference trigger semantics `sec_dl/utils/init_tables.py:59-67`).
    * Searches see buffered edits immediately via [[indexRelation]]. */
  def upsertIndexBuffered(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                          docs: DataFrame, idCol: String, tokens: Column,
                          buckets: Int = 64,
                          compactAboveBytes: Long = 64L * 1024 * 1024,
                          compactAbovePendingBatches: Int = CompactAbovePendingBatchesDefault,
                          autoRebucket: Boolean = false): Unit =
    upsertBuffered(spark, indexPath, build(docs, idCol, tokens),
      docs.select(col(idCol)).distinct(), idCol, buckets, compactAboveBytes,
      compactAbovePendingBatches, autoRebucket)

  /** [[upsertIndexBuffered]] for a POSITIONAL index — the pending rows
    * carry (lexeme, pos) so phrase search stays correct over the overlay. */
  def upsertIndexBufferedPositional(spark: org.apache.spark.sql.SparkSession,
                                    indexPath: String, docs: DataFrame, idCol: String,
                                    textCol: Column, buckets: Int = 64,
                                    compactAboveBytes: Long = 64L * 1024 * 1024,
                                    compactAbovePendingBatches: Int = CompactAbovePendingBatchesDefault,
                                    autoRebucket: Boolean = false): Unit =
    upsertBuffered(spark, indexPath, buildPositional(docs, idCol, textCol),
      docs.select(col(idCol)).distinct(), idCol, buckets, compactAboveBytes,
      compactAbovePendingBatches, autoRebucket)

  private def upsertBuffered(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                             built: DataFrame, docIds: DataFrame, idCol: String,
                             buckets: Int, compactAboveBytes: Long,
                             compactAbovePendingBatches: Int = CompactAbovePendingBatchesDefault,
                             autoRebucket: Boolean = false): Unit =
    withWriterLease(spark, indexPath) {
    recoverRebucketSwap(spark, indexPath) // see appendBatch
    requireLayout(spark, indexPath, buckets)
    val batchNo = nextBatch(spark, indexPath)
    val batch = built
      .withColumn("lexeme_bucket", pmod(hash(col("lexeme")), lit(buckets)))
      .withColumn(BatchCol, lit(batchNo))
      .localCheckpoint()
    // schema guard BEFORE any write, as the COW paths do — a positional
    // batch buffered onto a plain index would poison every later read.
    // Columns come from ONE partition dir (single root listing), not a
    // whole-index read: full partition discovery is O(total buckets) of
    // driver listing per batch — measured as 0.7 → 3.5 s across ×1→×100
    // on an otherwise ~flat buffered apply before this probe existed.
    val baseCols = baseLayoutCols(spark, indexPath).toSet
    val batchCols = batch.columns.toSet - BatchCol
    require(baseCols == batchCols,
      s"index at $indexPath has columns ${baseCols.toSeq.sorted.mkString(",")} but the " +
        s"batch built ${batchCols.toSeq.sorted.mkString(",")} — positional indexes " +
        "must be buffered with upsertIndexBufferedPositional, plain ones " +
        "with upsertIndexBuffered")
    // postings FIRST, delete log second (crash contract above); clustered
    // by bucket so each buffered batch adds ≤ 1 file per touched pending
    // dir — the overlay read opens every pending file on every search, so
    // unclustered batches would compound tasks × dirs files until the
    // next compaction. A PURE-delete batch (every doc tokenized empty)
    // builds ZERO postings — writing it would create a schemaless
    // `_pending` dir (only _SUCCESS) that every later overlay read dies
    // on with UNABLE_TO_INFER_SCHEMA; such batches live in the delete log
    // alone (livePending's deletes-only branch reads exactly that shape)
    if (!batch.isEmpty)
      batch.repartition(col("lexeme_bucket"))
        .write.mode("append").partitionBy("lexeme_bucket")
        .parquet(pendingPath(indexPath))
    // materialize ONCE: the anti-join re-runs the caller's docs source
    // scan + distinct, and isEmpty-then-write would pay it twice per
    // buffered batch
    val pureDeletes = docIds
      .join(batch.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
      .withColumn(BatchCol, lit(batchNo))
      .localCheckpoint(true)
    if (!pureDeletes.isEmpty)
      pureDeletes.write.mode("append").parquet(pendingDeletesPath(indexPath))
    pureDeletes.unpersist()
    batch.unpersist()
    // compaction triggers on EITHER measure: bytes (the pending area's
    // write-side footprint) or batch COUNT (the read side — every overlay
    // search pays a per-batch latest-wins resolve and opens every pending
    // file, so reads degrade with batch count long before bytes look big;
    // GIN's gin_pending_list_limit lesson, measured in STRESS.md's
    // overlay-read rows). batchNo is 0-based: batchNo+1 batches exist now.
    if (pendingBytes(spark, indexPath) > compactAboveBytes ||
        batchNo + 1 >= compactAbovePendingBatches)
      compactPending(spark, indexPath, idCol, buckets)
    if (autoRebucket) { actOnRebucketAdvice(spark, indexPath, idCol); () }
    }

  /** Fold the pending area into the base layout — ONE touched-bucket COW
    * rewrite (plus sidecar sweep) for every batch buffered since the last
    * compaction — then clear it. The fold reuses [[upsertIndex]]'s exact
    * machinery with the resolved live rows, so compacted and
    * never-buffered indexes are byte-identical in semantics; idempotent
    * on retry (replace-by-id converges). GIN analog: the pending-list
    * merge at `gin_pending_list_limit` / VACUUM.
    *
    * Laziness hazard — ENFORCED, not just documented (round-12 VERDICT
    * item 4): compaction DELETES the pending files, so any
    * still-unexecuted DataFrame built from an indexed read before the
    * compaction lazily references files that no longer exist. Every
    * overlay read carries an execution-time epoch check
    * ([[epochGuardFrame]]): executing such a plan after a compaction
    * raises an IllegalStateException naming the hazard and the remedy
    * (rebuild the read, or materialize with `localCheckpoint(true)` /
    * write BEFORE compacting) — never a bare FileNotFoundException, and
    * never silently-empty results under ignoreMissingFiles=true. */
  def compactPending(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     idCol: String, buckets: Int = 64): Unit =
    withWriterLease(spark, indexPath) {
      if (hasPending(spark, indexPath)) {
        val (live, superseded) = livePending(spark, indexPath, idCol)
        val liveSnap = live.drop("lexeme_bucket").localCheckpoint(true)
        val idsSnap = superseded.localCheckpoint(true)
        upsertBatch(spark, indexPath, liveSnap, idsSnap, idCol, buckets,
          fromCompaction = true)
        liveSnap.unpersist()
        idsSnap.unpersist()
        // epoch bump BEFORE the delete: a crash in between leaves the
        // pending files intact (reads planned after the bump see the folded
        // base + the still-idempotent overlay — correct rows; a retry
        // re-folds and deletes), and there is never a window where the
        // files are gone but an old plan's epoch still matches
        bumpEpoch(spark, indexPath)
        // counter BEFORE the pending dirs (see PendingEpoch.clearStamp):
        // a crash in between falls back to the migration scan; the
        // reverse order would strand a stale counter over an empty area
        graft.util.PendingEpoch.clearStamp(spark, indexPath, PendingSeqMarker)
        val fs = fsOf(spark, indexPath)
        Seq(pendingPath(indexPath), pendingDeletesPath(indexPath)).foreach { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          if (fs.exists(p)) { fs.delete(p, true); () }
        }
      }
    }

  // ------------------------------------------------------------- rebucket

  /** Re-partition a GROWN index under a new bucket modulus. Bucket count
    * is sized ∝ N at bootstrap only; an index that grows 10× under
    * maintenance keeps its birth bucket count, so bucket width — and with
    * it per-batch rewrite cost (O(touched buckets × bucket size)) and
    * search pruning granularity — degrades 10×. This reads the index ONCE
    * (inherently O(index); the operation exists to amortize that scan
    * over every later batch), rewrites it under `newBuckets` into a temp
    * sibling directory — stamping the new layout marker, so the q109
    * mismatch guard starts enforcing the new modulus immediately — and
    * swaps it in. The doc→bucket sidecar, whose pairs are defined by the
    * OLD modulus, is rebuilt under the new one when present.
    *
    * The swap is two directory renames (old layout aside, new layout in,
    * then delete). Each rename is atomic on HDFS-like stores, but the
    * pair is not one transaction: a reader racing the swap can observe a
    * missing directory, and a crash between the renames leaves the index
    * at `<path>.rebucket_old` (recover by renaming it back). Run it like
    * the compaction it is — from the maintenance job, not concurrently
    * with readers. Requires a compacted index: buffered pending batches
    * hash by the old modulus and would be orphaned. */
  def rebucket(spark: org.apache.spark.sql.SparkSession, indexPath: String,
               idCol: String, oldBuckets: Int, newBuckets: Int): Unit =
    withWriterLease(spark, indexPath) {
    recoverRebucketSwap(spark, indexPath) // heal a previously crashed swap
    requireLayout(spark, indexPath, oldBuckets)
    require(!hasPending(spark, indexPath),
      s"index at $indexPath has a buffered pending area hashed by the old " +
        "modulus — compactPending before rebucket")
    require(newBuckets > 0 && newBuckets != oldBuckets,
      s"rebucket $oldBuckets → $newBuckets is not a layout change")
    val fs = fsOf(spark, indexPath)
    val tmp = s"$indexPath.rebucket_tmp"
    val old = s"$indexPath.rebucket_old"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
    // one full read, rewritten under the new modulus; write() stamps the
    // new layout marker. The underscore-prefixed sidecar is invisible to
    // the parquet read and rebuilt below instead.
    write(spark.read.parquet(indexPath).drop("lexeme_bucket"), tmp, newBuckets)
    if (hasDocMap(spark, indexPath))
      bootstrapDocMap(spark, tmp, idCol, newBuckets)
    // compaction epoch carries ACROSS the swap: the new directory starting
    // back at epoch 0 would let a stale pre-compaction overlay plan pass
    // the execution-time guard and then hit the deleted pending files
    stampEpoch(spark, tmp,
      readEpochRaw(indexPath, spark.sessionState.newHadoopConf()))
    val src = new org.apache.hadoop.fs.Path(indexPath)
    require(fs.rename(src, new org.apache.hadoop.fs.Path(old)),
      s"rebucket: could not move $indexPath aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), src),
      s"rebucket: could not swap in $tmp — old layout is at $old")
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
    // the tmp layout's own write() lease marker is released already; the
    // swap renamed only the data directory, so indexPath's lease (ours,
    // a sibling file) is untouched
    ()
    }

  /** Heal a crash between [[rebucket]]'s two renames. The hazard: with the
    * index moved to `<path>.rebucket_old` and the new layout not yet
    * swapped in, `<path>` does not exist — a maintenance loop's bootstrap
    * probe would then treat the NEXT batch as a fresh index and silently
    * re-create it with only that batch's docs, stranding the whole corpus
    * at the `.rebucket_old` path. Called at the start of [[rebucket]] and
    * by `Streams.maintainPostingIndex` before its bootstrap probe (one
    * existence check when healthy). The tmp layout is always COMPLETE
    * before the first rename starts, so completing the swap (tmp → path)
    * is safe; rolling back (old → path) is the fallback. Single-maintainer
    * contract as everywhere in this file: never run concurrently with a
    * live rebucket. Returns true when it repaired something. */
  def recoverRebucketSwap(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String): Boolean = {
    val fs = fsOf(spark, indexPath)
    val oldP = new org.apache.hadoop.fs.Path(s"$indexPath.rebucket_old")
    if (!fs.exists(oldP)) return false // healthy fast path: no lease taken
    withWriterLease(spark, indexPath) {
    val srcP = new org.apache.hadoop.fs.Path(indexPath)
    val tmpP = new org.apache.hadoop.fs.Path(s"$indexPath.rebucket_tmp")
    if (!fs.exists(srcP)) {
      // crashed between the renames: finish the swap (tmp is complete by
      // construction), else roll the old layout back
      if (fs.exists(tmpP))
        require(fs.rename(tmpP, srcP),
          s"recoverRebucketSwap: could not swap $tmpP into $indexPath")
      else
        require(fs.rename(oldP, srcP),
          s"recoverRebucketSwap: could not restore $oldP to $indexPath")
    }
    // src exists (either it always did — crash after the second rename —
    // or we just restored it): the old copy is superseded either way
    if (fs.exists(oldP)) fs.delete(oldP, true)
    System.err.println(s"recoverRebucketSwap: healed a crashed rebucket " +
      s"swap at $indexPath")
    true
    }
  }

  /** ACT on armed [[rebucketAdvice]] for `indexPath` — the shared
    * warn→act closure both the streaming loop
    * (`Streams.maintainPostingIndex(autoRebucket=true)`) and the batch
    * maintenance paths (`appendToIndex`/`upsertIndex`/
    * `upsertIndexBuffered` with `autoRebucket=true`) run after an apply:
    * fold any pending area first (buffered batches hash by the old
    * modulus and would be orphaned by the swap), RE-READ the advice —
    * the fold's own COW apply re-measures widths and may arm a larger,
    * fresher suggestion; swapping to the pre-fold number right after a
    * large fold under-sizes the new modulus (round-13 ADVICE) — then
    * [[rebucket]] and clear both observability hooks. No-op (None) when
    * nothing is armed; returns (oldBuckets, newBuckets) when it swapped.
    * Runs in the maintenance window by construction: callers invoke it
    * between applies, exactly where a human would schedule the
    * compaction-class rewrite. */
  def actOnRebucketAdvice(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, idCol: String): Option[(Int, Int)] =
    withWriterLease(spark, indexPath) {
    rebucketAdvice(indexPath).map { a0 =>
      if (pendingBytes(spark, indexPath) > 0)
        compactPending(spark, indexPath, idCol, a0.buckets)
      val a = rebucketAdvice(indexPath).getOrElse(a0)
      rebucket(spark, indexPath, idCol, a.buckets, a.suggested)
      System.err.println(s"actOnRebucketAdvice: auto-rebucketed " +
        s"$indexPath ${a.buckets} -> ${a.suggested} " +
        f"(mean touched width ${a.ratio}%.1f× birth)")
      clearRebucketAdvice(indexPath)
      lastRebucketWarning = None
      (a.buckets, a.suggested)
    }
    }

  /** F3 AND-of-terms over the posting table (`token @@ to_tsquery('a & b')`).
    * Terms are stemmed with the same stemmer the index side used. */
  /** Query terms → index lexemes: lowercase, DROP stopwords, stem,
    * distinct. The stopword drop mirrors Postgres `to_tsquery` (a NOTICE
    * and the term vanishes) and the index side's own tokenize(): no
    * stopword lexeme ever exists in postings, so an AND that kept one
    * would be silently unsatisfiable rather than ignoring it. */
  private def queryLexemes(terms: Seq[String]): Seq[String] =
    terms.map(_.toLowerCase)
      .filterNot(TextOps.englishStopWords.contains)
      .map(Porter.stem).distinct

  def searchAll(postings: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    val stemmed = queryLexemes(terms)
    // all-stopword query = empty tsquery = matches nothing (plainto_
    // tsquery semantics); without this the n_hit === 0 gate would match
    // every doc
    if (stemmed.isEmpty) return postings.select(col(idCol)).limit(0)
    postings
      .filter(col("lexeme").isin(stemmed: _*))
      .groupBy(col(idCol))
      // count DISTINCT lexemes, not rows: build()'s postings are unique
      // per (lexeme, doc) but a POSITIONAL index carries one row per
      // occurrence — raw counts there both over-match (one term repeated
      // n times ≥ n terms) and under-match (all terms present but
      // repeats push the count past the target)
      .agg(count_distinct(col("lexeme")).as("n_hit"))
      .filter(col("n_hit") === stemmed.length)
      .select(col(idCol))
  }

  /** F3 OR-of-terms (`to_tsquery('a | b')`). */
  def searchAny(postings: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    val stemmed = queryLexemes(terms)
    if (stemmed.isEmpty) return postings.select(col(idCol)).limit(0)
    postings.filter(col("lexeme").isin(stemmed: _*))
      .select(col(idCol)).distinct()
  }

  // ---------------------------------------------------- positional tsvector

  /** F1 positional: Postgres `to_tsvector` keeps lexeme POSITIONS — words
    * are numbered 1..n over ALL words (stopwords removed afterwards, so
    * their positions remain as gaps), and `a <-> b` matches where
    * pos(b) = pos(a)+1. Built as a posting TABLE `(id, lexeme, pos)` rather
    * than a nested array column: rows are the Spark-native shape — the
    * explode is codegen'd, the table prunes and joins by lexeme exactly like
    * [[build]]'s index, and phrase adjacency becomes an equi-join on
    * (id, pos) instead of per-row array walking (reference tsvector trigger:
    * `sec_dl/utils/init_tables.py:59-67`). */
  def buildPositional(docs: DataFrame, idCol: String, textCol: Column): DataFrame =
    docs
      .select(col(idCol), posexplode(TextOps.words(textCol)).as(Seq("pos0", "w")))
      .filter(!col("w").isin(TextOps.englishStopWords: _*))
      .select(col(idCol), TextOps.stemWord(col("w")).as("lexeme"),
        (col("pos0") + 1).cast("int").as("pos"))

  /** Phrase search (`to_tsquery('a <-> b <-> c')`): ids where the stemmed
    * terms occupy strictly consecutive positions. Implemented as a chain of
    * left-semi equi-joins on (id, pos-i): the accumulator holds candidate
    * START positions, each further term keeps only starts it extends. Every
    * per-term side is a lexeme-filtered slice of the posting table (pruned
    * scan on an indexed store), so work is bounded by the terms' posting
    * lists — never the corpus. */
  def phraseSearch(postings: DataFrame, idCol: String, phrase: Seq[String]): DataFrame =
    phraseSearchLexemes(postings, idCol,
      phrase.map(t => Porter.stem(t.toLowerCase)), phrase.indices)

  /** [[phraseSearch]] over ALREADY-normalized lexemes at exact relative
    * positions (the tsquery compiler stems once, centrally, in
    * `TsQuery.parseStemmed`; `offsets(i)` is lexeme i's distance from the
    * phrase head — consecutive for `<->`, wider for `<N>`). */
  private def phraseSearchLexemes(postings: DataFrame, idCol: String,
                                  stemmed: Seq[String], offsets: Seq[Int]): DataFrame = {
    require(stemmed.nonEmpty, "empty phrase")
    val head = postings.filter(col("lexeme") === stemmed.head)
      .select(col(idCol), col("pos"))
    stemmed.zip(offsets).drop(1)
      .foldLeft(head) { case (acc, (lex, off)) =>
        acc.join(
          postings.filter(col("lexeme") === lex)
            .select(col(idCol), (col("pos") - off).as("pos")),
          Seq(idCol, "pos"), "left_semi")
      }
      .select(col(idCol)).distinct()
  }

  /** Phrase search from tsquery-style syntax: `"hash <-> join"`. */
  def phraseSearchQuery(postings: DataFrame, idCol: String, query: String): DataFrame =
    phraseSearch(postings, idCol,
      query.split("<->").map(_.trim).toSeq.filter(_.nonEmpty))

  /** `ts_rank` analog: tf-idf relevance of each matching doc for an OR term
    * set — score(doc) = Σ_t tf(t,doc) · ln(N / df(t)), rounded to 6dp (one
    * float op chain, same contract as q38's idf). tf comes from POSITIONAL
    * postings (occurrence counts, not the deduped [[build]] index); df is
    * derived from the tf aggregate (docs containing the term), N from the
    * corpus. Shuffles once on (id, lexeme) for tf; df and N are
    * broadcast-sized by construction (≤ one row per query term). */
  def tsRank(postings: DataFrame, idCol: String, terms: Seq[String],
             corpus: DataFrame): DataFrame = {
    val stemmed = terms.map(t => Porter.stem(t.toLowerCase)).distinct
    val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
    val tf = postings.filter(col("lexeme").isin(stemmed: _*))
      .groupBy(col(idCol), col("lexeme")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("lexeme")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "lexeme")
      .crossJoin(broadcast(nDocs))
      .groupBy(col(idCol))
      .agg(round(sum(col("tf") *
        log(col("n_docs").cast("double") / col("df").cast("double"))), 6)
        .as("score"))
  }

  // ------------------------------------------- weighted ranking (setweight)

  /** `setweight` analog (Postgres: `setweight(to_tsvector(title), 'A') ||
    * setweight(to_tsvector(body), 'D')`, the title-vs-body relevance
    * tuning of the reference's search surface): positional postings built
    * from LABELED document fields, each posting carrying its field's
    * weight class `(id, lexeme, pos, weight ∈ A..D)`. Positions number
    * words continuously ACROSS the fields in declaration order — exactly
    * the position shift tsvector `||` performs — with stopwords removed
    * after numbering, so a multi-field doc ranks and phrase-matches as the
    * one concatenated document it logically is. One codegen'd pass: the
    * fields' word arrays concat into (word, label) structs before a single
    * posexplode — no per-field scan, no UDF. */
  def buildPositionalWeighted(docs: DataFrame, idCol: String,
                              fields: Seq[(Column, String)]): DataFrame = {
    require(fields.nonEmpty, "at least one (column, weight) field")
    require(fields.forall(f => WeightLabels.contains(f._2)),
      s"weight labels must be one of ${WeightLabels.mkString(",")}")
    val labeled = concat(fields.map { case (c, lbl) =>
      transform(TextOps.words(c), x => struct(x.as("w"), lit(lbl).as("lbl")))
    }: _*)
    docs
      .select(col(idCol), posexplode(labeled).as(Seq("pos0", "s")))
      .filter(!col("s.w").isin(TextOps.englishStopWords: _*))
      .select(col(idCol), TextOps.stemWord(col("s.w")).as("lexeme"),
        (col("pos0") + 1).cast("int").as("pos"), col("s.lbl").as("weight"))
  }

  private val WeightLabels = Seq("A", "B", "C", "D")

  /** `ts_rank(weights, tsvector, query, normalization)` analog over
    * [[buildPositionalWeighted]] postings (a plain positional/[[build]]
    * frame ranks too — every posting then counts as class D, Postgres's
    * unlabeled default): score(doc) = Σ_t wtf(t, doc) · ln(N / df(t)),
    * where wtf sums each occurrence's class weight — `weights` indexed
    * {D, C, B, A} like the Postgres array, default {0.1, 0.2, 0.4, 1.0}.
    * Normalization is the Postgres bitmask (combinable): 1 ⇒ ÷(1 +
    * ln(doc length)), 2 ⇒ ÷doc length, 8 ⇒ ÷distinct lexemes, 16 ⇒ ÷(1 +
    * ln(distinct lexemes)), 32 ⇒ s/(s+1); flag 4 (extent distance) is
    * rank_cd-only there and rejected here. Doc length = the doc's posting
    * count (its lexeme occurrences, stopwords excluded).
    *
    * Float contract: wtf is an UNORDERED double sum, so oracle-exact gates
    * should pass dyadic weights ({0.125, 0.25, 0.5, 1.0} — q121) whose
    * sums are exact in binary; the Postgres default ranks identically but
    * its 0.1 sums are order-sensitive at the last ulp.
    *
    * Scale shape: postings prune to the query terms before the one
    * (id, lexeme) shuffle; df/N are broadcast-sized; the doc-stats pass
    * (only when a normalization flag needs it) aggregates postings
    * SEMI-JOINED to the matched ids — bounded by the terms' posting lists,
    * never the corpus. */
  def tsRankWeighted(postings: DataFrame, idCol: String, terms: Seq[String],
                     corpus: DataFrame,
                     weights: Seq[Double] = Seq(0.1, 0.2, 0.4, 1.0),
                     normalization: Int = 0): DataFrame =
    tsRankWeightedFrom(postings, postings, idCol, terms, corpus, weights, normalization)

  /** [[tsRankWeighted]] with the doc-stats pass decoupled from the term
    * pass — the indexed path feeds a bucket-pruned slice to the former and
    * the whole index to the latter. */
  private def tsRankWeightedFrom(postings: DataFrame, statsPostings: DataFrame,
                                 idCol: String, terms: Seq[String],
                                 corpus: DataFrame, weights: Seq[Double],
                                 normalization: Int): DataFrame = {
    require(weights.length == 4, "weights are {D, C, B, A} — exactly 4 values")
    require((normalization & ~(1 | 2 | 8 | 16 | 32)) == 0,
      s"normalization $normalization: ts_rank supports 1|2|8|16|32 " +
        "(4 is ts_rank_cd's extent-distance flag)")
    val stemmed = terms.map(t => Porter.stem(t.toLowerCase)).distinct
    val wExpr =
      if (!postings.columns.contains("weight")) lit(weights(0))
      else when(col("weight") === "A", weights(3))
        .when(col("weight") === "B", weights(2))
        .when(col("weight") === "C", weights(1))
        .otherwise(weights(0))
    val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
    val wtf = postings.filter(col("lexeme").isin(stemmed: _*))
      .groupBy(col(idCol), col("lexeme")).agg(sum(wExpr).as("wtf"))
    val df = wtf.groupBy(col("lexeme")).agg(count(lit(1)).as("df"))
    val raw = wtf.join(broadcast(df), "lexeme")
      .crossJoin(broadcast(nDocs))
      .groupBy(col(idCol))
      .agg(sum(col("wtf") *
        log(col("n_docs").cast("double") / col("df").cast("double"))).as("raw"))
    val needsLen = (normalization & (1 | 2)) != 0
    val needsUniq = (normalization & (8 | 16)) != 0
    val scored =
      if (!needsLen && !needsUniq) raw
      else {
        // aggregate ONLY what the flags ask for: doc_len is a plain row
        // count whose projection prunes the `lexeme` column — and with it
        // the per-word stem evaluation — out of the stats scan entirely
        // (flags 1|2 alone, q121's case, used to pay a second full
        // stemming pass just to discard it); n_uniq (flags 8|16) is the
        // one that genuinely needs lexemes.
        val aggs =
          (if (needsLen) Seq(count(lit(1)).as("doc_len")) else Nil) ++
            (if (needsUniq) Seq(count_distinct(col("lexeme")).as("n_uniq")) else Nil)
        raw.join(
          statsPostings.join(raw.select(col(idCol)), Seq(idCol), "left_semi")
            .groupBy(col(idCol))
            .agg(aggs.head, aggs.tail: _*),
          Seq(idCol))
      }
    var s: Column = col("raw")
    if ((normalization & 1) != 0) s = s / (lit(1.0) + log(col("doc_len").cast("double")))
    if ((normalization & 2) != 0) s = s / col("doc_len").cast("double")
    if ((normalization & 8) != 0) s = s / col("n_uniq").cast("double")
    if ((normalization & 16) != 0) s = s / (lit(1.0) + log(col("n_uniq").cast("double")))
    if ((normalization & 32) != 0) s = s / (s + lit(1.0))
    scored.select(col(idCol), round(s, 6).as("score"))
  }

  /** [[tsRankWeighted]] against an on-disk index written from
    * [[buildPositionalWeighted]] postings (the `weight` column rides the
    * bucketed layout like `pos` does): the wtf pass reads only the query
    * terms' hash-bucket partitions; the doc-stats pass — needed only when
    * a normalization flag asks for document length — must see ALL of a
    * matched doc's postings and therefore scans the index column-pruned
    * and semi-joined to the matched ids (the same full-posting fetch
    * Postgres does against the heap when normalizing). */
  def tsRankWeightedIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                            idCol: String, terms: Seq[String], corpus: DataFrame,
                            weights: Seq[Double] = Seq(0.1, 0.2, 0.4, 1.0),
                            normalization: Int = 0, buckets: Int = 64): DataFrame = {
    requireLayout(spark, indexPath, buckets)
    val stemmed = terms.map(t => Porter.stem(t.toLowerCase)).distinct
    val idx = indexRelation(spark, indexPath, idCol)
    val pruned =
      idx.filter(col("lexeme_bucket").isin(bucketIdsFor(spark, stemmed, buckets): _*))
    tsRankWeightedFrom(pruned, idx, idCol, terms, corpus, weights, normalization)
  }

  /** `ts_rank_cd` analog — cover-density ranking (Clarke/Cormack/Tudhope,
    * the proximity family Postgres implements in tsrank.c): score(doc) =
    * Σ over MINIMAL COVERS of 1/width, where a cover is a window [l, r]
    * containing every query term and tight on both ends (no smaller window
    * with the same endpoint contains them all). Nearby terms ⇒ narrow
    * covers ⇒ high score — the proximity signal [[tsRank]]'s bag-of-words
    * tf-idf cannot see. Unit term weights, no length normalization
    * (Postgres `normalization=0` shape); a single-term query degenerates to
    * tf, as in Postgres. 6dp rounding (q38's float-publishing contract).
    *
    * Algorithm: per doc, one linear sweep over its query-term positions in
    * order, tracking each term's latest occurrence. When every term has
    * been seen, the tight window ending at the current position `r` is
    * [min lastOcc, r]; it is a minimal cover iff the current term's
    * PREVIOUS occurrence predates that left bound (otherwise a narrower
    * window ending earlier already covered — the right end isn't tight).
    * The q114 oracle recomputes covers set-based from the dual
    * characterization (l(r) = min over terms of max-occurrence ≤ r; cover
    * iff r(l(r)) = r), so the sweep's emit rule is cross-checked by
    * construction, not shared.
    *
    * Scale: postings are pruned to the query terms before the one groupBy-
    * doc shuffle; the per-doc collect is bounded by the terms' occurrence
    * counts in that doc (the phrase-search trade). Events ride one long
    * (pos·k + termIdx) so the sweep sorts primitives, no row objects. */
  def tsRankCd(postings: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    val stemmed = terms.map(t => Porter.stem(t.toLowerCase)).distinct
    val k = stemmed.length
    val cdUdf = udf((evs: Seq[Long]) => {
      val sorted = evs.toArray
      java.util.Arrays.sort(sorted)
      val lastOcc = Array.fill(k)(-1L)
      var seen = 0
      var score = 0.0
      var e = 0
      while (e < sorted.length) {
        val pos = sorted(e) / k
        val t = (sorted(e) % k).toInt
        val prev = lastOcc(t)
        if (prev < 0) seen += 1
        lastOcc(t) = pos
        if (seen == k) {
          var l = Long.MaxValue
          var i = 0
          while (i < k) { if (lastOcc(i) < l) l = lastOcc(i); i += 1 }
          if (prev < l) score += 1.0 / (pos - l + 1)
        }
        e += 1
      }
      score
    })
    postings.filter(col("lexeme").isin(stemmed: _*))
      .select(col(idCol),
        (col("pos").cast("long") * k +
          (array_position(lit(stemmed.toArray), col("lexeme")) - 1)).as("ev"))
      .groupBy(col(idCol))
      .agg(round(cdUdf(collect_list(col("ev"))), 6).as("score"))
      .filter(col("score") > 0)
  }

  /** AND-search against an index written by [[write]]: the query terms'
    * bucket ids are computed with the SAME hash the writer used (via a
    * one-row Spark job, so the two can't drift), and the scan filters on
    * `lexeme_bucket` FIRST — partition pruning reads only the matching
    * bucket directories, the on-disk analog of walking one GIN posting
    * list instead of the whole index. */
  def searchAllIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                       idCol: String, terms: Seq[String], buckets: Int = 64): DataFrame = {
    requireLayout(spark, indexPath, buckets)
    // the SAME term normalization searchAll applies (stopwords dropped),
    // so the pruned bucket set matches the lexemes actually searched
    val stemmed = queryLexemes(terms)
    if (stemmed.isEmpty)
      return spark.read.parquet(indexPath).select(col(idCol)).limit(0)
    // bucket-prune the scan, then delegate — ONE implementation of the
    // AND semantics, so indexed and in-memory search can't drift (the
    // bucket filter pushes through indexRelation's overlay union into
    // both the base and pending scans)
    searchAll(
      indexRelation(spark, indexPath, idCol)
        .filter(col("lexeme_bucket").isin(bucketIdsFor(spark, stemmed, buckets): _*)),
      idCol, terms)
  }

  /** The lexemes' bucket ids under the SAME hash the [[write]]r used:
    * driver-side eval of the writer's own catalyst expression classes
    * (`pmod(hash(...))` is `Pmod(Murmur3Hash(_, 42), _)`), so writer and
    * reader can't drift — and, unlike the one-row Spark job this used to
    * launch, it costs zero jobs per search (every indexed search/rank
    * path calls it). */
  private def bucketIdsFor(spark: org.apache.spark.sql.SparkSession,
                           lexemes: Seq[String], buckets: Int): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    lexemes.map { lex =>
      Pmod(Murmur3Hash(Seq(Literal.create(lex,
          org.apache.spark.sql.types.StringType)), 42), Literal(buckets))
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Int]
    }.distinct
  }

  // ----------------------------------------------------------------- ts_stat

  /** `ts_stat` analog — the Adminer user's "what are the corpus's hot
    * lexemes" query (reference `README.md:6-7` ad-hoc surface): per-lexeme
    * `(ndoc, nentry)` where ndoc counts documents containing the lexeme
    * and nentry its total occurrences (equal on a deduped [[build]] frame,
    * ≥ on positional postings). Two narrowing partial-agg shuffles —
    * (lexeme, id) then lexeme — instead of a count_distinct expand, so
    * the reduce side only ever sees per-doc subtotals. */
  def tsStat(postings: DataFrame, idCol: String): DataFrame =
    postings
      .groupBy(col("lexeme"), col(idCol)).agg(count(lit(1)).as("n_in_doc"))
      .groupBy(col("lexeme"))
      .agg(count(lit(1)).as("ndoc"), sum(col("n_in_doc")).as("nentry"))

  /** [[tsStat]] over a [[write]]-layout index, bucket-parallel: with
    * `lexemes` given, the scan prunes to those lexemes' hash-bucket
    * partitions (the GIN posting-list walk — PlanSpec asserts it); empty
    * `lexemes` means whole-corpus stats, a one-pass full-index aggregate. */
  def tsStatIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                    idCol: String, lexemes: Seq[String] = Nil,
                    buckets: Int = 64): DataFrame = {
    requireLayout(spark, indexPath, buckets)
    val idx = indexRelation(spark, indexPath, idCol)
    val slice =
      if (lexemes.isEmpty) idx
      else {
        val stemmed = lexemes.map(t => Porter.stem(t.toLowerCase)).distinct
        idx.filter(col("lexeme_bucket").isin(bucketIdsFor(spark, stemmed, buckets): _*))
          .filter(col("lexeme").isin(stemmed: _*))
      }
    tsStat(slice, idCol)
  }

  // ----------------------------------------------------- tsquery evaluation

  /** Full `to_tsquery` search over the posting table: AND/OR/NOT/grouping/
    * prefix/phrase, e.g. `searchQuery(p, "doc_id", "(merge & !join) | vec:*",
    * docs)`. Boolean algebra compiles to joins on distinct doc-id sets:
    *
    *  - term → a lexeme-filtered slice of the postings (one posting list),
    *  - AND → left-semi join chain; a negated conjunct becomes a direct
    *    LEFT-ANTI join against its sibling set, so `a & !b` never touches
    *    the corpus universe,
    *  - OR → union + distinct,
    *  - bare/naked NOT → anti-join against `universe` (the full doc-id set;
    *    inherently corpus-sized, exactly like Postgres evaluating `!a`
    *    without a positive conjunct — prefer `a & !b` forms),
    *  - prefix (`t:*`) → a `startsWith` lexeme range scan,
    *  - phrase (`a <-> b`) → [[phraseSearch]]'s consecutive-position joins;
    *    requires POSITIONAL postings ([[buildPositional]]).
    *
    * Every positive leaf is bounded by its posting list, never the corpus;
    * the join keys are all `idCol`, so AQE coalesces the chain. */
  def searchQuery(postings: DataFrame, idCol: String, query: String,
                  universe: DataFrame): DataFrame =
    searchAst(postings, idCol, TsQuery.parseStemmed(query), universe)

  /** [[searchQuery]] with `websearch_to_tsquery` input (`merge -window or
    * "slow scan"`) — same evaluator, friendlier syntax. */
  def searchWebsearch(postings: DataFrame, idCol: String, input: String,
                      universe: DataFrame): DataFrame =
    searchAst(postings, idCol, TsQuery.parseWebsearch(input), universe)

  /** [[searchQuery]] with `ts_rewrite` query expansion applied first: each
    * (target, substitute) rule — to_tsquery syntax — rewrites the parsed
    * query in order (the Postgres aliases-table form), then the expanded
    * query evaluates as usual on the posting lists. */
  def searchRewritten(postings: DataFrame, idCol: String, query: String,
                      rules: Seq[(String, String)], universe: DataFrame): DataFrame = {
    val ast = TsQuery.rewriteAll(TsQuery.parseStemmed(query),
      rules.map { case (t, s) => (TsQuery.parseStemmed(t), TsQuery.parseStemmed(s)) })
    searchAst(postings, idCol, ast, universe)
  }

  /** [[searchQuery]] with `plainto_tsquery` input — every word ANDed. */
  def searchPlainto(postings: DataFrame, idCol: String, input: String,
                    universe: DataFrame): DataFrame =
    searchAst(postings, idCol, TsQuery.parsePlainto(input), universe)

  /** [[searchQuery]] with `phraseto_tsquery` input — the whole input as one
    * gap-preserving phrase; requires POSITIONAL postings. */
  def searchPhraseto(postings: DataFrame, idCol: String, input: String,
                     universe: DataFrame): DataFrame =
    searchAst(postings, idCol, TsQuery.parsePhraseto(input), universe)

  private def searchAst(postings: DataFrame, idCol: String, ast: TsQuery,
                        universe: DataFrame): DataFrame = {
    val positional = postings.columns.contains("pos")
    evalQuery(ast, idCol, universe.select(col(idCol)),
      termDocs = t => {
        val p = if (t.prefix) col("lexeme").startsWith(t.lexeme)
                else col("lexeme") === t.lexeme
        postings.filter(p).select(col(idCol)).distinct()
      },
      phraseDocs = (ls, offs) => {
        require(positional, "tsquery: <-> requires positional postings (buildPositional)")
        phraseSearchLexemes(postings, idCol, ls, offs)
      })
  }

  /** [[searchQuery]] against an on-disk index written by [[write]]: exact
    * lexemes prune the scan to their hash-bucket partitions (the GIN
    * posting-list walk, as [[searchAllIndexed]]); prefix terms cannot name
    * a hash bucket and fall back to a full-index lexeme range scan — the
    * same trade Postgres makes (GIN prefix match walks the term tree).
    * Phrase works when the index was written from POSITIONAL postings
    * (`write(buildPositional(...), ...)` — the bucketed layout carries the
    * `pos` column along): its lexemes are exact, so the (id, pos)
    * adjacency joins run over the same pruned scan. A positionless index
    * rejects phrases. */
  def searchQueryIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                         idCol: String, query: String, universe: DataFrame,
                         buckets: Int = 64): DataFrame = {
    requireLayout(spark, indexPath, buckets)
    val ast = TsQuery.parseStemmed(query)
    val exact = TsQuery.exactLexemes(ast).distinct
    // ONE relation serves all three uses (pruned slice, prefix full scan,
    // positional check) — re-reading per use triples the file listing /
    // footer I/O, which is three object-store round-trips per query on
    // s3a-like stores. indexRelation overlays any buffered pending edits.
    val idx = indexRelation(spark, indexPath, idCol)
    lazy val pruned =
      idx.filter(col("lexeme_bucket").isin(bucketIdsFor(spark, exact, buckets): _*))
    lazy val positional = idx.schema.fieldNames.contains("pos")
    evalQuery(ast, idCol, universe.select(col(idCol)),
      termDocs = t =>
        (if (t.prefix) idx.filter(col("lexeme").startsWith(t.lexeme))
         else pruned.filter(col("lexeme") === t.lexeme))
          .select(col(idCol)).distinct(),
      phraseDocs = (ls, offs) => {
        require(positional, "tsquery: <-> needs a positional index — " +
          "write(buildPositional(...), ...)")
        phraseSearchLexemes(pruned, idCol, ls, offs)
      })
  }

  /** Shared tsquery evaluator: the two entry points differ only in how a
    * term resolves to its doc-id set (in-memory slice vs pruned scan).
    * Every node yields a DISTINCT one-column `idCol` frame. */
  private def evalQuery(q: TsQuery, idCol: String, universe: DataFrame,
                        termDocs: TsQuery.Term => DataFrame,
                        phraseDocs: (Seq[String], Seq[Int]) => DataFrame): DataFrame = {
    def eval(n: TsQuery): DataFrame = n match {
      case t: TsQuery.Term    => termDocs(t)
      case TsQuery.Phrase(ls, offs) => phraseDocs(ls, offs)
      case TsQuery.Not(x)     => universe.join(eval(x), Seq(idCol), "left_anti")
      case TsQuery.And(qs) =>
        val (negated, positive) = qs.partition(_.isInstanceOf[TsQuery.Not])
        val base = positive.map(eval) match {
          // all-negative conjunction (`!a & !b`): start from the universe
          case Seq() => universe
          case ds    => ds.reduce((a, b) => a.join(b, Seq(idCol), "left_semi"))
        }
        // `x & !y` = x ANTI y — never materializes y's complement
        negated.collect { case TsQuery.Not(x) => x }.foldLeft(base) {
          (acc, x) => acc.join(eval(x), Seq(idCol), "left_anti")
        }
      case TsQuery.Or(qs) => qs.map(eval).reduce(_ union _).distinct()
    }
    eval(q)
  }
}
