package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Monotone pending-compaction epoch marker + execution-time guard —
  * the enforcement pattern behind `PostingIndex.compactPending`'s laziness
  * hazard (round-12 VERDICT item 4), extracted so every pending-list
  * design in the engine (the posting index's `_pending`, the bucketed
  * KV-merge base's batched deltas) shares ONE audited implementation:
  *
  *  - a root-level marker file holds the compaction epoch; compaction
  *    bumps it BEFORE deleting the pending files, so there is no window
  *    where the files are gone but an old plan's epoch still matches;
  *  - every overlay read cross-joins [[guardFrame]] onto BOTH union
  *    sides: a lazy DataFrame planned before a compaction and executed
  *    after it fails with a message naming the hazard and remedy —
  *    never a bare FileNotFoundException, and never silently-empty rows
  *    under `spark.sql.files.ignoreMissingFiles=true`.
  *
  * Epoch writes are tmp + rename: a crash can leave the OLD value, the
  * NEW value, or (between delete and rename) NO marker — never a torn
  * file. The no-marker window reads as epoch 0: stale overlay plans
  * built at epoch ≥ 1 then fail LOUDLY on the guard, and the compaction
  * retry re-bumps from 0 — safe, documented residue of the window.
  */
private[graft] object PendingEpoch {

  /** Epoch read against an EXPLICIT Hadoop conf — never `new
    * Configuration()`: a store configured only through `spark.hadoop.*`
    * (fs.defaultFS, object-store credentials) is invisible to the default
    * conf, which would make the guard read the wrong filesystem — inert
    * (always 0) on a scheme-less path, or failing outright on s3a-style
    * URIs. Driver-side callers pass the session conf; [[guardFrame]]
    * ships the same conf to executors via the Writable contract. */
  def read(dir: String, marker: String,
           conf: org.apache.hadoop.conf.Configuration): Long = {
    val p = new org.apache.hadoop.fs.Path(dir, marker)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      val txt =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      // an EMPTY/corrupt marker can only arise from external tampering
      // (writes are atomic): fail with a remediation, not a NumberFormat
      if (txt.isEmpty || !txt.forall(_.isDigit))
        throw new IllegalStateException(
          s"pending-epoch marker at $p is empty/corrupt ('$txt') — a marker " +
            "write was interrupted. Restore it by writing a number ≥ the " +
            "last compaction epoch (overestimating only makes stale lazy " +
            "reads fail loudly, which is the safe direction).")
      txt.toLong
    }
  }

  def writeAtomic(fs: org.apache.hadoop.fs.FileSystem,
                  p: org.apache.hadoop.fs.Path, value: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(value.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"could not move $tmp into place at $p")
  }

  def bump(spark: SparkSession, dir: String, marker: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir, marker)
    writeAtomic(p.getFileSystem(conf), p, read(dir, marker, conf) + 1)
  }

  /** Re-stamp a given epoch (a directory swap carries the epoch across —
    * a fresh layout silently reset to 0 would let a stale pre-compaction
    * plan pass the guard and then hit the deleted pending files). */
  def stamp(spark: SparkSession, dir: String, marker: String,
            epoch: Long): Unit = {
    if (epoch <= 0) return
    val p = new org.apache.hadoop.fs.Path(dir, marker)
    writeAtomic(p.getFileSystem(spark.sessionState.newHadoopConf()), p, epoch)
  }

  /** Claim the next monotone batch stamp from a root counter marker —
    * O(1) filesystem reads instead of the Spark `agg(max(batch))` scan
    * over the whole pending area that every park otherwise pays (per-park
    * latency grows with pending size, total I/O quadratically across a
    * parking run). Safe WITHOUT compare-and-swap because every pending
    * area has a single-writer contract (the posting index's lease; one
    * streaming query per merge base). Claim-before-write ordering: the
    * counter is bumped before the caller writes the batch, so a crash in
    * between skips a stamp (harmless) and a replay claims a fresh higher
    * one — stamps stay unique and monotone, which is all latest-wins
    * needs. `fallbackMax` (lazily evaluated) migrates pre-counter
    * layouts: when the marker is missing, the caller's scan over the
    * existing area supplies the running max (-1 when the area is empty).
    */
  def claimNextStamp(spark: SparkSession, dir: String, marker: String,
                     fallbackMax: => Long): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir, marker)
    val fs = p.getFileSystem(conf)
    val next = if (fs.exists(p)) read(dir, marker, conf) else fallbackMax + 1
    writeAtomic(fs, p, next + 1)
    next
  }

  /** Stamps claimed so far (== pending batch count when the counter is
    * cleared at each fold) — None when no counter marker exists. */
  def readStamp(spark: SparkSession, dir: String,
                marker: String): Option[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir, marker)
    if (!p.getFileSystem(conf).exists(p)) None
    else Some(read(dir, marker, conf))
  }

  /** Remove the counter marker (fold/compaction clears it BEFORE deleting
    * the pending files: a crash in between leaves no counter + a live
    * area, and the next claim's `fallbackMax` scan recovers the max — the
    * reverse order would leave a stale counter over an empty area, which
    * merely overstates the batch-count trigger until the next fold). */
  def clearStamp(spark: SparkSession, dir: String, marker: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir, marker)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) { fs.delete(p, false); () }
  }

  /** One-row frame that exists iff the pending epoch still equals its
    * build-time value WHEN THE PLAN EXECUTES — cross-joined (broadcast)
    * onto both overlay union sides, it runs as its own tiny stage on
    * every execution of the read, even when the pending scan itself
    * returns zero rows (the ignoreMissingFiles silent case).
    * Nondeterministic so Catalyst never constant-folds or reorders the
    * check away. `message(builtAt, now)` renders the caller-specific
    * hazard text. */
  def guardFrame(spark: SparkSession, dir: String, marker: String)
                (message: (Long, Long) => String): DataFrame = {
    val builtAt = read(dir, marker, spark.sessionState.newHadoopConf())
    val dirCap = dir
    val markerCap = marker
    // the udf body runs on executors: ship the session's Hadoop conf with
    // the closure (Configuration is a Writable; SerializableWritable is
    // the public Spark wrapper) so spark.hadoop.*-configured stores
    // resolve there exactly as on the driver
    val serConf = new org.apache.spark.SerializableWritable(
      spark.sessionState.newHadoopConf())
    val check = udf { () =>
      val now = read(dirCap, markerCap, serConf.value)
      if (now != builtAt) throw new IllegalStateException(message(builtAt, now))
      true
    }.asNondeterministic()
    spark.range(1).filter(check()).select(lit(1).as("graft_epoch_live"))
  }
}
