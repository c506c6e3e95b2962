package graft.util

import org.apache.spark.sql.SparkSession

/** Single-writer lease over a maintained on-disk layout — extracted from
  * the posting index (round-13 VERDICT item 2) so EVERY maintained layout
  * in the engine (the posting index's bucketed postings + pending lists,
  * the KV-merge bases of `Streams.incrementalMerge`/`…Bucketed`) shares
  * ONE audited implementation, the same move as [[PendingEpoch]].
  *
  * The contract it makes operational: one writer per path. Two
  * maintenance loops interleaving COW rewrites, pending appends, epoch
  * bumps and directory swaps would corrupt a layout with no detection —
  * Postgres gets the equivalent for free from heavyweight locks; the
  * reference's 20-worker UPDATE pattern (`sec_dl/utils/
  * scrape_all_filings.py:177-183`) pointed at this engine is exactly the
  * workload that would double-drive one path.
  *
  * Mechanics: a sibling lock marker (`<dir>.writer_lock`, atomic
  * create-no-overwrite) is taken at every maintenance entry and released
  * on exit; a contested acquisition fails with a named error. Reentrant
  * within one call stack (a buffered upsert tripping compaction is ONE
  * writer), tracked per thread. A live holder heartbeats the lock mtime
  * every [[staleAfterMs]]/3 from a daemon thread, so no apply is ever
  * "too long" for the window; a crashed holder's lock goes stale after
  * [[staleAfterMs]] and is taken over via an atomic RENAME claim (of two
  * takers exactly one wins — delete+create would let both in).
  */
private[graft] object WriterLease {

  /** Age (ms of lock-file mtime) after which a lease is presumed crashed
    * and taken over. The holder heartbeats at a third of this, so a live
    * lease never goes stale regardless of apply length; size the window
    * only for takeover latency after a real crash. Mutable for tests. */
  @volatile var staleAfterMs: Long = 15L * 60 * 1000

  // sibling built off the normalized Path, not string concat (the
  // incrementalMerge trailing-slash lesson): "…/base/" + ".writer_lock"
  // would be a CHILD of the protected dir — created before the dir's
  // first write, it makes existence probes see a non-empty layout, and
  // directory swaps would carry the live lock along
  private def lockPathOf(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".writer_lock")
  }

  private val leaseDepths = new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
    override def initialValue() = scala.collection.mutable.Map.empty[String, Int]
  }

  private def leaseHolderId: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
      "/thread-" + Thread.currentThread().getId

  // Heartbeat: a held lease's lock mtime is refreshed every staleness/3 by
  // a daemon thread, so a LIVE holder is never presumed crashed no matter
  // how long one apply runs (a ×100-scale fold or rebucket can exceed any
  // fixed window — without the refresh, a second loop would steal the
  // lease MID-APPLY and double-write the layout). The tick re-reads the
  // holder first and only touches a lock still naming this writer: after
  // a legitimate stale takeover the usurper's lock must age on its own.
  private lazy val leaseHeartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-writer-lease-heartbeat")
      t.setDaemon(true)
      t
    })
  private val leaseHeartbeatTasks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ScheduledFuture[_]]()

  private def readLockHolder(fs: org.apache.hadoop.fs.FileSystem,
                             p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator
      .nextOption().getOrElse("<unknown>")
    finally in.close()
  }

  private def startLeaseHeartbeat(fs: org.apache.hadoop.fs.FileSystem,
                                  p: org.apache.hadoop.fs.Path,
                                  holder: String): Unit = {
    val period = math.max(staleAfterMs / 3, 1000L)
    val task = leaseHeartbeats.scheduleAtFixedRate(() => {
      try if (readLockHolder(fs, p) == holder) {
        fs.setTimes(p, System.currentTimeMillis(), -1)
      } catch {
        // released/stolen between ticks, or a transient FS error: the
        // next tick (or the stale window) resolves it — never kill the
        // shared heartbeat thread
        case _: Exception => ()
      }
    }, period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    Option(leaseHeartbeatTasks.put(p.toString, task))
      .foreach(_.cancel(false)) // paranoia: no two hearts for one path
  }

  private def stopLeaseHeartbeat(key: String): Unit =
    Option(leaseHeartbeatTasks.remove(key)).foreach { t =>
      t.cancel(false); ()
    }

  /** Take the single-writer lease on `dir` (atomic create-no-overwrite of
    * the sibling lock marker). Reentrant on the current thread; throws
    * IllegalStateException naming the holder when another writer holds a
    * live lease. A lease whose lock-file age exceeds [[staleAfterMs]] is
    * presumed crashed and taken over (stderr-logged). `what` names the
    * protected layout in errors ("index", "merge base"). */
  def acquire(spark: SparkSession, dir: String, what: String): Unit = {
    val p = lockPathOf(dir)
    // reentrancy/heartbeat state keyed on the NORMALIZED lock path, not
    // the caller's string: "…/base" and "…/base/" are one lock file, and
    // keying them apart would let a self-reacquire under the other form
    // hit the holder==self reclaim branch and delete its own live lock
    val key = p.toString
    val depths = leaseDepths.get()
    depths.get(key) match {
      case Some(d) if d > 0 => depths(key) = d + 1; return
      case _                => ()
    }
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    var attempts = 0
    while (depths.getOrElse(key, 0) == 0) {
      attempts += 1
      try {
        // create(overwrite=false) is the atomic claim: exactly one of two
        // racing writers gets the stream, the other an already-exists
        val out = fs.create(p, false)
        var bodyOk = false
        try {
          try out.write(s"$leaseHolderId\n${System.currentTimeMillis()}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          bodyOk = true
        } finally {
          // the claim SUCCEEDED but the body write failed (disk full,
          // transient FS error): without this cleanup the orphaned
          // empty/partial lock reads as someone else's live lease and
          // locks THIS writer out for the full stale window (the rethrown
          // IOException re-enters the retry loop below, now over a clean
          // slate; the holder==self branch is the second line of defense)
          if (!bodyOk) { try fs.delete(p, false) catch { case _: Exception => () } }
        }
        depths(key) = 1
        startLeaseHeartbeat(fs, p, leaseHolderId)
      } catch {
        case _: java.io.IOException => // already-exists (or transient FS error)
          // every probe below races the holder's release: the lock can
          // vanish between any two calls, and a bare FileNotFound thrown
          // from inside this catch would fail the acquire on a lock that
          // is actually FREE — treat vanish-at-any-step as "retry"
          try {
            if (fs.exists(p)) {
              // held: ours (reclaim), live (fail loudly) or stale (take over)?
              val age = System.currentTimeMillis() -
                fs.getFileStatus(p).getModificationTime
              val holder = readLockHolder(fs, p)
              if (holder == leaseHolderId) {
                // an orphan from OUR OWN earlier failed claim (created,
                // write crashed before the delete above landed) — reclaim
                // rather than waiting out our own stale window
                fs.delete(p, false)
              } else if (age >= staleAfterMs) {
                System.err.println(s"writer lease at $p is ${age} ms old " +
                  s"(stale after $staleAfterMs) — presuming the " +
                  s"holder ($holder) crashed; taking over")
                // takeover claim = atomic RENAME of the stale lock to a
                // tombstone: of two takers, exactly one's rename succeeds
                // (the loser's source is gone) — delete+create would let
                // BOTH takers proceed, the loser's delete removing the
                // winner's fresh lock (double-writer, silently). The
                // re-check under the tombstone closes the check-to-rename
                // window against a release+reclaim landing in between: a
                // freshly-written lock is renamed BACK and the claim
                // retried instead of destroyed.
                val tomb = new org.apache.hadoop.fs.Path(p.getParent,
                  p.getName + ".stale." +
                    s"${System.currentTimeMillis()}.${Thread.currentThread().getId}")
                val claimed = try fs.rename(p, tomb)
                  catch { case _: java.io.IOException => false }
                if (claimed) {
                  val tombAge = System.currentTimeMillis() -
                    fs.getFileStatus(tomb).getModificationTime
                  if (tombAge >= staleAfterMs) fs.delete(tomb, false)
                  else if (!fs.rename(tomb, p)) fs.delete(tomb, false)
                }
              } else {
                throw new IllegalStateException(
                  s"$what at $dir is being maintained by another writer " +
                    s"($holder, lease age ${age} ms) — the maintenance lifecycle has a " +
                    "SINGLE-WRITER contract: two loops interleaving " +
                    "COW rewrites/pending appends/directory swaps corrupt the layout. " +
                    "Route all writes for one path through one loop; if the " +
                    s"holder crashed, takeover happens after ${staleAfterMs} ms " +
                    "(WriterLease.staleAfterMs), or clear it with " +
                    "breakLease.")
              }
            }
          } catch {
            case _: java.io.FileNotFoundException => () // vanished: retry
          }
          // lock vanished between our create and the probe (released or
          // taken over), or we just cleared a stale/orphaned one: retry
          if (attempts > 10) throw new IllegalStateException(
            s"could not acquire writer lease at $p after $attempts attempts")
      }
    }
  }

  /** Release the current thread's lease on `dir` (outermost release
    * deletes the lock marker — unless a stale-takeover raced us and the
    * marker now names someone else, in which case it is left alone). */
  def release(spark: SparkSession, dir: String): Unit = {
    val p = lockPathOf(dir)
    val key = p.toString
    val depths = leaseDepths.get()
    depths.get(key) match {
      case Some(d) if d > 1 => depths(key) = d - 1
      case Some(_) =>
        depths.remove(key)
        stopLeaseHeartbeat(key) // BEFORE the delete: no tick may
        // refresh (or race the read of) a lock this writer is releasing
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        try {
          if (fs.exists(p)) {
            if (readLockHolder(fs, p) == leaseHolderId) { fs.delete(p, false); () }
            else System.err.println(s"writer lease at $p now names another " +
              "holder (stale takeover while this writer ran?) — leaving it " +
              "in place")
          }
        } catch {
          // the lock vanishing mid-release (a stale takeover's rename
          // landing between our exists and open) is the leave-it-alone
          // case, not an error
          case _: java.io.FileNotFoundException => ()
        }
      case None => () // releasing an unheld lease is a no-op
    }
  }

  /** Manual repair: forcibly delete `dir`'s lock marker. Only for an
    * operator who has verified the named holder is dead. */
  def breakLease(spark: SparkSession, dir: String): Unit = {
    val p = lockPathOf(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, false); () }
  }

  def withLease[A](spark: SparkSession, dir: String, what: String)
                  (body: => A): A = {
    acquire(spark, dir, what)
    try body finally release(spark, dir)
  }
}
