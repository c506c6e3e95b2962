package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Single-writer lease invariants (round-13 VERDICT item 2): every index
  * maintenance path takes `<indexPath>.writer_lock` for its duration, so
  * two maintenance loops driving ONE index — the reference's 20-worker
  * UPDATE pattern (`scrape_all_filings.py:177-183`) pointed at this
  * engine — cannot interleave COW rewrites/pending appends/rebuckets:
  * one wins, the other fails with a named error. A crashed holder's lock
  * goes stale after `WriterLeaseStaleAfterMs` and is taken over. Nested
  * maintenance calls (buffered upsert → trip compaction → COW fold) are
  * ONE writer and reenter their own lease. */
class LeaseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_lease_spec_").toString + "/idx"

  private val docs = Seq(
    (1L, "merge join scan"), (2L, "merge sort spill"),
    (3L, "vector join probe"), (4L, "merge join vector"))
    .toDF("doc_id", "text")

  private def toks = TextOps.tokenize($"text")

  private def lockFile(dir: String) = java.nio.file.Paths.get(s"$dir.writer_lock")

  test("a second maintenance loop on a leased index fails loudly; the first releases and the path is writable again") {
    val dir = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 4)
    assert(!java.nio.file.Files.exists(lockFile(dir)),
      "a completed write must leave no lock behind")
    // writer A (this thread) holds the lease mid-apply; writer B — a
    // SECOND loop, modeled as another thread so A's reentrancy cannot
    // mask the contest — must fail with the named single-writer error
    PostingIndex.acquireWriterLease(spark, dir)
    try {
      @volatile var err: Throwable = null
      val t = new Thread(() => {
        try PostingIndex.appendToIndex(spark, dir,
          Seq((10L, "merge late batch")).toDF("doc_id", "text"),
          "doc_id", TextOps.tokenize(col("text")), buckets = 4)
        catch { case e: Throwable => err = e }
      })
      t.start(); t.join(60000)
      assert(err != null, "the contested writer must fail, not proceed")
      assert(err.isInstanceOf[IllegalStateException] &&
        err.getMessage.contains("SINGLE-WRITER"),
        s"contested acquisition must name the contract, got: $err")
    } finally PostingIndex.releaseWriterLease(spark, dir)
    // released: the same append now succeeds and is searchable
    PostingIndex.appendToIndex(spark, dir,
      Seq((10L, "merge late batch")).toDF("doc_id", "text"),
      "doc_id", TextOps.tokenize(col("text")), buckets = 4)
    val hits = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge"), buckets = 4).as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 2L, 4L, 10L))
    assert(!java.nio.file.Files.exists(lockFile(dir)))
  }

  test("a stale lease (crashed holder) is taken over after WriterLeaseStaleAfterMs") {
    val dir = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 4)
    // a foreign lock file from a holder that will never release (the
    // crashed-JVM shape: content names a dead process)
    java.nio.file.Files.writeString(lockFile(dir),
      "99999@dead-host/thread-1\n0")
    val prev = PostingIndex.WriterLeaseStaleAfterMs
    try {
      // live window: the foreign lease blocks maintenance
      PostingIndex.WriterLeaseStaleAfterMs = 60L * 60 * 1000
      val e = intercept[IllegalStateException] {
        PostingIndex.appendToIndex(spark, dir,
          Seq((11L, "merge stale probe")).toDF("doc_id", "text"),
          "doc_id", TextOps.tokenize(col("text")), buckets = 4)
      }
      assert(e.getMessage.contains("99999@dead-host"),
        "the error must name the holder so an operator can check on it")
      // age the lock past the stale window: takeover, append proceeds
      java.nio.file.Files.setLastModifiedTime(lockFile(dir),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 2L * 60 * 60 * 1000))
      PostingIndex.appendToIndex(spark, dir,
        Seq((11L, "merge stale probe")).toDF("doc_id", "text"),
        "doc_id", TextOps.tokenize(col("text")), buckets = 4)
    } finally PostingIndex.WriterLeaseStaleAfterMs = prev
    val hits = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge"), buckets = 4).as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 2L, 4L, 11L))
    assert(!java.nio.file.Files.exists(lockFile(dir)),
      "the taking-over writer must release its own lease")
    // the takeover claim is rename-to-tombstone (atomic: of two takers
    // exactly one's rename succeeds — delete+create would let both in);
    // the tombstone itself must not survive a completed takeover
    val parent = lockFile(dir).getParent
    val residue = java.nio.file.Files.list(parent).iterator()
    val stale = Iterator.continually(residue)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(_.contains(".writer_lock.stale.")).toSeq
    assert(stale.isEmpty, s"takeover left tombstone residue: $stale")
  }

  test("a live holder's heartbeat keeps the lease fresh past the stale window — a long apply is never stolen mid-run") {
    val dir = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 4)
    val prev = PostingIndex.WriterLeaseStaleAfterMs
    // stale window 3 s → heartbeat every 1 s; the apply below 'runs' 3.5 s
    // — WITHOUT the mtime refresh its lease would age past the window and
    // the second loop would steal it MID-APPLY (the double-writer case
    // the lease exists to prevent)
    PostingIndex.WriterLeaseStaleAfterMs = 3000L
    try {
      PostingIndex.acquireWriterLease(spark, dir)
      try {
        Thread.sleep(3500L)
        @volatile var err: Throwable = null
        val t = new Thread(() => {
          try PostingIndex.appendToIndex(spark, dir,
            Seq((12L, "merge heartbeat probe")).toDF("doc_id", "text"),
            "doc_id", TextOps.tokenize(col("text")), buckets = 4)
          catch { case e: Throwable => err = e }
        })
        t.start(); t.join(60000)
        assert(err != null && err.getMessage.contains("SINGLE-WRITER"),
          s"a heartbeating lease must still contest after the window, got: $err")
      } finally PostingIndex.releaseWriterLease(spark, dir)
      assert(!java.nio.file.Files.exists(lockFile(dir)),
        "release after heartbeats must still drop the lock")
    } finally PostingIndex.WriterLeaseStaleAfterMs = prev
  }

  test("nested maintenance (buffered upsert tripping compaction) reenters its own lease; breakWriterLease clears a verified-dead one") {
    val dir = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 4)
    // compactAboveBytes=1 forces upsertBuffered → compactPending →
    // upsertBatch in ONE call stack: one writer, reentrant lease — any
    // self-deadlock or self-contest would throw here
    PostingIndex.upsertIndexBuffered(spark, dir,
      Seq((2L, "merge rewritten text")).toDF("doc_id", "text"),
      "doc_id", TextOps.tokenize(col("text")), buckets = 4,
      compactAboveBytes = 1L)
    assert(PostingIndex.pendingBytes(spark, dir) == 0L, "compaction ran")
    assert(!java.nio.file.Files.exists(lockFile(dir)),
      "the outermost release must drop the lock")
    // manual repair path
    java.nio.file.Files.writeString(lockFile(dir), "dead@host/thread-9\n0")
    PostingIndex.breakWriterLease(spark, dir)
    assert(!java.nio.file.Files.exists(lockFile(dir)))
    PostingIndex.upsertIndex(spark, dir,
      Seq((3L, "vector join probe")).toDF("doc_id", "text"),
      "doc_id", TextOps.tokenize(col("text")), buckets = 4)
  }
}
