package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Buffered-upsert (pending list) invariants — the GIN-`fastupdate`
  * analog: buffered edits are immediately visible to every indexed read,
  * resolve latest-batch-wins, never rewrite a base bucket, and
  * compaction folds them into a base layout indistinguishable from
  * sequential COW upserts (which is itself pinned to a fresh rebuild by
  * PostingIndexSpec). */
class PendingIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_pend_spec_").toString + "/idx"

  private val docs = Seq(
    (1L, "merge join scan"),
    (2L, "merge sort spill"),
    (3L, "vector join probe"),
    (4L, "merge join vector"),
    (5L, "window frame scan"),
    (6L, "hash hash probe"))
    .toDF("doc_id", "text")

  private def toks = TextOps.tokenize($"text")

  private def writeIdx(dir: String): Unit =
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", toks), dir, buckets = 4)

  private def search(dir: String, terms: Seq[String]): Seq[Long] =
    PostingIndex.searchAllIndexed(spark, dir, "doc_id", terms, buckets = 4)
      .as[Long].collect().sorted.toSeq

  private def indexRows(dir: String): Set[(String, Long, Int)] =
    spark.read.parquet(dir)
      .select($"lexeme", $"doc_id", $"lexeme_bucket".cast("int"))
      .as[(String, Long, Int)].collect().toSet

  /** (path → (size, mtime)) of the base layout's DATA files. */
  private def baseFiles(dir: String): Map[String, (Long, Long)] = {
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val root = java.nio.file.Paths.get(dir)
    val st = java.nio.file.Files.walk(root)
    try st.forEach { p =>
      val f = p.toFile
      val rel = root.relativize(p).toString
      if (f.isFile && rel.startsWith("lexeme_bucket="))
        out(p.toString) = (f.length, f.lastModified)
    } finally st.close()
    out.toMap
  }

  test("buffered upserts are searchable pre-compaction, latest batch wins, base untouched") {
    val dir = freshDir()
    writeIdx(dir)
    val before = baseFiles(dir)
    // batch 0: doc 5 edited to a ghost text that WOULD hit the search
    PostingIndex.upsertIndexBuffered(spark, dir,
      Seq((5L, "merge join ghost")).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
    // batch 1: doc 5 re-edited away, doc 6 now matches, doc 2 pure-deleted
    PostingIndex.upsertIndexBuffered(spark, dir,
      Seq((5L, "redacted placeholder"), (6L, "merge join added"), (2L, ""))
        .toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
    // expected = fresh build over the FINAL corpus
    val expect = Seq(1L, 4L, 6L)
    assert(search(dir, Seq("merge", "join")) == expect,
      "overlay read must see the latest buffered state")
    // doc 2's lexemes must be gone (pure delete), doc 5's ghost superseded
    assert(!search(dir, Seq("sort")).contains(2L))
    assert(!search(dir, Seq("ghost")).contains(5L))
    // the write-amplification claim: NO base bucket file rewritten
    assert(baseFiles(dir) == before,
      "buffered upserts must not rewrite any base bucket file")
  }

  test("batch stamps come from the O(1) root counter: monotone across parks, reset by compaction, scan-migrated when the counter is absent") {
    val dir = freshDir()
    writeIdx(dir)
    val seq = java.nio.file.Paths.get(dir, "_graft_pending_seq")
    def park(id: Long, text: String): Unit =
      PostingIndex.upsertIndexBuffered(spark, dir,
        Seq((id, text)).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
    park(5L, "merge one"); park(5L, "merge two"); park(6L, "merge three")
    assert(java.nio.file.Files.exists(seq), "parks must maintain the counter")
    assert(PostingIndex.pendingBatches(spark, dir) == 3L,
      "counter == batches parked (the read-side compaction trigger's measure)")
    // migration path: a pre-counter layout (counter file absent, batches
    // present) must fall back to the max-stamp scan — the count is
    // unchanged, and the NEXT park claims max+1, not a colliding stamp
    java.nio.file.Files.delete(seq)
    assert(PostingIndex.pendingBatches(spark, dir) == 3L,
      "without the counter, the scan fallback must recover the batch count")
    park(6L, "merge four") // would corrupt latest-wins if the stamp collided
    assert(PostingIndex.pendingBatches(spark, dir) == 4L)
    assert(search(dir, Seq("merge", "four")) == Seq(6L) &&
      search(dir, Seq("merge", "three")) == Seq(),
      "post-migration stamps must keep latest-batch-wins ordering")
    PostingIndex.compactPending(spark, dir, "doc_id", buckets = 4)
    assert(!java.nio.file.Files.exists(seq), "compaction clears the counter")
    assert(PostingIndex.pendingBatches(spark, dir) == 0L,
      "stamps (and the batch-count trigger) restart with each generation")
  }

  test("compactPending folds to the exact sequential-COW-upsert layout and clears the area") {
    val cow = freshDir()
    val buf = freshDir()
    writeIdx(cow); writeIdx(buf)
    val b1 = Seq((5L, "merge join ghost")).toDF("doc_id", "text")
    val b2 = Seq((5L, "redacted placeholder"), (6L, "merge join added"), (2L, ""))
      .toDF("doc_id", "text")
    PostingIndex.upsertIndex(spark, cow, b1, "doc_id", toks, buckets = 4)
    PostingIndex.upsertIndex(spark, cow, b2, "doc_id", toks, buckets = 4)
    PostingIndex.upsertIndexBuffered(spark, buf, b1, "doc_id", toks, buckets = 4)
    PostingIndex.upsertIndexBuffered(spark, buf, b2, "doc_id", toks, buckets = 4)
    PostingIndex.compactPending(spark, buf, "doc_id", buckets = 4)
    assert(indexRows(buf) == indexRows(cow),
      "compacted base must equal the sequential COW-upsert base")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$buf/_pending")) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$buf/_pending_deletes")),
      "compaction must clear the pending area")
    // compaction on a clean index is a no-op
    PostingIndex.compactPending(spark, buf, "doc_id", buckets = 4)
    assert(indexRows(buf) == indexRows(cow))
  }

  test("auto-compaction triggers above the byte threshold") {
    val dir = freshDir()
    writeIdx(dir)
    PostingIndex.upsertIndexBuffered(spark, dir,
      Seq((5L, "merge join added")).toDF("doc_id", "text"), "doc_id", toks,
      buckets = 4, compactAboveBytes = 1L) // any pending byte trips it
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_pending")),
      "threshold-tripped upsert must leave no pending area")
    assert(search(dir, Seq("merge", "join")) == Seq(1L, 4L, 5L))
  }

  test("direct COW maintenance on a pending index is rejected") {
    val dir = freshDir()
    writeIdx(dir)
    PostingIndex.upsertIndexBuffered(spark, dir,
      Seq((5L, "merge join added")).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
    val upd = Seq((1L, "other text")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      PostingIndex.upsertIndex(spark, dir, upd, "doc_id", toks, buckets = 4)
    }
    assertThrows[IllegalArgumentException] {
      PostingIndex.appendToIndex(spark, dir,
        Seq((9L, "new doc")).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
    }
    // after compaction the COW paths work again
    PostingIndex.compactPending(spark, dir, "doc_id", buckets = 4)
    PostingIndex.upsertIndex(spark, dir, upd, "doc_id", toks, buckets = 4)
    assert(search(dir, Seq("merge", "join")) == Seq(4L, 5L))
  }

  test("a lazy overlay read executed after compactPending fails with the epoch error, not silence") {
    val dir = freshDir()
    writeIdx(dir)
    PostingIndex.upsertIndexBuffered(spark, dir,
      Seq((6L, "merge join added")).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
    // plan the overlay read but do NOT execute it yet
    val lazyRead = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge", "join"), buckets = 4)
    // sanity: the plan is live pre-compaction
    assert(lazyRead.count() == 3)
    PostingIndex.compactPending(spark, dir, "doc_id", buckets = 4)
    // execution after the compaction must fail LOUDLY — the epoch guard's
    // message (or, if a scan stage loses the race to it, the missing-file
    // error), never silently-correct-looking rows
    val e = intercept[Throwable] { lazyRead.collect() }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => s"${t.getClass.getName}: ${t.getMessage}").mkString(" | ")
    assert(msgs.contains("was compacted") || msgs.contains("FileNotFound") ||
      msgs.toLowerCase.contains("does not exist"), s"unexpected failure: $msgs")
    // and a read built AFTER the compaction is correct
    assert(search(dir, Seq("merge", "join")) == Seq(1L, 4L, 6L))
  }

  test("epoch guard catches the ignoreMissingFiles silent-wrong-rows case") {
    val dir = freshDir()
    writeIdx(dir)
    PostingIndex.upsertIndexBuffered(spark, dir,
      Seq((6L, "merge join added")).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
    val conf = "spark.sql.files.ignoreMissingFiles"
    val prev = spark.conf.getOption(conf)
    try {
      spark.conf.set(conf, "true")
      val lazyRead = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
        Seq("merge", "join"), buckets = 4)
      assert(lazyRead.count() == 3)
      PostingIndex.compactPending(spark, dir, "doc_id", buckets = 4)
      // without the guard this returns ROWS (the deleted pending files are
      // silently skipped and the buffered edit vanishes) — the exact
      // silent re-plan the hazard doc warned about; with it, a loud error
      val e = intercept[Throwable] { lazyRead.collect() }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("was compacted"), s"unexpected failure: $msgs")
    } finally prev.fold(spark.conf.unset(conf))(v => spark.conf.set(conf, v))
  }

  test("epoch guard survives the deletes-only pending case (limit-0 fold) and a rebucket") {
    val dir = freshDir()
    writeIdx(dir)
    val conf = "spark.sql.files.ignoreMissingFiles"
    val prev = spark.conf.getOption(conf)
    try {
      spark.conf.set(conf, "true")
      // deletes-ONLY pending area: the live side of the overlay is a
      // limit(0) frame that Catalyst folds to an empty relation — the
      // guard must survive on the anti-join side, or the purged doc
      // silently REAPPEARS when the superseded scan's files vanish
      PostingIndex.upsertIndexBuffered(spark, dir,
        Seq((2L, "")).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
      val lazyRead = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
        Seq("sort"), buckets = 4)
      assert(lazyRead.count() == 0, "doc 2 is purged pre-compaction")
      PostingIndex.compactPending(spark, dir, "doc_id", buckets = 4)
      val e = intercept[Throwable] { lazyRead.collect() }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("was compacted"),
        s"deletes-only stale plan must fail on the guard, got: $msgs")
      // and the epoch must CARRY across a rebucket: a stale overlay plan
      // from before the compaction still fails loudly after the swap
      // resets the directory (a fresh epoch-0 marker would let it pass)
      PostingIndex.upsertIndexBuffered(spark, dir,
        Seq((6L, "merge join added")).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
      val lazyRead2 = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
        Seq("merge", "join"), buckets = 4)
      assert(lazyRead2.count() == 3)
      PostingIndex.compactPending(spark, dir, "doc_id", buckets = 4)
      PostingIndex.rebucket(spark, dir, "doc_id", oldBuckets = 4, newBuckets = 8)
      val e2 = intercept[Throwable] { lazyRead2.collect() }
      val msgs2 = Iterator.iterate(e2)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs2.contains("was compacted"),
        s"post-rebucket stale plan must still fail on the guard, got: $msgs2")
    } finally prev.fold(spark.conf.unset(conf))(v => spark.conf.set(conf, v))
  }

  test("positional buffered upsert keeps phrase search correct over the overlay") {
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.buildPositional(docs, "doc_id", $"text"), dir, buckets = 4)
    // doc 6 gains the phrase, doc 1's 'merge join' is edited away
    PostingIndex.upsertIndexBufferedPositional(spark, dir,
      Seq((6L, "fast merge join here"), (1L, "scan only now"))
        .toDF("doc_id", "text"), "doc_id", $"text", buckets = 4)
    val hits = PostingIndex.searchQueryIndexed(spark, dir, "doc_id",
        "merge <-> join", docs.select($"doc_id"), buckets = 4)
      .as[Long].collect().sorted.toSeq
    assert(hits == Seq(4L, 6L))
    // schema guard: a PLAIN batch cannot buffer onto the positional index
    assertThrows[IllegalArgumentException] {
      PostingIndex.upsertIndexBuffered(spark, dir,
        Seq((3L, "x")).toDF("doc_id", "text"), "doc_id", toks, buckets = 4)
    }
  }
}
