package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[PostingIndex.rebucket]] invariants: the rewritten layout holds the
  * same postings under the new modulus, the layout marker flips (old
  * bucket count rejected, new accepted), maintenance after the rebucket
  * behaves like a fresh index born at the new count, and a sidecar /
  * pending area is handled (rebuilt / rejected). */
class RebucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_rebucket_spec_").toString + "/idx"

  private val docs = Seq(
    (1L, "merge join scan"),
    (2L, "merge sort spill"),
    (3L, "vector join probe"),
    (4L, "merge join vector"),
    (5L, "window frame scan"))
    .toDF("doc_id", "text")

  private def toks = TextOps.tokenize($"text")

  private def pairs(dir: String): Set[(String, Long)] =
    spark.read.parquet(dir).select($"lexeme", $"doc_id")
      .as[(String, Long)].collect().toSet

  test("BATCH-path autoRebucket: a grown index is repaired by appendToIndex(autoRebucket=true) itself — no streaming loop") {
    val dir = freshDir()
    // born tiny (2 buckets over 5 docs), then grown far past the 4× birth
    // width through the plain batch append — the pipeline shape round-13
    // VERDICT item 5 names: a batch caller that ignores stderr must still
    // get the repair when it opts in
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 2)
    val heavy = spark.range(200).select(($"id" + 100).as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), ($"id" * 12 + j).cast("string"))): _*).as("text"))
    PostingIndex.appendToIndex(spark, dir, heavy, "doc_id", toks, buckets = 2,
      autoRebucket = true)
    val newBuckets = PostingIndex.layoutBuckets(spark, dir)
    assert(newBuckets.exists(_ > 2),
      s"the batch apply must act on its own advice, layout still $newBuckets")
    assert(PostingIndex.rebucketAdvice(dir).isEmpty &&
      PostingIndex.lastRebucketWarning.isEmpty,
      "acting must clear both observability hooks")
    // postings survive and later maintenance rides the new modulus
    val hits = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge", "join"), newBuckets.get).as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 4L))
    PostingIndex.appendToIndex(spark, dir,
      Seq((900L, "merge join late")).toDF("doc_id", "text"),
      "doc_id", toks, newBuckets.get)
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge", "join"), newBuckets.get).as[Long].collect().sorted.toSeq
      == Seq(1L, 4L, 900L))
    // the buffered batch path acts too, folding pending before the swap
    val dir2 = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir2, buckets = 2)
    PostingIndex.upsertIndexBuffered(spark, dir2, heavy, "doc_id", toks,
      buckets = 2, compactAboveBytes = 1L, autoRebucket = true)
    assert(PostingIndex.layoutBuckets(spark, dir2).exists(_ > 2),
      "buffered batch path must act on the fold-armed advice")
    assert(PostingIndex.pendingBytes(spark, dir2) == 0L,
      "the act step folds pending before the swap")
  }

  test("rebucket preserves postings, flips the layout marker, and re-hashes consistently") {
    val dir = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 2)
    val before = pairs(dir)
    PostingIndex.rebucket(spark, dir, "doc_id", oldBuckets = 2, newBuckets = 8)
    assert(pairs(dir) == before, "postings must survive the rewrite")
    // every row's bucket matches the NEW modulus (the searchable invariant)
    val mismatched = spark.read.parquet(dir)
      .filter(pmod(hash($"lexeme"), lit(8)) =!= $"lexeme_bucket").count()
    assert(mismatched == 0, "rows must be re-hashed under the new modulus")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir.rebucket_tmp")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir.rebucket_old")))
    // marker: the old count is now rejected, the new one accepted
    assertThrows[IllegalArgumentException] {
      PostingIndex.searchAllIndexed(spark, dir, "doc_id", Seq("merge"), buckets = 2)
    }
    val hits = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge", "join"), buckets = 8).as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 4L))
  }

  test("maintenance after rebucket equals a fresh index born at the new count") {
    val grown = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", toks),
      grown, buckets = 2)
    PostingIndex.rebucket(spark, grown, "doc_id", oldBuckets = 2, newBuckets = 8)
    PostingIndex.appendToIndex(spark, grown, docs.filter($"doc_id" === 4),
      "doc_id", toks, buckets = 8)
    PostingIndex.upsertIndex(spark, grown,
      Seq((2L, "redacted text")).toDF("doc_id", "text"), "doc_id", toks, buckets = 8)
    val fresh = freshDir()
    PostingIndex.write(
      PostingIndex.build(
        docs.filter($"doc_id" <= 4)
          .withColumn("text", when($"doc_id" === 2, "redacted text").otherwise($"text")),
        "doc_id", toks),
      fresh, buckets = 8)
    assert(pairs(grown) == pairs(fresh))
    // bucket columns agree row-for-row too (same modulus, same hash)
    val g = spark.read.parquet(grown).select($"lexeme", $"doc_id", $"lexeme_bucket")
      .as[(String, Long, Int)].collect().toSet
    val f = spark.read.parquet(fresh).select($"lexeme", $"doc_id", $"lexeme_bucket")
      .as[(String, Long, Int)].collect().toSet
    assert(g == f)
  }

  test("rebucket rebuilds an existing doc-map sidecar under the new modulus") {
    val dir = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 2)
    // first upsert bootstraps the sidecar (old modulus)
    PostingIndex.upsertIndex(spark, dir,
      Seq((5L, "merge join appears")).toDF("doc_id", "text"), "doc_id", toks, buckets = 2)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_docmap")))
    PostingIndex.rebucket(spark, dir, "doc_id", oldBuckets = 2, newBuckets = 8)
    // the ghost-sweep must still work through the REBUILT sidecar: edit
    // doc 5 away from 'merge join' — stale postings must vanish
    PostingIndex.upsertIndex(spark, dir,
      Seq((5L, "nothing here")).toDF("doc_id", "text"), "doc_id", toks, buckets = 8)
    val hits = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge", "join"), buckets = 8).as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 4L), "sidecar sweep after rebucket must remove old postings")
  }

  test("rebucket rejects a pending area and a no-op count") {
    val dir = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 2)
    PostingIndex.upsertIndexBuffered(spark, dir,
      Seq((1L, "edited")).toDF("doc_id", "text"), "doc_id", toks, buckets = 2)
    assertThrows[IllegalArgumentException] {
      PostingIndex.rebucket(spark, dir, "doc_id", oldBuckets = 2, newBuckets = 8)
    }
    PostingIndex.compactPending(spark, dir, "doc_id", buckets = 2)
    assertThrows[IllegalArgumentException] {
      PostingIndex.rebucket(spark, dir, "doc_id", oldBuckets = 2, newBuckets = 2)
    }
    PostingIndex.rebucket(spark, dir, "doc_id", oldBuckets = 2, newBuckets = 4)
    val hits = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge", "join"), buckets = 4).as[Long].collect().sorted.toSeq
    assert(hits == Seq(4L))
  }

  test("recoverRebucketSwap heals a crash between the two renames (and the stranded-corpus window)") {
    val dir = freshDir()
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 2)
    val before = pairs(dir)
    // simulate the crash window: the new layout is fully written at
    // .rebucket_tmp and the index was moved aside to .rebucket_old, but
    // the swap-in rename never ran — indexPath does not exist, which is
    // exactly the state where a maintenance loop's bootstrap probe would
    // silently re-create the index from one batch
    PostingIndex.write(
      spark.read.parquet(dir).drop("lexeme_bucket"), s"$dir.rebucket_tmp", 8)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$dir.rebucket_old")))
    assert(PostingIndex.recoverRebucketSwap(spark, dir),
      "recovery must report it repaired the swap")
    assert(pairs(dir) == before, "the completed swap holds every posting")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.rebucket_old")) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.rebucket_tmp")))
    // the swapped-in layout is the NEW modulus and fully maintainable
    val hits = PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge", "join"), buckets = 8).as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 4L))
    // crash AFTER the second rename (old still present): recovery just
    // clears the superseded copy and leaves the index untouched
    PostingIndex.write(
      spark.read.parquet(dir).drop("lexeme_bucket"), s"$dir.rebucket_old", 8)
    assert(PostingIndex.recoverRebucketSwap(spark, dir))
    assert(pairs(dir) == before)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.rebucket_old")))
    // healthy index: recovery is a no-op probe
    assert(!PostingIndex.recoverRebucketSwap(spark, dir))
  }

  test("maintenance arms the rebucket warning once bucket width outgrows the birth sizing, rebucket clears it") {
    val dir = freshDir()
    // born tiny: 2 buckets over 5 docs — the birth width the marker stamps
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 2)
    // healthy first append: width ~2× birth, below the 4× threshold
    PostingIndex.appendToIndex(spark, dir,
      docs.select(($"doc_id" + 100).as("doc_id"), $"text"),
      "doc_id", toks, buckets = 2)
    assert(PostingIndex.lastRebucketWarning.isEmpty,
      "a healthy append must not warn")
    // grow the index far past its birth BYTES under the birth modulus
    // (distinct-lexeme-heavy docs, so payload dominates parquet footer
    // overhead at spec scale): the undersized case — per-batch rewrite
    // cost and pruning degrade with bucket width — must fire the trigger
    (1 to 4).foreach { k =>
      val heavy = spark.range(50).select(
        ($"id" + k * 1000 + 100).as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit("w"), (($"id" + k * 1000) * 12 + j).cast("string"))): _*)
          .as("text"))
      PostingIndex.appendToIndex(spark, dir, heavy, "doc_id", toks, buckets = 2)
    }
    val warn = PostingIndex.lastRebucketWarning
    assert(warn.exists(_.contains("rebucket")),
      s"a 10×-grown index must arm the warning, got $warn")
    // acting on it returns maintenance to the fresh-index line: the
    // rebucketed layout stamps a NEW birth width, so the next healthy
    // append clears the hook
    PostingIndex.rebucket(spark, dir, "doc_id", oldBuckets = 2, newBuckets = 20)
    PostingIndex.appendToIndex(spark, dir,
      docs.select(($"doc_id" + 1100).as("doc_id"), $"text"),
      "doc_id", toks, buckets = 20)
    assert(PostingIndex.lastRebucketWarning.isEmpty,
      "post-rebucket maintenance must clear the warning")
  }
}
