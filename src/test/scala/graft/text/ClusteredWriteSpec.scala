package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Partitioned writes must CLUSTER by the partition dir first: without
  * the pre-write repartition, every task emits one file into every dir
  * its rows hash across — file count ∝ tasks × buckets (measured as the
  * dominant cost of the ×100 stress bootstraps: 173 s for a 190 MB base,
  * ~50k creates; at 100 TB that is millions of small files). These tests
  * pin the contract at its observable surface — ONE data file per
  * partition dir — from deliberately many-partition inputs that would
  * spray dozens of files per dir without the clustering. */
class ClusteredWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** partition-dir name → count of DATA files inside (no _SUCCESS/.crc). */
  private def filesPerDir(root: String, partPrefix: String): Map[String, Int] = {
    val out = scala.collection.mutable.Map.empty[String, Int]
    val r = java.nio.file.Paths.get(root)
    val st = java.nio.file.Files.walk(r)
    try st.forEach { p =>
      val f = p.toFile
      if (f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")) {
        val rel = r.relativize(p).toString
        if (rel.startsWith(partPrefix))
          out.updateWith(rel.split('/').head)(c => Some(c.getOrElse(0) + 1))
      }
    } finally st.close()
    out.toMap
  }

  // 26 docs spread over 13 input partitions: every partition holds common
  // lexemes, so an unclustered write would put ~13 files in hot bucket dirs
  private val docs = (1L to 26L)
    .map(i => (i, s"alpha beta gamma delta tok$i"))
    .toDF("doc_id", "text")
    .repartition(13)

  private def toks = TextOps.tokenize($"text")

  test("index bootstrap writes one file per bucket dir, lexemes sorted within it") {
    val dir = freshDir("graft_clw_idx_")
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 4)
    val fpd = filesPerDir(dir, "lexeme_bucket=")
    assert(fpd.nonEmpty && fpd.values.forall(_ == 1), s"expected 1 file/dir, got $fpd")
    // the secondary sort clusters a term's postings contiguously (row-group
    // min/max pruning on term lookups): each dir's single file reads back
    // in non-decreasing lexeme order
    fpd.keys.foreach { d =>
      val lex = spark.read.parquet(s"$dir/$d").select($"lexeme")
        .as[String].collect()
      assert(lex.sameElements(lex.sorted), s"lexemes not clustered in $d")
    }
  }

  test("docmap bootstrap and COW maintenance keep one file per touched dir") {
    val dir = freshDir("graft_clw_up_")
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 4)
    // first upsert bootstraps the _docmap sidecar (O(index), once)
    val edit = Seq((1L, "alpha beta rewritten")).toDF("doc_id", "text").repartition(5)
    PostingIndex.upsertIndex(spark, dir, edit, "doc_id", toks, buckets = 4)
    val dm = filesPerDir(s"$dir/_docmap", "id_bucket=")
    assert(dm.nonEmpty && dm.values.forall(_ == 1), s"docmap: $dm")
    // append + second upsert: touched bucket dirs must stay at one file
    // (unclustered, each batch would ADD a file per touched dir)
    val more = Seq((100L, "alpha gamma appended"), (101L, "beta delta appended"))
      .toDF("doc_id", "text").repartition(7)
    PostingIndex.appendToIndex(spark, dir, more, "doc_id", toks, buckets = 4)
    PostingIndex.upsertIndex(spark, dir,
      Seq((2L, "gamma delta rewritten")).toDF("doc_id", "text").repartition(3),
      "doc_id", toks, buckets = 4)
    val idx = filesPerDir(dir, "lexeme_bucket=")
    assert(idx.nonEmpty && idx.values.forall(_ == 1), s"index: $idx")
    val dm2 = filesPerDir(s"$dir/_docmap", "id_bucket=")
    assert(dm2.values.forall(_ == 1), s"docmap after maintenance: $dm2")
  }

  test("buffered batches land one pending file per touched dir per batch") {
    val dir = freshDir("graft_clw_pend_")
    PostingIndex.write(PostingIndex.build(docs, "doc_id", toks), dir, buckets = 4)
    val b1 = Seq((1L, "alpha beta gamma delta edit")).toDF("doc_id", "text")
      .repartition(9)
    PostingIndex.upsertIndexBuffered(spark, dir, b1, "doc_id", toks, buckets = 4)
    val p1 = filesPerDir(s"$dir/_pending", "lexeme_bucket=")
    assert(p1.nonEmpty && p1.values.forall(_ == 1), s"pending after batch 1: $p1")
    PostingIndex.upsertIndexBuffered(spark, dir, b1, "doc_id", toks, buckets = 4)
    val p2 = filesPerDir(s"$dir/_pending", "lexeme_bucket=")
    assert(p2.values.forall(_ <= 2), s"pending after batch 2: $p2")
  }

  test("bucketed merge base: bootstrap and per-batch rewrites stay one file per dir") {
    val src = freshDir("graft_clw_mrg_src_")
    val tgt = freshDir("graft_clw_mrg_tgt_")
    val ckp = freshDir("graft_clw_mrg_ckp_")
    val rows = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v").repartition(11)
    rows.write.mode("overwrite").parquet(s"$src/b0")
    def merge(): Unit = graft.streaming.Streams.incrementalMergeBucketed(
      spark.readStream.schema("k LONG, v STRING").parquet(s"$src/*"),
      tgt, "k", ckp, numBuckets = 4)
    merge()
    val boot = filesPerDir(tgt, "graft_bucket=")
    assert(boot.nonEmpty && boot.values.forall(_ == 1), s"bootstrap: $boot")
    rows.filter($"k" % 50 === 0).withColumn("v", lit("upd"))
      .repartition(6).write.mode("overwrite").parquet(s"$src/b1")
    merge()
    val merged = filesPerDir(tgt, "graft_bucket=")
    assert(merged.values.forall(_ == 1), s"after merge: $merged")
    assert(graft.streaming.Streams.readMergedBase(spark, tgt).count() === 200L)
  }

  test("disk IVF index writes one file per cell dir") {
    val dir = freshDir("graft_clw_ivf_")
    val vecs = (1L to 64L)
      .map(i => (i, Array.tabulate(4)(j => ((i * 7 + j) % 13).toFloat)))
      .toDF("vec_id", "embedding").repartition(8)
    graft.ext.Similarity.writeIvfIndex(vecs, dir, numCentroids = 4)
    val fpd = filesPerDir(dir, "cid=")
    assert(fpd.nonEmpty && fpd.values.forall(_ == 1), s"ivf: $fpd")
  }
}
