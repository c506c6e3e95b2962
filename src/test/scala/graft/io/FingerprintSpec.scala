package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fingerprint's load-bearing property: invariance to row order,
  * partitioning and file layout (identical bytes ⇒ identical stamp on one
  * executor or a thousand) AND sensitivity to any value change — that
  * combination is what lets round-over-round artifacts attribute timing
  * deltas to data vs code vs host. */
class FingerprintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("invariant under repartitioning and row order; sensitive to a value edit") {
    val base = Tables.documents(spark, sf)
    val a = graft.util.Scratch.dir("graft_fp_a_")
    val b = graft.util.Scratch.dir("graft_fp_b_")
    val c = graft.util.Scratch.dir("graft_fp_c_")
    base.coalesce(1).write.mode("overwrite").parquet(s"$a/documents.parquet")
    // shuffled + multi-file layout: same rows, different order/partitioning
    base.repartition(7, $"source").sortWithinPartitions($"n_chars")
      .write.mode("overwrite").parquet(s"$b/documents.parquet")
    // one-character edit in one row must flip the checksum
    base.withColumn("text",
        when($"doc_id" === 3L, concat($"text", lit("!"))).otherwise($"text"))
      .write.mode("overwrite").parquet(s"$c/documents.parquet")
    val (na, ca) = Fingerprint.table(spark, a, "documents")
    val (nb, cb) = Fingerprint.table(spark, b, "documents")
    val (nc, cc) = Fingerprint.table(spark, c, "documents")
    assert(na == nb && ca == cb, "layout must not change the fingerprint")
    assert(na == nc && ca != cc, "a single-row edit must change the checksum")
  }

  test("events fingerprints identically through the nanos-vs-micros loader dispatch") {
    // the loader normalizes ts before hashing, so the fingerprint reflects
    // query-visible values regardless of on-disk encoding
    val (n, c) = Fingerprint.table(spark, sf, "events")
    val viaLoader = Tables.events(spark, sf)
    assert(n == viaLoader.count())
    assert(c != 0L)
  }
}
