package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Okapi BM25 (Bm25.scala): score pinned to a hand-computed corpus, the
  * no-match filter, stopword/stemming interaction, and the one-scan plan
  * shape (no explode, exactly one shuffle for the stats all-reduce). */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 docs; query terms "spark", "join" (both stem-stable). Stopword "the"
  // must not count toward dl. Hand-computed with k1=1.2, b=0.75:
  private def corpus = Seq(
    (1L, "spark join spark"),      // dl=3, tf(spark)=2, tf(join)=1
    (2L, "the join"),              // dl=1, tf(join)=1
    (3L, "quantum flux"),          // dl=2, no terms -> filtered out
    (4L, "spark")                  // dl=1, tf(spark)=1
  ).toDF("doc_id", "text")

  private def bm25(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
  }

  test("scores match a hand-computed reference; no-term docs are dropped") {
    val got = Bm25.score(corpus, "doc_id", col("text"), Seq("spark", "join"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 4L))
    // N=4 (doc 3 counts toward corpus stats), sumdl=3+1+2+1=7, avgdl=7/4
    val avgdl = 7.0 / 4.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === r6(bm25(2, 3, 2, 4, avgdl) + bm25(1, 3, 2, 4, avgdl)))
    assert(got(2L) === r6(bm25(1, 1, 2, 4, avgdl)))
    assert(got(4L) === r6(bm25(1, 1, 2, 4, avgdl)))
    assert(got(2L) === got(4L)) // identical (tf, dl, term-idf) pairs
  }

  test("longer documents are penalized at equal tf (b > 0)") {
    val got = Bm25.score(
      Seq((1L, "spark alpha beta gamma delta"), (2L, "spark")).toDF("doc_id", "text"),
      "doc_id", col("text"), Seq("spark")).as[(Long, Double)].collect().toMap
    assert(got(2L) > got(1L))
  }

  test("plan: single stats shuffle, no explode/generate") {
    val plan = Bm25.score(corpus, "doc_id", col("text"), Seq("spark", "join"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "BM25 must not explode posting rows")
  }

  test("plan: the stem expression is evaluated once per corpus pass") {
    // Against a real file scan (the in-memory corpus constant-folds away):
    // exactly one graft_stem_array per subtree — one on the scoring branch,
    // one on the stats branch — and none substituted into the scan's data
    // filters by predicate pushdown (the observe() barrier's whole job).
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Bm25.score(docs, "doc_id", col("text"), Seq("merger", "acquisition"))
      .queryExecution.executedPlan.toString
    val stems = "graft_stem_array".r.findAllIn(plan).size
    assert(stems == 2, s"expected 2 stem evaluations (scoring + stats subtree), got $stems:\n" +
      plan.split("\n").filter(_.contains("graft_stem_array")).mkString("\n"))
    assert(!plan.contains("DataFilters: [(size("),
      "match filter must not be pushed below the lexeme materialization")
  }
}
