package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Positional tsvector semantics: Postgres numbers lexemes over ALL words
  * (stopwords removed but their positions kept as gaps), and `a <-> b`
  * requires strictly consecutive positions. */
class PhraseSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def postings(rows: (Long, String)*) =
    PostingIndex.buildPositional(rows.toDF("doc_id", "text"), "doc_id", $"text")

  private def hits(p: org.apache.spark.sql.DataFrame, phrase: String): Set[Long] =
    PostingIndex.phraseSearchQuery(p, "doc_id", phrase)
      .as[Long].collect().toSet

  test("positions are 1-based over all words; stopwords leave gaps") {
    val p = postings((1L, "the quick brown fox"))
    val rows = p.orderBy($"pos").as[(Long, String, Int)].collect().toList
    // 'the' is a stopword: dropped, but quick keeps position 2
    assert(rows == List((1L, "quick", 2), (1L, "brown", 3), (1L, "fox", 4)))
  }

  test("adjacent words match, stopword-gapped words do NOT") {
    val p = postings(
      (1L, "hash join wins"),       // hash<->join adjacent
      (2L, "hash the join"),        // gap: hash@1, join@3 — must NOT match
      (3L, "join hash"))            // reversed — must NOT match
    assert(hits(p, "hash <-> join") == Set(1L))
  }

  test("three-term phrase requires a full consecutive run") {
    val p = postings(
      (1L, "sort merge join plan"),
      (2L, "sort merge hash join"), // merge join not consecutive
      (3L, "merge join sort"))      // all terms present, wrong order
    assert(hits(p, "sort <-> merge <-> join") == Set(1L))
  }

  test("phrase terms are stemmed like the index side") {
    val p = postings((1L, "merged joints"))
    // query in surface form: stem('merging')==stem('merged'), etc.
    assert(hits(p, "merging <-> joint") == Set(1L))
  }

  test("tsRank: tf-idf is higher for more occurrences, zero-match docs absent") {
    val corpus = Seq(
      (1L, "spark spark spark"),
      (2L, "spark row"),
      (3L, "row table")).toDF("doc_id", "text")
    val p = PostingIndex.buildPositional(corpus, "doc_id", $"text")
    val scores = PostingIndex.tsRank(p, "doc_id", Seq("spark"), corpus)
      .as[(Long, Double)].collect().toMap
    // df(spark)=2, N=3 -> idf = ln(1.5); doc1 tf=3, doc2 tf=1
    val idf = math.log(3.0 / 2.0)
    assert(scores.keySet == Set(1L, 2L))
    assert(math.abs(scores(1L) - 3 * idf) < 1e-6)
    assert(math.abs(scores(2L) - idf) < 1e-6)
  }
}
