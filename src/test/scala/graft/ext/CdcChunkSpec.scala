package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CdcChunkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunksOf(texts: Seq[String]): Map[String, Seq[(Int, Int, Int, Long)]] =
    texts.toDF("text")
      .select($"text", TextAnalysis.cdcChunks($"text").as("cs"))
      .as[(String, Seq[(Int, Int, Int, Long)])]
      .collect().toMap

  // deterministic pseudo-prose long enough to contain many breakpoints
  private val doc = (1 to 400)
    .map(i => s"w${i * 7919 % 1000}").mkString(" ")

  test("chunks reassemble the document exactly") {
    val cs = chunksOf(Seq(doc))(doc)
    assert(cs.head._2 == 1)
    cs.sliding(2).foreach {
      case Seq((_, s1, l1, _), (_, s2, _, _)) => assert(s2 == s1 + l1)
      case _ =>
    }
    assert(cs.map(_._3).sum == doc.length)
    assert(cs.map(_._1) == (1 to cs.size))
  }

  test("prefix edit re-chunks O(1) chunks — the content-defined locality property") {
    val edited = "EDIT-INSERTED-PREFIX " + doc
    val m = chunksOf(Seq(doc, edited))
    val origHashes = m(doc).map(_._4)
    val newHashes = m(edited).map(_._4)
    assert(origHashes.size >= 5,
      s"need a multi-chunk doc for a meaningful test, got ${origHashes.size}")
    val changed = newHashes.filterNot(origHashes.toSet)
    // fixed-size blocks would shift EVERY chunk; CDC must converge after
    // the first boundary past the edit
    assert(changed.size <= 2,
      s"${changed.size} of ${newHashes.size} chunks changed after a prefix edit")
    // the shared tail is identical, not just same-cardinality
    assert(newHashes.takeRight(origHashes.size - 2) ==
      origHashes.takeRight(origHashes.size - 2))
  }

  test("suffix append leaves all but the final chunk untouched") {
    val appended = doc + " TRAILING-ADDITION"
    val m = chunksOf(Seq(doc, appended))
    val orig = m(doc)
    val app = m(appended)
    assert(app.take(orig.size - 1).map(_._4) == orig.dropRight(1).map(_._4),
      "all chunks before the final one must be byte-identical after an append")
  }

  test("short and empty texts degrade to a single chunk / no chunks") {
    val m = chunksOf(Seq("tiny", ""))
    assert(m("tiny") == Seq((1, 1, 4, "tiny".foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L))))
    assert(m("").isEmpty)
  }
}
