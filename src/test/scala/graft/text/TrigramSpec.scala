package graft.text

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** pg_trgm analog (Trigram.scala): extraction semantics pinned to the
  * published pg_trgm behavior, a reference-reimplementation property over
  * random strings, similarity identities, the SQL surface, and the
  * similarJoin contract on a planted dirty probe. */
class TrigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("show_trgm('word') example from the pg_trgm docs") {
    assert(Trigram.trigramSetImpl("word").toSet ===
      Set("  w", " wo", "wor", "ord", "rd "))
  }

  test("multi-word, case, punctuation: distinct across words, alnum runs only") {
    // 'Foo|bar foo' — words foo, bar, foo; second foo adds nothing
    val got = Trigram.trigramSetImpl("Foo|bar FOO")
    assert(got.toSet === Set("  f", " fo", "foo", "oo ", "  b", " ba", "bar", "ar "))
    // single-char word pads to 2 grams
    assert(Trigram.trigramSetImpl("a").toSet === Set("  a", " a "))
    assert(Trigram.trigramSetImpl("").isEmpty)
    assert(Trigram.trigramSetImpl("?!").isEmpty)
    assert(Trigram.trigramSetImpl(null).isEmpty)
  }

  test("property: impl equals an independent regex-split reference on random strings") {
    def reference(s: String): Set[String] =
      s.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)
        .flatMap { w => val p = "  " + w + " "; p.sliding(3) }.toSet
    val rnd = new Random(0xB16B00B5L)
    val alphabet = "abcXYZ019 .-_|&é\n"
    (0 until 300).foreach { _ =>
      val s = (0 until rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Trigram.trigramSetImpl(s).toSet === reference(s), s"input=$s")
    }
  }

  test("similarity identities: self = 1, disjoint = 0, known value") {
    val df = Seq(("word", "word"), ("word", "xyzq"), ("word", "words"))
      .toDF("a", "b")
      .select(Trigram.similarity($"a", $"b").as("sim"))
    val sims = df.collect().map(_.getDouble(0))
    assert(sims(0) === 1.0)
    assert(sims(1) === 0.0)
    // word: {  w, wo,wor,ord,rd } (5); words: {  w, wo,wor,ord,rds,ds } (6);
    // shared 4, union 7
    assert(math.abs(sims(2) - 4.0 / 7.0) < 1e-15)
  }

  test("SQL surface: graft_trigrams + graft_trgm_similarity") {
    graft.functions.Functions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_trigrams('word') AS g, graft_trgm_similarity('word', 'words') AS s")
      .collect().head
    assert(r.getSeq[String](0).toSet === Set("  w", " wo", "wor", "ord", "rd "))
    assert(math.abs(r.getDouble(1) - 4.0 / 7.0) < 1e-15)
  }

  test("similarJoin: planted near-identical probe resolves, unrelated does not") {
    val corpus = Seq((1L, "goldenrod lavender spring"), (2L, "midnight chocolate lace"))
      .toDF("id", "name")
    val probes = Seq((10L, "goldenrd lavender spring"), (11L, "zzzz qqqq"))
      .toDF("pid", "pname")
    val got = Trigram.similarJoin(corpus, "id", "name", probes, "pid", "pname")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length === 1)
    assert(got.head._1 === 1L && got.head._2 === 10L && got.head._3 > 0.7)
  }

  test("similarJoin rejects a non-positive threshold (cross-product guard)") {
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Trigram.similarJoin(df, "id", "name", df, "id", "name", threshold = 0.0)
    }
  }
}
