package graft.text

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property-style invariants of the text pipeline (SURVEY §5.3) over a
  * generated adversarial corpus: tags, entities, smart quotes, long
  * base64-ish tokens, unicode, nested/unbalanced brackets, whitespace runs.
  * One DataFrame pass evaluates every transform on every sample. */
class TextPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new Random(0xC0FFEE)
  private val fragments = Array(
    "word", "UPPER", "MixedCase", "42", "x9y",
    "<b>", "</b>", "<filename>doc.pdf", "<", ">", "<.>", "<<a>>",
    "&#160;", "&nbsp;", "quoted", "café", "Ångström",
    "QWERTYUIOPASDFGHJKLZXCVBNM1234567890abcdefgh", // 44-char garbage token
    "\n", "\t", "   ", " ", "a  b", ".", ",", "-", "")

  private def sample(): String =
    (0 until (1 + rnd.nextInt(12))).map(_ => fragments(rnd.nextInt(fragments.length)))
      .mkString(rnd.nextBoolean().toString.take(0) + " ")

  private val samples: Seq[String] =
    (Seq("", " ", "<>", "a") ++ Seq.fill(400)(sample())).distinct

  lazy val rows = {
    val df = samples.toDF("text").select(
      $"text",
      TextOps.sanitizeText($"text").as("clean"),
      TextOps.tokenizeBasic($"text").as("basic"),
      TextOps.tokenize($"text").as("toks"),
      TextOps.dropLongWords(concat(lit(" "), $"text"), 20).as("dropped"),
      TextOps.collapseWhitespace($"text").as("collapsed"))
    df.collect()
  }

  test("sanitize: no surviving simple tag, no word >= 20 chars, no double space, trimmed") {
    rows.foreach { r =>
      val clean = r.getString(1)
      // the reference's own pattern is `<.+?>`, non-DOTALL and >= 1 char
      // inside — so `<>` survives, and `<\n>` is no tag (its newline later
      // becomes a space). Assert what the reference guarantees: no simple
      // tag with a non-whitespace interior remains.
      assert(!"<[^<>\\s]+>".r.findFirstIn(clean).isDefined, s"tag survived in: '$clean'")
      assert(clean.split(" ").forall(_.length < 20), s"long word survived in: '$clean'")
      assert(!clean.contains("  "), s"double space in: '$clean'")
      assert(clean == clean.trim)
      assert(clean == clean.toLowerCase)
    }
  }

  test("tokenizers: sorted, distinct, charset-clean, stopword-free") {
    val stops = TextOps.englishStopWords.toSet
    rows.foreach { r =>
      val basic = r.getSeq[String](2)
      val toks = r.getSeq[String](3)
      assert(basic == basic.sorted && basic.distinct == basic)
      assert(basic.forall(_.matches("[a-z0-9]+")))
      assert(toks == toks.sorted && toks.distinct == toks)
      assert(toks.forall(t => !stops.contains(t)), s"stopword survived: $toks")
    }
  }

  test("dropLongWords / collapseWhitespace invariants") {
    rows.foreach { r =>
      assert(r.getString(4).split(" ").forall(_.length < 20))
      val c = r.getString(5)
      assert(!c.contains("  ") && !c.contains("\n") && !c.contains("\t"))
    }
  }

  test("sanitize is idempotent on tag-free text (single-pass strip is by design)") {
    val tagFree = samples.map(_.replaceAll("[<>]", " "))
    val df = tagFree.toDF("t")
      .select(TextOps.sanitizeText($"t").as("once"))
      .select($"once", TextOps.sanitizeText($"once").as("twice"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"not idempotent: '${r.getString(0)}' -> '${r.getString(1)}'")
    }
  }

  test("shingleSet: distinct, k-word composition, subset closure under append") {
    rows.foreach { r =>
      val text = r.getString(0)
      val sh = graft.ext.Dedup.shingleSetImpl(text, 3)
      assert(sh.distinct.length == sh.length)
      assert(sh.forall(_.split(" ").length == 3))
      // appending text only ADDS shingles, never removes
      val more = graft.ext.Dedup.shingleSetImpl(text + " zz yy xx ww", 3)
      assert(sh.toSet.subsetOf(more.toSet))
    }
  }

  /** Independent reference for tsRankCd's cover set — the tight-window DUAL
    * characterization the q114 DuckDB oracle uses (l(r) = min over terms of
    * max-occurrence ≤ r; cover iff r(l(r)) = r), reimplemented directly.
    * The engine's linear sweep must agree on random position sets — two
    * derivations of "minimal cover" cross-checking each other in-process. */
  private def refCoverScore(posA: Seq[Int], posB: Seq[Int]): Option[Double] = {
    val rs = (posA ++ posB).distinct.sorted
    def lOf(r: Int): Option[Int] = {
      val la = posA.filter(_ <= r); val lb = posB.filter(_ <= r)
      if (la.isEmpty || lb.isEmpty) None else Some(math.min(la.max, lb.max))
    }
    def r2Of(l: Int): Option[Int] = {
      val ra = posA.filter(_ >= l); val rb = posB.filter(_ >= l)
      if (ra.isEmpty || rb.isEmpty) None else Some(math.max(ra.min, rb.min))
    }
    val covers = rs.flatMap(r =>
      lOf(r).flatMap(l => r2Of(l).filter(_ == r).map(_ => (l, r))))
    if (covers.isEmpty) None
    else Some(covers.map { case (l, r) => 1.0 / (r - l + 1) }.sum)
  }

  test("tsRankCd sweep agrees with the dual cover characterization on random position sets") {
    val rnd = new Random(20260813L)
    val docs = (0 until 40).map { i =>
      val n = 4 + rnd.nextInt(12)
      val words = Array.fill(n)("qq")
      // scatter 1-3 occurrences of each term over distinct positions
      val slots = rnd.shuffle((0 until n).toList)
      val nA = 1 + rnd.nextInt(3)
      val nB = 1 + rnd.nextInt(3)
      val (aPos, rest) = slots.splitAt(nA)
      val bPos = rest.take(nB)
      aPos.foreach(p => words(p) = "alpha")
      bPos.foreach(p => words(p) = "beta")
      (i.toLong, words.mkString(" "),
        aPos.map(_ + 1).sorted, bPos.map(_ + 1).sorted)
    }
    val df = docs.map { case (id, text, _, _) => (id, text) }.toDF("doc_id", "text")
    val postings = PostingIndex.buildPositional(df, "doc_id", $"text")
    val got = PostingIndex.tsRankCd(postings, "doc_id", Seq("alpha", "beta"))
      .as[(Long, Double)].collect().toMap
    docs.foreach { case (id, text, aPos, bPos) =>
      val expected = refCoverScore(aPos, bPos)
        .map(x => math.rint(x * 1e6) / 1e6)
      assert(got.get(id) == expected,
        s"doc $id '$text': sweep=${got.get(id)} ref=$expected (a=$aPos b=$bPos)")
    }
  }
}
