package graft.text

import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {

  /** Reference: count ALL occurrences (overlaps included) by checking
    * every start position. */
  private def naive(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong

  test("counts all occurrences incl. overlapping and nested patterns") {
    val pats = Array("aa", "aba", "ab", "b", "abab", "baba")
    val ac = new AhoCorasick(pats)
    val text = "abababaabb"
    val got = ac.countAll(text)
    pats.zipWithIndex.foreach { case (p, i) =>
      assert(got(i) == naive(text, p), s"pattern '$p'")
    }
  }

  test("property: automaton equals naive counting on seeded random texts") {
    val rnd = new scala.util.Random(42)
    val alpha = "ab "
    val pats = Array("a", "aa", "ab", "ba b", "b a", "aba", " ", "bb")
    val ac = new AhoCorasick(pats)
    (1 to 200).foreach { _ =>
      val text = Array.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length))).mkString
      val got = ac.countAll(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == naive(text, p), s"pattern '$p' text '$text'")
      }
    }
  }

  test("empty text and no-match text yield zero vectors") {
    val ac = new AhoCorasick(Array("xyz", "q"))
    assert(ac.countAll("").forall(_ == 0L))
    assert(ac.countAll("aaabbb").forall(_ == 0L))
  }

  test("border detector: kmp-borderless patterns identified correctly") {
    assert(AhoCorasick.hasProperBorder("aa"))
    assert(AhoCorasick.hasProperBorder("abab"))
    assert(AhoCorasick.hasProperBorder("abcab"))
    assert(!AhoCorasick.hasProperBorder("a"))
    assert(!AhoCorasick.hasProperBorder("ab"))
    assert(!AhoCorasick.hasProperBorder("scan"))
    assert(!AhoCorasick.hasProperBorder("hash join"))
  }

  test("q204's oracle contract: every catalog keyword is borderless") {
    // The DuckDB oracle counts greedy non-overlapping occurrences via the
    // length-delta//replace trick; that equals the automaton's
    // all-occurrence count iff no pattern can overlap itself, i.e. iff
    // every pattern is borderless. Guard the keyword list here so a
    // future edit can't silently break the oracle equivalence.
    graft.ops.ExtQueriesShared.AcKeywords.foreach { k =>
      assert(!AhoCorasick.hasProperBorder(k),
        s"keyword '$k' has a proper border — oracle trick would undercount")
    }
  }
}
