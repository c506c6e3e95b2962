package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sanitizeOne(raw: String): String =
    Seq(raw).toDF("text").select(TextOps.sanitizeFiling($"text")).as[String].head()

  // Golden-file port of the reference debug fixture concept
  // (scrape_all_filings.py:152-166): SGML wrapper, one .htm section with
  // HTML tags / entities / Windows-1252 quotes / an over-long token, one
  // .pdf section full of base64 that must disappear.
  test("golden SGML filing sanitizes exactly") {
    val raw =
      "<SEC-DOCUMENT>" +
        "<DOCUMENT><TYPE>10-K<FILENAME>x.htm<TEXT>Hello&nbsp;World <b>Bold</b> " +
        "\u0093Quoted\u0094 aaaaaaaaaaaaaaaaaaaaaaaaaa end</TEXT></DOCUMENT>" +
        "<DOCUMENT><TYPE>GRAPHIC<FILENAME>y.pdf<TEXT>begin 644 y.pdf M98AABB end</TEXT></DOCUMENT>" +
        "</SEC-DOCUMENT>"
    val want = "10-k x.htm hello world bold \"quoted\" end"
    assert(sanitizeOne(raw) == want)
  }

  test("binary sections dropped for every reference extension") {
    for (ext <- TextOps.binaryExtensions) {
      val raw = s"<document><filename>a.htm<text>keep me</text></document>" +
        s"<document><filename>b.$ext<text>SECRETPAYLOAD</text></document>"
      val out = sanitizeOne(raw)
      assert(!out.contains("secretpayload"), s"ext=$ext leaked: $out")
      assert(out.contains("keep me"), s"ext=$ext dropped keepable: $out")
    }
  }

  test("NFKD normalizes compatibility characters") {
    val out = Seq("\uFB01ling \u00BD caf\u00E9").toDF("text")
      .select(TextOps.nfkd($"text")).as[String].head()
    assert(out.startsWith("filing"))          // ﬁ ligature → f + i
    assert(out.contains("1\u20442"))          // ½ → 1⁄2 (fraction slash)
    assert(out.contains("cafe\u0301"))        // é → e + combining acute
  }

  test("sanitize invariants on messy inputs") {
    val messy = Seq(
      "", "   ", "a  b\tc\nd", "<a><b></b></a>", "no tags at all",
      "x " + ("y" * 25) + " z", "&#160;&nbsp;x", "tag<open left",
      "smart quotes", "multi   spaces", "<i>i</i>" * 50)
    val out = messy.toDF("text")
      .select(TextOps.sanitizeText($"text").as("clean")).as[String].collect()
    for (c <- out) {
      assert(!c.contains("  "), s"double space in: '$c'")
      assert(c.trim == c)
      assert(!c.split(" ").exists(_.length >= 20), s"long token survives: '$c'")
      assert(!"<.+?>".r.findFirstIn(c).isDefined, s"tag survives: '$c'")
    }
    // idempotence
    val twice = messy.toDF("text")
      .select(TextOps.sanitizeText(TextOps.sanitizeText($"text"))).as[String].collect()
    assert(out.toSeq == twice.toSeq)
  }

  test("tokenize is sorted, distinct, stopword-free, stemmed") {
    val toks = Seq("The quick tables are merging the JOINS of the queries")
      .toDF("text").select(TextOps.tokenize($"text")).as[Seq[String]].head()
    assert(toks == toks.sorted)
    assert(toks.distinct == toks)
    assert(!toks.contains("the"))
    assert(toks.contains("tabl") && toks.contains("merg") &&
           toks.contains("join") && toks.contains("queri"))
  }

  test("tsMatch AND/OR semantics") {
    val df = Seq((1L, "spark joins tables"), (2L, "spark only"), (3L, "nothing here"))
      .toDF("id", "text").withColumn("tokens", TextOps.tokenize($"text"))
    assert(df.filter(TextOps.tsMatchAll($"tokens", Seq("spark", "joining")))
      .select("id").as[Long].collect().toSet == Set(1L))
    assert(df.filter(TextOps.tsMatchAny($"tokens", Seq("spark", "joining")))
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("tsHeadline: first cover, window clamped at edges, stem matches highlighted") {
    val df = Seq(
      (1L, "a b c d merged e f g h i j k"),  // interior match: 2 before, 5 after
      (2L, "merge right at the start"),       // window clamps at the left edge
      (3L, "nothing to see here"),            // no match -> null -> filtered
      (4L, "x merged y merges z"))            // both covers in window highlighted
      .toDF("id", "text")
    val got = df.select($"id", TextOps.tsHeadline($"text", "merge | slow").as("h"))
      .filter($"h".isNotNull).orderBy($"id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "c d <b>merged</b> e f g h i"),
      (2L, "<b>merge</b> right at the start"),
      (4L, "x <b>merged</b> y <b>merges</b> z")))
    // a query with only negated terms has nothing to highlight
    assertThrows[IllegalArgumentException](TextOps.tsHeadline($"text", "!merge"))
  }
}
