package graft.text

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.text.TsQuery._

/** to_tsquery parsing + the three evaluation paths (array predicate,
  * in-memory postings, on-disk pruned index) agreeing on every operator
  * combination — NOT, grouping, prefix, phrase. */
class TsQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------------ parse

  test("precedence: | loosest, then &, then <->, then !") {
    assert(parse("a & b | c & d") ==
      Or(Seq(And(Seq(Term("a"), Term("b"))), And(Seq(Term("c"), Term("d"))))))
    assert(parse("!a & b") == And(Seq(Not(Term("a")), Term("b"))))
    assert(parse("a <-> b & c") ==
      And(Seq(Phrase(Seq("a", "b"), Seq(0, 1)), Term("c"))))
    // <N> distance: offsets accumulate from the phrase head
    assert(parse("a <2> b") == Phrase(Seq("a", "b"), Seq(0, 2)))
    assert(parse("a <-> b <3> c") == Phrase(Seq("a", "b", "c"), Seq(0, 1, 4)))
  }

  test("grouping overrides precedence; prefix parses on the term") {
    assert(parse("a & !(b | c)") ==
      And(Seq(Term("a"), Not(Or(Seq(Term("b"), Term("c")))))))
    assert(parse("vec:*") == Term("vec", prefix = true))
    assert(parse("a | (b & c:*)") ==
      Or(Seq(Term("a"), And(Seq(Term("b"), Term("c", prefix = true))))))
  }

  test("parseStemmed normalizes lexemes like the tokenize side") {
    assert(parseStemmed("Merges & !JOINING") ==
      And(Seq(Term(Porter.stem("merges")), Not(Term(Porter.stem("joining"))))))
  }

  test("malformed queries fail loudly") {
    for (bad <- Seq("a &", "& a", "a !b", "(a | b", "a <- b", "a ~ b", "",
                    "a <-> b:*", "a <-> (b | c)"))
      assertThrows[IllegalArgumentException](parse(bad))
  }

  test("hasPhrase: true only for phrase/distance nodes, through any nesting") {
    assert(!TsQuery.hasPhrase(parse("a & !(b | c:*)")))
    assert(TsQuery.hasPhrase(parse("a <-> b")))
    assert(TsQuery.hasPhrase(parse("x | (a <2> b)")))
    assert(!TsQuery.hasPhrase(TsQuery.parseWebsearch("merge -window or fast")))
    assert(TsQuery.hasPhrase(TsQuery.parseWebsearch("merge \"hash join\"")))
  }

  test("prefix match treats _ as a literal, not a LIKE wildcard") {
    // a lexeme with an underscore can never start-with-match a token that
    // has a different character in that position; the LIKE compilation
    // must escape `_` or 'a_b:*' would match 'axb'
    val t = Seq((1L, Seq("axb", "plain")), (2L, Seq("a_b_suffix", "x")))
      .toDF("doc_id", "toks")
    val hits = t.filter(TextOps.tsMatchQuery($"toks", "a_b:*"))
      .select($"doc_id").as[Long].collect().toSet
    assert(hits == Set(2L), s"underscore wildcarded: $hits")
  }

  // ------------------------------------------- evaluation path equivalence

  private val docs = Seq(
    (1L, "merge the tables fast"),
    (2L, "merge with window functions"),
    (3L, "merge join strategies"),
    (4L, "vector embeddings rule"),
    (5L, "plain sort order"),
    (6L, "window vector blend")).toDF("doc_id", "text")

  private def viaColumn(q: String): Set[Long] =
    docs.select($"doc_id", TextOps.tokenize($"text").as("toks"))
      .filter(TextOps.tsMatchQuery($"toks", q))
      .select($"doc_id").as[Long].collect().toSet

  private lazy val postings =
    PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text"))

  private def viaPostings(q: String): Set[Long] =
    PostingIndex.searchQuery(postings, "doc_id", q, docs.select($"doc_id"))
      .as[Long].collect().toSet

  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsq_idx_").toString + "/idx"
    PostingIndex.write(postings, dir, buckets = 8)
    dir
  }

  private def viaIndex(q: String): Set[Long] =
    PostingIndex.searchQueryIndexed(spark, indexDir, "doc_id", q,
      docs.select($"doc_id"), buckets = 8)
      .as[Long].collect().toSet

  private val cases = Seq(
    "merge"                          -> Set(1L, 2L, 3L),
    "merge & !(window | join)"       -> Set(1L),
    "(merge & !window) | vec:*"      -> Set(1L, 3L, 4L, 6L),
    "!merge"                         -> Set(4L, 5L, 6L), // bare NOT = complement
    "!merge & !vector"               -> Set(5L),
    "vec:*"                          -> Set(4L, 6L),     // prefix hits 'vector'
    "merging | sorted"               -> Set(1L, 2L, 3L, 5L), // stemmed match
    "!(merge | vec:*)"               -> Set(5L))

  test("array-predicate, posting, and indexed paths agree on every operator mix") {
    for ((q, expected) <- cases) {
      assert(viaColumn(q) == expected, s"column path: <$q>")
      assert(viaPostings(q) == expected, s"posting path: <$q>")
      assert(viaIndex(q) == expected, s"indexed path: <$q>")
    }
  }

  test("graft_ts_query SQL function compiles to the same semantics") {
    graft.functions.Functions.registerAll(spark)
    docs.createOrReplaceTempView("tsq_docs")
    val got = spark.sql(
      """SELECT doc_id FROM (
           SELECT doc_id, graft_tokenize(text) AS toks FROM tsq_docs)
         WHERE graft_ts_query(toks, '(merge & !window) | vec:*')""")
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L, 6L))
  }

  test("graft_websearch SQL function matches the websearch semantics") {
    graft.functions.Functions.registerAll(spark)
    docs.createOrReplaceTempView("tsq_docs_web")
    val got = spark.sql(
      """SELECT doc_id FROM (
           SELECT doc_id, graft_tokenize(text) AS toks FROM tsq_docs_web)
         WHERE graft_websearch(toks, 'merge -window or vector')""")
      .as[Long].collect().toSet
    assert(got == viaColumn("(merge & !window) | vector"))
  }

  test("phrase inside a boolean tsquery works over positional postings") {
    val pos = PostingIndex.buildPositional(docs, "doc_id", $"text")
    val got = PostingIndex.searchQuery(pos, "doc_id",
      "(merge <-> join) | vec:*", docs.select($"doc_id"))
      .as[Long].collect().toSet
    assert(got == Set(3L, 4L, 6L))
    // phrase needs positions: the deduped posting table must refuse
    assertThrows[IllegalArgumentException](viaPostings("merge <-> join"))
  }

  test("<N> distance: exact relative position, stopword gaps count") {
    // doc 1: "merge the tables fast" -> merg@1, tabl@3 ('the' leaves a gap),
    // fast@4: merge <2> tables matches, merge <-> tables does not
    val pos = PostingIndex.buildPositional(docs, "doc_id", $"text")
    def hits(q: String): Set[Long] =
      PostingIndex.searchQuery(pos, "doc_id", q, docs.select($"doc_id"))
        .as[Long].collect().toSet
    assert(hits("merge <2> tables") == Set(1L))
    assert(hits("merge <-> tables") == Set.empty[Long])
    assert(hits("merge <2> tables <-> fast") == Set(1L))
    assert(hits("merge <3> fast") == Set(1L))
  }

  test("websearch: words AND, -negates, or alternates, quoted phrase keeps stopword gaps") {
    import TsQuery._
    assert(parseWebsearch("""merge -window or "merge the tables"""") ==
      Or(Seq(
        And(Seq(Term("merg"), Not(Term("window")))),
        Phrase(Seq("merg", "tabl"), Seq(0, 2)))))
    // one-word phrase degrades to a term; bare punctuation is ignored
    assert(parseWebsearch("""+merge!! "sorted" """) ==
      And(Seq(Term("merg"), Term("sort"))))
    // OR is case-insensitive; a negated 'or' is a stopword and vanishes
    assert(parseWebsearch("merge OR window") == Or(Seq(Term("merg"), Term("window"))))
    assert(parseWebsearch("-or merge") == Term("merg"))
    assertThrows[IllegalArgumentException](parseWebsearch("  ... !! "))
    // bare stopwords drop like quoted ones do: 'the merge' must not AND an
    // unmatchable lexeme (the index never stores stopwords)
    assert(parseWebsearch("the merge") == Term("merg"))
    assert(parseWebsearch("merge -the fast") == And(Seq(Term("merg"), Term("fast"))))
    assertThrows[IllegalArgumentException](parseWebsearch("the of a"))
    // hyphenated bare words split on the tokenizer's delimiter and keep
    // stopword gaps, same as the quoted form
    assert(parseWebsearch("state-of-the-art") == Phrase(Seq("state", "art"), Seq(0, 3)))
    assert(parseWebsearch("state-of-the-art") == parseWebsearch("\"state of the art\""))
    assert(parseWebsearch("-state-of-the-art merge") ==
      And(Seq(Not(Phrase(Seq("state", "art"), Seq(0, 3))), Term("merg"))))
  }

  test("plainto: words AND, stopwords/punctuation vanish, stems applied") {
    assert(parsePlainto("The merges, joining!") ==
      And(Seq(Term(graft.text.Porter.stem("merges")), Term(graft.text.Porter.stem("joining")))))
    assert(parsePlainto("Merge") == Term("merg"))
    // operators are NOT operators here — plainto treats them as junk chars,
    // and 'or' is a stopword (exactly Postgres: plainto_tsquery('a or b'))
    assert(parsePlainto("merge -window or fast") ==
      And(Seq(Term("merg"), Term("window"), Term("fast"))))
    assertThrows[IllegalArgumentException](parsePlainto("the of a ..."))
  }

  test("phraseto: whole input is one gap-preserving phrase") {
    assert(parsePhraseto("merge the tables") == Phrase(Seq("merg", "tabl"), Seq(0, 2)))
    assert(parsePhraseto("hash join") == Phrase(Seq("hash", "join"), Seq(0, 1)))
    // to one word -> plain term; to zero -> rejected
    assert(parsePhraseto("the merges") == Term("merg"))
    assertThrows[IllegalArgumentException](parsePhraseto("of the"))
    // same rule as a quoted websearch phrase, by construction
    assert(parsePhraseto("state of the art") == parseWebsearch("\"state of the art\""))
  }

  test("ts_rewrite: exact, commutative, and subset matches; rules in order") {
    def q(s: String) = parse(s)
    // exact node match
    assert(rewrite(q("a & b"), q("a"), q("x | y")) == q("(x | y) & b"))
    // commutative match: target 'a & b' matches 'b & a'
    assert(rewrite(q("b & a"), q("a & b"), q("z")) == q("z"))
    assert(rewrite(q("b | a"), q("a | b"), q("z")) == q("z"))
    // subset match inside a wider conjunction (Postgres rewrites a & b & c
    // with target a & b into z & c)
    assert(rewrite(q("a & b & c"), q("a & b"), q("z")) == And(Seq(q("z"), q("c"))))
    assert(rewrite(q("a | b | c"), q("b | c"), q("z")) == Or(Seq(q("z"), q("a"))))
    // nested occurrences, incl. under NOT
    assert(rewrite(q("!(a) | (a & c)"), q("a"), q("w")) == q("!(w) | (w & c)"))
    // no match -> identity
    assert(rewrite(q("a & b"), q("d"), q("z")) == q("a & b"))
    // a phrase target matches structurally
    assert(rewrite(q("(a <-> b) | c"), q("a <-> b"), q("p")) == q("p | c"))
    // rules apply in order, each over the previous result
    assert(rewriteAll(q("a"), Seq(q("a") -> q("b"), q("b") -> q("c"))) == q("c"))
  }

  test("websearch evaluation agrees with the equivalent tsquery") {
    val pos = PostingIndex.buildPositional(docs, "doc_id", $"text")
    def web(q: String): Set[Long] =
      PostingIndex.searchWebsearch(pos, "doc_id", q, docs.select($"doc_id"))
        .as[Long].collect().toSet
    def tsq(q: String): Set[Long] =
      PostingIndex.searchQuery(pos, "doc_id", q, docs.select($"doc_id"))
        .as[Long].collect().toSet
    assert(web("""merge -window""") == tsq("merge & !window"))
    assert(web("""merge or vector""") == tsq("merge | vector"))
    assert(web(""""merge join" or sorted""") == tsq("(merge <-> join) | sorted"))
  }

  test("indexed NOT-query still prunes the scan to the exact terms' buckets") {
    val df: DataFrame = PostingIndex.searchQueryIndexed(spark, indexDir, "doc_id",
      "merge & !(window | join)", docs.select($"doc_id"), buckets = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("lexeme_bucket"),
      s"bucket partition pruning missing from NOT-query plan:\n$plan")
  }
}
