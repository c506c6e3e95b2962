package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[PostingIndex.appendToIndex]] invariants: an incrementally-maintained
  * index is indistinguishable from a fresh full-corpus build, appends only
  * rewrite touched bucket partitions, and re-applying a batch is a no-op. */
class PostingIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_pidx_spec_").toString + "/idx"

  private val docs = Seq(
    (1L, "merge join scan"),
    (2L, "merge sort spill"),
    (3L, "vector join probe"),
    (4L, "merge join vector"),
    (5L, "window frame scan"),
    (6L, "hash hash hash"))
    .toDF("doc_id", "text")

  private def indexRows(dir: String): Set[(String, Long, Int)] =
    spark.read.parquet(dir)
      .select($"lexeme", $"doc_id", $"lexeme_bucket".cast("int"))
      .as[(String, Long, Int)].collect().toSet

  test("incremental appends converge to the full-rebuild index, re-append is a no-op") {
    val full = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")), full, buckets = 4)

    val incr = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs.filter($"doc_id" <= 2), "doc_id", TextOps.tokenize($"text")),
      incr, buckets = 4)
    PostingIndex.appendToIndex(spark, incr,
      docs.filter($"doc_id" === 3 || $"doc_id" === 4), "doc_id",
      TextOps.tokenize($"text"), buckets = 4)
    PostingIndex.appendToIndex(spark, incr,
      docs.filter($"doc_id" >= 5), "doc_id", TextOps.tokenize($"text"), buckets = 4)
    assert(indexRows(incr) == indexRows(full))

    // idempotence: re-applying an already-applied batch changes nothing
    PostingIndex.appendToIndex(spark, incr,
      docs.filter($"doc_id" >= 5), "doc_id", TextOps.tokenize($"text"), buckets = 4)
    assert(indexRows(incr) == indexRows(full))

    // and search through the incrementally-built index matches the in-memory path
    val viaIncr = PostingIndex.searchAllIndexed(spark, incr, "doc_id",
      Seq("merge", "join"), buckets = 4).as[Long].collect().sorted.toSeq
    val viaMem = PostingIndex.searchAll(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")),
      "doc_id", Seq("merge", "join")).as[Long].collect().sorted.toSeq
    assert(viaIncr == viaMem && viaIncr.nonEmpty)
  }

  test("append/upsert into a lexeme bucket ABSENT from the index creates it") {
    // the explicit-path read (round 11) probes only touched dirs — a new
    // lexeme hashing into a bucket never yet written must not throw on the
    // missing path, and the posting must be searchable afterwards
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")), dir, buckets = 64)
    def dirsNow(): Set[String] = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("lexeme_bucket=")).map(_.getName).toSet
    val existing = dirsNow()
    assert(existing.size < 20, "tiny vocab must leave most of 64 buckets absent")
    // a stemmed lexeme whose bucket dir doesn't exist yet (writer's hash)
    val cand = Seq("zebra", "quartz", "fjord", "kudzu", "waltz", "nymph")
      .map(w => Porter.stem(w))
      .map(w => w -> Seq(w).toDF("lexeme")
        .select(pmod(hash($"lexeme"), lit(64)).cast("int")).as[Int].head())
      .find { case (_, b) => !existing.contains(s"lexeme_bucket=$b") }.get
    PostingIndex.appendToIndex(spark, dir,
      Seq((9L, cand._1)).toDF("doc_id", "text"), "doc_id",
      TextOps.tokenize($"text"), buckets = 64)
    assert(dirsNow().contains(s"lexeme_bucket=${cand._2}"),
      "the new bucket partition must exist after the append")
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id", Seq(cand._1), buckets = 64)
      .as[Long].collect().toSeq == Seq(9L))
    // and the upsert path over the same absent-bucket shape: re-scrape doc 9
    // into ANOTHER fresh lexeme's bucket; ghost postings must be swept
    val cand2 = Seq("sphinx", "glyph", "crypt", "lynx", "myrrh")
      .map(w => Porter.stem(w))
      .map(w => w -> Seq(w).toDF("lexeme")
        .select(pmod(hash($"lexeme"), lit(64)).cast("int")).as[Int].head())
      .find { case (w, b) =>
        !dirsNow().contains(s"lexeme_bucket=$b") && w != cand._1 }.get
    PostingIndex.upsertIndex(spark, dir,
      Seq((9L, cand2._1)).toDF("doc_id", "text"), "doc_id",
      TextOps.tokenize($"text"), buckets = 64)
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id", Seq(cand2._1), buckets = 64)
      .as[Long].collect().toSeq == Seq(9L))
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id", Seq(cand._1), buckets = 64)
      .count() == 0, "upsert must sweep the ghost posting from the old bucket")
  }

  test("a bucket count disagreeing with the written layout is rejected") {
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")), dir, buckets = 4)
    assertThrows[IllegalArgumentException](
      PostingIndex.appendToIndex(spark, dir,
        Seq((9L, "zebra")).toDF("doc_id", "text"), "doc_id",
        TextOps.tokenize($"text"), buckets = 8))
    assertThrows[IllegalArgumentException](
      PostingIndex.searchAllIndexed(spark, dir, "doc_id", Seq("merge"), buckets = 8))
    // the matching count still works
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id", Seq("merge"), buckets = 4)
      .count() > 0)
  }

  test("append rewrites only the touched bucket partitions") {
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")), dir, buckets = 4)
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("lexeme_bucket="))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(before.size > 1, "fixture must span several buckets")

    // one new doc whose single lexeme touches exactly one bucket
    Thread.sleep(1100) // parquet mtimes have second granularity on some filesystems
    PostingIndex.appendToIndex(spark, dir,
      Seq((7L, "zebra")).toDF("doc_id", "text"), "doc_id",
      TextOps.tokenize($"text"), buckets = 4)

    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("lexeme_bucket="))
      .map(f => f.getName -> f.lastModified()).toMap
    val rewritten = after.keys.filter(k => before.get(k).exists(_ != after(k))).toSeq
    assert(rewritten.size <= 1,
      s"single-lexeme append must touch at most one bucket, rewrote: $rewritten")
    // the new posting is there
    assert(spark.read.parquet(dir).filter($"doc_id" === 7L).count() == 1L)
  }

  test("positional append converges to full rebuild; layout mixing is rejected clearly") {
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.buildPositional(docs.filter($"doc_id" <= 3), "doc_id", $"text"),
      dir, buckets = 4)
    PostingIndex.appendToIndexPositional(spark, dir,
      docs.filter($"doc_id" > 3), "doc_id", $"text", buckets = 4)
    // the maintained positional index answers phrase search exactly like a
    // fresh full-corpus build
    val full = PostingIndex.buildPositional(docs, "doc_id", $"text")
    val viaIdx = PostingIndex.phraseSearchQuery(
      spark.read.parquet(dir), "doc_id", "merge <-> join")
      .as[Long].collect().toSet
    val viaFull = PostingIndex.phraseSearchQuery(full, "doc_id", "merge <-> join")
      .as[Long].collect().toSet
    assert(viaIdx == viaFull && viaIdx.nonEmpty)
    // plain append into a positional base must fail with a usable message,
    // not an unresolved-column AnalysisException mid-rewrite
    val e = intercept[IllegalArgumentException] {
      PostingIndex.appendToIndex(spark, dir,
        Seq((9L, "zebra")).toDF("doc_id", "text"), "doc_id",
        TextOps.tokenize($"text"), buckets = 4)
    }
    assert(e.getMessage.contains("appendToIndexPositional"), e.getMessage)
  }

  /** Bucket id of a lexeme under the write() layout hash. */
  private def bucketOf(lex: String, buckets: Int): Int =
    Seq(lex).toDF("lexeme")
      .select(pmod(hash($"lexeme"), lit(buckets)).cast("int")).as[Int].head()

  test("upsert sweeps ghost postings from buckets the new batch never touches") {
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")), dir, buckets = 4)
    // a replacement word whose bucket differs from EVERY lexeme of doc 6's
    // old text ("hash") — so the upsert batch alone cannot touch the
    // ghost's bucket and only the sidecar sweep can evict it
    val ghostBucket = bucketOf("hash", 4)
    val word = Seq("zebra", "quark", "lemur", "otter", "raven")
      .find(w => bucketOf(Porter.stem(w), 4) != ghostBucket).get
    PostingIndex.upsertIndex(spark, dir,
      Seq((6L, word)).toDF("doc_id", "text"), "doc_id",
      TextOps.tokenize($"text"), buckets = 4)
    // ghost gone, replacement present, everyone else untouched
    val full = freshDir()
    PostingIndex.write(
      PostingIndex.build(
        docs.filter($"doc_id" =!= 6L).unionByName(Seq((6L, word)).toDF("doc_id", "text")),
        "doc_id", TextOps.tokenize($"text")), full, buckets = 4)
    assert(indexRows(dir) == indexRows(full))
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id", Seq("hash"), buckets = 4)
      .count() == 0L)
  }

  test("upsert to empty text is a pure delete; an emptied bucket partition disappears") {
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")), dir, buckets = 4)
    // doc 6 is the only holder of lexeme "hash"; if its bucket holds no
    // other lexemes, the delete must remove the partition dir itself
    PostingIndex.upsertIndex(spark, dir,
      Seq((6L, "")).toDF("doc_id", "text"), "doc_id",
      TextOps.tokenize($"text"), buckets = 4)
    assert(spark.read.parquet(dir).filter($"doc_id" === 6L).count() == 0L)
    val full = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs.filter($"doc_id" =!= 6L), "doc_id",
        TextOps.tokenize($"text")), full, buckets = 4)
    assert(indexRows(dir) == indexRows(full))
    // idempotent: deleting an absent doc changes nothing and still works
    PostingIndex.upsertIndex(spark, dir,
      Seq((6L, "")).toDF("doc_id", "text"), "doc_id",
      TextOps.tokenize($"text"), buckets = 4)
    assert(indexRows(dir) == indexRows(full))
  }

  test("upsert on a sidecar-less index bootstraps the doc map lazily and still sweeps") {
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.build(docs, "doc_id", TextOps.tokenize($"text")), dir, buckets = 4)
    // write() deliberately creates NO sidecar (search/append-only users
    // never pay for it — the round-6 lesson); the first upsert must
    // bootstrap it from the index and sweep correctly
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_docmap")),
      "write() must not build the sidecar eagerly")
    PostingIndex.upsertIndex(spark, dir,
      Seq((1L, "zebra")).toDF("doc_id", "text"), "doc_id",
      TextOps.tokenize($"text"), buckets = 4)
    val full = freshDir()
    PostingIndex.write(
      PostingIndex.build(
        docs.filter($"doc_id" =!= 1L).unionByName(Seq((1L, "zebra")).toDF("doc_id", "text")),
        "doc_id", TextOps.tokenize($"text")), full, buckets = 4)
    assert(indexRows(dir) == indexRows(full))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_docmap")),
      "the first upsert should have bootstrapped the sidecar")
  }

  test("term search is occurrence-blind on a positional index, drops stopword terms, and an all-stopword query matches nothing") {
    val dir = freshDir()
    // doc 6 repeats 'hash' 3 times and has no 'join': a raw row count
    // would both false-positive it on ("hash","join") (2 rows ≥ 2 terms
    // when filtered... with 'hash' alone 3 rows) and false-negative docs
    // whose repeats overshoot the target — counts must be DISTINCT lexemes
    PostingIndex.write(
      PostingIndex.buildPositional(docs, "doc_id", $"text"), dir, buckets = 4)
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("hash"), buckets = 4).as[Long].collect().sorted.toSeq == Seq(6L))
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("hash", "join"), buckets = 4).as[Long].collect().isEmpty,
      "repeated single term must not satisfy a two-term AND")
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("merge", "join"), buckets = 4).as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // stopword terms vanish from the query (to_tsquery semantics) instead
    // of making the AND unsatisfiable — no stopword lexeme is ever indexed
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("the", "merge", "join"), buckets = 4)
      .as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // all-stopword query = empty tsquery = matches nothing, not everything
    assert(PostingIndex.searchAllIndexed(spark, dir, "doc_id",
      Seq("the", "of"), buckets = 4).as[Long].collect().isEmpty)
  }

  test("positional upsert replaces (lexeme, pos) rows so phrase ghosts die") {
    val dir = freshDir()
    PostingIndex.write(
      PostingIndex.buildPositional(docs, "doc_id", $"text"), dir, buckets = 4)
    // v1: doc 5 text is "window frame scan" (no merge<->join adjacency);
    // corrupt doc 5 to carry the phrase, then upsert back the true text
    PostingIndex.upsertIndexPositional(spark, dir,
      Seq((5L, "merge join window")).toDF("doc_id", "text"), "doc_id", $"text", buckets = 4)
    val hit = PostingIndex.phraseSearchQuery(
      spark.read.parquet(dir), "doc_id", "merge <-> join").as[Long].collect().toSet
    assert(hit.contains(5L))
    PostingIndex.upsertIndexPositional(spark, dir,
      Seq((5L, "window frame scan")).toDF("doc_id", "text"), "doc_id", $"text", buckets = 4)
    val after = PostingIndex.phraseSearchQuery(
      spark.read.parquet(dir), "doc_id", "merge <-> join").as[Long].collect().toSet
    assert(!after.contains(5L), s"phrase ghost survived the upsert: $after")
    val full = PostingIndex.buildPositional(docs, "doc_id", $"text")
    assert(after == PostingIndex.phraseSearchQuery(full, "doc_id", "merge <-> join")
      .as[Long].collect().toSet)
  }

  test("setweight ranking: one title hit outranks many body hits; flags are arithmetic; indexed path agrees") {
    // doc 1: three BODY hits of "merge"; doc 2: one TITLE hit — under the
    // Postgres default weights (D=0.1, A=1.0) the weighted order must be
    // the reverse of the unweighted (pure-tf) order
    val fielded = Seq(
      (1L, "alpha beta", "merge merge merge"),
      (2L, "merge gamma", "delta epsilon"),
      (3L, "zeta eta", "theta iota")) // no hit — keeps df < N so idf > 0
      .toDF("doc_id", "title", "body")
    val weighted = PostingIndex.buildPositionalWeighted(fielded, "doc_id",
      Seq(($"title", "A"), ($"body", "D")))
    // positions continue across the fields, like tsvector ||
    assert(weighted.filter($"lexeme" === "merg").select($"doc_id", $"pos", $"weight")
      .as[(Long, Int, String)].collect().toSet ==
      Set((1L, 3, "D"), (1L, 4, "D"), (1L, 5, "D"), (2L, 1, "A")))

    val corpus = fielded.select($"doc_id")
    def scores(norm: Int, w: Seq[Double] = Seq(0.1, 0.2, 0.4, 1.0)): Map[Long, Double] =
      PostingIndex.tsRankWeighted(weighted, "doc_id", Seq("merge"), corpus,
        weights = w, normalization = norm)
        .as[(Long, Double)].collect().toMap
    val unweighted = PostingIndex.tsRank(
      weighted.select($"doc_id", $"lexeme", $"pos"), "doc_id", Seq("merge"), corpus)
      .as[(Long, Double)].collect().toMap
    assert(unweighted(1L) > unweighted(2L), "tf alone must favor the body-hit doc")
    val wScores = scores(0)
    assert(wScores(2L) > wScores(1L), s"title weight must flip the order: $wScores")
    // hand arithmetic on ratios (idf = ln(3/2) cancels): wtf(1) = 3·0.1,
    // wtf(2) = 1·1.0 ⇒ s1/s2 = 0.3. Doc lengths (stopword-free postings):
    // doc1 = 5, doc2 = 4 ⇒ flag 2 scales the ratio by 4/5.
    assert(math.abs(wScores(1L) / wScores(2L) - 0.3) < 1e-4)
    val n2 = scores(2)
    assert(math.abs(n2(1L) / n2(2L) - 0.3 * 4.0 / 5.0) < 1e-4,
      s"flag 2 must divide by doc length: $n2")
    // flag 32 maps any positive score into (0, 1)
    val n32 = scores(32)
    assert(n32.values.forall(v => v >= 0 && v < 1))

    // the written-index path ranks identically (weight column rides the layout)
    val dir = freshDir()
    PostingIndex.write(weighted, dir, buckets = 4)
    val viaIdx = PostingIndex.tsRankWeightedIndexed(spark, dir, "doc_id",
      Seq("merge"), corpus, normalization = 1 | 32, buckets = 4)
      .as[(Long, Double)].collect().toMap
    val viaMem = scores(1 | 32)
    assert(viaIdx == viaMem, s"indexed $viaIdx vs in-memory $viaMem")
    // unsupported flag 4 is rejected, not silently ignored
    assertThrows[IllegalArgumentException](scores(4))
  }

  test("tsRankCd: hand-computed minimal covers, zero-cover docs dropped") {
    val cds = Seq(
      (1L, "alpha qq beta"),               // one cover [1,3] -> 1/3
      (2L, "alpha beta"),                  // one cover [1,2] -> 1/2
      (3L, "alpha qq qq qq beta alpha"),   // covers [1,5] + [5,6] -> 0.2 + 0.5
      (4L, "alpha qq alpha"),              // beta absent -> no cover -> dropped
      (5L, "beta alpha beta"))             // covers [1,2] + [2,3] -> 1.0
      .toDF("doc_id", "text")
    val postings = PostingIndex.buildPositional(cds, "doc_id", $"text")
    val r = PostingIndex.tsRankCd(postings, "doc_id", Seq("alpha", "beta"))
      .orderBy($"doc_id").as[(Long, Double)].collect().toSeq
    assert(r == Seq((1L, 0.333333), (2L, 0.5), (3L, 0.7), (5L, 1.0)))
    // single-term query degenerates to tf, as in Postgres
    val single = PostingIndex.tsRankCd(postings, "doc_id", Seq("alpha"))
      .orderBy($"doc_id").as[(Long, Double)].collect().toSeq
    assert(single == Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0), (5L, 1.0)))
  }
}
