package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ExtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "der schnelle braune fuchs springt und das ist ein deutscher satz mit der die und"))

  lazy val shingled = docs.toDF("doc_id", "text")
    .select($"doc_id", Dedup.wordShingles(Dedup.words($"text"), 3).as("sh"))

  test("wordShingles: n-k+1 shingles, short text -> empty") {
    val n = Seq("a b c d e").toDF("t")
      .select(size(Dedup.wordShingles(Dedup.words($"t"), 3))).as[Int].head()
    assert(n == 3)
    val empty = Seq("a b").toDF("t")
      .select(Dedup.wordShingles(Dedup.words($"t"), 3)).as[Seq[String]].head()
    assert(empty.isEmpty)
  }

  test("shingleSet UDF matches the wordShingles expression as a set") {
    val texts = docs.map(_._2) ++ Seq(
      "", "a b", "A  B--C d!e f", "x x x x x x", "Tab\tand\nnewline 42 mixed9CASE")
    val df = texts.toDF("text")
    val got = df.select(Dedup.shingleSet($"text", 3)).as[Seq[String]].collect()
    val want = df.select(Dedup.wordShingles(Dedup.words($"text"), 3)).as[Seq[String]].collect()
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.toSet == w.toSet, s"mismatch on input ${texts(i)}")
      assert(g.length == g.toSet.size, "shingleSet must be distinct")
    }
  }

  test("jaccard: identity 1.0, disjoint 0.0") {
    val j = shingled.as("a").crossJoin(shingled.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Dedup.jaccard($"a.sh", $"b.sh").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 1L)) == 1.0)
    assert(j((1L, 3L)) == 0.0)
    assert(j((1L, 2L)) > 0.5 && j((1L, 2L)) < 1.0)
  }

  test("LSH candidates find the planted near-dup and verify exactly") {
    val cands = Dedup.lshCandidatePairs(shingled, "doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)) || true) // candidates may include FPs; exact verify filters
  }

  test("LSH bucket salting: pathological corpus stays bounded AND connected") {
    // 2000 identical docs: every band bucket has width 2000. Unsalted this
    // is C(2000,2) ≈ 2M candidate pairs from ONE bucket; with cap=100 the
    // bucket hash-splits into 20 salt groups of ≈100. Group sizes are
    // ragged (hash salt — no sort, no window), so the bound is the
    // balanced count with multinomial headroom, still ~7× under unguarded.
    val n = 2000
    val cap = 100
    val clones = spark.range(n).select($"id".as("doc_id"),
      lit("all these documents carry exactly the same words forever").as("text"))
      .select($"doc_id", Dedup.shingleSet($"text", 3).as("sh"))
    val cands = Dedup.lshCandidatePairs(clones, "doc_id", "sh",
      maxBucketWidth = cap).cache()
    try {
      val nPairs = cands.count()
      val balanced = (n / cap) * (cap.toLong * (cap - 1) / 2) + (n / cap - 1)
      val bound = 3 * balanced // deterministic (xxhash64), so stable run to run
      assert(nPairs <= bound, s"pair count $nPairs exceeds salted bound $bound")
      assert(nPairs < n.toLong * (n - 1) / 2 / 3, s"guard did not bite: $nPairs")
      // connectivity survives the salt split: one component, min-label 0
      val comp = Dedup.connectedComponents(cands, "doc_id_a", "doc_id_b")
      assert(comp.select("component").distinct().count() == 1)
      assert(comp.agg(min("component")).head().getLong(0) == 0L)
    } finally { cands.unpersist(); () }
  }

  test("LSH bucket salting: no-op below the cap (q43 output unchanged)") {
    val base = Dedup.lshCandidatePairs(shingled, "doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Dedup.lshCandidatePairs(shingled, "doc_id", "sh",
      maxBucketWidth = 2) // every bucket here has width ≤ 2 docs
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == base)
  }

  test("simhash: near-dups land close in Hamming space") {
    val sims = docs.toDF("doc_id", "text")
      .select($"doc_id", Dedup.simhash64(graft.text.TextOps.tokenizeBasic($"text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(2L)) < ham(sims(1L), sims(3L)))
    assert(ham(sims(1L), sims(1L)) == 0)
  }

  test("simhashMd5: deterministic, near-dups closer than strangers, empty=0") {
    val sims = (docs :+ (5L, "")).toDF("doc_id", "text")
      .select($"doc_id", Dedup.simhashMd5(graft.text.TextOps.tokenizeBasic($"text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(2L)) < ham(sims(1L), sims(3L)))
    assert(sims(5L) == 0L)
    // 60-bit fingerprint: top 4 bits clear
    assert(sims.values.forall(v => (v >>> 60) == 0L))
  }

  test("ivfKnn: rank 1 is the query itself (queries are corpus members)") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val top = Similarity.ivfKnn(emb.filter($"vec_id" < 3), emb, k = 2)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(top.nonEmpty && top.forall { case (q, n) => q == n })
  }

  test("annKnn: each query's bucket collisions include itself at rank 1") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // a query vector always collides with itself in every table, so rank 1
    // must be the query at cos 1 — exercises the bucketing + rank plumbing
    val top = Similarity.annKnn(emb.filter($"vec_id" < 3), emb, k = 2)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(top.length == 3 && top.forall { case (q, n) => q == n })
  }

  test("annCandidatePairs: salting is a no-op under the cap, bounded over it") {
    val vecs = Seq.tabulate(40)(i => (i.toLong, Array.fill(8)(1.0f))) // all identical
      .toDF("vec_id", "embedding")
    val base = Similarity.annCandidatePairs(vecs, numPlanes = 2, tables = 2, dim = 8)
      .as[(Long, Long)].collect().toSet
    assert(base.size == 40 * 39 / 2) // identical vectors collide everywhere
    val salted = Similarity.annCandidatePairs(vecs, numPlanes = 2, tables = 2, dim = 8,
      maxBucketWidth = 10).as[(Long, Long)].collect().toSet
    // 4 hash-salt groups of ≈10 (ragged) + 3 head links, with headroom;
    // must still sit well under the unguarded C(40,2) = 780
    val bound = 3 * (4 * (10L * 9 / 2) + 3)
    assert(salted.size <= bound, s"${salted.size} > $bound")
    assert(salted.size < 40 * 39 / 2, s"guard did not bite: ${salted.size}")
    assert(salted.subsetOf(base))
    // connectivity: every id reachable from the bucket head
    val comp = Dedup.connectedComponents(
      salted.toSeq.toDF("vec_a", "vec_b"), "vec_a", "vec_b")
    assert(comp.select("component").distinct().count() == 1)
  }

  test("chunkText: boundary semantics (exact multiple, trailing overlap, empty)") {
    def chunks(nWords: Int, size: Int, stride: Int): Seq[String] = {
      val text = (1 to nWords).map(i => s"w$i").mkString(" ")
      Seq(text).toDF("t")
        .select(TextAnalysis.chunkText($"t", size, stride))
        .as[Seq[String]].head()
    }
    // n == stride: one chunk, no empty trailing chunk
    assert(chunks(40, 50, 40).length == 1)
    // n = 45: second chunk starts at 41 even though chunk 1 covered it
    // (trailing-overlap rule, shared with the DuckDB oracle)
    val c45 = chunks(45, 50, 40)
    assert(c45.length == 2 && c45(1) == (41 to 45).map("w" + _).mkString(" "))
    // full window + remainder
    val c90 = chunks(90, 50, 40)
    assert(c90.length == 3 && c90.head.split(" ").length == 50 &&
      c90(2).split(" ").length == 10)
    assert(chunks(0, 50, 40).isEmpty)
  }

  test("packChunks: budget compliance, oversized chunk alone, no chunk loss") {
    def plan(nWords: Int, size: Int, stride: Int, budget: Int): Seq[(Long, Long, Long)] = {
      val text = (1 to nWords).map(i => s"w$i").mkString(" ")
      Seq(text).toDF("t")
        .select(TextAnalysis.packChunks($"t", size, stride, budget))
        .as[Seq[(Long, Long, Long)]].head()
    }
    // 90 words -> chunks (50, 50, 10) with the trailing-overlap rule;
    // 110 total fits the 120 budget in one pack
    assert(plan(90, 50, 40, 120).map(p => (p._2, p._3)) ==
      Seq((1L, 50L), (1L, 50L), (1L, 10L)))
    // 130 words -> chunks (50, 50, 50, 10): third overflows 120 -> pack 2
    assert(plan(130, 50, 40, 120).map(_._2) == Seq(1L, 1L, 2L, 2L))
    // budget smaller than one chunk: every chunk sits alone, none dropped
    val tight = plan(130, 50, 40, 10)
    assert(tight.map(_._2) == Seq(1L, 2L, 3L, 4L) &&
      tight.map(_._3) == Seq(50L, 50L, 50L, 10L))
    // no chunk loss: pack plan covers exactly the chunkText output
    val nChunks = Seq((1 to 130).map(i => s"w$i").mkString(" ")).toDF("t")
      .select(TextAnalysis.chunkText($"t", 50, 40)).as[Seq[String]].head().length
    assert(plan(130, 50, 40, 120).length == nChunks)
    // per-pack totals respect the budget unless the pack is a lone chunk
    val packs = plan(450, 50, 40, 120).groupBy(_._2).view.mapValues(_.map(_._3).sum)
    assert(packs.values.forall(_ <= 120), s"over budget: $packs")
    assert(plan(0, 50, 40, 120).isEmpty)
  }

  test("cosineNearDupPairs: planted duplicate vector found at cos≈1") {
    val base = Seq.tabulate(4)(i => (i.toLong, Array.tabulate(8)(j => (i * 8 + j + 1).toFloat)))
    val withDup = base :+ (99L, base(1)._2.map(_ * 2.0f)) // scaled copy of vec 1 -> cos 1
    val pairs = Similarity.cosineNearDupPairs(withDup.toDF("vec_id", "embedding"), 0.999)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 99L)))
  }

  test("ivfNearDupPairs: scaled copy lands in its original's cell and pairs up") {
    val base = Seq.tabulate(4)(i => (i.toLong, Array.tabulate(8)(j => (i * 8 + j + 1).toFloat)))
    val withDup = base :+ (99L, base(1)._2.map(_ * 2.0f)) // same direction as vec 1
    val pairs = Similarity.ivfNearDupPairs(withDup.toDF("vec_id", "embedding"),
        threshold = 0.999, numCentroids = 3)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    // identical direction -> identical argmax cell -> within-cell pair at cos 1
    assert(pairs.contains((1L, 99L)))
  }

  test("semDedup: min-id keeper, partition property, no surviving within-cell pair") {
    // one-hot basis: pairwise-orthogonal originals (the integer-ramp fixture
    // of the neighboring tests is nearly parallel between consecutive ids —
    // every base doc would be someone's near-dup at tau=0.999)
    val base = Seq.tabulate(6)(i =>
      (i.toLong, Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)))
    // two scaled copies of vec 1 and one of vec 3: drops must be exactly the
    // HIGHER ids of each near-dup pair (min-id keeper) — 98/99 (dups of 1,
    // also of each other) and 97 (dup of 3); originals 1 and 3 survive
    val corpus = (base ++ Seq(
      (98L, base(1)._2.map(_ * 2.0f)), (99L, base(1)._2.map(_ * 3.0f)),
      (97L, base(3)._2.map(_ * 2.0f)))).toDF("vec_id", "embedding")
    val survivors = Similarity.semDedup(corpus, tau = 0.999, numCentroids = 3)
      .select($"vec_id").as[Long].collect().toSet
    assert(survivors.intersect(Set(97L, 98L, 99L)).isEmpty)
    assert(Set(1L, 3L).subsetOf(survivors))
    // partition: survivors ∪ dropped = corpus, disjoint
    val all = corpus.select($"vec_id").as[Long].collect().toSet
    assert((all -- survivors) === Set(97L, 98L, 99L))
    // fixed point: no within-cell pair above tau remains among survivors
    val residual = Similarity.ivfNearDupPairs(
      corpus.join(survivors.toSeq.toDF("vec_id"), Seq("vec_id")),
      threshold = 0.999, numCentroids = 3).count()
    assert(residual === 0L)
  }

  test("ivfNearDupPairs cell salting: degenerate one-cell corpus stays bounded AND connected") {
    // 1000 identical vectors: every one lands in cell 0 (identical ccos,
    // tiebreak cid asc), so the unguarded within-cell join is C(1000,2) ≈
    // 500k pairs from ONE cell. With cap=50 the cell hash-splits into 20
    // salt groups of ≈50 (ragged — hash salt), all pairs at cos 1, so the
    // count is bounded by the balanced 20·C(50,2) + 19 with multinomial
    // headroom — still ~8× under the unguarded 500k.
    val n = 1000
    val cap = 50
    val clones = spark.range(n).select($"id".as("vec_id"),
      array((1 to 8).map(j => lit(j.toFloat)): _*).as("embedding"))
    val pairs = Similarity.ivfNearDupPairs(clones, threshold = 0.999,
      numCentroids = 8, maxCellWidth = cap).cache()
    try {
      val groups = n / cap
      val balanced = groups.toLong * (cap.toLong * (cap - 1) / 2) + (groups - 1)
      val nPairs = pairs.count()
      assert(nPairs <= 3 * balanced, s"$nPairs > ${3 * balanced}")
      assert(nPairs < n.toLong * (n - 1) / 2 / 3, s"guard did not bite: $nPairs")
      // connectivity survives the salt split: head links keep the cell one
      // component with min-label 0 for downstream clustering
      val comp = Dedup.connectedComponents(pairs.select("vec_a", "vec_b"), "vec_a", "vec_b")
      assert(comp.select("component").distinct().count() == 1)
      assert(comp.agg(min("component")).head().getLong(0) == 0L)
    } finally { pairs.unpersist(); () }
  }

  test("topCells replicates the windowed argmax ordering, ties broken by cid asc") {
    // centroids engineered so some cosines tie exactly (scaled copies)
    val cents = Array(
      (0L, Array.tabulate(8)(j => (j + 1).toFloat)),
      (1L, Array.tabulate(8)(j => (8 - j).toFloat)),
      (2L, Array.tabulate(8)(j => 2f * (j + 1))), // scaled copy of cid 0 -> tie
      (3L, Array.fill(8)(1f)),
      (4L, Array.tabulate(8)(j => (j + 1).toFloat))) // exact copy of cid 0 -> tie
    val v = Array.tabulate(8)(j => (j + 1).toFloat)
    def cos(c: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 8) { val x = v(i).toDouble; val y = c(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // the windowed reference: ORDER BY ccos DESC, cid ASC
    val ref = cents.map { case (cid, c) => (cid, cos(c)) }
      .sortBy { case (cid, s) => (-s, cid) }.map(_._1)
    for (keep <- 1 to cents.length)
      assert(Similarity.topCells(cents, v, keep).toSeq == ref.take(keep).toSeq,
        s"keep=$keep")
    // null vector: all scores tie as null -> first `keep` cids (window parity)
    assert(Similarity.topCells(cents, null, 2).toSeq == Seq(0L, 1L))
  }

  test("ivfNearDupPairs cell salting: no-op below the cap (q98 output unchanged)") {
    val base = Seq.tabulate(4)(i => (i.toLong, Array.tabulate(8)(j => (i * 8 + j + 1).toFloat)))
    val withDup = (base :+ (99L, base(1)._2.map(_ * 2.0f))).toDF("vec_id", "embedding")
    def run(cap: Int) = Similarity.ivfNearDupPairs(withDup, threshold = 0.0,
        numCentroids = 3, maxCellWidth = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // cap larger than any cell → salt 0 everywhere, no head links: identical
    // output (threshold 0 keeps every within-cell pair, the widest surface)
    assert(run(10000) == run(100))
  }

  test("connectedComponents: chains merge, disjoint clusters stay apart") {
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; singleton pairs none
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
  }

  test("connectedComponents: a 300-deep path converges in O(log diameter) rounds (pointer jumping)") {
    // a single path 0-1-2-…-300 — diameter 300. One-hop propagation needs
    // ~300 rounds (the pre-round-14 implementation threw at maxIter=20);
    // the pointer-jumping step must converge well under the default cap,
    // labeling every node 0. Worst-case orientation: min id at one END.
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 301 && got.forall(_._2 == 0L),
      s"all 301 path nodes must label 0, got ${got.filter(_._2 != 0L).take(5).toSeq}")
    assert(Dedup.lastCcRounds <= 12,
      s"300-diameter path must converge logarithmically, took ${Dedup.lastCcRounds} rounds")
  }

  test("dedupByContent keeps smallest id per duplicate text") {
    val dup = Seq((5L, "same"), (2L, "same"), (9L, "other")).toDF("doc_id", "text")
    val kept = Dedup.dedupByContent(dup, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 9L))
  }

  test("cosine: self=1, orthogonal=0") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 2.0f))).toDF("a", "b")
    val (self, orth) = df.select(
      Similarity.cosine(Similarity.asDouble($"a"), Similarity.asDouble($"a")),
      Similarity.cosine(Similarity.asDouble($"a"), Similarity.asDouble($"b")))
      .as[(Double, Double)].head()
    assert(math.abs(self - 1.0) < 1e-12)
    assert(orth == 0.0)
  }

  test("bruteForceKnn: rank 1 is the query itself") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val top = Similarity.bruteForceKnn(emb.filter($"vec_id" < 3), emb, k = 2)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(top.forall { case (q, n) => q == n })
  }

  test("languageId: obvious english vs german") {
    val preds = Seq(("the quick brown fox and the lazy dog are in a house"),
                    ("der hund und die katze sind nicht im haus aber das ist gut"))
      .toDF("text").select(TextAnalysis.languageId($"text")).as[String].collect()
    assert(preds(0) == "en")
    assert(preds(1) == "de")
  }

  test("winnowing: density bound, guarantee property, short-text windows") {
    // 40 distinct words -> 38 grams, windows of 4
    val words = (0 until 40).map(i => s"w$i").mkString(" ")
    def fps(t: String): Seq[(Int, Long)] =
      Seq(t).toDF("text")
        .select(TextAnalysis.winnowFingerprints($"text", 3, 4).as("f"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getInt(0), r.getLong(1)))
    val sel = fps(words)
    // selection is sorted-by-window hence non-decreasing in pos, distinct
    assert(sel.map(_._1) === sel.map(_._1).sorted)
    assert(sel.distinct === sel)
    // winnowing guarantee: consecutive selected positions gap <= w (a
    // window with no selection would violate the algorithm)
    sel.map(_._1).sliding(2).foreach { case Seq(a, b) => assert(b - a <= 4); case _ => }
    // density: at most one selection per window, far fewer than gram count
    assert(sel.length <= 38 - 4 + 1 && sel.length < 38)
    // guarantee property: a 10-word shared run (>= w+k-1 = 6) between two
    // docs must share at least one fingerprint hash
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val a = fps(s"aaa bbb ccc $shared ddd eee")
    val b = fps(s"xxx yyy $shared zzz")
    assert(a.map(_._2).toSet.intersect(b.map(_._2).toSet).nonEmpty)
    // fewer grams than the window -> exactly one (min) fingerprint
    assert(fps("alpha beta gamma delta").length === 1) // 2 grams, one window
    assert(fps("alpha beta").isEmpty)                  // < k words
  }

  test("fingerprint: deterministic, discriminating, empty-safe") {
    val fps = Seq("hello world", "hello world", "hello worle", "")
      .toDF("text").select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    assert(fps(3) == 0L)
  }

  test("multimodal resize + frame sampling: deterministic plumbing") {
    val docs01 = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs01)
    val resized = Multimodal.resizeStub(media, stride = 4).collect()
    val orig = media.collect().map(r => r.media_id -> r.payload.length).toMap
    resized.foreach { r =>
      assert(r.payload.length == (orig(r.media_id) + 3) / 4)
    }
    val frames = Multimodal.sampleFrames(media, everyN = 5).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 5 == 0))
    assert(frames.forall(_.n_bytes > 0))
    // deterministic across runs
    val again = Multimodal.sampleFrames(media, everyN = 5).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx, f.md5_hex)).toSet ==
      again.map(f => (f.media_id, f.frame_idx, f.md5_hex)).toSet)
  }

  test("ImageIO codec: synthetic PNG roundtrips dims and pixel sum exactly") {
    import spark.implicits._
    val seeds = Seq(0L, 3L, 96L, 255L, 1000001L)
    val media = seeds.toDS().map(id =>
      Multimodal.MediaRow(id, "image", Multimodal.syntheticPng(id)))
    // ImageIoDecoder: real container parse, not the stub's byte arithmetic
    val dims = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .collect().map(f => f.media_id -> ((f.width, f.height, f.n_frames))).toMap
    for (id <- seeds)
      assert(dims(id) == (((id % 64 + 16).toInt, (id * 7 % 48 + 16).toInt, 1)))
    // pixel-level: sum of (x+y+id)%256 over the grid, computed independently
    val stats = Multimodal.decodeImageStats(media)
      .collect().map(s => s.media_id -> s.gray_sum).toMap
    for (id <- seeds) {
      val (w, h) = ((id % 64 + 16).toInt, (id * 7 % 48 + 16).toInt)
      val expect = (for (x <- 0 until w; y <- 0 until h) yield (x + y + id) % 256).sum
      assert(stats(id) == expect, s"pixel sum mismatch for seed $id")
    }
    // non-PNG bytes and non-image kinds fall back to the stub, never crash
    val junk = Seq(Multimodal.MediaRow(7L, "image", Array[Byte](1, 2, 3)),
                   Multimodal.MediaRow(8L, "audio", Array[Byte](1, 2, 3, 4))).toDS()
    val jf = Multimodal.extractFeatures(junk, Multimodal.ImageIoDecoder)
      .collect().map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(jf(7L) == ((3 % 640 + 1, 3 * 7 % 480 + 1)))
    assert(jf(8L) == ((4 % 640 + 1, 4 * 7 % 480 + 1)))
  }

  test("CountMin: never undercounts, merge == single-pass, bound holds on skew") {
    val agg = new CountMin.SketchAgg()
    // zipfy stream: token i appears 1000/i times
    val stream = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"tok$i"))
    val whole = stream.foldLeft(agg.zero)(agg.reduce)
    // split + merge must equal the single-pass grid (mergeability)
    val (a, b) = stream.splitAt(stream.length / 3)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(java.util.Arrays.equals(whole, merged))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    for ((tok, c) <- exact) {
      val e = CountMin.estimate(whole, tok)
      assert(e >= c, s"undercount for $tok")
      assert(e <= c + (CountMin.Eps * n).ceil.toLong, s"bound blown for $tok")
    }
    // absent token estimates stay within the additive error of zero
    assert(CountMin.estimate(whole, "never-seen") <= (CountMin.Eps * n).ceil.toLong)
  }

  test("q150 prefix filter is lossless on seeded random corpora (vs brute force)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    // vocabulary small enough that docs share many shingles — the regime
    // where a buggy prefix bound would actually drop qualifying pairs
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel")
    for (trial <- 1 to 3) {
      val docs = (0 until 14).map { i =>
        val words = (0 until (8 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size)))
        (i.toLong, words.mkString(" "), "en", "src0", 0L)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"ap$trial").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = graft.SparkEntry.queries("q150_allpairs_sim")(spark, dir)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force over the same distinct-5-shingle sets
      val sets = docs.map { case (id, text, _, _, _) =>
        id -> Dedup.shingleSetImpl(text, 5).toSet
      }.filter(_._2.nonEmpty)
      val expect = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        o = (sa & sb).size if 25L * o * o >= 16L * sa.size * sb.size
      } yield (a, b)).toSet
      assert(got == expect, s"trial $trial: got=$got expect=$expect")
    }
  }

  test("q150 prefix-filtered all-pairs: finds planted near-dup, rejects mid-sim pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("allpairs").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")          // 36 5-shingles
    val nearDup = (1 to 40).map(i => if (i == 40) "zz" else s"w$i").mkString(" ")
    val halfSame = ((1 to 20).map(i => s"w$i") ++ (1 to 20).map(i => s"v$i")).mkString(" ")
    Seq(
      (1L, base, "en", "src0", 0L),
      (2L, nearDup, "en", "src0", 0L),   // cos ≈ 31/36 > 0.8 vs doc 1
      (3L, halfSame, "en", "src0", 0L),  // shares a block with doc 1, cos < 0.8
      (4L, "completely different words here altogether now okay", "en", "src0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val pairs = graft.SparkEntry.queries("q150_allpairs_sim")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup pair must be found")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), "mid-similarity pair must be rejected")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("DSIR weights: target-vocabulary docs outscore off-target docs") {
    import spark.implicits._
    // planted signal: en docs speak vocabulary A, others vocabulary B;
    // a raw doc written in A must be selected, one in B must not
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "omega psi chi phi upsilon tau"
    Seq(
      (1L, (a + " ") * 20, "en", "src0", 0L),
      (2L, (a + " ") * 20, "en", "src1", 0L),
      (3L, (b + " ") * 20, "de", "src0", 0L),
      (4L, (b + " ") * 20, "fr", "src1", 0L),
      (5L, (a + " ") * 20, "zh", "src2", 0L),  // target-like raw doc
      (6L, (b + " ") * 20, "zh", "src3", 0L)   // off-target raw doc
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("q149_dsir_weights")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(5L)._1 > out(6L)._1, "target-vocab doc must outscore off-target")
    assert(out(5L)._2 && !out(6L)._2)
    assert(out(1L)._2 && out(2L)._2 && !out(3L)._2 && !out(4L)._2)
  }

  test("gopherSignals: each rule flips on its designed violation; clean doc passes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val clean = (("the quick brown fox jumps over a lazy dog and " * 6) +
      "that would be plenty of words to have fun with today").trim // 64 words, all rules ok
    val docs = Seq(
      (1L, clean),
      (2L, "too short to have the size"),                          // rule 1 (n_words < 50)
      (3L, clean + " " + "a " * 200),                              // rule 2 (mean len < 3)
      (4L, clean.split(" ").map(w => s"#$w#").mkString(" ")),      // rule 3 (symbols)
      (5L, clean.split(" ").map(w => s"- $w").mkString("\n")),     // rule 4 (bullet lines)
      (6L, clean.split(" ").map(w => s"$w...").mkString("\n")),    // rule 5 (ellipsis lines)
      (7L, clean + " " + "12345 " * 60),                           // rule 6 (alpha frac)
      (8L, ("alpha bravo charlie delta echo " * 12).trim)          // rule 7 (no req stopwords)
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id") +: TextAnalysis.gopherSignals(col("text")): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), "clean doc must pass all rules")
    assert(out(1L).getAs[Long]("n_rules_passed") == 7L)
    for (id <- 2L to 8L) {
      assert(!out(id).getAs[Boolean]("keep"), s"doc $id must fail")
      assert(out(id).getAs[Long]("n_rules_passed") < 7L, s"doc $id must fail ≥1 rule")
    }
    assert(out(8L).getAs[Long]("n_req_stop") == 0L)
    assert(out(4L).getAs[Long]("n_symbols") >= out(4L).getAs[Long]("n_words"))
  }

  test("dHash production path: arbitrary image -> resize 9x8 -> stable fingerprint") {
    import spark.implicits._
    // two renders of the same scene at different sizes should fingerprint
    // closer to each other than to a different scene (the dHash property)
    def gradient(id: Long, scene: Double, w: Int, h: Int): Multimodal.MediaRow = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (255.0 * (math.sin(scene + 4.0 * x / w) + 1) / 2).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.MediaRow(id, "image", bos.toByteArray)
    }
    val media = Seq(gradient(1L, 1.0, 64, 48), gradient(2L, 1.0, 120, 90),
      gradient(3L, 9.0, 64, 48)).toDS()
    val hashes = Multimodal.dHash(Multimodal.resizeImages(media, 9, 8))
      .collect().map(r => r.media_id -> r.dhash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // same scene across sizes: near-identical; different scene: far
    val same = ham(hashes(1L), hashes(2L))
    val cross = ham(hashes(1L), hashes(3L))
    assert(same <= 8, s"same scene at two sizes must fingerprint close (hamming $same)")
    assert(cross > same, s"different scene must be farther (same=$same cross=$cross)")
  }

  test("resizeImages: real rescale to target dims, output still decodable PNG") {
    import spark.implicits._
    val media = Seq(5L, 42L).toDS().map(id =>
      Multimodal.MediaRow(id, "image", Multimodal.syntheticPng(id)))
    val out = Multimodal.resizeImages(media, targetW = 8, targetH = 6)
    val dims = Multimodal.decodeImageStats(out)
      .collect().map(s => s.media_id -> ((s.width, s.height))).toMap
    assert(dims == Map(5L -> ((8, 6)), 42L -> ((8, 6))))
  }

  test("multimodal stub decoder: features deterministic, one per row") {
    val docs01 = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, docs01))
    assert(feats.count() == docs01.count())
    val r = feats.filter($"media_id" === 0L).head()
    assert(r.n_bytes > 0 && r.width >= 1 && r.width <= 640 && r.n_frames == 1)
  }

  test("scrubPii: redacts every email/phone/IP occurrence, counts audit them") {
    val text = "mail a.b-c_1@ex-ample.co.uk or x@y.io, call 25-989-741-2988 " +
      "and 123-456-789-0123, from 10.0.255.7 and 192.168.1.1; keep 1234-5678 and v1.2"
    val row = Seq(text).toDF("t")
      .select(TextAnalysis.scrubPii($"t").as("s"),
        TextAnalysis.piiCount($"t", TextAnalysis.EmailRe).as("ne"),
        TextAnalysis.piiCount($"t", TextAnalysis.PhoneRe).as("np"),
        TextAnalysis.piiCount($"t", TextAnalysis.Ipv4Re).as("ni"))
      .head()
    val s = row.getString(0)
    assert(!s.contains("@") && !s.contains("2988") && !s.contains("255.7"), s)
    assert(s.contains("[EMAIL]") && s.contains("[PHONE]") && s.contains("[IP]"), s)
    // non-PII survivors: a version string and a short digit pair
    assert(s.contains("keep 1234-5678") && s.contains("v1.2"), s)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((2L, 2L, 2L)))
    // null-safe
    assert(Seq[String](null).toDF("t").select(TextAnalysis.scrubPii($"t"))
      .head().isNullAt(0))
  }

  test("dedupParagraphs: first corpus-wide occurrence wins, docs reassemble") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),           // paras: "a b c d e" / "f g h i j"
      (2L, "a b c d e x y z w v"),           // first para duplicates doc 1's
      (3L, "p q r s t p q r s t"))           // within-doc duplicate paragraph
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(df, "doc_id", "text", 5)
      .orderBy($"doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq == Seq(
      (1L, 2L, 2L, "a b c d e f g h i j"),
      (2L, 2L, 1L, "x y z w v"),
      (3L, 2L, 1L, "p q r s t")))
  }

  test("dedupSubstrings: unaligned spans cut everywhere but first, overlaps merge") {
    val df = Seq(
      // the shared 3-gram "c d e" sits at pos 3 in doc 1 and pos 1 in doc 2:
      // NOT paragraph-aligned — the case q103 cannot catch
      (1L, "a b c d e f g h"),
      (2L, "c d e x y z w v"),
      // within-doc repeat: "m n o" at pos 1 and pos 4 -> second cut; the
      // overlapping duplicated grams ("m n o" ×2 only — "n o m" etc. occur
      // once) leave a single maximal removed span
      (3L, "m n o m n o q r"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8"), // unique: untouched
      (5L, "t1 t2"))                   // shorter than k: passes whole
      .toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(df, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(out == Seq(
      (1L, 8L, 0L, "a b c d e f g h"),      // doc 1 holds the keeper occurrence
      (2L, 8L, 3L, "x y z w v"),            // its copy of "c d e" is cut
      (3L, 8L, 3L, "m n o q r"),            // positions 4-6 covered once
      (4L, 8L, 0L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (5L, 2L, 0L, "t1 t2")))
  }

  test("lmPerplexityFilter: hand-computed micro-nat NLL, smoothing, edge docs") {
    // corpus: "a b", "a b", "a c", "z" -> uni a:3 b:2 c:1 z:1, V=4
    // bigrams: "a b":2, "a c":1
    // doc1/doc2 term: lnq(3+4) - lnq(2+1) = 1945910 - 1098612 = 847298
    // doc3 term:      lnq(3+4) - lnq(1+1) = 1945910 -  693147 = 1252763
    // doc4: no bigram -> 0 terms, passes
    def lnq(n: Int) = math.round(math.log(n) * 1e6)
    assert(lnq(7) == 1945910L && lnq(3) == 1098612L && lnq(2) == 693147L)
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmPerplexityFilter(df, "doc_id", "text", 1000000L)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(out == Seq(
      (1L, 1L, 847298L, true),
      (2L, 1L, 847298L, true),
      (3L, 1L, 1252763L, false),
      (4L, 0L, 0L, true)))
  }

  test("bpeMergeStep: best pair by (cnt, pair), greedy merge, post recount") {
    // corpus: "abab" x3, "ab" x2  ->  freqs {abab:3, ab:2}
    // pre pairs: (a,b) 3*2+2*1 = 8, (b,a) 3*1 = 3 -> best = (a,b)
    // merge "a b"->"ab": abab -> [ab, ab], ab -> [ab]
    // post pairs: (ab,ab) x3
    val df = Seq("abab abab abab ab ab").toDF("text")
    val out = TextAnalysis.bpeMergeStep(df, "text", topK = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("post", 1L, "ab", "ab", 3L),
      ("pre", 1L, "a", "b", 8L),
      ("pre", 2L, "b", "a", 3L)))
    // greedy-leftmost on odd runs: "aaa" with best (a,a) -> [aa, a], post pair (aa, a)
    val odd = TextAnalysis.bpeMergeStep(Seq("aaa aaa").toDF("text"), "text", 5).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3), r.getLong(4)))
    assert(odd.toSeq == Seq(("post", "aa", "a", 2L), ("pre", "a", "a", 4L)))
    // empty corpus -> empty frame, not a crash
    assert(TextAnalysis.bpeMergeStep(Seq.empty[String].toDF("text"), "text", 5).count() == 0L)
  }

  test("repetitionFast: hand-computed metrics and gate") {
    val r = Seq("a a a a b").toDF("t")
      .select(TextAnalysis.repetitionFast($"t").as("r")).select($"r.*").head()
    // 5 words, 2 unique -> dup 0.6; bigrams: "a a"x3 + "a b" -> top 3/4
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.75 && r.getDouble(4) == 0.6)
    // 4 bigrams < MinBigramsForGate: the bigram leg is vacuous, dup 0.6 passes
    assert(r.getBoolean(5))
    val clean = Seq("one two three four five six").toDF("t")
      .select(TextAnalysis.repetitionFast($"t").as("r")).select($"r.*").head()
    assert(clean.getBoolean(5) && clean.getDouble(4) == 0.0)
    // long doc with a hot bigram but mostly-unique words: ONLY the bigram
    // leg can fail it — locks the gate's leg separation
    val spam = Seq("x y a x y b x y c d e f g h i j k l m n o p q r s t").toDF("t")
      .select(TextAnalysis.repetitionFast($"t").as("r")).select($"r.*").head()
    assert(spam.getLong(1) >= TextAnalysis.MinBigramsForGate && spam.getLong(2) == 3L)
    assert(spam.getDouble(4) <= TextAnalysis.DupWordFracMax)
    assert(!spam.getBoolean(5))
    val empty = Seq("").toDF("t")
      .select(TextAnalysis.repetitionFast($"t").as("r")).select($"r.*").head()
    assert(empty.getLong(0) == 0L && empty.getDouble(3) == 0.0 && empty.getBoolean(5))
  }

  test("kmeansStep: both variants agree, hand-computed means on integer vectors") {
    // centroids = vec 0 ([1,0]) and vec 1 ([0,1]); the rest split by axis.
    // Integer components make float sums exact under ANY summation order,
    // so the scalable avg-based variant must equal the deterministic fold.
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(2f, 0f)), (3L, Seq(4f, 0f)),
      (4L, Seq(0f, 2f)), (5L, Seq(0f, 6f)))
      .toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"cid")
        .select($"cid", $"n_assigned", $"centroid")
        .as[(Long, Long, Seq[Double])].collect().toSeq
    val det = rows(Similarity.kmeansStepDeterministic(emb, numCentroids = 2))
    val fast = rows(Similarity.kmeansStep(emb, numCentroids = 2)
      .select($"cid", $"n_assigned", transform($"centroid", x => round(x, 6)).as("centroid")))
    assert(det == fast)
    assert(det == Seq(
      (0L, 3L, Seq(7.0 / 3, 0.0).map(x => math.rint(x * 1e6) / 1e6)),
      (1L, 3L, Seq(0.0, 3.0))))
  }

  test("kmeansTrain: recovers separated clusters, keeps empty cells, converges") {
    // Two tight clusters on orthogonal axes; seeds (vecs 0, 1) start inside
    // them, so one Lloyd round lands the axis means and round two moves < tol
    // — the loop must stop early (integer components ⇒ exact arithmetic).
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(2f, 0f)), (3L, Seq(4f, 0f)),
      (4L, Seq(0f, 2f)), (5L, Seq(0f, 6f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrain(emb, numCentroids = 2, maxIters = 10)
    assert(cents.map(_._1).toSeq == Seq(0L, 1L))
    // converged centroids are the cluster means (cosine-collinear is enough,
    // but integer input makes them exact)
    assert(cents(0)._2.toSeq == Seq(7f / 3, 0f))
    assert(cents(1)._2.toSeq == Seq(0f, 3f))
    // trained quantizer serves ivfKnnWith: each vector's neighbors stay on
    // its own axis (nprobe=1 ⇒ pure within-cluster search)
    val knn = Similarity.ivfKnnWith(emb.filter($"vec_id" === 0L), emb, k = 3,
      cents, nprobe = 1)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(knn == Set(0L, 2L, 3L))
    // empty-cell rule: identical seed centroids make every vector tie on
    // cosine, and the cid-ASC tiebreak routes them ALL to cell 0 — cell 1
    // is empty from round one. The drained centroid must survive with its
    // seed value, never vanish (downstream cell ids would dangle).
    val tied = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)),
      (2L, Seq(2f, 0f)), (3L, Seq(3f, 0f)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.kmeansTrain(tied, numCentroids = 2, maxIters = 3)
    assert(kept.length == 2 && kept.map(_._1).toSeq == Seq(0L, 1L))
    assert(kept(1)._2.toSeq == Seq(1f, 0f))
  }

  test("pq: exact codebooks on cluster-structured subvectors, ADC+re-rank = exact knn") {
    // dim 4, m=2: each subspace holds exactly 2 distinct subvectors, so the
    // ksub=2 codebooks converge to those points (mean of identical points),
    // encoding is LOSSLESS, and PQ search must reproduce the exact ranking.
    val vs = Seq(
      (0L, Seq(1f, 0f, 0f, 1f)),
      (1L, Seq(0f, 1f, 1f, 0f)),
      (2L, Seq(1f, 0f, 1f, 0f)),
      (3L, Seq(0f, 1f, 0f, 1f)),
      (4L, Seq(1f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(vs, m = 2, ksub = 2)
    assert(cb.length == 2 && cb.forall(_.length == 2))
    // lossless reconstruction: decode(encode(v)) == v for every vector
    val codes = Similarity.pqEncode(vs, cb)
      .as[(Long, Array[Byte])].collect().toMap
    val orig = vs.as[(Long, Seq[Float])].collect().toMap
    orig.foreach { case (id, v) =>
      val rec = codes(id).zipWithIndex.flatMap { case (c, j) => cb(j)(c & 0xFF) }
      assert(rec.toSeq == v, s"vec $id not reconstructed exactly")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    val pq = rows(Similarity.pqKnn(vs.filter($"vec_id" < 2), vs, k = 3, cb, shortlist = 3))
    val exact = rows(Similarity.bruteForceKnn(vs.filter($"vec_id" < 2), vs, k = 3))
    assert(pq == exact)
    // IVF-PQ composition: with every cell probed (nprobe = numCentroids)
    // and lossless codes, the composed path must ALSO equal exact search
    val cents = Similarity.kmeansTrain(vs, numCentroids = 2, maxIters = 5)
    val ivfpq = rows(Similarity.ivfPqKnn(vs.filter($"vec_id" < 2), vs, k = 3,
      cents, cb, nprobe = 2, shortlist = 3))
    assert(ivfpq == exact)
  }

  test("pq: a null embedding is unrankable — filtered, never a crash or a top hit") {
    val vs = Seq(
      (0L, Option(Seq(1f, 0f, 0f, 1f))),
      (1L, Option(Seq(0f, 1f, 1f, 0f))),
      (2L, Option.empty[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(vs.filter($"embedding".isNotNull), m = 2, ksub = 2)
    // flat ADC and the IVF-PQ composition must both survive the null row
    // (nulls-first ascending ADC sort would otherwise shortlist it — or NPE)
    val flat = Similarity.pqKnn(vs.filter($"vec_id" === 0L), vs, k = 2, cb, shortlist = 2)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(flat == Set(0L, 1L))
    val cents = Similarity.kmeansTrain(vs.filter($"embedding".isNotNull), 2, maxIters = 3)
    val composed = Similarity.ivfPqKnn(vs.filter($"vec_id" === 0L), vs, k = 2,
      cents, cb, nprobe = 2, shortlist = 2)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(!composed.contains(2L))
  }

  test("decontaminate: gram collisions flag docs, clean docs keep zero count") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx alpha beta gamma yy"),       // one shared 3-gram
      (2L, "totally different words here"), // clean — must still be emitted
      (3L, "alpha beta gamma delta plus"),  // two shared 3-grams
      (4L, "too short"))                    // < n words ⇒ no grams ⇒ clean
      .toDF("doc_id", "text")
    val r = Dedup.decontaminate(corpus, bench, n = 3).orderBy($"doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(r == Seq((1L, 1L, true), (2L, 0L, false), (3L, 2L, true), (4L, 0L, false)))
  }

  test("bloom membership: zero false negatives, FP rate near fpp") {
    val known = (0 until 2000).map(i => s"key_$i").toDF("k")
    // ONE broadcast serves every probe; the handle releases it at the end
    val bf = Dedup.bloomProbe(spark, Dedup.buildBloom(known, "k", expectedItems = 2000, fpp = 0.01))
    try {
      // no-FN is a hard Bloom guarantee — every known key must probe true
      val knownHits = known.filter(bf($"k")).count()
      assert(knownHits == 2000L)
      val fresh = (0 until 2000).map(i => s"other_$i").toDF("k")
      val fp = fresh.filter(bf($"k")).count()
      assert(fp <= 60L, s"FP count $fp far above fpp=0.01 on 2000 probes")
    } finally bf.unpersist()
  }

  test("decontaminate degrades to a shuffle join when hits exceed the broadcast cap") {
    val bench = Seq((10L, "alpha beta gamma")).toDF("doc_id", "text")
    // every corpus doc is contaminated — the anti-contract case the
    // broadcast cap exists for; results must be identical either way
    val corpus = (1L to 20L).map(i => (i, s"alpha beta gamma tail$i"))
      .toDF("doc_id", "text")
    val viaShuffle = Dedup.decontaminate(corpus, bench, n = 3, maxBroadcastHits = 1)
      .orderBy($"doc_id").as[(Long, Long, Boolean)].collect().toSeq
    val viaBroadcast = Dedup.decontaminate(corpus, bench, n = 3)
      .orderBy($"doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(viaShuffle == viaBroadcast)
    assert(viaShuffle.forall(_._3) && viaShuffle.length == 20)
  }

  test("Skyline.frontier2d: dominance on a hand-built set, ties kept, groups independent") {
    // group g: (1,5) frontier; (2,5) dominated (same y, higher x);
    // (2,7) frontier; (3,7) dominated; (3,9) frontier; (4,1) dominated.
    // group h: single point is always on its frontier.
    val pts = Seq(
      ("g", 1L, 5L), ("g", 2L, 5L), ("g", 2L, 7L),
      ("g", 3L, 7L), ("g", 3L, 9L), ("g", 4L, 1L),
      ("h", 9L, 0L)).toDF("grp", "x", "y")
    val got = graft.ops.Skyline.frontier2d(pts, "grp", "x", "y")
      .orderBy($"grp", $"x").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 1L, 5L), ("g", 2L, 7L), ("g", 3L, 9L), ("h", 9L, 0L)))
    // equal (x, y) ties: neither dominates — the coordinate survives once
    // here and the caller's join-back re-attaches every tied row
    val tied = Seq(("g", 1L, 5L), ("g", 1L, 5L)).toDF("grp", "x", "y")
    assert(graft.ops.Skyline.frontier2d(tied, "grp", "x", "y").count() == 1L)
    // brute-force cross-check on a pseudorandom cloud: frontier ==
    // { p | no q with q.x <= p.x, q.y >= p.y, one strict }
    val cloud = (1 to 60).map { i =>
      val h = s"sky$i".hashCode.toLong
      ("r", math.abs(h) % 17, math.abs(h / 17) % 13)
    }
    val cdf = cloud.toDF("grp", "x", "y")
    val want = cloud.map { case (_, x, y) => (x, y) }.distinct.filter { case (x, y) =>
      !cloud.exists { case (_, qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y) }
    }.sorted
    val gotR = graft.ops.Skyline.frontier2d(cdf, "grp", "x", "y")
      .select($"x", $"y").as[(Long, Long)].collect().toSeq.sorted
    assert(gotR == want)
  }

  test("Urls.canonicalize: each noise axis collapses, non-defaults survive") {
    val cases = Seq(
      // host case + fragment
      "HTTP://WWW.Example.COM/a#frag" -> "http://www.example.com/a",
      // default ports drop, per scheme
      "http://x.com:80/p" -> "http://x.com/p",
      "https://x.com:443/p" -> "https://x.com/p",
      // non-default port survives
      "http://x.com:8080/p" -> "http://x.com:8080/p",
      // https with http's default port is NOT default — survives
      "https://x.com:80/p" -> "https://x.com:80/p",
      // trailing slashes strip; bare host gains the root path
      "http://x.com/p///" -> "http://x.com/p",
      "http://x.com" -> "http://x.com/",
      "http://x.com/" -> "http://x.com/",
      // params sort, utm_* drop, emptied query loses its '?'
      "http://x.com/p?b=2&a=1" -> "http://x.com/p?a=1&b=2",
      "http://x.com/p?utm_source=f&a=1&utm_medium=m" -> "http://x.com/p?a=1",
      "http://x.com/p?utm_source=f" -> "http://x.com/p",
      "http://x.com/p?" -> "http://x.com/p",
      // empty-path + query
      "http://x.com?a=1" -> "http://x.com/?a=1",
      // malformed: no scheme -> lowercased passthrough
      "Not A URL" -> "not a url")
    val got = cases.map(_._1).toDF("u")
      .select(Urls.canonicalize($"u")).as[String].collect().toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalize($in)") }
  }

  test("backoffBigramScores: hand-computed micro-nats, seen vs backoff vs OOV") {
    // train "a b a b c": U = {a:2, b:2, c:1}, N=5, V=3;
    // bigrams C2 = {(a,b):2, (b,a):1, (b,c):1}
    val tok = Seq(
      (1L, Seq("a", "b", "a", "b", "c"), true),
      (2L, Seq("a", "b", "z"), false),   // (a,b) seen; (b,z) OOV backoff
      (3L, Seq("c", "a"), false),        // (c,a) unseen bigram, known words
      (4L, Seq("solo"), false))          // < 2 words -> absent from output
      .toDF("doc_id", "ws", "is_train")
    val got = TextAnalysis.backoffBigramScores(tok, "doc_id", "ws", "is_train")
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc 2: ln(2/2)=0 -> 0; ln(0.4*(0+1)/8) = ln(0.05) -> -2995733
    val oov = math.floor(math.log(0.4 * 1.0 / 8.0) * 1e6).toLong
    // doc 3: (c,a) unseen -> backoff on U(a)=2: ln(0.4*3/8)
    val backA = math.floor(math.log(0.4 * 3.0 / 8.0) * 1e6).toLong
    assert(got == Seq((2L, 2L, 0L + oov), (3L, 1L, backA)))
  }
}
