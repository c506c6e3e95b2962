package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY.md §2.9 E1/E2 + builder mandate).
  *
  * Scale design:
  *  - exact dedup = one hash-shuffle on the content hash (map-side partial
  *    distinct via groupBy), no full-text comparisons;
  *  - near-dup = MinHash+LSH: candidates come from equi-joins on band
  *    buckets (shuffle keyed by 8-byte band hash), never an O(n²) cross
  *    join; exact jaccard runs only on candidates. At 100 TB the band join
  *    is the only quadratic-risk stage, and buckets wider than
  *    `maxBucketWidth` are split into bounded salt groups with head links
  *    (see [[lshCandidatePairs]]) so one degenerate bucket can't go O(n²).
  *  - hot paths (shingling, minhash→band-keys) run as native codegen
  *    expressions or fused single-pass functions — the composable
  *    higher-order-expression forms are kept for reference but are
  *    interpreted (CodegenFallback) and ~1000× slower per row.
  */
object Dedup {

  /** Content fingerprint for exact dedup (sha256 hex, matches DuckDB's
    * `sha256(text)` for the oracle). */
  def contentHash(c: Column): Column = sha2(c.cast("binary"), 256)

  /** Exact dedup keeping the smallest id per duplicate group — deterministic,
    * unlike dropDuplicates' arbitrary-row choice. */
  def dedupByContent(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("hash")).orderBy(col(idCol))
    df.withColumn("hash", contentHash(col(textCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Lowercased words of a text column (shared with TextOps.words shape). */
  def words(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), w => length(w) > 0)

  /** Distinct word k-shingles — the unit set for n-gram jaccard / MinHash.
    * Texts with fewer than k words yield an empty set.
    *
    * Expression form kept for composability, but prefer [[shingleSet]] on a
    * hot path: higher-order array expressions (transform/slice/concat_ws)
    * are CodegenFallback — interpreted per row — and measured ~30 ms/doc on
    * 300-char docs, vs ~10 µs for the single-pass UDF. */
  def wordShingles(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      array_distinct(
        transform(sequence(lit(1), size(ws) - (k - 1)),
          i => concat_ws(" ", slice(ws, i, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Hot-path shingle extraction: raw text → distinct word k-shingles in one
    * JVM pass (lowercase, split on non-alphanumeric runs, sliding window,
    * insertion-ordered dedupe). Semantically identical to
    * `wordShingles(words(c), k)` — property-tested against it — but ~1000×
    * cheaper per row than the interpreted higher-order expression chain,
    * which dominates near-dup wall time at any scale. Backed by the native
    * codegen expression [[graft.functions.WordShinglesExpr]] (no UDF
    * boundary — the projection stays inside WholeStageCodegen). */
  def shingleSet(c: Column, k: Int): Column =
    graft.functions.WordShinglesExpr(c, k)

  private[graft] def shingleSetImpl(text: String, k: Int): Array[String] = {
    if (text == null) return Array.empty[String]
    val ws = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    if (ws.length < k) return Array.empty[String]
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= ws.length) {
      val sb = new java.lang.StringBuilder(ws(i))
      var j = 1
      while (j < k) { sb.append(' ').append(ws(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Exact Jaccard similarity of two DISTINCT-element arrays. Uses
    * |A∩B| / (|A| + |B| − |A∩B|) — one set operation instead of the
    * intersect+distinct(concat) pair, which halves the per-pair cost on the
    * all-candidates verification stage. Integer set sizes divided in double
    * — deterministic across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  private val MersenneP = 2147483647L // 2^31 - 1

  /** Base hash of each shingle in [0, 2^31) — computed ONCE per shingle;
    * the k MinHash functions are then cheap affine transforms. */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => pmod(xxhash64(s), lit(MersenneP)))

  /** REFERENCE-ONLY expression form (see bandKeysUdf for the operator hot
    * path — the two produce different buckets and must not be mixed).
    * MinHash signature over pre-hashed shingles: hash function i is
    * h → (a_i·h + b_i) mod P with a_i,b_i < 2^31 and P = 2^31-1 (classic
    * universal hashing; products stay < 2^62, so no ANSI-mode long
    * overflow). The final mod is essential — without it the map is
    * monotonic in h and every "hash function" would select the same
    * min-shingle. One string hash per shingle total, then pure long math —
    * ~100× cheaper than salting the string hash per function. */
  def minhashSignature(hashes: Column, numHashes: Int): Column = {
    val rnd = new scala.util.Random(0x5EED)
    array((0 until numHashes).map { _ =>
      val a = (rnd.nextLong() & 0x7FFFFFFEL) | 1L
      val b = rnd.nextLong() & 0x7FFFFFFFL
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(MersenneP))))
    }: _*)
  }

  /** LSH band keys: hash of each r-row slice of the signature. A pair
    * collides on some band iff their signatures agree on that whole slice. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      hash(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** Fused shingles → minhash signature → band keys in ONE JVM pass per
    * row. Same CONSTRUCTION as the expression chain above (xxhash64 via
    * Spark's XXH64, mod-P affine minhash) but NOT bucket-compatible with
    * it: coefficients are drawn in a different order from the seed and band
    * keys use a polynomial mix instead of Murmur3, so never mix the two
    * paths for one index. The chain's higher-order expressions are
    * CodegenFallback (interpreted) and dominated near-dup wall time; the
    * fused loop is ~100× cheaper and touches each shingle exactly once. */
  private def bandKeysUdf(numHashes: Int, bands: Int) = {
    val rowsPerBand = numHashes / bands
    val rnd = new scala.util.Random(0x5EED)
    val coefA = Array.fill(numHashes)((rnd.nextLong() & 0x7FFFFFFEL) | 1L)
    val coefB = Array.fill(numHashes)(rnd.nextLong() & 0x7FFFFFFFL)
    udf((sh: Seq[String]) => {
      val sig = Array.fill(numHashes)(Long.MaxValue)
      sh.foreach { s =>
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val x = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, 42L)
        val h = ((x % MersenneP) + MersenneP) % MersenneP
        var i = 0
        while (i < numHashes) {
          val v = (coefA(i) * h + coefB(i)) % MersenneP
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      val keys = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var k = 1125899906842597L
        var r = 0
        while (r < rowsPerBand) { k = k * 31 + sig(b * rowsPerBand + r); r += 1 }
        keys(b) = k
        b += 1
      }
      keys
    })
  }

  /** Candidate near-dup pairs via LSH: explode band keys, self-equi-join on
    * (band index, band key), dedupe pairs. Returns (idA, idB) with idA<idB.
    * The join shuffles on the band key — linear in corpus size times bands,
    * never all-pairs.
    *
    * Degenerate-bucket guard ([[SaltGuard]]): a band bucket wider than
    * `maxBucketWidth` (adversarial crawl data — thousands of identical docs
    * collide on every band) would make the self-join quadratic in that ONE
    * bucket's width. Oversized buckets are hash-split into ≈cap-sized salt
    * groups: all pairs are generated within each group, and each group's
    * head is additionally paired with the bucket's global head, so the
    * bucket stays connected for downstream clustering (guaranteed when the
    * head pairs clear the caller's score threshold — always true for the
    * identical-duplicate skew that creates such buckets). The trade,
    * documented: candidate pairs BETWEEN salt groups (beyond the head
    * links) are not emitted — acceptable because a bucket only reaches
    * such width when its members are near-identical, where connectivity
    * (not the full pair list) is what dedup consumes. Buckets at or under
    * the cap — every bucket on non-adversarial data — are emitted EXACTLY
    * as without the guard. */
  def lshCandidatePairs(df: DataFrame, idCol: String, shingleCol: String,
                        numHashes: Int = 128, bands: Int = 32,
                        maxBucketWidth: Int = 10000): DataFrame = {
    require(maxBucketWidth > 1, s"maxBucketWidth must be > 1: $maxBucketWidth")
    // shingle-less docs have no candidates BY DEFINITION — and without this
    // guard they would all share the degenerate [MaxValue×k] signature and
    // collapse into ONE bucket (an O(n²) blowup on crawl data full of short
    // docs); null arrays are excluded for the same reason
    val eligible = df.filter(col(shingleCol).isNotNull && size(col(shingleCol)) > 0)
    // localCheckpoint: the banded frame feeds the width aggregate plus the
    // salted self-join sides and head slices; without it each consumer
    // recomputes the minhash + band explode (the dominant cost), and the
    // self-join's broadcast boundary defeats exchange reuse. Materializing
    // once costs one pass over n×bands rows — the same data the join
    // shuffle moves anyway.
    val banded = eligible
      .select(col(idCol), posexplode(bandKeysUdf(numHashes, bands)(col(shingleCol)))
        .as(Seq("band", "bkey")))
      .localCheckpoint()
    val salted = SaltGuard.hashSalt(banded, Seq("band", "bkey"), idCol, maxBucketWidth)
    val a = salted.select(col(idCol).as(s"${idCol}_a"),
      col("band"), col("bkey"), col("salt"))
    val b = salted.select(col(idCol).as(s"${idCol}_b"),
      col("band"), col("bkey"), col("salt"))
    val withinGroup = a.join(b, Seq("band", "bkey", "salt"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(s"${idCol}_a", s"${idCol}_b")
    val headLinks = SaltGuard.headLinks(salted, Seq("band", "bkey"), idCol)
      .select(col("id_a").as(s"${idCol}_a"), col("id_b").as(s"${idCol}_b"))
    withinGroup.union(headLinks).distinct()
  }

  /** Coefficients for [[mdBandKeys]] — drawn once from a fixed seed and
    * ALSO embedded literally into q203's oracle SQL (a VALUES table), so
    * both engines evaluate the identical hash family. a is odd and < 2^31,
    * b < 2^31; with h < P = 2^31-1 the product a·h stays < 2^62 — no long
    * overflow on either engine. */
  private[graft] val MdCoefs: IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(0x203D5EED)
    IndexedSeq.fill(32)((
      (rnd.nextLong() & 0x7FFFFFFEL) | 1L,
      rnd.nextLong() & 0x7FFFFFFFL))
  }

  /** md5-based MinHash band keys, built for cross-engine replay: the base
    * shingle hash is the first 15 hex chars of md5 (60 bits — DuckDB:
    * `CAST('0x' || substring(md5(g),1,15) AS BIGINT)`) mod P, the k hash
    * functions are the [[MdCoefs]] affine transforms, and a band key is the
    * comma-joined DECIMAL STRING of its r signature values (DuckDB:
    * `string_agg(m, ',' ORDER BY i)`) — no second-level hash, so band
    * collisions happen exactly when signature slices agree, never by
    * accident. Slower per shingle than the xxhash64 operator path
    * ([[lshCandidatePairs]]) and kept separate from it (different hash
    * family ⇒ different buckets — never mix for one index); use THIS one
    * when a non-JVM system must reproduce the buckets bit-for-bit. */
  def mdBandKeys(numHashes: Int, bands: Int) = {
    require(numHashes == MdCoefs.length, s"need $numHashes coefficient pairs")
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val coefA = MdCoefs.map(_._1).toArray
    val coefB = MdCoefs.map(_._2).toArray
    udf((sh: Seq[String]) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      val sig = Array.fill(numHashes)(Long.MaxValue)
      sh.foreach { g =>
        md.reset()
        val dg = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars = bytes 0-6 plus the high nibble of byte 7
        var x = 0L
        var i = 0
        while (i < 7) { x = (x << 8) | (dg(i) & 0xFFL); i += 1 }
        x = (x << 4) | ((dg(7) >> 4) & 0xFL)
        val h = x % MersenneP
        var j = 0
        while (j < numHashes) {
          val v = (coefA(j) * h + coefB(j)) % MersenneP
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      Array.tabulate(bands) { b =>
        val sb = new java.lang.StringBuilder
        var r = 0
        while (r < rows) {
          if (r > 0) sb.append(',')
          sb.append(sig(b * rows + r))
          r += 1
        }
        sb.toString
      }
    })
  }

  /** SimHash-64 of a token array: per-token xxhash64; bit i of the result is
    * the sign of the sum over tokens of (bit i set ? +1 : -1). Near-dup docs
    * have small simhash Hamming distance. Pure built-ins (nested higher-order
    * aggregates); engine-only (DuckDB lacks xxhash64) — unit-tested. */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bitSums = transform(sequence(lit(0), lit(63)), i =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, i) => when(s > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two simhash values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Rounds the last [[connectedComponents]] call took to converge —
    * observability for the O(log diameter) claim (the diameter-scaling
    * stress reads it; same hook pattern as `Streams.lastWideDeltaWarning`). */
  @volatile var lastCcRounds: Int = 0

  /** Duplicate CLUSTERS from near-dup pairs: connected components — each
    * node converges to the smallest doc id reachable from it, which
    * becomes the canonical id of its duplicate group (the step after
    * q42/q43 in a real dedup pipeline: keep one doc per component).
    *
    * Each round fuses TWO label moves into one aggregate: (a) one-hop
    * propagation over the edges (a node adopts its neighbors' labels) and
    * (b) POINTER JUMPING — `label(label(node))` via a labels self-join.
    * The jump is what makes the round count O(log diameter) instead of
    * O(diameter): labels form a forest pointing at smaller ids, and
    * node→grandparent halves every chain per round (the classic
    * shortcutting step of the MapReduce CC literature — Kiveris et al.'s
    * large-star plays the same role), so distance-to-minimum doubles per
    * round where one-hop alone moves it by 1. Measured on the chained
    * ×100 stress graph (diameter ~100× the base): 9 rounds where one-hop
    * propagation needs ~Θ(diameter) — see STRESS.md's cc_chain row. The
    * jump join is total by invariant: every label value is a node id
    * present in `labels` (initially label = node; every later label is a
    * min over existing labels), so no row is lost.
    *
    * Change detection is FUSED into the aggregate: each node's previous
    * label rides along as min(label where is_old) — every node has exactly
    * one is_old row, so `old` is never null — and "changed" is a filter on
    * the checkpointed result instead of a second shuffle join. Works for
    * any orderable id type with no overflow, unlike a sum-of-labels
    * progress metric. `localCheckpoint` truncates lineage each round.
    * Only nodes that appear in some pair are returned (singletons are
    * their own canonical doc by definition). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("label"), lit(false).as("is_old"))
      val jump = labels.as("l1")
        .join(labels.as("l2"), col("l1.label") === col("l2.node"))
        .select(col("l1.node").as("node"), col("l2.label").as("label"),
          lit(false).as("is_old"))
      val next = labels.withColumn("is_old", lit(true)).union(prop).union(jump)
        .groupBy("node")
        .agg(min("label").as("label"),
          min(when(col("is_old"), col("label"))).as("old"))
        .localCheckpoint()
      changed = next.filter(col("label") < col("old")).count()
      labels = next.select("node", "label")
      i += 1
    }
    edges.unpersist()
    lastCcRounds = i
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — with " +
          "pointer jumping rounds grow ~log(diameter), so this is a " +
          s"~2^$maxIter-diameter component or a livelock; raise maxIter. " +
          "Returning partial labels would silently split groups.")
    labels.withColumnRenamed("label", "component")
  }

  /** Paragraph-level exact dedup (the CCNet shape): segment every document
    * into consecutive `paraWords`-word paragraphs, keep only the FIRST
    * occurrence of each paragraph corpus-wide (ordered by (id, position) —
    * deterministic), and reassemble each document from its surviving
    * paragraphs. Returns (id, n_paras, n_kept, text_dedup).
    *
    * 100 TB shape: two shuffles total — the keeper choice is a groupBy-min
    * keyed on `md5(paragraph)` rather than the raw words (same keeper
    * semantics — md5 is collision-free at corpus scale for this purpose —
    * but the keeper shuffle moves a fixed 32-char key instead of whole
    * paragraphs, several times narrower on realistic prose, and the join
    * compares fixed-width keys). Map-side partial agg means a boilerplate
    * paragraph repeated 10⁹ times still reduces locally before moving;
    * then the segments join the keeper set on the hash key (each segment
    * matches exactly one keeper row, so the join output is linear; a hot
    * paragraph is an AQE-skew-split case, not a blowup), and the
    * per-document reassembly rides the second shuffle. A `row_number()
    * OVER (PARTITION BY para)` window would put every copy of a hot
    * paragraph in ONE task — that is exactly the shape this operator
    * avoids. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      paraWords: Int): DataFrame = {
    val segs = df
      .select(col(idCol),
        posexplode(TextAnalysis.chunkText(col(textCol), paraWords, paraWords))
          .as(Seq("seg0", "para")))
      .select(col(idCol), (col("seg0") + 1).cast("long").as("seg"), col("para"),
        md5(col("para").cast("binary")).as("pkey"))
    val keeper = segs.groupBy(col("pkey"))
      .agg(min(struct(col(idCol), col("seg"))).as("k"))
    segs.join(keeper, Seq("pkey"))
      .withColumn("kept", col(s"k.$idCol") === col(idCol) && col("k.seg") === col("seg"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(col("kept"), lit(1))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"), struct(col("seg"), col("para"))))),
            x => x("para")),
          " ").as("text_dedup"))
  }

  /** Broadcastable Bloom filter over a column — the membership side of
    * incremental dedup ("is this crawl batch's document already in the
    * corpus?"). Built with Spark's own sketch aggregate (treeAggregate on
    * the executors; only the bit array comes back to the driver), fully
    * deterministic: fixed-seed Murmur3, and bit-OR construction makes the
    * result independent of row order and partitioning.
    *
    * Scale contract: the filter replaces a full shuffle anti-join against
    * the known corpus with a map-only probe — 10⁹ keys at 1% FPP is
    * ~1.2 GB of bits, broadcastable where the key set itself is not. No
    * false negatives ever (every known key probes true); false positives
    * at ≈fpp must be re-checked by an exact join over the (tiny) surviving
    * candidate set when exactness matters. */
  def buildBloom(df: DataFrame, colName: String,
                 expectedItems: Long, fpp: Double): org.apache.spark.util.sketch.BloomFilter =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  /** Probe handle over a [[buildBloom]] filter: owns the ONE broadcast of
    * the bits (shipped once per executor, not per task) and lets the caller
    * release it. An incremental-dedup loop probes many micro-batches with
    * the same filter — a fresh broadcast per probe would accumulate
    * driver/executor memory for the session's lifetime, so the broadcast
    * is scoped to this handle instead and freed by [[unpersist]]. */
  final class BloomProbe private[Dedup] (
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends Serializable {
    /** Membership column; null key ⇒ false (a null was never inserted),
      * not an executor NPE. */
    def apply(c: Column): Column =
      udf((s: String) => s != null && bc.value.mightContainString(s)).apply(c)
    /** Drop the cached bits from executors (and driver) once the probe
      * loop is done; a later probe re-ships them on demand. */
    def unpersist(): Unit = bc.unpersist()
  }

  /** Broadcast `bf` once and return the owning [[BloomProbe]]. */
  def bloomProbe(spark: org.apache.spark.sql.SparkSession,
                 bf: org.apache.spark.util.sketch.BloomFilter): BloomProbe =
    new BloomProbe(spark.sparkContext.broadcast(bf))

  /** Benchmark decontamination (the GPT-3/FineWeb training-prep step): flag
    * every training document sharing at least one word `n`-gram with an
    * eval/benchmark corpus, so contaminated documents can be dropped before
    * training and the eval stays honest. Grams come from [[shingleSet]]
    * (lowercase, non-alphanumeric split, distinct — the q42/q43 unit), so
    * one vocabulary serves dedup AND decontamination.
    *
    * Scale contract: the benchmark side is SMALL by construction (eval sets
    * are thousands of documents, not billions) — its distinct gram set is
    * built once and broadcast, making the corpus side a map-only probe:
    * explode grams, broadcast-semi-join, partial-agg count per doc. The
    * only shuffle is the per-doc count of the HITS (contaminated grams are
    * rare — the whole point), plus the fan-back left join to re-attach
    * clean documents; both are keyed by `idCol` so AQE coalesces them at
    * test scale. Never an all-pairs or corpus-gram shuffle.
    *
    * The "hits are rare" assumption is MEASURED, not trusted: the hit
    * frame is persisted, counted, and broadcast into the fan-back only
    * when at most `maxBroadcastHits` documents are contaminated — a
    * majority-contaminated corpus degrades to a plain shuffled left join
    * instead of collecting a corpus-sized frame onto the driver. (The
    * persist makes the count reuse the one probe pass; it stays cached
    * for the fan-back and is disk-backed, so the degenerate case spills
    * rather than OOMs.)
    *
    * Returns every corpus row's id with `n_contaminated_grams` (distinct
    * grams shared with the benchmark) and the `contaminated` flag. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, n: Int,
                    idCol: String = "doc_id", textCol: String = "text",
                    maxBroadcastHits: Long = 5L * 1000 * 1000): DataFrame = {
    val benchGrams = bench
      .select(explode(shingleSet(col(textCol), n)).as("gram"))
      .distinct()
    val hits = corpus
      .select(col(idCol), explode(shingleSet(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol))
      // plain count IS the distinct-gram count: shingleSet dedupes grams
      // within a doc and the bench side is distinct, so (id, gram) rows are
      // unique — countDistinct would add a second full shuffle for nothing
      .agg(count(lit(1)).as("n_contaminated_grams"))
    val persisted = hits.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fanBack =
      if (persisted.count() <= maxBroadcastHits) broadcast(persisted) else persisted
    corpus.select(col(idCol))
      .join(fanBack, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_contaminated_grams"), lit(0L)).as("n_contaminated_grams"),
        (coalesce(col("n_contaminated_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** SimHash-60 with an md5-derived token hash (value of the first 15 hex
    * chars of md5(token)) instead of xxhash64 — chosen because md5 is the
    * one hash both this engine and DuckDB compute identically, which makes
    * the fingerprint ORACLE-CHECKABLE end to end (xxhash64 variant above
    * stays engine-only). One JVM pass per row; empty token list → 0. */
  def simhashMd5(tokens: Column): Column = simhashMd5Udf(tokens)

  private val simhashMd5Udf = udf((toks: Seq[String]) => {
    if (toks == null) 0L
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bitSums = new Array[Int](60)
      toks.foreach { t =>
        md.reset()
        val digest = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // value of the first 15 hex chars: nibbles high-to-low per byte
        var h = 0L
        var i = 0
        while (i < 15) {
          val nib = if (i % 2 == 0) (digest(i / 2) >> 4) & 0xF else digest(i / 2) & 0xF
          h = (h << 4) | nib
          i += 1
        }
        var j = 0
        while (j < 60) {
          if (((h >> j) & 1L) == 1L) bitSums(j) += 1 else bitSums(j) -= 1
          j += 1
        }
      }
      var out = 0L
      var j = 0
      while (j < 60) { if (bitSums(j) > 0) out |= (1L << j); j += 1 }
      out
    }
  })

  /** Charikar's ORIGINAL weighted SimHash (STOC 2002): each distinct
    * token votes ±tf per bit instead of ±1 — a token repeated 40× should
    * dominate the fingerprint the way it dominates the document. Same
    * 60-bit md5 hash family as [[simhashMd5]] so the DuckDB oracle
    * replays it with one extra list_count factor. */
  def simhashWeightedMd5(words: Column): Column = simhashWeightedUdf(words)

  private val simhashWeightedUdf = udf((toks: Seq[String]) => {
    if (toks == null) 0L
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new java.util.HashMap[String, Long]()
      toks.foreach(t => counts.merge(t, 1L, _ + _))
      val bitSums = new Array[Long](60)
      counts.forEach { (t, w) =>
        md.reset()
        val digest = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var i = 0
        while (i < 15) {
          val nib = if (i % 2 == 0) (digest(i / 2) >> 4) & 0xF else digest(i / 2) & 0xF
          h = (h << 4) | nib
          i += 1
        }
        var j = 0
        while (j < 60) {
          if (((h >> j) & 1L) == 1L) bitSums(j) += w else bitSums(j) -= w
          j += 1
        }
      }
      var out = 0L
      var j = 0
      while (j < 60) { if (bitSums(j) > 0) out |= (1L << j); j += 1 }
      out
    }
  })

  /** One k-word-gram occurrence: 1-based word position + the gram's md5. */
  case class GramOcc(pos: Long, gkey: String)

  /** Every k-word gram of a text with its 1-based start position and full
    * md5 hex key, in one fused JVM pass (the [[shingleSet]] lesson: the
    * transform/slice/concat_ws expression form is CodegenFallback and
    * ~1000× slower per row). Same md5-of-space-joined-words key DuckDB's
    * `md5(array_to_string(ws[i:i+k-1], ' '))` computes, so the oracle can
    * rebuild the keys bit-for-bit. Texts shorter than k words yield none. */
  def gramOccurrences(text: Column, k: Int): Column = {
    require(k > 1, s"gram width must be > 1: $k")
    val f = udf { (t: String) =>
      if (t == null) Seq.empty[GramOcc]
      else {
        val ws = t.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        val n = ws.length - k + 1
        if (n <= 0) Seq.empty[GramOcc]
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val out = new Array[GramOcc](n)
          var i = 0
          while (i < n) {
            val dig = md.digest(ws.slice(i, i + k).mkString(" ")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val sb = new java.lang.StringBuilder(32)
            var b = 0
            while (b < 16) {
              sb.append(Character.forDigit((dig(b) >> 4) & 0xF, 16))
              sb.append(Character.forDigit(dig(b) & 0xF, 16))
              b += 1
            }
            out(i) = GramOcc(i + 1L, sb.toString)
            md.reset()
            i += 1
          }
          out.toSeq
        }
      }
    }
    f(text)
  }

  /** ExactSubstr cross-document dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499): any
    * k-word span whose exact text occurs MORE THAN ONCE corpus-wide
    * (across documents or repeated within one) is removed from every
    * occurrence except the first — ordered by (id, position), so the
    * keeper is deterministic — and each document is reassembled from its
    * surviving words. Returns (id, n_tokens, n_removed, text_dedup) for
    * every input row; documents shorter than k words pass through whole.
    * Overlapping duplicated k-grams merge back into maximal removed spans
    * at reassembly, matching the paper's remove-matches-of-length-≥-k
    * semantics; [[dedupParagraphs]] (q103) is the aligned-segment special
    * case, this is the unaligned sliding-window general form.
    *
    * The paper builds a corpus-wide suffix array — a single-machine
    * design. The distributed re-expression keys duplicated spans by their
    * fixed-width gram md5 instead:
    *  - ONE aggregation shuffle picks duplicates and keepers: groupBy on
    *    the 32-char key with map-side partial agg (a boilerplate gram
    *    repeated 10⁹× reduces locally before moving), keeper =
    *    min(packed (id, pos)) — an integer min, never a per-gram window,
    *    so a hot gram cannot land in one task;
    *  - occurrences re-join the duplicate set on the same fixed-width key
    *    (each occurrence matches ≤1 gram row → linear output; a hot key
    *    is AQE-skew-split territory, not a blowup);
    *  - covered positions explode ×k — bounded by the constant k — and
    *    reduce per document (collect_set bounded by document length).
    * No corpus suffix sort, no window over gram text, no driver state.
    * The (id, pos) packing assumes documents under 10⁶ words — guarded
    * cheaply on the exploded grams (a filter, no extra pass). */
  def dedupSubstrings(df: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    val grams = df
      .select(col(idCol), explode(gramOccurrences(col(textCol), k)).as("g"))
      .select(col(idCol), col("g.pos").as("pos"), col("g.gkey").as("gkey"))
      .withColumn("pos",
        when(col("pos") >= 1000000L,
          raise_error(lit("dedupSubstrings: document exceeds 10^6 words")))
        .otherwise(col("pos")))
    val packed = col(idCol).cast("long") * 1000000L + col("pos")
    val dup = grams
      .groupBy(col("gkey"))
      .agg(count(lit(1)).as("c"), min(packed).as("k0"))
      .filter(col("c") >= 2)
      .select(col("gkey"), col("k0"))
    val covered = grams.join(dup, Seq("gkey"))
      .filter(packed =!= col("k0"))
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (k - 1))).as("cpos"))
      .groupBy(col(idCol))
      .agg(collect_set(col("cpos")).as("cov"))
    df.select(col(idCol), words(col(textCol)).as("ws"))
      .join(covered, Seq(idCol), "left")
      .withColumn("cova", coalesce(col("cov"), array().cast("array<long>")))
      .select(col(idCol),
        size(col("ws")).cast("long").as("n_tokens"),
        size(col("cova")).cast("long").as("n_removed"),
        array_join(
          filter(col("ws"), (w, i) => !array_contains(col("cova"), i.cast("long") + 1L)),
          " ").as("text_dedup"))
  }
}
