package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Embedding similarity search (SURVEY.md §2.9 E3 + builder mandate).
  *
  * Two paths:
  *  - [[bruteForceKnn]]: exact top-k by cosine. The query side is broadcast,
  *    so the corpus is scanned once with no shuffle — the right baseline up
  *    to a few thousand queries at any corpus size.
  *  - [[annKnn]]: random-hyperplane LSH — bucket embeddings by the
  *    sign pattern of h fixed projections, search only within bucket
  *    collisions across t tables. Linear shuffle on bucket keys; the 100 TB
  *    path when the query side is also huge.
  *
  * Dot products: the `Column`-level forms (dot/cosine/hyperplaneBucket)
  * are composable but run interpreted (higher-order array expressions are
  * CodegenFallback); the operators therefore use fused single-pass UDFs
  * with the SAME deterministic left-to-right double summation, which keeps
  * results oracle-comparable while being ~100× cheaper per row.
  */
object Similarity {

  /** Element-wise double cast (testdata embeddings are float32). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Hot-path cosine over raw float32 embeddings: one JVM pass with double
    * accumulation in the same left-to-right order as the expression form
    * (and DuckDB's list_cosine_similarity), so results stay
    * oracle-comparable. The higher-order-function expression chain is
    * CodegenFallback — interpreted per row — which made it the dominant
    * cost of the kNN scan; the fused loop is ~100× cheaper. */
  // Array[Float] (not Seq[Float]) parameters: the generic Seq interface
  // boxes every element access (measured ~124 ns/element — the pair stage
  // of q98 spent 1.9 s on 250k 64-dim pairs); catalyst converts an
  // ArrayType(Float) argument to a primitive float[] with one arraycopy
  // and the loop then runs unboxed.
  private val cosineF = udf((a: Array[Float], b: Array[Float]) => {
    if (a == null || b == null) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  })

  /** Exact top-k neighbors for each query vector. Queries must be small
    * enough to broadcast; ranks are deterministic (cosine desc, id asc). */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", cosineF(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** The IVF quantizer sizing rule the STRESS.md run validates: centroids ∝
    * corpus so expected cell width stays ~`targetCellWidth` — within-cell
    * pair work is quadratic in cell width, so a CONSTANT centroid count goes
    * superlinear at scale (measured: 23× wall / 65 s max-task at ×10 data
    * with 8 centroids, vs 3.7× / 6.5 s with this rule). The catalog queries
    * pin 8 for oracle determinism at sf ≤ 0.1, where this rule returns the
    * same 8. */
  def autoCentroids(corpusSize: Long, targetCellWidth: Int = 250): Int =
    math.max(8L, corpusSize / targetCellWidth).toInt

  /** Hard-negative mining for contrastive training: per anchor, the top-k
    * most-similar corpus vectors with a DIFFERENT label (the negatives that
    * carry most of the metric-learning gradient). Identical movement to
    * [[bruteForceKnn]] — anchors broadcast, one corpus scan, per-anchor
    * window rank — plus the label-mismatch filter applied BEFORE ranking so
    * k true negatives always come back. At corpus scale, generate the
    * similar-side candidates with [[ivfKnn]]/[[annKnn]] first. */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val q = anchors.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("anchor_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("neighbor_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_label") =!= col("anchor_label"))
      .withColumn("cos", cosineF(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "anchor_label", "rank", "neighbor_id", "neighbor_label")
  }

  /** Deterministic random hyperplanes (fixed seed — reproducible plans). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern bucket of an embedding under the given hyperplanes:
    * bit j = (v · plane_j) >= 0. Returns a long bucket key. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val proj = aggregate(
        zip_with(v, lit(p.toArray), (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN candidate pairs/top-k: join query buckets to corpus buckets across
    * `tables` independent hyperplane sets, exact-rank within candidates.
    * Recall is tunable via (numPlanes, tables); never an all-pairs product. */
  /** Embedding-cosine near-dup pairs over a bounded slice: all pairs with
    * cosine above `threshold`, ids ordered a<b. Brute force is the right
    * algorithm for a bounded subset (the caller slices); at corpus scale
    * use [[annKnn]]/[[ivfKnn]] to generate candidates instead. The slice
    * feeds both sides, so callers should pass it cached. */
  def cosineNearDupPairs(slice: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = slice.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = slice.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.crossJoin(broadcast(b))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosineF(col("va"), col("vb")))
      .filter(col("cos") > threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the first
    * `numCentroids` corpus vectors) partitions the corpus into cells by
    * argmax-cosine; each query probes its `nprobe` closest cells and ranks
    * exactly within them. The 100 TB shape: cell assignment is one
    * broadcast-join scan, search shuffles only on cell id — no all-pairs
    * stage anywhere — and recall/cost trades off via (numCentroids, nprobe).
    * Fully deterministic (centroid choice, argmax tiebreak by centroid id),
    * hence oracle-checkable, unlike random-hyperplane LSH. */
  /** The deterministic centroid set — the first `numCentroids` corpus
    * vectors — collected driver-side: the quantizer is a driver-sized model
    * constant exactly like the hyperplane matrix (sizing: `numCentroids ∝
    * √n` keeps cells ≈√n wide AND the broadcast + per-vector argmax loop
    * bounded; 10⁹ vectors → ~3·10⁴ centroids ≈ 8 MB at dim 64). The filter
    * pushes to the scan (parquet min/max prunes to the head rows). */
  private def collectCentroids(corpus: DataFrame, numCentroids: Int,
                               idCol: String, vecCol: String): Array[(Long, Array[Float])] =
    corpus.filter(col(idCol) < numCentroids)
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Top-`keep` argmax-cosine cells of one vector over the broadcast
    * centroid array — one fused JVM pass, the map-side replacement for the
    * previous crossJoin + row_number window (which shuffled the whole
    * corpus once per assignment). Semantics are the windowed version's,
    * bit for bit: per-centroid cosine uses [[cosineF]]'s exact double
    * summation order, and ranking replicates Spark's `ccos DESC, cid ASC`
    * ordering via `java.lang.Double.compare` (NaN ranks above every
    * number, as Spark sorts it; a null vector scores null against every
    * centroid, which ranked all-ties-by-cid — the first `keep` cids). */
  private[ext] def topCells(cs: Array[(Long, Array[Float])], v: Array[Float],
                            keep: Int): Array[Long] = {
    val k = math.min(keep, cs.length)
    if (v == null) return cs.take(k).map(_._1)
    val topId = new Array[Long](k)
    val topCos = new Array[Double](k)
    var filled = 0
    var ci = 0
    while (ci < cs.length) {
      val c = cs(ci)._2
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) {
        val x = v(i).toDouble; val y = c(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      // insertion rank: strictly-better cosines move up; equal cosines keep
      // ascending-cid order because centroids are visited cid-ascending
      var j = filled
      while (j > 0 && java.lang.Double.compare(cos, topCos(j - 1)) > 0) j -= 1
      if (j < k) {
        var m = math.min(filled, k - 1)
        while (m > j) { topId(m) = topId(m - 1); topCos(m) = topCos(m - 1); m -= 1 }
        topId(j) = cs(ci)._1; topCos(j) = cos
        if (filled < k) filled += 1
      }
      ci += 1
    }
    topId.take(filled)
  }

  /** Argmax-cosine cell assignment shared by [[ivfKnn]] and
    * [[ivfNearDupPairs]] — the tiebreak (ccos desc, cid asc) and the
    * centroid rule are part of BOTH operators' oracle contracts (q49, q98):
    * change them together or not at all. `keep` = cells per vector (1 for
    * corpus placement, nprobe for query probing). Map-only: the centroids
    * ride a broadcast variable and [[topCells]] fuses the argmax, so the
    * assignment adds ZERO exchanges — the first shuffle an IVF operator
    * ever does is its cell-id join (PlanSpec locks this). */
  private def assignCells(df: DataFrame, cents: Array[(Long, Array[Float])],
                          id: String, vec: String, keep: Int,
                          idCol: String, vecCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(cents)
    val f = udf((v: Array[Float]) => topCells(bc.value, v, keep))
    df.select(col(idCol).as(id), col(vecCol).as(vec))
      .withColumn("cid", explode(f(col(vec))))
  }

  /** Single-cell (keep=1) assignment of every vector to its argmax-cosine
    * quantizer cell, public for audits that treat the quantizer AS a
    * clustering (q201's agreement metrics). Same centroid rule, tiebreak,
    * and zero-exchange map-only shape as [[ivfKnn]]'s placement — and the
    * same q49/q98 oracle contract applies. Output: (idCol, cid). */
  def cellAssignments(corpus: DataFrame, numCentroids: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignCells(corpus, collectCentroids(corpus, numCentroids, idCol, vecCol),
        idCol, vecCol, keep = 1, idCol, vecCol)
      .select(col(idCol), col("cid"))

  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             numCentroids: Int = 8, nprobe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfKnnWith(queries, corpus, k,
      collectCentroids(corpus, numCentroids, idCol, vecCol), nprobe, idCol, vecCol)

  /** [[ivfKnn]] against an EXPLICIT centroid set — the serving half of the
    * train-then-search loop: feed it [[kmeansTrain]]'s output (or any
    * pre-trained quantizer) instead of the deterministic first-N seed.
    * Identical plan shape: broadcast centroids, map-side argmax, one
    * cell-id shuffle. */
  def ivfKnnWith(queries: DataFrame, corpus: DataFrame, k: Int,
                 cent: Array[(Long, Array[Float])], nprobe: Int = 2,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = assignCells(corpus, cent, "neighbor_id", "cvec", keep = 1, idCol, vecCol)
    val probes = assignCells(queries, cent, "query_id", "qv", keep = nprobe, idCol, vecCol)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(cells, Seq("cid"))
      .withColumn("cos", cosineF(col("qv"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** DISK-BACKED IVF index (the vector-database layout, F2's treatment
    * applied to embeddings): the corpus is written partitioned by cell id,
    * so a probe touches only its nprobe cells' files — on a cluster that
    * is the difference between reading nprobe/numCentroids of the corpus
    * and reading all of it. Returns the quantizer for [[searchIvfIndex]].
    * Cell assignment is the shared deterministic rule (q49/q98's oracle
    * contract). */
  def writeIvfIndex(corpus: DataFrame, dir: String, numCentroids: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding")
      : Array[(Long, Array[Float])] = {
    val cent = collectCentroids(corpus, numCentroids, idCol, vecCol)
    assignCells(corpus, cent, "neighbor_id", "cvec", keep = 1, idCol, vecCol)
      // cluster by cell before the partitioned write: map-side assignment
      // leaves every scan task holding rows of ~all cells, so an
      // unclustered write creates tasks × numCentroids files; one shuffle
      // makes each cell dir ≈ one parquet file (splittable on read)
      .repartition(col("cid"))
      .write.partitionBy("cid").mode("overwrite").parquet(dir)
    cent
  }

  /** Probe the written index: queries assign to their nprobe cells
    * map-side (broadcast centroids), and the cell-id equi-join against
    * the partitioned scan triggers DYNAMIC PARTITION PRUNING — Spark
    * plans a broadcast join whose build side prunes the scan to exactly
    * the probed cid partitions at runtime (PlanSpec asserts the
    * dynamicpruning filter). Result is DEFINED identical to [[ivfKnn]]
    * over the same corpus/quantizer — the disk roundtrip must not change
    * a single rank. */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                     queries: DataFrame,
                     cent: Array[(Long, Array[Float])], k: Int, nprobe: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val cells = spark.read.parquet(dir)
    val probes = assignCells(queries, cent, "query_id", "qv", nprobe, idCol, vecCol)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(cells, Seq("cid"))
      .withColumn("cos", cosineF(col("qv"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** One spherical-k-means Lloyd round at the 100 TB shape — the path from
    * the test-sized deterministic quantizer to a TRAINED one (the VERDICT
    * r4 "quantizer quality" thread): map-side argmax assignment (broadcast
    * centroids, zero exchanges — [[topCells]]) followed by per-(cell,
    * component) means via posexplode + partial-aggregated `avg`, one
    * shuffle keyed by (cid, component). Iterate until assignments
    * stabilize, then hand the centroids to [[ivfKnn]]. Returns
    * `(cid, n_assigned, centroid: array<double>)`.
    *
    * Cross-partition float-sum order is unordered here — statistically fine
    * for TRAINING (and exact on integer-valued vectors, which is how the
    * spec pins it); the catalog query q108 instead uses
    * [[kmeansStepDeterministic]], whose vec_id-ordered fold is
    * bit-reproducible cross-engine. */
  def kmeansStep(corpus: DataFrame, numCentroids: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    kmeansStepFrom(corpus, collectCentroids(corpus, numCentroids, idCol, vecCol),
      idCol, vecCol)

  /** [[kmeansStep]] from an arbitrary centroid set — the loop body of
    * [[kmeansTrain]]. */
  def kmeansStepFrom(corpus: DataFrame, cents: Array[(Long, Array[Float])],
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    cellMeans(assignCells(corpus, cents, "vid", "v", keep = 1, idCol, vecCol))

  /** Per-cell means of an assignment `(cid, v)` — the reduce half of one
    * Lloyd round, shared by the cosine ([[kmeansStepFrom]]) and L2
    * ([[kmeansStepFromL2]]) paths: posexplode to (cid, component), one
    * partial-aggregated shuffle. n_assigned rides the SAME aggregation as
    * the means (the per-(cid, component) count equals the cell size —
    * every member contributes all components) — a separate counts groupBy
    * would re-run the broadcast argmax scan over the whole corpus. */
  private def cellMeans(assign: DataFrame): DataFrame =
    assign
      .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i"))
      .agg(avg(col("x").cast("double")).as("m"), count(lit(1)).as("n"))
      .groupBy(col("cid"))
      .agg(max(col("n")).as("n_assigned"),
        transform(array_sort(collect_list(struct(col("i"), col("m")))),
          e => e("m")).as("centroid"))
      .select(col("cid"), col("n_assigned"), col("centroid"))

  /** Full Lloyd training loop: iterate [[kmeansStepFrom]] from the
    * deterministic first-N seed until the largest per-centroid cosine
    * movement drops below `tol` (or `maxIters`). The centroid set is a
    * driver-sized model constant throughout (numCentroids ∝ √n — see
    * [[collectCentroids]]), so each round is ONE distributed pass: map-side
    * broadcast argmax + one (cid, component) shuffle, and only the
    * numCentroids-row result is collected. Empty cells keep their previous
    * centroid (the standard Lloyd empty-cell rule — a quantizer must never
    * lose a cell, or downstream cell ids dangle). Assignment is argmax-
    * COSINE, so the unnormalized mean is equivalent to the spherical-k-means
    * normalized mean (scale-invariant) and the movement metric is cosine
    * distance, also scale-invariant. Returns centroids in [[ivfKnnWith]] /
    * [[ivfNearDupPairs]] quantizer form, float32 like the embeddings.
    *
    * Cross-partition summation order inside a round is unordered (training
    * is statistical — the q112 contract gates the OUTCOME, measured recall,
    * not the bits; bit-reproducible single rounds are
    * [[kmeansStepDeterministic]]'s job). */
  def kmeansTrain(corpus: DataFrame, numCentroids: Int, maxIters: Int = 10,
                  tol: Double = 1e-4,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Array[(Long, Array[Float])] =
    lloydLoop(collectCentroids(corpus, numCentroids, idCol, vecCol), maxIters, tol,
      cents => kmeansStepFrom(corpus, cents, idCol, vecCol),
      (a, b) => {
        // cosine distance — scale-invariant, matching the argmax-cosine
        // assignment (the unnormalized mean is spherical-equivalent)
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) 0.0 else 1.0 - dot / denom
      })

  /** The driver-side Lloyd iteration shared by the cosine and L2 trainers:
    * run `step`, collect the numCentroids-row result, keep empty cells'
    * previous centroids, stop when the largest per-centroid `movement`
    * drops below `tol` or after `maxIters` rounds. */
  private def lloydLoop(seed: Array[(Long, Array[Float])], maxIters: Int, tol: Double,
                        step: Array[(Long, Array[Float])] => DataFrame,
                        movement: (Array[Float], Array[Float]) => Double): Array[(Long, Array[Float])] = {
    require(maxIters >= 1, s"maxIters must be >= 1: $maxIters")
    var cents = seed
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIters && moved > tol) {
      val stepped = step(cents)
        .select(col("cid"), col("centroid"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).map(_.toFloat).toArray))
        .toMap
      val next = cents.map { case (cid, old) => (cid, stepped.getOrElse(cid, old)) }
      moved = cents.iterator.zip(next.iterator)
        .map { case ((_, a), (_, b)) => movement(a, b) }
        .foldLeft(0.0)(math.max)
      cents = next
      iter += 1
    }
    cents
  }

  /** [[kmeansStep]] with a DETERMINISTIC mean: each cell's members are
    * collected sorted by vec_id and folded sequentially in that order, so
    * the double summation is bit-identical on any engine that folds the
    * same ordered list (the q108 DuckDB oracle uses `list_reduce` over
    * `list(... ORDER BY vec_id)`). Components are rounded to 6dp on output
    * (q48's float-publishing contract). The per-cell collect is the
    * determinism trade — cells are ≈n/numCentroids wide, so this is for
    * oracle-gated validation at test scale; production training uses the
    * partial-aggregated [[kmeansStep]]. Both variants are spec-asserted
    * identical on integer-valued vectors. */
  def kmeansStepDeterministic(corpus: DataFrame, numCentroids: Int,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(corpus, numCentroids, idCol, vecCol)
    val assign = assignCells(corpus, cents, "vid", "v", keep = 1, idCol, vecCol)
    val meanUdf = udf((vs: Seq[Array[Float]]) => {
      val dim = vs.head.length
      val sums = new Array[Double](dim)
      vs.foreach { v =>
        var i = 0
        while (i < dim) { sums(i) += v(i).toDouble; i += 1 }
      }
      sums.map(_ / vs.length).toSeq
    })
    assign.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_assigned"),
        transform(array_sort(collect_list(struct(col("vid"), col("v")))),
          e => e("v")).as("vs"))
      .select(col("cid"), col("n_assigned"),
        transform(meanUdf(col("vs")), x => round(x, 6)).as("centroid"))
  }

  // ---------------------------------------------------------- L2 k-means + PQ

  /** Nearest centroid by SQUARED L2 (tiebreak cid asc — strict `<` keeps
    * the lowest cid because centroids are visited cid-ascending) — the
    * Euclidean twin of [[topCells]]'s cosine argmax, for PQ subspace
    * training where reconstruction error, not angle, is the objective. */
  private[ext] def nearestL2(cs: Array[(Long, Array[Float])], v: Array[Float]): Long = {
    if (v == null) return cs(0)._1
    var best = 0L; var bestD = Double.MaxValue; var ci = 0
    while (ci < cs.length) {
      val c = cs(ci)._2
      var d = 0.0; var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { val t = v(i).toDouble - c(i).toDouble; d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = cs(ci)._1 }
      ci += 1
    }
    best
  }

  /** One Euclidean Lloyd round from an explicit centroid set — map-side
    * broadcast argmin-L2 assignment + the shared [[cellMeans]] reduce
    * (means minimize squared L2, so the same aggregation serves both
    * metrics). */
  def kmeansStepFromL2(corpus: DataFrame, cents: Array[(Long, Array[Float])],
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    val f = udf((v: Array[Float]) => nearestL2(bc.value, v))
    cellMeans(corpus.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("cid", f(col("v"))))
  }

  /** Euclidean [[kmeansTrain]]: same driver-side loop ([[lloydLoop]] —
    * empty-cell keep rule, movement stop), argmin-L2 assignment, movement
    * measured as squared L2 (the metric being optimized). */
  def kmeansTrainL2(corpus: DataFrame, numCentroids: Int, maxIters: Int = 10,
                    tol: Double = 1e-6,
                    idCol: String = "vec_id", vecCol: String = "embedding"): Array[(Long, Array[Float])] =
    lloydLoop(collectCentroids(corpus, numCentroids, idCol, vecCol), maxIters, tol,
      cents => kmeansStepFromL2(corpus, cents, idCol, vecCol),
      (a, b) => {
        var d = 0.0; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
        d
      })

  /** Product-quantization codebooks (Jégou/Douze/Schmid 2011, the FAISS
    * `PQm×log2(ksub)` shape): the embedding splits into `m` contiguous
    * subspaces and each trains an independent L2 codebook of `ksub`
    * centroids via [[kmeansTrainL2]]; a vector is then `m` codes (one byte
    * each for ksub ≤ 256) instead of `dim` floats — 32× smaller at dim 64 /
    * m 8, which is what lets a 100 TB corpus's ANN working set live in
    * executor memory. All m subspaces train together: one distributed job
    * per Lloyd round over the (subspace, subvector)-exploded corpus with
    * composite (j, code) keys — NOT m sequential trainings — so rounds,
    * not subspaces, bound the job count. At corpus scale train on a SAMPLE
    * (the FAISS norm — codebooks are statistics, a deterministic
    * `filter(id < n)` or q96's stable-hash sample both work). Returns
    * codebooks(j)(code) = subspace-j centroid, codes 0..ksub-1 (centroid
    * seeds are the first `ksub` corpus rows' subvectors). */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int, maxIters: Int = 10,
              tol: Double = 1e-6,
              idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Array[Float]]] = {
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1, 256]: $ksub")
    require(maxIters >= 1, s"maxIters must be >= 1: $maxIters")
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val spark = corpus.sparkSession
    // All m subspaces train TOGETHER: the corpus explodes once per round
    // into (j, subv) rows (same total bytes — m× rows of dim/m floats) and
    // every Lloyd round is ONE distributed job with composite (j, cid)
    // keys, not m driver-looped jobs per round. The per-subspace math is
    // identical to m independent kmeansTrainL2 runs (per-subspace seeds,
    // argmin-L2 assignment, mean update, empty-cell keep, max-movement
    // stop over ALL subspaces).
    val splitUdf = udf((v: Array[Float]) => {
      if (v == null) null
      else (0 until m).map(j => v.slice(j * sub, (j + 1) * sub))
    })
    val exploded = corpus
      .select(posexplode(splitUdf(col(vecCol))).as(Seq("j", "subv")))
    // seeds: the first ksub rows' subvectors, per subspace (the
    // collectCentroids rule applied subspace-wise)
    var books: Array[Array[Array[Float]]] =
      corpus.filter(col(idCol) < ksub)
        .select(col(idCol).cast("long"), col(vecCol))
        .collect()
        .sortBy(_.getLong(0))
        .map(r => r.getSeq[Float](1).toArray)
        .toArray match {
          case seeds => (0 until m).toArray.map(j =>
            seeds.map(v => v.slice(j * sub, (j + 1) * sub)))
        }
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIters && moved > tol) {
      val bc = spark.sparkContext.broadcast(books)
      val nearestUdf = udf((j: Int, subv: Array[Float]) => {
        val cb = bc.value(j)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cb.length) {
          var d = 0.0; var i = 0
          val n = math.min(subv.length, cb(c).length)
          while (i < n) { val t = subv(i).toDouble - cb(c)(i).toDouble; d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      })
      val stepped = exploded
        .withColumn("cid", nearestUdf(col("j"), col("subv")))
        .select(col("j"), col("cid"), posexplode(col("subv")).as(Seq("i", "x")))
        .groupBy(col("j"), col("cid"), col("i"))
        .agg(avg(col("x").cast("double")).as("mv"))
        .groupBy(col("j"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("mv")))),
          e => e("mv")).as("centroid"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).map(_.toFloat).toArray))
        .toMap
      var worst = 0.0
      val next = books.zipWithIndex.map { case (cb, j) =>
        cb.zipWithIndex.map { case (old, c) =>
          val nw = stepped.getOrElse((j, c), old)
          var d = 0.0; var i = 0
          val n = math.min(old.length, nw.length)
          while (i < n) { val t = old(i).toDouble - nw(i).toDouble; d += t * t; i += 1 }
          if (d > worst) worst = d
          nw
        }
      }
      books = next
      moved = worst
      iter += 1
    }
    books
  }

  /** PQ-encode the corpus: map-only, one fused pass per vector (argmin-L2
    * per subspace against the broadcast codebooks), emitting `m` bytes as a
    * BinaryType `codes` column — the compressed representation [[pqKnn]]
    * scans. Codes are unsigned bytes (`& 0xFF` on read) so ksub up to 256
    * fits. */
  def pqEncode(corpus: DataFrame, codebooks: Array[Array[Array[Float]]],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol), pqEncodeUdf(corpus, codebooks)(col(vecCol)).as("codes"))

  /** The fused per-vector PQ encoder (argmin-L2 per subspace against the
    * broadcast codebooks) as a reusable UDF — shared by [[pqEncode]] and
    * [[ivfPqKnn]] so the code assignment rule exists once. */
  private def pqEncodeUdf(df: DataFrame, codebooks: Array[Array[Array[Float]]]) = {
    val bc = df.sparkSession.sparkContext.broadcast(codebooks)
    udf((v: Array[Float]) => {
      if (v == null) null
      else {
        val cbs = bc.value
        val m = cbs.length
        val sub = v.length / m
        val out = new Array[Byte](m)
        var j = 0
        while (j < m) {
          val cb = cbs(j); var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < cb.length) {
            var d = 0.0; var i = 0
            while (i < sub) {
              val t = v(j * sub + i).toDouble - cb(c)(i).toDouble; d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          out(j) = best.toByte
          j += 1
        }
        out
      }
    })
  }

  /** Per-query ADC lookup table: luts(j)(code) = squared L2 from the
    * query's subspace-j subvector to that code's centroid. Null query
    * vector → null LUT (the caller filters — a null can't rank anything). */
  private def pqLutUdf(df: DataFrame, codebooks: Array[Array[Array[Float]]]) = {
    val bc = df.sparkSession.sparkContext.broadcast(codebooks)
    udf((qv: Array[Float]) => {
      if (qv == null) null
      else {
        val cbs = bc.value
        val m = cbs.length
        val sub = qv.length / m
        cbs.zipWithIndex.map { case (cb, j) =>
          cb.map { cent =>
            var d = 0.0; var i = 0
            while (i < sub) {
              val t = qv(j * sub + i).toDouble - cent(i).toDouble; d += t * t; i += 1
            }
            d
          }.toSeq
        }.toSeq
      }
    })
  }

  /** ADC distance: m byte-indexed lookups, no float math on the corpus
    * vector at all. Null codes (a null embedding, which [[pqEncodeUdf]]
    * passes through as null) → null distance; the scan filters such rows
    * out rather than letting SQL's nulls-first ascending sort rank an
    * unencodable vector into every shortlist. */
  private val pqAdcUdf = udf((lut: Seq[Seq[Double]], codes: Array[Byte]) => {
    if (lut == null || codes == null) null
    else {
      var s = 0.0; var j = 0
      while (j < codes.length) { s += lut(j)(codes(j) & 0xFF); j += 1 }
      java.lang.Double.valueOf(s)
    }
  })

  /** Exact-cosine re-rank of an ADC shortlist: originals are fetched for
    * shortlist ids only (broadcast semi-join — the corpus scan stays
    * map-side), then ranked per query. Shared tail of [[pqKnn]] and
    * [[ivfPqKnn]]. */
  private def rerankShortlist(corpus: DataFrame, q: DataFrame, short: DataFrame,
                              k: Int, idCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))), Seq("query_id"))
      .withColumn("cos", cosineF(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** PQ ANN search — asymmetric distance (ADC) shortlist + exact re-rank,
    * the IVF-PQ serving pattern: each query precomputes an (m × ksub) LUT
    * of squared L2 to every codebook centroid, the ENCODED corpus is
    * scanned once summing m byte-indexed lookups per vector (32× less
    * memory traffic than raw floats, zero shuffle — queries and LUTs ride
    * a broadcast), the per-query `shortlist` best ADC candidates fetch
    * their original embeddings (broadcast semi-join — the corpus scan stays
    * map-side) and exact cosine ranks the final top-k. On unit-norm
    * embeddings L2² = 2 − 2·cos, so the ADC ordering approximates the
    * cosine ordering and re-rank recovers the exact metric; q115 gates the
    * measured recall. Composes with IVF cell routing ([[ivfKnnWith]]) for
    * the full FAISS IVF-PQ shape — cells bound the scan, PQ bounds the
    * bytes. */
  def pqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
            codebooks: Array[Array[Array[Float]]], shortlist: Int = 50,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("lut", pqLutUdf(queries, codebooks)(col("qv")))
    val wAdc = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
    val short = pqEncode(corpus, codebooks, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(q.select(col("query_id"), col("lut"))))
      .withColumn("adc", pqAdcUdf(col("lut"), col("codes")))
      .filter(col("adc").isNotNull) // null embedding / null query: unrankable
      .withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= shortlist)
      .select("query_id", "neighbor_id")
    rerankShortlist(corpus, q, short, k, idCol, vecCol)
  }

  /** The full FAISS IVF-PQ serving shape, composed from the two halves:
    * IVF cells bound WHICH vectors each query scans (its `nprobe` argmax
    * cells — [[ivfKnnWith]]'s routing), PQ codes bound the BYTES per
    * scanned vector (ADC lookups — [[pqKnn]]'s scan), and the exact
    * re-rank recovers the true metric on the shortlist. Cell assignment
    * and encoding are both map-only over broadcast model constants; the
    * only shuffle is the cell-id equi-join — flat-ADC's corpus×queries
    * product never appears. Recall compounds the two approximations
    * (missed cells × ADC ordering error), so gate it measured, per
    * corpus, exactly like q100/q115. */
  def ivfPqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
               cent: Array[(Long, Array[Float])],
               codebooks: Array[Array[Array[Float]]],
               nprobe: Int = 2, shortlist: Int = 50,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val cells = assignCells(corpus, cent, "neighbor_id", "cv", keep = 1, idCol, vecCol)
      .withColumn("codes", pqEncodeUdf(corpus, codebooks)(col("cv")))
      .select(col("cid"), col("neighbor_id"), col("codes"))
    val probes = assignCells(queries, cent, "query_id", "qv", keep = nprobe, idCol, vecCol)
      .withColumn("lut", pqLutUdf(queries, codebooks)(col("qv")))
    val wAdc = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
    val short = probes.select(col("cid"), col("query_id"), col("lut"))
      .join(cells, Seq("cid"))
      .withColumn("adc", pqAdcUdf(col("lut"), col("codes")))
      .filter(col("adc").isNotNull) // null embedding / null query: unrankable
      .withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= shortlist)
      .select("query_id", "neighbor_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    rerankShortlist(corpus, q, short, k, idCol, vecCol)
  }

  /** ANN near-dup CANDIDATE PAIRS corpus-wide: random-hyperplane bucketing
    * (same construction as [[annKnn]]) followed by a self-equi-join on
    * (table, bucket) — the embedding twin of `Dedup.lshCandidatePairs`, and
    * the 100 TB path for cosine near-dup detection: candidates from bucket
    * collisions, exact cosine only on candidates, never all-pairs. Returns
    * (vec_a, vec_b) with a<b. Recall for pairs at angle θ is
    * 1-(1-(1-θ/π)^planes)^tables — tune (numPlanes, tables) to the cosine
    * band you must not miss; [[graft.ops.ExtQueries]] q47 gates a measured
    * recall contract against the exact ground truth.
    *
    * Degenerate-bucket guard ([[SaltGuard]], same design as
    * `Dedup.lshCandidatePairs`): a bucket wider than `maxBucketWidth`
    * (identical/zero embeddings colliding on every table) is hash-split
    * into ≈cap-sized salt groups — all pairs within each group plus a head
    * link from the bucket head to each other group head, keeping the
    * bucket connected for downstream clustering (guaranteed when head
    * pairs clear the caller's threshold — always true for identical-
    * duplicate skew). Buckets at or under the cap are emitted exactly as
    * without the guard. */
  def annCandidatePairs(corpus: DataFrame, numPlanes: Int, tables: Int,
                        dim: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        maxBucketWidth: Int = 10000): DataFrame = {
    require(maxBucketWidth > 1, s"maxBucketWidth must be > 1: $maxBucketWidth")
    val planeSets = (0 until tables).map(t => hyperplanes(numPlanes, dim, seed = 42L + t))
    val planeArr: Array[Array[Array[Double]]] =
      planeSets.map(_.map(_.toArray).toArray).toArray
    val bucketsF = bucketsUdf(planeArr)
    // localCheckpoint: the width aggregate, both join sides and the head
    // slices all consume the bucketing scan; the broadcast boundary
    // defeats exchange reuse — same reasoning as the Dedup twin
    val banded = corpus.select(col(idCol),
      posexplode(bucketsF(col(vecCol))).as(Seq("tbl", "bkt")))
      .localCheckpoint()
    val salted = SaltGuard.hashSalt(banded, Seq("tbl", "bkt"), idCol, maxBucketWidth)
    val a = salted.select(col(idCol).as("vec_a"), col("tbl"), col("bkt"), col("salt"))
    val b = salted.select(col(idCol).as("vec_b"), col("tbl"), col("bkt"), col("salt"))
    val withinGroup = a.join(b, Seq("tbl", "bkt", "salt"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
    val headLinks = SaltGuard.headLinks(salted, Seq("tbl", "bkt"), idCol)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))
    withinGroup.union(headLinks).distinct()
  }

  /** All t·h hyperplane projections fused into one JVM pass per row (the
    * per-plane higher-order expressions are interpreted and were the
    * dominant cost of the bucketing scan). */
  private def bucketsUdf(planeArr: Array[Array[Array[Double]]]) =
    udf((v: Array[Float]) => {
      if (v == null) null
      else {
        val out = new Array[Long](planeArr.length)
        var t = 0
        while (t < planeArr.length) {
          val ps = planeArr(t); var key = 0L; var j = 0
          while (j < ps.length) {
            val p = ps(j); var proj = 0.0; var i = 0
            val n = math.min(v.length, p.length)
            while (i < n) { proj += v(i).toDouble * p(i); i += 1 }
            if (proj >= 0) key |= (1L << j)
            j += 1
          }
          out(t) = key; t += 1
        }
        out
      }
    })

  /** Embedding near-dup pairs at corpus scale via IVF cells: the same
    * deterministic coarse quantizer as [[ivfKnn]] assigns every vector to
    * its argmax-cosine cell (tiebreak by centroid id), near-dup candidates
    * are pairs WITHIN a cell, and exact cosine filters them. Shuffles on
    * cell id only — never all-pairs. Cross-cell pairs are missed by
    * construction (the IVF recall trade, same as ivfKnn's nprobe=1 cell
    * walk); because the assignment is deterministic the WHOLE operator is
    * exactly oracle-checkable, unlike the probabilistic hyperplane path
    * (q47's contract).
    *
    * Dense-cell guard ([[SaltGuard]], same design as [[annCandidatePairs]]
    * / `Dedup.lshCandidatePairs`): a skewed embedding distribution (many
    * identical or near-zero vectors sharing one argmax cell) would make the
    * within-cell self-join O(width²). A cell wider than `maxCellWidth` is
    * hash-split into ≈cap-sized salt groups — all pairs within each group,
    * plus head-link candidates from the cell head to each other group's
    * head. The head links pass through the same cosine threshold filter as
    * real pairs, so a split cell is guaranteed to stay one component only
    * when its head pairs clear the threshold — always true for the
    * identical-duplicate skew that creates over-cap cells, approximate for
    * mixed-content cells. Cells at or under the cap (every cell at test
    * scale, and every healthy cell of a sized quantizer) emit exactly the
    * unguarded output: salt is 0 everywhere and no head links exist.
    * Cross-group pairs inside an over-cap cell are the deliberate recall
    * trade that caps the cost — identical to the LSH twins' contract. */
  def ivfNearDupPairs(corpus: DataFrame, threshold: Double, numCentroids: Int = 8,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      maxCellWidth: Int = 10000): DataFrame = {
    require(maxCellWidth > 1, s"maxCellWidth must be > 1: $maxCellWidth")
    val cent = collectCentroids(corpus, numCentroids, idCol, vecCol)
    // localCheckpoint: the map-side assignment feeds the width aggregate,
    // both self-join sides and the head slices
    val cells = assignCells(corpus, cent, idCol, vecCol + "_v", keep = 1, idCol, vecCol)
      .localCheckpoint()
    val salted = SaltGuard.hashSalt(cells, Seq("cid"), idCol, maxCellWidth)
    val a = salted.select(col(idCol).as("vec_a"), col(vecCol + "_v").as("va"),
      col("cid"), col("salt"))
    val b = salted.select(col(idCol).as("vec_b"), col(vecCol + "_v").as("vb"),
      col("cid"), col("salt"))
    val withinGroup = a.join(b, Seq("cid", "salt"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("va"), col("vec_b"), col("vb"))
    val headLinks = SaltGuard.headLinks(salted, Seq("cid"), idCol, Some(vecCol + "_v"))
      .select(col("id_a").as("vec_a"), col("pay_a").as("va"),
        col("id_b").as("vec_b"), col("pay_b").as("vb"))
    withinGroup.union(headLinks)
      .withColumn("cos", cosineF(col("va"), col("vb")))
      .filter(col("cos") > threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — SEMANTIC dedup by
    * embedding clustering, the step LLM corpus prep runs after exact/minhash
    * dedup: cluster the corpus (the paper uses k-means; here the shared
    * deterministic IVF quantizer so the result is exactly oracle-able),
    * then inside each cluster drop every doc whose cosine to some LOWER-id
    * doc exceeds `tau` (min-id keeper — the deterministic twin of the
    * paper's keep-farthest-from-centroid rule; same greedy dominance shape).
    * Cross-cluster near-dups are NOT compared — that is SemDeDup's defining
    * approximation, which makes it linear-ish instead of quadratic.
    *
    * Returns the SURVIVING rows of `corpus` (all columns). Movement =
    * [[ivfNearDupPairs]] (one salt-guarded cell shuffle, never all-pairs) +
    * a distinct over dropped ids + one anti-join — the dropped side is a
    * near-dup id list, small relative to the corpus for any sane `tau`, so
    * AQE broadcasts it; a majority-duplicate corpus degrades to a shuffled
    * anti-join rather than OOMing (no explicit broadcast hint, the
    * decontaminate r6 lesson). */
  def semDedup(corpus: DataFrame, tau: Double, numCentroids: Int = 8,
               idCol: String = "vec_id", vecCol: String = "embedding",
               maxCellWidth: Int = 10000): DataFrame = {
    val dropped = ivfNearDupPairs(corpus, tau, numCentroids, idCol, vecCol, maxCellWidth)
      .select(col("vec_b").as(idCol)).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }

  def annKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             numPlanes: Int = 12, tables: Int = 4, dim: Int = 64,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planeSets = (0 until tables).map(t => hyperplanes(numPlanes, dim, seed = 42L + t))
    val planeArr: Array[Array[Array[Double]]] =
      planeSets.map(_.map(_.toArray).toArray).toArray
    val bucketsF = bucketsUdf(planeArr)
    def bucketed(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(bucketsF(col(vecCol))).as(Seq("tbl", "bkt")))
    val q = bucketed(queries, "query_id", "qv")
    val c = bucketed(corpus, "neighbor_id", "cv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("tbl", "bkt"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct()
      .withColumn("cos", cosineF(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
