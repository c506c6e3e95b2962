package graft.tools

import graft.GraftSession
import graft.ext.Similarity

/** Dev tool: measure ANN recall against exact ground truth — the evidence
  * behind the measured-recall contracts:
  *
  *  - LSH pair recall ([[Similarity.annCandidatePairs]] vs the q48 exact
  *    cosine pairs) for a grid of (numPlanes, tables) — behind q47.
  *  - IVF kNN recall@10 ([[Similarity.ivfKnn]] vs the q46 exact
  *    brute-force top-10) for a grid of (numCentroids, nprobe) — behind
  *    q100. Measured: (8, 2) — q49's params — gives 0.94 @ sf0.01 and
  *    0.98 @ sf0.1; fewer centroids raise recall but widen cells (cost),
  *    more centroids need a higher nprobe to hold recall. Sizing at scale:
  *    numCentroids ∝ √n, nprobe 2-8 (see Similarity.collectCentroids).
  *  - PQ recall@10 ([[Similarity.pqKnn]] ADC+re-rank vs the same truth)
  *    for a grid of (m, ksub, shortlist, maxIters) — behind q115.
  *    Measured @ sf0.1: (16, 64, 100) = 0.96 (q115's params, 16×
  *    compression); (8, 16, 50) = 0.66 (32×); (32, 16, 100) = 1.0 (8×).
  *    maxIters 3 vs 10 at q115's params: identical recall at sf0.01
  *    (1.00) and sf0.1 (0.96) — q115 trains at 3. This corpus is random
  *    unit vectors — the PQ-adversarial case; clustered real embeddings
  *    compress far better.
  *  - Composed IVF-PQ ([[Similarity.ivfPqKnn]], trained 8-cell quantizer +
  *    the q115 codebooks): recall compounds cell misses × ADC error —
  *    measured @ sf0.1: nprobe 1/2/4/8 → 0.94/0.94/0.96/0.96 at
  *    shortlist=100 (@ sf0.01: 0.80/0.90/0.96/1.0). The cells bound the
  *    scan, the codes bound the bytes; both approximations are visible
  *    here separately (flat PQ above = no cell loss).
  *
  * Deterministic (fixed hyperplane seeds, deterministic quantizer), so a
  * printed recall is THE recall at that SF, not a sample.
  *
  * Usage: sbt "runMain graft.tools.AnnTune [lsh|ivf|pq|ivfpq ...]" — no
  * args runs every section; naming sections runs just those.
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    def on(section: String) = args.isEmpty || args.contains(section)
    val spark = GraftSession.local(16)
    import spark.implicits._
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      if (on("lsh")) {
        val slice = graft.io.Tables.embeddings(spark, d)
          .filter($"vec_id" < graft.ops.ExtQueriesShared.CosineSlice)
          .repartition($"vec_id").cache()
        val truth = Similarity.cosineNearDupPairs(slice, 0.45)
          .select("vec_a", "vec_b").cache()
        val nTruth = truth.count()
        for ((p, t) <- Seq((12, 4), (8, 8), (6, 12), (5, 17), (4, 11), (4, 16), (3, 10))) {
          val cands = Similarity.annCandidatePairs(slice, p, t)
          val hit = truth.join(cands, Seq("vec_a", "vec_b"), "left_semi").count()
          val nCands = cands.count()
          println(s"TUNE sf=$d planes=$p tables=$t recall=$hit/$nTruth cands=$nCands")
        }
        truth.unpersist(); slice.unpersist()
      }

      val emb = graft.io.Tables.embeddings(spark, d).repartition($"vec_id").cache()
      val q = emb.filter($"vec_id" < 5)
      val knnTruth = Similarity.bruteForceKnn(q, emb, k = 10)
        .select("query_id", "neighbor_id").cache()
      val nKnn = knnTruth.count()
      if (on("ivf")) {
        for ((nc, np) <- Seq((4, 1), (4, 2), (8, 1), (8, 2), (8, 4), (16, 2), (16, 4))) {
          val ann = Similarity.ivfKnn(q, emb, k = 10, numCentroids = nc, nprobe = np)
            .select("query_id", "neighbor_id")
          val hit = knnTruth.join(ann, Seq("query_id", "neighbor_id"), "left_semi").count()
          println(s"TUNE sf=$d centroids=$nc nprobe=$np recall@10=$hit/$nKnn")
        }
      }
      if (on("pq")) {
        // iters=3 rows measure how much Lloyd refinement the codebooks
        // actually need — the bench-weight knob behind q115's training
        for ((m, ks, sl, it) <- Seq((16, 16, 100, 10), (16, 16, 200, 10),
            (16, 32, 100, 10), (8, 16, 200, 10), (16, 64, 100, 10),
            (16, 64, 100, 3), (32, 16, 100, 10))) {
          val cb = Similarity.pqTrain(emb, m = m, ksub = ks, maxIters = it)
          val pq = Similarity.pqKnn(q, emb, k = 10, cb, shortlist = sl)
            .select("query_id", "neighbor_id")
          val hit = knnTruth.join(pq, Seq("query_id", "neighbor_id"), "left_semi").count()
          println(s"TUNE sf=$d pq m=$m ksub=$ks shortlist=$sl iters=$it recall@10=$hit/$nKnn")
        }
      }
      if (on("ivfpq")) {
        // composed IVF-PQ: recall compounds cell misses × ADC ordering error
        val cents = Similarity.kmeansTrain(emb, numCentroids = 8, maxIters = 5)
        val cb = Similarity.pqTrain(emb, m = 16, ksub = 64)
        for ((np, sl) <- Seq((1, 100), (2, 100), (4, 100), (8, 100))) {
          val ivfpq = Similarity.ivfPqKnn(q, emb, k = 10, cents, cb,
            nprobe = np, shortlist = sl)
            .select("query_id", "neighbor_id")
          val hit = knnTruth.join(ivfpq, Seq("query_id", "neighbor_id"), "left_semi").count()
          println(s"TUNE sf=$d ivfpq m=16 ksub=64 nprobe=$np shortlist=$sl recall@10=$hit/$nKnn")
        }
      }
      knnTruth.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
