package graft.tools

import graft.GraftSession
import graft.ext.Similarity

/** Dev tool: measure [[Similarity.annCandidatePairs]] recall against the
  * exact cosine ground truth (the q48 slice, cos > 0.45) for a grid of
  * (numPlanes, tables) — the evidence behind q47's recall-contract
  * parameters. Deterministic (fixed hyperplane seeds), so a printed recall
  * is THE recall at that SF, not a sample.
  *
  * Usage: sbt "runMain graft.tools.AnnTune"
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16)
    import spark.implicits._
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val slice = graft.io.Tables.embeddings(spark, d)
        .filter($"vec_id" < graft.ops.ExtQueries.CosineSlice)
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
    spark.stop()
  }
}
