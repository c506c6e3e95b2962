package graft

import org.apache.spark.sql.functions._

/** Recall of the stop-gram-capped ER pair stage against the full trigram
  * metric, AT THE STRESS SLICE — the companion measurement to
  * `q181_trigram_stopgram` in STRESS.md. q366 gates the same recall ≥ 0.9
  * on the catalog's ~343-record slice (cap 128); the ×100 stress decade
  * runs the cap at 1500 over the ~4k-record 20% part slice, and this main
  * measures that configuration directly so the scale row's cheaper
  * candidate generation is gated at the scale it runs, not only at
  * catalog scale. Truth = the UNCAPPED `Trigram.similarSelfJoin` pair set
  * (the same full metric q366 uses); recall = |truth ∩ capped| / |truth|.
  *
  * `sbt "runMain graft.StressErRecall"` — prints one line; paste into the
  * STRESS.md ER section when the cap or slice changes.
  */
object StressErRecall {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stopDf = Stress.erStressStopDf
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    // the EXACT slice the stress family runs (shared definition — see
    // Stress.erStressSlice: gate and row cannot drift apart)
    val recs = Stress.erStressSlice(spark, baseDir)
    val truth = text.Trigram.similarSelfJoin(recs, "p_partkey", "p_name", 11, 20)
      .select($"r1", $"r2").cache()
    val capped = text.Trigram.similarSelfJoin(recs, "p_partkey", "p_name", 11, 20,
        stopGramDf = Some(stopDf))
      .select($"r1", $"r2").cache()
    val nTruth = truth.count()
    val nCapped = capped.count()
    val nHit = truth.join(capped, Seq("r1", "r2"), "left_semi").count()
    val recall = if (nTruth == 0) 1.0 else nHit.toDouble / nTruth
    println(f"""{"stress_er_recall":{"sf":"$baseDir","stop_gram_df":$stopDf,"n_truth":$nTruth,"n_capped":$nCapped,"n_hit":$nHit,"recall":$recall%.4f}}""")
    spark.stop()
    // an actual GATE, not a printout (round-13 ADVICE): a cap or slice
    // change that drops recall below the bar must fail the run the same
    // way q366 enforces it at catalog scale — not rely on a human
    // reading the line
    if (recall < 0.9) {
      System.err.println(
        f"stress ER recall $recall%.4f < 0.9 — the stop-gram cap ($stopDf) " +
          "is dropping true pairs at this slice; raise the cap or shrink it")
      sys.exit(1)
    }
  }
}
