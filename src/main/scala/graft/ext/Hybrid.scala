package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — the combiner that sits on top of a
  * lexical ranker (BM25, [[graft.text.Bm25]]) and a vector ranker (exact or
  * ANN kNN, [[Similarity]]) in every modern retrieval stack (the
  * Elasticsearch/OpenSearch "hybrid query" default, Cormack et al. 2009).
  *
  * Reciprocal-rank fusion deliberately consumes RANKS, not scores: BM25 and
  * cosine live on incomparable scales, and ranks are also the only part of
  * a float-scored ranking that is bit-stable across engines (the q46
  * convention). `rrf(d) = Σ_r 1/(k0 + rank_r(d))` over the rankings that
  * retrieved `d` at all; `k0 = 60` is the standard damping constant.
  *
  * Scale: each input ranking is a top-k list — the bounded output of a
  * distributed TakeOrdered / per-query window rank, a few dozen rows — so
  * the fusion join is driver-sized no matter how big the corpus that
  * produced the lists. The 100 TB work happens upstream in the rankers;
  * fusion itself never touches the corpus again.
  */
object Hybrid {

  /** Fuse named `(idCol, rank)` top-k lists into one RRF ranking.
    *
    * Output: `(idCol, <name>_rank ... , rrf)` — one row per id retrieved by
    * at least one ranking, each per-ranking rank column null where that
    * ranker missed the id, `rrf` rounded to 6 decimals (house float
    * convention). Terms are summed in the given rankings order, so the
    * double result replays bit-for-bit in the oracle.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "RRF needs at least one ranking")
    val named = rankings.map { case (name, df) =>
      name -> df.select(col(idCol), col("rank").as(s"${name}_rank"))
    }
    // full-outer chain on the id: an id scored by ANY ranker must surface
    // (that is RRF's whole point — consensus boosts, single-list finds keep
    // a diminished score). USING-join coalesces the key automatically.
    val joined = named.map(_._2).reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = named.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k0) + col(s"${name}_rank")), lit(0.0))
    }.reduce(_ + _)
    joined.select(
      (col(idCol) +: named.map { case (n, _) => col(s"${n}_rank") }) :+
        round(rrf, 6).as("rrf"): _*)
  }
}
