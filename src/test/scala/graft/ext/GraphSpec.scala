package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Scale = 1000000000L

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("star graph: hub outranks leaves, leaves tie exactly") {
    // hub 0 connected to leaves 1..4
    val ranks = Graph.pageRankExact(sym(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))),
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size == 5)
    val leafRanks = (1L to 4L).map(ranks)
    assert(leafRanks.distinct.size == 1, "symmetric leaves must tie bit-exactly")
    assert(ranks(0L) > leafRanks.head * 2,
      "the hub receives all four leaf contributions and must dominate")
  }

  test("mass is conserved up to documented floor losses") {
    val n = 6L
    val ring = sym((0L until n).map(i => (i, (i + 1) % n)))
    val total = Graph.pageRankExact(ring, iters = 4)
      .agg(org.apache.spark.sql.functions.sum("rank")).as[Long].head()
    // every node floors at most dampDen units per division, per iteration
    val slack = n * 101 * 4
    assert(total <= n * Scale && total >= n * Scale - slack,
      s"ring total $total outside [${n * Scale - slack}, ${n * Scale}]")
  }

  test("regular graph is the exact fixed point: every rank stays at scale minus floor dust") {
    val n = 5L
    // complete graph K5: deg 4 everywhere — uniform ranks are stationary
    val edges = (for { a <- 0L until n; b <- 0L until n if a != b }
      yield (a, b)).toDF("src", "dst")
    val ranks = Graph.pageRankExact(edges, iters = 3)
      .select("rank").as[Long].collect()
    assert(ranks.length == n)
    assert(ranks.distinct.length == 1, "uniform graph must stay uniform")
    assert(math.abs(ranks.head - Scale) <= 400,
      s"stationary rank ${ranks.head} drifted more than integer floor dust")
  }

  test("directed sink receives inflow; source keeps only teleport") {
    // 0 -> 1 (no symmetrization): node 1 never appears as src, so it is
    // outside the rank frame (documented: universe = distinct sources);
    // 0 has no in-edges -> teleport only after one iteration
    val ranks = Graph.pageRankExact(Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L))
        .toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 0: inflow from 2 (deg 1, full scale): 150e6 + 85% of 1e9
    assert(ranks(0L) == 150000000L + 850000000L)
    // node 1: inflow = half of 0's mass (deg 2)
    assert(ranks(1L) == 150000000L + 85L * (Scale / 2) / 100L)
  }

  test("kCore: multi-round peeling strips the chain, keeps the triangle intact") {
    // triangle {1,2,3} + pendant chain 3-4-5: node 5 peels in round 1
    // (deg 1), which drops 4 to deg 1 so it peels in round 2 — the
    // multi-round case a single degree filter would get wrong
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.kCore(g, k = 2, iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // k above the max degree empties the graph
    assert(Graph.kCore(g, k = 4, iters = 3).count() == 0L)
    // iters beyond convergence is a fixpoint: same answer
    val more = Graph.kCore(g, k = 2, iters = 6)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(more == got)
  }
}
