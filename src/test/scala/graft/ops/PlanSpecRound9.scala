package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan assertions for the round-9 placement/monitor additions: the
  * shard-assignment crossJoins must stay BROADCAST nested-loops over the
  * ring/shard constant tables (a shuffled cartesian would move the whole
  * key table once per ring node), and the SPRT daily grid must aggregate
  * BEFORE any window (the window is legal only because it runs over the
  * bounded day grid, not the event stream). */
class PlanSpecRound9 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def q(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q343 assigns by literal-ring probe: join-free until the count folds") {
    val plan = planOf(q("q343_ring_rebalance"))
    // the ring is a literal array constant — ANY join in this plan means
    // the keys×ring amplification came back (measured 38 s vs 2 s at
    // sf0.1 when the assignment was a crossJoin + struct aggregate)
    assert(!plan.contains("Join"), s"q343 rejoined its ring constant:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q344 broadcasts the shard table, never CartesianProduct") {
    val plan = planOf(q("q344_rendezvous_routing"))
    assert(!plan.contains("CartesianProduct"),
      s"q344 shuffled its shard cross product:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"q344 lost the broadcast of its shard table:\n$plan")
    // the per-key argmax must stay a codegen hash aggregate over packed
    // longs (a struct min/max falls back to SortAggregate and sorts the
    // whole keys×shards product)
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"),
      s"q344 argmax fell out of hash aggregation:\n$plan")
  }

  test("q347 windows run over the aggregated day grid, not raw events") {
    val df = q("q347_sprt_monitor")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the (arm, day) count aggregate must sit below the running-sum
    // window: a Window whose child scans parquet directly would be the
    // per-event ordered-scan scale bug this query exists to avoid
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"no aggregate below the SPRT window:\n$plan")
  }

  // q343's successor probe must equal the naive argmin of the clockwise
  // distance (pos − h) mod M with the (dist, shard) tiebreak — the
  // equivalence the rewrite relies on, checked on random rings.
  test("q343 successor probe equals naive clockwise argmin") {
    val rnd = new scala.util.Random(20260815L)
    val M = 1L << 20
    for (_ <- 1 to 500) {
      val ring = Vector.fill(1 + rnd.nextInt(40))(
        (rnd.nextLong(M), rnd.nextInt(17))).distinct.sorted
      val h = rnd.nextLong(M)
      // naive: min by ((pos - h) mod M, shard)
      val naive = ring.minBy { case (p, s) => (((p - h) % M + M) % M, s) }._2
      // probe: first pos >= h in sorted order, wrapping to index 0
      val cnt = ring.count(_._1 < h)
      val probe = ring(cnt % ring.size)._2
      assert(probe == naive, s"h=$h ring=$ring")
    }
  }

  // q349's scale story rests on KMV mergeability: the k smallest of a
  // union equal the k smallest of the per-shard k-minima — checked on
  // random shardings, including shards smaller than k.
  test("q349 KMV merge property: k-min of union == k-min of shard k-mins") {
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(12)
      val shards = Vector.fill(1 + rnd.nextInt(6))(
        Vector.fill(rnd.nextInt(40))(rnd.nextLong(1000)).distinct)
      val all = shards.flatten.distinct.sorted.take(k)
      val merged = shards.flatMap(_.sorted.take(k)).distinct.sorted.take(k)
      assert(all == merged, s"k=$k shards=$shards")
    }
  }

  // q352's Poisson(1) threshold grid must reproduce the inverse CDF: the
  // implied probability of weight j is e^-1/j! to hash resolution, and
  // the implied mean is 1 (what makes the bootstrap unbiased).
  test("q352 Poisson threshold grid implies e^-1/j! weights with mean 1") {
    val H = 4503599627370496L // 2^52
    var cdf = 0.0
    val ts = (0 to 6).map { j =>
      cdf += math.exp(-1.0) / (1 to j).product
      math.round(cdf * H)
    }
    // P(w = j) in hash units: T_j - T_{j-1}
    val probs = ts.zip(-1L +: ts.dropRight(1)).map {
      case (t, p) => (t - math.max(p, 0L)).toDouble / H
    }
    probs.zipWithIndex.foreach { case (p, j) =>
      val exact = math.exp(-1.0) / (1 to j).product
      assert(math.abs(p - exact) < 1e-12, s"j=$j p=$p exact=$exact")
    }
    // mean of the capped distribution: Σ j·p_j + 7·(1 - CDF(6)) ≈ 1
    val mean = probs.zipWithIndex.map { case (p, j) => j * p }.sum +
      7.0 * (1.0 - ts.last.toDouble / H)
    assert(math.abs(mean - 1.0) < 1e-4, s"mean=$mean")
  }

  test("q347 decisions are made at the first boundary crossing") {
    val rows = q("q347_sprt_monitor").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val dec = r.getAs[String]("decision")
      if (dec == "continue") assert(r.isNullAt(r.fieldIndex("cross_day")))
      else assert(!r.isNullAt(r.fieldIndex("cross_day")))
    }
  }
}
