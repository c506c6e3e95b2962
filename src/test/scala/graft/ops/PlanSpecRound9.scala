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
