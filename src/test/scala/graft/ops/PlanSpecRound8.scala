package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan assertions for the round-8 statistical/audit additions: the
  * bounded-pair family must run its cross product as a BROADCAST
  * nested-loop (a plain CartesianProductExec degrades to n_part² tiny
  * tasks), grid-restoring audits must broadcast their margins rather
  * than sort-merge them, and window-free fold queries must not sneak a
  * per-row global sort into the plan. */
class PlanSpecRound8 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def q(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sf)

  test("bounded pair finders broadcast the slice, never CartesianProduct") {
    Seq("q292_dedup_threshold_curve", "q309_lsh_design_curve",
        "q310_simhash_pr", "q291_leakage_free_split").foreach { name =>
      val plan = planOf(q(name))
      assert(!plan.contains("CartesianProduct"),
        s"$name fell back to CartesianProductExec:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"$name lost its broadcast cross-join:\n$name")
    }
  }

  test("chi-square / t-closeness grids broadcast their margins") {
    Seq("q266_chi_square", "q270_t_closeness").foreach { name =>
      val plan = planOf(q(name))
      assert(!plan.contains("CartesianProduct"),
        s"$name margin grid went cartesian:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastHashJoin"),
        s"$name margins not broadcast:\n$plan")
    }
  }

  test("value-domain folds keep per-row sorts out of the fact scan") {
    // q307 ranks via cumulative counts over DISTINCT lengths; the only
    // join back to documents must be hash/broadcast, not a global sort
    // of the fact table feeding a rank window
    val plan = planOf(q("q307_quantile_transform"))
    assert(!plan.contains("CartesianProduct"), plan)
    // the window runs over the aggregated value domain: a Window node
    // is fine, but it must sit above an Aggregate, not above the raw
    // parquet scan — assert the scan's immediate consumer is an
    // aggregate by checking partial-agg presence
    assert(plan.contains("HashAggregate"), plan)
  }

  test("one-scan sufficient statistics: q301 caches its stats row") {
    val df = q("q301_corr_matrix")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"q301's stats frame is recomputed per branch:\n$plan")
  }
}
