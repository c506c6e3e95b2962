package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — an operator Spark lacks, composed from
  * a pre-aggregation and one running-max window.
  *
  * A row dominates another iff its `x` is ≤ and its `y` is ≥ with at least
  * one strict; the frontier is the set of non-dominated (x, y) coordinates
  * (minimize x, maximize y). Classic reduction: collapse to max(y) per
  * (group, x) first — a map-side-combinable groupBy that shrinks the
  * window input from O(rows) to O(distinct x per group), the bounded-
  * domain trick — then a coordinate survives iff its y strictly beats the
  * running max over all strictly-smaller x. Equal (x, y) rows tie: neither
  * dominates, all are kept (the caller's join-back re-attaches them).
  *
  * At 100 TB: the groupBy is one shuffle with partial aggregation; the
  * window runs per group over the reduced coordinate set (distinct x
  * values), never over raw rows. The skyline references its input twice
  * (per-x best + the window), so callers should pass a NARROW projection
  * (drop payload columns first) — see q193 for the pattern.
  */
object Skyline {

  /** Frontier coordinates per `part` group: minimize `x`, maximize `y`.
    * Output columns: (part, x, y) — only non-dominated coordinates. */
  def frontier2d(df: DataFrame, part: String, x: String, y: String): DataFrame = {
    val best = df.groupBy(col(part), col(x)).agg(max(col(y)).as(y))
    val prev = Window.partitionBy(col(part)).orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, -1)
    best
      .withColumn("__prev_max", max(col(y)).over(prev))
      .filter(col("__prev_max").isNull || col(y) > col("__prev_max"))
      .drop("__prev_max")
  }
}
