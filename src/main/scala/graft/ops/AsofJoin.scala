package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (DuckDB: `ASOF JOIN`,
  * kdb: `aj`): for each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key.
  *
  * Implementation is the scale-correct composition, not a range join:
  * tag both sides, union, and take a running `last(..., ignoreNulls)` over
  * a (key, ts) window. Cost is ONE shuffle on the key (plus the in-partition
  * sort Spark's window needs) — linear in |L|+|R| — versus a range join's
  * candidate blowup or a per-row subquery. At equal timestamps right rows
  * sort before left rows, giving inclusive (<=) as-of semantics.
  *
  * At 100 TB both sides usually arrive bucketed by the key; the union
  * preserves that distribution so the window's shuffle is the only data
  * movement, and skewed keys can be salted upstream without changing the
  * composition.
  */
object AsofJoin {

  /** @param left      probe side (each row gets at most one match)
    * @param right     reference side ("quotes"/"clicks")
    * @param keyCol    equi-key present on both sides
    * @param tsCol     event-time column present on both sides
    * @param valueCols right columns to carry onto matched left rows; the
    *                  right timestamp is always carried as `tsCol+suffix`
    * @param suffix    suffix for carried right columns that collide with
    *                  left column names
    * @param joinType  "inner" drops unmatched left rows, "left" keeps them
    *                  with null carried columns
    */
  /** @param direction "backward" (latest right with ts ≤ left.ts — the
    *                   default, kdb `aj`) or "forward" (earliest right
    *                   with ts ≥ left.ts — pandas merge_asof
    *                   direction='forward'); forward is the same one-
    *                   shuffle composition with the scan order reversed
    * @param toleranceSec optional max |left.ts − right.ts| in seconds
    *                   (pandas merge_asof tolerance): matches farther
    *                   away are dropped (inner) or nulled (left) */
  def apply(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
            valueCols: Seq[String] = Seq.empty, suffix: String = "_r",
            joinType: String = "inner", direction: String = "backward",
            toleranceSec: Option[Long] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asof join supports inner|left, got $joinType")
    require(direction == "backward" || direction == "forward",
      s"asof join supports backward|forward, got $direction")

    def carriedName(c: String): String =
      if (c == tsCol || left.columns.contains(c)) c + suffix else c
    val rPayload = struct(
      (valueCols.map(c => right(c).as(carriedName(c))) :+
        right(tsCol).as(carriedName(tsCol))): _*)
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("asof_side"),
      rPayload.as("asof_r"))
    val lPayload = struct(left.columns.map(left(_)): _*)
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("asof_side"),
      lPayload.as("asof_l"))
    val rType = r.schema("asof_r").dataType
    val lType = l.schema("asof_l").dataType

    val unioned =
      l.withColumn("asof_r", lit(null).cast(rType))
        .unionByName(r.withColumn("asof_l", lit(null).cast(lType)))

    // asof_r as the final sort key gives DUPLICATE right timestamps a
    // deterministic total order (struct comparison), so `last` can't pick a
    // different payload run-to-run; left rows (asof_r null) sort last at
    // equal ts, after every right they may match.
    // forward direction = the identical running-last composition scanning
    // time in reverse (right rows still sort before left rows at ties, so
    // ≥ stays inclusive)
    val tsOrder = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrder, col("asof_side").asc, col("asof_r").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedAll = unioned
      .withColumn("asof_match", last(col("asof_r"), ignoreNulls = true).over(w))
      .filter(col("asof_side") === 1)

    val matched = toleranceSec match {
      case None => matchedAll
      case Some(tol) =>
        val gap =
          if (direction == "backward")
            unix_timestamp(col(tsCol)) - unix_timestamp(col(s"asof_match.${carriedName(tsCol)}"))
          else
            unix_timestamp(col(s"asof_match.${carriedName(tsCol)}")) - unix_timestamp(col(tsCol))
        matchedAll.withColumn("asof_match",
          when(col("asof_match").isNotNull && gap <= tol, col("asof_match")))
    }

    val kept = if (joinType == "inner") matched.filter(col("asof_match").isNotNull)
               else matched
    val leftCols: Seq[Column] = left.columns.toSeq.map(c => col(s"asof_l.$c"))
    val rightCols: Seq[Column] =
      (valueCols.map(carriedName) :+ carriedName(tsCol)).map(c => col(s"asof_match.$c"))
    kept.select((leftCols ++ rightCols): _*)
  }
}
