package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q154's semantic core: a time-RANGE frame must window by elapsed DAYS,
  * not by neighboring rows — on sparse dates the two disagree, and a
  * ROWS-frame implementation would silently sum across gaps. */
class WindowFrameSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("7-day RANGE frame excludes days beyond the gap; ROWS frame would not") {
    // days 0,1,2 then a 30-day gap, then 32,33: the frame at day 32 must
    // see only day 32+33… and at day 33 see {32,33} — never the pre-gap days
    val df = Seq(("2024-01-01", 10L), ("2024-01-02", 20L), ("2024-01-03", 30L),
      ("2024-02-01", 40L), ("2024-02-02", 50L))
      .toDF("day_str", "v")
      .select(to_date($"day_str").as("day"), $"v")
    val w = Window.orderBy(datediff($"day", lit("1970-01-01").cast("date")))
      .rangeBetween(-6, 0)
    val got = df.withColumn("s", sum($"v").over(w))
      .orderBy($"day").select($"s").as[Long].collect().toSeq
    assert(got == Seq(10L, 30L, 60L, 40L, 90L),
      s"range frame must respect the date gap, got $got")
    // the rows-frame alternative DOES bleed across the gap — proving the
    // two are distinguishable on this data (the spec would be vacuous else)
    val wr = Window.orderBy($"day").rowsBetween(-6, 0)
    val rows = df.withColumn("s", sum($"v").over(wr))
      .orderBy($"day").select($"s").as[Long].collect().toSeq
    assert(rows.last == 150L, "rows frame sums across the gap by design")
  }
}
