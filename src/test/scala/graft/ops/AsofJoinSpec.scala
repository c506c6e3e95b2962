package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // rights: user 1 at t=10,20; user 2 at t=15
  lazy val right = Seq((1L, ts(10), "r10"), (1L, ts(20), "r20"), (2L, ts(15), "r15"))
    .toDF("user_id", "ts", "tag")
  // lefts: before-any, equal-ts, between, after-all, keyless
  lazy val left = Seq(
    (100L, 1L, ts(5)),   // before any right -> unmatched
    (101L, 1L, ts(10)),  // equal ts -> inclusive match r10
    (102L, 1L, ts(15)),  // between -> r10
    (103L, 1L, ts(99)),  // after all -> r20
    (104L, 3L, ts(50)))  // key with no rights -> unmatched
    .toDF("event_id", "user_id", "ts")

  test("inner: inclusive <= matching, latest right wins, unmatched dropped") {
    val got = AsofJoin(left, right, "user_id", "ts", valueCols = Seq("tag"))
      .select($"event_id", $"tag", $"ts_r").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
    assert(got == Set(
      (101L, "r10", ts(10)),
      (102L, "r10", ts(10)),
      (103L, "r20", ts(20))))
  }

  test("forward: earliest right at-or-after wins; inclusive at equal ts") {
    val got = AsofJoin(left, right, "user_id", "ts", valueCols = Seq("tag"),
        direction = "forward")
      .select($"event_id", $"tag", $"ts_r").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
    assert(got == Set(
      (100L, "r10", ts(10)),  // before any right -> earliest following
      (101L, "r10", ts(10)),  // equal ts -> inclusive
      (102L, "r20", ts(20)))) // between -> next right; 103 after all -> drop
  }

  test("tolerance: matches farther than the bound drop (inner) or null (left)") {
    // backward from t=99 to r20 at t=20 is 79s away: tol 60 must drop it
    val inner = AsofJoin(left, right, "user_id", "ts", valueCols = Seq("tag"),
        toleranceSec = Some(60L))
      .select($"event_id").as[Long].collect().toSet
    assert(inner == Set(101L, 102L), s"tolerance must cut 103, got $inner")
    val kept = AsofJoin(left, right, "user_id", "ts", valueCols = Seq("tag"),
        joinType = "left", toleranceSec = Some(60L))
      .select($"event_id", $"tag").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(kept(103L).isEmpty && kept.size == 5)
  }

  test("left: unmatched rows kept with null carried columns") {
    val got = AsofJoin(left, right, "user_id", "ts", Seq("tag"), joinType = "left")
      .select($"event_id", $"tag").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got(100L).isEmpty && got(104L).isEmpty)
    assert(got(101L).contains("r10") && got(103L).contains("r20"))
    assert(got.size == 5)
  }

  test("duplicate right timestamps resolve deterministically (greatest payload)") {
    val dupRight = Seq((1L, ts(10), "rA"), (1L, ts(10), "rB")).toDF("user_id", "ts", "tag")
    val l = Seq((7L, 1L, ts(11))).toDF("event_id", "user_id", "ts")
    val got = (1 to 5).map { _ =>
      AsofJoin(l, dupRight, "user_id", "ts", Seq("tag"))
        .select($"tag").as[String].head()
    }
    assert(got.distinct == Seq("rB"), s"nondeterministic tie-break: $got")
  }

  test("carried right column colliding with a left name gets the suffix") {
    val r2 = right.withColumnRenamed("tag", "event_id") // collides with left
    val out = AsofJoin(left, r2, "user_id", "ts", valueCols = Seq("event_id"))
    assert(out.columns.count(_ == "event_id") == 1)
    assert(out.columns.contains("event_id_r"))
  }
}
