package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property-style test: AsofJoin (both directions × both join types, with
  * and without tolerance) must agree with an O(n²) reference on random
  * small tables. The operator's window-scan composition has subtle edges
  * (equal timestamps, duplicate right rows, keys on one side only) that
  * seeded random data hits far more often than hand fixtures. */
class AsofJoinPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  /** O(n²) reference: best right ts per direction, inclusive bounds,
    * then the tolerance cut. Only the right timestamp is carried, so
    * duplicate-right payload ambiguity cannot arise. */
  private def reference(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long)],
                        direction: String, tol: Option[Long]): Map[Long, Option[Long]] =
    ls.map { case (id, k, t) =>
      val cands = rs.collect {
        case (rk, rt) if rk == k &&
          (if (direction == "backward") rt <= t else rt >= t) => rt
      }
      val best =
        if (cands.isEmpty) None
        else Some(if (direction == "backward") cands.max else cands.min)
      id -> best.filter(rt => tol.forall(x =>
        (if (direction == "backward") t - rt else rt - t) <= x))
    }.toMap

  test("AsofJoin agrees with the brute-force reference on seeded random tables") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 10) {
      // small universes force collisions: 3 keys, coarse timestamps
      val ls = (0 until 12).map(i => (i.toLong, rnd.nextInt(3).toLong + 1, rnd.nextInt(30).toLong))
      val rs = (0 until 12).map(_ => (rnd.nextInt(3).toLong + 1, rnd.nextInt(30).toLong))
      val left = ls.map { case (id, k, t) => (id, k, ts(t)) }.toDF("event_id", "user_id", "ts")
      val right = rs.map { case (k, t) => (k, ts(t)) }.toDF("user_id", "ts")
      for (direction <- Seq("backward", "forward"); tol <- Seq(None, Some(5L))) {
        val expect = reference(ls, rs, direction, tol)
        val innerGot = AsofJoin(left, right, "user_id", "ts",
            joinType = "inner", direction = direction, toleranceSec = tol)
          .select($"event_id", $"ts_r").collect()
          .map(r => r.getLong(0) -> r.getTimestamp(1).getTime / 1000L).toMap
        assert(innerGot == expect.collect { case (id, Some(rt)) => id -> rt },
          s"trial $trial inner/$direction/tol=$tol:\nleft=$ls\nright=$rs")
        val leftGot = AsofJoin(left, right, "user_id", "ts",
            joinType = "left", direction = direction, toleranceSec = tol)
          .select($"event_id", $"ts_r").collect()
          .map(r => r.getLong(0) -> Option(r.getTimestamp(1)).map(_.getTime / 1000L)).toMap
        assert(leftGot == expect,
          s"trial $trial left/$direction/tol=$tol:\nleft=$ls\nright=$rs")
      }
    }
  }
}
