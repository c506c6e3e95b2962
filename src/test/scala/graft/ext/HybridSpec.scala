package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HybridSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rrfFuse: full-outer semantics, fixed-order sum, k0 damping") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Hybrid.rrfFuse(Seq("lex" -> a, "vec" -> b), "id", k0 = 60)
      .orderBy($"rrf".desc, $"id")
      .as[(Long, Option[Int], Option[Int], Double)].collect()

    // 20 is in both lists -> consensus wins even though neither ranked it
    // worse than 2; singles keep a diminished single-term score.
    assert(out.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L))
    val r20 = out.find(_._1 == 20L).get
    assert(r20._2.contains(2) && r20._3.contains(1))
    assert(math.abs(r20._4 - BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    // 40 was missed by the lex ranker: null rank, single reciprocal term
    val r40 = out.find(_._1 == 40L).get
    assert(r40._2.isEmpty && r40._3.contains(2))
    assert(math.abs(r40._4 - BigDecimal(1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("rrfFuse: single ranking degenerates to its own reciprocal ranks") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val out = Hybrid.rrfFuse(Seq("only" -> a), "id")
      .orderBy($"id").as[(Long, Int, Double)].collect()
    assert(out.length == 2 && out(0)._3 > out(1)._3)
  }
}
