package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.NfkdNormalize

class CollapseNfkdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // U+FB01 LATIN SMALL LIGATURE FI — NFKD-decomposes to "fi"
  private val fi = "ﬁ"

  test("idempotence theorem: toNFKD(toNFKD(x)) == toNFKD(x) on adversarial unicode") {
    // the property that makes the rewrite sound — checked against the JDK
    // normalizer on composed/decomposed/compatibility/combining cases and
    // seeded random strings
    val cases = Seq(
      fi + "nance", "été", "été", "①② Ⅳ",
      "ｶﾀｶﾅ", "ẍ́", "½ + ¼", " ", "")
    val rnd = new scala.util.Random(7)
    val randoms = (1 to 500).map(_ =>
      new String((1 to rnd.nextInt(20)).map(_ => rnd.nextInt(0xFFFD).toChar).toArray))
    (cases ++ randoms).foreach { s =>
      val once = NfkdNormalize.normalize(s)
      assert(NfkdNormalize.normalize(once) == once,
        s"not idempotent on ${s.toList}")
    }
  }

  test("optimizer collapses nested graft_nfkd to a single application") {
    // non-foldable input (id-derived) — on literals constant folding
    // evaluates the whole expression before the rewrite is observable
    val df = spark.range(2)
      .select(concat(lit(fi), $"id".cast("string")).as("t"))
      .select(NfkdNormalize(NfkdNormalize($"t")).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    val occurrences = "graft_nfkd".r.findAllIn(optimized).length
    assert(occurrences == 1,
      s"expected exactly one graft_nfkd after CollapseNfkd, got $occurrences:\n$optimized")
    // and the collapsed plan still computes the right value
    assert(df.as[String].collect().sorted.toSeq == Seq("fi0", "fi1"))
  }

  test("rule is active through the SQL surface too") {
    spark.range(1)
      .selectExpr(s"concat('$fi', cast(id AS string)) AS t")
      .createOrReplaceTempView("nfkd_t")
    val df = spark.sql("SELECT graft_nfkd(graft_nfkd(t)) AS n FROM nfkd_t")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("graft_nfkd".r.findAllIn(optimized).length == 1, optimized)
    assert(df.as[String].head() == "fi0")
  }
}
