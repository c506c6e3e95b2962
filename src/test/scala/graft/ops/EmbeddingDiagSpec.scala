package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Part-7 (q337–q342) contract checks in two layers:
  *
  * 1. Pure-math identities (StatIdentitySpec convention): the catalog
  *    queries encode one-pass closed forms over exact integer moments;
  *    these prove each closed form equals the naive definition on seeded
  *    random integers, so a DuckDB oracle match can't be two engines
  *    sharing the same algebra bug.
  * 2. Executed-plan + range contracts at sf0.001 (PlanSpec convention):
  *    the scale-shaped movement claims in the Scaladocs are asserted,
  *    not just narrated.
  */
class EmbeddingDiagSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private val rnd = new scala.util.Random(20260815L)

  private def q(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sf)

  // q337: M_ij = n·Σx_ix_j − T_iT_j satisfies the centered-moment
  // identity Σ_rows (n·x_i − T_i)(n·x_j − T_j) = n·M_ij — an
  // independently-computed check that M really is n²·cov_pop.
  test("q337 moment matrix equals centered sum-of-products (n·M identity)") {
    for (_ <- 1 to 200) {
      val n = 2 + rnd.nextInt(20)
      val d = 1 + rnd.nextInt(5)
      val rows = Vector.fill(n, d)(BigInt(rnd.nextInt(2001) - 1000))
      for (i <- 0 until d; j <- 0 until d) {
        val s = rows.map(r => r(i) * r(j)).sum
        val ti = rows.map(_(i)).sum
        val tj = rows.map(_(j)).sum
        val m = BigInt(n) * s - ti * tj
        val centered = rows.map(r => (BigInt(n) * r(i) - ti) * (BigInt(n) * r(j) - tj)).sum
        assert(centered == BigInt(n) * m, s"n=$n i=$i j=$j")
      }
    }
  }

  // q337: participation ratio tr²/tr(C²) ∈ [1, d] for any non-degenerate
  // integer data (Cauchy-Schwarz on the eigenvalue vector).
  test("q337 effective rank bounds hold on the real table") {
    val row = q("q337_effective_rank").collect()(0)
    val eff = row.getAs[Long]("eff_rank_micro")
    assert(eff >= 1000000L && eff <= 64L * 1000000L, s"eff_rank_micro=$eff")
    val share = row.getAs[Long]("top_var_share_ppm")
    assert(share >= 1000000L / 64 && share <= 1000000L, s"share=$share")
  }

  // q340: ‖n_b·T_a − n_a·T_b‖² = n_a²·n_b²·‖μ_a − μ_b‖² — the exact
  // integer between-distance equals the naive rational centroid math.
  test("q340 between-distance closed form equals naive centroid distance") {
    for (_ <- 1 to 200) {
      val d = 1 + rnd.nextInt(5)
      val na = 1 + rnd.nextInt(10); val nb = 1 + rnd.nextInt(10)
      val a = Vector.fill(na, d)(BigInt(rnd.nextInt(2001) - 1000))
      val b = Vector.fill(nb, d)(BigInt(rnd.nextInt(2001) - 1000))
      val ta = (0 until d).map(i => a.map(_(i)).sum)
      val tb = (0 until d).map(i => b.map(_(i)).sum)
      val d2s = (0 until d).map(i => (BigInt(nb) * ta(i) - BigInt(na) * tb(i)).pow(2)).sum
      val naive = (0 until d).map { i =>
        val mu = ta(i).toDouble / na; val nu = tb(i).toDouble / nb
        (mu - nu) * (mu - nu)
      }.sum
      val scaled = d2s.toDouble / (na.toDouble * na * nb * nb)
      assert(math.abs(scaled - naive) <= 1e-6 * math.max(1.0, naive.abs),
        s"d2s=$d2s naive=$naive")
    }
  }

  // q341: the in-row Σf² fold and MATTR formula equal an imperative
  // sequential implementation (sliding set window) on random token seqs.
  test("q341 Yule/MATTR closed forms equal sequential brute force") {
    val W = 25
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(80)
      val ws = Vector.fill(n)(s"w${rnd.nextInt(12)}")
      val f = ws.groupBy(identity).values.map(_.size.toLong)
      val sf2 = f.map(c => c * c).sum
      // brute Σf²: count equal-pairs including self
      val brute = (for (a <- ws; b <- ws if a == b) yield 1L).sum
      assert(sf2 == brute)
      if (n >= W) {
        val mattrS = (0 to n - W).map(p => ws.slice(p, p + W).distinct.size.toLong).sum
        val viaFormula = (1 to n - W + 1).map(p => ws.slice(p - 1, p - 1 + W).toSet.size.toLong).sum
        assert(mattrS == viaFormula)
        val mattrPpm = mattrS * 1000000L / (W.toLong * (n - W + 1))
        assert(mattrPpm > 0 && mattrPpm <= 1000000L)
      }
    }
  }

  // q342: conditional entropy is the chain-rule gap H(bigram) − H(prefix)
  // ≥ 0, and the per-type×count quantized sum is within quantization
  // error of the real-valued Σ c₂·ln(c₁/c₂).
  test("q342 quantized conditional entropy tracks the real-valued sum") {
    for (_ <- 1 to 200) {
      val nTypes = 1 + rnd.nextInt(15)
      // random bigram counts grouped under random prefixes
      val c2 = Vector.fill(nTypes)(1L + rnd.nextInt(50))
      val pfx = Vector.fill(nTypes)(rnd.nextInt(5))
      val c1 = pfx.indices.groupBy(pfx).map { case (p, is) => p -> is.map(c2).sum }
      val total = c2.sum
      val exact = pfx.indices.map { k =>
        c2(k) * (math.log(c1(pfx(k)).toDouble) - math.log(c2(k).toDouble))
      }.sum / total
      val quant = pfx.indices.map { k =>
        c2(k) * (math.round(math.log(c1(pfx(k)).toDouble) * 1e6) -
          math.round(math.log(c2(k).toDouble) * 1e6))
      }.sum / total
      assert(exact >= -1e-9, s"negative conditional entropy: $exact")
      assert(math.abs(quant / 1e6 - exact) <= 2e-6 + 1e-9 * exact.abs,
        s"quant=${quant / 1e6} exact=$exact")
    }
  }

  // Plan + range contracts on the real tables.
  test("q338/q339 outputs satisfy their geometric bounds at sf0.001") {
    q("q338_isotropy").collect().foreach { r =>
      val rp = r.getAs[Long]("resultant_ppm")
      // unit-vector mean resultant length ≤ 1 (+ per-row rounding slack)
      assert(rp >= 0 && rp <= 1000100L, s"resultant_ppm=$rp")
      val mn = r.getAs[Long]("mean_norm_micro")
      assert(mn > 0, s"mean_norm_micro=$mn")
    }
    val occ = q("q339_hubness").collect()
    // every query contributes exactly 10 neighbor slots
    assert(occ.map(_.getAs[Long]("n10")).sum == 10L * occ.length)
  }

  test("q337 keeps the moment fold join-free below the d² aggregate") {
    val df = q("q337_effective_rank")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the only joins allowed are the broadcast assembly of T/n onto the
    // 4096-row moment table — never a sort-merge join, never cartesian
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }
}
