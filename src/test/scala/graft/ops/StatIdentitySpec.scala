package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-math identities behind the q266–q290 statistical family. The
  * catalog queries encode CLOSED FORMS chosen for one-pass distributed
  * execution; these properties prove each closed form equals the naive
  * sequential/brute-force definition on seeded random inputs, so an
  * oracle match can't be "two engines sharing the same algebra bug".
  * Seeded-Random loops (the TopKByKeyPropSpec convention) rather than
  * scalacheck: the boundary cases (ties, empty prefixes, single groups)
  * appear thousands of times across the iterations.
  */
class StatIdentitySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260814L)

  // q272: S_t = max(0, S_{t-1} + x_t − k)  ==  P_t − min(0, min_{j≤t} P_j)
  test("CUSUM recursion equals prefix-minus-min-prefix closed form") {
    for (_ <- 1 to 500) {
      val xs = List.fill(rnd.nextInt(60))(rnd.nextLong(150) - 50)
      val k = rnd.nextLong(60)
      var srec = 0L
      val rec = xs.map { x => srec = math.max(0L, srec + x - k); srec }
      var p = 0L
      var minp = 0L // min over prefix INCLUDING the virtual P_0 = 0
      val closed = xs.map { x =>
        p += x - k
        minp = math.min(minp, p)
        p - minp
      }
      assert(rec == closed, s"xs=$xs k=$k")
    }
  }

  // q276/q284: U from doubled midranks over the grouped value domain ==
  // brute-force pair counting 2·#{x>y} + #{x==y}
  test("doubled-midrank Mann-Whitney U equals brute-force pair counting") {
    for (_ <- 1 to 500) {
      val as = List.fill(1 + rnd.nextInt(25))(rnd.nextInt(8))
      val bs = List.fill(1 + rnd.nextInt(25))(rnd.nextInt(8))
      val brute2x = (for (a <- as; b <- bs) yield {
        if (a > b) 2L else if (a == b) 1L else 0L
      }).sum
      // the catalog's fold: per distinct value v ascending, with ca/cb
      // counts and cum = running total of (ca+cb):
      // R1_2x = Σ ca·(2·cum − cnt + 1);  U_2x = R1_2x − n1(n1+1)
      val vals = (as ++ bs).distinct.sorted
      var cum = 0L
      var r12x = 0L
      vals.foreach { v =>
        val ca = as.count(_ == v).toLong
        val cb = bs.count(_ == v).toLong
        val cnt = ca + cb
        cum += cnt
        r12x += ca * (2 * cum - cnt + 1)
      }
      val n1 = as.size.toLong
      val fold2x = r12x - n1 * (n1 + 1)
      assert(fold2x == brute2x, s"fold=$fold2x brute=$brute2x as=$as bs=$bs")
    }
  }

  // q282: the broadcast-total fold (sx − sx_i)/(n − n_i) IS the
  // recomputed-from-scratch leave-one-out mean, at the same integer
  // quantization
  test("broadcast-total LOO fold equals recomputed leave-one-out mean") {
    for (_ <- 1 to 300) {
      val gs = List.fill(2 + rnd.nextInt(8))(
        List.fill(1 + rnd.nextInt(20))(rnd.nextLong(5000)))
      val sx = gs.map(_.sum).sum
      val n = gs.map(_.size.toLong).sum
      gs.foreach { g =>
        val folded = (sx - g.sum) * 1000 / (n - g.size)
        val rest = gs.filterNot(_ eq g).flatten
        val direct = rest.sum * 1000 / rest.size
        assert(folded == direct)
      }
    }
  }

  // q264: largest-remainder apportionment sums exactly to H and each
  // quota sits within 1 seat of the exact real-valued share
  test("largest-remainder quotas sum to H, each within 1 of exact share") {
    for (_ <- 1 to 300) {
      val cs = List.fill(1 + rnd.nextInt(12))(1L + rnd.nextLong(10000))
      val h = 1L + rnd.nextLong(200)
      val total = cs.sum
      val floors = cs.map(c => c * h / total)
      val rems = cs.map(c => c * h % total)
      val leftover = (h - floors.sum).toInt
      val order = rems.zipWithIndex.sortBy { case (r, i) => (-r, i) }
        .map(_._2).take(leftover).toSet
      val quotas = floors.zipWithIndex.map { case (f, i) =>
        f + (if (order(i)) 1L else 0L)
      }
      assert(quotas.sum == h)
      quotas.zip(cs).foreach { case (q, c) =>
        val exact = c.toDouble * h / total
        assert(q + 1 > exact && q - 1 < exact, s"quota $q vs exact $exact")
      }
    }
  }

  // q267: the cross-multiplied integer KS statistic equals the
  // double-CDF definition scaled by n1·n2 (exactly — no float division
  // ever needs to happen)
  test("integer cross-multiplied KS equals CDF-difference definition") {
    for (_ <- 1 to 300) {
      val as = List.fill(1 + rnd.nextInt(30))(rnd.nextInt(10))
      val bs = List.fill(1 + rnd.nextInt(30))(rnd.nextInt(10))
      val n1 = as.size.toLong
      val n2 = bs.size.toLong
      val vals = (as ++ bs).distinct.sorted
      var f1 = 0L
      var f2 = 0L
      var best = 0L
      vals.foreach { v =>
        f1 += as.count(_ == v)
        f2 += bs.count(_ == v)
        best = math.max(best, math.abs(f1 * n2 - f2 * n1))
      }
      val viaDoubles = vals.scanLeft((0L, 0L)) { case ((c1, c2), v) =>
        (c1 + as.count(_ == v), c2 + bs.count(_ == v))
      }.tail.map { case (c1, c2) =>
        math.abs(c1.toDouble / n1 - c2.toDouble / n2)
      }.max
      assert(math.abs(best.toDouble / (n1 * n2) - viaDoubles) < 1e-9,
        s"as=$as bs=$bs")
    }
  }
}
