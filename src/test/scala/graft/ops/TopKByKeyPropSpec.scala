package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Aggregators.{KeyedDoc, TopKByKeyAgg}

/** The streaming/distributed correctness of q182 rests on TopKByKeyAgg's
  * buffer algebra: any partitioning of the input into reduce/merge trees
  * must yield the same k rows as a global sort. Seeded random inputs and
  * random tree shapes hit the tie/boundary cases (duplicate keys, short
  * inputs, empty sides) far more often than hand fixtures. */
class TopKByKeyPropSpec extends AnyFunSuite {

  private val k = 5
  private val agg = new TopKByKeyAgg(k)

  private def truth(xs: Seq[KeyedDoc]): Seq[KeyedDoc] =
    xs.sortBy(d => (-d.wkey, d.doc_id)).take(k)

  private def gen(rnd: scala.util.Random, n: Int): Seq[KeyedDoc] =
    // quantized keys force frequent TIES: doc_id tiebreak must hold in
    // every reduce/merge order, and distinct ids keep truth unambiguous
    rnd.shuffle((0 until n).toList).map(i =>
      KeyedDoc(math.floor(rnd.nextDouble() * 8) / 8.0, i.toLong, 1L))

  test("random split points: reduce+merge equals global sort-take-k") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(40)
      val xs = gen(rnd, n)
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == truth(xs), s"n=$n cut=$cut xs=$xs")
    }
  }

  test("merge is commutative and zero is the identity") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 200) {
      val a = gen(rnd, rnd.nextInt(15)).foldLeft(agg.zero)(agg.reduce)
      val b = gen(rnd, rnd.nextInt(15)).map(d => d.copy(doc_id = d.doc_id + 100))
        .foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(a, b) == agg.merge(b, a))
      assert(agg.merge(a, agg.zero) == a)
      assert(agg.merge(agg.zero, b) == b)
    }
  }

  test("three-way merge associates (the shuffle-tree property)") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 200) {
      val a = gen(rnd, 9).foldLeft(agg.zero)(agg.reduce)
      val b = gen(rnd, 9).map(d => d.copy(doc_id = d.doc_id + 50))
        .foldLeft(agg.zero)(agg.reduce)
      val c = gen(rnd, 9).map(d => d.copy(doc_id = d.doc_id + 200))
        .foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
    }
  }
}
