package graft.ext

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed, MERGEABLE
  * Spark `Aggregator` — the frequency twin of the q140 HLL contract. Each
  * task folds its tokens into a `Depth × Width` counter grid map-side;
  * partial grids merge by elementwise addition (the sketch's defining
  * property), so the only data movement is `Depth·Width·8` bytes per task
  * regardless of corpus size. At 100 TB the grids persist per shard/day and
  * any ad-hoc frequency rollup is a union over kilobytes — rows are never
  * re-read.
  *
  * Guarantee: `estimate ≥ true` always (hash collisions only add), and
  * `estimate ≤ true + (e/Width)·N` with probability `1 − e^−Depth` per
  * query. Both sides of that contract are measured in-query by q148.
  */
object CountMin {
  val Depth = 4
  val Width = 8192

  /** ε = e/Width: the standard CMS additive-error factor. */
  val Eps: Double = math.E / Width

  /** Row-seeded Murmur3 bucket — deterministic across JVMs/executors. */
  def bucket(tok: String, row: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c + row), Width)

  class SketchAgg extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](Depth * Width)
    def reduce(b: Array[Long], tok: String): Array[Long] = {
      var j = 0
      while (j < Depth) { b(j * Width + bucket(tok, j)) += 1; j += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Point estimate: min over the Depth row counters (upper-bounds truth). */
  def estimate(sk: IndexedSeq[Long], tok: String): Long = {
    var m = Long.MaxValue
    var j = 0
    while (j < Depth) { m = math.min(m, sk(j * Width + bucket(tok, j))); j += 1 }
    m
  }

  /** Sketch INNER PRODUCT (Cormode & Muthukrishnan §4.2): min over rows of
    * Σ_i a[r,i]·b[r,i] — a provable OVERESTIMATE of Σ_v f_A(v)·f_B(v),
    * i.e. of the equi-join cardinality |A ⋈ B| when the sketches count
    * join keys. This is the classic sketch-based join-size estimator: two
    * O(1)-memory sketches built in one pass per side replace the key-level
    * frequency join a planner cannot afford at 100 TB.
    * Overflow headroom: each row term ≤ N_A·N_B, so longs hold to ~3e9
    * rows per side. */
  def innerProduct(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < Depth) {
      var s = 0L
      var i = 0
      while (i < Width) { s += a(r * Width + i) * b(r * Width + i); i += 1 }
      if (s < best) best = s
      r += 1
    }
    best
  }
}
