package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def z(x: Long, y: Long, bits: Int = 16): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Relational.zOrderValue($"x", $"y", bits).as("z"))
      .head().getLong(0)

  test("zOrderValue: interleaves x into even bits, y into odd bits") {
    // x=0b11, y=0b01 -> z bits: x0@0=1, y0@1=1, x1@2=1, y1@3=0 -> 0b0111
    assert(z(3L, 1L) == 7L)
    assert(z(0L, 0L) == 0L)
    // pure-x and pure-y occupy disjoint bit sets
    assert(z(0xFFFFL, 0L) == 0x55555555L)
    assert(z(0L, 0xFFFFL) == 0xAAAAAAAAL)
    // recombining is a plain OR of the two
    assert(z(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // locality: incrementing x by 1 moves z less than incrementing the
    // high bit does — the property range-bucketing by z relies on
    assert(math.abs(z(5L, 9L) - z(6L, 9L)) < math.abs(z(5L, 9L) - z(5L + 32768L, 9L)))
  }

  test("zOrderValue agrees with a reference software interleave on a grid") {
    def ref(x: Long, y: Long): Long = {
      var out = 0L
      for (i <- 0 until 16)
        out |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      out
    }
    val grid = for (x <- Seq(0L, 1L, 2L, 255L, 256L, 65535L);
                    y <- Seq(0L, 1L, 3L, 100L, 32767L, 65535L)) yield (x, y)
    val got = grid.toDF("x", "y")
      .select($"x", $"y", Relational.zOrderValue($"x", $"y", 16).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (x, y) => assert(got((x, y)) == ref(x, y), s"($x,$y)") }
  }
}
