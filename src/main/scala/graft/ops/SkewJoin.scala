package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting — the manual fallback when AQE's
  * skew-join split isn't available or the skew is known up front (SURVEY §4;
  * the "salting for skew" 100 TB mandate).
  *
  * The hot-side rows get a uniform random salt in [0, salts); the build side
  * is replicated once per salt value; the join key becomes (key, salt). A
  * key that would land 10⁹ rows in ONE shuffle partition now spreads across
  * `salts` partitions at the cost of replicating the (small) build side.
  * The result multiset is identical to the unsalted join — salting only
  * changes data placement, which is why the oracle for a salted query is
  * the plain SQL join.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, salting the (skewed) left.
    * `right` must be the smaller side — it is replicated `salts`×. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      salts: Int = 16, seed: Long = 42L): DataFrame = {
    val saltedLeft = left.withColumn("graft_salt",
      (rand(seed) * salts).cast("int"))
    val replicatedRight = right.withColumn("graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "graft_salt"), "inner")
      .drop("graft_salt")
  }
}
