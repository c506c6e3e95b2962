package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared degenerate-group guard for the candidate-pair generators (LSH band
  * buckets `Dedup.lshCandidatePairs`, hyperplane buckets
  * `Similarity.annCandidatePairs`, IVF cells `Similarity.ivfNearDupPairs`):
  * a group wider than the cap — thousands of identical docs/vectors
  * colliding on every key — would make the within-group self-join O(w²) on
  * one key. Over-cap groups are hash-split into ≈cap-sized salt groups, and
  * head links keep each split group connected for downstream clustering.
  *
  * Hash salt instead of the previous id-ordered `row_number` window: the
  * window guaranteed exact ≤cap group sizes but SORTED the whole dense
  * group on one task — a single-task straggler when one bucket is most of
  * the corpus. `pmod(xxhash64(id), ceil(w/cap))` needs no sort and no
  * window shuffle: group widths are one map-side-combined aggregate, only
  * the OVER-cap groups (≤ corpus/cap rows by construction) are broadcast
  * back, and the salt itself is a map-side hash. The trade: salt-group
  * sizes are ragged (expected ≈cap, not guaranteed — multinomial around
  * w/⌈w/cap⌉), so the per-group pair bound is statistical rather than
  * exact. Groups at or under the cap take salt 0 and NO head links exist
  * for them — downstream output is bit-identical to the unguarded plan.
  */
private[ext] object SaltGuard {

  /** Adds `salt` (int ≥ 0; always 0 for groups at or under the cap) and
    * `over` (boolean: this row's group exceeded the cap) to `df`, grouping
    * by `keys`. One aggregate pass + a broadcast left join — no window, no
    * sort, no shuffle of `df` itself. */
  def hashSalt(df: DataFrame, keys: Seq[String], idCol: String, cap: Int): DataFrame = {
    require(cap > 1, s"salt cap must be > 1: $cap")
    val kc = keys.map(col)
    val overCap = df.groupBy(kc: _*).agg(count(lit(1)).as("w"))
      .filter(col("w") > cap)
      .select(kc :+ ceil(col("w").cast("double") / cap).cast("long").as("n_groups"): _*)
    df.join(broadcast(overCap), keys, "left")
      .withColumn("salt",
        when(col("n_groups").isNull, lit(0))
          .otherwise(pmod(xxhash64(col(idCol)), col("n_groups"))).cast("int"))
      .withColumn("over", col("n_groups").isNotNull)
      .drop("n_groups")
  }

  /** Connectivity links for over-cap groups: (group's global-min id, each
    * OTHER salt group's min id) — `id_a < id_b` by construction. With
    * `vecCol` the per-id payload rides along as `pay_a`/`pay_b` (via
    * `min_by`, so it is exactly the head id's payload).
    *
    * Connectivity caveat (callers score these links through the same
    * threshold filter as real candidate pairs): the split group is
    * guaranteed to stay one component only when its head pairs clear the
    * threshold — always true for the identical-duplicate skew that creates
    * over-cap groups, approximate for mixed-content groups. */
  def headLinks(salted: DataFrame, keys: Seq[String], idCol: String,
                vecCol: Option[String] = None): DataFrame = {
    val kc = keys.map(col)
    val over = salted.filter(col("over"))
    val groupHeads = vecCol match {
      case Some(v) => over.groupBy(kc :+ col("salt"): _*)
        .agg(min(col(idCol)).as("gid"), min_by(col(v), col(idCol)).as("gpay"))
      case None => over.groupBy(kc :+ col("salt"): _*).agg(min(col(idCol)).as("gid"))
    }
    // one row per over-cap group key — broadcast-sized by construction
    val globalHeads = vecCol match {
      case Some(_) => groupHeads.groupBy(kc: _*)
        .agg(min(col("gid")).as("hid"), min_by(col("gpay"), col("gid")).as("hpay"))
      case None => groupHeads.groupBy(kc: _*).agg(min(col("gid")).as("hid"))
    }
    val linked = groupHeads.join(broadcast(globalHeads), keys)
      .filter(col("gid") =!= col("hid"))
    vecCol match {
      case Some(_) => linked.select(col("hid").as("id_a"), col("gid").as("id_b"),
        col("hpay").as("pay_a"), col("gpay").as("pay_b"))
      case None => linked.select(col("hid").as("id_a"), col("gid").as("id_b"))
    }
  }
}
