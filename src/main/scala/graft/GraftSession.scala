package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory — every entry point (Verify / Bench / Smoke /
  * tests) builds its session here so behavior-changing config lives in ONE
  * visible place instead of being mutated mid-query by table loaders.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` is required by `Tables.events`
  * (the testdata writes parquet TIMESTAMP(NANOS), which Spark 4 otherwise
  * rejects with [PARQUET_TYPE_ILLEGAL]); setting it at construction makes
  * the nanos-as-long read behavior a session-wide, documented contract.
  *
  * Cluster sizing (the knobs that change when leaving local mode — AQE is
  * on by default in Spark 4 and handles the runtime side):
  *  - `spark.sql.shuffle.partitions`: here = cores; on a cluster start at
  *    2-3× total executor cores and let AQE coalesce — every groupBy/join
  *    in the catalog shuffles at this width.
  *  - `spark.sql.files.maxPartitionBytes` (default 128m): bounds per-task
  *    scan input so a task's working set fits executor memory; the text/
  *    near-dup map stages are CPU-dense, so SMALLER (64m) splits improve
  *    balance there.
  *  - `spark.sql.autoBroadcastJoinThreshold`: the dimension tables the
  *    catalog broadcasts are ≤ a few MB at any sf; computed join sides
  *    have no stats, which is why operators place `broadcast()` hints
  *    explicitly rather than relying on this threshold.
  *  - `spark.sql.adaptive.skewJoin.enabled` (default true) handles runtime
  *    skew; `ops.SkewJoin` is the static fallback for known-hot keys.
  *  - streaming state: default HDFS-backed store is fine to ~1e7 keys per
  *    partition; switch `spark.sql.streaming.stateStore.providerClass` to
  *    RocksDB for larger keyed state (dedup/sessionization at 100 TB).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE coalescing (parallelismFirst, the default) floors post-shuffle
      // partitions at minPartitionSize=1m, which serializes CPU-DENSE
      // stages whose bytes are small relative to their compute (stemming /
      // tokenize / trigram / marker scans: profiled single-task at 32
      // cores — byte-based coalescing cannot see compute density, guide
      // §2.2/§2.5). 16k keeps such stages parallel at max(total/cores,
      // 16k) while leaving large-data coalescing (total/cores ≫ 1m)
      // completely unchanged — the knob only binds when a stage's bytes
      // are tiny, at ANY cluster size.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the engine's own extensions: native-function SQL registration +
      // the CollapseNfkd optimizer rule (idempotence collapse)
      .withExtensions(new GraftExtensions)

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
