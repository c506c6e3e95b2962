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
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
