package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and resolve tables through here so
  * the same code runs at any scale factor — and, on a real cluster, against
  * any parquet root (s3://, hdfs://) without code changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a nanos-epoch long and floor-convert
    * to a microsecond timestamp — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS → TIMESTAMP, so oracles stay bit-identical.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set once at
    * session construction (`GraftSession`) — this loader deliberately does
    * NOT set it itself: the flag changes how every later nanos-parquet read
    * in the session behaves, so flipping it as a table-load side effect
    * would be a silent session-wide mutation. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "Tables.events needs spark.sql.legacy.parquet.nanosAsLong=true; " +
        "build the session via graft.GraftSession (events.parquet is TIMESTAMP(NANOS))")
    val raw = apply(s, d, "events")
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
