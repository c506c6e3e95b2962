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
  /** `events.ts` is adversarial input: the testdata generator has shipped it
    * both as parquet TIMESTAMP(NANOS) (which Spark 4 rejects outright with
    * [PARQUET_TYPE_ILLEGAL] unless `nanosAsLong` surfaces it as an epoch-nanos
    * long) and as plain TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark
    * reads natively as TIMESTAMP_NTZ). Dispatch on the schema Spark actually
    * sees rather than betting on one on-disk shape:
    *
    *  - `LongType` → the nanos-as-long read; floor-convert to microseconds,
    *    the same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP,
    *    so oracles stay bit-identical. Requires the `nanosAsLong` flag, set
    *    once at session construction (`GraftSession`) — this loader
    *    deliberately does NOT set it itself: the flag changes how every later
    *    nanos-parquet read in the session behaves, so flipping it as a
    *    table-load side effect would be a silent session-wide mutation.
    *  - `TimestampType` → already the engine contract; pass through.
    *  - `TimestampNTZType` → cast to the session timestamp type. The session
    *    timezone is pinned to UTC (`GraftSession`), so the cast is
    *    wall-clock-preserving and matches DuckDB's naive-timestamp oracle. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
          "Tables.events read ts as LongType without spark.sql.legacy.parquet.nanosAsLong=true; " +
            "build the session via graft.GraftSession")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"Tables.events: unsupported on-disk type for ts: $other " +
          "(expected int64 nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")

  /** `embeddings.embedding` is the engine contract `array<float>`; the
    * generator currently writes float32 lists, but the events episode
    * (see [[events]]) showed on-disk schema is adversarial input — if the
    * column ever arrives as `array<double>` (numpy float64 default), every
    * similarity/ANN query would silently change numerics instead of
    * failing loud. Normalize at the loader: cast list-of-floating to
    * array<float>, reject anything else. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val raw = apply(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _)  => raw
      case ArrayType(DoubleType, _) =>
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other => throw new IllegalArgumentException(
        s"Tables.embeddings: unsupported on-disk type for embedding: $other " +
          "(expected array<float> or array<double>)")
    }
  }
}
