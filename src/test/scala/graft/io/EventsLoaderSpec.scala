package graft.io

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The on-disk schema of `events.ts` is adversarial input: the testdata
  * generator has shipped it as parquet TIMESTAMP(NANOS) (surfaced to Spark as
  * an epoch-nanos long under `nanosAsLong`) and later as plain
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaced as TIMESTAMP_NTZ).
  * `Tables.events` must read every shape it has ever had — identically. */
class EventsLoaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** micro-second epoch values, deliberately including a sub-millisecond part
    * so the nanos floor-division path is exercised non-trivially. */
  private val micros = Seq(1700000000000001L, 1700000086400500L, 1700086400123456L)

  private def writeShape(shape: String): String = {
    val dir = Files.createTempDirectory(s"events-$shape").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events.parquet"
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, s"type$i", i.toDouble, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs = shape match {
      // how nanosAsLong surfaces TIMESTAMP(NANOS): an epoch-nanos int64
      case "long_nanos" => base.withColumn("ts", col("us") * lit(1000L))
      case "timestamp"  => base.withColumn("ts", timestamp_micros(col("us")))
      case "ntz"        => base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(path)
    dir.getAbsolutePath
  }

  private def readRows(dir: String): Seq[Row] =
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type")
      .orderBy("event_id").collect().toSeq

  test("Tables.events reads long-nanos, native-timestamp, and NTZ shapes identically") {
    val shapes = Seq("long_nanos", "timestamp", "ntz").map(s => s -> readRows(writeShape(s))).toMap
    for (s <- shapes.keys) {
      val ts = Tables.events(spark, writeShape(s)).schema("ts").dataType
      assert(ts == TimestampType, s"shape $s must surface ts as TimestampType, got $ts")
    }
    assert(shapes("long_nanos") == shapes("timestamp"),
      "nanos-long shape must decode to the same rows as native timestamp")
    assert(shapes("ntz") == shapes("timestamp"),
      "NTZ shape must decode to the same rows as native timestamp (UTC session)")
  }

  test("Tables.embeddings normalizes array<double> to the array<float> contract") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("emb-f64").toFile
    dir.deleteOnExit()
    Seq((1L, Seq(0.25, -1.5, 3.0), 0), (2L, Seq(0.5, 0.75, -2.0), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    val got = Tables.embeddings(spark, dir.getAbsolutePath)
    assert(got.schema("embedding").dataType == ArrayType(FloatType),
      "double lists must cast down to the float contract")
    val r = got.orderBy("vec_id").collect()
    assert(r(0).getSeq[Float](1) == Seq(0.25f, -1.5f, 3.0f))
  }

  test("Tables.events rejects an unreadable ts type with a clear error") {
    val dir = Files.createTempDirectory("events-bad").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events.parquet"
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir.getAbsolutePath))
    assert(e.getMessage.contains("unsupported on-disk type"))
  }
}
