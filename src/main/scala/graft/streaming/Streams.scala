package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY §1.1/§7: the reference pipeline is
  * logically incremental — new quarters arrive, triggers maintain derived
  * state — which maps to availableNow micro-batches here).
  *
  * Scale design: file-source streams list only NEW files per batch (the
  * 100 TB ingest pattern: land parquet, stream processes increments);
  * windowed aggregation state is bounded by the watermark; sessionization
  * state is per-key and times out. Everything below runs identically on a
  * real cluster — only trigger cadence changes.
  */
object Streams {

  private val nameCounter = new AtomicInteger(0)

  /** availableNow parquet file stream (schema must be known up front —
    * streaming sources don't infer). */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Run a stream to completion (availableNow) into an in-memory table and
    * return it as a batch DataFrame. Memory sink holds the full result on
    * the driver — a verification harness, not a production sink; use
    * [[runToParquet]] for real output. */
  def runToMemory(spark: SparkSession, stream: DataFrame,
                  mode: OutputMode = OutputMode.Append()): DataFrame = {
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Run a stream to completion into a parquet sink with a checkpoint —
    * the production shape: exactly-once via checkpointed file manifests. */
  def runToParquet(stream: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Watermarked hourly rollup — the streaming twin of the batch q20.
    * The watermark bounds state: windows older than max(ts)-delay are
    * finalized and dropped from the store. */
  def hourlyCounts(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"))

  /** Streaming exact dedup on a key projection: dropDuplicates keeps state
    * per distinct tuple (bound it with a watermark column in production). */
  def dedupKeys(stream: DataFrame, cols: Seq[String]): DataFrame =
    stream.select(cols.map(col): _*).dropDuplicates(cols)

  /** F4 trigger-maintenance port in streaming mode: each micro-batch of
    * results MERGEs into a parquet base table by key (last-writer-wins
    * within this batch), batch-atomically via write-to-temp + swap — the
    * local stand-in for a Delta `MERGE INTO` on a real deployment. The
    * derived work queue is whatever anti-joins against the base afterwards,
    * exactly like the batch path (SURVEY §2.7 F4).
    *
    * Restartable: the checkpoint makes each source file process exactly
    * once, and re-merging an already-applied batch is a no-op (same keys,
    * same values), so the swap is idempotent across failures. */
  def incrementalMerge(stream: DataFrame, targetDir: String, keyCol: String,
                       checkpointDir: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val target = new java.io.File(targetDir)
        val merged =
          if (!target.exists() || target.listFiles().forall(_.getName.startsWith("_")))
            batch
          else
            spark.read.parquet(targetDir)
              .join(batch.select(keyCol), Seq(keyCol), "left_anti")
              .unionByName(batch)
        val tmp = targetDir + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val fresh = spark.read.parquet(tmp).cache()
        fresh.count() // materialize before the old files disappear
        fresh.write.mode("overwrite").parquet(targetDir)
        fresh.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  case class Ev(user_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Gap-based sessionization via flatMapGroupsWithState — the custom-state
    * operator the reference's trigger machinery has no analog for. Events
    * are sorted inside each group (micro-batch iterators carry no time
    * order); gap comparison runs at microsecond precision to match the SQL
    * (gaps-and-islands) twin exactly. State times out per key in continuous
    * operation; under availableNow each key arrives in one group call. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    def micros(t: Timestamp): Long = t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) => {
          val ts = evs.map(_.ts).toArray.sortBy(micros)
          if (ts.isEmpty) Iterator.empty
          else {
            val sessions = scala.collection.mutable.ArrayBuffer.empty[Session]
            var start = ts(0); var end = ts(0); var n = 1L
            var i = 1
            while (i < ts.length) {
              if (micros(ts(i)) - micros(end) > gapMicros) {
                sessions += Session(uid, start, end, n)
                start = ts(i); n = 0L
              }
              end = ts(i); n += 1L
              i += 1
            }
            sessions += Session(uid, start, end, n)
            sessions.iterator
          }
        })
  }
}
