package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** X2 at the engine level: where the reference polls `COUNT(*)` deltas
  * (`monitor_scraper_progress.py:14-29`), a Spark deployment can also watch
  * the scheduler itself. This listener accumulates task-level IO metrics —
  * records/bytes read, shuffle bytes, task counts — continuously and
  * cheaply (no extra jobs against the data), which is the right monitor
  * shape for a 1000-executor cluster where a monitoring `count()` would be
  * a full scan.
  *
  * Listener events arrive asynchronously on the listener bus; snapshots are
  * therefore eventually consistent — exactly like the reference's
  * 5-minute-cadence monitor, and fine for rate/ETA arithmetic
  * ([[Pipeline.rateAndEta]]).
  */
final class MetricsMonitor extends SparkListener {
  private val tasks = new AtomicLong(0)
  private val recordsRead = new AtomicLong(0)
  private val bytesRead = new AtomicLong(0)
  private val recordsWritten = new AtomicLong(0)
  private val shuffleBytesWritten = new AtomicLong(0)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      tasks.incrementAndGet()
      recordsRead.addAndGet(m.inputMetrics.recordsRead)
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      recordsWritten.addAndGet(m.outputMetrics.recordsWritten)
      shuffleBytesWritten.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  def snapshot: MetricsMonitor.Snapshot = MetricsMonitor.Snapshot(
    tasks.get(), recordsRead.get(), bytesRead.get(),
    recordsWritten.get(), shuffleBytesWritten.get())
}

object MetricsMonitor {
  case class Snapshot(tasks: Long, recordsRead: Long, bytesRead: Long,
                      recordsWritten: Long, shuffleBytesWritten: Long)

  def attach(spark: SparkSession): MetricsMonitor = {
    val m = new MetricsMonitor
    spark.sparkContext.addSparkListener(m)
    m
  }

  def detach(spark: SparkSession, m: MetricsMonitor): Unit =
    spark.sparkContext.removeSparkListener(m)
}
