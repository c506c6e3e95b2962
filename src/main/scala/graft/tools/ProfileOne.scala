package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool: run ONE catalog query under a job-granular listener and print
  * where the wall-clock goes — one line per Spark job (call site, duration,
  * task count, task-time sum, shuffle bytes) plus the gaps BETWEEN jobs
  * (driver-side planning / filesystem work), which the per-job rows cannot
  * show but which dominate multi-action maintenance queries.
  *
  * Usage: sbt "runMain graft.tools.ProfileOne q120_upsert_index [sfDir [runs]]"
  */
object ProfileOne {
  case class JobRow(id: Int, callSite: String, submitted: Long, finished: Long,
                    nTasks: Int, taskMs: Long, shuffleBytes: Long)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val rows = mutable.Map[Int, JobRow]()
    val stageToJob = mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = rows.synchronized {
        val cs = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        rows(e.jobId) = JobRow(e.jobId, cs, e.time, -1, 0, 0, 0)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = rows.synchronized {
        rows.get(e.jobId).foreach(r => rows(e.jobId) = r.copy(finished = e.time))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = rows.synchronized {
        stageToJob.get(e.stageId).flatMap(rows.get).foreach { r =>
          val m = e.taskMetrics
          val extra = if (m != null)
            (m.executorRunTime, m.shuffleWriteMetrics.bytesWritten) else (0L, 0L)
          rows(r.id) = r.copy(nTasks = r.nTasks + 1,
            taskMs = r.taskMs + extra._1, shuffleBytes = r.shuffleBytes + extra._2)
        }
      }
    })

    // same warm-up as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.io.Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    try graft.io.Tables.events(spark, sfDir).limit(1).count()
    catch { case _: Throwable => () }
    spark.range(1).select(graft.text.TextOps.tokenize(
      org.apache.spark.sql.functions.lit("warm"))).collect()

    (1 to runs).foreach { runNo =>
      rows.synchronized { rows.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      org.apache.spark.graftmetrics.ListenerDrain.drain(spark.sparkContext)
      val sorted = rows.synchronized { rows.values.toSeq.sortBy(_.submitted) }
      println(f"%n=== $name run $runNo: wall ${wall}%.2f s, ${sorted.size} jobs ===")
      var prevEnd = -1L
      var jobSum = 0L; var gapSum = 0L
      sorted.foreach { r =>
        val dur = r.finished - r.submitted
        val gap = if (prevEnd < 0) 0 else (r.submitted - prevEnd).max(0)
        if (prevEnd >= 0) gapSum += gap
        jobSum += dur
        println(f"  job ${r.id}%3d  +${gap}%5d ms gap | ${dur}%6d ms  " +
          f"tasks=${r.nTasks}%3d taskSum=${r.taskMs}%6d ms shuf=${r.shuffleBytes / 1024}%6d KB  ${r.callSite}")
        prevEnd = r.finished
      }
      println(f"  jobs total ${jobSum} ms, inter-job gaps ${gapSum} ms, " +
        f"outside-jobs ${(wall * 1000).toLong - jobSum - gapSum} ms")
    }
    spark.stop()
  }
}
