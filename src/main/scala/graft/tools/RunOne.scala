package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: run ONE catalog query by name and show its head — fast
  * inner-loop feedback without dumping the whole catalog through Verify.
  *
  * Usage: sbt "runMain graft.tools.RunOne q90_merge_bucketed [sfDir [outParquet]]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.show(10, truncate = false)
    if (args.length > 2) df.write.mode("overwrite").parquet(args(2))
    println(s"ROWS=${df.count()}")
    spark.stop()
  }
}
