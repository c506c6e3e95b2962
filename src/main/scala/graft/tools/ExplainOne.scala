package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: print the formatted physical plan of ONE catalog query —
  * the `.explain("formatted")` audit loop without running the query.
  *
  * Usage: sbt "runMain graft.tools.ExplainOne q95_corpus_pipeline [sfDir]"
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
