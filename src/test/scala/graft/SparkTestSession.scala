package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (cheap to reuse, UTC-pinned),
  * built through the canonical GraftSession factory. */
object SparkTestSession {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("graft-test").getOrCreate()
}
