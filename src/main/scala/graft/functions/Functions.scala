package graft.functions

import org.apache.spark.sql.SparkSession

import graft.text.Porter

/** SQL-surface registration (EP4 parity: `spark.sql` over registered tables
  * + engine functions — SURVEY §3 EP4). Idempotent per session. */
object Functions {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfkd", exprs => NfkdNormalize(exprs.head), "scala_udf")
    spark.udf.register("graft_stem", (s: String) => if (s == null) null else Porter.stem(s))
  }
}
