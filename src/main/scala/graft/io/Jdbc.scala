package graft.io

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink wrappers (SURVEY §2.1 S6/S7/S10).
  *
  * Reads push column pruning + predicates into the database (Catalyst JDBC
  * pushdown); writes batch at `batchsize` rows per INSERT exactly like the
  * reference's `to_sql(chunksize=...)` (`load_filings_idx.py:51`), with
  * `numPartitions` capping sink-side connections (the reference's
  * max_connections=400 concern).
  */
object Jdbc {

  /** S6: table read with column pruning (prune via .select — pushed down). */
  def readTable(spark: SparkSession, url: String, table: String,
                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S7: chunked append write. */
  def writeAppend(df: DataFrame, url: String, table: String,
                  batchSize: Int = 10000, numPartitions: Int = 8): DataFrame = {
    df.coalesce(numPartitions)
      .write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, new Properties())
    df
  }

  /** S10: batched point-UPDATE by key — the trigger-free port of
    * `filings.update().where(filing_id==id)` (`scrape_all_filings.py:169-171`).
    * One prepared statement per partition, executeBatch per `batchSize` —
    * distributed, idempotent (same update re-applied is a no-op). */
  def updateByKey(df: DataFrame, url: String, table: String,
                  keyCol: String, valueCols: Seq[String],
                  batchSize: Int = 1000): Unit = {
    // Spark's JDBC writer quotes COLUMN names (case-preserved) but passes the
    // table name through unquoted — mirror that here or refs case-fold apart.
    def q(id: String) = "\"" + id + "\""
    val sets = valueCols.map(c => s"${q(c)} = ?").mkString(", ")
    val sql = s"UPDATE $table SET $sets WHERE ${q(keyCol)} = ?"
    val cols = valueCols :+ keyCol
    val projected = df.selectExpr(cols: _*)
    projected.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          cols.zipWithIndex.foreach { case (_, i) => st.setObject(i + 1, r.get(i)) }
          st.addBatch()
          n += 1
          if (n % batchSize == 0) st.executeBatch()
        }
        st.executeBatch()
        st.close()
      } finally conn.close()
    }
  }
}
