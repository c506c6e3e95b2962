package graft.io

import org.apache.spark.sql.SparkSession

/** Session-catalog helpers for managed tables. */
object Catalog {

  /** Drop a managed table AND its warehouse directory. A fresh session's
    * in-memory catalog doesn't know about tables a previous JVM wrote, but
    * their warehouse directories persist — and `saveAsTable` refuses to
    * reuse an existing location ([LOCATION_ALREADY_EXISTS]). Idempotent
    * re-creation therefore needs both the DROP and the directory cleanup.
    * Hadoop FS, not java.io.File: a warehouse on hdfs://s3a:// would make
    * a local-File delete a silent no-op and the re-create would still
    * fail with LOCATION_ALREADY_EXISTS. */
  def dropManaged(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS `$name`")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val dir = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    val fs = dir.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(dir)) { fs.delete(dir, true); () }
  }
}
