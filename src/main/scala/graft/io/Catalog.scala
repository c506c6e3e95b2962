package graft.io

import java.io.File

import org.apache.spark.sql.SparkSession

/** Session-catalog helpers for managed tables. */
object Catalog {

  /** Drop a managed table AND its warehouse directory. A fresh session's
    * in-memory catalog doesn't know about tables a previous JVM wrote, but
    * their warehouse directories persist — and `saveAsTable` refuses to
    * reuse an existing location ([LOCATION_ALREADY_EXISTS]). Idempotent
    * re-creation therefore needs both the DROP and the directory cleanup. */
  def dropManaged(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS `$name`")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val whPath = if (wh.startsWith("file:")) new java.net.URI(wh).getPath else wh
    deleteRecursively(new File(whPath, name.toLowerCase))
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}
