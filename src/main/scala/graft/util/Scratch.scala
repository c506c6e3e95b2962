package graft.util

import java.nio.file.{Files, Path}

/** Temp-directory factory for query-scoped scratch space (stream sources,
  * checkpoints, embedded DB homes, fixture landings). Every directory is
  * registered once for recursive deletion at JVM exit, so repeated
  * Bench/Verify invocations (n runs × ~170 queries) don't accumulate
  * parquet/Derby garbage in /tmp between processes. Deletion is
  * best-effort — a file an embedded engine still holds at shutdown is
  * skipped, not fatal. */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(p => delete(p.toFile))
  }, "graft-scratch-cleanup"))

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete()
    ()
  }

  /** Create a fresh temp directory under java.io.tmpdir, registered for
    * recursive deletion at JVM exit. Returns the absolute path string. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
