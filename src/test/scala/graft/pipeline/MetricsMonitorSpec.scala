package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MetricsMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("listener accumulates task and input metrics for a scan") {
    val m = MetricsMonitor.attach(spark)
    try {
      val n = graft.io.Tables.documents(spark, "/root/testdata/sf0.001").count()
      // listener bus is async — poll until the snapshot stabilizes
      var last = m.snapshot
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val cur = m.snapshot
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      assert(last.tasks > 0)
      assert(last.recordsRead >= n, s"recordsRead=${last.recordsRead} < rows=$n")
      assert(last.bytesRead > 0)
    } finally MetricsMonitor.detach(spark, m)
  }
}
