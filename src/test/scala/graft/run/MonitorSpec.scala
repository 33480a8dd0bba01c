package graft.run

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** A6 monitoring: observed metrics land in the persisted metrics table. */
class MonitorSpec extends SparkSpec {
  import spark.implicits._

  test("persisting listener appends one metric row per micro-batch") {
    val path = Files.createTempDirectory("metrics").toString + "/log"
    val listener = new Monitor.PersistingListener(spark, path)
    spark.streams.addListener(listener)
    try {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[Long]
      val q = Monitor.observed(input.toDF())
        .writeStream.format("noop").start()
      try {
        input.addData(1L, 2L, 3L)
        q.processAllAvailable()
      } finally q.stop()

      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 20000
      var rows = Seq.empty[Monitor.BatchMetric]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        rows =
          try Monitor.metricsTable(spark, path)
            .as[Monitor.BatchMetric].collect().toSeq
          catch { case _: Exception => Nil }
        if (rows.isEmpty) Thread.sleep(200)
      }
      assert(rows.nonEmpty, "no metric rows persisted")
      assert(rows.exists(_.numEvents == 3L))
    } finally spark.streams.removeListener(listener)
  }

  test("terminal query failure is recorded as an error metric (C6)") {
    val listener = new Monitor.CollectingListener
    spark.streams.addListener(listener)
    try {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[Long]
      val q = input.toDF().writeStream
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new RuntimeException("boom")
        }.start()
      input.addData(1L)
      intercept[Exception] { q.awaitTermination(30000) }

      val deadline = System.currentTimeMillis() + 20000
      def errors = listener.metrics.synchronized(
        listener.metrics.filter(_.error.isDefined).toList)
      while (errors.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(errors.nonEmpty, "no error metric recorded")
      assert(errors.head.error.get.contains("boom"))
    } finally spark.streams.removeListener(listener)
  }
}
