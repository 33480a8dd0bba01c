package graft.run

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** C5 await semantics: awaitAll must outlive a CLEAN stop of one query —
  * `awaitAnyTermination` alone returns on the first termination of any
  * kind, which would let the caller exit (and the shutdown hook
  * hard-stop) queries that are still consuming.
  */
class LifecycleSpec extends SparkSpec {

  test("awaitAll keeps waiting after one query stops cleanly") {
    // suites run sequentially in the forked test JVM, but belt-and-braces
    // against a leaked query from an earlier suite
    spark.streams.active.foreach(_.stop())
    spark.streams.resetTerminated()
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val in1 = MemoryStream[Long]; val in2 = MemoryStream[Long]
    val q1 = in1.toDF().writeStream.format("noop").start()
    val q2 = in2.toDF().writeStream.format("noop").start()
    val returned = new CountDownLatch(1)
    new Thread(() => { Lifecycle.awaitAll(spark); returned.countDown() }).start()

    q1.stop()
    Thread.sleep(1500)
    assert(returned.getCount == 1, "awaitAll must not return while q2 is live")
    q2.stop()
    assert(returned.await(30, TimeUnit.SECONDS), "awaitAll must return once all stopped")
  }
}
