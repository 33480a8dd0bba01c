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

  test("awaitAll rethrows a query failure even after another query stopped cleanly") {
    // the race the no-reset design closes: with resetTerminated between
    // awaits, a failure landing in that window was cleared and never
    // rethrown — the caller exited thinking the pipeline succeeded
    spark.streams.active.foreach(_.stop())
    spark.streams.resetTerminated()
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ok = MemoryStream[Long]
    val bad = MemoryStream[Long]
    val q1 = ok.toDF().writeStream.format("noop").start()
    val q2 = bad.toDF()
      .select(assert_true(col("value") < 100L).as("x"))
      .writeStream.format("noop").start()
    q1.stop() // clean stop first
    bad.addData(500L) // then the poison row
    val thrown = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try Lifecycle.awaitAll(spark)
      catch { case e: Throwable => thrown.set(e) })
    t.start(); t.join(30000)
    assert(!t.isAlive, "awaitAll must have returned")
    assert(thrown.get != null, "the q2 failure must rethrow out of awaitAll")
    spark.streams.resetTerminated() // don't poison later suites
  }
}
