package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Lifecycle management (reference operators C2 graceful shutdown, C5
  * multi-source concurrency).
  *
  * The reference installs SIGINT/SIGTERM handlers that drain the current
  * buffer before exiting (synch/replication/continuous.py:20-38); here a
  * JVM shutdown hook stops every active query, which lets the in-flight
  * micro-batch finish and the checkpoint commit — restart resumes exactly
  * after it. Multiple sources (C5) are just multiple concurrent queries
  * awaited together — genuinely parallel, unlike the reference's
  * serialized thread join (postgres.py:163-164, a documented quirk).
  */
object Lifecycle {

  /** Install a drain-then-stop shutdown hook for the given queries. */
  def withGracefulShutdown(queries: Seq[StreamingQuery]): Seq[StreamingQuery] = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      queries.foreach { q =>
        try if (q.isActive) q.stop()
        catch { case _: Exception => () }
      }))
    queries
  }

  /** Await all queries; returns when any terminates (with error) or all
    * finish. */
  def awaitAll(spark: SparkSession): Unit =
    spark.streams.awaitAnyTermination()
}
