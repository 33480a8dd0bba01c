package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Lifecycle management (reference operators C2 graceful shutdown, C5
  * multi-source concurrency).
  *
  * The reference installs SIGINT/SIGTERM handlers that drain the current
  * buffer before exiting (synch/replication/continuous.py:20-38); here a
  * JVM shutdown hook stops every active query. `StreamingQuery.stop()`
  * INTERRUPTS the execution thread — an in-flight micro-batch does NOT
  * drain and its checkpoint does not commit, so restart REPLAYS that
  * batch from the last committed offset. End-to-end semantics therefore
  * rest on replay-safe sinks, which every sink here is: the parquet state
  * store is batch-id idempotent, the Redis producer XADDs under explicit
  * replay-stable ids, and the file sink overwrites per-batch output.
  * A side-effecting custom sink without one of those properties gets
  * at-least-once on shutdown. Multiple sources (C5) are just multiple
  * concurrent queries awaited together — genuinely parallel, unlike the
  * reference's serialized thread join (postgres.py:163-164, a documented
  * quirk).
  */
object Lifecycle {

  /** Install a stop-all shutdown hook for the given queries (see the
    * object doc for the replay contract this relies on). */
  def withGracefulShutdown(queries: Seq[StreamingQuery]): Seq[StreamingQuery] = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      queries.foreach { q =>
        try if (q.isActive) q.stop()
        catch { case _: Exception => () }
      }))
    queries
  }

  /** Await ALL active queries: a failure propagates (its
    * StreamingQueryException rethrows), a clean stop of one query keeps
    * awaiting the others. `awaitAnyTermination` alone returns on the
    * FIRST termination — including a clean stop — which would let the
    * caller exit (and the shutdown hook hard-stop) surviving queries.
    * Deliberately NO `resetTerminated`: a failure landing between an
    * await return and a reset would be cleared and never rethrown; by
    * never resetting, a recorded failure throws on the next await call.
    * Consequence: after HANDLING a failure thrown from here, a
    * supervisor that restarts queries in the same session must call
    * `spark.streams.resetTerminated()` itself before re-awaiting — the
    * stale failure would otherwise rethrow immediately. After the first
    * clean stop each timed await returns immediately, so the loop paces
    * itself with a short sleep — a CLI await, not a hot path. */
  def awaitAll(spark: SparkSession): Unit = {
    while (spark.streams.active.nonEmpty) {
      spark.streams.awaitAnyTermination(500L) // throws on any failed query
      if (spark.streams.active.nonEmpty) Thread.sleep(200L)
    }
    // a failure recorded BEFORE entry (the last query died first) or in
    // the final loop window leaves active empty — the loop body never
    // sees it, so check once more after the loop
    spark.streams.awaitAnyTermination(1L)
    ()
  }
}
