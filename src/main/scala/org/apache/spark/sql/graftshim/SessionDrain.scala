package org.apache.spark.sql.graftshim

import org.apache.spark.MapOutputTrackerMaster
import org.apache.spark.SparkContext
import org.apache.spark.storage.BroadcastBlockId

/** Bridge into `private[spark]` cleanup APIs so a long-lived benchmark
  * session can drain accumulated shuffle/broadcast state *between* queries
  * instead of waiting for the GC-driven ContextCleaner.
  *
  * Why this exists: ContextCleaner only learns that a shuffle or broadcast
  * is dead when driver GC enqueues its weak reference — and under a large
  * heap (48 GiB at sf10) full GCs are rare, so a 129-query run accumulates
  * tens of GiB of shuffle files and broadcast blocks. Measured effect
  * (BENCH_sf10_adjudication.json, round 8): late-run queries inflate
  * 1.3-2.4x versus isolated re-runs of the identical plan. Draining
  * explicitly between queries removes the inflation at the source, so a
  * full run needs no isolated-re-run adjudication.
  *
  * Safety: called only between queries, when no job is running. Shuffles of
  * a completed query are never re-read (every bench iteration rebuilds the
  * DataFrame, so even reused-exchange plans re-execute from scratch), and
  * broadcasts (join small sides + per-stage task binaries) are re-created
  * per execution. Cleanup is idempotent — the cleaner's own pass later
  * finds nothing left to do.
  */
object SessionDrain {
  /** Number of shuffles currently registered with the driver's map-output
    * tracker — the observable drain contract (SessionDrainSpec). */
  def registeredShuffles(sc: SparkContext): Int =
    sc.env.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
      .shuffleStatuses.size

  def drain(sc: SparkContext): Unit = {
    val tracker = sc.env.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    val shuffles = tracker.shuffleStatuses.keySet.toSeq
    sc.cleaner.foreach { c =>
      shuffles.foreach(id => c.doCleanupShuffle(id, blocking = true))
    }
    val bcasts = sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId], askStorageEndpoints = true)
      .collect { case b: BroadcastBlockId => b.broadcastId }.distinct
    sc.cleaner.foreach { c =>
      bcasts.foreach(id => c.doCleanupBroadcast(id, blocking = true))
    }
    // Deliberately NO System.gc() here: both heavy state classes (shuffle
    // files, broadcast blocks) are removed explicitly above, and an
    // explicit full GC makes G1 uncommit heap pages that the next query
    // immediately re-faults in — measured 1.3-4x on early sf10 bench
    // entries under a default (small) -Xms. Leftover weak-ref debris
    // (accumulators, dropped RDD refs) is tiny and waits for organic GC.
  }
}
