package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal multi-versioned parquet "table" used as the local stand-in for a
  * transactional sink (Delta/Iceberg/JDBC in production). Each commit
  * writes a fresh `v=<n>` directory and readers always see the highest
  * complete version — Spark cannot overwrite a directory it is currently
  * reading, and a plain overwrite is not atomic; version directories give
  * snapshot isolation with O(1) metadata.
  *
  * Also the idempotence point for streaming: `commit(batchId)` is a no-op
  * if that batch id was already committed, which upgrades foreachBatch's
  * at-least-once replay to effectively-once (reference's analogue:
  * broker.commit after flush, synch/replication/continuous.py:163).
  */
final class ParquetStateStore(spark: SparkSession, root: String) {
  private val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions: Seq[(Long, Path)] = {
    val dir = new Path(root)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => (s.getPath.getName.stripPrefix("v=").toLong, s.getPath))
      .sortBy(_._1)
  }

  def latestVersion: Option[Long] = versions.lastOption.map(_._1)

  def isEmpty: Boolean = versions.isEmpty

  def read(): Option[DataFrame] =
    versions.lastOption.map { case (_, p) => spark.read.parquet(p.toString) }

  /** Write `df` as the next version; returns the committed version. */
  def write(df: DataFrame, batchId: Option[Long] = None): Long = {
    val next = batchId.getOrElse(latestVersion.getOrElse(-1L) + 1L)
    if (latestVersion.exists(_ >= next)) next // replay of a committed batch: no-op
    else {
      df.write.mode(SaveMode.Overwrite).parquet(s"$root/v=$next")
      next
    }
  }

  /** Append-only log flavor: one subdir per batch, read() unions all. */
  def append(df: DataFrame, batchId: Long): Unit = {
    val p = new Path(s"$root/v=$batchId")
    if (!fs.exists(p)) df.write.mode(SaveMode.ErrorIfExists).parquet(p.toString)
  }

  def readLog(): Option[DataFrame] =
    if (versions.isEmpty) None else Some(spark.read.parquet(s"$root/v=*"))

  /** Drop versions with id > `batchId` — the state-side half of a resume
    * rewind ([[graft.run.Resume]]): batch-id idempotence would otherwise
    * skip the replayed batches.
    */
  def truncateAfter(batchId: Long): Unit =
    versions.filter(_._1 > batchId).foreach { case (_, p) => fs.delete(p, true) }

  /** Compact the append-only log: materialize `resolved` as the single
    * surviving version (keeping the latest version number so batch-id
    * idempotence still holds) and drop the per-batch deltas. The engine
    * analogue of ClickHouse's background merge / OPTIMIZE: read-time
    * resolution cost stays O(base + recent deltas) instead of O(history).
    *
    * Correctness relies on the resolve functions being idempotent over
    * their own output (resolved rows keep pk/version/sign columns), which
    * [[SinkStrategy]] guarantees and ConsumeSpec asserts.
    */
  def compact(resolved: DataFrame): Unit = {
    val keep = latestVersion.getOrElse(0L)
    val tmp = new Path(s"$root/.compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    resolved.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    versions.foreach { case (_, p) => fs.delete(p, true) }
    fs.rename(tmp, new Path(s"$root/v=$keep"))
  }
}
