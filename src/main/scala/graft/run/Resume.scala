package graft.run

import graft.sink.ParquetStateStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Consumer resume override — the analogue of the reference's
  * `synch consume --last-msg-id` (synch/cli.py:61-65), which restarts a
  * consumer group at an arbitrary broker offset.
  *
  * A Structured Streaming checkpoint stores one entry per micro-batch in
  * `offsets/<batchId>` (planned) and `commits/<batchId>` (finished).
  * Dropping both past a target batch makes the next start re-plan batch
  * `lastBatchId + 1` from the retained source offsets — i.e. replay
  * everything after `lastBatchId`. [[rewind]] also truncates the
  * engine's state-store versions past the same batch, so the replayed
  * batches re-apply instead of being skipped by batch-id idempotence.
  */
object Resume {

  /** Drop checkpoint entries with batch id > `lastBatchId`. Returns the
    * deleted paths (for operator visibility/logging). */
  def seekTo(spark: SparkSession, checkpoint: String, lastBatchId: Long): Seq[String] = {
    val fs = new Path(checkpoint).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("offsets", "commits").flatMap { sub =>
      val dir = new Path(checkpoint, sub)
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq
        .filter { s =>
          val name = s.getPath.getName
          name.forall(_.isDigit) && name.toLong > lastBatchId
        }
        .map { s => fs.delete(s.getPath, false); s.getPath.toString }
    }
  }

  /** Full rewind: checkpoint seek + state truncation for every table, so
    * a restarted [[Consume.start]] replays batches > `lastBatchId` from
    * the broker and re-applies them to the stores.
    */
  def rewind(spark: SparkSession, checkpoint: String, stateRoot: String,
             tables: Seq[TableSync], lastBatchId: Long): Seq[String] = {
    val removed = seekTo(spark, checkpoint, lastBatchId)
    tables.foreach { t =>
      new ParquetStateStore(spark, s"$stateRoot/${t.schema}/${t.table}")
        .truncateAfter(lastBatchId)
    }
    removed
  }
}
