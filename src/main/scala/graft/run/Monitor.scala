package graft.run

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable

/** Throughput monitoring (reference operator A6: producer/consumer counters
  * flushed to a `synch.log` table every interval — synch/reader/
  * __init__.py:73-86, synch/factory.py:129-151).
  *
  * Spark-native shape: `df.observe` metrics evaluated inside the stream
  * (no extra action) + a [[StreamingQueryListener]] that collects one row
  * per micro-batch. Rows carry (query, batch, events, wall-clock) — the
  * same information as the reference's monitoring rows (type 1=producer,
  * 2=consumer).
  */
object Monitor {

  final case class BatchMetric(queryName: String, batchId: Long,
                               numEvents: Long, timestampMs: Long)

  /** Attach an observation named `graft_monitor` counting events. */
  def observed(df: DataFrame): DataFrame =
    df.observe("graft_monitor", count(lit(1)).as("events"))

  /** Collects per-batch metrics in memory; production deployments would
    * append them to a metrics table instead. */
  final class CollectingListener extends StreamingQueryListener {
    val metrics: mutable.Buffer[BatchMetric] = mutable.Buffer.empty

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val observed = Option(p.observedMetrics.get("graft_monitor"))
      val events = observed.map(_.getAs[Long]("events"))
        .getOrElse(p.numInputRows)
      metrics.synchronized {
        metrics += BatchMetric(Option(p.name).getOrElse(p.id.toString),
          p.batchId, events, System.currentTimeMillis())
      }
    }
  }
}
