package graft.run

import graft.ops.CdcOps
import graft.streaming.EventSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The produce leg (reference `synch produce`, §3.2): ingest a raw CDC
  * feed, normalize to canonical ChangeEvents, apply the producer-side
  * filters, and route to the broker partitioned per schema (X1).
  *
  * The reference tails a binlog in-process; Spark-natively the capture
  * agent (Debezium or similar) lands raw events on a topic/directory and
  * this query normalizes + routes. Producer position persistence
  * (synch/redis_mixin.py:46-82) is replaced by the checkpoint.
  */
object Produce {

  /** Normalize + filter a raw canonical-JSON stream (T2/T3 pushdown
    * happens here, before the broker, exactly like the reference's
    * producer-side only_schemas/only_tables/skip_dmls).
    */
  def normalize(raw: DataFrame,
                schemas: Seq[String] = Nil, tables: Seq[String] = Nil,
                skipDmls: Set[String] = Set.empty,
                skipDeleteTables: Set[String] = Set.empty,
                skipUpdateTables: Set[String] = Set.empty): DataFrame =
    CdcOps.filterDml(
      CdcOps.filterTables(raw, schemas, tables),
      skipDmls, skipDeleteTables, skipUpdateTables)

  /** Start producing to a Kafka broker, keyed by schema so each schema is
    * one ordered partition stream (X1, synch/broker/kafka.py:32-38).
    */
  def toKafka(spark: SparkSession, events: DataFrame, bootstrap: String,
              topic: String, checkpoint: String,
              triggerInterval: String = "1 second"): StreamingQuery =
    events.select(col("schema").cast("string").as("key"),
        to_json(struct(col("schema"), col("table"), col("action"), col("values"),
          col("event_unixtime"), col("action_seq"))).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()

  /** Hermetic broker stand-in: JSON files partitioned by schema — same
    * routing contract (one directory per schema, FIFO within). */
  def toFiles(spark: SparkSession, events: DataFrame, dir: String,
              checkpoint: String,
              triggerInterval: String = "1 second"): StreamingQuery =
    events.select(col("schema"), to_json(struct(
        col("schema"), col("table"), col("action"), col("values"),
        col("event_unixtime"), col("action_seq"))).as("value"))
      .writeStream
      .format("text")
      .partitionBy("schema")
      .option("path", dir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
}
