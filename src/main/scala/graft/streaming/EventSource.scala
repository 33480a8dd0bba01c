package graft.streaming

import graft.model.ChangeEvent
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical ChangeEvent stream sources (reference operators S1/S2/S4).
  *
  * The reference tails a MySQL binlog / Postgres WAL and forwards events
  * through Redis/Kafka (synch/reader/mysql.py:128-223, synch/broker). In a
  * Spark-native engine the broker leg IS the source: a Kafka topic (or, in
  * tests and air-gapped runs, a directory of JSON event files) carrying
  * one serialized ChangeEvent per record. Offsets/positions are owned by
  * Structured Streaming checkpoints — no hand-rolled Redis offset store.
  */
object EventSource {

  /** Kafka-fronted CDC stream (production path; needs the Kafka connector
    * on the cluster classpath). One topic per source alias; partitioned by
    * schema so per-schema ordering matches the reference's per-stream FIFO
    * (synch/broker/kafka.py:32-38).
    *
    * `failOnDataLoss` defaults to true: a CDC pipeline must fail loudly
    * when the broker aged out unconsumed offsets (silently skipping
    * changelog rows corrupts every downstream table state); set false
    * only for replays where the gap is known and acceptable.
    *
    * Not live-tested here by environmental necessity, not choice: this
    * container has no Kafka connector jar, no kafka-clients in the
    * offline dependency cache, and zero network egress, so neither an
    * embedded broker nor testcontainers can run (the reference tests
    * against live docker services, tests/docker-compose.yml:1-35). The
    * delivery-semantics surface a live-broker test would exercise —
    * offset replay across an uncommitted-checkpoint crash, rewind
    * re-delivery, DDL mid-stream — is exercised end-to-end through the
    * SAME checkpoint machinery by the file source instead
    * (CrashRecoverySpec, ResumeSpec, ConsumeSpec): Structured Streaming
    * owns offsets identically for both sources, so the semantics under
    * test are source-independent.
    */
  def kafka(spark: SparkSession, bootstrap: String, topic: String,
            maxOffsetsPerTrigger: Long = 20000,
            startingOffsets: String = "earliest",
            failOnDataLoss: Boolean = true): DataFrame =
    parse(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
        .option("failOnDataLoss", failOnDataLoss)
        .load()
        .select(col("value").cast("string").as("json")))

  /** File-based stream of JSON events — the hermetic test/bench source.
    * `maxFilesPerTrigger` plays the role of `insert_num` (A1 count cap).
    * `cleanSource = Some("delete")` bounds the source directory on
    * long-horizon runs (a weeks-long consume otherwise accumulates every
    * staged file and pays a growing per-trigger listing) — the semantics
    * the Redis bridge's consumed-staging cleanup would want anyway.
    * (Spark's "archive" mode additionally requires `sourceArchiveDir`,
    * which this API deliberately does not plumb — only "delete" works.)
    *
    * REWIND TRADE-OFF (r13 review): delete mode removes committed source
    * files, so a later [[graft.run.Resume.rewind]] can only replay what
    * still exists — the replayed batch fails LOUDLY on the deleted paths
    * (FileNotFoundException; do not set
    * `spark.sql.files.ignoreMissingFiles`, which would turn that into a
    * silent skip). Recovery: re-stage the range from the broker
    * (`RedisBroker.drainToStaging`) before restarting, or re-bootstrap
    * via `etl --renew`. RUNBOOK §3 carries the procedure.
    */
  def files(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 10,
            cleanSource: Option[String] = None): DataFrame = {
    require(cleanSource.forall(_ == "delete"),
      s"cleanSource supports only \"delete\" (got $cleanSource): Spark's " +
        "archive mode needs a sourceArchiveDir this API does not expose")
    val reader = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    parse(
      cleanSource.fold(reader)(m => reader.option("cleanSource", m))
        .text(dir)
        .select(col("value").as("json")))
  }

  /** Wire deserialization (operator T8): JSON → typed event columns.
    * Records `from_json` cannot parse (null struct) are DROPPED, not
    * forwarded as all-null event rows — matching the reference's
    * log-and-drop contract for malformed broker records; count the
    * stream with [[graft.run.Monitor.observed]] to surface the gap.
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("json"), ChangeEvent.wireSchema).as("e"))
      .filter(col("e").isNotNull && col("e.action").isNotNull)
      .select(col("e.schema").as("schema"), col("e.table").as("table"),
        col("e.action").as("action"), col("e.values").as("values"),
        col("e.event_unixtime").as("event_unixtime"),
        col("e.action_seq").as("action_seq"),
        col("e.old_values").as("old_values"))

  /** The wire struct of one event — the ONE place the field list lives
    * (every produce transport and the serializer build on it). The
    * optional `old_values` rides along when the input carries it and is
    * omitted from the JSON when null (generator default). */
  def wireStruct(events: DataFrame): org.apache.spark.sql.Column = {
    val base = Seq(col("schema"), col("table"), col("action"), col("values"),
      col("event_unixtime"), col("action_seq"))
    to_json(struct(
      (if (events.columns.contains("old_values")) base :+ col("old_values")
       else base): _*))
  }

  /** Wire serialization for the produce leg (events → broker sink). */
  def serialize(events: DataFrame): DataFrame =
    events.select(wireStruct(events).as("value"))
}
