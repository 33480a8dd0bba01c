package graft.run

import graft.sink.ParquetStateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet dead-letter table for C3 skip-error mode.
  *
  * The reference's error handling stops at "log and continue"
  * (synch/replication/continuous.py:150-156); the Spark-idiomatic
  * completion (SURVEY §2.6: "try/catch + dead-letter table") persists the
  * failed slice so it is INSPECTABLE (what failed, with which error, in
  * which batch) and REPLAYABLE (re-apply once the cause — a bad row, an
  * unreachable sink, a schema mismatch — is fixed) instead of gone.
  *
  * Layout: one [[ParquetStateStore]] per failed table under
  * `root/<schema>/<table>` (DDL failures under `root/<schema>/_ddl`),
  * versioned by the ORIGINAL micro-batch id. That store's committed-batch
  * idempotence gives exactly-once recording across foreachBatch replays —
  * a retried batch that fails again overwrites the same uncommitted
  * version rather than duplicating rows.
  *
  * Replay keeps the original batch ids: the target table store never
  * committed those versions (the apply failed before commit), so
  * re-applying under the same id preserves end-to-end effectively-once —
  * and a crash between re-apply and [[clear]] is absorbed by the same
  * idempotence on the next drain.
  *
  * Poison-row taxonomy — what parks, and which repair heals it:
  *   - transient sink outage: nothing to fix, [[drain]] as-is;
  *   - wrong sync config (bad PK / engine): fix the [[TableSync]], drain
  *     with the corrected one (DeadLetterSpec's first test);
  *   - malformed rows: [[read]] to inspect (`_error` names the cause),
  *     repair or drop the offending rows in the parked store, drain;
  *   - schema mismatch after DDL: restart the stream with the widened
  *     schema (DdlMidStreamSpec story), then drain under it;
  *   - unparseable/failing DDL: parks under `<schema>/_ddl`,
  *     [[drainDdl]] after fixing the target.
  */
final class DeadLetter(spark: SparkSession, root: String) {

  private def storeFor(schema: String, table: String) =
    new ParquetStateStore(spark, s"$root/$schema/$table")

  /** Record one table's slice of a failed micro-batch (canonical event
    * columns), stamped with the batch id and the error. Idempotent per
    * (table, batchId). */
  def record(events: DataFrame, schema: String, table: String,
             batchId: Long, error: String): Unit =
    storeFor(schema, table).append(
      events.withColumn("_batch_id", lit(batchId))
        .withColumn("_error", lit(error)),
      batchId)

  /** Record DDL statements that failed to parse or apply. */
  def recordDdl(schema: String, failures: Seq[(String, Long, String)],
                batchId: Long): Unit =
    if (failures.nonEmpty) {
      import spark.implicits._
      record(
        failures.toDF("values", "event_unixtime", "_ddl_error")
          .select(lit(schema).as("schema"), lit("_ddl").as("table"),
            lit("query").as("action"), col("values"),
            col("event_unixtime"), lit(0).as("action_seq"),
            col("_ddl_error")),
        schema, "_ddl", batchId, error = "ddl")
    }

  /** Park envelope documents the CDC adapters exclude from the event
    * stream ([[graft.sources.CdcEnvelopes.debeziumDropped]] /
    * `wal2jsonDropped`): truncate/message ops and unparseable documents.
    * These are not replayable through the DML path — truncate has no
    * canonical event — so they land under the reserved `_envelope` table
    * for inspection ([[read]]`("_envelope", "_dropped")`): an operator
    * sees the truncate and re-bootstraps the affected table deliberately,
    * instead of the reference's silent drop. Idempotent per batch id like
    * every other record path. */
  def recordDropped(docs: DataFrame, batchId: Long): Unit =
    storeFor("_envelope", "_dropped").append(
      docs.withColumn("_batch_id", lit(batchId))
        .withColumn("_error", lit("unsupported-envelope-op")),
      batchId)

  /** Dead rows currently parked for a table (None when none). */
  def read(schema: String, table: String): Option[DataFrame] =
    storeFor(schema, table).readLog()

  /** Drop a table's dead rows (after a successful drain). */
  def clear(schema: String, table: String): Unit =
    storeFor(schema, table).truncateAfter(-1L)

  /** Re-apply every parked batch of `table` through the normal apply path
    * (original batch ids, original intra-batch order), then clear. Rows
    * that fail AGAIN stay parked: the drain aborts on the first failing
    * batch, leaving it and everything after it in place.
    *
    * Driver memory bound: the only driver-side materialization is the
    * DISTINCT batch-id list — O(#parked micro-batches) longs (a backlog
    * of 10k parked batches collects ~80 KB), never the rows. Each batch
    * then re-applies as an ordinary distributed job over the parked
    * parquet, so a million-row backlog drains at whatever size the
    * original micro-batches had (DeadLetterSpec's volume test replays a
    * 1M-row, 12-batch backlog through this path).
    */
  def drain(t: TableSync, stateRoot: String): Unit =
    read(t.schema, t.table).foreach { dead =>
      val target = new ParquetStateStore(
        spark, s"$stateRoot/${t.schema}/${t.table}")
      val batchIds = dead.select("_batch_id").distinct()
        .collect().map(_.getLong(0)).sorted
      batchIds.foreach { bid =>
        Consume.applyBatch(spark, t, target,
          Consume.tableChangelog(
            dead.filter(col("_batch_id") === bid)
              .drop("_batch_id", "_error"), t),
          bid)
      }
      clear(t.schema, t.table)
    }

  /** Re-run every parked DDL statement of a schema via `runDdl`
    * (statements that fail again stay parked). */
  def drainDdl(schema: String, runDdl: String => Unit): Unit =
    read(schema, "_ddl").foreach { dead =>
      val rows = dead.select("values", "event_unixtime")
        .orderBy("event_unixtime").collect()
      rows.foreach { r =>
        graft.ddl.AlterParser.toSparkSql(schema, r.getString(0))
          .foreach(runDdl)
      }
      clear(schema, "_ddl")
    }
}
