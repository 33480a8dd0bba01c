package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synthetic CDC changelog derived from the `events` test
  * table — the fixture over which the ✦ CDC operators are exercised and
  * oracle-checked (the DuckDB oracle builds the identical changelog as a
  * CTE; see SparkEntry.oracleSql).
  *
  * Mapping: three logical tables t0/t1/t2 keyed by user_id; event_type
  * `error` → delete, `purchase` → update, anything else → insert; `ts` is
  * the event time (µs precision), event_id the monotonic tie-breaker
  * standing in for the binlog offset.
  */
object Changelog {
  def fromEvents(events: DataFrame): DataFrame = events.select(
    col("event_id"),
    concat(lit("t"), pmod(col("user_id"), lit(3)).cast("string")).as("tbl"),
    when(col("event_type") === "error", lit("delete"))
      .when(col("event_type") === "purchase", lit("update"))
      .otherwise(lit("insert")).as("action"),
    col("user_id").as("pk"),
    col("value"),
    col("ts"))

  /** The same changelog as a DuckDB CTE body (oracle twin). */
  val sqlCte: String =
    """changelog AS (
      |  SELECT event_id,
      |         't' || CAST(user_id % 3 AS VARCHAR) AS tbl,
      |         CASE WHEN event_type = 'error' THEN 'delete'
      |              WHEN event_type = 'purchase' THEN 'update'
      |              ELSE 'insert' END AS action,
      |         user_id AS pk, value, ts
      |  FROM events)""".stripMargin
}
