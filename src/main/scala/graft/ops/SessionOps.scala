package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream sessionization — the batch twin of Structured Streaming's
  * `session_window` (the streaming form lives in
  * [[graft.streaming.StreamOps]]). Gap-based: a new session starts when
  * the inter-event gap exceeds `gapSeconds`. One shuffle on the user key;
  * the cumulative-sum trick keeps everything in two window passes.
  */
object SessionOps {

  def sessionize(events: DataFrame, gapSeconds: Long = 1800,
                 userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col("event_id"))
    events
      .withColumn("_prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("_prev")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("_new_session")).over(byUser))
      .drop("_prev", "_new_session")
  }

  /** Per-session rollup: bounds, size, value sum. */
  def sessionStats(events: DataFrame, gapSeconds: Long = 1800,
                   userCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    sessionize(events, gapSeconds, userCol, tsCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"),
        // exact decimal sum → double: engine-portable determinism
        sum(col("value").cast("decimal(10,2)")).cast("double").as("total_value"))
}
