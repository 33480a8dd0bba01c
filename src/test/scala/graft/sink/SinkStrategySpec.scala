package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinkStrategySpec extends SparkSpec {
  import spark.implicits._

  private val keys = SinkKeys(Seq("pk"), versionCol = "event_unixtime",
    tieBreakers = Seq("action_seq"))

  // (pk, action, val, event_unixtime, action_seq)
  private def log = Seq(
    (1L, "insert", "a", 100L, 2),
    (1L, "insert", "b", 200L, 2), // upsert of pk 1
    (2L, "insert", "c", 110L, 2),
    (2L, "delete", "c", 300L, 1), // pk 2 deleted last
    (3L, "delete", "z", 50L, 1),  // delete before any insert
    (3L, "insert", "d", 400L, 2)
  ).toDF("pk", "action", "v", "event_unixtime", "action_seq")

  test("MergeTree eager apply: delete-then-upsert, final action wins") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], log.schema)
    val state = SinkStrategy.mergeTreeApply(empty, log, keys)
    val rows = state.select("pk", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "b"), (3L, "d")))
  }

  test("MergeTree apply over existing state replaces and deletes") {
    val state0 = Seq((1L, "insert", "old", 10L, 2), (9L, "insert", "keep", 10L, 2))
      .toDF("pk", "action", "v", "event_unixtime", "action_seq")
    val state1 = SinkStrategy.mergeTreeApply(state0, log, keys)
    val rows = state1.select("pk", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "b"), (3L, "d"), (9L, "keep")))
  }

  test("Replacing read-time resolve keeps max-version row, drops tombstones") {
    val out = SinkStrategy.replacingResolve(log, keys)
    val rows = out.select("pk", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "b"), (3L, "d")))
  }

  test("Collapsing resolve: positive net sign survives with latest values") {
    val signed = graft.ops.CdcOps.withCollapsingSign(log)
    val out = SinkStrategy.collapsingResolve(signed, keys)
    val rows = out.select("pk", "v").as[(Long, String)].collect().toSet
    // pk1: +2 → alive(b); pk2: +1-1=0 → gone; pk3: -1+1=0 → gone
    assert(rows == Set((1L, "b")))
  }

  test("VersionedCollapsing resolve: cancellation is per-version") {
    val signed = Seq(
      (1L, 100L, "v1", 1),  // insert v100
      (1L, 100L, "v1", -1), // cancel v100 (arrives any order)
      (1L, 90L, "v0", 1)    // older surviving version
    ).toDF("pk", "event_unixtime", "v", "sign")
    val out = SinkStrategy.versionedCollapsingResolve(signed,
      SinkKeys(Seq("pk"), versionCol = "event_unixtime", tieBreakers = Nil))
    val rows = out.select("pk", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "v0")))
  }
}
