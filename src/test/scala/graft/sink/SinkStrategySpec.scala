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

  test("replacingFold keeps the delete-winner tombstone (r16 compact sufficiency)") {
    // read-time resolve DROPS tombstones; the compact-time fold must NOT:
    // a base without pk 2's delete row forgets the delete, and a
    // dead-letter drain replaying an EARLIER insert of pk 2 resurrects it
    // (the r16 drain property generator's trial-43 find)
    val out = SinkStrategy.replacingFold(log, keys)
    val rows = out.select("pk", "action", "v").as[(Long, String, String)]
      .collect().toSet
    assert(rows == Set((1L, "insert", "b"), (2L, "delete", "c"),
      (3L, "insert", "d")))
    // and the retained tombstone reads back invisible, exactly as before
    assert(SinkStrategy.replacingResolve(out, keys)
      .select("pk").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("collapsingFold keeps one -1 for a negative net, nothing for zero (r16)") {
    val signed = Seq(
      (1L, "a", 100L, 2, 1),   // net +1 → one +1 row, image a
      (2L, "b", 110L, 1, -1),  // net -1 (cancel arrived before its +1) → one -1
      (3L, "c", 120L, 2, 1),
      (3L, "c", 130L, 1, -1)   // net 0 → fully collapsed, nothing kept
    ).toDF("pk", "v", "event_unixtime", "action_seq", "sign")
    val out = SinkStrategy.collapsingFold(signed, keys, Seq("pk"))
    val rows = out.select("pk", "v", "sign").as[(Long, String, Int)].collect().toSet
    assert(rows == Set((1L, "a", 1), (2L, "b", -1)))
    // the kept -1 nets a LATER-ARRIVING +1 (a drained parked insert) to 0
    val late = Seq((2L, "b", 90L, 2, 1))
      .toDF("pk", "v", "event_unixtime", "action_seq", "sign")
    assert(SinkStrategy.collapsingResolve(out.unionByName(late), keys)
      .select("pk").as[Long].collect().toSet == Set(1L))
  }

  test("collapsingFold per (pk, version) keeps every live version (r16 VCMT)") {
    val k = SinkKeys(Seq("pk"), versionCol = "ver", tieBreakers = Nil)
    val signed = Seq(
      (1L, 90L, "v0", 1),
      (1L, 100L, "v1", 1)
    ).toDF("pk", "ver", "v", "sign")
    val out = SinkStrategy.collapsingFold(signed, k, Seq("pk", "ver"))
    // the OLD fold truncated to the top version per pk — a later ordinary
    // cancel of v100 then had no v90 left to reveal
    assert(out.select("ver").as[Long].collect().toSet == Set(90L, 100L))
    val cancelTop = Seq((1L, 100L, "v1", -1)).toDF("pk", "ver", "v", "sign")
    val visible = SinkStrategy.versionedCollapsingResolve(
      out.unionByName(cancelTop), k)
    assert(visible.select("v").as[String].collect().toSeq == Seq("v0"))
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
