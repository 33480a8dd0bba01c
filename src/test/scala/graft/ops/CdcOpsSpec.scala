package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  // (schema, table, action, pk, event_unixtime, action_seq)
  private def events = Seq(
    ("db", "a", "insert", 1L, 100L, 2),
    ("db", "a", "update", 1L, 200L, 2),
    ("db", "a", "delete", 2L, 150L, 1),
    ("db", "b", "insert", 1L, 120L, 2),
    ("x", "a", "insert", 9L, 130L, 2)
  ).toDF("schema", "table", "action", "pk", "event_unixtime", "action_seq")

  test("T2 filterTables keeps configured schema/table pairs") {
    val out = CdcOps.filterTables(events, Seq("db"), Seq("a"))
    assert(out.select("pk").as[Long].collect().sorted.toSeq == Seq(1L, 1L, 2L))
    assert(CdcOps.filterTables(events).count() == 5) // no-op without config
  }

  test("T3 filterDml drops configured DML kinds") {
    val noDml = CdcOps.filterDml(events, skipDmls = Set("delete", "update"))
    assert(noDml.filter(col("action").isin("delete", "update")).count() == 0)
    val perTable = CdcOps.filterDml(events, skipDeleteTables = Set("a"))
    assert(perTable.count() == 4)
  }

  test("T4 splitUpdates yields delete+insert pair in seq order") {
    val out = CdcOps.splitUpdates(events)
    assert(out.count() == 6) // 4 singles + 1 update doubled
    val halves = out.filter(col("pk") === 1 && col("table") === "a" &&
      col("event_unixtime") === 200)
      .select("action", "action_seq").as[(String, Int)].collect().toSet
    assert(halves == Set(("delete", 1), ("insert", 2)))
  }

  test("T4 splitUpdates delete half takes the BEFORE image from old_values") {
    // required for VersionedCollapsingMergeTree: the -1 must cancel the
    // OLD version — a delete half carrying the new image self-cancels the
    // update and silently keeps the stale row
    val upd = Seq(
      ("db", "a", "update", """{"id":1,"ver":2}""", Some("""{"id":1,"ver":1}"""), 200L, 2),
      ("db", "a", "update", """{"id":2,"ver":5}""", None, 210L, 2), // no before image
      ("db", "a", "delete", """{"id":3,"ver":7}""", None, 220L, 1)
    ).toDF("schema", "table", "action", "values", "old_values", "event_unixtime", "action_seq")
    val out = CdcOps.splitUpdates(upd, oldValuesCol = Some("old_values"))
      .select("action", "values").as[(String, String)].collect().toSet
    assert(out == Set(
      ("delete", """{"id":1,"ver":1}"""), ("insert", """{"id":1,"ver":2}"""),
      ("delete", """{"id":2,"ver":5}"""), ("insert", """{"id":2,"ver":5}"""),
      ("delete", """{"id":3,"ver":7}""")))
    // absent column → exactly the old single-image behavior
    val noCol = CdcOps.splitUpdates(upd.drop("old_values"),
      oldValuesCol = Some("old_values"))
    assert(noCol.filter(col("values").contains("\"ver\":1")).count() == 0)
  }

  test("A4 distributed rank keeps NULL partition/seq keys (null-safe join)") {
    // schema/table can be null on the wire (only action is guaranteed);
    // an EqualTo join against the offsets table silently DROPPED those
    // rows while the window fallback ranked them nulls-first
    val withNullKey = Seq(
      (Some("db"), "a", "insert", 1L, 100L, 2),
      (None, "a", "insert", 2L, 150L, 2),
      (None, "a", "delete", 3L, 50L, 1),
      (Some("db"), "a", "insert", 4L, 200L, 2)
    ).toDF("schema", "table", "action", "pk", "event_unixtime", "action_seq")
    val win = CdcOps.applyOrder(withNullKey, orderCols = Seq("event_unixtime", "pk"))
    val dist = CdcOps.applyOrderDistributed(withNullKey,
      orderCols = Seq("event_unixtime", "pk"))
    assert(dist.count() == 4, "null-keyed rows must not vanish")
    assert(win.exceptAll(dist).isEmpty && dist.exceptAll(win).isEmpty)
    val mb = CdcOps.microBatchId(withNullKey, insertNum = 10)
    assert(mb.count() == 4)
  }

  test("A2 dedupByPk keeps latest event per (table, action, pk)") {
    val out = CdcOps.dedupByPk(events, pkCols = Seq("pk"))
    // (a, insert, 1) and (a, update, 1) are different actions → both stay
    assert(out.count() == 5)
    val dup = Seq(
      ("db", "a", "insert", 1L, 100L, 2),
      ("db", "a", "insert", 1L, 300L, 2)
    ).toDF("schema", "table", "action", "pk", "event_unixtime", "action_seq")
    val kept = CdcOps.dedupByPk(dup, pkCols = Seq("pk"))
    assert(kept.count() == 1)
    assert(kept.select("event_unixtime").as[Long].head() == 300L)
  }

  test("A4 applyOrder ranks deletes before inserts, then by time") {
    val ranked = CdcOps.applyOrder(CdcOps.splitUpdates(events))
    // default partitioning is (schema, table): db.a and x.a rank separately
    val aRanks = ranked.filter(col("schema") === "db" && col("table") === "a")
      .orderBy("apply_rank")
      .select("action", "event_unixtime").as[(String, Long)].collect().toSeq
    assert(aRanks.takeWhile(_._1 == "delete").nonEmpty)
    assert(aRanks == aRanks.sortBy(r => (if (r._1 == "delete") 1 else 2, r._2)))
  }

  test("A4 applyOrderDistributed equals the window form exactly") {
    val split = CdcOps.splitUpdates(events)
    val win = CdcOps.applyOrder(split,
      orderCols = Seq("event_unixtime", "pk"))
    val dist = CdcOps.applyOrderDistributed(split,
      orderCols = Seq("event_unixtime", "pk"), nBuckets = 3)
    assert(win.exceptAll(dist).isEmpty && dist.exceptAll(win).isEmpty)
    assert(win.columns.toSeq == dist.columns.toSeq)
    // empty input keeps the schema (and produces no rows)
    val empty = CdcOps.applyOrderDistributed(split.filter(lit(false)),
      orderCols = Seq("event_unixtime", "pk"))
    assert(empty.count() == 0 && empty.columns.contains("apply_rank"))
  }

  test("A4 applyOrderDistributed tolerates null order keys (window fallback)") {
    // a null event_unixtime can't be range-bucketed — the distributed form
    // must fall back to the window rank (nulls-first) rather than fail,
    // matching what applyOrder always tolerated
    val withNull = Seq(
      ("db", "a", "insert", 1L, Some(100L), 2),
      ("db", "a", "insert", 2L, None, 2),
      ("db", "a", "delete", 3L, Some(50L), 1)
    ).toDF("schema", "table", "action", "pk", "event_unixtime", "action_seq")
    val win = CdcOps.applyOrder(withNull, orderCols = Seq("event_unixtime", "pk"))
    val dist = CdcOps.applyOrderDistributed(withNull,
      orderCols = Seq("event_unixtime", "pk"))
    assert(win.exceptAll(dist).isEmpty && dist.exceptAll(win).isEmpty)
    // a string order column can't even be cast for the stats pass — the
    // static type gate must route to the fallback before any job runs
    val strOrd = CdcOps.applyOrderDistributed(events, orderCols = Seq("action"))
    assert(strOrd.count() == events.count() && strOrd.columns.contains("apply_rank"))
    // microBatchId: same tolerance, batch cap preserved through the fallback
    val mb = CdcOps.microBatchId(withNull, insertNum = 2, orderCols = Seq("event_unixtime"))
    val sizes = mb.groupBy("schema", "table", "batch_id").count()
      .select("count").as[Long].collect()
    assert(mb.count() == 3 && sizes.forall(_ <= 2))
  }

  test("T4 splitUpdates passes DDL query events through untouched") {
    val withDdl = Seq(
      ("db", "a", "insert", 1L, 100L, 2),
      ("db", "a", "query", 0L, 150L, 0)
    ).toDF("schema", "table", "action", "pk", "event_unixtime", "action_seq")
    val out = CdcOps.splitUpdates(withDdl)
      .select("action", "action_seq").as[(String, Int)].collect().toSet
    assert(out == Set(("insert", 2), ("query", 0)))
  }

  test("T4 splitUpdates works on a changelog WITHOUT an action_seq column") {
    // the SparkEntry fixtures derive changelogs from `events` with no
    // action_seq; splitUpdates must synthesize it, not resolve col() on it
    val bare = Seq(
      ("a", "update", 1L, 200L),
      ("a", "other", 2L, 150L) // non-DML pass-through gets DDL seq 0
    ).toDF("table", "action", "pk", "event_unixtime")
    val out = CdcOps.splitUpdates(bare)
      .select("action", "action_seq").as[(String, Int)].collect().toSet
    assert(out == Set(("delete", 1), ("insert", 2), ("other", 0)))
  }

  test("A2 dedupByPk default partitioning separates schemas") {
    val twoSchemas = Seq(
      ("db1", "users", "insert", 1L, 10L, 2),
      ("db2", "users", "insert", 1L, 5L, 2)
    ).toDF("schema", "table", "action", "pk", "event_unixtime", "action_seq")
    // same table name + pk in different schemas must BOTH survive
    assert(CdcOps.dedupByPk(twoSchemas, pkCols = Seq("pk")).count() == 2)
  }

  test("A1 microBatchId caps batch size") {
    val out = CdcOps.microBatchId(events, insertNum = 2)
    val sizes = out.groupBy("schema", "table", "batch_id").count()
      .select("count").as[Long].collect()
    assert(sizes.forall(_ <= 2))
  }

  test("A5 countCheck matches equal counts") {
    val df = events
    val res = CdcOps.countCheck(Seq(("t", df, df))).collect().head
    assert(res.getBoolean(3))
  }
}
