package graft.run

import graft.SparkSpec
import graft.model.Engine
import graft.sink.ParquetStateStore
import graft.streaming.EventSource
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** C3 dead-letter contract: a poisoned table's slice of a micro-batch is
  * parked exactly once with error + batch id, healthy tables are
  * unaffected, and a drain replays the parked batches through the normal
  * apply path (original batch ids) and empties the queue.
  */
class DeadLetterSpec extends SparkSpec {

  private val valueSchema = StructType(Seq(
    StructField("id", LongType), StructField("amount", DoubleType)))

  private def ev(table: String, action: String, id: Long, amount: Double,
                 ts: Long): String = {
    val seq = if (action == "delete") 1 else 2
    s"""{"schema":"db","table":"$table","action":"$action","values":"{\\"id\\":$id,\\"amount\\":$amount}","event_unixtime":$ts,"action_seq":$seq}"""
  }

  test("poisoned table parks its slice; healthy table applies; drain replays and empties") {
    val root = Files.createTempDirectory("dl").toString
    val eventsDir = s"$root/events"; Files.createDirectories(Paths.get(eventsDir))
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")

    val healthy = TableSync("db", "ok", valueSchema, Seq("id"), Engine.ReplacingMergeTree)
    // PK column that doesn't exist → this table's apply throws every batch
    // (MergeTree dedups per PK at apply time, so the bad key fails there)
    val poisoned = TableSync("db", "bad", valueSchema, Seq("no_such_col"), Engine.MergeTree)

    Files.write(Paths.get(eventsDir, "b0.json"), Seq(
      ev("ok", "insert", 1, 10.0, 100),
      ev("bad", "insert", 2, 20.0, 110),
      ev("bad", "update", 2, 22.0, 120)).mkString("\n").getBytes("UTF-8"))

    val q = Consume.start(spark, EventSource.files(spark, eventsDir),
      Seq(healthy, poisoned), stateRoot, s"$root/ckpt",
      triggerInterval = "250 milliseconds", skipError = true,
      deadLetter = Some(dl))
    q.processAllAvailable(); q.stop()

    // healthy table applied normally
    val ok = Consume.currentState(healthy,
      new ParquetStateStore(spark, s"$stateRoot/db/ok")).get
    assert(ok.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    // the poisoned table produced no state...
    assert(new ParquetStateStore(spark, s"$stateRoot/db/bad").isEmpty)
    // ...and its slice is parked with batch id + error, exactly once
    val dead = dl.read("db", "bad").get.collect()
    assert(dead.length == 2)
    val d0 = dead.head
    assert(d0.getAs[Long]("_batch_id") == 0L)
    assert(d0.getAs[String]("_error").nonEmpty)
    assert(dl.read("db", "ok").isEmpty)

    // fix the config (correct PK) and drain: rows land in the table store
    // under the ORIGINAL batch id, and the dead-letter queue empties.
    // overridePins (r14): the park pinned the WRONG pk (that's what
    // poisoned it), so the repair must beat the park-time key pins
    val fixed = poisoned.copy(pkCols = Seq("id"))
    dl.drain(fixed, stateRoot, overridePins = true)
    val bad = Consume.currentState(fixed,
      new ParquetStateStore(spark, s"$stateRoot/db/bad")).get
    val rows = bad.select("id", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows == Set((2L, 22.0)))
    assert(dl.read("db", "bad").isEmpty)
    // the replayed version carries the original batch id 0
    assert(new ParquetStateStore(spark, s"$stateRoot/db/bad").latestVersion.contains(0L))
  }

  test("recording is idempotent per (table, batch): a replayed failure does not duplicate") {
    import spark.implicits._
    val root = Files.createTempDirectory("dlidem").toString
    val dl = new DeadLetter(spark, s"$root/dead")
    val slice = Seq(("db", "t", "insert", """{"id":1}""", 100L, 2))
      .toDF("schema", "table", "action", "values", "event_unixtime", "action_seq")
    dl.record(slice, "db", "t", 7L, "boom")
    dl.record(slice, "db", "t", 7L, "boom again") // foreachBatch retry
    assert(dl.read("db", "t").get.count() == 1)
  }

  test("volume drain: a 1M-row, 12-batch parked backlog replays and empties") {
    import org.apache.spark.sql.functions._
    // the drain-at-volume rehearsal: park sf1-scale event volume (1M rows
    // across 12 micro-batches), then drain it all through the normal
    // apply path. The driver only ever collects the 12 distinct batch
    // ids; each batch re-applies as a distributed job.
    val root = Files.createTempDirectory("dlvol").toString
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")
    val t = TableSync("db", "big", valueSchema, Seq("id"), Engine.ReplacingMergeTree)

    val nBatches = 12; val rowsPer = 84000L
    (0 until nBatches).foreach { b =>
      // ids overlap across batches (id = n % 500k) so the replay also
      // exercises cross-batch LWW resolution, not just appends
      val slice = spark.range(b * rowsPer, (b + 1) * rowsPer)
        .select(lit("db").as("schema"), lit("big").as("table"),
          lit("insert").as("action"),
          format_string("""{"id":%d,"amount":%d.0}""",
            col("id") % 500000L, col("id")).as("values"),
          col("id").as("event_unixtime"), lit(2).as("action_seq"))
      dl.record(slice, "db", "big", b.toLong, "sink down")
    }
    assert(dl.read("db", "big").get.count() == nBatches * rowsPer)

    dl.drain(t, stateRoot)
    val state = Consume.currentState(t,
      new ParquetStateStore(spark, s"$stateRoot/db/big")).get
    // 1,008,000 events over 500k pk slots -> every slot written, LWW =
    // the highest event id that mapped there
    assert(state.count() == 500000L)
    val mx = state.agg(org.apache.spark.sql.functions.max("amount"))
      .head().getDouble(0)
    assert(mx == (nBatches * rowsPer - 1).toDouble)
    assert(dl.read("db", "big").isEmpty)
    // the target store carries the ORIGINAL batch ids
    assert(new ParquetStateStore(spark, s"$stateRoot/db/big")
      .latestVersion.contains((nBatches - 1).toLong))
  }

  test("skipped DDL parks per schema and drains through the ddl runner") {
    val root = Files.createTempDirectory("dlddl").toString
    val dl = new DeadLetter(spark, s"$root/dead")
    dl.recordDdl("db", Seq(
      ("ALTER TABLE db.t ADD COLUMN c INT", 100L, "sink down"),
      ("ALTER TABLE db.t DROP COLUMN d", 200L, "sink down")), 3L)
    assert(dl.read("db", "_ddl").get.count() == 2)
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    dl.drainDdl("db", sql => ran += sql)
    // both statements re-ran, in event order, and the queue emptied
    assert(ran.length == 2 && ran.head.contains("ADD COLUMN"))
    assert(dl.read("db", "_ddl").isEmpty)
  }

  test("drainDdl keeps still-failing statements parked instead of silently clearing them") {
    // regression 1: an unparseable statement used to be skipped by
    // Option.foreach and then wiped by the unconditional clear — gone with
    // no error and no application. regression 2: abort-on-first-failure
    // left already-applied non-idempotent DDL parked, so the NEXT drain
    // re-ran it, threw 'already exists', and the queue wedged forever.
    val root = Files.createTempDirectory("dlddlkeep").toString
    val dl = new DeadLetter(spark, s"$root/dead")
    dl.recordDdl("db", Seq(
      ("ALTER TABLE db.t ADD COLUMN c INT", 100L, "sink down"),
      ("ALTER TABLE db.t FROBNICATE", 150L, "unparseable"),
      ("ALTER TABLE db.t DROP COLUMN d", 200L, "sink down")), 3L)

    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    dl.drainDdl("db", sql =>
      if (sql.contains("DROP COLUMN")) sys.error("target still down")
      else ran += sql)

    // the ADD applied; the unparseable and the still-failing DROP stayed
    // parked — under the original batch id, with the fresh error
    assert(ran.length == 1 && ran.head.contains("ADD COLUMN"))
    val parked = dl.read("db", "_ddl").get.collect()
    assert(parked.length == 2)
    assert(parked.forall(_.getAs[Long]("_batch_id") == 3L))
    val byStmt = parked.map(r =>
      r.getAs[String]("values") -> r.getAs[String]("_ddl_error")).toMap
    assert(byStmt("ALTER TABLE db.t FROBNICATE") == "unparseable")
    assert(byStmt("ALTER TABLE db.t DROP COLUMN d").contains("target still down"))

    // once the target heals, the next drain applies the DROP without
    // re-running the already-applied ADD, and only the unparseable stays
    val ran2 = scala.collection.mutable.ArrayBuffer.empty[String]
    dl.drainDdl("db", sql => ran2 += sql)
    assert(ran2.length == 1 && ran2.head.contains("DROP COLUMN"))
    assert(dl.read("db", "_ddl").get.count() == 1)
  }

  test("drainDdl clears batches individually: an applied batch is gone even when a later one still fails") {
    // regression: the drain cleared the WHOLE queue before re-parking, so
    // a crash in that window lost every still-failing statement; per-batch
    // clear bounds any loss to one batch's re-park
    val root = Files.createTempDirectory("dlddlperbid").toString
    val dl = new DeadLetter(spark, s"$root/dead")
    dl.recordDdl("db", Seq(("ALTER TABLE db.t ADD COLUMN a INT", 100L, "down")), 1L)
    dl.recordDdl("db", Seq(("ALTER TABLE db.t ADD COLUMN b INT", 200L, "down")), 2L)
    dl.drainDdl("db", sql =>
      if (sql.contains("(b INT")) sys.error("still down") else ())
    val parked = dl.read("db", "_ddl").get.collect()
    assert(parked.length == 1)
    assert(parked.head.getAs[Long]("_batch_id") == 2L)
    assert(parked.head.getAs[String]("values").contains("COLUMN b"))
  }

  test("drainDdl replays same-timestamp statements in recorded order") {
    // binlog timestamps are coarse: an ADD + MODIFY pair from one
    // migration can share a second, and replaying them reversed fails
    // (MODIFY of a column that doesn't exist yet)
    val root = Files.createTempDirectory("dlddlorder").toString
    val dl = new DeadLetter(spark, s"$root/dead")
    dl.recordDdl("db", Seq(
      ("ALTER TABLE db.t ADD COLUMN c INT", 100L, "down"),
      ("ALTER TABLE db.t MODIFY COLUMN c BIGINT", 100L, "down")), 5L)
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    dl.drainDdl("db", sql => ran += sql)
    assert(ran.map(s => s.contains("ADD COLUMNS")) == Seq(true, false))
    assert(dl.read("db", "_ddl").isEmpty)
  }

  test("drain re-applies a parked batch with mid-batch DDL under the intra-batch split") {
    // the parked slice carries its own DDL row, so the drain must re-run
    // the same slice-parse the live loop applies: rows logged after the
    // ALTER keep their new column instead of silently nulling out
    import spark.implicits._
    val root = Files.createTempDirectory("dlsplit").toString
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")
    val t = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)

    val slice = Seq(
      ("db", "t", "insert", """{"id":1,"amount":10.0}""", 100L, 2),
      ("db", "t", "query", "ALTER TABLE db.t ADD COLUMN note VARCHAR(20)", 120L, 0),
      ("db", "t", "insert", """{"id":2,"amount":20.0,"note":"new"}""", 200L, 2)
    ).toDF("schema", "table", "action", "values", "event_unixtime", "action_seq")
    dl.record(slice, "db", "t", 4L, "sink down")

    dl.drain(t, stateRoot) // t = the PRE-alter schema, as documented

    val evolved = t.copy(valueSchema = valueSchema.add(StructField("note", StringType)))
    val state = Consume.currentState(evolved,
      new ParquetStateStore(spark, s"$stateRoot/db/t")).get
      .select("id", "amount", "note").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(state == Set((1L, 10.0, None), (2L, 20.0, Some("new"))))
    assert(dl.read("db", "t").isEmpty)
  }

  test("drain replays same-second DDL in ORIGINAL staged order via parked _src stamps") {
    // ADVICE r11: the live loop's same-second DDL tiebreak
    // (_src_file/_src_seq) used to die at the park — Consume parked the
    // slice AFTER dropping the stamps, so the drain re-stamped from
    // parquet part-file layout and could invert an ADD/CHANGE pair.
    // Consume now parks the STAMPED frame and DeadLetter.drain prefers
    // pre-existing stamps. This slice carries two same-second ALTERs
    // whose order decides the final schema, with ROW order inverted
    // relative to the staged order in the stamps — exactly what a
    // parquet re-read can do.
    import spark.implicits._
    val root = Files.createTempDirectory("dlsrcorder").toString
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")
    val t = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)
    val slice = Seq(
      ("db", "t", "insert", """{"id":1,"amount":10.0}""", 100L, 2, "f1", 1L),
      // row order: CHANGE before ADD; staged order (stamps): ADD (5) then CHANGE (6)
      ("db", "t", "query", "ALTER TABLE db.t CHANGE note memo VARCHAR(40)", 120L, 0, "f1", 6L),
      ("db", "t", "query", "ALTER TABLE db.t ADD COLUMN note VARCHAR(20)", 120L, 0, "f1", 5L),
      ("db", "t", "insert", """{"id":2,"amount":20.0,"memo":"new"}""", 200L, 2, "f1", 7L)
    ).toDF("schema", "table", "action", "values", "event_unixtime",
      "action_seq", "_src_file", "_src_seq")
    dl.record(slice, "db", "t", 4L, "sink down")

    dl.drain(t, stateRoot)

    val evolved = t.copy(valueSchema = valueSchema.add(StructField("memo", StringType)))
    val state = Consume.currentState(evolved,
      new ParquetStateStore(spark, s"$stateRoot/db/t")).get
      .select("id", "amount", "memo").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(state == Set((1L, 10.0, None), (2L, 20.0, Some("new"))))
    assert(dl.read("db", "t").isEmpty)
  }

  test("parked slice keeps DDL rows whose table column is EMPTY (Debezium schema-change)") {
    // regression: the park used a table-scoped filter, but Debezium
    // schema-change documents carry table="" (the ALTER names the table
    // in its text) — the DDL row was dropped from the parked slice and a
    // drain re-parsed the whole batch under the pre-ALTER schema
    val root = Files.createTempDirectory("dlddlpark").toString
    val eventsDir = s"$root/events"; Files.createDirectories(Paths.get(eventsDir))
    val dl = new DeadLetter(spark, s"$root/dead")
    val poisoned = TableSync("db", "bad", valueSchema, Seq("no_such_col"), Engine.MergeTree)

    val debeziumStyleDdl =
      s"""{"schema":"db","table":"","action":"query","values":"ALTER TABLE db.bad ADD COLUMN note VARCHAR(20)","event_unixtime":120,"action_seq":0}"""
    Files.write(Paths.get(eventsDir, "b0.json"), Seq(
      ev("bad", "insert", 1, 10.0, 100),
      debeziumStyleDdl,
      ev("bad", "insert", 2, 20.0, 200)).mkString("\n").getBytes("UTF-8"))

    val q = Consume.start(spark, EventSource.files(spark, eventsDir),
      Seq(poisoned), s"$root/state", s"$root/ckpt",
      triggerInterval = "250 milliseconds", skipError = true,
      deadLetter = Some(dl))
    q.processAllAvailable(); q.stop()

    val parked = dl.read("db", "bad").get.collect()
    val queryRows = parked.filter(_.getAs[String]("action") == "query")
    assert(queryRows.length == 1, s"DDL row missing from the parked slice: ${parked.toSeq}")
    assert(queryRows.head.getAs[String]("values").contains("ADD COLUMN note"))
    // the park keeps the source-order stamps so a drain re-sorts
    // same-second DDL in staged order (see the _src stamps drain test)
    assert(dl.read("db", "bad").get.columns.toSet.intersect(
      Set("_src_file", "_src_seq")) == Set("_src_file", "_src_seq"),
      "parked slice lost its _src_file/_src_seq stamps")
  }

  test("parks straddling a live-applied ALTER drain under their own recorded schema") {
    // Deterministic pin of the r13 property-test finding (trial 4, seed
    // 0xD13+4): batch 0 parks; batch 1 applies LIVE and ADDs a column —
    // so its ALTER is never parked; batch 2 (using the new column) parks.
    // The old drain chained schemas through parked slices only, missed
    // the live ALTER, and re-parsed batch 2 with `note` silently nulled.
    // The fix records each park's pre-batch schema (_pre_schema) and the
    // drain replays every batch under its own recorded schema.
    import spark.implicits._
    val root = Files.createTempDirectory("dlstraddle").toString
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")
    val t0 = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)

    def df(rows: Seq[(String, String, String, String, Long, Int, String, Long)]) =
      rows.toDF("schema", "table", "action", "values", "event_unixtime",
        "action_seq", "_src_file", "_src_seq")

    // batch 0: plain DML — parks (pre-batch schema = t0)
    dl.record(df(Seq(("db", "t", "insert", """{"id":1,"amount":10.0}""",
      100L, 2, "f", 1L))), "db", "t", 0L, "sink down",
      preSync = Some(t0))
    // batch 1: ADD COLUMN note — applies LIVE (never parked)
    val b1 = df(Seq(
      ("db", "t", "query", "ALTER TABLE db.t ADD COLUMN note VARCHAR(20)", 110L, 0, "f", 1L)))
    val ddls1 = Consume.collectDdl(b1, "db")
    val t1 = Consume.evolveTable(t0, ddls1)
    Consume.applyBatch(spark, t1, new ParquetStateStore(spark, s"$stateRoot/db/t"),
      Consume.tableChangelog(b1.drop("_src_file", "_src_seq"), t0, ddls1), 1L)
    // batch 2: DML USING the live-added column — parks (pre-batch schema = t1)
    dl.record(df(Seq(("db", "t", "insert", """{"id":2,"amount":20.0,"note":"kept"}""",
      120L, 2, "f", 1L))), "db", "t", 2L, "sink down",
      preSync = Some(t1))

    dl.drain(t0, stateRoot) // t0: the legacy-fallback arg — the stamps must win

    val state = Consume.currentState(t1,
      new ParquetStateStore(spark, s"$stateRoot/db/t")).get
      .select("id", "amount", "note").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(state == Set((1L, 10.0, None), (2L, 20.0, Some("kept"))),
      "the live-applied ALTER between two parks must not null the drained column")
    assert(dl.read("db", "t").isEmpty)
  }

  test("parks straddling a live-applied pk RENAME drain under their own key pins (r14)") {
    // advisor r13→r14: _pre_schema pinned only the VALUE schema;
    // pk/version names still came from the caller's TableSync, so a
    // live-applied CHANGE that renamed a pk column between two parks
    // replayed the later park with the stale name — from_json finds no
    // such field and the pk silently nulls. The fix pins _pre_pk /
    // _pre_version at park time; pins win unless overridePins.
    import spark.implicits._
    val root = Files.createTempDirectory("dlrename").toString
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")
    val t0 = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)

    def df(rows: Seq[(String, String, String, String, Long, Int, String, Long)]) =
      rows.toDF("schema", "table", "action", "values", "event_unixtime",
        "action_seq", "_src_file", "_src_seq")

    // batch 0: plain DML under pk `id` — parks
    dl.record(df(Seq(("db", "t", "insert", """{"id":1,"amount":10.0}""",
      100L, 2, "f", 1L))), "db", "t", 0L, "sink down", preSync = Some(t0))
    // batch 1: rename the pk column id -> uid — applies LIVE (never parked)
    val b1 = df(Seq(("db", "t", "query",
      "ALTER TABLE db.t CHANGE id uid bigint", 110L, 0, "f", 1L)))
    val ddls1 = Consume.collectDdl(b1, "db")
    val t1 = Consume.evolveTable(t0, ddls1)
    assert(t1.pkCols == Seq("uid"), "fixture: evolveTable must rename the pk")
    val store = new ParquetStateStore(spark, s"$stateRoot/db/t")
    Consume.applyBatch(spark, t1, store,
      Consume.tableChangelog(b1.drop("_src_file", "_src_seq"), t0, ddls1), 1L)
    // the live loop's store-side rename half (Consume.start does this for
    // every renamesIn hit — replicate it for the simulated live batch)
    Consume.renamesIn(ddls1).foreach { case (_, o, n) =>
      Consume.compact(t1, store, Consume.renameTransform(o, n)) }
    // batch 2: DML keyed by the RENAMED pk — parks with its own pin (uid)
    dl.record(df(Seq(("db", "t", "insert", """{"uid":2,"amount":20.0}""",
      120L, 2, "f", 1L))), "db", "t", 2L, "sink down", preSync = Some(t1))

    // drain with the CURRENT sync (pk=uid, the r15 contract: `t` is the
    // live state whenever parks carry pins): batch 0's parked bytes are
    // keyed `id` — only its OWN pin can replay them correctly; the
    // caller's uid would null them (remove the _pre_pk pin mechanism and
    // this assertion fails on batch 0's row)
    dl.drain(t1, stateRoot)

    val state = Consume.currentState(t1,
      new ParquetStateStore(spark, s"$stateRoot/db/t")).get
      .select("uid", "amount").collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getDouble(1))).toSet
    assert(state == Set((Some(1L), 10.0), (Some(2L), 20.0)),
      "the renamed pk between two parks must not null the later park's keys")
    assert(dl.read("db", "t").isEmpty)
  }

  test("a live pk rename AFTER the last park drains via the tail pin-diff (r15)") {
    // advisor r15 (medium): the consecutive-pin diffs only see renames
    // BETWEEN parks — a rename that applied live after the LAST park is
    // invisible to them, so the last park replays under its pin's old
    // key name into a store the live loop already rename-compacted, and
    // the drained rows' keys read as null. Fix: diff the last pin-rooted
    // replay's post-sync against the caller's CURRENT TableSync.
    import spark.implicits._
    val root = Files.createTempDirectory("dltailrename").toString
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")
    val t0 = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)

    def df(rows: Seq[(String, String, String, String, Long, Int, String, Long)]) =
      rows.toDF("schema", "table", "action", "values", "event_unixtime",
        "action_seq", "_src_file", "_src_seq")

    // batch 0: plain DML under pk `id` — parks (pin pk=id)
    dl.record(df(Seq(("db", "t", "insert", """{"id":1,"amount":10.0}""",
      100L, 2, "f", 1L))), "db", "t", 0L, "sink down", preSync = Some(t0))
    // batch 1: rename the pk id -> uid — applies LIVE, AFTER the last park
    val b1 = df(Seq(("db", "t", "query",
      "ALTER TABLE db.t CHANGE id uid bigint", 110L, 0, "f", 1L)))
    val ddls1 = Consume.collectDdl(b1, "db")
    val t1 = Consume.evolveTable(t0, ddls1)
    assert(t1.pkCols == Seq("uid"), "fixture: evolveTable must rename the pk")
    val store = new ParquetStateStore(spark, s"$stateRoot/db/t")
    Consume.applyBatch(spark, t1, store,
      Consume.tableChangelog(b1.drop("_src_file", "_src_seq"), t0, ddls1), 1L)
    Consume.renamesIn(ddls1).foreach { case (_, o, n) =>
      Consume.compact(t1, store, Consume.renameTransform(o, n)) }
    // batch 2: DML under the renamed pk — applies LIVE (never parked)
    val b2 = df(Seq(("db", "t", "insert", """{"uid":2,"amount":20.0}""",
      120L, 2, "f", 1L)))
    Consume.applyBatch(spark, t1, store,
      Consume.tableChangelog(b2.drop("_src_file", "_src_seq"), t1, Nil), 2L)

    // drain with the CURRENT sync (pk=uid): the parked batch replays
    // under its pin (pk=id, old column name) — the tail diff must add
    // id->uid to the end-of-drain rename compact
    dl.drain(t1, stateRoot)

    val state = Consume.currentState(t1,
      new ParquetStateStore(spark, s"$stateRoot/db/t")).get
      .select("uid", "amount").collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getDouble(1))).toSet
    assert(state == Set((Some(1L), 10.0), (Some(2L), 20.0)),
      "a live rename after the last park must not null the drained rows' keys")
    assert(dl.read("db", "t").isEmpty)
  }

  test("drain(overridePins) refuses a queue whose key pins straddle a live rename (r15)") {
    // advisor r15 (low): overridePins forces pinned=None everywhere, so
    // the pin-diff rename bookkeeping is blind — replaying every park
    // under ONE overridden key set across a live rename would null the
    // pre-rename parks' keys with no compact to heal them. The drain
    // must refuse BEFORE any replay; agreeing pins stay drainable.
    import spark.implicits._
    val root = Files.createTempDirectory("dloverride").toString
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")
    val t0 = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)

    def df(rows: Seq[(String, String, String, String, Long, Int, String, Long)]) =
      rows.toDF("schema", "table", "action", "values", "event_unixtime",
        "action_seq", "_src_file", "_src_seq")

    dl.record(df(Seq(("db", "t", "insert", """{"id":1,"amount":10.0}""",
      100L, 2, "f", 1L))), "db", "t", 0L, "sink down", preSync = Some(t0))
    val t1 = t0.copy(pkCols = Seq("uid"),
      valueSchema = org.apache.spark.sql.types.StructType(
        t0.valueSchema.fields.map(f =>
          if (f.name == "id") f.copy(name = "uid") else f)))
    dl.record(df(Seq(("db", "t", "insert", """{"uid":2,"amount":20.0}""",
      120L, 2, "f", 1L))), "db", "t", 2L, "sink down", preSync = Some(t1))

    val e = intercept[IllegalStateException] {
      dl.drain(t1, stateRoot, overridePins = true)
    }
    assert(e.getMessage.contains("key pins disagree"), e.getMessage)
    // nothing replayed: the refusal ran before any mutation
    assert(new ParquetStateStore(spark, s"$stateRoot/db/t").versionIds().isEmpty,
      "the straddle refusal must precede every replay")
    assert(dl.read("db", "t").isDefined, "the queue must stay parked intact")
  }

  test("property: random park/drain/crash/re-park interleavings drain to the never-parked state") {
    // VERDICT r12 #5: the hand-enumerated drain pins above each cover ONE
    // interleaving; the degraded-handoff property test (d422eb9) proved
    // random chains find crash-replay bugs enumeration misses. This
    // generates random mixed DML+DDL batches and replays them through a
    // random interleaving of live applies, parks, mid-queue drains,
    // crashed drains (applied-but-not-cleared — the documented crash
    // window between re-apply and clear), and duplicate re-parks
    // (foreachBatch replay of a still-failing batch), then asserts the
    // final table state is IDENTICAL to applying every batch in order
    // with no dead-letter at all, and the queue is empty.
    //
    // Invariants exercised, from the scaladocs: original batch ids make
    // out-of-order re-application converge (the store folds versions in
    // id order); parked slices re-split under their OWN DDL rows with
    // the schema as of the FIRST parked batch; record() is idempotent
    // per (table, batch); a crashed drain's re-run is absorbed by
    // committed-batch idempotence.
    import spark.implicits._
    val seed = 0xD13L // fixed: a failure must reproduce
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(seed + trial)
      val nBatches = 3 + rnd.nextInt(3)
      val t0 = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)

      // --- generate random batches: DML + occasional (same-second) DDL ---
      var colSeq = 0
      var liveCols = Vector.empty[String] // columns added so far (post-rename names)
      var ts = 100L
      case class Slice(rows: Seq[(String, String, String, String, Long, Int, String, Long)])
      val batches: Seq[Slice] = (0 until nBatches).map { _ =>
        val rows = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, String, String, Long, Int, String, Long)]
        var srcSeq = 1L
        def dml(): Unit = {
          val id = 1 + rnd.nextInt(5)
          val action = rnd.nextInt(5) match {
            case 0 => "delete"
            case 1 => "update"
            case _ => "insert"
          }
          val amount = (rnd.nextInt(1000) + 1) / 10.0
          val extra =
            if (liveCols.nonEmpty && rnd.nextBoolean())
              s""","${liveCols(rnd.nextInt(liveCols.size))}":"v${rnd.nextInt(9)}""""
            else ""
          ts += rnd.nextInt(3).toLong // coarse timestamps: collisions allowed
          rows += (("db", "t", action, s"""{"id":$id,"amount":$amount$extra}""",
            ts, if (action == "delete") 1 else 2, "f", srcSeq))
          srcSeq += 1
        }
        def ddl(): Unit = {
          colSeq += 1
          ts += 1
          if (rnd.nextBoolean()) {
            rows += (("db", "t", "query",
              s"ALTER TABLE db.t ADD COLUMN c$colSeq VARCHAR(20)", ts, 0, "f", srcSeq))
            srcSeq += 1
            liveCols :+= s"c$colSeq"
          } else {
            // same-second ADD + CHANGE pair whose order decides the final
            // schema — the shape the _src stamps exist for
            rows += (("db", "t", "query",
              s"ALTER TABLE db.t ADD COLUMN c$colSeq VARCHAR(20)", ts, 0, "f", srcSeq))
            rows += (("db", "t", "query",
              s"ALTER TABLE db.t CHANGE c$colSeq m$colSeq VARCHAR(40)", ts, 0, "f", srcSeq + 1))
            srcSeq += 2
            liveCols :+= s"m$colSeq"
          }
        }
        dml()
        (0 until rnd.nextInt(3)).foreach(_ => dml())
        if (rnd.nextInt(10) < 4) ddl()
        (0 until rnd.nextInt(2)).foreach(_ => dml())
        Slice(rows.toSeq)
      }
      def frame(s: Slice) = s.rows.toDF("schema", "table", "action", "values",
        "event_unixtime", "action_seq", "_src_file", "_src_seq")

      // --- baseline: every batch applied live, in order, never parked ---
      val root = Files.createTempDirectory(s"dlprop$trial").toString
      def applyLive(stateRoot: String, tCur: TableSync, bid: Long,
                    s: Slice): TableSync = {
        val cached = frame(s)
        val ddls = Consume.collectDdl(cached, "db")
        val tNext = Consume.evolveTable(tCur, ddls)
        Consume.applyBatch(spark, tNext,
          new ParquetStateStore(spark, s"$stateRoot/db/t"),
          Consume.tableChangelog(cached.drop("_src_file", "_src_seq"), tCur, ddls),
          bid)
        tNext
      }
      var tBase = t0
      batches.zipWithIndex.foreach { case (s, i) =>
        tBase = applyLive(s"$root/base", tBase, i.toLong, s)
      }

      // --- interleaved: random park/apply, drains at random points ---
      val dl = new DeadLetter(spark, s"$root/dead")
      var tLive = t0 // evolves with EVERY batch's DDL (the consume-loop rule)
      var tAtFirstPark: Option[TableSync] = None
      def drainNow(crashFirst: Boolean): Unit = tAtFirstPark.foreach { tp =>
        if (crashFirst) {
          // crash window: re-apply a PREFIX of the queue without clearing
          // (DeadLetter.drain's documented crash shape, via the SAME
          // replay body) — the real drain below must absorb the
          // duplicate application
          val parked = new ParquetStateStore(spark, s"$root/dead/db/t")
          val ids = parked.versionIds()
          var cur = tp
          ids.take(1 + rnd.nextInt(ids.size)).foreach { bid =>
            parked.readVersion(bid).foreach { slice =>
              cur = dl.replaySlice(slice, tp, cur,
                new ParquetStateStore(spark, s"$root/int/db/t"), bid).next
            }
          }
        }
        dl.drain(tp, s"$root/int")
        assert(dl.read("db", "t").isEmpty, s"trial $trial: drain left rows parked")
        tAtFirstPark = None
      }
      batches.zipWithIndex.foreach { case (s, i) =>
        val cached = frame(s)
        val ddls = Consume.collectDdl(cached, "db")
        val tNext = Consume.evolveTable(tLive, ddls)
        if (rnd.nextBoolean()) {
          // park as the skip-error path does: the STAMPED frame, whole
          // slice, WITH the pre-batch schema (the r13 fix — without it,
          // trial 4 of this very test nulls a column added by a batch
          // that applied live between two parks)
          dl.record(cached, "db", "t", i.toLong, "injected failure",
            preSync = Some(tLive))
          if (rnd.nextInt(3) == 0) // foreachBatch replay of a failing batch
            dl.record(cached, "db", "t", i.toLong, "injected failure (replay)",
              preSync = Some(tLive))
          if (tAtFirstPark.isEmpty) tAtFirstPark = Some(tLive)
        } else {
          Consume.applyBatch(spark, tNext,
            new ParquetStateStore(spark, s"$root/int/db/t"),
            Consume.tableChangelog(
              cached.drop("_src_file", "_src_seq"), tLive, ddls), i.toLong)
        }
        tLive = tNext // schema follows the DDL stream, not apply success
        if (rnd.nextInt(3) == 0) drainNow(crashFirst = rnd.nextInt(3) == 0)
      }
      drainNow(crashFirst = rnd.nextInt(2) == 0) // final drain empties the queue

      // --- equivalence under the fully-evolved schema ---
      assert(tBase.valueSchema == tLive.valueSchema,
        s"trial $trial: baseline and interleaved schemas diverged")
      def stateSet(stateRoot: String) = {
        val df = Consume.currentState(tLive,
          new ParquetStateStore(spark, s"$stateRoot/db/t")).get
        val cols = df.columns.filterNot(_.startsWith("_")).sorted
        df.select(cols.head, cols.tail: _*).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      }
      assert(stateSet(s"$root/base") == stateSet(s"$root/int"),
        s"trial $trial (seed ${seed + trial}): drained state != never-parked baseline")
    }
  }

  test("property: parks x LIVE RENAMES x drain points x overridePins converge or refuse loudly (r16, 100 seeds)") {
    // VERDICT r15 #7: the r14+r15 rename closure in drain() is three
    // interacting mechanisms (parked-DDL chain, consecutive-pin diffs,
    // tail pin-diff + composed end-of-drain rename compact) proven by
    // four hand-built scenarios; this generator walks the composition
    // space the r13 property above cannot reach (it generates no pk
    // renames and no live-applied DDL). Per trial: random batches of DML
    // + DDL where the DDL includes PK RENAMES; each batch randomly parks
    // (with its true pre-batch pin, as the consume loop records) or
    // applies live INCLUDING the live loop's store-side rename compact;
    // drains fire at random points, randomly crash-first (a replayed
    // prefix that never cleared — the documented crash window) and
    // randomly with overridePins. Contract asserted, verbatim from the
    // directive: drained store == the linear no-crash no-park baseline,
    // OR the drain refuses loudly BEFORE clearing anything (after which
    // the operator fallback — pins honored — must converge).
    import spark.implicits._
    val seed = 0xD16L // fixed: a failure must reproduce
    var refusals = 0; var overrideDrains = 0; var crashDrains = 0
    var renameStraddles = 0
    val trialRange = sys.env.get("DL_PROP_TRIAL") match {
      case Some(t) => t.toInt until (t.toInt + 1)
      case None => 0 until 100
    }
    val debug = sys.env.contains("DL_PROP_TRIAL")
    for (trial <- trialRange) {
      val rnd = new scala.util.Random(seed + trial)
      val nBatches = 3 + rnd.nextInt(3)
      val t0 = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)

      // --- generate: DML keyed by the CURRENT pk name; DDL includes pk
      // renames (fresh names only — the re-add refusal shape is pinned
      // separately above and deliberately not generated here) ---
      var colSeq = 0
      var pkName = "id"
      var liveCols = Vector.empty[String]
      var ts = 100L
      case class Slice(rows: Seq[(String, String, String, String, Long, Int, String, Long)])
      val batches: Seq[Slice] = (0 until nBatches).map { _ =>
        val rows = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, String, String, Long, Int, String, Long)]
        var srcSeq = 1L
        def dml(): Unit = {
          val id = 1 + rnd.nextInt(5)
          val action = rnd.nextInt(5) match {
            case 0 => "delete"
            case 1 => "update"
            case _ => "insert"
          }
          val amount = (rnd.nextInt(1000) + 1) / 10.0
          val extra =
            if (liveCols.nonEmpty && rnd.nextBoolean())
              s""","${liveCols(rnd.nextInt(liveCols.size))}":"v${rnd.nextInt(9)}""""
            else ""
          // STRICTLY increasing event times: two same-pk rows with equal
          // (event_unixtime, action_seq) are a full version-key tie, and
          // the engine's winner on a full tie is deliberately unspecified
          // (ClickHouse RMT keeps "any" row across parts) — a generator
          // relying on tie order would flag nondeterminism, not bugs
          // (trial 26 of the first run did exactly that)
          ts += 1 + rnd.nextInt(2).toLong
          rows += (("db", "t", action, s"""{"$pkName":$id,"amount":$amount$extra}""",
            ts, if (action == "delete") 1 else 2, "f", srcSeq))
          srcSeq += 1
        }
        def ddl(): Unit = {
          colSeq += 1; ts += 1
          rnd.nextInt(3) match {
            case 0 => // PK RENAME — the axis the r13 property never generates
              val next = s"k$colSeq"
              rows += (("db", "t", "query",
                s"ALTER TABLE db.t CHANGE $pkName $next bigint", ts, 0, "f", srcSeq))
              srcSeq += 1
              pkName = next
            case 1 =>
              rows += (("db", "t", "query",
                s"ALTER TABLE db.t ADD COLUMN c$colSeq VARCHAR(20)", ts, 0, "f", srcSeq))
              srcSeq += 1
              liveCols :+= s"c$colSeq"
            case 2 => // same-second ADD + CHANGE pair (the _src-stamp shape)
              rows += (("db", "t", "query",
                s"ALTER TABLE db.t ADD COLUMN c$colSeq VARCHAR(20)", ts, 0, "f", srcSeq))
              rows += (("db", "t", "query",
                s"ALTER TABLE db.t CHANGE c$colSeq m$colSeq VARCHAR(40)", ts, 0, "f", srcSeq + 1))
              srcSeq += 2
              liveCols :+= s"m$colSeq"
          }
        }
        dml()
        if (rnd.nextInt(10) < 5) ddl()
        (0 until rnd.nextInt(2)).foreach(_ => dml())
        Slice(rows.toSeq)
      }
      def frame(s: Slice) = s.rows.toDF("schema", "table", "action", "values",
        "event_unixtime", "action_seq", "_src_file", "_src_seq")

      // --- baseline: every batch live, in order, with the live loop's
      // rename compact after each batch (Consume.start's renamesIn hook) ---
      val root = Files.createTempDirectory(s"dlrenprop$trial").toString
      def applyLive(stateRoot: String, tCur: TableSync, bid: Long,
                    s: Slice): TableSync = {
        val cached = frame(s)
        val ddls = Consume.collectDdl(cached, "db")
        val tNext = Consume.evolveTable(tCur, ddls)
        val store = new ParquetStateStore(spark, s"$stateRoot/db/t")
        Consume.applyBatch(spark, tNext, store,
          Consume.tableChangelog(cached.drop("_src_file", "_src_seq"), tCur, ddls),
          bid)
        Consume.renamesIn(ddls).foreach { case (_, o, n) =>
          Consume.compact(tNext, store, Consume.renameTransform(o, n)) }
        tNext
      }
      var tBase = t0
      batches.zipWithIndex.foreach { case (s, i) =>
        tBase = applyLive(s"$root/base", tBase, i.toLong, s)
      }

      // --- interleaved run ---
      val dl = new DeadLetter(spark, s"$root/dead")
      var tLive = t0
      var queuedPks = Set.empty[String] // pk names pinned by queued parks
      def drainNow(): Unit = {
        if (dl.read("db", "t").isEmpty) return
        if (queuedPks.size > 1) renameStraddles += 1
        val crashFirst = rnd.nextInt(3) == 0
        if (crashFirst) {
          crashDrains += 1
          val parked = new ParquetStateStore(spark, s"$root/dead/db/t")
          val ids = parked.versionIds()
          var cur = tLive
          ids.take(1 + rnd.nextInt(ids.size)).foreach { bid =>
            parked.readVersion(bid).foreach { slice =>
              cur = dl.replaySlice(slice, tLive, cur,
                new ParquetStateStore(spark, s"$root/int/db/t"), bid).next
            }
          }
        }
        // overridePins only when the caller's keys MATCH every queued
        // pin: with differing keys the override is the wrong-config
        // repair semantics (caller keys win BY INTENT) and the outcome
        // legitimately diverges from the baseline — outside this
        // property's contract. The disagreeing-pins refusal is still
        // exercised: queued pins can disagree with EACH OTHER.
        val wantOverride = rnd.nextInt(4) == 0 &&
          (queuedPks == Set(tLive.pkCols.head) || queuedPks.size > 1)
        if (wantOverride) overrideDrains += 1
        if (debug) println(s"[dlprop] drain: crashFirst=$crashFirst " +
          s"override=$wantOverride queuedPks=$queuedPks tLivePk=${tLive.pkCols}")
        try {
          dl.drain(tLive, s"$root/int", overridePins = wantOverride)
        } catch {
          case e: IllegalStateException =>
            refusals += 1
            assert(e.getMessage.contains("key pins disagree") ||
              e.getMessage.contains("re-adds column"),
              s"trial $trial: unexpected refusal: ${e.getMessage}")
            assert(dl.read("db", "t").isDefined,
              s"trial $trial: a refusal must leave the queue parked intact")
            dl.drain(tLive, s"$root/int") // operator fallback: pins honored
        }
        assert(dl.read("db", "t").isEmpty, s"trial $trial: drain left rows parked")
        queuedPks = Set.empty
      }
      batches.zipWithIndex.foreach { case (s, i) =>
        val cached = frame(s)
        val ddls = Consume.collectDdl(cached, "db")
        val tNext = Consume.evolveTable(tLive, ddls)
        if (debug) println(s"[dlprop] batch $i rows=${s.rows.map(r =>
          s"${r._3}:${r._4}").mkString(" ; ")}")
        if (rnd.nextBoolean()) {
          if (debug) println(s"[dlprop] batch $i PARKS (pin pk=${tLive.pkCols})")
          dl.record(cached, "db", "t", i.toLong, "injected failure",
            preSync = Some(tLive))
          queuedPks += tLive.pkCols.head
          if (rnd.nextInt(3) == 0) // foreachBatch replay of a failing batch
            dl.record(cached, "db", "t", i.toLong, "injected failure (replay)",
              preSync = Some(tLive))
        } else {
          if (debug) println(s"[dlprop] batch $i applies LIVE")
          Consume.applyBatch(spark, tNext,
            new ParquetStateStore(spark, s"$root/int/db/t"),
            Consume.tableChangelog(
              cached.drop("_src_file", "_src_seq"), tLive, ddls), i.toLong)
        }
        // the real loop runs the store-side rename compact for every
        // batch's renames WHETHER OR NOT the table slice parked (schema
        // evolution and the rename compact follow the DDL stream, not
        // apply success — Consume.start's renamesIn hook; trial 67 of
        // this generator's first run diverged because the fixture
        // skipped it for parked batches)
        Consume.renamesIn(ddls).foreach { case (_, o, n) =>
          Consume.compact(tNext,
            new ParquetStateStore(spark, s"$root/int/db/t"),
            Consume.renameTransform(o, n)) }
        tLive = tNext
        if (rnd.nextInt(3) == 0) drainNow()
      }
      drainNow()

      // --- equivalence under the fully-evolved schema ---
      assert(tBase.valueSchema == tLive.valueSchema &&
        tBase.pkCols == tLive.pkCols,
        s"trial $trial: baseline and interleaved syncs diverged")
      def stateSet(stateRoot: String) = {
        val df = Consume.currentState(tLive,
          new ParquetStateStore(spark, s"$stateRoot/db/t")).get
        val cols = df.columns.filterNot(_.startsWith("_")).sorted
        df.select(cols.head, cols.tail: _*).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      }
      assert(stateSet(s"$root/base") == stateSet(s"$root/int"),
        s"trial $trial (seed ${seed + trial}): drained state != linear baseline")
    }
    // anti-vacuity: the run must actually have exercised every axis
    if (!debug) {
      assert(renameStraddles > 0, "no trial queued parks across a pk rename")
      assert(overrideDrains > 0, "no trial drained with overridePins")
      assert(crashDrains > 0, "no trial crash-replayed a prefix before draining")
    }
    info(s"100 trials: $renameStraddles rename-straddling queues, " +
      s"$overrideDrains override drains, $crashDrains crashed-prefix drains, " +
      s"$refusals loud refusals")
  }

  test("a drained EARLIER insert cannot resurrect a row a live delete removed across a compaction (r16)") {
    // Deterministic pin of the r16 drain property generator's trial-43
    // find: batch 0 (insert id=5) PARKS; batch 1 applies LIVE and deletes
    // id=5 (a no-op delete — the row isn't there yet); a compaction folds
    // the log; the drain then replays batch 0 BELOW the compacted base.
    // The old compact resolved to the read-time view (tombstones dropped),
    // so nothing outranked the replayed insert and the deleted row
    // resurrected. The fold now keeps the delete-winner tombstone.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("dltomb").toString
    val stateRoot = s"$root/state"
    val dl = new DeadLetter(spark, s"$root/dead")
    val t = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)
    def df(rows: Seq[(String, String, String, String, Long, Int, String, Long)]) =
      rows.toDF("schema", "table", "action", "values", "event_unixtime",
        "action_seq", "_src_file", "_src_seq")

    // batch 0 parks: the insert whose delete is still ahead of it
    dl.record(df(Seq(("db", "t", "insert", """{"id":5,"amount":66.7}""",
      100L, 2, "f", 1L))), "db", "t", 0L, "sink down", preSync = Some(t))
    // batch 1 live: delete id=5 (later event time — the delete WINS)
    val store = new ParquetStateStore(spark, s"$stateRoot/db/t")
    val b1 = df(Seq(("db", "t", "delete", """{"id":5,"amount":66.7}""",
      200L, 1, "f", 1L)))
    Consume.applyBatch(spark, t, store,
      Consume.tableChangelog(b1.drop("_src_file", "_src_seq"), t, Nil), 1L)
    // the compaction that used to erase the tombstone
    Consume.compact(t, store)
    // drain replays batch 0 below the compacted base
    dl.drain(t, stateRoot)

    val state = Consume.currentState(t,
      new ParquetStateStore(spark, s"$stateRoot/db/t")).get
    assert(state.filter(col("id") === 5L).isEmpty,
      "the deleted row must stay dead: the compacted base keeps the tombstone")
    assert(dl.read("db", "t").isEmpty)
  }

  test("mechanism-revert teeth: draining WITHOUT the end-of-drain rename compact goes red (r16)") {
    // The property above proves the real drain converges; this proves the
    // property CAN fail — the r14 historical bug shape (no drain-time
    // rename compact) re-enacted through the same replay body: replay
    // every parked batch via replaySlice (the real loop body) but skip
    // drain()'s composed rename compact. The drained rows keep the OLD
    // pk name in the store, the resolver groups on the new one, and the
    // equivalence check the property relies on goes red — so a revert of
    // the compact mechanism cannot pass the generator.
    import spark.implicits._
    val root = Files.createTempDirectory("dlteeth").toString
    val dl = new DeadLetter(spark, s"$root/dead")
    val t0 = TableSync("db", "t", valueSchema, Seq("id"), Engine.ReplacingMergeTree)
    def df(rows: Seq[(String, String, String, String, Long, Int, String, Long)]) =
      rows.toDF("schema", "table", "action", "values", "event_unixtime",
        "action_seq", "_src_file", "_src_seq")

    // park batch 0 under pk `id`; batch 1 renames id -> uid and applies
    // LIVE (the r15 tail shape — only the tail pin-diff + compact heal it)
    dl.record(df(Seq(("db", "t", "insert", """{"id":1,"amount":10.0}""",
      100L, 2, "f", 1L))), "db", "t", 0L, "sink down", preSync = Some(t0))
    val b1 = df(Seq(("db", "t", "query",
      "ALTER TABLE db.t CHANGE id uid bigint", 110L, 0, "f", 1L)))
    val ddls1 = Consume.collectDdl(b1, "db")
    val t1 = Consume.evolveTable(t0, ddls1)

    def runLive(stateRoot: String): ParquetStateStore = {
      val store = new ParquetStateStore(spark, s"$stateRoot/db/t")
      Consume.applyBatch(spark, t1, store,
        Consume.tableChangelog(b1.drop("_src_file", "_src_seq"), t0, ddls1), 1L)
      Consume.renamesIn(ddls1).foreach { case (_, o, n) =>
        Consume.compact(t1, store, Consume.renameTransform(o, n)) }
      store
    }

    // REVERTED drain: the real replay body, NO end-of-drain compact
    val revStore = runLive(s"$root/rev")
    val parked = new ParquetStateStore(spark, s"$root/dead/db/t")
    var cur: TableSync = t1
    parked.versionIds().foreach { bid =>
      parked.readVersion(bid).foreach { slice =>
        cur = dl.replaySlice(slice, t1, cur, revStore, bid).next
      }
    }
    val reverted = Consume.currentState(t1, revStore).get
      .select("uid").collect().map(r => Option(r.get(0)))
    assert(reverted.contains(None),
      "mechanism-revert must corrupt (null pk) — otherwise the property has no teeth")

    // REAL drain on the same queue: converges (the mechanism is load-bearing)
    val intStore = runLive(s"$root/int")
    dl.drain(t1, s"$root/int")
    val drained = Consume.currentState(t1, intStore).get
      .select("uid", "amount").collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getDouble(1))).toSet
    assert(drained == Set((Some(1L), 10.0)),
      "the real drain must heal exactly what the reverted one corrupts")
  }
}
