package graft.sources

import graft.SparkSpec
import graft.model.Engine
import graft.run.{Consume, TableSync}
import graft.sink.ParquetStateStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Golden-payload tests for the wal2json / Debezium envelope adapters
  * (reference test philosophy: literal payload in, exact canonical rows
  * out — tests/test_etl.py:11-36), plus an E2E from raw envelope JSON
  * files through the streaming consume loop into engine state.
  */
class CdcEnvelopesSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("schema", "table", "action", "values", "event_unixtime", "action_seq")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getInt(5))).toSeq

  test("wal2json: insert / update / delete golden payloads") {
    // the wal2json v1 document shape the reference consumes
    // (synch/reader/postgres.py:70-126)
    val ins =
      """{"change":[{"kind":"insert","schema":"public","table":"test","columnnames":["id","amount","note"],"columnvalues":[1,1.50,"a b"]}]}"""
    val upd =
      """{"change":[{"kind":"update","schema":"public","table":"test","columnnames":["id","amount","note"],"columnvalues":[2,2.25,null],"oldkeys":{"keynames":["id"],"keyvalues":[1]}}]}"""
    val del =
      """{"change":[{"kind":"delete","schema":"public","table":"test","oldkeys":{"keynames":["id"],"keyvalues":[2]}}]}"""
    val out = rows(CdcEnvelopes.wal2json(
      Seq(ins, upd, del).toDF("json"), eventUnixtime = lit(1000L)))
    // note: variant canonicalizes numbers (1.50 -> 1.5); map-built values
    // keep the wal2json column order
    assert(out == Seq(
      ("public", "test", "insert", """{"id":1,"amount":1.5,"note":"a b"}""", 1000L, 2),
      ("public", "test", "delete", """{"id":1}""", 1000L, 1),
      ("public", "test", "insert", """{"id":2,"amount":2.25,"note":null}""", 1000L, 2),
      ("public", "test", "delete", """{"id":2}""", 1000L, 1)))
  }

  test("wal2json: every element of a multi-change transaction is kept") {
    // reference postgres.py:72 keeps only change[0]; the adapter must not
    val two =
      """{"change":[
        |{"kind":"insert","schema":"s","table":"a","columnnames":["id"],"columnvalues":[1]},
        |{"kind":"insert","schema":"s","table":"b","columnnames":["id"],"columnvalues":[2]}]}""".stripMargin.replace("\n", "")
    val out = rows(CdcEnvelopes.wal2json(Seq(two).toDF("json"), eventUnixtime = lit(5L)))
    assert(out.map(_._2) == Seq("a", "b"))
  }

  test("wal2json: update without oldkeys falls back to the new image; unknown kinds dropped") {
    val upd =
      """{"change":[{"kind":"update","schema":"s","table":"t","columnnames":["id","v"],"columnvalues":[3,30]}]}"""
    val trunc = """{"change":[{"kind":"truncate","schema":"s","table":"t"}]}"""
    val out = rows(CdcEnvelopes.wal2json(Seq(upd, trunc).toDF("json"), eventUnixtime = lit(5L)))
    assert(out == Seq(
      ("s", "t", "delete", """{"id":3,"v":30}""", 5L, 1),
      ("s", "t", "insert", """{"id":3,"v":30}""", 5L, 2)))
  }

  test("debezium: c/u/d/r golden payloads, with and without the payload wrapper") {
    val c =
      """{"payload":{"before":null,"after":{"id":1,"amount":1.50},"source":{"db":"shop","table":"test"},"op":"c","ts_ms":1000}}"""
    val u = // schemas-disabled converter: fields at the document root
      """{"before":{"id":1,"amount":1.50},"after":{"id":1,"amount":9.75},"source":{"db":"shop","table":"test"},"op":"u","ts_ms":2000}"""
    val d =
      """{"payload":{"before":{"id":1,"amount":9.75},"after":null,"source":{"db":"shop","table":"test"},"op":"d","ts_ms":3000}}"""
    val r =
      """{"before":null,"after":{"id":2,"amount":0.10},"source":{"db":"shop","table":"test"},"op":"r","ts_ms":500}"""
    val out = rows(CdcEnvelopes.debezium(Seq(c, u, d, r).toDF("json")))
    // variant object images serialize with sorted keys and canonical numbers
    assert(out == Seq(
      ("shop", "test", "insert", """{"amount":1.5,"id":1}""", 1000000L, 2),
      ("shop", "test", "delete", """{"amount":1.5,"id":1}""", 2000000L, 1),
      ("shop", "test", "insert", """{"amount":9.75,"id":1}""", 2000000L, 2),
      ("shop", "test", "delete", """{"amount":9.75,"id":1}""", 3000000L, 1),
      ("shop", "test", "insert", """{"amount":0.1,"id":2}""", 500000L, 2)))
  }

  test("debezium: update with null before uses after for the delete half; truncate dropped") {
    val u =
      """{"before":null,"after":{"id":7,"v":70},"source":{"db":"s","table":"t"},"op":"u","ts_ms":10}"""
    val t = """{"source":{"db":"s","table":"t"},"op":"t","ts_ms":11}"""
    val out = rows(CdcEnvelopes.debezium(Seq(u, t).toDF("json")))
    assert(out == Seq(
      ("s", "t", "delete", """{"id":7,"v":70}""", 10000L, 1),
      ("s", "t", "insert", """{"id":7,"v":70}""", 10000L, 2)))
  }

  test("debezium: schema-change documents become canonical query events") {
    // captured shape of the connector's schema-change topic (payload
    // wrapper) and the older history-topic form (bare document, no op)
    val schemaChange =
      """{"payload":{"source":{"db":"shop","table":"test"},"ts_ms":2000,"databaseName":"shop","schemaName":null,"ddl":"ALTER TABLE test ADD COLUMN note varchar(20)","tableChanges":[]}}"""
    val history =
      """{"source":{"server":"dbz"},"position":{"file":"binlog.000002","pos":100},"databaseName":"shop","ddl":"DROP TABLE IF EXISTS legacy"}"""
    val out = rows(CdcEnvelopes.debezium(
      Seq(schemaChange, history).toDF("json"), fallbackUnixtime = lit(7L)))
    assert(out == Seq(
      ("shop", "test", "query",
        "ALTER TABLE test ADD COLUMN note varchar(20)", 2000000L, 0),
      // history form: no source.db/table structs match the schema → falls
      // back to databaseName / empty table, fallback timestamp
      ("shop", "", "query", "DROP TABLE IF EXISTS legacy", 7L, 0)))
    // a data event with BOTH op and (hypothetically) a ddl field keeps
    // its DML meaning — the query branch requires op to be absent
    val dml =
      """{"before":null,"after":{"id":1},"source":{"db":"s","table":"t"},"op":"c","ts_ms":1,"ddl":"x"}"""
    assert(rows(CdcEnvelopes.debezium(Seq(dml).toDF("json"))).map(_._3) == Seq("insert"))
  }

  test("E2E: a Debezium schema-change envelope drives the mid-stream DDL path") {
    // the DdlMidStreamSpec story — ALTER arrives mid-stream, K4 applies
    // it, the query restarts widened from the same checkpoint — but fed
    // from raw Debezium documents instead of canonical event files
    val root = Files.createTempDirectory("dbzddl").toString
    val eventsDir = s"$root/events"; Files.createDirectories(Paths.get(eventsDir))
    val v1 = StructType(Seq(StructField("id", LongType), StructField("amount", DoubleType)))
    val v2 = v1.add(StructField("note", StringType))
    val t1 = TableSync("shop", "test", v1, Seq("id"), Engine.ReplacingMergeTree)
    val t2 = t1.copy(valueSchema = v2)
    val applied = scala.collection.mutable.ArrayBuffer.empty[String]

    def dbz(op: String, before: String, after: String, tsMs: Long): String =
      s"""{"payload":{"before":$before,"after":$after,"source":{"db":"shop","table":"test"},"op":"$op","ts_ms":$tsMs}}"""
    def src = CdcEnvelopes.debezium(
      spark.readStream.option("maxFilesPerTrigger", 10)
        .text(eventsDir).select(col("value").as("json")))

    Files.write(Paths.get(eventsDir, "b0.json"), Seq(
      dbz("c", "null", """{"id":1,"amount":10.0}""", 1000),
      """{"payload":{"source":{"db":"shop","table":"test"},"ts_ms":1100,"databaseName":"shop","ddl":"ALTER TABLE test ADD COLUMN note varchar(20)","tableChanges":[]}}"""
    ).mkString("\n").getBytes("UTF-8"))
    val q1 = Consume.start(spark, src, Seq(t1), s"$root/state", s"$root/ckpt",
      triggerInterval = "250 milliseconds", ddlSink = Some(sql => applied += sql))
    q1.processAllAvailable(); q1.stop()
    assert(applied.exists(s => s.contains("ADD COLUMNS") && s.contains("shop.test")))

    Files.write(Paths.get(eventsDir, "b1.json"), Seq(
      dbz("u", """{"id":1,"amount":10.0}""", """{"id":1,"amount":11.0,"note":"n"}""", 1200)
    ).mkString("\n").getBytes("UTF-8"))
    val q2 = Consume.start(spark, src, Seq(t2), s"$root/state", s"$root/ckpt",
      triggerInterval = "250 milliseconds")
    q2.processAllAvailable(); q2.stop()

    val store = new ParquetStateStore(spark, s"$root/state/shop/test")
    val state = Consume.currentState(t2, store).get
      .select("id", "amount", "note").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(state == Set((1L, 11.0, Some("n"))))
  }

  test("E2E: Debezium envelope files stream through the consume loop into engine state") {
    val root = Files.createTempDirectory("dbz").toString
    val eventsDir = s"$root/events"; Files.createDirectories(Paths.get(eventsDir))
    val vs = StructType(Seq(StructField("id", LongType), StructField("amount", DoubleType)))
    val tables = Seq(TableSync("shop", "test", vs, Seq("id"), Engine.ReplacingMergeTree))

    def dbz(op: String, before: String, after: String, tsMs: Long): String =
      s"""{"payload":{"before":$before,"after":$after,"source":{"db":"shop","table":"test"},"op":"$op","ts_ms":$tsMs}}"""
    Files.write(Paths.get(eventsDir, "b0.json"), Seq(
      dbz("c", "null", """{"id":1,"amount":10.0}""", 1000),
      dbz("c", "null", """{"id":2,"amount":20.0}""", 1100),
      dbz("u", """{"id":1,"amount":10.0}""", """{"id":1,"amount":11.0}""", 1200),
      dbz("d", """{"id":2,"amount":20.0}""", "null", 1300)
    ).mkString("\n").getBytes("UTF-8"))

    val raw = spark.readStream.option("maxFilesPerTrigger", 10)
      .text(eventsDir).select(col("value").as("json"))
    val q = Consume.start(spark, CdcEnvelopes.debezium(raw), tables,
      s"$root/state", s"$root/ckpt", triggerInterval = "250 milliseconds")
    q.processAllAvailable(); q.stop()

    val store = new ParquetStateStore(spark, s"$root/state/shop/test")
    val state = Consume.currentState(tables.head, store).get
      .select("id", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(state == Set((1L, 11.0)))
  }

  test("debezium: truncate/message ops land in the dead letter, not the event stream") {
    // C3 principle: the reference silently drops op:"t"/"m" documents
    // (and so did this adapter until round 10) — truncate is
    // state-destroying, so it must be parked visibly instead
    val trunc = """{"payload":{"before":null,"after":null,"source":{"db":"shop","table":"test"},"op":"t","ts_ms":1400}}"""
    val msg = """{"payload":{"op":"m","ts_ms":1500}}"""
    val ins = """{"payload":{"before":null,"after":{"id":1},"source":{"db":"shop","table":"test"},"op":"c","ts_ms":1000}}"""
    val garbage = """not json at all"""
    val df = Seq(trunc, msg, ins, garbage).toDF("json")

    // the event stream carries ONLY the insert
    assert(rows(CdcEnvelopes.debezium(df, fallbackUnixtime = lit(9L))).map(_._3) == Seq("insert"))

    // the complement carries exactly the other three, with raw documents
    val dropped = CdcEnvelopes.debeziumDropped(df)
      .select("schema", "op", "raw").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(dropped == Set(
      ("shop", Some("t"), trunc),
      ("", Some("m"), msg),
      ("", None, garbage)))

    // parked in the dead-letter store under the reserved _envelope table
    val root = Files.createTempDirectory("dbzdrop").toString
    val dl = new graft.run.DeadLetter(spark, s"$root/dead")
    dl.recordDropped(CdcEnvelopes.debeziumDropped(df), batchId = 7L)
    val parked = dl.read("_envelope", "_dropped").get
    assert(parked.count() == 3)
    assert(parked.filter(col("op") === "t").select("raw").as[String].collect().toSeq == Seq(trunc))
    assert(parked.select("_batch_id").distinct().as[Long].collect().toSeq == Seq(7L))
    // idempotent on batch replay, like every other dead-letter path
    dl.recordDropped(CdcEnvelopes.debeziumDropped(df), batchId = 7L)
    assert(dl.read("_envelope", "_dropped").get.count() == 3)
  }

  test("wal2json: truncate kind and unparseable documents land in the dropped complement") {
    val ins = """{"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["id"],"columnvalues":[1]}]}"""
    val trunc = """{"change":[{"kind":"truncate","schema":"s","table":"t"}]}"""
    val mixed = """{"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["id"],"columnvalues":[2]},{"kind":"truncate","schema":"s","table":"t"}]}"""
    val garbage = """{"not":"wal2json"}"""
    val df = Seq(ins, trunc, mixed, garbage).toDF("json")

    // event stream: only the two inserts
    assert(rows(CdcEnvelopes.wal2json(df, eventUnixtime = lit(5L))).map(_._3) == Seq("insert", "insert"))

    val dropped = CdcEnvelopes.wal2jsonDropped(df)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getString(2))).toSet
    // both truncate elements (one from the mixed transaction) + the
    // unparseable document, each carrying its raw source document
    assert(dropped == Set(
      (Some("s"), Some("truncate"), trunc),
      (Some("s"), Some("truncate"), mixed),
      (None, None, garbage)))
  }

  test("wal2json: a change element with NO kind still lands in the dropped complement") {
    // regression: `!kind.isin(...)` is NULL for a null kind, and a bare
    // NOT-filter dropped the malformed element from the complement too —
    // gone from BOTH the event stream and the dead letter
    val nokind = """{"change":[{"schema":"s","table":"t","columnnames":["id"],"columnvalues":[1]}]}"""
    val df = Seq(nokind).toDF("json")
    assert(CdcEnvelopes.wal2json(df, eventUnixtime = lit(5L)).count() == 0)
    val dropped = CdcEnvelopes.wal2jsonDropped(df)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getString(2))).toSet
    assert(dropped == Set((Some("s"), None, nokind)))
  }

  test("wal2json: corrupt column arrays park in the dropped complement, never crash") {
    // regression: map_from_arrays THREW on a length mismatch / null or
    // duplicate column names, killing the whole micro-batch instead of
    // routing the document to the dead letter (C3)
    val mismatch = """{"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columnvalues":[1,2]}]}"""
    val nullName = """{"change":[{"kind":"insert","schema":"s","table":"t","columnnames":[null],"columnvalues":[1]}]}"""
    val dupName = """{"change":[{"kind":"update","schema":"s","table":"t","columnnames":["a","a"],"columnvalues":[1,2],"oldkeys":{"keynames":["a"],"keyvalues":[1]}}]}"""
    val good = """{"change":[{"kind":"insert","schema":"s","table":"t","columnnames":["a"],"columnvalues":[9]}]}"""
    val df = Seq(mismatch, nullName, dupName, good).toDF("json")
    val events = CdcEnvelopes.wal2json(df, eventUnixtime = lit(1L)).collect()
    assert(events.length == 1 && events.head.getAs[String]("values").contains("9"),
      "only the sane document becomes an event")
    val dropped = CdcEnvelopes.wal2jsonDropped(df).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(dropped == Set(
      ("insert", mismatch), ("insert", nullName), ("update", dupName)))
  }
}
