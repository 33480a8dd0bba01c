package graft.sink

import graft.SparkSpec
import graft.model.Engine
import graft.run.{Consume, TableSync}
import graft.sink.SinkStrategy.CompactionPolicy
import graft.streaming.EventSource
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._

/** Compaction scheduling (the OPTIMIZE-analog trigger): the pure decision
  * function, and the E2E invariant that under continuous ingest with a
  * policy the store's version count stays bounded while state stays
  * correct.
  */
class CompactionPolicySpec extends SparkSpec {

  test("shouldCompact triggers on delta count or delta/base size ratio") {
    val pol = CompactionPolicy(maxDeltaVersions = 3, maxDeltaToBaseRatio = 0.5)
    def delta(v: Long, bytes: Long) = (v, bytes, false)
    def base(v: Long, bytes: Long) = (v, bytes, true)
    // under both thresholds → no
    assert(!SinkStrategy.shouldCompact(Seq(base(0, 1000), delta(1, 100)), pol))
    // count trigger, regardless of size
    assert(SinkStrategy.shouldCompact(
      Seq(base(0, 1000), delta(1, 1), delta(2, 1), delta(3, 1), delta(4, 1)), pol))
    // ratio trigger: 600 delta bytes vs 1000 base at 0.5
    assert(SinkStrategy.shouldCompact(Seq(base(0, 1000), delta(1, 600)), pol))
    // no base yet: only the count trigger rules
    assert(!SinkStrategy.shouldCompact(Seq(delta(0, 1000000), delta(1, 1000000)), pol))
    assert(SinkStrategy.shouldCompact(
      Seq(delta(0, 1), delta(1, 1), delta(2, 1), delta(3, 1)), pol))
  }

  test("policy-driven consume keeps version count bounded across many micro-batches") {
    val root = Files.createTempDirectory("cpol").toString
    val eventsDir = s"$root/events"; Files.createDirectories(Paths.get(eventsDir))
    val vs = StructType(Seq(StructField("id", LongType), StructField("amount", DoubleType)))
    val t = TableSync("db", "r", vs, Seq("id"), Engine.ReplacingMergeTree)
    val store = new ParquetStateStore(spark, s"$root/state/db/r")
    val pol = CompactionPolicy(maxDeltaVersions = 3, maxDeltaToBaseRatio = 1e9)

    def ev(id: Long, amount: Double, ts: Long): String =
      s"""{"schema":"db","table":"r","action":"insert","values":"{\\"id\\":$id,\\"amount\\":$amount}","event_unixtime":$ts,"action_seq":2}"""

    // 12 single-file micro-batches (maxFilesPerTrigger=1 in EventSource
    // would still batch by trigger; drive them through repeated restarts
    // so each file is its own micro-batch deterministically)
    (0 until 12).foreach { i =>
      Files.write(Paths.get(eventsDir, f"b$i%02d.json"),
        Seq(ev(i % 4, i * 1.0, 100 + i)).mkString.getBytes("UTF-8"))
      val q = Consume.start(spark,
        EventSource.files(spark, eventsDir, maxFilesPerTrigger = 1),
        Seq(t), s"$root/state", s"$root/ckpt",
        triggerInterval = "100 milliseconds", compactionPolicy = Some(pol))
      q.processAllAvailable(); q.stop()
    }

    // bounded: at most maxDeltaVersions deltas + 1 compacted base survive
    val stats = store.versionStats()
    assert(stats.count(!_._3) <= pol.maxDeltaVersions + 1,
      s"unbounded delta count: $stats")
    assert(stats.size < 12, s"no compaction ever ran: $stats")
    // and the state is still exactly the last write per key
    val state = Consume.currentState(t, store).get
      .select("id", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(state == Set((0L, 8.0), (1L, 9.0), (2L, 10.0), (3L, 11.0)))
  }
}
