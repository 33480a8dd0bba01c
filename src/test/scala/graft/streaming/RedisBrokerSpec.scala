package graft.streaming

import graft.SparkSpec
import graft.model.Engine
import graft.run.{Consume, TableSync}
import graft.sink.ParquetStateStore
import graft.sources.FakeRedisServer
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** The Redis-Streams transport end-to-end over a real socket: wire JSON
  * XADDed through [[RedisBroker.send]], XREAD-polled into staging files,
  * streamed by EventSource.files through the Consume apply loop into
  * engine state — the reference's redis broker leg
  * (synch/broker/redis.py) with its commit/resume and MAXLEN contracts.
  */
class RedisBrokerSpec extends SparkSpec {

  private val valueSchema = StructType(Seq(
    StructField("id", LongType), StructField("amount", DoubleType)))

  private def ev(table: String, action: String, id: Long, amount: Double,
                 ts: Long): String = {
    val seq = if (action == "delete") 1 else 2
    s"""{"schema":"db","table":"$table","action":"$action","values":"{\\"id\\":$id,\\"amount\\":$amount}","event_unixtime":$ts,"action_seq":$seq}"""
  }

  test("XADD -> XREAD poll -> staged files -> consume loop -> resolved state") {
    val server = new FakeRedisServer
    try {
      val root = Files.createTempDirectory("redis-broker").toString
      val staging = s"$root/staging"
      val broker = new RedisBroker("127.0.0.1", server.port, "mysql_db")

      broker.send("db", ev("mt", "insert", 1, 10.0, 100))
      broker.send("db", ev("mt", "insert", 2, 20.0, 110))
      broker.send("db", ev("mt", "update", 1, 11.0, 200))
      broker.send("db", ev("mt", "delete", 2, 20.0, 300))
      assert(broker.length("db") == 4)

      assert(broker.drainToStaging("db", staging) == 4)
      // committed high-water mark persisted broker-side (reference commit)
      assert(broker.lastCommittedId("db") == "0-4")
      // a fresh poll from the committed id stages nothing
      assert(broker.pollToStaging("db", staging) == 0)

      val tables = Seq(
        TableSync("db", "mt", valueSchema, Seq("id"), Engine.MergeTree))
      val q = Consume.start(spark, EventSource.files(spark, staging),
        tables, s"$root/state", s"$root/ckpt",
        triggerInterval = "250 milliseconds")
      q.processAllAvailable(); q.stop()

      val st = Consume.currentState(tables.head,
        new ParquetStateStore(spark, s"$root/state/db/mt")).get
        .select("id", "amount").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(st == Set((1L, 11.0)))
      broker.close()
    } finally server.close()
  }

  test("resume: a NEW broker instance continues from the committed id") {
    val server = new FakeRedisServer
    try {
      val root = Files.createTempDirectory("redis-resume").toString
      val staging = s"$root/staging"
      val b1 = new RedisBroker("127.0.0.1", server.port, "a")
      b1.send("db", ev("t", "insert", 1, 1.0, 100))
      b1.send("db", ev("t", "insert", 2, 2.0, 110))
      assert(b1.drainToStaging("db", staging) == 2)
      b1.close()

      val b2 = new RedisBroker("127.0.0.1", server.port, "a")
      b2.send("db", ev("t", "insert", 3, 3.0, 120))
      // only the post-commit entry is staged — no re-delivery of 1..2
      assert(b2.pollToStaging("db", staging) == 1)
      assert(b2.lastCommittedId("db") == "0-3")
      val staged = Files.list(Paths.get(staging)).toArray.map(_.toString)
        .filter(_.endsWith(".txt")).sorted
      assert(staged.length == 2)
      // id-range-derived names: a crashed re-poll would overwrite, not dup
      // zero-padded id ranges: lexicographic name order = poll order
      // (the consume loop's cross-file DDL tiebreak sorts on the name)
      def pad(ms: Long, sq: Long) = f"$ms%020d-$sq%020d"
      assert(staged.exists(_.endsWith(s"db-${pad(0, 1)}-${pad(0, 2)}.txt")) &&
             staged.exists(_.endsWith(s"db-${pad(0, 3)}-${pad(0, 3)}.txt")))
      b2.close()
    } finally server.close()
  }

  test("Produce.toRedis XADDs each micro-batch in (event_unixtime, action_seq) " +
    "order through one serial connection") {
    val server = new FakeRedisServer
    try {
      val root = Files.createTempDirectory("redis-produce").toString
      val rawDir = s"$root/raw"; Files.createDirectories(Paths.get(rawDir))
      // deliberately out of time order in the file: the producer must
      // restore binlog order before XADD (stream order IS apply order)
      val lines = Seq(
        ev("t", "update", 1, 11.0, 300),
        ev("t", "insert", 1, 10.0, 100),
        ev("t", "insert", 2, 20.0, 200))
      Files.write(Paths.get(rawDir, "raw.json"), lines.mkString("\n").getBytes)

      val q = graft.run.Produce.toRedis(spark,
        EventSource.files(spark, rawDir),
        () => new RedisBroker("127.0.0.1", server.port, "mysql_db"),
        s"$root/ckpt", triggerInterval = "200 milliseconds")
      q.processAllAvailable(); q.stop()

      // read the stream back raw and check XADD order = time order
      val client = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        val reply = client.command("XREAD", "COUNT", "100", "STREAMS",
          "synch:mysql_db:db", "0").asInstanceOf[Seq[Seq[Any]]]
        val entries = reply.head(1).asInstanceOf[Seq[Seq[Any]]]
        val times = entries.map(_(1).asInstanceOf[Seq[String]])
          .map(f => f.grouped(2).collectFirst { case Seq("msg", v) => v }.get)
          .map(v => "\"event_unixtime\":(\\d+)".r.findFirstMatchIn(v).get.group(1).toLong)
        assert(times == Seq(100L, 200L, 300L))
      } finally client.close()
    } finally server.close()
  }

  test("sendBatch pipelines XADDs: order preserved across schemas, one " +
    "round-trip per chunk") {
    val server = new FakeRedisServer
    try {
      val broker = new RedisBroker("127.0.0.1", server.port, "p")
      broker.sendBatch((1 to 100).map(i =>
        (if (i % 2 == 0) "even" else "odd") -> s"""{"i":$i}"""))
      assert(broker.length("even") == 50 && broker.length("odd") == 50)
      val root = Files.createTempDirectory("redis-pipe").toString
      assert(broker.drainToStaging("odd", s"$root/s") == 50)
      val staged = Files.list(Paths.get(s"$root/s")).toArray.map(_.toString)
        .filter(_.endsWith(".txt"))
      val is = staged.sorted.flatMap(f =>
        new String(Files.readAllBytes(Paths.get(f))).linesIterator)
        .map(l => "\"i\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toInt).toSeq
      assert(is == (1 to 100 by 2), "per-stream order must be send order")
      broker.close()
    } finally server.close()
  }

  test("multi-alias consume: two sources' streams drain into one consume loop") {
    // regression: the CLI's redis leg polled only the FIRST source's
    // alias, so a multi-source config bootstrapped every table and then
    // silently starved all but one source forever. The fix drains each
    // alias into its own staging subdir (staged names are schema+id
    // derived and two aliases can share a schema name) read via a glob.
    val server = new FakeRedisServer
    try {
      val root = Files.createTempDirectory("redis-multi").toString
      val staging = s"$root/staging"
      val b1 = new RedisBroker("127.0.0.1", server.port, "a1")
      val b2 = new RedisBroker("127.0.0.1", server.port, "a2")
      // SAME schema name under both aliases — the staged-file collision case
      b1.send("db", ev("t1", "insert", 1, 10.0, 100))
      b2.send("db", ev("t2", "insert", 2, 20.0, 100))
      assert(b1.drainToStaging("db", s"$staging/a1") == 1)
      assert(b2.drainToStaging("db", s"$staging/a2") == 1)

      val tables = Seq(
        TableSync("db", "t1", valueSchema, Seq("id"), Engine.ReplacingMergeTree),
        TableSync("db", "t2", valueSchema, Seq("id"), Engine.ReplacingMergeTree))
      val q = Consume.start(spark, EventSource.files(spark, s"$staging/*"),
        tables, s"$root/state", s"$root/ckpt",
        triggerInterval = "250 milliseconds")
      q.processAllAvailable(); q.stop()

      // BOTH sources' tables received their events
      for ((t, id, amt) <- Seq(("t1", 1L, 10.0), ("t2", 2L, 20.0))) {
        val st = Consume.currentState(
          tables.find(_.table == t).get,
          new ParquetStateStore(spark, s"$root/state/db/$t")).get
          .select("id", "amount").collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSet
        assert(st == Set((id, amt)), s"table $t")
      }
      b1.close(); b2.close()
    } finally server.close()
  }

  test("sendBatchAt: a crash-replayed batch re-sends the same ids and dedupes exactly") {
    // the idempotent produce leg: explicit <batchId>-<seq> entry ids make
    // Redis itself reject the already-delivered prefix, so a stop()-
    // interrupted batch replay cannot double-produce (a Collapsing-family
    // consumer would otherwise keep a net +2 row no delete cancels)
    val server = new FakeRedisServer
    try {
      val broker = new RedisBroker("127.0.0.1", server.port, "p")
      val full = Seq(("db", "7-1", """{"i":1}"""),
        ("db", "7-2", """{"i":2}"""), ("db", "7-3", """{"i":3}"""))
      broker.sendBatchAt(full.take(2)) // crash after a partial pipeline
      broker.sendBatchAt(full)         // restart replays the WHOLE batch
      assert(broker.length("db") == 3, "replayed prefix must dedupe")
      broker.sendBatchAt(full)         // full second replay adds nothing
      assert(broker.length("db") == 3)
      broker.sendBatchAt(Seq(("db", "8-1", """{"i":4}"""))) // next batch
      assert(broker.length("db") == 4)

      // the foreign-top guard that keeps the replay-swallow honest: a
      // stream whose top is beyond the batch being produced (foreign
      // auto ids, reset remnants) must throw, not be silently absorbed
      broker.guardForeignTop("db", batchId = 8L) // replay of 8: fine
      broker.guardForeignTop("db", batchId = 9L) // next batch: fine
      val reset = intercept[IllegalStateException] {
        broker.guardForeignTop("db", batchId = 3L) // top is 8-1
      }
      assert(reset.getMessage.contains("ahead of produce batch"))
      broker.guardForeignTop("fresh-stream", 0L) // empty stream: fine
      // the produce commit hash: the replay/reset discriminator
      assert(broker.producedBatch("db") == -1L)
      broker.commitProduced("db", 8L, applied = true, digest = 0xabcL)
      assert(broker.producedBatch("db") == 8L)
      assert(broker.producedDigest("db").contains((8L, 0xabcL)))
      broker.commitProducedAll(Seq("db", "db2"), 9L, Set("db", "db2"),
        Map("db" -> -1L)) // multi-pair HSET; digest only for db
      assert(broker.producedBatch("db") == 9L && broker.producedBatch("db2") == 9L)
      // unsigned hex round-trip for a negative digest; db2 keeps its
      // absent record (never written blank)
      assert(broker.producedDigest("db").contains((9L, -1L)))
      assert(broker.producedDigest("db2").isEmpty)
      // a foreign top entry WITHOUT a msg field still yields its id —
      // treating it as an empty stream would disable the guard entirely
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("XADD", "synch:p:foreign", "999-1", "payload", "x")
      finally raw.close()
      assert(broker.lastEntry("foreign").map(_._1).contains("999-1"))
      val foreign = intercept[IllegalStateException] {
        broker.guardForeignTop("foreign", batchId = 5L)
      }
      assert(foreign.getMessage.contains("ahead of produce batch"))
      broker.close()
    } finally server.close()
  }

  test("toRedis refuses a reset checkpoint that restarts on the stream's top batch id") {
    // the equal-batch-id hole: first run produces batch 0, the checkpoint
    // is wiped, a fresh run restarts at batch 0 with DIFFERENT data — the
    // replay swallow would silently drop it all; the content check at the
    // stream's top seq must fail the batch instead
    val server = new FakeRedisServer
    try {
      val root = Files.createTempDirectory("redis-reset").toString
      def runProduce(rawDir: String, ckpt: String): Unit = {
        val q = graft.run.Produce.toRedis(spark,
          EventSource.files(spark, rawDir),
          () => new RedisBroker("127.0.0.1", server.port, "rst"),
          ckpt, triggerInterval = "200 milliseconds")
        try { q.processAllAvailable() } finally q.stop()
      }
      val raw1 = s"$root/raw1"; Files.createDirectories(Paths.get(raw1))
      Files.write(Paths.get(raw1, "a.json"),
        ev("t", "insert", 1, 10.0, 100).getBytes)
      runProduce(raw1, s"$root/ckpt1")
      val broker = new RedisBroker("127.0.0.1", server.port, "rst")
      assert(broker.length("db") == 1)

      // fresh checkpoint (the reset), different raw data, same batch id 0
      val raw2 = s"$root/raw2"; Files.createDirectories(Paths.get(raw2))
      Files.write(Paths.get(raw2, "b.json"),
        ev("t", "insert", 99, 77.0, 500).getBytes)
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        runProduce(raw2, s"$root/ckpt2")
      }
      assert(err.getMessage.contains("refusing to silently drop") ||
        Option(err.getCause).exists(_.getMessage.contains("refusing to silently drop")))
      assert(broker.length("db") == 1, "nothing from the reset run may land")
      broker.close()
    } finally server.close()
  }

  test("MAXLEN caps the stream; count-limited polls page through it") {
    val server = new FakeRedisServer
    try {
      val root = Files.createTempDirectory("redis-maxlen").toString
      val broker = new RedisBroker("127.0.0.1", server.port, "b",
        queueMaxLen = 5)
      for (i <- 1 to 8)
        broker.send("db", ev("t", "insert", i.toLong, i.toDouble, 100L + i))
      // queue trimmed to the newest 5 (reference queue_max_len)
      assert(broker.length("db") == 5)
      // page in micro-batches of 2: 5 entries -> 2 + 2 + 1
      val staged = Seq(
        broker.pollToStaging("db", s"$root/s", count = 2),
        broker.pollToStaging("db", s"$root/s", count = 2),
        broker.pollToStaging("db", s"$root/s", count = 2),
        broker.pollToStaging("db", s"$root/s", count = 2))
      assert(staged == Seq(2, 2, 1, 0))
      broker.close()
    } finally server.close()
  }
}
