package graft.streaming

import graft.SparkSpec
import graft.sources.FakeRedisServer
import java.nio.file.Files

/** Diagnostic: wire throughput of the Redis-Streams transport at volume
  * (pipelined XADD produce, XREAD micro-batch drain) against the
  * reference's configured flush envelope (synch.yaml `insert_num: 20000`
  * / `insert_interval: 60` ⇒ a ~333 events/s floor). Loopback RESP over
  * the in-process fake server — measures OUR client/framing costs, not
  * Redis itself. Not a correctness gate; set GRAFT_PROFILE=1 to run.
  */
class RedisThroughputSpec extends SparkSpec {
  test("pipelined produce + micro-batch drain rates at 200k events") {
    assume(sys.env.get("GRAFT_PROFILE").isDefined,
      "diagnostic only - set GRAFT_PROFILE=1 to run")
    val n = 200000
    val server = new FakeRedisServer
    try {
      val root = Files.createTempDirectory("redis-throughput").toString
      val broker = new RedisBroker("127.0.0.1", server.port, "prof",
        queueMaxLen = n + 1L)
      val msgs = (1 to n).map(i =>
        "db" -> s"""{"schema":"db","table":"t","action":"insert","values":"{\\"id\\":$i}","event_unixtime":${100L + i},"action_seq":2}""")

      val t0 = System.nanoTime()
      msgs.grouped(512).foreach(chunk => broker.sendBatch(chunk))
      val produceS = (System.nanoTime() - t0) / 1e9
      assert(broker.length("db") == n)

      val t1 = System.nanoTime()
      var drained = 0L
      var got = broker.pollToStaging("db", s"$root/s", count = 20000)
      while (got > 0) { drained += got; got = broker.pollToStaging("db", s"$root/s", count = 20000) }
      val drainS = (System.nanoTime() - t1) / 1e9
      assert(drained == n)

      System.err.println(f"[redis] produce (pipelined XADD): $n%d events in " +
        f"$produceS%.2f s = ${n / produceS}%,.0f ev/s")
      System.err.println(f"[redis] drain (XREAD 20k polls):   $n%d events in " +
        f"$drainS%.2f s = ${n / drainS}%,.0f ev/s")
      broker.close()
    } finally server.close()
  }
}
