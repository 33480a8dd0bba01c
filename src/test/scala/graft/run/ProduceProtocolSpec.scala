package graft.run

import graft.sources.FakeRedisServer
import graft.streaming.RedisBroker
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial crash-matrix for the exactly-once Redis produce protocol
  * ([[Produce.produceBatch]] + [[RedisBroker]]'s producedBatch/
  * guardForeignTop/sendBatchAt/commitProducedAll): every crash point ×
  * resume must leave the stream byte-identical to a no-crash run, and
  * every adversary shape (foreign XADD above / inside / beyond the batch
  * id space, MAXLEN trim, checkpoint reset onto a diverged stream) must
  * either be provably harmless or fail loudly — never silently drop or
  * corrupt events. The broker under test is the REAL RedisBroker over a
  * real socket; crashes are injected at command boundaries
  * ([[FakeRedisServer.failAfterWrites]] — the write is not applied and
  * the connection dies, a producer killed mid-pipeline) and at row
  * boundaries (a throwing row iterator — a producer killed between
  * chunks).
  *
  * No Spark session needed: the protocol is driver-side by design.
  */
class ProduceProtocolSpec extends AnyFunSuite {

  private def ev(schema: String, i: Int): String =
    s"""{"s":"$schema","n":$i,"payload":"p$i"}"""

  /** Deterministic interleaved two-schema workload for batch `b`. */
  private def batchRows(b: Int, n: Int): Seq[(String, String)] =
    (1 to n).map(i =>
      (if (i % 3 == 0) "db2" else "db1", ev(if (i % 3 == 0) "db2" else "db1", b * 10000 + i)))

  private val schemas = Seq("db1", "db2")
  private def key(s: String) = s"synch:a:$s"

  private def withServer[T](f: FakeRedisServer => T): T = {
    val server = new FakeRedisServer
    try f(server) finally server.close()
  }

  private def broker(server: FakeRedisServer, maxLen: Long = 1000000L) =
    new RedisBroker("127.0.0.1", server.port, alias = "a", queueMaxLen = maxLen)

  private def runBatch(server: FakeRedisServer, rows: Seq[(String, String)],
                       batchId: Long, maxLen: Long = 1000000L): Unit = {
    val b = broker(server, maxLen)
    try Produce.produceBatch(b, rows.iterator, batchId)
    finally b.close()
  }

  /** Full server state relevant to the protocol: every stream's (id,
    * fields) plus the produced-batch commit hash. */
  private def snapshot(server: FakeRedisServer): Map[String, Any] =
    schemas.map(s => s -> server.dumpStream(key(s))).toMap +
      ("produced" -> server.dumpHash("synch:a:produced_batch")) +
      ("maxlen" -> server.dumpHash("synch:a:produced_maxlen")) +
      ("digest" -> server.dumpHash("synch:a:produced_digest")) +
      ("state" -> server.dumpHash("synch:a:produced_state"))

  /** The no-crash reference state after the given batches. */
  private def reference(batches: Seq[(Long, Seq[(String, String)])],
                        maxLen: Long = 1000000L): Map[String, Any] =
    withServer { server =>
      batches.foreach { case (id, rows) => runBatch(server, rows, id, maxLen) }
      snapshot(server)
    }

  // ---------------------------------------------------------------------
  // Crash matrix: command-boundary crashes at every interesting write
  // count, then resume; final state must equal the no-crash reference.
  // Batch 0 is 40 XADD writes + the commit pipeline's cap-record HSET
  // (41), digest HSET (42), state-pin HSET (43 — r13), and produced-
  // batch HSET (44). Crash points: before any XADD (0), first XADD (1),
  // mid pipeline (7, 23), last XADD (39), all XADDs but no commit write
  // (40), and every partial-commit boundary (41-43): each leaves some
  // records naming batch 0 while produced still says "nothing" — the
  // resume's reject-only replay must ignore the forward-dated records
  // (they are keyed by batch id) and still converge byte-identically,
  // overwriting them at its own commit.
  // ---------------------------------------------------------------------
  test("crash at every command boundary of batch 0, then resume, is byte-identical") {
    val b0 = batchRows(0, 40); val b1 = batchRows(1, 40)
    val ref = reference(Seq(0L -> b0, 1L -> b1))
    for (crashAt <- Seq(0L, 1L, 7L, 23L, 39L, 40L, 41L, 42L, 43L)) {
      withServer { server =>
        server.failAfterWrites(crashAt)
        val crashed = intercept[Exception] { runBatch(server, b0, 0L) }
        assert(!crashed.isInstanceOf[IllegalStateException],
          s"crashAt=$crashAt: protocol error instead of transport crash: $crashed")
        server.failAfterWrites(-1) // "restart"
        runBatch(server, b0, 0L) // Spark replays the uncommitted batch
        runBatch(server, b1, 1L)
        assert(snapshot(server) == ref, s"state diverged after crashAt=$crashAt")
      }
    }
  }

  test("crash between pipelined chunks (row-boundary) then resume is byte-identical") {
    // >512 rows forces multiple sendBatchAt flushes; a throwing iterator
    // models a producer killed between chunks (some chunks applied)
    val big = batchRows(0, 1100)
    val ref = reference(Seq(0L -> big))
    for (crashRow <- Seq(1, 511, 512, 513, 1024, 1099)) {
      withServer { server =>
        val b = broker(server)
        val it = big.iterator.zipWithIndex.map { case (r, i) =>
          if (i == crashRow) throw new RuntimeException("producer killed")
          r
        }
        intercept[RuntimeException] {
          try Produce.produceBatch(b, it, 0L) finally b.close()
        }
        runBatch(server, big, 0L)
        assert(snapshot(server) == ref, s"state diverged after crashRow=$crashRow")
      }
    }
  }

  test("crash after commit but before checkpoint (full batch replay) is a verified no-op") {
    val b0 = batchRows(0, 40)
    val ref = reference(Seq(0L -> b0))
    withServer { server =>
      runBatch(server, b0, 0L)
      runBatch(server, b0, 0L) // checkpoint never advanced: Spark replays
      assert(snapshot(server) == ref)
    }
  }

  test("crash mid-XADD + replay + crash mid-commit + replay still converges") {
    // two successive crashes in one batch's lifetime: partial XADD, then
    // all XADDs but a dead commit, then a clean third attempt
    val b0 = batchRows(0, 40); val b1 = batchRows(1, 40)
    val ref = reference(Seq(0L -> b0, 1L -> b1))
    withServer { server =>
      server.failAfterWrites(13)
      intercept[Exception] { runBatch(server, b0, 0L) }
      // replay: 27 remaining XADDs apply (13 replays rejected as dup,
      // costing no writes), then the commit HSET dies
      server.failAfterWrites(27)
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      runBatch(server, b0, 0L)
      runBatch(server, b1, 1L)
      assert(snapshot(server) == ref)
    }
  }

  // ---------------------------------------------------------------------
  // Adversaries
  // ---------------------------------------------------------------------
  test("foreign XADD with a realistic (wall-clock) id after a crash fails loudly") {
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(7)
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      val foreign = new graft.sources.RespClient("127.0.0.1", server.port)
      try foreign.command("XADD", key("db1"), "1755000000000-0", "msg", "{intruder}")
      finally foreign.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("foreign"), e.getMessage)
    }
  }

  test("foreign XADD crafted INSIDE the batch id space fails loudly (occupied seq)") {
    // the nastiest shape: after a partial crash the adversary writes the
    // NEXT id our replay would use, with different bytes — the replay's
    // XADD would be reject-swallowed and the event silently corrupted if
    // the send-mode top verification didn't byte-check that seq
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(7) // applied XADDs end at some 0-seq id
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      val bk = broker(server)
      val topSeq = try bk.lastEntry("db1").get._1.split("-")(1).toLong
      finally bk.close()
      val foreign = new graft.sources.RespClient("127.0.0.1", server.port)
      try foreign.command("XADD", key("db1"), s"0-${topSeq + 1}", "msg", "{intruder}")
      finally foreign.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("DIFFERENT event") ||
        e.getMessage.contains("never reproduced"), e.getMessage)
    }
  }

  test("two crafted foreign entries: interior divergence under a byte-identical forged top fails loudly") {
    // r12: the top-only send-mode verification PASSED this attack — the
    // adversary forges a byte-exact copy of a later event as the stream
    // top and hides a diverged entry beneath it; the replay's XADDs at
    // and below the top were reject-swallowed, silently replacing our
    // event with the forged interior. The full-prefix verification
    // (RedisBroker.entriesOfBatch) byte-checks every surviving entry.
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(7)
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      val bk = broker(server)
      val topSeq = try bk.lastEntry("db1").get._1.split("-")(1).toLong
      finally bk.close()
      // the next two db1 global seqs after the partial's top: forge a
      // diverged interior at the first, a byte-exact copy at the second
      val db1Seqs = b0.zipWithIndex.collect {
        case ((sch, _), i) if sch == "db1" => (i + 1).toLong
      }
      val Seq(s1, s2) = db1Seqs.filter(_ > topSeq).take(2).toSeq
      val foreign = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        foreign.command("XADD", key("db1"), s"0-$s1", "msg", "{evil-interior}")
        foreign.command("XADD", key("db1"), s"0-$s2", "msg", b0(s2.toInt - 1)._2)
      } finally foreign.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("DIFFERENT event"), e.getMessage)
    }
  }

  test("foreign XADD beyond the batch's last seq fails loudly (top never reproduced)") {
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(7)
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      // 40 rows -> max global seq 40; plant a top at seq 50
      val foreign = new graft.sources.RespClient("127.0.0.1", server.port)
      try foreign.command("XADD", key("db1"), "0-50", "msg", "{intruder}")
      finally foreign.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("never reproduced"), e.getMessage)
    }
  }

  test("MAXLEN trim: committed-batch replay tolerates a trimmed head, verifies the top") {
    // stream cap 10 < 27 db1-events: after the commit the head of the
    // batch is gone; a full replay (skip mode) must trust the commit —
    // trim is the only explanation consistent with surviving pre-batch
    // ids — and still byte-verify the surviving top
    val b0 = batchRows(0, 40)
    val ref = reference(Seq(0L -> b0), maxLen = 10L)
    withServer { server =>
      runBatch(server, b0, 0L, maxLen = 10L)
      runBatch(server, b0, 0L, maxLen = 10L) // replay after checkpoint loss
      assert(snapshot(server) == ref)
    }
  }

  test("a missing batch head on an UNTRIMMED stream fails loudly (XLEN evidence)") {
    // trimming never takes a stream below its MAXLEN cap and nothing
    // else deletes entries — so when the stream sits under the cap, a
    // batch whose copy starts mid-way is a diverged reset, not a trim,
    // and 'trust the commit' would be the silent-drop shape. Manufacture
    // it: commit batch 0 broker-side while the stream only ever held the
    // batch's TAIL (as a tampered/partially-copied stream would).
    val b0 = batchRows(0, 40)
    withServer { server =>
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        (10 to 40).foreach(i => raw.command(
          "XADD", key("db1"), s"0-$i", "msg", s"tail-$i"))
        raw.command("HSET", "synch:a:produced_batch", "db1", "0", "db2", "0")
        (1 to 40).foreach(i => raw.command(
          "XADD", key("db2"), s"0-$i", "msg", "x"))
      } finally raw.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("cannot explain the gap"), e.getMessage)
    }
  }

  test("a committed batch ABSENT from an empty stream fails loudly (restored backup)") {
    // trimming eats oldest first and never empties a stream — an empty
    // stream whose produced_batch commit names this batch means the key
    // was deleted or restored from a pre-batch backup; 'trust the
    // commit' here would silently lose the entire batch
    val b0 = batchRows(0, 40)
    withServer { server =>
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("HSET", "synch:a:produced_batch", "db1", "0", "db2", "0")
      finally raw.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("restored from a pre-batch backup"), e.getMessage)
    }
  }

  test("a committed batch absent while OLDER entries survive fails loudly") {
    // stream tops out below the committed batch: impossible under
    // trimming (the batch's entries were the newest at commit time and
    // older ones survive) — a restore, not a trim
    val b1 = batchRows(1, 40)
    withServer { server =>
      runBatch(server, batchRows(0, 40), 0L) // a real batch 0 in the stream
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("HSET", "synch:a:produced_batch", "db1", "1", "db2", "1")
      finally raw.close()
      val e = intercept[IllegalStateException] { runBatch(server, b1, 1L) }
      assert(e.getMessage.contains("tops out at") &&
        e.getMessage.contains("restored from a pre-batch backup"), e.getMessage)
    }
  }

  test("RAISING the cap across a replay still recognizes the old trim (recorded cap)") {
    // the stream was trimmed under cap 10; the replay runs with cap 1M.
    // Without the produce-time cap record, XLEN(10+13) < 1M would read as
    // 'never trimmed' and the genuinely-trimmed head would be refused —
    // a loud false refusal. The recorded cap makes the replay a no-op.
    val b0 = batchRows(0, 40)
    val ref = reference(Seq(0L -> b0), maxLen = 10L)
    withServer { server =>
      runBatch(server, b0, 0L, maxLen = 10L)
      runBatch(server, b0, 0L, maxLen = 1000000L) // raised cap, same stream
      assert(snapshot(server) == ref)
    }
  }

  test("LOWERING the cap cannot launder a tampered head as a trim (recorded cap)") {
    // the stream was produced (and its cap recorded) at 1M and NEVER
    // trimmed; it then loses its head (tamper/partial restore). A replay
    // whose broker is configured with a tiny cap must still refuse:
    // trim plausibility is judged against the RECORDED cap, not the
    // replayer's configuration.
    val b0 = batchRows(0, 40)
    withServer { server =>
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        (10 to 40).foreach(i => raw.command(
          "XADD", key("db1"), s"0-$i", "msg", s"tail-$i"))
        raw.command("HSET", "synch:a:produced_batch", "db1", "0", "db2", "0")
        raw.command("HSET", "synch:a:produced_maxlen", "db1", "1000000", "db2", "1000000")
        (1 to 40).foreach(i => raw.command(
          "XADD", key("db2"), s"0-$i", "msg", "x"))
      } finally raw.close()
      val e = intercept[IllegalStateException] {
        runBatch(server, b0, 0L, maxLen = 10L) // replayer configured tiny
      }
      assert(e.getMessage.contains("cannot explain the gap"), e.getMessage)
    }
  }

  test("r13 frozen-state pin: post-commit head deletion fails the skip replay exactly") {
    // end-to-end: the r13 produce records (first, last, length) with the
    // commit; between commit and skip replay nothing XADDs, so nothing
    // can trim — ANY drift is foreign. Delete the surviving head after
    // a genuinely-trimmed commit: the state pin must fire (and fire
    // FIRST, before the cap heuristics it replaces).
    val b0 = batchRows(0, 40)
    withServer { server =>
      runBatch(server, b0, 0L, maxLen = 10L)
      val state = server.dumpHash("synch:a:produced_state")
      assert(state.contains("db1") && state("db1").startsWith("0:"),
        s"commit must record the state pin: $state")
      val head = server.dumpStream(key("db1")).head._1
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("XDEL", key("db1"), head) finally raw.close()
      val e = intercept[IllegalStateException] {
        runBatch(server, b0, 0L, maxLen = 10L)
      }
      assert(e.getMessage.contains("stream state changed"), e.getMessage)
    }
  }

  test("the r11/r12 lazy-~ residual is CLOSED for state-pinned streams, open only for legacy ones") {
    // The formerly-pinned residual: a never-trimmed stream sitting at or
    // above its recorded cap (real `MAXLEN ~` trims lazily) whose batch
    // head was deleted is indistinguishable from a genuine trim by the
    // cap heuristic — length >= cap proves a trim was REACHABLE, not
    // that one occurred. Craft that exact shape twice:
    //   A. pre-r13 stream (no produced_state record): the replay
    //      TOLERATES the missing head — the residual, now confined to
    //      legacy streams and formally waived in RUNBOOK §6;
    //   B. same stream WITH the producer's state record naming the
    //      pre-tamper truth: the replay refuses via the frozen-state pin.
    val b0 = batchRows(0, 40)
    def db1Msgs(from: Int) =
      (from to 40).filter(_ % 3 != 0).map(i => i -> ev("db1", i))
    def craft(server: FakeRedisServer, db1From: Int,
              stateRecord: Option[String]): Unit = {
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        db1Msgs(db1From).foreach { case (i, m) =>
          raw.command("XADD", key("db1"), s"0-$i", "msg", m) }
        (1 to 40).filter(_ % 3 == 0).foreach(i =>
          raw.command("XADD", key("db2"), s"0-$i", "msg", ev("db2", i)))
        raw.command("HSET", "synch:a:produced_batch", "db1", "0", "db2", "0")
        // cap 10 with 23-24 surviving entries: the lazy-trim shape —
        // length >= cap, so the heuristic presumes a trim was possible
        raw.command("HSET", "synch:a:produced_maxlen", "db1", "10", "db2", "1000000")
        stateRecord.foreach(s =>
          raw.command("HSET", "synch:a:produced_state", "db1", s,
            "db2", s"0:0-3:0-39:${(1 to 40).count(_ % 3 == 0)}"))
      } finally raw.close()
    }
    withServer { server => // A: legacy stream, head 0-5 "deleted" pre-craft
      craft(server, db1From = 7, stateRecord = None)
      runBatch(server, b0, 0L) // tolerated — the confined legacy window
      assert(server.dumpStream(key("db1")).head._1 == "0-7")
    }
    withServer { server => // B: state-pinned stream, same tamper
      craft(server, db1From = 7,
        stateRecord = Some(s"0:0-5:0-40:${db1Msgs(5).size}"))
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("stream state changed"), e.getMessage)
    }
  }

  test("r14 upgrade: pinExistingState retires the legacy waiver and its skip replay verifies exact state") {
    // RUNBOOK §6 waiver #1: a pre-r13 stream has no state pin, so its
    // skip replay falls back to the cap heuristics and the lazy-~
    // residual applies (test A above tolerates a deleted head).
    // `Main streams --upgrade` (RedisBroker.pinExistingState) pins the
    // CURRENT state under the committed batch id — the freeze argument
    // makes a mid-window pin verify exactly like a commit-time one —
    // after which the SAME tamper shape refuses loudly.
    val b0 = batchRows(0, 40)
    val db1Len = (1 to 40).count(_ % 3 != 0)
    def craftLegacy(server: FakeRedisServer): Unit = {
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        (1 to 40).filter(_ % 3 != 0).foreach(i =>
          raw.command("XADD", key("db1"), s"0-$i", "msg", ev("db1", i)))
        (1 to 40).filter(_ % 3 == 0).foreach(i =>
          raw.command("XADD", key("db2"), s"0-$i", "msg", ev("db2", i)))
        raw.command("HSET", "synch:a:produced_batch", "db1", "0", "db2", "0")
        // at-cap legacy stream: the lazy-~ shape the waiver covers
        raw.command("HSET", "synch:a:produced_maxlen", "db1", "10", "db2", "1000000")
      } finally raw.close()
    }
    withServer { server =>
      craftLegacy(server)
      val b = broker(server)
      try {
        // upgrade writes the pin once; re-running is a no-op; a
        // never-produced schema has nothing to pin
        assert(b.pinExistingState("db1").contains((0L, "0-1", "0-40", db1Len.toLong)))
        assert(b.pinExistingState("db1").isEmpty, "second upgrade must be a no-op")
        assert(b.pinExistingState("db9").isEmpty, "never-produced schema must not pin")
        assert(b.pinExistingState("db2").isDefined)
      } finally b.close()
      runBatch(server, b0, 0L) // untampered upgraded stream: skip replay passes
      // now the lazy-~ tamper (delete the at-cap stream's head): the
      // LEGACY path tolerated exactly this — the upgraded pin refuses
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("XDEL", key("db1"), "0-1") finally raw.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("stream state changed"), e.getMessage)
    }
  }

  test("r14 upgrade: a forward-dated pin from a crashed commit is left alone") {
    // crash AFTER the state-pin HSET but BEFORE the produced HSET: the
    // pin names batch 0 while produced still says -1 → send-mode replay
    // territory. pinExistingState must not stamp current (mid-crash
    // partial) state under an older batch id; the replay's own commit
    // overwrites the forward record.
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(43L) // XADDs + cap + digest + state pin, no produced
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      val b = broker(server)
      try assert(b.pinExistingState("db1").isEmpty,
        "a forward-dated pin must not be overwritten with crash-partial state")
      finally b.close()
      runBatch(server, b0, 0L) // send-mode replay converges and re-pins
      assert(snapshot(server) == reference(Seq(0L -> b0)))
    }
  }

  test("r13 send-mode replay refuses an INTERIOR hole in the pre-crash partial") {
    // crash mid-batch, then delete an interior entry of the partial: no
    // trim can leave a hole between two surviving entries (oldest eaten
    // first), and the replay used to reject-swallow the deleted seq
    // silently — the event was simply lost
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(10) // partial: global seqs 1..10
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("XDEL", key("db1"), "0-5") finally raw.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("INSIDE its surviving prefix"), e.getMessage)
    }
  }

  test("r13 send-mode replay refuses a LEADING gap on an under-cap partial") {
    // crash mid-batch with a huge cap (nothing ever trimmed), then
    // delete the partial's first entries: `MAXLEN ~` never trims below
    // the cap, so an under-cap leading gap is deletion, not trim — the
    // replay used to reject-swallow those seqs silently
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(10)
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("XDEL", key("db1"), "0-1", "0-2") finally raw.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("below its first surviving seq"), e.getMessage)
    }
  }

  test("r13 send-mode replay refuses a TRAILING deletion (rejection above the surviving top)") {
    // crash mid-batch, delete the partial's LAST entry: the visible top
    // drops but the stream's last-generated id does not, so the replay's
    // re-XADD of that seq is rejected as already-assigned ABOVE the
    // fetched prefix top — proof of deletion (meta-review of e0d092e:
    // this used to reject-swallow silently and even pin the tampered
    // state at the replay's commit)
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(10) // partial: global seqs 1..10
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("XDEL", key("db1"), "0-10") finally raw.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("ABOVE the surviving prefix top"), e.getMessage)
    }
  }

  test("r13 skip replay still refuses a PRE-commit head deletion on an under-cap stream") {
    // meta-review of e0d092e: the state pin proves nothing moved SINCE
    // the commit, but a head deleted BETWEEN the final flush and the
    // commit pins cleanly — the pin and the cap heuristic must be
    // independent necessary conditions, not substitutes. Craft the
    // post-tamper commit: under-cap stream (nothing ever trimmed)
    // missing its head, with a state record matching the TAMPERED state.
    val b0 = batchRows(0, 40)
    withServer { server =>
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        val db1 = (1 to 40).filter(_ % 3 != 0)
        db1.drop(2).foreach(i => // head entries 0-1, 0-2 "deleted" pre-commit
          raw.command("XADD", key("db1"), s"0-$i", "msg", ev("db1", i)))
        (1 to 40).filter(_ % 3 == 0).foreach(i =>
          raw.command("XADD", key("db2"), s"0-$i", "msg", ev("db2", i)))
        raw.command("HSET", "synch:a:produced_batch", "db1", "0", "db2", "0")
        raw.command("HSET", "synch:a:produced_maxlen", "db1", "1000000", "db2", "1000000")
        raw.command("HSET", "synch:a:produced_state",
          "db1", s"0:0-${db1.drop(2).head}:0-40:${db1.size - 2}",
          "db2", s"0:0-3:0-39:${(1 to 40).count(_ % 3 == 0)}")
      } finally raw.close()
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("cannot explain the gap"), e.getMessage)
    }
  }

  test("r13 send-mode leading gap with surviving PRE-batch entries refuses (headIntact)") {
    // batch-6 entries survive below a crashed batch-7 partial whose
    // leading entries were deleted: oldest are eaten first, so no trim
    // can reach the batch head while older entries live — even with the
    // stream at/above the cap (meta-review of e0d092e: the send path
    // skipped the skip path's headIntact refinement)
    val b7 = batchRows(7, 40)
    withServer { server =>
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        (1 to 30).foreach(i => // pre-batch history (batch 6), survives
          raw.command("XADD", key("db1"), s"6-$i", "msg", ev("db1", 60000 + i)))
        // crashed batch-7 partial MISSING its leading entries 7-1, 7-2
        // (db1 seqs 1,2 — deleted); survivors start at 7-4
        Seq(4, 5, 7).foreach(i =>
          raw.command("XADD", key("db1"), s"7-$i", "msg", ev("db1", 70000 + i)))
      } finally raw.close()
      // cap 10 < stream length 33: trimPlausibleNow alone would tolerate
      val e = intercept[IllegalStateException] { runBatch(server, b7, 7L, maxLen = 10L) }
      assert(e.getMessage.contains("below its first surviving seq"), e.getMessage)
    }
  }

  test("MAXLEN trim mid-crash: partial XADDs trimmed, resume still converges") {
    val b0 = batchRows(0, 40)
    val ref = reference(Seq(0L -> b0), maxLen = 10L)
    withServer { server =>
      server.failAfterWrites(30)
      intercept[Exception] { runBatch(server, b0, 0L, maxLen = 10L) }
      server.failAfterWrites(-1)
      runBatch(server, b0, 0L, maxLen = 10L)
      assert(snapshot(server) == ref)
    }
  }

  test("reset onto a committed stream with a DIFFERENT first event fails loudly") {
    val b0 = batchRows(0, 40)
    withServer { server =>
      runBatch(server, b0, 0L)
      // a reset re-runs batch 0 from a diverged source: same count, same
      // last event, different FIRST event — only the first-entry leg of
      // the skip verification can catch this
      val diverged = b0.updated(0, (b0.head._1, """{"s":"db1","n":666,"payload":"evil"}"""))
      val e = intercept[IllegalStateException] { runBatch(server, diverged, 0L) }
      assert(e.getMessage.contains("DIFFERENT event"), e.getMessage)
      assert(snapshot(server) == reference(Seq(0L -> b0)), "stream was polluted")
    }
  }

  test("reset onto a committed stream with a DIFFERENT last event fails loudly") {
    val b0 = batchRows(0, 40)
    withServer { server =>
      runBatch(server, b0, 0L)
      val diverged = b0.updated(39, (b0.last._1, """{"s":"db1","n":666,"payload":"evil"}"""))
      val e = intercept[IllegalStateException] { runBatch(server, diverged, 0L) }
      assert(e.getMessage.contains("DIFFERENT event"), e.getMessage)
    }
  }

  test("reset onto a committed stream with MORE events (superset tail) fails loudly") {
    val b0 = batchRows(0, 40)
    withServer { server =>
      runBatch(server, b0, 0L)
      val superset = b0 ++ Seq(("db1", """{"s":"db1","n":999}"""))
      val e = intercept[IllegalStateException] { runBatch(server, superset, 0L) }
      assert(e.getMessage.contains("beyond the produced copy"), e.getMessage)
    }
  }

  test("reset onto a committed stream with FEWER events (subset) fails loudly") {
    val b0 = batchRows(0, 40)
    withServer { server =>
      runBatch(server, b0, 0L)
      val subset = b0.dropRight(3)
      val e = intercept[IllegalStateException] { runBatch(server, subset, 0L) }
      assert(e.getMessage.contains("never reproduced"), e.getMessage)
    }
  }

  test("reset to an EARLIER batch id than the commit fails loudly") {
    val b0 = batchRows(0, 40); val b1 = batchRows(1, 40)
    withServer { server =>
      runBatch(server, b0, 0L)
      runBatch(server, b1, 1L)
      val e = intercept[IllegalStateException] { runBatch(server, b0, 0L) }
      assert(e.getMessage.contains("checkpoint was reset"), e.getMessage)
    }
  }

  test("a diverged interior behind identical endpoints now fails the skip check (content digest)") {
    // formerly the pinned first+last+count residual: until r12 this
    // replay passed silently. The per-schema content digest recorded
    // with the produce commit (RedisBroker.producedDigest) is verified
    // against the replayed rows, so the interior divergence is loud —
    // and the skip path still never writes.
    val b0 = batchRows(0, 40)
    withServer { server =>
      runBatch(server, b0, 0L)
      // diverge an interior db1 event only (index 4 -> global seq 5,
      // neither first nor last for db1)
      val diverged = b0.updated(4, (b0(4)._1, """{"s":"db1","n":777,"payload":"interior"}"""))
      val e = intercept[IllegalStateException] { runBatch(server, diverged, 0L) }
      assert(e.getMessage.contains("content digest mismatch"), e.getMessage)
      assert(snapshot(server) == reference(Seq(0L -> b0)),
        "the skip path must never write")
    }
  }

  test("a pre-digest stream (no producer digest record) still skip-replays on endpoints alone") {
    // back-compat: streams produced before r12 have no digest record;
    // the replay must not fail closed on the missing field
    val b0 = batchRows(0, 40)
    withServer { server =>
      runBatch(server, b0, 0L)
      // overwrite the records with a STALE batch id: producedDigest
      // only applies a record whose batch matches, so this is the
      // pre-r12 "no usable record" shape (the fake has no HDEL)
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try raw.command("HSET", "synch:a:produced_digest",
        "db1", "999:0", "db2", "999:0")
      finally raw.close()
      runBatch(server, b0, 0L) // endpoint-only skip, as pre-r12
      // the skip path writes nothing, so the stale digest record stays;
      // compare everything else against the no-crash reference
      assert(snapshot(server) - "digest" == reference(Seq(0L -> b0)) - "digest")
    }
  }

  test("the digest record survives a crash between XADDs and commit (send-mode replay re-records it)") {
    // crash exactly post-XADD pre-commit: produced stays -1, the replay
    // runs in SEND mode (reject-swallowed), and its commit must record
    // the digest so a LATER skip replay still interior-verifies
    val b0 = batchRows(0, 40)
    withServer { server =>
      server.failAfterWrites(40L)                            // all XADDs in, no commit
      intercept[Exception] { runBatch(server, b0, 0L) }
      server.failAfterWrites(-1)
      runBatch(server, b0, 0L)                               // send-mode replay, commits
      val diverged = b0.updated(4, (b0(4)._1, """{"s":"db1","n":777,"payload":"interior"}"""))
      val e = intercept[IllegalStateException] { runBatch(server, diverged, 0L) }
      assert(e.getMessage.contains("content digest mismatch"), e.getMessage)
      assert(snapshot(server) == reference(Seq(0L -> b0)))
    }
  }

  // ---------------------------------------------------------------------
  // Randomized generalization of the hand-enumerated matrix: random
  // multi-schema workloads × random crash points × random crash counts,
  // always converging byte-identically after resume. Deterministic seed
  // so a failure reproduces.
  // ---------------------------------------------------------------------
  test("property: random workloads x random crash points always converge byte-identically") {
    val rnd = new scala.util.Random(0xC0FFEE)
    (1 to 25).foreach { trial =>
      val nSchemas = 1 + rnd.nextInt(3)
      val schemaNames = (1 to nSchemas).map(i => s"db$i")
      def randomBatch(b: Int): Seq[(String, String)] =
        (1 to (10 + rnd.nextInt(70))).map { i =>
          val s = schemaNames(rnd.nextInt(nSchemas))
          (s, s"""{"s":"$s","b":$b,"n":$i,"v":${rnd.nextInt(1000)}}""")
        }
      val batches = (0 until (1 + rnd.nextInt(3))).map(b => b.toLong -> randomBatch(b))
      val maxLen = if (rnd.nextBoolean()) 1000000L else (5 + rnd.nextInt(30)).toLong

      def snapAll(server: FakeRedisServer): Map[String, Any] =
        schemaNames.map(s => s -> server.dumpStream(key(s))).toMap +
          ("produced" -> server.dumpHash("synch:a:produced_batch")) +
          ("maxlen" -> server.dumpHash("synch:a:produced_maxlen")) +
          ("digest" -> server.dumpHash("synch:a:produced_digest"))
      val ref = withServer { server =>
        batches.foreach { case (id, rows) => runBatch(server, rows, id, maxLen) }
        snapAll(server)
      }
      withServer { server =>
        batches.foreach { case (id, rows) =>
          // 0-2 crashes per batch at random write boundaries, then resume
          (0 until rnd.nextInt(3)).foreach { _ =>
            server.failAfterWrites(rnd.nextInt(rows.length + 3).toLong)
            try runBatch(server, rows, id, maxLen)
            catch { case _: Exception => () } // may or may not crash
            server.failAfterWrites(-1)
          }
          runBatch(server, rows, id, maxLen) // clean attempt (or verified skip)
        }
        assert(snapAll(server) == ref,
          s"trial $trial diverged (schemas=$nSchemas batches=${batches.length} maxLen=$maxLen)")
      }
    }
  }

  test("property: random crash x random tamper either converges byte-identically or refuses loudly") {
    // The r13 closure theorem, fuzzed: at a cap that never trims, NO
    // single tamper (XDEL of any entry, foreign XADD at any legal id)
    // against any crash point may be silently absorbed — a replay must
    // either converge to the byte-identical no-tamper reference (the
    // tamper was byte-harmless, e.g. a forged entry identical to ours)
    // or throw the protocol's loud IllegalStateException. Silent loss =
    // a clean run whose final streams differ from the reference — the
    // exact shape the r13 gap classification and frozen-state pin exist
    // to kill (trailing deletions and interior holes both used to pass).
    // The WAIVED shape (leading-only deletion on an at/above-cap stream)
    // needs a trimming cap to exist and is excluded by construction here
    // (cap >> batch); RUNBOOK §6 enumerates it.
    val rnd = new scala.util.Random(0x7A3B13)
    var refused = 0; var converged = 0
    (1 to 60).foreach { trial =>
      val b0 = batchRows(0, 40)
      val ref = reference(Seq(0L -> b0))
      withServer { server =>
        val crashAt = rnd.nextInt(46).toLong // 40 XADDs + 4 commit HSETs + never
        val crashed = crashAt < 44
        if (crashed) {
          server.failAfterWrites(crashAt)
          intercept[Exception] { runBatch(server, b0, 0L) }
          server.failAfterWrites(-1)
        } else runBatch(server, b0, 0L) // committed, then tampered, then replayed
        // one random tamper against whatever survived
        val raw = new graft.sources.RespClient("127.0.0.1", server.port)
        try {
          val schema = schemas(rnd.nextInt(schemas.length))
          val entries = server.dumpStream(key(schema))
          rnd.nextInt(3) match {
            case 0 if entries.nonEmpty => // delete a random entry
              raw.command("XDEL", key(schema), entries(rnd.nextInt(entries.length))._1)
            case 1 => // foreign XADD above the top, inside or beyond the batch
              val topSeq = entries.lastOption
                .map(_._1.dropWhile(_ != '-').drop(1).toLong).getOrElse(0L)
              val ms = rnd.nextInt(2) // 0 = inside batch-0 id space, 1 = beyond
              raw.command("XADD", key(schema), s"$ms-${topSeq + 1 + rnd.nextInt(5)}",
                "msg", s"{forged-$trial}")
            case _ => () // no tamper: the pure crash-matrix case
          }
        } finally raw.close()
        try {
          runBatch(server, b0, 0L)
          assert(snapshot(server) == ref,
            s"trial $trial (crashAt=$crashAt): replay SUCCEEDED on a stream " +
              "that does not match the reference — silent loss/corruption")
          converged += 1
        } catch {
          case _: IllegalStateException => refused += 1 // loud refusal: correct
        }
      }
    }
    // both outcomes must actually occur or the fuzz isn't exercising both sides
    assert(refused > 5 && converged > 5, s"refused=$refused converged=$converged")
  }

  // ---------------------------------------------------------------------
  // Multi-schema atomicity
  // ---------------------------------------------------------------------
  test("the produced commit is one atomic HSET: no schema can be half-committed") {
    // crash ON the commit pipeline: whether the cap-record HSET (write
    // 41) or the produced HSET (write 42... never reached here) dies,
    // neither schema's produced_batch moves — the produced HSET is the
    // single atomic commit point — and the resume still converges
    val b0 = batchRows(0, 40)
    val ref = reference(Seq(0L -> b0))
    for (crashAt <- Seq(40L, 41L)) {
      withServer { server =>
        server.failAfterWrites(crashAt)
        intercept[Exception] { runBatch(server, b0, 0L) }
        assert(server.dumpHash("synch:a:produced_batch").isEmpty,
          s"crashAt=$crashAt: a partial produced commit is impossible by construction")
        server.failAfterWrites(-1)
        runBatch(server, b0, 0L)
        assert(snapshot(server) == ref, s"crashAt=$crashAt")
      }
    }
  }

  test("r15 upgrade: an XADD racing into pinExistingState deletes the pin and refuses") {
    // VERDICT r14 "what's wrong" #2: the stopped-producer requirement
    // was a RUNBOOK parenthesis. Mechanism: after the pin HSET the
    // stream state is re-read; movement during the pinning proves a
    // live producer, so the partial pin is deleted and the call throws.
    // The race is injected deterministically through the midPin seam —
    // the XADD lands between the HSET and the re-read, exactly the
    // mid-batch shape the old discipline guarded against.
    withServer { server =>
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        raw.command("XADD", key("db1"), "0-1", "msg", ev("db1", 1))
        raw.command("HSET", "synch:a:produced_batch", "db1", "0")
        val b = broker(server)
        try {
          val e = intercept[IllegalStateException] {
            b.pinExistingState("db1",
              () => { raw.command("XADD", key("db1"), "1-1", "msg", ev("db1", 2)); () })
          }
          assert(e.getMessage.contains("moved during the pinning"), e.getMessage)
          assert(!server.dumpHash("synch:a:produced_state").contains("db1"),
            "the mid-batch partial pin must not survive the refusal")
          // producer stopped (no midPin): the re-run pins the now-current
          // state — the upgrade path recovers exactly as the error says
          assert(b.pinExistingState("db1").contains((0L, "0-1", "1-1", 2L)))
        } finally b.close()
      } finally raw.close()
    }
  }

  test("r15 upgrade: a producer COMMIT racing the pinning keeps the producer's pin") {
    // the HDEL must fire only when the pin is still OURS: a producer
    // commit that lands inside the pinning window overwrites the pin
    // with the true frozen state, and deleting THAT would strip a valid
    // commit's record. The refusal still throws (the stream moved), but
    // the producer's pin survives.
    withServer { server =>
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        raw.command("XADD", key("db1"), "0-1", "msg", ev("db1", 1))
        raw.command("HSET", "synch:a:produced_batch", "db1", "0")
        val b = broker(server)
        try {
          val e = intercept[IllegalStateException] {
            b.pinExistingState("db1", () => {
              raw.command("XADD", key("db1"), "1-1", "msg", ev("db1", 2))
              // the racing producer's own commit (batch 1) pins its state
              raw.command("HSET", "synch:a:produced_state", "db1", "1:0-1:1-1:2")
              raw.command("HSET", "synch:a:produced_batch", "db1", "1")
              ()
            })
          }
          assert(e.getMessage.contains("moved during the pinning"), e.getMessage)
          assert(server.dumpHash("synch:a:produced_state").get("db1")
            .contains("1:0-1:1-1:2"),
            "the racing producer's own pin must survive the upgrade's refusal")
        } finally b.close()
      } finally raw.close()
    }
  }
}
