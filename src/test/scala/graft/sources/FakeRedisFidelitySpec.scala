package graft.sources

import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact RESP2 goldens for every command the broker path uses
  * (XADD with/without MAXLEN and explicit ids, XRANGE, XREVRANGE, XREAD,
  * XLEN, HSET, HGET, PING, AUTH/SELECT) against [[FakeRedisServer]].
  *
  * Why this spec exists: round 10's final convergence commit was partly
  * FakeRedisServer fidelity fixes — protocol tests (ProduceProtocolSpec,
  * RedisBrokerSpec) are only as strong as the double they run against,
  * so the double's wire behavior is pinned here at the BYTE level, not
  * through the client library whose bugs it would mirror.
  *
  * Goldens are derived from the RESP2 protocol spec and the documented
  * command semantics (redis.io/docs: protocol-spec, XADD, XRANGE, XREAD,
  * HSET). No redis-server binary exists in this container (checked), so
  * there is no live cross-check; anyone adding a command to the fake
  * must add its golden here from the spec.
  *
  * Auto-id note: real Redis assigns `max(now-ms, top-ms)-seq`; the fake
  * is exactly that with the clock FROZEN AT 0 — every auto id becomes
  * `(top-ms, top-seq+1)` (`0-1, 0-2, ...` on a fresh stream), which is
  * the spec-conformant branch for now <= top and keeps tests
  * deterministic. Producers under test never rely on wall-clock ids.
  */
class FakeRedisFidelitySpec extends AnyFunSuite {

  /** Raw socket client: writes RESP arrays, reads exact byte counts —
    * no RespClient in the loop, so a client bug cannot mask a fake bug. */
  private final class Raw(port: Int) extends AutoCloseable {
    private val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(10000)
    private val out = sock.getOutputStream
    private val in = sock.getInputStream
    def send(args: String*): Unit = {
      val sb = new StringBuilder
      sb.append('*').append(args.length).append("\r\n")
      args.foreach(a => sb.append('$').append(a.getBytes(UTF_8).length)
        .append("\r\n").append(a).append("\r\n"))
      out.write(sb.toString.getBytes(UTF_8)); out.flush()
    }
    def expect(golden: String): Unit = {
      val want = golden.getBytes(UTF_8)
      val got = new Array[Byte](want.length)
      var off = 0
      while (off < want.length) {
        val r = in.read(got, off, want.length - off)
        assert(r >= 0, s"stream closed after '${new String(got, 0, off, UTF_8)}'")
        off += r
      }
      assert(new String(got, UTF_8) == golden,
        s"got <${new String(got, UTF_8)}> want <$golden>")
    }
    def drainIsEmpty(): Boolean = { Thread.sleep(50); in.available() == 0 }
    override def close(): Unit = sock.close()
  }

  private def withRaw[T](f: (FakeRedisServer, Raw) => T): T = {
    val server = new FakeRedisServer
    val raw = new Raw(server.port)
    try f(server, raw) finally { raw.close(); server.close() }
  }

  private def bulk(s: String) = s"$$${s.getBytes(UTF_8).length}\r\n$s\r\n"
  private def entry(id: String, fields: (String, String)*): String =
    s"*2\r\n${bulk(id)}*${fields.length * 2}\r\n" +
      fields.map { case (f, v) => bulk(f) + bulk(v) }.mkString

  test("PING / AUTH / SELECT simple strings") {
    withRaw { (_, c) =>
      c.send("PING"); c.expect("+PONG\r\n")
      c.send("AUTH", "secret"); c.expect("+OK\r\n")
      c.send("SELECT", "3"); c.expect("+OK\r\n")
      assert(c.drainIsEmpty())
    }
  }

  test("XADD: explicit id returns the id as a bulk string; duplicates error per spec") {
    withRaw { (_, c) =>
      c.send("XADD", "k", "0-1", "msg", "hello")
      c.expect("$3\r\n0-1\r\n")
      // equal id -> the exact spec error line
      c.send("XADD", "k", "0-1", "msg", "again")
      c.expect("-ERR The ID specified in XADD is equal or smaller than the target stream top item\r\n")
      // smaller id -> same error
      c.send("XADD", "k", "0-0", "msg", "again")
      c.expect("-ERR The ID specified in XADD is equal or smaller than the target stream top item\r\n")
      // the rejected adds must not have landed
      c.send("XLEN", "k"); c.expect(":1\r\n")
    }
  }

  test("XADD: auto id is (top-ms, top-seq+1) — the frozen-clock branch of the spec") {
    withRaw { (_, c) =>
      c.send("XADD", "k", "*", "msg", "a"); c.expect("$3\r\n0-1\r\n")
      c.send("XADD", "k", "*", "msg", "b"); c.expect("$3\r\n0-2\r\n")
      // after an explicit jump the auto id continues above the top
      c.send("XADD", "k", "7-5", "msg", "c"); c.expect("$3\r\n7-5\r\n")
      c.send("XADD", "k", "*", "msg", "d"); c.expect("$3\r\n7-6\r\n")
    }
  }

  test("XADD: missing/odd field-value pairs error; MAXLEN trims oldest; id survives trim") {
    withRaw { (_, c) =>
      c.send("XADD", "k", "0-1", "msg")
      c.expect("-ERR wrong number of arguments for 'xadd' command\r\n")
      c.send("XADD", "k", "0-1")
      c.expect("-ERR wrong number of arguments for 'xadd' command\r\n")
      (1 to 3).foreach { i =>
        c.send("XADD", "k", "MAXLEN", "~", "2", s"0-$i", "msg", s"m$i")
        c.expect(s"$$3\r\n0-$i\r\n")
      }
      c.send("XLEN", "k"); c.expect(":2\r\n")
      // oldest trimmed: range starts at 0-2
      c.send("XRANGE", "k", "-", "+")
      c.expect(s"*2\r\n${entry("0-2", "msg" -> "m2")}${entry("0-3", "msg" -> "m3")}")
      // the trimmed id stays the floor: re-adding 0-1 must still error
      c.send("XADD", "k", "0-1", "msg", "zombie")
      c.expect("-ERR The ID specified in XADD is equal or smaller than the target stream top item\r\n")
    }
  }

  test("XRANGE: -/+ sentinels, explicit and PARTIAL ids, COUNT, empty array") {
    withRaw { (_, c) =>
      c.send("XRANGE", "nope", "-", "+"); c.expect("*0\r\n")
      c.send("XADD", "k", "1-1", "msg", "a"); c.expect("$3\r\n1-1\r\n")
      c.send("XADD", "k", "1-2", "msg", "b"); c.expect("$3\r\n1-2\r\n")
      c.send("XADD", "k", "2-1", "msg", "c"); c.expect("$3\r\n2-1\r\n")
      // full range
      c.send("XRANGE", "k", "-", "+")
      c.expect(s"*3\r\n${entry("1-1", "msg" -> "a")}${entry("1-2", "msg" -> "b")}${entry("2-1", "msg" -> "c")}")
      // explicit inclusive bounds
      c.send("XRANGE", "k", "1-2", "2-1")
      c.expect(s"*2\r\n${entry("1-2", "msg" -> "b")}${entry("2-1", "msg" -> "c")}")
      // partial ids: bare ms is ms-0 as start, ms-MAX as end (spec)
      c.send("XRANGE", "k", "1", "1")
      c.expect(s"*2\r\n${entry("1-1", "msg" -> "a")}${entry("1-2", "msg" -> "b")}")
      // COUNT limits from the oldest
      c.send("XRANGE", "k", "-", "+", "COUNT", "1")
      c.expect(s"*1\r\n${entry("1-1", "msg" -> "a")}")
      // the firstEntryOfBatch shape: start at ms-0, end at bare ms
      c.send("XRANGE", "k", "1-0", "1", "COUNT", "1")
      c.expect(s"*1\r\n${entry("1-1", "msg" -> "a")}")
    }
  }

  test("XREVRANGE + - COUNT 1 returns the newest entry") {
    withRaw { (_, c) =>
      c.send("XREVRANGE", "k", "+", "-", "COUNT", "1"); c.expect("*0\r\n")
      c.send("XADD", "k", "0-1", "msg", "a"); c.expect("$3\r\n0-1\r\n")
      c.send("XADD", "k", "0-2", "msg", "b"); c.expect("$3\r\n0-2\r\n")
      c.send("XREVRANGE", "k", "+", "-", "COUNT", "1")
      c.expect(s"*1\r\n${entry("0-2", "msg" -> "b")}")
    }
  }

  test("XREAD: entries strictly after the id, COUNT paging, nil when drained") {
    withRaw { (_, c) =>
      c.send("XREAD", "COUNT", "10", "STREAMS", "k", "0")
      c.expect("*-1\r\n") // no data -> RESP2 nil array
      (1 to 3).foreach { i =>
        c.send("XADD", "k", s"0-$i", "msg", s"m$i"); c.expect(s"$$3\r\n0-$i\r\n")
      }
      // after 0-1, capped at 1: exactly entry 0-2, wrapped [[key, entries]]
      c.send("XREAD", "COUNT", "1", "STREAMS", "k", "0-1")
      c.expect(s"*1\r\n*2\r\n${bulk("k")}*1\r\n${entry("0-2", "msg" -> "m2")}")
      // strictly-after the top -> nil
      c.send("XREAD", "COUNT", "10", "STREAMS", "k", "0-3")
      c.expect("*-1\r\n")
    }
  }

  test("HSET/HGET: multi-pair, new-field count, nil bulk for missing; arity errors") {
    withRaw { (_, c) =>
      c.send("HSET", "h", "f1", "v1"); c.expect(":1\r\n")
      // one new field, one overwrite -> count counts NEW fields only
      c.send("HSET", "h", "f1", "v9", "f2", "v2"); c.expect(":1\r\n")
      c.send("HGET", "h", "f1"); c.expect("$2\r\nv9\r\n")
      c.send("HGET", "h", "f2"); c.expect("$2\r\nv2\r\n")
      c.send("HGET", "h", "nope"); c.expect("$-1\r\n")
      c.send("HGET", "nope", "f"); c.expect("$-1\r\n")
      c.send("HSET", "h", "f1"); c.expect("-ERR wrong number of arguments for 'hset' command\r\n")
    }
  }

  test("multi-field and foreign entries round-trip (guard + msg-scan rely on this)") {
    withRaw { (_, c) =>
      c.send("XADD", "k", "0-1", "alpha", "1", "msg", "payload", "beta", "2")
      c.expect("$3\r\n0-1\r\n")
      c.send("XRANGE", "k", "-", "+")
      c.expect(s"*1\r\n${entry("0-1", "alpha" -> "1", "msg" -> "payload", "beta" -> "2")}")
    }
  }

  test("pipelining: N commands in one write get N replies in order") {
    withRaw { (_, c) =>
      // send three commands back-to-back before reading anything
      c.send("XADD", "k", "0-1", "msg", "a")
      c.send("XADD", "k", "0-2", "msg", "b")
      c.send("XLEN", "k")
      c.expect("$3\r\n0-1\r\n$3\r\n0-2\r\n:2\r\n")
      assert(c.drainIsEmpty())
    }
  }

  test("unknown command errors without killing the connection") {
    withRaw { (_, c) =>
      c.send("FLUSHALL"); c.expect("-ERR unknown command 'FLUSHALL'\r\n")
      c.send("PING"); c.expect("+PONG\r\n")
    }
  }
}
