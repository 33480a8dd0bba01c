package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** In-JVM RESP2 server implementing the Redis-Streams subset the broker
  * path uses (XADD with MAXLEN trim, XREAD after-id, XLEN, HSET, HGET,
  * PING) — a protocol-level test double: [[RespClient]] talks to it over
  * a real socket with real RESP framing, so the client/broker code under
  * test is byte-for-byte what would talk to a production Redis. Entry
  * ids are `0-seq` with a per-stream monotonic sequence (the id FORMAT
  * and ordering contract of Redis, with a deterministic clock).
  */
final class FakeRedisServer extends AutoCloseable {
  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort

  // (ms, seq, flattened field/value list) — ALL pairs are stored so
  // foreign producers' non-msg (or multi-field) entries round-trip like
  // real Redis (the broker's guard and msg-scan rely on it)
  private val streams =
    mutable.Map.empty[String, mutable.ArrayBuffer[(Long, Long, Seq[String])]]
  // last assigned id per stream — survives MAXLEN trims, like Redis
  private val lastIds = mutable.Map.empty[String, (Long, Long)]
  private val hashes = mutable.Map.empty[String, mutable.Map[String, String]]
  @volatile private var closed = false

  /** Fault injection for crash-matrix tests: when >= 0, every WRITE
    * command (XADD/HSET) after the first `n` applied ones is NOT applied
    * and the connection dies — a command-boundary crash, modelling a
    * producer killed mid-pipeline (the TCP stream delivered only a
    * prefix of its commands). Reads stay up so a post-mortem can
    * inspect; call again with -1 to "restart". */
  def failAfterWrites(n: Long): Unit = synchronized {
    failAt = n; writesApplied = 0L
  }
  private var failAt = -1L
  private var writesApplied = 0L
  private final class CrashInjected extends RuntimeException
  private def writeGate(): Unit = {
    if (failAt >= 0 && writesApplied >= failAt) throw new CrashInjected
    writesApplied += 1
  }

  /** Test-side dump of a stream's full contents as (id, fields) — the
    * byte-identity oracle for crash-matrix runs. */
  def dumpStream(key: String): Seq[(String, Seq[String])] = synchronized {
    streams.getOrElse(key, mutable.ArrayBuffer.empty).toSeq
      .map { case (ms, sq, fs) => (s"$ms-$sq", fs) }
  }

  /** Test-side dump of a hash (commit stores). */
  def dumpHash(key: String): Map[String, String] = synchronized {
    hashes.get(key).map(_.toMap).getOrElse(Map.empty)
  }

  private def parseId(s: String): (Long, Long) = s.split("-") match {
    case Array(ms) => (ms.toLong, 0L)
    case Array(ms, sq) => (ms.toLong, sq.toLong)
  }

  private def handle(args: Seq[String]): String = synchronized {
    args.head.toUpperCase match {
      case "PING" => "+PONG\r\n"
      // accepted so brokers configured with db/password run against the
      // fake; real auth/db isolation is the server's concern, not ours
      case "AUTH" | "SELECT" => "+OK\r\n"
      case "XADD" =>
        // XADD key [MAXLEN ~ n] * field value [field value ...]
        val key = args(1)
        var i = 2
        var maxlen = -1L
        if (args(i).equalsIgnoreCase("MAXLEN")) {
          i += 1
          if (args(i) == "~" || args(i) == "=") i += 1
          maxlen = args(i).toLong; i += 1
        }
        val idArg = args(i); i += 1
        val fields = args.drop(i)
        if (fields.isEmpty || fields.length % 2 != 0)
          return "-ERR wrong number of arguments for 'xadd' command\r\n"
        val last = lastIds.getOrElse(key, (0L, 0L))
        // explicit ids must be strictly greater than the stream top —
        // the REAL Redis contract the idempotent producer leans on
        val next =
          if (idArg == "*") (last._1, last._2 + 1)
          else parseId(idArg)
        if (next._1 < last._1 || (next._1 == last._1 && next._2 <= last._2))
          "-ERR The ID specified in XADD is equal or smaller than the target stream top item\r\n"
        else {
          writeGate()
          lastIds(key) = next
          val buf = streams.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
          buf += ((next._1, next._2, fields))
          if (maxlen >= 0 && buf.length > maxlen)
            buf.remove(0, buf.length - maxlen.toInt)
          val id = s"${next._1}-${next._2}"
          s"$$${id.length}\r\n$id\r\n"
        }
      case "XDEL" =>
        // tamper simulation for the r13 gap/state-pin protocol tests —
        // the PROTOCOL never XDELs; like real Redis, deletion does not
        // move the stream's last-assigned id
        val buf = streams.getOrElse(args(1), mutable.ArrayBuffer.empty)
        val ids = args.drop(2).map(parseId).toSet
        val before = buf.length
        buf.filterInPlace(e => !ids.contains((e._1, e._2)))
        s":${before - buf.length}\r\n"
      case "XREVRANGE" =>
        // XREVRANGE key + - COUNT 1 — newest entry (the produce guard)
        val buf = streams.getOrElse(args(1), mutable.ArrayBuffer.empty)
        if (buf.isEmpty) "*0\r\n"
        else {
          def bulk(s: String) = s"$$${s.getBytes(UTF_8).length}\r\n$s\r\n"
          val (ms, sq, fs) = buf.last
          val id = s"$ms-$sq"
          s"*1\r\n*2\r\n${bulk(id)}*${fs.length}\r\n${fs.map(bulk).mkString}"
        }
      case "XRANGE" =>
        // XRANGE key start end [COUNT n] — '-'/'+' sentinels and partial
        // ids (a bare ms means ms-0 as start, ms-MAX as end), per the
        // real Redis contract the first-entry produce verification uses
        val buf = streams.getOrElse(args(1), mutable.ArrayBuffer.empty)
        var count = Int.MaxValue
        if (args.length >= 6 && args(4).equalsIgnoreCase("COUNT"))
          count = args(5).toInt
        val lo = args(2) match {
          case "-" => (Long.MinValue, Long.MinValue)
          case s => parseId(s) // bare ms parses as ms-0
        }
        val hi = args(3) match {
          case "+" => (Long.MaxValue, Long.MaxValue)
          case s => s.split("-") match {
            case Array(ms) => (ms.toLong, Long.MaxValue)
            case Array(ms, sq) => (ms.toLong, sq.toLong)
          }
        }
        val hits = buf.iterator.filter { case (ms, sq, _) =>
          (ms > lo._1 || (ms == lo._1 && sq >= lo._2)) &&
            (ms < hi._1 || (ms == hi._1 && sq <= hi._2))
        }.take(count).toSeq
        def bulk(s: String) = s"$$${s.getBytes(UTF_8).length}\r\n$s\r\n"
        val entries = hits.map { case (ms, sq, fs) =>
          s"*2\r\n${bulk(s"$ms-$sq")}*${fs.length}\r\n${fs.map(bulk).mkString}"
        }.mkString
        s"*${hits.length}\r\n$entries"
      case "XLEN" =>
        s":${streams.get(args(1)).map(_.length).getOrElse(0)}\r\n"
      case "XREAD" =>
        // XREAD COUNT n STREAMS key id   (single stream, non-blocking)
        var i = 1
        var count = Int.MaxValue
        if (args(i).equalsIgnoreCase("COUNT")) { count = args(i + 1).toInt; i += 2 }
        require(args(i).equalsIgnoreCase("STREAMS")); i += 1
        val key = args(i); val after = parseId(args(i + 1))
        val hits = streams.getOrElse(key, mutable.ArrayBuffer.empty)
          .iterator.filter { case (ms, sq, _) =>
            ms > after._1 || (ms == after._1 && sq > after._2) }
          .take(count).toSeq
        if (hits.isEmpty) "*-1\r\n"
        else {
          def bulk(s: String) = s"$$${s.getBytes(UTF_8).length}\r\n$s\r\n"
          val entries = hits.map { case (ms, sq, fs) =>
            s"*2\r\n${bulk(s"$ms-$sq")}*${fs.length}\r\n${fs.map(bulk).mkString}"
          }.mkString
          s"*1\r\n*2\r\n${bulk(key)}*${hits.length}\r\n$entries"
        }
      case "HSET" =>
        // multi-pair form: HSET key f1 v1 [f2 v2 ...]
        if (args.length < 4 || args.length % 2 != 0)
          return "-ERR wrong number of arguments for 'hset' command\r\n"
        writeGate()
        val h = hashes.getOrElseUpdate(args(1), mutable.Map.empty)
        var added = 0
        args.drop(2).grouped(2).foreach { case Seq(f, v) =>
          if (!h.contains(f)) added += 1
          h(f) = v
        }
        s":$added\r\n"
      case "HGET" =>
        hashes.get(args(1)).flatMap(_.get(args(2))) match {
          case Some(v) => s"$$${v.getBytes(UTF_8).length}\r\n$v\r\n"
          case None => "$-1\r\n"
        }
      case "HDEL" =>
        writeGate()
        var removed = 0
        hashes.get(args(1)).foreach { h =>
          args.drop(2).foreach(f => if (h.remove(f).isDefined) removed += 1)
        }
        s":$removed\r\n"
      case other => s"-ERR unknown command '$other'\r\n"
    }
  }

  private def serve(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      if (c < 0) return null
      while (c != '\r') { sb.append(c.toChar); c = in.read() }
      in.read()
      sb.toString
    }
    try {
      var line = readLine()
      while (line != null && !closed) {
        require(line.startsWith("*"), s"expected array, got: $line")
        val n = line.drop(1).toInt
        val args = (0 until n).map { _ =>
          val len = readLine().drop(1).toInt
          val buf = new Array[Byte](len)
          var off = 0
          while (off < len) {
            val r = in.read(buf, off, len - off); require(r >= 0); off += r
          }
          in.read(); in.read()
          new String(buf, UTF_8)
        }
        out.write(handle(args).getBytes(UTF_8))
        // real Redis coalesces pipelined replies in its output buffer;
        // flush only before blocking on the next read so a 512-command
        // pipeline gets batched replies, not one TCP packet per reply
        if (in.available() == 0) out.flush()
        line = readLine()
      }
    } catch {
      case _: CrashInjected => () // injected crash: drop the connection
      case _: Exception if closed => ()
    }
    finally sock.close()
  }

  private val acceptor = new Thread(() => {
    try while (!closed) {
      val s = server.accept()
      val t = new Thread(() => serve(s), "fake-redis-conn")
      t.setDaemon(true); t.start()
    } catch { case _: Exception if closed => () }
  }, "fake-redis-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = { closed = true; server.close() }
}
