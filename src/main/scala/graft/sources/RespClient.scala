package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal RESP2 (REdis Serialization Protocol) client over a plain
  * socket — zero driver dependencies, speaking exactly the command set
  * the Redis-Streams broker path needs (XADD / XREAD / XLEN / HSET /
  * HGET; reference synch/broker/redis.py + synch/redis_mixin.py).
  *
  * Replies map to: simple string / bulk string → `String`, integer →
  * `Long`, array → `Seq[Any]`, null bulk/array → `null`. Protocol errors
  * (`-ERR ...`) throw. Not thread-safe — one client per polling thread,
  * like the reference's one redis connection per reader process.
  */
final class RespClient(host: String, port: Int,
                       connectTimeoutMs: Int = 10000,
                       readTimeoutMs: Int = 60000) extends AutoCloseable {
  // both timeouts exist so a half-open connection (broker host dies
  // without FIN — power loss, partition) FAILS the polling thread
  // instead of wedging it forever in a blocking read (r13 review): every
  // command this client issues is non-blocking broker-side (XREAD with
  // COUNT, never BLOCK), so a read that sits 60 s without a single byte
  // is a dead peer, not a slow reply — large pipelined replies stream
  // continuously and reset the timer with every chunk
  private val sock = new Socket()
  sock.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
  sock.setSoTimeout(readTimeoutMs)
  sock.setTcpNoDelay(true)
  private val out = new BufferedOutputStream(sock.getOutputStream)
  private val in = new BufferedInputStream(sock.getInputStream)

  def command(args: String*): Any = {
    writeCommand(args)
    out.flush()
    readReply()
  }

  /** Pipelined execution: write all commands, flush once, then read all
    * replies — one network round-trip instead of N. The order-sensitive
    * XADD producer keeps its ordering guarantee (RESP replies arrive in
    * command order) while amortizing the per-command RTT that dominates
    * a serial producer against a remote broker. A `-ERR` reply for any
    * command throws after all replies are drained (the connection stays
    * protocol-aligned for reuse).
    */
  def pipeline(cmds: Seq[Seq[String]]): Seq[Any] = {
    val replies = pipelineEither(cmds)
    replies.collectFirst { case Left(e) => throw e }
    replies.map(_.toOption.get)
  }

  /** [[pipeline]] that returns per-command outcomes instead of throwing
    * on the first `-ERR`: callers with per-command error semantics (the
    * idempotent XADD producer treats "equal or smaller ID" as
    * already-delivered) decide per reply. The connection stays
    * protocol-aligned either way — all replies are drained. */
  def pipelineEither(cmds: Seq[Seq[String]]): Seq[Either[RuntimeException, Any]] = {
    cmds.foreach(writeCommand)
    out.flush()
    cmds.map { _ =>
      try Right(readReply()) catch {
        case e: RuntimeException if e.getMessage != null &&
          e.getMessage.startsWith("RESP error") => Left(e)
      }
    }
  }

  private def writeCommand(args: Seq[String]): Unit = {
    val sb = new StringBuilder
    sb.append('*').append(args.length).append("\r\n")
    args.foreach { a =>
      sb.append('$').append(a.getBytes(UTF_8).length).append("\r\n")
        .append(a).append("\r\n")
    }
    out.write(sb.toString.getBytes(UTF_8))
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      require(c >= 0, "RESP stream closed mid-reply")
      sb.append(c.toChar); c = in.read()
    }
    in.read() // the \n
    sb.toString
  }

  private def readReply(): Any = {
    val t = in.read()
    require(t >= 0, "RESP stream closed")
    t.toChar match {
      case '+' => readLine()
      case '-' => throw new RuntimeException("RESP error: " + readLine())
      case ':' => readLine().toLong
      case '$' =>
        val n = readLine().toInt
        if (n < 0) null
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            require(r >= 0, "RESP stream closed mid-bulk")
            off += r
          }
          in.read(); in.read() // trailing \r\n
          new String(buf, UTF_8)
        }
      case '*' =>
        val n = readLine().toInt
        if (n < 0) null else Seq.fill(n)(readReply())
      case other =>
        throw new RuntimeException(s"RESP: unexpected type byte '$other'")
    }
  }

  override def close(): Unit = sock.close()
}
