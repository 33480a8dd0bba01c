package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class RespClientSpec extends AnyFunSuite {

  test("a silent peer times out the read instead of wedging the thread forever (r13)") {
    // r13 review: no soTimeout meant a broker host dying without FIN
    // (power loss, partition) blocked the polling thread in read()
    // forever — the stream silently stopped instead of failing and
    // restarting. Every command is non-blocking broker-side (XREAD with
    // COUNT, never BLOCK), so a read timeout is always safe to arm.
    val ss = new java.net.ServerSocket(0)
    try {
      val holder = new Thread(() => {
        try { val s = ss.accept(); Thread.sleep(30000); s.close() }
        catch { case _: Throwable => () }
      })
      holder.setDaemon(true); holder.start()
      val c = new RespClient("127.0.0.1", ss.getLocalPort, readTimeoutMs = 300)
      try intercept[java.net.SocketTimeoutException] { c.command("PING") }
      finally c.close()
    } finally ss.close()
  }

  // NOTE: no unreachable-host connect test — this container's network
  // stub accepts connections to unroutable TEST-NET addresses, so a
  // connect-timeout assertion is environment-dependent; the connect
  // timeout itself is plain JDK Socket.connect(addr, ms) behavior.
}
