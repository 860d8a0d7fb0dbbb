package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.net.Socket

import graft.model.Telemetry._

/** The O-14 gap the round-3 review flagged: a bare `format("graft-tcp")`
  * stream (no `maxBufferedBytes`) used to default to an UNBOUNDED
  * driver-side chunk log — the exact lag-driven driver OOM the drop-on-full
  * work was meant to close, still reachable via the default path. The
  * default is now a finite cap ([[TcpFrameStream.defaultBufferCap]], 256 MB
  * in production): under a stalled sink the buffer stops growing and
  * over-cap chunks are shed AND counted, never silently.
  *
  * Drives [[TcpFrameStream]] directly (no Spark session): never calling
  * `planInputPartitions`/`commit` IS the stalled sink — nothing ever drains
  * the log. The production default is shrunk to 4 KB through the
  * `graft.tcp.defaultBufferBytes` test hook for the burst to be cheap; the
  * cap is resolved once at stream construction, so the property window is
  * confined to the constructor call and restored immediately after.
  */
class TcpDefaultCapSpec extends AnyFunSuite {

  test("bare stream (no maxBufferedBytes option) sheds under a stalled sink instead of growing unbounded") {
    val port = { val s = new java.net.ServerSocket(0); try s.getLocalPort finally s.close() }
    val capProp = "graft.tcp.defaultBufferBytes"
    val prev = System.getProperty(capProp)
    System.setProperty(capProp, "4096")
    val stream =
      try new TcpFrameStream(port, None, None) // bare: NO explicit buffer cap
      finally {
        if (prev == null) System.clearProperty(capProp)
        else { System.setProperty(capProp, prev); () }
      }
    try {
      val hb = encodeHeartbeat(Heartbeat(72, 0, 1700L))
      val sock = new Socket("127.0.0.1", port)
      val out = sock.getOutputStream
      // trickle: under-cap chunks must buffer normally
      (1 to 3).foreach { _ => out.write(hb); out.flush(); Thread.sleep(100) }
      // burst far over the 4 KB default in one write — with no batch ever
      // planned or committed, an unbounded default would buffer all of it
      out.write(Array.fill(5000)(hb).flatten); out.flush()
      sock.close()

      val deadline = System.currentTimeMillis() + 15000
      while (TcpShedMetrics.shedFrames(port) == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(TcpShedMetrics.shedFrames(port) > 0, "the over-default-cap burst must shed")
      // the buffer respected the finite default: whatever was admitted
      // stays at or under the cap (body bytes, the unit the cap counts)
      assert(TcpShedMetrics.bufferSize(port) <= 4096L,
        s"buffered ${TcpShedMetrics.bufferSize(port)} B exceeds the 4 KB default cap")
      // conservation: trickle frames were admitted, not dropped
      val shed = TcpShedMetrics.shedFrames(port)
      assert(shed < 5003, "trickle frames under the cap must be admitted")
    } finally stream.stop()
  }

  test("production default is finite and overridable") {
    assert(TcpFrameStream.DefaultMaxBufferedBytes == 256L << 20)
    assert(TcpFrameStream.defaultBufferCap == TcpFrameStream.DefaultMaxBufferedBytes)
  }
}
