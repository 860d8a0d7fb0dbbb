package graft

import java.net.ServerSocket
import java.util.concurrent.atomic.AtomicLong

import graft.runtime.GraftService
import graft.tools.TcpClient

/** The standalone load-gen binaries (dsp-tools parity): TcpClient drives a
  * LIVE GraftService daemon end-to-end — frames land through the TCP
  * southbound, the query processes them, and the /metrics HTTP scrape
  * moves. KafkaClient needs a broker + connector jars (absent here); its
  * arg surface shares TcpClient's parser shape and its projection logic is
  * replay-tested in StreamRuntimeSpec.
  */
class ToolsSpec extends SparkTestBase {

  test("TcpClient drives a live service: frames flow, /metrics counters move") {
    val port = { val s = new ServerSocket(0); try s.getLocalPort finally s.close() }
    val cfg = GraftService.parseConfig(
      s"""topic: tool-test
         |interfaces:
         |  southbound:
         |    type: tcp
         |    port: $port
         |  northbound:
         |    - {enabled: true, name: sink-nb, type: memory}
         |""".stripMargin
    )
    val seen = new AtomicLong(0L)
    val daemon = GraftService.startDaemon(spark, cfg, _ => batch => { seen.addAndGet(batch.count()); () })
    try {
      // wait for the listener socket to bind
      val bindDeadline = System.currentTimeMillis() + 20000
      var bound = false
      while (!bound && System.currentTimeMillis() < bindDeadline) {
        try { new java.net.Socket("127.0.0.1", port).close(); bound = true }
        catch { case _: java.io.IOException => Thread.sleep(100) }
      }
      assert(bound, s"service never bound port $port")

      val stats = TcpClient.run(TcpClient.Config("127.0.0.1", port, count = 5000, size = 200, batch = 100))
      assert(stats.sentFrames == 5000 && stats.sentBytes == 5000L * 200)

      val deadline = System.currentTimeMillis() + 30000
      while (seen.get() < 5000 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(seen.get() == 5000, s"sink saw ${seen.get()} of 5000 frames")

      // the /metrics scrape reflects the processed rows
      def scrape(): String = {
        val conn = new java.net.URL(s"http://127.0.0.1:${daemon.metricsPort}/metrics")
          .openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try scala.io.Source.fromInputStream(conn.getInputStream).mkString
        finally conn.disconnect()
      }
      var body = scrape()
      val scrapeDeadline = System.currentTimeMillis() + 20000
      while (!body.contains("process_messages_total") && System.currentTimeMillis() < scrapeDeadline) {
        Thread.sleep(200); body = scrape()
      }
      assert(body.contains("process_messages_total"), s"scrape missing counters:\n$body")
      // reference observability gauges ride the same scrape
      assert(body.contains(s"""connection_count{port="$port"}"""), s"scrape missing connection_count:\n$body")
      assert(body.contains(s"""tcp_buffer_size{port="$port"}"""), s"scrape missing tcp_buffer_size:\n$body")
    } finally daemon.stop()
  }

  test("TcpClient arg parsing: required/default/rate fields") {
    val cfg = TcpClient.parse(
      Array("--address", "10.0.0.1:7200", "--count", "100000", "--size", "64", "--batch", "50", "--rate-limit", "2000")
    )
    assert(cfg == TcpClient.Config("10.0.0.1", 7200, 100000L, 64, 50, 2000L))
    val defaults = TcpClient.parse(Array("--address", "h:1", "--count", "10"))
    assert(defaults.size == 200 && defaults.batch == 1 && defaults.rateLimitMps == 0L)
    intercept[RuntimeException](TcpClient.parse(Array("--count", "10")))
  }

  test("TcpClient rate limit paces the send") {
    val server = new ServerSocket(0)
    val drain = new Thread(() => {
      try {
        val s = server.accept()
        val in = s.getInputStream
        val buf = new Array[Byte](1 << 16)
        while (in.read(buf) >= 0) ()
      } catch { case _: java.io.IOException => () }
    })
    drain.setDaemon(true)
    drain.start()
    try {
      // 2000 frames at 10k MPS should take ~0.2 s; unpaced it is ~instant
      val stats = TcpClient.run(
        TcpClient.Config("127.0.0.1", server.getLocalPort, count = 2000, size = 64, batch = 100, rateLimitMps = 10000)
      )
      assert(stats.seconds >= 0.15, s"rate limit not applied: ${stats.seconds}s")
    } finally server.close()
  }
}
