package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** HTTP exposer for [[MetricsBridge]]: serves the Prometheus text
  * exposition at `/metrics`, completing the reference's observability
  * surface (libdsp/libdsp/interfaces.hpp:205-216 declares the exposer;
  * dsp.hpp:275-284 wires it into the service). JDK-built-in
  * `com.sun.net.httpserver` — a scrape endpoint needs no framework.
  */
final class MetricsHttpServer private (server: HttpServer) {
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object MetricsHttpServer {

  /** Start serving `bridge.scrape()` on `/metrics` (plus any extra
    * exposition lines from `extraScrape`, e.g. the TCP ingress shed
    * counters). `port = 0` picks a free ephemeral port (read it back via
    * [[MetricsHttpServer.port]]).
    */
  def start(
      bridge: MetricsBridge,
      port: Int = 0,
      extraScrape: () => String = () => ""
  ): MetricsHttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext(
      "/metrics",
      new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val body = (bridge.scrape() + extraScrape()).getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          val os = ex.getResponseBody
          try os.write(body)
          finally os.close()
        }
      }
    )
    server.setExecutor(null) // serve on the dispatcher thread: scrapes are tiny
    server.start()
    new MetricsHttpServer(server)
  }
}
