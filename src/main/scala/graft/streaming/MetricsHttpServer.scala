package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets

/** HTTP exposer for [[MetricsBridge]]: serves the Prometheus text
  * exposition at `/metrics`, completing the reference's observability
  * surface (libdsp/libdsp/interfaces.hpp:205-216 declares the exposer;
  * dsp.hpp:275-284 wires it into the service). JDK-built-in
  * `com.sun.net.httpserver` — a scrape endpoint needs no framework.
  *
  * Binds the LOOPBACK address BY DEFAULT: an unauthenticated OAM surface
  * must not be reachable from the network unless asked for (the reference
  * ships its HTTP OAM endpoint disabled for the same reason,
  * svc/svc/main.cpp:203-230). Deployments behind a pod-IP health probe
  * (kubelet readinessProbe, compose port mapping) pass `bind = "0.0.0.0"`
  * — [[graft.runtime.ServiceMain]] wires that from `GRAFT_METRICS_BIND` —
  * and the service then keeps `/reload` OFF this server: a scrape is safe
  * to expose, an unauthenticated restart endpoint is not
  * ([[graft.runtime.GraftService.startDaemon]] splits it onto a second
  * loopback-only server).
  */
final class MetricsHttpServer private (
    server: HttpServer,
    pool: java.util.concurrent.ExecutorService
) {
  def port: Int = server.getAddress.getPort

  /** Whether this server is reachable only via loopback — the gate for
    * co-hosting mutating OAM endpoints like `/reload`.
    */
  def isLoopbackOnly: Boolean = server.getAddress.getAddress.isLoopbackAddress
  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
    ()
  }

  /** Register an additional OAM endpoint (e.g. `/reload`). `fn` receives
    * the UTF-8 request body and returns (status, response body); handler
    * failures answer 500 instead of leaking the exchange.
    */
  def addContext(path: String)(fn: String => (Int, String)): Unit = {
    server.createContext(path, MetricsHttpServer.guarded { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      fn(body)
    })
    ()
  }
}

object MetricsHttpServer {

  /** Wrap a handler body so an exception answers 500 and always closes the
    * exchange — an unguarded throw on the dispatcher thread would leak the
    * connection and kill the serving loop for subsequent scrapes.
    */
  private def guarded(fn: HttpExchange => (Int, String)): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          val (status, text) = try fn(ex)
          catch { case e: Throwable => (500, s"error: ${e.getMessage}\n") }
          val body = text.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(status, body.length.toLong)
          val os = ex.getResponseBody
          try os.write(body)
          finally os.close()
        } finally ex.close()
    }

  /** Start serving `bridge.scrape()` on `/metrics` (plus any extra
    * exposition lines from `extraScrape`, e.g. the TCP ingress shed
    * counters). `port = 0` picks a free ephemeral port (read it back via
    * [[MetricsHttpServer.port]]). `bind = None` (or `"loopback"`) keeps
    * the default loopback-only bind; any other value is resolved as a
    * listen address (`"0.0.0.0"` for all interfaces).
    */
  def start(
      bridge: MetricsBridge,
      port: Int = 0,
      extraScrape: () => String = () => "",
      bind: Option[String] = None
  ): MetricsHttpServer = {
    val addr = bind.map(_.trim).filter(b => b.nonEmpty && b != "loopback") match {
      case Some(host) => InetAddress.getByName(host)
      case None       => InetAddress.getLoopbackAddress
    }
    val server = HttpServer.create(new InetSocketAddress(addr, port), 0)
    server.createContext("/metrics", guarded { _ =>
      (200, bridge.scrape() + extraScrape())
    })
    // a small pool, not the dispatcher thread: /reload runs a multi-second
    // query stop+start and must not block concurrent /metrics scrapes
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      2,
      (r: Runnable) => {
        val t = new Thread(r, "graft-metrics-http")
        t.setDaemon(true)
        t
      }
    )
    server.setExecutor(pool)
    server.start()
    new MetricsHttpServer(server, pool)
  }
}
