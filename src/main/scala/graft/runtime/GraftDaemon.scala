package graft.runtime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{MetricsBridge, MetricsHttpServer}

import java.util.concurrent.atomic.AtomicBoolean

/** Daemon lifecycle around a service query: graceful stop on signal, on
  * [[stop]] from any thread, or on query failure — the analog of the
  * reference's signal-driven daemon loop + periodic metrics push
  * (libdsp/libdsp/daemon.hpp:80-141, dsp.hpp:297-310). Owns the metrics
  * bridge listener and the `/metrics` HTTP exposer and tears both down
  * with the query, so a stopped daemon leaves no dangling listener,
  * server socket, or active streaming query behind.
  *
  * [[reload]] and the stop path share one monitor: a SIGTERM racing a
  * reload can no longer stop the outgoing query while the reload starts a
  * replacement that nothing ever stops.
  */
final class GraftDaemon private[runtime] (
    spark: SparkSession,
    initialQuery: StreamingQuery,
    val metrics: MetricsBridge,
    metricsServer: MetricsHttpServer,
    initialConfig: GraftService.ServiceConfig,
    restartFn: Option[GraftService.ServiceConfig => StreamingQuery] = None,
    oamServer: Option[MetricsHttpServer] = None
) {

  @volatile private var _query: StreamingQuery = initialQuery
  @volatile private var _config: GraftService.ServiceConfig = initialConfig

  /** The currently-running service query (changes across [[reload]]). */
  def query: StreamingQuery = _query

  /** The config the current query was started from (changes across
    * [[reload]]) — scrape wiring and OAM reads resolve ports from here,
    * never from the construction-time config.
    */
  def currentConfig: GraftService.ServiceConfig = _config

  /** Port the `/metrics` endpoint is listening on. */
  def metricsPort: Int = metricsServer.port

  /** Port the loopback-only OAM (`/reload`) endpoint is listening on.
    * Equals [[metricsPort]] when the metrics bind is loopback (the two
    * share one server); differs when the metrics server is exposed
    * non-loopback and `/reload` got its own loopback-only server.
    */
  def oamPort: Int = oamServer.fold(metricsServer.port)(_.port)

  private val stopped = new AtomicBoolean(false)

  /** Whether [[stop]] has run — the run-loop exit condition for a blocking
    * main (reloads swap the query underneath, so `query.isActive` alone
    * cannot distinguish "stopping" from "mid-reload").
    */
  def isStopped: Boolean = stopped.get()

  /** Runtime reconfiguration: gracefully stop the current query and start a
    * fresh one from `cfg` — the config-reload→query-restart flow behind the
    * reference's (disabled) `/reload` OAM endpoint (svc/svc/main.cpp:203-230)
    * under the restart-on-change stance of SURVEY §7.4. The metrics bridge
    * and `/metrics` exposer survive the swap, so counters keep accumulating
    * across reloads.
    */
  def reload(cfg: GraftService.ServiceConfig): StreamingQuery = synchronized {
    require(!stopped.get(), "daemon is stopped")
    val fn = restartFn.getOrElse(
      throw new UnsupportedOperationException("daemon was built without a restart function")
    )
    if (_query.isActive) _query.stop()
    try {
      _query = fn(cfg)
      _config = cfg
    } catch {
      case e: Throwable =>
        // a config that fails to START must not leave the daemon queryless:
        // revive the previous config, then surface the original failure
        // (async failures after a successful start still flow through
        // awaitTermination, as before)
        try _query = fn(_config)
        catch { case revive: Throwable => e.addSuppressed(revive) }
        throw e
    }
    _query
  }
  // SIGTERM/SIGINT → JVM shutdown → graceful query stop (daemon.hpp:97-108
  // registers sigterm/sigint handlers for the same purpose)
  private val hook = new Thread(() => doStop(), "graft-daemon-shutdown")
  Runtime.getRuntime.addShutdownHook(hook)

  private def doStop(): Unit = synchronized {
    if (stopped.compareAndSet(false, true)) {
      try if (_query.isActive) _query.stop()
      finally {
        spark.streams.removeListener(metrics)
        oamServer.foreach(_.stop())
        metricsServer.stop()
      }
    }
  }

  /** Graceful stop: idempotent, callable from any thread. */
  def stop(): Unit = {
    doStop()
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: IllegalStateException => () } // already shutting down
  }

  /** Block until the daemon's query terminates (via [[stop]], a signal, or
    * failure); rethrows a query failure. Negative timeout = wait forever.
    * A [[reload]] mid-wait is NOT a termination: the wait re-attaches to
    * the replacement query (reading `_query` under the reload monitor, so
    * an old-query stop observed here can't race the swap).
    */
  def awaitTermination(timeoutMs: Long = -1L): Boolean = {
    require(timeoutMs != 0, "timeoutMs must be positive (or negative for no timeout)")
    val deadlineNs =
      if (timeoutMs < 0) Long.MaxValue
      else System.nanoTime() + math.min(timeoutMs, Long.MaxValue / 2000000L) * 1000000L
    var terminated = false
    while (!terminated && !stopped.get()) {
      val q = synchronized(_query)
      if (timeoutMs < 0) q.awaitTermination()
      else {
        val leftMs = (deadlineNs - System.nanoTime()) / 1000000L
        if (leftMs <= 0 || !q.awaitTermination(leftMs)) return false
      }
      // q terminated: real termination unless a reload swapped in a
      // replacement (then keep waiting on the new query)
      terminated = synchronized(_query eq q)
    }
    true
  }
}
