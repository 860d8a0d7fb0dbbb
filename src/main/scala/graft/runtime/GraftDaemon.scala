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
  */
final class GraftDaemon private[runtime] (
    spark: SparkSession,
    val query: StreamingQuery,
    val metrics: MetricsBridge,
    metricsServer: MetricsHttpServer
) {

  /** Port the `/metrics` endpoint is listening on. */
  def metricsPort: Int = metricsServer.port

  private val stopped = new AtomicBoolean(false)
  // SIGTERM/SIGINT → JVM shutdown → graceful query stop (daemon.hpp:97-108
  // registers sigterm/sigint handlers for the same purpose)
  private val hook = new Thread(() => doStop(), "graft-daemon-shutdown")
  Runtime.getRuntime.addShutdownHook(hook)

  private def doStop(): Unit =
    if (stopped.compareAndSet(false, true)) {
      try if (query.isActive) query.stop()
      finally {
        spark.streams.removeListener(metrics)
        metricsServer.stop()
      }
    }

  /** Graceful stop: idempotent, callable from any thread. */
  def stop(): Unit = {
    doStop()
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: IllegalStateException => () } // already shutting down
  }

  /** Block until the query terminates (via [[stop]], a signal, or failure);
    * rethrows a query failure. Negative timeout = wait forever.
    */
  def awaitTermination(timeoutMs: Long = -1L): Boolean =
    if (timeoutMs < 0) { query.awaitTermination(); true }
    else query.awaitTermination(timeoutMs)
}
