package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** StreamingQueryListener → metrics-registry bridge: reproduces the
  * reference's Prometheus counter surface (libdsp/libdsp/metrics.hpp:28-97;
  * names from svc/handler.cpp:104-165 and the Grafana dashboard) from
  * Spark's per-batch progress events — the O-17/O-18 observability
  * side-channel without a second data pass.
  *
  * Counters: `process_messages_total{query=…}` (input rows),
  * `sent_messages_total{query=…}` (sink rows),
  * `batch_count{query=…}`; gauges `input_rows_per_second` /
  * `processed_rows_per_second` (the 1 s throughput stats of stat.hpp).
  */
final class MetricsBridge extends StreamingQueryListener {

  private val counters = new ConcurrentHashMap[String, LongAdder]()
  private val gauges = new ConcurrentHashMap[String, Double]()

  private def counter(name: String, query: String): LongAdder =
    counters.computeIfAbsent(s"""$name{query="$query"}""", _ => new LongAdder)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val q = Option(p.name).getOrElse(p.id.toString)
    counter("process_messages_total", q).add(p.numInputRows)
    counter("sent_messages_total", q).add(Option(p.sink).map(_.numOutputRows).filter(_ >= 0).getOrElse(0L))
    counter("batch_count", q).increment()
    gauges.put(s"""input_rows_per_second{query="$q"}""", p.inputRowsPerSecond)
    gauges.put(s"""processed_rows_per_second{query="$q"}""", p.processedRowsPerSecond)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  /** Prometheus text exposition (the scrape payload of the reference's
    * /metrics endpoint, interfaces.hpp:205-216).
    */
  def scrape(): String = {
    val sb = new StringBuilder
    counters.forEach((k, v) => { sb.append(s"$k ${v.sum()}\n"); () })
    gauges.forEach((k, v) => { if (!v.isNaN) { sb.append(s"$k $v\n"); () } })
    // process CPU/RSS gauges (stat.hpp:52-58 via sys.hpp:113-162) — the
    // reference refreshes these with the throughput stats; here the
    // scrape drives the (rate-limited) refresh
    sb.append(ProcessStats.scrapeLines())
    sb.toString
  }

  def counterValue(name: String, query: String): Long =
    Option(counters.get(s"""$name{query="$query"}""")).map(_.sum()).getOrElse(0L)
}
