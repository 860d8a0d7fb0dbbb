package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Telemetry

/** Row-transform operators of the reference pipeline (SURVEY.md §2.2/§2.3),
  * each a pure `DataFrame => DataFrame` so batch and streaming plans share
  * the code (the central payoff of the Spark rewrite, SURVEY.md §7.3).
  */
object Pipeline {

  /** O-10 — type dispatch. Tags each frame row with its telemetry branch;
    * unknown types raise, mirroring `throw "Unsupported message type"`
    * (svc/svc/handler.cpp:108-117). `strict=false` tags instead of raising
    * (for drop accounting).
    */
  def dispatch(tpe: Column, strict: Boolean = true): Column = {
    val base = when(tpe === Telemetry.TypeHeartbeat, lit("heartbeat"))
      .when(tpe === Telemetry.TypeDynMessage, lit("dyn_message"))
    if (strict)
      base.otherwise(raise_error(concat(lit("Unsupported message type: "), tpe)))
    else base.otherwise(lit("unsupported"))
  }

  /** O-9 — heartbeat text rendering:
    * `"client_id=… sequence=… epoch=…"` (svc/svc/handler.cpp:122-131).
    */
  def heartbeatText(clientId: Column, sequence: Column, epoch: Column): Column =
    format_string("client_id=%d sequence=%d epoch=%d", clientId, sequence, epoch)

  /** O-11 — envelope construction for the heartbeat branch
    * (svc/svc/handler.cpp:168-181): key = client_id rendered as string
    * bytes, properties = {"type": "heartbeat"}, payload = rendered text.
    */
  def heartbeatEnvelope(df: DataFrame, clientId: Column, sequence: Column, epoch: Column): DataFrame =
    df.select(
      encode(clientId.cast("string"), "UTF-8").as("key"),
      lit(null).cast("string").as("subject"),
      map(lit("type"), lit("heartbeat")).as("properties"),
      encode(heartbeatText(clientId, sequence, epoch), "UTF-8").as("payload")
    )

  /** O-12 — passthrough relabel (svc/svc/handler.cpp:193-236): forward the
    * payload with `subject` set to the configured topic.
    */
  def relabel(df: DataFrame, topic: String, subjectCol: String = "subject"): DataFrame =
    df.withColumn(subjectCol, lit(topic))

  /** O-15 — windowed throughput statistics (libdsp/libdsp/stat.hpp:23-99):
    * per 1-second tumbling window, message count + byte count + MPS/Bps.
    * Works identically on a batch or streaming DataFrame (`window` is
    * supported in both); streaming adds a watermark upstream.
    */
  def throughput(df: DataFrame, ts: Column, sizeBytes: Column, every: String = "1 second"): DataFrame = {
    val winSec =
      (unix_millis(col("win.end")) - unix_millis(col("win.start"))).cast("double") / 1000.0
    df.groupBy(window(ts, every).as("win"))
      .agg(
        count(lit(1)).as("messages"),
        sum(sizeBytes).as("bytes")
      )
      .select(
        col("win.start").as("window_start"),
        col("messages"),
        col("bytes"),
        (col("messages") / winSec).as("mps"),
        (col("bytes") / winSec).as("bps")
      )
  }

  /** O-15 `summary()` — lifetime totals (stat.hpp:71-84). */
  def throughputSummary(df: DataFrame, sizeBytes: Column): DataFrame =
    df.agg(
      count(lit(1)).as("total_messages"),
      sum(sizeBytes).as("total_bytes")
    )

  /** The full `summary()` REPORT of the reference formatter
    * (stat.hpp:155-173): lifetime MBps / kMPS / totals over `uptimeSec`,
    * tailed by the live process gauges — `CPU: x%  RSS: y MB` — from
    * [[graft.streaming.ProcessStats]] (sys.hpp:113-162). Driver-side by
    * design: the totals come from one distributed agg; the process stats
    * are inherently a driver/process property, not row data.
    */
  def throughputSummaryLine(df: DataFrame, sizeBytes: Column, uptimeSec: Double): String = {
    require(uptimeSec > 0.0, "uptime must be positive")
    val r = throughputSummary(df, sizeBytes).collect()(0)
    val msgs = r.getLong(0)
    val bytes = if (r.isNullAt(1)) 0L else r.getAs[Number](1).longValue()
    val s = graft.streaming.ProcessStats.refresh()
    f"${bytes.toDouble / uptimeSec / 1048576.0}%.2f MBps  " +
      f"${msgs.toDouble / uptimeSec / 1000.0}%.2fk MPS  " +
      f"over $uptimeSec%.2f seconds (total: $bytes bytes, $msgs messages)  " +
      f"CPU: ${s.cpuPercent}%5.1f%%  RSS: ${s.rssMb}%.1f MB"
  }

  /** O-17 — labeled counters: metric families keyed by label values
    * (libdsp/libdsp/metrics.hpp:28-97) re-expressed as a group-by over the
    * label column(s).
    */
  def labeledCounter(df: DataFrame, labels: Column*): DataFrame =
    df.groupBy(labels: _*).agg(count(lit(1)).as("value"))

  /** O-7 — broadcast fan-out to N named sinks (cache.hpp:51-117). In batch,
    * the multicast materializes as one cached pass + N writes; the streaming
    * twin lives in [[graft.streaming.FanOutSink]]. Returns per-sink success
    * AND-combined like `cache::send` (cache.hpp:65-76).
    */
  def fanOut(df: DataFrame, sinks: Map[String, DataFrame => Boolean]): Boolean = {
    df.persist()
    try sinks.values.map(write => write(df)).forall(identity)
    finally df.unpersist()
  }

  /** Consumed-message text rendering with the reference's format spec
    * (kafka.hpp:957-991, the `{:lkvh}` formatter): flags select fields —
    * `l` length, `k` key, `v` value/payload, `h` headers — rendered as
    * space-separated `name=value` pairs. The consumer FT expects
    * `key=keyA value=hello kafka` for spec "kv"
    * (scripts/ft-kafka-consumer.stage.sh, FIXTURES.md §1).
    */
  def renderMessage(
      spec: String,
      key: Column,
      payload: Column,
      properties: Column
  ): Column = {
    val parts: Seq[Column] = spec.map {
      case 'l' => concat(lit("len="), length(payload).cast("string"))
      case 'k' => concat(lit("key="), coalesce(decode(key, "UTF-8"), lit("null")))
      // tombstones (null payload) render as the literal, like 'k' — a null
      // here would null the whole concat and drop the field from the line
      case 'v' => concat(lit("value="), coalesce(decode(payload, "UTF-8"), lit("null")))
      case 'h' =>
        concat(
          lit("headers=["),
          array_join(
            transform(
              map_entries(coalesce(properties, map())),
              e => concat(e.getField("key"), lit("="), e.getField("value"))
            ),
            ", "
          ),
          lit("]")
        )
      case c => throw new IllegalArgumentException(s"unknown format flag '$c' (spec: l,k,v,h)")
    }
    concat_ws(" ", parts: _*)
  }

  /** O-14 — load-shed accounting. Spark backpressures rather than drops
    * (semantic swap documented in SURVEY.md §7.4); the metric surface is
    * preserved: classify rows by a queue-full predicate and count by
    * drop_type, mirroring `drop_messages_total{drop_type=load_shed}`
    * (svc/svc/handler.cpp:142-166).
    */
  def shedMetrics(df: DataFrame, queueFull: Column): DataFrame =
    df.groupBy(when(queueFull, lit("load_shed")).otherwise(lit("sent")).as("drop_type"))
      .agg(count(lit(1)).as("value"))
}
