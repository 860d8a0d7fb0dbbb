package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.codecs
import graft.model.Telemetry
import graft.operators.{Pipeline, Router}

/** The reference's own pipeline operators (SURVEY.md §2.1-§2.3) re-expressed
  * as batch queries over the `events` table, which stands in for the message
  * stream (FIXTURES.md §5): `user_id` ≈ client_id, `event_id` ≈ sequence,
  * `event_type` ≈ properties["type"], `props` ≈ payload. The streaming twins
  * of these plans run in [[graft.streaming]] (same column code, readStream
  * input).
  *
  * The codec queries are real roundtrips: Spark ENCODES the binary telemetry
  * frames (svc/svc/sim.cpp:36-48) and DECODES them with the codegen'd
  * expressions; the DuckDB oracle simply selects the original columns — if
  * the roundtrip corrupts a single byte the hashes diverge.
  */
object PipelineQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  private def ev(s: SparkSession, dir: String): DataFrame = T(s, dir, "events")

  /** events → per-row heartbeat frame bytes (the O-4 simulator). */
  private def hbFrames(df: DataFrame): DataFrame =
    df.withColumn(
      "frame",
      codecs.encode_heartbeat(col("user_id"), col("event_id"), unix_millis(col("ts")))
    )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O-8 + O-9: frame split + binary decode roundtrip. Two frames are
    // packed per buffer (heartbeat + dyn) to force real frame-boundary
    // walking, then the heartbeat is decoded back to typed columns.
    "p1_codec_roundtrip" -> ((s, dir) => {
      val framed = hbFrames(ev(s, dir))
        .withColumn("dyn", codecs.encode_dyn(encode(col("props"), "UTF-8")))
        .withColumn("buf", concat(col("frame"), col("dyn")))
      framed
        .select(explode(codecs.frame_split(col("buf"))).as("f"))
        .filter(codecs.frame_type(col("f")) === Telemetry.TypeHeartbeat)
        .select(
          codecs.hb_client_id(col("f")).as("client_id"),
          codecs.hb_sequence(col("f")).as("sequence"),
          codecs.hb_timestamp(col("f")).as("ts_ms")
        )
        .orderBy(col("sequence"))
    }),

    // O-9 text rendering (svc/svc/handler.cpp:122-131).
    "p2_heartbeat_text" -> ((s, dir) => {
      hbFrames(ev(s, dir))
        .select(
          codecs.hb_sequence(col("frame")).as("sequence"),
          Pipeline
            .heartbeatText(
              codecs.hb_client_id(col("frame")),
              codecs.hb_sequence(col("frame")),
              codecs.hb_timestamp(col("frame"))
            )
            .as("rendered")
        )
        .orderBy(col("sequence"))
    }),

    // O-10 type dispatch over a mixed frame stream.
    "p3_dispatch" -> ((s, dir) => {
      val mixed = ev(s, dir).withColumn(
        "frame",
        when(
          col("event_id") % 2 === 0,
          codecs.encode_heartbeat(col("user_id"), col("event_id"), unix_millis(col("ts")))
        ).otherwise(codecs.encode_dyn(encode(col("props"), "UTF-8")))
      )
      mixed
        .select(Pipeline.dispatch(codecs.frame_type(col("frame"))).as("branch"))
        .groupBy(col("branch"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("branch"))
    }),

    // O-13 router: allow/deny/wildcard multicast with subject relabel.
    "p4_router" -> ((s, dir) => {
      val msgs = ev(s, dir)
        .withColumn("properties", map(lit("type"), col("event_type")))
      val rules = Seq(
        Router.Rule("purchases", 1, "type", "purchase", Router.Allow, "main-nb", "purchases"),
        Router.Rule("rest", 2, "type", "purchase", Router.Deny, "main-nb", "non-purchase"),
        Router.Rule("mirror", 3, "*", "*", Router.Allow, "audit-nb", "all-events")
      )
      Router
        .route(msgs, rules)
        .select(col("event_id"), col("subject"), col("destination"))
        .orderBy(col("event_id"), col("subject"))
    }),

    // O-12 passthrough relabel.
    "p5_relabel" -> ((s, dir) => {
      Pipeline
        .relabel(ev(s, dir), "dev-test-2")
        .select(col("event_id"), col("subject"), col("props").as("payload"))
        .orderBy(col("event_id"))
    }),

    // O-15 windowed throughput (1 s tumbling; epoch-second key for the
    // oracle).
    "p6_throughput" -> ((s, dir) => {
      Pipeline
        .throughput(ev(s, dir), col("ts"), length(col("props")))
        .select(
          expr("unix_millis(window_start) div 1000").as("window_start_s"),
          col("messages"),
          col("bytes").cast("long").as("bytes")
        )
        .orderBy(col("window_start_s"))
    }),

    // O-15 summary(): lifetime totals.
    "p7_throughput_summary" -> ((s, dir) => {
      Pipeline.throughputSummary(ev(s, dir), length(col("props")))
        .select(col("total_messages"), col("total_bytes").cast("long").as("total_bytes"))
    }),

    // O-17 labeled counters.
    "p8_labeled_counters" -> ((s, dir) => {
      Pipeline
        .labeledCounter(ev(s, dir), col("event_type"))
        .orderBy(col("event_type"))
    }),

    // O-7 broadcast fan-out: every message to every attached sink.
    "p9_fanout" -> ((s, dir) => {
      val msgs = ev(s, dir).select(col("event_id"))
      val sinks = Seq("main-nb", "log-nb")
      sinks
        .map(n => msgs.withColumn("sink", lit(n)))
        .reduce(_ unionAll _)
        .orderBy(col("event_id"), col("sink"))
    }),

    // O-5 Kafka-sink shape: envelope → (key, topic, value).
    "p10_kafka_sink_shape" -> ((s, dir) => {
      ev(s, dir)
        .select(
          col("event_id"),
          col("user_id").cast("string").as("key"),
          lit("dev-test").as("topic"),
          col("props").as("value")
        )
        .orderBy(col("event_id"))
    }),

    // O-13/O-14 drop accounting: messages matching no route.
    "p11_drop_accounting" -> ((s, dir) => {
      val msgs = ev(s, dir).withColumn("properties", map(lit("type"), col("event_type")))
      val rules = Seq(
        Router.Rule("p", 1, "type", "purchase", Router.Allow, "main-nb", "purchases"),
        Router.Rule("c", 2, "type", "click", Router.Allow, "main-nb", "clicks")
      )
      Router
        .dropped(msgs, rules)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("dropped"))
        .orderBy(col("event_type"))
    }),

    // O-15 one-pass typed Aggregator: lifetime totals + MBps/kMPS summary
    // (stat.hpp:71-84) in a single scan.
    "p13_throughput_agg" -> ((s, dir) => {
      import graft.operators.ThroughputAggregator
      import graft.operators.ThroughputAggregator.Obs
      val sess = s
      import sess.implicits._
      val obs = ev(s, dir)
        .select(unix_millis(col("ts")).as("tsMillis"), length(col("props")).cast("long").as("bytes"))
        .as[Obs]
      obs
        .select(ThroughputAggregator.summaryColumn)
        .toDF()
        .select(col("messages"), col("bytes"), col("span_ms"), col("mbps"), col("kmps"))
    }),

    // kcat-style :kv message rendering (kafka.hpp:957-991; consumer FT).
    "p14_render_kv" -> ((s, dir) => {
      ev(s, dir)
        .select(
          col("event_id"),
          Pipeline
            .renderMessage(
              "kv",
              encode(col("user_id").cast("string"), "UTF-8"),
              encode(col("props"), "UTF-8"),
              map()
            )
            .as("rendered")
        )
        .orderBy(col("event_id"))
    }),

    // JSON payload extraction (props is a JSON string ≈ headers).
    "p12_json_extract" -> ((s, dir) => {
      ev(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k")
        )
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "p1_codec_roundtrip" ->
      """SELECT user_id AS client_id, event_id AS sequence, epoch_ms(ts) AS ts_ms
        |FROM events ORDER BY sequence""".stripMargin,
    "p2_heartbeat_text" ->
      """SELECT event_id AS sequence,
        |  'client_id=' || user_id || ' sequence=' || event_id || ' epoch=' || epoch_ms(ts) AS rendered
        |FROM events ORDER BY sequence""".stripMargin,
    "p3_dispatch" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'heartbeat' ELSE 'dyn_message' END AS branch,
        |  COUNT(1) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "p4_router" ->
      """SELECT event_id, subject, destination FROM (
        |  SELECT event_id, 'purchases' AS subject, 'main-nb' AS destination
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT event_id, 'non-purchase', 'main-nb' FROM events WHERE event_type <> 'purchase'
        |  UNION ALL
        |  SELECT event_id, 'all-events', 'audit-nb' FROM events
        |) ORDER BY event_id, subject""".stripMargin,
    "p5_relabel" ->
      """SELECT event_id, 'dev-test-2' AS subject, props AS payload
        |FROM events ORDER BY event_id""".stripMargin,
    "p6_throughput" ->
      """SELECT epoch_ms(ts) // 1000 AS window_start_s,
        |  COUNT(1) AS messages, CAST(SUM(LENGTH(props)) AS BIGINT) AS bytes
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "p7_throughput_summary" ->
      """SELECT COUNT(1) AS total_messages, CAST(SUM(LENGTH(props)) AS BIGINT) AS total_bytes
        |FROM events""".stripMargin,
    "p8_labeled_counters" ->
      """SELECT event_type, COUNT(1) AS value FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "p9_fanout" ->
      """SELECT event_id, sink FROM (
        |  SELECT event_id, 'main-nb' AS sink FROM events
        |  UNION ALL
        |  SELECT event_id, 'log-nb' FROM events
        |) ORDER BY event_id, sink""".stripMargin,
    "p10_kafka_sink_shape" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS key, 'dev-test' AS topic, props AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "p11_drop_accounting" ->
      """SELECT event_type, COUNT(1) AS dropped FROM events
        |WHERE event_type NOT IN ('purchase', 'click')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p13_throughput_agg" ->
      """SELECT COUNT(1) AS messages,
        |  CAST(SUM(LENGTH(props)) AS BIGINT) AS bytes,
        |  MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)) AS span_ms,
        |  SUM(LENGTH(props)) / 1e6 / (GREATEST(1, MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) / 1e3) AS mbps,
        |  COUNT(1) / 1e3 / (GREATEST(1, MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) / 1e3) AS kmps
        |FROM events""".stripMargin,
    "p14_render_kv" ->
      """SELECT event_id,
        |  'key=' || CAST(user_id AS VARCHAR) || ' value=' || props AS rendered
        |FROM events ORDER BY event_id""".stripMargin,
    "p12_json_extract" ->
      """SELECT event_id,
        |  CAST(REPLACE(REPLACE(props, '{"k": ', ''), '}', '') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
