package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.ThroughputAggregator
import graft.operators.ThroughputAggregator.Obs
import graft.streaming.StreamRuntime

/** Kafka edge mappings (testable without a broker), simulator transform,
  * observation metrics, typed aggregator, and custom state
  * (mapGroupsWithState) — the remaining SURVEY.md §2 rows.
  */
class StreamRuntimeSpec extends SparkTestBase {

  import spark.implicits._

  test("kafka row → envelope normalization (O-1 consumed-message view §1.2)") {
    val kafkaShaped = Seq(
      (
        "k1".getBytes("UTF-8"),
        "payload-1".getBytes("UTF-8"),
        "dev-test",
        Seq(("ts", "1234".getBytes("UTF-8"))),
        0,
        42L
      )
    ).toDF("key", "value", "topic", "headers", "partition", "offset")
      .withColumn("headers", col("headers").cast("array<struct<key:string,value:binary>>"))
    val env = StreamRuntime.normalizeKafka(kafkaShaped).collect()(0)
    assert(new String(env.getAs[Array[Byte]]("key"), "UTF-8") == "k1")
    assert(env.getAs[String]("subject") == "dev-test")
    assert(env.getAs[Map[String, String]]("properties") == Map("ts" -> "1234"))
    assert(new String(env.getAs[Array[Byte]]("payload"), "UTF-8") == "payload-1")
  }

  test("kafka normalization tolerates null headers (includeHeaders edge)") {
    val df = Seq((Array[Byte](1), Array[Byte](2), "t"))
      .toDF("key", "value", "topic")
      .withColumn("headers", lit(null).cast("array<struct<key:string,value:binary>>"))
    val env = StreamRuntime.normalizeKafka(df).collect()(0)
    assert(env.getAs[Map[String, String]]("properties") == Map.empty)
  }

  test("kafka normalization: duplicate header keys keep the first occurrence, never crash") {
    // Kafka headers are an ordered multi-map; a raw map_from_entries would
    // throw 'Duplicate map key' and wedge the query on one poison record
    val df = Seq(
      (
        "k".getBytes("UTF-8"),
        "p".getBytes("UTF-8"),
        "t",
        Seq(
          ("trace", "first".getBytes("UTF-8")),
          ("other", "x".getBytes("UTF-8")),
          ("trace", "second".getBytes("UTF-8"))
        )
      )
    ).toDF("key", "value", "topic", "headers")
      .withColumn("headers", col("headers").cast("array<struct<key:string,value:binary>>"))
    val env = StreamRuntime.normalizeKafka(df).collect()(0)
    assert(env.getAs[Map[String, String]]("properties") == Map("trace" -> "first", "other" -> "x"))
  }

  test("kafka normalization: null header keys are skipped, null values kept (poison-pill hardening)") {
    // a null header KEY cannot become a map key (map_from_entries throws);
    // a null header VALUE is legal in Kafka and stays a null map value
    val df = Seq(
      (
        "k".getBytes("UTF-8"),
        "p".getBytes("UTF-8"),
        "t",
        Seq(
          (null.asInstanceOf[String], "dropme".getBytes("UTF-8")),
          ("ok", "v".getBytes("UTF-8")),
          ("nullval", null.asInstanceOf[Array[Byte]])
        )
      )
    ).toDF("key", "value", "topic", "headers")
      .withColumn("headers", col("headers").cast("array<struct<key:string,value:binary>>"))
    val env = StreamRuntime.normalizeKafka(df).collect()(0)
    assert(
      env.getAs[Map[String, String]]("properties") == Map("ok" -> "v", "nullval" -> null)
    )
  }

  test("heartbeat simulator transform builds reference frames (O-4)") {
    val fake = Seq((new java.sql.Timestamp(1700000000000L), 5L)).toDF("timestamp", "value")
    val frame = StreamRuntime.simulateHeartbeats(fake, clientId = 72).as[Array[Byte]].collect()(0)
    val hb = graft.model.Telemetry.decodeHeartbeat(graft.model.Telemetry.decodeOne(frame, 0).get.body)
    assert(hb == graft.model.Telemetry.Heartbeat(72, 5, 1700000000000L))
  }

  test("observation counters ride the query (O-17 metrics names)") {
    val df = Seq("abc", "defg").toDF("s").select(encode(col("s"), "UTF-8").as("payload"))
    val (instrumented, obs) = StreamRuntime.observeCounters(df, "proc")
    instrumented.count()
    val m = obs.get
    assert(m("process_messages_total") == 2L && m("process_bytes_total") == 7L)
  }

  test("one-pass throughput aggregator matches reference summary math (stat.hpp:71-84)") {
    val ds = Seq(Obs(0L, 1000000L), Obs(500L, 1000000L), Obs(1000L, 0L)).toDS()
    val s = ds.select(ThroughputAggregator.summaryColumn).collect()(0)
    assert(s.messages == 3 && s.bytes == 2000000L && s.span_ms == 1000L)
    assert(math.abs(s.mbps - 2.0) < 1e-9) // 2 MB over 1 s
    assert(math.abs(s.kmps - 0.003) < 1e-9)
  }

  test("custom per-key state via mapGroupsWithState (sequence-gap detector)") {
    implicit val sqlCtx = spark.sqlContext
    // reference semantics: heartbeat sequence increments per client; state
    // tracks last seq per client and flags gaps (the kind of handler state
    // the reference keeps per connection, doc/test.adoc:51-53).
    val input = MemoryStream[(Long, Long)]
    input.addData((1L, 0L), (1L, 1L), (2L, 0L))
    input.addData((1L, 3L), (2L, 1L)) // client 1 skips seq 2
    val gaps = input
      .toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (client: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val seqs = rows.map(_._2).toSeq.sorted
          val start = state.getOption.getOrElse(-1L)
          val all = start +: seqs
          val gapCount = all.sliding(2).count { case Seq(a, b) => b - a > 1 }.toLong
          state.update(seqs.last)
          (client, gapCount)
      }
    val q = gaps.toDF("client", "gaps").writeStream
      .format("memory").queryName("gap_state").outputMode(OutputMode.Update).start()
    q.processAllAvailable()
    q.stop()
    val byClient = spark.table("gap_state").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byClient(1L) == 1 && byClient(2L) == 0)
  }

  test("approx_count_distinct within 5% of exact (q23 accuracy contract)") {
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].collect()(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02)).as[Long].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("k2k pipeline end-to-end: kafka-shaped rows -> normalize -> relabel -> sink shape (§3.2)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long)]
    input.addData(
      ("k1".getBytes("UTF-8"), "v1".getBytes("UTF-8"), "dev-test", 0, 0L),
      ("k2".getBytes("UTF-8"), "v2".getBytes("UTF-8"), "dev-test", 0, 1L)
    )
    val kafkaShaped = input
      .toDF()
      .toDF("key", "value", "topic", "partition", "offset")
      .withColumn("headers", lit(null).cast("array<struct<key:string,value:binary>>"))
    // the whole §3.2 pipeline: normalize -> relabel -> kafka sink columns
    val out = graft.operators.Pipeline
      .relabel(StreamRuntime.normalizeKafka(kafkaShaped), "dev-test-2")
      .select(
        col("key"),
        col("subject").as("topic"),
        col("payload").as("value")
      )
    val q = out.writeStream.format("memory").queryName("k2k").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark
      .table("k2k")
      .collect()
      .map(r => (new String(r.getAs[Array[Byte]]("key"), "UTF-8"), r.getString(1), new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
      .toSet
    assert(rows == Set(("k1", "dev-test-2", "v1"), ("k2", "dev-test-2", "v2")))
  }

  test("audit profile: nulls, ranges, distincts in one pass") {
    val df = Seq((1L, Some("a"), 1.5), (2L, None, -0.5), (3L, Some("a"), 9.0))
      .toDF("id", "s", "v")
    val row = graft.operators.Audit.profile(df).collect()(0)
    assert(row.getAs[Long]("n_rows") == 3)
    assert(row.getAs[Long]("s_nulls") == 1 && row.getAs[Long]("s_distinct") == 1)
    assert(row.getAs[Double]("v_min") == -0.5 && row.getAs[Double]("v_max") == 9.0)
    assert(row.getAs[Long]("id_nulls") == 0)
  }

  test("asMessages typed facade roundtrips the envelope") {
    val env = Seq(
      ("k".getBytes("UTF-8"), "topic", Map("a" -> "1"), "pay".getBytes("UTF-8"))
    ).toDF("key", "subject", "properties", "payload")
    val msg = StreamRuntime.asMessages(env).collect()(0)
    assert(new String(msg.key, "UTF-8") == "k" && msg.subject == "topic")
    assert(msg.properties == Map("a" -> "1") && new String(msg.payload, "UTF-8") == "pay")
  }

  test("kafka sink column mapping (O-5) — the real toKafkaColumns projection, no broker") {
    val env = Seq(
      (Array[Byte](1), "topic-a", Map("h" -> "v"), Array[Byte](9))
    ).toDF("key", "subject", "properties", "payload")
    val projected = StreamRuntime.toKafkaColumns(env)
    val row = projected.collect()(0)
    assert(row.getAs[String]("topic") == "topic-a")
    val hdr = row.getAs[Seq[org.apache.spark.sql.Row]]("headers").head
    assert(hdr.getAs[String]("key") == "h" && new String(hdr.getAs[Array[Byte]]("value"), "UTF-8") == "v")
    assert(projected.schema.fieldNames.toSeq == Seq("key", "topic", "headers", "value"))
    // the documented sink-edge schema IS the projection's schema — keeps
    // Message.kafkaSinkSchema a checked contract, not duplicated truth
    assert(
      org.apache.spark.sql.types.DataType.equalsIgnoreNullability(
        projected.schema,
        graft.model.Message.kafkaSinkSchema
      ),
      s"toKafkaColumns schema drifted from Message.kafkaSinkSchema:\n${projected.schema}\nvs\n${graft.model.Message.kafkaSinkSchema}"
    )
  }

  test("kafka deep round-trip: recorded consumer rows → normalize → route → sink rows match FT fixtures") {
    // Recorded frames in the EXACT Spark kafka-source schema (key/value
    // binary, topic, headers array<struct<key,value:binary>>, partition,
    // offset, timestamp, timestampType) covering the edges a broker
    // delivers: null key, null headers, empty headers, multi/duplicate-free
    // headers, multiple topics. Fixture content = the consumer FT's kcat
    // input (scripts/ft-kafka-consumer.stage.sh:31-40, FIXTURES.md §1)
    // plus the producer FT's null-key/ts-header message
    // (scripts/ft-kafka-producer.stage.sh:23-28).
    val ts = new java.sql.Timestamp(1700000000000L)
    val recorded = Seq(
      // consumer FT fixtures on topic ft-test-consumer (5 partitions)
      ("keyA".getBytes("UTF-8"), "hello kafka".getBytes("UTF-8"), "ft-test-consumer",
        Seq(("ts", "1234".getBytes("UTF-8"))), 0, 0L, ts, 0),
      ("keyB".getBytes("UTF-8"), "hello again".getBytes("UTF-8"), "ft-test-consumer",
        Seq(("ts", "1234".getBytes("UTF-8")), ("trace", "abc".getBytes("UTF-8"))), 3, 1L, ts, 0),
      // producer FT shape: null key, null headers, other topic
      (null.asInstanceOf[Array[Byte]], Array.fill[Byte](200)('x'), "ft-test-producer",
        null.asInstanceOf[Seq[(String, Array[Byte])]], 1, 7L, ts, 0),
      // empty (non-null) header array
      ("keyC".getBytes("UTF-8"), "drop me".getBytes("UTF-8"), "ft-test-consumer",
        Seq.empty[(String, Array[Byte])], 2, 2L, ts, 0)
    ).toDF("key", "value", "topic", "headers", "partition", "offset", "timestamp", "timestampType")
      .withColumn("headers", col("headers").cast("array<struct<key:string,value:binary>>"))

    val envelope = StreamRuntime.normalizeKafka(recorded)

    // route like the FT service config: ts-header traffic to main-nb with
    // subject rewrite, everything else denied from main-nb but mirrored.
    val rules = Seq(
      graft.operators.Router.Rule("ts", 1, "ts", "1234", graft.operators.Router.Allow, "main-nb", "dev-test-2", "exact"),
      graft.operators.Router.Rule("rest", 2, "*", "*", graft.operators.Router.Allow, "audit-nb", "audit", "exact")
    )
    val routed = graft.operators.Router.route(envelope, rules)
    val sinkRows = StreamRuntime
      .toKafkaColumns(routed.filter(col("destination") === "main-nb"))
      .orderBy(col("key"))
      .collect()

    // byte-for-byte sink rows: only the two ts-header fixtures, relabeled
    assert(sinkRows.length == 2)
    assert(sinkRows.map(_.getAs[String]("topic")).toSeq == Seq("dev-test-2", "dev-test-2"))
    assert(new String(sinkRows(0).getAs[Array[Byte]]("key"), "UTF-8") == "keyA")
    assert(new String(sinkRows(0).getAs[Array[Byte]]("value"), "UTF-8") == "hello kafka")
    val h0 = sinkRows(0).getSeq[org.apache.spark.sql.Row](sinkRows(0).fieldIndex("headers"))
    assert(h0.map(h => h.getAs[String]("key") -> new String(h.getAs[Array[Byte]]("value"), "UTF-8")).toSeq ==
      Seq("ts" -> "1234"))
    val h1 = sinkRows(1).getSeq[org.apache.spark.sql.Row](sinkRows(1).fieldIndex("headers"))
    assert(h1.map(h => h.getAs[String]("key") -> new String(h.getAs[Array[Byte]]("value"), "UTF-8")).toMap ==
      Map("ts" -> "1234", "trace" -> "abc"))

    // audit mirror keeps everything incl. null key / null+empty headers
    val audit = routed.filter(col("destination") === "audit-nb")
    assert(audit.count() == 4)
    val nullKey = audit.filter(col("key").isNull).collect()
    assert(nullKey.length == 1 && nullKey(0).getAs[Array[Byte]]("payload").length == 200)
    assert(nullKey(0).getAs[Map[String, String]]("properties") == Map.empty)

    // the FT's grep lines reproduce exactly (ft-kafka-consumer.stage.sh:45-46)
    val rendered = envelope
      .filter(col("subject") === "ft-test-consumer" && col("key").isNotNull)
      .orderBy(col("key"))
      .limit(2)
      .select(graft.operators.Pipeline.renderMessage("kv", col("key"), col("payload"), col("properties")).as("r"))
      .as[String].collect().toSeq
    assert(rendered == Seq("key=keyA value=hello kafka", "key=keyB value=hello again"))
  }
}
