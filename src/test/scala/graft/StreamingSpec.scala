package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

import graft.operators.{Pipeline, Router}
import graft.streaming.StreamRuntime

/** Batch/stream symmetry: the SAME operator code (Pipeline/Router) runs
  * under a streaming source, producing the same results — the reference's
  * pipelines §3.1/§3.2 as Structured Streaming queries.
  */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String, mode: String = "append") = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("StreamDedup: batch-2 re-ingests of batch-1 docs are dropped; replay cannot poison the store") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-dedup-store").toString + "/digests"
    val accepted = scala.collection.concurrent.TrieMap.empty[Long, String]
    val input = MemoryStream[(Long, String)]
    val q = input
      .toDF()
      .toDF("doc_id", "text")
      .writeStream
      .foreachBatch(
        graft.streaming.StreamDedup.dedupSink(
          col("text"),
          col("doc_id"),
          store,
          (kept, _) => kept.collect().foreach(r => accepted.put(r.getLong(0), r.getString(1)))
        )
      )
      .start()
    try {
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha")) // within-batch dup: 3 collapses onto 1
      q.processAllAvailable()
      assert(accepted.keySet == Set(1L, 2L), s"batch 1 survivors wrong: $accepted")

      input.addData((10L, "alpha"), (11L, "gamma"), (12L, "beta"), (13L, "gamma"))
      q.processAllAvailable()
      // cross-batch re-ingests (alpha, beta) dropped; new text survives once
      assert(accepted.keySet == Set(1L, 2L, 11L), s"batch 2 survivors wrong: $accepted")
    } finally q.stop()

    // replay semantics: re-running an epoch AGAINST ITS OWN STORED DIGESTS
    // must re-derive the same survivors (epoch partition self-excluded)
    val replayAccepted = scala.collection.mutable.Set.empty[Long]
    val replayBatch = Seq((10L, "alpha"), (11L, "gamma"), (12L, "beta"), (13L, "gamma")).toDF("doc_id", "text")
    val n = graft.streaming.StreamDedup.dedupBatch(
      replayBatch, col("text"), col("doc_id"), store, epoch = 1L,
      (kept, _) => kept.collect().foreach(r => replayAccepted.add(r.getLong(0))))
    assert(n == 1L && replayAccepted == Set(11L), s"replay diverged: n=$n, $replayAccepted")
  }

  test("StreamCurate: quality-gated, PII-scrubbed, cross-batch-deduped ingestion") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-curate-store").toString + "/digests"
    val accepted = scala.collection.concurrent.TrieMap.empty[Long, String]
    // passes the (relaxed) gate: >= 4 words, one stopword
    val good = "the quick brown fox jumps over reach me at bob@mail.example.org today"
    val goodOtherPii = "the quick brown fox jumps over reach me at eve@mail.example.org today"
    val fresh = "a completely different document with enough words to pass the gate"
    val input = MemoryStream[(Long, String)]
    val q = input
      .toDF()
      .toDF("doc_id", "text")
      .writeStream
      .foreachBatch(
        graft.streaming.StreamCurate.curateSink(
          "text",
          col("doc_id"),
          store,
          (kept, _) => kept.collect().foreach(r => accepted.put(r.getLong(0), r.getString(1))),
          minWords = 4,
          minStopHits = 1
        )
      )
      .start()
    try {
      input.addData((1L, good), (2L, "too short"), (3L, good))
      q.processAllAvailable()
      // 2 fails the gate; 3 collapses onto 1 within the batch
      assert(accepted.keySet == Set(1L), s"batch 1 survivors wrong: $accepted")
      assert(
        accepted(1L).contains("<EMAIL>") && !accepted(1L).contains("bob@"),
        s"accepted text must be redacted: ${accepted(1L)}"
      )

      // 10: re-ingest of doc 1 with DIFFERENT PII — the digest keys the
      // scrubbed text, so it still collapses and is dropped; 11 is new
      input.addData((10L, goodOtherPii), (11L, fresh))
      q.processAllAvailable()
      assert(accepted.keySet == Set(1L, 11L), s"batch 2 survivors wrong: $accepted")
    } finally q.stop()
  }

  test("StreamSft: parse → loss gate → pairs per prompt, cross-batch prompt dedup, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-sft-store").toString + "/prompts"
    def convo(prompt: String, answer: String) = s"user: $prompt\nassistant: $answer"
    val p1 = "what is the capital of atlantis"
    val p2 = "summarize the maritime treaty"
    val p3 = "translate the harbor codex"
    val accepted = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long)] // chosen -> (rejected, n_cands)
    val input = MemoryStream[(Long, String, Double)]
    val q = input
      .toDF()
      .toDF("cand_id", "text", "score")
      .writeStream
      .foreachBatch(
        graft.streaming.StreamSft.sftSink(
          "text",
          col("cand_id"),
          col("score"),
          store,
          (pairs, _) =>
            pairs.collect().foreach { r =>
              accepted.put(
                r.getAs[Long]("chosen_id"),
                (r.getAs[Long]("rejected_id"), r.getAs[Long]("n_candidates"))
              )
            }
        )
      )
      .start()
    try {
      input.addData(
        (1L, convo(p1, "a long and helpful canonical answer"), 0.9),
        (2L, convo(p1, "nope"), 0.2),
        (3L, convo(p2, "a vague partial answer"), 0.5),
        (4L, convo(p2, "a careful complete answer"), 0.7),
        (5L, s"user: $p1", 0.99) // zero supervised tokens → loss-gated out, never a candidate
      )
      q.processAllAvailable()
      assert(accepted.toMap == Map(1L -> (2L, 2L), 4L -> (3L, 2L)), s"epoch-0 pairs wrong: $accepted")

      input.addData(
        (6L, convo(p1, "a brand new competitor answer"), 0.95), // p1 already shipped a pair
        (7L, convo(p1, "another one"), 0.1),
        (8L, convo(p3, "tide tables and star charts"), 0.8),
        (9L, convo(p3, "illegible"), 0.3)
      )
      q.processAllAvailable()
      assert(
        accepted.toMap == Map(1L -> (2L, 2L), 4L -> (3L, 2L), 8L -> (9L, 2L)),
        s"epoch-1 must add only the p3 pair: $accepted"
      )
    } finally q.stop()

    // replay epoch 1 against its own stored digests: same single p3 pair,
    // the p1 pair still suppressed, the store not poisoned
    val replayPairs = scala.collection.mutable.Set.empty[(Long, Long)]
    val replayBatch = Seq(
      (6L, convo(p1, "a brand new competitor answer"), 0.95),
      (7L, convo(p1, "another one"), 0.1),
      (8L, convo(p3, "tide tables and star charts"), 0.8),
      (9L, convo(p3, "illegible"), 0.3)
    ).toDF("cand_id", "text", "score")
    val (nPairs, nDropped) = graft.streaming.StreamSft.sftBatch(
      replayBatch, "text", col("cand_id"), col("score"), store, epoch = 1L,
      (pairs, _) =>
        pairs.collect().foreach(r => replayPairs.add((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"))))
    )
    assert(nPairs == 1L && nDropped == 0L && replayPairs == Set((8L, 9L)), s"replay diverged: $nPairs $nDropped $replayPairs")
  }

  test("csvIngest runs unchanged under a streaming source with corrupt accounting observable") {
    // the ingest op is a pure projection, so batch/stream symmetry is
    // free — and corrupt lines must flag, not fail, mid-stream.
    val in = MemoryStream[String](spark)
    val parsed = graft.operators.CorpusOps
      .csvIngest(
        // monotonically_increasing_id is unsupported on streams — a
        // content hash is the streaming-native line id
        in.toDF().withColumn("lid", xxhash64(col("value"))),
        col("lid"),
        col("value")
      )
    in.addData(
      "1,\"ok, quoted\",en,10",
      "2,\"bad\",en,NOTINT",
      "3,plain,fr,5"
    )
    val out = runToMemory(parsed, "csv_stream")
    val rows = out.select("doc_id", "text", "is_corrupt").collect()
    assert(rows.length == 3)
    assert(rows.count(_.getBoolean(2)) == 1)
    assert(rows.filter(!_.getBoolean(2)).map(_.getString(1)).toSet == Set("ok, quoted", "plain"))
  }

  test("StreamWebIngest: corrupt lines counted, robots-blocked dropped, cross-batch dedup holds") {
    import graft.streaming.StreamWebIngest
    val dir = java.nio.file.Files.createTempDirectory("webingest").toString
    val store = s"$dir/digests"
    val robots = Seq(("d", "User-agent: *\nDisallow: /private\n")).toDF("domain", "txt")
    val acceptedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val accept: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (df, _) => acceptedIds ++= df.select("doc_id").as[Long].collect()

    def mkBatch(rows: Seq[(Long, String)]) = rows.toDF("lid", "line")
    def run(epoch: Long, rows: Seq[(Long, String)]) =
      StreamWebIngest.ingestBatch(
        mkBatch(rows), col("lid"), col("line"),
        lit("d"),
        concat(when(col("doc_id") % 2 === 0, lit("/private/x")).otherwise(lit("/pub/x")), col("doc_id")),
        robots, col("domain"), col("txt"), "anybot",
        store, epoch, accept
      )

    // epoch 1: doc 1 ok (/pub), doc 2 blocked (/private), corrupt line,
    // a well-formed line with NULL doc_id (invalid, not corrupt), doc 3 ok
    val r1 = run(1L, Seq(
      (1L, "1,\"alpha text\",en,10"),
      (2L, "2,\"beta text\",en,9"),
      (3L, "3,\"gamma\",fr,BAD"),
      (7L, ",\"no id text\",en,10"),
      (4L, "3,\"gamma text\",fr,10")
    ))
    assert(r1 == ((2L, 1L, 1L, 1L)), s"epoch1 (accepted,corrupt,invalid,blocked): $r1")
    assert(acceptedIds.sorted == Seq(1L, 3L))

    // epoch 2: re-ingest doc 1 (deduped), new doc 5 accepted
    val r2 = run(2L, Seq(
      (5L, "1,\"alpha text\",en,10"),
      (6L, "5,\"delta text\",de,10")
    ))
    assert(r2 == ((1L, 0L, 0L, 0L)), s"epoch2: $r2")
    assert(acceptedIds.sorted == Seq(1L, 3L, 5L))

    // duplicate doc_id with DIFFERENT paths must gate PER ROW, not per
    // doc_id: doc 9 arrives twice, once on /pub (line 9, allowed) and
    // once on /private (line 8, blocked) — the blocked row must not
    // ride the allowed row's verdict
    val r3 = StreamWebIngest.ingestBatch(
      mkBatch(Seq(
        (8L, "9,\"epsilon text\",en,12"),
        (9L, "9,\"epsilon other\",en,13")
      )),
      col("lid"), col("line"),
      lit("d"),
      concat(when(col("line_id") % 2 === 0, lit("/private/x")).otherwise(lit("/pub/x")), col("doc_id")),
      robots, col("domain"), col("txt"), "anybot",
      store, 3L, accept
    )
    assert(r3 == ((1L, 0L, 0L, 1L)), s"epoch3 (per-row gating): $r3")
  }

  test("StreamAsOf: events enrich against accumulated observations; replay idempotent") {
    import graft.streaming.StreamAsOf
    val store = java.nio.file.Files.createTempDirectory("graft_asof_store").toString
    var delivered = Vector.empty[(Long, Seq[(Long, Long, String, Option[Double])])]
    def acc(df: org.apache.spark.sql.DataFrame, ep: Long): Unit =
      delivered :+= (ep -> df
        .select(col("k"), col("t"), col("ev"), col("price"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(x => (x._1, x._2))
        .toSeq)
    // epoch 0: one observation (k=1, t=100, price=10), no events
    val obs0 = Seq((1L, 100L, 10.0)).toDF("k", "t", "price")
    val ev0 = Seq.empty[(Long, Long, String)].toDF("k", "t", "ev")
    assert(StreamAsOf.enrichBatch(ev0, obs0, "k", "t", store, 0L, acc) == 0L)
    // epoch 1: fresh observations + events; an event must see BOTH the
    // stored epoch-0 observation and its own batch's (same-batch
    // visibility), and an event before any observation stays null
    val obs1 = Seq((1L, 300L, 20.0), (2L, 50L, 5.0)).toDF("k", "t", "price")
    val ev1 = Seq(
      (1L, 250L, "a"), // after epoch-0 obs, before epoch-1 obs -> 10
      (1L, 350L, "b"), // after the same-batch obs -> 20
      (2L, 40L, "c"), // before k=2's first observation -> null
      (2L, 60L, "d") // after the same-batch obs -> 5
    ).toDF("k", "t", "ev")
    assert(StreamAsOf.enrichBatch(ev1, obs1, "k", "t", store, 1L, acc) == 4L)
    val want = Seq(
      (1L, 250L, "a", Some(10.0)),
      (1L, 350L, "b", Some(20.0)),
      (2L, 40L, "c", None),
      (2L, 60L, "d", Some(5.0))
    )
    assert(delivered(1) == (1L -> want), s"epoch-1 enrich wrong: ${delivered(1)}")
    // REPLAY epoch 1 (crash-after-store-write): identical output — the
    // store's own epoch partition is excluded, so the batch never joins
    // against its first attempt twice
    assert(StreamAsOf.enrichBatch(ev1, obs1, "k", "t", store, 1L, acc) == 4L)
    assert(delivered(2) == (1L -> want), "replay diverged")
    // epoch 2: history spans epochs — latest-at-or-before wins across them
    val ev2 = Seq((1L, 275L, "e"), (1L, 999L, "f")).toDF("k", "t", "ev")
    val obs2 = Seq.empty[(Long, Long, Double)].toDF("k", "t", "price")
    assert(StreamAsOf.enrichBatch(ev2, obs2, "k", "t", store, 2L, acc) == 2L)
    assert(
      delivered(3)._2 == Seq((1L, 275L, "e", Some(10.0)), (1L, 999L, "f", Some(20.0))),
      s"cross-epoch history wrong: ${delivered(3)}"
    )
    // chunked path delivers the same rows
    var chunkedOut: Seq[(Long, Long, String, Option[Double])] = Nil
    StreamAsOf.enrichBatch(
      ev2, obs2, "k", "t", store, 2L,
      (df, _) => chunkedOut = df.select(col("k"), col("t"), col("ev"), col("price"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(x => (x._1, x._2)).toSeq,
      chunked = true
    )
    assert(chunkedOut == delivered(3)._2, "chunked enrich diverged")
  }

  test("streaming router multicast == batch router multicast (O-13)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "heartbeat"), (2L, "other"), (3L, "heartbeat"))
    val streamDf = input
      .toDF()
      .toDF("id", "tpe")
      .withColumn("properties", map(lit("type"), col("tpe")))
    val routed = Router.route(streamDf, Router.referenceRules)
    val got = runToMemory(routed.select(col("id"), col("subject")), "routed_stream")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(got == Set((1L, "heartbeats"), (3L, "heartbeats"), (2L, "dev-test")))
  }

  test("streaming 1s throughput window with watermark (O-15)") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val input = MemoryStream[(Timestamp, Int)]
    input.addData(
      (new Timestamp(base + 100), 10),
      (new Timestamp(base + 600), 20),
      (new Timestamp(base + 1200), 30),
      (new Timestamp(base + 30000), 1) // watermark pusher
    )
    val df = input.toDF().toDF("ts", "size")
    val agg = StreamRuntime.throughput(df, "ts", col("size"))
    val got = runToMemory(agg, "tp_stream")
      .select(unix_millis(col("window_start")).as("w"), col("messages"), col("bytes"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got.contains((base, 2L, 30L)))
    assert(got.contains((base + 1000, 1L, 30L)))
  }

  test("AvailableNow drain processes everything then stops (O-16)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    input.addData(1L to 100L: _*)
    val w = input.toDF().toDF("v").writeStream.format("memory").queryName("drain_t")
    val q = StreamRuntime.drainAndStop(w)
    assert(!q.isActive) // stopped by itself after draining
    assert(spark.table("drain_t").count() == 100)
  }

  test("fan-out: one micro-batch lands in every attached sink (O-7)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    input.addData(1L, 2L, 3L)
    val sunk = scala.collection.concurrent.TrieMap.empty[String, Long]
    val sinks = Map[String, org.apache.spark.sql.DataFrame => Unit](
      "main-nb" -> (b => sunk.updateWith("main-nb")(v => Some(v.getOrElse(0L) + b.count()))),
      "log-nb" -> (b => sunk.updateWith("log-nb")(v => Some(v.getOrElse(0L) + b.count())))
    )
    val q = StreamRuntime.fanOutSink(input.toDF().toDF("v"), sinks).start()
    q.processAllAvailable()
    q.stop()
    assert(sunk("main-nb") == 3 && sunk("log-nb") == 3)
  }

  test("streaming dedup: dropDuplicatesWithinWatermark bounds state") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val input = MemoryStream[(Timestamp, String)]
    input.addData(
      (new Timestamp(base), "a"),
      (new Timestamp(base + 100), "a"), // dup within watermark
      (new Timestamp(base + 200), "b")
    )
    val deduped = input
      .toDF()
      .toDF("ts", "k")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("k")
    val got = runToMemory(deduped, "dedup_stream").collect().map(_.getString(1)).sorted.toSeq
    assert(got == Seq("a", "b"))
  }

  test("streaming session windows with watermark (gap merge)") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val input = MemoryStream[(Timestamp, Long)]
    input.addData(
      (new Timestamp(base), 1L),
      (new Timestamp(base + 2000), 1L), // same session (gap 5s)
      (new Timestamp(base + 20000), 1L), // new session
      (new Timestamp(base + 600000), 2L) // watermark pusher
    )
    val sessions = input
      .toDF()
      .toDF("ts", "user")
      .withWatermark("ts", "10 seconds")
      .groupBy(col("user"), session_window(col("ts"), "5 seconds").as("sw"))
      .agg(count(lit(1)).as("n"))
    val got = runToMemory(sessions, "session_stream")
      .select(col("user"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got.contains((1L, 2L)) && got.contains((1L, 1L)))
  }

  test("watermark boundary: a row arriving BELOW the advanced watermark is dropped, not re-aggregated") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(sec: Long) = new Timestamp(base + sec * 1000)
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input
      .toDF()
      .toDF("ts", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_agg").outputMode("append").start()
    try {
      // batch 1: one row in window [50,60) + a pusher at t=100
      // -> watermark after the batch = 100 - 10 = 90s, window finalized n=1
      input.addData((ts(55), 1L), (ts(100), 1L))
      q.processAllAvailable()
      // batch 2: a LATE row for the same window (t=56 < watermark 90)
      // must be dropped at the boundary; pusher at t=200 closes the rest
      input.addData((ts(56), 1L), (ts(200), 1L))
      q.processAllAvailable()
      val got = spark.table("late_agg").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got((base / 1000 + 50)) == 1L, s"late row leaked into the finalized window: $got")
      // exactly one emission for that window (append mode can't re-emit)
      val emissions = spark.table("late_agg").collect().count(_.getLong(0) == base / 1000 + 50)
      assert(emissions == 1)
      // the engine accounted for the drop (observability, not silence) —
      // scan recentProgress: the last batch is usually a no-data batch
      val dropped = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, "expected numRowsDroppedByWatermark >= 1")
    } finally q.stop()
  }

  test("cross-batch dedup: out-of-order arrivals within the watermark dedup exactly; below it they drop") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(sec: Long) = new Timestamp(base + sec * 1000)
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input
      .toDF()
      .toDF("ts", "k")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.format("memory").queryName("xbatch_dedup").outputMode("append").start()
    try {
      // batch 1: k1/k2 arrive OUT OF ORDER (k2's event time earlier);
      // watermark after the batch = 35 - 10 = 25s
      input.addData((ts(30), "k1"), (ts(25), "k2"), (ts(35), "k0"))
      q.processAllAvailable()
      // batch 2, reordered arrivals: k1@32 and k2@26 are cross-batch dups
      // (state still within watermark) -> dropped as duplicates; k3@28 is
      // out-of-order but ABOVE the 25s watermark -> kept; k4@10 is BELOW
      // the watermark -> dropped as late
      input.addData((ts(32), "k1"), (ts(26), "k2"), (ts(28), "k3"), (ts(10), "k4"))
      q.processAllAvailable()
      val got = spark.table("xbatch_dedup").collect().map(_.getString(1)).sorted.toSeq
      assert(got == Seq("k0", "k1", "k2", "k3"), s"cross-batch dedup wrong: $got")
    } finally q.stop()
  }

  test("checkpoint recovery: restart resumes from committed offsets, no reprocessing") {
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val dataDir = root.resolve("data").toString
    val ckpt = root.resolve("ckpt").toString
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Int]

    def writeBatch(ids: Seq[Long]): Unit =
      ids.toDF("id").coalesce(1).write.mode("append").parquet(dataDir)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG")
        .parquet(dataDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => seen.updateWith(r.getLong(0))(v => Some(v.getOrElse(0) + 1)))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeBatch(1L to 5L)
    runOnce()
    assert(seen.keySet == (1L to 5L).toSet)
    writeBatch(6L to 8L)
    runOnce() // same checkpoint: must process ONLY the new files
    assert(seen.keySet == (1L to 8L).toSet)
    assert(seen.values.forall(_ == 1), s"reprocessed rows: ${seen.filter(_._2 > 1)}")
  }

  test("streaming codec pipeline: frames decode in-stream (O-8/O-9)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.codecs
    val input = MemoryStream[(Long, Long, Long)]
    input.addData((72L, 0L, 1700L), (72L, 1L, 1701L))
    val df = input
      .toDF()
      .toDF("c", "s", "t")
      .select(codecs.encode_heartbeat(col("c"), col("s"), col("t")).as("frame"))
      .select(codecs.hb_client_id(col("frame")).as("client_id"), codecs.hb_sequence(col("frame")).as("seq"))
    val got = runToMemory(df, "codec_stream").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((72L, 0L), (72L, 1L)))
  }

  test("StreamLinkage: attach to stored entities, new entities, merge observation, replay idempotent") {
    import spark.implicits._
    import graft.streaming.StreamLinkage
    val store = java.nio.file.Files.createTempDirectory("graft-link-store").toString + "/keys"
    val accepted = scala.collection.mutable.Map.empty[Long, (Long, Boolean, Long)]
    val acc: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, _) =>
      df.collect().foreach { r =>
        accepted(r.getAs[Long]("id")) =
          ((r.getAs[Long]("entity"), r.getAs[Boolean]("matched_store"), r.getAs[Long]("n_matched_entities")))
      }

    // epoch 0: 1≈2 ("alphaXX corp" / "alphaXX corp.") cluster; 4 and 5
    // ("bravoXX/bravoYY corp") are near each other but BELOW threshold
    // (two substitutions: jw 0.9333 < 0.95) → distinct entities; the
    // bravo family shares no prefix with alpha, so nothing cross-matches
    val e0 = Seq(
      (1L, "alphaXX corp", "a"),
      (2L, "alphaXX corp.", "a"),
      (3L, "beta llc", "b"),
      (4L, "bravoXX corp", "a"),
      (5L, "bravoYY corp", "a")
    ).toDF("id", "s", "blk")
    val n0 = StreamLinkage.linkBatch(e0, col("id"), col("s"), col("blk"), 0.95, store, 0L, acc)
    assert(n0 == 5)
    assert(accepted(1L)._1 == 1L && accepted(2L)._1 == 1L, s"1,2 must share entity 1: $accepted")
    assert(accepted(3L)._1 == 3L && accepted(4L)._1 == 4L && accepted(5L)._1 == 5L)
    assert(accepted.values.forall(!_._2), "epoch 0 had an empty store: nothing matches it")

    // epoch 1: 10 attaches to entity 1; 11+12 form a NEW entity 11;
    // 13 = "bravoXY corp" bridges stored entities 4 and 5 (one
    // substitution to each: jw 0.9667 ≥ 0.95) → entity = min(4,5) = 4,
    // flagged with 2 matched entities
    accepted.clear()
    val e1 = Seq(
      (10L, "alphaXX corp!", "a"),
      (11L, "gamma inc", "g"),
      (12L, "gamma inc.", "g"),
      (13L, "bravoXY corp", "a")
    ).toDF("id", "s", "blk")
    val n1 = StreamLinkage.linkBatch(e1, col("id"), col("s"), col("blk"), 0.95, store, 1L, acc)
    assert(n1 == 4)
    assert(accepted(10L) == ((1L, true, 1L)), s"10 must attach to entity 1: $accepted")
    assert(accepted(11L) == ((11L, false, 0L)) && accepted(12L) == ((11L, false, 0L)))
    assert(accepted(13L)._1 == 4L && accepted(13L)._2, s"13 must take min entity: $accepted")
    assert(accepted(13L)._3 == 2L, s"13 must flag the 2-entity merge observation: $accepted")

    // replay epoch 1 (crash-after-store): identical assignments re-derive
    val before = accepted.toMap
    accepted.clear()
    val n1r = StreamLinkage.linkBatch(e1, col("id"), col("s"), col("blk"), 0.95, store, 1L, acc)
    assert(n1r == 4 && accepted.toMap == before, s"replay diverged: $accepted vs $before")
  }

  test("StreamLinkage: string ids — epoch-0 fallback schema follows the batch id type") {
    import spark.implicits._
    import graft.streaming.StreamLinkage
    val store = java.nio.file.Files.createTempDirectory("graft-link-store-str").toString + "/keys"
    val accepted = scala.collection.mutable.Map.empty[String, (String, Boolean)]
    val acc: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, _) =>
      df.collect().foreach { r =>
        accepted(r.getAs[String]("id")) =
          ((r.getAs[String]("entity"), r.getAs[Boolean]("matched_store")))
      }
    // epoch 0 exercises the empty-store fallback: before the fix, the
    // hardcoded LongType store schema coerced/broke string ids here
    val e0 = Seq(
      ("doc-1", "alphaXX corp", "a"),
      ("doc-2", "alphaXX corp.", "a"),
      ("doc-3", "beta llc", "b")
    ).toDF("id", "s", "blk")
    val n0 = StreamLinkage.linkBatch(e0, col("id"), col("s"), col("blk"), 0.95, store, 0L, acc)
    assert(n0 == 3)
    assert(accepted("doc-1")._1 == "doc-1" && accepted("doc-2")._1 == "doc-1")
    assert(accepted("doc-3")._1 == "doc-3")
    // epoch 1 reads the epoch-0 parquet store back: schemas must agree
    accepted.clear()
    val e1 = Seq(("doc-9", "alphaXX corp!", "a")).toDF("id", "s", "blk")
    val n1 = StreamLinkage.linkBatch(e1, col("id"), col("s"), col("blk"), 0.95, store, 1L, acc)
    assert(n1 == 1)
    assert(accepted("doc-9") == (("doc-1", true)), s"string id must attach to stored entity: $accepted")
  }

  test("StreamMediaDedup: cross-batch perceptual gate — twins collapse, replay idempotent") {
    import graft.operators.Multimodal
    val store = java.nio.file.Files.createTempDirectory("graft-media-fp").toString + "/fps"
    def media(rows: (Long, Array[Byte])*) =
      rows.map { case (id, c) => Multimodal.MediaRow(id, "image", c) }.toDS()
    // same pixel plane in two containers: identical aHash (the x167
    // lossless contract) — the re-encoded-copy regime
    val imgA = Multimodal.syntheticImage(1L, 32, 24, "png")
    val imgAbmp = Multimodal.syntheticImage(1L, 32, 24, "bmp")
    val imgC = Multimodal.syntheticImage(9L, 32, 24, "png")
    var got = Map.empty[Long, Set[Long]]
    def acc(df: org.apache.spark.sql.DataFrame, ep: Long): Unit =
      got += ep -> df.select(col("id")).collect().map(_.getLong(0)).toSet
    // epoch 0: A + its BMP twin → smaller id survives the within-batch gate
    val n0 = graft.streaming.StreamMediaDedup
      .dedupFpBatch(Multimodal.aHash(media(10L -> imgA, 11L -> imgAbmp)), store, 0L, acc)
    assert(n0 == 1 && got(0L) == Set(10L), s"epoch 0: $got")
    // epoch 1: A re-ingested (re-encoded) + fresh C → only C survives
    val n1 = graft.streaming.StreamMediaDedup
      .dedupFpBatch(Multimodal.aHash(media(20L -> imgAbmp, 21L -> imgC)), store, 1L, acc)
    assert(n1 == 1 && got(1L) == Set(21L), s"epoch 1: $got")
    // replayed epoch 1: the store excludes its own first attempt, so the
    // same survivors re-derive (at-least-once accept, exactly-once store)
    val n1b = graft.streaming.StreamMediaDedup
      .dedupFpBatch(Multimodal.aHash(media(20L -> imgAbmp, 21L -> imgC)), store, 1L, acc)
    assert(n1b == 1 && got(1L) == Set(21L), s"epoch 1 replay: $got")
    // audio fingerprints ride the same gate: an amplitude-doubled clip
    // of an accepted clip is dropped cross-batch
    val base = Array.tabulate(300)(i => (Multimodal.syntheticSample(7L, i) >> 2).toShort)
    val a0 = graft.streaming.StreamMediaDedup.dedupFpBatch(
      Multimodal.audioFingerprints(
        media(30L -> Multimodal.wavFromSamples(base))), store, 2L, acc)
    assert(a0 == 1 && got(2L) == Set(30L))
    val a1 = graft.streaming.StreamMediaDedup.dedupFpBatch(
      Multimodal.audioFingerprints(
        media(31L -> Multimodal.wavFromSamples(base.map(x => (x * 2).toShort)))), store, 3L, acc)
    assert(a1 == 0 && got(3L) == Set.empty[Long], s"scaled clip must drop: $got")
  }

  test("StreamMediaDedup.typedDedupBatch: typed catalog mirror — kind gates, digest gate, replay idempotent") {
    import graft.operators.Multimodal
    val store = java.nio.file.Files.createTempDirectory("graft-typed-fp").toString + "/fps"
    def media(rows: (Long, Array[Byte])*) =
      rows.map { case (id, c) => Multimodal.MediaRow(id, "blob", c) }.toDS()
    var got = Map.empty[Long, Map[Long, (String, Long)]]
    def acc(df: org.apache.spark.sql.DataFrame, ep: Long): Unit =
      got += ep -> df
        .select(col("doc_id"), col("kind"), col("n_samples"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
    val samples = Array.tabulate(400)(i => (Multimodal.syntheticSample(4L, i) >> 2).toShort)
    val mp3 = Multimodal.syntheticMp3(11L, 6, 44100)
    // epoch 0: one of each kind + a within-batch image twin — survivors
    // carry the FULL typed catalog columns (the x187 row shape)
    val n0 = graft.streaming.StreamMediaDedup.typedDedupBatch(
      media(
        10L -> Multimodal.syntheticImage(1L, 24, 20, "png"),
        11L -> Multimodal.syntheticImage(1L, 24, 20, "bmp"), // twin: drops within-batch
        20L -> Multimodal.wavFromSamples(samples, 16000),
        30L -> Multimodal.syntheticGif(2L, 24, 20, 4),
        40L -> mp3 // fingerprint-less: typed audio, digest-gated
      ),
      store, 0L, acc)
    assert(n0 == 4, s"epoch 0 survivors: $got")
    assert(got(0L).keySet == Set(10L, 20L, 30L, 40L), s"epoch 0: $got")
    assert(got(0L)(20L) == (("audio", 400L)), s"typed columns must ride accept: $got")
    assert(got(0L)(40L) == (("audio", 6 * 1152L)), s"MP3 typed via structure: $got")
    assert(got(0L)(30L)._1 == "video", s"epoch 0: $got")
    // epoch 1: re-ingests — image re-encoded (bmp), video re-containered
    // (y4m), audio re-gained, the SAME mp3 bytes (digest hit), plus one
    // fresh image: only the fresh image survives
    val n1 = graft.streaming.StreamMediaDedup.typedDedupBatch(
      media(
        50L -> Multimodal.syntheticImage(1L, 24, 20, "bmp"),
        51L -> Multimodal.wavFromSamples(samples.map(x => (x * 2).toShort), 16000),
        52L -> Multimodal.syntheticY4m(2L, 24, 20, 4),
        53L -> mp3.clone(),
        60L -> Multimodal.syntheticImage(77L, 24, 20, "png")
      ),
      store, 1L, acc)
    assert(n1 == 1 && got(1L).keySet == Set(60L), s"epoch 1: $got")
    // replayed epoch 1: store excludes its own first attempt → same result
    val n1b = graft.streaming.StreamMediaDedup.typedDedupBatch(
      media(
        50L -> Multimodal.syntheticImage(1L, 24, 20, "bmp"),
        51L -> Multimodal.wavFromSamples(samples.map(x => (x * 2).toShort), 16000),
        52L -> Multimodal.syntheticY4m(2L, 24, 20, 4),
        53L -> mp3.clone(),
        60L -> Multimodal.syntheticImage(77L, 24, 20, "png")
      ),
      store, 1L, acc)
    assert(n1b == 1 && got(1L).keySet == Set(60L), s"epoch 1 replay: $got")
    // a NEAR-identical mp3 (different payload bytes, same structure) is
    // NOT digest-dropped — fingerprint-less rows dedupe on byte identity only
    val n2 = graft.streaming.StreamMediaDedup.typedDedupBatch(
      media(70L -> Multimodal.syntheticMp3(12L, 6, 44100)), store, 2L, acc)
    assert(n2 == 1 && got(2L).keySet == Set(70L), s"epoch 2: $got")
  }
}
