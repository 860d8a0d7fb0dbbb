package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import java.sql.Timestamp
import java.time.Duration

import graft.streaming.StreamTws
import graft.streaming.StreamTws.{FpRow, SessionEvent}

/** Pins [[graft.streaming.StreamTws]] — the `transformWithState` /
  * StatefulProcessor formulations of cross-batch dedup and gap
  * sessionization:
  *
  *   - first-seen dedup drops re-ingests across micro-batches and keeps
  *     the smallest id within the arrival batch (the batch operators'
  *     deterministic keep rule);
  *   - native state TTL re-admits a digest once the store has evicted it
  *     (the sliding-horizon mode);
  *   - sessionization closes a session from an event-time TIMER when the
  *     watermark passes lastEvent + gap, emitting exactly one row with
  *     exact (n, start, end) and the bounded sample list;
  *   - `transformWithState` REQUIRES the RocksDB provider (multiple
  *     column families) — the HDFS-backed store refuses it, which is the
  *     deployment constraint the module scaladoc documents.
  */
class TwsStateSpec extends SparkTestBase {

  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  // Spark 4.1's checkpoint-file checksum writer (ChecksumCheckpointFileManager)
  // DEADLOCKS under transformWithState + TTL on local[4]: the TTL secondary
  // column families multiply the RocksDB zip uploads per commit, every task
  // parks in ChecksumCancellableFSDataOutputStream.close awaiting a checksum
  // future that never runs, and the batch never finishes (thread-dump
  // verified). Checksums are a corruption-detection aid, not a semantics
  // knob — disabled for these queries only.
  private val ChecksumKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"

  /** Run a StreamTws query under the RocksDB provider: `feeds` are
    * applied one micro-batch at a time (processAllAvailable between
    * adds), then the memory-sink rows are returned.
    */
  private def runRocks[T](
      df: org.apache.spark.sql.Dataset[T],
      name: String
  )(feeds: Seq[() => Unit]): Seq[org.apache.spark.sql.Row] = {
    val prev = spark.conf.getOption(ProviderKey)
    val prevCk = spark.conf.getOption(ChecksumKey)
    spark.conf.set(ProviderKey, RocksDb)
    spark.conf.set(ChecksumKey, "false")
    try {
      val q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        feeds.foreach { f => f(); q.processAllAvailable() }
        val rocks = q.recentProgress.toSeq
          .flatMap(_.stateOperators.toSeq)
          .exists(_.customMetrics.keySet.toArray.exists(_.toString.toLowerCase.contains("rocksdb")))
        assert(rocks, s"$name: RocksDB provider produced no rocksdb metrics — not engaged")
        spark.table(name).collect().toSeq
      } finally q.stop()
    } finally {
      spark.conf.unset(ProviderKey)
      prev.foreach(spark.conf.set(ProviderKey, _))
      spark.conf.unset(ChecksumKey)
      prevCk.foreach(spark.conf.set(ChecksumKey, _))
    }
  }

  test("firstSeen: cross-batch drop, smallest id kept within the arrival batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FpRow]
    val out = StreamTws.firstSeen(input.toDS())
    val rows = runRocks(out, "tws_firstseen")(
      Seq(
        // fpA arrives twice in one batch — a0 (smallest id) must win;
        // iterator order inside the batch is partition-dependent, the rule is not
        () => input.addData(FpRow("a1", "fpA"), FpRow("a0", "fpA"), FpRow("b1", "fpB")),
        // fpA re-ingested NEXT batch — dropped by the ValueState check; fpC is new
        () => input.addData(FpRow("a2", "fpA"), FpRow("c1", "fpC")),
        // third batch: everything seen — nothing emitted
        () => input.addData(FpRow("a3", "fpA"), FpRow("b2", "fpB"), FpRow("c2", "fpC"))
      )
    )
    val got = rows.map(r => (r.getString(0), r.getString(1))).sorted
    assert(got == Seq(("a0", "fpA"), ("b1", "fpB"), ("c1", "fpC")), s"got $got")
  }

  test("firstSeen TTL: an evicted digest is re-admitted, a live one is not") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FpRow]
    // 3 s TTL: generous against clock skew but short enough to test eviction
    val out = StreamTws.firstSeen(input.toDS(), ttl = Some(Duration.ofSeconds(3)))
    // ProcessingTime mode makes shouldRunAnotherBatch ALWAYS true (the
    // clock advances every trigger), so the engine runs maintenance
    // micro-batches back-to-back forever: processAllAvailable never
    // observes a quiet stream and even Trigger.AvailableNow never reaches
    // its stop condition (both verified empirically — they hang). The
    // only terminating formulation is a continuous query polled on SINK
    // CONTENT, with TTL margins wide enough (3 s TTL, 10 s eviction
    // wait) that scheduling jitter cannot flip an assertion.
    val prev = spark.conf.getOption(ProviderKey)
    val prevCk = spark.conf.getOption(ChecksumKey)
    spark.conf.set(ProviderKey, RocksDb)
    spark.conf.set(ChecksumKey, "false")
    try {
      val q = out.writeStream
        .format("memory")
        .queryName("tws_ttl")
        .outputMode("append")
        .start()
      try {
        def rows(): Seq[(String, String)] =
          spark.table("tws_ttl").collect().toSeq.map(r => (r.getString(0), r.getString(1))).sorted
        def pollUntil(want: Seq[(String, String)], what: String): Unit = {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (rows() != want && System.nanoTime() < deadline) Thread.sleep(100)
          assert(rows() == want, s"$what: got ${rows()}")
        }
        input.addData(FpRow("a0", "fpA"), FpRow("b0", "fpB"))
        pollUntil(Seq(("a0", "fpA"), ("b0", "fpB")), "first batch")
        // re-sent well inside the 3 s TTL: state is live, dropped (the
        // busy-loop processes it in ms; the later assertions prove it
        // was consumed and not emitted)
        input.addData(FpRow("a1", "fpA"))
        // 10 s ≈ 3× TTL: the value has expired — re-admitted as first-seen
        Thread.sleep(10000)
        input.addData(FpRow("a2", "fpA"))
        pollUntil(
          Seq(("a0", "fpA"), ("a2", "fpA"), ("b0", "fpB")),
          "expired digest must be re-admitted and the live-TTL duplicate dropped"
        )
      } finally q.stop()
    } finally {
      spark.conf.unset(ProviderKey)
      prev.foreach(spark.conf.set(ProviderKey, _))
      spark.conf.unset(ChecksumKey)
      prevCk.foreach(spark.conf.set(ChecksumKey, _))
    }
  }

  test("sessionize: timer closes the session once the watermark passes last event + gap") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(sec: Long) = new Timestamp(base + sec * 1000)
    val input = MemoryStream[SessionEvent]
    // gap 5 s, watermark delay 10 s, keep at most 2 sample ids
    val out = StreamTws.sessionize(input.toDS(), Duration.ofSeconds(5), "10 seconds", maxSamples = 2)
    val rows = runRocks(out, "tws_session")(
      Seq(
        // k1's session: 3 events spanning [0 s, 2 s]; only 2 sample ids retained
        () =>
          input.addData(
            SessionEvent("k1", "e1", ts(0)),
            SessionEvent("k1", "e2", ts(1)),
            SessionEvent("k1", "e3", ts(2))
          ),
        // k2 far in the future advances the watermark to 90 s > 2 s + 5 s gap
        () => input.addData(SessionEvent("k2", "f1", ts(100))),
        // one more batch so the advanced watermark is applied to timers
        () => input.addData(SessionEvent("k2", "f2", ts(101)))
      )
    )
    val k1 = rows.filter(_.getString(0) == "k1")
    assert(k1.size == 1, s"expected exactly one closed k1 session, got $rows")
    val r = k1.head
    assert(r.getLong(1) == 3L, s"n: $r")
    assert(r.getTimestamp(2) == ts(0) && r.getTimestamp(3) == ts(2), s"span: $r")
    val samples = r.getSeq[String](4).sorted
    assert(samples.size == 2 && samples.forall(Set("e1", "e2", "e3")), s"samples: $samples")
    // k2's session never closed: no timer has expired for it
    assert(!rows.exists(_.getString(0) == "k2"), s"k2 must still be open: $rows")
  }

  test("sessionize == batch session_window: randomized twin, chunked feed AND one-batch backfill") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val gapMs = 5000L
    val rnd = new scala.util.Random(42)
    // 5 keys × ~24 events over 120 s: gaps both within and across batches
    val events = (0 until 120).map { i =>
      StreamTws.SessionEvent(
        s"k${rnd.nextInt(5)}",
        f"e$i%03d",
        new Timestamp(base + rnd.nextInt(120) * 1000L + rnd.nextInt(1000))
      )
    }
    // expected sessions, computed independently in plain Scala with the
    // half-open rule (an event at exactly hi + gap starts a NEW session)
    def expected: Set[(String, Long, Long, Long)] =
      events
        .groupBy(_.key)
        .flatMap { case (k, es) =>
          val ts = es.map(_.ts.getTime).sorted
          val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          ts.foreach { t =>
            if (sessions.nonEmpty && t < sessions.last._3 + gapMs) {
              val (n, lo, _) = sessions.remove(sessions.length - 1)
              sessions += ((n + 1, lo, t))
            } else sessions += ((1L, t, t))
          }
          sessions.map { case (n, lo, hi) => (k, n, lo, hi) }
        }
        .toSet
    // ... and the BATCH session_window plan agrees with that rule
    val batch = spark
      .createDataFrame(events)
      .groupBy(col("key"), org.apache.spark.sql.functions.session_window(col("ts"), "5 seconds"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map { r =>
        val w = r.getStruct(1)
        (r.getString(0), r.getLong(2), w.getTimestamp(0).getTime, w.getTimestamp(1).getTime - gapMs)
      }
      .toSet
    assert(batch == expected, "batch session_window disagrees with the plain-Scala rule")

    def run(feedChunks: Seq[Seq[StreamTws.SessionEvent]], name: String): Set[(String, Long, Long, Long)] = {
      val input = MemoryStream[SessionEvent]
      val out = StreamTws.sessionize(input.toDS(), Duration.ofMillis(gapMs), "5 seconds", maxSamples = 4)
      val far1 = StreamTws.SessionEvent("zz", "s1", new Timestamp(base + 10000 * 1000L))
      val far2 = StreamTws.SessionEvent("zz", "s2", new Timestamp(base + 10001 * 1000L))
      val rows = runRocks(out, name)(
        feedChunks.map(chunk => () => { input.addData(chunk: _*); () }) ++
          // two sentinel batches: the first advances the watermark past every
          // real close time, the second lets the timers fire under it
          Seq(() => input.addData(far1), () => input.addData(far2))
      )
      rows
        .filter(_.getString(0) != "zz")
        .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2).getTime, r.getTimestamp(3).getTime))
        .toSet
    }
    // chunked in-order feed: watermark advances between batches
    val sorted = events.sortBy(_.ts.getTime)
    assert(run(sorted.grouped(15).toSeq, "tws_twin_chunked") == expected, "chunked feed diverged")
    // ONE-batch backfill: within-batch gap-splitting must produce the
    // same sessions, not one fused monster per key
    assert(run(Seq(sorted), "tws_twin_backfill") == expected, "backfill feed diverged")
  }

  test("distinctPerKey (MapState): final counts equal batch countDistinct") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val all = (0 until 300).map(i => StreamTws.KeyedFp(s"d${rnd.nextInt(4)}", s"fp${rnd.nextInt(40)}"))
    val input = MemoryStream[StreamTws.KeyedFp]
    val out = StreamTws.distinctPerKey(input.toDS())
    val prev = spark.conf.getOption(ProviderKey)
    val prevCk = spark.conf.getOption(ChecksumKey)
    spark.conf.set(ProviderKey, RocksDb)
    spark.conf.set(ChecksumKey, "false")
    try {
      val q = out.writeStream.format("memory").queryName("tws_distinct").outputMode("update").start()
      try {
        all.grouped(100).foreach { chunk => input.addData(chunk: _*); q.processAllAvailable() }
        // counts are monotone per key: the max over emitted rows is the final
        val got = spark
          .table("tws_distinct")
          .collect()
          .map(r => (r.getString(0), r.getLong(1)))
          .groupBy(_._1)
          .view
          .mapValues(_.map(_._2).max)
          .toMap
        val want = all.groupBy(_.key).view.mapValues(_.map(_.fp).distinct.size.toLong).toMap
        assert(got == want, s"got $got want $want")
      } finally q.stop()
    } finally {
      spark.conf.unset(ProviderKey)
      prev.foreach(spark.conf.set(ProviderKey, _))
      spark.conf.unset(ChecksumKey)
      prevCk.foreach(spark.conf.set(ChecksumKey, _))
    }
  }

  test("transformWithState refuses the HDFS-backed provider (needs column families)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.unset(ProviderKey) // engine default = HDFSBackedStateStoreProvider
    try {
      val input = MemoryStream[FpRow]
      val out = StreamTws.firstSeen(input.toDS())
      val q = out.writeStream.format("memory").queryName("tws_hdfs").outputMode("append").start()
      try {
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          input.addData(FpRow("a0", "fpA"))
          q.processAllAvailable()
        }
        val msg = (ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")).toLowerCase
        assert(
          msg.contains("column famil") || msg.contains("rocksdb"),
          s"unexpected failure mode: $msg"
        )
      } finally q.stop()
    } finally {
      prev.foreach(spark.conf.set(ProviderKey, _))
    }
  }
}
