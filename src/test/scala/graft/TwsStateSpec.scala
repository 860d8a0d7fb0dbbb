package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

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
