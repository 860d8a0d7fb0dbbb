package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Column, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, max, struct}
import org.apache.spark.sql.streaming._

/** Spark-4-native custom state: the `transformWithState` /
  * [[StatefulProcessor]] formulations of the engine's cross-batch
  * patterns. The older `mapGroupsWithState` shapes (StreamRuntime,
  * RocksDbStateSpec) stay — this module is the forward path Spark 4.x
  * ships for arbitrary stateful processing, and it buys three things the
  * old API cannot express:
  *
  *   - **typed state variables** ([[ValueState]]/[[ListState]]/
  *     [[MapState]]) stored in separate RocksDB column families instead
  *     of one opaque blob per key — large state updates touch only the
  *     variable that changed;
  *   - **native state TTL** ([[TTLConfig]]) — per-variable eviction
  *     enforced by the store itself, the hygiene mechanism for
  *     unbounded key domains (URL digests, session keys) that the
  *     parquet-store mirrors ([[StreamDedup]]) implement manually with
  *     epoch partitions;
  *   - **first-class timers** — per-key event-time/processing-time
  *     callbacks, replacing the timeout-sentinel dance of
  *     `GroupStateTimeout`.
  *
  * `transformWithState` REQUIRES the RocksDB state store provider
  * (multiple column families; the HDFS-backed provider cannot host it —
  * pinned by `TwsStateSpec`), which is also the provider a 1000-executor
  * deployment runs stateful queries on: state lives off-heap/on-disk per
  * partition, keys hash-distribute across executors, and nothing below
  * collects or broadcasts corpus data.
  *
  * DEPLOYMENT HAZARD (thread-dump verified on Spark 4.1.2): the
  * checkpoint-file checksum writer
  * (`spark.sql.streaming.checkpoint.fileChecksum.enabled`, default on)
  * can DEADLOCK a TTL'd `transformWithState` commit — the TTL secondary
  * column families multiply the RocksDB zip uploads, and every task
  * parks in `ChecksumCancellableFSDataOutputStream.close` awaiting a
  * checksum future that never runs. Set the flag to `false` on queries
  * using [[firstSeen]] with a TTL until the upstream fix lands
  * (`TwsStateSpec` runs that way).
  *
  * Reference parity: the C++ service keeps per-connection framing state
  * and windowed throughput counters (`handler.hpp`, `stats.hpp`) — the
  * single-process analog of keyed state. These operators are that
  * pattern at cluster scale, on the LLM-pipeline surface (SURVEY
  * §2.5.9/§2.5.10).
  */
object StreamTws {

  /** `(id, fp)` — one content fingerprint per document (the
    * [[graft.operators.Dedup.exact]] digest contract).
    */
  final case class FpRow(id: String, fp: String)

  /** One keyed event for sessionization: `key` groups (user, connection,
    * document source …), `ts` is event time, `id` tags the event.
    */
  final case class SessionEvent(key: String, id: String, ts: java.sql.Timestamp)

  /** A closed session: `n` events spanning [`start`, `end`], with up to
    * `maxSamples` event ids retained for audit.
    */
  final case class SessionOut(
      key: String,
      n: Long,
      start: java.sql.Timestamp,
      end: java.sql.Timestamp,
      sampleIds: Seq[String]
  )

  /** Cross-batch FIRST-SEEN exact dedup as a [[StatefulProcessor]]: key
    * the stream by digest; the first micro-batch containing a digest
    * emits that digest's smallest-id row (the batch operators'
    * deterministic keep rule), every later occurrence is dropped by a
    * [[ValueState]] membership check — 8 bytes of state per accepted
    * digest, in its own RocksDB column family.
    *
    * With `ttl` set the store forgets a digest `ttl` after its FIRST
    * ACCEPTANCE (processing time): duplicate sightings hit the
    * membership check without writing state, so they do NOT slide the
    * eviction horizon — a digest that keeps re-arriving is re-admitted
    * (and re-emitted) once per ttl window, and state size is bounded by
    * the accept rate × ttl instead of corpus lifetime — the knob the
    * parquet-store mirror lacks.
    */
  private[streaming] final class FirstSeenProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, FpRow, FpRow] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)

    override def handleInputRows(
        key: String,
        rows: Iterator[FpRow],
        timerValues: TimerValues
    ): Iterator[FpRow] = StreamTws.firstSeenHandle(seen, rows, timerValues)
  }

  /** [[FirstSeenProcessor]] with BATCH→STREAM STATE BOOTSTRAP
    * ([[StatefulProcessorWithInitialState]]): identical per-batch
    * semantics, but on the FIRST micro-batch of a fresh checkpoint the
    * engine hands every initial-state digest to [[handleInitialState]],
    * which marks it seen — so a streaming query taking over a corpus
    * accumulated by the parquet-store mirror ([[StreamDedup]]) resumes
    * from that history instead of re-accepting it. The handoff runs
    * exactly once per checkpoint lifetime; restarts recover the marks
    * from the state store like any other state.
    */
  private[streaming] final class FirstSeenSeededProcessor(ttl: TTLConfig)
      extends StatefulProcessorWithInitialState[String, FpRow, FpRow, String] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)

    override def handleInitialState(
        key: String,
        initialState: String,
        timerValues: TimerValues
    ): Unit =
      seen.update(timerValues.getCurrentProcessingTimeInMs())

    override def handleInputRows(
        key: String,
        rows: Iterator[FpRow],
        timerValues: TimerValues
    ): Iterator[FpRow] = StreamTws.firstSeenHandle(seen, rows, timerValues)
  }

  /** Shared first-seen batch rule of [[FirstSeenProcessor]] /
    * [[FirstSeenSeededProcessor]]: drop if the digest is marked, else
    * emit the smallest-id row of the arriving batch and mark it.
    */
  private def firstSeenHandle(
      seen: ValueState[Long],
      rows: Iterator[FpRow],
      timerValues: TimerValues
  ): Iterator[FpRow] =
    if (seen.exists()) {
      Iterator.empty
    } else {
      // smallest id wins within the arriving batch — iterator order is
      // partition-dependent, the min is not
      var best: FpRow = null
      rows.foreach { r => if (best == null || r.id < best.id) best = r }
      if (best == null) Iterator.empty
      else {
        seen.update(timerValues.getCurrentProcessingTimeInMs())
        Iterator.single(best)
      }
    }

  /** One OPEN session in [[SessionizeProcessor]] state: `n` events over
    * `[lo, hi]` millis with up to maxSamples retained ids.
    */
  private[streaming] final case class OpenSess(n: Long, lo: Long, hi: Long, samples: Seq[String])

  /** Event-time SESSIONIZATION with native timers and the built-in
    * `session_window` MERGE SEMANTICS (half-open: an event at exactly
    * `hi + gap` starts a NEW session): per key the state is a
    * [[ListState]] of OPEN sessions; each arriving batch interval-merges
    * its events into that list — gap-splitting WITHIN the batch too, so
    * a historical backfill replayed in big micro-batches produces the
    * same sessions the live feed would, not one fused monster session —
    * and re-arms one event-time timer at the EARLIEST open close time
    * (`min(hi) + gap`). When the watermark passes it,
    * [[handleExpiredTimer]] emits every session whose close time has
    * been reached and re-arms for the rest. Events later than the
    * watermark are dropped upstream by `withWatermark`, identically to
    * the built-in `session_window` (q21); `TwsStateSpec` pins a
    * randomized equivalence against the batch `session_window` plan.
    *
    * Scale: open sessions per key are few (bounded by disorder within
    * the watermark delay, not by history) and only TOUCHED keys rewrite
    * their list — state stays O(open sessions), never O(events).
    */
  private[streaming] final class SessionizeProcessor(gapMs: Long, maxSamples: Int)
      extends StatefulProcessor[String, SessionEvent, SessionOut] {
    @transient private var open: ListState[OpenSess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[OpenSess]("open", Encoders.product[OpenSess], TTLConfig.NONE)

    /** Sweep-merge sessions sorted by `lo`: adjacent sessions fuse when
      * `next.lo < cur.hi + gap` (the half-open `session_window` rule).
      */
    private def merged(all: Seq[OpenSess]): Seq[OpenSess] = {
      val sorted = all.sortBy(s => (s.lo, s.hi))
      val out = scala.collection.mutable.ArrayBuffer.empty[OpenSess]
      sorted.foreach { s =>
        if (out.nonEmpty && s.lo < out.last.hi + gapMs) {
          val c = out.remove(out.length - 1)
          out += OpenSess(
            c.n + s.n,
            math.min(c.lo, s.lo),
            math.max(c.hi, s.hi),
            (c.samples ++ s.samples).take(maxSamples)
          )
        } else out += s
      }
      out.toSeq
    }

    private def rearm(sessions: Seq[OpenSess]): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (sessions.nonEmpty) getHandle.registerTimer(sessions.map(_.hi).min + gapMs)
    }

    /** Interval-merge `arrived` into the open-session list and re-arm the
      * earliest close timer — the shared write path of event batches and
      * [[SessionizeSeededProcessor]] bootstrap seeds.
      */
    private[streaming] def mergeIn(arrived: Seq[OpenSess]): Unit =
      if (arrived.nonEmpty) {
        val all = merged(open.get().toSeq ++ arrived)
        open.clear()
        all.foreach(open.appendValue)
        rearm(all)
      }

    override def handleInputRows(
        key: String,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues
    ): Iterator[SessionOut] = {
      mergeIn(rows.map { e =>
        val t = e.ts.getTime
        OpenSess(1L, t, t, Seq(e.id))
      }.toSeq)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[SessionOut] = {
      // the timer fired, so watermark >= its expiry; close by the CURRENT
      // watermark (not just the expiry) so one firing drains every
      // already-due session instead of leaking later close times into
      // later batches one timer at a time
      val due =
        math.max(expiredTimerInfo.getExpiryTimeInMs(), timerValues.getCurrentWatermarkInMs())
      val (closed, still) = open.get().toSeq.partition(_.hi + gapMs <= due)
      open.clear()
      still.foreach(open.appendValue)
      rearm(still)
      closed.sortBy(_.lo).iterator.map { s =>
        SessionOut(key, s.n, new java.sql.Timestamp(s.lo), new java.sql.Timestamp(s.hi), s.samples)
      }
    }
  }

  /** [[SessionizeProcessor]] with BATCH→STREAM STATE BOOTSTRAP: initial
    * state rows are OPEN sessions in the [[SessionOut]] schema (what a
    * batch sessionization pass or a drained prior deployment emits for
    * its still-open tails). Each seed interval-merges into the key's
    * open-session list exactly as an arriving event batch would —
    * overlapping seeds fuse under the same half-open gap rule — and
    * re-arms the earliest close timer, so a seeded key with NO further
    * traffic still closes and emits once the watermark advances. The
    * engine hands seeds over once per fresh checkpoint
    * ([[FirstSeenSeededProcessor]]'s contract), one
    * [[handleInitialState]] call per seed row (multi-row keys allowed).
    */
  private[streaming] final class SessionizeSeededProcessor(gapMs: Long, maxSamples: Int)
      extends StatefulProcessorWithInitialState[String, SessionEvent, SessionOut, SessionOut] {
    private val inner = new SessionizeProcessor(gapMs, maxSamples)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      inner.setHandle(getHandle)
      inner.init(outputMode, timeMode)
    }

    override def handleInitialState(
        key: String,
        initialState: SessionOut,
        timerValues: TimerValues
    ): Unit =
      inner.mergeIn(
        Seq(
          OpenSess(
            initialState.n,
            initialState.start.getTime,
            initialState.end.getTime,
            initialState.sampleIds.take(maxSamples)
          )
        )
      )

    override def handleInputRows(
        key: String,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues
    ): Iterator[SessionOut] = inner.handleInputRows(key, rows, timerValues)

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[SessionOut] = inner.handleExpiredTimer(key, timerValues, expiredTimerInfo)
  }

  /** `(key, fp)` for per-key distinct counting. */
  final case class KeyedFp(key: String, fp: String)

  /** Running distinct count for one key. */
  final case class KeyCount(key: String, distinct: Long)

  /** Per-key DISTINCT COUNT as a [[MapState]] processor (the third typed
    * state variable, alongside [[FirstSeenProcessor]]'s ValueState and
    * [[SessionizeProcessor]]'s ListState): membership lives in a map
    * column family keyed by fp, so each arriving fp costs one POINT
    * lookup + at most one point write — the key's full membership set is
    * never deserialized, which is what makes a 1e9-distinct key viable
    * where a ValueState[Set] would rewrite the whole blob per batch.
    * Emits the updated running count per touched key per batch
    * (Update-mode sink semantics; monotone per key).
    *
    * With `ttl` set, each map ENTRY evicts `ttl` after its write
    * (processing time) — the same unbounded-key-domain hygiene
    * [[FirstSeenProcessor]] has, per fp within each key. `distinct` then
    * counts horizon-first sightings cumulatively: an fp whose entry has
    * been evicted counts AGAIN on its next arrival (still monotone per
    * key — it is an admission counter, not the live map size).
    */
  private[streaming] final class DistinctPerKeyProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedFp, KeyCount] {
    @transient private var seen: MapState[String, Boolean] = _
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle
        .getMapState[String, Boolean]("seen", Encoders.STRING, Encoders.scalaBoolean, ttl)
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[KeyedFp],
        timerValues: TimerValues
    ): Iterator[KeyCount] = {
      var c = if (n.exists()) n.get() else 0L
      rows.foreach { r =>
        if (!seen.containsKey(r.fp)) {
          seen.updateValue(r.fp, true)
          c += 1
        }
      }
      n.update(c)
      Iterator.single(KeyCount(key, c))
    }
  }

  /** [[DistinctPerKeyProcessor]] with BATCH→STREAM STATE BOOTSTRAP:
    * initial state rows are the (key, fp) membership pairs accumulated
    * by a batch `countDistinct` corpus (one [[handleInitialState]] call
    * per pair — multi-row keys are the normal case here). Each seed
    * marks membership AND counts toward the key's admission counter, so
    * the first post-migration emission for a key continues its batch
    * count instead of restarting from zero.
    */
  private[streaming] final class DistinctPerKeySeededProcessor(ttl: TTLConfig)
      extends StatefulProcessorWithInitialState[String, KeyedFp, KeyCount, KeyedFp] {
    @transient private var seen: MapState[String, Boolean] = _
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle
        .getMapState[String, Boolean]("seen", Encoders.STRING, Encoders.scalaBoolean, ttl)
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInitialState(
        key: String,
        initialState: KeyedFp,
        timerValues: TimerValues
    ): Unit =
      if (!seen.containsKey(initialState.fp)) {
        seen.updateValue(initialState.fp, true)
        n.update((if (n.exists()) n.get() else 0L) + 1)
      }

    override def handleInputRows(
        key: String,
        rows: Iterator[KeyedFp],
        timerValues: TimerValues
    ): Iterator[KeyCount] = {
      var c = if (n.exists()) n.get() else 0L
      rows.foreach { r =>
        if (!seen.containsKey(r.fp)) {
          seen.updateValue(r.fp, true)
          c += 1
        }
      }
      n.update(c)
      Iterator.single(KeyCount(key, c))
    }
  }

  /** [[distinctPerKey]] with BATCH→STREAM STATE BOOTSTRAP: `seeds` are
    * the (key, fp) membership pairs of the corpus counted so far (what
    * `groupBy(key).agg(collect_set(fp))` — or the corpus itself,
    * projected to distinct pairs — holds). Post-migration counts
    * CONTINUE from the seeded membership: a seeded fp re-arriving does
    * not recount, a new fp increments from the batch total. Handoff
    * runs once per fresh checkpoint.
    */
  def distinctPerKeySeeded(
      rows: Dataset[KeyedFp],
      seeds: Dataset[KeyedFp],
      ttl: Option[Duration] = None
  ): Dataset[KeyCount] = {
    import rows.sparkSession.implicits._
    val (cfg, mode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    rows
      .groupByKey(_.key)
      .transformWithState(
        new DistinctPerKeySeededProcessor(cfg),
        mode,
        OutputMode.Update(),
        seeds.groupByKey(_.key)
      )
  }

  /** First-seen dedup over a stream of `(id, fp)` rows. `ttl = None`
    * remembers forever (TimeMode.None — no clock in the plan at all);
    * `ttl = Some(d)` bounds state to the last `d` of processing time.
    *
    * KNOWN ENGINE BEHAVIOR with the TTL'd form (Spark 4.1.2, verified):
    * ProcessingTime mode makes `shouldRunAnotherBatch` always true, so
    * the query runs maintenance micro-batches back-to-back even with no
    * data — `processAllAvailable` never observes a quiet stream and
    * `Trigger.AvailableNow` never reaches its stop condition. Use a
    * real periodic trigger (`Trigger.ProcessingTime(interval)`) in
    * deployment and judge progress by sink content, not by
    * quiesce-style APIs (`TwsStateSpec` pins the polled formulation).
    */
  def firstSeen(rows: Dataset[FpRow], ttl: Option[Duration] = None): Dataset[FpRow] = {
    import rows.sparkSession.implicits._
    val (cfg, mode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    rows
      .groupByKey(_.fp)
      .transformWithState(new FirstSeenProcessor(cfg), mode, OutputMode.Append())
  }

  /** [[firstSeen]] with BATCH→STREAM STATE BOOTSTRAP: every digest in
    * `seeds` is marked seen before the first micro-batch processes, so
    * the query RESUMES a corpus instead of restarting it — re-ingests of
    * already-accepted documents drop from batch one, row-identical to
    * what the parquet-store mirror ([[StreamDedup]]) would decide
    * (TwsStateSpec pins the accept/drop parity on planted re-ingests).
    * Feed `seeds` from [[digestSeeds]] to migrate a [[StreamDedup]]
    * store into native typed state.
    *
    * Seeding semantics: the engine applies initial state ONCE, on the
    * first micro-batch of a FRESH checkpoint (restarts recover it from
    * the store like any accepted digest); seeds are distinct-ed here
    * because the handoff rejects duplicate grouping keys. Scale shape:
    * the only extra exchange is one distinct + hash-partition over the
    * DIGEST strings (32 bytes each, the corpus's accepted-set size — the
    * same mass the digest store itself holds), paid once at query start.
    */
  def firstSeenSeeded(
      rows: Dataset[FpRow],
      seeds: Dataset[String],
      ttl: Option[Duration] = None
  ): Dataset[FpRow] = {
    import rows.sparkSession.implicits._
    val (cfg, mode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    rows
      .groupByKey(_.fp)
      .transformWithState(
        new FirstSeenSeededProcessor(cfg),
        mode,
        OutputMode.Append(),
        seeds.distinct().groupByKey(identity[String])
      )
  }

  /** The accepted-corpus digests of a [[StreamDedup]] digest store
    * (`<store>/epoch=<n>/part-*.parquet`, `fp` =
    * [[graft.operators.TextOps.fingerprintMd5]] hex strings) as a seed
    * set for [[firstSeenSeeded]] — the migration path from the
    * foreachBatch mirror to native typed state. Reads digests only;
    * nothing collects.
    */
  def digestSeeds(spark: SparkSession, digestStore: String): Dataset[String] = {
    import spark.implicits._
    spark.read
      .option("basePath", digestStore)
      .parquet(digestStore)
      .select(col("fp").cast("string"))
      .as[String]
  }

  /** Gap-based sessions over watermarked events. `watermarkDelay` is the
    * out-of-orderness bound (`withWatermark` on `ts`); a session closes
    * when the watermark passes its last event + `gap`. When not given,
    * the delay DEFAULTS TO THE GAP — the largest delay that can never
    * admit an event overlapping an already-emitted session.
    *
    * Keep `watermarkDelay <= gap`: with a delay LARGER than the gap, the
    * watermark can admit an event that event-time-overlaps a session
    * already closed and emitted — it then opens a NEW session rather
    * than reopening the emitted one, exactly as the built-in streaming
    * `session_window` behaves once it evicts a window's state. An
    * explicit delay past the gap is accepted (late-data tolerance can be
    * worth duplicate-session risk) but logged as a warning.
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gap: Duration,
      watermarkDelay: Option[Duration] = None,
      maxSamples: Int = 8
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val delay = watermarkDelay.getOrElse(gap)
    if (delay.toMillis > gap.toMillis)
      org.slf4j.LoggerFactory
        .getLogger(getClass)
        .warn(
          s"sessionize: watermarkDelay ${delay.toMillis} ms exceeds gap ${gap.toMillis} ms — " +
            "an admitted late event can overlap an already-emitted session and open a " +
            "duplicate (the documented session_window hazard)"
        )
    events
      .withWatermark("ts", s"${delay.toMillis} milliseconds")
      .groupByKey(_.key)
      .transformWithState(
        new SessionizeProcessor(gap.toMillis, maxSamples),
        TimeMode.EventTime(),
        OutputMode.Append()
      )
  }

  /** [[sessionize]] with BATCH→STREAM STATE BOOTSTRAP: `seeds` are OPEN
    * sessions in the output schema (the still-open tails of a batch
    * sessionization or a drained prior deployment — key, n, start, end,
    * retained sample ids). Each seed interval-merges into its key's open
    * list under the same half-open gap rule as arriving events, so a
    * post-migration event inside `gap` of a seed EXTENDS it (one
    * continuous session across the handoff) and a seeded key that never
    * speaks again still closes once the watermark passes its end + gap.
    * The handoff runs once per fresh checkpoint.
    */
  def sessionizeSeeded(
      events: Dataset[SessionEvent],
      gap: Duration,
      seeds: Dataset[SessionOut],
      watermarkDelay: Option[Duration] = None,
      maxSamples: Int = 8
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val delay = watermarkDelay.getOrElse(gap)
    if (delay.toMillis > gap.toMillis)
      org.slf4j.LoggerFactory
        .getLogger(getClass)
        .warn(
          s"sessionizeSeeded: watermarkDelay ${delay.toMillis} ms exceeds gap ${gap.toMillis} ms — " +
            "an admitted late event can overlap an already-emitted session and open a " +
            "duplicate (the documented session_window hazard)"
        )
    events
      .withWatermark("ts", s"${delay.toMillis} milliseconds")
      .groupByKey(_.key)
      .transformWithState(
        new SessionizeSeededProcessor(gap.toMillis, maxSamples),
        TimeMode.EventTime(),
        OutputMode.Append(),
        seeds.groupByKey(_.key)
      )
  }

  /** Running per-key distinct-fp count (point-lookup [[MapState]]
    * membership; Update output — the latest row per key is the count so
    * far). The streaming mirror of `groupBy(key).agg(countDistinct(fp))`.
    *
    * `ttl = None` remembers every fp forever — on an unbounded fp domain
    * that is unbounded state, so long-running deployments should set
    * `ttl`: each membership entry evicts `ttl` after its write and the
    * count becomes cumulative horizon-first admissions (an evicted fp
    * counts again on re-arrival). The TTL'd form runs in ProcessingTime
    * mode and inherits the [[firstSeen]] busy-loop caveat.
    */
  def distinctPerKey(
      rows: Dataset[KeyedFp],
      ttl: Option[Duration] = None
  ): Dataset[KeyCount] = {
    import rows.sparkSession.implicits._
    val (cfg, mode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    rows
      .groupByKey(_.key)
      .transformWithState(new DistinctPerKeyProcessor(cfg), mode, OutputMode.Update())
  }

  /** One tagged input row for [[enrichLatest]]: an OBSERVATION
    * (`isObs = true`, `v = Some(feature)`) or an EVENT (`isObs = false`,
    * `id` tags the event). `t` is the row's time axis (caller-chosen
    * units, e.g. epoch millis).
    */
  final case class EnrichIn(key: String, t: Long, isObs: Boolean, id: String, v: Option[Double])

  /** One enriched event from [[enrichLatest]]: the newest observation at
    * or before the event (`feat`/`featT`), or None when no such
    * observation is retained.
    */
  final case class EnrichOut(key: String, t: Long, id: String, feat: Option[Double], featT: Option[Long])

  /** The newest observation per key — [[LatestEnrichProcessor]]'s
    * ValueState payload and the [[latestObsSeeds]] bootstrap row.
    */
  final case class ObsSeed(key: String, t: Long, v: Double)

  /** [[EnrichIn]] on a true event-time axis (`ts` is the watermark
    * column) — the input row of [[enrichLatestEventTime]].
    */
  final case class EnrichInTs(
      key: String,
      ts: java.sql.Timestamp,
      isObs: Boolean,
      id: String,
      v: Option[Double]
  )

  /** One enriched event from [[enrichLatestEventTime]]. */
  final case class EnrichOutTs(
      key: String,
      ts: java.sql.Timestamp,
      id: String,
      feat: Option[Double],
      featT: Option[java.sql.Timestamp]
  )

  /** Streaming AS-OF ENRICH with bootstrap — the native-typed-state
    * mirror of [[StreamAsOf]]'s feature-store pattern: per key, a
    * ValueState holds the newest observation (t, v); each batch's rows
    * sort by (t, obs-before-event-at-equal-t — the asofBackward side
    * rule) and walk once, so an event picks up the newest observation at
    * or before it, INCLUDING one that arrived in its own micro-batch.
    *
    * Single-version contract (what makes state O(keys), not O(history)):
    * only the newest-t observation per key is retained across batches.
    * Within the retained horizon enrichment equals the batch as-of; an
    * event OLDER than the retained observation (late event straddling a
    * newer feature version) enriches to None rather than resurrecting a
    * discarded version — the feature-store "current version" rule. Feeds
    * whose per-key observation times are non-decreasing (the watermarked
    * common case) match [[graft.operators.AsOfJoin.asofBackward]] exactly
    * (TwsStateSpec pins it).
    */
  private[streaming] final class LatestEnrichProcessor
      extends StatefulProcessorWithInitialState[String, EnrichIn, EnrichOut, ObsSeed] {
    @transient private var latest: ValueState[ObsSeed] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[ObsSeed]("latest", Encoders.product[ObsSeed], TTLConfig.NONE)

    override def handleInitialState(
        key: String,
        initialState: ObsSeed,
        timerValues: TimerValues
    ): Unit =
      latest.update(initialState)

    override def handleInputRows(
        key: String,
        rows: Iterator[EnrichIn],
        timerValues: TimerValues
    ): Iterator[EnrichOut] = {
      // obs sorts before event at equal t: an observation AT the event
      // time is visible — asofBackward's `<=` semantic
      val batch = rows.toArray.sortBy(r => (r.t, if (r.isObs) 0 else 1))
      var cur: ObsSeed = if (latest.exists()) latest.get() else null
      val out = Vector.newBuilder[EnrichOut]
      batch.foreach { r =>
        if (r.isObs) {
          // a malformed observation (v = None) NEVER becomes a feature —
          // [[enrichLatest]] count-and-drops these before the shuffle
          // (the load-shed discipline); this guard keeps the invariant
          // even for direct processor feeds, instead of inventing 0.0
          r.v.foreach { vv => if (cur == null || r.t >= cur.t) cur = ObsSeed(key, r.t, vv) }
        } else if (cur != null && cur.t <= r.t) {
          out += EnrichOut(key, r.t, r.id, Some(cur.v), Some(cur.t))
        } else {
          out += EnrichOut(key, r.t, r.id, None, None)
        }
      }
      if (cur != null) latest.update(cur)
      out.result().iterator
    }
  }

  /** As-of enrich a tagged stream against per-key latest observations,
    * bootstrapped from `seeds` (feed [[latestObsSeeds]] to resume from a
    * [[StreamAsOf]] observation store). Emits one row per EVENT row;
    * observation rows only update state.
    *
    * MALFORMED-OBSERVATION ACCOUNTING: an observation row with `v = None`
    * carries no feature and is COUNT-AND-DROPPED before the shuffle —
    * never enriched into events as an invented value. The drop count
    * surfaces as the named observed metric
    * `<metricsName>.malformed_obs_dropped` on every micro-batch's
    * `StreamingQueryProgress.observedMetrics` (alongside `rows_in`), the
    * same accounting discipline as the pipeline's shed metrics (O-14).
    * `metricsName` must be unique per query (Spark rejects duplicate
    * observation names in one plan).
    */
  def enrichLatest(
      rows: Dataset[EnrichIn],
      seeds: Dataset[ObsSeed],
      metricsName: String = "graft_enrich"
  ): Dataset[EnrichOut] = {
    import rows.sparkSession.implicits._
    dropMalformedObs(rows, metricsName)
      .groupByKey(_.key)
      .transformWithState(
        new LatestEnrichProcessor,
        TimeMode.None(),
        OutputMode.Append(),
        seeds.groupByKey(_.key)
      )
  }

  /** [[LatestEnrichProcessor]] under TRUE EVENT TIME with bounded state:
    * identical enrich semantics (newest observation at or before the
    * event, obs-before-event at equal ts, single-version contract), plus
    * an event-time TIMER that EVICTS a key's retained observation once
    * the watermark passes `obsTime + staleAfter` — the bounded-state
    * story the TimeMode.None form lacks on unbounded key domains. One
    * timer per key at any moment (the [[SessionizeProcessor]] re-arm
    * discipline): each observation advance deletes the old timer and
    * arms `newObsTime + staleAfter`.
    *
    * EVICTION CONTRACT: a key silent for `staleAfter` of event time
    * forgets its observation; a later event on that key enriches to
    * None (same as a never-seen key) rather than to a stale feature.
    * Watermark-late EVENTS are dropped by the engine before the
    * processor (standard event-time semantics); a late OBSERVATION
    * inside the watermark still applies under the single-version rule.
    */
  private[streaming] final class LatestEnrichEventTimeProcessor(staleAfterMs: Long)
      extends StatefulProcessorWithInitialState[String, EnrichInTs, EnrichOutTs, ObsSeed] {
    @transient private var latest: ValueState[ObsSeed] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[ObsSeed]("latest", Encoders.product[ObsSeed], TTLConfig.NONE)

    private def rearm(obsT: Long): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(obsT + staleAfterMs)
    }

    override def handleInitialState(
        key: String,
        initialState: ObsSeed,
        timerValues: TimerValues
    ): Unit = {
      latest.update(initialState)
      rearm(initialState.t)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[EnrichInTs],
        timerValues: TimerValues
    ): Iterator[EnrichOutTs] = {
      val batch = rows.toArray.sortBy(r => (r.ts.getTime, if (r.isObs) 0 else 1))
      var cur: ObsSeed = if (latest.exists()) latest.get() else null
      var advanced = false
      val out = Vector.newBuilder[EnrichOutTs]
      batch.foreach { r =>
        val t = r.ts.getTime
        if (r.isObs) {
          // v = None is count-and-dropped upstream; guard kept for
          // direct feeds — never invent a feature value
          r.v.foreach { vv =>
            if (cur == null || t >= cur.t) { cur = ObsSeed(key, t, vv); advanced = true }
          }
        } else if (cur != null && cur.t <= t) {
          out += EnrichOutTs(key, r.ts, r.id, Some(cur.v), Some(new java.sql.Timestamp(cur.t)))
        } else {
          out += EnrichOutTs(key, r.ts, r.id, None, None)
        }
      }
      if (advanced) {
        latest.update(cur)
        rearm(cur.t)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[EnrichOutTs] = {
      // defensive staleness check: under the one-timer re-arm discipline
      // a firing timer always matches the retained obs, but a racing
      // same-batch advance must never evict a fresh observation
      val due =
        math.max(expiredTimerInfo.getExpiryTimeInMs(), timerValues.getCurrentWatermarkInMs())
      if (latest.exists() && latest.get().t + staleAfterMs <= due) latest.clear()
      Iterator.empty
    }
  }

  /** [[enrichLatest]] under TRUE EVENT TIME: `ts` carries the watermark
    * (`watermarkDelay` = out-of-orderness bound), and a key whose newest
    * observation falls `staleAfter` behind the watermark is EVICTED by a
    * per-key event-time timer — state stays bounded by the live-key set
    * within the staleness horizon instead of growing with every key ever
    * seen. Seeds bootstrap exactly as in [[enrichLatest]]; a seeded key
    * that never speaks evicts once the watermark passes `seed.t +
    * staleAfter`. Malformed observations (`v = None`) are count-and-
    * dropped under `<metricsName>.malformed_obs_dropped`.
    */
  def enrichLatestEventTime(
      rows: Dataset[EnrichInTs],
      seeds: Dataset[ObsSeed],
      staleAfter: Duration,
      watermarkDelay: Duration,
      metricsName: String = "graft_enrich_et"
  ): Dataset[EnrichOutTs] = {
    import rows.sparkSession.implicits._
    dropMalformedObs(rows, metricsName, alsoMalformed = col("ts").isNull)
      .withWatermark("ts", s"${watermarkDelay.toMillis} milliseconds")
      .groupByKey(_.key)
      .transformWithState(
        new LatestEnrichEventTimeProcessor(staleAfter.toMillis),
        TimeMode.EventTime(),
        OutputMode.Append(),
        seeds.groupByKey(_.key)
      )
  }

  /** Count-and-drop malformed rows under a named streaming observation —
    * shared by both [[enrichLatest]] variants. Malformed = an
    * observation with no value (`isObs && v IS NULL`), plus whatever the
    * caller adds via `alsoMalformed` (the event-time variant adds
    * `ts IS NULL`: a null event time is undeliverable under a watermark
    * and would NPE the processor's sort — and `null < watermark` is
    * NULL, not true, so the engine's late-row filter never drops it).
    * One narrow filter, no extra exchange.
    */
  private def dropMalformedObs[T](
      rows: Dataset[T],
      metricsName: String,
      alsoMalformed: Column = org.apache.spark.sql.functions.lit(false)
  ): Dataset[T] = {
    import org.apache.spark.sql.functions.{count, lit, when}
    val malformed = (col("isObs") && col("v").isNull) || alsoMalformed
    rows
      .observe(
        metricsName,
        count(when(malformed, lit(1))).as("malformed_obs_dropped"),
        count(lit(1)).as("rows_in")
      )
      .filter(!malformed)
  }

  /** The newest observation per key of a [[StreamAsOf]] observation
    * store, as [[enrichLatest]] bootstrap seeds: one partial-agg
    * exchange over (key, time, value) triples — one summary row out per
    * key, never history-sized. `max(struct(t, v))` picks the
    * latest-time row (tie rule: largest v at equal t — duplicate
    * (key, t) observations are sort-ambiguous in the batch as-of too).
    */
  def latestObsSeeds(
      spark: SparkSession,
      obsStore: String,
      byCol: String,
      timeCol: String,
      valueCol: String
  ): Dataset[ObsSeed] = {
    import spark.implicits._
    spark.read
      .option("basePath", obsStore)
      .parquet(obsStore)
      .groupBy(col(byCol).cast("string").as("key"))
      .agg(max(struct(col(timeCol).cast("long").as("t"), col(valueCol).cast("double").as("v"))).as("m"))
      .select(col("key"), col("m.t").as("t"), col("m.v").as("v"))
      .as[ObsSeed]
  }
}
