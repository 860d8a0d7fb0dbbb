package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join and range join — relational operators Spark lacks
  * as built-ins (SURVEY.md §2.5), composed from existing operators per the
  * preference order (compose &gt; custom plan).
  *
  * The as-of join uses the union-sort trick: tag both sides, union them,
  * and carry the latest right-side values forward with a
  * `last(..., ignoreNulls)` running window per key. Cost is ONE shuffle +
  * sort on (key, time) — the same work a sort-merge join would do — and it
  * never builds the |L|·|R| intermediate that a naive
  * `join + filter + row_number` plan creates. This is the scalable layout
  * for 100 TB event streams.
  */
object AsOfJoin {

  /** For each left row, attach the most recent right row with
    * `right.timeCol <= left.timeCol`, matching on `byCol` (backward as-of,
    * the pandas/DuckDB default). Right value columns = everything except
    * (byCol, timeCol), carried forward under their own names.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      timeCol: String
  ): DataFrame = {
    val valueCols = right.columns.filterNot(c => c == byCol || c == timeCol).toSeq
    val clash = valueCols.toSet.intersect(
      left.columns.filterNot(c => c == byCol || c == timeCol).toSet
    )
    require(
      clash.isEmpty,
      s"asofBackward requires disjoint value column names; rename on one side: ${clash.mkString(", ")}"
    )
    val lTagged = left
      .withColumn("_side", lit(1))
      .withColumns(valueCols.map(c => c -> lit(null).cast(right.schema(c).dataType)).toMap)
    val rTagged = right
      .select((Seq(col(byCol), col(timeCol)) ++ valueCols.map(col)): _*)
      .withColumn("_side", lit(0))
      .withColumns(left.columns.filterNot(c => c == byCol || c == timeCol).map { c =>
        c -> lit(null).cast(left.schema(c).dataType)
      }.toMap)
    val unioned = lTagged.unionByName(rTagged)
    // Right rows sort before left rows at the same timestamp (side 0 < 1):
    // a right row AT the left timestamp is visible — the `<=` semantic.
    val w = Window
      .partitionBy(col(byCol))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // Carry the most recent right ROW as one struct (asof attaches whole
    // rows): per-column last(ignoreNulls) would skip a legitimate NULL in
    // one value column and resurrect a stale value for it, producing a
    // chimera row that matches no actual right observation. One window
    // pass instead of one per value column, too.
    val carried = unioned
      .withColumn(
        "_rv",
        last(
          when(col("_side") === 0, struct(valueCols.map(col): _*)),
          ignoreNulls = true
        ).over(w)
      )
    valueCols
      .foldLeft(carried)((df, c) => df.withColumn(c, col("_rv").getField(c)))
      .filter(col("_side") === 1)
      .drop("_side", "_rv")
  }

  /** [[asofBackward]] through the NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]]): identical contract and output
    * (spec-asserted row-equal to the composition), but planned as a
    * custom merge node — both sides hash-clustered on `byCol` and sorted
    * by (`byCol`, `timeCol`), then one O(|L|+|R|) streaming pointer walk
    * per partition with a single carried right row of state. Same
    * exchange/sort bill as the composition, none of its union row-blowup,
    * window buffering, or post-filter.
    *
    * The strategy self-registers into the session's experimental
    * strategies on first use, so it works in sessions not built with
    * [[graft.GraftExtensions]].
    */
  def asofBackwardNative(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      timeCol: String
  ): DataFrame = asofBackwardNativeKeys(left, right, Seq(byCol), timeCol)

  /** Multi-key form of [[asofBackwardNative]]: match on ALL of `byCols`
    * (in order) and carry backward over `timeCol` within each composite
    * key group. This is the node [[asofBackwardChunked]] rides — the
    * chunk column is just one more (primitive, codegen-cheap) key — and
    * it is public surface in its own right (as-of within (symbol,
    * venue), (user, session), ...).
    */
  def asofBackwardNativeKeys(
      left: DataFrame,
      right: DataFrame,
      byCols: Seq[String],
      timeCol: String
  ): DataFrame = {
    require(byCols.nonEmpty, "byCols must be non-empty")
    val spark = left.sparkSession
    // session resolver (case-insensitive by default) so name matching
    // agrees with the asofBackward twin's Column resolution
    val res = spark.sessionState.conf.resolver
    def isKeyOrTime(c: String): Boolean = byCols.exists(res(c, _)) || res(c, timeCol)
    val valueCols = right.columns.filterNot(isKeyOrTime).toSeq
    val clash = valueCols.toSet.intersect(left.columns.filterNot(isKeyOrTime).toSet)
    require(
      clash.isEmpty,
      s"asofBackwardNative requires disjoint value column names; rename on one side: ${clash.mkString(", ")}"
    )
    // synchronized: extraStrategies is a plain session-global var, and an
    // unguarded read-check-append from concurrent query builders could
    // lose one thread's update (builder-time injection via
    // GraftExtensions has no such race — prefer it where possible)
    graft.plans.AsOfJoinStrategy.synchronized {
      if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    // re-alias the right side so a self-as-of (same source both sides)
    // cannot alias attribute ids across the node
    val rFresh = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lPlan = org.apache.spark.sql.graftbridge.Bridge.analyzed(left)
    val rPlan = org.apache.spark.sql.graftbridge.Bridge.analyzed(rFresh)
    // resolve with the session's resolver (case-insensitive by default,
    // matching the asofBackward twin's Column resolution) and fail loudly
    // on duplicates instead of silently taking the first
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) = {
      val resolver = spark.sessionState.conf.resolver
      p.output.filter(a => resolver(a.name, n)) match {
        case collection.Seq(one) => one
        case collection.Seq() =>
          throw new IllegalArgumentException(s"no column '$n'")
        case many =>
          throw new IllegalArgumentException(
            s"ambiguous column '$n': matches ${many.map(_.name).mkString(", ")}"
          )
      }
    }
    val node = graft.plans.AsOfJoinNode(
      lPlan,
      rPlan,
      byCols.map(attr(lPlan, _)),
      attr(lPlan, timeCol),
      byCols.map(attr(rPlan, _)),
      attr(rPlan, timeCol),
      valueCols.map(attr(rPlan, _))
    )
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, node)
  }

  /** [[asofBackward]] with HOT-KEY PARALLELISM via automatic time-epoch
    * chunking — the structural answer to the one scale exposure the plain
    * merge documents (one monster key serializes its partition's sort +
    * merge, and salting cannot apply because the carry is order-dependent
    * within the key; AQE's `OptimizeSkewedJoin` splits SMJ/SHJ only, never
    * a custom node).
    *
    * Construction (semantics identical to [[asofBackward]], spec-asserted):
    *   1. the global time span [tmin, tmax] (one 1-row aggregate over both
    *      sides) divides into `nChunks` equal epochs; every row gets an
    *      INT `chunk = (t − tmin) / width` — a second, primitive-cheap
    *      key column, never a struct;
    *   2. SEED rows carry state across chunk boundaries: the right side
    *      reduces to its last row per (key, chunk) (partial-agg exchange,
    *      one summary row out per key-chunk), and each summary replicates
    *      into every chunk up to the key's next occupied chunk (a lead()
    *      window over the SUMMARIES — ≤ nChunks rows per key, so the hot
    *      key is harmless here — then one bounded sequence-explode). A
    *      seed keeps its ORIGINAL time, strictly before its target chunk's
    *      start, so it sorts before every real right row in the chunk and
    *      is visible to every left row — no fabricated ties. Seeds for
    *      chunks the left never touches just stream through the merge and
    *      drop; total seed mass is ≤ nKeys·nChunks summary-sized rows.
    *   3. the native merge ([[graft.plans.AsOfJoinExec]]) runs with keys
    *      (key, chunk) via [[asofBackwardNativeKeys]]: the monster key now
    *      spreads across up to `nChunks` independent merge partitions.
    *
    * Cost vs the plain merge: one bounds job + one partial-agg pass over
    * the right side, in exchange for nChunks-way parallelism inside every
    * key. Seed mass is O(distinct right keys × nChunks) worst case (a key
    * whose observations sit in one early chunk seeds every later epoch) —
    * ~6% of corpus rows at 1e8 keys / 64 chunks / 1e11 rows, negligible in
    * the hot-key regime the operator targets, and exactly the regime where
    * a high-cardinality-uniform corpus should use the plain
    * [[asofBackwardNative]] instead (it is the default for a reason).
    *
    * Tie note: at duplicate right (key, time) rows the carried row is
    * sort-order-ambiguous in BOTH paths; results are identical whenever
    * (key, time) is unique on the right (the pandas `merge_asof` contract).
    * Time must be a timestamp or integral column.
    */
  def asofBackwardChunked(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      timeCol: String,
      nChunks: Int = 64
  ): DataFrame = {
    require(nChunks >= 1, s"nChunks must be >= 1, got $nChunks")
    val res = left.sparkSession.sessionState.conf.resolver
    require(
      !left.columns.exists(res(_, "__chunk")) && !right.columns.exists(res(_, "__chunk")),
      "asofBackwardChunked reserves the column name '__chunk'"
    )
    val valueCols = right.columns.filterNot(c => res(c, byCol) || res(c, timeCol)).toSeq
    import org.apache.spark.sql.types._
    def tLong(df: DataFrame): Column = df.schema(timeCol).dataType match {
      case TimestampType => unix_micros(col(timeCol))
      case ByteType | ShortType | IntegerType | LongType => col(timeCol).cast("long")
      case t =>
        throw new IllegalArgumentException(
          s"asofBackwardChunked: time column must be timestamp or integral, got $t"
        )
    }
    // global bounds over BOTH sides so (t - tmin) is always non-negative
    // and long division == floor division (1-row job, bounded model state)
    val b = left
      .select(tLong(left).as("__t"))
      .unionAll(right.select(tLong(right).as("__t")))
      .agg(min(col("__t")).as("mn"), max(col("__t")).as("mx"))
      .head()
    def run(chunkOf: DataFrame => Column, seeds: Option[DataFrame]): DataFrame = {
      val rightC = right.select(
        (col(byCol) +: chunkOf(right).as("__chunk") +: col(timeCol) +: valueCols.map(col)): _*
      )
      val rightAug = seeds.fold(rightC)(rightC.unionByName(_))
      val l = left.withColumn("__chunk", chunkOf(left))
      asofBackwardNativeKeys(l, rightAug, Seq(byCol, "__chunk"), timeCol)
        .select((left.columns ++ valueCols).map(col): _*)
    }
    if (b.isNullAt(0)) {
      // no non-null times anywhere: a single chunk reproduces the plain
      // merge's null-time grouping exactly
      return run(_ => lit(0).cast("int"), None)
    }
    val (tmin, tmax) = (b.getLong(0), b.getLong(1))
    val width = math.max(1L, (tmax - tmin) / nChunks + 1)
    // Column `/` is double division; a boundary value can round into the
    // neighboring chunk, but the map long→chunk stays MONOTONE (long→double
    // cast, division by a positive constant, and truncation are each
    // monotone), which is all the construction needs: chunks partition the
    // time axis consistently for both sides, and a seed's source time is
    // provably < every real right time in its target chunk.
    def chunk(df: DataFrame): Column = ((tLong(df) - tmin) / width).cast("int")

    // last right row per (key, chunk): partial-agg exchange, one row out.
    // null-time rows land in the null chunk, which sorts first — their
    // summary seeds from chunk 0 on, exactly the plain merge's null-first
    // visibility.
    val rightC0 = right.select(
      (col(byCol) +: chunk(right).as("__chunk") +: col(timeCol) +: valueCols.map(col)): _*
    )
    // max over an ORDER-FIRST struct, not max_by: max_by skips rows whose
    // ordering value is null, so an all-null-time (key, null-chunk) group
    // would summarize to a NULL __last and the seeds would carry all-null
    // time/values — while the plain merge (nulls-first) carries that
    // row's ACTUAL values. struct comparison treats a null field as
    // smallest, so max(struct(t, row)) picks the same latest-time row for
    // non-null groups and a real row (tie-ambiguous, as the contract
    // allows for duplicate (key, time)) for the null-time group.
    val lastStruct = struct((col(timeCol) +: valueCols.map(col)): _*)
    val rightSumm = rightC0
      .groupBy(col(byCol), col("__chunk"))
      .agg(max(struct(tLong(rightC0).as("__ord"), lastStruct.as("__s"))).as("__m"))
      .select(col(byCol), col("__chunk"), col("__m").getField("__s").as("__last"))
    // seed targets: every chunk after this summary's, up to (and
    // INCLUDING) the key's next occupied chunk — left rows early in that
    // chunk still precede its first real right row. lead() runs over the
    // bounded chunk summaries, never corpus rows. The lead default is
    // nChunks (not nChunks − 1): the double-division chunk map can in
    // principle round a > 2^53-span row into chunk == nChunks, and the
    // last seed range must still cover it (one extra summary-sized seed
    // row per key).
    val wNext = Window.partitionBy(col(byCol)).orderBy(col("__chunk").asc_nulls_first)
    val seeds = rightSumm
      .withColumn("__next", lead(col("__chunk"), 1, nChunks).over(wNext))
      .withColumn("__from", coalesce(col("__chunk") + 1, lit(0)))
      .filter(col("__next") >= col("__from"))
      .select(
        (col(byCol) +: explode(sequence(col("__from"), col("__next"))).as("__chunk") +:
          col("__last").getField(timeCol).as(timeCol) +:
          valueCols.map(c => col("__last").getField(c).as(c))): _*
      )
    run(chunk, Some(seeds))
  }

  /** FORWARD as-of (pandas `merge_asof(direction="forward")`, DuckDB
    * `ASOF ... ON l.t <= r.t`): for each left row, the EARLIEST right row
    * with `right.timeCol >= left.timeCol` on the same key — the
    * next-observation join (next signup after a touch, next deploy after
    * a commit). Composed by time negation over the native backward merge:
    * backward-on-(-t) ≡ forward-on-t, so the physical plan is the same
    * [[graft.plans.AsOfJoinExec]] streaming merge (one exchange + sort
    * per side, O(1) carried state). Both time columns must be timestamps
    * or integral.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      timeCol: String
  ): DataFrame = {
    def negT(df: DataFrame): DataFrame = {
      val t = df.schema(timeCol).dataType
      val asLong =
        if (t == org.apache.spark.sql.types.TimestampType) unix_micros(col(timeCol))
        else col(timeCol).cast("long")
      df.withColumn("__negt", -asLong)
    }
    asofBackwardNative(negT(left), negT(right).drop(timeCol), byCol, "__negt")
      .drop("__negt")
  }

  /** Cost-based auto-switch between the plain native merge and the
    * chunked monster-key path (the [[graft.operators.Dedup.ngramJaccardPairsAuto]]
    * precedent): one partial-agg probe over both sides' key columns
    * measures the hottest key's row share; past `hotShareThreshold`
    * (default 10% — where the skew stress shows the chunked path winning
    * 2–3.5×) the query routes through [[asofBackwardChunked]], otherwise
    * through [[asofBackwardNative]]. Both paths are spec-pinned
    * row-identical, so the switch is invisible to results — it only
    * reshapes the exchanges. Probe cost: one ids-only partial-agg job.
    */
  def asofBackwardAuto(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      timeCol: String,
      hotShareThreshold: Double = 0.10,
      nChunks: Int = 64,
      minHotRows: Long = 8000000L
  ): DataFrame =
    if (preferChunked(left, right, byCol, hotShareThreshold, minHotRows))
      asofBackwardChunked(left, right, byCol, timeCol, nChunks)
    else asofBackwardNative(left, right, byCol, timeCol)

  /** True when either side's hottest key holds more than
    * `hotShareThreshold` of that side's rows AND at least `minHotRows`
    * rows in absolute terms — the regime where one merge partition
    * serializes the job. Both conditions matter (measured in
    * `StressXOps asof`): at 30% share the chunked path breaks even
    * around a ~1.5M-row hot key (5M corpus) and wins 2.1–3.5× at 6M
    * (20M corpus) — a hot key's cost is its absolute sort+merge time,
    * not its share. One partial-agg probe per side, ids only.
    */
  private[graft] def preferChunked(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      hotShareThreshold: Double,
      minHotRows: Long = 8000000L
  ): Boolean =
    preferChunkedOne(left, byCol, hotShareThreshold, minHotRows) ||
      preferChunkedOne(right, byCol, hotShareThreshold, minHotRows)

  /** Single-frame form of the probe — the [[gapFillAuto]] cost model
    * (gap-fill has one input, not two). Same two-condition trip rule and
    * the same absolute-mass floor as [[preferChunked]].
    *
    * PROBE COST (the r13 advice): the naive probe is a full
    * `groupBy(key)` pass over the input per auto call — column-pruned
    * and partial-aggregated, but still a second full scan at 100 TB.
    * This probe instead runs in up to three tiers, cheapest first:
    *
    *   1. **session cache** — results key on (plan semantic hash, byCol),
    *      so repeated auto calls on an unchanged frame run ZERO probe
    *      jobs (feature pipelines call gapFillAuto/resampleAuto on the
    *      same frame many times);
    *   2. **bounded head sample** — one job reading at most
    *      `ProbePerPartition` (+1) rows per partition (the iterator
    *      stops pulling, so a parquet task touches a few pages, never
    *      its whole split). Share is scale-invariant, so the sample
    *      decides WITHOUT a total row count: a hottest-sample-share at
    *      or below half the threshold is confidently uniform → plain
    *      path, full scan avoided entirely — the common case. A sample
    *      that covered the whole input (nothing truncated) decides
    *      exactly.
    *   3. **exact probe** — only when the sample lands in the uncertain
    *      band (share above thr/2 on a truncated sample): the original
    *      full groupBy settles both the true share and the absolute
    *      `minHotRows` floor (which a headless sample cannot bound).
    *      Hot corpora therefore still pay one exact pass — and earn it
    *      back 2–3.5× from the chunked plan it enables.
    *
    *  A head sample is biased when partition SIZES are heavily skewed
    *  (a monster key hiding in one giant partition can under-show);
    *  the miss is performance-only — both routed plans are spec-pinned
    *  row-identical — and callers who know the layout can force
    *  [[asofBackwardChunked]] directly. Decision parity with the exact
    *  probe on both skew fixtures is pinned in OperatorSpec/SkewGenSpec.
    */
  private[graft] def preferChunkedOne(
      df: DataFrame,
      byCol: String,
      hotShareThreshold: Double,
      minHotRows: Long = 8000000L
  ): Boolean = {
    require(
      hotShareThreshold > 0.0 && hotShareThreshold <= 1.0,
      s"hotShareThreshold in (0,1], got $hotShareThreshold"
    )
    val planKey = (
      df.queryExecution.analyzed.canonicalized.semanticHash(),
      df.schema.treeString.hashCode,
      byCol.toLowerCase
    )
    def decideExact(mx: Long, tot: Long): Boolean =
      tot > 0 && mx >= minHotRows && mx.toDouble / tot > hotShareThreshold
    ProbeCache.exact(planKey) match {
      case Some((mx, tot)) => decideExact(mx, tot)
      case None =>
        val (mxS, totS, truncated) = ProbeCache
          .sampled(planKey)
          .getOrElse {
            val s = headSampleProbe(df, byCol)
            ProbeCache.putSampled(planKey, s)
            s
          }
        if (totS == 0L) false
        else if (!truncated) decideExact(mxS, totS) // sample == whole input
        else if (mxS.toDouble / totS <= hotShareThreshold / 2) false // confidently uniform
        else {
          val e = exactHotProbe(df, byCol)
          ProbeCache.putExact(planKey, e)
          decideExact(e._1, e._2)
        }
    }
  }

  /** Rows the head-sample probe pulls per partition. 4096 × the usual
    * 32–200 partitions keeps the sample row count in the low hundreds
    * of thousands — aggregated distributedly, never collected.
    */
  private[graft] val ProbePerPartition: Int = 4096

  /** One bounded job: from every partition take the first
    * [[ProbePerPartition]] key values (+1 probe row to detect
    * truncation), then one distributed aggregate over the sample.
    * Returns (hottest sample count, sample rows, any partition
    * truncated).
    */
  private[graft] def headSampleProbe(df: DataFrame, byCol: String): (Long, Long, Boolean) = {
    import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
    val spark = df.sparkSession
    val keyed = df.select(col(byCol).as("__k"))
    val keyField = keyed.schema.head
    val perPart = ProbePerPartition
    val sampledRdd = keyed.rdd.mapPartitions { it =>
      val head = it.take(perPart).map(r => org.apache.spark.sql.Row(r.get(0), false)).toVector
      if (it.hasNext) head.iterator ++ Iterator(org.apache.spark.sql.Row(null, true))
      else head.iterator
    }
    val schema = StructType(
      Seq(keyField.copy(nullable = true), StructField("__extra", BooleanType, nullable = false))
    )
    val r = spark
      .createDataFrame(sampledRdd, schema)
      .groupBy(col("__k"), col("__extra"))
      .agg(count(lit(1)).as("n"))
      .agg(
        max(when(!col("__extra"), col("n"))).as("mx"),
        sum(when(!col("__extra"), col("n"))).as("tot"),
        max(when(col("__extra"), lit(1)).otherwise(lit(0))).as("trunc")
      )
      .head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) (0L, 0L, false)
    else (r.getLong(0), r.getLong(1), r.getInt(2) > 0)
  }

  /** The exact full-scan probe (the pre-r14 behavior): hottest key count
    * and total rows, one column-pruned partial-agg pass.
    */
  private[graft] def exactHotProbe(df: DataFrame, byCol: String): (Long, Long) = {
    val r = df
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"))
      .head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) (0L, 0L) else (r.getLong(0), r.getLong(1))
  }

  /** Session-scoped probe-result cache (r13 advice #8): keyed by the
    * SEMANTIC HASH of the frame's canonicalized analyzed plan + key
    * column (a compact fingerprint — holding the plan object itself
    * would pin LocalRelation rows and FileIndex state on the heap for
    * the JVM lifetime, the r14 advice finding), bounded LRU, so N auto
    * calls on an unchanged frame pay for one probe. Entries expire
    * after [[TtlMs]] (`-Dgraft.asof.probe.ttlMs`, default 15 min) so a
    * long-lived session whose data is overwritten under the same plan
    * re-probes instead of keeping the wrong routing forever.
    * Correctness never depends on it — a stale or hash-colliding entry
    * can only mis-route between two spec-pinned row-identical plans.
    */
  private[graft] object ProbeCache {
    private val MaxEntries = 64
    private[graft] def TtlMs: Long =
      java.lang.Long.getLong("graft.asof.probe.ttlMs", 15L * 60 * 1000)
    // (semanticHash, schema-string hash, byCol): the 32-bit semanticHash
    // alone gives two DIFFERENT frames a 2^-32-per-pair collision domain
    // in which one silently reuses the other's probe stats (r15 advice);
    // mixing in the schema treeString hash makes a cross-frame collision
    // require both 32-bit hashes to collide at once while staying a
    // compact fingerprint (no plan objects retained on the heap)
    private type Key = (Int, Int, String)
    private def lru[V](): java.util.LinkedHashMap[Key, (V, Long)] =
      new java.util.LinkedHashMap[Key, (V, Long)](16, 0.75f, true) {
        override protected def removeEldestEntry(
            e: java.util.Map.Entry[Key, (V, Long)]
        ): Boolean = size() > MaxEntries
      }
    private val sampledM = lru[(Long, Long, Boolean)]()
    private val exactM = lru[(Long, Long)]()
    // an expired entry is REMOVED on the miss (not just skipped): the
    // access-order get() would otherwise promote the dead entry to MRU
    // and let it evict a still-fresh one
    private def fresh[V](m: java.util.LinkedHashMap[Key, (V, Long)], k: Key): Option[V] =
      Option(m.get(k)).flatMap {
        case (v, t) if System.currentTimeMillis() - t <= TtlMs => Some(v)
        case _ => m.remove(k); None
      }
    def sampled(k: Key): Option[(Long, Long, Boolean)] =
      synchronized(fresh(sampledM, k))
    def putSampled(k: Key, v: (Long, Long, Boolean)): Unit =
      synchronized { sampledM.put(k, (v, System.currentTimeMillis())); () }
    def exact(k: Key): Option[(Long, Long)] = synchronized(fresh(exactM, k))
    def putExact(k: Key, v: (Long, Long)): Unit =
      synchronized { exactM.put(k, (v, System.currentTimeMillis())); () }
    def clear(): Unit = synchronized { sampledM.clear(); exactM.clear() }
  }

  /** [[asofForward]] through the chunked monster-key path: forward ≡
    * backward on negated time, so the same time-epoch chunking +
    * boundary-seed construction applies verbatim (the chunk ids negate
    * with the time axis; semantics spec-pinned equal to [[asofForward]]).
    */
  def asofForwardChunked(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      timeCol: String,
      nChunks: Int = 64
  ): DataFrame = {
    def negT(df: DataFrame): DataFrame = {
      val t = df.schema(timeCol).dataType
      val asLong =
        if (t == org.apache.spark.sql.types.TimestampType) unix_micros(col(timeCol))
        else col(timeCol).cast("long")
      df.withColumn("__negt", -asLong)
    }
    asofBackwardChunked(negT(left), negT(right).drop(timeCol), byCol, "__negt", nChunks)
      .drop("__negt")
  }

  /** NEAREST as-of (pandas `merge_asof(direction="nearest")`): for each
    * left row, the right row minimizing |right.time − left.time| on the
    * same key; ties (equidistant before/after) take the BACKWARD match,
    * pandas' rule. Composed from one backward and one forward native
    * merge joined back on `leftIdCol` (a unique left row key — required
    * because the two directional passes must re-align row-for-row).
    * Cost: two [[graft.plans.AsOfJoinExec]] passes + one id-keyed join —
    * all on the same key/id hash partitioning, no blowup.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      timeCol: String,
      leftIdCol: String,
      chunked: Boolean = false
  ): DataFrame = {
    val valueCols = right.columns.filterNot(c => c == byCol || c == timeCol).toSeq
    require(
      !valueCols.contains(leftIdCol),
      s"leftIdCol '$leftIdCol' collides with a right value column"
    )
    // a NULL id would silently vanish through the recombination joins
    // (NULL === NULL is not true) — fail LOUDLY at execution instead:
    // assert_true returns null on pass, so the when() below is the id
    // itself unless a null id flows, which raises. No extra job.
    val left0 = left.withColumn(
      leftIdCol,
      when(
        assert_true(
          col(leftIdCol).isNotNull,
          lit(s"asofNearest: NULL $leftIdCol — leftIdCol must be a unique non-null key")
        ).isNull,
        col(leftIdCol)
      )
    )
    def toLong(df: DataFrame): Column = {
      val t = df.schema(timeCol).dataType
      if (t == org.apache.spark.sql.types.TimestampType) unix_micros(col(timeCol))
      else col(timeCol).cast("long")
    }
    // carry the matched right TIME through each pass to compare distances;
    // chunked = both directional passes take the monster-key time-epoch
    // path (spec-pinned result-identical, so the flag is plan-only)
    val rT = right.withColumn("__rt", toLong(right))
    val b =
      if (chunked) asofBackwardChunked(left0, rT, byCol, timeCol)
      else asofBackwardNative(left0, rT, byCol, timeCol)
    val f =
      if (chunked) asofForwardChunked(left0, rT, byCol, timeCol)
      else asofForward(left0, rT, byCol, timeCol)
    val lt = toLong(left)
    val bSide = b.select(
      (Seq(
        col(leftIdCol).as("__id"),
        abs(lt - col("__rt")).as("__db"),
        col("__rt").isNotNull.as("__hb")
      ) ++ valueCols.map(c => col(c).as(s"__b_$c"))): _*
    )
    val fSide = f.select(
      (Seq(
        col(leftIdCol).as("__fid"),
        abs(lt - col("__rt")).as("__df"),
        col("__rt").isNotNull.as("__hf")
      ) ++ valueCols.map(c => col(c).as(s"__f_$c"))): _*
    )
    // backward wins ties and missing-forward; forward wins only when
    // strictly closer (or backward missing) — pandas' nearest rule
    val takeB = col("__hb") && (!col("__hf") || col("__db") <= col("__df"))
    val picked = valueCols.map { c =>
      when(takeB, col(s"__b_$c"))
        .when(col("__hf"), col(s"__f_$c"))
        .otherwise(lit(null))
        .as(c)
    }
    left0
      .join(bSide, col(leftIdCol) === col("__id"))
      .join(fSide, col(leftIdCol) === col("__fid"))
      .select(left.columns.map(col) ++ picked: _*)
  }

  /** Time-series resampling: a regular grid of `every` per key over each
    * key's [floor(min ts), max ts] span, forward-filled with the latest
    * observation at or before each grid point (grid + as-of composition —
    * no new operator machinery, one shuffle for the grid bounds and one
    * for the as-of sort).
    */
  def resample(
      df: DataFrame,
      byCol: String,
      timeCol: String,
      every: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val unit = every.split(" ")(1) match {
      case u if u.startsWith("hour")   => "hour"
      case u if u.startsWith("minute") => "minute"
      case u if u.startsWith("day")    => "day"
      case u => throw new IllegalArgumentException(s"unsupported grid unit '$u'")
    }
    val grid = df
      .groupBy(col(byCol))
      .agg(
        date_trunc(unit, min(col(timeCol))).as("_mn"),
        max(col(timeCol)).as("_mx")
      )
      .select(
        col(byCol),
        explode(sequence(col("_mn"), col("_mx"), expr(s"interval $every"))).as(timeCol)
      )
    val right = df.select((byCol +: timeCol +: valueCols).map(col): _*)
    // through the native merge operator (q19's path); the union+window
    // composition is its spec-pinned twin
    asofBackwardNative(grid, right, byCol, timeCol)
  }

  /** Forward-fill (LOCF — last observation carried forward): per entity,
    * in time order, replace null measurements with the most recent
    * non-null one; rows before any observation stay null. The telemetry
    * gap-fill every downstream resample/feature join assumes. One window
    * per entity (`last(..., ignoreNulls)` over rows-unbounded-preceding —
    * Spark keeps only the latest non-null in state, O(1) per row);
    * entity-skew caveat: a single monster entity serializes its own
    * partition — chunk by session first if that is a real shape.
    * Returns the input plus `<value>_filled` and `was_filled`.
    */
  def gapFill(
      df: DataFrame,
      byCol: String,
      timeCol: String,
      tieCol: String,
      valueCol: String
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(byCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val filled = last(col(valueCol), ignoreNulls = true).over(w)
    df.withColumn(s"${valueCol}_filled", filled)
      .withColumn("was_filled", col(valueCol).isNull && filled.isNotNull)
  }

  /** [[gapFill]] with HOT-ENTITY PARALLELISM — the same time-epoch
    * chunking as [[asofBackwardChunked]], applied to the LOCF window: one
    * monster entity no longer serializes its whole history into a single
    * window partition. Per (entity, chunk) the input reduces to its last
    * non-null observation (partial-agg exchange, one summary row out);
    * each summary replicates into every chunk up to the entity's next
    * OBSERVED chunk (lead() over the bounded summaries + one
    * sequence-explode) as a SEED row carrying its original (time, tie) —
    * strictly before every real row of its target chunk, so the within-
    * chunk window sees exactly the state the unbounded per-entity window
    * would have carried in. Seeds drop after the fill. Result is
    * spec-pinned row-identical to [[gapFill]]; time must be a timestamp
    * or integral column (the plain [[gapFill]] stays the general-type
    * form and the default for ordinary entity distributions).
    */
  def gapFillChunked(
      df: DataFrame,
      byCol: String,
      timeCol: String,
      tieCol: String,
      valueCol: String,
      nChunks: Int = 64
  ): DataFrame = {
    require(nChunks >= 1, s"nChunks must be >= 1, got $nChunks")
    val res = df.sparkSession.sessionState.conf.resolver
    require(
      !df.columns.exists(c => res(c, "__chunk") || res(c, "__is_seed")),
      "gapFillChunked reserves the column names '__chunk' and '__is_seed'"
    )
    import org.apache.spark.sql.types._
    val tl: Column = df.schema(timeCol).dataType match {
      case TimestampType => unix_micros(col(timeCol))
      case ByteType | ShortType | IntegerType | LongType => col(timeCol).cast("long")
      case t =>
        throw new IllegalArgumentException(
          s"gapFillChunked: time column must be timestamp or integral, got $t"
        )
    }
    val b = df.agg(min(tl).as("mn"), max(tl).as("mx")).head()
    if (b.isNullAt(0)) return gapFill(df, byCol, timeCol, tieCol, valueCol)
    val (tmin, tmax) = (b.getLong(0), b.getLong(1))
    val width = math.max(1L, (tmax - tmin) / nChunks + 1)
    // monotone chunk map — same boundary-rounding argument as the as-of
    val chunkC = ((tl - tmin) / width).cast("int")
    val dfc = df.withColumn("__chunk", chunkC).withColumn("__is_seed", lit(false))
    // last non-null observation per (entity, chunk): struct max ordered by
    // (time, tie) — exactly the window's carry order
    val summ = dfc
      .groupBy(col(byCol), col("__chunk"))
      .agg(
        max(
          when(
            col(valueCol).isNotNull,
            struct(col(timeCol).as("t"), col(tieCol).as("tb"), col(valueCol).as("v"))
          )
        ).as("__obs")
      )
      .filter(col("__obs").isNotNull)
    // lead default nChunks (not nChunks − 1): same lossy-chunk-map guard
    // as asofBackwardChunked — a > 2^53-span row can round into chunk ==
    // nChunks and must still sit inside the seeded range
    val wNext = Window.partitionBy(col(byCol)).orderBy(col("__chunk").asc_nulls_first)
    val seeds0 = summ
      .withColumn("__next", lead(col("__chunk"), 1, nChunks).over(wNext))
      .withColumn("__from", coalesce(col("__chunk") + 1, lit(0)))
      .filter(col("__next") >= col("__from"))
      .select(
        col(byCol),
        explode(sequence(col("__from"), col("__next"))).as("__chunk"),
        col("__obs.t").as(timeCol),
        col("__obs.tb").as(tieCol),
        col("__obs.v").as(valueCol)
      )
    val seedFull = seeds0.select(dfc.columns.map {
      case c if res(c, "__is_seed") => lit(true).as("__is_seed")
      case c if res(c, byCol) || res(c, timeCol) || res(c, tieCol) || res(c, valueCol) ||
        res(c, "__chunk") => col(c)
      case c => lit(null).cast(df.schema(c).dataType).as(c)
    }.toSeq: _*)
    val unioned = dfc.unionByName(seedFull)
    val w = Window
      .partitionBy(col(byCol), col("__chunk"))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = last(col(valueCol), ignoreNulls = true).over(w)
    unioned
      .withColumn(s"${valueCol}_filled", filled)
      .withColumn("was_filled", col(valueCol).isNull && filled.isNotNull)
      .filter(!col("__is_seed"))
      .drop("__chunk", "__is_seed")
  }

  /** [[asofNearest]] with the cost-model probe choosing the plan for
    * BOTH directional passes (they share the key distribution, so one
    * probe decides both). Same contract, same floors as
    * [[asofBackwardAuto]]; the flag is plan-only (spec-pinned).
    */
  def asofNearestAuto(
      left: DataFrame,
      right: DataFrame,
      byCol: String,
      timeCol: String,
      leftIdCol: String,
      hotShareThreshold: Double = 0.10,
      minHotRows: Long = 8000000L
  ): DataFrame =
    asofNearest(
      left,
      right,
      byCol,
      timeCol,
      leftIdCol,
      chunked = preferChunked(left, right, byCol, hotShareThreshold, minHotRows)
    )

  /** Cost-based auto-switch for [[gapFill]] — the [[asofBackwardAuto]]
    * precedent applied to the LOCF window: one ids-only partial-agg
    * probe measures the hottest entity's row share, and past
    * `hotShareThreshold` AND `minHotRows` (the same two-condition rule,
    * same absolute-mass floor) the fill routes through [[gapFillChunked]];
    * otherwise through the plain window. Entities whose time column is
    * not integral/timestamp always take the plain path (chunking needs a
    * numeric time axis). Both paths are spec-pinned row-identical, so
    * the switch only reshapes the exchanges.
    */
  def gapFillAuto(
      df: DataFrame,
      byCol: String,
      timeCol: String,
      tieCol: String,
      valueCol: String,
      hotShareThreshold: Double = 0.10,
      nChunks: Int = 64,
      minHotRows: Long = 8000000L
  ): DataFrame = {
    import org.apache.spark.sql.types._
    val chunkable = df.schema(timeCol).dataType match {
      case TimestampType | ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (chunkable && preferChunkedOne(df, byCol, hotShareThreshold, minHotRows))
      gapFillChunked(df, byCol, timeCol, tieCol, valueCol, nChunks)
    else gapFill(df, byCol, timeCol, tieCol, valueCol)
  }

  /** [[resample]] with the [[asofBackwardAuto]] cost model on the final
    * as-of merge: a monster entity (one key holding `hotShareThreshold`+
    * of rows AND `minHotRows` absolute) routes the grid fill through the
    * chunked merge; ordinary distributions keep the plain native path
    * (identical results either way, spec-pinned). The grid side is
    * uniform by construction (≤ span/every rows per key), so the probe
    * runs on the observation side only — no extra pass over the grid.
    */
  def resampleAuto(
      df: DataFrame,
      byCol: String,
      timeCol: String,
      every: String,
      valueCols: Seq[String],
      hotShareThreshold: Double = 0.10,
      nChunks: Int = 64,
      minHotRows: Long = 8000000L
  ): DataFrame = {
    val unit = every.split(" ")(1) match {
      case u if u.startsWith("hour")   => "hour"
      case u if u.startsWith("minute") => "minute"
      case u if u.startsWith("day")    => "day"
      case u => throw new IllegalArgumentException(s"unsupported grid unit '$u'")
    }
    val grid = df
      .groupBy(col(byCol))
      .agg(
        date_trunc(unit, min(col(timeCol))).as("_mn"),
        max(col(timeCol)).as("_mx")
      )
      .select(
        col(byCol),
        explode(sequence(col("_mn"), col("_mx"), expr(s"interval $every"))).as(timeCol)
      )
    val right = df.select((byCol +: timeCol +: valueCols).map(col): _*)
    if (preferChunkedOne(right, byCol, hotShareThreshold, minHotRows))
      asofBackwardChunked(grid, right, byCol, timeCol, nChunks)
    else asofBackwardNative(grid, right, byCol, timeCol)
  }

  /** Range join: pairs (l, r) with `r.point` in [l.lower, l.upper).
    * Bucketized: both sides explode to coarse buckets of width
    * `bucketWidth`, equi-join on (key?, bucket), then the exact range
    * predicate refines. Turns an O(|L|·|R|) theta join into a hash join
    * whose fan-out is interval_width / bucketWidth — pick bucketWidth near
    * the typical interval length.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      lower: String,
      upper: String,
      point: String,
      bucketWidth: Long
  ): DataFrame = {
    // floor(upper/width) may include one empty extra bucket when `upper`
    // sits exactly on a boundary — harmless (the exact predicate refines),
    // and correct for fractional bounds where `upper - 1` would not be.
    val l = left.withColumn(
      "_bucket",
      explode(sequence(floor(col(lower) / bucketWidth), floor(col(upper) / bucketWidth)))
    )
    val r = right.withColumn("_bucket", floor(col(point) / bucketWidth))
    l.join(r, Seq("_bucket"))
      .filter(col(point) >= col(lower) && col(point) < col(upper))
      .drop("_bucket")
  }
}
