package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Multimodal, Pipeline, TextOps}

/** Unit coverage for the remaining operators: pipeline row transforms,
  * as-of/range join, text analysis, multimodal plumbing.
  */
class OperatorSpec extends SparkTestBase {

  import spark.implicits._

  test("dispatch: heartbeat/dyn branches; strict mode raises on unknown (O-10)") {
    val df = Seq(0, 1).toDF("t")
    val got = df.select(Pipeline.dispatch(col("t")).as("b")).as[String].collect().toSeq
    assert(got == Seq("heartbeat", "dyn_message"))
    val bad = Seq(7).toDF("t").select(Pipeline.dispatch(col("t")).as("b"))
    assertThrows[Exception](bad.collect())
    val lenient = Seq(7).toDF("t").select(Pipeline.dispatch(col("t"), strict = false).as("b"))
    assert(lenient.as[String].collect().toSeq == Seq("unsupported"))
  }

  test("heartbeat envelope matches reference shape (O-11, handler.cpp:168-181)") {
    val df = Seq((72L, 5L, 1700L)).toDF("c", "s", "t")
    val env = Pipeline.heartbeatEnvelope(df, col("c"), col("s"), col("t")).collect()(0)
    assert(new String(env.getAs[Array[Byte]]("key"), "UTF-8") == "72")
    assert(env.getAs[Map[String, String]]("properties") == Map("type" -> "heartbeat"))
    assert(new String(env.getAs[Array[Byte]]("payload"), "UTF-8") == "client_id=72 sequence=5 epoch=1700")
  }

  test("batch fanOut writes every sink and ANDs success (O-7, cache.hpp:65-76)") {
    val df = Seq(1, 2, 3).toDF("v")
    var counts = Vector.empty[Long]
    val ok = Pipeline.fanOut(df, Map(
      "a" -> (b => { counts :+= b.count(); true }),
      "b" -> (b => { counts :+= b.count(); true })
    ))
    assert(ok && counts == Vector(3L, 3L))
    val fail = Pipeline.fanOut(df, Map("a" -> (_ => true), "bad" -> (_ => false)))
    assert(!fail)
  }

  test("asof backward join: picks latest right ≤ left ts, equal-ts visible") {
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3")).toDF("k", "t", "lv")
    val right = Seq((1L, 90L, "r1"), (1L, 200L, "r2"), (2L, 60L, "r3")).toDF("k", "t", "rv")
    val got = AsOfJoin
      .asofBackward(left, right, "k", "t")
      .select(col("lv"), col("rv"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
      .toSet
    assert(got == Set(("l1", Some("r1")), ("l2", Some("r2")), ("l3", None)))
  }

  test("asof backward join: a NULL in one right value column does not resurrect stale values") {
    // right rows (t=1: price=5, qty=2) then (t=2: price=null, qty=9);
    // asof attaches the whole most-recent ROW, so left@t=3 must see
    // (null, 9), never the chimera (5, 9)
    val left = Seq((1L, 3L, "l")).toDF("k", "t", "lv")
    val right = Seq((1L, 1L, Some(5L), 2L), (1L, 2L, None, 9L)).toDF("k", "t", "price", "qty")
    val got = AsOfJoin
      .asofBackward(left, right, "k", "t")
      .select(col("price"), col("qty"))
      .collect()(0)
    assert(got.isNullAt(0) && got.getLong(1) == 9L)
  }

  test("asofBackwardNative: plans the custom merge operator and is row-identical to the composition") {
    import spark.implicits._
    // randomized equality: 40 keys, irregular times, right gaps, ties at
    // equal timestamps, keys with no right rows, null value columns
    val rnd = new scala.util.Random(11)
    val left = (0 until 400).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong, s"l$i")
    }.toDF("k", "t", "lv")
    val right = (0 until 300).map { i =>
      (rnd.nextInt(30).toLong, rnd.nextInt(1000).toLong,
        if (i % 7 == 0) None else Some(i.toLong), s"r$i")
    }.toDF("k", "t", "price", "tag")
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("t"), col("lv"), col("price"), col("tag"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), Option(r.getString(4))))
        .sortBy(x => (x._1, x._2, x._3))
        .toSeq
    val composed = rowsOf(AsOfJoin.asofBackward(left, right, "k", "t"))
    val native = AsOfJoin.asofBackwardNative(left, right, "k", "t")
    assert(
      native.queryExecution.optimizedPlan.exists(_.isInstanceOf[graft.plans.AsOfJoinNode]),
      "native as-of did not keep AsOfJoinNode in the optimized plan"
    )
    assert(rowsOf(native) == composed, "native as-of diverged from the composition")
    // the custom physical operator actually executed (unwrap AQE)
    val exec = native.queryExecution.executedPlan
    assert(
      planExists(exec)(_.isInstanceOf[graft.plans.AsOfJoinExec]),
      s"native as-of did not execute AsOfJoinExec:\n$exec"
    )
    // the whole-row carry contract holds natively too (no chimera rows)
    val l2 = Seq((1L, 3L, "l")).toDF("k", "t", "lv")
    val r2 = Seq((1L, 1L, Some(5L), 2L), (1L, 2L, None, 9L)).toDF("k", "t", "price", "qty")
    val got = AsOfJoin.asofBackwardNative(l2, r2, "k", "t").select(col("price"), col("qty")).collect()(0)
    assert(got.isNullAt(0) && got.getLong(1) == 9L)
    // self-as-of (same source both sides) resolves without ambiguity
    val src = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k", "t", "v")
    val selfN = AsOfJoin.asofBackwardNative(
      src.select(col("k"), col("t")), src.withColumnRenamed("v", "w"), "k", "t")
    assert(selfN.collect().length == 2)
    // NON-NULLABLE right value columns: the no-match row must surface
    // NULL, not a garbage zero (the projection must null-check even when
    // the right attribute is nullable=false — regression: resample's
    // before-first-observation grid point read Some(0.0))
    val l3 = Seq((1L, 5L, "early")).toDF("k", "t", "lv") // before any right row
    val r3 = Seq((1L, 10L, 7.0)).toDF("k", "t", "m") // m is nullable=false
    val row3 = AsOfJoin.asofBackwardNative(l3, r3, "k", "t").select(col("m")).collect()(0)
    assert(row3.isNullAt(0), s"no-match must be NULL, got ${row3.get(0)}")
  }

  test("asofBackwardChunked: row-identical to the composition across chunk counts, gaps, and hot keys") {
    import spark.implicits._
    // randomized equality incl. a HOT key (30% of left rows on key 0 —
    // the monster-key regime the operator exists for), right-side chunk
    // gaps (seeds must carry across empty chunks), keys with no right
    // rows, null value columns, and null times/keys. Right (k, t) pairs
    // are unique so the tie-ambiguous carry cannot differ between paths.
    val rnd = new scala.util.Random(17)
    val left = (0 until 600).map { i =>
      val k = if (i % 10 < 3) 0L else rnd.nextInt(40).toLong
      (k, rnd.nextInt(100000).toLong, s"l$i")
    } ++ Seq((99L, 5L, "nullkeyless")) // key with no right rows
    val right = (0 until 400).map { i =>
      // cluster right times to create empty chunks between clusters
      val base = (i % 4) * 25000L
      (rnd.nextInt(30).toLong, base + rnd.nextInt(3000).toLong,
        if (i % 7 == 0) None else Some(i.toLong), s"r$i")
    }.distinct.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val lDf = left.toDF("k", "t", "lv")
    val rDf = right.toDF("k", "t", "price", "tag")
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("t"), col("lv"), col("price"), col("tag"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), Option(r.getString(4))))
        .sortBy(x => (x._1, x._2, x._3))
        .toSeq
    val composed = rowsOf(AsOfJoin.asofBackward(lDf, rDf, "k", "t"))
    for (nChunks <- Seq(1, 3, 16, 200)) {
      val chunked = AsOfJoin.asofBackwardChunked(lDf, rDf, "k", "t", nChunks)
      assert(
        rowsOf(chunked) == composed,
        s"chunked(nChunks=$nChunks) diverged from the composition"
      )
    }
    // the chunked path still executes the native merge operator
    val q = AsOfJoin.asofBackwardChunked(lDf, rDf, "k", "t", 8)
    assert(
      planExists(q.queryExecution.executedPlan)(_.isInstanceOf[graft.plans.AsOfJoinExec]),
      "chunked as-of did not execute AsOfJoinExec"
    )
    // null keys and null times group exactly like the composition
    val lN = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"), (Some(1L), None, "c"))
      .toDF("k", "t", "lv")
    val rN = Seq((Some(1L), Some(5L), "r1"), (None, Some(5L), "r2"), (Some(1L), None, "r3"))
      .toDF("k", "t", "rv")
    def rowsN(d: org.apache.spark.sql.DataFrame) =
      d.select(col("lv"), col("rv")).collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(
      rowsN(AsOfJoin.asofBackwardChunked(lN, rN, "k", "t", 4)) ==
        rowsN(AsOfJoin.asofBackward(lN, rN, "k", "t")),
      "null key/time grouping diverged"
    )
    // timestamps chunk via unix_micros and stay timestamps in the merge
    val lt = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "x"))
      .toDF("k", "t", "lv")
    val rt = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "early"),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), "late")
    ).toDF("k", "t", "rv")
    val g = AsOfJoin.asofBackwardChunked(lt, rt, "k", "t", 4).select(col("rv")).collect()(0)
    assert(g.getString(0) == "early")
    // empty right: all-null carry, no crash on the bounds job
    val gEmpty = AsOfJoin
      .asofBackwardChunked(lDf, rDf.limit(0), "k", "t", 4)
      .select(col("price"))
      .collect()
    assert(gEmpty.forall(_.isNullAt(0)))
  }

  test("asofBackwardAuto: probe picks chunked on a hot key, plain on uniform; results identical") {
    import spark.implicits._
    val uniform = (0 until 400).map(i => (i.toLong % 100, i.toLong, s"l$i")).toDF("k", "t", "lv")
    val hot = (0 until 400).map { i =>
      (if (i % 2 == 0) 0L else i.toLong % 100, i.toLong, s"l$i")
    }.toDF("k", "t", "lv")
    val right = (0 until 100).map(i => (i.toLong % 50, i.toLong * 3, s"r$i")).toDF("k", "t", "rv")
    assert(!AsOfJoin.preferChunked(uniform, right, "k", 0.10, minHotRows = 0L), "uniform must stay plain")
    assert(AsOfJoin.preferChunked(hot, right, "k", 0.10, minHotRows = 0L), "50%-hot key must switch")
    // absolute-mass floor: the same hot SHARE below minHotRows stays plain
    assert(!AsOfJoin.preferChunked(hot, right, "k", 0.10), "tiny hot key must not switch at the default floor")
    // the switch is invisible to results
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("t"), col("lv"), col("rv")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3)))).toSet
    assert(
      rowsOf(AsOfJoin.asofBackwardAuto(hot, right, "k", "t")) ==
        rowsOf(AsOfJoin.asofBackwardNative(hot, right, "k", "t"))
    )
    // empty sides probe to 0 share, never divide by zero
    assert(!AsOfJoin.preferChunked(uniform.limit(0), right.limit(0), "k", 0.10, minHotRows = 0L))
  }

  test("probe tiers: head-sample decision parity with the exact probe on both skew regimes") {
    // frames big enough to TRUNCATE the head sample (> partitions ×
    // ProbePerPartition), so the sampled tier actually decides/falls back
    val parts = spark.sparkContext.defaultParallelism
    val n = (parts.toLong * AsOfJoin.ProbePerPartition * 3).max(300000L)
    val uniform = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1000L)).as("k"), col("id").as("t"))
    val hot = spark.range(n).select(
      when(pmod(xxhash64(col("id"), lit(7)), lit(100L)) < 30, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(1000L))).as("k"),
      col("id").as("t"))
    for ((df, name) <- Seq((uniform, "uniform"), (hot, "hot"))) {
      AsOfJoin.ProbeCache.clear()
      val (mxS, totS, trunc) = AsOfJoin.headSampleProbe(df, "k")
      assert(trunc, s"$name: sample must truncate at n=$n (sampled $totS)")
      assert(totS > 0 && mxS <= totS)
      val (mxE, totE) = AsOfJoin.exactHotProbe(df, "k")
      val exactDecision = mxE >= 1000L && mxE.toDouble / totE > 0.10
      AsOfJoin.ProbeCache.clear()
      val tiered = AsOfJoin.preferChunkedOne(df, "k", 0.10, minHotRows = 1000L)
      assert(tiered == exactDecision, s"$name: tiered=$tiered exact=$exactDecision")
    }
  }

  test("probe cache: N auto probes on an unchanged frame run jobs exactly once") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // listener events are async: read the counter only once it has been
    // stable for a few polls
    def settled(): Int = {
      var prev = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val cur = jobs.get()
        if (cur == prev) stable += 1 else stable = 0
        prev = cur
      }
      prev
    }
    val df = spark.range(400000L).select(
      pmod(xxhash64(col("id")), lit(1000L)).as("k"), col("id").as("t"))
    spark.sparkContext.addSparkListener(listener)
    try {
      AsOfJoin.ProbeCache.clear()
      val d1 = AsOfJoin.preferChunkedOne(df, "k", 0.10, minHotRows = 0L)
      val after1 = settled()
      assert(after1 >= 1, "first probe must run at least one job")
      // second and third calls — same frame, same column: cache hits, ZERO jobs
      val d2 = AsOfJoin.preferChunkedOne(df, "k", 0.10, minHotRows = 0L)
      val d3 = AsOfJoin.preferChunkedOne(df, "k", 0.25, minHotRows = 0L)
      val after3 = settled()
      assert(d1 == d2, "cached decision diverged")
      assert(after3 == after1, s"repeat probes ran ${after3 - after1} extra jobs")
      // d3 re-derives from the CACHED stats under a different threshold
      assert(!d3 || d1, "a stricter threshold cannot flip uniform to hot")
      // TTL invalidation (r14 advice): with the horizon at 0 ms every
      // entry is stale on arrival, so the next call re-probes — a
      // long-lived session whose data was overwritten under the same
      // plan cannot keep the wrong routing forever
      System.setProperty("graft.asof.probe.ttlMs", "0")
      try {
        val d4 = AsOfJoin.preferChunkedOne(df, "k", 0.10, minHotRows = 0L)
        val after4 = settled()
        assert(d4 == d1, "re-probed decision diverged on unchanged data")
        assert(after4 > after3, "expired entry did not re-probe")
      } finally System.clearProperty("graft.asof.probe.ttlMs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("asofBackwardChunked: a null-time-only predecessor seeds its ACTUAL values across chunks") {
    import spark.implicits._
    // regression (ADVICE r12): the summary used max_by(struct, t), which
    // skips null-ordering rows — a key whose only right rows in the null
    // chunk have null time summarized to NULL and its seeds carried
    // all-null values into later chunks. The plain merge (nulls first)
    // carries the row's actual values, so for a left row whose latest
    // match IS a null-time right row the chunked path silently nulled.
    val left = Seq(
      (1L, Some(5L), "early"), // chunk 0: only predecessor is the null-time row
      (1L, Some(999999L), "late") // last chunk: non-null right row masks the seed
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, None: Option[Long], Some(42L), "nullrow"), // null time — sorts first
      (1L, Some(900000L), Some(7L), "real")
    ).toDF("k", "t", "price", "tag")
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.select(col("lv"), col("price"), col("tag")).collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
          Option(r.getString(2)))).toSet
    val plain = rowsOf(AsOfJoin.asofBackward(left, right, "k", "t"))
    assert(plain == Set(("early", Some(42L), Some("nullrow")), ("late", Some(7L), Some("real"))))
    for (nChunks <- Seq(2, 8, 64))
      assert(
        rowsOf(AsOfJoin.asofBackwardChunked(left, right, "k", "t", nChunks)) == plain,
        s"chunked($nChunks) lost the null-time predecessor's values"
      )
    // forward twin rides the same summary; pin it too: the only match at
    // or after t=5 for a key whose sole right row has null time is NONE
    // (null times are never >= a real time), but a mixed key must still
    // chunk without the null summary poisoning real seeds
    val fwdL = Seq((1L, 5L, "l0")).toDF("k", "t", "lv")
    val fwdR = Seq((1L, None: Option[Long], Some(1L)), (1L, Some(7L), Some(2L)))
      .toDF("k", "t", "price")
    val fwd = AsOfJoin.asofForwardChunked(fwdL, fwdR, "k", "t", 4)
      .select(col("price")).collect()(0)
    assert(fwd.getLong(0) == 2L)
  }

  test("planeAHash: 128-bit cross-multiply — no overflow flip on giant planes") {
    // prodGt against a BigInt reference, including products past 2^63
    val vals = Seq(0L, 1L, 255L, 1L << 31, (1L << 62) / 255, 3L * 100000000L,
      255L * 150000000L, Long.MaxValue / 3)
    for (a <- vals; b <- vals; c <- vals; d <- vals) {
      val expected = BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)
      assert(
        Multimodal.prodGt(a, b, c, d) == expected,
        s"prodGt($a,$b,$c,$d) != BigInt reference"
      )
    }
    // end-to-end: a 300 MB two-block plane where the old s*n compare
    // overflows negative and dropped bit 0 (block 0 all 0xff: mean 255 >
    // global 127.5 — bit 0 MUST set; block 1 all zero — bit 1 must not)
    val n = 300000000
    val plane = new Array[Byte](n)
    java.util.Arrays.fill(plane, 0, n / 2, 0xff.toByte)
    assert(Multimodal.planeAHash(plane, 2) == 1L, "giant-plane bit flipped by overflow")
  }

  test("gapFillChunked + asofForwardChunked: row-identical to the plain forms across chunk counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // gapFill twin: hot entity (40% of rows on key 0), sparse non-null
    // values, clustered times (empty chunks between), null times
    val rows = (0 until 800).map { i =>
      val k = if (i % 10 < 4) 0L else rnd.nextInt(25).toLong
      val t: Option[Long] = Some((i % 3) * 40000L + rnd.nextInt(5000))
      (k, t, i.toLong, if (rnd.nextInt(4) == 0) Some(rnd.nextInt(100).toDouble) else None)
    } ++ Seq(
      (0L, Some(1L), 9001L, None),
      (7L, Some(2L), 9002L, Some(5.0)),
      // null times: group first in the plain window; their observations
      // must seed every real chunk of the key in the chunked form
      (3L, None, 9003L, Some(42.0)),
      (3L, None, 9004L, None)
    )
    val df = rows.toDF("k", "t", "tie", "v")
    def normalize(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("t"), col("tie"), col("v"), col("v_filled"), col("was_filled"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
          r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)))
        .sortBy(x => (x._1, x._2, x._3))
        .toSeq
    val plain = normalize(AsOfJoin.gapFill(df, "k", "t", "tie", "v"))
    for (nChunks <- Seq(1, 4, 32)) {
      val chunked = normalize(AsOfJoin.gapFillChunked(df, "k", "t", "tie", "v", nChunks))
      assert(chunked == plain, s"gapFillChunked($nChunks) diverged from gapFill")
    }
    // forward twin: same construction as the backward chunked fuzz
    val left = (0 until 300).map { i =>
      (if (i % 5 == 0) 0L else rnd.nextInt(20).toLong, rnd.nextInt(50000).toLong, s"l$i")
    }.toDF("k", "t", "lv")
    val right = (0 until 200).map { i =>
      (rnd.nextInt(15).toLong, rnd.nextInt(50000).toLong, s"r$i")
    }.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq.toDF("k", "t", "rv")
    def fwdRows(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("t"), col("lv"), col("rv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3))))
        .sortBy(x => (x._1, x._2, x._3))
        .toSeq
    val fwdPlain = fwdRows(AsOfJoin.asofForward(left, right, "k", "t"))
    for (nChunks <- Seq(1, 8, 64)) {
      assert(
        fwdRows(AsOfJoin.asofForwardChunked(left, right, "k", "t", nChunks)) == fwdPlain,
        s"asofForwardChunked($nChunks) diverged"
      )
    }
    // nearest with chunked passes == nearest with plain passes
    val lId = left.withColumn("id", monotonically_increasing_id())
    def nearRows(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("rv")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(
      nearRows(AsOfJoin.asofNearest(lId, right, "k", "t", "id", chunked = true)) ==
        nearRows(AsOfJoin.asofNearest(lId, right, "k", "t", "id")),
      "chunked nearest diverged from plain nearest"
    )
  }

  test("gapFillAuto / resampleAuto: probe routes hot vs uniform, results identical on both regimes") {
    import spark.implicits._
    def mk(hot: Boolean) = (0 until 400).map { i =>
      val k = if (hot && i % 2 == 0) 0L else i.toLong % 50
      (k, Some((i * 37 % 5000).toLong), i.toLong,
        if (i % 3 == 0) Some(i.toDouble) else None)
    }.toDF("k", "t", "tie", "v")
    val uniform = mk(hot = false)
    val hot = mk(hot = true)
    assert(!AsOfJoin.preferChunkedOne(uniform, "k", 0.10, minHotRows = 0L), "uniform must stay plain")
    assert(AsOfJoin.preferChunkedOne(hot, "k", 0.10, minHotRows = 0L), "50%-hot entity must switch")
    assert(!AsOfJoin.preferChunkedOne(hot, "k", 0.10), "tiny hot entity must not switch at the default floor")
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("t"), col("tie"), col("v_filled"), col("was_filled"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
        .sortBy(x => (x._1, x._2, x._3)).toSeq
    // the switch is invisible to results on BOTH regimes
    for (d <- Seq(uniform, hot))
      assert(
        norm(AsOfJoin.gapFillAuto(d, "k", "t", "tie", "v", minHotRows = 0L)) ==
          norm(AsOfJoin.gapFill(d, "k", "t", "tie", "v"))
      )
    // non-chunkable time type: auto degrades to the plain window, no throw
    val strT = Seq((1L, "2024-01-01", 1L, Option.empty[Double]),
      (1L, "2024-01-02", 2L, Some(5.0))).toDF("k", "t", "tie", "v")
    assert(AsOfJoin.gapFillAuto(strT, "k", "t", "tie", "v", minHotRows = 0L).count() == 2)
    // resampleAuto: same grid + fill as resample on both regimes
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val obs = (0 until 200).map { i =>
      val k = if (i % 2 == 0) 1L else (i % 7).toLong + 2
      (k, ts(f"2024-01-01 ${i % 24}%02d:${(i * 13) % 60}%02d:00"), i.toDouble)
    }.toDF("k", "t", "m")
    def normR(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("t"), col("m")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .sortBy(x => (x._1, x._2)).toSeq
    for (floor <- Seq(0L, 8000000L)) // hot-routed and plain-routed
      assert(
        normR(AsOfJoin.resampleAuto(obs, "k", "t", "1 hour", Seq("m"), minHotRows = floor)) ==
          normR(AsOfJoin.resample(obs, "k", "t", "1 hour", Seq("m"))),
        s"resampleAuto(floor=$floor) diverged from resample"
      )
    // asofNearestAuto: one probe decides both directional passes; the
    // route (chunked at floor 0 — every 20%-share key trips; plain at
    // the default floor) is invisible to results
    val nl = (0 until 100).map(i => (i.toLong % 5, i.toLong * 7, i.toLong)).toDF("k", "t", "lid")
    val nr = (0 until 40).map(i => (i.toLong % 5, i.toLong * 11, s"r$i")).toDF("k", "t", "rv")
    def nRows(d: org.apache.spark.sql.DataFrame) =
      d.select(col("lid"), col("rv")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val nearestPlain = nRows(AsOfJoin.asofNearest(nl, nr, "k", "t", "lid"))
    for (floor <- Seq(0L, 8000000L))
      assert(
        nRows(AsOfJoin.asofNearestAuto(nl, nr, "k", "t", "lid", minHotRows = floor)) ==
          nearestPlain,
        s"asofNearestAuto(floor=$floor) diverged from asofNearest"
      )
  }

  test("asofForward: earliest right >= left ts per key; equal-ts visible; timestamps negate safely") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3")).toDF("k", "t", "lv")
    val right = Seq((1L, 100L, "r0"), (1L, 150L, "r2"), (2L, 40L, "r3")).toDF("k", "t", "rv")
    val got = AsOfJoin.asofForward(left, right, "k", "t")
      .select(col("lv"), col("rv"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // l1@100: r0@100 (equal ts visible, earliest); l2@200: none after; l3@50: none after
    assert(got == Set(("l1", Some("r0")), ("l2", None), ("l3", None)))
    // timestamp time column goes through unix_micros negation
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val lt = Seq((1L, ts(10), "a")).toDF("k", "t", "lv")
    val rt = Seq((1L, ts(20), "b"), (1L, ts(5), "c")).toDF("k", "t", "rv")
    val g2 = AsOfJoin.asofForward(lt, rt, "k", "t").select(col("rv")).collect()(0).getString(0)
    assert(g2 == "b")
  }

  test("asofNearest: closest side wins, backward wins exact ties, missing sides degrade") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, 100L), // b@90 (d=10) vs f@150 (d=50) -> backward r1
      (11L, 1L, 145L), // b@90 (d=55) vs f@150 (d=5)  -> forward r2
      (12L, 1L, 120L), // b@90 (d=30) vs f@150 (d=30) -> TIE -> backward r1
      (13L, 2L, 50L),  // only forward exists -> r3
      (14L, 3L, 50L)   // no right rows at all -> null
    ).toDF("id", "k", "t")
    val right = Seq((1L, 90L, "r1"), (1L, 150L, "r2"), (2L, 60L, "r3")).toDF("k", "t", "rv")
    val got = AsOfJoin
      .asofNearest(left, right, "k", "t", "id")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("rv")))
      .toMap
    assert(got == Map(
      10L -> Some("r1"), 11L -> Some("r2"), 12L -> Some("r1"),
      13L -> Some("r3"), 14L -> None
    ), s"nearest picks wrong side: $got")
    // a NULL left id would silently vanish through the recombination
    // joins — the operator must raise instead of dropping the row
    val nullId = Seq((Option.empty[Long], 1L, 100L), (Some(1L), 1L, 100L)).toDF("id", "k", "t")
    val e = intercept[Exception] {
      AsOfJoin.asofNearest(nullId, right, "k", "t", "id").collect()
    }
    val m = Option(e.getMessage).getOrElse("") + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(m.contains("asofNearest") || m.toLowerCase.contains("assert"), s"wrong error: $e")
  }

  test("asofNearest fuzz: matches a driver-side brute-force reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val left = (0 until 300).map(i => (i.toLong, rnd.nextInt(25).toLong, rnd.nextInt(500).toLong))
    val right = (0 until 200).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(500).toLong, s"r$i"))
    // brute force: per left row, min |rt-lt|; backward (rt <= lt) wins ties;
    // among equal (key,time,distance) rights the engine carries the LAST in
    // sort order — mirror by picking max tag among the tied winners
    val expected = left.map { case (id, k, t) =>
      val cands = right.filter(_._1 == k)
      if (cands.isEmpty) id -> None
      else {
        val best = cands.map { case (_, rt, tag) =>
          (math.abs(rt - t), if (rt <= t) 0 else 1, rt, tag)
        }.sorted.headOption.map(_._1)
        val winners = cands
          .map { case (_, rt, tag) => (math.abs(rt - t), if (rt <= t) 0 else 1, rt, tag) }
          .filter(c => best.contains(c._1))
        val side = winners.map(_._2).min // backward if any backward at best distance
        val sameSide = winners.filter(_._2 == side)
        // engine tie-break within a side at the same (key, time): last in
        // (key,time) sort order = undefined among equal times; restrict the
        // fuzz to assert the DISTANCE+SIDE contract, not the tag identity
        id -> Some((best.get, side, sameSide.map(_._3).distinct.size))
      }
    }.toMap
    val got = AsOfJoin
      .asofNearest(
        left.toDF("id", "k", "t"),
        right.toDF("k", "t", "rv"),
        "k",
        "t",
        "id"
      )
      .join(right.toDF("k2", "rt", "rv2"), col("rv") === col("rv2"), "left")
      .select(col("id"), col("t"), col("rv"), col("rt"))
      .collect()
      .map { r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None
                         else {
                           val (t, rt) = (r.getLong(1), r.getLong(3))
                           Some((math.abs(rt - t), if (rt <= t) 0 else 1))
                         })
      }
      .toMap
    expected.foreach { case (id, exp) =>
      (exp, got(id)) match {
        case (None, g) => assert(g.isEmpty, s"row $id: expected no match, got $g")
        case (Some((d, side, _)), g) =>
          assert(g.contains((d, side)), s"row $id: expected (dist=$d, side=$side), got $g")
      }
    }
  }

  test("range join: containment with overlapping intervals, no cross product") {
    val intervals = Seq((1L, 0.0, 10.0), (2L, 5.0, 15.0)).toDF("iid", "lo", "hi")
    val points = Seq((100L, 7.0), (101L, 12.0), (102L, 20.0)).toDF("pid", "p")
    val got = AsOfJoin
      .rangeJoin(intervals, points, "lo", "hi", "p", 5L)
      .select(col("iid"), col("pid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 100L), (2L, 100L), (2L, 101L)))
  }

  test("text ops: token counts, langid markers, fingerprints deterministic") {
    val df = Seq(
      (1L, "the cat and the dog"),
      (2L, "el gato y la casa de la playa"),
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val got = df
      .select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n"),
        TextOps.langId(col("text")).as("lang"),
        TextOps.fingerprintRolling(col("text")).as("fp")
      )
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got(0)._2 == 5 && got(0)._3 == "en")
    assert(got(1)._3 == "es")
    assert(got(2)._3 == "und")
    // deterministic across runs
    val again = df.select(TextOps.fingerprintRolling(col("text"))).as[Long].collect()
    assert(again.toSeq == got.map(_._4).toSeq)
  }

  test("scoreLinearHashed: matches an independent JVM reimplementation, gate flips on threshold") {
    val weights = Array.tabulate(TextOps.hashedFeatureDim)(b => (b.toLong * 2654435761L) % 1001L - 500L)
    // independent expectation: java MessageDigest, no Spark expressions
    def bucket(tok: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 3), 16)
    }
    val docs = Seq(
      (1L, "the cat and the dog"),
      (2L, "el gato y la casa de la playa"),
      (3L, "xyzzy")
    )
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val score = toks.map(t => weights(bucket(t))).sum
      (id, toks.length.toLong, score, score >= 0L)
    }.toSet
    val got = TextOps
      .scoreLinearHashed(docs.toDF("doc_id", "text"), col("doc_id"), col("text"), weights)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == expected)
    // a threshold above every score keeps nothing
    val none = TextOps
      .scoreLinearHashed(docs.toDF("doc_id", "text"), col("doc_id"), col("text"), weights, threshold = Long.MaxValue)
      .filter(col("kept"))
      .count()
    assert(none == 0L)
    // NULL-text docs are NOT dropped: they score (0 tokens, 0) — the
    // one-row-per-doc contract the other curation operators uphold
    val withNull = docs :+ (4L, null.asInstanceOf[String])
    val nulled = TextOps
      .scoreLinearHashed(withNull.toDF("doc_id", "text"), col("doc_id"), col("text"), weights)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(nulled == expected + ((4L, 0L, 0L, true)))
  }

  test("trainLinearHashed: e2e train -> quantize -> gate on planted separable data") {
    // label-1 docs carry 'signalgood' tokens, label-0 docs 'signalbad';
    // shared filler makes the problem non-trivial but linearly separable
    val docs = (0 until 300).map { i =>
      val fill = s"the a of and doc$i"
      if (i % 2 == 0) (i.toLong, s"signalgood signalgood quality text here $fill", 1)
      else (i.toLong, s"signalbad spammy junk content $fill", 0)
    }
    val df = docs.toDF("doc_id", "text", "y")
    val w = TextOps.trainLinearHashed(df, col("doc_id"), col("text"), col("y"), epochs = 30, lr = 2.0)
    assert(w.length == TextOps.hashedFeatureDim)
    // the learned weights, quantized, drive the integer inference gate
    val q = TextOps.quantizeWeights(w, factor = 10000.0)
    val scored = TextOps
      .scoreLinearHashed(df, col("doc_id"), col("text"), q, threshold = 0L)
      .join(df.select(col("doc_id").as("id"), col("y")), "id")
      .collect()
      .map(r => (r.getAs[Boolean]("kept"), r.getAs[Int]("y")))
    val acc = scored.count { case (kept, y) => kept == (y == 1) }.toDouble / scored.length
    assert(acc >= 0.95, s"train->quantize->gate accuracy: $acc")
  }

  test("multimodal: stub decode keeps real histogram features, frame sampling shapes") {
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijkl", "en", "src1", 48L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.fromDocuments(spark, docs)
    val dec = Multimodal.decode(media).collect()(0)
    assert(dec.byte_len == 48 && dec.channels == 3)
    assert(math.abs(dec.features.sum - 1.0f) < 1e-5) // L1-normalized histogram
    val resized = Multimodal.resizeDataset(media, 4).collect()(0)
    assert(resized.content.length == 12) // 48 bytes / 4
    assert(resized.content(1) == 'e'.toByte) // byte at original offset 4
    val frames = Multimodal
      .sampleFrames(media.toDF(), "content", frameSize = 16, stride = 2)
      .select(col("frame_idx"), length(col("frame")).as("len"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)))
      .toSet
    assert(frames == Set((0, 16), (2, 16))) // 3 frames of 16B, stride 2 keeps 0 and 2

    // uniform block semantics: content shorter than one frame yields no
    // frames (no phantom partial block), tails below frameSize drop
    val short = Seq((2L, "tiny", "en", "src1", 4L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val none = Multimodal
      .sampleFrames(Multimodal.fromDocuments(spark, short).toDF(), "content", frameSize = 16, stride = 1)
      .count()
    assert(none == 0L)
  }

  test("decodeWav: real javax.sound decode — sample-exact round trip, stereo, 8-bit, fuzz-safe") {
    // 16-bit mono: decoded samples == the synthesis formula, count/rate exact
    for (seed <- Seq(0L, 7L, 123456789L)) {
      val n = 200 + (seed % 37).toInt
      val wav = Multimodal.syntheticWav(seed, n, sampleRate = 8000)
      val Some((rate, ch, samples)) = Multimodal.decodeWav(wav)
      assert(rate == 8000 && ch == 1 && samples.length == n, s"seed $seed header mismatch")
      assert(
        samples.indices.forall(i => samples(i) == Multimodal.syntheticSample(seed, i)),
        s"seed $seed samples diverge from the formula"
      )
    }
    // stereo: interleaved samples survive in order
    val st = Multimodal.syntheticWav(5L, 64, sampleRate = 44100, channels = 2)
    val Some((r2, c2, s2)) = Multimodal.decodeWav(st)
    assert(r2 == 44100 && c2 == 2 && s2.length == 64)
    assert(s2.indices.forall(i => s2(i) == Multimodal.syntheticSample(5L, i)))
    // 8-bit unsigned, written via AudioSystem itself (an honest container
    // from the OTHER writer): decode recenters to signed x − 128
    val raw8 = Array.tabulate(100)(i => ((i * 37 + 5) % 256).toByte)
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw8), fmt8, raw8.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem
      .write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val Some((r3, c3, s3)) = Multimodal.decodeWav(baos.toByteArray)
    assert(r3 == 8000 && c3 == 1 && s3.length == 100)
    assert(s3.indices.forall(i => s3(i) == ((raw8(i) & 0xff) - 128).toShort))
    // fuzz: truncations, corrupt chunk sizes, non-RIFF — None or fewer
    // samples, NEVER a throw (the WarcSplit resync discipline)
    val base = Multimodal.syntheticWav(9L, 128)
    for (len <- Seq(0, 3, 11, 12, 43, 44, 45, 60, 100, base.length - 1)) {
      val out = Multimodal.decodeWav(java.util.Arrays.copyOf(base, len))
      assert(out.forall(_._3.length <= 128), s"truncation at $len produced phantom samples")
    }
    val rnd = new scala.util.Random(33)
    for (_ <- 0 until 200) {
      val corrupt = base.clone()
      val pos = rnd.nextInt(corrupt.length)
      corrupt(pos) = rnd.nextInt(256).toByte
      Multimodal.decodeWav(corrupt) // must not throw, whatever it parses to
    }
    assert(Multimodal.decodeWav("RIFFxxxxWAVE then garbage padding here".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeWav("just some text, definitely not audio data".getBytes).isEmpty)
    // giant declared frame count sheds (corrupt data-chunk length field)
    val giant = base.clone()
    giant(40) = 0xff.toByte; giant(41) = 0xff.toByte
    giant(42) = 0xff.toByte; giant(43) = 0x7f.toByte
    assert(Multimodal.decodeWav(giant).forall(_._3.length <= 128))
    // 24-bit PCM and IEEE-float WAV (the common real variants beyond
    // PCM16): hand-rolled writers, SAMPLE-EXACT decode pinned — 24-bit
    // keeps the top 16 bits (exact for the <<8 widening), float rounds
    // half-up from s/32768f. Never a silent wrong plane or wrong count.
    for (seed <- Seq(0L, 11L)) {
      val n = 150 + (seed % 13).toInt
      val want = Array.tabulate(n)(Multimodal.syntheticSample(seed, _))
      val w24 = Multimodal.wavFromSamples24(want, sampleRate = 22050)
      val Some((r24, c24, s24)) = Multimodal.decodeWav(w24)
      assert(r24 == 22050 && c24 == 1 && s24.length == n, s"24-bit header mismatch seed $seed")
      assert(s24.sameElements(want), s"24-bit decode not sample-exact at seed $seed")
      val wf = Multimodal.wavFromSamplesFloat(want, sampleRate = 48000)
      val Some((rf, cf, sf)) = Multimodal.decodeWav(wf)
      assert(rf == 48000 && cf == 1 && sf.length == n, s"float header mismatch seed $seed")
      assert(sf.sameElements(want), s"float decode not sample-exact at seed $seed")
    }
    // stereo 24-bit: interleaving preserved
    val st24 = Array.tabulate(80)(Multimodal.syntheticSample(3L, _))
    val Some((_, cSt, sSt)) = Multimodal.decodeWav(Multimodal.wavFromSamples24(st24, 16000, 2))
    assert(cSt == 2 && sSt.sameElements(st24))
    // fuzz the new layouts too: truncation/corruption never throws
    val f24 = Multimodal.wavFromSamples24(st24)
    val ff = Multimodal.wavFromSamplesFloat(st24)
    for (src <- Seq(f24, ff); len <- Seq(0, 20, 44, 47, src.length / 2, src.length - 1))
      Multimodal.decodeWav(java.util.Arrays.copyOf(src, len))
    for (_ <- 0 until 100) {
      val c = (if (rnd.nextBoolean()) f24 else ff).clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeWav(c)
    }
    // audioFrames routes WAV through the REAL decode: one 4-sample frame
    // of known samples yields the exact signed rms/mean
    import spark.implicits._
    val known = Array[Short](100, -200, 300, -400)
    val wavK = {
      val b = java.nio.ByteBuffer.allocate(44 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8).put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put("data".getBytes("US-ASCII")).putInt(8)
      known.foreach(b.putShort)
      b.array()
    }
    val media = Seq((1L, "audio/wav", wavK), (2L, "text/plain", "abcdefgh".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "content")
    val fr = Multimodal.audioFrames(media, frameSize = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSet
    val sqK = known.map(x => x.toLong * x).sum
    val smK = known.map(_.toLong).sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val textBytes = "abcd".getBytes("UTF-8").map(_.toLong & 0xff)
    val textBytes2 = "efgh".getBytes("UTF-8").map(_.toLong & 0xff)
    def fm(xs: Array[Long]) = (r6(math.sqrt(xs.map(x => x * x).sum.toDouble / 4)), r6(xs.sum.toDouble / 4))
    assert(fr == Set(
      (1L, 0, r6(math.sqrt(sqK.toDouble / 4)), r6(smK.toDouble / 4)),
      (2L, 0, fm(textBytes)._1, fm(textBytes)._2),
      (2L, 1, fm(textBytes2)._1, fm(textBytes2)._2)
    ), s"audioFrames routing mismatch: $fr")
  }

  test("decodeGifFrames/videoFrameHashes: lossless indexed round trip, planted edit, blocked == brute") {
    import spark.implicits._
    // round trip: every decoded frame's luma == the index plane from the
    // formula (gray g has BT.601 luma exactly g)
    for (seed <- Seq(1L, 42L)) {
      val (w, h, nf) = (32 + (seed % 5).toInt, 24, 5)
      val gif = Multimodal.syntheticGif(seed, w, h, nf)
      val Some(frames) = Multimodal.decodeGifFrames(gif)
      assert(frames.length == nf, s"seed $seed: frame count")
      for (k <- 0 until nf) {
        val (fw, fh, luma) = frames(k)
        assert(fw == w && fh == h)
        val expected = Array.tabulate(w * h)(i =>
          (Multimodal.syntheticPixel(Multimodal.frameSeed(seed, k), i % w, i / w) & 0xff).toByte)
        assert(java.util.Arrays.equals(luma, expected), s"seed $seed frame $k luma diverges")
      }
    }
    // fuzz: truncations and corruptions never throw; a cut tail yields
    // only the frames that did decode (never phantom extras)
    val gif4 = Multimodal.syntheticGif(3L, 16, 16, 4)
    for (len <- Seq(0, 5, 13, 50, gif4.length / 2, gif4.length - 1)) {
      val got = Multimodal.decodeGifFrames(java.util.Arrays.copyOf(gif4, len))
      assert(got.forall(_.length <= 4), s"truncation at $len produced phantom frames")
    }
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 100) {
      val corrupt = gif4.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeGifFrames(corrupt) // must not throw
    }
    assert(Multimodal.decodeGifFrames("GIF8 but not really a gif".getBytes).forall(_.nonEmpty))
    assert(Multimodal.decodeGifFrames("plain text".getBytes).isEmpty)
    // operator: stride-2 sampling keeps frames 0 and 2; non-GIF falls
    // back to raw 8-byte blocks hashed with planeAHash
    val media = Seq(
      Multimodal.MediaRow(1L, "video/gif", Multimodal.syntheticGif(9L, 20, 20, 3)),
      Multimodal.MediaRow(2L, "text/plain", "abcdefghijklmnopqrstuvwx".getBytes("UTF-8"))
    ).toDS()
    val sampled = Multimodal.videoFrameHashes(media, stride = 2, fallbackFrameSize = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(sampled == Set((1L, 0, 20, 20), (1L, 2, 20, 20), (2L, 0, 8, 1), (2L, 2, 8, 1)))
    // planted edit: the edited frame's hash differs from clean, all
    // other frames hash identically (the x171 contract)
    val clean = Multimodal.decodeGifFrames(Multimodal.syntheticGif(5L, 40, 30, 4)).get
      .map { case (w, h, l) => Multimodal.lumaAHash64(l, w, h) }
    val edited = Multimodal
      .decodeGifFrames(Multimodal.syntheticGif(5L, 40, 30, 4, editFrame = 2, editSeedDelta = 7777L))
      .get.map { case (w, h, l) => Multimodal.lumaAHash64(l, w, h) }
    assert(clean(0) == edited(0) && clean(1) == edited(1) && clean(3) == edited(3))
    assert(clean(2) != edited(2), "planted frame edit not visible in the aHash")
    // blocked == brute over FRAME hashes: pigeonhole blocking on the
    // (docId*16 + frameIdx, simhash) relation finds exactly the
    // brute-force Hamming pairs (the x59 proof re-run on video frames)
    // docs i ≡ 2 (mod 3) re-render doc i−1's GIF with frame 1 replaced:
    // frames 0 and 2 are bit-identical across the pair (hamming 0), the
    // edited frame and all cross-seed frames sit near hamming ~32
    val corpus = (0 until 24).map { i =>
      val id = i.toLong
      val bytes =
        if (i % 3 == 2)
          Multimodal.syntheticGif((i - 1).toLong * 100, 24, 24, 3, editFrame = 1, editSeedDelta = 1L)
        else Multimodal.syntheticGif(id * 100, 24, 24, 3)
      Multimodal.MediaRow(id, "video/gif", bytes)
    }.toDS()
    val fps = Multimodal.videoFrameHashes(corpus)
      .select((col("doc_id") * 16 + col("frame_idx")).as("id"), col("simhash"))
    val maxHam = 3
    val blocked = graft.operators.Dedup.pairsFromFps(fps, maxHam, blocks = 4)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val flat = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      a <- flat; b <- flat if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) if d <= maxHam
    } yield (a._1, b._1, d.toLong)).toSet
    assert(blocked == brute, s"blocked ${blocked.size} != brute ${brute.size}")
    assert(brute.nonEmpty, "corpus planted no near-dup frame pairs — test is vacuous")
  }

  test("decodeY4mFrames: lossless luma, colorspace matrix, truncation fuzz, GIF cross-container hash parity") {
    import spark.implicits._
    // round trip per colorspace: the luma plane is the formula plane
    // verbatim; chroma payload sizes differ per colorspace but never
    // touch the luma read
    for (cs <- Seq("C420", "C420jpeg", "C422", "C444", "Cmono"); seed <- Seq(1L, 42L)) {
      val (w, h, nf) = (17 + (seed % 5).toInt, 13, 4) // odd dims on purpose
      val y4m = Multimodal.syntheticY4m(seed, w, h, nf, colorspace = cs)
      val Some(frames) = Multimodal.decodeY4mFrames(y4m)
      assert(frames.length == nf, s"$cs seed $seed: frame count ${frames.length}")
      for (k <- 0 until nf) {
        val (fw, fh, luma) = frames(k)
        assert(fw == w && fh == h)
        val expected = Array.tabulate(w * h)(i =>
          (Multimodal.syntheticPixel(Multimodal.frameSeed(seed, k), i % w, i / w) & 0xff).toByte)
        assert(java.util.Arrays.equals(luma, expected), s"$cs seed $seed frame $k luma diverges")
      }
    }
    // truncation: a cut tail yields exactly the frames that fully fit
    // (the WarcSplit resync discipline), never phantom extras, never a
    // throw; header-only and mid-header cuts yield None
    val y4m4 = Multimodal.syntheticY4m(3L, 16, 16, 4)
    for (len <- Seq(0, 5, 9, 20, y4m4.length / 3, y4m4.length / 2, y4m4.length - 1)) {
      val got = Multimodal.decodeY4mFrames(java.util.Arrays.copyOf(y4m4, len))
      assert(got.forall(_.length <= 4), s"truncation at $len produced phantom frames")
    }
    // exact truncation arithmetic: cutting after frame 2's payload keeps
    // exactly 2 frames
    val hdr = y4m4.indexOf('\n'.toByte) + 1
    val frameBytes = 6 + 16 * 16 + 2 * 8 * 8 // "FRAME\n" + luma + 2 chroma planes
    val cut = Multimodal.decodeY4mFrames(java.util.Arrays.copyOf(y4m4, hdr + 2 * frameBytes + 10))
    assert(cut.map(_.length).contains(2), s"exact cut kept ${cut.map(_.length)}")
    // corruption: random byte flips never throw
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 100) {
      val corrupt = y4m4.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeY4mFrames(corrupt) // must not throw
    }
    assert(Multimodal.decodeY4mFrames("YUV4MPEG2 junk header".getBytes).isEmpty)
    assert(Multimodal.decodeY4mFrames("plain text".getBytes).isEmpty)
    assert(Multimodal.decodeY4mFrames("YUV4MPEG2 W0 H16 C420\nFRAME\n".getBytes).isEmpty)
    // CROSS-CONTAINER parity: the same formula video as GIF and as Y4M
    // decodes to identical luma planes, so videoFrameHashes must hash
    // them frame-identically — container-independent video dedup
    val media = Seq(
      Multimodal.MediaRow(0L, "video/gif", Multimodal.syntheticGif(9L, 20, 20, 3)),
      Multimodal.MediaRow(1L, "video/y4m", Multimodal.syntheticY4m(9L, 20, 20, 3))
    ).toDS()
    val hashes = Multimodal.videoFrameHashes(media)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(4))).toMap
    assert(hashes.size == 6)
    for (k <- 0 until 3)
      assert(hashes((0L, k)) == hashes((1L, k)), s"frame $k hash differs across containers")
    // planted edit is visible through the Y4M path exactly as through GIF
    val clean = Multimodal.decodeY4mFrames(Multimodal.syntheticY4m(5L, 40, 30, 4)).get
      .map { case (w, h, l) => Multimodal.lumaAHash64(l, w, h) }
    val edited = Multimodal
      .decodeY4mFrames(Multimodal.syntheticY4m(5L, 40, 30, 4, editFrame = 2, editSeedDelta = 7777L))
      .get.map { case (w, h, l) => Multimodal.lumaAHash64(l, w, h) }
    assert(clean(0) == edited(0) && clean(1) == edited(1) && clean(3) == edited(3))
    assert(clean(2) != edited(2), "planted frame edit not visible through Y4M")
    // mediaProbe types Y4M as video at ANY frame count (container rule)
    val probed = Multimodal
      .mediaProbe(Seq(
        Multimodal.MediaRow(7L, "video/y4m", Multimodal.syntheticY4m(2L, 12, 10, 1)),
        Multimodal.MediaRow(8L, "video/y4m", Multimodal.syntheticY4m(2L, 12, 10, 3))
      ).toDS())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toSet
    assert(probed == Set((7L, "video", 12, 10, 1), (8L, "video", 12, 10, 3)), s"probe: $probed")
  }

  test("decodeAviMjpegFrames: real compressed video — frame grid, planted edit, equality invariants, fuzz") {
    import spark.implicits._
    // frame grid: count and dims are structural (JPEG SOF + RIFF walk)
    for (seed <- Seq(1L, 42L)) {
      val (w, h, nf) = (33 + (seed % 5).toInt, 21, 4)
      val Some(frames) = Multimodal.decodeAviMjpegFrames(Multimodal.syntheticAviMjpeg(seed, w, h, nf))
      assert(frames.length == nf && frames.forall { case (fw, fh, l) => fw == w && fh == h && l.length == w * h })
    }
    // the equality invariant every AVI oracle rides: unedited frames of
    // (clean, edited) encode the same plane → byte-identical JPEG chunks
    // → identical decoded luma and hash; the edited frame differs
    val clean = Multimodal.decodeAviMjpegFrames(Multimodal.syntheticAviMjpeg(5L, 40, 30, 4)).get
    val edited = Multimodal
      .decodeAviMjpegFrames(Multimodal.syntheticAviMjpeg(5L, 40, 30, 4, editFrame = 2, editSeedDelta = 7777L))
      .get
    for (k <- Seq(0, 1, 3))
      assert(java.util.Arrays.equals(clean(k)._3, edited(k)._3), s"unedited frame $k diverged")
    assert(!java.util.Arrays.equals(clean(2)._3, edited(2)._3), "planted edit invisible")
    val hashes = (f: IndexedSeq[(Int, Int, Array[Byte])]) =>
      f.map { case (w, h, l) => Multimodal.lumaAHash64(l, w, h) }
    val (hc, he) = (hashes(clean), hashes(edited))
    assert(hc(0) == he(0) && hc(1) == he(1) && hc(3) == he(3) && hc(2) != he(2))
    // within-JDK determinism of the lossy decode: same bytes → same luma
    val avi = Multimodal.syntheticAviMjpeg(9L, 20, 20, 3)
    assert(
      Multimodal.decodeAviMjpegFrames(avi).get.map(_._3.toSeq) ==
        Multimodal.decodeAviMjpegFrames(avi.clone()).get.map(_._3.toSeq)
    )
    // truncation: a cut tail keeps only fully-present frames, no throws;
    // corruption never throws; non-AVI RIFF (WAV) and junk return None
    for (len <- Seq(0, 7, 11, 30, avi.length / 3, avi.length / 2, avi.length - 1)) {
      val got = Multimodal.decodeAviMjpegFrames(java.util.Arrays.copyOf(avi, len))
      assert(got.forall(_.length <= 3), s"truncation at $len produced phantom frames")
    }
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 100) {
      val corrupt = avi.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeAviMjpegFrames(corrupt) // must not throw
    }
    assert(Multimodal.decodeAviMjpegFrames(Multimodal.syntheticWav(1L, 256)).isEmpty)
    assert(Multimodal.decodeAviMjpegFrames("RIFF but not avi".getBytes).isEmpty)
    // operator surface: videoFrameHashes routes AVI; mediaProbe types it
    // video at any frame count with structural dims
    val media = Seq(Multimodal.MediaRow(1L, "video/avi", avi)).toDS()
    val vfh = Multimodal.videoFrameHashes(media)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(vfh == Set((1L, 0, 20, 20), (1L, 1, 20, 20), (1L, 2, 20, 20)))
    val probed = Multimodal
      .mediaProbe(Seq(
        Multimodal.MediaRow(7L, "video/avi", Multimodal.syntheticAviMjpeg(2L, 12, 10, 1)),
        Multimodal.MediaRow(8L, "video/avi", Multimodal.syntheticAviMjpeg(2L, 12, 10, 3))
      ).toDS())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toSet
    assert(probed == Set((7L, "video", 12, 10, 1), (8L, "video", 12, 10, 3)), s"probe: $probed")
  }

  test("energyFingerprint/audioNearDupPairs: amplitude-invariant, decode-path equal, blocked == brute") {
    import spark.implicits._
    // EXACT amplitude invariance: integer-scaled copies fingerprint
    // identically (×k scales every window's Σx² by k², preserving all
    // cross-multiplied comparisons)
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 20) {
      val n = 70 + rnd.nextInt(500)
      val base = Array.fill(n)((rnd.nextInt(16384) - 8192).toShort)
      val f = Multimodal.energyFingerprint(base)
      assert(Multimodal.energyFingerprint(base.map(x => (x * 2).toShort)) == f)
      assert(Multimodal.energyFingerprint(base.map(x => (x * 3).toShort)) == f)
    }
    // clips shorter than bits+1 samples degenerate to 0L
    assert(Multimodal.energyFingerprint(Array.fill(64)(5.toShort)) == 0L)
    // the REAL decode path yields the same fingerprint as the raw samples
    val s0 = Array.tabulate(300)(i => (Multimodal.syntheticSample(3L, i) >> 2).toShort)
    val Some((_, _, dec)) = Multimodal.decodeWav(Multimodal.wavFromSamples(s0))
    assert(Multimodal.energyFingerprint(dec) == Multimodal.energyFingerprint(s0))
    // blocked == brute over planted amplitude-scaled twins: pairs
    // (2k, 2k+1) share a base clip (hamming 0), cross-seed clips sit far
    val corpus = (0 until 30).map { i =>
      val base = Array.tabulate(400)(j =>
        (Multimodal.syntheticSample((i / 2).toLong * 31, j) >> 2).toShort)
      val samples = if (i % 2 == 1) base.map(x => (x * 2).toShort) else base
      Multimodal.MediaRow(i.toLong, "audio/wav", Multimodal.wavFromSamples(samples))
    }.toDS()
    val maxHam = 4
    val blocked = Multimodal.audioNearDupPairs(corpus, maxHam, blocks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fps = Multimodal.audioFingerprints(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      a <- fps; b <- fps if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) if d <= maxHam
    } yield (a._1, b._1, d)).toSet
    assert(blocked == brute, s"blocked ${blocked.size} != brute ${brute.size}")
    assert(brute.size >= 15, s"planted twin pairs missing: ${brute.size}")
  }

  test("decodeAudio: AIFF and AU decode sample-exact, cross-container parity, u-law, fuzz-safe") {
    import spark.implicits._
    // AIFF and AU editions of the formula decode sample-exact — the
    // decodeWav discipline on the two other javax.sound-native containers
    for (seed <- Seq(0L, 7L, 123456789L)) {
      val n = 200 + (seed % 37).toInt
      val Some((ra, ca, sa)) = Multimodal.decodeAudio(Multimodal.syntheticAiff(seed, n, 8000))
      assert(ra == 8000 && ca == 1 && sa.length == n, s"seed $seed AIFF header mismatch")
      assert(sa.indices.forall(i => sa(i) == Multimodal.syntheticSample(seed, i)),
        s"seed $seed AIFF samples diverge")
      val Some((ru, cu, su)) = Multimodal.decodeAudio(Multimodal.syntheticAu(seed, n, 8000))
      assert(ru == 8000 && cu == 1 && su.length == n, s"seed $seed AU header mismatch")
      assert(su.indices.forall(i => su(i) == Multimodal.syntheticSample(seed, i)),
        s"seed $seed AU samples diverge")
    }
    // stereo AIFF: interleaved order survives; odd sample rates encode
    // exactly through the 80-bit extended field (44100 is the classic)
    val st = Multimodal.syntheticAiff(5L, 64, sampleRate = 44100, channels = 2)
    val Some((r2, c2, s2)) = Multimodal.decodeAudio(st)
    assert(r2 == 44100 && c2 == 2 && s2.length == 64)
    assert(s2.indices.forall(i => s2(i) == Multimodal.syntheticSample(5L, i)))
    // decodeWav keeps its RIFF-only contract: AIFF/AU are None there
    assert(Multimodal.decodeWav(st).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.syntheticAu(1L, 50)).isEmpty)
    // CROSS-CONTAINER parity (the x180 discipline for audio): the same
    // formula clip as WAV, AIFF, and AU must fingerprint IDENTICALLY
    for (seed <- 1L to 5L) {
      val samples = Array.tabulate(1200)(i => (Multimodal.syntheticSample(seed, i) >> 2).toShort)
      val fps = Seq(
        Multimodal.wavFromSamples(samples, 16000),
        Multimodal.aiffFromSamples(samples, 16000),
        Multimodal.auFromSamples(samples, 16000)
      ).map { bytes =>
        val Some((_, _, s)) = Multimodal.decodeAudio(bytes)
        Multimodal.energyFingerprint(s)
      }
      assert(fps.distinct.length == 1, s"seed $seed cross-container fingerprints diverge: $fps")
    }
    // G.711 u-law AU (the classic AU payload): hand-rolled spec encoder
    // (shares nothing with the engine's converter) → decodeAudio expands
    // to PCM16 with the format's bounded quantization error
    def mulaw(s: Short): Byte = {
      var x = s.toInt
      val sign = if (x < 0) { x = -x; 0x80 } else 0
      if (x > 32635) x = 32635
      x += 0x84
      var exp = 7
      var mask = 0x4000
      while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
      val mant = (x >> (exp + 3)) & 0x0f
      (~(sign | (exp << 4) | mant)).toByte
    }
    val pcm = Array[Short](0, 100, -100, 1000, -1000, 8000, -8000, 30000, -30000)
    val ulawBytes = pcm.map(mulaw)
    val au = {
      val b = java.nio.ByteBuffer.allocate(24 + ulawBytes.length).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.put(".snd".getBytes("US-ASCII")).putInt(24).putInt(ulawBytes.length)
        .putInt(1).putInt(8000).putInt(1) // encoding 1 = G.711 u-law
      b.put(ulawBytes)
      b.array()
    }
    val Some((rm, cm, sm)) = Multimodal.decodeAudio(au)
    assert(rm == 8000 && cm == 1 && sm.length == pcm.length, "u-law AU header mismatch")
    pcm.indices.foreach { i =>
      val err = math.abs(sm(i) - pcm(i))
      // u-law quantization step for |x| is ~2^(exp+3); 1024 bounds every
      // segment up to full scale with margin
      assert(err <= 1024, s"u-law sample $i: wrote ${pcm(i)}, decoded ${sm(i)} (err $err)")
    }
    // G.711 A-law AU (encoding 27): the CCITT reference encoder (seg
    // table + 0x55/0xD5 toggle), again sharing nothing with the engine
    def alaw(s: Short): Byte = {
      val segEnd = Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)
      var x = s.toInt >> 3 // 16 -> 13 bit
      val mask = if (x >= 0) 0xd5 else { x = -x - 1; 0x55 }
      val seg = segEnd.indexWhere(x <= _) match { case -1 => 8; case i => i }
      val aval =
        if (seg >= 8) 0x7f
        else (seg << 4) | (if (seg < 2) (x >> 1) & 0xf else (x >> seg) & 0xf)
      (aval ^ mask).toByte
    }
    val alawBytes = pcm.map(alaw)
    val auA = {
      val b = java.nio.ByteBuffer.allocate(24 + alawBytes.length).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.put(".snd".getBytes("US-ASCII")).putInt(24).putInt(alawBytes.length)
        .putInt(27).putInt(8000).putInt(1) // encoding 27 = G.711 A-law
      b.put(alawBytes)
      b.array()
    }
    val Some((ra2, ca2, sa2)) = Multimodal.decodeAudio(auA)
    assert(ra2 == 8000 && ca2 == 1 && sa2.length == pcm.length, "a-law AU header mismatch")
    pcm.indices.foreach { i =>
      val err = math.abs(sa2(i) - pcm(i))
      // a-law step for |x| up to full scale is bounded by 2^(seg+4);
      // 2048 covers the top segment with margin
      assert(err <= 2048, s"a-law sample $i: wrote ${pcm(i)}, decoded ${sa2(i)} (err $err)")
    }
    // truncation/corruption fuzz on both containers — None or fewer
    // samples, never a throw
    val baseA = Multimodal.syntheticAiff(9L, 128)
    val baseU = Multimodal.syntheticAu(9L, 128)
    for (base <- Seq(baseA, baseU); len <- Seq(0, 3, 11, 23, 24, 53, 54, 55, 100, base.length - 1)) {
      val out = Multimodal.decodeAudio(java.util.Arrays.copyOf(base, len))
      assert(out.forall(_._3.length <= 128), s"truncation at $len produced phantom samples")
    }
    val rnd = new scala.util.Random(44)
    for (_ <- 0 until 200; base <- Seq(baseA, baseU)) {
      val corrupt = base.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeAudio(corrupt) // must not throw
    }
    assert(Multimodal.decodeAudio("FORMxxxxAIFFgarbage padding here too".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeAudio("plain text, not audio".getBytes).isEmpty)
    // mediaProbe types all three containers as audio with exact metadata
    val media = Seq(
      Multimodal.MediaRow(0L, "audio/wav", Multimodal.syntheticWav(3L, 300, 16000)),
      Multimodal.MediaRow(1L, "audio/aiff", Multimodal.syntheticAiff(3L, 300, 16000)),
      Multimodal.MediaRow(2L, "audio/basic", Multimodal.syntheticAu(3L, 300, 16000))
    ).toDS()
    val probe = Multimodal.mediaProbe(media)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(6), r.getLong(7))).toSet
    assert(
      probe == Set((0L, "audio", 16000, 300L), (1L, "audio", 16000, 300L), (2L, "audio", 16000, 300L)),
      s"mediaProbe mistyped a container: $probe"
    )
  }

  test("aviAudioInfo: interleaved AVI surfaces its audio stream; video walk unaffected; fuzz-safe") {
    import spark.implicits._
    val audio = Array.tabulate(1600)(i => Multimodal.syntheticSample(21L, i))
    val avi = Multimodal.syntheticAviMjpeg(7L, 32, 24, nFrames = 5, audioSamples = audio, audioRate = 8000)
    // the video walk still sees exactly the 5 video frames (audio chunks skipped)
    val Some(frames) = Multimodal.decodeAviMjpegFrames(avi)
    assert(frames.length == 5 && frames.head._1 == 32 && frames.head._2 == 24)
    // the audio probe reads the auds header + counts every ##wb sample
    assert(Multimodal.aviAudioInfo(avi).contains((8000, 1600L)), s"got ${Multimodal.aviAudioInfo(avi)}")
    // an audio-less AVI has no audio stream
    val silent = Multimodal.syntheticAviMjpeg(7L, 32, 24, nFrames = 5)
    assert(Multimodal.aviAudioInfo(silent).isEmpty)
    // mediaProbe: the interleaved AVI's catalog row is FULLY typed —
    // video kind, frame grid, AND the audio stream's rate/samples
    val probe = Multimodal.mediaProbe(Seq(
      Multimodal.MediaRow(0L, "video/avi", avi),
      Multimodal.MediaRow(1L, "video/avi", silent)
    ).toDS()).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(5), r.getInt(6), r.getLong(7))).toSet
    assert(
      probe == Set((0L, "video", 5, 8000, 1600L), (1L, "video", 5, -1, -1L)),
      s"mediaProbe row not fully typed: $probe"
    )
    // NON-PCM audio (wFormatTag != 1, e.g. MP3-in-AVI): the probe refuses
    // rather than fabricating a sample count from compressed bytes —
    // patch the audio strf's wFormatTag (second strf in the file) to 0x55
    def indexOfNth(hay: Array[Byte], needle: String, nth: Int): Int = {
      var found = 0
      var i = 0
      while (i <= hay.length - needle.length) {
        if (needle.indices.forall(k => hay(i + k) == needle.charAt(k).toByte)) {
          found += 1
          if (found == nth) return i
        }
        i += 1
      }
      -1
    }
    val mp3ish = avi.clone()
    val strfA = indexOfNth(mp3ish, "strf", 2)
    assert(strfA > 0, "synthetic AVI lost its audio strf")
    mp3ish(strfA + 8) = 0x55.toByte // WAVE_FORMAT_MPEGLAYER3
    mp3ish(strfA + 9) = 0x00.toByte
    assert(Multimodal.aviAudioInfo(mp3ish).isEmpty, "non-PCM audio must probe to None")
    assert(Multimodal.decodeAviMjpegFrames(mp3ish).exists(_.length == 5), "video walk unaffected")
    // skip-and-continue (r15 advice): a non-PCM FIRST audio stream must
    // not refuse the whole container — the scan continues to the PCM
    // stream behind it (stream 2, '02wb' chunks) and types from that
    val twoAudio = Multimodal.syntheticAviMjpeg(
      7L, 32, 24, nFrames = 5, audioSamples = audio, audioRate = 8000, nonPcmLeadAudio = true)
    assert(
      Multimodal.aviAudioInfo(twoAudio).contains((8000, 1600L)),
      s"non-PCM lead stream must be skipped, got ${Multimodal.aviAudioInfo(twoAudio)}"
    )
    assert(Multimodal.decodeAviMjpegFrames(twoAudio).exists(_.length == 5))
    // stream-selective count: a chunk re-tagged to a THIRD stream ('02wb')
    // must not count toward stream 1's samples
    val retagged = avi.clone()
    val wb = indexOfNth(retagged, "01wb", 2) // skip the strh 'length' false positive? ids only in movi
    assert(wb > 0)
    retagged(wb + 1) = '2'.toByte // '01wb' -> '02wb'
    val recount = Multimodal.aviAudioInfo(retagged)
    assert(recount.exists(_._2 < 1600L), s"re-tagged chunk still counted: $recount")
    // truncation walks keep the samples that are present; fuzz never throws
    val rnd = new scala.util.Random(55)
    for (len <- Seq(0, 8, 12, 100, avi.length / 2, avi.length - 1)) {
      val out = Multimodal.aviAudioInfo(java.util.Arrays.copyOf(avi, len))
      assert(out.forall(_._2 <= 1600L), s"truncation at $len produced phantom samples")
    }
    for (_ <- 0 until 200) {
      val corrupt = avi.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Multimodal.aviAudioInfo(corrupt) // must not throw
    }
  }

  test("probeMp3/probeMp4: structure-only typing — exact metadata, false-positive-proof, fuzz-safe") {
    import spark.implicits._
    // MP3: every version family, VBR frame chain, with and without ID3
    for ((rate, spf) <- Seq((44100, 1152L), (48000, 1152L), (22050, 576L), (8000, 576L));
         id3 <- Seq(false, true)) {
      val n = 7 + (rate % 5)
      val mp3 = Multimodal.syntheticMp3(9L + rate, n, rate, withId3 = id3)
      assert(
        Multimodal.probeMp3(mp3).contains((rate, n * spf)),
        s"rate $rate id3 $id3: got ${Multimodal.probeMp3(mp3)}"
      )
    }
    // anti-false-positive: text, random bytes, and a single bare sync
    // never type (the 2-chained-frames rule)
    assert(Multimodal.probeMp3("plain text, not audio at all".getBytes).isEmpty)
    val rnd = new scala.util.Random(66)
    for (_ <- 0 until 300) {
      val junk = Array.fill(200 + rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Multimodal.probeMp3(junk) // must not throw; typing junk is allowed
    }
    val oneFrame = Multimodal.syntheticMp3(3L, 1, 44100)
    assert(Multimodal.probeMp3(oneFrame).isEmpty, "a single untagged frame must not type")
    // the 2-chained-frames rule holds THROUGH an ID3 preamble too (r15
    // advice): 'ID3' is 3 ASCII bytes any text blob can start with, so a
    // tag plus ONE coincidentally valid header must not type
    val oneFrameId3 = Multimodal.syntheticMp3(3L, 1, 44100, withId3 = true)
    assert(Multimodal.probeMp3(oneFrameId3).isEmpty, "ID3 + a single frame must not type")
    val twoFrameId3 = Multimodal.syntheticMp3(3L, 2, 44100, withId3 = true)
    assert(Multimodal.probeMp3(twoFrameId3).contains((44100, 2 * 1152L)))
    // truncation: keeps complete frames only
    val base = Multimodal.syntheticMp3(5L, 10, 44100)
    for (len <- Seq(0, 3, 4, 100, base.length / 2, base.length - 1)) {
      val out = Multimodal.probeMp3(java.util.Arrays.copyOf(base, len))
      assert(out.forall(_._2 <= 10 * 1152L), s"truncation at $len produced phantom samples")
    }
    for (_ <- 0 until 200) {
      val corrupt = base.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Multimodal.probeMp3(corrupt) // never throws
    }
    // MP4: video+audio, exact dims / frames / rate / samples
    val mp4 = Multimodal.syntheticMp4(1L, 320, 240, 48, audioRate = 44100, audioSamples = 88200L)
    assert(Multimodal.probeMp4(mp4).contains((320, 240, 48, 44100, 88200L)),
      s"got ${Multimodal.probeMp4(mp4)}")
    // audio-only (.m4a shape) and video-only
    val m4a = Multimodal.syntheticMp4(2L, -1, -1, 0, audioRate = 16000, audioSamples = 32000L)
    assert(Multimodal.probeMp4(m4a).contains((-1, -1, -1, 16000, 32000L)))
    val vOnly = Multimodal.syntheticMp4(3L, 64, 36, 12)
    assert(Multimodal.probeMp4(vOnly).contains((64, 36, 12, -1, -1L)))
    assert(Multimodal.probeMp4("not an mp4 container".getBytes).isEmpty)
    for (len <- Seq(0, 8, 12, 40, mp4.length / 2, mp4.length - 1)) {
      Multimodal.probeMp4(java.util.Arrays.copyOf(mp4, len)) // never throws
    }
    for (_ <- 0 until 200) {
      val corrupt = mp4.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Multimodal.probeMp4(corrupt) // never throws
    }
    // mediaProbe types both WITHOUT claiming a decode: full typed rows
    val probe = Multimodal.mediaProbe(Seq(
      Multimodal.MediaRow(0L, "audio/mpeg", Multimodal.syntheticMp3(7L, 20, 22050, withId3 = true)),
      Multimodal.MediaRow(1L, "video/mp4", mp4),
      Multimodal.MediaRow(2L, "audio/mp4", m4a)
    ).toDS()).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getLong(7))).toSet
    assert(
      probe == Set(
        (0L, "audio", -1, -1, -1, 22050, 20 * 576L),
        (1L, "video", 320, 240, 48, 44100, 88200L),
        (2L, "audio", -1, -1, -1, 16000, 32000L)
      ),
      s"mediaProbe mistyped a structure-only container: $probe"
    )
    // and in the dedup catalog fingerprint-less rows still dedupe
    // EXACTLY: byte-identical MP3s share a content digest (smaller id
    // kept), while a near-identical sibling — same structure and typed
    // metadata, different payload bytes — is correctly kept
    val cat = Multimodal.mediaDedupCatalog(Seq(
      Multimodal.MediaRow(10L, "audio/mpeg", Multimodal.syntheticMp3(7L, 20, 22050)),
      Multimodal.MediaRow(11L, "audio/mpeg", Multimodal.syntheticMp3(7L, 20, 22050)),
      Multimodal.MediaRow(12L, "audio/mpeg", Multimodal.syntheticMp3(8L, 20, 22050))
    ).toDS()).collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(8))).toSet
    assert(cat == Set((10L, "audio", true), (11L, "audio", false), (12L, "audio", true)),
      s"got $cat")
  }

  test("probeFlac/probeOgg/fMP4/WebP/TIFF: structure-only typing — exact metadata, false-positive-proof, fuzz-safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // FLAC: exact rate/channels/total-samples across the bit-packing range
    for ((rate, ch, n) <- Seq((44100, 1, 3000L), (96000, 2, 1L), (8000, 8, (1L << 35) + 17L))) {
      val flac = Multimodal.syntheticFlac(5L, n, rate, ch)
      assert(Multimodal.probeFlac(flac).contains((rate, ch, n)),
        s"flac $rate/$ch/$n: got ${Multimodal.probeFlac(flac)}")
    }
    // false positives: magic alone, wrong first-block type/size, rate 0,
    // unknown length (totalSamples 0) all refuse
    assert(Multimodal.probeFlac("fLaC followed by text is not a stream".getBytes).isEmpty)
    val base = Multimodal.syntheticFlac(6L, 4096L, 22050, 1)
    val wrongType = base.clone(); wrongType(4) = 0x04.toByte // VORBIS_COMMENT first
    assert(Multimodal.probeFlac(wrongType).isEmpty, "first block must be STREAMINFO")
    val zeroLen = base.clone()
    // zero the 36-bit total-samples field (low nibble of byte 21 + bytes 22..25)
    zeroLen(21) = (zeroLen(21) & 0xf0).toByte
    for (i <- 22 to 25) zeroLen(i) = 0
    assert(Multimodal.probeFlac(zeroLen).isEmpty, "unknown length must refuse, not guess")
    for (len <- Seq(0, 4, 8, 41, 42, base.length - 1))
      Multimodal.probeFlac(java.util.Arrays.copyOf(base, len)) // never throws
    for (_ <- 0 until 300) {
      val c = base.clone(); c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.probeFlac(c) // never throws
    }
    // OGG: Vorbis at the id rate, Opus at 48 kHz minus pre-skip; the
    // >255-byte page exercises the 255-lacing chain
    val ov = Multimodal.syntheticOgg(9L, 12345L, 32000, 2, "vorbis", pages = 4)
    assert(Multimodal.probeOgg(ov).contains((32000, 2, 12345L)), s"got ${Multimodal.probeOgg(ov)}")
    val oo = Multimodal.syntheticOgg(9L, 960L, 48000, 1, "opus", pages = 2)
    assert(Multimodal.probeOgg(oo).contains((48000, 1, 960L)), s"got ${Multimodal.probeOgg(oo)}")
    // false positives: OggS + junk payload (no codec magic), a lone BOS
    // page (no length declared), non-OGG bytes
    assert(Multimodal.probeOgg("OggS and then some arbitrary text padding".getBytes).isEmpty)
    val onePage = java.util.Arrays.copyOf(ov, 27 + 1 + 30) // BOS page only
    assert(Multimodal.probeOgg(onePage).isEmpty, "an id page alone declares no length")
    assert(Multimodal.probeOgg("definitely not an ogg container".getBytes).isEmpty)
    // truncation keeps the last complete page's granule (<= planted)
    for (len <- Seq(0, 26, 27, 60, ov.length / 2, ov.length - 1)) {
      val out = Multimodal.probeOgg(java.util.Arrays.copyOf(ov, len))
      assert(out.forall(_._3 <= 12345L), s"truncation at $len produced phantom samples")
    }
    for (_ <- 0 until 300) {
      val c = ov.clone(); c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.probeOgg(c) // never throws
    }
    // fragmented MP4: stsz 0, frames summed from moof/traf/trun
    val fmp4 = Multimodal.syntheticMp4(4L, 128, 96, 11, fragments = 3)
    assert(Multimodal.probeMp4(fmp4).contains((128, 96, 11, -1, -1L)),
      s"got ${Multimodal.probeMp4(fmp4)}")
    // a truncated fragment tail keeps the truns that parsed — cutting
    // into the moof train loses frames, never invents them
    for (cut <- Seq(70, 80, 150, 220)) {
      val fOut = Multimodal.probeMp4(java.util.Arrays.copyOf(fmp4, fmp4.length - cut))
      assert(fOut.forall(_._3 <= 11), s"phantom fragment frames at cut $cut: $fOut")
    }
    for (_ <- 0 until 200) {
      val c = fmp4.clone(); c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.probeMp4(c) // never throws
    }
    // WebP: all three layouts — exact dims, animated = video with the
    // exact ANMF frame count, stills = image
    assert(Multimodal.probeWebp(Multimodal.syntheticWebp(1L, 320, 240, "vp8")).contains((320, 240, 0)))
    assert(Multimodal.probeWebp(Multimodal.syntheticWebp(1L, 17, 4001, "vp8l")).contains((17, 4001, 0)))
    assert(Multimodal.probeWebp(Multimodal.syntheticWebp(1L, 64, 48, "anim", 7)).contains((64, 48, 7)))
    // false positives: double magic alone, corrupt start code, non-RIFF
    assert(Multimodal.probeWebp("RIFFxxxxWEBP then some text tail padding".getBytes).isEmpty)
    val badWebp = Multimodal.syntheticWebp(1L, 32, 32, "vp8")
    badWebp(12 + 8 + 3) = 0x00.toByte // break the 0x9d012a start code
    assert(Multimodal.probeWebp(badWebp).isEmpty, "corrupt start code must refuse")
    assert(Multimodal.probeWebp("no container at all".getBytes).isEmpty)
    val goodWebp = Multimodal.syntheticWebp(2L, 100, 50, "vp8")
    for (len <- Seq(0, 11, 12, 19, 20, goodWebp.length - 1))
      Multimodal.probeWebp(java.util.Arrays.copyOf(goodWebp, len)) // never throws
    for (_ <- 0 until 300) {
      val c = goodWebp.clone(); c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.probeWebp(c) // never throws
    }
    // TIFF: both byte orders, SHORT + LONG entries, multi-page chains
    assert(Multimodal.probeTiff(Multimodal.syntheticTiff(1L, 640, 480, 1, littleEndian = true))
      .contains((640, 480, 1)))
    assert(Multimodal.probeTiff(Multimodal.syntheticTiff(1L, 99, 77, 5, littleEndian = false))
      .contains((99, 77, 5)))
    // false positives: magic alone, version != 42, text
    assert(Multimodal.probeTiff("IIx.and then some text that is not a tiff".getBytes).isEmpty)
    val bad42 = Multimodal.syntheticTiff(1L, 10, 10)
    bad42(2) = 41.toByte
    assert(Multimodal.probeTiff(bad42).isEmpty, "version must be 42")
    assert(Multimodal.probeTiff("MM no tiff here either, just words".getBytes).isEmpty)
    // truncation keeps parsed pages; corruption never throws
    val tif5 = Multimodal.syntheticTiff(3L, 50, 40, 5)
    for (len <- Seq(0, 4, 8, 9, 40, tif5.length / 2, tif5.length - 1)) {
      val out = Multimodal.probeTiff(java.util.Arrays.copyOf(tif5, len))
      assert(out.forall(_._3 <= 5), s"truncation at $len produced phantom pages")
    }
    for (_ <- 0 until 300) {
      val c = tif5.clone(); c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.probeTiff(c) // never throws
    }
    // a REAL (decodable) TIFF takes the ImageIO DECODE path instead:
    // same plane written as TIFF and PNG → identical luma → identical
    // aHash (the x167 lossless cross-container contract)
    // RGB plane (not TYPE_BYTE_GRAY — Java's gray ColorSpace is linear
    // and getRGB gamma-converts it): same formula pixels as the PNG twin
    val plane = new java.awt.image.BufferedImage(24, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 24)
      plane.setRGB(x, y, Multimodal.syntheticPixel(9L, x, y))
    val tifBaos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(plane, "tiff", tifBaos), "no JDK TIFF writer")
    val realTif = tifBaos.toByteArray
    val Some((tw, th, _, tLuma)) = Multimodal.decodeImage(realTif)
    val Some((pw, ph, _, pLuma)) =
      Multimodal.decodeImage(Multimodal.syntheticImage(9L, 24, 20, "png"))
    assert(tw == pw && th == ph && tLuma.sameElements(pLuma),
      "decodable TIFF must take the REAL decode path with the PNG-identical plane")
    // mediaProbe end-to-end: all the new containers fully typed
    val probe = Multimodal.mediaProbe(Seq(
      Multimodal.MediaRow(0L, "audio/flac", Multimodal.syntheticFlac(1L, 5000L, 44100, 2)),
      Multimodal.MediaRow(1L, "audio/ogg", Multimodal.syntheticOgg(1L, 7777L, 16000, 1, "vorbis")),
      Multimodal.MediaRow(2L, "audio/opus", Multimodal.syntheticOgg(1L, 480L, 48000, 1, "opus")),
      Multimodal.MediaRow(3L, "video/mp4", fmp4),
      Multimodal.MediaRow(4L, "image/webp", Multimodal.syntheticWebp(1L, 320, 240, "vp8")),
      Multimodal.MediaRow(5L, "image/webp", Multimodal.syntheticWebp(1L, 64, 48, "anim", 7)),
      Multimodal.MediaRow(6L, "image/tiff", Multimodal.syntheticTiff(1L, 200, 150, 3)),
      Multimodal.MediaRow(7L, "image/tiff", realTif) // decodable: REAL decode path
    ).toDS()).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getLong(7))).toSet
    assert(
      probe == Set(
        (0L, "audio", -1, -1, -1, 44100, 5000L),
        (1L, "audio", -1, -1, -1, 16000, 7777L),
        (2L, "audio", -1, -1, -1, 48000, 480L),
        (3L, "video", 128, 96, 11, -1, -1L),
        (4L, "image", 320, 240, 1, -1, -1L),
        (5L, "video", 64, 48, 7, -1, -1L),
        (6L, "image", 200, 150, 3, -1, -1L),
        (7L, "image", 24, 20, 1, -1, -1L)
      ),
      s"mediaProbe mistyped a structure-only container: $probe"
    )
  }

  test("mediaDedupCatalog: one-pass typed catalog, kind-routed dedup, keep-best + accounting") {
    import spark.implicits._
    val n = 512
    val hi = Array.tabulate(n)(i => (Multimodal.syntheticSample(7L, i) >> 2).toShort)
    val lo = Array.tabulate(n / 2)(j => hi(2 * j))
    val media = Seq(
      // image pair: same plane, two containers
      Multimodal.MediaRow(10L, "image/png", Multimodal.syntheticImage(3L, 20, 18, "png")),
      Multimodal.MediaRow(11L, "image/bmp", Multimodal.syntheticImage(3L, 20, 18, "bmp")),
      // audio pair: rate- AND container-crossed editions of one recording
      Multimodal.MediaRow(20L, "audio/wav", Multimodal.wavFromSamples(hi, 16000)),
      Multimodal.MediaRow(21L, "audio/aiff", Multimodal.aiffFromSamples(lo, 8000)),
      // video pair: same formula video, two containers
      Multimodal.MediaRow(30L, "video/gif", Multimodal.syntheticGif(5L, 24, 20, 4)),
      Multimodal.MediaRow(31L, "video/y4m", Multimodal.syntheticY4m(5L, 24, 20, 4)),
      // two BYTE-IDENTICAL text blobs: unknown kind has no perceptual
      // fingerprint, but byte-identity is still provable — the content
      // digest pairs them exactly (smaller id kept)
      Multimodal.MediaRow(40L, "text/plain", "same caption".getBytes("UTF-8")),
      Multimodal.MediaRow(41L, "text/plain", "same caption".getBytes("UTF-8")),
      // near-identical unknown: one byte differs, no digest edge — kept
      Multimodal.MediaRow(42L, "text/plain", "same caption!".getBytes("UTF-8")),
      // singleton image: different seed, pairs with nothing
      Multimodal.MediaRow(50L, "image/png", Multimodal.syntheticImage(99L, 20, 18, "png"))
    ).toDS()
    val rows = Multimodal.mediaDedupCatalog(media, normalizeRate = Some(8000))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(8), r.getLong(9))))
      .toMap
    assert(rows.size == 10, s"catalog must cover every input blob, got ${rows.keySet}")
    val want = Map(
      10L -> (("image", true, 2L)), 11L -> (("image", false, 2L)),
      20L -> (("audio", true, 2L)), 21L -> (("audio", false, 2L)),
      30L -> (("video", true, 2L)), 31L -> (("video", false, 2L)),
      40L -> (("unknown", true, 2L)), 41L -> (("unknown", false, 2L)),
      42L -> (("unknown", true, 1L)),
      50L -> (("image", true, 1L))
    )
    assert(rows == want, s"got $rows")
    // videoMinFrames counts DISTINCT matched frame positions, not raw
    // pairs (r15 advice): two UNRELATED clips that both open with the
    // same two blank frames would mint 2×2 = 4 raw pairs from one
    // distinct shared frame — they must NOT merge. A true edited copy
    // (all shared frames at distinct positions) still must.
    def y4mOfSeeds(w: Int, h: Int, seeds: Seq[Long]): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      baos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
      for (fSeed <- seeds) {
        baos.write("FRAME\n".getBytes("US-ASCII"))
        val luma = Array.tabulate(w * h)(i =>
          (Multimodal.syntheticPixel(fSeed, i % w, i / w) & 0xff).toByte)
        baos.write(luma)
        val chroma = new Array[Byte](2 * (((w + 1) / 2) * ((h + 1) / 2)))
        java.util.Arrays.fill(chroma, 0x80.toByte)
        baos.write(chroma)
      }
      baos.toByteArray
    }
    val blank = 777L
    val fpMedia = Seq(
      // unrelated clips sharing ONLY a repeated blank intro frame
      Multimodal.MediaRow(60L, "video/y4m", y4mOfSeeds(24, 20, Seq(blank, blank, 601L, 602L))),
      Multimodal.MediaRow(61L, "video/y4m", y4mOfSeeds(24, 20, Seq(blank, blank, 611L, 612L))),
      // a genuine copy of 60 with one frame edited: 3 distinct matched
      // positions on each side — merges
      Multimodal.MediaRow(62L, "video/y4m", y4mOfSeeds(24, 20, Seq(blank, blank, 601L, 999L)))
    ).toDS()
    val fpRows = Multimodal.mediaDedupCatalog(fpMedia)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(8), r.getLong(9)))).toMap
    assert(
      fpRows == Map(
        60L -> ((true, 2L)), // cluster {60, 62}, smaller id kept
        61L -> ((true, 1L)), // UNRELATED: must stay a singleton
        62L -> ((false, 2L))
      ),
      s"repeated-frame gate wrong: $fpRows"
    )
    // native metadata survives normalization: the 8 kHz edition reports
    // its OWN rate and sample count, not the normalized ones
    val audio21 = Multimodal.mediaDedupCatalog(media, normalizeRate = Some(8000))
      .filter(col("doc_id") === 21L)
      .select(col("sample_rate"), col("n_samples"))
      .collect().head
    assert(audio21.getInt(0) == 8000 && audio21.getLong(1) == (n / 2).toLong)
  }

  test("resampleToRate: non-integer ratios — bounded fingerprint jitter on band-limited audio") {
    // the r14 verdict's unpinned path: a 44.1 kHz edition normalized to
    // 16 kHz goes through the nearest-neighbor phase walk. The pinned
    // contract (also in resampleToRate's scaladoc): for BAND-LIMITED
    // content — real audio, where adjacent samples correlate — the
    // ±1-frame index jitter of the double-floor walk perturbs window
    // energies negligibly, so the fingerprint differs by a small bounded
    // hamming from the exact-decimation edition of the same master. For
    // noise-like content the guarantee does NOT exist (adjacent-window
    // energy comparisons are coin flips, any jitter reshuffles them) —
    // demonstrated below, which is why the contract names band-limited.
    def bandLimited(seed: Long, n: Int): Array[Short] = {
      // two tones + slow envelope: window energies vary smoothly and
      // monotonically between envelope extremes (deterministic StrictMath)
      Array.tabulate(n) { i =>
        val t = i.toDouble / 48000.0
        val env = 0.6 + 0.4 * StrictMath.sin(2 * math.Pi * (1.3 + seed * 0.1) * t)
        val s = StrictMath.sin(2 * math.Pi * 440 * t) + 0.5 * StrictMath.sin(2 * math.Pi * 1210 * t)
        (env * s * 9000).toShort
      }
    }
    var worst = 0
    for (seed <- 1L to 8L) {
      val n = 66000 + (seed % 5).toInt * 1000
      val master = bandLimited(seed, n)
      val direct16 = Multimodal.resampleToRate(master, 1, 48000, 16000)
      // 3:1 is exact decimation — pinned, not assumed
      assert(direct16 sameElements Array.tabulate(n / 3)(j => master(3 * j)), "3:1 != every 3rd")
      val via441 = Multimodal.resampleToRate(
        Multimodal.resampleToRate(master, 1, 48000, 44100), 1, 44100, 16000)
      assert(math.abs(via441.length - direct16.length) <= 2, "length drift past rounding")
      val m = math.min(via441.length, direct16.length)
      val fD = Multimodal.energyFingerprint(java.util.Arrays.copyOf(direct16, m))
      val fV = Multimodal.energyFingerprint(java.util.Arrays.copyOf(via441, m))
      val ham = java.lang.Long.bitCount(fD ^ fV)
      worst = math.max(worst, ham)
      assert(ham <= 4, s"seed $seed: 44.1k-path fingerprint hamming $ham exceeds the pinned bound 4")
    }
    info(s"worst band-limited 44.1k-path hamming across 8 seeds: $worst")
    // the noise counterexample: white-noise content through the same
    // path is NOT fingerprint-stable — the reason the contract is
    // restricted to band-limited audio (and a vacuousness guard: the
    // band-limited bound above is not an artifact of a trivial signal)
    val noise = Array.tabulate(66000)(i => (Multimodal.syntheticSample(99L, i) >> 2).toShort)
    val nd = Multimodal.resampleToRate(noise, 1, 48000, 16000)
    val nv = Multimodal.resampleToRate(
      Multimodal.resampleToRate(noise, 1, 48000, 44100), 1, 44100, 16000)
    val mN = math.min(nd.length, nv.length)
    val hamNoise = java.lang.Long.bitCount(
      Multimodal.energyFingerprint(java.util.Arrays.copyOf(nd, mN)) ^
        Multimodal.energyFingerprint(java.util.Arrays.copyOf(nv, mN)))
    assert(hamNoise > 4, s"noise content unexpectedly stable (hamming $hamNoise) — bound may be vacuous")
  }

  test("resampleToRate: integer-exact decimation, channel alignment, cross-rate fingerprint invariance") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // exact decimation: 2:1 resample IS the even frames; identity is a
    // no-op; frame-wise stereo moves (L,R) pairs whole
    for (_ <- 0 until 20) {
      val n = 200 + rnd.nextInt(400) * 2
      val mono = Array.fill(n)((rnd.nextInt(16384) - 8192).toShort)
      assert(Multimodal.resampleToRate(mono, 1, 16000, 16000) sameElements mono)
      val down = Multimodal.resampleToRate(mono, 1, 16000, 8000)
      assert(down sameElements Array.tabulate(n / 2)(j => mono(2 * j)), "2:1 != even samples")
      val stereo = Array.tabulate(2 * n)(i => (i * 7 % 1000).toShort)
      val sDown = Multimodal.resampleToRate(stereo, 2, 16000, 8000)
      assert(sDown.length == n) // n/2 frames × 2 channels... n samples
      for (j <- 0 until n / 2) {
        assert(sDown(2 * j) == stereo(4 * j) && sDown(2 * j + 1) == stereo(4 * j + 1),
          s"frame $j split its channels")
      }
      // non-integer ratio: deterministic index formula, no throw, right length
      val odd = Multimodal.resampleToRate(mono, 1, 44100, 8000)
      assert(odd.length == (n.toLong * 8000 / 44100).toInt)
    }
    // cross-rate INVARIANCE: a master at 16 kHz and its ideal 8 kHz
    // edition (even samples) fingerprint identically after normalization
    // to 8 kHz — and WITHOUT normalization they genuinely differ (the
    // gap x181 closes is real, not vacuous)
    var differsUnnormalized = 0
    for (seed <- 1L to 10L) {
      val n = 1024 + (seed % 7).toInt * 128
      val hi = Array.tabulate(n)(i => (Multimodal.syntheticSample(seed, i) >> 2).toShort)
      val lo = Array.tabulate(n / 2)(j => hi(2 * j))
      val fHi = Multimodal.energyFingerprint(Multimodal.resampleToRate(hi, 1, 16000, 8000))
      val fLo = Multimodal.energyFingerprint(lo)
      assert(fHi == fLo, s"seed $seed: normalized fingerprints differ")
      if (Multimodal.energyFingerprint(hi) != fLo) differsUnnormalized += 1
    }
    assert(differsUnnormalized > 0, "unnormalized rates never differed — invariance test is vacuous")
    // end-to-end through the real WAV decode + operator surface
    val media = Seq(
      Multimodal.MediaRow(0L, "audio/wav",
        Multimodal.wavFromSamples(Array.tabulate(1200)(i =>
          (Multimodal.syntheticSample(99L, i) >> 2).toShort), 16000)),
      Multimodal.MediaRow(1L, "audio/wav",
        Multimodal.wavFromSamples(Array.tabulate(600)(j =>
          (Multimodal.syntheticSample(99L, 2 * j) >> 2).toShort), 8000))
    ).toDS()
    val pairs = Multimodal
      .audioNearDupPairs(media, maxHamming = 0, blocks = 8, normalizeRate = Some(8000))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((0L, 1L, 0)), s"cross-rate pair not found: $pairs")
  }

  test("decodeImage: real PNG/BMP decode — exact dims, identical luma planes, identical aHash") {
    // lossless format invariance: the SAME pixel plane encoded as PNG and
    // as BMP must decode to byte-equal luma and the same classic aHash
    for (seed <- Seq(1L, 42L, 1234567L)) {
      val (w, h) = (33, 21) // deliberately not multiples of 8
      val png = Multimodal.syntheticImage(seed, w, h, "png")
      val bmp = Multimodal.syntheticImage(seed, w, h, "bmp")
      val Some((wp, hp, chP, lp)) = Multimodal.decodeImage(png)
      val Some((wb, hb, _, lb)) = Multimodal.decodeImage(bmp)
      assert(wp == w && hp == h && wb == w && hb == h && chP == 3)
      assert(java.util.Arrays.equals(lp, lb), s"seed $seed: PNG and BMP luma differ")
      assert(
        Multimodal.lumaAHash64(lp, w, h) == Multimodal.lumaAHash64(lb, w, h),
        s"seed $seed: aHash differs across lossless formats"
      )
    }
    // luma formula pin: a known pixel decodes to the BT.601 integer value
    val png1 = Multimodal.syntheticImage(7L, 4, 4, "png")
    val Some((_, _, _, luma)) = Multimodal.decodeImage(png1)
    var z = 7L + 2 * 0x9e3779b97f4a7c15L + 3 * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val rgb = (z & 0xffffff).toInt
    val expected = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
    assert((luma(3 * 4 + 2) & 0xff) == expected, "BT.601 luma formula drifted")
    // JPEG: decodable, exact dims, deterministic within this JDK (decode
    // twice). NOT pinned cross-JDK — lossless formats carry the oracles.
    val jpg = Multimodal.syntheticImage(9L, 16, 16, "jpg")
    val Some((wj, hj, _, lj1)) = Multimodal.decodeImage(jpg)
    val Some((_, _, _, lj2)) = Multimodal.decodeImage(jpg)
    assert(wj == 16 && hj == 16 && java.util.Arrays.equals(lj1, lj2))
    // non-image bytes are sniffed out before ImageIO ever sees them
    assert(Multimodal.decodeImage("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 0, 0, 0)).isEmpty)
  }

  test("resizeImage: exact integer nearest-neighbor on decoded luma; non-images stride-sample") {
    import spark.implicits._
    val (w, h) = (20, 10)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", Multimodal.syntheticImage(5L, w, h, "png")),
      Multimodal.MediaRow(2L, "image/bmp", Multimodal.syntheticImage(5L, w, h, "bmp")),
      Multimodal.MediaRow(3L, "text", "not an image at all, just bytes".getBytes("UTF-8"))
    )
    val got = Multimodal
      .resizeImage(spark.createDataset(rows), 4, 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("plane"))
      .toMap
    // formula replay: dst (x,y) <- src ((x*20)/4, (y*10)/4), BT.601 luma
    val expected = (0 until 4).flatMap { y =>
      (0 until 4).map { x =>
        Multimodal.bt601Luma(Multimodal.syntheticPixel(5L, x * w / 4, y * h / 4)).toByte
      }
    }.toArray
    assert(java.util.Arrays.equals(got(1L), expected), "png resize != formula")
    assert(java.util.Arrays.equals(got(2L), expected), "bmp resize != formula (format variance)")
    // non-image fallback: strided raw-byte sampling, 16 bytes out
    assert(got(3L).length == 16 && got(3L)(0) == 'n'.toByte)
  }

  test("imageNearDupPairs on DECODED planes: blocked == brute force, planted twins found") {
    import spark.implicits._
    // controlled planes: base images are luma gradients (seed-shifted);
    // twins brighten ONE 8x8-grid box, flipping at most a couple of
    // aHash bits — the re-encoded/lightly-edited near-dup regime
    def plane(seed: Int, brightenBox: Boolean): Array[Byte] = {
      val (w, h) = (32, 32)
      val img =
        new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // checkerboard of WELL-SEPARATED box means (≈40 vs ≈216, global
        // mean ≈128) + seed jitter: brightening one box flips exactly its
        // own bit — a 1-box edit cannot drag other boxes across the mean
        val (bx, by) = (x / 4, y / 4)
        val jitter = (seed * 31 + bx * 7 + by * 3) % 21 - 10
        val base = (if ((bx + by) % 2 == 0) 40 else 216) + jitter
        val v =
          if (brightenBox && bx == 0 && by == 0) 200
          else base
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, if (seed % 2 == 0) "png" else "bmp", baos)
      baos.toByteArray
    }
    val rows = (0 until 30).flatMap { s =>
      Seq(
        Multimodal.MediaRow(s.toLong * 2, "image/test", plane(s, brightenBox = false)),
        Multimodal.MediaRow(s.toLong * 2 + 1, "image/test", plane(s, brightenBox = true))
      )
    }
    val ds = spark.createDataset(rows)
    val hashes = Multimodal
      .aHash(ds)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val maxHamming = 2
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= maxHamming
    } yield (a, b, d)).toSet
    val blocked = Multimodal
      .imageNearDupPairs(ds, maxHamming = maxHamming)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .toSet
    assert(blocked == brute, s"blocked=${blocked.size} brute=${brute.size} diverged")
    // every planted (base, twin) pair is within the gate
    (0 until 30).foreach { s =>
      val d = java.lang.Long.bitCount(hashes(s.toLong * 2) ^ hashes(s.toLong * 2 + 1))
      assert(d <= maxHamming, s"planted twin $s at hamming $d")
    }
  }

  test("trainBpe: batched rounds are bit-identical to sequential (batchSize=1) on random corpora") {
    // randomized equality: the exact-prefix batch acceptance must yield
    // the SAME merge sequence as one-merge-at-a-time training, including
    // under tie-heavy and chain-heavy ("abab") pair distributions
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 4) {
      val alphabet = "abcde".take(3 + trial % 3)
      val corpus = (0 until 300).map { _ =>
        (0 until (2 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val df = corpus.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
      val sequential = TextOps.trainBpe(df, col("text"), numMerges = 12, batchSize = 1)
      val batched = TextOps.trainBpe(df, col("text"), numMerges = 12, batchSize = 64)
      assert(batched == sequential, s"trial $trial: batched $batched != sequential $sequential")
    }
    // deep-merge stress: tiny alphabet + long merge sequence builds nested
    // multi-char tokens, the regime where same-concatenation collisions
    // (("ab","cd") vs ("abc","d")) and tie hazards live
    val deep = (0 until 500).map { _ =>
      (0 until (3 + rnd.nextInt(10))).map(_ => "abcd"(rnd.nextInt(4))).mkString
    }
    val deepDf = deep.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val seqDeep = TextOps.trainBpe(deepDf, col("text"), numMerges = 30, batchSize = 1)
    val batDeep = TextOps.trainBpe(deepDf, col("text"), numMerges = 30, batchSize = 64)
    assert(batDeep == seqDeep, s"deep: batched $batDeep != sequential $seqDeep")
  }

  test("trainBpe + bpe_segment: match an independent reference implementation") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = TextOps.trainBpe(df, col("text"), numMerges = 6)

    // independent driver-side reference trainer (same determinism rules:
    // exact counts, ties break lexicographically, min pair count 2)
    def pass(syms: List[String], a: String, b: String): List[String] = {
      val r = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { r += a + b; i += 2 }
        else { r += syms(i); i += 1 }
      }
      r.toList
    }
    def refTrain(words: Map[String, Long], n: Int): Seq[(String, String)] = {
      var w = words.toList.map { case (k, c) => k.map(_.toString).toList -> c }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var stop = false
      while (!stop && out.length < n) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- w; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
        val cand = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
        cand match {
          case Some(((a, b), c)) if c >= 2 =>
            out += ((a, b))
            w = w.map { case (syms, cnt) => pass(syms, a, b) -> cnt }
          case _ => stop = true
        }
      }
      out.toSeq
    }
    val wordCounts = corpus.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = refTrain(wordCounts, 6)
    assert(merges == expected, s"trainBpe $merges != reference $expected")
    assert(merges.length == 6)

    // apply kernel == reference apply, across words in one text
    def refApply(word: String): List[String] =
      merges.foldLeft(word.map(_.toString).toList) { case (s, (a, b)) => pass(s, a, b) }
    val seg = Seq("newest low lowest").toDF("text")
      .select(graft.functions.text.bpe_segment(col("text"), merges).as("toks"))
      .collect()(0).getSeq[String](0)
    assert(seg.toList == List("newest", "low", "lowest").flatMap(refApply))

    // greedy left-to-right on a same-symbol run: "aaaaa" + (a,a) -> [aa, aa, a]
    val run = Seq("aaaaa").toDF("text")
      .select(graft.functions.text.bpe_segment(col("text"), Seq(("a", "a"))).as("toks"))
      .collect()(0).getSeq[String](0)
    assert(run.toList == List("aa", "aa", "a"))
  }

  test("aHash/imageNearDupPairs: structured planes hash exactly; blocked == brute") {
    // A: dark half then bright half -> exactly the top 32 bits set;
    // C: the inverse plane; B: A with one byte nudged (hamming <= 1)
    val a = Multimodal.MediaRow(1L, "img", Array.fill(128)(0.toByte) ++ Array.fill(128)(200.toByte))
    val b = Multimodal.MediaRow(2L, "img", { val c = a.content.clone(); c(0) = 40.toByte; c })
    val cRow =
      Multimodal.MediaRow(3L, "img", Array.fill(128)(200.toByte) ++ Array.fill(128)(0.toByte))
    val ds = Seq(a, b, cRow).toDS()
    val fps = Multimodal.aHash(ds).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == 0xffffffff00000000L)
    assert(fps(3L) == 0x00000000ffffffffL)
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(2L)) <= 1)
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) == 64)
    val pairs = Multimodal
      .imageNearDupPairs(ds, maxHamming = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs == Set((1L, 2L)))

    // pigeonhole exactness on a pseudo-random corpus + planted re-encodes
    val rows = (0L until 200L).map { id =>
      Multimodal.MediaRow(id, "img", Array.tabulate(256)(i => ((id * 2654435761L + i * 97L) % 251L).toByte))
    } ++ (0L until 10L).map { id =>
      val base = Array.tabulate(256)(i => ((id * 2654435761L + i * 97L) % 251L).toByte)
      base(7) = (base(7) + 3).toByte
      Multimodal.MediaRow(id + 1000L, "img", base)
    }
    val ds2 = rows.toDS()
    val blocked = Multimodal
      .imageNearDupPairs(ds2, maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val f2 = Multimodal.aHash(ds2).collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, fa) <- f2
      (ib, fb) <- f2
      if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb)
      if h <= 3
    } yield (ia, ib, h)).toSet
    assert(blocked == brute, "Manku blocking must find exactly the brute-force pairs")
    assert(brute.exists { case (x, y, _) => y == x + 1000L }, "planted re-encodes must surface")
  }

  test("consumer FT fixtures render via :kv formatter (kafka.hpp:957-991)") {
    // FIXTURES.md §1: keyA/hello kafka, keyB/hello again, expect
    // `key=keyA value=hello kafka`
    val msgs = Seq(
      ("keyA".getBytes("UTF-8"), "hello kafka".getBytes("UTF-8")),
      ("keyB".getBytes("UTF-8"), "hello again".getBytes("UTF-8"))
    ).toDF("key", "payload").withColumn("properties", map(lit("ts"), lit("1234")))
    val rendered = msgs
      .select(Pipeline.renderMessage("kv", col("key"), col("payload"), col("properties")).as("r"))
      .as[String].collect().toSeq
    assert(rendered == Seq("key=keyA value=hello kafka", "key=keyB value=hello again"))
    val full = msgs.limit(1)
      .select(Pipeline.renderMessage("lkvh", col("key"), col("payload"), col("properties")).as("r"))
      .as[String].collect()(0)
    assert(full == "len=11 key=keyA value=hello kafka headers=[ts=1234]")
  }

  test("producer FT fixture: null key, 200B payload, ts header (FIXTURES.md §1)") {
    val payload = Array.fill[Byte](200)('x')
    val df = Seq(Tuple1(payload)).toDF("payload")
      .withColumn("key", lit(null).cast("binary"))
      .withColumn("properties", map(lit("ts"), lit("1234")))
    val row = df.select(
      col("key"),
      length(col("payload")).as("len"),
      map_keys(col("properties")).getItem(0).as("h0")
    ).collect()(0)
    assert(row.isNullAt(0) && row.getInt(1) == 200 && row.getString(2) == "ts")
    // render tolerates the null key
    val r = df.select(Pipeline.renderMessage("lk", col("key"), col("payload"), col("properties")))
      .as[String].collect()(0)
    assert(r == "len=200 key=null")
  }

  test("throughput summary totals (O-15 stat.hpp:71-84)") {
    val df = Seq(("a", 10), ("b", 20)).toDF("m", "sz")
    val row = Pipeline.throughputSummary(df, col("sz")).collect()(0)
    assert(row.getLong(0) == 2 && row.getLong(1) == 30)
  }

  test("throughput windows scale rates by window length (5s windows)") {
    val base = 1700000000000L
    val df = (0 until 10)
      .map(i => (new java.sql.Timestamp(base + i * 500), 100))
      .toDF("ts", "sz") // 10 msgs over 4.5s -> one 5s window
    val row = Pipeline
      .throughput(df, col("ts"), col("sz"), "5 seconds")
      .collect()(0)
    assert(row.getAs[Long]("messages") == 10)
    assert(math.abs(row.getAs[Double]("mps") - 2.0) < 1e-9) // 10 msgs / 5 s
    assert(math.abs(row.getAs[Double]("bps") - 200.0) < 1e-9)
  }

  test("shed metrics preserve the drop_type counter surface (O-14)") {
    val df = Seq(1, 2, 3, 4, 5).toDF("v")
    val m = Pipeline
      .shedMetrics(df, col("v") > 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toMap
    assert(m == Map("load_shed" -> 2L, "sent" -> 3L))
  }

  test("resample: hourly grid forward-fills last observation, null before first") {
    val base = 3600000L * 1000 // hour-aligned epoch
    val df = Seq(
      (1L, new java.sql.Timestamp(base + 600000), 10.0), // 00:10
      (1L, new java.sql.Timestamp(base + 4500000), 20.0) // 01:15
    ).toDF("user_id", "ts", "value")
    val got = AsOfJoin
      .resample(df, "user_id", "ts", "1 hour", Seq("value"))
      .select(col("user_id"), unix_millis(col("ts")).as("g"), col("value"))
      .collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
      .toSeq
    // grid 00:00 (before first obs -> null), 01:00 (ffill 10.0); stops at
    // max ts 01:15 so no 02:00 point
    assert(got == Seq((base, None), (base + 3600000, Some(10.0))))
  }

  test("Tables.registerAll exposes the whole schema to spark.sql") {
    graft.sources.Tables.registerAll(spark, sfDir)
    val n = spark.sql("SELECT COUNT(1) FROM lineitem JOIN orders ON l_orderkey = o_orderkey").collect()(0).getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT COUNT(1) FROM events").collect()(0).getLong(0) == 1000)
  }

  test("asofBackward rejects clashing value column names with a named error") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException](AsOfJoin.asofBackward(l, r, "k", "t"))
    assert(e.getMessage.contains("v"))
  }

  test("htmlExtract: blocks dropped wholesale, tags stripped, entities decode one level") {
    val rows = Seq(
      "<p>hello <b>world</b></p>",
      "<script>if (x < 2 && y > 1) { bad(); }</script>keep",
      "<style media=\"all\">p > a { }</style>ok",
      "a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f",
      "&amp;lt;literal",  // one-level decode: must become "&lt;literal"
      "  spaced \n\t out  ",
      // mismatched closer must NOT cross-match (script pass is separate
      // from style pass): the unterminated script survives as tag-strips
      "<script>a</style>b"
    ).toDF("h").select(graft.operators.TextOps.htmlExtract(col("h")).as("t")).collect()
    assert(rows(0).getString(0) == "hello world")
    assert(rows(1).getString(0) == "keep")
    assert(rows(2).getString(0) == "ok")
    assert(rows(3).getString(0) == "a & b <c> \"d\" 'e' f")
    assert(rows(4).getString(0) == "&lt;literal")
    assert(rows(5).getString(0) == "spaced out")
    assert(rows(6).getString(0) == "a b")
  }

  test("jsonlIngest: valid lines parse, corrupt lines flag with null fields") {
    val out = graft.operators.CorpusOps
      .jsonlIngest(
        Seq(
          (1L, """{"doc_id":7,"text":"hi there","lang":"en"}"""),
          (2L, """{"doc_id":8,"text":"trunc"""),
          (3L, """{"text":"no id","lang":"de"}""")
        ).toDF("lid", "line")
          .unionByName(Seq(4L).toDF("lid").selectExpr("lid", "CAST(NULL AS STRING) AS line")),
        col("lid"),
        col("line")
      )
      .orderBy(col("line_id"))
      .collect()
    assert(out(0).getLong(1) == 7L && out(0).getString(2) == "hi there" && !out(0).getBoolean(4))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).getBoolean(4))
    assert(out(2).isNullAt(1) && out(2).getString(2) == "no id" && !out(2).getBoolean(4))
    assert(out(3).isNullAt(1) && out(3).getBoolean(4), "a NULL line is corrupt input")
  }

  test("winnowFingerprints: matches brute-force winnowing; shared-run guarantee holds") {
    def brute(text: String, k: Int, w: Int): Set[(Int, String)] = {
      val toks = text.split(" ", -1)
      val hs = (0 to toks.length - k).map { s =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(toks.slice(s, s + k).mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      (0 to hs.length - w).flatMap { s =>
        val win = (s until s + w).map(i => (hs(i), i))
        Seq(win.min match { case (h, p) => (p, h) })
      }.toSet
    }
    val texts = Seq(
      (1L, (0 until 30).map(i => s"t${i % 11}").mkString(" ")), // repeats -> hash ties
      (2L, (0 until 12).map(i => s"u$i").mkString(" ")),
      (3L, "a b c")                                             // < k tokens: no output
    )
    val out = graft.operators.CorpusOps
      .winnowFingerprints(texts.toDF("doc_id", "text"), col("text"), col("doc_id"), k = 4, w = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) == brute(texts(0)._2, 4, 4))
    assert(byDoc(2L) == brute(texts(1)._2, 4, 4))
    assert(!byDoc.contains(3L))
    // guarantee: two docs sharing a run of >= w+k-1 tokens share a fingerprint
    val shared = "s1 s2 s3 s4 s5 s6 s7"
    val pair = Seq((10L, s"p q r $shared x y"), (11L, s"$shared m n o"))
    val fps = graft.operators.CorpusOps
      .winnowFingerprints(pair.toDF("doc_id", "text"), col("text"), col("doc_id"), k = 4, w = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val a = fps.filter(_._1 == 10L).map(_._2).toSet
    val b = fps.filter(_._1 == 11L).map(_._2).toSet
    assert(a.intersect(b).nonEmpty, "shared 7-token run must share a fingerprint")
  }
}
