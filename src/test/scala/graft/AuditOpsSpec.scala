package graft

import org.apache.spark.sql.functions._

import graft.operators.{Audit, CorpusOps, Similarity}

/** Hand-computed cases for the audit/metric cohort (dataset card,
  * recall@k, split leakage, calibration bins) and the streaming semantic
  * gate's cross-batch + replay contract.
  */
class AuditOpsSpec extends SparkTestBase {

  test("datasetCard: totals, distincts, dup rate per source") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c", "en", "web"),
      (2L, "a b c", "en", "web"), // exact dup of 1
      (3L, "x y", "de", "web"),
      (4L, "solo doc", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val card = CorpusOps
      .datasetCard(df, col("source"), col("doc_id"), col("text"), col("lang"))
      .orderBy("source")
      .collect()
    val books = card(0)
    assert(books.getLong(1) == 1L && books.getLong(2) == 2L && books.getLong(4) == 1L)
    val web = card(1)
    assert(web.getLong(1) == 3L)                 // n_docs
    assert(web.getLong(2) == 8L)                 // tokens: 3+3+2
    assert(web.getLong(4) == 2L)                 // n_langs
    assert(web.getLong(5) == 2L)                 // n_distinct texts
    assert(math.abs(web.getDouble(7) - (1.0 - 2.0 / 3)) < 1e-6) // dup_rate
  }

  test("recallAtK: hits bounded by rank and truth size") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L)).toDF("q", "n")
    val results = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3), (1L, 12L, 5), // 12 outside k=4
      (2L, 21L, 1), (2L, 20L, 4)
    ).toDF("q", "n", "rank")
    val out = Similarity
      .recallAtK(results, col("q"), col("n"), col("rank"), truth, col("q"), col("n"), k = 4)
      .orderBy("query_id")
      .collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 2L)
    assert(math.abs(out(0).getDouble(3) - 2.0 / 3) < 1e-6)
    assert(out(1).getLong(2) == 1L && math.abs(out(1).getDouble(3) - 1.0) < 1e-12)
  }

  test("splitLeakage: canonicalized straddle counts") {
    import spark.implicits._
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"), (4L, "train")).toDF("id", "split")
    val pairs = Seq((1L, 2L), (2L, 1L), (3L, 4L)).toDF("a", "b")
    val out = Audit
      .splitLeakage(pairs, col("a"), col("b"), splits, col("id"), col("split"))
      .orderBy("split_a", "split_b")
      .collect()
    // (test,train) x2 (canonicalized both directions), (train,train) x1
    assert(out.length == 2)
    assert(out(0).getString(0) == "test" && out(0).getLong(2) == 2L && out(0).getBoolean(3))
    assert(out(1).getString(0) == "train" && out(1).getString(1) == "train" && !out(1).getBoolean(3))

    // an endpoint absent from the split table is an audit finding
    // ("missing"), not a silently dropped pair
    val orphan = Seq((1L, 99L)).toDF("a", "b")
    val o = Audit
      .splitLeakage(orphan, col("a"), col("b"), splits, col("id"), col("split"))
      .collect()
    assert(o.length == 1 && o(0).getString(0) == "missing" && o(0).getString(1) == "train")
    assert(o(0).getBoolean(3))
  }

  test("calibrationBins: bin edges, means, positive rates") {
    import spark.implicits._
    val df = Seq(
      (0.05, 0), (0.08, 1),   // bin 0
      (0.95, 1), (1.0, 1)     // bin 9 (score 1.0 clamps into the last bin)
    ).toDF("score", "label")
    val out = Audit
      .calibrationBins(df, col("score"), col("label"), bins = 10)
      .orderBy("bin")
      .collect()
    assert(out.length == 2)
    assert(out(0).getInt(0) == 0 && out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - 0.065) < 1e-9 && math.abs(out(0).getDouble(3) - 0.5) < 1e-9)
    assert(out(1).getInt(0) == 9 && out(1).getDouble(3) == 1.0)
  }

  test("StreamSemanticGate: cross-batch near-dup drop + epoch replay idempotency") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft-semgate").toString + "/vectors"
    val accepted = scala.collection.mutable.Set.empty[Long]
    def acc(kept: org.apache.spark.sql.DataFrame, e: Long): Unit =
      kept.select(col("vec_id")).collect().foreach(r => accepted.add(r.getLong(0)))

    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    val e3 = Array(0.0, 0.0, 1.0, 0.0)
    val b0 = Seq((1L, e1), (2L, e2)).toDF("vec_id", "v")
    val n0 = graft.streaming.StreamSemanticGate.gateBatch(b0, col("vec_id"), col("v"), store, 0L, acc)
    assert(n0 == 2L && accepted == Set(1L, 2L))

    // batch 1: a scaled near-dup of e1 (cosine 1.0) must drop; e3 passes
    val b1 = Seq((10L, e1.map(_ * 3.0)), (11L, e3)).toDF("vec_id", "v")
    val n1 = graft.streaming.StreamSemanticGate.gateBatch(b1, col("vec_id"), col("v"), store, 1L, acc)
    assert(n1 == 1L && accepted == Set(1L, 2L, 11L), s"batch 1 wrong: $accepted")

    // replay epoch 1 (crash-after-store scenario): the epoch's own
    // partition is self-excluded, so the SAME survivors re-derive
    accepted.clear()
    val n1r = graft.streaming.StreamSemanticGate.gateBatch(b1, col("vec_id"), col("v"), store, 1L, acc)
    assert(n1r == 1L && accepted == Set(11L), s"replay diverged: $accepted")
  }

  test("kAnonymity: band accounting over hand-built equivalence classes, nulls are a class") {
    import spark.implicits._
    val rows = Seq(
      // class (a,1): 6 rows -> >=5 band
      ("a", 1), ("a", 1), ("a", 1), ("a", 1), ("a", 1), ("a", 1),
      // class (a,2): 3 rows -> 2..4
      ("a", 2), ("a", 2), ("a", 2),
      // class (b,1): 1 row -> unique
      ("b", 1),
      // null zip is its own equivalence class: 2 rows -> 2..4
      ("c", -1), ("c", -1)
    ).toDF("city", "zip")
      .withColumn("zip", when(col("zip") === -1, lit(null)).otherwise(col("zip")))
    val got = Audit
      .kAnonymity(rows, Seq(col("city"), col("zip")), k = 5)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("unique") == ((1L, 1L, 0.083333)))
    assert(got("2..4") == ((2L, 5L, 0.416667)))
    assert(got(">=5") == ((1L, 6L, 0.5)))
  }

  test("dpCounts: deterministic seeded release, clipping, internal consistency, epsilon scaling") {
    import spark.implicits._
    val df = (1 to 100).map(i => if (i <= 70) "a" else "b").toDF("g")
    val rel = Audit.dpCounts(df, col("g"), epsilon = 1.0).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(rel("a")._1 == 70 && rel("b")._1 == 30)
    // noisy = max(0, round(n + noise)) holds row-by-row
    rel.values.foreach { case (n, noise, noisy) =>
      val rounded = BigDecimal(n + noise).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(noisy == math.max(0L, rounded))
    }
    // determinism: the same release twice
    val rel2 = Audit.dpCounts(df, col("g"), epsilon = 1.0).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(rel == rel2)
    // smaller epsilon -> strictly larger |noise| (same uniform, b = 1/eps)
    val loose = Audit.dpCounts(df, col("g"), epsilon = 0.1).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    rel.foreach { case (g, (_, noise, _)) =>
      if (noise != 0.0) assert(math.abs(loose(g)) > math.abs(noise), s"group $g")
    }
    // clipping: a tiny group with a large negative draw can't go below 0
    val all = Audit.dpCounts((1 to 3).map(_ => "solo").toDF("g"), col("g"), epsilon = 0.01)
      .head()
    assert(all.getLong(3) >= 0L)
  }

  test("dpCountsSecure: release-only schema, non-reproducible, correct Laplace scale (KS)") {
    import spark.implicits._
    // 64 groups of 1000 rows each
    val df = (0 until 64000).map(i => s"g${i % 64}").toDF("g")
    val rel = Audit.dpCountsSecure(df, col("g"), epsilon = 1.0)
    // release-only schema: true count and noise never leave the operator
    assert(rel.schema.fieldNames.toSeq == Seq("grp", "noisy_count", "epsilon"))
    val r1 = rel.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // counts stay near the truth (P(|Laplace(1)| > 30) = e^-30)
    assert(r1.values.forall(v => math.abs(v - 1000L) <= 30L), s"noise off-scale: $r1")
    // non-reproducibility: a fresh release draws fresh noise — the odds
    // all 64 integer-rounded Laplace(1) draws repeat are ~(0.4)^64
    val r2 = Audit.dpCountsSecure(df, col("g"), epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 != r2, "secure release must not be reproducible")

    // KS fuzz of the sampler itself against the Laplace(b) CDF — the
    // scale check the end-to-end release hides behind integer rounding
    for (b <- Seq(1.0, 5.0)) {
      val n = 200000
      val xs = Array.fill(n)(graft.operators.Audit.laplaceSecure(b)).sorted
      def cdf(x: Double): Double =
        if (x < 0) 0.5 * math.exp(x / b) else 1.0 - 0.5 * math.exp(-x / b)
      var d = 0.0
      var i = 0
      while (i < n) {
        val f = cdf(xs(i))
        d = math.max(d, math.max(f - i.toDouble / n, (i + 1).toDouble / n - f))
        i += 1
      }
      // KS critical value at alpha=1e-6 for n=200k is ~0.006; 0.01 gives
      // deterministic-feeling headroom while catching any scale error
      // (a 2x-wrong b produces D ~ 0.15)
      assert(d < 0.01, f"KS statistic $d%.4f too large for Laplace($b)")
    }
  }
}
