package graft

import org.apache.spark.sql.functions._

/** CI-grade skew protection: generate a tiny [[SkewGen]] twin (from the
  * sf0.001 tables) and assert the skew-sensitive contracts the full
  * BENCH_r11_skew artifact proves at sf0.1 — so a regression in the
  * generator or in an auto-switch heuristic surfaces in `sbt test`, not
  * only in a manual bench run.
  */
class SkewGenSpec extends SparkTestBase {

  private lazy val dir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft-skew-ci").toString
    SkewGen.generate(spark, out, sfDir)
    out
  }

  private def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")

  test("skew twin: schemas and row counts match the source tables") {
    graft.sources.Tables.names.foreach { n =>
      val src = graft.sources.Tables.load(spark, sfDir, n)
      val got = t(n)
      assert(got.count() == src.count(), s"$n row count")
      assert(
        got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
          src.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"$n schema drift: ${got.schema.simpleString} vs ${src.schema.simpleString}"
      )
    }
  }

  test("skew twin: the planted skew regimes hold at CI scale") {
    val docs = t("documents")
    val nDocs = docs.count().toDouble
    val hotShare = docs.filter(col("source") === "src0").count() / nDocs
    assert(hotShare > 0.4 && hotShare < 0.6, s"hot-domain share $hotShare")
    // Zipf user activity: the top user holds a few percent of all events
    val ev = t("events")
    val topUser = ev.groupBy(col("user_id")).count().orderBy(col("count").desc).head().getLong(1)
    assert(topUser.toDouble / ev.count() > 0.03, s"top user share ${topUser / ev.count().toDouble}")
    // near-dup templates: some cluster has many members
    val hotClique = docs
      .select(md5(regexp_replace(col("text"), "^\\S+ ", "")).as("h"))
      .groupBy(col("h")).count().orderBy(col("count").desc).head().getLong(1)
    assert(hotClique >= 10, s"hottest near-dup clique only $hotClique members")
    // embeddings: the hot cosine cluster exists
    val emb = t("embeddings").select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hot = emb.limit(200)
    val pairs = hot.select(col("vec_id").as("a"), col("v").as("va"))
      .join(hot.select(col("vec_id").as("b"), col("v").as("vb")), col("a") < col("b"))
      .filter(graft.operators.Similarity.cosine(col("va"), col("vb")) >= 0.95)
      .count()
    assert(pairs > 100, s"hot cosine cluster too sparse: $pairs pairs in a 200-vec sample")
  }

  test("skew twin: the cost-based auto-switch picks each regime's measured winner") {
    import spark.implicits._
    // Zipf tokens alone put the twin BELOW the crossover at t=0.2
    // (measured: naive wins there, PPJoin 0.6x — StressXOps ngramab), so
    // auto must stay on the naive index...
    assert(
      !graft.operators.Dedup.preferPrefixStrategy(t("documents"), col("text"), 3, threshold = 0.2),
      "the skew twin at t=0.2 is below the crossover: naive is the measured winner"
    )
    // ...and so must the benign uniform corpus
    assert(
      !graft.operators.Dedup.preferPrefixStrategy(
        graft.sources.Tables.load(spark, sfDir, "documents"), col("text"), 3, threshold = 0.2),
      "auto-switch must stay naive on the uniform corpus"
    )
    // BOILERPLATE (shared verbatim footer — the real web shape) is the
    // regime the prefix index exists for (measured 8.3x at 100k docs);
    // 500 short docs sharing a 12-token footer put cand/mass ~ 200, past
    // the t=0.8 crossover of 64
    val boiler = spark.range(500).select(
      col("id").as("doc_id"),
      concat(
        lit("h"), col("id").cast("string"), lit(" u"), col("id").cast("string"),
        lit(" subscribe to our newsletter terms apply all rights reserved today ok")
      ).as("text")
    )
    assert(
      graft.operators.Dedup.preferPrefixStrategy(boiler, col("text"), 3, threshold = 0.8),
      "boilerplate candidate mass must flip the switch to PPJoin"
    )
  }

  test("skew twin hotUserShare: one key takes the pinned share and the as-of auto-switch flips") {
    val out = java.nio.file.Files.createTempDirectory("graft-skew-hot-ci").toString
    SkewGen.generate(spark, out, sfDir, hotUserShare = 0.30)
    val ev = spark.read.parquet(s"$out/events.parquet")
    val n = ev.count().toDouble
    val hot = ev.filter(col("user_id") === 0L).count() / n
    // 30% pinned + the Zipf mass user 0 carries anyway
    assert(hot > 0.28 && hot < 0.45, s"hot user share $hot")
    // the monster-key corpus flips asofBackwardAuto to the chunked path;
    // the plain skew twin (top user ~7%) stays on the plain merge
    val p = ev.select(col("user_id"), col("ts"), col("event_id"))
    assert(graft.operators.AsOfJoin.preferChunked(p, p, "user_id", 0.10, minHotRows = 0L))
    val evPlain = t("events").select(col("user_id"), col("ts"), col("event_id"))
    assert(!graft.operators.AsOfJoin.preferChunked(evPlain, evPlain, "user_id", 0.10, minHotRows = 0L))
  }

  test("skew twin: groupAdvantage moments are aggregation-order independent on the hot group") {
    val ev = t("events")
    def moments(parts: Int) = graft.operators.ChatOps
      .groupAdvantage(ev.repartition(parts), col("user_id"), col("event_id"), col("value"))
      .select(col("prompt_id"), col("mean_r"), col("std_r"))
      .distinct()
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    // different partitionings = different double-sum orders; the decimal
    // moments must be bit-identical anyway (the x140 skew-gate fix)
    assert(moments(1) == moments(32), "moments depend on aggregation order")
  }
}
