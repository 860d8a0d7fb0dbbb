package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed twin of the driver testdata — the bench corpus real 100 TB data
  * looks like, where the uniform driver tables are benign by construction
  * (TESTDATA.md, and the reference's own perf corpus is uniform 200 B
  * messages, ref doc/perf.adoc):
  *
  *   - `documents`: Zipf(1) token distribution (floor(V^u) rank sampling),
  *     ONE hot source holding 50% of documents, and 25% of documents drawn
  *     as near-duplicates of Zipf-ranked templates — power-law near-dup
  *     CLUSTER sizes (the hottest template alone forms a several-hundred-
  *     member clique), which is what drives shingle-df skew, hot MinHash
  *     bands, and hot CC components;
  *   - `events`: Zipf user activity (the top user carries ~10% of all
  *     events) and a flash-crowd day holding 50% of the stream;
  *   - `orders` / `lineitem`: Zipf customer / part / supplier keys and a
  *     hot order-week — skewed groupBys and skewed join sides;
  *   - `embeddings`: 50% of vectors in one tight cosine cluster (one hot
  *     IVF cell / LSH bucket), the rest spread;
  *   - dimension tables (`region nation customer supplier part`) are
  *     copied verbatim from the uniform corpus so key domains stay
  *     referentially aligned.
  *
  * Row counts match the source scale factor. Generation is fully
  * deterministic (xxhash64-seeded uniforms — the repo's md5/xxhash
  * determinism discipline; no RNG state), so the corpus is reproducible
  * byte-for-byte and any query can be re-run against it.
  *
  * Usage: `runMain graft.SkewGen <outDir> [srcDir=/root/testdata/sf0.1]
  * [hotUserShare=0]`, then `SPARK_GRAFT_SF_DIR=<outDir> runMain
  * graft.Bench`. `hotUserShare` > 0 pins that fraction of all events on
  * user_id 0 — the MONSTER-KEY corpus for the order-dependent operators
  * (as-of, gapFill): at 0.30 one key holds 30% of the stream, the regime
  * [[graft.operators.AsOfJoin.asofBackwardChunked]] exists for.
  */
object SkewGen {

  /** Deterministic uniform [0,1) from any columns (md5-discipline twin). */
  private def u(cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(1000000007L)).cast("double") / 1000000007.0

  /** Zipf(s=1) rank in [0, v): floor((v+1)^u) - 1 has p(r) ∝ 1/(r+1). */
  private def zipf(v: Int, cols: Column*): Column =
    least(
      (floor(pow(lit(v + 1.0), u(cols: _*))) - 1).cast("long"),
      lit(v - 1L)
    )

  // the uniform corpus's vocabulary, Zipf-rank-ordered (hot first) so
  // token-level queries (stopword ratios, n-grams, BM25 terms) still hit
  private val vocab: Seq[String] = Seq(
    "spark", "the", "data", "table", "query", "value", "scan", "sort",
    "group", "fast", "slow", "key", "row", "column", "line", "part",
    "batch", "filter", "agg", "stream", "window", "join", "hash", "order",
    "small", "big", "vector", "merge", "customer", "a"
  )

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/skewdata/sf0.1")
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val hotUserShare = if (args.length > 2) args(2).toDouble else 0.0
    val b = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, out, src, hotUserShare)
    spark.stop()
  }

  /** Generate the skewed twin with a caller-owned session (the CI spec's
    * entry — main wraps this with its own session + stop).
    */
  def generate(spark: SparkSession, out: String, src: String, hotUserShare: Double = 0.0): Unit = {
    require(hotUserShare >= 0.0 && hotUserShare < 1.0, s"hotUserShare in [0,1), got $hotUserShare")

    def write(df: DataFrame, name: String, parts: Int = 4): Unit =
      df.coalesce(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // ---- dimension tables: verbatim copies (aligned key domains)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t, parts = 1)
    }
    // source row counts set the scale
    def countOf(t: String): Long = spark.read.parquet(s"$src/$t.parquet").count()
    val (nOrders, nLineitem, nEvents, nDocs, nVecs) =
      (countOf("orders"), countOf("lineitem"), countOf("events"), countOf("documents"), countOf("embeddings"))
    val (nCust, nPart, nSupp) = (countOf("customer"), countOf("part"), countOf("supplier"))

    // ---- documents: Zipf tokens, hot source, power-law near-dup clusters
    val maxToks = 80
    val vocabLit = lit(vocab.toArray)
    def tokenAt(seed: Column, i: Int): Column =
      element_at(vocabLit, (zipf(vocab.size, seed, lit(i), lit("tok")) + 1).cast("int"))
    def textOf(seed: Column, len: Column, perturb: Column): Column = {
      val toks = (0 until maxToks).map(i => tokenAt(seed, i))
      val arr = slice(array(toks: _*), lit(1), len.cast("int"))
      // near-dup perturbation: one replaced head token, StressXOps's twin
      // construction — same shingle set minus O(n) boundary shingles
      concat_ws(" ", when(perturb.isNotNull, concat(perturb, slice(arr, lit(2), lit(maxToks)))).otherwise(arr))
    }
    val docs = spark
      .range(nDocs)
      .select(
        col("id").as("doc_id"),
        (lit(10) + pmod(xxhash64(col("id"), lit("len")), lit(70))).as("__len"),
        (u(col("id"), lit("dup")) < 0.25).as("__isDup"),
        zipf(50, col("id"), lit("tmpl")).as("__tmpl")
      )
      .select(
        col("doc_id"),
        when(
          col("__isDup"),
          // template seed: shared text; per-doc head-token perturbation
          textOf(
            lit(1000000L) + col("__tmpl"),
            lit(10) + pmod(xxhash64(lit(1000000L) + col("__tmpl"), lit("len")), lit(70)),
            array(element_at(vocabLit, (pmod(xxhash64(col("doc_id")), lit(vocab.size.toLong)) + 1).cast("int")))
          )
        ).otherwise(textOf(col("doc_id"), col("__len"), lit(null).cast("array<string>"))).as("text"),
        when(u(col("doc_id"), lit("lang")) < 0.7, "en")
          .when(u(col("doc_id"), lit("lang")) < 0.8, "de")
          .when(u(col("doc_id"), lit("lang")) < 0.88, "zh")
          .when(u(col("doc_id"), lit("lang")) < 0.95, "fr")
          .otherwise("es")
          .as("lang"),
        // 50% hot domain, remainder Zipf over the other 19 sources
        when(u(col("doc_id"), lit("src")) < 0.5, "src0")
          .otherwise(concat(lit("src"), (zipf(19, col("doc_id"), lit("src2")) + 1).cast("string")))
          .as("source")
      )
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents", parts = 2)

    // ---- events: Zipf users, flash-crowd day, skewed types, heavy-tail value
    val base = lit("2024-01-01 00:00:00").cast("timestamp")
    val events = spark
      .range(nEvents)
      .select(
        col("id").as("event_id"),
        // 50% of the stream lands on one hot day; the rest spreads over 30
        when(
          u(col("id"), lit("day")) < 0.5,
          timestamp_micros(unix_micros(base) + lit(86400000000L) * 7 + pmod(xxhash64(col("id"), lit("t1")), lit(86400000000L)))
        ).otherwise(
          timestamp_micros(unix_micros(base) + pmod(xxhash64(col("id"), lit("t2")), lit(30L * 86400000000L)))
        ).as("ts"),
        when(lit(hotUserShare) > 0 && u(col("id"), lit("hotu")) < hotUserShare, lit(0L))
          .otherwise(zipf(10000, col("id"), lit("user")))
          .as("user_id"),
        when(u(col("id"), lit("et")) < 0.70, "view")
          .when(u(col("id"), lit("et")) < 0.90, "click")
          .when(u(col("id"), lit("et")) < 0.94, "signup")
          .when(u(col("id"), lit("et")) < 0.98, "purchase")
          .otherwise("error")
          .as("event_type"),
        round(pow(u(col("id"), lit("val")) + 0.001, -0.5) * 10.0, 2).as("value"),
        concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit("k")), lit(100L)).cast("string"), lit("}")).as("props")
      )
    write(events, "events")

    // ---- orders: Zipf customers, hot week, heavy-tail totalprice
    val orders = spark
      .range(nOrders)
      .select(
        col("id").as("o_orderkey"),
        zipf(nCust.toInt, col("id"), lit("cust")).as("o_custkey"),
        when(u(col("id"), lit("st")) < 0.5, "O")
          .when(u(col("id"), lit("st")) < 0.85, "F")
          .otherwise("P")
          .as("o_orderstatus"),
        round(pow(u(col("id"), lit("tp")) + 0.0001, -0.4) * 1000.0, 2).as("o_totalprice"),
        when(
          u(col("id"), lit("od")) < 0.5,
          timestamp_micros(unix_micros(base) + lit(86400000000L) * 30 + pmod(xxhash64(col("id"), lit("d1")), lit(7L * 86400000000L)))
        ).otherwise(
          timestamp_micros(unix_micros(base) + pmod(xxhash64(col("id"), lit("d2")), lit(90L * 86400000000L)))
        ).as("o_orderdate"),
        element_at(
          lit(Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
          (zipf(5, col("id"), lit("pri")) + 1).cast("int")
        ).as("o_orderpriority")
      )
    write(orders, "orders")

    // ---- lineitem: Zipf part/supplier keys, hot ship-week
    val lineitem = spark
      .range(nLineitem)
      .select(
        pmod(xxhash64(col("id"), lit("ok")), lit(nOrders)).as("l_orderkey"),
        zipf(nPart.toInt, col("id"), lit("pk")).as("l_partkey"),
        zipf(nSupp.toInt, col("id"), lit("sk")).as("l_suppkey"),
        (pmod(xxhash64(col("id"), lit("ln")), lit(7L)) + 1).cast("int").as("l_linenumber"),
        (zipf(50, col("id"), lit("q")) + 1).cast("double").as("l_quantity"),
        round(pow(u(col("id"), lit("ep")) + 0.0001, -0.3) * 100.0, 2).as("l_extendedprice"),
        round(pmod(xxhash64(col("id"), lit("di")), lit(11L)).cast("double") / 100.0, 2).as("l_discount"),
        round(pmod(xxhash64(col("id"), lit("tx")), lit(9L)).cast("double") / 100.0, 2).as("l_tax"),
        element_at(lit(Array("N", "A", "R")), (zipf(3, col("id"), lit("rf")) + 1).cast("int")).as("l_returnflag"),
        when(u(col("id"), lit("ls")) < 0.6, "O").otherwise("F").as("l_linestatus"),
        when(
          u(col("id"), lit("sd")) < 0.5,
          timestamp_micros(unix_micros(base) + lit(86400000000L) * 45 + pmod(xxhash64(col("id"), lit("s1")), lit(7L * 86400000000L)))
        ).otherwise(
          timestamp_micros(unix_micros(base) + pmod(xxhash64(col("id"), lit("s2")), lit(120L * 86400000000L)))
        ).as("l_shipdate")
      )
    write(lineitem, "lineitem")

    // ---- embeddings: 50% in one tight cosine cluster, rest spread
    val dim = 64
    def comp(seed: Column, i: Int, scale: Double): Column =
      ((pmod(xxhash64(seed, lit(i), lit("e")), lit(2000001L)).cast("double") / 1000000.0) - 1.0) * scale
    val embeddings = spark
      .range(nVecs)
      .select(
        col("id").as("vec_id"),
        (u(col("id"), lit("hot")) < 0.5).as("__hot"),
        col("id")
      )
      .select(
        col("vec_id"),
        array((0 until dim).map { i =>
          // hot cluster: fixed center (seed -1) + 5% noise; cold: full spread
          when(col("__hot"), comp(lit(-1L), i, 1.0) + comp(col("vec_id"), i, 0.05))
            .otherwise(comp(col("vec_id"), i, 1.0))
            .cast("float")
        }: _*).as("embedding"),
        zipf(10, col("vec_id"), lit("lbl")).cast("int").as("label")
      )
    write(embeddings, "embeddings", parts = 1)

    // ---- skew report (the artifact's provenance lines)
    def topShare(df: DataFrame, c: String): String = {
      val n = df.count()
      val top = df.groupBy(col(c)).agg(count(lit(1)).as("n")).orderBy(col("n").desc).head()
      f"$c top=${top.get(0)} share=${top.getLong(1).toDouble / n * 100}%.1f%%"
    }
    println(s"[skewgen] out=$out scale=$src")
    println("[skewgen] documents: " + topShare(spark.read.parquet(s"$out/documents.parquet"), "source"))
    println("[skewgen] events:    " + topShare(spark.read.parquet(s"$out/events.parquet"), "user_id"))
    println("[skewgen] orders:    " + topShare(spark.read.parquet(s"$out/orders.parquet"), "o_custkey"))
    println("[skewgen] lineitem:  " + topShare(spark.read.parquet(s"$out/lineitem.parquet"), "l_partkey"))
    val hotDup = spark.read.parquet(s"$out/documents.parquet")
      .select(md5(regexp_replace(col("text"), "^\\S+ ", "")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n")).orderBy(col("n").desc).head()
    println(s"[skewgen] documents: hottest near-dup cluster ~${hotDup.getLong(1)} members")
    val prefer = graft.operators.Dedup
      .preferPrefixStrategy(spark.read.parquet(s"$out/documents.parquet"), col("text"), 3, threshold = 0.2)
    println(s"[skewgen] documents: ngramJaccardPairsAuto(t=0.2) prefers PPJoin = $prefer (cost-based; naive is the measured winner below the crossover)")
    val evP = spark.read
      .parquet(s"$out/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"))
    val asofChunked =
      graft.operators.AsOfJoin.preferChunked(evP, evP, "user_id", hotShareThreshold = 0.10)
    val asofShareOnly =
      graft.operators.AsOfJoin.preferChunked(evP, evP, "user_id", 0.10, minHotRows = 0L)
    println(
      s"[skewgen] events: asofBackwardAuto prefers chunked = $asofChunked " +
        s"(share-only probe = $asofShareOnly; the default 8M-row absolute floor reflects the " +
        s"measured 5M-breakeven/20M-win crossover)"
    )
    ()
  }
}
