package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out evidence for the LLM-pipeline operators (r5 verdict #1): the
  * relational spine has measured 10×/100× runs ([[Stress10x]]); this is
  * the same exercise for simhashPairs, minhashPairs, cosineNearDupPairs,
  * decontaminate, and packSequences at a ≥5 M-doc / 2 M-vector synthetic
  * corpus with REALISTIC distinctness (tokens drawn from a 100k vocab via
  * id-salted hashes — distinct docs w.h.p.) plus 1% planted near-dup
  * twins, the r2 minhash-stress recipe.
  *
  * What each section proves, beyond wall-time:
  *   - recall gates: planted twins are found (pigeonhole-exact for
  *     simhash — found == the hamming-eligible subset, computed from the
  *     known twin id mapping; probabilistic ≥0.98/0.99 for minhash-LSH
  *     and cosine-LSH);
  *   - candidate-pair mass stays O(planted), not O(n²): measured as
  *     Σ C(bucket, 2) over the very block keys the join uses — and for
  *     simhash the narrow-key (blocks=4) mass is printed NEXT TO the
  *     wide-key (blocks=6) mass to show why Manku-style multi-block keys
  *     are the web-scale layout;
  *   - shed counters: cosineNearDupPairs' over-full-bucket observation is
  *     read back from the executed plan;
  *   - plan shapes: the final adaptive operator histogram per run (same
  *     join strategies the sf0.1 oracle queries use).
  *
  * Run: `SPARK_DRIVER_MEM=40g sbt "runMain graft.StressXOps [nDocs] [nVecs]"`
  * — defaults 5,000,000 docs / 2,000,000 vectors.
  */
object StressXOps {

  /** Twin ids = base id + this; keeps the planted pair mapping recoverable
    * without a lookup table.
    */
  private val TwinOffset = 100000000L
  private val Mp3Offset = 300000000L

  private def hist(df: DataFrame): String = {
    val h = Stress10x.opHistogram(df)
    val keep = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "Exchange", "Window", "HashAggregate", "ObjectHashAggregate", "SortAggregate", "Generate")
    keep.flatMap(op => h.filter(_._1.startsWith(op)).map { case (k, v) => s"$k=$v" }).mkString(",")
  }

  /** Execute `df` once (finalizing AQE), returning (wall sec, rows, plan
    * histogram line, observed metrics).
    */
  private def run(df: DataFrame): (Double, Long, String, Map[String, org.apache.spark.sql.Row]) = {
    val t0 = System.nanoTime()
    val n = df.queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, n, hist(df), df.queryExecution.observedMetrics)
  }

  /** 40 tokens from a 100k vocabulary, id-salted; `perturbFirst` swaps
    * token 0 (twin generation: changes exactly 1 of 38 3-gram shingles →
    * planted Jaccard 37/39 ≈ 0.949, and shifts ~4 of 64 simhash bits in
    * expectation → a measurable hamming-eligible subset).
    */
  private def tokens(perturbFirst: Boolean): Column = {
    val toks = (0 until 40).map { k =>
      val h = if (k == 0 && perturbFirst) xxhash64(col("base_id"), lit(k), lit(1)) else xxhash64(col("base_id"), lit(k))
      pmod(h, lit(100000)).cast("string")
    }
    concat_ws(" ", toks: _*)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nVecs = if (args.length > 1) args(1).toLong else 2000000L
    // optional 3rd arg: comma-separated section filter
    // (simhash,minhash,cosine,decontaminate,pack,cc,quantile,pii,sample,
    // lines,quantize,spans,semdedup,bloominc,retrieval,qknn,classifier,
    // curation9,curation10,curation10b,curation10c,curation10d,curation10e,
    // curation11,…,graph,editdist,spectral,sft,curation16,linkage,streamlink,acscan,blocklist,asof,ngramab,monsterrow,bpe1k) — default all
    val only = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    def section(name: String): Boolean = only.isEmpty || only(name)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "4m") // see Tables.sessionConfigs
      .config("spark.ui.enabled", "false")
      // this VM loses whole minutes to hypervisor steal (ROUND_NOTES r7);
      // a steal burst must slow the run down, not kill it via the default
      // 10 s heartbeat x 60-miss executor suicide
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_CHECKPOINT_DIR=<path> re-runs every iterative section in
    // RELIABLE checkpoint mode (GraftCheckpoint) — the cluster-grade
    // evidence run; unset = default localCheckpoint mode
    sys.env.get("GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty).foreach { d =>
      spark.conf.set(graft.runtime.GraftCheckpoint.ConfKey, d)
      println(s"[stressx] RELIABLE checkpoint mode: $d")
    }
    println(s"[stressx] corpus: $nDocs docs + 1% twins; vectors: $nVecs + 1% twins; local[32]")

    // ---- shared text corpus: nDocs distinct + 1% planted near-dup twins
    val base = spark.range(nDocs).select(col("id"), col("id").as("base_id"))
      .select(col("id"), tokens(perturbFirst = false).as("text"))
    val twins = spark.range(nDocs / 100).select((col("id") + TwinOffset).as("id"), col("id").as("base_id"))
      .select(col("id"), tokens(perturbFirst = true).as("text"))
    val corpus = base.unionByName(twins).persist()
    val corpusN = corpus.count()
    val planted = nDocs / 100
    println(s"[stressx] corpus materialized: $corpusN rows, planted twin pairs: $planted")

    // ---- simhash: candidate-mass contrast (narrow vs wide keys) + exact recall
    if (section("simhash")) locally {
      val fps = operators.Dedup.simhash(corpus, col("text"), col("id")).persist()
      fps.count()
      def mass(blocks: Int): Long = operators.Dedup
        .simhashBlocked(fps, maxHamming = 3, blocks = blocks)
        .groupBy("bk").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)
      val m4 = mass(4)
      val m6 = mass(6)
      // ground truth: planted pairs whose ACTUAL hamming ≤ 3 (the operator
      // contract) — pigeonhole blocking must find exactly these
      val a = fps.select(col("id").as("id_a"), col("simhash").as("fp_a"))
      val b = fps.select((col("id") - TwinOffset).as("id_a"), col("simhash").as("fp_b"))
      val eligible = a.join(b, Seq("id_a"))
        .filter(operators.Dedup.hamming(col("fp_a"), col("fp_b")) <= 3)
        .count()
      val pairs = operators.Dedup
        .simhashPairs(corpus, col("text"), col("id"), maxHamming = 3, blocks = 6)
      val (sec, _, h, _) = run(pairs)
      val found = pairs.persist()
      val total = found.count()
      val foundPlanted = found.filter(col("id_b") === col("id_a") + TwinOffset).count()
      println(f"[stressx] simhashPairs(blocks=6): $sec%.1f s, pairs=$total (planted-eligible=$eligible found=$foundPlanted, background=${total - foundPlanted})")
      println(s"[stressx]   candidate mass: blocks=4 (16-bit keys) = $m4 pairs vs blocks=6 (3x10-bit combo keys) = $m6 — wide keys keep it O(planted)")
      println(s"[stressx]   plan: $h")
      assert(foundPlanted == eligible, s"pigeonhole recall must be total: $foundPlanted != $eligible")
      found.unpersist(); fps.unpersist()
    }

    // ---- minhash-LSH at 5x the r2 stress size
    if (section("minhash")) locally {
      val pairs = operators.Dedup
        .minhashPairs(corpus, col("text"), col("id"), n = 3, numHashes = 32, bands = 16, threshold = 0.8)
      val (sec, _, h, _) = run(pairs)
      val found = pairs.persist()
      val total = found.count()
      val foundPlanted = found.filter(col("id_b") === col("id_a") + TwinOffset).count()
      val recall = foundPlanted.toDouble / planted
      println(f"[stressx] minhashPairs: $sec%.1f s, pairs=$total, planted recall=$recall%.4f (J(planted)≈0.949, threshold 0.8)")
      println(s"[stressx]   plan: $h")
      assert(recall >= 0.98, s"minhash recall at scale: $recall")
      found.unpersist()
    }

    // ---- cosine near-dup at 2M vectors, dim 64. KEY SIZING IS THE SCALE
    // LEVER: the x14 defaults (16-bit block keys) put ~n/65536 vectors in
    // every bucket — at 2 M uniform vectors that is ~30/bucket ≈ 1.2e8
    // candidate pairs, and the verification join's vector payload turned
    // that into a >40 GB shuffle that filled this box's disk (measured,
    // r6). blocks=3 → 21-bit keys → bucket load ~1 → candidate mass
    // O(n), recall for cos≥0.999 twins still ≥0.99 (per-bit flip prob
    // ≈ 0.007 → P(no 21-bit block intact) ≈ 0.002). Both masses are
    // printed; only the sized layout is executed.
    if (section("cosine")) locally {
      val dim = 64
      def vecFor(noise: Boolean): Column = {
        val comps = (0 until dim).map { j =>
          val v = pmod(xxhash64(col("base_id"), lit(j)), lit(2001)).cast("double") / 1000.0 - 1.0
          if (noise) v + (pmod(xxhash64(col("base_id"), lit(j), lit(7)), lit(2001)).cast("double") / 1000.0 - 1.0) * 0.02
          else v
        }
        array(comps: _*)
      }
      val vb = spark.range(nVecs).select(col("id"), col("id").as("base_id")).select(col("id"), vecFor(noise = false).as("v"))
      val vt = spark.range(nVecs / 100).select((col("id") + TwinOffset).as("id"), col("id").as("base_id"))
        .select(col("id"), vecFor(noise = true).as("v"))
      val vecs = vb.unionByName(vt).persist()
      vecs.count()
      val vPlanted = nVecs / 100
      // candidate mass Σ C(bucket,2) for both key layouts, from the
      // operator's own key construction (bits=64; width = 64/blocks)
      val sig = vecs.select(operators.Similarity.hyperplaneSignature(col("v"), 64).as("sig")).persist()
      def mass(blocks: Int): Long = {
        val width = 64 / blocks
        sig.select(explode(array((0 until blocks).map { b =>
            struct(lit(b).as("blk"), shiftright(col("sig"), b * width).bitwiseAND((1L << width) - 1).as("key"))
          }: _*)).as("bk"))
          .groupBy("bk").agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)
      }
      val m4 = mass(4)
      val m3 = mass(3)
      sig.unpersist()
      val pairs = operators.Similarity
        .cosineNearDupPairs(vecs, "v", "id", threshold = 0.99, bits = 64, blocks = 3, maxBucket = 4096)
      val (sec, _, h, obs) = run(pairs)
      val shed = obs.collect { case (name, row) if name.startsWith("cosine_neardup_shed_") => (row.getLong(0), row.get(1)) }
      val found = pairs.persist()
      val total = found.count()
      val foundPlanted = found.filter(col("id_b") === col("id_a") + TwinOffset).count()
      val recall = foundPlanted.toDouble / vPlanted
      println(f"[stressx] cosineNearDupPairs(bits=64, blocks=3): $sec%.1f s, pairs=$total, planted recall=$recall%.4f, shed=${shed.mkString(";")}")
      println(s"[stressx]   candidate mass: 16-bit keys (x14 default) = $m4 pairs vs 21-bit keys = $m3 — key width is the 100 TB lever")
      println(s"[stressx]   plan: $h")
      assert(recall >= 0.99, s"cosine near-dup recall at scale: $recall")
      found.unpersist(); vecs.unpersist()
    }

    // ---- decontamination: 5M-doc corpus vs a 500-doc benchmark, planted hits
    if (section("decontaminate")) locally {
      val benchN = 500
      def benchTok(b: Column, j: Column): Column =
        (pmod(xxhash64(lit("bench"), b, j), lit(50000)) + 200000).cast("string")
      val bench = spark.range(benchN).select(
        col("id").as("bench_id"),
        concat_ws(" ", (0 until 16).map(j => benchTok(col("id"), lit(j))): _*).as("text")
      )
      // corpus twin of the shared recipe, with bench 8-grams injected into
      // tokens 10..17 of every id % 1000 == 7 doc (disjoint vocab ranges:
      // corpus tokens < 100000, bench tokens ≥ 200000 — zero accidental hits)
      val plantedIds = (nDocs + 999) / 1000 // ids 7, 1007, ... < nDocs
      val isPlanted = col("base_id") % 1000 === 7
      // integer division: Spark's `/` on longs is double division, and
      // xxhash64(double) != xxhash64(long) — the bench side hashes longs
      val benchOf = pmod(floor(col("base_id") / 1000).cast("long"), lit(benchN.toLong))
      val dtoks = (0 until 40).map { k =>
        if (k >= 10 && k < 18) when(isPlanted, benchTok(benchOf, lit(k - 10)))
          .otherwise(pmod(xxhash64(col("base_id"), lit(k)), lit(100000)).cast("string"))
        else pmod(xxhash64(col("base_id"), lit(k)), lit(100000)).cast("string")
      }
      val dcorpus = spark.range(nDocs).select(col("id"), col("id").as("base_id"))
        .select(col("id"), concat_ws(" ", dtoks: _*).as("text"))
      val flagged = operators.CorpusOps
        .decontaminate(dcorpus, col("text"), col("id"), bench, col("text"), col("bench_id"), n = 8)
      val (sec, nFlagged, h, _) = run(flagged)
      val f = flagged.persist()
      val wrong = f.filter(col("doc_id") % 1000 =!= 7).count()
      val badBench = f.filter(col("bench_id") =!= pmod(floor(col("doc_id") / 1000).cast("long"), lit(benchN.toLong))).count()
      val multiHit = f.filter(col("n_hits") =!= 1).count()
      println(f"[stressx] decontaminate: $sec%.1f s, flagged=$nFlagged (expected $plantedIds), false=$wrong, wrong-bench=$badBench, multi-hit=$multiHit")
      println(s"[stressx]   plan: $h")
      assert(nFlagged == plantedIds && wrong == 0 && badBench == 0 && multiHit == 0)
      f.unpersist()
    }

    // ---- sequence packing: 5M docs, 256 shards, budget 2048
    if (section("pack")) locally {
      val budget = 2048
      val docs = corpus.select(
        col("id"),
        (pmod(xxhash64(col("id"), lit(999)), lit(500)) + 10).as("toks"),
        pmod(xxhash64(col("id"), lit(777)), lit(256)).as("shard")
      )
      val packed = operators.CorpusOps
        .packSequences(docs, col("toks"), col("id"), col("shard"), budget)
      val (sec, nRows, h, _) = run(packed)
      // per-shard invariant: max(seq_id) == floor((Σtoks − last doc's toks) / budget)
      val shardCheck = packed
        .groupBy("shard")
        .agg(
          max(col("seq_id")).as("max_seq"),
          sum(col("n_tok")).as("tot"),
          max_by(col("n_tok"), col("id")).as("last_tok")
        )
        .filter(col("max_seq") =!= floor((col("tot") - col("last_tok")) / budget))
        .count()
      val stats = packed.groupBy("shard").agg((max(col("seq_id")) + 1).as("seqs"), sum(col("n_tok")).as("toks"))
        .agg(sum("seqs").cast("long"), sum("toks").cast("long")).head()
      val (nSeqs, totToks) = (stats.getLong(0), stats.getLong(1))
      val util = totToks.toDouble / (nSeqs * budget)
      println(f"[stressx] packSequences: $sec%.1f s, $nRows docs -> $nSeqs sequences (budget $budget, fill $util%.3f), shard-invariant violations=$shardCheck")
      println(s"[stressx]   plan: $h")
      assert(shardCheck == 0L)
    }

    // ---- connected components: nDocs nodes in 5-node chains + 1000
    // 100-node chains (diameter stress) — exact labels known by
    // construction, so the gate is zero mislabels; rounds must stay
    // logarithmic in the longest chain, not linear (the alternating
    // algorithm's contract).
    if (section("cc")) locally {
      val chainLen = 5L
      val longLen = 100L
      val longChains = 1000L
      val off = 10000000000L // multiple of longLen, far above node ids
      val nShort = nDocs - (nDocs % chainLen) // whole chains only
      val short = spark.range(nShort)
        .filter(col("id") % chainLen =!= chainLen - 1)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val long = spark.range(longChains * longLen)
        .filter(col("id") % longLen =!= longLen - 1)
        .select((col("id") + off).as("id_a"), (col("id") + off + 1).as("id_b"))
      val edges = short.unionByName(long)
      val t0 = System.nanoTime()
      val (cc, rounds) = operators.ConnectedComponents.runWithRounds(edges)
      val ccP = cc.persist()
      val nAssigned = ccP.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val expectedComponent = when(
        col("id") >= off,
        col("id") - pmod(col("id") - off, lit(longLen))
      ).otherwise(col("id") - pmod(col("id"), lit(chainLen)))
      val bad = ccP.filter(col("component") =!= expectedComponent).count()
      val expectedNodes = nShort + longChains * longLen
      println(f"[stressx] connectedComponents: $sec%.1f s, $nAssigned nodes (${nShort / chainLen + longChains} components), rounds=$rounds, mislabels=$bad")
      assert(bad == 0L, s"component labels must be exact: $bad wrong")
      assert(nAssigned == expectedNodes, s"every edge endpoint labeled: $nAssigned != $expectedNodes")
      assert(rounds <= 12, s"alternating CC must converge in O(log) rounds, took $rounds")
      ccP.unpersist()
    }

    // ---- quantile gate under deliberate group skew (the r6 x29 newcomer's
    // one plausible hot-partition risk: quantileFilter's exact contract
    // needs a per-group order, so ONE monster group = ONE window task).
    // Layout: half the corpus in a single hot group, the rest uniform over
    // 1000 groups — gate is the exact per-group keep count (values are
    // unique, so kept_g = n_g − ⌈q·n_g⌉ + 1 with zero tolerance).
    if (section("quantile")) locally {
      val q = 0.5
      val nRows = nDocs
      val rows = spark.range(nRows).select(
        col("id"),
        when(col("id") % 2 === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(1000)) + 1).as("grp"),
        col("id").as("v") // globally unique → per-group unique values
      ).persist()
      rows.count()
      val kept = operators.CorpusOps.quantileFilter(rows, col("grp"), col("v"), q)
      val (sec, nKept, h, _) = run(kept)
      val keptP = kept.persist()
      val violations = keptP
        .groupBy("grp").agg(count(lit(1)).as("kept"))
        .join(rows.groupBy("grp").agg(count(lit(1)).as("n")), Seq("grp"))
        .filter(col("kept") =!= col("n") - ceil(lit(q) * col("n")) + 1)
        .count()
      val hotShare = rows.filter(col("grp") === 0L).count().toDouble / nRows
      println(f"[stressx] quantileFilter(q=$q): $sec%.1f s, $nRows rows -> $nKept kept, groups=1001 (hot group ${hotShare * 100}%.0f%% of corpus), exact-count violations=$violations")
      println(s"[stressx]   plan: $h")
      // the monster-group path: cutoff from a mergeable sketch — no single
      // hot window task; keep counts must land within the documented rank
      // error (n_g/accuracy per group)
      val approx = operators.CorpusOps.quantileFilterApprox(rows, col("grp"), col("v"), q, accuracy = 10000)
      val (aSec, aKept, aH, _) = run(approx)
      val aViolations = approx
        .groupBy("grp").agg(count(lit(1)).as("kept"))
        .join(rows.groupBy("grp").agg(count(lit(1)).as("n")), Seq("grp"))
        .filter(abs(col("kept") - (col("n") - ceil(lit(q) * col("n")) + 1)) > col("n") / 10000 + 1)
        .count()
      println(f"[stressx] quantileFilterApprox(q=$q, accuracy=10k): $aSec%.1f s, -> $aKept kept, rank-error violations=$aViolations (vs exact's per-group window sort: the any-size-group path)")
      println(s"[stressx]   plan: $aH")
      println("[stressx]   scale note: exact keeps the hot group in ONE window task by contract; quantileFilterApprox is the operator for groups that outgrow an executor")
      assert(violations == 0L, s"quantile keep-count contract: $violations groups wrong")
      assert(aViolations == 0L, s"approx rank-error contract: $aViolations groups beyond n/accuracy")
      keptP.unpersist(); rows.unpersist()
    }

    // ---- PII redaction at full corpus width: every doc gains one planted
    // email + IP + phone (the x27 construction); audit counts must agree
    // with actual replacements on ALL rows, and no pattern may survive
    // redaction. Expression-only — the gate aggregate is the only shuffle.
    if (section("pii")) locally {
      // materialize the planted-PII corpus BEFORE the clock: it is input
      // data, not part of the measured operator — and leaving it lazy lets
      // CollapseProject clone the concat subtree into every one of the ~12
      // regex expressions downstream
      val withPii = corpus.select(
        col("id"),
        concat(
          col("text"),
          lit(" reach user"), col("id").cast("string"),
          lit("@mail.example.org from 10."), (col("id") % 254).cast("string"),
          lit(".0.7 call 555-867-5309")
        ).as("text")
      ).persist()
      withPii.count()
      val redacted = withPii.select(
        col("id"),
        operators.TextOps.piiScrub(col("text")).as("pii")
      ).select(col("id"), col("pii.*"))
      val (sec, nRows, h, _) = run(redacted)
      val gate = redacted
        .agg(
          sum(when(col("n_emails") =!= 1 || col("n_ips") =!= 1 || col("n_phones") =!= 1, 1).otherwise(0)).as("bad_counts"),
          sum(
            when(
              regexp_count(col("redacted"), lit(operators.TextOps.emailPattern)) +
                regexp_count(col("redacted"), lit(operators.TextOps.ipv4Pattern)) +
                regexp_count(col("redacted"), lit(operators.TextOps.phonePattern)) =!= 0,
              1
            ).otherwise(0)
          ).as("survivors")
        )
        .head()
      val mbps = nRows * 250 / 1e6 / sec // ~250 B/doc (40 tokens + planted PII)
      println(f"[stressx] piiScrub (fused): $sec%.1f s, $nRows docs (~$mbps%.0f MBps single-pass), count-mismatch=${gate.getLong(0)}, surviving-PII=${gate.getLong(1)}")
      println(s"[stressx]   plan: $h")
      assert(gate.getLong(0) == 0L && gate.getLong(1) == 0L)
      withPii.unpersist()
    }

    // ---- stratified sampling at full corpus width: md5-keyed determinism
    // must be PARTITION-INVARIANT (the property that makes the sample
    // reproducible on a 1000-executor relayout) and per-domain rates must
    // land within binomial tolerance.
    if (section("sample")) locally {
      val nDomains = 20
      val docs = corpus.select(col("id"), pmod(col("id"), lit(nDomains)).as("domain"))
      val rate = (col("domain") + 1).cast("double") / (2.0 * nDomains) // 2.5%..50%
      val kept = operators.CorpusOps.sampleByRate(docs, col("id"), rate).persist()
      val t0 = System.nanoTime()
      val nKept = kept.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // partition-invariance: a 13-way relayout must keep the EXACT same set
      val relaid = operators.CorpusOps.sampleByRate(docs.repartition(13), col("id"), rate)
      val drift = kept.select("id").unionByName(relaid.select("id"))
        .groupBy("id").agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      // per-domain achieved rate within 5 binomial sds of target
      val offRate = kept.groupBy("domain").agg(count(lit(1)).as("k"))
        .join(docs.groupBy("domain").agg(count(lit(1)).as("n")), Seq("domain"))
        .withColumn("target", (col("domain") + 1).cast("double") / (2.0 * nDomains))
        .withColumn("sd", sqrt(col("n") * col("target") * (lit(1.0) - col("target"))))
        .filter(abs(col("k") - col("n") * col("target")) > col("sd") * 5)
        .count()
      println(f"[stressx] sampleByRate(stratified): $sec%.1f s, $corpusN docs -> $nKept kept across $nDomains domains, relayout-drift=$drift, off-rate-domains=$offRate")
      assert(drift == 0L, s"sampling must be partition-invariant: $drift ids changed fate under repartition")
      assert(offRate == 0L, s"achieved rate off-target beyond 5 sd in $offRate domains")
      kept.unpersist()
    }

    // ---- line-level dedup at full corpus width: each doc re-wrapped into
    // 4 content lines (10 tokens each) + a universal boilerplate line
    // (corpusN duplicates — the hot-line case: its count group partial-
    // aggregates, and the join back is 1 count row fanned to corpusN probe
    // rows, so the hottest possible key costs nothing extra) + a semi-
    // common footer on id%7. Twins share content lines 2-4 with their base
    // (count 2 < minDupCount) — near-threshold lines must SURVIVE.
    if (section("lines")) locally {
      def contentLine(i: Int): Column =
        array_join(slice(split(col("text"), " "), i * 10 + 1, 10), " ")
      val lineified = corpus.select(
        col("id"),
        concat(
          concat_ws("\n", contentLine(0), contentLine(1), contentLine(2), contentLine(3)),
          lit("\nsubscribe now and click here"),
          when(col("id") % 7 === 0, lit("\nall rights reserved")).otherwise(lit(""))
        ).as("text")
      ).persist()
      lineified.count()
      val cleaned = operators.CorpusOps.dedupLines(lineified, col("id"), col("text"), minDupCount = 3)
      val (sec, nRows, h, _) = run(cleaned)
      val gate = cleaned
        .agg(
          sum(when(col("n_kept") =!= 4, 1).otherwise(0)).as("bad_kept"),
          sum(
            when(col("n_lines") =!= when(col("doc_id") % 7 === 0, 6).otherwise(5), 1).otherwise(0)
          ).as("bad_total"),
          sum(when(col("text").contains("subscribe") || col("text").contains("rights"), 1).otherwise(0))
            .as("boiler_survivors")
        )
        .head()
      val mbps = nRows * 290 / 1e6 / sec
      println(f"[stressx] dedupLines: $sec%.1f s, $nRows docs (~$mbps%.0f MBps), hot line ${corpusN}x duplicated, bad-kept=${gate.getLong(0)}, bad-total=${gate.getLong(1)}, boilerplate-survivors=${gate.getLong(2)}")
      println(s"[stressx]   plan: $h")
      assert(nRows == corpusN, s"row conservation: $nRows != $corpusN")
      assert(gate.getLong(0) == 0L, "every doc must keep exactly its 4 content lines (twin-shared lines are 2 < minDupCount)")
      assert(gate.getLong(1) == 0L, "n_lines must match the planted construction")
      assert(gate.getLong(2) == 0L, "no boilerplate may survive")
      lineified.unpersist()
    }

    // ---- duplicated-span removal at full corpus width: an 11-token
    // boilerplate phrase appended to every id%3==0 doc — its 4 fully-inside
    // 8-token windows are corpus-wide dups (the whole phrase must be cut),
    // while a per-doc unique marker token before the phrase keeps every
    // boundary-crossing window doc-specific (the body must survive to the
    // span edge EXACTLY; without the marker, 1-token tails collide across
    // 1.68 M phrase docs in a 100k vocab and the operator CORRECTLY cuts
    // "t39 boil1..boil7" too — the first gate draft learned that the hard
    // way). minDupCount=3 so the planted twins' shared 39-token bodies
    // (window count 2) are near-threshold spans that must SURVIVE.
    // ~180 M window-digest rows through the codegen count — the heaviest
    // metadata explode in the suite.
    if (section("spans")) locally {
      val phrase = (1 to 11).map(i => s"boil$i").mkString(" ")
      val spanified = corpus.select(
        col("id"),
        concat(
          col("text"),
          when(
            col("id") % 3 === 0,
            concat(lit(" u"), col("id").cast("string"), lit(" " + phrase))
          ).otherwise(lit(""))
        ).as("text")
      ).persist()
      spanified.count()
      val cleaned =
        operators.CorpusOps.dedupSpans(spanified, col("id"), col("text"), k = 8, minDupCount = 3)
      val (sec, nRows, h, _) = run(cleaned)
      val gate = cleaned
        .agg(
          sum(
            when(
              col("n_kept") =!=
                when(col("doc_id") % 3 === 0, col("n_tokens") - 11).otherwise(col("n_tokens")),
              1
            ).otherwise(0)
          ).as("bad_kept"),
          sum(when(col("text").contains("boil"), 1).otherwise(0)).as("phrase_survivors")
        )
        .head()
      val mbps = nRows * 300 / 1e6 / sec
      println(f"[stressx] dedupSpans: $sec%.1f s, $nRows docs (~$mbps%.0f MBps), 4 dup window fps x ${corpusN / 3} docs, bad-kept=${gate.getLong(0)}, phrase-survivors=${gate.getLong(1)}")
      println(s"[stressx]   plan: $h")
      assert(nRows == corpusN, s"row conservation: $nRows != $corpusN")
      assert(gate.getLong(0) == 0L, "every doc must keep exactly its body (twin-shared spans are 2 < minDupCount)")
      assert(gate.getLong(1) == 0L, "no boilerplate phrase token may survive")
      spanified.unpersist()
    }

    // ---- int8 quantization at full vector width: pure projection — the
    // question at scale is raw expression throughput (HOF lambdas evaluate
    // interpreted), measured here with the error/bounds contract asserted
    // on every vector.
    if (section("quantize")) locally {
      val dim = 64
      val vecs = spark.range(nVecs).select(
        col("id").as("vec_id"),
        transform(
          sequence(lit(0), lit(dim - 1)),
          k => (pmod(xxhash64(col("id"), k), lit(2000001)) - 1000000L).cast("float") / 1000000.0f
        ).as("embedding")
      ).persist()
      vecs.count()
      val q = vecs.select(
        col("vec_id"),
        col("embedding"),
        operators.Similarity.quantizeInt8(col("embedding")).as("qz")
      )
      val (sec, nRows, h, _) = run(q)
      val gate = q
        .agg(
          sum(when(array_max(col("qz.q")) > 127 || array_min(col("qz.q")) < -127, 1).otherwise(0))
            .as("out_of_range"),
          sum(
            when(
              array_max(
                zip_with(col("qz.q"), col("embedding"), (qi, vi) => abs(qi * col("qz.scale") - vi))
              ) > col("qz.scale") * 0.5 + lit(1e-12),
              1
            ).otherwise(0)
          ).as("err_violations")
        )
        .head()
      val mvps = nRows / 1e6 / sec
      println(f"[stressx] quantizeInt8: $sec%.1f s, $nRows vectors x $dim dims ($mvps%.2f M vec/s), out-of-range=${gate.getLong(0)}, err>scale/2=${gate.getLong(1)}")
      println(s"[stressx]   plan: $h")
      assert(gate.getLong(0) == 0L && gate.getLong(1) == 0L)
      vecs.unpersist()
    }

    // ---- semantic dedup (x37) with a PLANTED DEGENERATE CELL: 20% of all
    // vectors collapse onto one centroid — unguarded, that one cell's
    // self-join is (0.2n)²/2 pairs inside a single join partition (8e10 at
    // n=2M: the 100 TB job-killer the r7 verdict flagged). The maxCell
    // guard must shed it (members kept un-deduped, shed observed) while
    // the 1279 bounded cells dedup their planted twins normally. Centroid
    // table is explicit (no Lloyd run) so cell membership is DERIVABLE:
    // spread vector = cent(id%1279+1) + U(-0.35,0.35)/component (within-
    // cell cos ≈ 0.60 against unit centroids — far below the 0.95 gate),
    // twin = base vector + 1% noise (cos ≥ 0.999), degenerate =
    // cent(0)=2.0^16 + noise (pairwise cos ≈ 0.99 — WOULD all dedup if
    // not shed).
    if (section("semdedup")) locally {
      val dim = 16
      val nlist = 1280
      val nDeg = nVecs / 5
      val nSpread = nVecs - nDeg
      val nTwins = nSpread / 100
      // the cap under test: below the degenerate cell, above every bounded
      // cell (~nSpread/1279), at any smoke/full scale
      val cap = math.max(100, math.min(20000L, nDeg / 2).toInt)
      // centroid c0 far from the unit sphere; c1..c1279 UNIT vectors from
      // a SEEDED RNG. Two construction traps, both measured at smoke
      // scale: a lazy (j*16+k)-hash makes the table an arithmetic
      // progression mod the modulus (near-colliding centroids -> 69%
      // spurious drops), and UNNORMALIZED random centroids leave per-cell
      // |c|^2 spread (std ~1.2 around 5.3) whose high-norm cells sit at
      // base cosine ~0.94 — half their pairs cross the 0.95 gate (48%
      // spurious). Unit centroids + 0.35-amp noise put within-cell cosine
      // at ~0.60 with a ~2e-5/pair aligned-noise tail.
      val centMat: Array[Array[Double]] = {
        val rng = new scala.util.Random(42)
        Array.tabulate(nlist) { j =>
          if (j == 0) Array.fill(dim)(2.0)
          else {
            val v = Array.fill(dim)(rng.nextDouble() * 2.0 - 1.0)
            val n = math.sqrt(v.map(x => x * x).sum)
            v.map(_ / n)
          }
        }
      }
      import spark.implicits._
      val cents = (0 until nlist).map(j => (j, centMat(j).toSeq)).toDF("cell", "centroid")
      // per-component centroid lookup arrays (16 × 1280 doubles as plan
      // literals) so the row construction reproduces centMat exactly
      def centAt(k: Int, cellCol: Column): Column =
        element_at(typedlit((0 until nlist).map(j => centMat(j)(k))), (cellCol + 1).cast("int"))
      def noise(idCol: Column, k: Int, salt: Int, amp: Double): Column =
        (pmod(xxhash64(idCol, lit(k), lit(salt)), lit(2001)).cast("double") / 1000.0 - 1.0) * amp
      def spreadVec(baseId: Column): Column = {
        val cell = pmod(baseId, lit(nlist - 1)) + 1
        array((0 until dim).map(k => centAt(k, cell) + noise(baseId, k, 0, 0.35)): _*)
      }
      val spread = spark.range(nSpread).select(col("id"), spreadVec(col("id")).as("v"))
      val twinsV = spark.range(nTwins).select(
        (col("id") + TwinOffset).as("id"),
        array((0 until dim).map(k =>
          centAt(k, pmod(col("id"), lit(nlist - 1)) + 1) + noise(col("id"), k, 0, 0.35) + noise(col("id"), k, 9, 0.01)
        ): _*).as("v")
      )
      val degen = spark.range(nDeg).select(
        (col("id") + 3L * TwinOffset).as("id"),
        array((0 until dim).map(k => lit(2.0) + noise(col("id") + 3L * TwinOffset, k, 0, 0.35)): _*).as("v")
      )
      val all = spread.unionByName(twinsV).unionByName(degen)
      val res = operators.Similarity.semanticDedup(cents, all, "v", "id", threshold = 0.95, maxCell = cap)
      val (sec, nRows, h, obs) = run(res)
      val shed = obs.collect { case (name, row) if name.startsWith("semantic_dedup_shed_") =>
        (row.getLong(0), row.getAs[Number](1).longValue()) }.toSeq
      val resP = res.persist()
      val degKept = resP.filter(col("id") >= 3L * TwinOffset && col("kept")).count()
      val twinsDropped = resP.filter(col("id") >= TwinOffset && col("id") < 3L * TwinOffset && !col("kept")).count()
      val spuriousDrops = resP.filter(col("id") < TwinOffset && !col("kept")).count()
      // bounded-cell pair mass (what the guarded join actually evaluates)
      // vs what the degenerate cell alone would have added
      val boundedMass = resP.filter(col("id") < 3L * TwinOffset)
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)
      val degMass = nDeg * (nDeg - 1) / 2
      val recall = twinsDropped.toDouble / nTwins
      println(f"[stressx] semanticDedup(nlist=$nlist, maxCell=$cap): $sec%.1f s, $nRows rows (one per doc)")
      println(f"[stressx]   degenerate cell: $nDeg members -> kept un-deduped $degKept, shed observed=${shed.mkString(";")}")
      println(f"[stressx]   twin recall in bounded cells: $recall%.4f ($twinsDropped/$nTwins), spurious drops=$spuriousDrops")
      println(s"[stressx]   pair mass actually joined=$boundedMass vs degenerate-cell mass avoided=$degMass")
      println(s"[stressx]   plan: $h")
      assert(nRows == nVecs + nTwins, s"one row per doc: $nRows")
      assert(degKept == nDeg, s"shed-cell members must all be kept: $degKept/$nDeg")
      assert(shed.exists { case (d, m) => d == nDeg && m == nDeg }, s"shed observation wrong: $shed")
      assert(recall >= 0.98, s"twin recall: $recall")
      // non-twin drops are pairs that GENUINELY cross the 0.95 gate (the
      // aligned-noise tail) — correct behavior, bounded as a rate
      assert(spuriousDrops.toDouble / nSpread <= 0.02, s"spurious drop rate: $spuriousDrops/$nSpread")
      assert(boundedMass < degMass / 10, s"guard did not bound the pair mass: $boundedMass vs $degMass")
      resP.unpersist()
    }

    // ---- incremental-dedup A/B (x33 vs x35) at a full-corpus reference:
    // the bloom path's claim is DATA MOVEMENT, not wall (at equal wall it
    // wins by never shuffling the reference) — measured here as shuffle
    // records/bytes written during each strategy against the same 5M-digest
    // reference and 50k half-re-ingest batch. Also exercises the maxNumBits
    // clamp boundary: a sketch squeezed to 1/64 the bits must degrade fpp
    // (bigger confirm set), never results.
    if (section("bloominc")) locally {
      val batchN = 50000L
      // half re-ingests (texts of docs 0..25k), half new (salted texts)
      val reIngest = spark.range(batchN / 2)
        .select((col("id") + 7L * TwinOffset).as("id"), col("id").as("base_id")) // same base_id -> same text as corpus docs 0..25k
        .select(col("id"), tokens(perturbFirst = false).as("text"))
      val fresh = spark.range(batchN / 2)
        .select((col("id") + 8L * TwinOffset).as("id"), col("id").as("base_id"))
        .select(col("id"), concat_ws(" ", lit("novel"), tokens(perturbFirst = false)).as("text"))
      val batch = reIngest.unionByName(fresh).persist()
      batch.count()
      val shufRec = new java.util.concurrent.atomic.AtomicLong(0)
      val shufBytes = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ()
          }
        }
      }
      def measured(df: DataFrame): (Double, Long, Long, Long) = {
        shufRec.set(0); shufBytes.set(0)
        spark.sparkContext.addSparkListener(listener)
        try {
          val t0 = System.nanoTime()
          val n = df.queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000) // the async listener bus drains TaskEnd events
          (sec, n, shufRec.get(), shufBytes.get())
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      val (pSec, pN, pRec, pBytes) = measured(
        operators.Dedup.incremental(batch, col("text"), col("id"), corpus, col("text")))
      val (bSec, bN, bRec, bBytes) = measured(
        operators.Dedup.incrementalBloom(batch, col("text"), col("id"), corpus, col("text"), expectedRefItems = corpusN))
      println(f"[stressx] incremental (plain anti-join): $pSec%.1f s, survivors=$pN, shuffle: $pRec records / ${pBytes / 1048576}%d MiB")
      println(f"[stressx] incrementalBloom:              $bSec%.1f s, survivors=$bN, shuffle: $bRec records / ${bBytes / 1048576}%d MiB")
      println(f"[stressx]   reference never shuffles on the bloom path: ${pRec / math.max(bRec, 1)}%dx fewer shuffle records")
      assert(bN == pN && bN == batchN / 2, s"strategies disagree: plain=$pN bloom=$bN expected=${batchN / 2}")
      // the scaling claim, not a fixed ratio: plain shuffle is
      // REFERENCE-sized (the whole digest set moves every batch), bloom
      // shuffle is BATCH-bounded (final agg + sketch partials) no matter
      // how big the reference grows
      assert(pRec > corpusN, s"plain path should shuffle the reference: $pRec vs corpus $corpusN")
      assert(bRec < batchN * 3, s"bloom path shuffle must stay batch-bounded: $bRec vs batch $batchN")
      // maxNumBits clamp boundary: squeeze the sketch to 1M bits (~0.2
      // bits/digest -> fpp ~1) — the confirm set inflates to ~the whole
      // batch, results must not change (correctness never rides the fpp)
      val prevBits = spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "1048576")
      try {
        val (cSec, cN, cRec, _) = measured(
          operators.Dedup.incrementalBloom(batch, col("text"), col("id"), corpus, col("text"), expectedRefItems = corpusN))
        println(f"[stressx] incrementalBloom @ 1M-bit clamp: $cSec%.1f s, survivors=$cN, shuffle records=$cRec (degraded fpp inflates the confirm join, not the answer)")
        assert(cN == pN, s"clamped sketch changed results: $cN vs $pN")
      } finally {
        prevBits.fold(spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.maxNumBits"))(
          v => spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", v))
      }
      batch.unpersist()
    }

    // ---- retrieval family (x38-x41) at full corpus width: BM25 against
    // a 3-term query (the isin filter keeps the exchange O(hits) — ~2k
    // docs/term out of 5M), TF-IDF top-3 (the 190M-distinct (doc,term)
    // shuffle is the canonical vocabulary shape), capped inverted index
    // (bounded collect after the term-keyed rank), token entropy. Corpus
    // docs draw 40 tokens from a 100k vocab, so every invariant is
    // predictable: 3 rows/doc from tf-idf, n_postings ≤ cap, one row per
    // doc from entropy with entropy ≤ ln(40).
    if (section("retrieval")) locally {
      val bm = operators.CorpusOps.bm25(corpus, col("id"), col("text"), Seq("0", "1", "2"))
      val (bmSec, bmRows, bmH, _) = run(bm)
      println(f"[stressx] bm25(3 terms): $bmSec%.1f s, $bmRows matching docs of $corpusN")
      println(s"[stressx]   plan: $bmH")
      assert(bmRows > 0 && bmRows < corpusN / 100, s"hit count implausible: $bmRows")

      // batched bm25: 100 first-3-token queries against the full corpus —
      // the broadcast (query,term) probe keeps the exchange O(hits)
      val qTab = corpus
        .filter(col("id") < 100)
        .select(col("id").as("qid"), slice(split(col("text"), " "), 1, 3).as("terms"))
      val bt = operators.CorpusOps.bm25TopK(corpus, col("id"), col("text"), qTab, col("qid"), col("terms"), k = 10)
      val (btSec, btRows, btH, _) = run(bt)
      val btOver = bt.groupBy(col("query_id")).count().filter(col("count") > 10).count()
      println(f"[stressx] bm25TopK(100 queries, k=10): $btSec%.1f s, $btRows result rows, over-k queries=$btOver")
      println(s"[stressx]   plan: $btH")
      assert(btRows <= 1000 && btRows >= 100 && btOver == 0, s"top-k shape: $btRows rows, over=$btOver")

      val tiRec = new java.util.concurrent.atomic.AtomicLong(0)
      val tiListener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) { tiRec.addAndGet(m.shuffleWriteMetrics.recordsWritten); () }
        }
      }
      def runCounted(df: DataFrame): (Double, Long, String, Long) = {
        tiRec.set(0)
        spark.sparkContext.addSparkListener(tiListener)
        try { val (s, n, h, _) = run(df); Thread.sleep(2000); (s, n, h, tiRec.get()) }
        finally spark.sparkContext.removeSparkListener(tiListener)
      }
      val (tiSec, tiRows, tiH, tiShuf) =
        runCounted(operators.CorpusOps.tfidfTopTerms(corpus, col("id"), col("text"), k = 3))
      println(f"[stressx] tfidfTopTerms(k=3) KERNEL (word_counts + doc-agg top-k): $tiSec%.1f s, $tiRows rows (${tiRows / math.max(corpusN, 1)} per doc), shuffle records=$tiShuf")
      println(s"[stressx]   plan: $tiH")
      assert(tiRows == 3 * corpusN, s"expected exactly 3 rows/doc: $tiRows vs ${3 * corpusN}")
      // A/B vs the window formulation (the 3x corpus-token exchange shape)
      val (tdSec2, tdRows2, tdH2, tdShuf2) =
        runCounted(operators.CorpusOps.tfidfTopTermsDeclarative(corpus, col("id"), col("text"), k = 3))
      val tiDiff = operators.CorpusOps.tfidfTopTerms(corpus, col("id"), col("text"), k = 3)
        .select(col("doc_id"), col("term"), col("rank"), col("score"))
        .exceptAll(
          operators.CorpusOps.tfidfTopTermsDeclarative(corpus, col("id"), col("text"), k = 3)
            .select(col("doc_id"), col("term"), col("rank"), col("score")))
        .count()
      println(f"[stressx]   vs declarative window form: $tdSec2%.1f s ($tdRows2 rows), shuffle records=$tdShuf2 — ${tdSec2 / tiSec}%.1fx wall, ${tdShuf2 / math.max(tiShuf, 1)}%dx shuffle rows; row diffs: $tiDiff")
      println(s"[stressx]   plan declarative: $tdH2")
      assert(tdRows2 == tiRows && tiDiff == 0L, s"kernel/window diverged: rows $tdRows2 vs $tiRows, diffs $tiDiff")
      assert(tiShuf * 5 < tdShuf2, s"kernel path should move far fewer shuffle rows: $tiShuf vs $tdShuf2")

      val ii = operators.CorpusOps.invertedIndex(corpus, col("id"), col("text"), maxPostings = 100)
      val (iiSec, iiRows, iiH, _) = run(ii)
      val iiBad = operators.CorpusOps
        .invertedIndex(corpus, col("id"), col("text"), maxPostings = 100)
        .filter(col("n_postings") > 100 || col("n_postings") =!= least(col("df"), lit(100)))
        .count()
      println(f"[stressx] invertedIndex(cap=100): $iiSec%.1f s, $iiRows terms, cap violations=$iiBad")
      println(s"[stressx]   plan: $iiH")
      assert(iiRows <= 100000 + 1, s"vocab-bounded term count: $iiRows") // 100k vocab
      assert(iiBad == 0L)

      val te = operators.TextOps.tokenEntropy(corpus, col("id"), col("text"), minEntropy = 2.0)
      val (teSec, teRows, teH, _) = run(te)
      val teBad = operators.TextOps
        .tokenEntropy(corpus, col("id"), col("text"), minEntropy = 2.0)
        .filter(col("entropy") > math.log(40.0) + 1e-9 || col("entropy") < 0.0)
        .count()
      // A/B vs the two-exchange aggregation spec: same answers (6dp, up
      // to a rounding-boundary ulp), one exchange-ful plan vs zero
      val (tdSec, tdRows, tdH, _) =
        run(operators.TextOps.tokenEntropyDeclarative(corpus, col("id"), col("text"), minEntropy = 2.0))
      val teDiff = operators.TextOps.tokenEntropy(corpus, col("id"), col("text"))
        .select(col("doc_id"), col("entropy").as("e_n"))
        .join(
          operators.TextOps.tokenEntropyDeclarative(corpus, col("id"), col("text"))
            .select(col("doc_id"), col("entropy").as("e_d")),
          "doc_id"
        )
        .filter(abs(col("e_n") - col("e_d")) > 1.1e-6)
        .count()
      println(f"[stressx] tokenEntropy NATIVE (zero-shuffle projection): $teSec%.1f s, $teRows docs, out-of-range=$teBad (bound ln 40)")
      println(f"[stressx]   vs declarative two-exchange agg: $tdSec%.1f s ($tdRows rows) — ${tdSec / teSec}%.1fx; value diffs past 6dp+ulp: $teDiff")
      println(s"[stressx]   plan native: $teH | declarative: $tdH")
      assert(teRows == corpusN && teBad == 0L && tdRows == corpusN && teDiff == 0L)
    }

    // ---- quantized ANN (x42) at full vector width: 10 queries against
    // nVecs int8-quantized candidates, tight 4x-k shortlist, recall
    // measured against float64 brute force on the same corpus.
    if (section("qknn")) locally {
      val dim = 64
      val vecs = spark.range(nVecs).select(
        col("id").as("vec_id"),
        transform(
          sequence(lit(0), lit(dim - 1)),
          k => (pmod(xxhash64(col("id"), k), lit(2001)).cast("double") / 1000.0 - 1.0)
        ).as("embedding")
      ).persist()
      vecs.count()
      val qs = vecs.filter(col("vec_id") < 10)
      val qk = operators.Similarity.quantizedTopK(vecs, qs, "embedding", "vec_id", k = 5, shortlist = 20)
      val (sec, nRows, h, _) = run(qk)
      val got = qk.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val bf = operators.Similarity
        .bruteForceTopK(vecs, qs, "embedding", "vec_id", k = 5)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val recall = (bf & got).size.toDouble / bf.size
      println(f"[stressx] quantizedTopK(k=5, shortlist=20) @ $nVecs%d vectors: $sec%.1f s, $nRows rows, recall vs fp64 brute force=$recall%.3f")
      println(s"[stressx]   plan: $h")
      assert(nRows == 50, s"10 queries x top-5: $nRows")
      assert(recall >= 0.9, s"quantized recall: $recall")
      vecs.unpersist()
    }

    // ---- hashed-feature classifier (x36) at full corpus width: 40-token
    // docs explode to 40n feature rows, but map-side partial aggregation
    // must collapse them BEFORE the exchange — the scaladoc's "~one row
    // per document" claim, asserted against the actual shuffle-write
    // record count (docs are contiguous within their input partition, so
    // each doc's partial sum leaves its mapper as exactly one row).
    if (section("classifier")) locally {
      val weights = Array.tabulate(operators.TextOps.hashedFeatureDim) { b =>
        (b.toLong * 2654435761L) % 1001L - 500L
      }
      val shufRec = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) { shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten); () }
        }
      }
      val scored = operators.TextOps.scoreLinearHashed(corpus, col("id"), col("text"), weights)
      spark.sparkContext.addSparkListener(listener)
      val (sec, nRows, h, _) =
        try { val r = run(scored); Thread.sleep(2000); r }
        finally spark.sparkContext.removeSparkListener(listener)
      val rec = shufRec.get()
      val perDoc = rec.toDouble / corpusN
      println(f"[stressx] scoreLinearHashed: $sec%.1f s, $nRows docs scored (40 tokens each), exchange carried $rec records = $perDoc%.3f rows/doc")
      println(s"[stressx]   plan: $h")
      assert(nRows == corpusN, s"one row per doc: $nRows vs $corpusN")
      assert(perDoc < 1.2, s"exchange must carry ~1 row/doc, got $perDoc")
    }

    // ---- round-9 curation surface (x45-x54) at full corpus width
    if (section("curation9")) locally {
      // perplexityGate: model trained on a 1% reference sample (~2M
      // distinct bigrams at 40 tokens/doc over the 100k vocab — the
      // broadcast path's upper-mid range); the corpus itself must never
      // shuffle before the per-doc mean
      val train = corpus.filter(col("id") < TwinOffset && pmod(col("id"), lit(100)) === 0)
      val pg = operators.TextOps
        .perplexityGate(corpus, col("id"), col("text"), train, col("text"), minLogProb = -12.0)
      val (pgSec, pgRows, pgH, _) = run(pg)
      println(f"[stressx] perplexityGate(1%% train sample): $pgSec%.1f s, $pgRows docs scored")
      println(s"[stressx]   plan: $pgH")
      assert(pgRows == corpusN, s"one row per doc: $pgRows vs $corpusN")

      // gopher gate: zero-shuffle rule projection over the whole corpus
      val gq = operators.TextOps.gopherQualityGate(
        corpus, col("id"), col("text"), minWords = 30, minAlphaFrac = 0.0, minStopHits = 0)
      val (gqSec, gqRows, gqH, _) = run(gq)
      println(f"[stressx] gopherQualityGate: $gqSec%.1f s, $gqRows docs (${corpusN / math.max(gqSec, 0.001) / 1e6}%.1f M docs/s)")
      println(s"[stressx]   plan: $gqH")
      assert(gqRows == corpusN)

      // capPerDomain under REAL skew: one domain holds 50% of the corpus,
      // 1000 normal domains share the rest. A/B: the default plain window
      // (WindowGroupLimit bounds per-task state at O(cap) BEFORE the
      // exchange — the measured winner and the reason it is the default)
      // vs the engine-independent hash-quantile prefilter, which must be
      // row-identical.
      val domains = corpus.select(
        col("id"),
        when(pmod(col("id"), lit(2)) === 0, lit("hot"))
          .otherwise(concat(lit("d"), pmod(xxhash64(col("id")), lit(1000)))).as("dom")
      ).persist()
      domains.count()
      val capped = operators.CorpusOps
        .capPerDomain(domains, col("id"), col("dom"), cap = 100, prefilter = true)
      val (cpSec, cpRows, cpH, _) = run(capped)
      val specDf = operators.CorpusOps.capPerDomain(domains, col("id"), col("dom"), cap = 100)
      val t0 = System.nanoTime()
      val specRows = specDf.queryExecution.toRdd.count()
      val wSec = (System.nanoTime() - t0) / 1e9
      val diffs = capped.exceptAll(specDf).count() + specDf.exceptAll(capped).count()
      println(f"[stressx] capPerDomain(cap=100, 50%%-skew hot domain): $cpSec%.1f s prefiltered vs $wSec%.1f s plain WindowGroupLimit window (default; $cpRows vs $specRows rows), row diffs=$diffs")
      println(s"[stressx]   plan prefiltered: $cpH")
      assert(cpRows == specRows && diffs == 0L, s"prefilter must be exact: $cpRows/$specRows/$diffs")
      domains.unpersist()

      // assignShards: distributed-exact global rank — bijection 0..n-1,
      // every shard except the last cut at exactly shardSize
      val shardSize = 8192
      val sh = operators.CorpusOps.assignShards(corpus, col("id"), shardSize)
      val (shSec, shRows, shH, _) = run(sh)
      val shStats = operators.CorpusOps.assignShards(corpus, col("id"), shardSize)
        .agg(
          countDistinct(col("rank")).as("dr"),
          min(col("rank")).as("mn"),
          max(col("rank")).as("mx")
        ).head()
      val shBad = operators.CorpusOps.assignShards(corpus, col("id"), shardSize)
        .groupBy(col("shard")).count()
        .filter(col("count") =!= shardSize && col("shard") =!= (corpusN - 1) / shardSize)
        .count()
      println(f"[stressx] assignShards(shardSize=$shardSize): $shSec%.1f s, $shRows rows; distinct ranks=${shStats.getLong(0)}, range [${shStats.getLong(1)}, ${shStats.getLong(2)}], off-size shards (excl. last)=$shBad")
      println(s"[stressx]   plan: $shH")
      assert(shRows == corpusN && shStats.getLong(0) == corpusN)
      assert(shStats.getLong(1) == 0L && shStats.getLong(2) == corpusN - 1 && shBad == 0L)

      // dsirResample: raw corpus where 10% of docs are target-like (tokens
      // from a 100-token vocab slice; the rest from the full 100k) — the
      // k=10k draw must land almost entirely in the target-like tenth
      def toksMod(mod: Int): Column =
        concat_ws(" ", (0 until 40).map(k => pmod(xxhash64(col("base_id"), lit(k)), lit(mod)).cast("string")): _*)
      val raw2 = spark.range(nDocs).select(col("id"), col("id").as("base_id"))
        .select(col("id"), when(pmod(col("id"), lit(10)) === 0, toksMod(100)).otherwise(toksMod(100000)).as("text"))
      val target2 = spark.range(nDocs, nDocs + 50000).select(col("id"), col("id").as("base_id"))
        .select(col("id"), toksMod(100).as("text"))
      val ds = operators.CorpusOps
        .dsirResample(raw2, col("id"), col("text"), target2, col("text"), k = 10000)
      val (dsSec, dsRows, dsH, _) = run(ds)
      val picked = operators.CorpusOps
        .dsirResample(raw2, col("id"), col("text"), target2, col("text"), k = 10000)
        .persist()
      val inTarget = picked.filter(pmod(col("doc_id"), lit(10)) === 0).count()
      println(f"[stressx] dsirResample(k=10000) @ $nDocs%d raw docs: $dsSec%.1f s, $dsRows rows, target-like picks=$inTarget/10000")
      println(s"[stressx]   plan: $dsH")
      assert(dsRows == 10000L && inTarget >= 9900L, s"DSIR must prefer the planted tenth: $inTarget")
      picked.unpersist()

      // heavyHitters over ~202M tokens: exact top-20 + CMS-bound gate
      // (the operator materializes eagerly — time the call itself)
      val t1 = System.nanoTime()
      val hhRows = operators.CorpusOps.heavyHitters(corpus, col("text"), k = 20, eps = 1e-4).collect()
      val hhSec = (System.nanoTime() - t1) / 1e9
      val hhOk = hhRows.forall(_.getBoolean(3))
      println(f"[stressx] heavyHitters(k=20, eps=1e-4) @ ~${corpusN * 40 / 1000000}%d M tokens: $hhSec%.1f s, ${hhRows.length} winners, all inside CMS bound=$hhOk")
      assert(hhRows.length == 20 && hhOk)

      // cdcChunks: zero-shuffle content-defined chunking; token mass must
      // be conserved across chunk boundaries
      val cc = operators.CorpusOps.cdcChunks(corpus, col("id"), col("text"))
      val (ccSec, ccRows, ccH, _) = run(cc)
      val ccToks = operators.CorpusOps.cdcChunks(corpus, col("id"), col("text"))
        .agg(sum(col("n_tokens"))).head().getLong(0)
      println(f"[stressx] cdcChunks: $ccSec%.1f s, $ccRows chunks (${ccRows.toDouble / corpusN}%.1f per doc), token mass $ccToks vs ${corpusN * 40}")
      println(s"[stressx]   plan: $ccH")
      assert(ccToks == corpusN * 40, s"chunking must conserve tokens: $ccToks")

      // vocabOverlap between the corpus halves: both draw the full 100k
      // vocab, so exact J≈1 and the 64-hash sketch must agree within tol
      val grouped = corpus.select(
        when(pmod(col("id"), lit(2)) === 0, lit("a")).otherwise(lit("b")).as("g"),
        col("text")
      )
      val vo = operators.CorpusOps.vocabOverlap(grouped, col("g"), col("text"), numHashes = 64)
      val t2 = System.nanoTime()
      val voRow = vo.head()
      val voSec = (System.nanoTime() - t2) / 1e9
      println(f"[stressx] vocabOverlap(64 hashes): $voSec%.1f s — |A|=${voRow.getLong(2)} |B|=${voRow.getLong(3)} J=${voRow.getDouble(5)}%.4f est_ok=${voRow.getBoolean(6)}")
      assert(voRow.getDouble(5) > 0.99 && voRow.getBoolean(6))

      // sampleWeighted: one corpus scan + TakeOrdered. A-Res inclusion is
      // weight-proportional for k << N: the 1%-at-1000x tail holds
      // 50.5/55.55 = 90.9% of total weight, so E[heavy picks] = 9091 of
      // 10000 (sd ~29) — gate on the binomial band, not "all heavy"
      val weighted = corpus.select(
        col("id"),
        when(pmod(col("id"), lit(100)) === 0, lit(1000.0)).otherwise(lit(1.0)).as("w")
      )
      val sw = operators.CorpusOps.sampleWeighted(weighted, col("id"), col("w"), k = 10000)
      val (swSec, swRows, swH, _) = run(sw)
      val swHeavy = operators.CorpusOps.sampleWeighted(weighted, col("id"), col("w"), k = 10000)
        .filter(pmod(col("doc_id"), lit(100)) === 0).count()
      // expected heavy picks from the exponential key race: -key_i ~
      // Exp(w_i); solve the top-k threshold t* with
      // heavy·(1-e^{-1000t}) + light·(1-e^{-t}) = k, then
      // E[heavy] = heavy·(1-e^{-1000 t*}) (≈ weight-proportional for
      // k << pools, ≈ the whole pool when it fits inside k)
      val heavyPool = weighted.filter(pmod(col("id"), lit(100)) === 0 && col("w") > 0).count()
      val lightPool = corpusN - heavyPool
      def taken(t: Double): Double =
        heavyPool * (1 - math.exp(-1000 * t)) + lightPool * (1 - math.exp(-t))
      var (lo, hi) = (0.0, 1.0)
      (0 until 60).foreach { _ =>
        val mid = (lo + hi) / 2; if (taken(mid) < 10000.0) lo = mid else hi = mid
      }
      val expHeavy = heavyPool * (1 - math.exp(-1000 * (lo + hi) / 2))
      val band = 4 * math.sqrt(10000.0)
      println(f"[stressx] sampleWeighted(k=10000, 1%% @ 1000x weight): $swSec%.1f s, heavy picks=$swHeavy/10000 (expected ~${expHeavy.round})")
      println(s"[stressx]   plan: $swH")
      assert(swRows == 10000L && math.abs(swHeavy - expHeavy) <= band,
        s"heavy picks must sit in the weight-proportional band: $swHeavy vs ${expHeavy.round}±$band")

      // randomProject 64 -> 8 dims over the 2M-vector corpus: zero-shuffle
      // native-dot projection throughput
      val dim = 64
      val rpVecs = spark.range(nVecs).select(
        col("id").as("vec_id"),
        transform(
          sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id"), i), lit(2001)).cast("float") / 1000.0f - 1.0f)
        ).as("embedding")
      )
      val rp = operators.Similarity.randomProject(rpVecs, col("vec_id"), col("embedding"), dim, k = 8)
      val (rpSec, rpRows, rpH, _) = run(rp)
      println(f"[stressx] randomProject(64->8) @ $nVecs%d vectors: $rpSec%.1f s, $rpRows rows (${nVecs / math.max(rpSec, 0.001) / 1e6}%.2f M vec/s)")
      println(s"[stressx]   plan: $rpH")
      assert(rpRows == nVecs * 8)

      // BPE: train 32 merges on the full corpus (vocab-sized rounds after
      // one corpus collapse), then segment every doc with the native
      // apply kernel — the tokenizer-bootstrap path at corpus scale
      val tBpe = System.nanoTime()
      val bpeMerges = operators.TextOps.trainBpe(corpus, col("text"), numMerges = 32)
      val bpeTrainSec = (System.nanoTime() - tBpe) / 1e9
      val bpeSeg = corpus.select(
        col("id"),
        size(graft.functions.text.bpe_segment(col("text"), bpeMerges)).as("n_sub")
      )
      val (bpeSec, bpeRows, bpeH, _) = run(bpeSeg)
      val subStats = corpus
        .select(size(graft.functions.text.bpe_segment(col("text"), bpeMerges)).as("n_sub"),
          length(regexp_replace(col("text"), " ", "")).as("n_chars"))
        .agg(sum(col("n_sub")).as("subs"), sum(col("n_chars")).as("chars")).head()
      println(f"[stressx] trainBpe(32 merges) @ $corpusN%d docs: $bpeTrainSec%.1f s; bpe_segment: $bpeSec%.1f s, $bpeRows docs, ${subStats.getLong(0)} subwords vs ${subStats.getLong(1)} chars (${subStats.getLong(1).toDouble / subStats.getLong(0)}%.2f chars/subword)")
      println(s"[stressx]   plan: $bpeH")
      assert(bpeMerges.length == 32 && bpeRows == corpusN)
      assert(subStats.getLong(0) < subStats.getLong(1), "merges must compress below char count")

      // containment (quote detection): 12-token excerpts of 1% of docs —
      // every excerpt shingle lives in its source (C=1.0), and the 100k
      // vocab keeps background containment ≈ 0, so found == planted
      val excerpts = corpus
        .filter(col("id") < TwinOffset && pmod(col("id"), lit(100)) === 0)
        .select(
          (col("id") + 3 * TwinOffset).as("id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 12)).as("text")
        )
      val withEx = corpus.unionByName(excerpts)
      val cn = operators.Dedup
        .ngramContainmentPairs(withEx, col("text"), col("id"), n = 3, threshold = 0.9)
      val (cnSec, cnRows, cnH, _) = run(cn)
      val cnPlanted = operators.Dedup
        .ngramContainmentPairs(withEx, col("text"), col("id"), n = 3, threshold = 0.9)
        .filter(col("id_a") === col("id_b") + 3 * TwinOffset)
        .count()
      println(f"[stressx] ngramContainmentPairs(t=0.9, 1%% planted excerpts): $cnSec%.1f s, $cnRows pairs, excerpt→source found=$cnPlanted/${nDocs / 100}")
      println(s"[stressx]   plan: $cnH")
      assert(cnPlanted == nDocs / 100, s"every planted excerpt must be found: $cnPlanted")

      // image near-dup: aHash over 5M media planes, 1% planted same-length
      // re-encodes; the blocked join must find every planted pair that is
      // actually within the hamming bound (pigeonhole exactness, verified
      // against the per-pair recompute). Planes are md5-hex streams (512
      // bytes), NOT the token corpus: digit-token text collapses block
      // means onto a few values and reads as millions of spurious
      // hamming-0 "images" (measured: 3.35M background pairs at 204k
      // planes) — the r1 minhash lesson again, a testbed-construction
      // artifact real image planes don't have.
      val planes = corpus.select(col("id")).withColumn(
        "text",
        concat_ws("", (0 until 16).map(k => md5(concat(col("id").cast("string"), lit(s"_$k")))): _*)
      )
      val mediaCorpus = planes.unionByName(
        planes
          .filter(col("id") < TwinOffset && pmod(col("id"), lit(100)) === 0)
          .select((col("id") + 4 * TwinOffset).as("id"),
            concat(lit("zz"), expr("substring(text, 3)")).as("text"))
      )
      val media = operators.Multimodal.fromDocuments(
        spark,
        mediaCorpus.select(col("id").as("doc_id"), col("text"), lit("imgsrc").as("source"))
      )
      val ih = operators.Multimodal.imageNearDupPairs(media, maxHamming = 2)
      val (ihSec, ihRows, ihH, _) = run(ih)
      val fpsA = operators.Multimodal.aHash(media)
      val plantedEligible = fpsA
        .select(col("id").as("id_a"), col("simhash").as("fa"))
        .join(
          fpsA.select((col("id") - 4 * TwinOffset).as("id_a"), col("simhash").as("fb")),
          Seq("id_a")
        )
        .filter(operators.Dedup.hamming(col("fa"), col("fb")) <= 2)
        .count()
      val plantedFound = operators.Multimodal
        .imageNearDupPairs(media, maxHamming = 2)
        .filter(col("id_b") === col("id_a") + 4 * TwinOffset)
        .count()
      println(f"[stressx] imageNearDupPairs(aHash, h<=2) @ ${mediaCorpus.count()}%d planes: $ihSec%.1f s, $ihRows pairs; planted-eligible=$plantedEligible found=$plantedFound")
      println(s"[stressx]   plan: $ihH")
      assert(plantedFound == plantedEligible, s"pigeonhole recall must be total: $plantedFound != $plantedEligible")

      // snapshot diff at full width: 2% rewritten, ~3.2% removed, 1%
      // added — the id-keyed digest join; counts must tie out exactly
      val newCrawl = corpus
        .filter(pmod(col("id"), lit(31)) =!= 0)
        .select(
          col("id"),
          when(pmod(col("id"), lit(50)) === 0, concat(lit("rev2 "), col("text")))
            .otherwise(col("text")).as("text")
        )
        .unionByName(
          corpus
            .filter(pmod(col("id"), lit(100)) === 7)
            .select((col("id") + 5 * TwinOffset).as("id"), col("text"))
        )
      val sd = operators.CorpusOps
        .snapshotDiff(corpus, col("id"), col("text"), newCrawl, col("id"), col("text"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
      val t3 = System.nanoTime()
      val sdRows = sd.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sdSec = (System.nanoTime() - t3) / 1e9
      val removedExp = corpus.filter(pmod(col("id"), lit(31)) === 0).count()
      val changedExp = corpus
        .filter(pmod(col("id"), lit(31)) =!= 0 && pmod(col("id"), lit(50)) === 0).count()
      val addedExp = corpus.filter(pmod(col("id"), lit(100)) === 7).count()
      println(f"[stressx] snapshotDiff @ $corpusN%d docs: $sdSec%.1f s — $sdRows")
      assert(sdRows("removed") == removedExp && sdRows("changed") == changedExp &&
        sdRows("added") == addedExp &&
        sdRows("unchanged") == corpusN - removedExp - changedExp,
        s"drift counts must tie out: $sdRows vs removed=$removedExp changed=$changedExp added=$addedExp")

      // normalization-keyed dedup: whitespace-jittered re-crawls of 1% of
      // the corpus must collapse onto their source digests
      val jit = corpus
        .filter(col("id") < TwinOffset && pmod(col("id"), lit(100)) === 0)
        .select((col("id") + 2 * TwinOffset).as("id"),
          regexp_replace(col("text"), " ", "  ").as("text"))
      val nd = operators.Dedup.exact(corpus.unionByName(jit), col("text"), col("id"))
      val (ndSec, ndRows, ndH, _) = run(nd)
      val collapsed = operators.Dedup.exact(corpus.unionByName(jit), col("text"), col("id"))
        .filter(col("n_copies") >= 2).count()
      println(f"[stressx] normalized dedup (1%% whitespace-jittered re-crawls): $ndSec%.1f s, $ndRows digests, collapsed groups=$collapsed (planted ${nDocs / 100})")
      println(s"[stressx]   plan: $ndH")
      assert(collapsed == nDocs / 100, s"every jittered re-crawl must collapse: $collapsed vs ${nDocs / 100}")
      assert(ndRows == corpusN, s"digest count: $ndRows vs $corpusN")
    }

    // ---- round-9 second-cohort curation ops (x62-x66) at full width
    if (section("curation10")) locally {
      // PMI: random-token bigrams are ~all-distinct (the worst case for
      // the pair aggregate — the exchange carries one row per DISTINCT
      // bigram), with one planted collocation on every 100th doc whose
      // PMI ln(N/c12) ≈ 8.3 dwarfs the minCount=3 random ceiling (~5.1)
      val pmiCorpus = corpus.select(
        col("id"),
        concat(
          col("text"),
          when(pmod(col("id"), lit(100)) === 3, lit(" cola colb")).otherwise(lit(""))
        ).as("text")
      )
      val cPlanted = pmiCorpus.filter(col("text").endsWith(" cola colb")).count()
      val pmi = operators.CorpusOps.pmiCollocations(pmiCorpus, col("text"), minCount = 3, k = 50)
      val t0 = System.nanoTime()
      val pmiRows = pmi.collect()
      val pmiSec = (System.nanoTime() - t0) / 1e9
      val top = pmiRows.head
      val plantedRow = pmiRows.find(r => r.getString(0) == "cola" && r.getString(1) == "colb")
      println(f"[stressx] pmiCollocations(minCount=3, k=50) @ $corpusN%d docs: $pmiSec%.1f s; top=(${top.getString(0)},${top.getString(1)}) c12=${top.getLong(2)} pmi=${top.getDouble(3)}%.4f, planted rank=${pmiRows.indexWhere(r => r.getString(0) == "cola") + 1}")
      assert(plantedRow.isDefined, "planted collocation must reach the top-50")
      assert(plantedRow.get.getLong(2) == cPlanted,
        s"planted c12: ${plantedRow.get.getLong(2)} vs $cPlanted")
      assert(plantedRow.get.getDouble(3) > 8.0 && pmiRows.length == 50)
      // rank 1 only at full width: with per-token counts ~2020±45 the
      // minCount=3 random ceiling ln(3N/c1c2) ≈ 5.2 sits far under the
      // planted ln(N/c12) ≈ 8.3; at smoke scale (~81-count tokens) the
      // random ceiling ~9.2 legitimately overtakes it
      if (nDocs >= 1000000L)
        assert(top.getString(0) == "cola" && top.getString(1) == "colb",
          s"planted collocation must rank first at full width: $top")

      // epoch mixture under 50% skew: one hot domain holds half the
      // corpus; budgets recomputed independently from the collected
      // per-domain counts must tie out EXACTLY with the picks
      val domained = corpus.select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(2)) === 0, lit("hot"))
          .otherwise(concat(lit("d"), pmod(col("id"), lit(999)))).as("domain")
      )
      val mixBudget = corpusN
      val mix = operators.CorpusOps
        .epochMixture(domained, col("domain"), col("doc_id"), budget = mixBudget, maxEpochs = 2.0)
      val t1 = System.nanoTime()
      val picks = mix.groupBy(col("domain")).agg(sum(col("n_repeats")).as("picked"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val mixSec = (System.nanoTime() - t1) / 1e9
      val sumW = picks.values.map(v => math.sqrt(v._2.toDouble)).sum
      var expTotal = 0L
      picks.foreach { case (_, (picked, n)) =>
        val expect = math.min(
          math.floor(mixBudget.toDouble * math.sqrt(n.toDouble) / sumW),
          math.floor(2.0 * n)
        ).toLong
        assert(picked == expect, s"budget tie-out: picked=$picked expect=$expect n=$n")
        expTotal += expect
      }
      println(f"[stressx] epochMixture(budget=$mixBudget, maxEpochs=2) @ $corpusN%d docs, 50%%-skew hot + 999 cold domains: $mixSec%.1f s; domains=${picks.size}, total picks=$expTotal (hot=${picks("hot")._1}/${picks("hot")._2})")

      // leakage-safe split over the planted twin-pair graph: a (base,
      // twin) cluster must never straddle splits, and the cluster-level
      // assignment must keep the ~80/10/10 carve
      val twinPairs = corpus.filter(col("id") >= TwinOffset)
        .select((col("id") - TwinOffset).as("id_a"), col("id").as("id_b"))
      val lss = operators.ConnectedComponents
        .leakageSafeSplit(corpus.select(col("id")), col("id"), twinPairs)
      val t2 = System.nanoTime()
      val lssDf = lss.persist()
      val lssN = lssDf.count()
      val lssSec = (System.nanoTime() - t2) / 1e9
      val straddle = lssDf.groupBy(col("component"))
        .agg(countDistinct(col("split")).as("ns")).filter(col("ns") > 1).count()
      val carve = lssDf.groupBy(col("split")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val lssH = hist(lss)
      println(f"[stressx] leakageSafeSplit @ $lssN%d docs (${nDocs / 100}%d planted 2-clusters): $lssSec%.1f s; straddling clusters=$straddle, carve=$carve")
      println(s"[stressx]   plan: $lssH")
      assert(straddle == 0, s"clusters straddling splits: $straddle")
      assert(math.abs(carve("train").toDouble / lssN - 205.0 / 256) < 0.01)

      // norm outliers at nVecs: uniform-component vectors (norm ≈ 4.62,
      // σ ≈ 0.26) + 0.5% zeroed + 0.5% doubled — planted |z| ≈ 8.7 vs a
      // natural tail ≤ ~2.7 at 2M samples
      val dim = 64
      val vecComps = (0 until dim).map { j =>
        pmod(xxhash64(col("id"), lit(j)), lit(2001)).cast("double") / 1000.0 - 1.0
      }
      val natural = spark.range(nVecs).select(col("id"), array(vecComps: _*).as("v"))
      val planted2 = spark.range(nVecs / 200).select(
        (col("id") + TwinOffset).as("id"),
        transform(array(vecComps: _*), x => x * lit(0.0)).as("v")
      ).unionByName(spark.range(nVecs / 200).select(
        (col("id") + 2 * TwinOffset).as("id"),
        transform(array(vecComps: _*), x => x * lit(2.0)).as("v")
      ))
      val no = operators.Similarity
        .normOutliers(natural.unionByName(planted2), col("id"), col("v"), zThresh = 3.0)
      val (noSec, noRows, noH, _) = run(no)
      val noDf = no.persist()
      val flaggedPlanted = noDf.filter(col("is_outlier") && col("vec_id") >= TwinOffset).count()
      val flaggedNatural = noDf.filter(col("is_outlier") && col("vec_id") < TwinOffset).count()
      println(f"[stressx] normOutliers(|z|>3) @ $noRows%d vectors (${nVecs / 100}%d planted): $noSec%.1f s; planted flagged=$flaggedPlanted, natural flagged=$flaggedNatural")
      println(s"[stressx]   plan: $noH")
      assert(flaggedPlanted == nVecs / 200 * 2, s"all planted corruption flagged: $flaggedPlanted")
      assert(flaggedNatural <= 2, s"natural false positives: $flaggedNatural")
      noDf.unpersist()

      // mean pooling into 1000 groups: model-sized exchange (groups×dim
      // rows); one group's component re-derived independently must agree
      // to the 6dp round
      val grouped = natural.select(pmod(col("id"), lit(1000)).as("label"), col("v"))
      val mp = operators.Similarity.meanPoolByGroup(grouped, col("label"), col("v"))
      val (mpSec, mpRows, mpH, _) = run(mp)
      val mpDf = mp.persist()
      val nSum = mpDf.agg(sum(col("n_vecs"))).head().getLong(0)
      val g0 = mpDf.filter(col("group") === 0).select(element_at(col("vec"), 1)).head().getDouble(0)
      val g0exp = grouped.filter(col("label") === 0)
        .agg(avg(element_at(col("v"), 1))).head().getDouble(0)
      println(f"[stressx] meanPoolByGroup @ $nVecs%d vectors -> $mpRows%d groups: $mpSec%.1f s; member sum=$nSum, g0[0]=$g0%.6f (independent recompute ${g0exp}%.6f)")
      println(s"[stressx]   plan: $mpH")
      assert(mpRows == 1000 && nSum == nVecs)
      assert(math.abs(g0 - g0exp) < 1e-6, s"pooled component: $g0 vs $g0exp")
      mpDf.unpersist()
      lssDf.unpersist()
    }

    // ---- novelty scoring + zipf profile (x67/x68) at full width
    if (section("curation10b")) locally {
      // reference = a tenth of the corpus (~500k docs, ~19M distinct
      // 3-grams — past any broadcast-join build side): the fresh-crawl
      // regime where ~90% of scored grams are NOVEL, i.e. exactly what
      // the bloom prefilter exists for. Random 100k-vocab 3-grams live
      // in a ~1e15 space, so cross-slice gram collisions are O(1k) over
      // the whole corpus: members score EXACTLY 0, non-members ~1.
      // SIZING LESSON (first run of this section): the sketch originally
      // rode the plan as a scalar-subquery LITERAL, serialized into
      // EVERY task closure — a 96M-gram half-corpus reference at 2%
      // (~100 MB of bits) blew up task deserialization ("unread block
      // data" under GC-locker pressure). noveltyScoreBloom now ships
      // the filter as a BROADCAST (sketch.broadcastBloom: once per
      // executor, partials merged as task results), which removes the
      // ceiling — proven below by running the formerly-fatal regime.
      val ref = corpus.filter(pmod(col("id"), lit(10)) === 0)
      locally {
        val nb = operators.CorpusOps
          .noveltyScoreBloom(corpus, col("text"), col("id"), ref, col("text"),
            n = 3, expectedGrams = nDocs * 4, fpp = 0.02)
        val (nbSec, nbRows, nbH, _) = run(nb)
        val nbDf = nb.persist()
        val refBad = nbDf.filter(pmod(col("doc_id"), lit(10)) === 0 && col("novelty") =!= 0.0).count()
        val nonRefLow = nbDf.filter(pmod(col("doc_id"), lit(10)) =!= 0 && col("n_novel") =!= col("n_grams")).count()
        println(f"[stressx] noveltyScoreBloom @ $nbRows%d docs vs a ~19M-gram reference: $nbSec%.1f s; ref members scoring !=0: $refBad, non-members with any seen gram: $nonRefLow")
        println(s"[stressx]   plan: $nbH")
        assert(refBad == 0, s"reference members must score exactly 0: $refBad")
        assert(nonRefLow <= 5000, s"cross-slice gram collisions should be O(1k): $nonRefLow")
        nbDf.unpersist()

        // A/B: the exact path shuffles the full gram stream against the
        // reference gram set — the shape the bloom path exists to avoid
        val ne = operators.CorpusOps
          .noveltyScore(corpus, col("text"), col("id"), ref, col("text"), n = 3)
        val (neSec, neRows, neH, _) = run(ne)
        println(f"[stressx] noveltyScore (exact join path) @ $neRows%d docs: $neSec%.1f s")
        println(s"[stressx]   plan: $neH")
      }

      // the formerly-fatal regime: half-corpus reference (~96M grams,
      // ~100 MB filter at 2%). The broadcast path must simply work.
      // Collision mass is now 96M×96M/1e15 ≈ 9k grams -> ≤ ~9k docs.
      locally {
        val refBig = corpus.filter(pmod(col("id"), lit(2)) === 0)
        val nb = operators.CorpusOps
          .noveltyScoreBloom(corpus, col("text"), col("id"), refBig, col("text"),
            n = 3, expectedGrams = nDocs * 20, fpp = 0.02)
        val (nbSec, nbRows, _, _) = run(nb)
        val nbDf = nb.persist()
        val refBad = nbDf.filter(pmod(col("doc_id"), lit(2)) === 0 && col("novelty") =!= 0.0).count()
        val nonRefLow = nbDf.filter(pmod(col("doc_id"), lit(2)) =!= 0 && col("n_novel") =!= col("n_grams")).count()
        println(f"[stressx] noveltyScoreBloom @ $nbRows%d docs vs the ~96M-gram HALF-corpus reference (broadcast filter — the scalar-literal path died here): $nbSec%.1f s; ref members scoring !=0: $refBad, collision docs: $nonRefLow")
        assert(refBad == 0, s"reference members must score exactly 0: $refBad")
        assert(nonRefLow <= 20000, s"collision docs should be O(10k): $nonRefLow")
        nbDf.unpersist()
      }

      // zipf over ~202M tokens / 100k vocab: a UNIFORM vocabulary is the
      // anti-zipf corpus — slope ≈ 0 is exactly what the health check
      // should report for synthetic token soup
      val zp = operators.CorpusOps.zipfProfile(corpus, col("text"), topR = 1000)
      val t0 = System.nanoTime()
      val zr = zp.collect().head
      val zpSec = (System.nanoTime() - t0) / 1e9
      println(f"[stressx] zipfProfile(topR=1000) @ $corpusN%d docs (~202M tokens): $zpSec%.1f s; slope=${zr.getDouble(2)}%.4f r2=${zr.getDouble(4)}%.4f top_count=${zr.getLong(1)}")
      assert(zr.getLong(0) == 1000L)
      assert(math.abs(zr.getDouble(2)) < 0.05, s"uniform vocab must fit a near-zero slope: ${zr.getDouble(2)}")
      // max of 100k ~Binomial(40·corpusN, 1e-5) counts: mean + ~4.4σ
      val meanCount = corpusN * 40.0 / 100000.0
      assert(zr.getLong(1) > meanCount && zr.getLong(1) < meanCount + 8 * math.sqrt(meanCount) + 10,
        s"top count: ${zr.getLong(1)} vs mean $meanCount")
    }

    // ---- skip-gram co-occurrence, negative sampling, audio frames
    // (x69-x71) at full width
    if (section("curation10c")) locally {
      // window=2 doubles x62's already-worst-case distinct-pair exchange
      val co = operators.CorpusOps
        .pmiCollocations(corpus, col("text"), minCount = 3, k = 50, window = 2)
      val t0 = System.nanoTime()
      val coRows = co.collect()
      val coSec = (System.nanoTime() - t0) / 1e9
      println(f"[stressx] pmiCollocations(window=2, minCount=3) @ $corpusN%d docs (~400M candidate pairs): $coSec%.1f s; top c12=${coRows.head.getLong(2)}")
      assert(coRows.length == 50)

      // negatives: 8 draws per doc, hot-domain corpus (50% "hot") — the
      // rank join is uniform BY CONSTRUCTION (md5 draws), so the skewed
      // domain column cannot skew the join; survivors from "hot" docs
      // must all be cold-domain and vice versa
      val domained = corpus.select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(2)) === 0, lit("hot"))
          .otherwise(concat(lit("d"), pmod(col("id"), lit(999)))).as("domain")
      )
      val neg = operators.CorpusOps
        .sampleNegatives(domained, col("doc_id"), col("domain"), k = 8)
      val (negSec, negRows, negH, _) = run(neg)
      val negDf = neg.persist()
      val bad = negDf
        .join(domained.withColumnRenamed("doc_id", "j_id").withColumnRenamed("domain", "j_dom"),
          col("doc_id") === col("j_id"))
        .filter(col("neg_domain") === col("j_dom") || col("neg_id") === col("doc_id"))
        .count()
      val perDocMax = negDf.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      println(f"[stressx] sampleNegatives(k=8) @ $corpusN%d docs, 50%%-hot domains: $negSec%.1f s, $negRows survivors (${negRows.toDouble / corpusN}%.2f/doc), same-domain-or-self=$bad, max/doc=$perDocMax")
      println(s"[stressx]   plan: $negH")
      assert(bad == 0 && perDocMax <= 8)
      // hot docs draw uniformly: ~half their draws land cold and survive
      val hotSurvivors = negDf.join(
        domained.filter(col("domain") === "hot").select(col("doc_id")), Seq("doc_id")).count()
      val hotDocs = corpusN / 2
      assert(hotSurvivors > hotDocs * 3 && hotSurvivors < hotDocs * 5,
        s"hot docs should keep ~4 of 8 draws: $hotSurvivors vs $hotDocs docs")
      negDf.unpersist()

      // audio frames: pure projection + native kernel over ~1 GB of
      // byte planes; token mass ties out (40 tokens -> 235 bytes -> 29
      // frames per doc at frameSize=8)
      val media = corpus.select(
        col("id").as("doc_id"),
        encode(col("text"), "UTF-8").as("content")
      )
      val af = operators.Multimodal.audioFrames(media, frameSize = 8)
      val (afSec, afRows, afH, _) = run(af)
      val expFrames = corpus.select(sum(floor(length(col("text")) / 8)).cast("long")).head().getLong(0)
      println(f"[stressx] audioFrames(frameSize=8) @ $corpusN%d planes: $afSec%.1f s, $afRows frames (expected $expFrames)")
      println(s"[stressx]   plan: $afH")
      assert(afRows == expFrames, s"frame conservation: $afRows vs $expFrames")
    }

    // ---- audio segmentation, incremental fuzzy dedup, compression gate
    // (x72-x74) at full width
    if (section("curation10d")) locally {
      // audio segments over ~1.2 GB of planes with a planted silence run
      // spliced into every doc at char 64; conservation: Σ n_frames ==
      // active-frame count
      val media = corpus.select(
        col("id").as("doc_id"),
        encode(
          concat(
            substring(col("text"), 1, 64),
            lit("                "),
            substring(col("text"), 65, 1000000)
          ),
          "UTF-8"
        ).as("content")
      )
      // stress tokens are digit strings (rms ~52, vs letters ~100 in the
      // oracle corpus); spaces are 32 — gate at 40
      val segs = operators.Multimodal.audioSegments(media, frameSize = 8, silenceRms = 40.0)
      val (sgSec, sgRows, sgH, _) = run(segs)
      val segDf = segs.persist()
      val segFrames = segDf.agg(sum(col("n_frames"))).head().getLong(0)
      val activeFrames = operators.Multimodal
        .audioFrames(media, frameSize = 8)
        .filter(col("rms") >= 40.0)
        .count()
      val multiSeg = segDf.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).count()
      println(f"[stressx] audioSegments @ $corpusN%d planes: $sgSec%.1f s, $sgRows segments ($multiSeg docs split by the planted silence); frame conservation $segFrames == $activeFrames")
      println(s"[stressx]   plan: $sgH")
      assert(segFrames == activeFrames, s"active frames must all land in segments: $segFrames vs $activeFrames")
      assert(multiSeg > corpusN / 2, s"the planted silence should split most docs: $multiSeg")
      segDf.unpersist()

      // incremental fuzzy gate: 50k batch (half first-token-dropped twins
      // of corpus docs — J=37/38, recall 1-1e-11 — half salted fresh)
      // against the 5.05M-doc reference
      val reIngest = spark.range(nDocs / 200)
        .select((col("id") + 11L * TwinOffset).as("id"), col("id").as("base_id"))
        .select(col("id"), concat_ws(" ",
          slice(split(tokens(perturbFirst = false), " "), 2, 1000)).as("text"))
      // genuinely fresh: token streams from a base_id space the corpus
      // never used (prepending a token to a corpus text is NOT fresh
      // under Jaccard — 38/39 shared shingles — and the gate rightly
      // rejected that first formulation)
      val fresh = spark.range(nDocs / 200)
        .select((col("id") + 12L * TwinOffset).as("id"), (col("id") + 14L * TwinOffset).as("base_id"))
        .select(col("id"), tokens(perturbFirst = false).as("text"))
      val fuzzBatch = reIngest.unionByName(fresh)
      val fz = operators.Dedup.incrementalFuzzy(
        fuzzBatch, col("text"), col("id"), corpus, col("text"), col("id"),
        n = 3, numHashes = 32, bands = 16, threshold = 0.6)
      val (fzSec, fzRows, fzH, _) = run(fz)
      val fzDf = fz.persist()
      val twinsKept = fzDf.filter(col("id") < 12L * TwinOffset && col("kept")).count()
      val freshDropped = fzDf.filter(col("id") >= 12L * TwinOffset && !col("kept")).count()
      println(f"[stressx] incrementalFuzzy(50k batch vs $corpusN%d-doc reference): $fzSec%.1f s, $fzRows verdicts; twins kept=$twinsKept (want 0), fresh dropped=$freshDropped (want 0)")
      println(s"[stressx]   plan: $fzH")
      assert(fzRows == nDocs / 100, s"one verdict per batch doc: $fzRows")
      assert(twinsKept == 0, s"every near-dup re-ingest must be dropped: $twinsKept")
      assert(freshDropped == 0, s"fresh docs must pass: $freshDropped")
      fzDf.unpersist()

      // compression gate at full width: 1% single-token-repeated twins
      // must separate below 0.2 from every natural doc
      val compCorpus = corpus.unionByName(
        corpus.filter(pmod(col("id"), lit(100)) === 9)
          .select((col("id") + 13L * TwinOffset).as("id"),
            concat_ws(" ", array_repeat(element_at(split(col("text"), " "), 1), 40)).as("text"))
      )
      val comp = compCorpus.select(
        col("id"),
        operators.TextOps.compressionRatio(col("text")).as("ratio")
      )
      val t4 = System.nanoTime()
      val compStats = comp.agg(
        max(when(col("id") >= 13L * TwinOffset, col("ratio"))).as("maxp"),
        min(when(col("id") < 13L * TwinOffset, col("ratio"))).as("minn"),
        count(lit(1)).as("n")
      ).head()
      val compSec = (System.nanoTime() - t4) / 1e9
      println(f"[stressx] compressionRatio @ ${compStats.getLong(2)}%d docs: $compSec%.1f s; planted max=${compStats.getDouble(0)}%.4f natural min=${compStats.getDouble(1)}%.4f")
      assert(compStats.getDouble(0) < 0.2 && compStats.getDouble(1) > 0.2,
        s"separation: ${compStats.getDouble(0)} vs ${compStats.getDouble(1)}")
    }

    // ---- html extraction, jsonl ingest, winnowing (x75-x77) at width
    if (section("curation10e")) locally {
      // html: every doc wrapped in the x75 template; the extraction must
      // reproduce the directly-constructed expectation EXACTLY
      val html = concat(
        lit("<html><head><style>p { color: red }</style>" +
          "<script>if (x < 2 && y > 1) { alert(\"hi\"); }</script></head><body><h1>Doc</h1><p>"),
        col("text"),
        lit("</p><div>copy &amp; paste &lt;ok&gt;&nbsp;&#39;end&#39;</div></body></html>")
      )
      val extracted = corpus.select(
        col("id"),
        operators.TextOps.htmlExtract(html).as("ex"),
        concat(lit("Doc "), col("text"), lit(" copy & paste <ok> 'end'")).as("want")
      )
      val t0 = System.nanoTime()
      val exBad = extracted.filter(col("ex") =!= col("want")).count()
      val exSec = (System.nanoTime() - t0) / 1e9
      println(f"[stressx] htmlExtract @ $corpusN%d docs: $exSec%.1f s; mismatches=$exBad")
      assert(exBad == 0, s"extraction must match the constructed expectation: $exBad")

      // jsonl: identical-bytes lines, every 10th truncated
      val line = concat(
        lit("{\"doc_id\":"), col("id"),
        lit(",\"text\":\""), col("text"), lit("\",\"lang\":\"en\"}")
      )
      val built = corpus
        .select(col("id").as("line_id"), line.as("l"))
        .select(
          col("line_id"),
          when(col("line_id") % 10 === 3, expr("substring(l, 1, length(l) - 10)"))
            .otherwise(col("l")).as("line")
        )
      val parsed = operators.CorpusOps.jsonlIngest(built, col("line_id"), col("line"))
      val (pjSec, pjRows, pjH, _) = run(parsed)
      val pjDf = parsed.persist()
      val corrupt = pjDf.filter(col("is_corrupt")).count()
      val idMismatch = pjDf.filter(!col("is_corrupt") && col("doc_id") =!= col("line_id")).count()
      val corruptExp = corpus.filter(pmod(col("id"), lit(10)) === 3).count()
      println(f"[stressx] jsonlIngest @ $pjRows%d lines: $pjSec%.1f s; corrupt=$corrupt (want $corruptExp), id mismatches=$idMismatch")
      println(s"[stressx]   plan: $pjH")
      assert(corrupt == corruptExp && idMismatch == 0)
      pjDf.unpersist()

      // winnowing: ~2/(w+1) density over ~187M windows; positions in range
      val wn = operators.CorpusOps
        .winnowFingerprints(corpus, col("text"), col("id"), k = 4, w = 4)
      val (wnSec, wnRows, wnH, _) = run(wn)
      val totalWindows = corpus
        .select(sum(greatest(size(split(col("text"), " ")) - 3, lit(0))).cast("long"))
        .head().getLong(0)
      val density = wnRows.toDouble / totalWindows
      println(f"[stressx] winnowFingerprints(k=4, w=4) @ $corpusN%d docs, $totalWindows%d windows: $wnSec%.1f s, $wnRows selected (density $density%.3f, theory 2/(w+1)=0.4)")
      println(s"[stressx]   plan: $wnH")
      assert(density > 0.3 && density < 0.5, s"winnow density off: $density")
    }

    // ---- curation11: web-curation cohort (x78-x83) at width -------------
    if (section("curation11")) locally {
      // blocklist gate: hits must equal an independent token-level count
      // (tokens are digit strings; \b guarantees whole-token matches)
      val bl = operators.TextOps.blocklistGate(corpus, col("id"), col("text"), Seq("12345", "6789"))
      val (blSec, blRows, blH, _) = run(bl)
      val blDf = bl.persist()
      val gateHits = blDf.agg(sum(col("n_hits")).cast("long")).head().getLong(0)
      val refHits = corpus
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") === "12345" || col("tok") === "6789")
        .count()
      println(f"[stressx] blocklistGate @ $blRows%d docs: $blSec%.1f s; hits=$gateHits (token-level recount $refHits)")
      println(s"[stressx]   plan: $blH")
      assert(gateHits == refHits, s"blocklist hits mismatch: $gateHits != $refHits")
      blDf.unpersist()

      // encoding audit: planted corruption on id % 100 == 0, ASCII corpus
      // elsewhere -> zero false positives
      val dirty = corpus.select(
        col("id"),
        when(pmod(col("id"), lit(100)) === 0, concat(lit("Ã© â€™ "), col("text")))
          .otherwise(col("text")).as("text")
      )
      val eq = operators.TextOps.encodingQuality(dirty, col("id"), col("text"))
      val (eqSec, eqRows, _, _) = run(eq)
      val eqDf = eq.persist()
      val flagged = eqDf.filter(col("corrupt")).count()
      val plantedDirty = corpus.filter(pmod(col("id"), lit(100)) === 0).count()
      println(f"[stressx] encodingQuality @ $eqRows%d docs: $eqSec%.1f s; corrupt=$flagged (planted $plantedDirty, false positives ${flagged - plantedDirty})")
      assert(flagged == plantedDirty, s"encoding audit: $flagged != $plantedDirty")
      eqDf.unpersist()

      // catalog merge: catalog B re-publishes every 2nd doc of A under new
      // ids, catalog C every 4th; winner must always be A's copy, and
      // n_copies conservation must hold exactly
      val catA = corpus.select(col("id").as("doc_id"), col("text"))
      val catB = corpus.filter(pmod(col("id"), lit(2)) === 0)
        .select((col("id") + 300000000L).as("doc_id"), col("text"))
      val catC = corpus.filter(pmod(col("id"), lit(4)) === 0)
        .select((col("id") + 600000000L).as("doc_id"), col("text"))
      val merged = operators.CorpusOps
        .mergeCatalogs(Seq("a" -> catA, "b" -> catB, "c" -> catC), "doc_id", "text")
      val (mgSec, mgRows, mgH, _) = run(merged)
      val mgDf = merged.persist()
      val totalIn = catA.count() + catB.count() + catC.count()
      val copySum = mgDf.agg(sum(col("n_copies")).cast("long")).head().getLong(0)
      val wrongWinner = mgDf.filter(col("catalog") =!= "a").count()
      println(f"[stressx] mergeCatalogs @ $totalIn%d rows in 3 catalogs: $mgSec%.1f s; winners=$mgRows, copy-sum=$copySum, non-A winners=$wrongWinner")
      println(s"[stressx]   plan: $mgH")
      // every text exists in catalog A (B/C are subsets re-IDed), so A wins all
      assert(copySum == totalIn, s"copy conservation: $copySum != $totalIn")
      assert(wrongWinner == 0, s"priority violated on $wrongWinner winners")
      mgDf.unpersist()

      // url keep-best dedup under a 50%-skew hot key: half the corpus
      // shares ONE canonical url (the crawl-duplicate regime that kills a
      // window formulation); the agg+join shape must survive it
      val urls = corpus.select(
        col("id"),
        when(pmod(col("id"), lit(2)) === 0, lit("HTTPS://WWW.Hot.COM/page?utm_source=x"))
          .otherwise(concat(lit("https://site"), pmod(col("id"), lit(1000000)), lit(".com/p/"), col("id"), lit("?utm_a=1")))
          .as("url"),
        pmod(col("id"), lit(997)).cast("double").as("pref")
      )
      val kb = operators.Dedup.keepBestByKey(
        urls, operators.TextOps.urlNormalize(col("url")), col("pref"), col("id"))
      val (kbSec, kbRows, kbH, _) = run(kb)
      val kbDf = kb.persist()
      val keptN = kbDf.filter(col("kept")).count()
      val distinctKeys = kbDf.select(col("key")).distinct().count()
      val hotN = kbDf.filter(col("key") === "https://hot.com/page").count()
      val hotWinnerPref = kbDf
        .filter(col("key") === "https://hot.com/page" && col("kept"))
        .select(max(col("pref"))).head().getDouble(0)
      println(f"[stressx] urlNormalize+keepBestByKey @ $kbRows%d rows (hot key $hotN%d rows = ${100.0 * hotN / kbRows}%.0f%%): $kbSec%.1f s; kept=$keptN == distinct keys $distinctKeys")
      println(s"[stressx]   plan: $kbH")
      assert(keptN == distinctKeys, s"one winner per key: $keptN != $distinctKeys")
      assert(hotWinnerPref == 996.0, s"hot-key winner must carry max pref, got $hotWinnerPref")
      kbDf.unpersist()

      // vocab coverage: 202M token rows vs a 50k-token broadcast vocab;
      // OOV total must equal the independent token-level recount
      val vocab = spark.range(50000).select(col("id").cast("string").as("token"))
      val vc = operators.CorpusOps.vocabCoverage(corpus, col("id"), col("text"), vocab)
      val (vcSec, vcRows, vcH, _) = run(vc)
      val vcDf = vc.persist()
      val oovSum = vcDf.agg(sum(col("n_oov")).cast("long")).head().getLong(0)
      val refOov = corpus
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").cast("long") >= 50000)
        .count()
      println(f"[stressx] vocabCoverage @ $vcRows%d docs (~${40L * vcRows / 1000000}%d M tokens): $vcSec%.1f s; oov=$oovSum (recount $refOov)")
      println(s"[stressx]   plan: $vcH")
      assert(oovSum == refOov, s"oov mismatch: $oovSum != $refOov")
      vcDf.unpersist()

      // topic assignment: planted +0.5 on component (label = id % 10);
      // centroid training + zero-shuffle argmax must recover every label
      val dim = 64
      val tvecs = spark.range(nVecs).select(
        col("id").as("vec_id"),
        pmod(col("id"), lit(10)).as("label"),
        transform(
          sequence(lit(0), lit(dim - 1)),
          // components uniform(-1,1); the planted shift must DOMINATE the
          // per-dim noise (unlike x83's unit-norm table where ±0.125 noise
          // lets +0.5 win): +3.0 makes dot(v, c_label) >= 6 vs < 3 for any
          // other centroid, so argmax is provably planted
          k => (pmod(xxhash64(col("id"), k), lit(2000001)) - 1000000L).cast("double") / 1000000.0
            + when(k === pmod(col("id"), lit(10)), 3.0).otherwise(0.0)
        ).as("v")
      ).persist()
      tvecs.count()
      val t0c = System.nanoTime()
      val cents = operators.Similarity.trainTopicCentroids(tvecs, col("label"), col("v"))
      val centSec = (System.nanoTime() - t0c) / 1e9
      val ta = operators.Similarity.topicAssign(tvecs, col("vec_id"), col("v"), cents)
        .join(tvecs.select(col("vec_id"), col("label")), Seq("vec_id"))
      val (taSec, taRows, taH, _) = run(ta)
      val taDf = ta.persist()
      val wrong = taDf.filter(col("topic") =!= col("label")).count()
      val minMargin = taDf.select(min(col("margin"))).head().getDouble(0)
      println(f"[stressx] topicAssign @ $taRows%d vectors, 10 centroids: train $centSec%.1f s + assign $taSec%.1f s; mislabels=$wrong, min margin=$minMargin%.4f")
      println(s"[stressx]   plan: $taH")
      assert(wrong == 0, s"planted labels must all recover: $wrong wrong")
      assert(minMargin > 0.0, s"margin must be strictly positive, got $minMargin")
      taDf.unpersist(); tvecs.unpersist()
    }

    // ---- curation12: x84-x87 + curated sink at width --------------------
    if (section("curation12")) locally {
      // html metadata: canonical on ≡0 mod 4, noindex on ≡0 mod 5 — counts
      // must be exact, titles all non-empty
      val html = concat(
        lit("<html><head><title>Doc "), col("id"), lit("</title>"),
        when(pmod(col("id"), lit(4)) === 0,
          concat(lit("<link rel=\"canonical\" href=\"https://c.example/d/"), col("id"), lit("\"/>")))
          .otherwise(lit("")),
        when(pmod(col("id"), lit(5)) === 0, lit("<meta name=\"robots\" content=\"noindex\"/>"))
          .otherwise(lit("")),
        lit("</head><body><p>"), col("text"), lit("</p></body></html>")
      )
      val hm = operators.TextOps.htmlMeta(corpus.select(col("id"), html.as("h")), col("id"), col("h"))
      val (hmSec, hmRows, _, _) = run(hm)
      val hmDf = hm.persist()
      val nCanon = hmDf.filter(col("canonical").isNotNull).count()
      val nNoidx = hmDf.filter(col("noindex")).count()
      val nEmptyTitle = hmDf.filter(col("title") === "").count()
      val wantCanon = corpus.filter(pmod(col("id"), lit(4)) === 0).count()
      val wantNoidx = corpus.filter(pmod(col("id"), lit(5)) === 0).count()
      println(f"[stressx] htmlMeta @ $hmRows%d docs: $hmSec%.1f s; canonical=$nCanon (want $wantCanon), noindex=$nNoidx (want $wantNoidx), empty titles=$nEmptyTitle")
      assert(nCanon == wantCanon && nNoidx == wantNoidx && nEmptyTitle == 0)
      hmDf.unpersist()

      // cross-modal alignment: every 5th pair gets a WRONG partner vector;
      // planted counts must be exact on both sides of the gate
      val dim = 64
      def uvec(seedCol: Column): Column = transform(
        sequence(lit(0), lit(dim - 1)),
        k => (pmod(xxhash64(seedCol, k), lit(2000001)) - 1000000L).cast("double") / 1000000.0
      )
      val pairs = spark.range(nVecs).select(
        col("id").as("pair_id"),
        uvec(col("id")).as("a"),
        when(pmod(col("id"), lit(5)) === 0, uvec(col("id") + 777777777L))
          .otherwise(transform(uvec(col("id")), x => x * 1.000001)).as("b")
      )
      val ag = operators.Similarity.alignmentGate(pairs, col("pair_id"), col("a"), col("b"), 0.95)
      val (agSec, agRows, _, _) = run(ag)
      val agDf = ag.persist()
      val misaligned = agDf.filter(!col("aligned")).count()
      val wantMis = spark.range(nVecs).filter(pmod(col("id"), lit(5)) === 0).count()
      println(f"[stressx] alignmentGate @ $agRows%d pairs: $agSec%.1f s; misaligned=$misaligned (planted $wantMis)")
      assert(misaligned == wantMis, s"alignment gate: $misaligned != $wantMis")
      agDf.unpersist()

      // incremental semantic gate @ nVecs-ref: 20k perturbed twins (drop,
      // exact dup_of), 20k fresh (keep), plus a degenerate all-zero cell
      // (0.5% of ref + 1 batch item) that must SHED, not detonate
      val nB = 20000L
      val refV = spark.range(nVecs).select(
        col("id").as("vec_id"),
        when(pmod(col("id"), lit(200)) === 199, transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0)))
          .otherwise(uvec(col("id"))).as("v")
      )
      // sources id*100 stay inside [0, nVecs) and never hit the ≡199 mod
      // 200 zero rows (id*100 mod 200 ∈ {0, 100})
      val twinsV = spark.range(nB).select(
        (col("id") * 100 + TwinOffset).as("vec_id"),
        transform(uvec(col("id") * 100), x => x * 1.000001).as("v")
      )
      val freshV = spark.range(nB).select(
        (col("id") + 2 * TwinOffset).as("vec_id"),
        uvec(col("id") + 555555555L).as("v")
      )
      val zBatch = spark.range(1).select(
        (col("id") + 3 * TwinOffset).as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0)).as("v")
      )
      val batchV = twinsV.unionByName(freshV).unionByName(zBatch)
      // maxBucket below the 10k zero-cell size so the degenerate cell is
      // actually over-full (the guard, not NaN luck, must protect it)
      val isg = operators.Similarity.incrementalSemantic(
        batchV, col("vec_id"), col("v"), refV, col("vec_id"), col("v"),
        threshold = 0.95, maxBucket = 5000)
      val (isSec, isRows, isH, _) = run(isg)
      val isDf = isg.persist()
      val twinBad = isDf
        .filter(col("id") >= TwinOffset && col("id") < 2 * TwinOffset)
        .filter(col("kept") || col("dup_of") =!= col("id") - TwinOffset)
        .count()
      require(nB * 100 <= nVecs, "twin sources must exist in the reference")
      val freshDropped = isDf
        .filter(col("id") >= 2 * TwinOffset && col("id") < 3 * TwinOffset && !col("kept"))
        .count()
      val zeroKept = isDf.filter(col("id") === 3 * TwinOffset).head().getBoolean(3)
      println(f"[stressx] incrementalSemantic @ ${nVecs}%d ref (0.5%% degenerate zero cell), ${nB * 2 + 1}%d batch: $isSec%.1f s; twin errors=$twinBad, fresh dropped=$freshDropped, zero-cell batch item shed+kept=$zeroKept")
      println(s"[stressx]   plan: $isH")
      assert(twinBad == 0, s"twin gate errors: $twinBad")
      assert(freshDropped == 0, s"fresh items dropped: $freshDropped")
      assert(zeroKept, "degenerate-cell batch item must shed to kept")
      isDf.unpersist()

      // curriculum order @ corpus width under 70% tier skew: dense ranks,
      // collision-free interleave, no per-tier window (bucketed exchange)
      val tiered = corpus.select(
        col("id"),
        when(pmod(col("id"), lit(10)) < 7, lit(0))
          .when(pmod(col("id"), lit(10)) < 9, lit(1))
          .otherwise(lit(2)).as("tier")
      )
      val co = operators.CorpusOps.curriculumOrder(tiered, col("id"), col("tier"), nTiers = 3)
      val (coSec, coRows, coH, _) = run(co)
      val coDf = co.persist()
      val tierStats = coDf.groupBy(col("tier"))
        .agg(count(lit(1)).as("n"), max(col("rank_in_tier")).as("mx"))
        .filter(col("mx") =!= col("n") - 1)
        .count()
      val distinctOrders = coDf.select(col("train_order")).distinct().count()
      println(f"[stressx] curriculumOrder @ $coRows%d docs (70/20/10 tiers): $coSec%.1f s; non-dense tiers=$tierStats, distinct train_order=$distinctOrders")
      println(s"[stressx]   plan: $coH")
      assert(tierStats == 0 && distinctOrders == coRows)
      coDf.unpersist()

      // curated sink: shard + write + manifest-verify round trip at width
      val sinkDir = java.nio.file.Files.createTempDirectory("graft-sink-stress").toString + "/out"
      val sharded = operators.CorpusOps.assignShards(corpus, col("id"), shardSize = 100000)
      val t0w = System.nanoTime()
      val manifest = sources.CuratedSink.writeShards(sharded, sinkDir)
      val nShards = manifest.count()
      val wSec = (System.nanoTime() - t0w) / 1e9
      val badShards = sources.CuratedSink.verifyShards(spark, sinkDir).count()
      println(f"[stressx] writeShards @ $corpusN%d rows -> $nShards%d shards: $wSec%.1f s; verifyShards broken=$badShards")
      assert(badShards == 0, s"broken shards: $badShards")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(sinkDir).getParentFile)
    }

    // ---- curation13: audit/metric cohort (x88-x91) at width -------------
    if (section("curation13")) locally {
      // dataset card over 20 synthetic sources: totals must tie out
      // exactly against independent whole-corpus aggregates
      val sourced = corpus.select(
        col("id"),
        col("text"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        concat(lit("l"), pmod(col("id"), lit(7))).as("lang")
      )
      val card = operators.CorpusOps
        .datasetCard(sourced, col("source"), col("id"), col("text"), col("lang"))
      val (cdSec, cdRows, cdH, _) = run(card)
      val cdDf = card.persist()
      val docSum = cdDf.agg(sum(col("n_docs")).cast("long")).head().getLong(0)
      val tokSum = cdDf.agg(sum(col("n_tokens")).cast("long")).head().getLong(0)
      val tokRef = sourced.agg(sum(size(split(col("text"), " "))).cast("long")).head().getLong(0)
      println(f"[stressx] datasetCard @ $corpusN%d docs -> $cdRows%d sources: $cdSec%.1f s; doc-sum=$docSum, token-sum=$tokSum (recount $tokRef)")
      println(s"[stressx]   plan: $cdH")
      assert(docSum == corpusN && tokSum == tokRef)
      cdDf.unpersist()

      // recall@k on a 5M-query constructed set: planted recall classes
      // must count exactly
      val qs = spark.range(nDocs).select(col("id").as("q"))
      val truth = qs
        .select(col("q"), explode(sequence(lit(1), lit(3))).as("j"))
        .select(col("q"), (col("q") * 7 + col("j") * 13).as("n"))
      val results = qs
        .select(col("q"), explode(sequence(lit(1), lit(5))).as("r"))
        .select(
          col("q"),
          (col("q") * 7 + (col("r") + when(pmod(col("q"), lit(3)) === 0, 2).otherwise(0)) * 13).as("n"),
          col("r")
        )
      val rk = operators.Similarity
        .recallAtK(results, col("q"), col("n"), col("r"), truth, col("q"), col("n"), k = 4)
      val (rkSec, rkRows, rkH, _) = run(rk)
      val rkDf = rk.persist()
      val full = rkDf.filter(col("recall") === 1.0).count()
      val third = rkDf.filter(col("recall") === 0.333333).count()
      val wantThird = spark.range(nDocs).filter(pmod(col("id"), lit(3)) === 0).count()
      println(f"[stressx] recallAtK @ $rkRows%d queries (25M result rows): $rkSec%.1f s; recall=1.0 for $full, =1/3 for $third (want ${nDocs - wantThird}/$wantThird)")
      println(s"[stressx]   plan: $rkH")
      assert(full == nDocs - wantThird && third == wantThird)
      rkDf.unpersist()

      // split leakage at 500k pairs: conservation against the pair count
      val pairs = corpus
        .filter(pmod(col("id"), lit(10)) === 0)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val lk = operators.Audit.splitLeakage(
        pairs, col("a"), col("b"),
        operators.CorpusOps.hashSplit(corpus, col("id")), col("id"), col("split"))
      val (lkSec, _, lkH, _) = run(lk)
      val lkDf = lk.persist()
      val pairSum = lkDf.agg(sum(col("n_pairs")).cast("long")).head().getLong(0)
      val joined = pairs
        .join(corpus.select(col("id").as("b")), Seq("b"), "left_semi")
        .count()
      val leaked = lkDf.filter(col("leaked")).agg(coalesce(sum(col("n_pairs")), lit(0L)).cast("long")).head().getLong(0)
      println(f"[stressx] splitLeakage @ $joined%d pairs: $lkSec%.1f s; conserved=$pairSum, leaked=$leaked (hash split leaks ~38%% expected)")
      println(s"[stressx]   plan: $lkH")
      assert(pairSum == joined, s"pair conservation: $pairSum != $joined")
      assert(leaked > 0, "id-hash split must leak planted adjacent pairs")
      lkDf.unpersist()

      // calibration bins at width: counts conserve, uniform score means
      // sit mid-bin, pos rate ~1/3 everywhere
      val cb = operators.Audit.calibrationBins(
        corpus.select(
          operators.CorpusOps.hashUniform(col("id")).as("score"),
          (pmod(col("id"), lit(3)) === 0).as("label")
        ),
        col("score"), col("label"), bins = 10)
      val (cbSec, cbRows, _, _) = run(cb)
      val cbDf = cb.persist()
      val nSum = cbDf.agg(sum(col("n")).cast("long")).head().getLong(0)
      val worstGap = cbDf
        .agg(max(abs(col("pos_rate") - lit(1.0 / 3)))).head().getDouble(0)
      println(f"[stressx] calibrationBins @ $corpusN%d rows -> $cbRows%d bins: $cbSec%.1f s; count-sum=$nSum, worst |pos_rate-1/3|=$worstGap%.4f")
      assert(nSum == corpusN && cbRows == 10 && worstGap < 0.01)
      cbDf.unpersist()
    }

    // ---- curation14: code gate, intra-doc dedup, chunk round trip -------
    if (section("curation14")) locally {
      // code gate: planted classes must flag exactly
      val shaped = corpus.select(
        col("id"),
        when(pmod(col("id"), lit(9)) === 0, repeat(replace(col("text"), lit(" "), lit("")), 30))
          .when(pmod(col("id"), lit(9)) === 1, concat(lit("// auto-generated\n"), col("text")))
          .otherwise(col("text")).as("text")
      )
      val cg = operators.TextOps.codeQualityGate(shaped, col("id"), col("text"))
      val (cgSec, cgRows, _, _) = run(cg)
      val cgDf = cg.persist()
      val dropped = cgDf.filter(!col("kept")).count()
      val wantDrop = corpus.filter(pmod(col("id"), lit(9)) < 2).count()
      println(f"[stressx] codeQualityGate @ $cgRows%d docs: $cgSec%.1f s; dropped=$dropped (planted $wantDrop)")
      assert(dropped == wantDrop, s"code gate: $dropped != $wantDrop")
      cgDf.unpersist()

      // intra-doc line dedup: planted duplicate prefix line drops exactly
      // once per planted doc
      val l1 = substring(col("text"), 1, 40)
      val withDups = corpus.select(
        col("id"),
        when(pmod(col("id"), lit(7)) === 0, concat(l1, lit("\n"), col("text"), lit("\n"), l1))
          .otherwise(col("text")).as("text")
      )
      val idd = operators.CorpusOps.dedupLinesWithin(withDups, col("id"), col("text"))
      val (idSec, idRows, _, _) = run(idd)
      val idDf = idd.persist()
      val droppedLines = idDf
        .agg(sum(col("n_lines") - col("n_kept")).cast("long")).head().getLong(0)
      val wantLines = corpus.filter(pmod(col("id"), lit(7)) === 0).count()
      println(f"[stressx] dedupLinesWithin @ $idRows%d docs: $idSec%.1f s; lines dropped=$droppedLines (planted $wantLines)")
      assert(droppedLines == wantLines, s"intra-doc dedup: $droppedLines != $wantLines")
      idDf.unpersist()

      // chunk -> reassemble round trip at width: every doc must
      // digest-match its original
      val chunks = operators.CorpusOps.chunkTokens(corpus, col("id"), col("text"), chunkSize = 8)
      val back = operators.CorpusOps
        .reassembleChunks(chunks, col("doc_id"), col("chunk_idx"), col("chunk"))
        .join(corpus.select(col("id").as("doc_id"), md5(col("text")).as("want")), Seq("doc_id"))
        .select(col("doc_id"), (md5(col("text")) === col("want")).as("ok"))
      val (rtSec, rtRows, rtH, _) = run(back)
      val rtBad = back.filter(!col("ok")).count()
      println(f"[stressx] chunk(8)->reassemble @ $rtRows%d docs (~25M chunks): $rtSec%.1f s; mismatches=$rtBad")
      println(s"[stressx]   plan: $rtH")
      assert(rtBad == 0, s"round trip mismatches: $rtBad")
    }

    // ---- curation15: truncation + WARC framing at width -----------------
    if (section("curation15")) locally {
      // middle-out truncation: every 40-token doc cuts to exactly 24
      val tr = operators.CorpusOps.truncateTokens(corpus, col("id"), col("text"), maxTokens = 24)
      val (trSec, trRows, _, _) = run(tr)
      val trDf = tr.persist()
      val badKeep = trDf.filter(col("truncated") && col("kept_tokens") =!= 24).count()
      val nTrunc = trDf.filter(col("truncated")).count()
      println(f"[stressx] truncateTokens(24, middle_out) @ $trRows%d docs: $trSec%.1f s; truncated=$nTrunc, wrong-keep=$badKeep")
      assert(badKeep == 0 && nTrunc == trRows) // all docs are 40 tokens
      trDf.unpersist()

      // WARC framing: 5 records per blob, every 7th blob truncated — the
      // native parser must conserve records and isolate exactly one
      // invalid per damaged blob
      val record = concat(
        lit("WARC/1.0\nWARC-Target-URI: https://x/"), col("id"),
        lit("\nContent-Length: "), octet_length(col("text")),
        lit("\n\n"), col("text"), lit("\n\n")
      )
      val blobs = corpus
        .select((col("id") - pmod(col("id"), lit(5))).divide(lit(5)).cast("long").as("g"), col("id"), record.as("rec"))
        .groupBy(col("g"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("id"), col("rec")))), e => e.getField("rec")),
          ""
        ).as("blob"))
        .select(
          col("g"),
          when(pmod(col("g"), lit(7)) === 0, expr("substring(blob, 1, length(blob) - 5)"))
            .otherwise(col("blob")).as("blob")
        )
      val wi = operators.CorpusOps.warcIngest(blobs, col("g"), col("blob"))
      val (wiSec, wiRows, wiH, _) = run(wi)
      val wiDf = wi.persist()
      val nBlobs = blobs.count()
      val invalid = wiDf.filter(!col("is_valid")).count()
      val damaged = blobs.filter(pmod(col("g"), lit(7)) === 0).count()
      println(f"[stressx] warcIngest @ $nBlobs%d blobs -> $wiRows%d records: $wiSec%.1f s; invalid=$invalid (damaged blobs $damaged)")
      println(s"[stressx]   plan: $wiH")
      assert(wiRows == corpusN, s"record conservation: $wiRows != $corpusN")
      assert(invalid == damaged, s"invalid records: $invalid != $damaged")
      wiDf.unpersist()
    }

    // ---- pageRank: 5M nodes / ~15M edges / 5 synchronous iterations.
    // Invariants: node conservation and total-mass conservation (the
    // dangling redistribution makes Σpr = 1 an exact contract); the
    // timing covers the whole iterative job (localCheckpoint is eager).
    if (section("graph")) locally {
      val n = nDocs
      val ids = spark.range(n)
      val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L))
        .map { case (a, b) =>
          ids.select(col("id").as("src"), ((col("id") * a + b) % n).as("dst"))
        }
        .reduce(_ unionAll _)
        .where(col("src") =!= col("dst"))
      val t0 = System.nanoTime()
      val pr = operators.GraphOps.pageRank(edges, iters = 5).persist()
      val cnt = pr.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val total = pr.agg(sum(col("pr"))).head().getDouble(0)
      val mx = pr.agg(max(col("pr")), min(col("pr"))).head()
      println(f"[stressx] pageRank @ $n%d nodes / ~${n * 3}%d edges, 5 iters: $sec%.1f s; nodes=$cnt mass=$total%.9f pr∈[${mx.getDouble(1)}%.3e, ${mx.getDouble(0)}%.3e]")
      assert(cnt == n, s"node conservation: $cnt != $n")
      assert(math.abs(total - 1.0) < 1e-6, s"mass conservation: $total")
      pr.unpersist()
    }

    // ---- HITS at 5M nodes / 15M edges / 3 iterations: both score
    // vectors must L1-normalize to exactly-ish 1 every iteration.
    if (section("hits")) locally {
      val n = nDocs
      val ids = spark.range(n)
      val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L))
        .map { case (a, b) =>
          ids.select(col("id").as("src"), ((col("id") * a + b) % n).as("dst"))
        }
        .reduce(_ unionAll _)
        .where(col("src") =!= col("dst"))
      val t0 = System.nanoTime()
      val sc = operators.GraphOps.hits(edges, iters = 3).persist()
      val cnt = sc.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val sums = sc.agg(sum(col("hub")), sum(col("auth"))).head()
      println(f"[stressx] hits @ $n%d nodes / ~${n * 3}%d edges, 3 iters: $sec%.1f s; nodes=$cnt Σhub=${sums.getDouble(0)}%.9f Σauth=${sums.getDouble(1)}%.9f")
      assert(cnt == n)
      assert(math.abs(sums.getDouble(0) - 1.0) < 1e-6 && math.abs(sums.getDouble(1) - 1.0) < 1e-6)
      sc.unpersist()
    }

    // ---- redirect resolution at 5M sources: chains of length ≤ 15
    // toward each multiple of 16, 2-cycles planted at ≡1/≡2 mod 1000 —
    // resolved targets and the unresolved count must match the grammar
    // EXACTLY (pointer doubling is log-rounds, not a guess).
    if (section("redirects")) locally {
      val n = nDocs
      val c = pmod(col("id"), lit(1000))
      val redirects = spark
        .range(n)
        .where(c.isin(1L, 2L) || pmod(col("id"), lit(16)) =!= 0)
        .select(
          col("id").as("src"),
          when(c === 1, col("id") + 1).otherwise(col("id") - 1).as("dst")
        )
      val t0 = System.nanoTime()
      val res = operators.GraphOps.resolveRedirects(redirects, maxSteps = 16).persist()
      val cnt = res.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // grammar: cyc iff some id in [src - src%16, src] is ≡1/≡2 mod 1000
      val cycCol = (0 to 15)
        .map(j =>
          pmod(col("src"), lit(16)) >= j && pmod(col("src") - j, lit(1000)).isin(1L, 2L)
        )
        .reduce(_ || _)
      val wrong = res
        .withColumn("__cyc", cycCol)
        .filter(
          (col("__cyc") && col("is_resolved")) ||
            (!col("__cyc") && (!col("is_resolved") ||
              col("final_dst") =!= col("src") - pmod(col("src"), lit(16))))
        )
        .count()
      val unresolved = res.filter(!col("is_resolved")).count()
      println(f"[stressx] resolveRedirects @ $cnt%d sources (chains ≤15, cycles @ ≡1,2 mod 1000): $sec%.1f s; unresolved=$unresolved wrong=$wrong")
      assert(wrong == 0L, s"grammar mismatches: $wrong")
      res.unpersist()
    }

    // ---- PassJoin edit-distance pairs at 2M+ strings (60-char prefixes,
    // k=3): the planted twins perturb token 0, so the subset within
    // distance 3 is computable exactly from the twin mapping — PassJoin
    // must find precisely that subset (exactness, not recall).
    if (section("editdist")) locally {
      val strs = corpus
        .where(col("id") < 2000000L || col("id") >= TwinOffset)
        .select(col("id"), substring(col("text"), 1, 60).as("s"))
        .persist()
      val nStr = strs.count()
      val pairs = operators.EditDistance.editDistancePairs(strs, col("id"), col("s"), k = 3)
      val (sec, total, h, _) = run(pairs)
      val found = pairs.persist()
      val foundPlanted = found
        .filter(abs(col("id_b") - col("id_a")) === TwinOffset)
        .count()
      val eligible = strs
        .where(col("id") >= TwinOffset)
        .select((col("id") - TwinOffset).as("bid"), col("s").as("ts"))
        .join(strs.select(col("id").as("bid"), col("s").as("bs")), "bid")
        .filter(levenshtein(col("bs"), col("ts"), 3) >= 0)
        .count()
      println(f"[stressx] editDistancePairs(k=3) @ $nStr%d strings: $sec%.1f s, pairs=$total (planted-eligible=$eligible found=$foundPlanted, background=${total - foundPlanted})")
      println(s"[stressx]   plan: $h")
      assert(foundPlanted == eligible, s"PassJoin exactness: $foundPlanted != $eligible")
      found.unpersist()
      strs.unpersist()
    }

    // ---- gram matrix + power iteration at 2M × dim-64 vectors with a
    // planted dominant direction: the corpus-scale pass is the dim²
    // map-side-agg explode; the eigen step is driver math on the
    // collected 64×64 matrix. Asserts cell counts, planted alignment.
    if (section("spectral")) locally {
      val dim = 64
      val vecs = spark
        .range(nVecs)
        .select(
          array((0 until dim).map { j =>
            val noise = ((pmod(xxhash64(col("id"), lit(j)), lit(2001)) - 1000) / lit(1000.0))
            val planted = lit(if (j % 2 == 0) 0.125 else -0.125) * ((pmod(col("id"), lit(7)) + 1) * lit(0.3))
            (noise + planted).cast("double")
          }: _*).as("v")
        )
      val gram = operators.Spectral.gramMatrix(vecs, col("v"))
      val (sec, cells, h, _) = run(gram)
      val m = operators.Spectral.gramToMatrix(gram)
      val top = operators.Spectral.topComponent(m)
      val s8 = 1.0 / math.sqrt(dim.toDouble)
      val cosU = math.abs(top.zipWithIndex.map { case (x, j) => x * (if (j % 2 == 0) s8 else -s8) }.sum)
      val lambda = operators.Spectral.rayleigh(m, top)
      println(f"[stressx] gramMatrix @ $nVecs%d × $dim: $sec%.1f s, cells=$cells; top-component |cos|=$cosU%.4f λ=$lambda%.3e")
      println(s"[stressx]   plan: $h")
      assert(cells == dim.toLong * (dim + 1) / 2, s"cells: $cells")
      assert(cosU > 0.95, s"planted direction not recovered: $cosU")
    }

    // ---- domain boilerplate at 5M docs / 1000 domains: planted header
    // (100% df) + semi line (50%) stripped, rare line (1%) kept — the
    // clean text must equal the constructed expectation doc for doc.
    if (section("boiler")) locally {
      val dom = pmod(col("id"), lit(1000)).cast("string")
      val shaped = corpus.select(
        col("id"),
        dom.as("domain"),
        concat(
          lit("HDR "), dom, lit("\n"),
          when(pmod(col("id"), lit(2)) === 0, concat(lit("SEMI "), dom, lit("\n"))).otherwise(lit("")),
          col("text"),
          when(pmod(col("id"), lit(100)) === 0, concat(lit("\nRARE "), col("id"))).otherwise(lit(""))
        ).as("t")
      )
      val bp = operators.CorpusOps.domainBoilerplate(shaped, col("id"), col("domain"), col("t"))
      val (sec, rows, h, _) = run(bp)
      val bpP = bp.persist()
      val expected = corpus.select(
        col("id").as("doc_id"),
        md5(
          concat(
            col("text"),
            when(pmod(col("id"), lit(100)) === 0, concat(lit("\nRARE "), col("id"))).otherwise(lit(""))
          )
        ).as("want")
      )
      val mismatches = bpP
        .join(expected, "doc_id")
        .filter(md5(col("text_clean")) =!= col("want"))
        .count()
      val wrongBoiler = bpP
        .filter(col("n_boiler") =!= lit(1) + (lit(1) - pmod(col("doc_id"), lit(2))).cast("int"))
        .count()
      println(f"[stressx] domainBoilerplate @ $rows%d docs / 1000 domains: $sec%.1f s; clean-text mismatches=$mismatches wrong-boiler-counts=$wrongBoiler")
      println(s"[stressx]   plan: $h")
      assert(rows == corpusN, s"doc conservation: $rows != $corpusN")
      assert(mismatches == 0 && wrongBoiler == 0)
      bpP.unpersist()
    }

    // ---- bitext mining at calibration scale (8k × 8.8k = 70M scored
    // pairs, dim 64): every planted twin must be paired with its source,
    // mutual, and accepted; no other source may be accepted with a twin.
    if (section("bitext")) locally {
      val dim = 64
      def vec(saltCol: Column): Column =
        array((0 until dim).map { j =>
          ((pmod(xxhash64(saltCol, lit(j)), lit(2001)) - 1000) / lit(1000.0)).cast("double")
        }: _*)
      val xs = spark.range(8000).select(col("id"), vec(col("id")).as("v"))
      val twins = spark
        .range(800)
        .select((col("id") * 10).as("bid"))
        .select((col("bid") + TwinOffset).as("id"), transform(vec(col("bid")), x => x * lit(1.0005) + lit(0.0002)).as("v"))
      val distract = spark.range(8000).select((col("id") + 5000000L).as("id"), vec(col("id") + 5000000L).as("v"))
      val ys = twins.unionByName(distract)
      val bt = operators.Similarity.bitextMine(xs, ys, col("id"), col("v"), col("id"), col("v"))
      val (sec, rows, h, _) = run(bt)
      val btP = bt.persist()
      val twinHits = btP
        .filter(col("y_best") === col("x_id") + TwinOffset && col("accepted"))
        .count()
      val steals = btP.filter(col("y_best") >= TwinOffset && col("y_best") =!= col("x_id") + TwinOffset && col("accepted")).count()
      println(f"[stressx] bitextMine @ 8000 × 8800 (70M pairs, dim $dim): $sec%.1f s; twin-accepted=$twinHits/800 steals=$steals")
      println(s"[stressx]   plan: $h")
      assert(rows == 8000L, s"one row per source: $rows")
      assert(twinHits == 800L, s"twin recall: $twinHits")
      assert(steals == 0L)
      btP.unpersist()
    }

    // ---- gazetteer + markdown at 5M docs: ~1000-phrase dictionary of
    // corpus-lifted spans (every dict doc must self-match at pos 1,
    // exactly), then the markdown chain with per-doc count invariants.
    if (section("mdgaz")) locally {
      val dictDocs = corpus.where(pmod(col("id"), lit(5000)) === 0 && col("id") < TwinOffset)
      val nDict = dictDocs.count()
      val phrases = dictDocs.select(
        array_join(slice(split(col("text"), " "), 2, 3), " ").as("p"),
        concat(lit("L"), col("id")).as("l")
      )
      val tags = operators.TextOps
        .gazetteerTag(corpus, col("id"), col("text"), phrases, col("p"), col("l"))
      val (gSec, gRows, gH, _) = run(tags)
      val tagsP = tags.persist()
      val selfHits = tagsP
        .filter(col("label") === concat(lit("L"), col("doc_id")) && col("pos") === 1)
        .count()
      println(f"[stressx] gazetteerTag @ $corpusN%d docs × $nDict%d phrases: $gSec%.1f s, matches=$gRows (self-matches=$selfHits/$nDict)")
      println(s"[stressx]   plan: $gH")
      assert(selfHits == nDict, s"every dictionary span must self-match: $selfHits != $nDict")
      tagsP.unpersist()

      val md = corpus.select(
        col("id"),
        concat(
          lit("# T "), col("id"), lit("\n\n[l](https://x/"), col("id"),
          lit(")\n\n```\nc\n```\n\n"), col("text")
        ).as("m")
      )
      val ex = operators.TextOps.markdownExtract(md, col("id"), col("m"))
      val (mSec, mRows, _, _) = run(ex)
      val bad = ex.filter(col("n_code_blocks") =!= 1 || col("n_links") =!= 1).count()
      println(f"[stressx] markdownExtract @ $mRows%d docs: $mSec%.1f s; count-invariant violations=$bad")
      assert(mRows == corpusN && bad == 0)

      // sentence + format stats: pure projections; planted shapes give
      // exact count invariants (3 sentences + tail on ≡0 mod 4; shouty
      // verdict on upper-cased ≡0 mod 5)
      val sent = operators.TextOps.sentenceStats(
        corpus.select(
          col("id"),
          concat(
            col("text"), lit(". Two! Three?"),
            when(pmod(col("id"), lit(4)) === 0, lit(" tail")).otherwise(lit(""))
          ).as("t")
        ),
        col("t")
      )
      val (sSec, sRows, _, _) = run(sent)
      val sBad = sent
        .filter(
          col("n_sentences") =!= when(pmod(col("id"), lit(4)) === 0, 4).otherwise(3) ||
            col("has_terminal") === (pmod(col("id"), lit(4)) === 0)
        )
        .count()
      println(f"[stressx] sentenceStats @ $sRows%d docs: $sSec%.1f s; invariant violations=$sBad")
      assert(sRows == corpusN && sBad == 0)

      // the stress corpus is digit tokens (no letters), so uppercasing it
      // is a no-op — plant the letters explicitly
      val fmt = operators.TextOps.formatStats(
        corpus.select(
          col("id"),
          concat(
            when(pmod(col("id"), lit(5)) === 0, lit("SHOUTY HEADER TEXT "))
              .otherwise(lit("quiet header text ")),
            col("text")
          ).as("t")
        ),
        col("t")
      )
      val (fSec, fRows, _, _) = run(fmt)
      val fBad = fmt.filter(col("is_shouty") =!= (pmod(col("id"), lit(5)) === 0)).count()
      println(f"[stressx] formatStats @ $fRows%d docs: $fSec%.1f s; shouty-verdict violations=$fBad")
      assert(fRows == corpusN && fBad == 0)
    }

    // ---- candidates-restricted bitext at 200k × 202k via REAL LSH
    // blocking (64-bit hyperplane signature → 4 × 16-bit bands): the
    // production path the exact scorer's scaladoc promises. Asserts the
    // margin math routes EVERY candidate-surfaced planted pair (exact),
    // and the deterministic blocking recall stays ≥ 0.99.
    if (section("bitextlsh")) locally {
      val nx = 200000L
      def vec(saltCol: Column): Column =
        array((0 until 64).map { j =>
          ((pmod(xxhash64(saltCol, lit(j)), lit(2001)) - 1000) / lit(1000.0)).cast("double")
        }: _*)
      val xs = spark.range(nx).select(col("id"), vec(col("id")).as("v"))
      val twins = spark
        .range(2000)
        .select((col("id") * 100).as("bid"))
        .select(
          (col("bid") + TwinOffset).as("id"),
          transform(vec(col("bid")), x => x * lit(1.0005) + lit(0.0002)).as("v")
        )
      val distract = spark
        .range(nx)
        .select((col("id") + 5000000L).as("id"), vec(col("id") + 5000000L).as("v"))
      val ys = twins.unionByName(distract)
      def bandKeys(df: DataFrame, idName: String): DataFrame =
        df.select(col("id").as(idName), graft.functions.vector.hyperplane_sig(col("v"), 64).as("__sig"))
          .select(
            col(idName),
            explode(array((0 until 4).map { b =>
              concat_ws(
                ":",
                lit(b),
                shiftright(col("__sig"), b * 16).bitwiseAND(lit(0xFFFFL)).cast("string")
              )
            }: _*)).as("bk")
          )
      val cands = bandKeys(xs, "x_id")
        .join(bandKeys(ys, "y_id"), "bk")
        .select(col("x_id"), col("y_id"))
        .distinct()
        .persist()
      val mass = cands.count()
      val eligible = cands.filter(col("y_id") === col("x_id") + TwinOffset).count()
      val bt = operators.Similarity
        .bitextMineCandidates(xs, ys, col("id"), col("v"), col("id"), col("v"), cands)
        .persist() // the routed count below must not re-run the pipeline
      val (sec, rows, h, _) = run(bt)
      val routed = bt
        .filter(col("y_best") === col("x_id") + TwinOffset && col("accepted"))
        .count()
      println(f"[stressx] bitextMineCandidates @ LSH candidates=$mass%d (of ${nx * (nx + 2000)}%d possible): $sec%.1f s, rows=$rows; twin pairs surfaced=$eligible/2000 routed=$routed")
      println(s"[stressx]   plan: $h")
      assert(routed == eligible, s"margin math must route every surfaced twin: $routed != $eligible")
      assert(eligible >= 1980, s"deterministic LSH recall fell below 0.99: $eligible")
      bt.unpersist()
      cands.unpersist()
    }

    // ---- politeness schedule + curation funnel at 5M: the schedule's
    // per-domain windows (1000 domains × ~5k URLs) must produce exact
    // arithmetic slots; the funnel's stage counts must reconcile with
    // the planted duplicate mass (twins duplicate nothing textually, so
    // exact dedup keeps all; the case stage is the identity here).
    if (section("sched")) locally {
      val dom = concat(lit("src"), pmod(col("id"), lit(1000)))
      val robots = corpus
        .select(dom.as("domain"))
        .distinct()
        .select(
          col("domain"),
          concat(
            lit("User-agent: *\nCrawl-delay: "),
            pmod(regexp_extract(col("domain"), "src([0-9]+)", 1).cast("long"), lit(5)) + 1,
            lit("\n")
          ).as("txt")
        )
      val t0 = System.nanoTime()
      val sched = operators.Robots
        .politenessSchedule(
          corpus.select(col("id"), dom.as("d")),
          col("id"), col("d"), robots, col("domain"), col("txt"), "anybot"
        )
        .persist()
      val n = sched.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // exact invariant: per domain, max slot == (n_urls-1) * delay
      val badDomains = sched
        .groupBy(col("domain"), col("crawl_delay"))
        .agg(count(lit(1)).as("nu"), max(col("slot_s")).as("mx"))
        .filter(col("mx") =!= (col("nu") - 1) * col("crawl_delay"))
        .count()
      println(f"[stressx] politenessSchedule @ $n%d urls / 1000 domains: $sec%.1f s; slot-arithmetic violations (domains)=$badDomains")
      assert(n == corpusN && badDomains == 0)
      sched.unpersist()
    }

    // ---- SFT family at width (r9): transcripts with EXACT construction
    // invariants (the residue classes fix every count a priori), preference
    // pairs A/B'd against the window formulation, and Bradley-Terry with a
    // planted always-wins champion over 1000 items / ~5M comparisons.
    if (section("sft")) locally {
      // transcripts over the shared corpus (40 tokens/doc, so t1=t2=20)
      val tr = {
        val extra5 = when(col("id") % 5 === 0, lit("\nassistant: adding more detail")).otherwise(lit(""))
        val extra7 = when(col("id") % 7 === 0, lit("\nuser: thanks\nassistant: ")).otherwise(lit(""))
        val extra3 = when(col("id") % 3 === 0, lit("\nplease elaborate")).otherwise(lit(""))
        val orphan = when(col("id") % 11 === 0, lit("<<corrupt header>>\n")).otherwise(lit(""))
        val tk = split(col("text"), " ")
        val t1 = array_join(slice(tk, lit(1), lit(20)), " ")
        val t2 = array_join(slice(tk, lit(21), lit(20)), " ")
        corpus.select(
          col("id"),
          concat(
            orphan, lit("system: be concise"),
            lit("\nuser: "), t1, extra3,
            lit("\nassistant: "), t2, extra5, extra7
          ).as("t")
        )
      }
      val parsed = operators.ChatOps.parseTranscript(tr, col("id"), col("t"))
      val stats = operators.ChatOps.chatStats(parsed)
      val (sec1, n1, h1, _) = run(stats)
      val agg = operators.ChatOps
        .chatStats(operators.ChatOps.parseTranscript(tr, col("id"), col("t")))
        .agg(
          sum(col("n_turns").cast("long")).as("turns"),
          sum(col("n_orphan_lines").cast("long")).as("orph"),
          sum(col("n_empty_turns").cast("long")).as("empty"),
          sum(col("n_role_repeats").cast("long")).as("reps")
        )
        .head()
      def residue(m: Long): Long = corpus.filter(col("id") % m === 0).count()
      val (r5, r7, r11) = (residue(5), residue(7), residue(11))
      val expTurns = 3 * corpusN + r5 + 2 * r7
      println(f"[stressx] chatStats @ $n1%d transcripts: $sec1%.1f s; turns=${agg.getLong(0)} (expect $expTurns), orphans=${agg.getLong(1)} (expect $r11), empty=${agg.getLong(2)} (expect $r7), repeats=${agg.getLong(3)} (expect $r5)")
      println(s"[stressx]   plan: $h1")
      assert(agg.getLong(0) == expTurns && agg.getLong(1) == r11 && agg.getLong(2) == r7 && agg.getLong(3) == r5,
        "transcript construction invariants must hold exactly")
      // loss mass: t2 has exactly 20 tokens; the %5 extra (3 tokens) is an
      // assistant turn; the %7 extra is 'thanks' (ONE user token) plus an
      // EMPTY assistant turn -- so %7 adds 1 to total and 0 to loss
      val lm = operators.ChatOps
        .lossMass(operators.ChatOps.parseTranscript(tr, col("id"), col("t")))
        .agg(sum(col("loss_tokens").cast("long")).as("lt"), sum(col("total_tokens").cast("long")).as("tt"))
        .head()
      val expLoss = 20 * corpusN + 3 * r5
      val expTotal = (2 + 20 + 20) * corpusN + 2 * residue(3) + 3 * r5 + r7
      println(s"[stressx] lossMass: loss=${lm.getLong(0)} (expect $expLoss), total=${lm.getLong(1)} (expect $expTotal)")
      assert(lm.getLong(0) == expLoss && lm.getLong(1) == expTotal, "loss-mask token accounting must be exact")

      // preference pairs over 5M synthetic events (500k prompts x 10):
      // A/B the struct-agg operator against the window-rank formulation
      val nev = 5000000L
      val ev = spark.range(nev).select(
        pmod(col("id"), lit(500000L)).as("user_id"),
        col("id").as("event_id"),
        (pmod(xxhash64(col("id"), lit(9)), lit(1000000L)).cast("double") / 1e6).as("value")
      ).persist()
      ev.count()
      val pp = operators.ChatOps.preferencePairs(ev, col("user_id"), col("event_id"), col("value"))
      val (sec2, n2, h2, _) = run(pp)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      val twin = ev
        .select(
          col("user_id"), col("event_id"), col("value"),
          row_number().over(w.orderBy(col("value").desc, col("event_id").desc)).as("rb"),
          row_number().over(w.orderBy(col("value").asc, col("event_id").asc)).as("rw"),
          count(lit(1)).over(w).as("n")
        )
      val best = twin.filter(col("rb") === 1).select(col("user_id").as("prompt_id"), col("event_id").as("chosen_id"), col("value").as("bs"), col("n"))
      val worst = twin.filter(col("rw") === 1).select(col("user_id").as("prompt_id"), col("event_id").as("rejected_id"), col("value").as("ws"))
      val twinPairs = best.join(worst, "prompt_id").filter(col("n") >= 2 && col("bs") > col("ws"))
        .select(col("prompt_id"), col("chosen_id"), col("rejected_id"), round(col("bs") - col("ws"), 6).as("margin"), col("n").cast("long").as("n_candidates"),
          // every synthetic value is non-null, so the operator's null
          // accounting must read exactly zero
          lit(0L).as("n_null_scores"))
      val mism = pp.unionByName(twinPairs).groupBy(pp.columns.map(col): _*).agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      println(f"[stressx] preferencePairs @ $nev%d events / 500k prompts: $sec2%.1f s, pairs=$n2; window-twin mismatches=$mism")
      println(s"[stressx]   plan: $h2")
      assert(mism == 0, "struct-agg and window formulations must agree exactly")
      ev.unpersist()

      // bradley-terry: ~5M comparisons over 1000 items, item 0 planted as
      // an always-wins champion wherever it appears
      val nc = 5000000L
      val comps = spark.range(nc).select(
        pmod(xxhash64(col("id"), lit(1)), lit(1000L)).as("a"),
        pmod(xxhash64(col("id"), lit(2)), lit(1000L)).as("b"),
        pmod(xxhash64(col("id"), lit(3)), lit(2L)).as("coin")
      ).filter(col("a") =!= col("b"))
        .select(
          when(col("a") === 0 || (col("b") =!= 0 && col("coin") === 0), col("a")).otherwise(col("b")).as("winner"),
          when(col("a") === 0 || (col("b") =!= 0 && col("coin") === 0), col("b")).otherwise(col("a")).as("loser")
        ).persist()
      val ncomp = comps.count()
      val t0 = System.nanoTime()
      val bt = operators.ChatOps.bradleyTerry(comps, iters = 5).persist()
      val items = bt.count()
      val sec3 = (System.nanoTime() - t0) / 1e9
      val top = bt.orderBy(col("rank")).limit(1).head()
      val cons = bt.agg(sum(col("wins")).as("w"), sum(col("losses")).as("l"), sum(col("strength")).as("s")).head()
      println(f"[stressx] bradleyTerry @ $ncomp%d comparisons / $items%d items, 5 iters: $sec3%.1f s; champion=${top.getAs[Long]("item")} (strength=${top.getAs[Double]("strength")}%.3f), sum(wins)=${cons.getLong(0)} sum(losses)=${cons.getLong(1)} sum(strength)=${cons.getDouble(2)}%.4f")
      assert(top.getAs[Long]("item") == 0L, "planted champion must rank first")
      assert(cons.getLong(0) == ncomp && cons.getLong(1) == ncomp, "win/loss conservation")
      assert(math.abs(cons.getDouble(2) - items.toDouble) < 1e-3, "sum-to-N normalization")
      bt.unpersist(); comps.unpersist()
    }

    // ---- StreamSft at width: two 1M-candidate epochs (200k prompts × 5
    // candidates, 1% zero-supervision plants) through the full
    // parse→loss-gate→pairs→prompt-digest-store flow, 50% prompt overlap
    // between epochs, then an epoch replay — every count has an exact
    // planted expectation, and the store can only GROW by the new-prompt
    // mass (exactly-once on the digest store, the StreamDedup contract).
    if (section("streamsft")) locally {
      val store = java.nio.file.Files.createTempDirectory("stressx-sft").toString + "/prompts"
      val nPrompts = 200000L
      val candsPerPrompt = 5L
      def epochBatch(promptBase: Long): DataFrame =
        // id = j·nPrompts + p → candidate j (0..4) of prompt p: k is
        // DISTINCT within every prompt group (id % 5 would not be — the
        // stride is a multiple of 5)
        spark.range(nPrompts * candsPerPrompt).select(
          (col("id") + promptBase * candsPerPrompt).as("cand_id"),
          (pmod(col("id"), lit(nPrompts)) + promptBase).as("p"),
          floor(col("id") / lit(nPrompts)).as("k")
        ).select(
          col("cand_id"),
          // 1% of prompts lose their k=2 candidate (never k=0/k=4, so
          // min/max survive): no assistant turn → zero supervised tokens
          // → loss-gated out
          when(col("p") % 100 === 0 && col("k") === 2,
            concat(lit("user: prompt "), col("p")))
            .otherwise(concat(
              lit("user: prompt "), col("p"),
              lit("\nassistant: answer "), col("cand_id"), lit(" k"), col("k")
            )).as("t"),
          // distinct scores 0..4 per prompt → margin 4.0, chosen=k4, rejected=k0
          col("k").cast("double").as("score")
        )
      def runEpoch(batch: DataFrame, epoch: Long): (Long, Long, Long, Double) = {
        var accepted = 0L
        val t0 = System.nanoTime()
        val (nPairs, nDropped) = streaming.StreamSft.sftBatch(
          batch, "t", col("cand_id"), col("score"), store, epoch,
          (pairs, _) => accepted = pairs.count()
        )
        ((System.nanoTime() - t0) / 1e9) match { case sec => (nPairs, nDropped, accepted, sec) }
      }
      val (p0, d0, a0, s0) = runEpoch(epochBatch(0L), 0L)
      println(f"[stressx] streamSft epoch0 @ ${nPrompts * candsPerPrompt}%d candidates / $nPrompts%d prompts: $s0%.1f s, pairs=$p0 dropped=$d0 accepted=$a0")
      assert(p0 == nPrompts && a0 == nPrompts, s"epoch0 must pair every prompt: $p0/$a0")
      assert(d0 == nPrompts / 100, s"zero-supervision drop accounting: $d0")
      // epoch 1: prompts [nPrompts/2, 3·nPrompts/2) — half seen, half new
      val (p1, d1, a1, s1) = runEpoch(epochBatch(nPrompts / 2), 1L)
      println(f"[stressx] streamSft epoch1 (50%% overlap): $s1%.1f s, pairs=$p1 dropped=$d1 accepted=$a1")
      assert(p1 == nPrompts / 2 && a1 == nPrompts / 2, s"only the new-prompt half may pair: $p1/$a1")
      // replay epoch 1: same pairs re-derived, store not poisoned
      val (p1r, _, a1r, s1r) = runEpoch(epochBatch(nPrompts / 2), 1L)
      val storeRows = spark.read.option("basePath", store).parquet(store).count()
      println(f"[stressx] streamSft epoch1 replay: $s1r%.1f s, pairs=$p1r accepted=$a1r; store=$storeRows digests")
      assert(p1r == nPrompts / 2 && a1r == nPrompts / 2, s"replay must re-derive identically: $p1r")
      assert(storeRows == nPrompts + nPrompts / 2, s"store grows only by new-prompt mass: $storeRows")
    }

    // ---- round-9 curation newcomers at width: alphaRename with planted
    // alpha-twins and an exact class-count tie-out; Kneser-Ney with the
    // sum-to-one identity per history; driftReport with an exactly
    // symmetric control group (psi must be 0.0, not just small).
    if (section("curation16")) curation16Section(spark, corpus, nDocs)

    // ---- x146/x152/x149 linkage family: JW blocking, stitch join, ROUGE-2
    if (section("linkage")) linkageSection(spark, nDocs)

    // ---- StreamLinkage: continuous ER at 1M keys/epoch, planted attach/new
    if (section("streamlink")) streamLinkSection(spark, math.min(nDocs, 1000000L))

    // ---- x160 Aho-Corasick vs per-phrase regex chain A/B
    if (section("acscan")) acScanSection(spark, math.min(nDocs, 1000000L))
    if (section("blocklist")) blocklistSection(spark, math.min(nDocs, 1000000L))
    if (section("asof")) asofSection(spark, math.min(nDocs, 20000000L))
    if (section("media")) mediaSection(spark, math.min(nDocs, 200000L))
    if (section("ngramab")) ngramAbSection(spark)
    if (section("monsterrow")) monsterRowSection(spark, math.min(nDocs, 200000L))
    if (section("bpe1k")) bpe1kSection(spark, math.min(nDocs, 2000000L))

    corpus.unpersist()
    // machine-readable A/B rows (GRAFT_STRESS_JSON=<path>): the scale
    // curves as an artifact (STRESS_r*.json), not only prose stdout —
    // round-over-round comparable without parsing log lines
    sys.env.get("GRAFT_STRESS_JSON").filter(_.nonEmpty).foreach { p =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p),
        jsonRows.mkString("[\n", ",\n", "\n]")
      )
      println(s"[stressx] wrote ${jsonRows.length} A/B rows to $p")
    }
    spark.stop()
  }

  /** A/B rows for the GRAFT_STRESS_JSON artifact (one compact JSON object
    * per measurement, appended by the sections that run).
    */
  private val jsonRows = scala.collection.mutable.ArrayBuffer.empty[String]
  private def record(row: String): Unit = jsonRows.synchronized { jsonRows += row; () }

  /** BPE training at PRODUCTION merge counts: ≥1k merges over a Zipfian
    * word corpus in bounded wall time — the round-batching evidence (one
    * job per merge would be 1k+ pair-count jobs; the exact-prefix batch
    * accepts many merges per round without changing the result, which
    * the randomized batched==sequential spec pins). The A/B row times a
    * 64-merge prefix both ways on the same corpus.
    */
  private def bpe1kSection(spark: SparkSession, n: Long): Unit = {
    // Zipfian "words": rank in base-26 letters — natural-language-shaped
    // frequency decay so 1k merges stay above minPairCount
    val ranks = spark
      .range(n)
      .select(
        least(
          (floor(pow(lit(20001.0), pmod(xxhash64(col("id")), lit(1000000007L)).cast("double") / 1000000007.0)) - 1).cast("long"),
          lit(20000L)
        ).as("r")
      )
    val words = ranks.select(
      concat_ws(
        "",
        (0 until 4).map(i =>
          when(
            floor(col("r") / math.pow(26, i).toLong) > 0 || lit(i) === 0,
            chr(pmod(floor(col("r") / math.pow(26, i).toLong), lit(26L)) + 97)
          ).otherwise(lit(""))
        ): _*
      ).as("w")
    )
    val docs = words
      .groupBy(pmod(xxhash64(col("w")), lit(100000L)).as("g"))
      .agg(concat_ws(" ", collect_list(col("w"))).as("text"))
      .persist()
    val nDocs2 = docs.count()
    val t0 = System.nanoTime()
    val m1k = operators.TextOps.trainBpe(docs, col("text"), numMerges = 1000, batchSize = 64)
    val s1k = (System.nanoTime() - t0) / 1e9
    // A/B horizon 256: near the head the hot Zipf symbols make exact
    // batches intrinsically small (sequential equality REQUIRES stopping
    // at interacting pairs); the win compounds as the vocab diversifies
    val tA = System.nanoTime()
    val mB = operators.TextOps.trainBpe(docs, col("text"), numMerges = 256, batchSize = 64)
    val sB = (System.nanoTime() - tA) / 1e9
    val tC = System.nanoTime()
    val mS = operators.TextOps.trainBpe(docs, col("text"), numMerges = 256, batchSize = 1)
    val sS = (System.nanoTime() - tC) / 1e9
    println(
      f"[stressx] bpe1k @ $n%d words / $nDocs2%d docs: 1000 merges in $s1k%.1f s (batch 64); " +
        f"256-merge A/B: batched $sB%.1f s vs sequential $sS%.1f s (${sS / sB}%.2fx); prefix equal ${mB == mS}"
    )
    assert(m1k.length == 1000, s"expected 1000 merges, got ${m1k.length}")
    assert(mB == mS, "batched 256-merge prefix diverged from sequential")
    assert(m1k.take(256) == mB, "1k run must extend the 256-merge prefix")
    docs.unpersist()
    ()
  }

  /** MONSTER-ROW robustness: one ~100 MB document (2M lines) rides a
    * normal corpus through the two guarded per-row kernels. Without the
    * maxLines shed, dedupLinesWithin's quadratic scan on 2M lines is
    * ~4·10¹² comparisons — a single-task stall measured in HOURS; with it
    * the section completes in seconds, the monster is flagged-and-counted
    * (never silently skipped OR silently processed), and every normal doc
    * still dedups exactly. Same for the gopher gate's maxChars shed on
    * the regex/split chain.
    */
  private def monsterRowSection(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val t0 = System.nanoTime()
    // ~100 MB single document: 2M lines × ~52 chars, built distributed
    // then collapsed to ONE row (concat of a collected array would OOM
    // the driver string pool; array_join inside the row does not)
    val monster = spark
      .range(2000000L)
      .select(concat(lit("line "), pmod(xxhash64(col("id")), lit(1000L)).cast("string"),
        lit(" with some repeated boilerplate text here")).as("l"))
      .agg(array_join(collect_list(col("l")), "\n").as("text"))
      .select(lit(-1L).as("doc_id"), col("text"))
    val normals = spark
      .range(n)
      .select(
        col("id").as("doc_id"),
        concat_ws(
          "\n",
          concat(lit("alpha "), col("id").cast("string")),
          lit("shared boilerplate line"),
          lit("shared boilerplate line"),
          concat(lit("omega "), col("id").cast("string"))
        ).as("text")
      )
    val docs = normals.unionByName(monster).persist()
    val total = docs.count()
    val mLen = docs.filter(col("doc_id") === -1L).select(length(col("text"))).head().getInt(0)
    val d0 = System.nanoTime()
    val dd = operators.CorpusOps
      .dedupLinesWithin(docs, col("doc_id"), col("text"), maxLines = 100000)
      .persist()
    val shedRows = dd.filter(col("is_shed")).select(col("doc_id"), col("n_lines")).collect()
    val nShed = shedRows.length
    val dedupOk = dd
      .filter(!col("is_shed") && col("n_kept") =!= 3)
      .count() // every normal doc: 4 lines -> 3 kept
    val sDedup = (System.nanoTime() - d0) / 1e9
    val g0 = System.nanoTime()
    val gg = operators.TextOps
      .gopherQualityGate(docs, col("doc_id"), col("text")) // default maxChars 10 MB
      .persist()
    val gShed = gg.filter(col("is_shed")).select(col("doc_id")).collect()
    val gNullOk = gg.filter(col("is_shed") && col("n_words").isNotNull).count()
    val sGate = (System.nanoTime() - g0) / 1e9
    println(
      f"[stressx] monsterrow @ $total%d docs incl. ONE ${mLen / 1e6}%.0f MB / 2M-line doc: " +
        f"dedupLinesWithin $sDedup%.1f s (shed $nShed%d, lines ${shedRows.map(_.getInt(1)).sum}%d, wrong-dedup $dedupOk%d), " +
        f"gopherGate $sGate%.1f s (shed ${gShed.length}%d, metric-leaks $gNullOk%d)"
    )
    assert(nShed == 1 && shedRows(0).getLong(0) == -1L, "exactly the monster must shed in dedup")
    assert(shedRows(0).getInt(1) == 2000000, "shed accounting must carry the true line count")
    assert(dedupOk == 0, "every in-budget doc must dedup exactly")
    assert(gShed.map(_.getLong(0)).toSeq == Seq(-1L), "exactly the monster must shed in the gate")
    assert(gNullOk == 0, "shed rows must not compute gate metrics")
    dd.unpersist(); gg.unpersist(); docs.unpersist()
    ()
  }

  /** curation16 at scale (own method: main is at the JVM 64KB cap). */
  private def curation16Section(spark: SparkSession, corpus: DataFrame, nDocs: Long): Unit = {
      val tk = split(col("text"), " ")
      // one shared prefix for both identifiers, so tok1==tok2 collapses
      // v2/v3 into one variable — the structural dimension the class
      // count must capture alongside the surviving numeric-ish literal
      def codeOf(p: String): Column = concat_ws(
        " ",
        lit("def"), lit("f"), lit("("),
        concat(lit(p), element_at(tk, 1)), lit(","),
        concat(lit(p), element_at(tk, 2)), lit(")"), lit(":"), lit("return"),
        concat(lit(p), element_at(tk, 1)), lit("*"),
        concat(lit(p), element_at(tk, 2)), lit("+"), element_at(tk, 3)
      )
      val baseCode = corpus.filter(col("id") < TwinOffset).select(col("id"), codeOf("x").as("code"))
      val twinCode = corpus.filter(col("id") < TwinOffset && col("id") % 100 === 0)
        .select((col("id") + TwinOffset).as("id"), codeOf("zz").as("code"))
      val codes = baseCode.unionByName(twinCode).persist()
      val ncodes = codes.count()
      val ar = operators.TextOps.alphaRename(codes, col("id"), col("code")).persist()
      val (sec4, n4, h4, _) = run(operators.TextOps.alphaRename(codes, col("id"), col("code")))
      // class-count tie-out: canonical classes are exactly the distinct
      // (tok3 literal, tok1==tok2 collapse) structural keys of the base
      // corpus (twins add no new structure by construction) — but tok3
      // values that ARE identifiers (all of them here: bare vocab tokens)
      // still canonicalize, so the class key is (tok3-is-new-vs-tok1/2,
      // eq12). tok3 is a plain digit-string token from the vocab, which
      // NEVER matches the identifier grammar only if it starts with a
      // digit — the stress vocab is all-digit tokens, so tok3 survives
      // verbatim and the expected-class computation below is exact.
      val expClasses = corpus.filter(col("id") < TwinOffset)
        .select(element_at(tk, 3).as("lit3"),
          (element_at(tk, 1) === element_at(tk, 2)).as("eq12"))
        .distinct().count()
      val gotClasses = ar.select(col("fp")).distinct().count()
      // planted twins: every twin id's fp equals its base id's fp
      val fps = ar.select(col("doc_id"), col("fp"))
      val twinBad = fps.filter(col("doc_id") >= TwinOffset)
        .join(fps.filter(col("doc_id") < TwinOffset).withColumnRenamed("fp", "fp0").withColumnRenamed("doc_id", "base"),
          col("doc_id") - TwinOffset === col("base"))
        .filter(col("fp") =!= col("fp0")).count()
      println(f"[stressx] alphaRename @ $ncodes%d code docs: $sec4%.1f s, rows=$n4; classes=$gotClasses (expect $expClasses), twin fp mismatches=$twinBad")
      println(s"[stressx]   plan: $h4")
      assert(gotClasses == expClasses, "canonical classes must equal structural keys exactly")
      assert(twinBad == 0, "alpha-twins must collapse onto their base digest")
      ar.unpersist(); codes.unpersist()

      // kneser-ney: full table, exact count conservation + the
      // observed-continuation identity: over a history's OBSERVED
      // continuations (full-vocab sum-to-one needs the unseen backoff
      // mass, which the bigram table rightly does not materialize),
      //   Σ p_kn = (c1 − D·nf)/c1 + (D·nf/c1) · Σ n_pre(w2) / n_types
      // — every term recomputable from the returned table itself, so a
      // mix-up in any of the three joins breaks it. 6dp rounding noise is
      // bounded by nf·5e-7.
      val t0 = System.nanoTime()
      val kn = operators.TextOps.knBigram(corpus, col("text"), topK = 0).persist()
      val nbig = kn.count()
      val sec5 = (System.nanoTime() - t0) / 1e9
      val totC = kn.agg(sum(col("c"))).head().getLong(0)
      val expC = corpus.select(sum(size(split(col("text"), " ")) - 1)).head().getLong(0)
      val nTypes = nbig.toDouble
      val npre = kn.groupBy(col("w2")).agg(count(lit(1)).as("n_pre"))
      val sums = kn
        .join(npre, Seq("w2"))
        .groupBy(col("w1"))
        .agg(
          sum(col("p_kn")).as("sp"),
          sum(col("c")).as("c1"),
          count(lit(1)).as("nf"),
          sum(col("n_pre")).as("spre")
        )
        .select(
          col("nf"),
          abs(
            col("sp") -
              ((col("c1") - lit(0.75) * col("nf")) / col("c1") +
                lit(0.75) * col("nf") / col("c1") * (col("spre") / lit(nTypes)))
          ).as("err")
        )
        .filter(col("err") > col("nf") * 5e-7 + 1e-9)
        .count()
      println(f"[stressx] knBigram @ $nbig%d bigram types / $totC%d instances: $sec5%.1f s; count conservation ${totC == expC}, continuation-identity violations=$sums")
      assert(totC == expC && sums == 0, "KN identities must hold")
      kn.unpersist()

      // drift: snapshot halves see IDENTICAL value multisets for the
      // control group (value keyed off id/2) -> psi exactly 0.0; the
      // shifted group must flag
      // pair index id>>1: ids (2k, 2k+1) share group AND value, and land
      // one on each snapshot side — the control group is symmetric BY
      // CONSTRUCTION, so its psi must be exactly 0.0
      val pairIdx = shiftright(col("id"), 1)
      val dr = corpus.filter(col("id") < TwinOffset).select(
        when(pairIdx % 5 === 0, lit("shifted")).otherwise(lit("control")).as("grp"),
        (col("id") % 2 === 1).as("in_b"),
        (pmod(pairIdx, lit(500)).cast("double") +
          when(pairIdx % 5 === 0 && col("id") % 2 === 1, 200.0).otherwise(0.0)).as("v")
      )
      val t1s = System.nanoTime()
      val drr = operators.Audit.driftReport(dr, col("grp"), col("in_b"), col("v"), binWidth = 50.0, nBins = 16).persist()
      drr.count()
      val sec6 = (System.nanoTime() - t1s) / 1e9
      val ctrl = drr.filter(col("grp") === "control").head()
      val shft = drr.filter(col("grp") === "shifted").head()
      println(f"[stressx] driftReport @ ${nDocs}%d rows: $sec6%.1f s; control psi=${ctrl.getAs[Double]("psi")} drifted=${ctrl.getAs[Boolean]("drifted")}; shifted psi=${shft.getAs[Double]("psi")}%.4f drifted=${shft.getAs[Boolean]("drifted")}")
      assert(ctrl.getAs[Double]("psi") == 0.0 && !ctrl.getAs[Boolean]("drifted"), "symmetric control must read EXACTLY zero")
      assert(shft.getAs[Boolean]("drifted"), "planted shift must flag")
      drr.unpersist()
  }

  /** x160 at scale: one AC automaton pass over 500 phrases vs the
    * per-phrase `regexp_count` chain (what a blocklist without AC
    * actually runs when it needs per-phrase counts). Equality asserted
    * on a common subset; the regex chain is timed on n/20 docs and the
    * AC kernel on all n — the printed ratio is the fused-kernel
    * justification (the x75/x52 precedent).
    */
  private def acScanSection(spark: SparkSession, n: Long): Unit = {
    val phrases = (0 until 500).map(_.toString)
    val docs = spark.range(n).select(col("id"), col("id").as("base_id"))
      .select(col("id"), tokens(perturbFirst = false).as("text")).persist()
    docs.count()
    val ac = docs.select(graft.functions.text.ac_count(col("text"), phrases).as("h"))
    val t0 = System.nanoTime()
    val acTotal = ac.agg(sum(col("h"))).head().getLong(0)
    val acSec = (System.nanoTime() - t0) / 1e9
    val sub = docs.filter(col("id") % 20 === 0).persist()
    val nSub = sub.count()
    // balanced add tree: a linear reduce nests 500 Adds and overflows
    // Catalyst's analyzer stack; pairing keeps depth at ~log2(500)
    def balancedSum(cs: Seq[Column]): Column =
      if (cs.size == 1) cs.head
      else balancedSum(cs.grouped(2).map(g => if (g.size == 2) g(0) + g(1) else g(0)).toSeq)
    val rxCol = balancedSum(
      phrases.map(p => regexp_count(col("text"), lit(java.util.regex.Pattern.quote(p))).cast("long"))
    )
    val t1 = System.nanoTime()
    val rxTotal = sub.select(rxCol.as("h")).agg(sum(col("h"))).head().getLong(0)
    val rxSec = (System.nanoTime() - t1) / 1e9
    val acSubTotal = sub.select(graft.functions.text.ac_count(col("text"), phrases).as("h"))
      .agg(sum(col("h"))).head().getLong(0)
    println(f"[stressx] acScan @ $n%d docs x 500 phrases: AC $acSec%.1f s (hits=$acTotal); regex chain $rxSec%.1f s on $nSub docs (${rxSec / acSec * (n.toDouble / nSub)}%.0fx extrapolated); subset equality ${acSubTotal == rxTotal} ($acSubTotal vs $rxTotal)")
    assert(acSubTotal == rxTotal, "AC must equal the per-phrase regex chain")
    sub.unpersist(); docs.unpersist()
  }

  /** Native as-of join (AsOfJoinExec) vs the union+window composition:
    * A/B wall-clock on the same (key, time)-shaped workload plus an
    * order-independent full-output checksum equality — the committed
    * evidence row for the custom physical operator.
    */
  /** Multimodal layer at scale: a mixed container corpus (2-frame GIF /
    * Y4M / MJPEG-AVI videos + WAV clips, synthesized per-partition) with
    * 1% planted edited-AVI twins, driven through the three decode
    * operators. Measures blobs/s + MBps per operator (the zero-shuffle
    * mapPartitions batch shape under real encode/decode work — GIF LZW,
    * JPEG DCT, RIFF walks) and gates EXACT planted-twin recall through
    * the blocked frame-hash join: the shared unedited frame of every
    * (clean, edited) AVI pair is a byte-identical JPEG, so recall is a
    * correctness property, not a probabilistic one.
    */
  private def mediaSection(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    // exact per-class arithmetic (r14 advice: the old 3·(n/4) + n/400
    // shortcut was only right when 400 | n — any other doc count failed
    // the section spuriously). |{id < n : id ≡ r (mod m)}| = (n − r +
    // m − 1) / m in integer math:
    val planted = (n + 397) / 400 // ids ≡ 2 (mod 400) — AVI rows with an edited twin
    // ids ≡ 103 (mod 400) additionally plant a BYTE-IDENTICAL MP3 pair
    // (fingerprint-less rows: structure-only typing, digest-edge dedup —
    // the r15 capstone gap, exact-accounted at scale like the AVI twins)
    val digestPlanted = (n + 296) / 400
    val expectAudio = n / 4 + 2 * digestPlanted // ids ≡ 3 (mod 4), plus the MP3 pairs
    val expectVideo = (n - n / 4) + planted // ids ≡ 0,1,2 (mod 4), plus the twins
    val media = spark
      .range(n)
      .as[Long]
      .mapPartitions(_.flatMap { id =>
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val base = (id % 4) match {
          case 0 => operators.Multimodal.MediaRow(id, "video/gif", operators.Multimodal.syntheticGif(id, w, h, 2))
          case 1 => operators.Multimodal.MediaRow(id, "video/y4m", operators.Multimodal.syntheticY4m(id, w, h, 2))
          case 2 => operators.Multimodal.MediaRow(id, "video/avi", operators.Multimodal.syntheticAviMjpeg(id, w, h, 2))
          case _ => operators.Multimodal.MediaRow(id, "audio/wav", operators.Multimodal.syntheticWav(id, 512))
        }
        if (id % 400 == 2)
          Seq(
            base,
            operators.Multimodal.MediaRow(
              id + TwinOffset,
              "video/avi",
              operators.Multimodal.syntheticAviMjpeg(id, w, h, 2, editFrame = 1, editSeedDelta = 7777L)
            )
          )
        else if (id % 400 == 103) {
          // byte-identical MP3 pair: undecodable (structure-only typed),
          // dedupable ONLY through the content-digest edges. 12 frames:
          // even at the smallest VBR bitrate the blob clears the 1024-byte
          // fallback frame, so the videoNearDupPairs recall leg sees the
          // byte-identical pair too (4-frame clips can be < 1 fallback
          // frame and carry NO raw-block hash at all — measured r16)
          val mp3 = operators.Multimodal.syntheticMp3(id, 12, 44100)
          Seq(
            base,
            operators.Multimodal.MediaRow(id + Mp3Offset, "audio/mpeg", mp3),
            operators.Multimodal.MediaRow(id + Mp3Offset + TwinOffset, "audio/mpeg", mp3.clone())
          )
        } else Seq(base)
      })
      .persist()
    val rows = media.count()
    val bytes = media.map(_.content.length.toLong).reduce(_ + _)
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // typed catalog probe over everything
    val (probeS, kindCounts) = timed {
      operators.Multimodal.mediaProbe(media).groupBy(col("kind")).count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    assert(
      kindCounts.getOrElse("video", 0L) == expectVideo &&
        kindCounts.getOrElse("audio", 0L) == expectAudio,
      s"probe typed the corpus wrong: $kindCounts (want video=$expectVideo audio=$expectAudio)"
    )
    // frame decode + hash over everything (WAV rows take the 1-D block fallback)
    val (framesS, nFrames) = timed(operators.Multimodal.videoFrameHashes(media).count())
    // audio fingerprints over everything (video rows take the raw-byte fallback)
    val (audioS, nFps) = timed(operators.Multimodal.audioFingerprints(media).count())
    assert(nFps == rows)
    // EXACT planted recall: every (clean, edited) AVI pair shares its
    // byte-identical unedited frame at hamming 0 — and the byte-identical
    // MP3 pairs surface here too (non-video rows take the 1-D block
    // fallback hashes, which agree exactly on identical bytes)
    val (pairsS, found) = timed {
      operators.Multimodal
        .videoNearDupPairs(media, maxHamming = 2, blocks = 4, minFrames = 1)
        .filter(col("id_b") - col("id_a") === TwinOffset)
        .count()
    }
    // CAPSTONE at scale (r15/r16): the full probe → per-kind near-dup →
    // digest-edge → CC keep-best catalog in one call. The planted
    // duplicate structure is the AVI twins (videoMinFrames = 1: a twin
    // shares 1 of its 2 frames byte-identically) plus the byte-identical
    // MP3 pairs (fingerprint-LESS — only the content-digest edges can
    // drop them), so the catalog must drop EXACTLY planted +
    // digestPlanted rows (min-id keep rule keeps every clean id) and
    // keep everything else — exact accounting at corpus scale.
    val (catalogS, (nKept, nDropped)) = timed {
      val acc = operators.Multimodal
        .mediaDedupCatalog(media, videoMinFrames = 1)
        .agg(
          sum(when(col("kept"), 1L).otherwise(0L)),
          sum(when(col("kept"), 0L).otherwise(1L))
        )
        .head()
      (acc.getLong(0), acc.getLong(1))
    }
    assert(
      nDropped == planted + digestPlanted && nKept == rows - planted - digestPlanted,
      s"capstone accounting: kept $nKept dropped $nDropped " +
        s"(want ${rows - planted - digestPlanted}/${planted + digestPlanted})"
    )
    def mbps(sec: Double) = bytes / 1e6 / sec
    println(
      f"[stressx] media @ $rows%d blobs (${bytes / 1e6}%.0f MB): probe $probeS%.1f s (${rows / probeS}%.0f blobs/s, ${mbps(probeS)}%.0f MBps), frames $framesS%.1f s ($nFrames%d frames), audio $audioS%.1f s, neardup $pairsS%.1f s, catalog $catalogS%.1f s — planted recall $found%d/${planted + digestPlanted}%d (incl. $digestPlanted%d digest twins), capstone dropped $nDropped%d"
    )
    record(
      f"""{"stage":"media","blobs":$rows%d,"bytes":$bytes%d,"probe_s":$probeS%.2f,"probe_blobs_s":${rows / probeS}%.0f,"frames_s":$framesS%.2f,"n_frames":$nFrames%d,"audio_s":$audioS%.2f,"neardup_s":$pairsS%.2f,"catalog_s":$catalogS%.2f,"catalog_kept":$nKept%d,"catalog_dropped":$nDropped%d,"planted":$planted%d,"digest_planted":$digestPlanted%d,"found":$found%d,"recall":${found.toDouble / math.max(1, planted + digestPlanted)}%.4f}"""
    )
    assert(found == planted + digestPlanted,
      s"planted twin recall $found/${planted + digestPlanted}")
    media.unpersist()
    ()
  }

  private def asofSection(spark: SparkSession, n: Long): Unit = {
    val nKeys = math.max(1L, n / 100)
    val left = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(nKeys)).as("k"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).as("t"),
      col("id").as("lv")
    )
    val right = spark.range(n / 2).select(
      pmod(xxhash64(col("id"), lit(2)), lit(nKeys)).as("k"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000000L)).as("t"),
      col("id").as("price")
    )
    def checksum(df: DataFrame): (Double, Long, java.math.BigDecimal) = {
      val t0 = System.nanoTime()
      val r = df.agg(
        count(lit(1)).as("n"),
        coalesce(
          sum(xxhash64(col("k"), col("t"), col("lv"), col("price")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
        ).as("h")
      ).head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getDecimal(1))
    }
    // right side can hold duplicate (k, t) pairs whose carried row is
    // tie-ambiguous between the two plans; dedup to the comparable core
    val rightDedup = right.groupBy(col("k"), col("t")).agg(max(col("price")).as("price"))
      .persist()
    rightDedup.count()
    val lp = left.persist(); lp.count()
    val (sN, cntN, sumN) = checksum(operators.AsOfJoin.asofBackwardNative(lp, rightDedup, "k", "t"))
    val (sC, cntC, sumC) = checksum(operators.AsOfJoin.asofBackward(lp, rightDedup, "k", "t"))
    println(f"[stressx] asof @ $n%d x ${n / 2}%d rows, $nKeys%d keys: native $sN%.1f s, composed $sC%.1f s (${sC / sN}%.2fx); checksum equal ${cntN == cntC && sumN == sumC} ($cntN rows)")
    record(
      f"""{"stage":"asof_uniform","left_rows":$n%d,"right_rows":${n / 2}%d,"keys":$nKeys%d,"native_s":$sN%.2f,"composed_s":$sC%.2f,"speedup":${sC / sN}%.2f,"rows_out":$cntN%d,"checksum_equal":${cntN == cntC && sumN == sumC}}"""
    )
    assert(cntN == cntC && sumN == sumC, "native as-of checksum diverged from composition")
    lp.unpersist(); rightDedup.unpersist()

    // MONSTER-KEY A/B: one key holds 30% of both sides — the regime where
    // the plain merge serializes that key's whole sort+merge into ONE task
    // and asofBackwardChunked spreads it over nChunks time epochs. The
    // checksum gate proves semantics; the timing row is the scale evidence.
    val hotLeft = spark.range(n).select(
      when(pmod(xxhash64(col("id"), lit("hl")), lit(100L)) < 30, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("k"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).as("t"),
      col("id").as("lv")
    )
    val hotRight = spark.range(n / 2).select(
      when(pmod(xxhash64(col("id"), lit("hr")), lit(100L)) < 30, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(nKeys))).as("k"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000000L)).as("t"),
      col("id").as("price")
    )
    val hotRightDedup = hotRight.groupBy(col("k"), col("t")).agg(max(col("price")).as("price"))
      .persist()
    hotRightDedup.count()
    val hl = hotLeft.persist(); hl.count()
    val (sP, cntP, sumP) = checksum(operators.AsOfJoin.asofBackwardNative(hl, hotRightDedup, "k", "t"))
    val (sK, cntK, sumK) =
      checksum(operators.AsOfJoin.asofBackwardChunked(hl, hotRightDedup, "k", "t", 64))
    println(f"[stressx] asof-hotkey @ $n%d rows, 30%% on one key: plain merge $sP%.1f s, chunked(64) $sK%.1f s (${sP / sK}%.2fx); checksum equal ${cntP == cntK && sumP == sumK} ($cntP rows)")
    record(
      f"""{"stage":"asof_hotkey","left_rows":$n%d,"hot_share":0.30,"n_chunks":64,"plain_s":$sP%.2f,"chunked_s":$sK%.2f,"speedup":${sP / sK}%.2f,"rows_out":$cntP%d,"checksum_equal":${cntP == cntK && sumP == sumK}}"""
    )
    assert(cntP == cntK && sumP == sumK, "chunked as-of checksum diverged from the plain merge")

    // PROBE COST A/B (r14, ADVICE r13): the tiered probe (bounded head
    // sample, exact fallback only in the uncertain band) vs the full-scan
    // probe, on both regimes. Uniform is the payoff case — the sample
    // decides alone and the full pass never runs; hot pays sample + exact
    // and earns it back from the chunked plan. Decisions must agree.
    def probeAb(df: DataFrame, regime: String, rows: Long): Unit = {
      val t0 = System.nanoTime()
      val (mxE, totE) = operators.AsOfJoin.exactHotProbe(df, "k")
      val exactS = (System.nanoTime() - t0) / 1e9
      val exactDecision = mxE >= 1000000L && mxE.toDouble / totE > 0.10
      operators.AsOfJoin.ProbeCache.clear()
      val t1 = System.nanoTime()
      val tiered = operators.AsOfJoin.preferChunkedOne(df, "k", 0.10, minHotRows = 1000000L)
      val tieredS = (System.nanoTime() - t1) / 1e9
      println(
        f"[stressx] asof-probe $regime%s @ $rows%d rows: exact $exactS%.2f s, tiered $tieredS%.2f s (${exactS / tieredS}%.1fx); decisions equal ${tiered == exactDecision}"
      )
      record(
        f"""{"stage":"asof_probe","regime":"$regime%s","rows":$rows%d,"exact_s":$exactS%.2f,"tiered_s":$tieredS%.2f,"speedup":${exactS / tieredS}%.2f,"decision_equal":${tiered == exactDecision}}"""
      )
      assert(tiered == exactDecision, s"probe decision parity broke on $regime")
    }
    probeAb(left, "uniform", n)
    probeAb(hotLeft, "hot", n)
    // the same A/B on PARQUET-backed input — the deployment shape, where
    // the exact probe's full pass pays real page reads while the head
    // sample touches a few pages per split (iterator stops pulling)
    val pqDir = java.nio.file.Files.createTempDirectory("graft-probe-pq").toString
    left.write.mode("overwrite").parquet(s"$pqDir/uniform")
    hotLeft.write.mode("overwrite").parquet(s"$pqDir/hot")
    probeAb(spark.read.parquet(s"$pqDir/uniform"), "uniform_parquet", n)
    probeAb(spark.read.parquet(s"$pqDir/hot"), "hot_parquet", n)

    // gapFill on the same monster-entity regime: the LOCF window vs the
    // chunked fill — one entity holding 30% of rows serializes the plain
    // window's partition; the chunked form spreads it over time epochs
    val gfDf = hl.select(
      col("k"), col("t"), col("lv").as("tie"),
      when(pmod(xxhash64(col("lv"), lit("nv")), lit(4L)) === 0, col("lv").cast("double"))
        .otherwise(lit(null).cast("double")).as("v")
    ).persist()
    gfDf.count()
    def gfChecksum(df: DataFrame): (Double, Long, java.math.BigDecimal) = {
      val t0 = System.nanoTime()
      val r = df.agg(
        count(lit(1)).as("n"),
        coalesce(
          sum(xxhash64(col("k"), col("t"), col("tie"), col("v_filled"), col("was_filled"))
            .cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
        ).as("h")
      ).head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getDecimal(1))
    }
    val (gP, gcP, gsP) = gfChecksum(operators.AsOfJoin.gapFill(gfDf, "k", "t", "tie", "v"))
    val (gK, gcK, gsK) = gfChecksum(operators.AsOfJoin.gapFillChunked(gfDf, "k", "t", "tie", "v", 64))
    println(f"[stressx] gapfill-hotkey @ ${gcP}%d rows, 30%% on one entity: plain window $gP%.1f s, chunked(64) $gK%.1f s (${gP / gK}%.2fx); checksum equal ${gcP == gcK && gsP == gsK}")
    record(
      f"""{"stage":"gapfill_hotkey","rows":$gcP%d,"hot_share":0.30,"n_chunks":64,"plain_s":$gP%.2f,"chunked_s":$gK%.2f,"speedup":${gP / gK}%.2f,"checksum_equal":${gcP == gcK && gsP == gsK}}"""
    )
    assert(gcP == gcK && gsP == gsK, "chunked gapFill checksum diverged from the plain window")
    gfDf.unpersist()
    hl.unpersist(); hotRightDedup.unpersist()
    ()
  }

  /** ngramJaccardPairs naive-vs-PPJoin A/B on a ZIPFIAN corpus at the
    * dedup-grade threshold (0.8): the committed evidence that the
    * auto-switch picks the strategy that actually WINS on skewed
    * shingle-df data. Two regimes, both printed:
    *   - synthesized GRAFT_NGRAM_N-doc (default 100k) Zipf(1)-token
    *     corpus with 25% template near-dups at t=0.8 — the production
    *     near-dup setting, where the prefix index pairs only each doc's
    *     RAREST ~20% of shingles while the naive index pays Σ C(df,2)
    *     over hot-shingle postings;
    *   - the SkewGen sf0.1 twin at x6's t=0.2 completeness setting —
    *     honesty row: a threshold that low keeps ~80% of shingles in
    *     every prefix, so the two strategies are a documented WASH there.
    * Pair sets asserted identical in both regimes.
    */
  private def ngramAbSection(spark: SparkSession): Unit = {
    def ab(docs: DataFrame, threshold: Double, label: String): Unit = {
      val d = docs.persist()
      val n = d.count()
      def run(prefix: Boolean): (Double, Long, java.math.BigDecimal) = {
        val pairs =
          if (prefix)
            operators.Dedup.ngramJaccardPairsPrefix(d, col("text"), col("doc_id"), 3, threshold)
          else operators.Dedup.ngramJaccardPairs(d, col("text"), col("doc_id"), 3, threshold)
        val t0 = System.nanoTime()
        val r = pairs.agg(
          count(lit(1)).as("n"),
          coalesce(
            sum(xxhash64(col("id_a"), col("id_b"), round(col("jaccard"), 6)).cast("decimal(38,0)")),
            lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
          ).as("h")
        ).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getDecimal(1))
      }
      val auto = operators.Dedup.preferPrefixStrategy(d, col("text"), 3, threshold)
      // decision diagnostics: the naive index's candidate mass Σ C(df,2)
      // vs the linear shingle mass Σ df — the COST-BASED switch variable
      val st = d
        .select(explode(array_distinct(operators.Dedup.shingles(col("text"), 3))).as("s"))
        .groupBy(col("s"))
        .agg(count(lit(1)).as("df"))
        .agg(
          sum(col("df")).as("mass"),
          sum((col("df") * (col("df") - 1)).cast("long") / 2).cast("long").as("cand"),
          max(col("df")).as("maxdf")
        )
        .head()
      val (sP, nP, hP) = run(prefix = true)
      val (sN, nN, hN) = run(prefix = false)
      println(f"[stressx] ngramAB [$label] @ $n%d docs, t=$threshold: PPJoin $sP%.1f s vs naive $sN%.1f s (${sN / sP}%.2fx); auto prefers prefix=$auto; pairs equal ${nP == nN && hP == hN} ($nP); mass=${st.getLong(0)} cand=${st.getLong(1)} maxdf=${st.getLong(2)} cand/mass=${st.getLong(1).toDouble / st.getLong(0)}%.1f")
      assert(nP == nN && hP == hN, s"strategies must produce identical pair sets [$label]")
      d.unpersist()
      ()
    }
    // regime 1: synthesized Zipf corpus at the production threshold
    val nDocs = sys.env.get("GRAFT_NGRAM_N").map(_.toLong).getOrElse(100000L)
    val vocab = (0 until 500).map(w => s"w$w").toArray
    def ztok(seed: Column, i: Int): Column = {
      val u = pmod(xxhash64(seed, lit(i), lit("zt")), lit(1000000007L)).cast("double") / 1000000007.0
      element_at(
        lit(vocab),
        (least((floor(pow(lit(501.0), u)) - 1).cast("long"), lit(499L)) + 1).cast("int")
      )
    }
    def ztext(seed: Column): Column = concat_ws(" ", (0 until 30).map(i => ztok(seed, i)): _*)
    val zipfDocs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      // 25% near-dups over ~nDocs/20 UNIFORM templates (~5 siblings each,
      // J ≈ 0.87 between siblings): the TOKEN distribution is the Zipf
      // lever under test here; power-law cluster sizes would just bloat
      // the shared verification output both strategies pay identically
      when(
        pmod(xxhash64(col("id"), lit("dup")), lit(4L)) === 0,
        concat_ws(
          " ",
          ztok(col("id"), 999),
          ztext(lit(10000000L) + pmod(xxhash64(col("id"), lit("tm")), lit(math.max(1L, nDocs / 20))))
        )
      ).otherwise(ztext(col("doc_id"))).as("text")
    )
    ab(zipfDocs, 0.8, "zipf-synth")
    // regime 2: BOILERPLATE — 20% of docs share a verbatim tail phrase
    // (web headers/footers): a handful of df≈N/5 shingles put the naive
    // index's candidate mass in the billions while the prefix index never
    // touches them (they are the COMMONEST shingles, the prefix keeps the
    // rarest) — the regime the auto-switch exists for
    val boiler = zipfDocs.select(
      col("doc_id"),
      when(
        pmod(xxhash64(col("doc_id"), lit("bp")), lit(5L)) === 0,
        concat(col("text"), lit(" subscribe to our newsletter terms apply all rights reserved"))
      ).otherwise(col("text")).as("text")
    )
    ab(boiler, 0.8, "boilerplate")
    // regime 3 (honesty row): the SkewGen twin at x6's completeness t=0.2
    val dir = sys.env.getOrElse("GRAFT_NGRAM_DIR", "target/skewdata/sf0.1")
    ab(spark.read.parquet(s"$dir/documents.parquet"), 0.2, "skew-sf0.1")
  }

  /** blocklistGate past the ≥10k-phrase auto-switch: the gate must pick
    * the Aho–Corasick path (x78's regex path is the <10k contract), stay
    * row-identical to the regex twin on a subset, and beat it by orders
    * of magnitude — the evidence that a production-sized blocklist
    * (10k–100k phrases) is runnable at corpus scale at all.
    */
  private def blocklistSection(spark: SparkSession, n: Long): Unit = {
    // 12k numeric "words": \b-anchored hits against the token vocabulary
    // (each doc: 40 tokens uniform over 100k -> ~4.8 expected hits)
    val phrases = (0 until 12000).map(_.toString)
    val docs = spark.range(n).select(col("id"), col("id").as("base_id"))
      .select(col("id"), tokens(perturbFirst = false).as("text")).persist()
    docs.count()
    val gate = operators.TextOps.blocklistGate(docs, col("id"), col("text"), phrases)
    val t0 = System.nanoTime()
    val agg = gate.agg(sum(col("n_hits")).cast("long").as("h"), sum(when(col("blocked"), 1L).otherwise(0L)).as("b")).head()
    val acSec = (System.nanoTime() - t0) / 1e9
    val (acHits, acBlocked) = (agg.getLong(0), agg.getLong(1))
    // regex twin on a small subset (the 12k-way alternation is the path
    // being replaced precisely because it cannot scale)
    val sub = docs.filter(col("id") % math.max(1L, n / 1000) === 0).persist()
    val nSub = sub.count()
    def rowsOf(switch: Int) = operators.TextOps
      .blocklistGate(sub, col("id"), col("text"), phrases, acSwitchAt = switch)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)), r.getBoolean(3))).toSeq
    val t1 = System.nanoTime()
    val rx = rowsOf(Int.MaxValue)
    val rxSec = (System.nanoTime() - t1) / 1e9
    val ac = rowsOf(1)
    val equal = ac == rx
    println(f"[stressx] blocklist @ $n%d docs x 12000 phrases: AC $acSec%.1f s (hits=$acHits, blocked=$acBlocked); regex $rxSec%.1f s on $nSub docs (${rxSec / acSec * (n.toDouble / nSub)}%.0fx extrapolated); subset row-equality $equal")
    assert(equal, "AC blocklist path must be row-identical to the regex path")
    sub.unpersist(); docs.unpersist()
    ()
  }

  /** StreamLinkage at scale: epoch 0 ingests n keys (1% planted
    * same-entity twins — the transposition construction with a
    * closed-form jw ≈ 0.9919), epoch 1 ingests n/2 keys of which HALF are
    * near-misses of stored keys (must attach to the stored entity) and
    * half are fresh (must found new entities); epoch 1 then REPLAYS and
    * must re-derive identical counts (the store's epoch self-exclusion).
    */
  private def streamLinkSection(spark: SparkSession, n: Long): Unit = {
    val store = java.nio.file.Files.createTempDirectory("stress-link").toString + "/keys"
    def keyOf = substring(md5(col("base_id").cast("string")), 1, 24)
    def twinOf = concat(
      substring(keyOf, 1, 6), substring(keyOf, 8, 1),
      substring(keyOf, 7, 1), substring(keyOf, 9, 16)
    )
    val e0 = spark.range(n).select(col("id"), col("id").as("base_id"))
      .select(col("id"), keyOf.as("s"), substring(keyOf, 1, 5).as("blk"))
      .unionByName(
        spark.range(n / 100).select((col("id") + TwinOffset).as("id"), col("id").as("base_id"))
          .select(col("id"), twinOf.as("s"), substring(keyOf, 1, 5).as("blk"))
      )
    var accepted = 0L
    var matched = 0L
    val acc: (DataFrame, Long) => Unit = (df, _) => {
      val a = df.agg(count(lit(1)), sum(col("matched_store").cast("long"))).head()
      accepted = a.getLong(0); matched = if (a.isNullAt(1)) 0L else a.getLong(1)
    }
    val t0 = System.nanoTime()
    streaming.StreamLinkage.linkBatch(e0, col("id"), col("s"), col("blk"), 0.98, store, 0L, acc)
    val sec0 = (System.nanoTime() - t0) / 1e9
    println(f"[stressx] streamlink epoch0 @ ${n + n / 100}%d keys: $sec0%.1f s, accepted=$accepted matched=$matched (empty store)")
    assert(accepted == n + n / 100 && matched == 0)

    // epoch 1: n/4 near-misses of stored ids [0, n/4) + n/4 fresh ids
    val attach = spark.range(n / 4).select((col("id") + 2 * TwinOffset).as("id"), col("id").as("base_id"))
      .select(col("id"), twinOf.as("s"), substring(keyOf, 1, 5).as("blk"))
    val fresh = spark.range(n / 4).select((col("id") + 3 * TwinOffset).as("id"), (col("id") + 3 * TwinOffset).as("base_id"))
      .select(col("id"), keyOf.as("s"), substring(keyOf, 1, 5).as("blk"))
    val t1 = System.nanoTime()
    streaming.StreamLinkage.linkBatch(attach.unionByName(fresh), col("id"), col("s"), col("blk"), 0.98, store, 1L, acc)
    val sec1 = (System.nanoTime() - t1) / 1e9
    val (acc1, m1) = (accepted, matched)
    println(f"[stressx] streamlink epoch1 @ ${n / 2}%d keys vs ${n + n / 100}%d stored: $sec1%.1f s, accepted=$acc1 matched=$m1 (planted attach=${n / 4})")
    assert(acc1 == n / 2, s"epoch1 must accept all: $acc1")
    assert(m1 >= n / 4, s"every planted near-miss must attach: $m1 < ${n / 4}")

    // replay epoch 1: identical counts re-derive
    val t2 = System.nanoTime()
    streaming.StreamLinkage.linkBatch(attach.unionByName(fresh), col("id"), col("s"), col("blk"), 0.98, store, 1L, acc)
    val sec2 = (System.nanoTime() - t2) / 1e9
    println(f"[stressx] streamlink epoch1 REPLAY: $sec2%.1f s, accepted=$accepted matched=$matched")
    assert(accepted == acc1 && matched == m1, "replay must re-derive identical assignments")
  }

  /** x146/x152/x149 at scale (own method: main is at the JVM 64KB cap). */
  private def linkageSection(spark: SparkSession, nDocs: Long): Unit = {
      // Jaro-Winkler blocked linkage at nDocs: 24-hex-char keys, blocks =
      // first-5-hex prefix (16^5 = 1M blocks → λ≈5 per block at 5M rows →
      // ~12M kernel evaluations, the realistic record-linkage load), 1%
      // planted twins transpose chars 7-8 — INSIDE the key, OUTSIDE the
      // block prefix, giving a closed-form planted JW: m=24 matches with
      // one transposition → jaro=(1+1+23/24)/3, prefix l=4 →
      // jw = jaro + 0.4·(1−jaro) ≈ 0.991861.
      val keyOf = substring(md5(col("base_id").cast("string")), 1, 24)
      val lBase = spark.range(nDocs).select(col("id"), col("id").as("base_id"))
        .select(col("id"), keyOf.as("s"))
      val lTwin = spark.range(nDocs / 100).select((col("id") + TwinOffset).as("id"), col("id").as("base_id"))
        .select(
          col("id"),
          concat(
            substring(keyOf, 1, 6), substring(keyOf, 8, 1),
            substring(keyOf, 7, 1), substring(keyOf, 9, 16)
          ).as("s")
        )
      val lrows = lBase.unionByName(lTwin)
      // twins whose chars 7-8 happen to be EQUAL are exact dups (jw=1),
      // still ≥ threshold — planted recall counts both shapes
      val jwPairs = operators.EditDistance
        .jaroWinklerPairs(lrows, col("id"), col("s"), substring(col("s"), 1, 5), 0.98)
      val (sec, _, h, _) = run(jwPairs)
      val found = jwPairs.persist()
      val total = found.count()
      val foundPlanted = found.filter(col("id_b") === col("id_a") + TwinOffset).count()
      println(f"[stressx] jaroWinklerPairs @ ${nDocs + nDocs / 100}%d keys (1M blocks): $sec%.1f s, pairs=$total, planted=${nDocs / 100} found=$foundPlanted, background=${total - foundPlanted}")
      println(s"[stressx]   plan: $h")
      assert(foundPlanted == nDocs / 100, s"planted JW recall must be total: $foundPlanted != ${nDocs / 100}")
      found.unpersist()

      // stitch detection at nDocs pages: 1% of docs split into page pairs
      // sharing a 30-char md5-derived boundary (unique whp → zero
      // background); the other 99% are unpaired noise
      // EXACTLY w=30 chars: A's 30-char tail must BE B's 30-char head
      val bnd = substring(md5(concat(col("base_id").cast("string"), lit("b"))), 1, 30)
      val noise = spark.range(nDocs).select(col("id"), col("id").as("base_id"))
        .select((col("id") * 2).as("id"), concat(lit("noise "), md5(concat(col("base_id").cast("string"), lit("n"))), md5(col("base_id").cast("string"))).as("s"))
      val pagesA = spark.range(nDocs / 100).select((col("id") + TwinOffset).as("pid"), col("id").as("base_id"))
        .select((col("pid") * 2).as("id"), concat(lit("page one body text "), bnd).as("s"))
      val pagesB = spark.range(nDocs / 100).select((col("id") + TwinOffset).as("pid"), col("id").as("base_id"))
        .select((col("pid") * 2 + 1).as("id"), concat(bnd, lit(" page two body text")).as("s"))
      val stitch = operators.Dedup
        .stitchCandidates(noise.unionByName(pagesA).unionByName(pagesB), col("id"), col("s"), w = 30)
      val (sec2, n2, h2, _) = run(stitch)
      val sFound = stitch.persist()
      val sPlanted = sFound.filter(col("id_b") === col("id_a") + 1).count()
      val sTotal = sFound.count()
      println(f"[stressx] stitchCandidates @ ${nDocs + 2 * (nDocs / 100)}%d pages: $sec2%.1f s, pairs=$sTotal, planted=${nDocs / 100} found=$sPlanted, background=${sTotal - sPlanted}")
      println(s"[stressx]   plan: $h2")
      assert(sPlanted == nDocs / 100, s"planted stitch recall must be total: $sPlanted != ${nDocs / 100}")
      assert(sTotal == sPlanted, s"md5 boundaries must have zero background: $sTotal != $sPlanted")
      sFound.unpersist()

      // ROUGE-2 at nDocs/5 pairs over 40-token docs with GLOBALLY distinct
      // tokens (t<base*40+k>; the shared xxhash corpus can collide tokens
      // and perturb the closed form): perturbing token 0 changes exactly
      // bigram 0, so twin pairs read p = r = f1 = 38/39 exactly and
      // self-pairs read 1.0 — planted ground truth with zero tolerance
      val rN = nDocs / 5
      def rtok(perturb: Boolean): Column = concat_ws(
        " ",
        (0 until 40).map { k =>
          if (k == 0 && perturb) concat(lit("p"), col("id").cast("string"))
          else concat(lit("t"), (col("id") * 40 + k).cast("string"))
        }: _*
      )
      val rBase = spark.range(rN).select(col("id"), rtok(perturb = false).as("text"))
      val rPairs = rBase.select(col("id"), col("text").as("cand"), col("text").as("ref"))
        .unionByName(
          spark.range(rN / 100)
            .select((col("id") + TwinOffset).as("id"), rtok(perturb = true).as("cand"), rtok(perturb = false).as("ref"))
        )
      val rouge = operators.TextOps.rougeN(rPairs, col("id"), col("cand"), col("ref"), n = 2)
      val (sec3, n3, h3, _) = run(rouge)
      val rGot = rouge.persist()
      val selfBad = rGot.filter(col("pair_id") < TwinOffset && col("f1") =!= 1.0).count()
      val twinF1 = math.rint(1e6 * 38.0 / 39.0) / 1e6
      val twinBad = rGot.filter(col("pair_id") >= TwinOffset && col("f1") =!= twinF1).count()
      println(f"[stressx] rougeN(2) @ $n3%d pairs (40-token docs): $sec3%.1f s; self-pair f1≠1: $selfBad, twin f1≠$twinF1: $twinBad")
      println(s"[stressx]   plan: $h3")
      assert(selfBad == 0 && twinBad == 0, "planted ROUGE scores must be exact")
      rGot.unpersist()
  }
}
