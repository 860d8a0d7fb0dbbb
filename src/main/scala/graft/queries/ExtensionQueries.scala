package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Audit, ChatOps, ConnectedComponents, CorpusOps, Dedup, EditDistance, EventOps, GraphOps, Multimodal, Robots, Similarity, Spectral, TextOps}

/** Training-data-pipeline extensions (builder prompt): deduplication,
  * similarity search, text analysis, multimodal plumbing — the operations a
  * 100 TB corpus pipeline needs beyond the reference's surface.
  *
  * Oracle policy: everything whose math is engine-portable (md5, exact
  * integer counts, deterministic double division) gets a direct DuckDB
  * twin. LSH-based operators (minhash/simhash/hyperplane) hash with
  * xxhash64, which DuckDB does not implement — those emit deterministic
  * verification rows instead (exact-twin counts the oracle replays +
  * recall/conservation booleans the oracle asserts), so EVERY query here
  * is oracle-checked; the raw-pair surfaces stay covered by exact
  * brute-force comparisons in ScalaTest.
  */
object ExtensionQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  /** [[T]] with the size-gated fan-out (see
    * [[graft.sources.Tables.loadFanned]]) — used by the queries whose
    * first stage is heavy per-row CPU work (shingling, decode, probe,
    * dense kernels) so that work isn't serialized on the scan's
    * row-group-bounded task count. Identity at cluster scale.
    */
  private def Tf(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.loadFanned(s, dir, name)

  /** x160's phrase list: words that occur naturally in the synthetic
    * corpus, with deliberate nesting ("spar" ⊂ "spark", "ar" ⊂ both) and
    * a two-word phrase — shared verbatim with the oracle's REPLACE-count
    * replay.
    */
  private val AcScanPhrases: Seq[String] =
    Seq("spark", "spar", "ar", "group fast", "value", "row")

  /** x155's literal MaxMatch vocabulary: whole synthetic-corpus words,
    * a couple of sub-word pieces, space, and single letters with
    * 'q'/'x'/'z' deliberately missing (they must surface as `<unk>`).
    * Shared verbatim with the oracle's VALUES list.
    */
  private val WordpieceVocab: Seq[String] = Seq(
    " ", "spark", "group", "sort", "row", "table", "stream", "batch",
    "filter", "agg", "key", "value", "scan", "fast", "slow", "big", "small",
    "data", "query", "merge", "window", "order", "line", "part", "column",
    "hash", "er", "ing",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n",
    "o", "p", "r", "s", "t", "u", "v", "w", "y"
  )

  /** Deterministic per-component perturbation used to PLANT near-duplicate
    * twins in-query for the LSH gates (x10/x14): every arithmetic step
    * (float→double widen, ×1000, floor, bigint %, /3.0) is IEEE-exact or
    * correctly rounded in BOTH engines, so Spark and the DuckDB oracle
    * build bit-identical planted vectors. The factor is 1 ± ≤0.04 per
    * component → cos(v, perturb(v)) ≈ 0.9999, far above the 0.95 gate,
    * while this corpus's natural pair ceiling is ~0.6 — no threshold
    * boundary within 0.35 on either side.
    *
    * Why plant at all: the synthetic embeddings are isotropic noise (no
    * label structure, max natural cosine ~0.6), and ANN recall against
    * brute-force top-k on isotropic noise is not a meaningful gate — there
    * is no locality for ANY sublinear index to exploit, so the bar would
    * measure the random collision curve, not the operator (r2's 0.4 bar).
    * Planted twins make recall a property the operator GUARANTEES
    * (per-pair retention 1−(1−p^8)^4 ≈ 1−1.6e-6 at cos 0.9999, 32 bits /
    * 4 blocks), so the driver gate is deterministic AND strict.
    */
  private def perturb(v: Column): Column =
    transform(
      v,
      x =>
        x * (lit(1.0) + lit(0.02) *
          ((floor(abs(x) * 1000).cast("long") % 7 - 3).cast("double") / lit(3.0)))
    )

  private val perturbSql =
    "x * (1 + 0.02 * (CAST(CAST(FLOOR(ABS(x)*1000) AS BIGINT) % 7 - 3 AS DOUBLE) / 3.0))"

  /** DuckDB twin of [[CorpusOps.hashUniform]]: first 7 hex chars of
    * md5(id) as a 28-bit integer over 16⁷ (DuckDB has no hex→int cast, so
    * per-char ascii arithmetic — identical to the Spark expression).
    * Expects a column `h` = md5(CAST(id AS VARCHAR)) in scope.
    */
  private val hashUniformSql: String =
    (1 to 7)
      .map { i =>
        val mult = 1L << (4 * (7 - i))
        s"(CASE WHEN ord(SUBSTR(h, $i, 1)) >= 97 THEN ord(SUBSTR(h, $i, 1)) - 87 " +
          s"ELSE ord(SUBSTR(h, $i, 1)) - 48 END) * $mult"
      }
      .mkString("(", " + ", ") / 268435456.0")

  /** [[hashUniformSql]] over an arbitrarily-named md5 column (the
    * several-salted-uniforms case, e.g. x135's mode + two cut draws).
    */
  private def uniformOf(hcol: String): String =
    hashUniformSql.replace("SUBSTR(h,", s"SUBSTR($hcol,")

  /** Deterministic chat-transcript builder for x125/x126 (expects
    * `doc_id`, `text` in scope): planted orphan header (%11), user
    * continuation line (%3), assistant role repeat (%5), trailing empty
    * assistant turn (%7). Integer arithmetic only, so the DuckDB oracles
    * replay it verbatim.
    */
  private def chatTranscript: Column = {
    val tk = split(col("text"), " ")
    val n = size(tk)
    val h = floor(n / lit(2)).cast("int")
    val t1 = array_join(slice(tk, lit(1), h), " ")
    val t2 = array_join(slice(tk, h + 1, n - h), " ")
    concat(
      when(col("doc_id") % 11 === 0, lit("<<corrupt header>>\n")).otherwise(lit("")),
      lit("system: be concise"),
      lit("\nuser: "),
      t1,
      when(col("doc_id") % 3 === 0, lit("\nplease elaborate")).otherwise(lit("")),
      lit("\nassistant: "),
      t2,
      when(col("doc_id") % 5 === 0, lit("\nassistant: adding more detail")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("\nuser: thanks\nassistant: ")).otherwise(lit(""))
    )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup on a 128-bit digest (shuffle carries 16-byte keys).
    "x1_dedup_exact" -> ((s, dir) => {
      Dedup
        .exact(T(s, dir, "documents"), col("text"), col("doc_id"))
        .orderBy(col("fp"))
    }),

    // Token counting: whitespace + BPE-ish regex pre-tokenizer.
    "x2_token_count" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(
          col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tok"),
          TextOps.tokenCountRegex(col("text")).as("n_tok_bpe")
        )
        .orderBy(col("doc_id"))
    }),

    // Quality features + composite score.
    "x3_quality" -> ((s, dir) => {
      TextOps
        .qualityFeatures(T(s, dir, "documents"), col("text"))
        .withColumn("quality", TextOps.qualityScore)
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("mean_tok_len"),
          col("stopword_ratio"),
          col("punct_ratio"),
          col("quality")
        )
        .orderBy(col("doc_id"))
    }),

    // Language-ID vs the labeled lang column.
    "x4_langid" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), col("lang"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // Content fingerprints: md5 (oracle-checked) + rolling hash (test-checked).
    "x5_fingerprint" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Exact n-gram Jaccard near-dup pairs via inverted index (no LSH, no
    // cross product) — the completeness baseline for the LSH variants.
    // AUTO strategy: naive index on benign shingle-df corpora (this one),
    // PPJoin prefix filter when the hottest shingle df exceeds the
    // crossover (the Zipfian skew-bench corpus) — results identical
    // either way (equivalence-tested), so the oracle replays both.
    "x6_ngram_jaccard" -> ((s, dir) => {
      Dedup
        .ngramJaccardPairsAuto(Tf(s, dir, "documents"), col("text"), col("doc_id"), n = 3, threshold = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // MinHash-LSH near-dup recall, driver-checkable: the PRODUCTION query
    // (LSH candidates over the full corpus) is validated against an exact
    // Jaccard twin at J>=0.5 (the r=2/b=16 collision curve's near-certain
    // region) computed on a deterministic subset (doc_id < 500) — exact
    // all-pairs Jaccard on this tiny-vocab corpus costs more than the LSH
    // itself, and a fixed subset keeps the validation honest (recall is a
    // property of pairs, estimated on a 1/10 sample at sf0.1 and the whole
    // corpus below) while DuckDB replays n_strong on the same subset.
    // recall_ok (strong-subset recall >= 0.9) is a deterministic boolean
    // the oracle asserts as TRUE.
    "x7_minhash_lsh" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val strong = Dedup
        .ngramJaccardPairsPrefix(
          docs.filter(col("doc_id") < 500), col("text"), col("doc_id"), n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val found = Dedup
        .minhashPairs(docs, col("text"), col("doc_id"), n = 3, numHashes = 32, bands = 16, threshold = 0.2)
        .select(col("id_a"), col("id_b"))
      // single left join + one agg: both legs of the comparison run ONCE
      // (separate totals/hits aggregations would re-execute the twin)
      strong
        .join(found.withColumn("hit", lit(1)), Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_strong"), count(col("hit")).as("nf"))
        .select(
          col("n_strong"),
          coalesce(col("nf").cast("double") / col("n_strong") >= 0.9, lit(true)).as("recall_ok")
        )
    }),

    // SimHash near-dup pairs at the standard Manku 64-bit setting (radius
    // 3, 4 blocks → 16-bit block keys). SimHash values hash with xxhash64
    // (no DuckDB twin), so the driver-checked output is the pigeonhole
    // CONSERVATION law instead of the raw pairs: the full-corpus production
    // run, restricted to a fixed subset (doc_id < 500), must equal the
    // brute-force all-pairs Hamming result on that subset EXACTLY — blocks
    // > maxHamming guarantees zero false negatives, and the exact Hamming
    // verify guarantees zero false positives. `pairs_match` is therefore a
    // deterministic TRUE the oracle asserts, alongside a DuckDB-replayable
    // subset row count.
    "x8_simhash" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val prod = Dedup
        .simhashPairs(docs, col("text"), col("doc_id"), maxHamming = 3, blocks = 4)
        .filter(col("id_a") < 500 && col("id_b") < 500)
        .select(col("id_a"), col("id_b"), lit(1).as("p"))
      val fps = Dedup.simhash(docs.filter(col("doc_id") < 500), col("text"), col("doc_id"))
      val brute = fps
        .select(col("id").as("id_a"), col("simhash").as("fa"))
        .join(fps.select(col("id").as("id_b"), col("simhash").as("fb")), col("id_a") < col("id_b"))
        .filter(Dedup.hamming(col("fa"), col("fb")) <= 3)
        .select(col("id_a"), col("id_b"), lit(1).as("e"))
      val mismatches = prod
        .join(brute, Seq("id_a", "id_b"), "full_outer")
        .filter(col("p").isNull || col("e").isNull)
      docs
        .filter(col("doc_id") < 500)
        .agg(count(lit(1)).as("n_docs"))
        .crossJoin(mismatches.agg(count(lit(1)).as("nm")))
        .select(col("n_docs"), (col("nm") === 0).as("pairs_match"))
    }),

    // Exact cosine top-k (brute force, broadcast queries): rank output
    // only — double math is engine-portable, ranks are robust.
    "x9_knn_bruteforce" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ANN via random-hyperplane LSH at the scale-honest 32-bit / 4-block
    // setting, gated on PLANTED ground truth (see [[perturb]]): queries are
    // perturbed twins of corpus rows (cos ≈ 0.9999), so each query's true
    // nearest neighbor is known a priori and the oracle VERIFIES that truth
    // exactly (DuckDB recomputes every query's exact top-1). The gate:
    // ≥ 0.9 of queries must surface their twin at rank 1 through the LSH
    // candidate path — per-query retention is 1−1.6e-6 at these
    // parameters, so the boolean is deterministic and strict (r2's 0.4
    // random-collision bar is gone).
    "x10_knn_lsh" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val queries = emb
        .filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"), perturb(col("embedding")).as("embedding"))
      val hit1 = Similarity
        .lshTopK(emb, queries, "embedding", "vec_id", k = 5, bits = 32, blocks = 4)
        .filter(col("rank") === 1 && col("neighbor_id") === col("query_id") - 100000)
      queries
        .agg(count(lit(1)).as("n_queries"))
        .crossJoin(hit1.agg(count(lit(1)).as("nh")))
        .select(
          col("n_queries"),
          (col("nh").cast("double") / col("n_queries") >= 0.9).as("recall1_ok")
        )
    }),

    // IVF ANN (cluster-then-probe scale path), gated like x10 on PLANTED
    // ground truth: queries are perturbed twins (cos ≈ 0.9999), so each
    // query's exact top-1 is its source row (the oracle re-verifies that
    // brute-force); an ε-perturbed query ranks its source's cell among its
    // own nearest cells, so nprobe=4 of 16 recovers the twin at rank 1
    // essentially always — ≥ 0.9 is strict AND deterministic, where the
    // old random-data bar (0.5 vs brute force on isotropic noise) only
    // measured the probe-coverage fraction.
    "x15_knn_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val queries = emb
        .filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"), perturb(col("embedding")).as("embedding"))
      val hit1 = Similarity
        .ivfTopK(emb, queries, "embedding", "vec_id", k = 5, nlist = 16, nprobe = 4)
        .filter(col("rank") === 1 && col("neighbor_id") === col("query_id") - 100000)
      queries
        .agg(count(lit(1)).as("n_queries"))
        .crossJoin(hit1.agg(count(lit(1)).as("nh")))
        .select(
          col("n_queries"),
          (col("nh").cast("double") / col("n_queries") >= 0.9).as("recall1_ok")
        )
    }),

    // Embedding-cosine near-dup pairs at the operator's near-dup operating
    // point (threshold 0.95), gated on PLANTED twins (see [[perturb]]):
    // 100 perturbed copies (cos ≈ 0.9999) join the corpus; the exact
    // strong-pair twin on a bounded subset (originals < 500 ∪ planted) is
    // DuckDB-replayable — natural pairs top out at ~0.6, so the subset's
    // strong pairs are EXACTLY the planted twins in both engines — and
    // recall_ok asserts the production LSH+verify path recovered ≥ 0.9 of
    // them (per-pair retention 1−1.6e-6 at 32 bits / 4 blocks).
    "x14_embedding_neardup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val planted = emb
        .filter(col("vec_id") < 100)
        .select((col("vec_id") + 100000).as("vec_id"), perturb(col("embedding")).as("embedding"))
      val all = emb.unionByName(planted)
      val found = Similarity
        .cosineNearDupPairs(all, "embedding", "vec_id", threshold = 0.95)
        .select(col("id_a"), col("id_b"), lit(1).as("hit"))
      // exact strong-pair twin, bounded: all-pairs native cosine on the
      // subset (600 rows → 180k pairs), no LSH anywhere in this leg
      val sub = all.filter(col("vec_id") < 500 || col("vec_id") >= 100000)
      val strong = sub
        .select(col("vec_id").as("id_a"), col("embedding").as("va"))
        .join(
          sub.select(col("vec_id").as("id_b"), col("embedding").as("vb")),
          col("id_a") < col("id_b")
        )
        .filter(Similarity.cosine(col("va"), col("vb")) >= 0.95)
        .select(col("id_a"), col("id_b"))
      strong
        .join(found, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_strong"), count(col("hit")).as("nf"))
        .select(
          col("n_strong"),
          coalesce(col("nf").cast("double") / col("n_strong") >= 0.9, lit(true)).as("recall_ok")
        )
    }),

    // Embedding table stats (exact ints only).
    "x11_embedding_stats" -> ((s, dir) => {
      T(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          min(col("vec_id")).as("min_id"),
          max(col("vec_id")).as("max_id"),
          max(size(col("embedding"))).as("dim")
        )
        .orderBy(col("label"))
    }),

    // The corpus-cleaning composite (the end-to-end training-data journey):
    // quality-gate -> language filter -> exact-dedup representative ->
    // per-language cleaned counts. Each stage is an already-oracle-checked
    // operator; this query proves they compose.
    "x19_corpus_clean" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val scored = TextOps
        .qualityFeatures(docs, col("text"))
        .withColumn("quality", TextOps.qualityScore)
        .withColumn("lang_pred", TextOps.langId(col("text")))
        .filter(col("quality") >= 0.3 && col("n_tokens") >= 20)
      val deduped = scored
        .withColumn("fp", TextOps.fingerprintMd5(col("text")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), min(col("lang_pred")).as("lang_pred"))
      deduped
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"), min(col("keep_id")).as("first_doc"))
        .orderBy(col("lang_pred"))
    }),

    // One-pass data-quality profile of the orders table.
    "x18_profile" -> ((s, dir) => {
      graft.operators.Audit
        .profile(
          T(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
        )
    }),

    // Time-series resampling: hourly grid per user, forward-filled with
    // the latest event value (grid + as-of composition).
    "x17_resample" -> ((s, dir) => {
      graft.operators.AsOfJoin
        .resample(
          T(s, dir, "events").select(col("user_id"), col("ts"), col("value")),
          "user_id",
          "ts",
          "1 hour",
          Seq("value")
        )
        .select(col("user_id"), unix_millis(col("ts")).as("grid_ms"), col("value"))
        .orderBy(col("user_id"), col("grid_ms"))
    }),

    // Word count (explode + aggregate + top-k): the table-function path.
    "x16_token_freq" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // Multimodal metadata extraction: binary columns + typed metadata
    // (byte length is exact; decode internals are the stub).
    "x12_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(s, T(s, dir, "documents"))
      Multimodal
        .decode(media)
        .toDF()
        .select(col("doc_id"), col("media_type"), col("byte_len"), col("channels"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition quality signals (Rae et al. 2021): duplicate
    // token/3-gram ratios + most-frequent-token share, per document.
    "x20_repetition" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.operators.CorpusOps
        .repetitionFeatures(docs, col("text"), col("doc_id"))
        .select(
          col("doc_id"),
          col("n_tokens"),
          round(col("dup_token_ratio"), 6).as("dup_token_ratio"),
          round(col("top_token_ratio"), 6).as("top_token_ratio"),
          round(col("dup_3gram_ratio"), 6).as("dup_3gram_ratio")
        )
        .orderBy(col("doc_id"))
    }),

    // Deterministic 80/10/10 hash split (contamination-stable): per-split
    // doc counts, language spread, and token mass.
    "x21_hash_split" -> ((s, dir) => {
      graft.operators.CorpusOps
        .hashSplit(T(s, dir, "documents"), col("doc_id"))
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens")
        )
        .orderBy(col("split"))
    }),

    // Sequence packing at a 2048-token budget, sharded by language (the
    // parallel-packing shape — see CorpusOps.packSequences scale note):
    // per-shard sequence counts + fill accounting.
    "x22_seq_pack" -> ((s, dir) => {
      graft.operators.CorpusOps
        .packSequences(
          T(s, dir, "documents"),
          size(split(col("text"), " ")).cast("long"),
          col("doc_id"),
          col("lang"),
          budget = 2048
        )
        .groupBy(col("lang"))
        .agg(
          (max(col("seq_id")) + 1).as("n_seqs"),
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens")
        )
        .select(
          col("lang"),
          col("n_seqs"),
          col("n_docs"),
          col("n_tokens"),
          round(
            col("n_tokens").cast("double") / (col("n_seqs") * 2048).cast("double"),
            6
          ).as("fill_ratio")
        )
        .orderBy(col("lang"))
    }),

    // Multimodal resize + feature-extract plumbing: nearest-neighbor
    // byte-plane downsample (factor 4) through the typed mapPartitions
    // path, then the decode stub's REAL feature computation summarized as
    // exact integers (resized length + count of occupied 3-bit histogram
    // bins — DuckDB replays both via ord() on the subsampled chars).
    "x23_media_resize" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(s, T(s, dir, "documents"))
      val resized = Multimodal.resizeDataset(media, factor = 4)
      Multimodal
        .decode(resized)
        .toDF()
        .select(
          col("doc_id"),
          col("byte_len").as("resized_len"),
          size(filter(col("features"), f => f > 0f)).as("occupied_bins")
        )
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination (GPT-3 appendix-C shape): flag training
    // documents sharing any 8-gram with a held-out "benchmark" slice
    // (doc_id % 97 == 0 stands in for the eval set). Benchmark side
    // broadcasts; the corpus is one scan + explode, no corpus shuffle
    // before the per-doc aggregation.
    //
    // Planted contamination (the x10/x14 pattern): a deterministic subset
    // of the benchmark docs re-enters the CORPUS side under shifted ids.
    // Without it the synthetic corpus shares no natural 8-gram with the
    // benchmark slice at the gate scale and both engines compared 0 rows
    // to 0 rows — a vacuously green gate (round-3 review). The planted
    // rows guarantee non-empty, content-checked output: each planted doc
    // must be flagged with bench_id = its source doc and n_hits = the
    // full gram count, and the join/agg logic is exercised cross-engine.
    "x24_decontaminate" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val planted = bench
        .filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0).unionByName(planted)
      graft.operators.CorpusOps
        .decontaminate(
          corpus,
          col("text"),
          col("doc_id"),
          bench,
          col("text"),
          col("doc_id"),
          n = 8
        )
        .orderBy(col("doc_id"))
    }),

    // Domain-mixture rebalancing: per-source token masses + deterministic
    // sampling rates toward target shares (src0 squeezed to 1%, src1
    // targeted at 10% and capped at 1.0 — no upsampling; the rest uniform).
    "x25_domain_mix" -> ((s, dir) => {
      graft.operators.CorpusOps
        .domainMix(
          T(s, dir, "documents"),
          col("source"),
          size(split(col("text"), " ")).cast("long"),
          shares = Map("src0" -> 0.01, "src1" -> 0.10)
        )
        .select(
          col("domain"),
          col("tokens"),
          col("target_tokens"),
          round(col("sample_rate"), 6).as("sample_rate")
        )
        .orderBy(col("domain"))
    }),

    // Fuzzy-dedup cluster resolution: near-dup PAIRS → connected
    // components (alternating large-star/small-star) → one representative
    // per cluster. Planted structure makes the graph non-trivial in both
    // engines: identical-copy 3-cliques (doc%50 → +2M/+4M) and 2-hop
    // BRIDGE chains (doc%100: tail(a)+head(a+1) under +3M — similar to
    // both endpoints, which stay dissimilar to each other), so min-label
    // propagation across multiple hops is exercised, not just clique
    // collapse. Edges are exact n-gram Jaccard ≥ 0.25 (DuckDB-replayable);
    // the oracle recomputes components via recursive transitive closure.
    "x26_dedup_clusters" -> ((s, dir) => {
      val base = T(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 2000)
      val cliq = base.filter(col("doc_id") % 50 === 0)
      val copies = cliq
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        .unionByName(cliq.select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
      val bridges = base
        .filter(col("doc_id") % 100 === 0)
        .alias("a")
        .join(base.alias("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(
          (col("a.doc_id") + 3000000L).as("doc_id"),
          concat_ws(
            " ",
            concat(
              slice(split(col("a.text"), " "), 21, 20),
              slice(split(col("b.text"), " "), 1, 20)
            )
          ).as("text")
        )
      val corpus = base.unionByName(copies).unionByName(bridges)
      val pairs =
        Dedup.ngramJaccardPairs(corpus, col("text"), col("doc_id"), n = 3, threshold = 0.25)
      ConnectedComponents
        .assignClusters(corpus, col("doc_id"), pairs)
        .orderBy(col("doc_id"))
    }),

    // PII redaction with planted PII (every doc gains one email, one IP,
    // one phone): per-doc hit counts + md5 of the scrubbed text — the
    // strongest cross-engine check of the actual replacement output.
    "x27_pii_redact" -> ((s, dir) => {
      val withPii = T(s, dir, "documents").select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" reach user"),
          col("doc_id").cast("string"),
          lit("@mail.example.org from 10."),
          (col("doc_id") % 254).cast("string"),
          lit(".0.7 call 555-867-5309")
        ).as("text")
      )
      withPii
        .select(col("doc_id"), TextOps.piiScrub(col("text")).as("pii"))
        .select(
          col("doc_id"),
          col("pii.n_emails").as("n_emails"),
          col("pii.n_ips").as("n_ips"),
          col("pii.n_phones").as("n_phones"),
          md5(col("pii.redacted")).as("fp"),
          length(col("pii.redacted")).as("redacted_len")
        )
        .orderBy(col("doc_id"))
    }),

    // Stratified deterministic sampling APPLYING x25's domain-mix rates:
    // per-domain md5-hash sampling at the computed rate, then the achieved
    // token mass vs target. The end-to-end rebalancing execution, fully
    // reproducible (a row's fate depends only on md5(doc_id)).
    "x28_stratified_sample" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val mix = CorpusOps
        .domainMix(
          docs,
          col("source"),
          size(split(col("text"), " ")).cast("long"),
          shares = Map("src0" -> 0.01, "src1" -> 0.10)
        )
        .select(col("domain"), col("tokens"), col("target_tokens"), col("sample_rate"))
      val withTok = docs.select(
        col("doc_id"),
        col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok")
      )
      val kept = CorpusOps.sampleByRate(
        withTok.join(mix.withColumnRenamed("domain", "source"), Seq("source")),
        col("doc_id"),
        col("sample_rate")
      )
      val keptAgg = kept
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).cast("long").as("kept_tokens"))
      mix
        .join(keptAgg.withColumnRenamed("source", "domain"), Seq("domain"), "left")
        .select(
          col("domain"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
          col("target_tokens"),
          round(
            coalesce(col("kept_tokens"), lit(0L)).cast("double") /
              col("target_tokens").cast("double"),
            6
          ).as("fill_vs_target")
        )
        .orderBy(col("domain"))
    }),

    // Exact per-language median gate (percentile_disc semantics): keep
    // docs at/above their language's median token count — the per-domain
    // quantile filtering step of corpus curation, with a deterministic
    // VALUE cutoff (tie-stable in both engines).
    "x29_quantile_filter" -> ((s, dir) => {
      val d = T(s, dir, "documents")
        .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      val kept = CorpusOps.quantileFilter(d, col("lang"), col("n_tok"), q = 0.5)
      val totals = d.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      kept
        .groupBy(col("lang"))
        .agg(
          first(col("cutoff")).as("cutoff"),
          count(lit(1)).as("n_kept"),
          sum(col("n_tok")).cast("long").as("kept_tokens")
        )
        .join(totals, Seq("lang"))
        .select(col("lang"), col("n_total"), col("cutoff"), col("n_kept"), col("kept_tokens"))
        .orderBy(col("lang"))
    }),

    // Corpus-wide line-level dedup (the C4 boilerplate pass): every doc
    // gains a universal boilerplate line (count = corpus size → dropped),
    // docs %7 share a semi-common footer (dropped at minDupCount=3), and
    // docs %250==1 share a rare 2-copy line (kept — below the threshold).
    // md5 of the reassembled text value-checks the actual output.
    "x30_line_dedup" -> ((s, dir) => {
      val nl = "\n"
      val lineified = T(s, dir, "documents").select(
        col("doc_id"),
        concat(
          col("text"),
          lit(nl + "subscribe now and click here"),
          when(col("doc_id") % 7 === 0, lit(nl + "all rights reserved")).otherwise(lit("")),
          when(col("doc_id") % 250 === 1, lit(nl + "rare twin line")).otherwise(lit(""))
        ).as("text")
      )
      CorpusOps
        .dedupLines(lineified, col("doc_id"), col("text"), sep = nl, minDupCount = 3)
        .select(
          col("doc_id"),
          col("n_lines"),
          col("n_kept"),
          md5(col("text")).as("fp_clean")
        )
        .orderBy(col("doc_id"))
    }),

    // Context-window chunking: 64-token windows, 16-token overlap; the
    // tail window is emitted only when it adds tokens beyond the overlap.
    // md5 of each chunk's text value-checks exact token boundaries.
    "x31_chunk_tokens" -> ((s, dir) => {
      CorpusOps
        .chunkTokens(T(s, dir, "documents"), col("doc_id"), col("text"), chunkSize = 64, overlap = 16)
        .select(
          col("doc_id"),
          col("chunk_idx"),
          col("start"),
          size(col("chunk")).cast("long").as("n_tok"),
          md5(array_join(col("chunk"), " ")).as("fp")
        )
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Symmetric int8 embedding quantization: every output is an exact
    // integer (sums/extremes of quantized components; the dequantization
    // error as floor-scaled ppm of max|v|), so the cross-engine check is
    // bit-exact with no double in the compared values.
    "x32_embedding_quantize" -> ((s, dir) => {
      val q = T(s, dir, "embeddings")
        .select(
          col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"),
          Similarity.quantizeInt8(col("embedding")).as("qz")
        )
      q.select(
          col("vec_id"),
          size(col("qz.q")).as("n_dims"),
          aggregate(col("qz.q"), lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate(col("qz.q"), lit(0L), (a, x) => a + x * x).as("q_sumsq"),
          array_min(col("qz.q")).cast("long").as("q_min"),
          array_max(col("qz.q")).cast("long").as("q_max"),
          when(col("qz.max_abs") === 0.0, 0L)
            .otherwise(
              floor(
                array_max(
                  zip_with(col("qz.q"), col("v"), (qi, vi) => abs(qi * col("qz.scale") - vi))
                ) / col("qz.max_abs") * lit(1000000.0)
              )
            )
            .as("err_ppm")
        )
        .orderBy(col("vec_id"))
    }),

    // Incremental ingest dedup: the incoming batch (odd docs + exact
    // re-ingests of the even half + intra-batch dup plants) against the
    // accepted reference (even docs). Re-ingests must vanish via the
    // digest anti-join; intra-batch dups collapse to the smallest id.
    "x33_incremental_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = docs.filter(col("doc_id") % 2 === 0)
      val incoming = docs
        .filter(col("doc_id") % 2 === 1)
        .unionByName(
          ref.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        )
        .unionByName(
          docs
            .filter(col("doc_id") % 2 === 1 && col("doc_id") % 5 === 1)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        )
      Dedup
        .incremental(incoming, col("text"), col("doc_id"), ref, col("text"))
        .orderBy(col("keep_id"))
    }),

    // Incremental dedup through the Bloom-prefilter path: identical
    // semantics to x33 (the sketch only prunes; bloom-positives are
    // confirmed by digest equality) on a different residue split, so the
    // oracle is the plain anti-join while the Spark plan is the
    // zero-reference-shuffle sketch layout.
    "x35_bloom_incremental" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = docs.filter(col("doc_id") % 3 === 0)
      val incoming = docs
        .filter(col("doc_id") % 3 =!= 0)
        .unionByName(
          ref
            .filter(col("doc_id") % 2 === 0)
            .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
        )
      Dedup
        .incrementalBloom(incoming, col("text"), col("doc_id"), ref, col("text"))
        .orderBy(col("keep_id"))
    }),

    // BM25 retrieval scoring (Robertson; Lucene idf form) against a
    // 3-term query literal: the isin filter runs in the scan projection,
    // the df table is <=3 rows (broadcast by construction), N/avgdl ride
    // a 1-row cross join. Scores rounded to 6dp on both engines.
    "x38_bm25" -> ((s, dir) =>
      CorpusOps
        .bm25(T(s, dir, "documents"), col("doc_id"), col("text"), Seq("spark", "window", "merge"))
        .orderBy(col("doc_id"))),

    // Per-doc top-3 TF-IDF terms: (doc,term) partial-agg counts, a
    // vocabulary-keyed df agg, one doc-keyed window for the top-k —
    // deterministic ties by term; integer tf/df keep the double
    // tf*ln(N/df) bit-identical across engines.
    "x39_tfidf_terms" -> ((s, dir) =>
      CorpusOps
        .tfidfTopTerms(T(s, dir, "documents"), col("doc_id"), col("text"), k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // Int8-quantized ANN with exact rescore: the approx pass runs the
    // same fused cosine kernel on integer-valued arrays (symmetric scales
    // cancel), so the shortlist boundary is bit-reproducible and DuckDB
    // can replay the whole two-stage pipeline.
    "x42_knn_quantized" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      Similarity
        .quantizedTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id", k = 5, shortlist = 20)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Deterministic exact-k per-group sample: md5-ranked draw, compiled
    // to WindowGroupLimit (partial top-k before the exchange).
    "x43_sample_exact_k" -> ((s, dir) =>
      CorpusOps
        .sampleExactK(T(s, dir, "documents").select(col("doc_id"), col("lang")), col("lang"), col("doc_id"), k = 3)
        .orderBy(col("lang"), col("sample_rank"))),

    // Batched BM25: query table (first-3-token queries from docs 0-2)
    // broadcast to the corpus scan; only hits reach an exchange; top-10
    // per query via WindowGroupLimit. Ranks on the 6dp-rounded score so
    // both engines order identical values.
    "x44_bm25_topk" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val qs = docs
        .filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), slice(split(col("text"), " "), 1, 3).as("terms"))
      CorpusOps
        .bm25TopK(docs, col("doc_id"), col("text"), qs, col("qid"), col("terms"), k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LM-perplexity gate (CCNet shape): add-one bigram model trained on
    // the doc_id%10==0 reference split, scoring every doc; exact-integer
    // counts, per-doc mean rounded 6dp.
    "x45_perplexity_gate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TextOps
        .perplexityGate(docs, col("doc_id"), col("text"),
          docs.filter(col("doc_id") % 10 === 0), col("text"), minLogProb = -4.0)
        .orderBy(col("doc_id"))
    }),

    // Normalization-keyed exact dedup: the corpus is re-planted with
    // case/whitespace-jittered twins (doc_id%4==0 re-crawled UPPERCASE
    // with doubled/leading/trailing spaces — the most common benign
    // mutation between crawls of the same page). The NormalizeText native
    // kernel collapses every twin onto its source digest, so those fps
    // show n_copies=2; a raw-text digest would keep all jitter copies.
    // Normalization is a zero-shuffle projection; the group-by still
    // moves only 16-byte keys.
    "x46_normalized_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val jitter = docs
        .filter(col("doc_id") % 4 === 0)
        .select(
          (col("doc_id") + 1000000).as("doc_id"),
          upper(concat(lit("  "), regexp_replace(col("text"), " ", "  "), lit(" ")))
            .as("text")
        )
      Dedup
        .exact(docs.unionByName(jitter), col("text"), col("doc_id"))
        .orderBy(col("fp"))
    }),

    // Content-defined chunking: boundaries from local window content
    // (md5-nibble 1-in-16 rule), so chunk fps survive upstream token
    // shifts — the chunk-granular dedup key. Zero-shuffle projection.
    "x47_cdc_chunks" -> ((s, dir) =>
      CorpusOps
        .cdcChunks(T(s, dir, "documents"), col("doc_id"), col("text"), window = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Cross-corpus vocabulary overlap per language pair: exact sizes /
    // intersection / Jaccard (the oracle surface) + est_ok gating the
    // MinHash-sketch estimate — the sketch is the 100 TB path (each group
    // reduces to 64 longs before any pair is compared).
    "x48_corpus_overlap" -> ((s, dir) =>
      CorpusOps
        .vocabOverlap(T(s, dir, "documents"), col("lang"), col("text"))
        .orderBy(col("group_a"), col("group_b"))),

    // Heavy hitters: exact top-20 terms (TakeOrdered over partial-agg
    // counts) + est_ok asserting the count-min-sketch estimate stays
    // inside its cnt <= est <= cnt + ceil(eps*N) guarantee.
    "x49_heavy_hitters" -> ((s, dir) =>
      CorpusOps
        .heavyHitters(T(s, dir, "documents"), col("text"), k = 20)
        .orderBy(col("rank"))),

    // Keep-best cluster dedup: x26's planted near-dup corpus, but the
    // representative is the highest-quality member (char length here;
    // any per-doc score works) instead of the smallest id — the policy
    // real curation pipelines run. Winner via min_by aggregate (no
    // window sort); ties broken by id.
    "x50_dedup_keep_best" -> ((s, dir) => {
      val base = T(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 2000)
      val cliq = base.filter(col("doc_id") % 50 === 0)
      val copies = cliq
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        .unionByName(cliq.select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
      val bridges = base
        .filter(col("doc_id") % 100 === 0)
        .alias("a")
        .join(base.alias("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(
          (col("a.doc_id") + 3000000L).as("doc_id"),
          concat_ws(
            " ",
            concat(
              slice(split(col("a.text"), " "), 21, 20),
              slice(split(col("b.text"), " "), 1, 20)
            )
          ).as("text")
        )
      val corpus = base.unionByName(copies).unionByName(bridges)
      val pairs =
        Dedup.ngramJaccardPairs(corpus, col("text"), col("doc_id"), n = 3, threshold = 0.25)
      ConnectedComponents
        .assignClustersKeepBest(corpus, col("doc_id"), length(col("text")), pairs)
        .orderBy(col("doc_id"))
    }),

    // BPE apply over a fixed merge table (training is x-engine-untestable
    // by its loop; see trainBpe's scaladoc — the APPLY kernel is the hot
    // corpus-scale path and oracle-checks here). Merges are all a!=b, so
    // one greedy pass == all non-overlapping matches and the oracle can
    // replay each merge with two delimiter-padded REPLACE sweeps.
    "x61_bpe_segment" -> ((s, dir) => {
      val merges = Seq(
        "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
        "v" -> "a", "va" -> "l", "s" -> "c", "sc" -> "a"
      )
      T(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.functions.text.bpe_segment(col("text"), merges).as("toks")
        )
        .select(
          col("doc_id"),
          size(col("toks")).as("n_subwords"),
          md5(concat_ws("|", col("toks"))).as("seg_fp")
        )
        .orderBy(col("doc_id"))
    }),

    // Snapshot diff: the new crawl drops id%31==0, rewrites id%13==0
    // (prepended marker), and adds 100 fresh ids — per-doc status plus
    // the 4-group drift summary both engines replay exactly.
    "x60_snapshot_diff" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val newCrawl = docs
        .filter(col("doc_id") % 31 =!= 0)
        .select(
          col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(lit("rev2 "), col("text")))
            .otherwise(col("text")).as("text")
        )
        .unionByName(
          docs
            .filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
        )
      CorpusOps
        .snapshotDiff(docs, col("doc_id"), col("text"), newCrawl, col("doc_id"), col("text"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status"))
    }),

    // Image near-dup (perceptual aHash + Manku blocking) on the media
    // twin of the corpus, planted with same-length 2-byte re-encodes —
    // the x8 self-certifying shape: blocked pairs vs the brute-force
    // hamming join must agree exactly (pairs_match hash-fails otherwise);
    // n_twins pins the planted layout.
    "x59_image_neardup" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val corpus = docs
        .select(col("doc_id"), col("text"), col("source"))
        .unionByName(
          docs
            .filter(col("doc_id") % 20 === 0)
            .select(
              (col("doc_id") + 100000L).as("doc_id"),
              concat(lit("zz"), expr("substring(text, 3)")).as("text"),
              col("source")
            )
        )
      val media = Multimodal.fromDocuments(s, corpus)
      val pairs = Multimodal
        .imageNearDupPairs(media, maxHamming = 2)
        .select(col("id_a"), col("id_b"), lit(1).as("p"))
      val fps = Multimodal.aHash(media)
      val brute = fps
        .select(col("id").as("id_a"), col("simhash").as("fa"))
        .join(fps.select(col("id").as("id_b"), col("simhash").as("fb")), col("id_a") < col("id_b"))
        .filter(Dedup.hamming(col("fa"), col("fb")) <= 2)
        .select(col("id_a"), col("id_b"), lit(1).as("e"))
      val mismatches = pairs
        .join(brute, Seq("id_a", "id_b"), "full_outer")
        .filter(col("p").isNull || col("e").isNull)
      corpus
        .agg(count(lit(1)).as("n_docs"), sum((col("doc_id") >= 100000L).cast("long")).as("n_twins"))
        .crossJoin(mismatches.agg(count(lit(1)).as("nm")))
        .select(col("n_docs"), col("n_twins"), (col("nm") === 0).as("pairs_match"))
    }),

    // Containment (quote detection): 12-token excerpts planted from
    // doc_id%7 sources — every excerpt shingle appears in its source, so
    // C(excerpt→source)=1.0 while Jaccard would be ~10/50; ordered pairs.
    "x58_containment" -> ((s, dir) => {
      val docs =
        T(s, dir, "documents").select(col("doc_id"), col("text")).filter(col("doc_id") < 300)
      val quotes = docs
        .filter(col("doc_id") % 7 === 0)
        .select(
          (col("doc_id") + 5000000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 5, 12)).as("text")
        )
      Dedup
        .ngramContainmentPairs(
          docs.unionByName(quotes),
          col("text"),
          col("doc_id"),
          n = 3,
          threshold = 0.9
        )
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Weighted sampling without replacement (A-Res): inclusion odds
    // proportional to n_chars; the draw key is deterministic (doc-id md5)
    // so both engines pick identical winners.
    "x56_sample_weighted" -> ((s, dir) =>
      CorpusOps
        .sampleWeighted(T(s, dir, "documents"), col("doc_id"), col("n_chars"), k = 100)
        .orderBy(col("doc_id"))),

    // JL random projection (Achlioptas ±1 signs from md5(i_j)): 64 → 8
    // dims; one row per (vec_id, j) so the float components hash
    // identically across engines after 6dp rounding.
    "x57_random_project" -> ((s, dir) =>
      graft.operators.Similarity
        .randomProject(T(s, dir, "embeddings"), col("vec_id"), col("embedding"), dim = 64, k = 8)
        .orderBy(col("vec_id"), col("j"))),

    // Bloom-prefiltered decontamination: same planted layout (and the
    // same oracle SQL) as x24 — the sketch only prefilters, the confirm
    // join keeps the result exact, so both variants must hash-match the
    // one oracle.
    "x55_decontaminate_bloom" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val planted = bench
        .filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0).unionByName(planted)
      graft.operators.CorpusOps
        .decontaminateBloom(
          corpus,
          col("text"),
          col("doc_id"),
          bench,
          col("text"),
          col("doc_id"),
          n = 8
        )
        .orderBy(col("doc_id"))
    }),

    // DSIR importance resampling: λ = per-bucket target/raw log-ratio
    // (bounded model collected once, riding the plan as a literal);
    // Gumbel top-k keyed on the doc-id md5 makes the paper's
    // without-replacement draw deterministic and engine-replayable.
    // Target = the English split of the same corpus.
    "x51_dsir_resample" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      CorpusOps
        .dsirResample(
          docs,
          col("doc_id"),
          col("text"),
          docs.filter(col("lang") === "en"),
          col("text"),
          k = 100
        )
        .orderBy(col("doc_id"))
    }),

    // Gopher rule gate: documents re-planted with bullet/ellipsis lines
    // on fixed residues so the line-level rules discriminate (the corpus
    // is single-line); every signal lands in the output for the oracle.
    "x52_gopher_gate" -> ((s, dir) => {
      val planted = T(s, dir, "documents").select(
        col("doc_id"),
        concat(
          col("text"),
          when(col("doc_id") % 7 === 0, lit("\n- bullet item\n* second item"))
            .otherwise(lit("")),
          when(col("doc_id") % 9 === 0, lit("\ntrailing teaser line..."))
            .otherwise(lit(""))
        ).as("text")
      )
      TextOps
        .gopherQualityGate(planted, col("doc_id"), col("text"), minWords = 30)
        .orderBy(col("doc_id"))
    }),

    // Per-domain quota cap. The oracle replays the plain window (the
    // operator's DEFAULT path — WindowGroupLimit already bounds it, see
    // the scaladoc); the query runs the engine-independent hash-quantile
    // prefilter variant so the nontrivial path is the one the
    // cross-engine gate certifies.
    "x53_domain_cap" -> ((s, dir) =>
      CorpusOps
        .capPerDomain(
          T(s, dir, "documents"),
          col("doc_id"),
          col("source"),
          cap = 10,
          prefilter = true
        )
        .orderBy(col("domain"), col("rk"))),

    // Deterministic global training order + shard cut: distributed rank
    // via 4096 hash-prefix buckets + prefix-offset literal — never a
    // partition-less window; the oracle replays the single-sort form.
    "x54_assign_shards" -> ((s, dir) =>
      CorpusOps
        .assignShards(T(s, dir, "documents"), col("doc_id"), shardSize = 64)
        .orderBy(col("doc_id"))),

    // Token-distribution entropy gate: ln(n) - (sum tf*ln tf)/n keeps
    // every per-element double derived from exact integers; 6dp rounding
    // absorbs the engines' summation-order ulps.
    "x40_token_entropy" -> ((s, dir) =>
      TextOps
        .tokenEntropy(T(s, dir, "documents"), col("doc_id"), col("text"), minEntropy = 2.0)
        .orderBy(col("doc_id"))),

    // Inverted index with capped posting lists: the cap is enforced by a
    // term-keyed row_number BEFORE the collect (bounded reduce state); df
    // stays exact. Postings ride as a comma-joined string so both engines
    // hash the same representation.
    "x41_inverted_index" -> ((s, dir) =>
      CorpusOps
        .invertedIndex(T(s, dir, "documents"), col("doc_id"), col("text"), maxPostings = 100)
        .orderBy(col("term"))),

    // Hashed-feature linear classifier inference (fastText-style quality
    // gate): the model is a 4096-long integer weight vector riding the
    // plan as a literal; buckets are md5-based so DuckDB recomputes every
    // feature bit-exactly. The oracle derives w(bucket) from the same
    // formula the Scala side tabulates the array with.
    "x36_quality_classifier" -> ((s, dir) => {
      val weights = Array.tabulate(TextOps.hashedFeatureDim) { b =>
        (b.toLong * 2654435761L) % 1001L - 500L
      }
      TextOps
        .scoreLinearHashed(T(s, dir, "documents"), col("doc_id"), col("text"), weights)
        .select(col("id").as("doc_id"), col("n_tokens"), col("score"), col("kept"))
        .orderBy(col("doc_id"))
    }),

    // Corpus-wide duplicated-span removal (Lee et al. ExactSubstr family,
    // token-range unit): two boilerplate phrases planted on disjoint id
    // residues — the 8-token windows fully inside a phrase are corpus-wide
    // duplicates (the whole phrase is cut), the windows crossing into
    // doc-specific prose are unique (the surrounding text survives).
    // Compared values are exact ints + md5 of the rebuilt text.
    "x34_span_dedup" -> ((s, dir) => {
      val spanified = T(s, dir, "documents").select(
        col("doc_id"),
        concat(
          col("text"),
          when(
            col("doc_id") % 3 === 0,
            lit(" please subscribe to our newsletter for daily updates and offers today")
          ).otherwise(lit("")),
          when(
            col("doc_id") % 11 === 5,
            lit(" this content is licensed under creative commons attribution terms")
          ).otherwise(lit(""))
        ).as("text")
      )
      CorpusOps
        .dedupSpans(spanified, col("doc_id"), col("text"), k = 8, minDupCount = 2)
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("n_kept"),
          md5(col("text")).as("fp_clean")
        )
        .orderBy(col("doc_id"))
    }),

    // SemDeDup on a bounded planted corpus: originals (<500) + perturbed
    // twins (cos ≈ 0.9999, ids +200000). Natural pairs top out ~0.6, so
    // the exact strong-pair set is EXACTLY the planted twins in both
    // engines; the operator (k-means cells + within-cell cosine) must
    // drop only planted ids (drops_planted_only) and recover ≥ 0.9 of
    // them (recall_ok — cell-boundary misses are the documented
    // SemDeDup approximation).
    "x37_semantic_dedup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .filter(col("vec_id") < 500)
      val planted = emb
        .filter(col("vec_id") < 100)
        .select((col("vec_id") + 200000).as("vec_id"), perturb(col("embedding")).as("embedding"))
      val all = emb.unionByName(planted)
      val cents = Similarity.ivfTrain(all, "embedding", "vec_id", nlist = 8, iters = 2)
      val res = Similarity.semanticDedup(cents, all, "embedding", "vec_id", threshold = 0.95)
      // exact strong-pair twin on the bounded corpus — no clustering here
      val l = all.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val r = all.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      // recall denominator = VERTICES with a smaller strong neighbor (the
      // rows a perfect min-keeping dedup would drop), not strong EDGES:
      // identical on disjoint planted twins, and correct when strong pairs
      // form a clique (a 50%-hot-cluster corpus — the skew twin — has m-1
      // droppable vertices but m(m-1)/2 edges, which no dedup can "recall")
      val strong = l
        .join(r, col("id_a") < col("id_b"))
        .filter(Similarity.cosine(col("va"), col("vb")) >= 0.95)
        .agg(
          count(lit(1)).as("n_strong"),
          count_distinct(col("id_b")).cast("double").as("__dropTarget")
        )
      res
        .agg(
          count(lit(1)).as("n_docs"),
          coalesce(bool_and(when(!col("kept"), col("vec_id") >= 200000)), lit(true))
            .as("drops_planted_only"),
          sum(when(!col("kept"), 1L).otherwise(0L)).cast("double").as("__nd")
        )
        .crossJoin(strong)
        .select(
          col("n_docs"),
          col("n_strong"),
          col("drops_planted_only"),
          (col("__nd") / col("__dropTarget") >= 0.9).as("recall_ok")
        )
    }),

    // PMI collocations: top-100 adjacent-pair associations at minCount=3.
    // Counts are exact longs on both engines; the top-k cut orders on the
    // ROUNDED pmi (ties by pair) so the k-boundary is cross-engine stable.
    "x62_pmi_collocations" -> ((s, dir) =>
      CorpusOps
        .pmiCollocations(T(s, dir, "documents"), col("text"), minCount = 3, k = 100)
        .orderBy(col("pmi").desc, col("w1"), col("w2"))),

    // Epoch-capped √-temperature mixture over the (naturally skewed)
    // lang column: budget 600 docs, ≤1.5 epochs per domain — at sf0.01
    // this exercises BOTH regimes (en stays sub-epoch, small langs go
    // past one epoch, and the cap binds for the smallest).
    "x63_epoch_mixture" -> ((s, dir) =>
      CorpusOps
        .epochMixture(
          T(s, dir, "documents"),
          col("lang"),
          col("doc_id"),
          budget = 600,
          maxEpochs = 1.5
        )
        .orderBy(col("doc_id"))),

    // Leakage-safe split on x26's planted near-dup corpus: every member
    // of a connected component inherits md5(component)'s split bucket,
    // so planted clique/bridge clusters can never straddle train/test.
    "x64_leakage_split" -> ((s, dir) => {
      val base = T(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 2000)
      val cliq = base.filter(col("doc_id") % 50 === 0)
      val copies = cliq
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        .unionByName(cliq.select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
      val bridges = base
        .filter(col("doc_id") % 100 === 0)
        .alias("a")
        .join(base.alias("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(
          (col("a.doc_id") + 3000000L).as("doc_id"),
          concat_ws(
            " ",
            concat(
              slice(split(col("a.text"), " "), 21, 20),
              slice(split(col("b.text"), " "), 1, 20)
            )
          ).as("text")
        )
      val corpus = base.unionByName(copies).unionByName(bridges)
      val pairs =
        Dedup.ngramJaccardPairs(corpus, col("text"), col("doc_id"), n = 3, threshold = 0.25)
      ConnectedComponents
        .leakageSafeSplit(corpus, col("doc_id"), pairs)
        .orderBy(col("doc_id"))
    }),

    // Norm-z-score embedding sanity gate with planted corruption: 1 %
    // zeroed (collapse) + 1 % tripled (mis-scale) vectors among the
    // unit-normalized corpus. Natural z ≈ −0.04, planted z ≈ −4.6 / +9.0
    // — the |z| > 3 booleans sit far from any engine boundary, and the
    // norms themselves are bit-identical ascending-index loops.
    "x65_norm_outliers" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val zeroed = emb
        .filter(col("vec_id") % 100 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), transform(col("v"), x => x * lit(0.0)).as("v"))
      val tripled = emb
        .filter(col("vec_id") % 100 === 1)
        .select((col("vec_id") + 200000L).as("vec_id"), transform(col("v"), x => x * lit(3.0)).as("v"))
      Similarity
        .normOutliers(
          emb.unionByName(zeroed).unionByName(tripled),
          col("vec_id"),
          col("v"),
          zThresh = 3.0
        )
        .orderBy(col("vec_id"))
    }),

    // Per-label mean-pooled embedding (passage→document pooling),
    // emitted as (group, n_vecs, i, component) scalar rows.
    "x66_mean_pool" -> ((s, dir) =>
      Similarity
        .meanPoolByGroup(
          T(s, dir, "embeddings")
            .select(col("label"), col("embedding").cast("array<double>").as("v")),
          col("label"),
          col("v")
        )
        .select(col("group"), col("n_vecs"), posexplode(col("vec")).as(Seq("i", "m")))
        .orderBy(col("group"), col("i"))),

    // N-gram novelty vs a reference corpus (docs ≡ 0 mod 3): the BLOOM
    // path runs here (bloom-negatives never reach the confirm join) and
    // must produce the exact answer the oracle computes relationally —
    // reference docs score ~0, the rest score high.
    "x67_novelty" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      CorpusOps
        .noveltyScoreBloom(
          docs,
          col("text"),
          col("doc_id"),
          docs.filter(col("doc_id") % 3 === 0),
          col("text"),
          n = 3
        )
        .orderBy(col("doc_id"))
    }),

    // Zipf rank-frequency OLS over the top-500 terms: slope/intercept/r2
    // from five scalar sums; the top-R cut is deterministic (count desc,
    // term) on both engines.
    "x68_zipf_profile" -> ((s, dir) =>
      CorpusOps.zipfProfile(T(s, dir, "documents"), col("text"), topR = 500)),

    // Skip-gram co-occurrence PMI at window 3 — the embedding-prep
    // co-occurrence table; same exact-count machinery as x62, pair
    // generation still a zero-shuffle projection.
    "x69_cooccurrence" -> ((s, dir) =>
      CorpusOps
        .pmiCollocations(T(s, dir, "documents"), col("text"), minCount = 3, k = 100, window = 3)
        .orderBy(col("pmi").desc, col("w1"), col("w2"))),

    // Deterministic cross-domain negative sampling (contrastive/DPR
    // prep): draw j of doc d targets global rank ⌊u(md5(d#j))·N⌋; the
    // oracle replays ranks, draws, and filters exactly.
    "x70_sample_negatives" -> ((s, dir) =>
      CorpusOps
        .sampleNegatives(T(s, dir, "documents"), col("doc_id"), col("lang"), k = 8)
        .orderBy(col("doc_id"), col("draw"))),

    // Audio-style per-frame features over the media byte plane (native
    // integer-accumulating PcmFrames kernel — exact, order-free doubles).
    "x71_audio_frames" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(s, T(s, dir, "documents")).toDF()
      Multimodal
        .audioFrames(media, frameSize = 8)
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Energy-gated audio segmentation with planted silence runs (16
    // spaces spliced in at char 64): the frame features are bit-exact
    // integer sums, so the gate — and the whole segmentation — replays
    // exactly in any engine no matter how close a frame is to τ.
    "x72_audio_segments" -> ((s, dir) => {
      val planted = T(s, dir, "documents").select(
        col("doc_id"),
        concat(
          substring(col("text"), 1, 64),
          lit("                "),
          substring(col("text"), 65, 1000000)
        ).as("text"),
        col("source")
      )
      val media = Multimodal.fromDocuments(s, planted).toDF()
      Multimodal
        .audioSegments(media, frameSize = 8, silenceRms = 80.0)
        .orderBy(col("doc_id"), col("seg_idx"))
    }),

    // Incremental near-dup gate: batch = fresh odd docs + twins of even
    // (reference) docs with the first token dropped (J = 37/38 ≈ 0.97 —
    // LSH recall 1−1e-11 at 16 bands × 2 rows, so the candidate set is
    // deterministically total and the oracle can replay the EXACT
    // Jaccard join).
    "x73_incremental_fuzzy" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = docs.filter(col("doc_id") % 2 === 0)
      val twins = ref.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 2, 1000000)).as("text")
      )
      val batch = docs.filter(col("doc_id") % 2 === 1).unionByName(twins)
      Dedup
        .incrementalFuzzy(
          batch,
          col("text"),
          col("doc_id"),
          ref,
          col("text"),
          col("doc_id"),
          n = 3,
          numHashes = 32,
          bands = 16,
          threshold = 0.6
        )
        .orderBy(col("id"))
    }),

    // Compression-ratio gate: deflate lengths are zlib-deterministic but
    // not engine-portable, so the check is planted SEPARATION — every
    // repetitive twin (one token × 40) must compress below 0.2 while
    // every natural doc sits above it; the oracle pins layout + TRUEs.
    "x74_compression_gate" -> ((s, dir) => {
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val repetitive = docs
        .filter(col("doc_id") % 10 === 0)
        .select(
          (col("doc_id") + 3000000L).as("doc_id"),
          concat_ws(" ", array_repeat(element_at(split(col("text"), " "), 1), 40)).as("text")
        )
      val corpus = docs.unionByName(repetitive)
        .select(col("doc_id"), TextOps.compressionRatio(col("text")).as("ratio"))
      corpus
        .agg(
          count(lit(1)).as("n_docs"),
          sum((col("doc_id") >= 3000000L).cast("long")).as("n_planted"),
          max(when(col("doc_id") >= 3000000L, col("ratio"))).as("__maxp"),
          min(when(col("doc_id") < 3000000L, col("ratio"))).as("__minn")
        )
        .select(
          col("n_docs"),
          col("n_planted"),
          (col("__maxp") < 0.2 && col("__minn") > 0.2).as("separation_ok")
        )
    }),

    // HTML extraction: documents wrapped in a template with script/style
    // blocks (whose bodies contain '<' and '&&'), tags, and entities —
    // the RE2-safe chain must strip blocks wholesale, then tags, then
    // decode entities one level.
    "x75_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>t</title><style>p { color: red }</style>" +
          "<script type=\"text/javascript\">if (x < 2 && y > 1) { alert(\"hi\"); }</script>" +
          "</head><body><h1>Doc</h1><p>"),
        col("text"),
        lit("</p><div class=\"footer\">copy &amp; paste &lt;ok&gt;&nbsp;&#39;end&#39;</div></body></html>")
      )
      T(s, dir, "documents")
        .select(col("doc_id"), TextOps.htmlExtract(html).as("extracted"))
        .select(
          col("doc_id"),
          length(col("extracted")).as("n_chars"),
          md5(col("extracted")).as("fp")
        )
        .orderBy(col("doc_id"))
    }),

    // JSONL ingestion with corrupt-line accounting: lines built as
    // IDENTICAL bytes on both engines (text has no quotes/backslashes —
    // verified), every 10th truncated by 10 chars (always lands inside
    // the trailing "lang" tail, so both parsers agree it is invalid).
    "x76_jsonl_ingest" -> ((s, dir) => {
      val line = concat(
        lit("{\"doc_id\":"), col("doc_id"),
        lit(",\"text\":\""), col("text"),
        lit("\",\"lang\":\""), col("lang"), lit("\"}")
      )
      // build in two steps so the truncation references the SAME line
      val built = T(s, dir, "documents")
        .select(col("doc_id").as("line_id"), line.as("l"))
        .select(
          col("line_id"),
          when(col("line_id") % 10 === 3, expr("substring(l, 1, length(l) - 10)"))
            .otherwise(col("l")).as("line")
        )
      CorpusOps
        .jsonlIngest(built, col("line_id"), col("line"))
        .select(
          col("line_id"),
          col("doc_id"),
          md5(coalesce(col("text"), lit(""))).as("text_fp"),
          col("lang"),
          col("is_corrupt")
        )
        .orderBy(col("line_id"))
    }),

    // Winnowing fingerprints (MOSS): per-window minimal k-gram digest,
    // leftmost on ties — the guarantee-bearing ~2/(w+1)-density
    // fingerprint subset; digests are engine-exact MD5 and binary
    // comparison is unsigned-lexicographic in both engines.
    "x77_winnow" -> ((s, dir) =>
      CorpusOps
        .winnowFingerprints(T(s, dir, "documents"), col("text"), col("doc_id"), k = 4, w = 4)
        .orderBy(col("doc_id"), col("pos"))),

    // Blocklist phrase gate (C4 "bad-words" shape): one longest-first
    // alternation regex, case-insensitive whole-word matches; the pattern
    // STRING is identical on both engines (no JVM-only \Q…\E), so counts
    // and first-match agree by leftmost-first semantics.
    "x78_blocklist" -> ((s, dir) =>
      TextOps
        .blocklistGate(
          T(s, dir, "documents"),
          col("doc_id"),
          col("text"),
          Seq("table scan", "hash join", "slow query", "scan merge", "vector")
        )
        .orderBy(col("doc_id"))),

    // Multi-source catalog merge: three overlapping catalogs built from
    // the documents table (books/code re-publish slices of web's texts
    // under new ids); priority = list order, winners carry provenance.
    "x79_catalog_merge" -> ((s, dir) => {
      val base = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val catA = base.filter(col("doc_id") % 3 === 0)
      val catB = base
        .filter(col("doc_id") % 3 === 1)
        .unionByName(
          base
            .filter(col("doc_id") % 6 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        )
      val catC = base
        .filter(col("doc_id") % 3 === 2)
        .unionByName(
          base
            .filter(col("doc_id") % 6 === 1)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        )
      CorpusOps
        .mergeCatalogs(Seq("web" -> catA, "books" -> catB, "code" -> catC), "doc_id", "text")
        .orderBy(col("fp"), col("doc_id"))
    }),

    // URL canonicalization + key-level keep-best dedup: scheme/host case,
    // default ports, www., fragments, and tracking params (utm_*/fbclid)
    // all planted in-query; winners keep the longest document (n_chars),
    // ties to the smallest id; registrable domain read back off the
    // canonical key (site%40.co.uk → 3-label eTLD+1).
    "x80_url_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val url = concat(
        lit("HTTPS://WWW.Site"),
        (col("doc_id") % 40).cast("string"),
        lit(".CO.UK"),
        when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/p/"),
        (col("doc_id") % 200).cast("string"),
        when(
          col("doc_id") % 2 === 0,
          concat(
            lit("?utm_source=feed&utm_campaign=c"),
            (col("doc_id") % 5).cast("string"),
            lit("&ref="),
            (col("doc_id") % 3).cast("string")
          )
        ).otherwise(
          concat(
            lit("?id="),
            (col("doc_id") % 7).cast("string"),
            lit("&fbclid=f"),
            col("doc_id").cast("string")
          )
        ),
        when(col("doc_id") % 3 === 0, lit("#frag")).otherwise(lit(""))
      )
      val normed = docs.select(col("doc_id"), url.as("url"), col("n_chars"))
      Dedup
        .keepBestByKey(normed, TextOps.urlNormalize(col("url")), col("n_chars"), col("doc_id"))
        .withColumn(
          "domain",
          TextOps.registrableDomain(regexp_extract(col("key"), "^[a-z0-9+.-]*://([^/?]*)", 1))
        )
        .orderBy(col("doc_id"))
    }),

    // Encoding-corruption audit: mojibake markers planted on ≡0 mod 13,
    // a BEL control byte on ≡5 mod 13; the ASCII corpus guarantees zero
    // natural hits, so corrupt == planted exactly.
    "x81_encoding_quality" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val corrupted = when(
        col("doc_id") % 13 === 0,
        concat(
          substring(col("text"), 1, 20),
          lit(" Ã©vÃ©nement â€™ Â "),
          substring(col("text"), 21, 1000000)
        )
      ).when(
          col("doc_id") % 13 === 5,
          concat(substring(col("text"), 1, 10), lit("\u0007"), substring(col("text"), 11, 1000000))
        )
        .otherwise(col("text"))
      TextOps
        .encodingQuality(
          docs.select(col("doc_id"), corrupted.as("text")),
          col("doc_id"),
          col("text")
        )
        .orderBy(col("doc_id"))
    }),

    // Tokenizer-fit audit: vocabulary = the deterministic md5-half of the
    // corpus's distinct tokens (no count-tie boundary), so OOV ≈ 50% and
    // the join exercises both hit and miss paths on every document.
    "x82_vocab_coverage" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val vocab = docs
        .select(explode(split(col("text"), " ")).as("token"))
        .distinct()
        .filter(substring(md5(col("token")), 1, 1) < "8")
      CorpusOps
        .vocabCoverage(docs, col("doc_id"), col("text"), vocab)
        .orderBy(col("doc_id"))
    }),

    // Nearest-centroid topic assignment over planted label structure
    // (+0.5 on component label%64): centroids via the 6dp-rounded mean
    // pool (engine-exact inputs → deterministic argmax), assignment is a
    // zero-shuffle literal-centroid cosine argmax; planted accuracy 100%.
    "x83_topic_assign" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        transform(
          col("embedding"),
          (x, i) => when(i === col("label"), x.cast("double") + 0.5).otherwise(x.cast("double"))
        ).as("v")
      )
      val cents = Similarity.trainTopicCentroids(emb, col("label"), col("v"))
      Similarity
        .topicAssign(emb, col("vec_id"), col("v"), cents)
        .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
        .select(
          col("vec_id"),
          col("label"),
          col("topic"),
          (col("topic") === col("label")).as("is_correct"),
          col("best_cos"),
          col("margin")
        )
        .orderBy(col("vec_id"))
    }),

    // HTML head metadata: title (whitespace-collapsed), canonical URL on
    // ≡0 mod 4, robots-noindex on ≡0 mod 5 — the crawl-selection signals
    // beside x75's body extraction.
    "x84_html_meta" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>  Doc "),
        col("doc_id"),
        lit(" ::\n  "),
        substring(col("text"), 1, 15),
        lit("</title>"),
        when(
          col("doc_id") % 4 === 0,
          concat(lit("<link rel=\"canonical\" href=\"https://canon.example/d/"), col("doc_id"), lit("\"/>"))
        ).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("<meta name=\"robots\" content=\"noindex, nofollow\"/>"))
          .otherwise(lit("")),
        lit("</head><body><p>"),
        col("text"),
        lit("</p></body></html>")
      )
      TextOps
        .htmlMeta(
          T(s, dir, "documents").select(col("doc_id"), html.as("html")),
          col("doc_id"),
          col("html")
        )
        .orderBy(col("doc_id"))
    }),

    // Cross-modal alignment gate (CLIP-score shape): the "image" embedding
    // is a perturbed copy (cos ≈ 0.9999 — aligned) except every 5th row,
    // which takes the NEXT row's embedding (a caption mismatch — random
    // cosine, far below the gate).
    "x85_cross_modal" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("t_emb"))
      val img = T(s, dir, "embeddings")
        .select(col("vec_id"), perturb(transform(col("embedding"), _.cast("double"))).as("i_emb"))
      val shifted = img.select((col("vec_id") - 1).as("vec_id"), col("i_emb").as("i_emb2"))
      val paired = emb
        .join(img, Seq("vec_id"))
        .join(shifted, Seq("vec_id"), "left")
        .select(
          col("vec_id"),
          col("t_emb"),
          when(col("vec_id") % 5 === 0 && col("i_emb2").isNotNull, col("i_emb2"))
            .otherwise(col("i_emb"))
            .as("i_emb")
        )
      Similarity
        .alignmentGate(paired, col("vec_id"), col("t_emb"), col("i_emb"), threshold = 0.95)
        .orderBy(col("pair_id"))
    }),

    // Incremental SEMANTIC ingest gate: batch = perturbed twins of the
    // accepted corpus (must be dropped, dup_of = their source) + fresh
    // vectors (must be kept); the oracle replays the exact batch×ref
    // cosine join the LSH candidates feed.
    "x86_incremental_semantic" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val ref = emb.filter(col("vec_id") % 2 === 0)
      val twins = ref
        .filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"), perturb(col("v")).as("v"))
      val batch = twins.unionByName(emb.filter(col("vec_id") % 10 === 1))
      Similarity
        .incrementalSemantic(batch, col("vec_id"), col("v"), ref, col("vec_id"), col("v"))
        .orderBy(col("id"))
    }),

    // Curriculum round-robin: tiers from document length, md5 order within
    // tier, interleaved train_order — no per-tier window anywhere.
    "x87_curriculum" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val tier = least(floor(col("n_chars") / 150), lit(3)).cast("int")
      CorpusOps
        .curriculumOrder(docs.select(col("doc_id"), tier.as("tier")), col("doc_id"), col("tier"), nTiers = 4)
        .orderBy(col("doc_id"))
    }),

    // Per-source dataset card: the release-notes summary row (token/char
    // totals, language spread, exact dup rate).
    "x88_dataset_card" -> ((s, dir) =>
      CorpusOps
        .datasetCard(T(s, dir, "documents"), col("source"), col("doc_id"), col("text"), col("lang"))
        .orderBy(col("source"))),

    // Recall@k metric math on a constructed result/truth pair set:
    // queries ≡0 mod 5; truth = offsets 1..3, results = ranks 1..5 with a
    // +2 offset shift planted on ≡0 mod 3 queries (recall drops to 1/3).
    "x89_recall_at_k" -> ((s, dir) => {
      val qs = T(s, dir, "documents").filter(col("doc_id") % 5 === 0).select(col("doc_id").as("q"))
      val truth = qs
        .select(col("q"), explode(sequence(lit(1), lit(3))).as("j"))
        .select(col("q"), (col("q") * 7 + col("j") * 13).as("n"))
      val results = qs
        .select(col("q"), explode(sequence(lit(1), lit(5))).as("rank"))
        .select(
          col("q"),
          (col("q") * 7 +
            (col("rank") + when(col("q") % 3 === 0, 2).otherwise(0)) * 13).as("n"),
          col("rank")
        )
      Similarity
        .recallAtK(results, col("q"), col("n"), col("rank"), truth, col("q"), col("n"), k = 4)
        .orderBy(col("query_id"))
    }),

    // Cross-split leakage audit: planted near-dup pairs (id, id+1) vs the
    // id-hash split — adjacent ids hash independently, so pairs straddle
    // splits and the audit must count exactly how many.
    "x90_leakage_audit" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val pairs = docs
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
      Audit
        .splitLeakage(
          pairs,
          col("a"),
          col("b"),
          CorpusOps.hashSplit(docs, col("doc_id")),
          col("doc_id"),
          col("split")
        )
        .orderBy(col("split_a"), col("split_b"))
    }),

    // Classifier reliability table over a deterministic uniform score and
    // an arithmetic label — the binning/average math cross-checked.
    "x91_calibration_bins" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Audit
        .calibrationBins(
          docs.select(
            col("doc_id"),
            CorpusOps.hashUniform(col("doc_id")).as("score"),
            (col("doc_id") % 3 === 0).as("label")
          ),
          col("score"),
          col("label"),
          bins = 10
        )
        .orderBy(col("bin"))
    }),

    // Code-corpus gate: ≡0 mod 9 becomes a minified kilometer-line (must
    // fail max_line_len), ≡1 mod 9 carries the auto-generated marker
    // (must fail autogen), ≡2 mod 9 becomes well-shaped multi-line code
    // (must pass); everything else is a single sub-800-char line (passes).
    "x92_code_gate" -> ((s, dir) => {
      val shaped = when(col("doc_id") % 9 === 0, repeat(replace(col("text"), lit(" "), lit("")), 30))
        .when(col("doc_id") % 9 === 1, concat(lit("// auto-generated do not edit\n"), col("text")))
        .when(col("doc_id") % 9 === 2, replace(col("text"), lit(" "), lit("\n")))
        .otherwise(col("text"))
      TextOps
        .codeQualityGate(
          T(s, dir, "documents").select(col("doc_id"), shaped.as("text")),
          col("doc_id"),
          col("text")
        )
        .orderBy(col("doc_id"))
    }),

    // Intra-doc line dedup: ≡0 mod 7 gets its 40-char prefix planted as a
    // duplicated line around the body — exactly one line must drop.
    "x93_intradoc_dedup" -> ((s, dir) => {
      val l1 = substring(col("text"), 1, 40)
      val shaped = when(
        col("doc_id") % 7 === 0,
        concat(l1, lit("\n"), col("text"), lit("\n"), l1)
      ).otherwise(col("text"))
      CorpusOps
        .dedupLinesWithin(
          T(s, dir, "documents").select(col("doc_id"), shaped.as("text")),
          col("doc_id"),
          col("text")
        )
        .orderBy(col("doc_id"))
    }),

    // Chunk → reassemble round trip (overlap = 0 is invertible): the
    // reassembled document must digest-match the original, with the
    // arithmetic chunk count.
    "x94_chunk_roundtrip" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val chunks = CorpusOps.chunkTokens(docs, col("doc_id"), col("text"), chunkSize = 32)
      CorpusOps
        .reassembleChunks(chunks, col("doc_id"), col("chunk_idx"), col("chunk"))
        .join(docs.select(col("doc_id"), md5(col("text")).as("__want")), Seq("doc_id"))
        .select(
          col("doc_id"),
          col("n_chunks"),
          (md5(col("text")) === col("__want")).as("roundtrip_ok")
        )
        .orderBy(col("doc_id"))
    }),

    // Middle-out token truncation to a 24-token context budget: long
    // docs keep 12-head + 12-tail, short docs pass through untouched,
    // and the drop mass is visible in the accounting columns.
    "x95_truncate" -> ((s, dir) =>
      CorpusOps
        .truncateTokens(T(s, dir, "documents"), col("doc_id"), col("text"), maxTokens = 24)
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("kept_tokens"),
          col("truncated"),
          md5(col("text")).as("fp")
        )
        .orderBy(col("doc_id"))),

    // WARC-lite archive ingest: 5 records per blob assembled in-query,
    // blobs ≡0 mod 7 truncated by 5 trailing bytes — the final record
    // must parse invalid (null fields) without poisoning the others.
    "x96_warc_ingest" -> ((s, dir) => {
      val record = concat(
        lit("WARC/1.0\nWARC-Target-URI: https://ex.com/"),
        col("doc_id"),
        lit("\nContent-Length: "),
        octet_length(col("text")),
        lit("\n\n"),
        col("text"),
        lit("\n\n")
      )
      val blobs = T(s, dir, "documents")
        .select(floor(col("doc_id") / 5).cast("long").as("g"), col("doc_id"), record.as("rec"))
        .groupBy(col("g"))
        .agg(
          array_join(
            transform(array_sort(collect_list(struct(col("doc_id"), col("rec")))), e => e.getField("rec")),
            ""
          ).as("blob")
        )
        .select(
          col("g"),
          when(col("g") % 7 === 0, expr("substring(blob, 1, length(blob) - 5)"))
            .otherwise(col("blob"))
            .as("blob")
        )
      CorpusOps
        .warcIngest(blobs, col("g"), col("blob"))
        .select(
          col("blob_id"),
          col("rec_idx"),
          col("uri"),
          md5(coalesce(col("payload"), lit(""))).as("fp"),
          col("is_valid")
        )
        .orderBy(col("blob_id"), col("rec_idx"))
    }),

    // Link-graph construction from HTML: two deterministic internal
    // anchors per page ((2s+1)%n, (3s+2)%n), a duplicated anchor for
    // ≡0 mod 3 (occurrence counting), an external link for ≡0 mod 5
    // (host-filtered out). Extraction is one RE2-safe regex scan.
    "x97_link_graph" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("__n"))
      val d = docs.crossJoin(broadcast(n))
      val d1 = (col("doc_id") * 2 + 1) % col("__n")
      val d2 = (col("doc_id") * 3 + 2) % col("__n")
      val html = concat(
        lit("<html><body><a href=\"https://ex.com/"), d1, lit("\">one</a>"),
        when(
          col("doc_id") % 3 === 0,
          concat(lit("<a href=\"https://ex.com/"), d1, lit("\">again</a>"))
        ).otherwise(lit("")),
        lit("<a href=\"https://ex.com/"), d2, lit("\">two</a>"),
        when(col("doc_id") % 5 === 0, lit("<a href=\"https://other.site/page\">ext</a>"))
          .otherwise(lit("")),
        lit("<p>"), col("text"), lit("</p></body></html>")
      )
      GraphOps
        .htmlLinks(d.select(col("doc_id"), html.as("html")), col("doc_id"), col("html"))
        .where(col("href").startsWith("https://ex.com/"))
        .select(
          col("src"),
          regexp_extract(col("href"), "https://ex.com/([0-9]+)", 1).cast("long").as("dst")
        )
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).cast("int").as("n_occurrences"))
        .orderBy(col("src"), col("dst"))
    }),

    // PageRank quality prior over the deterministic 3-outlink graph
    // (self-loops dropped): 3 synchronous iterations at d=0.85, every
    // arithmetic step replayed double-exact by the oracle CTE chain.
    "x98_pagerank" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("__n"))
      val d = docs.select(col("doc_id")).crossJoin(broadcast(n))
      val edges = Seq((2, 1), (3, 2), (4, 3))
        .map { case (a, b) =>
          d.select(col("doc_id").as("src"), ((col("doc_id") * a + b) % col("__n")).as("dst"))
        }
        .reduce(_ unionAll _)
        .where(col("src") =!= col("dst"))
      GraphOps
        .pageRank(edges, iters = 3, damping = 0.85)
        .select(col("id"), round(col("pr"), 9).as("pr"))
        .orderBy(col("id"))
    }),

    // Exact edit-distance similarity join (PassJoin partition scheme) on
    // 80-char prefixes at k=4: docs ≡0 mod 10 get a planted twin with a
    // 3-char substitution at positions 11-13 — the twin pairs MUST all
    // surface with their exact distance, and the oracle brute-forces the
    // same universe, so any natural sub-k pair must surface too.
    "x99_editdist_pairs" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val base = docs.select(col("doc_id").as("id"), substring(col("text"), 1, 80).as("s"))
      val twins = docs
        .where(col("doc_id") % 10 === 0)
        .select(
          (col("doc_id") + 10000000L).as("id"),
          concat(
            substring(col("text"), 1, 10),
            lit("QZX"),
            substring(col("text"), 14, 67)
          ).as("s")
        )
      EditDistance
        .editDistancePairs(base.unionAll(twins), col("id"), col("s"), k = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Embedding second-moment (gram) matrix — the whitening/PCA prep
    // pass: upper triangle only, map-side partial agg, components widened
    // to double before multiply so the oracle replays bit-comparable
    // sums (6dp round absorbs ordering).
    "x100_gram_matrix" -> ((s, dir) =>
      Spectral
        .gramMatrix(T(s, dir, "embeddings"), col("embedding"))
        .select(col("i"), col("j"), col("n_vecs"), round(col("g"), 6).as("g"))
        .orderBy(col("i"), col("j"))),

    // robots.txt fetch gate: per-domain robots blobs built in-query
    // (star group: Disallow /private, Allow /private/ok, Disallow /tmp;
    // domains ≡0 mod 3 add a graftbot-specific group that then applies
    // EXCLUSIVELY per the RFC), six URL classes per doc_id mod 6. The
    // oracle constructs the expected decision from the grammar.
    "x101_robots_gate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val dnum = regexp_extract(col("domain"), "src([0-9]+)", 1).cast("int")
      val robots = docs
        .select(col("source").as("domain"))
        .distinct()
        .select(
          col("domain"),
          concat(
            lit("# synthetic robots\r\nUser-agent: *\nCrawl-delay: 5\nDisallow: /private\nallow: /private/ok\nDisallow: /tmp\n\nSitemap: https://x/sitemap.xml\n"),
            when(
              dnum % 3 === 0,
              lit("User-agent: graftbot\nDisallow: /graft-only\nAllow: /graft-only/open\n")
            ).otherwise(lit(""))
          ).as("robots_txt")
        )
      val urls = docs.select(
        col("doc_id").as("url_id"),
        col("source").as("domain"),
        concat(
          when(col("doc_id") % 6 === 0, lit("/private/ok/p"))
            .when(col("doc_id") % 6 === 1, lit("/private/z"))
            .when(col("doc_id") % 6 === 2, lit("/pub/x"))
            .when(col("doc_id") % 6 === 3, lit("/graft-only/open/a"))
            .when(col("doc_id") % 6 === 4, lit("/graft-only/z"))
            .otherwise(lit("/tmp/t")),
          col("doc_id")
        ).as("path")
      )
      Robots
        .fetchGate(
          urls, col("url_id"), col("domain"), col("path"),
          robots, col("domain"), col("robots_txt"),
          agent = "GraftBot"
        )
        .orderBy(col("url_id"))
    }),

    // CSV ingest with corrupt accounting: docs ≡0 mod 3 get an embedded
    // quote+comma planted in the text (the RFC 4180 quoting path), docs
    // ≡3 mod 10 get a type-mismatched n_chars ('12x34') — those flag
    // corrupt but KEEP their well-formed fields (the pinned PERMISSIVE
    // CSV contract, unlike JSON's null-row behavior).
    "x102_csv_ingest" -> ((s, dir) => {
      val shaped = when(col("doc_id") % 3 === 0, concat(lit("q\"c, "), col("text")))
        .otherwise(col("text"))
      val line = concat(
        col("doc_id"), lit(","),
        lit("\""), regexp_replace(shaped, "\"", "\"\""), lit("\""), lit(","),
        col("lang"), lit(","),
        when(col("doc_id") % 10 === 3, lit("12x34")).otherwise(col("n_chars").cast("string"))
      )
      CorpusOps
        .csvIngest(
          T(s, dir, "documents").select(col("doc_id").as("lid"), line.as("l")),
          col("lid"),
          col("l")
        )
        .select(
          col("line_id"),
          col("doc_id"),
          md5(coalesce(col("text"), lit(""))).as("text_fp"),
          col("lang"),
          col("n_chars"),
          col("is_corrupt")
        )
        .orderBy(col("line_id"))
    }),

    // Per-target anchor-text aggregation (the link-text relevance signal):
    // inbound anchor count, distinct-source count, and the sorted distinct
    // anchor sample per dst — distinct-then-sort two-level agg so no
    // unbounded list rides a single partition.
    "x103_anchor_text" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("__n"))
      val d = docs.crossJoin(broadcast(n))
      val d1 = (col("doc_id") * 2 + 1) % col("__n")
      val d2 = (col("doc_id") * 3 + 2) % col("__n")
      val html = concat(
        lit("<html><body><a href=\"https://ex.com/"), d1, lit("\">go "), d1, lit("</a>"),
        when(
          col("doc_id") % 3 === 0,
          concat(lit("<a href=\"https://ex.com/"), d1, lit("\">again</a>"))
        ).otherwise(lit("")),
        lit("<a href=\"https://ex.com/"), d2, lit("\">see "), d2, lit("</a>"),
        lit("<p>"), col("text"), lit("</p></body></html>")
      )
      val a = GraphOps
        .anchors(d.select(col("doc_id"), html.as("html")), col("doc_id"), col("html"))
        .where(col("href").startsWith("https://ex.com/"))
        .select(
          regexp_extract(col("href"), "https://ex.com/([0-9]+)", 1).cast("long").as("dst"),
          col("src"),
          col("anchor")
        )
      val stats = a
        .groupBy(col("dst"))
        .agg(count(lit(1)).as("n_anchors"), count_distinct(col("src")).as("n_sources"))
      val terms = a
        .select(col("dst"), col("anchor"))
        .distinct()
        .groupBy(col("dst"))
        .agg(
          array_join(slice(array_sort(collect_list(col("anchor"))), 1, 100), "|")
            .as("anchors_sample")
        )
      stats.join(terms, "dst").orderBy(col("dst"))
    }),

    // Per-domain template stripping: every doc gets a domain header line
    // (df 100% → boiler), ≡0 mod 2 a semi-common line (50% ≥ 30% →
    // boiler), ≡0 mod 10 a rare line (10% < 30% → kept). Integer
    // threshold arithmetic; text reconstructed by indexed-lambda filter.
    "x104_domain_boilerplate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val shaped = concat(
        lit("HDR "), col("source"), lit("\n"),
        when(col("doc_id") % 2 === 0, concat(lit("SEMI "), col("source"), lit("\n")))
          .otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 10 === 0, concat(lit("\nRARE "), col("doc_id")))
          .otherwise(lit(""))
      )
      CorpusOps
        .domainBoilerplate(
          docs.select(col("doc_id"), col("source"), shaped.as("t")),
          col("doc_id"),
          col("source"),
          col("t")
        )
        .select(
          col("doc_id"),
          col("n_lines"),
          col("n_boiler"),
          md5(col("text_clean")).as("clean_fp")
        )
        .orderBy(col("doc_id"))
    }),

    // Margin-based bitext mining: X = even vec_ids, Y = odd vec_ids plus
    // planted perturbed twins of X (≡0 mod 10) — twins must pair with
    // their source at high ratio margin and mutual-NN; the raw-cosine
    // hubness false positives fall to the margin normalization.
    "x105_bitext_mine" -> ((s, dir) => {
      val e = Tf(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val xs = e.where(col("vec_id") % 2 === 0)
      val twins = xs
        .where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"), perturb(col("v")).as("v"))
      val ys = e.where(col("vec_id") % 2 === 1).unionAll(twins)
      Similarity
        .bitextMine(xs, ys, col("vec_id"), col("v"), col("vec_id"), col("v"))
        .orderBy(col("x_id"))
    }),

    // HITS hubs/authorities over the same 3-outlink graph as x98, two
    // synchronous iterations with L1 normalization per half-step — node
    // 499 (outlinks all self-loop) must land hub 0 with nonzero auth.
    "x106_hits" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("__n"))
      val d = docs.select(col("doc_id")).crossJoin(broadcast(n))
      val edges = Seq((2, 1), (3, 2), (4, 3))
        .map { case (a, b) =>
          d.select(col("doc_id").as("src"), ((col("doc_id") * a + b) % col("__n")).as("dst"))
        }
        .reduce(_ unionAll _)
        .where(col("src") =!= col("dst"))
      GraphOps
        .hits(edges, iters = 2)
        .select(col("id"), round(col("hub"), 9).as("hub"), round(col("auth"), 9).as("auth"))
        .orderBy(col("id"))
    }),

    // Link-graph release audit over the HTML-extracted graph (dup
    // anchors kept raw, external links filtered, self-loops kept):
    // per-bucket raw/distinct/self/reciprocal/max-out-degree counts.
    "x107_link_audit" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("__n"))
      val d = docs.crossJoin(broadcast(n))
      val d1 = (col("doc_id") * 2 + 1) % col("__n")
      val d2 = (col("doc_id") * 3 + 2) % col("__n")
      val html = concat(
        lit("<html><body><a href=\"https://ex.com/"), d1, lit("\">one</a>"),
        when(
          col("doc_id") % 3 === 0,
          concat(lit("<a href=\"https://ex.com/"), d1, lit("\">again</a>"))
        ).otherwise(lit("")),
        lit("<a href=\"https://ex.com/"), d2, lit("\">two</a>"),
        when(col("doc_id") % 5 === 0, lit("<a href=\"https://other.site/page\">ext</a>"))
          .otherwise(lit("")),
        lit("<p>"), col("text"), lit("</p></body></html>")
      )
      val edges = GraphOps
        .htmlLinks(d.select(col("doc_id"), html.as("html")), col("doc_id"), col("html"))
        .where(col("href").startsWith("https://ex.com/"))
        .select(
          col("src"),
          regexp_extract(col("href"), "https://ex.com/([0-9]+)", 1).cast("long").as("dst")
        )
      GraphOps
        .linkAudit(edges, pmod(col("src"), lit(10)))
        .orderBy(col("bucket"))
    }),

    // Redirect-chain resolution: descending one-hop chains toward each
    // multiple of 4, with planted 2-cycles at ids ≡1/≡2 mod 100 — chains
    // that touch a cycle member must flag unresolved (null target), the
    // rest land on their terminal in ⌈log₂⌉ doubling rounds.
    "x108_redirects" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val c = col("doc_id") % 100
      val redirects = docs
        .where(c.isin(1, 2) || col("doc_id") % 4 =!= 0)
        .select(
          col("doc_id").as("src"),
          when(c === 1, col("doc_id") + 1).otherwise(col("doc_id") - 1).as("dst")
        )
      GraphOps
        .resolveRedirects(redirects, maxSteps = 8)
        .orderBy(col("src"))
    }),

    // Forward-fill telemetry gaps: 'error' rows lose their reading and
    // must inherit the user's most recent non-null value (rows before
    // any reading stay null) — LOCF per entity in (ts, event_id) order.
    "x109_gap_fill" -> ((s, dir) => {
      val masked = T(s, dir, "events").withColumn(
        "v",
        when(col("event_type") === "error", lit(null).cast("double")).otherwise(col("value"))
      )
      graft.operators.AsOfJoin
        .gapFill(masked, "user_id", "ts", "event_id", "v")
        .select(col("event_id"), col("user_id"), col("v_filled"), col("was_filled"))
        .orderBy(col("event_id"))
    }),

    // Gazetteer tagging: the dictionary is 3-token spans lifted from
    // every 37th doc (guaranteed hits, possibly in other docs too) plus
    // a never-matching phrase — anchor-then-verify, span equality on the
    // doc's own token array.
    "x110_gazetteer" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val fromCorpus = docs
        .where(col("doc_id") % 37 === 0 && col("doc_id") < 370)
        .select(
          array_join(slice(split(col("text"), " "), 2, 3), " ").as("phrase"),
          concat(lit("L"), col("doc_id")).as("label")
        )
      val phrases = fromCorpus.unionAll(
        docs.limit(1).select(lit("zzzz qqqq vvvv").as("phrase"), lit("MISS").as("label"))
      )
      TextOps
        .gazetteerTag(docs, col("doc_id"), col("text"), phrases, col("phrase"), col("label"))
        .orderBy(col("doc_id"), col("pos"), col("label"))
    }),

    // Markdown extraction: fenced code dropped (and counted), inline
    // code and links unwrapped, headers stripped, whitespace collapsed.
    "x111_markdown_extract" -> ((s, dir) => {
      val md = concat(
        lit("# Title "), col("doc_id"), lit("\n\nSee [doc "), col("doc_id"),
        lit("](https://ex.com/"), col("doc_id"), lit(") for *context*.\n\n```\ncode "),
        col("doc_id"), lit("\nmore code\n```\n\n## Sub\n\n"), col("text"),
        lit(" with `inline_code` end")
      )
      TextOps
        .markdownExtract(
          T(s, dir, "documents").select(col("doc_id"), md.as("md")),
          col("doc_id"),
          col("md")
        )
        .select(
          col("doc_id"),
          col("n_code_blocks"),
          col("n_links"),
          length(col("extracted")).as("n_chars"),
          md5(col("extracted")).as("fp")
        )
        .orderBy(col("doc_id"))
    }),

    // Web-curation capstone composite — the new families chained the way
    // a crawl pipeline runs them: robots gate (x101 grammar) decides the
    // fetchable subset, per-domain template stripping (x104) runs ON
    // that subset (frequencies over what was actually fetched), and the
    // PageRank prior (x98 graph) joins on as the quality feature.
    "x112_web_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      // 1. robots decision (same construction as x101)
      val dnum = regexp_extract(col("domain"), "src([0-9]+)", 1).cast("int")
      val robots = docs
        .select(col("source").as("domain"))
        .distinct()
        .select(
          col("domain"),
          concat(
            lit("User-agent: *\nDisallow: /private\nAllow: /private/ok\nDisallow: /tmp\n"),
            when(
              dnum % 3 === 0,
              lit("User-agent: graftbot\nDisallow: /graft-only\nAllow: /graft-only/open\n")
            ).otherwise(lit(""))
          ).as("robots_txt")
        )
      val urls = docs.select(
        col("doc_id").as("url_id"),
        col("source").as("domain"),
        concat(
          when(col("doc_id") % 6 === 0, lit("/private/ok/p"))
            .when(col("doc_id") % 6 === 1, lit("/private/z"))
            .when(col("doc_id") % 6 === 2, lit("/pub/x"))
            .when(col("doc_id") % 6 === 3, lit("/graft-only/open/a"))
            .when(col("doc_id") % 6 === 4, lit("/graft-only/z"))
            .otherwise(lit("/tmp/t")),
          col("doc_id")
        ).as("path")
      )
      val fetchable = Robots
        .fetchGate(urls, col("url_id"), col("domain"), col("path"), robots, col("domain"), col("robots_txt"), "GraftBot")
        .where(col("allowed"))
        .select(col("url_id").as("doc_id"))
      // 2. template strip over the FETCHED subset (x104 shaping)
      val shaped = docs
        .join(fetchable, "doc_id")
        .select(
          col("doc_id"),
          col("source"),
          concat(
            lit("HDR "), col("source"), lit("\n"),
            when(col("doc_id") % 2 === 0, concat(lit("SEMI "), col("source"), lit("\n")))
              .otherwise(lit("")),
            col("text"),
            when(col("doc_id") % 10 === 0, concat(lit("\nRARE "), col("doc_id")))
              .otherwise(lit(""))
          ).as("t")
        )
      // pin the gated+shaped frame: domainBoilerplate re-derives its input
      // in four branches (line explode x2, doc-count agg, final join), and
      // unpinned each branch re-ran the whole robots fetchGate subtree —
      // the plan carried 25 parquet scans of `documents` (see
      // plans/r16/x112_web_pipeline_before.txt). One materialized pass is
      // the guide §8 discipline: decide on the heavy frame once.
      val stripped = CorpusOps
        .domainBoilerplate(
          shaped.transform(graft.runtime.GraftCheckpoint.pin),
          col("doc_id"), col("source"), col("t"))
      // 3. pagerank prior over the x98 link graph (global, pre-gate)
      val n = docs.agg(count(lit(1)).as("__n"))
      val d = docs.select(col("doc_id")).crossJoin(broadcast(n))
      val edges = Seq((2, 1), (3, 2), (4, 3))
        .map { case (a, b) =>
          d.select(col("doc_id").as("src"), ((col("doc_id") * a + b) % col("__n")).as("dst"))
        }
        .reduce(_ unionAll _)
        .where(col("src") =!= col("dst"))
      val pr = GraphOps
        .pageRank(edges, iters = 3)
        .select(col("id").as("doc_id"), round(col("pr"), 9).as("pr"))
      stripped
        .join(pr, "doc_id")
        .select(
          col("doc_id"),
          col("n_lines"),
          col("n_boiler"),
          md5(col("text_clean")).as("clean_fp"),
          col("pr")
        )
        .orderBy(col("doc_id"))
    }),

    // Tokenizer fertility per language — the bytes/chars-per-token table
    // that drives mixture and tokenizer decisions; exact integer sums,
    // one division at the edge.
    "x113_token_fertility" -> ((s, dir) =>
      T(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
          sum(octet_length(col("text"))).cast("long").as("n_bytes"),
          round(
            sum(octet_length(col("text"))).cast("double") /
              sum(size(split(col("text"), " "))).cast("double"),
            6
          ).as("bytes_per_token")
        )
        .orderBy(col("lang"))),

    // Curation funnel report: raw → exact dedup (min-id survivor) →
    // case-fold dedup → decontaminate vs the ≡0 mod 97 eval slice →
    // length gate; one row per stage with exact in/out/dropped counts.
    "x114_curation_funnel" -> ((s, dir) => {
      val s0 = T(s, dir, "documents").select(col("doc_id"), col("text"), col("n_chars"))
      def survivors(df: DataFrame, key: Column): DataFrame =
        df.groupBy(key.as("__k"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
          .join(df, "doc_id")
      val s1 = survivors(s0, md5(col("text")))
      val s2 = survivors(s1, md5(lower(col("text"))))
      val ev = s0.where(col("doc_id") % 97 === 0).select(md5(col("text")).as("__efp")).distinct()
      val s3 = s2.join(ev, md5(col("text")) === col("__efp"), "left_anti")
      val s4 = s3.where(col("n_chars") >= 100)
      def cnt(df: DataFrame, idx: Int, stage: String): DataFrame =
        df.agg(count(lit(1)).as("n_out"))
          .select(lit(idx).as("stage_idx"), lit(stage).as("stage"), col("n_out"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("stage_idx"))
      cnt(s0, 0, "raw")
        .unionAll(cnt(s1, 1, "exact_dedup"))
        .unionAll(cnt(s2, 2, "case_dedup"))
        .unionAll(cnt(s3, 3, "decontaminate"))
        .unionAll(cnt(s4, 4, "length_gate"))
        .withColumn("n_in", lag(col("n_out"), 1).over(w))
        .withColumn("dropped", col("n_in") - col("n_out"))
        .select(col("stage_idx"), col("stage"), col("n_in"), col("n_out"), col("dropped"))
        .orderBy(col("stage_idx"))
    }),

    // Politeness schedule: per-domain Crawl-delay from the applicable
    // robots group (graftbot groups declare 7 s, star groups 1+(dnum%4));
    // the k-th URL of a domain fetches at slot (k-1)·delay.
    "x115_crawl_schedule" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val dnum = regexp_extract(col("domain"), "src([0-9]+)", 1).cast("int")
      val robots = docs
        .select(col("source").as("domain"))
        .distinct()
        .select(
          col("domain"),
          concat(
            lit("User-agent: *\nDisallow: /private\nCrawl-delay: "),
            (dnum % 4 + 1),
            lit("\n"),
            when(
              dnum % 3 === 0,
              lit("\nUser-agent: graftbot\nDisallow: /graft-only\nCrawl-delay: 7\n")
            ).otherwise(lit(""))
          ).as("robots_txt")
        )
      Robots
        .politenessSchedule(
          docs.select(col("doc_id"), col("source")),
          col("doc_id"),
          col("source"),
          robots,
          col("domain"),
          col("robots_txt"),
          agent = "GraftBot"
        )
        .orderBy(col("url_id"))
    }),

    // Sentence segmentation stats on shaped multi-sentence docs (a
    // terminator-less tail planted on ≡0 mod 4 clears has_terminal and
    // counts as one truncated sentence).
    "x116_sentences" -> ((s, dir) => {
      val shaped = concat(
        coalesce(col("text"), lit("")), lit(". Second sentence here! Third one?"),
        when(col("doc_id") % 4 === 0, lit(" trailing fragment")).otherwise(lit(""))
      )
      TextOps
        .sentenceStats(
          T(s, dir, "documents").select(col("doc_id"), shaped.as("t")),
          col("t")
        )
        .select(
          col("doc_id"),
          col("n_sentences"),
          col("mean_sentence_tokens"),
          col("max_sentence_chars"),
          col("has_terminal")
        )
        .orderBy(col("doc_id"))
    }),

    // Formatting-noise stats: ≡0 mod 5 docs are upper-cased (shouty),
    // ≡0 mod 3 get two bullet lines; translate-delete counting.
    "x117_format_stats" -> ((s, dir) => {
      val t0 = coalesce(col("text"), lit(""))
      val shaped = concat(
        when(col("doc_id") % 5 === 0, upper(t0)).otherwise(t0),
        when(col("doc_id") % 3 === 0, lit("\n- bullet one\n* bullet two")).otherwise(lit(""))
      )
      TextOps
        .formatStats(
          T(s, dir, "documents").select(col("doc_id"), shaped.as("t")),
          col("t")
        )
        .select(
          col("doc_id"),
          col("upper_ratio"),
          col("digit_ratio"),
          col("bullet_frac"),
          col("is_shouty")
        )
        .orderBy(col("doc_id"))
    }),

    // Per-eval contamination report: quotes of ≡0 mod 7 docs (12-token
    // excerpts) are the eval set; every eval doc aggregates its corpus
    // hits (n_hits, max containment) and eval docs with no hit report
    // clean — the release-gate view over x58's pair surface.
    "x118_contamination_report" -> ((s, dir) => {
      val docs =
        T(s, dir, "documents").select(col("doc_id"), col("text")).filter(col("doc_id") < 300)
      val evals = docs
        .filter(col("doc_id") % 7 === 0)
        .select(
          (col("doc_id") + 5000000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 5, 12)).as("text")
        )
      val pairs = Dedup
        .ngramContainmentPairs(docs.unionByName(evals), col("text"), col("doc_id"), n = 3, threshold = 0.9)
        // eval side contained in a CORPUS doc only — an eval-vs-eval pair
        // (two excerpts sharing shingles) is not corpus contamination
        .where(col("id_a") >= 5000000L && col("id_b") < 5000000L)
      evals
        .select(col("doc_id").as("eval_id"))
        .join(
          pairs
            .groupBy(col("id_a"))
            .agg(count(lit(1)).as("n_hits"), max(col("containment")).as("max_containment")),
          col("eval_id") === col("id_a"),
          "left"
        )
        .select(
          col("eval_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          col("max_containment"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated")
        )
        .orderBy(col("eval_id"))
    }),

    // Flesch readability over the x116 sentence shaping (multi-sentence
    // guaranteed, grades span the scale via the synthetic token mix).
    "x119_readability" -> ((s, dir) => {
      val shaped =
        concat(coalesce(col("text"), lit("")), lit(". Second sentence here! Third one?"))
      TextOps
        .readability(
          T(s, dir, "documents").select(col("doc_id"), shaped.as("t")),
          col("t")
        )
        .select(
          col("doc_id"),
          col("n_words"),
          col("n_syllables"),
          col("n_sentences"),
          col("flesch"),
          col("reading_grade")
        )
        .orderBy(col("doc_id"))
    }),

    // Dialogue detection: ≡0 mod 6 docs become two-speaker chat logs
    // (every line a turn), ≡1 mod 6 get ONE speaker-shaped line (not a
    // dialogue — single speaker), the rest stay prose.
    "x120_dialogue" -> ((s, dir) => {
      val t0 = coalesce(col("text"), lit(""))
      val toks = split(t0, " ")
      val shaped = when(
        col("doc_id") % 6 === 0,
        concat(
          lit("Alice: "), concat_ws(" ", slice(toks, 1, 5)),
          lit("\nBob: "), concat_ws(" ", slice(toks, 6, 5)),
          lit("\nAlice: "), concat_ws(" ", slice(toks, 11, 5))
        )
      ).when(
          col("doc_id") % 6 === 1,
          concat(lit("Narrator: "), t0)
        )
        .otherwise(t0)
      TextOps
        .dialogueStats(
          T(s, dir, "documents").select(col("doc_id"), shaped.as("t")),
          col("t")
        )
        .select(
          col("doc_id"),
          col("n_lines"),
          col("n_turns"),
          col("n_speakers"),
          col("is_dialogue")
        )
        .orderBy(col("doc_id"))
    }),

    // Mixed-language detection: per-LINE langid re-aggregated per doc —
    // code-switching docs (≡0 mod 5 get a planted German line, ≡0 mod 7
    // a French one) need the translation pipeline, not the monolingual
    // one. One explode + one doc-keyed partial agg.
    "x121_mixed_lang" -> ((s, dir) => {
      val shaped = concat(
        coalesce(col("text"), lit("")),
        when(col("doc_id") % 5 === 0, lit("\nder die und der die und")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("\nle les des le les des")).otherwise(lit(""))
      )
      T(s, dir, "documents")
        .select(col("doc_id"), explode(split(shaped, "\n")).as("line"))
        .select(col("doc_id"), TextOps.langId(col("line")).as("lp"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).cast("int").as("n_lines"),
          collect_set(when(col("lp") =!= "und", col("lp"))).as("__ls")
        )
        .select(
          col("doc_id"),
          col("n_lines"),
          size(col("__ls")).as("n_langs"),
          array_join(array_sort(col("__ls")), "|").as("langs"),
          (size(col("__ls")) >= 2).as("is_mixed")
        )
        .orderBy(col("doc_id"))
    }),

    // Homoglyph audit: ≡0 mod 9 docs get a Latin word with a Cyrillic
    // 'о' spliced in plus a pure-Cyrillic word (NOT mixed — only the
    // splice counts); detection is per-token script-class co-occurrence.
    "x122_homoglyphs" -> ((s, dir) => {
      val shaped = concat(
        coalesce(col("text"), lit("")),
        when(col("doc_id") % 9 === 0, lit(" fакe слово")).otherwise(lit(""))
      )
      TextOps
        .mixedScriptStats(
          T(s, dir, "documents").select(col("doc_id"), shaped.as("t")),
          col("t")
        )
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("n_mixed_script"),
          col("mixed_frac"),
          col("has_homoglyphs")
        )
        .orderBy(col("doc_id"))
    }),

    // Embedding release card (x88's sibling for the vector side): per
    // label — row/null counts, dim, and the norm distribution
    // (mean/p50/p99/min/max over 6dp-rounded norms, so the percentile
    // interpolation runs on bit-identical inputs in both engines).
    // Nulls planted on ≡0 mod 97 must be COUNTED and excluded from
    // stats, never dropped silently.
    "x123_embedding_card" -> ((s, dir) => {
      val e = T(s, dir, "embeddings").select(
        col("label"),
        when(col("vec_id") % 97 === 0, lit(null)).otherwise(col("embedding")).as("v")
      )
      val vd = transform(col("v"), _.cast("double"))
      val nrm = round(sqrt(graft.functions.vector.dot(vd, vd)), 6)
      e.withColumn("nrm", when(col("v").isNotNull, nrm))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          sum(col("v").isNull.cast("long")).as("n_null"),
          max(size(col("v"))).as("dim"),
          round(avg(col("nrm")), 6).as("mean_norm"),
          round(percentile(col("nrm"), lit(0.5)), 6).as("p50_norm"),
          round(percentile(col("nrm"), lit(0.99)), 6).as("p99_norm"),
          round(min(col("nrm")), 6).as("min_norm"),
          round(max(col("nrm")), 6).as("max_norm")
        )
        .orderBy(col("label"))
    }),

    // Crawl-budget allocation across domains (largest-remainder method):
    // 10k fetches divided by URL share — pure integer arithmetic, so
    // Σ alloc == budget is an identity both engines must reproduce.
    "x124_crawl_budget" -> ((s, dir) =>
      Robots
        .crawlBudget(
          T(s, dir, "documents").select(col("source")),
          col("source"),
          budget = 10000L
        )
        .orderBy(col("domain"))),

    // ---- Round-9 SFT / post-training family (x125-x132) ----

    // Chat-transcript structure audit: transcripts built in-query from doc
    // tokens (see [[chatTranscript]]); parse + stats are zero-shuffle
    // in-row array work (ChatOps scaladoc), with orphan/continuation/
    // repeat/empty-turn classes planted on disjoint residue classes.
    "x125_chat_parse" -> ((s, dir) => {
      val built = T(s, dir, "documents").select(col("doc_id"), chatTranscript.as("t"))
      ChatOps
        .chatStats(ChatOps.parseTranscript(built, col("doc_id"), col("t")))
        .select(
          col("doc_id"),
          col("n_lines").cast("long").as("n_lines"),
          col("n_orphan_lines").cast("long").as("n_orphan_lines"),
          col("n_turns").cast("long").as("n_turns"),
          col("n_system").cast("long").as("n_system"),
          col("n_user").cast("long").as("n_user"),
          col("n_assistant").cast("long").as("n_assistant"),
          col("n_empty_turns").cast("long").as("n_empty_turns"),
          col("n_role_repeats").cast("long").as("n_role_repeats"),
          col("starts_system"),
          col("ends_assistant"),
          col("fp")
        )
        .orderBy(col("doc_id"))
    }),

    // SFT loss-mask accounting rolled up per language: assistant tokens
    // are the only supervised tokens; per-doc loss_frac rounds 6dp BEFORE
    // the average so both engines aggregate bit-identical inputs (the
    // x123 discipline).
    "x126_loss_mass" -> ((s, dir) => {
      val built = T(s, dir, "documents")
        .select(col("doc_id"), col("lang"), chatTranscript.as("t"))
      ChatOps
        .lossMass(
          ChatOps.parseTranscript(built, col("doc_id"), col("t"), keep = Seq(col("lang")))
        )
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("total_tokens").cast("long")).as("sum_total_tokens"),
          sum(col("loss_tokens").cast("long")).as("sum_loss_tokens"),
          round(avg(col("loss_frac")), 6).as("mean_loss_frac"),
          sum((col("loss_frac") < 0.2).cast("long")).as("n_low_signal")
        )
        .orderBy(col("lang"))
    }),

    // Preference-pair construction over the events stream: per prompt
    // group (user), chosen/rejected = score argmax/argmin via min/max
    // struct ordering (deterministic tie-breaks), strict-margin gate —
    // one partial-aggregating exchange, never a per-prompt window.
    "x127_preference_pairs" -> ((s, dir) =>
      ChatOps
        .preferencePairs(
          T(s, dir, "events"),
          col("user_id"),
          col("event_id"),
          col("value")
        )
        .orderBy(col("prompt_id"))),

    // Bradley-Terry strength fit (arena-style ranking): comparisons are
    // consecutive events of one user — higher value wins, value ties to
    // the lexicographically smaller type; 5 MM iterations with
    // virtual-opponent regularization. The oracle replays all five
    // iterations as unrolled CTEs.
    "x128_bradley_terry" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("event_id"))
      val lagd = T(s, dir, "events").select(
        col("event_type").as("cur_t"),
        col("value").as("cur_v"),
        lag(col("event_type"), 1).over(w).as("prev_t"),
        lag(col("value"), 1).over(w).as("prev_v")
      )
      val prevWins = col("prev_v") > col("cur_v") ||
        (col("prev_v") === col("cur_v") && col("prev_t") < col("cur_t"))
      val comps = lagd
        .filter(col("prev_t").isNotNull && col("prev_t") =!= col("cur_t"))
        .select(
          when(prevWins, col("prev_t")).otherwise(col("cur_t")).as("winner"),
          when(prevWins, col("cur_t")).otherwise(col("prev_t")).as("loser")
        )
      ChatOps.bradleyTerry(comps, iters = 5).orderBy(col("rank"))
    }),

    // Hybrid retrieval: BM25 (x44's exact setting, k=10) and brute-force
    // cosine (x9's, k=10) fused by reciprocal-rank fusion; fusion itself
    // runs on the two queries-x-k ranked lists (model-sized) while the
    // corpus-side retrievers keep their audited plans.
    "x129_hybrid_rrf" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val qs = docs
        .filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), slice(split(col("text"), " "), 1, 3).as("terms"))
      val bm = CorpusOps
        .bm25TopK(docs, col("doc_id"), col("text"), qs, col("qid"), col("terms"), k = 10)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val cos = Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") < 3), "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      Similarity
        .rrfFuse(Seq(bm, cos), kConst = 60, topK = 5)
        .select(
          col("query_id"),
          col("id"),
          col("rrf"),
          col("n_lists"),
          col("best_rank"),
          col("fused_rank")
        )
        .orderBy(col("query_id"), col("fused_rank"))
    }),

    // Structural (alpha-renamed) code dedup: code built in-query from doc
    // tokens; identifiers canonicalize to first-occurrence ranks so
    // naming-variant twins (same structure, same trailing literal)
    // collapse onto one digest — the code-corpus sibling of x46.
    "x130_code_dedup" -> ((s, dir) => {
      val tk = split(col("text"), " ")
      val code = concat_ws(
        " ",
        lit("def"), element_at(tk, 1),
        lit("("), element_at(tk, 2), lit(","), element_at(tk, 3), lit(")"),
        lit(":"), lit("return"),
        element_at(tk, 2), lit("*"), element_at(tk, 3),
        lit("+"), (col("doc_id") % 4).cast("string")
      )
      TextOps
        .alphaRename(
          T(s, dir, "documents").select(col("doc_id"), code.as("code")),
          col("doc_id"),
          col("code")
        )
        .groupBy(col("fp"))
        .agg(
          min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"),
          min(col("n_idents")).cast("long").as("n_idents")
        )
        .orderBy(col("fp"))
    }),

    // Snapshot drift report (PSI) per language: snapshot B = odd doc ids,
    // with a planted +120-char shift for 'en' only — exactly that group
    // must cross the 0.1 drift flag while untouched groups replay near 0.
    "x131_drift_report" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(
        col("lang"),
        (col("doc_id") % 2 === 1).as("in_b"),
        (col("n_chars") +
          when(col("doc_id") % 2 === 1 && col("lang") === "en", 120).otherwise(0))
          .cast("double")
          .as("v")
      )
      Audit
        .driftReport(d, col("lang"), col("in_b"), col("v"), binWidth = 100.0, nBins = 8)
        .orderBy(col("grp"))
    }),

    // Interpolated Kneser-Ney bigram LM (top-20 bigrams): exact integer
    // count tables off one corpus pass; the single double formula rounds
    // 6dp; top-k is TakeOrdered on (count desc, w1, w2).
    "x132_kn_bigram" -> ((s, dir) =>
      TextOps.knBigram(T(s, dir, "documents"), col("text"), discount = 0.75, topK = 20)),

    // PRODUCTION bitext path (x105 is its exact calibration twin): banded
    // sign-signature candidate generation → candidates-restricted margin
    // pipeline. Axis-sign bands (2 bands × 8 dims) keep the equality-join
    // blocking shape of the LSH generator while replaying bit-exact in the
    // oracle; perturb preserves signs (multiplier 1±0.02 > 0), so every
    // planted twin shares its source's keys in BOTH bands — recall of the
    // planted pairs is exact by construction, not probabilistic.
    "x133_bitext_candidates" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val xs = e.where(col("vec_id") % 2 === 0)
      val twins = xs
        .where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"), perturb(col("v")).as("v"))
      val ys = e.where(col("vec_id") % 2 === 1).unionAll(twins)
      def bandKeys(vc: Column): Column =
        array((0 until 2).map { b =>
          struct(
            lit(b).as("band"),
            (0 until 8)
              .map(i => when(element_at(vc, b * 8 + i + 1) >= 0, lit(1L << i)).otherwise(lit(0L)))
              .reduce(_ + _)
              .as("key")
          )
        }: _*)
      val xb = xs
        .select(col("vec_id").as("x_id"), explode(bandKeys(col("v"))).as("bk"))
        .select(col("x_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val yb = ys
        .select(col("vec_id").as("y_id"), explode(bandKeys(col("v"))).as("bk"))
        .select(col("y_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = xb.join(yb, Seq("band", "key")).select(col("x_id"), col("y_id"))
      Similarity
        .bitextMineCandidates(xs, ys, col("vec_id"), col("v"), col("vec_id"), col("v"), cand)
        .orderBy(col("x_id"))
    }),

    // Rejection sampling over the events stream (prompt = user, candidate
    // = event, reward = value): top-2 per prompt above the 0.5 gate, with
    // per-prompt scored/below/null accounting — the WindowGroupLimit
    // map-side top-N shape.
    "x134_rejection_sample" -> ((s, dir) =>
      ChatOps
        .rejectionSample(
          T(s, dir, "events"),
          col("user_id"),
          col("event_id"),
          col("value"),
          minScore = 0.5,
          topN = 2
        )
        .orderBy(col("prompt_id"), col("rank"))),

    // Fill-in-the-middle transform (code-model data prep): deterministic
    // md5-uniform mode/cut selection, PSM/SPM rearrangement, plain
    // passthrough below minChars — all in-row, zero shuffle.
    "x135_fim_transform" -> ((s, dir) =>
      TextOps
        .fimTransform(T(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))),

    // Multi-category lexicon scoring over documents: three categories
    // (incl. a non-word-edge phrase), per-category hits + density per
    // 100 words, any-category threshold verdict — one zero-shuffle
    // projection.
    "x136_lexicon_categories" -> ((s, dir) =>
      TextOps
        .lexiconCategories(
          T(s, dir, "documents"),
          col("doc_id"),
          col("text"),
          Map(
            "db" -> Seq("table scan", "hash join", "vector"),
            "net" -> Seq("socket", "packet loss", "tcp/ip"),
            "perf" -> Seq("slow query", "latency")
          ),
          maxHitsPer100Words = 1.0
        )
        .orderBy(col("doc_id"))),

    // Pairwise win-rate matrix over x128's comparison stream: one row per
    // unordered item pair (total comparisons, wins of the lexicographically
    // smaller item, 6dp win rate) — the arena heatmap companion of the
    // Bradley-Terry fit, ONE partial-aggregating exchange over pair keys.
    "x137_win_matrix" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("event_id"))
      val lagd = T(s, dir, "events").select(
        col("event_type").as("cur_t"),
        col("value").as("cur_v"),
        lag(col("event_type"), 1).over(w).as("prev_t"),
        lag(col("value"), 1).over(w).as("prev_v")
      )
      val prevWins = col("prev_v") > col("cur_v") ||
        (col("prev_v") === col("cur_v") && col("prev_t") < col("cur_t"))
      val comps = lagd
        .filter(col("prev_t").isNotNull && col("prev_t") =!= col("cur_t"))
        .select(
          when(prevWins, col("prev_t")).otherwise(col("cur_t")).as("winner"),
          when(prevWins, col("cur_t")).otherwise(col("prev_t")).as("loser")
        )
      ChatOps.winMatrix(comps).orderBy(col("item_a"), col("item_b"))
    }),

    // Best-of-n curve (rejection-sampling diagnostic): candidates per
    // prompt in arrival order; the running max after k candidates is the
    // best-of-k outcome, reported at k ∈ {1,2,4,8,16} — one window pass,
    // then a k-sized aggregate.
    "x138_bestofn_curve" -> ((s, dir) =>
      ChatOps
        .bestOfN(
          T(s, dir, "events"),
          col("user_id"),
          col("event_id"),
          col("value"),
          ks = Seq(1, 2, 4, 8, 16)
        )
        .orderBy(col("k"))),

    // Conversation-tree flattening (OpenAssistant message-forest shape):
    // a binary forest synthesized from doc ids (blocks of 300, heap
    // parents), flattened root-to-node by pointer doubling; depth-8 nodes
    // (i >= 255 in every full block) exceed maxDepth=7 and are flagged,
    // never walked or dropped.
    "x139_chat_tree" -> ((s, dir) => {
      val i = col("doc_id") % 300
      val nodes = T(s, dir, "documents").select(
        col("doc_id").as("id"),
        when(i === 0, lit(null).cast("long"))
          .otherwise(col("doc_id") - i + floor((i - 1) / 2).cast("long"))
          .as("parent")
      )
      ChatOps.flattenTree(nodes, maxDepth = 7).orderBy(col("id"))
    }),

    // Group-relative advantage normalization (GRPO reward shape) over the
    // events stream: prompt = user, candidate = event, reward = value;
    // advantages derive from the 6dp-rounded group moments.
    "x140_grpo_advantage" -> ((s, dir) =>
      ChatOps
        .groupAdvantage(T(s, dir, "events"), col("user_id"), col("event_id"), col("value"))
        .orderBy(col("prompt_id"), col("cand_id"))),

    // T5-style span corruption over documents: two sentinel-masked spans
    // (one per half, md5-uniform offsets), (input, targets) pair per doc —
    // in-row substring arithmetic, zero shuffle.
    "x141_span_corruption" -> ((s, dir) =>
      TextOps
        .spanCorrupt(T(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))),

    // Inter-annotator agreement (Cohen's kappa) per event type: two
    // deterministic raters derived from value (floor-based, never
    // truncation-cast — the cross-engine double→int trap); kappa from
    // UNROUNDED po/pe, both pure integer-count ratios.
    "x142_cohen_kappa" -> ((s, dir) =>
      Audit
        .cohenKappa(
          T(s, dir, "events"),
          col("event_type"),
          floor(col("value")) % 4,
          floor(col("value") * 1.5) % 4
        )
        .orderBy(col("grp"))),

    // Per-node triangle counts + clustering coefficient over the x97-shape
    // synthetic link graph (degree-ordered edge-iterator inside the
    // operator; the oracle replays the id-ordered equivalent — identical
    // result, orientation is a performance choice, not a semantic one).
    "x143_triangles" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("__n"))
      val d = docs.crossJoin(broadcast(n))
      val e1 = d.select(col("doc_id").as("src"), ((col("doc_id") * 2 + 1) % col("__n")).as("dst"))
      val e2 = d.select(col("doc_id").as("src"), ((col("doc_id") * 3 + 2) % col("__n")).as("dst"))
      GraphOps.triangleStats(e1.unionAll(e2)).orderBy(col("node_id"))
    }),

    // Ordered funnel over the events stream (signup → click → purchase,
    // first-touch semantics): k filtered per-user min-aggregates chained
    // by user-keyed joins — per-user event lists never materialize.
    "x144_event_funnel" -> ((s, dir) =>
      EventOps
        .funnel(
          T(s, dir, "events"),
          col("user_id"),
          col("ts"),
          col("event_type"),
          Seq("signup", "click", "purchase")
        )
        .orderBy(col("step"))),

    // Weekly cohort retention: first-event-week cohorts × active-week
    // offsets; activity collapses to (user, week) rows before any join.
    // The cohort week renders as yyyy-MM-dd — timestamp OUTPUT columns are
    // driver-hash-unsafe (Spark parquet tz-aware vs DuckDB naive).
    "x145_retention" -> ((s, dir) =>
      EventOps
        .retentionCohorts(T(s, dir, "events"), col("user_id"), col("ts"))
        .withColumn("cohort_week", date_format(col("cohort_week"), "yyyy-MM-dd"))
        .orderBy(col("cohort_week"), col("week_offset"))),

    // Jaro-Winkler record linkage over 24-char title keys, blocked on
    // (lang, 6-char prefix); planted twins transpose chars 7-8 and drop
    // char 9 — inside the key, outside the block prefix. The JW kernel
    // is bit-matched against DuckDB's jaro_winkler_similarity
    // (EditDistanceSpec fixtures), so the oracle replays values exactly.
    "x146_jaro_winkler" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      def blk(t: Column): Column = concat(col("lang"), lit("|"), substring(t, 1, 6))
      val base = docs.select(
        col("doc_id").as("id"),
        blk(col("text")).as("b"),
        substring(col("text"), 1, 24).as("s")
      )
      val twins = docs
        .where(col("doc_id") % 8 === 0)
        .select(
          (col("doc_id") + 10000000L).as("id"),
          blk(col("text")).as("b"),
          concat(
            substring(col("text"), 1, 6),
            substring(col("text"), 8, 1),
            substring(col("text"), 7, 1),
            substring(col("text"), 10, 15)
          ).as("s")
        )
      EditDistance
        .jaroWinklerPairs(base.unionAll(twins), col("id"), col("s"), col("b"), 0.9)
        .orderBy(col("block"), col("id_a"), col("id_b"))
    }),

    // XLM-R temperature rebalancing (α=0.3, budget = half the corpus):
    // per-language accounting of the deterministic md5-draw keeps.
    "x147_lang_temperature" -> ((s, dir) =>
      CorpusOps
        .langTemperature(T(s, dir, "documents"), col("doc_id"), col("lang"), 0.3, 0.5)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("keep").cast("long")).as("n_kept")
        )
        .withColumn("kept_share", round(col("n_kept").cast("double") / col("n_docs"), 6))
        .orderBy(col("lang"))),

    // Per-source percent-rank normalization of the char-length score —
    // the cross-domain calibration transform (PERCENT_RANK semantics:
    // strictly-below / (n-1), ties share).
    "x148_quantile_normalize" -> ((s, dir) =>
      CorpusOps
        .quantileNormalize(
          T(s, dir, "documents"),
          col("doc_id"),
          length(col("text")),
          col("source")
        )
        .orderBy(col("doc_id"))),

    // ROUGE-2 between each document's first-half and second-half tokens
    // (the self-instruct near-dup filter kernel): clipped bigram overlap,
    // precision/recall/F1.
    "x149_rouge_n" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val h = ceil(size(toks).cast("double") / 2).cast("int")
      TextOps
        .rougeN(
          T(s, dir, "documents").select(
            col("doc_id"),
            concat_ws(" ", slice(toks, lit(1), h)).as("cand"),
            concat_ws(" ", slice(toks, h + 1, size(toks) - h)).as("ref")
          ),
          col("doc_id"),
          col("cand"),
          col("ref"),
          n = 2
        )
        .orderBy(col("pair_id"))
    }),

    // Chat-template token leakage audit over planted control sequences
    // (mod-4 template classes + a mod-10 <|endoftext|> tail); the
    // never-planted probe must still emit its zero row — absence is
    // evidenced, not inferred.
    "x150_template_leakage" -> ((s, dir) => {
      val planted = concat(
        col("text"),
        when(col("doc_id") % 4 === 0, lit(" <|im_start|>assistant says hi"))
          .when(col("doc_id") % 4 === 1, lit(" [INST] do the thing [/INST]"))
          .when(col("doc_id") % 4 === 2, lit(" ### Instruction: respond"))
          .otherwise(lit("")),
        when(col("doc_id") % 10 === 0, lit(" <|endoftext|>")).otherwise(lit(""))
      )
      TextOps
        .specialTokenScan(
          T(s, dir, "documents").select(planted.as("t")),
          col("t"),
          Seq("<|im_start|>", "<|endoftext|>", "[INST]", "### Instruction:", "<|assistant|>")
        )
        .orderBy(col("token"))
    }),

    // k-anonymity audit (k=5) over the (lang, source, length-bucket)
    // quasi-identifier tuple: class-size bands with row accounting.
    "x151_k_anonymity" -> ((s, dir) =>
      Audit
        .kAnonymity(
          T(s, dir, "documents"),
          Seq(col("lang"), col("source"), floor(length(col("text")) / 50).cast("int")),
          k = 5
        )
        .orderBy(col("band"))),

    // GAE advantage table (Schulman 2016 §3) over synthetic trajectories
    // (4..8 steps per doc, dyadic rewards/values in 64ths, γ=λ=0.5 so
    // γλ=0.25 is dyadic): EVERY arithmetic step is exact in binary
    // doubles, so the suffix-sum formulation replays bit-equal in any
    // engine — the rounding is cosmetic.
    "x153_gae" -> ((s, dir) => {
      val steps = T(s, dir, "documents").select(
        col("doc_id").as("traj"),
        explode(sequence(lit(0), (col("doc_id") % 5 + 3).cast("int"))).as("step")
      )
      val traj = steps.select(
        col("traj"),
        col("step"),
        ((pmod(col("traj") * 7 + col("step") * 13, lit(64)) - 32) / 64.0).as("r"),
        (pmod(col("traj") * 11 + col("step") * 17, lit(64)) / 64.0).as("v")
      )
      ChatOps
        .gaeAdvantage(traj, col("traj"), col("step"), col("r"), col("v"), gamma = 0.5, lam = 0.5)
        .orderBy(col("traj_id"), col("step"))
    }),

    // Schulman k1/k2/k3 KL estimators per prompt over dyadic per-token
    // log-probs (16 tokens/prompt, eighths): k1/k2/mean exact; k3's exp
    // term is per-token 6dp-pre-rounded inside the operator.
    "x154_kl_estimate" -> ((s, dir) => {
      val toks = T(s, dir, "documents").select(
        col("doc_id").as("prompt"),
        explode(sequence(lit(0), lit(15))).as("t")
      )
      val lp = toks.select(
        col("prompt"),
        (-(pmod(col("prompt") * 3 + col("t") * 5, lit(8)) + 1) / 8.0).as("logp"),
        (-(pmod(col("prompt") * 5 + col("t") * 3, lit(8)) + 1) / 8.0).as("logq")
      )
      ChatOps.klEstimators(lp, col("prompt"), col("logp"), col("logq")).orderBy(col("prompt_id"))
    }),

    // WordPiece greedy longest-match segmentation (MaxMatch) with a
    // literal vocabulary ('q'/'x'/'z' singles intentionally absent —
    // they must surface as <unk>): per-doc piece count, unk count, and
    // the md5 fingerprint of the piece sequence. Segments the 64-char
    // key prefix: the oracle's step-chain recursion costs
    // iterations × positions, and 64 bounds the iteration count (the
    // engine kernel itself is O(len) and uncapped).
    "x155_wordpiece" -> ((s, dir) => {
      val seg =
        graft.functions.text.wordpiece_segment(substring(col("text"), 1, 64), WordpieceVocab)
      T(s, dir, "documents")
        .select(col("doc_id"), seg.as("__s"))
        .select(
          col("doc_id"),
          size(col("__s.pieces")).as("n_pieces"),
          col("__s.n_unk").as("n_unk"),
          md5(array_join(col("__s.pieces"), "\u0001")).as("fp")
        )
        .orderBy(col("doc_id"))
    }),

    // Entity-resolution composite: the x146 Jaro-Winkler linkage pairs
    // resolved into clusters (alternating-star CC) — the full
    // record-linkage pipeline (block → compare → cluster) in one query.
    "x156_linkage_clusters" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      def blk(t: Column): Column = concat(col("lang"), lit("|"), substring(t, 1, 6))
      val base = docs.select(
        col("doc_id").as("id"),
        blk(col("text")).as("b"),
        substring(col("text"), 1, 24).as("s")
      )
      val twins = docs
        .where(col("doc_id") % 8 === 0)
        .select(
          (col("doc_id") + 10000000L).as("id"),
          blk(col("text")).as("b"),
          concat(
            substring(col("text"), 1, 6),
            substring(col("text"), 8, 1),
            substring(col("text"), 7, 1),
            substring(col("text"), 10, 15)
          ).as("s")
        )
      val rows = base.unionAll(twins)
      val pairs = EditDistance
        .jaroWinklerPairs(rows, col("id"), col("s"), col("b"), 0.9)
        .select(col("id_a"), col("id_b"))
      ConnectedComponents
        .assignClusters(rows.select(col("id")), col("id"), pairs)
        .orderBy(col("doc_id"))
    }),

    // Unicode NFC hygiene audit over planted composed/decomposed accents:
    // per-lang counts of docs whose NFC form differs + code-unit shrink.
    "x157_nfc_audit" -> ((s, dir) => {
      val planted = concat(
        col("text"),
        when(col("doc_id") % 3 === 0, lit(" cafe\u0301")) // decomposed: e + U+0301
          .when(col("doc_id") % 3 === 1, lit(" caf\u00e9")) // composed: NFC no-op
          .otherwise(lit(""))
      )
      val st = graft.functions.text.nfc_stats(planted)
      T(s, dir, "documents")
        .select(col("lang"), st.as("__n"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__n.changed").cast("long")).as("n_changed"),
          sum((col("__n.len_before") - col("__n.len_after")).cast("long")).as("delta_units")
        )
        .orderBy(col("lang"))
    }),

    // CUPED variance-reduction accounting (Deng 2013): Y = token count
    // adjusted by the pre-period covariate X = char count, per source.
    "x158_cuped" -> ((s, dir) =>
      EventOps
        .cuped(
          T(s, dir, "documents"),
          col("source"),
          size(split(col("text"), " ")).cast("double"),
          length(col("text")).cast("double")
        )
        .orderBy(col("grp"))),

    // Luhn-validated card detection: planted 16-digit numbers whose check
    // digit only SOMETIMES satisfies Luhn (the kernel must actually
    // checksum, not pattern-match), a 20-digit run proving maximality
    // (no 19-digit prefix counted), and a short run as inert noise.
    "x159_luhn_audit" -> ((s, dir) => {
      val card = concat(
        lpad(pmod(col("doc_id") * 37, lit(1000000000000000L)).cast("string"), 15, "0"),
        pmod(col("doc_id"), lit(10)).cast("string")
      )
      val t2 = concat(
        col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" card "), card)).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" 12345678901234567890")).otherwise(lit("")),
        lit(" ref 12345")
      )
      val st = graft.functions.text.luhn_scan(t2)
      T(s, dir, "documents")
        .select(col("lang"), st.as("__l"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__l.n_digit_runs").cast("long")).as("n_digit_runs"),
          sum(col("__l.n_luhn_valid").cast("long")).as("n_luhn_valid")
        )
        .orderBy(col("lang"))
    }),

    // Aho-Corasick multi-phrase scan over phrases that occur NATURALLY in
    // the corpus, with nesting ("spar" inside "spark") and a two-word
    // phrase — per-lang totals of per-phrase non-overlapping counts.
    "x160_ac_scan" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(
          col("lang"),
          graft.functions.text.ac_count(col("text"), AcScanPhrases).as("__h")
        )
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__h")).as("n_hits"),
          sum(when(col("__h") > 0, 1L).otherwise(0L)).as("n_docs_hit")
        )
        .orderBy(col("lang"))),

    // Laplace count release (ε=1) per (lang, source) cell — group keys
    // as strings so the seeded-uniform replay is engine-identical.
    "x161_dp_counts" -> ((s, dir) =>
      Audit
        .dpCounts(
          T(s, dir, "documents").select(
            concat(col("lang"), lit("|"), col("source")).as("cell")
          ),
          col("cell"),
          epsilon = 1.0
        )
        .orderBy(col("grp"))),

    // MRR + nDCG@5 over synthetic ranked lists (qid = doc_id div 8,
    // rank = doc_id mod 8 + 1, binary relevance from a mod rule —
    // every metric component replays arithmetically).
    "x162_ranking_metrics" -> ((s, dir) =>
      CorpusOps
        .rankingMetrics(
          T(s, dir, "documents").select(
            (col("doc_id") / 8).cast("long").as("qid"),
            (col("doc_id") % 8 + 1).as("rank"),
            when((col("doc_id") * 7) % 3 === 0, 1).otherwise(0).as("rel")
          ),
          col("qid"),
          col("rank"),
          col("rel"),
          k = 5
        )
        .orderBy(col("query_id"))),

    // Salted skew-join + salted two-phase sum, driver-checkable: both
    // are SEMANTICS-IDENTICAL to the plain join/aggregate (the salt only
    // reshapes the exchange), so the oracle is the plain SQL. Quantity
    // is integer-valued double — sums are FP-exact under any grouping.
    "x163_salted_join" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_partkey").as("partkey"), col("l_quantity"))
      val pt = T(s, dir, "part").select(col("p_partkey").as("partkey"), col("p_brand"))
      graft.operators.Skew
        .saltedSum(
          graft.operators.Skew.saltedJoin(li, pt, "partkey", saltFactor = 8),
          col("p_brand"),
          col("l_quantity"),
          saltFactor = 8
        )
        .select(col("k").as("p_brand"), col("total").as("sum_qty"))
        .orderBy(col("p_brand"))
    }),

    // FORWARD as-of (next-observation join): each signup attaches the
    // EARLIEST purchase at or after it per user — the same native merge
    // operator as q19 run on negated time (left-join semantics: users
    // with no later purchase keep NULL).
    "x165_asof_forward" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val signups = ev
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_event"))
      graft.operators.AsOfJoin
        .asofForward(signups, purchases, "user_id", "ts")
        .select(col("event_id"), col("user_id"), col("purchase_event"))
        .orderBy(col("event_id"))
    }),

    // NEAREST as-of: each click attaches the closest error event (before
    // or after, per user; equidistant ties take the backward match —
    // pandas' rule). Two native merges + an id-keyed recombination.
    "x166_asof_nearest" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = ev
        .filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id").as("err_event"))
      graft.operators.AsOfJoin
        .asofNearest(clicks, errors, "user_id", "ts", "event_id")
        .select(col("event_id"), col("user_id"), col("err_event"))
        .orderBy(col("event_id"))
    }),

    // REAL image decode, driver-checkable: per sampled doc, render one
    // deterministic RGB plane, encode it as PNG and as BMP (JDK ImageIO
    // writers), decode both through the REAL decoder, and assert the
    // format-invariance contract — dims exact, decoded luma planes
    // byte-equal, classic 8×8 aHash identical. The booleans are the
    // oracle surface (DuckDB can't decode PNG, but it CAN pin what must
    // be true of a lossless round trip).
    "x167_image_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      ids
        .mapPartitions(_.map { id =>
          val w = 24 + (id % 17).toInt
          val h = 24 + (id % 13).toInt
          val png = Multimodal.syntheticImage(id, w, h, "png")
          val bmp = Multimodal.syntheticImage(id, w, h, "bmp")
          val dp = Multimodal.decodeImage(png).get
          val db = Multimodal.decodeImage(bmp).get
          val hashP = Multimodal.lumaAHash64(dp._4, dp._1, dp._2)
          val hashB = Multimodal.lumaAHash64(db._4, db._1, db._2)
          (
            id,
            dp._1 == w && dp._2 == h && db._1 == w && db._2 == h,
            java.util.Arrays.equals(dp._4, db._4),
            hashP == hashB
          )
        })
        .toDF("doc_id", "dims_ok", "luma_equal", "hash_equal")
        .orderBy(col("doc_id"))
    }),

    // REAL image resize through the operator: per sampled doc, encode the
    // deterministic plane as PNG and BMP, resize BOTH through
    // Multimodal.resizeImage (decode → 8×6 nearest-neighbor luma plane),
    // and check (a) output dims, (b) format invariance, (c) exact match
    // against the plane recomputed from the pixel FORMULA — an
    // expectation that never touches the encode/decode/resize path under
    // test. Booleans are the oracle surface.
    "x169_image_resize" -> ((s, dir) => {
      import s.implicits._
      val (dw, dh) = (8, 6)
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val w = 24 + (id % 17).toInt
        val h = 24 + (id % 13).toInt
        Seq(
          Multimodal.MediaRow(id * 2, "image/png", Multimodal.syntheticImage(id, w, h, "png")),
          Multimodal.MediaRow(id * 2 + 1, "image/bmp", Multimodal.syntheticImage(id, w, h, "bmp"))
        )
      }
      val resized = Multimodal.resizeImage(media, dw, dh)
      val png = resized
        .filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(
          (col("doc_id") / 2).cast("long").as("doc_id"),
          col("width"), col("height"), col("plane").as("p_png")
        )
      val bmp = resized
        .filter(pmod(col("doc_id"), lit(2)) === 1)
        .select(((col("doc_id") - 1) / 2).cast("long").as("id2"), col("plane").as("p_bmp"))
      val expected = ids
        .mapPartitions(_.map { id =>
          val w = 24 + (id % 17).toInt
          val h = 24 + (id % 13).toInt
          val out = new Array[Byte](dw * dh)
          var y = 0
          while (y < dh) {
            val sy = (y.toLong * h / dh).toInt
            var x = 0
            while (x < dw) {
              val sx = (x.toLong * w / dw).toInt
              out(y * dw + x) =
                Multimodal.bt601Luma(Multimodal.syntheticPixel(id, sx, sy)).toByte
              x += 1
            }
            y += 1
          }
          (id, out)
        })
        .toDF("id3", "p_exp")
      png
        .join(bmp, col("doc_id") === col("id2"))
        .join(expected, col("doc_id") === col("id3"))
        .select(
          col("doc_id"),
          (col("width") === dw && col("height") === dh).as("dims_ok"),
          (col("p_png") === col("p_bmp")).as("formats_equal"),
          (col("p_png") === col("p_exp")).as("matches_formula")
        )
        .orderBy(col("doc_id"))
    }),

    // CHUNKED as-of: q19's join through asofBackwardChunked — the
    // monster-key-safe path (time-epoch chunk appended to the merge key,
    // seed rows carry state across chunk boundaries). Same semantics as
    // the plain merge by construction, so the oracle is q19's DuckDB
    // ASOF verbatim (left-join form): the driver gate proves the chunk
    // machinery is invisible to results.
    "x168_asof_chunked" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val signups = ev
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_event"))
      graft.operators.AsOfJoin
        .asofBackwardChunked(purchases, signups, "user_id", "ts", nChunks = 32)
        .select(col("event_id"), col("user_id"), col("signup_event"))
        .orderBy(col("event_id"))
    }),

    // REAL WAV audio decode, driver-checkable: per sampled doc,
    // synthesize a RIFF/WAVE container (hand-rolled writer, PCM16 from
    // the sample formula), run it through the REAL javax.sound decode
    // path (audioFrames → decodeWav → signed-16-bit frame kernel), and
    // compare every frame's (rms, mean) against values recomputed from
    // the FORMULA alone — an expectation that never touches the WAV
    // container or the decoder. One row per frame with an equality
    // boolean as the oracle surface (DuckDB can't decode WAV, but it CAN
    // pin the frame grid and that every frame must match).
    "x170_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val fs = 16 // samples per frame
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids
        .map(id =>
          Multimodal.MediaRow(
            id,
            "audio/wav",
            Multimodal.syntheticWav(id, 128 + (id % 13).toInt * 16)
          )
        )
        .toDF()
      val frames = Multimodal.audioFrames(media, frameSize = fs)
      val expected = ids
        .mapPartitions(_.flatMap { id =>
          val n = 128 + (id % 13).toInt * 16
          (0 until n / fs).iterator.map { f =>
            var sm = 0L
            var sq = 0L
            var i = f * fs
            while (i < (f + 1) * fs) {
              val x = Multimodal.syntheticSample(id, i).toLong
              sm += x; sq += x * x; i += 1
            }
            def r6(x: Double) =
              BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            (id, f, r6(math.sqrt(sq.toDouble / fs)), r6(sm.toDouble / fs))
          }
        })
        .toDF("id2", "f2", "rms2", "mean2")
      frames
        .join(expected, col("doc_id") === col("id2") && col("frame_idx") === col("f2"), "full")
        .select(
          coalesce(col("doc_id"), col("id2")).as("doc_id"),
          coalesce(col("frame_idx"), col("f2")).cast("int").as("frame_idx"),
          (col("doc_id").isNotNull && col("id2").isNotNull &&
            col("rms") === col("rms2") && col("mean") === col("mean2")).as("frame_ok")
        )
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL video frame sampling, driver-checkable: per sampled doc,
    // synthesize a 4-frame animated GIF (indexed grayscale — lossless
    // round trip, decoded luma == the index plane), with docs where
    // doc_id % 40 == 0 carrying a PLANTED EDIT at frame 2 (shifted
    // seed). The operator decodes every frame through the real ImageIO
    // sequence reader and hashes each luma plane (classic 8×8 aHash);
    // the query compares each hash against the CLEAN formula replay —
    // matches_clean must flip false exactly at planted edits, proving
    // per-frame decode + hash detect shot-level tampering. Dims ride
    // along to pin real decode geometry.
    "x171_video_frames" -> ((s, dir) => {
      import s.implicits._
      val nf = 4
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val w = 24 + (id % 17).toInt
        val h = 24 + (id % 13).toInt
        val edit = if (id % 40 == 0) 2 else -1
        Multimodal.MediaRow(
          id,
          "video/gif",
          Multimodal.syntheticGif(id, w, h, nf, editFrame = edit, editSeedDelta = 7777L)
        )
      }
      val frames = Multimodal.videoFrameHashes(media)
      val expected = ids
        .mapPartitions(_.flatMap { id =>
          val w = 24 + (id % 17).toInt
          val h = 24 + (id % 13).toInt
          (0 until nf).iterator.map { k =>
            val luma = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                luma(y * w + x) =
                  (Multimodal.syntheticPixel(Multimodal.frameSeed(id, k), x, y) & 0xff).toByte
                x += 1
              }
              y += 1
            }
            (id, k, Multimodal.lumaAHash64(luma, w, h))
          }
        })
        .toDF("id2", "k2", "hash2")
      frames
        .join(expected, col("doc_id") === col("id2") && col("frame_idx") === col("k2"), "full")
        .select(
          coalesce(col("doc_id"), col("id2")).as("doc_id"),
          coalesce(col("frame_idx"), col("k2")).cast("int").as("frame_idx"),
          col("width"),
          col("height"),
          (col("doc_id").isNotNull && col("id2").isNotNull &&
            col("simhash") === col("hash2")).as("matches_clean")
        )
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // PURE-SQL exact dedup: x1's pass reached through the
    // graft_dedup_exact TABLE function (SparkSessionExtensions surface) —
    // the builder is the same Scala code, so the oracle is x1's SQL
    // verbatim; the driver gate proves a SQL-only user gets the identical
    // digest/groupBy plan.
    "x172_sql_dedup" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      T(s, dir, "documents").createOrReplaceTempView("x172_docs")
      s.sql("SELECT * FROM graft_dedup_exact('x172_docs', 'text', 'doc_id') ORDER BY fp")
    }),

    // PURE-SQL decontamination: x24's planted-contamination setup run
    // through the graft_decontaminate TABLE function — same broadcast
    // n-gram join, same oracle.
    "x173_sql_decontaminate" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val planted = bench
        .filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
      docs.filter(col("doc_id") % 97 =!= 0).unionByName(planted)
        .createOrReplaceTempView("x173_corpus")
      bench.createOrReplaceTempView("x173_bench")
      s.sql(
        "SELECT * FROM graft_decontaminate('x173_corpus', 'text', 'doc_id', " +
          "'x173_bench', 'text', 'doc_id', 8) ORDER BY doc_id"
      )
    }),

    // VIDEO-level near-dup: per sampled doc, a clean 4-frame GIF and its
    // frame-2-edited copy (the re-encoded-with-one-shot-replaced regime).
    // The operator decodes frames for real, hashes each, blocks the
    // frame pairs (Manku pigeonhole — exact at ≤ maxHamming), and
    // aggregates to video pairs: each planted pair must surface with
    // EXACTLY its 3 unedited frames matched at hamming 0, and no
    // cross-seed pair can appear (random planes sit ~32 bits apart).
    "x176_video_neardup" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val w = 24 + (id % 17).toInt
        val h = 24 + (id % 13).toInt
        Seq(
          Multimodal.MediaRow(id * 2, "video/gif", Multimodal.syntheticGif(id, w, h, 4)),
          Multimodal.MediaRow(
            id * 2 + 1,
            "video/gif",
            Multimodal.syntheticGif(id, w, h, 4, editFrame = 2, editSeedDelta = 7777L)
          )
        )
      }
      Multimodal
        .videoNearDupPairs(media, maxHamming = 2, blocks = 4, minFrames = 2)
        .orderBy(col("id_a"))
    }),

    // AUDIO near-dup: per sampled doc, a base WAV (formula samples >> 2)
    // and its amplitude-DOUBLED copy — integer ×2 scales every window's
    // Σx² by exactly 4, so the energy-delta fingerprint is bit-identical
    // and the planted pair surfaces at hamming 0 through the real
    // decode → fingerprint → blocked-join path; cross-seed clips sit
    // ~32 bits apart and cannot pair at maxHamming 4.
    "x177_audio_neardup" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val n = 1024 + (id % 7).toInt * 128
        val base = Array.tabulate(n)(i => (Multimodal.syntheticSample(id, i) >> 2).toShort)
        val doubled = base.map(x => (x * 2).toShort)
        Seq(
          Multimodal.MediaRow(id * 2, "audio/wav", Multimodal.wavFromSamples(base)),
          Multimodal.MediaRow(id * 2 + 1, "audio/wav", Multimodal.wavFromSamples(doubled))
        )
      }
      Multimodal
        .audioNearDupPairs(media, maxHamming = 4, blocks = 8)
        .orderBy(col("id_a"))
    }),

    // REAL typed-metadata probe over a MIXED media corpus: per sampled
    // doc, one of PNG image / 3-frame GIF video / WAV audio / plain
    // text by (doc_id/20) % 4 — the probe must type every blob and
    // report its real dims / frame count / sample rate / sample count,
    // all replayable from the synthesis formulas (byte_len dropped:
    // encoded PNG/GIF length is deflate-dependent, not engine-pinnable).
    "x178_media_probe" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val sel = (id / 20) % 4
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val n = 256 + (id % 11).toInt * 32
        val content = sel match {
          case 0 => Multimodal.syntheticImage(id, w, h, "png")
          case 1 => Multimodal.syntheticGif(id, w, h, 3)
          case 2 => Multimodal.syntheticWav(id, n)
          case _ => s"plain text doc $id".getBytes("UTF-8")
        }
        Multimodal.MediaRow(id, "mixed", content)
      }
      Multimodal
        .mediaProbe(media)
        .drop("byte_len")
        .orderBy(col("doc_id"))
    }),

    // REAL raw-frame VIDEO decode (x171's contract on the second
    // container): per sampled doc, a 4-frame YUV4MPEG2 stream — the
    // uncompressed container, parsed by the native Y4M walk, luma ==
    // the formula plane verbatim — with docs where doc_id % 40 == 0
    // carrying a planted frame-2 edit. matches_clean must flip false
    // exactly at the edits; dims pin the header parse.
    "x179_y4m_frames" -> ((s, dir) => {
      import s.implicits._
      val nf = 4
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val w = 24 + (id % 17).toInt
        val h = 24 + (id % 13).toInt
        val edit = if (id % 40 == 0) 2 else -1
        Multimodal.MediaRow(
          id,
          "video/y4m",
          Multimodal.syntheticY4m(id, w, h, nf, editFrame = edit, editSeedDelta = 7777L)
        )
      }
      val frames = Multimodal.videoFrameHashes(media)
      val expected = ids
        .mapPartitions(_.flatMap { id =>
          val w = 24 + (id % 17).toInt
          val h = 24 + (id % 13).toInt
          (0 until nf).iterator.map { k =>
            val luma = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                luma(y * w + x) =
                  (Multimodal.syntheticPixel(Multimodal.frameSeed(id, k), x, y) & 0xff).toByte
                x += 1
              }
              y += 1
            }
            (id, k, Multimodal.lumaAHash64(luma, w, h))
          }
        })
        .toDF("id2", "k2", "hash2")
      frames
        .join(expected, col("doc_id") === col("id2") && col("frame_idx") === col("k2"), "full")
        .select(
          coalesce(col("doc_id"), col("id2")).as("doc_id"),
          coalesce(col("frame_idx"), col("k2")).cast("int").as("frame_idx"),
          col("width"),
          col("height"),
          (col("doc_id").isNotNull && col("id2").isNotNull &&
            col("simhash") === col("hash2")).as("matches_clean")
        )
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // CROSS-CONTAINER video near-dup: the same formula video encoded as
    // an animated GIF (id·2) and as a raw Y4M stream (id·2 + 1) — both
    // containers decode to identical luma planes, so every planted pair
    // must surface with ALL 4 frames matched at hamming 0 through the
    // real decode → per-frame aHash → blocked-join → pair-aggregate
    // path, and nothing else pairs. The dedup pass a multimodal corpus
    // runs when the same clip circulates re-containerized.
    "x180_video_cross_container" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val w = 24 + (id % 17).toInt
        val h = 24 + (id % 13).toInt
        Seq(
          Multimodal.MediaRow(id * 2, "video/gif", Multimodal.syntheticGif(id, w, h, 4)),
          Multimodal.MediaRow(id * 2 + 1, "video/y4m", Multimodal.syntheticY4m(id, w, h, 4))
        )
      }
      Multimodal
        .videoNearDupPairs(media, maxHamming = 2, blocks = 4, minFrames = 2)
        .orderBy(col("id_a"))
    }),

    // REAL COMPRESSED video (MJPEG-in-AVI) frame decode: per sampled
    // doc, a 3-frame AVI whose frames are formula planes through the
    // JDK JPEG encoder. The engine-pinned slice is the FRAME GRID —
    // count and dims come from the JPEG/RIFF structure, identical on
    // any engine — so the query emits (doc_id, frame_idx, width,
    // height) and leaves pixel-derived hash VALUES out (JPEG decode is
    // deterministic per-JDK, not across vendors; the per-frame hash
    // semantics are pinned by OperatorSpec within this JDK).
    "x182_avi_frames" -> ((s, dir) => {
      import s.implicits._
      val nf = 3
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val w = 24 + (id % 17).toInt
        val h = 24 + (id % 13).toInt
        Multimodal.MediaRow(id, "video/avi", Multimodal.syntheticAviMjpeg(id, w, h, nf))
      }
      Multimodal
        .videoFrameHashes(media)
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // COMPRESSED-video near-dup: a clean 4-frame AVI (id·2) and its
    // frame-2-edited copy (id·2 + 1). Unedited frames of the pair
    // encode the SAME plane → byte-identical JPEG chunks → identical
    // decode on ANY engine, so the pair surfaces with exactly its 3
    // unedited frames at hamming 0 even though absolute JPEG pixel
    // values are not cross-engine-pinned; edited and cross-seed frames
    // sit ~32 bits apart and cannot pair at maxHamming 2.
    "x183_avi_neardup" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val w = 24 + (id % 17).toInt
        val h = 24 + (id % 13).toInt
        Seq(
          Multimodal.MediaRow(id * 2, "video/avi", Multimodal.syntheticAviMjpeg(id, w, h, 4)),
          Multimodal.MediaRow(
            id * 2 + 1,
            "video/avi",
            Multimodal.syntheticAviMjpeg(id, w, h, 4, editFrame = 2, editSeedDelta = 7777L)
          )
        )
      }
      Multimodal
        .videoNearDupPairs(media, maxHamming = 2, blocks = 4, minFrames = 2)
        .orderBy(col("id_a"))
    }),

    // FULL media catalog probe across all SEVEN kinds the engine now
    // decodes: PNG image, animated GIF, WAV audio, raw Y4M video,
    // compressed MJPEG-AVI video, an INTERLEAVED audio-bearing AVI
    // (typed video with its audio stream's rate/samples populated), and
    // plain text — every typed field (kind, dims, frame count, sample
    // rate, sample count) replayable from the synthesis formulas and
    // container structure alone.
    "x184_media_catalog" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val sel = (id / 20) % 7
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val n = 256 + (id % 11).toInt * 32
        val content = sel match {
          case 0 => Multimodal.syntheticImage(id, w, h, "png")
          case 1 => Multimodal.syntheticGif(id, w, h, 3)
          case 2 => Multimodal.syntheticWav(id, n)
          case 3 => Multimodal.syntheticY4m(id, w, h, 2)
          case 4 => Multimodal.syntheticAviMjpeg(id, w, h, 2)
          case 5 => Multimodal.syntheticAviMjpeg(id, w, h, 2,
            audioSamples = Array.tabulate(n)(Multimodal.syntheticSample(id, _)), audioRate = 8000)
          case _ => s"plain text doc $id".getBytes("UTF-8")
        }
        Multimodal.MediaRow(id, "catalog", content)
      }
      Multimodal
        .mediaProbe(media)
        .drop("byte_len")
        .orderBy(col("doc_id"))
    }),

    // PURE-SQL media catalog: x184's seven-kind corpus reached through the
    // graft_media_probe TABLE function (the x172/x173 discipline for the
    // multimodal layer) — the driver gate proves a SQL-only user gets
    // the identical typed-probe plan. Oracle: x184's SQL verbatim.
    "x185_sql_media_probe" -> ((s, dir) => {
      import s.implicits._
      graft.GraftExtensions.register(s)
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val sel = (id / 20) % 7
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val n = 256 + (id % 11).toInt * 32
        val content = sel match {
          case 0 => Multimodal.syntheticImage(id, w, h, "png")
          case 1 => Multimodal.syntheticGif(id, w, h, 3)
          case 2 => Multimodal.syntheticWav(id, n)
          case 3 => Multimodal.syntheticY4m(id, w, h, 2)
          case 4 => Multimodal.syntheticAviMjpeg(id, w, h, 2)
          case 5 => Multimodal.syntheticAviMjpeg(id, w, h, 2,
            audioSamples = Array.tabulate(n)(Multimodal.syntheticSample(id, _)), audioRate = 8000)
          case _ => s"plain text doc $id".getBytes("UTF-8")
        }
        (id, content)
      }
      media.toDF("doc_id", "content").createOrReplaceTempView("x185_media")
      s.sql(
        "SELECT doc_id, kind, width, height, n_frames, sample_rate, n_samples " +
          "FROM graft_media_probe('x185_media', 'doc_id', 'content') ORDER BY doc_id"
      )
    }),

    // CROSS-RATE audio near-dup: per sampled doc, the SAME recording at
    // 16 kHz (master formula samples) and at 8 kHz (its even frames —
    // exactly what ideal decimation produces). Without normalization the
    // two fingerprint differently; with normalizeRate=8000 the real
    // decode → integer-exact resample → energy fingerprint path makes
    // them bit-identical, so every planted pair surfaces at hamming 0
    // and cross-seed clips cannot pair.
    "x181_audio_rate_neardup" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val n = 1024 + (id % 7).toInt * 128 // master frames at 16 kHz (even)
        val hi = Array.tabulate(n)(i => (Multimodal.syntheticSample(id, i) >> 2).toShort)
        val lo = Array.tabulate(n / 2)(j => hi(2 * j)) // the 8 kHz edition
        Seq(
          Multimodal.MediaRow(id * 2, "audio/wav", Multimodal.wavFromSamples(hi, 16000)),
          Multimodal.MediaRow(id * 2 + 1, "audio/wav", Multimodal.wavFromSamples(lo, 8000))
        )
      }
      Multimodal
        .audioNearDupPairs(media, maxHamming = 4, blocks = 8, normalizeRate = Some(8000))
        .orderBy(col("id_a"))
    }),

    // CROSS-CONTAINER audio near-dup (the x180 discipline for audio):
    // the SAME formula clip shipped as WAV (id·3), AIFF (id·3 + 1), and
    // Sun AU (id·3 + 2) — all three javax.sound-native containers
    // decode sample-exact, so each planted triple surfaces as exactly
    // its 3 pairs at hamming 0, and cross-seed clips cannot pair.
    // Before r15, non-WAV audio silently took the byte-fallback
    // fingerprint and none of these pairs existed.
    "x186_audio_cross_container" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val n = 256 + (id % 11).toInt * 32
        val samples = Array.tabulate(n)(i => (Multimodal.syntheticSample(id, i) >> 2).toShort)
        Seq(
          Multimodal.MediaRow(id * 3, "audio/wav", Multimodal.wavFromSamples(samples, 16000)),
          Multimodal.MediaRow(id * 3 + 1, "audio/aiff", Multimodal.aiffFromSamples(samples, 16000)),
          Multimodal.MediaRow(id * 3 + 2, "audio/basic", Multimodal.auFromSamples(samples, 16000))
        )
      }
      Multimodal
        .audioNearDupPairs(media, maxHamming = 0, blocks = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // MULTIMODAL CAPSTONE: probe → per-kind near-dup → ONE deduped typed
    // catalog with per-kind drop accounting (mediaDedupCatalog — one
    // decode pass, kind-routed pair joins, CC keep-best). Planted
    // layout per sampled doc: an (original, edition) pair of ONE kind —
    // image as PNG+BMP (same plane), audio as 16 kHz WAV + 8 kHz AIFF
    // edition (rate- AND container-crossed), video as GIF+Y4M — plus an
    // unpaired text blob. The aggregate pins per-kind in/kept/dropped
    // counts AND the kept-identity mass (which ids survived, not just
    // how many): every pair keeps its smaller id, every unknown is kept.
    "x187_media_dedup_catalog" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val sel = (id / 20) % 3
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val n = 256 + (id % 11).toInt * 32
        val pair = sel match {
          case 0 =>
            Seq(
              Multimodal.MediaRow(id * 2, "image/png", Multimodal.syntheticImage(id, w, h, "png")),
              Multimodal.MediaRow(id * 2 + 1, "image/bmp", Multimodal.syntheticImage(id, w, h, "bmp"))
            )
          case 1 =>
            val hi = Array.tabulate(n)(i => (Multimodal.syntheticSample(id, i) >> 2).toShort)
            val lo = Array.tabulate(n / 2)(j => hi(2 * j))
            Seq(
              Multimodal.MediaRow(id * 2, "audio/wav", Multimodal.wavFromSamples(hi, 16000)),
              Multimodal.MediaRow(id * 2 + 1, "audio/aiff", Multimodal.aiffFromSamples(lo, 8000))
            )
          case _ =>
            Seq(
              Multimodal.MediaRow(id * 2, "video/gif", Multimodal.syntheticGif(id, w, h, 4)),
              Multimodal.MediaRow(id * 2 + 1, "video/y4m", Multimodal.syntheticY4m(id, w, h, 4))
            )
        }
        pair :+ Multimodal.MediaRow(
          id * 2 + 100000001L, "text/plain", s"caption for doc $id".getBytes("UTF-8"))
      }
      Multimodal
        .mediaDedupCatalog(media, normalizeRate = Some(8000))
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_in"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
          sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("kept_id_sum")
        )
        .orderBy(col("kind"))
    }),

    // STRUCTURE-ONLY container typing (beyond the decode ceiling): MP3
    // frame chains and MP4/M4A box trees — including the FRAGMENTED
    // fMP4/DASH layout, whose frame count is the sum of moof/traf/trun
    // sample counts — carry exact typed metadata — rate, per-channel
    // samples, dims, frame counts — with NO codec at all, so the
    // catalog row for the most common real-corpus containers is fully
    // typed instead of 'unknown'. Every field is replayable from the
    // synthesis arithmetic alone.
    "x189_container_probe" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val sel = (id / 20) % 4
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val n = 256 + (id % 11).toInt * 32
        val content = sel match {
          case 0 =>
            val rate = (id % 3) match { case 0 => 44100; case 1 => 22050; case _ => 8000 }
            Multimodal.syntheticMp3(id, 5 + (id % 7).toInt, rate, withId3 = id % 2 == 0)
          case 1 =>
            Multimodal.syntheticMp4(id, w, h, 2 + (id % 5).toInt,
              audioRate = 44100, audioSamples = n.toLong)
          case 2 =>
            Multimodal.syntheticMp4(id, -1, -1, 0, audioRate = 16000, audioSamples = n.toLong)
          case _ => // fragmented: stsz 0, frames split across 2 moofs
            Multimodal.syntheticMp4(id, w, h, 2 + (id % 5).toInt, fragments = 2)
        }
        Multimodal.MediaRow(id, "container", content)
      }
      Multimodal
        .mediaProbe(media)
        .drop("byte_len")
        .orderBy(col("doc_id"))
    }),

    // FLAC structure-only typing: STREAMINFO is a fixed-bit-layout
    // header block (rate 20 bits, channels 3, total samples 36) — the
    // x189 discipline verbatim for the dominant lossless container.
    "x191_flac_probe" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val rate = (id % 3) match { case 0 => 44100; case 1 => 96000; case _ => 8000 }
        val n = 1000L + (id % 13) * 77
        Multimodal.MediaRow(
          id, "audio/flac",
          Multimodal.syntheticFlac(id, n, rate, channels = 1 + (id % 2).toInt))
      }
      Multimodal
        .mediaProbe(media)
        .drop("byte_len")
        .orderBy(col("doc_id"))
    }),

    // OGG page-walk typing: the LAST page's granule position is the
    // stream's total sample count — Vorbis at the id-header rate, Opus
    // at the spec's 48 kHz timebase minus the id header's pre-skip.
    // Both codecs planted; every field replays from the arithmetic.
    "x192_ogg_probe" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val n = 2000L + (id % 11) * 111
        val pages = 3 + (id % 3).toInt
        val content =
          if (id % 40 == 0) {
            val rate = (id % 3) match { case 0 => 48000; case 1 => 44100; case _ => 16000 }
            Multimodal.syntheticOgg(id, n, rate, channels = 2, codec = "vorbis", pages = pages)
          } else
            Multimodal.syntheticOgg(id, n, 48000, channels = 1, codec = "opus", pages = pages)
        Multimodal.MediaRow(id, "audio/ogg", content)
      }
      Multimodal
        .mediaProbe(media)
        .drop("byte_len")
        .orderBy(col("doc_id"))
    }),

    // EXACT-duplicate edges for FINGERPRINT-LESS media (the one dup class
    // the catalog used to pass silently): byte-identical MP3 / MP4 /
    // unknown twins share a content md5 and drop through the digest star
    // edges, while a near-identical sibling (same structure and typed
    // metadata, different payload bytes) is correctly kept. Per planted
    // triple (twin, twin-copy, near-sibling): 3 in, 2 kept (the smaller
    // twin id + the sibling), 1 dropped — pinned per kind with
    // kept-identity mass, the x187 accounting discipline.
    "x190_digest_dedup" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val sel = (id / 20) % 3
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val nf = 2 + (id % 5).toInt
        def blob(seed: Long): Array[Byte] = sel match {
          case 0 => Multimodal.syntheticMp3(seed, 5 + (id % 7).toInt, 44100)
          case 1 => Multimodal.syntheticMp4(seed, w, h, nf)
          case _ => s"opaque payload $seed for doc $id".getBytes("UTF-8")
        }
        val twin = blob(id * 7919L)
        Seq(
          Multimodal.MediaRow(id * 4, "bin", twin),
          Multimodal.MediaRow(id * 4 + 1, "bin", twin.clone()),
          Multimodal.MediaRow(id * 4 + 2, "bin", blob(id * 7919L + 1))
        )
      }
      Multimodal
        .mediaDedupCatalog(media)
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_in"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
          sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("kept_id_sum")
        )
        .orderBy(col("kind"))
    }),

    // WebP structure-only typing: dims at the three layouts' fixed
    // offsets (VP8 start-code, VP8L packed u32, VP8X u24 canvas), and
    // the animated container types as VIDEO with its exact ANMF frame
    // count. Every field replays from the synthesis arithmetic.
    "x193_webp_probe" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val content = (id / 20) % 3 match {
          case 0 => Multimodal.syntheticWebp(id, w, h, "vp8")
          case 1 => Multimodal.syntheticWebp(id, w, h, "vp8l")
          case _ => Multimodal.syntheticWebp(id, w, h, "anim", animFrames = 2 + (id % 5).toInt)
        }
        Multimodal.MediaRow(id, "image/webp", content)
      }
      Multimodal
        .mediaProbe(media)
        .drop("byte_len")
        .orderBy(col("doc_id"))
    }),

    // TIFF structure-only typing: both byte orders, SHORT and LONG
    // dimension entries, multi-page next-IFD chains — the scanned-
    // document container typed exactly with no codec (these synthetic
    // strips are junk, so the ImageIO decode path refuses and the IFD
    // probe must carry the row). Every field replays from arithmetic.
    "x194_tiff_probe" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.map { id =>
        val w = 100 + (id % 9).toInt
        val h = 80 + (id % 7).toInt
        val pages = 1 + (id % 4).toInt
        Multimodal.MediaRow(
          id, "image/tiff",
          Multimodal.syntheticTiff(id, w, h, pages, littleEndian = id % 2 == 0))
      }
      Multimodal
        .mediaProbe(media)
        .drop("byte_len")
        .orderBy(col("doc_id"))
    }),

    // PURE-SQL capstone: x187's corpus through the graft_media_dedup
    // TABLE function (the x185 discipline for the dedup pipeline) — a
    // SQL-only user gets the identical one-decode-pass, kind-routed,
    // CC-keep-best catalog. Oracle: x187's SQL verbatim.
    "x188_sql_media_dedup" -> ((s, dir) => {
      import s.implicits._
      graft.GraftExtensions.register(s)
      val ids = T(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .as[Long]
      val media = ids.flatMap { id =>
        val sel = (id / 20) % 3
        val w = 16 + (id % 9).toInt
        val h = 16 + (id % 7).toInt
        val n = 256 + (id % 11).toInt * 32
        val pair = sel match {
          case 0 =>
            Seq(
              (id * 2, Multimodal.syntheticImage(id, w, h, "png")),
              (id * 2 + 1, Multimodal.syntheticImage(id, w, h, "bmp"))
            )
          case 1 =>
            val hi = Array.tabulate(n)(i => (Multimodal.syntheticSample(id, i) >> 2).toShort)
            val lo = Array.tabulate(n / 2)(j => hi(2 * j))
            Seq(
              (id * 2, Multimodal.wavFromSamples(hi, 16000)),
              (id * 2 + 1, Multimodal.aiffFromSamples(lo, 8000))
            )
          case _ =>
            Seq(
              (id * 2, Multimodal.syntheticGif(id, w, h, 4)),
              (id * 2 + 1, Multimodal.syntheticY4m(id, w, h, 4))
            )
        }
        pair :+ ((id * 2 + 100000001L, s"caption for doc $id".getBytes("UTF-8")))
      }
      media.toDF("doc_id", "content").createOrReplaceTempView("x188_media")
      s.sql(
        """SELECT kind, COUNT(*) AS n_in,
          |  SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept,
          |  SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS n_dropped,
          |  SUM(CASE WHEN kept THEN doc_id ELSE 0 END) AS kept_id_sum
          |FROM graft_media_dedup('x188_media', 'doc_id', 'content', 8000)
          |GROUP BY kind ORDER BY kind""".stripMargin
      )
    }),

    // x109 through gapFillAuto with the probe FORCED to the chunked
    // route (threshold 1e-9, floor 0: any non-empty frame trips) — the
    // driver gate proves the auto switch + time-epoch chunked LOCF are
    // invisible to results on real timestamped data, not only on the
    // CI fixtures. Oracle: x109's SQL verbatim.
    "x174_gapfill_auto" -> ((s, dir) => {
      val masked = T(s, dir, "events").withColumn(
        "v",
        when(col("event_type") === "error", lit(null).cast("double")).otherwise(col("value"))
      )
      graft.operators.AsOfJoin
        .gapFillAuto(masked, "user_id", "ts", "event_id", "v",
          hotShareThreshold = 1e-9, minHotRows = 0L)
        .select(col("event_id"), col("user_id"), col("v_filled"), col("was_filled"))
        .orderBy(col("event_id"))
    }),

    // x17 through resampleAuto, probe forced chunked the same way: the
    // grid + chunked-merge composition must reproduce the plain resample
    // exactly. Oracle: x17's SQL verbatim.
    "x175_resample_auto" -> ((s, dir) => {
      graft.operators.AsOfJoin
        .resampleAuto(
          T(s, dir, "events").select(col("user_id"), col("ts"), col("value")),
          "user_id",
          "ts",
          "1 hour",
          Seq("value"),
          hotShareThreshold = 1e-9,
          minHotRows = 0L
        )
        .select(col("user_id"), unix_millis(col("ts")).as("grid_ms"), col("value"))
        .orderBy(col("user_id"), col("grid_ms"))
    }),

    // Full PCA pipeline, driver-checkable end to end: 6dp-rounded gram
    // -> bounded collect -> REPLAYABLE power iteration (3 steps, vector
    // re-rounded 6dp each step — the x126 discipline on an iterative
    // model fit) -> zero-shuffle projection of every embedding onto the
    // dominant direction. The oracle unrolls the same 3 iterations as
    // CTEs over the same rounded gram.
    "x164_pca_project" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val gram = Spectral
        .gramMatrix(emb, col("embedding"))
        .select(col("i"), col("j"), round(col("g"), 6).as("g"))
      val v = Spectral.topComponentReplay(Spectral.gramToMatrix(gram), iters = 3)
      Spectral
        .projectOnto(emb, col("embedding"), v)
        .select(col("vec_id"), round(col("proj"), 6).as("proj"))
        .orderBy(col("vec_id"))
    }),

    // Pagination-stitch detection: planted page pairs share a 30-char
    // boundary (page A = chars 1..150, page B = chars 121..end, so A's
    // tail IS B's head); short docs ride along as unpaired noise.
    "x152_stitch" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val long = docs.where(length(col("text")) >= 200)
      val pages = long
        .select((col("doc_id") * 2).as("id"), substring(col("text"), 1, 150).as("s"))
        .unionAll(
          long.select(
            (col("doc_id") * 2 + 1).as("id"),
            col("text").substr(lit(121), length(col("text")) - 120).as("s")
          )
        )
        .unionAll(
          docs
            .where(length(col("text")) < 200)
            .select((col("doc_id") * 2).as("id"), col("text").as("s"))
        )
      Dedup
        .stitchCandidates(pages, col("id"), col("s"), w = 30)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Multimodal frame sampling plumbing (every 4th 16-byte block).
    "x13_frame_sample" -> ((s, dir) => {
      val media = Multimodal
        .fromDocuments(s, T(s, dir, "documents"))
        .toDF()
      Multimodal
        .sampleFrames(media, "content", frameSize = 16, stride = 4)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"), sum(length(col("frame"))).cast("long").as("sampled_bytes"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // html extraction: the same RE2-safe chain, verbatim — blocks, tags,
    // one-level entity decode (amp LAST), whitespace collapse
    "x75_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>t</title><style>p { color: red }</style>' ||
        |  '<script type="text/javascript">if (x < 2 && y > 1) { alert("hi"); }</script>' ||
        |  '</head><body><h1>Doc</h1><p>' || text ||
        |  '</p><div class="footer">copy &amp; paste &lt;ok&gt;&nbsp;&#39;end&#39;</div></body></html>'
        |  AS html FROM documents),
        |x AS (SELECT doc_id,
        |  TRIM(regexp_replace(
        |    REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&amp;', '&'),
        |    '[ \t\n\r]+', ' ', 'g')) AS extracted
        |  FROM h)
        |SELECT doc_id, CAST(LENGTH(extracted) AS INT) AS n_chars, md5(extracted) AS fp
        |FROM x ORDER BY doc_id""".stripMargin,
    // jsonl: identical line bytes, identical truncation; corrupt lines
    // parse to nulls in both engines
    "x76_jsonl_ingest" ->
      """WITH b AS (SELECT doc_id AS line_id,
        |    '{"doc_id":' || doc_id || ',"text":"' || text || '","lang":"' || lang || '"}' AS l
        |  FROM documents),
        |t AS (SELECT line_id,
        |    CASE WHEN line_id % 10 = 3 THEN SUBSTR(l, 1, LENGTH(l) - 10) ELSE l END AS line
        |  FROM b),
        |p AS (SELECT line_id, line, json_valid(line) AS ok FROM t)
        |SELECT line_id,
        |  CASE WHEN ok THEN CAST(json_extract(line, '$.doc_id') AS BIGINT) END AS doc_id,
        |  md5(COALESCE(CASE WHEN ok THEN json_extract_string(line, '$.text') END, '')) AS text_fp,
        |  CASE WHEN ok THEN json_extract_string(line, '$.lang') END AS lang,
        |  NOT ok AS is_corrupt
        |FROM p ORDER BY line_id""".stripMargin,
    // winnowing: per-window min via range join + leftmost tie-break;
    // hex-string order == unsigned byte order
    // html metadata: same regexes, same attribute-layout contract
    "x84_html_meta" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>  Doc ' || doc_id || ' ::' || chr(10) || '  ' ||
        |  SUBSTR(text, 1, 15) || '</title>' ||
        |  (CASE WHEN doc_id % 4 = 0
        |        THEN '<link rel="canonical" href="https://canon.example/d/' || doc_id || '"/>'
        |        ELSE '' END) ||
        |  (CASE WHEN doc_id % 5 = 0
        |        THEN '<meta name="robots" content="noindex, nofollow"/>'
        |        ELSE '' END) ||
        |  '</head><body><p>' || text || '</p></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id,
        |  TRIM(regexp_replace(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
        |    '[ \t\n\r]+', ' ', 'g')) AS title,
        |  NULLIF(regexp_extract(html, '(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"', 1), '')
        |    AS canonical,
        |  LEN(regexp_extract_all(html,
        |    '(?i)<meta[^>]*name="robots"[^>]*content="[^"]*noindex')) > 0 AS noindex
        |FROM h ORDER BY doc_id""".stripMargin,
    // cross-modal alignment: perturb replayed per-component, cosine via
    // DuckDB's list kernel; decisions compare the 6dp-rounded value on
    // both sides, and planted margins keep every row far from the gate
    "x85_cross_modal" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |p AS (SELECT vec_id, LIST_TRANSFORM(emb, x -> $perturbSql) AS pemb FROM e),
        |sh AS (SELECT vec_id - 1 AS vec_id, pemb AS pemb2 FROM p),
        |pair AS (SELECT e.vec_id, e.emb AS t_emb,
        |  CASE WHEN e.vec_id % 5 = 0 AND sh.pemb2 IS NOT NULL THEN sh.pemb2 ELSE p.pemb END AS i_emb
        |  FROM e JOIN p USING (vec_id) LEFT JOIN sh USING (vec_id))
        |SELECT vec_id AS pair_id,
        |  ROUND(list_cosine_similarity(t_emb, i_emb), 6) AS align,
        |  ROUND(list_cosine_similarity(t_emb, i_emb), 6) >= 0.95 AS aligned
        |FROM pair ORDER BY pair_id""".stripMargin,
    // incremental semantic gate: the oracle is the EXACT batch×ref cosine
    // join (valid: planted cos ≈ 0.9999 with LSH miss probability 1.6e-6
    // per pair; natural pairs cap ~0.6, far under the 0.95 gate)
    "x86_incremental_semantic" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ref AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
        |twins AS (SELECT vec_id + 10000000 AS vec_id,
        |  LIST_TRANSFORM(v, x -> $perturbSql) AS v FROM ref WHERE vec_id % 10 = 0),
        |batch AS (SELECT * FROM twins
        |  UNION ALL SELECT vec_id, v FROM e WHERE vec_id % 10 = 1),
        |hits AS (SELECT b.vec_id AS id, MIN(r.vec_id) AS dup_of, COUNT(1) AS n_ref_matches
        |  FROM batch b JOIN ref r ON list_cosine_similarity(b.v, r.v) >= 0.95
        |  GROUP BY 1)
        |SELECT b.vec_id AS id, h.dup_of, COALESCE(h.n_ref_matches, 0) AS n_ref_matches,
        |  h.dup_of IS NULL AS kept
        |FROM batch b LEFT JOIN hits h ON h.id = b.vec_id ORDER BY 1""".stripMargin,
    // curriculum: per-tier md5 rank replayed as a window (the oracle can
    // afford the hot partition; the engine side must not)
    "x87_curriculum" ->
      """WITH t AS (SELECT doc_id,
        |  LEAST(CAST(FLOOR(n_chars / 150.0) AS INT), 3) AS tier FROM documents),
        |r AS (SELECT doc_id, tier,
        |  ROW_NUMBER() OVER (PARTITION BY tier
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rank_in_tier
        |  FROM t)
        |SELECT doc_id, tier, rank_in_tier, rank_in_tier * 4 + tier AS train_order
        |FROM r ORDER BY doc_id""".stripMargin,
    // warc ingest: the oracle CONSTRUCTS the expected parse from the
    // record grammar (payloads never contain the magic, so the planted
    // truncation invalidates exactly the final record of ≡0 mod 7 blobs)
    "x96_warc_ingest" ->
      """WITH d AS (SELECT doc_id, text, doc_id // 5 AS g,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id // 5 ORDER BY doc_id) - 1 AS ri,
        |    COUNT(1) OVER (PARTITION BY doc_id // 5) AS gn
        |  FROM documents)
        |SELECT g AS blob_id, CAST(ri AS INT) AS rec_idx,
        |  CASE WHEN g % 7 = 0 AND ri = gn - 1 THEN NULL
        |       ELSE 'https://ex.com/' || doc_id END AS uri,
        |  md5(CASE WHEN g % 7 = 0 AND ri = gn - 1 THEN '' ELSE text END) AS fp,
        |  NOT (g % 7 = 0 AND ri = gn - 1) AS is_valid
        |FROM d ORDER BY blob_id, rec_idx""".stripMargin,
    // middle-out truncation: 12-head + 12-tail slice replay
    "x95_truncate" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
        |c AS (SELECT doc_id, LEN(ts) AS n,
        |  CASE WHEN LEN(ts) <= 24 THEN ts
        |       ELSE LIST_CONCAT(ts[1:12], ts[-12:]) END AS kept
        |  FROM d)
        |SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |  CAST(LEN(kept) AS INT) AS kept_tokens,
        |  n > 24 AS truncated,
        |  md5(ARRAY_TO_STRING(kept, ' ')) AS fp
        |FROM c ORDER BY doc_id""".stripMargin,
    // code gate: same shaping, same line/alnum arithmetic
    "x92_code_gate" ->
      """WITH sh AS (SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 0 THEN REPEAT(REPLACE(text, ' ', ''), 30)
        |       WHEN doc_id % 9 = 1 THEN '// auto-generated do not edit' || chr(10) || text
        |       WHEN doc_id % 9 = 2 THEN REPLACE(text, ' ', chr(10))
        |       ELSE text END AS t
        |  FROM documents),
        |m AS (SELECT doc_id, t,
        |  LEN(STRING_SPLIT(t, chr(10))) AS n_lines,
        |  LIST_MAX(LIST_TRANSFORM(STRING_SPLIT(t, chr(10)), l -> CAST(LENGTH(l) AS INT))) AS max_line_len,
        |  ROUND(CAST(LENGTH(t) - (LEN(STRING_SPLIT(t, chr(10))) - 1) AS DOUBLE)
        |    / LEN(STRING_SPLIT(t, chr(10))), 6) AS mean_line_len,
        |  ROUND(CAST(LENGTH(t) - LENGTH(TRANSLATE(t,
        |      'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789', ''))
        |    AS DOUBLE) / GREATEST(LENGTH(t), 1), 6) AS alnum_frac,
        |  (CONTAINS(LOWER(t), 'auto-generated') OR CONTAINS(LOWER(t), 'do not edit')) AS autogen
        |  FROM sh)
        |SELECT doc_id, CAST(n_lines AS INT) AS n_lines, max_line_len, mean_line_len,
        |  alnum_frac, autogen,
        |  (NOT autogen AND max_line_len <= 800 AND mean_line_len <= 800
        |   AND alnum_frac >= 0.5) AS kept
        |FROM m ORDER BY doc_id""".stripMargin,
    // intra-doc dedup: first-occurrence filter replayed with DuckDB's
    // indexed lambda (1-based, like array_position)
    "x93_intradoc_dedup" ->
      """WITH sh AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0
        |       THEN SUBSTR(text, 1, 40) || chr(10) || text || chr(10) || SUBSTR(text, 1, 40)
        |       ELSE text END AS t
        |  FROM documents),
        |x AS (SELECT doc_id, STRING_SPLIT(t, chr(10)) AS ls FROM sh)
        |SELECT doc_id, CAST(LEN(ls) AS INT) AS n_lines,
        |  CAST(LEN(LIST_FILTER(ls, (l, i) -> LIST_POSITION(ls, l) = i)) AS INT) AS n_kept,
        |  md5(ARRAY_TO_STRING(LIST_FILTER(ls, (l, i) -> LIST_POSITION(ls, l) = i), chr(10))) AS fp,
        |  FALSE AS is_shed
        |FROM x ORDER BY doc_id""".stripMargin,
    // chunk round trip: invertibility is the theorem — the oracle pins
    // the arithmetic chunk count and asserts the digest match
    "x94_chunk_roundtrip" ->
      """SELECT doc_id,
        |  CAST(CEIL(LEN(STRING_SPLIT(text, ' ')) / 32.0) AS BIGINT) AS n_chunks,
        |  TRUE AS roundtrip_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // dataset card: straight group aggregates, exact distincts
    "x88_dataset_card" ->
      """SELECT source, COUNT(1) AS n_docs,
        |  CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  COUNT(DISTINCT md5(text)) AS n_distinct,
        |  ROUND(AVG(LEN(STRING_SPLIT(text, ' '))), 6) AS mean_tokens,
        |  ROUND(1.0 - COUNT(DISTINCT md5(text)) / CAST(COUNT(1) AS DOUBLE), 6) AS dup_rate
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // recall@k: the same constructed result/truth sets, same metric math
    "x89_recall_at_k" ->
      """WITH qs AS (SELECT doc_id AS q FROM documents WHERE doc_id % 5 = 0),
        |truth AS (SELECT q, q * 7 + j * 13 AS n FROM qs, UNNEST([1, 2, 3]) AS t(j)),
        |results AS (SELECT q,
        |    q * 7 + (r + CASE WHEN q % 3 = 0 THEN 2 ELSE 0 END) * 13 AS n, r AS rank
        |  FROM qs, UNNEST([1, 2, 3, 4, 5]) AS t(r)),
        |sizes AS (SELECT q AS query_id, COUNT(1) AS n_truth FROM truth GROUP BY 1),
        |hits AS (SELECT t.q AS query_id, COUNT(1) AS n_hit
        |  FROM truth t JOIN results r ON r.q = t.q AND r.n = t.n AND r.rank <= 4
        |  GROUP BY 1)
        |SELECT s.query_id, s.n_truth, COALESCE(h.n_hit, 0) AS n_hit,
        |  ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / LEAST(4, s.n_truth), 6) AS recall
        |FROM sizes s LEFT JOIN hits h USING (query_id) ORDER BY s.query_id""".stripMargin,
    // leakage audit: split replayed via the x21 twin, canonicalized pair
    // classes, exact counts
    "x90_leakage_audit" ->
      """WITH s AS (SELECT doc_id,
        |  CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |       WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
        |       ELSE 'test' END AS split FROM documents),
        |p AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 10 = 0),
        |j AS (SELECT
        |    LEAST(COALESCE(sa.split, 'missing'), COALESCE(sb.split, 'missing')) AS split_a,
        |    GREATEST(COALESCE(sa.split, 'missing'), COALESCE(sb.split, 'missing')) AS split_b
        |  FROM p LEFT JOIN s sa ON sa.doc_id = p.a LEFT JOIN s sb ON sb.doc_id = p.b)
        |SELECT split_a, split_b, COUNT(1) AS n_pairs, split_a <> split_b AS leaked
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // calibration bins: deterministic uniform score, arithmetic label
    "x91_calibration_bins" ->
      s"""WITH u AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |sc AS (SELECT doc_id, $hashUniformSql AS score,
        |  CAST(doc_id % 3 = 0 AS INT) AS y FROM u),
        |b AS (SELECT LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin, score, y FROM sc)
        |SELECT bin, COUNT(1) AS n, ROUND(AVG(score), 6) AS mean_score,
        |  ROUND(AVG(y), 6) AS pos_rate,
        |  ROUND(ROUND(AVG(score), 6) - ROUND(AVG(y), 6), 6) AS gap
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    // blocklist gate: identical longest-first alternation pattern;
    // leftmost-first + non-overlapping scan agree across engines
    "x78_blocklist" ->
      """WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents)
        |SELECT doc_id,
        |  CAST(LEN(regexp_extract_all(lt,
        |    '\b(?:scan merge|slow query|table scan|hash join|vector)\b')) AS INT) AS n_hits,
        |  NULLIF(regexp_extract(lt,
        |    '\b(?:scan merge|slow query|table scan|hash join|vector)\b'), '') AS first_hit,
        |  LEN(regexp_extract_all(lt,
        |    '\b(?:scan merge|slow query|table scan|hash join|vector)\b')) > 0 AS blocked
        |FROM t ORDER BY doc_id""".stripMargin,
    // catalog merge: same digests, same priority/id winner, same sorted
    // provenance list
    "x79_catalog_merge" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |cats AS (
        |  SELECT doc_id, md5(text) AS fp, 'web' AS catalog, 0 AS priority
        |  FROM base WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, md5(text), 'books', 1 FROM base WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5(text), 'books', 1 FROM base WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id, md5(text), 'code', 2 FROM base WHERE doc_id % 3 = 2
        |  UNION ALL
        |  SELECT doc_id + 2000000, md5(text), 'code', 2 FROM base WHERE doc_id % 6 = 1),
        |g AS (SELECT fp, COUNT(1) AS n_copies,
        |  ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT catalog)), ',') AS all_sources
        |  FROM cats GROUP BY fp),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY priority, doc_id) AS rn
        |  FROM cats)
        |SELECT w.doc_id, w.fp, w.catalog, w.priority, g.n_copies, g.all_sources
        |FROM w JOIN g USING (fp) WHERE rn = 1 ORDER BY fp, doc_id""".stripMargin,
    // url dedup: the normalization chain replayed verbatim (group refs
    // are \1 here vs $1 in Spark; the PATTERNS are identical)
    "x80_url_dedup" ->
      """WITH u AS (SELECT doc_id, n_chars,
        |  'HTTPS://WWW.Site' || (doc_id % 40) || '.CO.UK' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
        |  '/p/' || (doc_id % 200) ||
        |  (CASE WHEN doc_id % 2 = 0
        |        THEN '?utm_source=feed&utm_campaign=c' || (doc_id % 5) || '&ref=' || (doc_id % 3)
        |        ELSE '?id=' || (doc_id % 7) || '&fbclid=f' || doc_id END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |n AS (SELECT doc_id, n_chars, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
        |parts AS (SELECT doc_id, n_chars,
        |  lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS aftersch
        |  FROM n),
        |hp AS (SELECT doc_id, n_chars, scheme,
        |  regexp_replace(regexp_replace(
        |    lower(regexp_extract(aftersch, '^([^/?]*)', 1)), ':(80|443)$', ''), '^www\.', '') AS host,
        |  regexp_replace(aftersch, '^[^/?]*', '') AS pathq
        |  FROM parts),
        |cleaned AS (SELECT doc_id, n_chars, scheme, host,
        |  regexp_replace(regexp_replace(regexp_replace(pathq,
        |    '([?&])(?:utm_[a-z0-9]+|fbclid|gclid)=[^&#]*', '\1', 'g'),
        |    '([?&])&+', '\1', 'g'), '[?&]+$', '') AS pq
        |  FROM hp),
        |k AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS pref,
        |  regexp_replace(scheme || '://' || host || pq, '/+$', '') AS key
        |  FROM cleaned),
        |w AS (SELECT *, COUNT(1) OVER (PARTITION BY key) AS n_dups,
        |  ROW_NUMBER() OVER (PARTITION BY key ORDER BY pref DESC, doc_id) AS rn FROM k),
        |d AS (SELECT key, doc_id, pref, n_dups, rn = 1 AS kept,
        |  regexp_extract(key, '^[a-z0-9+.-]*://([^/?]*)', 1) AS host2 FROM w),
        |dom AS (SELECT *, STRING_SPLIT(host2, '.') AS p2 FROM d)
        |SELECT key, doc_id, pref, n_dups, kept,
        |  CASE WHEN LEN(p2) >= 3 AND LIST_CONTAINS(
        |         ['co.uk','org.uk','ac.uk','gov.uk','co.jp','com.au','com.br','co.nz','co.in'],
        |         p2[-2] || '.' || p2[-1])
        |       THEN p2[-3] || '.' || p2[-2] || '.' || p2[-1]
        |       WHEN LEN(p2) >= 2 THEN p2[-2] || '.' || p2[-1]
        |       ELSE host2 END AS domain
        |FROM dom ORDER BY doc_id""".stripMargin,
    // encoding audit: same planted corruption bytes, same unicode-literal
    // and control-class regexes
    "x81_encoding_quality" ->
      """WITH c AS (SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0
        |         THEN SUBSTR(text, 1, 20) || ' Ã©vÃ©nement â€™ Â ' || SUBSTR(text, 21)
        |       WHEN doc_id % 13 = 5 THEN SUBSTR(text, 1, 10) || chr(7) || SUBSTR(text, 11)
        |       ELSE text END AS t
        |  FROM documents),
        |m AS (SELECT doc_id, t,
        |  LEN(regexp_extract_all(t, 'Ã©|Ã¨|Ã¤|Ã¶|Ã¼|â€™|â€œ|Â |�')) AS n_moji,
        |  LEN(regexp_extract_all(t, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS n_ctrl
        |  FROM c)
        |SELECT doc_id, CAST(n_moji AS INT) AS n_moji, CAST(n_ctrl AS INT) AS n_ctrl,
        |  CAST(LENGTH(t) AS INT) AS n_chars,
        |  ROUND(CAST(n_moji + n_ctrl AS DOUBLE) / GREATEST(LENGTH(t), 1), 6) AS moji_score,
        |  (n_moji > 0 OR n_ctrl > 0) AS corrupt
        |FROM m ORDER BY doc_id""".stripMargin,
    // vocab coverage: same md5-half vocabulary, same per-doc counts
    "x82_vocab_coverage" ->
      """WITH toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents),
        |v AS (SELECT DISTINCT token FROM toks WHERE SUBSTR(md5(token), 1, 1) < '8')
        |SELECT t.doc_id,
        |  COUNT(1) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  COUNT(DISTINCT CASE WHEN v.token IS NULL THEN t.token END) AS n_oov_types,
        |  ROUND(CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(1), 6) AS oov_rate
        |FROM toks t LEFT JOIN v ON v.token = t.token
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // topic assignment: centroids from the SAME 6dp-rounded mean pool, so
    // the argmax compares engine-identical inputs; planted +0.5 structure
    // keeps every margin far from FP noise
    "x83_topic_assign" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |s AS (SELECT vec_id, label, generate_subscripts(emb, 1) - 1 AS i, UNNEST(emb) AS x
        |  FROM e),
        |sv AS (SELECT vec_id, label, i, CASE WHEN i = label THEN x + 0.5 ELSE x END AS v
        |  FROM s),
        |c AS (SELECT label AS topic, i, ROUND(AVG(v), 6) AS m FROM sv GROUP BY 1, 2),
        |p AS (SELECT sv.vec_id, sv.label, c.topic,
        |  SUM(sv.v * c.m) AS dot, SUM(sv.v * sv.v) AS na, SUM(c.m * c.m) AS nb
        |  FROM sv JOIN c ON c.i = sv.i GROUP BY 1, 2, 3),
        |q AS (SELECT vec_id, label, topic, dot / (SQRT(na) * SQRT(nb)) AS cos FROM p),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, topic) AS rk
        |  FROM q)
        |SELECT r1.vec_id, r1.label, r1.topic,
        |  r1.topic = r1.label AS is_correct,
        |  ROUND(r1.cos, 6) AS best_cos,
        |  ROUND(r1.cos - r2.cos, 6) AS margin
        |FROM r r1 JOIN r r2 ON r2.vec_id = r1.vec_id AND r2.rk = 2
        |WHERE r1.rk = 1 ORDER BY r1.vec_id""".stripMargin,
    "x77_winnow" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS wt FROM documents),
        |f AS (SELECT doc_id, i - 1 AS pos, md5(ARRAY_TO_STRING(wt[i:i+3], ' ')) AS h
        |      FROM (SELECT doc_id, wt, UNNEST(RANGE(1, LEN(wt) - 2)) AS i
        |            FROM d WHERE LEN(wt) >= 4)),
        |n AS (SELECT doc_id, COUNT(1) AS nf FROM f GROUP BY 1),
        |g AS (SELECT f1.doc_id, f1.pos AS s, MIN(f2.h) AS minh
        |      FROM f f1
        |      JOIN f f2 ON f1.doc_id = f2.doc_id AND f2.pos BETWEEN f1.pos AND f1.pos + 3
        |      JOIN n ON n.doc_id = f1.doc_id
        |      WHERE f1.pos <= n.nf - 4
        |      GROUP BY 1, 2),
        |sel AS (SELECT g.doc_id, g.s, g.minh, MIN(f.pos) AS pos
        |        FROM g JOIN f ON f.doc_id = g.doc_id AND f.h = g.minh
        |                     AND f.pos BETWEEN g.s AND g.s + 3
        |        GROUP BY 1, 2, 3)
        |SELECT DISTINCT doc_id, pos, minh AS fp FROM sel ORDER BY doc_id, pos""".stripMargin,
    // audio segmentation: full replay — frames, 6dp-rounded rms gate,
    // gaps-and-islands, per-segment aggregates
    "x72_audio_segments" ->
      """WITH p AS (SELECT doc_id,
        |    SUBSTR(text, 1, 64) || '                ' || SUBSTR(text, 65, 1000000) AS text
        |  FROM documents),
        |f AS (SELECT doc_id, text, UNNEST(RANGE(0, LENGTH(text) // 8)) AS fi FROM p),
        |r AS (SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |    LIST_SUM(LIST_TRANSFORM(RANGE(1, 9),
        |      i -> ord(SUBSTR(text, CAST(fi * 8 + i AS INT), 1))
        |         * ord(SUBSTR(text, CAST(fi * 8 + i AS INT), 1)))) AS sq
        |  FROM f),
        |a AS (SELECT doc_id, frame_idx, sq FROM r
        |      WHERE ROUND(SQRT(CAST(sq AS DOUBLE) / 8.0), 6) >= 80.0),
        |g AS (SELECT doc_id, frame_idx, sq,
        |    frame_idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS grp
        |  FROM a),
        |seg AS (SELECT doc_id, MIN(frame_idx) AS start_frame, MAX(frame_idx) AS end_frame,
        |    COUNT(1) AS n_frames,
        |    ROUND(SQRT(CAST(SUM(sq) AS DOUBLE) / (COUNT(1) * 8.0)), 6) AS seg_rms
        |  FROM g GROUP BY doc_id, grp)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1 AS INT) AS seg_idx,
        |  start_frame, end_frame, n_frames, seg_rms
        |FROM seg ORDER BY doc_id, seg_idx""".stripMargin,
    // incremental fuzzy gate: the oracle replays the EXACT batch×ref
    // Jaccard join (valid because LSH recall is 1−1e-11 at the planted
    // and natural J values — see the query comment)
    "x73_incremental_fuzzy" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |ref AS (SELECT doc_id, text FROM base WHERE doc_id % 2 = 0),
        |twins AS (SELECT doc_id + 1000000 AS doc_id,
        |    ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[2:], ' ') AS text FROM ref),
        |batch AS (SELECT doc_id, text FROM base WHERE doc_id % 2 = 1
        |          UNION ALL SELECT * FROM twins),
        |bsh AS (SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh FROM batch),
        |rsh AS (SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh FROM ref),
        |binv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM bsh),
        |rinv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM rsh),
        |pairs AS (
        |  SELECT b.doc_id AS batch_id, r.doc_id AS ref_id
        |  FROM binv b JOIN rinv r ON b.s = r.s
        |  GROUP BY b.doc_id, r.doc_id, b.nsh, r.nsh
        |  HAVING CAST(COUNT(1) AS DOUBLE) / CAST(b.nsh + r.nsh - COUNT(1) AS DOUBLE) >= 0.6),
        |v AS (SELECT batch_id, MIN(ref_id) AS dup_of, COUNT(1) AS n_ref_matches
        |      FROM pairs GROUP BY 1)
        |SELECT b.doc_id AS id, v.dup_of, COALESCE(v.n_ref_matches, 0) AS n_ref_matches,
        |  v.dup_of IS NULL AS kept
        |FROM batch b LEFT JOIN v ON v.batch_id = b.doc_id ORDER BY 1""".stripMargin,
    // compression gate: zlib lengths are not engine-portable — the
    // oracle pins the corpus layout and the separation booleans
    "x74_compression_gate" ->
      """SELECT (SELECT COUNT(1) FROM documents)
        |     + (SELECT COUNT(1) FROM documents WHERE doc_id % 10 = 0) AS n_docs,
        |  (SELECT COUNT(1) FROM documents WHERE doc_id % 10 = 0) AS n_planted,
        |  TRUE AS separation_ok""".stripMargin,
    // windowed co-occurrence: ordered (w_i, w_{i+ds}) pairs for ds 1..3
    "x69_cooccurrence" ->
      """WITH docs AS (SELECT STRING_SPLIT(text, ' ') AS w FROM documents),
        |t AS (SELECT UNNEST(w) AS tok FROM docs),
        |uni AS (SELECT tok, COUNT(1) AS c FROM t GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_tokens FROM t),
        |bi AS (
        |  SELECT w1, w2, COUNT(1) AS c12 FROM (
        |    SELECT w[i] AS w1, w[i + ds] AS w2
        |    FROM (SELECT w, UNNEST(RANGE(1, LEN(w))) AS i FROM docs WHERE LEN(w) >= 2)
        |    CROSS JOIN (SELECT UNNEST(RANGE(1, 4)) AS ds)
        |    WHERE i + ds <= LEN(w))
        |  GROUP BY 1, 2 HAVING COUNT(1) >= 3)
        |SELECT bi.w1, bi.w2, bi.c12,
        |  ROUND(LN((CAST(bi.c12 AS DOUBLE) * CAST(tot.n_tokens AS DOUBLE)) / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6) AS pmi
        |FROM bi JOIN uni u1 ON u1.tok = bi.w1 JOIN uni u2 ON u2.tok = bi.w2 CROSS JOIN tot
        |ORDER BY pmi DESC, bi.w1, bi.w2 LIMIT 100""".stripMargin,
    // negatives: rank replay (assignShards' bucket-prefixed order ==
    // plain (md5, id) order), the same 7-hex uniform draw, same filters
    "x70_sample_negatives" ->
      s"""WITH r AS (SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rank
        |  FROM documents),
        |nn AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_docs FROM documents),
        |dj AS (SELECT doc_id, lang AS domain, CAST(j AS INT) AS draw,
        |    md5(CAST(doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR)) AS h
        |  FROM documents CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS j)),
        |c AS (SELECT doc_id, domain, draw,
        |    CAST(FLOOR(($hashUniformSql) * n_docs) AS BIGINT) AS rank
        |  FROM dj CROSS JOIN nn)
        |SELECT c.doc_id, c.draw, r.doc_id AS neg_id, r.lang AS neg_domain
        |FROM c JOIN r ON r.rank = c.rank
        |WHERE r.doc_id != c.doc_id AND r.lang != c.domain
        |ORDER BY 1, 2""".stripMargin,
    // audio frames: integer Σx/Σx² replay over the ASCII byte plane
    "x71_audio_frames" ->
      """WITH f AS (SELECT doc_id, text,
        |    UNNEST(RANGE(0, LENGTH(text) // 8)) AS frame_idx FROM documents),
        |s AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |    LIST_SUM(LIST_TRANSFORM(RANGE(1, 9),
        |      i -> ord(SUBSTR(text, CAST(frame_idx * 8 + i AS INT), 1)))) AS sm,
        |    LIST_SUM(LIST_TRANSFORM(RANGE(1, 9),
        |      i -> ord(SUBSTR(text, CAST(frame_idx * 8 + i AS INT), 1))
        |         * ord(SUBSTR(text, CAST(frame_idx * 8 + i AS INT), 1)))) AS sq
        |  FROM f)
        |SELECT doc_id, frame_idx,
        |  ROUND(SQRT(CAST(sq AS DOUBLE) / 8.0), 6) AS rms,
        |  ROUND(CAST(sm AS DOUBLE) / 8.0, 6) AS mean
        |FROM s ORDER BY 1, 2""".stripMargin,
    // novelty: the bloom prefilter is exact by construction, so the
    // oracle is the plain relational left join on the 3-gram CTE
    "x67_novelty" ->
      """WITH sh AS (SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS g FROM documents),
        |ref AS (SELECT DISTINCT UNNEST(g) AS gram FROM sh WHERE doc_id % 3 = 0),
        |cg AS (SELECT doc_id, UNNEST(g) AS gram FROM sh)
        |SELECT cg.doc_id, COUNT(1) AS n_grams,
        |  CAST(SUM(CASE WHEN ref.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  ROUND(CAST(SUM(CASE WHEN ref.gram IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(1) AS DOUBLE), 6) AS novelty
        |FROM cg LEFT JOIN ref ON cg.gram = ref.gram
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // zipf: same five scalar sums, same expression structure before the
    // 6dp round; the top-500 cut is a deterministic total order
    "x68_zipf_profile" ->
      """WITH t AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, COUNT(1) AS c FROM t GROUP BY 1),
        |top AS (SELECT tok, c FROM f ORDER BY c DESC, tok LIMIT 500),
        |rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rank FROM top),
        |xy AS (SELECT c, LN(CAST(rank AS DOUBLE)) AS x, LN(CAST(c AS DOUBLE)) AS y FROM rk),
        |s AS (SELECT COUNT(1) AS n, MAX(c) AS top_count, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy FROM xy)
        |SELECT n AS n_ranks, top_count,
        |  ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        |  ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS intercept,
        |  ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy))
        |    / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
        |FROM s""".stripMargin,
    // pmi: exact long counts, ln of the same product/quotient order,
    // ROUND 6dp on both sides; the LIMIT cut orders on the rounded value
    "x62_pmi_collocations" ->
      """WITH d AS (SELECT STRING_SPLIT(text, ' ') AS w FROM documents),
        |t AS (SELECT UNNEST(w) AS tok FROM d),
        |uni AS (SELECT tok, COUNT(1) AS c FROM t GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_tokens FROM t),
        |bi AS (
        |  SELECT w1, w2, COUNT(1) AS c12 FROM (
        |    SELECT w[i] AS w1, w[i+1] AS w2
        |    FROM (SELECT w, UNNEST(RANGE(1, LEN(w))) AS i FROM d WHERE LEN(w) >= 2))
        |  GROUP BY 1, 2 HAVING COUNT(1) >= 3)
        |SELECT bi.w1, bi.w2, bi.c12,
        |  ROUND(LN((CAST(bi.c12 AS DOUBLE) * CAST(tot.n_tokens AS DOUBLE)) / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6) AS pmi
        |FROM bi JOIN uni u1 ON u1.tok = bi.w1 JOIN uni u2 ON u2.tok = bi.w2 CROSS JOIN tot
        |ORDER BY pmi DESC, bi.w1, bi.w2 LIMIT 100""".stripMargin,
    // mixture: √-weights (IEEE-exact both engines), floors on the same
    // double products, remainder picks by the md5-uniform rank
    "x63_epoch_mixture" ->
      s"""WITH c AS (SELECT lang AS domain, COUNT(1) AS n_docs FROM documents GROUP BY 1),
        |sw AS (SELECT SUM(SQRT(CAST(n_docs AS DOUBLE))) AS sum_w FROM c),
        |b AS (SELECT domain, n_docs,
        |    CAST(LEAST(FLOOR(600.0 * SQRT(CAST(n_docs AS DOUBLE)) / sum_w),
        |               FLOOR(1.5 * CAST(n_docs AS DOUBLE))) AS BIGINT) AS budget_docs
        |  FROM c CROSS JOIN sw),
        |e AS (SELECT domain, n_docs, budget_docs,
        |    CAST(FLOOR(CAST(budget_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS BIGINT) AS epochs,
        |    budget_docs - n_docs * CAST(FLOOR(CAST(budget_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS BIGINT) AS rem
        |  FROM b),
        |r AS (SELECT doc_id, lang AS domain, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |u AS (SELECT doc_id, domain, $hashUniformSql AS u FROM r),
        |rk AS (SELECT doc_id, domain,
        |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY u, doc_id) AS rk FROM u)
        |SELECT rk.doc_id, rk.domain,
        |  e.epochs + CASE WHEN rk.rk <= e.rem THEN 1 ELSE 0 END AS n_repeats
        |FROM rk JOIN e ON rk.domain = e.domain ORDER BY rk.doc_id""".stripMargin,
    // leakage split: x26's recursive-CC chain + the md5(component)
    // bucket CASE of the x21 split
    "x64_leakage_split" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
        |cliq AS (
        |  SELECT doc_id + 2000000 AS doc_id, text FROM base WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 4000000 AS doc_id, text FROM base WHERE doc_id % 50 = 0),
        |br AS (
        |  SELECT a.doc_id + 3000000 AS doc_id,
        |    ARRAY_TO_STRING(LIST_CONCAT(STRING_SPLIT(a.text, ' ')[21:40],
        |      STRING_SPLIT(b.text, ' ')[1:20]), ' ') AS text
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 100 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM cliq UNION ALL SELECT * FROM br),
        |docs AS (SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh FROM corpus),
        |inv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM docs),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
        |  HAVING CAST(COUNT(1) AS DOUBLE) / CAST(a.nsh + b.nsh - COUNT(1) AS DOUBLE) >= 0.25),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT u AS id, u AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |assigned AS (
        |  SELECT c.doc_id, COALESCE(p.component, c.doc_id) AS component
        |  FROM corpus c LEFT JOIN comp p ON c.doc_id = p.id),
        |sizes AS (SELECT component, COUNT(1) AS n_members FROM assigned GROUP BY 1)
        |SELECT a.doc_id, a.component, s.n_members, a.doc_id = a.component AS is_rep,
        |  CASE WHEN SUBSTR(md5(CAST(a.component AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |       WHEN SUBSTR(md5(CAST(a.component AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM assigned a JOIN sizes s ON a.component = s.component
        |ORDER BY a.doc_id""".stripMargin,
    // norm outliers: norms are sequential ascending-index sums (LIST_SUM
    // ↔ the native dot loop), μ/σ a 1-row aggregate; the planted gate
    // booleans sit ≥1.5σ from the threshold
    "x65_norm_outliers" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |corpus AS (
        |  SELECT vec_id, v FROM e
        |  UNION ALL
        |  SELECT vec_id + 100000, LIST_TRANSFORM(v, x -> x * 0.0) FROM e WHERE vec_id % 100 = 0
        |  UNION ALL
        |  SELECT vec_id + 200000, LIST_TRANSFORM(v, x -> x * 3.0) FROM e WHERE vec_id % 100 = 1),
        |n AS (SELECT vec_id, SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))) AS nrm FROM corpus),
        |st AS (SELECT AVG(nrm) AS mu, STDDEV_SAMP(nrm) AS sd FROM n)
        |SELECT vec_id, ROUND(nrm, 6) AS l2_norm,
        |  ROUND(CASE WHEN sd = 0 OR sd IS NULL THEN 0.0 ELSE (nrm - mu) / sd END, 6) AS z,
        |  ABS(CASE WHEN sd = 0 OR sd IS NULL THEN 0.0 ELSE (nrm - mu) / sd END) > 3.0 AS is_outlier
        |FROM n, st ORDER BY vec_id""".stripMargin,
    // mean pool: exact per-(label, index) averages, 6dp
    "x66_mean_pool" ->
      """WITH e AS (SELECT label AS grp, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cnt AS (SELECT grp, COUNT(1) AS n_vecs FROM e GROUP BY 1),
        |x AS (SELECT grp, UNNEST(v) AS val, generate_subscripts(v, 1) - 1 AS i FROM e),
        |m AS (SELECT grp, i, ROUND(AVG(val), 6) AS m FROM x GROUP BY 1, 2)
        |SELECT m.grp AS "group", cnt.n_vecs, CAST(m.i AS INT) AS i, m.m
        |FROM m JOIN cnt USING (grp) ORDER BY 1, 3""".stripMargin,
    "x1_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(1) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "x2_token_count" ->
      """SELECT doc_id,
        |  LEN(STRING_SPLIT(text, ' ')) AS n_tok,
        |  LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tok_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x3_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
        |    CAST(LENGTH(text) AS DOUBLE) AS nchar,
        |    CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS nstop,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS npunct
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  (nchar - (CAST(n_tokens AS DOUBLE) - 1)) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
        |  nstop / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
        |  npunct / nchar AS punct_ratio,
        |  (LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) + LEAST(nstop / CAST(n_tokens AS DOUBLE) * 5.0, 1.0)) / 2.0
        |    * (1.0 - LEAST(npunct / nchar * 10.0, 1.0)) AS quality
        |FROM f ORDER BY doc_id""".stripMargin,
    "x4_langid" ->
      """WITH s AS (
        |  SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks FROM documents),
        |sc AS (
        |  SELECT doc_id, lang,
        |    LEN(LIST_FILTER(toks, t -> t IN ('the','and','of'))) AS s_en,
        |    LEN(LIST_FILTER(toks, t -> t IN ('el','la','de'))) AS s_es,
        |    LEN(LIST_FILTER(toks, t -> t IN ('der','die','und'))) AS s_de,
        |    LEN(LIST_FILTER(toks, t -> t IN ('le','les','des'))) AS s_fr,
        |    LEN(LIST_FILTER(toks, t -> t IN ('的','是','在'))) AS s_zh
        |  FROM s)
        |SELECT doc_id, lang,
        |  CASE WHEN s_en + s_es + s_de + s_fr + s_zh = 0 THEN 'und'
        |       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin,
    "x5_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x6_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh
        |  FROM documents),
        |inv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM docs),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.nsh AS n_a, b.nsh AS n_b,
        |    COUNT(1) AS inter
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b,
        |  ROUND(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
        |FROM pairs
        |WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,
    "x9_knn_bruteforce" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id qid, v qv FROM e WHERE vec_id < 10),
        |s AS (SELECT qid AS query_id, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(qv, v) AS sim
        |      FROM q, e WHERE e.vec_id != qid),
        |r AS (SELECT query_id, neighbor_id,
        |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |      FROM s)
        |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "x7_minhash_lsh" ->
      """WITH docs AS (
        |  SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh
        |  FROM documents WHERE doc_id < 500),
        |inv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM docs),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.nsh AS n_a, b.nsh AS n_b,
        |    COUNT(1) AS inter
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |j AS (SELECT CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) AS jac
        |      FROM pairs
        |      WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.5)
        |SELECT COUNT(1) AS n_strong, TRUE AS recall_ok
        |FROM j""".stripMargin,
    // x10's oracle RE-VERIFIES the planted ground truth: each perturbed
    // query's exact nearest neighbor (recomputed brute-force in DuckDB)
    // must be its source row — recall1_ok is proven, not assumed.
    "x10_knn_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id + 100000 AS qid,
        |        list_transform(v, x -> $perturbSql) AS qv
        |      FROM e WHERE vec_id < 50),
        |r AS (SELECT qid, e.vec_id AS nid,
        |        ROW_NUMBER() OVER (PARTITION BY qid
        |          ORDER BY list_cosine_similarity(qv, v) DESC, e.vec_id) AS rn
        |      FROM q, e)
        |SELECT COUNT(1) AS n_queries, BOOL_AND(nid = qid - 100000) AS recall1_ok
        |FROM r WHERE rn = 1""".stripMargin,
    // x8: simhash values are xxhash64-based (not portable), so the oracle
    // asserts the deterministic conservation row — the subset count is
    // replayed, pairs_match is TRUE by the pigeonhole theorem (see query).
    "x8_simhash" ->
      "SELECT COUNT(1) AS n_docs, TRUE AS pairs_match FROM documents WHERE doc_id < 500",
    // x14's oracle REBUILDS the planted corpus with the identical
    // perturbation arithmetic and recomputes the exact strong-pair twin —
    // n_strong is proven equal across engines, recall_ok asserted TRUE.
    "x14_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |p AS (SELECT vec_id + 100000 AS vec_id,
        |        list_transform(v, x -> $perturbSql) AS v
        |      FROM e WHERE vec_id < 100),
        |a AS (SELECT vec_id, v FROM e WHERE vec_id < 500 UNION ALL SELECT vec_id, v FROM p),
        |s AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
        |      FROM a x JOIN a y ON x.vec_id < y.vec_id
        |      WHERE list_cosine_similarity(x.v, y.v) >= 0.95)
        |SELECT COUNT(1) AS n_strong, TRUE AS recall_ok FROM s""".stripMargin,
    "x15_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id + 100000 AS qid,
        |        list_transform(v, x -> $perturbSql) AS qv
        |      FROM e WHERE vec_id < 50),
        |r AS (SELECT qid, e.vec_id AS nid,
        |        ROW_NUMBER() OVER (PARTITION BY qid
        |          ORDER BY list_cosine_similarity(qv, v) DESC, e.vec_id) AS rn
        |      FROM q, e)
        |SELECT COUNT(1) AS n_queries, BOOL_AND(nid = qid - 100000) AS recall1_ok
        |FROM r WHERE rn = 1""".stripMargin,
    "x18_profile" ->
      """SELECT COUNT(1) AS n_rows,
        |  COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS o_orderkey_nulls,
        |  MIN(o_orderkey) AS o_orderkey_min, MAX(o_orderkey) AS o_orderkey_max,
        |  COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS o_custkey_nulls,
        |  MIN(o_custkey) AS o_custkey_min, MAX(o_custkey) AS o_custkey_max,
        |  COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS o_orderstatus_nulls,
        |  COUNT(DISTINCT o_orderstatus) AS o_orderstatus_distinct,
        |  COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS o_totalprice_nulls,
        |  MIN(o_totalprice) AS o_totalprice_min, MAX(o_totalprice) AS o_totalprice_max
        |FROM orders""".stripMargin,
    "x19_corpus_clean" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
        |    CAST(LENGTH(text) AS DOUBLE) AS nchar,
        |    CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) AS nstop,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS npunct,
        |    STRING_SPLIT(text, ' ') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, text, n_tokens,
        |    (LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) + LEAST(nstop / CAST(n_tokens AS DOUBLE) * 5.0, 1.0)) / 2.0
        |      * (1.0 - LEAST(npunct / nchar * 10.0, 1.0)) AS quality,
        |    LEN(LIST_FILTER(toks, t -> t IN ('the','and','of'))) AS s_en,
        |    LEN(LIST_FILTER(toks, t -> t IN ('el','la','de'))) AS s_es,
        |    LEN(LIST_FILTER(toks, t -> t IN ('der','die','und'))) AS s_de,
        |    LEN(LIST_FILTER(toks, t -> t IN ('le','les','des'))) AS s_fr,
        |    LEN(LIST_FILTER(toks, t -> t IN ('的','是','在'))) AS s_zh
        |  FROM f),
        |lp AS (
        |  SELECT doc_id, text, n_tokens, quality,
        |    CASE WHEN s_en + s_es + s_de + s_fr + s_zh = 0 THEN 'und'
        |         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |         WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |         WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS lang_pred
        |  FROM q
        |  WHERE quality >= 0.3 AND n_tokens >= 20),
        |d AS (
        |  SELECT md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp,
        |    MIN(doc_id) AS keep_id, MIN(lang_pred) AS lang_pred
        |  FROM lp GROUP BY 1)
        |SELECT lang_pred, COUNT(1) AS n_docs, MIN(keep_id) AS first_doc
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "x17_resample" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', MIN(ts)) AS mn, MAX(ts) AS mx
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT user_id, UNNEST(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 HOUR)) AS gts
        |  FROM b)
        |SELECT g.user_id, epoch_ms(gts) AS grid_ms, e.value
        |FROM g ASOF LEFT JOIN events e
        |  ON g.user_id = e.user_id AND g.gts >= e.ts
        |ORDER BY g.user_id, grid_ms""".stripMargin,
    "x16_token_freq" ->
      """SELECT token, COUNT(1) AS n
        |FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "x11_embedding_stats" ->
      """SELECT label, COUNT(1) AS n, MIN(vec_id) AS min_id, MAX(vec_id) AS max_id,
        |  MAX(LEN(embedding)) AS dim
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
    "x12_multimodal_meta" ->
      """SELECT doc_id, 'media/' || source AS media_type,
        |  CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS INT) AS byte_len, 3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x20_repetition" ->
      """WITH s AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks, text FROM documents),
        |tc AS (
        |  SELECT doc_id, tok, COUNT(1) AS c
        |  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM s) GROUP BY 1, 2),
        |t AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    COUNT(1) AS n_distinct, MAX(c) AS top_c
        |  FROM tc GROUP BY 1),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN LEN(toks) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
        |           i -> ARRAY_TO_STRING(toks[i:i+2], ' '))
        |    END AS sh
        |  FROM s)
        |SELECT t.doc_id, n_tokens,
        |  ROUND(1 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_ratio,
        |  ROUND(CAST(top_c AS DOUBLE) / n_tokens, 6) AS top_token_ratio,
        |  ROUND(1 - CAST(LEN(LIST_DISTINCT(sh)) AS DOUBLE) / LEN(sh), 6) AS dup_3gram_ratio
        |FROM t JOIN g ON t.doc_id = g.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "x21_hash_split" ->
      """SELECT CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |            WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(1) AS n_docs,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "x22_seq_pack" ->
      """WITH d AS (
        |  SELECT lang, doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (
        |  SELECT lang, n_tok,
        |    CAST(FLOOR(COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT) AS seq_id
        |  FROM d)
        |SELECT lang, MAX(seq_id) + 1 AS n_seqs, COUNT(1) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  ROUND(CAST(SUM(n_tok) AS DOUBLE) / ((MAX(seq_id) + 1) * 2048), 6) AS fill_ratio
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // NB: SUBSTR/ORD here index CHARACTERS while the Spark side subsamples
    // UTF-8 BYTES — equivalent only because this corpus is pure ASCII
    // (verified across all testdata scales); a byte-exact twin would need
    // DuckDB blob indexing
    "x23_media_resize" ->
      """WITH r AS (
        |  SELECT doc_id, LENGTH(text) AS len,
        |    (LENGTH(text) + 3) // 4 AS resized_len
        |  FROM documents),
        |b AS (
        |  SELECT r.doc_id,
        |    ORD(SUBSTR(d.text, 1 + i * 4, 1)) // 32 AS bin
        |  FROM r JOIN documents d ON r.doc_id = d.doc_id,
        |    UNNEST(RANGE(0, r.resized_len)) AS t(i))
        |SELECT r.doc_id, CAST(r.resized_len AS INT) AS resized_len,
        |  CAST(COUNT(DISTINCT b.bin) AS INT) AS occupied_bins
        |FROM r LEFT JOIN b ON r.doc_id = b.doc_id
        |GROUP BY 1, r.resized_len ORDER BY 1""".stripMargin,
    // planted-contamination twin: benchmark docs with doc_id % 5 = 0
    // re-enter the corpus under doc_id + 10000000 (see the Spark side)
    "x24_decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    LIST_DISTINCT(
        |      CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 8 THEN [text]
        |           ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 6),
        |             i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+7], ' '))
        |      END) AS grams
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 97 != 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, UNNEST(grams) AS gram FROM g
        |  WHERE doc_id % 97 = 0 AND doc_id % 5 = 0),
        |b AS (SELECT doc_id AS bench_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 97 = 0)
        |SELECT c.doc_id, MIN(b.bench_id) AS bench_id, COUNT(1) AS n_hits
        |FROM c JOIN b ON c.gram = b.gram
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // NB: share constants are CAST AS DOUBLE — DuckDB parses bare decimal
    // literals as exact DECIMAL, whose FLOOR can differ from Spark's
    // double arithmetic at boundaries.
    "x25_domain_mix" ->
      """WITH d AS (
        |  SELECT source AS domain,
        |    CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens, COUNT(1) AS n_domains FROM d),
        |m AS (
        |  SELECT domain, tokens,
        |    CAST(FLOOR(CASE WHEN domain = 'src0' THEN CAST(0.01 AS DOUBLE)
        |                    WHEN domain = 'src1' THEN CAST(0.10 AS DOUBLE)
        |                    ELSE CAST(1.0 AS DOUBLE) / n_domains END * total_tokens) AS BIGINT)
        |      AS target_tokens
        |  FROM d, t)
        |SELECT domain, tokens, target_tokens,
        |  ROUND(LEAST(CAST(1.0 AS DOUBLE), CAST(target_tokens AS DOUBLE) / tokens), 6) AS sample_rate
        |FROM m ORDER BY domain""".stripMargin,
    // components by recursive transitive closure over the same exact
    // Jaccard edges the Spark side uses (UNION dedups, so cycles terminate)
    "x26_dedup_clusters" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
        |cliq AS (
        |  SELECT doc_id + 2000000 AS doc_id, text FROM base WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 4000000 AS doc_id, text FROM base WHERE doc_id % 50 = 0),
        |br AS (
        |  SELECT a.doc_id + 3000000 AS doc_id,
        |    ARRAY_TO_STRING(LIST_CONCAT(STRING_SPLIT(a.text, ' ')[21:40],
        |      STRING_SPLIT(b.text, ' ')[1:20]), ' ') AS text
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 100 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM cliq UNION ALL SELECT * FROM br),
        |docs AS (SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh FROM corpus),
        |inv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM docs),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
        |  HAVING CAST(COUNT(1) AS DOUBLE) / CAST(a.nsh + b.nsh - COUNT(1) AS DOUBLE) >= 0.25),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT u AS id, u AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |assigned AS (
        |  SELECT c.doc_id, COALESCE(p.component, c.doc_id) AS component
        |  FROM corpus c LEFT JOIN comp p ON c.doc_id = p.id),
        |sizes AS (SELECT component, COUNT(1) AS n_members FROM assigned GROUP BY 1)
        |SELECT a.doc_id, a.component, s.n_members, a.doc_id = a.component AS is_rep
        |FROM assigned a JOIN sizes s ON a.component = s.component
        |ORDER BY a.doc_id""".stripMargin,
    // the same planted-PII construction + the same RE2-safe regex chain;
    // md5 of the scrubbed text checks the actual replacement output
    "x27_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.org from 10.' ||
        |      CAST(doc_id % 254 AS VARCHAR) || '.0.7 call 555-867-5309' AS text
        |  FROM documents),
        |r1 AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM p),
        |r2 AS (
        |  SELECT doc_id, text, t1,
        |    regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
        |  FROM r1),
        |f AS (
        |  SELECT doc_id, text, t1, t2,
        |    regexp_replace(t2, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
        |  FROM r2)
        |SELECT doc_id,
        |  LEN(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  LEN(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |  LEN(regexp_extract_all(t2, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
        |  md5(redacted) AS fp,
        |  LENGTH(redacted) AS redacted_len
        |FROM f ORDER BY doc_id""".stripMargin,
    // x25's rate arithmetic replayed, then the md5-uniform keep decision
    // per row — the share constants CAST AS DOUBLE for the same reason as
    // x25 (DuckDB decimal literals vs Spark doubles)
    "x28_stratified_sample" ->
      s"""WITH d AS (
        |  SELECT source AS domain,
        |    CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens, COUNT(1) AS n_domains FROM d),
        |m AS (
        |  SELECT domain, tokens,
        |    CAST(FLOOR(CASE WHEN domain = 'src0' THEN CAST(0.01 AS DOUBLE)
        |                    WHEN domain = 'src1' THEN CAST(0.10 AS DOUBLE)
        |                    ELSE CAST(1.0 AS DOUBLE) / n_domains END * total_tokens) AS BIGINT)
        |      AS target_tokens
        |  FROM d, t),
        |r AS (SELECT domain, tokens, target_tokens,
        |        LEAST(CAST(1.0 AS DOUBLE), CAST(target_tokens AS DOUBLE) / tokens) AS sample_rate
        |      FROM m),
        |u AS (SELECT doc_id, source, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok,
        |        md5(CAST(doc_id AS VARCHAR)) AS h
        |      FROM documents),
        |k AS (
        |  SELECT u.source AS domain, COUNT(1) AS n_kept, CAST(SUM(u.n_tok) AS BIGINT) AS kept_tokens
        |  FROM u JOIN r ON u.source = r.domain
        |  WHERE $hashUniformSql < r.sample_rate
        |  GROUP BY 1)
        |SELECT r.domain, COALESCE(k.n_kept, 0) AS n_kept,
        |  COALESCE(k.kept_tokens, 0) AS kept_tokens, r.target_tokens,
        |  ROUND(CAST(COALESCE(k.kept_tokens, 0) AS DOUBLE) / CAST(r.target_tokens AS DOUBLE), 6)
        |    AS fill_vs_target
        |FROM r LEFT JOIN k ON r.domain = k.domain
        |ORDER BY r.domain""".stripMargin,
    // percentile_disc semantics: cutoff = k-th smallest VALUE,
    // k = max(1, ceil(q*n)) — tie-stable because the filter compares values
    "x29_quantile_filter" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |rk AS (
        |  SELECT lang, n_tok,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tok) AS rn,
        |    COUNT(1) OVER (PARTITION BY lang) AS n
        |  FROM d),
        |c AS (SELECT lang, n_tok AS cutoff FROM rk
        |      WHERE rn = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))),
        |k AS (
        |  SELECT d.lang, COUNT(1) AS n_kept, CAST(SUM(d.n_tok) AS BIGINT) AS kept_tokens
        |  FROM d JOIN c ON d.lang = c.lang WHERE d.n_tok >= c.cutoff GROUP BY 1),
        |t AS (SELECT lang, COUNT(1) AS n_total FROM d GROUP BY 1)
        |SELECT t.lang, t.n_total, c.cutoff, k.n_kept, k.kept_tokens
        |FROM t JOIN c ON t.lang = c.lang JOIN k ON t.lang = k.lang
        |ORDER BY t.lang""".stripMargin,
    // the same planted-boilerplate construction; counts by md5 digest and
    // reassembles kept lines in original order — md5 of the result checks
    // the exact reassembled text
    "x30_line_dedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'subscribe now and click here' ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'all rights reserved' ELSE '' END ||
        |    CASE WHEN doc_id % 250 = 1 THEN chr(10) || 'rare twin line' ELSE '' END AS text
        |  FROM documents),
        |sp AS (SELECT doc_id, STRING_SPLIT(text, chr(10)) AS lines FROM d),
        |l AS (
        |  SELECT doc_id, i AS pos, lines[i] AS line
        |  FROM sp, UNNEST(RANGE(1, LEN(lines) + 1)) AS u(i)),
        |c AS (SELECT md5(line) AS fp, COUNT(1) AS n_occ FROM l GROUP BY 1),
        |j AS (SELECT l.doc_id, l.pos, l.line, c.n_occ FROM l JOIN c ON md5(l.line) = c.fp)
        |SELECT doc_id, COUNT(1) AS n_lines,
        |  COUNT(1) FILTER (WHERE n_occ < 3) AS n_kept,
        |  md5(COALESCE(STRING_AGG(line, chr(10) ORDER BY pos) FILTER (WHERE n_occ < 3), ''))
        |    AS fp_clean
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // RANGE(0, n, step) = Spark sequence(0, n-1, step); list slicing and
    // Spark's slice() clamp identically at the array end
    "x31_chunk_tokens" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS sp FROM documents),
        |s AS (SELECT doc_id, sp, UNNEST(RANGE(0, LEN(sp), 48)) AS start FROM t),
        |c AS (
        |  SELECT doc_id, CAST(start // 48 AS INT) AS chunk_idx, CAST(start AS BIGINT) AS start,
        |    CAST(LEN(sp[start + 1 : start + 64]) AS BIGINT) AS n_tok,
        |    md5(ARRAY_TO_STRING(sp[start + 1 : start + 64], ' ')) AS fp
        |  FROM s WHERE start = 0 OR start + 16 < LEN(sp))
        |SELECT doc_id, chunk_idx, start, n_tok, fp
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // same planted phrases; windows via RANGE(0, LEN-7) = Spark's
    // T-k+1 window starts; coverage expanded relationally (one row per
    // covered token index) instead of nested lambdas, STRING_AGG ORDER BY
    // restores token order
    "x34_span_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' please subscribe to our newsletter for daily updates and offers today'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 5
        |      THEN ' this content is licensed under creative commons attribution terms'
        |      ELSE '' END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS sp FROM d),
        |w AS (
        |  SELECT doc_id, u.i AS start, md5(ARRAY_TO_STRING(sp[u.i + 1 : u.i + 8], ' ')) AS fp
        |  FROM t, UNNEST(RANGE(0, LEN(sp) - 7)) AS u(i)),
        |dup AS (SELECT fp FROM w GROUP BY fp HAVING COUNT(1) >= 2),
        |dr AS (SELECT w.doc_id, w.start FROM w JOIN dup USING (fp)),
        |cov AS (
        |  SELECT DISTINCT dr.doc_id, c.i
        |  FROM dr, UNNEST(RANGE(dr.start, dr.start + 8)) AS c(i)),
        |tok AS (
        |  SELECT t.doc_id, u.i, sp[u.i + 1] AS tk
        |  FROM t, UNNEST(RANGE(0, LEN(sp))) AS u(i)),
        |kept AS (
        |  SELECT tok.doc_id, tok.i, tok.tk
        |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.i
        |  WHERE cov.i IS NULL),
        |agg AS (
        |  SELECT doc_id, COUNT(1) AS n_kept, STRING_AGG(tk, ' ' ORDER BY i) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(LEN(t.sp) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(COALESCE(a.text, '')) AS fp_clean
        |FROM t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    // identical double arithmetic (scale = max|v|/127 computed the same
    // way), half-up via FLOOR(x+0.5) in both engines — every compared
    // value is an exact integer
    "x32_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v, LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) AS maxabs FROM e),
        |q AS (
        |  SELECT vec_id, v, maxabs,
        |    LIST_TRANSFORM(v, x -> CASE WHEN maxabs = 0 THEN 0
        |      ELSE CAST(FLOOR(x / (maxabs / 127.0) + 0.5) AS BIGINT) END) AS qv
        |  FROM m)
        |SELECT vec_id, CAST(LEN(qv) AS INT) AS n_dims,
        |  CAST(LIST_SUM(qv) AS BIGINT) AS q_sum,
        |  CAST(LIST_SUM(LIST_TRANSFORM(qv, x -> x * x)) AS BIGINT) AS q_sumsq,
        |  CAST(LIST_MIN(qv) AS BIGINT) AS q_min,
        |  CAST(LIST_MAX(qv) AS BIGINT) AS q_max,
        |  CASE WHEN maxabs = 0 THEN 0 ELSE
        |    CAST(FLOOR(LIST_MAX(LIST_TRANSFORM(RANGE(1, LEN(qv) + 1),
        |      i -> ABS(qv[i] * (maxabs / 127.0) - v[i]))) / maxabs * 1000000.0) AS BIGINT) END
        |    AS err_ppm
        |FROM q ORDER BY vec_id""".stripMargin,
    // same normalized-digest chain as x1; LEFT JOIN ... IS NULL is the
    // anti-join; n_copies counts within the incoming batch only
    "x33_incremental_dedup" ->
      """WITH ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |inc AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 2 = 1 AND doc_id % 5 = 1),
        |nf AS (SELECT md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp, doc_id
        |       FROM inc),
        |rf AS (SELECT DISTINCT md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp
        |       FROM ref)
        |SELECT nf.fp, MIN(nf.doc_id) AS keep_id, COUNT(1) AS n_copies
        |FROM nf LEFT JOIN rf ON nf.fp = rf.fp
        |WHERE rf.fp IS NULL
        |GROUP BY nf.fp ORDER BY keep_id""".stripMargin,
    // the Bloom prefilter is invisible in the result: the oracle is the
    // same exact anti-join as x33, on the x35 residue split
    "x35_bloom_incremental" ->
      """WITH ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        |inc AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 0),
        |nf AS (SELECT md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp, doc_id
        |       FROM inc),
        |rf AS (SELECT DISTINCT md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp
        |       FROM ref)
        |SELECT nf.fp, MIN(nf.doc_id) AS keep_id, COUNT(1) AS n_copies
        |FROM nf LEFT JOIN rf ON nf.fp = rf.fp
        |WHERE rf.fp IS NULL
        |GROUP BY nf.fp ORDER BY keep_id""".stripMargin,
    // x37's oracle rebuilds the planted corpus and recomputes the exact
    // strong-pair twin; every strong pair's larger member is planted
    // (drops_planted_only derived independently), recall_ok asserted TRUE
    "x37_semantic_dedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings WHERE vec_id < 500),
        |p AS (SELECT vec_id + 200000 AS vec_id,
        |        list_transform(v, x -> $perturbSql) AS v
        |      FROM e WHERE vec_id < 100),
        |a AS (SELECT * FROM e UNION ALL SELECT * FROM p),
        |s AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
        |      FROM a x JOIN a y ON x.vec_id < y.vec_id
        |      WHERE list_cosine_similarity(x.v, y.v) >= 0.95)
        |SELECT (SELECT COUNT(1) FROM a) AS n_docs,
        |  COUNT(1) AS n_strong,
        |  BOOL_AND(id_b >= 200000) AS drops_planted_only,
        |  TRUE AS recall_ok
        |FROM s""".stripMargin,
    // BM25: same Lucene-idf formula, k1=1.2 b=0.75 inlined (tf*(k1+1) =
    // tf*2.2); ln natural in both engines; integer tf/df/dl keep
    // inputs exact, score rounded 6dp
    "x38_bm25" ->
      """WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
        |stats AS (SELECT COUNT(1) AS n, AVG(LEN(tk)) AS avgdl FROM toks),
        |flat AS (SELECT doc_id, LEN(tk) AS dl, UNNEST(tk) AS term FROM toks),
        |hits AS (SELECT doc_id, dl, term, COUNT(1) AS tf FROM flat
        |         WHERE term IN ('spark','window','merge') GROUP BY 1,2,3),
        |dfreq AS (SELECT term, COUNT(1) AS df FROM hits GROUP BY 1)
        |SELECT doc_id, COUNT(1) AS n_matched,
        |  ROUND(SUM(LN(1 + (n - df + 0.5)/(df + 0.5)) * (tf * 2.2)
        |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
        |FROM hits JOIN dfreq USING (term) CROSS JOIN stats
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // TF-IDF top-3: integer tf/df -> tf*ln(N/df) computes to the same
    // double in both engines; ties (equal tf,df) break by term
    "x39_tfidf_terms" ->
      """WITH tf AS (SELECT doc_id, tok AS term, COUNT(1) AS tf
        |            FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
        |            GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(1) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(1) AS n FROM documents),
        |scored AS (SELECT doc_id, term, tf * LN(CAST(n AS DOUBLE) / df) AS s
        |           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rank, s
        |      FROM scored)
        |SELECT doc_id, term, CAST(rank AS INT) AS rank, ROUND(s, 6) AS score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // quantized ANN: x32's quantization formula -> integer-exact approx
    // cosine -> shortlist 20 -> exact rescore top 5; ties by neighbor id
    "x42_knn_quantized" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |m AS (SELECT vec_id, v, LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) AS maxabs FROM e),
        |qz AS (SELECT vec_id, v,
        |    LIST_TRANSFORM(v, x -> CASE WHEN maxabs = 0 THEN 0.0
        |      ELSE CAST(FLOOR(x / (maxabs / 127.0) + 0.5) AS DOUBLE) END) AS qv
        |  FROM m),
        |q AS (SELECT vec_id AS qid, v AS query_v, qv AS query_q FROM qz WHERE vec_id < 10),
        |s AS (SELECT qid AS query_id, z.vec_id AS neighbor_id, z.v AS cv, query_v,
        |        LIST_COSINE_SIMILARITY(query_q, z.qv) AS approx
        |      FROM q, qz z WHERE z.vec_id != qid),
        |sl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx DESC, neighbor_id) AS ar
        |       FROM s),
        |r AS (SELECT query_id, neighbor_id,
        |        LIST_COSINE_SIMILARITY(query_v, cv) AS sim
        |      FROM sl WHERE ar <= 20),
        |f AS (SELECT query_id, neighbor_id, sim,
        |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |      FROM r)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ROUND(sim, 6) AS sim
        |FROM f WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // exact-k sample: same md5-ranked draw
    "x43_sample_exact_k" ->
      """WITH r AS (SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        |  FROM documents)
        |SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
        |FROM r WHERE sample_rank <= 3 ORDER BY lang, sample_rank""".stripMargin,

    // batched bm25: same Lucene-idf formula; df = docs containing the
    // term among hits (query-independent); rank on the ROUNDED score
    "x44_bm25_topk" ->
      """WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
        |qd AS (SELECT DISTINCT doc_id AS query_id, UNNEST(tk[1:3]) AS term
        |       FROM toks WHERE doc_id < 3),
        |stats AS (SELECT COUNT(1) AS n, AVG(LEN(tk)) AS avgdl FROM toks),
        |flat AS (SELECT doc_id, LEN(tk) AS dl, UNNEST(tk) AS term FROM toks),
        |hits AS (SELECT query_id, f.doc_id, dl, term, COUNT(1) AS tf
        |         FROM flat f JOIN qd USING (term) GROUP BY 1, 2, 3, 4),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
        |s AS (SELECT query_id, doc_id, COUNT(1) AS n_matched,
        |        ROUND(SUM(LN(1 + (n - df + 0.5)/(df + 0.5)) * (tf * 2.2)
        |            / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
        |      FROM hits JOIN dfreq USING (term) CROSS JOIN stats GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, n_matched, score,
        |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        |      FROM s)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_matched, score
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // perplexity gate: same add-one bigram model, P(w2|w1) =
    // (c(w1,w2)+1)/(c(w1)+V); every doc here has >=2 tokens so the
    // bigram-less floor path never fires at this SF
    "x45_perplexity_gate" ->
      """WITH tr AS (SELECT STRING_SPLIT(text, ' ') AS t FROM documents WHERE doc_id % 10 = 0),
        |trbi AS (SELECT t, UNNEST(RANGE(1, LEN(t))) AS i FROM tr),
        |big AS (SELECT t[i] AS w1, t[i+1] AS w2, COUNT(1) AS cb FROM trbi GROUP BY 1, 2),
        |uni AS (SELECT w1, COUNT(1) AS cu FROM (SELECT UNNEST(t) AS w1 FROM tr) GROUP BY 1),
        |v AS (SELECT COUNT(1) AS v FROM uni),
        |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
        |dbi AS (SELECT doc_id, t, UNNEST(RANGE(1, LEN(t))) AS i FROM d),
        |s AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM dbi),
        |lp AS (SELECT doc_id, LN((COALESCE(cb, 0) + 1.0) / (COALESCE(cu, 0) + v)) AS lp
        |       FROM s LEFT JOIN big USING (w1, w2) LEFT JOIN uni USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_bigrams,
        |  ROUND(AVG(lp), 6) AS avg_logprob,
        |  ROUND(AVG(lp), 6) >= -4.0 AS kept
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // normalized dedup: identical jitter planting; the oracle normalizes
    // with the same explicit [ \t\n\r]+ class the native kernel implements
    "x46_normalized_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, UPPER('  ' || REPLACE(text, ' ', '  ') || ' ')
        |  FROM documents WHERE doc_id % 4 = 0)
        |SELECT md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(1) AS n_copies
        |FROM corpus GROUP BY 1 ORDER BY 1""".stripMargin,

    // cdc chunks: boundary after 1-based token e (e in [w, len-1]) when
    // the window md5's first hex char is '0'; chunk_idx = running count
    // of breaks at or before each token; fp = md5 of the rejoined chunk
    "x47_cdc_chunks" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS sp FROM documents),
        |b AS (SELECT doc_id, u.i AS e
        |      FROM t, UNNEST(RANGE(8, LEN(sp))) AS u(i)
        |      WHERE SUBSTR(md5(ARRAY_TO_STRING(sp[u.i - 7 : u.i], ' ')), 1, 1) = '0'),
        |tok AS (SELECT doc_id, u.i AS j, sp[u.i] AS tk
        |        FROM t, UNNEST(RANGE(1, LEN(sp) + 1)) AS u(i)),
        |f AS (SELECT tok.doc_id, tok.j, tok.tk,
        |        CASE WHEN b.e IS NULL THEN 0 ELSE 1 END AS brk
        |      FROM tok LEFT JOIN b ON b.doc_id = tok.doc_id AND b.e = tok.j - 1),
        |c AS (SELECT doc_id, j, tk,
        |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY j) AS chunk_idx
        |      FROM f)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(MIN(j) - 1 AS INT) AS start, CAST(COUNT(1) AS INT) AS n_tokens,
        |  md5(STRING_AGG(tk, ' ' ORDER BY j)) AS fp
        |FROM c GROUP BY doc_id, chunk_idx ORDER BY doc_id, chunk_idx""".stripMargin,

    // corpus overlap: exact vocab sets per lang; est_ok is the Spark-side
    // sketch-vs-exact gate (TRUE here; a drifting estimate hash-fails)
    "x48_corpus_overlap" ->
      """WITH v AS (SELECT DISTINCT lang AS g, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |           FROM documents),
        |n AS (SELECT g, COUNT(1) AS n FROM v GROUP BY 1),
        |c AS (SELECT a.g AS ga, b.g AS gb, COUNT(1) AS n_common
        |      FROM v a JOIN v b ON a.tok = b.tok AND a.g < b.g GROUP BY 1, 2),
        |p AS (SELECT na.g AS ga, nb.g AS gb, na.n AS n_a, nb.n AS n_b
        |      FROM n na JOIN n nb ON na.g < nb.g)
        |SELECT p.ga AS group_a, p.gb AS group_b, n_a, n_b,
        |  COALESCE(c.n_common, 0) AS n_common,
        |  ROUND(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
        |    / (n_a + n_b - COALESCE(c.n_common, 0)), 6) AS jaccard,
        |  TRUE AS est_ok
        |FROM p LEFT JOIN c ON c.ga = p.ga AND c.gb = p.gb
        |ORDER BY group_a, group_b""".stripMargin,

    // keep-best: x26's exact CTE chain, winner by (quality desc, id)
    "x50_dedup_keep_best" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
        |cliq AS (
        |  SELECT doc_id + 2000000 AS doc_id, text FROM base WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 4000000 AS doc_id, text FROM base WHERE doc_id % 50 = 0),
        |br AS (
        |  SELECT a.doc_id + 3000000 AS doc_id,
        |    ARRAY_TO_STRING(LIST_CONCAT(STRING_SPLIT(a.text, ' ')[21:40],
        |      STRING_SPLIT(b.text, ' ')[1:20]), ' ') AS text
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 100 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM cliq UNION ALL SELECT * FROM br),
        |docs AS (SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh FROM corpus),
        |inv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM docs),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
        |  HAVING CAST(COUNT(1) AS DOUBLE) / CAST(a.nsh + b.nsh - COUNT(1) AS DOUBLE) >= 0.25),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT u AS id, u AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |assigned AS (
        |  SELECT c.doc_id, COALESCE(p.component, c.doc_id) AS component
        |  FROM corpus c LEFT JOIN comp p ON c.doc_id = p.id),
        |sizes AS (SELECT component, COUNT(1) AS n_members FROM assigned GROUP BY 1),
        |q AS (SELECT a.doc_id, a.component, CAST(LENGTH(c.text) AS DOUBLE) AS quality
        |      FROM assigned a JOIN corpus c ON a.doc_id = c.doc_id),
        |w AS (SELECT doc_id, component, quality,
        |        ROW_NUMBER() OVER (PARTITION BY component ORDER BY quality DESC, doc_id) AS rn
        |      FROM q)
        |SELECT w.doc_id, w.component, s.n_members, w.quality, w.rn = 1 AS keep
        |FROM w JOIN sizes s ON w.component = s.component ORDER BY w.doc_id""".stripMargin,

    // bpe: chars spaced out with pad spaces, each merge = two REPLACE
    // sweeps (the first consumes the shared delimiter of adjacent
    // matches, the second catches the now-isolated leftovers — exactly
    // the non-overlapping match set since every merge has a != b)
    "x61_bpe_segment" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents),
        |w AS (SELECT doc_id, words, UNNEST(RANGE(1, LEN(words)+1)) AS wi FROM d),
        |w2 AS (SELECT doc_id, wi, words[wi] AS word FROM w),
        |seg AS (SELECT doc_id, wi,
        |  STRING_SPLIT(TRIM(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(' ' || ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(1, LENGTH(word)+1), i -> SUBSTR(word, i, 1)), ' ') || ' ', ' t a ', ' ta '), ' t a ', ' ta '), ' ta b ', ' tab '), ' ta b ', ' tab '), ' tab l ', ' tabl '), ' tab l ', ' tabl '), ' tabl e ', ' table '), ' tabl e ', ' table '), ' v a ', ' va '), ' v a ', ' va '), ' va l ', ' val '), ' va l ', ' val '), ' s c ', ' sc '), ' s c ', ' sc '), ' sc a ', ' sca '), ' sc a ', ' sca ')), ' ') AS toks
        |  FROM w2)
        |SELECT doc_id, CAST(SUM(LEN(toks)) AS INT) AS n_subwords,
        |  md5(STRING_AGG(ARRAY_TO_STRING(toks, '|'), '|' ORDER BY wi)) AS seg_fp
        |FROM seg GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // snapshot diff: digests replay via the x46 normalization formula
    "x60_snapshot_diff" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |nw AS (
        |  SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN 'rev2 ' || text ELSE text END AS text
        |  FROM docs WHERE doc_id % 31 != 0
        |  UNION ALL
        |  SELECT doc_id + 20000000, text FROM docs WHERE doc_id % 5 = 0),
        |o AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fo
        |      FROM docs),
        |n AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fn
        |      FROM nw),
        |j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, fo, fn
        |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT CASE WHEN fo IS NULL THEN 'added' WHEN fn IS NULL THEN 'removed'
        |            WHEN fo = fn THEN 'unchanged' ELSE 'changed' END AS status, COUNT(1) AS n
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // image near-dup is self-certifying (blocked==brute checked inside
    // the Spark query); the oracle pins the corpus layout
    "x59_image_neardup" ->
      """SELECT (SELECT COUNT(1) FROM documents WHERE doc_id < 500)
        |     + (SELECT COUNT(1) FROM documents WHERE doc_id < 500 AND doc_id % 20 = 0)
        |     AS n_docs,
        |  (SELECT COUNT(1) FROM documents WHERE doc_id < 500 AND doc_id % 20 = 0) AS n_twins,
        |  TRUE AS pairs_match""".stripMargin,

    // containment: same 3-gram CTE chain as x50, ordered pairs,
    // normalized by the LEFT side's shingle count
    "x58_containment" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |q AS (SELECT doc_id + 5000000 AS doc_id,
        |    ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[5:16], ' ') AS text
        |  FROM base WHERE doc_id % 7 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM q),
        |docs AS (SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh FROM corpus),
        |inv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM docs)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(1) AS n_common,
        |  ROUND(CAST(COUNT(1) AS DOUBLE)/a.nsh, 6) AS containment
        |FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id != b.doc_id
        |GROUP BY 1, 2, a.nsh
        |HAVING ROUND(CAST(COUNT(1) AS DOUBLE)/a.nsh, 6) >= 0.9
        |ORDER BY 1, 2""".stripMargin,

    // A-Res: ln(u)/w with u from the first 13 md5 hex chars of the id (52 bits: tie-free keys)
    // (strpos digit decode), top-100 by the continuous key
    "x56_sample_weighted" ->
      """WITH s AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |    LN((
        |      (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),1,1))-1)*281474976710656.0
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),2,1))-1)*17592186044416
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),3,1))-1)*1099511627776
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),4,1))-1)*68719476736
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),5,1))-1)*4294967296
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),6,1))-1)*268435456
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),7,1))-1)*16777216
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),8,1))-1)*1048576
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),9,1))-1)*65536
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),10,1))-1)*4096
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),11,1))-1)*256
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),12,1))-1)*16
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),13,1))-1)
        |    + 1.0) / 4503599627370497.0) / CAST(n_chars AS DOUBLE) AS key
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, weight, ROUND(key, 6) AS sample_key
        |FROM s ORDER BY key DESC LIMIT 100""".stripMargin,

    // JL projection: the sign matrix is recomputed from the same md5
    // parity rule; LIST_TRANSFORM multiplies in ascending index order, so
    // the double sums match Spark's native dot-product loop bit-for-bit
    // before the 6dp round
    "x57_random_project" ->
      """SELECT vec_id, CAST(j AS INT) AS j,
        |  ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
        |    i -> embedding[i] * (CASE WHEN (STRPOS('0123456789abcdef',
        |        SUBSTR(md5(CAST(i-1 AS VARCHAR) || '_' || CAST(j AS VARCHAR)),1,1))-1) % 2 = 0
        |      THEN 1.0 ELSE -1.0 END))) / SQRT(8.0), 6) AS y
        |FROM embeddings CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS j)
        |ORDER BY vec_id, j""".stripMargin,

    // bloom decontamination is EXACT (sketch = prefilter only), so its
    // oracle is x24's verbatim
    "x55_decontaminate_bloom" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    LIST_DISTINCT(
        |      CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 8 THEN [text]
        |           ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 6),
        |             i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+7], ' '))
        |      END) AS grams
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 97 != 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, UNNEST(grams) AS gram FROM g
        |  WHERE doc_id % 97 = 0 AND doc_id % 5 = 0),
        |b AS (SELECT doc_id AS bench_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 97 = 0)
        |SELECT c.doc_id, MIN(b.bench_id) AS bench_id, COUNT(1) AS n_hits
        |FROM c JOIN b ON c.gram = b.gram
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // dsir: same 3-hex-char feature bucket as x36 (strpos digit decode),
    // λ over all 4096 buckets via RANGE, Gumbel key from the first 13 md5
    // hex chars of the doc id; floats rounded 6dp, selection by the
    // continuous (tie-free) key
    "x51_dsir_resample" ->
      """WITH tb AS (
        |  SELECT (STRPOS('0123456789abcdef', SUBSTR(md5(tok),1,1))-1)*256
        |       + (STRPOS('0123456789abcdef', SUBSTR(md5(tok),2,1))-1)*16
        |       + (STRPOS('0123456789abcdef', SUBSTR(md5(tok),3,1))-1) AS b, COUNT(1) AS c
        |  FROM (SELECT UNNEST(STRING_SPLIT(text,' ')) AS tok FROM documents WHERE lang = 'en')
        |  GROUP BY 1),
        |rb AS (
        |  SELECT (STRPOS('0123456789abcdef', SUBSTR(md5(tok),1,1))-1)*256
        |       + (STRPOS('0123456789abcdef', SUBSTR(md5(tok),2,1))-1)*16
        |       + (STRPOS('0123456789abcdef', SUBSTR(md5(tok),3,1))-1) AS b, COUNT(1) AS c
        |  FROM (SELECT UNNEST(STRING_SPLIT(text,' ')) AS tok FROM documents)
        |  GROUP BY 1),
        |tot AS (SELECT (SELECT SUM(c) FROM tb) + 4096.0 AS tt,
        |               (SELECT SUM(c) FROM rb) + 4096.0 AS rt),
        |lam AS (
        |  SELECT r.b, LN((COALESCE(tb.c,0)+1.0)/tot.tt) - LN((COALESCE(rb.c,0)+1.0)/tot.rt) AS l
        |  FROM (SELECT UNNEST(RANGE(0,4096)) AS b) r
        |  LEFT JOIN tb ON tb.b = r.b LEFT JOIN rb ON rb.b = r.b CROSS JOIN tot),
        |d AS (
        |  SELECT doc_id,
        |    (STRPOS('0123456789abcdef', SUBSTR(md5(tok),1,1))-1)*256
        |  + (STRPOS('0123456789abcdef', SUBSTR(md5(tok),2,1))-1)*16
        |  + (STRPOS('0123456789abcdef', SUBSTR(md5(tok),3,1))-1) AS b
        |  FROM (SELECT doc_id,
        |      UNNEST(COALESCE(STRING_SPLIT(text,' '), [CAST(NULL AS VARCHAR)])) AS tok
        |    FROM documents)),
        |s AS (SELECT doc_id, COUNT(l) AS n_tokens, COALESCE(SUM(l), 0) AS logw
        |  FROM d LEFT JOIN lam ON lam.b = d.b GROUP BY doc_id),
        |g AS (SELECT doc_id, n_tokens, logw,
        |    logw - LN(-LN((
        |      (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),1,1))-1)*281474976710656.0
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),2,1))-1)*17592186044416
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),3,1))-1)*1099511627776
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),4,1))-1)*68719476736
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),5,1))-1)*4294967296
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),6,1))-1)*268435456
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),7,1))-1)*16777216
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),8,1))-1)*1048576
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),9,1))-1)*65536
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),10,1))-1)*4096
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),11,1))-1)*256
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),12,1))-1)*16
        |    + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)),13,1))-1)
        |    + 1.0) / 4503599627370497.0)) AS key
        |  FROM s)
        |SELECT doc_id, n_tokens, ROUND(logw, 6) AS log_weight, ROUND(key, 6) AS gumbel_key
        |FROM g ORDER BY key DESC LIMIT 100""".stripMargin,

    // gopher gate: same planting, words split on [ \n]+, lines on \n;
    // list lambdas replay the rule set; floats rounded 6dp
    "x52_gopher_gate" ->
      """WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN chr(10) || '- bullet item' || chr(10) || '* second item' ELSE '' END ||
        |    CASE WHEN doc_id % 9 = 0
        |      THEN chr(10) || 'trailing teaser line...' ELSE '' END AS text
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    regexp_split_to_array(text, '[ \n]+') AS words,
        |    STRING_SPLIT(text, chr(10)) AS lines,
        |    LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS nhash,
        |    (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3 AS nell,
        |    LENGTH(regexp_replace(text, '[ \n]', '', 'g')) AS chars
        |  FROM planted),
        |g AS (SELECT doc_id, LEN(words) AS n_words,
        |    ROUND(CAST(chars AS DOUBLE)/LEN(words), 6) AS mean_word_len,
        |    ROUND(CAST(nhash + nell AS DOUBLE)/LEN(words), 6) AS symbol_ratio,
        |    ROUND(CAST(LEN(LIST_FILTER(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
        |      / LEN(words), 6) AS alpha_frac,
        |    ROUND(CAST(LEN(LIST_FILTER(lines, l -> l LIKE '- %' OR l LIKE '* %')) AS DOUBLE)
        |      / LEN(lines), 6) AS bullet_frac,
        |    ROUND(CAST(LEN(LIST_FILTER(lines, l -> l LIKE '%...')) AS DOUBLE)
        |      / LEN(lines), 6) AS ellipsis_frac,
        |    LEN(LIST_INTERSECT(LIST_DISTINCT(words),
        |      ['the','be','to','of','and','a','in','that'])) AS stop_hits
        |  FROM f)
        |SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len, symbol_ratio,
        |  alpha_frac, bullet_frac, ellipsis_frac, CAST(stop_hits AS INT) AS stop_hits,
        |  FALSE AS is_shed,
        |  (n_words BETWEEN 30 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND bullet_frac <= 0.9
        |    AND ellipsis_frac <= 0.3 AND stop_hits >= 2 AS kept
        |FROM g ORDER BY doc_id""".stripMargin,

    // domain cap: the plain window is the semantic spec the prefiltered
    // plan must equal exactly
    "x53_domain_cap" ->
      """WITH r AS (SELECT doc_id, source AS domain,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, domain, rk FROM r WHERE rk <= 10 ORDER BY domain, rk""".stripMargin,

    // shards: the single-sort form the bucketed distributed rank equals
    "x54_assign_shards" ->
      """WITH r AS (SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rank
        |  FROM documents)
        |SELECT doc_id, rank, rank // 64 AS shard, rank % 64 AS pos
        |FROM r ORDER BY doc_id""".stripMargin,

    // heavy hitters: exact top-20 replay; est_ok is the Spark-side CMS
    // guarantee gate (TRUE here; a bound violation hash-fails)
    "x49_heavy_hitters" ->
      """WITH t AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents),
        |c AS (SELECT term, COUNT(1) AS cnt FROM t GROUP BY 1),
        |r AS (SELECT term, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank FROM c)
        |SELECT CAST(rank AS INT) AS rank, term, cnt, TRUE AS est_ok
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // entropy: same ln(n) - sum(tf*ln tf)/n form, exact-integer inputs
    "x40_token_entropy" ->
      """WITH tf AS (SELECT doc_id, tok, COUNT(1) AS tf
        |  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  ROUND(LN(CAST(SUM(tf) AS DOUBLE)) - SUM(tf * LN(CAST(tf AS DOUBLE))) / SUM(tf), 6) AS entropy,
        |  ROUND(LN(CAST(SUM(tf) AS DOUBLE)) - SUM(tf * LN(CAST(tf AS DOUBLE))) / SUM(tf), 6) >= 2.0 AS kept
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // inverted index: LIST(... ORDER BY) sliced to the same cap; df exact
    "x41_inverted_index" ->
      """WITH t AS (SELECT DISTINCT doc_id, term FROM
        |    (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents))
        |SELECT term, CAST(COUNT(1) AS BIGINT) AS df,
        |  CAST(LEAST(COUNT(1), 100) AS INT) AS n_postings,
        |  ARRAY_TO_STRING(LIST_SLICE(LIST(doc_id ORDER BY doc_id), 1, 100), ',') AS postings
        |FROM t GROUP BY term ORDER BY term""".stripMargin,

    // feature bucket = first 3 hex chars of md5(token) as an int (per-char
    // ascii arithmetic — DuckDB has no hex→int cast); weight derived from
    // the same integer formula the Spark side tabulates its literal with
    "x36_quality_classifier" ->
      """WITH t AS (SELECT doc_id,
        |    UNNEST(COALESCE(STRING_SPLIT(text, ' '), [CAST(NULL AS VARCHAR)])) AS tok
        |  FROM documents),
        |b AS (SELECT doc_id,
        |    (CASE WHEN ASCII(SUBSTR(md5(tok),1,1)) >= 97 THEN ASCII(SUBSTR(md5(tok),1,1))-87
        |          ELSE ASCII(SUBSTR(md5(tok),1,1))-48 END) * 256
        |  + (CASE WHEN ASCII(SUBSTR(md5(tok),2,1)) >= 97 THEN ASCII(SUBSTR(md5(tok),2,1))-87
        |          ELSE ASCII(SUBSTR(md5(tok),2,1))-48 END) * 16
        |  + (CASE WHEN ASCII(SUBSTR(md5(tok),3,1)) >= 97 THEN ASCII(SUBSTR(md5(tok),3,1))-87
        |          ELSE ASCII(SUBSTR(md5(tok),3,1))-48 END) AS bucket
        |  FROM t)
        |SELECT doc_id, COUNT(bucket) AS n_tokens,
        |  COALESCE(CAST(SUM((bucket*2654435761) % 1001 - 500) AS BIGINT), 0) AS score,
        |  COALESCE(CAST(SUM((bucket*2654435761) % 1001 - 500) AS BIGINT), 0) >= 0 AS kept
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // link extraction: the same RE2-safe href pattern, same host filter,
    // same occurrence counting
    "x97_link_graph" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |h AS (SELECT doc_id,
        |  '<html><body><a href="https://ex.com/' || ((doc_id*2+1) % nn.n) || '">one</a>' ||
        |  CASE WHEN doc_id % 3 = 0
        |       THEN '<a href="https://ex.com/' || ((doc_id*2+1) % nn.n) || '">again</a>'
        |       ELSE '' END ||
        |  '<a href="https://ex.com/' || ((doc_id*3+2) % nn.n) || '">two</a>' ||
        |  CASE WHEN doc_id % 5 = 0
        |       THEN '<a href="https://other.site/page">ext</a>' ELSE '' END ||
        |  '<p>' || text || '</p></body></html>' AS html
        | FROM documents, nn),
        |l AS (SELECT doc_id AS src,
        |  UNNEST(regexp_extract_all(html, '(?i)<a[^>]*href="([^"]*)"', 1)) AS href FROM h)
        |SELECT src,
        |  CAST(regexp_extract(href, 'https://ex.com/([0-9]+)', 1) AS BIGINT) AS dst,
        |  CAST(COUNT(*) AS INT) AS n_occurrences
        |FROM l WHERE href LIKE 'https://ex.com/%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // pagerank: 3 unrolled iterations, every float op CAST AS DOUBLE so
    // the arithmetic sequence matches the engine's (decimal literals in
    // DuckDB default to DECIMAL, which would diverge). The graph HAS a
    // dangling node — 499's three outlinks are all self-loops (s+1 ≡ 0
    // mod 500 collapses every formula) — so each round carries the
    // dangling-mass term dm/n exactly like the engine.
    "x98_pagerank" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |e0 AS (SELECT doc_id AS src, (doc_id*2+1) % nn.n AS dst FROM documents, nn
        |  UNION ALL SELECT doc_id, (doc_id*3+2) % nn.n FROM documents, nn
        |  UNION ALL SELECT doc_id, (doc_id*4+3) % nn.n FROM documents, nn),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od FROM e GROUP BY 1),
        |r0 AS (SELECT doc_id AS id, CAST(1 AS DOUBLE)/nn.n AS pr FROM documents, nn),
        |s1 AS (SELECT e.dst, SUM(r0.pr/deg.od) AS s
        |  FROM e JOIN deg USING (src) JOIN r0 ON r0.id = e.src GROUP BY 1),
        |d1 AS (SELECT COALESCE(SUM(pr), CAST(0 AS DOUBLE)) AS dm FROM r0
        |  WHERE id NOT IN (SELECT src FROM deg)),
        |r1 AS (SELECT r0.id,
        |  (CAST(1 AS DOUBLE)-CAST(0.85 AS DOUBLE))/nn.n
        |    + CAST(0.85 AS DOUBLE)*(COALESCE(s1.s, CAST(0 AS DOUBLE)) + d1.dm/nn.n) AS pr
        |  FROM r0 CROSS JOIN nn CROSS JOIN d1 LEFT JOIN s1 ON s1.dst = r0.id),
        |s2 AS (SELECT e.dst, SUM(r1.pr/deg.od) AS s
        |  FROM e JOIN deg USING (src) JOIN r1 ON r1.id = e.src GROUP BY 1),
        |d2 AS (SELECT COALESCE(SUM(pr), CAST(0 AS DOUBLE)) AS dm FROM r1
        |  WHERE id NOT IN (SELECT src FROM deg)),
        |r2 AS (SELECT r1.id,
        |  (CAST(1 AS DOUBLE)-CAST(0.85 AS DOUBLE))/nn.n
        |    + CAST(0.85 AS DOUBLE)*(COALESCE(s2.s, CAST(0 AS DOUBLE)) + d2.dm/nn.n) AS pr
        |  FROM r1 CROSS JOIN nn CROSS JOIN d2 LEFT JOIN s2 ON s2.dst = r1.id),
        |s3 AS (SELECT e.dst, SUM(r2.pr/deg.od) AS s
        |  FROM e JOIN deg USING (src) JOIN r2 ON r2.id = e.src GROUP BY 1),
        |d3 AS (SELECT COALESCE(SUM(pr), CAST(0 AS DOUBLE)) AS dm FROM r2
        |  WHERE id NOT IN (SELECT src FROM deg)),
        |r3 AS (SELECT r2.id,
        |  (CAST(1 AS DOUBLE)-CAST(0.85 AS DOUBLE))/nn.n
        |    + CAST(0.85 AS DOUBLE)*(COALESCE(s3.s, CAST(0 AS DOUBLE)) + d3.dm/nn.n) AS pr
        |  FROM r2 CROSS JOIN nn CROSS JOIN d3 LEFT JOIN s3 ON s3.dst = r2.id)
        |SELECT id, ROUND(pr, 9) AS pr FROM r3 ORDER BY id""".stripMargin,
    // edit-distance pairs: the oracle is the exact length-banded
    // brute-force over the same universe (DuckDB's levenshtein is the
    // same unit-cost character DP as Spark's), oriented shorter-first
    "x99_editdist_pairs" ->
      """WITH base AS (SELECT doc_id AS id, SUBSTR(text, 1, 80) AS s FROM documents),
        |tw AS (SELECT doc_id + 10000000 AS id,
        |    SUBSTR(text, 1, 10) || 'QZX' || SUBSTR(text, 14, 67) AS s
        |  FROM documents WHERE doc_id % 10 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM tw),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |    CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |  FROM u a JOIN u b
        |    ON (LENGTH(a.s) < LENGTH(b.s)
        |        OR (LENGTH(a.s) = LENGTH(b.s) AND a.id < b.id))
        |   AND LENGTH(b.s) - LENGTH(a.s) <= 4)
        |SELECT id_a, id_b, dist FROM pairs WHERE dist <= 4
        |ORDER BY id_a, id_b""".stripMargin,
    // gram matrix: double-widened products summed per (i, j) cell, the
    // same upper triangle
    "x100_gram_matrix" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT ii.i, jj.j, COUNT(*) AS n_vecs,
        |  ROUND(SUM(v[ii.i+1] * v[jj.j+1]), 6) AS g
        |FROM e, range(64) ii(i), range(64) jj(j)
        |WHERE jj.j >= ii.i GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // robots gate: the oracle replays the DECISION TABLE the grammar
    // implies (star group unless the domain publishes a graftbot group,
    // longest prefix wins, allow wins ties, no match = allowed)
    "x101_robots_gate" ->
      """WITH u AS (SELECT doc_id AS url_id, source AS domain,
        |    CAST(SUBSTR(source, 4) AS INT) % 3 = 0 AS spec,
        |    doc_id % 6 AS c
        |  FROM documents)
        |SELECT url_id, domain,
        |  CASE c WHEN 0 THEN '/private/ok/p' || url_id
        |         WHEN 1 THEN '/private/z' || url_id
        |         WHEN 2 THEN '/pub/x' || url_id
        |         WHEN 3 THEN '/graft-only/open/a' || url_id
        |         WHEN 4 THEN '/graft-only/z' || url_id
        |         ELSE '/tmp/t' || url_id END AS path,
        |  CAST(CASE WHEN spec THEN (CASE c WHEN 3 THEN 16 WHEN 4 THEN 11 ELSE 0 END)
        |       ELSE (CASE c WHEN 0 THEN 11 WHEN 1 THEN 8 WHEN 5 THEN 4 ELSE 0 END)
        |       END AS INT) AS matched_len,
        |  CASE WHEN spec THEN c <> 4 ELSE (c <> 1 AND c <> 5) END AS allowed
        |FROM u ORDER BY url_id""".stripMargin,
    // csv ingest: the oracle constructs the expected parse from the
    // line grammar — quoting round-trips the shaped text, the planted
    // type mismatch nulls ONLY n_chars and flags the line
    "x102_csv_ingest" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'q"c, ' || text ELSE text END AS t,
        |    lang, n_chars
        |  FROM documents)
        |SELECT doc_id AS line_id, doc_id, md5(t) AS text_fp, lang,
        |  CASE WHEN doc_id % 10 = 3 THEN NULL
        |       ELSE CAST(n_chars AS INT) END AS n_chars,
        |  doc_id % 10 = 3 AS is_corrupt
        |FROM d ORDER BY line_id""".stripMargin,
    // anchor text: the same RE2-safe element pattern, href/text
    // extraction per element, distinct-then-sort aggregation
    "x103_anchor_text" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |h AS (SELECT doc_id,
        |  '<html><body><a href="https://ex.com/' || ((doc_id*2+1) % nn.n) ||
        |    '">go ' || ((doc_id*2+1) % nn.n) || '</a>' ||
        |  CASE WHEN doc_id % 3 = 0
        |       THEN '<a href="https://ex.com/' || ((doc_id*2+1) % nn.n) || '">again</a>'
        |       ELSE '' END ||
        |  '<a href="https://ex.com/' || ((doc_id*3+2) % nn.n) ||
        |    '">see ' || ((doc_id*3+2) % nn.n) || '</a>' ||
        |  '<p>' || text || '</p></body></html>' AS html
        | FROM documents, nn),
        |el AS (SELECT doc_id AS src,
        |  UNNEST(regexp_extract_all(html, '(?i)<a[^>]*href="[^"]*"[^>]*>[^<]*</a>')) AS elem
        |  FROM h),
        |a AS (SELECT src,
        |  CAST(regexp_extract(elem, 'https://ex.com/([0-9]+)', 1) AS BIGINT) AS dst,
        |  TRIM(regexp_extract(elem, '>([^<]*)<', 1)) AS anchor
        |  FROM el WHERE regexp_extract(elem, '(?i)href="([^"]*)"', 1) LIKE 'https://ex.com/%'),
        |st AS (SELECT dst, COUNT(*) AS n_anchors, COUNT(DISTINCT src) AS n_sources
        |  FROM a GROUP BY 1),
        |t AS (SELECT DISTINCT dst, anchor FROM a),
        |tt AS (SELECT dst,
        |  ARRAY_TO_STRING(LIST_SLICE(LIST(anchor ORDER BY anchor), 1, 100), '|') AS anchors_sample
        |  FROM t GROUP BY 1)
        |SELECT st.dst, n_anchors, n_sources, anchors_sample
        |FROM st JOIN tt USING (dst) ORDER BY dst""".stripMargin,
    // domain boilerplate: full relational replay — per-doc-distinct line
    // frequency, integer threshold, indexed-lambda reconstruction
    // (DuckDB's lambda index is 1-based, the engine's 0-based)
    "x104_domain_boilerplate" ->
      """WITH d AS (SELECT doc_id, source AS domain,
        |    'HDR ' || source || chr(10) ||
        |    CASE WHEN doc_id % 2 = 0 THEN 'SEMI ' || source || chr(10) ELSE '' END ||
        |    text ||
        |    CASE WHEN doc_id % 10 = 0 THEN chr(10) || 'RARE ' || doc_id ELSE '' END AS t
        |  FROM documents),
        |s AS (SELECT doc_id, domain, t, STRING_SPLIT(t, chr(10)) AS ts FROM d),
        |li AS (SELECT doc_id, domain, UNNEST(ts) AS line,
        |    UNNEST(RANGE(0, LEN(ts))) AS idx FROM s),
        |lf AS (SELECT DISTINCT domain, doc_id, md5(line) AS fp FROM li),
        |dfc AS (SELECT domain, fp, COUNT(*) AS dfn FROM lf GROUP BY 1, 2),
        |nd AS (SELECT domain, COUNT(*) AS ndn FROM d GROUP BY 1),
        |b AS (SELECT domain, fp FROM dfc JOIN nd USING (domain)
        |  WHERE dfn * 10 >= ndn * 3 AND ndn >= 5),
        |bad AS (SELECT li.doc_id, LIST(li.idx) AS bad FROM li
        |  JOIN b ON b.domain = li.domain AND b.fp = md5(li.line) GROUP BY 1),
        |f AS (SELECT s.doc_id, s.ts,
        |    COALESCE(bad.bad, CAST([] AS BIGINT[])) AS badl
        |  FROM s LEFT JOIN bad USING (doc_id))
        |SELECT doc_id, CAST(LEN(ts) AS INT) AS n_lines,
        |  CAST(LEN(badl) AS INT) AS n_boiler,
        |  md5(ARRAY_TO_STRING(
        |    LIST_FILTER(ts, (x, i) -> NOT LIST_CONTAINS(badl, i - 1)),
        |    chr(10))) AS clean_fp
        |FROM f ORDER BY doc_id""".stripMargin,
    // bitext mining: exact all-pairs replay — 6dp cosines ranked with id
    // tie-breaks, top-4 density averages, ratio margin, mutual-NN gate
    "x105_bitext_mine" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id AS xid, v FROM e WHERE vec_id % 2 = 0),
        |tw AS (SELECT vec_id + 10000000 AS yid, LIST_TRANSFORM(v, x -> $perturbSql) AS v
        |  FROM e WHERE vec_id % 2 = 0 AND vec_id % 10 = 0),
        |y AS (SELECT vec_id AS yid, v FROM e WHERE vec_id % 2 = 1
        |  UNION ALL SELECT * FROM tw),
        |sc AS (SELECT xid, yid, ROUND(list_cosine_similarity(x.v, y.v), 6) AS c
        |  FROM x, y),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY xid ORDER BY c DESC, yid) AS rx,
        |    ROW_NUMBER() OVER (PARTITION BY yid ORDER BY c DESC, xid) AS ry
        |  FROM sc),
        |ax AS (SELECT xid, AVG(c) AS ax FROM r WHERE rx <= 4 GROUP BY 1),
        |ay AS (SELECT yid, AVG(c) AS ay FROM r WHERE ry <= 4 GROUP BY 1),
        |b AS (SELECT * FROM r WHERE rx = 1)
        |SELECT b.xid AS x_id, b.yid AS y_best, b.c AS cos,
        |  ROUND(b.c * 2 / (ax.ax + ay.ay), 6) AS margin,
        |  b.ry = 1 AS mutual,
        |  (ROUND(b.c * 2 / (ax.ax + ay.ay), 6) >= 1.05 AND b.ry = 1) AS accepted
        |FROM b JOIN ax USING (xid) JOIN ay ON ay.yid = b.yid
        |ORDER BY x_id""".stripMargin,
    // HITS: two unrolled iterations, auth-from-hub then hub-from-NEW-auth
    // with an L1 total per half-step, every float op CAST AS DOUBLE
    "x106_hits" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |e0 AS (SELECT doc_id AS src, (doc_id*2+1) % nn.n AS dst FROM documents, nn
        |  UNION ALL SELECT doc_id, (doc_id*3+2) % nn.n FROM documents, nn
        |  UNION ALL SELECT doc_id, (doc_id*4+3) % nn.n FROM documents, nn),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |nd AS (SELECT doc_id AS id FROM documents),
        |a1r AS (SELECT dst, SUM(CAST(1 AS DOUBLE)) AS a FROM e GROUP BY 1),
        |a1t AS (SELECT SUM(a) AS t FROM a1r),
        |a1 AS (SELECT nd.id, COALESCE(a1r.a, CAST(0 AS DOUBLE))/a1t.t AS auth
        |  FROM nd CROSS JOIN a1t LEFT JOIN a1r ON a1r.dst = nd.id),
        |h1r AS (SELECT e.src, SUM(a1.auth) AS h FROM e JOIN a1 ON a1.id = e.dst GROUP BY 1),
        |h1t AS (SELECT SUM(h) AS t FROM h1r),
        |h1 AS (SELECT nd.id, COALESCE(h1r.h, CAST(0 AS DOUBLE))/h1t.t AS hub
        |  FROM nd CROSS JOIN h1t LEFT JOIN h1r ON h1r.src = nd.id),
        |a2r AS (SELECT e.dst, SUM(h1.hub) AS a FROM e JOIN h1 ON h1.id = e.src GROUP BY 1),
        |a2t AS (SELECT SUM(a) AS t FROM a2r),
        |a2 AS (SELECT nd.id, COALESCE(a2r.a, CAST(0 AS DOUBLE))/a2t.t AS auth
        |  FROM nd CROSS JOIN a2t LEFT JOIN a2r ON a2r.dst = nd.id),
        |h2r AS (SELECT e.src, SUM(a2.auth) AS h FROM e JOIN a2 ON a2.id = e.dst GROUP BY 1),
        |h2t AS (SELECT SUM(h) AS t FROM h2r),
        |h2 AS (SELECT nd.id, COALESCE(h2r.h, CAST(0 AS DOUBLE))/h2t.t AS hub
        |  FROM nd CROSS JOIN h2t LEFT JOIN h2r ON h2r.src = nd.id)
        |SELECT h2.id, ROUND(h2.hub, 9) AS hub, ROUND(a2.auth, 9) AS auth
        |FROM h2 JOIN a2 ON a2.id = h2.id ORDER BY h2.id""".stripMargin,
    // link audit: raw-edge replay (dup anchors kept), distinct set,
    // EXISTS-transpose reciprocity counted once per unordered pair
    "x107_link_audit" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |r AS (SELECT doc_id AS src, (doc_id*2+1) % nn.n AS dst FROM documents, nn
        |  UNION ALL SELECT doc_id, (doc_id*2+1) % nn.n FROM documents, nn WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, (doc_id*3+2) % nn.n FROM documents, nn),
        |rb AS (SELECT src % 10 AS bucket, src, dst FROM r),
        |d AS (SELECT DISTINCT bucket, src, dst FROM rb),
        |nr AS (SELECT bucket, COUNT(*) AS n_raw FROM rb GROUP BY 1),
        |ndc AS (SELECT bucket, COUNT(*) AS n_distinct,
        |    CAST(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT) AS n_self FROM d GROUP BY 1),
        |rc AS (SELECT d.bucket, COUNT(*) AS n_reciprocal FROM d
        |  WHERE d.src < d.dst
        |    AND EXISTS (SELECT 1 FROM d d2 WHERE d2.src = d.dst AND d2.dst = d.src)
        |  GROUP BY 1),
        |od AS (SELECT bucket, MAX(c) AS max_out_deg FROM
        |  (SELECT bucket, src, COUNT(*) AS c FROM d GROUP BY 1, 2) GROUP BY 1)
        |SELECT nr.bucket, n_raw, n_distinct, n_self,
        |  COALESCE(n_reciprocal, 0) AS n_reciprocal, max_out_deg
        |FROM nr JOIN ndc USING (bucket) LEFT JOIN rc USING (bucket)
        |  JOIN od USING (bucket)
        |ORDER BY nr.bucket""".stripMargin,
    // redirects: the oracle walks the grammar — a chain id resolves to
    // src - src%4 unless its descent path (at most 3 hops) touches a
    // planted cycle member (≡1/≡2 mod 100), which traps it
    "x108_redirects" ->
      """WITH r AS (SELECT doc_id AS src FROM documents
        |  WHERE doc_id % 100 IN (1, 2) OR doc_id % 4 <> 0),
        |c AS (SELECT src,
        |  (src % 100 IN (1, 2)
        |   OR (src % 4 >= 1 AND (src - 1) % 100 IN (1, 2))
        |   OR (src % 4 >= 2 AND (src - 2) % 100 IN (1, 2))
        |   OR (src % 4 >= 3 AND (src - 3) % 100 IN (1, 2))) AS cyc
        |  FROM r)
        |SELECT src,
        |  CASE WHEN cyc THEN NULL ELSE src - (src % 4) END AS final_dst,
        |  NOT cyc AS is_resolved
        |FROM c ORDER BY src""".stripMargin,
    // gap fill: IGNORE NULLS last-value window replay, same ordering key
    "x109_gap_fill" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        |  (v IS NULL AND LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL) AS was_filled
        |FROM m ORDER BY event_id""".stripMargin,
    // gazetteer: anchor join + list-slice span equality replay
    "x110_gazetteer" ->
      """WITH ph AS (SELECT 'L' || doc_id AS label,
        |    COALESCE(ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[2:4], ' '), '') AS phrase,
        |    STRING_SPLIT(text, ' ')[2:4] AS pt
        |  FROM documents WHERE doc_id % 37 = 0 AND doc_id < 370
        |  UNION ALL SELECT 'MISS', 'zzzz qqqq vvvv', ['zzzz', 'qqqq', 'vvvv']),
        |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
        |tok AS (SELECT doc_id, ts, UNNEST(ts) AS t,
        |    UNNEST(RANGE(0, LEN(ts))) AS pos FROM d),
        |m AS (SELECT tok.doc_id, tok.pos, ph.label, ph.phrase
        |  FROM tok JOIN ph ON tok.t = ph.pt[1]
        |  WHERE tok.ts[tok.pos + 1 : tok.pos + LEN(ph.pt)] = ph.pt)
        |SELECT doc_id, CAST(pos AS INT) AS pos, label, phrase
        |FROM m ORDER BY doc_id, pos, label""".stripMargin,
    // markdown: the same RE2-safe chain — fences out (counted), inline
    // code and links unwrapped, ATX headers stripped, whitespace folded
    "x111_markdown_extract" ->
      """WITH md AS (SELECT doc_id,
        |  '# Title ' || doc_id || chr(10) || chr(10) || 'See [doc ' || doc_id ||
        |  '](https://ex.com/' || doc_id || ') for *context*.' || chr(10) || chr(10) ||
        |  '```' || chr(10) || 'code ' || doc_id || chr(10) || 'more code' || chr(10) ||
        |  '```' || chr(10) || chr(10) || '## Sub' || chr(10) || chr(10) || text ||
        |  ' with `inline_code` end' AS m
        | FROM documents),
        |x AS (SELECT doc_id, m,
        |  TRIM(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(m, '(?s)```.*?```', ' ', 'g'),
        |          '`([^`]*)`', '\1', 'g'),
        |        '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
        |      '(?m)^#{1,6} *', '', 'g'),
        |    '[ \t\n\r]+', ' ', 'g')) AS extracted
        |  FROM md)
        |SELECT doc_id,
        |  CAST(LEN(regexp_extract_all(m, '(?s)```.*?```')) AS INT) AS n_code_blocks,
        |  CAST(LEN(regexp_extract_all(m, '\[([^\]]*)\]\(([^)]*)\)')) AS INT) AS n_links,
        |  CAST(LENGTH(extracted) AS INT) AS n_chars, md5(extracted) AS fp
        |FROM x ORDER BY doc_id""".stripMargin,
    // capstone composite: the three proven replays assembled — robots
    // decision table filters the subset, boilerplate replay runs ON that
    // subset, pagerank CTEs run on the global graph
    "x112_web_pipeline" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |al AS (SELECT doc_id, source AS domain, text FROM documents
        |  WHERE CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 3 = 0
        |        THEN doc_id % 6 <> 4
        |        ELSE doc_id % 6 <> 1 AND doc_id % 6 <> 5 END),
        |sh AS (SELECT doc_id, domain,
        |    'HDR ' || domain || chr(10) ||
        |    CASE WHEN doc_id % 2 = 0 THEN 'SEMI ' || domain || chr(10) ELSE '' END ||
        |    text ||
        |    CASE WHEN doc_id % 10 = 0 THEN chr(10) || 'RARE ' || doc_id ELSE '' END AS t
        |  FROM al),
        |s AS (SELECT doc_id, domain, STRING_SPLIT(t, chr(10)) AS ts FROM sh),
        |li AS (SELECT doc_id, domain, UNNEST(ts) AS line,
        |    UNNEST(RANGE(0, LEN(ts))) AS idx FROM s),
        |lf AS (SELECT DISTINCT domain, doc_id, md5(line) AS fp FROM li),
        |dfc AS (SELECT domain, fp, COUNT(*) AS dfn FROM lf GROUP BY 1, 2),
        |nd AS (SELECT domain, COUNT(*) AS ndn FROM sh GROUP BY 1),
        |b AS (SELECT domain, fp FROM dfc JOIN nd USING (domain)
        |  WHERE dfn * 10 >= ndn * 3 AND ndn >= 5),
        |bad AS (SELECT li.doc_id, LIST(li.idx) AS bad FROM li
        |  JOIN b ON b.domain = li.domain AND b.fp = md5(li.line) GROUP BY 1),
        |f AS (SELECT s.doc_id, s.ts,
        |    COALESCE(bad.bad, CAST([] AS BIGINT[])) AS badl
        |  FROM s LEFT JOIN bad USING (doc_id)),
        |e0 AS (SELECT doc_id AS src, (doc_id*2+1) % nn.n AS dst FROM documents, nn
        |  UNION ALL SELECT doc_id, (doc_id*3+2) % nn.n FROM documents, nn
        |  UNION ALL SELECT doc_id, (doc_id*4+3) % nn.n FROM documents, nn),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od FROM e GROUP BY 1),
        |r0 AS (SELECT doc_id AS id, CAST(1 AS DOUBLE)/nn.n AS pr FROM documents, nn),
        |s1 AS (SELECT e.dst, SUM(r0.pr/deg.od) AS s
        |  FROM e JOIN deg USING (src) JOIN r0 ON r0.id = e.src GROUP BY 1),
        |d1 AS (SELECT COALESCE(SUM(pr), CAST(0 AS DOUBLE)) AS dm FROM r0
        |  WHERE id NOT IN (SELECT src FROM deg)),
        |r1 AS (SELECT r0.id,
        |  (CAST(1 AS DOUBLE)-CAST(0.85 AS DOUBLE))/nn.n
        |    + CAST(0.85 AS DOUBLE)*(COALESCE(s1.s, CAST(0 AS DOUBLE)) + d1.dm/nn.n) AS pr
        |  FROM r0 CROSS JOIN nn CROSS JOIN d1 LEFT JOIN s1 ON s1.dst = r0.id),
        |s2 AS (SELECT e.dst, SUM(r1.pr/deg.od) AS s
        |  FROM e JOIN deg USING (src) JOIN r1 ON r1.id = e.src GROUP BY 1),
        |d2 AS (SELECT COALESCE(SUM(pr), CAST(0 AS DOUBLE)) AS dm FROM r1
        |  WHERE id NOT IN (SELECT src FROM deg)),
        |r2 AS (SELECT r1.id,
        |  (CAST(1 AS DOUBLE)-CAST(0.85 AS DOUBLE))/nn.n
        |    + CAST(0.85 AS DOUBLE)*(COALESCE(s2.s, CAST(0 AS DOUBLE)) + d2.dm/nn.n) AS pr
        |  FROM r1 CROSS JOIN nn CROSS JOIN d2 LEFT JOIN s2 ON s2.dst = r1.id),
        |s3 AS (SELECT e.dst, SUM(r2.pr/deg.od) AS s
        |  FROM e JOIN deg USING (src) JOIN r2 ON r2.id = e.src GROUP BY 1),
        |d3 AS (SELECT COALESCE(SUM(pr), CAST(0 AS DOUBLE)) AS dm FROM r2
        |  WHERE id NOT IN (SELECT src FROM deg)),
        |r3 AS (SELECT r2.id,
        |  (CAST(1 AS DOUBLE)-CAST(0.85 AS DOUBLE))/nn.n
        |    + CAST(0.85 AS DOUBLE)*(COALESCE(s3.s, CAST(0 AS DOUBLE)) + d3.dm/nn.n) AS pr
        |  FROM r2 CROSS JOIN nn CROSS JOIN d3 LEFT JOIN s3 ON s3.dst = r2.id)
        |SELECT f.doc_id, CAST(LEN(f.ts) AS INT) AS n_lines,
        |  CAST(LEN(f.badl) AS INT) AS n_boiler,
        |  md5(ARRAY_TO_STRING(
        |    LIST_FILTER(f.ts, (x, i) -> NOT LIST_CONTAINS(f.badl, i - 1)),
        |    chr(10))) AS clean_fp,
        |  ROUND(r3.pr, 9) AS pr
        |FROM f JOIN r3 ON r3.id = f.doc_id ORDER BY f.doc_id""".stripMargin,
    // fertility: exact sums, one edge division
    "x113_token_fertility" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(OCTET_LENGTH(CAST(text AS BLOB))) AS BIGINT) AS n_bytes,
        |  ROUND(CAST(SUM(OCTET_LENGTH(CAST(text AS BLOB))) AS DOUBLE)
        |    / CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS DOUBLE), 6) AS bytes_per_token
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // funnel: the same stage definitions as CTEs, LAG for in/dropped
    "x114_curation_funnel" ->
      """WITH s0 AS (SELECT doc_id, text, n_chars FROM documents),
        |m1 AS (SELECT MIN(doc_id) AS doc_id FROM s0 GROUP BY md5(text)),
        |s1 AS (SELECT s0.* FROM s0 JOIN m1 USING (doc_id)),
        |m2 AS (SELECT MIN(doc_id) AS doc_id FROM s1 GROUP BY md5(LOWER(text))),
        |s2 AS (SELECT s1.* FROM s1 JOIN m2 USING (doc_id)),
        |ev AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 97 = 0),
        |s3 AS (SELECT * FROM s2 WHERE md5(text) NOT IN (SELECT fp FROM ev)),
        |s4 AS (SELECT * FROM s3 WHERE n_chars >= 100),
        |c AS (SELECT 0 AS stage_idx, 'raw' AS stage, (SELECT COUNT(*) FROM s0) AS n_out
        |  UNION ALL SELECT 1, 'exact_dedup', (SELECT COUNT(*) FROM s1)
        |  UNION ALL SELECT 2, 'case_dedup', (SELECT COUNT(*) FROM s2)
        |  UNION ALL SELECT 3, 'decontaminate', (SELECT COUNT(*) FROM s3)
        |  UNION ALL SELECT 4, 'length_gate', (SELECT COUNT(*) FROM s4))
        |SELECT stage_idx, stage,
        |  LAG(n_out) OVER (ORDER BY stage_idx) AS n_in, n_out,
        |  LAG(n_out) OVER (ORDER BY stage_idx) - n_out AS dropped
        |FROM c ORDER BY stage_idx""".stripMargin,
    // schedule: delay from the grammar (graftbot group wins on ≡0 mod 3
    // domains), rank replayed per domain
    "x115_crawl_schedule" ->
      """WITH u AS (SELECT doc_id AS url_id, source AS domain,
        |    CAST(CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 3 = 0 THEN 7
        |         ELSE CAST(SUBSTR(source, 4) AS INT) % 4 + 1 END AS BIGINT) AS crawl_delay
        |  FROM documents)
        |SELECT url_id, domain, crawl_delay,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY domain ORDER BY url_id) - 1)
        |    AS BIGINT) * crawl_delay AS slot_s
        |FROM u ORDER BY url_id""".stripMargin,
    // sentences: same RE2-safe pattern, greedy last-terminator tail,
    // list arithmetic replay
    "x116_sentences" ->
      """WITH d AS (SELECT doc_id,
        |    COALESCE(text, '') || '. Second sentence here! Third one?' ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' trailing fragment' ELSE '' END AS t
        |  FROM documents),
        |m AS (SELECT doc_id, regexp_extract_all(t, '[^.!?]*[.!?]+') AS ms,
        |    TRIM(regexp_replace(t, '(?s).*[.!?]', '')) AS tail FROM d),
        |a AS (SELECT doc_id, tail,
        |    CASE WHEN tail = '' THEN ms ELSE LIST_CONCAT(ms, [tail]) END AS al FROM m),
        |f AS (SELECT doc_id, tail, LIST_FILTER(al, s -> TRIM(s) <> '') AS fs FROM a)
        |SELECT doc_id, CAST(LEN(fs) AS INT) AS n_sentences,
        |  CASE WHEN LEN(fs) > 0 THEN ROUND(
        |    CAST(LIST_SUM(LIST_TRANSFORM(fs, s -> LEN(STRING_SPLIT(TRIM(s), ' ')))) AS DOUBLE)
        |      / CAST(LEN(fs) AS DOUBLE), 6) END AS mean_sentence_tokens,
        |  CASE WHEN LEN(fs) > 0
        |       THEN CAST(LIST_MAX(LIST_TRANSFORM(fs, s -> LENGTH(TRIM(s)))) AS INT)
        |       END AS max_sentence_chars,
        |  tail = '' AND LEN(fs) > 0 AS has_terminal
        |FROM f ORDER BY doc_id""".stripMargin,
    // format stats: translate-delete counting, same bullet class
    "x117_format_stats" ->
      """WITH d AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 5 = 0 THEN UPPER(COALESCE(text, ''))
        |          ELSE COALESCE(text, '') END) ||
        |    (CASE WHEN doc_id % 3 = 0
        |          THEN chr(10) || '- bullet one' || chr(10) || '* bullet two'
        |          ELSE '' END) AS t
        |  FROM documents),
        |c AS (SELECT doc_id, t,
        |  CAST(LENGTH(t) - LENGTH(TRANSLATE(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '')) AS DOUBLE) AS nu,
        |  CAST(LENGTH(t) - LENGTH(TRANSLATE(t, 'abcdefghijklmnopqrstuvwxyz', '')) AS DOUBLE) AS nl,
        |  CAST(LENGTH(t) - LENGTH(TRANSLATE(t, '0123456789', '')) AS DOUBLE) AS ndg,
        |  STRING_SPLIT(t, chr(10)) AS lines FROM d),
        |b AS (SELECT *, LEN(LIST_FILTER(lines, l -> regexp_matches(TRIM(l), '^[-*•]'))) AS nb
        |  FROM c)
        |SELECT doc_id,
        |  CASE WHEN nu + nl > 0 THEN ROUND(nu/(nu+nl), 6) ELSE 0.0 END AS upper_ratio,
        |  CASE WHEN LENGTH(t) > 0 THEN ROUND(ndg/CAST(LENGTH(t) AS DOUBLE), 6)
        |       ELSE 0.0 END AS digit_ratio,
        |  ROUND(CAST(nb AS DOUBLE)/CAST(LEN(lines) AS DOUBLE), 6) AS bullet_frac,
        |  (nu + nl > 0) AND nu/(nu+nl) > 0.3 AS is_shouty
        |FROM b ORDER BY doc_id""".stripMargin,
    // contamination report: x58's inverted-index replay aggregated per
    // eval doc, clean evals kept via the left join
    "x118_contamination_report" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |q AS (SELECT doc_id + 5000000 AS doc_id,
        |    ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[5:16], ' ') AS text
        |  FROM base WHERE doc_id % 7 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM q),
        |docs AS (SELECT doc_id, LIST_DISTINCT(
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 3 THEN [text]
        |         ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
        |           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))
        |    END) AS sh FROM corpus),
        |inv AS (SELECT doc_id, LEN(sh) AS nsh, UNNEST(sh) AS s FROM docs),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.nsh, COUNT(1) AS n_common
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id != b.doc_id
        |  WHERE a.doc_id >= 5000000 AND b.doc_id < 5000000
        |  GROUP BY 1, 2, 3
        |  HAVING ROUND(CAST(COUNT(1) AS DOUBLE)/a.nsh, 6) >= 0.9),
        |agg AS (SELECT id_a, COUNT(*) AS n_hits,
        |    MAX(ROUND(CAST(n_common AS DOUBLE)/nsh, 6)) AS max_containment
        |  FROM p GROUP BY 1)
        |SELECT q.doc_id AS eval_id, COALESCE(agg.n_hits, 0) AS n_hits,
        |  agg.max_containment, COALESCE(agg.n_hits, 0) > 0 AS contaminated
        |FROM q LEFT JOIN agg ON agg.id_a = q.doc_id ORDER BY eval_id""".stripMargin,
    // readability: sentence replay + vowel-group syllables, grade
    // thresholds applied to the ROUNDED score exactly like the engine
    "x119_readability" ->
      """WITH d AS (SELECT doc_id,
        |    COALESCE(text, '') || '. Second sentence here! Third one?' AS t
        |  FROM documents),
        |m AS (SELECT doc_id, t, regexp_extract_all(t, '[^.!?]*[.!?]+') AS ms,
        |    TRIM(regexp_replace(t, '(?s).*[.!?]', '')) AS tail FROM d),
        |f AS (SELECT doc_id, t,
        |    LIST_FILTER(CASE WHEN tail = '' THEN ms ELSE LIST_CONCAT(ms, [tail]) END,
        |      s -> TRIM(s) <> '') AS fs FROM m),
        |c AS (SELECT doc_id,
        |    CAST(LEN(STRING_SPLIT(t, ' ')) AS DOUBLE) AS w,
        |    CAST(LEN(regexp_extract_all(t, '[aeiouyAEIOUY]+')) AS DOUBLE)
        |      + CAST(LEN(LIST_FILTER(STRING_SPLIT(t, ' '),
        |          w -> NOT regexp_matches(w, '[aeiouyAEIOUY]'))) AS DOUBLE) AS syl,
        |    CAST(LEN(fs) AS DOUBLE) AS sct FROM f),
        |g AS (SELECT doc_id, w, syl, sct,
        |    CASE WHEN sct > 0 AND w > 0 THEN ROUND(
        |      CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE)*(w/sct)
        |        - CAST(84.6 AS DOUBLE)*(syl/w), 6) END AS flesch
        |  FROM c)
        |SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(syl AS BIGINT) AS n_syllables,
        |  CAST(sct AS INT) AS n_sentences, flesch,
        |  CASE WHEN flesch IS NULL THEN 'unknown'
        |       WHEN flesch >= 90 THEN 'very_easy'
        |       WHEN flesch >= 70 THEN 'easy'
        |       WHEN flesch >= 50 THEN 'medium'
        |       WHEN flesch >= 30 THEN 'hard'
        |       ELSE 'very_hard' END AS reading_grade
        |FROM g ORDER BY doc_id""".stripMargin,
    // dialogue: same speaker-line regex and list arithmetic
    "x120_dialogue" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 6 = 0 THEN
        |    'Alice: '
        |      || COALESCE(ARRAY_TO_STRING(STRING_SPLIT(COALESCE(text, ''), ' ')[1:5], ' '), '') ||
        |    chr(10) || 'Bob: '
        |      || COALESCE(ARRAY_TO_STRING(STRING_SPLIT(COALESCE(text, ''), ' ')[6:10], ' '), '') ||
        |    chr(10) || 'Alice: '
        |      || COALESCE(ARRAY_TO_STRING(STRING_SPLIT(COALESCE(text, ''), ' ')[11:15], ' '), '')
        |  WHEN doc_id % 6 = 1 THEN 'Narrator: ' || COALESCE(text, '')
        |  ELSE COALESCE(text, '') END AS t FROM documents),
        |l AS (SELECT doc_id, STRING_SPLIT(t, chr(10)) AS lines FROM d),
        |s AS (SELECT doc_id, lines,
        |    LIST_FILTER(LIST_TRANSFORM(lines,
        |      x -> regexp_extract(x, '^([A-Z][A-Za-z]*): ', 1)), x -> x <> '') AS sp
        |  FROM l)
        |SELECT doc_id, CAST(LEN(lines) AS INT) AS n_lines,
        |  CAST(LEN(sp) AS INT) AS n_turns,
        |  CAST(LEN(LIST_DISTINCT(sp)) AS INT) AS n_speakers,
        |  (CAST(LEN(sp) AS DOUBLE)/CAST(LEN(lines) AS DOUBLE) > 0.5
        |    AND LEN(LIST_DISTINCT(sp)) >= 2) AS is_dialogue
        |FROM s ORDER BY doc_id""".stripMargin,
    // mixed-language: x4's marker CASE per line, distinct-then-sort
    // re-aggregation
    "x121_mixed_lang" ->
      """WITH d AS (SELECT doc_id,
        |    COALESCE(text, '') ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'der die und der die und' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'le les des le les des' ELSE '' END AS t
        |  FROM documents),
        |li AS (SELECT doc_id, UNNEST(STRING_SPLIT(t, chr(10))) AS line FROM d),
        |sc AS (SELECT doc_id,
        |    LEN(LIST_FILTER(STRING_SPLIT(line, ' '), x -> x IN ('the','and','of'))) AS s_en,
        |    LEN(LIST_FILTER(STRING_SPLIT(line, ' '), x -> x IN ('el','la','de'))) AS s_es,
        |    LEN(LIST_FILTER(STRING_SPLIT(line, ' '), x -> x IN ('der','die','und'))) AS s_de,
        |    LEN(LIST_FILTER(STRING_SPLIT(line, ' '), x -> x IN ('le','les','des'))) AS s_fr,
        |    LEN(LIST_FILTER(STRING_SPLIT(line, ' '), x -> x IN ('的','是','在'))) AS s_zh
        |  FROM li),
        |lp AS (SELECT doc_id,
        |    CASE WHEN s_en + s_es + s_de + s_fr + s_zh = 0 THEN 'und'
        |         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |         WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |         WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS lp
        |  FROM sc),
        |nl AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lines FROM lp GROUP BY 1),
        |dl AS (SELECT DISTINCT doc_id, lp FROM lp WHERE lp <> 'und'),
        |ag AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_langs,
        |    ARRAY_TO_STRING(LIST(lp ORDER BY lp), '|') AS langs
        |  FROM dl GROUP BY 1)
        |SELECT nl.doc_id, nl.n_lines,
        |  COALESCE(ag.n_langs, 0) AS n_langs,
        |  COALESCE(ag.langs, '') AS langs,
        |  COALESCE(ag.n_langs, 0) >= 2 AS is_mixed
        |FROM nl LEFT JOIN ag USING (doc_id) ORDER BY nl.doc_id""".stripMargin,
    // homoglyphs: same script classes per token ('fакe' mixes Latin f/e
    // with Cyrillic ак; 'слово' is pure Cyrillic and must NOT count)
    "x122_homoglyphs" ->
      """WITH d AS (SELECT doc_id,
        |    COALESCE(text, '') ||
        |      CASE WHEN doc_id % 9 = 0 THEN ' fакe слово' ELSE '' END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    STRING_SPLIT(regexp_replace(t, '[ \t\n\r]+', ' ', 'g'), ' ') AS toks FROM d),
        |m AS (SELECT doc_id, CAST(LEN(toks) AS INT) AS n_tokens,
        |    CAST(LEN(LIST_FILTER(toks,
        |      x -> regexp_matches(x, '[A-Za-z]') AND regexp_matches(x, '[Ѐ-ӿͰ-Ͽ]')))
        |      AS INT) AS n_mixed_script
        |  FROM c)
        |SELECT doc_id, n_tokens, n_mixed_script,
        |  CASE WHEN n_tokens > 0
        |       THEN ROUND(CAST(n_mixed_script AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6)
        |       ELSE 0.0 END AS mixed_frac,
        |  n_mixed_script > 0 AS has_homoglyphs
        |FROM m ORDER BY doc_id""".stripMargin,
    // embedding card: 6dp norms then quantile_cont (the q24 percentile
    // parity), null vectors counted and excluded
    "x123_embedding_card" ->
      """WITH e AS (SELECT label,
        |    CASE WHEN vec_id % 97 = 0 THEN NULL
        |         ELSE CAST(embedding AS DOUBLE[]) END AS v
        |  FROM embeddings),
        |n AS (SELECT label, v,
        |    CASE WHEN v IS NOT NULL
        |         THEN ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x * x))), 6) END AS nrm
        |  FROM e)
        |SELECT label, COUNT(*) AS n_vecs,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  MAX(LEN(v)) AS dim,
        |  ROUND(AVG(nrm), 6) AS mean_norm,
        |  ROUND(quantile_cont(nrm, 0.5), 6) AS p50_norm,
        |  ROUND(quantile_cont(nrm, 0.99), 6) AS p99_norm,
        |  ROUND(MIN(nrm), 6) AS min_norm,
        |  ROUND(MAX(nrm), 6) AS max_norm
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    // crawl budget: Hamilton apportionment replay — integer div/mod,
    // remainder rank with domain tie-break, leftover top-ups
    "x124_crawl_budget" ->
      """WITH c AS (SELECT source AS domain, COUNT(*) AS n_urls FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_urls) AS BIGINT) AS tt FROM c),
        |b AS (SELECT domain, n_urls,
        |    (10000 * n_urls) // t.tt AS base,
        |    (10000 * n_urls) % t.tt AS rem
        |  FROM c, t),
        |l AS (SELECT 10000 - SUM(base) AS leftover FROM b),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, domain ASC) AS rk FROM b)
        |SELECT domain, n_urls,
        |  CAST(base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r, l ORDER BY domain""".stripMargin,
    // chat parse: full relational replay of the grammar — head lines
    // open turns, continuation lines string-agg back, orphans counted;
    // fp = md5 of the role||chr(1)||content chain joined by chr(2)
    "x125_chat_parse" ->
      """WITH b AS (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS tk FROM documents),
        |bt AS (SELECT doc_id, lang,
        |    (CASE WHEN doc_id % 11 = 0 THEN '<<corrupt header>>' || chr(10) ELSE '' END)
        |    || 'system: be concise'
        |    || chr(10) || 'user: ' || COALESCE(ARRAY_TO_STRING(tk[1:(LEN(tk)//2)], ' '), '')
        |    || (CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'please elaborate' ELSE '' END)
        |    || chr(10) || 'assistant: ' || COALESCE(ARRAY_TO_STRING(tk[(LEN(tk)//2+1):LEN(tk)], ' '), '')
        |    || (CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'assistant: adding more detail' ELSE '' END)
        |    || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'user: thanks' || chr(10) || 'assistant: ' ELSE '' END)
        |    AS t
        |  FROM b),
        |lines AS (SELECT doc_id, lang,
        |    UNNEST(STRING_SPLIT(t, chr(10))) AS line,
        |    UNNEST(RANGE(0, LEN(STRING_SPLIT(t, chr(10))))) AS pos
        |  FROM bt),
        |cl AS (SELECT *, CASE WHEN regexp_matches(line, '^(system|user|assistant): ') THEN 1 ELSE 0 END AS is_head FROM lines),
        |tid AS (SELECT *, SUM(is_head) OVER (PARTITION BY doc_id ORDER BY pos) AS turn_id FROM cl),
        |turns AS (SELECT doc_id, ANY_VALUE(lang) AS lang, turn_id,
        |    MAX(CASE WHEN is_head = 1 THEN regexp_extract(line, '^(system|user|assistant): ', 1) END) AS role,
        |    STRING_AGG(CASE WHEN is_head = 1 THEN regexp_replace(line, '^(system|user|assistant): ', '') ELSE line END, chr(10) ORDER BY pos) AS content
        |  FROM tid WHERE turn_id >= 1 GROUP BY doc_id, turn_id),
        |base AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(CASE WHEN turn_id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_lines
        |  FROM tid GROUP BY 1),
        |rs AS (SELECT *, LAG(role) OVER (PARTITION BY doc_id ORDER BY turn_id) AS prev_role,
        |    MAX(turn_id) OVER (PARTITION BY doc_id) AS max_t
        |  FROM turns),
        |st AS (SELECT doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_turns,
        |    CAST(SUM(CASE WHEN role = 'system' THEN 1 ELSE 0 END) AS BIGINT) AS n_system,
        |    CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
        |    CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
        |    CAST(SUM(CASE WHEN TRIM(content) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_turns,
        |    CAST(SUM(CASE WHEN prev_role = role THEN 1 ELSE 0 END) AS BIGINT) AS n_role_repeats,
        |    BOOL_OR(turn_id = 1 AND role = 'system') AS starts_system,
        |    BOOL_OR(turn_id = max_t AND role = 'assistant') AS ends_assistant,
        |    md5(STRING_AGG(role || chr(1) || content, chr(2) ORDER BY turn_id)) AS fp
        |  FROM rs GROUP BY 1)
        |SELECT b.doc_id, n_lines, n_orphan_lines, n_turns, n_system, n_user, n_assistant,
        |  n_empty_turns, n_role_repeats, starts_system, ends_assistant, fp
        |FROM base b JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin,
    // loss mass: same turn replay; per-turn token counts via the same
    // replace-newline-then-split-and-filter formulation
    "x126_loss_mass" ->
      """WITH b AS (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS tk FROM documents),
        |bt AS (SELECT doc_id, lang,
        |    (CASE WHEN doc_id % 11 = 0 THEN '<<corrupt header>>' || chr(10) ELSE '' END)
        |    || 'system: be concise'
        |    || chr(10) || 'user: ' || COALESCE(ARRAY_TO_STRING(tk[1:(LEN(tk)//2)], ' '), '')
        |    || (CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'please elaborate' ELSE '' END)
        |    || chr(10) || 'assistant: ' || COALESCE(ARRAY_TO_STRING(tk[(LEN(tk)//2+1):LEN(tk)], ' '), '')
        |    || (CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'assistant: adding more detail' ELSE '' END)
        |    || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'user: thanks' || chr(10) || 'assistant: ' ELSE '' END)
        |    AS t
        |  FROM b),
        |lines AS (SELECT doc_id, lang,
        |    UNNEST(STRING_SPLIT(t, chr(10))) AS line,
        |    UNNEST(RANGE(0, LEN(STRING_SPLIT(t, chr(10))))) AS pos
        |  FROM bt),
        |cl AS (SELECT *, CASE WHEN regexp_matches(line, '^(system|user|assistant): ') THEN 1 ELSE 0 END AS is_head FROM lines),
        |tid AS (SELECT *, SUM(is_head) OVER (PARTITION BY doc_id ORDER BY pos) AS turn_id FROM cl),
        |turns AS (SELECT doc_id, ANY_VALUE(lang) AS lang, turn_id,
        |    MAX(CASE WHEN is_head = 1 THEN regexp_extract(line, '^(system|user|assistant): ', 1) END) AS role,
        |    STRING_AGG(CASE WHEN is_head = 1 THEN regexp_replace(line, '^(system|user|assistant): ', '') ELSE line END, chr(10) ORDER BY pos) AS content
        |  FROM tid WHERE turn_id >= 1 GROUP BY doc_id, turn_id),
        |tt AS (SELECT doc_id, lang, role,
        |    LEN(LIST_FILTER(STRING_SPLIT(REPLACE(content, chr(10), ' '), ' '), x -> x <> '')) AS toks
        |  FROM turns),
        |pd AS (SELECT doc_id, ANY_VALUE(lang) AS lang,
        |    CAST(SUM(toks) AS BIGINT) AS total_tokens,
        |    CAST(SUM(CASE WHEN role = 'assistant' THEN toks ELSE 0 END) AS BIGINT) AS loss_tokens
        |  FROM tt GROUP BY 1),
        |pf AS (SELECT doc_id, lang, total_tokens, loss_tokens,
        |    CASE WHEN total_tokens > 0 THEN ROUND(CAST(loss_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) ELSE 0.0 END AS loss_frac
        |  FROM pd)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(total_tokens) AS BIGINT) AS sum_total_tokens,
        |  CAST(SUM(loss_tokens) AS BIGINT) AS sum_loss_tokens,
        |  ROUND(AVG(loss_frac), 6) AS mean_loss_frac,
        |  CAST(SUM(CASE WHEN loss_frac < 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_signal
        |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin,
    // preference pairs: chosen/rejected via the two row_number windows
    // that replay the struct-ordering tie-breaks (DESC,DESC / ASC,ASC)
    "x127_preference_pairs" ->
      """WITH nn AS (SELECT user_id, CAST(COUNT(value) AS BIGINT) AS n,
        |    CAST(COUNT(*) - COUNT(value) AS BIGINT) AS n_null FROM events GROUP BY 1),
        |r1 AS (SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rb,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rw
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT user_id, event_id AS chosen_id, value AS bs FROM r1 WHERE rb = 1),
        |w AS (SELECT user_id, event_id AS rejected_id, value AS ws FROM r1 WHERE rw = 1)
        |SELECT b.user_id AS prompt_id, chosen_id, rejected_id,
        |  ROUND(bs - ws, 6) AS margin, n AS n_candidates, n_null AS n_null_scores
        |FROM b JOIN w USING (user_id) JOIN nn USING (user_id)
        |WHERE n >= 2 AND bs > ws ORDER BY 1""".stripMargin,
    // bradley-terry: all 5 MM iterations unrolled as CTEs, virtual
    // opponent (+1 win, +1 loss vs strength-1 dummy), per-round sum-to-N
    // rescale — identical double arithmetic to the engine loop
    "x128_bradley_terry" ->
      """WITH lagd AS MATERIALIZED (SELECT event_type AS cur_t, value AS cur_v,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_t,
        |    LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_v
        |  FROM events),
        |comps AS MATERIALIZED (SELECT
        |    CASE WHEN prev_v > cur_v OR (prev_v = cur_v AND prev_t < cur_t) THEN prev_t ELSE cur_t END AS winner,
        |    CASE WHEN prev_v > cur_v OR (prev_v = cur_v AND prev_t < cur_t) THEN cur_t ELSE prev_t END AS loser
        |  FROM lagd WHERE prev_t IS NOT NULL AND prev_t <> cur_t),
        |dir AS MATERIALIZED (SELECT winner, loser, COUNT(*) AS w FROM comps GROUP BY 1, 2),
        |und AS MATERIALIZED (SELECT i, j, SUM(w) AS n_ij FROM (
        |    SELECT winner AS i, loser AS j, w FROM dir
        |    UNION ALL SELECT loser AS i, winner AS j, w FROM dir) GROUP BY 1, 2),
        |wins AS MATERIALIZED (SELECT winner AS item, CAST(SUM(w) AS BIGINT) AS wins FROM dir GROUP BY 1),
        |losses AS MATERIALIZED (SELECT loser AS item, CAST(SUM(w) AS BIGINT) AS losses FROM dir GROUP BY 1),
        |items AS MATERIALIZED (SELECT DISTINCT i AS item FROM und),
        |s0 AS MATERIALIZED (SELECT item, CAST(1.0 AS DOUBLE) AS s FROM items),
        |den0 AS MATERIALIZED (SELECT u.i AS item, SUM(u.n_ij / (si.s + sj.s)) AS den
        |  FROM und u JOIN s0 si ON u.i = si.item JOIN s0 sj ON u.j = sj.item GROUP BY 1),
        |raw0 AS MATERIALIZED (SELECT s.item,
        |    (CAST(COALESCE(w.wins, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |    (COALESCE(d.den, CAST(0.0 AS DOUBLE)) + CAST(2.0 AS DOUBLE) / (s.s + CAST(1.0 AS DOUBLE))) AS sr
        |  FROM s0 s LEFT JOIN wins w ON s.item = w.item LEFT JOIN den0 d ON s.item = d.item),
        |tot0 AS MATERIALIZED (SELECT SUM(sr) AS tot, COUNT(*) AS n FROM raw0),
        |s1 AS MATERIALIZED (SELECT item, sr * CAST(n AS DOUBLE) / tot AS s FROM raw0, tot0),
        |den1 AS MATERIALIZED (SELECT u.i AS item, SUM(u.n_ij / (si.s + sj.s)) AS den
        |  FROM und u JOIN s1 si ON u.i = si.item JOIN s1 sj ON u.j = sj.item GROUP BY 1),
        |raw1 AS MATERIALIZED (SELECT s.item,
        |    (CAST(COALESCE(w.wins, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |    (COALESCE(d.den, CAST(0.0 AS DOUBLE)) + CAST(2.0 AS DOUBLE) / (s.s + CAST(1.0 AS DOUBLE))) AS sr
        |  FROM s1 s LEFT JOIN wins w ON s.item = w.item LEFT JOIN den1 d ON s.item = d.item),
        |tot1 AS MATERIALIZED (SELECT SUM(sr) AS tot, COUNT(*) AS n FROM raw1),
        |s2 AS MATERIALIZED (SELECT item, sr * CAST(n AS DOUBLE) / tot AS s FROM raw1, tot1),
        |den2 AS MATERIALIZED (SELECT u.i AS item, SUM(u.n_ij / (si.s + sj.s)) AS den
        |  FROM und u JOIN s2 si ON u.i = si.item JOIN s2 sj ON u.j = sj.item GROUP BY 1),
        |raw2 AS MATERIALIZED (SELECT s.item,
        |    (CAST(COALESCE(w.wins, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |    (COALESCE(d.den, CAST(0.0 AS DOUBLE)) + CAST(2.0 AS DOUBLE) / (s.s + CAST(1.0 AS DOUBLE))) AS sr
        |  FROM s2 s LEFT JOIN wins w ON s.item = w.item LEFT JOIN den2 d ON s.item = d.item),
        |tot2 AS MATERIALIZED (SELECT SUM(sr) AS tot, COUNT(*) AS n FROM raw2),
        |s3 AS MATERIALIZED (SELECT item, sr * CAST(n AS DOUBLE) / tot AS s FROM raw2, tot2),
        |den3 AS MATERIALIZED (SELECT u.i AS item, SUM(u.n_ij / (si.s + sj.s)) AS den
        |  FROM und u JOIN s3 si ON u.i = si.item JOIN s3 sj ON u.j = sj.item GROUP BY 1),
        |raw3 AS MATERIALIZED (SELECT s.item,
        |    (CAST(COALESCE(w.wins, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |    (COALESCE(d.den, CAST(0.0 AS DOUBLE)) + CAST(2.0 AS DOUBLE) / (s.s + CAST(1.0 AS DOUBLE))) AS sr
        |  FROM s3 s LEFT JOIN wins w ON s.item = w.item LEFT JOIN den3 d ON s.item = d.item),
        |tot3 AS MATERIALIZED (SELECT SUM(sr) AS tot, COUNT(*) AS n FROM raw3),
        |s4 AS MATERIALIZED (SELECT item, sr * CAST(n AS DOUBLE) / tot AS s FROM raw3, tot3),
        |den4 AS MATERIALIZED (SELECT u.i AS item, SUM(u.n_ij / (si.s + sj.s)) AS den
        |  FROM und u JOIN s4 si ON u.i = si.item JOIN s4 sj ON u.j = sj.item GROUP BY 1),
        |raw4 AS MATERIALIZED (SELECT s.item,
        |    (CAST(COALESCE(w.wins, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |    (COALESCE(d.den, CAST(0.0 AS DOUBLE)) + CAST(2.0 AS DOUBLE) / (s.s + CAST(1.0 AS DOUBLE))) AS sr
        |  FROM s4 s LEFT JOIN wins w ON s.item = w.item LEFT JOIN den4 d ON s.item = d.item),
        |tot4 AS MATERIALIZED (SELECT SUM(sr) AS tot, COUNT(*) AS n FROM raw4),
        |s5 AS MATERIALIZED (SELECT item, sr * CAST(n AS DOUBLE) / tot AS s FROM raw4, tot4)
        |SELECT s.item, ROUND(s.s, 6) AS strength,
        |  COALESCE(w.wins, 0) AS wins, COALESCE(l.losses, 0) AS losses,
        |  CAST(ROW_NUMBER() OVER (ORDER BY ROUND(s.s, 6) DESC, s.item) AS INT) AS rank
        |FROM s5 s LEFT JOIN wins w ON s.item = w.item LEFT JOIN losses l ON s.item = l.item
        |ORDER BY rank""".stripMargin,
    // hybrid RRF: x44's BM25 replay (k=10) + x9's cosine replay (k=10)
    // fused on round(sum(1/(60+rank)),6), ties by id
    "x129_hybrid_rrf" ->
      """WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
        |qd AS (SELECT DISTINCT doc_id AS query_id, UNNEST(tk[1:3]) AS term FROM toks WHERE doc_id < 3),
        |stats AS (SELECT COUNT(1) AS n, AVG(LEN(tk)) AS avgdl FROM toks),
        |flat AS (SELECT doc_id, LEN(tk) AS dl, UNNEST(tk) AS term FROM toks),
        |hits AS (SELECT query_id, f.doc_id, dl, term, COUNT(1) AS tf
        |  FROM flat f JOIN qd USING (term) GROUP BY 1, 2, 3, 4),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
        |sc AS (SELECT query_id, doc_id,
        |    ROUND(SUM(LN(1 + (n - df + 0.5)/(df + 0.5)) * (tf * 2.2)
        |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
        |  FROM hits JOIN dfreq USING (term) CROSS JOIN stats GROUP BY 1, 2),
        |bmr AS (SELECT query_id, doc_id AS id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM sc),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
        |sim AS (SELECT qid AS query_id, e.vec_id AS id, list_cosine_similarity(qv, v) AS s
        |  FROM q, e WHERE e.vec_id != qid),
        |cosr AS (SELECT query_id, id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, id) AS rank FROM sim),
        |u AS (SELECT query_id, id, rank FROM bmr WHERE rank <= 10
        |  UNION ALL SELECT query_id, id, rank FROM cosr WHERE rank <= 10),
        |f AS (SELECT query_id, id, ROUND(SUM(CAST(1.0 AS DOUBLE)/(60 + rank)), 6) AS rrf,
        |    CAST(COUNT(*) AS BIGINT) AS n_lists, CAST(MIN(rank) AS INT) AS best_rank
        |  FROM u GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, id) AS INT) AS fused_rank FROM f)
        |SELECT query_id, id, rrf, n_lists, best_rank, fused_rank
        |FROM r WHERE fused_rank <= 5 ORDER BY query_id, fused_rank""".stripMargin,
    // code dedup: identical code construction; first-occurrence ranks
    // from min-pos + ordered LIST; LIST_POSITION = array_position (both
    // 1-based, first match)
    "x130_code_dedup" ->
      """WITH b AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
        |c AS (SELECT doc_id,
        |    'def ' || tk[1] || ' ( ' || tk[2] || ' , ' || tk[3] || ' ) : return ' ||
        |    tk[2] || ' * ' || tk[3] || ' + ' || CAST(doc_id % 4 AS VARCHAR) AS code
        |  FROM b),
        |t AS (SELECT doc_id, UNNEST(STRING_SPLIT(code, ' ')) AS tok,
        |    UNNEST(RANGE(0, LEN(STRING_SPLIT(code, ' ')))) AS pos FROM c),
        |idt AS (SELECT doc_id, tok, MIN(pos) AS fpos FROM t
        |  WHERE regexp_matches(tok, '^[A-Za-z_][A-Za-z0-9_]*$') AND tok NOT IN ('def', 'return', 'if', 'else', 'for', 'while', 'in', 'lambda')
        |  GROUP BY 1, 2),
        |ordl AS (SELECT doc_id, LIST(tok ORDER BY fpos) AS il FROM idt GROUP BY 1),
        |canon AS (SELECT c.doc_id,
        |    ARRAY_TO_STRING(LIST_TRANSFORM(STRING_SPLIT(code, ' '),
        |      x -> CASE WHEN regexp_matches(x, '^[A-Za-z_][A-Za-z0-9_]*$') AND x NOT IN ('def', 'return', 'if', 'else', 'for', 'while', 'in', 'lambda')
        |                THEN 'v' || CAST(LIST_POSITION(COALESCE(il, []), x) AS VARCHAR)
        |                ELSE x END), ' ') AS canonical,
        |    CAST(COALESCE(LEN(il), 0) AS BIGINT) AS n_idents
        |  FROM c LEFT JOIN ordl ON c.doc_id = ordl.doc_id)
        |SELECT md5(canonical) AS fp, MIN(doc_id) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_copies, MIN(n_idents) AS n_idents
        |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin,
    // drift report: identical planted shift, fixed-width bins, +0.5
    // smoothing over observed bins only
    "x131_drift_report" ->
      """WITH base AS (SELECT lang, (doc_id % 2 = 1) AS in_b,
        |    CAST(n_chars + CASE WHEN doc_id % 2 = 1 AND lang = 'en' THEN 120 ELSE 0 END AS DOUBLE) AS v
        |  FROM documents),
        |binned AS (SELECT lang AS grp, in_b, CAST(LEAST(FLOOR(v / 100.0), 7.0) AS INT) AS bin FROM base),
        |pb AS (SELECT grp, bin,
        |    CAST(SUM(CASE WHEN NOT in_b THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
        |    CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
        |  FROM binned GROUP BY 1, 2),
        |tt AS (SELECT grp, CAST(SUM(a_cnt) AS BIGINT) AS n_a, CAST(SUM(b_cnt) AS BIGINT) AS n_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_bins_observed FROM pb GROUP BY 1),
        |terms AS (SELECT grp, n_a, n_b, n_bins_observed,
        |    (CAST(a_cnt AS DOUBLE) + 0.5) / (CAST(n_a AS DOUBLE) + 0.5 * CAST(n_bins_observed AS DOUBLE)) AS pa,
        |    (CAST(b_cnt AS DOUBLE) + 0.5) / (CAST(n_b AS DOUBLE) + 0.5 * CAST(n_bins_observed AS DOUBLE)) AS pq
        |  FROM pb JOIN tt USING (grp)),
        |agg AS (SELECT grp, n_a, n_b, n_bins_observed,
        |    ROUND(SUM((pa - pq) * LN(pa / pq)), 6) AS psi
        |  FROM terms GROUP BY 1, 2, 3, 4)
        |SELECT grp, n_a, n_b, n_bins_observed, psi, psi > 0.1 AS drifted FROM agg ORDER BY grp""".stripMargin,
    // kneser-ney: same exact-integer count tables and the same
    // double-typed formula, 6dp
    "x132_kn_bigram" ->
      """WITH t AS (SELECT STRING_SPLIT(text, ' ') AS tk FROM documents),
        |ti AS (SELECT tk, UNNEST(RANGE(1, LEN(tk))) AS i FROM t),
        |bi AS (SELECT tk[i] AS w1, tk[i+1] AS w2 FROM ti),
        |big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY 1, 2),
        |hist AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS n_fol FROM big GROUP BY 1),
        |cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_pre FROM big GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM big)
        |SELECT w1, w2, c,
        |  ROUND(GREATEST(CAST(c AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0.0 AS DOUBLE)) / c1
        |    + CAST(0.75 AS DOUBLE) * n_fol / c1 * (CAST(n_pre AS DOUBLE) / n_types), 6) AS p_kn
        |FROM big JOIN hist USING (w1) JOIN cont USING (w2) CROSS JOIN nt
        |ORDER BY c DESC, w1, w2 LIMIT 20""".stripMargin,
    // production bitext: candidate set replayed relationally (sign-band
    // keys, equality join), then the x105 margin pipeline verbatim over
    // exactly those pairs — density averages are candidate-neighborhood
    "x133_bitext_candidates" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id AS xid, v FROM e WHERE vec_id % 2 = 0),
        |tw AS (SELECT vec_id + 10000000 AS yid, LIST_TRANSFORM(v, x -> $perturbSql) AS v
        |  FROM e WHERE vec_id % 2 = 0 AND vec_id % 10 = 0),
        |y AS (SELECT vec_id AS yid, v FROM e WHERE vec_id % 2 = 1
        |  UNION ALL SELECT * FROM tw),
        |bands AS (SELECT UNNEST([0, 1]) AS band),
        |xb AS (SELECT xid, band, CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 9),
        |    i -> CASE WHEN v[band*8 + i] >= 0 THEN 1 << (i-1) ELSE 0 END)) AS BIGINT) AS key
        |  FROM x, bands),
        |yb AS (SELECT yid, band, CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 9),
        |    i -> CASE WHEN v[band*8 + i] >= 0 THEN 1 << (i-1) ELSE 0 END)) AS BIGINT) AS key
        |  FROM y, bands),
        |cd AS (SELECT DISTINCT xid, yid FROM xb JOIN yb USING (band, key)),
        |sc AS (SELECT cd.xid, cd.yid, ROUND(list_cosine_similarity(x.v, y.v), 6) AS c
        |  FROM cd JOIN x ON x.xid = cd.xid JOIN y ON y.yid = cd.yid),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY xid ORDER BY c DESC, yid) AS rx,
        |    ROW_NUMBER() OVER (PARTITION BY yid ORDER BY c DESC, xid) AS ry
        |  FROM sc),
        |ax AS (SELECT xid, AVG(c) AS ax FROM r WHERE rx <= 4 GROUP BY 1),
        |ay AS (SELECT yid, AVG(c) AS ay FROM r WHERE ry <= 4 GROUP BY 1),
        |b AS (SELECT * FROM r WHERE rx = 1)
        |SELECT b.xid AS x_id, b.yid AS y_best, b.c AS cos,
        |  ROUND(b.c * 2 / (ax.ax + ay.ay), 6) AS margin,
        |  b.ry = 1 AS mutual,
        |  (ROUND(b.c * 2 / (ax.ax + ay.ay), 6) >= 1.05 AND b.ry = 1) AS accepted
        |FROM b JOIN ax USING (xid) JOIN ay ON ay.yid = b.yid
        |ORDER BY x_id""".stripMargin,
    // fim: the same salted md5 uniforms, ordered cuts, and substring
    // arithmetic — character-based SUBSTR in both engines
    "x135_fim_transform" ->
      s"""WITH b AS (SELECT doc_id, COALESCE(text, '') AS t,
        |    md5(CAST(doc_id AS VARCHAR) || ':fim') AS hf,
        |    md5(CAST(doc_id AS VARCHAR) || ':spm') AS hs,
        |    md5(CAST(doc_id AS VARCHAR) || ':c1') AS ha,
        |    md5(CAST(doc_id AS VARCHAR) || ':c2') AS hb
        |  FROM documents),
        |u AS (SELECT doc_id, t, LENGTH(t) AS len,
        |    ${uniformOf("hf")} AS uf, ${uniformOf("hs")} AS us,
        |    ${uniformOf("ha")} AS ua, ${uniformOf("hb")} AS ub FROM b),
        |c AS (SELECT *,
        |    LEAST(1 + CAST(FLOOR(ua * (len - 1)) AS INT),
        |          1 + CAST(FLOOR(ub * (len - 1)) AS INT)) AS c1,
        |    GREATEST(1 + CAST(FLOOR(ua * (len - 1)) AS INT),
        |             1 + CAST(FLOOR(ub * (len - 1)) AS INT)) AS c2,
        |    (len >= 20 AND uf < 0.9) AS isfim, us < 0.5 AS isspm FROM u)
        |SELECT doc_id,
        |  CASE WHEN NOT isfim THEN 'plain' WHEN isspm THEN 'spm' ELSE 'psm' END AS mode,
        |  CASE WHEN NOT isfim THEN t
        |       WHEN isspm THEN '<PRE><SUF>' || SUBSTR(t, c2 + 1, len - c2)
        |         || '<MID>' || SUBSTR(t, 1, c1) || SUBSTR(t, c1 + 1, c2 - c1)
        |       ELSE '<PRE>' || SUBSTR(t, 1, c1) || '<SUF>' || SUBSTR(t, c2 + 1, len - c2)
        |         || '<MID>' || SUBSTR(t, c1 + 1, c2 - c1) END AS fim_text,
        |  CAST(len AS INT) AS n_chars,
        |  CASE WHEN isfim THEN c1 END AS cut1,
        |  CASE WHEN isfim THEN c2 END AS cut2
        |FROM c ORDER BY doc_id""".stripMargin,

    // lexicon categories: longest-first per-category alternations (the
    // x78 pattern discipline), regex word-split count, rounded densities
    "x136_lexicon_categories" ->
      """WITH t0 AS (SELECT doc_id, lower(COALESCE(text, '')) AS lt FROM documents),
        |w AS (SELECT doc_id, lt,
        |    CAST(LEN(string_split_regex(lt, '\s+')) AS DOUBLE) AS nw FROM t0),
        |h AS (SELECT doc_id, nw,
        |    CAST(LEN(regexp_extract_all(lt, '(?:\btable scan\b|\bhash join\b|\bvector\b)')) AS INT) AS db_hits,
        |    CAST(LEN(regexp_extract_all(lt, '(?:\bpacket loss\b|\bsocket\b|\btcp\/ip\b)')) AS INT) AS net_hits,
        |    CAST(LEN(regexp_extract_all(lt, '(?:\bslow query\b|\blatency\b)')) AS INT) AS perf_hits
        |  FROM w)
        |SELECT doc_id, db_hits, net_hits, perf_hits,
        |  ROUND(db_hits * 100.0 / GREATEST(nw, 1.0), 6) AS db_per100w,
        |  ROUND(net_hits * 100.0 / GREATEST(nw, 1.0), 6) AS net_per100w,
        |  ROUND(perf_hits * 100.0 / GREATEST(nw, 1.0), 6) AS perf_per100w,
        |  (ROUND(db_hits * 100.0 / GREATEST(nw, 1.0), 6) >= 1.0
        |   OR ROUND(net_hits * 100.0 / GREATEST(nw, 1.0), 6) >= 1.0
        |   OR ROUND(perf_hits * 100.0 / GREATEST(nw, 1.0), 6) >= 1.0) AS flagged
        |FROM h ORDER BY doc_id""".stripMargin,

    // rejection sampling: the same row_number ordering (value desc,
    // event_id desc) over gated candidates; accounting CTE joined back
    "x134_rejection_sample" ->
      """WITH acct AS (SELECT user_id,
        |    CAST(COUNT(value) AS BIGINT) AS n_scored,
        |    CAST(COUNT(*) - COUNT(value) AS BIGINT) AS n_null_scores,
        |    CAST(SUM(CASE WHEN value < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |  FROM events GROUP BY 1),
        |r AS (SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rank
        |  FROM events WHERE value IS NOT NULL AND value >= 0.5)
        |SELECT r.user_id AS prompt_id, r.event_id AS cand_id, r.value AS score,
        |  CAST(r.rank AS INT) AS rank, n_scored, n_below, n_null_scores
        |FROM r JOIN acct USING (user_id)
        |WHERE r.rank <= 2 ORDER BY 1, 4""".stripMargin,

    "x137_win_matrix" ->
      """WITH lagd AS (
        |  SELECT event_type AS cur_t, value AS cur_v,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_t,
        |    LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_v
        |  FROM events),
        |comps AS (
        |  SELECT
        |    CASE WHEN prev_v > cur_v OR (prev_v = cur_v AND prev_t < cur_t)
        |         THEN prev_t ELSE cur_t END AS winner,
        |    CASE WHEN prev_v > cur_v OR (prev_v = cur_v AND prev_t < cur_t)
        |         THEN cur_t ELSE prev_t END AS loser
        |  FROM lagd WHERE prev_t IS NOT NULL AND prev_t <> cur_t)
        |SELECT LEAST(winner, loser) AS item_a, GREATEST(winner, loser) AS item_b,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN winner = LEAST(winner, loser) THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
        |  ROUND(CAST(SUM(CASE WHEN winner = LEAST(winner, loser) THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS winrate_a
        |FROM comps GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x138_bestofn_curve" ->
      """WITH r AS (
        |  SELECT user_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS k,
        |    MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best
        |  FROM events)
        |SELECT CAST(k AS INT) AS k, CAST(COUNT(*) AS BIGINT) AS n_prompts,
        |  ROUND(AVG(best), 6) AS mean_best
        |FROM r WHERE k IN (1, 2, 4, 8, 16) GROUP BY 1 ORDER BY 1""".stripMargin,

    // the recursive CTE replays the pointer-doubled paths hop-by-hop;
    // rpath prepends each ancestor so it lands root-first, matching the
    // Spark side's reverse(path) join
    "x139_chat_tree" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id % 300 = 0 THEN NULL
        |         ELSE (doc_id - doc_id % 300) + ((doc_id % 300) - 1) // 2 END AS parent
        |  FROM documents),
        |walk AS (
        |  SELECT id, id AS cur, parent AS nxt, CAST(id AS VARCHAR) AS rpath, 0 AS depth
        |  FROM nodes
        |  UNION ALL
        |  SELECT w.id, n.id, n.parent, CAST(n.id AS VARCHAR) || '/' || w.rpath, w.depth + 1
        |  FROM walk w JOIN nodes n ON w.nxt = n.id),
        |fin AS (SELECT * FROM walk WHERE nxt IS NULL)
        |SELECT n.id,
        |  CASE WHEN f.depth <= 7 THEN f.cur END AS root_id,
        |  CASE WHEN f.depth <= 7 THEN CAST(f.depth AS INT) END AS depth,
        |  CASE WHEN f.depth <= 7 THEN md5(f.rpath) END AS path_fp,
        |  f.depth <= 7 AS is_resolved
        |FROM nodes n JOIN fin f ON n.id = f.id
        |ORDER BY 1""".stripMargin,

    // moments from EXACT DECIMAL(18,6) sums, derived in IEEE double —
    // order-independent, so a 7%-hot-user group (the skew twin) can never
    // push a double-sum across the 6dp boundary; mu*mu, never POW
    "x140_grpo_advantage" ->
      """WITH g AS (SELECT user_id,
        |    CAST(COUNT(value) AS BIGINT) AS n_scored,
        |    CAST(COUNT(*) - COUNT(value) AS BIGINT) AS n_null,
        |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6)
        |      AS mean_r,
        |    ROUND(CASE WHEN COUNT(value) > 0 THEN SQRT(GREATEST(
        |        CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(value)
        |        - (CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value))
        |          * (CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)), 0))
        |      ELSE 0 END, 6) AS std_r
        |  FROM events GROUP BY 1)
        |SELECT e.user_id AS prompt_id, e.event_id AS cand_id, e.value AS reward,
        |  n_scored, n_null, mean_r, std_r,
        |  CASE WHEN e.value IS NULL THEN NULL
        |       WHEN std_r > 0 THEN ROUND((e.value - mean_r) / std_r, 6)
        |       ELSE 0.0 END AS advantage
        |FROM events e JOIN g USING (user_id) ORDER BY 1, 2""".stripMargin,

    "x141_span_corruption" ->
      s"""WITH b AS (SELECT doc_id, COALESCE(text, '') AS t,
        |    md5(CAST(doc_id AS VARCHAR) || ':s1') AS ha,
        |    md5(CAST(doc_id AS VARCHAR) || ':s2') AS hb
        |  FROM documents),
        |u AS (SELECT doc_id, t, LENGTH(t) AS len,
        |    ${uniformOf("ha")} AS ua, ${uniformOf("hb")} AS ub FROM b),
        |c AS (SELECT *,
        |    len // 2 AS half,
        |    GREATEST(1, CAST(FLOOR(len * 0.075) AS INT)) AS sl,
        |    len >= 40 AS corrupt FROM u),
        |p AS (SELECT *,
        |    1 + CAST(FLOOR(ua * (half - sl)) AS INT) AS s1,
        |    half + 1 + CAST(FLOOR(ub * (half - sl)) AS INT) AS s2 FROM c)
        |SELECT doc_id,
        |  CASE WHEN corrupt THEN 'corrupt' ELSE 'plain' END AS mode,
        |  CASE WHEN corrupt THEN SUBSTR(t, 1, s1 - 1) || '<X0>'
        |         || SUBSTR(t, s1 + sl, s2 - s1 - sl) || '<X1>'
        |         || SUBSTR(t, s2 + sl, len - s2 - sl + 1)
        |       ELSE t END AS input,
        |  CASE WHEN corrupt THEN '<X0>' || SUBSTR(t, s1, sl) || '<X1>' || SUBSTR(t, s2, sl)
        |  END AS targets,
        |  CASE WHEN corrupt THEN sl * 2 ELSE 0 END AS n_masked,
        |  CAST(len AS INT) AS n_chars
        |FROM p ORDER BY doc_id""".stripMargin,

    "x142_cohen_kappa" ->
      """WITH l AS (SELECT event_type AS grp,
        |    CAST(FLOOR(value) AS BIGINT) % 4 AS a,
        |    CAST(FLOOR(value * 1.5) AS BIGINT) % 4 AS b
        |  FROM events),
        |base AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
        |  FROM l GROUP BY 1),
        |ma AS (SELECT grp, a AS k, COUNT(*) AS ra FROM l GROUP BY 1, 2),
        |mb AS (SELECT grp, b AS k, COUNT(*) AS cb FROM l GROUP BY 1, 2),
        |pet AS (SELECT ma.grp, SUM(CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)) AS pp
        |  FROM ma JOIN mb ON ma.grp = mb.grp AND ma.k = mb.k GROUP BY 1)
        |SELECT base.grp, n, ROUND(CAST(agree AS DOUBLE) / n, 6) AS po,
        |  ROUND(COALESCE(pp, 0) / (CAST(n AS DOUBLE) * n), 6) AS pe,
        |  ROUND(CASE WHEN COALESCE(pp, 0) / (CAST(n AS DOUBLE) * n) = 1.0 THEN NULL
        |    ELSE (CAST(agree AS DOUBLE) / n - COALESCE(pp, 0) / (CAST(n AS DOUBLE) * n))
        |         / (1.0 - COALESCE(pp, 0) / (CAST(n AS DOUBLE) * n)) END, 6) AS kappa
        |FROM base LEFT JOIN pet ON base.grp = pet.grp ORDER BY 1""".stripMargin,

    // id-ordered triangle enumeration (x<y<z) — semantically identical to
    // the engine's degree-ordered orientation
    "x143_triangles" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |e0 AS (SELECT doc_id AS src, (doc_id*2+1) % nn.n AS dst FROM documents, nn
        |       UNION ALL SELECT doc_id, (doc_id*3+2) % nn.n FROM documents, nn),
        |und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |        FROM e0 WHERE src <> dst),
        |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
        |        FROM (SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und) GROUP BY 1),
        |tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
        |        FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
        |        JOIN und c ON c.u = a.v AND c.v = b.v),
        |nt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tri
        |       FROM (SELECT x AS id FROM tri UNION ALL SELECT y AS id FROM tri
        |             UNION ALL SELECT z AS id FROM tri) GROUP BY 1)
        |SELECT d.id AS node_id, d.degree, COALESCE(nt.n_tri, 0) AS n_triangles,
        |  CASE WHEN d.degree >= 2
        |       THEN ROUND(2.0 * COALESCE(nt.n_tri, 0) / (d.degree * (d.degree - 1.0)), 6)
        |       ELSE 0.0 END AS clustering
        |FROM deg d LEFT JOIN nt ON d.id = nt.id ORDER BY 1""".stripMargin,

    "x144_event_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY 1),
        |u AS (SELECT 1 AS step, 'signup' AS event_type, COUNT(*) AS n FROM s1
        |      UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
        |      UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3)
        |SELECT CAST(step AS INT) AS step, event_type, CAST(n AS BIGINT) AS n_users,
        |  ROUND(CAST(n AS DOUBLE) / (SELECT COUNT(*) FROM s1), 6) AS conversion
        |FROM u ORDER BY 1""".stripMargin,

    "x145_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS c0 FROM uw GROUP BY 1),
        |cells AS (SELECT c0, CAST(DATE_DIFF('day', CAST(c0 AS DATE), CAST(wk AS DATE)) / 7 AS INT) AS week_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM uw JOIN c USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT c0, n_users AS sz FROM cells WHERE week_offset = 0)
        |SELECT STRFTIME(cells.c0, '%Y-%m-%d') AS cohort_week, week_offset, n_users,
        |  ROUND(CAST(n_users AS DOUBLE) / sz, 6) AS retention
        |FROM cells JOIN sz USING (c0) ORDER BY 1, 2""".stripMargin,

    // the engine's JaroWinkler kernel is bit-matched to DuckDB's
    // jaro_winkler_similarity (EditDistanceSpec fixtures), so the oracle
    // replays blocking + kernel + 6dp round + threshold verbatim
    "x146_jaro_winkler" ->
      """WITH base AS (SELECT doc_id AS id, lang || '|' || SUBSTR(text, 1, 6) AS b,
        |    SUBSTR(text, 1, 24) AS s FROM documents),
        |tw AS (SELECT doc_id + 10000000 AS id, lang || '|' || SUBSTR(text, 1, 6) AS b,
        |    SUBSTR(text, 1, 6) || SUBSTR(text, 8, 1) || SUBSTR(text, 7, 1)
        |      || SUBSTR(text, 10, 15) AS s
        |  FROM documents WHERE doc_id % 8 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM tw)
        |SELECT a.b AS block, a.id AS id_a, b2.id AS id_b,
        |  ROUND(jaro_winkler_similarity(a.s, b2.s), 6) AS jw
        |FROM u a JOIN u b2 ON a.b = b2.b AND a.id < b2.id
        |WHERE ROUND(jaro_winkler_similarity(a.s, b2.s), 6) >= 0.9
        |ORDER BY 1, 2, 3""".stripMargin,

    // q is 6dp-rounded BEFORE target/rate derive (the x126 pre-round
    // rule): the only cross-engine risk is summation-order ULP in the
    // POWER sum, and the round absorbs it
    "x147_lang_temperature" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT SUM(POWER(n, 0.3)) AS sa, SUM(n) AS nn FROM c),
        |r AS (SELECT lang, n, FLOOR(ROUND(POWER(n, 0.3) / t.sa, 6) * FLOOR(t.nn * 0.5))
        |        AS target FROM c, t),
        |r3 AS (SELECT lang, ROUND(LEAST(1.0, target / n), 6) AS rate FROM r),
        |d AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN $hashUniformSql < r3.rate THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  ROUND(CAST(SUM(CASE WHEN $hashUniformSql < r3.rate THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS kept_share
        |FROM d JOIN r3 USING (lang) GROUP BY 1 ORDER BY 1""".stripMargin,

    // PERCENT_RANK = strictly-below/(n-1) with ties sharing — exactly the
    // engine's aggregated-cumulative formulation
    "x148_quantile_normalize" ->
      """SELECT doc_id, source AS grp, CAST(LENGTH(text) AS DOUBLE) AS score,
        |  ROUND(PERCENT_RANK() OVER (PARTITION BY source ORDER BY LENGTH(text)), 6) AS pr
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ROUGE-2 replay: halves as token slices (identical multisets to the
    // engine's rejoin-and-resplit), bigrams via RANGE, clipped overlap
    // through a FULL OUTER join; a pair with zero grams on BOTH sides is
    // absent from both engines by the same construction
    "x149_rouge_n" ->
      """WITH b AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
        |h AS (SELECT doc_id, tk, CAST(CEIL(LEN(tk) / 2.0) AS INT) AS hh FROM b),
        |sides AS (SELECT doc_id, tk[1:hh] AS ct, tk[hh+1:LEN(tk)] AS rt FROM h),
        |cgx AS (SELECT doc_id, ct, UNNEST(RANGE(GREATEST(LEN(ct) - 1, 0))) AS x FROM sides),
        |cg AS (SELECT doc_id, ct[x+1] || ' ' || ct[x+2] AS gram, COUNT(*) AS nc
        |       FROM cgx GROUP BY 1, 2),
        |rgx AS (SELECT doc_id, rt, UNNEST(RANGE(GREATEST(LEN(rt) - 1, 0))) AS x FROM sides),
        |rg AS (SELECT doc_id, rt[x+1] || ' ' || rt[x+2] AS gram, COUNT(*) AS nr
        |       FROM rgx GROUP BY 1, 2),
        |j AS (SELECT COALESCE(cg.doc_id, rg.doc_id) AS doc_id,
        |        COALESCE(nc, 0) AS nc, COALESCE(nr, 0) AS nr
        |      FROM cg FULL OUTER JOIN rg ON cg.doc_id = rg.doc_id AND cg.gram = rg.gram),
        |agg AS (SELECT doc_id, CAST(SUM(nc) AS BIGINT) AS n_cand,
        |          CAST(SUM(nr) AS BIGINT) AS n_ref,
        |          CAST(SUM(LEAST(nc, nr)) AS BIGINT) AS overlap
        |        FROM j GROUP BY 1)
        |SELECT doc_id AS pair_id, n_cand, n_ref, overlap,
        |  ROUND(CASE WHEN n_cand > 0 THEN CAST(overlap AS DOUBLE) / n_cand ELSE 0.0 END, 6)
        |    AS precision,
        |  ROUND(CASE WHEN n_ref > 0 THEN CAST(overlap AS DOUBLE) / n_ref ELSE 0.0 END, 6)
        |    AS recall,
        |  ROUND(CASE WHEN (CASE WHEN n_cand > 0 THEN CAST(overlap AS DOUBLE) / n_cand ELSE 0.0 END)
        |           + (CASE WHEN n_ref > 0 THEN CAST(overlap AS DOUBLE) / n_ref ELSE 0.0 END) > 0
        |        THEN 2.0 * (CASE WHEN n_cand > 0 THEN CAST(overlap AS DOUBLE) / n_cand ELSE 0.0 END)
        |           * (CASE WHEN n_ref > 0 THEN CAST(overlap AS DOUBLE) / n_ref ELSE 0.0 END)
        |           / ((CASE WHEN n_cand > 0 THEN CAST(overlap AS DOUBLE) / n_cand ELSE 0.0 END)
        |              + (CASE WHEN n_ref > 0 THEN CAST(overlap AS DOUBLE) / n_ref ELSE 0.0 END))
        |        ELSE 0.0 END, 6) AS f1
        |FROM agg ORDER BY 1""".stripMargin,

    // literal probes: POSITION for the doc flag, non-overlapping
    // REPLACE-count (= regexp_count of the quoted literal) for hits
    "x150_template_leakage" ->
      """WITH t AS (SELECT text
        |    || CASE WHEN doc_id % 4 = 0 THEN ' <|im_start|>assistant says hi'
        |            WHEN doc_id % 4 = 1 THEN ' [INST] do the thing [/INST]'
        |            WHEN doc_id % 4 = 2 THEN ' ### Instruction: respond' ELSE '' END
        |    || CASE WHEN doc_id % 10 = 0 THEN ' <|endoftext|>' ELSE '' END AS t
        |  FROM documents),
        |p AS (SELECT UNNEST(['<|im_start|>', '<|endoftext|>', '[INST]',
        |                     '### Instruction:', '<|assistant|>']) AS token)
        |SELECT p.token,
        |  CAST(SUM(CASE WHEN POSITION(p.token IN t.t) > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs,
        |  CAST(SUM((LENGTH(t.t) - LENGTH(REPLACE(t.t, p.token, ''))) // LENGTH(p.token))
        |    AS BIGINT) AS n_hits
        |FROM p, t GROUP BY 1 ORDER BY 1""".stripMargin,

    "x151_k_anonymity" ->
      """WITH k AS (SELECT lang, source, CAST(FLOOR(LENGTH(text) / 50.0) AS INT) AS lb,
        |    COUNT(*) AS c FROM documents GROUP BY 1, 2, 3),
        |b AS (SELECT CASE WHEN c = 1 THEN 'unique' WHEN c < 5 THEN '2..4'
        |             ELSE '>=5' END AS band, c FROM k),
        |g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |        CAST(SUM(c) AS BIGINT) AS n_rows FROM b GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS tot FROM g)
        |SELECT band, n_classes, n_rows,
        |  ROUND(CAST(n_rows AS DOUBLE) / tot, 6) AS row_share
        |FROM g, t ORDER BY 1""".stripMargin,

    // dyadic construction (64ths, γλ=0.25): the suffix-sum replay is
    // bit-exact, rounding cosmetic
    "x153_gae" ->
      """WITH st AS (SELECT doc_id AS traj, UNNEST(RANGE(doc_id % 5 + 4)) AS step
        |            FROM documents),
        |tr AS (SELECT traj, step,
        |    ((traj*7 + step*13) % 64 - 32) / 64.0 AS r,
        |    ((traj*11 + step*17) % 64) / 64.0 AS v FROM st),
        |d AS (SELECT traj, step, r, v,
        |    r + 0.5 * COALESCE(LEAD(v) OVER (PARTITION BY traj ORDER BY step), 0.0) - v
        |      AS delta FROM tr),
        |a AS (SELECT traj, step, v, delta,
        |    SUM(POWER(0.25, step) * delta) OVER (PARTITION BY traj ORDER BY step
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) / POWER(0.25, step) AS adv
        |  FROM d)
        |SELECT traj AS traj_id, CAST(step AS INT) AS step, ROUND(delta, 6) AS delta,
        |  ROUND(adv, 6) AS advantage, ROUND(adv + v, 6) AS lambda_return
        |FROM a ORDER BY 1, 2""".stripMargin,

    // k1/k2/mean are exact on the dyadic eighths; k3's exp term is
    // per-token 6dp-pre-rounded on both sides
    "x154_kl_estimate" ->
      """WITH tk AS (SELECT doc_id AS prompt, UNNEST(RANGE(16)) AS t FROM documents),
        |lp AS (SELECT prompt,
        |    -(((prompt*3 + t*5) % 8) + 1) / 8.0 AS logp,
        |    -(((prompt*5 + t*3) % 8) + 1) / 8.0 AS logq FROM tk),
        |r AS (SELECT prompt, logq - logp AS r FROM lp)
        |SELECT prompt AS prompt_id, CAST(COUNT(r) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) - COUNT(r) AS BIGINT) AS n_null,
        |  ROUND(AVG(r), 6) AS mean_lr,
        |  ROUND(AVG(-r), 6) AS k1,
        |  ROUND(AVG(r*r/2), 6) AS k2,
        |  ROUND(AVG(ROUND(EXP(r) - 1 - r, 6)), 6) AS k3
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // greedy longest-match replay: per-position best match length from a
    // (position × distinct-length) probe, then the piece-start chain as a
    // recursive CTE; vocab VALUES built from the SAME Scala constant
    "x155_wordpiece" -> {
      val vocabSql = WordpieceVocab.map(p => "'" + p.replace("'", "''") + "'").mkString(", ")
      s"""WITH RECURSIVE v AS (SELECT UNNEST([$vocabSql]) AS piece),
        |vl AS (SELECT piece, LENGTH(piece) AS l FROM v),
        |docs AS (SELECT doc_id, SUBSTR(text, 1, 64) AS text,
        |         LENGTH(SUBSTR(text, 1, 64)) AS len FROM documents),
        |pos AS (SELECT doc_id, text, UNNEST(RANGE(len)) AS p0 FROM docs),
        |lens AS (SELECT DISTINCT l FROM vl),
        |cand AS (SELECT doc_id, p0 + 1 AS pos, SUBSTR(text, p0 + 1, lens.l) AS sub, lens.l
        |         FROM pos, lens),
        |m AS (SELECT c.doc_id, c.pos,
        |        MAX(CASE WHEN vl.piece IS NOT NULL THEN c.l END) AS best
        |      FROM cand c LEFT JOIN vl ON c.sub = vl.piece AND c.l = vl.l
        |      GROUP BY 1, 2),
        |st AS (SELECT doc_id, pos, COALESCE(best, 1) AS step, best FROM m),
        |seg(doc_id, pos, idx) AS (
        |  SELECT doc_id, 1, 0 FROM docs WHERE len >= 1
        |  UNION ALL
        |  SELECT s.doc_id, s.pos + st.step, s.idx + 1
        |  FROM seg s
        |  JOIN st ON st.doc_id = s.doc_id AND st.pos = s.pos
        |  JOIN docs d ON d.doc_id = s.doc_id AND s.pos + st.step <= d.len),
        |pieces AS (SELECT s.doc_id, s.idx,
        |    CASE WHEN st.best IS NULL THEN '<unk>'
        |         ELSE SUBSTR(d.text, s.pos, st.best) END AS piece,
        |    CASE WHEN st.best IS NULL THEN 1 ELSE 0 END AS is_unk
        |  FROM seg s
        |  JOIN st ON st.doc_id = s.doc_id AND st.pos = s.pos
        |  JOIN docs d ON d.doc_id = s.doc_id)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_pieces,
        |  CAST(SUM(is_unk) AS INT) AS n_unk,
        |  md5(STRING_AGG(piece, chr(1) ORDER BY idx)) AS fp
        |FROM pieces GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // the x146 pair replay composed with the x26 reach/min-label closure
    "x156_linkage_clusters" ->
      """WITH RECURSIVE base AS (SELECT doc_id AS id, lang || '|' || SUBSTR(text, 1, 6) AS b,
        |    SUBSTR(text, 1, 24) AS s FROM documents),
        |tw AS (SELECT doc_id + 10000000 AS id, lang || '|' || SUBSTR(text, 1, 6) AS b,
        |    SUBSTR(text, 1, 6) || SUBSTR(text, 8, 1) || SUBSTR(text, 7, 1)
        |      || SUBSTR(text, 10, 15) AS s
        |  FROM documents WHERE doc_id % 8 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM tw),
        |p AS (SELECT a.id AS id_a, b2.id AS id_b
        |      FROM u a JOIN u b2 ON a.b = b2.b AND a.id < b2.id
        |      WHERE ROUND(jaro_winkler_similarity(a.s, b2.s), 6) >= 0.9),
        |edges AS (SELECT id_a AS uu, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT uu AS id, uu AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.uu),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |assigned AS (SELECT n.id AS doc_id, COALESCE(c.component, n.id) AS component
        |             FROM u n LEFT JOIN comp c ON n.id = c.id),
        |sizes AS (SELECT component, COUNT(1) AS n_members FROM assigned GROUP BY 1)
        |SELECT a.doc_id, a.component, s.n_members, a.doc_id = a.component AS is_rep
        |FROM assigned a JOIN sizes s USING (component) ORDER BY 1""".stripMargin,

    // chr(769) = U+0301 combining acute (decomposed), chr(233) = U+00E9
    // (composed); DuckDB LENGTH counts code points = UTF-16 units on BMP
    "x157_nfc_audit" ->
      """WITH t AS (SELECT lang, text
        |    || CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769)
        |            WHEN doc_id % 3 = 1 THEN ' caf' || chr(233) ELSE '' END AS t
        |  FROM documents),
        |n AS (SELECT lang, t, nfc_normalize(t) AS nf FROM t)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN nf <> t THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(SUM(LENGTH(t) - LENGTH(nf)) AS BIGINT) AS delta_units
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,

    "x158_cuped" ->
      """WITH d AS (SELECT source AS grp,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS y,
        |    CAST(LENGTH(text) AS DOUBLE) AS x FROM documents)
        |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(AVG(y), 6) AS mean_y,
        |  ROUND(CASE WHEN VAR_POP(x) > 0 THEN COVAR_POP(x, y) / VAR_POP(x)
        |        ELSE 0.0 END, 6) AS theta,
        |  ROUND(VAR_POP(y), 6) AS var_y,
        |  ROUND(CASE WHEN VAR_POP(x) > 0
        |        THEN VAR_POP(y) - COVAR_POP(x, y) * COVAR_POP(x, y) / VAR_POP(x)
        |        ELSE VAR_POP(y) END, 6) AS var_adj,
        |  ROUND(CASE WHEN VAR_POP(x) > 0 AND VAR_POP(y) > 0
        |        THEN COVAR_POP(x, y) * COVAR_POP(x, y) / (VAR_POP(x) * VAR_POP(y))
        |        ELSE 0.0 END, 6) AS var_reduction
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // maximal digit runs via [0-9]+ THEN the 13..19 filter (no lookarounds
    // in RE2, and {13,19} alone would count a 19-digit prefix of the
    // 20-digit noise run); Luhn replayed digit-by-digit from the right
    "x159_luhn_audit" ->
      """WITH t AS (SELECT lang, text
        |    || CASE WHEN doc_id % 3 = 0 THEN ' card '
        |         || LPAD(CAST((doc_id*37) % 1000000000000000 AS VARCHAR), 15, '0')
        |         || CAST(doc_id % 10 AS VARCHAR) ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' 12345678901234567890' ELSE '' END
        |    || ' ref 12345' AS t
        |  FROM documents),
        |runs AS (SELECT lang, UNNEST(regexp_extract_all(t, '[0-9]+')) AS d FROM t),
        |cand AS (SELECT lang, d FROM runs WHERE LENGTH(d) BETWEEN 13 AND 19),
        |chk AS (SELECT lang,
        |    CASE WHEN list_sum(list_transform(range(LENGTH(d)), k ->
        |      CASE WHEN k % 2 = 1 THEN
        |        CASE WHEN 2*CAST(SUBSTR(d, CAST(LENGTH(d) - k AS INT), 1) AS INT) > 9
        |             THEN 2*CAST(SUBSTR(d, CAST(LENGTH(d) - k AS INT), 1) AS INT) - 9
        |             ELSE 2*CAST(SUBSTR(d, CAST(LENGTH(d) - k AS INT), 1) AS INT) END
        |      ELSE CAST(SUBSTR(d, CAST(LENGTH(d) - k AS INT), 1) AS INT) END)) % 10 = 0
        |    THEN 1 ELSE 0 END AS ok
        |  FROM cand),
        |agg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_runs,
        |        CAST(SUM(ok) AS BIGINT) AS n_valid FROM chk GROUP BY 1)
        |SELECT l.lang, l.n_docs, COALESCE(a.n_runs, 0) AS n_digit_runs,
        |  COALESCE(a.n_valid, 0) AS n_luhn_valid
        |FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1) l
        |LEFT JOIN agg a USING (lang) ORDER BY 1""".stripMargin,

    // per-phrase non-overlapping counts = REPLACE-count, summed; phrase
    // VALUES built from the SAME Scala constant as the engine query
    "x160_ac_scan" -> {
      val phraseSql = AcScanPhrases.map(p => "'" + p.replace("'", "''") + "'").mkString(", ")
      s"""WITH p AS (SELECT UNNEST([$phraseSql]) AS ph),
        |h AS (SELECT d.lang, d.doc_id,
        |    CAST(SUM((LENGTH(d.text) - LENGTH(REPLACE(d.text, p.ph, ''))) // LENGTH(p.ph))
        |      AS BIGINT) AS hits
        |  FROM documents d, p GROUP BY 1, 2)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(hits) AS BIGINT) AS n_hits,
        |  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // seeded-uniform inverse-CDF Laplace replay; ln pre-rounded 6dp
    "x161_dp_counts" ->
      s"""WITH c AS (SELECT lang || '|' || source AS grp, CAST(COUNT(*) AS BIGINT) AS n_true
        |           FROM documents GROUP BY 1),
        |d AS (SELECT grp, n_true, md5(grp) AS h FROM c),
        |nz AS (SELECT grp, n_true,
        |    ROUND(-1.0 * CASE WHEN ($hashUniformSql) - 0.5 > 0 THEN 1.0
        |                      WHEN ($hashUniformSql) - 0.5 < 0 THEN -1.0 ELSE 0.0 END
        |      * LN(1.0 - 2.0 * ABS(($hashUniformSql) - 0.5)), 6) AS noise
        |  FROM d)
        |SELECT grp, n_true, noise,
        |  GREATEST(0, CAST(ROUND(n_true + noise, 0) AS BIGINT)) AS noisy_count,
        |  CAST(1.0 AS DOUBLE) AS epsilon
        |FROM nz ORDER BY 1""".stripMargin,

    // discounts pre-rounded 6dp per term (LOG2 is the transcendental),
    // sums rounded once at output — the engine's exact shape
    "x162_ranking_metrics" ->
      """WITH r AS (SELECT CAST(doc_id // 8 AS BIGINT) AS qid,
        |    CAST(doc_id % 8 + 1 AS INT) AS rank,
        |    CASE WHEN (doc_id*7) % 3 = 0 THEN 1 ELSE 0 END AS rel
        |  FROM documents),
        |disc AS (SELECT CAST(i + 1 AS INT) AS rank, ROUND(1.0 / LOG2(i + 2), 6) AS d
        |         FROM (SELECT UNNEST(RANGE(5)) AS i)),
        |agg AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_results,
        |    CAST(SUM(rel) AS BIGINT) AS n_rel,
        |    MIN(CASE WHEN rel = 1 THEN r.rank END) AS fr,
        |    ROUND(SUM(CASE WHEN rel = 1 AND r.rank <= 5 THEN disc.d ELSE 0.0 END), 6) AS dcg
        |  FROM r LEFT JOIN disc ON r.rank = disc.rank GROUP BY 1),
        |pre AS (SELECT CAST(n AS BIGINT) AS n, ROUND(SUM(d), 6) AS idcg
        |  FROM (SELECT d1.rank AS n, d2.d FROM disc d1 JOIN disc d2 ON d2.rank <= d1.rank)
        |  GROUP BY 1)
        |SELECT qid AS query_id, n_results, n_rel,
        |  ROUND(CASE WHEN fr IS NOT NULL THEN 1.0 / fr ELSE 0.0 END, 6) AS mrr,
        |  dcg,
        |  COALESCE(CASE WHEN n_rel >= 1 THEN pre.idcg END, 0.0) AS idcg,
        |  ROUND(CASE WHEN n_rel >= 1 AND pre.idcg > 0 THEN dcg / pre.idcg ELSE 0.0 END, 6)
        |    AS ndcg
        |FROM agg LEFT JOIN pre ON pre.n = LEAST(agg.n_rel, 5)
        |ORDER BY 1""".stripMargin,

    // the salt is pure exchange reshaping: the oracle is the PLAIN join+agg
    "x163_salted_join" ->
      """SELECT p_brand, SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // forward direction = DuckDB ASOF with l.ts <= r.ts (earliest at/after)
    "x165_asof_forward" ->
      """SELECT s.event_id, s.user_id, p.purchase_event FROM
        |  (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
        |ASOF LEFT JOIN
        |  (SELECT user_id, ts, event_id AS purchase_event FROM events
        |   WHERE event_type = 'purchase') p
        |ON s.user_id = p.user_id AND s.ts <= p.ts
        |ORDER BY s.event_id""".stripMargin,

    // nearest = closer of the two ASOF directions; backward wins ties
    "x166_asof_nearest" ->
      """WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, ts AS ets, event_id AS err_event FROM events
        |      WHERE event_type = 'error'),
        |b AS (SELECT c.event_id, c.user_id, c.ts, e.err_event AS bev, e.ets AS bts
        |      FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts >= e.ets),
        |f AS (SELECT c.event_id, e.err_event AS fev, e.ets AS fts
        |      FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts <= e.ets)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN bts IS NOT NULL AND (fts IS NULL
        |            OR (EPOCH_US(b.ts) - EPOCH_US(bts)) <= (EPOCH_US(fts) - EPOCH_US(b.ts)))
        |       THEN bev
        |       WHEN fts IS NOT NULL THEN fev END AS err_event
        |FROM b JOIN f USING (event_id) ORDER BY 1""".stripMargin,

    // lossless round-trip contract: dims exact, planes equal, hashes equal
    "x167_image_decode" ->
      """SELECT doc_id, TRUE AS dims_ok, TRUE AS luma_equal, TRUE AS hash_equal
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin,

    // real resize: lossless decode + exact integer nearest-neighbor ==
    // the plane recomputed from the pixel formula, in both formats
    "x169_image_resize" ->
      """SELECT doc_id, TRUE AS dims_ok, TRUE AS formats_equal, TRUE AS matches_formula
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin,

    // real WAV decode: every 16-sample frame of the decoded PCM must
    // match (rms, mean) recomputed from the sample formula alone; the
    // oracle pins the exact frame grid (128 + (id%13)·16 samples per doc)
    "x170_audio_decode" ->
      """WITH d AS (SELECT doc_id, 128 + (doc_id % 13) * 16 AS n
        |           FROM documents WHERE doc_id % 20 = 0),
        |i AS (SELECT doc_id, UNNEST(RANGE(0, n // 16)) AS f FROM d)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx, TRUE AS frame_ok
        |FROM i ORDER BY 1, 2""".stripMargin,

    // real GIF frame decode: dims exact per frame, hash == the clean
    // formula replay everywhere EXCEPT the planted frame-2 edits
    "x171_video_frames" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0),
        |f AS (SELECT doc_id, UNNEST(RANGE(0, 4)) AS k FROM d)
        |SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |  CAST(24 + doc_id % 17 AS INT) AS width,
        |  CAST(24 + doc_id % 13 AS INT) AS height,
        |  NOT (doc_id % 40 = 0 AND k = 2) AS matches_clean
        |FROM f ORDER BY 1, 2""".stripMargin,

    // SQL-path twin of x1 (same digest pass through the table function)
    "x172_sql_dedup" ->
      """SELECT md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(1) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // SQL-path twin of x24 (same planted contamination, same gram join)
    "x173_sql_decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    LIST_DISTINCT(
        |      CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 8 THEN [text]
        |           ELSE LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 6),
        |             i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+7], ' '))
        |      END) AS grams
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 97 != 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, UNNEST(grams) AS gram FROM g
        |  WHERE doc_id % 97 = 0 AND doc_id % 5 = 0),
        |b AS (SELECT doc_id AS bench_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 97 = 0)
        |SELECT c.doc_id, MIN(b.bench_id) AS bench_id, COUNT(1) AS n_hits
        |FROM c JOIN b ON c.gram = b.gram
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // each planted (clean, frame-2-edited) GIF pair shares exactly its
    // 3 unedited frames at hamming 0; nothing else pairs
    "x176_video_neardup" ->
      """SELECT doc_id * 2 AS id_a, doc_id * 2 + 1 AS id_b,
        |  CAST(3 AS BIGINT) AS n_frame_pairs, CAST(0 AS INT) AS min_hamming
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY id_a""".stripMargin,

    // amplitude-doubled twin fingerprints identically (exact ×4 energy
    // scaling preserves every window comparison): hamming 0, only the
    // planted pairs
    "x177_audio_neardup" ->
      """SELECT doc_id * 2 AS id_a, doc_id * 2 + 1 AS id_b, CAST(0 AS INT) AS hamming
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY id_a""".stripMargin,

    // every blob typed and measured exactly from the synthesis formulas
    "x178_media_probe" ->
      """WITH d AS (SELECT doc_id, (doc_id // 20) % 4 AS sel,
        |    16 + doc_id % 9 AS w, 16 + doc_id % 7 AS h,
        |    256 + (doc_id % 11) * 32 AS n
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id,
        |  CASE sel WHEN 0 THEN 'image' WHEN 1 THEN 'video'
        |           WHEN 2 THEN 'audio' ELSE 'unknown' END AS kind,
        |  CAST(CASE WHEN sel <= 1 THEN w ELSE -1 END AS INT) AS width,
        |  CAST(CASE WHEN sel <= 1 THEN h ELSE -1 END AS INT) AS height,
        |  CAST(CASE WHEN sel = 0 THEN 1 WHEN sel = 1 THEN 3 ELSE -1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN sel = 2 THEN 16000 ELSE -1 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN sel = 2 THEN n ELSE -1 END AS BIGINT) AS n_samples
        |FROM d ORDER BY doc_id""".stripMargin,

    // real Y4M frame decode: dims exact per frame, hash == the clean
    // formula replay everywhere EXCEPT the planted frame-2 edits (the
    // x171 contract on the raw container)
    "x179_y4m_frames" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0),
        |f AS (SELECT doc_id, UNNEST(RANGE(0, 4)) AS k FROM d)
        |SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |  CAST(24 + doc_id % 17 AS INT) AS width,
        |  CAST(24 + doc_id % 13 AS INT) AS height,
        |  NOT (doc_id % 40 = 0 AND k = 2) AS matches_clean
        |FROM f ORDER BY 1, 2""".stripMargin,

    // the same video re-containerized (GIF vs Y4M) decodes to identical
    // luma planes: every planted pair shares all 4 frames at hamming 0
    "x180_video_cross_container" ->
      """SELECT doc_id * 2 AS id_a, doc_id * 2 + 1 AS id_b,
        |  CAST(4 AS BIGINT) AS n_frame_pairs, CAST(0 AS INT) AS min_hamming
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY id_a""".stripMargin,

    // real MJPEG/AVI decode: the frame grid (count + dims) is pinned by
    // the JPEG/RIFF structure on any engine
    "x182_avi_frames" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0),
        |f AS (SELECT doc_id, UNNEST(RANGE(0, 3)) AS k FROM d)
        |SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |  CAST(24 + doc_id % 17 AS INT) AS width,
        |  CAST(24 + doc_id % 13 AS INT) AS height
        |FROM f ORDER BY 1, 2""".stripMargin,

    // unedited frames of a (clean, edited) AVI pair are byte-identical
    // JPEGs → hamming 0 on any engine: exactly 3 frame pairs each
    "x183_avi_neardup" ->
      """SELECT doc_id * 2 AS id_a, doc_id * 2 + 1 AS id_b,
        |  CAST(3 AS BIGINT) AS n_frame_pairs, CAST(0 AS INT) AS min_hamming
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY id_a""".stripMargin,

    // SQL-path twin of x184 (same typed probe through the table function)
    "x185_sql_media_probe" ->
      """WITH d AS (SELECT doc_id, (doc_id // 20) % 7 AS sel,
        |    16 + doc_id % 9 AS w, 16 + doc_id % 7 AS h,
        |    256 + (doc_id % 11) * 32 AS n
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id,
        |  CASE WHEN sel = 0 THEN 'image' WHEN sel IN (1, 3, 4, 5) THEN 'video'
        |       WHEN sel = 2 THEN 'audio' ELSE 'unknown' END AS kind,
        |  CAST(CASE WHEN sel IN (0, 1, 3, 4, 5) THEN w ELSE -1 END AS INT) AS width,
        |  CAST(CASE WHEN sel IN (0, 1, 3, 4, 5) THEN h ELSE -1 END AS INT) AS height,
        |  CAST(CASE WHEN sel = 0 THEN 1 WHEN sel = 1 THEN 3
        |            WHEN sel IN (3, 4, 5) THEN 2 ELSE -1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN sel = 2 THEN 16000 WHEN sel = 5 THEN 8000 ELSE -1 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN sel IN (2, 5) THEN n ELSE -1 END AS BIGINT) AS n_samples
        |FROM d ORDER BY doc_id""".stripMargin,

    // every blob across all six kinds typed and measured from the
    // synthesis formulas / container structure
    "x184_media_catalog" ->
      """WITH d AS (SELECT doc_id, (doc_id // 20) % 7 AS sel,
        |    16 + doc_id % 9 AS w, 16 + doc_id % 7 AS h,
        |    256 + (doc_id % 11) * 32 AS n
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id,
        |  CASE WHEN sel = 0 THEN 'image' WHEN sel IN (1, 3, 4, 5) THEN 'video'
        |       WHEN sel = 2 THEN 'audio' ELSE 'unknown' END AS kind,
        |  CAST(CASE WHEN sel IN (0, 1, 3, 4, 5) THEN w ELSE -1 END AS INT) AS width,
        |  CAST(CASE WHEN sel IN (0, 1, 3, 4, 5) THEN h ELSE -1 END AS INT) AS height,
        |  CAST(CASE WHEN sel = 0 THEN 1 WHEN sel = 1 THEN 3
        |            WHEN sel IN (3, 4, 5) THEN 2 ELSE -1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN sel = 2 THEN 16000 WHEN sel = 5 THEN 8000 ELSE -1 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN sel IN (2, 5) THEN n ELSE -1 END AS BIGINT) AS n_samples
        |FROM d ORDER BY doc_id""".stripMargin,

    // rate-normalized twins fingerprint identically (decimation to the
    // reference rate reproduces the 8 kHz edition exactly): hamming 0,
    // only the planted pairs
    "x181_audio_rate_neardup" ->
      """SELECT doc_id * 2 AS id_a, doc_id * 2 + 1 AS id_b, CAST(0 AS INT) AS hamming
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY id_a""".stripMargin,

    // the same clip re-containerized (WAV/AIFF/AU) decodes sample-exact:
    // each planted triple yields exactly its 3 pairs at hamming 0
    "x186_audio_cross_container" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0)
        |SELECT id_a, id_b, CAST(0 AS INT) AS hamming FROM (
        |  SELECT doc_id * 3 AS id_a, doc_id * 3 + 1 AS id_b FROM d
        |  UNION ALL SELECT doc_id * 3, doc_id * 3 + 2 FROM d
        |  UNION ALL SELECT doc_id * 3 + 1, doc_id * 3 + 2 FROM d)
        |ORDER BY id_a, id_b""".stripMargin,

    // capstone accounting: every planted (original, edition) pair keeps
    // its smaller (even) id and drops the edition; unknowns always kept
    "x187_media_dedup_catalog" ->
      """WITH d AS (SELECT doc_id, (doc_id // 20) % 3 AS sel
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT * FROM (
        |  SELECT 'audio' AS kind, CAST(2 * COUNT(*) AS BIGINT) AS n_in,
        |    CAST(COUNT(*) AS BIGINT) AS n_kept, CAST(COUNT(*) AS BIGINT) AS n_dropped,
        |    CAST(SUM(doc_id * 2) AS BIGINT) AS kept_id_sum
        |  FROM d WHERE sel = 1 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT 'image', CAST(2 * COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id * 2) AS BIGINT)
        |  FROM d WHERE sel = 0 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT 'unknown', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(SUM(doc_id * 2 + 100000001) AS BIGINT)
        |  FROM d HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT 'video', CAST(2 * COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id * 2) AS BIGINT)
        |  FROM d WHERE sel = 2 HAVING COUNT(*) > 0)
        |ORDER BY kind""".stripMargin,

    // structure-only MP3/MP4 typing (incl. fragmented MP4, sel 3: frame
    // count from the trun arithmetic): every field from the synthesis
    // arithmetic — no decode exists, and none is claimed
    "x189_container_probe" ->
      """WITH d AS (SELECT doc_id, (doc_id // 20) % 4 AS sel, doc_id % 3 AS r3,
        |    16 + doc_id % 9 AS w, 16 + doc_id % 7 AS h,
        |    256 + (doc_id % 11) * 32 AS n,
        |    5 + doc_id % 7 AS mf, 2 + doc_id % 5 AS vf
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id,
        |  CASE WHEN sel IN (1, 3) THEN 'video' ELSE 'audio' END AS kind,
        |  CAST(CASE WHEN sel IN (1, 3) THEN w ELSE -1 END AS INT) AS width,
        |  CAST(CASE WHEN sel IN (1, 3) THEN h ELSE -1 END AS INT) AS height,
        |  CAST(CASE WHEN sel IN (1, 3) THEN vf ELSE -1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN sel = 0 THEN
        |         CASE WHEN r3 = 0 THEN 44100 WHEN r3 = 1 THEN 22050 ELSE 8000 END
        |       WHEN sel = 1 THEN 44100 WHEN sel = 2 THEN 16000
        |       ELSE -1 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN sel = 0 THEN mf * (CASE WHEN r3 = 0 THEN 1152 ELSE 576 END)
        |       WHEN sel = 3 THEN -1 ELSE n END AS BIGINT) AS n_samples
        |FROM d ORDER BY doc_id""".stripMargin,

    // FLAC STREAMINFO typing: rate/channels/total-samples at fixed bit
    // offsets — replayed from the synthesis arithmetic alone
    "x191_flac_probe" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 AS r3,
        |    1000 + (doc_id % 13) * 77 AS n
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id, 'audio' AS kind,
        |  CAST(-1 AS INT) AS width, CAST(-1 AS INT) AS height,
        |  CAST(-1 AS INT) AS n_frames,
        |  CAST(CASE WHEN r3 = 0 THEN 44100 WHEN r3 = 1 THEN 96000
        |       ELSE 8000 END AS INT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples
        |FROM d ORDER BY doc_id""".stripMargin,

    // OGG page-walk typing: Vorbis reports the id-header rate, Opus the
    // 48 kHz granule timebase; samples = last granule (− Opus pre-skip)
    "x192_ogg_probe" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 AS r3, doc_id % 40 = 0 AS vorbis,
        |    2000 + (doc_id % 11) * 111 AS n
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id, 'audio' AS kind,
        |  CAST(-1 AS INT) AS width, CAST(-1 AS INT) AS height,
        |  CAST(-1 AS INT) AS n_frames,
        |  CAST(CASE WHEN vorbis THEN
        |         CASE WHEN r3 = 0 THEN 48000 WHEN r3 = 1 THEN 44100 ELSE 16000 END
        |       ELSE 48000 END AS INT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples
        |FROM d ORDER BY doc_id""".stripMargin,

    // digest exact-dup accounting: every planted byte-identical twin pair
    // keeps its smaller id, every near-identical sibling is kept
    "x190_digest_dedup" ->
      """WITH d AS (SELECT doc_id, (doc_id // 20) % 3 AS sel
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT * FROM (
        |  SELECT 'audio' AS kind, CAST(3 * COUNT(*) AS BIGINT) AS n_in,
        |    CAST(2 * COUNT(*) AS BIGINT) AS n_kept, CAST(COUNT(*) AS BIGINT) AS n_dropped,
        |    CAST(SUM(doc_id * 8 + 2) AS BIGINT) AS kept_id_sum
        |  FROM d WHERE sel = 0 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT 'unknown', CAST(3 * COUNT(*) AS BIGINT), CAST(2 * COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id * 8 + 2) AS BIGINT)
        |  FROM d WHERE sel = 2 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT 'video', CAST(3 * COUNT(*) AS BIGINT), CAST(2 * COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id * 8 + 2) AS BIGINT)
        |  FROM d WHERE sel = 1 HAVING COUNT(*) > 0)
        |ORDER BY kind""".stripMargin,

    // WebP typing: still layouts are images (n_frames 1), the animated
    // container is video with its exact ANMF count; no rate/samples
    "x193_webp_probe" ->
      """WITH d AS (SELECT doc_id, (doc_id // 20) % 3 AS sel,
        |    16 + doc_id % 9 AS w, 16 + doc_id % 7 AS h,
        |    2 + doc_id % 5 AS af
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id,
        |  CASE WHEN sel = 2 THEN 'video' ELSE 'image' END AS kind,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(CASE WHEN sel = 2 THEN af ELSE 1 END AS INT) AS n_frames,
        |  CAST(-1 AS INT) AS sample_rate, CAST(-1 AS BIGINT) AS n_samples
        |FROM d ORDER BY doc_id""".stripMargin,

    // TIFF typing: image kind, exact dims, n_frames = IFD page count
    "x194_tiff_probe" ->
      """WITH d AS (SELECT doc_id,
        |    100 + doc_id % 9 AS w, 80 + doc_id % 7 AS h,
        |    1 + doc_id % 4 AS pages
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id, 'image' AS kind,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(pages AS INT) AS n_frames,
        |  CAST(-1 AS INT) AS sample_rate, CAST(-1 AS BIGINT) AS n_samples
        |FROM d ORDER BY doc_id""".stripMargin,

    // SQL-path twin of x187 (same capstone through the table function)
    "x188_sql_media_dedup" ->
      """WITH d AS (SELECT doc_id, (doc_id // 20) % 3 AS sel
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT * FROM (
        |  SELECT 'audio' AS kind, CAST(2 * COUNT(*) AS BIGINT) AS n_in,
        |    CAST(COUNT(*) AS BIGINT) AS n_kept, CAST(COUNT(*) AS BIGINT) AS n_dropped,
        |    CAST(SUM(doc_id * 2) AS BIGINT) AS kept_id_sum
        |  FROM d WHERE sel = 1 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT 'image', CAST(2 * COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id * 2) AS BIGINT)
        |  FROM d WHERE sel = 0 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT 'unknown', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(SUM(doc_id * 2 + 100000001) AS BIGINT)
        |  FROM d HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT 'video', CAST(2 * COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id * 2) AS BIGINT)
        |  FROM d WHERE sel = 2 HAVING COUNT(*) > 0)
        |ORDER BY kind""".stripMargin,

    // chunked-forced gapFillAuto == plain LOCF (x109's oracle verbatim)
    "x174_gapfill_auto" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        |  (v IS NULL AND LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL) AS was_filled
        |FROM m ORDER BY event_id""".stripMargin,

    // chunked-forced resampleAuto == plain resample (x17's oracle verbatim)
    "x175_resample_auto" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', MIN(ts)) AS mn, MAX(ts) AS mx
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT user_id, UNNEST(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 HOUR)) AS gts
        |  FROM b)
        |SELECT g.user_id, epoch_ms(gts) AS grid_ms, e.value
        |FROM g ASOF LEFT JOIN events e
        |  ON g.user_id = e.user_id AND g.gts >= e.ts
        |ORDER BY g.user_id, grid_ms""".stripMargin,

    // chunked backward as-of == plain backward as-of (left-join form)
    "x168_asof_chunked" ->
      """SELECT p.event_id, p.user_id, s.signup_event FROM
        |  (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |  (SELECT user_id, ts, event_id AS signup_event FROM events
        |   WHERE event_type = 'signup') s
        |ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,

    // 3 power iterations unrolled as CTEs over the 6dp-rounded gram;
    // vector re-rounded 6dp per step (norm too); sign fixed at the
    // largest-|x| component (smallest i on ties); v0 = 1/sqrt(64) exact
    "x164_pca_project" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |g0 AS (SELECT ii.i AS i, jj.j AS j, ROUND(SUM(v[ii.i+1]*v[jj.j+1]), 6) AS g
        |       FROM e, range(64) ii(i), range(64) jj(j) WHERE jj.j >= ii.i GROUP BY 1, 2),
        |gs AS (SELECT i, j, g FROM g0 UNION ALL SELECT j AS i, i AS j, g FROM g0 WHERE i <> j),
        |v0 AS (SELECT i, 0.125 AS x FROM range(64) t(i)),
        |w1 AS (SELECT gs.i AS i, SUM(gs.g * v0.x) AS w FROM gs JOIN v0 ON gs.j = v0.i GROUP BY 1),
        |n1 AS (SELECT ROUND(SQRT(SUM(w*w)), 6) AS n FROM w1),
        |v1 AS (SELECT i, ROUND(w / (SELECT n FROM n1), 6) AS x FROM w1),
        |w2 AS (SELECT gs.i AS i, SUM(gs.g * v1.x) AS w FROM gs JOIN v1 ON gs.j = v1.i GROUP BY 1),
        |n2 AS (SELECT ROUND(SQRT(SUM(w*w)), 6) AS n FROM w2),
        |v2 AS (SELECT i, ROUND(w / (SELECT n FROM n2), 6) AS x FROM w2),
        |w3 AS (SELECT gs.i AS i, SUM(gs.g * v2.x) AS w FROM gs JOIN v2 ON gs.j = v2.i GROUP BY 1),
        |n3 AS (SELECT ROUND(SQRT(SUM(w*w)), 6) AS n FROM w3),
        |v3 AS (SELECT i, ROUND(w / (SELECT n FROM n3), 6) AS x FROM w3),
        |piv AS (SELECT x FROM v3 ORDER BY ABS(x) DESC, i ASC LIMIT 1),
        |vf AS (SELECT i, CASE WHEN (SELECT x FROM piv) < 0 THEN -x ELSE x END AS x FROM v3)
        |SELECT e.vec_id, ROUND(SUM(e.v[vf.i+1] * vf.x), 6) AS proj
        |FROM e, vf GROUP BY 1 ORDER BY 1""".stripMargin,

    "x152_stitch" ->
      """WITH lng AS (SELECT doc_id, text FROM documents WHERE LENGTH(text) >= 200),
        |pages AS (
        |  SELECT doc_id * 2 AS id, SUBSTR(text, 1, 150) AS s FROM lng
        |  UNION ALL
        |  SELECT doc_id * 2 + 1, SUBSTR(text, 121, LENGTH(text) - 120) FROM lng
        |  UNION ALL
        |  SELECT doc_id * 2, text FROM documents WHERE LENGTH(text) < 200),
        |el AS (SELECT id, s FROM pages WHERE LENGTH(s) >= 30),
        |tl AS (SELECT id AS id_a, SUBSTR(s, LENGTH(s) - 29, 30) AS boundary FROM el),
        |hd AS (SELECT id AS id_b, SUBSTR(s, 1, 30) AS hk FROM el)
        |SELECT id_a, id_b, boundary FROM tl JOIN hd ON boundary = hk AND id_a <> id_b
        |ORDER BY 1, 2""".stripMargin,

    // full blocks only (partial tails dropped, <16-byte docs emit nothing);
    // OCTET_LENGTH on the blob, not LENGTH: the Spark side frames UTF-8
    // BYTES, and char counting would diverge on any non-ASCII document
    "x13_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, OCTET_LENGTH(CAST(text AS BLOB)) // 16 AS n_frames FROM documents),
        |idx AS (
        |  SELECT doc_id, UNNEST(RANGE(0, n_frames)) AS i FROM f)
        |SELECT doc_id, COUNT(1) AS n_sampled,
        |  CAST(COUNT(1) * 16 AS BIGINT) AS sampled_bytes
        |FROM idx WHERE i % 4 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
