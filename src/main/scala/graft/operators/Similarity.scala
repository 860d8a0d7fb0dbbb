package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array&lt;float&gt;). (Distributed top-k similarity framing follows the
  * published stream/batch designs — e.g. "Time Series Similarity Search
  * for Streaming Data in Distributed Systems", EDBT 2019, and
  * "Incremental Based Framework for Efficient Top-K Similarity Search",
  * EDBT 2020 — see PAPERS.md.) Three paths:
  *
  *   - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline.
  *     Cost is |Q|·|C|; run it with a broadcast query set (queries are
  *     always the small side).
  *   - [[lshTopK]] — random-hyperplane LSH (Charikar '02): sign-bit
  *     signatures bucket the corpus; only colliding buckets are re-ranked
  *     exactly. At 100 TB the corpus is hash-partitioned by bucket and the
  *     per-bucket work is a broadcast join — no cross product.
  *
  * All vector math runs as native Catalyst expressions with codegen
  * ([[graft.functions.vector]]) — no UDFs, no MLlib dependency, tight
  * JIT'd loops inside WholeStageCodegen (higher-order functions measured
  * slower: their lambdas evaluate interpreted per element).
  */
object Similarity {

  /** Dot product of two array&lt;double&gt; columns (double acc, sequential
    * fold → deterministic). Native codegen expression — the HOF
    * formulation (`aggregate(zip_with(...))`) evaluates its lambdas
    * interpreted per element ([[graft.functions.vector]]).
    */
  def dot(a: Column, b: Column): Column = graft.functions.vector.dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: fused one-pass native expression, bit-equal to
    * dot/(norm·norm).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.vector.cosine(a, b)

  /** Symmetric int8 quantization of an embedding (the storage/serving
    * compression step before an ANN index ships): per-vector
    * `scale = max|v| / 127`, `q_i = floor(v_i/scale + 0.5)` — half-up via
    * `floor(x+0.5)`, which (unlike `round()`) has identical tie semantics
    * in every engine, so the quantized bytes are reproducible
    * cross-engine. A zero vector quantizes to zeros with scale 0. Returns
    * `struct(scale, max_abs, q)` with `q: array&lt;long&gt;` bounded in
    * [−127, 127] by construction (max|v|/scale = 127 exactly at the
    * extreme; no clamp needed). Pure per-row projection — zero shuffle,
    * embarrassingly parallel at any corpus size; dequantization error is
    * ≤ scale/2 per component (≈ max|v|/254).
    *
    * Runs as the native [[graft.functions.vector.QuantizeInt8]] kernel
    * (the declarative twin's four interpreted lambda traversals per row
    * measured 0.05 M vec/s at 2 M x 64 dims — `StressXOps quantize`);
    * [[quantizeInt8Declarative]] is kept as the semantic spec and is
    * asserted bit-equal in `DedupSimilaritySpec`.
    */
  def quantizeInt8(vec: Column): Column = graft.functions.vector.quantize_int8(vec)

  /** The declarative HOF formulation of [[quantizeInt8]] — the portable
    * semantic spec (mirrors the x32 DuckDB oracle SQL shape). Interpreted
    * lambda evaluation makes it ~wire-speed-only; use [[quantizeInt8]].
    */
  private[graft] def quantizeInt8Declarative(vec: Column): Column = {
    val v = transform(vec, x => x.cast("double"))
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = maxAbs / lit(127.0)
    val q = transform(
      v,
      x => when(maxAbs === lit(0.0), lit(0L)).otherwise(floor(x / scale + lit(0.5)))
    )
    struct(scale.as("scale"), maxAbs.as("max_abs"), q.as("q"))
  }

  /** Exact top-k neighbors for each query row. `queries` must be small
    * (it is broadcast); the corpus side streams — one scan, no shuffle of
    * the corpus, a per-partition top-k via the rank window on
    * (query, similarity).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vec: String,
      id: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** [[bruteForceTopK]] on INT8-QUANTIZED vectors with exact rescoring —
    * the memory-bound scale path: the shortlist scan reads 1/8 the bytes
    * of the float64 corpus (the real lever when 100 TB of embeddings
    * must stream through the ranker), then only `shortlist` candidates
    * per query are rescored at full precision. Quantized cosine needs no
    * dequantization at all: cos(q_a·s_a, q_b·s_b) = cos(q_a, q_b) — the
    * symmetric scales cancel — so the approx pass reuses the same fused
    * native [[cosine]] kernel on the integer-valued arrays, and because
    * every input is an exact small integer the approx ORDERING (and its
    * shortlist boundary) is bit-reproducible across engines, which is
    * what lets the DuckDB oracle replay the whole two-stage pipeline.
    * Shortlist ties and final ties both break by neighbor id.
    *
    * Recall is governed by `shortlist`: a true top-k neighbor is missed
    * only if quantization noise (≤ scale/2 per component) demotes it
    * below `shortlist` approx-rank — at 4×k it is effectively exact on
    * real embedding distributions.
    */
  def quantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vec: String,
      id: String,
      k: Int,
      shortlist: Int = 20
  ): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    def withQ(df: DataFrame, idAs: String, vAs: String, qAs: String) =
      df.select(
        col(id).as(idAs),
        col(vec).as(vAs),
        transform(quantizeInt8(col(vec)).getField("q"), x => x.cast("double")).as(qAs)
      )
    val q = withQ(queries, "query_id", "qv", "qq")
    val c = withQ(corpus, "neighbor_id", "cv", "cq")
    val approxW = Window.partitionBy(col("query_id")).orderBy(col("approx").desc, col("neighbor_id"))
    val exactW = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("approx", cosine(col("qq"), col("cq")))
      .withColumn("__ar", row_number().over(approxW))
      .filter(col("__ar") <= shortlist)
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 6).as("sim"))
  }

  /** Random-hyperplane signature: bit i = sign(dot(v, h_i)) (Charikar '02).
    * Hyperplane components derive from xxhash64(seed=i, dim=j) mapped to
    * [-1, 1] — deterministic, no stored model. Native expression with a
    * per-task precomputed plane matrix ([[graft.functions.vector]]): the
    * HOF formulation recomputed O(bits·dim) interpreted hash calls per ROW;
    * signatures are bit-identical.
    */
  def hyperplaneSignature(vec: Column, bits: Int): Column =
    graft.functions.vector.hyperplane_sig(vec, bits)

  /** Squared L2 distance between two array columns (native, one pass). */
  def l2sq(a: Column, b: Column): Column = graft.functions.vector.l2sq(a, b)

  // `n` nearest cells of `v` as array<int> of cell ids: ONE native
  // codegen pass over all nlist distances with in-loop top-n selection
  // ([[graft.functions.vector.NearestCells]]) — the HOF
  // transform+array_sort formulation evaluated its lambda interpreted
  // per centroid per row, the dominant per-row cost of assignment at
  // corpus scale. Ordering (distance, cell) is bit-compatible.
  private def nearestCells(v: Column, cents: Seq[Seq[Double]], n: Int): Column =
    graft.functions.vector.nearest_cells(v, cents, n)

  private def withCell(df: DataFrame, vc: String, cents: Seq[Seq[Double]]): DataFrame =
    df.withColumn("cell", element_at(nearestCells(col(vc), cents, 1), 1))

  /** IVF training (the train half of train-once / probe-many — see
    * [[ivfProbe]]): `iters` Lloyd rounds over the corpus, centroids seeded
    * from the first `nlist` rows by id (deterministic). Returns the
    * centroid TABLE `(cell int, centroid array<double>)` — nlist rows,
    * KBs — which the caller persists once (a parquet write at 100 TB
    * scale) and reuses across every probe call; retraining per query
    * batch was the round-3 review's top API gap.
    *
    * Assignment during training is SHUFFLE-FREE: the centroid table rides
    * into the plan as one literal and the argmin is a pure column
    * expression — a cross-join + window formulation would re-shuffle
    * nlist× the corpus every Lloyd round. The only exchange per round is
    * the (nlist × dim)-row partial-aggregated mean. Empty cells keep
    * their previous centroid.
    */
  def ivfTrain(
      corpus: DataFrame,
      vec: String,
      id: String,
      nlist: Int = 16,
      iters: Int = 2
  ): DataFrame = {
    val c = corpus.select(col(id).as("cid"), col(vec).as("cv"))

    // seed: first nlist vectors by id
    var cents: Seq[Seq[Double]] = c
      .orderBy(col("cid"))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Double](1).toVector)
      .toVector

    // Lloyd rounds: element-wise mean per cell (posexplode + avg per slot;
    // partial aggregation completes map-side, the exchange carries only
    // ~nlist×dim rows per input partition).
    (1 to iters).foreach { _ =>
      val means = withCell(c, "cv", cents)
        .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toVector))
        .toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i))).toVector
    }

    val spark = corpus.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case (cent, cell) => (cell, cent) }.toDF("cell", "centroid")
  }

  /** IVF serve path: probe a TRAINED centroid table (from [[ivfTrain]],
    * possibly read back from storage) — centroids are computed once and
    * reused across query batches, the 100 TB usage pattern. The tiny
    * table (nlist × dim, KBs) is collected into one plan literal so both
    * cell assignment and query probing stay shuffle-free native codegen;
    * the only exchanges are the broadcast of the probe set and the final
    * per-query top-k.
    */
  def ivfProbe(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      vec: String,
      id: String,
      k: Int,
      nprobe: Int = 4
  ): DataFrame = {
    val rows = centroids
      .select(col("cell").cast("int").as("cell"), col("centroid").cast("array<double>"))
      .collect()
    val byCell = rows.map(r => (r.getInt(0), r.getSeq[Double](1).toVector)).sortBy(_._1)
    require(
      byCell.nonEmpty && byCell.map(_._1).toSeq == (0 until byCell.length),
      s"centroid table must carry contiguous cells 0..n-1, got ${byCell.map(_._1).mkString(",")}"
    )
    val cents: Seq[Seq[Double]] = byCell.map(_._2).toVector

    val c = corpus.select(col(id).as("cid"), col(vec).as("cv"))
    val cells = withCell(c, "cv", cents) // (cid, cv, cell) — no shuffle

    // queries probe their nprobe nearest cells
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
    val probes = q
      .withColumn("cell", explode(nearestCells(col("qv"), cents, math.min(nprobe, cents.length))))
      .select(col("query_id"), col("qv"), col("cell"))

    // rerank exactly within the probed cells
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cells
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("cid"))
      .withColumnRenamed("cid", "neighbor_id")
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** IVF (inverted-file) ANN — the clustering scale path (à la FAISS IVF,
    * public design): k-means-lite partitions the corpus into `nlist` cells;
    * a query probes its `nprobe` nearest cells and only those are reranked
    * exactly. At 100 TB the corpus is hash-partitioned by cell id, the
    * centroid table (nlist × dim, KBs) broadcasts, and each query touches
    * nprobe/nlist of the data — the scan shrinks by that factor.
    *
    * One-shot composition of [[ivfTrain]] + [[ivfProbe]]; production
    * callers with recurring query batches should train once, persist the
    * centroid table, and call [[ivfProbe]] per batch.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vec: String,
      id: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2
  ): DataFrame =
    ivfProbe(ivfTrain(corpus, vec, id, nlist, iters), corpus, queries, vec, id, k, nprobe)

  /** Semantic dedup (SemDeDup, Abbas et al. '23, public arXiv design):
    * k-means-cluster the embedding space, then drop near-duplicates ONLY
    * within each cluster — pairwise cosine is confined to cluster members,
    * so the quadratic term is Σ|cluster|², not n², and nlist is the dial
    * that keeps clusters bounded as the corpus grows (SemDeDup runs 50k
    * clusters at 100 M docs; clusters hash-partition, the centroid model
    * is a plan literal, and the join is a plain equality join on cell id).
    *
    * `centroids` is the TRAINED model ([[ivfTrain]] or read back from
    * storage — same train-once / serve-many split as [[ivfProbe]]).
    * Representative policy: a doc is dropped iff some SMALLER id in its
    * cluster is cosine-≥-`threshold` similar (deterministic under any
    * partitioning; the paper keeps the lowest-centroid-similarity member,
    * an equally arbitrary but costlier choice). Misses across cluster
    * boundaries are the documented SemDeDup approximation — near-identical
    * vectors share a nearest centroid except at cell edges.
    *
    * Over-full-cell guard: the within-cell self-join is Σ|cell|² by
    * design, which is fine exactly as long as every cell stays bounded.
    * A degenerate cell (near-zero embeddings, a boilerplate cluster, or
    * nlist too small for the corpus) would silently go quadratic inside
    * ONE join partition — a job-killer at 100 TB. Cells larger than
    * `maxCell` are therefore excluded from the pairwise pass (all their
    * members come back `kept = true` — deduping them needs a retrain
    * with larger nlist, not an unbounded join), and the shed is surfaced
    * the same way [[cosineNearDupPairs]] surfaces over-full buckets: a
    * named lazy observation (`semantic_dedup_shed_<k>`: dropped_rows,
    * max_cell) plus the once-per-session listener printing any non-zero
    * shed to stderr at action time. The cell-size count is a window over
    * `cell` — the SAME key the self-join hash-partitions on, so the
    * guard adds no new shuffle key; the nearest-centroid projection runs
    * once per join side (plan-literal centroids, linear codegen pass),
    * the same inline-twice trade documented on [[cosineNearDupPairs]].
    * Default `maxCell` = 20 000: SemDeDup's own operating point is ~2 000
    * docs/cluster (100 M docs / 50 k clusters), so 10× that headroom
    * means the cap only fires on genuinely degenerate cells; 20 000²/2
    * pairwise cosines in one task is seconds of compute, not hours.
    *
    * Returns one row per corpus doc: (`id`, cell, kept).
    */
  def semanticDedup(
      centroids: DataFrame,
      corpus: DataFrame,
      vec: String,
      id: String,
      threshold: Double,
      maxCell: Int = 20000
  ): DataFrame = {
    val rows = centroids
      .select(col("cell").cast("int").as("cell"), col("centroid").cast("array<double>"))
      .collect()
    val byCell = rows.map(r => (r.getInt(0), r.getSeq[Double](1).toVector)).sortBy(_._1)
    require(
      byCell.nonEmpty && byCell.map(_._1).toSeq == (0 until byCell.length),
      s"centroid table must carry contiguous cells 0..n-1, got ${byCell.map(_._1).mkString(",")}"
    )
    val cents: Seq[Seq[Double]] = byCell.map(_._2).toVector

    val cells = withCell(corpus.select(col(id).as("cid"), col(vec).as("cv")), "cv", cents)
    registerShedReporter(corpus.sparkSession)
    val bounded = cells
      .withColumn("cn", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .observe(
        s"semantic_dedup_shed_${shedObservationIds.getAndIncrement()}",
        sum(when(col("cn") > maxCell, lit(1L)).otherwise(lit(0L))).as("dropped_rows"),
        max(col("cn")).as("max_cell")
      )
      .filter(col("cn") <= maxCell)
      .drop("cn")
    val left = bounded.select(col("cell"), col("cid").as("id_a"), col("cv").as("va"))
    val right = bounded.select(col("cell"), col("cid").as("id_b"), col("cv").as("vb"))
    val dropped = left
      .join(right, Seq("cell"))
      .filter(col("id_a") < col("id_b") && cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as("cid"))
      .distinct()
    cells
      .join(dropped.withColumn("__drop", lit(true)), Seq("cid"), "left")
      .select(
        col("cid").as(id),
        col("cell"),
        coalesce(!col("__drop"), lit(true)).as("kept")
      )
  }

  /** Embedding-cosine near-duplicate pairs: corpus rows whose vectors are
    * near-identical (cosine ≥ threshold), the embedding-space twin of
    * [[Dedup.minhashPairs]]. Candidates come from hyperplane-signature
    * block collisions (pigeonhole multi-probe) and are verified with exact
    * cosine — an equality hash join on block keys, no cross product.
    *
    * Scale shape: 32 signature bits in 4 blocks → 8-bit block keys. Narrow
    * keys (4-bit) make near-uniform buckets of n/16 rows each and the
    * self-join degenerates toward n²/16 candidate pairs; 8-bit keys cut
    * candidates 16× while keeping recall ≥ 0.97 for true near-dups
    * (cos ≥ 0.99 → per-bit flip prob ≈ 0.045 → P(≥1 of 4 blocks matches)
    * ≈ 1−(1−0.955⁸)⁴; planted-pair recall asserted in ExtensionsSpec).
    * Buckets larger than `maxBucket` are dropped (they carry no near-dup
    * signal — a bucket that big means the key bits don't discriminate),
    * never silently ballooned; the drop count is surfaced LAZILY through a
    * named observation (`cosine_neardup_shed_<k>`: dropped_rows,
    * max_bucket — unique per invocation, so multiple instances compose in
    * one query), and a once-per-session QueryExecutionListener prints any
    * non-zero shed to stderr at action time. The operator stays a pure
    * `DataFrame => DataFrame`: no eager job, no cached relation to leak,
    * no work until the caller runs an action.
    *
    * Plan shape: bucket sizes come from a count window over (blk, key)
    * INSIDE the plan — the window's shuffle is on the same keys the
    * self-join needs. Because the join references the blocked relation
    * twice, Catalyst inlines the subtree and the signature+window pass
    * runs once per join side (two passes total — verified in PLANS.md;
    * CollectMetrics blocks exchange-reuse canonicalization). That is the
    * right trade at 100 TB: two linear, embarrassingly-parallel codegen
    * passes beat persisting a blocks×corpus-sized relation
    * (MEMORY_AND_DISK pressure plus the construction-time job and cache
    * leak of the r2 approach).
    *
    * Candidate rows carry ONLY (id, block key) — 16 bytes — through the
    * band join and the pair-dedup shuffle; exact cosine re-joins the
    * vectors by id afterwards (two plain equi-joins against the
    * signature-free corpus), the same ids-only candidate layout as
    * [[Dedup.minhashPairs]]. The earlier formulation carried both
    * vectors through the join+dedup, which at dim=64 ships ~1 KB per
    * candidate pair — measured at a 2 M-vector stress that is a
    * ~100 GB dedup shuffle vs ~2 GB for ids-only, and it only gets
    * worse with dim.
    */
  def cosineNearDupPairs(
      corpus: DataFrame,
      vec: String,
      id: String,
      threshold: Double = 0.95,
      bits: Int = 32,
      blocks: Int = 4,
      maxBucket: Int = 4096
  ): DataFrame = {
    val width = bits / blocks
    val signed = corpus.select(
      col(id).as("vid"),
      hyperplaneSignature(col(vec), bits).as("sig")
    )
    val blocked = signed
      .select(
        col("vid"),
        explode(array((0 until blocks).map { b =>
          struct(lit(b).as("blk"), shiftright(col("sig"), b * width).bitwiseAND((1L << width) - 1).as("key"))
        }: _*)).as("bk")
      )
      .select(col("vid"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    registerShedReporter(corpus.sparkSession)
    val sized = blocked
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("blk"), col("key"))))
      .observe(
        s"cosine_neardup_shed_${shedObservationIds.getAndIncrement()}",
        sum(when(col("bn") > maxBucket, lit(1L)).otherwise(lit(0L))).as("dropped_rows"),
        max(col("bn")).as("max_bucket")
      )
    val kept = sized.filter(col("bn") <= maxBucket).drop("bn")
    val cand = kept
      .join(kept.select(col("blk"), col("key"), col("vid").as("vid_b")), Seq("blk", "key"))
      .filter(col("vid") < col("vid_b"))
      .select(col("vid"), col("vid_b"))
      .dropDuplicates("vid", "vid_b")
    val vecs = corpus.select(col(id), col(vec))
    cand
      .join(vecs.select(col(id).as("vid"), col(vec).as("v")), Seq("vid"))
      .join(vecs.select(col(id).as("vid_b"), col(vec).as("v_b")), Seq("vid_b"))
      .withColumn("cos", cosine(col("v"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("vid").as("id_a"), col("vid_b").as("id_b"), col("cos"))
  }

  private val shedObservationIds = new java.util.concurrent.atomic.AtomicLong(0L)
  private val shedReporterSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]()
      )
    )

  /** Default visibility for over-full-bucket shedding: a once-per-session
    * listener that prints any non-zero `cosine_neardup_shed_*` observation
    * to stderr when the action completes — drops are reported without the
    * operator running an eager job (callers needing programmatic access
    * read the observation themselves).
    */
  private def registerShedReporter(spark: org.apache.spark.sql.SparkSession): Unit =
    if (shedReporterSessions.add(spark)) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(
            funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long
        ): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("cosine_neardup_shed_") && !row.isNullAt(0) && row.getLong(0) > 0L)
              System.err.println(
                s"[cosineNearDupPairs] $name: dropped ${row.getLong(0)} over-full-bucket rows " +
                  s"(largest bucket ${row.get(1)}) — signature bits do not discriminate there; " +
                  "raise bits or maxBucket to keep them"
              )
            if (name.startsWith("semantic_dedup_shed_") && !row.isNullAt(0) && row.getLong(0) > 0L)
              System.err.println(
                s"[semanticDedup] $name: ${row.getLong(0)} rows sit in cells past maxCell " +
                  s"(largest cell ${row.get(1)}) and were kept UN-deduped — the centroid model " +
                  "does not discriminate there; retrain with larger nlist to dedup them"
              )
          }
        override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      })
    }

  /** ANN top-k: candidates = corpus rows whose signature matches the query
    * signature in at least one of `blocks` signature blocks (multi-probe by
    * pigeonhole, same blocking trick as [[Dedup.simhashPairs]]); candidates
    * are re-ranked by exact cosine. Recall is tunable via bits/blocks.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vec: String,
      id: String,
      k: Int,
      bits: Int = 16,
      blocks: Int = 4
  ): DataFrame = {
    val width = bits / blocks
    def blockKeys(sig: Column): Column = array((0 until blocks).map { b =>
      struct(lit(b).as("blk"), shiftright(sig, b * width).bitwiseAND((1L << width) - 1).as("key"))
    }: _*)

    val c = corpus
      .select(col(id).as("neighbor_id"), col(vec).as("cv"), hyperplaneSignature(col(vec), bits).as("sig"))
      .select(col("neighbor_id"), col("cv"), explode(blockKeys(col("sig"))).as("bk"))
      .select(col("neighbor_id"), col("cv"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    val q = queries
      .select(col(id).as("query_id"), col(vec).as("qv"), hyperplaneSignature(col(vec), bits).as("sig"))
      .select(col("query_id"), col("qv"), explode(blockKeys(col("sig"))).as("bk"))
      .select(col("query_id"), col("qv"), col("bk.blk").as("blk"), col("bk.key").as("key"))

    val cand = c
      .join(broadcast(q), Seq("blk", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Johnson-Lindenstrauss random projection to `k` dimensions with
    * Achlioptas ±1 signs (Achlioptas 2003: a dense sub-Gaussian sign
    * matrix preserves pairwise distances as well as Gaussian entries) —
    * the dimensionality-reduction pass run before ANN / semantic dedup
    * when the embedding width, not the corpus size, is the cost driver
    * (y = S·v/√k, E‖y_a−y_b‖² = ‖a−b‖²). Signs derive from the md5 of
    * `(i, j)`, so the matrix is reproducible anywhere, including the
    * SQL oracle. Returns one row per (vec_id, j) with the 6dp-rounded
    * component (engine-portable: both engines sum the products in
    * ascending index order over exact float→double values).
    *
    * Shape at 100 TB: the sign matrix is a k×dim plan literal (the
    * centroid-table pattern — KBs), each component is one native
    * codegen [[graft.functions.vector.dot]] pass, and the whole operator
    * is a zero-shuffle projection.
    */
  def randomProject(df: DataFrame, idCol: Column, vecCol: Column, dim: Int, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(dim > 0, s"dim must be positive, got $dim")
    def signOf(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(s"${i}_${j}".getBytes("UTF-8"))
      if ((((md(0) >> 4) & 0xf) % 2) == 0) 1.0 else -1.0
    }
    val signs = Array.tabulate(k)(j => Array.tabulate(dim)(i => signOf(i, j)))
    val vecd = transform(vecCol, _.cast("double"))
    val comps = (0 until k).map(j =>
      round(graft.functions.vector.dot(vecd, lit(signs(j))) / math.sqrt(k.toDouble), 6)
    )
    df.select(idCol.as("vec_id"), posexplode(array(comps: _*)).as(Seq("j", "y")))
  }

  /** Embedding sanity gate on the L2-norm z-score: flags collapsed
    * (near-zero), exploded (mis-scaled), and otherwise corrupted vectors —
    * the failure modes an embedding-generation stage actually produces
    * (truncated batches, fp16 overflow, double-applied normalization).
    * For a corpus of unit-normalized embeddings the natural norm
    * distribution is a spike at 1.0, so ANY corruption sits many σ out;
    * for un-normalized corpora the z-score adapts to whatever the natural
    * scale is. Returns every scoreable row (non-null vector) with its
    * norm, z-score, and the |z| > `zThresh` flag.
    *
    * Scale shape: one corpus scan computing the norm in a single native
    * codegen pass ([[graft.functions.vector.dot]] — ascending-index loop,
    * so the double is bit-identical in any engine that sums in index
    * order), one 1-row global aggregate for (μ, σ), and a broadcast
    * (cross) join of that row back — zero corpus shuffles. σ = 0
    * (all-identical norms) degrades to z = 0: nothing is an outlier of a
    * point mass.
    */
  def normOutliers(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      zThresh: Double = 5.0
  ): DataFrame = {
    require(zThresh > 0, s"zThresh must be positive, got $zThresh")
    val vecd = transform(vecCol, _.cast("double"))
    val scored = df
      .filter(vecCol.isNotNull)
      .select(idCol.as("vec_id"), sqrt(dot(vecd, vecd)).as("l2_norm"))
    val stats = scored.agg(
      avg(col("l2_norm")).as("mu"),
      stddev_samp(col("l2_norm")).as("sd")
    )
    val z = when(col("sd") === 0.0 || col("sd").isNull, lit(0.0))
      .otherwise((col("l2_norm") - col("mu")) / col("sd"))
    scored
      .crossJoin(stats)
      .select(
        col("vec_id"),
        round(col("l2_norm"), 6).as("l2_norm"),
        round(z, 6).as("z"),
        (abs(z) > zThresh).as("is_outlier")
      )
  }

  /** Mean-pool embeddings per group — the passage→document (or
    * chunk→document) pooling step of an embedding pipeline: one averaged
    * vector per group, components rounded to 6 dp for engine-portable
    * comparison, plus the member count.
    *
    * Scale shape: `posexplode` turns the corpus into (group, index,
    * value) rows, but the (group, index) hash aggregate runs map-side
    * partials, so the one exchange carries `groups × dim` rows — model
    * state, not corpus state; the second (group-level) aggregate
    * reassembles the vector from `dim` rows per group. For very large
    * `dim` fuse the two with a custom vector-sum `Aggregator` (one
    * exchange of `groups` array rows); at typical embedding dims the
    * two-level relational shape is already exchange-light and stays
    * whole-stage-codegen end to end.
    */
  def meanPoolByGroup(df: DataFrame, groupCol: Column, vecCol: Column): DataFrame =
    df.filter(vecCol.isNotNull)
      .select(groupCol.as("group"), posexplode(transform(vecCol, _.cast("double"))).as(Seq("i", "v")))
      .groupBy(col("group"), col("i"))
      .agg(count(lit(1)).as("cnt"), round(avg(col("v")), 6).as("m"))
      .groupBy(col("group"))
      .agg(
        max(col("cnt")).as("n_vecs"),
        count(lit(1)).cast("int").as("dim"),
        transform(
          array_sort(collect_list(struct(col("i"), col("m")))),
          e => e.getField("m")
        ).as("vec")
      )

  /** Class centroids for [[topicAssign]]: per-label mean embedding via
    * [[meanPoolByGroup]], collected to the driver. The collect is BOUNDED
    * model state (labels × dim doubles — KBs), the same documented shape
    * as [[ivfTrain]]'s centroid table; the 6dp component round makes the
    * centroids engine-exact, so downstream cosine argmax runs on
    * bit-identical inputs in any engine.
    */
  def trainTopicCentroids(
      df: DataFrame,
      labelCol: Column,
      vecCol: Column
  ): Seq[(Long, Array[Double])] =
    meanPoolByGroup(df, labelCol.cast("long"), vecCol)
      .select(col("group"), col("vec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
      .toSeq

  /** Nearest-centroid topic assignment (few-shot corpus labeling /
    * cluster-membership routing): score every vector against a bounded
    * centroid table by cosine and emit the argmax topic, its similarity,
    * and the margin over the runner-up — the margin is the confidence
    * signal a routing gate thresholds on.
    *
    * Shape at 100 TB: the centroid table is a PLAN LITERAL (labels × dim
    * doubles), every per-centroid cosine is one native codegen pass over
    * the row's embedding, and argmax/margin are array expressions over
    * that bounded array — ZERO shuffle, zero joins, one corpus scan.
    * Ties on the (deterministic) cosine resolve to the lowest label
    * because [[array_position]] returns the FIRST match in label order.
    */
  /** Cross-modal alignment gate (the CLIP-score filter of an image-text
    * corpus, LAION-style): cosine between the two modality embeddings of
    * each PAIRED row, thresholded — mismatched captions (scraper bugs,
    * alt-text spam) score like random pairs and fall out. Pure per-row
    * native cosine, zero shuffle; count-and-flag, never a silent drop.
    * The caller supplies already-paired rows — at 100 TB the pairing
    * join upstream is id-keyed and this gate adds no exchange to it.
    */
  def alignmentGate(
      pairs: DataFrame,
      idCol: Column,
      vecA: Column,
      vecB: Column,
      threshold: Double = 0.95
  ): DataFrame =
    pairs
      .select(
        idCol.as("pair_id"),
        round(cosine(transform(vecA, _.cast("double")), transform(vecB, _.cast("double"))), 6)
          .as("align")
      )
      // Spark orders NaN ABOVE every number, so a zero-norm embedding
      // (align = NaN) would pass a plain >= gate; nanvl pins it to fail
      .withColumn("aligned", nanvl(col("align"), lit(-1.0)) >= threshold)

  /** Incremental SEMANTIC ingest gate: the embedding-space sibling of the
    * exact-digest ([[graft.operators.Dedup.incremental]]) and fuzzy-text
    * ([[graft.operators.Dedup.incrementalFuzzy]]) gates — drop batch
    * items whose embedding is ≥ `threshold` cosine to anything already in
    * the accepted corpus. Candidates come from Charikar hyperplane
    * signatures cut into Manku-style blocks: the default is the FULL
    * 64-bit signature in 4×16-bit blocks — 65536 keys per block, so a
    * 100 M-vector reference still averages ~1500 rows per bucket, where
    * an 8-bit cut (256 keys) melts down at millions of vectors (measured:
    * OOM at a 2 M reference). A twin at cos ≈ 0.9999 survives with
    * 1−(1−p^16)^4 ≈ 1−2.4e-5 (p = 1−θ/π ≈ 0.9955); random pairs never
    * reach the confirm join.
    *
    * Shape at 100 TB: the batch's block keys and vectors BROADCAST; the
    * reference is scanned (twice: keys pass + confirm pass) and NEVER
    * shuffled — the x35 accepted-corpus discipline. The only exchanges
    * are candidate-pair-sized (ids only). Degenerate signature cells
    * (zero/near-zero embeddings sign identically) are guarded by a
    * reference-side BUCKET-SIZE partial aggregate — 8-byte keys, output
    * ≤ blocks·2^(bits/blocks) rows, no row shuffle — and batch keys
    * landing in an over-full reference bucket are shed AND surfaced via
    * the `semantic_gate_shed` observation (the x14 pattern): a shed item
    * passes the gate unverified rather than detonating the join, and the
    * counter tells the operator's user it happened.
    */
  def incrementalSemantic(
      batch: DataFrame,
      batchId: Column,
      batchVec: Column,
      ref: DataFrame,
      refId: Column,
      refVec: Column,
      threshold: Double = 0.95,
      bits: Int = 64,
      blocks: Int = 4,
      maxBucket: Int = 65536
  ): DataFrame = {
    require(bits % blocks == 0, s"bits ($bits) must divide into blocks ($blocks)")
    val width = bits / blocks
    def blocked(df: DataFrame, idc: Column, vc: Column, idAs: String): DataFrame =
      df.select(idc.as(idAs), hyperplaneSignature(transform(vc, _.cast("double")), bits).as("sig"))
        .select(
          col(idAs),
          explode(array((0 until blocks).map { b =>
            struct(
              lit(b).as("blk"),
              shiftright(col("sig"), b * width).bitwiseAND((1L << width) - 1).as("key")
            )
          }: _*)).as("bk")
        )
        .select(col(idAs), col("bk.blk").as("blk"), col("bk.key").as("key"))
    val bKeys = blocked(batch, batchId, batchVec, "bid")
    val rKeys = blocked(ref, refId, refVec, "rid")
    // over-full-cell guard: bucket SIZES aggregate map-side to ≤
    // blocks·2^width rows; hot cells are a small join side
    val hot = rKeys
      .groupBy(col("blk"), col("key"))
      .agg(count(lit(1)).as("rn"))
      .filter(col("rn") > maxBucket)
    registerShedReporter(batch.sparkSession)
    val safeB = bKeys
      .join(broadcast(hot.select(col("blk"), col("key"), lit(true).as("__hot"))), Seq("blk", "key"), "left")
      .observe(
        s"semantic_gate_shed_${shedObservationIds.getAndIncrement()}",
        sum(when(col("__hot"), lit(1L)).otherwise(lit(0L))).as("dropped_rows"),
        count(lit(1)).as("batch_keys")
      )
      .filter(col("__hot").isNull)
      .drop("__hot")
    val cand = rKeys
      .join(broadcast(safeB), Seq("blk", "key"))
      .select(col("bid"), col("rid"))
      .dropDuplicates("bid", "rid")
    val confirmed = cand
      .join(broadcast(batch.select(batchId.as("bid"), transform(batchVec, _.cast("double")).as("bv"))), Seq("bid"))
      .join(ref.select(refId.as("rid"), transform(refVec, _.cast("double")).as("rv")), Seq("rid"))
      // nanvl: a zero-norm vector pair cosines to NaN, which Spark orders
      // ABOVE the threshold — it must fail the confirm, not pass it
      .filter(nanvl(cosine(col("bv"), col("rv")), lit(-1.0)) >= threshold)
      .groupBy(col("bid"))
      .agg(min(col("rid")).as("dup_of"), count(lit(1)).as("n_ref_matches"))
    batch
      .select(batchId.as("id"))
      .join(confirmed.withColumnRenamed("bid", "id"), Seq("id"), "left")
      .select(
        col("id"),
        col("dup_of"),
        coalesce(col("n_ref_matches"), lit(0L)).as("n_ref_matches"),
        col("dup_of").isNull.as("kept")
      )
  }

  /** Retrieval-quality harness: recall@k of an ANN result set against a
    * ground-truth neighbor set — the metric that decides whether an index
    * configuration ([[ivfTopK]]'s nprobe, [[lshTopK]]'s bits/blocks) is
    * fit to serve before it routes a corpus. Per query:
    * `recall = |results∩truth with rank ≤ k| / min(k, |truth|)` —
    * pure relational math, so the metric itself is oracle-checkable
    * independently of any index's tie-breaking.
    *
    * Shape at 100 TB: truth and results are O(queries·k) — an equi-join
    * on (query, neighbor) plus two per-query partial aggregates; the
    * corpus itself never appears.
    */
  def recallAtK(
      results: DataFrame,
      rQuery: Column,
      rNeighbor: Column,
      rRank: Column,
      truth: DataFrame,
      tQuery: Column,
      tNeighbor: Column,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val t = truth.select(tQuery.as("query_id"), tNeighbor.as("__n"))
    val r = results
      .filter(rRank <= k)
      .select(rQuery.as("query_id"), rNeighbor.as("__n"))
    val sizes = t.groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
    val hits = t
      .join(r, Seq("query_id", "__n"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    sizes
      .join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(
          coalesce(col("n_hit"), lit(0L)).cast("double") / least(lit(k.toLong), col("n_truth")),
          6
        ).as("recall")
      )
  }

  def topicAssign(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      centroids: Seq[(Long, Array[Double])]
  ): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val sorted = centroids.sortBy(_._1)
    val labels = sorted.map(_._1).toArray
    val v = transform(vecCol, _.cast("double"))
    val cosArr = array(sorted.map { case (_, c) => cosine(v, lit(c)) }: _*)
    df.select(idCol.as("vec_id"), cosArr.as("__cos"))
      .select(
        col("vec_id"),
        element_at(lit(labels), array_position(col("__cos"), array_max(col("__cos"))).cast("int"))
          .as("topic"),
        round(array_max(col("__cos")), 6).as("best_cos"),
        // second-best only exists with >= 2 centroids; with one, index -2
        // would throw under Spark 4 ANSI — the margin is null (undefined)
        when(
          size(col("__cos")) >= 2,
          round(
            array_max(col("__cos")) - element_at(array_sort(col("__cos")), -2),
            6
          )
        ).as("margin")
      )
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, "Margin-based Parallel
    * Corpus Mining with Multilingual Sentence Embeddings", ACL 2019 —
    * the LASER/CCMatrix recipe): pair each source-side embedding x with
    * its best target y, scored not by raw cosine but by the RATIO margin
    * cos(x,y) / mean(avgTopK(x→Y), avgTopK(y→X)) — the local-density
    * normalization that kills hubness false positives — and gated on
    * margin ≥ `threshold` AND mutual nearest neighborhood.
    *
    * Determinism/portability: cosines are 6dp-rounded BEFORE ranking and
    * averaging, ranks tie-break on id, so every downstream decision
    * replays bit-equal in any engine (the x85 discipline).
    *
    * Scale: this is the EXACT all-pairs variant — |X|·|Y| scored rows,
    * then two bounded row_number windows (partitions = |Y| resp. |X|).
    * The right 100 TB shape keeps this exact scorer but feeds it
    * LSH/IVF-restricted candidate pairs from the existing ANN operators
    * instead of the cross join; the margin math is unchanged, so this
    * function doubles as the calibration oracle for that pipeline.
    */
  def bitextMine(
      x: DataFrame,
      y: DataFrame,
      xIdCol: Column,
      xVecCol: Column,
      yIdCol: Column,
      yVecCol: Column,
      k: Int = 4,
      threshold: Double = 1.05
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null vectors have no cosine: dropped here (the caller's corrupt
    // accounting runs upstream), never ranked as null scores
    val xs = x
      .filter(xVecCol.isNotNull)
      .select(xIdCol.as("x_id"), transform(xVecCol, _.cast("double")).as("__xv"))
    val ys = y
      .filter(yVecCol.isNotNull)
      .select(yIdCol.as("y_id"), transform(yVecCol, _.cast("double")).as("__yv"))
    val scored = xs
      .crossJoin(ys)
      .select(col("x_id"), col("y_id"), round(cosine(col("__xv"), col("__yv")), 6).as("c"))
    bitextMarginPipeline(scored, k, threshold)
  }

  /** The candidates-restricted production path [[bitextMine]]'s scaladoc
    * promises: identical margin math, but scoring only the supplied
    * `(x_id, y_id)` candidate pairs (from the LSH/IVF generators — e.g.
    * a banded [[graft.functions.vector.hyperplane_sig]] equality join).
    * The neighborhood-density averages are then estimates over each
    * side's CANDIDATE neighborhood rather than the full corpus — exactly
    * the approximation the FAISS-retrieved-k-NN practice of the paper
    * makes; with all-pairs candidates this is bit-equal to the exact
    * scorer (asserted in the spec). Scale shape: one equi-join per side
    * to attach vectors (ids-only candidates in), then the same bounded
    * windows — candidate mass, not |X|·|Y|, bounds every stage.
    */
  def bitextMineCandidates(
      x: DataFrame,
      y: DataFrame,
      xIdCol: Column,
      xVecCol: Column,
      yIdCol: Column,
      yVecCol: Column,
      candidates: DataFrame,
      k: Int = 4,
      threshold: Double = 1.05
  ): DataFrame = {
    val xs = x
      .filter(xVecCol.isNotNull)
      .select(xIdCol.as("x_id"), transform(xVecCol, _.cast("double")).as("__xv"))
    val ys = y
      .filter(yVecCol.isNotNull)
      .select(yIdCol.as("y_id"), transform(yVecCol, _.cast("double")).as("__yv"))
    val scored = candidates
      .select(col("x_id"), col("y_id"))
      .distinct()
      .join(xs, "x_id")
      .join(ys, "y_id")
      .select(col("x_id"), col("y_id"), round(cosine(col("__xv"), col("__yv")), 6).as("c"))
    bitextMarginPipeline(scored, k, threshold)
  }

  /** Shared margin/mutual-NN pipeline over `(x_id, y_id, c)` scored
    * pairs — see [[bitextMine]] for the semantics and determinism notes.
    */
  private def bitextMarginPipeline(
      scored: DataFrame,
      k: Int,
      threshold: Double
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wx = Window.partitionBy(col("x_id")).orderBy(col("c").desc, col("y_id").asc)
    val wy = Window.partitionBy(col("y_id")).orderBy(col("c").desc, col("x_id").asc)
    // Pin the ranked frame: three consumers (ax, ay, the best-row join)
    // otherwise each re-execute the scorer + both rank windows — for the
    // exact path that is the FULL |X|x|Y| cosine pass run three times
    // (measured on x105: 3 near-identical ~5 s stages with KB-sized
    // outputs). One materialization of the scored-pair frame replaces the
    // two redundant scoring passes — and it is filtered to the union of
    // both top-k neighborhoods BEFORE the pin: every consumer reads only
    // rx <= k (ax, and the best row via rx == 1), or ry <= k (ay), so
    // rows outside the union are dead weight. On the exact path that
    // shrinks the materialized frame from |X|·|Y| scored pairs to
    // ~(|X|+|Y|)·k (measured on x105 at sf0.1: 247 MB pinned → KBs); the
    // rank windows themselves still see the full mass once, which the
    // margin definition requires.
    val kk = math.max(k, 1) // the best-row consumer reads rx == 1 even at k = 0
    val ranked = graft.runtime.GraftCheckpoint.pin(
      scored
        .withColumn("rx", row_number().over(wx))
        .withColumn("ry", row_number().over(wy))
        .where(col("rx") <= kk || col("ry") <= kk)
    )
    val ax = ranked.where(col("rx") <= k).groupBy(col("x_id")).agg(avg(col("c")).as("__ax"))
    val ay = ranked.where(col("ry") <= k).groupBy(col("y_id")).agg(avg(col("c")).as("__ay"))
    val margin = round(col("c") * 2 / (col("__ax") + col("__ay")), 6)
    ranked
      .where(col("rx") === 1)
      .join(ax, "x_id")
      .join(ay, "y_id")
      .select(
        col("x_id"),
        col("y_id").as("y_best"),
        col("c").as("cos"),
        margin.as("margin"),
        (col("ry") === 1).as("mutual"),
        (margin >= threshold && col("ry") === 1).as("accepted")
      )
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of N ranked retrieval
    * lists — the standard hybrid-search combiner (BM25 + dense ANN). Input
    * DataFrames carry (query_id, id, rank); fused score is
    * Σ 1/(kConst + rank) over the lists that surfaced the id, rounded 6dp
    * BEFORE the final ranking so every engine orders identical values
    * (ties break on id — the x44 discipline).
    *
    * Scale shape: the inputs are already top-k lists — queries×k rows,
    * model-sized, not corpus-sized — so the union + one partial-aggregating
    * exchange + WindowGroupLimit top-k here is noise next to the retriever
    * stages that produced them. The expensive parts (the BM25 inverted
    * index, the ANN index) keep their own audited plans.
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      kConst: Int = 60,
      topK: Int = 10
  ): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val tagged = lists.map(
      _.select(col("query_id"), col("id"), col("rank"))
    )
    val u = tagged.reduce(_.unionByName(_))
    val scored = u
      .groupBy(col("query_id"), col("id"))
      .agg(
        round(sum(lit(1.0) / (lit(kConst) + col("rank"))), 6).as("rrf"),
        count(lit(1)).as("n_lists"),
        min(col("rank")).as("best_rank")
      )
    scored
      .withColumn(
        "fused_rank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id"))
            .orderBy(col("rrf").desc, col("id"))
        )
      )
      .filter(col("fused_rank") <= topK)
  }
}
