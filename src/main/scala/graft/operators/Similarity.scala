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
  * All vector math uses codegen'd higher-order functions
  * (`zip_with` + `aggregate`) over the array column — no UDFs, no MLlib
  * dependency, runs inside WholeStageCodegen.
  */
object Similarity {

  /** Dot product of two array&lt;float/double&gt; columns (double acc,
    * sequential fold → deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Random-hyperplane signature: bit i = sign(dot(v, h_i)) (Charikar '02).
    * Hyperplane components derive from xxhash64(seed=i, dim=j) mapped to
    * [-1, 1] — deterministic, no stored model, and the whole expression
    * stays codegen'd (array literals measured slower: they blow up the
    * generated method and fall back to interpreted evaluation).
    */
  def hyperplaneSignature(vec: Column, bits: Int): Column = {
    val planes = (0 until bits).map { i =>
      val proj = aggregate(
        zip_with(
          vec,
          transform(sequence(lit(0), size(vec) - 1), j => {
            (xxhash64(lit(i), j).cast("double") / lit(Long.MaxValue.toDouble))
          }),
          (x, h) => x * h
        ),
        lit(0.0d),
        (acc, v) => acc + v
      )
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    planes.reduce(_.bitwiseOR(_))
  }

  /** Squared L2 distance between two array columns. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)

  /** IVF (inverted-file) ANN — the clustering scale path (à la FAISS IVF,
    * public design): k-means-lite partitions the corpus into `nlist` cells;
    * a query probes its `nprobe` nearest cells and only those are reranked
    * exactly. At 100 TB the corpus is hash-partitioned by cell id, the
    * centroid table (nlist × dim, KBs) broadcasts, and each query touches
    * nprobe/nlist of the data — the scan shrinks by that factor.
    *
    * Training: `iters` Lloyd rounds, centroids seeded from the first
    * `nlist` rows by id (deterministic). Assignment is a broadcast cross
    * join + argmin window — no literal-array blowup in codegen.
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
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(id).as("cid"), col(vec).as("cv"))

    def centroidDf(cents: Seq[(Int, Seq[Double])]): DataFrame =
      cents.toDF("cell", "centroid")

    def assign(df: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
      val w = Window.partitionBy(col("cid")).orderBy(col("d"), col("cell"))
      df.join(broadcast(centroidDf(cents)))
        .withColumn("d", l2sq(col("cv"), col("centroid")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn", "d", "centroid")
    }

    // seed: first nlist vectors by id
    var cents: Seq[(Int, Seq[Double])] = c
      .orderBy(col("cid"))
      .limit(nlist)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
      .toSeq

    // Lloyd rounds: element-wise mean per cell (posexplode + avg per slot)
    (1 to iters).foreach { _ =>
      val assigned = assign(c, cents)
      val means = assigned
        .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .toSeq
      // keep empty cells' old centroids
      val got = means.map(_._1).toSet
      cents = means ++ cents.filterNot { case (i, _) => got.contains(i) }
    }

    val cells = assign(c, cents) // (cid, cv, cell)

    // queries probe their nprobe nearest cells
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("d"), col("cell"))
    val probes = q
      .join(broadcast(centroidDf(cents)))
      .withColumn("d", l2sq(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
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

  /** Embedding-cosine near-duplicate pairs: corpus rows whose vectors are
    * near-identical (cosine ≥ threshold), the embedding-space twin of
    * [[Dedup.minhashPairs]]. Candidates come from hyperplane-signature
    * block collisions (pigeonhole multi-probe) and are verified with exact
    * cosine — an equality hash join on block keys, no cross product.
    */
  def cosineNearDupPairs(
      corpus: DataFrame,
      vec: String,
      id: String,
      threshold: Double = 0.95,
      bits: Int = 16,
      blocks: Int = 4
  ): DataFrame = {
    val width = bits / blocks
    val signed = corpus.select(
      col(id).as("vid"),
      col(vec).as("v"),
      hyperplaneSignature(col(vec), bits).as("sig")
    )
    val blocked = signed
      .select(
        col("vid"),
        col("v"),
        explode(array((0 until blocks).map { b =>
          struct(lit(b).as("blk"), shiftright(col("sig"), b * width).bitwiseAND((1L << width) - 1).as("key"))
        }: _*)).as("bk")
      )
      .select(col("vid"), col("v"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    blocked
      .join(
        blocked.select(col("blk"), col("key"), col("vid").as("vid_b"), col("v").as("v_b")),
        Seq("blk", "key")
      )
      .filter(col("vid") < col("vid_b"))
      .dropDuplicates("vid", "vid_b")
      .withColumn("cos", cosine(col("v"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("vid").as("id_a"), col("vid_b").as("id_b"), col("cos"))
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
}
