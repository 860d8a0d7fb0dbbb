package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity self-join — the character-level near-dup
  * detector (OCR twins, template mutations, typo-distance plagiarism) that
  * complements the token-level Jaccard family in [[Dedup]]: Jaccard misses
  * pairs whose difference is INSIDE tokens, edit distance catches them.
  *
  * Algorithm: the partition scheme of PassJoin (Li, Deng, Wang, Feng,
  * "PASS-JOIN: A Partition-based Method for Similarity Joins", PVLDB 5(3),
  * 2011), simplified to the fixed ±k shift window: split the SHORTER
  * string of any candidate pair into k+1 even segments — at most k edits
  * touch at most k segments (pigeonhole), so one segment survives verbatim
  * in the longer string, displaced by at most k positions (net indels
  * before it). Candidates are therefore an EQUALITY join on
  * (segment-source length, segment index, segment text) — the shape that
  * scales: short fixed keys, map-side explode, no similarity predicate in
  * the join condition. The paper's multi-match-aware window is tighter
  * (fewer probe keys); the ±k window generates a superset of its
  * candidates, so exactness is unchanged — it is the documented knob if
  * probe fan-out ever dominates.
  *
  * Exactness: every pair within distance k is emitted with its true
  * distance, verified by `levenshtein(a, b, k)` (the thresholded kernel —
  * early-exits at k+1, O(k·min(la,lb)) not O(la·lb)). Strings of length
  * ≤ k carry no usable segment (some segments would be empty, and an
  * empty segment key matches everything), so they take a dedicated
  * length-banded path: dist(a,b) ≥ |la−lb|, hence a string of length
  * ≤ k can only pair with lengths ≤ 2k — a bounded class, joined on
  * exact target length. On real corpora this class is noise-sized; if a
  * corpus is dominated by ≤k-char strings the length-equality key is the
  * skew point to watch (surface it with a count, don't guess).
  *
  * 100 TB shape: both sides explode map-side (index: k+1 keys/string,
  * probe: ≤ (k+1)²(2k+1) keys/string), the join is hash-partitioned on
  * the segment key, candidates dedup on (id_a, id_b) BEFORE texts join
  * back (ids-only through the wide exchange, the [[Dedup]] discipline),
  * and verification is one thresholded-levenshtein pass per candidate.
  */
object EditDistance {

  /** All unordered pairs within edit distance `k`, oriented shorter-first
    * (ties: smaller id first): `(id_a, id_b, dist)`. Null strings are
    * dropped (they have no distance); empty strings participate via the
    * short path.
    */
  def editDistancePairs(df: DataFrame, idCol: Column, strCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val strsRaw = df
      .filter(strCol.isNotNull)
      .select(idCol.as("id"), strCol.as("s"))
      .withColumn("len", length(col("s")))
    // Pin the (id, s, len) relation: SIX consumers below (index explode,
    // probe explode, the short path's two sides, both verify join-backs)
    // otherwise re-execute the caller's upstream six times (guide §1.2).
    // Fan to the session's default parallelism first when the input
    // arrives narrower than the cores (single-row-group scans plan ONE
    // task, and the ~(k+1)²(2k+1)x probe-key explode then runs on one
    // core while the rest idle — measured on x99: an 831 ms 2-task
    // stage in a 2.9 s query). The gate is partition-count-derived, so
    // at cluster scale (scans already core-wide) it is the identity and
    // no string mass is ever re-shuffled.
    val cores = strsRaw.sparkSession.sparkContext.defaultParallelism
    val strs = graft.runtime.GraftCheckpoint.pin(
      if (strsRaw.rdd.getNumPartitions < cores) strsRaw.repartition(cores) else strsRaw
    )

    val kw = k + 1
    // ---- segment path: pairs whose SHORTER side has len > k -------------
    // index side: the k+1 even segments of every string (first len%(k+1)
    // segments take the extra char); start_i = i*base + min(i, rem) + 1.
    val idx = strs
      .where(col("len") > k)
      .select(col("id"), col("len"), col("s"), explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("base", expr(s"len div $kw"))
      .withColumn("rem", pmod(col("len"), lit(kw)))
      .withColumn("li", col("base") + when(col("i") < col("rem"), lit(1)).otherwise(lit(0)))
      .withColumn("pi", col("i") * col("base") + least(col("i"), col("rem")) + lit(1))
      .select(
        col("id").as("id_a"),
        col("len").as("len_a"),
        struct(
          col("len").as("kl"),
          col("i").as("ki"),
          col("s").substr(col("pi"), col("li")).as("ks")
        ).as("key")
      )
    // probe side: for every possible index length l in [len-k, len] (and
    // l > k), the segment layout OF THAT l, shifted by δ ∈ [-k, k].
    val probe = strs
      .where(col("len") > k)
      .select(
        col("id"),
        col("len"),
        col("s"),
        explode(sequence(greatest(col("len") - k, lit(kw)), col("len"))).as("l")
      )
      .select(col("id"), col("len"), col("s"), col("l"), explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("base", expr(s"l div $kw"))
      .withColumn("rem", pmod(col("l"), lit(kw)))
      .withColumn("li", col("base") + when(col("i") < col("rem"), lit(1)).otherwise(lit(0)))
      .withColumn("pi", col("i") * col("base") + least(col("i"), col("rem")) + lit(1))
      .select(
        col("id"),
        col("len"),
        col("s"),
        col("l"),
        col("i"),
        col("li"),
        col("pi"),
        explode(sequence(lit(-k), lit(k))).as("d")
      )
      .withColumn("p", col("pi") + col("d"))
      .where(col("p") >= 1 && col("p") + col("li") - 1 <= col("len"))
      .select(
        col("id").as("id_b"),
        col("len").as("len_b"),
        struct(
          col("l").as("kl"),
          col("i").as("ki"),
          col("s").substr(col("p"), col("li")).as("ks")
        ).as("key")
      )
    val segCands = idx
      .join(probe, "key")
      .where(
        col("len_a") < col("len_b") ||
          (col("len_a") === col("len_b") && col("id_a") < col("id_b"))
      )
      .select(col("id_a"), col("id_b"))

    // ---- short path: pairs whose shorter side has len <= k --------------
    // dist >= |la-lb| bounds the partner's length to la..la+k; join on the
    // exact target length (a bounded class on any text corpus).
    val shortCands = strs
      .where(col("len") <= k)
      .select(
        col("id").as("id_a"),
        col("len").as("len_a"),
        explode(sequence(col("len"), col("len") + k)).as("lb")
      )
      .join(
        strs.select(col("id").as("id_b"), col("len").as("len_b")),
        col("lb") === col("len_b")
      )
      .where(
        col("len_a") < col("len_b") ||
          (col("len_a") === col("len_b") && col("id_a") < col("id_b"))
      )
      .select(col("id_a"), col("id_b"))

    val cands = segCands.union(shortCands).distinct()

    // verify: thresholded levenshtein (returns -1 past k) on the texts
    // joined back by id — ids-only until here.
    cands
      .join(strs.select(col("id").as("id_a"), col("s").as("__sa")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"), levenshtein(col("__sa"), col("__sb"), k).as("dist"))
      .where(col("dist") >= 0)
  }

  /** Jaro-Winkler record-linkage self-join: all unordered within-block
    * pairs whose JW similarity (the [[graft.functions.text.JaroWinkler]]
    * kernel, DuckDB-variant-exact) reaches `threshold`, as
    * `(block, id_a, id_b, jw)` with jw 6dp-rounded and ids oriented
    * `id_a < id_b`. Null keys/blocks are dropped (no linkage identity).
    *
    * Blocking is EXPLICIT and caller-chosen — standard record-linkage
    * practice (Fellegi-Sunter deployments block on phonetic keys, sorted
    * neighborhoods, or source partitions): unlike edit distance, JW has
    * no pigeonhole decomposition, so candidate generation is exactly the
    * block equi-join and exactness holds WITHIN blocks by construction.
    *
    * 100 TB shape: one hash exchange on the block key; pair fan-out is
    * Σ n_b² over block sizes, so the block key is the contract's scale
    * knob — `blockStats` (count per block, emitted alongside by callers
    * that need shed accounting) tells you when a block needs a finer key.
    * The JW kernel rides whole-stage codegen (compute-method reference,
    * no UDF); keys are short linkage strings, so carrying them through
    * the block exchange is cheaper than an id join-back.
    */
  def jaroWinklerPairs(
      df: DataFrame,
      idCol: Column,
      strCol: Column,
      blockCol: Column,
      threshold: Double
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    val rows = df
      .filter(idCol.isNotNull && strCol.isNotNull && blockCol.isNotNull)
      .select(blockCol.as("block"), idCol.as("id"), strCol.as("s"))
    val a = rows.select(col("block"), col("id").as("id_a"), col("s").as("__sa"))
    val b = rows.select(col("block"), col("id").as("id_b"), col("s").as("__sb"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .select(
        col("block"),
        col("id_a"),
        col("id_b"),
        round(graft.functions.text.jaro_winkler(col("__sa"), col("__sb")), 6).as("jw")
      )
      .where(col("jw") >= threshold)
  }
}
