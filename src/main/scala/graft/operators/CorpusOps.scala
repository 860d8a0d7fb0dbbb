package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline needs between
  * "cleaned documents" and "training batches": repetition-based quality
  * signals, deterministic corpus splitting, and sequence packing. All
  * arithmetic is engine-portable (exact integer counts + double division),
  * so every operator is DuckDB-oracle-checkable end to end.
  */
object CorpusOps {

  /** Repetition signals in the style of the Gopher quality heuristics
    * (Rae et al. 2021, "Scaling Language Models", Table A1: fraction of
    * duplicated n-grams / fraction of characters in the most common
    * n-gram), token-level for this corpus's single-line documents:
    *
    *   - `dup_token_ratio`  = 1 − distinct_tokens / tokens
    *   - `top_token_ratio`  = occurrences of the most frequent token / tokens
    *   - `dup_3gram_ratio`  = 1 − distinct_3grams / 3grams
    *
    * Shape at 100 TB: ONE corpus scan — the 3-gram counts (pure per-row
    * codegen, [[graft.functions.text.word_shingles]] + array ops) are
    * computed in the scan projection and ride the (id, token) aggregation
    * as two carried ints (`first()`), so there is no second scan and no
    * re-join of a corpus-sized side; the only exchanges are the same
    * two-level partial-agg word-count shape, keyed (id, token) then (id).
    * High-repetition documents are the classic low-quality signal these
    * ratios gate on.
    */
  def repetitionFeatures(df: DataFrame, text: Column, idCol: Column): DataFrame =
    df.select(
        idCol.as("doc_id"),
        explode(split(text, " ")).as("tok"),
        size(graft.functions.text.word_shingles(text, 3)).as("n_g"),
        size(array_distinct(graft.functions.text.word_shingles(text, 3))).as("n_gd")
      )
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"), first(col("n_g")).as("n_g"), first(col("n_gd")).as("n_gd"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"),
        first(col("n_g")).as("n_g"),
        first(col("n_gd")).as("n_gd")
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")).as("dup_token_ratio"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_token_ratio"),
        (lit(1.0) - col("n_gd").cast("double") / col("n_g")).as("dup_3gram_ratio")
      )

  /** Deterministic train/val/test split on a content-independent key hash:
    * bucket = first two hex chars of md5(id) → 256 buckets, carved
    * ~80/10/10 (train < 0xcd = 205 buckets, val < 0xe7 = 26, test = 25).
    * Reproducible across engines, runs, and partitionings — md5 of the
    * SAME id string is the same everywhere, so re-running the pipeline
    * never migrates a document between splits (the property that matters
    * for contamination control). Pure per-row codegen projection; zero
    * shuffle.
    */
  def hashSplit(df: DataFrame, idCol: Column): DataFrame =
    df.withColumn("split", splitFor(idCol))

  /** The split assignment as a pure Catalyst tree — one definition serves
    * both the Column surface ([[splitFor]]) and the SQL function
    * `graft_split` ([[graft.GraftExtensions]]); the SQL injection path
    * needs resolved Catalyst nodes, not Column-API ColumnNodes.
    */
  private[graft] def splitExpr(
      id: org.apache.spark.sql.catalyst.expressions.Expression
  ): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    val bucket = Substring(Md5(Cast(id, StringType)), Literal(1), Literal(2))
    CaseWhen(
      Seq(
        (LessThan(bucket, Literal("cd")), Literal("train")),
        (LessThan(bucket, Literal("e7")), Literal("val"))
      ),
      Some(Literal("test"))
    )
  }

  /** The split assignment as a column (also exposed to SQL as
    * `graft_split(id)`).
    */
  def splitFor(idCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(splitExpr(Bridge.expression(idCol)))
  }

  /** Benchmark decontamination (the GPT-3 appendix-C / Llama pre-training
    * step): flag corpus documents sharing any `n`-gram with a benchmark
    * set, so evaluation data can be excised from training data. Candidate
    * generation is an equi-join on the n-gram STRING between the exploded
    * corpus index and the (small) benchmark n-gram set — at 100 TB the
    * benchmark side is KBs–MBs and broadcasts, so the corpus is one scan +
    * explode with zero corpus shuffle before the distinct on flagged ids.
    * Returns distinct (id, first matching benchmark doc) pairs.
    */
  def decontaminate(
      corpus: DataFrame,
      text: Column,
      idCol: Column,
      benchmark: DataFrame,
      benchText: Column,
      benchIdCol: Column,
      n: Int = 8
  ): DataFrame = {
    val corpusGrams = corpus.select(
      idCol.as("doc_id"),
      explode(array_distinct(graft.functions.text.word_shingles(text, n))).as("gram")
    )
    val benchGrams = benchmark
      .select(
        benchIdCol.as("bench_id"),
        explode(array_distinct(graft.functions.text.word_shingles(benchText, n))).as("gram")
      )
    corpusGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(min(col("bench_id")).as("bench_id"), count(lit(1)).as("n_hits"))
  }

  /** [[decontaminate]] with a Bloom-sketch prefilter — the variant for
    * benchmark suites too large to broadcast (the union of every eval
    * set's n-grams can run to hundreds of millions of rows; a hashed
    * join relation of that on the driver is the OOM, a Bloom sketch of
    * it is megabytes). Exact: the sketch only PREFILTERS — corpus grams
    * that miss (the overwhelming majority) are dropped map-side without
    * joining anything; the survivors (true hits + fpp·grams false
    * positives) go through the real equality join, which removes the
    * false positives. Same output contract as [[decontaminate]].
    *
    * Shape at 100 TB: the benchmark folds into the sketch via a
    * mergeable partial agg riding a scalar subquery (never collected as
    * rows), the corpus-token-sized gram stream is reduced BEFORE any
    * join, and the one equality join shuffles only (hits ∪ benchmark) —
    * nothing corpus-sized moves. The x35 lesson applied to
    * contamination instead of identity.
    */
  def decontaminateBloom(
      corpus: DataFrame,
      text: Column,
      idCol: Column,
      benchmark: DataFrame,
      benchText: Column,
      benchIdCol: Column,
      n: Int = 8,
      expectedGrams: Long = 4000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    import graft.functions.sketch
    val benchGrams = benchmark
      .select(
        benchIdCol.as("bench_id"),
        explode(array_distinct(graft.functions.text.word_shingles(benchText, n))).as("gram")
      )
    val bloom = benchGrams
      .select(sketch.bloom_filter_agg(xxhash64(col("gram")), expectedGrams, fpp).as("bf"))
      .scalar()
    corpus
      .select(
        idCol.as("doc_id"),
        explode(array_distinct(graft.functions.text.word_shingles(text, n))).as("gram")
      )
      .filter(coalesce(sketch.might_contain(bloom, xxhash64(col("gram"))), lit(false)))
      .join(benchGrams, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(min(col("bench_id")).as("bench_id"), count(lit(1)).as("n_hits"))
  }

  /** N-gram novelty score: per-document fraction of distinct n-grams NOT
    * present anywhere in a reference corpus — the memorization-risk /
    * freshness signal (the per-doc dual of [[decontaminate]]'s flag): a
    * crawl re-packaging the reference scores ~0, genuinely new text
    * scores ~1. Returns (doc_id, n_grams, n_novel, novelty) over every
    * doc with a non-null text; counts are exact.
    *
    * Scale shape: the reference reduces to its DISTINCT gram set once
    * (two-level partial agg); the corpus-side gram stream left-joins it
    * on the gram string — an equi-join AQE broadcasts when the reference
    * vocabulary fits, shuffles otherwise. When the reference is too big
    * to broadcast, use [[noveltyScoreBloom]]: same result, but
    * bloom-NEGATIVE grams (definitely novel) never reach the join.
    */
  def noveltyScore(
      corpus: DataFrame,
      text: Column,
      idCol: Column,
      reference: DataFrame,
      refText: Column,
      n: Int = 3
  ): DataFrame = {
    val refGrams = distinctGrams(reference, refText, n)
    val cg = corpusGrams(corpus, text, idCol, n)
    noveltyAgg(
      cg.join(refGrams.withColumn("seen", lit(1)), Seq("gram"), "left")
        .select(col("doc_id"), col("seen").isNull.as("novel"))
    )
  }

  /** [[noveltyScore]] with the reference folded into a Bloom sketch that
    * rides a scalar subquery (the [[decontaminateBloom]] pattern): a
    * bloom MISS is a definite non-member, so those grams are counted
    * novel with ZERO join traffic; only bloom-positives (true members +
    * the fpp sliver) confirm against the exact reference gram set. The
    * result is exactly [[noveltyScore]]'s — an undersized sketch costs
    * confirm-join traffic, never correctness. The 100 TB shape: the
    * reference is scanned (sketch fold + confirm probe), never shuffled
    * against the corpus-sized gram stream.
    */
  def noveltyScoreBloom(
      corpus: DataFrame,
      text: Column,
      idCol: Column,
      reference: DataFrame,
      refText: Column,
      n: Int = 3,
      expectedGrams: Long = 4000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    import graft.functions.sketch
    val refGrams = distinctGrams(reference, refText, n)
    // the sketch ships as a BROADCAST (once per executor), not a
    // scalar-subquery literal (once per task closure) — at web-corpus
    // reference sizes the filter is ~100 MB+ and the literal path dies
    // in task deserialization (measured; see sketch.broadcastBloom).
    // EAGER: one job builds the filter at call time.
    val bloomOpt =
      sketch.broadcastBloom(refGrams, xxhash64(col("gram")), expectedGrams, fpp)
    val cg = corpusGrams(corpus, text, idCol, n)
      .withColumn(
        "maybe",
        bloomOpt match {
          case Some(bf) =>
            coalesce(sketch.might_contain_bc(bf, xxhash64(col("gram"))), lit(false))
          case None => lit(false) // empty reference: every gram is novel
        }
      )
    val confirmed = cg
      .filter(col("maybe"))
      .join(refGrams.withColumn("seen", lit(1)), Seq("gram"), "left")
      .select(col("doc_id"), col("seen").isNull.as("novel"))
    val definiteNovel = cg
      .filter(!col("maybe"))
      .select(col("doc_id"), lit(true).as("novel"))
    noveltyAgg(confirmed.unionByName(definiteNovel))
  }

  private def distinctGrams(df: DataFrame, text: Column, n: Int): DataFrame =
    df.select(explode(array_distinct(graft.functions.text.word_shingles(text, n))).as("gram"))
      .distinct()

  private def corpusGrams(df: DataFrame, text: Column, idCol: Column, n: Int): DataFrame =
    df.select(
      idCol.as("doc_id"),
      explode(array_distinct(graft.functions.text.word_shingles(text, n))).as("gram")
    )

  private def noveltyAgg(flags: DataFrame): DataFrame =
    flags
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(col("novel").cast("long")).as("n_novel")
      )
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6).as("novelty")
      )

  /** Zipf rank-frequency profile: OLS fit of ln(frequency) on ln(rank)
    * over the top-`topR` terms — the corpus-health one-liner (natural
    * language sits near slope −1; synthetic, templated, or spam-heavy
    * corpora visibly don't). Returns one row: (n_ranks, top_count,
    * slope, intercept, r2).
    *
    * Scale shape: term counts are the standard two-level partial agg
    * (one row per distinct term on the exchange); the top-R cut is
    * `TakeOrderedAndProject` (count desc, term — a deterministic total
    * order); the rank window is partition-less BUT runs on ≤ topR rows
    * post-cut — a bounded model-sized sort, not the [[assignShards]]
    * trap. The fit reduces to five scalar sums.
    */
  def zipfProfile(df: DataFrame, text: Column, topR: Int = 1000): DataFrame = {
    require(topR > 1, s"topR must exceed 1, got $topR")
    val freq = df
      .select(explode(split(text, " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
    val top = freq.orderBy(col("c").desc, col("tok")).limit(topR)
    val ranked = top.withColumn(
      "rank",
      row_number().over(Window.orderBy(col("c").desc, col("tok")))
    )
    val xy = ranked.select(
      col("c"),
      log(col("rank").cast("double")).as("x"),
      log(col("c").cast("double")).as("y")
    )
    xy.agg(
        count(lit(1)).as("n"),
        max(col("c")).as("top_count"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy")
      )
      .select(
        col("n").as("n_ranks"),
        col("top_count"),
        round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")),
          6
        ).as("slope"),
        round(
          (col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"),
          6
        ).as("intercept"),
        round(
          ((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))),
          6
        ).as("r2")
      )
  }

  /** Domain-mixture rebalancing: given per-domain token masses and a
    * target share per domain, the deterministic per-domain sampling rate
    * that achieves the target mix without upsampling:
    * `rate(d) = min(1, target_tokens(d) / tokens(d))` where
    * `target_tokens(d) = share(d) · Σ tokens`. Pure aggregation
    * arithmetic — at scale this is the planning step that decides how
    * much of each source (web/books/code/…) enters an epoch.
    */
  def domainMix(
      df: DataFrame,
      domain: Column,
      tokenCount: Column,
      shares: Map[String, Double] = Map.empty
  ): DataFrame = {
    val perDomain = df
      .groupBy(domain.as("domain"))
      .agg(sum(tokenCount).cast("long").as("tokens"))
    val total = perDomain.agg(
      sum(col("tokens")).cast("long").as("total_tokens"),
      count(lit(1)).as("n_domains")
    )
    // explicit shares, else a uniform target across observed domains
    val shareCol = shares.foldLeft(lit(1.0) / col("n_domains")) { case (acc, (k, v)) =>
      when(col("domain") === k, v).otherwise(acc)
    }
    perDomain
      .crossJoin(total)
      .withColumn("share", shareCol)
      .withColumn("target_tokens", floor(col("share") * col("total_tokens")))
      .withColumn(
        "sample_rate",
        least(lit(1.0), col("target_tokens").cast("double") / col("tokens"))
      )
  }

  /** Deterministic uniform-[0,1) sampling key from md5 of the id: the
    * first 7 hex chars as a 28-bit integer over 16⁷. Like [[splitFor]]
    * this is content-independent and engine-portable (per-char ascii
    * arithmetic — DuckDB has no hex→int cast), so a row's fate under a
    * given rate never changes across runs, engines, or partitionings: the
    * property that makes sampled corpora reproducible. Pure per-row
    * codegen projection; zero shuffle.
    */
  def hashUniform(idCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(uniformExpr(Bridge.expression(idCol)))
  }

  /** The uniform-key arithmetic as a resolved Catalyst tree — one
    * definition serves both the Column surface ([[hashUniform]]) and the
    * SQL function `graft_uniform` ([[graft.GraftExtensions]]), the same
    * split as [[splitExpr]]/`graft_split`.
    */
  private[graft] def uniformExpr(
      id: org.apache.spark.sql.catalyst.expressions.Expression
  ): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val hex = Substring(Md5(Cast(id, StringType)), Literal(1), Literal(7))
    val value = (0 until 7)
      .map { i =>
        val c = Ascii(Substring(hex, Literal(i + 1), Literal(1)))
        val digit = // a-f → 10-15
          If(GreaterThanOrEqual(c, Literal(97)), Subtract(c, Literal(87)), Subtract(c, Literal(48)))
        Multiply(Cast(digit, LongType), Literal(1L << (4 * (6 - i)))): Expression
      }
      .reduce((a, b) => Add(a, b))
    Divide(Cast(value, DoubleType), Literal(268435456.0)) // 16^7
  }

  /** Deterministic per-row sampling at a (possibly per-row) `rate`:
    * keep iff hashUniform(id) < rate. Composes with [[domainMix]] — join
    * the mix's `sample_rate` onto the corpus by domain and the target
    * token mixture materializes, reproducibly, with one filter and no
    * shuffle beyond the (broadcast-sized) rate join.
    */
  def sampleByRate(df: DataFrame, idCol: Column, rate: Column): DataFrame =
    df.filter(hashUniform(idCol) < rate)

  /** Exact per-group quantile cutoff + filter: keep rows whose `value` is
    * at or above the group's q-quantile (the k-th smallest value,
    * k = max(1, ⌈q·n⌉) — `percentile_disc` semantics, deterministic under
    * ties because the cutoff is a VALUE, not a rank). The per-domain
    * "keep the top half by quality" gate of corpus curation.
    *
    * Scale shape: one window sort per group for the order statistic (the
    * unavoidable exchange — exact quantiles need a per-group order), then
    * a broadcast-sized (one row per group) cutoff join back. Returns the
    * input columns plus `cutoff` — the one reserved output name: an input
    * already carrying a `cutoff` column is rejected up front (the join
    * would otherwise produce ambiguous duplicate columns that fail only
    * at first downstream reference). Internal working names are
    * collision-checked against the input, never assumed free.
    */
  def quantileFilter(df: DataFrame, group: Column, value: Column, q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0,1], got $q")
    require(
      !df.columns.contains("cutoff"),
      "quantileFilter appends a 'cutoff' column; rename the input's existing 'cutoff' first"
    )
    val used = df.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i").filterNot(used).next()
    val g = fresh("__qf_g")
    val v = fresh("__qf_v")
    val w = Window.partitionBy(col(g)).orderBy(col(v))
    val cutoffs = df
      .select(group.as(g), value.as(v))
      .withColumn("__qf_rn", row_number().over(w))
      .withColumn("__qf_n", count(lit(1)).over(Window.partitionBy(col(g))))
      .filter(col("__qf_rn") === greatest(lit(1L), ceil(lit(q) * col("__qf_n"))))
      .select(col(g), col(v).as("cutoff"))
    // broadcast BY CONSTRUCTION: cutoffs is one row per group, and Spark's
    // size estimate for it derives from the full window subtree, so the
    // planner picks SortMergeJoin at scale (measured at 5 M rows with a
    // 50%-skewed group: the SMJ re-shuffles and re-sorts the whole probe
    // side on the skewed key — the cutoff join must never touch the
    // corpus's partitioning). A group cardinality near executor memory
    // would be the wrong tool anyway (use approx_percentile then).
    // CALLER CONTRACT: one row per group means the broadcast is bounded
    // by GROUP CARDINALITY, not data size — a grouping key with tens of
    // millions of distinct values (e.g. per-URL) makes this hint a
    // driver OOM; pre-bucket such keys or drop to the plain join.
    df.join(broadcast(cutoffs), group === col(g))
      .filter(value >= col("cutoff"))
      .drop(g)
  }

  /** [[quantileFilter]] for the monster-group regime: the cutoff comes
    * from `approx_percentile` (a mergeable sketch aggregate — partial
    * aggregation per partition, no per-group sort, no single hot window
    * task), so a group of ANY size never concentrates in one task. The
    * price is rank error ≤ n_g/`accuracy` per group (Spark's
    * Greenwald-Khanna bound); the returned cutoff is still an actual data
    * value, and the keep rule (`value >= cutoff`) is identical. Use the
    * exact variant while groups fit an executor's sort budget; switch
    * here when they don't. Same reserved `cutoff` output column.
    */
  def quantileFilterApprox(
      df: DataFrame,
      group: Column,
      value: Column,
      q: Double,
      accuracy: Int = 10000
  ): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0,1], got $q")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    require(
      !df.columns.contains("cutoff"),
      "quantileFilterApprox appends a 'cutoff' column; rename the input's existing 'cutoff' first"
    )
    val used = df.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i").filterNot(used).next()
    val g = fresh("__qf_g")
    // approx_percentile at q maps to the same "smallest value with
    // cume_dist >= q" target the exact variant's row_number picks, up to
    // the sketch's rank error
    val cutoffs = df
      .groupBy(group.as(g))
      .agg(percentile_approx(value, lit(q), lit(accuracy)).as("cutoff"))
    // same caller contract as quantileFilter: the broadcast is bounded by
    // group cardinality — extreme-cardinality keys need pre-bucketing
    df.join(broadcast(cutoffs), group === col(g))
      .filter(value >= col("cutoff"))
      .drop(g)
  }

  /** Sequence packing (GPT-style): documents are concatenated in a
    * deterministic order and chopped into fixed token-budget training
    * sequences; a document whose tokens straddle a boundary spills into
    * the next sequence. Computed as: running token total per shard
    * (window), `seq_id` = tokens-before-this-doc ÷ budget.
    *
    * Scale note — the window is partitioned by `shard`: global greedy
    * packing is inherently sequential (a single unbounded-window
    * partition), so at 100 TB you shard first (by language, source, or a
    * hash) and pack within shards — exactly how production packers
    * parallelize; per-shard order stays deterministic via `orderCol`.
    */
  def packSequences(
      df: DataFrame,
      tokenCount: Column,
      orderCol: Column,
      shard: Column,
      budget: Int
  ): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(shard).orderBy(orderCol).rowsBetween(Window.unboundedPreceding, -1)
    // floor, not cast: Spark's double→long cast truncates but DuckDB's
    // rounds — floor() agrees everywhere (operands are non-negative)
    df.withColumn("n_tok", tokenCount)
      .withColumn("seq_id", floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / budget))
  }

  /** Corpus-wide line-level exact dedup (the C4/CCNet boilerplate pass,
    * Raffel et al. 2020 §2.2 / Lee et al. 2022's cheap sibling): split each
    * document into lines, count every line's occurrences across the WHOLE
    * corpus, and drop lines occurring ≥ `minDupCount` times — navigation
    * chrome, cookie banners, and license footers disappear while unique
    * prose survives. `keepFirst = true` switches to Lee-et-al. semantics:
    * the corpus-first occurrence (smallest `(doc_id, pos)`) of a common
    * line survives, later copies are dropped.
    *
    * Returns one row per input document: `doc_id`, `text` (kept lines
    * re-joined by `sep` in original order; `""` when everything was
    * dropped), `n_lines`, `n_kept`.
    *
    * Scale shape — decisions move, text does not. The first cut of this
    * operator carried each line's text through the count join AND a
    * collect_list(struct(pos, line)) reassembly; at 5 M docs the object
    * aggregation fell back to sort-based spills and the join shuffled the
    * corpus twice (hours, not minutes). This layout shuffles document text
    * exactly once:
    *   1. explode to line METADATA only — `(doc_id, pos, unhex(md5(line)))`,
    *      16-byte binary digests, ~32 B/row regardless of line length;
    *   2. COUNT-ONLY group by digest (partial agg absorbs hot boilerplate
    *      lines: corpusN copies of one line still produce one count row),
    *      keep only digests with `n_occ ≥ minDupCount` — the usually-tiny
    *      dup-line set, which AQE broadcasts when it is actually small.
    *      Count-only is load-bearing: an earlier cut also computed
    *      `min(struct(doc_id, pos))` here, and a struct-typed aggregation
    *      buffer evicts the whole corpus-wide aggregation from codegen
    *      `HashAggregate` into `ObjectHashAggregate`, which falls back to
    *      sort-based spills past 128 distinct keys — measured as tens of
    *      minutes of shuffle-spill merging at 5 M docs vs seconds for the
    *      codegen count;
    *   3. join metadata to the dup set and collect the DROP POSITIONS per
    *      doc (an int array, empty for most docs). `keepFirst`'s
    *      first-occurrence lookup runs only over this dup subset, as two
    *      chained codegen `min` aggregations (min doc, then min pos within
    *      it) — never a struct buffer, never corpus-wide;
    *   4. one join back to the original one-row-per-doc frame rebuilds the
    *      text in place via an index filter on split() — original order is
    *      positional, no sort, no line strings in any aggregation buffer.
    */
  def dedupLines(
      df: DataFrame,
      idCol: Column,
      text: Column,
      sep: String = "\n",
      minDupCount: Long = 3,
      keepFirst: Boolean = false
  ): DataFrame = {
    require(minDupCount >= 2, s"minDupCount below 2 would drop every line, got $minDupCount")
    val sepLit = java.util.regex.Pattern.quote(sep)
    val lineMeta = df
      .select(idCol.as("doc_id"), posexplode(split(text, sepLit)))
      .select(col("doc_id"), col("pos"), unhex(md5(col("col"))).as("fp"))
    val dupFps = lineMeta
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minDupCount)
      .select(col("fp"))
    val dupRows = lineMeta.join(dupFps, Seq("fp"))
    val dropRows =
      if (!keepFirst) dupRows
      else {
        // first occurrence = lexicographic min (doc_id, pos), computed as
        // two codegen mins over the dup subset (struct buffers would evict
        // the agg from HashAggregate — see scaladoc step 3)
        val firstDoc = dupRows.groupBy(col("fp")).agg(min(col("doc_id")).as("__dl_fdoc"))
        val firstPos = dupRows
          .join(firstDoc, Seq("fp"))
          .filter(col("doc_id") === col("__dl_fdoc"))
          .groupBy(col("fp"), col("__dl_fdoc"))
          .agg(min(col("pos")).as("__dl_fpos"))
        dupRows
          .join(firstPos, Seq("fp"))
          .filter(!(col("doc_id") === col("__dl_fdoc") && col("pos") === col("__dl_fpos")))
          .select(col("fp"), col("doc_id"), col("pos"))
      }
    val drops = dropRows
      .groupBy(col("doc_id"))
      .agg(collect_list(col("pos")).as("__dl_drop"))
    df.select(idCol.as("doc_id"), text.as("__dl_text"))
      .join(drops, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        split(col("__dl_text"), sepLit).as("__dl_lines"),
        coalesce(col("__dl_drop"), array().cast("array<int>")).as("__dl_drop")
      )
      .select(
        col("doc_id"),
        array_join(
          filter(col("__dl_lines"), (_, i) => !array_contains(col("__dl_drop"), i)),
          sep
        ).as("text"),
        size(col("__dl_lines")).cast("long").as("n_lines"),
        (size(col("__dl_lines")) - size(col("__dl_drop"))).cast("long").as("n_kept")
      )
  }

  /** Corpus-wide duplicated-substring removal (the ExactSubstr idea of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", re-expressed relationally): every k-token window that occurs
    * ≥ `minDupCount` times across the WHOLE corpus is a duplicated span;
    * every token covered by such a window is cut from every document.
    * Unlike [[dedupLines]] the unit is a token range, not an atomic line —
    * a licence paragraph pasted mid-prose disappears while the
    * document-specific words around it survive (the windows crossing the
    * boundary contain doc-specific tokens, so they are not corpus-wide
    * duplicates and the cut stops at the span edge, within k−1 tokens).
    *
    * Returns one row per input document: `doc_id`, `text` (kept tokens
    * re-joined by a single space; `""` when everything was cut),
    * `n_tokens`, `n_kept`. Documents with fewer than `k` tokens have no
    * window and always survive whole.
    *
    * Scale shape — [[dedupLines]]'s "decisions move, text does not",
    * token-level:
    *   1. one native pass per doc emits the k-window MD5 array
    *      ([[graft.functions.text.WindowMd5s]]); explode to
    *      `(doc_id, start, fp16)` metadata, ~32 B/row;
    *   2. COUNT-ONLY codegen group-by on the 16-byte digest (struct-free —
    *      the ObjectHashAggregate eviction lesson), filter to the dup set;
    *   3. join metadata to the dup set, collect DROP STARTS per doc (an
    *      int array, empty for most docs);
    *   4. one join back to the one-row-per-doc frame; a native sweep
    *      ([[graft.functions.text.CutSpans]]) merges overlapping windows
    *      and rebuilds the kept text in O(tokens + drops·log drops).
    * The suffix-array formulation the paper uses is a single-machine
    * construction; this equality-join layout is the shuffle-bounded
    * equivalent for a fixed k (their dup-threshold length), and every
    * shuffle key is a fixed-width digest or a doc id.
    */
  def dedupSpans(
      df: DataFrame,
      idCol: Column,
      text: Column,
      k: Int = 10,
      minDupCount: Long = 2
  ): DataFrame = {
    require(minDupCount >= 2, s"minDupCount below 2 would cut every token, got $minDupCount")
    val base = df.select(idCol.as("doc_id"), text.as("__ds_text"))
    val winMeta = base
      .select(col("doc_id"), posexplode(graft.functions.text.window_md5s(col("__ds_text"), k)))
      .select(col("doc_id"), col("pos"), col("col").as("fp"))
    val dupFps = winMeta
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minDupCount)
      .select(col("fp"))
    val drops = winMeta
      .join(dupFps, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(collect_list(col("pos")).as("__ds_drop"))
    base
      .join(drops, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        graft.functions.text
          .cut_spans(
            col("__ds_text"),
            coalesce(col("__ds_drop"), array().cast("array<int>")),
            k
          )
          .as("__ds_cut")
      )
      .select(
        col("doc_id"),
        col("__ds_cut.text").as("text"),
        col("__ds_cut.n_tokens").as("n_tokens"),
        col("__ds_cut.n_kept").as("n_kept")
      )
  }

  /** Declarative twin of [[graft.functions.text.WindowMd5s]] — the
    * portable semantic spec (mirrors the x34 DuckDB oracle SQL shape);
    * interpreted lambda per window, spec scale only.
    */
  private[graft] def windowMd5sDeclarative(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    when(
      size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - lit(k)),
        s => unhex(md5(array_join(slice(toks, s + 1, lit(k)), " ")))
      )
    ).otherwise(array().cast("array<binary>"))
  }

  /** Declarative twin of [[graft.functions.text.CutSpans]] — exists() per
    * token, interpreted; spec scale only.
    */
  private[graft] def cutSpansDeclarative(text: Column, starts: Column, k: Int): Column = {
    val toks = split(text, " ")
    val kept = filter(
      toks,
      (_, i) => !exists(starts, s => s <= i && i < s + lit(k))
    )
    struct(
      array_join(kept, " ").as("text"),
      size(toks).cast("long").as("n_tokens"),
      size(kept).cast("long").as("n_kept")
    )
  }

  /** Fixed-budget token chunking with overlap — the "split long documents
    * into model-context windows" step before embedding or training. Chunk k
    * starts at token `k·(chunkSize−overlap)`; the final partial window is
    * emitted only when it contributes tokens beyond the previous chunk's
    * overlap (`start + overlap < n`), so no chunk is a pure suffix of its
    * predecessor. Output: one row per chunk with `doc_id`, `chunk_idx`,
    * `start`, `chunk` (array of tokens) — dense chunk indices because the
    * drop condition is monotone in `start`.
    *
    * Pure per-row projection + explode: zero shuffle, linear output
    * (≤ n/(chunkSize−overlap)+1 rows per doc), safe at any corpus size.
    */
  def chunkTokens(
      df: DataFrame,
      idCol: Column,
      text: Column,
      chunkSize: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize, s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    df.select(idCol.as("doc_id"), split(text, " ").as("__ct_toks"))
      .select(
        col("doc_id"),
        col("__ct_toks"),
        posexplode(sequence(lit(0), greatest(size(col("__ct_toks")) - 1, lit(0)), lit(step)))
      )
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start")
      .filter(col("chunk_idx") === 0 || col("start") + lit(overlap) < size(col("__ct_toks")))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("start").cast("long").as("start"),
        slice(col("__ct_toks"), col("start") + 1, lit(chunkSize)).as("chunk")
      )
  }

  /** Content-defined chunking ([[graft.functions.text.CdcChunks]]): one
    * row per chunk with `doc_id`, `chunk_idx`, `start` (token offset),
    * `n_tokens`, `fp` (md5 of the space-rejoined chunk). Boundaries are
    * decided by local window content (1-in-16 md5-nibble rule, expected
    * 16-token chunks), so chunk fingerprints survive upstream
    * insertions/edits that shift token positions — grouping on `fp` then
    * dedups SHIFTED boilerplate that whole-doc digests (position-free but
    * all-or-nothing) and fixed windows (position-locked) both miss; the
    * complementary span story to [[dedupSpans]], at chunk rather than
    * 8-token granularity.
    *
    * Pure projection + explode: zero shuffle at any corpus size; a
    * downstream `groupBy(fp)` moves 16-byte keys only.
    */
  def cdcChunks(df: DataFrame, idCol: Column, text: Column, window: Int = 8): DataFrame =
    df.select(
        idCol.as("doc_id"),
        posexplode(graft.functions.text.cdc_chunks(text, window)).as(Seq("chunk_idx", "__cdc"))
      )
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("__cdc.start").as("start"),
        col("__cdc.n_tokens").as("n_tokens"),
        col("__cdc.fp").as("fp")
      )

  /** Pairwise vocabulary overlap between corpus splits — the
    * cross-corpus audit run before mixing sources (how much two crawls,
    * two snapshots, or two languages share a token space decides dedup
    * and contamination policy between them). Returns one row per ordered
    * group pair: exact vocab sizes, exact intersection, exact Jaccard
    * (rounded 6dp), and `est_ok` — whether the MinHash-sketch estimate
    * agrees with the exact value within `tol`.
    *
    * Scale shape: the SKETCH is the 100 TB path — per group, `numHashes`
    * component-wise `min` aggregates over per-token hashes (the same
    * xxhash chain as [[graft.functions.text.MinHashSig]], k=1-element
    * arrays), so each group reduces to `numHashes` longs in ONE partial
    * agg pass and pairs compare in O(k) regardless of corpus size; the
    * estimate is |matching mins|/k. The exact intersection join is the
    * verification twin (and the oracle surface) — bounded here because
    * groups are few; at petabyte vocabularies you drop it and ship the
    * sketch row. Group-pair enumeration is a self-join of the per-group
    * AGGREGATE (|groups| rows, broadcast nested-loop) — never of the
    * vocab itself.
    */
  def vocabOverlap(
      df: DataFrame,
      group: Column,
      text: Column,
      numHashes: Int = 64,
      tol: Double = 0.15
  ): DataFrame = {
    require(numHashes >= 16, s"need >= 16 hashes for a usable estimate, got $numHashes")
    val vocab = df
      .select(group.as("g"), explode(split(text, " ")).as("tok"))
      .distinct()
    // project the signature ONCE per vocab row — putting the minhash_sig
    // tree inside each of the numHashes min() aggregates would duplicate
    // the whole xxhash chain numHashes times in the update expression
    // (numHashes² hash evals worst-case, and a codegen method big enough
    // to fall back to interpreted eval)
    val sigd = vocab
      .withColumn("__sig", graft.functions.text.minhash_sig(array(col("tok")), numHashes))
    val sigMins = (1 to numHashes).map(i => min(element_at(col("__sig"), i)).as(s"__h$i"))
    val stats = sigd.groupBy(col("g")).agg(count(lit(1)).as("n"), sigMins: _*)
    val a = stats.toDF(stats.columns.map(_ + "_a").toIndexedSeq: _*)
    val b = stats.toDF(stats.columns.map(_ + "_b").toIndexedSeq: _*)
    val matches = (1 to numHashes)
      .map(i => when(col(s"__h${i}_a") === col(s"__h${i}_b"), 1).otherwise(0))
      .reduce(_ + _)
    val pairs = a
      .join(b, col("g_a") < col("g_b"))
      .select(
        col("g_a"),
        col("g_b"),
        col("n_a"),
        col("n_b"),
        (matches.cast("double") / numHashes).as("__est")
      )
    val common = vocab
      .toDF("g_a", "tok")
      .join(vocab.toDF("g_b", "tok"), "tok")
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("__common"))
    pairs
      .join(common, Seq("g_a", "g_b"), "left")
      .select(
        col("g_a").as("group_a"),
        col("g_b").as("group_b"),
        col("n_a"),
        col("n_b"),
        coalesce(col("__common"), lit(0L)).as("n_common"),
        round(
          coalesce(col("__common"), lit(0L)).cast("double") /
            (col("n_a") + col("n_b") - coalesce(col("__common"), lit(0L))),
          6
        ).as("jaccard"),
        (abs(
          col("__est") - coalesce(col("__common"), lit(0L)).cast("double") /
            (col("n_a") + col("n_b") - coalesce(col("__common"), lit(0L)))
        ) <= tol).as("est_ok")
      )
  }

  /** Corpus-wide heavy hitters (top-`k` terms), with the estimate-side
    * guarantee surfaced: `(rank, term, cnt, est_ok)` where `cnt` is the
    * exact count and `est_ok` asserts the count-min-sketch estimate of
    * that term obeys the CMS bound `cnt ≤ est ≤ cnt + ⌈eps·N⌉` (N =
    * total tokens). Completes the sketch family (HLL distinct → q23,
    * Bloom membership → x35, KLL quantiles → x29, MinHash/SimHash
    * similarity → x7/x8) with the FREQUENCY sketch.
    *
    * Scale shape: the exact path is already 100 TB-safe — map-side
    * partial counts collapse each partition's term multiset before the
    * one (term)-keyed exchange, and top-k is `TakeOrderedAndProject`
    * (never a global sort). The sketch's real large-scale role is the
    * INCREMENTAL twin: `count_min_sketch` is a mergeable agg (partials
    * union by counter addition, exactly like the Bloom store in
    * [[graft.streaming.StreamDedup]]), so a ~1 MB sketch per day/shard
    * answers "how often has this term appeared so far" across epochs
    * without ever re-shuffling history. `eps`/`confidence` size the
    * sketch (width ⌈2/eps⌉ × depth ⌈ln(1/(1−conf))⌉ long counters).
    *
    * The sketch row and the k winners are driver-materialized (both
    * bounded: one binary + k rows — the ivfTrain centroid pattern), so
    * the returned frame is small and eager.
    */
  def heavyHitters(
      df: DataFrame,
      text: Column,
      k: Int,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      seed: Int = 42
  ): DataFrame = {
    require(k > 0 && eps > 0 && eps < 1 && confidence > 0 && confidence < 1)
    val spark = df.sparkSession
    import spark.implicits._
    // the exact top-k and the sketch are two actions over the same token
    // stream — persist it so the corpus is tokenized once, not twice
    val toks = df.select(explode(split(text, " ")).as("term")).persist()
    val (topk, skRow) =
      try {
        val t = toks
          .groupBy(col("term"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term"))
          .limit(k)
          .collect()
        val s = toks
          .agg(
            expr(s"count_min_sketch(term, CAST($eps AS DOUBLE), CAST($confidence AS DOUBLE), $seed)")
              .as("sk"),
            count(lit(1)).as("n")
          )
          .head()
        (t, s)
      } finally {
        toks.unpersist()
        ()
      }
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(skRow.getAs[Array[Byte]](0))
    val bound = math.ceil(eps * skRow.getLong(1)).toLong
    topk.zipWithIndex.map { case (r, i) =>
      val (term, cnt) = (r.getString(0), r.getLong(1))
      val est = sketch.estimateCount(term)
      (i + 1, term, cnt, est >= cnt && est <= cnt + bound)
    }.toSeq.toDF("rank", "term", "cnt", "est_ok")
  }

  /** Deterministic EXACT-k sample per group — the fixed-size eval/holdout
    * draw completing the sampling family ([[hashUniform]]/[[sampleByRate]]
    * are rate-based): rank group members by `md5(id)` (then id, for
    * absolute determinism on unlikely digest ties) and keep the first
    * `k`. The draw is partition-, run-, and engine-invariant — the same
    * ids win on any cluster layout and in the DuckDB oracle.
    *
    * Shape at 100 TB: window + `rank ≤ k` compiles to
    * `WindowGroupLimit` in Spark 4 — a partial per-partition top-k runs
    * BEFORE the group exchange (verified in PLANS.md), so a skewed group
    * never sorts more than k·partitions rows globally; per-task state is
    * O(k).
    */
  def sampleExactK(df: DataFrame, group: Column, idCol: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("sample_rank"), "sampleExactK appends 'sample_rank'; rename the existing column first")
    val w = Window
      .partitionBy(group)
      .orderBy(md5(idCol.cast("string")), idCol)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** BM25 relevance scoring of the corpus against one query — the
    * retrieval primitive a RAG-style training pipeline runs to mine
    * related documents (Robertson et al., TREC-3; the idf form is the
    * non-negative Lucene variant ln(1 + (N − df + 0.5)/(df + 0.5))).
    * Returns one row per MATCHING doc: (doc_id, n_matched, score).
    *
    * Shape at 100 TB: the query terms are a plan LITERAL — the
    * `isin` filter runs in the scan projection, so the only rows that
    * ever reach an exchange are (doc, query-term) hits: O(corpus hits),
    * not O(corpus tokens). The df table is ≤ |query| rows by
    * construction (broadcast); N and avgdl ride a 1-row cross join (the
    * same bounded-aggregate pattern as [[domainMix]]). Per-doc token
    * length is computed in the same scan pass, never re-joined.
    */
  def bm25(
      df: DataFrame,
      idCol: Column,
      text: Column,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val toks = df.select(
      idCol.as("doc_id"),
      split(text, " ").as("__toks")
    )
    val stats = toks
      .agg(count(lit(1)).as("__n"), avg(size(col("__toks"))).as("__avgdl"))
    val hits = toks
      .select(col("doc_id"), size(col("__toks")).as("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    hits
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"),
        (log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("__avgdl")))).as("__s")
      )
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), round(sum(col("__s")), 6).as("score"))
  }

  /** Inverted index over the corpus: one row per term with its document
    * frequency and a bounded posting list (ascending doc ids, capped at
    * `maxPostings`) — the retrieval-side artifact a mined corpus ships
    * with. Returns (term, df, n_postings, postings) where `postings` is a
    * comma-joined string (engine-portable; arrays hash differently across
    * engines).
    *
    * Shape at 100 TB: per-doc `array_distinct` runs in the scan
    * projection, so the exchange carries (term, doc) pairs once per
    * CONTAINING doc. The posting-list payload is the one thing here that
    * grows with df, so the cap is enforced BEFORE the collect: a
    * term-keyed `row_number` (spill-safe external sort on the same key
    * the aggregation uses — one exchange total) marks each doc's rank
    * and `collect_list` only sees ranks ≤ `maxPostings` (`when` yields
    * null past the cap and collect_list skips nulls), so no reduce ever
    * holds more than `maxPostings` ids while `df` stays exact. A
    * collect-then-slice formulation would hold the full df-sized list
    * in the aggregation state — the hot-stopword OOM. Hot terms past
    * the cap are exactly the stopwords a real index shards or elides.
    */
  def invertedIndex(
      df: DataFrame,
      idCol: Column,
      text: Column,
      maxPostings: Int = 1000
  ): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    df.select(idCol.as("doc_id"), explode(array_distinct(split(text, " "))).as("term"))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        array_sort(collect_list(when(col("__rn") <= maxPostings, col("doc_id")))).as("__p")
      )
      .select(
        col("term"),
        col("df"),
        size(col("__p")).as("n_postings"),
        concat_ws(",", transform(col("__p"), _.cast("string"))).as("postings")
      )
  }

  /** Batched [[bm25]]: a TABLE of queries (id + term array), top-`k` docs
    * per query — the mining shape a retrieval pipeline actually runs
    * (per-benchmark/per-topic related-document mining). Returns
    * (query_id, rank, doc_id, n_matched, score), rank 1..k.
    *
    * Shape at 100 TB: the distinct (query, term) table is broadcast —
    * every corpus token probes it map-side, so the only rows that reach
    * an exchange are (query, doc, term) HITS; document frequencies come
    * from the hits (O(hits) agg, broadcast back); the per-query top-k is
    * a window + rank filter ⇒ `WindowGroupLimit` partial top-k before
    * the exchange. Nothing corpus-sized ever shuffles.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: Column,
      text: Column,
      queries: DataFrame,
      queryIdCol: Column,
      queryTerms: Column,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qt = queries
      .select(queryIdCol.as("query_id"), explode(array_distinct(queryTerms)).as("term"))
    val toks = df.select(idCol.as("doc_id"), split(text, " ").as("__toks"))
    val stats = toks.agg(count(lit(1)).as("__n"), avg(size(col("__toks"))).as("__avgdl"))
    val hits = toks
      .select(col("doc_id"), size(col("__toks")).as("dl"), explode(col("__toks")).as("term"))
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = hits
      .select(col("term"), col("doc_id"))
      .distinct()
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val scored = hits
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(
        col("query_id"),
        col("doc_id"),
        (log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("__avgdl")))).as("__s")
      )
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), round(sum(col("__s")), 6).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_matched"), col("score"))
  }

  /** Per-document top-`k` TF-IDF terms — the keyword-extraction pass a
    * corpus profiler runs (tf × ln(N/df), raw tf, deterministic ties by
    * term). Returns (doc_id, term, rank, score) with rank 1..k.
    *
    * Shape at 100 TB — three data-movement decisions, each replacing a
    * corpus-token-sized exchange with a bounded one:
    *
    *   - per-doc term counts come from the native
    *     [[graft.functions.text.WordCounts]] kernel (a per-row quantity),
    *     deleting the `groupBy(doc, term)` exchange that moves one row
    *     per distinct token of the corpus;
    *   - the document-frequency table is VOCABULARY-sized and joins back
    *     with a forced broadcast (pass `broadcastVocab = false` for
    *     open-vocabulary corpora whose term table outgrows the driver —
    *     the join then shuffles on term, the pre-kernel shape);
    *   - the top-k is a per-doc aggregation, not a window: collect the
    *     (−score, term) structs (state bounded by the DOC's distinct
    *     terms — unlike an unbounded per-term group), sort, slice k —
    *     and because a doc's rows never left their input partition, the
    *     map-side partial agg collapses them so the final exchange
    *     carries ~one row per document (the x36 lesson).
    *
    * Sum: ~(vocab + docs) rows moved instead of 3× corpus-distinct
    * (doc,term) pairs. The window formulation remains as
    * [[tfidfTopTermsDeclarative]] — the semantic spec, row-for-row equal
    * (asserted in spec and A/B-stressed at 5 M docs).
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: Column,
      text: Column,
      k: Int = 3,
      broadcastVocab: Boolean = true
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df.select(
      idCol.as("doc_id"),
      explode(graft.functions.text.word_counts(text)).as(Seq("term", "tf"))
    )
    val dfreq0 = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dfreq = if (broadcastVocab) broadcast(dfreq0) else dfreq0
    val n = df.agg(count(lit(1)).as("__n"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"),
        col("term"),
        (col("tf") * log(col("__n").cast("double") / col("df"))).as("__score")
      )
      .groupBy(col("doc_id"))
      .agg(
        slice(
          array_sort(collect_list(struct((-col("__score")).as("ns"), col("term")))),
          1,
          k
        ).as("__top")
      )
      .select(col("doc_id"), posexplode(col("__top")))
      .select(
        col("doc_id"),
        col("col.term").as("term"),
        (col("pos") + 1).cast("int").as("rank"),
        round(-col("col.ns"), 6).as("score")
      )
  }

  /** The window formulation of [[tfidfTopTerms]] — the portable semantic
    * spec: `groupBy(doc, term)` counts, window `row_number ≤ k` (the x39
    * oracle SQL shape). Row-for-row equal to the kernel path; kept for
    * the A/B and the spec assertion.
    */
  private[graft] def tfidfTopTermsDeclarative(
      df: DataFrame,
      idCol: Column,
      text: Column,
      k: Int = 3
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df
      .select(idCol.as("doc_id"), explode(split(text, " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"),
        col("term"),
        (col("tf") * log(col("__n").cast("double") / col("df"))).as("__score")
      )
    val w = Window.partitionBy(col("doc_id")).orderBy(col("__score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"), round(col("__score"), 6).as("score"))
  }

  /** Crawl-over-crawl snapshot diff: per-document status between two
    * corpus versions — `added` (id only in new), `removed` (only in
    * old), `changed` (both, normalized digest differs), `unchanged`.
    * The drift report every recurring-ingest pipeline runs before
    * deciding how much downstream work (dedup, re-embedding,
    * re-tokenization) a new crawl actually causes.
    *
    * Shape at 100 TB: both sides reduce to (id, 16-byte normalized
    * digest) in their scan projections — the full-outer join moves
    * digests, never text, and is id-keyed (uniform, AQE-splittable).
    * Summing statuses afterwards is a 4-group aggregate.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      oldId: Column,
      oldText: Column,
      newDf: DataFrame,
      newId: Column,
      newText: Column
  ): DataFrame =
    // presence rides explicit flags, NOT digest nullness: a NULL text has
    // a NULL digest, and reading that as "absent" would misreport a
    // present-but-empty doc as added/removed; `<=>` lets two NULL texts
    // compare as unchanged
    oldDf
      .select(
        oldId.as("doc_id"),
        TextOps.fingerprintMd5(oldText).as("__fp_old"),
        lit(true).as("__in_old")
      )
      .join(
        newDf.select(
          newId.as("doc_id"),
          TextOps.fingerprintMd5(newText).as("__fp_new"),
          lit(true).as("__in_new")
        ),
        Seq("doc_id"),
        "full_outer"
      )
      .select(
        col("doc_id"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__fp_old") <=> col("__fp_new"), "unchanged")
          .otherwise("changed")
          .as("status")
      )

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * A-Res): draw `k` documents with inclusion probability proportional
    * to `weight` — the quality-weighted corpus subsetting step (sample
    * by classifier score, length, or dedup-cluster mass instead of
    * uniformly). Deterministic: the uniform draw `u` comes from the
    * doc-id md5 (52 bits — wide enough that equal-weight docs never tie
    * on the draw key), so the same ids win on any layout, any run, any
    * engine. Key in log form, `ln(u)/w` (monotone in `u^(1/w)`),
    * largest k win. Non-positive weights are excluded (P=0). Returns
    * (doc_id, weight, sample_key 6dp).
    *
    * Shape at 100 TB: one scan, one `TakeOrderedAndProject` — per-task
    * top-k then a k-row merge on the driver; nothing else moves. The
    * same shape as [[dsirResample]]'s draw (A-Res IS Gumbel top-k with
    * weights in place of log-weights).
    */
  def sampleWeighted(df: DataFrame, idCol: Column, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(idCol.as("doc_id"), weight.cast("double").as("weight"))
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10).cast("double") + 1.0) /
      (math.pow(16, 13) + 1.0)
    base
      .filter(col("weight") > 0)
      .withColumn("__key", log(u) / col("weight"))
      .orderBy(col("__key").desc)
      .limit(k)
      .select(col("doc_id"), col("weight"), round(col("__key"), 6).as("sample_key"))
  }

  /** DSIR importance resampling (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): pick the `k` raw-corpus
    * documents whose hashed-unigram distribution most resembles a TARGET
    * corpus. Per bucket b of the [[TextOps.hashedFeatureDim]]-wide space,
    * `λ(b) = ln p̂_target(b) − ln p̂_raw(b)` (add-one smoothing over the
    * bucket space); a doc's log importance weight is `Σ_tokens λ(bucket)`;
    * the paper's without-replacement draw is Gumbel top-k —
    * `key = logw − ln(−ln u)` with `u` derived from the doc-id md5, take
    * the k largest. Returns (doc_id, n_tokens, log_weight, gumbel_key),
    * floats rounded 6dp for the cross-engine check.
    *
    * Shape at 100 TB: the model is a `dim`-long double array — both
    * bucket-count aggregations reduce to ≤ dim rows (map-side partials,
    * then a bounded collect: the ivfTrain/trainLinearHashed pattern) and
    * λ rides the plan as a literal probed with `element_at`, so scoring
    * is one corpus scan whose only exchange carries ~one row per doc
    * (map-side partial sum). The top-k is `TakeOrderedAndProject` —
    * never a global sort. Nothing corpus-sized moves twice.
    */
  def dsirResample(
      raw: DataFrame,
      rawId: Column,
      rawText: Column,
      target: DataFrame,
      targetText: Column,
      k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dim = TextOps.hashedFeatureDim
    def bucketCounts(df: DataFrame, text: Column): Array[Long] = {
      val rows = df
        .select(explode(split(text, " ")).as("tok"))
        .select(TextOps.featureBucket(col("tok")).cast("int").as("b"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
      val a = new Array[Long](dim)
      rows.foreach(r => a(r.getInt(0)) = r.getLong(1))
      a
    }
    val tc = bucketCounts(target, targetText)
    val rc = bucketCounts(raw, rawText)
    val tTot = tc.sum.toDouble + dim
    val rTot = rc.sum.toDouble + dim
    val lam =
      Array.tabulate(dim)(b => math.log((tc(b) + 1) / tTot) - math.log((rc(b) + 1) / rTot))
    // deterministic Gumbel noise from the id hash (52 bits: no key ties
    // even between exact-duplicate docs): u ∈ (0,1), g = −ln(−ln u)
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10).cast("double") + 1.0) /
      (math.pow(16, 13) + 1.0)
    raw
      .select(rawId.as("doc_id"), explode_outer(split(rawText, " ")).as("tok"))
      .select(
        col("doc_id"),
        element_at(lit(lam), TextOps.featureBucket(col("tok")).cast("int") + 1).as("l")
      )
      .groupBy(col("doc_id"))
      .agg(count(col("l")).as("n_tokens"), coalesce(sum(col("l")), lit(0.0)).as("__logw"))
      .withColumn("__key", col("__logw") - log(-log(u)))
      .orderBy(col("__key").desc)
      .limit(k)
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("__logw"), 6).as("log_weight"),
        round(col("__key"), 6).as("gumbel_key")
      )
  }

  /** Per-domain quota cap (RefinedWeb-style: bound any single site's
    * share of the corpus): keep each domain's first `cap` documents in
    * deterministic `(md5(id), id)` hash order. Returns (doc_id, domain,
    * rk), rk 1..cap.
    *
    * The default is the PLAIN window — and that is a measured decision,
    * not an oversight: `row_number ≤ cap` on Spark 4 compiles to
    * `WindowGroupLimit`, a partial per-partition top-k that runs BEFORE
    * the domain exchange, so a hot domain ships ≤ cap rows per input
    * partition and no task ever sorts more than ~cap·partitions rows —
    * the skew problem this operator would otherwise have is already
    * solved inside the engine (same rewrite [[sampleExactK]] leans on).
    * Measured at 5 M rows with a 50%-skew hot domain (StressXOps
    * `curation9`): plain window 3.3 s vs 8.9 s for the hash-quantile
    * prefilter below — the prefilter's extra count-aggregate and joins
    * cost more than the bounded sort they avoid.
    *
    * `prefilter = true` keeps the engine-independent formulation for
    * window shapes `WindowGroupLimit` cannot rewrite (or engines without
    * it): per-domain counts (broadcast, or `broadcastCounts = false`
    * for an AQE-skew-join when the domain table outgrows the driver),
    * then a hash-quantile prune — a row survives iff its 32-bit md5
    * prefix `u < safety·cap/n(domain)`, concentrating survivors at
    * ~safety·cap per domain — then the exact rank. The prefix order is
    * consistent with the full-hash order, so the prune is provably
    * exact whenever a domain keeps ≥ min(cap, n) survivors; domains
    * that undershoot (probability e^{-Θ(cap)} at safety=2) are
    * re-ranked from the full corpus via an (almost always empty)
    * fallback list. Both paths are exact and equal by spec test.
    */
  def capPerDomain(
      df: DataFrame,
      idCol: Column,
      domain: Column,
      cap: Int,
      safety: Double = 2.0,
      broadcastCounts: Boolean = true,
      prefilter: Boolean = false
  ): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(safety >= 1.0, s"safety must be >= 1, got $safety")
    val base = df
      .select(idCol.as("doc_id"), domain.as("domain"))
      .withColumn("__h", md5(col("doc_id").cast("string")))
    val w = Window.partitionBy(col("domain")).orderBy(col("__h"), col("doc_id"))
    def ranked(in: DataFrame): DataFrame =
      in.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= cap)
        .select(col("doc_id"), col("domain"), col("rk"))
    if (!prefilter) return ranked(base)
    val counts0 = base.groupBy(col("domain")).agg(count(lit(1)).as("__n"))
    val counts = if (broadcastCounts) broadcast(counts0) else counts0
    val u = conv(substring(col("__h"), 1, 8), 16, 10).cast("double") / math.pow(16, 8)
    val surv = base
      .join(counts, Seq("domain"))
      .filter(u < least(lit(1.0), lit(safety * cap) / col("__n")))
    val survCnt = surv.groupBy(col("domain")).agg(count(lit(1)).as("__s"))
    // join the undershoot check against the FULL domain-count table, not
    // the survivor counts: a domain whose prune keeps ZERO rows is absent
    // from survCnt entirely, and deriving badDomains from survivors alone
    // would silently drop that whole domain (P ≈ e^{-safety·cap} per
    // domain — real at web-scale domain counts)
    val badDomains = counts0
      .join(survCnt, Seq("domain"), "left")
      .filter(coalesce(col("__s"), lit(0L)) < least(lit(cap.toLong), col("__n")))
      .select(col("domain"))
    ranked(surv.join(broadcast(badDomains), Seq("domain"), "left_anti").drop("__n"))
      .unionByName(ranked(base.join(broadcast(badDomains), Seq("domain"), "left_semi")))
  }

  /** Deterministic global training order + fixed-size shard assignment:
    * rank = position of the doc in global `(md5(id), id)` order (0-based),
    * `shard = rank DIV shardSize`, `pos = rank % shardSize` — the
    * "global shuffle then cut into shards" step that turns a curated
    * corpus into training files, reproducible across engines and runs.
    * Returns (doc_id, rank, shard, pos), all exact ints.
    *
    * Why not `row_number() OVER (ORDER BY …)`: a partition-less window
    * is a SINGLE-TASK global sort — the canonical Spark scale trap. The
    * distributed-exact shape instead: bucket every row by the first 3
    * hex chars of its hash (4096 buckets, which PREFIX the full sort
    * key, so bucket order == global order), count rows per bucket (one
    * map-side-partial agg, ≤4096 rows collected — the ivfTrain bounded-
    * model pattern), and compute `rank = prefixOffset(bucket) +
    * row_number within bucket − 1`. Each window partition holds ~n/4096
    * rows at any corpus size; no task ever sees the global order.
    */
  def assignShards(df: DataFrame, idCol: Column, shardSize: Int): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val buckets = 4096
    // NULL ids have no identity to order on and are excluded, like the
    // rest of the md5-keyed family (a NULL would otherwise surface as a
    // null bucket row in the bounded collect and NPE the offset build)
    val base = df
      .select(idCol.as("doc_id"))
      .filter(col("doc_id").isNotNull)
      .withColumn("__h", md5(col("doc_id").cast("string")))
      .withColumn("__b", conv(substring(col("__h"), 1, 3), 16, 10).cast("int"))
    val counts = base.groupBy(col("__b")).agg(count(lit(1)).as("c")).collect()
    val sizes = new Array[Long](buckets)
    counts.foreach(r => sizes(r.getInt(0)) = r.getLong(1))
    val offsets = new Array[Long](buckets)
    var acc = 0L
    var i = 0
    while (i < buckets) { offsets(i) = acc; acc += sizes(i); i += 1 }
    val wB = Window.partitionBy(col("__b")).orderBy(col("__h"), col("doc_id"))
    base
      .withColumn(
        "rank",
        element_at(lit(offsets), col("__b") + 1) + row_number().over(wB).cast("long") - 1L
      )
      .select(
        col("doc_id"),
        col("rank"),
        (col("rank") - pmod(col("rank"), lit(shardSize.toLong))).divide(lit(shardSize.toLong)).cast("long").as("shard"),
        pmod(col("rank"), lit(shardSize.toLong)).as("pos")
      )
  }

  /** Pointwise-mutual-information collocations: the classic corpus-health /
    * tokenizer-prep statistic (Church & Hanks 1990) — adjacent token pairs
    * whose joint count is far above chance,
    * `pmi = ln(c12 · N / (c1 · c2))`, gated at `minCount` joint
    * occurrences and returned as the top-`k` by PMI.
    *
    * Scale shape (the 100 TB path): bigram generation is a pure per-row
    * projection (`transform` over the token array — zero shuffle), and
    * BOTH count tables go through two-level hash aggregation with map-side
    * partials, so the exchanges carry one row per DISTINCT bigram/token,
    * not per occurrence. The `minCount` gate runs on the aggregated pair
    * table BEFORE the two unigram joins (web-scale bigram tables are
    * heavy-tailed — the gate drops the hapax mass, typically >60 % of
    * distinct pairs). Unigram joins are plain equi-joins on the word (AQE
    * broadcasts the vocab side when it fits); the final top-k is
    * `TakeOrderedAndProject` on the ROUNDED pmi (6 dp, ties broken by the
    * pair) — never a global sort, and the rounding makes the cut
    * cross-engine deterministic. All counts are exact longs; the pmi
    * products widen to DOUBLE before multiplying (`c12·N` as a long
    * overflows past ~3·10⁹ tokens — an ANSI-mode throw at corpus scale;
    * the correctly-rounded double products keep the ratio far from both
    * overflow and denormal range at any width).
    */
  def pmiCollocations(
      df: DataFrame,
      text: Column,
      minCount: Int = 3,
      k: Int = 100,
      window: Int = 1
  ): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = df.select(split(text, " ").as("w"))
    // ordered (w_i, w_{i+d}) pairs for every distance d in [1, window] —
    // still a zero-shuffle projection: one guarded slice+transform per
    // distance, flattened before the explode (window=1 is the classic
    // adjacent-bigram PMI; window>1 is the skip-gram co-occurrence table
    // embedding pipelines feed on)
    val perDistance = (1 to window).map { d =>
      // greatest(…, 0) keeps the slice length non-negative for docs
      // shorter than d+1 tokens (empty slice -> no pairs, right type)
      transform(
        slice(col("w"), lit(1), greatest(size(col("w")) - d, lit(0))),
        (x, i) => struct(x.as("w1"), element_at(col("w"), i + lit(d + 1)).as("w2"))
      )
    }
    val pairs = toks
      .filter(size(col("w")) >= 2)
      .select(explode(flatten(array(perDistance: _*))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uni = toks
      .select(explode(col("w")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).cast("long").as("n_tokens"))
    pairs
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(total)
      .select(
        col("w1"),
        col("w2"),
        col("c12"),
        // counts widen to double BEFORE multiplying: c12·N as a long
        // overflows past ~3e9 tokens (an ANSI-mode throw at corpus
        // scale); the double products are correctly rounded and the
        // oracle multiplies in the same order
        round(
          log(
            (col("c12").cast("double") * col("n_tokens").cast("double")) /
              (col("c1").cast("double") * col("c2").cast("double"))
          ),
          6
        ).as("pmi")
      )
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Epoch-capped temperature mixture (the UniMax / mT5-style sampling
    * step, Chung et al. 2023): allot a document budget `B` across domains
    * proportional to `n_d^α` with α = 0.5 (√-temperature — the standard
    * multilingual up-weighting of small domains), cap every domain at
    * `maxEpochs` passes over its data, and materialize the allotment as a
    * deterministic per-document repeat count:
    *
    *   budget_d  = min(⌊B·√n_d / Σ√n⌋, ⌊maxEpochs·n_d⌋)
    *   n_repeats = ⌊budget_d/n_d⌋ (+1 for the `budget_d mod n_d` docs
    *               ranked first by the md5-uniform key, ties by id)
    *
    * √ rather than a free α because IEEE sqrt is correctly rounded in
    * every engine — `pow(x, α)` is libm-dependent and would put the floor
    * on a cross-engine boundary. One-shot allotment (no UniMax leftover
    * redistribution loop): the overflow a cap releases is simply unspent,
    * which keeps the whole budget computation a two-row-group aggregate
    * plus a broadcast join — replayable by any engine, no iteration.
    *
    * Scale shape: the budget table is one row per domain (KBs) —
    * `broadcast()` by construction. The only corpus-wide work is the
    * remainder pick: a per-domain `row_number` over the uniform key.
    * Unlike [[capPerDomain]]'s rank≤cap filter this rank CARRIES a value
    * (+1/+0) rather than filtering, so WindowGroupLimit cannot prune it —
    * on a hot-domain corpus, prefilter the +1 CANDIDATES exactly as
    * [[capPerDomain]] does (u < safety·rem/n with the undershoot
    * fallback) before ranking; at typical web-domain cardinalities the
    * per-domain sort is the cheapest step of the job.
    */
  def epochMixture(
      df: DataFrame,
      domain: Column,
      idCol: Column,
      budget: Long,
      maxEpochs: Double = 4.0
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    // null ids (md5-family contract) AND null domains are excluded up
    // front: a null domain would otherwise vanish silently at the
    // budget equi-join (null keys never match) — making the exclusion
    // explicit keeps "every input row is either budgeted or was
    // knowingly dropped" true
    val base = df
      .select(domain.as("domain"), idCol.as("doc_id"))
      .filter(col("doc_id").isNotNull && col("domain").isNotNull)
    val counts = base.groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))
    val sumW = counts.agg(sum(sqrt(col("n_docs").cast("double"))).as("sum_w"))
    val budgets = counts
      .crossJoin(sumW)
      .select(
        col("domain"),
        col("n_docs"),
        least(
          floor(lit(budget.toDouble) * sqrt(col("n_docs").cast("double")) / col("sum_w")),
          floor(lit(maxEpochs) * col("n_docs").cast("double"))
        ).cast("long").as("budget_docs")
      )
      .select(
        col("domain"),
        col("n_docs"),
        col("budget_docs"),
        floor(col("budget_docs").cast("double") / col("n_docs").cast("double"))
          .cast("long").as("epochs"),
        (col("budget_docs") - col("n_docs") *
          floor(col("budget_docs").cast("double") / col("n_docs").cast("double")).cast("long"))
          .as("rem")
      )
    val wD = Window.partitionBy(col("domain")).orderBy(col("u"), col("doc_id"))
    base
      .withColumn("u", hashUniform(col("doc_id")))
      .join(broadcast(budgets), "domain")
      .withColumn("rk", row_number().over(wD))
      .select(
        col("doc_id"),
        col("domain"),
        (col("epochs") + when(col("rk") <= col("rem"), 1L).otherwise(0L)).as("n_repeats")
      )
  }

  /** JSONL corpus ingestion with corrupt-line accounting — the interchange
    * format of training-data pipelines: parse each line as
    * `{doc_id, text, lang}` (PERMISSIVE — Spark's Jackson parse), carry a
    * per-line `is_corrupt` flag instead of dropping or failing, so the
    * drop mass is observable (the reference's load-shed accounting
    * discipline applied to ingestion). Returns (line_id, doc_id, text,
    * lang, is_corrupt); corrupt lines keep their line_id with null
    * fields. Pure per-row projection; zero shuffle.
    */
  def jsonlIngest(df: DataFrame, lineIdCol: Column, lineCol: Column): DataFrame = {
    val schema = "doc_id BIGINT, text STRING, lang STRING, _corrupt STRING"
    df.select(
        lineIdCol.as("line_id"),
        lineCol.isNull.as("__null_line"),
        from_json(lineCol, schema, Map("columnNameOfCorruptRecord" -> "_corrupt")).as("j")
      )
      .select(
        col("line_id"),
        col("j.doc_id").as("doc_id"),
        col("j.text").as("text"),
        col("j.lang").as("lang"),
        // a NULL line is corrupt input, not a valid all-null record —
        // from_json returns null silently and would otherwise mislabel it
        (col("j._corrupt").isNotNull || col("__null_line")).as("is_corrupt")
      )
  }

  /** CSV corpus ingestion with corrupt-line accounting — the [[jsonlIngest]]
    * discipline applied to RFC 4180 CSV (quoted fields, embedded
    * commas/quotes via `""` doubling): parse each line against
    * `doc_id BIGINT, text STRING, lang STRING, n_chars INT` in PERMISSIVE
    * mode and carry `is_corrupt` instead of dropping or failing.
    * Empirically-pinned Spark semantics (see `CsvIngestSpec`): a
    * type-mismatched or missing/surplus field flags the line corrupt but
    * KEEPS the well-formed fields (unlike JSON, which nulls the row), an
    * unterminated quote consumes the rest of the line into the open
    * field and flags corrupt, and a NULL input line parses to a null
    * struct that would silently mislabel as valid — it is flagged
    * explicitly, one invalid row, nothing poisoned. Pure per-row
    * projection; zero shuffle.
    */
  def csvIngest(df: DataFrame, lineIdCol: Column, lineCol: Column): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("doc_id BIGINT, text STRING, lang STRING, n_chars INT, _corrupt STRING")
    df.select(
        lineIdCol.as("line_id"),
        lineCol.isNull.as("__null_line"),
        from_csv(
          lineCol,
          schema,
          Map(
            "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt",
            "escape" -> "\""
          )
        ).as("c")
      )
      .select(
        col("line_id"),
        col("c.doc_id").as("doc_id"),
        col("c.text").as("text"),
        col("c.lang").as("lang"),
        col("c.n_chars").as("n_chars"),
        (col("c._corrupt").isNotNull || col("__null_line")).as("is_corrupt")
      )
  }

  /** Per-domain boilerplate removal — the template stripper of a web
    * pipeline: a line occurring in ≥ `fracNum/fracDen` of a domain's
    * documents (with ≥ `minDocs` documents to judge from) is that
    * domain's template (nav bars, cookie banners, footers) and is removed
    * from every document of the domain. This is the DOMAIN-scoped sibling
    * of the global C4 line dedup ([[lineDedup]]): global dedup keeps one
    * occurrence somewhere; template stripping removes all of them, but
    * only where frequency proves them boilerplate. The threshold is
    * INTEGER arithmetic (df·fracDen ≥ n_docs·fracNum) so no float
    * boundary can disagree across engines.
    *
    * Scale shape — text never shuffles: the frequency pass carries
    * (domain, 16-byte line digest, doc) with map-side per-doc dedup, the
    * boiler verdicts come back to each document as a BOUNDED int-array of
    * line indexes via one id-keyed join, and reconstruction is an indexed
    * lambda filter over the original text column in place. Returns
    * (doc_id, n_lines, n_boiler, text_clean).
    */
  def domainBoilerplate(
      df: DataFrame,
      idCol: Column,
      domainCol: Column,
      text: Column,
      fracNum: Int = 3,
      fracDen: Int = 10,
      minDocs: Int = 5
  ): DataFrame = {
    val docs = df.select(idCol.as("doc_id"), domainCol.as("domain"), text.as("__t"))
    val lines = docs.select(
      col("doc_id"),
      col("domain"),
      posexplode(split(col("__t"), "\n")).as(Seq("idx", "line"))
    )
    val nDocs = docs.groupBy(col("domain")).agg(count(lit(1)).as("__nd"))
    val lineDf = lines
      .select(col("domain"), col("doc_id"), md5(col("line")).as("fp"))
      .distinct() // a line repeated within one doc counts once toward df
      .groupBy(col("domain"), col("fp"))
      .agg(count(lit(1)).as("__df"))
    val boiler = lineDf
      .join(nDocs, "domain")
      .where(col("__df") * fracDen >= col("__nd") * fracNum && col("__nd") >= minDocs)
      .select(col("domain"), col("fp"))
    // verdicts per doc: the bounded int-array of boilerplate line indexes
    val badIdx = lines
      .select(col("doc_id"), col("domain"), col("idx"), md5(col("line")).as("fp"))
      .join(boiler, Seq("domain", "fp"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("idx")).as("__bad"))
    docs
      .join(badIdx, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(split(col("__t"), "\n")).as("n_lines"),
        coalesce(size(col("__bad")), lit(0)).as("n_boiler"),
        array_join(
          filter(
            split(col("__t"), "\n"),
            (l, i) => !coalesce(array_contains(col("__bad"), i), lit(false))
          ),
          "\n"
        ).as("text_clean")
      )
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm):
    * from the k-gram digest sequence, select each window-of-`w`'s minimal
    * digest (leftmost position on equal digests) — the guarantee-bearing
    * fingerprint subset: any shared run of ≥ w+k−1 tokens between two
    * documents shares at least one selected fingerprint, at ~2/(w+1)
    * density instead of every position. The per-position digests are the
    * native [[graft.functions.text.WindowMd5s]] kernel (engine-exact
    * MD5), and BLOB/binary comparison is unsigned-lexicographic in both
    * engines, so the selected SET replays exactly.
    *
    * Scale shape: one kernel pass + explode, then two per-DOC window
    * functions (frames per doc are bounded by doc length); the output is
    * the deduplicated (doc, pos, fp) set — ~2n/(w+1) rows.
    */
  def winnowFingerprints(
      df: DataFrame,
      text: Column,
      idCol: Column,
      k: Int = 4,
      w: Int = 4
  ): DataFrame = {
    require(w >= 2, s"winnow window must be >= 2, got $w")
    val frames = df.select(
      idCol.as("doc_id"),
      posexplode(graft.functions.text.window_md5s(text, k)).as(Seq("pos", "h"))
    )
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val win = wDoc.rowsBetween(Window.currentRow, w - 1)
    frames
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("m", min(struct(col("h"), col("pos"))).over(win))
      .filter(col("pos") <= col("n") - w) // complete windows only
      .select(col("doc_id"), col("m.pos").as("pos"), lower(hex(col("m.h"))).as("fp"))
      .dropDuplicates("doc_id", "pos", "fp")
  }

  /** Deterministic cross-domain negative sampling — the contrastive /
    * retrieval-training prep step (DPR-style in-corpus negatives): for
    * every document, `k` pseudo-random draws from the corpus, keeping
    * those that land in a DIFFERENT domain (and are not the doc itself).
    * Returns (doc_id, draw, neg_id, neg_domain) with draw ∈ [0, k) —
    * surviving draws only, so heavy-domain docs keep slightly fewer than
    * `k`; pad `k` accordingly. Fully deterministic: draw j of doc d
    * targets global rank ⌊u(md5(d ++ "#" ++ j)) · N⌋, so the negative
    * set never changes across runs, partitionings, or engines.
    *
    * Scale shape: the rank table is [[assignShards]]'s distributed-exact
    * global order (4096-bucket prefix ranking — no global-sort task) with
    * the domain joined back id-keyed; the draws are a zero-shuffle
    * projection + explode; resolution is ONE equi-join on the integer
    * rank — uniform by construction (the md5 draw can't skew), so no
    * salting is ever needed.
    */
  def sampleNegatives(df: DataFrame, idCol: Column, domain: Column, k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(idCol.as("doc_id"), domain.as("domain")).filter(col("doc_id").isNotNull)
    val ranks = assignShards(base, col("doc_id"), shardSize = Int.MaxValue)
      .select(col("doc_id").as("neg_id"), col("rank"))
      .join(base.select(col("doc_id").as("neg_id"), col("domain").as("neg_domain")), Seq("neg_id"))
    val n = base.agg(count(lit(1)).as("n_docs"))
    val draws = base
      .crossJoin(n)
      .select(
        col("doc_id"),
        col("domain"),
        posexplode(transform(sequence(lit(0), lit(k - 1)), j => {
          val u = hashUniform(concat(col("doc_id").cast("string"), lit("#"), j.cast("string")))
          floor(u * col("n_docs")).cast("long")
        })).as(Seq("draw", "rank"))
      )
    draws
      .join(ranks, Seq("rank"))
      .filter(col("neg_id") =!= col("doc_id") && !(col("neg_domain") <=> col("domain")))
      .select(col("doc_id"), col("draw"), col("neg_id"), col("neg_domain"))
  }

  /** Multi-source catalog merge with provenance (the Pile/Dolma-style
    * corpus assembly step): reduce every catalog to (id, content digest)
    * regardless of its wider schema, stamp each row with its catalog name
    * and priority (list order = trust order), and content-dedup across
    * sources keeping the highest-priority copy (ties → smallest id).
    * Every surviving row carries `n_copies` and the sorted list of
    * catalogs that held the content — dedup with an audit trail, never a
    * silent drop. The winner set is (catalog, doc_id)-addressed, so full
    * rows are recovered by a per-catalog semi-join AFTER the merge — the
    * wide columns never ride the digest exchange.
    *
    * Shape at 100 TB: texts reduce to 16-byte md5 digests in the scan
    * projection, and the whole merge is ONE partial-aggregating exchange
    * on that digest — the winner rides a `min(struct(priority, doc_id,
    * catalog))` aggregate (lexicographic = exactly the priority-then-id
    * rule), provenance a bounded `collect_set` (≤ |catalogs| entries), so
    * a text duplicated a billion times (boilerplate) collapses map-side
    * per task BEFORE the shuffle. No windows (no skew mitigation exists
    * for them), no join-back, nothing corpus-sized keyed by text.
    */
  def mergeCatalogs(
      catalogs: Seq[(String, DataFrame)],
      idCol: String,
      textCol: String
  ): DataFrame = {
    require(catalogs.nonEmpty, "need at least one catalog")
    require(catalogs.map(_._1).distinct.size == catalogs.size, "catalog names must be unique")
    val stamped = catalogs.zipWithIndex.map { case ((name, df), pri) =>
      df.select(
        col(idCol).cast("long").as("doc_id"),
        md5(col(textCol)).as("fp"),
        lit(name).as("catalog"),
        lit(pri).as("priority")
      )
    }
    stamped
      .reduce(_.unionByName(_))
      .groupBy(col("fp"))
      .agg(
        count(lit(1)).as("n_copies"),
        array_join(array_sort(collect_set(col("catalog"))), ",").as("all_sources"),
        min(struct(col("priority"), col("doc_id"), col("catalog"))).as("__w")
      )
      .select(
        col("__w.doc_id").as("doc_id"),
        col("fp"),
        col("__w.catalog").as("catalog"),
        col("__w.priority").as("priority"),
        col("n_copies"),
        col("all_sources")
      )
  }

  /** INTRA-document line dedup: drop repeated lines WITHIN each document
    * (in-page boilerplate, pasted blocks, chat-log echoes), keeping first
    * occurrences in order — the per-document complement of the
    * cross-corpus [[dedupLines]]. Pure per-row array expressions, zero
    * shuffle; the `array_position` scan is O(lines²) per document, which
    * is the right trade while documents hold hundreds of lines.
    *
    * MONSTER-ROW guard (the O-14 load-shed discipline applied to row
    * size): a document past `maxLines` would turn the quadratic scan into
    * a single-task stall (2M lines = 4·10¹² comparisons), so such rows
    * are SHED — lines pass through un-deduped, `is_shed` flags them, and
    * the shed mass is countable (never a silent skip). CaseWhen evaluates
    * lazily, so a shed row never executes the quadratic branch. Route
    * shed documents through [[chunkTokens]] first if they are a real
    * shape.
    */
  def dedupLinesWithin(
      df: DataFrame,
      idCol: Column,
      text: Column,
      maxLines: Int = 100000
  ): DataFrame = {
    require(maxLines >= 1, s"maxLines must be >= 1, got $maxLines")
    val lines = split(coalesce(text, lit("")), "\n")
    val deduped = filter(lines, (l, i) => array_position(lines, l) === (i + 1).cast("long"))
    val inB = size(lines) <= maxLines
    val kept = when(inB, deduped).otherwise(lines)
    df.select(
      idCol.as("doc_id"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      md5(array_join(kept, "\n")).as("fp"),
      (!inB).as("is_shed")
    )
  }

  /** Token-budget truncation (the context-window fit step before
    * packing): cut a document to `maxTokens` under one of three
    * policies — `head` (keep the opening), `tail` (keep the ending), or
    * `middle_out` (keep opening + ending, drop the middle — the
    * long-document policy that preserves both the title/lede and the
    * conclusion). Pure per-row array slicing, zero shuffle; emits the
    * token accounting (`n_tokens`, `kept_tokens`, `truncated`) so the
    * drop mass is observable — never a silent cut.
    */
  def truncateTokens(
      df: DataFrame,
      idCol: Column,
      text: Column,
      maxTokens: Int,
      policy: String = "middle_out"
  ): DataFrame = {
    require(maxTokens >= 2, s"maxTokens must be >= 2, got $maxTokens")
    val toks = split(coalesce(text, lit("")), " ")
    val n = size(toks)
    val headN = maxTokens - maxTokens / 2
    val tailN = maxTokens / 2
    val cut = policy match {
      case "head" => slice(toks, 1, maxTokens)
      case "tail" => slice(toks, -maxTokens, maxTokens)
      case "middle_out" =>
        concat(slice(toks, 1, headN), slice(toks, -tailN, tailN))
      case other => throw new IllegalArgumentException(s"unknown policy: $other")
    }
    val kept = when(n <= maxTokens, toks).otherwise(cut)
    df.select(
      idCol.as("doc_id"),
      n.as("n_tokens"),
      size(kept).as("kept_tokens"),
      (n > maxTokens).as("truncated"),
      array_join(kept, " ").as("text")
    )
  }

  /** Inverse of [[chunkTokens]] (overlap = 0): reassemble chunk rows back
    * into documents — the round trip a chunk-level pipeline (embed,
    * score, filter per chunk) needs to re-emit documents. One exchange
    * keyed doc_id; per-group state is the document's own chunks
    * (collect_list partial-aggregates per task), so a document never
    * exceeds its own size in any one place.
    */
  def reassembleChunks(
      chunks: DataFrame,
      idCol: Column,
      idxCol: Column,
      chunkCol: Column
  ): DataFrame =
    chunks
      .select(idCol.as("doc_id"), struct(idxCol.cast("long").as("i"), chunkCol.as("c")).as("__s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), array_sort(collect_list(col("__s"))).as("__ss"))
      .select(
        col("doc_id"),
        col("n_chunks"),
        array_join(flatten(transform(col("__ss"), s => s.getField("c"))), " ").as("text")
      )

  /** Crawl-archive ingestion over [[graft.functions.text.WarcSplit]]:
    * one row per framed record with per-record `is_valid` — the
    * [[jsonlIngest]] accounting discipline for WARC-shaped blobs. Pure
    * projection + explode, zero shuffle; blobs (archive files)
    * parallelize across rows, the sequential parse lives inside each
    * row.
    */
  def warcIngest(df: DataFrame, blobIdCol: Column, blobCol: Column): DataFrame = {
    // a NULL blob is a corrupt archive, not an absent one — surface it as
    // one invalid record (the jsonlIngest NULL-line lesson); an EMPTY
    // blob is a legitimately empty archive and yields no records
    val recs = when(
      blobCol.isNull,
      array(
        struct(
          lit(null).cast("string").as("uri"),
          lit(null).cast("string").as("payload"),
          lit(false).as("valid")
        )
      )
    ).otherwise(graft.functions.text.warc_split(blobCol))
    df.select(blobIdCol.as("blob_id"), posexplode(recs).as(Seq("rec_idx", "rec")))
      .select(
        col("blob_id"),
        col("rec_idx"),
        col("rec.uri").as("uri"),
        col("rec.payload").as("payload"),
        col("rec.valid").as("is_valid")
      )
  }

  /** Per-source dataset card: the one-row-per-source summary a corpus
    * release ships next to its shards — document/token/char totals,
    * language spread, and the exact duplicate rate (1 − distinct digests
    * / docs). Everything is engine-portable arithmetic.
    *
    * Shape at 100 TB: one scan; the token/char sums partial-aggregate
    * per source, and the two exact distincts (languages, digests) plan
    * through Catalyst's Expand — the [[graft.operators.Audit.profile]]
    * exactness trade, documented there; output is |sources| rows.
    */
  def datasetCard(
      df: DataFrame,
      sourceCol: Column,
      idCol: Column,
      text: Column,
      langCol: Column
  ): DataFrame =
    df.select(
        sourceCol.as("source"),
        idCol.as("__id"),
        TextOps.tokenCount(text).as("__tok"),
        length(text).as("__len"),
        langCol.as("__lang"),
        md5(text).as("__fp")
      )
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).cast("long").as("n_tokens"),
        sum(col("__len")).cast("long").as("n_chars"),
        count_distinct(col("__lang")).as("n_langs"),
        count_distinct(col("__fp")).as("n_distinct"),
        round(avg(col("__tok")), 6).as("mean_tokens")
      )
      .withColumn(
        "dup_rate",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6)
      )

  /** Deterministic curriculum ordering: interleave quality tiers
    * round-robin into one global training order, so every training window
    * sees the configured tier mixture instead of consuming all of one
    * tier first (the ordering counterpart of [[epochMixture]]'s domain
    * budgets). Within a tier, order is the md5-of-id permutation (the
    * [[assignShards]] contract: partition-invariant, replayable);
    * globally, `train_order = rank_in_tier · nTiers + tier` — a
    * collision-free round-robin (tiers exhaust at different times; later
    * positions simply skip the exhausted tiers' residues, preserving
    * relative order).
    *
    * Shape at 100 TB: the [[assignShards]] trick per tier — ranks come
    * from 4096 md5-prefix buckets whose per-(tier, bucket) counts are a
    * BOUNDED collect (≤ nTiers·4096 longs, a plan literal), so no
    * single-partition window ever materializes a tier (a tier is
    * corpus-sized — `ROW_NUMBER() OVER (PARTITION BY tier)` would be the
    * hot-key window this library never ships). One exchange keyed
    * (tier, bucket).
    */
  def curriculumOrder(df: DataFrame, idCol: Column, tierCol: Column, nTiers: Int): DataFrame = {
    require(nTiers >= 1 && nTiers <= 64, s"nTiers must be in [1, 64], got $nTiers")
    val buckets = 4096
    val base = df
      .select(idCol.as("doc_id"), tierCol.cast("int").as("tier"))
      .filter(col("doc_id").isNotNull && col("tier").isNotNull)
      .withColumn("__h", md5(col("doc_id").cast("string")))
      .withColumn("__b", conv(substring(col("__h"), 1, 3), 16, 10).cast("int"))
    val counts = base.groupBy(col("tier"), col("__b")).agg(count(lit(1)).as("c")).collect()
    val sizes = new Array[Long](nTiers * buckets)
    counts.foreach { r =>
      val t = r.getInt(0)
      require(t >= 0 && t < nTiers, s"tier $t outside [0, $nTiers)")
      sizes(t * buckets + r.getInt(1)) = r.getLong(2)
    }
    val offsets = new Array[Long](nTiers * buckets)
    val acc = new Array[Long](nTiers)
    var i = 0
    while (i < buckets) {
      var t = 0
      while (t < nTiers) {
        offsets(t * buckets + i) = acc(t)
        acc(t) += sizes(t * buckets + i)
        t += 1
      }
      i += 1
    }
    val wB = Window.partitionBy(col("tier"), col("__b")).orderBy(col("__h"), col("doc_id"))
    base
      .withColumn(
        "rank_in_tier",
        element_at(lit(offsets), col("tier") * buckets + col("__b") + 1) +
          row_number().over(wB).cast("long") - 1L
      )
      .select(
        col("doc_id"),
        col("tier"),
        col("rank_in_tier"),
        (col("rank_in_tier") * nTiers + col("tier")).as("train_order")
      )
  }

  /** Tokenizer-fit audit: per-document vocabulary coverage against a
    * fixed token vocabulary — the OOV-rate signal that decides whether a
    * tokenizer (e.g. the [[graft.operators.TextOps.trainBpe]] output)
    * actually fits a candidate corpus before a training run burns compute
    * on it. Returns per-doc token totals, OOV counts, distinct OOV types
    * and the OOV rate.
    *
    * Shape at 100 TB: the vocabulary is model state (≤ a few hundred
    * thousand rows) and broadcasts; the corpus explodes to (doc, token)
    * but aggregates straight back to one row per document. The distinct
    * OOV-type count forces the two-phase distinct aggregate on the
    * (doc_id, token) key — if that second exchange ever matters, drop
    * `n_oov_types` and the remaining plan is a pure one-exchange partial
    * agg.
    */
  def vocabCoverage(
      df: DataFrame,
      idCol: Column,
      text: Column,
      vocab: DataFrame
  ): DataFrame = {
    val toks = df.select(idCol.as("doc_id"), explode(split(coalesce(text, lit("")), " ")).as("token"))
    toks
      .join(broadcast(vocab.select(col("token"), lit(1).as("__in_v")).distinct()), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).as("n_oov"),
        count_distinct(when(col("__in_v").isNull, col("token"))).as("n_oov_types")
      )
      .withColumn("oov_rate", round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Ranking-evaluation metrics per query: MRR and nDCG@k (Järvelin &
    * Kekäläinen 2002, "Cumulated Gain-Based Evaluation of IR
    * Techniques") over (query, rank, relevance) rows — the standard
    * eval layer above [[bm25TopK]]/[[graft.operators.Similarity]]
    * retrieval: DCG@k = Σ_{i≤k} rel_i/log2(i+1), IDCG from the
    * relevance-sorted ideal ordering, nDCG = DCG/IDCG (0 when the query
    * has no relevant results), MRR = 1/rank of the first relevant
    * result (0 if none). All 6dp; each discount term is 6dp-PRE-ROUNDED
    * before summation (log2 is transcendental — the x126 rule), so any
    * engine replays the sums bit-equal.
    *
    * Shape at 100 TB: ONE partial-aggregating exchange on the query key
    * — no per-query list materialization, no windows: the ideal-ordering
    * rank needed for IDCG is itself computed relationally (count of
    * higher-relevance rows + tie order), here specialized to BINARY
    * relevance where IDCG@k = Σ_{i≤min(k,n_rel)} 1/log2(i+1) is a
    * closed form of the per-query relevant count.
    */
  def rankingMetrics(
      df: DataFrame,
      queryCol: Column,
      rankCol: Column,
      relCol: Column,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // discount lookup 1..k, pre-rounded — shared literal on both sides
    val disc: Array[Double] =
      (1 to k).map(i => math.rint(1e6 / (math.log(i + 1) / math.log(2))) / 1e6).toArray
    val rows = df.select(
      queryCol.as("query_id"),
      rankCol.cast("int").as("rank"),
      (relCol.cast("int") > 0).as("rel")
    )
    // rank >= 1 guard: a 0/negative rank must score 0, not reach
    // element_at (ANSI throws on index 0; negative indexes from the end)
    val dcgTerm =
      when(col("rel") && col("rank") >= 1 && col("rank") <= k, element_at(lit(disc), col("rank")))
        .otherwise(lit(0.0))
    val agg = rows
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_results"),
        sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel"),
        min(when(col("rel") && col("rank") >= 1, col("rank"))).as("__fr"),
        round(sum(dcgTerm), 6).as("dcg")
      )
    // binary-relevance IDCG@k: the ideal list packs all relevant results
    // first, so IDCG = prefix sum of the (pre-rounded) discount table at
    // min(k, n_rel); partials stay UNROUNDED — only the output rounds,
    // matching the oracle's SUM-then-ROUND shape
    val prefix: Array[Double] = disc.scanLeft(0.0)(_ + _).tail
    // idcg is ROUNDED once and the division uses the ROUNDED value — the
    // oracle's SUM-then-ROUND-then-divide shape exactly
    val idcgR = round(
      when(col("n_rel") >= 1, element_at(lit(prefix), least(col("n_rel").cast("int"), lit(k))))
        .otherwise(lit(0.0)),
      6
    )
    agg
      .withColumn("idcg", idcgR)
      .select(
        col("query_id"),
        col("n_results"),
        col("n_rel"),
        round(when(col("__fr").isNotNull, lit(1.0) / col("__fr")).otherwise(lit(0.0)), 6)
          .as("mrr"),
        col("dcg"),
        col("idcg"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(lit(0.0)), 6).as("ndcg")
      )
  }

  /** Temperature-based language rebalancing (the multilingual-pretraining
    * mixture recipe: sample languages ∝ pₗ^α — Conneau et al. 2020
    * "Unsupervised Cross-lingual Representation Learning at Scale" §3.1
    * (XLM-R, α=0.3), same scheme as mC4/mT5): high-resource languages are
    * DOWN-sampled and the tail up-weighted toward uniform as α → 0.
    *
    * Per language: share pₗ = nₗ/N, temperature share
    * qₗ = pₗ^α / Σ pₘ^α, target = ⌊qₗ·B⌋ docs for budget B =
    * ⌊budgetFraction·N⌋, keep rate rₗ = min(1, target/nₗ); a document is
    * kept iff its [[hashUniform]] draw < rₗ (deterministic: a doc's fate
    * never changes across runs/engines/partitionings). Rates are
    * 6dp-ROUNDED before the draw compares (the x126 pre-round rule): the
    * only cross-engine divergence risk is summation-order ULP in
    * Σ pₘ^α, and rounding the rate absorbs it.
    *
    * Returns per-doc `(doc_id, lang, keep)`. Shape at 100 TB: one
    * language-sized count aggregate (bounded model state), rates come
    * back via a broadcast join, the keep flag is a zero-shuffle codegen
    * projection — upsampling beyond rate 1.0 is out of scope (keep-rate
    * capped; epoch-level repetition is [[epochMixture]]'s job).
    */
  def langTemperature(
      df: DataFrame,
      idCol: Column,
      langCol: Column,
      alpha: Double,
      budgetFraction: Double
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(
      budgetFraction > 0.0 && budgetFraction <= 1.0,
      s"budgetFraction must be in (0,1], got $budgetFraction"
    )
    val rows = df.select(idCol.as("doc_id"), langCol.as("lang"))
    val counts = rows.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .withColumn("__pa", pow(col("n_docs").cast("double"), lit(alpha)))
      .crossJoin(
        broadcast(
          counts.agg(
            sum(pow(col("n_docs").cast("double"), lit(alpha))).as("__sa"),
            sum(col("n_docs")).as("__n")
          )
        )
      )
      .withColumn("q", round(col("__pa") / col("__sa"), 6))
      .withColumn("target", floor(col("q") * floor(col("__n") * budgetFraction)))
      .withColumn(
        "rate",
        round(least(lit(1.0), col("target").cast("double") / col("n_docs")), 6)
      )
      .select(col("lang").as("__rl"), col("rate"))
    rows
      .join(broadcast(rates), col("lang") <=> col("__rl"))
      .select(
        col("doc_id"),
        col("lang"),
        (hashUniform(col("doc_id")) < col("rate")).as("keep")
      )
  }

  /** Per-group quantile (rank) normalization of a score column — the
    * cross-domain calibration step before any global score threshold:
    * quality scores from different domains/classifiers live on different
    * scales, and percent-rank within the domain is the standard
    * scale-free transform (each score → fraction of the domain strictly
    * below it, ties sharing a value — PERCENT_RANK semantics).
    *
    * Shape at 100 TB: NEVER a per-row window over the corpus. Rows
    * collapse to the (group, score) aggregate first (one partial-agg
    * exchange); the cumulative count runs on THAT table, whose window
    * partitions are bounded by distinct scores per group — for any real
    * quality score (bounded ints, 6dp floats) orders of magnitude
    * smaller than row count; the result joins back on (group, score)
    * where AQE absorbs skew. percent_rank = strictly-below / (n−1),
    * 0.0 for single-row groups, 6dp.
    */
  def quantileNormalize(
      df: DataFrame,
      idCol: Column,
      scoreCol: Column,
      groupCol: Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .filter(scoreCol.isNotNull)
      .select(idCol.as("doc_id"), groupCol.as("grp"), scoreCol.cast("double").as("score"))
    val agg = rows.groupBy(col("grp"), col("score")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score"))
    val ranked = agg
      .withColumn("__below", sum(col("__c")).over(w) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("grp"))))
      .select(
        col("grp").as("__rg"),
        col("score").as("__rs"),
        when(col("__n") > 1, round(col("__below").cast("double") / (col("__n") - 1), 6))
          .otherwise(lit(0.0))
          .as("pr")
      )
    rows
      .join(ranked, col("grp") <=> col("__rg") && col("score") === col("__rs"))
      .select(col("doc_id"), col("grp"), col("score"), col("pr"))
  }
}
