package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-quality profiling for corpus pipelines: one pass over a table
  * producing per-column null counts, numeric min/max, and string distinct
  * counts — the audit step that gates a 100 TB ingest before it fans out.
  *
  * Plan-shape honesty: nulls/min/max are decomposable (single partial-
  * aggregated scan), but EXACT multi-column distinct counts plan through
  * Catalyst's Expand — the input is replicated once per distinct column
  * before the shuffle. That is the price of exactness (and what the
  * driver's DuckDB oracle checks); at 100 TB pass `approx = true` to
  * swap in `approx_count_distinct` (HLL, fully decomposable, one scan
  * with no Expand) once exactness stops being worth the replication.
  */
object Audit {

  /** Wide one-row profile: `n_rows` plus, per column, `<c>_nulls`;
    * numerics add `<c>_min`/`<c>_max`; strings add `<c>_distinct`.
    */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val aggs = df.schema.fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val base = Seq(count(when(c.isNull, 1)).as(s"${f.name}_nulls"))
      f.dataType match {
        case _: NumericType =>
          base ++ Seq(min(c).as(s"${f.name}_min"), max(c).as(s"${f.name}_max"))
        case StringType =>
          val distinct =
            if (approx) approx_count_distinct(c) else countDistinct(c)
          base :+ distinct.as(s"${f.name}_distinct")
        case _ => base
      }
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Cross-split leakage audit: given near-duplicate PAIRS and a split
    * assignment, count pairs whose endpoints landed in different splits —
    * the contamination [[CorpusOps.leakageSafeSplit]] prevents by
    * construction and a plain id-hash split does not. Run it as the
    * release gate on any train/val/test carve: a non-zero
    * cross-split row is leaked eval signal. Output: one row per
    * (split_a, split_b) ordered pair class (canonicalized so a↔b and b↔a
    * count together), with `leaked = split_a != split_b`.
    *
    * Shape at 100 TB: pairs join the (id, split) table twice on id —
    * near-dup pair sets are O(dups), and the split table reduces to
    * (id, split) in the scan; both joins are plain equi-joins AQE can
    * broadcast when the pair set is small. The final aggregate is a few
    * rows (splits²).
    */
  def splitLeakage(
      pairs: DataFrame,
      pairA: org.apache.spark.sql.Column,
      pairB: org.apache.spark.sql.Column,
      splits: DataFrame,
      splitId: org.apache.spark.sql.Column,
      splitCol: org.apache.spark.sql.Column
  ): DataFrame = {
    val s = splits.select(splitId.as("__sid"), splitCol.as("__split"))
    pairs
      .select(pairA.as("__a"), pairB.as("__b"))
      // LEFT joins + a "missing" class: an endpoint absent from the split
      // table is itself an audit finding (an un-assigned near-dup), not a
      // row to silently drop
      .join(s.select(col("__sid"), col("__split").as("__split_a")), col("__a") === col("__sid"), "left")
      .drop("__sid")
      .join(s.select(col("__sid"), col("__split").as("__split_b")), col("__b") === col("__sid"), "left")
      .select(
        least(coalesce(col("__split_a"), lit("missing")), coalesce(col("__split_b"), lit("missing")))
          .as("split_a"),
        greatest(coalesce(col("__split_a"), lit("missing")), coalesce(col("__split_b"), lit("missing")))
          .as("split_b")
      )
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaked", col("split_a") =!= col("split_b"))
  }

  /** Classifier reliability table: bin predictions by score and compare
    * each bin's mean score to its observed positive rate — the
    * calibration evidence a quality-classifier gate
    * ([[TextOps.scoreLinearHashed]]) needs before its threshold means
    * anything. `bin = min(floor(score·bins), bins−1)`; output per bin:
    * count, mean score (6dp), positive fraction (6dp), and the gap.
    * One partial-aggregating exchange of `bins` rows.
    */
  def calibrationBins(
      df: DataFrame,
      scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column,
      bins: Int = 10
  ): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    df.select(
        least(floor(scoreCol.cast("double") * bins), lit(bins - 1)).cast("int").as("bin"),
        scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y")
      )
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("__s")), 6).as("mean_score"),
        round(avg(col("__y")), 6).as("pos_rate")
      )
      .withColumn("gap", round(col("mean_score") - col("pos_rate"), 6))
  }

  /** Distribution-drift report between two corpus snapshots (PSI — the
    * population stability index, the standard dataset-shift gate): bin a
    * numeric signal into fixed-width bins, estimate each snapshot's bin
    * mass with additive smoothing, and report
    * PSI = Σ_bins (p_a − p_b) · ln(p_a / p_b) per group.
    *
    * Semantics pinned for replay: bins are OBSERVED bins only (a bin with
    * zero rows in BOTH snapshots contributes nothing); smoothing is +0.5
    * per observed bin so one-sided zeros stay finite; `psi` is rounded 6dp
    * on the final value only. PSI > 0.1 is the conventional "shifted"
    * flag, > 0.25 "severely shifted".
    *
    * Scale shape: ONE corpus pass — the group×bin aggregation — and from
    * there everything runs on the model-sized (group, bin, two counts)
    * table: per-group totals are window sums over that tiny aggregate
    * (NOT a second aggregation of the raw input, which would plan a
    * second corpus scan), then one final per-group fold.
    */
  def driftReport(
      df: DataFrame,
      groupCol: Column,
      inB: Column,
      valueCol: Column,
      binWidth: Double,
      nBins: Int,
      threshold: Double = 0.1
  ): DataFrame = {
    val binned = df.select(
      groupCol.as("grp"),
      inB.as("in_b"),
      least(floor(valueCol / binWidth), lit(nBins - 1)).cast("int").as("bin")
    )
    val perBin = binned
      .groupBy(col("grp"), col("bin"))
      .agg(
        sum(when(!col("in_b"), 1L).otherwise(0L)).as("a_cnt"),
        sum(when(col("in_b"), 1L).otherwise(0L)).as("b_cnt")
      )
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val withTotals = perBin.select(
      col("grp"),
      col("a_cnt"),
      col("b_cnt"),
      sum(col("a_cnt")).over(w).as("n_a"),
      sum(col("b_cnt")).over(w).as("n_b"),
      count(lit(1)).over(w).as("n_bins_observed")
    )
    val pa = (col("a_cnt").cast("double") + 0.5) /
      (col("n_a").cast("double") + lit(0.5) * col("n_bins_observed").cast("double"))
    val pb = (col("b_cnt").cast("double") + 0.5) /
      (col("n_b").cast("double") + lit(0.5) * col("n_bins_observed").cast("double"))
    withTotals
      .groupBy(col("grp"), col("n_a"), col("n_b"), col("n_bins_observed"))
      .agg(round(sum((pa - pb) * log(pa / pb)), 6).as("psi"))
      .select(
        col("grp"),
        col("n_a"),
        col("n_b"),
        col("n_bins_observed"),
        col("psi"),
        (col("psi") > threshold).as("drifted")
      )
  }

  /** Cohen's kappa inter-annotator agreement per group: po = observed
    * agreement, pe = chance agreement from the marginal label
    * distributions, kappa = (po − pe)/(1 − pe) (null when pe = 1 — a
    * constant-label degenerate cell has no chance-corrected signal).
    *
    * Scale shape: ONE corpus pass aggregates to (group, labelA, labelB)
    * cells; totals, the agreement diagonal, and both marginals are
    * re-aggregations of that model-sized cell table — the corpus is never
    * touched again. Margin products are folded in DOUBLE (ra·cb can pass
    * 2^63 once groups reach ~3G rows); po/pe/kappa round 6dp at the end.
    */
  def cohenKappa(
      df: DataFrame,
      groupCol: Column,
      raterA: Column,
      raterB: Column
  ): DataFrame = {
    val cells = df
      .select(groupCol.as("grp"), raterA.as("a"), raterB.as("b"))
      .groupBy(col("grp"), col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
    val base = cells
      .groupBy(col("grp"))
      .agg(
        sum(col("c")).as("n"),
        sum(when(col("a") === col("b"), col("c")).otherwise(lit(0L))).as("agree")
      )
    val margA = cells.groupBy(col("grp"), col("a").as("k")).agg(sum(col("c")).as("ra"))
    val margB = cells.groupBy(col("grp"), col("b").as("k")).agg(sum(col("c")).as("cb"))
    val peTab = margA
      .join(margB, Seq("grp", "k"))
      .groupBy(col("grp"))
      .agg(sum(col("ra").cast("double") * col("cb").cast("double")).as("pp"))
    val poC = col("agree").cast("double") / col("n").cast("double")
    val peC = coalesce(col("pp"), lit(0.0)) / (col("n").cast("double") * col("n").cast("double"))
    base
      .join(peTab, Seq("grp"), "left")
      .select(
        col("grp"),
        col("n"),
        round(poC, 6).as("po"),
        round(peC, 6).as("pe"),
        round(
          when(peC === 1.0, lit(null).cast("double"))
            .otherwise((poC - peC) / (lit(1.0) - peC)),
          6
        ).as("kappa")
      )
  }

  /** k-anonymity audit (Sweeney 2002, "k-Anonymity: A Model for
    * Protecting Privacy"): how exposed are rows whose quasi-identifier
    * combination — the released non-key attributes that jointly
    * re-identify (the paper's ZIP+birthdate+sex result) — is shared by
    * fewer than k records. The release-gate twin to [[graft.operators
    * .TextOps.redactPii]]: redaction hides direct identifiers, this
    * measures the joint-attribute side channel.
    *
    * Output: one row per equivalence-class size band (`1`, `2..k-1`,
    * `>=k`) with the number of classes and rows in it, plus the at-risk
    * rate — an accounting table, never the per-class frame (which is
    * corpus-sized and itself a disclosure).
    *
    * Shape at 100 TB: one partial-aggregating exchange on the
    * quasi-identifier tuple (map-side combine collapses dense classes),
    * then a 3-row band aggregate; nothing but (tuple, count) crosses the
    * wire, and the bands broadcast-join the 1-row total.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[Column], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    val keyed = df.select(quasiCols.zipWithIndex.map { case (c, i) => c.as(s"__q$i") }: _*)
    val classes = keyed
      .groupBy(keyed.columns.map(col).toSeq: _*)
      .agg(count(lit(1)).as("__c"))
    val banded = classes
      .select(
        when(col("__c") === 1, lit("unique"))
          .when(col("__c") < k, lit(s"2..${k - 1}"))
          .otherwise(lit(s">=$k"))
          .as("band"),
        col("__c")
      )
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_classes"), sum(col("__c")).as("n_rows"))
    banded
      .crossJoin(broadcast(banded.agg(sum(col("n_rows")).as("__tot"))))
      .select(
        col("band"),
        col("n_classes"),
        col("n_rows"),
        round(col("n_rows").cast("double") / col("__tot"), 6).as("row_share")
      )
  }

  /** Laplace-mechanism count release (Dwork, McSherry, Nissim, Smith
    * 2006, "Calibrating Noise to Sensitivity in Private Data Analysis"):
    * per-group counts published with Laplace(1/ε) noise — the sensitivity
    * of a counting query is 1, so scale b = 1/ε gives ε-DP. Output:
    * `(grp, n_true, noise, noisy_count, epsilon)` with noisy_count =
    * max(0, round(n + noise)).
    *
    * HONESTY CONTRACT: the noise here is drawn from the DETERMINISTIC
    * md5-seeded uniform ([[CorpusOps.hashUniform]] of the group key) via
    * the inverse-CDF transform — which makes releases reproducible and
    * oracle-checkable but is NOT differentially private (DP requires
    * secret, fresh randomness; a public seed lets anyone subtract the
    * noise). This operator is the release-PIPELINE twin: the plumbing,
    * clipping, and accounting are production shapes; swap the uniform
    * for a secure source (and drop `n_true`/`noise` from the output) to
    * get the real mechanism — that is [[dpCountsSecure]]. The ln is the
    * one transcendental — its
    * value is 6dp-pre-rounded before the count add (the x126 rule), so
    * both engines round the same integer.
    *
    * Shape at 100 TB: one partial-aggregating exchange on the group key;
    * the noise is a zero-shuffle projection over the group-sized result.
    */
  def dpCounts(df: DataFrame, groupCol: Column, epsilon: Double): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val b = 1.0 / epsilon
    val counts = df.select(groupCol.as("grp")).groupBy(col("grp")).agg(count(lit(1)).as("n_true"))
    val u = CorpusOps.hashUniform(col("grp"))
    val noise =
      round(-lit(b) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5)), 6)
    counts.select(
      col("grp"),
      col("n_true"),
      noise.as("noise"),
      greatest(lit(0L), round(col("n_true") + noise, 0).cast("long")).as("noisy_count"),
      lit(epsilon).as("epsilon")
    )
  }

  // per-executor-thread SecureRandom: the UDF runs on task threads; a
  // shared instance would serialize every draw on its internal lock
  @transient private lazy val secureRng: ThreadLocal[java.security.SecureRandom] =
    ThreadLocal.withInitial(() => new java.security.SecureRandom())

  /** One Laplace(b) draw from SecureRandom via the inverse CDF. log1p
    * keeps precision near u = 0; the 2^-53 chance of u = -0.5 (log of
    * exactly 0) is clamped rather than resampled so a draw can never
    * block or return -Infinity.
    */
  private[graft] def laplaceSecure(b: Double): Double = {
    val u = secureRng.get().nextDouble() - 0.5
    // log1p(-2|u|), not log(1-2|u|): near u = 0 the subtraction from 1.0
    // quantizes at ulp(1.0) and flattens tiny draws; the clamp guards the
    // 2^-53 chance of u = -0.5 exactly (log of 0 -> -Infinity)
    val a = math.max(-2.0 * math.abs(u), math.nextUp(-1.0))
    if (u == 0.0) 0.0 else -b * math.signum(u) * math.log1p(a)
  }

  /** The PRODUCTION Laplace release — [[dpCounts]]' honesty contract
    * discharged: noise from `SecureRandom` (secret, fresh — actual ε-DP
    * for counting queries, sensitivity 1, scale 1/ε), and the output
    * carries ONLY `(grp, noisy_count, epsilon)`: publishing `n_true` or
    * the noise would let a reader subtract the mechanism away, so the
    * deployable surface drops them by construction, not by caller
    * discipline. Non-reproducible BY DESIGN — the seeded [[dpCounts]]
    * twin remains the oracle/replay path (x161).
    *
    * Same shape at 100 TB as the twin: one partial-aggregating exchange
    * on the group key; the draw is a zero-shuffle projection over the
    * group-sized result (one SecureRandom call per GROUP, not per row).
    */
  def dpCountsSecure(df: DataFrame, groupCol: Column, epsilon: Double): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val b = 1.0 / epsilon
    val draw = udf(() => laplaceSecure(b)).asNondeterministic()
    df.select(groupCol.as("grp"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("__n"))
      .select(
        col("grp"),
        greatest(lit(0L), round(col("__n") + draw(), 0).cast("long")).as("noisy_count"),
        lit(epsilon).as("epsilon")
      )
  }
}
