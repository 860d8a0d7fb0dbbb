package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-event analytics over the stream table: funnel completion and
  * cohort retention — the product-analytics layer a message pipeline's
  * northbound consumers (the reference's Kafka sinks feed exactly such
  * systems) run on the delivered stream. The reference stops at transport
  * (`doc/user-guide.adoc:12-14` — south/northbound interfaces only); these
  * give the delivered events a query surface.
  *
  * 100 TB design notes:
  *   - [[funnel]] never materializes per-user event lists: each step is a
  *     partial-aggregating `groupBy(user).min(ts)` over only that step's
  *     events, joined user-to-user with the previous step's frame — k
  *     steps = k filtered aggregates + (k−1) equi-joins on the user key,
  *     all AQE-absorbable, each frame at most one row per user. The
  *     step-order constraint (`ts > prev_t`) rides the join filter, so
  *     the wire carries (user, ts) pairs only.
  *   - [[retentionCohorts]] reduces to (user, week) DISTINCT rows before
  *     any join (the map side collapses each user's in-week activity),
  *     then one user-keyed equi-join against the cohort table and one
  *     partial-aggregating exchange on (cohort, offset) — a week of
  *     activity costs one 16-byte row regardless of event volume.
  */
object EventOps {

  /** Ordered funnel: per step, the number of users who completed the
    * step sequence IN ORDER (each step strictly after the previous one's
    * earliest qualifying time — the standard "first touch" funnel
    * semantics), plus the conversion rate vs step 1 (6dp).
    *
    * Output: `step` (1-based), `event_type`, `n_users`, `conversion`.
    */
  def funnel(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"funnel steps must be distinct, got $steps")
    val base = events.select(userCol.as("__u"), tsCol.as("__ts"), typeCol.as("__ty"))
    val frames = steps.tail.scanLeft(
      base.filter(col("__ty") === steps.head).groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    ) { (prev, step) =>
      base
        .filter(col("__ty") === step)
        .join(prev.select(col("__u"), col("__t").as("__pt")), Seq("__u"))
        .filter(col("__ts") > col("__pt"))
        .groupBy(col("__u"))
        .agg(min(col("__ts")).as("__t"))
    }
    val perStep = frames.zip(steps).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("event_type"), col("n_users"))
    }
    val first = frames.head.agg(count(lit(1)).as("__n1"))
    perStep
      .reduce(_.unionAll(_))
      .crossJoin(broadcast(first))
      .select(
        col("step"),
        col("event_type"),
        col("n_users"),
        when(col("__n1") > 0, round(col("n_users").cast("double") / col("__n1").cast("double"), 6))
          .otherwise(lit(0.0))
          .as("conversion")
      )
  }

  /** Weekly cohort retention: users are cohorted by the ISO week
    * (Monday-truncated) of their first event; each later active week
    * contributes one (cohort, offset) cell. Retention is the cell's user
    * count over the cohort's size (offset 0), 6dp.
    *
    * Output: `cohort_week` (timestamp), `week_offset` (int), `n_users`,
    * `retention`.
    */
  def retentionCohorts(events: DataFrame, userCol: Column, tsCol: Column): DataFrame = {
    val uw = events
      .filter(userCol.isNotNull && tsCol.isNotNull)
      .select(userCol.as("__u"), date_trunc("week", tsCol).as("__wk"))
      .distinct()
    val cohort = uw.groupBy(col("__u")).agg(min(col("__wk")).as("__c0"))
    val cells = uw
      .join(cohort, Seq("__u"))
      .select(
        col("__c0"),
        // datediff on DATEs, not epoch-seconds/604800: week-trunc
        // boundaries are exactly N*7 days apart in calendar days even
        // when a DST transition makes the wall-clock span 604800±3600 s,
        // so this buckets correctly in any session timezone
        (datediff(col("__wk").cast("date"), col("__c0").cast("date")) / 7).cast("int").as("week_offset")
      )
      .groupBy(col("__c0"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells
      .filter(col("week_offset") === 0)
      .select(col("__c0").as("__sc"), col("n_users").as("__sz"))
    cells
      .join(sizes, cells("__c0") === col("__sc"))
      .select(
        col("__c0").as("cohort_week"),
        col("week_offset"),
        col("n_users"),
        round(col("n_users").cast("double") / col("__sz").cast("double"), 6).as("retention")
      )
  }

  /** CUPED variance reduction accounting (Deng, Xu, Kohavi, Walker 2013,
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data" §4): for each experiment group,
    * θ = cov(X,Y)/var(X) over the pre-period covariate X, the adjusted
    * metric Y′ = Y − θ(X − X̄) keeps the mean and shrinks the variance by
    * exactly ρ²: var(Y′) = var(Y)·(1−ρ²) — the standard pre-experiment
    * sensitivity boost every A/B platform ships.
    *
    * Output per group: `n`, `mean_y`, `theta`, `var_y`, `var_adj`,
    * `var_reduction` (= ρ², the fraction of variance CUPED removes),
    * all 6dp; groups with var(X) = 0 read θ = 0 and no reduction.
    *
    * Shape at 100 TB: ONE partial-aggregating exchange on the group key —
    * var/covar are streaming co-moments with map-side combine; no
    * windows, no joins, no second pass (var_adj comes from the identity,
    * not from materializing Y′).
    */
  def cuped(
      df: DataFrame,
      groupCol: Column,
      metricCol: Column,
      covariateCol: Column
  ): DataFrame = {
    val rows = df
      .filter(metricCol.isNotNull && covariateCol.isNotNull)
      .select(
        groupCol.as("grp"),
        metricCol.cast("double").as("y"),
        covariateCol.cast("double").as("x")
      )
    rows
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("y")).as("__my"),
        var_pop(col("y")).as("__vy"),
        var_pop(col("x")).as("__vx"),
        covar_pop(col("x"), col("y")).as("__cxy")
      )
      .select(
        col("grp"),
        col("n"),
        round(col("__my"), 6).as("mean_y"),
        round(when(col("__vx") > 0, col("__cxy") / col("__vx")).otherwise(lit(0.0)), 6)
          .as("theta"),
        round(col("__vy"), 6).as("var_y"),
        round(
          when(col("__vx") > 0, col("__vy") - col("__cxy") * col("__cxy") / col("__vx"))
            .otherwise(col("__vy")),
          6
        ).as("var_adj"),
        round(
          when(
            col("__vx") > 0 && col("__vy") > 0,
            col("__cxy") * col("__cxy") / (col("__vx") * col("__vy"))
          ).otherwise(lit(0.0)),
          6
        ).as("var_reduction")
      )
  }
}
