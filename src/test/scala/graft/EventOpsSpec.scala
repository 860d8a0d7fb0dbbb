package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("funnel: in-order completion only; out-of-order and stalled users drop at the right step") {
    val events = Seq(
      // u1 completes a -> b -> c in order
      (1L, ts(1), "a"), (1L, ts(2), "b"), (1L, ts(3), "c"),
      // u2: b BEFORE its only a, never re-b's -> drops at step 2
      (2L, ts(1), "b"), (2L, ts(2), "a"), (2L, ts(3), "c"),
      // u3: a then b, no c -> drops at step 3
      (3L, ts(1), "a"), (3L, ts(2), "b"),
      // u4: never enters (no a at all, b+c present)
      (4L, ts(1), "b"), (4L, ts(2), "c"),
      // u5: a, b same-timestamp as a (NOT strictly after) -> drops at step 2
      (5L, ts(1), "a"), (5L, ts(1), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps
      .funnel(events, col("user_id"), col("ts"), col("event_type"), Seq("a", "b", "c"))
      .orderBy(col("step"))
      .collect()
    assert(got.map(_.getAs[Int]("step")).toSeq == Seq(1, 2, 3))
    assert(got.map(_.getAs[String]("event_type")).toSeq == Seq("a", "b", "c"))
    assert(got.map(_.getAs[Long]("n_users")).toSeq == Seq(4, 2, 1))
    assert(got.map(_.getAs[Double]("conversion")).toSeq == Seq(1.0, 0.5, 0.25))
  }

  test("funnel: step order matters — u2's c is ignored because step 2 was never reached") {
    val events = Seq(
      (2L, ts(1), "b"), (2L, ts(2), "a"), (2L, ts(3), "c")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps
      .funnel(events, col("user_id"), col("ts"), col("event_type"), Seq("a", "b", "c"))
      .orderBy(col("step"))
      .collect()
    assert(got.map(_.getAs[Long]("n_users")).toSeq == Seq(1, 0, 0))
  }

  test("retentionCohorts: offsets from the cohort week, gaps preserved, fractions of cohort size") {
    // 2024-01-01 is a Monday: weeks are 01, 08, 15, 22
    val events = Seq(
      // cohort W0 (Jan 1): u1 active W0, W1, W3 (skips W2); u2 active W0 only
      (1L, ts(1), "e"), (1L, ts(2), "e"), (1L, ts(8), "e"), (1L, ts(22), "e"),
      (2L, ts(3), "e"),
      // cohort W1 (Jan 8): u3 active W1 and W2
      (3L, ts(9), "e"), (3L, ts(16), "e")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps
      .retentionCohorts(events, col("user_id"), col("ts"))
      .collect()
    val m = got.map { r =>
      (r.getAs[Timestamp]("cohort_week").toString.take(10), r.getAs[Int]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("retention"))
    }.toMap
    assert(m.size == 5)
    assert(m(("2024-01-01", 0)) == ((2L, 1.0)))
    assert(m(("2024-01-01", 1)) == ((1L, 0.5)))
    assert(!m.contains(("2024-01-01", 2))) // the skipped week emits no cell
    assert(m(("2024-01-01", 3)) == ((1L, 0.5)))
    assert(m(("2024-01-08", 0)) == ((1L, 1.0)))
    assert(m(("2024-01-08", 1)) == ((1L, 1.0)))
  }

  test("retentionCohorts: week offsets survive a DST spring-forward session timezone") {
    // America/New_York springs forward 2024-03-10: the Mar-4 → Mar-11
    // week-trunc boundaries are 604800-3600 wall-clock seconds apart, so
    // the old epoch/604800 truncation read offset 0 for the second week
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val events = Seq(
        (1L, Timestamp.valueOf("2024-03-05 12:00:00"), "e"), // week of Mon Mar 4
        (1L, Timestamp.valueOf("2024-03-12 12:00:00"), "e")  // week of Mon Mar 11 (post-DST)
      ).toDF("user_id", "ts", "event_type")
      val got = EventOps
        .retentionCohorts(events, col("user_id"), col("ts"))
        .collect()
        .map(r => r.getAs[Int]("week_offset") -> r.getAs[Long]("n_users"))
        .toMap
      assert(got == Map(0 -> 1L, 1 -> 1L), s"DST week misbucketed: $got")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("cuped: perfectly correlated covariate removes ALL variance; uncorrelated removes none") {
    // g1: y = 2x + 3 exactly -> theta = 2, var_adj = 0, reduction = 1
    val g1 = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g1", 4.0))
      .toDF("grp", "x")
      .withColumn("y", col("x") * 2 + 3)
    val r1 = EventOps.cuped(g1, col("grp"), col("y"), col("x")).head()
    assert(r1.getAs[Double]("theta") == 2.0)
    assert(r1.getAs[Double]("var_adj") == 0.0 && r1.getAs[Double]("var_reduction") == 1.0)
    assert(r1.getAs[Double]("mean_y") == 8.0)
    // g2: symmetric y over constant-free x with zero covariance
    // x = [1,2,1,2], y = [1,1,-1,-1]: cov = 0 -> theta 0, var_adj = var_y
    val g2 = Seq(("g2", 1.0, 1.0), ("g2", 2.0, 1.0), ("g2", 1.0, -1.0), ("g2", 2.0, -1.0))
      .toDF("grp", "x", "y")
    val r2 = EventOps.cuped(g2, col("grp"), col("y"), col("x")).head()
    assert(r2.getAs[Double]("theta") == 0.0)
    assert(r2.getAs[Double]("var_adj") == r2.getAs[Double]("var_y"))
    assert(r2.getAs[Double]("var_reduction") == 0.0)
    // constant covariate: var(x) = 0 must not divide by zero
    val g3 = Seq(("g3", 5.0, 1.0), ("g3", 5.0, 3.0)).toDF("grp", "x", "y")
    val r3 = EventOps.cuped(g3, col("grp"), col("y"), col("x")).head()
    assert(r3.getAs[Double]("theta") == 0.0 && r3.getAs[Double]("var_adj") == 1.0)
  }
}
