package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

import graft.operators.Skew

/** Skew utilities + stream-stream join with watermarks (§2.5). */
class SkewAndJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("salted join == plain join on skewed keys") {
    val left = (1 to 2000).map(i => (if (i % 10 == 0) "cold" + i else "hot", i)).toDF("k", "v")
    val right = Seq(("hot", 100), ("cold10", 1)).toDF("k", "w")
    val plain = left.join(right, "k").agg(sum($"v" * $"w")).as[Long].collect()(0)
    val salted = Skew.saltedJoin(left, right, "k", 8).agg(sum($"v" * $"w")).as[Long].collect()(0)
    assert(salted == plain)
  }

  test("salted two-phase sum == plain sum") {
    val df = (1 to 10000).map(i => ("k" + (i % 3), i.toLong)).toDF("key", "v")
    val plain = df.groupBy($"key").agg(sum($"v")).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedSum(df, $"key", $"v", 16).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("stream-stream inner join with watermarks (purchases x signups)") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val purchases = MemoryStream[(Timestamp, Long)]
    val signups = MemoryStream[(Timestamp, Long)]
    val p = purchases.toDF().toDF("p_ts", "user").withWatermark("p_ts", "10 seconds")
    val s = signups.toDF().toDF("s_ts", "s_user").withWatermark("s_ts", "10 seconds")
    val joined = p.join(
      s,
      expr("user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 1 hour")
    )
    purchases.addData((new Timestamp(base + 60000), 1L), (new Timestamp(base + 60000), 2L))
    signups.addData((new Timestamp(base), 1L), (new Timestamp(base), 3L))
    val q = joined
      .select($"user", unix_millis($"p_ts").as("p"), unix_millis($"s_ts").as("s"))
      .writeStream.format("memory").queryName("ss_join").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only user 1 has both a signup and an in-window purchase
    assert(got == Set((1L, base + 60000, base)))
  }
}
