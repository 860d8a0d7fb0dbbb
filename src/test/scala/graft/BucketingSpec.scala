package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._


/** Bucketing: pre-partitioned co-located joins — the shuffle-elimination
  * layout for repeated large-scale joins (both sides bucketed on the join
  * key → zero Exchange in the join plan).
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed-bucketed join plans with NO shuffle exchange") {
    // default warehouse (./spark-warehouse); tables dropped in finally
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    graft.sources.Tables
      .load(spark, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    graft.sources.Tables
      .load(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")

    val joined = spark
      .table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    // force a non-broadcast join so bucketing is what saves the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = joined.queryExecution.executedPlan
      val shufflesBeforeAgg = plan.collect { case s: ShuffleExchangeExec => s }
      // exactly ONE exchange (for the groupBy) — none for the join itself
      assert(
        shufflesBeforeAgg.length == 1,
        s"expected only the aggregation exchange, got ${shufflesBeforeAgg.length}:\n$plan"
      )
      // and the result is correct
      val viaBuckets = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val plain = graft.sources.Tables
        .load(spark, sfDir, "lineitem")
        .join(
          graft.sources.Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")
        )
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
        .collect()
        .map(r => (r.getString(0), r.getDouble(1)))
        .toMap
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
