package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale. AQE's skew-join
  * handles sort-merge cases at runtime; these are the explicit,
  * plan-shaping tools for when the skew is known or AQE can't see it
  * (e.g., broadcast-ineligible medium dimension joined on a power-law key).
  */
object Skew {

  /** Salted equi-join for a skewed LEFT side: left keys get a random salt
    * in [0, saltFactor); the right side is replicated across every salt
    * value; the join key becomes (key, salt), spreading each hot key over
    * `saltFactor` reducers. Semantics are exactly the plain inner join.
    *
    * Cost: |R| · saltFactor replication — use when R is medium (too big to
    * broadcast, small enough to replicate) and L has power-law keys.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // salt from the whole row's content hash: DETERMINISTIC across task
    // retries (spark_partition_id/monotonically_increasing_id are not, and
    // a nondeterministic salt recomputed on retry could double- or
    // drop-count rows under stage reruns). Identical duplicate rows share a
    // salt — acceptable: real skew is many DISTINCT rows per hot key.
    val l = left.withColumn(
      "_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int")
    )
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation with an explicit salt for extreme single-key
    * skew: phase 1 aggregates on (key, salt), phase 2 merges per key.
    * Spark's partial aggregation already does this map-side; the explicit
    * version guards the case where one key's PARTIAL results still
    * overwhelm a single reducer (billions of rows per key).
    * `aggs` must be decomposable (sum/count/min/max).
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltFactor: Int): DataFrame = {
    // salt on (value, partition id), not value alone: the degenerate hot
    // key this guards is billions of IDENTICAL rows, whose value-hash is
    // ONE constant — partition id spreads them while staying deterministic
    // per task attempt (same input partition → same salt on retry; the
    // final sum is salt-invariant either way)
    df.groupBy(
        key.as("k"),
        pmod(xxhash64(value, spark_partition_id()), lit(saltFactor)).as("_salt")
      )
      .agg(sum(value).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))
  }
}
