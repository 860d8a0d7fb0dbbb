package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Mergeable-sketch membership surface: Spark's internal Bloom filter
  * expressions (the machinery behind `InjectRuntimeFilter`,
  * `BloomFilterAggregate` / `BloomFilterMightContain`) exposed as Columns,
  * so operators can build the sketch distributedly (partial sketches OR-
  * merged map-side, the driver only ever sees the serialized filter) and
  * probe it in codegen.
  *
  * Scale notes (the reason this exists): a 100 TB accepted corpus has
  * O(10^10) digests — too big to broadcast as a join build side, but its
  * Bloom filter at ~1% fpp is a few GB and SHARDABLE by digest prefix; at
  * the single-filter sizes Spark supports (capped by
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, default 8 MB ≈
  * 9 M items at 3% fpp) the sketch rides a scalar subquery and reaches
  * every executor once. Raise the two conf caps
  * (`...bloomFilter.maxExpectedNumItems`, `...bloomFilter.maxNumBits`)
  * for bigger reference sets — `BloomFilterAggregate` silently clamps its
  * arguments to them.
  */
object sketch {

  /** Aggregate a Bloom filter over a LONG column (hash strings/binary with
    * `xxhash64` first — the same input convention Spark's runtime filter
    * uses). Returns the serialized filter as BINARY (one row).
    *
    * `expectedItems`/`numBits` are clamped to the session's runtime-filter
    * conf caps; `numBits <= 0` derives the optimal width for `fpp`.
    */
  def bloom_filter_agg(hashed: Column, expectedItems: Long, fpp: Double = 0.03, numBits: Long = -1L): Column = {
    val bits =
      if (numBits > 0) numBits
      else math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
    Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(hashed),
        Bridge.expression(lit(expectedItems)),
        Bridge.expression(lit(bits))
      ).toAggregateExpression()
    )
  }

  /** Probe a serialized Bloom filter (foldable or scalar-subquery column —
    * e.g. `df.select(bloom_filter_agg(...)).scalar()`) with a LONG hash.
    * NULL-safe at the caller: an empty aggregate yields a NULL filter and
    * the probe then returns NULL, so gate with `coalesce(..., lit(false))`.
    */
  def might_contain(bloom: Column, hashed: Column): Column =
    Bridge.column(
      BloomFilterMightContain(Bridge.expression(bloom), Bridge.expression(hashed))
    )
}
