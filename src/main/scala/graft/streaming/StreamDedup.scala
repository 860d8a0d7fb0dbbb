package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming twin of [[graft.operators.Dedup.incrementalBloom]]: a
  * `foreachBatch` combinator that dedupes every micro-batch against the
  * digests of everything previously accepted, then hands the survivors to
  * the wrapped sink — continuous corpus ingestion where a re-ingested
  * document is dropped forever after its first acceptance.
  *
  * The accepted corpus lives as a DIGEST STORE: a parquet directory of
  * 16-byte `fp` digests partitioned by epoch
  * (`<store>/epoch=<n>/part-*.parquet`). Per micro-batch:
  *
  *   1. read the store EXCLUDING the current epoch's partition (partition
  *      pruning on the `epoch` directory column — see idempotency below);
  *   2. [[graft.operators.Dedup.incrementalBloomOnDigests]] against it —
  *      the store is scanned (sketch fold + confirm probe) but NEVER
  *      shuffled, and within-batch copies collapse to their smallest id;
  *   3. overwrite `<store>/epoch=<n>` with the survivors' digests;
  *   4. pass the surviving ROWS (original batch schema) to `accept`.
  *
  * Exactly-once on the STORE, at-least-once on `accept`: Spark replays a
  * failed micro-batch under the SAME epoch id (the documented
  * `foreachBatch` contract), and because step 1 excluded that epoch and
  * step 3 overwrites rather than appends, a replay recomputes the same
  * survivor set instead of deduping the batch against its own first
  * attempt — the store can never poison a retry. `accept` follows the
  * usual `foreachBatch` delivery semantics (make it idempotent on
  * `epoch` for end-to-end exactly-once).
  *
  * 100 TB shape: the store holds digests only (16 bytes per accepted doc
  * ever), the reference side of the dedup is scanned-not-shuffled, and a
  * mostly-duplicate batch degrades to the plain anti-join via
  * [[graft.operators.Dedup.incrementalBloomOnDigests]]'s broadcast guard
  * rather than an unbounded driver broadcast. Raise `expectedRefItems`
  * as the accepted corpus grows — past the session's runtime-filter caps
  * the sketch automatically builds as a per-executor BROADCAST
  * (full-size) instead of a clamped task-closure literal; an undersized
  * sketch costs confirm-join traffic, never correctness.
  *
  * Reference parity: the C++ service has no cross-batch dedup stage —
  * this is part of the LLM-pipeline surface (SURVEY §2.5.1) married to
  * the O-7 fan-out runtime: wrap any sink from
  * [[graft.runtime.GraftService]]'s factory and attach via
  * [[StreamRuntime.fanOutSinkWithEpoch]].
  */
object StreamDedup {

  /** One micro-batch of the recipe above, callable directly (and from
    * tests) — [[dedupSink]] is this per epoch. Returns the number of
    * surviving rows handed to `accept`.
    */
  def dedupBatch(
      batch: DataFrame,
      text: Column,
      idCol: Column,
      digestStore: String,
      epoch: Long,
      accept: (DataFrame, Long) => Unit,
      expectedRefItems: Long = 4000000L,
      fpp: Double = 0.03
  ): Long = {
    val spark = batch.sparkSession
    // the store before this epoch: partition-discovery read, pruned to
    // epoch != current so a replay never sees its own first attempt
    val fs = new org.apache.hadoop.fs.Path(digestStore)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val refFp =
      if (fs.exists(new org.apache.hadoop.fs.Path(digestStore)))
        spark.read
          .option("basePath", digestStore)
          .parquet(digestStore)
          .filter(col("epoch") =!= epoch)
          .select(col("fp"))
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            Seq(org.apache.spark.sql.types.StructField("fp", org.apache.spark.sql.types.BinaryType))
          )
        )
    val survivors = Dedup
      .incrementalBloomOnDigests(batch, text, idCol, refFp, expectedRefItems, fpp)
      .persist()
    try {
      // store first (idempotent overwrite), then delivery: a crash between
      // the two replays the epoch, re-derives the same survivors (the
      // epoch's own partition is excluded above) and re-accepts
      survivors
        .select(col("fp"))
        .write
        .mode("overwrite")
        .parquet(s"$digestStore/epoch=$epoch")
      val kept = batch.join(
        survivors.select(col("keep_id")),
        idCol === col("keep_id"),
        "left_semi"
      )
      val n = survivors.count()
      accept(kept, epoch)
      n
    } finally {
      survivors.unpersist()
      ()
    }
  }

  /** Wrap an epoch-aware sink with cross-batch exact dedup — attach via
    * `df.writeStream.foreachBatch(...)` or
    * [[StreamRuntime.fanOutSinkWithEpoch]].
    */
  def dedupSink(
      text: Column,
      idCol: Column,
      digestStore: String,
      accept: (DataFrame, Long) => Unit,
      expectedRefItems: Long = 4000000L,
      fpp: Double = 0.03
  ): (DataFrame, Long) => Unit =
    (batch, epoch) => {
      dedupBatch(batch, text, idCol, digestStore, epoch, accept, expectedRefItems, fpp)
      ()
    }
}
