package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming SEMANTIC ingest gate: [[graft.operators.Similarity.incrementalSemantic]]
  * as a `foreachBatch` recipe — continuous embedding ingestion where a
  * vector is accepted at most once per semantic neighborhood across the
  * stream's lifetime (near-duplicate re-ingests, re-encodes, and
  * re-crawls collapse onto the first accepted copy). The embedding-space
  * sibling of [[StreamDedup]] (exact digests) and the natural partner of
  * [[StreamCurate]] for multimodal pipelines.
  *
  * Store layout and delivery semantics are [[StreamDedup]]'s, verbatim:
  * accepted (vec_id, v) rows live under `<store>/epoch=<n>/`, each batch
  * reads the store EXCLUDING its own epoch partition (a replayed epoch
  * never sees its first attempt), writes survivors via idempotent
  * partition overwrite, THEN delivers — exactly-once on the store,
  * at-least-once on `accept`.
  *
  * 100 TB shape: per batch the accepted store is scanned (key pass +
  * confirm pass), never shuffled; the batch side broadcasts — exactly
  * [[Similarity.incrementalSemantic]]'s contract, so the per-batch cost
  * is two linear passes over the store regardless of batch size.
  *
  * Scope note: the gate is batch-vs-store only — two near-duplicates
  * arriving in the SAME micro-batch both pass (and both enter the
  * store). If within-batch collapse matters at your batch sizes, run
  * [[Similarity.semanticDedup]] over the batch before the gate.
  */
object StreamSemanticGate {

  /** One gated micro-batch, callable directly (and from tests). Returns
    * the number of accepted vectors.
    */
  def gateBatch(
      batch: DataFrame,
      idCol: Column,
      vecCol: Column,
      vectorStore: String,
      epoch: Long,
      accept: (DataFrame, Long) => Unit,
      threshold: Double = 0.95
  ): Long = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(vectorStore)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ref =
      if (fs.exists(new org.apache.hadoop.fs.Path(vectorStore)))
        spark.read
          .option("basePath", vectorStore)
          .parquet(vectorStore)
          .filter(col("epoch") =!= epoch)
          .select(col("vec_id"), col("v"))
      else
        spark
          .range(0)
          .select(
            col("id").as("vec_id"),
            array(lit(0.0)).as("v")
          )
          .filter(lit(false))
    val b = batch.select(idCol.as("vec_id"), transform(vecCol, _.cast("double")).as("v"))
    val verdicts = Similarity
      .incrementalSemantic(b, col("vec_id"), col("v"), ref, col("vec_id"), col("v"), threshold)
      .persist()
    try {
      val kept = b.join(
        verdicts.filter(col("kept")).select(col("id").as("__keep")),
        col("vec_id") === col("__keep"),
        "left_semi"
      )
      // store first (idempotent overwrite), then delivery — the StreamDedup
      // crash-replay contract
      kept.write.mode("overwrite").parquet(s"$vectorStore/epoch=$epoch")
      val n = verdicts.filter(col("kept")).count()
      accept(kept, epoch)
      n
    } finally {
      verdicts.unpersist()
      ()
    }
  }

  /** Wrap an epoch-aware sink with the semantic gate — attach via
    * `df.writeStream.foreachBatch(...)` or
    * [[StreamRuntime.fanOutSinkWithEpoch]].
    */
  def gateSink(
      idCol: Column,
      vecCol: Column,
      vectorStore: String,
      accept: (DataFrame, Long) => Unit,
      threshold: Double = 0.95
  ): (DataFrame, Long) => Unit =
    (batch, epoch) => {
      gateBatch(batch, idCol, vecCol, vectorStore, epoch, accept, threshold)
      ()
    }
}
