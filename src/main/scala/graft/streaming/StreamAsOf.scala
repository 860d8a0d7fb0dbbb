package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Streaming mirror of the as-of join — the continuous ENRICH pattern a
  * feature store runs: a stream of events joins each micro-batch, as-of,
  * against the full history of observations accumulated so far (latest
  * signup at or before each purchase, latest price at or before each
  * trade, latest model version at or before each request).
  *
  * The observation history lives as a parquet OBSERVATION STORE
  * partitioned by epoch (`<store>/epoch=<n>/part-*.parquet`, full
  * observation schema: byCol, timeCol, value columns). Per micro-batch:
  *
  *   1. split the batch into its observation rows and its event rows
  *      (caller-provided frames — often two streams, or one stream
  *      filtered two ways, exactly like q19's purchase/signup split);
  *   2. OVERWRITE `<store>/epoch=<n>` with this epoch's observations;
  *   3. as-of join the events against store-before-this-epoch ∪ this
  *      batch's own observations (same-batch visibility — an event sees
  *      an observation that arrived in its own micro-batch, matching the
  *      batch operator's semantics) through the NATIVE merge
  *      ([[graft.operators.AsOfJoin.asofBackwardNative]]) or the
  *      monster-key chunked path;
  *   4. hand the enriched rows to `accept`.
  *
  * Exactly-once on the STORE, at-least-once on `accept` (the
  * [[StreamDedup]] contract): a replayed epoch re-reads the store
  * EXCLUDING its own partition and re-derives the same enriched output —
  * step 2's overwrite can never make a retry join against its own first
  * attempt twice.
  *
  * 100 TB shape: the store holds OBSERVATIONS only (the dimension
  * history, not the event stream); it is scanned once per micro-batch
  * and shuffled only on the as-of key — the same exchange bill the batch
  * operator pays — and late/out-of-order observations are handled by
  * construction (the as-of sort is by event time, not arrival epoch).
  * One monster key is the [[AsOfJoin.asofBackwardChunked]] regime; pass
  * `chunked = true` when the key distribution warrants it.
  *
  * Reference parity: the C++ service has no temporal-join stage — this
  * is LLM-pipeline/feature-store surface (SURVEY §2.5) married to the
  * epoch-store discipline of the other streaming mirrors.
  */
object StreamAsOf {

  /** One micro-batch of the recipe above, callable directly (and from
    * tests). Returns the number of enriched event rows handed to
    * `accept`.
    */
  def enrichBatch(
      events: DataFrame,
      observations: DataFrame,
      byCol: String,
      timeCol: String,
      obsStore: String,
      epoch: Long,
      accept: (DataFrame, Long) => Unit,
      chunked: Boolean = false
  ): Long = {
    val spark = events.sparkSession
    val obsCols = observations.columns.toSeq
    require(
      obsCols.contains(byCol) && obsCols.contains(timeCol),
      s"observations must carry '$byCol' and '$timeCol'"
    )
    // store first (idempotent overwrite), then the join: a crash between
    // the two replays the epoch against the same pre-epoch history
    observations
      .write
      .mode("overwrite")
      .parquet(s"$obsStore/epoch=$epoch")
    val fs = new org.apache.hadoop.fs.Path(obsStore)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior =
      if (fs.exists(new org.apache.hadoop.fs.Path(obsStore)))
        spark.read
          .option("basePath", obsStore)
          .parquet(obsStore)
          .filter(col("epoch") =!= epoch) // a replay never sees its own first attempt
          .select(obsCols.map(col): _*)
      else observations.limit(0)
    val allObs = prior.unionByName(observations)
    val enriched =
      if (chunked) AsOfJoin.asofBackwardChunked(events, allObs, byCol, timeCol)
      else AsOfJoin.asofBackwardNative(events, allObs, byCol, timeCol)
    val out = enriched.persist()
    try {
      val n = out.count()
      accept(out, epoch)
      n
    } finally {
      out.unpersist()
      ()
    }
  }

  /** Wrap an epoch-aware sink with continuous as-of enrichment — attach
    * via `df.writeStream.foreachBatch(...)` or
    * [[StreamRuntime.fanOutSinkWithEpoch]]. `splitObs`/`splitEvents`
    * carve the micro-batch into its two roles (the q19 shape:
    * `_.filter($"event_type" === "signup")` / `"purchase"`).
    */
  def enrichSink(
      splitEvents: DataFrame => DataFrame,
      splitObs: DataFrame => DataFrame,
      byCol: String,
      timeCol: String,
      obsStore: String,
      accept: (DataFrame, Long) => Unit,
      chunked: Boolean = false
  ): (DataFrame, Long) => Unit =
    (batch, epoch) => {
      enrichBatch(
        splitEvents(batch),
        splitObs(batch),
        byCol,
        timeCol,
        obsStore,
        epoch,
        accept,
        chunked
      )
      ()
    }
}
