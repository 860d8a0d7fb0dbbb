package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming mirror of the MEDIA near-dup gates — cross-batch perceptual
  * dedup for a continuously-ingesting multimodal corpus: each micro-batch
  * hashes its media (image aHash, audio energy fingerprint, or video
  * frame hashes — any producer of the `(id, simhash)` column contract)
  * and drops items whose fingerprint sits within `maxHamming` bits of
  * anything already accepted, using the SAME Manku pigeonhole blocking
  * the batch operators use — fingerprints meet on block keys, never in
  * an all-pairs scan.
  *
  * The accepted state lives as a parquet FINGERPRINT STORE partitioned
  * by epoch (`<store>/epoch=<n>`, rows (id, simhash) — 16 bytes of state
  * per accepted item; block keys are recomputed on read, deterministic).
  * Per micro-batch:
  *
  *   1. OVERWRITE `<store>/epoch=<n>` with this batch's fingerprints;
  *   2. block-join the batch against store-before-this-epoch: any stored
  *      fingerprint within `maxHamming` kills the batch item;
  *   3. within the batch, the smaller id survives a near-dup pair (the
  *      greedy keep-set: an item pairing ONLY with already-dropped items
  *      still drops — conservative; exact cluster resolution is the
  *      batch CC operator's job, x26);
  *   4. survivors (id, simhash) go to `accept`.
  *
  * Exactly-once on the store, at-least-once on `accept` (the
  * [[StreamDedup]] contract): a replayed epoch re-reads the store
  * EXCLUDING its own partition and re-derives the same survivors.
  *
  * 100 TB shape: the store is fingerprints only (8-byte hashes + ids —
  * a billion accepted images is ~16 GB of parquet, scanned once per
  * micro-batch with only block keys + fps on the join); media bytes
  * never leave the batch's own decode pass.
  */
object StreamMediaDedup {

  /** One micro-batch of the recipe above, callable directly. `fps` is
    * the batch's `(id, simhash)` relation (from
    * [[graft.operators.Multimodal.aHash]] /
    * [[graft.operators.Multimodal.audioFingerprints]] / …). Returns the
    * survivor count handed to `accept`.
    */
  def dedupFpBatch(
      fps: DataFrame,
      fpStore: String,
      epoch: Long,
      accept: (DataFrame, Long) => Unit,
      maxHamming: Int = 2,
      blocks: Int = 4
  ): Long = {
    val spark = fps.sparkSession
    val b = fps.select(col("id"), col("simhash")).persist()
    try {
      // store first (idempotent overwrite), then the gate: a crash
      // between the two replays the epoch against the same prior state
      b.write.mode("overwrite").parquet(s"$fpStore/epoch=$epoch")
      val fs = new org.apache.hadoop.fs.Path(fpStore)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prior =
        if (fs.exists(new org.apache.hadoop.fs.Path(fpStore)))
          spark.read
            .option("basePath", fpStore)
            .parquet(fpStore)
            .filter(col("epoch") =!= epoch) // a replay never sees its own first attempt
            .select(col("id"), col("simhash"))
        else b.limit(0)
      val bb = Dedup.simhashBlocked(b, maxHamming, blocks)
      val pb = Dedup
        .simhashBlocked(prior, maxHamming, blocks)
        .select(col("bk"), col("simhash").as("__rfp"))
      val crossDup = bb
        .join(pb, Seq("bk"))
        .filter(Dedup.hamming(col("simhash"), col("__rfp")) <= maxHamming)
        .select(col("id"))
      // within-batch: the larger id of every near-dup pair drops
      val withinDup = Dedup
        .pairsFromFps(b, maxHamming, blocks)
        .select(col("id_b").as("id"))
      val survivors = b.join(crossDup.unionByName(withinDup).distinct(), Seq("id"), "left_anti")
      val out = survivors.persist()
      try {
        val n = out.count()
        accept(out, epoch)
        n
      } finally {
        out.unpersist()
        ()
      }
    } finally {
      b.unpersist()
      ()
    }
  }

  /** Wrap an epoch-aware sink with continuous media near-dup gating —
    * attach via `df.writeStream.foreachBatch(...)`. `fingerprint` maps
    * the micro-batch to its `(id, simhash)` relation (e.g.
    * `batch => Multimodal.aHash(batch.as[MediaRow])`).
    */
  def dedupFpSink(
      fingerprint: DataFrame => DataFrame,
      fpStore: String,
      accept: (DataFrame, Long) => Unit,
      maxHamming: Int = 2,
      blocks: Int = 4
  ): (DataFrame, Long) => Unit =
    (batch, epoch) => {
      dedupFpBatch(fingerprint(batch), fpStore, epoch, accept, maxHamming, blocks)
      ()
    }
}
