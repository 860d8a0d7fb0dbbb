package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The OUTPUT side of the curation pipeline: write a finished corpus as
  * shard-partitioned parquet with a row-count manifest, and verify a
  * written dataset against its manifest before a training run trusts it.
  *
  * Layout contract (what a 1000-executor training job wants to read):
  *   - directory-partitioned by `shard` (`shard=N/` subdirs), so a reader
  *     that wants shards [a, b) prunes at the FILE LISTING level — the
  *     scan's PartitionFilters, not a post-read filter;
  *   - rows within a shard are written sorted by `pos` (one file per
  *     shard via repartition(shard) + sortWithinPartitions), so a reader
  *     replays [[graft.operators.CorpusOps.assignShards]]' global
  *     training order with a per-file sort-merge, never a global sort;
  *   - `_manifest/` holds (shard, n_rows) as parquet, written AFTER the
  *     data — a missing/short manifest means an interrupted write, which
  *     is exactly what [[verifyShards]] detects (the JSONL-ingest
  *     accounting discipline applied to the write path).
  *
  * At 100 TB, one file per shard is the knob the caller controls via
  * shard sizing upstream (assignShards' shardSize): ~1 GB shards make
  * both the write tasks and the training-reader splits well-shaped.
  */
object CuratedSink {

  /** Write `df` (must carry `shard` and `pos` columns, the
    * [[graft.operators.CorpusOps.assignShards]] output) under `path`,
    * then write the manifest. Returns the manifest as a DataFrame.
    */
  def writeShards(df: DataFrame, path: String): DataFrame = {
    val spark = df.sparkSession
    require(
      Seq("shard", "pos").forall(df.columns.contains),
      s"writeShards needs shard/pos columns, got ${df.columns.mkString(",")}"
    )
    df.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
    val manifest = spark.read
      .parquet(path)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"))
    manifest.write.mode(SaveMode.Overwrite).parquet(s"$path/_manifest")
    spark.read.parquet(s"$path/_manifest")
  }

  /** Re-read a written dataset and diff it against its manifest: per
    * shard, rows present vs rows promised, plus a dense-positions check
    * (`max_pos - min_pos + 1 == n_rows` — a dropped file inside a shard
    * surfaces even when the manifest itself is intact). Returns rows only
    * for BROKEN shards; an empty result is a verified dataset.
    */
  def verifyShards(spark: SparkSession, path: String): DataFrame = {
    val manifest = spark.read.parquet(s"$path/_manifest")
    val actual = spark.read
      .parquet(path)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("got_rows"), min(col("pos")).as("got_min"), max(col("pos")).as("got_max"))
    manifest
      .join(actual, Seq("shard"), "full_outer")
      .filter(
        col("n_rows").isNull || col("got_rows").isNull ||
          col("n_rows") =!= col("got_rows") ||
          col("got_max") - col("got_min") + 1 =!= col("got_rows")
      )
  }
}
