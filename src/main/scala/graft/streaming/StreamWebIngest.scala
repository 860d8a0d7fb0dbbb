package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Robots}

/** Streaming web ingestion — the crawl-side capstone recipe, the
  * streaming mirror of the batch x112 composite: raw CSV lines flow in
  * per micro-batch, and each batch is
  *
  *   1. parsed by [[CorpusOps.csvIngest]] — corrupt lines are COUNTED
  *      and dropped, never poisoning the batch (the jsonl/warc
  *      discipline);
  *   2. gated by [[Robots.fetchGate]] against a model-side robots table
  *      (broadcast rules; disallowed URLs are counted and dropped —
  *      crawl compliance applies to CONTINUOUS ingestion, not just the
  *      batch pipeline);
  *   3. cross-batch exact-deduplicated by [[StreamDedup.dedupBatch]]
  *      (epoch-partitioned digest store; replay-idempotent).
  *
  * Every drop class is returned, not swallowed: (accepted, corrupt,
  * blocked). Delivery semantics are [[StreamDedup]]'s: exactly-once on
  * the digest store, at-least-once on `accept`; steps 1–2 are
  * deterministic projections/broadcast-joins, so an epoch replay
  * re-derives identical survivors.
  */
object StreamWebIngest {

  def ingestBatch(
      batch: DataFrame,
      lineIdCol: Column,
      lineCol: Column,
      domainCol: Column,
      pathCol: Column,
      robots: DataFrame,
      robotsDomainCol: Column,
      robotsTxtCol: Column,
      agent: String,
      digestStore: String,
      epoch: Long,
      accept: (DataFrame, Long) => Unit
  ): (Long, Long, Long) = {
    val parsed = CorpusOps.csvIngest(batch, lineIdCol, lineCol)
    val corrupt = parsed.filter(col("is_corrupt")).count()
    val good = parsed.filter(!col("is_corrupt") && col("doc_id").isNotNull)
    val withUrl = good.select(col("doc_id"), col("text"), col("lang"), domainCol.as("__dom"), pathCol.as("__path"))
    val allowed = Robots
      .fetchGate(
        withUrl, col("doc_id"), col("__dom"), col("__path"),
        robots, robotsDomainCol, robotsTxtCol, agent
      )
      .filter(col("allowed"))
      .select(col("url_id").as("__ok"))
    val fetchable = withUrl.join(allowed, withUrl("doc_id") === col("__ok"), "left_semi")
    val blocked = withUrl.count() - fetchable.count()
    val accepted = StreamDedup.dedupBatch(
      fetchable.select(col("doc_id"), col("text"), col("lang")),
      col("text"),
      col("doc_id"),
      digestStore,
      epoch,
      accept
    )
    (accepted, corrupt, blocked)
  }
}
