package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtensionQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in [[graft.queries]]:
  *   - [[RelationalQueries]] — joins/sorts/set ops/windows/grouping sets
  *     (SURVEY.md §2.5 relational surface), q1..q32;
  *   - [[PipelineQueries]] — the reference's own operators O-5..O-17
  *     (codec, dispatch, router, relabel, throughput, fan-out), p1..p14;
  *   - [[ExtensionQueries]] — dedup / similarity / text analysis /
  *     multimodal / corpus-curation / retrieval extensions, x1..x61.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries ++ ExtensionQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (LSH-hash-based operators) get
    * the driver's weaker rows-only check and are verified against exact
    * brute-force twins in ScalaTest instead.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ PipelineQueries.oracle ++ ExtensionQueries.oracle
}
