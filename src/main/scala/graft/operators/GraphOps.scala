package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph construction and PageRank — the crawl-graph quality prior of
  * a web-scale curation pipeline. Production corpus filters (Common-Crawl
  * derived sets, quality-weighted sampling) use link-graph centrality as a
  * document-quality signal alongside the content gates ([[TextOps]],
  * [[CorpusOps]]); the reference has no graph surface, so this is part of
  * the beyond-reference LLM-pipeline layer (builder prompt), the directed
  * sibling of [[ConnectedComponents]].
  *
  * 100 TB design notes:
  *   - [[htmlLinks]] is a pure projection (one RE2-safe regex scan +
  *     explode) — zero shuffle; the host filter and id parse compose on
  *     top without leaving whole-stage codegen.
  *   - [[pageRank]] keeps per-iteration state as (id, pr) rows — 16 bytes
  *     a row, hash-partitioned on id. Each iteration is ONE equi-join of
  *     ranks against the (src-keyed) edge list and ONE partial-aggregating
  *     exchange on dst; a mega-hub page costs a combiner pass, not a
  *     reducer hot spot, because `groupBy(dst).sum` combines map-side.
  *   - dangling mass (pages with no outlinks) is a 1-row aggregate
  *     broadcast back into the update — never a driver-side loop over
  *     nodes; the only driver scalar is the node count (model state, same
  *     contract as [[ConnectedComponents]]'s per-round convergence scalar).
  *   - every iteration is eagerly `localCheckpoint`ed, truncating lineage
  *     so plan size and retry cost stay O(1) per round; on a real cluster
  *     swap in reliable `checkpoint` for executor-loss tolerance.
  */
object GraphOps {

  /** Extract anchor hrefs from an HTML column: one output row per href
    * occurrence, `(src, href)`. The pattern is RE2-safe (no backtracking
    * constructs), so a DuckDB oracle can replay it verbatim; it matches
    * double-quoted href attributes in `<a>` tags case-insensitively —
    * the layout contract of the synthetic corpus and of normalized crawl
    * HTML (see `warcIngest` for raw-archive framing upstream of this).
    */
  def htmlLinks(df: DataFrame, idCol: Column, htmlCol: Column): DataFrame =
    df.select(
        idCol.as("src"),
        explode(
          regexp_extract_all(htmlCol, lit("(?i)<a[^>]*href=\"([^\"]*)\""), lit(1))
        ).as("href")
      )

  /** Extract anchor ELEMENTS with their link text: one row per
    * `<a href="…">text</a>` occurrence, `(src, href, anchor)` with the
    * anchor text trimmed. Anchor text is the classic relevance/quality
    * signal for the link TARGET (what the web calls a page is often
    * better evidence than the page's own boilerplate) — aggregate it
    * per dst for target-side features. Same RE2-safe contract as
    * [[htmlLinks]]; anchors with markup inside the text (nested tags)
    * are out of the fixed-layout contract and simply don't match.
    */
  def anchors(df: DataFrame, idCol: Column, htmlCol: Column): DataFrame =
    df.select(
        idCol.as("src"),
        explode(
          regexp_extract_all(
            htmlCol,
            lit("(?i)<a[^>]*href=\"[^\"]*\"[^>]*>[^<]*</a>"),
            lit(0)
          )
        ).as("elem")
      )
      .select(
        col("src"),
        regexp_extract(col("elem"), "(?i)href=\"([^\"]*)\"", 1).as("href"),
        trim(regexp_extract(col("elem"), ">([^<]*)<", 1)).as("anchor")
      )

  /** PageRank over a directed edge list `(src, dst)`, `iters` synchronous
    * iterations at damping `d`: pr' = (1−d)/n + d·(Σ_in pr/out_deg + dm/n)
    * where dm is the total rank mass of dangling nodes (no outlinks),
    * redistributed uniformly — the standard formulation, mass-conserving
    * (Σ pr = 1 after every iteration, asserted in the spec and the 5M
    * stress).
    *
    * Contract: parallel edges and self-loops are deduplicated/kept as
    * given — the input is `distinct()`ed here so a page linking the same
    * target twice endorses it once (the crawl-graph convention); the node
    * set is the union of edge endpoints. Returns `(id, pr)` with pr
    * UNROUNDED — callers that need engine-portable output round at the
    * edge (the oracle query rounds to 9 dp).
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      checkpoint: Boolean = true
  ): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e
      .select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
    val cachedNodes = nodes.localCheckpoint(true)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("out_deg"))
    val cachedEdges = e
      .join(outDeg, "src")
      .localCheckpoint(true) // (src, dst, out_deg): the loop-invariant side
    // the ONE driver scalar: |V| — model state, like CC's convergence scalar
    val n = cachedNodes.count()
    val teleport = (1.0 - damping) / n

    var ranks = cachedNodes.select(col("id"), lit(1.0 / n).as("pr"))
    var i = 0
    while (i < iters) {
      val contribs = cachedEdges
        .join(ranks, cachedEdges("src") === ranks("id"))
        .select(col("dst"), (col("pr") / col("out_deg")).as("w"))
      val sums = contribs.groupBy(col("dst")).agg(sum(col("w")).as("s"))
      // dangling mass: rank held by nodes with no outlinks (1-row aggregate)
      val dangling = ranks
        .join(cachedEdges.select(col("src")).distinct(), ranks("id") === col("src"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      val next = cachedNodes
        .join(sums, cachedNodes("id") === sums("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(
          col("id"),
          (lit(teleport) + lit(damping) * (coalesce(col("s"), lit(0.0)) + col("dm") / lit(n.toDouble)))
            .as("pr")
        )
      ranks = if (checkpoint) next.localCheckpoint(true) else next
      i += 1
    }
    ranks
  }
}
