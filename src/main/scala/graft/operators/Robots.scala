package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt fetch-permission gate — the crawl-compliance filter of a
  * web-corpus pipeline: before a URL's content may enter the corpus, the
  * origin's robots policy must allow fetching it. Implements the
  * longest-match subset of the Robots Exclusion Protocol (RFC 9309):
  * groups of `User-agent` lines followed by `Allow`/`Disallow` rules;
  * if any group names the caller's agent, ONLY those groups apply,
  * otherwise the `*` groups; the longest matching rule prefix decides,
  * `Allow` winning length ties; no matching rule (or no robots at all)
  * means allowed. Documented simplifications: agent match is exact
  * case-insensitive (not product-token substring), rule paths are
  * literal prefixes (no `*`/`$` wildcards), and empty-valued rules are
  * the no-op the RFC says they are.
  *
  * 100 TB shape: robots.txt is MODEL-side data — one small blob per
  * domain, parsed with per-domain windows over a few dozen lines (the
  * window partition is a single robots file, never corpus-scale), and
  * the resulting rule table broadcasts to the URL corpus; the only
  * corpus-scale work is one broadcast join + a per-URL partial-agg
  * argmax on (prefix_len, is_allow). A domain with a pathological
  * rule count inflates the broadcast, not a shuffle partition.
  */
object Robots {

  /** Parse robots blobs into grouped directives:
    * `(domain, gid, field, value)` with `field ∈ {user-agent, allow,
    * disallow}`, comments/blank/unknown lines dropped, CRLF tolerated,
    * field names case-insensitive. `gid` increments at each User-agent
    * line that starts a new group (a run of consecutive User-agent
    * lines shares its group, per the RFC).
    */
  def parseRules(robots: DataFrame, domainCol: Column, txtCol: Column): DataFrame = {
    val lines = robots
      .select(domainCol.as("domain"), posexplode(split(txtCol, "\r?\n")).as(Seq("ln", "raw")))
      .select(col("domain"), col("ln"), trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .where(col("line") =!= "")
      .select(
        col("domain"),
        col("ln"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))).as("field"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value")
      )
      .where(col("field").isin("user-agent", "allow", "disallow", "crawl-delay"))
    val w = Window.partitionBy(col("domain")).orderBy(col("ln"))
    lines
      .withColumn("__prev", lag(col("field"), 1).over(w))
      .withColumn(
        "__new",
        (col("field") === "user-agent" &&
          (col("__prev").isNull || col("__prev") =!= "user-agent")).cast("int")
      )
      .withColumn("gid", sum(col("__new")).over(w))
      .select(col("domain"), col("gid"), col("field"), col("value"))
  }

  /** The group-selection rule shared by [[fetchGate]] and
    * [[crawlDelays]]: groups naming `agent` apply exclusively; otherwise
    * the `*` groups.
    */
  private def selectedGroups(parsed: DataFrame, agent: String): DataFrame = {
    val groups = parsed
      .where(col("field") === "user-agent")
      .groupBy(col("domain"), col("gid"))
      .agg(
        // Locale.ROOT: Spark's lower() is locale-independent; a default-
        // locale toLowerCase would diverge on e.g. tr-TR dotless-i JVMs
        max((lower(col("value")) === agent.toLowerCase(java.util.Locale.ROOT)).cast("int"))
          .as("has_agent"),
        max((col("value") === "*").cast("int")).as("has_star")
      )
    val domainMode = groups.groupBy(col("domain")).agg(max(col("has_agent")).as("any_agent"))
    groups
      .join(domainMode, "domain")
      .where(
        (col("any_agent") === 1 && col("has_agent") === 1) ||
          (col("any_agent") === 0 && col("has_star") === 1)
      )
      .select(col("domain"), col("gid"))
  }

  /** Per-domain Crawl-delay for `agent` (seconds): the MAX delay across
    * the applicable groups (conservative), null when none is declared or
    * the value isn't a number. Model-side output — one row per domain.
    */
  def crawlDelays(
      robots: DataFrame,
      robotsDomainCol: Column,
      txtCol: Column,
      agent: String
  ): DataFrame = {
    val parsed = parseRules(robots, robotsDomainCol, txtCol)
    parsed
      .where(col("field") === "crawl-delay")
      .join(selectedGroups(parsed, agent), Seq("domain", "gid"))
      .groupBy(col("domain"))
      .agg(max(try_cast_long(col("value"))).as("crawl_delay"))
  }

  private def try_cast_long(c: Column): Column =
    when(c.rlike("^[0-9]+$"), c.cast("long"))

  /** Politeness schedule: per domain, the k-th URL (in url-id order)
    * fetches at slot `(k-1) · delay` seconds, `defaultDelay` where the
    * domain declares none. The per-domain window IS the semantic unit —
    * politeness serializes a domain by definition, so the partition skew
    * ceiling is the largest single domain's URL count (the same bound
    * any real frontier scheduler has).
    */
  def politenessSchedule(
      urls: DataFrame,
      urlIdCol: Column,
      urlDomainCol: Column,
      robots: DataFrame,
      robotsDomainCol: Column,
      txtCol: Column,
      agent: String,
      defaultDelay: Long = 1L
  ): DataFrame = {
    val delays = crawlDelays(robots, robotsDomainCol, txtCol, agent)
    urls
      .select(urlIdCol.as("url_id"), urlDomainCol.as("domain"))
      .join(broadcast(delays), Seq("domain"), "left")
      .select(
        col("url_id"),
        col("domain"),
        coalesce(col("crawl_delay"), lit(defaultDelay)).as("crawl_delay")
      )
      .withColumn(
        "slot_s",
        (row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("domain"))
            .orderBy(col("url_id"))
        ) - 1).cast("long") * col("crawl_delay")
      )
  }

  /** Per-domain crawl-budget allocation by the largest-remainder method
    * (Hamilton apportionment): given a global fetch budget, each domain
    * gets ⌊budget·n/total⌋ plus one top-up for the largest remainders —
    * ALL integer arithmetic (`div`/`mod`, ties broken by domain), so the
    * allocation is engine-exact and Σ alloc == budget is an identity,
    * not an approximation. The frontier-policy companion of
    * [[politenessSchedule]]: schedule orders WITHIN a domain, this
    * divides the budget ACROSS domains. Model-side throughout: one
    * count aggregate per domain, a 1-row total broadcast, and a
    * remainder-rank window over the domain table (domains, not URLs).
    */
  def crawlBudget(
      urls: DataFrame,
      urlDomainCol: Column,
      budget: Long
  ): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val counts = urls.groupBy(urlDomainCol.as("domain")).agg(count(lit(1)).as("n_urls"))
    val tot = counts.agg(sum(col("n_urls")).as("__t"))
    val based = counts
      .crossJoin(broadcast(tot))
      .select(
        col("domain"),
        col("n_urls"),
        expr(s"($budget * n_urls) div __t").as("__base"),
        expr(s"($budget * n_urls) % __t").as("__rem")
      )
    val leftover = based.agg((lit(budget) - sum(col("__base"))).as("__left"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("domain").asc)
    based
      .withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(leftover))
      .select(
        col("domain"),
        col("n_urls"),
        (col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L)).as("alloc")
      )
  }

  /** Per-URL fetch decision for `agent`:
    * `(url_id, domain, path, matched_len, allowed)` — `matched_len` is
    * the winning rule's prefix length (0 when no rule matched).
    */
  def fetchGate(
      urls: DataFrame,
      urlIdCol: Column,
      urlDomainCol: Column,
      pathCol: Column,
      robots: DataFrame,
      robotsDomainCol: Column,
      txtCol: Column,
      agent: String
  ): DataFrame = {
    val parsed = parseRules(robots, robotsDomainCol, txtCol)
    val selected = selectedGroups(parsed, agent)
    val rules = parsed
      .where(col("field").isin("allow", "disallow") && col("value") =!= "")
      .join(selected, Seq("domain", "gid"))
      .select(
        col("domain"),
        (col("field") === "allow").cast("int").as("__a"),
        col("value").as("__prefix"),
        length(col("value")).as("__plen")
      )

    val u = urls.select(urlIdCol.as("url_id"), urlDomainCol.as("domain"), pathCol.as("path"))
    val best = u
      .join(broadcast(rules), Seq("domain"))
      .where(col("path").startsWith(col("__prefix")))
      .groupBy(col("url_id"))
      .agg(max(struct(col("__plen"), col("__a"))).as("__b"))
      .select(
        col("url_id"),
        col("__b.__plen").as("__mlen"),
        (col("__b.__a") === 1).as("__allow")
      )
    u.join(best, Seq("url_id"), "left")
      .select(
        col("url_id"),
        col("domain"),
        col("path"),
        coalesce(col("__mlen"), lit(0)).cast("int").as("matched_len"),
        coalesce(col("__allow"), lit(true)).as("allowed")
      )
  }
}
