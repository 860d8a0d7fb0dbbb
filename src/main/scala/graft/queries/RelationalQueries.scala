package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** The relational surface (SURVEY.md §2.5): the reference has no joins /
  * sorts / set ops / window functions, so the engine exposes Spark's
  * built-ins as first-class, oracle-checked capabilities. Every query here
  * has an exact DuckDB twin in [[oracle]].
  *
  * Numeric discipline for cross-engine hash equality: monetary aggregates
  * run in DECIMAL (exact, order-independent) but every FINAL output column
  * is cast to DOUBLE — the exact decimal value converts to the same IEEE
  * double in both engines (unscaled < 2^53 at bench scale), while a decimal
  * OUTPUT can never hash-match the driver (Spark parquet decodes to Decimal
  * objects, DuckDB's pandas bridge to float64). Raw doubles are only ever
  * passed through or compared, never re-aggregated.
  */
object RelationalQueries {

  /** Run SQL against `df` through a UNIQUE, immediately-dropped temp view:
    * a fixed view name would mutate shared session state, so two builders
    * racing on one session could silently bind to each other's data. The
    * analyzed plan holds the resolved relation, so dropping the view right
    * after `s.sql` is safe.
    */
  private val viewIds = new java.util.concurrent.atomic.AtomicLong(0L)
  private def sqlOn(s: SparkSession, df: DataFrame)(sql: String => String): DataFrame = {
    val view = s"graft_q_${viewIds.getAndIncrement()}"
    df.createOrReplaceTempView(view)
    try s.sql(sql(view))
    finally { s.catalog.dropTempView(view); () }
  }

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  // Scale-preserving result type for sums of (18,2)x(19,2) products: never
  // narrow the scale after aggregation — a final round would tie-break
  // differently across engines (Spark HALF_UP vs DuckDB HALF_EVEN).
  private def dec4(c: org.apache.spark.sql.Column) = c.cast("decimal(38,4)")

  // Final-output cast: exact decimal -> double (see class doc).
  private def dbl(c: org.apache.spark.sql.Column) = c.cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 flavor: full-scan aggregate, the bulk-throughput headliner.
    "q1_pricing_summary" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          dbl(dec4(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))).as("sum_disc_price"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Broadcast-join chain over the dimension tables (region/nation are
    // tiny -> broadcast; the fact side never shuffles for the join).
    "q2_revenue_by_nation" -> ((s, dir) => {
      val customer = T(s, dir, "customer")
      val nation = T(s, dir, "nation")
      val region = T(s, dir, "region")
      val orders = T(s, dir, "orders")
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dbl(sum(dec(col("o_totalprice")))).as("revenue"),
          count(lit(1)).as("n_orders")
        )
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Join + aggregate + global top-k (order/limit).
    "q3_top_orders" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val orders = T(s, dir, "orders")
      li.groupBy(col("l_orderkey"))
        .agg(dbl(dec4(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))).as("revenue"))
        .join(orders, col("l_orderkey") === orders("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Semi join (EXISTS).
    "q4_semi_join" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
      val big = T(s, dir, "lineitem").filter(col("l_quantity") > 45)
      orders
        .join(big, orders("o_orderkey") === big("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // Anti join (NOT EXISTS).
    "q5_anti_join" -> ((s, dir) => {
      val customer = T(s, dir, "customer")
      val orders = T(s, dir, "orders")
      customer
        .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Left outer join preserving empty groups.
    "q6_outer_join" -> ((s, dir) => {
      val customer = T(s, dir, "customer")
      val orders = T(s, dir, "orders")
      customer
        .join(orders, customer("c_custkey") === orders("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          dbl(coalesce(sum(dec(col("o_totalprice"))), lit(0))).as("total_spent")
        )
        .orderBy(col("c_custkey"))
    }),

    // Window: per-group top-k via row_number.
    "q7_window_topk" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      T(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    // Window: running frame aggregate + lag/lead. Partition/order keys are
    // (o_custkey, o_orderkey) — o_orderkey is UNIQUE, so the frame order is
    // total and the running sum engine-deterministic.
    "q8_running_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "orders")
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          dbl(sum(dec(col("o_totalprice"))).over(run)).as("run_spent"),
          dbl(lag(dec(col("o_totalprice")), 1).over(w)).as("prev_price"),
          dbl(lead(dec(col("o_totalprice")), 1).over(w)).as("next_price"),
          rank().over(w).as("rnk")
        )
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Set operations: union / intersect / except.
    "q9_set_ops" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = T(s, dir, "supplier").select(col("s_nationkey").as("k"))
      val u = c.union(sup).distinct().withColumn("tag", lit("union"))
      val i = c.intersect(sup).withColumn("tag", lit("intersect"))
      val e = c.except(sup).withColumn("tag", lit("except"))
      u.unionAll(i).unionAll(e).select(col("tag"), col("k")).orderBy(col("tag"), col("k"))
    }),

    // Distinct projection.
    "q10_distinct" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Rollup with subtotal rows.
    "q11_rollup" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("l_quantity")))).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // Cube.
    "q12_cube" -> ((s, dir) => {
      T(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // Grouping sets via SQL surface (also proves spark.sql entry).
    "q13_grouping_sets" -> ((s, dir) => {
      sqlOn(s, T(s, dir, "orders")) { view =>
        s"""SELECT o_orderstatus, o_orderpriority, count(1) AS n
           |FROM $view
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, n
           |""".stripMargin
      }
    }),

    // Scalar function gallery: string ops.
    "q14_string_funcs" -> ((s, dir) => {
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          (col("p_size") * 2 + 1).as("size2"),
          dbl(round(dec(col("p_retailprice")) * 110 / 100, 2)).as("price_with_tax")
        )
        .orderBy(col("p_partkey"))
    }),

    // Scalar function gallery: date/time ops.
    "q15_date_funcs" -> ((s, dir) => {
      T(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(to_date(col("o_orderdate")), to_date(lit("2024-01-01"))).as("days_since")
        )
        .orderBy(col("o_orderkey"))
    }),

    // CASE bucketing + conditional aggregation.
    "q16_case_buckets" -> ((s, dir) => {
      T(s, dir, "orders")
        .withColumn(
          "bucket",
          when(col("o_totalprice") < 1000, "small")
            .when(col("o_totalprice") < 10000, "medium")
            .otherwise("large")
        )
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_filled")
        )
        .orderBy(col("bucket"))
    }),

    // HAVING over grouped aggregates.
    "q17_having" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dbl(sum(dec(col("o_totalprice")))).as("spent"))
        .filter(col("n_orders") >= 3)
        .orderBy(col("o_custkey"))
    }),

    // Scalar subquery threshold (max/2 is exact in IEEE, engine-portable).
    "q18_scalar_subquery" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
      val threshold = orders.agg((max(col("o_totalprice")) / 2).as("t"))
      orders
        .join(broadcast(threshold))
        .filter(col("o_totalprice") > col("t"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // As-of join (backward): latest signup at or before each purchase.
    "q19_asof_join" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val signups = ev
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_event"))
      AsOfJoin // native physical merge operator (AsOfJoinExec); the
        // union+window composition is its spec-pinned semantics twin
        .asofBackwardNative(purchases, signups, "user_id", "ts")
        .filter(col("signup_event").isNotNull) // inner as-of, DuckDB's default
        .select(col("event_id"), col("user_id"), col("signup_event"))
        .orderBy(col("event_id"))
    }),

    // Session windows (batch mode session_window; 1-hour gap). The oracle
    // reconstructs sessionization with lag + cumulative sum — same
    // semantics, classic SQL formulation.
    "q21_session_window" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          unix_millis(col("sw.start")).as("session_start_ms"),
          col("n_events")
        )
        .orderBy(col("user_id"), col("session_start_ms"))
    }),

    // Exact distinct counting (the approx/HLL twin is q23, rows-only).
    "q22_count_distinct" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")
        )
        .orderBy(col("l_returnflag"))
    }),

    // Approx distinct via HLL++, driver-checkable: the sketch value is
    // engine-specific, so emit the EXACT count (DuckDB-replayable) plus a
    // deterministic within-tolerance boolean the oracle asserts as TRUE
    // (rsd 0.02 -> 5% tolerance has wide margin).
    "q23_approx_distinct" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx")
        )
        .select(
          col("l_returnflag"),
          col("n_parts"),
          (abs(col("approx") - col("n_parts")).cast("double") / col("n_parts") < 0.05).as("approx_ok")
        )
        .orderBy(col("l_returnflag"))
    }),

    // Exact interpolated percentiles (median & quartiles) per group.
    "q24_percentiles" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          percentile(col("o_totalprice"), lit(0.25)).as("p25"),
          percentile(col("o_totalprice"), lit(0.5)).as("p50"),
          percentile(col("o_totalprice"), lit(0.75)).as("p75")
        )
        .orderBy(col("o_orderstatus"))
    }),

    // Correlated scalar subquery: orders above their customer's own
    // average (exact decimal avg both sides: sum/count in decimal).
    "q26_correlated_subquery" -> ((s, dir) => {
      sqlOn(s, T(s, dir, "orders")) { view =>
        s"""SELECT o_orderkey, o_custkey, o_totalprice FROM $view o
           |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (
           |    SELECT COUNT(1) FROM $view i WHERE i.o_custkey = o.o_custkey
           |  ) > (
           |    SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           |    FROM $view i WHERE i.o_custkey = o.o_custkey
           |  )
           |ORDER BY o_orderkey""".stripMargin
      }
    }),

    // Pivot: event_type counts to columns per user.
    "q25_pivot" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    }),

    // Rank-family window variants: ntile / percent_rank / cume_dist /
    // dense_rank (exact rational outputs -> bit-stable doubles).
    "q27_rank_variants" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"), col("o_orderkey"))
      T(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_orderstatus"),
          ntile(4).over(w).as("quartile"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist")
        )
        .orderBy(col("o_orderkey"))
    }),

    // Bag semantics: EXCEPT ALL / INTERSECT ALL (multiplicity-preserving).
    "q28_set_ops_all" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = T(s, dir, "supplier").select(col("s_nationkey").as("k"))
      val e = c.exceptAll(sup).groupBy(col("k")).agg(count(lit(1)).as("n")).withColumn("tag", lit("except_all"))
      val i = c.intersectAll(sup).groupBy(col("k")).agg(count(lit(1)).as("n")).withColumn("tag", lit("intersect_all"))
      e.unionAll(i).select(col("tag"), col("k"), col("n")).orderBy(col("tag"), col("k"))
    }),

    // Scalar gallery 2: translate / reverse / repeat / lpad / split_part /
    // position — the rest of the portable string surface.
    "q29_string_funcs2" -> ((s, dir) => {
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          translate(col("p_brand"), "#", "-").as("brand_t"),
          reverse(col("p_name")).as("rname"),
          repeat(col("p_brand"), 2).as("brand2"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          instr(col("p_name"), "a").as("a_pos")
        )
        .orderBy(col("p_partkey"))
    }),

    // Date gallery 2: quarter / last_day / add_months / ISO weekday.
    "q30_date_funcs2" -> ((s, dir) => {
      T(s, dir, "orders")
        .select(
          col("o_orderkey"),
          quarter(col("o_orderdate")).as("q"),
          last_day(col("o_orderdate")).as("month_end"),
          add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
          (weekday(col("o_orderdate")) + 1).as("isodow")
        )
        .orderBy(col("o_orderkey"))
    }),

    // Explode / UNNEST: token-level rows from a string column, re-aggregated.
    "q31_unnest_tokens" -> ((s, dir) => {
      T(s, dir, "part")
        .select(col("p_partkey"), explode(split(col("p_type"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"), min(col("p_partkey")).as("min_key"))
        .orderBy(col("tok"))
    }),

    // GROUPING() disambiguation of rollup subtotal rows (a real NULL vs a
    // rolled-up NULL are distinguishable only via the grouping flags).
    "q32_grouping_flags" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          count(lit(1)).as("n")
        )
        .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"), col("g_status"), col("n"))
        .orderBy(
          col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // Range join via bucketized equi-join (interval containment).
    "q20_range_join" -> ((s, dir) => {
      val bands = T(s, dir, "nation")
        .select(
          col("n_nationkey"),
          (col("n_nationkey") * 400).cast("double").as("lo"),
          (col("n_nationkey") * 400 + 800).cast("double").as("hi")
        )
      val customer = T(s, dir, "customer")
      AsOfJoin
        .rangeJoin(bands, customer.select(col("c_custkey"), col("c_acctbal")), "lo", "hi", "c_acctbal", 400L)
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n_in_band"))
        .orderBy(col("n_nationkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        |  COUNT(1) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderpriority, revenue FROM (
        |  SELECT l_orderkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY 1) r
        |JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderpriority, COUNT(1) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q6_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_window_topk" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,
    "q8_running_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spent,
        |  CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE) AS prev_price,
        |  CAST(LEAD(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE) AS next_price,
        |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rnk
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q9_set_ops" ->
      """WITH c AS (SELECT c_nationkey AS k FROM customer),
        |     s AS (SELECT s_nationkey AS k FROM supplier)
        |SELECT 'union' AS tag, k FROM (SELECT DISTINCT k FROM (SELECT k FROM c UNION ALL SELECT k FROM s))
        |UNION ALL
        |SELECT 'intersect' AS tag, k FROM (SELECT k FROM c INTERSECT SELECT k FROM s)
        |UNION ALL
        |SELECT 'except' AS tag, k FROM (SELECT k FROM c EXCEPT SELECT k FROM s)
        |ORDER BY tag, k""".stripMargin,
    "q10_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1, 2""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(1) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q12_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q13_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, n""".stripMargin,
    "q14_string_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTRING(p_name, 1, 5) AS prefix,
        |  LENGTH(p_name) AS name_len,
        |  CONCAT_WS('/', p_brand, p_type) AS brand_type,
        |  p_size * 2 + 1 AS size2,
        |  CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * 110 / 100, 2) AS DOUBLE) AS price_with_tax
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q15_date_funcs" ->
      """SELECT o_orderkey,
        |  YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, DAYOFMONTH(o_orderdate) AS d,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        |  DATEDIFF('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q16_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
        |            WHEN o_totalprice < 10000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  COUNT(1) AS n,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_having" ->
      """SELECT o_custkey, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        |FROM orders GROUP BY 1 HAVING COUNT(1) >= 3 ORDER BY 1""".stripMargin,
    "q18_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT MAX(o_totalprice) / 2 FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q19_asof_join" ->
      """SELECT p.event_id, p.user_id, s.signup_event FROM
        |  (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN
        |  (SELECT user_id, ts, event_id AS signup_event FROM events WHERE event_type = 'signup') s
        |ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,
    "q21_session_window" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) >= 3600000000
        |         OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts_us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM t)
        |SELECT user_id, MIN(ts_us) // 1000 AS session_start_ms, COUNT(1) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin,
    "q23_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, TRUE AS approx_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(1) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q26_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (
        |    SELECT COUNT(1) FROM orders i WHERE i.o_custkey = o.o_custkey
        |  ) > (
        |    SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FROM orders i WHERE i.o_custkey = o.o_custkey
        |  )
        |ORDER BY o_orderkey""".stripMargin,
    "q25_pivot" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.75) AS p75
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q27_rank_variants" ->
      """SELECT o_orderkey, o_orderstatus,
        |  NTILE(4) OVER w AS quartile,
        |  DENSE_RANK() OVER w AS drnk,
        |  PERCENT_RANK() OVER w AS prnk,
        |  CUME_DIST() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q28_set_ops_all" ->
      """WITH c AS (SELECT c_nationkey AS k FROM customer),
        |     s AS (SELECT s_nationkey AS k FROM supplier)
        |SELECT 'except_all' AS tag, k, COUNT(1) AS n
        |FROM (SELECT k FROM c EXCEPT ALL SELECT k FROM s) GROUP BY k
        |UNION ALL
        |SELECT 'intersect_all' AS tag, k, COUNT(1) AS n
        |FROM (SELECT k FROM c INTERSECT ALL SELECT k FROM s) GROUP BY k
        |ORDER BY tag, k""".stripMargin,
    "q29_string_funcs2" ->
      """SELECT p_partkey,
        |  TRANSLATE(p_brand, '#', '-') AS brand_t,
        |  REVERSE(p_name) AS rname,
        |  REPEAT(p_brand, 2) AS brand2,
        |  LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
        |  SPLIT_PART(p_type, ' ', 1) AS type_head,
        |  POSITION('a' IN p_name) AS a_pos
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q30_date_funcs2" ->
      """SELECT o_orderkey,
        |  QUARTER(o_orderdate) AS q,
        |  CAST(LAST_DAY(o_orderdate) AS DATE) AS month_end,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  ISODOW(o_orderdate) AS isodow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q31_unnest_tokens" ->
      """SELECT tok, COUNT(1) AS n, MIN(p_partkey) AS min_key
        |FROM (SELECT p_partkey, UNNEST(STRING_SPLIT(p_type, ' ')) AS tok FROM part)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q32_grouping_flags" ->
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
        |  COUNT(1) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q20_range_join" ->
      """SELECT n_nationkey, COUNT(1) AS n_in_band
        |FROM (SELECT n_nationkey,
        |        CAST(n_nationkey * 400 AS DOUBLE) AS lo,
        |        CAST(n_nationkey * 400 + 800 AS DOUBLE) AS hi
        |      FROM nation) b
        |JOIN customer ON c_acctbal >= lo AND c_acctbal < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
