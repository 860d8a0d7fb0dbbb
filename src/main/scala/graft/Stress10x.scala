package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out evidence for the relational spine (VERDICT r2 #7): replicate
  * the sf0.1 tables N× with KEY-CONSISTENT shifts (each copy offsets
  * orderkey/custkey/partkey/suppkey by copy·stride, so join fan-outs scale
  * linearly instead of quadratically; nation/region stay singletons like
  * real dimensions), then time the four headline queries at 1× and N×
  * and print each N× plan's operator histogram next to the 1× one —
  * plan STABILITY under scale (same join strategies, AQE re-plans intact)
  * is the evidence, not just wall-time.
  *
  * Run: `sbt "runMain graft.Stress10x /root/testdata/sf0.1 target/sf1x [factor]"`
  * — factor defaults to 10; 100 puts lineitem at 60 M rows (the r3 verdict's
  * "data-dominated regime" ask, where overhead no longer masks scaling).
  */
object Stress10x {

  private val Stride = 100000000L

  /** Tables replicated with shifted keys; col → shift applies. */
  private val shifted: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey")
  )
  private val singleton = Seq("nation", "region", "events", "documents", "embeddings")

  private def replicate(df: DataFrame, keys: Seq[String], factor: Int): DataFrame =
    (0 until factor)
      .map { copy =>
        keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(copy * Stride)))
      }
      .reduce(_ unionByName _)

  def build(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    shifted.foreach { case (name, keys) =>
      val src = graft.sources.Tables.load(spark, srcDir, name)
      replicate(src, keys, factor).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    singleton.foreach { name =>
      graft.sources.Tables
        .load(spark, srcDir, name)
        .write
        .mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
    }
  }

  private[graft] def opHistogram(df: DataFrame): Map[String, Int] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // walk the FINAL adaptive plan (post-execution), descending through
    // AQE wrappers — the initial plan hides the join strategies AQE picked
    def walk(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case other                    => other.nodeName +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).groupBy(identity).map { case (k, v) => k -> v.size }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "target/sf1x"
    val factor = if (args.length > 2) args(2).toInt else 10
    val b = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(s"[stress10x] building ${factor}x tables from $srcDir into $outDir ...")
    build(spark, srcDir, outDir, factor)

    val headliners = Seq("q1_pricing_summary", "q2_revenue_by_nation", "q3_top_orders", "q7_window_topk")
    headliners.foreach { name =>
      val fn = SparkEntry.queries(name)
      def timeOn(dir: String): (Double, Long, Map[String, Int]) = {
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (t1, n1) = once()
        val (t2, _) = once()
        // separate pass for the plan: executing the df's own tree (toRdd)
        // finalizes AQE so the histogram shows the strategies it PICKED
        val df = fn(spark, dir)
        df.queryExecution.toRdd.count()
        (math.min(t1, t2), n1, opHistogram(df))
      }
      val (t1, n1, h1) = timeOn(srcDir)
      val (t10, n10, h10) = timeOn(outDir)
      val joinOps = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")
      def joins(h: Map[String, Int]) =
        joinOps.flatMap(op => h.filter(_._1.startsWith(op)).map { case (k, v) => s"$k=$v" }).mkString(",")
      val stable = joins(h1) == joins(h10)
      println(
        f"[stress10x] $name%-22s 1x: $t1%6.2f s ($n1%9d rows)   ${factor}x: $t10%6.2f s ($n10%9d rows)   " +
          f"ratio ${t10 / t1}%5.2f   joins[1x]=${joins(h1)} joins[${factor}x]=${joins(h10)} stable=$stable"
      )
    }
    spark.stop()
  }
}
