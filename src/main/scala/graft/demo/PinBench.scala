package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-benchmark for [[graft.runtime.GraftCheckpoint.pin]]: how much
  * wall does one eager pin cost on trivial frames, split by phase —
  * planning (toRdd), the materialization job, and the count — vs a plain
  * count of the same frame. Guides whether pin overhead (not query
  * compute) dominates the pin-heavy iterative queries.
  */
object PinBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timeMs[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }

    // warm
    spark.range(1000).count()

    def bench(label: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 10).map { _ =>
        val df = mk()
        val (_, tPlan) = timeMs(df.queryExecution.executedPlan)
        val (pinned, tPin) = timeMs(graft.runtime.GraftCheckpoint.pin(df))
        val (_, tCount) = timeMs(pinned.count())
        (tPlan, tPin, tCount)
      }
      val plainCount = (1 to 10).map { _ =>
        val df = mk(); timeMs(df.count())._2
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"$label%-28s plan=${med(times.map(_._1))}%6.1f ms  pin=${med(times.map(_._2))}%6.1f ms  countAfter=${med(times.map(_._3))}%6.1f ms  plainCount=${med(plainCount)}%6.1f ms")
    }

    bench("narrow 1k x 32p", () => spark.range(0, 1000, 1, 32).toDF("id"))
    bench("narrow 1k x 2p", () => spark.range(0, 1000, 1, 2).toDF("id"))
    bench("shuffle agg 1k", () =>
      spark.range(0, 1000, 1, 32).groupBy(($"id" % 100).as("k")).agg(count(lit(1)).as("n")))
    bench("join of two pins", () => {
      val a = graft.runtime.GraftCheckpoint.pin(spark.range(0, 1000, 1, 32).toDF("id"))
      val c = graft.runtime.GraftCheckpoint.pin(spark.range(0, 500, 1, 32).toDF("id"))
      a.join(c, "id")
    })
    spark.stop()
  }
}
