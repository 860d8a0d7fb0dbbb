package graft.demo

import org.apache.spark.sql.SparkSession

/** Dev timing harness: time named SparkEntry queries at a given sf dir.
  * Usage: graft.demo.TimeQ <sfDir> <query>... */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$cnt")
      }
    }
    spark.stop()
  }
}
