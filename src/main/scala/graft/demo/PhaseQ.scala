package graft.demo

import org.apache.spark.sql.SparkSession

/** Dev phase-attribution harness (guide §1/§7.3: when stages don't account
  * for the wall, the driver is doing something single-threaded): split one
  * query's wall time into construction (incl. eager pins), physical
  * planning, and execution. Usage: graft.demo.PhaseQ <sfDir> <query>...
  */
object PhaseQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        val cnt = df.count()
        val t3 = System.nanoTime()
        println(f"$n run$i: construct=${(t1 - t0) / 1e9}%.2f s  plan=${(t2 - t1) / 1e9}%.2f s  exec=${(t3 - t2) / 1e9}%.2f s  rows=$cnt")
      }
    }
    spark.stop()
  }
}
