package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev profiling scratch main. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    println(s"docs=${docs.count()}")
    def time(name: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      }
    time("prefix05") {
      Dedup.ngramJaccardPairsPrefix(docs, col("text"), col("doc_id"), 3, 0.5).count()
    }
    time("minhash") {
      Dedup.minhashPairs(docs, col("text"), col("doc_id"), 3, 32, 16, 0.2).count()
    }
    spark.stop()
  }
}
