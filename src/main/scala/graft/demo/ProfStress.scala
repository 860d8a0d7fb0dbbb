package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: debug the planted minhash stress corpus. */
object ProfStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 1000L
    val base = spark.range(n).select(col("id"),
      concat_ws(" ", (0 until 40).map(k => pmod(xxhash64(col("id"), lit(k)), lit(100000)).cast("string")): _*).as("text"))
    val twins = spark.range(n / 100).select((col("id") + 10000000L).as("id"),
      concat_ws(" ", (0 until 40).map { k =>
        if (k < 5) pmod(xxhash64(col("id"), lit(k), lit(1)), lit(100000)).cast("string")
        else pmod(xxhash64(col("id"), lit(k)), lit(100000)).cast("string")
      }: _*).as("text"))
    val docs = base.unionByName(twins)
    // exact jaccard of pair (0, 10000000)
    val d0 = docs.filter(col("id") === 0).select(graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
    val d1 = docs.filter(col("id") === 10000000L).select(graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
    val a = d0.collect()(0).getSeq[String](0).toSet
    val b = d1.collect()(0).getSeq[String](0).toSet
    println(s"jaccard(0, twin) = ${a.intersect(b).size.toDouble / a.union(b).size}")
    val pairs = graft.operators.Dedup.minhashPairs(docs, col("text"), col("id"), 3, 32, 16, 0.5)
    println("pairs found: " + pairs.count())
    pairs.show(5)
    spark.stop()
  }
}
