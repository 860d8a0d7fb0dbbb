package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev: where does x6 (exact ngram jaccard) spend its time? */
object ProfX6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = graft.sources.Tables.load(spark, sfDir, "documents")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = docs0.select(col("doc_id").as("id"), array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
      .withColumn("nsh", size(col("sh")))
    val inv = docs.select(col("id"), col("nsh"), explode(col("sh")).as("s0"))
      .select(col("id"), col("nsh"), xxhash64(col("s0")).as("s"))
    t("shingle rows")(println("  inv rows=" + inv.count()))
    t("distinct shingles")(println("  distinct=" + inv.select("s").distinct().count()))
    val l = inv.select(col("s"), col("id").as("id_a"), col("nsh").as("n_a"))
    val r = inv.select(col("s"), col("id").as("id_b"), col("nsh").as("n_b"))
    val joined = l.join(r, Seq("s")).filter(col("id_a") < col("id_b"))
    t("candidate join rows")(println("  joined=" + joined.count()))
    t("full x6")(println("  pairs=" + Dedup.ngramJaccardPairs(docs0, col("text"), col("doc_id"), 3, 0.2).count()))
    // top hot shingles
    inv.groupBy("s").count().orderBy(desc("count")).limit(5).collect().foreach(r2 => println("  hot shingle df=" + r2.getLong(1)))
    spark.stop()
  }
}
