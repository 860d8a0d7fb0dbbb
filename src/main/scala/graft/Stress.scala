package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Stress {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stress] $name: ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    // 60M-row lineitem-equivalent agg (100x sf0.1)
    time("q1-style agg, 60M rows") {
      spark.range(60000000L)
        .select(
          (col("id") % 3).cast("string").as("flag"),
          (col("id") % 2).cast("string").as("status"),
          (col("id") % 50 + 1).cast("double").as("qty"),
          (col("id") % 10000).cast("double").as("price"))
        .groupBy("flag", "status")
        .agg(sum(col("qty").cast("decimal(18,2)")), sum(col("price").cast("decimal(18,2)")), count(lit(1)))
        .count()
    }
    // 20M heartbeat frames: encode UDF -> native decode expressions
    time("codec roundtrip, 20M frames") {
      spark.range(20000000L)
        .select(graft.functions.codecs.encode_heartbeat(col("id") % 1000, col("id"), col("id") * 1000).as("f"))
        .select(graft.functions.codecs.hb_client_id(col("f")).as("c"), graft.functions.codecs.hb_sequence(col("f")).as("s"))
        .filter(col("c") >= 0)
        .count()
    }
    spark.stop()
  }
}
