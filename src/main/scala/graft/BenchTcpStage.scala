package graft

import org.apache.spark.sql.SparkSession

/** TCP perf stage isolated in its own JVM (see Bench: co-hosting it with
  * the query suite makes whichever phase runs second read 3-10x slower from
  * heap/page-cache pressure — the reference's perf setup is also a separate
  * server process per stage, doc/perf.adoc:36-42).
  *
  * As a main: runs 3 engine-ingest rounds + 1 raw round and prints ONE
  * line: `TCPSTAGE {"runs":[...],"raw_mbps":...,"raw_kmps":...}`.
  * [[forked]] spawns it with the parent's classpath and parses that line.
  */
object BenchTcpStage {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // raw first (fresh heap; it is the less allocation-tolerant loop),
    // best-of-2 — then the 3 engine rounds
    val (rawMbps, rawKmps) = Seq
      .fill(2)(Bench.tcpRaw(nClients = 4, framesPerClient = 500000))
      .maxBy(_._1)
    val runs = Seq.fill(3)(Bench.tcpIngest(spark, nClients = 4, framesPerClient = 1000000)._1).sorted
    println(s"""TCPSTAGE {"runs":[${runs.mkString(",")}],"raw_mbps":$rawMbps,"raw_kmps":$rawKmps}""")
    spark.stop()
  }

  /** Fork the stage into a fresh JVM; None if the child fails or the marker
    * line is missing. Returns (sorted ingest MBps runs, raw MBps, raw kMPS).
    */
  def forked(): Option[(Seq[Double], Double, Double)] =
    try {
      val javaBin = new java.io.File(new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
      val pb = new ProcessBuilder(
        javaBin,
        "-Xmx8g",
        "-cp",
        System.getProperty("java.class.path"),
        "graft.BenchTcpStage"
      )
      // discard child stderr (Spark banner/logs) — reading it after stdout
      // closes risks a pipe-full deadlock while the child is still running
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val ok = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) && proc.exitValue() == 0
      val line = out.linesIterator.find(_.startsWith("TCPSTAGE "))
      if (!ok || line.isEmpty) None
      else {
        val json = line.get.stripPrefix("TCPSTAGE ")
        val runs = "\"runs\":\\[([^\\]]*)\\]".r
          .findFirstMatchIn(json)
          .map(_.group(1).split(',').map(_.trim.toDouble).toSeq)
        val raw = "\"raw_mbps\":([-0-9.Ee]+)".r.findFirstMatchIn(json).map(_.group(1).toDouble)
        val rawK = "\"raw_kmps\":([-0-9.Ee]+)".r.findFirstMatchIn(json).map(_.group(1).toDouble)
        for (r <- runs; a <- raw; k <- rawK if r.length == 3) yield (r, a, k)
      }
    } catch { case _: Throwable => None }
}
