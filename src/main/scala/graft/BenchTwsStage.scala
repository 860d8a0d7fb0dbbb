package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `transformWithState` throughput stage — the Spark-4 NATIVE typed-state
  * forward path ([[graft.streaming.StreamTws]]) under the bench, so the
  * API the engine recommends for new deployments has perf artifacts
  * round-over-round next to the foreachBatch-mirror stage
  * ([[BenchStreamStage]]): N epochs of a `rate-micro-batch` stream drive
  * [[graft.streaming.StreamTws.firstSeen]] cross-batch dedup on the
  * RocksDB provider (the provider `transformWithState` REQUIRES — also
  * the deployment provider), with a CONSERVATION audit: the planted
  * duplicate structure (R rows per epoch over R/2 distinct digests,
  * every later epoch 100% cross-epoch duplicates) must emit exactly R/2
  * rows in epoch 0 and ZERO after — wrong-but-fast never rides the
  * artifact unflagged.
  *
  * Engine-behavior notes baked in (verified on 4.1.2, see StreamTws):
  * TimeMode.None (no TTL) keeps the trigger loop quiescent —
  * ProcessingTime mode busy-loops maintenance batches forever; and the
  * checkpoint-file checksum writer is disabled (the TTL'd-commit
  * deadlock workaround, harmless here, kept for conf parity with the
  * deployment guidance).
  *
  * As a main: runs once, prints ONE line `TWSSTAGE {...}`.
  * [[forkedMedian]] forks it 3× fresh-JVM (the [[BenchTcpStage]]
  * protocol) and medians the rows/s.
  */
object BenchTwsStage {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val epochs = sys.env.getOrElse("SPARK_GRAFT_TWS_EPOCHS", "8").toInt
    val rowsPerBatch = sys.env.getOrElse("SPARK_GRAFT_TWS_ROWS", "200000").toInt
    require(rowsPerBatch % 2 == 0, "rowsPerBatch must be even")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      )
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tws-bench").toString
    val nDistinct = rowsPerBatch / 2

    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    @volatile var done = 0
    @volatile var tFirst = 0L
    @volatile var tLast = 0L

    val src = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("numPartitions", cpus)
      .load()
    val rows = src.select(
      concat(lit("d"), col("value")).as("id"),
      concat(lit("fp"), pmod(col("value"), lit(nDistinct))).as("fp")
    ).as[graft.streaming.StreamTws.FpRow]
    val deduped = graft.streaming.StreamTws.firstSeen(rows)

    val q = deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.StreamTws.FpRow], _: Long) =>
        // ALWAYS materialize — including overrun epochs past the measured
        // window. rate-micro-batch never ends, so batches keep arriving
        // until q.stop() lands; a foreachBatch that skips consuming one
        // leaves the plan's transformWithState stores with ZERO commits
        // for that batch, and Spark 4.1.2's BatchCommitTracker
        // ("Expected N commits but got 0") then kills the query with
        // STATE_STORE_COMMIT_VALIDATION_FAILED — the root cause of the
        // r14 intermittent "fork exited 1" (whether the overrun batch
        // started before stop() was the coin flip). Overrun counts are
        // simply not recorded; the measured window stays epochs × rows.
        val record = done < epochs
        if (record && tFirst == 0L) tFirst = System.nanoTime()
        val n = batch.count()
        if (record) {
          emitted.synchronized { emitted += n; () }
          done += 1
          tLast = System.nanoTime()
        }
      }
      .start()
    val deadline = System.currentTimeMillis() + 15 * 60 * 1000
    while (done < epochs && System.currentTimeMillis() < deadline) Thread.sleep(100)
    q.stop()
    q.awaitTermination(30000)

    val sec = math.max(1e-9, (tLast - tFirst) / 1e9)
    val totalRows = epochs.toLong * rowsPerBatch
    val rowsPerSec = totalRows / sec
    // conservation: epoch 0 admits every distinct digest exactly once,
    // every later epoch is 100% cross-epoch duplicates → zero emissions
    val ok = done == epochs &&
      emitted.headOption.contains(nDistinct.toLong) &&
      emitted.drop(1).forall(_ == 0L)
    def f1(v: Double) = BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    println(
      s"""TWSSTAGE {"tws_rows_s":${f1(rowsPerSec)},"tws_sec":${f1(sec)},""" +
        s""""tws_epochs":$done,"tws_rows":$totalRows,""" +
        s""""tws_emitted":[${emitted.mkString(",")}],"conservation_ok":$ok}"""
    )
    spark.stop()
  }

  /** Median of `n` forked runs, fresh JVM each — the
    * [[BenchStreamStage.forkedMedian]] protocol on the TWSSTAGE line.
    */
  def forkedMedian(n: Int = 3): BenchStreamStage.StreamOutcome = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val steal = scala.collection.mutable.ArrayBuffer.empty[Double]
    val loads = scala.collection.mutable.ArrayBuffer.empty[Double]
    var conservation = true
    (1 to n).foreach { i =>
      loads += EnvProbe.loadavg1()
      val s0 = EnvProbe.stealTicks()
      val res = BenchTcpStage.forkRaw(Seq.empty, timeoutSec = 600, mainClass = "graft.BenchTwsStage")
      steal += EnvProbe.stealSec(s0, EnvProbe.stealTicks())
      res match {
        case Left(reason) => errors += s"run$i: $reason"
        case Right(out) =>
          out.linesIterator.find(_.startsWith("TWSSTAGE ")) match {
            case None => errors += s"run$i: child exited 0 but printed no TWSSTAGE line"
            case Some(l) =>
              val rate = "\"tws_rows_s\":([-0-9.Ee]+)".r.findFirstMatchIn(l).map(_.group(1).toDouble)
              val ok = l.contains("\"conservation_ok\":true")
              rate match {
                case Some(v) if v > 0 =>
                  runs += v
                  if (!ok) conservation = false
                case _ => errors += s"run$i: unparseable TWSSTAGE line"
              }
          }
      }
    }
    val sorted = runs.sorted
    val median =
      if (sorted.isEmpty) None
      else if (sorted.length % 2 == 1) Some(sorted(sorted.length / 2))
      else Some((sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2)
    BenchStreamStage.StreamOutcome(median, runs.toSeq, errors.toSeq, conservation && runs.nonEmpty,
      steal.toSeq, loads.toSeq)
  }
}
