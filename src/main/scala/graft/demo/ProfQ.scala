package graft.demo

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiling harness (guide §1/§7: measure first, attribute stage
  * time): run named SparkEntry queries once warm, then once instrumented
  * with a SparkListener that aggregates per-stage wall time, task time,
  * shuffle read/write bytes and spill — the local[] stand-in for the
  * Stages tab. Usage: graft.demo.ProfQ <sfDir> <query>...
  */
object ProfQ {
  final case class StageAgg(
      name: String,
      var wallMs: Long = 0L,
      var taskMs: Long = 0L,
      var gcMs: Long = 0L,
      var inBytes: Long = 0L,
      var shReadB: Long = 0L,
      var shWriteB: Long = 0L,
      var spillB: Long = 0L,
      var nTasks: Int = 0
  )

  def main(args: Array[String]): Unit = {
    // dev knob: GRAFT_SYSPROPS=k1=v1,k2=v2 sets system properties in the
    // forked run JVM (e.g. graft.cc.debug=true for CC round tracing)
    sys.env.get("GRAFT_SYSPROPS").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); System.setProperty(k, v); ()
    })
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
      // inline session-conf toggle for interleaved A/B: "conf:key=value"
      if (n.startsWith("conf:")) {
        val Array(k, v) = n.stripPrefix("conf:").split("=", 2)
        spark.conf.set(k, v)
        println(s"===== set $k=$v =====")
      } else profile(spark, sfDir, n)
    }
    spark.stop()
  }

  private def profile(spark: SparkSession, sfDir: String, n: String): Unit = {
    {
      // warm pass (JIT/page cache), untimed beyond the headline
      val tw = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val warmSec = (System.nanoTime() - tw) / 1e9

      val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
      var nJobs = 0
      val lock = new Object
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = lock.synchronized {
          nJobs += 1
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = lock.synchronized {
          val si = sc.stageInfo
          val agg = stages.getOrElseUpdate(si.stageId, StageAgg(si.name.takeWhile(_ != '\n')))
          agg.wallMs += si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        }
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = lock.synchronized {
          val agg = stages.getOrElseUpdate(te.stageId, StageAgg(""))
          val m = te.taskMetrics
          if (m != null) {
            agg.taskMs += m.executorRunTime
            agg.gcMs += m.jvmGCTime
            agg.inBytes += m.inputMetrics.bytesRead
            agg.shReadB += m.shuffleReadMetrics.totalBytesRead
            agg.shWriteB += m.shuffleWriteMetrics.bytesWritten
            agg.spillB += m.memoryBytesSpilled + m.diskBytesSpilled
            agg.nTasks += 1
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus before reading the aggregates
      // (waitUntilEmpty, not a fixed sleep — r16 ADVICE: task-end events
      // can trail a sleep on a loaded box and undercount the aggregates)
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext, 10000L)
      spark.sparkContext.removeSparkListener(listener)
      val persisted = spark.sparkContext.getPersistentRDDs
      val storage = try spark.sparkContext.getRDDStorageInfo
      catch { case _: Throwable => Array.empty[org.apache.spark.storage.RDDInfo] }
      val persistedMb = persisted.values.map { r =>
        storage.filter(_.id == r.id).map(_.memSize).sum
      }.sum / (1024 * 1024)
      val wallSum = lock.synchronized(stages.values.map(_.wallMs).sum)
      println(
        f"===== $n  warm=$warmSec%.2f s  timed=$sec%.2f s  rows=$cnt  jobs=$nJobs  stages=${stages.size}  " +
          f"stageWallSum=${wallSum / 1000.0}%.2f s  persistedRDDs=${persisted.size}  persistedMB=$persistedMb ====="
      )
      lock.synchronized {
        stages.toSeq.sortBy(-_._2.taskMs).take(25).foreach { case (id, a) =>
          println(
            f"  stage $id%4d tasks=${a.nTasks}%3d wall=${a.wallMs}%6d ms task=${a.taskMs}%7d ms gc=${a.gcMs}%5d " +
              f"in=${a.inBytes / 1024}%8d KB shR=${a.shReadB / 1024}%7d KB shW=${a.shWriteB / 1024}%7d KB " +
              f"spill=${a.spillB / 1024}%6d KB  ${a.name.take(60)}"
          )
        }
      }
    }
  }
}
