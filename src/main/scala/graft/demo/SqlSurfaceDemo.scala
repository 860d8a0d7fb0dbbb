package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.operators.Skew
import graft.streaming.MetricsBridge

/** Runnable sample of the SQL surface (graft_* functions via
  * SparkSessionExtensions), the metrics bridge scrape, and skew-salted
  * joins. `sbt "runMain graft.demo.SqlSurfaceDemo"`.
  */
object SqlSurfaceDemo {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // SQL over binary frames with the native codec expressions
    graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "events")
      .select(
        graft.functions.codecs
          .encode_heartbeat($"user_id", $"event_id", unix_millis($"ts"))
          .as("frame")
      )
      .createOrReplaceTempView("frames")
    spark
      .sql("""SELECT graft_hb_client_id(frame) AS client, COUNT(1) AS n,
              |       MIN(graft_frame_len(frame)) AS len
              |FROM frames GROUP BY 1 ORDER BY 1 LIMIT 5""".stripMargin)
      .collect()
      .foreach(r => println(s"[sql] client=${r.getLong(0)} n=${r.getLong(1)} len=${r.getInt(2)}"))

    // metrics bridge scrape from a real streaming query
    val bridge = new MetricsBridge
    spark.streams.addListener(bridge)
    val q = spark.readStream
      .format("rate")
      .option("rowsPerSecond", "500")
      .load()
      .writeStream
      .format("memory")
      .queryName("demo_rate")
      .start()
    Thread.sleep(3000)
    q.processAllAvailable()
    q.stop()
    Thread.sleep(500) // listener delivery is async
    print("[scrape]\n" + bridge.scrape())

    // live-session registration path (no builder access, e.g. notebooks)
    val live = spark.newSession()
    graft.GraftExtensions.register(live)
    val n = live
      .sql("SELECT graft_le_u16(X'1c000000', 0) AS v")
      .collect()(0)
      .getInt(0)
    println(s"[register] graft_le_u16 on live session -> $n")

    // salted join equals plain join
    val left = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val right = Seq(("hot", 2)).toDF("k", "w")
    val plain = left.join(right, "k").agg(sum($"v" * $"w")).as[Long].collect()(0)
    val salted = Skew.saltedJoin(left, right, "k", 8).agg(sum($"v" * $"w")).as[Long].collect()(0)
    println(s"[skew] plain=$plain salted=$salted equal=${plain == salted}")

    spark.stop()
  }
}
