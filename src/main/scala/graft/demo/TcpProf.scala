package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Dev profiling: phase breakdown of the TCP ingest bench stage. */
object TcpProf {
  def main(args: Array[String]): Unit = {
    val framesPerClient = if (args.nonEmpty) args(0).toInt else 1000000
    val trigMs = if (args.length > 1) args(1).toLong else 250L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val msgSize = 200
    val nClients = 4
    val port = { val s = new java.net.ServerSocket(0); try s.getLocalPort finally s.close() }
    val counter = new java.util.concurrent.atomic.AtomicLong(0L)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]() // rows, addBatchMs, totalMs
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        counter.addAndGet(e.progress.numInputRows)
        val d = e.progress.durationMs
        val detail = new java.util.TreeMap[String, java.lang.Long](d).toString
        println(s"batch rows=${e.progress.numInputRows} $detail")
        batches.add((e.progress.numInputRows, Option(d.get("addBatch")).map(_.toLong).getOrElse(-1L), d.values().stream().mapToLong(_.toLong).sum()))
        ()
      }
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val q = spark.readStream.format("graft-tcp").option("port", port.toString)
      .option("maxFramesPerTrigger", sys.env.getOrElse("CAP", "0") match { case "0" => Long.MaxValue.toString; case v => v })
      .load()
      .writeStream.format("noop").trigger(Trigger.ProcessingTime(trigMs)).start()
    var bound = false
    while (!bound) {
      try { new java.net.Socket("127.0.0.1", port).close(); bound = true }
      catch { case _: java.io.IOException => Thread.sleep(100) }
    }
    while (batches.isEmpty) Thread.sleep(20) // absorb first-batch warmup
    val frame = graft.model.Telemetry.encodeFrame(
      graft.model.Telemetry.TypeDynMessage,
      Array.fill[Byte](msgSize - graft.model.Telemetry.HeaderSize)('x'))
    val chunk = Array.fill(100)(frame).flatten
    val t0 = System.nanoTime()
    val clients = (1 to nClients).map { _ =>
      val t = new Thread(() => {
        val s = new java.net.Socket("127.0.0.1", port)
        val out = new java.io.BufferedOutputStream(s.getOutputStream, 1 << 20)
        (1 to framesPerClient / 100).foreach(_ => out.write(chunk))
        out.flush(); s.close()
      })
      t.start(); t
    }
    clients.foreach(_.join())
    val tClients = (System.nanoTime() - t0) / 1e9
    val total = nClients.toLong * (framesPerClient / 100) * 100
    val deadline = System.currentTimeMillis() + 120000
    while (counter.get() < total && System.currentTimeMillis() < deadline) Thread.sleep(20)
    val tAll = (System.nanoTime() - t0) / 1e9
    q.stop()
    println(f"clients_done=${tClients}%.2f s (raw write rate ${total * msgSize / 1e6 / tClients}%.0f MBps)")
    println(f"all_counted=${tAll}%.2f s  => engine MBps=${total * msgSize / 1e6 / tAll}%.1f")
    println("batches (rows, addBatchMs, totalMs):")
    batches.forEach(b => println(s"  $b"))
    spark.stop()
  }
}
