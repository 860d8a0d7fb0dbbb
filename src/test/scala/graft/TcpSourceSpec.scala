package graft

import org.apache.spark.sql.functions._

import java.net.{ServerSocket, Socket}

import graft.functions.codecs
import graft.model.Telemetry._

/** End-to-end TCP ingress (O-3 + O-8): real sockets, frames split at
  * adversarial chunk boundaries, decoded by the DSv2 source's
  * per-connection stateful decoder, consumed as a streaming DataFrame.
  */
class TcpSourceSpec extends SparkTestBase {

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort
    finally s.close()
  }

  test("frames stream in over TCP, survive chunk splits, decode per connection") {
    val port = freePort()
    val df = spark.readStream
      .format("graft-tcp")
      .option("port", port.toString)
      .load()
    val q = df.writeStream.format("memory").queryName("tcp_frames").start()
    try {
      // allow the listener to bind/accept
      Thread.sleep(300)
      val hb1 = encodeHeartbeat(Heartbeat(72, 0, 1700L))
      val hb2 = encodeHeartbeat(Heartbeat(73, 1, 1701L))
      val dyn = encodeFrame(TypeDynMessage, "hello kafka".getBytes("UTF-8"))
      val stream = hb1 ++ dyn ++ hb2

      val sock = new Socket("127.0.0.1", port)
      val out = sock.getOutputStream
      // adversarial chunking: split mid-length-prefix and mid-body
      out.write(stream.slice(0, 1)); out.flush(); Thread.sleep(50)
      out.write(stream.slice(1, 30)); out.flush(); Thread.sleep(50)
      out.write(stream.slice(30, stream.length)); out.flush()
      sock.close()

      // second connection: independent framing state
      val sock2 = new Socket("127.0.0.1", port)
      sock2.getOutputStream.write(encodeHeartbeat(Heartbeat(99, 9, 9L)))
      sock2.close()

      val deadline = System.currentTimeMillis() + 15000
      var rows = Seq.empty[(Int, Int, Array[Byte])]
      while (rows.length < 4 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark
          .table("tcp_frames")
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getAs[Array[Byte]]("payload")))
          .toSeq
        if (rows.length < 4) Thread.sleep(200)
      }
      assert(rows.length == 4, s"expected 4 frames, got ${rows.length}")
      val hbs = rows.filter(_._2 == TypeHeartbeat).map(r => decodeHeartbeat(r._3))
      assert(hbs.toSet == Set(Heartbeat(72, 0, 1700L), Heartbeat(73, 1, 1701L), Heartbeat(99, 9, 9L)))
      val dyns = rows.filter(_._2 == TypeDynMessage)
      assert(dyns.length == 1 && new String(dyns.head._3, "UTF-8") == "hello kafka")
      // the two sockets got distinct connection ids
      assert(rows.map(_._1).distinct.length == 2)
    } finally q.stop()
  }

  test("maxFramesPerTrigger admission control caps batch sizes (batchSize parity)") {
    val port = freePort()
    val df = spark.readStream
      .format("graft-tcp")
      .option("port", port.toString)
      .option("maxFramesPerTrigger", "2")
      .load()
    val progressSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        if (e.progress.numInputRows > 0) { progressSizes += e.progress.numInputRows; () }
      }
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val q = df.writeStream.format("memory").queryName("tcp_capped").start()
    try {
      Thread.sleep(300)
      // one connection per frame → each frame is its own chunk, so the
      // cap=2 admission control is deterministic (frames on a shared
      // connection could coalesce into one oversized chunk, which the
      // contract admits whole)
      (1 to 6).foreach { i =>
        val sock = new Socket("127.0.0.1", port)
        sock.getOutputStream.write(encodeHeartbeat(Heartbeat(i, i, i)))
        sock.close()
        Thread.sleep(50)
      }
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table("tcp_capped").count() < 6 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      assert(spark.table("tcp_capped").count() == 6)
      // every non-empty batch respected the cap (chunks of 1 frame each)
      assert(progressSizes.nonEmpty && progressSizes.forall(_ <= 2), s"batches: $progressSizes")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("maxBufferedBytes load-sheds on overload and counts drops (O-14 drop-on-full)") {
    val port = freePort()
    val df = spark.readStream
      .format("graft-tcp")
      .option("port", port.toString)
      .option("maxBufferedBytes", "4096")
      .load()
    val q = df.writeStream.format("memory").queryName("tcp_shed").start()
    try {
      Thread.sleep(300)
      val hb = encodeHeartbeat(Heartbeat(72, 0, 1700L))
      val sock = new Socket("127.0.0.1", port)
      val out = sock.getOutputStream
      // trickle first: small chunks fit the 4 KB cap and must pass
      (1 to 3).foreach { _ => out.write(hb); out.flush(); Thread.sleep(150) }
      // then a burst far over the cap in one write: over-cap chunks are
      // shed (dropped + counted), never buffered
      val burst = Array.fill(10000)(hb).flatten
      out.write(burst); out.flush()
      sock.close()

      val total = 10003L
      def processed(): Long = { q.processAllAvailable(); spark.table("tcp_shed").count() }
      val deadline = System.currentTimeMillis() + 20000
      while (processed() + graft.sources.TcpShedMetrics.shedFrames(port) < total &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      val done = processed()
      val shed = graft.sources.TcpShedMetrics.shedFrames(port)
      assert(done + shed == total, s"conservation: processed=$done shed=$shed total=$total")
      assert(done >= 3, s"trickle frames must pass the cap (processed=$done)")
      assert(shed > 0, "the burst must shed")
      // shed bytes count decoded BODY bytes (24 per heartbeat), the same
      // unit the buffer cap is accounted in — not the 28 wire bytes
      assert(graft.sources.TcpShedMetrics.shedBytes(port) == shed * 24)
      assert(graft.sources.TcpShedMetrics.scrape(port)
        .contains(s"""drop_messages_total{drop_type="load_shed",port="$port"} $shed"""))
    } finally q.stop()
  }

  test("poisoned connection is dropped immediately, even if the peer goes silent") {
    val port = freePort()
    val df = spark.readStream
      .format("graft-tcp")
      .option("port", port.toString)
      .load()
    val q = df.writeStream.format("memory").queryName("tcp_poison").start()
    val sock = new Socket("127.0.0.1", port)
    try {
      Thread.sleep(300)
      val out = sock.getOutputStream
      // one good frame, then a structurally invalid header (u16 len=1 < 4)
      // — and then SILENCE with the socket held open. The read loop must
      // bail right after the poisoning feed, not sit in a blocking read()
      // pinning the connection and its reader thread on a peer that will
      // never send another byte.
      out.write(encodeHeartbeat(Heartbeat(72, 0, 1700L)) ++ Array[Byte](1, 0, 0, 0))
      out.flush()
      // the good frame decoded before the poison offset is delivered
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table("tcp_poison").isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      assert(spark.table("tcp_poison").count() == 1)
      // the connection is closed by the SOURCE (we never close our end)
      while (graft.sources.TcpShedMetrics.connectionCount(port) > 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(graft.sources.TcpShedMetrics.connectionCount(port) == 0,
        "poisoned connection must be dropped without waiting for peer bytes")
    } finally {
      q.stop()
      sock.close()
    }
    // a stopped stream scrapes no stale numbers — capacity included
    assert(graft.sources.TcpShedMetrics.bufferCapacity(port) == 0L,
      "tcp_buffer_capacity must be unregistered with the gauges on stop")
  }

  test("checkpoint restart: restored offsets re-base, fresh frames still flow") {
    val port = freePort()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tcp_ckpt").toString

    val seen = scala.collection.concurrent.TrieMap.empty[Long, Int]

    def runAndSend(hb: Heartbeat): Unit = {
      val q = spark.readStream
        .format("graft-tcp")
        .option("port", port.toString)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach { r =>
            val c = decodeHeartbeat(r.getAs[Array[Byte]]("payload"))
            seen.updateWith(c.clientId)(v => Some(v.getOrElse(0) + 1))
          }
          ()
        }
        .start()
      try {
        Thread.sleep(400)
        val sock = new Socket("127.0.0.1", port)
        sock.getOutputStream.write(encodeHeartbeat(hb))
        sock.close()
        val deadline = System.currentTimeMillis() + 15000
        while (!seen.contains(hb.clientId) && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          Thread.sleep(100)
        }
      } finally q.stop()
    }

    // first incarnation processes one frame and commits offsets
    runAndSend(Heartbeat(1, 1, 1))
    assert(seen.toMap == Map(1L -> 1))
    // second incarnation restores a checkpoint whose offset exceeds the
    // fresh in-memory log — must NOT crash, and new frames must arrive
    runAndSend(Heartbeat(2, 2, 2))
    assert(seen.toMap == Map(1L -> 1, 2L -> 1), s"got $seen")
  }

  test("TCP rows feed the same downstream operators as the batch path") {
    val port = freePort()
    val df = spark.readStream
      .format("graft-tcp")
      .option("port", port.toString)
      .load()
    // heartbeat branch of the reference pipeline (O-9/O-10 on stream rows):
    // re-frame the body so the shared frame-offset codecs apply.
    val decoded = df
      .filter(col("msg_type") === TypeHeartbeat)
      .select(
        codecs.le_i64(col("payload"), 0).as("client_id"),
        codecs.le_i64(col("payload"), 8).as("sequence")
      )
    val q = decoded.writeStream.format("memory").queryName("tcp_decoded").start()
    try {
      Thread.sleep(300)
      val sock = new Socket("127.0.0.1", port)
      sock.getOutputStream.write(encodeHeartbeat(Heartbeat(7, 42, 1L)))
      sock.close()
      val deadline = System.currentTimeMillis() + 15000
      var got = Seq.empty[(Long, Long)]
      while (got.isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        got = spark.table("tcp_decoded").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (got.isEmpty) Thread.sleep(200)
      }
      assert(got == Seq((7L, 42L)))
    } finally q.stop()
  }
}
