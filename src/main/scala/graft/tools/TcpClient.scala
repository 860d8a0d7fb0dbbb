package graft.tools

import java.io.BufferedOutputStream
import java.net.Socket

import graft.model.Telemetry

/** Standalone TCP load-generator (the reference's `dsp-tools/tcp-client`
  * CLI, tcp-client.cpp:101-127: batched sends, optional MPS rate limit,
  * running throughput stats): writes `count` length-prefixed dyn frames of
  * `size` bytes to `address`, `batch` frames per socket write. The
  * remainder below one batch is not sent — same contract as the reference
  * ("the remainder is not sent out").
  *
  * Usage:
  *   runMain graft.tools.TcpClient --address 127.0.0.1:9000 \
  *     --count 1000000 --size 200 [--batch 100] [--rate-limit 0]
  */
object TcpClient {

  final case class Config(
      host: String,
      port: Int,
      count: Long,
      size: Int,
      batch: Int = 1,
      rateLimitMps: Long = 0L
  )

  final case class Stats(sentFrames: Long, sentBytes: Long, seconds: Double) {
    def mbps: Double = sentBytes / 1e6 / seconds
    def kmps: Double = sentFrames / 1e3 / seconds
  }

  /** Send per `cfg`; returns the achieved throughput. Callable from tests
    * and other mains (the bench stages embed their own copy of this loop —
    * this is the user-facing binary form).
    */
  def run(cfg: Config): Stats = {
    // whole-frame u16 length ⇒ max frame = 0xffff (encodeFrame's own bound)
    require(cfg.size >= Telemetry.HeaderSize && cfg.size <= 0xffff, s"size out of range: ${cfg.size}")
    val frame = Telemetry.encodeFrame(
      Telemetry.TypeDynMessage,
      Array.fill[Byte](cfg.size - Telemetry.HeaderSize)('x')
    )
    val chunk = Array.fill(cfg.batch)(frame).flatten
    val nBatches = cfg.count / cfg.batch
    val socket = new Socket(cfg.host, cfg.port)
    try {
      val out = new BufferedOutputStream(socket.getOutputStream, 1 << 20)
      val t0 = System.nanoTime()
      var i = 0L
      while (i < nBatches) {
        out.write(chunk)
        if (cfg.rateLimitMps > 0) {
          // simple pacing: sleep off any lead over the target rate
          val shouldHaveTakenNs = (i + 1) * cfg.batch * 1000000000L / cfg.rateLimitMps
          val aheadNs = shouldHaveTakenNs - (System.nanoTime() - t0)
          if (aheadNs > 1000000L) Thread.sleep(aheadNs / 1000000L)
        }
        i += 1
      }
      out.flush()
      val sec = (System.nanoTime() - t0) / 1e9
      Stats(nBatches * cfg.batch, nBatches * cfg.batch * cfg.size.toLong, sec)
    } finally socket.close()
  }

  private val knownKeys = Set("address", "count", "size", "batch", "rate-limit")

  private[graft] def parse(args: Array[String]): Config = {
    require(args.length % 2 == 0, s"arguments must be --key value pairs, got: ${args.mkString(" ")}")
    val kv = args
      .sliding(2, 2)
      .map {
        case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
        case other => sys.error(s"expected --key value, got: ${other.mkString(" ")}")
      }
      .toMap
    kv.keys.find(!knownKeys.contains(_)).foreach { k =>
      sys.error(s"unknown option --$k (known: ${knownKeys.toSeq.sorted.map("--" + _).mkString(", ")})")
    }
    val address = kv.getOrElse("address", sys.error("--address host:port is required"))
    val Array(host, port) = address.split(":", 2)
    Config(
      host = host,
      port = port.toInt,
      count = kv.getOrElse("count", sys.error("--count is required")).toLong,
      size = kv.getOrElse("size", "200").toInt,
      batch = kv.getOrElse("batch", "1").toInt,
      rateLimitMps = kv.getOrElse("rate-limit", "0").toLong
    )
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val s = run(cfg)
    println(
      f"sent ${s.sentFrames} frames / ${s.sentBytes / 1e6}%.1f MB in ${s.seconds}%.2f s " +
        f"(${s.mbps}%.1f MBps, ${s.kmps}%.1f kMPS)"
    )
  }
}
