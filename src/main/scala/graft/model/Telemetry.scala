package graft.model

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Binary telemetry wire format of the reference application
  * (svc/svc/handler.cpp:23-95, svc/svc/sim.cpp:30-48). All integers are
  * little-endian.
  *
  * {{{
  * frame       := len:u16 | type:u16 | body     // len counts the WHOLE frame
  * type        := 0 (heartbeat) | 1 (dyn_message)
  * heartbeat   := client_id:u64 | sequence:u64 | timestamp:u64
  * dyn_message := opaque bytes (len - 4)
  * }}}
  *
  * Pure-Scala codec; the Spark column-level twin lives in
  * [[graft.functions.codecs]]. JVM has no u64 — `Long` is used and the
  * unsigned edge documented (SURVEY.md §7.4).
  */
object Telemetry {
  val LengthPrefixSize = 2 // handler.cpp:30
  val HeaderSize = 4 // prefix + type, sim.cpp:37-38
  val TypeHeartbeat = 0 // handler.cpp:46-49
  val TypeDynMessage = 1
  val HeartbeatBodySize = 24 // 3 x u64, handler.cpp:64-78

  final case class Frame(msgType: Int, body: Array[Byte])
  final case class Heartbeat(clientId: Long, sequence: Long, timestamp: Long)

  def encodeFrame(msgType: Int, body: Array[Byte]): Array[Byte] = {
    val len = HeaderSize + body.length
    require(len <= 0xffff, s"frame too large: $len")
    val bb = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(len.toShort)
    bb.putShort(msgType.toShort)
    bb.put(body)
    bb.array()
  }

  def encodeHeartbeat(hb: Heartbeat): Array[Byte] = {
    val bb =
      ByteBuffer.allocate(HeartbeatBodySize).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(hb.clientId)
    bb.putLong(hb.sequence)
    bb.putLong(hb.timestamp)
    encodeFrame(TypeHeartbeat, bb.array())
  }

  def decodeHeartbeat(body: Array[Byte]): Heartbeat = {
    require(body.length >= HeartbeatBodySize, "short heartbeat body")
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    Heartbeat(bb.getLong(0), bb.getLong(8), bb.getLong(16))
  }

  /** A structurally invalid frame header — a u16 length below the header
    * size. There is no resync point in a length-prefixed stream, so this
    * is fatal for the connection/buffer that produced it.
    */
  final class FramingException(msg: String) extends RuntimeException(msg)

  /** Decode one frame starting at `offset`. Returns `None` when the buffer
    * holds an incomplete frame — the caller must wait for more bytes (the
    * return-0 protocol of handler.cpp:99-102 / tcp.cpp:128-139). A length
    * below HeaderSize is NOT 'incomplete': no amount of further bytes can
    * complete it, and treating it as such would wedge a stateful decoder
    * into buffering forever — it throws [[FramingException]] instead.
    */
  def decodeOne(buf: Array[Byte], offset: Int): Option[Frame] = {
    if (buf.length - offset < HeaderSize) return None
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    val len = bb.getShort(offset) & 0xffff
    if (len < HeaderSize)
      throw new FramingException(s"malformed frame length $len (< $HeaderSize) at offset $offset")
    if (buf.length - offset < len) return None
    val tpe = bb.getShort(offset + LengthPrefixSize) & 0xffff
    Some(Frame(tpe, java.util.Arrays.copyOfRange(buf, offset + HeaderSize, offset + len)))
  }

  /** Drain loop over a buffer: decode as many complete frames as possible,
    * return the frames and the number of bytes consumed. Chunk-resumable:
    * feeding a byte stream through this in arbitrary-size pieces (carrying
    * the unconsumed tail over) yields the same frames as one shot
    * (doc/test.adoc:44-50).
    */
  def drain(buf: Array[Byte]): (Seq[Frame], Int) = {
    val out = ArrayBuffer.empty[Frame]
    var off = 0
    var continue = true
    while (continue) {
      decodeOne(buf, off) match {
        case Some(f) =>
          out += f
          off += HeaderSize + f.body.length
        case None => continue = false
      }
    }
    (out.toSeq, off)
  }

  /** Stateful incremental decoder: the carry-over buffer of the reference's
    * per-connection TCP handler (tcp.cpp:102-154) — used by the TCP DSv2
    * source's partition reader.
    *
    * Poison semantics: when a chunk contains a structurally invalid header
    * mid-stream, [[feed]] RETURNS the frames decoded before the poison
    * offset (good frames are never discarded with the garbage that follows
    * them) and records the [[FramingException]] in [[failure]]; the caller
    * checks `failure` after each feed and drops the connection. Any
    * further `feed` throws the recorded exception — there is no resync
    * point in a length-prefixed stream, so a poisoned decoder is dead.
    */
  final class StreamDecoder {
    private var carry: Array[Byte] = Array.emptyByteArray
    private var poison: Option[FramingException] = None

    /** The framing error that killed this decoder, if any. */
    def failure: Option[FramingException] = poison

    def feed(chunk: Array[Byte]): Seq[Frame] = {
      poison.foreach(e => throw e)
      val buf =
        if (carry.isEmpty) chunk
        else {
          val b = new Array[Byte](carry.length + chunk.length)
          System.arraycopy(carry, 0, b, 0, carry.length)
          System.arraycopy(chunk, 0, b, carry.length, chunk.length)
          b
        }
      // inline drain loop, stopping AT the poison offset instead of
      // unwinding through it: frames decoded earlier in this same chunk
      // stay delivered (drain() alone would throw them away)
      val out = ArrayBuffer.empty[Frame]
      var off = 0
      var continue = true
      while (continue) {
        try decodeOne(buf, off) match {
          case Some(f) =>
            out += f
            off += HeaderSize + f.body.length
          case None => continue = false
        } catch {
          case e: FramingException =>
            poison = Some(e)
            continue = false
        }
      }
      carry = java.util.Arrays.copyOfRange(buf, off, buf.length)
      out.toSeq
    }
    def pending: Int = carry.length
  }
}
