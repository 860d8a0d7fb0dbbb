package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.model.Telemetry._

/** Wire-format properties (FIXTURES.md §2; reference layouts
  * svc/svc/handler.cpp:28-93, svc/svc/sim.cpp:30-48). Property-style tests
  * over seeded random inputs (deterministic).
  */
class TelemetrySpec extends AnyFunSuite {

  private def randHb(r: Random) =
    Heartbeat(r.nextLong(), r.nextLong(), r.nextLong())

  private def randFrame(r: Random): Array[Byte] =
    if (r.nextBoolean()) encodeHeartbeat(randHb(r))
    else {
      val body = new Array[Byte](r.nextInt(300))
      r.nextBytes(body)
      encodeFrame(TypeDynMessage, body)
    }

  test("heartbeat roundtrip: decode(encode(hb)) == hb (100 random vectors)") {
    val r = new Random(42)
    (1 to 100).foreach { _ =>
      val hb = randHb(r)
      val frame = encodeHeartbeat(hb)
      assert(frame.length == 28) // 4-byte header + 24-byte body (sim.cpp:37)
      val f = decodeOne(frame, 0).get
      assert(f.msgType == TypeHeartbeat)
      assert(decodeHeartbeat(f.body) == hb)
    }
  }

  test("fixture vector: simulator defaults client_id=72 (sim.cpp:56,78-82)") {
    val frame = encodeHeartbeat(Heartbeat(72, 0, 1700000000000L))
    // len=28 little-endian, type=0
    assert((frame(0) & 0xff) == 28 && frame(1) == 0 && frame(2) == 0 && frame(3) == 0)
    assert((frame(4) & 0xff) == 72) // client_id LE first byte
    assert(decodeHeartbeat(decodeOne(frame, 0).get.body) == Heartbeat(72, 0, 1700000000000L))
  }

  test("short buffers decode to nothing (handler.cpp:44,99)") {
    assert(decodeOne(Array[Byte](1, 2, 3), 0).isEmpty)
    assert(drain(Array.emptyByteArray)._1.isEmpty)
  }

  test("malformed length (< header) throws FramingException, never wedges the decoder") {
    // len=3 < HeaderSize: no amount of further bytes completes this frame;
    // 'incomplete' would buffer forever, so it must fail loudly
    val bad = Array[Byte](3, 0, 1, 0, 9)
    intercept[graft.model.Telemetry.FramingException](decodeOne(bad, 0))
    intercept[graft.model.Telemetry.FramingException](drain(bad))
    val dec = new graft.model.Telemetry.StreamDecoder
    // frames decoded BEFORE the poison offset in the same chunk are
    // DELIVERED, the exception is recorded in `failure`, and the dead
    // decoder throws on any further feed (no resync in a length-prefixed
    // stream)
    val good = encodeFrame(TypeDynMessage, Array[Byte](7))
    val delivered = dec.feed(good ++ bad)
    assert(delivered.length == 1 && delivered.head.body.toSeq == Seq[Byte](7))
    assert(dec.failure.isDefined)
    intercept[graft.model.Telemetry.FramingException](dec.feed(Array[Byte](1)))
  }

  test("chunk-boundary invariance: any split decodes to the same frames (doc/test.adoc:44-50)") {
    val r = new Random(7)
    (1 to 200).foreach { _ =>
      val frames = Seq.fill(1 + r.nextInt(8))(randFrame(r))
      val stream = frames.toArray.flatten
      val whole = drain(stream)._1
      val decoder = new StreamDecoder
      val cuts = Seq.fill(r.nextInt(10))(r.nextInt(stream.length + 1))
      val points = (cuts :+ 0 :+ stream.length).distinct.sorted
      val chunks = points.zip(points.tail).map { case (a, b) => stream.slice(a, b) }
      val chunked = chunks.flatMap(decoder.feed)
      assert(chunked.map(_.msgType) == whole.map(_.msgType))
      assert(chunked.map(_.body.toSeq) == whole.map(_.body.toSeq))
      assert(decoder.pending == 0)
    }
  }

  test("drain consumes exactly the complete frames, leaves partial tail") {
    val f1 = encodeHeartbeat(Heartbeat(1, 2, 3))
    val partial = f1.take(10)
    val (frames, consumed) = drain(f1 ++ f1 ++ partial)
    assert(frames.length == 2 && consumed == 2 * f1.length)
  }

  test("unsigned u16 length edge: frames up to 65535 bytes") {
    val body = Array.fill[Byte](65531)(7)
    val f = encodeFrame(TypeDynMessage, body)
    val d = decodeOne(f, 0).get
    assert(d.body.length == 65531)
    assertThrows[IllegalArgumentException](encodeFrame(TypeDynMessage, Array.fill[Byte](65532)(0)))
  }
}
