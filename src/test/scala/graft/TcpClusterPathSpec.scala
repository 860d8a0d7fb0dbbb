package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

/** The remote-executor handoff shape: local mode resolves chunks by
  * reference through [[TcpChunkHandoff]] (covered by every streaming
  * test), while a cluster ships them serialized inside the partition
  * descriptor — this spec covers that second path explicitly: a
  * java-serialization round-trip of the descriptor (exactly what a task
  * launch does) must decode to identical frames.
  */
class TcpClusterPathSpec extends graft.SparkTestBase {

  private def roundTrip[T](t: T): T = {
    val bytes = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bytes)
    oos.writeObject(t)
    oos.close()
    new ObjectInputStream(new ByteArrayInputStream(bytes.toByteArray))
      .readObject()
      .asInstanceOf[T]
  }

  test("serialized TcpFramePartition decodes to the same frames as by-reference") {
    val chunkA = FrameChunk(7, Array(1, 2), Array(0, 3, 5), Array[Byte](10, 11, 12, 20, 21))
    val chunkB = FrameChunk(8, Array(1), Array(0, 2), Array[Byte](30, 31))
    val part = roundTrip(TcpFramePartition(Array(chunkA, chunkB)): org.apache.spark.sql.connector.read.InputPartition)

    val stream = new TcpFrameStream(port = 0) // ephemeral port; no client traffic
    try {
      val reader = stream.createReaderFactory().createReader(part)
      val rows = Iterator
        .continually(if (reader.next()) Some(reader.get()) else None)
        .takeWhile(_.isDefined)
        .flatten
        .map(r => (r.getInt(0), r.getInt(1), r.getBinary(2).toSeq))
        .toVector
      assert(
        rows == Vector(
          (7, 1, Seq[Byte](10, 11, 12)),
          (7, 2, Seq[Byte](20, 21)),
          (8, 1, Seq[Byte](30, 31))
        )
      )
    } finally stream.stop()
  }

  test("local handoff registry: released plans fail loudly, not silently empty") {
    val planId = TcpChunkHandoff.register(Array(Array(FrameChunk(1, Array(1), Array(0, 1), Array[Byte](5)))))
    assert(TcpChunkHandoff.get(planId, 0).length == 1)
    TcpChunkHandoff.release(planId)
    intercept[IllegalArgumentException](TcpChunkHandoff.get(planId, 0))
  }
}
