package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.io.InputStream
import java.net.{ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable.ArrayBuffer

import graft.model.Telemetry

/** Custom DSv2 micro-batch source: the reference's TCP byte-stream ingress
  * (O-3, libdsp/libdsp/tcp.cpp:43-201) as a Structured Streaming source —
  * the one genuinely novel runtime piece of the port (SURVEY.md §4.3).
  *
  * Usage: `spark.readStream.format("graft-tcp").option("port", p).load()`
  * yields rows `(conn_id int, msg_type int, payload binary)`, one per
  * decoded `[u16 len][u16 type][body]` frame.
  *
  * Design notes:
  *   - One listener thread per bound port accepts connections; each
  *     connection gets its own reader thread with a PRIVATE
  *     [[Telemetry.StreamDecoder]] — per-connection framing state with
  *     cross-chunk carry-over, exactly the reference's per-connection
  *     handler isolation (doc/test.adoc:51-53, tcp.cpp:102-154).
  *   - Decoded frames land in a driver-side log; offsets are log indices.
  *     Micro-batch planning slices [start, end) into partitions that CARRY
  *     their rows (the same layout as Spark's own socket source): correct
  *     on a cluster, and appropriate here because a TCP ingress is a
  *     single-box protocol by nature — the reference allows exactly one
  *     southbound interface (doc/user-guide.adoc:75-76). The 100 TB scale
  *     path is the Kafka source; the reference itself treats TCP as PoC
  *     (doc/user-guide.adoc:19-21).
  *   - `commit(offset)` garbage-collects acknowledged frames.
  */
class TcpFrameSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tcp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TcpFrameSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table = new TcpFrameTable(properties.get("port").toInt)
}

object TcpFrameSource {
  val schema: StructType = StructType(
    Seq(
      StructField("conn_id", IntegerType),
      StructField("msg_type", IntegerType),
      StructField("payload", BinaryType)
    )
  )
}

private[sources] class TcpFrameTable(port: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-tcp:$port"
  override def schema(): StructType = TcpFrameSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TcpFrameSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TcpFrameStream(port)
      }
    }
}

private[sources] case class FrameOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** Driver-side frame log + listener; offsets are monotone log indices. */
private[sources] class TcpFrameStream(port: Int) extends MicroBatchStream {

  private val log = ArrayBuffer.empty[(Int, Int, Array[Byte])] // conn, type, body
  private var trimmed = 0L // frames GC'd from the head of `log`
  private val connIds = new AtomicInteger(0)
  @volatile private var running = true

  private val server = new ServerSocket(port)

  private def append(conn: Int, frames: Seq[Telemetry.Frame]): Unit =
    log.synchronized { frames.foreach(f => log += ((conn, f.msgType, f.body))) }

  private def readLoop(socket: Socket, conn: Int): Unit = {
    val decoder = new Telemetry.StreamDecoder // per-connection framing state
    val in: InputStream = socket.getInputStream
    val buf = new Array[Byte](1 << 16)
    try {
      var n = in.read(buf)
      while (running && n >= 0) {
        if (n > 0) append(conn, decoder.feed(java.util.Arrays.copyOf(buf, n)))
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () } // connection reset = close
    finally socket.close()
  }

  private val acceptThread = new Thread(() => {
    try {
      while (running) {
        val socket = server.accept()
        val conn = connIds.getAndIncrement()
        val t = new Thread(() => readLoop(socket, conn), s"graft-tcp-conn-$conn")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: java.io.IOException => () } // server closed
  }, s"graft-tcp-accept-$port")
  acceptThread.setDaemon(true)
  acceptThread.start()

  override def initialOffset(): Offset = FrameOffset(0L)
  override def latestOffset(): Offset =
    log.synchronized(FrameOffset(trimmed + log.length))
  override def deserializeOffset(json: String): Offset = FrameOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].index
    val e = end.asInstanceOf[FrameOffset].index
    val rows = log.synchronized {
      log.slice((s - trimmed).toInt, (e - trimmed).toInt).toArray
    }
    // Rows ride inside the partition descriptors (serializable), so the
    // batch is correct with remote executors too.
    val slices = rows.grouped(math.max(1, rows.length / 4 + 1)).toArray
    slices.map(sl => TcpFramePartition(sl): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val rows = partition.asInstanceOf[TcpFramePartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val (conn, tpe, body) = rows(i)
          InternalRow(conn, tpe, body)
        }
        override def close(): Unit = ()
      }
    }
  }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[FrameOffset].index
    log.synchronized {
      val drop = (e - trimmed).toInt
      if (drop > 0) { log.remove(0, drop); trimmed = e }
    }
  }

  override def stop(): Unit = {
    running = false
    server.close()
  }
}

private[sources] case class TcpFramePartition(rows: Array[(Int, Int, Array[Byte])])
    extends InputPartition
