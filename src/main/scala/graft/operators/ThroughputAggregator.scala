package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass typed aggregator reproducing the reference's `statistics`
  * summary (libdsp/libdsp/stat.hpp:23-99): lifetime totals + MBps/kMPS over
  * the observed time span, computed in a single scan (partial aggregation
  * map-side, merge on the reduce side — no second pass, no shuffle of raw
  * rows).
  */
object ThroughputAggregator {

  final case class Obs(tsMillis: Long, bytes: Long)
  final case class Buf(msgs: Long, bytes: Long, minTs: Long, maxTs: Long)
  final case class Summary(
      messages: Long,
      bytes: Long,
      span_ms: Long,
      mbps: Double,
      kmps: Double
  )

  val agg: Aggregator[Obs, Buf, Summary] = new Aggregator[Obs, Buf, Summary] {
    override def zero: Buf = Buf(0L, 0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: Buf, o: Obs): Buf =
      Buf(b.msgs + 1, b.bytes + o.bytes, math.min(b.minTs, o.tsMillis), math.max(b.maxTs, o.tsMillis))
    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.msgs + b.msgs, a.bytes + b.bytes, math.min(a.minTs, b.minTs), math.max(a.maxTs, b.maxTs))
    override def finish(b: Buf): Summary = {
      val span = math.max(1L, b.maxTs - b.minTs) // avoid div-by-zero on 1 msg
      Summary(
        b.msgs,
        b.bytes,
        if (b.msgs == 0) 0L else b.maxTs - b.minTs,
        b.bytes / 1e6 / (span / 1e3),
        b.msgs / 1e3 / (span / 1e3)
      )
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }

  /** `summary()` as a TypedColumn for Dataset[Obs].agg. */
  def summaryColumn: TypedColumn[Obs, Summary] = agg.toColumn
}
