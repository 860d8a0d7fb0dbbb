package graft

import org.apache.spark.sql.functions._

import graft.model.Message
import graft.runtime.Handlers

/** Typed handler-compat layer: a reference handler ported verbatim. */
class HandlersSpec extends SparkTestBase {

  import spark.implicits._

  private def envelope = Seq(
    (Array[Byte](1), "in", Map("type" -> "heartbeat"), "hb-payload".getBytes("UTF-8")),
    (Array[Byte](2), "in", Map("type" -> "other"), "drop-me".getBytes("UTF-8"))
  ).toDF("key", "subject", "properties", "payload")

  test("ported handler: filter + relabel + multicast like the reference's do_process") {
    val out = Handlers
      .mount(envelope) { msg =>
        if (msg.properties.get("type").contains("heartbeat"))
          Seq(
            msg.copy(subject = "heartbeats"),
            msg.copy(subject = "audit", properties = msg.properties + ("mirrored" -> "true"))
          )
        else Seq.empty // drop
      }
      .collect()
    assert(out.length == 2)
    assert(out.map(_.subject).toSet == Set("heartbeats", "audit"))
    assert(out.forall(m => new String(m.payload, "UTF-8") == "hb-payload"))
  }

  test("partitioned mount: factory state initialized once per partition") {
    val counted = Handlers
      .mountPartitioned(envelope.repartition(2)) { () =>
        var n = 0 // per-partition handler state (doc/test.adoc:51-53)
        msg => {
          n += 1
          Seq(msg.copy(properties = msg.properties + ("seq_in_partition" -> n.toString)))
        }
      }
      .collect()
    assert(counted.length == 2)
    // round-robin may or may not split the 2 rows: either two partitions
    // with fresh counters (1,1) or one partition counting (1,2)
    val seqs = counted.map(_.properties("seq_in_partition").toInt).sorted.toSeq
    assert(seqs == Seq(1, 1) || seqs == Seq(1, 2))
  }

  test("handler output feeds column operators (mixed typed/untyped pipeline)") {
    val df = Handlers
      .mount(envelope)(m => Seq(m.copy(subject = "t")))
      .toDF()
      .groupBy(col("subject"))
      .agg(count(lit(1)).as("n"))
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("t", 2L)))
  }
}
