package graft

import org.apache.spark.sql.functions._

import scala.util.Random

import graft.functions.codecs
import graft.model.Telemetry
import graft.model.Telemetry._

/** Column-level codecs (native Catalyst expressions with codegen) must
  * agree with the pure-Scala codec byte-for-byte.
  */
class CodecExpressionSpec extends SparkTestBase {

  test("le_u16 / le_i64 read little-endian fields (eval + codegen paths)") {
    import spark.implicits._
    val r = new Random(11)
    val hbs = Seq.fill(64)(Heartbeat(r.nextLong(), r.nextLong(), r.nextLong()))
    val df = hbs.map(h => Tuple1(encodeHeartbeat(h))).toDF("frame")
    val got = df
      .select(
        codecs.frame_len($"frame").as("len"),
        codecs.frame_type($"frame").as("tpe"),
        codecs.hb_client_id($"frame").as("c"),
        codecs.hb_sequence($"frame").as("s"),
        codecs.hb_timestamp($"frame").as("t")
      )
      .collect()
      .map(row => (row.getInt(0), row.getInt(1), Heartbeat(row.getLong(2), row.getLong(3), row.getLong(4))))
    assert(got.map(_._3).toSeq == hbs)
    assert(got.forall(g => g._1 == 28 && g._2 == TypeHeartbeat))
  }

  test("le reads return null on short buffers (wait-for-more-bytes protocol)") {
    import spark.implicits._
    val df = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b")
    val row = df.select(codecs.le_i64($"b", 0), codecs.le_u16($"b", 2)).collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("frame_split agrees with pure-Scala drain on random multi-frame buffers") {
    import spark.implicits._
    val r = new Random(13)
    val bufs = Seq.fill(50) {
      val n = 1 + r.nextInt(6)
      val frames = Seq.fill(n) {
        if (r.nextBoolean()) encodeHeartbeat(Heartbeat(r.nextLong(), r.nextLong(), r.nextLong()))
        else { val b = new Array[Byte](r.nextInt(100)); r.nextBytes(b); encodeFrame(TypeDynMessage, b) }
      }
      val tail = new Array[Byte](r.nextInt(3)) // partial garbage tail
      frames.toArray.flatten ++ tail
    }
    val df = bufs.map(Tuple1(_)).toDF("buf")
    val got = df.select(codecs.frame_split($"buf").as("fs")).as[Seq[Array[Byte]]].collect()
    bufs.zip(got).foreach { case (buf, frames) =>
      val expected = drain(buf)._1
      assert(frames.length == expected.length)
      frames.zip(expected).foreach { case (f, e) =>
        assert(decodeOne(f, 0).get.body.toSeq == e.body.toSeq)
      }
    }
  }

  test("whole-stage codegen stays enabled for codec projections") {
    // parquet-backed input: literals would constant-fold to a LocalTableScan
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select(codecs.encode_heartbeat(col("user_id"), col("event_id"), unix_millis(col("ts"))).as("frame"))
      .select(codecs.hb_client_id(col("frame")).as("c"), codecs.frame_type(col("frame")).as("t"))
    val codegenNodes = ev.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenNodes.nonEmpty, s"expected codegen in:\n${ev.queryExecution.executedPlan}")
  }

  test("encode UDFs produce reference layout (type ids handler.cpp:46-49)") {
    import spark.implicits._
    val df = Seq((5L, 6L, 7L)).toDF("c", "s", "t")
      .select(codecs.encode_heartbeat($"c", $"s", $"t").as("f"))
    val bytes = df.as[Array[Byte]].collect()(0)
    assert(decodeOne(bytes, 0).get.msgType == Telemetry.TypeHeartbeat)
    assert(decodeHeartbeat(decodeOne(bytes, 0).get.body) == Heartbeat(5, 6, 7))
  }

  test("pcm_frames: exact per-frame rms/mean, tail dropped, null-safe") {
    import spark.implicits._
    // "abcdefgh" + "ij" tail (dropped at frameSize=8): bytes 97..104
    val s = "abcdefghij"
    val expSum = (97 to 104).map(_.toLong).sum
    val expSq = (97 to 104).map(x => x.toLong * x).sum
    val rows = Seq(Some(s), Some("abc"), None)
      .toDF("t")
      .select(codecs.pcm_frames(encode(col("t"), "UTF-8"), 8).as("f"))
      .collect()
    val frames = rows(0).getSeq[org.apache.spark.sql.Row](0)
    assert(frames.length == 1, "incomplete tail must be dropped")
    assert(frames.head.getDouble(0) == math.sqrt(expSq.toDouble / 8))
    assert(frames.head.getDouble(1) == expSum.toDouble / 8)
    assert(rows(1).getSeq[org.apache.spark.sql.Row](0).isEmpty, "short content -> no frames")
    assert(rows(2).isNullAt(0), "null content -> null")
    // parquet-backed: the kernel must stay inside whole-stage codegen
    val plan = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(codecs.pcm_frames(encode(col("text"), "UTF-8"), 8).as("f"))
    val codegen = plan.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.nonEmpty, s"expected codegen in:\n${plan.queryExecution.executedPlan}")
  }

  test("audioSegments: exact gaps-and-islands over a planted silence run") {
    import spark.implicits._
    // 8 chars 'a' (rms 97) | 8 spaces (rms 32) | 16 chars 'b' (rms 98)
    val content = "a" * 8 + " " * 8 + "b" * 16
    val media = Seq((1L, content)).toDF("doc_id", "t")
      .select(col("doc_id"), encode(col("t"), "UTF-8").as("content"))
    val segs = graft.operators.Multimodal
      .audioSegments(media, frameSize = 8, silenceRms = 80.0)
      .orderBy(col("seg_idx"))
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5)))
    assert(segs.toSeq == Seq((0, 0, 0, 1L, 97.0), (1, 2, 3, 2L, 98.0)))
  }

  test("broadcastBloom: members always hit, fpp holds, empty input -> None, codegen probe") {
    import spark.implicits._
    import graft.functions.sketch
    val members = (0L until 5000L).toDF("h")
    val bf = sketch.broadcastBloom(members, col("h"), expectedItems = 5000L, fpp = 0.01).get
    // no false negatives, ever
    val misses = members.filter(!sketch.might_contain_bc(bf, col("h"))).count()
    assert(misses == 0, s"bloom false negatives: $misses")
    // false-positive rate near nominal on a disjoint probe set
    val fp = (1000000L until 1020000L).toDF("h")
      .filter(sketch.might_contain_bc(bf, col("h"))).count()
    assert(fp < 20000 * 0.05, s"fpp blowout: $fp / 20000")
    // null hashes are not probed (nullIntolerant)
    val withNull = Seq(Some(1L), None).toDF("h")
    val probed = withNull.select(sketch.might_contain_bc(bf, col("h")).as("m")).collect()
    assert(probed(0).getBoolean(0) && probed(1).isNullAt(0))
    assert(sketch.broadcastBloom(members.filter(col("h") < 0), col("h"), 10L).isEmpty)
  }

  test("deflate_len: repetitive text compresses far below natural; deterministic; null-safe") {
    import spark.implicits._
    val rep = Seq.fill(40)("spam").mkString(" ")
    val nat = (0 until 40).map(i => s"tok${i * 7919 % 1000}x$i").mkString(" ")
    val rows = Seq(Some(rep), Some(nat), None)
      .toDF("t")
      .select(
        codecs.deflate_len(encode(col("t"), "UTF-8")).as("n"),
        octet_length(col("t")).as("raw")
      )
      .collect()
    val repRatio = rows(0).getInt(0).toDouble / rows(0).getInt(1)
    val natRatio = rows(1).getInt(0).toDouble / rows(1).getInt(1)
    assert(repRatio < 0.2 && natRatio > 0.3, s"ratios: $repRatio vs $natRatio")
    assert(rows(2).isNullAt(0))
    // determinism across evaluations (pooled deflater reset per call)
    val again = Seq(rep).toDF("t")
      .select(codecs.deflate_len(encode(col("t"), "UTF-8"))).collect().head.getInt(0)
    assert(again == rows(0).getInt(0))
  }
}
