package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import graft.model.Telemetry

/** Column-level binary codecs for the telemetry wire format
  * (svc/svc/handler.cpp:23-95): native Catalyst expressions with codegen so
  * frame decode stays inside WholeStageCodegen — the hot path of the
  * reference's pipeline (O-8/O-9 in SURVEY.md §2.2).
  */
object codecs {

  private[functions] def col(e: Expression): Column = Bridge.column(e)
  private[functions] def expr(c: Column): Expression = Bridge.expression(c)

  /** Little-endian u16 read at fixed `offset` of a binary column → Int.
    * Null when the buffer is too short (mirrors the reference's
    * wait-for-more-bytes protocol, handler.cpp:99-102).
    */
  case class LeU16(child: Expression, offset: Int)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[Array[Byte]]
      if (b.length < offset + 2) null
      else (b(offset) & 0xff) | ((b(offset + 1) & 0xff) << 8)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        b => s"""
          |if ($b.length < ${offset + 2}) { ${ev.isNull} = true; }
          |else { ${ev.value} = ($b[$offset] & 0xff) | (($b[${offset + 1}] & 0xff) << 8); }
          |""".stripMargin
      )
    override protected def withNewChildInternal(c: Expression): LeU16 = copy(child = c)
  }

  /** Little-endian i64 read at fixed `offset` of a binary column → Long.
    * The reference's u64 fields (client_id/sequence/timestamp,
    * handler.cpp:64-78) land in Long; values ≥ 2^63 wrap (documented edge,
    * SURVEY.md §7.4).
    */
  case class LeI64(child: Expression, offset: Int)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[Array[Byte]]
      if (b.length < offset + 8) null
      else {
        var r = 0L
        var i = 7
        while (i >= 0) { r = (r << 8) | (b(offset + i) & 0xffL); i -= 1 }
        r
      }
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        b => {
          val terms = (0 until 8)
            .map(i => s"(($b[${offset + i}] & 0xffL) << ${8 * i})")
            .mkString(" | ")
          s"""
          |if ($b.length < ${offset + 8}) { ${ev.isNull} = true; }
          |else { ${ev.value} = $terms; }
          |""".stripMargin
        }
      )
    override protected def withNewChildInternal(c: Expression): LeI64 = copy(child = c)
  }

  /** Split a byte buffer into complete `[u16 len][u16 type][body]` frames →
    * array&lt;binary&gt; of whole frames; incomplete trailing bytes are
    * dropped (batch twin of the reference's drain loop, tcp.cpp:128-139).
    */
  case class FrameSplit(child: Expression)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(BinaryType)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val buf = v.asInstanceOf[Array[Byte]]
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var off = 0
      var ok = true
      while (ok && buf.length - off >= Telemetry.HeaderSize) {
        val len = (buf(off) & 0xff) | ((buf(off + 1) & 0xff) << 8)
        if (len < Telemetry.HeaderSize || buf.length - off < len) ok = false
        else {
          out += java.util.Arrays.copyOfRange(buf, off, off + len)
          off += len
        }
      }
      new GenericArrayData(out.toArray)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        b => {
          val lst = ctx.freshName("frames")
          val off = ctx.freshName("off")
          val len = ctx.freshName("len")
          s"""
          |java.util.ArrayList<byte[]> $lst = new java.util.ArrayList<byte[]>();
          |int $off = 0;
          |while ($b.length - $off >= ${Telemetry.HeaderSize}) {
          |  int $len = ($b[$off] & 0xff) | (($b[$off + 1] & 0xff) << 8);
          |  if ($len < ${Telemetry.HeaderSize} || $b.length - $off < $len) break;
          |  $lst.add(java.util.Arrays.copyOfRange($b, $off, $off + $len));
          |  $off += $len;
          |}
          |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lst.toArray());
          |""".stripMargin
        }
      )
    override protected def withNewChildInternal(c: Expression): FrameSplit = copy(child = c)
  }

  /** Kafka headers (`array<struct<key:string, value:binary>>`) → the
    * envelope's `map<string,string>` properties in ONE linear pass.
    * Kafka headers are an ordered MULTI-map: duplicate keys keep the FIRST
    * occurrence (the reference's unordered_map insert semantics,
    * kafka.hpp:862-880), null keys are skipped (a raw `map_from_entries`
    * throws on either, turning one poison-pill record into a permanently
    * wedged streaming query), and null header values stay null map values.
    * Native expression because the HOF formulation was O(h²) per record
    * with every lambda evaluated interpreted — this is the per-record hot
    * path of the Kafka ingress (O-1).
    */
  case class KafkaHeadersToMap(child: Expression)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(
      ArrayType(
        StructType(
          Seq(StructField("key", StringType), StructField("value", BinaryType))
        )
      )
    )
    override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = true)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      codecs.firstWinsHeaders(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        h => s"${ev.value} = graft.functions.codecs.firstWinsHeaders($h);"
      )
    override protected def withNewChildInternal(c: Expression): KafkaHeadersToMap =
      copy(child = c)
  }

  /** Shared kernel of [[KafkaHeadersToMap]] (called from both eval and the
    * generated code): one pass, first-wins on duplicate keys, null keys
    * skipped, binary values decoded as UTF-8.
    */
  def firstWinsHeaders(
      arr: org.apache.spark.sql.catalyst.util.ArrayData
  ): org.apache.spark.sql.catalyst.util.MapData = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](math.max(4, n))
    val keys = new scala.collection.mutable.ArrayBuffer[Any](n)
    val vals = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0)) {
          val k = row.getUTF8String(0)
          if (seen.add(k)) {
            keys += k
            vals += (if (row.isNullAt(1))
                       null
                     else
                       org.apache.spark.unsafe.types.UTF8String
                         .fromBytes(row.getBinary(1)))
          }
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys.toArray, vals.toArray)
  }

  // ---- public Column API -------------------------------------------------

  /** Kafka headers array → first-wins properties map ([[KafkaHeadersToMap]]). */
  def kafka_headers_map(c: Column): Column = col(KafkaHeadersToMap(expr(c)))

  /** LE u16 at `offset` (frame `len` at 0, `type` at 2). */
  def le_u16(c: Column, offset: Int): Column = col(LeU16(expr(c), offset))

  /** LE 64-bit at `offset`. */
  def le_i64(c: Column, offset: Int): Column = col(LeI64(expr(c), offset))

  /** Complete frames in a buffer, as array&lt;binary&gt;. */
  def frame_split(c: Column): Column = col(FrameSplit(expr(c)))

  /** Frame type field (`u16` at offset 2, handler.cpp:42-62). */
  def frame_type(frame: Column): Column = le_u16(frame, Telemetry.LengthPrefixSize)

  /** Frame length field (`u16` at offset 0). */
  def frame_len(frame: Column): Column = le_u16(frame, 0)

  /** Heartbeat fields from a WHOLE frame (body offsets 0/8/16 shifted past
    * the 4-byte header, handler.cpp:64-78).
    */
  def hb_client_id(frame: Column): Column = le_i64(frame, Telemetry.HeaderSize)
  def hb_sequence(frame: Column): Column = le_i64(frame, Telemetry.HeaderSize + 8)
  def hb_timestamp(frame: Column): Column = le_i64(frame, Telemetry.HeaderSize + 16)

  // ---- encode side (also codegen'd: the simulator O-4 and the bench
  // pipeline run encode per message, so it is a hot path too) -------------

  /** Native heartbeat-frame builder (sim.cpp:36-48): 28-byte frame,
    * LE u16 len=28, u16 type=0, then client/sequence/timestamp as LE i64.
    */
  case class HeartbeatEncode(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(c: Any, s: Any, t: Any): Any =
      Telemetry.encodeHeartbeat(
        Telemetry.Heartbeat(c.asInstanceOf[Long], s.asInstanceOf[Long], t.asInstanceOf[Long])
      )
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        (c, s, t) => {
          val out = ctx.freshName("hb")
          val fill = (v: String, base: Int) =>
            (0 until 8).map(i => s"$out[${base + i}] = (byte) ($v >>> ${8 * i});").mkString(" ")
          s"""
          |byte[] $out = new byte[28];
          |$out[0] = 28; $out[1] = 0; $out[2] = 0; $out[3] = 0;
          |${fill(c, 4)}
          |${fill(s, 12)}
          |${fill(t, 20)}
          |${ev.value} = $out;
          |""".stripMargin
        }
      )
    override protected def withNewChildrenInternal(
        f: Expression,
        s: Expression,
        t: Expression
    ): HeartbeatEncode = copy(first = f, second = s, third = t)
  }

  /** Native dyn_message-frame builder: `[u16 len][u16 type=1][payload]`;
    * throws on frames over 65535 bytes like the pure-Scala codec.
    */
  case class DynEncode(child: Expression)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      Telemetry.encodeFrame(Telemetry.TypeDynMessage, v.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        p => {
          val out = ctx.freshName("dyn")
          val len = ctx.freshName("len")
          s"""
          |int $len = $p.length + 4;
          |if ($len > 0xffff) throw new IllegalArgumentException("frame too large: " + $len);
          |byte[] $out = new byte[$len];
          |$out[0] = (byte) $len; $out[1] = (byte) ($len >>> 8);
          |$out[2] = 1; $out[3] = 0;
          |System.arraycopy($p, 0, $out, 4, $p.length);
          |${ev.value} = $out;
          |""".stripMargin
        }
      )
    override protected def withNewChildInternal(c: Expression): DynEncode = copy(child = c)
  }

  /** Per-frame PCM features over a byte plane: treat the binary as
    * unsigned-8-bit samples, cut into complete `frameSize`-byte frames
    * (incomplete tail dropped — the [[FrameSplit]] convention), and emit
    * per frame `struct<rms: double, mean: double>`. Accumulation is
    * INTEGER (Σx and Σx² as longs — exact and order-free), the divide and
    * sqrt are IEEE-correctly-rounded, so every engine replays the doubles
    * bit-for-bit. One JIT'd pass per row, zero allocation beyond the
    * output arrays — the audio twin of the image byte-plane kernels: on a
    * real pipeline the input is the decoded PCM plane; here it runs on
    * whatever bytes the stub environment provides, and swapping the
    * decoder changes no plan shape.
    */
  case class PcmFrames(child: Expression, frameSize: Int)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(
      StructType(
        Seq(
          StructField("rms", DoubleType, nullable = false),
          StructField("mean", DoubleType, nullable = false),
          // exact integer state (Σx², Σx): order-free, so downstream
          // aggregates (segment RMS over many frames) stay bit-exact in
          // any engine — avg-of-rounded-rms would not (measured: 6dp
          // midpoint flips on multi-frame segments)
          StructField("sum_sq", LongType, nullable = false),
          StructField("sum", LongType, nullable = false)
        )
      ),
      containsNull = false
    )
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[Array[Byte]]
      val n = b.length / frameSize
      val out = new Array[Any](n)
      var f = 0
      while (f < n) {
        var sum = 0L
        var sumSq = 0L
        var i = f * frameSize
        val end = i + frameSize
        while (i < end) {
          val x = (b(i) & 0xff).toLong
          sum += x
          sumSq += x * x
          i += 1
        }
        out(f) = org.apache.spark.sql.catalyst.InternalRow(
          math.sqrt(sumSq.toDouble / frameSize),
          sum.toDouble / frameSize,
          sumSq,
          sum
        )
        f += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        b => {
          val n = ctx.freshName("nFrames")
          val rows = ctx.freshName("rows")
          val f = ctx.freshName("f")
          val i = ctx.freshName("i")
          val end = ctx.freshName("end")
          val sum = ctx.freshName("sum")
          val sumSq = ctx.freshName("sumSq")
          val x = ctx.freshName("x")
          val row = ctx.freshName("row")
          s"""
          |int $n = $b.length / $frameSize;
          |Object[] $rows = new Object[$n];
          |for (int $f = 0; $f < $n; $f++) {
          |  long $sum = 0L; long $sumSq = 0L;
          |  int $i = $f * $frameSize; int $end = $i + $frameSize;
          |  for (; $i < $end; $i++) {
          |    long $x = (long) ($b[$i] & 0xff);
          |    $sum += $x; $sumSq += $x * $x;
          |  }
          |  org.apache.spark.sql.catalyst.expressions.GenericInternalRow $row =
          |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4);
          |  $row.update(0, Double.valueOf(Math.sqrt((double) $sumSq / $frameSize)));
          |  $row.update(1, Double.valueOf((double) $sum / $frameSize));
          |  $row.update(2, Long.valueOf($sumSq));
          |  $row.update(3, Long.valueOf($sum));
          |  $rows[$f] = $row;
          |}
          |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
          |""".stripMargin
        }
      )
    override protected def withNewChildInternal(c: Expression): PcmFrames = copy(child = c)
  }

  /** [[PcmFrames]] over SIGNED LITTLE-ENDIAN 16-BIT samples — the real-
    * audio form: the binary is a decoded PCM16LE plane (the
    * [[graft.operators.Multimodal.decodeWav]] output layout, also WAV's
    * own data-chunk layout), `frameSize` counts SAMPLES (2 bytes each,
    * channels interleaved), and the per-frame stats accumulate the signed
    * sample values exactly in longs (Σx can be negative; Σx² ≤ 2³⁰·n
    * never overflows below 2³³ samples/frame). Incomplete tails —
    * including a dangling odd byte — drop, the [[FrameSplit]] convention.
    */
  case class Pcm16Frames(child: Expression, frameSize: Int)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    // same shape as PcmFrames so callers can branch between the two
    override val dataType: DataType = ArrayType(
      StructType(
        Seq(
          StructField("rms", DoubleType, nullable = false),
          StructField("mean", DoubleType, nullable = false),
          StructField("sum_sq", LongType, nullable = false),
          StructField("sum", LongType, nullable = false)
        )
      ),
      containsNull = false
    )
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[Array[Byte]]
      val n = (b.length / 2) / frameSize
      val out = new Array[Any](n)
      var f = 0
      while (f < n) {
        var sum = 0L
        var sumSq = 0L
        var i = f * frameSize
        val end = i + frameSize
        while (i < end) {
          val x = ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toLong
          sum += x
          sumSq += x * x
          i += 1
        }
        out(f) = org.apache.spark.sql.catalyst.InternalRow(
          math.sqrt(sumSq.toDouble / frameSize),
          sum.toDouble / frameSize,
          sumSq,
          sum
        )
        f += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        b => {
          val n = ctx.freshName("nFrames")
          val rows = ctx.freshName("rows")
          val f = ctx.freshName("f")
          val i = ctx.freshName("i")
          val end = ctx.freshName("end")
          val sum = ctx.freshName("sum")
          val sumSq = ctx.freshName("sumSq")
          val x = ctx.freshName("x")
          val row = ctx.freshName("row")
          s"""
          |int $n = ($b.length / 2) / $frameSize;
          |Object[] $rows = new Object[$n];
          |for (int $f = 0; $f < $n; $f++) {
          |  long $sum = 0L; long $sumSq = 0L;
          |  int $i = $f * $frameSize; int $end = $i + $frameSize;
          |  for (; $i < $end; $i++) {
          |    long $x = (long) ((short) (($b[2 * $i] & 0xff) | ($b[2 * $i + 1] << 8)));
          |    $sum += $x; $sumSq += $x * $x;
          |  }
          |  org.apache.spark.sql.catalyst.expressions.GenericInternalRow $row =
          |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4);
          |  $row.update(0, Double.valueOf(Math.sqrt((double) $sumSq / $frameSize)));
          |  $row.update(1, Double.valueOf((double) $sum / $frameSize));
          |  $row.update(2, Long.valueOf($sumSq));
          |  $row.update(3, Long.valueOf($sum));
          |  $rows[$f] = $row;
          |}
          |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
          |""".stripMargin
        }
      )
    override protected def withNewChildInternal(c: Expression): Pcm16Frames = copy(child = c)
  }

  /** Heartbeat frame from (client_id, sequence, timestamp) columns. */
  def encode_heartbeat(c: Column, s: Column, t: Column): Column =
    col(HeartbeatEncode(expr(c.cast("long")), expr(s.cast("long")), expr(t.cast("long"))))

  /** dyn_message frame (type=1) from raw payload bytes. */
  def encode_dyn(payload: Column): Column = col(DynEncode(expr(payload)))

  /** Per-frame PCM features (rms, mean) over a binary byte plane. */
  def pcm_frames(bin: Column, frameSize: Int): Column = col(PcmFrames(expr(bin), frameSize))

  /** Per-frame PCM features over signed little-endian 16-bit samples;
    * `frameSize` counts samples, not bytes.
    */
  def pcm16_frames(bin: Column, frameSize: Int): Column = col(Pcm16Frames(expr(bin), frameSize))

  /** DEFLATE-compressed length of a binary column — the compression-ratio
    * quality signal (Gopher/RefinedWeb-style): highly repetitive or
    * templated documents compress far below natural text, and
    * `deflate_len(b) / octet_length(b)` separates them with no model.
    * Level is fixed (and part of the semantics) so the value is
    * deterministic for a given zlib; it is NOT an engine-portable number
    * (no DuckDB twin), so oracle checks gate on planted-separation
    * booleans, never on raw lengths. Runs one JIT'd static call per row;
    * each thread reuses a pooled `Deflater` (they are expensive to
    * allocate and not thread-safe).
    */
  case class DeflateLen(child: Expression, level: Int = 6)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    require(level >= 1 && level <= 9, s"level must be in [1, 9], got $level")
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      codecs.deflateLen(v.asInstanceOf[Array[Byte]], level)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        b => s"${ev.value} = graft.functions.codecs.deflateLen($b, $level);"
      )
    override protected def withNewChildInternal(c: Expression): DeflateLen = copy(child = c)
  }

  private val deflaters = new ThreadLocal[java.util.zip.Deflater]()

  /** Static kernel behind [[DeflateLen]] (called from generated code). */
  def deflateLen(b: Array[Byte], level: Int): Int = {
    var d = deflaters.get()
    if (d == null) {
      d = new java.util.zip.Deflater(level, true)
      deflaters.set(d)
    }
    d.reset()
    d.setLevel(level)
    d.setInput(b)
    d.finish()
    val buf = new Array[Byte](math.max(64, b.length + (b.length >> 1) + 16))
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** DEFLATE length of a binary column (compression-ratio signal). */
  def deflate_len(bin: Column, level: Int = 6): Column = col(DeflateLen(expr(bin), level))
}
