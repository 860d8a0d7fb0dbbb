package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector math under the ANN/dedup
  * operators ([[graft.operators.Similarity]]). The higher-order-function
  * formulations (`aggregate(zip_with(...))`) evaluate their lambdas
  * interpreted, one closure call per element; these run as tight JIT'd
  * loops over `ArrayData` and stay inside WholeStageCodegen. The fused
  * cosine does one pass for dot + both norms instead of three traversals.
  *
  * Numeric contract: identical fold order (sequential, double accumulator)
  * to the HOF versions, so results are bit-equal and the DuckDB oracles and
  * recall tests are unaffected — for DENSE arrays. A NULL array element
  * reads as 0.0 here (ArrayData.getDouble), where the HOF twins propagate
  * NULL: these kernels assume validated dense embeddings (what every
  * caller in this repo guarantees); keep the HOF formulation if you need
  * per-element NULL propagation.
  */
object vector {

  /** dot(a, b): Σ a_i·b_i over min(len) — one pass, double accumulator. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0d
      var i = 0
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
      s
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        (a, b) => {
          val n = ctx.freshName("n")
          val i = ctx.freshName("i")
          val s = ctx.freshName("s")
          s"""
          |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          |double $s = 0.0;
          |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
          |${ev.value} = $s;
          |""".stripMargin
        }
      )
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** Fused cosine similarity: dot/(√Σa²·√Σb²) in ONE pass over both arrays
    * (the HOF twin traverses three times). Same expression order as
    * `dot / (sqrt(na) * sqrt(nb))` so results are bit-equal.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0d
      var na = 0.0d
      var nb = 0.0d
      var i = 0
      while (i < n) {
        val x = a.getDouble(i)
        val y = b.getDouble(i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        (a, b) => {
          val n = ctx.freshName("n")
          val i = ctx.freshName("i")
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          val x = ctx.freshName("x")
          val y = ctx.freshName("y")
          s"""
          |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          |for (int $i = 0; $i < $n; $i++) {
          |  double $x = $a.getDouble($i); double $y = $b.getDouble($i);
          |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          |}
          |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          |""".stripMargin
        }
      )
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  /** Squared L2 distance: Σ (a_i−b_i)² — one pass. */
  case class L2Sq(left: Expression, right: Expression)
      extends BinaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0d
      var i = 0
      while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
      s
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        (a, b) => {
          val n = ctx.freshName("n")
          val i = ctx.freshName("i")
          val s = ctx.freshName("s")
          val d = ctx.freshName("d")
          s"""
          |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          |double $s = 0.0;
          |for (int $i = 0; $i < $n; $i++) {
          |  double $d = $a.getDouble($i) - $b.getDouble($i); $s += $d * $d;
          |}
          |${ev.value} = $s;
          |""".stripMargin
        }
      )
    override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq =
      copy(left = l, right = r)
  }

  /** Random-hyperplane signature (Charikar '02): bit b = sign(Σ_j v_j·h_bj),
    * h_bj = xxhash64(b, j)/Long.MaxValue — the SAME plane values as the HOF
    * formulation in round 1 (xxhash64 chains seed 42 → hashInt(b) →
    * hashInt(j)), so signatures are bit-identical. The plane matrix depends
    * only on (bits, dim): it is precomputed once per task on first row and
    * reused, turning O(bits·dim) hash calls per ROW into O(bits·dim)
    * multiply-adds per row.
    */
  case class HyperplaneSig(child: Expression, bits: Int)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    // cache is published atomically as one immutable (dim, matrix) pair via
    // a single volatile field: concurrent evaluators (driver-side
    // interpreted eval, mixed-dimension rows) each read a consistent pair
    // or rebuild locally — never a matrix for the wrong dimension or a
    // half-published array
    @transient @volatile private var cached: (Int, Array[Array[Double]]) = _

    private def planesFor(dim: Int): Array[Array[Double]] = {
      val c = cached
      if (c != null && c._1 == dim) c._2
      else {
        val m = Array.ofDim[Double](bits, dim)
        var b = 0
        while (b < bits) {
          val seedB = XXH64.hashInt(b, 42L)
          var j = 0
          while (j < dim) {
            m(b)(j) = XXH64.hashInt(j, seedB).toDouble / Long.MaxValue.toDouble
            j += 1
          }
          b += 1
        }
        cached = (dim, m)
        m
      }
    }

    /** Invoked from both eval and generated code. */
    def compute(v: ArrayData): Long = {
      val dim = v.numElements()
      val m = planesFor(dim)
      var sig = 0L
      var b = 0
      while (b < bits) {
        val row = m(b)
        var proj = 0.0d
        var j = 0
        while (j < dim) { proj += v.getDouble(j) * row(j); j += 1 }
        if (proj >= 0) sig |= 1L << b
        b += 1
      }
      sig
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSig].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneSig = copy(child = c)
  }

  /** The `n` nearest centroid ids for a vector — the per-row hot loop of
    * IVF cell assignment ([[graft.operators.Similarity.ivfTopK]]). The
    * HOF formulation (`slice(array_sort(transform(typedlit(cents), ...)))`)
    * evaluates its lambda INTERPRETED once per centroid per row and
    * allocates a struct per cell; this computes all nlist distances and
    * the top-n selection in one JIT'd loop with zero allocation beyond the
    * result ids. Ordering contract matches the struct-sort exactly:
    * ascending (distance, cell id), NaN last (Double.compare semantics),
    * distances over min(dim, centroid length) like [[L2Sq]].
    */
  case class NearestCells(child: Expression, cents: Seq[Seq[Double]], n: Int)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    require(n >= 1, s"need n >= 1, got $n")
    require(cents.nonEmpty, "need at least one centroid")
    // like the slice() formulation it replaced, asking for more cells than
    // exist returns what exists (a corpus smaller than nprobe must degrade,
    // not throw)
    private val topN = math.min(n, cents.length)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    @transient private lazy val matrix: Array[Array[Double]] =
      cents.map(_.toArray).toArray

    /** Invoked from both eval and generated code. */
    def compute(v: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
      val m = matrix
      val dim = v.numElements()
      val bestD = new Array[Double](topN)
      val bestId = new Array[Int](topN)
      var filled = 0
      var j = 0
      while (j < m.length) {
        val c = m(j)
        val len = math.min(dim, c.length)
        var d = 0.0d
        var i = 0
        while (i < len) { val x = v.getDouble(i) - c(i); d += x * x; i += 1 }
        // insertion position by (d, id) ascending, NaN sorted last
        var pos = if (filled < topN) filled else -1
        if (pos == -1 && java.lang.Double.compare(d, bestD(topN - 1)) < 0) pos = topN - 1
        if (pos >= 0) {
          while (pos > 0 && java.lang.Double.compare(bestD(pos - 1), d) > 0) {
            bestD(pos) = bestD(pos - 1); bestId(pos) = bestId(pos - 1); pos -= 1
          }
          bestD(pos) = d
          bestId(pos) = j
          if (filled < topN) filled += 1
        }
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(bestId, filled)
      )
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
    }
    override protected def withNewChildInternal(c: Expression): NearestCells = copy(child = c)
  }

  /** Symmetric int8 quantization: `scale = max|v|/127`,
    * `q_i = floor(v_i/scale + 0.5)` — one pass for max|v|, one for the
    * quantized array, in a JIT'd loop. The HOF twin
    * ([[graft.operators.Similarity.quantizeInt8Declarative]]) evaluates
    * FOUR interpreted lambda traversals per row (cast, abs-max, quantize,
    * and the when() per element); this is the same arithmetic in the same
    * order — `v_i / (maxAbs/127.0)`, never a multiply by the inverse — so
    * quantized longs are bit-equal cross-engine (the x32 DuckDB oracle
    * spells the identical expression). Empty array → (null, null, []) like
    * `array_max(empty)`; dense-array assumption as the other kernels.
    */
  case class QuantizeInt8(child: Expression)
      extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = StructType(
      Seq(
        StructField("scale", DoubleType),
        StructField("max_abs", DoubleType),
        StructField("q", ArrayType(LongType, containsNull = false), nullable = false)
      )
    )
    override def nullIntolerant: Boolean = true

    /** Invoked from both eval and generated code. */
    def compute(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
      val n = v.numElements()
      if (n == 0) {
        return org.apache.spark.sql.catalyst.InternalRow(
          null,
          null,
          new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
        )
      }
      var maxAbs = 0.0d
      var i = 0
      while (i < n) {
        val a = java.lang.Math.abs(v.getDouble(i))
        // Double.compare so a NaN component wins like array_max's ordering
        if (java.lang.Double.compare(a, maxAbs) > 0) maxAbs = a
        i += 1
      }
      val q = new Array[Long](n)
      var scale = 0.0d
      if (maxAbs != 0.0d) {
        scale = maxAbs / 127.0d
        i = 0
        while (i < n) {
          q(i) = java.lang.Math.floor(v.getDouble(i) / scale + 0.5d).toLong
          i += 1
        }
      }
      org.apache.spark.sql.catalyst.InternalRow(
        scale,
        maxAbs,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(q)
      )
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("quantizeInt8", this, classOf[QuantizeInt8].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
    }
    override protected def withNewChildInternal(c: Expression): QuantizeInt8 = copy(child = c)
  }

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Sq(Bridge.expression(a), Bridge.expression(b)))
  def hyperplane_sig(v: Column, bits: Int): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(v), bits))
  def nearest_cells(v: Column, cents: Seq[Seq[Double]], n: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(v), cents, n))
  def quantize_int8(v: Column): Column =
    Bridge.column(QuantizeInt8(Bridge.expression(v)))
}
