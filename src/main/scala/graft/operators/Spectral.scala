package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Second-moment statistics and principal directions of an embedding
  * column — the decorrelation/whitening prep of an embedding pipeline:
  * anisotropic embedding spaces (the common case for LM encoders) inflate
  * cosine similarities along dominant directions, so SemDeDup-style gates
  * ([[Similarity.semanticDedup]]) and ANN recall both improve when the
  * corpus is centered and the top components are known. Part of the
  * beyond-reference LLM-pipeline surface (builder prompt).
  *
  * 100 TB shape: [[gramMatrix]] is the only corpus-scale pass — a
  * dim²-way explode that aggregates MAP-SIDE, so the one exchange carries
  * `dim(dim+1)/2 × partitions` rows (model state, not corpus state); at
  * dim 64 that is 2080 rows per partition. Everything downstream
  * ([[topComponent]], whitening math) runs on the collected dim×dim
  * matrix — KBs, the same bounded-model-state contract as
  * [[Similarity.ivfTrain]]'s centroid table. For dim ≥ ~1k the explode
  * constant (dim² rows scanned per vector) dominates; the documented
  * upgrade is a vector-outer-product `Aggregator` fusing the explode and
  * the partial agg into one array-state pass — the relational shape here
  * is exchange-optimal already, the Aggregator only saves scan CPU.
  */
object Spectral {

  /** Upper-triangle gram matrix Σ xᵢxⱼ of a (nullable-free) vector column:
    * `(i, j, n_vecs, g)` for j ≥ i, components widened to double BEFORE
    * multiply (float multiply then widen would lose bits and diverge from
    * any double-math oracle). Unrounded — callers that need
    * engine-portable output round at the edge.
    */
  def gramMatrix(df: DataFrame, vecCol: Column): DataFrame =
    df.filter(vecCol.isNotNull)
      .select(transform(vecCol, _.cast("double")).as("__v"))
      .select(posexplode(col("__v")).as(Seq("i", "xi")), col("__v"))
      .select(col("i"), col("xi"), posexplode(col("__v")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("xi") * col("xj")).as("g"))

  /** Collect the gram matrix as a symmetric dim×dim array — BOUNDED model
    * state (dim² doubles; 32 KB at dim 64), the documented-safe collect.
    */
  def gramToMatrix(gram: DataFrame): Array[Array[Double]] = {
    val entries = gram
      .select(col("i").cast("int"), col("j").cast("int"), col("g").cast("double"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    require(
      entries.nonEmpty,
      "gramToMatrix: empty gram (no rows, or every vector was null) — nothing to collect"
    )
    val dim = entries.iterator.map(_._2).max + 1
    val m = Array.fill(dim, dim)(0.0)
    entries.foreach { case (i, j, g) => m(i)(j) = g; m(j)(i) = g }
    m
  }

  /** Dominant eigenvector of a symmetric PSD matrix by deterministic power
    * iteration (driver math on bounded model state — the gram matrix is
    * KBs). Start vector is the normalized all-ones vector, so the result
    * is reproducible run to run; sign is fixed by making the
    * largest-magnitude component positive. Gram matrices of real data
    * have a spectral gap, so `iters` ≈ 50 converges far past float
    * precision; a start vector exactly orthogonal to the top eigenvector
    * never arises with all-ones on data-derived grams (it would require
    * the eigenvector's components to sum to exactly 0).
    */
  def topComponent(m: Array[Array[Double]], iters: Int = 50): Array[Double] = {
    val dim = m.length
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }
        s
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      require(norm > 0, "power iteration collapsed: zero matrix")
      v = w.map(_ / norm)
      it += 1
    }
    val pivot = v.indices.maxBy(i => math.abs(v(i)))
    if (v(pivot) < 0) v.map(x => -x) else v
  }

  /** Engine-replayable [[topComponent]] twin: FIXED iteration count and a
    * 6dp round of the normalized vector (and its norm) after every step,
    * so any SQL engine unrolling the same iterations over the same
    * (6dp-rounded) gram entries reproduces the identical vector — the
    * x126 pre-rounding discipline applied to an iterative driver-side
    * model fit. [[topComponent]] (50 unrounded iterations) remains the
    * production fit; this is the oracle-checkable surface (x164).
    */
  def topComponentReplay(m: Array[Array[Double]], iters: Int, dp: Int = 6): Array[Double] = {
    val dim = m.length
    val scale = math.pow(10, dp.toDouble)
    def r(x: Double): Double = math.rint(x * scale) / scale
    var v = Array.fill(dim)(r(1.0 / math.sqrt(dim.toDouble)))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }
        s
      }
      val norm = r(math.sqrt(w.map(x => x * x).sum))
      require(norm > 0, "power iteration collapsed: zero matrix")
      v = w.map(x => r(x / norm))
      it += 1
    }
    val pivot = v.indices.maxBy(i => math.abs(v(i))) // first max = smallest i on ties
    if (v(pivot) < 0) v.map(x => -x) else v
  }

  /** Rayleigh quotient vᵀMv — the eigenvalue estimate for [[topComponent]]
    * (equals the variance captured along v when M is a gram/covariance).
    */
  def rayleigh(m: Array[Array[Double]], v: Array[Double]): Double = {
    val dim = m.length
    var s = 0.0
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) { s += v(i) * m(i)(j) * v(j); j += 1 }
      i += 1
    }
    s
  }

  /** Per-row projection onto a fixed direction — the direction rides the
    * plan as a LITERAL array and the dot product is the native codegen
    * [[graft.functions.vector.dot]] kernel (HOF lambdas run interpreted —
    * the r1 measurement): zero shuffle, one pass. Used to strip or
    * inspect the dominant component before cosine gating.
    */
  def projectOnto(df: DataFrame, vecCol: Column, direction: Array[Double]): DataFrame =
    df.withColumn(
      "proj",
      graft.functions.vector.dot(transform(vecCol, _.cast("double")), lit(direction))
    )
}
