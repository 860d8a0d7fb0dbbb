package graft

import org.apache.spark.sql.functions._

import graft.operators.Spectral

class SpectralSpec extends SparkTestBase {
  import spark.implicits._

  test("gramMatrix equals the driver-computed second moment exactly-ish") {
    val vecs = Seq(
      Array(1.0f, 2.0f, 3.0f),
      Array(-1.0f, 0.5f, 2.0f),
      Array(0.0f, -2.0f, 1.5f),
      Array(4.0f, 0.25f, -0.5f)
    )
    val df = vecs.map(v => Tuple1(v)).toDF("v")
    val got = Spectral
      .gramMatrix(df, col("v"))
      .as[(Int, Int, Long, Double)]
      .collect()
      .map(r => (r._1, r._2) -> (r._3, r._4))
      .toMap
    for (i <- 0 until 3; j <- i until 3) {
      val want = vecs.map(v => v(i).toDouble * v(j).toDouble).sum
      val (n, g) = got((i, j))
      assert(n == 4L)
      assert(math.abs(g - want) < 1e-12, s"cell ($i,$j)")
    }
    assert(got.size == 6) // upper triangle of dim 3
    assert(!got.contains((1, 0)))
  }

  test("gramMatrix skips null vectors") {
    val df = Seq(Some(Array(1.0f, 1.0f)), None, Some(Array(2.0f, 0.0f))).toDF("v")
    val got = Spectral.gramMatrix(df, col("v")).as[(Int, Int, Long, Double)].collect()
    assert(got.forall(_._3 == 2L))
  }

  test("topComponent recovers a planted dominant direction; rayleigh matches its variance") {
    // x_r = a_r * u + eps_r * w  with |a| >> |eps| and u ⟂ w: the gram's
    // top eigenvector is u, eigenvalue Σa².
    val dim = 8
    val s8 = 1.0 / math.sqrt(dim.toDouble)
    val u = Array.tabulate(dim)(i => if (i % 2 == 0) s8 else -s8)          // unit
    val w = Array.tabulate(dim)(i => if (i < 4) 0.5 else { if (i % 2 == 0) 0.5 else -0.5 })
    val wOrth = { // Gram-Schmidt w against u, normalized
      val d = u.zip(w).map { case (a, b) => a * b }.sum
      val raw = w.zip(u).map { case (b, a) => b - d * a }
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val rows = (1 to 200).map { r =>
      val a = 1.0 + (r % 7) * 0.3
      val e = ((r % 5) - 2) * 0.02
      Tuple1(Array.tabulate(dim)(i => (a * u(i) + e * wOrth(i)).toFloat))
    }
    val gram = Spectral.gramToMatrix(Spectral.gramMatrix(rows.toDF("v"), col("v")))
    val v = Spectral.topComponent(gram)
    val cosU = math.abs(u.zip(v).map { case (a, b) => a * b }.sum)
    assert(cosU > 0.999, s"top component not aligned with planted direction: |cos|=$cosU")
    val lambda = Spectral.rayleigh(gram, v)
    val sumA2 = (1 to 200).map(r => math.pow(1.0 + (r % 7) * 0.3, 2)).sum
    assert(math.abs(lambda - sumA2) / sumA2 < 0.01, s"rayleigh $lambda vs planted $sumA2")
  }

  test("topComponentReplay: aligned with the production fit, deterministic, 6dp-quantized") {
    val dim = 8
    val s8 = 1.0 / math.sqrt(dim.toDouble)
    val u = Array.tabulate(dim)(i => if (i % 2 == 0) s8 else -s8)
    val rows = (1 to 200).map { r =>
      val a = 1.0 + (r % 7) * 0.3
      Tuple1(Array.tabulate(dim)(i => (a * u(i) + ((r % 5) - 2) * 0.01).toFloat))
    }
    // the replay twin consumes the 6dp-rounded gram, like x164
    val gram = Spectral.gramToMatrix(
      Spectral.gramMatrix(rows.toDF("v"), col("v"))
        .select(col("i"), col("j"), round(col("g"), 6).as("g"))
    )
    val replay = Spectral.topComponentReplay(gram, iters = 3)
    val full = Spectral.topComponent(gram)
    val cos = math.abs(replay.zip(full).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"replay twin diverged from the production fit: |cos|=$cos")
    // every component is exactly 6dp-quantized (the replay contract)
    replay.foreach(x => assert(math.rint(x * 1e6) / 1e6 == x, s"unquantized component $x"))
    // bit-identical across runs
    assert(Spectral.topComponentReplay(gram, iters = 3).toSeq == replay.toSeq)
    // sign contract: the largest-|x| component is positive
    val pivot = replay.indices.maxBy(i => math.abs(replay(i)))
    assert(replay(pivot) > 0)
  }

  test("projectOnto is the literal-direction dot product") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f)), Tuple1(Array(-1.0f, 0.0f, 1.0f))).toDF("v")
    val got = Spectral
      .projectOnto(df, col("v"), Array(1.0, 0.0, 2.0))
      .select(col("proj"))
      .as[Double]
      .collect()
      .sorted
    assert(got.sameElements(Array(1.0, 7.0)))
  }
}
