package graft

import org.apache.spark.sql.functions._

import graft.functions.vector

/** Native vector expressions vs their higher-order-function twins: results
  * must be BIT-equal (same sequential fold order), so swapping the
  * implementations cannot move any oracle or recall result.
  */
class VectorOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
  private def hofNorm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  private lazy val emb = graft.sources.Tables
    .load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("native dot/cosine/l2sq are bit-equal to the HOF formulations") {
    val pairs = emb
      .select(col("vec_id").as("ia"), col("v").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("v").as("b")))
      .filter(col("ia") < col("ib") && col("ib") < 40)
    val diffs = pairs
      .select(
        (vector.dot(col("a"), col("b")) === hofDot(col("a"), col("b"))).as("dot_eq"),
        (vector.cosine(col("a"), col("b")) ===
          hofDot(col("a"), col("b")) / (hofNorm(col("a")) * hofNorm(col("b")))).as("cos_eq"),
        (vector.l2sq(col("a"), col("b")) ===
          aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v))
          .as("l2_eq")
      )
      .filter(!col("dot_eq") || !col("cos_eq") || !col("l2_eq"))
    assert(diffs.count() == 0)
  }

  test("native hyperplane signature is bit-identical to the round-1 HOF formulation") {
    val bits = 16
    val hofSig = {
      val planes = (0 until bits).map { i =>
        val proj = aggregate(
          zip_with(
            col("v"),
            transform(sequence(lit(0), size(col("v")) - 1), j =>
              (xxhash64(lit(i), j).cast("double") / lit(Long.MaxValue.toDouble))),
            (x, h) => x * h
          ),
          lit(0.0d),
          (acc, v) => acc + v
        )
        when(proj >= 0, shiftleft(lit(1L), i)).otherwise(0L)
      }
      planes.reduce(_.bitwiseOR(_))
    }
    val mismatches = emb
      .limit(100)
      .select(vector.hyperplane_sig(col("v"), bits).as("n"), hofSig.as("h"))
      .filter(col("n") =!= col("h"))
    assert(mismatches.count() == 0)
  }

  test("native nearest_cells matches the HOF struct-sort formulation (incl. ties)") {
    // duplicate centroids force (distance, cell-id) tie-breaks
    val cents: Seq[Seq[Double]] = Seq(
      Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0), // dup of cell 1
      Seq(5.0, 5.0), Seq(-1.0, -1.0)
    )
    def hofCells(v: org.apache.spark.sql.Column, n: Int) =
      slice(
        array_sort(
          transform(
            typedlit(cents),
            (ct, i) =>
              struct(vector.l2sq(v, ct).as("d"), i.as("cell"))
          )
        ),
        1,
        n
      )
    val df = Seq(
      (1L, Seq(0.9, 0.1)),
      (2L, Seq(0.0, 0.0)),
      (3L, Seq(1.0, 0.0)), // equidistant to cells 1 and 3 (dup centroid)
      (4L, Seq(-0.5, -0.6))
    ).toDF("id", "v")
    Seq(1, 3, 6).foreach { n =>
      val got = df
        .select(
          col("id"),
          vector.nearest_cells(col("v"), cents, n).as("native"),
          transform(hofCells(col("v"), n), s => s.getField("cell")).as("hof")
        )
        .collect()
      got.foreach { r =>
        assert(
          r.getSeq[Int](1) == r.getSeq[Int](2),
          s"n=$n id=${r.getLong(0)}: native=${r.getSeq[Int](1)} hof=${r.getSeq[Int](2)}"
        )
      }
    }
    // n beyond the centroid count degrades to all cells (slice semantics),
    // never throws — a corpus smaller than nprobe must still answer
    val clamped = df
      .select(vector.nearest_cells(col("v"), cents.take(2), 5).as("c"))
      .collect()
      .map(_.getSeq[Int](0))
    assert(clamped.forall(_.length == 2))

    // real embeddings, the x15 parameters
    val realCents = emb.orderBy("vec_id").limit(16).collect().map(_.getSeq[Double](1).toVector).toSeq
    val chk = emb
      .select(
        vector.nearest_cells(col("v"), realCents, 4).as("native"),
        transform(
          slice(
            array_sort(
              transform(typedlit(realCents), (ct, i) => struct(vector.l2sq(col("v"), ct).as("d"), i.as("cell")))
            ),
            1,
            4
          ),
          s => s.getField("cell")
        ).as("hof")
      )
      .filter(col("native") =!= col("hof"))
      .count()
    assert(chk == 0L)
  }

  test("randomProject: one-hot vectors recover the sign matrix exactly; scaling is 1/sqrt(k)") {
    import spark.implicits._
    val dim = 16
    val k = 8
    // v = e_i  =>  y_j = sign(i, j) / sqrt(k), exactly
    val oneHots = (0 until dim)
      .map(i => (i.toLong, Array.tabulate(dim)(x => if (x == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = graft.operators.Similarity
      .randomProject(oneHots, col("vec_id"), col("embedding"), dim = dim, k = k)
      .collect()
    assert(rows.length == dim * k)
    def signOf(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(s"${i}_${j}".getBytes("UTF-8"))
      if ((((md(0) >> 4) & 0xf) % 2) == 0) 1.0 else -1.0
    }
    rows.foreach { r =>
      val (i, j, y) = (r.getLong(0).toInt, r.getInt(1), r.getDouble(2))
      val expected = BigDecimal(signOf(i, j) / math.sqrt(k.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(y == expected, s"e_$i comp $j: $y != $expected")
    }
    // both sign values actually occur (a constant matrix would be useless)
    val ys = rows.map(_.getDouble(2)).distinct.sorted
    assert(ys.length == 2 && ys(0) == -ys(1))
  }

  test("randomProject: JL distance preservation in expectation at k=32") {
    import spark.implicits._
    val dim = 64
    val k = 32
    val vecs = (0L until 40L)
      .map(id =>
        (id, Array.tabulate(dim)(i => (((id * 2654435761L + i * 40503L) % 1013L).toFloat - 506.0f) / 506.0f))
      )
      .toDF("vec_id", "embedding")
    val proj = graft.operators.Similarity
      .randomProject(vecs, col("vec_id"), col("embedding"), dim = dim, k = k)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => (t._1 - t._2) * (t._1 - t._2)).sum
    val ratios = for (a <- 0L until 20L; b <- (a + 1) until 20L) yield {
      val da = d2(orig(a).map(_.toDouble), orig(b).map(_.toDouble))
      d2(proj(a).map(identity), proj(b).map(identity)) / da
    }
    // E[ratio] = 1; at k=32 individual ratios concentrate within ~3x
    ratios.foreach(r => assert(r > 0.3 && r < 3.0, s"distance ratio out of range: $r"))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.25, s"mean distance ratio drifted: $mean")
  }

  test("null propagation and empty arrays") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))
    ).toDF("a", "b")
    val rows = df
      .select(
        vector.dot(col("a"), col("b")).as("d"),
        vector.hyperplane_sig(col("a"), 8).as("s")
      )
      .collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("normOutliers: flags planted corruption only; point mass degrades to z=0") {
    import spark.implicits._
    val emb = graft.sources.Tables
      .load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val zeroed = emb
      .filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), transform(col("v"), x => x * lit(0.0)).as("v"))
    val tripled = emb
      .filter(col("vec_id") % 100 === 1)
      .select((col("vec_id") + 200000L).as("vec_id"), transform(col("v"), x => x * lit(3.0)).as("v"))
    val out = graft.operators.Similarity
      .normOutliers(emb.unionByName(zeroed).unionByName(tripled), col("vec_id"), col("v"), 3.0)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(3)))
    val planted = out.filter(_._1 >= 100000L)
    assert(planted.nonEmpty && planted.forall(_._3), "all planted corruption must be flagged")
    assert(out.filter(_._1 < 100000L).forall(!_._3), "no natural unit vector is an outlier")
    assert(planted.filter(_._1 < 200000L).forall(_._2 == 0.0))
    // point mass: all-identical norms -> sd=0 -> z=0, nothing flagged
    val same = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(0.0, 5.0)), (3L, Seq(5.0, 0.0)))
      .toDF("vec_id", "v")
    val pm = graft.operators.Similarity.normOutliers(same, col("vec_id"), col("v"), 3.0).collect()
    assert(pm.forall(r => r.getDouble(2) == 0.0 && !r.getBoolean(3)))
    // null vectors are excluded, not scored
    val withNull = Seq((1L, Some(Seq(1.0))), (2L, None)).toDF("vec_id", "v")
    assert(graft.operators.Similarity.normOutliers(withNull, col("vec_id"), col("v"), 3.0).count() == 1)
  }

  test("meanPoolByGroup: exact hand-computed means, counts, and dims") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0, 2.0)),
      (0, Seq(3.0, 6.0)),
      (1, Seq(-1.0, 1.0))
    ).toDF("label", "v")
    val out = graft.operators.Similarity
      .meanPoolByGroup(df, col("label"), col("v"))
      .orderBy(col("group"))
      .collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L && out(0).getInt(2) == 2)
    assert(out(0).getSeq[Double](3) == Seq(2.0, 4.0))
    assert(out(1).getLong(1) == 1L && out(1).getSeq[Double](3) == Seq(-1.0, 1.0))
  }
}
