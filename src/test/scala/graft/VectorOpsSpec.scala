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
}
