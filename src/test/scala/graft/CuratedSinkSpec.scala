package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Similarity, TextOps}
import graft.sources.CuratedSink

/** Output-side and cohort-2 operator checks: the shard writer's layout +
  * manifest + verification contract, html metadata, the cross-modal gate,
  * the incremental semantic gate (recall + shed guard), and curriculum
  * interleaving.
  */
class CuratedSinkSpec extends SparkTestBase {

  test("writeShards: partition layout, manifest, verifyShards green, pruning plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sink").toString + "/out"
    val df = CorpusOps.assignShards(spark.range(1000).toDF("id"), col("id"), shardSize = 100)
    val manifest = CuratedSink.writeShards(df, dir)
    assert(manifest.count() == 10)
    assert(manifest.agg(sum(col("n_rows"))).head().getLong(0) == 1000L)
    // verification: intact dataset -> zero broken shards
    assert(CuratedSink.verifyShards(spark, dir).count() == 0)
    // pruning: a shard filter must land in PartitionFilters, not the scan
    val plan = spark.read
      .parquet(dir)
      .filter(col("shard") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"), plan.take(400))
    // sorted within shard: pos is monotone per file read order
    // pos is WITHIN-shard (assignShards contract): dense 0..shardSize-1
    val rows = spark.read.parquet(dir).filter(col("shard") === 3).select(col("pos")).collect().map(_.getLong(0))
    assert(rows.length == 100 && rows.min == 0 && rows.max == 99)
    // break the dataset: delete one shard dir entirely -> verify flags it
    val victim = new java.io.File(dir, "shard=7")
    victim.listFiles().foreach(_.delete()); victim.delete()
    val broken = CuratedSink.verifyShards(spark, dir).collect()
    // shard comes back as the partition-inferred integer type
    assert(broken.length == 1 && broken(0).getAs[Number]("shard").longValue == 7L)
  }

  test("htmlMeta: title collapse, canonical attr, noindex flag") {
    import spark.implicits._
    val df = Seq(
      (1L, "<html><head><title> A \n  B </title><link rel=\"canonical\" href=\"https://x/y\"/></head></html>"),
      (2L, "<head><title>t</title><meta name=\"robots\" content=\"noindex\"/></head>"),
      (3L, "<head><meta name=\"robots\" content=\"index, follow\"/></head>")
    ).toDF("id", "html")
    val rows = TextOps.htmlMeta(df, col("id"), col("html")).orderBy("doc_id").collect()
    assert(rows(0).getString(1) == "A B" && rows(0).getString(2) == "https://x/y" && !rows(0).getBoolean(3))
    assert(rows(1).getString(1) == "t" && rows(1).isNullAt(2) && rows(1).getBoolean(3))
    assert(rows(2).getString(1) == "" && !rows(2).getBoolean(3))
  }

  test("alignmentGate: matched pairs pass, orthogonal pairs fail") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 0.0, 0.0), Array(0.999, 0.001, 0.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    ).toDF("id", "a", "b")
    val rows = Similarity.alignmentGate(df, col("id"), col("a"), col("b")).orderBy("pair_id").collect()
    assert(rows(0).getBoolean(2) && rows(0).getDouble(1) > 0.999)
    assert(!rows(1).getBoolean(2) && rows(1).getDouble(1) < 0.01)
  }

  test("incrementalSemantic: twins drop with dup_of, fresh keep; zero-vector cell sheds") {
    import spark.implicits._
    val dim = 16
    def vec(seed: Long): Array[Double] =
      Array.tabulate(dim)(k => math.sin(seed * 31 + k * 7).abs + 0.1)
    val ref = (0L until 50L).map(i => (i, vec(i))).toDF("vec_id", "v")
    val twins = (0L until 50L by 5).map(i => (i + 1000L, vec(i).map(_ * 1.0000001))).toDF("vec_id", "v")
    // fresh vectors carry alternating signs — the all-positive ref orthant
    // cannot reach them (cosine ≈ 0), so every fresh item must be kept
    val fresh = (2000L until 2010L)
      .map(i => (i, Array.tabulate(dim)(k => if ((k + i) % 2 == 0) 1.0 + k else -(1.0 + k))))
      .toDF("vec_id", "v")
    val batch = twins.unionByName(fresh)
    val out = Similarity
      .incrementalSemantic(batch, col("vec_id"), col("v"), ref, col("vec_id"), col("v"), threshold = 0.9999)
      .collect()
      .map(r => r.getLong(0) -> (Option(if (r.isNullAt(1)) null else r.getLong(1)), r.getBoolean(3)))
      .toMap
    (0L until 50L by 5).foreach { i =>
      assert(out(i + 1000L) == (Some(i), false), s"twin of $i")
    }
    (2000L until 2010L).foreach(i => assert(out(i) == (None, true), s"fresh $i must keep"))

    // shed guard: a degenerate cell (all-zero embeddings sign identically
    // into one bucket) must shed batch keys rather than joining
    val zeroRef = (0L until 500L).map(i => (i, Array.fill(dim)(0.0))).toDF("vec_id", "v")
    val zBatch = Seq((9000L, Array.fill(dim)(0.0))).toDF("vec_id", "v")
    val shed = Similarity
      .incrementalSemantic(zBatch, col("vec_id"), col("v"), zeroRef, col("vec_id"), col("v"), maxBucket = 100)
      .collect()
    // the zero-vector batch item passes UNVERIFIED (kept), not verified-dup
    assert(shed.length == 1 && shed(0).getBoolean(3))
  }

  test("curriculumOrder: md5 order within tier, round-robin interleave") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, (i % 3).toInt)).toDF("id", "tier")
    val out = CorpusOps.curriculumOrder(df, col("id"), col("tier"), nTiers = 3)
    val rows = out.collect()
    assert(rows.length == 200)
    // ranks dense per tier
    (0 until 3).foreach { t =>
      val ranks = rows.filter(_.getInt(1) == t).map(_.getLong(2)).sorted
      assert(ranks.sameElements(ranks.indices.map(_.toLong)), s"tier $t ranks not dense")
    }
    // train_order collision-free and congruent to tier mod 3
    val orders = rows.map(_.getLong(3))
    assert(orders.distinct.length == 200)
    rows.foreach(r => assert(r.getLong(3) % 3 == r.getInt(1)))
    // within-tier order == md5 order (replay independently)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long): String = md.digest(i.toString.getBytes).map("%02x".format(_)).mkString
    (0 until 3).foreach { t =>
      val want = (0L until 200L).filter(_ % 3 == t).sortBy(i => (h(i), i))
      val got = rows.filter(_.getInt(1) == t).sortBy(_.getLong(2)).map(_.getLong(0)).toSeq
      assert(got == want, s"tier $t order")
    }
  }
}
