package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Similarity}

class BoilerplateBitextSpec extends SparkTestBase {
  import spark.implicits._

  test("domainBoilerplate strips lines above the frequency threshold, respects minDocs, keeps order") {
    // domain "a": 6 docs, header on all (6/6), semi on 3 (3/6 = 50% >= 30%),
    // rare on 1 (kept). domain "b": 2 docs (< minDocs=5) — nothing stripped.
    val docs = (0 until 6).map { i =>
      val semi = if (i % 2 == 0) "SEMI-A\n" else ""
      val rare = if (i == 0) "\nRARE" else ""
      (i.toLong, "a", s"HDR-A\n${semi}body $i$rare")
    } ++ Seq((10L, "b", "HDR-B\nbody x"), (11L, "b", "HDR-B\nbody y"))
    val got = CorpusOps
      .domainBoilerplate(docs.toDF("id", "dom", "t"), col("id"), col("dom"), col("t"))
      .as[(Long, Int, Int, String)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(got(0L) == ((0L, 4, 2, "body 0\nRARE")))  // hdr+semi stripped, rare kept
    assert(got(1L) == ((1L, 2, 1, "body 1")))
    assert(got(2L) == ((2L, 3, 2, "body 2")))
    assert(got(10L) == ((10L, 2, 0, "HDR-B\nbody x"))) // minDocs guard
  }

  test("domainBoilerplate counts a line once per doc toward frequency, strips every occurrence") {
    // the header appears TWICE in doc 0 — df must still be 5/5 once per
    // doc, and both occurrences must be stripped from doc 0.
    val docs = (0 until 5).map { i =>
      val t = if (i == 0) s"HDR\nbody $i\nHDR" else s"HDR\nbody $i"
      (i.toLong, "d", t)
    }
    val got = CorpusOps
      .domainBoilerplate(docs.toDF("id", "dom", "t"), col("id"), col("dom"), col("t"))
      .as[(Long, Int, Int, String)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(got(0L) == ((0L, 3, 2, "body 0")))
    assert(got(1L) == ((1L, 2, 1, "body 1")))
  }

  test("domainBoilerplate: null-text docs survive with null clean text, never counted as boiler") {
    val docs = (0 until 5).map(i => (i.toLong, "d", s"HDR\nbody $i")) :+
      ((9L, "d", null.asInstanceOf[String]))
    val got = CorpusOps
      .domainBoilerplate(docs.toDF("id", "dom", "t"), col("id"), col("dom"), col("t"))
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(got.size == 6, "the null-text doc must not vanish")
    assert(got(9L).isNullAt(1) && got(9L).getInt(2) == 0 && got(9L).isNullAt(3))
    assert(got(0L).getString(3) == "body 0") // header still stripped: df=5/6 >= 30%
  }

  test("bitextMineCandidates: all-pairs candidates are bit-equal to the exact scorer; restricted candidates still route twins") {
    def unit(seed: Int): Array[Float] = {
      val raw = Array.tabulate(12)(j => math.sin(seed * 17 + j * 5))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(v => (v / n).toFloat)
    }
    val xs = (0 until 15).map(i => (i.toLong, unit(i)))
    val ys = (0 until 8).map(i => (100L + i, unit(i).map(v => v * 1.001f))) ++
      (40 until 50).map(i => (i.toLong, unit(i)))
    val xdf = xs.toDF("id", "v"); val ydf = ys.toDF("id", "v")
    val allCands = (for (a <- xs; b <- ys) yield (a._1, b._1)).toDF("x_id", "y_id")
    val exact = Similarity
      .bitextMine(xdf, ydf, col("id"), col("v"), col("id"), col("v"))
      .as[(Long, Long, Double, Double, Boolean, Boolean)].collect().toSet
    val viaCands = Similarity
      .bitextMineCandidates(xdf, ydf, col("id"), col("v"), col("id"), col("v"), allCands)
      .as[(Long, Long, Double, Double, Boolean, Boolean)].collect().toSet
    assert(viaCands == exact, "all-pairs candidates must reproduce the exact scorer bit-for-bit")

    // restricted: each x sees only its twin (if any) plus two distractors
    val restricted = (0 until 15).flatMap { i =>
      Seq((i.toLong, 40L + i % 10), (i.toLong, 40L + (i + 3) % 10)) ++
        (if (i < 8) Seq((i.toLong, 100L + i)) else Nil)
    }.toDF("x_id", "y_id")
    val got = Similarity
      .bitextMineCandidates(xdf, ydf, col("id"), col("v"), col("id"), col("v"), restricted, k = 2)
      .as[(Long, Long, Double, Double, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    (0 until 8).foreach { i =>
      val r = got(i.toLong)
      assert(r._2 == 100L + i && r._5, s"x=$i must route to its twin mutually: $r")
    }
  }

  test("x133 production path: sign-band candidates recover every planted twin, accepted") {
    // the driver-checked query itself (LSH-shaped banded candidate join →
    // margin pipeline): perturb preserves signs, so twin recall is exact
    val got = SparkEntry
      .queries("x133_bitext_candidates")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    val twins = got.keys.filter(_ % 10 == 0)
    assert(twins.size == 50)
    twins.foreach { x =>
      val r = got(x)
      assert(r.getLong(1) == x + 10000000L, s"x=$x must best-pair with its twin")
      assert(r.getBoolean(5), s"x=$x twin pair must pass margin + mutual-NN")
    }
  }

  test("bitextMine drops null vectors instead of ranking null scores") {
    val xs = Seq((1L, Array(1.0f, 0.0f)), (2L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    val ys = Seq((10L, Array(1.0f, 0.1f)), (11L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    val got = Similarity
      .bitextMine(xs, ys, col("id"), col("v"), col("id"), col("v"), k = 1, threshold = 0.5)
      .as[(Long, Long, Double, Double, Boolean, Boolean)]
      .collect()
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 10L)
  }

  test("bitextMine pairs planted twins at high margin with mutual-NN; margin beats raw cosine on density") {
    // X: 20 well-separated "sentence" embeddings; Y: perturbed twins of
    // the first 10 plus 10 unrelated distractors.
    val dim = 16
    // SIGNED components: an all-positive corpus is degenerate (every
    // cosine ≈ 0.99, margins pinned to ~1.0 — no density signal).
    def unit(seed: Int): Array[Double] = {
      val raw = Array.tabulate(dim)(j => math.sin(seed * 31 + j * 7))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val xs = (0 until 20).map(i => (i.toLong, unit(i).map(_.toFloat)))
    val twins = (0 until 10).map { i =>
      (1000L + i, unit(i).map(v => (v * 1.001 + 0.0005).toFloat))
    }
    val distract = (50 until 60).map(i => (i.toLong, unit(i).map(_.toFloat)))
    val got = Similarity
      .bitextMine(
        xs.toDF("id", "v"), (twins ++ distract).toDF("id", "v"),
        col("id"), col("v"), col("id"), col("v"),
        threshold = 1.03
      )
      .as[(Long, Long, Double, Double, Boolean, Boolean)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    // every planted twin is its source's best, mutual, and accepted
    (0 until 10).foreach { i =>
      val r = got(i.toLong)
      assert(r._2 == 1000L + i, s"x=$i paired with ${r._2}")
      assert(r._5 && r._6, s"x=$i not mutual/accepted: $r")
      assert(r._4 > 1.03, s"x=$i margin ${r._4}")
    }
    // no unpaired source can be ACCEPTED with someone else's twin: the
    // twin's own mutual best is its source, so ry > 1 kills the steal
    (10 until 20).foreach { i =>
      val r = got(i.toLong)
      assert(!(r._2 >= 1000L && r._6), s"x=$i accepted someone's twin: $r")
    }
  }
}
