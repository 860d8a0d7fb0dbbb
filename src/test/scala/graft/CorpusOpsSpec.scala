package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Hand-computed cases for the corpus-preparation operators (repetition
  * signals, hash split, sequence packing) — the driver's x20/x21/x22
  * oracles check engine-portability; these check the math itself.
  */
class CorpusOpsSpec extends SparkTestBase {

  test("repetitionFeatures: hand-computed ratios") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),          // 4 tokens, 1 distinct, top=4; 3grams: "a a a" x2 -> 1 distinct of 2
      (2L, "w x y z"),          // all distinct; 3grams: "w x y","x y z" distinct
      (3L, "a b")               // short doc: single whole-text shingle
    ).toDF("doc_id", "text")
    val rows = CorpusOps
      .repetitionFeatures(df, col("text"), col("doc_id"))
      .orderBy("doc_id")
      .collect()

    val r1 = rows(0)
    assert(r1.getLong(1) == 4L)
    assert(math.abs(r1.getDouble(2) - 0.75) < 1e-12) // 1 - 1/4
    assert(math.abs(r1.getDouble(3) - 1.0) < 1e-12) // 4/4
    assert(math.abs(r1.getDouble(4) - 0.5) < 1e-12) // 1 - 1/2

    val r2 = rows(1)
    assert(r2.getLong(1) == 4L)
    assert(math.abs(r2.getDouble(2) - 0.0) < 1e-12)
    assert(math.abs(r2.getDouble(3) - 0.25) < 1e-12)
    assert(math.abs(r2.getDouble(4) - 0.0) < 1e-12)

    val r3 = rows(2)
    assert(r3.getLong(1) == 2L)
    assert(math.abs(r3.getDouble(4) - 0.0) < 1e-12) // one whole-text shingle, distinct
  }

  test("hashSplit: deterministic, partition-invariant, ~80/10/10") {
    import spark.implicits._
    val df = spark.range(10000).select(col("id").as("doc_id"))
    val once = CorpusOps.hashSplit(df, col("doc_id")).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic under a different partitioning
    val again = CorpusOps.hashSplit(df.repartition(17), col("doc_id"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == again)
    assert(once.values.sum == 10000L)
    assert(once("train") > 7700 && once("train") < 8300, s"train=${once("train")}")
    assert(once("val") > 700 && once("val") < 1400, s"val=${once("val")}")
    assert(once("test") > 700 && once("test") < 1400, s"test=${once("test")}")
    // per-id assignment is stable, not just the counts
    val a = CorpusOps.hashSplit(df, col("doc_id")).orderBy("doc_id").collect().map(_.getString(1))
    val b = CorpusOps.hashSplit(df.repartition(7), col("doc_id")).orderBy("doc_id").collect().map(_.getString(1))
    assert(a.sameElements(b))
  }

  test("decontaminate: flags exactly the documents sharing an n-gram with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"), // shares 3-gram "quick brown fox" with bench 10
      (2L, "totally unrelated text here"),
      (3L, "quick brown fox again and again") // also shares with bench 10
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "a quick brown fox appeared"),
      (11L, "nothing in common")
    ).toDF("doc_id", "text")
    val flagged = CorpusOps
      .decontaminate(corpus, col("text"), col("doc_id"), bench, col("text"), col("doc_id"), n = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged.toSeq == Seq((1L, 10L), (3L, 10L)))
  }

  test("decontaminateBloom: equals plain decontaminate exactly (sketch is prefilter-only)") {
    import spark.implicits._
    val corpus = (0L until 300L)
      .map(i => i -> s"tok${i} tok${i + 1} tok${i + 2} filler${i} pad${i % 7} end${i}")
      .toDF("doc_id", "text")
    val bench = (0L until 300L by 13L)
      .map(i => (1000L + i) -> s"tok${i} tok${i + 1} tok${i + 2} other stuff entirely now")
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = norm(
      CorpusOps.decontaminate(corpus, col("text"), col("doc_id"), bench, col("text"), col("doc_id"), n = 3)
    )
    val bloom = norm(
      CorpusOps.decontaminateBloom(corpus, col("text"), col("doc_id"), bench, col("text"), col("doc_id"), n = 3)
    )
    assert(plain.nonEmpty, "fixture must produce contaminated docs")
    assert(bloom == plain)
    // a tiny, high-fpp sketch may pass extra candidates — the confirm
    // join must still reduce to the exact answer
    val tight = norm(
      CorpusOps.decontaminateBloom(
        corpus, col("text"), col("doc_id"), bench, col("text"), col("doc_id"),
        n = 3, expectedGrams = 8L, fpp = 0.5)
    )
    assert(tight == plain)
  }

  test("domainMix: rates hit targets and never upsample") {
    import spark.implicits._
    // domains a/b/c with 100/300/600 tokens (total 1000)
    val df = Seq(("a", 100L), ("b", 300L), ("c", 600L)).toDF("dom", "n")
    val mix = CorpusOps
      .domainMix(df, col("dom"), col("n"), shares = Map("a" -> 0.5, "b" -> 0.1))
      .orderBy("domain")
      .collect()
      .map(r =>
        (
          r.getString(r.fieldIndex("domain")),
          r.getLong(r.fieldIndex("tokens")),
          r.getLong(r.fieldIndex("target_tokens")),
          r.getDouble(r.fieldIndex("sample_rate"))
        )
      )
    // a: target 500 > 100 tokens -> capped at 1.0 (no upsampling)
    // b: target 100 of 300 -> 1/3
    // c: uniform default share 1/3 -> target 333 of 600
    assert(mix(0) == ("a", 100L, 500L, 1.0))
    assert(mix(1)._3 == 100L && math.abs(mix(1)._4 - 100.0 / 300.0) < 1e-12)
    assert(mix(2)._3 == 333L && math.abs(mix(2)._4 - 333.0 / 600.0) < 1e-12)
  }

  test("packSequences: boundary spill and per-shard restart") {
    import spark.implicits._
    // shard A: tokens 3,3,3 at budget 4 -> cum-before 0,3,6 -> seqs 0,0,1
    // shard B: tokens 5,1   at budget 4 -> cum-before 0,5   -> seqs 0,1
    val df = Seq(
      ("A", 1L, 3L), ("A", 2L, 3L), ("A", 3L, 3L),
      ("B", 1L, 5L), ("B", 2L, 1L)
    ).toDF("shard", "ord", "n")
    val packed = CorpusOps
      .packSequences(df, col("n"), col("ord"), col("shard"), budget = 4)
      .orderBy("shard", "ord")
      .select("shard", "ord", "seq_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(
      packed.toSeq == Seq(("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 1L), ("B", 1L, 0L), ("B", 2L, 1L))
    )
  }

  test("dedupLines: corpus-wide boilerplate removal, order kept, empty-doc row survives") {
    import spark.implicits._
    // "boiler" appears 3x (dropped at minDupCount=3); "twice" 2x (kept);
    // doc 3 is ALL boilerplate -> must still emit a row with empty text
    val df = Seq(
      (1L, "alpha\nboiler\nbeta"),
      (2L, "boiler\ntwice\ngamma"),
      (3L, "boiler"),
      (4L, "twice\ndelta")
    ).toDF("doc_id", "text")
    val out = CorpusOps
      .dedupLines(df, col("doc_id"), col("text"), minDupCount = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(
      out.toSeq == Seq(
        (1L, "alpha\nbeta", 3L, 2L),
        (2L, "twice\ngamma", 3L, 2L),
        (3L, "", 1L, 0L),
        (4L, "twice\ndelta", 2L, 2L)
      )
    )
  }

  test("dedupLines keepFirst: corpus-first occurrence of a common line survives") {
    import spark.implicits._
    val df = Seq(
      (1L, "boiler\nalpha"),
      (2L, "beta\nboiler"),
      (3L, "boiler\ngamma")
    ).toDF("doc_id", "text")
    val out = CorpusOps
      .dedupLines(df, col("doc_id"), col("text"), minDupCount = 3, keepFirst = true)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // smallest (doc_id, pos) occurrence is doc 1 pos 0 — it alone keeps "boiler"
    assert(out.toSeq == Seq((1L, "boiler\nalpha"), (2L, "beta"), (3L, "gamma")))
  }

  test("dedupLines: result is partition-invariant") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"common line\nunique $i\n${if (i % 3 == 0) "semi" else s"solo $i"}"))
    val df = docs.toDF("doc_id", "text")
    val a = CorpusOps.dedupLines(df, col("doc_id"), col("text"), minDupCount = 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = CorpusOps.dedupLines(df.repartition(13), col("doc_id"), col("text"), minDupCount = 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
    // the 66 "semi" copies and 200 "common line" copies are gone everywhere
    assert(!a.exists(_(1).asInstanceOf[String].contains("common line")))
    assert(!a.exists(_(1).asInstanceOf[String].contains("semi")))
  }

  test("dedupSpans: duplicated k-window spans cut, unique context survives") {
    import spark.implicits._
    // docs 1 and 2 share the 4-token phrase "p q r s" (k=3 -> windows
    // "p q r" and "q r s" both duplicated -> all 4 phrase tokens covered);
    // the words around the phrase differ per doc and must survive. doc 3
    // has no duplicated window; doc 4 is shorter than k and survives whole.
    val df = Seq(
      (1L, "a b p q r s c d"),
      (2L, "x y p q r s z w"),
      (3L, "one two three four five"),
      (4L, "u v")
    ).toDF("doc_id", "text")
    val out = CorpusOps
      .dedupSpans(df, col("doc_id"), col("text"), k = 3, minDupCount = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(
      out.toSeq == Seq(
        (1L, "a b c d", 8L, 4L),
        (2L, "x y z w", 8L, 4L),
        (3L, "one two three four five", 5L, 5L),
        (4L, "u v", 2L, 2L)
      )
    )
  }

  test("dedupSpans: fully-duplicated doc empties out; overlapping spans merge") {
    import spark.implicits._
    // identical docs -> every window duplicated -> everything cut;
    // doc 3 contains the whole of docs 1/2 as a substring plus a twist
    val df = Seq(
      (1L, "m n o p"),
      (2L, "m n o p"),
      (3L, "m n o p twist")
    ).toDF("doc_id", "text")
    val out = CorpusOps
      .dedupSpans(df, col("doc_id"), col("text"), k = 3, minDupCount = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // windows "m n o"/"n o p" occur 3x each -> cut everywhere; doc 3's
    // "o p twist" window is unique, but its tokens o,p are already covered
    // -> only "twist" survives there
    assert(
      out.toSeq == Seq((1L, "", 4L, 0L), (2L, "", 4L, 0L), (3L, "twist", 5L, 1L))
    )
  }

  test("dedupSpans: native window/cut kernels bit-equal to declarative twins") {
    import spark.implicits._
    val docs = (1L to 120L)
      .map { i =>
        val boiler = if (i % 4 == 0) " end of transmission stop now" else ""
        (i, s"tok${i % 7} alpha tok${i % 5} beta tok${i % 3} gamma delta$boiler")
      }
      .toDF("doc_id", "text")
    val k = 3
    val winPairs = docs
      .select(
        graft.functions.text.window_md5s(col("text"), k).as("nat"),
        CorpusOps.windowMd5sDeclarative(col("text"), k).as("dec")
      )
      .collect()
    winPairs.foreach { r =>
      val n = r.getSeq[Array[Byte]](0).map(_.toSeq)
      val d = r.getSeq[Array[Byte]](1).map(_.toSeq)
      assert(n == d)
    }
    // edge: doc shorter than k has no window in either formulation
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(
      short
        .select(
          size(graft.functions.text.window_md5s(col("text"), k)).as("n"),
          size(CorpusOps.windowMd5sDeclarative(col("text"), k)).as("d")
        )
        .head() == org.apache.spark.sql.Row(0, 0)
    )
    val starts = Seq(
      ("a b c d e f g h", Seq(0, 1, 5)),
      ("a b c d e f g h", Seq.empty[Int]),
      ("a b c", Seq(0)),
      ("lone", Seq.empty[Int])
    ).toDF("text", "starts")
    val cutPairs = starts
      .select(
        graft.functions.text.cut_spans(col("text"), col("starts"), k).as("nat"),
        CorpusOps.cutSpansDeclarative(col("text"), col("starts"), k).as("dec")
      )
      .collect()
    cutPairs.foreach { r =>
      assert(r.getStruct(0).toSeq == r.getStruct(1).toSeq, s"$r")
    }
  }

  test("chunkTokens: boundaries, overlap, suffix-only tail dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, (1 to 4).map(i => s"s$i").mkString(" ")),  // shorter than one chunk
      (3L, (1 to 6).map(i => s"u$i").mkString(" "))   // 6 toks: start=4 is suffix-only at overlap 2
    ).toDF("doc_id", "text")
    val out = CorpusOps
      .chunkTokens(df, col("doc_id"), col("text"), chunkSize = 6, overlap = 2)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getSeq[String](3).mkString(" ")))
    assert(
      out.toSeq == Seq(
        // doc 1: starts 0,4,8 — start 8 adds tokens t11.. no: 8+2=10 !< 10 -> dropped
        (1L, 0, 0L, "t1 t2 t3 t4 t5 t6"),
        (1L, 1, 4L, "t5 t6 t7 t8 t9 t10"),
        (2L, 0, 0L, "s1 s2 s3 s4"),
        (3L, 0, 0L, "u1 u2 u3 u4 u5 u6")
      )
    )
  }

  test("chunkTokens: zero overlap tiles exactly; every token appears once") {
    import spark.implicits._
    val df = Seq((1L, (1 to 13).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = CorpusOps
      .chunkTokens(df, col("doc_id"), col("text"), chunkSize = 5, overlap = 0)
      .orderBy("chunk_idx")
      .collect()
      .map(r => r.getSeq[String](3))
    assert(out.map(_.size).toSeq == Seq(5, 5, 3))
    assert(out.flatten.toSeq == (1 to 13).map(i => s"w$i"))
  }

  test("bm25: hand-computed scores (Lucene idf form), non-matching docs absent") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark is fast spark"), // dl=4, tf(spark)=2
      (2L, "the engine is slow"),  // dl=4, no match
      (3L, "spark")                // dl=1, tf(spark)=1
    ).toDF("doc_id", "text")
    // N=3, avgdl=3, df(spark)=2; idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    val idf = math.log(1.6)
    def tfNorm(tf: Double, dl: Double): Double =
      tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
    val expect = Map(
      1L -> BigDecimal(idf * tfNorm(2, 4)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      3L -> BigDecimal(idf * tfNorm(1, 1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    )
    val got = CorpusOps.bm25(df, col("doc_id"), col("text"), Seq("spark", "absent"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 3L), "doc 2 has no query term and must be absent")
    assert(got(1L)._1 == 1L && got(3L)._1 == 1L)
    assert(math.abs(got(1L)._2 - expect(1L)) < 1e-9, s"${got(1L)} vs ${expect(1L)}")
    assert(math.abs(got(3L)._2 - expect(3L)) < 1e-9)
    // doc-length normalization: the shorter doc with the same tf scores higher
    assert(got(3L)._2 > got(1L)._2 * 0.8)
  }

  test("tfidfTopTerms: hand-computed ranking, ties break by term, k bounds output") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b c"), // tf: a=2,b=1,c=1
      (2L, "a b b d"), // tf: a=1,b=2,d=1
      (3L, "a c d d")  // tf: a=1,c=1,d=2
    ).toDF("doc_id", "text")
    // N=3; df: a=3 (idf=0), b=2, c=2, d=2; idf(b)=idf(c)=idf(d)=ln(1.5)
    val got = CorpusOps.tfidfTopTerms(df, col("doc_id"), col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(got.count(_._1 == 1L) == 2)
    // doc 1: b and c tie at 1*ln(1.5); term asc -> b rank 1, c rank 2; a scores 0
    assert(got.filter(_._1 == 1L).map(t => (t._3, t._2)).toSet == Set((1, "b"), (2, "c")))
    // doc 2: b top (2*ln1.5), then d (1*ln1.5 beats a's 0)
    assert(got.filter(_._1 == 2L).sortBy(_._3).map(_._2).toSeq == Seq("b", "d"))
    // doc 3: d top, then c
    assert(got.filter(_._1 == 3L).sortBy(_._3).map(_._2).toSeq == Seq("d", "c"))
    val s = got.find(t => t._1 == 2L && t._2 == "b").get._4
    assert(math.abs(s - BigDecimal(2 * math.log(1.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // kernel path == window formulation row-for-row on real docs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kern = CorpusOps.tfidfTopTerms(docs, col("doc_id"), col("text"), k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSet
    val decl = CorpusOps.tfidfTopTermsDeclarative(docs, col("doc_id"), col("text"), k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSet
    assert(kern == decl, "word_counts kernel path diverged from the window formulation")
  }

  test("bm25TopK: per-query top-k, consistent with single-query bm25, self-match ranks first") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark is fast spark"),
      (2L, "the engine is slow"),
      (3L, "spark"),
      (4L, "fast spark engine")
    ).toDF("doc_id", "text")
    val qs = Seq((100L, Seq("spark", "fast")), (200L, Seq("slow"))).toDF("qid", "terms")
    val got = CorpusOps.bm25TopK(df, col("doc_id"), col("text"), qs, col("qid"), col("terms"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // query 200: only doc 2 contains 'slow'
    assert(got.filter(_._1 == 200L).map(t => (t._2, t._3)).toSeq == Seq((1, 2L)))
    // query 100: docs 1,3,4 match; doc 2 absent; k bounds to 3
    val q100 = got.filter(_._1 == 100L)
    assert(q100.map(_._3).toSet == Set(1L, 3L, 4L) && q100.length == 3)
    // doc 1 matches both terms (n_matched=2 with tf(spark)=2) and must outrank doc 3 (one term)
    assert(q100.find(_._3 == 1L).get._4 == 2L)
    // scores agree with the single-query operator on the same query set
    val single = CorpusOps.bm25(df, col("doc_id"), col("text"), Seq("spark", "fast"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    q100.foreach { case (_, _, d, _, s) => assert(math.abs(s - single(d)) < 1e-9, s"doc $d: $s vs ${single(d)}") }
  }

  test("perplexityGate: hand-computed bigram probs; in-domain kept, gibberish gated; short doc floors") {
    import spark.implicits._
    // train: "a b" x3 and "a c" -> c(a,b)=3, c(a,c)=1, c(a)=4+... let's count:
    // tokens: a b a b a b a c -> c(a)=4, c(b)=3, c(c)=1, V=3
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a b"),   // P(b|a) = (3+1)/(4+3) = 4/7 -> lp = ln(4/7)
      (11L, "z q"),   // unseen everything: (0+1)/(0+3) -> ln(1/3)
      (12L, "a")      // no bigram: floor ln(1/3), n_bigrams = 0
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps
      .perplexityGate(corpus, col("doc_id"), col("text"), train, col("text"), minLogProb = -1.0)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == ((1L, r6(math.log(4.0 / 7.0)), true)), s"got ${got(10L)}")   // -0.5596 >= -1
    assert(got(11L) == ((1L, r6(math.log(1.0 / 3.0)), false)), s"got ${got(11L)}")  // -1.0986 < -1
    assert(got(12L) == ((0L, r6(math.log(1.0 / 3.0)), false)), s"bigram-less doc floors: ${got(12L)}")
    // shuffle-free corpus side when the model broadcasts: the only
    // Exchange is the final per-doc aggregation's
    val plan = graft.operators.TextOps
      .perplexityGate(corpus, col("doc_id"), col("text"), train, col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus side must not shuffle-join:\n$plan")
  }

  test("tokenEntropy: hand-computed; degenerate doc gated, uniform doc kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a a a a a"),               // entropy 0 -> gated
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8"),      // ln 8 = 2.079 -> kept at 2.0
      (3L, "a a b b")                        // ln 2 = 0.693 -> gated
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.tokenEntropy(df, col("doc_id"), col("text"), minEntropy = 2.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got(1L) == ((8L, 0.0, false)))
    assert(math.abs(got(2L)._2 - 2.079442) < 1e-9 && got(2L)._3)
    assert(math.abs(got(3L)._2 - 0.693147) < 1e-9 && !got(3L)._3)
    // native zero-shuffle kernel == the aggregation spec at 6dp, and the
    // plan really is exchange-free (no grouping, no Generate)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nat = graft.operators.TextOps.tokenEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dec = graft.operators.TextOps.tokenEntropyDeclarative(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(nat == dec, "native vs declarative entropy diverged past 6dp")
    val plan = graft.operators.TextOps.tokenEntropy(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"), s"expected pure projection:\n$plan")
  }

  test("sampleExactK: exact k per group, partition-invariant, small groups survive whole") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, if (i <= 30) "big" else if (i <= 38) "mid" else "tiny"))
      .toDF("doc_id", "grp")
    val s1 = CorpusOps.sampleExactK(df, col("grp"), col("doc_id"), k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    assert(s1.count(_._1 == "big") == 5)
    assert(s1.count(_._1 == "mid") == 5)
    assert(s1.count(_._1 == "tiny") == 2, "groups smaller than k survive whole")
    assert(s1.filter(_._1 == "tiny").map(_._3).sorted.toSeq == Seq(1, 2))
    // the draw is layout-invariant: same winners at any partitioning
    val s2 = CorpusOps.sampleExactK(df.repartition(13), col("grp"), col("doc_id"), k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    assert(s1.toSet == s2.toSet)
    // WindowGroupLimit (partial top-k before the exchange) is in the plan
    val plan = CorpusOps.sampleExactK(df, col("grp"), col("doc_id"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("invertedIndex: df exact, postings capped and sorted, per-doc dedup") {
    import spark.implicits._
    val df = Seq(
      (5L, "x y x"),  // x twice in one doc -> one posting
      (2L, "x z"),
      (9L, "x")
    ).toDF("doc_id", "text")
    val got = CorpusOps.invertedIndex(df, col("doc_id"), col("text"), maxPostings = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getString(3))).toMap
    assert(got("x") == ((3L, 2, "2,5")), s"got ${got("x")}") // df=3, capped to first 2 ids ascending
    assert(got("y") == ((1L, 1, "5")))
    assert(got("z") == ((1L, 1, "2")))
  }

  /** Plain-JVM reference implementation of the CDC boundary rule — the
    * oracle for the native kernel (the DuckDB SQL twin replays the same
    * rule engine-portably).
    */
  private def cdcRef(text: String, w: Int): Seq[(Int, Int, String)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = text.split(" ", -1)
    val n = toks.length
    val breaks = (w - 1 until n - 1).filter(e => md5hex(toks.slice(e - w + 1, e + 1).mkString(" ")).head == '0')
    val bounds = (-1 +: breaks) :+ (n - 1)
    bounds.sliding(2).zipWithIndex.map { case (Seq(a, b), _) =>
      (a + 1, b - a, md5hex(toks.slice(a + 1, b + 1).mkString(" ")))
    }.toSeq
  }

  test("cdcChunks: matches the reference rule on real docs; chunks tile the doc") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = CorpusOps
      .cdcChunks(docs.toSeq.toDF("doc_id", "text"), col("doc_id"), col("text"), window = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val exp = cdcRef(text, 8)
      val g = got(id).sortBy(_._2).map(t => (t._3, t._4, t._5)).toSeq
      assert(g == exp, s"doc $id")
      // chunks tile [0, n) with no gaps or overlaps
      val n = text.split(" ", -1).length
      assert(g.map(_._2).sum == n && g.head._1 == 0)
      g.sliding(2).foreach {
        case Seq((s1, l1, _), (s2, _, _)) => assert(s1 + l1 == s2)
        case _ =>
      }
    }
  }

  test("cdcChunks: boundaries survive upstream insertion (the CDC property)") {
    import spark.implicits._
    val base = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("n_chars") > 300).select("text").head().getString(0)
    val shifted = "freshly inserted prefix tokens " + base
    val out = CorpusOps
      .cdcChunks(Seq((1L, base), (2L, shifted)).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val baseFps = out.filter(_._1 == 1L).map(_._2)
    val shiftedFps = out.filter(_._1 == 2L).map(_._2).toSet
    assert(baseFps.length > 2, "test doc long enough to chunk")
    // every chunk after the first boundary is content-identical in the
    // shifted doc: only the first chunk may differ
    baseFps.drop(1).foreach(fp => assert(shiftedFps.contains(fp), "shifted doc must keep tail chunks"))
    // a fixed-size chunker would share NO interior chunk after a 5-token
    // shift; CDC shares all but the head
  }

  test("vocabOverlap: exact counts vs hand sets; sketch pins J=1 and J=0 exactly") {
    import spark.implicits._
    val df = Seq(
      ("a", "w x y z"), ("a", "x y"),          // vocab(a) = {w,x,y,z}
      ("b", "x y q"),                          // vocab(b) = {x,y,q} -> common {x,y}, union 5
      ("c", "w x y z"),                        // identical to a -> J=1, est MUST be 1
      ("d", "p1 p2 p3")                        // disjoint -> J=0, est MUST be 0
    ).toDF("g", "text")
    val got = CorpusOps.vocabOverlap(df, col("g"), col("text"), numHashes = 32, tol = 0.3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))
      .toMap
    assert(got.size == 6, "4 groups -> 6 ordered pairs, zero-overlap pairs included")
    assert(got(("a", "b")) == ((4L, 3L, 2L, 0.4, true)))
    assert(got(("a", "c"))._4 == 1.0 && got(("a", "c"))._5, "identical vocabs: est exactly 1")
    assert(got(("a", "d"))._3 == 0L && got(("a", "d"))._4 == 0.0 && got(("a", "d"))._5,
      "disjoint vocabs: est exactly 0 (64-bit mins cannot collide here)")
    assert(got(("b", "c")) == ((3L, 4L, 2L, 0.4, true)))
  }

  test("heavyHitters: exact counts and ranks; CMS estimate inside its bound") {
    import spark.implicits._
    val df = Seq.tabulate(200)(i => s"alpha beta ${if (i % 2 == 0) "gamma" else "delta"} tok$i")
      .toDF("text")
    val got = CorpusOps.heavyHitters(df, col("text"), k = 4, eps = 0.001)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1, "alpha", 200L, true),
      (2, "beta", 200L, true),
      (3, "delta", 100L, true), // tie at 100: term-asc tiebreak
      (4, "gamma", 100L, true)
    ))
  }

  test("capPerDomain: prefiltered plan equals the plain window under planted skew") {
    import spark.implicits._
    // one hot domain (20k rows — the web-corpus skew shape), two normal,
    // one smaller than the cap (must survive whole, ranked)
    val df = spark
      .range(20000).select(col("id").as("doc_id"), lit("hot").as("d"))
      .unionByName(spark.range(20000, 20300).select(col("id").as("doc_id"), lit("mid").as("d")))
      .unionByName(spark.range(30000, 30040).select(col("id").as("doc_id"), lit("low").as("d")))
      .unionByName(spark.range(40000, 40003).select(col("id").as("doc_id"), lit("tiny").as("d")))
    def asSet(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    val spec = asSet(CorpusOps.capPerDomain(df, col("doc_id"), col("d"), cap = 50))
    val fast = asSet(CorpusOps.capPerDomain(df, col("doc_id"), col("d"), cap = 50, prefilter = true))
    assert(fast == spec)
    // tight safety (1.0) leans on the undershoot fallback — still exact
    val tight = asSet(
      CorpusOps.capPerDomain(df, col("doc_id"), col("d"), cap = 50, safety = 1.0, prefilter = true)
    )
    assert(tight == spec)
    // shuffle-join variant for unbounded domain tables — still exact
    val nb = asSet(
      CorpusOps
        .capPerDomain(df, col("doc_id"), col("d"), cap = 50, broadcastCounts = false, prefilter = true)
    )
    assert(nb == spec)
    assert(spec.count(_._2 == "hot") == 50 && spec.count(_._2 == "tiny") == 3)
    // partition-invariant (the prefiltered path's survivor ranking must
    // not depend on layout)
    val re = asSet(
      CorpusOps
        .capPerDomain(df.repartition(17), col("doc_id"), col("d"), cap = 50, prefilter = true)
    )
    assert(re == spec)
  }

  test("capPerDomain: a domain whose prune keeps ZERO survivors still falls back (exact)") {
    import spark.implicits._
    // deterministic zero-survivor fixture: cap=1, safety=1 over a 4-row
    // domain makes thr = 0.25; pick ids whose 32-bit md5-prefix fraction
    // is >= 0.25 so the prune removes EVERY row and only the fallback
    // can rank the domain
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest
        .getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4)
        .map("%02x".format(_))
        .mkString
      java.lang.Long.parseLong(hex, 16).toDouble / math.pow(16, 8)
    }
    val zIds = (500000L until 510000L).filter(u(_) >= 0.3).take(4)
    assert(zIds.length == 4)
    val df = zIds.map(_ -> "z").toDF("doc_id", "d")
      .unionByName(spark.range(100).select(col("id").as("doc_id"), lit("n").as("d")))
    def asSet(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    val spec = asSet(CorpusOps.capPerDomain(df, col("doc_id"), col("d"), cap = 1))
    val fast =
      asSet(CorpusOps.capPerDomain(df, col("doc_id"), col("d"), cap = 1, safety = 1.0, prefilter = true))
    assert(fast == spec, s"zero-survivor domain must survive via fallback: $fast vs $spec")
    assert(fast.count(_._2 == "z") == 1)
  }

  test("snapshotDiff: NULL text is presence, not absence") {
    import spark.implicits._
    val old = Seq((1L, null.asInstanceOf[String]), (2L, "live"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val neu = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = CorpusOps
      .snapshotDiff(old, col("doc_id"), col("text"), neu, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    // 1: null -> null is unchanged; 2: text -> null is changed (present in
    // both); 3: present-with-null-text then gone is removed
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed"))
  }

  test("assignShards: NULL ids are excluded, not an NPE") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), None, Some(3L)).toDF("doc_id")
    val got = CorpusOps.assignShards(df, col("doc_id"), shardSize = 2).collect()
    assert(got.length == 3 && got.map(_.getLong(1)).sorted.sameElements(Array(0L, 1L, 2L)))
  }

  test("assignShards: equals the global-sort rank; shards cut exactly") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(5000).select(col("id").as("doc_id"))
    // test-only single-partition global window = the semantic spec
    val w = Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val spec = df
      .withColumn("rank", row_number().over(w).cast("long") - 1L)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val got = CorpusOps.assignShards(df.repartition(13), col("doc_id"), shardSize = 64).collect()
    assert(got.length == 5000)
    got.foreach { r =>
      val (id, rank, shard, pos) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rank == spec(id), s"doc $id rank $rank != ${spec(id)}")
      assert(shard == rank / 64 && pos == rank % 64)
    }
    // every shard except the last holds exactly shardSize docs
    val sizes = got.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    val last = sizes.keys.max
    sizes.foreach { case (s, n) => assert(if (s == last) n == 5000 % 64 else n == 64) }
  }

  test("dsirResample: prefers target-distribution docs; deterministic across partitionings") {
    import spark.implicits._
    val enVocab = Array("the", "cat", "sat", "on", "mat", "dog", "ran", "fast")
    val xxVocab = Array("zq1", "zq2", "zq3", "zq4", "zq5", "zq6", "zq7", "zq8")
    def doc(id: Long, v: Array[String]): (Long, String) =
      id -> (0 until 30).map(i => v(((id * 31 + i * 7) % v.length).toInt)).mkString(" ")
    val raw = ((0L until 200L).map(doc(_, enVocab)) ++ (200L until 400L).map(doc(_, xxVocab)))
      .toDF("doc_id", "text")
    val target = (1000L until 1050L).map(doc(_, enVocab)).toDF("doc_id", "text")
    val picked = CorpusOps
      .dsirResample(raw, col("doc_id"), col("text"), target, col("text"), k = 100)
      .collect()
    assert(picked.length == 100)
    // Gumbel noise is O(1); the log-weight gap between vocabularies is
    // ~30 tokens × ln-ratio >> noise, so the draw is effectively pure
    val enPicked = picked.count(_.getLong(0) < 200L)
    assert(enPicked == 100, s"expected all 100 picks from the target-like half, got $enPicked")
    picked.foreach(r => assert(r.getLong(1) == 30L))
    val again = CorpusOps
      .dsirResample(raw.repartition(11), col("doc_id"), col("text"), target, col("text"), k = 100)
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(again == picked.map(_.getLong(0)).toSet)
  }

  test("snapshotDiff: added/removed/changed/unchanged classified per doc; normalization absorbs jitter") {
    import spark.implicits._
    val old = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta")).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "alpha beta"),      // unchanged
      (2L, "gamma  DELTA "),   // whitespace/case jitter -> still unchanged (normalized digest)
      (4L, "fresh content")    // added; 3 removed
    ).toDF("doc_id", "text")
    val got = CorpusOps
      .snapshotDiff(old, col("doc_id"), col("text"), neu, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged", 3L -> "removed", 4L -> "added"))
    val changed = CorpusOps
      .snapshotDiff(
        old, col("doc_id"), col("text"),
        neu.withColumn("text", when(col("doc_id") === 2L, lit("totally new")).otherwise(col("text"))),
        col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(changed(2L) == "changed")
  }

  test("sampleWeighted: weight-proportional draw, scale-invariant, deterministic") {
    import spark.implicits._
    // 900 weight-1 docs vs 100 weight-100 docs: the heavy tail must
    // dominate a k=50 draw (P[a light key beats a heavy key] ~ u^100)
    val df = spark
      .range(900).select(col("id").as("doc_id"), lit(1.0).as("w"))
      .unionByName(spark.range(900, 1000).select(col("id").as("doc_id"), lit(100.0).as("w")))
    val picked = CorpusOps.sampleWeighted(df, col("doc_id"), col("w"), k = 50).collect()
    assert(picked.length == 50)
    val heavy = picked.count(_.getLong(0) >= 900L)
    assert(heavy >= 45, s"heavy docs must dominate: $heavy/50")
    // global weight scaling preserves the selection (key scales by 1/c)
    val scaled = CorpusOps
      .sampleWeighted(df.withColumn("w", col("w") * 7.5), col("doc_id"), col("w"), k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(scaled == picked.map(_.getLong(0)).toSet)
    // layout-invariant; zero/negative weights excluded
    val re = CorpusOps
      .sampleWeighted(df.repartition(13), col("doc_id"), col("w"), k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(re == picked.map(_.getLong(0)).toSet)
    val withZero = df.withColumn("w", when(col("doc_id") < 900, lit(0.0)).otherwise(col("w")))
    val onlyHeavy = CorpusOps.sampleWeighted(withZero, col("doc_id"), col("w"), k = 200).collect()
    assert(onlyHeavy.length == 100 && onlyHeavy.forall(_.getLong(0) >= 900L))
  }

  test("gopherQualityGate: hand-computed signals and rule conjunction") {
    import spark.implicits._
    import graft.operators.TextOps
    val df = Seq(
      (1L, "aaa bbb ccc"),
      (2L, "the fish is ###"),
      (3L, "one two\n- bullet line\nend...")
    ).toDF("doc_id", "text")
    val rows = TextOps
      .gopherQualityGate(df, col("doc_id"), col("text"), minWords = 2, minStopHits = 0)
      .orderBy("doc_id")
      .collect()
    val r1 = rows(0)
    assert(r1.getInt(1) == 3 && r1.getDouble(2) == 3.0 && r1.getDouble(3) == 0.0)
    assert(r1.getDouble(4) == 1.0 && r1.getInt(7) == 0 && r1.getAs[Boolean]("kept"))
    val r2 = rows(1)
    assert(r2.getInt(1) == 4 && r2.getDouble(3) == 0.75 && r2.getInt(7) == 1)
    assert(r2.getDouble(4) == 0.75 && !r2.getAs[Boolean]("kept")) // symbol ratio over the bound
    val r3 = rows(2)
    assert(r3.getInt(1) == 6)
    assert(math.abs(r3.getDouble(5) - 0.333333) < 1e-9) // 1 of 3 lines is a bullet
    assert(math.abs(r3.getDouble(6) - 0.333333) < 1e-9) // 1 of 3 lines ends ...
    assert(math.abs(r3.getDouble(4) - 0.833333) < 1e-9) // "-" has no alpha char
    assert(rows.forall(!_.getAs[Boolean]("is_shed")))
  }

  test("gopherQualityGate: monster rows shed at maxChars — metrics null, gate fails, mass counted") {
    import spark.implicits._
    import graft.operators.TextOps
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog jumped over it all day"),
      (2L, ("word " * 50).trim) // 249 chars — over the 100-char budget below
    ).toDF("doc_id", "text")
    val rows = TextOps
      .gopherQualityGate(df, col("doc_id"), col("text"), minWords = 2, maxChars = 100)
      .orderBy("doc_id")
      .collect()
    val ok = rows(0)
    assert(!ok.getAs[Boolean]("is_shed") && ok.getAs[Boolean]("kept"))
    val shed = rows(1)
    assert(shed.getAs[Boolean]("is_shed") && !shed.getAs[Boolean]("kept"))
    assert(shed.isNullAt(shed.fieldIndex("n_words")), "shed row must not compute metrics")
    assert(shed.isNullAt(shed.fieldIndex("alpha_frac")))
    // boundary: exactly maxChars is IN budget
    val edge = Seq((3L, "x" * 100)).toDF("doc_id", "text")
    val er = TextOps
      .gopherQualityGate(edge, col("doc_id"), col("text"), maxChars = 100)
      .collect()(0)
    assert(!er.getAs[Boolean]("is_shed") && !er.isNullAt(er.fieldIndex("n_words")))
  }

  test("cdcChunks: short and empty docs are one whole-doc chunk") {
    import spark.implicits._
    val out = CorpusOps
      .cdcChunks(Seq((1L, "only three tokens"), (2L, "")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSet == Set((1L, 0, 0, 3), (2L, 0, 0, 1)))
  }

  test("noveltyScore: hand-checked ratios; bloom path == exact path even with a degenerate sketch") {
    import spark.implicits._
    val ref = Seq((100L, "w1 w2 w3 w4")).toDF("doc_id", "text") // grams: w1w2w3, w2w3w4
    val corpus = Seq(
      (1L, "w1 w2 w3 w4"),      // both grams seen -> novelty 0
      (2L, "w1 w2 w3 x y z"),   // grams: w1w2w3(seen), w2w3x, w3xy, xyz -> 3/4
      (3L, "p q r")             // 1 gram, novel -> 1.0
    ).toDF("doc_id", "text")
    val exact = CorpusOps
      .noveltyScore(corpus, col("text"), col("doc_id"), ref, col("text"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(exact.toSeq == Seq((1L, 2L, 0L, 0.0), (2L, 4L, 3L, 0.75), (3L, 1L, 1L, 1.0)))
    // bloom path is exact regardless of sketch quality (fpp=0.5 degenerate)
    val bloom = CorpusOps
      .noveltyScoreBloom(corpus, col("text"), col("doc_id"), ref, col("text"),
        expectedGrams = 4L, fpp = 0.5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(bloom.toSeq == exact.toSeq)
  }

  test("zipfProfile: an exact 1/r corpus fits slope -1 with r2 = 1") {
    import spark.implicits._
    // counts 12/r at ranks 1..4: ln(c) = ln(12) - ln(rank) exactly
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++ Seq.fill(3)("d"))
      .mkString(" ")
    val r = CorpusOps.zipfProfile(Seq(text).toDF("text"), col("text"), topR = 4).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 12L)
    assert(math.abs(r.getDouble(2) - (-1.0)) < 1e-9, s"slope: ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 2.484907) < 1e-9, s"intercept: ${r.getDouble(3)}") // ln 12
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9, s"r2: ${r.getDouble(4)}")
  }

  test("pmiCollocations: hand-computed counts and pmi on a tiny corpus") {
    import spark.implicits._
    // bigrams: (a,b)x3, (b,a)x1, (b,c)x1; unigrams a:3 b:3 c:1; N=7
    val df = Seq("a b a b", "a b c").toDF("text")
    val out = CorpusOps
      .pmiCollocations(df, col("text"), minCount = 2, k = 10)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b" && r.getLong(2) == 3L)
    // ln(3*7/(3*3)) = ln(7/3)
    assert(math.abs(r.getDouble(3) - BigDecimal(math.log(7.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    // minCount=1 keeps all three pairs; single-token docs contribute no pair
    val all = CorpusOps.pmiCollocations(Seq("a b", "x").toDF("text"), col("text"), 1, 10)
    assert(all.count() == 1)
  }

  test("pmiCollocations window: skip-gram pairs at every distance <= window, short docs safe") {
    import spark.implicits._
    // "a b c d": w=1 -> (a,b),(b,c),(c,d); w=3 adds (a,c),(b,d),(a,d)
    val df = Seq("a b c d").toDF("text")
    val w3 = CorpusOps
      .pmiCollocations(df, col("text"), minCount = 1, k = 100, window = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(w3 == Set(
      ("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("a", "c", 1L), ("b", "d", 1L), ("a", "d", 1L)
    ).map { case (x, y, c) => (x, y, c) })
    // a 2-token doc under window=3: only the distance-1 pair, no error
    val short = CorpusOps
      .pmiCollocations(Seq("x y").toDF("text"), col("text"), minCount = 1, k = 10, window = 3)
      .collect()
    assert(short.length == 1 && short.head.getString(0) == "x")
  }

  test("sampleNegatives: deterministic, cross-domain only, never self") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, if (i % 4 == 0) "A" else "B")).toDF("doc_id", "domain")
    val out = CorpusOps
      .sampleNegatives(docs, col("doc_id"), col("domain"), k = 6)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty)
    val domains = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, draw, negId, negDom) =>
      assert(negId != id, s"self negative for $id")
      assert(negDom != domains(id), s"same-domain negative for $id")
      assert(domains(negId) == negDom)
      assert(draw >= 0 && draw < 6)
    }
    // deterministic across runs
    val again = CorpusOps
      .sampleNegatives(docs, col("doc_id"), col("domain"), k = 6)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(out.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
    // at most k draws per doc; A-docs (25% of corpus) keep more than B-docs on average
    val perDoc = out.groupBy(_._1).view.mapValues(_.length)
    assert(perDoc.values.forall(_ <= 6))
  }

  test("epochMixture: budgets, epochs, remainders, and the cap all land exactly") {
    import spark.implicits._
    // A: 4 docs, B: 16 docs; sqrt weights 2 and 4, sum 6; budget 18:
    //   A -> floor(18*2/6)=6 (cap floor(2*4)=8 not binding): e=1, rem=2
    //   B -> floor(18*4/6)=12 (cap 32 not binding):          e=0, rem=12
    val docs = ((1 to 4).map(i => ("A", i.toLong)) ++ (11 to 26).map(i => ("B", i.toLong)))
      .toDF("domain", "doc_id")
    val out = CorpusOps
      .epochMixture(docs, col("domain"), col("doc_id"), budget = 18L, maxEpochs = 2.0)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val a = out.filter(_._2 == "A").map(_._3)
    val b = out.filter(_._2 == "B").map(_._3)
    assert(a.sum == 6L && a.count(_ == 2L) == 2 && a.count(_ == 1L) == 2)
    assert(b.sum == 12L && b.count(_ == 1L) == 12 && b.count(_ == 0L) == 4)
    // a binding cap: huge budget -> every domain capped at floor(maxEpochs*n)
    val capped = CorpusOps
      .epochMixture(docs, col("domain"), col("doc_id"), budget = 10000L, maxEpochs = 1.5)
      .collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(capped.filter(_._1 == "A").map(_._2).sum == 6L)  // floor(1.5*4)
    assert(capped.filter(_._1 == "B").map(_._2).sum == 24L) // floor(1.5*16)
    // deterministic: the +1 picks are identical across runs
    val again = CorpusOps
      .epochMixture(docs, col("domain"), col("doc_id"), budget = 18L, maxEpochs = 2.0)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("langTemperature: alpha=1 is proportional (rates equal), alpha->0 flattens toward uniform") {
    import spark.implicits._
    // 90 docs of 'hi', 10 of 'lo'
    val docs = (0L until 90L).map(i => (i, "hi")).++((90L until 100L).map(i => (i, "lo"))).toDF("doc_id", "lang")
    // alpha = 1: q = p, target = floor(p * 50) -> hi 45, lo 5, both rate 0.5
    val a1 = CorpusOps
      .langTemperature(docs, col("doc_id"), col("lang"), alpha = 1.0, budgetFraction = 0.5)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("keep").cast("long")).as("k"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(a1("hi")._1 == 90 && a1("lo")._1 == 10)
    // deterministic md5 draws: kept counts are fixed, near rate*n
    assert(a1("hi")._2 >= 35 && a1("hi")._2 <= 55)
    assert(a1("lo")._2 >= 2 && a1("lo")._2 <= 8)
    // small alpha: lo's keep RATE must exceed hi's (tail up-weighted);
    // with alpha=0.1, q_lo/q_hi = (10/90)^0.1 ~ 0.80 -> rate_lo ~ 4x rate_hi
    val a0 = CorpusOps
      .langTemperature(docs, col("doc_id"), col("lang"), alpha = 0.1, budgetFraction = 0.5)
      .filter(col("keep"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("k"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // lo: target = floor(q_lo*50) with q_lo ~ 0.444 -> 22 > 10 -> rate 1.0, all kept
    assert(a0("lo") == 10)
    // hi: rate ~ floor(0.555*50)/90 = 27/90 ~ 0.31 -> strictly below alpha=1 keeps
    assert(a0("hi") < a1("hi")._2)
    // determinism: same call twice, identical keep set
    def keeps() = CorpusOps
      .langTemperature(docs, col("doc_id"), col("lang"), 0.3, 0.5)
      .filter(col("keep"))
      .select(col("doc_id"))
      .as[Long]
      .collect()
      .sorted
      .toSeq
    assert(keeps() == keeps())
  }

  test("rankingMetrics: hand-computed MRR/nDCG@5 — mid-rank hit, no-rel query, beyond-k relevance") {
    import spark.implicits._
    val df = Seq(
      // A: rel at rank 2 only -> mrr .5, dcg = 1/log2(3), idcg = 1
      ("A", 1, 0), ("A", 2, 1), ("A", 3, 0),
      // B: nothing relevant -> all zeros
      ("B", 1, 0), ("B", 2, 0),
      // C: rel at rank 1 and rank 7 (beyond k) -> dcg counts only rank 1,
      // idcg uses n_rel = 2
      ("C", 1, 1), ("C", 7, 1), ("C", 2, 0)
    ).toDF("q", "rank", "rel")
    val got = CorpusOps
      .rankingMetrics(df, col("q"), col("rank"), col("rel"), k = 5)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val a = got("A")
    assert(a.getAs[Double]("mrr") == 0.5)
    assert(a.getAs[Double]("dcg") == 0.63093)
    assert(a.getAs[Double]("idcg") == 1.0 && a.getAs[Double]("ndcg") == 0.63093)
    val b = got("B")
    assert(b.getAs[Double]("mrr") == 0.0 && b.getAs[Double]("idcg") == 0.0 && b.getAs[Double]("ndcg") == 0.0)
    val c = got("C")
    assert(c.getAs[Long]("n_rel") == 2 && c.getAs[Double]("mrr") == 1.0)
    assert(c.getAs[Double]("dcg") == 1.0 && c.getAs[Double]("idcg") == 1.63093)
    assert(c.getAs[Double]("ndcg") == 0.613147)
  }

  test("rankingMetrics: rank 0 / negative ranks score 0 — never reach element_at") {
    import spark.implicits._
    // rank 0 would throw under ANSI (array index 0); rank -1 would
    // silently index from the array END without the >= 1 guard
    val df = Seq(
      ("A", 0, 1), ("A", -1, 1), ("A", 2, 1),
      ("B", 0, 1), ("B", -3, 1)
    ).toDF("q", "rank", "rel")
    val got = CorpusOps
      .rankingMetrics(df, col("q"), col("rank"), col("rel"), k = 5)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val a = got("A")
    // only rank 2 contributes: dcg = 1/log2(3); mrr from rank 2
    assert(a.getAs[Double]("dcg") == 0.63093)
    assert(a.getAs[Double]("mrr") == 0.5)
    val b = got("B")
    // all ranks out of range: zero dcg/mrr, but n_rel still counts them
    assert(b.getAs[Double]("dcg") == 0.0 && b.getAs[Double]("mrr") == 0.0)
    assert(b.getAs[Long]("n_rel") == 2)
  }

  test("quantileNormalize: PERCENT_RANK semantics — ties share, min is 0, max is 1, singleton group is 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "g", 10.0), (2L, "g", 20.0), (3L, "g", 20.0), (4L, "g", 30.0), (5L, "g", 40.0),
      (6L, "solo", 7.0)
    ).toDF("id", "grp", "score")
    val got = CorpusOps
      .quantileNormalize(df, col("id"), col("score"), col("grp"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(3))
      .toMap
    assert(got(1L) == 0.0)
    assert(got(2L) == 0.25 && got(3L) == 0.25) // 1 strictly below / 4
    assert(got(4L) == 0.75)
    assert(got(5L) == 1.0)
    assert(got(6L) == 0.0)
    // null scores are dropped, not ranked
    val withNull = Seq((1L, "g", Some(1.0)), (2L, "g", None)).toDF("id", "grp", "score")
    val g2 = CorpusOps.quantileNormalize(withNull, col("id"), col("score"), col("grp")).collect()
    assert(g2.map(_.getLong(0)).toSet == Set(1L))
  }
}
