package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Telemetry._
import graft.operators.Similarity
import graft.streaming.MetricsBridge

/** SQL function registration (SparkSessionExtensions), the metrics bridge,
  * and embedding-cosine near-dup.
  */
class ExtensionsSpec extends SparkTestBase {

  test("GraftExtensions registers codec functions for spark.sql") {
    // live-session registration path (builder path is driven by
    // demo.SqlSurfaceDemo in its own JVM — getOrCreate here would return
    // the shared extension-less session)
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(Tuple1(encodeHeartbeat(Heartbeat(72, 5, 1700L))))
      .toDF("frame")
      .createOrReplaceTempView("frames")
    val row = spark
      .sql(
        """SELECT graft_frame_len(frame) AS len, graft_frame_type(frame) AS tpe,
          |  graft_hb_client_id(frame) AS c, graft_hb_sequence(frame) AS s,
          |  graft_hb_timestamp(frame) AS t, graft_le_u16(frame, 0) AS len2
          |FROM frames""".stripMargin
      )
      .collect()(0)
    assert(row.getInt(0) == 28 && row.getInt(1) == 0)
    assert(row.getLong(2) == 72 && row.getLong(3) == 5 && row.getLong(4) == 1700L)
    assert(row.getInt(5) == 28)
  }

  test("GraftExtensions registers vector/text kernels for spark.sql") {
    GraftExtensions.register(spark)
    val row = spark
      .sql(
        """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |  graft_l2sq(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l2,
          |  graft_word_shingles('a b c d', 3) AS sh,
          |  size(graft_minhash_sig(array('a', 'b'), 8)) AS nsig,
          |  graft_simhash64(array('spark')) = graft_simhash64(array('spark')) AS stable,
          |  graft_hyperplane_sig(array(1.0d, 2.0d), 16) IS NOT NULL AS hsig
          |""".stripMargin
      )
      .collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 1.0)
    assert(row.getDouble(2) == 25.0)
    assert(row.getSeq[String](3) == Seq("a b c", "b c d"))
    assert(row.getInt(4) == 8)
    assert(row.getBoolean(5) && row.getBoolean(6))
  }

  test("graft_pii_scrub SQL function: fused audit+redaction from pure SQL") {
    GraftExtensions.register(spark)
    val row = spark
      .sql(
        """SELECT s.pii.n_emails, s.pii.n_ips, s.pii.n_phones, s.pii.redacted
          |FROM (SELECT graft_pii_scrub('mail a@b.co at 10.0.0.1 tel 555-123-4567') AS pii) s
          |""".stripMargin
      )
      .collect()(0)
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((1, 1, 1)))
    assert(row.getString(3) == "mail <EMAIL> at <IP> tel <PHONE>")
  }

  test("graft_token_entropy / graft_word_counts SQL functions: per-row text kernels") {
    GraftExtensions.register(spark)
    val ent = spark
      .sql("SELECT e.te.n_tokens, e.te.entropy FROM (SELECT graft_token_entropy('a a b b') AS te) e")
      .collect()(0)
    assert(ent.getLong(0) == 4L && math.abs(ent.getDouble(1) - math.log(2.0)) < 1e-12)
    val wc = spark
      .sql("SELECT term, tf FROM (SELECT explode(graft_word_counts('x y x')) AS (term, tf)) ORDER BY term")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(wc.toSeq == Seq(("x", 2), ("y", 1)))
  }

  test("graft_split SQL function matches CorpusOps.hashSplit") {
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    val viaSql = spark
      .sql("SELECT id, graft_split(id) AS s FROM range(1000)")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val viaOp = graft.operators.CorpusOps
      .hashSplit(spark.range(1000).toDF(), col("id"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(viaSql == viaOp)
    assert(viaSql.values.toSet == Set("train", "val", "test"))
  }

  test("user UDF/UDAF surface: register + SQL use (the reference's scripting-hook intent)") {
    import spark.implicits._
    // scalar UDF (the svc Lua hook would have done per-message rewrites,
    // svc/handler.cpp:211-221 - here: payload annotation)
    spark.udf.register("annotate", (s: String) => s"[graft] $s")
    // typed UDAF via Aggregator
    val sumSq = new org.apache.spark.sql.expressions.Aggregator[Long, Long, Long] {
      def zero = 0L
      def reduce(b: Long, a: Long) = b + a * a
      def merge(a: Long, b: Long) = a + b
      def finish(b: Long) = b
      def bufferEncoder = org.apache.spark.sql.Encoders.scalaLong
      def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
    }
    spark.udf.register("sum_sq", org.apache.spark.sql.functions.udaf(sumSq))
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v").createOrReplaceTempView("udf_t")
    val rows = spark
      .sql("SELECT annotate(k) AS ak, sum_sq(v) AS s FROM udf_t GROUP BY k ORDER BY ak")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(rows == Seq(("[graft] a", 5L), ("[graft] b", 9L)))
  }

  test("metrics bridge accumulates reference-named counters from query progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bridge = new MetricsBridge
    spark.streams.addListener(bridge)
    try {
      val input = MemoryStream[Long]
      input.addData(1L to 50L: _*)
      val q = input.toDF().writeStream.format("memory").queryName("metrics_q").start()
      q.processAllAvailable()
      input.addData(51L to 60L: _*)
      q.processAllAvailable()
      q.stop()
      // listener events are async — poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (bridge.counterValue("process_messages_total", "metrics_q") < 60 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(bridge.counterValue("process_messages_total", "metrics_q") == 60)
      val scrape = bridge.scrape()
      assert(scrape.contains("""process_messages_total{query="metrics_q"}"""))
      assert(scrape.contains("""batch_count{query="metrics_q"}"""))
    } finally spark.streams.removeListener(bridge)
  }

  test("IVF ANN: results are exact within probed cells, recall ≥ 0.5 vs brute force") {
    val emb = graft.sources.Tables
      .load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Similarity
      .bruteForceTopK(emb, queries, "embedding", "vec_id", 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val ivf = Similarity
      .ivfTopK(emb, queries, "embedding", "vec_id", 5, nlist = 16, nprobe = 6)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(ivf.nonEmpty && ivf.groupBy(_._1).size == 10) // every query answered
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("IVF train/serve split: one trained centroid table serves many probe calls") {
    val emb = graft.sources.Tables
      .load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // train ONCE (the persist-and-reuse path: survives a parquet round-trip)
    val dir = java.nio.file.Files.createTempDirectory("ivf_centroids").toString
    Similarity.ivfTrain(emb, "embedding", "vec_id", nlist = 16, iters = 2)
      .write.mode("overwrite").parquet(dir)
    val centroids = spark.read.parquet(dir)
    assert(centroids.count() == 16)
    // two DIFFERENT query batches probe the same trained table
    def probe(qs: org.apache.spark.sql.DataFrame) = Similarity
      .ivfProbe(centroids, emb, qs, "embedding", "vec_id", 5, nprobe = 6)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val batch1 = probe(emb.filter(col("vec_id") < 10))
    val batch2 = probe(emb.filter(col("vec_id") >= 10 && col("vec_id") < 20))
    assert(batch1.groupBy(_._1).size == 10 && batch2.groupBy(_._1).size == 10)
    // the composition (retrain-per-call) and the split path agree exactly
    val composed = Similarity
      .ivfTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id", 5, nlist = 16, nprobe = 6)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(batch1 == composed, "split train/probe must equal the one-shot composition")
    // a centroid table with a hole is rejected loudly, not mis-assigned
    intercept[IllegalArgumentException] {
      Similarity.ivfProbe(centroids.filter(col("cell") =!= 3), emb,
        emb.filter(col("vec_id") < 2), "embedding", "vec_id", 5)
    }
  }

  test("graft_ivf_train/graft_ivf_probe SQL table functions round-trip the Scala serve path") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables
      .load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    emb.createOrReplaceTempView("emb_sql")
    emb.filter(col("vec_id") < 10).createOrReplaceTempView("emb_queries_sql")
    spark
      .sql("SELECT * FROM graft_ivf_train('emb_sql', 'embedding', 'vec_id', 16, 2)")
      .createOrReplaceTempView("cents_sql")
    assert(spark.table("cents_sql").count() == 16)
    val viaSql = spark
      .sql(
        "SELECT * FROM graft_ivf_probe('cents_sql', 'emb_sql', 'emb_queries_sql', 'embedding', 'vec_id', 5, 6)"
      )
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val viaScala = Similarity
      .ivfTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id", 5, nlist = 16, nprobe = 6)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(viaSql == viaScala, s"sql=${viaSql.size} scala=${viaScala.size}")
  }

  test("graft_asof SQL table function: backward and forward through the native operator") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t", "lv").createOrReplaceTempView("asof_l")
    Seq((1L, 90L, "r1"), (1L, 150L, "r2"), (2L, 60L, "r3"))
      .toDF("k", "t", "rv").createOrReplaceTempView("asof_r")
    val back = spark.sql("SELECT lv, rv FROM graft_asof('asof_l', 'asof_r', 'k', 't')")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(back == Set(("l1", Some("r1")), ("l2", Some("r2")), ("l3", None)))
    val fwd = spark
      .sql("SELECT lv, rv FROM graft_asof('asof_l', 'asof_r', 'k', 't', 'forward')")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // forward: earliest right at/after — l1@100 -> r2@150, l2@200 -> none, l3@50 -> r3@60
    assert(fwd == Set(("l1", Some("r2")), ("l2", None), ("l3", Some("r3"))))
    // chunked directions: same answers through the monster-key path
    val backC = spark
      .sql("SELECT lv, rv FROM graft_asof('asof_l', 'asof_r', 'k', 't', 'backward_chunked')")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(backC == back)
    val fwdC = spark
      .sql("SELECT lv, rv FROM graft_asof('asof_l', 'asof_r', 'k', 't', 'forward_chunked')")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(fwdC == fwd)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('asof_l', 'asof_r', 'k', 't', 'sideways')").collect()
    }
  }

  test("graft_pcm_frames / graft_pcm16_frames SQL functions: exact frame stats on byte and LE16 planes") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // unsigned bytes 1,2,3,4 → one frame: rms = sqrt(30/4), mean 2.5
    Seq(Tuple1(Array[Byte](1, 2, 3, 4))).toDF("b").createOrReplaceTempView("pcm_v")
    val r = spark.sql("SELECT inline(graft_pcm_frames(b, 4)) FROM pcm_v").collect()(0)
    assert(r.getDouble(0) == math.sqrt(30.0 / 4) && r.getDouble(1) == 2.5)
    // signed LE16 samples 100, -200 → sum −100, sum_sq 50000
    Seq(Tuple1(Array[Byte](0x64, 0x00, 0x38.toByte, 0xff.toByte)))
      .toDF("b").createOrReplaceTempView("pcm16_v")
    val r2 = spark.sql("SELECT inline(graft_pcm16_frames(b, 2)) FROM pcm16_v").collect()(0)
    assert(r2.getLong(2) == 50000L && r2.getLong(3) == -100L)
  }

  test("graft_dedup_exact / graft_decontaminate SQL table functions round-trip the Scala operators") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq((1L, "a b c"), (2L, "a  b c"), (3L, "unique text here"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tf_docs")
    val viaSql = spark
      .sql("SELECT * FROM graft_dedup_exact('tf_docs', 'text', 'doc_id')")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaScala = graft.operators.Dedup
      .exact(docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSql == viaScala && viaSql.size == 2)
    // normalized twins collapse: "a b c" and "a  b c" share a digest
    assert(viaSql.exists(t => t._2 == 1L && t._3 == 2L))
    // decontaminate: corpus doc 10 shares exactly one 8-gram with bench
    // doc 100; doc 11 shares none
    val corpus = Seq(
      (10L, "one two three four five six seven eight nine"),
      (11L, "totally different words with no overlap at all then")
    ).toDF("doc_id", "text")
    val bench =
      Seq((100L, "zero one two three four five six seven eight")).toDF("doc_id", "text")
    corpus.createOrReplaceTempView("tf_corpus")
    bench.createOrReplaceTempView("tf_bench")
    val hits = spark
      .sql(
        "SELECT * FROM graft_decontaminate('tf_corpus', 'text', 'doc_id', " +
          "'tf_bench', 'text', 'doc_id', 8)"
      )
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits == Set((10L, 100L, 1L)))
    val hitsScala = graft.operators.CorpusOps
      .decontaminate(corpus, col("text"), col("doc_id"), bench, col("text"), col("doc_id"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits == hitsScala)
  }

  test("graft_media_probe / graft_video_frames SQL table functions round-trip the Scala operators") {
    import spark.implicits._
    import graft.operators.Multimodal
    GraftExtensions.register(spark)
    val media = Seq(
      (1L, Multimodal.syntheticImage(1L, 12, 10, "png")),
      (2L, Multimodal.syntheticGif(2L, 12, 10, 3)),
      (3L, Multimodal.syntheticY4m(3L, 12, 10, 2)),
      (4L, Multimodal.syntheticAviMjpeg(4L, 12, 10, 2)),
      (5L, Multimodal.syntheticWav(5L, 256)),
      (6L, "plain text".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    media.createOrReplaceTempView("tf_media")
    val viaSql = spark
      .sql("SELECT doc_id, kind, n_frames FROM graft_media_probe('tf_media', 'doc_id', 'content')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(
      viaSql == Set(
        (1L, "image", 1), (2L, "video", 3), (3L, "video", 2),
        (4L, "video", 2), (5L, "audio", -1), (6L, "unknown", -1)
      ),
      s"got $viaSql"
    )
    // frame hashes from SQL == the Scala operator, stride honored
    val ds = media
      .select(col("doc_id"), lit("m").as("media_type"), col("content"))
      .as[Multimodal.MediaRow]
    val viaScala = Multimodal.videoFrameHashes(ds, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(4))).toSet
    val framesSql = spark
      .sql("SELECT doc_id, frame_idx, simhash FROM graft_video_frames('tf_media', 'doc_id', 'content', 2)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(framesSql == viaScala, s"sql $framesSql vs scala $viaScala")
    // stride 2 keeps frames 0 and 2 of the 3-frame GIF, frame 0 of the
    // 2-frame containers
    assert(framesSql.map(t => (t._1, t._2)).count(t => t._1 == 2L) == 2)
  }

  test("embedding-cosine near-dup pairs = exact brute-force subset, all above threshold") {
    val emb = graft.sources.Tables
      .load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val got = Similarity
      .cosineNearDupPairs(emb, "embedding", "vec_id", threshold = 0.3)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // exact pairs via self cross join (500 vecs at sf0.001 -> 125k pairs)
    val l = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
    val r = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val exact = l
      .join(r, col("a") < col("b"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.3)
      .collect()
      .map(rr => ((rr.getAs[Long]("a"), rr.getAs[Long]("b")), rr.getAs[Double]("cos")))
      .toMap
    got.foreach { case (pair, c) =>
      assert(exact.contains(pair), s"non-exact pair $pair")
      assert(math.abs(exact(pair) - c) < 1e-12)
      assert(c >= 0.3)
    }
    // LSH with 16 bits/4 blocks finds most strongly-similar pairs
    val strong = exact.filter(_._2 >= 0.5).keySet
    if (strong.nonEmpty) {
      val rec = strong.intersect(got.keySet).size.toDouble / strong.size
      assert(rec >= 0.5, s"near-dup recall $rec")
    }
  }

  test("near-dup pairs: planted near-duplicates (cos>=0.99) recalled at the x14 parameters") {
    import spark.implicits._
    // The driver's synthetic embeddings are i.i.d. gaussian — no true
    // near-dups exist, so recall there is vacuous. Plant them: every vector
    // id < 100 gets a +100000 twin nudged by a tiny deterministic delta
    // (cosine vs original >= 0.99), then demand the default-parameter
    // operator recover >= 90% of the planted pairs.
    val emb = graft.sources.Tables
      .load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twins = emb
      .filter(col("vec_id") < 100)
      .select(
        (col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) => x + sin(i.cast("double") + col("vec_id")) * lit(0.02)).as("embedding")
      )
    val planted = emb.unionByName(twins)
    val got = Similarity
      .cosineNearDupPairs(planted, "embedding", "vec_id", threshold = 0.95)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val expected = (0L until 100L).map(i => (i, i + 100000L)).toSet
    val rec = expected.intersect(got).size.toDouble / expected.size
    assert(rec >= 0.9, s"planted near-dup recall $rec (found ${got.size} pairs)")
  }
}
