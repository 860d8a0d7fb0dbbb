package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Dedup, Similarity, TextOps}

/** Hand-computed cases for the web-curation cohort (blocklist gate, URL
  * canonicalization + registrable domain, encoding audit, catalog merge,
  * vocab coverage, key-level keep-best, topic assignment) — the driver's
  * x78–x83 oracles check engine-portability; these check the math itself.
  */
class WebCurationSpec extends SparkTestBase {

  test("blocklistGate: whole-word case-insensitive hits, longest-first overlap") {
    import spark.implicits._
    val df = Seq(
      (1L, "a Table SCAN inside and a table scanner"), // scanner: no \b match
      (2L, "vectorized is not vector but vector is"),  // 2 whole-word hits
      (3L, "nothing here"),
      (4L, "table scan table scan")                    // non-overlapping count = 2
    ).toDF("id", "text")
    val rows = TextOps
      .blocklistGate(df, col("id"), col("text"), Seq("table scan", "vector"))
      .orderBy("doc_id")
      .collect()
    assert(rows(0).getInt(1) == 1 && rows(0).getString(2) == "table scan")
    assert(rows(1).getInt(1) == 2 && rows(1).getString(2) == "vector")
    assert(rows(2).getInt(1) == 0 && rows(2).isNullAt(2) && !rows(2).getBoolean(3))
    assert(rows(3).getInt(1) == 2 && rows(3).getBoolean(3))
  }

  test("blocklistGate: Aho-Corasick large-phrase path is row-identical to the regex path") {
    import spark.implicits._
    // adversarial shapes: overlapping phrases (longest-first), a phrase
    // that is a prefix of another, repeated non-overlapping hits,
    // non-word edges (no \b), word chars hugging a boundary, non-ASCII
    // neighbors, nulls, and the empty string
    val df = Seq(
      (1L, Option("a Table SCAN inside and a table scanner")),
      (2L, Option("vectorized is not vector but vector is")),
      (3L, Option("nothing here")),
      (4L, Option("table scan table scan table")),
      (5L, Option("c++ and c# and c")),
      (6L, Option("naïve vector café table scan é")),
      (7L, Option("tabletable scan vectorvector")),
      (8L, Option("")),
      (9L, None),
      (10L, Option("scan table scan tab")),
      (11L, Option("xx_vector vector_x _vector_ vector"))
    ).toDF("id", "text")
    val phrases = Seq("table scan", "vector", "c++", "c#", "table", "scan tab")
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect().map { r =>
        (r.getLong(0), r.getInt(1), Option(r.getString(2)), r.getBoolean(3))
      }.toSeq
    val regex = rowsOf(TextOps.blocklistGate(df, col("id"), col("text"), phrases, acSwitchAt = Int.MaxValue))
    val ac = rowsOf(TextOps.blocklistGate(df, col("id"), col("text"), phrases, acSwitchAt = 1))
    assert(ac == regex, s"AC path diverged from regex path:\n  ac=$ac\n  rx=$regex")
    // schemas must agree too (both paths feed the same oracle/query)
    val sR = TextOps.blocklistGate(df, col("id"), col("text"), phrases, acSwitchAt = Int.MaxValue).schema
    val sA = TextOps.blocklistGate(df, col("id"), col("text"), phrases, acSwitchAt = 1).schema
    assert(sA == sR, s"schema drift: $sA vs $sR")
  }

  test("blocklistGate: AC path equality fuzz — random texts over a random phrase set") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("table", "scan", "vector", "index", "page", "row", "split", "c++", "x")
    val phrases = (Seq("table scan", "scan index", "index page", "c++", "row split x") ++
      vocab).distinct
    val texts = (0 until 200).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(25))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else ""))
    }
    val df = texts.toDF("id", "text")
    def rowsOf(switch: Int) =
      TextOps.blocklistGate(df, col("id"), col("text"), phrases, acSwitchAt = switch)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)))).toSeq
    assert(rowsOf(Int.MaxValue) == rowsOf(1))
  }

  test("urlNormalize: scheme/host case, ports, www, fragments, tracking params") {
    import spark.implicits._
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=1#frag", "https://example.com/a/b/?id=1"),
      ("http://site.org:80/path/", "http://site.org/path"),
      ("https://a.co/p?utm_a=1&utm_b=2&id=3", "https://a.co/p?id=3"),
      ("https://a.co/p?id=3&fbclid=zzz", "https://a.co/p?id=3"),
      ("https://a.co/p?utm_a=1", "https://a.co/p"),
      ("https://a.co:8080/p", "https://a.co:8080/p"), // non-default port kept
      ("https://a.co", "https://a.co")
    ).toDF("url", "expect")
    val bad = cases
      .select(TextOps.urlNormalize(col("url")).as("got"), col("expect"))
      .filter(col("got") =!= col("expect"))
      .collect()
    assert(bad.isEmpty, bad.mkString(";"))
  }

  test("registrableDomain: eTLD+1 with multi-part suffixes") {
    import spark.implicits._
    val cases = Seq(
      ("news.bbc.co.uk", "bbc.co.uk"),
      ("a.b.example.com", "example.com"),
      ("example.com", "example.com"),
      ("localhost", "localhost"),
      ("deep.shop.com.au", "shop.com.au")
    ).toDF("host", "expect")
    val bad = cases
      .select(TextOps.registrableDomain(col("host")).as("got"), col("expect"))
      .filter(col("got") =!= col("expect"))
      .collect()
    assert(bad.isEmpty, bad.mkString(";"))
  }

  test("encodingQuality: mojibake and control-char counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "clean ascii text"),
      (2L, "bad Ã©tÃ© and â€™quote"), // 3 moji
      (3L, "ctrl\u0007here\u0002x"), // 2 ctrl (BEL, STX)
      (4L, "tab\tand\nnewline ok")   // \t \n excluded from the ctrl class
    ).toDF("id", "text")
    val rows = TextOps.encodingQuality(df, col("id"), col("text")).orderBy("doc_id").collect()
    assert(rows(0).getInt(1) == 0 && rows(0).getInt(2) == 0 && !rows(0).getBoolean(5))
    assert(rows(1).getInt(1) == 3 && rows(1).getBoolean(5))
    assert(rows(2).getInt(2) == 2 && rows(2).getBoolean(5))
    assert(rows(3).getInt(1) == 0 && rows(3).getInt(2) == 0 && !rows(3).getBoolean(5))
  }

  test("mergeCatalogs: priority winner, copies, provenance") {
    import spark.implicits._
    val web = Seq((1L, "shared"), (2L, "webonly")).toDF("doc_id", "text")
    val books = Seq((10L, "shared"), (11L, "bookonly"), (12L, "shared")).toDF("doc_id", "text")
    val out = CorpusOps
      .mergeCatalogs(Seq("web" -> web, "books" -> books), "doc_id", "text")
      .collect()
      .map(r => (r.getString(r.fieldIndex("catalog")), r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("n_copies")), r.getString(r.fieldIndex("all_sources"))))
      .sortBy(_._2)
    assert(out.length == 3)
    // "shared": 3 copies across both catalogs; web (priority 0) id 1 wins
    assert(out.contains(("web", 1L, 3L, "books,web")))
    assert(out.contains(("web", 2L, 1L, "web")))
    assert(out.contains(("books", 11L, 1L, "books")))
  }

  test("vocabCoverage: per-doc OOV accounting") {
    import spark.implicits._
    val docs = Seq((1L, "a b c b"), (2L, "x y"), (3L, "a a")).toDF("id", "text")
    val vocab = Seq("a", "b").toDF("token")
    val rows = CorpusOps
      .vocabCoverage(docs, col("id"), col("text"), vocab)
      .orderBy("doc_id")
      .collect()
    assert(rows(0).getLong(1) == 4L && rows(0).getLong(2) == 1L && rows(0).getLong(3) == 1L)
    assert(math.abs(rows(0).getDouble(4) - 0.25) < 1e-12)
    assert(rows(1).getLong(2) == 2L && rows(1).getLong(3) == 2L)
    assert(rows(2).getLong(2) == 0L && rows(2).getLong(3) == 0L)
  }

  test("keepBestByKey: highest pref wins, ties to smallest id, counts exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "k1", 5.0),
      (2L, "k1", 9.0),
      (3L, "k1", 9.0), // tie with id 2 -> id 2 wins
      (4L, "k2", 1.0)
    ).toDF("id", "key", "pref")
    val rows = Dedup
      .keepBestByKey(df, col("key"), col("pref"), col("id"))
      .orderBy("doc_id")
      .collect()
    assert(rows.map(_.getBoolean(4)).toSeq == Seq(false, true, false, true))
    assert(rows(0).getLong(3) == 3L && rows(3).getLong(3) == 1L)
  }

  test("keepBestByKey: NULL keys form a group and come back flagged, never dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("k"), 1.0),
      (2L, None, 5.0),
      (3L, None, 7.0)
    ).toDF("id", "key", "pref")
    val rows = Dedup
      .keepBestByKey(df, col("key"), col("pref"), col("id"))
      .orderBy("doc_id")
      .collect()
    assert(rows.length == 3, "null-key rows must not vanish")
    assert(rows(0).getBoolean(4)) // k group: sole row wins
    assert(!rows(1).getBoolean(4) && rows(2).getBoolean(4)) // null group: id 3 wins on pref
    assert(rows(1).getLong(3) == 2L)
  }

  test("lexiconCategories: per-category hits + densities, any-category threshold verdict") {
    import spark.implicits._
    val df = Seq(
      (1L, "the table scan hit a socket error"), // db 1, net 1; 7 words → 14.28.. each
      (2L, "all quiet on this one here today now"), // nothing; 8 words
      (3L, "latency latency latency") // perf 3 of 3 words → 100/100w
    ).toDF("id", "text")
    val rows = TextOps
      .lexiconCategories(
        df,
        col("id"),
        col("text"),
        Map("db" -> Seq("table scan"), "net" -> Seq("socket"), "perf" -> Seq("latency")),
        maxHitsPer100Words = 10.0
      )
      .orderBy("doc_id")
      .collect()
    val r1 = rows(0)
    assert(r1.getAs[Int]("db_hits") == 1 && r1.getAs[Int]("net_hits") == 1 && r1.getAs[Int]("perf_hits") == 0)
    assert(r1.getAs[Double]("db_per100w") == 14.285714 && r1.getAs[Boolean]("flagged"))
    assert(!rows(1).getAs[Boolean]("flagged") && rows(1).getAs[Int]("db_hits") == 0)
    assert(rows(2).getAs[Double]("perf_per100w") == 100.0 && rows(2).getAs[Boolean]("flagged"))
  }

  test("lexiconCategories: rejects category names that would break column resolution") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "text")
    // dots/backticks in a name would break col() resolution downstream
    for (bad <- Seq("a.b", "a`b", "a b", "")) {
      val e = intercept[IllegalArgumentException] {
        TextOps.lexiconCategories(df, col("id"), col("text"), Map(bad -> Seq("x")))
      }
      assert(e.getMessage.contains("category name"), s"'$bad' accepted: ${e.getMessage}")
    }
    // reserved output names are rejected too
    intercept[IllegalArgumentException] {
      TextOps.lexiconCategories(df, col("id"), col("text"), Map("flagged" -> Seq("x")))
    }
  }

  test("keepBestByKey: string ids — lexicographic tie-break, null pref always loses") {
    import spark.implicits._
    val df = Seq(
      ("urlB", "k", Option(9.0)),
      ("urlA", "k", Option(9.0)), // pref tie → lexicographically smaller id wins
      ("urlC", "k", None), // null pref must lose to any scored row
      ("urlZ", "k2", None) // all-null group: sole row still wins
    ).toDF("id", "key", "pref")
    val rows = Dedup
      .keepBestByKey(df, col("key"), col("pref"), col("id"))
      .orderBy("doc_id")
      .collect()
    val kept = rows.map(r => r.getString(1) -> r.getBoolean(4)).toMap
    assert(kept == Map("urlA" -> true, "urlB" -> false, "urlC" -> false, "urlZ" -> true))
  }

  test("warcIngest: NULL blob surfaces as one invalid record; empty blob yields none") {
    import spark.implicits._
    val df = Seq((1L, Option("WARC/1.0\nWARC-Target-URI: u\nContent-Length: 2\n\nhi\n\n")), (2L, None), (3L, Option("")))
      .toDF("g", "blob")
    val rows = CorpusOps
      .warcIngest(df, col("g"), col("blob"))
      .orderBy("blob_id", "rec_idx")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getBoolean(4) && rows(0).getString(3) == "hi")
    assert(rows(1).getLong(0) == 2L && !rows(1).getBoolean(4) && rows(1).isNullAt(2))
  }

  test("codeQualityGate: line shape, alnum fraction, autogen marker") {
    import spark.implicits._
    val df = Seq(
      (1L, "short line\nanother short line"),                 // pass
      (2L, "x" * 900),                                        // kilometer line
      (3L, "// auto-generated do not edit\ncode here"),       // marker
      (4L, "@@@@ #### $$$$ %%%% ^^^^ &&&& !!!! ****")         // low alnum
    ).toDF("id", "text")
    val rows = TextOps.codeQualityGate(df, col("id"), col("text")).orderBy("doc_id").collect()
    assert(rows.map(_.getBoolean(6)).toSeq == Seq(true, false, false, false))
    assert(rows(0).getInt(1) == 2 && rows(0).getInt(2) == 18) // max line "another short line"
    assert(rows(1).getInt(2) == 900)
    assert(rows(2).getBoolean(5))
    assert(rows(3).getDouble(4) < 0.01)
  }

  test("dedupLinesWithin: first occurrences kept in order") {
    import spark.implicits._
    val df = Seq(
      (1L, "a\nb\na\nc\nb"),
      (2L, "unique\nlines")
    ).toDF("id", "text")
    val rows = CorpusOps.dedupLinesWithin(df, col("id"), col("text")).orderBy("doc_id").collect()
    assert(rows(0).getInt(1) == 5 && rows(0).getInt(2) == 3)
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("a\nb\nc".getBytes).map("%02x".format(_)).mkString
    assert(rows(0).getString(3) == want)
    assert(rows(1).getInt(1) == 2 && rows(1).getInt(2) == 2)
    assert(rows.forall(!_.getAs[Boolean]("is_shed")))
  }

  test("dedupLinesWithin: monster docs shed at maxLines — lines untouched, flagged, counted") {
    import spark.implicits._
    val df = Seq(
      (1L, "a\nb\na"), // 3 lines, within budget: dedups to a\nb
      (2L, "x\nx\nx\nx") // 4 lines, over the 3-line budget: passes through un-deduped
    ).toDF("id", "text")
    val rows = CorpusOps
      .dedupLinesWithin(df, col("id"), col("text"), maxLines = 3)
      .orderBy("doc_id")
      .collect()
    val inB = rows(0)
    assert(!inB.getAs[Boolean]("is_shed") && inB.getInt(1) == 3 && inB.getInt(2) == 2)
    val shed = rows(1)
    assert(shed.getAs[Boolean]("is_shed"), "over-budget doc must flag")
    assert(shed.getInt(1) == 4 && shed.getInt(2) == 4, "shed doc must pass through un-deduped")
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("x\nx\nx\nx".getBytes).map("%02x".format(_)).mkString
    assert(shed.getString(3) == want, "shed fp must cover the UNTOUCHED lines")
    // boundary: exactly maxLines still dedups
    val edge = CorpusOps
      .dedupLinesWithin(Seq((3L, "a\na\nb")).toDF("id", "text"), col("id"), col("text"), maxLines = 3)
      .collect()(0)
    assert(!edge.getAs[Boolean]("is_shed") && edge.getInt(2) == 2)
  }

  test("chunk -> reassemble round trip at several sizes and lengths") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "exactly four small tokens"),
      (3L, "one")
    ).toDF("id", "text")
    Seq(1, 4, 32, 1000).foreach { size =>
      val chunks = CorpusOps.chunkTokens(df, col("id"), col("text"), chunkSize = size)
      val back = CorpusOps
        .reassembleChunks(chunks, col("doc_id"), col("chunk_idx"), col("chunk"))
        .join(df.select(col("id").as("doc_id"), col("text").as("want")), Seq("doc_id"))
      val bad = back.filter(col("text") =!= col("want")).count()
      assert(bad == 0, s"round trip failed at chunkSize=$size")
    }
  }

  test("truncateTokens: head/tail/middle_out policies and pass-through") {
    import spark.implicits._
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8"), (2L, "a b")).toDF("id", "text")
    def text(policy: String): Seq[String] =
      CorpusOps
        .truncateTokens(df, col("id"), col("text"), maxTokens = 4, policy = policy)
        .orderBy("doc_id")
        .collect()
        .map(_.getString(4))
        .toSeq
    assert(text("head") == Seq("t1 t2 t3 t4", "a b"))
    assert(text("tail") == Seq("t5 t6 t7 t8", "a b"))
    assert(text("middle_out") == Seq("t1 t2 t7 t8", "a b"))
    val acct = CorpusOps
      .truncateTokens(df, col("id"), col("text"), maxTokens = 4)
      .orderBy("doc_id")
      .collect()
    assert(acct(0).getInt(1) == 8 && acct(0).getInt(2) == 4 && acct(0).getBoolean(3))
    assert(acct(1).getInt(1) == 2 && acct(1).getInt(2) == 2 && !acct(1).getBoolean(3))
    // odd budget: head gets the extra token
    val odd = CorpusOps
      .truncateTokens(df.filter(col("id") === 1), col("id"), col("text"), maxTokens = 5)
      .collect()(0)
      .getString(4)
    assert(odd == "t1 t2 t3 t7 t8")
  }

  test("topicAssign: planted structure recovers labels with positive margin") {
    import spark.implicits._
    // two well-separated topics in 4-dim space
    val vecs = Seq(
      (1L, 0L, Array(1.0, 0.1, 0.0, 0.0)),
      (2L, 0L, Array(0.9, 0.0, 0.1, 0.0)),
      (3L, 1L, Array(0.0, 0.1, 1.0, 0.2)),
      (4L, 1L, Array(0.1, 0.0, 0.8, 0.1))
    ).toDF("vec_id", "label", "v")
    val cents = Similarity.trainTopicCentroids(vecs, col("label"), col("v"))
    assert(cents.map(_._1) == Seq(0L, 1L))
    val rows = Similarity
      .topicAssign(vecs, col("vec_id"), col("v"), cents)
      .orderBy("vec_id")
      .collect()
    val labels = Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
    rows.foreach { r =>
      assert(r.getLong(1) == labels(r.getLong(0)), s"vec ${r.getLong(0)}")
      assert(r.getDouble(3) > 0.0) // margin strictly positive
    }
  }

  test("topicAssign: single centroid — margin undefined (null), no ANSI throw") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "v")
    val rows = Similarity
      .topicAssign(vecs, col("vec_id"), col("v"), Seq((7L, Array(1.0, 0.0))))
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 7L && rows(0).getDouble(2) == 1.0)
    assert(rows(0).isNullAt(3), "margin must be null with one centroid")
  }

  test("blocklistGate: non-word-edge phrases (c++, c#) match without \\b anchors") {
    import spark.implicits._
    val df = Seq(
      (1L, "we write C++ and c# here"),
      (2L, "use c++11 today"), // leading \b only — trailing edge is non-word
      (3L, "scanner vector-free") // word-edge phrase still whole-word gated
    ).toDF("id", "text")
    val rows = TextOps
      .blocklistGate(df, col("id"), col("text"), Seq("c++", "c#", "vector"))
      .orderBy("doc_id")
      .collect()
    assert(rows(0).getInt(1) == 2 && rows(0).getString(2) == "c++")
    assert(rows(1).getInt(1) == 1 && rows(1).getBoolean(3))
    assert(rows(2).getInt(1) == 1 && rows(2).getString(2) == "vector")
  }
}
