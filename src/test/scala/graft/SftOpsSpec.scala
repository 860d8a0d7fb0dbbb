package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Audit, ChatOps, Similarity, TextOps}

/** Hand-computed unit expectations for the round-9 SFT / post-training
  * family: transcript parsing, loss-mask accounting, preference pairs,
  * Bradley–Terry fitting, RRF fusion, alpha-rename canonicalization, PSI
  * drift, and Kneser–Ney bigram probabilities.
  */
class SftOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val transcript =
    "garbage\nsystem: be brief\nuser: hi\nmore context\nassistant: hello there\n" +
      "assistant: extra\nuser: thanks\nassistant: "

  test("parseTranscript: grammar — orphans, continuation lines, empty turns") {
    val df = Seq((1L, transcript)).toDF("doc_id", "text")
    val row = ChatOps.parseTranscript(df, col("doc_id"), col("text")).collect().head
    assert(row.getAs[Int]("n_lines") == 8)
    assert(row.getAs[Int]("n_orphan_lines") == 1)
    val turns = row.getAs[collection.Seq[Row]]("turns").map(r => (r.getString(0), r.getString(1)))
    assert(
      turns.toSeq == Seq(
        ("system", "be brief"),
        ("user", "hi\nmore context"),
        ("assistant", "hello there"),
        ("assistant", "extra"),
        ("user", "thanks"),
        ("assistant", "")
      )
    )
  }

  test("parseTranscript: no heads → zero turns, all lines orphaned") {
    val df = Seq((1L, "just some text\nsecond line")).toDF("doc_id", "text")
    val row = ChatOps.parseTranscript(df, col("doc_id"), col("text")).collect().head
    assert(row.getAs[collection.Seq[Row]]("turns").isEmpty)
    assert(row.getAs[Int]("n_orphan_lines") == 2)
  }

  test("chatStats: counts, repeats, shape booleans, fp") {
    val df = Seq((1L, transcript)).toDF("doc_id", "text")
    val row = ChatOps
      .chatStats(ChatOps.parseTranscript(df, col("doc_id"), col("text")))
      .collect()
      .head
    assert(row.getAs[Int]("n_turns") == 6)
    assert(row.getAs[Int]("n_system") == 1)
    assert(row.getAs[Int]("n_user") == 2)
    assert(row.getAs[Int]("n_assistant") == 3)
    assert(row.getAs[Int]("n_empty_turns") == 1)
    assert(row.getAs[Int]("n_role_repeats") == 1)
    assert(row.getAs[Boolean]("starts_system"))
    assert(row.getAs[Boolean]("ends_assistant"))
    // fp is the md5 of the canonical rebuild — pin it against an
    // independently computed digest of the expected turn structure
    val expected = Seq(
      ("system", "be brief"),
      ("user", "hi\nmore context"),
      ("assistant", "hello there"),
      ("assistant", "extra"),
      ("user", "thanks"),
      ("assistant", "")
    ).map { case (r, c) => r + "\u0001" + c }.mkString("\u0002")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getAs[String]("fp") == hex)
  }

  test("lossMass: assistant-token accounting") {
    val df = Seq((1L, transcript)).toDF("doc_id", "text")
    val row = ChatOps
      .lossMass(ChatOps.parseTranscript(df, col("doc_id"), col("text")))
      .collect()
      .head
    // tokens per turn: 2, 3, 2, 1, 1, 0 → total 9; assistant: 2+1+0 = 3
    assert(row.getAs[Int]("total_tokens") == 9)
    assert(row.getAs[Int]("loss_tokens") == 3)
    assert(row.getAs[Double]("loss_frac") == 0.333333)
  }

  test("preferencePairs: argmax/argmin with tie-breaks, margin gate") {
    val df = Seq(
      ("A", 1L, 0.5),
      ("A", 2L, 0.9),
      ("A", 3L, 0.9), // tie on score → higher cand id wins chosen
      ("B", 4L, 0.7), // singleton → dropped
      ("C", 5L, 0.4),
      ("C", 6L, 0.4) // zero margin → dropped
    ).toDF("p", "c", "s")
    val got = ChatOps
      .preferencePairs(df, col("p"), col("c"), col("s"))
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("prompt_id") == "A")
    assert(r.getAs[Long]("chosen_id") == 3L)
    assert(r.getAs[Long]("rejected_id") == 1L)
    assert(r.getAs[Double]("margin") == 0.4)
    assert(r.getAs[Long]("n_candidates") == 3L)
  }

  test("preferencePairs: null-score candidates counted out, never drop the group") {
    val df = Seq(
      ("A", 1L, Option(0.2)),
      ("A", 2L, None), // null score must not null the min() struct
      ("A", 3L, Option(0.8)),
      ("B", 4L, None), // no scored candidates at all → gated out (n < 2)
      ("B", 5L, None)
    ).toDF("p", "c", "s")
    val got = ChatOps
      .preferencePairs(df, col("p"), col("c"), col("s"))
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("prompt_id") == "A")
    assert(r.getAs[Long]("chosen_id") == 3L)
    assert(r.getAs[Long]("rejected_id") == 1L)
    assert(r.getAs[Double]("margin") == 0.6)
    assert(r.getAs[Long]("n_candidates") == 2L)
    assert(r.getAs[Long]("n_null_scores") == 1L)
  }

  test("rejectionSample: top-N above gate, tie-breaks, full accounting, map-side limit plan") {
    val df = Seq(
      ("A", 1L, Option(0.9)),
      ("A", 2L, Option(0.9)), // tie with 1 → higher cand id ranks first
      ("A", 3L, Option(0.6)),
      ("A", 4L, Option(0.2)), // below gate
      ("A", 5L, None), // null score
      ("B", 6L, Option(0.1)), // all below gate → no kept rows, only accounting
      ("C", 7L, Option(0.7))
    ).toDF("p", "c", "s")
    val got = ChatOps
      .rejectionSample(df, col("p"), col("c"), col("s"), minScore = 0.5, topN = 2)
    val rows = got.orderBy(col("prompt_id"), col("rank")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq ==
      Seq(("A", 2L, 1), ("A", 1L, 2), ("C", 7L, 1)))
    val a = rows.head
    assert(a.getAs[Long]("n_scored") == 4L && a.getAs[Long]("n_below") == 1L &&
      a.getAs[Long]("n_null_scores") == 1L)
    // the scale claim: rank<=N over the window must plan as WindowGroupLimit
    assert(
      got.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "top-N must plan map-side WindowGroupLimit"
    )
  }

  test("fimTransform: sentinel round-trip reproduces the document; gates and modes hold") {
    val docs = (1L to 400L).map(i => (i, s"doc $i " + ("abcdefghij" * 6).take(40 + (i % 30).toInt))) ++
      Seq((1001L, "tiny"), (1002L, "")) // below minChars → plain
    val df = docs.toDF("id", "text")
    val got = TextOps
      .fimTransform(df, col("id"), col("text"), fimRate = 0.8, spmRate = 0.5, minChars = 20)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(got(1001L).getString(1) == "plain" && got(1001L).getString(2) == "tiny")
    assert(got(1002L).getString(1) == "plain" && got(1002L).isNullAt(4))
    val modes = got.values.map(_.getString(1)).groupBy(identity).view.mapValues(_.size).toMap
    assert(modes.keySet == Set("psm", "spm", "plain") && modes("psm") > 50 && modes("spm") > 50)
    val orig = docs.toMap
    got.values.filter(_.getString(1) != "plain").foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(2))
      val reassembled = r.getString(1) match {
        case "psm" => // <PRE>p<SUF>s<MID>m → p+m+s
          val p = t.stripPrefix("<PRE>")
          val Array(pre, rest) = p.split("<SUF>", 2)
          val Array(sufx, midl) = rest.split("<MID>", 2)
          pre + midl + sufx
        case "spm" => // <PRE><SUF>s<MID>p⊕m → (p⊕m) then s
          val rest = t.stripPrefix("<PRE><SUF>")
          val Array(sufx, pm) = rest.split("<MID>", 2)
          pm + sufx
      }
      assert(reassembled == orig(id), s"round-trip failed for doc $id mode ${r.getString(1)}")
      assert(r.getInt(4) <= r.getInt(5) && r.getInt(4) >= 1 && r.getInt(5) <= r.getInt(3) - 1)
    }
  }

  test("bradleyTerry: ordering, records, normalization, determinism") {
    val comps = Seq(
      ("a", "b"), ("a", "b"), ("a", "b"),
      ("b", "c"), ("b", "c"),
      ("a", "c")
    ).toDF("winner", "loser")
    val got = ChatOps.bradleyTerry(comps, iters = 8).orderBy(col("rank")).collect()
    assert(got.map(_.getAs[String]("item")).toSeq == Seq("a", "b", "c"))
    val byItem = got.map(r => r.getAs[String]("item") -> r).toMap
    assert(byItem("a").getAs[Long]("wins") == 4 && byItem("a").getAs[Long]("losses") == 0)
    assert(byItem("b").getAs[Long]("wins") == 2 && byItem("b").getAs[Long]("losses") == 3)
    assert(byItem("c").getAs[Long]("wins") == 0 && byItem("c").getAs[Long]("losses") == 3)
    val total = got.map(_.getAs[Double]("strength")).sum
    assert(math.abs(total - 3.0) < 1e-4)
    val again = ChatOps.bradleyTerry(comps, iters = 8).orderBy(col("rank")).collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("bradleyTerry: symmetric record → equal strengths, item tie-break") {
    val comps = Seq(("a", "b"), ("b", "a")).toDF("winner", "loser")
    val got = ChatOps.bradleyTerry(comps, iters = 6).orderBy(col("rank")).collect()
    assert(got.map(_.getAs[Double]("strength")).distinct.length == 1)
    assert(got.map(_.getAs[String]("item")).toSeq == Seq("a", "b"))
  }

  test("rrfFuse: hand-computed fusion scores and ranks") {
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3)).toDF("query_id", "id", "rank")
    val b = Seq((0L, 11L, 1), (0L, 13L, 2)).toDF("query_id", "id", "rank")
    val got = Similarity
      .rrfFuse(Seq(a, b), kConst = 60, topK = 10)
      .orderBy(col("fused_rank"))
      .collect()
    val byId = got.map(r => r.getAs[Long]("id") -> r).toMap
    // 11: 1/62 + 1/61 = 0.0325224747 → 0.032522 ; 10: 1/61 = 0.016393 ; 13: 1/62 = 0.016129
    assert(byId(11L).getAs[Double]("rrf") == 0.032522)
    assert(byId(11L).getAs[Long]("n_lists") == 2)
    assert(byId(10L).getAs[Double]("rrf") == 0.016393)
    assert(byId(13L).getAs[Double]("rrf") == 0.016129)
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(11L, 10L, 13L, 12L))
    // 12 (1/63 = 0.015873) ranks last, below 13 (1/62)
  }

  test("alphaRename: naming-invariant, structure-sensitive, keywords survive") {
    val df = Seq(
      (1L, "def foo ( bar , baz ) : return bar * baz + 7"),
      (2L, "def g ( x , y ) : return x * y + 7"), // alpha-equivalent to 1
      (3L, "def g ( x , y ) : return y * x + 7"), // different structure
      (4L, "1 + 2") // no identifiers
    ).toDF("doc_id", "code")
    val got = TextOps
      .alphaRename(df, col("doc_id"), col("code"))
      .orderBy(col("doc_id"))
      .collect()
    assert(got(0).getAs[String]("canonical") == "def v1 ( v2 , v3 ) : return v2 * v3 + 7")
    assert(got(0).getAs[String]("fp") == got(1).getAs[String]("fp"))
    assert(got(2).getAs[String]("canonical") == "def v1 ( v2 , v3 ) : return v3 * v2 + 7")
    assert(got(2).getAs[String]("fp") != got(0).getAs[String]("fp"))
    assert(got(3).getAs[String]("canonical") == "1 + 2")
    assert(got(3).getAs[Int]("n_idents") == 0)
    assert(got(0).getAs[Int]("n_idents") == 3)
  }

  test("driftReport: hand-computed PSI with smoothing") {
    val df = Seq(
      ("g", false, 10.0), ("g", false, 10.0), ("g", false, 110.0),
      ("g", true, 10.0), ("g", true, 110.0), ("g", true, 110.0)
    ).toDF("grp", "in_b", "v")
    val row = Audit
      .driftReport(df, col("grp"), col("in_b"), col("v"), binWidth = 100.0, nBins = 2)
      .collect()
      .head
    assert(row.getAs[Long]("n_a") == 3 && row.getAs[Long]("n_b") == 3)
    assert(row.getAs[Long]("n_bins_observed") == 2)
    // pa = (2.5/4, 1.5/4), pb = (1.5/4, 2.5/4) → psi = 2 · 0.25 · ln(5/3)
    val expected = math.floor(2 * 0.25 * math.log(2.5 / 1.5) * 1e6 + 0.5) / 1e6
    assert(row.getAs[Double]("psi") == expected)
    assert(row.getAs[Boolean]("drifted"))
  }

  test("driftReport: identical snapshots → psi 0, not drifted") {
    val df = Seq(
      ("g", false, 10.0), ("g", false, 110.0),
      ("g", true, 10.0), ("g", true, 110.0)
    ).toDF("grp", "in_b", "v")
    val row = Audit
      .driftReport(df, col("grp"), col("in_b"), col("v"), binWidth = 100.0, nBins = 2)
      .collect()
      .head
    assert(row.getAs[Double]("psi") == 0.0)
    assert(!row.getAs[Boolean]("drifted"))
  }

  test("knBigram: hand-computed interpolated Kneser–Ney probabilities") {
    val df = Seq("a b a b c", "b a").toDF("text")
    val got = TextOps.knBigram(df, col("text"), discount = 0.75, topK = 20).collect()
    val m = got.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r).toMap
    assert(m(("a", "b")).getAs[Long]("c") == 2)
    assert(m(("b", "a")).getAs[Long]("c") == 2)
    assert(m(("b", "c")).getAs[Long]("c") == 1)
    // P(b|a) = 1.25/2 + 0.75·(1/2)·(1/3) = 0.75
    assert(m(("a", "b")).getAs[Double]("p_kn") == 0.75)
    // P(a|b) = 1.25/3 + 0.75·(2/3)·(1/3) = 0.583333
    assert(m(("b", "a")).getAs[Double]("p_kn") == 0.583333)
    // P(c|b) = 0.25/3 + 0.75·(2/3)·(1/3) = 0.25
    assert(m(("b", "c")).getAs[Double]("p_kn") == 0.25)
    // ordering: count desc, then w1, w2
    assert(
      got.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSeq ==
        Seq(("a", "b"), ("b", "a"), ("b", "c"))
    )
  }

  test("renderTemplate: render-parse is a fixed point; exact rendering") {
    val df = Seq((1L, transcript)).toDF("doc_id", "text")
    val parsed = ChatOps.parseTranscript(df, col("doc_id"), col("text"))
    val rendered = ChatOps.renderTemplate(parsed)
    val rtext = rendered.collect().head.getAs[String]("rendered")
    assert(
      rtext == "system: be brief\nuser: hi\nmore context\nassistant: hello there\n" +
        "assistant: extra\nuser: thanks\nassistant: "
    )
    val fp1 = ChatOps.chatStats(parsed).collect().head.getAs[String]("fp")
    val fp2 = ChatOps
      .chatStats(
        ChatOps.parseTranscript(rendered.select(col("doc_id"), col("rendered")), col("doc_id"), col("rendered"))
      )
      .collect()
      .head
      .getAs[String]("fp")
    assert(fp1 == fp2)
  }

  test("winMatrix: unordered pairs, wins of the smaller item, win rate") {
    val comps = Seq(
      ("a", "b"), ("a", "b"), ("a", "b"), // a beats b x3
      ("b", "a"), // b beats a x1
      ("c", "b"), ("c", "b") // c beats b x2
    ).toDF("winner", "loser")
    val got = ChatOps.winMatrix(comps).orderBy(col("item_a"), col("item_b")).collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("item_a") == "a" && got(0).getAs[String]("item_b") == "b")
    assert(got(0).getAs[Long]("n") == 4 && got(0).getAs[Long]("wins_a") == 3)
    assert(got(0).getAs[Double]("winrate_a") == 0.75)
    assert(got(1).getAs[String]("item_a") == "b" && got(1).getAs[String]("item_b") == "c")
    assert(got(1).getAs[Long]("n") == 2 && got(1).getAs[Long]("wins_a") == 0)
    assert(got(1).getAs[Double]("winrate_a") == 0.0)
  }

  test("bestOfN: running max per prompt, prompts-with->=k counting") {
    val df = Seq(
      ("p1", 1L, 0.3), ("p1", 2L, 0.9), ("p1", 3L, 0.1), ("p1", 4L, 0.5),
      ("p2", 5L, 0.2), ("p2", 6L, 0.4)
    ).toDF("p", "o", "s")
    val got = ChatOps
      .bestOfN(df, col("p"), col("o"), col("s"))
      .orderBy(col("k"))
      .collect()
    val m = got.map(r => r.getAs[Int]("k") -> r).toMap
    assert(m(1).getAs[Long]("n_prompts") == 2 && m(1).getAs[Double]("mean_best") == 0.25)
    assert(m(2).getAs[Long]("n_prompts") == 2 && m(2).getAs[Double]("mean_best") == 0.65)
    assert(m(4).getAs[Long]("n_prompts") == 1 && m(4).getAs[Double]("mean_best") == 0.9)
    assert(!m.contains(8))
  }

  test("cohenKappa: hand-computed po/pe/kappa, perfect and degenerate cases") {
    val df = Seq(
      ("g", 0, 0), ("g", 0, 0), ("g", 0, 0), ("g", 1, 1), ("g", 1, 1), ("g", 0, 1),
      ("h", 2, 2), ("h", 3, 3), // perfect, two labels
      ("z", 5, 5), ("z", 5, 5) // constant -> pe=1 -> kappa null
    ).toDF("grp", "a", "b")
    val got = Audit.cohenKappa(df, col("grp"), col("a"), col("b")).collect()
    val m = got.map(r => r.getAs[String]("grp") -> r).toMap
    assert(m("g").getAs[Long]("n") == 6)
    assert(m("g").getAs[Double]("po") == 0.833333)
    assert(m("g").getAs[Double]("pe") == 0.5)
    assert(m("g").getAs[Double]("kappa") == 0.666667)
    assert(m("h").getAs[Double]("kappa") == 1.0)
    assert(m("z").getAs[Double]("pe") == 1.0 && m("z").get(m("z").fieldIndex("kappa")) == null)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  test("flattenTree: chain depths/roots/fps; cycle, dangling, over-depth flagged; dup ids collapse") {
    val nodes = Seq(
      (1L, None), // root
      (2L, Some(1L)),
      (3L, Some(2L)),
      (4L, Some(3L)), // depth 3 > maxDepth=2 -> flagged
      (10L, None), // isolated root
      (20L, Some(21L)), (21L, Some(20L)), // 2-cycle
      (30L, Some(99L)), // dangling parent
      (5L, Some(1L)), (5L, Some(10L)) // duplicate id -> min parent (1)
    ).toDF("id", "parent")
    val got = ChatOps.flattenTree(nodes, maxDepth = 2).collect()
    val m = got.map(r => r.getAs[Long]("id") -> r).toMap
    assert(got.length == 9) // dup id collapsed
    def res(id: Long): (Any, Any, Boolean) =
      (m(id).get(m(id).fieldIndex("root_id")), m(id).get(m(id).fieldIndex("depth")), m(id).getAs[Boolean]("is_resolved"))
    assert(res(1L) == (1L, 0, true))
    assert(res(2L) == (1L, 1, true))
    assert(res(3L) == (1L, 2, true))
    assert(res(10L) == (10L, 0, true))
    assert(res(5L) == (1L, 1, true))
    assert(m(3L).getAs[String]("path_fp") == md5Hex("1/2/3"))
    for (id <- Seq(4L, 20L, 21L, 30L)) {
      val r = m(id)
      assert(!r.getAs[Boolean]("is_resolved"), s"node $id must be flagged")
      assert(r.get(r.fieldIndex("root_id")) == null && r.get(r.fieldIndex("path_fp")) == null)
    }
  }

  test("groupAdvantage: rounded-moment normalization, degenerate std, null rewards counted") {
    val df = Seq(
      ("p1", 1L, Some(1.0)), ("p1", 2L, Some(2.0)), ("p1", 3L, Some(3.0)),
      ("p2", 4L, Some(5.0)),
      ("p3", 5L, Some(1.0)), ("p3", 6L, None)
    ).toDF("p", "c", "r")
    val got = ChatOps
      .groupAdvantage(df, col("p"), col("c"), col("r"))
      .orderBy(col("prompt_id"), col("cand_id"))
      .collect()
    val m = got.map(r => (r.getAs[String]("prompt_id"), r.getAs[Long]("cand_id")) -> r).toMap
    // p1: mean 2, std_pop = sqrt(2/3) -> 0.816497 rounded; adv from ROUNDED moments
    assert(m(("p1", 1L)).getAs[Double]("std_r") == 0.816497)
    assert(m(("p1", 1L)).getAs[Double]("advantage") == math.rint(-1.0 / 0.816497 * 1e6) / 1e6)
    assert(m(("p1", 2L)).getAs[Double]("advantage") == 0.0)
    // p2: single candidate -> std 0 -> advantage 0.0 (not null, not NaN)
    assert(m(("p2", 4L)).getAs[Double]("std_r") == 0.0 && m(("p2", 4L)).getAs[Double]("advantage") == 0.0)
    // p3: the null reward is null-advantage and counted, the scored one normalizes
    val r3n = m(("p3", 6L))
    assert(r3n.get(r3n.fieldIndex("advantage")) == null)
    assert(r3n.getAs[Long]("n_scored") == 1 && r3n.getAs[Long]("n_null") == 1)
    assert(m(("p3", 5L)).getAs[Double]("advantage") == 0.0) // single scored -> std 0
  }

  test("groupAdvantage: out-of-contract rewards fail loudly, never silently round") {
    // >6dp: the decimal(18,6) exact-sum cast would silently round it
    val sub6dp = Seq(("p1", 1L, 0.1234567)).toDF("p", "c", "r")
    val e1 = intercept[Exception] {
      ChatOps.groupAdvantage(sub6dp, col("p"), col("c"), col("r")).collect()
    }
    assert(e1.getMessage.contains("6 decimal places") || e1.getCause != null)
    // |r| >= 1e12: past decimal(18,6) integer range (overflow -> null under non-ANSI)
    val big = Seq(("p1", 1L, 1.5e12)).toDF("p", "c", "r")
    intercept[Exception] {
      ChatOps.groupAdvantage(big, col("p"), col("c"), col("r")).collect()
    }
    // boundary values still pass: exactly 6dp, large-but-legal magnitude
    val ok = Seq(("p1", 1L, 0.123456), ("p1", 2L, 999999999999.0)).toDF("p", "c", "r")
    assert(ChatOps.groupAdvantage(ok, col("p"), col("c"), col("r")).count() == 2)
  }

  test("spanCorrupt: sentinel round-trip reconstructs the original; short docs pass through") {
    val text = "The quick brown fox jumps over the lazy dog while the band plays on tonight."
    val df = Seq((7L, text), (8L, "too short")).toDF("doc_id", "text")
    val got = TextOps.spanCorrupt(df, col("doc_id"), col("text")).collect()
    val m = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val c = m(7L)
    assert(c.getAs[String]("mode") == "corrupt")
    val input = c.getAs[String]("input")
    val targets = c.getAs[String]("targets")
    // targets = <X0>span1<X1>span2; splice the spans back over the sentinels
    val Array(_, rest) = targets.split("<X0>", 2)
    val Array(span1, span2) = rest.split("<X1>", 2)
    assert(span1.length == span2.length && span1.length * 2 == c.getAs[Int]("n_masked"))
    val rebuilt = input.replace("<X0>", span1).replace("<X1>", span2)
    assert(rebuilt == text, s"round-trip failed: $rebuilt")
    // sentinel order: <X0> strictly before <X1>, both present exactly once
    assert(input.indexOf("<X0>") >= 0 && input.indexOf("<X1>") > input.indexOf("<X0>"))
    val p = m(8L)
    assert(p.getAs[String]("mode") == "plain" && p.getAs[String]("input") == "too short")
    assert(p.get(p.fieldIndex("targets")) == null && p.getAs[Int]("n_masked") == 0)
  }

  test("rougeN: hand-computed clipped bigram overlap, zero-gram sides, multiset clipping") {
    import spark.implicits._
    val df = Seq(
      // cand bigrams: {ab, bc, ca, ab}; ref bigrams: {ab, bd}
      // clipped overlap = min(2,1)[ab] = 1; p = 1/4, r = 1/2, f1 = 1/3
      (1L, "a b c a b", "a b d"),
      // identical -> p = r = f1 = 1
      (2L, "x y z", "x y z"),
      // ref shorter than n=2 -> zero ref grams: recall 0, f1 0
      (3L, "x y", "x"),
      // disjoint -> overlap 0
      (4L, "a b", "c d")
    ).toDF("id", "cand", "ref")
    val got = TextOps
      .rougeN(df, col("id"), col("cand"), col("ref"), n = 2)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_cand") == 4 && r1.getAs[Long]("n_ref") == 2)
    assert(r1.getAs[Long]("overlap") == 1)
    assert(r1.getAs[Double]("precision") == 0.25 && r1.getAs[Double]("recall") == 0.5)
    assert(r1.getAs[Double]("f1") == 0.333333)
    assert(got(2L).getAs[Double]("f1") == 1.0)
    val r3 = got(3L)
    assert(r3.getAs[Long]("n_ref") == 0 && r3.getAs[Double]("recall") == 0.0 && r3.getAs[Double]("f1") == 0.0)
    assert(got(4L).getAs[Long]("overlap") == 0 && got(4L).getAs[Double]("f1") == 0.0)
  }

  test("gaeAdvantage: hand-computed 3-step trajectory matches the reverse recursion") {
    import spark.implicits._
    // traj 1: r = [1, 0.5, 0.25], v = [0.5, 0.25, 0.125]; γ = λ = 0.5
    // δ2 = 0.25 − 0.125 = 0.125
    // δ1 = 0.5 + 0.5·0.125 − 0.25 = 0.3125
    // δ0 = 1 + 0.5·0.25 − 0.5 = 0.625
    // A2 = 0.125; A1 = 0.3125 + 0.25·0.125 = 0.34375
    // A0 = 0.625 + 0.25·0.34375 = 0.7109375
    val df = Seq(
      (1L, 0, 1.0, 0.5), (1L, 1, 0.5, 0.25), (1L, 2, 0.25, 0.125),
      // single-step trajectory: δ = A = r − v
      (2L, 0, 1.0, 0.25)
    ).toDF("traj", "step", "r", "v")
    val got = ChatOps
      .gaeAdvantage(df, col("traj"), col("step"), col("r"), col("v"), 0.5, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got((1L, 0)) == ((0.625, 0.710938, 1.210938)))
    assert(got((1L, 1)) == ((0.3125, 0.34375, 0.59375)))
    assert(got((1L, 2)) == ((0.125, 0.125, 0.25)))
    assert(got((2L, 0)) == ((0.75, 0.75, 1.0)))
  }

  test("klEstimators: p=q reads zero on all estimators; hand case; null accounting") {
    import spark.implicits._
    val same = Seq((1L, -0.5, -0.5), (1L, -0.25, -0.25)).toDF("p", "lp", "lq")
    val z = ChatOps.klEstimators(same, col("p"), col("lp"), col("lq")).head()
    assert(z.getAs[Double]("k1") == 0.0 && z.getAs[Double]("k2") == 0.0 && z.getAs[Double]("k3") == 0.0)
    // r = 0.5 for both tokens: k1 = -0.5, k2 = 0.125,
    // k3 = round(e^0.5 - 1.5, 6) = 0.148721
    val df = Seq((2L, -1.0, -0.5), (2L, -0.75, -0.25)).toDF("p", "lp", "lq")
    val g = ChatOps.klEstimators(df, col("p"), col("lp"), col("lq")).head()
    assert(g.getAs[Long]("n_tokens") == 2 && g.getAs[Double]("mean_lr") == 0.5)
    assert(g.getAs[Double]("k1") == -0.5 && g.getAs[Double]("k2") == 0.125)
    assert(g.getAs[Double]("k3") == 0.148721)
    // null log-probs are counted out, not poisoning the means
    val withNull =
      Seq((3L, Some(-1.0), Some(-0.5)), (3L, None, Some(-0.25))).toDF("p", "lp", "lq")
    val n = ChatOps.klEstimators(withNull, col("p"), col("lp"), col("lq")).head()
    assert(n.getAs[Long]("n_tokens") == 1 && n.getAs[Long]("n_null") == 1)
    assert(n.getAs[Double]("mean_lr") == 0.5)
  }

  test("WordPieceSegment: greedy longest match, unk fallback, boundary cases") {
    import spark.implicits._
    val vocab = Seq("un", "related", "rel", "ated", "a", "t", "e", "d", " ")
    val got = Seq("unrelated", "zzz", "a t", "").toDF("t")
      .select(graft.functions.text.wordpiece_segment(col("t"), vocab).as("s"))
      .select(col("s.pieces"), col("s.n_unk"))
      .collect()
      .map(r => (r.getSeq[String](0).toList, r.getInt(1)))
    // greedy: "un" then "related" (longest at pos 2 beats "rel")
    assert(got(0) == ((List("un", "related"), 0)))
    assert(got(1) == ((List("<unk>", "<unk>", "<unk>"), 3)))
    assert(got(2) == ((List("a", " ", "t"), 0)))
    assert(got(3) == ((Nil, 0)))
  }

  test("NfcStats: decomposed composes (changed, shorter), composed and ASCII are no-ops") {
    import spark.implicits._
    val rows = Seq(
      "caf" + "e\u0301",  // decomposed: e + combining acute -> composes
      "caf\u00e9",        // already NFC
      "plain ascii",
      "e\u0301\u0301"     // e + acute + acute: first composes, second stays
    ).toDF("t")
    val got = rows
      .select(graft.functions.text.nfc_stats(col("t")).as("s"))
      .select(col("s.changed"), col("s.len_before"), col("s.len_after"))
      .collect()
      .map(r => (r.getBoolean(0), r.getInt(1), r.getInt(2)))
    assert(got(0) == ((true, 5, 4)))
    assert(got(1) == ((false, 4, 4)))
    assert(got(2) == ((false, 11, 11)))
    assert(got(3) == ((true, 3, 2)))
  }

  test("LuhnScan: classic vectors, check-digit flip, maximal-run rule, short-run noise") {
    import spark.implicits._
    val rows = Seq(
      "pay 4111111111111111 now",          // classic Visa-16 test: valid
      "pay 4111111111111112 now",          // check digit off by one: run counted, invalid
      "visa13 4222222222222 ok",           // classic Visa-13 test: valid
      "long 12345678901234567890 run",     // 20 digits: maximal rule -> no candidate
      "short 123456789012 only",           // 12 digits: below window
      "two 4111111111111111 and 5500005555555559 cards", // both valid (MC-16 test)
      "no digits here"
    ).toDF("t")
    val got = rows
      .select(graft.functions.text.luhn_scan(col("t")).as("s"))
      .select(col("s.n_digit_runs"), col("s.n_luhn_valid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(got(0) == ((1, 1)))
    assert(got(1) == ((1, 0)))
    assert(got(2) == ((1, 1)))
    assert(got(3) == ((0, 0)))
    assert(got(4) == ((0, 0)))
    assert(got(5) == ((2, 2)))
    assert(got(6) == ((0, 0)))
  }

  test("AhoCorasickCount: equals the per-phrase regexp_count sum on nested/overlapping phrases") {
    import spark.implicits._
    val phrases = Seq("aa", "aab", "ab", "ba", "spark", "spar", "ar", "x[y]z")
    val rows = Seq(
      "aaaa",             // 'aa' non-overlap = 2; 'aab' 0; 'ab' 0; 'ba' 0
      "aabab",            // 'aa' 1, 'aab' 1, 'ab' 2, 'ba' 1
      "sparksparspark",   // 'spark' 2, 'spar' non-overlap greedy = 3, 'ar' 3
      "x[y]z literal ok", // regex metachars must count literally
      "",                 // zero everything
      "no hits here!"
    ).toDF("t")
    val got = rows
      .select(
        graft.functions.text.ac_count(col("t"), phrases).as("ac"),
        phrases
          .map(p => regexp_count(col("t"), lit(java.util.regex.Pattern.quote(p))).cast("long"))
          .reduce(_ + _)
          .as("rx")
      )
      .as[(Long, Long)]
      .collect()
    got.zipWithIndex.foreach { case ((ac, rx), i) => assert(ac == rx, s"row $i: ac=$ac rx=$rx") }
    // pin the hand-computed values too (not just self-consistency)
    assert(got.map(_._1).toSeq == Seq(2L, 5L, 8L, 1L, 0L, 0L))
  }

  test("specialTokenScan: zero rows evidenced, overlap-free literal counting, regex metachars inert") {
    import spark.implicits._
    val df = Seq(
      "clean text",
      "x <|im_start|>user hi <|im_start|>bot",
      "[INST] a [/INST]",
      null
    ).toDF("t")
    val got = TextOps
      .specialTokenScan(df, col("t"), Seq("<|im_start|>", "[INST]", "### Instruction:"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(
      got == Set(
        ("<|im_start|>", 1L, 2L),    // one doc, two hits
        ("[INST]", 1L, 1L),          // [/INST] must NOT count; brackets are literal
        ("### Instruction:", 0L, 0L) // absent probe still emits its zero row
      )
    )
  }
}
