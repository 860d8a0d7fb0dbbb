package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import scala.util.Random

import graft.functions.{codecs, text => ftext}

/** Seeded randomized properties over the pure native kernels (no Spark
  * job needed — expressions evaluate directly) plus two operator-level
  * invariants that do need the engine. Complements the deterministic
  * hand-case specs: the fuzz sweeps the input space the hand cases
  * can't enumerate.
  */
class KernelFuzzSpec extends SparkTestBase {

  test("PcmFrames: random byte planes match an independent recompute exactly") {
    val r = new Random(1234)
    for (_ <- 0 until 100) {
      val n = r.nextInt(200)
      val bytes = Array.fill(n)(r.nextInt(256).toByte)
      val frameSize = 1 + r.nextInt(16)
      val got = codecs
        .PcmFrames(Literal(bytes, BinaryType), frameSize)
        .eval(null)
        .asInstanceOf[ArrayData]
      val nf = n / frameSize
      assert(got.numElements() == nf, s"frame count at n=$n fs=$frameSize")
      for (f <- 0 until nf) {
        val row = got.getStruct(f, 4)
        val samples = (f * frameSize until (f + 1) * frameSize).map(i => (bytes(i) & 0xff).toLong)
        val sq = samples.map(x => x * x).sum
        val sm = samples.sum
        assert(row.getLong(2) == sq && row.getLong(3) == sm)
        assert(row.getDouble(0) == math.sqrt(sq.toDouble / frameSize))
        assert(row.getDouble(1) == sm.toDouble / frameSize)
      }
    }
  }

  test("Pcm16Frames: random signed-LE16 planes match an independent recompute exactly") {
    val r = new Random(4321)
    for (_ <- 0 until 100) {
      val nSamples = r.nextInt(200)
      val samples = Array.fill(nSamples)(r.nextInt(65536).toShort)
      // occasionally append a dangling odd byte — it must drop silently
      val odd = r.nextBoolean()
      val bytes = new Array[Byte](nSamples * 2 + (if (odd) 1 else 0))
      for (i <- 0 until nSamples) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val frameSize = 1 + r.nextInt(16)
      val got = codecs
        .Pcm16Frames(Literal(bytes, BinaryType), frameSize)
        .eval(null)
        .asInstanceOf[ArrayData]
      val nf = nSamples / frameSize
      assert(got.numElements() == nf, s"frame count at n=$nSamples fs=$frameSize odd=$odd")
      for (f <- 0 until nf) {
        val row = got.getStruct(f, 4)
        val xs = (f * frameSize until (f + 1) * frameSize).map(i => samples(i).toLong)
        val sq = xs.map(x => x * x).sum
        val sm = xs.sum // signed — negative sums are the point
        assert(row.getLong(2) == sq && row.getLong(3) == sm)
        assert(row.getDouble(0) == math.sqrt(sq.toDouble / frameSize))
        assert(row.getDouble(1) == sm.toDouble / frameSize)
      }
    }
  }

  test("WindowMd5s: random token streams match java MessageDigest windows") {
    val r = new Random(99)
    for (_ <- 0 until 50) {
      val n = r.nextInt(30)
      val toks = Seq.fill(n)(s"t${r.nextInt(50)}")
      val k = 2 + r.nextInt(4)
      val got = ftext.WindowMd5s(Literal(toks.mkString(" ")), k).eval(null).asInstanceOf[ArrayData]
      val want = (0 to n - k).map { s =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(toks.slice(s, s + k).mkString(" ").getBytes("UTF-8")).toSeq
      }
      val gotSeq = (0 until got.numElements()).map(i => got.getBinary(i).toSeq)
      // a doc shorter than k tokens has no window (empty, not the whole doc)
      assert(gotSeq == (if (n >= k) want else Seq.empty))
    }
  }

  test("hashUniform/splitFor: random ids (incl. negatives) match a pure-JVM md5 decode") {
    import spark.implicits._
    val r = new Random(7)
    val ids = Seq.fill(200)(r.nextLong()).distinct
    val got = ids.toDF("id")
      .select(
        col("id"),
        graft.operators.CorpusOps.hashUniform(col("id")).as("u"),
        graft.operators.CorpusOps.splitFor(col("id")).as("s")
      )
      .collect()
      .map(row => row.getLong(0) -> ((row.getDouble(1), row.getString(2))))
      .toMap
    ids.foreach { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val wantU = java.lang.Long.parseLong(hex.substring(0, 7), 16).toDouble / 268435456.0
      val b = hex.substring(0, 2)
      val wantSplit = if (b < "cd") "train" else if (b < "e7") "val" else "test"
      assert(got(id) == ((wantU, wantSplit)), s"id $id: ${got(id)} vs ($wantU, $wantSplit)")
    }
  }

  test("winnow guarantee fuzz: random doc pairs sharing a >=(w+k-1)-token run always share a fingerprint") {
    import spark.implicits._
    val r = new Random(2024)
    val k = 4
    val w = 4
    val pairs = (0 until 20).map { i =>
      val shared = Seq.fill(w + k - 1 + r.nextInt(5))(s"s${i}_${r.nextInt(1000)}")
      val padA = Seq.fill(r.nextInt(10))(s"a${r.nextInt(1000)}")
      val padB = Seq.fill(r.nextInt(10))(s"b${r.nextInt(1000)}")
      val a = (padA ++ shared ++ Seq.fill(r.nextInt(6))(s"a${r.nextInt(1000)}")).mkString(" ")
      val b = (shared ++ padB).mkString(" ")
      (2L * i, a, 2L * i + 1, b)
    }
    val docs = pairs
      .flatMap { case (ia, a, ib, b) => Seq((ia, a), (ib, b)) }
      .toDF("doc_id", "text")
    val fps = graft.operators.CorpusOps
      .winnowFingerprints(docs, col("text"), col("doc_id"), k = k, w = w)
      .collect()
      .map(row => (row.getLong(0), row.getString(2)))
      .groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    pairs.foreach { case (ia, _, ib, _) =>
      assert(
        fps(ia).intersect(fps(ib)).nonEmpty,
        s"pair ($ia, $ib) shares a run but no fingerprint"
      )
    }
  }

  test("epochMixture fuzz: random domain layouts tie out against the closed-form budgets") {
    import spark.implicits._
    val r = new Random(31)
    for (trial <- 0 until 5) {
      val nDomains = 2 + r.nextInt(5)
      val sizes = Seq.fill(nDomains)(1 + r.nextInt(60))
      val docs = sizes.zipWithIndex.flatMap { case (n, d) =>
        (0 until n).map(i => (s"dom$d", (d * 1000 + i).toLong))
      }.toDF("domain", "doc_id")
      val budget = 1L + r.nextInt(200)
      val maxE = 0.5 + r.nextDouble() * 3
      val picks = graft.operators.CorpusOps
        .epochMixture(docs, col("domain"), col("doc_id"), budget, maxE)
        .groupBy(col("domain")).agg(sum(col("n_repeats")))
        .collect()
        .map(row => (row.getString(0), row.getLong(1)))
        .toMap
      val sumW = sizes.map(n => math.sqrt(n.toDouble)).sum
      sizes.zipWithIndex.foreach { case (n, d) =>
        val expect = math.min(
          math.floor(budget.toDouble * math.sqrt(n.toDouble) / sumW),
          math.floor(maxE * n)
        ).toLong
        assert(
          picks(s"dom$d") == expect,
          s"trial $trial dom$d: ${picks(s"dom$d")} vs $expect (n=$n budget=$budget maxE=$maxE)"
        )
      }
    }
  }

  test("WarcSplit: random record streams round-trip; corruption isolates and resyncs") {
    val r = new Random(777)
    def rec(uri: String, payload: String): String =
      s"WARC/1.0\nWARC-Target-URI: $uri\nContent-Length: ${payload.getBytes("UTF-8").length}\n\n$payload\n\n"
    def parse(s: String): Seq[(String, String, Boolean)] = {
      val got = ftext
        .WarcSplit(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType))
        .eval(null)
        .asInstanceOf[ArrayData]
      (0 until got.numElements()).map { i =>
        val row = got.getStruct(i, 3)
        (
          if (row.isNullAt(0)) null else row.getUTF8String(0).toString,
          if (row.isNullAt(1)) null else row.getUTF8String(1).toString,
          row.getBoolean(2)
        )
      }
    }
    for (_ <- 0 until 100) {
      val recs = (0 until r.nextInt(6)).map { i =>
        // payloads may contain newlines, header-ish text, unicode — but
        // never the magic (the documented resync boundary)
        val payload = Seq.fill(r.nextInt(20))(
          Seq("tok", "a\nb", "Content-Length: 9", "é€", "WARC-Target-URI: x")(r.nextInt(5))
        ).mkString(" ")
        (s"https://x/$i", payload)
      }
      val blob = recs.map { case (u, p) => rec(u, p) }.mkString
      val got = parse(blob)
      assert(got == recs.map { case (u, p) => (u, p, true) }, s"clean round trip")

      if (recs.nonEmpty) {
        // truncate the tail: last record invalid, earlier ones untouched
        val cut = blob.substring(0, blob.length - 1 - r.nextInt(2))
        val gotCut = parse(cut)
        assert(gotCut.take(recs.length - 1) == recs.dropRight(1).map { case (u, p) => (u, p, true) })
        assert(gotCut.length == recs.length && !gotCut.last._3, s"tail must invalidate")

        // corrupt the FIRST record's magic: scanner resyncs at record 2
        val broken = "X" + blob.substring(1)
        val gotBroken = parse(broken)
        assert(!gotBroken.head._3, "first record must invalidate")
        assert(gotBroken.tail == recs.tail.map { case (u, p) => (u, p, true) }, "resync must recover the rest")
      }
    }
  }

  test("MaxLineLen: random unicode multi-line text matches the split/length recompute") {
    val r = new Random(4242)
    val alphabet = "abZ09 \t.é€语" // 1-, 2-, and 3-byte UTF-8 chars
    for (_ <- 0 until 200) {
      val nLines = r.nextInt(6)
      val s = (0 until nLines)
        .map(_ => Seq.fill(r.nextInt(30))(alphabet(r.nextInt(alphabet.length))).mkString)
        .mkString("\n")
      val got = ftext
        .MaxLineLen(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType))
        .eval(null)
        .asInstanceOf[Int]
      // split(-1) never yields fewer than one line; CODE POINTS counted,
      // not bytes and not UTF-16 units — the kernel counts UTF-8 starts
      val want = s.split("\n", -1).map(l => l.codePointCount(0, l.length)).max
      assert(got == want, s"text=${s.replace("\n", "\\n")}")
    }
  }

  test("AhoCorasickCount fuzz: random dense texts match the independent per-phrase greedy recompute") {
    val r = new Random(77)
    // per-phrase greedy-left non-overlapping count, computed with plain
    // String.indexOf — the independent referee (no automaton involved)
    def refCount(s: String, phrases: Seq[String]): Long =
      phrases.map { p =>
        var from = 0
        var c = 0L
        var i = s.indexOf(p, from)
        while (i >= 0) { c += 1; from = i + p.length; i = s.indexOf(p, from) }
        c
      }.sum
    for (round <- 0 until 120) {
      // tiny alphabet makes collisions, nesting and overlap dense
      val alpha = "abc"
      def rs(maxLen: Int): String =
        (0 until (1 + r.nextInt(maxLen))).map(_ => alpha(r.nextInt(alpha.length))).mkString
      val phrases = (0 until (1 + r.nextInt(8))).map(_ => rs(4)).distinct
      val s = rs(60)
      val got = ftext
        .AhoCorasickCount(
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
            org.apache.spark.sql.types.StringType),
          phrases
        )
        .eval(null)
        .asInstanceOf[Long]
      val want = refCount(s, phrases)
      assert(got == want, s"round=$round text=$s phrases=$phrases got=$got want=$want")
    }
  }

  test("JaroWinkler fuzz: symmetry, bounds, identity over random strings") {
    val r = new Random(99)
    def rs(): String = (0 until r.nextInt(14)).map(_ => ('a' + r.nextInt(5)).toChar).mkString
    def jw(a: String, b: String): Double =
      ftext.JaroWinkler(
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(a),
          org.apache.spark.sql.types.StringType),
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(b),
          org.apache.spark.sql.types.StringType)
      ).eval(null).asInstanceOf[Double]
    for (_ <- 0 until 200) {
      val (a, b) = (rs(), rs())
      val f = jw(a, b)
      assert(f >= 0.0 && f <= 1.0)
      assert(f == jw(b, a), s"asymmetric on $a / $b")
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
    }
  }
}
