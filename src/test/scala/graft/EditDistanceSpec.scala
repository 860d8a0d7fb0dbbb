package graft

import org.apache.spark.sql.functions._

import graft.operators.EditDistance

class EditDistanceSpec extends SparkTestBase {
  import spark.implicits._

  /** Plain Wagner–Fischer, the independent referee. */
  private def lev(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    var prev = Array.tabulate(n + 1)(identity)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      cur(0) = i
      var j = 1
      while (j <= n) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }

  private def bruteForce(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      a <- strs; b <- strs
      if a._2.length < b._2.length || (a._2.length == b._2.length && a._1 < b._1)
      d = lev(a._2, b._2)
      if d <= k
    } yield (a._1, b._1, d)).toSet

  private def run(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    EditDistance
      .editDistancePairs(strs.toDF("id", "s"), col("id"), col("s"), k)
      .as[(Long, Long, Int)]
      .collect()
      .toSet

  test("matches brute force on a corpus with planted edits of every kind") {
    val base = (0L until 60L).map { i =>
      i -> s"the quick brown fox ${i} jumps over the lazy dog number ${i * 7 % 13}"
    }
    val mutants = Seq(
      1000L -> "the quick brown fox 3 jumps over the lazy dog number 8X",  // append
      1001L -> "the quck brown fox 7 jumps over the lazy dog number 10",   // delete
      1002L -> "the quick brEwn fQx 11 jumps over the lazy dog number 12", // subs
      1003L -> "xxthe quick brown fox 2 jumps over the lazy dog number 1", // prefix indels
      1004L -> "the quick brown fox 4 jumps over the lazy dog numb"        // truncate
    )
    val strs = base ++ mutants
    for (k <- Seq(1, 2, 4)) {
      assert(run(strs, k) == bruteForce(strs, k), s"k=$k")
    }
  }

  test("short strings (len <= k), empty strings, and exact duplicates are exact") {
    val strs = Seq(
      1L -> "", 2L -> "a", 3L -> "ab", 4L -> "abc", 5L -> "abcd",
      6L -> "abcdefg", 7L -> "abcdefg", 8L -> "zzzzzzz", 9L -> "b", 10L -> ""
    )
    for (k <- Seq(1, 2, 3)) {
      assert(run(strs, k) == bruteForce(strs, k), s"k=$k")
    }
  }

  test("distance-k pairs survive, k+1 pairs do not (threshold boundary)") {
    val strs = Seq(1L -> "aaaaaaaaaa", 2L -> "aaaaaaabbb", 3L -> "aaaaaabbbb")
    val got = run(strs, 3)
    assert(got.contains((1L, 2L, 3)))  // 3 subs
    assert(got.contains((2L, 3L, 1)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L)) // distance 4 > k
  }

  test("null strings are dropped, not joined") {
    val strs = Seq((1L, "hello"), (2L, null), (3L, "hallo")).toDF("id", "s")
    val got = EditDistance
      .editDistancePairs(strs, col("id"), col("s"), 2)
      .as[(Long, Long, Int)]
      .collect()
      .toSet
    assert(got == Set((1L, 3L, 1)))
  }

  // FROZEN FIXTURE TABLE — DuckDB 1.0.0 `jaro_winkler_similarity` vectors:
  // classic pairs, empties, equal strings, transposition shapes, and 30
  // random pairs over a 6-letter alphabet. The kernel must match the
  // oracle engine bit-for-bit pre-rounding — these assert EXACT doubles,
  // not 6dp. Any edit to the JaroWinkler kernel (functions/text.scala —
  // especially its integer `t / 2` transposition term) REQUIRES this
  // table to pass unchanged; regenerate only against DuckDB itself
  // (SELECT jaro_winkler_similarity(a, b)), never against another
  // implementation.
  private val jwFixtures: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111), ("DIXON", "DICKSONX", 0.8133333333333332),
    ("", "x", 0.0), ("", "", 0.0), ("equal", "equal", 1.0),
    ("abcde", "abcde ", 0.9666666666666667), ("transp", "transpose", 0.9333333333333333),
    ("aab", "aba", 0.5555555555555555), ("abc", "cba", 0.5555555555555555),
    ("abcd", "dcba", 0.5), ("afcbbbfaffe", "ae", 0.5303030303030303),
    ("aabbeea", "e", 0.0), ("ffed", "bdecabfdccbb", 0.5555555555555555),
    ("adacce", "ca", 0.5555555555555555), ("eadaecfecebf", "aafbcaba", 0.6138888888888889),
    ("dfcbccb", "fcfff", 0.5619047619047619), ("fb", "efbbddcffe", 0.7333333333333334),
    ("caba", "cdcabefcbfd", 0.6742424242424242), ("dbcbbfe", "ecfededcbbe", 0.5896103896103896),
    ("aabfbfde", "ad", 0.5416666666666666), ("deceaff", "afecfcacdb", 0.6047619047619048),
    ("ffcebeaf", "c", 0.7083333333333334), ("ebbcbeeaecd", "aaccbabea", 0.5367003367003367),
    ("da", "ebbfdebceedb", 0.5277777777777778), ("fbfcdffcd", "edabbacaeebe", 0.4166666666666667),
    ("affa", "b", 0.0), ("ca", "e", 0.0), ("fdbe", "bfeed", 0.6333333333333333),
    ("dbaa", "fdcdddfa", 0.4583333333333333), ("faadfcabbbe", "dbdbcdbadea", 0.6414141414141414),
    ("e", "aabbdddbdab", 0.0), ("dcdcdff", "e", 0.0),
    ("dbbcbaefeaf", "caaedeebaeab", 0.6446608946608947), ("af", "bdaebeeaea", 0.5333333333333333),
    ("eeeccbf", "fcbcdbffcdc", 0.5616883116883117), ("de", "e", 0.0),
    ("eb", "ec", 0.6666666666666666), ("abc", "cbdefc", 0.5),
    ("eafecfabca", "afebccebfcb", 0.7174242424242424),
    ("cedcaafdcaa", "cbfcbfdefde", 0.5696969696969697)
  )

  test("JaroWinkler kernel bit-matches the DuckDB oracle variant on 40 fixture pairs") {
    val df = jwFixtures.toDF("a", "b", "want")
    val got = df
      .select(col("want"), graft.functions.text.jaro_winkler(col("a"), col("b")).as("got"))
      .as[(Double, Double)]
      .collect()
    got.foreach { case (want, g) => assert(g == want, s"want $want got $g") }
    // symmetry on the same fixtures
    val sym = df
      .select(
        graft.functions.text.jaro_winkler(col("a"), col("b")).as("f"),
        graft.functions.text.jaro_winkler(col("b"), col("a")).as("r")
      )
      .as[(Double, Double)]
      .collect()
    sym.foreach { case (f, r) => assert(f == r) }
  }

  test("jaroWinklerPairs: within-block exactness, orientation, threshold, null hygiene") {
    val rows = Seq(
      (1L, "martha", "g1"), (2L, "marhta", "g1"), (3L, "zzzzz", "g1"),
      (4L, "martha", "g2"), // same key, different block: must NOT pair with 1/2
      (5L, "marhta", "g2"),
      (6L, null, "g1"), (7L, "x", null)
    ).toDF("id", "s", "blk")
    val got = EditDistance
      .jaroWinklerPairs(rows, col("id"), col("s"), col("blk"), 0.9)
      .as[(String, Long, Long, Double)]
      .collect()
      .toSet
    assert(got == Set(("g1", 1L, 2L, 0.961111), ("g2", 4L, 5L, 0.961111)))
  }
}
