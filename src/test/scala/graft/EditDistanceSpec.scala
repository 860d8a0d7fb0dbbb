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
}
