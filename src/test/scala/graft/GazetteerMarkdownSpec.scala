package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

class GazetteerMarkdownSpec extends SparkTestBase {
  import spark.implicits._

  test("gazetteerTag: token-aligned multi-token matches only, every occurrence, multiple labels") {
    val docs = Seq(
      (1L, "the big red fox and the big red dog"),
      (2L, "big red is not thebig red"), // 'big red' at pos 0; 'thebig red' must NOT match
      (3L, "nothing here")
    ).toDF("id", "t")
    val phrases = Seq(("big red", "COLOR"), ("big red fox", "ANIMAL"), ("missing phrase", "MISS"))
      .toDF("p", "l")
    val got = TextOps
      .gazetteerTag(docs, col("id"), col("t"), phrases, col("p"), col("l"))
      .as[(Long, Int, String, String)]
      .collect()
      .toSet
    assert(
      got == Set(
        (1L, 1, "COLOR", "big red"),
        (1L, 6, "COLOR", "big red"),
        (1L, 1, "ANIMAL", "big red fox"),
        (2L, 0, "COLOR", "big red")
      )
    )
  }

  test("markdownExtract: fences dropped and counted, links/inline unwrapped, headers stripped") {
    val md =
      "# H1\n\nSee [the spec](https://x/y) and `inline` code.\n\n```scala\nval x = 1\n```\n\n## H2\n\ntail text"
    val got = TextOps
      .markdownExtract(Seq((1L, md)).toDF("id", "m"), col("id"), col("m"))
      .as[(Long, Int, Int, String)]
      .head()
    assert(got._2 == 1 && got._3 == 1)
    assert(got._4 == "H1 See the spec and inline code. H2 tail text")
  }

  test("readability: syllable floor is per WORD (zero-vowel tokens count one each)") {
    // 'amazing xyz 123.' → groups: a-a-i (3); zero-vowel words: xyz, 123. → 5 total
    val got = TextOps
      .readability(Seq((1L, "amazing xyz 123.")).toDF("id", "t"), col("t"))
      .select(col("n_words"), col("n_syllables"), col("n_sentences"))
      .as[(Long, Long, Int)]
      .head()
    assert(got == ((3L, 5L, 1)))
  }

  test("mixedScriptStats: newline-separated clean bilingual text is NOT flagged; spliced homoglyphs are") {
    val got = TextOps
      .mixedScriptStats(
        Seq((1L, "hello\nпривет"), (2L, "clean fакe here"), (3L, "все чисто")).toDF("id", "t"),
        col("t")
      )
      .select(col("id"), col("n_mixed_script"), col("has_homoglyphs"))
      .as[(Long, Int, Boolean)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(got(1L) == ((1L, 0, false)), "newline boundary must not create a fake mixed token")
    assert(got(2L) == ((2L, 1, true)))
    assert(got(3L) == ((3L, 0, false)))
  }

  test("markdownExtract: null input is empty, multiple fences all counted") {
    val got = TextOps
      .markdownExtract(
        Seq((1L, null), (2L, "```a``` mid ```b``` end")).toDF("id", "m"),
        col("id"),
        col("m")
      )
      .as[(Long, Int, Int, String)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(got(1L) == ((1L, 0, 0, "")))
    assert(got(2L) == ((2L, 2, 0, "mid end")))
  }
}
