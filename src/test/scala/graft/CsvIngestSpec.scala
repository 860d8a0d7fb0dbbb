package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Pins the PERMISSIVE CSV contract csvIngest documents (empirically
  * probed on Spark 4.1): partial corruption keeps well-formed fields.
  */
class CsvIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(lines: Seq[(Long, String)]) =
    CorpusOps
      .csvIngest(lines.toDF("lid", "l"), col("lid"), col("l"))
      .as[(Long, Option[Long], Option[String], Option[String], Option[Int], Boolean)]
      .collect()
      .map(r => r._1 -> r)
      .toMap

  test("RFC 4180 quoting: embedded commas and doubled quotes round-trip") {
    val got = parse(Seq(1L -> "1,\"hello, \"\"world\"\"\",en,11"))(1L)
    assert(got == ((1L, Some(1L), Some("hello, \"world\""), Some("en"), Some(11), false)))
  }

  test("type mismatch flags corrupt but keeps well-formed fields (CSV, unlike JSON)") {
    val got = parse(Seq(2L -> "2,\"bad int\",en,12x"))(2L)
    assert(got == ((2L, Some(2L), Some("bad int"), Some("en"), None, true)))
  }

  test("missing and surplus columns flag corrupt; parsed prefix kept") {
    val m = parse(Seq(3L -> "3,\"too few\",en", 4L -> "4,\"extra\",en,5,surplus"))
    assert(m(3L) == ((3L, Some(3L), Some("too few"), Some("en"), None, true)))
    assert(m(4L) == ((4L, Some(4L), Some("extra"), Some("en"), Some(5), true)))
  }

  test("unterminated quote consumes the rest into the open field and flags corrupt") {
    val got = parse(Seq(5L -> "5,\"unterminated,en,7"))(5L)
    assert(got._6 === true)
    assert(got._3.contains("unterminated,en,7"))
  }

  test("null line is one corrupt row, not a silently-valid null record") {
    val got = parse(Seq((6L, null), (7L, "7,ok,fr,2")))
    assert(got(6L) == ((6L, None, None, None, None, true)))
    assert(got(7L) == ((7L, Some(7L), Some("ok"), Some("fr"), Some(2), false)))
  }
}
