package graft

import org.apache.spark.sql.functions._

import graft.operators.Robots

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val robotsTxt =
    """# demo
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /tmp
      |Crawl-delay: 10
      |
      |User-agent: SpecialBot
      |User-agent: otherbot
      |Disallow: /
      |Allow: /welcome
      |
      |User-agent: emptybot
      |Disallow:
      |""".stripMargin

  private def gate(urls: Seq[(Long, String, String)], agent: String,
                   robots: Seq[(String, String)] = Seq("d" -> robotsTxt)): Map[Long, (Int, Boolean)] =
    Robots
      .fetchGate(
        urls.toDF("url_id", "domain", "path"),
        col("url_id"), col("domain"), col("path"),
        robots.toDF("domain", "txt"), col("domain"), col("txt"),
        agent
      )
      .select(col("url_id"), col("matched_len"), col("allowed"))
      .as[(Long, Int, Boolean)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap

  test("star group: longest match wins and Allow beats Disallow on ties") {
    val got = gate(
      Seq(
        (1L, "d", "/private/ok/file"), // allow len 11 > disallow len 8
        (2L, "d", "/private/zz"),      // disallow len 8
        (3L, "d", "/pub"),             // no rule
        (4L, "d", "/tmp/x")            // disallow len 4
      ),
      agent = "unknownbot"
    )
    assert(got(1L) == (11, true))
    assert(got(2L) == (8, false))
    assert(got(3L) == (0, true))
    assert(got(4L) == (4, false))
  }

  test("a group naming the agent applies exclusively (star group ignored), case-insensitive, run-of-agents shared") {
    val got = gate(
      Seq(
        (1L, "d", "/private/zz"), // star would deny; SpecialBot group has no /private rule -> Disallow / applies (len 1)
        (2L, "d", "/welcome/x"),  // allow len 8 > disallow len 1
        (3L, "d", "/anything")    // disallow / (len 1)
      ),
      agent = "specialBOT"
    )
    assert(got(1L) == (1, false))
    assert(got(2L) == (8, true))
    assert(got(3L) == (1, false))
    // the run of consecutive User-agent lines shares the group
    assert(gate(Seq((9L, "d", "/anything")), "OTHERBOT")(9L) == (1, false))
  }

  test("empty Disallow is a no-op (allow all) and unknown domains default to allowed") {
    assert(gate(Seq((1L, "d", "/private/zz")), "emptybot")(1L) == (0, true))
    assert(gate(Seq((2L, "nodomain", "/private/zz")), "anybot")(2L) == (0, true))
  }

  test("crawlDelays: exclusive-group selection, non-numeric ignored; schedule slots per domain") {
    val robots = Seq(
      "a" -> "User-agent: *\nCrawl-delay: 3\n\nUser-agent: fastbot\nCrawl-delay: 1\n",
      "b" -> "User-agent: *\nCrawl-delay: soon\n", // non-numeric -> null -> default
      "c" -> "User-agent: *\nDisallow: /x\n"       // none declared
    ).toDF("domain", "txt")
    val delays = Robots
      .crawlDelays(robots, col("domain"), col("txt"), agent = "somebot")
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(delays("a") == Some(3L)) // star group (fastbot group not selected)
    assert(delays("b").isEmpty)
    assert(!delays.contains("c"))
    assert(
      Robots
        .crawlDelays(robots, col("domain"), col("txt"), agent = "FASTBOT")
        .collect()
        .collectFirst { case r if r.getString(0) == "a" => r.getLong(1) }
        .contains(1L)
    )

    val urls = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b")).toDF("id", "d")
    val sched = Robots
      .politenessSchedule(urls, col("id"), col("d"), robots, col("domain"), col("txt"), "somebot", defaultDelay = 2L)
      .as[(Long, String, Long, Long)]
      .collect()
      .map(r => r._1 -> (r._3, r._4))
      .toMap
    assert(sched(1L) == (3L, 0L) && sched(2L) == (3L, 3L) && sched(3L) == (3L, 6L))
    assert(sched(4L) == (2L, 0L) && sched(5L) == (2L, 2L)) // null delay -> default
  }

  test("crawlBudget: Hamilton apportionment conserves the budget exactly, incl. budget < domains and zero") {
    val urls = (Seq.fill(7)("a") ++ Seq.fill(2)("b") ++ Seq.fill(1)("c")).map(Tuple1(_)).toDF("d")
    def alloc(b: Long): Map[String, Long] =
      Robots.crawlBudget(urls, col("d"), b).as[(String, Long, Long)].collect()
        .map(r => r._1 -> r._3).toMap
    val a10 = alloc(10L)
    assert(a10 == Map("a" -> 7L, "b" -> 2L, "c" -> 1L)) // exact proportions
    val a5 = alloc(5L)
    assert(a5.values.sum == 5L && a5("a") >= a5("b") && a5("b") >= a5("c"))
    val a2 = alloc(2L) // budget < domains: only the largest remainders get anything
    assert(a2.values.sum == 2L)
    assert(alloc(0L).values.sum == 0L)
  }

  test("CRLF, comments, mixed-case field names all parse") {
    val txt = "# c\r\nUSER-AGENT: *\r\ndisallow: /a # inline comment\r\nALLOW: /a/b\r\n"
    val got = gate(
      Seq((1L, "d", "/a/x"), (2L, "d", "/a/b/y"), (3L, "d", "/z")),
      agent = "x",
      robots = Seq("d" -> txt)
    )
    assert(got(1L) == (2, false))
    assert(got(2L) == (4, true))
    assert(got(3L) == (0, true))
  }
}
