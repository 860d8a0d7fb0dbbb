package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def prMap(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    GraphOps
      .pageRank(edges.toDF("src", "dst"), iters)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

  test("pageRank: 3-cycle stays uniform at every iteration") {
    val pr = prMap(Seq((0L, 1L), (1L, 2L), (2L, 0L)), iters = 4)
    assert(pr.size == 3)
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRank matches a hand-rolled reference on a graph with a dangling node and a hub") {
    // 0→1, 0→2, 1→2, 2→0, 3→2 ; node 4 is reachable only as a dst (4 never
    // appears — add 1→4 so the node set includes a TRUE dangling node).
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L), (1L, 4L))
    val got = prMap(edges, iters = 5)

    // driver-side replay of the exact formula
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).distinct.size }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    var pr = nodes.map(_ -> 1.0 / n).toMap
    val d = 0.85
    for (_ <- 1 to 5) {
      val dm = nodes.filterNot(out.contains).map(pr).sum
      val contribs = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => pr(e._1) / out(e._1)).sum
      }
      pr = nodes.map(v => v -> ((1.0 - d) / n + d * (contribs.getOrElse(v, 0.0) + dm / n))).toMap
    }
    assert(got.keySet == pr.keySet)
    got.foreach { case (id, v) => assert(math.abs(v - pr(id)) < 1e-12, s"node $id") }
  }

  test("pageRank conserves total mass (sums to 1) with dangling redistribution") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 4L)) // 4 dangles
    val total = GraphOps
      .pageRank(edges.toDF("src", "dst"), iters = 6)
      .agg(sum("pr"))
      .head()
      .getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("pageRank deduplicates parallel edges") {
    // duplicate 0→1 must not double 0's endorsement of 1
    val a = prMap(Seq((0L, 1L), (0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)), iters = 3)
    val b = prMap(Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)), iters = 3)
    a.foreach { case (id, v) => assert(math.abs(v - b(id)) < 1e-15) }
  }

  test("anchors pairs each href with its trimmed link text; nested-markup anchors don't match") {
    val df = Seq(
      (1L, """<a href="https://a/x">  Go here </a><A HREF="https://b/y">see</A>
             |<a href="https://c/z"><b>nested</b></a><a>no href</a>""".stripMargin)
    ).toDF("id", "html")
    val got = GraphOps
      .anchors(df, col("id"), col("html"))
      .as[(Long, String, String)]
      .collect()
      .toSet
    assert(got == Set((1L, "https://a/x", "Go here"), (1L, "https://b/y", "see")))
  }

  test("htmlLinks extracts every href occurrence in document order semantics") {
    val df = Seq(
      (1L, """<html><a href="https://a/x">A</a><a class="z" HREF="https://b/y">B</a>
             |<a href="https://a/x">dup</a><p>no <b>links</b> here</p></html>""".stripMargin),
      (2L, "<p>none</p>")
    ).toDF("id", "html")
    val links = GraphOps
      .htmlLinks(df, col("id"), col("html"))
      .as[(Long, String)]
      .collect()
      .toSeq
    assert(links.count(_._1 == 1L) == 3)
    assert(links.count(_ == (1L, "https://a/x")) == 2)
    assert(links.count(_ == (1L, "https://b/y")) == 1)
    assert(!links.exists(_._1 == 2L))
  }
}
