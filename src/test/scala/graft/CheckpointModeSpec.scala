package graft

import org.apache.spark.sql.functions._

import graft.operators.{ChatOps, ConnectedComponents, GraphOps}
import graft.runtime.GraftCheckpoint

/** The reliable-checkpoint mode contract ([[GraftCheckpoint]]): results
  * identical to the default localCheckpoint mode for every iterative
  * operator, AND the pinned round state survives total cache loss — the
  * local-mode failure that models an executor loss mid-iteration on a
  * real cluster.
  */
class CheckpointModeSpec extends SparkTestBase {
  import spark.implicits._

  private def withReliable[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(GraftCheckpoint.ConfKey, dir)
    try f(dir)
    finally {
      spark.conf.unset(GraftCheckpoint.ConfKey)
      ()
    }
  }

  private def dropAllCachedBlocks(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

  test("reliable mode: CC / PageRank / Bradley-Terry results are identical in both modes") {
    val pairs = Seq.tabulate(199)(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val comps = Seq((10L, 20L), (10L, 30L), (20L, 30L), (40L, 10L)).toDF("winner", "loser")

    val ccLocal = ConnectedComponents.run(pairs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val prLocal = GraphOps.pageRank(edges, iters = 8).collect()
      .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e9) / 1e9).toMap
    val btLocal = ChatOps.bradleyTerry(comps, iters = 5).collect()
      .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e6) / 1e6).toMap

    withReliable { dir =>
      val (ccR, rounds) = ConnectedComponents.runWithRounds(pairs)
      assert(ccR.collect().map(r => (r.getLong(0), r.getLong(1))).toMap == ccLocal)
      assert(rounds >= 1)
      val prR = GraphOps.pageRank(edges, iters = 8).collect()
        .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e9) / 1e9).toMap
      assert(prR == prLocal)
      val btR = ChatOps.bradleyTerry(comps, iters = 5).collect()
        .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e6) / 1e6).toMap
      assert(btR == btLocal)
      // pins actually landed in the configured directory
      val files = new java.io.File(dir).listFiles()
      assert(files != null && files.nonEmpty, s"no checkpoint data under $dir")
    }
  }

  test("reliable mode survives total cache loss mid-lineage; local mode cannot by design") {
    val pairs = Seq.tabulate(99)(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")

    // local mode: the final result plans over localCheckpoint blocks —
    // dropping every cached block (= losing the executors that held them)
    // makes the result unrecoverable: lineage was truncated at the blocks
    val localRes = ConnectedComponents.run(pairs)
    dropAllCachedBlocks()
    val e = intercept[Exception] { localRes.collect() }
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(
      msg.toLowerCase.contains("checkpoint") || msg.toLowerCase.contains("block"),
      s"expected a lost-checkpoint-block failure, got: $e"
    )

    // reliable mode: same loss, but round state re-reads from the
    // checkpoint directory — the collect succeeds and is correct
    withReliable { _ =>
      val relRes = ConnectedComponents.run(pairs)
      dropAllCachedBlocks()
      val got = relRes.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got.size == 100 && got.values.forall(_ == 0L), s"wrong components after block loss")
    }
  }
}
