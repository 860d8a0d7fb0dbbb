package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** File source/sink coverage: the engine reads and writes every mainstream
  * format via Spark's built-in scans (the reference has no file scanners at
  * all, SURVEY.md §2.1 — these come free and are part of the superset
  * surface). Envelope columns survive a roundtrip in each format.
  */
class FormatsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val envelope = graft.sources.Tables
    .load(spark, sfDir, "events")
    .select(
      $"event_id",
      $"user_id".cast("string").as("key"),
      lit("dev-test").as("subject"),
      $"props".as("payload"),
      unix_millis($"ts").as("ts_ms")
    )

  private def roundtrip(format: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft_$format").toString + "/out"
    envelope.write.options(opts).format(format).save(dir)
    var r = spark.read.options(opts).format(format)
    val back = (if (format == "csv" || format == "json") r.schema(envelope.schema) else r).load(dir)
    val a = envelope.orderBy($"event_id").collect().map(_.toSeq)
    val b = back.orderBy($"event_id").collect().map(_.toSeq)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y }, s"$format roundtrip")
  }

  test("parquet roundtrip")(roundtrip("parquet"))
  test("orc roundtrip")(roundtrip("orc"))
  test("json roundtrip")(roundtrip("json"))
  test("csv roundtrip")(roundtrip("csv", Map("header" -> "true")))

  test("partitioned parquet write prunes on read (partition pruning)") {
    val dir = Files.createTempDirectory("graft_part").toString + "/out"
    graft.sources.Tables
      .load(spark, sfDir, "events")
      .withColumn("etype", $"event_type")
      .write.partitionBy("etype").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"etype" === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan filter
    assert(plan.contains("PartitionFilters: [isnotnull(etype"), s"no partition pruning in:\n$plan")
    val expected = graft.sources.Tables.load(spark, sfDir, "events")
      .filter($"event_type" === "purchase").count()
    assert(pruned.count() == expected)
  }
}
