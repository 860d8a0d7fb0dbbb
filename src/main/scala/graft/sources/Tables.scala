package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver testdata.
  *
  * The `events` table has carried two timestamp encodings across testdata
  * generations: TIMESTAMP(NANOS) (unsupported natively, SPARK-40819 —
  * `spark.sql.legacy.parquet.nanosAsLong=true` + the Long rebuild below)
  * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (would infer as
  * TIMESTAMP_NTZ — `spark.sql.parquet.inferTimestampNTZ.enabled=false`
  * reads it as TimestampType under the UTC session zone). Sessions must
  * apply [[sessionConfigs]]; both paths yield identical µs TimestampType.
  */
object Tables {

  /** Configs every engine session should set (Verify/Bench/tests do). */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    "spark.sql.session.timeZone" -> "UTC",
    // The testdata's `events.ts` is TIMESTAMP(isAdjustedToUTC=false):
    // Spark 4 would infer TIMESTAMP_NTZ, which unix_millis/window reject.
    // Reading it as TimestampType under the UTC session zone gives the
    // same wall-clock instants DuckDB's naive read sees.
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    // Sorter/aggregation page size. The default is min(64 MB, heap-derived):
    // on a multi-GB local[32] driver every sort task allocates (and zeroes)
    // a 64 MB heap page — G1 treats those as humongous allocations, and 32
    // concurrent tasks turn small sorts into an allocation/GC storm
    // (measured: the connected-components stress spent 80%+ of wall in
    // TaskMemoryManager.allocatePage; 4 MB pages cut round time 5-10x with
    // identical plans). 4 MB still holds ~260k sort records per page, far
    // above what a 32-1024-partition local shuffle sees per task.
    "spark.buffer.pageSize" -> "4m"
  )

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  /** Register every table as a temp view so `spark.sql` reaches the whole
    * schema (the catalog convenience the reference never had).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
