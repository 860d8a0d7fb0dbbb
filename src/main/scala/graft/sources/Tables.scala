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

  /** On-disk size of one table (0 when unknown) — the input-size signal
    * behind [[loadFanned]]'s scale-adaptive fan-out decision.
    */
  def tableBytes(dir: String, name: String): Long =
    try {
      val f = new java.io.File(new java.io.File(dir), s"$name.parquet")
      if (f.isFile) f.length()
      else if (f.isDirectory) {
        // recursive: a partitioned/nested parquet directory's top-level
        // entries are subdirectories whose File.length() is the dirent
        // size — a non-recursive sum undercounts a big table below the
        // fan-out gate and would add a pointless full shuffle (r16
        // ADVICE). Files.walk sums regular files at any depth.
        val s = java.nio.file.Files.walk(f.toPath)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      } else 0L
    } catch { case _: Throwable => 0L }

  /** [[load]] plus a SIZE-GATED round-robin fan-out, for pipelines whose
    * first stage does heavy per-row CPU work (shingling + MinHash, media
    * decode/probe, edit-distance segment explode, dense cosine kernels).
    *
    * Why (guide §2, scale-adaptive partitioning): scan parallelism is
    * bounded by parquet ROW GROUPS, not by split arithmetic — this
    * corpus's tables are single-row-group files, so every scan-rooted
    * stage runs as ONE task while the other cores idle (measured: x6's
    * shingle+hash stage = 1 task, 1.4 s of a 2.5 s query; x187's decode
    * pass = 1 task, 0.5 s). A keyless repartition to the session's
    * default parallelism costs one exchange of the (small by the gate's
    * construction) raw rows and parallelizes everything downstream.
    *
    * The gate derives from input size and core count, never a local[32]
    * constant: fan out only when the table is smaller than cores x 4 MB
    * (4 MB = Spark's stock `files.openCostInBytes` split floor, i.e.
    * exactly the regime where the scan CANNOT reach `cores` splits by
    * itself). At cluster scale the same table is orders of magnitude past
    * the gate and the code is the identity — no shuffle is ever added to
    * a corpus that already scans wide.
    */
  def loadFanned(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val cores = spark.sparkContext.defaultParallelism
    val bytes = tableBytes(dir, name)
    if (bytes > 0L && bytes < cores.toLong * (4L << 20)) df.repartition(cores)
    else df
  }

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
