package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver testdata.
  *
  * The `events` table carries TIMESTAMP(NANOS) parquet timestamps, which
  * Spark does not support natively (SPARK-40819); sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[sessionConfigs]]) and
  * this loader converts the resulting nano-Long back to a microsecond
  * TimestampType column so every downstream operator sees a real timestamp.
  */
object Tables {

  /** Configs every engine session should set (Verify/Bench/tests do). */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    "spark.sql.session.timeZone" -> "UTC"
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
