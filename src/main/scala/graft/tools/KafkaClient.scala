package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone Kafka load-gen / drain client (the reference's
  * `dsp-tools/kafka-client` CLI: produce N sized messages to a topic, or
  * consume and count). Built on Spark's `kafka` batch connector so the
  * tool needs no direct kafka-clients dependency; it runs wherever the
  * Spark Kafka connector jars are deployed (NOT in this sandbox — no
  * broker and no connector jars; the TCP twin [[TcpClient]] is the
  * locally-runnable tool, and the Kafka projection logic itself is
  * replay-tested in StreamRuntimeSpec).
  *
  * Usage:
  *   runMain graft.tools.KafkaClient --mode produce \
  *     --broker host:9092 --topic events --count 100000 [--size 200]
  *   runMain graft.tools.KafkaClient --mode consume \
  *     --broker host:9092 --topic events
  */
object KafkaClient {

  def produce(spark: SparkSession, broker: String, topic: String, count: Long, size: Int): Unit = {
    val payload = "x" * math.max(1, size - graft.model.Telemetry.HeaderSize)
    spark
      .range(count)
      .select(
        col("id").cast("string").cast("binary").as("key"),
        graft.functions.codecs.encode_dyn(encode(lit(payload), "UTF-8")).as("value")
      )
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("topic", topic)
      .save()
  }

  def consumeCount(spark: SparkSession, broker: String, topic: String): Long =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .count()

  def main(args: Array[String]): Unit = {
    val kv = args
      .sliding(2, 2)
      .collect { case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v }
      .toMap
    val broker = kv.getOrElse("broker", sys.error("--broker is required"))
    val topic = kv.getOrElse("topic", sys.error("--topic is required"))
    val spark = SparkSession.builder().master("local[4]").appName("graft-kafka-client").getOrCreate()
    try kv.getOrElse("mode", "produce") match {
      case "produce" =>
        val count = kv.getOrElse("count", sys.error("--count is required")).toLong
        produce(spark, broker, topic, count, kv.getOrElse("size", "200").toInt)
        println(s"produced $count messages to $topic")
      case "consume" =>
        println(s"topic $topic holds ${consumeCount(spark, broker, topic)} messages")
      case other => sys.error(s"unknown --mode $other")
    } finally spark.stop()
  }
}
