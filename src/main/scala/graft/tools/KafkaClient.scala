package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone Kafka load-gen / drain client (the reference's
  * `dsp-tools/kafka-client` CLI: produce N sized messages to a topic, or
  * consume and print/count). Built on Spark's `kafka` connector so the
  * tool needs no direct kafka-clients dependency; it runs wherever the
  * Spark Kafka connector jars are deployed (NOT in this sandbox — no
  * broker and no connector jars; the TCP twin [[TcpClient]] is the
  * locally-runnable tool, and the Kafka projection logic itself is
  * replay-tested in StreamRuntimeSpec). The FT twin scripts under
  * `scripts/` drive these modes with the reference's own kcat/jq checks.
  *
  * Message shape matches the reference tool exactly
  * (dsp-tools/kafka-client.cpp:97-102): NULL key, payload = `size`
  * alphanumeric bytes (raw, not length-framed), one `("ts", "1234")`
  * header — the three fields its producer FT stage asserts via kcat
  * (scripts/ft-kafka-producer.stage.sh:19-26).
  *
  * Usage:
  *   runMain graft.tools.KafkaClient --mode produce \
  *     --broker host:9092 --topic events --count 100000 [--size 200]
  *   runMain graft.tools.KafkaClient --mode consume \
  *     --broker host:9092 --topic events [--print-messages true]
  */
object KafkaClient {

  def produce(spark: SparkSession, broker: String, topic: String, count: Long, size: Int): Unit = {
    // deterministic alphanumeric payload (the reference uses one random
    // string for ALL messages; deterministic keeps the tool replayable)
    val alnum = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val payload = Array.tabulate(math.max(1, size))(i => alnum((i * 31 + 7) % alnum.length)).mkString
    spark
      .range(count)
      .select(
        lit(null).cast("binary").as("key"),
        lit(payload).cast("binary").as("value"),
        array(struct(lit("ts").as("key"), lit("1234").cast("binary").as("value"))).as("headers")
      )
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("topic", topic)
      .save()
  }

  def consumeCount(spark: SparkSession, broker: String, topic: String): Long =
    consumed(spark, broker, topic).count()

  private def consumed(spark: SparkSession, broker: String, topic: String) =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("includeHeaders", "true")
      .load()

  /** Print each message as `Message consumed: key=K value=V` — the line
    * the reference consumer logs at trace level and its FT stage greps
    * (scripts/ft-kafka-consumer.stage.sh:38-41). Ordered by Kafka
    * timestamp so multi-partition topics replay in produce order.
    */
  def consumePrint(spark: SparkSession, broker: String, topic: String): Long = {
    val rows = consumed(spark, broker, topic)
      .select(col("key").cast("string"), col("value").cast("string"), col("timestamp"))
      .orderBy(col("timestamp"), col("key"))
      .collect()
    rows.foreach { r =>
      val key = if (r.isNullAt(0)) "null" else r.getString(0)
      println(s"Message consumed: key=$key value=${r.getString(1)}")
    }
    rows.length.toLong
  }

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
        val n =
          if (kv.get("print-messages").contains("true")) consumePrint(spark, broker, topic)
          else consumeCount(spark, broker, topic)
        println(s"topic $topic holds $n messages")
      case other => sys.error(s"unknown --mode $other")
    } finally spark.stop()
  }
}
