package graft.model

import org.apache.spark.sql.types._

/** Canonical message envelope of the engine.
  *
  * Mirror of the reference's `dsp::message` (libdsp/libdsp/cache.hpp:30-37,
  * doc/user-guide.adoc:41-60): a row-oriented, schema-less envelope whose
  * fields map 1:1 onto Spark's Kafka source/sink schema
  * (`subject` -> kafka topic, `properties` -> kafka headers).
  */
final case class Message(
    key: Array[Byte],
    subject: String,
    properties: Map[String, String],
    payload: Array[Byte]
)

object Message {

  /** Canonical engine schema (SURVEY.md §1.1). */
  val schema: StructType = StructType(
    Seq(
      StructField("key", BinaryType),
      StructField("subject", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("payload", BinaryType)
    )
  )

  /** Kafka-sink edge schema: properties become an array of (key, value)
    * header structs, the shape Spark's Kafka sink expects (headers column).
    */
  val kafkaSinkSchema: StructType = StructType(
    Seq(
      StructField("key", BinaryType),
      StructField("topic", StringType),
      StructField(
        "headers",
        ArrayType(
          StructType(
            Seq(
              StructField("key", StringType),
              StructField("value", BinaryType)
            )
          )
        )
      ),
      StructField("value", BinaryType)
    )
  )
}
