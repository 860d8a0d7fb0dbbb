package graft.runtime

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

import graft.model.Message

/** Typed handler-compatibility layer: the reference's user-facing unit of
  * business logic is a handler object with `process(msg) -> 0..N messages`
  * (libdsp/libdsp/handler.hpp:29-128, doc/user-guide.adoc:85-89). A
  * reference user migrating to this engine can port a handler verbatim as
  * a `Message => Seq[Message]` function and mount it on any envelope
  * DataFrame — batch or streaming.
  *
  * Performance note: a lambda handler runs as deserialized JVM objects
  * (no codegen) — the compat path, not the fast path. Prefer expressing
  * the same logic as column operators ([[graft.operators.Pipeline]],
  * [[graft.operators.Router]]): identical semantics, whole-stage codegen.
  */
object Handlers {

  implicit private val enc: Encoder[Message] = Encoders.product[Message]

  /** Mount a ported handler on an envelope frame (schema per
    * [[graft.model.Message.schema]]).
    */
  def mount(envelope: DataFrame)(handler: Message => Seq[Message]): Dataset[Message] =
    envelope
      .select("key", "subject", "properties", "payload")
      .as[Message]
      .flatMap(handler)

  /** Per-partition variant for handlers with expensive setup (the
    * reference's per-connection handler state, doc/test.adoc:51-53): the
    * factory runs once per partition, the handler per message.
    */
  def mountPartitioned(envelope: DataFrame)(
      factory: () => Message => Seq[Message]
  ): Dataset[Message] =
    envelope
      .select("key", "subject", "properties", "payload")
      .as[Message]
      .mapPartitions { it =>
        val handler = factory()
        it.flatMap(handler)
      }
}
