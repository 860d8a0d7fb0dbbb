package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Dev-tooling bridge: `SparkContext.listenerBus` is private[spark], but
  * the profiling harness ([[graft.demo.ProfQ]]) must drain the async
  * listener bus before reading its aggregates — a fixed sleep undercounts
  * on a loaded box (r16 ADVICE). Lives under org.apache.spark for the
  * access, same pattern as sql.graftbridge.Bridge.
  */
object ListenerBridge {
  /** Block until the listener bus has delivered every queued event, or
    * the timeout elapses (best-effort — never throws).
    */
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
