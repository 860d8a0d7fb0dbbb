package graft

/** Box-noise context for benchmark artifacts. This VM's scheduling noise is
  * documented at up to ±3× (ROUND_NOTES round-1 protocol); every number the
  * bench emits should carry enough environment evidence that a reader can
  * tell "the engine regressed" from "the box was busy". All probes are
  * /proc reads (Linux-only, the only platform the bench runs on) and return
  * -1 on any failure — a probe must never be able to fail the bench.
  */
private[graft] object EnvProbe {

  private def readFile(p: String): Option[String] =
    try Some(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
    catch { case _: Throwable => None }

  /** 1-minute load average. */
  def loadavg1(): Double =
    readFile("/proc/loadavg")
      .flatMap(_.split("\\s+").headOption)
      .flatMap(s => s.toDoubleOption)
      .getOrElse(-1.0)

  /** MemAvailable in MB (what a new fork can actually get without swapping
    * — the right probe for "did the 24g child have room").
    */
  def freeMb(): Long =
    readFile("/proc/meminfo")
      .flatMap(_.linesIterator.find(_.startsWith("MemAvailable:")))
      .flatMap(_.split("\\s+").lift(1))
      .flatMap(_.toLongOption)
      .map(_ / 1024)
      .getOrElse(-1L)

  /** Cumulative hypervisor steal ticks (field 8 of /proc/stat's cpu line).
    * A delta across a fork that rivals the fork's wall time means the VM
    * itself was descheduled — the one signal that fully discounts a slow
    * reading on a shared box.
    */
  def stealTicks(): Long =
    readFile("/proc/stat")
      .flatMap(_.linesIterator.find(_.startsWith("cpu ")))
      .flatMap(_.trim.split("\\s+").lift(8))
      .flatMap(_.toLongOption)
      .getOrElse(-1L)

  /** Steal delta in seconds across a measured region (USER_HZ = 100 on
    * every Linux this runs on); -1 if either endpoint probe failed.
    */
  def stealSec(t0: Long, t1: Long): Double =
    if (t0 < 0 || t1 < 0) -1.0 else (t1 - t0) / 100.0
}
