package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicReference

/** Driver-process CPU / RSS gauges — the reference's `system_info`
  * surface (libdsp/libdsp/sys.hpp:113-162: `/proc/self/stat` parsed after
  * the last ')' with user_time/sys_time/rss at split indices 12/13/22,
  * ticks scaled by the kernel clock, rss by the page size) feeding the
  * `CPU: x%  RSS: y MB` tail of the throughput summary
  * (libdsp/libdsp/stat.hpp:52-58,155-173) and the process panels of the
  * Grafana dashboard.
  *
  * CPU% is the cpu-time delta between refreshes over the wall-clock
  * delta, ×100 — identical to the reference's `(cpu_time − prev) × 100`
  * at its fixed 1 s refresh, and well-defined at any scrape cadence. The
  * first refresh reports 0.0 (no interval yet), as the reference does.
  *
  * JVM caveats (documented deviations, same values): `sysconf` is not
  * reachable, so the kernel tick rate uses Linux's universal USER_HZ=100
  * and the page size 4096 — both fixed ABI constants on every Linux the
  * engine targets. Off-Linux (no `/proc`), the snapshot degrades to JVM
  * heap RSS and zero cpu ticks rather than failing the scrape.
  */
object ProcessStats {

  /** sys.hpp:113-118 `process_stats` twin (MB / seconds / percent). */
  final case class Snapshot(
      cpuPercent: Double,
      userTimeSec: Double,
      sysTimeSec: Double,
      rssMb: Double
  )

  private val clkTck = 100.0 // USER_HZ — fixed Linux ABI constant
  private val pageBytes = 4096.0
  private val mb = 1024.0 * 1024.0

  // (wallNanos, userSec+sysSec, snapshot) of the previous refresh
  private val prev = new AtomicReference[Option[(Long, Double, Snapshot)]](None)

  /** Raw (userSec, sysSec, rssMb) — one `/proc/self/stat` read. */
  private def readProc(): Option[(Double, Double, Double)] =
    try {
      val raw = new String(
        Files.readAllBytes(Paths.get("/proc/self/stat")),
        StandardCharsets.US_ASCII
      )
      // field layout is only stable AFTER the comm field, whose value may
      // itself contain spaces/parens — hence the last-')' re-base (the
      // reference's find_last_of dance, sys.hpp:125-134)
      val parts = raw.substring(raw.lastIndexOf(')')).split("\\s+")
      Some(
        (
          parts(12).toDouble / clkTck,
          parts(13).toDouble / clkTck,
          parts(22).toDouble * pageBytes / mb
        )
      )
    } catch { case _: Throwable => None }

  /** Refresh and return the current snapshot (thread-safe; concurrent
    * scrapes race benignly — both compute over a valid interval).
    */
  def refresh(): Snapshot = {
    val nowNs = System.nanoTime()
    val (user, sys, rss) = readProc().getOrElse {
      val rt = Runtime.getRuntime
      (0.0, 0.0, (rt.totalMemory() - rt.freeMemory()).toDouble / mb)
    }
    val cpuNow = user + sys
    val cpu = prev.get() match {
      case Some((prevNs, prevCpu, _)) if nowNs > prevNs =>
        (cpuNow - prevCpu) / ((nowNs - prevNs) / 1e9) * 100.0
      case _ => 0.0
    }
    val snap = Snapshot(cpu, user, sys, rss)
    prev.set(Some((nowNs, cpuNow, snap)))
    snap
  }

  /** Cached snapshot, refreshed at most once per `minIntervalMs` — the
    * reference's 1 s `RefreshInterval` (stat.hpp:25,41): a scrape storm
    * must not turn the gauge itself into the CPU load.
    */
  def cached(minIntervalMs: Long = 1000L): Snapshot = {
    val now = System.nanoTime()
    prev.get() match {
      case Some((ns, _, snap)) if (now - ns) / 1000000L < minIntervalMs => snap
      case _ => refresh()
    }
  }

  /** Prometheus exposition lines for the scrape payload: the two standard
    * process metrics every Grafana process panel expects, plus the
    * reference-formatter twins (stat.hpp prints CPU %, RSS MB).
    */
  def scrapeLines(): String = {
    val s = cached()
    s"process_cpu_seconds_total ${s.userTimeSec + s.sysTimeSec}\n" +
      s"process_resident_memory_bytes ${(s.rssMb * mb).toLong}\n" +
      s"process_cpu_percent ${s.cpuPercent}\n" +
      s"process_rss_mb ${s.rssMb}\n"
  }
}
