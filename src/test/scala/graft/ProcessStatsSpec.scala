package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipeline
import graft.streaming.ProcessStats

/** Process CPU/RSS gauges (sys.hpp:113-162 twin) and the full summary
  * formatter (stat.hpp:155-173): real `/proc/self/stat` values on this
  * Linux box, interval CPU% after measurable work, scrape exposition
  * lines, and the `CPU: x%  RSS: y MB` summary tail.
  */
class ProcessStatsSpec extends SparkTestBase {

  test("snapshot reads real /proc values: JVM rss and accrued cpu ticks") {
    val s = ProcessStats.refresh()
    assert(s.rssMb > 10.0, s"a JVM running Spark has >10 MB RSS: $s")
    assert(s.userTimeSec > 0.0, s"test JVM has accrued user ticks: $s")
    assert(s.sysTimeSec >= 0.0 && s.cpuPercent >= 0.0)
  }

  test("cpu percent reflects work done over the refresh interval") {
    ProcessStats.refresh()
    val stop = System.nanoTime() + 300000000L // ~0.3 s busy loop
    var x = 1.0
    while (System.nanoTime() < stop) x = math.sqrt(x + 1.0)
    assert(x > 0.0)
    val s = ProcessStats.refresh()
    assert(s.cpuPercent > 10.0, s"a busy-looped interval must show cpu%: $s")
  }

  test("scrape lines expose the standard process metrics and the reference twins") {
    val lines = ProcessStats.scrapeLines()
    Seq(
      "process_cpu_seconds_total ",
      "process_resident_memory_bytes ",
      "process_cpu_percent ",
      "process_rss_mb "
    ).foreach(m => assert(lines.contains(m), s"missing $m in:\n$lines"))
  }

  test("throughputSummaryLine: totals math plus the CPU/RSS tail") {
    import spark.implicits._
    val df = Seq.fill(1000)("x" * 100).toDF("payload")
    val line = Pipeline.throughputSummaryLine(df, length(col("payload")), uptimeSec = 2.0)
    // 100000 bytes over 2 s = 0.05 MB / 2 = 0.05 MBps; 1000 msgs / 2 s = 0.5k MPS
    assert(line.startsWith("0.05 MBps  0.50k MPS"), line)
    assert(line.contains("(total: 100000 bytes, 1000 messages)"), line)
    assert(line.contains("CPU:") && line.contains("RSS:") && line.endsWith(" MB"), line)
  }
}
