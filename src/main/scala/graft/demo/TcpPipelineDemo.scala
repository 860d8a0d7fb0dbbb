package graft.demo

import org.apache.spark.sql.SparkSession

import java.net.Socket

import graft.model.Telemetry._
import graft.runtime.GraftService

/** Runnable sample of the config-driven service: YAML → TCP ingress →
  * router → fan-out, driven by a real client socket (the §3.1 pipeline,
  * perf-tcp shape). `sbt "runMain graft.demo.TcpPipelineDemo"`.
  */
object TcpPipelineDemo {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val port = { val s = new java.net.ServerSocket(0); try s.getLocalPort finally s.close() }
    val cfg = GraftService.parseConfig(
      s"""topic: dev-test
         |interfaces:
         |  southbound:
         |    type: tcp
         |    port: $port
         |  northbound:
         |    - {enabled: true, name: main-nb, type: log}
         |    - {enabled: true, name: audit-nb, type: log}
         |rules:
         |  - name: hb
         |    priority: 1
         |    condition: {field: type, value: heartbeat, matcher: exact}
         |    action: allow
         |    destination: main-nb
         |    subject: heartbeats
         |  - name: mirror
         |    priority: 2
         |    condition: {field: '*', value: '*'}
         |    action: allow
         |    destination: audit-nb
         |    subject: all
         |""".stripMargin
    )
    val q = GraftService.start(
      spark,
      cfg,
      nb =>
        batch =>
          batch.collect().foreach { row =>
            println(
              s"[${nb.name}] subject=${row.getAs[String]("subject")} " +
                s"payload=${new String(row.getAs[Array[Byte]]("payload"), "UTF-8").take(40)}"
            )
          }
    )

    // the query thread binds the listener asynchronously after start()
    def connect(retries: Int): Socket =
      try new Socket("127.0.0.1", port)
      catch {
        case e: java.net.ConnectException if retries > 0 =>
          Thread.sleep(200); connect(retries - 1)
      }
    val sock = connect(50)
    sock.getOutputStream.write(
      encodeHeartbeat(Heartbeat(72, 0, System.currentTimeMillis())) ++
        encodeFrame(TypeDynMessage, "hello kafka".getBytes("UTF-8"))
    )
    sock.close()
    // frames arrive asynchronously on the listener thread; drain until the
    // source has buffered and the batch committed
    val deadline = System.currentTimeMillis() + 10000
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(250)
      q.processAllAvailable()
    }
    q.stop()
    spark.stop()
  }
}
