package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamRuntime

/** Production entry point: `spark-submit --class graft.runtime.ServiceMain
  * dspspark.jar /etc/graft/graft.yaml` — the deployable twin of the
  * reference's `svc` binary (svc/main.cpp:120-240: load config, start
  * service + metrics exposer, block until signalled). The Spark master
  * comes from spark-submit (local[*] single-pod, or k8s:// for
  * cluster-mode scale-out — see deploy/), NOT from code: the same jar
  * runs unchanged in both.
  *
  * Sink resolution by northbound `type` (dsp.hpp:128-176's interface
  * registry):
  *   - `kafka`: per-batch producer write via the envelope→Kafka column
  *     mapping, with the interface's `options:` block flowing to the
  *     client ([[StreamRuntime.kafkaClientOptions]] — SSL config-only);
  *   - `log`: batch count to stdout (the reference's log sink);
  *   - anything else fails fast at startup, not at first batch.
  */
object ServiceMain {

  /** Resolve a northbound config to a batch writer. Public so the compose/
    * k8s FT runs and tests exercise the SAME factory the daemon uses.
    */
  def productionSinkFactory(nb: GraftService.Northbound): DataFrame => Unit = nb.tpe match {
    case "kafka" =>
      batch =>
        StreamRuntime
          .toKafkaColumns(batch)
          .write
          .format("kafka")
          .option("kafka.bootstrap.servers", nb.address)
          .options(StreamRuntime.kafkaClientOptions(nb.options))
          .save()
    case "log" =>
      batch => println(s"[graft:${nb.name}] batch rows=${batch.count()}")
    case other =>
      throw new IllegalArgumentException(
        s"northbound '${nb.name}': unsupported sink type '$other' (expected kafka|log)"
      )
  }

  /** Metrics-port precedence: env override > YAML
    * `interfaces.metrics.port` > 9555. Pure so the precedence is testable
    * without a daemon.
    */
  def resolveMetricsPort(cfg: GraftService.ServiceConfig, env: Map[String, String]): Int =
    env.get("GRAFT_METRICS_PORT").map(_.toInt).orElse(cfg.metricsPort).getOrElse(9555)

  /** Parse + fail-fast + start: everything main does before blocking —
    * callable from tests (which stop the returned daemon themselves) and
    * from operational tooling.
    */
  def startFromConfig(
      spark: SparkSession,
      configPath: String,
      env: Map[String, String] = sys.env
  ): GraftDaemon = {
    val yaml = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(configPath)), "UTF-8")
    val cfg = GraftService.parseConfig(yaml)
    // fail fast on unresolvable sinks BEFORE starting the query
    cfg.northbound.filter(_.enabled).foreach(productionSinkFactory)
    GraftService.startDaemon(
      spark,
      cfg,
      productionSinkFactory,
      metricsPort = resolveMetricsPort(cfg, env),
      checkpointLocation = env.get("GRAFT_CHECKPOINT"), // survive pod restarts when set
      // GRAFT_METRICS_BIND=0.0.0.0 exposes /metrics on the pod IP (kubelet
      // readiness probes, compose port maps); /reload stays loopback-only
      // regardless (startDaemon splits it out when the bind is exposed)
      metricsBind = env.get("GRAFT_METRICS_BIND")
    )
  }

  def main(args: Array[String]): Unit = {
    val configPath = args.headOption
      .orElse(sys.env.get("GRAFT_CONFIG"))
      .getOrElse(throw new IllegalArgumentException("usage: ServiceMain <config.yaml> (or GRAFT_CONFIG=)"))
    val spark = SparkSession
      .builder()
      .appName("graft-service")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG_LEVEL", "WARN"))

    val daemon = startFromConfig(spark, configPath)
    println(
      s"[graft] service up: config=$configPath metrics=:${daemon.metricsPort}/metrics" +
        (if (daemon.oamPort != daemon.metricsPort) s" reload=127.0.0.1:${daemon.oamPort}/reload" else "")
    )

    // SIGTERM (kubectl delete / docker stop) → graceful stop: drain the
    // in-flight epoch, then release the metrics port — daemon.hpp:80-141's
    // signal loop, Spark-style
    sys.addShutdownHook {
      println("[graft] shutdown signal — stopping query")
      try daemon.stop()
      catch { case scala.util.control.NonFatal(e) => System.err.println(s"[graft] stop: $e") }
    }
    // run loop: survive /reload query swaps (awaitTermination on the OLD
    // query returns when a reload replaces it — poll the daemon, not one
    // query instance)
    while (!daemon.isStopped) {
      try daemon.query.awaitTermination(2000)
      catch { case scala.util.control.NonFatal(_) if daemon.isStopped => () }
    }
  }
}
