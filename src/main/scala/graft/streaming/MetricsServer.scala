package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The /metrics HTTP endpoint — the serving half of the reference's
  * Prometheus story (rigatoni-examples/metrics_prometheus.rs; exporter
  * wiring in rigatoni-core/src/metrics.rs:29-49): a scrape of
  * `GET /metrics` returns [[GraftMetrics.render]] in the Prometheus text
  * exposition format, with every reference metric name pre-registered so
  * the full surface is visible from the first scrape.
  *
  * Deliberately the JDK's built-in single-threaded HttpServer: a scrape
  * endpoint serves one small text page every 15 s to one Prometheus — a
  * real HTTP stack would be dependency weight with no payoff. Runs on the
  * DRIVER (the metric registry is driver-side state fed by the listener
  * and the pipeline write path), one per process like the reference's
  * exporter.
  *
  * {{{
  * val server = MetricsServer.start(port = 9184)   // port 0 = ephemeral
  * // ... pipelines run; Prometheus scrapes http://driver:9184/metrics
  * server.stop()
  * }}}
  */
final class MetricsServer private (server: HttpServer) {
  /** The bound port (useful with `port = 0`). */
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object MetricsServer {
  /** Prometheus text exposition format version header. */
  private val ContentType = "text/plain; version=0.0.4; charset=utf-8"

  def start(port: Int = 9184): MetricsServer = {
    GraftMetrics.seedDefaults()
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body =
          if (x.getRequestMethod == "GET")
            (GraftMetrics.render() + "\n").getBytes(StandardCharsets.UTF_8)
          else Array.empty[Byte]
        val code = if (x.getRequestMethod == "GET") 200 else 405
        x.getResponseHeaders.set("Content-Type", ContentType)
        x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
        if (body.nonEmpty) {
          val os = x.getResponseBody
          try os.write(body) finally os.close()
        }
        x.close()
      }
    })
    server.start()
    new MetricsServer(server)
  }
}
