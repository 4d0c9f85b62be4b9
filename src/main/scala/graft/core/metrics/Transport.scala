package graft.core.metrics

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** Exporter transports for the metrics registry (reference:
  * core/metrics/exporters.py:18-205 — its adapters delegate to
  * prometheus_client / the OTel SDK; this build is offline, so the
  * transports are implemented directly on the JDK: the Prometheus pull
  * model as an embedded scrape endpoint, the OTel push model as an
  * OTLP/JSON HTTP POST).
  */
object Transport {

  /** Embedded Prometheus scrape endpoint: serves the registry's text
    * exposition at `/metrics`. `port = 0` binds an ephemeral port
    * (read it back from [[PrometheusScrapeServer.boundPort]]).
    */
  def serveScrapes(registry: InMemoryMeterRegistry, port: Int = 0): PrometheusScrapeServer =
    new PrometheusScrapeServer(registry, port)

  final class PrometheusScrapeServer private[Transport] (
      registry: InMemoryMeterRegistry, port: Int) extends AutoCloseable {
    private val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", (x: HttpExchange) => {
      val (code, body) =
        if (x.getRequestMethod == "GET")
          (200, registry.prometheusText.getBytes(UTF_8))
        else (405, Array.empty[Byte])
      x.getResponseHeaders.set("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) x.getResponseBody.write(body)
      x.close()
    })
    // a scrape endpoint must not block pipeline threads: single daemon
    // worker, Prometheus scrapes are serial per target anyway
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val th = new Thread(r, "graft-prom-scrape"); th.setDaemon(true); th
    })
    server.start()

    def boundPort: Int = server.getAddress.getPort
    def close(): Unit = server.stop(0)
  }

  /** OTLP/HTTP push: POSTs the registry's OTLP/JSON payload to a
    * collector's `/v1/metrics` endpoint. Returns the HTTP status code;
    * connection failures propagate as IOException so callers can wrap
    * the push in the resilience layer's Retry like any other effect.
    */
  def pushOtlp(
      registry: InMemoryMeterRegistry,
      endpoint: String,
      timeUnixNano: Long,
      serviceName: String = "graft",
      timeoutMs: Int = 10000): Int = {
    val body = registry.otlpJson(timeUnixNano, serviceName).getBytes(UTF_8)
    val conn = URI.create(endpoint).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setFixedLengthStreamingMode(body.length)
      val os = conn.getOutputStream
      try { os.write(body); os.flush() } finally os.close()
      conn.getResponseCode
    } finally conn.disconnect()
  }
}
