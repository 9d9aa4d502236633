package graft.operators

/** Tracer targets (§2.14): the reference registers `jaeger` and
  * `open_telemetry_collector` as OTel tracer providers
  * (internal/impl/jaeger/tracer_jaeger.go:95 — modern Jaeger ingests
  * OTLP natively). Spans export through the engine's OTLP codec as
  * `POST <endpoint>/v1/traces` with the documented resourceSpans/
  * scopeSpans JSON shape — the same wire format the otlp receiver
  * gate already verifies, so a jaeger/OTel collector target is the
  * export half of that pair.
  */
object Tracing {

  private val rng = new java.security.SecureRandom()

  def randomHex(bytes: Int): String = {
    val b = new Array[Byte](bytes)
    rng.nextBytes(b)
    b.map("%02x".format(_)).mkString
  }

  final case class Span(name: String, startNanos: Long, endNanos: Long,
                        attributes: Map[String, String],
                        traceId: String = randomHex(16),
                        spanId: String = randomHex(8),
                        statusError: Option[String] = None)

  /** Render spans as one OTLP/JSON ExportTraceServiceRequest. */
  def otlpJson(serviceName: String, spans: Seq[Span]): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n")
    val spanJson = spans.map { s =>
      val attrs = s.attributes.map { case (k, v) =>
        s"""{"key":"${esc(k)}","value":{"stringValue":"${esc(v)}"}}"""
      }.mkString(",")
      val status = s.statusError match {
        case Some(msg) =>
          s""","status":{"code":2,"message":"${esc(msg.take(200))}"}"""
        case None => ""","status":{"code":1}"""
      }
      s"""{"traceId":"${s.traceId}","spanId":"${s.spanId}",""" +
        s""""name":"${esc(s.name)}","kind":1,""" +
        s""""startTimeUnixNano":"${s.startNanos}",""" +
        s""""endTimeUnixNano":"${s.endNanos}",""" +
        s""""attributes":[$attrs]$status}"""
    }.mkString(",")
    s"""{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"${esc(serviceName)}"}}]},"scopeSpans":[{"scope":{"name":"graft"},"spans":[$spanJson]}]}]}"""
  }

  /** POST spans to an OTLP-ingesting endpoint (jaeger or collector). */
  def export(endpoint: String, serviceName: String, spans: Seq[Span],
             client: Http.Client = null): Unit = {
    if (spans.isEmpty) return
    val c = Option(client).getOrElse(Http.clientFor(endpoint))
    val url = endpoint.stripSuffix("/") + "/v1/traces"
    val resp = c(Seq(Http.Request(url, "POST",
      Map("Content-Type" -> "application/json"),
      otlpJson(serviceName, spans)))).head
    if (resp.status < 200 || resp.status > 299)
      throw new IllegalStateException(
        s"tracer export rejected (${resp.status}): ${resp.body.take(200)}")
  }
}
