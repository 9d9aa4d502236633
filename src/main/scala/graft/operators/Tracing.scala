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

  /** `gcp_cloudtrace` tracer (tracers/gcp_cloudtrace.adoc; the
    * reference exports through the Cloud Trace OTel exporter): spans
    * POSTed to the PUBLIC Cloud Trace v2 `traces:batchWrite` surface —
    * `projects/{p}/traces/{traceId}/spans/{spanId}` names, truncatable
    * displayName, RFC3339 times, bearer auth.
    */
  def cloudTraceExport(endpoint: String, project: String, token: String,
                       spans: Seq[Span],
                       client: Http.Client = null): Unit = {
    if (spans.isEmpty) return
    val c = Option(client).getOrElse(Http.clientFor(endpoint))
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def rfc3339(ns: Long) = java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(java.time.Instant.ofEpochSecond(ns / 1000000000L,
        ns % 1000000000L))
    val traceId = randomHex(16)
    val body = spans.map { s =>
      val spanId = randomHex(8)
      val attrs = s.attributes.map { case (k, v) =>
        s""""${esc(k)}":{"stringValue":{"value":"${esc(v)}"}}"""
      }.mkString(",")
      s"""{"name":"projects/$project/traces/$traceId/spans/$spanId",""" +
        s""""spanId":"$spanId",""" +
        s""""displayName":{"value":"${esc(s.name)}"},""" +
        s""""startTime":"${rfc3339(s.startNanos)}",""" +
        s""""endTime":"${rfc3339(s.endNanos)}",""" +
        s""""attributes":{"attributeMap":{$attrs}}""" +
        s.statusError.map(e =>
          s""","status":{"code":2,"message":"${esc(e)}"}""").getOrElse("") +
        "}"
    }.mkString("""{"spans":[""", ",", "]}")
    val resp = c(Seq(Http.Request(
      s"${endpoint.stripSuffix("/")}/v2/projects/$project/traces:batchWrite",
      "POST", Map("Content-Type" -> "application/json",
        "Authorization" -> s"Bearer $token"), body))).head
    if (resp.status < 200 || resp.status > 299)
      throw new IllegalStateException(
        s"cloudtrace export rejected (${resp.status}): ${resp.body.take(200)}")
  }
}
