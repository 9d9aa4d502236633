package graft.operators

import graft.SparkSpec

/** Tracer-target contracts: OTLP span shape, status codes, and the
  * config `tracer:` block exporting the pipeline-run span into the
  * REAL loopback OTLP receiver.
  */
class TracingSpec extends SparkSpec {

  test("OTLP JSON shape: resourceSpans/scopeSpans, ids, status codes") {
    val span = Tracing.Span("op", 1000L, 2000L, Map("k" -> "v"),
      traceId = "aa" * 16, spanId = "bb" * 8)
    val json = Tracing.otlpJson("svc", Seq(span))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val rs = root.path("resourceSpans").get(0)
    assert(rs.path("resource").path("attributes").get(0)
      .path("value").path("stringValue").asText == "svc")
    val s = rs.path("scopeSpans").get(0).path("spans").get(0)
    assert(s.path("traceId").asText.length == 32)
    assert(s.path("spanId").asText.length == 16)
    assert(s.path("name").asText == "op")
    assert(s.path("startTimeUnixNano").asText == "1000")
    assert(s.path("status").path("code").asInt == 1)
    // error status
    val bad = Tracing.otlpJson("svc",
      Seq(span.copy(statusError = Some("boom"))))
    val sb = mapper.readTree(bad).path("resourceSpans").get(0)
      .path("scopeSpans").get(0).path("spans").get(0)
    assert(sb.path("status").path("code").asInt == 2)
    assert(sb.path("status").path("message").asText == "boom")
  }

  test("config tracer block exports the run span to a real OTLP receiver") {
    val server = new graft.sources.Otlp.HttpServer()
    try {
      val config =
        s"""input:
           |  generate: { count: 3, mapping: 'root.id = this.seq' }
           |tracer:
           |  open_telemetry_collector:
           |    url: "http://127.0.0.1:${server.port}"
           |    service_name: trace_probe
           |output:
           |  memory: { name: tracer_probe_out }
           |""".stripMargin
      graft.config.Pipeline.run(spark, config)
      val spans = server.drain(spark).collect()
      assert(spans.length == 1)
      val row = spans.head
      assert(row.getString(row.fieldIndex("signal")) == "trace")
      val body = new String(
        row.getAs[Array[Byte]](row.fieldIndex("body")), "UTF-8")
      assert(body.contains("pipeline.run"))
      assert(body.contains("trace_probe"))
    } finally server.stop()
  }
}
