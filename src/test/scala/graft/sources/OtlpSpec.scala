package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Http

/** OTLP/HTTP receiver contracts (internal/impl/otlp input_http.go +
  * otlpconv): protobuf/JSON encoding parity on the public
  * opentelemetry-proto v1 schema, OTLP/JSON key-form normalization,
  * per-item unbatching with embedded Resource/Scope, and the real
  * loopback server (content-type negotiation, bearer auth, 400 on
  * garbage) driven through the production Http.javaClient.
  */
class OtlpSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private val tracesJson =
    """{
      |  "resourceSpans": [{
      |    "resource": {
      |      "attributes": [
      |        {"key": "service.name", "value": {"stringValue": "checkout"}},
      |        {"key": "host.cpus", "value": {"intValue": "8"}},
      |        {"key": "host.ratio", "value": {"doubleValue": 0.25}},
      |        {"key": "host.spot", "value": {"boolValue": true}},
      |        {"key": "host.tags", "value": {"arrayValue": {"values": [
      |          {"stringValue": "a"}, {"intValue": "2"}]}}},
      |        {"key": "host.kv", "value": {"kvlistValue": {"values": [
      |          {"key": "inner", "value": {"stringValue": "v"}}]}}}
      |      ]
      |    },
      |    "schemaUrl": "https://opentelemetry.io/schemas/1.21.0",
      |    "scopeSpans": [{
      |      "scope": {"name": "graft-test", "version": "1.2.3"},
      |      "schemaUrl": "https://opentelemetry.io/schemas/1.21.0",
      |      "spans": [{
      |        "traceId": "0102030405060708090a0b0c0d0e0f10",
      |        "spanId": "1112131415161718",
      |        "parentSpanId": "2122232425262728",
      |        "name": "GET /cart",
      |        "kind": 2,
      |        "startTimeUnixNano": "1700000001000000000",
      |        "endTimeUnixNano": "1700000001250000000",
      |        "attributes": [
      |          {"key": "http.status_code", "value": {"intValue": "200"}}],
      |        "events": [{"timeUnixNano": "1700000001100000000",
      |          "name": "cache.miss"}],
      |        "links": [{"traceId": "a102030405060708090a0b0c0d0e0f10",
      |          "spanId": "b112131415161718"}],
      |        "status": {"code": 2, "message": "boom"},
      |        "flags": 256
      |      },
      |      {
      |        "traceId": "0102030405060708090a0b0c0d0e0f10",
      |        "spanId": "3132333435363738",
      |        "name": "SELECT cart",
      |        "kind": 3,
      |        "startTimeUnixNano": "1700000001050000000",
      |        "endTimeUnixNano": "1700000001080000000"
      |      }]
      |    }]
      |  }]
      |}""".stripMargin

  test("protobuf and JSON forms of the same traces request normalize " +
       "to identical canonical messages") {
    val canonical = Otlp.parseRequest("trace", "json",
      tracesJson.getBytes("UTF-8"))
    val wire = Otlp.encodeRequest("trace",
      mapper.writeValueAsString(canonical))
    val reparsed = Otlp.parseRequest("trace", "protobuf", wire)
    val a = Otlp.unbatch("trace", canonical)
    val b = Otlp.unbatch("trace", reparsed)
    assert(a.size == 2 && b.size == 2)
    assert(a.map(mapper.readTree) == b.map(mapper.readTree),
      "proto round-trip must preserve every field the JSON form carries")
  }

  test("unbatch embeds resource + scope + schema urls on every span") {
    val req = Otlp.parseRequest("trace", "json", tracesJson.getBytes("UTF-8"))
    val msgs = Otlp.unbatch("trace", req).map(mapper.readTree)
    msgs.foreach { m =>
      assert(m.get("resource").get("attributes").size() == 6)
      assert(m.get("scope").get("name").asText == "graft-test")
      assert(m.get("resourceSchemaUrl").asText.nonEmpty)
      assert(m.get("scopeSchemaUrl").asText.nonEmpty)
    }
    assert(msgs.map(_.get("name").asText) == Seq("GET /cart", "SELECT cart"))
    val s1 = msgs.head
    assert(s1.get("status").get("code").asInt == 2)
    assert(s1.get("events").get(0).get("name").asText == "cache.miss")
    assert(s1.get("links").get(0).get("traceId").asText
      == "a102030405060708090a0b0c0d0e0f10")
    assert(s1.get("flags").asInt == 256)
  }

  test("OTLP/JSON accepts snake_case keys and numeric 64-bit forms") {
    val alt =
      """{"resource_spans": [{
        |  "resource": {"attributes": [
        |    {"key": "service.name", "value": {"string_value": "alt"}}]},
        |  "scope_spans": [{
        |    "scope": {"name": "s"},
        |    "spans": [{
        |      "trace_id": "0102030405060708090A0B0C0D0E0F10",
        |      "span_id": "1112131415161718",
        |      "name": "n", "kind": 1,
        |      "start_time_unix_nano": 1700000001000000000,
        |      "end_time_unix_nano": 1700000002000000000}]}]}]}""".stripMargin
    val req = Otlp.parseRequest("trace", "json", alt.getBytes("UTF-8"))
    val m = mapper.readTree(Otlp.unbatch("trace", req).head)
    assert(m.get("traceId").asText == "0102030405060708090a0b0c0d0e0f10",
      "hex ids normalize to lowercase")
    assert(m.get("startTimeUnixNano").asText == "1700000001000000000",
      "numeric 64-bit input normalizes to the canonical string form")
    assert(m.get("resource").get("attributes").get(0).get("value")
      .get("stringValue").asText == "alt")
  }

  test("logs round-trip: severity, AnyValue body, hex ids, event_name") {
    val logsJson =
      """{"resourceLogs": [{
        |  "resource": {"attributes": [
        |    {"key": "service.name", "value": {"stringValue": "ingest"}}]},
        |  "scopeLogs": [{
        |    "scope": {"name": "app"},
        |    "logRecords": [{
        |      "timeUnixNano": "1700000003000000000",
        |      "observedTimeUnixNano": "1700000003100000000",
        |      "severityNumber": 17, "severityText": "ERROR",
        |      "body": {"kvlistValue": {"values": [
        |        {"key": "msg", "value": {"stringValue": "disk full"}},
        |        {"key": "free_mb", "value": {"intValue": "12"}}]}},
        |      "attributes": [{"key": "disk", "value": {"stringValue": "sda"}}],
        |      "traceId": "0102030405060708090a0b0c0d0e0f10",
        |      "spanId": "1112131415161718",
        |      "eventName": "disk.pressure"}]}]}]}""".stripMargin
    val canonical = Otlp.parseRequest("log", "json", logsJson.getBytes("UTF-8"))
    val wire = Otlp.encodeRequest("log", mapper.writeValueAsString(canonical))
    val reparsed = Otlp.parseRequest("log", "protobuf", wire)
    val a = Otlp.unbatch("log", canonical).map(mapper.readTree)
    val b = Otlp.unbatch("log", reparsed).map(mapper.readTree)
    assert(a == b && a.size == 1)
    assert(a.head.get("severityNumber").asInt == 17)
    assert(a.head.get("body").get("kvlistValue").get("values")
      .get(1).get("value").get("intValue").asText == "12")
    assert(a.head.get("eventName").asText == "disk.pressure")
  }

  test("metrics round-trip: gauge, monotonic sum, histogram with " +
       "bounds; packed wire form accepted") {
    val metricsJson =
      """{"resourceMetrics": [{
        |  "resource": {"attributes": [
        |    {"key": "service.name", "value": {"stringValue": "m"}}]},
        |  "scopeMetrics": [{
        |    "scope": {"name": "meter"},
        |    "metrics": [
        |      {"name": "cpu.util", "unit": "1", "gauge": {"dataPoints": [
        |        {"timeUnixNano": "1700000004000000000", "asDouble": 0.7}]}},
        |      {"name": "requests", "unit": "{req}", "sum": {
        |        "dataPoints": [{"timeUnixNano": "1700000004000000000",
        |          "asInt": "42"}],
        |        "aggregationTemporality": 2, "isMonotonic": true}},
        |      {"name": "latency", "unit": "ms", "histogram": {
        |        "dataPoints": [{
        |          "timeUnixNano": "1700000004000000000",
        |          "count": "10", "sum": 123.5,
        |          "bucketCounts": ["1", "4", "5"],
        |          "explicitBounds": [5.0, 50.0],
        |          "min": 1.5, "max": 99.0}],
        |        "aggregationTemporality": 2}}
        |    ]}]}]}""".stripMargin
    val canonical =
      Otlp.parseRequest("metric", "json", metricsJson.getBytes("UTF-8"))
    val wire = Otlp.encodeRequest("metric", mapper.writeValueAsString(canonical))
    val reparsed = Otlp.parseRequest("metric", "protobuf", wire)
    val a = Otlp.unbatch("metric", canonical).map(mapper.readTree)
    val b = Otlp.unbatch("metric", reparsed).map(mapper.readTree)
    assert(a == b && a.size == 3)
    assert(a(1).get("sum").get("isMonotonic").asBoolean)
    assert(a(1).get("sum").get("dataPoints").get(0).get("asInt").asText == "42")
    val h = a(2).get("histogram").get("dataPoints").get(0)
    assert(h.get("bucketCounts").size == 3 && h.get("explicitBounds").size == 2)
    assert(h.get("min").asDouble == 1.5)

    // exporters emit PACKED repeated scalars: hand-pack the histogram
    // point's bucketCounts (field 6, wire type 2) and explicitBounds
    // (field 7) and check the decoder unpacks them identically
    def varint(v: Long): Array[Byte] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = v
      while ((x & ~0x7fL) != 0) { b += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      b += x.toByte; b.toArray
    }
    def fixed64(v: Long): Array[Byte] =
      (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    // HistogramDataPoint{ time=3 fixed64, count=4 fixed64,
    //   bucket_counts=6 packed fixed64, explicit_bounds=7 packed double }
    val packedPoint =
      varint((3L << 3) | 1) ++ fixed64(1700000004000000000L) ++
      varint((4L << 3) | 1) ++ fixed64(10L) ++
      varint((6L << 3) | 2) ++ varint(24) ++
        fixed64(1) ++ fixed64(4) ++ fixed64(5) ++
      varint((7L << 3) | 2) ++ varint(16) ++
        fixed64(java.lang.Double.doubleToLongBits(5.0)) ++
        fixed64(java.lang.Double.doubleToLongBits(50.0))
    def lenDelim(num: Int, payload: Array[Byte]): Array[Byte] =
      varint((num.toLong << 3) | 2) ++ varint(payload.length) ++ payload
    val packedReq = lenDelim(1, // resource_metrics
      lenDelim(2, // scope_metrics
        lenDelim(2, // metrics
          Array.concat(
            varint((1L << 3) | 2), varint(3), "lat".getBytes("UTF-8"),
            lenDelim(9, // histogram
              lenDelim(1, packedPoint))))))
    val dec = Otlp.parseRequest("metric", "protobuf", packedReq)
    val pm = mapper.readTree(Otlp.unbatch("metric", dec).head)
    val hp = pm.get("histogram").get("dataPoints").get(0)
    assert(hp.get("bucketCounts").size == 3)
    assert(hp.get("bucketCounts").get(1).asText == "4")
    assert(hp.get("explicitBounds").get(1).asDouble == 50.0)
  }

  test("rebatch is unbatch's inverse: shared resource/scope collapse " +
       "back into one group; distinct resources split") {
    val canonical = Otlp.parseRequest("trace", "json",
      tracesJson.getBytes("UTF-8"))
    val msgs = Otlp.unbatch("trace", canonical)
    val rebuilt = Otlp.rebatch("trace", msgs)
    // text compare: Jackson's IntNode(256) != LongNode(256) even
    // though the serialized forms are identical
    assert(mapper.writeValueAsString(rebuilt)
      == mapper.writeValueAsString(canonical),
      "round trip must rebuild the exact original batch structure")
    // two messages with DIFFERENT resources → two resourceSpans groups
    val m2 = mapper.readTree(msgs.head).deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    m2.putObject("resource").putArray("attributes").addObject()
      .put("key", "service.name").putObject("value")
      .put("stringValue", "other")
    val split = Otlp.rebatch("trace",
      Seq(msgs.head, mapper.writeValueAsString(m2)))
    assert(split.get("resourceSpans").size == 2)
  }

  test("export POSTs re-grouped protobuf batches executor-side; the " +
       "receiver round-trips them identically") {
    val srv = new Otlp.HttpServer(authToken = Some("xyz"))
    try {
      val canonical = Otlp.parseRequest("trace", "json",
        tracesJson.getBytes("UTF-8"))
      val msgs = Otlp.unbatch("trace", canonical)
      val rows = msgs.zipWithIndex.map { case (m, i) =>
        org.apache.spark.sql.Row(m,
          Map("otel_signal_type" -> "trace"), null, i.toLong)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), BrokerStream.schema)
      Otlp.export(df, s"http://127.0.0.1:${srv.port}",
        contentType = "protobuf", authToken = Some("xyz"))
      assert(srv.receivedCount == 1)
      val back = Otlp.unbatchDf(srv.drain(spark))
        .select("value").collect().map(_.getString(0))
      assert(back.toSeq == msgs,
        "export → receive → unbatch must be byte-identical")
    } finally srv.stop()
  }

  test("http server: JSON + protobuf posts accepted by content-type, " +
       "401 without bearer token, 400 on garbage; drain unbatches " +
       "both encodings identically") {
    val srv = new Otlp.HttpServer(authToken = Some("tok123"))
    try {
      val client = Http.javaClient()
      val canonical = Otlp.parseRequest("trace", "json",
        tracesJson.getBytes("UTF-8"))
      val wire = Otlp.encodeRequest("trace",
        mapper.writeValueAsString(canonical))
      val auth = Map("Authorization" -> "Bearer tok123")
      val rs = client(Seq(
        Http.Request(srv.url("trace"), "POST",
          auth + ("Content-Type" -> "application/json"), tracesJson),
        Http.Request(srv.url("trace"), "POST",
          auth + ("Content-Type" -> "application/x-protobuf"), "",
          bodyBytes = wire),
        Http.Request(srv.url("trace"), "POST",
          Map("Content-Type" -> "application/json"), tracesJson),
        Http.Request(srv.url("trace"), "POST",
          auth + ("Content-Type" -> "application/json"), "not json at all")))
      assert(rs(0).status == 200 && rs(0).body == "{}")
      assert(rs(1).status == 200)
      assert(rs(2).status == 401, "missing bearer token")
      assert(rs(3).status == 400, "undecodable body")
      assert(srv.receivedCount == 2)

      val msgs = Otlp.unbatchDf(srv.drain(spark))
      val rows = msgs.select(
        get_json_object(col("value"), "$.name").as("name"),
        col("metadata")("otel_signal_type").as("sig"),
        col("metadata")("otel_encoding").as("enc")).collect()
      assert(rows.length == 4, "2 requests × 2 spans")
      assert(rows.map(_.getString(0)).sorted.toSeq ==
        Seq("GET /cart", "GET /cart", "SELECT cart", "SELECT cart"))
      assert(rows.forall(_.getString(1) == "trace"))
      assert(rows.map(_.getString(2)).sorted.toSeq ==
        Seq("json", "json", "protobuf", "protobuf"))
      // byte-identical unbatch across encodings
      val values = msgs.select("value").collect().map(_.getString(0))
      assert(values.toSet.size == 2,
        "json and protobuf requests unbatch to identical messages")
    } finally srv.stop()
  }

  test("repeated-scalar zeros survive: bucketCounts with zeros and " +
       "explicitBounds starting at 0.0 round-trip untruncated") {
    val metricsJson =
      """{"resourceMetrics": [{
        |  "scopeMetrics": [{"metrics": [
        |    {"name": "latency", "unit": "ms", "histogram": {
        |      "dataPoints": [{
        |        "timeUnixNano": "1700000004000000000",
        |        "count": "4", "sum": 12.5,
        |        "bucketCounts": ["0", "4", "0"],
        |        "explicitBounds": [0.0, 50.0]}],
        |      "aggregationTemporality": 2}}
        |  ]}]}]}""".stripMargin
    val canonical =
      Otlp.parseRequest("metric", "json", metricsJson.getBytes("UTF-8"))
    val wire = Otlp.encodeRequest("metric",
      mapper.writeValueAsString(canonical))
    val reparsed = Otlp.parseRequest("metric", "protobuf", wire)
    assert(mapper.writeValueAsString(reparsed)
      == mapper.writeValueAsString(canonical),
      "JSON vs protobuf parity with zero-valued repeated elements")
    val h = mapper.readTree(Otlp.unbatch("metric", reparsed).head)
      .get("histogram").get("dataPoints").get(0)
    assert(h.get("bucketCounts").size == 3,
      "zero elements of bucketCounts must not be dropped")
    assert((0 to 2).map(h.get("bucketCounts").get(_).asText)
      == Seq("0", "4", "0"))
    assert(h.get("explicitBounds").size == 2)
    assert(h.get("explicitBounds").get(0).asDouble == 0.0,
      "a leading 0.0 bound must keep bucket/bound alignment")
  }

  test("oneof members at default values are serialized: asDouble 0.0, " +
       "attribute intValue 0 / boolValue false / stringValue \"\"") {
    val metricsJson =
      """{"resourceMetrics": [{
        |  "resource": {"attributes": [
        |    {"key": "zero.int", "value": {"intValue": "0"}},
        |    {"key": "flag.off", "value": {"boolValue": false}},
        |    {"key": "empty.str", "value": {"stringValue": ""}}]},
        |  "scopeMetrics": [{"metrics": [
        |    {"name": "idle", "gauge": {"dataPoints": [
        |      {"timeUnixNano": "1700000004000000000",
        |       "asDouble": 0.0}]}},
        |    {"name": "zeroes", "sum": {"dataPoints": [
        |      {"timeUnixNano": "1700000004000000000", "asInt": "0"}],
        |      "aggregationTemporality": 2}}
        |  ]}]}]}""".stripMargin
    val canonical =
      Otlp.parseRequest("metric", "json", metricsJson.getBytes("UTF-8"))
    val wire = Otlp.encodeRequest("metric",
      mapper.writeValueAsString(canonical))
    val reparsed = Otlp.parseRequest("metric", "protobuf", wire)
    assert(mapper.writeValueAsString(reparsed)
      == mapper.writeValueAsString(canonical),
      "set-but-default oneof members must survive both encodings")
    val items = Otlp.unbatch("metric", reparsed).map(mapper.readTree)
    val attrs = items.head.get("resource").get("attributes")
    assert(attrs.size == 3)
    assert(attrs.get(0).get("value").get("intValue").asText == "0")
    assert(attrs.get(1).get("value").get("boolValue").asBoolean == false)
    assert(attrs.get(2).get("value").get("stringValue").asText == "")
    val gaugePt = items(0).get("gauge").get("dataPoints").get(0)
    assert(gaugePt.has("asDouble") && gaugePt.get("asDouble").asDouble == 0.0,
      "a 0.0 gauge point must stay distinguishable from a value-less one")
    val sumPt = items(1).get("sum").get("dataPoints").get(0)
    assert(sumPt.has("asInt") && sumPt.get("asInt").asText == "0")
  }

  test("unbatchDf folds the request seq into __seq high bits so rows " +
       "from different requests never collide") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val body = tracesJson.getBytes("UTF-8")
    val schema = StructType(Seq(
      StructField("signal", StringType), StructField("encoding", StringType),
      StructField("body", BinaryType), StructField("__seq", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("trace", "json", body, 0L), Row("trace", "json", body, 1L)), 2),
      schema)
    val seqs = Otlp.unbatchDf(df).select("__seq").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(seqs == Seq(0L, 1L, 1L << 32, (1L << 32) | 1L),
      "request seq in high bits, item index in low bits")
  }
}
