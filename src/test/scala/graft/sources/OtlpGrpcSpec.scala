package graft.sources

import graft.SparkSpec

/** HTTP/2 + HPACK + gRPC contracts for the OTLP gRPC pair: HPACK
  * round-trips (multi-byte integers, never-indexed literals, static/
  * dynamic table decode), the h2c conversation (preface, SETTINGS,
  * DATA splitting at max frame size, trailers), gRPC length-prefixed
  * framing, and the Export call end-to-end with status semantics.
  */
class OtlpGrpcSpec extends SparkSpec {

  test("hpack: encode→decode round-trips, including values past the " +
       "7-bit integer prefix and repeated headers") {
    val headers = Seq(
      ":method" -> "POST",
      ":path" -> "/opentelemetry.proto.collector.trace.v1.TraceService/Export",
      "content-type" -> "application/grpc",
      "x-long" -> ("v" * 500), // forces multi-byte length integers
      "x-dup" -> "a", "x-dup" -> "b")
    val dec = new Http2.Hpack.Decoder
    assert(dec.decode(Http2.Hpack.encode(headers)) == headers.toVector)
  }

  test("hpack: decoder handles indexed static entries and literal " +
       "incremental indexing with dynamic-table reuse") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x82) // indexed: static 2 = :method GET
    out.write(0x41) // literal incr indexing, name = static 1 :authority
    out.write(7); out.write("a.b:443".getBytes("UTF-8"))
    out.write(0xbe) // indexed: dynamic 1 (62) = the pair just added
    val dec = new Http2.Hpack.Decoder
    assert(dec.decode(out.toByteArray) == Vector(
      ":method" -> "GET", ":authority" -> "a.b:443",
      ":authority" -> "a.b:443"))
  }

  test("grpc length-prefixed framing round-trips; compressed flag " +
       "rejected") {
    val msg = Array.tabulate[Byte](70000)(i => (i % 113).toByte)
    val framed = OtlpGrpc.grpcFrame(msg)
    assert(framed.length == 70005 && framed(0) == 0)
    assert(OtlpGrpc.parseGrpcFrame(framed).sameElements(msg))
    val bad = framed.clone(); bad(0) = 1
    intercept[IllegalArgumentException] {
      OtlpGrpc.parseGrpcFrame(bad)
    }
  }

  test("h2c endpoint: an oversize body splits into max-frame-size DATA " +
       "frames and reassembles through flow-control updates") {
    val srv = new Http2.Server(ep => {
      val (sid, headers, body, _) = ep.readMessage()
      assert(headers.toMap.get(":path").contains("/echo"))
      ep.sendMessage(Seq(":status" -> "200"), body, stream = sid)
      ()
    })
    try {
      val ep = Http2.connect("127.0.0.1", srv.port)
      try {
        val big = Array.tabulate[Byte](50000)(i => (i % 97).toByte)
        ep.sendMessage(Seq(":method" -> "POST", ":scheme" -> "http",
          ":path" -> "/echo", ":authority" -> "x"), big)
        val (_, headers, back, _) = ep.readMessage()
        assert(headers.toMap.get(":status").contains("200"))
        assert(back.sameElements(big),
          "four DATA frames must reassemble byte-exactly")
      } finally ep.close()
    } finally srv.stop()
  }

  test("otlp over gRPC end-to-end: export POSTs Export calls, the " +
       "collector drains identically to the HTTP half; bad bodies get " +
       "grpc-status 3, unknown methods 12") {
    val tracesJson =
      """{"resourceSpans":[{
        |  "resource":{"attributes":[{"key":"service.name",
        |    "value":{"stringValue":"svc"}}]},
        |  "scopeSpans":[{"scope":{"name":"graft"},
        |    "spans":[
        |      {"traceId":"0102030405060708090a0b0c0d0e0f10",
        |       "spanId":"1112131415161718","name":"op-a","kind":2,
        |       "startTimeUnixNano":"1700000001000000000",
        |       "endTimeUnixNano":"1700000001250000000"},
        |      {"traceId":"0102030405060708090a0b0c0d0e0f10",
        |       "spanId":"2122232425262728","name":"op-b","kind":3,
        |       "startTimeUnixNano":"1700000001050000000",
        |       "endTimeUnixNano":"1700000001080000000"}]}]}]}"""
        .stripMargin
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val canonical = Otlp.parseRequest("trace", "json",
      tracesJson.getBytes("UTF-8"))
    val msgs = Otlp.unbatch("trace", canonical)
    val rows = msgs.zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.Row(v,
        Map("otel_signal_type" -> "trace"), null, i.toLong)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), BrokerStream.schema)
    val srv = new OtlpGrpc.GrpcServer
    try {
      OtlpGrpc.export(df, "127.0.0.1", srv.port)
      assert(srv.receivedCount == 1)
      val back = Otlp.unbatchDf(srv.drain(spark))
        .select("value").collect().map(_.getString(0))
      assert(back.toSeq == msgs,
        "gRPC export → receive → unbatch must be byte-identical")

      // undecodable protobuf body → INVALID_ARGUMENT
      val ep = Http2.connect("127.0.0.1", srv.port)
      try {
        ep.sendMessage(Seq(":method" -> "POST", ":scheme" -> "http",
          ":path" -> OtlpGrpc.servicePath("trace"), ":authority" -> "x",
          "content-type" -> "application/grpc", "te" -> "trailers"),
          OtlpGrpc.grpcFrame("not-protobuf".getBytes("UTF-8") ++
            Array.fill[Byte](40)(-1)))
        val (_, _, _, t1) = ep.readMessage()
        assert(t1.toMap.get("grpc-status").contains("3"))
        // unknown method → UNIMPLEMENTED
        ep.sendMessage(Seq(":method" -> "POST", ":scheme" -> "http",
          ":path" -> "/no.such.Service/Export", ":authority" -> "x",
          "content-type" -> "application/grpc", "te" -> "trailers"),
          OtlpGrpc.grpcFrame(Array.empty))
        val (_, _, _, t2) = ep.readMessage()
        assert(t2.toMap.get("grpc-status").contains("12"))
      } finally ep.close()
      assert(srv.receivedCount == 1, "rejected calls record nothing")
    } finally srv.stop()
  }

  test("GrpcFrameSplitter reassembles messages across adversarial chunk cuts") {
    val msgs = Seq(
      Array.tabulate[Byte](1)(_.toByte),
      Array.empty[Byte],
      Array.tabulate[Byte](300)(i => (i % 127).toByte),
      Array.tabulate[Byte](17)(i => (i + 5).toByte))
    val wire = msgs.map(OtlpGrpc.grpcFrame).foldLeft(Array.empty[Byte])(_ ++ _)
    // every cut position: header straddles, length straddles, body
    // straddles — reassembly must be identical for all of them
    (1 until wire.length).foreach { cut =>
      val got = scala.collection.mutable.Buffer[Array[Byte]]()
      val sp = new OtlpGrpc.GrpcFrameSplitter(m => { got += m; () })
      sp.feed(wire.take(cut))
      sp.feed(wire.drop(cut))
      sp.finish()
      assert(got.size == msgs.size, s"cut=$cut: ${got.size} messages")
      got.zip(msgs).foreach { case (g, w) =>
        assert(g.toSeq == w.toSeq, s"cut=$cut corrupted a message")
      }
    }
    // byte-at-a-time is the worst case
    val got1 = scala.collection.mutable.Buffer[Array[Byte]]()
    val sp1 = new OtlpGrpc.GrpcFrameSplitter(m => { got1 += m; () })
    wire.foreach(b => sp1.feed(Array(b)))
    sp1.finish()
    assert(got1.size == msgs.size &&
      got1.zip(msgs).forall { case (g, w) => g.toSeq == w.toSeq })
    // trailing garbage is detected
    val sp2 = new OtlpGrpc.GrpcFrameSplitter(_ => ())
    sp2.feed(Array[Byte](0, 0))
    intercept[IllegalArgumentException] { sp2.finish() }
  }
}
