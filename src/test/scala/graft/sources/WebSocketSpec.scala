package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 6455 contracts over the [[WebSocket]] stack: the handshake
  * accept-key (the RFC's own worked example), frame codec across all
  * three length encodings, §5.1 masking enforcement, fragmentation
  * reassembly, ping/pong transparency, the close handshake, the
  * loopback server + client end-to-end, the input/output components,
  * and the Slack socket-mode envelope/ack/reconnect protocol
  * ([[SlackSocket]]).
  */
class WebSocketSpec extends SparkSpec {

  test("Sec-WebSocket-Accept matches the RFC 6455 §1.3 worked example") {
    assert(WebSocket.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("frame codec round-trips 7/16/64-bit payload lengths, masked " +
       "and unmasked") {
    Seq(5, 125, 126, 65535, 65536, 70000).foreach { n =>
      val payload = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      Seq(true, false).foreach { mask =>
        val bos = new ByteArrayOutputStream()
        WebSocket.writeFrame(bos,
          WebSocket.Frame(fin = true, WebSocket.OpBinary, payload), mask)
        val f = WebSocket.readFrame(
          new ByteArrayInputStream(bos.toByteArray), requireMasked = mask)
        assert(f.fin && f.opcode == WebSocket.OpBinary)
        assert(f.payload.sameElements(payload),
          s"length $n masked=$mask must round-trip")
      }
    }
  }

  test("§5.1 masking enforcement: unmasked client frames and masked " +
       "server frames are protocol errors (1002)") {
    val bos = new ByteArrayOutputStream()
    WebSocket.writeFrame(bos,
      WebSocket.Frame(fin = true, WebSocket.OpText, "x".getBytes),
      mask = false)
    intercept[WebSocket.ProtocolError] {
      WebSocket.readFrame(new ByteArrayInputStream(bos.toByteArray),
        requireMasked = true)
    }
    val bos2 = new ByteArrayOutputStream()
    WebSocket.writeFrame(bos2,
      WebSocket.Frame(fin = true, WebSocket.OpText, "x".getBytes),
      mask = true)
    intercept[WebSocket.ProtocolError] {
      WebSocket.readFrame(new ByteArrayInputStream(bos2.toByteArray),
        requireMasked = false)
    }
  }

  test("e2e: handshake, echo, fragmentation reassembly, transparent " +
       "ping/pong, close handshake; non-upgrade requests get 400") {
    val srv = new WebSocket.Server((conn, path, hdrs) => {
      assert(path == "/echo?x=1")
      assert(hdrs.get("x-graft-auth").contains("tok"))
      var open = true
      while (open) conn.receive() match {
        case WebSocket.Text(v) => conn.sendText(s"echo:$v")
        case WebSocket.Binary(b) => conn.sendBinary(b)
        case WebSocket.Closed(code) => open = false
      }
      conn.close()
    })
    try {
      val conn = WebSocket.connect(s"ws://127.0.0.1:${srv.port}/echo?x=1",
        Map("X-Graft-Auth" -> "tok"))
      conn.sendText("hello")
      assert(conn.receive() == WebSocket.Text("echo:hello"))
      // fragmented message reassembles server-side before the echo
      val long = "fragmented-" * 50
      conn.sendTextFragmented(long, chunk = 64)
      assert(conn.receive() == WebSocket.Text(s"echo:$long"))
      // a ping between data frames is answered transparently
      conn.sendPing("p1".getBytes)
      conn.sendText("after-ping")
      assert(conn.receive() == WebSocket.Text("echo:after-ping"),
        "pong must not surface as a data message")
      conn.sendClose(1000)
      assert(conn.receive() == WebSocket.Closed(1000),
        "close handshake echoes the status code")
      conn.close()

      // plain HTTP against the ws port → 400
      val resp = graft.operators.Http.javaClient()(Seq(
        graft.operators.Http.Request(
          s"http://127.0.0.1:${srv.port}/echo", "GET", Map.empty, ""))).head
      assert(resp.status == 400)
    } finally srv.stop()
  }

  test("websocket output: one connection per partition feeds the " +
       "collector; input drains a serving socket in order") {
    val collect = new WebSocket.CollectServer
    try {
      val df = spark.range(100).selectExpr(
        "concat('m', id) AS value").repartition(4)
      WebSocket.write(df, collect.url)
      assert(collect.messages.size == 100)
      assert(collect.messages.toSet ==
        (0 until 100).map(i => s"m$i").toSet)
      val back = collect.drain(spark).select("value").collect()
      assert(back.length == 100)
    } finally collect.close()

    val feeder = new WebSocket.Server((conn, _, _) => {
      conn.receive() match {
        case WebSocket.Text("start") =>
          (0 until 25).foreach(i => conn.sendText(s"f$i"))
          conn.sendClose()
          conn.receive() // close echo
          conn.close()
        case _ => conn.close()
      }
    })
    try {
      val rows = WebSocket.read(spark, s"ws://127.0.0.1:${feeder.port}/",
        openMessage = Some("start"))
        .orderBy("__seq").select("value").collect().map(_.getString(0))
      assert(rows.toSeq == (0 until 25).map(i => s"f$i"),
        "drain preserves server emission order in __seq")
    } finally feeder.stop()
  }

  test("slack socket mode: hello → envelope/ack serialization, " +
       "mid-stream disconnect reconnects with no loss or duplication") {
    val events = (0 until 40).map(i =>
      s"""{"event":{"type":"message","id":$i}}""")
    val srv = new SlackSocket.Server(events, "xapp-tok",
      disconnectEvery = 15)
    try {
      val df = SlackSocket.read(spark, "xapp-tok", srv.httpClient)
      val rows = df.orderBy("__seq").collect()
      assert(rows.length == 40, "every envelope exactly once")
      val ids = rows.map(r => new com.fasterxml.jackson.databind
        .ObjectMapper().readTree(r.getString(0))
        .at("/event/id").asInt).toSeq
      assert(ids == (0 until 40), "ack frontier preserves order")
      assert(rows.forall(_.getMap[String, String](1)(
        "slack_event_type") == "message"))
      assert(srv.connections >= 3,
        "disconnect every 15 envelopes must force reconnects")
      assert(srv.ackedCount == 40)
    } finally srv.stop()
  }

  test("slack socket mode: invalid app token fails loudly at " +
       "apps.connections.open") {
    val srv = new SlackSocket.Server(Seq.empty, "xapp-right")
    try {
      intercept[IllegalStateException] {
        SlackSocket.openUrl("xapp-wrong", srv.httpClient)
      }
    } finally srv.stop()
  }

  test("config runner: websocket input and output forms") {
    val collect = new WebSocket.CollectServer
    try {
      graft.config.Pipeline.run(spark,
        s"""input:
           |  generate:
           |    count: 6
           |    mapping: 'root.id = this.seq'
           |output:
           |  websocket:
           |    url: ${collect.url}
           |""".stripMargin)
      assert(collect.messages.size == 6)
    } finally collect.close()

    val feeder = new WebSocket.Server((conn, _, _) => {
      (0 until 4).foreach(i => conn.sendText(s"""{"n":$i}"""))
      conn.sendClose()
      conn.receive()
      conn.close()
    })
    try {
      val df = graft.config.Pipeline.build(spark,
        s"""input:
           |  websocket:
           |    url: ws://127.0.0.1:${feeder.port}/
           |""".stripMargin)
      assert(df.count() == 4)
    } finally feeder.stop()
  }
}
