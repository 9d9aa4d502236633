package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Http

/** Slack SOCKET MODE (the reference `slack` input,
  * inputs/slack.adoc — its Go side rides the slack-go socketmode
  * client; this implements the PUBLIC protocol over the RFC 6455
  * stack in [[WebSocket]]):
  *
  *   1. `apps.connections.open` (app-level `xapp-` token) returns a
  *      short-lived WebSocket URL;
  *   2. the socket sends `hello`, then `events_api` ENVELOPES —
  *      `{type, envelope_id, payload}` — each of which MUST be acked
  *      with `{"envelope_id": ...}` within 3s or Slack redelivers;
  *   3. a `disconnect` message (refresh/server maintenance) means:
  *      drop the socket and re-open a fresh URL — envelopes not yet
  *      acked arrive again on the next connection.
  *
  * The batch form drains until the server closes without a pending
  * disconnect; ack-before-next gives at-least-once with the ack
  * frontier as the implicit cursor (a crash between delivery and ack
  * redelivers, same contract as the queue inputs).
  */
object SlackSocket {

  private def mapper = Shared.mapper
  private object Shared {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** `apps.connections.open` → the socket URL (401 without an
    * app-level token — the documented auth error shape).
    */
  def openUrl(appToken: String, client: Http.Client,
              baseUrl: String = "https://slack.com/api"): String = {
    val resp = client(Seq(Http.Request(
      s"${baseUrl.stripSuffix("/")}/apps.connections.open", "POST",
      Map("Authorization" -> s"Bearer $appToken",
        "Content-Type" -> "application/x-www-form-urlencoded"), ""))).head
    val n = mapper.readTree(resp.body)
    if (resp.status != 200 || !n.path("ok").asBoolean(false))
      throw new IllegalStateException(
        s"slack: apps.connections.open failed: ${resp.body.take(200)}")
    n.get("url").asText
  }

  /** Drain events over socket mode: hello → envelope/ack loop,
    * transparent reconnect on `disconnect`, stop when a connection
    * closes with nothing left to redeliver. Emits one row per
    * events_api envelope: value = the envelope payload JSON, metadata
    * = slack_envelope_id + slack_event_type.
    */
  def read(spark: SparkSession, appToken: String, client: Http.Client,
           baseUrl: String = "https://slack.com/api",
           maxReconnects: Int = 8): DataFrame = {
    val out = Vector.newBuilder[(String, Map[String, String])]
    var reconnects = 0
    var done = false
    while (!done) {
      val conn = WebSocket.connect(openUrl(appToken, client, baseUrl))
      try {
        var disconnected = false
        var open = true
        while (open) conn.receive() match {
          case WebSocket.Text(v) =>
            val n = mapper.readTree(v)
            n.path("type").asText("") match {
              case "hello" => ()
              case "events_api" =>
                val envId = n.get("envelope_id").asText
                // ack FIRST-class: the server may hold the next
                // envelope until this one is acknowledged
                conn.sendText(s"""{"envelope_id":"$envId"}""")
                out += ((n.get("payload").toString, Map(
                  "slack_envelope_id" -> envId,
                  "slack_event_type" -> n.at("/payload/event/type")
                    .asText(""))))
              case "disconnect" =>
                disconnected = true
                open = false
              case _ => ()
            }
          case WebSocket.Closed(_) => open = false
          case _ => ()
        }
        if (disconnected) {
          reconnects += 1
          require(reconnects <= maxReconnects,
            s"slack: gave up after $maxReconnects reconnects")
        } else done = true
      } finally conn.close()
    }
    val rows = out.result().zipWithIndex.map { case ((v, m), i) =>
      Row(v, m, null, i.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(math.max(rows.size, 1),
          spark.sparkContext.defaultParallelism))), BrokerStream.schema)
  }

  // ───────────────────────── fixture server ─────────────────────────

  /** Loopback socket-mode server: a WebSocket [[WebSocket.Server]]
    * speaking the envelope/ack protocol plus an [[Http.Client]] for
    * `apps.connections.open`. The event frontier advances ONLY on
    * ack (at-least-once: an un-acked envelope is redelivered on the
    * next connection); `disconnectEvery` envelopes triggers the
    * refresh flow mid-stream.
    */
  final class Server(events: Seq[String], appToken: String,
                     disconnectEvery: Int = Int.MaxValue) {
    private val acked = new AtomicInteger(0)
    private val connCount = new AtomicInteger(0)

    private val ws = new WebSocket.Server((conn, path, _) => {
      require(path.startsWith("/link"), s"slack ws: bad path $path")
      connCount.incrementAndGet()
      conn.sendText("""{"type":"hello","num_connections":1}""")
      var sent = 0
      var open = true
      while (open && acked.get < events.size) {
        if (sent >= disconnectEvery) {
          conn.sendText(
            """{"type":"disconnect","reason":"refresh_requested"}""")
          open = false
        } else {
          val idx = acked.get
          val envId = s"env-$idx"
          conn.sendText(s"""{"type":"events_api",""" +
            s""""envelope_id":"$envId",""" +
            s""""payload":${events(idx)}}""")
          sent += 1
          // hold the next envelope until THIS one is acked
          var waiting = true
          while (waiting) conn.receive() match {
            case WebSocket.Text(ack) =>
              val a = Shared.mapper.readTree(ack)
              require(a.path("envelope_id").asText("") == envId,
                s"slack ws: ack for ${a.path("envelope_id").asText("")}" +
                  s" while $envId pending")
              acked.incrementAndGet()
              waiting = false
            case WebSocket.Closed(_) => waiting = false; open = false
            case _ => ()
          }
        }
      }
      if (open) conn.sendClose()
      conn.close()
    })

    /** The HTTP seam for `apps.connections.open`. */
    def httpClient: Http.Client = reqs => reqs.map { q =>
      if (!q.url.endsWith("/apps.connections.open"))
        Http.Response(404, """{"ok":false,"error":"unknown_method"}""")
      else if (!q.headers.get("Authorization")
          .contains(s"Bearer $appToken"))
        Http.Response(200, """{"ok":false,"error":"invalid_auth"}""")
      else Http.Response(200,
        s"""{"ok":true,"url":"${ws.url("/link/abc123")}"}""")
    }

    def ackedCount: Int = acked.get
    def connections: Int = connCount.get
    def stop(): Unit = ws.stop()
  }
}
