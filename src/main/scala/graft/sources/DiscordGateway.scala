package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Http

/** Discord GATEWAY — the live half of the reference `discord` input
  * (internal/impl/discord/input.go consumes MessageCreate events from
  * a discordgo session; this implements the PUBLIC Gateway v10
  * protocol over the RFC 6455 stack in [[WebSocket]]):
  *
  *   1. `GET /gateway/bot` (bot token) → the socket URL;
  *   2. the gateway sends op 10 HELLO `{heartbeat_interval}`; the
  *      client IDENTIFIES (op 2: token, intents, properties) and
  *      receives the READY dispatch (`session_id`,
  *      `resume_gateway_url`);
  *   3. dispatches are op 0 frames with a monotonically increasing
  *      sequence `s` — the client tracks the last seen `s` and
  *      answers heartbeat requests (op 1) with it (ack = op 11);
  *   4. op 7 RECONNECT: drop the socket, reconnect to the resume URL,
  *      and RESUME (op 6: token, session_id, last seq) — the server
  *      replays every dispatch after that seq, then sends RESUMED;
  *   5. op 9 INVALID SESSION `{d: resumable}` — resume if d, else
  *      re-identify (a full replay: at-least-once).
  *
  * The REST backfill (`Discord.read`) covers history; this consumes
  * the live stream. The batch form drains until the server closes
  * with no reconnect pending; the sequence number is the implicit
  * cursor (same at-least-once shape as the socket-mode ack frontier).
  */
object DiscordGateway {

  val OpDispatch = 0; val OpHeartbeat = 1; val OpIdentify = 2
  val OpResume = 6; val OpReconnect = 7; val OpInvalidSession = 9
  val OpHello = 10; val OpHeartbeatAck = 11

  /** GUILD_MESSAGES | MESSAGE_CONTENT — what a message consumer needs. */
  val DefaultIntents: Long = (1L << 9) | (1L << 15)

  private def mapper = Shared.mapper
  private object Shared {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** `GET /gateway/bot` → wss URL (401 shape without a valid token). */
  def gatewayUrl(botToken: String, client: Http.Client,
                 baseUrl: String = "https://discord.com/api/v10"): String = {
    val resp = client(Seq(Http.Request(
      s"${baseUrl.stripSuffix("/")}/gateway/bot", "GET",
      Map("Authorization" -> s"Bot $botToken"), ""))).head
    if (resp.status != 200)
      throw new IllegalStateException(
        s"discord gateway: /gateway/bot ${resp.status}: " +
          resp.body.take(200))
    mapper.readTree(resp.body).get("url").asText
  }

  /** Drain MESSAGE_CREATE events for one channel: identify → dispatch
    * loop with heartbeat replies, RECONNECT→RESUME and INVALID
    * SESSION handled transparently. Emits value = the event `d`
    * payload JSON, metadata = discord_event_type + discord_seq.
    */
  def read(spark: SparkSession, botToken: String, channelId: String,
           client: Http.Client,
           baseUrl: String = "https://discord.com/api/v10",
           intents: Long = DefaultIntents,
           maxReconnects: Int = 8): DataFrame = {
    val out = Vector.newBuilder[(String, Map[String, String])]
    var sessionId: String = null
    var resumeUrl: String = null
    var lastSeq = -1L
    var reconnects = 0
    var resume = false
    var done = false
    while (!done) {
      val url = if (resume && resumeUrl != null) resumeUrl
                else gatewayUrl(botToken, client, baseUrl)
      val conn = WebSocket.connect(url)
      try {
        // HELLO first (heartbeat_interval drives the timer loop in the
        // continuous form; the batch drain answers server requests)
        conn.receive() match {
          case WebSocket.Text(v) =>
            val n = mapper.readTree(v)
            require(n.path("op").asInt(-1) == OpHello,
              s"discord gateway: expected HELLO, got $v")
            require(n.at("/d/heartbeat_interval").asLong(0) > 0)
          case other => throw new IllegalStateException(
            s"discord gateway: no HELLO ($other)")
        }
        if (resume) {
          conn.sendText(s"""{"op":$OpResume,"d":{""" +
            s""""token":"$botToken","session_id":"$sessionId",""" +
            s""""seq":$lastSeq}}""")
        } else {
          conn.sendText(s"""{"op":$OpIdentify,"d":{""" +
            s""""token":"$botToken","intents":$intents,""" +
            """"properties":{"os":"linux","browser":"graft",""" +
            """"device":"graft"}}}""")
        }
        var wantReconnect = false
        var open = true
        while (open) conn.receive() match {
          case WebSocket.Text(v) =>
            val n = mapper.readTree(v)
            n.path("op").asInt(-1) match {
              case OpDispatch =>
                if (!n.path("s").isNull) lastSeq = n.path("s").asLong
                n.path("t").asText("") match {
                  case "READY" =>
                    sessionId = n.at("/d/session_id").asText
                    val ru = n.at("/d/resume_gateway_url").asText("")
                    if (ru.nonEmpty) resumeUrl = ru
                  case "RESUMED" => ()
                  case "MESSAGE_CREATE"
                      if n.at("/d/channel_id").asText("") == channelId =>
                    out += ((n.get("d").toString, Map(
                      "discord_event_type" -> "MESSAGE_CREATE",
                      "discord_seq" -> lastSeq.toString)))
                  case _ => () // other dispatch types: not subscribed
                }
              case OpHeartbeat =>
                // server-requested heartbeat: answer with the last seq
                conn.sendText(s"""{"op":$OpHeartbeat,"d":$lastSeq}""")
              case OpHeartbeatAck => ()
              case OpReconnect =>
                wantReconnect = true
                open = false
              case OpInvalidSession =>
                wantReconnect = true
                resume = n.path("d").asBoolean(false)
                if (!resume) { sessionId = null; lastSeq = -1L }
                open = false
              case _ => ()
            }
          case WebSocket.Closed(_) => open = false
          case _ => ()
        }
        if (wantReconnect) {
          if (sessionId != null) resume = true
          reconnects += 1
          require(reconnects <= maxReconnects,
            s"discord gateway: gave up after $maxReconnects reconnects")
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

  /** Loopback gateway: HELLO → IDENTIFY/RESUME validation → numbered
    * dispatches. Every `heartbeatEvery` dispatches it REQUESTS a
    * heartbeat and verifies the client answers with the last dispatch
    * seq before continuing; after `reconnectAfter` dispatches on a
    * connection it sends op 7 and drops the socket — the client must
    * RESUME with the session id and last seq, and only the tail is
    * replayed. Sequence numbers: READY = 1, event i = i + 2.
    */
  final class GatewayServer(events: Seq[String], botToken: String,
                            reconnectAfter: Int = Int.MaxValue,
                            heartbeatEvery: Int = Int.MaxValue) {
    private val connCount = new AtomicInteger(0)
    private val heartbeats = new AtomicInteger(0)
    private val session = "sess-" +
      java.util.UUID.randomUUID.toString.take(8)

    private val ws: WebSocket.Server = new WebSocket.Server((conn, _, _) => {
      connCount.incrementAndGet()
      conn.sendText(s"""{"op":$OpHello,"d":{"heartbeat_interval":41250}}""")
      val first = conn.receive() match {
        case WebSocket.Text(v) => Shared.mapper.readTree(v)
        case other => throw new IllegalStateException(s"gateway: $other")
      }
      var startIdx = 0
      first.path("op").asInt(-1) match {
        case OpIdentify =>
          require(first.at("/d/token").asText("") == botToken,
            "gateway: identify with wrong token")
          require(first.at("/d/intents").asLong(0) != 0,
            "gateway: identify without intents")
          conn.sendText(s"""{"op":$OpDispatch,"t":"READY","s":1,"d":{""" +
            s""""v":10,"session_id":"$session",""" +
            s""""resume_gateway_url":"${ws.url("/resume")}"}}""")
        case OpResume =>
          require(first.at("/d/session_id").asText("") == session,
            "gateway: resume with unknown session")
          require(first.at("/d/token").asText("") == botToken)
          val seq = first.at("/d/seq").asLong(-1)
          startIdx = math.max(0, (seq - 1).toInt) // event i has s = i+2
          conn.sendText(s"""{"op":$OpDispatch,"t":"RESUMED","s":$seq,""" +
            """"d":null}""")
        case other =>
          throw new IllegalStateException(s"gateway: first op $other")
      }
      var sent = 0
      var i = startIdx
      var open = true
      while (open && i < events.size) {
        if (sent >= reconnectAfter) {
          conn.sendText(s"""{"op":$OpReconnect,"d":null}""")
          open = false
        } else {
          val s = i + 2
          conn.sendText(s"""{"op":$OpDispatch,"t":"MESSAGE_CREATE",""" +
            s""""s":$s,"d":${events(i)}}""")
          sent += 1
          i += 1
          if (sent % heartbeatEvery == 0) {
            conn.sendText(s"""{"op":$OpHeartbeat,"d":null}""")
            var waiting = true
            while (waiting) conn.receive() match {
              case WebSocket.Text(hb) =>
                val h = Shared.mapper.readTree(hb)
                require(h.path("op").asInt(-1) == OpHeartbeat,
                  s"gateway: expected heartbeat, got $hb")
                require(h.path("d").asLong(-1) == s,
                  s"gateway: heartbeat seq ${h.path("d").asLong(-1)}" +
                    s" != last dispatch $s")
                heartbeats.incrementAndGet()
                conn.sendText(s"""{"op":$OpHeartbeatAck}""")
                waiting = false
              case WebSocket.Closed(_) => waiting = false; open = false
              case _ => ()
            }
          }
        }
      }
      if (open) conn.sendClose()
      conn.close()
    })

    /** The HTTP seam for `/gateway/bot`. */
    def httpClient: Http.Client = reqs => reqs.map { q =>
      if (!q.url.endsWith("/gateway/bot"))
        Http.Response(404, """{"message":"404: Not Found"}""")
      else if (!q.headers.get("Authorization")
          .contains(s"Bot $botToken"))
        Http.Response(401, """{"message":"401: Unauthorized"}""")
      else Http.Response(200,
        s"""{"url":"${ws.url("/")}","shards":1}""")
    }

    def connections: Int = connCount.get
    def heartbeatCount: Int = heartbeats.get
    def stop(): Unit = ws.stop()
  }
}
