package graft.sources

import graft.SparkSpec

/** Discord Gateway v10 contracts over the loopback fixture: HELLO →
  * IDENTIFY → READY, numbered dispatches with the seq as the implicit
  * cursor, server-requested heartbeats answered with the last seq,
  * RECONNECT → RESUME replaying exactly the tail, channel filtering,
  * and the /gateway/bot auth shape.
  */
class DiscordGatewaySpec extends SparkSpec {

  private def ev(i: Int, channel: String = "chan-1"): String =
    s"""{"id":"${4000 + i}","channel_id":"$channel",""" +
      s""""content":"m$i","author":{"id":"u1"}}"""

  test("drain with mid-stream reconnects and heartbeat checks: every " +
       "event exactly once, in order, across resumed sessions") {
    val events = (0 until 50).map(ev(_))
    val srv = new DiscordGateway.GatewayServer(events, "bot-tok",
      reconnectAfter = 20, heartbeatEvery = 7)
    try {
      val rows = DiscordGateway.read(spark, "bot-tok", "chan-1",
        srv.httpClient).orderBy("__seq").collect()
      assert(rows.length == 50)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val ids = rows.map(r => m.readTree(r.getString(0))
        .get("id").asText.toInt).toSeq
      assert(ids == (0 until 50).map(4000 + _),
        "RESUME must replay exactly the tail after each reconnect")
      assert(rows.map(_.getMap[String, String](1)("discord_seq").toLong)
        .toSeq == (0 until 50).map(_ + 2L),
        "dispatch seq rides the metadata")
      assert(srv.connections >= 3, "op 7 every 20 events → reconnects")
      // per-connection dispatch counts 20/20/10 → heartbeats at every
      // 7th: 2 + 2 + 1
      assert(srv.heartbeatCount >= 5,
        "server-requested heartbeats must be answered to proceed")
    } finally srv.stop()
  }

  test("events for other channels are not emitted; auth is enforced " +
       "at /gateway/bot") {
    val events = Seq(ev(0), ev(1, "other"), ev(2), ev(3, "other"), ev(4))
    val srv = new DiscordGateway.GatewayServer(events, "bot-tok")
    try {
      val rows = DiscordGateway.read(spark, "bot-tok", "chan-1",
        srv.httpClient).collect()
      assert(rows.length == 3, "channel filter")
      intercept[IllegalStateException] {
        DiscordGateway.gatewayUrl("wrong-tok", srv.httpClient)
      }
    } finally srv.stop()
  }
}
