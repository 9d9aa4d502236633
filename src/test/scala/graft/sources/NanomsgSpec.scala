package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** nanomsg SP-over-TCP contracts: the 8-byte header with protocol-id
  * pairing validation, u64-length frames, PUSH round-robin, and the
  * RECEIVER-side SUB prefix filtering that distinguishes SP from ZMTP.
  */
class NanomsgSpec extends SparkSpec {

  test("PUSH/PULL: header pairing, framing, round-robin") {
    val push = new Nanomsg.BindSocket("PUSH")
    try {
      val p1 = new Nanomsg.ConnectSocket("127.0.0.1", push.port, "PULL")
      val p2 = new Nanomsg.ConnectSocket("127.0.0.1", push.port, "PULL")
      try {
        push.awaitPeers(2)
        push.send("one".getBytes(UTF_8))
        push.send(("x" * 70000).getBytes(UTF_8)) // u64 framing, big body
        val got = Seq(p1.receive(), p2.receive()).map(new String(_, UTF_8))
        assert(got.contains("one"))
        assert(got.exists(_.length == 70000))
      } finally { p1.close(); p2.close() }
    } finally push.close()
  }

  test("SUB filters receiver-side: the publisher sends everything") {
    val pub = new Nanomsg.BindSocket("PUB")
    try {
      val sub = new Nanomsg.ConnectSocket("127.0.0.1", pub.port, "SUB",
        subFilters = Seq("orders."))
      try {
        pub.awaitPeers(1)
        pub.send("events.a".getBytes(UTF_8))   // reaches, filtered out
        pub.send("orders.new 7".getBytes(UTF_8))
        assert(new String(sub.receive(), UTF_8) == "orders.new 7")
      } finally sub.close()
    } finally pub.close()
  }

  test("mismatched protocol ids fail the handshake; SUB needs filters") {
    val pub = new Nanomsg.BindSocket("PUB")
    try {
      intercept[Exception] {
        new Nanomsg.ConnectSocket("127.0.0.1", pub.port, "PULL")
      }
      intercept[IllegalArgumentException] {
        new Nanomsg.ConnectSocket("127.0.0.1", pub.port, "SUB")
      }
    } finally pub.close()
  }

  test("Spark read drains a bounded stream") {
    val push = new Nanomsg.BindSocket("PUSH")
    try {
      val t = new Thread(() => {
        try {
          push.awaitPeers(1)
          (1 to 4).foreach(i => push.send(s"n$i".getBytes(UTF_8)))
        } catch { case _: Exception => () }
      })
      t.setDaemon(true)
      t.start()
      val out = Nanomsg.read(spark, "127.0.0.1", push.port, "PULL", 4)
        .orderBy("value").collect().map(_.getString(0)).toSeq
      assert(out == Seq("n1", "n2", "n3", "n4"))
    } finally push.close()
  }
}
