package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** zmq4/ZMTP 3.0 contracts: greeting + NULL handshake + READY
  * metadata, socket-pair validation, PUSH/PULL round-robin, PUB/SUB
  * prefix filtering with drop-when-unmatched, multipart and long
  * frames — all over real TCP sockets.
  */
class ZmtpSpec extends SparkSpec {

  test("PUSH/PULL: handshake, round-robin distribution, multipart, long frames") {
    val push = new Zmtp.BindSocket("PUSH")
    try {
      val pull1 = new Zmtp.ConnectSocket("127.0.0.1", push.port, "PULL")
      val pull2 = new Zmtp.ConnectSocket("127.0.0.1", push.port, "PULL")
      try {
        push.awaitPeers(2)
        val big = "z" * 100000 // > 255 → LONG frame
        push.send(Seq("m1".getBytes(UTF_8)))
        push.send(Seq("part-a".getBytes(UTF_8), big.getBytes(UTF_8)))
        val got1 = pull1.receive()
        val got2 = pull2.receive()
        val all = Seq(got1, got2).map(_.map(new String(_, UTF_8)).toList)
        assert(all.contains(List("m1")))
        assert(all.exists(m => m == List("part-a", big)),
          "multipart + LONG frame must arrive intact")
      } finally { pull1.close(); pull2.close() }
    } finally push.close()
  }

  test("PUB/SUB: prefix subscriptions filter; unmatched topics drop") {
    val pub = new Zmtp.BindSocket("PUB")
    try {
      val sub = new Zmtp.ConnectSocket("127.0.0.1", pub.port, "SUB",
        subFilters = Seq("orders."))
      try {
        pub.awaitPeers(1)
        Thread.sleep(50) // allow the subscription message to land
        pub.send(Seq("events.x".getBytes(UTF_8))) // dropped
        pub.send(Seq("orders.new".getBytes(UTF_8), "payload".getBytes(UTF_8)))
        val got = sub.receive().map(new String(_, UTF_8))
        assert(got == Seq("orders.new", "payload"),
          "only the matching topic arrives")
      } finally sub.close()
    } finally pub.close()
  }

  test("socket-pair compatibility is validated at handshake") {
    val pub = new Zmtp.BindSocket("PUB")
    try {
      intercept[Exception] {
        new Zmtp.ConnectSocket("127.0.0.1", pub.port, "PULL")
      }
    } finally pub.close()
  }

  test("SUB without filters is rejected like the reference's lint") {
    val pub = new Zmtp.BindSocket("PUB")
    try {
      val e = intercept[IllegalArgumentException] {
        new Zmtp.ConnectSocket("127.0.0.1", pub.port, "SUB")
      }
      assert(e.getMessage.contains("sub filter"))
    } finally pub.close()
  }

  test("Spark read drains a bounded PUSH stream") {
    val push = new Zmtp.BindSocket("PUSH")
    try {
      val t = new Thread(() => {
        try {
          push.awaitPeers(1)
          (1 to 5).foreach(i => push.send(Seq(s"msg$i".getBytes(UTF_8))))
        } catch { case _: Exception => () }
      })
      t.setDaemon(true)
      t.start()
      val out = Zmtp.read(spark, "127.0.0.1", push.port, "PULL", 5)
        .orderBy("value").collect()
      assert(out.map(_.getString(0)).toSeq ==
        Seq("msg1", "msg2", "msg3", "msg4", "msg5"))
      assert(out.head.getMap[String, String](1)("zmq_socket_type") == "PULL")
    } finally push.close()
  }
}
