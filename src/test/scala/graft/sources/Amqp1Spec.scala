package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** AMQP 1.0 wire contract (`amqp_1` input/output): type-system
  * round trips, SASL PLAIN, flow-controlled transfers, disposition
  * settlement, at-least-once redelivery — over real TCP sockets.
  */
class Amqp1Spec extends SparkSpec {
  import spark.implicits._
  import Amqp1._

  test("type system round-trips compact and large encodings") {
    val vals: Seq[AVal] = Seq(
      ANull, ABool(true), ABool(false), AUInt(0), AUInt(7), AUInt(70000),
      AULong(0), AULong(9), AULong(1L << 40), AInt(-3), AInt(100000),
      AStr("hello"), AStr("x" * 300), ASym("PLAIN"),
      ABin(Array[Byte](1, 2, 3)),
      AList(Seq(AStr("a"), AUInt(1), ANull)),
      AMapV(Seq((AStr("k"), AStr("v")), (ASym("s"), AUInt(2)))),
      AArray(Seq(ASym("PLAIN"), ASym("ANONYMOUS"))),
      ADesc(AULong(0x73), AList(Seq(AStr("mid")))))
    vals.foreach { v =>
      val got = new Decoder(encode(v)).read()
      (v, got) match {
        case (ABin(a), ABin(b)) => assert(a.toSeq == b.toSeq)
        case _ => assert(got == v, s"round trip of $v gave $got")
      }
    }
  }

  test("send/receive round trip with properties and app-properties") {
    val srv = new Server()
    try {
      val c = new Client("127.0.0.1", srv.port)
      c.sendAll("q1", (1 to 10).map(i => Message(s"m$i".getBytes(UTF_8),
        messageId = s"id-$i", appProps = Map("n" -> i.toString))))
      c.close()
      assert(srv.depth("q1") == 10)
      val c2 = new Client("127.0.0.1", srv.port)
      val got = c2.receive("q1", 100)
      c2.close()
      assert(got.size == 10)
      assert(got.map(m => new String(m.body, UTF_8)) == (1 to 10).map("m" + _))
      assert(got.head.messageId == "id-1" && got.head.appProps("n") == "1")
      assert(srv.depth("q1") == 0, "accepted dispositions removed them")
    } finally srv.stop()
  }

  test("link credit bounds a delivery batch; drain flow ends early reads") {
    val srv = new Server()
    try {
      val c = new Client("127.0.0.1", srv.port)
      c.sendAll("q2", (1 to 30).map(i => Message(s"$i".getBytes(UTF_8))))
      assert(c.receive("q2", 12).size == 12, "credit caps the batch")
      assert(c.receive("q2", 100).size == 18, "drain returns the rest")
      assert(c.receive("q2", 5).isEmpty, "empty queue drains to nothing")
      c.close()
    } finally srv.stop()
  }

  test("unsettled deliveries requeue on detach (at-least-once)") {
    val srv = new Server()
    try {
      val c = new Client("127.0.0.1", srv.port)
      c.sendAll("q3", (1 to 5).map(i => Message(s"$i".getBytes(UTF_8))))
      val peeked = c.receive("q3", 5, settle = false)
      assert(peeked.size == 5 && srv.depth("q3") == 5,
        "unacked deliveries must return to the queue")
      val again = c.receive("q3", 5)
      assert(again.size == 5 && srv.depth("q3") == 0)
      c.close()
    } finally srv.stop()
  }

  test("sasl plain: good credentials pass, bad are rejected") {
    val srv = new Server(user = "svc", pass = "sekret")
    try {
      val c = new Client("127.0.0.1", srv.port, "svc", "sekret")
      c.sendAll("q4", Seq(Message("ok".getBytes(UTF_8))))
      c.close()
      assert(srv.depth("q4") == 1)
      intercept[Exception] {
        new Client("127.0.0.1", srv.port, "svc", "WRONG")
      }
      assert(srv.rejectedAuth > 0)
      intercept[Exception] { // skipping SASL against a secured broker
        new Client("127.0.0.1", srv.port)
      }
    } finally srv.stop()
  }

  test("spark write/read fan through the broker") {
    val srv = new Server()
    try {
      Amqp1.write((1 to 40).map(i => s"""{"i":$i}""").toDF("value"),
        "127.0.0.1", srv.port, "docs")
      val out = Amqp1.read(spark, "127.0.0.1", srv.port, "docs")
      assert(out.count() == 40)
    } finally srv.stop()
  }
}
