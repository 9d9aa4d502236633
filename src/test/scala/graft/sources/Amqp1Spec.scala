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

  test("type system round-trips randomized nested values (scalacheck)") {
    import org.scalacheck.Gen
    val leaf: Gen[AVal] = Gen.oneOf(
      Gen.const(ANull),
      Gen.oneOf(true, false).map(ABool),
      Gen.chooseNum(0L, 0xffffffffL).map(AUInt), // uint is 32-bit
      Gen.chooseNum(0L, Long.MaxValue).map(AULong),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(AInt),
      Gen.alphaNumStr.map(AStr),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(bs => ABin(bs.toArray)))
    def tree(depth: Int): Gen[AVal] =
      if (depth == 0) leaf
      else Gen.frequency(
        3 -> leaf,
        1 -> Gen.listOfN(3, tree(depth - 1)).map(AList(_)),
        1 -> Gen.listOfN(2, Gen.zip(Gen.alphaNumStr.map(AStr),
          tree(depth - 1))).map(AMapV(_)),
        1 -> Gen.zip(Gen.chooseNum(0L, 255L).map(AULong),
          tree(depth - 1)).map { case (d, v) => ADesc(d, v) })
    def canon(v: AVal): AVal = v match {
      case ABin(b) => AStr(b.map("%02x".format(_)).mkString)
      case AList(items) => AList(items.map(canon))
      case AMapV(es) => AMapV(es.map { case (k, x) => (canon(k), canon(x)) })
      case ADesc(d, x) => ADesc(canon(d), canon(x))
      case other => other
    }
    (1 to 200).foreach { i =>
      val v = tree(3).apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).get
      val got = new Decoder(encode(v)).read()
      assert(canon(got) == canon(v), s"seed $i: $v -> $got")
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
