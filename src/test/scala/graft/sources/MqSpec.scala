package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AMQP-0.9 (RabbitMQ-shaped) transport contract through the
  * injectable [[Mq.Transport]] seam: exchange routing (direct/fanout/
  * topic incl. `*`/`#` wildcards), per-queue FIFO, the amqp_* metadata
  * surface, and the config-runner input/output forms.
  */
class MqSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    "mq_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("topic pattern matching: * is one word, # is zero or more") {
    val cases = Seq(
      ("a.b.c", "a.b.c", true), ("a.*.c", "a.b.c", true),
      ("a.*.c", "a.b.d", false), ("a.*", "a.b.c", false),
      ("a.#", "a", true), ("a.#", "a.b.c.d", true),
      ("#", "anything.at.all", true), ("#.end", "x.y.end", true),
      ("#.end", "end", true), ("*.end", "end", false),
      ("a.*.#", "a.b", true), ("a.*.#", "a", false),
      ("kern.*", "kern.critical", true), ("*.critical", "kern.critical", true))
    cases.foreach { case (p, k, want) =>
      assert(Mq.topicMatches(p, k) == want, s"pattern '$p' vs key '$k'")
    }
  }

  test("direct exchange routes on exact key; fanout copies everywhere") {
    val name = fresh()
    val t = Mq.InMemory.named(name)
    t.declareExchange("dx", "direct"); t.declareExchange("fx", "fanout")
    Seq("q1", "q2", "qf1", "qf2").foreach(t.declareQueue)
    t.bind("dx", "red", "q1"); t.bind("dx", "blue", "q2")
    t.bind("fx", "", "qf1"); t.bind("fx", "ignored", "qf2")
    assert(t.publish("dx", "red", "r".getBytes, Map.empty, "text/plain") == Seq("q1"))
    assert(t.publish("dx", "green", "g".getBytes, Map.empty, "text/plain").isEmpty,
      "unroutable messages are dropped, not errored")
    assert(t.publish("fx", "whatever", "f".getBytes, Map.empty, "text/plain")
      .toSet == Set("qf1", "qf2"))
    assert(t.queueLength("q1") == 1 && t.queueLength("q2") == 0)
  }

  test("topic exchange fans out by wildcard binding; queue order is FIFO") {
    val name = fresh()
    val t = Mq.InMemory.named(name)
    t.declareExchange("logs", "topic")
    Seq("all", "kern", "crit").foreach(t.declareQueue)
    t.bind("logs", "#", "all")
    t.bind("logs", "kern.*", "kern")
    t.bind("logs", "*.critical", "crit")
    t.publish("logs", "kern.critical", "kc".getBytes, Map.empty, "t")
    t.publish("logs", "app.critical", "ac".getBytes, Map.empty, "t")
    t.publish("logs", "kern.info", "ki".getBytes, Map.empty, "t")
    assert(t.queueLength("all") == 3)
    assert(t.fetch("kern", 0, 9).map(m => new String(m.body)).toSeq ==
      Seq("kc", "ki"))
    assert(t.fetch("crit", 0, 9).map(m => new String(m.body)).toSeq ==
      Seq("kc", "ac"))
    // delivery tags are 1-based and FIFO within the queue
    assert(t.fetch("all", 0, 9).map(_.deliveryTag).toSeq == Seq(1L, 2L, 3L))
  }

  test("amqpRead surfaces the amqp_* metadata in queue order") {
    val name = fresh()
    val t = Mq.InMemory.named(name)
    t.declareExchange("x", "direct"); t.declareQueue("q")
    t.bind("x", "k", "q")
    (1 to 5).foreach(i =>
      t.publish("x", "k", s"""{"i":$i}""".getBytes, Map("h1" -> s"v$i"), "application/json"))
    val rows = Mq.amqpRead(spark, s"mem://$name", "q")
      .select($"value", $"metadata"("amqp_exchange"),
        $"metadata"("amqp_routing_key"), $"metadata"("amqp_delivery_tag"),
        $"metadata"("amqp_content_type"), $"metadata"("h1"), $"__seq")
      .collect()
    assert(rows.length == 5)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == s"""{"i":${i + 1}}""", "FIFO order")
      assert(r.getString(1) == "x" && r.getString(2) == "k")
      assert(r.getString(3) == (i + 1).toString, "1-based delivery tag")
      assert(r.getString(4) == "application/json")
      assert(r.getString(5) == s"v${i + 1}", "headers become metadata")
      assert(r.getLong(6) == i.toLong)
    }
  }

  test("passive exchange re-declaration verifies the type matches") {
    val t = Mq.InMemory.named(fresh())
    t.declareExchange("e", "topic")
    t.declareExchange("e", "topic") // same settings: fine
    val err = intercept[IllegalArgumentException] {
      t.declareExchange("e", "fanout")
    }
    assert(err.getMessage.contains("already declared"))
  }

  test("config runner: generate → amqp output → amqp input round-trip") {
    val name = fresh()
    val t = Mq.InMemory.named(name)
    t.declareExchange("evt", "topic")
    Seq("evens", "odds").foreach(t.declareQueue)
    t.bind("evt", "n.0", "evens")
    t.bind("evt", "n.1", "odds")
    val outConfig =
      s"""input:
         |  generate: { count: 10, mapping: 'root.id = this.seq' }
         |pipeline:
         |  processors:
         |    - mapping: 'root = this'
         |output:
         |  amqp_0_9:
         |    urls: [ "mem://$name" ]
         |    exchange: evt
         |    key: 'n.$${! this.id % 2 }'
         |""".stripMargin
    graft.config.Pipeline.run(spark, outConfig)
    val inConfig =
      s"""input:
         |  amqp_0_9:
         |    urls: [ "mem://$name" ]
         |    queue: evens
         |pipeline:
         |  processors:
         |    - mapping: 'root.id = this.id\nroot.rk = meta("amqp_routing_key")'
         |output:
         |  memory: { name: mq_rt }
         |""".stripMargin
    graft.config.Pipeline.run(spark, inConfig)
    val got = spark.table("mq_rt")
      .select(get_json_object($"value", "$.id").cast("long").as("id"),
        get_json_object($"value", "$.rk").as("rk"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(0L, 2L, 4L, 6L, 8L))
    assert(got.forall(_._2 == "n.0"))
    assert(t.queueLength("odds") == 5)
  }
}
