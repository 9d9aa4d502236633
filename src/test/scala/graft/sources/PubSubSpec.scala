package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NATS / MQTT subject-space contract through the PubSub seam: both
  * wildcard grammars, replayable sequenced reads, metadata, and the
  * config-runner forms.
  */
class PubSubSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    "ps_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("NATS wildcards: * is one token, > is one-or-more trailing") {
    val cases = Seq(
      ("a.b.c", "a.b.c", true), ("a.*.c", "a.b.c", true),
      ("a.*", "a.b.c", false), ("a.>", "a.b.c", true),
      ("a.>", "a", false), // '>' needs at least one token
      ("a.>", "a.b", true), (">", "x.y", true),
      ("*.b", "a.b", true), ("*", "a.b", false),
      ("time.us.*", "time.us.east", true),
      ("time.us.>", "time.us.east.atlanta", true))
    cases.foreach { case (p, s, want) =>
      assert(PubSub.matches("nats", p, s) == want, s"nats '$p' vs '$s'")
    }
  }

  test("MQTT wildcards: + is one level, # is zero-or-more trailing") {
    val cases = Seq(
      ("a/b", "a/b", true), ("a/+", "a/b", true), ("a/+", "a/b/c", false),
      ("a/#", "a", true), // '#' matches the parent itself
      ("a/#", "a/b/c", true), ("#", "x/y", true),
      ("+/tennis/#", "sport/tennis", true),
      ("+/tennis/#", "sport/tennis/player1/score", true),
      ("+/tennis/#", "sport/golf/player1", false))
    cases.foreach { case (p, s, want) =>
      assert(PubSub.matches("mqtt", p, s) == want, s"mqtt '$p' vs '$s'")
    }
  }

  test("replayable log: sequenced, ordered, pattern-filtered reads") {
    val name = fresh()
    val t = PubSub.InMemory.named(name)
    t.publish("orders.us.new", "1".getBytes)
    t.publish("orders.eu.new", "2".getBytes)
    t.publish("alerts.us", "3".getBytes)
    t.publish("orders.us.cancel", "4".getBytes)
    val us = t.read("nats", "orders.us.*")
    assert(us.map(p => new String(p.body)) == Seq("1", "4"))
    assert(us.map(_.seq) == Seq(1L, 4L), "global gapless sequence")
    assert(t.read("nats", "orders.>").size == 3)
    assert(t.read("nats", ">").size == 4)
  }

  test("read surfaces nats_subject/nats_sequence metadata in order") {
    val name = fresh()
    val t = PubSub.InMemory.named(name)
    (1 to 10).foreach(i => t.publish(s"m.${i % 2}", s"""{"i":$i}""".getBytes))
    val rows = PubSub.read(spark, "nats", s"mem://$name", "m.1")
      .orderBy($"__seq")
      .select($"value", $"metadata"("nats_subject"),
        $"metadata"("nats_sequence").cast("long")).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSeq ==
      Seq(1, 3, 5, 7, 9).map(i => s"""{"i":$i}"""))
    assert(rows.forall(_.getString(1) == "m.1"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("config runner: nats output with interpolated subject → filtered nats input") {
    val name = fresh()
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 12, mapping: 'root.id = this.seq' }
         |output:
         |  nats:
         |    urls: [ "mem://$name" ]
         |    subject: 'evt.$${! this.id % 3 }'
         |""".stripMargin)
    graft.config.Pipeline.run(spark,
      s"""input:
         |  nats_jetstream:
         |    urls: [ "mem://$name" ]
         |    subject: 'evt.2'
         |pipeline:
         |  processors:
         |    - mapping: 'root.id = this.id\nroot.subj = meta("nats_subject")'
         |output:
         |  memory: { name: ps_rt }
         |""".stripMargin)
    val got = spark.table("ps_rt")
      .select(get_json_object($"value", "$.id").cast("long"),
        get_json_object($"value", "$.subj"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(2L, 5L, 8L, 11L))
    assert(got.forall(_._2 == "evt.2"))
  }

  test("config runner: mqtt round-trip with a + filter") {
    val name = fresh()
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 6, mapping: 'root.id = this.seq' }
         |output:
         |  mqtt:
         |    urls: [ "mem://$name" ]
         |    topic: 'sensors/s$${! this.id % 2 }/reading'
         |""".stripMargin)
    graft.config.Pipeline.run(spark,
      s"""input:
         |  mqtt:
         |    urls: [ "mem://$name" ]
         |    topics: [ "sensors/+/reading" ]
         |output:
         |  memory: { name: ps_mqtt }
         |""".stripMargin)
    assert(spark.table("ps_mqtt").count() == 6, "+ matches both sensors")
  }
}
