package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** nats_kv bucket contract: revisions, CAS, tombstones, history, the
  * four config-runner forms.
  */
class NatsKvSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    "kv_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("bucket: global revisions, create/update CAS, tombstone history") {
    val b = NatsKv.Bucket.named("mem://" + fresh(), "cfg")
    b.nowMs = () => 42L
    assert(b.put("a", "1").revision == 1L)
    assert(b.put("b", "2").revision == 2L)
    assert(b.put("a", "3").revision == 3L, "global, not per-key")
    intercept[IllegalArgumentException](b.create("a", "x"))
    intercept[IllegalArgumentException](b.update("a", "x", 1L)) // stale rev
    assert(b.update("a", "4", 3L).revision == 4L)
    assert(b.get("a").value == "4")
    assert(b.getRevision("a", 1L).value == "1")
    b.delete("a")
    intercept[IllegalArgumentException](b.get("a"))
    assert(b.history("a").map(_.operation) ==
      Vector("PUT", "PUT", "PUT", "DEL"))
    assert(b.keys() == Vector("b"))
    b.purge("b")
    assert(b.history("b").map(_.operation) == Vector("PURGE"),
      "purge drops prior history")
    // delete keeps history; create after delete succeeds
    assert(b.create("a", "5").operation == "PUT")
  }

  test("config runner: nats_kv output → input with nats_kv_* metadata") {
    val addr = "mem://" + fresh()
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 4, mapping: 'root.v = this.seq' }
         |output:
         |  nats_kv:
         |    urls: [ "$addr" ]
         |    bucket: state
         |    key: 'item.$${! this.v % 2 }'
         |""".stripMargin)
    graft.config.Pipeline.run(spark,
      s"""input:
         |  nats_kv: { urls: [ "$addr" ], bucket: state }
         |pipeline:
         |  processors:
         |    - mapping: 'root.v = this.v
         |root.key = meta("nats_kv_key")
         |root.op = meta("nats_kv_operation")'
         |output: { memory: { name: kv_rt } }
         |""".stripMargin)
    val got = spark.table("kv_rt").select(
        get_json_object($"value", "$.v").cast("long"),
        get_json_object($"value", "$.key"),
        get_json_object($"value", "$.op"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._2)
    // per-key last-write-wins: item.0 ← v=2, item.1 ← v=3
    assert(got == Seq((2L, "item.0", "PUT"), (3L, "item.1", "PUT")))
  }

  test("processor: put then get round-trips; create conflict errors the row") {
    val addr = "mem://" + fresh()
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 3, mapping: 'root.id = this.seq' }
         |pipeline:
         |  processors:
         |    - nats_kv:
         |        urls: [ "$addr" ]
         |        bucket: docs
         |        operation: put
         |        key: 'doc.$${! this.id }'
         |output: { memory: { name: kv_put } }
         |""".stripMargin)
    val revs = spark.table("kv_put")
      .select($"metadata"("nats_kv_revision").cast("long"))
      .as[Long].collect().toSeq.sorted
    assert(revs == Seq(1L, 2L, 3L))
    // get back by key
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 3, mapping: 'root.id = this.seq' }
         |pipeline:
         |  processors:
         |    - nats_kv:
         |        urls: [ "$addr" ]
         |        bucket: docs
         |        operation: get
         |        key: 'doc.$${! this.id }'
         |output: { memory: { name: kv_get } }
         |""".stripMargin)
    val vals = spark.table("kv_get")
      .select(get_json_object($"value", "$.id").cast("long"),
        $"metadata"("nats_kv_operation"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(vals == Seq((0L, "PUT"), (1L, "PUT"), (2L, "PUT")))
    // create on existing keys errors every row, keeps the task alive
    val out = graft.config.Pipeline.build(spark,
      s"""input:
         |  generate: { count: 3, mapping: 'root.id = this.seq' }
         |pipeline:
         |  processors:
         |    - nats_kv:
         |        urls: [ "$addr" ]
         |        bucket: docs
         |        operation: create
         |        key: 'doc.$${! this.id }'
         |""".stripMargin)
    val errs = out.select($"error").as[String].collect().toSeq
    assert(errs.forall(e => e != null && e.contains("already exists")))
  }

  test("processor: keys and history operations produce the documented arrays") {
    val addr = "mem://" + fresh()
    val b = NatsKv.Bucket.named(addr, "audit")
    b.put("cfg.a", "1"); b.put("cfg.b", "2"); b.put("other", "3")
    b.put("cfg.a", "4")
    val keysOut = graft.config.Pipeline.build(spark,
      s"""input:
         |  generate: { count: 1, mapping: 'root = {}' }
         |pipeline:
         |  processors:
         |    - nats_kv:
         |        urls: [ "$addr" ]
         |        bucket: audit
         |        operation: keys
         |        key: 'cfg.*'
         |""".stripMargin)
    assert(keysOut.select($"value").as[String].head() ==
      """["cfg.a","cfg.b"]""")
    val histOut = graft.config.Pipeline.build(spark,
      s"""input:
         |  generate: { count: 1, mapping: 'root = {}' }
         |pipeline:
         |  processors:
         |    - nats_kv:
         |        urls: [ "$addr" ]
         |        bucket: audit
         |        operation: history
         |        key: 'cfg.a'
         |""".stripMargin)
    val hist = histOut.select($"value").as[String].head()
    assert(hist.contains("\"revision\":1") && hist.contains("\"revision\":4"),
      s"history carries both revisions: $hist")
  }

  test("cache_resources nats_kv backend feeds the cache processor") {
    val addr = "mem://" + fresh()
    val b = NatsKv.Bucket.named(addr, "lookup")
    b.put("k0", "zero"); b.put("k1", "one"); b.delete("k0")
    val out = graft.config.Pipeline.build(spark,
      s"""input:
         |  generate: { count: 2, mapping: 'root.k = "k" + this.seq.string()' }
         |cache_resources:
         |  - label: kvc
         |    nats_kv: { urls: [ "$addr" ], bucket: lookup }
         |pipeline:
         |  processors:
         |    - cache: { resource: kvc, operator: get, key: '$${! this.k }' }
         |""".stripMargin)
    val rows = out.select($"value", $"error").as[(String, String)]
      .collect().toSeq.sortBy(_._1)
    assert(rows.exists(r => r._1 == "one" && r._2 == null))
    assert(rows.exists(r => r._2 != null && r._2.contains("cache miss")),
      "tombstoned key misses")
  }
}
