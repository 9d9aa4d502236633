package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Redis family contract through the store seam: data-structure
  * commands, glob patterns, the four inputs/outputs, the cache
  * backend, and the generic command processor.
  */
class RedisSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    "rd_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("glob patterns: * ? [class] [^neg] [a-c] and escapes") {
    val cases = Seq(
      ("h?llo", "hello", true), ("h?llo", "hallo", true),
      ("h?llo", "hllo", false), ("h*llo", "hllo", true),
      ("h*llo", "heeeello", true), ("h[ae]llo", "hello", true),
      ("h[ae]llo", "hillo", false), ("h[^e]llo", "hallo", true),
      ("h[^e]llo", "hello", false), ("h[a-c]llo", "hbllo", true),
      ("h[a-c]llo", "hdllo", false), ("key:*", "key:1", true),
      ("\\*", "*", true), ("\\*", "x", false))
    cases.foreach { case (p, s, want) =>
      assert(Redis.globMatch(p, s) == want, s"'$p' vs '$s'")
    }
  }

  test("store: strings, TTL via injected clock, counters, key sweep") {
    val t = Redis.InMemory.named(fresh())
    var now = 1000L
    t.nowMs = () => now
    assert(t.command("SET", Seq("a", "1")) == "OK")
    assert(t.command("GET", Seq("a")) == "1")
    assert(t.command("GET", Seq("missing")) == null)
    t.command("SET", Seq("b", "x", "EX", "10"))
    assert(t.command("TTL", Seq("b")) == 10L)
    now += 10001
    assert(t.command("GET", Seq("b")) == null, "expired")
    assert(t.command("EXISTS", Seq("a", "b")) == 1L)
    assert(t.command("INCRBY", Seq("n", "5")) == 5L)
    assert(t.command("INCR", Seq("n")) == 6L)
    assert(t.command("KEYS", Seq("*")) == Vector("a", "n"))
    assert(t.command("DEL", Seq("a", "zz")) == 1L)
  }

  test("store: lists, sets, hashes, WRONGTYPE") {
    val t = Redis.InMemory.named(fresh())
    t.command("RPUSH", Seq("l", "1", "2"))
    t.command("LPUSH", Seq("l", "0"))
    assert(t.command("LRANGE", Seq("l", "0", "-1")) == Vector("0", "1", "2"))
    assert(t.command("LPOP", Seq("l")) == "0")
    assert(t.command("LLEN", Seq("l")) == 2L)
    assert(t.command("SADD", Seq("s", "a", "b", "a")) == 2L)
    assert(t.command("SCARD", Seq("s")) == 2L)
    assert(t.command("SISMEMBER", Seq("s", "a")) == 1L)
    t.command("HSET", Seq("h", "f1", "v1", "f2", "v2"))
    assert(t.command("HGET", Seq("h", "f1")) == "v1")
    assert(t.command("HGETALL", Seq("h")) == Map("f1" -> "v1", "f2" -> "v2"))
    assert(t.command("TYPE", Seq("l")) == "list")
    val e = intercept[IllegalArgumentException](t.command("GET", Seq("l")))
    assert(e.getMessage.contains("WRONGTYPE"))
  }

  test("store: stream ids generate monotonically and XRANGE bounds work") {
    val t = Redis.InMemory.named(fresh())
    assert(t.command("XADD", Seq("st", "*", "body", "a")) == "1-0")
    assert(t.command("XADD", Seq("st", "*", "body", "b")) == "2-0")
    assert(t.command("XADD", Seq("st", "5-1", "body", "c")) == "5-1")
    intercept[IllegalArgumentException](
      t.command("XADD", Seq("st", "5-1", "body", "d")))
    assert(t.command("XLEN", Seq("st")) == 3L)
    val mid = t.command("XRANGE", Seq("st", "2", "5"))
      .asInstanceOf[Vector[Redis.StreamEntry]]
    assert(mid.map(_.id) == Vector("2-0", "5-1"))
  }

  test("config runner: redis_list output → consuming redis_list input") {
    val addr = s"mem://${fresh()}"
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 5, mapping: 'root.id = this.seq' }
         |output:
         |  redis_list: { url: "$addr", key: jobs }
         |""".stripMargin)
    val got = graft.config.Pipeline.run(spark,
      s"""input:
         |  redis_list: { url: "$addr", key: jobs }
         |output: { memory: { name: rd_list_rt } }
         |""".stripMargin)
    val ids = spark.table("rd_list_rt")
      .select(get_json_object($"value", "$.id").cast("long"))
      .as[Long].collect().toSeq
    assert(ids == Seq(0L, 1L, 2L, 3L, 4L), "FIFO order preserved")
    assert(Redis.transportFor(addr).command("LLEN", Seq("jobs")) == 0L,
      "list input consumes")
  }

  test("config runner: redis_streams round-trip with metadata fields") {
    val addr = s"mem://${fresh()}"
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 4, mapping: 'root.id = this.seq\nmeta tier = "t" + (this.seq % 2).string()' }
         |output:
         |  redis_streams: { url: "$addr", stream: evts }
         |""".stripMargin)
    val rows = graft.config.Pipeline.run(spark,
      s"""input:
         |  redis_streams: { url: "$addr", streams: [ evts ] }
         |pipeline:
         |  processors:
         |    - mapping: 'root.id = this.id\nroot.sid = meta("redis_stream")\nroot.tier = meta("tier")'
         |output: { memory: { name: rd_st_rt } }
         |""".stripMargin)
    val got = spark.table("rd_st_rt")
      .select(get_json_object($"value", "$.id").cast("long"),
        get_json_object($"value", "$.sid"),
        get_json_object($"value", "$.tier"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0L, "1-0", "t0"), (1L, "2-0", "t1"),
      (2L, "3-0", "t0"), (3L, "4-0", "t1")))
  }

  test("config runner: redis_pubsub with PSUBSCRIBE patterns") {
    val addr = s"mem://${fresh()}"
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 6, mapping: 'root.id = this.seq' }
         |output:
         |  redis_pubsub: { url: "$addr", channel: 'ch.$${! this.id % 3 }' }
         |""".stripMargin)
    graft.config.Pipeline.run(spark,
      s"""input:
         |  redis_pubsub:
         |    url: "$addr"
         |    channels: [ "ch.[01]" ]
         |    use_patterns: true
         |pipeline:
         |  processors:
         |    - mapping: 'root.id = this.id\nroot.ch = meta("redis_pubsub_channel")\nroot.pat = meta("redis_pubsub_pattern")'
         |output: { memory: { name: rd_ps_rt } }
         |""".stripMargin)
    val got = spark.table("rd_ps_rt")
      .select(get_json_object($"value", "$.id").cast("long"),
        get_json_object($"value", "$.ch"),
        get_json_object($"value", "$.pat"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(0L, 1L, 3L, 4L), "ch.2 filtered out")
    assert(got.forall(_._3 == "ch.[01]"))
  }

  test("config runner: redis_hash walks the json object, explicit fields win") {
    val addr = s"mem://${fresh()}"
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 2, mapping: 'root.id = this.seq\nroot.city = "c" + this.seq.string()' }
         |output:
         |  redis_hash:
         |    url: "$addr"
         |    key: 'user:$${! this.id }'
         |    walk_json_object: true
         |    fields: { src: pipeline }
         |""".stripMargin)
    val t = Redis.transportFor(addr)
    assert(t.command("HGETALL", Seq("user:0")) ==
      Map("id" -> "0", "city" -> "c0", "src" -> "pipeline"))
    assert(t.command("HGET", Seq("user:1", "city")) == "c1")
  }

  test("cache_resources redis backend serves the cache processor") {
    val name = fresh()
    val t = Redis.InMemory.named(name)
    t.command("SET", Seq("gc:k1", "alpha"))
    t.command("SET", Seq("gc:k2", "beta"))
    t.command("SET", Seq("other", "hidden"))
    val out = graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 2, mapping: 'root.k = "k" + (this.seq + 1).string()' }
         |cache_resources:
         |  - label: rcache
         |    redis: { url: "mem://$name", prefix: "gc:" }
         |pipeline:
         |  processors:
         |    - cache: { resource: rcache, operator: get, key: '$${! this.k }' }
         |output: { memory: { name: rd_cache_rt } }
         |""".stripMargin)
    val vals = spark.table("rd_cache_rt").select($"value")
      .as[String].collect().toSeq.sorted
    assert(vals == Seq("alpha", "beta"))
  }

  test("redis processor: commands run per message, result replaces content") {
    val addr = s"mem://${fresh()}"
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 6, mapping: 'root.member = "m" + (this.seq % 3).string()' }
         |pipeline:
         |  processors:
         |    - redis:
         |        url: "$addr"
         |        command: sadd
         |        args_mapping: 'root = [ "members", this.member ]'
         |output: { memory: { name: rd_proc_rt } }
         |""".stripMargin)
    assert(Redis.transportFor(addr).command("SCARD", Seq("members")) == 3L)
    val out = graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 1, mapping: 'root = {}' }
         |pipeline:
         |  processors:
         |    - redis:
         |        url: "$addr"
         |        command: scard
         |        args_mapping: 'root = [ "members" ]'
         |output: { memory: { name: rd_proc_rt2 } }
         |""".stripMargin)
    assert(spark.table("rd_proc_rt2").select($"value").as[String].head() == "3")
  }

  test("redis processor: a failing command errors the row, not the task") {
    val addr = s"mem://${fresh()}"
    Redis.transportFor(addr).command("RPUSH", Seq("wrong", "x"))
    val out = graft.config.Pipeline.build(spark,
      s"""input:
         |  generate: { count: 1, mapping: 'root.k = "wrong"' }
         |pipeline:
         |  processors:
         |    - redis:
         |        url: "$addr"
         |        command: get
         |        args_mapping: 'root = [ this.k ]'
         |""".stripMargin)
    val rows = out.select($"error").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) != null &&
      rows.head.getString(0).contains("WRONGTYPE"))
  }
}
