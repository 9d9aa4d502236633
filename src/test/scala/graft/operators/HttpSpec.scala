package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `http` processor (processors/http.adoc:26): batched pluggable
  * transport, per-row response alignment, non-2xx error channel,
  * http_status_code metadata, and the config-runner form.
  */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  test("responses align per row across batches") {
    val df = (0 until 57).map(i => (i.toLong, s"""{"i":$i}"""))
      .toDF("id", "value")
    val out = Http.enrich(df, lit("stub://svc/ok"), "POST", Map.empty,
        batchSize = 10, client = Http.echoClient)
      .select($"id", $"value", $"error").as[(Long, String, String)]
      .collect().sortBy(_._1)
    out.foreach { case (i, v, err) =>
      assert(v == s"""{"echo":{"i":$i},"len":${s"""{"i":$i}""".length}}""",
        s"row $i misaligned: $v")
      assert(err == null)
    }
  }

  test("non-2xx keeps the original value and errors the row") {
    val df = Seq((1L, """{"a":1}"""), (2L, """{"a":2}""")).toDF("id", "value")
    val url = when($"id" === 2, lit("stub://svc/missing"))
      .otherwise(lit("stub://svc/ok"))
    val out = Http.enrich(df, url, "POST", Map.empty, 4, Http.echoClient)
      .select($"id", $"value", $"error").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(out(0)._2.startsWith("""{"echo":{"a":1}"""))
    assert(out(0)._3 == null)
    assert(out(1)._2 == """{"a":2}""", "failed row must keep its value")
    assert(out(1)._3 == "http status 404")
  }

  test("successful_on widens the success set") {
    val df = Seq((1L, """{"a":1}""")).toDF("id", "value")
    val out = Http.enrich(df, lit("stub://svc/missing"), "POST", Map.empty,
        4, Http.echoClient, successfulOn = Set(404))
      .select($"error").as[String].collect()
    assert(out.head == null, "404 in successful_on must not error")
  }

  test("http_status_code lands in metadata on failure") {
    val df = Seq((1L, """{"a":1}"""))
      .toDF("id", "value")
      .withColumn("metadata",
        map(lit("k"), lit("v")).cast("map<string,string>"))
    val out = Http.enrich(df, lit("stub://svc/missing"), "POST", Map.empty,
        4, Http.echoClient)
      .select(element_at($"metadata", "http_status_code")).as[String]
      .collect()
    assert(out.head == "404")
  }

  test("null url rows pass through unchanged (status -2, no transport call)") {
    val df = Seq((1L, """{"a":1}""")).toDF("id", "value")
    val boom: Http.Client =
      _ => throw new IllegalStateException("transport must not be called")
    val out = Http.enrich(df, lit(null).cast("string"), "POST", Map.empty,
        4, boom)
      .select($"value", $"error").as[(String, String)].collect()
    assert(out.head._1 == """{"a":1}""")
    assert(out.head._2 == "http status -2")
  }

  test("retry rounds re-fan-out the failed subset: N simultaneous 429s cost one backoff, not N") {
    // 8 requests all 429 on the first attempt, 200 on the second —
    // the serialized form slept 8 × period; rounds sleep period ONCE
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    def send(q: Http.Request)
        : java.util.concurrent.CompletableFuture[Http.Response] = {
      val n = attempts.merge(q.url, 1, (a, b) => a + b)
      java.util.concurrent.CompletableFuture.completedFuture(
        if (n == 1) Http.Response(429, "slow down")
        else Http.Response(200, s"ok:${q.url}"))
    }
    val reqs = (1 to 8).map(i =>
      Http.Request(s"stub://svc/$i", "GET", Map.empty, ""))
    val period = 300L
    val t0 = System.nanoTime()
    val out = Http.retryBatch(reqs, send,
      retries = 3, retryPeriodMs = period, maxRetryBackoffMs = 10000,
      backoffOn = Set(429), dropOn = Set.empty)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out.map(_.status) == (1 to 8).map(_ => 200))
    assert(out.zipWithIndex.forall { case (r, i) =>
      r.body == s"ok:stub://svc/${i + 1}" }, "responses must stay aligned")
    assert(attempts.asScala.values.forall(_ == 2), "exactly 2 attempts per row")
    // serialized per-row sleeps would be >= 8 × 300 = 2400 ms
    assert(elapsedMs < 4 * period,
      f"batch of 8 simultaneous 429s took $elapsedMs%.0f ms; " +
        "expected ~1 backoff period, not 8")
  }

  test("dropOn statuses fail immediately without a retry attempt") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = Http.retryBatch(
      Seq(Http.Request("stub://svc/x", "GET", Map.empty, "")),
      _ => { calls.incrementAndGet()
        java.util.concurrent.CompletableFuture.completedFuture(
          Http.Response(429, "nope")) },
      retries = 3, retryPeriodMs = 10, maxRetryBackoffMs = 100,
      backoffOn = Set(429), dropOn = Set(429))
    assert(out.head.status == 429 && calls.get() == 1)
  }

  test("config-runner http processor compiles onto the stub transport") {
    val yaml =
      """input:
        |  generate:
        |    count: 20
        |    mapping: 'root.id = this.seq'
        |pipeline:
        |  processors:
        |    - http:
        |        url: stub://svc/ok
        |        verb: POST
        |""".stripMargin
    val out = graft.config.Pipeline.build(spark, yaml)
      .select($"value").as[String].collect()
    assert(out.length == 20)
    assert(out.forall(_.startsWith("""{"echo":{"id":""")),
      s"unexpected: ${out.take(2).mkString(",")}")
  }
}
