package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for `sentry_capture` against
  * [[Sentry.InMemoryServer]]: DSN resolution, event shape,
  * pass-through semantics, deterministic sampling, and warn-don't-fail
  * on rejection.
  */
class SentrySpec extends SparkSpec {
  import Sentry.InMemoryServer.Transport

  test("DSN resolves to the store endpoint with the auth header") {
    val (url, auth) = Sentry.storeEndpoint("https://abc123@o99.ingest.sentry.io/424242")
    assert(url == "https://o99.ingest.sentry.io/api/424242/store/")
    assert(auth.contains("sentry_key=abc123") && auth.contains("sentry_version=7"))
    intercept[IllegalArgumentException] {
      Sentry.storeEndpoint("https://host/123") // no key
    }
  }

  test("captures one event per message and passes messages through") {
    import spark.implicits._
    val name = "sn_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport()
    Sentry.registerClient(name, t)
    val df = Seq("""{"a":1}""", """{"a":2}""").toDF("value")
    val out = Sentry.capture(df, s"mem://k1@$name/55",
      messageCol = concat(lit("got "), col("value")),
      tags = Map("team" -> "data"), environment = "prod", level = "WARN")
    assert(out.columns.toSeq == Seq("value"), "pass-through columns only")
    assert(out.orderBy("value").collect().map(_.getString(0)).toSeq ==
      Seq("""{"a":1}""", """{"a":2}"""))
    val evts = t.events.iterator().asScala.toSeq
    assert(evts.length == 2)
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(evts.head)
    assert(n.path("message").asText().startsWith("got "))
    assert(n.path("level").asText() == "warning")
    assert(n.path("environment").asText() == "prod")
    assert(n.path("tags").path("team").asText() == "data",
      "tags must be a real nested object, not an escaped string")
  }

  test("sampling_rate 0 skips capture; rejection warns but passes through") {
    import spark.implicits._
    val name = "sn0_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport()
    Sentry.registerClient(name, t)
    val df = Seq("x").toDF("value")
    assert(Sentry.capture(df, s"mem://k1@$name/1", messageCol = lit("m"),
      samplingRate = 0.0).count() == 1)
    assert(t.events.isEmpty)

    val rejName = "snr_" + java.util.UUID.randomUUID.toString.take(8)
    Sentry.registerClient(rejName, Transport(rejectAll = true))
    // rejected capture must NOT fail the pipeline
    assert(Sentry.capture(df, s"mem://k1@$rejName/1", messageCol = lit("m"))
      .count() == 1)
  }

  test("config runner: sentry_capture with bloblang context") {
    val name = "snc_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport()
    Sentry.registerClient(name, t)
    val df = graft.config.Pipeline.run(spark,
      s"""input:
         |  generate:
         |    count: 3
         |    mapping: 'root.k = this.seq'
         |pipeline:
         |  processors:
         |    - sentry_capture:
         |        dsn: mem://k1@$name/7
         |        message: "event $${!this.k}"
         |        context: 'root = {"job": {"k": this.k}}'
         |        level: INFO
         |""".stripMargin)
    assert(df.count() == 3)
    val evts = t.events.iterator().asScala.toSeq
    assert(evts.length == 3)
    assert(evts.forall(_.contains(""""level":"info"""")))
    assert(evts.exists(e => e.contains("event 1") &&
      e.contains(""""job":""") && e.contains(""""k":1""")))
  }
}
