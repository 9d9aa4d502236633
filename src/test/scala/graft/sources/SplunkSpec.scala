package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for `splunk` / `splunk_hec` against
  * [[Splunk.InMemoryServer]] (export NDJSON stream; HEC event wrapping,
  * field overrides, gzip, and body-level success codes).
  */
class SplunkSpec extends SparkSpec {
  import Splunk.InMemoryServer.Transport

  test("export emits one message per NDJSON line in stream order") {
    val t = Transport((0 until 5).map(i => s"""{"n":$i}"""))
    val df = Splunk.searchRead(spark, "mem://x/services/search/v2/jobs/export",
      "admin", "pw", "index=main | head 5", client = t)
    val got = df.orderBy("__seq")
      .select(get_json_object(col("value"), "$.result.n")).collect()
      .map(_.getString(0).toInt).toSeq
    assert(got == (0 until 5))
    assert(df.select(get_json_object(col("value"), "$.preview")).head()
      .getString(0) == "false")
  }

  test("hec wraps events, overrides fields, and checks the body code") {
    import spark.implicits._
    val name = "hec_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport(Nil)
    Splunk.registerClient(name, t)
    val df = Seq(
      """{"msg":"structured"}""",          // object without event → wrap
      """{"event":{"msg":"pre-wrapped"}}""", // object with event → as-is
      "plain text line",                    // non-JSON → string event
      """[1,2]"""                           // non-object JSON → wrap
    ).toDF("value")
    Splunk.hecWrite(df.coalesce(1), s"mem://$name/services/collector/event",
      "tok", eventHost = "h1", eventSourceType = "stype")
    val got = t.collected.iterator().asScala.toSeq
    assert(got.length == 4)
    got.foreach { e =>
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(e)
      assert(n.has("event"), s"not wrapped: $e")
      assert(n.path("host").asText() == "h1")
      assert(n.path("sourcetype").asText() == "stype")
    }
    assert(got.exists(_.contains(""""event":"plain text line"""")))
    assert(got.exists(_.contains(""""event":[1,2]""")))
    assert(got.exists(_.contains(""""event":{"msg":"pre-wrapped"}""")))
  }

  test("gzip payloads arrive binary and decompress server-side") {
    import spark.implicits._
    val name = "hecgz_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport(Nil)
    Splunk.registerClient(name, t)
    val df = (0 until 10).map(i => s"""{"i":$i}""").toDF("value")
    Splunk.hecWrite(df, s"mem://$name/services/collector/event", "tok",
      gzip = true)
    assert(t.collected.size() == 10)
  }

  test("a rejecting collector fails the write") {
    import spark.implicits._
    val bad: graft.operators.Http.Client = reqs => reqs.map(_ =>
      graft.operators.Http.Response(200, """{"text":"Invalid token","code":4}"""))
    val name = "hecbad_" + java.util.UUID.randomUUID.toString.take(8)
    Splunk.registerClient(name, bad)
    val e = intercept[IllegalStateException] {
      Splunk.hecWrite(Seq("""{"a":1}""").toDF("value"),
        s"mem://$name/services/collector/event", "tok")
    }
    assert(e.getMessage.contains("rejected"))
  }

  test("config runner: splunk input → splunk_hec output") {
    val name = "spl_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport((0 until 3).map(i => s"""{"k":$i}"""))
    Splunk.registerClient(name, t)
    val df = graft.config.Pipeline.run(spark,
      s"""input:
         |  splunk:
         |    url: mem://$name/services/search/v2/jobs/export
         |    user: admin
         |    password: pw
         |    query: index=main
         |pipeline:
         |  processors: []
         |output:
         |  splunk_hec:
         |    url: mem://$name/services/collector/event
         |    token: tok
         |    event_source: graft
         |""".stripMargin)
    assert(df.count() == 3)
    val got = t.collected.iterator().asScala.toSeq
    assert(got.length == 3)
    assert(got.forall(_.contains(""""source":"graft"""")))
  }
}
