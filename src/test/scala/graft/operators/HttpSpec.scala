package graft.operators

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
