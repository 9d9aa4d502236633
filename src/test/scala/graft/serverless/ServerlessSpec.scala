package graft.serverless

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The serverless entry point (cmd/serverless/connect-lambda +
  * internal/serverless/handler.go): per-invocation pipeline runs with
  * the event as the input message, the defaulted
  * errored→reject / else→sync_response output, handler.go's result
  * shaping, and the AWS custom-runtime API loop end-to-end against an
  * in-process runtime endpoint.
  */
class ServerlessSpec extends SparkSpec {

  test("handler: event in, defaulted sync_response out (1x1 shape)") {
    val h = new Lambda.Handler(spark,
      """pipeline:
        |  processors:
        |    - mapping: |
        |        root.doubled = this.n * 2
        |        root.who = this.name.uppercase()
        |""".stripMargin)
    val out = h.handle("""{"n":21,"name":"ada"}""")
    assert(out == Right("""{"doubled":42,"who":"ADA"}"""))
    // a second invocation reuses the same handler (NewHandler builds
    // the stream once; Handle feeds it per event)
    assert(h.handle("""{"n":1,"name":"x"}""") ==
      Right("""{"doubled":2,"who":"X"}"""))
  }

  test("handler: an errored message rejects with the default reason") {
    // the cache processor feeds the error channel on a miss — the
    // defaulted output's errored() case must turn that into an
    // invocation ERROR with the handler.go reject template
    val h = new Lambda.Handler(spark,
      """cache_resources:
        |  - label: lut
        |    memory:
        |      init:
        |        good: '{"hit":true}'
        |pipeline:
        |  processors:
        |    - cache:
        |        resource: lut
        |        key: '${! json("k") }'
        |""".stripMargin)
    val err = h.handle("""{"k":"missing"}""")
    assert(err.isLeft)
    assert(err.swap.toOption.get.contains("processing failed due to:"),
      s"reject reason template must apply: $err")
    assert(err.swap.toOption.get.contains("cache miss"))
    // healthy events still answer on the same handler
    assert(h.handle("""{"k":"good"}""") == Right("""{"hit":true}"""))
  }

  test("handler: a split pipeline answers with the batch-array shape") {
    val h = new Lambda.Handler(spark,
      """pipeline:
        |  processors:
        |    - unarchive:
        |        format: json_array
        |""".stripMargin)
    val out = h.handle("""[{"a":1},{"a":2},{"a":3}]""")
    assert(out == Right("""[{"a":1},{"a":2},{"a":3}]"""))
  }

  test("handler: an explicit output overrides the sync default") {
    val dir = java.nio.file.Files.createTempDirectory("lambda_out")
    val h = new Lambda.Handler(spark,
      s"""pipeline:
         |  processors:
         |    - mapping: 'root.seen = this.id'
         |output:
         |  json:
         |    path: $dir/out
         |""".stripMargin)
    val out = h.handle("""{"id":7}""")
    // no sync_response ran → empty result set → empty batch-of-batches
    assert(out == Right("[]"))
    // the json output writes envelope rows; the payload rides `value`
    val got = spark.read.json(s"$dir/out")
      .select(col("value")).collect()
    assert(got.length == 1 && got.head.getString(0) == """{"seen":7}""")
  }

  test("runtime-API loop: next/response/error round-trips, bounded exit") {
    // an in-process AWS custom-runtime endpoint: a queue of events,
    // capturing what the function posts back
    val events = new ConcurrentLinkedQueue[(String, String)]()
    events.add(("req-1", """{"k":"alpha","n":5}"""))
    events.add(("req-2", """{"k":"missing","n":0}"""))
    events.add(("req-3", """{"k":"beta","n":6}"""))
    val responses = new ConcurrentLinkedQueue[(String, String)]()
    val errors = new ConcurrentLinkedQueue[(String, String)]()
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/2018-06-01/runtime/invocation",
      (ex: HttpExchange) => {
        val path = ex.getRequestURI.getPath
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        def reply(status: Int, b: String,
                  hs: Map[String, String] = Map.empty): Unit = {
          hs.foreach { case (k, v) =>
            ex.getResponseHeaders.add(k, v)
          }
          val bytes = b.getBytes("UTF-8")
          ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
          if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
          ex.close()
        }
        if (path.endsWith("/next")) Option(events.poll()) match {
          case Some((id, ev)) =>
            reply(200, ev, Map("Lambda-Runtime-Aws-Request-Id" -> id))
          case None => reply(204, "") // drained: the loop exits
        }
        else if (path.endsWith("/response")) {
          val id = path.split("/").dropRight(1).last
          responses.add((id, body)); reply(202, "")
        }
        else if (path.endsWith("/error")) {
          val id = path.split("/").dropRight(1).last
          errors.add((id, body)); reply(202, "")
        }
        else reply(404, "")
      })
    srv.start()
    try {
      val h = new Lambda.Handler(spark,
        """cache_resources:
          |  - label: loop_lut
          |    memory:
          |      init:
          |        alpha: '{"greet":"hi a"}'
          |        beta: '{"greet":"hi b"}'
          |pipeline:
          |  processors:
          |    - cache:
          |        resource: loop_lut
          |        key: '${! json("k") }'
          |""".stripMargin)
      val served = Lambda.runLoop(
        s"127.0.0.1:${srv.getAddress.getPort}", h)
      assert(served == 3, s"all queued invocations served: $served")
      val byId = responses.iterator().asScala.toMap
      assert(byId("req-1") == """{"greet":"hi a"}""")
      assert(byId("req-3") == """{"greet":"hi b"}""")
      val errById = errors.iterator().asScala.toMap
      assert(errById.keySet == Set("req-2"))
      assert(errById("req-2").contains("Runtime.HandlerError"))
      assert(errById("req-2").contains("cache miss"))
    } finally srv.stop(0)
  }

  test("config resolution: inline beats path beats defaults") {
    val f = java.nio.file.Files.createTempFile("connect_cfg", ".yaml")
    java.nio.file.Files.write(f, "pipeline: {}\n".getBytes("UTF-8"))
    assert(Lambda.resolveConfig(Map(
      "CONNECT_CONFIG" -> "pipeline:\n  processors: []")) ==
      "pipeline:\n  processors: []")
    assert(Lambda.resolveConfig(Map(
      "CONNECT_CONFIG_PATH" -> f.toString)) == "pipeline: {}\n")
    assert(Lambda.resolveConfig(Map.empty) == "")
  }

}
