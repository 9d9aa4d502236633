package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Search (elasticsearch-shaped) output over a REAL loopback server
  * implementing the public _bulk NDJSON contract, including per-item
  * errors.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal bulk endpoint: applies index/create/update/delete to an
    * in-memory (index, id) → doc map and answers the items envelope.
    */
  private final class BulkServer {
    val docs = mutable.LinkedHashMap.empty[(String, String), String]
    @volatile var requests = 0
    private val mapper = new ObjectMapper()
    private val server = JdkHttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", (ex: HttpExchange) => {
      requests += 1
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val lines = body.split("\n").toSeq.filter(_.nonEmpty).iterator
      val items = Vector.newBuilder[String]
      var anyError = false
      while (lines.hasNext) {
        val actionLine = mapper.readTree(lines.next())
        val op = actionLine.properties().iterator().next()
        val verb = op.getKey
        val index = op.getValue.path("_index").asText
        val id = op.getValue.path("_id").asText
        val key = (index, id)
        def ok(v: String, st: Int) =
          items += s"""{"$v":{"_index":"$index","_id":"$id","status":$st}}"""
        def fail(v: String, st: Int) = {
          anyError = true
          items += s"""{"$v":{"_index":"$index","_id":"$id","status":$st,"error":{"type":"x"}}}"""
        }
        verb match {
          case "index" =>
            docs.synchronized { docs(key) = lines.next() }; ok(verb, 201)
          case "create" =>
            val src = lines.next()
            docs.synchronized {
              if (docs.contains(key)) fail(verb, 409)
              else { docs(key) = src; ok(verb, 201) }
            }
          case "update" =>
            val env = mapper.readTree(lines.next())
            val partial = env.path("doc")
            docs.synchronized {
              if (docs.contains(key)) {
                val merged = mapper.readTree(docs(key))
                  .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
                merged.setAll(partial
                  .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
                docs(key) = merged.toString; ok(verb, 200)
              } else if (env.path("doc_as_upsert").asBoolean(false)) {
                docs(key) = partial.toString; ok(verb, 201)
              } else fail(verb, 404)
            }
          case "delete" =>
            docs.synchronized {
              if (docs.remove(key).isDefined) ok(verb, 200)
              else fail(verb, 404)
            }
        }
      }
      val resp = s"""{"took":1,"errors":$anyError,"items":[${
        items.result().mkString(",")}]}"""
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("bulk index: per-row interpolated index and id, chunked posts") {
    val srv = new BulkServer
    try {
      graft.config.Pipeline.run(spark,
        s"""input:
           |  generate: { count: 7, mapping: 'root.id = this.seq\nroot.name = "doc" + this.seq.string()' }
           |output:
           |  elasticsearch_v8:
           |    urls: [ "${srv.url}" ]
           |    index: 'docs-$${! this.id % 2 }'
           |    action: index
           |    id: '$${! this.id }'
           |    batching: { count: 3 }
           |""".stripMargin)
      assert(srv.docs.size == 7)
      assert(srv.docs((("docs-0"), "4")).contains("\"doc4\""))
      assert(srv.docs.keySet.map(_._1) == Set("docs-0", "docs-1"))
      assert(srv.requests >= 3, "3-per-chunk batching posts multiple bulks")
    } finally srv.stop()
  }

  test("upsert inserts then updates; delete removes; create conflicts fail") {
    val srv = new BulkServer
    try {
      val base = Seq((0L, "a"), (1L, "b"))
        .toDF("id", "name")
        .select(to_json(struct($"id", $"name")).as("value"), $"id")
      Search.bulkWrite(base, srv.url, lit("idx"), lit("upsert"),
        $"id".cast("string"))
      assert(srv.docs((("idx"), "0")) == """{"id":0,"name":"a"}""")
      // second upsert round updates in place
      val upd = Seq((0L, "a2")).toDF("id", "name")
        .select(to_json(struct($"id", $"name")).as("value"), $"id")
      Search.bulkWrite(upd, srv.url, lit("idx"), lit("upsert"),
        $"id".cast("string"))
      assert(srv.docs((("idx"), "0")) == """{"id":0,"name":"a2"}""")
      assert(srv.docs.size == 2)
      // delete
      Search.bulkWrite(upd.limit(1), srv.url, lit("idx"), lit("delete"),
        $"id".cast("string"))
      assert(srv.docs.size == 1)
      // create on an existing id → per-item 409 → loud failure
      val dup = Seq((1L, "bb")).toDF("id", "name")
        .select(to_json(struct($"id", $"name")).as("value"), $"id")
      val e = intercept[Exception] {
        Search.bulkWrite(dup, srv.url, lit("idx"), lit("create"),
          $"id".cast("string"))
      }
      assert(e.getMessage.contains("rejected"))
    } finally srv.stop()
  }
}
