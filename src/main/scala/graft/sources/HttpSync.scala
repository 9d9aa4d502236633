package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.SparkSession

/** `http_server` input in SYNCHRONOUS mode (inputs/http_server.adoc
  * `sync_response` block + outputs/sync_response.adoc): each request
  * becomes one invocation of the pipeline — processors run, the
  * `sync_response` output stores the reply, and the HTTP response
  * carries it back with the interpolated `status`. This is the
  * reference's request/reply serving shape (the RAG retrieval configs:
  * config/rag/retrieval/openai_pgvector.yaml), distinct from the
  * push-accumulate http_server input ([[HttpPushServer]]) used by
  * bounded batch runs.
  *
  * Per-invocation execution reuses the serverless handler
  * ([[graft.serverless.Lambda.Handler]] — internal/serverless/handler.go
  * shares exactly this shape): one-message batch in, sync_response
  * store out, result shaping 1×1 → value.
  *
  * Scale note: one ingress instance, like the reference; horizontal
  * scale is N replicas behind a balancer. The pipeline under each
  * request is a driver-local one-row plan — request latency, not lake
  * throughput, is the contract here.
  */
final class HttpSyncServer(spark: SparkSession, configYaml: String,
                           env: Map[String, String] = Map.empty) {

  private val yaml = new ObjectMapper(new YAMLFactory())
  private val json = new ObjectMapper()

  private val root = yaml.readTree(configYaml)
  private val inputNode = Option(root.get("input")).getOrElse(
    throw new IllegalArgumentException("sync server: config needs an input"))
  private val hs = Option(inputNode.get("http_server")).getOrElse(
    throw new IllegalArgumentException(
      "sync server: the input must be http_server"))
  private val path = hs.path("path").asText("/post")
  private val verbs: Set[String] = {
    import scala.jdk.CollectionConverters._
    Option(hs.get("allowed_verbs"))
      .map(_.elements().asScala.map(_.asText.toUpperCase).toSet)
      .getOrElse(Set("POST"))
  }
  private val statusTpl = hs.at("/sync_response/status").asText("")

  // the handler config is everything except the input (the request IS
  // the input message)
  private val handler = {
    val rest = root.deepCopy[ObjectNode]()
    rest.remove("input")
    new graft.serverless.Lambda.Handler(spark,
      yaml.writeValueAsString(rest), env)
  }

  private val server = JdkHttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext(path, (ex: HttpExchange) => handle(ex))
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    (r: Runnable) => {
      val th = new Thread(r, "http-sync"); th.setDaemon(true); th
    })
  server.setExecutor(pool)
  server.start()

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port$path"

  private def handle(ex: HttpExchange): Unit = {
    try {
      if (!verbs(ex.getRequestMethod.toUpperCase)) {
        ex.sendResponseHeaders(405, -1)
        return
      }
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      handler.handle(body) match {
        case Right(resultJson) =>
          val status = evalStatus(resultJson)
          val b = resultJson.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(status, b.length)
          ex.getResponseBody.write(b)
        case Left(err) =>
          val b = err.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(500, b.length)
          ex.getResponseBody.write(b)
      }
    } catch {
      case e: Exception =>
        val b = String.valueOf(e.getMessage)
          .getBytes(StandardCharsets.UTF_8)
        try { ex.sendResponseHeaders(500, b.length)
          ex.getResponseBody.write(b) } catch { case _: Exception => () }
    } finally ex.close()
  }

  /** `sync_response.status` interpolation, evaluated against the
    * RESPONSE document (`"${!this.status.or(200)}"` in the retrieval
    * configs) — a one-row driver-local evaluation through the same
    * Bloblang engine as everything else.
    */
  private def evalStatus(resultJson: String): Int =
    if (statusTpl.isEmpty) 200
    else try {
      import spark.implicits._
      val df = Seq(resultJson).toDF("value")
      val s = graft.blobl.Blobl.interpolateJson(df, statusTpl, env)
      df.select(s.cast("string")).collect()(0).getString(0).toInt
    } catch { case _: Exception => 200 }

  def stop(): Unit = {
    server.stop(0); pool.shutdown(); ()
  }
}
