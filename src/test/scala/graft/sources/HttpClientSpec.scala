package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `http_client` input/output contract against a REAL loopback server
  * (the HttpPushServer convention — actual sockets drive the JDK
  * client, no stub).
  */
class HttpClientSpec extends SparkSpec {
  import spark.implicits._

  /** Serves /items?page=N → 3 pages of line-delimited JSON, then an
    * empty body; /one → a single JSON doc. Counts requests.
    */
  private final class PageServer {
    @volatile var requests = 0
    private val server = JdkHttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      requests += 1
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val path = ex.getRequestURI.getPath
      val body: String = path match {
        case "/one" => """{"hello":"world"}"""
        case "/items" =>
          val page = q.split("=").lastOption.filter(_.nonEmpty)
            .map(_.toInt).getOrElse(0)
          if (page >= 3) ""
          else (0 until 2).map(i =>
            s"""{"id":${page * 2 + i},"next_page":${page + 1}}""")
            .mkString("\n")
        case _ => ""
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(if (body.isEmpty) 200 else 200,
        if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("one-shot GET: the response body is one message") {
    val srv = new PageServer
    try {
      val df = HttpClient.read(spark, s"${srv.url}/one")
      assert(df.select($"value").as[String].collect().toSeq ==
        Seq("""{"hello":"world"}"""))
      assert(srv.requests == 1, "no interpolation → exactly one request")
    } finally srv.stop()
  }

  test("pagination: url interpolates the previous message until empty") {
    val srv = new PageServer
    try {
      val df = HttpClient.read(spark,
        s"$${! \"${srv.url}/items?page=\" + (this.next_page | 0) }",
        streamLines = true)
      val ids = df.select(get_json_object($"value", "$.id").cast("long"))
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(0L, 1L, 2L, 3L, 4L, 5L), "3 pages of 2 lines")
      assert(srv.requests == 4, "stops on the empty page-3 body")
    } finally srv.stop()
  }

  test("config runner: http_client input → processors → memory") {
    val srv = new PageServer
    try {
      graft.config.Pipeline.run(spark,
        s"""input:
           |  http_client:
           |    url: '$${! "${srv.url}/items?page=" + (this.next_page | 0) }'
           |    stream: { enabled: true, scanner: { lines: {} } }
           |pipeline:
           |  processors:
           |    - mapping: 'root.id = this.id * 10'
           |output: { memory: { name: hc_in_rt } }
           |""".stripMargin)
      val got = spark.table("hc_in_rt")
        .select(get_json_object($"value", "$.id").cast("long"))
        .as[Long].collect().toSeq.sorted
      assert(got == Seq(0L, 10L, 20L, 30L, 40L, 50L))
    } finally srv.stop()
  }

  test("config runner: http_client output posts every message for real") {
    val srv = new HttpPushServer("/sink")
    try {
      graft.config.Pipeline.run(spark,
        s"""input:
           |  generate: { count: 5, mapping: 'root.id = this.seq' }
           |output:
           |  http_client: { url: "${srv.url}", verb: POST }
           |""".stripMargin)
      assert(srv.receivedCount == 5)
      val ids = srv.drain(spark)
        .select(get_json_object($"value", "$.id").cast("long"))
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(0L, 1L, 2L, 3L, 4L))
    } finally srv.stop()
  }

  test("http_client output: endpoint rejection fails the write loudly") {
    val srv = new HttpPushServer("/sink")
    try {
      srv.rejectNext(1000) // every attempt 429s, beyond client retries
      val e = intercept[Exception] {
        graft.config.Pipeline.run(spark,
          s"""input:
             |  generate: { count: 2, mapping: 'root.id = this.seq' }
             |output:
             |  http_client: { url: "${srv.url}" }
             |""".stripMargin)
      }
      assert(e.getMessage != null)
    } finally srv.stop()
  }
}
