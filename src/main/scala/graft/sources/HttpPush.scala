package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** `http_server` push input (inputs/http_server.adoc: each request to
  * `path` becomes one message; metadata carries
  * http_server_user_agent / http_server_request_path /
  * http_server_verb / http_server_remote_ip plus headers (first
  * values) and query parameters).
  *
  * REAL implementation — the JDK's built-in loopback HTTP server, no
  * stub: requests arrive over actual sockets, so the round-trip tests
  * drive the production `Http.javaClient` (including its retry rounds
  * against genuine 429 responses). The server accumulates messages in
  * arrival order; [[drain]] snapshots them into the message envelope.
  *
  * Scale note: a push input is inherently a single ingress point — the
  * reference scales it by running N replicas behind a balancer, and
  * the Spark analog is N servers drained as a union. The drain itself
  * parallelizes: rows distribute round-robin across the session's
  * default parallelism.
  */
final class HttpPushServer(path: String = "/post",
    bindAddress: Option[String] = None) {

  private val received = ArrayBuffer.empty[(String, Map[String, String])]
  @volatile private var rejectRemaining = 0

  // bindAddress ("0.0.0.0:4196") pins the configured host:port so a
  // config's own `address` field resolves verbatim
  // (config/examples/site_analytics.yaml); default stays an ephemeral
  // loopback port
  private val server = JdkHttpServer.create(
    bindAddress match {
      case Some(a) =>
        val i = a.lastIndexOf(':')
        new InetSocketAddress(a.substring(0, i), a.substring(i + 1).toInt)
      case None => new InetSocketAddress("127.0.0.1", 0)
    }, 0)
  server.createContext(path, (ex: HttpExchange) => handle(ex))
  // daemon workers: a leaked server must never pin the JVM open
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    (r: Runnable) => {
      val th = new Thread(r, "http-push"); th.setDaemon(true); th
    })
  server.setExecutor(pool)
  server.start()

  /** Test hook: respond 429 to the next `n` requests (they are NOT
    * enqueued), so client retry behavior can be driven for real.
    */
  def rejectNext(n: Int): Unit = { rejectRemaining = n }

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port$path"

  private def handle(ex: HttpExchange): Unit = {
    try {
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val reject = received.synchronized {
        if (rejectRemaining > 0) { rejectRemaining -= 1; true } else false
      }
      if (reject) {
        val resp = "busy".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(429, resp.length)
        ex.getResponseBody.write(resp)
      } else {
        val query = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val headers = ex.getRequestHeaders.entrySet().asScala
          .map(e => e.getKey -> e.getValue.get(0)).toMap
        val meta = Map(
          "http_server_user_agent" -> headers.getOrElse("User-agent", ""),
          "http_server_request_path" -> ex.getRequestURI.getPath,
          "http_server_verb" -> ex.getRequestMethod,
          "http_server_remote_ip" ->
            ex.getRemoteAddress.getAddress.getHostAddress) ++
          headers ++ query
        received.synchronized { received += ((body, meta)); () }
        val resp = "OK".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
      }
    } finally ex.close()
  }

  /** Snapshot everything received so far as the message envelope
    * (value, metadata, error, __seq = arrival order).
    */
  def drain(spark: SparkSession): DataFrame = {
    val snapshot = received.synchronized(received.toVector)
    val rows = snapshot.zipWithIndex.map { case ((body, meta), i) =>
      Row(body, meta, null, i.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(rows.size, spark.sparkContext.defaultParallelism))),
      BrokerStream.schema)
  }

  def receivedCount: Int = received.synchronized(received.size)

  HttpPushServer.servers.put(s"127.0.0.1:$port", this)
  bindAddress.foreach(a => HttpPushServer.servers.put(a, this))

  def stop(): Unit = {
    server.stop(0); pool.shutdown()
    HttpPushServer.servers.remove(s"127.0.0.1:$port")
    bindAddress.foreach(HttpPushServer.servers.remove)
    ()
  }
}

object HttpPushServer {
  /** Live servers by `host:port` — the config-form seam: an
    * `http_server`/`gateway` input's own `address` field resolves to
    * the running server, whose received log the bounded run drains.
    */
  private[sources] val servers =
    new java.util.concurrent.ConcurrentHashMap[String, HttpPushServer]()
  def serverAt(address: String): Option[HttpPushServer] =
    Option(servers.get(address))
}

/** `http_server` OUTPUT (outputs/http_server.adoc): processed messages
  * are served to clients — each GET to `path` pops the next message in
  * `__seq` order (the reference's single-message endpoint); 204 when
  * the buffer is empty. The buffer fills from [[publish]]; one ordered
  * driver-side drain, the same single-consumer shape as stdout/socket.
  */
final class HttpServeServer(path: String = "/get") {
  private val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private val server = JdkHttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext(path, (ex: HttpExchange) => {
    try {
      val next = queue.poll()
      if (next == null) ex.sendResponseHeaders(204, -1)
      else {
        val b = next.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
      }
    } finally ex.close()
  })
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(2,
    (r: Runnable) => {
      val th = new Thread(r, "http-serve"); th.setDaemon(true); th
    })
  server.setExecutor(pool)
  server.start()

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port$path"
  def address: String = s"127.0.0.1:$port"
  HttpServeServer.servers.put(address, this)

  def publish(df: DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val ordered =
      if (df.columns.contains("__seq")) df.orderBy(col("__seq")) else df
    // O(one partition) driver memory while preserving publish order
    ordered.select(col("value").cast("string")).toLocalIterator()
      .forEachRemaining(r => { queue.add(r.getString(0)); () })
  }

  def pending: Int = queue.size()

  def stop(): Unit = {
    server.stop(0); pool.shutdown()
    HttpServeServer.servers.remove(address); ()
  }
}

object HttpServeServer {
  private[sources] val servers =
    new java.util.concurrent.ConcurrentHashMap[String, HttpServeServer]()
  def serverAt(address: String): Option[HttpServeServer] =
    Option(servers.get(address))
}
