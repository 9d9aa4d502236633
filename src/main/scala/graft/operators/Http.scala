package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `http` enrichment processor (docs/modules/components/pages/
  * processors/http.adoc:26 — "Performs an HTTP request using a message
  * batch as the request body, and replaces the original message parts
  * with the body of the response").
  *
  * Spark shape: the transport is a pluggable [[Http.Client]] behind a
  * `mapPartitions` batch loop — the same pattern as
  * [[Embeddings.Batcher]] — so concurrency = partitions × in-batch
  * async fan-out, there is no shuffle, and backpressure is the
  * executor's task slots (the reference caps with `rate_limit`/
  * `parallel`; here `batchSize` bounds in-flight requests per task).
  *
  * Error contract (http.adoc "Error handling" + "Response codes"):
  * 2xx (plus `successful_on`) replaces the message with the response
  * body; anything else leaves the message UNCHANGED, sets the error
  * channel, and records `http_status_code` metadata. Failed rows keep
  * flowing — a dead endpoint must not kill a 1000-executor job.
  *
  * Offline stub: `stub://` URLs resolve to [[echoClient]], a
  * deterministic fake (documented, NOT a server) so the batching/
  * alignment/error plumbing is verifiable in environments without
  * egress; production URLs resolve to the JDK [[javaClient]].
  */
object Http {

  /** `bodyBytes`, when non-null, is the wire body (binary payloads:
    * gzip, protobuf); `body` is then advisory. String bodies stay the
    * common case — UTF-8 on the wire.
    */
  final case class Request(url: String, verb: String,
                           headers: Map[String, String], body: String,
                           bodyBytes: Array[Byte] = null)
  final case class Response(status: Int, body: String,
                            headers: Map[String, String] = Map.empty)

  /** One transport round-trip: N requests in, N responses out
    * (order-aligned — misalignment is THE failure mode of a batching
    * transport, and the oracle gate checks it per row).
    */
  type Client = Seq[Request] => Seq[Response]

  /** Deterministic offline stand-in for an HTTP endpoint (NOT a
    * server): a URL path ending in `/missing` returns 404; anything
    * else echoes `{"echo":<body>,"len":<n>}` — both reproducible in
    * ANSI SQL so the correctness gate can verify per-row alignment and
    * the non-2xx error path.
    */
  def echoClient: Client = reqs => reqs.map { q =>
    if (q.url.endsWith("/missing")) Response(404, "not found")
    else {
      val b = if (q.body.isEmpty) "null" else q.body
      Response(200, s"""{"echo":$b,"len":${b.length}}""")
    }
  }

  /** Real transport: JDK HttpClient, one async request per row fanned
    * out across the batch, with the reference's retry knobs —
    * `retries` bounded attempts, exponential backoff on `backoffOn`
    * statuses (default 429) and IO errors, `dropOn` statuses failing
    * immediately (http.adoc `backoff_on`/`drop_on`/`retries`).
    */
  def javaClient(timeoutMs: Long = 5000, retries: Int = 3,
                 retryPeriodMs: Long = 1000,
                 maxRetryBackoffMs: Long = 300000,
                 backoffOn: Set[Int] = Set(429),
                 dropOn: Set[Int] = Set.empty): Client = reqs => {
    val c = JdkClient.instance
    def send(q: Request): java.util.concurrent.CompletableFuture[Response] = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(q.url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
      q.headers.foreach { case (k, v) => b.header(k, v) }
      val req = b.method(q.verb,
        if (q.verb == "GET" || q.verb == "DELETE")
          java.net.http.HttpRequest.BodyPublishers.noBody()
        else if (q.bodyBytes != null)
          java.net.http.HttpRequest.BodyPublishers.ofByteArray(q.bodyBytes)
        else java.net.http.HttpRequest.BodyPublishers.ofString(q.body)).build()
      c.sendAsync(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        .thenApply { r =>
          import scala.jdk.CollectionConverters._
          val hs = r.headers().map().asScala.collect {
            case (k, vs) if !vs.isEmpty => k.toLowerCase -> vs.get(0)
          }.toMap
          Response(r.statusCode(), r.body(), hs)
        }
    }
    retryBatch(reqs, send, retries, retryPeriodMs, maxRetryBackoffMs,
      backoffOn, dropOn)
  }

  /** Batch-wide retry rounds over an async send: the WHOLE batch fans
    * out first (a join inside the launch loop would serialize it),
    * then each ROUND re-fans-out only the still-failing subset after
    * ONE shared backoff — N simultaneous 429s cost one backoff period,
    * not N serialized sleeps on the task thread. Per-row attempt
    * semantics match the reference (`retries` bounded, exponential
    * `retryPeriodMs`→`maxRetryBackoffMs`, `dropOn` fails immediately).
    */
  private[operators] def retryBatch(
      reqs: Seq[Request],
      send: Request => java.util.concurrent.CompletableFuture[Response],
      retries: Int, retryPeriodMs: Long, maxRetryBackoffMs: Long,
      backoffOn: Set[Int], dropOn: Set[Int]): Seq[Response] = {
    def settle(f: java.util.concurrent.CompletableFuture[Response]): Response =
      try f.join()
      catch { case e: Exception => Response(-1, e.getMessage) }
    def retryable(r: Response): Boolean =
      !dropOn.contains(r.status) &&
        (r.status == -1 || backoffOn.contains(r.status))
    val results = new Array[Response](reqs.length)
    var pending: Vector[(Int, Request)] =
      reqs.zipWithIndex.map(_.swap).toVector
    var round = 0
    var delay = retryPeriodMs
    while (pending.nonEmpty) {
      val settled = pending
        .map { case (i, q) => (i, q, send(q)) }   // launch all…
        .map { case (i, q, f) => (i, q, settle(f)) } // …then join
      val (again, done) = settled.partition { case (_, _, r) => retryable(r) }
      done.foreach { case (i, _, r) => results(i) = r }
      if (again.isEmpty || round >= retries) {
        again.foreach { case (i, _, r) => results(i) = r }
        pending = Vector.empty
      } else {
        Thread.sleep(delay)
        delay = math.min(delay * 2, maxRetryBackoffMs)
        round += 1
        pending = again.map { case (i, q, _) => (i, q) }
      }
    }
    results.toIndexedSeq
  }

  private object JdkClient {
    lazy val instance: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()
  }

  /** Scheme-based transport resolution: `stub://` → [[echoClient]]
    * (offline-verifiable), else [[javaClient]].
    */
  def clientFor(url: String): Client =
    if (url.startsWith("stub://")) echoClient else javaClient()

  /** Raw batched request: appends `respCol` (string) and `statusCol`
    * (int) by calling `client` over batches of `batchSize` rows within
    * each partition. Rows with a null/empty URL get status -2 and a
    * null response without consuming transport slots.
    */
  def requestBatched(df: DataFrame, urlCol: String, bodyCol: String,
                     verb: String, headers: Map[String, String],
                     batchSize: Int, client: Client,
                     respCol: String, statusCol: String): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(respCol, StringType), StructField(statusCol, IntegerType)))
    val uIdx = df.schema.fieldIndex(urlCol)
    val bIdx = df.schema.fieldIndex(bodyCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val urls = rows.map(r =>
          if (r.isNullAt(uIdx)) "" else r.getString(uIdx))
        val callable = urls.zipWithIndex.filter(_._1.nonEmpty)
        val resps = if (callable.isEmpty) Seq.empty
          else client(callable.map { case (u, i) =>
            Request(u, verb, headers,
              if (rows(i).isNullAt(bIdx)) "" else rows(i).getString(bIdx))
          })
        require(resps.length == callable.length,
          s"http client returned ${resps.length} responses for ${callable.length} requests")
        val byIdx = callable.map(_._2).zip(resps).toMap
        rows.zipWithIndex.map { case (r, i) =>
          byIdx.get(i) match {
            case Some(resp) => Row.fromSeq(r.toSeq ++ Seq(resp.body, resp.status))
            case None => Row.fromSeq(r.toSeq ++ Seq(null, -2))
          }
        }
      }
    }
  }

  /** Processor-level form: request body = `value`, response replaces
    * `value` on success (2xx or `successfulOn`); failures keep the
    * original value, set the error channel, and record
    * `http_status_code` in `metadata` when that column exists.
    */
  def enrich(df: DataFrame, url: Column, verb: String = "POST",
             headers: Map[String, String] = Map.empty,
             batchSize: Int = 16, client: Client = null,
             successfulOn: Set[Int] = Set.empty): DataFrame = {
    val d = FlowControl.withErrorChannel(df).withColumn("__http_url", url)
    val resolved = Option(client).getOrElse(javaClient())
    val r = requestBatched(d, "__http_url", "value", verb, headers,
      batchSize, resolved, "__http_resp", "__http_status")
    val ok = col("__http_status").between(200, 299) ||
      (if (successfulOn.isEmpty) lit(false)
       else col("__http_status").isin(successfulOn.toSeq: _*))
    val withVal = r
      .withColumn("value",
        when(ok, col("__http_resp")).otherwise(col("value")))
      .withColumn("error",
        when(col("error").isNotNull, col("error"))
          .otherwise(when(!ok,
            concat(lit("http status "), col("__http_status")))))
    val withMeta =
      if (withVal.columns.contains("metadata"))
        withVal.withColumn("metadata",
          when(!ok, map_concat(coalesce(col("metadata"),
              map().cast("map<string,string>")),
            map(lit("http_status_code"),
              col("__http_status").cast("string"))))
            .otherwise(col("metadata")))
      else withVal
    withMeta.drop("__http_url", "__http_resp", "__http_status")
  }
}
