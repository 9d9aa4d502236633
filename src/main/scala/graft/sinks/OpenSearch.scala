package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Http
import graft.sources.AwsApi
import graft.sources.S3.{Credentials, SigV4}

/** `opensearch` output (reference internal/impl/opensearch/output.go):
  * the SAME `_bulk` NDJSON protocol as the elasticsearch output, plus
  * the one real delta — the managed-AOS path signs every request with
  * AWS SigV4 (service `es`; output.go:49-65, the `aws` block wired by
  * the aws subpackage). Re-expressed here as a signing transport
  * wrapped around [[Search.bulkWrite]]'s assembly, so the NDJSON
  * building, per-item status handling, and failure accounting are the
  * single shared implementation — exactly how the reference shares
  * its esutil core between the two outputs.
  */
object OpenSearch {

  /** Wrap a transport so every request carries SigV4 headers derived
    * from its own URL/payload (signed per request, not per session).
    */
  def signingClient(creds: Credentials, inner: Http.Client): Http.Client =
    reqs => inner(reqs.map { q =>
      val afterScheme = q.url.stripPrefix("mem://")
        .stripPrefix("http://").stripPrefix("https://")
      val host = afterScheme.takeWhile(_ != '/')
      val path = {
        val p = afterScheme.dropWhile(_ != '/').takeWhile(_ != '?')
        if (p.isEmpty) "/" else p
      }
      val payload = Option(q.bodyBytes)
        .getOrElse(q.body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val amzDate = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      val extra = q.headers.filter(_._1.equalsIgnoreCase("Content-Type"))
        .map { case (k, v) => k.toLowerCase -> v }
      val signed = SigV4.sign(creds, "es", q.verb, path, Map.empty,
        extra + ("host" -> host), payload, amzDate)
      q.copy(headers = q.headers ++ Map(
        "x-amz-date" -> amzDate,
        "x-amz-content-sha256" -> signed.payloadHash,
        "Authorization" -> signed.authorization))
    })

  /** Bulk-publish with SigV4 (pass `creds = None` for basic/unsigned
    * clusters — then this IS the elasticsearch path).
    */
  def bulkWrite(df: DataFrame, url: String, indexCol: Column,
                actionCol: Column, idCol: Column,
                valueCol: Column = org.apache.spark.sql.functions.col("value"),
                batchSize: Int = 500, creds: Option[Credentials] = None,
                client: Http.Client = null): Unit = {
    val inner = Option(client).getOrElse(resolveClient(url))
    val transport = creds match {
      case Some(c) => signingClient(c, inner)
      case None => inner
    }
    Search.bulkWrite(df, url, indexCol, actionCol, idCol, valueCol,
      batchSize, transport)
  }

  /** SigV4-verifying OpenSearch: re-derives the signature (service
    * `es`), then delegates the bulk application to a [[Search.MemES]]
    * core — shared protocol, extra auth layer.
    */
  final class MemOS(creds: Credentials) {
    val es = new Search.MemES
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = {
      AwsApi.verifySig(q, creds, "es") match {
        case Some(_) =>
          rejected += 1
          return Http.Response(403, """{"error":"signature mismatch"}""")
        case None => ()
      }
      if (q.url.endsWith("/_bulk")) es.applyBulk(q.body)
      else Http.Response(404, """{"error":"no route"}""")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemOS]()

  def register(name: String, creds: Credentials): MemOS =
    registry.computeIfAbsent(name, _ => new MemOS(creds))
  def drop(name: String): Unit = { registry.remove(name); () }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => reqs.map { r =>
        Option(registry.get(name)).map(_.handle(r))
          .getOrElse(Http.Response(404, "no such opensearch"))
      }
    } else Http.javaClient()
}
