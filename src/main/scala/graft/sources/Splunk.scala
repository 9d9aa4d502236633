package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** The `splunk` input and `splunk_hec` output (inputs/splunk.adoc,
  * outputs/splunk_hec.adoc; internal/impl/splunk — contract only) over
  * the pluggable [[Http.Client]].
  *
  * Input: ONE POST to the Search API export endpoint
  * (`search=search <query>&output_mode=json`, basic auth, form
  * encoding); the response streams NDJSON and each line is one message
  * (raw line body, like the reference). The export call is a single
  * server-driven stream — driver admission again — and rows
  * parallelize after.
  *
  * Output: per partition, events batch into ONE collector POST of
  * concatenated JSON objects with `Authorization: Splunk <token>` —
  * the HEC wire form. Non-object messages and objects without an
  * `event` field wrap as `{"event": <data>}`; configured
  * host/source/sourcetype/index override top-level fields. `gzip`
  * compresses the payload (binary body via Http.Request.bodyBytes).
  * HEC reports success in the body (`"code":0`) — checked per batch.
  */
object Splunk {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  private val namedClients = TrieMap.empty[String, Http.Client]

  def registerClient(name: String, client: Http.Client): Unit =
    namedClients.update(name, client)

  def clientFor(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => namedClients.getOrElse(name, sys.error(
        s"splunk: no client registered for mem://$name"))(reqs)
    } else Http.javaClient()

  private def basic(user: String, password: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes("UTF-8"))

  /** Search export: one POST, one message per NDJSON line. */
  def searchRead(spark: SparkSession, url: String, user: String,
                 password: String, query: String,
                 client: Http.Client = null): DataFrame = {
    val c = Option(client).getOrElse(clientFor(url))
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val form = s"search=${enc("search " + query)}&output_mode=json"
    val resp = c(Seq(Http.Request(url, "POST", Map(
      "Authorization" -> basic(user, password),
      "Content-Type" -> "application/x-www-form-urlencoded"), form))).head
    if (resp.status != 200) throw new IllegalStateException(
      s"splunk: export returned ${resp.status}: ${resp.body.take(200)}")
    val rows = resp.body.split("\n").toIndexedSeq.filter(_.nonEmpty)
      .zipWithIndex.map { case (line, i) =>
        Row(line, Map.empty[String, String], null, i.toLong)
      }
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      rows.length / 256 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }

  /** HEC event wrapping (output.go WriteBatch): non-JSON → raw string
    * event; non-object JSON or object missing `event` → wrapped;
    * configured fields override.
    */
  private[sources] def hecEvent(value: String, host: String, source: String,
                                sourcetype: String, index: String): String = {
    val parsed =
      try Some(mapper.readTree(value))
      catch { case _: Exception => None }
    val obj = parsed match {
      case Some(n) if n.isObject && n.has("event") =>
        n.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      case Some(n) =>
        val o = mapper.createObjectNode(); o.set[com.fasterxml.jackson
          .databind.JsonNode]("event", n); o
      case None =>
        val o = mapper.createObjectNode(); o.put("event", value); o
    }
    if (host.nonEmpty) obj.put("host", host)
    if (source.nonEmpty) obj.put("source", source)
    if (sourcetype.nonEmpty) obj.put("sourcetype", sourcetype)
    if (index.nonEmpty) obj.put("index", index)
    obj.toString
  }

  /** One collector POST per `batchSize` messages per partition; fails
    * on transport errors or a non-zero HEC `code`.
    */
  def hecWrite(df: DataFrame, url: String, token: String,
               eventHost: String = "", eventSource: String = "",
               eventSourceType: String = "", eventIndex: String = "",
               gzip: Boolean = false, batchSize: Int = 100,
               client: Http.Client = null): Unit = {
    val c = Option(client).getOrElse(clientFor(url))
    val (h, s2, st, idx) = (eventHost, eventSource, eventSourceType, eventIndex)
    val failures = df.select(col(Envelope.ValueCol).cast("string"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).map { rows =>
          val payload = rows.map(r =>
            hecEvent(r.getString(0), h, s2, st, idx)).mkString("")
          val headers = Map(
            "Authorization" -> s"Splunk $token",
            "Content-Type" -> "application/json") ++
            (if (gzip) Map("Content-Encoding" -> "gzip") else Map.empty)
          val req =
            if (gzip) {
              val bos = new java.io.ByteArrayOutputStream()
              val gz = new java.util.zip.GZIPOutputStream(bos)
              gz.write(payload.getBytes("UTF-8")); gz.close()
              Http.Request(url, "POST", headers, payload, bos.toByteArray)
            } else Http.Request(url, "POST", headers, payload)
          val resp = c(Seq(req)).head
          val ok = resp.status >= 200 && resp.status <= 299 &&
            (try mapper.readTree(resp.body).path("code").asInt(-1) == 0
             catch { case _: Exception => false })
          if (ok) 0L else rows.length.toLong
        }
      }.sum()
    if (failures > 0) throw new IllegalStateException(
      s"splunk_hec: ${failures.toLong} events rejected by the collector")
  }

  /** In-memory server for the consumed API subset: the export endpoint
    * streams the corpus as NDJSON `{"preview":false,"offset":N,
    * "result":{...}}` lines (the export wire shape); the collector
    * endpoint parses concatenated JSON event objects (gunzipping when
    * Content-Encoding: gzip) and records them.
    */
  object InMemoryServer {
    final case class Transport(results: Seq[String])
        extends (Seq[Http.Request] => Seq[Http.Response])
        with Serializable {
      val collected = new java.util.concurrent.ConcurrentLinkedQueue[String]()

      def apply(reqs: Seq[Http.Request]): Seq[Http.Response] = reqs.map { q =>
        val path = java.net.URI.create(q.url).getPath
        if (path.endsWith("/search/v2/jobs/export")) {
          require(q.headers.get("Authorization").exists(_.startsWith("Basic ")),
            "fake splunk: missing basic auth")
          require(q.body.contains("output_mode=json"),
            "fake splunk: output_mode=json required")
          require(q.body.contains("search=search+") ||
            q.body.contains("search=search%20"),
            "fake splunk: query must be prefixed with the search command")
          val lines = results.zipWithIndex.map { case (r, i) =>
            s"""{"preview":false,"offset":$i,"result":$r}"""
          }
          Http.Response(200, lines.mkString("\n"))
        } else if (path.endsWith("/collector/event")) {
          require(q.headers.get("Authorization").exists(_.startsWith("Splunk ")),
            "fake splunk: missing HEC token auth")
          val text =
            if (q.headers.get("Content-Encoding").contains("gzip")) {
              val in = new java.util.zip.GZIPInputStream(
                new java.io.ByteArrayInputStream(q.bodyBytes))
              new String(in.readAllBytes(), "UTF-8")
            } else q.body
          val parser = Shared.mapper.createParser(text)
          val it = Shared.mapper.readValues(
            parser, classOf[com.fasterxml.jackson.databind.JsonNode])
          while (it.hasNext) collected.add(it.next().toString)
          Http.Response(200, """{"text":"Success","code":0}""")
        } else Http.Response(404, """{"text":"no route","code":4}""")
      }
    }
  }
}
