package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `azure_blob_storage` input/output (internal/impl/azure — contract
  * only, no code ported: the reference wraps the Azure SDK; this
  * speaks the PUBLIC Blob service REST protocol directly):
  *
  *   - [[SharedKey]]: the documented Shared Key authorization — the
  *     14-line string-to-sign (verb + standard headers + the
  *     CanonicalizedHeaders block of sorted `x-ms-*` headers + the
  *     CanonicalizedResource `/account/path` with sorted lowercase
  *     `name:value` query lines), HMAC-SHA256 with the base64 account
  *     key, `Authorization: SharedKey account:signature`. The
  *     loopback service re-derives and VERIFIES every request;
  *   - blobs: `PUT` (x-ms-blob-type: BlockBlob) / `GET` / `DELETE`;
  *   - listing: `GET /{container}?restype=container&comp=list` with
  *     the EnumerationResults XML — `NextMarker` pagination walked to
  *     exhaustion.
  *
  * Input: one message per blob with `blob_name` / `container`
  * metadata, per-blob GETs fanned across partitions. Output: one PUT
  * per message at the interpolated path.
  */
object AzureBlob {

  final case class Account(name: String, base64Key: String)

  object SharedKey {
    def hmacBase64(base64Key: String, data: String): String = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(
        Base64.getDecoder.decode(base64Key), "HmacSHA256"))
      Base64.getEncoder.encodeToString(mac.doFinal(data.getBytes(UTF_8)))
    }

    /** The documented string-to-sign for the Blob service. */
    def stringToSign(account: String, verb: String,
                     headers: Map[String, String], path: String,
                     query: Map[String, String]): String = {
      def h(n: String) = headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(n) => v
      }.getOrElse("")
      val canonicalizedHeaders = headers.collect {
        case (k, v) if k.toLowerCase.startsWith("x-ms-") =>
          s"${k.toLowerCase}:${v.trim}"
      }.toSeq.sorted.mkString("\n")
      val canonicalizedResource = s"/$account$path" +
        query.toSeq.sortBy(_._1).map { case (k, v) =>
          s"\n${k.toLowerCase}:$v"
        }.mkString
      Seq(verb,
        h("Content-Encoding"), h("Content-Language"),
        // an empty body signs Content-Length as EMPTY (2015-02-21+)
        h("Content-Length") match { case "0" => ""; case cl => cl },
        h("Content-MD5"), h("Content-Type"), h("Date"),
        h("If-Modified-Since"), h("If-Match"), h("If-None-Match"),
        h("If-Unmodified-Since"), h("Range"),
        canonicalizedHeaders).mkString("\n") + "\n" + canonicalizedResource
    }

    def authorization(acct: Account, verb: String,
                      headers: Map[String, String], path: String,
                      query: Map[String, String]): String =
      s"SharedKey ${acct.name}:" + hmacBase64(acct.base64Key,
        stringToSign(acct.name, verb, headers, path, query))
  }

  private def msDate(): String =
    java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  final class Client(endpoint: String, acct: Account,
                     client: Http.Client = null) extends Serializable {
    @transient private lazy val c =
      Option(client).getOrElse(resolveClient(endpoint))
    private val base = endpoint.stripSuffix("/")

    private def request(verb: String, path: String,
                        query: Map[String, String],
                        body: Array[Byte],
                        extraHeaders: Map[String, String] = Map.empty)
        : Http.Response = {
      val headers = extraHeaders ++ Map(
        "x-ms-date" -> msDate(),
        "x-ms-version" -> "2021-08-06",
        "Content-Length" -> body.length.toString)
      val auth = SharedKey.authorization(acct, verb, headers, path, query)
      val qs =
        if (query.isEmpty) ""
        else "?" + query.toSeq.sortBy(_._1).map { case (k, v) =>
          s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}"
        }.mkString("&")
      c(Seq(Http.Request(s"$base$path$qs", verb,
        headers + ("Authorization" -> auth),
        new String(body, UTF_8),
        bodyBytes = if (body.isEmpty) null else body))).head
    }

    def putBlob(container: String, name: String,
                body: Array[Byte]): Unit = {
      val r = request("PUT", s"/$container/$name", Map.empty, body,
        Map("x-ms-blob-type" -> "BlockBlob"))
      if (r.status != 201) throw new IllegalStateException(
        s"azure put $name: ${r.status} ${r.body.take(200)}")
    }

    def getBlob(container: String, name: String): Array[Byte] = {
      val r = request("GET", s"/$container/$name", Map.empty, Array.empty)
      if (r.status != 200) throw new IllegalStateException(
        s"azure get $name: ${r.status} ${r.body.take(200)}")
      r.body.getBytes(UTF_8)
    }

    def deleteBlob(container: String, name: String): Unit = {
      val r = request("DELETE", s"/$container/$name", Map.empty,
        Array.empty)
      if (r.status != 202) throw new IllegalStateException(
        s"azure delete $name: ${r.status}")
    }

    /** List Blobs with NextMarker pagination. */
    def list(container: String, prefix: String = "",
             maxResults: Int = 5000): Seq[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var marker = ""
      var more = true
      while (more) {
        val query = Map("restype" -> "container", "comp" -> "list",
          "prefix" -> prefix, "maxresults" -> maxResults.toString) ++
          (if (marker.nonEmpty) Map("marker" -> marker) else Map.empty)
        val r = request("GET", s"/$container", query, Array.empty)
        if (r.status != 200) throw new IllegalStateException(
          s"azure list: ${r.status} ${r.body.take(200)}")
        val xml = scala.xml.XML.loadString(r.body)
        (xml \ "Blobs" \ "Blob" \ "Name").foreach(n => out += n.text)
        marker = (xml \ "NextMarker").text
        more = marker.nonEmpty
      }
      out.toSeq
    }
  }

  def read(spark: SparkSession, endpoint: String, acct: Account,
           container: String, prefix: String = "",
           maxResultsPerPage: Int = 5000): DataFrame = {
    val names = new Client(endpoint, acct)
      .list(container, prefix, maxResultsPerPage)
    val (e, a, ct) = (endpoint, acct, container)
    import spark.implicits._
    names.toDF("name")
      .repartition(math.max(1, math.min(names.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val c = new Client(e, a)
        it.map { r =>
          val n = r.getString(0)
          (new String(c.getBlob(ct, n), UTF_8),
            Map("blob_name" -> n, "container" -> ct))
        }
      }.toDF("value", "metadata")
      .withColumn("error", lit(null).cast("string"))
  }

  def write(df: DataFrame, endpoint: String, acct: Account,
            container: String, pathCol: Column): Unit = {
    val (e, a, ct) = (endpoint, acct, container)
    df.select(pathCol.cast("string").as("p"),
        col("value").cast("string").as("v"))
      .rdd.foreachPartition { it =>
        val c = new Client(e, a)
        it.foreach(r =>
          c.putBlob(ct, r.getString(0), r.getString(1).getBytes(UTF_8)))
      }
  }

  // ---- in-memory blob service (mem://name) with SharedKey VERIFY ----

  final class MemBlobs(acct: Account) {
    val containers: mutable.LinkedHashMap[String,
      mutable.TreeMap[String, Array[Byte]]] = mutable.LinkedHashMap.empty
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      val afterScheme = q.url.stripPrefix("mem://")
      val pathAndQuery = afterScheme.substring(afterScheme.indexOf('/'))
      val (path, rawQuery) = pathAndQuery.span(_ != '?')
      val query = parseQuery(rawQuery.drop(1))
      // re-derive the SharedKey signature over the received request
      val expected = SharedKey.authorization(acct, q.verb,
        q.headers - "Authorization", path, query)
      if (!q.headers.get("Authorization").contains(expected)) {
        rejected += 1
        return Http.Response(403,
          "<Error><Code>AuthenticationFailed</Code></Error>")
      }
      val parts = path.stripPrefix("/").split("/", 2)
      val container = parts(0)
      val blob = if (parts.length > 1) parts(1) else ""
      (q.verb, blob) match {
        case ("PUT", b) if b.nonEmpty =>
          if (!q.headers.get("x-ms-blob-type").contains("BlockBlob"))
            return Http.Response(400,
              "<Error><Code>MissingRequiredHeader</Code></Error>")
          containers.getOrElseUpdate(container,
            mutable.TreeMap.empty[String, Array[Byte]])
            .update(b, Option(q.bodyBytes)
              .getOrElse(q.body.getBytes(UTF_8)))
          Http.Response(201, "")
        case ("GET", b) if b.nonEmpty =>
          containers.getOrElse(container,
            mutable.TreeMap.empty[String, Array[Byte]]).get(b) match {
            case Some(bytes) => Http.Response(200, new String(bytes, UTF_8))
            case None => Http.Response(404,
              "<Error><Code>BlobNotFound</Code></Error>")
          }
        case ("DELETE", b) if b.nonEmpty =>
          containers.getOrElse(container,
            mutable.TreeMap.empty[String, Array[Byte]]).remove(b)
          Http.Response(202, "")
        case ("GET", "") if query.get("comp").contains("list") =>
          val prefix = query.getOrElse("prefix", "")
          val maxResults = query.getOrElse("maxresults", "5000").toInt
          val all = containers.getOrElse(container,
              mutable.TreeMap.empty[String, Array[Byte]])
            .keysIterator.filter(_.startsWith(prefix)).toSeq
          val after = query.get("marker") match {
            case Some(m) => all.dropWhile(_ <= m)
            case None => all
          }
          val page = after.take(maxResults)
          val truncated = after.size > maxResults
          val blobs = page.map(n => s"<Blob><Name>$n</Name></Blob>")
            .mkString
          val next = if (truncated)
            s"<NextMarker>${page.last}</NextMarker>" else "<NextMarker/>"
          Http.Response(200,
            s"""<?xml version="1.0" encoding="utf-8"?><EnumerationResults><Blobs>$blobs</Blobs>$next</EnumerationResults>""")
        case other => Http.Response(400,
          s"<Error><Code>BadRequest</Code><Message>$other</Message></Error>")
      }
    }

    private def parseQuery(qs: String): Map[String, String] =
      if (qs.isEmpty) Map.empty
      else qs.split("&").map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemBlobs]()

  def register(name: String, acct: Account): MemBlobs =
    registry.computeIfAbsent(name, _ => new MemBlobs(acct))
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(r => Option(registry.get(name)) match {
      case Some(svc) => svc.handle(r)
      case None => Http.Response(404, "no such account")
    })

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
