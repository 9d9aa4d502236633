package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `aws_s3` input/output (internal/impl/aws — contract only, no code
  * ported: the reference wraps the AWS SDK; this speaks the PUBLIC
  * S3 REST protocol directly):
  *
  *   - [[SigV4]]: the complete AWS Signature Version 4 derivation —
  *     canonical request (sorted query, canonical headers,
  *     x-amz-content-sha256 payload hash), string-to-sign with the
  *     date/region/service scope, the four-step HMAC signing-key
  *     chain, and the Authorization header. The loopback service
  *     re-derives and VERIFIES every signature, so signing is a
  *     tested contract;
  *   - objects: `PUT /{bucket}/{key}` / `GET` / `DELETE`;
  *   - listing: `GET /{bucket}?list-type=2&prefix=…&max-keys=…` with
  *     the ListObjectsV2 XML envelope — `IsTruncated` +
  *     `NextContinuationToken` PAGINATION is walked to exhaustion
  *     (the reference's paginated bucket scan).
  *
  * Input shape mirrors the reference: list the bucket/prefix
  * (paginated driver admission), then one message per object with
  * `s3_key` / `s3_etag` metadata — the per-object GETs fan out across
  * executor partitions. Output: one PUT per message at the
  * interpolated path, executor-side.
  */
object S3 {

  final case class Credentials(accessKey: String, secretKey: String,
                               region: String = "us-east-1")

  object SigV4 {
    def sha256Hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
        .map("%02x".format(_)).mkString
    def sha256Hex(s: String): String = sha256Hex(s.getBytes(UTF_8))

    def hmac(key: Array[Byte], data: String): Array[Byte] = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      mac.doFinal(data.getBytes(UTF_8))
    }

    /** The documented four-step signing-key chain. */
    def signingKey(secret: String, date: String, region: String,
                   service: String): Array[Byte] = {
      val kDate = hmac(("AWS4" + secret).getBytes(UTF_8), date)
      val kRegion = hmac(kDate, region)
      val kService = hmac(kRegion, service)
      hmac(kService, "aws4_request")
    }

    def uriEncode(s: String, encodeSlash: Boolean): String = {
      val sb = new StringBuilder
      s.getBytes(UTF_8).foreach { b =>
        val c = (b & 0xFF).toChar
        if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.' ||
            c == '~' || (c == '/' && !encodeSlash)) sb += c
        else sb.append(f"%%${b & 0xFF}%02X")
      }
      sb.toString
    }

    def canonicalQuery(query: Map[String, String]): String =
      query.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${uriEncode(k, encodeSlash = true)}=${uriEncode(v, encodeSlash = true)}"
      }.mkString("&")

    final case class Signed(authorization: String, amzDate: String,
                            payloadHash: String)

    /** Sign one request; returns the headers to attach. `amzDate`
      * injectable for fixed-vector tests (ISO basic
      * `yyyyMMdd'T'HHmmss'Z'`).
      */
    def sign(creds: Credentials, service: String, method: String,
             path: String, query: Map[String, String],
             headers: Map[String, String], payload: Array[Byte],
             amzDate: String): Signed = {
      val date = amzDate.substring(0, 8)
      val payloadHash = sha256Hex(payload)
      val allHeaders = headers ++ Map(
        "x-amz-date" -> amzDate,
        "x-amz-content-sha256" -> payloadHash)
      val canonHeaders = allHeaders.map { case (k, v) =>
        k.toLowerCase -> v.trim
      }.toSeq.sortBy(_._1)
      val signedHeaderNames = canonHeaders.map(_._1).mkString(";")
      val canonicalRequest = Seq(
        method,
        uriEncode(path, encodeSlash = false),
        canonicalQuery(query),
        canonHeaders.map { case (k, v) => s"$k:$v\n" }.mkString,
        signedHeaderNames,
        payloadHash).mkString("\n")
      val scope = s"$date/${creds.region}/$service/aws4_request"
      val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
        sha256Hex(canonicalRequest)).mkString("\n")
      val signature = hmac(
        signingKey(creds.secretKey, date, creds.region, service),
        stringToSign).map("%02x".format(_)).mkString
      Signed(
        s"AWS4-HMAC-SHA256 Credential=${creds.accessKey}/$scope, " +
          s"SignedHeaders=$signedHeaderNames, Signature=$signature",
        amzDate, payloadHash)
    }
  }

  private def nowAmzDate(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  final class Client(endpoint: String, creds: Credentials,
                     client: Http.Client = null) extends Serializable {
    @transient private lazy val c =
      Option(client).getOrElse(resolveClient(endpoint))
    private val base = endpoint.stripSuffix("/")

    private def request(method: String, path: String,
                        query: Map[String, String],
                        payload: Array[Byte]): Http.Response = {
      val host = base.stripPrefix("http://").stripPrefix("https://")
        .stripPrefix("mem://").takeWhile(_ != '/')
      val signed = SigV4.sign(creds, "s3", method, path, query,
        Map("host" -> host), payload, nowAmzDate())
      val qs =
        if (query.isEmpty) ""
        else "?" + SigV4.canonicalQuery(query)
      c(Seq(Http.Request(s"$base$path$qs", method,
        Map("Host" -> host,
          "x-amz-date" -> signed.amzDate,
          "x-amz-content-sha256" -> signed.payloadHash,
          "Authorization" -> signed.authorization),
        new String(payload, UTF_8),
        bodyBytes = if (payload.isEmpty) null else payload))).head
    }

    def put(bucket: String, key: String, body: Array[Byte]): Unit = {
      val r = request("PUT", s"/$bucket/$key", Map.empty, body)
      if (r.status != 200) throw new IllegalStateException(
        s"s3 PUT $key: ${r.status} ${r.body.take(200)}")
    }

    def get(bucket: String, key: String): Array[Byte] = {
      val r = request("GET", s"/$bucket/$key", Map.empty, Array.empty)
      if (r.status != 200) throw new IllegalStateException(
        s"s3 GET $key: ${r.status} ${r.body.take(200)}")
      r.body.getBytes(UTF_8)
    }

    def delete(bucket: String, key: String): Unit = {
      val r = request("DELETE", s"/$bucket/$key", Map.empty, Array.empty)
      if (r.status != 204 && r.status != 200)
        throw new IllegalStateException(s"s3 DELETE $key: ${r.status}")
    }

    /** ListObjectsV2 pagination walked to exhaustion. */
    def list(bucket: String, prefix: String = "",
             maxKeys: Int = 1000): Seq[(String, String)] = {
      val out = mutable.ArrayBuffer.empty[(String, String)]
      var token: Option[String] = None
      var more = true
      while (more) {
        val query = Map("list-type" -> "2", "prefix" -> prefix,
          "max-keys" -> maxKeys.toString) ++
          token.map("continuation-token" -> _)
        val r = request("GET", s"/$bucket", query, Array.empty)
        if (r.status != 200) throw new IllegalStateException(
          s"s3 LIST $bucket: ${r.status} ${r.body.take(200)}")
        val xml = scala.xml.XML.loadString(r.body)
        (xml \ "Contents").foreach { c =>
          out += (((c \ "Key").text, (c \ "ETag").text))
        }
        more = (xml \ "IsTruncated").text == "true"
        token = if (more) Some((xml \ "NextContinuationToken").text)
                else None
      }
      out.toSeq
    }
  }

  /** One message per object under bucket/prefix; listing paginates on
    * the driver, object GETs fan out per partition.
    */
  def read(spark: SparkSession, endpoint: String, creds: Credentials,
           bucket: String, prefix: String = "",
           maxKeysPerPage: Int = 1000): DataFrame = {
    val lister = new Client(endpoint, creds)
    val keys = lister.list(bucket, prefix, maxKeysPerPage)
    val endpointV = endpoint
    val credsV = creds
    val bucketV = bucket
    import spark.implicits._
    keys.toDF("key", "etag")
      .repartition(math.max(1, math.min(keys.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val c = new Client(endpointV, credsV)
        it.map { r =>
          val key = r.getString(0)
          (new String(c.get(bucketV, key), UTF_8),
            Map("s3_key" -> key, "s3_bucket" -> bucketV,
              "s3_etag" -> r.getString(1)))
        }
      }.toDF("value", "metadata")
      .withColumn("error", lit(null).cast("string"))
  }

  /** One PUT per message at the interpolated path. */
  def write(df: DataFrame, endpoint: String, creds: Credentials,
            bucket: String, pathCol: Column): Unit = {
    val endpointV = endpoint
    val credsV = creds
    val bucketV = bucket
    df.select(pathCol.cast("string").as("p"),
        col("value").cast("string").as("v"))
      .rdd.foreachPartition { it =>
        val c = new Client(endpointV, credsV)
        it.foreach(r =>
          c.put(bucketV, r.getString(0), r.getString(1).getBytes(UTF_8)))
      }
  }

  // ---- in-memory S3 (mem://name) with SigV4 VERIFICATION ----

  final class MemS3(creds: Credentials) {
    val buckets: mutable.LinkedHashMap[String,
      mutable.TreeMap[String, Array[Byte]]] = mutable.LinkedHashMap.empty
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      verify(q) match {
        case Some(err) =>
          rejected += 1
          return Http.Response(403,
            s"""<Error><Code>SignatureDoesNotMatch</Code><Message>$err</Message></Error>""")
        case None => ()
      }
      val afterScheme = q.url.stripPrefix("mem://")
      val pathAndQuery = afterScheme.substring(afterScheme.indexOf('/'))
      val (path, rawQuery) = pathAndQuery.span(_ != '?')
      val query = parseQuery(rawQuery.drop(1))
      val parts = path.stripPrefix("/").split("/", 2)
      val bucket = parts(0)
      val key = if (parts.length > 1) parts(1) else ""
      (q.verb, key) match {
        case ("PUT", k) if k.nonEmpty =>
          buckets.getOrElseUpdate(bucket, mutable.TreeMap.empty)
            .update(k, Option(q.bodyBytes)
              .getOrElse(q.body.getBytes(UTF_8)))
          Http.Response(200, "")
        case ("GET", k) if k.nonEmpty =>
          buckets.getOrElse(bucket,
            mutable.TreeMap.empty[String, Array[Byte]]).get(k) match {
            case Some(b) => Http.Response(200, new String(b, UTF_8))
            case None => Http.Response(404,
              "<Error><Code>NoSuchKey</Code></Error>")
          }
        case ("DELETE", k) if k.nonEmpty =>
          buckets.getOrElse(bucket,
            mutable.TreeMap.empty[String, Array[Byte]]).remove(k)
          Http.Response(204, "")
        case ("GET", "") if query.get("list-type").contains("2") =>
          listXml(bucket, query)
        case other => Http.Response(400,
          s"<Error><Code>BadRequest</Code><Message>$other</Message></Error>")
      }
    }

    /** Re-derive the signature exactly as a real endpoint does. */
    private def verify(q: Http.Request): Option[String] = {
      val auth = q.headers.getOrElse("Authorization", return Some("no auth"))
      val amzDate = q.headers.getOrElse("x-amz-date", return Some("no date"))
      val payload = Option(q.bodyBytes).getOrElse(q.body.getBytes(UTF_8))
      if (!q.headers.get("x-amz-content-sha256")
            .contains(SigV4.sha256Hex(payload)))
        return Some("payload hash mismatch")
      val afterScheme = q.url.stripPrefix("mem://")
      val pathAndQuery = afterScheme.substring(afterScheme.indexOf('/'))
      val (path, rawQuery) = pathAndQuery.span(_ != '?')
      val host = afterScheme.takeWhile(_ != '/')
      val expected = SigV4.sign(creds, "s3", q.verb, path,
        parseQuery(rawQuery.drop(1)), Map("host" -> host), payload,
        amzDate)
      if (auth != expected.authorization)
        Some(s"signature mismatch")
      else None
    }

    private def parseQuery(qs: String): Map[String, String] =
      if (qs.isEmpty) Map.empty
      else qs.split("&").map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

    private def listXml(bucket: String,
                        query: Map[String, String]): Http.Response = {
      val prefix = query.getOrElse("prefix", "")
      val maxKeys = query.getOrElse("max-keys", "1000").toInt
      val from = query.get("continuation-token")
      val all = buckets.getOrElse(bucket,
        mutable.TreeMap.empty[String, Array[Byte]])
        .iterator.filter(_._1.startsWith(prefix)).toSeq
      val after = from match {
        case Some(t) => all.dropWhile(_._1 <= t)
        case None => all
      }
      val page = after.take(maxKeys)
      val truncated = after.size > maxKeys
      val contents = page.map { case (k, b) =>
        s"<Contents><Key>$k</Key><ETag>&quot;${SigV4.sha256Hex(b).take(32)}&quot;</ETag><Size>${b.length}</Size></Contents>"
      }.mkString
      val tokenXml =
        if (truncated)
          s"<NextContinuationToken>${page.last._1}</NextContinuationToken>"
        else ""
      Http.Response(200,
        s"""<?xml version="1.0" encoding="UTF-8"?><ListBucketResult><Name>$bucket</Name><Prefix>$prefix</Prefix><KeyCount>${page.size}</KeyCount><MaxKeys>$maxKeys</MaxKeys><IsTruncated>$truncated</IsTruncated>$tokenXml$contents</ListBucketResult>""")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemS3]()

  def register(name: String, creds: Credentials): MemS3 =
    registry.computeIfAbsent(name, _ => new MemS3(creds))
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(r => Option(registry.get(name)) match {
      case Some(svc) => svc.handle(r)
      case None => Http.Response(404, "no such s3")
    })

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
