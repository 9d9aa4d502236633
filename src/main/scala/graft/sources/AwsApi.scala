package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import graft.operators.Http
import graft.sources.S3.{Credentials, SigV4}

/** SigV4-signed AWS service APIs beyond S3 (internal/impl/aws —
  * contract only, no code ported: the reference wraps the SDK; these
  * speak the documented REST shapes, each signed with the SAME
  * [[S3.SigV4]] derivation the s3 gate verifies):
  *
  *   - `aws_lambda` processor (lambda/processor.go:36): the message
  *     is the payload of `POST /2015-03-31/functions/{name}/
  *     invocations` (service `lambda`); the invocation result becomes
  *     the new message content, and an `X-Amz-Function-Error`
  *     response marks the error channel;
  *   - `aws_dynamodb_partiql` processor
  *     (dynamodb/processor_partiql.go:34): `POST /` with
  *     `X-Amz-Target: DynamoDB_20120810.ExecuteStatement` (service
  *     `dynamodb`), statement + positional parameters in the
  *     documented AttributeValue JSON;
  *   - `aws_sns` output (sns/output.go:94): the Query-API
  *     `Action=Publish` form body (service `sns`).
  *
  * Loopback services VERIFY every signature (re-derivation) before
  * acting, like the S3/pusher/azure contracts.
  */
object AwsApi {

  private def nowAmzDate(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  /** One signed request against an AWS-shaped endpoint. */
  def signedPost(client: Http.Client, endpoint: String,
                 creds: Credentials, service: String, path: String,
                 body: String, extraHeaders: Map[String, String] = Map.empty)
      : Http.Response = {
    val base = endpoint.stripSuffix("/")
    val host = base.stripPrefix("http://").stripPrefix("https://")
      .stripPrefix("mem://").takeWhile(_ != '/')
    val payload = body.getBytes(UTF_8)
    val signed = SigV4.sign(creds, service, "POST", path, Map.empty,
      extraHeaders.map { case (k, v) => k.toLowerCase -> v } +
        ("host" -> host), payload, nowAmzDate())
    client(Seq(Http.Request(s"$base$path", "POST",
      extraHeaders ++ Map("Host" -> host,
        "x-amz-date" -> signed.amzDate,
        "x-amz-content-sha256" -> signed.payloadHash,
        "Authorization" -> signed.authorization),
      body))).head
  }

  // ───────────────────────── aws_lambda ─────────────────────────

  /** Invoke per message; the result replaces the content, a function
    * error feeds the error channel.
    */
  def lambdaProcessor(df0: DataFrame, endpoint: String,
                      creds: Credentials, function: String,
                      client: Http.Client = null): DataFrame = {
    val df = Envelope.ensure(df0)
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val (e, c0, fn) = (endpoint, creds, function)
    val clientV = client
    df.mapPartitions { it =>
      val c = Option(clientV).getOrElse(resolveClient(e))
      it.map { row =>
        val vals = row.toSeq.toArray
        val resp = signedPost(c, e, c0, "lambda",
          s"/2015-03-31/functions/$fn/invocations", row.getString(vIdx))
        if (resp.status < 200 || resp.status > 299)
          vals(eIdx) = s"lambda: HTTP ${resp.status}"
        else if (resp.headers.contains("x-amz-function-error"))
          vals(eIdx) = s"lambda function error: ${resp.body.take(200)}"
        else vals(vIdx) = resp.body
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
  }

  /** Deterministic loopback lambda: `transform` is the function body;
    * names starting with "fail-" answer with a function error.
    */
  final class MemLambda(creds: Credentials, transform: String => String) {
    @volatile var invocations = 0
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = {
      verifySig(q, creds, "lambda") match {
        case Some(_) => rejected += 1; return Http.Response(403, "denied")
        case None => ()
      }
      invocations += 1
      val fn = q.url.split("/functions/")(1).split("/")(0)
      if (fn.startsWith("fail-"))
        Http.Response(200, """{"errorMessage":"boom"}""",
          Map("x-amz-function-error" -> "Unhandled"))
      else Http.Response(200, transform(q.body))
    }
  }

  // ─────────────────── aws_dynamodb_partiql ────────────────────

  /** ExecuteStatement per message: `args` columns bind positional `?`
    * parameters as DynamoDB AttributeValues (S for strings, N for
    * numerics). The response items land as the message content.
    */
  def partiqlProcessor(df0: DataFrame, endpoint: String,
                       creds: Credentials, statement: String,
                       args: Seq[Column],
                       client: Http.Client = null): DataFrame = {
    val df = Envelope.ensure(df0)
      .withColumn("__pq_args", to_json(struct(args.zipWithIndex.map {
        case (a, i) => a.as(s"a$i")
      }: _*)))
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val aIdx = schema.fieldIndex("__pq_args")
    val (e, c0, stmt) = (endpoint, creds, statement)
    val clientV = client
    val out = df.mapPartitions { it =>
      val c = Option(clientV).getOrElse(resolveClient(e))
      val mapper = new ObjectMapper()
      it.map { row =>
        val vals = row.toSeq.toArray
        val argDoc = mapper.readTree(row.getString(aIdx))
        val params = Seq.newBuilder[String]
        argDoc.properties().forEach { en =>
          val v = en.getValue
          params += (if (v.isNumber) s"""{"N":"${v.asText}"}"""
                     else s"""{"S":${v.toString}}""")
        }
        val body = mapper.writeValueAsString(java.util.Map.of(
          "Statement", stmt)) // placeholder replaced below for params
        val fullBody =
          if (params.result().isEmpty) body
          else s"""{"Statement":${mapper.writeValueAsString(stmt)},"Parameters":[${params.result().mkString(",")}]}"""
        val resp = signedPost(c, e, c0, "dynamodb", "/", fullBody,
          Map("X-Amz-Target" -> "DynamoDB_20120810.ExecuteStatement",
            "Content-Type" -> "application/x-amz-json-1.0"))
        if (resp.status < 200 || resp.status > 299)
          vals(eIdx) = s"dynamodb: HTTP ${resp.status} ${resp.body.take(120)}"
        else vals(vIdx) = resp.body
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
    out.drop("__pq_args")
  }

  /** Loopback dynamodb executing the PartiQL subset the processor
    * corpus uses: `SELECT <cols|*> FROM "table" WHERE k = ?` and
    * `INSERT INTO "table" VALUE {'k': ?, 'v': ?}`.
    */
  final class MemDynamo(creds: Credentials) {
    private val mapper = new ObjectMapper()
    val tables: mutable.LinkedHashMap[String,
      mutable.LinkedHashMap[String, Map[String, String]]] =
      mutable.LinkedHashMap.empty
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      verifySig(q, creds, "dynamodb") match {
        case Some(_) => rejected += 1
          return Http.Response(403, """{"__type":"AccessDenied"}""")
        case None => ()
      }
      if (!q.headers.get("X-Amz-Target")
            .contains("DynamoDB_20120810.ExecuteStatement"))
        return Http.Response(400, """{"__type":"UnknownOperation"}""")
      val root = mapper.readTree(q.body)
      val stmt = root.path("Statement").asText
      val params = {
        val out = Seq.newBuilder[String]
        root.path("Parameters").forEach { p =>
          out += (if (p.has("S")) p.path("S").asText
                  else p.path("N").asText)
        }
        out.result()
      }
      val InsertRe =
        """(?i)INSERT INTO "(\w+)" VALUE \{'(\w+)':\s*\?,\s*'(\w+)':\s*\?\}""".r
      val SelectRe =
        """(?i)SELECT \* FROM "(\w+)" WHERE (\w+) = \?""".r
      stmt match {
        case InsertRe(table, kCol, vCol) =>
          tables.getOrElseUpdate(table, mutable.LinkedHashMap.empty)
            .update(params(0), Map(kCol -> params(0), vCol -> params(1)))
          Http.Response(200, """{"Items":[]}""")
        case SelectRe(table, _) =>
          tables.getOrElse(table, mutable.LinkedHashMap.empty)
            .get(params(0)) match {
            case Some(item) =>
              val fields = item.map { case (k, v) =>
                s""""$k":{"S":${mapper.writeValueAsString(v)}}"""
              }.mkString(",")
              Http.Response(200, s"""{"Items":[{$fields}]}""")
            case None => Http.Response(200, """{"Items":[]}""")
          }
        case other => Http.Response(400,
          s"""{"__type":"ValidationException","message":"unsupported: ${other.take(60)}"}""")
      }
    }
  }

  // ───────────────────────── aws_sns ───────────────────────────

  /** Publish one message per row via the Query API form body. */
  def snsWrite(df: DataFrame, endpoint: String, creds: Credentials,
               topicArn: String, client: Http.Client = null): Unit = {
    val (e, c0, arn) = (endpoint, creds, topicArn)
    val clientV = client
    df.select(col("value").cast("string")).rdd.foreachPartition { it =>
      val c = Option(clientV).getOrElse(resolveClient(e))
      it.foreach { r =>
        val body = "Action=Publish&Version=2010-03-31" +
          s"&TopicArn=${java.net.URLEncoder.encode(arn, "UTF-8")}" +
          s"&Message=${java.net.URLEncoder.encode(r.getString(0), "UTF-8")}"
        val resp = signedPost(c, e, c0, "sns", "/", body,
          Map("Content-Type" -> "application/x-www-form-urlencoded"))
        if (resp.status != 200) throw new IllegalStateException(
          s"sns publish: ${resp.status} ${resp.body.take(200)}")
      }
    }
  }

  final class MemSns(creds: Credentials) {
    val published: mutable.ArrayBuffer[(String, String)] =
      mutable.ArrayBuffer.empty // (topicArn, message)
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      verifySig(q, creds, "sns") match {
        case Some(_) => rejected += 1; return Http.Response(403, "denied")
        case None => ()
      }
      val form = q.body.split("&").map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      if (!form.get("Action").contains("Publish"))
        return Http.Response(400, "<Error/>")
      published += ((form("TopicArn"), form("Message")))
      Http.Response(200,
        s"""<PublishResponse><PublishResult><MessageId>m-${published.size}</MessageId></PublishResult></PublishResponse>""")
    }
  }

  // ─────────────────── shared verification ─────────────────────

  private[graft] def verifySig(q: Http.Request, creds: Credentials,
                               service: String): Option[String] = {
    val auth = q.headers.getOrElse("Authorization", return Some("no auth"))
    val amzDate = q.headers.getOrElse("x-amz-date", return Some("no date"))
    val payload = Option(q.bodyBytes).getOrElse(q.body.getBytes(UTF_8))
    if (!q.headers.get("x-amz-content-sha256")
          .contains(SigV4.sha256Hex(payload)))
      return Some("payload hash mismatch")
    val afterScheme = q.url.stripPrefix("mem://")
    val path = afterScheme.substring(afterScheme.indexOf('/'))
      .takeWhile(_ != '?')
    val host = afterScheme.takeWhile(_ != '/')
    val signedExtra = q.headers
      .filter { case (k, _) => k.equalsIgnoreCase("X-Amz-Target") ||
        k.equalsIgnoreCase("Content-Type") }
      .map { case (k, v) => k.toLowerCase -> v }
    val expected = SigV4.sign(creds, service, q.verb, path, Map.empty,
      signedExtra + ("host" -> host), payload, amzDate)
    if (auth != expected.authorization) Some("signature mismatch")
    else None
  }

  private val lambdas =
    new java.util.concurrent.ConcurrentHashMap[String, MemLambda]()
  private val dynamos =
    new java.util.concurrent.ConcurrentHashMap[String, MemDynamo]()
  private val sns =
    new java.util.concurrent.ConcurrentHashMap[String, MemSns]()

  def registerLambda(name: String, creds: Credentials,
                     transform: String => String): MemLambda =
    lambdas.computeIfAbsent(name, _ => new MemLambda(creds, transform))
  def registerDynamo(name: String, creds: Credentials): MemDynamo =
    dynamos.computeIfAbsent(name, _ => new MemDynamo(creds))
  def registerSns(name: String, creds: Credentials): MemSns =
    sns.computeIfAbsent(name, _ => new MemSns(creds))
  def drop(name: String): Unit = {
    lambdas.remove(name); dynamos.remove(name); sns.remove(name); ()
  }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => reqs.map { r =>
        Option(lambdas.get(name)).map(_.handle(r))
          .orElse(Option(dynamos.get(name)).map(_.handle(r)))
          .orElse(Option(sns.get(name)).map(_.handle(r)))
          .getOrElse(Http.Response(404, "no such service"))
      }
    } else Http.javaClient()
}
