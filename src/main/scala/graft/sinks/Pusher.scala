package graft.sinks

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `pusher` output (internal/impl/pusher/output_pusher.go — contract
  * only, no code ported: the reference wraps the official client;
  * this speaks the PUBLIC Pusher Channels HTTP API directly):
  *
  *   `POST /apps/{app_id}/batch_events` with up to 10 triggers per
  *   request (the documented batch limit the reference surfaces as
  *   its max batch size), each `{channel, name, data}`.
  *
  * Authentication is the documented request signing: query params
  * `auth_key`, `auth_timestamp`, `auth_version=1.0`, `body_md5` (hex
  * MD5 of the JSON body), and `auth_signature` = hex
  * HMAC-SHA256(secret, "POST\n{path}\n{sorted query string}") — the
  * loopback service VERIFIES the signature byte-for-byte, so the
  * signing path is a tested contract, not decoration.
  *
  * Scale shape: 10-event batches per partition through the pluggable
  * [[Http.Client]] — executor-side fan-out.
  */
object Pusher {

  final case class Conf(appId: String, key: String, secret: String,
                        cluster: String, event: String)

  def hmacSha256Hex(secret: String, data: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Sign one request: returns the full query string (sorted keys —
    * the API requires lexicographic ordering before signing).
    */
  def signedQuery(conf: Conf, path: String, body: String,
                  timestampSec: Long): String = {
    val params = Seq(
      "auth_key" -> conf.key,
      "auth_timestamp" -> timestampSec.toString,
      "auth_version" -> "1.0",
      "body_md5" -> md5Hex(body)).sortBy(_._1)
    val qs = params.map { case (k, v) => s"$k=$v" }.mkString("&")
    val sig = hmacSha256Hex(conf.secret, s"POST\n$path\n$qs")
    s"$qs&auth_signature=$sig"
  }

  /** Publish each row's `value` as one event on its (interpolated)
    * channel, 10 per request.
    */
  def write(df: DataFrame, url: String, conf: Conf, channelCol: Column,
            client: Http.Client = null): Unit = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val base = url.stripSuffix("/")
    val c = conf
    df.select(channelCol.cast("string").as("ch"),
        col("value").cast("string").as("v"))
      .rdd.foreachPartition { it =>
        val mapper = new ObjectMapper()
        it.grouped(10).foreach { rows =>
          val batch = rows.map { r =>
            val data = mapper.writeValueAsString(r.getString(1))
            s"""{"channel":"${r.getString(0)}","name":"${c.event}","data":$data}"""
          }.mkString(",")
          val body = s"""{"batch":[$batch]}"""
          val path = s"/apps/${c.appId}/batch_events"
          val qs = signedQuery(c, path, body,
            System.currentTimeMillis() / 1000)
          val resp = resolved(Seq(Http.Request(s"$base$path?$qs", "POST",
            Map("Content-Type" -> "application/json"), body))).head
          if (resp.status != 200) throw new IllegalStateException(
            s"pusher returned ${resp.status}: ${resp.body.take(200)}")
        }
      }
  }

  // ---- in-memory channels service (mem://name) ----

  /** Verifies the signature exactly as the API does before accepting
    * events; stores (channel, name, data) in arrival order.
    */
  final class MemPusher(val secret: String) {
    private val mapper = new ObjectMapper()
    val events: mutable.ArrayBuffer[(String, String, String)] =
      mutable.ArrayBuffer.empty
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      val (pathPart, queryPart) = q.url.span(_ != '?')
      val path = pathPart.substring(pathPart.indexOf("/apps"))
      val params = queryPart.drop(1).split("&").map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
      val expectedQs = params.toSeq.filter(_._1 != "auth_signature")
        .sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
      val expectedSig = hmacSha256Hex(secret, s"POST\n$path\n$expectedQs")
      if (!params.get("auth_signature").contains(expectedSig) ||
          !params.get("body_md5").contains(md5Hex(q.body))) {
        rejected += 1
        return Http.Response(401, """{"error":"invalid signature"}""")
      }
      val root = mapper.readTree(q.body)
      val batch = root.path("batch")
      if (batch.size() > 10) {
        rejected += 1
        return Http.Response(400, """{"error":"batch too large"}""")
      }
      batch.forEach { e =>
        events += ((e.path("channel").asText, e.path("name").asText,
          e.path("data").asText))
      }
      Http.Response(200, "{}")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemPusher]()

  def named(name: String, secret: String = "s3cret"): MemPusher =
    registry.computeIfAbsent(name, _ => new MemPusher(secret))
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(r => Option(registry.get(name)) match {
      case Some(svc) => svc.handle(r)
      case None => Http.Response(404, "no such app")
    })

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
