package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `gcp_cloud_storage` input/output (internal/impl/gcp — contract
  * only, no code ported: the reference wraps the official client;
  * this speaks the PUBLIC Cloud Storage JSON API directly):
  *
  *   - upload: `POST /upload/storage/v1/b/{bucket}/o?uploadType=
  *     media&name={object}` (URL-encoded object names);
  *   - read: `GET /storage/v1/b/{bucket}/o/{object}?alt=media`;
  *   - list: `GET /storage/v1/b/{bucket}/o?prefix=…&maxResults=…`
  *     with `items[].name` + `nextPageToken` PAGINATION walked to
  *     exhaustion;
  *   - auth: `Authorization: Bearer <token>` on every call, checked
  *     by the loopback service.
  *
  * Input: one message per object (`gcs_key` / `gcs_bucket` metadata),
  * per-object reads fanned across partitions; output: one upload per
  * message at the interpolated path.
  */
object Gcs {

  final class Client(endpoint: String, token: String,
                     client: Http.Client = null) extends Serializable {
    @transient private lazy val c =
      Option(client).getOrElse(resolveClient(endpoint))
    private val base = endpoint.stripSuffix("/")
    private def auth = Map("Authorization" -> s"Bearer $token")
    private def enc(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

    def upload(bucket: String, name: String, body: Array[Byte]): Unit = {
      val r = c(Seq(Http.Request(
        s"$base/upload/storage/v1/b/$bucket/o?uploadType=media&name=${enc(name)}",
        "POST", auth + ("Content-Type" -> "application/octet-stream"),
        new String(body, UTF_8), bodyBytes = body))).head
      if (r.status != 200) throw new IllegalStateException(
        s"gcs upload $name: ${r.status} ${r.body.take(200)}")
    }

    def download(bucket: String, name: String): Array[Byte] = {
      val r = c(Seq(Http.Request(
        s"$base/storage/v1/b/$bucket/o/${enc(name)}?alt=media",
        "GET", auth, ""))).head
      if (r.status != 200) throw new IllegalStateException(
        s"gcs get $name: ${r.status} ${r.body.take(200)}")
      r.body.getBytes(UTF_8)
    }

    def delete(bucket: String, name: String): Unit = {
      val r = c(Seq(Http.Request(
        s"$base/storage/v1/b/$bucket/o/${enc(name)}",
        "DELETE", auth, ""))).head
      if (r.status != 204) throw new IllegalStateException(
        s"gcs delete $name: ${r.status}")
    }

    def list(bucket: String, prefix: String = "",
             maxResults: Int = 1000): Seq[String] = {
      val mapper = new ObjectMapper()
      val out = mutable.ArrayBuffer.empty[String]
      var token0: Option[String] = None
      var more = true
      while (more) {
        val page = token0.map(t => s"&pageToken=${enc(t)}").getOrElse("")
        val r = c(Seq(Http.Request(
          s"$base/storage/v1/b/$bucket/o?prefix=${enc(prefix)}&maxResults=$maxResults$page",
          "GET", auth, ""))).head
        if (r.status != 200) throw new IllegalStateException(
          s"gcs list: ${r.status} ${r.body.take(200)}")
        val root = mapper.readTree(r.body)
        root.path("items").forEach(i => out += i.path("name").asText)
        val next = root.path("nextPageToken").asText("")
        token0 = if (next.nonEmpty) Some(next) else None
        more = token0.nonEmpty
      }
      out.toSeq
    }
  }

  def read(spark: SparkSession, endpoint: String, token: String,
           bucket: String, prefix: String = "",
           maxResultsPerPage: Int = 1000): DataFrame = {
    val names = new Client(endpoint, token)
      .list(bucket, prefix, maxResultsPerPage)
    val (e, t, bk) = (endpoint, token, bucket)
    import spark.implicits._
    names.toDF("name")
      .repartition(math.max(1, math.min(names.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val c = new Client(e, t)
        it.map { r =>
          val n = r.getString(0)
          (new String(c.download(bk, n), UTF_8),
            Map("gcs_key" -> n, "gcs_bucket" -> bk))
        }
      }.toDF("value", "metadata")
      .withColumn("error", lit(null).cast("string"))
  }

  def write(df: DataFrame, endpoint: String, token: String,
            bucket: String, pathCol: Column): Unit = {
    val (e, t, bk) = (endpoint, token, bucket)
    df.select(pathCol.cast("string").as("p"),
        col("value").cast("string").as("v"))
      .rdd.foreachPartition { it =>
        val c = new Client(e, t)
        it.foreach(r =>
          c.upload(bk, r.getString(0), r.getString(1).getBytes(UTF_8)))
      }
  }

  // ---- in-memory JSON-API service (mem://name) ----

  final class MemGcs(expectedToken: String) {
    val buckets: mutable.LinkedHashMap[String,
      mutable.TreeMap[String, Array[Byte]]] = mutable.LinkedHashMap.empty
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      if (!q.headers.get("Authorization")
            .contains(s"Bearer $expectedToken")) {
        rejected += 1
        return Http.Response(401, """{"error":{"code":401}}""")
      }
      val afterScheme = q.url.stripPrefix("mem://")
      val pathAndQuery = afterScheme.substring(afterScheme.indexOf('/'))
      val (path, rawQuery) = pathAndQuery.span(_ != '?')
      val query = rawQuery.drop(1).split("&").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      def store(bucket: String) = buckets.getOrElseUpdate(bucket,
        mutable.TreeMap.empty[String, Array[Byte]])
      if (path.startsWith("/upload/storage/v1/b/")) {
        val bucket = path.stripPrefix("/upload/storage/v1/b/")
          .stripSuffix("/o")
        if (!query.get("uploadType").contains("media"))
          return Http.Response(400, """{"error":"uploadType"}""")
        val name = query.getOrElse("name",
          return Http.Response(400, """{"error":"name required"}"""))
        store(bucket).update(name,
          Option(q.bodyBytes).getOrElse(q.body.getBytes(UTF_8)))
        Http.Response(200, s"""{"name":"$name","bucket":"$bucket"}""")
      } else if (path.startsWith("/storage/v1/b/")) {
        val rest = path.stripPrefix("/storage/v1/b/")
        val parts = rest.split("/o", 2)
        val bucket = parts(0)
        val objPart = if (parts.length > 1)
          parts(1).stripPrefix("/") else ""
        if (objPart.isEmpty) { // list
          val prefix = query.getOrElse("prefix", "")
          val maxResults = query.getOrElse("maxResults", "1000").toInt
          val all = store(bucket).keysIterator
            .filter(_.startsWith(prefix)).toSeq
          val after = query.get("pageToken") match {
            case Some(t) => all.dropWhile(_ <= t)
            case None => all
          }
          val page = after.take(maxResults)
          val items = page.map(n =>
            s"""{"name":"${n.replace("\"", "\\\"")}"}""").mkString(",")
          val next = if (after.size > maxResults)
            s""","nextPageToken":"${page.last}"""" else ""
          Http.Response(200, s"""{"items":[$items]$next}""")
        } else {
          val name = java.net.URLDecoder.decode(objPart, "UTF-8")
          q.verb match {
            case "GET" if query.get("alt").contains("media") =>
              store(bucket).get(name) match {
                case Some(b) => Http.Response(200, new String(b, UTF_8))
                case None => Http.Response(404,
                  """{"error":{"code":404}}""")
              }
            case "DELETE" =>
              store(bucket).remove(name)
              Http.Response(204, "")
            case other => Http.Response(400,
              s"""{"error":"unsupported $other"}""")
          }
        }
      } else Http.Response(404, s"""{"error":"no handler for $path"}""")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemGcs]()

  def register(name: String, token: String): MemGcs =
    registry.computeIfAbsent(name, _ => new MemGcs(token))
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(r => Option(registry.get(name)) match {
      case Some(svc) => svc.handle(r)
      case None => Http.Response(404, "no such project")
    })

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
