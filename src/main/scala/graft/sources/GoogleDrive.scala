package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `google_drive_search` / `google_drive_download` processors
  * (internal/impl/google — contract only, no code ported: the
  * reference wraps the official client; this speaks the PUBLIC Drive
  * v3 REST API directly):
  *
  *   - search: `GET /drive/v3/files?q=…&fields=files(id,name,
  *     mimeType,…)&pageSize=…` with `nextPageToken` pagination
  *     walked to exhaustion; each message is REPLACED by the JSON
  *     array of matching file resources (the reference's default
  *     projection: id/name/mimeType/size);
  *   - download: `GET /drive/v3/files/{id}?alt=media` — the message
  *     becomes the file body;
  *   - bearer auth per request, checked by the loopback service.
  */
object GoogleDrive {

  final class Client(endpoint: String, token: String,
                     client: Http.Client = null) extends Serializable {
    @transient private lazy val c =
      Option(client).getOrElse(resolveClient(endpoint))
    @transient private lazy val mapper = new ObjectMapper()
    private val base = endpoint.stripSuffix("/")
    private def auth = Map("Authorization" -> s"Bearer $token")
    private def enc(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

    /** files.list with pagination; returns raw file-resource JSON. */
    def search(query: String, fields: Seq[String],
               pageSize: Int = 100): Seq[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var pageToken = ""
      var more = true
      val proj = s"nextPageToken,files(${fields.mkString(",")})"
      while (more) {
        val page = if (pageToken.isEmpty) ""
                   else s"&pageToken=${enc(pageToken)}"
        val r = c(Seq(Http.Request(
          s"$base/drive/v3/files?q=${enc(query)}&fields=${enc(proj)}&pageSize=$pageSize$page",
          "GET", auth, ""))).head
        if (r.status != 200) throw new IllegalStateException(
          s"drive search: ${r.status} ${r.body.take(200)}")
        val root = mapper.readTree(r.body)
        root.path("files").forEach(f => out += f.toString)
        pageToken = root.path("nextPageToken").asText("")
        more = pageToken.nonEmpty
      }
      out.toSeq
    }

    /** files.listLabels — the label resources attached to a file. */
    def listLabels(fileId: String): Seq[String] = {
      val r = c(Seq(Http.Request(
        s"$base/drive/v3/files/${enc(fileId)}/listLabels", "GET", auth,
        ""))).head
      if (r.status != 200) throw new IllegalStateException(
        s"drive listLabels $fileId: ${r.status} ${r.body.take(200)}")
      val out = Seq.newBuilder[String]
      mapper.readTree(r.body).path("labels").forEach(l => out += l.toString)
      out.result()
    }

    def download(fileId: String): String = {
      val r = c(Seq(Http.Request(
        s"$base/drive/v3/files/${enc(fileId)}?alt=media", "GET", auth,
        ""))).head
      if (r.status != 200) throw new IllegalStateException(
        s"drive download $fileId: ${r.status} ${r.body.take(200)}")
      r.body
    }
  }

  /** search processor: message → file-resource array. */
  def searchProcessor(df0: DataFrame, endpoint: String, token: String,
                      queryCol: Column,
                      fields: Seq[String] =
                        Seq("id", "name", "mimeType", "size"),
                      pageSize: Int = 100,
                      client: Http.Client = null): DataFrame = {
    val df = Envelope.ensure(df0).withColumn("__gq", queryCol.cast("string"))
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val qIdx = schema.fieldIndex("__gq")
    val (e, t, fs, ps) = (endpoint, token, fields, pageSize)
    val clientV = client
    val out = df.mapPartitions { it =>
      val cl = new Client(e, t, clientV)
      it.map { row =>
        val vals = row.toSeq.toArray
        try vals(vIdx) =
          cl.search(row.getString(qIdx), fs, ps).mkString("[", ",", "]")
        catch {
          case ex: Exception =>
            vals(eIdx) = Option(ex.getMessage).getOrElse("drive error")
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
    out.drop("__gq")
  }

  /** download processor: file id → body as the new content. */
  def downloadProcessor(df0: DataFrame, endpoint: String, token: String,
                        fileIdCol: Column,
                        client: Http.Client = null): DataFrame = {
    val df = Envelope.ensure(df0)
      .withColumn("__gid", fileIdCol.cast("string"))
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val idIdx = schema.fieldIndex("__gid")
    val (e, t) = (endpoint, token)
    val clientV = client
    val out = df.mapPartitions { it =>
      val cl = new Client(e, t, clientV)
      it.map { row =>
        val vals = row.toSeq.toArray
        try vals(vIdx) = cl.download(row.getString(idIdx))
        catch {
          case ex: Exception =>
            vals(eIdx) = Option(ex.getMessage).getOrElse("drive error")
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
    out.drop("__gid")
  }

  // ── in-memory drive (mem://name): name-contains query subset ──

  /** Files (id → name, mimeType, body); executes the Drive query
    * subset `name contains '<text>'` (and the empty query = all).
    */
  final class MemDrive(expectedToken: String, pageSize: Int = 100) {
    private val mapper = new ObjectMapper()
    val files: mutable.LinkedHashMap[String, (String, String, String)] =
      mutable.LinkedHashMap.empty // id → (name, mimeType, body)
    val labels: mutable.LinkedHashMap[String, Seq[String]] =
      mutable.LinkedHashMap.empty // id → label-resource JSON
    @volatile var rejected = 0

    def add(id: String, name: String, mimeType: String,
            body: String): Unit =
      synchronized { files(id) = (name, mimeType, body) }

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
      if (path == "/drive/v3/files") {
        val qStr = query.getOrElse("q", "")
        val Re = """name contains '([^']*)'""".r
        val matches = files.toSeq.filter { case (_, (name, _, _)) =>
          Re.findFirstMatchIn(qStr) match {
            case Some(m) => name.contains(m.group(1))
            case None => qStr.isEmpty
          }
        }
        val offset = query.get("pageToken").map(_.toInt).getOrElse(0)
        val size = query.get("pageSize").map(_.toInt).getOrElse(pageSize)
        val page = matches.slice(offset, offset + size)
        val items = page.map { case (id, (name, mt, body)) =>
          s"""{"id":"$id","name":${mapper.writeValueAsString(name)},"mimeType":"$mt","size":"${body.length}"}"""
        }.mkString(",")
        val next = if (offset + size < matches.size)
          s""","nextPageToken":"${offset + size}"""" else ""
        Http.Response(200, s"""{"files":[$items]$next}""")
      } else if (path.startsWith("/drive/v3/files/") &&
                 path.endsWith("/listLabels")) {
        val id = java.net.URLDecoder.decode(
          path.stripPrefix("/drive/v3/files/")
            .stripSuffix("/listLabels"), "UTF-8")
        if (!files.contains(id))
          Http.Response(404, """{"error":{"code":404}}""")
        else Http.Response(200,
          s"""{"labels":[${labels.getOrElse(id, Nil).mkString(",")}]}""")
      } else if (path.startsWith("/drive/v3/files/") &&
                 query.get("alt").contains("media")) {
        val id = java.net.URLDecoder.decode(
          path.stripPrefix("/drive/v3/files/"), "UTF-8")
        files.get(id) match {
          case Some((_, _, body)) => Http.Response(200, body)
          case None => Http.Response(404, """{"error":{"code":404}}""")
        }
      } else Http.Response(400, s"""{"error":"no handler for $path"}""")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemDrive]()

  def register(name: String, token: String,
               pageSize: Int = 100): MemDrive =
    registry.computeIfAbsent(name, _ => new MemDrive(token, pageSize))
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(r => Option(registry.get(name)) match {
      case Some(svc) => svc.handle(r)
      case None => Http.Response(404, "no such drive")
    })

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
