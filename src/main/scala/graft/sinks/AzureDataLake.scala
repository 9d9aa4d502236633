package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Http
import graft.sources.AzureBlob
import graft.sources.AzureBlob.Account

/** `azure_data_lake_gen2` output (reference doc
  * outputs/azure_data_lake_gen2.adoc; SDK-ridden — contract only):
  * message batches land as files under an interpolated
  * `filesystem`/`path` via the PUBLIC DFS endpoint's three-step
  * protocol — `PUT ?resource=file` (create), `PATCH ?action=append&
  * position=N` (staged, UNCOMMITTED bytes), `PATCH ?action=flush&
  * position=N` (commit, position must equal the staged length) —
  * authorized with the Blob-service Shared Key the repo already
  * derives (AzureBlob.SharedKey), re-derived by the loopback.
  * The append/flush split is real Gen2 semantics: bytes are invisible
  * to readers until the flush commits them, and a flush at the wrong
  * position fails — both pinned by the spec.
  *
  * Scale shape: rows group by their interpolated path inside each
  * partition and upload per file over the task's own connection.
  */
object AzureDataLake {

  final class Client(endpoint: String, acct: Account,
                     client: Http.Client = null) extends Serializable {
    @transient private lazy val c =
      Option(client).getOrElse(resolveClient(endpoint))
    private val base = endpoint.stripSuffix("/")

    private def msDate(): String =
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())

    private def request(verb: String, path: String,
                        query: Map[String, String],
                        body: Array[Byte]): Http.Response = {
      val headers = Map(
        "x-ms-date" -> msDate(),
        "x-ms-version" -> "2021-08-06",
        "Content-Length" -> body.length.toString)
      val auth = AzureBlob.SharedKey.authorization(acct, verb, headers,
        path, query)
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

    def createFile(fs: String, path: String): Unit = {
      val r = request("PUT", s"/$fs/$path", Map("resource" -> "file"),
        Array.empty)
      if (r.status != 201) throw new IllegalStateException(
        s"adls create $path: ${r.status} ${r.body.take(200)}")
    }

    def append(fs: String, path: String, data: Array[Byte],
               position: Long): Unit = {
      val r = request("PATCH", s"/$fs/$path",
        Map("action" -> "append", "position" -> position.toString), data)
      if (r.status != 202) throw new IllegalStateException(
        s"adls append $path@$position: ${r.status} ${r.body.take(200)}")
    }

    def flush(fs: String, path: String, position: Long): Unit = {
      val r = request("PATCH", s"/$fs/$path",
        Map("action" -> "flush", "position" -> position.toString),
        Array.empty)
      if (r.status != 200) throw new IllegalStateException(
        s"adls flush $path@$position: ${r.status} ${r.body.take(200)}")
    }

    def readFile(fs: String, path: String): Array[Byte] = {
      val r = request("GET", s"/$fs/$path", Map.empty, Array.empty)
      if (r.status != 200) throw new IllegalStateException(
        s"adls read $path: ${r.status}")
      r.body.getBytes(UTF_8)
    }

    def listPaths(fs: String): Seq[String] = {
      val r = request("GET", s"/$fs",
        Map("resource" -> "filesystem", "recursive" -> "true"), Array.empty)
      if (r.status != 200) throw new IllegalStateException(
        s"adls list: ${r.status}")
      val m = new ObjectMapper()
      m.readTree(r.body).path("paths").elements().asScala
        .map(_.path("name").asText).toVector
    }

    /** Full upload: create + chunked appends + one committing flush. */
    def upload(fs: String, path: String, data: Array[Byte],
               chunk: Int = 4 * 1024 * 1024): Unit = {
      createFile(fs, path)
      var pos = 0L
      data.grouped(chunk).foreach { part =>
        append(fs, path, part, pos)
        pos += part.length
      }
      flush(fs, path, pos)
    }
  }

  /** Write rows as files: within each partition, rows group by their
    * interpolated `pathCol` (a DIRECTORY), and each group becomes one
    * uniquely-named newline-delimited file under it — the reference's
    * batch-per-file layout, collision-free across parallel tasks.
    */
  def write(df: DataFrame, endpoint: String, acct: Account,
            filesystem: String, pathCol: Column,
            valueCol: Column = col("value"),
            client: Http.Client = null): Unit = {
    val prepared = df.select(pathCol.cast("string").as("p"),
      valueCol.cast("string").as("v"))
    val (e, a, fs) = (endpoint, acct, filesystem)
    val clientV = client
    prepared.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val cl = new Client(e, a, clientV)
        rows.toSeq.groupBy(_.getString(0)).foreach { case (dir, rs) =>
          val body = rs.map(_.getString(1)).mkString("", "\n", "\n")
            .getBytes(UTF_8)
          cl.upload(fs, s"$dir/graft-${java.util.UUID.randomUUID}.jsonl",
            body)
        }
      }
    }
  }

  /** Loopback DFS endpoint: Shared Key re-derivation + the real
    * append/flush commit protocol (uncommitted bytes invisible,
    * position checks enforced).
    */
  final class MemDfs(acct: Account) {
    final case class FileState(
      committed: mutable.ArrayBuffer[Byte] = mutable.ArrayBuffer.empty,
      pending: mutable.TreeMap[Long, Array[Byte]] = mutable.TreeMap.empty)
    /** filesystem → path → state */
    val files: mutable.LinkedHashMap[(String, String), FileState] =
      mutable.LinkedHashMap.empty
    @volatile var rejected = 0

    def committedBytes(fs: String, path: String): Option[Array[Byte]] =
      synchronized { files.get((fs, path)).map(_.committed.toArray) }

    def handle(q: Http.Request): Http.Response = synchronized {
      val afterScheme = q.url.stripPrefix("mem://")
      val pathAndQuery = afterScheme.dropWhile(_ != '/')
      val path = pathAndQuery.takeWhile(_ != '?')
      val query = pathAndQuery.dropWhile(_ != '?').stripPrefix("?")
        .split("&").filter(_.nonEmpty).map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      val expected = AzureBlob.SharedKey.authorization(acct, q.verb,
        q.headers - "Authorization", path, query)
      if (!q.headers.get("Authorization").contains(expected)) {
        rejected += 1
        return Http.Response(403, """{"error":{"code":"AuthenticationFailed"}}""")
      }
      val segs = path.stripPrefix("/").split("/", 2)
      val fs = segs(0)
      val rel = if (segs.length > 1) segs(1) else ""
      val payload = Option(q.bodyBytes).getOrElse(q.body.getBytes(UTF_8))
      (q.verb, query.get("resource"), query.get("action")) match {
        case ("PUT", Some("file"), _) =>
          files((fs, rel)) = FileState()
          Http.Response(201, "")
        case ("PATCH", _, Some("append")) =>
          val st = files.getOrElse((fs, rel),
            return Http.Response(404, """{"error":{"code":"PathNotFound"}}"""))
          st.pending(query("position").toLong) = payload
          Http.Response(202, "")
        case ("PATCH", _, Some("flush")) =>
          val st = files.getOrElse((fs, rel),
            return Http.Response(404, """{"error":{"code":"PathNotFound"}}"""))
          val target = query("position").toLong
          // commit pending chunks contiguous from the committed length
          var pos = st.committed.size.toLong
          while (st.pending.contains(pos)) {
            val chunk = st.pending.remove(pos).get
            st.committed ++= chunk
            pos += chunk.length
          }
          if (pos != target)
            Http.Response(400,
              """{"error":{"code":"InvalidFlushPosition"}}""")
          else Http.Response(200, "")
        case ("GET", Some("filesystem"), _) =>
          val names = files.keys.collect { case (f, p) if f == fs => p }
          Http.Response(200, names.map(n =>
            s"""{"name":"$n"}""").mkString("""{"paths":[""", ",", "]}"))
        case ("GET", _, _) =>
          files.get((fs, rel)) match {
            case Some(st) =>
              Http.Response(200, new String(st.committed.toArray, UTF_8))
            case None => Http.Response(404, "")
          }
        case other => Http.Response(400, s"unsupported: $other")
      }
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemDfs]()

  def register(name: String, acct: Account): MemDfs =
    registry.computeIfAbsent(name, _ => new MemDfs(acct))
  def drop(name: String): Unit = { registry.remove(name); () }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => reqs.map { r =>
        Option(registry.get(name)).map(_.handle(r))
          .getOrElse(Http.Response(404, "no such dfs"))
      }
    } else Http.javaClient()
}
