package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `timeplus` input/output (internal/impl/timeplus — contract only,
  * no code ported: the REST + SSE shapes are the public API):
  *
  *   - output: `POST …/ingest` with `{"columns":[…],"data":[[…],…]}`
  *     — the path differs per target: Timeplus Enterprise uses
  *     `{workspace}/api/v1beta2/streams/{stream}/ingest`, timeplusd
  *     uses `timeplusd/v1/ingest/streams/{stream}` (http/client.go:62)
  *     — with `X-Api-Key` auth;
  *   - input: `POST {workspace}/api/v1beta2/queries {"sql":…}`
  *     answered as an SSE stream (`text/event-stream`): the FIRST
  *     event is `event: query` with `{result:{header:[{name,type}]}}`
  *     metadata, then unnamed events whose data is a JSON ARRAY OF
  *     ROW ARRAYS — each element one message keyed by the header
  *     columns (http/sse.go:131-137).
  *
  * [[Sse.parse]] implements the text/event-stream framing (multiple
  * `data:` lines join with \n, `event:` names, comment lines, blank-
  * line dispatch).
  *
  * Scale shape: ingest POSTs chunk per partition; the query input is
  * driver admission of one SSE stream (single cursor), distributed
  * after materialization.
  */
object Timeplus {

  /** text/event-stream framing. */
  object Sse {
    final case class Event(name: String, data: String)

    def parse(body: String): Seq[Event] = {
      val out = mutable.ArrayBuffer.empty[Event]
      var name = ""
      val data = mutable.ArrayBuffer.empty[String]
      def dispatch(): Unit = {
        if (data.nonEmpty) out += Event(name, data.mkString("\n"))
        name = ""
        data.clear()
      }
      body.split("\n", -1).foreach { raw =>
        val line = raw.stripSuffix("\r")
        if (line.isEmpty) dispatch()
        else if (line.startsWith(":")) () // comment
        else {
          val (field, value) = line.span(_ != ':')
          val v = value.drop(1).stripPrefix(" ")
          field match {
            case "event" => name = v
            case "data" => data += v
            case _ => () // id/retry ignored
          }
        }
      }
      dispatch()
      out.toSeq
    }

    def render(events: Seq[Event]): String =
      events.map { e =>
        val nameLine = if (e.name.isEmpty) "" else s"event: ${e.name}\n"
        nameLine + e.data.split("\n", -1).map(d => s"data: $d")
          .mkString("\n") + "\n\n"
      }.mkString
  }

  def ingestPath(target: String, workspace: String, stream: String): String =
    if (target == "timeplusd") s"/timeplusd/v1/ingest/streams/$stream"
    else s"/$workspace/api/v1beta2/streams/$stream/ingest"

  def queryPath(workspace: String): String =
    s"/$workspace/api/v1beta2/queries"

  private def authHeaders(apikey: String): Map[String, String] =
    (if (apikey.nonEmpty) Map("X-Api-Key" -> apikey)
     else Map.empty[String, String]) ++
      Map("Content-Type" -> "application/json")

  /** JSON-envelope rows → columnar ingest POSTs. `columns` fixes the
    * projection (the reference takes them from the message fields).
    */
  def write(df: DataFrame, url: String, stream: String,
            columns: Seq[String], target: String = "timeplus",
            workspace: String = "default", apikey: String = "",
            batchSize: Int = 500, client: Http.Client = null): Unit = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val endpoint = url.stripSuffix("/") + ingestPath(target, workspace, stream)
    val headers = authHeaders(apikey)
    val cols = columns
    df.select(col("value").cast("string")).rdd.foreachPartition { it =>
      val mapper = new ObjectMapper()
      it.grouped(batchSize).foreach { rows =>
        val data = rows.map { r =>
          val doc = mapper.readTree(r.getString(0))
          cols.map(c => Option(doc.get(c)).map(_.toString).getOrElse("null"))
            .mkString("[", ",", "]")
        }.mkString(",")
        val colJson = cols.map("\"" + _ + "\"").mkString(",")
        val resp = resolved(Seq(Http.Request(endpoint, "POST", headers,
          s"""{"columns":[$colJson],"data":[$data]}"""))).head
        if (resp.status < 200 || resp.status > 299)
          throw new IllegalStateException(
            s"timeplus ingest rejected (${resp.status}): ${resp.body.take(200)}")
      }
    }
  }

  /** Run a query over the SSE surface; one message per row, fields
    * keyed by the header columns.
    */
  def read(spark: SparkSession, url: String, sql: String,
           workspace: String = "default", apikey: String = "",
           client: Http.Client = null): DataFrame = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val resp = resolved(Seq(Http.Request(
      url.stripSuffix("/") + queryPath(workspace), "POST",
      authHeaders(apikey), s"""{"sql":${quote(sql)}}"""))).head
    if (resp.status < 200 || resp.status > 299)
      throw new IllegalStateException(
        s"timeplus query failed (${resp.status}): ${resp.body.take(200)}")
    val events = Sse.parse(resp.body)
    require(events.headOption.exists(_.name == "query"),
      s"timeplus: expected 'query' metadata event first")
    val mapper = new ObjectMapper()
    val header = {
      val out = Seq.newBuilder[String]
      mapper.readTree(events.head.data).path("result").path("header")
        .forEach(c => out += c.path("name").asText)
      out.result()
    }
    val rows = events.tail.filter(_.name.isEmpty).flatMap { e =>
      val arr = mapper.readTree(e.data)
      val out = Seq.newBuilder[String]
      arr.forEach { row =>
        val fields = header.zipWithIndex.map { case (h, i) =>
          s"""${quote(h)}:${row.get(i)}"""
        }.mkString(",")
        out += s"{$fields}"
      }
      out.result()
    }
    import spark.implicits._
    rows.toDF("value")
      .withColumn("metadata", map().cast("map<string,string>"))
      .withColumn("error", lit(null).cast("string"))
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // ---- in-memory service (mem://name) ----

  /** Ingest + query endpoints: streams hold columnar rows; a
    * `select * from <stream>` query streams them back as the
    * documented SSE event sequence.
    */
  final class MemTimeplus {
    private val mapper = new ObjectMapper()
    val streams: mutable.LinkedHashMap[String,
      (Seq[String], mutable.ArrayBuffer[Seq[String]])] =
      mutable.LinkedHashMap.empty
    @volatile var lastApiKey: String = ""

    def handle(q: Http.Request): Http.Response = synchronized {
      lastApiKey = q.headers.getOrElse("X-Api-Key", "")
      val afterScheme = q.url.stripPrefix("mem://")
      val path = afterScheme.substring(afterScheme.indexOf('/'))
      if (path.contains("/ingest")) {
        val stream = path.split("/").filter(_.nonEmpty) match {
          case parts if path.contains("/timeplusd/") => parts.last
          case parts => parts(parts.indexOf("streams") + 1)
        }
        val root = mapper.readTree(q.body)
        val cols = {
          val out = Seq.newBuilder[String]
          root.path("columns").forEach(c => out += c.asText)
          out.result()
        }
        val (_, buf) = streams.getOrElseUpdate(stream,
          (cols, mutable.ArrayBuffer.empty))
        root.path("data").forEach { row =>
          val vals = Seq.newBuilder[String]
          row.forEach(v => vals += v.toString)
          buf += vals.result()
        }
        Http.Response(200, "{}")
      } else if (path.endsWith("/queries")) {
        val sql = mapper.readTree(q.body).path("sql").asText
        val m = """(?i)select\s+\*\s+from\s+(?:table\()?(\w+)\)?""".r
          .findFirstMatchIn(sql)
        m.flatMap(mm => streams.get(mm.group(1))) match {
          case None => Http.Response(404,
            s"""{"error":"unknown stream in: $sql"}""")
          case Some((cols, rows)) =>
            val headerJson = cols.map(c =>
              s"""{"name":"$c","type":"string"}""").mkString(",")
            val meta = Timeplus.Sse.Event("query",
              s"""{"result":{"header":[$headerJson]}}""")
            // rows batch into SSE events of ≤100 (multiple messages
            // per event — the contract the input must unpack)
            val dataEvents = rows.grouped(100).map { chunk =>
              Timeplus.Sse.Event("",
                chunk.map(_.mkString("[", ",", "]"))
                  .mkString("[", ",", "]"))
            }.toSeq
            Http.Response(200, Timeplus.Sse.render(meta +: dataEvents),
              Map("content-type" -> "text/event-stream"))
        }
      } else Http.Response(404, s"""{"error":"no handler for $path"}""")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemTimeplus]()
  def named(name: String): MemTimeplus =
    registry.computeIfAbsent(name, _ => new MemTimeplus)
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(named(name).handle)

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
