package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `gcp_bigquery_select` processor/input
  * (internal/impl/gcp/processor_bigquery_select.go:97 — contract
  * only, no code ported: the reference wraps the official client;
  * this speaks the PUBLIC BigQuery REST API directly):
  *
  *   - `POST /bigquery/v2/projects/{project}/queries` with
  *     `{query, useLegacySql:false, parameterMode:"POSITIONAL",
  *     queryParameters:[{parameterType:{type},parameterValue:{value}}]}`;
  *   - responses carry `schema.fields[].name`, `rows[].f[].v`, and
  *     `pageToken` continuations fetched from
  *     `GET …/queries/{jobId}?pageToken=…` until drained;
  *   - query text builds from the reference's parts: `SELECT
  *     <columns> FROM <table> [WHERE …] [prefix/suffix]`;
  *   - bearer auth on every call, checked by the loopback service.
  *
  * Processor semantics mirror the reference: each message's
  * args_mapping binds the positional `?` parameters and the message
  * is REPLACED by the JSON array of result rows. The input form runs
  * one query and emits a message per row.
  */
object BigQuerySelect {

  final case class QueryParts(table: String, columns: Seq[String],
                              where: String = "", prefix: String = "",
                              suffix: String = "") {
    def sql: String = {
      val sb = new StringBuilder
      if (prefix.nonEmpty) sb.append(prefix).append(' ')
      sb.append(s"SELECT ${columns.mkString(", ")} FROM $table")
      if (where.nonEmpty) sb.append(s" WHERE $where")
      if (suffix.nonEmpty) sb.append(' ').append(suffix)
      sb.toString
    }
  }

  final class Client(endpoint: String, token: String, project: String,
                     client: Http.Client = null) extends Serializable {
    @transient private lazy val c =
      Option(client).getOrElse(resolveClient(endpoint))
    @transient private lazy val mapper = new ObjectMapper()
    private val base = endpoint.stripSuffix("/")
    private def auth = Map("Authorization" -> s"Bearer $token",
      "Content-Type" -> "application/json")

    /** Run one parameterized query, drain pageToken continuations;
      * returns (columnNames, rows of string values).
      */
    def query(sql: String, params: Seq[Any]): (Seq[String], Seq[Seq[String]]) = {
      val paramJson = params.map {
        case n @ (_: Long | _: Int | _: java.lang.Long |
                  _: java.lang.Integer) =>
          s"""{"parameterType":{"type":"INT64"},"parameterValue":{"value":"$n"}}"""
        case d @ (_: Double | _: java.lang.Double) =>
          s"""{"parameterType":{"type":"FLOAT64"},"parameterValue":{"value":"$d"}}"""
        case other =>
          s"""{"parameterType":{"type":"STRING"},"parameterValue":{"value":${mapper.writeValueAsString(String.valueOf(other))}}}"""
      }.mkString(",")
      val body = s"""{"query":${mapper.writeValueAsString(sql)},""" +
        s""""useLegacySql":false,"parameterMode":"POSITIONAL",""" +
        s""""queryParameters":[$paramJson]}"""
      var resp = c(Seq(Http.Request(
        s"$base/bigquery/v2/projects/$project/queries", "POST", auth,
        body))).head
      if (resp.status != 200) throw new IllegalStateException(
        s"bigquery query: ${resp.status} ${resp.body.take(200)}")
      var root = mapper.readTree(resp.body)
      val cols = {
        val out = Seq.newBuilder[String]
        root.path("schema").path("fields")
          .forEach(f => out += f.path("name").asText)
        out.result()
      }
      val rows = mutable.ArrayBuffer.empty[Seq[String]]
      def drainPage(): Unit =
        root.path("rows").forEach { r =>
          val vals = Seq.newBuilder[String]
          r.path("f").forEach(f => vals += f.path("v").asText)
          rows += vals.result()
        }
      drainPage()
      val jobId = root.path("jobReference").path("jobId").asText("")
      var pageToken = root.path("pageToken").asText("")
      while (pageToken.nonEmpty) {
        resp = c(Seq(Http.Request(
          s"$base/bigquery/v2/projects/$project/queries/$jobId?pageToken=$pageToken",
          "GET", auth, ""))).head
        if (resp.status != 200) throw new IllegalStateException(
          s"bigquery page: ${resp.status}")
        root = mapper.readTree(resp.body)
        drainPage()
        pageToken = root.path("pageToken").asText("")
      }
      (cols, rows.toSeq)
    }
  }

  /** The processor: per-message parameterized SELECT; the message
    * becomes the JSON array of result rows (objects keyed by the
    * schema's column names).
    */
  def processor(df0: DataFrame, endpoint: String, token: String,
                project: String, parts: QueryParts, args: Seq[Column],
                client: Http.Client = null): DataFrame = {
    val df = Envelope.ensure(df0)
      .withColumn("__bq_args", to_json(struct(args.zipWithIndex.map {
        case (a, i) => a.as(s"a$i")
      }: _*)))
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val aIdx = schema.fieldIndex("__bq_args")
    val (e, t, p, sql) = (endpoint, token, project, parts.sql)
    val clientV = client
    val out = df.mapPartitions { it =>
      val cl = new Client(e, t, p, clientV)
      val mapper = new ObjectMapper()
      it.map { row =>
        val vals = row.toSeq.toArray
        try {
          val argDoc = mapper.readTree(row.getString(aIdx))
          val params = Seq.newBuilder[Any]
          argDoc.properties().forEach { en =>
            val v = en.getValue
            params += (if (v.isIntegralNumber) v.asLong
                       else if (v.isNumber) v.asDouble
                       else v.asText)
          }
          val (cols, rows) = cl.query(sql, params.result())
          val arr = rows.map { r =>
            cols.zip(r).map { case (cName, v) =>
              s"${mapper.writeValueAsString(cName)}:${mapper.writeValueAsString(v)}"
            }.mkString("{", ",", "}")
          }.mkString("[", ",", "]")
          vals(vIdx) = arr
        } catch {
          case ex: Exception =>
            vals(eIdx) = Option(ex.getMessage).getOrElse("bigquery error")
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
    out.drop("__bq_args")
  }

  // ── in-memory jobs.query service (mem://name), paginated ──

  /** Seeded tables execute the restricted shape `SELECT <cols> FROM
    * <table> [WHERE <col> = ?]`, answering in `pageSize` chunks with
    * jobId + pageToken continuations.
    */
  final class MemBq(expectedToken: String, pageSize: Int = 100) {
    private val mapper = new ObjectMapper()
    val tables: mutable.LinkedHashMap[String,
      (Seq[String], Seq[Seq[String]])] = mutable.LinkedHashMap.empty
    private val jobs = mutable.HashMap.empty[String,
      (Seq[String], Seq[Seq[String]])]
    private var jobCounter = 0
    @volatile var rejected = 0
    @volatile var pagesServed = 0

    def seed(table: String, columns: Seq[String],
             rows: Seq[Seq[String]]): Unit =
      synchronized { tables(table) = (columns, rows) }

    def handle(q: Http.Request): Http.Response = synchronized {
      if (!q.headers.get("Authorization")
            .contains(s"Bearer $expectedToken")) {
        rejected += 1
        return Http.Response(401, """{"error":{"code":401}}""")
      }
      if (q.verb == "POST") {
        val root = mapper.readTree(q.body)
        val sql = root.path("query").asText
        require(root.path("parameterMode").asText == "POSITIONAL",
          "mem bq expects POSITIONAL parameters")
        val params = {
          val out = Seq.newBuilder[String]
          root.path("queryParameters").forEach(p =>
            out += p.path("parameterValue").path("value").asText)
          out.result()
        }
        val Re =
          """(?i)SELECT (.+) FROM (\w+)(?: WHERE (\w+) = \?)?""".r
        sql match {
          case Re(colsCsv, table, whereColOrNull) =>
            val (allCols, allRows) = tables.getOrElse(table,
              return Http.Response(404, """{"error":"no such table"}"""))
            val wanted = colsCsv.split(",").map(_.trim).toSeq match {
              case Seq("*") => allCols
              case cs => cs
            }
            val idx = wanted.map(allCols.indexOf)
            require(idx.forall(_ >= 0), s"unknown column in $colsCsv")
            val filtered = Option(whereColOrNull) match {
              case None => allRows
              case Some(wc) =>
                val wi = allCols.indexOf(wc)
                allRows.filter(_(wi) == params.head)
            }
            val projected = filtered.map(r => idx.map(r))
            jobCounter += 1
            val jobId = s"job$jobCounter"
            respond(jobId, wanted, projected, 0)
          case other => Http.Response(400,
            s"""{"error":"unsupported query: ${other.take(60)}"}""")
        }
      } else { // GET continuation
        val afterScheme = q.url.stripPrefix("mem://")
        val path = afterScheme.substring(afterScheme.indexOf('/'))
        val jobId = path.split("/queries/")(1).takeWhile(_ != '?')
        val offset = q.url.split("pageToken=")(1).toInt
        jobs.get(jobId) match {
          case None => Http.Response(404, """{"error":"no such job"}""")
          case Some((cols, rows)) =>
            pagesServed += 1
            respond(jobId, cols, rows, offset)
        }
      }
    }

    private def respond(jobId: String, cols: Seq[String],
                        rows: Seq[Seq[String]], offset: Int): Http.Response = {
      jobs(jobId) = (cols, rows)
      val page = rows.slice(offset, offset + pageSize)
      val fields = cols.map(c =>
        s"""{"name":${mapper.writeValueAsString(c)},"type":"STRING"}""")
        .mkString(",")
      val rowJson = page.map { r =>
        s"""{"f":[${r.map(v =>
          s"""{"v":${mapper.writeValueAsString(v)}}""").mkString(",")}]}"""
      }.mkString(",")
      val next =
        if (offset + pageSize < rows.size)
          s""","pageToken":"${offset + pageSize}""""
        else ""
      Http.Response(200,
        s"""{"jobComplete":true,"jobReference":{"jobId":"$jobId"},""" +
          s""""schema":{"fields":[$fields]},"rows":[$rowJson]$next}""")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemBq]()

  def register(name: String, token: String, pageSize: Int = 100): MemBq =
    registry.computeIfAbsent(name, _ => new MemBq(token, pageSize))
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
