package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `azure_cosmosdb` processor/input/output
  * (internal/impl/azure/cosmosdb — contract only, no code ported: the
  * reference wraps the azcosmos SDK; this speaks the PUBLIC Cosmos DB
  * REST protocol directly):
  *
  *   - [[MasterKey]]: the documented master-key authorization —
  *     string-to-sign `verb\nresourceType\nresourceLink\n
  *     x-ms-date\n\n` (all lowercase where specified), HMAC-SHA256
  *     with the base64 account key, the URL-encoded
  *     `type=master&ver=1.0&sig=…` Authorization value. The loopback
  *     service RE-DERIVES and verifies every request;
  *   - documents: `POST /dbs/{db}/colls/{coll}/docs` (create; the
  *     `x-ms-documentdb-is-upsert: true` header switches to upsert),
  *     `GET/DELETE /…/docs/{id}`, every call carrying the JSON-array
  *     `x-ms-documentdb-partitionkey` header;
  *   - queries: `POST …/docs` with
  *     `Content-Type: application/query+json`,
  *     `x-ms-documentdb-isquery: True`, body
  *     `{query, parameters: [{name: "@p", value}]}`.
  *
  * Operations mirror the reference's executor enum: create / upsert /
  * read (content replaced; 404 on the error channel) / delete /
  * replace.
  */
object CosmosDb {

  final case class Account(base64Key: String)

  object MasterKey {
    def sign(acct: Account, verb: String, resourceType: String,
             resourceLink: String, xMsDate: String): String = {
      val sts = s"${verb.toLowerCase}\n$resourceType\n$resourceLink\n" +
        s"${xMsDate.toLowerCase}\n\n"
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(
        Base64.getDecoder.decode(acct.base64Key), "HmacSHA256"))
      val sig = Base64.getEncoder.encodeToString(
        mac.doFinal(sts.getBytes(UTF_8)))
      java.net.URLEncoder.encode(s"type=master&ver=1.0&sig=$sig", "UTF-8")
    }
  }

  private def msDate(): String =
    java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now()).toLowerCase

  final class Client(endpoint: String, acct: Account, db: String,
                     container: String, client: Http.Client = null)
      extends Serializable {
    @transient private lazy val c =
      Option(client).getOrElse(resolveClient(endpoint))
    private val base = endpoint.stripSuffix("/")
    private val collLink = s"dbs/$db/colls/$container"

    private def request(verb: String, resourceType: String,
                        resourceLink: String, path: String, body: String,
                        extra: Map[String, String]): Http.Response = {
      val date = msDate()
      val auth = MasterKey.sign(acct, verb, resourceType, resourceLink,
        date)
      c(Seq(Http.Request(s"$base$path", verb,
        extra ++ Map("x-ms-date" -> date, "x-ms-version" -> "2018-12-31",
          "Authorization" -> auth), body))).head
    }

    private def pkHeader(pk: String): Map[String, String] = {
      val mapper = new ObjectMapper()
      Map("x-ms-documentdb-partitionkey" ->
        s"[${mapper.writeValueAsString(pk)}]")
    }

    def create(pk: String, docJson: String,
               upsert: Boolean = false): Http.Response =
      request("POST", "docs", collLink, s"/$collLink/docs", docJson,
        pkHeader(pk) ++
          (if (upsert) Map("x-ms-documentdb-is-upsert" -> "true")
           else Map.empty))

    def read(pk: String, id: String): Http.Response =
      request("GET", "docs", s"$collLink/docs/$id",
        s"/$collLink/docs/$id", "", pkHeader(pk))

    def delete(pk: String, id: String): Http.Response =
      request("DELETE", "docs", s"$collLink/docs/$id",
        s"/$collLink/docs/$id", "", pkHeader(pk))

    def replace(pk: String, id: String, docJson: String): Http.Response =
      request("PUT", "docs", s"$collLink/docs/$id",
        s"/$collLink/docs/$id", docJson, pkHeader(pk))

    /** Cross-partition SQL query with @-parameters. */
    def query(sql: String, params: Map[String, String]): Seq[String] = {
      val mapper = new ObjectMapper()
      val paramJson = params.map { case (k, v) =>
        s"""{"name":${mapper.writeValueAsString(k)},"value":${mapper.writeValueAsString(v)}}"""
      }.mkString(",")
      val body =
        s"""{"query":${mapper.writeValueAsString(sql)},"parameters":[$paramJson]}"""
      val r = request("POST", "docs", collLink, s"/$collLink/docs", body,
        Map("Content-Type" -> "application/query+json",
          "x-ms-documentdb-isquery" -> "True",
          "x-ms-documentdb-query-enablecrosspartition" -> "true"))
      if (r.status != 200) throw new IllegalStateException(
        s"cosmosdb query: ${r.status} ${r.body.take(200)}")
      val out = Seq.newBuilder[String]
      mapper.readTree(r.body).path("Documents")
        .forEach(d => out += d.toString)
      out.result()
    }
  }

  /** The processor: per-message document op (the reference's
    * executor enum); read replaces content, 404/409 per item on the
    * error channel.
    */
  def processor(df0: DataFrame, endpoint: String, acct: Account,
                db: String, container: String, op: String,
                pkCol: Column, idCol: Column,
                client: Http.Client = null): DataFrame = {
    require(Set("create", "upsert", "read", "delete", "replace")(op),
      s"cosmosdb: invalid operation '$op'")
    val df = Envelope.ensure(df0)
      .withColumn("__cpk", pkCol.cast("string"))
      .withColumn("__cid", idCol.cast("string"))
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val pkIdx = schema.fieldIndex("__cpk")
    val idIdx = schema.fieldIndex("__cid")
    val (e, a, dbV, ct, opV) = (endpoint, acct, db, container, op)
    val clientV = client
    val out = df.mapPartitions { it =>
      val cl = new Client(e, a, dbV, ct, clientV)
      it.map { row =>
        val vals = row.toSeq.toArray
        val pk = row.getString(pkIdx)
        val id = row.getString(idIdx)
        val resp = opV match {
          case "create" => cl.create(pk, row.getString(vIdx))
          case "upsert" => cl.create(pk, row.getString(vIdx), upsert = true)
          case "read" => cl.read(pk, id)
          case "delete" => cl.delete(pk, id)
          case "replace" => cl.replace(pk, id, row.getString(vIdx))
        }
        if (opV == "read" && resp.status == 200) vals(vIdx) = resp.body
        if (resp.status >= 400)
          vals(eIdx) = s"cosmosdb $opV: ${resp.status}"
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
    out.drop("__cpk", "__cid")
  }

  // ─────────── in-memory account (mem://name) with VERIFY ────────────

  final class MemCosmos(acct: Account) {
    private val mapper = new ObjectMapper()
    /** (pk, id) → document JSON. */
    val docs: mutable.LinkedHashMap[(String, String), String] =
      mutable.LinkedHashMap.empty
    @volatile var rejected = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      val afterScheme = q.url.stripPrefix("mem://")
      val path = afterScheme.substring(afterScheme.indexOf('/'))
      val link = path.stripPrefix("/")
      val resourceLink =
        if (link.endsWith("/docs")) link.stripSuffix("/docs") else link
      val expected = MasterKey.sign(acct, q.verb, "docs", resourceLink,
        q.headers.getOrElse("x-ms-date", ""))
      if (!q.headers.get("Authorization").contains(expected)) {
        rejected += 1
        return Http.Response(401, """{"code":"Unauthorized"}""")
      }
      val pk = q.headers.get("x-ms-documentdb-partitionkey")
        .map(h => mapper.readTree(h).get(0).asText).getOrElse("")
      (q.verb, link.endsWith("/docs")) match {
        case ("POST", true)
            if q.headers.get("x-ms-documentdb-isquery").contains("True") =>
          runQuery(q.body)
        case ("POST", true) =>
          val doc = mapper.readTree(q.body)
          val id = doc.path("id").asText
          val upsert = q.headers.get("x-ms-documentdb-is-upsert")
            .contains("true")
          if (docs.contains((pk, id)) && !upsert)
            Http.Response(409, """{"code":"Conflict"}""")
          else {
            val existed = docs.contains((pk, id))
            docs((pk, id)) = q.body
            Http.Response(if (existed) 200 else 201, q.body)
          }
        case ("GET", false) =>
          val id = link.substring(link.lastIndexOf("/docs/") + 6)
          docs.get((pk, id)) match {
            case Some(d) => Http.Response(200, d)
            case None => Http.Response(404, """{"code":"NotFound"}""")
          }
        case ("PUT", false) =>
          val id = link.substring(link.lastIndexOf("/docs/") + 6)
          if (!docs.contains((pk, id)))
            Http.Response(404, """{"code":"NotFound"}""")
          else { docs((pk, id)) = q.body; Http.Response(200, q.body) }
        case ("DELETE", false) =>
          val id = link.substring(link.lastIndexOf("/docs/") + 6)
          if (docs.remove((pk, id)).isDefined) Http.Response(204, "")
          else Http.Response(404, """{"code":"NotFound"}""")
        case other => Http.Response(400, s"""{"code":"BadRequest"}""")
      }
    }

    /** `SELECT * FROM c [WHERE c.<field> = @p]` with parameters. */
    private def runQuery(body: String): Http.Response = {
      val root = mapper.readTree(body)
      val sql = root.path("query").asText
      val params = {
        val m = mutable.HashMap.empty[String, String]
        root.path("parameters").forEach(p =>
          m(p.path("name").asText) = p.path("value").asText)
        m.toMap
      }
      val Re = """(?i)SELECT \* FROM c(?: WHERE c\.(\w+) = (@\w+))?""".r
      sql match {
        case Re(fieldOrNull, paramOrNull) =>
          val matches = docs.values.filter { d =>
            Option(fieldOrNull) match {
              case None => true
              case Some(f) =>
                val want = params.getOrElse(paramOrNull,
                  return Http.Response(400,
                    """{"code":"BadRequest","message":"unbound parameter"}"""))
                mapper.readTree(d).path(f).asText == want
            }
          }.toSeq
          Http.Response(200,
            s"""{"_rid":"x","Documents":[${matches.mkString(",")}],"_count":${matches.size}}""")
        case other => Http.Response(400,
          s"""{"code":"BadRequest","message":"unsupported query"}""")
      }
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemCosmos]()

  def register(name: String, acct: Account): MemCosmos =
    registry.computeIfAbsent(name, _ => new MemCosmos(acct))
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
