package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Http

/** The `salesforce` input (inputs/salesforce.adoc;
  * internal/impl/salesforce/{input_salesforce,soql}.go and
  * salesforcehttp/client.go — contract only, no code ported): executes
  * one SOQL query against the REST API, paginates every result page,
  * and emits one message per record (body = the raw record JSON,
  * metadata `sobject`/`soql`/`total_size`).
  *
  * Auth is the OAuth 2.0 client-credentials flow: a form-encoded POST
  * to `/services/oauth2/token` exchanging client_id/client_secret for a
  * bearer token; a 401 on any query call refreshes the token once and
  * retries (the reference's `withAuth` wrapper).
  *
  * SOQL composition matches the reference: `prefix SELECT columns FROM
  * object WHERE where suffix`, with unquoted `?` placeholders in
  * `where` substituted from `args` under SOQL literal escaping —
  * strings single-quoted with `\'`/`\\` escapes, timestamps ISO-8601
  * unquoted, numbers/booleans plain, null → `null`; `?` inside
  * single-quoted literals is left alone.
  *
  * Pagination walks `nextRecordsUrl` driver-side — the chain is
  * sequential, the same admission-loop judgment as [[Jira.read]]; the
  * record volume parallelizes after admission. `mem://name` base URLs
  * resolve to a registered test transport (the Http.Client seam).
  */
object Salesforce {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  private val namedClients = TrieMap.empty[String, Http.Client]

  def registerClient(name: String, client: Http.Client): Unit =
    namedClients.update(name, client)

  def clientFor(orgUrl: String): Http.Client =
    if (orgUrl.startsWith("mem://")) {
      val name = orgUrl.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => namedClients.getOrElse(name, sys.error(
        s"salesforce: no client registered for mem://$name"))(reqs)
    } else Http.javaClient()

  // ------------------------------------------------------------------
  // SOQL composition (soql.go contract)
  // ------------------------------------------------------------------

  /** SOQL literal form of one argument value. */
  def soqlEscape(v: Any): String = v match {
    case null => "null"
    case s: String => soqlQuote(s)
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case f: Float => f.toString
    case d: Double => d.toString
    case t: java.sql.Timestamp =>
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
        .withZone(java.time.ZoneOffset.UTC).format(t.toInstant)
    case b: Array[Byte] => soqlQuote(new String(b, "UTF-8"))
    case other => throw new IllegalArgumentException(
      s"salesforce: unsupported SOQL arg type ${other.getClass.getName}")
  }

  private def soqlQuote(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Replace unquoted `?` placeholders in `where` with escaped args;
    * `?` inside single-quoted string literals is left alone, and a
    * count mismatch fails fast (startup-time error in the reference).
    */
  def substitutePlaceholders(where: String, args: Seq[Any]): String = {
    if (where.isEmpty) {
      require(args.isEmpty,
        s"salesforce: got ${args.size} args but no ? placeholders")
      return ""
    }
    val sb = new StringBuilder
    var inQuote = false
    var argIdx = 0
    var i = 0
    while (i < where.length) {
      val c = where.charAt(i)
      if (c == '\\' && i + 1 < where.length) {
        sb.append(c).append(where.charAt(i + 1)); i += 1
      } else if (c == '\'') { inQuote = !inQuote; sb.append(c) }
      else if (c == '?' && !inQuote) {
        require(argIdx < args.size,
          s"salesforce: more ? placeholders than args (have ${args.size})")
        sb.append(soqlEscape(args(argIdx))); argIdx += 1
      } else sb.append(c)
      i += 1
    }
    require(argIdx == args.size,
      s"salesforce: got ${args.size} args but only $argIdx ? placeholders")
    sb.toString
  }

  def buildSoql(obj: String, columns: Seq[String], where: String = "",
                prefix: String = "", suffix: String = "",
                args: Seq[Any] = Seq.empty): String = {
    require(obj.trim.nonEmpty, "salesforce: object must not be empty")
    require(columns.nonEmpty,
      "salesforce: columns must contain at least one field")
    val w = substitutePlaceholders(where, args).trim
    val sb = new StringBuilder
    if (prefix.trim.nonEmpty) sb.append(prefix.trim).append(' ')
    sb.append("SELECT ").append(columns.mkString(", "))
      .append(" FROM ").append(obj)
    if (w.nonEmpty) sb.append(" WHERE ").append(w)
    if (suffix.trim.nonEmpty) sb.append(' ').append(suffix.trim)
    sb.toString
  }

  // ------------------------------------------------------------------
  // read
  // ------------------------------------------------------------------

  /** One full extract: token exchange, SOQL build, `nextRecordsUrl`
    * page walk, one row per record. A 401 mid-walk refreshes the token
    * once and retries that page.
    */
  def read(spark: SparkSession, orgUrl: String, clientId: String,
           clientSecret: String, obj: String, columns: Seq[String],
           where: String = "", args: Seq[Any] = Seq.empty,
           prefix: String = "", suffix: String = "",
           apiVersion: String = "v65.0", client: Http.Client = null,
           maxPages: Int = 10000): DataFrame = {
    val c = Option(client).getOrElse(clientFor(orgUrl))
    val base = orgUrl.stripSuffix("/")
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

    def token(): String = {
      val body = s"grant_type=client_credentials&client_id=${enc(clientId)}" +
        s"&client_secret=${enc(clientSecret)}"
      val resp = c(Seq(Http.Request(s"$base/services/oauth2/token", "POST",
        Map("Content-Type" -> "application/x-www-form-urlencoded",
          "Accept" -> "application/json"), body))).head
      if (resp.status != 200) throw new IllegalStateException(
        s"salesforce: token exchange failed ${resp.status}: " +
          resp.body.take(200))
      val tok = mapper.readTree(resp.body).path("access_token").asText("")
      if (tok.isEmpty) throw new IllegalStateException(
        "salesforce: token exchange returned no access_token")
      tok
    }

    var bearer = token()
    val soql = buildSoql(obj, columns, where, prefix, suffix, args)

    // expired-token retry: ONE refresh per failed call (withAuth)
    def get(url: String): String = {
      def go(tok: String) = c(Seq(Http.Request(url, "GET",
        Map("Authorization" -> s"Bearer $tok"), ""))).head
      var resp = go(bearer)
      if (resp.status == 401) { bearer = token(); resp = go(bearer) }
      if (resp.status < 200 || resp.status > 299)
        throw new IllegalStateException(
          s"salesforce: query returned ${resp.status}: ${resp.body.take(200)}")
      resp.body
    }

    val out = Vector.newBuilder[(String, Int)]
    var nextUrl: Option[String] = None
    var pages = 0
    var first = true
    while ((first || nextUrl.nonEmpty) && pages < maxPages) {
      val url = nextUrl match {
        case Some(n) => base + n // nextRecordsUrl is server-relative
        case None =>
          s"$base/services/data/$apiVersion/query?q=${enc(soql)}"
      }
      first = false
      val page = mapper.readTree(get(url))
      val total = page.path("totalSize").asInt(0)
      Option(page.get("records")).foreach(_.elements().asScala
        .foreach(r => out += ((r.toString, total))))
      nextUrl = Option(page.path("nextRecordsUrl").asText(""))
        .filter(_.nonEmpty)
      pages += 1
    }
    if (nextUrl.nonEmpty) System.err.println(
      s"[salesforce] WARN stopped after $maxPages pages with more remaining")

    val rows = out.result().zipWithIndex.map { case ((rec, total), i) =>
      Row(rec, Map("sobject" -> obj, "soql" -> soql,
        "total_size" -> total.toString), null, i.toLong)
    }
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, rows.length / 256 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }

  // ------------------------------------------------------------------
  // in-memory API server (the seam's server side)
  // ------------------------------------------------------------------

  /** Minimal REST subset the input consumes: the client-credentials
    * token endpoint (tokens can be expired to exercise the 401-refresh
    * path), and `/query` + `nextRecordsUrl` pagination over a record
    * corpus. SOQL evaluation is intentionally minimal — `SELECT cols
    * FROM obj [WHERE field > literal] [ORDER BY Id ...]` — enough to
    * verify composition, filtering, and the page walk. NOT Salesforce.
    */
  object InMemoryServer {
    /** One record: field name → JSON-renderable value. */
    final case class Record(fields: Seq[(String, Any)])

    final case class Transport(obj: String, records: Seq[Record],
                               pageSize: Int = 2000,
                               expireTokenAfterQueries: Int = Int.MaxValue)
        extends (Seq[Http.Request] => Seq[Http.Response])
        with Serializable {
      private val tokenSeq = new java.util.concurrent.atomic.AtomicInteger(0)
      private val queryCalls = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile private var currentToken = ""
      @volatile var tokenExchanges = 0

      private def jsonVal(v: Any): String = v match {
        case null => "null"
        case s: String => "\"" + s.replace("\\", "\\\\")
          .replace("\"", "\\\"") + "\""
        case t: java.sql.Timestamp => "\"" +
          java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSXX")
            .withZone(java.time.ZoneOffset.UTC).format(t.toInstant) + "\""
        case other => other.toString
      }

      private def recordJson(r: Record): String = {
        val attrs = s""""attributes":{"type":"$obj","url":""" +
          s""""/services/data/v65.0/sobjects/$obj/${r.fields.head._2}"}"""
        (attrs +: r.fields.map { case (k, v) => s""""$k":${jsonVal(v)}""" })
          .mkString("{", ",", "}")
      }

      def apply(reqs: Seq[Http.Request]): Seq[Http.Response] = reqs.map { q =>
        val uri = java.net.URI.create(q.url)
        uri.getPath match {
          case "/services/oauth2/token" =>
            require(q.body.contains("grant_type=client_credentials"),
              "fake salesforce: client-credentials grant required")
            tokenExchanges += 1
            currentToken = s"sftok-${tokenSeq.incrementAndGet()}"
            Http.Response(200,
              s"""{"access_token":"$currentToken","instance_url":""" +
                s""""https://x.test","token_type":"Bearer",""" +
                s""""id":"https://login.x.test/id/00Dorg/005user"}""")

          case p if p.endsWith("/query") || p.contains("/query/") =>
            if (!q.headers.get("Authorization")
                .contains(s"Bearer $currentToken"))
              Http.Response(401,
                """[{"message":"Session expired or invalid",""" +
                  """"errorCode":"INVALID_SESSION_ID"}]""")
            else if (queryCalls.incrementAndGet() ==
                expireTokenAfterQueries) {
              // simulate server-side expiry AFTER this check: next call
              // with the old token 401s until re-exchange
              currentToken = ""
              Http.Response(401,
                """[{"message":"Session expired or invalid",""" +
                  """"errorCode":"INVALID_SESSION_ID"}]""")
            } else {
              val params = Option(uri.getRawQuery).getOrElse("")
                .split("&").filter(_.nonEmpty).map { kv =>
                  val Array(k, v) = kv.split("=", 2)
                  k -> java.net.URLDecoder.decode(v, "UTF-8")
                }.toMap
              val start =
                if (p.contains("/query/")) // nextRecordsUrl form: …-N
                  p.substring(p.lastIndexOf('-') + 1).toInt
                else 0
              val soql = params.getOrElse("q", "")
              val matched =
                if (p.contains("/query/")) lastMatched
                else { lastMatched = evalSoql(soql); lastMatched }
              val page = matched.slice(start, start + pageSize)
              val next =
                if (start + pageSize < matched.size)
                  s""","nextRecordsUrl":"/services/data/v65.0/query/""" +
                    s"""01gFAKE-${start + pageSize}""""
                else ""
              Http.Response(200,
                s"""{"totalSize":${matched.size},""" +
                  s""""done":${next.isEmpty},"records":[""" +
                  page.map(recordJson).mkString(",") + s"]$next}")
            }
          case other =>
            Http.Response(404, s"""[{"message":"no route $other"}]""")
        }
      }

      @volatile private var lastMatched: Seq[Record] = Seq.empty

      /** `SELECT … FROM obj [WHERE f > lit] [ORDER BY f [DESC]]` —
        * the subset the contract tests compose.
        */
      private def evalSoql(soql: String): Seq[Record] = {
        val FromRe = """(?s)SELECT .+ FROM (\S+)(.*)""".r
        val (fromObj, rest) = soql match {
          case FromRe(o, r) => (o, r.trim)
          case _ => sys.error(s"fake salesforce: cannot parse SOQL: $soql")
        }
        require(fromObj == obj,
          s"fake salesforce: unknown object $fromObj (serving $obj)")
        val WhereRe = """(?s)WHERE (\S+) > ('?)([^'\s]+)\2(.*)""".r
        val (filtered, tail) = rest match {
          case WhereRe(f, _, lit, t) =>
            (records.filter { r =>
              r.fields.find(_._1 == f).map(_._2).exists {
                case n: Long => n > lit.toLong
                case n: Int => n > lit.toLong
                case n: Double => n > lit.toDouble
                case s: String => s > lit
                case _ => false
              }
            }, t.trim)
          case _ => (records, rest)
        }
        val OrderRe = """(?s)ORDER BY (\S+)( DESC)?.*""".r
        tail match {
          case OrderRe(f, desc) =>
            def key(r: Record): (Int, Double, String) =
              r.fields.find(_._1 == f).map(_._2) match {
                case Some(n: Long) => (0, n.toDouble, "")
                case Some(n: Int) => (0, n.toDouble, "")
                case Some(n: Double) => (0, n, "")
                case Some(v) if v != null => (1, 0.0, v.toString)
                case _ => (2, 0.0, "")
              }
            val s = filtered.sortBy(key)
            if (desc != null) s.reverse else s
          case _ => filtered
        }
      }
    }
  }
}
