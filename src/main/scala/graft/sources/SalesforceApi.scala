package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.Http

/** The Salesforce REST pair that completes the family
  * ([[Salesforce]] holds the SOQL input and the shared OAuth shape):
  *
  *  - `salesforce_graphql` INPUT (reference
  *    internal/impl/salesforce/input_salesforce_graphql.go): one
  *    `POST /services/data/{v}/graphql` per page against the UIAPI
  *    schema; `edges { node { Field { value } } }` trees flatten to
  *    one message per record, and when the connection carries
  *    `pageInfo { hasNextPage endCursor }` the input TRANSPARENTLY
  *    paginates by injecting `after: "<cursor>"` into the query
  *    string between requests (input_salesforce_graphql.go:57).
  *    Responses without an edges array emit as a single message.
  *
  *  - `salesforce` OUTPUT (output_salesforce.go): realtime mode
  *    batches through the composite sObjects REST collections
  *    (`POST/PATCH /composite/sobjects`, upsert via
  *    `PATCH /composite/sobjects/{type}/{externalIdField}`, allOrNone
  *    rollback); bulk mode drives the Bulk API 2.0 ingest lifecycle —
  *    create job → upload CSV batch → `UploadComplete` → poll until
  *    `JobComplete` (output_salesforce.go:42-52).
  *
  * Scale shape: the graphql page walk is driver admission (a cursor
  * chain); records parallelize. The sink writes one composite batch /
  * bulk job per partition batch, executor-side.
  */
object SalesforceApi {

  private def mapper = new ObjectMapper()

  // ─────────────────────────── auth ───────────────────────────

  private def fetchToken(c: Http.Client, orgUrl: String, clientId: String,
                         clientSecret: String): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val r = c(Seq(Http.Request(s"$orgUrl/services/oauth2/token", "POST",
      Map("Content-Type" -> "application/x-www-form-urlencoded"),
      s"grant_type=client_credentials&client_id=${enc(clientId)}" +
        s"&client_secret=${enc(clientSecret)}"))).head
    if (r.status != 200)
      throw new IllegalStateException(s"salesforce token: ${r.status} ${r.body}")
    mapper.readTree(r.body).get("access_token").asText
  }

  // ───────────────────── salesforce_graphql input ─────────────────────

  /** Inject `after: "<cursor>"` into the entity's argument list —
    * the between-requests rewrite the reference applies.
    */
  private[sources] def injectAfter(query: String, entity: String,
                                   cursor: String): String = {
    val idx = query.indexOf(entity)
    require(idx >= 0, s"graphql: entity $entity not in query")
    val tail = query.substring(idx + entity.length)
    val trimmed = tail.dropWhile(_.isWhitespace)
    if (trimmed.startsWith("(")) {
      // existing args: replace any previous after, else append
      val close = tail.indexOf(')')
      val argsStart = tail.indexOf('(')
      val args = tail.substring(argsStart + 1, close)
      val keep = args.split(",").map(_.trim)
        .filterNot(_.startsWith("after")).filter(_.nonEmpty)
      val rewritten = (keep :+ s"""after: "$cursor"""").mkString(", ")
      query.substring(0, idx + entity.length) +
        tail.substring(0, argsStart + 1) + rewritten + tail.substring(close)
    } else {
      query.substring(0, idx + entity.length) +
        s"""(after: "$cursor")""" + tail
    }
  }

  /** Flatten a UIAPI node: `{Field:{value: X}}` → `{Field: X}`;
    * nested objects without `value` recurse.
    */
  private def flattenNode(n: JsonNode): JsonNode =
    if (n.isObject) {
      val o = mapper.createObjectNode()
      n.properties().asScala.foreach { e =>
        val v = e.getValue
        if (v.isObject && v.has("value"))
          o.set[JsonNode](e.getKey, v.get("value"))
        else o.set[JsonNode](e.getKey, flattenNode(v))
        ()
      }
      o
    } else n

  /** Run the query, walking `pageInfo` until exhausted; one row per
    * edge node (flattened JSON).
    */
  def graphqlRead(spark: SparkSession, orgUrl: String, clientId: String,
                  clientSecret: String, query: String,
                  variablesJson: String = "{}",
                  apiVersion: String = "v65.0",
                  client: Http.Client = null): DataFrame = {
    val c = Option(client).getOrElse(resolveClient(orgUrl))
    val token = fetchToken(c, orgUrl, clientId, clientSecret)
    val out = mutable.Buffer[String]()
    var q = query
    var going = true
    while (going) {
      val body = mapper.createObjectNode()
      body.put("query", q)
      body.set[JsonNode]("variables", mapper.readTree(variablesJson))
      val r = c(Seq(Http.Request(
        s"$orgUrl/services/data/$apiVersion/graphql", "POST",
        Map("Content-Type" -> "application/json",
          "Authorization" -> s"Bearer $token"), body.toString))).head
      if (r.status != 200)
        throw new IllegalStateException(
          s"salesforce_graphql: ${r.status} ${r.body.take(200)}")
      val root = mapper.readTree(r.body)
      if (root.has("errors") && root.get("errors").size > 0)
        throw new IllegalStateException(
          s"salesforce_graphql: ${root.get("errors")}")
      val queryNode = root.at("/data/uiapi/query")
      // the single entity connection under uiapi.query
      val entityName = queryNode.properties().asScala.headOption
        .map(_.getKey).getOrElse(
          throw new IllegalStateException("graphql: empty uiapi.query"))
      val conn = queryNode.get(entityName)
      if (!conn.has("edges")) {
        // no edges: single message, done
        out += conn.toString
        going = false
      } else {
        conn.get("edges").elements().asScala.foreach(e =>
          out += flattenNode(e.path("node")).toString)
        val pi = conn.path("pageInfo")
        if (pi.path("hasNextPage").asBoolean(false)) {
          q = injectAfter(query, entityName, pi.path("endCursor").asText)
        } else going = false
      }
    }
    val rows = out.toSeq.zipWithIndex.map { case (v, i) =>
      Row(v, Map("salesforce_graphql" -> "true"), null, i.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(math.max(rows.size, 1),
          spark.sparkContext.defaultParallelism))), BrokerStream.schema)
  }

  // ───────────────────────── salesforce output ─────────────────────────

  /** Write rows (JSON objects in `valueCol`) to an SObject.
    * `mode` ∈ realtime/bulk; `operation` ∈ insert/update/upsert/delete.
    */
  def write(df: DataFrame, orgUrl: String, clientId: String,
            clientSecret: String, objectName: String,
            operation: String = "upsert",
            externalIdField: String = "Id",
            mode: String = "realtime", allOrNone: Boolean = false,
            batchSize: Int = 200, valueCol: Column = col("value"),
            client: Http.Client = null): Unit = {
    require(Set("insert", "update", "upsert", "delete")(operation),
      s"salesforce operation $operation")
    require(Set("realtime", "bulk")(mode), s"salesforce mode $mode")
    val prepared = df.select(valueCol.cast("string").as("v"))
    val (u, ci, cs, obj, op, ext, aon, bs, md) = (orgUrl, clientId,
      clientSecret, objectName, operation, externalIdField, allOrNone,
      batchSize, mode)
    val clientV = client
    prepared.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val c = Option(clientV).getOrElse(resolveClient(u))
        val token = fetchToken(c, u, ci, cs)
        val m = new ObjectMapper()
        rows.grouped(bs).foreach { grp =>
          val docs = grp.map(r => m.readTree(r.getString(0))).toSeq
          if (md == "realtime") realtimeBatch(c, u, token, obj, op, ext,
            aon, docs)
          else bulkJob(c, u, token, obj, op, ext, docs)
        }
      }
    }
  }

  private def realtimeBatch(c: Http.Client, orgUrl: String, token: String,
                            obj: String, op: String, extId: String,
                            allOrNone: Boolean, docs: Seq[JsonNode]): Unit = {
    val m = new ObjectMapper()
    val auth = Map("Authorization" -> s"Bearer $token",
      "Content-Type" -> "application/json")
    val (verb, path) = op match {
      case "insert" => ("POST", "/services/data/v65.0/composite/sobjects")
      case "update" => ("PATCH", "/services/data/v65.0/composite/sobjects")
      case "upsert" =>
        ("PATCH", s"/services/data/v65.0/composite/sobjects/$obj/$extId")
      case "delete" =>
        val ids = docs.map(_.path(extId).asText).mkString(",")
        val r = c(Seq(Http.Request(
          s"$orgUrl/services/data/v65.0/composite/sobjects?ids=$ids" +
            s"&allOrNone=$allOrNone", "DELETE", auth, ""))).head
        checkCompositeResults(r)
        return
    }
    val body = m.createObjectNode()
    body.put("allOrNone", allOrNone)
    val recs = body.putArray("records")
    docs.foreach { d =>
      val r = d.deepCopy[ObjectNode]()
      r.putObject("attributes").put("type", obj)
      recs.add(r)
      ()
    }
    val r = c(Seq(Http.Request(s"$orgUrl$path", verb, auth,
      body.toString))).head
    checkCompositeResults(r)
  }

  private def checkCompositeResults(r: Http.Response): Unit = {
    if (r.status / 100 != 2)
      throw new IllegalStateException(
        s"salesforce composite: ${r.status} ${r.body.take(200)}")
    val results = mapper.readTree(r.body)
    val failed = results.elements().asScala.filterNot(
      _.path("success").asBoolean(false)).toSeq
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"salesforce composite: ${failed.size} records failed: " +
          failed.head.toString.take(200))
  }

  /** Bulk API 2.0: create job → upload CSV → UploadComplete → poll. */
  private def bulkJob(c: Http.Client, orgUrl: String, token: String,
                      obj: String, op: String, extId: String,
                      docs: Seq[JsonNode]): Unit = {
    val m = new ObjectMapper()
    val auth = Map("Authorization" -> s"Bearer $token")
    val jobSpec = m.createObjectNode()
    jobSpec.put("object", obj)
    jobSpec.put("operation", op)
    jobSpec.put("contentType", "CSV")
    if (op == "upsert") jobSpec.put("externalIdFieldName", extId)
    val create = c(Seq(Http.Request(
      s"$orgUrl/services/data/v65.0/jobs/ingest", "POST",
      auth + ("Content-Type" -> "application/json"), jobSpec.toString))).head
    if (create.status / 100 != 2)
      throw new IllegalStateException(s"bulk create: ${create.status}")
    val jobId = m.readTree(create.body).get("id").asText
    // CSV with the union of the batch's field names
    val cols = docs.flatMap(_.properties().asScala.map(_.getKey))
      .distinct.sorted
    def esc(s: String) =
      if (s.contains(",") || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val csv = (cols.mkString(",") +: docs.map(d =>
      cols.map(f => if (d.hasNonNull(f)) esc(d.get(f).asText) else "")
        .mkString(","))).mkString("\n")
    val up = c(Seq(Http.Request(
      s"$orgUrl/services/data/v65.0/jobs/ingest/$jobId/batches", "PUT",
      auth + ("Content-Type" -> "text/csv"), csv))).head
    if (up.status / 100 != 2)
      throw new IllegalStateException(s"bulk upload: ${up.status}")
    val done = c(Seq(Http.Request(
      s"$orgUrl/services/data/v65.0/jobs/ingest/$jobId", "PATCH",
      auth + ("Content-Type" -> "application/json"),
      """{"state":"UploadComplete"}"""))).head
    if (done.status / 100 != 2)
      throw new IllegalStateException(s"bulk complete: ${done.status}")
    // poll to a terminal state
    var state = ""
    var tries = 0
    while (state != "JobComplete") {
      val poll = c(Seq(Http.Request(
        s"$orgUrl/services/data/v65.0/jobs/ingest/$jobId", "GET",
        auth, ""))).head
      state = mapper.readTree(poll.body).path("state").asText
      if (state == "Failed" || state == "Aborted")
        throw new IllegalStateException(
          s"bulk job $jobId: $state ${poll.body.take(200)}")
      tries += 1
      if (tries > 100)
        throw new IllegalStateException(s"bulk job $jobId stuck in $state")
      if (state != "JobComplete") Thread.sleep(10)
    }
  }

  // ───────────────────────── loopback server ─────────────────────────

  /** Salesforce org loopback: OAuth client-credentials token, UIAPI
    * graphql with cursor pagination, composite sObjects collections,
    * and the Bulk 2.0 ingest lifecycle (jobs only reach JobComplete
    * after UploadComplete — premature polls see InProgress).
    */
  final class Server(clientId: String, clientSecret: String,
                     pageSize: Int = 50) {
    private val m = new ObjectMapper()
    /** object → external-id value → record fields. */
    val store: mutable.LinkedHashMap[String,
      mutable.LinkedHashMap[String, ObjectNode]] = mutable.LinkedHashMap.empty
    /** graphql source data: entity → ordered records. */
    val graphData: mutable.LinkedHashMap[String, Vector[ObjectNode]] =
      mutable.LinkedHashMap.empty
    private final case class Job(obj: String, op: String, extId: String,
                                 var csv: String = null,
                                 var state: String = "Open")
    private val jobs = mutable.LinkedHashMap.empty[String, Job]
    private val jobSeq = new java.util.concurrent.atomic.AtomicInteger(0)
    // every exchanged token stays valid — parallel writers each hold
    // their own, like a real org
    private val tokens = mutable.Set.empty[String]
    @volatile var rejected = 0

    def seedGraph(entity: String, records: Seq[String]): Unit =
      synchronized {
        graphData(entity) = records.map(m.readTree(_)
          .asInstanceOf[ObjectNode]).toVector
        ()
      }

    private[SalesforceApi] def handleReq(q: Http.Request): Http.Response =
      handle(q)

    private def authFail(): Http.Response = {
      rejected += 1
      Http.Response(401,
        """[{"message":"Session expired or invalid","errorCode":"INVALID_SESSION_ID"}]""")
    }

    private def handle(q: Http.Request): Http.Response = synchronized {
      val uri = java.net.URI.create(q.url)
      val path = uri.getPath
      if (path == "/services/oauth2/token") {
        val ok = q.body.contains("grant_type=client_credentials") &&
          q.body.contains(s"client_id=$clientId") &&
          q.body.contains(s"client_secret=$clientSecret")
        if (!ok) return authFail()
        val token = "sfapi-" + java.util.UUID.randomUUID.toString.take(8)
        tokens += token
        return Http.Response(200,
          s"""{"access_token":"$token","token_type":"Bearer"}""")
      }
      val presented = q.headers.getOrElse("Authorization", "")
        .stripPrefix("Bearer ")
      if (!tokens.contains(presented)) return authFail()
      if (path.endsWith("/graphql")) graphql(q)
      else if (path.contains("/composite/sobjects")) composite(q, path, uri)
      else if (path.contains("/jobs/ingest")) ingest(q, path)
      else Http.Response(404, s"""[{"message":"no route $path"}]""")
    }

    // ── UIAPI graphql: entity connection with cursor pagination ──
    private def graphql(q: Http.Request): Http.Response = {
      val query = m.readTree(q.body).path("query").asText
      val entity = graphData.keys.find(query.contains).getOrElse(
        return Http.Response(200,
          """{"errors":[{"message":"unknown entity"}]}"""))
      val recs = graphData(entity)
      val AfterRe = """after:\s*"([^"]+)"""".r
      val start = AfterRe.findFirstMatchIn(query)
        .map(_.group(1).stripPrefix("cur-").toInt).getOrElse(0)
      val page = recs.slice(start, start + pageSize)
      val edges = page.map { r =>
        val node = m.createObjectNode()
        r.properties().asScala.foreach { e =>
          node.putObject(e.getKey).set[JsonNode]("value", e.getValue)
          ()
        }
        val edge = m.createObjectNode()
        edge.set[JsonNode]("node", node)
        edge
      }
      val conn = m.createObjectNode()
      val arr = conn.putArray("edges")
      edges.foreach(e => { arr.add(e); () })
      val pi = conn.putObject("pageInfo")
      pi.put("hasNextPage", start + pageSize < recs.size)
      pi.put("endCursor", s"cur-${start + pageSize}")
      val root = m.createObjectNode()
      root.putObject("data").putObject("uiapi").putObject("query")
        .set[JsonNode](entity, conn)
      Http.Response(200, root.toString)
    }

    // ── composite sObjects collections ──
    private def composite(q: Http.Request, path: String,
                          uri: java.net.URI): Http.Response = {
      def results(n: Int) = (0 until n).map(i =>
        s"""{"id":"rec$i","success":true,"errors":[]}""")
        .mkString("[", ",", "]")
      val UpsertRe = """.*?/composite/sobjects/([^/]+)/([^/]+)""".r
      (q.verb, path) match {
        case ("DELETE", _) =>
          val ids = Option(uri.getRawQuery).getOrElse("").split("&")
            .find(_.startsWith("ids=")).map(_.stripPrefix("ids="))
            .map(_.split(",").toSeq).getOrElse(Nil)
          store.values.foreach(tbl => ids.foreach(tbl.remove))
          Http.Response(200, results(ids.size))
        case ("PATCH", UpsertRe(obj, extId)) =>
          val recs = m.readTree(q.body).path("records")
            .elements().asScala.toSeq
          val tbl = store.getOrElseUpdate(obj, mutable.LinkedHashMap.empty)
          recs.foreach { r =>
            val o = r.deepCopy[ObjectNode]()
            o.remove("attributes")
            tbl(o.path(extId).asText) = o
          }
          Http.Response(200, results(recs.size))
        case (v, _) if v == "POST" || v == "PATCH" =>
          // insert / update collections
          val recs = m.readTree(q.body).path("records")
            .elements().asScala.toSeq
          recs.foreach { r =>
            val obj = r.at("/attributes/type").asText("unknown")
            val o = r.deepCopy[ObjectNode]()
            o.remove("attributes")
            val key = if (o.hasNonNull("Id")) o.get("Id").asText
                      else "gen-" + java.util.UUID.randomUUID.toString.take(8)
            store.getOrElseUpdate(obj, mutable.LinkedHashMap.empty)(key) = o
          }
          Http.Response(200, results(recs.size))
        case other =>
          Http.Response(405, s"""[{"message":"$other"}]""")
      }
    }

    // ── Bulk API 2.0 ingest lifecycle ──
    private def ingest(q: Http.Request, path: String): Http.Response = {
      val JobRe = """.*?/jobs/ingest/([^/]+)$""".r
      val BatchRe = """.*?/jobs/ingest/([^/]+)/batches""".r
      (q.verb, path) match {
        case ("POST", _) =>
          val spec = m.readTree(q.body)
          val id = s"750JOB${jobSeq.incrementAndGet()}"
          jobs(id) = Job(spec.path("object").asText,
            spec.path("operation").asText,
            spec.path("externalIdFieldName").asText("Id"))
          Http.Response(200, s"""{"id":"$id","state":"Open"}""")
        case ("PUT", BatchRe(id)) =>
          val job = jobs.getOrElse(id,
            return Http.Response(404, """[{"message":"no job"}]"""))
          if (job.state != "Open")
            return Http.Response(400, """[{"message":"job not open"}]""")
          job.csv = q.body
          Http.Response(201, "")
        case ("PATCH", JobRe(id)) =>
          val job = jobs.getOrElse(id,
            return Http.Response(404, """[{"message":"no job"}]"""))
          if (m.readTree(q.body).path("state").asText != "UploadComplete" ||
              job.csv == null)
            return Http.Response(400, """[{"message":"bad transition"}]""")
          job.state = "InProgress"
          Http.Response(200, s"""{"id":"$id","state":"InProgress"}""")
        case ("GET", JobRe(id)) =>
          val job = jobs.getOrElse(id,
            return Http.Response(404, """[{"message":"no job"}]"""))
          if (job.state == "InProgress") {
            // apply the CSV, then complete (one poll of latency)
            applyCsv(job)
            job.state = "JobComplete"
            Http.Response(200, s"""{"id":"$id","state":"InProgress"}""")
          } else
            Http.Response(200, s"""{"id":"$id","state":"${job.state}"}""")
        case other => Http.Response(405, s"""[{"message":"$other"}]""")
      }
    }

    /** Split CSV text into records respecting quoted newlines (a
      * quoted field may span lines — naive split("\n") corrupts it).
      */
    private def csvRecords(text: String): Seq[String] = {
      val out = mutable.Buffer[String]()
      val sb = new StringBuilder
      var quoted = false
      text.foreach {
        case '"' => quoted = !quoted; sb += '"'
        case '\n' if !quoted => out += sb.toString; sb.clear()
        case ch => sb += ch
      }
      if (sb.nonEmpty) out += sb.toString
      out.toSeq
    }

    private def applyCsv(job: Job): Unit = {
      val lines = csvRecords(job.csv)
      val cols = lines.head.split(",")
      val tbl = store.getOrElseUpdate(job.obj, mutable.LinkedHashMap.empty)
      lines.tail.filter(_.nonEmpty).foreach { line =>
        val vals = splitCsv(line)
        val o = m.createObjectNode()
        cols.zip(vals).foreach { case (c2, v) =>
          if (v.nonEmpty) o.put(c2, v)
          ()
        }
        job.op match {
          case "delete" => tbl.remove(o.path(job.extId).asText)
          case _ => tbl(o.path(job.extId).asText) = o
        }
        ()
      }
    }

    private[SalesforceApi] def splitCsv(line: String): Seq[String] = {
      val out = mutable.Buffer[String]()
      val sb = new StringBuilder
      var i = 0
      var quoted = false
      while (i < line.length) {
        val ch = line.charAt(i)
        if (quoted) {
          if (ch == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
            sb += '"'; i += 1
          } else if (ch == '"') quoted = false
          else sb += ch
        } else if (ch == '"') quoted = true
        else if (ch == ',') { out += sb.toString; sb.clear() }
        else sb += ch
        i += 1
      }
      out += sb.toString
      out.toSeq
    }
  }

  // named registry: executor closures carry only the mem:// NAME
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Server]()

  def register(name: String, clientId: String, clientSecret: String,
               pageSize: Int = 50): Server =
    registry.computeIfAbsent(name,
      _ => new Server(clientId, clientSecret, pageSize))
  def drop(name: String): Unit = { registry.remove(name); () }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => reqs.map { r =>
        Option(registry.get(name)).map(_.handleReq(r))
          .getOrElse(Http.Response(404, "no such salesforce org"))
      }
    } else Salesforce.clientFor(url)
}
