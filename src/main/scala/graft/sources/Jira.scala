package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** The `jira` input (inputs/jira.adoc; internal/impl/jira/input_jira.go
  * — contract only, no code ported): JQL-filtered incremental polling of
  * Jira's REST API, one message per issue / comment / changelog entry,
  * with a persisted cursor so progress survives restarts and boundary
  * issues are not re-emitted.
  *
  * Spark shape: Jira's `/rest/api/3/search/jql` paginates with an opaque
  * `nextPageToken` chain, so the ISSUE page walk is inherently
  * sequential — a driver-side admission loop (the same judgment call as
  * [[HttpClient.read]]: a rate-limited SaaS endpoint is admission
  * control, not a distributed scan; the DATA parallelizes after
  * admission). The per-issue CHILD fetches (resource=comments) have no
  * such chain — one independent GET per updated issue — so they fan out
  * executor-side through [[Http.requestBatched]]; at backfill scale
  * that is where the request volume lives.
  *
  * Cursor contract (input_jira.go:55-80): `updated` = max issue
  * update-time emitted; `seen` maps boundary issue keys to the updated
  * timestamp last emitted. The next sweep's JQL appends
  * `updated >= (cursor - overlap)` (minute precision — Jira's `updated`
  * operator truncates to minutes), which RE-matches boundary issues on
  * every poll; `seen` suppresses re-emission of already-delivered
  * versions while still emitting genuinely new updates of the same
  * issue. Entries the next query can no longer match (older than
  * cursor - overlap - 1min) are pruned.
  *
  * Offline seam: `mem://<name>` base URLs resolve to a client from
  * [[Jira.registerClient]] (late-binding by name, so the comments
  * fan-out can capture it into executor closures in local mode); real
  * URLs use the shared JDK client with basic auth
  * (email:api_token, per the adoc).
  */
object Jira {

  final case class Auth(email: String, apiToken: String)

  /** updatedMs = max emitted issue update-time; seen = boundary issue
    * key → updated-ms last emitted (see class doc).
    */
  final case class Cursor(updatedMs: Long, seen: Map[String, Long])

  /** Cursor persistence rides the shared [[Cursors]] store seam. */
  type CursorStore = Cursors.Store
  type MemStore = Cursors.MemStore
  type FileStore = Cursors.FileStore

  private val namedClients = TrieMap.empty[String, Http.Client]

  /** Register an injectable transport for `mem://name` base URLs. */
  def registerClient(name: String, client: Http.Client): Unit =
    namedClients.update(name, client)

  /** Late-binding resolution: captures only the name/auth (serializable
    * into executor closures), looks the client up per call.
    */
  def clientFor(baseUrl: String): Http.Client =
    if (baseUrl.startsWith("mem://")) {
      val name = baseUrl.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => namedClients.getOrElse(name, sys.error(
        s"jira: no client registered for mem://$name"))(reqs)
    } else Http.javaClient()

  private def mapper = JacksonShared.mapper
  private object JacksonShared { val mapper = new ObjectMapper() }

  /** Jira's timestamp wire format is `2026-08-13T12:34:56.000+0000`;
    * accept the `Z`/offset-colon ISO forms too.
    */
  private[sources] def parseJiraTime(s: String): Long = {
    val fmts = Seq("yyyy-MM-dd'T'HH:mm:ss.SSSZ", "yyyy-MM-dd'T'HH:mm:ssZ")
    fmts.view.flatMap { f =>
      try Some(java.time.OffsetDateTime.parse(s,
        java.time.format.DateTimeFormatter.ofPattern(f))
        .toInstant.toEpochMilli)
      catch { case _: Exception => None }
    }.headOption.getOrElse(java.time.OffsetDateTime.parse(s)
      .toInstant.toEpochMilli)
  }

  private def rfc3339(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  /** `updated >=` JQL literal: minute precision, UTC (the reference
    * resolves the principal's timezone via /myself; this implementation
    * pins UTC — input_jira.go:954 formats in a location the same way).
    */
  private[sources] def jqlMinute(ms: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ms))

  private[sources] def effectiveJql(jql: String,
                                    thresholdMs: Option[Long]): String = {
    val parts = Seq(jql).filter(_.nonEmpty) ++
      thresholdMs.map(t => s"""updated >= "${jqlMinute(t)}"""")
    val filter =
      if (parts.isEmpty) "" else parts.mkString("(", ") AND (", ") ")
    filter + "ORDER BY updated ASC, key ASC"
  }

  private def authHeaders(auth: Auth): Map[String, String] = Map(
    "Authorization" -> ("Basic " + java.util.Base64.getEncoder.encodeToString(
      s"${auth.email}:${auth.apiToken}".getBytes("UTF-8"))),
    "Accept" -> "application/json")

  private def cursorJson(c: Cursor): String = {
    val n = JsonNodeFactory.instance.objectNode()
    n.put("updated", rfc3339(c.updatedMs))
    if (c.seen.nonEmpty) {
      val s = n.putObject("seen")
      c.seen.toSeq.sortBy(_._1).foreach { case (k, v) =>
        s.put(k, rfc3339(v))
      }
    }
    n.put("v", 1)
    n.toString
  }

  private def parseCursor(s: String): Cursor = {
    val n = mapper.readTree(s)
    val seen = Option(n.get("seen")).map(_.properties().asScala
      .map(e => (e.getKey, parseJiraTime(e.getValue.asText))).toMap)
      .getOrElse(Map.empty[String, Long])
    Cursor(parseJiraTime(n.get("updated").asText), seen)
  }

  private final case class IssueMeta(key: String, id: String, self: String,
                                     project: String, updatedMs: Long,
                                     raw: String)

  /** One driver-admission sweep: frozen-JQL token-chain page walk +
    * boundary suppression, in cursor-in/cursor-out form. Returns the
    * FRESH issues (post seen-map) and the advanced cursor JSON —
    * NOT persisted here: [[read]] persists after its rows
    * materialize; [[issuesPoller]] hands it to the streaming
    * checkpoint instead.
    */
  private def sweepIssues(base: String, hdrs: Map[String, String],
      jql: String, fields: Seq[String], exp: Seq[String], pageSize: Int,
      overlapMs: Long, maxPages: Int, c: Http.Client,
      priorJson: Option[String]): (Vector[IssueMeta], String) = {
    val prior = priorJson.map(parseCursor)
    val threshold = prior.map(_.updatedMs - overlapMs)
    // JQL is FROZEN for the whole pagination run (the token chain is
    // only valid for the query it started with — input_jira.go:879)
    val frozenJql = effectiveJql(jql, threshold)

    // --- driver admission loop: issue pages over the token chain ---
    val issues = Vector.newBuilder[JsonNode]
    var token: Option[String] = None
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      val params = Seq(
        "jql" -> frozenJql, "maxResults" -> pageSize.toString,
        "fields" -> fields.mkString(",")) ++
        (if (exp.nonEmpty) Seq("expand" -> exp.mkString(",")) else Nil) ++
        token.map("nextPageToken" -> _)
      val url = base + "/rest/api/3/search/jql?" +
        params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
      val resp = c(Seq(Http.Request(url, "GET", hdrs, ""))).head
      if (resp.status < 200 || resp.status > 299)
        throw new IllegalStateException(
          s"jira: search returned ${resp.status}: ${resp.body.take(200)}")
      val page = mapper.readTree(resp.body)
      Option(page.get("issues")).foreach(_.elements().asScala
        .foreach(issues += _))
      token = Option(page.get("nextPageToken")).map(_.asText)
        .filter(_.nonEmpty)
      pages += 1
      done = token.isEmpty
    }
    if (!done) System.err.println(
      s"[jira] WARN stopped after $maxPages pages with more remaining")

    // --- boundary suppression + cursor advance ---
    val all = issues.result().map { n =>
      val f = n.get("fields")
      IssueMeta(
        key = n.get("key").asText, id = n.path("id").asText(""),
        self = n.path("self").asText(""),
        project = f.path("project").path("key").asText(""),
        updatedMs = parseJiraTime(f.get("updated").asText),
        raw = n.toString)
    }
    val priorSeen = prior.map(_.seen).getOrElse(Map.empty)
    val fresh = all.filterNot(i => priorSeen.get(i.key).contains(i.updatedMs))
    val newUpdated = (fresh.map(_.updatedMs) ++ prior.map(_.updatedMs))
      .foldLeft(0L)(math.max)
    // seen = every emitted version the NEXT query's threshold
    // (newUpdated - overlap, minute-truncated) can re-match, plus
    // surviving prior entries; one minute of slack for the truncation
    val keep = newUpdated - overlapMs - 60000L
    val seen = (priorSeen ++ fresh.map(i => i.key -> i.updatedMs))
      .filter { case (_, ms) => ms >= keep }
    (fresh, cursorJson(Cursor(newUpdated, seen)))
  }

  /** The streaming form's sweep-per-trigger (the reference polls
    * continuously — inputs/jira.adoc; [[PollStream]] drives this once
    * per micro-batch and commits the returned cursor through Spark's
    * checkpoint WAL, so restart resumes exactly from the committed
    * sweep with no re-emission).
    */
  def issuesPoller(baseUrl: String, auth: Auth, jql: String = "",
                   fields: Seq[String] = Seq("*all"), pageSize: Int = 50,
                   overlapMs: Long = 60000L, client: Http.Client = null,
                   maxPages: Int = 10000): PollStream.Poller =
    priorJson => {
      val c = Option(client).getOrElse(clientFor(baseUrl))
      val (fresh, cursorOut) = sweepIssues(baseUrl.stripSuffix("/"),
        authHeaders(auth), jql, fields, Seq.empty, pageSize, overlapMs,
        maxPages, c, priorJson)
      val rows = fresh.map { i =>
        (i.raw, Map(
          "jira_id" -> i.key, "jira_project" -> i.project,
          "jira_updated" -> rfc3339(i.updatedMs),
          "jira_event_type" -> "issue", "jira_self" -> i.self))
      }
      (rows, Some(cursorOut))
    }

  /** One catch-up sweep (the batch form; the streaming form is this
    * sweep per poll tick). Emits the broker envelope (value = raw
    * resource JSON, metadata = jira_*, __seq = emission order:
    * updated ASC, key ASC — the frozen JQL ordering).
    */
  def read(spark: SparkSession, baseUrl: String, auth: Auth,
           resource: String = "issues", jql: String = "",
           fields: Seq[String] = Seq("*all"), expand: Seq[String] = Seq.empty,
           pageSize: Int = 50, overlapMs: Long = 60000L,
           cursor: Option[(CursorStore, String)] = None,
           client: Http.Client = null, maxPages: Int = 10000): DataFrame = {
    require(Set("issues", "comments", "changelog")(resource),
      s"jira: unsupported resource '$resource' (worklogs is a declared " +
        "v1 limitation of the reference input too)")
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val base = baseUrl.stripSuffix("/")
    val hdrs = authHeaders(auth)
    val exp =
      if (resource == "changelog" && !expand.contains("changelog"))
        expand :+ "changelog"
      else expand
    val (fresh, cursorOut) = sweepIssues(base, hdrs, jql, fields, exp,
      pageSize, overlapMs, maxPages, c,
      cursor.flatMap { case (store, key) => store.get(key) })
    // The cursor is persisted only AFTER the resource's rows are
    // materialized: for comments the per-issue child fetches can fail,
    // and advancing first would let `seen` suppress those issues on the
    // retry sweep — their comments would be permanently lost.
    // At-least-once means cursor-after-emission.
    def persistCursor(): Unit = cursor.foreach { case (store, key) =>
      store.set(key, cursorOut)
    }

    resource match {
      case "issues" =>
        val rows = fresh.zipWithIndex.map { case (i, seq) =>
          Row(i.raw, Map(
            "jira_id" -> i.key, "jira_project" -> i.project,
            "jira_updated" -> rfc3339(i.updatedMs),
            "jira_event_type" -> "issue", "jira_self" -> i.self),
            null, seq.toLong)
        }
        persistCursor()
        toDf(spark, rows)

      case "changelog" =>
        // embedded first page (issue.changelog.histories); truncation
        // (total > page) warns, matching the declared v1 limitation
        val rows = fresh.zipWithIndex.flatMap { case (i, iSeq) =>
          val ch = mapper.readTree(i.raw).path("changelog")
          val hist = Option(ch.get("histories"))
            .map(_.elements().asScala.toVector).getOrElse(Vector.empty)
          val total = ch.path("total").asInt(hist.size)
          if (total > hist.size) System.err.println(
            s"[jira] WARN changelog truncated for ${i.key}: " +
              s"$total entries, first page of ${hist.size} emitted")
          hist.zipWithIndex.map { case (h, j) =>
            Row(h.toString, Map(
              "jira_id" -> h.path("id").asText(""),
              "jira_issue_key" -> i.key, "jira_project" -> i.project,
              "jira_updated" -> rfc3339(
                parseJiraTime(h.get("created").asText)),
              "jira_event_type" -> "changelog",
              "jira_self" -> i.self),
              null, iSeq.toLong * ChildSeqStride + j)
          }
        }
        persistCursor()
        toDf(spark, rows)

      case "comments" =>
        // independent GET per updated issue — executor-side fan-out
        // (the scale path: request volume is per-issue, not per-sweep).
        // Parse + emission stay executor-side too: the driver never sees
        // a response body, only the cached row count. A single action
        // materializes the fetch (the old count-then-collect shape ran
        // the HTTP pass twice), and a failed fetch throws from the task
        // BEFORE the cursor advances.
        if (fresh.isEmpty) { persistCursor(); toDf(spark, Vector.empty) }
        else {
          import spark.implicits._
          val parents = spark.createDataset(fresh.zipWithIndex.map {
            case (i, seq) => (i.key, i.project, seq.toLong)
          }).toDF("__key", "__project", "__iseq")
            .withColumn("__url", concat(lit(base + "/rest/api/3/issue/"),
              col("__key"), lit("/comment")))
          val fetched = Http.requestBatched(parents, "__url", "__key",
            "GET", hdrs, batchSize = 16, c, "__resp", "__status")
          implicit val enc = org.apache.spark.sql.Encoders.row(
            BrokerStream.schema)
          val out = fetched
            .select(col("__key"), col("__project"), col("__iseq"),
              col("__resp"), col("__status"))
            .mapPartitions(_.flatMap(commentRows))
            .persist()
          out.count() // materialize (fetch failures surface here)
          persistCursor()
          out
        }
    }
  }

  /** Executor-side expansion of one fetched `/issue/{key}/comment`
    * response into broker-envelope rows. Input row:
    * (key, project, iseq, respBody, status).
    */
  private def commentRows(r: Row): Iterator[Row] = {
    val key = r.getString(0)
    val status = r.getInt(4)
    if (status < 200 || status > 299) throw new IllegalStateException(
      s"jira: comment fetch for $key failed with status $status")
    val body = mapper.readTree(r.getString(3))
    val cs = Option(body.get("comments"))
      .map(_.elements().asScala.toVector).getOrElse(Vector.empty)
    val total = body.path("total").asInt(cs.size)
    if (total > cs.size) System.err.println(
      s"[jira] WARN comments truncated for $key: " +
        s"$total entries, first page of ${cs.size} emitted")
    cs.zipWithIndex.iterator.map { case (cm, j) =>
      Row(cm.toString, Map(
        "jira_id" -> cm.path("id").asText(""),
        "jira_issue_key" -> key,
        "jira_project" -> r.getString(1),
        "jira_updated" -> rfc3339(
          parseJiraTime(cm.get("updated").asText)),
        "jira_event_type" -> "comment",
        "jira_self" -> cm.path("self").asText("")),
        null, r.getLong(2) * ChildSeqStride + j)
    }
  }

  /** Child `__seq` = parentSeq * stride + childOrdinal: monotone within
    * a parent and across parents (child pages are capped at ~100 well
    * under the stride), which is all downstream `__seq` consumers
    * require (ordering, not density).
    */
  private val ChildSeqStride = 100000L

  /** In-memory implementation of the server side of the REST contract
    * this input consumes — the injectable-transport seam (same role as
    * [[Mq.InMemory]]): token-chained `/rest/api/3/search/jql` pages
    * honoring the minute-truncated `updated >=` JQL predicate with
    * `ORDER BY updated ASC, key ASC`, and first-page
    * `/issue/{key}/comment` child fetches. Used by JiraSpec and the
    * oracle-gated demo query; NOT a Jira server.
    */
  object InMemoryServer {
    final case class Comment(id: String, updatedMs: Long, body: String)
    final case class Issue(key: String, project: String, updatedMs: Long,
                           summary: String,
                           comments: Seq[Comment] = Seq.empty,
                           changelog: Seq[(String, Long)] = Seq.empty,
                           changelogTotal: Int = -1)

    private def fmt(ms: Long): String =
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSZ")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))

    def issueJson(i: Issue, expandChangelog: Boolean): String = {
      val ch =
        if (!expandChangelog) ""
        else {
          val hist = i.changelog.map { case (id, ms) =>
            s"""{"id":"$id","created":"${fmt(ms)}","items":[]}"""
          }.mkString(",")
          val total =
            if (i.changelogTotal >= 0) i.changelogTotal else i.changelog.size
          s""","changelog":{"histories":[$hist],"total":$total,""" +
            s""""maxResults":100,"startAt":0}"""
        }
      s"""{"id":"id-${i.key}","key":"${i.key}",""" +
        s""""self":"https://x.test/rest/api/3/issue/${i.key}",""" +
        s""""fields":{"project":{"key":"${i.project}"},""" +
        s""""updated":"${fmt(i.updatedMs)}","summary":"${i.summary}"}$ch}"""
    }

    /** Serializable (plain data only) so executor closures can capture
      * it for the comments fan-out.
      */
    final case class Transport(issues: Seq[Issue], pageSize: Int = 50)
        extends (Seq[Http.Request] => Seq[Http.Response])
        with Serializable {
      @volatile var searchCalls = 0

      private def minuteFloor(ms: Long): Long = ms - ms % 60000L

      def apply(reqs: Seq[Http.Request]): Seq[Http.Response] = reqs.map { q =>
        require(q.headers.get("Authorization").exists(_.startsWith("Basic ")),
          "fake jira: missing basic auth")
        val uri = java.net.URI.create(q.url)
        val params = Option(uri.getRawQuery).getOrElse("").split("&")
          .filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        uri.getPath match {
          case "/rest/api/3/search/jql" =>
            searchCalls += 1
            val jql = params.getOrElse("jql", "")
            val threshold = """updated >= "(\d{4}-\d{2}-\d{2} \d{2}:\d{2})""""
              .r.findFirstMatchIn(jql).map { m =>
                java.time.LocalDateTime.parse(m.group(1),
                  java.time.format.DateTimeFormatter
                    .ofPattern("yyyy-MM-dd HH:mm"))
                  .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
              }
            require(jql.endsWith("ORDER BY updated ASC, key ASC"),
              s"fake jira: unexpected jql ordering in: $jql")
            val matched = issues
              .filter(i => threshold.forall(t => minuteFloor(i.updatedMs) >= t))
              .sortBy(i => (i.updatedMs, i.key))
            val max = params.get("maxResults").map(_.toInt).getOrElse(pageSize)
            val start = params.get("nextPageToken").map(_.toInt).getOrElse(0)
            val page = matched.slice(start, start + max)
            val expand = params.get("expand").exists(_.contains("changelog"))
            val tok =
              if (start + max < matched.size)
                s""","nextPageToken":"${start + max}""""
              else ""
            val body = page.map(issueJson(_, expand)).mkString(",")
            Http.Response(200, s"""{"issues":[$body]$tok}""")

          case p if p.startsWith("/rest/api/3/issue/") &&
              p.endsWith("/comment") =>
            val key = p.stripPrefix("/rest/api/3/issue/")
              .stripSuffix("/comment")
            issues.find(_.key == key) match {
              case None => Http.Response(404, s"""{"err":"no issue $key"}""")
              case Some(i) =>
                val first = i.comments.take(50)
                val cs = first.map { c =>
                  s"""{"id":"${c.id}","updated":"${fmt(c.updatedMs)}",""" +
                    s""""self":"https://x.test/comment/${c.id}",""" +
                    s""""body":"${c.body}"}"""
                }.mkString(",")
                Http.Response(200,
                  s"""{"comments":[$cs],"total":${i.comments.size},""" +
                    s""""maxResults":50,"startAt":0}""")
            }
          case other => Http.Response(404, s"""{"err":"no route $other"}""")
        }
      }
    }
  }

  private def toDf(spark: SparkSession, rows: Seq[Row]): DataFrame = {
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      rows.length / 256 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }
}
