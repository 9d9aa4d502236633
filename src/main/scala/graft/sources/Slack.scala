package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** The `slack_users` input and `slack_post` output
  * (inputs/slack_users.adoc, outputs/slack_post.adoc;
  * internal/impl/slack — contract only) over the pluggable
  * [[Http.Client]].
  *
  * `slack_users` walks the Web API's `users.list` cursor chain
  * (`response_metadata.next_cursor`) driver-side — cursor pagination is
  * sequential, the same admission-loop judgment as [[Jira.read]] — and
  * emits one message per member (body = the raw user JSON, like the
  * reference, which marshals the SDK's User struct verbatim).
  *
  * `slack_post` calls `chat.postMessage` once per message with
  * interpolated channel/thread/text. Slack's Web API reports failure as
  * HTTP 200 with `{"ok":false,"error":...}` — the writer checks the
  * envelope's `ok`, not just the status code. 429s back off in the
  * transport (Retry-After semantics ride [[Http.javaClient]]'s 429
  * backoff; the reference sleeps the same way in its SDK).
  *
  * The socket-mode `slack` events input needs a live websocket and
  * stays environment-blocked.
  */
object Slack {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  private val namedClients = TrieMap.empty[String, Http.Client]

  /** Register an injectable transport for `mem://name` base URLs. */
  def registerClient(name: String, client: Http.Client): Unit =
    namedClients.update(name, client)

  def clientFor(baseUrl: String): Http.Client =
    if (baseUrl.startsWith("mem://")) {
      val name = baseUrl.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => namedClients.getOrElse(name, sys.error(
        s"slack: no client registered for mem://$name"))(reqs)
    } else Http.javaClient()

  private def bearer(tok: String): Map[String, String] = Map(
    "Authorization" -> s"Bearer $tok",
    "Content-Type" -> "application/json; charset=utf-8")

  /** `users.list` cursor walk: one message per member, in server page
    * order (`__seq` = emission ordinal).
    */
  def usersRead(spark: SparkSession, botToken: String, teamId: String = "",
                limit: Int = 200, baseUrl: String = "https://slack.com",
                client: Http.Client = null, maxPages: Int = 10000): DataFrame = {
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val base = baseUrl.stripSuffix("/")
    val out = Vector.newBuilder[String]
    var cursor: Option[String] = None
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      val params = Seq("limit" -> limit.toString) ++
        (if (teamId.nonEmpty) Seq("team_id" -> teamId) else Nil) ++
        cursor.map("cursor" -> _)
      val url = base + "/api/users.list?" +
        params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
      val resp = c(Seq(Http.Request(url, "GET", bearer(botToken), ""))).head
      if (resp.status < 200 || resp.status > 299)
        throw new IllegalStateException(
          s"slack_users: ${resp.status}: ${resp.body.take(200)}")
      val node = mapper.readTree(resp.body)
      if (!node.path("ok").asBoolean(false))
        throw new IllegalStateException(
          s"slack_users: ok=false: ${node.path("error").asText("?")}")
      Option(node.get("members")).foreach(_.elements().asScala
        .foreach(m => out += m.toString))
      cursor = Option(node.at("/response_metadata/next_cursor").asText(""))
        .filter(_.nonEmpty)
      pages += 1
      done = cursor.isEmpty
    }
    val rows = out.result().zipWithIndex.map { case (v, i) =>
      Row(v, Map.empty[String, String], null, i.toLong)
    }
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      rows.length / 256 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }

  /** `chat.postMessage` per message. `text` and `blocks` are mutually
    * exclusive (the adoc contract); blocksJson, when set, must already
    * be the rendered JSON array column.
    */
  def postWrite(df: DataFrame, botToken: String, channelId: Column,
                text: Column = null, blocksJson: Column = null,
                threadTs: Column = null, markdown: Boolean = true,
                unfurlLinks: Boolean = false, unfurlMedia: Boolean = true,
                linkNames: Boolean = false,
                baseUrl: String = "https://slack.com",
                client: Http.Client = null, batchSize: Int = 16): Unit = {
    require((text == null) != (blocksJson == null),
      "slack_post: exactly one of text/blocks")
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val base = baseUrl.stripSuffix("/")
    // blocks go through parse_json (variant) so to_json renders a REAL
    // nested array — {"blocks":[{...}]} — not an escaped string, which
    // Slack rejects as invalid_blocks (same pattern as Sentry.capture's
    // contexts/extra)
    val payload = to_json(struct(Seq(
      channelId.as("channel"),
      Option(text).map(_.as("text"))
        .getOrElse(lit(null).cast("string").as("text")),
      Option(blocksJson).map(b => parse_json(b).as("blocks"))
        .getOrElse(lit(null).cast("string").as("blocks")),
      Option(threadTs).map(_.as("thread_ts"))
        .getOrElse(lit(null).cast("string").as("thread_ts")),
      lit(markdown).as("mrkdwn"), lit(unfurlLinks).as("unfurl_links"),
      lit(unfurlMedia).as("unfurl_media"), lit(linkNames).as("link_names")
    ): _*))
    val prepared = df
      .withColumn("__slack_body", payload)
      .withColumn("__slack_url", lit(base + "/api/chat.postMessage"))
    val sent = Http.requestBatched(prepared, "__slack_url", "__slack_body",
      "POST", bearer(botToken), batchSize, c, "__resp", "__status")
    // Web API failures are HTTP 200 + ok=false: parse the envelope
    val bad = sent.withColumn("__ok",
        col("__status").between(200, 299) &&
          get_json_object(col("__resp"), "$.ok") === "true")
      .filter(!col("__ok")).count()
    if (bad > 0) throw new IllegalStateException(
      s"slack_post: $bad messages rejected by chat.postMessage")
  }

  /** `reactions.add` / `reactions.remove` per message
    * (outputs/slack_reaction.adoc): channel/timestamp/emoji are
    * interpolated columns; `action` selects the method. Same
    * ok-envelope contract as [[postWrite]].
    */
  def reactionWrite(df: DataFrame, botToken: String, channelId: Column,
                    timestamp: Column, emoji: Column,
                    action: String = "add",
                    baseUrl: String = "https://slack.com",
                    client: Http.Client = null, batchSize: Int = 16): Unit = {
    require(action == "add" || action == "remove",
      s"slack_reaction: action must be add|remove, got '$action'")
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val base = baseUrl.stripSuffix("/")
    val payload = to_json(struct(
      channelId.as("channel"), timestamp.as("timestamp"), emoji.as("name")))
    val prepared = df
      .withColumn("__slack_body", payload)
      .withColumn("__slack_url", lit(s"$base/api/reactions.$action"))
    val sent = Http.requestBatched(prepared, "__slack_url", "__slack_body",
      "POST", bearer(botToken), batchSize, c, "__resp", "__status")
    val bad = sent.withColumn("__ok",
        col("__status").between(200, 299) &&
          get_json_object(col("__resp"), "$.ok") === "true")
      .filter(!col("__ok")).count()
    if (bad > 0) throw new IllegalStateException(
      s"slack_reaction: $bad reactions rejected by reactions.$action")
  }

  /** In-memory Web API server (the seam's server side): cursor-paged
    * `users.list` with `team_id` filtering, `chat.postMessage`
    * recording posts (ts = monotonic ordinal, as Slack's ts is a
    * timestamp-ordinal string), and `reactions.add`/`reactions.remove`
    * over the recorded posts. NOT Slack; implements exactly the subset
    * of the Web API the connectors consume.
    */
  object InMemoryServer {
    final case class User(id: String, teamId: String, name: String,
                          realName: String)
    final case class Posted(channel: String, text: String, threadTs: String,
                            ts: String, blocksJson: String = "")

    def userJson(u: User): String =
      s"""{"id":"${u.id}","team_id":"${u.teamId}","name":"${u.name}",""" +
        s""""real_name":"${u.realName}","deleted":false}"""

    final case class Transport(users: Seq[User], pageSize: Int = 100)
        extends (Seq[Http.Request] => Seq[Http.Response])
        with Serializable {
      val posted = new java.util.concurrent.ConcurrentLinkedQueue[Posted]()
      /** (action, channel, ts, emoji) in arrival order. */
      val reactions = new java.util.concurrent
        .ConcurrentLinkedQueue[(String, String, String, String)]()
      private val tsCounter = new java.util.concurrent.atomic.AtomicLong(0)

      def apply(reqs: Seq[Http.Request]): Seq[Http.Response] = reqs.map { q =>
        require(q.headers.get("Authorization").exists(_.startsWith("Bearer ")),
          "fake slack: missing bearer auth")
        val uri = java.net.URI.create(q.url)
        val params = Option(uri.getRawQuery).getOrElse("").split("&")
          .filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        uri.getPath match {
          case "/api/users.list" =>
            val filtered = params.get("team_id").filter(_.nonEmpty)
              .fold(users)(t => users.filter(_.teamId == t))
              .sortBy(_.id)
            val limit = params.get("limit").map(_.toInt).getOrElse(pageSize)
            val start = params.get("cursor").map(_.toInt).getOrElse(0)
            val page = filtered.slice(start, start + limit)
            val next =
              if (start + limit < filtered.size) (start + limit).toString
              else ""
            Http.Response(200,
              s"""{"ok":true,"members":[${page.map(userJson).mkString(",")}],""" +
                s""""response_metadata":{"next_cursor":"$next"}}""")

          case "/api/chat.postMessage" =>
            val b = Shared.mapper.readTree(q.body)
            val channel = b.path("channel").asText("")
            val blocks = b.get("blocks")
            if (channel.isEmpty)
              Http.Response(200, """{"ok":false,"error":"channel_not_found"}""")
            else if (blocks != null && !blocks.isNull && !blocks.isArray)
              // Slack rejects a string-typed blocks field (the escaped-
              // JSON failure mode) with invalid_blocks
              Http.Response(200, """{"ok":false,"error":"invalid_blocks"}""")
            else {
              val ts = s"${1700000000L + tsCounter.getAndIncrement()}.000100"
              posted.add(Posted(channel, b.path("text").asText(""),
                b.path("thread_ts").asText(""), ts,
                if (blocks == null || blocks.isNull) "" else blocks.toString))
              Http.Response(200,
                s"""{"ok":true,"channel":"$channel","ts":"$ts"}""")
            }
          case p @ ("/api/reactions.add" | "/api/reactions.remove") =>
            val b = Shared.mapper.readTree(q.body)
            val (ch, ts, name) = (b.path("channel").asText(""),
              b.path("timestamp").asText(""), b.path("name").asText(""))
            val exists = posted.iterator().asScala
              .exists(m => m.channel == ch && m.ts == ts)
            if (name.isEmpty)
              Http.Response(200, """{"ok":false,"error":"invalid_name"}""")
            else if (!exists)
              Http.Response(200, """{"ok":false,"error":"message_not_found"}""")
            else {
              reactions.add((p.stripPrefix("/api/reactions."), ch, ts, name))
              Http.Response(200, """{"ok":true}""")
            }
          case other =>
            Http.Response(404, s"""{"ok":false,"error":"no route $other"}""")
        }
      }
    }
  }
}
